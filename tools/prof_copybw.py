"""Raw HBM bandwidth ceiling probes on this chip.

1. XLA elementwise copy (x + 1) over 0.5 GB — the compiler's best case.
2. Pallas kernel streaming (d, Z, Bt) slabs with double-buffered DMA at
   several slab sizes — what the BP kernels' access pattern can reach.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=10):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / reps


def xla_copy():
    x = jnp.zeros((256 * 1024 * 1024,), jnp.bfloat16)  # 0.5 GB
    f = jax.jit(lambda v: v + 1)
    t = timeit(f, x)
    print(f"XLA x+1 0.5GB      : {t*1e3:7.2f} ms  {2*x.nbytes/t/1e9:6.1f} GB/s",
          flush=True)


def pallas_stream(P, Z, Bt, G, dtype=jnp.bfloat16, reps=10):
    """Read G slabs of (P, Z, Bt), write them back: 2x traffic."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    src = jnp.zeros((G, P, Z, Bt), dtype)

    def kernel(src_ref, out_ref, buf, obuf, sem_in, sem_out):
        g = pl.program_id(0)

        def in_copy(g2, slot):
            return pltpu.make_async_copy(
                src_ref.at[g2], buf.at[slot], sem_in.at[slot]
            )

        def out_copy(g2, slot):
            return pltpu.make_async_copy(
                obuf.at[slot], out_ref.at[g2], sem_out.at[slot]
            )

        @pl.when(g == 0)
        def _():
            in_copy(0, 0).start()

        @pl.when(g + 1 < G)
        def _():
            in_copy(g + 1, (g + 1) % 2).start()

        in_copy(g, g % 2).wait()

        @pl.when(g >= 2)
        def _():
            out_copy(g - 2, g % 2).wait()

        obuf[g % 2] = buf[g % 2] + 1
        out_copy(g, g % 2).start()

        @pl.when(g == G - 1)
        def _():
            out_copy(g, g % 2).wait()

            @pl.when(G >= 2)
            def _():
                out_copy(g - 1, (g - 1) % 2).wait()

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(src.shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((2, P, Z, Bt), dtype),
            pltpu.VMEM((2, P, Z, Bt), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 2**20
        ),
    )
    jf = jax.jit(f)
    t = timeit(jf, src, reps=reps)
    slab = P * Z * Bt * np.dtype(dtype).itemsize
    total = 2 * G * slab
    print(
        f"pallas stream P={P:4d} Z={Z} Bt={Bt} {np.dtype(dtype).name:8s} "
        f"slab={slab/1024:7.0f}KB G={G:5d}: {t*1e3:7.2f} ms "
        f"{total/t/1e9:6.1f} GB/s  ({t/G*1e6:5.1f} us/step)",
        flush=True,
    )


if __name__ == "__main__":
    xla_copy()
    # the BP kernels' slab shape (d=7, Z=360, Bt=128) bf16, and variants
    # probing sublane alignment (Z mult of 16 for bf16) and slab size
    pallas_stream(7, 360, 128, 360)           # layered/flooding shape
    pallas_stream(7, 352, 128, 360)           # 16-aligned Z
    pallas_stream(7, 368, 128, 360)           # 16-aligned Z (padded up)
    pallas_stream(7, 360, 128, 360, jnp.float32)  # f32 (8-aligned ok)
    pallas_stream(28, 360, 128, 90)           # 4x bigger slab
    pallas_stream(112, 360, 128, 23)          # 16x bigger slab

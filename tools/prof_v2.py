"""Microbenchmark for the v2 fused-BP kernel design.

Design under test: messages stored consumer-major and pre-rolled, so each
phase kernel reads fully contiguous (d, Z, Bt) blocks via BlockSpec
pipelining and writes single (Z, Bt) planes to scattered (permuted)
positions with multi-slot manual DMA. The roll moves to the producer
(write) side as an in-VMEM rotate.

Modes:
  copy         plain HBM->HBM blocked copy (bandwidth ceiling)
  contig       blockspec read + min-sum + blockspec write (no scatter)
  scatw        blockspec read + min-sum + scattered plane writes
  scatw_roll   scatw + dynamic pltpu.roll per output plane
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z, G, d = 360, 90, 7
B = 512
dtype = jnp.bfloat16
P = G * d

def timeit(f, n=30):
    fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0].astype(jnp.float32))
    fetch(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    fetch(r)
    return (time.perf_counter() - t0) / n

rng = np.random.default_rng(0)
dest = rng.permutation(P).astype(np.int32)
shifts = rng.integers(0, Z, P).astype(np.int32)

def make(mode, Bt, S=4):
    nbt = B // Bt
    total = nbt * G

    if mode == "copy":
        def body(src_ref, out_ref):
            out_ref[...] = src_ref[...]
        f = pl.pallas_call(
            body,
            grid=(nbt, G),
            in_specs=[pl.BlockSpec((1, 1, d, Z, Bt), lambda bt, g: (bt, g, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, d, Z, Bt), lambda bt, g: (bt, g, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nbt, G, d, Z, Bt), dtype),
        )
        jf = jax.jit(lambda s: f(s))
        src = jax.device_put(np.asarray(rng.standard_normal((nbt, G, d, Z, Bt)), np.float32)).astype(dtype)
        return lambda: jf(src), 2 * (nbt * G * d * Z * Bt) * 2

    def minsum(x):  # x: list of d (Z, Bt) f32
        mags = [jnp.abs(v) for v in x]
        negs = [v < 0 for v in x]
        m1 = mags[0]
        m2 = jnp.full_like(m1, 3.4e38)
        arg = jnp.zeros(m1.shape, jnp.int32)
        par = negs[0]
        for k in range(1, d):
            mk = mags[k]
            m2 = jnp.minimum(m2, jnp.maximum(m1, mk))
            take = mk < m1
            m1 = jnp.where(take, mk, m1)
            arg = jnp.where(take, k, arg)
            par = par ^ negs[k]
        outs = []
        for t in range(d):
            loo = jnp.where(arg == t, m2, m1)
            outs.append(jnp.where(par ^ negs[t], -loo, loo))
        return outs

    if mode == "contig":
        def body(src_ref, out_ref):
            x = [src_ref[0, 0, t].astype(jnp.float32) for t in range(d)]
            outs = minsum(x)
            for t in range(d):
                out_ref[0, 0, t] = outs[t].astype(dtype)
        f = pl.pallas_call(
            body,
            grid=(nbt, G),
            in_specs=[pl.BlockSpec((1, 1, d, Z, Bt), lambda bt, g: (bt, g, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, d, Z, Bt), lambda bt, g: (bt, g, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nbt, G, d, Z, Bt), dtype),
        )
        jf = jax.jit(lambda s: f(s))
        src = jax.device_put(np.asarray(rng.standard_normal((nbt, G, d, Z, Bt)), np.float32)).astype(dtype)
        return lambda: jf(src), 2 * (nbt * G * d * Z * Bt) * 2

    # scattered-write modes
    roll = mode == "scatw_roll"

    def body(dest_ref, shift_ref, src_ref, out_ref, obuf, sems):
        bt = pl.program_id(0)
        g = pl.program_id(1)
        idx = bt * G + g
        slot = idx % S

        def writes(idx2, slot2):
            bt2 = idx2 // G
            g2 = idx2 % G
            return [
                pltpu.make_async_copy(
                    obuf.at[slot2, t],
                    out_ref.at[bt2, dest_ref[g2 * d + t]],
                    sems.at[slot2, t],
                )
                for t in range(d)
            ]

        @pl.when(idx >= S)
        def _():
            for c in writes(idx - S, slot):
                c.wait()

        x = [src_ref[0, 0, t].astype(jnp.float32) for t in range(d)]
        outs = minsum(x)
        for t in range(d):
            o = outs[t]
            if roll:
                o = pltpu.roll(o, shift_ref[g * d + t], 0)
            obuf[slot, t] = o.astype(dtype)
        for c in writes(idx, slot):
            c.start()

        @pl.when(idx == total - 1)
        def _():
            for j in range(min(S, total) - 1):
                i2 = idx - 1 - j
                for c in writes(i2, i2 % S):
                    c.wait()
            for c in writes(idx, slot):
                c.wait()

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbt, G),
        in_specs=[pl.BlockSpec((1, 1, d, Z, Bt), lambda bt, g, dr, sr: (bt, g, 0, 0, 0))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((S, d, Z, Bt), dtype),
            pltpu.SemaphoreType.DMA((S, d)),
        ],
    )
    f = pl.pallas_call(
        body,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nbt, P, Z, Bt), dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(lambda s: f(jnp.asarray(dest), jnp.asarray(shifts), s))
    src = jax.device_put(np.asarray(rng.standard_normal((nbt, G, d, Z, Bt)), np.float32)).astype(dtype)
    return lambda: jf(src), 2 * (nbt * G * d * Z * Bt) * 2


if __name__ == "__main__":
    for mode in ["copy", "contig", "scatw", "scatw_roll"]:
        for Bt in [128, 256, 512]:
            if Bt == 512 and mode != "copy":
                continue  # VMEM
            try:
                fn, bytes_rw = make(mode, Bt)
                t = timeit(fn)
                print("%-11s Bt=%3d: %7.3f ms  %4.0f GB/s" % (mode, Bt, t * 1e3, bytes_rw / t / 1e9))
            except Exception as ex:
                print("%-11s Bt=%3d: FAILED: %s" % (mode, Bt, str(ex).replace("\n", " ")[:200]))

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z, align, Bt, G, d, nbt = 360, 16, 128, 90, 7, 4
dtype = jnp.bfloat16
total = G*nbt
P = 630
key = jax.random.PRNGKey(0)
src = jax.random.normal(key, (nbt, P, 2*Z+align, Bt)).astype(dtype)
planes = np.random.randint(0, P, (G*d,)).astype(np.int32)
shifts = np.random.randint(0, Z, (G*d,)).astype(np.int32)

def timeit(f, n=30):
    fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0][0].reshape(-1)[0])
    fetch(f())
    t0=time.perf_counter()
    for _ in range(n): r=f()
    fetch(r)
    return (time.perf_counter()-t0)/n

def make(mode):
    def body(planes_ref, shifts_ref, src_ref, out_ref, scratch, sems):
        g = pl.program_id(0); bt = pl.program_id(1)
        idx = g*nbt + bt
        def copies(idx2, slot):
            g2, bt2 = idx2//nbt, idx2%nbt
            out=[]
            for t in range(d):
                e = g2*d + t
                start = Z - shifts_ref[e]
                hi = pl.multiple_of((start//align)*align, align)
                out.append(pltpu.make_async_copy(
                    src_ref.at[bt2, planes_ref[e], pl.ds(hi, Z+align), :],
                    scratch.at[slot, t], sems.at[slot, t]))
            return out
        slot = idx % 2
        @pl.when(idx == 0)
        def _():
            for c in copies(0,0): c.start()
        @pl.when(idx+1 < total)
        def _():
            for c in copies(idx+1,(idx+1)%2): c.start()
        for c in copies(idx, slot): c.wait()
        rolled=[]
        for t in range(d):
            e = g*d+t
            start = Z - shifts_ref[e]
            lo = start - (start//align)*align
            if mode == "dma":
                rolled.append(scratch[slot, t, :Z, :].astype(jnp.float32))
            elif mode == "roll0":
                v = scratch[slot, t].astype(jnp.float32)
                rolled.append(pltpu.roll(v, 5, 0)[:Z])
            elif mode == "switch":
                v = jax.lax.switch(lo, [
                    (lambda j=j, t=t: pltpu.roll(scratch[slot,t].astype(jnp.float32), (Z+align-j)%(Z+align), 0))
                    for j in range(align)])
                rolled.append(v[:Z])
            elif mode == "dynroll":
                v = scratch[slot, t].astype(jnp.float32)
                rolled.append(pltpu.roll(v, (Z+align-lo)%(Z+align), 0)[:Z])
        acc = rolled[0]
        for t in range(1, d): acc = acc + rolled[t]
        out_ref[0,0,:,:] = acc.astype(out_ref.dtype)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(G, nbt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1,1,Z,Bt), lambda g,bt,p,s:(bt,g,0,0)),
        scratch_shapes=[pltpu.VMEM((2,d,Z+align,Bt), dtype), pltpu.SemaphoreType.DMA((2,d))])
    f = pl.pallas_call(make_kernel:=body, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nbt,G,Z,Bt), dtype))
    jf = jax.jit(lambda s: f(jnp.asarray(planes), jnp.asarray(shifts), s))
    return lambda: jf(src)

for mode in ["dma","roll0","switch","dynroll"]:
    try:
        t = timeit(make(mode))
        rd = G*d*(Z+align)*Bt*nbt*2; wr = G*Z*Bt*nbt*2
        print("%-8s %.3f ms  %.0f GB/s"%(mode, t*1e3, (rd+wr)/t/1e9))
    except Exception as ex:
        print(mode, "FAILED:", str(ex)[:200])

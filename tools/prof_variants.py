import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z, align, Bt, G, d = 360, 16, 128, 90, 7
nbt, B = 4, 512
dtype = jnp.bfloat16
total = G*nbt
P = G*d
key = jax.random.PRNGKey(0)
src = jax.random.normal(key, (nbt, P, 2*Z+align, Bt)).astype(dtype)
rng = np.random.default_rng(0)
planes_scat = rng.permutation(P).astype(np.int32)
planes_cont = np.arange(P, dtype=np.int32)
shifts = rng.integers(0, Z, P).astype(np.int32)
shifts0 = np.zeros(P, np.int32)

def timeit(f, n=30):
    fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0][0].reshape(-1)[0])
    fetch(f())
    t0=time.perf_counter()
    for _ in range(n): r=f()
    fetch(r)
    return (time.perf_counter()-t0)/n

def build(name, one_dma, do_roll):
    def kernel(planes_ref, shifts_ref, src_ref, out_ref, scratch, sems):
        g = pl.program_id(0); bt = pl.program_id(1)
        idx = g*nbt + bt
        def copies(idx2, slot):
            g2, bt2 = idx2//nbt, idx2%nbt
            if one_dma:
                return [pltpu.make_async_copy(
                    src_ref.at[bt2, pl.ds(g2*d, d), :Z+align, :],
                    scratch.at[slot], sems.at[slot, 0])]
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
            if do_roll:
                start = Z - shifts_ref[e]
                lo = start - (start//align)*align
                v = jax.lax.switch(lo, [
                    (lambda j=j, t=t: pltpu.roll(scratch[slot,t].astype(jnp.float32), (Z+align-j)%(Z+align), 0))
                    for j in range(align)])
                rolled.append(v[:Z])
            else:
                rolled.append(scratch[slot, t, :Z, :].astype(jnp.float32))
        # same min-sum compute for all variants
        mags=[jnp.abs(x) for x in rolled]; negs=[x<0 for x in rolled]
        m1=mags[0]; m2=jnp.full_like(m1, 3e38); arg=jnp.zeros(m1.shape, jnp.int32); par=negs[0]
        for k in range(1,d):
            mk=mags[k]; m2=jnp.minimum(m2,jnp.maximum(m1,mk))
            take=mk<m1; m1=jnp.where(take,mk,m1); arg=jnp.where(take,k,arg); par=par^negs[k]
        for t in range(d):
            loo=jnp.where(arg==t,m2,m1)
            out=jnp.where(par^negs[t],-loo,loo).astype(out_ref.dtype)
            out_ref[0,0,t,:Z,:]=out; out_ref[0,0,t,Z:2*Z,:]=out; out_ref[0,0,t,2*Z:,:]=out[:align,:]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(G, nbt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1,1,d,2*Z+align,Bt), lambda g,bt,p,s:(bt,g,0,0,0)),
        scratch_shapes=[pltpu.VMEM((2,d,Z+align,Bt), dtype), pltpu.SemaphoreType.DMA((2,d))])
    return pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nbt,G,d,2*Z+align,Bt), dtype))

variants = [
    ("A scat +roll",  planes_scat, shifts,  False, True),
    ("B cont +roll",  planes_cont, shifts,  False, True),
    ("C 1dma +roll",  planes_cont, shifts,  True,  True),
    ("D 1dma -roll",  planes_cont, shifts0, True,  False),
    ("E scat -roll",  planes_scat, shifts0, False, False),
]
for name, pp, ss, one, roll in variants:
    try:
        f = build(name, one, roll)
        g = jax.jit(f)
        pj, sj = jnp.asarray(pp), jnp.asarray(ss)
        t = timeit(lambda: g(pj, sj, src))
        print("%s: %.3f ms  (%.2f us/step)"%(name, t*1e3, t*1e6/total), flush=True)
    except Exception as ex:
        print(name, "FAILED:", str(ex)[:150], flush=True)

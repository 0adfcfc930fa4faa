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
planes = rng.permutation(P).astype(np.int32)
shifts = rng.integers(0, Z, P).astype(np.int32)

def timeit(f, n=30):
    fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0][0].reshape(-1)[0])
    fetch(f())
    t0=time.perf_counter()
    for _ in range(n): r=f()
    fetch(r)
    return (time.perf_counter()-t0)/n

def build(mode):
    def kernel(planes_ref, shifts_ref, src_ref, out_ref, scratch, sems):
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
            if mode == "bf16":
                # no roll, pure bf16 compute
                rolled.append(scratch[slot, t, :Z, :])
            elif mode == "bitroll":
                # roll bf16 data as packed f32 pairs along batch lanes
                v = jax.lax.switch(lo, [
                    (lambda j=j, t=t: pltpu.roll(
                        pltpu.bitcast(scratch[slot,t], jnp.float32),
                        (Z+align-j)%(Z+align), 0))
                    for j in range(align)])
                rolled.append(pltpu.bitcast(v, dtype)[:Z])
            elif mode == "bitroll_i16":
                v = jax.lax.switch(lo, [
                    (lambda j=j, t=t: pltpu.roll(
                        scratch[slot,t].astype(jnp.float32), (Z+align-j)%(Z+align), 0))
                    for j in range(align)])
                rolled.append(v[:Z].astype(dtype))
        mags=[jnp.abs(x) for x in rolled]; negs=[x<0 for x in rolled]
        m1=mags[0]; m2=jnp.full_like(m1, 3e38); par=negs[0]
        for k in range(1,d):
            mk=mags[k]; m2=jnp.minimum(m2,jnp.maximum(m1,mk))
            m1=jnp.minimum(m1,mk); par=par^negs[k]
        for t in range(d):
            loo=jnp.where(mags[t]<=m1,m2,m1)
            out=jnp.where(par^negs[t],-loo,loo).astype(out_ref.dtype)
            out_ref[0,0,t,:Z,:]=out; out_ref[0,0,t,Z:2*Z,:]=out; out_ref[0,0,t,2*Z:,:]=out[:align,:]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(G, nbt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1,1,d,2*Z+align,Bt), lambda g,bt,p,s:(bt,g,0,0,0)),
        scratch_shapes=[pltpu.VMEM((2,d,Z+align,Bt), dtype), pltpu.SemaphoreType.DMA((2,d))])
    return pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nbt,G,d,2*Z+align,Bt), dtype))

for mode in ["bf16","bitroll","bitroll_i16"]:
    try:
        f = jax.jit(build(mode))
        pj, sj = jnp.asarray(planes), jnp.asarray(shifts)
        t = timeit(lambda: f(pj, sj, src))
        print("%-12s %.3f ms  (%.2f us/step)"%(mode, t*1e3, t*1e6/total), flush=True)
    except Exception as ex:
        print(mode, "FAILED:", str(ex)[:200], flush=True)

# correctness of bitcast roll vs upcast roll: compare outputs
try:
    f1 = jax.jit(build("bitroll")); f2 = jax.jit(build("bitroll_i16"))
    pj, sj = jnp.asarray(planes), jnp.asarray(shifts)
    a = np.asarray(f1(pj, sj, src)); b = np.asarray(f2(pj, sj, src))
    print("bitroll matches upcast-roll:", np.array_equal(a, b), flush=True)
except Exception as ex:
    print("cmp FAILED:", str(ex)[:200], flush=True)

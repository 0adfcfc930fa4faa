import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
import ldpc_toolbox_tpu.ops.fused_bp as fb

code = Code["R1_2"]
vm, cm, Z, nvg, ncg = dvbs2_maps(code)
lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
B = 512
dtype = jnp.bfloat16
align = 16
key = jax.random.PRNGKey(0)

def timeit(f, n=20):
    fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0][0].reshape(-1)[0])
    fetch(f())
    t0=time.perf_counter()
    for _ in range(n): r=f()
    fetch(r)
    return (time.perf_counter()-t0)/n

for Bt in [128, 256, 512]:
    fb_BT = Bt
    nbt = B // Bt
    VG = lg.num_var_groups
    post = fb.double_planes(jax.random.normal(key, (VG, Z, B)).astype(dtype), Bt=Bt)
    def syn_all(post):
        outs=[]
        for i,b in enumerate(lg.chk_buckets):
            if b.degree==0 or len(b.groups)==0: continue
            ml = np.full(len(b.groups)*b.degree, -1, np.int32)
            outs.append(fb.fused_syndrome(post, b.var_group_pos, b.shifts, ml, len(b.groups), b.degree, Z, B))
        return jnp.concatenate(outs)
    f = jax.jit(syn_all)
    t = timeit(lambda: f(post))
    CE = sum(len(b.groups)*b.degree for b in lg.chk_buckets)
    bytes_rw = 2*CE*(Z+align)*B
    ndma = CE * nbt
    print("Bt=%3d: %.3f ms  %.0f GB/s  (%d DMAs, %.2f us/DMA)"%(Bt, t*1e3, bytes_rw/t/1e9, ndma, t*1e6/ndma))

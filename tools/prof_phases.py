import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
from ldpc_toolbox_tpu.ops.fused_bp import (double_planes, fused_check_minsum,
    fused_var_update, fused_syndrome, BT)

code = Code["R1_2"]
vm, cm, Z, nvg, ncg = dvbs2_maps(code)
lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
B = 512
nbt = B // BT
dtype = jnp.bfloat16
P = sum(len(b.groups)*b.degree for b in lg.var_buckets if b.degree>0)
align = 16
key = jax.random.PRNGKey(0)
v2c = double_planes(jax.random.normal(key, (P, Z, B)).astype(dtype))
qs = [jax.random.normal(key, (len(b.groups), Z, B)).astype(dtype) for b in lg.var_buckets if b.degree>0 and len(b.groups)]
qts = [q.reshape(q.shape[0], Z, nbt, BT).transpose(2,0,1,3) for q in qs]

def timeit(f, n=20):
    fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0][0].reshape(-1)[0])
    fetch(f())
    t0=time.perf_counter()
    for _ in range(n):
        r = f()
    fetch(r)
    return (time.perf_counter()-t0)/n

@jax.jit
def check_all(v2c):
    outs=[]
    for b in lg.chk_buckets:
        if b.degree==0 or len(b.groups)==0: continue
        outs.append(fused_check_minsum(v2c, b.planes, b.shifts, len(b.groups), b.degree, Z, B))
    return jnp.concatenate(outs, axis=1)
c2v = check_all(v2c)
t = timeit(lambda: check_all(v2c))
bytes_rw = 2*( P*(Z+align)*B + P*(2*Z+align)*B )
print("check: %.3f ms  %.0f GB/s"%(t*1e3, bytes_rw/t/1e9))

@jax.jit
def var_all(c2v):
    outs=[]; posts=[]
    i=0
    for b in lg.var_buckets:
        if len(b.groups)==0 or b.degree==0: continue
        o,p = fused_var_update(c2v, b.planes, b.shifts, qts[i], len(b.groups), b.degree, Z, B)
        outs.append(o); posts.append(p); i+=1
    return jnp.concatenate(outs, axis=1), jnp.concatenate(posts, axis=1)
v2, post = var_all(c2v)
t = timeit(lambda: var_all(c2v))
VG = lg.num_var_groups
bytes_rw = 2*( P*(Z+align)*B + P*(2*Z+align)*B + VG*Z*B + VG*(2*Z+align)*B )
print("var:   %.3f ms  %.0f GB/s"%(t*1e3, bytes_rw/t/1e9))

@jax.jit
def syn_all(post):
    outs=[]
    for i,b in enumerate(lg.chk_buckets):
        if b.degree==0 or len(b.groups)==0: continue
        ml = np.full(len(b.groups)*b.degree, -1, np.int32)
        outs.append(fused_syndrome(post, b.var_group_pos, b.shifts, ml, len(b.groups), b.degree, Z, B))
    return jnp.concatenate(outs)
s = syn_all(post)
t = timeit(lambda: syn_all(post))
CE = sum(len(b.groups)*b.degree for b in lg.chk_buckets)
bytes_rw = 2*CE*(Z+align)*B
print("syn:   %.3f ms  %.0f GB/s"%(t*1e3, bytes_rw/t/1e9))

@jax.jit
def full_iter(v2c):
    c2v = check_all(v2c)
    v2, post = var_all(c2v)
    s = syn_all(post)
    return v2, post, s
r = full_iter(v2c)
t = timeit(lambda: full_iter(v2c))
print("full iter: %.3f ms  -> %.1f Mbit/s at 30 iters"%(t*1e3, 1e-6*code.k*B/(t*30)))

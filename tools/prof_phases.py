"""Per-phase timing of the v2 fused kernels (ops/fused_bp2.py) on the
flagship DVB-S2 R1_2 workload. Run on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
from ldpc_toolbox_tpu.ops.fused_bp2 import (
    BT, build_fused_layout, fused_check, fused_var, fused_syndrome_bits)

code = Code["R1_2"]
vm, cm, Z, nvg, ncg = dvbs2_maps(code)
lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
lay = build_fused_layout(lg)
B = 512
nbt = B // BT
dtype = jnp.bfloat16
E, VG = lay.E, lay.VG
rng = np.random.default_rng(0)
v2c = jax.device_put(np.asarray(rng.standard_normal((nbt, E, Z, BT)), np.float32)).astype(dtype)
q = jax.device_put(np.asarray(rng.standard_normal((nbt, VG, Z, BT)), np.float32)).astype(dtype)

def timeit(f, *a, n=20):
    fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0].astype(jnp.float32))
    fetch(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    fetch(r)
    return (time.perf_counter() - t0) / n

fc = jax.jit(lambda v: fused_check(v, lay))
c2v = fc(v2c)
t = timeit(fc, v2c)
by = 2 * E * Z * B * 2
print("check: %.3f ms  %.0f GB/s" % (t * 1e3, by / t / 1e9))

fv = jax.jit(lambda c, qq: fused_var(c, qq, lay))
v2, bits = fv(c2v, q)
t = timeit(fv, c2v, q)
by = (2 * E * Z * B + VG * Z * B) * 2 + VG * Z * B
print("var:   %.3f ms  %.0f GB/s" % (t * 1e3, by / t / 1e9))

fs = jax.jit(lambda b: fused_syndrome_bits(b, lay))
fs(bits)
t = timeit(fs, bits)
print("syn:   %.3f ms  %.0f GB/s" % (t * 1e3, VG * Z * B / t / 1e9))

fi = jax.jit(lambda v, qq: fused_syndrome_bits(fused_var(fused_check(v, lay), qq, lay)[1], lay))
fi(v2c, q)
t = timeit(fi, v2c, q)
print("full iter: %.3f ms  -> %.1f Mbit/s at 30 iters" % (t * 1e3, 1e-6 * code.k * B / (t * 30)))

"""Per-kernel timing: layered iteration vs flooding phases (TPU).

Answers where the layered iteration's time goes relative to the flooding
check/var/syndrome kernels on the flagship DVB-S2 R1_2 workload.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
from ldpc_toolbox_tpu.ops.fused_bp2 import (
    BT,
    build_fused_layout,
    fused_check,
    fused_syndrome_bits,
    fused_var,
    rule_for,
)
from ldpc_toolbox_tpu.ops.fused_layered import fused_layered_iteration

CODE = "R1_2"
BATCH = 512


def timeit(fn, *args, reps=30):
    """Chained timing: each rep feeds the previous rep's first output back
    into the first argument, forcing serial execution (independent calls
    with identical inputs measured 10x above HBM peak — not real)."""
    import numpy as np

    def sync(x):
        first = x[0] if isinstance(x, (tuple, list)) else x
        np.asarray(jax.device_get(first.ravel()[:1]))

    args = list(args)
    r = fn(*args)
    sync(r)
    first = r[0] if isinstance(r, (tuple, list)) else r
    t0 = time.perf_counter()
    for _ in range(reps):
        if first.shape == args[0].shape and first.dtype == args[0].dtype:
            args[0] = first
        r = fn(*args)
        first = r[0] if isinstance(r, (tuple, list)) else r
    sync(r)
    return (time.perf_counter() - t0) / reps * 1e3, r


def main():
    code = Code[CODE]
    vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
    layout = build_fused_layout(lg)
    _, arith = make_arithmetic("HLMinsumbf16")
    rule = rule_for(arith)
    _, farith = make_arithmetic("Minsumbf16")
    frule = rule_for(farith)

    nbt = BATCH // BT
    E, VG, CG = layout.E, layout.VG, layout.CG
    print(f"E={E} VG={VG} CG={CG} Z={Z} nbt={nbt}")
    edges = E * Z
    n = code.n
    print(f"edges={edges} n={n} edges/n={edges/n:.2f}")

    key = jax.random.key(0)
    store = rule.storage_dtype
    qv = jax.random.normal(key, (nbt, VG, Z, BT), jnp.float32).astype(
        rule.qv_dtype(arith)
    )
    rcv = jnp.zeros((nbt, E, Z, BT), store)
    v2c = jax.random.normal(key, (nbt, E, Z, BT), jnp.float32).astype(store)
    q_t = jax.random.normal(key, (nbt, VG, Z, BT), jnp.float32).astype(store)
    bits = jnp.zeros((nbt, VG, Z, BT), jnp.int8)

    lay = jax.jit(lambda a, b: fused_layered_iteration(a, b, layout, rule))
    chk = jax.jit(lambda a: fused_check(a, layout, frule))
    var = jax.jit(lambda a, b: fused_var(a, b, layout, frule))
    syn = jax.jit(lambda b: fused_syndrome_bits(b, layout))

    t_lay, r = timeit(lay, qv, rcv)
    t_chk, c2v = timeit(chk, v2c)
    t_var, _ = timeit(var, c2v, q_t)
    t_syn, _ = timeit(syn, bits)

    mb = store.itemsize
    qb = rule.qv_dtype(arith).itemsize
    lay_bytes = BATCH * (2 * edges * mb + 2 * n * qb + 2 * n)
    chk_bytes = BATCH * 2 * edges * mb
    var_bytes = BATCH * (2 * edges * mb + n * mb + n)

    print(f"layered iter : {t_lay:7.3f} ms  {lay_bytes/1e6/t_lay:6.1f} GB/s")
    print(f"flood check  : {t_chk:7.3f} ms  {chk_bytes/1e6/t_chk:6.1f} GB/s")
    print(f"flood var    : {t_var:7.3f} ms  {var_bytes/1e6/t_var:6.1f} GB/s")
    print(f"syndrome     : {t_syn:7.3f} ms  {BATCH*n/1e6/t_syn:6.1f} GB/s")
    print(
        f"flood iter total ~ {t_chk+t_var+t_syn:7.3f} ms; "
        f"layered+syn {t_lay+t_syn:7.3f} ms"
    )


if __name__ == "__main__":
    main()

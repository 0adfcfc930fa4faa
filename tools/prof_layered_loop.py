"""Single-dispatch loop timing: where does the layered decode's
while_loop body spend its time? Run on TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()

from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
from ldpc_toolbox_tpu.ops.fused_bp2 import (
    BT,
    build_fused_layout,
    fused_syndrome_bits,
    rule_for,
)
from ldpc_toolbox_tpu.ops.fused_layered import fused_layered_iteration

CODE = "R1_2"
BATCH = 512
K = 30


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=3):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        sync(r)
    return (time.perf_counter() - t0) / reps * 1e3, r


def main():
    code = Code[CODE]
    vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
    layout = build_fused_layout(lg)
    _, arith = make_arithmetic("HLMinsumbf16")
    rule = rule_for(arith)

    nbt = BATCH // BT
    E, VG = layout.E, layout.VG
    key = jax.random.key(0)
    qv0 = jax.random.normal(key, (nbt, VG, Z, BT), jnp.float32).astype(
        rule.qv_dtype(arith)
    )
    rcv0 = jnp.zeros((nbt, E, Z, BT), rule.storage_dtype)

    @jax.jit
    def loop_iter_only(qv, rcv):
        def body(_, s):
            qv, rcv = s
            qv, rcv, _bits = fused_layered_iteration(qv, rcv, layout, rule)
            return (qv, rcv)

        return jax.lax.fori_loop(0, K, body, (qv, rcv))

    @jax.jit
    def loop_iter_syn(qv, rcv):
        def body(_, s):
            qv, rcv, flags = s
            qv, rcv, bits = fused_layered_iteration(qv, rcv, layout, rule)
            flags = fused_syndrome_bits(bits, layout)
            return (qv, rcv, flags)

        flags0 = jnp.zeros((nbt, 8, BT), jnp.int8)
        return jax.lax.fori_loop(0, K, body, (qv, rcv, flags0))

    @jax.jit
    def loop_while_glue(qv, rcv):
        bits0 = jnp.zeros((nbt, VG, Z, BT), jnp.int8)
        ok0 = jnp.zeros(BATCH, bool)

        def body(state):
            it, qv, rcv, _bits, converged, iters, frozen = state
            qv, rcv, bits = fused_layered_iteration(qv, rcv, layout, rule)
            flags = fused_syndrome_bits(bits, layout)
            ok = flags[:, 0, :].reshape(-1) == 0
            newly = ok & ~converged
            it = it + 1
            iters = jnp.where(newly, it, iters)
            nt = newly.reshape(nbt, 1, 1, BT)
            frozen = jnp.where(nt, bits, frozen)
            return (it, qv, rcv, bits, converged | ok, iters, frozen)

        def cond(state):
            return (state[0] < K) & ~jnp.all(state[4])

        init = (
            jnp.int32(0), qv, rcv, bits0, ok0,
            jnp.zeros(BATCH, jnp.int32), bits0,
        )
        return jax.lax.while_loop(cond, body, init)

    t1, _ = timeit(loop_iter_only, qv0, rcv0)
    print(f"fori iter only      : {t1:8.2f} ms  {t1/K:6.3f} ms/iter", flush=True)
    t2, _ = timeit(loop_iter_syn, qv0, rcv0)
    print(f"fori iter+syndrome  : {t2:8.2f} ms  {t2/K:6.3f} ms/iter", flush=True)
    t3, _ = timeit(loop_while_glue, qv0, rcv0)
    print(f"while full glue     : {t3:8.2f} ms  {t3/K:6.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

"""Bisect the fused layered kernel's per-step cost on TPU.

Builds stripped-down variants of ops/fused_layered.fused_layered_iteration
and times each in a chained fori_loop (single dispatch):

  full      — the real kernel
  normw     — no Qv read-modify-write (still computes dv, writes nothing)
  noroll    — no dynamic rolls (qc read straight, dv unrolled)
  norule    — rule.check replaced by identity (keeps rolls + RMW)
  dmaonly   — stream Rcv in and out, no compute at all
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
from ldpc_toolbox_tpu.ops.fused_bp2 import (
    BT,
    WS,
    build_fused_layout,
    rule_for,
    _roll,
)

CODE = "R1_2"
BATCH = 512
K = 30


def make_iteration(layout, rule, qdtype, *, rmw=True, rolls=True, use_rule=True,
                   compute_on=True):
    nbt = BATCH // BT
    E = layout.E
    CG = layout.CG
    VG = layout.VG
    Z = layout.Z
    total = nbt * CG
    metas = layout.chk_meta
    dmax = layout.max_chk_degree
    store = rule.storage_dtype
    compute = rule.compute_dtype
    big = rule.big

    rot_vc = layout.syn_rot
    rot_cv = ((layout.Z - layout.syn_rot) % layout.Z).astype(np.int32)

    def kernel(cs_ref, vg_ref, rvc_ref, rcv_ref_rot, mask_ref,
               qv_in, rcv_in, qv_out, rcv_out,
               qv_buf, in_buf, obuf, sem_qv, sem_in, sem_out):
        bt = pl.program_id(0)
        g = pl.program_id(1)
        idx = bt * CG + g

        def in_copy(idx2, slot, d):
            bt2 = idx2 // CG
            g2 = idx2 % CG
            return pltpu.make_async_copy(
                rcv_in.at[bt2, pl.ds(cs_ref[g2], d)],
                in_buf.at[slot, pl.ds(0, d)],
                sem_in.at[slot],
            )

        def out_copy(idx2, slot, d):
            bt2 = idx2 // CG
            g2 = idx2 % CG
            return pltpu.make_async_copy(
                obuf.at[slot, pl.ds(0, d)],
                rcv_out.at[bt2, pl.ds(cs_ref[g2], d)],
                sem_out.at[slot],
            )

        def each_bucket(idx2, fn):
            g2 = idx2 % CG
            for m in metas:
                if len(metas) == 1:
                    fn(m, idx2)
                else:
                    def _body(m=m):
                        fn(m, idx2)
                    pl.when((g2 >= m.g0) & (g2 < m.g1))(_body)

        @pl.when(g == 0)
        def _():
            cp = pltpu.make_async_copy(qv_in.at[bt], qv_buf, sem_qv)
            cp.start()
            cp.wait()

        @pl.when(idx == 0)
        def _():
            each_bucket(0, lambda m, i2: in_copy(i2, 0, m.d).start())

        @pl.when(idx + 1 < total)
        def _():
            each_bucket(
                idx + 1,
                lambda m, i2: in_copy(i2, (idx + 1) % 2, m.d).start(),
            )

        each_bucket(idx, lambda m, i2: in_copy(i2, idx % 2, m.d).wait())

        wslot = idx % WS

        @pl.when(g >= WS)
        def _():
            each_bucket(
                idx - WS, lambda m, i2: out_copy(i2, wslot, m.d).wait()
            )

        def compute_fn(m, idx2):
            islot = idx % 2
            lane = jax.lax.broadcasted_iota(jnp.int32, (Z, BT), 0)
            if not compute_on:
                for t in range(m.d):
                    obuf[wslot, t] = in_buf[islot, t]
                out_copy(idx2, wslot, m.d).start()
                return
            rolds = []
            xs = []
            for t in range(m.d):
                e = m.ebase + (g - m.g0) * m.d + t
                rold = in_buf[islot, t].astype(compute)
                qplane = qv_buf[vg_ref[e]].astype(compute)
                qc = _roll(qplane, rvc_ref[e]) if rolls else qplane
                x = rule.layered_x(qc, rold)
                x = jnp.where(lane == mask_ref[e], big, x)
                rolds.append(rold)
                xs.append(x)
            rnews = rule.check(xs) if use_rule else xs
            for t in range(m.d):
                e = m.ebase + (g - m.g0) * m.d + t
                rn = jnp.where(lane == mask_ref[e], 0, rnews[t])
                obuf[wslot, t] = rn.astype(store)
                dv = rn - rolds[t]
                if rolls:
                    dv = _roll(dv, rcv_ref_rot[e])
                if rmw:
                    qv_buf[vg_ref[e]] = (
                        qv_buf[vg_ref[e]].astype(compute) + dv
                    ).astype(qdtype)
            out_copy(idx2, wslot, m.d).start()

        each_bucket(idx, compute_fn)

        @pl.when(g == CG - 1)
        def _():
            for j in range(min(WS, CG)):
                i2 = idx - j
                each_bucket(
                    i2, lambda m, i2=i2: out_copy(i2, i2 % WS, m.d).wait()
                )
            cp = pltpu.make_async_copy(qv_buf, qv_out.at[bt], sem_qv)
            cp.start()
            cp.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nbt, CG),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((VG, Z, BT), qdtype),
            pltpu.VMEM((2, dmax, Z, BT), store),
            pltpu.VMEM((WS, dmax, Z, BT), store),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((WS,)),
        ],
    )

    def call(qv_t, rcv_t):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nbt, VG, Z, BT), qdtype),
                jax.ShapeDtypeStruct((nbt, E, Z, BT), store),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 2**20
            ),
        )(
            jnp.asarray(layout.chk_cs),
            jnp.asarray(layout.syn_vg),
            jnp.asarray(rot_vc),
            jnp.asarray(rot_cv),
            jnp.asarray(layout.syn_mask),
            qv_t,
            rcv_t,
        )

    return call


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def main():
    code = Code[CODE]
    vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
    layout = build_fused_layout(lg)
    _, arith = make_arithmetic("HLMinsumbf16")
    rule = rule_for(arith)
    qdtype = rule.qv_dtype(arith)

    nbt = BATCH // BT
    key = jax.random.key(0)
    qv0 = jax.random.normal(key, (nbt, layout.VG, Z, BT), jnp.float32).astype(
        qdtype
    )
    rcv0 = jnp.zeros((nbt, layout.E, Z, BT), rule.storage_dtype)

    variants = {
        "full": dict(),
        "normw": dict(rmw=False),
        "noroll": dict(rolls=False),
        "norule": dict(use_rule=False),
        "dmaonly": dict(compute_on=False),
    }
    for name, kw in variants.items():
        it = make_iteration(layout, rule, qdtype, **kw)

        @jax.jit
        def loop(qv, rcv, it=it):
            def body(_, s):
                return tuple(it(*s))

            return jax.lax.fori_loop(0, K, body, (qv, rcv))

        r = loop(qv0, rcv0)
        sync(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = loop(qv0, rcv0)
        sync(r)
        t = (time.perf_counter() - t0) / 3 / K * 1e3
        print(f"{name:8s}: {t:6.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

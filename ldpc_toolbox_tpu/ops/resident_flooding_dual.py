"""VMEM-resident flooding BP decode, two message arrays (Pallas TPU).

This is the round-4 dual-array kernel, retained alongside the round-5
single-array aliased form (resident_flooding.py): on codes whose 2E
message planes fit VMEM anyway (every standards family except DVB-S2
normal-frame floats), this layout measures faster — the aliased form's
variable-phase read rotations regressed the dynamic-roll codes (5G BG1
i8 flooding 114.7 -> 82.7 Mbit/s, C2 626.9 -> 530.1; canonical r5
runs), while the aliased form's halved footprint is what fits the
flagship (499 vs streaming 239.8).  lifted_flooding picks dual
whenever it fits, aliased otherwise.

The flooding analog of ops/resident_layered.py: both message arrays
(v2c + c2v), the quantized channel planes, and the posterior hard bits
of one batch tile stay in VMEM for the whole decode, so HBM sees only
the initial load and the final store — zero traffic per iteration — and
a tile whose frames have all converged skips its remaining grid steps
(per-tile early exit with exact per-frame iteration counts).

This replaces the streaming phase kernels (fused_bp2.fused_check/var)
wherever the state fits, and fixes their structural inefficiency on
multi-bucket codes: Mosaic predicates vector code rather than branching,
so each streaming grid step *executes every degree bucket's check fold*
and discards all but one — an ~8x tax on 5G BG1's quadratic d=19 i8
fold (measured 14.6 ms/iter streaming vs ~3.7 for the same fold run
once per group in the resident layered kernel). Here each group's fold
runs exactly once per iteration, group-looped (`fori_loop`) or fully
static-unrolled per phase under the same program-size planning as the
layered kernel (static rolls, constant indices/pokes).

Flooding semantics are bit-identical to the streaming kernels and the
plane-gather path (reference flooding.rs:51-126): v2c initializes to
the rolled quantized channel planes with big-pokes on missing lanes,
each iteration runs the full check phase then the full variable phase,
the syndrome tests the posterior hard decisions, frames freeze at first
convergence, and the iteration-0 test uses the raw channel hard bits.

VMEM per tile (Bt=128): 2E message planes in storage dtype + VG channel
planes + VG int8 frozen + VG bf16 posterior bits. DVB-S2 r=1/2 i8:
~100 MB (fits); its float/bf16 flooding stays on the streaming path
(2E bf16 alone is 116 MB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fused_bp2 import BT, FusedLayout, _interpret, _roll
from .resident_layered import (
    GROUP_UNROLL_BUDGET,
    SWEEP_UNROLL_BUDGET,
    SYN_UNROLL_BUDGET,
    VMEM_BUDGET,
    VMEM_LIMIT,
    _rule_check_cost,
)

__all__ = [
    "resident_flooding_dual_supported",
    "resident_flooding_dual_pick_bt",
    "resident_flooding_dual_decode",
]


def _vmem_bytes(layout: FusedLayout, rule, qdtype, bt: int) -> int:
    Z = layout.Zp
    msgs = 2 * layout.E * Z * bt * jnp.dtype(rule.storage_dtype).itemsize
    q = layout.VG * Z * bt * jnp.dtype(qdtype).itemsize
    frozen = layout.VG * Z * bt
    bits = layout.VG * Z * bt * 2  # bf16 posterior hard bits
    tmp = (4 * max(layout.max_chk_degree, layout.max_var_degree) + 16) \
        * Z * bt * 4
    return msgs + q + frozen + bits + tmp


def resident_flooding_dual_supported(
    layout: FusedLayout, rule, qdtype, bt: int = BT
) -> bool:
    return (
        layout.fusable
        and layout.max_chk_degree <= rule.max_check_degree
        and layout.max_var_degree <= rule.max_var_degree
        and _vmem_bytes(layout, rule, qdtype, bt) <= VMEM_BUDGET
    )


def resident_flooding_dual_pick_bt(
    layout: FusedLayout, rule, qdtype, batch: int
) -> int:
    """Largest batch-tile width whose state fits VMEM (0 = none)."""
    import os

    env = os.environ.get("LDPC_RESIDENT_BT")
    if env:
        return int(env)
    b128 = -(-batch // BT) * BT
    for bt in (512, 384, 256, BT):
        if bt > b128 or b128 % bt:
            continue
        if resident_flooding_dual_supported(layout, rule, qdtype, bt):
            return bt
    return 0


def _plan(layout: FusedLayout, rule):
    """(unroll_check, unroll_var, unroll_syn) program-size plan."""
    import os

    env = os.environ.get("LDPC_RESIDENT_UNROLL")
    if env is not None:
        v = env not in ("0", "false", "")
        return v, v, v
    per_group = [
        10 * m.d + _rule_check_cost(rule, m.d) for m in layout.chk_meta
    ]
    check = sum(
        (m.g1 - m.g0) * c for m, c in zip(layout.chk_meta, per_group)
    )
    var = sum(
        (m.g1 - m.g0) * 14 * m.d for m in layout.var_meta
    )
    syn = 6 * layout.E
    return (
        check <= SWEEP_UNROLL_BUDGET
        and max(per_group, default=0) <= GROUP_UNROLL_BUDGET,
        var <= SWEEP_UNROLL_BUDGET,
        syn <= SYN_UNROLL_BUDGET,
    )


def resident_flooding_dual_decode(q_t, bits0_t, layout: FusedLayout, rule,
                             max_iterations: int):
    """(q, bits0) -> (bits, iters, conv); fully in-VMEM flooding decode.

    q_t: (nbt, VG, Z, Bt) quantized channel planes in the rule's storage
    dtype (float families) or int8 (i8 families); bits0_t: (nbt, VG, Z,
    Bt) int8 raw-channel hard decisions. Output contract matches
    resident_layered_decode.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt, VG, Z, Bt = q_t.shape  # Z = padded plane height (Zp)
    pad = Z - layout.Z
    E = layout.E
    chk_metas = layout.chk_meta
    var_metas = layout.var_meta
    store = rule.storage_dtype
    qdtype = q_t.dtype
    compute = rule.compute_dtype
    big = rule.big
    ITERS = int(max_iterations)
    unroll_check, unroll_var, unroll_syn = _plan(layout, rule)

    chk_bucket_has_mask = tuple(
        bool(
            (layout.chk_omask[m.ebase : m.ebase + (m.g1 - m.g0) * m.d] >= 0)
            .any()
        )
        for m in chk_metas
    )
    var_bucket_has_mask = tuple(
        bool(
            (layout.var_omask[m.ebase : m.ebase + (m.g1 - m.g0) * m.d] >= 0)
            .any()
        )
        for m in var_metas
    )
    syn_bucket_has_mask = tuple(
        bool(
            (layout.syn_mask[m.ebase : m.ebase + (m.g1 - m.g0) * m.d] >= 0)
            .any()
        )
        for m in chk_metas
    )

    def _sroll(x, s: int):
        if s == 0:
            return x
        if pad == 0:
            return pltpu.roll(x, s, 0)
        a = pltpu.roll(x, s, 0)
        b = pltpu.roll(x, s + pad, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(lane < s, b, a)

    def kernel(chk_cs_ref, chk_dest_ref, chk_rot_ref, chk_mask_ref,
               var_cs_ref, var_dest_ref, var_rot_ref, var_mask_ref,
               syn_vg_ref, syn_rot_ref, syn_mask_ref,
               q_in, bits_in, bits_out, iters_out, conv_out,
               v2c_buf, c2v_buf, q_buf, frozen, bits_buf,
               conv_buf, iters_buf, done_smem, sem):
        bt = pl.program_id(0)
        it = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)

        def poke(x, val, mask: int, force_pad: bool):
            """Set lane ``mask`` (and pad lanes) of x to val; static."""
            cond = None
            if mask >= 0:
                cond = lane == mask
            if pad and (force_pad or mask >= 0):
                p2 = lane >= layout.Z
                cond = p2 if cond is None else (cond | p2)
            return x if cond is None else jnp.where(cond, val, x)

        def syndrome_ok_rows():
            if unroll_syn:
                acc = jnp.zeros((Z, Bt), jnp.float32)
                for m in chk_metas:
                    if m.d == 0:
                        continue
                    for g in range(m.g0, m.g1):
                        par = None
                        for t in range(m.d):
                            e = m.ebase + (g - m.g0) * m.d + t
                            b = _sroll(
                                bits_buf[int(layout.syn_vg[e])].astype(
                                    jnp.float32
                                ),
                                int(layout.syn_rot[e]),
                            )
                            mask = int(layout.syn_mask[e])
                            if mask >= 0:
                                b = jnp.where(lane == mask, 0.0, b)
                            par = b if par is None else par + b
                        odd = par - 2.0 * jnp.floor(par * 0.5)
                        acc = jnp.maximum(acc, odd)
            else:
                acc = jnp.zeros((Z, Bt), jnp.float32)

                def acc_meta(acc, m, masked):
                    d = m.d

                    def grp(g, acc, m=m, d=d, masked=masked):
                        par = None
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            b = _roll(
                                bits_buf[syn_vg_ref[e]].astype(
                                    jnp.float32
                                ),
                                syn_rot_ref[e],
                                pad,
                            )
                            if masked:
                                b = jnp.where(
                                    lane == syn_mask_ref[e], 0.0, b
                                )
                            par = b if par is None else par + b
                        odd = par - 2.0 * jnp.floor(par * 0.5)
                        return jnp.maximum(acc, odd)

                    return jax.lax.fori_loop(m.g0, m.g1, grp, acc)

                for mi, m in enumerate(chk_metas):
                    if m.d == 0:
                        continue
                    acc = acc_meta(acc, m, syn_bucket_has_mask[mi])
            if pad:
                acc = jnp.where(lane >= layout.Z, 0.0, acc)
            bad = jnp.max(acc, axis=0, keepdims=True) > 0.5
            return jnp.broadcast_to(~bad, (8, Bt)).astype(jnp.int32)

        # ---- step 0: load, v2c init, flags reset ----
        @pl.when(it == 0)
        def _():
            cp = pltpu.make_async_copy(q_in.at[bt], q_buf, sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(bits_in.at[bt], frozen, sem)
            cp.start()
            cp.wait()

            def fill_bits(vg, _):
                bits_buf[vg] = frozen[vg].astype(jnp.bfloat16)
                return 0

            jax.lax.fori_loop(0, VG, fill_bits, 0)

            # v2c0[e] = roll(q[vg], s) with big-pokes (flooding.rs:88-100;
            # matches fused_var's init variant)
            if unroll_var:
                for m in var_metas:
                    for g in range(m.g0, m.g1):
                        qp = q_buf[g].astype(compute)
                        for t in range(m.d):
                            e = m.ebase + (g - m.g0) * m.d + t
                            o = _sroll(qp, int(layout.var_rot[e]))
                            o = poke(
                                o, big, int(layout.var_omask[e]), True
                            )
                            v2c_buf[int(layout.var_dest[e])] = (
                                o.astype(store)
                            )
            else:
                for m in var_metas:
                    d = m.d
                    if d == 0:
                        continue

                    def initg(g, _, m=m, d=d):
                        qp = q_buf[g].astype(compute)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            o = _roll(qp, var_rot_ref[e], pad)
                            o = jnp.where(lane == var_mask_ref[e], big, o)
                            if pad:
                                o = jnp.where(lane >= layout.Z, big, o)
                            v2c_buf[var_dest_ref[e]] = o.astype(store)
                        return 0

                    jax.lax.fori_loop(m.g0, m.g1, initg, 0)

            conv_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            iters_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            done_smem[0] = 0

        # ---- one flooding iteration: check phase then var phase ----
        @pl.when((it > 0) & (done_smem[0] == 0))
        def _():
            # check phase: v2c -> c2v (rolled to var coords, 0-pokes)
            if unroll_check:
                for m in chk_metas:
                    d = m.d
                    if d == 0:
                        continue
                    for g in range(m.g0, m.g1):
                        cs = int(layout.chk_cs[g])
                        xs = [
                            v2c_buf[cs + t].astype(compute)
                            for t in range(d)
                        ]
                        outs = rule.check(xs)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            o = _sroll(outs[t], int(layout.chk_rot[e]))
                            o = poke(o, 0, int(layout.chk_omask[e]), True)
                            c2v_buf[int(layout.chk_dest[e])] = (
                                o.astype(store)
                            )
            else:
                for mi, m in enumerate(chk_metas):
                    d = m.d
                    if d == 0:
                        continue

                    def chk(g, _, m=m, d=d,
                            masked=chk_bucket_has_mask[mi]):
                        cs = chk_cs_ref[g]
                        xs = [
                            v2c_buf[cs + t].astype(compute)
                            for t in range(d)
                        ]
                        outs = rule.check(xs)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            o = _roll(outs[t], chk_rot_ref[e], pad)
                            if masked or pad:
                                pk = lane == chk_mask_ref[e]
                                if pad:
                                    pk |= lane >= layout.Z
                                o = jnp.where(pk, 0, o)
                            c2v_buf[chk_dest_ref[e]] = o.astype(store)
                        return 0

                    jax.lax.fori_loop(m.g0, m.g1, chk, 0)

            # var phase: c2v + q -> v2c (rolled to check coords,
            # big-pokes) + posterior hard bits
            if unroll_var:
                for m in var_metas:
                    d = m.d
                    for g in range(m.g0, m.g1):
                        cs = int(layout.var_cs[g])
                        q = q_buf[g].astype(compute)
                        ys = [
                            c2v_buf[cs + t].astype(compute)
                            for t in range(d)
                        ]
                        outs, tot = rule.var(q, ys, d)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            o = _sroll(outs[t], int(layout.var_rot[e]))
                            o = poke(
                                o, big, int(layout.var_omask[e]), True
                            )
                            v2c_buf[int(layout.var_dest[e])] = (
                                o.astype(store)
                            )
                        bits_buf[g] = (tot <= 0).astype(jnp.bfloat16)
            else:
                for mi, m in enumerate(var_metas):
                    d = m.d

                    def var(g, _, m=m, d=d,
                            masked=var_bucket_has_mask[mi]):
                        cs = var_cs_ref[g]
                        q = q_buf[g].astype(compute)
                        ys = [
                            c2v_buf[cs + t].astype(compute)
                            for t in range(d)
                        ]
                        outs, tot = rule.var(q, ys, d)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            o = _roll(outs[t], var_rot_ref[e], pad)
                            if masked or pad:
                                pk = lane == var_mask_ref[e]
                                if pad:
                                    pk |= lane >= layout.Z
                                o = jnp.where(pk, big, o)
                            v2c_buf[var_dest_ref[e]] = o.astype(store)
                        bits_buf[g] = (tot <= 0).astype(jnp.bfloat16)
                        return 0

                    jax.lax.fori_loop(m.g0, m.g1, var, 0)

        # ---- shared epilogue: syndrome + freeze ----
        @pl.when(done_smem[0] == 0)
        def _():
            ok = syndrome_ok_rows()
            conv = conv_buf[...]
            newly = ok & (1 - conv)
            iters_buf[...] = jnp.where(newly != 0, it, iters_buf[...])
            conv_buf[...] = conv | ok
            done_smem[0] = (jnp.sum((conv | ok)[0:1]) == Bt).astype(
                jnp.int32
            )
            n_new = jnp.sum(newly[0:1])

            @pl.when((n_new > 0) & (it > 0))
            def _():
                nb = newly[0:1] != 0

                def freeze(vg, _):
                    frozen[vg] = jnp.where(
                        nb, bits_buf[vg].astype(jnp.int8), frozen[vg]
                    )
                    return 0

                jax.lax.fori_loop(0, VG, freeze, 0)

        # ---- last step: outputs ----
        @pl.when(it == ITERS)
        def _():
            cb = (conv_buf[0:1] != 0)

            def finalize(vg, _):
                frozen[vg] = jnp.where(
                    cb, frozen[vg], bits_buf[vg].astype(jnp.int8)
                )
                return 0

            jax.lax.fori_loop(0, VG, finalize, 0)
            iters_buf[...] = jnp.where(
                conv_buf[...] != 0, iters_buf[...], ITERS
            )
            cp = pltpu.make_async_copy(frozen, bits_out.at[bt], sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(iters_buf, iters_out.at[bt], sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(conv_buf, conv_out.at[bt], sem)
            cp.start()
            cp.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(nbt, ITERS + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((E, Z, Bt), store),
            pltpu.VMEM((E, Z, Bt), store),
            pltpu.VMEM((VG, Z, Bt), qdtype),
            pltpu.VMEM((VG, Z, Bt), jnp.int8),
            pltpu.VMEM((VG, Z, Bt), jnp.bfloat16),
            pltpu.VMEM((8, Bt), jnp.int32),
            pltpu.VMEM((8, Bt), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbt, VG, Z, Bt), jnp.int8),
            jax.ShapeDtypeStruct((nbt, 8, Bt), jnp.int32),
            jax.ShapeDtypeStruct((nbt, 8, Bt), jnp.int32),
        ],
        interpret=_interpret(),
        compiler_params=None
        if _interpret()
        else pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT
        ),
    )(
        jnp.asarray(layout.chk_cs),
        jnp.asarray(layout.chk_dest),
        jnp.asarray(layout.chk_rot),
        jnp.asarray(layout.chk_omask),
        jnp.asarray(layout.var_cs),
        jnp.asarray(layout.var_dest),
        jnp.asarray(layout.var_rot),
        jnp.asarray(layout.var_omask),
        jnp.asarray(layout.syn_vg),
        jnp.asarray(layout.syn_rot),
        jnp.asarray(layout.syn_mask),
        q_t,
        bits0_t,
    )

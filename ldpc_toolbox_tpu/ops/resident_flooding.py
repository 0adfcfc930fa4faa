"""VMEM-resident flooding BP decode (Pallas TPU), single message array.

The flooding analog of ops/resident_layered.py: the message state, the
quantized channel planes, and the posterior hard bits of one batch tile
stay in VMEM for the whole decode, so HBM sees only the initial load and
the final store — zero traffic per iteration — and a tile whose frames
have all converged skips its remaining grid steps (per-tile early exit
with exact per-frame iteration counts).

**One plane array holds both message directions.**  A flooding decoder
naively needs v2c and c2v arrays (2E planes — 116 MB for DVB-S2 r=1/2
bf16, which kept float flooding off the resident path through round 4).
But each v2c plane is consumed by exactly one check group and each c2v
plane by exactly one variable group, and both rules read all their
inputs before producing outputs, so the phases can update the SAME
E-plane array in place:

  * planes are indexed check-major and stored in *check* lane
    coordinates;
  * the check phase reads its contiguous slab (v2c), folds, and
    overwrites the slab with its c2v outputs (no rotation at all);
  * the variable phase gathers each incident c2v through the
    check->var rotation, computes the leave-one-out sums, and
    overwrites each gathered plane with the new v2c rotated back
    (var->check) — two rotations per edge, the same total as the
    two-array form.

This halves the resident VMEM state for every arithmetic family; in
particular DVB-S2 n=64800 bf16 min-sum flooding (E bf16 = 58 MB) — the
last streaming flooding cell — fits at Bt=128.

It also keeps the fix for the streaming kernels' structural
inefficiency on multi-bucket codes: Mosaic predicates vector code
rather than branching, so each streaming grid step *executes every
degree bucket's check fold* and discards all but one (an ~8x tax on 5G
BG1's quadratic d=19 i8 fold).  Here each group's fold runs exactly
once per iteration, group-looped (``fori_loop``) or fully
static-unrolled per phase under the same program-size planning as the
layered kernel (static rolls, constant indices/pokes).

Flooding semantics are bit-identical to the streaming kernels and the
plane-gather path (reference flooding.rs:51-126): v2c initializes to
the rolled quantized channel planes with big-pokes on missing lanes,
each iteration runs the full check phase then the full variable phase,
the syndrome tests the posterior hard decisions, frames freeze at first
convergence, and the iteration-0 test uses the raw channel hard bits.
Values are unchanged by the aliasing — only where rotations happen
moved (rotation is a lane permutation; it commutes with every
elementwise op here).

VMEM per tile (Bt=128): E message planes in storage dtype + VG channel
planes + VG int8 frozen + VG bf16 posterior bits.
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
    "resident_flooding_supported",
    "resident_flooding_pick_bt",
    "resident_flooding_decode",
]


def _vmem_bytes(layout: FusedLayout, rule, qdtype, bt: int) -> int:
    Z = layout.Zp
    msgs = layout.E * Z * bt * jnp.dtype(rule.storage_dtype).itemsize
    q = layout.VG * Z * bt * jnp.dtype(qdtype).itemsize
    frozen = layout.VG * Z * bt
    bits = layout.VG * Z * bt * 2  # bf16 posterior hard bits
    tmp = (4 * max(layout.max_chk_degree, layout.max_var_degree) + 16) \
        * Z * bt * 4
    return msgs + q + frozen + bits + tmp


def resident_flooding_supported(
    layout: FusedLayout, rule, qdtype, bt: int = BT
) -> bool:
    return (
        layout.fusable
        and layout.max_chk_degree <= rule.max_check_degree
        and layout.max_var_degree <= rule.max_var_degree
        and _vmem_bytes(layout, rule, qdtype, bt) <= VMEM_BUDGET
    )


def resident_flooding_pick_bt(
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
        if resident_flooding_supported(layout, rule, qdtype, bt):
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
        8 * m.d + _rule_check_cost(rule, m.d) for m in layout.chk_meta
    ]
    check = sum(
        (m.g1 - m.g0) * c for m, c in zip(layout.chk_meta, per_group)
    )
    var = sum(
        (m.g1 - m.g0) * 16 * m.d for m in layout.var_meta
    )
    syn = 6 * layout.E
    return (
        check <= SWEEP_UNROLL_BUDGET
        and max(per_group, default=0) <= GROUP_UNROLL_BUDGET,
        var <= SWEEP_UNROLL_BUDGET,
        syn <= SYN_UNROLL_BUDGET,
    )


def resident_flooding_decode(q_t, bits0_t, layout: FusedLayout, rule,
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

    # var-major per-edge tables: the check-major plane each var-side edge
    # reads/writes (var_dest), the var->check write rotation (var_rot = s)
    # and the check->var read rotation (its mod-Z inverse)
    read_rot = ((layout.Z - layout.var_rot) % layout.Z).astype(np.int32)

    chk_bucket_has_mask = tuple(
        bool(
            (layout.syn_mask[m.ebase : m.ebase + (m.g1 - m.g0) * m.d] >= 0)
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
    syn_bucket_has_mask = chk_bucket_has_mask

    def _sroll(x, s: int):
        if s == 0:
            return x
        if pad == 0:
            return pltpu.roll(x, s, 0)
        a = pltpu.roll(x, s, 0)
        b = pltpu.roll(x, s + pad, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(lane < s, b, a)

    def kernel(chk_cs_ref, chk_mask_ref,
               var_cs_ref, var_dest_ref, var_rot_ref, var_mask_ref,
               read_rot_ref,
               syn_vg_ref, syn_rot_ref, syn_mask_ref,
               q_in, bits_in, bits_out, iters_out, conv_out,
               msg_buf, q_buf, frozen, bits_buf,
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
                            msg_buf[int(layout.var_dest[e])] = (
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
                            msg_buf[var_dest_ref[e]] = o.astype(store)
                        return 0

                    jax.lax.fori_loop(m.g0, m.g1, initg, 0)

            conv_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            iters_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            done_smem[0] = 0

        # ---- one flooding iteration: check phase then var phase ----
        @pl.when((it > 0) & (done_smem[0] == 0))
        def _():
            # check phase: fold each slab in place, v2c -> c2v (check
            # coords, no rotation; 0-pokes at the check-side missing lane)
            if unroll_check:
                for m in chk_metas:
                    d = m.d
                    if d == 0:
                        continue
                    for g in range(m.g0, m.g1):
                        cs = int(layout.chk_cs[g])
                        xs = [
                            msg_buf[cs + t].astype(compute)
                            for t in range(d)
                        ]
                        outs = rule.check(xs)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            o = poke(
                                outs[t], 0, int(layout.syn_mask[e]), True
                            )
                            msg_buf[cs + t] = o.astype(store)
            else:
                for mi, m in enumerate(chk_metas):
                    d = m.d
                    if d == 0:
                        continue

                    def chk(g, _, m=m, d=d,
                            masked=chk_bucket_has_mask[mi]):
                        cs = chk_cs_ref[g]
                        xs = [
                            msg_buf[cs + t].astype(compute)
                            for t in range(d)
                        ]
                        outs = rule.check(xs)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            o = outs[t]
                            if masked or pad:
                                pk = lane == chk_mask_ref[e]
                                if pad:
                                    pk |= lane >= layout.Z
                                o = jnp.where(pk, 0, o)
                            msg_buf[cs + t] = o.astype(store)
                        return 0

                    jax.lax.fori_loop(m.g0, m.g1, chk, 0)

            # var phase: gather each incident c2v through the check->var
            # rotation, c2v + q -> v2c (rotated back var->check,
            # big-pokes) + posterior hard bits; the gathered planes are
            # overwritten only after all of the group's reads
            if unroll_var:
                for m in var_metas:
                    d = m.d
                    for g in range(m.g0, m.g1):
                        vs = int(layout.var_cs[g])
                        q = q_buf[g].astype(compute)
                        ys = [
                            _sroll(
                                msg_buf[
                                    int(layout.var_dest[vs + t])
                                ].astype(compute),
                                int(read_rot[vs + t]),
                            )
                            for t in range(d)
                        ]
                        outs, tot = rule.var(q, ys, d)
                        for t in range(d):
                            p = vs + t
                            o = _sroll(outs[t], int(layout.var_rot[p]))
                            o = poke(
                                o, big, int(layout.var_omask[p]), True
                            )
                            msg_buf[int(layout.var_dest[p])] = (
                                o.astype(store)
                            )
                        bits_buf[g] = (tot <= 0).astype(jnp.bfloat16)
            else:
                for mi, m in enumerate(var_metas):
                    d = m.d

                    def var(g, _, m=m, d=d,
                            masked=var_bucket_has_mask[mi]):
                        vs = var_cs_ref[g]
                        q = q_buf[g].astype(compute)
                        ys = [
                            _roll(
                                msg_buf[var_dest_ref[vs + t]].astype(
                                    compute
                                ),
                                read_rot_ref[vs + t],
                                pad,
                            )
                            for t in range(d)
                        ]
                        outs, tot = rule.var(q, ys, d)
                        for t in range(d):
                            p = vs + t
                            o = _roll(outs[t], var_rot_ref[p], pad)
                            if masked or pad:
                                pk = lane == var_mask_ref[p]
                                if pad:
                                    pk |= lane >= layout.Z
                                o = jnp.where(pk, big, o)
                            msg_buf[var_dest_ref[p]] = o.astype(store)
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
        num_scalar_prefetch=10,
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
        jnp.asarray(layout.syn_mask),
        jnp.asarray(layout.var_cs),
        jnp.asarray(layout.var_dest),
        jnp.asarray(layout.var_rot),
        jnp.asarray(layout.var_omask),
        jnp.asarray(read_rot),
        jnp.asarray(layout.syn_vg),
        jnp.asarray(layout.syn_rot),
        jnp.asarray(layout.syn_mask),
        q_t,
        bits0_t,
    )

"""Flooding BP on the block-circulant (lifted) layout.

Same per-frame semantics as decoder/flooding.py, but messages are whole
``(Z, batch)`` planes per base edge and the inter-phase permutation is the
rolled plane gather of ops/plane_gather.py — contiguous block DMAs instead
of row-granular gathers. This is the throughput path for DVB-S2 (Z=360),
5G NR (Z-lift), CCSDS AR4JA (Z=M/4) and C2 (Z=511).

Incomplete circulants (e.g. the missing corner of the DVB-S2 staircase at
row 0, codes/dvbs2.py) are neutralized per lane: +inf into the check-side
fold (exact for the float rules; 127 for i8, a one-lane approximation) and
0 into the variable-side sum (exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.plane_gather import plane_gather, plane_gather_reference
from .lifted import LiftedGraph

__all__ = ["lifted_flooding_decode"]


def _neutral_big(arithmetic):
    if arithmetic.is_int8:
        return jnp.asarray(127, arithmetic.compute_dtype)
    return jnp.asarray(jnp.inf, arithmetic.compute_dtype)


def _bucket_offsets(buckets):
    sizes = [len(b.groups) * b.degree for b in buckets]
    return np.cumsum([0] + sizes)


def _locate(buckets, position):
    """Map a flat edge position to (bucket index, row, slot)."""
    offs = _bucket_offsets(buckets)
    for i, b in enumerate(buckets):
        if offs[i] <= position < offs[i + 1]:
            rel = position - offs[i]
            return i, rel // b.degree, rel % b.degree
    raise ValueError(position)


def lifted_flooding_decode(
    lg: LiftedGraph,
    arithmetic,
    llrs,
    max_iterations: int,
    fused: bool = False,
    compact: bool = False,
    resident: bool | None = None,
):
    """Decode a (B, n) batch of channel LLRs on a lifted graph.

    ``fused=True`` runs the v2 Pallas fused phase kernels
    (ops/fused_bp2.py): messages are stored consumer-major pre-rolled,
    each phase is one kernel over all node groups — min-sum (float
    storage) and the i8 Minstarapprox/Aminstar families (int8 storage),
    any batch size (padded to a 128 multiple internally). Arithmetics or
    graphs without a fused implementation fall back to the plane-gather
    path below, which handles all 38 rules.

    ``compact=True`` adds staged converged-frame compaction
    (decoder/compaction.py) — bit-identical, faster at SNRs with long
    convergence tails, but opt-in here: the staged flooding program
    compiles 3 stage sizes x 3 kernels, a heavy compile through the
    remote-compile tunnel. (The layered schedule gets per-tile early
    exit from its VMEM-resident kernel instead.)
    """
    if fused:
        from ..ops.fused_bp2 import rule_for

        rule = rule_for(arithmetic)
        if rule is not None:
            try:
                return _fused_flooding_decode(
                    lg, arithmetic, rule, llrs, max_iterations, compact,
                    resident,
                )
            except ValueError as e:
                # multi-lane circulant gaps / degree caps: unfused fallback.
                # Loud, not silent — the fallback is ~5-10x slower and a
                # swallowed error here once hid a real kernel bug.
                import warnings

                warnings.warn(
                    f"fused decode unavailable for this graph ({e}); "
                    "falling back to the plane-gather path",
                    stacklevel=2,
                )
    Z = lg.Z
    B = llrs.shape[0]
    vb, cb = lg.var_buckets, lg.chk_buckets

    def gather(src, side):
        return plane_gather(
            src, side.planes, side.shifts
        )

    # channel LLRs as planes (VG, Z, B) in var-bucket group order
    col_of = lg.var_cols[lg.var_group_order]  # (VG, Z) original column
    llr_planes = llrs.T[jnp.asarray(col_of.reshape(-1))].reshape(
        lg.num_var_groups, Z, B
    )

    # missing-lane fixups, located per side
    chk_fix = []  # (bucket, row, slot, lanes)
    var_fix = []
    for vm_posn, cm_posn, lanes_c, lanes_v in lg.missing:
        ib, row, slot = _locate(cb, cm_posn)
        chk_fix.append((ib, row, slot, np.asarray(lanes_c)))
        ibv, rowv, slotv = _locate(vb, vm_posn)
        var_fix.append((ibv, rowv, slotv, np.asarray(lanes_v)))

    # group-plane row ranges per var bucket
    vg_starts = np.cumsum([0] + [len(b.groups) for b in vb])

    q_planes = arithmetic.quantize(llr_planes)  # (VG, Z, B)
    q_parts = [
        q_planes[vg_starts[i] : vg_starts[i + 1]] for i in range(len(vb))
    ]

    store = arithmetic.storage_dtype
    compute = arithmetic.compute_dtype
    big = _neutral_big(arithmetic)

    def check_satisfied(hard):
        """hard: (VG, Z, B) bool planes -> (B,) all-checks-satisfied."""
        bits = hard.astype(jnp.int8)
        bad = None
        for i, b in enumerate(cb):
            if b.degree == 0 or len(b.groups) == 0:
                continue
            g = plane_gather(
                bits, b.var_group_pos, b.shifts
            )  # (G, d, Z, B)
            for ib, row, slot, lanes in chk_fix:
                if ib == i:
                    g = g.at[row, slot, jnp.asarray(lanes)].set(0)
            syn = (jnp.sum(g, axis=1, dtype=jnp.int32) & 1).astype(bool)
            any_bad = jnp.any(syn, axis=(0, 1))
            bad = any_bad if bad is None else (bad | any_bad)
        if bad is None:
            return jnp.ones(B, bool)
        return ~bad

    hard0 = llr_planes <= 0
    ok0 = check_satisfied(hard0)

    # v2c0: each edge's plane starts as its variable group's channel LLRs
    v2c0 = jnp.concatenate(
        [
            jnp.repeat(q_parts[i], b.degree, axis=0)
            for i, b in enumerate(vb)
            if b.degree > 0 and len(b.groups)
        ]
    ).astype(store)

    def iterate(v2c):
        c2v_parts = []
        for i, b in enumerate(cb):
            if b.degree == 0 or len(b.groups) == 0:
                continue
            x = gather(v2c, b).astype(compute)  # (G, d, Z, B)
            for ib, row, slot, lanes in chk_fix:
                if ib == i:
                    x = x.at[row, slot, jnp.asarray(lanes)].set(big)
            G, d = len(b.groups), b.degree
            out = arithmetic.check_messages(x.reshape(G, d, Z * B))
            c2v_parts.append(out.reshape(G * d, Z, B).astype(store))
        c2v = jnp.concatenate(c2v_parts)

        v2c_parts = []
        llr_parts = []
        for i, b in enumerate(vb):
            if len(b.groups) == 0:
                continue
            if b.degree == 0:
                llr_parts.append(q_parts[i])
                continue
            y = gather(c2v, b).astype(compute)
            for ib, row, slot, lanes in var_fix:
                if ib == i:
                    y = y.at[row, slot, jnp.asarray(lanes)].set(0)
            G, d = len(b.groups), b.degree
            v2c_b, llr_b = arithmetic.var_update(
                q_parts[i].reshape(G, Z * B), y.reshape(G, d, Z * B)
            )
            v2c_parts.append(v2c_b.reshape(G * d, Z, B).astype(store))
            llr_parts.append(llr_b.reshape(G, Z, B))
        v2c_new = jnp.concatenate(v2c_parts)
        out_llr = jnp.concatenate(llr_parts)
        return v2c_new, out_llr

    def body(state):
        it, v2c, _hard, converged, iters, frozen = state
        v2c_new, out_llr = iterate(v2c)
        hard = arithmetic.hard_decision(out_llr)
        ok = check_satisfied(hard)
        newly = ok & ~converged
        it = it + 1
        iters = jnp.where(newly, it, iters)
        frozen = jnp.where(newly[None, None, :], hard, frozen)
        return (it, v2c_new, hard, converged | ok, iters, frozen)

    def cond(state):
        it, _v2c, _hard, converged, _iters, _frozen = state
        return (it < max_iterations) & ~jnp.all(converged)

    init = (
        jnp.int32(0),
        v2c0,
        hard0,
        ok0,
        jnp.zeros(B, jnp.int32),
        hard0,
    )
    it, _v2c, hard_final, converged, iters, frozen = jax.lax.while_loop(
        cond, body, init
    )

    hard_planes = jnp.where(converged[None, None, :], frozen, hard_final)
    # map (VG, Z) planes back to original column order
    inv = np.empty(lg.n, np.int64)
    inv[col_of.reshape(-1)] = np.arange(lg.num_var_groups * Z)
    codeword = hard_planes.reshape(lg.num_var_groups * Z, B)[
        jnp.asarray(inv)
    ]
    iters = jnp.where(converged, iters, max_iterations)
    return {
        "codeword": codeword.T.astype(jnp.uint8),
        "iterations": iters,
        "success": converged,
    }


def _fused_flooding_decode(
    lg: LiftedGraph, arithmetic, rule, llrs, max_iterations: int,
    compact: bool = True, resident: bool | None = None,
):
    """Flooding via the fused Pallas kernels.

    ``resident`` (default auto): the whole decode runs inside one kernel
    with v2c/c2v/channel planes VMEM-resident — zero HBM traffic per
    iteration, one execution per node group per iteration, per-tile
    early exit (ops/resident_flooding.py). Auto-selected whenever the
    state fits the VMEM budget; DVB-S2-size float flooding falls back to
    the streaming phase kernels (ops/fused_bp2.py): messages stored
    consumer-major pre-rolled, check reads v2c as contiguous slabs,
    writes c2v scattered var-major; the variable kernel does the reverse
    and also emits int8 hard-decision bit planes that feed the
    VMEM-resident syndrome kernel.
    """
    from ..ops.fused_bp2 import (
        BT,
        build_fused_layout,
        fused_check,
        fused_syndrome_bits,
        fused_var,
    )
    from ..ops.resident_compressed import (
        compressed_flooding_decode,
        compressed_flooding_pick_bt,
    )
    from ..ops.resident_flooding import (
        resident_flooding_decode,
        resident_flooding_pick_bt,
    )
    from ..ops.resident_flooding_dual import (
        resident_flooding_dual_decode,
        resident_flooding_dual_pick_bt,
    )

    Z = lg.Z
    B_user = llrs.shape[0]
    layout = build_fused_layout(lg)
    if (
        layout.max_chk_degree > rule.max_check_degree
        or layout.max_var_degree > rule.max_var_degree
        or not layout.fusable
    ):
        raise ValueError(
            "graph unsupported by the fused kernels (node degree above "
            "the VMEM unroll cap)"
        )
    store = rule.storage_dtype
    qdtype = store  # channel planes: storage dtype (floats) / i8 (int8)
    import os

    # resident form preference (kernels are bit-identical; see
    # ops/resident_flooding_dual.py for the measured tradeoff):
    #   dual two-array (r4)  when 2E message planes fit VMEM,
    #   aliased single-array when only E fits (DVB-S2 float flooding),
    #   compressed check-state as the min-sum-class backstop,
    #   streaming otherwise.
    decode_fn = None
    bt = 0
    if not os.environ.get("LDPC_FORCE_ALIASED") and not os.environ.get(
        "LDPC_FORCE_COMPRESSED"
    ):
        bt = resident_flooding_dual_pick_bt(layout, rule, qdtype, B_user)
        if bt:
            decode_fn = resident_flooding_dual_decode
    if bt == 0 and not os.environ.get("LDPC_FORCE_COMPRESSED"):
        bt = resident_flooding_pick_bt(layout, rule, qdtype, B_user)
        if bt:
            decode_fn = resident_flooding_decode
    if bt == 0:
        btc = compressed_flooding_pick_bt(layout, rule, qdtype, B_user)
        if btc:
            bt = btc
            decode_fn = compressed_flooding_decode
    if resident is None:
        resident = bt > 0
    if resident and decode_fn is None:
        # caller forced resident=True on a shape nothing claims: best
        # effort with the aliased (smallest-footprint) kernel at BT
        decode_fn = resident_flooding_decode
    tile_w = bt if (resident and bt) else BT
    if B_user % tile_w:
        # pad with strongly-positive LLRs: the all-zero codeword satisfies
        # every check at iteration 0, so pad frames converge instantly and
        # never hold the while_loop open; outputs are sliced back below
        pad = tile_w - B_user % tile_w
        llrs = jnp.concatenate(
            [llrs, jnp.full((pad, llrs.shape[1]), 100.0, llrs.dtype)]
        )
    B = llrs.shape[0]
    nbt = B // tile_w
    VG, E = layout.VG, layout.E

    col_of = lg.var_cols[lg.var_group_order]  # (VG, Z) original column
    if jnp.issubdtype(store, jnp.floating):
        # cast before the gather: halves its traffic, quantize is identity
        llr_planes = (
            llrs.astype(store)
            .T[jnp.asarray(col_of.reshape(-1))]
            .reshape(VG, Z, B)
        )
        q_planes = llr_planes
    else:
        llr_planes = (
            llrs.astype(jnp.float32)
            .T[jnp.asarray(col_of.reshape(-1))]
            .reshape(VG, Z, B)
        )
        q_planes = arithmetic.quantize(llr_planes).astype(store)

    lane_pad = layout.Zp - Z  # mod-Z roll padding (e.g. C2's Z=511->512)

    def tile(x):  # (P, Z, B) -> (nbt, P, Zp, Bt)
        P = x.shape[0]
        x = x.reshape(P, Z, nbt, tile_w).transpose(2, 0, 1, 3)
        if lane_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, lane_pad), (0, 0)))
        return x

    def untile(x):  # (nbt, P, Zp, Bt) -> (P, Z, B)
        P = x.shape[1]
        if lane_pad:
            x = x[:, :, :Z, :]
        return x.transpose(1, 2, 0, 3).reshape(P, Z, B)

    q_tiled = tile(q_planes)
    # iteration-0 convergence tests the *raw* channel hard decisions
    # (flooding.rs:56-64 checks the unquantized input llrs)
    bits0 = tile((llr_planes <= 0).astype(jnp.int8))

    inv0 = np.empty(lg.n, np.int64)
    inv0[col_of.reshape(-1)] = np.arange(VG * Z)

    if resident:
        bits, iters_t, conv_t = decode_fn(
            q_tiled, bits0, layout, rule, max_iterations
        )
        hard = untile(bits)
        codeword = hard.reshape(VG * Z, B)[jnp.asarray(inv0)]
        return {
            "codeword": codeword.T.astype(jnp.uint8)[:B_user],
            "iterations": iters_t[:, 0, :].reshape(-1)[:B_user],
            "success": (conv_t[:, 0, :].reshape(-1) != 0)[:B_user],
        }

    # flooding init in-kernel: v2c0[e] = roll(q[vg], s) + pokes
    v2c0_t, _bits_q0 = fused_var(None, q_tiled, layout, rule)

    def flags_to_ok(flags):  # (nbt, 8, Bt) -> (B,) all checks satisfied
        return flags[:, 0, :].reshape(-1) == 0

    ok0 = flags_to_ok(fused_syndrome_bits(bits0, layout))

    inv = np.empty(lg.n, np.int64)
    inv[col_of.reshape(-1)] = np.arange(VG * Z)

    if compact:
        from .compaction import staged_while_decode

        def iteration(big, const):
            (v2c_t,) = big
            (q_t,) = const
            c2v_t = fused_check(v2c_t, layout, rule)
            v2c_t, bits = fused_var(c2v_t, q_t, layout, rule)
            return (v2c_t,), bits

        hard, iters, converged = staged_while_decode(
            nbt=nbt,
            bt=BT,
            max_iterations=max_iterations,
            init_big=(v2c0_t,),
            const_big=(q_tiled,),
            bits0=bits0,
            ok0=ok0,
            iteration=iteration,
            syndrome_ok=lambda bits: flags_to_ok(
                fused_syndrome_bits(bits, layout)
            ),
        )
        if lane_pad:
            hard = hard[:, :Z, :]
        codeword = hard.reshape(VG * Z, B)[jnp.asarray(inv)]
        return {
            "codeword": codeword.T.astype(jnp.uint8)[:B_user],
            "iterations": iters[:B_user],
            "success": converged[:B_user],
        }

    def body(state):
        it, v2c_t, _bits, converged, iters, frozen = state
        c2v_t = fused_check(v2c_t, layout, rule)
        v2c_t, bits = fused_var(c2v_t, q_tiled, layout, rule)
        ok = flags_to_ok(fused_syndrome_bits(bits, layout))
        newly = ok & ~converged
        it = it + 1
        iters = jnp.where(newly, it, iters)
        nt = newly.reshape(nbt, 1, 1, BT)
        frozen = jnp.where(nt, bits, frozen)
        return (it, v2c_t, bits, converged | ok, iters, frozen)

    def cond(state):
        return (state[0] < max_iterations) & ~jnp.all(state[3])

    init = (jnp.int32(0), v2c0_t, bits0, ok0, jnp.zeros(B, jnp.int32), bits0)
    it, _v, bits_final, converged, iters, frozen = jax.lax.while_loop(
        cond, body, init
    )

    hard_planes = untile(
        jnp.where(converged.reshape(nbt, 1, 1, BT), frozen, bits_final)
    ).astype(bool)
    codeword = hard_planes.reshape(VG * Z, B)[jnp.asarray(inv)]
    iters = jnp.where(converged, iters, max_iterations)
    return {
        "codeword": codeword.T.astype(jnp.uint8)[:B_user],
        "iterations": iters[:B_user],
        "success": converged[:B_user],
    }

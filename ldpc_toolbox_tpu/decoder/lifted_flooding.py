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
    use_pallas=None,
    fused: bool = False,
):
    """Decode a (B, n) batch of channel LLRs on a lifted graph.

    ``fused=True`` runs the Pallas fused phase kernels (ops/fused_bp.py):
    messages stay lane-doubled in HBM and each phase is one kernel per
    degree bucket — min-sum arithmetic only, float32, batch a multiple of
    128. The default path uses the rolled plane gather + the generic
    arithmetic (any of the 38 rules).
    """
    if fused:
        return _fused_minsum_decode(lg, arithmetic, llrs, max_iterations)
    Z = lg.Z
    B = llrs.shape[0]
    vb, cb = lg.var_buckets, lg.chk_buckets

    def gather(src, side):
        return plane_gather(
            src, side.planes, side.shifts, use_pallas=use_pallas
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
                bits,
                b.var_group_pos,
                b.shifts,
                use_pallas=use_pallas,
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


def _fused_minsum_decode(lg: LiftedGraph, arithmetic, llrs, max_iterations: int):
    """Min-sum flooding via the fused Pallas phase kernels."""
    from ..ops.fused_bp import (
        BT,
        MAX_FUSED_DEGREE,
        double_planes,
        fused_check_minsum,
        fused_syndrome,
        fused_var_update,
        poke_doubled,
        undouble_planes,
    )
    from ..ops.plane_gather import plane_gather_reference

    Z = lg.Z
    B = llrs.shape[0]
    assert B % 128 == 0, "fused path needs batch as a multiple of 128"
    vb, cb = lg.var_buckets, lg.chk_buckets
    scale = getattr(arithmetic, "scale", 1.0)
    # the kernels run entirely in the storage dtype (f32, or bf16 for
    # Minsumbf16 — min/sign are exact in bf16, sums lose ~ulp precision)
    dtype = arithmetic.storage_dtype
    assert jnp.issubdtype(dtype, jnp.floating), "fused path is float-only"
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nbt = B // BT

    col_of = lg.var_cols[lg.var_group_order]  # (VG, Z)
    llr_planes = llrs.T[jnp.asarray(col_of.reshape(-1))].reshape(
        lg.num_var_groups, Z, B
    ).astype(dtype)

    vg_starts = np.cumsum([0] + [len(b.groups) for b in vb])
    q_parts = [
        llr_planes[vg_starts[i] : vg_starts[i + 1]] for i in range(len(vb))
    ]

    def tile_q(q):  # (G, Z, B) -> (nbt, G, Z, Bt)
        G = q.shape[0]
        return q.reshape(G, Z, nbt, BT).transpose(2, 0, 1, 3)

    q_tiles = [tile_q(q) for q in q_parts]

    # per-bucket single-lane exclusion tables for the fused syndrome (the
    # incomplete-circulant fixup); multi-lane gaps fall back to the jnp path
    offs = _bucket_offsets(cb)
    mask_lanes = [np.full(len(b.groups) * b.degree, -1, np.int32) for b in cb]
    syndrome_fusable = [b.degree <= MAX_FUSED_DEGREE for b in cb]
    for _vm, cm_posn, lanes_c, _lv in lg.missing:
        for i, b in enumerate(cb):
            if offs[i] <= cm_posn < offs[i + 1]:
                if len(lanes_c) == 1:
                    mask_lanes[i][cm_posn - offs[i]] = int(lanes_c[0])
                else:
                    syndrome_fusable[i] = False

    def check_satisfied_fused(post_doubled):
        """(nbt, VG, 2Z+align, Bt) doubled posteriors -> (B,) all
        satisfied."""
        bad = None
        for i, b in enumerate(cb):
            if b.degree == 0 or len(b.groups) == 0:
                continue
            if syndrome_fusable[i]:
                syn = fused_syndrome(
                    post_doubled, b.var_group_pos, b.shifts, mask_lanes[i],
                    len(b.groups), b.degree, Z, B,
                )
                any_bad = jnp.any(syn.astype(bool), axis=0)
            else:
                bits = (undouble_planes(post_doubled, Z) <= 0).astype(
                    jnp.int8
                )
                g = plane_gather_reference(bits, b.var_group_pos, b.shifts)
                for _vm2, cm_posn, lanes_c, _lv2 in lg.missing:
                    if offs[i] <= cm_posn < offs[i + 1]:
                        rel = cm_posn - offs[i]
                        g = g.at[
                            rel // b.degree, rel % b.degree,
                            jnp.asarray(lanes_c),
                        ].set(0)
                syn = (jnp.sum(g, axis=1, dtype=jnp.int32) & 1).astype(bool)
                any_bad = jnp.any(syn, axis=(0, 1))
            bad = any_bad if bad is None else (bad | any_bad)
        return jnp.ones(B, bool) if bad is None else ~bad

    llr_doubled = double_planes(llr_planes)
    hard0 = llr_planes <= 0
    ok0 = check_satisfied_fused(llr_doubled)

    def poke_v2c(v2c_d):
        for vm_posn, _cm, _lanes_c, lanes_v in lg.missing:
            v2c_d = poke_doubled(v2c_d, vm_posn, lanes_v, big)
        return v2c_d

    def poke_c2v(c2v_d):
        for _vm, cm_posn, lanes_c, _lv in lg.missing:
            c2v_d = poke_doubled(c2v_d, cm_posn, lanes_c, 0)
        return c2v_d

    v2c0 = jnp.concatenate(
        [
            jnp.repeat(q_parts[i], b.degree, axis=0)
            for i, b in enumerate(vb)
            if b.degree > 0 and len(b.groups)
        ]
    )
    v2c0_d = poke_v2c(double_planes(v2c0))

    def gather_jnp(src_d, side):
        """Unfused fallback for buckets too wide for VMEM: gather rolled
        planes from the doubled tiled array with XLA's gather."""
        G, d = side.planes.shape
        align = src_d.shape[2] - 2 * Z
        lanes = (
            np.arange(Z)[None, None, :] + Z - side.shifts[:, :, None]
        )  # index into the doubled axis: Z - shift + l
        flat = side.planes[:, :, None] * (2 * Z + align) + lanes
        out = src_d.reshape(nbt, -1, B // nbt)[:, jnp.asarray(flat.reshape(-1))]
        return out.reshape(nbt, G, d, Z, B // nbt).transpose(
            1, 2, 3, 0, 4
        ).reshape(G, d, Z, B)

    def iterate(v2c_d):
        c2v_parts = []
        for b in cb:
            if b.degree == 0 or len(b.groups) == 0:
                continue
            if b.degree <= MAX_FUSED_DEGREE:
                c2v_parts.append(
                    fused_check_minsum(
                        v2c_d, b.planes, b.shifts,
                        len(b.groups), b.degree, Z, B, scale=scale,
                    )
                )
            else:
                x = gather_jnp(v2c_d, b)
                G, d = len(b.groups), b.degree
                out = arithmetic.check_messages(x.reshape(G, d, Z * B))
                c2v_parts.append(
                    double_planes(out.reshape(G * d, Z, B))
                )
        c2v_d = poke_c2v(jnp.concatenate(c2v_parts, axis=1))

        v2c_parts = []
        post_parts = []
        for i, b in enumerate(vb):
            if len(b.groups) == 0:
                continue
            if b.degree == 0:
                post_parts.append(double_planes(q_parts[i]))
                continue
            if b.degree <= MAX_FUSED_DEGREE:
                v2c_b, post_b = fused_var_update(
                    c2v_d, b.planes, b.shifts, q_tiles[i],
                    len(b.groups), b.degree, Z, B,
                )
            else:
                y = gather_jnp(c2v_d, b)
                G, d = len(b.groups), b.degree
                v2c_blk, post_blk = arithmetic.var_update(
                    q_parts[i].reshape(G, Z * B), y.reshape(G, d, Z * B)
                )
                v2c_b = double_planes(v2c_blk.reshape(G * d, Z, B))
                post_b = double_planes(post_blk.reshape(G, Z, B))
            v2c_parts.append(v2c_b)
            post_parts.append(post_b)
        v2c_d = poke_v2c(jnp.concatenate(v2c_parts, axis=1))
        return v2c_d, jnp.concatenate(post_parts, axis=1)

    def body(state):
        it, v2c_d, _hard, converged, iters, frozen = state
        v2c_d, post_d = iterate(v2c_d)
        hard = undouble_planes(post_d, Z) <= 0
        ok = check_satisfied_fused(post_d)
        newly = ok & ~converged
        it = it + 1
        iters = jnp.where(newly, it, iters)
        frozen = jnp.where(newly[None, None, :], hard, frozen)
        return (it, v2c_d, hard, converged | ok, iters, frozen)

    def cond(state):
        return (state[0] < max_iterations) & ~jnp.all(state[3])

    init = (jnp.int32(0), v2c0_d, hard0, ok0, jnp.zeros(B, jnp.int32), hard0)
    it, _v, hard_final, converged, iters, frozen = jax.lax.while_loop(
        cond, body, init
    )

    hard_planes = jnp.where(converged[None, None, :], frozen, hard_final)
    inv = np.empty(lg.n, np.int64)
    inv[col_of.reshape(-1)] = np.arange(lg.num_var_groups * Z)
    codeword = hard_planes.reshape(lg.num_var_groups * Z, B)[jnp.asarray(inv)]
    iters = jnp.where(converged, iters, max_iterations)
    return {
        "codeword": codeword.T.astype(jnp.uint8),
        "iterations": iters,
        "success": converged,
    }

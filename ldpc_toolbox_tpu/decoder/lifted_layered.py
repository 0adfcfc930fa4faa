"""Horizontal-layered BP on the block-circulant (lifted) layout.

The reference's fast-convergence schedule (horizontal_layered.rs:49-110)
sweeps check nodes serially: x = Qv - Rcv, recompute Rcv, update Qv in
place. On the lifted layout a *layer* is one check group — Z structurally
parallel checks (one circulant row block): within a layer every check
touches a distinct lane of each incident variable group, so the parallel
update matches the serial one except when a layer contains two base edges
into the same variable group (possible in DVB-S2); those deltas sum
against the layer-entry Qv, which changes the bit pattern but not the
convergence class (the same caveat as the generic greedy-colored
schedule, ARCHITECTURE.md "Known divergences").

Layer order is check-bucket-major (the fused layout's flat group order),
not the reference's 0..m row sweep — the reference's row r = a + b*q
ordering interleaves groups and cannot be parallelized as written.

Two paths with identical semantics, compared bit-exactly in tests:

* plain-jnp reference (any arithmetic): `lax.scan` per bucket over its
  layers, plane gathers + rolls,
* fused Pallas (min-sum + i8 families): one kernel per iteration keeps
  the whole Qv tile VMEM-resident and streams Rcv slabs
  (ops/fused_layered.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fused_bp2 import BT, build_fused_layout, fused_syndrome_bits
from .lifted import LiftedGraph

__all__ = ["lifted_layered_decode"]


def lifted_layered_decode(
    lg: LiftedGraph,
    arithmetic,
    llrs,
    max_iterations: int,
    fused: bool = False,
    compact: bool = True,
    resident: bool | None = None,
):
    """Decode a (B, n) batch of channel LLRs, layered schedule, lifted
    layout. Same output contract as lifted_flooding_decode.

    Fused-path variants (both bit-identical to the jnp reference):

    * ``resident`` (default auto): the whole decode runs inside one
      kernel with the tile state VMEM-resident — zero HBM traffic per
      iteration, per-tile early exit (ops/resident_layered.py). Auto
      selects it whenever the code's state fits the VMEM budget.
    * otherwise the per-iteration streaming kernel
      (ops/fused_layered.py) under a while_loop; ``compact`` enables
      staged converged-frame compaction (decoder/compaction.py).
    """
    if fused:
        from ..ops.fused_bp2 import rule_for
        from ..ops.fused_layered import fused_layered_supported

        rule = rule_for(arithmetic)
        if rule is not None and fused_layered_supported(lg, rule):
            return _fused_layered_decode(
                lg, arithmetic, rule, llrs, max_iterations, compact,
                resident,
            )
    return _jnp_layered_decode(lg, arithmetic, llrs, max_iterations)


def _planes_of(lg, llrs, dtype):
    """Channel LLRs as (VG, Z, B) planes in var-bucket group order."""
    Z = lg.Z
    col_of = lg.var_cols[lg.var_group_order]
    VG = lg.num_var_groups
    B = llrs.shape[0]
    planes = (
        llrs.astype(dtype)
        .T[jnp.asarray(col_of.reshape(-1))]
        .reshape(VG, Z, B)
    )
    return planes, col_of


def _codeword_from_planes(lg, col_of, hard_planes):
    Z = lg.Z
    VG = lg.num_var_groups
    inv = np.empty(lg.n, np.int64)
    inv[col_of.reshape(-1)] = np.arange(VG * Z)
    B = hard_planes.shape[-1]
    return hard_planes.reshape(VG * Z, B)[jnp.asarray(inv)].T.astype(
        jnp.uint8
    )


def _jnp_layered_decode(lg, arithmetic, llrs, max_iterations):
    Z = lg.Z
    B = llrs.shape[0]
    layout = build_fused_layout(lg)
    E, VG = layout.E, layout.VG
    compute = arithmetic.compute_dtype
    store = arithmetic.storage_dtype
    qv_store = arithmetic.var_llr_storage_dtype
    big = 127 if arithmetic.is_int8 else jnp.asarray(jnp.inf, compute)

    llr_planes, col_of = _planes_of(lg, llrs, jnp.float32)
    q = arithmetic.quantize(llr_planes)
    qv0 = arithmetic.llr_to_var_llr(q).astype(qv_store)
    rcv0 = jnp.zeros((E, Z, B), store)

    vg_arr = jnp.asarray(layout.syn_vg)
    rot_arr = jnp.asarray(layout.syn_rot)  # +s (var -> check coords)
    mask_arr = jnp.asarray(layout.syn_mask)
    lane = jnp.arange(Z)[None, :, None]

    def check_ok(bits):
        """(VG, Z, B) int8 -> (B,) all checks satisfied."""
        g = bits[vg_arr].astype(jnp.int8)  # (E, Z, B)
        idx = (jnp.arange(Z)[None, :] - rot_arr[:, None]) % Z
        rolled = jnp.take_along_axis(g, idx[..., None], axis=1)
        rolled = jnp.where(lane == mask_arr[:, None, None], 0, rolled)
        bad = None
        for m in layout.chk_meta:
            blk = rolled[m.ebase : m.ebase + (m.g1 - m.g0) * m.d]
            syn = (
                jnp.sum(
                    blk.reshape(m.g1 - m.g0, m.d, Z, B),
                    axis=1,
                    dtype=jnp.int32,
                )
                & 1
            )
            any_bad = jnp.any(syn.astype(bool), axis=(0, 1))
            bad = any_bad if bad is None else bad | any_bad
        return jnp.ones(B, bool) if bad is None else ~bad

    hard0 = llr_planes <= 0
    ok0 = check_ok(hard0.astype(jnp.int8))

    def sweep(qv, rcv):
        for m in layout.chk_meta:
            d = m.d

            def step(carry, j, m=m, d=d):
                qv, rcv = carry
                e0 = m.ebase + j * d
                vgs = jax.lax.dynamic_slice(vg_arr, (e0,), (d,))
                rots = jax.lax.dynamic_slice(rot_arr, (e0,), (d,))
                masks = jax.lax.dynamic_slice(mask_arr, (e0,), (d,))
                qv_g = qv[vgs].astype(compute)  # (d, Z, B)
                idx_vc = (jnp.arange(Z)[None, :] - rots[:, None]) % Z
                qv_c = jnp.take_along_axis(qv_g, idx_vc[..., None], axis=1)
                rold = jax.lax.dynamic_slice(
                    rcv, (e0, 0, 0), (d, Z, B)
                ).astype(compute)
                x = arithmetic.layered_x(qv_c, rold)
                x = jnp.where(lane == masks[:, None, None], big, x)
                rnew = arithmetic.check_messages(
                    x.reshape(1, d, Z * B)
                ).reshape(d, Z, B)
                rnew = jnp.where(lane == masks[:, None, None], 0, rnew)
                delta = arithmetic.layered_qv_delta(rnew, rold)
                idx_cv = (jnp.arange(Z)[None, :] + rots[:, None]) % Z
                delta_v = jnp.take_along_axis(
                    delta, idx_cv[..., None], axis=1
                )
                qv = qv.at[vgs].add(delta_v.astype(qv.dtype))
                rcv = jax.lax.dynamic_update_slice(
                    rcv, rnew.astype(store), (e0, 0, 0)
                )
                return (qv, rcv), None

            (qv, rcv), _ = jax.lax.scan(
                step, (qv, rcv), jnp.arange(m.g1 - m.g0)
            )
        return qv, rcv

    def body(state):
        it, qv, rcv, _hard, converged, iters, frozen = state
        qv, rcv = sweep(qv, rcv)
        out_llr = arithmetic.var_llr_to_llr(qv.astype(compute))
        hard = arithmetic.hard_decision(out_llr)
        ok = check_ok(hard.astype(jnp.int8))
        newly = ok & ~converged
        it = it + 1
        iters = jnp.where(newly, it, iters)
        frozen = jnp.where(newly[None, None, :], hard, frozen)
        return (it, qv, rcv, hard, converged | ok, iters, frozen)

    def cond(state):
        return (state[0] < max_iterations) & ~jnp.all(state[4])

    init = (
        jnp.int32(0),
        qv0,
        rcv0,
        hard0,
        ok0,
        jnp.zeros(B, jnp.int32),
        hard0,
    )
    it, _qv, _rcv, hard_final, converged, iters, frozen = jax.lax.while_loop(
        cond, body, init
    )
    hard_planes = jnp.where(converged[None, None, :], frozen, hard_final)
    iters = jnp.where(converged, iters, max_iterations)
    return {
        "codeword": _codeword_from_planes(lg, col_of, hard_planes),
        "iterations": iters,
        "success": converged,
    }


def _fused_layered_decode(lg, arithmetic, rule, llrs, max_iterations,
                          compact=True, resident=None):
    import os

    from ..ops.fused_layered import fused_layered_iteration
    from ..ops.resident_compressed import (
        compressed_layered_decode,
        compressed_layered_pick_bt,
    )
    from ..ops.resident_layered import (
        resident_layered_decode,
        resident_pick_bt,
    )

    Z = lg.Z
    B_user = llrs.shape[0]
    layout = build_fused_layout(lg)
    store = rule.storage_dtype
    qv_store = rule.qv_dtype(arithmetic)

    # resident path: widest batch tile whose state fits VMEM (small codes
    # take 256-512-wide tiles); streaming path: the standard BT
    bt = resident_pick_bt(layout, rule, qv_store, B_user)
    compressed = False
    if bt == 0 or os.environ.get("LDPC_FORCE_COMPRESSED"):
        # Rcv exceeds VMEM (the f32 min-sum families at DVB-S2 size):
        # fall back to the compressed check-state kernel before streaming
        btc = compressed_layered_pick_bt(layout, rule, qv_store, B_user)
        if btc:
            bt = btc
            compressed = True
    if resident is None:
        resident = bt > 0
    tile_w = bt if (resident and bt) else BT
    if B_user % tile_w:
        pad = tile_w - B_user % tile_w
        llrs = jnp.concatenate(
            [llrs, jnp.full((pad, llrs.shape[1]), 100.0, llrs.dtype)]
        )
    B = llrs.shape[0]
    nbt = B // tile_w

    llr_planes, col_of = _planes_of(lg, llrs, jnp.float32)
    q = arithmetic.quantize(llr_planes)
    qv0 = arithmetic.llr_to_var_llr(q).astype(qv_store)

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

    qv0_t = tile(qv0)
    bits0 = tile((llr_planes <= 0).astype(jnp.int8))

    if resident:
        decode = (
            compressed_layered_decode
            if compressed
            else resident_layered_decode
        )
        bits, iters_t, conv_t = decode(
            qv0_t, bits0, layout, rule, max_iterations
        )
        iters = iters_t[:, 0, :].reshape(-1)
        converged = conv_t[:, 0, :].reshape(-1) != 0
        return {
            "codeword": _codeword_from_planes(lg, col_of, untile(bits))[
                :B_user
            ],
            "iterations": iters[:B_user],
            "success": converged[:B_user],
        }

    rcv0_t = jnp.zeros((nbt, layout.E, layout.Zp, BT), store)

    def flags_to_ok(flags):
        return flags[:, 0, :].reshape(-1) == 0

    ok0 = flags_to_ok(fused_syndrome_bits(bits0, layout))

    if compact:
        from .compaction import staged_while_decode

        def iteration(big, const):
            del const
            qv, rcv = big
            qv, rcv, bits = fused_layered_iteration(qv, rcv, layout, rule)
            return (qv, rcv), bits

        hard, iters, converged = staged_while_decode(
            nbt=nbt,
            bt=BT,
            max_iterations=max_iterations,
            init_big=(qv0_t, rcv0_t),
            const_big=(),
            bits0=bits0,
            ok0=ok0,
            iteration=iteration,
            syndrome_ok=lambda bits: flags_to_ok(
                fused_syndrome_bits(bits, layout)
            ),
        )
        if lane_pad:
            hard = hard[:, :Z, :]
        return {
            "codeword": _codeword_from_planes(lg, col_of, hard)[:B_user],
            "iterations": iters[:B_user],
            "success": converged[:B_user],
        }

    def body(state):
        it, qv_t, rcv_t, _bits, converged, iters, frozen = state
        qv_t, rcv_t, bits = fused_layered_iteration(
            qv_t, rcv_t, layout, rule
        )
        ok = flags_to_ok(fused_syndrome_bits(bits, layout))
        newly = ok & ~converged
        it = it + 1
        iters = jnp.where(newly, it, iters)
        nt = newly.reshape(nbt, 1, 1, BT)
        frozen = jnp.where(nt, bits, frozen)
        return (it, qv_t, rcv_t, bits, converged | ok, iters, frozen)

    def cond(state):
        return (state[0] < max_iterations) & ~jnp.all(state[4])

    init = (
        jnp.int32(0),
        qv0_t,
        rcv0_t,
        bits0,
        ok0,
        jnp.zeros(B, jnp.int32),
        bits0,
    )
    it, _qv, _rcv, bits_final, converged, iters, frozen = (
        jax.lax.while_loop(cond, body, init)
    )
    hard_planes = untile(
        jnp.where(converged.reshape(nbt, 1, 1, BT), frozen, bits_final)
    ).astype(bool)
    iters = jnp.where(converged, iters, max_iterations)
    return {
        "codeword": _codeword_from_planes(lg, col_of, hard_planes)[:B_user],
        "iterations": iters[:B_user],
        "success": converged[:B_user],
    }

"""VMEM-resident horizontal-layered BP decode (Pallas TPU).

The whole decoder state of one batch tile fits in VMEM for every
standards code here (DVB-S2 n=64800 r=1/2 at Bt=128: Qv f32 33 MB + Rcv
bf16 58 MB + frozen bits 8 MB ~= 100 MB), so the ENTIRE decode — all
iterations, the layered sweep, the syndrome test, per-frame freezing —
runs inside one kernel with **zero HBM traffic per iteration**: HBM sees
only the initial Qv/bits load and the final bits/iterations/flags store.

This removes the streaming kernel's per-iteration floor (measured
~2.6 ms/iter of DMA+copy on the flagship workload before any compute)
and gives *per-tile early exit* for free: a tile whose frames have all
converged skips the remaining grid steps on a scalar flag, so each tile
pays only its own slowest frame, not the batch's.

Two code-generation strategies per code, chosen by a static program-size
estimate (the numerics are identical):

* **static-unrolled** (default whenever the estimated program fits the
  Mosaic budget — every standards family's min-sum/float rules): the
  layer sweep and the syndrome fold are fully unrolled in Python, so
  every circulant rotation is a *static* ``pltpu.roll`` (one rotate op)
  instead of the dynamic form's log-step select cascade, and all plane
  indices/mask pokes are compile-time constants.  Zero-shift edges (the
  staircase) cost no rotate at all.
* **group-looped dynamic** (fallback for rules whose unrolled check fold
  is quadratic in a large degree, e.g. the i8 min* families on 5G BG1):
  ``fori_loop`` over layer groups with prefetched scalar indices and
  dynamic rolls — a compact program at higher per-edge cost.

The syndrome source depends on the VMEM budget: when a bf16
hard-decision plane cache (VG planes, refreshed once per iteration
from the Qv signs, filled from the raw-channel bits at init) fits
alongside the state, the per-edge fold drops its compare+cast — the
round-4 syndrome share was 20-22% of the iteration.  i8 rules always
carry the cache (their quantizer maps tiny positive LLRs to 0, so a
live Qv-sign test would corrupt the iteration-0 exit); float rules
take it opportunistically and otherwise read the Qv posterior signs
live (sign-preserving cast, exact except below the storage dtype's
smallest normal — the measured flagship tradeoff is recorded in
RESULTS: the 16.6 MB cache would evict the flagship layered state from
VMEM entirely, a 537 -> 336 Mbit/s regression, so large codes keep the
live read).

Semantics are bit-identical to ops/fused_layered.py and the jnp layered
reference: same bucket-major layer order, same rule fold order, same
wrap/clip behavior, per-frame freeze at first convergence (reference
horizontal_layered.rs:49-110; convergence decoder.rs:157-164).

Grid: ``(nbt, max_iterations)`` — iterations are grid steps of one batch
tile; scratch persists across steps. Step 0 loads state and tests the
raw-channel hard decisions (0-iteration exit, flooding.rs:56-64); the
last step writes results.

The batch-tile width Bt is read from the input shapes; callers pick the
largest supported width with ``resident_pick_bt`` (small codes take
256-512-wide tiles, amortizing per-grid-step fixed cost that dominates
them at Bt=128).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .fused_bp2 import BT, FusedLayout, _interpret, _roll

__all__ = [
    "resident_layered_supported",
    "resident_pick_bt",
    "resident_layered_decode",
]

#: VMEM budget for the resident state (scratch + compiler temporaries
#: must fit the chip's ~128 MB VMEM; leave headroom for double-buffers
#: and Mosaic spills)
VMEM_BUDGET = 112 * 2**20
VMEM_LIMIT = 125 * 2**20

#: static-unroll budgets: rough vector-op counts above which the
#: unrolled program is not worth the Mosaic compile (fallback: dynamic).
#: Two independent gates (both measured on the r5 bench chip, cold
#: remote compiles): TOTAL program size compiles roughly sublinearly
#: (flagship min-sum ~12k ops -> 152-187 s; flagship i8 ~87k ops ->
#: 309 s, and the unrolled form beat the dynamic sweep 256.7 vs
#: 235.9 Mbit/s at LOWER compile cost), but the size of a single
#: check-fold EXPRESSION blows Mosaic's scheduler up superlinearly
#: (5G BG1 i8, d=19 quadratic fold = ~6.7k ops in one group: 713 s
#: cold for a *smaller* 56k-op total, for +14% throughput — routed
#: dynamic by default; LDPC_RESIDENT_UNROLL=1 opts in).
SWEEP_UNROLL_BUDGET = 90_000
GROUP_UNROLL_BUDGET = 4_000
SYN_UNROLL_BUDGET = 10_000


def _vmem_bytes(layout: FusedLayout, rule, qdtype, bt: int) -> int:
    Z = layout.Zp
    qv = layout.VG * Z * bt * jnp.dtype(qdtype).itemsize
    rcv = layout.E * Z * bt * jnp.dtype(rule.storage_dtype).itemsize
    frozen = layout.VG * Z * bt
    # bf16 hard-decision cache: mandatory for i8 (iteration-0 exactness),
    # opportunistic for float rules (see _use_hard_cache)
    hard = 0 if _qv_sign_is_hard(rule) else layout.VG * Z * bt * 2
    # stacked per-layer temporaries (x, rold, rnew planes) + syndrome acc
    tmp = (4 * layout.max_chk_degree + 16) * Z * bt * 4
    return qv + rcv + frozen + hard + tmp


def _use_hard_cache(layout: FusedLayout, rule, qdtype, bt: int) -> bool:
    """True when the syndrome reads the bf16 hard-plane cache: always
    for i8 rules; for float rules only when the extra VG bf16 planes
    still fit the VMEM budget."""
    if not _qv_sign_is_hard(rule):
        return True
    extra = layout.VG * layout.Zp * bt * 2
    return _vmem_bytes(layout, rule, qdtype, bt) + extra <= VMEM_BUDGET


def resident_layered_supported(
    layout: FusedLayout, rule, qdtype, bt: int = BT
) -> bool:
    return (
        layout.fusable
        and layout.max_chk_degree <= rule.max_check_degree
        and _vmem_bytes(layout, rule, qdtype, bt) <= VMEM_BUDGET
    )


def resident_pick_bt(layout: FusedLayout, rule, qdtype, batch: int) -> int:
    """Largest batch-tile width (multiple of 128, <= 512) whose resident
    state fits VMEM without padding the batch beyond its 128-padded
    size. Returns 0 when even Bt=128 does not fit."""
    env = os.environ.get("LDPC_RESIDENT_BT")
    if env:
        return int(env)
    b128 = -(-batch // BT) * BT
    for bt in (512, 384, 256, BT):
        if bt > b128 or b128 % bt:
            continue
        if resident_layered_supported(layout, rule, qdtype, bt):
            return bt
    return 0


def _qv_sign_is_hard(rule) -> bool:
    """True when (Qv <= 0) equals the raw-channel hard decision at init:
    every float rule (sign-preserving quantize/cast); False for i8."""
    return rule.storage_dtype != jnp.int8


def _rule_check_cost(rule, d: int) -> int:
    """Rough unrolled vector-op count of rule.check on d planes."""
    name = type(rule).__name__
    if "MinstarApproxI8" in name:
        return 18 * d * d
    if "MinstarApprox" in name:
        return 9 * d * d
    if "AminstarI8" in name:
        return 30 * d
    if "Aminstar" in name:
        return 16 * d
    if "Phi" in name:
        return 14 * d
    if "Tanh" in name:
        return 12 * d
    return 7 * d  # min-sum


def _unroll_plan(layout: FusedLayout, rule):
    """(unroll_sweep, unroll_syndrome) from static program-size
    estimates; env overrides for experiments."""
    env = os.environ.get("LDPC_RESIDENT_UNROLL")
    if env is not None:
        v = env not in ("0", "false", "")
        return v, v
    per_group = [
        12 * m.d + _rule_check_cost(rule, m.d) for m in layout.chk_meta
    ]
    sweep = sum(
        (m.g1 - m.g0) * c for m, c in zip(layout.chk_meta, per_group)
    )
    syn = 6 * layout.E
    return (
        sweep <= SWEEP_UNROLL_BUDGET
        and max(per_group, default=0) <= GROUP_UNROLL_BUDGET,
        syn <= SYN_UNROLL_BUDGET,
    )


def resident_layered_decode(qv0_t, bits0_t, layout: FusedLayout, rule,
                            max_iterations: int):
    """(qv0, bits0) -> (bits, iters, conv); fully in-VMEM decode.

    qv0_t: (nbt, VG, Z, Bt) posteriors init (quantized channel LLRs in
    the arithmetic's VarLlr dtype); bits0_t: (nbt, VG, Z, Bt) int8 hard
    decisions of the *raw* channel LLRs (iteration-0 test).
    Returns bits (nbt, VG, Z, Bt) int8 (frozen at per-frame convergence,
    final posterior sign otherwise), iters (nbt, 8, Bt) int32 (rows
    equal), conv (nbt, 8, Bt) int32 (rows equal).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt, VG, Z, Bt = qv0_t.shape  # Z = padded plane height (Zp)
    pad = Z - layout.Z
    E = layout.E
    metas = layout.chk_meta
    store = rule.storage_dtype
    qdtype = qv0_t.dtype
    compute = rule.compute_dtype
    big = rule.big
    ITERS = int(max_iterations)

    rot_vc = layout.syn_rot  # +s: var -> check coords
    rot_cv = ((layout.Z - layout.syn_rot) % layout.Z).astype(np.int32)
    use_hard = _use_hard_cache(layout, rule, qdtype, Bt)
    unroll_sweep, unroll_syn = _unroll_plan(layout, rule)

    # static per-bucket "any missing lane" flags: skip the mask pokes for
    # the (overwhelmingly common) clean buckets
    bucket_has_mask = tuple(
        bool(
            (layout.syn_mask[m.ebase : m.ebase + (m.g1 - m.g0) * m.d] >= 0)
            .any()
        )
        for m in metas
    )

    def _sroll(x, s: int):
        """Static mod-layout.Z roll (see fused_bp2._roll for the padded
        two-roll decomposition)."""
        if s == 0:
            return x
        if pad == 0:
            return pltpu.roll(x, s, 0)
        a = pltpu.roll(x, s, 0)
        b = pltpu.roll(x, s + pad, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(lane < s, b, a)

    def kernel(cs_ref, vg_ref, rvc_ref, rot_cv_ref, mask_ref,
               qv_in, bits_in, bits_out, iters_out, conv_out,
               qv_buf, rcv_buf, frozen, hard_buf, conv_buf, iters_buf,
               done_smem, sem):
        bt = pl.program_id(0)
        it = pl.program_id(1)  # iteration index, 0 = init step
        lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)

        def hard_f32(vg):
            """(Z, Bt) f32 0/1 hard decisions for the syndrome fold."""
            if use_hard:
                return hard_buf[vg].astype(jnp.float32)
            return (qv_buf[vg].astype(compute) <= 0).astype(jnp.float32)

        def hard_i8(vg):
            if use_hard:
                return hard_buf[vg].astype(jnp.int8)
            return (qv_buf[vg].astype(compute) <= 0).astype(jnp.int8)

        def syndrome_ok_rows():
            """(8, Bt) int32: 1 where ALL checks of the frame pass."""
            if unroll_syn:
                acc = jnp.zeros((Z, Bt), jnp.float32)
                for m in metas:
                    if m.d == 0:
                        continue
                    for g in range(m.g0, m.g1):
                        par = None
                        for t in range(m.d):
                            e = m.ebase + (g - m.g0) * m.d + t
                            b = _sroll(
                                hard_f32(int(layout.syn_vg[e])),
                                int(rot_vc[e]),
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
                            b = _roll(hard_f32(vg_ref[e]), rvc_ref[e], pad)
                            if masked:
                                b = jnp.where(lane == mask_ref[e], 0.0, b)
                            par = b if par is None else par + b
                        odd = par - 2.0 * jnp.floor(par * 0.5)
                        return jnp.maximum(acc, odd)

                    return jax.lax.fori_loop(m.g0, m.g1, grp, acc)

                for mi, m in enumerate(metas):
                    if m.d == 0:
                        continue
                    acc = acc_meta(acc, m, bucket_has_mask[mi])
            if pad:
                # pad lanes of acc carry wrapped-garbage parities
                acc = jnp.where(lane >= layout.Z, 0.0, acc)
            bad = jnp.max(acc, axis=0, keepdims=True) > 0.5
            return jnp.broadcast_to(~bad, (8, Bt)).astype(jnp.int32)

        # ---- step 0: load state, zero Rcv, reset flags ----
        @pl.when(it == 0)
        def _():
            cp = pltpu.make_async_copy(qv_in.at[bt], qv_buf, sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(bits_in.at[bt], frozen, sem)
            cp.start()
            cp.wait()

            def zero_plane(e, _):
                rcv_buf[e] = jnp.zeros((Z, Bt), store)
                return 0

            jax.lax.fori_loop(0, E, zero_plane, 0)
            if use_hard:
                def fill(vg, _):
                    hard_buf[vg] = frozen[vg].astype(jnp.bfloat16)
                    return 0

                jax.lax.fori_loop(0, VG, fill, 0)
            conv_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            iters_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            done_smem[0] = 0

        # ---- one layered iteration (skipped once the tile is done) ----
        @pl.when((it > 0) & (done_smem[0] == 0))
        def _():
            if unroll_sweep:
                for m in metas:
                    d = m.d
                    for g in range(m.g0, m.g1):
                        cs = int(layout.chk_cs[g])
                        rolds = []
                        xs = []
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            vg = int(layout.syn_vg[e])
                            mask = int(layout.syn_mask[e])
                            rold = rcv_buf[cs + t].astype(compute)
                            qc = _sroll(
                                qv_buf[vg].astype(compute), int(rot_vc[e])
                            )
                            x = rule.layered_x(qc, rold)
                            if mask >= 0 or pad:
                                poke = (
                                    (lane == mask)
                                    if mask >= 0
                                    else (lane >= layout.Z)
                                )
                                if mask >= 0 and pad:
                                    poke |= lane >= layout.Z
                                x = jnp.where(poke, big, x)
                            rolds.append(rold)
                            xs.append(x)
                        rnews = rule.check(xs)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            vg = int(layout.syn_vg[e])
                            mask = int(layout.syn_mask[e])
                            rn = rnews[t]
                            if mask >= 0 or pad:
                                poke = (
                                    (lane == mask)
                                    if mask >= 0
                                    else (lane >= layout.Z)
                                )
                                if mask >= 0 and pad:
                                    poke |= lane >= layout.Z
                                rn = jnp.where(poke, 0, rn)
                            rcv_buf[cs + t] = rn.astype(store)
                            dv = _sroll(rn - rolds[t], int(rot_cv[e]))
                            qv_buf[vg] = (
                                qv_buf[vg].astype(compute) + dv
                            ).astype(qdtype)
            else:
                for mi, m in enumerate(metas):
                    d = m.d

                    def layer(g, _, m=m, d=d, masked=bucket_has_mask[mi]):
                        cs = cs_ref[g]
                        rolds = []
                        xs = []
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            rold = rcv_buf[cs + t].astype(compute)
                            qc = _roll(
                                qv_buf[vg_ref[e]].astype(compute),
                                rvc_ref[e],
                                pad,
                            )
                            x = rule.layered_x(qc, rold)
                            if masked or pad:
                                poke = lane == mask_ref[e]
                                if pad:
                                    poke |= lane >= layout.Z
                                x = jnp.where(poke, big, x)
                            rolds.append(rold)
                            xs.append(x)
                        rnews = rule.check(xs)
                        for t in range(d):
                            e = m.ebase + (g - m.g0) * d + t
                            rn = rnews[t]
                            if masked or pad:
                                poke = lane == mask_ref[e]
                                if pad:
                                    poke |= lane >= layout.Z
                                rn = jnp.where(poke, 0, rn)
                            rcv_buf[cs + t] = rn.astype(store)
                            dv = _roll(rn - rolds[t], rot_cv_ref[e], pad)
                            qv_buf[vg_ref[e]] = (
                                qv_buf[vg_ref[e]].astype(compute) + dv
                            ).astype(qdtype)
                        return 0

                    jax.lax.fori_loop(m.g0, m.g1, layer, 0)

            if use_hard:
                def refresh(vg, _):
                    hard_buf[vg] = (
                        qv_buf[vg].astype(compute) <= 0
                    ).astype(jnp.bfloat16)
                    return 0

                jax.lax.fori_loop(0, VG, refresh, 0)

        # ---- shared epilogue: syndrome + freeze (init and iterations;
        # done_smem was reset by the init block this same grid step) ----
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

            # frozen already holds the raw-channel bits at init (it==0)
            @pl.when((n_new > 0) & (it > 0))
            def _():
                nb = newly[0:1] != 0

                def freeze(vg, _):
                    frozen[vg] = jnp.where(nb, hard_i8(vg), frozen[vg])
                    return 0

                jax.lax.fori_loop(0, VG, freeze, 0)

        # ---- last step: output frozen-or-final bits + counters ----
        @pl.when(it == ITERS)
        def _():
            cb = (conv_buf[0:1] != 0)

            def finalize(vg, _):
                frozen[vg] = jnp.where(cb, frozen[vg], hard_i8(vg))
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
        num_scalar_prefetch=5,
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
            pltpu.VMEM((VG, Z, Bt), qdtype),
            pltpu.VMEM((E, Z, Bt), store),
            pltpu.VMEM((VG, Z, Bt), jnp.int8),
            pltpu.VMEM((VG if use_hard else 1, Z, Bt), jnp.bfloat16),
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
        jnp.asarray(layout.syn_vg),
        jnp.asarray(rot_vc),
        jnp.asarray(rot_cv),
        jnp.asarray(layout.syn_mask),
        qv0_t,
        bits0_t,
    )

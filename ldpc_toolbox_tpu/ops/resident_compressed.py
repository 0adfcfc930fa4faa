"""Compressed-state VMEM-resident flooding BP (Pallas TPU).

For min-sum-class check rules the c2v messages of one check node are
fully determined by four per-check quantities — the per-edge output
signs, the smallest and second-smallest |v2c|, and the argmin position
(MinSumRule.check in ops/fused_bp2.py is exactly this fold).  So the
2E-message flooding state that keeps DVB-S2-size float flooding off the
resident path (2E bf16 = 116 MB > VMEM, ops/resident_flooding.py:29-31)
compresses losslessly to

  * ``ssign``  (E, Z, Bt)  int8  — per-edge c2v sign (+-1; 0 on missing
    lanes, which makes the missing-lane zero poke implicit),
  * ``min1``/``min2`` (CG, Z, Bt) storage dtype — post-scale magnitudes
    (the bf16/f32 cast the streaming kernel would have stored),
  * ``argm``  (CG, Z, Bt)  int8  — argmin slot,
  * ``s``     (VG, Z, Bt)  f32   — the posterior totals of the variable
    phase (the reference's output LLRs, flooding.rs:111-125),

~91 MB for DVB-S2 r=1/2 at Bt=128 — resident, zero HBM traffic per
iteration, per-tile early exit.

Bit-exactness vs the streaming kernels (fused_bp2.fused_check/var) and
the resident message kernel (resident_flooding.py), argued op by op:

  * reconstructed c2v = sign * select(argm==t, min2, min1): the product
    of a stored storage-dtype magnitude by +-1 or 0 is exact, and equals
    the value the streaming kernel stores because store(+-x) = +-store(x)
    and select commutes with the scale multiply;
  * v2c = store(roll(s) - c2v): ``s`` is the exact f32 ``tot`` of
    rule.var (same summation order over the var-major edge list), and
    elementwise subtraction commutes with the lane rotation, so this is
    the same f32 value the streaming variable kernel casts to storage;
  * missing-lane pokes: big into v2c at the check-coordinate missing
    lane (``syn_mask``, as the resident layered kernel does) equals the
    streaming var kernel's post-roll ``var_omask`` poke; the c2v zero
    poke is carried by ``ssign == 0``;
  * the only internal difference is the sign of zeros (sigma*0 can give
    +-0 where the streaming kernel stored the other zero), which no
    comparison, |.|, or hard decision in the pipeline distinguishes.

Flooding semantics and the output contract match resident_flooding_decode
(reference flooding.rs:51-126): iteration-0 test on the channel hard
decisions, per-frame freeze at first convergence, exact iteration counts.

The sweep is fully static-unrolled (static ``pltpu.roll``, constant plane
indices); rules or codes whose unrolled program would exceed the Mosaic
budget are not claimed (``compressed_flooding_supported`` returns False
and callers keep streaming).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fused_bp2 import BT, FusedLayout, MinSumRule, _interpret
from .resident_layered import (
    SWEEP_UNROLL_BUDGET,
    VMEM_BUDGET,
    VMEM_LIMIT,
)

__all__ = [
    "compressed_flooding_supported",
    "compressed_flooding_pick_bt",
    "compressed_flooding_decode",
]


def _vmem_bytes(layout: FusedLayout, rule, qdtype, bt: int) -> int:
    Z = layout.Zp
    store_sz = jnp.dtype(rule.storage_dtype).itemsize
    s = layout.VG * Z * bt * 4
    q = layout.VG * Z * bt * jnp.dtype(qdtype).itemsize
    ssign = layout.E * Z * bt
    mins = 2 * layout.CG * Z * bt * store_sz
    argm = layout.CG * Z * bt
    frozen = layout.VG * Z * bt
    tmp = 12 * Z * bt * 4  # rolling fold temporaries only (no xs list)
    return s + q + ssign + mins + argm + frozen + tmp


def _program_cost(layout: FusedLayout) -> int:
    chk = sum(
        (m.g1 - m.g0) * (13 * m.d + 4) for m in layout.chk_meta
    )
    var = sum((m.g1 - m.g0) * (9 * m.d + 2) for m in layout.var_meta)
    syn = 4 * layout.E
    return chk + var + syn


def compressed_flooding_supported(
    layout: FusedLayout, rule, qdtype, bt: int = BT
) -> bool:
    return (
        isinstance(rule, MinSumRule)
        and layout.fusable
        and layout.max_chk_degree <= rule.max_check_degree
        and layout.max_var_degree <= rule.max_var_degree
        and layout.max_chk_degree >= 2
        and layout.max_chk_degree < 127
        and _vmem_bytes(layout, rule, qdtype, bt) <= VMEM_BUDGET
        and _program_cost(layout) <= SWEEP_UNROLL_BUDGET
    )


def compressed_flooding_pick_bt(
    layout: FusedLayout, rule, qdtype, batch: int
) -> int:
    """Largest supported batch-tile width (0 = none fits)."""
    import os

    env = os.environ.get("LDPC_COMPRESSED_BT")
    if env:
        return int(env)
    b128 = -(-batch // BT) * BT
    for bt in (512, 384, 256, BT):
        if bt > b128 or b128 % bt:
            continue
        if compressed_flooding_supported(layout, rule, qdtype, bt):
            return bt
    return 0


def _var_recon_tables(layout: FusedLayout):
    """Static per-var-major-edge reconstruction tables: for the c2v plane
    consumed at var-major position p, the check-side ssign plane, check
    group, in-check slot, and check->var rotation."""
    E = layout.E
    ssplane = np.empty(E, np.int32)
    mgrp = np.empty(E, np.int32)
    tpos = np.empty(E, np.int32)
    rot = np.empty(E, np.int32)
    e = 0
    for m in layout.chk_meta:
        for g in range(m.g0, m.g1):
            cs = int(layout.chk_cs[g])
            for t in range(m.d):
                p = int(layout.chk_dest[e])
                ssplane[p] = cs + t
                mgrp[p] = g
                tpos[p] = t
                rot[p] = int(layout.chk_rot[e])
                e += 1
    return ssplane, mgrp, tpos, rot


def compressed_flooding_decode(q_t, bits0_t, layout: FusedLayout, rule,
                               max_iterations: int):
    """(q, bits0) -> (bits, iters, conv); compressed in-VMEM flooding.

    Same contract as resident_flooding_decode: q_t (nbt, VG, Z, Bt)
    channel planes in the rule's storage dtype, bits0_t (nbt, VG, Z, Bt)
    int8 raw-channel hard decisions; returns frozen-or-final hard bits,
    per-frame iteration counts and convergence flags.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt, VG, Z, Bt = q_t.shape  # Z = padded plane height (Zp)
    pad = Z - layout.Z
    E = layout.E
    CG = layout.CG
    chk_metas = layout.chk_meta
    var_metas = layout.var_meta
    store = rule.storage_dtype
    qdtype = q_t.dtype
    compute = rule.compute_dtype
    big = rule.big
    scale = float(getattr(rule, "scale", 1.0))
    ITERS = int(max_iterations)

    ssplane, mgrp, tpos, vrot = _var_recon_tables(layout)
    rot_vc = layout.syn_rot  # +s: var -> check coords

    def _sroll(x, s: int):
        if s == 0:
            return x
        if pad == 0:
            return pltpu.roll(x, s, 0)
        a = pltpu.roll(x, s, 0)
        b = pltpu.roll(x, s + pad, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(lane < s, b, a)

    def kernel(q_in, bits_in, bits_out, iters_out, conv_out,
               s_buf, q_buf, ssign, m1_buf, m2_buf, am_buf,
               frozen, conv_buf, iters_buf, done_smem, sem):
        bt = pl.program_id(0)
        it = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)

        def hard_f32(vg):
            return (s_buf[vg] <= 0.0).astype(jnp.float32)

        def hard_i8(vg):
            return (s_buf[vg] <= 0.0).astype(jnp.int8)

        def recon(g: int, t: int):
            """f32 c2v of check group g, slot t, in check coords."""
            sel = jnp.where(
                am_buf[g].astype(jnp.int32) == t,
                m2_buf[g].astype(compute),
                m1_buf[g].astype(compute),
            )
            cs = int(layout.chk_cs[g])
            return ssign[cs + t].astype(compute) * sel

        def recon_v(sp: int, g: int, t: int):
            """f32 c2v read through the var-major tables (check coords,
            pre-roll); identical math to ``recon`` with a static ssign
            plane index."""
            sel = jnp.where(
                am_buf[g].astype(jnp.int32) == t,
                m2_buf[g].astype(compute),
                m1_buf[g].astype(compute),
            )
            return ssign[sp].astype(compute) * sel

        def syndrome_ok_rows():
            acc = jnp.zeros((Z, Bt), jnp.float32)
            for m in chk_metas:
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
            if pad:
                acc = jnp.where(lane >= layout.Z, 0.0, acc)
            bad = jnp.max(acc, axis=0, keepdims=True) > 0.5
            return jnp.broadcast_to(~bad, (8, Bt)).astype(jnp.int32)

        # ---- step 0: load, init compressed state ----
        @pl.when(it == 0)
        def _():
            cp = pltpu.make_async_copy(q_in.at[bt], q_buf, sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(bits_in.at[bt], frozen, sem)
            cp.start()
            cp.wait()

            def init_s(vg, _):
                s_buf[vg] = q_buf[vg].astype(jnp.float32)
                return 0

            jax.lax.fori_loop(0, VG, init_s, 0)

            # sigma = 0 everywhere => reconstructed c2v = 0, so the first
            # check phase sees v2c = store(roll(q)) exactly as the
            # streaming init does (flooding.rs:88-100)
            def zero_sign(e, _):
                ssign[e] = jnp.zeros((Z, Bt), jnp.int8)
                return 0

            jax.lax.fori_loop(0, E, zero_sign, 0)

            def zero_mins(g, _):
                m1_buf[g] = jnp.zeros((Z, Bt), store)
                m2_buf[g] = jnp.zeros((Z, Bt), store)
                am_buf[g] = jnp.zeros((Z, Bt), jnp.int8)
                return 0

            jax.lax.fori_loop(0, CG, zero_mins, 0)
            conv_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            iters_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            done_smem[0] = 0

        # ---- one flooding iteration ----
        @pl.when((it > 0) & (done_smem[0] == 0))
        def _():
            # check phase: reconstruct v2c = store(roll(s) - c2v_old),
            # fold min1/min2/argmin/parity, store the new compressed
            # state (one pass; ssign holds raw negs until the parity
            # post-pass)
            for m in chk_metas:
                d = m.d
                if d == 0:
                    continue
                for g in range(m.g0, m.g1):
                    cs = int(layout.chk_cs[g])
                    m1 = None
                    m2 = None
                    arg = None
                    par = None
                    for t in range(d):
                        e = m.ebase + (g - m.g0) * d + t
                        qc = _sroll(
                            s_buf[int(layout.syn_vg[e])],
                            int(rot_vc[e]),
                        )
                        x = (qc - recon(g, t)).astype(store)
                        mask = int(layout.syn_mask[e])
                        if mask >= 0 or pad:
                            poke = (
                                (lane == mask)
                                if mask >= 0
                                else (lane >= layout.Z)
                            )
                            if mask >= 0 and pad:
                                poke |= lane >= layout.Z
                            x = jnp.where(poke, store.type(big), x)
                        xf = x.astype(compute)
                        neg = xf < 0
                        mag = jnp.abs(xf)
                        if t == 0:
                            m1 = mag
                            m2 = jnp.full_like(mag, big)
                            arg = jnp.zeros((Z, Bt), jnp.int32)
                            par = neg
                        else:
                            m2 = jnp.minimum(m2, jnp.maximum(m1, mag))
                            take = mag < m1
                            m1 = jnp.where(take, mag, m1)
                            arg = jnp.where(take, t, arg)
                            par = par ^ neg
                        ssign[cs + t] = neg.astype(jnp.int8)
                    if scale != 1.0:
                        m1 = m1 * jnp.float32(scale)
                        m2 = m2 * jnp.float32(scale)
                    m1_buf[g] = m1.astype(store)
                    m2_buf[g] = m2.astype(store)
                    am_buf[g] = arg.astype(jnp.int8)
                    pm = 1 - 2 * par.astype(jnp.int32)
                    for t in range(d):
                        e = m.ebase + (g - m.g0) * d + t
                        sg = (
                            (1 - 2 * ssign[cs + t].astype(jnp.int32)) * pm
                        )
                        mask = int(layout.syn_mask[e])
                        if mask >= 0 or pad:
                            poke = (
                                (lane == mask)
                                if mask >= 0
                                else (lane >= layout.Z)
                            )
                            if mask >= 0 and pad:
                                poke |= lane >= layout.Z
                            sg = jnp.where(poke, 0, sg)
                        ssign[cs + t] = sg.astype(jnp.int8)

            # var phase: s = q + sum_t roll(c2v_new) in the streaming
            # var-major order (rule.var's tot)
            for m in var_metas:
                d = m.d
                for g in range(m.g0, m.g1):
                    vs = int(layout.var_cs[g])
                    tot = q_buf[g].astype(compute)
                    for t in range(d):
                        p = vs + t
                        y = _sroll(
                            recon_v(int(ssplane[p]), int(mgrp[p]),
                                    int(tpos[p])),
                            int(vrot[p]),
                        )
                        tot = tot + y
                    s_buf[g] = tot

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
                    frozen[vg] = jnp.where(nb, hard_i8(vg), frozen[vg])
                    return 0

                jax.lax.fori_loop(0, VG, freeze, 0)

        # ---- last step: outputs ----
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
        num_scalar_prefetch=0,
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
            pltpu.VMEM((VG, Z, Bt), jnp.float32),
            pltpu.VMEM((VG, Z, Bt), qdtype),
            pltpu.VMEM((E, Z, Bt), jnp.int8),
            pltpu.VMEM((CG, Z, Bt), store),
            pltpu.VMEM((CG, Z, Bt), store),
            pltpu.VMEM((CG, Z, Bt), jnp.int8),
            pltpu.VMEM((VG, Z, Bt), jnp.int8),
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
    )(q_t, bits0_t)


# ---------------------------------------------------------------------------
# Compressed-state horizontal-layered decode
# ---------------------------------------------------------------------------
#
# Same compression for the layered schedule's Rcv state (the DVB-S2-size
# f32 layered families: Rcv f32 = 111 MB streams today).  The per-edge
# int8 fuses sign and argmin position: sigma in {-2,-1,0,+1,+2}, |sigma|==2
# marking the argmin slot, so Rcv[e] = w1*min1 + w2*min2 with the integer
# weights w2 = sigma - clip(sigma,-1,1), w1 = sigma - 2*w2 — no per-check
# argmin plane at all.  Exactness argument as for flooding; additionally
# the Qv delta uses the pre-cast f32 check output exactly as the
# message-resident kernel does (resident_layered.py sweep), while the
# stored min1/min2 carry the storage-dtype rounding the next iteration's
# reconstruction must see.

__all__ += [
    "compressed_layered_supported",
    "compressed_layered_pick_bt",
    "compressed_layered_decode",
]


def _vmem_bytes_layered(layout: FusedLayout, rule, qdtype, bt: int) -> int:
    Z = layout.Zp
    store_sz = jnp.dtype(rule.storage_dtype).itemsize
    qv = layout.VG * Z * bt * jnp.dtype(qdtype).itemsize
    ssign = layout.E * Z * bt
    mins = 2 * layout.CG * Z * bt * store_sz
    frozen = layout.VG * Z * bt
    tmp = (2 * layout.max_chk_degree + 16) * Z * bt * 4
    return qv + ssign + mins + frozen + tmp


def compressed_layered_supported(
    layout: FusedLayout, rule, qdtype, bt: int = BT
) -> bool:
    return (
        isinstance(rule, MinSumRule)
        and layout.fusable
        and layout.max_chk_degree <= rule.max_check_degree
        and layout.max_chk_degree >= 2
        and layout.max_chk_degree < 64
        and _vmem_bytes_layered(layout, rule, qdtype, bt) <= VMEM_BUDGET
        and _program_cost(layout) <= SWEEP_UNROLL_BUDGET
    )


def compressed_layered_pick_bt(
    layout: FusedLayout, rule, qdtype, batch: int
) -> int:
    import os

    env = os.environ.get("LDPC_COMPRESSED_BT")
    if env:
        return int(env)
    b128 = -(-batch // BT) * BT
    for bt in (512, 384, 256, BT):
        if bt > b128 or b128 % bt:
            continue
        if compressed_layered_supported(layout, rule, qdtype, bt):
            return bt
    return 0


def compressed_layered_decode(qv0_t, bits0_t, layout: FusedLayout, rule,
                              max_iterations: int):
    """(qv0, bits0) -> (bits, iters, conv); compressed in-VMEM layered
    decode.  Contract identical to resident_layered_decode (float
    min-sum rules only; the syndrome reads Qv posterior signs)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt, VG, Z, Bt = qv0_t.shape
    pad = Z - layout.Z
    E = layout.E
    CG = layout.CG
    metas = layout.chk_meta
    store = rule.storage_dtype
    qdtype = qv0_t.dtype
    compute = rule.compute_dtype
    big = rule.big
    scale = float(getattr(rule, "scale", 1.0))
    ITERS = int(max_iterations)

    rot_vc = layout.syn_rot
    rot_cv = ((layout.Z - layout.syn_rot) % layout.Z).astype(np.int32)

    def _sroll(x, s: int):
        if s == 0:
            return x
        if pad == 0:
            return pltpu.roll(x, s, 0)
        a = pltpu.roll(x, s, 0)
        b = pltpu.roll(x, s + pad, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(lane < s, b, a)

    def kernel(qv_in, bits_in, bits_out, iters_out, conv_out,
               qv_buf, ssign, m1_buf, m2_buf,
               frozen, conv_buf, iters_buf, done_smem, sem):
        bt = pl.program_id(0)
        it = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)

        def hard_f32(vg):
            return (qv_buf[vg].astype(compute) <= 0).astype(jnp.float32)

        def hard_i8(vg):
            return (qv_buf[vg].astype(compute) <= 0).astype(jnp.int8)

        def recon(g: int, t: int):
            """f32 Rcv of check group g, slot t (stored rounding)."""
            cs = int(layout.chk_cs[g])
            se = ssign[cs + t].astype(jnp.int32)
            w2 = se - jnp.clip(se, -1, 1)
            w1 = se - 2 * w2
            return (
                w1.astype(compute) * m1_buf[g].astype(compute)
                + w2.astype(compute) * m2_buf[g].astype(compute)
            )

        def syndrome_ok_rows():
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
            if pad:
                acc = jnp.where(lane >= layout.Z, 0.0, acc)
            bad = jnp.max(acc, axis=0, keepdims=True) > 0.5
            return jnp.broadcast_to(~bad, (8, Bt)).astype(jnp.int32)

        @pl.when(it == 0)
        def _():
            cp = pltpu.make_async_copy(qv_in.at[bt], qv_buf, sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(bits_in.at[bt], frozen, sem)
            cp.start()
            cp.wait()

            def zero_sign(e, _):
                ssign[e] = jnp.zeros((Z, Bt), jnp.int8)
                return 0

            jax.lax.fori_loop(0, E, zero_sign, 0)

            def zero_mins(g, _):
                m1_buf[g] = jnp.zeros((Z, Bt), store)
                m2_buf[g] = jnp.zeros((Z, Bt), store)
                return 0

            jax.lax.fori_loop(0, CG, zero_mins, 0)
            conv_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            iters_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            done_smem[0] = 0

        @pl.when((it > 0) & (done_smem[0] == 0))
        def _():
            for m in metas:
                d = m.d
                if d == 0:
                    continue
                for g in range(m.g0, m.g1):
                    cs = int(layout.chk_cs[g])
                    rolds = []
                    m1 = None
                    m2 = None
                    arg = None
                    par = None
                    for t in range(d):
                        e = m.ebase + (g - m.g0) * d + t
                        rold = recon(g, t)
                        qc = _sroll(
                            qv_buf[int(layout.syn_vg[e])].astype(compute),
                            int(rot_vc[e]),
                        )
                        x = qc - rold
                        mask = int(layout.syn_mask[e])
                        if mask >= 0 or pad:
                            poke = (
                                (lane == mask)
                                if mask >= 0
                                else (lane >= layout.Z)
                            )
                            if mask >= 0 and pad:
                                poke |= lane >= layout.Z
                            x = jnp.where(poke, big, x)
                        neg = x < 0
                        mag = jnp.abs(x)
                        if t == 0:
                            m1 = mag
                            m2 = jnp.full_like(mag, big)
                            arg = jnp.zeros((Z, Bt), jnp.int32)
                            par = neg
                        else:
                            m2 = jnp.minimum(m2, jnp.maximum(m1, mag))
                            take = mag < m1
                            m1 = jnp.where(take, mag, m1)
                            arg = jnp.where(take, t, arg)
                            par = par ^ neg
                        ssign[cs + t] = neg.astype(jnp.int8)
                        rolds.append(rold)
                    if scale != 1.0:
                        m1 = m1 * jnp.float32(scale)
                        m2 = m2 * jnp.float32(scale)
                    pm = 1 - 2 * par.astype(jnp.int32)
                    for t in range(d):
                        e = m.ebase + (g - m.g0) * d + t
                        vg = int(layout.syn_vg[e])
                        isarg = arg == t
                        sgn = (
                            (1 - 2 * ssign[cs + t].astype(jnp.int32)) * pm
                        )
                        mask = int(layout.syn_mask[e])
                        if mask >= 0 or pad:
                            poke = (
                                (lane == mask)
                                if mask >= 0
                                else (lane >= layout.Z)
                            )
                            if mask >= 0 and pad:
                                poke |= lane >= layout.Z
                            sgn = jnp.where(poke, 0, sgn)
                        # pre-cast f32 output for the Qv delta (matches
                        # resident_layered's dv), rounded store for recon
                        rnew = sgn.astype(compute) * jnp.where(
                            isarg, m2, m1
                        )
                        dv = _sroll(rnew - rolds[t], int(rot_cv[e]))
                        qv_buf[vg] = (
                            qv_buf[vg].astype(compute) + dv
                        ).astype(qdtype)
                        se = sgn * jnp.where(isarg, 2, 1)
                        ssign[cs + t] = se.astype(jnp.int8)
                    m1_buf[g] = m1.astype(store)
                    m2_buf[g] = m2.astype(store)

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
                    frozen[vg] = jnp.where(nb, hard_i8(vg), frozen[vg])
                    return 0

                jax.lax.fori_loop(0, VG, freeze, 0)

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
        num_scalar_prefetch=0,
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
            pltpu.VMEM((E, Z, Bt), jnp.int8),
            pltpu.VMEM((CG, Z, Bt), store),
            pltpu.VMEM((CG, Z, Bt), store),
            pltpu.VMEM((VG, Z, Bt), jnp.int8),
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
    )(qv0_t, bits0_t)

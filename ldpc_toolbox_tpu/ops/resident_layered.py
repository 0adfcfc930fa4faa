"""VMEM-resident horizontal-layered BP decode (Pallas TPU).

The whole decoder state of one 128-frame batch tile fits in VMEM for
every standards code here (DVB-S2 n=64800 r=1/2: Qv f32 33 MB + Rcv bf16
58 MB + frozen bits 8 MB ~= 100 MB), so the ENTIRE decode — all
iterations, the layered sweep, the syndrome test, per-frame freezing —
runs inside one kernel with **zero HBM traffic per iteration**: HBM sees
only the initial Qv/bits load and the final bits/iterations/flags store.

This removes the streaming kernel's per-iteration floor (measured
~2.6 ms/iter of DMA+copy on the flagship workload before any compute)
and gives *per-tile early exit* for free: a tile whose frames have all
converged skips the remaining grid steps on a scalar flag, so each tile
pays only its own slowest frame, not the batch's.

Semantics are bit-identical to ops/fused_layered.py and the jnp layered
reference: same bucket-major layer order, same rule fold order, same
wrap/clip behavior, per-frame freeze at first convergence (reference
horizontal_layered.rs:49-110; convergence decoder.rs:157-164).

Grid: ``(nbt, max_iterations)`` — iterations are grid steps of one batch
tile; scratch persists across steps. Step 0 loads state and tests the
raw-channel hard decisions (0-iteration exit, flooding.rs:56-64); the
last step writes results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fused_bp2 import BT, FusedLayout, _interpret, _roll

__all__ = ["resident_layered_supported", "resident_layered_decode"]

#: VMEM budget for the resident state (scratch + compiler temporaries
#: must fit the chip's ~128 MB VMEM; leave headroom for double-buffers
#: and Mosaic spills)
VMEM_BUDGET = 112 * 2**20
VMEM_LIMIT = 125 * 2**20


def resident_layered_supported(layout: FusedLayout, rule, qdtype) -> bool:
    Z = layout.Zp  # planes are stored at the padded height
    qv = layout.VG * Z * BT * jnp.dtype(qdtype).itemsize
    rcv = layout.E * Z * BT * jnp.dtype(rule.storage_dtype).itemsize
    frozen = layout.VG * Z * BT
    # stacked per-layer temporaries (x, rold, rnew planes) + syndrome acc
    tmp = (4 * layout.max_chk_degree + 16) * Z * BT * 4
    return (
        layout.fusable
        and layout.max_chk_degree <= rule.max_check_degree
        and qv + rcv + frozen + tmp <= VMEM_BUDGET
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
    CG = layout.CG
    metas = layout.chk_meta
    dmax = layout.max_chk_degree
    store = rule.storage_dtype
    qdtype = qv0_t.dtype
    compute = rule.compute_dtype
    big = rule.big
    ITERS = int(max_iterations)

    rot_vc = layout.syn_rot  # +s: var -> check coords
    rot_cv = ((layout.Z - layout.syn_rot) % layout.Z).astype(np.int32)

    # static per-bucket "any missing lane" flags: skip the mask pokes for
    # the (overwhelmingly common) clean buckets
    bucket_has_mask = tuple(
        bool(
            (layout.syn_mask[m.ebase : m.ebase + (m.g1 - m.g0) * m.d] >= 0)
            .any()
        )
        for m in metas
    )

    def kernel(cs_ref, vg_ref, rvc_ref, rot_cv_ref, mask_ref,
               qv_in, bits_in, bits_out, iters_out, conv_out,
               qv_buf, rcv_buf, frozen, conv_buf, iters_buf,
               done_smem, sem):
        bt = pl.program_id(0)
        it = pl.program_id(1)  # iteration index, 0 = init step
        lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)

        def syndrome_ok_rows(from_frozen):
            """(8, Bt) int32: 1 where ALL checks of the frame pass.

            Hard bits come from ``frozen`` (init step) or the sign of the
            resident Qv posteriors (per-iteration). Group-looped with
            dynamic rolls: the fully-unrolled static-roll form compiles
            ~10x larger (E edges x 2 instances) and blew the flagship
            code's remote-compile budget past 10 minutes."""
            acc0 = jnp.zeros((Z, Bt), jnp.float32)

            def acc_meta(acc, m, masked):
                d = m.d

                def grp(g, acc, m=m, d=d, masked=masked):
                    par = None
                    for t in range(d):
                        e = m.ebase + (g - m.g0) * d + t
                        vg = vg_ref[e]
                        if from_frozen:
                            b = frozen[vg].astype(jnp.float32)
                        else:
                            b = (
                                qv_buf[vg].astype(compute) <= 0
                            ).astype(jnp.float32)
                        b = _roll(b, rvc_ref[e], pad)
                        if masked:
                            b = jnp.where(lane == mask_ref[e], 0.0, b)
                        par = b if par is None else par + b
                    odd = par - 2.0 * jnp.floor(par * 0.5)
                    return jnp.maximum(acc, odd)

                return jax.lax.fori_loop(m.g0, m.g1, grp, acc)

            acc = acc0
            for mi, m in enumerate(metas):
                if m.d == 0:
                    continue
                acc = acc_meta(acc, m, bucket_has_mask[mi])
            if pad:
                # pad lanes of acc carry wrapped-garbage parities
                acc = jnp.where(lane >= layout.Z, 0.0, acc)
            bad = jnp.max(acc, axis=0, keepdims=True) > 0.5
            return jnp.broadcast_to(~bad, (8, Bt)).astype(jnp.int32)

        # ---- step 0: load state, zero Rcv, 0-iteration convergence ----
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
            ok = syndrome_ok_rows(from_frozen=True)
            conv_buf[...] = ok
            iters_buf[...] = jnp.zeros((8, Bt), jnp.int32)
            done_smem[0] = (jnp.sum(ok[0:1]) == Bt).astype(jnp.int32)

        # ---- one layered iteration (skipped once the tile is done) ----
        @pl.when((it > 0) & (done_smem[0] == 0))
        def _():
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

            ok = syndrome_ok_rows(from_frozen=False)
            conv = conv_buf[...]
            newly = ok & (1 - conv)
            iters_buf[...] = jnp.where(newly != 0, it, iters_buf[...])
            conv_buf[...] = conv | ok
            done_smem[0] = (jnp.sum((conv | ok)[0:1]) == Bt).astype(
                jnp.int32
            )
            n_new = jnp.sum(newly[0:1])

            @pl.when(n_new > 0)
            def _():
                nb = newly[0:1] != 0

                def freeze(vg, _):
                    hard = (qv_buf[vg].astype(compute) <= 0).astype(
                        jnp.int8
                    )
                    frozen[vg] = jnp.where(nb, hard, frozen[vg])
                    return 0

                jax.lax.fori_loop(0, VG, freeze, 0)

        # ---- last step: output frozen-or-final bits + counters ----
        @pl.when(it == ITERS)
        def _():
            cb = (conv_buf[0:1] != 0)

            def finalize(vg, _):
                hard = (qv_buf[vg].astype(compute) <= 0).astype(jnp.int8)
                frozen[vg] = jnp.where(cb, frozen[vg], hard)
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

"""Fused horizontal-layered BP iteration (Pallas TPU).

One kernel per iteration sweeps all check groups (layers) in flat bucket
order with the whole Qv posterior tile resident in VMEM (~33 MB f32 /
~17 MB i16 at Bt=128; the chip's VMEM comfortably holds it, see
ops/fused_bp2.py's measured limits):

  per layer (grid step): one contiguous (d, Z, Bt) Rcv slab streams in
  (double-buffered), x = layered_x(roll(Qv), Rold) with the in-VMEM Qv
  planes, rule.check recomputes Rnew, the slab streams back out, and Qv
  accumulates roll^-1(Rnew - Rold) in place — the serial dependency
  between layers lives entirely in VMEM, so HBM sees each Rcv byte twice
  and each Qv byte twice *per iteration* instead of per layer.

Matches decoder/lifted_layered.py's jnp reference bit-exactly (same layer
order, same rule fold order, same wrap/clip semantics; reference
horizontal_layered.rs:105-110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fused_bp2 import WS, FusedLayout, _interpret, _roll, build_fused_layout

__all__ = ["fused_layered_supported", "fused_layered_iteration"]


def fused_layered_supported(lg, rule) -> bool:
    try:
        layout = build_fused_layout(lg)
    except ValueError:
        return False
    return layout.fusable and layout.max_chk_degree <= rule.max_check_degree


def fused_layered_iteration(qv_t, rcv_t, layout: FusedLayout, rule):
    """(qv, rcv) -> (qv', rcv', bits); all arrays (nbt, *, Z, Bt).

    qv is var-group-major in var coordinates (dtype rule.qv storage);
    rcv is check-major in check coordinates (dtype rule.storage_dtype);
    bits are the posterior hard decisions after the sweep.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt, VG, Z, Bt = qv_t.shape  # Z = padded plane height (Zp)
    pad = Z - layout.Z
    E = layout.E
    CG = layout.CG
    total = nbt * CG
    metas = layout.chk_meta
    dmax = layout.max_chk_degree
    store = rcv_t.dtype
    qdtype = qv_t.dtype
    compute = rule.compute_dtype
    big = rule.big

    rot_vc = layout.syn_rot  # +s: var -> check coords
    rot_cv = ((layout.Z - layout.syn_rot) % layout.Z).astype(np.int32)

    def kernel(cs_ref, vg_ref, rvc_ref, rcv_ref_rot, mask_ref,
               qv_in, rcv_in, qv_out, rcv_out, bits_out,
               qv_buf, in_buf, obuf, bbuf, sem_qv, sem_in, sem_out):
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

        # load the Qv tile once per batch tile
        @pl.when(g == 0)
        def _():
            cp = pltpu.make_async_copy(qv_in.at[bt], qv_buf, sem_qv)
            cp.start()
            cp.wait()

        # Rcv input pipeline
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

        # reclaim within the tile only: each tile's epilogue drains all
        # its in-flight writes, so cross-tile waits would double-count
        @pl.when(g >= WS)
        def _():
            each_bucket(
                idx - WS, lambda m, i2: out_copy(i2, wslot, m.d).wait()
            )

        def compute_fn(m, idx2):
            islot = idx % 2
            lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)
            rolds = []
            xs = []
            for t in range(m.d):
                e = m.ebase + (g - m.g0) * m.d + t
                rold = in_buf[islot, t].astype(compute)
                qc = _roll(
                    qv_buf[vg_ref[e]].astype(compute), rvc_ref[e], pad
                )
                x = rule.layered_x(qc, rold)
                poke = lane == mask_ref[e]
                if pad:
                    poke |= lane >= layout.Z
                x = jnp.where(poke, big, x)
                rolds.append(rold)
                xs.append(x)
            rnews = rule.check(xs)
            for t in range(m.d):
                e = m.ebase + (g - m.g0) * m.d + t
                poke = lane == mask_ref[e]
                if pad:
                    poke |= lane >= layout.Z
                rn = jnp.where(poke, 0, rnews[t])
                obuf[wslot, t] = rn.astype(store)
                dv = _roll(rn - rolds[t], rcv_ref_rot[e], pad)
                qv_buf[vg_ref[e]] = (
                    qv_buf[vg_ref[e]].astype(compute) + dv
                ).astype(qdtype)
            out_copy(idx2, wslot, m.d).start()

        each_bucket(idx, compute_fn)

        # tile epilogue: drain Rcv writes, flush Qv and hard bits
        @pl.when(g == CG - 1)
        def _():
            for j in range(min(WS, CG)):
                i2 = idx - j
                each_bucket(
                    i2, lambda m, i2=i2: out_copy(i2, i2 % WS, m.d).wait()
                )
            for vg in range(VG):
                # i16 compares lack a native lowering: widen first
                bbuf[vg] = (qv_buf[vg].astype(compute) <= 0).astype(
                    jnp.int8
                )
            cp = pltpu.make_async_copy(qv_buf, qv_out.at[bt], sem_qv)
            cp.start()
            cp.wait()
            cp2 = pltpu.make_async_copy(bbuf, bits_out.at[bt], sem_qv)
            cp2.start()
            cp2.wait()

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
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((VG, Z, Bt), qdtype),
            pltpu.VMEM((2, dmax, Z, Bt), store),
            pltpu.VMEM((WS, dmax, Z, Bt), store),
            pltpu.VMEM((VG, Z, Bt), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((WS,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbt, VG, Z, Bt), qdtype),
            jax.ShapeDtypeStruct((nbt, E, Z, Bt), store),
            jax.ShapeDtypeStruct((nbt, VG, Z, Bt), jnp.int8),
        ],
        interpret=_interpret(),
        compiler_params=None
        if _interpret()
        else pltpu.CompilerParams(
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

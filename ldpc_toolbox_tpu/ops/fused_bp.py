"""Fused belief-propagation phase kernels (Pallas TPU).

One kernel invocation per (node-group, batch-tile) grid step performs the
entire half-iteration for that group:

  * d double-buffered DMAs fetch the incident message planes from HBM
    (contiguous (Z+align, Bt) windows of a lane-doubled source — the
    circulant roll is an aligned window plus a <align-row pltpu.roll
    residual);
  * the check (min-sum) or variable (sum-minus-own) rule runs on the
    stacked planes in VMEM;
  * outputs write back in lane-doubled form, so the *next* phase can DMA
    rolled windows directly — message data makes exactly one HBM round
    trip per phase.

Message arrays are stored **batch-tile-major**: ``(nbt, P, 2Z+align, Bt)``
with ``nbt = B // Bt``. A rolled window ``[bt, p, hi:hi+Z+align, :]`` is
then one fully contiguous HBM range (as is each output block), so every
DMA runs at streaming bandwidth instead of the ~25% efficiency of
256-byte strided rows that a plain ``(P, 2Z+align, B)`` layout gives at
Bt=128. This is the difference between ~150 GB/s and >600 GB/s per phase
on v5e.

Shapes: ``src`` (nbt, P, 2Z+align, Bt) lane-doubled planes; ``planes`` /
``shifts`` (G*d,) int32; outputs (nbt, G, d, 2Z+align, Bt) doubled planes
(check kernel) plus (nbt, G, 2Z+align, Bt) posteriors (variable kernel).
``double_planes`` / ``undouble_planes`` convert to and from the logical
``(P, Z, B)`` view.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "double_planes",
    "undouble_planes",
    "poke_doubled",
    "fused_check_minsum",
    "fused_var_update",
    "fused_syndrome",
]

#: fixed batch-tile width of the fused layout (one VPU lane group)
BT = 128


def _align_of(dtype) -> int:
    """Sublane tiling of the dtype: dynamic window offsets must be
    multiples of this (8 for 4-byte, 16 for 2-byte, 32 for 1-byte)."""
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def double_planes(x, Bt: int = BT):
    """(P, Z, B) -> (nbt, P, 2Z+align, Bt) with out[..., i, :] doubled
    over the plane axis: row i = plane[i % Z]."""
    P, Z, B = x.shape
    a = _align_of(x.dtype)
    nbt = B // Bt
    t = x.reshape(P, Z, nbt, Bt).transpose(2, 0, 1, 3)
    return jnp.concatenate([t, t, t[:, :, :a]], axis=2)


def undouble_planes(x, Z: int):
    """(nbt, P, 2Z+align, Bt) -> (P, Z, B) logical planes."""
    nbt, P, _, Bt = x.shape
    return x[:, :, :Z].transpose(1, 2, 0, 3).reshape(P, Z, nbt * Bt)


def poke_doubled(x, plane, lanes, value):
    """Set lanes of one plane (all doubled copies, all batch tiles)."""
    a = _align_of(x.dtype)
    Z = (x.shape[2] - a) // 2
    lanes = np.asarray(lanes)
    all_lanes = np.concatenate(
        [lanes, lanes + Z, lanes[lanes < a] + 2 * Z]
    )
    return x.at[:, plane, jnp.asarray(all_lanes)].set(value)


def _write_doubled(out_ref, t, plane, Z, align):
    plane = plane.astype(out_ref.dtype)
    out_ref[0, 0, t, :Z, :] = plane
    out_ref[0, 0, t, Z : 2 * Z, :] = plane
    out_ref[0, 0, t, 2 * Z :, :] = plane[:align, :]


def _phase_kernel_body(
    planes_ref, shifts_ref, src_ref, scratch, sems, d, Z, Bt, nbt, total,
    align
):
    """Shared DMA pipeline: returns the stacked (d, Z, Bt) input block."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    bt = pl.program_id(1)
    idx = g * nbt + bt

    def copies(idx2, slot):
        g2 = idx2 // nbt
        bt2 = idx2 % nbt
        out = []
        for t in range(d):
            e = g2 * d + t
            start = Z - shifts_ref[e]
            hi = pl.multiple_of((start // align) * align, align)
            out.append(
                pltpu.make_async_copy(
                    src_ref.at[
                        bt2,
                        planes_ref[e],
                        pl.ds(hi, Z + align),
                        :,
                    ],
                    scratch.at[slot, t],
                    sems.at[slot, t],
                )
            )
        return out

    slot = idx % 2

    @pl.when(idx == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(idx + 1 < total)
    def _():
        for c in copies(idx + 1, (idx + 1) % 2):
            c.start()

    for c in copies(idx, slot):
        c.wait()

    rolled = []
    for t in range(d):
        e = g * d + t
        start = Z - shifts_ref[e]
        lo = start - (start // align) * align
        win = jax.lax.switch(
            lo,
            [
                (
                    lambda j=j, t=t: _static_roll(
                        scratch, slot, t, j, Z, align
                    )
                )
                for j in range(align)
            ],
        )
        rolled.append(win[:Z, :])
    return rolled


def _static_roll(scratch, slot, t, j, Z, align):
    from jax.experimental.pallas import tpu as pltpu

    n = Z + align
    val = scratch[slot, t, :, :]
    if jnp.dtype(val.dtype).itemsize < 4:
        # Mosaic's rotate is 32-bit only: narrow storage upcasts in VMEM
        # (HBM traffic stays narrow; compute runs in f32)
        val = val.astype(jnp.float32)
    return pltpu.roll(val, (n - j) % n, 0)


#: largest per-group degree the fused kernels can hold in VMEM at the
#: 128-lane batch tile; callers fall back to the unfused path for bigger
#: buckets
MAX_FUSED_DEGREE = 10


def _interpret() -> bool:
    """Interpret the kernels off-TPU so the fused path stays testable on
    the CPU mesh."""
    return jax.default_backend() == "cpu"


def fused_check_minsum(src_doubled, planes, shifts, G, d, Z, B, scale=1.0):
    """Min-sum check update, fused: (nbt, P, 2Z+a, Bt) v2c ->
    (nbt, G*d, 2Z+a, Bt) c2v."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bt = src_doubled.shape[-1]
    nbt = B // Bt
    total = G * nbt
    dtype = src_doubled.dtype
    align = _align_of(dtype)
    # python literal, not a traced value: pallas kernels cannot capture
    # array constants
    big = float(jnp.finfo(dtype).max)

    def kernel(planes_ref, shifts_ref, src_ref, out_ref, scratch, sems):
        rolled = _phase_kernel_body(
            planes_ref, shifts_ref, src_ref, scratch, sems,
            d, Z, Bt, nbt, total, align,
        )
        mags = [jnp.abs(x) for x in rolled]
        negs = [x < 0 for x in rolled]
        m1 = mags[0]
        m2 = jnp.full_like(m1, big)
        arg = jnp.zeros(m1.shape, jnp.int32)
        par = negs[0]
        for k in range(1, d):
            mk = mags[k]
            m2 = jnp.minimum(m2, jnp.maximum(m1, mk))
            take = mk < m1
            m1 = jnp.where(take, mk, m1)
            arg = jnp.where(take, k, arg)
            par = par ^ negs[k]
        for t in range(d):
            loo = jnp.where(arg == t, m2, m1)
            if scale != 1.0:
                loo = loo * jnp.asarray(scale, dtype)
            out = jnp.where(par ^ negs[t], -loo, loo)
            _write_doubled(out_ref, t, out, Z, align)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, nbt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, d, 2 * Z + align, Bt),
            lambda g, bt, planes, shifts: (bt, g, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d, Z + align, Bt), dtype),
            pltpu.SemaphoreType.DMA((2, d)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbt, G, d, 2 * Z + align, Bt), dtype),
        interpret=_interpret(),
    )(
        jnp.asarray(planes.reshape(-1), jnp.int32),
        jnp.asarray(shifts.reshape(-1), jnp.int32),
        src_doubled,
    )
    return out.reshape(nbt, G * d, 2 * Z + align, Bt)


def fused_var_update(src_doubled, planes, shifts, q_tiled, G, d, Z, B):
    """Variable update, fused: c2v planes + channel LLRs -> (v2c doubled,
    posterior doubled). ``q_tiled`` is (nbt, G, Z, Bt)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bt = src_doubled.shape[-1]
    nbt = B // Bt
    total = G * nbt
    dtype = src_doubled.dtype
    align = _align_of(dtype)

    def kernel(planes_ref, shifts_ref, src_ref, q_ref, out_ref, post_ref,
               scratch, sems):
        rolled = _phase_kernel_body(
            planes_ref, shifts_ref, src_ref, scratch, sems,
            d, Z, Bt, nbt, total, align,
        )
        total_llr = q_ref[0, 0]
        for t in range(d):
            total_llr = total_llr + rolled[t]
        for t in range(d):
            _write_doubled(out_ref, t, total_llr - rolled[t], Z, align)
        # posterior also writes lane-doubled so the fused syndrome kernel
        # can DMA rolled windows of it directly
        post = total_llr.astype(post_ref.dtype)
        post_ref[0, 0, :Z, :] = post
        post_ref[0, 0, Z : 2 * Z, :] = post
        post_ref[0, 0, 2 * Z :, :] = post[:align, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, nbt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, Z, Bt), lambda g, bt, p, s: (bt, g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, d, 2 * Z + align, Bt),
                lambda g, bt, p, s: (bt, g, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2 * Z + align, Bt), lambda g, bt, p, s: (bt, g, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, d, Z + align, Bt), dtype),
            pltpu.SemaphoreType.DMA((2, d)),
        ],
    )
    out, post = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbt, G, d, 2 * Z + align, Bt), dtype),
            jax.ShapeDtypeStruct((nbt, G, 2 * Z + align, Bt), dtype),
        ],
        interpret=_interpret(),
    )(
        jnp.asarray(planes.reshape(-1), jnp.int32),
        jnp.asarray(shifts.reshape(-1), jnp.int32),
        src_doubled,
        q_tiled,
    )
    return out.reshape(nbt, G * d, 2 * Z + align, Bt), post


def fused_syndrome(post_doubled, planes, shifts, mask_lane, G, d, Z, B):
    """Parity-check syndrome, fused: lane-doubled posterior planes ->
    (G, B) int8 "this check group has an unsatisfied row".

    ``planes`` index the var-*group* planes of the posterior array;
    ``mask_lane[G*d]`` optionally excludes one check-coordinate lane per
    edge (-1 = none) — the incomplete-circulant fixup.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bt = post_doubled.shape[-1]
    nbt = B // Bt
    total = G * nbt
    dtype = post_doubled.dtype
    align = _align_of(dtype)

    def kernel(planes_ref, shifts_ref, mask_ref, src_ref, out_ref, scratch,
               sems):
        g = pl.program_id(0)
        rolled = _phase_kernel_body(
            planes_ref, shifts_ref, src_ref, scratch, sems,
            d, Z, Bt, nbt, total, align,
        )
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)
        parity = None
        for t in range(d):
            bit = (rolled[t] <= 0).astype(jnp.int32)
            bit = jnp.where(lane_ids == mask_ref[g * d + t], 0, bit)
            parity = bit if parity is None else parity ^ bit
        any_bad = jnp.max(parity, axis=0, keepdims=True).astype(jnp.int8)
        # Mosaic wants >= (8, 128) output tiles: write the row 8x
        out_ref[0, 0, :, :] = jnp.broadcast_to(any_bad, (8, Bt))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G, nbt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 8, Bt), lambda g, bt, planes, shifts, mask: (bt, g, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d, Z + align, Bt), dtype),
            pltpu.SemaphoreType.DMA((2, d)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbt, G, 8, Bt), jnp.int8),
        interpret=_interpret(),
    )(
        jnp.asarray(planes.reshape(-1), jnp.int32),
        jnp.asarray(shifts.reshape(-1), jnp.int32),
        jnp.asarray(mask_lane.reshape(-1), jnp.int32),
        post_doubled,
    )
    return out[:, :, 0, :].transpose(1, 0, 2).reshape(G, B)

"""Converged-frame compaction for the fused batched decoders.

The reference decodes frame-at-a-time and stops each frame at its own
convergence (flooding.rs:69-79); a batched while_loop instead runs every
tile until the *slowest* frame in the whole batch converges, so at high
SNR (avg ~5 iterations, tail ~30; results/run_all.log) most of the work
is wasted on already-converged frames.

This module restores per-frame early exit at batch-tile granularity with
a staged-halving schedule, keeping everything jit-compatible (static
shapes per stage):

  stage 0: all ``nbt`` tiles iterate while more than ``nbt/2 * bt`` frames
           remain unconverged;
  compact: pack the unconverged frames (stable order) into the first
           ``nbt/2`` tiles, remembering the permutation;
  stage 1: half the tiles iterate while more than ``nbt/4 * bt`` remain;
  ...
  last stage: one tile runs until all its frames converge or max_iters.

Per-frame results are scattered back to original frame order after each
stage, so the output is **bit-identical** to the unstaged loop: a frame's
BP trajectory is independent of its batchmates, frames are only ever
dropped from the active set once converged (or at max_iterations), and
the global iteration counter spans stages.

Stages after the first are gated by ``lax.cond`` so a low-SNR decode
where nothing converges pays only a zero-fill, not gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["staged_while_decode"]


def _untile(x):
    """(t, P, Z, bt) -> (P, Z, t*bt), frames on the last axis."""
    t, P, Z, bt = x.shape
    return x.transpose(1, 2, 0, 3).reshape(P, Z, t * bt)


def _tile(x, t, bt):
    """(P, Z, t*bt) -> (t, P, Z, bt)."""
    P, Z, _ = x.shape
    return x.reshape(P, Z, t, bt).transpose(2, 0, 1, 3)


def _gather_frames(x, sel, t_new, bt):
    """Select frames ``sel`` of a tiled array into ``t_new`` tiles."""
    return _tile(jnp.take(_untile(x), sel, axis=2), t_new, bt)


def _stage_sizes(nbt: int) -> list:
    sizes = [nbt]
    while sizes[-1] > 1:
        sizes.append((sizes[-1] + 1) // 2)
    return sizes


def staged_while_decode(
    *,
    nbt: int,
    bt: int,
    max_iterations: int,
    init_big: tuple,
    const_big: tuple,
    bits0,
    ok0,
    iteration,
    syndrome_ok,
):
    """Run the staged-compaction decode loop.

    Args:
      nbt, bt: tile count and tile width (B = nbt*bt frames).
      max_iterations: global iteration budget (spans stages).
      init_big: tiled iteration-state arrays, each (nbt, ..., bt).
      const_big: tiled read-only per-frame arrays (e.g. channel LLR
        planes) that the iteration needs; gathered at each compaction.
      bits0: (nbt, VG, Z, bt) int8 initial hard decisions.
      ok0: (B,) bool — frames whose initial hard decision already
        satisfies all checks (0-iteration exits, flooding.rs:56-64).
      iteration: fn(big: tuple, const: tuple) -> (big', bits); must
        accept any leading tile count.
      syndrome_ok: fn(bits) -> (B_active,) bool.

    Returns:
      (hard_planes (VG, Z, B) int8 in original frame order,
       iterations (B,) int32, converged (B,) bool).
    """
    B = nbt * bt
    VG, Z = bits0.shape[1], bits0.shape[2]

    out_full = jnp.zeros((VG, Z, B), jnp.int8)
    iters_full = jnp.zeros(B, jnp.int32)
    conv_full = jnp.zeros(B, bool)

    def run_stage(carry, tiles, cap_next):
        """One while_loop on the first ``tiles`` tiles until fewer than
        ``cap_next`` frames remain unconverged (or converged/max)."""
        (it, big, const, bits, conv_a, iters_a, frozen_a) = carry

        def body(state):
            it, big, bits, conv_a, iters_a, frozen_a = state
            big, bits = iteration(big, const)
            ok = syndrome_ok(bits)
            newly = ok & ~conv_a
            it = it + 1
            iters_a = jnp.where(newly, it, iters_a)
            nt = newly.reshape(tiles, 1, 1, bt)
            frozen_a = jnp.where(nt, bits, frozen_a)
            return (it, big, bits, conv_a | ok, iters_a, frozen_a)

        def cond(state):
            it, _big, _bits, conv_a, _iters, _frozen = state
            active = jnp.sum(~conv_a)
            return (it < max_iterations) & (active > cap_next)

        it, big, bits, conv_a, iters_a, frozen_a = jax.lax.while_loop(
            cond, body, (it, big, bits, conv_a, iters_a, frozen_a)
        )
        return (it, big, const, bits, conv_a, iters_a, frozen_a)

    def scatter_results(full, carry, perm):
        out_full, iters_full, conv_full = full
        (_it, _big, _const, bits, conv_a, iters_a, frozen_a) = carry
        tiles = bits.shape[0]
        ct = conv_a.reshape(tiles, 1, 1, bt)
        out_a = jnp.where(ct, frozen_a, bits)
        out_full = out_full.at[:, :, perm].set(_untile(out_a))
        iters_full = iters_full.at[perm].set(
            jnp.where(conv_a, iters_a, max_iterations)
        )
        conv_full = conv_full.at[perm].set(conv_a)
        return (out_full, iters_full, conv_full)

    def compact(carry, perm, t_new):
        """Pack unconverged frames first, keep the first t_new*bt."""
        (it, big, const, bits, conv_a, iters_a, frozen_a) = carry
        order = jnp.argsort(conv_a, stable=True)  # unconverged first
        sel = order[: t_new * bt]
        g = partial(_gather_frames, sel=sel, t_new=t_new, bt=bt)
        carry = (
            it,
            tuple(g(x) for x in big),
            tuple(g(x) for x in const),
            g(bits),
            conv_a[sel],
            iters_a[sel],
            g(frozen_a),
        )
        return carry, perm[sel]

    sizes = _stage_sizes(nbt)
    perm = jnp.arange(B, dtype=jnp.int32)
    carry = (
        jnp.int32(0),
        tuple(init_big),
        tuple(const_big),
        bits0,
        ok0,
        jnp.zeros(B, jnp.int32),
        bits0,
    )
    full = (out_full, iters_full, conv_full)

    for si, tiles in enumerate(sizes):
        last = si + 1 == len(sizes)
        cap_next = 0 if last else sizes[si + 1] * bt

        if si == 0:
            carry = run_stage(carry, tiles, cap_next)
            full = scatter_results(full, carry, perm)
        else:
            # gate: skip (zero-fill) when the previous stage already
            # finished the batch or exhausted the iteration budget
            def true_branch(ops, tiles=tiles, cap_next=cap_next):
                carry, perm, full = ops
                carry, perm = compact(carry, perm, tiles)
                carry = run_stage(carry, tiles, cap_next)
                full = scatter_results(full, carry, perm)
                return carry, perm, full

            def false_branch(ops, tiles=tiles):
                carry, perm, full = ops
                (it, big, const, bits, conv_a, iters_a, frozen_a) = carry
                shrink = lambda x: jnp.zeros(  # noqa: E731
                    (tiles,) + x.shape[1:], x.dtype
                )
                carry = (
                    it,
                    tuple(shrink(x) for x in big),
                    tuple(shrink(x) for x in const),
                    shrink(bits),
                    jnp.ones(tiles * bt, bool),  # count=0: later stages skip
                    jnp.zeros(tiles * bt, jnp.int32),
                    shrink(frozen_a),
                )
                return carry, jnp.zeros(tiles * bt, jnp.int32), full

            it = carry[0]
            conv_a = carry[4]
            proceed = (it < max_iterations) & jnp.any(~conv_a)
            carry, perm, full = jax.lax.cond(
                proceed, true_branch, false_branch, (carry, perm, full)
            )

    out_full, iters_full, conv_full = full
    return out_full, iters_full, conv_full

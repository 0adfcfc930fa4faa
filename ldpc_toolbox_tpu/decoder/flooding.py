"""Flooding-schedule belief propagation, batched over codewords.

TPU-native rebuild of the reference's ``decoder/flooding.rs``: one
iteration = all check nodes then all variable nodes, with per-frame early
exit. Here a whole batch decodes in one ``lax.while_loop``; converged
frames freeze their output and iteration count the first time their hard
decision satisfies H (flooding.rs:57-79), matching the reference's
per-frame semantics while the batch keeps running until every frame has
converged or ``max_iterations`` is reached.

Data movement per iteration (see decoder/layout.py): gather
``v2c[chk_edges]``, apply the arithmetic check rule, reshape into ``c2v``;
gather ``c2v[var_edges]``, apply the variable rule, reshape into ``v2c``;
then one more gather of the hard-decision bits for the syndrome check.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .layout import DecodeGraph

__all__ = ["flooding_decode"]


def _check_satisfied(graph: DecodeGraph, hard, chk_vars):
    """(B,) bool: True where the hard decision satisfies every parity check.

    ``hard``: (n, B) bool. Padded slots index the appended zero row, so no
    mask is needed (decoder.rs:157-164 semantics).
    """
    bits = jnp.concatenate(
        [hard.astype(jnp.int32), jnp.zeros((1, hard.shape[1]), jnp.int32)]
    )
    g = bits[chk_vars.reshape(-1)].reshape(graph.m, graph.dc_max, -1)
    syndrome = jnp.sum(g, axis=1, dtype=jnp.int32) & 1  # (m, B)
    return ~jnp.any(syndrome.astype(bool), axis=0)


def flooding_decode(graph: DecodeGraph, arithmetic, llrs, max_iterations: int):
    """Decode a batch of LLR frames.

    Args:
      graph: static decode layout.
      arithmetic: an ``Arithmetic`` instance.
      llrs: (B, n) float channel LLRs (positive -> bit 0).
      max_iterations: iteration cap.

    Returns:
      dict with ``codeword`` (B, n) uint8, ``iterations`` (B,) int32,
      ``success`` (B,) bool.
    """
    chk_edges = jnp.asarray(graph.chk_edges.reshape(-1))
    var_edges = jnp.asarray(graph.var_edges.reshape(-1))
    chk_mask = jnp.asarray(graph.chk_mask)
    var_mask = jnp.asarray(graph.var_mask)
    chk_vars = jnp.asarray(graph.chk_vars)

    llr_t = llrs.T  # (n, B)
    B = llr_t.shape[1]
    m, n, dc, dv = graph.m, graph.n, graph.dc_max, graph.dv_max

    # iteration-0 early exit on the raw channel LLRs (flooding.rs:56-64)
    hard0 = llr_t <= 0
    ok0 = _check_satisfied(graph, hard0, chk_vars)

    q = arithmetic.quantize(llr_t)  # (n, B) Llr
    msg_dtype = q.dtype

    def pad_flat(block, rows):
        """(rows, d, B) -> (rows*d + 1, B) with a zero sentinel row."""
        flat = block.reshape(rows * block.shape[1], B)
        return jnp.concatenate([flat, jnp.zeros((1, B), block.dtype)])

    # first variable messages are the channel LLRs (flooding.rs:93-99)
    v2c0 = pad_flat(jnp.broadcast_to(q[:, None, :], (n, dv, B)), n)

    def body(state):
        it, v2c, _hard, converged, iters, frozen = state
        x = v2c[chk_edges].reshape(m, dc, B)
        c2v_blk = arithmetic.check_messages(x, chk_mask)
        c2v = pad_flat(c2v_blk, m)
        y = c2v[var_edges].reshape(n, dv, B)
        v2c_blk, out_llr = arithmetic.var_update(q, y, var_mask)
        v2c_new = pad_flat(v2c_blk, n)
        hard = arithmetic.hard_decision(out_llr)
        ok = _check_satisfied(graph, hard, chk_vars)
        newly = ok & ~converged
        it = it + 1
        iters = jnp.where(newly, it, iters)
        frozen = jnp.where(newly[None, :], hard, frozen)
        return (it, v2c_new, hard, converged | ok, iters, frozen)

    def cond(state):
        it, _v2c, _hard, converged, _iters, _frozen = state
        return (it < max_iterations) & ~jnp.all(converged)

    init = (
        jnp.int32(0),
        v2c0.astype(msg_dtype),
        hard0,
        ok0,
        jnp.zeros(B, jnp.int32),
        hard0,
    )
    it, _v2c, hard_final, converged, iters, frozen = jax.lax.while_loop(
        cond, body, init
    )

    codeword = jnp.where(converged[None, :], frozen, hard_final)
    iters = jnp.where(converged, iters, max_iterations)
    return {
        "codeword": codeword.T.astype(jnp.uint8),
        "iterations": iters,
        "success": converged,
    }

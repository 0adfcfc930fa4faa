"""Horizontal-layered belief propagation, batched over codewords.

Rebuild of the reference's serial per-check schedule
(``decoder/horizontal_layered.rs``; Sharon/Litsyn/Goldberg): state is the
variable posteriors Qv and per-edge check messages Rcv; each check node
subtracts its old message, recomputes, and updates Qv in place
(horizontal_layered.rs:105-110).

On TPU the serial sweep becomes a ``lax.scan`` over *layers* — groups of
variable-disjoint checks extracted by order-preserving layering
(decoder/layout.extract_layers): every conflicting row pair executes in
increasing row index, so the schedule is serial-equivalent to the
reference's 0..m sweep — bit-identical messages, iteration counts and
codewords for the integer arithmetics (cross-validated against the scalar
C++ shim in tests/test_capi.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flooding import _check_satisfied
from .layout import DecodeGraph

__all__ = ["layered_decode"]


def layered_decode(graph: DecodeGraph, arithmetic, llrs, max_iterations: int):
    """Decode a batch of LLR frames with the horizontal-layered schedule.

    Same contract as :func:`flooding_decode`.
    """
    assert graph.layers is not None, "DecodeGraph built without layers"
    m, n, dc, dv = graph.m, graph.n, graph.dc_max, graph.dv_max

    layers = jnp.asarray(graph.layers)  # (L, R) padded with m
    # chk tables extended with a sentinel row for layer padding
    chk_vars_ext = jnp.concatenate(
        [jnp.asarray(graph.chk_vars), jnp.full((1, dc), n, jnp.int32)]
    )
    chk_mask_ext = jnp.concatenate(
        [jnp.asarray(graph.chk_mask), jnp.zeros((1, dc), bool)]
    )
    chk_vars = jnp.asarray(graph.chk_vars)

    llr_t = llrs.T  # (n, B)
    B = llr_t.shape[1]

    hard0 = llr_t <= 0
    ok0 = _check_satisfied(graph, hard0, chk_vars)

    store = arithmetic.storage_dtype
    compute = arithmetic.compute_dtype
    qv_store = arithmetic.var_llr_storage_dtype

    q = arithmetic.quantize(llr_t)
    qv0 = arithmetic.llr_to_var_llr(q).astype(qv_store)
    # Qv with a sentinel variable row (absorbs padded-slot scatters)
    qv0 = jnp.concatenate([qv0, jnp.zeros((1, B), qv0.dtype)])
    # Rcv with a sentinel check row (absorbs padded-layer rows)
    rcv0 = jnp.zeros((m + 1, dc, B), store)

    def layer_step(carry, rows):
        qv, rcv = carry
        vars_rd = chk_vars_ext[rows]  # (R, dc)
        mask_rd = chk_mask_ext[rows]  # (R, dc)
        qv_g = (
            qv[vars_rd.reshape(-1)]
            .reshape(*vars_rd.shape, B)
            .astype(compute)
        )
        rold = rcv[rows].astype(compute)
        x = arithmetic.layered_x(qv_g, rold)
        rnew = arithmetic.check_messages(x, mask_rd)
        rnew = jnp.where(mask_rd[..., None], rnew, rold)
        delta = arithmetic.layered_qv_delta(rnew, rold)
        delta = jnp.where(mask_rd[..., None], delta, 0)
        # rows within a layer are variable-disjoint, so these adds never
        # collide on a real variable (padding collides on the sentinel row)
        qv = qv.at[vars_rd.reshape(-1)].add(
            delta.reshape(-1, B).astype(qv.dtype)
        )
        rcv = rcv.at[rows].set(rnew.astype(store))
        return (qv, rcv), None

    def sweep(qv, rcv):
        (qv, rcv), _ = jax.lax.scan(layer_step, (qv, rcv), layers)
        return qv, rcv

    def body(state):
        it, qv, rcv, _hard, converged, iters, frozen = state
        qv, rcv = sweep(qv, rcv)
        out_llr = arithmetic.var_llr_to_llr(qv[:n].astype(compute))
        hard = arithmetic.hard_decision(out_llr)
        ok = _check_satisfied(graph, hard, chk_vars)
        newly = ok & ~converged
        it = it + 1
        iters = jnp.where(newly, it, iters)
        frozen = jnp.where(newly[None, :], hard, frozen)
        return (it, qv, rcv, hard, converged | ok, iters, frozen)

    def cond(state):
        it = state[0]
        converged = state[4]
        return (it < max_iterations) & ~jnp.all(converged)

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

    codeword = jnp.where(converged[None, :], frozen, hard_final)
    iters = jnp.where(converged, iters, max_iterations)
    return {
        "codeword": codeword.T.astype(jnp.uint8),
        "iterations": iters,
        "success": converged,
    }

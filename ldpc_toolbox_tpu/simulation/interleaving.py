"""DVB-S2 block (column) interleaver (batched, JAX).

Rebuild of ``src/simulation/interleaving.rs``: reshape to
(columns, len/columns), transpose, optionally read rows backwards (the
8PSK rate-3/5 case), flatten (interleaving.rs:28-85).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Interleaver"]


class Interleaver:
    def __init__(self, columns: int, read_rows_backwards: bool = False):
        self.columns = columns
        self.read_rows_backwards = read_rows_backwards

    def interleave(self, codeword):
        """(..., L) -> (..., L), L % columns == 0."""
        L = codeword.shape[-1]
        assert L % self.columns == 0
        a = codeword.reshape(*codeword.shape[:-1], self.columns, L // self.columns)
        t = jnp.swapaxes(a, -1, -2)  # (..., L/cols, cols)
        if self.read_rows_backwards:
            t = jnp.flip(t, axis=-1)
        return t.reshape(*codeword.shape[:-1], L)

    def deinterleave(self, codeword):
        L = codeword.shape[-1]
        assert L % self.columns == 0
        a = codeword.reshape(*codeword.shape[:-1], L // self.columns, self.columns)
        if self.read_rows_backwards:
            a = jnp.flip(a, axis=-1)
        t = jnp.swapaxes(a, -1, -2)  # (..., cols, L/cols)
        return t.reshape(*codeword.shape[:-1], L)

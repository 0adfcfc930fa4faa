"""Block puncturing / depuncturing (batched, JAX).

Rebuild of ``src/simulation/puncturing.rs``: the pattern partitions the
codeword into equal blocks; ``puncture`` drops the False blocks
(puncturing.rs:47-73) and ``depuncture`` re-inserts zero LLRs (erasures)
in their place (puncturing.rs:83-101). Both are static gathers under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["Puncturer", "PuncturingError"]


class PuncturingError(ValueError):
    pass


class Puncturer:
    def __init__(self, pattern):
        pattern = [bool(b) for b in pattern]
        assert pattern, "puncturing pattern must not be empty"
        self.pattern = pattern
        self.num_trues = sum(pattern)

    def rate(self) -> float:
        """len(pattern) / num_trues >= 1 (puncturing.rs:108-110)."""
        return len(self.pattern) / self.num_trues

    def _block_size(self, codeword_len: int) -> int:
        if codeword_len % len(self.pattern) != 0:
            raise PuncturingError(
                "codeword size not divisible by puncturing pattern length"
            )
        return codeword_len // len(self.pattern)

    def puncture(self, codeword):
        """(..., L) -> (..., L * num_trues / len(pattern))."""
        bs = self._block_size(codeword.shape[-1])
        keep = np.concatenate(
            [
                np.arange(k * bs, (k + 1) * bs)
                for k, b in enumerate(self.pattern)
                if b
            ]
        )
        return codeword[..., keep]

    def depuncture(self, llrs):
        """(..., P) -> (..., L) with zeros at punctured positions."""
        if llrs.shape[-1] % self.num_trues != 0:
            raise PuncturingError(
                "input size not divisible by number of kept blocks"
            )
        bs = llrs.shape[-1] // self.num_trues
        out_len = len(self.pattern) * bs
        # gather from [llrs ‖ 0]: position j reads its source block if kept,
        # else the appended zero
        src = np.full(out_len, llrs.shape[-1], dtype=np.int64)
        j = 0
        for k, b in enumerate(self.pattern):
            if b:
                src[k * bs : (k + 1) * bs] = np.arange(j * bs, (j + 1) * bs)
                j += 1
        ext = jnp.concatenate(
            [llrs, jnp.zeros((*llrs.shape[:-1], 1), llrs.dtype)], axis=-1
        )
        return ext[..., src]

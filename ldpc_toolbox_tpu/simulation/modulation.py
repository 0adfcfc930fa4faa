"""Modulation and demodulation (batched, JAX).

Rebuild of ``src/simulation/modulation.rs``:

* **BPSK**: bit 0 -> -1.0, bit 1 -> +1.0 (modulation.rs:87-95); LLR =
  -2x/sigma^2, negative scale because +1 carries bit 1 while LLR>0 means
  bit 0 (modulation.rs:123-129).
* **8PSK**: the DVB-S2 Gray constellation (modulation.rs:168-180) with the
  exact max-* LLR demapper per 3-bit symbol scaled by 1/sigma^2
  (modulation.rs:222-264).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["Bpsk", "Psk8"]


class Bpsk:
    BITS_PER_SYMBOL = 1.0
    COMPLEX = False

    def modulate(self, bits):
        """(..., L) 0/1 -> (..., L) float symbols."""
        return jnp.where(bits == 0, -1.0, 1.0).astype(jnp.float32)

    def demodulate(self, symbols, noise_sigma):
        """LLR = -2x/sigma^2; noise_sigma may be traced."""
        return (-2.0 / (noise_sigma * noise_sigma)) * symbols


_A = math.sqrt(0.5)
# DVB-S2 Gray 8PSK: symbol value per (b0, b1, b2) packed as b0*4+b1*2+b2
_PSK8_POINTS = np.zeros(8, dtype=np.complex64)
for _bits, _pt in [
    ((0, 0, 0), complex(_A, _A)),
    ((1, 0, 0), complex(0.0, 1.0)),
    ((1, 1, 0), complex(-_A, _A)),
    ((0, 1, 0), complex(-1.0, 0.0)),
    ((0, 1, 1), complex(-_A, -_A)),
    ((1, 1, 1), complex(0.0, -1.0)),
    ((1, 0, 1), complex(_A, -_A)),
    ((0, 0, 1), complex(1.0, 0.0)),
]:
    _PSK8_POINTS[_bits[0] * 4 + _bits[1] * 2 + _bits[2]] = _pt

# constellation-point index sets where each bit is 0 / 1
_BIT0_ZERO = [i for i in range(8) if not (i >> 2) & 1]
_BIT1_ZERO = [i for i in range(8) if not (i >> 1) & 1]
_BIT2_ZERO = [i for i in range(8) if not i & 1]


class Psk8:
    BITS_PER_SYMBOL = 3.0
    COMPLEX = True

    def modulate(self, bits):
        """(..., L) 0/1 with L % 3 == 0 -> (..., L/3) complex symbols."""
        assert bits.shape[-1] % 3 == 0
        trip = bits.reshape(*bits.shape[:-1], -1, 3).astype(jnp.int32)
        idx = trip[..., 0] * 4 + trip[..., 1] * 2 + trip[..., 2]
        return jnp.asarray(_PSK8_POINTS)[idx]

    def demodulate(self, symbols, noise_sigma):
        """(..., S) complex -> (..., 3*S) LLRs; exact max-* demapper."""
        points = jnp.asarray(_PSK8_POINTS)

        def maxstar_reduce(d):
            # max* fold over the last axis (modulation.rs:286-288)
            acc = d[..., 0]
            for i in range(1, d.shape[-1]):
                b = d[..., i]
                acc = jnp.maximum(acc, b) + jnp.log1p(jnp.exp(-jnp.abs(acc - b)))
            return acc

        s = symbols * (1.0 / (noise_sigma * noise_sigma))
        # dot(symbol, point) = re*re + im*im, for all 8 points
        d = s.real[..., None] * points.real + s.imag[..., None] * points.imag
        llr = []
        for zeros in (_BIT0_ZERO, _BIT1_ZERO, _BIT2_ZERO):
            ones = [i for i in range(8) if i not in zeros]
            llr.append(
                maxstar_reduce(d[..., zeros]) - maxstar_reduce(d[..., ones])
            )
        out = jnp.stack(llr, axis=-1)  # (..., S, 3)
        return out.reshape(*out.shape[:-2], -1)

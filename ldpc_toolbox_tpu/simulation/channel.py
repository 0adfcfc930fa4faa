"""AWGN channel (batched, JAX).

Rebuild of ``src/simulation/channel.rs``: adds N(0, sigma) noise per real
dimension — real symbols get one noise component, complex symbols get
independent real/imaginary components each with standard deviation sigma
(channel.rs:36-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["AwgnChannel"]


class AwgnChannel:
    """Stateless AWGN channel; ``noise_sigma`` may be a traced scalar so a
    single compiled step serves a whole Eb/N0 sweep."""

    @staticmethod
    def add_noise(key, symbols, noise_sigma):
        if jnp.iscomplexobj(symbols):
            kr, ki = jax.random.split(key)
            re = jax.random.normal(kr, symbols.shape, jnp.float32)
            im = jax.random.normal(ki, symbols.shape, jnp.float32)
            return symbols + noise_sigma * (re + 1j * im)
        noise = jax.random.normal(key, symbols.shape, symbols.dtype)
        return symbols + noise_sigma * noise

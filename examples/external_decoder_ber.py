"""Plugging an external decoder arithmetic into the BER harness.

The reference demonstrates its decoder plug-in surface by extending the
``DecoderImplementation`` enum and reusing the stock BER CLI wholesale
(examples/external_decoder_ber.rs:15-82). The equivalent surface here is
the ``DECODER_IMPLEMENTATIONS`` registry: register a name mapping to
(schedule, arithmetic factory) and every consumer — ``Decoder``,
``BerTestBuilder``, the ``ber`` CLI — picks it up.

Run:  python examples/external_decoder_ber.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from ldpc_toolbox_tpu.decoder.arithmetic import Arithmetic, _loo_sign
from ldpc_toolbox_tpu.decoder.factory import DECODER_IMPLEMENTATIONS
from ldpc_toolbox_tpu.mackay_neal import Config
from ldpc_toolbox_tpu.simulation import BerTestBuilder
from ldpc_toolbox_tpu.systematic import parity_to_systematic


class OffsetMinSum(Arithmetic):
    """Offset min-sum: loo-min magnitudes reduced by a constant offset
    (a common hardware-friendly alternative to normalization)."""

    def __init__(self, offset=0.5, dtype=jnp.float32):
        super().__init__(dtype)
        self.offset = offset

    def check_messages(self, x, mask=None):
        mask_e = None if mask is None else mask[..., None]
        big = jnp.asarray(jnp.finfo(self.dtype).max, self.dtype)
        mag = jnp.abs(x)
        if mask_e is not None:
            mag = jnp.where(mask_e, mag, big)
        min1 = jnp.min(mag, axis=1, keepdims=True)
        idx1 = jnp.argmin(mag, axis=1, keepdims=True)
        import jax

        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1), 1) == idx1
        )
        min2 = jnp.min(jnp.where(onehot, big, mag), axis=1, keepdims=True)
        loo = jnp.where(onehot, min2, min1)
        loo = jnp.maximum(loo - self.offset, 0.0)  # the offset correction
        return _loo_sign(x, mask_e).astype(self.dtype) * loo


def register():
    """Make the external arithmetic available under both schedules."""
    DECODER_IMPLEMENTATIONS["Offsetminsumf32"] = (
        "flooding",
        lambda: OffsetMinSum(),
    )
    DECODER_IMPLEMENTATIONS["HLOffsetminsumf32"] = (
        "layered",
        lambda: OffsetMinSum(),
    )


def main():
    register()
    h = parity_to_systematic(Config(nrows=128, ncols=256, wr=6, wc=3).run(7))
    test = BerTestBuilder(
        h=h,
        decoder_implementation="Offsetminsumf32",  # the external decoder
        ebn0s_db=[2.0, 3.0],
        max_frame_errors=20,
        max_iterations=30,
        batch_size=128,
        max_run_time=30.0,
    ).build()
    for s in test.run():
        print(
            f"Eb/N0 {s.ebn0_db:4.1f} dB: frames={s.num_frames} "
            f"BER={s.ldpc.ber:.2e} FER={s.ldpc.fer:.2e} "
            f"avg_iters={s.average_iterations:.1f}"
        )


if __name__ == "__main__":
    main()

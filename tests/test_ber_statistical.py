"""Statistical BER validation.

The reference validates decoder quality end-to-end through BER curves
(SURVEY.md §4 notes its 8-bit variants are *only* validated that way).
These tests check the physics: a (3,6)-regular LDPC code must show a
waterfall — decreasing BER/FER and iteration counts with Eb/N0 — and the
schedule/arithmetic variants must land on comparable operating points
(layered converging in roughly half the iterations of flooding, the
quantized i8 rules within a small factor of the float rules).
"""

import numpy as np
import pytest

from ldpc_toolbox_tpu.mackay_neal import Config as MNConfig
from ldpc_toolbox_tpu.simulation import BerTestBuilder
from ldpc_toolbox_tpu.systematic import parity_to_systematic


@pytest.fixture(scope="module")
def code_3_6():
    # (3,6)-regular rate-1/2 n=512 (the BASELINE.json config, scaled down
    # to keep CPU Monte-Carlo fast)
    h = MNConfig(nrows=256, ncols=512, wr=6, wc=3).run(123)
    return parity_to_systematic(h)


def _run(h, impl, ebn0s, max_frame_errors=30, seed=0, max_iterations=50):
    test = BerTestBuilder(
        h=h,
        decoder_implementation=impl,
        ebn0s_db=ebn0s,
        max_frame_errors=max_frame_errors,
        max_run_time=20.0,
        max_iterations=max_iterations,
        batch_size=128,
        seed=seed,
    ).build()
    return test.run()


def test_waterfall_flooding(code_3_6):
    stats = _run(code_3_6, "Phif32", [1.0, 2.0, 3.0])
    bers = [s.ldpc.ber for s in stats]
    fers = [s.ldpc.fer for s in stats]
    iters = [s.average_iterations for s in stats]
    assert bers[0] > bers[1] > bers[2]
    assert fers[0] > fers[1] > fers[2]
    assert iters[0] > iters[2]
    # at 3 dB a (3,6) code with 50 iterations is deep in the waterfall
    assert bers[2] < 2e-3
    assert fers[2] < 0.1


@pytest.mark.slow
def test_layered_converges_faster(code_3_6):
    flood = _run(code_3_6, "Minstarapproxf32", [2.5])[0]
    layered = _run(code_3_6, "HLMinstarapproxf32", [2.5])[0]
    # the serial schedule converges in roughly half the iterations
    # (horizontal_layered.rs module docs); allow generous slack
    assert (
        layered.ldpc.average_iterations_correct
        < 0.75 * flood.ldpc.average_iterations_correct
    )
    # quality within Monte-Carlo slack of each other
    assert layered.ldpc.fer < 4 * flood.ldpc.fer + 0.02


def test_i8_close_to_float(code_3_6):
    f32 = _run(code_3_6, "Minstarapproxf32", [3.0], max_frame_errors=20)[0]
    i8 = _run(code_3_6, "Minstarapproxi8", [3.0], max_frame_errors=20)[0]
    # C=8 quantization costs a little performance but stays in the same
    # decade at this operating point
    assert i8.ldpc.fer < 6 * f32.ldpc.fer + 0.03


def test_minsum_extension_reasonable(code_3_6):
    ms = _run(code_3_6, "Minsumf32", [3.0], max_frame_errors=20)[0]
    ref = _run(code_3_6, "Minstarapproxf32", [3.0], max_frame_errors=20)[0]
    # plain min-sum is known to lose ~0.2-0.5 dB vs corrected rules
    assert ms.ldpc.fer < 10 * ref.ldpc.fer + 0.05

"""Simulation layer tests: modems, puncturing, interleaving, channel, BER.

Fixtures come from the reference tests (puncturing.rs:118-129,
interleaving.rs:92-124, modulation.rs:294-346, channel.rs:105-113).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_toolbox_tpu.mackay_neal import Config as MNConfig
from ldpc_toolbox_tpu.simulation import (
    AwgnChannel,
    BerTestBuilder,
    Bpsk,
    Interleaver,
    Modulation,
    Psk8,
    Puncturer,
)
from ldpc_toolbox_tpu.systematic import parity_to_systematic


def test_puncturer_fixture():
    p = Puncturer([True, True, False, True, False])
    cw = jnp.arange(10)
    out = np.asarray(p.puncture(cw))
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 6, 7])
    llrs = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    back = np.asarray(p.depuncture(llrs))
    np.testing.assert_array_equal(back, [1, 2, 3, 4, 0, 0, 5, 6, 0, 0])
    assert p.rate() == 5 / 3


def test_puncturer_batched():
    p = Puncturer([True, False])
    cw = jnp.arange(12).reshape(2, 6)
    out = np.asarray(p.puncture(cw))
    np.testing.assert_array_equal(out, [[0, 1, 2], [6, 7, 8]])
    back = np.asarray(p.depuncture(jnp.asarray(out, jnp.float32)))
    np.testing.assert_array_equal(
        back, [[0, 1, 2, 0, 0, 0], [6, 7, 8, 0, 0, 0]]
    )


def test_interleaver_fixtures():
    i3 = Interleaver(3, False)
    out = np.asarray(i3.interleave(jnp.arange(6)))
    np.testing.assert_array_equal(out, [0, 2, 4, 1, 3, 5])
    ib = Interleaver(3, True)
    outb = np.asarray(ib.interleave(jnp.arange(6)))
    np.testing.assert_array_equal(outb, [4, 2, 0, 5, 3, 1])


@pytest.mark.parametrize("backwards", [False, True])
def test_interleaver_roundtrip(backwards):
    il = Interleaver(3, backwards)
    x = jnp.arange(24).reshape(2, 12)
    y = il.interleave(x)
    np.testing.assert_array_equal(np.asarray(il.deinterleave(y)), np.asarray(x))


def test_bpsk_modulator():
    m = Bpsk()
    x = np.asarray(m.modulate(jnp.array([1, 0])))
    np.testing.assert_array_equal(x, [1.0, -1.0])


def test_bpsk_demodulator():
    m = Bpsk()
    x = np.asarray(m.demodulate(jnp.array([1.0, -1.0]), math.sqrt(2.0)))
    assert abs(x[0] + 1.0) < 1e-4
    assert abs(x[1] - 1.0) < 1e-4


def test_psk8_modulator():
    m = Psk8()
    x = np.asarray(m.modulate(jnp.array([1, 1, 0, 0, 0, 0, 1, 0, 1])))
    a = math.sqrt(0.5)
    np.testing.assert_allclose(
        x, [complex(-a, a), complex(a, a), complex(a, -a)], atol=1e-6
    )


def test_psk8_demodulator_signs():
    m = Psk8()
    a = math.sqrt(0.5)
    llr = np.asarray(
        m.demodulate(
            jnp.array([complex(1, 0), complex(a, a), complex(0, 1)]), 1.0
        )
    )
    # symbols encode 001, 000, 100
    signs = np.sign(llr)
    np.testing.assert_array_equal(signs, [1, 1, -1, 1, 1, 1, -1, 1, 1])


def test_awgn_zero_sigma_noop():
    key = jax.random.key(0)
    x = jnp.array([1.0, -1.0, 0.5])
    np.testing.assert_array_equal(
        np.asarray(AwgnChannel.add_noise(key, x, 0.0)), np.asarray(x)
    )
    xc = jnp.array([1 + 1j, -1 - 1j])
    np.testing.assert_array_equal(
        np.asarray(AwgnChannel.add_noise(key, xc, 0.0)), np.asarray(xc)
    )


def test_awgn_statistics():
    key = jax.random.key(1)
    x = jnp.zeros(20000)
    y = np.asarray(AwgnChannel.add_noise(key, x, 2.0))
    assert abs(y.mean()) < 0.1
    assert abs(y.std() - 2.0) < 0.1


def _test_code():
    return parity_to_systematic(
        MNConfig(nrows=32, ncols=64, wr=6, wc=3).run(11)
    )


def test_ber_test_basic():
    h = _test_code()
    reports = []
    test = BerTestBuilder(
        h=h,
        decoder_implementation="Phif32",
        ebn0s_db=[3.0, 5.0],
        max_frame_errors=8,
        max_iterations=25,
        batch_size=64,
        reporter=lambda s, final: reports.append((s, final)),
        seed=3,
    ).build()
    assert test.k == 32 and test.n == 64 and test.rate == 0.5
    stats = test.run()
    assert len(stats) == 2
    for s in stats:
        assert s.num_frames % 64 == 0 and s.num_frames > 0
        assert 0 <= s.ldpc.ber <= 1
        assert s.ldpc.fer >= s.ldpc.ber
        assert s.throughput_mbps > 0
        assert s.total_iterations >= s.num_frames - s.ldpc.frame_errors
    # higher SNR -> lower error rate
    assert stats[1].ldpc.fer <= stats[0].ldpc.fer
    # reporter got the final report per point
    finals = [s for s, f in reports if f]
    assert len(finals) == 2


def test_ber_test_with_puncturing_and_rate():
    h = _test_code()
    test = BerTestBuilder(
        h=h,
        decoder_implementation="Minstarapproxf32",
        puncturing_pattern=[True, True, True, False],
        ebn0s_db=[6.0],
        max_frame_errors=4,
        max_iterations=25,
        batch_size=32,
        seed=1,
    ).build()
    assert test.n == 48  # 64 * 3/4
    assert test.rate == 32 / 48
    stats = test.run()
    assert stats[0].num_frames > 0


def test_ber_test_8psk_interleaved():
    # n=64 is not divisible by 3; use a 66-column code for 8PSK
    h = parity_to_systematic(MNConfig(nrows=30, ncols=66, wr=8, wc=3).run(5))
    test = BerTestBuilder(
        h=h,
        modulation=Modulation.PSK8,
        decoder_implementation="Phif32",
        interleaving_columns=3,
        ebn0s_db=[8.0],
        max_frame_errors=4,
        max_iterations=25,
        batch_size=32,
        seed=2,
    ).build()
    stats = test.run()
    assert stats[0].num_frames > 0
    assert stats[0].ldpc.ber < 0.5


def test_ber_test_bch_accounting():
    h = _test_code()
    test = BerTestBuilder(
        h=h,
        decoder_implementation="Phif32",
        ebn0s_db=[2.0],
        max_frame_errors=8,
        bch_max_errors=2,
        max_iterations=10,
        batch_size=64,
        seed=7,
    ).build()
    stats = test.run()
    s = stats[0]
    assert s.bch is not None
    # BCH cleans up frames with <= 2 residual errors: never more BCH frame
    # errors than LDPC frame errors
    assert s.bch.frame_errors <= s.ldpc.frame_errors
    assert s.bch.correct_iterations >= s.ldpc.correct_iterations


def test_ber_max_run_time():
    import time

    h = _test_code()
    test = BerTestBuilder(
        h=h,
        decoder_implementation="Phif32",
        ebn0s_db=[20.0],  # essentially error-free: would never hit max errors
        max_frame_errors=1000000,
        max_run_time=2.0,
        batch_size=32,
        seed=0,
    ).build()
    t0 = time.monotonic()
    stats = test.run()
    assert time.monotonic() - t0 < 30  # bounded by max_run_time + compile
    assert stats[0].num_frames > 0

"""Monte-Carlo BER/FER parity vs reference-semantics scalar decoders.

BASELINE.md requires BER-curve parity per (code, arithmetic, schedule)
against the reference.  The Rust build is unavailable in this environment
(BASELINE.md "Building the reference"), so the parity target is the C-ABI
shim (capi/ldpc_toolbox.cpp) — an independent scalar implementation of the
reference's numeric semantics (arithmetic.rs, flooding.rs,
horizontal_layered.rs) already cross-validated frame-for-frame in
tests/test_capi.py.

This test runs the BASELINE.json config-1/2 workload — a MacKay-Neal
(3,6)-regular rate-1/2 code, BPSK/AWGN at a waterfall operating point —
through the JAX batched path and the scalar shim on the SAME channel
realizations, and checks:

* quantized (i8) rules: bit-exact frame-for-frame parity (success AND
  codeword);
* float rules: per-frame agreement within Monte-Carlo tolerance (the
  batched fold order differs from the scalar fold order, which can flip
  individual borderline frames), and FER parity within a binomial CI.
"""

import ctypes
import pathlib

import numpy as np
import pytest

from ldpc_toolbox_tpu.decoder import Decoder
from ldpc_toolbox_tpu.encoder import Encoder
from ldpc_toolbox_tpu.mackay_neal import Config as MNConfig
from ldpc_toolbox_tpu.mackay_neal import FillPolicy
from ldpc_toolbox_tpu.sparse import SparseMatrix
from ldpc_toolbox_tpu.systematic import parity_to_systematic

from test_capi import lib  # noqa: F401  (module-scoped fixture)

N_FRAMES = 400
MAX_ITER = 50
EBN0_DB = 2.4  # waterfall point for a (3,6) n=512 code: FER ~ 0.2-0.6


@pytest.fixture(scope="module")
def mn_code():
    # BASELINE.json config 1: MacKay-Neal (3,6)-regular rate-1/2.
    # Round-trip through the alist so BOTH decoders see the same adjacency
    # order: the i8 check fold is non-associative, the C ABI consumes
    # alists (sorted adjacency), and the in-memory matrix keeps insertion
    # order — the alist is the canonical interop representation.
    conf = MNConfig(
        nrows=256,
        ncols=512,
        wr=6,
        wc=3,
        backtrack_cols=3,
        backtrack_trials=100,
    )
    h = parity_to_systematic(conf.run(1))
    return SparseMatrix.from_alist(h.alist())


@pytest.fixture(scope="module")
def channel(mn_code):
    """One fixed set of noisy LLR frames shared by both implementations."""
    rng = np.random.default_rng(7)
    enc = Encoder(mn_code)
    n = mn_code.num_cols
    rate = enc.k / n
    ebn0 = 10 ** (0.1 * EBN0_DB)
    sigma = float(np.sqrt(0.5 / (rate * ebn0)))
    msgs = rng.integers(0, 2, (N_FRAMES, enc.k))
    cws = np.stack([enc.encode(m) for m in msgs])
    x = 1.0 - 2.0 * cws + sigma * rng.standard_normal((N_FRAMES, n))
    llrs = (2.0 / sigma**2) * x
    return llrs.astype(np.float64), cws


def _scalar_decode_all(lib, mn_code, impl, llrs):  # noqa: F811
    alist = mn_code.alist().encode()
    handle = lib.ldpc_toolbox_decoder_ctor_alist_string(alist, impl.encode(), b"")
    assert handle
    n = mn_code.num_cols
    success = np.zeros(len(llrs), bool)
    cw = np.zeros((len(llrs), n), np.uint8)
    try:
        out = (ctypes.c_uint8 * n)()
        for i, llr in enumerate(llrs):
            llr_c = (ctypes.c_double * n)(*llr)
            rc = lib.ldpc_toolbox_decoder_decode_f64(
                handle, out, n, llr_c, n, MAX_ITER
            )
            success[i] = rc >= 0
            cw[i] = np.frombuffer(bytes(out), np.uint8)
    finally:
        lib.ldpc_toolbox_decoder_dtor(handle)
    return success, cw


def _jax_decode_all(mn_code, impl, llrs):
    dec = Decoder(mn_code, impl)
    out = dec.decode_batch(np.asarray(llrs, np.float32), MAX_ITER)
    return np.asarray(out["success"]), np.asarray(out["codeword"])


@pytest.mark.parametrize(
    "impl",
    [
        "Minstarapproxi8",
        "Aminstari8",
        "Minstarapproxi8JonesPartialHardLimitDeg1Clip",
    ],
)
def test_i8_fer_bit_exact(lib, mn_code, channel, impl):  # noqa: F811
    llrs, _ = channel
    s_ref, cw_ref = _scalar_decode_all(lib, mn_code, impl, llrs)
    s_jax, cw_jax = _jax_decode_all(mn_code, impl, llrs)
    np.testing.assert_array_equal(s_ref, s_jax)
    np.testing.assert_array_equal(cw_ref, cw_jax)
    # the operating point actually exercises the waterfall
    fer = 1 - s_ref.mean()
    assert 0.01 < fer < 0.95, fer


@pytest.mark.parametrize(
    "impl",
    [
        "Phif64",
        "Minstarapproxf32",
        # every f64 family vs the shim's real float64 (VERDICT r2 #10):
        # on CPU the jax side also computes f64, so parity here is the
        # recorded statement that the f64 names are faithful
        pytest.param("Tanhf64", marks=pytest.mark.slow),
        pytest.param("Aminstarf64", marks=pytest.mark.slow),
        pytest.param("Minstarapproxf64", marks=pytest.mark.slow),
    ],
)
def test_float_fer_parity(lib, mn_code, channel, impl):  # noqa: F811
    llrs, _ = channel
    s_ref, _ = _scalar_decode_all(lib, mn_code, impl, llrs)
    s_jax, _ = _jax_decode_all(mn_code, impl, llrs)
    # per-frame agreement: float fold-order differences may flip only a
    # few borderline frames
    disagree = int(np.sum(s_ref != s_jax))
    assert disagree <= max(3, 0.02 * N_FRAMES), (
        impl,
        disagree,
        float(1 - s_ref.mean()),
        float(1 - s_jax.mean()),
    )
    # FER within a 3-sigma binomial CI of the reference-semantics FER
    fer_ref = 1 - s_ref.mean()
    fer_jax = 1 - s_jax.mean()
    ci = 3 * np.sqrt(max(fer_ref * (1 - fer_ref), 1e-4) / N_FRAMES)
    assert abs(fer_jax - fer_ref) <= ci + 2 / N_FRAMES, (impl, fer_ref, fer_jax)
    assert 0.01 < fer_ref < 0.95, fer_ref


# ---------------------------------------------------------------------------
# Full 44-name parity matrix (VERDICT r3 #4). Classification per name —
# see PARITY.md for the complete table:
#   * i8 names: bit-exact frame-for-frame vs the shim
#   * float names (f64/f32/bf16): per-frame within fold-order tolerance
#     + FER binomial CI vs the shim
#   * Normminsum* (no shim entry): bit-exact vs the scalar min-sum
#     oracle (test_decoder.py ORACLES)
# Names already strongly covered by the dedicated tests above/below are
# excluded here; one representative per remaining family stays fast.
# ---------------------------------------------------------------------------

_COVERED_ELSEWHERE = {
    # test_i8_fer_bit_exact / test_layered_i8_bit_exact
    "Minstarapproxi8", "Aminstari8",
    "Minstarapproxi8JonesPartialHardLimitDeg1Clip", "HLMinstarapproxi8",
    # test_float_fer_parity / test_layered_float_parity
    "Phif64", "Minstarapproxf32", "Tanhf64", "Aminstarf64",
    "Minstarapproxf64", "HLPhif64",
    # scalar-oracle bit-exact (test_decoder.py ORACLES)
    "Normminsumf32", "Normminsumbf16", "Minsumf32", "Minsumbf16",
}
_FAST_MATRIX = {"Tanhf32", "Aminstarf32", "HLMinsumbf16", "Aminstari8Jones"}


def _matrix_names():
    from ldpc_toolbox_tpu.decoder.factory import DECODER_IMPLEMENTATIONS

    names = [
        n
        for n in sorted(DECODER_IMPLEMENTATIONS)
        if n not in _COVERED_ELSEWHERE and "Normminsum" not in n
    ]
    return [
        n if n in _FAST_MATRIX else pytest.param(n, marks=pytest.mark.slow)
        for n in names
    ]


@pytest.mark.parametrize("impl", _matrix_names())
def test_parity_matrix(lib, mn_code, channel, impl):  # noqa: F811
    """Every remaining reference factory name vs the scalar shim on the
    shared channel fixture: i8 bit-exact, float within the fold-order
    tolerance + FER CI (reference names: factory.rs:240-277)."""
    llrs, _ = channel
    s_ref, cw_ref = _scalar_decode_all(lib, mn_code, impl, llrs)
    s_jax, cw_jax = _jax_decode_all(mn_code, impl, llrs)
    fer_ref = 1 - s_ref.mean()
    assert 0.001 < fer_ref < 0.95, fer_ref
    if "i8" in impl:
        np.testing.assert_array_equal(s_ref, s_jax)
        np.testing.assert_array_equal(cw_ref, cw_jax)
        return
    # float: batched fold order differs from scalar fold order (and bf16
    # names store messages in bf16 while the shim computes f32)
    tol_frames = max(3, 0.02 * N_FRAMES)
    if "bf16" in impl:
        tol_frames = max(8, 0.04 * N_FRAMES)
    disagree = int(np.sum(s_ref != s_jax))
    assert disagree <= tol_frames, (
        impl, disagree, float(fer_ref), float(1 - s_jax.mean()),
    )
    fer_jax = 1 - s_jax.mean()
    ci = 3 * np.sqrt(max(fer_ref * (1 - fer_ref), 1e-4) / N_FRAMES)
    assert abs(fer_jax - fer_ref) <= ci + 2 / N_FRAMES, (
        impl, fer_ref, fer_jax,
    )


def test_layered_i8_bit_exact(lib, mn_code, channel):  # noqa: F811
    """The generic layered schedule is serial-equivalent to the
    reference's 0..m row sweep (decoder/layout.py extract_layers, commit
    4cc96c5), so the quantized rule must agree frame-for-frame with the
    scalar shim — success flags AND codewords."""
    llrs, _ = channel
    impl = "HLMinstarapproxi8"
    s_ref, cw_ref = _scalar_decode_all(lib, mn_code, impl, llrs)
    s_jax, cw_jax = _jax_decode_all(mn_code, impl, llrs)
    np.testing.assert_array_equal(s_ref, s_jax)
    np.testing.assert_array_equal(cw_ref, cw_jax)
    fer = 1 - s_ref.mean()
    assert 0.001 < fer < 0.95, fer


def test_layered_float_parity(lib, mn_code, channel):  # noqa: F811
    """Float layered: per-frame agreement up to fold-order rounding flips
    (same tolerance as the flooding float test) — the schedule itself is
    serial-equivalent to the reference's row order."""
    llrs, _ = channel
    impl = "HLPhif64"
    s_ref, _ = _scalar_decode_all(lib, mn_code, impl, llrs)
    s_jax, _ = _jax_decode_all(mn_code, impl, llrs)
    disagree = int(np.sum(s_ref != s_jax))
    assert disagree <= max(3, 0.02 * N_FRAMES), (
        impl,
        disagree,
        float(1 - s_ref.mean()),
        float(1 - s_jax.mean()),
    )
    fer_ref = 1 - s_ref.mean()
    assert 0.001 < fer_ref < 0.95, fer_ref

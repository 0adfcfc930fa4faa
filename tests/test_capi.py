"""C-ABI shim tests: build capi/libldpc_toolbox_tpu.so and cross-check it
against the Python/JAX implementations through ctypes.

The shim mirrors the reference's C API (include/ldpc_toolbox.h,
c_api/decoder.rs:76-137, c_api/encoder.rs:56-97): opaque ctor/dtor,
decode_f64/f32 returning iterations or -1, built-in (de)puncturing.
"""

import ctypes
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from ldpc_toolbox_tpu.decoder import Decoder
from ldpc_toolbox_tpu.encoder import Encoder
from ldpc_toolbox_tpu.mackay_neal import Config as MNConfig
from ldpc_toolbox_tpu.systematic import parity_to_systematic

CAPI_DIR = pathlib.Path(__file__).resolve().parent.parent / "capi"


@pytest.fixture(scope="module")
def lib():
    if shutil.which("g++") is None and shutil.which("make") is None:
        pytest.skip("no native toolchain")
    subprocess.run(["make", "-s"], cwd=CAPI_DIR, check=True)
    lib = ctypes.CDLL(str(CAPI_DIR / "libldpc_toolbox_tpu.so"))
    lib.ldpc_toolbox_decoder_ctor_alist_string.restype = ctypes.c_void_p
    lib.ldpc_toolbox_decoder_ctor_alist_string.argtypes = [ctypes.c_char_p] * 3
    lib.ldpc_toolbox_decoder_dtor.argtypes = [ctypes.c_void_p]
    lib.ldpc_toolbox_decoder_decode_f64.restype = ctypes.c_int32
    lib.ldpc_toolbox_decoder_decode_f64.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_size_t,
        ctypes.c_uint32,
    ]
    lib.ldpc_toolbox_encoder_ctor_alist_string.restype = ctypes.c_void_p
    lib.ldpc_toolbox_encoder_ctor_alist_string.argtypes = [ctypes.c_char_p] * 2
    lib.ldpc_toolbox_encoder_dtor.argtypes = [ctypes.c_void_p]
    lib.ldpc_toolbox_encoder_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t,
    ]
    return lib


@pytest.fixture(scope="module")
def code():
    h = parity_to_systematic(MNConfig(nrows=16, ncols=32, wr=6, wc=3).run(42))
    return h


def _c_decode(lib, handle, llrs, n, max_iter=50):
    out = (ctypes.c_uint8 * n)()
    llrs_c = (ctypes.c_double * len(llrs))(*llrs)
    rc = lib.ldpc_toolbox_decoder_decode_f64(
        handle, out, n, llrs_c, len(llrs), max_iter
    )
    return rc, np.frombuffer(bytes(out), np.uint8)


@pytest.mark.parametrize(
    "impl",
    [
        "Phif64",
        "Tanhf32",
        "Minstarapproxf64",
        "Aminstarf32",
        "Minstarapproxi8",
        "Minstarapproxi8JonesPartialHardLimitDeg1Clip",
        "Aminstari8",
        "HLPhif64",
        "HLMinstarapproxi8",
        "HLAminstari8PartialHardLimit",
    ],
)
def test_capi_decoder_matches_python(lib, code, impl):
    alist = code.alist().encode()
    handle = lib.ldpc_toolbox_decoder_ctor_alist_string(
        alist, impl.encode(), b""
    )
    assert handle
    try:
        pydec = Decoder(code, impl)
        enc = Encoder(code)
        rng = np.random.default_rng(5)
        n = code.num_cols
        for trial in range(6):
            msg = rng.integers(0, 2, enc.k)
            cw = enc.encode(msg)
            llr = np.where(cw == 0, 1.0, -1.0) * 2.0 + rng.normal(
                0, 0.8, n
            )
            rc, out = _c_decode(lib, handle, llr, n)
            py = pydec.decode(llr, 50)
            assert (rc >= 0) == py.success, (impl, trial)
            if impl.endswith("i8") or "i8" in impl:
                # integer rules are bit-exact between implementations
                np.testing.assert_array_equal(out, py.codeword)
                if py.success:
                    assert rc == py.iterations
            elif py.success:
                np.testing.assert_array_equal(out, py.codeword)
                assert rc == py.iterations
    finally:
        lib.ldpc_toolbox_decoder_dtor(handle)


def test_capi_decoder_zero_iterations(lib, code):
    handle = lib.ldpc_toolbox_decoder_ctor_alist_string(
        code.alist().encode(), b"Phif64", b""
    )
    enc = Encoder(code)
    cw = enc.encode(np.ones(enc.k, np.uint8))
    llr = np.where(cw == 0, 4.0, -4.0)
    rc, out = _c_decode(lib, handle, llr, code.num_cols)
    assert rc == 0
    np.testing.assert_array_equal(out, cw)
    lib.ldpc_toolbox_decoder_dtor(handle)


def test_capi_decoder_invalid_inputs(lib, code):
    assert not lib.ldpc_toolbox_decoder_ctor_alist_string(
        code.alist().encode(), b"NoSuchDecoder", b""
    )
    assert not lib.ldpc_toolbox_decoder_ctor_alist_string(
        b"not an alist", b"Phif64", b""
    )


def test_capi_decoder_with_puncturing(lib, code):
    handle = lib.ldpc_toolbox_decoder_ctor_alist_string(
        code.alist().encode(), b"Minstarapproxf64", b"1,1,1,0"
    )
    assert handle
    enc = Encoder(code)
    rng = np.random.default_rng(9)
    msg = rng.integers(0, 2, enc.k)
    cw = enc.encode(msg)
    llr_full = np.where(cw == 0, 3.0, -3.0) + rng.normal(0, 0.5, len(cw))
    keep = np.arange(24)  # first 3/4 of 32
    rc, out = _c_decode(lib, handle, llr_full[keep], code.num_cols)
    assert rc >= 0
    np.testing.assert_array_equal(out[: enc.k], msg)
    lib.ldpc_toolbox_decoder_dtor(handle)


def test_capi_encoder_matches_python(lib, code):
    handle = lib.ldpc_toolbox_encoder_ctor_alist_string(
        code.alist().encode(), b""
    )
    assert handle
    enc = Encoder(code)
    rng = np.random.default_rng(2)
    n = code.num_cols
    for _ in range(4):
        msg = rng.integers(0, 2, enc.k).astype(np.uint8)
        out = (ctypes.c_uint8 * n)()
        inp = (ctypes.c_uint8 * enc.k)(*msg)
        lib.ldpc_toolbox_encoder_encode(handle, out, n, inp, enc.k)
        np.testing.assert_array_equal(
            np.frombuffer(bytes(out), np.uint8), enc.encode(msg)
        )
    lib.ldpc_toolbox_encoder_dtor(handle)


def test_capi_encoder_staircase_and_puncturing(lib):
    from ldpc_toolbox_tpu.codes.dvbs2 import Code as DvbCode

    code = DvbCode.R8_9short
    h = code.h()
    alist = h.alist().encode()
    handle = lib.ldpc_toolbox_encoder_ctor_alist_string(alist, b"1,0")
    assert handle
    enc = Encoder(h)
    assert enc.staircase
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, enc.k).astype(np.uint8)
    full = enc.encode(msg)
    half = h.num_cols // 2
    out = (ctypes.c_uint8 * half)()
    inp = (ctypes.c_uint8 * enc.k)(*msg)
    lib.ldpc_toolbox_encoder_encode(handle, out, half, inp, enc.k)
    np.testing.assert_array_equal(
        np.frombuffer(bytes(out), np.uint8), full[:half]
    )
    lib.ldpc_toolbox_encoder_dtor(handle)

"""Block-circulant (lifted) decode path tests.

Validates structure detection on all four standards families, equivalence
of the lifted flooding decoder with the generic bucketed one, and correct
handling of incomplete circulants (the DVB-S2 staircase corner).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ldpc_toolbox_tpu.codes.ccsds import AR4JACode, AR4JAInfoSize, AR4JARate, C2Code
from ldpc_toolbox_tpu.codes.dvbs2 import Code as DvbCode
from ldpc_toolbox_tpu.codes.nr5g import BaseGraph
from ldpc_toolbox_tpu.decoder import DecodeGraph
from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
from ldpc_toolbox_tpu.decoder.flooding import flooding_decode
from ldpc_toolbox_tpu.decoder.lifted import (
    LiftedGraph,
    ar4ja_maps,
    c2_maps,
    dvbs2_maps,
    nr5g_maps,
)
from ldpc_toolbox_tpu.decoder.lifted_flooding import lifted_flooding_decode
from ldpc_toolbox_tpu.encoder import Encoder
from ldpc_toolbox_tpu.ops.plane_gather import plane_gather_reference


def test_plane_gather_reference_semantics():
    rng = np.random.default_rng(0)
    P, Z, B = 5, 12, 4
    src = jnp.asarray(rng.standard_normal((P, Z, B)), jnp.float32)
    planes = np.array([[0, 3], [4, 2]], np.int32)
    shifts = np.array([[0, 5], [11, 1]], np.int32)
    out = np.asarray(plane_gather_reference(src, planes, shifts))
    srcn = np.asarray(src)
    for g in range(2):
        for t in range(2):
            for l in range(Z):
                np.testing.assert_array_equal(
                    out[g, t, l], srcn[planes[g, t], (l - shifts[g, t]) % Z]
                )


def _lifted_for(code):
    if isinstance(code, DvbCode):
        vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    elif isinstance(code, AR4JACode):
        vm, cm, Z, nvg, ncg = ar4ja_maps(code)
    elif isinstance(code, C2Code):
        vm, cm, Z, nvg, ncg = c2_maps()
    else:
        bg, z = code
        vm, cm, Z, nvg, ncg = nr5g_maps(bg, z)
        return LiftedGraph.from_sparse(bg.h(z), vm, cm, Z, nvg, ncg), bg.h(z)
    h = code.h()
    return LiftedGraph.from_sparse(h, vm, cm, Z, nvg, ncg), h


def test_structure_detection_all_families():
    lg, _ = _lifted_for(DvbCode.R8_9short)
    assert lg.Z == 360
    assert len(lg.missing) == 1  # the staircase corner at row 0
    # every edge is accounted for: planes of all check buckets = BE
    assert sum(len(b.groups) * b.degree for b in lg.chk_buckets) == (
        lg.num_base_edges
    )

    lg, h = _lifted_for((BaseGraph.BG2, 16))
    assert lg.num_base_edges == 197 and not lg.missing

    lg, _ = _lifted_for(AR4JACode(AR4JARate.R1_2, AR4JAInfoSize.K1024))
    assert lg.Z == 128 and not lg.missing

    lg, _ = _lifted_for(C2Code())
    assert lg.Z == 511 and lg.num_base_edges == 64 and not lg.missing


def _noisy_codeword_llrs(h, batch, sigma, seed):
    enc = Encoder(h)
    rng = np.random.default_rng(seed)
    msgs = rng.integers(0, 2, size=(batch, enc.k))
    cw = np.asarray(enc.encode_batch(msgs))
    x = np.where(cw == 0, -1.0, 1.0) + sigma * rng.standard_normal(cw.shape)
    return msgs, jnp.asarray((-2.0 / sigma**2) * x, jnp.float32)


@pytest.mark.parametrize("impl", ["Minsumf32", "Phif32"])
def test_lifted_matches_generic_dvbs2(impl):
    code = DvbCode.R8_9short
    h = code.h()
    graph = DecodeGraph.from_sparse(h, build_layers=False)
    lg, _ = _lifted_for(code)
    # sigma chosen so most frames converge in a few iterations (r=8/9
    # needs ~4 dB); on non-converged frames min-sum magnitude *ties* are
    # broken by slot order, which legitimately differs between layouts
    msgs, llr = _noisy_codeword_llrs(h, 6, 0.47, seed=1)
    _, a1 = make_arithmetic(impl)
    _, a2 = make_arithmetic(impl)
    o1 = flooding_decode(graph, a1, llr, 30)
    o2 = lifted_flooding_decode(lg, a2, llr, 30)
    np.testing.assert_array_equal(
        np.asarray(o1["success"]), np.asarray(o2["success"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    ok = np.asarray(o1["success"])
    assert ok.sum() >= 4
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"])[ok], np.asarray(o2["codeword"])[ok]
    )


def test_lifted_corrects_errors_near_staircase_corner():
    """The incomplete circulant (row 0) must behave exactly like the true
    H: flip bits incident to check row 0 and decode."""
    code = DvbCode.R8_9short
    h = code.h()
    lg, _ = _lifted_for(code)
    enc = Encoder(h)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, size=(1, enc.k))
    cw = np.asarray(enc.encode_batch(msg))[0]
    llr0 = np.where(cw == 0, 4.0, -4.0)
    row0 = list(h.iter_row(0))
    for flip in row0[:3] + [enc.k, h.num_cols - 1]:
        llr = llr0.copy()
        llr[flip] = -llr[flip] * 0.5
        _, a = make_arithmetic("Minstarapproxf32")
        out = lifted_flooding_decode(
            lg, a, jnp.asarray(llr[None, :], jnp.float32), 30,
            
        )
        assert bool(out["success"][0]), flip
        np.testing.assert_array_equal(np.asarray(out["codeword"][0]), cw)


@pytest.mark.parametrize(
    "family",
    ["nr5g", "ar4ja", "c2"],
)
def test_lifted_decodes_other_families(family):
    if family == "nr5g":
        lg, h = _lifted_for((BaseGraph.BG2, 16))
        # 5G NR H is not systematic-encodable as-is (first 2Z columns are
        # punctured high-degree); just check zero codeword + noise decode
        rng = np.random.default_rng(0)
        sigma = 0.5
        x = -1.0 + sigma * rng.standard_normal((4, h.num_cols))
        llr = jnp.asarray((-2.0 / sigma**2) * x, jnp.float32)
        _, a = make_arithmetic("Minsumf32")
        out = lifted_flooding_decode(lg, a, llr, 30)
        assert np.asarray(out["success"]).sum() >= 3
        assert not np.asarray(out["codeword"])[
            np.asarray(out["success"])
        ].any()
        return
    if family == "ar4ja":
        code = AR4JACode(AR4JARate.R4_5, AR4JAInfoSize.K1024)
    else:
        code = C2Code()
    lg, h = _lifted_for(code)
    rng = np.random.default_rng(0)
    # C2 is rate 7/8: needs low noise to converge reliably
    sigma = 0.42 if family == "ar4ja" else 0.45
    x = -1.0 + sigma * rng.standard_normal((4, h.num_cols))
    llr = jnp.asarray((-2.0 / sigma**2) * x, jnp.float32)
    _, a = make_arithmetic("Minsumf32")
    out = lifted_flooding_decode(lg, a, llr, 40)
    assert np.asarray(out["success"]).sum() >= 3
    decoded = np.asarray(out["codeword"])[np.asarray(out["success"])]
    assert not decoded.any()  # all-zero codeword recovered


@pytest.mark.parametrize(
    "batch",
    [
        128,
        pytest.param(200, marks=pytest.mark.slow),
        pytest.param(256, marks=pytest.mark.slow),
    ],
)
def test_fused_matches_plane_gather_path(batch):
    """The fused Pallas kernels (interpret mode on CPU) must agree with
    the plane-gather path on success/iterations/codewords. Covers one
    batch tile (128), multi-tile (256, nbt=2), and a non-multiple batch
    (200, exercises the pad-and-slice path)."""
    code = DvbCode.R8_9short
    h = code.h()
    lg, _ = _lifted_for(code)
    msgs, llr = _noisy_codeword_llrs(h, batch, 0.47, seed=1)
    _, a = make_arithmetic("Minsumf32")
    o1 = lifted_flooding_decode(lg, a, llr, 20)
    o2 = lifted_flooding_decode(lg, a, llr, 20, fused=True)
    s1 = np.asarray(o1["success"])
    np.testing.assert_array_equal(s1, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"])[s1], np.asarray(o2["codeword"])[s1]
    )
    assert s1.sum() >= int(0.78 * batch)


@pytest.mark.parametrize(
    "decoder",
    [
        "Phif32",
        pytest.param("Tanhf32", marks=pytest.mark.slow),
        pytest.param("Minstarapproxf32", marks=pytest.mark.slow),
        pytest.param("Aminstarf32", marks=pytest.mark.slow),
    ],
)
def test_fused_float_matches_plane_gather_path(decoder):
    """The fused Pallas rules of the reference's float families
    (arithmetic.rs:158-580, 899-1072) must reproduce the plane-gather
    path: same success masks, iteration counts and codewords (the folds
    replicate the plane path's op sequence; the phi/tanh transcendental
    rewrites for Pallas agree in every case this workload reaches)."""
    code = DvbCode.R1_4short
    h = code.h()
    lg, _ = _lifted_for(code)
    msgs, llr = _noisy_codeword_llrs(h, 128, 0.85, seed=2)
    _, a = make_arithmetic(decoder)
    o1 = lifted_flooding_decode(lg, a, llr, 12)
    o2 = lifted_flooding_decode(lg, a, llr, 12, fused=True)
    s1 = np.asarray(o1["success"])
    np.testing.assert_array_equal(s1, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )
    assert s1.sum() >= 100


@pytest.mark.parametrize(
    "decoder",
    [
        "Minstarapproxi8",
        pytest.param(
            "Minstarapproxi8PartialHardLimit", marks=pytest.mark.slow
        ),
        pytest.param("Aminstari8", marks=pytest.mark.slow),
        pytest.param(
            "Aminstari8JonesPartialHardLimitDeg1Clip", marks=pytest.mark.slow
        ),
    ],
)
def test_fused_i8_matches_plane_gather_path(decoder):
    """The fused int8 kernels must reproduce the unfused i8 decode
    bit-exactly: identical success masks, iteration counts, and
    codewords for ALL frames (the i8 fold order is replicated exactly,
    so even unconverged posteriors agree)."""
    code = DvbCode.R1_4short  # two check buckets, three var buckets
    h = code.h()
    lg, _ = _lifted_for(code)
    msgs, llr = _noisy_codeword_llrs(h, 128, 0.85, seed=2)
    _, a = make_arithmetic(decoder)
    o1 = lifted_flooding_decode(lg, a, llr, 12)
    o2 = lifted_flooding_decode(lg, a, llr, 12, fused=True)
    s1 = np.asarray(o1["success"])
    np.testing.assert_array_equal(s1, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )
    assert 5 <= s1.sum()


@pytest.mark.slow
def test_fused_wide_check_degree_matches_plane_gather_path():
    """5G-NR BG1 has check rows of degree 19 — the widest of any
    standards family and above the Minstar rules' former unroll cap of
    16.  The O(d^2) exact-order leave-one-out fold must stay
    bit-identical to the unfused path at that width (fused_bp2
    MinstarApproxI8Rule.max_check_degree)."""
    from ldpc_toolbox_tpu.decoder.lifted import nr5g_maps

    bg, z = BaseGraph.BG1, 16
    h = bg.h(z)
    lg = LiftedGraph.from_sparse(h, *nr5g_maps(bg, z))
    assert max(b.degree for b in lg.chk_buckets) == 19
    rng = np.random.default_rng(3)
    sigma = 0.8
    x = -1.0 + sigma * rng.standard_normal((128, h.num_cols)).astype(
        np.float32
    )
    llr = (-2.0 / sigma**2) * x
    _, a = make_arithmetic("Minstarapproxi8")
    o1 = lifted_flooding_decode(lg, a, llr, 5)
    o2 = lifted_flooding_decode(lg, a, llr, 5, fused=True)
    np.testing.assert_array_equal(
        np.asarray(o1["success"]), np.asarray(o2["success"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )


def test_fused_unaligned_z_matches_plane_gather_path():
    """CCSDS C2's Z=511 lift is the only standards family whose lift
    violates Mosaic's 8-sublane alignment: the fused kernels store its
    planes padded to Zp=512 and rotate with the two-roll mod-Z
    decomposition (ops/fused_bp2.py `_roll`). Must agree with the
    unpadded plane-gather path on success/iterations/codewords."""
    lg, h = _lifted_for(C2Code())
    assert lg.Z % 8 != 0  # the property under test
    rng = np.random.default_rng(4)
    sigma = 0.45
    x = -1.0 + sigma * rng.standard_normal((128, h.num_cols)).astype(
        np.float32
    )
    llr = jnp.asarray((-2.0 / sigma**2) * x)
    _, a = make_arithmetic("Minsumf32")
    o1 = lifted_flooding_decode(lg, a, llr, 5)
    o2 = lifted_flooding_decode(lg, a, llr, 5, fused=True)
    s1 = np.asarray(o1["success"])
    np.testing.assert_array_equal(s1, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"])[s1], np.asarray(o2["codeword"])[s1]
    )
    # a meaningful share converges within the 5-iteration budget, so the
    # equality assertions above compare real decodes, not all-failures
    assert s1.sum() >= 30


def test_i8_tab_tree_equals_sum():
    """The select-tree correction-table evaluation (round-5 default)
    must be value-identical to the round-4 indicator-sum form over the
    full input range (arithmetic.rs:589-602 table semantics)."""
    import numpy as np

    from ldpc_toolbox_tpu.decoder.arithmetic import i8_correction_table
    from ldpc_toolbox_tpu.ops.fused_bp2 import MinstarApproxI8Rule

    r = MinstarApproxI8Rule()
    t = jnp.arange(256, dtype=jnp.int32)
    tree = np.asarray(r._tab_tree(t))
    c = None
    for T in r.thr:
        term = np.asarray(t <= T, np.int32)
        c = term if c is None else c + term
    np.testing.assert_array_equal(tree, c)
    np.testing.assert_array_equal(
        tree[:128], np.asarray(i8_correction_table())
    )

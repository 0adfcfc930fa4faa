"""Lifted horizontal-layered schedule: fused-vs-jnp equivalence, scalar
serial oracle in layer order, and the convergence-speed property."""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

from ldpc_toolbox_tpu.codes.dvbs2 import Code as DvbCode
from ldpc_toolbox_tpu.codes.nr5g import BaseGraph
from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
from ldpc_toolbox_tpu.decoder.lifted import (
    LiftedGraph,
    lifted_graph_for,
    nr5g_maps,
)
from ldpc_toolbox_tpu.decoder.lifted_flooding import lifted_flooding_decode
from ldpc_toolbox_tpu.decoder.lifted_layered import lifted_layered_decode
from ldpc_toolbox_tpu.ops.fused_bp2 import build_fused_layout


def _llrs(n, batch, sigma, seed):
    rng = np.random.default_rng(seed)
    x = -1.0 + sigma * rng.standard_normal((batch, n))
    return jnp.asarray((-2.0 / sigma**2) * x, jnp.float32)


@pytest.mark.parametrize(
    "decoder",
    [
        "Minsumf32",
        pytest.param("Minstarapproxi8", marks=pytest.mark.slow),
        pytest.param("Phif32", marks=pytest.mark.slow),
        pytest.param("Tanhf32", marks=pytest.mark.slow),
        pytest.param("Aminstarf32", marks=pytest.mark.slow),
    ],
)
def test_fused_layered_matches_jnp(decoder):
    """The fused layered kernel must reproduce the jnp lifted-layered
    reference bit-exactly (same layer order, fold order, wrap/clip
    semantics) — including frames that do not converge."""
    code = DvbCode.R1_4short  # has duplicate (vg,cg) pairs in a layer
    lg = lifted_graph_for(code)
    llr = _llrs(code.n, 128, 0.9, seed=5)
    _, a = make_arithmetic(decoder)
    o1 = lifted_layered_decode(lg, a, llr, 8)
    o2 = lifted_layered_decode(lg, a, llr, 8, fused=True)
    np.testing.assert_array_equal(
        np.asarray(o1["success"]), np.asarray(o2["success"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )
    assert np.asarray(o1["success"]).sum() >= 100


def _scalar_layered_minsum(h_dense, llr, layer_rows, max_iter):
    """Serial per-check horizontal-layered min-sum oracle
    (horizontal_layered.rs:49-110) processing checks in the given row
    order; float32 scalar arithmetic (matches the jnp path bitwise on a
    duplicate-free code), min-sum check rule."""
    m, n = h_dense.shape
    qv = llr.astype(np.float32).copy()
    rcv = {}
    rows_vars = [np.nonzero(h_dense[r])[0] for r in range(m)]

    def check_ok(hard):
        return not ((h_dense @ hard) % 2).any()

    hard = (qv <= 0).astype(np.uint8)
    if check_ok(hard):
        return hard, 0, True
    for it in range(1, max_iter + 1):
        for r in layer_rows:
            vs = rows_vars[r]
            x = np.array(
                [qv[v] - rcv.get((r, v), np.float32(0)) for v in vs],
                np.float32,
            )
            mags = np.abs(x)
            signs = np.sign(x) + (x == 0)  # zero counts as +
            par = np.prod(signs)
            order = np.argsort(mags, kind="stable")
            m1, m2 = mags[order[0]], mags[order[1]]
            for i, v in enumerate(vs):
                loo = m2 if i == order[0] else m1
                rnew = (par * signs[i]) * loo
                qv[v] += rnew - rcv.get((r, v), np.float32(0))
                rcv[(r, v)] = rnew
        hard = (qv <= 0).astype(np.uint8)
        if check_ok(hard):
            return hard, it, True
    return hard, max_iter, False


def test_jnp_layered_matches_scalar_oracle():
    """On a code with complete circulants and no duplicate (vg, cg)
    pairs, the lifted layer-parallel sweep equals the serial per-check
    sweep in layer order: validate against a scalar min-sum oracle."""
    bg = BaseGraph.BG2
    z = 16
    vm, cm, Z, nvg, ncg = nr5g_maps(bg, z)
    h = bg.h(z)
    lg = LiftedGraph.from_sparse(h, vm, cm, Z, nvg, ncg)
    pairs = list(zip(lg.edge_vg.tolist(), lg.edge_cg.tolist()))
    assert len(pairs) == len(set(pairs)), "oracle needs no duplicates"
    assert not lg.missing

    # map flat group index -> original check group id (bucket order)
    group_ids = np.concatenate(
        [b.groups for b in lg.chk_buckets if len(b.groups)]
    )
    layer_rows = [
        cg * Z + lane for cg in group_ids for lane in range(Z)
    ]

    dense = np.zeros((h.num_rows, h.num_cols), np.int64)
    for r, c in h.iter_all():
        dense[r, c] = 1

    batch = 6
    llr = _llrs(h.num_cols, batch, 0.62, seed=9)
    _, a = make_arithmetic("Minsumf32")
    out = lifted_layered_decode(lg, a, llr, 8)

    llr_np = np.asarray(llr, np.float32)
    for b in range(batch):
        hard, iters, ok = _scalar_layered_minsum(
            dense, llr_np[b], layer_rows, 8
        )
        assert ok == bool(np.asarray(out["success"])[b])
        assert iters == int(np.asarray(out["iterations"])[b])
        np.testing.assert_array_equal(
            hard, np.asarray(out["codeword"])[b]
        )


def test_layered_converges_faster_than_flooding():
    """The reference's motivation for the layered schedule: ~2x fewer
    iterations at the same quality (horizontal_layered.rs docs)."""
    code = DvbCode.R1_4short
    lg = lifted_graph_for(code)
    llr = _llrs(code.n, 64, 0.9, seed=7)
    _, a = make_arithmetic("Minsumf32")
    ol = lifted_layered_decode(lg, a, llr, 20)
    of = lifted_flooding_decode(lg, a, llr, 20)
    sl = np.asarray(ol["success"])
    sf = np.asarray(of["success"])
    assert sl.sum() >= sf.sum()
    both = sl & sf
    il = np.asarray(ol["iterations"])[both].mean()
    if_ = np.asarray(of["iterations"])[both].mean()
    assert il <= 0.65 * if_, (il, if_)


@pytest.mark.slow  # staged-program tracing dominates (~50 s interpreted)
@pytest.mark.parametrize(
    "decode",
    [
        # pin resident=False: compaction applies to the streaming kernels
        # (the resident kernels have per-tile early exit instead)
        functools.partial(lifted_layered_decode, resident=False),
        functools.partial(lifted_flooding_decode, resident=False),
    ],
)
def test_compaction_bit_exact_multi_tile(decode):
    """Staged converged-frame compaction (decoder/compaction.py) must be
    bit-identical to the unstaged fused loop: same success, iterations,
    and codewords for every frame — on a multi-tile batch (nbt=2) where
    frames converge at different iterations, so both compaction stages
    actually execute."""
    bg = BaseGraph.BG2
    z = 16
    lg = LiftedGraph.from_sparse(bg.h(z), *nr5g_maps(bg, z))
    n = bg.num_cols * z
    llr = _llrs(n, 256, 1.3, seed=11)
    _, a = make_arithmetic("Minsumf32")

    # 6 iterations: still a convergence mix (iters 2..6 + stragglers)
    # at half the interpret-mode cost of 10
    o1 = decode(lg, a, llr, 6, fused=True, compact=False)
    o2 = decode(lg, a, llr, 6, fused=True, compact=True)
    s = np.asarray(o1["success"])
    it = np.asarray(o1["iterations"])
    # the schedule must hit a mix of early and late convergence for
    # the compaction path to be meaningfully exercised
    assert 0 < s.sum() < 256
    assert len(np.unique(it[s])) >= 3
    np.testing.assert_array_equal(s, np.asarray(o2["success"]))
    np.testing.assert_array_equal(it, np.asarray(o2["iterations"]))
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )


@pytest.mark.parametrize(
    "unroll,bt,decoder",
    [
        # static-unrolled sweep+syndrome, multi-tile
        ("1", "128", "Minsumf32"),
        # group-looped dynamic path (float: syndrome from Qv signs)
        pytest.param("0", "128", "Minsumf32", marks=pytest.mark.slow),
        # dynamic path with the i8 hard-decision buffer (the BG1-i8 shape)
        pytest.param(
            "0", "128", "Minstarapproxi8", marks=pytest.mark.slow
        ),
        # static-unrolled quadratic i8 fold (the r5 default for the
        # DVB-S2-normal i8 shapes once the budget admits ~87k-op sweeps)
        pytest.param(
            "1", "128", "Minstarapproxi8", marks=pytest.mark.slow
        ),
        # auto-picked wide batch tile
        pytest.param("1", "", "Minsumf32", marks=pytest.mark.slow),
    ],
)
def test_resident_bit_exact_multi_tile(monkeypatch, unroll, bt, decoder):
    """The VMEM-resident decode (ops/resident_layered.py) must equal the
    streaming fused kernel and the jnp reference bit-for-bit on a
    multi-tile batch with mixed convergence — including its in-kernel
    0-iteration exit, per-frame freeze, and per-tile early exit — in
    both code-generation modes (static-unrolled and group-looped
    dynamic) and at the auto-picked wide batch tile."""
    monkeypatch.setenv("LDPC_RESIDENT_UNROLL", unroll)
    if bt:
        monkeypatch.setenv("LDPC_RESIDENT_BT", bt)
    bg = BaseGraph.BG2
    z = 16
    lg = LiftedGraph.from_sparse(bg.h(z), *nr5g_maps(bg, z))
    n = bg.num_cols * z
    llr = _llrs(n, 256, 1.3, seed=11)
    _, a = make_arithmetic(decoder)

    o1 = lifted_layered_decode(lg, a, llr, 10)  # jnp reference
    o2 = lifted_layered_decode(lg, a, llr, 10, fused=True, resident=True)
    s = np.asarray(o1["success"])
    assert 0 < s.sum() < 256
    np.testing.assert_array_equal(s, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )


@pytest.mark.slow
def test_flooding_unaligned_z_resident_matches_streaming():
    """C2's Z=511 lift through the resident flooding kernel (padded
    planes + two-roll mod-Z rotation) must match the streaming fused
    flooding kernels bit-exactly."""
    from ldpc_toolbox_tpu.codes.ccsds import C2Code

    lg = lifted_graph_for(C2Code())
    llr = _llrs(8176, 128, 0.45, seed=5)
    _, a = make_arithmetic("Minsumf32")
    o1 = lifted_flooding_decode(lg, a, llr, 6, fused=True, resident=False)
    o2 = lifted_flooding_decode(lg, a, llr, 6, fused=True, resident=True)
    s1 = np.asarray(o1["success"])
    np.testing.assert_array_equal(s1, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )
    assert s1.sum() >= 100


@pytest.mark.slow
@pytest.mark.parametrize("resident", [True, False])
def test_layered_unaligned_z_matches_jnp(resident):
    """C2's Z=511 lift through the layered kernels (padded planes +
    two-roll mod-Z rotation): resident and streaming variants must both
    reproduce the jnp layered reference bit-exactly."""
    from ldpc_toolbox_tpu.codes.ccsds import C2Code

    lg = lifted_graph_for(C2Code())
    assert lg.Z % 8 != 0
    llr = _llrs(8176, 128, 0.45, seed=5)
    _, a = make_arithmetic("HLMinsumf32")
    o1 = lifted_layered_decode(lg, a, llr, 8)
    o2 = lifted_layered_decode(
        lg, a, llr, 8, fused=True, resident=resident, compact=False
    )
    s1 = np.asarray(o1["success"])
    np.testing.assert_array_equal(s1, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"])[s1], np.asarray(o2["codeword"])[s1]
    )
    assert s1.sum() >= 120


@pytest.mark.parametrize(
    "decoder",
    [
        "Minsumf32",
        pytest.param("Minsumbf16", marks=pytest.mark.slow),
        pytest.param("Normminsumbf16", marks=pytest.mark.slow),
    ],
)
def test_compressed_flooding_bit_exact(monkeypatch, decoder):
    """The compressed-check-state resident flooding kernel
    (ops/resident_compressed.py) must equal the streaming fused flooding
    kernels bit-for-bit — success masks, iteration counts, codewords —
    on a multi-tile batch with mixed convergence (min-sum c2v state is
    losslessly (signs, min1, min2, argmin))."""
    from ldpc_toolbox_tpu.ops.resident_compressed import (
        compressed_flooding_pick_bt,
        compressed_flooding_supported,
    )

    bg = BaseGraph.BG2
    z = 16
    lg = LiftedGraph.from_sparse(bg.h(z), *nr5g_maps(bg, z))
    n = bg.num_cols * z
    llr = _llrs(n, 256, 1.3, seed=11)
    _, a = make_arithmetic(decoder)

    o1 = lifted_flooding_decode(
        lg, a, llr, 10, fused=True, resident=False, compact=False
    )
    monkeypatch.setenv("LDPC_FORCE_COMPRESSED", "1")
    o2 = lifted_flooding_decode(lg, a, llr, 10, fused=True, resident=True)
    s = np.asarray(o1["success"])
    assert 0 < s.sum() < 256
    np.testing.assert_array_equal(s, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )


def test_flagship_flooding_shape_is_resident():
    """DVB-S2 r=1/2 n=64800 Minsumbf16 flooding — the one family x
    schedule cell that streamed through round 4 (2E bf16 = 116 MB) —
    must be claimed at Bt=128 by BOTH resident forms: the single-array
    aliased message kernel (E bf16 = 58 MB) and the compressed
    check-state kernel."""
    import jax.numpy as jnp

    from ldpc_toolbox_tpu.codes.dvbs2 import Code as DvbCode
    from ldpc_toolbox_tpu.decoder.lifted import lifted_graph_for
    from ldpc_toolbox_tpu.ops.fused_bp2 import build_fused_layout, rule_for
    from ldpc_toolbox_tpu.ops.resident_compressed import (
        compressed_flooding_pick_bt,
        compressed_layered_pick_bt,
    )
    from ldpc_toolbox_tpu.ops.resident_flooding import (
        resident_flooding_pick_bt,
    )

    lg = lifted_graph_for(DvbCode.R1_2)
    layout = build_fused_layout(lg)
    _, a = make_arithmetic("Minsumbf16")
    rule = rule_for(a)
    assert resident_flooding_pick_bt(layout, rule, jnp.bfloat16, 512) == 128
    assert compressed_flooding_pick_bt(layout, rule, jnp.bfloat16, 512) == 128
    # and the f32 layered family (Rcv f32 = 111 MB, streaming through
    # round 4) is claimed by the compressed layered kernel
    _, a32 = make_arithmetic("HLMinsumf32")
    rule32 = rule_for(a32)
    assert compressed_layered_pick_bt(layout, rule32, jnp.float32, 512) == 128


@pytest.mark.parametrize(
    "decoder",
    [
        "Minsumf32",
        pytest.param("Minstarapproxi8", marks=pytest.mark.slow),
    ],
)
def test_aliased_flooding_bit_exact(monkeypatch, decoder):
    """The single-array aliased resident flooding kernel must equal the
    streaming fused kernels bit-for-bit (small codes route to the dual
    two-array kernel by default, so force the aliased form here)."""
    bg = BaseGraph.BG2
    z = 16
    lg = LiftedGraph.from_sparse(bg.h(z), *nr5g_maps(bg, z))
    n = bg.num_cols * z
    llr = _llrs(n, 256, 1.3, seed=11)
    _, a = make_arithmetic(decoder)

    o1 = lifted_flooding_decode(
        lg, a, llr, 10, fused=True, resident=False, compact=False
    )
    monkeypatch.setenv("LDPC_FORCE_ALIASED", "1")
    o2 = lifted_flooding_decode(lg, a, llr, 10, fused=True, resident=True)
    s = np.asarray(o1["success"])
    assert 0 < s.sum() < 256
    np.testing.assert_array_equal(s, np.asarray(o2["success"]))
    np.testing.assert_array_equal(
        np.asarray(o1["iterations"]), np.asarray(o2["iterations"])
    )
    np.testing.assert_array_equal(
        np.asarray(o1["codeword"]), np.asarray(o2["codeword"])
    )

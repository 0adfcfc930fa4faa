"""Standards code family tests (CCSDS AR4JA/C2, DVB-S2, 5G NR).

Structural invariants mirror the reference's own tests (dvbs2.rs:2176-2202
shape/regularity, ccsds.rs:418-440 pi model cross-check) plus documented
facts (girth 6 for AR4JA r=1/2 k=1024 per cli/ccsds.rs:16-18 and DVB-S2
r=1/2 per cli/dvbs2.rs:16-18).
"""

import pytest

from ldpc_toolbox_tpu.codes.ccsds import AR4JACode, AR4JAInfoSize, AR4JARate, C2Code
from ldpc_toolbox_tpu.codes.dvbs2 import Code as DvbCode
from ldpc_toolbox_tpu.codes.nr5g import LIFTING_SIZES, BaseGraph, set_index


def test_ar4ja_pi_model():
    # pi must match the naive spec formula for all rates/sizes (spot-check a
    # subset of i for speed; the reference checks all)
    for rate in AR4JARate:
        for info_k in AR4JAInfoSize:
            code = AR4JACode(rate, info_k)
            m = code.m_size
            for k in range(1, 27):
                for i in list(range(0, m, max(1, m // 64))) + [m - 1]:
                    j = 4 * i // m
                    expected = (m // 4) * ((code.theta(k) + j) % 4) + (
                        code.phi(k, j) + i
                    ) % (m // 4)
                    assert code.pi(k, i) == expected


@pytest.mark.parametrize(
    "rate,k,rows,cols",
    [
        (AR4JARate.R1_2, AR4JAInfoSize.K1024, 3 * 512, 5 * 512),
        (AR4JARate.R2_3, AR4JAInfoSize.K1024, 3 * 256, 7 * 256),
        (AR4JARate.R4_5, AR4JAInfoSize.K1024, 3 * 128, 11 * 128),
        (AR4JARate.R1_2, AR4JAInfoSize.K4096, 3 * 2048, 5 * 2048),
    ],
)
def test_ar4ja_shapes(rate, k, rows, cols):
    h = AR4JACode(rate, k).h()
    assert h.num_rows == rows
    assert h.num_cols == cols


def test_ar4ja_girth():
    h = AR4JACode(AR4JARate.R1_2, AR4JAInfoSize.K1024).h()
    assert h.girth_with_max(8) == 6


def test_c2_shape_and_weights():
    h = C2Code().h()
    assert h.num_rows == 2 * 511
    assert h.num_cols == 16 * 511
    for r in range(0, h.num_rows, 97):
        assert h.row_weight(r) == 32
    for c in range(0, h.num_cols, 511):
        assert h.col_weight(c) == 4


@pytest.mark.parametrize("code", list(DvbCode))
def test_dvbs2_shapes(code):
    h = code.h()
    assert h.num_rows == code.m
    assert h.num_cols == code.n
    assert code.k == code.n - code.m
    # address table covers all 360-column groups of the systematic part
    assert len(code.addresses) == code.k // 360
    # per the standard, q = (n - k) / 360 for every code
    assert code.q == code.m // 360


def test_dvbs2_row_regularity():
    # Mirrors dvbs2.rs:2176-2202: all rows except the first have equal
    # weight classes; first parity row has the q-column weight + 1 pattern.
    h = DvbCode.R1_2.h()
    m, k, q = DvbCode.R1_2.m, DvbCode.R1_2.k, DvbCode.R1_2.q
    # staircase: row 0 has one parity bit, others have two
    assert h.contains(0, k)
    for j in range(1, m):
        assert h.contains(j, j + k) and h.contains(j, j + k - 1)
    # systematic columns have the weight of their address-table row
    for t, addr in enumerate(DvbCode.R1_2.addresses[:4]):
        for w in range(0, 360, 113):
            assert h.col_weight(t * 360 + w) == len(addr)


@pytest.mark.slow
def test_dvbs2_girth():
    assert DvbCode.R1_2.h().girth_with_max(6) == 6


def test_nr5g_lifting_sizes():
    assert len(LIFTING_SIZES) == 51
    assert set_index(384) == 1
    assert set_index(208) == 6
    with pytest.raises(ValueError):
        set_index(17)


@pytest.mark.parametrize("z", [2, 3, 13, 52])
def test_nr5g_bg_shapes(z):
    for bg in BaseGraph:
        h = bg.h(z)
        assert h.num_rows == bg.num_rows * z
        assert h.num_cols == bg.num_cols * z
        # every base edge expands to exactly z entries
        base_edges = sum(len(r) for r in bg.graph)
        assert h.num_entries() == base_edges * z


def test_nr5g_bg1_base_edges():
    assert sum(len(r) for r in BaseGraph.BG1.graph) == 316
    assert sum(len(r) for r in BaseGraph.BG2.graph) == 197

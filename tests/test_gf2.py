"""GF(2) dense linear algebra tests (fixtures from linalg.rs:119-153)."""

import numpy as np
import pytest

from ldpc_toolbox_tpu.gf2 import (
    NotInvertibleError,
    gauss_reduction,
    gf2_matmul,
    row_echelon_form,
)


def test_gauss():
    a = np.array(
        [
            [1, 0, 1, 1, 1, 0, 1, 0, 1],
            [1, 1, 0, 0, 1, 1, 0, 1, 0],
            [1, 1, 1, 0, 0, 1, 1, 0, 1],
        ],
        dtype=np.uint8,
    )
    expected = np.array(
        [
            [1, 0, 0, 1, 0, 0, 0, 1, 0],
            [0, 1, 0, 1, 1, 1, 0, 0, 0],
            [0, 0, 1, 0, 1, 0, 1, 1, 1],
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(gauss_reduction(a), expected)


def test_gauss_not_invertible():
    a = np.array([[1, 1, 0], [1, 1, 1]], dtype=np.uint8)
    with pytest.raises(NotInvertibleError):
        gauss_reduction(a)


def test_row_echelon():
    a = np.array(
        [
            [1, 1, 0, 0, 1, 0, 1, 0, 1],
            [1, 0, 0, 1, 1, 1, 0, 1, 0],
            [1, 1, 0, 0, 0, 1, 1, 0, 1],
        ],
        dtype=np.uint8,
    )
    expected = np.array(
        [
            [1, 1, 0, 0, 1, 0, 1, 0, 1],
            [0, 1, 0, 1, 0, 1, 1, 1, 1],
            [0, 0, 0, 0, 1, 1, 0, 0, 0],
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(row_echelon_form(a), expected)


def test_gauss_inverse_property():
    # [A | I] -> [I | A^-1]; check A @ A^-1 = I over GF(2)
    rng = np.random.default_rng(42)
    n = 32
    while True:
        a = (rng.random((n, n)) < 0.5).astype(np.uint8)
        aug = np.concatenate([a, np.eye(n, dtype=np.uint8)], axis=1)
        try:
            gauss_reduction(aug)
            break
        except NotInvertibleError:
            continue
    inv = aug[:, n:]
    np.testing.assert_array_equal(gf2_matmul(a, inv), np.eye(n, dtype=np.uint8))

"""SparseMatrix, alist I/O, BFS and girth tests.

Golden alist strings are behavioral fixtures from the reference test suite
(sparse.rs:549-646, bfs.rs:116-165, girth.rs:7-85) — byte-for-byte format
compatibility is a requirement for interop.
"""

import numpy as np
import pytest

from ldpc_toolbox_tpu.sparse import Node, SparseMatrix


def test_insert_contains():
    h = SparseMatrix(100, 300)
    assert not h.contains(27, 154)
    h.insert(27, 154)
    assert h.contains(27, 154)
    assert not h.contains(28, 154)


def test_insert_twice():
    h = SparseMatrix(100, 300)
    h.insert(27, 154)
    h.insert(43, 28)
    h.insert(53, 135)
    before = set(h.iter_all())
    h.insert(43, 28)
    assert set(h.iter_all()) == before
    assert h.row_weight(43) == 1


def test_remove_toggle():
    h = SparseMatrix(10, 10)
    h.insert(3, 7)
    h.remove(3, 7)
    assert not h.contains(3, 7)
    h.toggle(3, 7)
    assert h.contains(3, 7)
    h.toggle(3, 7)
    assert not h.contains(3, 7)


def test_iter_all():
    h = SparseMatrix(10, 20)
    entries = {(7, 8), (5, 14), (6, 6), (6, 7), (8, 10), (0, 4), (0, 0), (0, 15)}
    for r, c in entries:
        h.insert(r, c)
    assert set(h.iter_all()) == entries


def test_alist_regular():
    h = SparseMatrix(4, 12)
    for j in range(4):
        h.insert(j, j)
        h.insert(j, j + 4)
        h.insert(j, j + 8)
    expected = (
        "12 4\n1 3\n1 1 1 1 1 1 1 1 1 1 1 1\n3 3 3 3\n"
        "1\n2\n3\n4\n1\n2\n3\n4\n1\n2\n3\n4\n"
        "1 5 9\n2 6 10\n3 7 11\n4 8 12\n"
    )
    assert h.alist() == expected
    h2 = SparseMatrix.from_alist(expected)
    assert h2.alist() == expected


def test_alist_irregular_padding():
    h = SparseMatrix(4, 12)
    for j in range(4):
        h.insert(j, j)
        h.insert(j, j + 4)
        if j < 2:
            h.insert(j, j + 8)
    expected = (
        "12 4\n1 3\n1 1 1 1 1 1 1 1 1 1 0 0\n3 3 2 2\n"
        "1\n2\n3\n4\n1\n2\n3\n4\n1\n2\n0\n0\n"
        "1 5 9\n2 6 10\n3 7 0\n4 8 0\n"
    )
    expected_no_padding = (
        "12 4\n1 3\n1 1 1 1 1 1 1 1 1 1 0 0\n3 3 2 2\n"
        "1\n2\n3\n4\n1\n2\n3\n4\n1\n2\n\n\n"
        "1 5 9\n2 6 10\n3 7\n4 8\n"
    )
    assert h.alist() == expected
    assert h.alist_no_padding() == expected_no_padding
    h2 = SparseMatrix.from_alist(expected)
    assert h2.alist() == expected
    assert h2.alist_no_padding() == expected_no_padding
    h3 = SparseMatrix.from_alist(expected_no_padding)
    assert h3.alist() == expected
    assert h3.alist_no_padding() == expected_no_padding


def test_eq_order_insensitive():
    h1 = SparseMatrix(10, 30)
    h2 = SparseMatrix(10, 30)
    c = [3, 7, 9]
    h1.insert_row(0, c)
    for a in reversed(c):
        h2.insert(0, a)
    assert h1 == h2


def test_bfs_disconnected():
    h = SparseMatrix(2, 2)
    h.insert(0, 0)
    h.insert(1, 1)
    r = h.bfs(Node.col(0))
    assert r.row_nodes_distance == [1, None]
    assert r.col_nodes_distance == [0, None]


def test_bfs_complete():
    n, m = 20, 10
    h = SparseMatrix(n, m)
    for i in range(n):
        for j in range(m):
            h.insert(i, j)
    r = h.bfs(Node.row(0))
    assert r.row_nodes_distance[0] == 0
    assert all(d == 2 for d in r.row_nodes_distance[1:])
    assert all(d == 1 for d in r.col_nodes_distance)


def test_bfs_circulant():
    n = 20
    h = SparseMatrix(n, n)
    for j in range(n):
        h.insert(j, j)
        h.insert(j, (j + 1) % n)
    r = h.bfs(Node.row(0))
    assert r.row_nodes_distance[0] == 0
    for j in range(1, n):
        assert r.row_nodes_distance[j] == min(2 * j, 2 * (n - j))
    for j in range(1, n + 1):
        assert r.col_nodes_distance[j % n] == min(2 * j - 1, 2 * (n - j) + 1)


def test_girth_all_ones_2x2():
    h = SparseMatrix(2, 2)
    for j in range(2):
        for k in range(2):
            h.insert(j, k)
    assert h.girth() == 4


def test_girth_circulant():
    # single circulant with two diagonals: girth = 2n
    n = 7
    h = SparseMatrix(n, n)
    for j in range(n):
        h.insert(j, j)
        h.insert(j, (j + 2) % n)
    assert h.girth() == 2 * n


def test_girth_identity_no_cycles():
    h = SparseMatrix(5, 5)
    for j in range(5):
        h.insert(j, j)
    assert h.girth() is None


def test_girth_with_max_cutoff():
    h = SparseMatrix(2, 2)
    for j in range(2):
        for k in range(2):
            h.insert(j, k)
    assert h.girth_with_max(4) == 4
    assert h.girth_with_max(3) is None


def test_dense_roundtrip():
    rng = np.random.default_rng(0)
    a = (rng.random((13, 29)) < 0.2).astype(np.uint8)
    h = SparseMatrix.from_dense(a)
    np.testing.assert_array_equal(h.to_dense(), a)
    rows, cols = h.to_edge_arrays()
    assert len(rows) == a.sum()


# -- vectorized BFS / local girth vs the serial deque forms ---------------


def _random_matrix(rng, nrows, ncols, density):
    h = SparseMatrix(nrows, ncols)
    for r in range(nrows):
        for c in range(ncols):
            if rng.random() < density:
                h.insert(r, c)
    return h


def test_bfs_vectorized_matches_deque_random():
    import random

    rng = random.Random(1234)
    for trial in range(30):
        nrows = rng.randrange(1, 20)
        ncols = rng.randrange(1, 20)
        h = _random_matrix(rng, nrows, ncols, rng.choice([0.05, 0.15, 0.4]))
        for _ in range(4):
            node = (
                Node.col(rng.randrange(ncols))
                if rng.random() < 0.5
                else Node.row(rng.randrange(nrows))
            )
            fast = h.bfs(node)
            slow = h._bfs_deque(node)
            assert fast.row_nodes_distance == slow.row_nodes_distance
            assert fast.col_nodes_distance == slow.col_nodes_distance


def test_local_girth_vectorized_matches_deque_random():
    import random

    rng = random.Random(99)
    for trial in range(60):
        nrows = rng.randrange(1, 16)
        ncols = rng.randrange(1, 16)
        h = _random_matrix(rng, nrows, ncols, rng.choice([0.1, 0.25, 0.5]))
        for _ in range(6):
            node = (
                Node.col(rng.randrange(ncols))
                if rng.random() < 0.5
                else Node.row(rng.randrange(nrows))
            )
            maxg = rng.choice([0, 2, 3, 4, 6, 8, 100, 2**62])
            assert h._local_girth(node, maxg) == h._local_girth_deque(
                node, maxg
            ), (trial, node, maxg)


def test_mirrors_consistent_after_mutation():
    import random

    rng = random.Random(5)
    h = _random_matrix(rng, 12, 15, 0.3)
    for _ in range(200):
        op = rng.randrange(5)
        r = rng.randrange(12)
        c = rng.randrange(15)
        if op == 0:
            h.insert(r, c)
        elif op == 1:
            h.remove(r, c)
        elif op == 2:
            h.toggle(r, c)
        elif op == 3:
            h.clear_row(r)
        else:
            h.clear_col(c)
    for r in range(12):
        mirror = set(h._radj[r, : h._rdeg[r]].tolist())
        assert mirror == set(h.row_list(r))
        assert len(mirror) == h.row_weight(r)
    for c in range(15):
        mirror = set(h._cadj[c, : h._cdeg[c]].tolist())
        assert mirror == set(h.col_list(c))
        assert len(mirror) == h.col_weight(c)

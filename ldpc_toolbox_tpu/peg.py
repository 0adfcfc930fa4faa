"""Progressive Edge Growth (PEG) LDPC construction.

Rebuild of the reference's ``src/peg.rs`` (Hu/Eleftheriou/Arnold 2005):
for each symbol node, add ``wc`` edges one by one; each edge goes to a
check node chosen by BFS from the symbol node — prefer unreachable checks,
else checks at maximum distance, tie-breaking by minimum degree and then
uniformly at random (peg.rs:93-112).
"""

from __future__ import annotations

from dataclasses import dataclass

from .sparse import Node, SparseMatrix
from .utils.rng import Rng, compare_none_as_inf, sort_by_random_min

__all__ = ["Config", "PegError"]


class PegError(RuntimeError):
    pass


@dataclass
class Config:
    nrows: int
    ncols: int
    wc: int  # column weight

    def run(self, seed: int) -> SparseMatrix:
        h = SparseMatrix(self.nrows, self.ncols)
        rng = Rng(seed)
        for col in range(self.ncols):
            for _ in range(self.wc):
                _insert_edge(h, col, rng)
        return h


def _insert_edge(h: SparseMatrix, col: int, rng) -> None:
    row_dist = h.bfs(Node.col(col)).row_nodes_distance
    candidates = [
        (j, d, h.row_weight(j)) for j, d in enumerate(row_dist)
    ]

    # Order: unreachable (None) first, then decreasing distance, then
    # increasing degree — matching compare_some(...).reverse() then weight
    # (peg.rs:102-105). compare_none_as_inf sorts None last under <, so the
    # reversed distance order sorts None (infinite distance) first.
    def key(jdw):
        _, d, w = jdw
        t, v = compare_none_as_inf(d)
        return (-t, -v, w)

    sel = sort_by_random_min(candidates, key, rng)
    if sel is None:
        raise PegError("not enough rows available")
    h.insert(sel[0], col)

"""Sparse binary matrix (Tanner graph) with alist I/O, BFS and girth.

Host-side core data structure of the framework, mirroring the capability of
the reference's ``src/sparse.rs`` (SparseMatrix, alist read/write at
sparse.rs:250-389, girth APIs at sparse.rs:410-451) and ``src/sparse/bfs.rs``
(parent-excluding BFS with local-girth early exit, bfs.rs:53-109).

The alist text format emitted here is byte-identical to the reference so
that matrices interchange freely between the two implementations
(including MacKay's zero padding quirks for irregular codes).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from typing import Iterable, Iterator

import numpy as np

__all__ = ["SparseMatrix", "Node", "BFSResults"]


@dataclass(frozen=True)
class Node:
    """A node of the bipartite Tanner graph: a row (check) or column (variable).

    Mirrors ``Node`` in the reference (sparse.rs:482-500).
    """

    kind: str  # "row" | "col"
    index: int

    @staticmethod
    def row(i: int) -> "Node":
        return Node("row", i)

    @staticmethod
    def col(i: int) -> "Node":
        return Node("col", i)


@dataclass
class BFSResults:
    """Distances from a BFS root; ``None`` marks unreachable nodes.

    Mirrors ``BFSResults`` (bfs.rs:37-42).
    """

    row_nodes_distance: list
    col_nodes_distance: list


class SparseMatrix:
    """Dual adjacency-list sparse binary matrix.

    Rows and columns each keep the list of their nonzero partners, in
    insertion order (like sparse.rs:23-26). A set of ``(row, col)`` pairs
    accelerates membership tests.
    """

    __slots__ = ("_rows", "_cols", "_entries")

    def __init__(self, nrows: int, ncols: int):
        self._rows: list[list[int]] = [[] for _ in range(nrows)]
        self._cols: list[list[int]] = [[] for _ in range(ncols)]
        self._entries: set[tuple[int, int]] = set()

    # -- shape / weights ---------------------------------------------------

    @property
    def num_rows(self) -> int:
        return len(self._rows)

    @property
    def num_cols(self) -> int:
        return len(self._cols)

    def row_weight(self, row: int) -> int:
        return len(self._rows[row])

    def col_weight(self, col: int) -> int:
        return len(self._cols[col])

    def contains(self, row: int, col: int) -> bool:
        return (row, col) in self._entries

    # -- mutation ----------------------------------------------------------

    def insert(self, row: int, col: int) -> None:
        if (row, col) not in self._entries:
            self._rows[row].append(col)
            self._cols[col].append(row)
            self._entries.add((row, col))

    def remove(self, row: int, col: int) -> None:
        if (row, col) in self._entries:
            self._rows[row].remove(col)
            self._cols[col].remove(row)
            self._entries.discard((row, col))

    def toggle(self, row: int, col: int) -> None:
        if (row, col) in self._entries:
            self.remove(row, col)
        else:
            self.insert(row, col)

    def insert_row(self, row: int, cols: Iterable[int]) -> None:
        for col in cols:
            self.insert(row, col)

    def insert_col(self, col: int, rows: Iterable[int]) -> None:
        for row in rows:
            self.insert(row, col)

    def clear_row(self, row: int) -> None:
        for col in self._rows[row]:
            self._cols[col].remove(row)
            self._entries.discard((row, col))
        self._rows[row].clear()

    def clear_col(self, col: int) -> None:
        for row in self._cols[col]:
            self._rows[row].remove(col)
            self._entries.discard((row, col))
        self._cols[col].clear()

    def set_row(self, row: int, cols: Iterable[int]) -> None:
        self.clear_row(row)
        self.insert_row(row, cols)

    def set_col(self, col: int, rows: Iterable[int]) -> None:
        self.clear_col(col)
        self.insert_col(col, rows)

    # -- iteration ---------------------------------------------------------

    def iter_all(self) -> Iterator[tuple[int, int]]:
        for j, r in enumerate(self._rows):
            for k in r:
                yield (j, k)

    def iter_row(self, row: int) -> Iterator[int]:
        return iter(self._rows[row])

    def iter_col(self, col: int) -> Iterator[int]:
        return iter(self._cols[col])

    def row_list(self, row: int) -> list[int]:
        return self._rows[row]

    def col_list(self, col: int) -> list[int]:
        return self._cols[col]

    def num_entries(self) -> int:
        return len(self._entries)

    # -- equality (order-insensitive, like sparse.rs:28-47) ----------------

    def __eq__(self, other) -> bool:
        if not isinstance(other, SparseMatrix):
            return NotImplemented
        if self.num_rows != other.num_rows or self.num_cols != other.num_cols:
            return False
        return self._entries == other._entries

    def __hash__(self):  # pragma: no cover - matrices are mutable
        raise TypeError("SparseMatrix is unhashable")

    # -- dense / array conversion -----------------------------------------

    def to_dense(self) -> np.ndarray:
        """Dense 0/1 uint8 array of shape (num_rows, num_cols)."""
        a = np.zeros((self.num_rows, self.num_cols), dtype=np.uint8)
        if self._entries:
            idx = np.array(sorted(self._entries), dtype=np.int64)
            a[idx[:, 0], idx[:, 1]] = 1
        return a

    def to_edge_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Edge list as (row_indices, col_indices), sorted by (row, col)."""
        if not self._entries:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        idx = np.array(sorted(self._entries), dtype=np.int64)
        return idx[:, 0], idx[:, 1]

    @classmethod
    def from_dense(cls, a: np.ndarray) -> "SparseMatrix":
        a = np.asarray(a)
        h = cls(a.shape[0], a.shape[1])
        for r, c in zip(*np.nonzero(a)):
            h.insert(int(r), int(c))
        return h

    # -- alist I/O (byte-compatible with sparse.rs:250-389) ----------------

    def _write_alist(self, use_padding: bool) -> str:
        out: list[str] = []
        out.append(f"{self.num_cols} {self.num_rows}\n")
        directions = [self._cols, self._rows]
        direction_lengths = [
            max((len(el) for el in d), default=0) for d in directions
        ]
        out.append(f"{direction_lengths[0]} {direction_lengths[1]}\n")
        for d in directions:
            out.append(" ".join(str(len(el)) for el in d) + "\n")
        for d, dirlen in zip(directions, direction_lengths):
            for el in d:
                v = sorted(x + 1 for x in el)
                parts = [str(x) for x in v]
                line = " ".join(parts)
                if use_padding:
                    if not v:
                        line += "0"
                    # one padding element was already added if v was empty
                    num_padding = dirlen - max(len(v), 1)
                    line += " 0" * num_padding
                out.append(line + "\n")
        return "".join(out)

    def alist(self) -> str:
        """Alist string with MacKay zero padding for irregular codes."""
        return self._write_alist(True)

    def alist_no_padding(self) -> str:
        """Alist string without zero padding."""
        return self._write_alist(False)

    def write_alist_file(self, path) -> None:
        with open(path, "w") as f:
            f.write(self.alist())

    @classmethod
    def from_alist(cls, alist: str) -> "SparseMatrix":
        """Parse an alist (padded or unpadded; column data is authoritative,
        like the reference parser sparse.rs:352-389)."""
        lines = alist.split("\n")
        if not lines:
            raise ValueError("alist first line not found")
        sizes = lines[0].split()
        if len(sizes) < 2:
            raise ValueError("alist first line does not contain enough elements")
        try:
            ncols, nrows = int(sizes[0]), int(sizes[1])
        except ValueError as e:
            raise ValueError("alist sizes are not numbers") from e
        h = cls(nrows, ncols)
        # lines[1] = max weights, lines[2], lines[3] = per-col/per-row weights
        data = lines[4:]
        if len(data) < ncols:
            raise ValueError("alist does not contain expected number of lines")
        for col in range(ncols):
            for tok in data[col].split():
                try:
                    row = int(tok)
                except ValueError as e:
                    raise ValueError("row value is not a number") from e
                if row != 0:  # 0 is irregular-code padding
                    h.insert(row - 1, col)
        # the rows section is redundant and ignored
        return h

    @classmethod
    def from_alist_file(cls, path) -> "SparseMatrix":
        with open(path) as f:
            return cls.from_alist(f.read())

    # -- BFS / girth (mirrors bfs.rs semantics) ----------------------------

    def _neighbors(self, node: Node) -> Iterator[Node]:
        if node.kind == "row":
            for c in self._rows[node.index]:
                yield Node("col", c)
        else:
            for r in self._cols[node.index]:
                yield Node("row", r)

    def bfs(self, node: Node) -> BFSResults:
        """Breadth-first distances from `node` with parent exclusion."""
        results = BFSResults(
            row_nodes_distance=[None] * self.num_rows,
            col_nodes_distance=[None] * self.num_cols,
        )
        dist = (
            results.row_nodes_distance
            if node.kind == "row"
            else results.col_nodes_distance
        )
        dist[node.index] = 0
        # queue entries: (node, parent, path_length)
        to_visit: deque = deque([(node, None, 0)])
        while to_visit:
            head, parent, plen = to_visit.popleft()
            for nxt in self._neighbors(head):
                if parent is not None and nxt == parent:
                    continue
                d = (
                    results.row_nodes_distance
                    if nxt.kind == "row"
                    else results.col_nodes_distance
                )
                if d[nxt.index] is None:
                    d[nxt.index] = plen + 1
                    to_visit.append((nxt, head, plen + 1))
        return results

    def _local_girth(self, node: Node, max_girth: int) -> int | None:
        """Length of the shortest cycle through `node`, or None if none
        exists with length <= max_girth (bfs.rs:92-108)."""
        row_dist: list = [None] * self.num_rows
        col_dist: list = [None] * self.num_cols
        if node.kind == "row":
            row_dist[node.index] = 0
        else:
            col_dist[node.index] = 0
        to_visit: deque = deque([(node, None, 0)])
        while to_visit:
            head, parent, plen = to_visit.popleft()
            for nxt in self._neighbors(head):
                if parent is not None and nxt == parent:
                    continue
                d = row_dist if nxt.kind == "row" else col_dist
                cur = d[nxt.index]
                if cur is not None:
                    total = cur + plen + 1
                    return total if total <= max_girth else None
                d[nxt.index] = plen + 1
                if plen + 1 < max_girth:
                    to_visit.append((nxt, head, plen + 1))
        return None

    def girth_at_node_with_max(self, node: Node, max_girth: int) -> int | None:
        return self._local_girth(node, max_girth)

    def girth_at_node(self, node: Node) -> int | None:
        return self._local_girth(node, 2**62)

    def girth_with_max(self, max_girth: int) -> int | None:
        best = None
        bound = max_girth
        for c in range(self.num_cols):
            g = self._local_girth(Node.col(c), bound)
            if g is not None and (best is None or g < best):
                best = g
                # shrink the search bound: cycles in a bipartite graph have
                # even length, so nothing shorter than best-2 can beat best
                bound = min(bound, best)
        return best

    def girth(self) -> int | None:
        return self.girth_with_max(2**62)

    def __repr__(self) -> str:
        return (
            f"SparseMatrix({self.num_rows}x{self.num_cols}, "
            f"{len(self._entries)} ones)"
        )

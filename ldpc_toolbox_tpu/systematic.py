"""Column permutation to systematic-encodable form.

Rebuild of ``src/systematic.rs:31-85``: run GF(2) row echelon on a dense
copy of H; pivot columns move (in order) to the last n rows' positions so
the trailing square submatrix is invertible; non-pivot columns compact to
the front preserving order.
"""

from __future__ import annotations

from .gf2 import row_echelon_form
from .sparse import SparseMatrix

__all__ = ["parity_to_systematic", "SystematicError"]


class SystematicError(ValueError):
    pass


def parity_to_systematic(h: SparseMatrix) -> SparseMatrix:
    n = h.num_rows
    m = h.num_cols
    if n > m:
        raise SystematicError("the parity check matrix has more rows than columns")
    a = h.to_dense()
    row_echelon_form(a)
    if not a[n - 1].any():
        raise SystematicError("the parity check matrix does not have full rank")
    h_new = SparseMatrix(n, m)
    k = 0  # write point for non-pivot columns
    j0 = 0
    for j in range(n):
        assert k < m - n
        found = False
        for s in range(j0, m):
            if a[j, s] == 0:
                # non-pivot column: compact to the front
                h_new.insert_col(k, h.iter_col(s))
                k += 1
            else:
                # pivot column: move to its slot in the last n columns
                h_new.insert_col(m - n + j, h.iter_col(s))
                found = True
                j0 = s + 1
                break
        assert found
    for j in range(j0, m):
        assert k < m - n
        h_new.insert_col(k, h.iter_col(j))
        k += 1
    return h_new

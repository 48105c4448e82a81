"""Symbolic-factorization fill count.

The acceptance metric AMD exists for (VERDICT r2 item 4): the
reference's AMD delivers SuiteSparse fill-reducing orderings
(reference: src/sparsebase/reorder/amd_reorder.cc:29-57 wraps
``amd_l_order``), so "AMD parity" must be judged on **fill** — the
number of nonzeros in the Cholesky factor L of the symmetrized pattern
— not on bandwidth/profile (which RCM optimizes instead).

``nnz(L)`` is computed exactly by the elimination-tree row-structure
algorithm (Gilbert–Ng–Peyton row counts, simplified): for row i, the
columns of L's row i are found by walking each lower-triangular entry k
of row i up the partially-built elimination tree until reaching a row
already marked for i; total work is O(nnz(L)). Host-side sequential by
nature (CLAUDE.md conventions: host algorithms live on numpy) — the
inherently-sequential parent-path walk is exactly the kind of dependence
chain SURVEY.md §7 hard part 2 predicts has no data-parallel recast.

To score an ordering, permute the matrix first (``ReorderBase.permute2d``)
and take the fill of the permuted matrix:

    fill(natural) = FillIn().get_fill(csr)
    fill(amd)     = FillIn().get_fill(ReorderBase.permute2d(amd_order, csr))
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...formats.csr import CSR
from .base import Feature


@dataclasses.dataclass
class FillInParams:
    pass


def _fill_nnz_host(indptr: np.ndarray, indices: np.ndarray, n: int) -> int:
    """nnz(L) incl. the diagonal for the symmetrized pattern, natural
    order (elimination-tree upward walks; O(nnz(L)))."""
    # symmetrize + strictly-lower neighbors per row, CSR walk
    parent = np.full(n, -1, np.int64)
    mark = np.full(n, -1, np.int64)
    count = n  # diagonal
    # build per-row lower adjacency from the symmetric pattern
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    cols = indices.astype(np.int64)
    lo_r = np.concatenate([rows, cols])
    lo_c = np.concatenate([cols, rows])
    keep = lo_c < lo_r
    lo_r, lo_c = lo_r[keep], lo_c[keep]
    order = np.lexsort((lo_c, lo_r))
    lo_r, lo_c = lo_r[order], lo_c[order]
    starts = np.searchsorted(lo_r, np.arange(n + 1))
    for i in range(n):
        mark[i] = i
        for k in lo_c[starts[i] : starts[i + 1]]:
            # walk k up the etree, marking new entries of L's row i
            while mark[k] != i:
                if parent[k] == -1:
                    parent[k] = i
                mark[k] = i
                count += 1
                k = parent[k]
    return int(count)


class FillIn(Feature):
    """``nnz(L)`` of the symbolic Cholesky factor of the (symmetrized)
    pattern in its **current** row order. Duplicate structure entries are
    counted once (pattern semantics). Permute first to score an ordering."""

    def __init__(self):
        super().__init__("fill_in")
        self.params = FillInParams()
        self.register((CSR,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csr: CSR = formats[0].to_host()
        from ... import native

        indptr = np.asarray(csr.indptr).astype(np.int64)
        indices = np.asarray(csr.indices).astype(np.int64)
        if native.available() and hasattr(native, "fill_in"):
            return native.fill_in(csr.nrows, indptr, indices)
        return _fill_nnz_host(indptr, indices, csr.nrows)

    def get_fill_in(self, fmt, context=None, convert_input=True):
        return self.execute(self.params, fmt, context=context,
                            convert_input=convert_input)

    # convenience alias
    get_fill = get_fill_in

"""Format-conversion kernels (dual backend: numpy on host, XLA on device).

TPU-native redesign of the reference conversion functions
(reference: src/sparsebase/converter/converter_order_two.cc — COO→CSR
counting + prefix-sum :163-214, CSR→COO row expansion :72-118, COO→CSC
column counting :21-70, CSR→CSC composite :120-128). Differences:

* Sort-based formulations replace sequential counting loops: histogram =
  ``bincount`` + ``cumsum``; row expansion = vectorized ``searchsorted``;
  (col, row) reorder = stable key-sort. All are single XLA ops that map
  onto the VPU/sort units — no scalar loops.
* CSC is a **full node**: CSC→COO/CSR edges exist (the reference leaves
  CSC a sink, SURVEY.md §2.3).
* Move-vs-copy distinction is unnecessary (immutable arrays).

Every kernel is pure and jit-compatible (static shapes from the pytree
metadata), so whole pipelines containing conversions fuse under one jit.
"""

from __future__ import annotations

import numpy as np

from ..formats.array import DenseArray
from ..formats.base import xp_for
from ..formats.coo import COO
from ..formats.csc import CSC
from ..formats.csr import CSR


def _bincount(xp, x, length, dtype):
    if xp is np:
        return np.bincount(x, minlength=length).astype(dtype)[:length]
    import jax.numpy as jnp

    return jnp.bincount(x, length=length).astype(dtype)


def _indptr_from_counts(xp, counts, nnz_dtype):
    zero = xp.zeros((1,), dtype=nnz_dtype)
    return xp.concatenate([zero, xp.cumsum(counts).astype(nnz_dtype)])


def coo_to_csr(coo: COO) -> CSR:
    """Counting + prefix-sum, relying on the row-major sort invariant
    (parity: CooCsrFunctionConditional, converter_order_two.cc:163-214)."""
    xp = xp_for(coo.row, coo.col)
    nnz_dtype = coo.row.dtype
    counts = _bincount(xp, coo.row, coo.nrows, nnz_dtype)
    indptr = _indptr_from_counts(xp, counts, nnz_dtype)
    return CSR(indptr, coo.col, coo.vals, coo.shape)


def csr_to_coo(csr: CSR) -> COO:
    """Row expansion via vectorized searchsorted
    (parity: CsrCooFunctionConditional, converter_order_two.cc:72-118)."""
    row = csr.row_of_nnz()
    return COO(row, csr.indices, csr.vals, csr.shape)


def lexsort_pairs(xp, major, minor):
    """Permutation sorting entries by (major, minor), via two stable sorts.

    Avoids wide int64 fused keys (``major * extent + minor`` overflows int32
    for matrices with > 2^31 cells, and jax without x64 silently truncates).
    """
    order1 = xp.argsort(minor, stable=True)
    order2 = xp.argsort(major[order1], stable=True)
    return order1[order2]


def _order2_transpose_sort(xp, major, minor, vals, n_major, major_extent):
    """Stable sort entries by (major, minor); returns (indptr, minor, vals)."""
    order = lexsort_pairs(xp, major, minor)
    minor_sorted = minor[order]
    vals_sorted = None if vals is None else vals[order]
    counts = _bincount(xp, major, n_major, major.dtype)
    indptr = _indptr_from_counts(xp, counts, major.dtype)
    return indptr, minor_sorted, vals_sorted


def coo_to_csc(coo: COO) -> CSC:
    """Sort by (col, row) then column-histogram
    (parity: CooCscFunctionConditional, converter_order_two.cc:21-70)."""
    xp = xp_for(coo.row, coo.col)
    indptr, rows, vals = _order2_transpose_sort(
        xp, coo.col, coo.row, coo.vals, coo.ncols, coo.nrows
    )
    return CSC(indptr, rows, vals, coo.shape)


def csc_to_coo(csc: CSC) -> COO:
    """CSC → row-major-sorted COO (new edge; CSC is a sink in the reference)."""
    xp = xp_for(csc.indptr, csc.indices)
    col = csc.col_of_nnz()
    row = csc.indices
    order = lexsort_pairs(xp, row, col)
    vals = None if csc.vals is None else csc.vals[order]
    return COO(row[order], col[order], vals, csc.shape)


def csr_to_csc(csr: CSR) -> CSC:
    """Direct CSR→CSC transpose-sort (the reference routes CSR→COO→CSC,
    converter_order_two.cc:120-128; one fused sort is cheaper)."""
    xp = xp_for(csr.indptr, csr.indices)
    row = csr.row_of_nnz()
    indptr, rows, vals = _order2_transpose_sort(
        xp, csr.indices, row, csr.vals, csr.ncols, csr.nrows
    )
    return CSC(indptr, rows, vals, csr.shape)


def csc_to_csr(csc: CSC) -> CSR:
    """Direct CSC→CSR transpose-sort (new edge)."""
    xp = xp_for(csc.indptr, csc.indices)
    col = csc.col_of_nnz()
    indptr, cols, vals = _order2_transpose_sort(
        xp, csc.indices, col, csc.vals, csc.nrows, csc.ncols
    )
    return CSR(indptr, cols, vals, csc.shape)

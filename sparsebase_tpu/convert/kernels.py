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
    Prefer :func:`sort_by_pairs` on device — it fuses the two keys and the
    payload into one ``lax.sort`` call.
    """
    order1 = xp.argsort(minor, stable=True)
    order2 = xp.argsort(major[order1], stable=True)
    return order1[order2]


def sort_by_pairs(xp, major, minor, *payload):
    """Sort entries by (major, minor), carrying payload arrays along.

    Returns ``(major_sorted, minor_sorted, *payload_sorted)``. Device path
    is a single variadic ``jax.lax.sort`` with ``num_keys=2`` — one fused
    sort instead of two stable argsorts plus per-array gathers (the
    argsort formulation costs ~3x more on TPU). ``None`` payload entries
    pass through as ``None``.
    """
    live = [p for p in payload if p is not None]
    if xp is np:
        order = np.lexsort((minor, major))
        outs = [major[order], minor[order]] + [p[order] for p in live]
    else:
        import jax

        # not is_stable: ties are exact duplicate (major, minor) pairs whose
        # payload order is unobservable (duplicates accumulate); unstable
        # variadic sort is measurably faster on TPU
        outs = list(jax.lax.sort((major, minor, *live), num_keys=2, is_stable=False))
    result = outs[:2]
    it = iter(outs[2:])
    for p in payload:
        result.append(None if p is None else next(it))
    return tuple(result)


def _order2_transpose_sort(xp, major, minor, vals, n_major, major_extent):
    """Stable sort entries by (major, minor); returns (indptr, minor, vals)."""
    _, minor_sorted, vals_sorted = sort_by_pairs(xp, major, minor, vals)
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
    row_s, col_s, vals_s = sort_by_pairs(xp, row, col, csc.vals)
    return COO(row_s, col_s, vals_s, csc.shape)


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

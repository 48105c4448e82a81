"""Permutation ops: apply (inverse-)permutations to formats.

TPU-native analogue of the reference permute layer
(reference: src/sparsebase/permute/permuter.h:22-52,
permute_order_two.cc:30-95, permute_order_one.cc). Permutations follow
the reference convention throughout: ``order[old_id] = new_id`` (an
*inverse* permutation, reorder/reorderer.h:49-52).

The CSR row/col permutation is a fully vectorized scatter: destination
offsets are computed from the permuted indptr and per-entry in-row
offsets — no per-row loop. Columns are remapped and rows re-sorted
(the reference leaves re-sorting to the output CSR constructor,
permute_order_two.cc:86-92; here it is part of the kernel so the result
is valid under jit too).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..dispatch import Operation
from ..formats.array import DenseArray
from ..formats.base import xp_for
from ..formats.coo import COO
from ..formats.csc import CSC
from ..formats.csr import CSR
from ..utils.exceptions import ReorderError


def inverse_permutation(order) -> object:
    """perm⁻¹: if order[old] = new, returns inv with inv[new] = old.

    Parity: ``ReorderBase::InversePermutation`` (bases/reorder_base.h).
    """
    xp = xp_for(order)
    return xp.argsort(order)


@dataclasses.dataclass
class PermuteOrderTwoParams:
    """row_order / col_order are inverse perms; None means identity
    (permute_order_two.h:12-18 parity)."""

    row_order: Optional[object] = None
    col_order: Optional[object] = None


def _permute_csr(formats, params: PermuteOrderTwoParams) -> CSR:
    csr: CSR = formats[0]
    xp = xp_for(csr.indptr, csr.indices)
    row_order = params.row_order
    col_order = params.col_order

    indptr, indices, vals = csr.indptr, csr.indices, csr.vals
    if row_order is not None:
        row_order = xp.asarray(row_order)
        # old row for each new position
        old_of_new = xp.argsort(row_order)
        degrees = indptr[1:] - indptr[:-1]
        new_degrees = degrees[old_of_new]
        new_indptr = xp.concatenate(
            [xp.zeros((1,), dtype=indptr.dtype), xp.cumsum(new_degrees).astype(indptr.dtype)]
        )
        # destination of each nnz: start of its row's new home + in-row offset
        old_row = csr.row_of_nnz()
        pos_in_row = xp.arange(csr.nnz, dtype=indptr.dtype) - indptr[old_row]
        dest = new_indptr[row_order[old_row]] + pos_in_row
        new_indices = xp.zeros_like(indices)
        if xp is np:
            new_indices[dest] = indices
        else:
            new_indices = new_indices.at[dest].set(indices)
        if vals is not None:
            new_vals = xp.zeros_like(vals)
            if xp is np:
                new_vals[dest] = vals
            else:
                new_vals = new_vals.at[dest].set(vals)
        else:
            new_vals = None
        indptr, indices, vals = new_indptr, new_indices, new_vals

    if col_order is not None:
        col_order = xp.asarray(col_order)
        indices = col_order[indices].astype(indices.dtype)

    out = CSR(indptr, indices, vals, csr.shape)
    if col_order is not None:
        out = out.sort_rows()
    return out


def _permute_coo(formats, params: PermuteOrderTwoParams) -> COO:
    coo: COO = formats[0]
    xp = xp_for(coo.row, coo.col)
    row = coo.row if params.row_order is None else xp.asarray(params.row_order)[coo.row]
    col = coo.col if params.col_order is None else xp.asarray(params.col_order)[coo.col]
    out = COO(row.astype(coo.row.dtype), col.astype(coo.col.dtype), coo.vals, coo.shape)
    return out.sort_rowmajor()


class PermuteOrderTwo(Operation):
    """Parity: ``permute::PermuteOrderTwo`` (permute_order_two.cc)."""

    def __init__(self, row_order=None, col_order=None):
        super().__init__("permute_order_two")
        self.params = PermuteOrderTwoParams(row_order, col_order)
        self.register((CSR,), _permute_csr)
        self.register((COO,), _permute_coo)

    def get_permutation(self, fmt, context=None, convert_input: bool = True):
        return self.execute(self.params, fmt, context=context, convert_input=convert_input)

    def get_permutation_cached(self, fmt, context=None, convert_input: bool = True):
        return self.execute_cached(
            self.params, fmt, context=context, convert_input=convert_input
        )


def _permute_array(formats, params) -> DenseArray:
    arr: DenseArray = formats[0]
    xp = xp_for(arr.vals)
    order = xp.asarray(params)
    # out[order[i]] = vals[i]  (permute_order_one.cc parity)
    return DenseArray(arr.vals[xp.argsort(order)])


class PermuteOrderOne(Operation):
    """Parity: ``permute::PermuteOrderOne`` (permute_order_one.cc)."""

    def __init__(self, order):
        super().__init__("permute_order_one")
        self.params = order
        self.register((DenseArray,), _permute_array)

    def get_permutation(self, fmt, context=None, convert_input: bool = True):
        return self.execute(self.params, fmt, context=context, convert_input=convert_input)


def permute_2d(fmt, row_order=None, col_order=None, context=None):
    """Functional one-shot 2-D permutation."""
    return PermuteOrderTwo(row_order, col_order).get_permutation(fmt, context)


def permute_1d(arr, order, context=None):
    """Functional one-shot 1-D permutation."""
    return PermuteOrderOne(order).get_permutation(arr, context)

"""Structural features: Bandwidth, Profile, OffDiagBlockNNZ.

Reference analogues: src/sparsebase/feature/bandwidth.cc:93-112 (max of
|i-j|+1 over nnz), profile.cc:92-106 (Σᵢ i - min(minⱼ, i)),
off_diag_block_nnz.cc:98-116 (entries outside balanced diagonal blocks).
Scalar double loops become per-nnz vector expressions + segment
reductions.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...formats.base import xp_for
from ...formats.csr import CSR
from .base import Feature


class Bandwidth(Feature):
    """max(|i-j|+1) over all entries; 0 for empty (bandwidth.cc:93-112)."""

    def __init__(self):
        super().__init__("bandwidth")
        self.register((CSR,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csr: CSR = formats[0]
        if csr.nnz == 0:
            return 0
        xp = xp_for(csr.indptr, csr.indices)
        row = csr.row_of_nnz()
        diff = xp.abs(row.astype(xp.int32) - csr.indices.astype(xp.int32)) + 1
        return diff.max()

    def get_bandwidth(self, fmt, context=None, convert_input=True):
        return self.execute(self.params, fmt, context=context, convert_input=convert_input)


class Profile(Feature):
    """Σᵢ (i - min(min_col(i), i)) — envelope size (profile.cc:92-106)."""

    def __init__(self):
        super().__init__("profile")
        self.register((CSR,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csr: CSR = formats[0]
        xp = xp_for(csr.indptr, csr.indices)
        n = csr.nrows
        row = csr.row_of_nnz()
        i64 = xp.int64 if xp is np else xp.int32
        mins = xp.full((n,), 2**31 - 1, dtype=i64)
        ids = xp.arange(n, dtype=i64)
        if xp is np:
            np.minimum.at(mins, row, csr.indices.astype(i64))
        else:
            mins = mins.at[row].min(csr.indices.astype(i64))
        mins = xp.minimum(mins, ids)  # j starts at i (profile.cc:98-99)
        return (ids - mins).sum()

    def get_profile(self, fmt, context=None, convert_input=True):
        return self.execute(self.params, fmt, context=context, convert_input=convert_input)


@dataclasses.dataclass
class OffDiagBlockNNZParams:
    """blockrowsize h / blockcolsize w = number of row/col blocks
    (off_diag_block_nnz.cc:98-101)."""

    blockrowsize: int = 2
    blockcolsize: int = 2


def _balanced_starts(xp, total, parts, dtype):
    """start offsets of `parts` balanced chunks of `total`
    (off_diag_block_nnz.cc:103-106 chunking)."""
    p = xp.arange(parts + 1, dtype=dtype)
    return xp.minimum(total, p * (total // parts) + xp.minimum(p, total % parts))


class OffDiagBlockNNZ(Feature):
    """nnz outside the p-th diagonal block for every p
    (off_diag_block_nnz.cc:98-116)."""

    def __init__(self, blockrowsize: int = 2, blockcolsize: int = 2):
        super().__init__("off_diag_block_nnz")
        self.params = OffDiagBlockNNZParams(blockrowsize, blockcolsize)
        self.register((CSR,), self._impl)

    @staticmethod
    def _impl(formats, params: OffDiagBlockNNZParams):
        csr: CSR = formats[0]
        xp = xp_for(csr.indptr, csr.indices)
        h, w = int(params.blockrowsize), int(params.blockcolsize)
        nrows, ncols = csr.shape
        i32 = xp.int64 if xp is np else xp.int32
        row_starts = _balanced_starts(xp, nrows, h, i32)
        col_starts = _balanced_starts(xp, ncols, w, i32)
        row = csr.row_of_nnz().astype(i32)
        col = csr.indices.astype(i32)
        p = xp.searchsorted(row_starts, row, side="right") - 1  # block of each row
        p = xp.minimum(p, min(h, w) - 1) if h != w else p
        lo = col_starts[xp.minimum(p, w)]
        hi = col_starts[xp.minimum(p + 1, w)]
        out = (col < lo) | (col >= hi)
        return out.sum()

    def get_off_diag_block_nnz(self, fmt, context=None, convert_input=True):
        return self.execute(self.params, fmt, context=context, convert_input=convert_input)

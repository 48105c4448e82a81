"""Bucketed padding: static shapes across matrices (SURVEY.md §7 hard part 4).

Under jit, every distinct (nrows, nnz) pair compiles a fresh program.
Preprocessing pipelines over many matrices amortize compilation by
padding each matrix up to bucket boundaries (powers of two by default):
matrices in the same bucket share one executable.

Padding is *inert for value ops* (SpMV & co): pad rows are empty except
the last, which absorbs the pad nnz as (col 0, value 0) entries.
Structural ops (degrees, reorder) must look at the unpadded matrix —
:class:`PaddedCSR` keeps the original dims/nnz as static metadata and
``unpad()`` recovers the exact input.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from .base import Format, register_format, static_field, xp_for
from .csr import CSR


def next_bucket(x: int, policy: str = "pow2") -> int:
    """Smallest bucket boundary ≥ x. 'pow2' doubles; 'pow2_half' adds the
    midpoints (1.0x and 1.5x of each power) for tighter fits."""
    if x <= 1:
        return 1
    p = 1 << (int(x - 1).bit_length())
    if policy == "pow2":
        return p
    if policy == "pow2_half":
        # midpoint boundary 0.75*p sits between p/2 and p
        cand = (p * 3) // 4
        return cand if cand >= x else p
    raise ValueError(f"unknown bucket policy {policy!r}")


@register_format
@dataclasses.dataclass(frozen=True)
class PaddedCSR(Format):
    """A CSR padded to bucket sizes + the original true dimensions."""

    csr: CSR
    _orig_shape: Tuple[int, int] = static_field(default=(0, 0))
    _orig_nnz: int = static_field(default=0)

    order = 2

    @property
    def shape(self) -> Tuple[int, int]:
        return self._orig_shape

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return self.csr.shape

    @property
    def nnz(self) -> int:
        return self._orig_nnz

    @property
    def padded_nnz(self) -> int:
        return self.csr.nnz

    def unpad(self) -> CSR:
        xp = xp_for(self.csr.indptr, self.csr.indices)
        n, m = self._orig_shape
        indptr = self.csr.indptr[: n + 1]
        indices = self.csr.indices[: self._orig_nnz]
        vals = None if self.csr.vals is None else self.csr.vals[: self._orig_nnz]
        return CSR(indptr, indices, vals, (n, m))

    def __repr__(self) -> str:
        return (
            f"PaddedCSR(orig={self._orig_shape}/{self._orig_nnz}nnz, "
            f"padded={self.padded_shape}/{self.padded_nnz}nnz)"
        )


def pad_csr(
    csr: CSR,
    row_bucket: Optional[int] = None,
    nnz_bucket: Optional[int] = None,
    policy: str = "pow2",
) -> PaddedCSR:
    """Pad a CSR to bucket boundaries (explicit sizes or `policy`).

    Pad nnz become (col 0, value 0) entries on the last pad row, so
    value ops (SpMV, feature sums over values) are unchanged. Pattern
    matrices gain an explicit value array (ones for real entries, zeros
    for padding).
    """
    xp = xp_for(csr.indptr, csr.indices)
    n, m = csr.shape
    nnz = csr.nnz
    rb = row_bucket if row_bucket is not None else next_bucket(n, policy)
    nb = nnz_bucket if nnz_bucket is not None else next_bucket(max(nnz, 1), policy)
    if rb < n or nb < nnz:
        raise ValueError("bucket smaller than matrix")
    if rb == n and nb == nnz and csr.vals is not None:
        return PaddedCSR(csr, (n, m), nnz)

    pad_rows = rb - n
    pad_nnz = nb - nnz
    if pad_nnz > 0 and pad_rows == 0:
        # need a row to absorb pad entries
        pad_rows, rb = 1, rb + 1

    vals = csr.vals
    if vals is None:
        vals = xp.ones((nnz,), dtype=xp.float32)
    last = csr.indptr[-1]
    tail = xp.concatenate(
        [
            xp.full((max(pad_rows - 1, 0),), last, dtype=csr.indptr.dtype),
            xp.full((1 if pad_rows else 0,), last + pad_nnz, dtype=csr.indptr.dtype),
        ]
    )
    indptr = xp.concatenate([csr.indptr, tail])
    indices = xp.concatenate(
        [csr.indices, xp.zeros((pad_nnz,), dtype=csr.indices.dtype)]
    )
    vals = xp.concatenate([vals, xp.zeros((pad_nnz,), dtype=vals.dtype)])
    return PaddedCSR(CSR(indptr, indices, vals, (rb, m)), (n, m), nnz)

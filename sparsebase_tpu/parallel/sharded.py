"""Mesh-sharded CSR: vertex-block distribution over a device mesh.

The north-star distributed container (SURVEY.md §2.13, BASELINE.md
weak-scaling target): a CSR partitioned into contiguous row blocks, one
per device along a mesh axis, with static padded shapes so the whole
structure jits/shard_maps cleanly.

Layout (all arrays lead with the device dimension D and are sharded on
it):

* ``indptr``  (D, R+1) — local row pointers (R = padded rows/shard)
* ``indices`` (D, C)   — **global** column ids, padded (pad slots point
  at column 0 with zero/masked values)
* ``vals``    (D, C) or None
* ``nnz_local`` (D,)   — true nnz of each shard (pad-mask boundary)

This is the analogue of the reference's device-resident ``CUDACSR``
(format/cuda_csr_cuda.cuh:12-60) generalized from one GPU to a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..formats.base import Format, register_format, static_field
from ..formats.csr import CSR


@register_format
@dataclasses.dataclass(frozen=True)
class ShardedCSR(Format):
    """Row-block sharded CSR over a 1-D mesh axis."""

    indptr: object  # (D, R+1)
    indices: object  # (D, C) global col ids
    vals: Optional[object]  # (D, C) or None
    nnz_local: object  # (D,)
    _shape: Tuple[int, int] = static_field(default=(0, 0))
    _axis: str = static_field(default="x")

    order = 2

    @property
    def shape(self) -> Tuple[int, int]:
        return self._shape

    @property
    def nnz(self) -> int:
        return int(np.asarray(jax.device_get(self.nnz_local)).sum())

    @property
    def n_shards(self) -> int:
        return int(self.indptr.shape[0])

    @property
    def rows_per_shard(self) -> int:
        return int(self.indptr.shape[1]) - 1

    @property
    def axis(self) -> str:
        return self._axis

    # -- construction --------------------------------------------------------
    @staticmethod
    def from_csr(csr: CSR, mesh: Mesh, axis: str = "x") -> "ShardedCSR":
        """Partition a host/device CSR into row blocks over ``mesh``."""
        csr = csr.to_host()
        indptr = np.asarray(csr.indptr).astype(np.int32)
        indices = np.asarray(csr.indices).astype(np.int32)
        vals = None if csr.vals is None else np.asarray(csr.vals)
        n, m = csr.shape
        d = mesh.shape[axis]
        rows = -(-n // d)  # rows per shard (ceil)
        # per-shard nnz and max padded width
        bounds = np.minimum(np.arange(d + 1) * rows, n)
        shard_nnz = indptr[bounds[1:]] - indptr[bounds[:-1]]
        width = max(int(shard_nnz.max()), 1)
        lp = np.zeros((d, rows + 1), np.int32)
        li = np.zeros((d, width), np.int32)
        lv = None if vals is None else np.zeros((d, width), vals.dtype)
        for k in range(d):
            lo, hi = bounds[k], bounds[k + 1]
            base = indptr[lo]
            seg = indptr[lo : hi + 1] - base
            lp[k, : hi - lo + 1] = seg
            lp[k, hi - lo + 1 :] = seg[-1]
            cnt = indptr[hi] - base
            li[k, :cnt] = indices[base : indptr[hi]]
            if vals is not None:
                lv[k, :cnt] = vals[base : indptr[hi]]
        sharding = NamedSharding(mesh, PartitionSpec(axis))
        put = lambda a: jax.device_put(a, sharding)
        return ShardedCSR(
            put(lp),
            put(li),
            None if lv is None else put(lv),
            put(shard_nnz.astype(np.int32)),
            (n, m),
            axis,
        )

    def to_csr(self) -> CSR:
        """Gather back to a host CSR (inverse of from_csr)."""
        lp = np.asarray(jax.device_get(self.indptr))
        li = np.asarray(jax.device_get(self.indices))
        lv = None if self.vals is None else np.asarray(jax.device_get(self.vals))
        nnz_local = np.asarray(jax.device_get(self.nnz_local))
        n, m = self._shape
        d, rows = lp.shape[0], lp.shape[1] - 1
        indptr = np.zeros(n + 1, np.int64)
        chunks_i, chunks_v = [], []
        base = 0
        for k in range(d):
            lo = k * rows
            hi = min(lo + rows, n)
            indptr[lo + 1 : hi + 1] = base + lp[k, 1 : hi - lo + 1]
            cnt = int(nnz_local[k])
            chunks_i.append(li[k, :cnt])
            if lv is not None:
                chunks_v.append(lv[k, :cnt])
            base += cnt
        indices = np.concatenate(chunks_i) if chunks_i else np.zeros(0, np.int32)
        vals = np.concatenate(chunks_v) if lv is not None else None
        return CSR(indptr.astype(np.int64), indices, vals, self._shape)

    def local_row_offset(self, shard_index):
        """Global row id of each shard's first row."""
        return shard_index * self.rows_per_shard

    def __repr__(self) -> str:
        return (
            f"ShardedCSR(shape={self._shape}, shards={self.n_shards}, "
            f"rows/shard={self.rows_per_shard}, width={self.indices.shape[1]})"
        )

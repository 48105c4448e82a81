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

Halo metadata (optional; built by :meth:`from_csr` / :meth:`with_halo`)
makes remote-vertex access **boundary-proportional** instead of
replicated: for every (owner → reader) shard pair the sorted unique
remote vertices the reader touches are precomputed, so one
``all_to_all`` of ``(D, S)`` values replaces a dense ``(n,)`` ``psum``
(SURVEY.md §2.13 "frontier BFS with halo exchange"):

* ``halo_send``   (D, D, S) — [owner, reader, j]: owner-local row ids to
  ship; pad slots point at row 0 (harmless — see kernels)
* ``halo_counts`` (D, D)    — true list lengths (comm accounting)
* ``halo_map``    (D, C)    — per-nnz index into the *extended* local
  vector ``[R local rows | D*S halo slots]``; slot for (owner o, j) is
  ``R + o*S + j``

This is the analogue of the reference's device-resident ``CUDACSR``
(format/cuda_csr_cuda.cuh:12-60) generalized from one GPU to a mesh,
plus the distributed-memory ghost/halo structure the reference lacks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..formats.base import Format, register_format, static_field
from ..formats.csr import CSR


def _host_fetch(a) -> np.ndarray:
    """``device_get`` that also works in multi-process (DCN) runs, where
    a P(axis)-sharded array spans non-addressable devices: fall back to
    ``process_allgather`` (every process then holds the global value)."""
    try:
        return np.asarray(jax.device_get(a))
    except RuntimeError:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))


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
    halo_send: Optional[object] = None  # (D, D, S)
    halo_counts: Optional[object] = None  # (D, D)
    halo_map: Optional[object] = None  # (D, C)

    order = 2

    @property
    def shape(self) -> Tuple[int, int]:
        return self._shape

    @property
    def nnz(self) -> int:
        return int(_host_fetch(self.nnz_local).sum())

    @property
    def n_shards(self) -> int:
        return int(self.indptr.shape[0])

    @property
    def rows_per_shard(self) -> int:
        return int(self.indptr.shape[1]) - 1

    @property
    def axis(self) -> str:
        return self._axis

    @property
    def has_halo(self) -> bool:
        return self.halo_send is not None

    @property
    def halo_width(self) -> int:
        """S: padded per-pair halo list length."""
        return 0 if self.halo_send is None else int(self.halo_send.shape[2])

    @property
    def halo_bytes_per_exchange(self) -> int:
        """True payload bytes moved by one halo value exchange (4-byte
        elements), summed over all shard pairs — the comm-volume counter:
        proportional to the partition boundary, not to n."""
        if self.halo_counts is None:
            return 0
        return 4 * int(_host_fetch(self.halo_counts).sum())

    # -- construction --------------------------------------------------------
    @staticmethod
    def from_csr(csr: CSR, mesh: Mesh, axis: str = "x", halo: bool = True) -> "ShardedCSR":
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
        hs = hc = hm = None
        if halo:
            hs, hc, hm = _build_halo(li, shard_nnz.astype(np.int64), rows, d)
        sharding = NamedSharding(mesh, PartitionSpec(axis))
        put = lambda a: jax.device_put(a, sharding)
        return ShardedCSR(
            put(lp),
            put(li),
            None if lv is None else put(lv),
            put(shard_nnz.astype(np.int32)),
            (n, m),
            axis,
            None if hs is None else put(hs),
            None if hc is None else put(hc),
            None if hm is None else put(hm),
        )

    @staticmethod
    def from_csr_balanced(
        csr: CSR, mesh: Mesh, axis: str = "x", halo: bool = True
    ):
        """Partition with **nnz-balanced** row blocks (VERDICT r2 item 3 /
        SURVEY §7 hard part 5): rows are first relabeled by a serpentine
        degree deal — sort rows by degree descending, deal them
        boustrophedon over the d blocks — so every equal-row block
        carries near-equal nnz (LPT-style bound: max block ≤ mean +
        O(max_deg)) and the padded width no longer follows the worst
        shard on row-skewed graphs.

        Design note: the balancing is a *layout permutation* (this
        library's own first-class abstraction) rather than variable
        block boundaries — a symmetric relabel composes with every
        sharded kernel unchanged, while data-dependent boundaries would
        bifurcate the address math (owner = row // rows) in every halo /
        ring / 2-D kernel and the conversion graph.

        Returns ``(sharded, order)`` where ``order[old] = new`` is the
        applied relabeling (also the map back: a result ``r`` about new
        vertex ids reads ``r[order]`` in old ids)."""
        from ..bases import ReorderBase

        csr = csr.to_host()
        order = balanced_row_order(csr, mesh.shape[axis])
        permuted = ReorderBase.permute2d(order, csr)
        return ShardedCSR.from_csr(permuted, mesh, axis=axis, halo=halo), order

    def padded_width_ratio(self) -> float:
        """Padded memory overhead: d·width / true nnz (1.0 = perfectly
        nnz-balanced row blocks)."""
        total = max(self.nnz, 1)
        return self.n_shards * int(self.indices.shape[1]) / total

    def with_halo(self) -> "ShardedCSR":
        """Compute halo metadata for an existing ShardedCSR.

        Runs **on the mesh** (VERDICT r2 item 2): per-shard sort of the
        local column ids, run-head dedup, owner bucketing, and one
        ``all_to_all`` of the request lists — the indices never touch
        host numpy (round 2's host pass looped over all d² shard pairs
        with ``np.unique``, materializing every index on one host). The
        host builder (:func:`_build_halo`) remains the oracle for
        ``from_csr`` and the fuzz tests."""
        if self.has_halo:
            return self
        sharding = getattr(self.indices, "sharding", None)
        if sharding is None or not hasattr(sharding, "mesh"):
            # host-resident container (tests build these directly)
            li = np.asarray(jax.device_get(self.indices))
            nnz_local = np.asarray(jax.device_get(self.nnz_local)).astype(np.int64)
            hs, hc, hm = _build_halo(li, nnz_local, self.rows_per_shard, self.n_shards)
            return dataclasses.replace(self, halo_send=hs, halo_counts=hc, halo_map=hm)
        mesh = sharding.mesh
        d, rows = self.n_shards, self.rows_per_shard
        width = int(self.indices.shape[1])
        counts = _halo_counts_runner(mesh, self._axis, d, rows, width)(
            self.indices, self.nnz_local
        )
        s = max(int(_host_fetch(counts).max()), 1)  # (d,d) scalars only
        hs, hm = _halo_build_runner(mesh, self._axis, d, rows, width, s)(
            self.indices, self.nnz_local
        )
        put = lambda a: jax.device_put(a, sharding)
        # halo_counts[o, r] = reader r's request count to owner o
        hc = jnp.swapaxes(counts, 0, 1)
        return dataclasses.replace(
            self, halo_send=put(hs), halo_counts=put(hc), halo_map=put(hm)
        )

    @staticmethod
    def from_coo_sharded(
        row,
        col,
        vals,
        shape: Tuple[int, int],
        mesh: Mesh,
        axis: str = "x",
        route_capacity: Optional[int] = None,
    ) -> "ShardedCSR":
        """Distributed COO→CSR ingest: the entries start sharded over the
        mesh in arbitrary order and are routed to their row-block owners
        with one ``all_to_all``, then sorted and converted locally — no
        single host ever materializes the matrix (SURVEY.md §7 phase 5;
        the distributed analogue of CooCsrFunctionConditional,
        reference: src/sparsebase/converter/converter_order_two.cc:163-214).

        ``route_capacity`` is the static per-(src,dst) bucket size (the
        price of SPMD static shapes). By default it is **auto-sized with
        a count-then-route two-pass** (VERDICT r2 item 8): a cheap
        counting pass computes the true max per-(src,dst) load, its
        pmax'd scalar (pow2-rounded, so recompiles stay bounded) sizes
        the routing buffer — typically ~e/d instead of round 2's
        worst-case ``e`` (d× smaller). Overflow is still detected and
        raised for explicit capacities. Halo metadata is not built here —
        call :meth:`with_halo` (device pass) when the halo kernels are
        needed.
        """
        from jax import shard_map

        n, m = shape
        d = mesh.shape[axis]
        rows = -(-n // d)
        nnz = int(row.shape[0])
        e = -(-nnz // d)  # entries per shard (input padding below)
        if route_capacity:
            cap = int(route_capacity)
        else:
            # pass 1: count — per-shard per-owner histogram, pmax'd max
            counts_fn = _route_counts_runner(mesh, axis, d, rows, e, n)
            pad0 = d * e - nnz
            rowp0 = jnp.concatenate(
                [jnp.asarray(row, jnp.int32), jnp.full((pad0,), n, jnp.int32)]
            )
            mx = int(_host_fetch(counts_fn(rowp0)).reshape(-1)[0])
            cap = max(64, 1 << (max(mx, 1) - 1).bit_length())

        # pad the flat COO to d*e with sentinel rows (= n → routed to the
        # last shard's pad space and dropped by the sort/count masks)
        pad = d * e - nnz
        idt = jnp.int32
        rowp = jnp.concatenate([jnp.asarray(row, idt), jnp.full((pad,), n, idt)])
        colp = jnp.concatenate([jnp.asarray(col, idt), jnp.zeros((pad,), idt)])
        has_vals = vals is not None
        if has_vals:
            valp = jnp.concatenate(
                [jnp.asarray(vals), jnp.zeros((pad,), jnp.asarray(vals).dtype)]
            )
        else:
            valp = jnp.zeros((d * e,), jnp.float32)

        def body(rowl, coll, vall):
            # local entries: (e,) each. Owner of entry = row // rows.
            owner = jnp.minimum(rowl // rows, d - 1)
            srt = jax.lax.sort((owner, rowl, coll, vall), num_keys=2, is_stable=False)
            owner_s, row_s, col_s, val_s = srt
            # bucket-local position = k - start(owner run); run starts via
            # cummax of marked head positions (streaming, no extra sort)
            pos = jnp.arange(e, dtype=idt)
            head = jnp.concatenate(
                [jnp.ones((1,), bool), owner_s[1:] != owner_s[:-1]]
            )
            run_start = jax.lax.cummax(jnp.where(head, pos, -1))
            slot = pos - run_start
            overflow_local = jnp.sum((slot >= cap).astype(jnp.int32))
            dst = owner_s * cap + jnp.minimum(slot, cap - 1)
            sentinel = row_s >= n
            send_r = jnp.full((d * cap,), n, idt).at[dst].set(
                jnp.where(sentinel, n, row_s), mode="drop"
            )
            send_c = jnp.zeros((d * cap,), idt).at[dst].set(col_s, mode="drop")
            send_v = jnp.zeros((d * cap,), valp.dtype).at[dst].set(val_s, mode="drop")
            # route: piece o goes to shard o
            a2a = lambda x: jax.lax.all_to_all(
                x.reshape(d, cap), axis, split_axis=0, concat_axis=0
            ).reshape(-1)
            recv_r, recv_c, recv_v = a2a(send_r), a2a(send_c), a2a(send_v)
            # local sort by (row, col); pad slots (row == n) sort last
            rr, cc, vv = jax.lax.sort(
                (recv_r, recv_c, recv_v), num_keys=2, is_stable=False
            )
            shard_id = jax.lax.axis_index(axis)
            base = shard_id * rows
            cnt = jnp.sum((rr < n).astype(jnp.int32))
            # local indptr: boundary scatter over local rows
            lr = jnp.where(rr < n, rr - base, rows)
            marks = jnp.zeros((rows,), idt).at[lr].add(1, mode="drop")
            ip = jnp.concatenate([jnp.zeros((1,), idt), jnp.cumsum(marks)])
            overflow = jax.lax.psum(overflow_local, axis)
            return ip[None], rr[None], cc[None], vv[None], cnt[None], overflow[None]

        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(PartitionSpec(axis),) * 3,
            out_specs=(PartitionSpec(axis),) * 6,
        )
        ip, rr, cc, vv, cnt, overflow = fn(rowp, colp, valp)
        if int(_host_fetch(overflow).reshape(-1)[0]) > 0:
            raise ValueError(
                "from_coo_sharded: routing bucket overflow — raise route_capacity "
                f"(cap={cap})"
            )
        # post-route compaction (round 5): the routed buffer is d·cap wide
        # per shard — when a source shard's entries concentrate on ONE
        # owner (cap ≈ e), that is a d× width inflation over the true
        # load. Left uncompacted this COMPOUNDS under repeated resharding
        # (the multilevel coarsen ladder grew ~d× wider per level —
        # 20-50 GB buffers by level 4 on the weak-scaling stencil). The
        # local sort puts real entries first (pad rows sort as n), so
        # compaction is one static column slice at pow2(max true load).
        wmax = int(np.max(_host_fetch(cnt)))
        w_c = max(64, 1 << (max(wmax, 1) - 1).bit_length())
        if w_c < rr.shape[1]:
            rr = rr[:, :w_c]
            cc = cc[:, :w_c]
            vv = vv[:, :w_c]
        # reshard onto the caller's mesh/axis name
        sharding = NamedSharding(mesh, PartitionSpec(axis))
        put = lambda a: jax.device_put(a, sharding)
        return ShardedCSR(
            put(ip),
            put(jnp.where(rr < n, cc, 0)),
            put(vv) if has_vals else None,
            put(cnt.astype(jnp.int32)),
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
            if hi <= lo:
                continue  # shard entirely past n (small matrices on big meshes)
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
            f"rows/shard={self.rows_per_shard}, width={self.indices.shape[1]}, "
            f"halo={'S=%d' % self.halo_width if self.has_halo else 'none'})"
        )


def balanced_row_order(csr: CSR, d: int) -> np.ndarray:
    """Serpentine degree deal: inverse permutation ``order[old] = new``
    under which contiguous equal-row blocks of ``ceil(n/d)`` rows carry
    near-equal nnz. Rows sorted by degree descending are dealt
    boustrophedon (0..d-1, d-1..0, ...) so heavy rows spread evenly and
    each block receives the same row count; within a block, dealt order
    is kept (heaviest first)."""
    csr = csr.to_host()
    n = csr.nrows
    if n == 0:
        return np.empty(0, np.int64)
    deg = np.diff(np.asarray(csr.indptr)).astype(np.int64)
    by_deg = np.argsort(-deg, kind="stable")  # heavy first
    rows = -(-n // d)
    # The physical shard boundaries are fixed multiples of ceil(n/d)
    # (ShardedCSR pads only the LAST shard), so the deal must hand out
    # exactly `rows` rows to each block before the tail block B = n//rows
    # (which gets the remaining c_B = n - B*rows). Deal serpentine in two
    # phases: rounds 0..c_B-1 over blocks 0..B (the tail block takes the
    # heaviest rounds, so the short shard is under- not over-loaded),
    # then rounds c_B..rows-1 over blocks 0..B-1. Positions block*rows +
    # round then tile 0..n-1 exactly — no compaction, so dealt blocks
    # coincide with physical shards even when n % d != 0.
    B = n // rows
    c_tail = n - B * rows
    idx = np.arange(n, dtype=np.int64)
    p1 = c_tail * (B + 1)  # entries dealt in phase 1
    in1 = idx < p1
    w = np.where(in1, B + 1, max(B, 1))  # round width per entry
    off = np.where(in1, idx, idx - p1)
    round_i = np.where(in1, off // (B + 1), c_tail + off // max(B, 1))
    pos = off % w
    fwd = (round_i % 2) == 0
    blocks = np.where(fwd, pos, w - 1 - pos)
    order = np.empty(n, np.int64)
    order[by_deg] = blocks * rows + round_i
    return order


@functools.lru_cache(maxsize=None)
def _route_counts_runner(mesh, axis, d, rows, e, n):
    """Counting pass for :meth:`ShardedCSR.from_coo_sharded`'s two-pass
    routing: max per-(src shard, owner) entry count over the whole mesh
    (one pmax scalar). Sentinel rows (= n, input padding) count toward
    their landing bucket so the sized capacity always fits them too."""
    from jax import shard_map

    def body(rowl):
        owner = jnp.minimum(rowl // rows, d - 1)
        hist = jax.ops.segment_sum(
            jnp.ones((e,), jnp.int32), owner, num_segments=d
        )
        return jax.lax.pmax(jnp.max(hist), axis)[None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(PartitionSpec(axis),), out_specs=PartitionSpec()
    )
    return jax.jit(fn)


def _halo_locals(indices_l, cnt, rows, d, width, my):
    """Shared device pass: sort local column ids, mark unique-remote run
    heads, bucket by owner. Returns (sorted cols, sorted original
    positions, valid mask, owner, unique-remote mask, per-lane remote
    rank, per-owner unique counts)."""
    big = jnp.iinfo(jnp.int32).max
    pos = jnp.arange(width, dtype=jnp.int32)
    valid = pos < cnt
    key = jnp.where(valid, indices_l, big)
    cs, ps = jax.lax.sort((key, pos), num_keys=1, is_stable=False)
    valid_s = cs < big
    head = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), cs[1:] != cs[:-1]]
    )
    owner = jnp.minimum(
        jnp.where(valid_s, cs, 0) // max(rows, 1), d - 1
    ).astype(jnp.int32)
    uniq_remote = head & (owner != my)
    # rank among unique-remote lanes; constant across a duplicate run
    rank = jnp.cumsum(uniq_remote.astype(jnp.int32)) - 1
    c_o = jax.ops.segment_sum(
        uniq_remote.astype(jnp.int32), owner, num_segments=d
    )
    return cs, ps, valid_s, owner, uniq_remote, rank, c_o


@functools.lru_cache(maxsize=None)
def _halo_counts_runner(mesh, axis, d, rows, width):
    """Pass 1 (local only): per-(reader, owner) unique-remote counts."""
    from jax import shard_map

    def body(indices, nnz_local):
        my = jax.lax.axis_index(axis)
        *_, c_o = _halo_locals(indices[0], nnz_local[0], rows, d, width, my)
        return c_o[None]

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(PartitionSpec(axis), PartitionSpec(axis)),
        out_specs=PartitionSpec(axis),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _halo_build_runner(mesh, axis, d, rows, width, s):
    """Pass 2 (one all_to_all of request lists): build halo_send and
    halo_map on the mesh, given the padded per-pair list length ``s``."""
    from jax import shard_map

    def body(indices, nnz_local):
        my = jax.lax.axis_index(axis)
        cs, ps, valid_s, owner, uniq_remote, rank, c_o = _halo_locals(
            indices[0], nnz_local[0], rows, d, width, my
        )
        group_base = jnp.cumsum(c_o) - c_o  # exclusive scan
        pos_in_owner = rank - group_base[owner]
        # request lists: req[o, j] = j-th unique remote vertex owned by o
        # (owner-local id); pad slots stay 0 (row 0, harmless)
        dst = jnp.where(uniq_remote, owner * s + pos_in_owner, d * s)
        req = jnp.zeros((d * s,), jnp.int32).at[dst].set(
            cs - owner * rows, mode="drop"
        )
        halo_send_l = jax.lax.all_to_all(
            req.reshape(d, s), axis, split_axis=0, concat_axis=0
        )  # (d_reader, s) requests TO me
        # extended index per sorted lane: local -> cs - my*rows, remote ->
        # rows + owner*s + pos_in_owner (duplicates inherit via the
        # run-constant cumsum rank)
        ext = jnp.where(
            owner == my, cs - my * rows, rows + owner * s + pos_in_owner
        )
        ext = jnp.where(valid_s, ext, 0).astype(jnp.int32)
        halo_map_l = jnp.zeros((width,), jnp.int32).at[ps].set(ext)
        return halo_send_l[None], halo_map_l[None]

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(PartitionSpec(axis), PartitionSpec(axis)),
        out_specs=(PartitionSpec(axis), PartitionSpec(axis)),
    )
    return jax.jit(fn)


def _build_halo(li: np.ndarray, nnz_local: np.ndarray, rows: int, d: int):
    """Host pass: per-(owner, reader) sorted unique remote vertices.

    Returns (halo_send (d,d,S), halo_counts (d,d), halo_map (d,C))."""
    width = li.shape[1]
    lists = [[np.zeros(0, np.int64)] * d for _ in range(d)]  # [owner][reader]
    counts = np.zeros((d, d), np.int32)
    for r in range(d):
        cnt = int(nnz_local[r])
        u = np.unique(li[r, :cnt].astype(np.int64))
        owner = np.minimum(u // rows, d - 1)
        for o in range(d):
            if o == r:
                continue
            lst = u[owner == o]
            lists[o][r] = lst
            counts[o, r] = len(lst)
    s = max(int(counts.max()), 1)
    halo_send = np.zeros((d, d, s), np.int32)
    for o in range(d):
        for r in range(d):
            lst = lists[o][r]
            halo_send[o, r, : len(lst)] = (lst - o * rows).astype(np.int32)
    # per-nnz extended index: local col → col - r*rows; remote → R + o*s + pos
    halo_map = np.zeros((d, width), np.int32)
    for r in range(d):
        cnt = int(nnz_local[r])
        c = li[r, :cnt].astype(np.int64)
        o = np.minimum(c // rows, d - 1)
        local = o == r
        hm = np.empty(cnt, np.int64)
        hm[local] = c[local] - r * rows
        for oo in range(d):
            sel = (~local) & (o == oo)
            if not sel.any():
                continue
            pos = np.searchsorted(lists[oo][r], c[sel])
            hm[sel] = rows + oo * s + pos
        halo_map[r, :cnt] = hm.astype(np.int32)
    return halo_send, counts, halo_map

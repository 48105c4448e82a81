"""Halo-exchange distributed kernels: boundary-proportional communication.

The kernels in :mod:`.dist` exchange dense ``(n,)`` vectors with ``psum``
— correct, but the communication volume is O(n * D) per step regardless
of the partition quality. This module is the scalable path (VERDICT.md
round-1 item 2; SURVEY.md §2.13 "frontier BFS with halo exchange"): each
shard ships only the vertex values its neighbors actually read, using the
precomputed halo lists on :class:`~.sharded.ShardedCSR`
(``halo_send/halo_counts/halo_map``) and one ``jax.lax.all_to_all`` per
step. Per-step communication is ``sum(halo_counts) * itemsize`` bytes —
proportional to the partition boundary, not to n (see
:func:`step_comm_bytes` and ``tests/test_halo.py``'s HLO assertion).

Kernels (all equivalent to their dense :mod:`.dist` counterparts, which
the tests verify):

* :func:`spmv` — row-sharded SpMV with sharded x and halo gather
* :func:`bfs_levels` — push-style level-synchronous BFS; marks on remote
  out-neighbors ride the reverse halo all_to_all back to their owners
* :func:`label_prop_partition` — sharded labels; per-iteration halo
  exchange of neighbor labels + a ``psum`` of the (k,) part sizes
* :func:`rcm_reorder` — distributed RCM: pseudo-peripheral root search
  (repeated halo BFS, min-degree last-level vertex — the recipe of the
  reference's host RCM, reorder/rcm_reorder.cc:22-81, recast
  level-synchronous per Azad & Buluç) + a **distributed counting rank**
  over (level, degree-bucket) histograms — comm is O(D · buckets),
  independent of n, replacing round 1's replicated global lexsort.
* :func:`edge_cut` / :func:`refine_partition` — sharded-label cut and
  boundary refinement; mover admission is exact top-headroom per part
  via psum'd gain-bucket histograms (O(D·k·G) comm, no replicated sort).
* :func:`connected_components` — min-label hooking over an optional
  alive-mask induced subgraph; one halo all_to_all per round.
* :func:`slashburn_reorder` — distributed SlashBurn: hub selection via
  psum'd degree-histogram counting ranks, spokes via
  :func:`connected_components`; exact host-order parity (non-greedy).
* :func:`heavy_edge_matching` / :func:`coarsen` /
  :func:`multilevel_partition` — distributed multilevel machinery:
  handshake matching (randomized tie-breaks), graph contraction with
  all_to_all owner routing, and the full V-cycle partitioner.

Compiled runners are cached per (mesh, static shapes) so repeated calls
— experiment loops, scaling sweeps — pay tracing/compilation once.

The reference has no distributed layer at all (its only inter-device
path is a CUDA P2P memcpy, converter/converter_cuda.cu:12-22); this
module is north-star work on top of parity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from .sharded import ShardedCSR


def _require_halo(sh: ShardedCSR):
    if not sh.has_halo:
        raise ValueError(
            "this kernel needs halo metadata — build the ShardedCSR with "
            "halo=True or call .with_halo()"
        )


def _local_row_of(indptr_local, width):
    """Row id (local) of every nnz slot — scatter markers + prefix sum."""
    marks = jnp.zeros((width,), jnp.int32).at[indptr_local[:-1]].add(1, mode="drop")
    return jnp.cumsum(marks) - 1


def _exchange(x_local, halo_send_l, axis):
    """One halo exchange: returns the extended local vector
    ``[R local values | D*S received halo values]`` whose slots match
    ``halo_map`` (sharded.py layout: slot of (owner o, j) = R + o*S + j).

    ``x_local`` (R,), ``halo_send_l`` (D, S) owner-local ids per reader.
    Communication: one all_to_all of (D, S) values.
    """
    send = x_local[halo_send_l]  # (D, S): row r = values this owner ships to reader r
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    return jnp.concatenate([x_local, recv.reshape(-1)])


def step_comm_bytes(sh: ShardedCSR, itemsize: int = 4) -> int:
    """True payload bytes one halo exchange moves (comm-volume counter):
    proportional to the partition boundary, not n."""
    _require_halo(sh)
    return itemsize * int(np.asarray(jax.device_get(sh.halo_counts)).sum())


def _pad_vec(x, d, rows, n, fill=0):
    xp = jnp.pad(jnp.asarray(x), (0, d * rows - n), constant_values=fill)
    return xp.reshape(d, rows)


def _statics(sh: ShardedCSR):
    return (sh.axis, sh.shape[0], sh.n_shards, sh.rows_per_shard,
            sh.indices.shape[1], sh.halo_width)


# --------------------------------------------------------------------------
# SpMV
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _spmv_runner(mesh, axis, n, d, rows, width, halo_s):
    def body(indptr, vals, nnz_local, halo_send, halo_map, xx):
        ip, v, cnt = indptr[0], vals[0], nnz_local[0]
        ext = _exchange(xx[0], halo_send[0], axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        prod = jnp.where(valid, v * ext[halo_map[0]], 0)
        return jax.ops.segment_sum(prod, lrow, num_segments=rows)[None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis),) * 6, out_specs=P(axis)
    )
    return jax.jit(fn)


def spmv(sh: ShardedCSR, x, mesh: Mesh):
    """y = A @ x with A row-sharded and x *sharded* (not replicated):
    remote x entries arrive via the halo all_to_all."""
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)
    f = _spmv_runner(mesh, axis, n, d, rows, width, halo_s)
    vals = sh.vals if sh.vals is not None else jnp.ones(sh.indices.shape, jnp.float32)
    y = f(sh.indptr, vals, sh.nnz_local, sh.halo_send, sh.halo_map,
          _pad_vec(x, d, rows, n))
    return y.reshape(-1)[:n]


# --------------------------------------------------------------------------
# BFS
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _bfs_runner(mesh, axis, n, d, rows, width, halo_s, iters):
    def step(indptr, nnz_local, halo_send, halo_map, frontier):
        # push-style (same edge direction as dist.bfs_levels): active local
        # rows mark their out-neighbors; marks on remote vertices ride the
        # *reverse* halo all_to_all back to the owners.
        ip, cnt, hs = indptr[0], nnz_local[0], halo_send[0]
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        active = valid & frontier[0][lrow]
        ext = (
            jnp.zeros((rows + d * halo_s,), jnp.int8)
            .at[halo_map[0]]
            .max(active.astype(jnp.int8), mode="drop")
        )
        send = ext[rows:].reshape(d, halo_s)  # piece o = marks on owner o's verts
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
        # recv[r, j] = reader r's mark on my local row hs[r, j]
        reached = ext[:rows].at[hs.reshape(-1)].max(recv.reshape(-1), mode="drop")
        return (reached > 0)[None]

    step_fn = shard_map(
        step, mesh=mesh, in_specs=(P(axis),) * 5, out_specs=P(axis)
    )
    gids = jnp.arange(d * rows, dtype=jnp.int32).reshape(d, rows)

    @jax.jit
    def run(indptr, nnz_local, halo_send, halo_map, root):
        levels0 = jnp.where(gids == root, 0, -1).astype(jnp.int32)
        frontier0 = gids == root

        def cond(state):
            _, frontier, it = state
            return jnp.any(frontier) & (it < iters)

        def body(state):
            levels, frontier, it = state
            reached = step_fn(indptr, nnz_local, halo_send, halo_map, frontier)
            nxt = reached & (levels < 0)
            levels = jnp.where(nxt, it + 1, levels)
            return levels, nxt, it + 1

        levels, _, it = jax.lax.while_loop(
            cond, body, (levels0, frontier0, jnp.int32(0))
        )
        return levels, it

    return run


def _bfs_sharded(sh: ShardedCSR, root, mesh: Mesh, max_iters: Optional[int] = None):
    """Sharded BFS core: returns (levels (d, rows) int32, num_levels)."""
    axis, n, d, rows, width, halo_s = _statics(sh)
    run = _bfs_runner(mesh, axis, n, d, rows, width, halo_s, max_iters or n)
    return run(sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map,
               jnp.asarray(root, jnp.int32))


def bfs_levels(sh: ShardedCSR, root, mesh: Mesh, max_iters: Optional[int] = None):
    """Push-style level-synchronous BFS; frontier and levels stay sharded,
    each step exchanges only halo frontier marks. Returns (n,) levels
    (-1 = unreached). ``root`` may be a traced scalar."""
    _require_halo(sh)
    n = sh.shape[0]
    levels, _ = _bfs_sharded(sh, root, mesh, max_iters)
    return levels.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Label propagation
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _labelprop_runner(mesh, axis, n, d, rows, width, halo_s, k, num_iters, cap):
    def step(indptr, nnz_local, halo_send, halo_map, labels, vw, it):
        ip, cnt = indptr[0], nnz_local[0]
        lab_l = labels[0]
        ext = _exchange(lab_l, halo_send[0], axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        counts = (
            jnp.zeros((rows, k), jnp.float32)
            .at[lrow, ext[halo_map[0]]]
            .add(valid.astype(jnp.float32), mode="drop")
        )
        shard_id = jax.lax.axis_index(axis)
        grows = shard_id * rows + jnp.arange(rows)
        in_range = grows < n
        local_sizes = jnp.zeros((k,), jnp.float32).at[lab_l].add(
            jnp.where(in_range, vw[0], 0.0), mode="drop"
        )
        sizes = jax.lax.psum(local_sizes, axis)
        # PULP-style multiplicative balance weight: a part at capacity
        # scores 0 (pulp's vertex-balance degradation), so moves flow to
        # under-capacity parts; synchronous oscillation is broken by
        # (a) strict-improvement moves and (b) alternating half-updates
        weight = jnp.maximum(1.0 - sizes / cap, 0.0)
        scores = counts * weight[None, :]
        cur_score = jnp.take_along_axis(scores, lab_l[:, None].astype(jnp.int32), 1)[:, 0]
        best = jnp.argmax(scores, axis=1).astype(jnp.int32)
        best_score = jnp.max(scores, axis=1)
        active = ((grows + it) % 2 == 0) & ((ip[1:] - ip[:-1]) > 0)
        # a part must never empty — LP and refinement can only grow parts
        # that exist in some neighborhood, so an emptied part is stuck
        # empty forever (matters on coarse multilevel graphs)
        keeps_alive = sizes[jnp.clip(lab_l, 0, k - 1)] - vw[0] > 1e-6
        move = active & keeps_alive & (best_score > cur_score * 1.000001 + 1e-6)
        return jnp.where(move, best, lab_l)[None]

    step_fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis),) * 4 + (P(axis), P(axis), P()),
        out_specs=P(axis),
    )

    @jax.jit
    def run(indptr, nnz_local, halo_send, halo_map, vw):
        labels0 = ((jnp.arange(d * rows, dtype=jnp.int32) * k) // max(n, 1)).reshape(
            d, rows
        )
        labels0 = jnp.minimum(labels0, k - 1)

        def body(i, labels):
            return step_fn(indptr, nnz_local, halo_send, halo_map, labels, vw, i)

        return jax.lax.fori_loop(0, num_iters, body, labels0)

    return run


def label_prop_partition(
    sh: ShardedCSR,
    k: int,
    mesh: Mesh,
    num_iters: int = 10,
    balance: float = 1.1,
    vertex_weights=None,
):
    """Size-constrained label propagation with **sharded** labels: each
    iteration exchanges only halo neighbor labels (all_to_all) plus a
    (k,) psum of part sizes. ``vertex_weights`` (n,) switches the balance
    constraint from vertex counts to weight sums (multilevel coarse
    levels, PULP's vertex-weight mode)."""
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)
    if vertex_weights is None:
        total = float(n)
        vw = jnp.ones((n,), jnp.float32)
    else:
        vw = jnp.asarray(vertex_weights, jnp.float32)
        total = float(np.asarray(jax.device_get(jnp.sum(vw))))
    cap = balance * total / k
    run = _labelprop_runner(
        mesh, axis, n, d, rows, width, halo_s, int(k), int(num_iters), cap
    )
    labels = run(sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map,
                 _pad_vec(vw, d, rows, n))
    return labels.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Connected components
# --------------------------------------------------------------------------
_BIG = np.iinfo(np.int32).max


@functools.lru_cache(maxsize=None)
def _cc_runner(mesh, axis, n, d, rows, width, halo_s, iters):
    big = jnp.int32(_BIG)

    def step(indptr, nnz_local, halo_send, halo_map, labels, alive):
        ip, cnt, hs = indptr[0], nnz_local[0], halo_send[0]
        lab_l, alive_l = labels[0], alive[0]
        masked = jnp.where(alive_l, lab_l, big)  # dead verts never hook
        ext = _exchange(masked, hs, axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        nbr = jnp.where(valid, ext[halo_map[0]], big)
        nbr_min = jnp.full((rows,), big, jnp.int32).at[lrow].min(nbr, mode="drop")
        return jnp.where(alive_l, jnp.minimum(masked, nbr_min), big)[None]

    step_fn = shard_map(
        step, mesh=mesh, in_specs=(P(axis),) * 6, out_specs=P(axis)
    )
    gids = jnp.arange(d * rows, dtype=jnp.int32).reshape(d, rows)

    @jax.jit
    def run(indptr, nnz_local, halo_send, halo_map, alive):
        labels0 = jnp.where(alive, gids, big)

        def cond(state):
            _, changed, it = state
            return changed & (it < iters)

        def jump(lab):
            # pointer jumping (shortcutting): labels are global vertex
            # ids, so lab[lab] hops straight to the label of the
            # labelling vertex — the min-label fixpoint is unchanged
            # (the component-min vertex labels itself). One all_gather
            # of the (n,) int32 labels per jump — 4n bytes, cheap next
            # to the halo exchange.
            flat = lab.reshape(-1)
            hop = flat[jnp.minimum(flat, d * rows - 1)]
            return jnp.where(flat == big, big, hop).reshape(d, rows)

        def compress(lab):
            # full path compression after every hook round (FastSV
            # style): jump to the label-graph fixpoint before the next
            # halo exchange. Jumps are gather-only (no halo), so running
            # them to convergence costs O(log depth) all_gathers and
            # collapses hook rounds from O(diameter) to ~O(log n) — on
            # the DISTSCALE zipf graph this took per-round CC from a
            # degrading 0.1→1.3 s (≈75 hook iters late in SlashBurn) to
            # flat ~30 ms (round 5; VERDICT r4 weak #2).
            def jcond(s):
                return s[1]

            def jbody(s):
                l, _ = s
                nl = jump(l)
                return nl, jnp.any(nl != l)

            lab, _ = jax.lax.while_loop(jcond, jbody, (lab, jnp.bool_(True)))
            return lab

        def body(state):
            labels, _, it = state
            new = step_fn(indptr, nnz_local, halo_send, halo_map, labels, alive)
            # grandparent hooking (FastSV): push each vertex's
            # neighbor-min to its *label vertex* with a scatter-min, so
            # a basin root learns the smallest label crossing ANY of its
            # basin's boundary edges in one round instead of waiting for
            # it to walk there hop by hop. Contributions are component
            # member ids, so the min-label fixpoint is unchanged.
            nf = new.reshape(-1)
            lf = labels.reshape(-1)
            tgt = jnp.minimum(lf, d * rows - 1)
            contrib = jnp.where(lf == big, big, nf)
            upd = lf.at[tgt].min(contrib)
            new = compress(jnp.minimum(nf, upd).reshape(d, rows))
            return new, jnp.any(new != labels), it + 1

        labels, _, _ = jax.lax.while_loop(
            cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
        )
        return labels

    return run


def connected_components(sh: ShardedCSR, mesh: Mesh, alive=None,
                         max_iters: Optional[int] = None):
    """Distributed connected-component labels: ``labels[v]`` = minimum
    vertex id in v's component (min-label hooking, one halo ``all_to_all``
    per round, O(diameter) rounds with early exit).

    Assumes a symmetric adjacency, like the reference's CC pass inside
    SlashBurn (reference: src/sparsebase/reorder/slashburn_reorder.cc —
    its ``FindCC`` BFS over an undirected graph). ``alive`` optionally
    restricts to the induced subgraph of a (n,) bool mask; masked-out
    vertices get label -1 (the reference removes hub rows the same way).
    """
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)
    iters = int(max_iters) if max_iters is not None else n
    run = _cc_runner(mesh, axis, n, d, rows, width, halo_s, iters)
    if alive is None:
        alive_p = _pad_vec(np.ones((n,), np.bool_), d, rows, n, fill=False)
    else:
        alive_p = _pad_vec(np.asarray(alive, np.bool_), d, rows, n, fill=False)
    labels = run(sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map,
                 jnp.asarray(alive_p))
    labels = labels.reshape(-1)[:n]
    return jnp.where(labels == _BIG, -1, labels)


# --------------------------------------------------------------------------
# RCM
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _counting_rank_runner(mesh, axis, n, d, rows, nb):
    """Distributed counting rank: global stable position of every row under
    its integer bucket key in [0, nb) — psum'd histogram + exclusive scan +
    per-shard offsets (all_gather of (D, nb) counts) + local stable rank.
    Comm O(D·nb), independent of n. Invalid rows rank as INT32_MAX."""
    big = jnp.iinfo(jnp.int32).max

    def body(bucket, valid):
        b = bucket[0]
        v = valid[0]
        shard_id = jax.lax.axis_index(axis)
        hist = jnp.zeros((nb,), jnp.int32).at[b].add(
            v.astype(jnp.int32), mode="drop"
        )
        gathered = jax.lax.all_gather(hist, axis)  # (D, nb)
        before = jnp.sum(
            jnp.where((jnp.arange(d) < shard_id)[:, None], gathered, 0), axis=0
        )
        ghist = jnp.sum(gathered, axis=0)
        goffset = jnp.cumsum(ghist) - ghist  # exclusive scan
        # local stable rank within bucket: sort (bucket, idx), positions
        # within runs via the cummax head trick
        idx = jnp.arange(rows, dtype=jnp.int32)
        b_s, i_s = jax.lax.sort((b, idx), num_keys=1, is_stable=True)
        pos = jnp.arange(rows, dtype=jnp.int32)
        head = jnp.concatenate([jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
        run_start = jax.lax.cummax(jnp.where(head, pos, -1))
        local_rank = jnp.zeros((rows,), jnp.int32).at[i_s].set(pos - run_start)
        cm_pos = goffset[b] + before[b] + local_rank
        return jnp.where(v, cm_pos, big)[None]

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis))
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _parent_bucket_runner(mesh, axis, n, d, rows, width, halo_s, pb_count):
    """Per-row parent bucket: minimum rank over BFS parents (neighbors one
    level up; two halo exchanges + a segment min), rebased to the parent
    level's start offset in rank space and clipped to [0, pb_count)."""
    big = jnp.iinfo(jnp.int32).max

    def body(indptr, nnz_local, halo_send, halo_map, lev, rank, level_start):
        ip, cnt, hs, hm = indptr[0], nnz_local[0], halo_send[0], halo_map[0]
        ext_lev = _exchange(lev[0], hs, axis)
        ext_rank = _exchange(rank[0], hs, axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        my_lev = lev[0][lrow]
        is_parent = valid & (ext_lev[hm] == my_lev - 1) & (my_lev > 0)
        cand = jnp.where(is_parent, ext_rank[hm], big)
        pmin = jnp.full((rows,), big, jnp.int32).at[lrow].min(cand, mode="drop")
        parent_lev = jnp.clip(lev[0] - 1, 0, level_start.shape[0] - 1)
        rel = pmin - level_start[parent_lev]
        return jnp.clip(rel, 0, pb_count - 1)[None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis),) * 6 + (P(),), out_specs=P(axis)
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _degrees_runner(mesh, axis):
    def body(indptr):
        return indptr[:, 1:] - indptr[:, :-1]

    return jax.jit(shard_map(body, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)))


@functools.lru_cache(maxsize=None)
def _min_degree_last_level_runner(mesh, axis, n, d, rows):
    big = jnp.iinfo(jnp.int32).max

    def body(indptr, levels):
        ip = indptr[0]
        lev = levels[0]
        dg = ip[1:] - ip[:-1]
        shard_id = jax.lax.axis_index(axis)
        grows = shard_id * rows + jnp.arange(rows, dtype=jnp.int32)
        valid = grows < n
        lev_max = jax.lax.pmax(jnp.max(jnp.where(valid, lev, -1)), axis)
        on_last = valid & (lev == lev_max)
        min_deg = jax.lax.pmin(jnp.min(jnp.where(on_last, dg, big)), axis)
        cand = on_last & (dg == min_deg)
        return jax.lax.pmin(jnp.min(jnp.where(cand, grows, big)), axis)

    return jax.jit(
        shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P())
    )


def rcm_reorder(
    sh: ShardedCSR,
    mesh: Mesh,
    root: int = 0,
    max_iters: Optional[int] = None,
    peripheral_iters: int = 2,
    deg_buckets: int = 64,
    parent_buckets: int = 256,
    refine_iters: Optional[int] = None,
    max_rank_levels: int = 1024,
    max_buckets: int = 1 << 22,
):
    """Distributed RCM with halo BFS + distributed counting rank.

    1. Pseudo-peripheral root: repeated BFS, each pass restarting from a
       minimum-degree vertex of the last level (the reference's
       PeripheralNode loop, reorder/rcm_reorder.cc:22-81).
    2. Rank vertices by (level, degree-bucket) via a psum'd histogram +
       exclusive scan: global offset of each bucket + this shard's offset
       within the bucket (all_gather of (D, buckets) counts) + the local
       stable rank. Communication is O(D · buckets), independent of n —
       no replicated n-length sort (round 1's weak spot, VERDICT item 6).
    3. ``refine_iters`` Azad-Buluç-style passes (default: one per BFS
       level, capped at 64 — ranks finalize level-by-level like a wave):
       each vertex takes the minimum current rank among its BFS parents
       (one halo exchange + segment min), rebased to its parent level's
       start offset so the bucket resolution covers the *level*, and is
       re-ranked by (level, parent-offset bucket, degree bucket) — the
       distributed analogue of the reference's per-parent priority-queue
       order (rcm_reorder.cc:125-144).
    4. Reverse the reached span (Cuthill-McKee → RCM); unreached
       components append after in (shard, id) order (matching
       dist.rcm_reorder).

    Returns the replicated inverse permutation ``order[old] = new``.
    """
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)

    # --- peripheral root search (each pass = one sharded BFS) ------------
    root = jnp.asarray(root, jnp.int32)
    peripheral = _min_degree_last_level_runner(mesh, axis, n, d, rows)
    levels = None
    for _ in range(max(peripheral_iters, 1)):
        levels, _ = _bfs_sharded(sh, root, mesh, max_iters)
        root = peripheral(sh.indptr, levels)
    levels, num_levels = _bfs_sharded(sh, root, mesh, max_iters)
    nl = int(np.asarray(num_levels))
    if refine_iters is None:
        refine_iters = min(nl, 64)

    # adaptive bucket budget: L tracks the real level count, and PB/B are
    # halved until the histogram fits max_buckets (comm = D·nb ints)
    L = min(int(max_rank_levels), nl + 1)
    B = int(deg_buckets)
    PB = int(parent_buckets)
    while (L + 1) * PB * B > int(max_buckets) and PB > 2:
        PB //= 2
    while (L + 1) * PB * B > int(max_buckets) and B > 2:
        B //= 2

    run = _rcm_rank_orchestrator(
        mesh, axis, n, d, rows, width, halo_s, L, B, PB,
        int(max(refine_iters, 0)),
    )
    order = run(sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map, levels)
    return order.reshape(-1)[:n]


@functools.lru_cache(maxsize=None)
def _rcm_rank_orchestrator(mesh, axis, n, d, rows, width, halo_s, L, B, PB, iters):
    parent_fn = _parent_bucket_runner(mesh, axis, n, d, rows, width, halo_s, PB)
    rank1_fn = _counting_rank_runner(mesh, axis, n, d, rows, (L + 1) * B)
    rank2_fn = _counting_rank_runner(mesh, axis, n, d, rows, (L + 1) * PB * B)

    @jax.jit
    def run(indptr, nnz_local, halo_send, halo_map, levels):
        deg = _degrees_runner(mesh, axis)(indptr)
        gids = jnp.arange(d * rows, dtype=jnp.int32).reshape(d, rows)
        valid = gids < n
        lev_c = jnp.where(levels < 0, L, jnp.minimum(levels, L - 1))
        db = jnp.minimum(deg, B - 1)
        rank = rank1_fn(lev_c * B + db, valid)
        # level start offsets in rank space (ranks are level-major): lets
        # the parent bucket resolve *within* the parent level
        lev_hist = jnp.zeros((L + 2,), jnp.int32).at[
            jnp.where(valid, lev_c, L + 1)
        ].add(1)
        level_start = (jnp.cumsum(lev_hist) - lev_hist).astype(jnp.int32)

        def body(_, rank):
            pb = parent_fn(indptr, nnz_local, halo_send, halo_map,
                           levels, rank, level_start)
            key2 = (lev_c * PB + pb) * B + db
            return rank2_fn(key2, valid)

        rank = jax.lax.fori_loop(0, iters, body, rank)
        reached_count = jnp.sum(valid & (levels >= 0)).astype(jnp.int32)
        return jnp.where(rank < reached_count, reached_count - 1 - rank, rank)

    return run


# --------------------------------------------------------------------------
# Edge cut + partition refinement (sharded labels)
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _edge_cut_runner(mesh, axis, n, d, rows, width, halo_s):
    def body(indptr, nnz_local, halo_send, halo_map, labels):
        ip, cnt = indptr[0], nnz_local[0]
        ext = _exchange(labels[0], halo_send[0], axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        crossing = valid & (labels[0][lrow] != ext[halo_map[0]])
        return jax.lax.psum(jnp.sum(crossing.astype(jnp.int32)), axis)

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis),) * 5, out_specs=P()
    )
    return jax.jit(fn)


def edge_cut(sh: ShardedCSR, labels, mesh: Mesh):
    """Directed edge cut with **sharded** labels: one halo exchange of
    neighbor labels + a scalar psum (vs dist.edge_cut's replicated (n,)
    labels)."""
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)
    f = _edge_cut_runner(mesh, axis, n, d, rows, width, halo_s)
    return f(sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map,
             _pad_vec(jnp.asarray(labels, jnp.int32), d, rows, n))


@functools.lru_cache(maxsize=None)
def _refine_runner(mesh, axis, n, d, rows, width, halo_s, k, rounds, cap, G):
    big = jnp.iinfo(jnp.int32).max

    def round_body(indptr, nnz_local, halo_send, halo_map, lab, vw):
        # lab: (1, rows) local labels; vw: (1, rows) vertex weights. One
        # halo exchange of labels feeds both the affinity counts and the
        # cut.
        ip, cnt = indptr[0], nnz_local[0]
        lab_l = lab[0]
        w_row = vw[0]
        ext = _exchange(lab_l, halo_send[0], axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        nb_lab = ext[halo_map[0]]
        counts = (
            jnp.zeros((rows, k), jnp.int32)
            .at[lrow, nb_lab]
            .add(valid.astype(jnp.int32), mode="drop")
        )
        shard_id = jax.lax.axis_index(axis)
        grows = shard_id * rows + jnp.arange(rows, dtype=jnp.int32)
        in_range = grows < n
        sizes = jax.lax.psum(
            jnp.zeros((k,), jnp.float32).at[lab_l].add(
                jnp.where(in_range, w_row, 0.0), mode="drop"
            ),
            axis,
        )
        headroom = jnp.maximum(cap - sizes, 0.0)
        cur_aff = jnp.take_along_axis(counts, lab_l[:, None].astype(jnp.int32), 1)[:, 0]
        full = sizes >= cap
        masked = jnp.where(full[None, :], -big, counts)
        masked = masked.at[jnp.arange(rows), lab_l].set(-big)
        best = jnp.argmax(masked, axis=1).astype(jnp.int32)
        gain = jnp.where(in_range, jnp.max(masked, axis=1) - cur_aff, -1)
        g = jnp.clip(gain, 0, G)  # bucketed positive gains; 0 = no move
        # never empty a part (see label_prop: an empty part is stuck)
        keeps_alive = sizes[jnp.clip(lab_l, 0, k - 1)] - w_row > 1e-6
        mover = in_range & keeps_alive & (gain > 0)

        # distributed exact top-headroom admission per part, in WEIGHT
        # units: weighted histograms over (part, gain bucket), all_gather
        # for shard offsets, a vertex's admission position = weight of
        # higher-gain movers + same-bucket movers on earlier shards +
        # local weighted prefix; admit while position + own weight fits
        bucket = jnp.where(mover, best * (G + 1) + g, k * (G + 1))
        whist = jnp.zeros((k * (G + 1) + 1,), jnp.float32).at[bucket].add(
            jnp.where(mover, w_row, 0.0), mode="drop"
        )[: k * (G + 1)]
        gathered = jax.lax.all_gather(whist, axis)  # (D, k*(G+1))
        before_sh = jnp.sum(
            jnp.where((jnp.arange(d) < shard_id)[:, None], gathered, 0), axis=0
        )
        ghist = jnp.sum(gathered, axis=0).reshape(k, G + 1)
        # weight of movers with strictly higher gain in the same part
        rev = jnp.cumsum(ghist[:, ::-1], axis=1)[:, ::-1]
        higher = jnp.concatenate(
            [rev[:, 1:], jnp.zeros((k, 1), jnp.float32)], axis=1
        )
        # local weighted prefix within bucket (cummax head trick on the
        # running weight sum)
        idx = jnp.arange(rows, dtype=jnp.int32)
        b_s, i_s = jax.lax.sort((bucket, idx), num_keys=1, is_stable=True)
        w_s = w_row[i_s]
        cw = jnp.cumsum(w_s)
        head = jnp.concatenate([jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
        run_base = jax.lax.cummax(jnp.where(head, cw - w_s, -jnp.inf))
        prefix_s = cw - w_s - run_base
        local_prefix = jnp.zeros((rows,), jnp.float32).at[i_s].set(prefix_s)
        flat = jnp.clip(bucket, 0, k * (G + 1) - 1)
        wpos = higher.reshape(-1)[flat] + before_sh[flat] + local_prefix
        admit = mover & (
            wpos + w_row <= headroom[jnp.clip(best, 0, k - 1)] + 1e-6
        )
        new_lab = jnp.where(admit, best, lab_l)

        cut = jax.lax.psum(
            jnp.sum((valid & (lab_l[lrow] != nb_lab)).astype(jnp.int32)), axis
        )
        return new_lab[None], cut

    step_fn = shard_map(
        round_body, mesh=mesh, in_specs=(P(axis),) * 6,
        out_specs=(P(axis), P()),
    )
    cut_fn = _edge_cut_runner(mesh, axis, n, d, rows, width, halo_s)

    def overload_body(lab, vw):
        shard_id = jax.lax.axis_index(axis)
        grows = shard_id * rows + jnp.arange(rows, dtype=jnp.int32)
        sizes = jax.lax.psum(
            jnp.zeros((k,), jnp.float32).at[lab[0]].add(
                jnp.where(grows < n, vw[0], 0.0), mode="drop"
            ),
            axis,
        )
        return jnp.max(sizes - cap)

    overload_fn = shard_map(
        overload_body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P()
    )

    @jax.jit
    def run(indptr, nnz_local, halo_send, halo_map, labels, vw):
        cut0 = cut_fn(indptr, nnz_local, halo_send, halo_map, labels)
        over0 = overload_fn(labels, vw)

        def body(_, state):
            lab, best_lab, best_cut, best_over = state
            new_lab, _ = step_fn(indptr, nnz_local, halo_send, halo_map, lab, vw)
            new_cut = cut_fn(indptr, nnz_local, halo_send, halo_map, new_lab)
            new_over = overload_fn(new_lab, vw)
            # feasibility first (a lower cut must not excuse a cap
            # violation), then cut
            feas_new = new_over <= 1e-4
            feas_best = best_over <= 1e-4
            better = (feas_new & ~feas_best) | (
                (feas_new == feas_best)
                & ((new_cut < best_cut) | (~feas_new & (new_over < best_over)))
            )
            best_lab = jnp.where(better, new_lab, best_lab)
            best_cut = jnp.where(better, new_cut, best_cut)
            best_over = jnp.where(better, new_over, best_over)
            return new_lab, best_lab, best_cut, best_over

        _, best_lab, _, _ = jax.lax.fori_loop(
            0, rounds, body, (labels, labels, cut0, over0)
        )
        return best_lab

    return run


def refine_partition(
    sh: ShardedCSR,
    labels,
    k: int,
    mesh: Mesh,
    rounds: int = 4,
    balance: float = 1.1,
    gain_buckets: int = 32,
    vertex_weights=None,
):
    """Boundary refinement with **sharded** labels and distributed
    admission control: per round, movers are ranked per target part by
    (gain bucket, shard, local weighted prefix) using psum'd weighted
    gain histograms — exact top-headroom admission in weight units with
    O(D·k·G) communication, no replicated n-length sort (vs
    dist.refine_partition's replicated lexsort). ``vertex_weights`` (n,)
    switches the balance constraint from counts to weight sums
    (multilevel coarse levels). The best labeling seen is kept, so the
    result is cut-monotone vs the input."""
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)
    if vertex_weights is None:
        total = float(n)
        vw = jnp.ones((n,), jnp.float32)
    else:
        vw = jnp.asarray(vertex_weights, jnp.float32)
        total = float(np.asarray(jax.device_get(jnp.sum(vw))))
    cap = balance * total / k
    run = _refine_runner(mesh, axis, n, d, rows, width, halo_s,
                         int(k), int(rounds), cap, int(gain_buckets))
    lab = _pad_vec(jnp.asarray(labels, jnp.int32), d, rows, n)
    out = run(sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map, lab,
              _pad_vec(vw, d, rows, n))
    return out.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Heavy-edge matching (distributed coarsening building block)
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _matching_runner(mesh, axis, n, d, rows, width, halo_s, rounds):
    big = jnp.iinfo(jnp.int32).max

    def round_body(indptr, nnz_local, halo_send, halo_map, vals, match, it):
        # match: (1, rows) int32, self-id = unmatched. One halo exchange
        # of match state + one of proposals per round.
        ip, cnt, hs, hm = indptr[0], nnz_local[0], halo_send[0], halo_map[0]
        match_l = match[0]
        shard_id = jax.lax.axis_index(axis)
        grows = shard_id * rows + jnp.arange(rows, dtype=jnp.int32)
        in_range = grows < n
        unmatched = (match_l == grows) & in_range

        ext_match = _exchange(match_l, hs, axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        # neighbor global id per nnz: recover from the extended slot value
        # of the *identity* vector — ship global ids through the halo once
        ids_ext = _exchange(grows, hs, axis)
        nb_gid = ids_ext[hm]
        nb_unmatched = ext_match[hm] == nb_gid
        cand = valid & unmatched[lrow] & nb_unmatched & (nb_gid != grows[lrow])
        w = jnp.where(cand, vals[0], -jnp.inf)
        # per-row heaviest edge; equal-weight ties break by a per-round
        # pseudo-random neighbor priority (Luby-style) — deterministic
        # lowest-id ties form long one-way proposal chains on unweighted
        # graphs and the handshake stalls
        wmax = jnp.full((rows,), -jnp.inf, vals.dtype).at[lrow].max(w, mode="drop")
        tie = cand & (w >= wmax[lrow]) & jnp.isfinite(w)
        h = nb_gid ^ (it * jnp.int32(-1640531527))  # 0x9E3779B9 as int32
        h = (h * jnp.int32(-1028477379)) & jnp.int32(0x7FFFFFFF)  # 0xC2B2AE3D
        pri = jnp.where(tie, h, -1)
        primax = jnp.full((rows,), -1, jnp.int32).at[lrow].max(pri, mode="drop")
        is_best = tie & (pri == primax[lrow])
        best_nb = jnp.full((rows,), big, jnp.int32).at[lrow].min(
            jnp.where(is_best, nb_gid, big), mode="drop"
        )
        proposal = jnp.where(unmatched & (best_nb < big), best_nb, big)

        # handshake: (v -> c) matches iff c also proposes v
        ext_prop = _exchange(proposal, hs, axis)
        mutual_e = (
            valid
            & (nb_gid == proposal[lrow])
            & (ext_prop[hm] == grows[lrow])
        )
        mutual = jnp.zeros((rows,), bool).at[lrow].max(mutual_e, mode="drop")
        new_match = jnp.where(mutual, jnp.minimum(proposal, big - 1), match_l)
        return new_match[None]

    step_fn = shard_map(
        round_body, mesh=mesh, in_specs=(P(axis),) * 6 + (P(),), out_specs=P(axis)
    )
    gids = jnp.arange(d * rows, dtype=jnp.int32).reshape(d, rows)

    @jax.jit
    def run(indptr, nnz_local, halo_send, halo_map, vals):
        def body(i, match):
            return step_fn(indptr, nnz_local, halo_send, halo_map, vals, match,
                           i.astype(jnp.int32))

        return jax.lax.fori_loop(0, rounds, body, gids)

    return run


def heavy_edge_matching(sh: ShardedCSR, mesh: Mesh, rounds: int = 4,
                        weighted: bool = True):
    """Distributed heavy-edge matching — the coarsening building block of
    a multilevel partitioner (SURVEY.md §7 phase 4/5; the reference gets
    coarsening only inside METIS). Handshake rounds: every unmatched
    vertex proposes to its heaviest unmatched neighbor (ties → per-round
    Luby-hash priority), mutual proposals match; two halo exchanges per
    round. The classic local-dominance argument gives ≥ 1/2 the maximum
    matching weight at convergence — PROVIDED edge weights are symmetric
    (w(u,v) = w(v,u)): with asymmetric directed weights the two
    endpoints rank edges differently, locally-dominant edges need not be
    mutual, and the deterministic handshake can stall permanently
    (measured: 17.5 % matched forever on a random-valued stencil).
    ``weighted=False`` matches on the pattern only (uniform weights →
    every edge ties → the randomized-priority handshake, ~95 % matched
    in 8 rounds) — the right mode for structural ladders (BFS levels)
    and for graphs with asymmetric values. Returns ``match[v]`` =
    partner (or v if unmatched), replicated (n,)."""
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)
    run = _matching_runner(mesh, axis, n, d, rows, width, halo_s, int(rounds))
    vals = (
        jnp.abs(sh.vals).astype(jnp.float32)
        if weighted and sh.vals is not None
        else jnp.ones(sh.indices.shape, jnp.float32)
    )
    out = run(sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map, vals)
    return out.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Contraction (distributed coarsening)
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _coarsen_runner(mesh, axis, n, d, rows, width, halo_s):
    big = jnp.iinfo(jnp.int32).max

    def body(indptr, nnz_local, halo_send, halo_map, vals, match):
        ip, cnt, hs, hm = indptr[0], nnz_local[0], halo_send[0], halo_map[0]
        match_l = match[0]
        shard_id = jax.lax.axis_index(axis)
        grows = shard_id * rows + jnp.arange(rows, dtype=jnp.int32)
        in_range = grows < n

        # 1. coarse ids for representatives (rep = lower endpoint of a
        #    pair, or an unmatched vertex): distributed counting rank
        rep = in_range & (grows <= match_l)
        local_prefix = jnp.cumsum(rep.astype(jnp.int32)) - rep.astype(jnp.int32)
        local_count = jnp.sum(rep.astype(jnp.int32))
        counts = jax.lax.all_gather(local_count, axis)  # (D,)
        offset = jnp.sum(jnp.where(jnp.arange(d) < shard_id, counts, 0))
        n_coarse = jax.lax.psum(local_count, axis)
        cid = jnp.where(rep, offset + local_prefix, -1)

        # 2. non-reps take their partner's coarse id. The partner is a
        #    neighbor (matched along an edge), so its cid arrives with
        #    one halo exchange; select the entry pointing at the partner.
        ext_cid = _exchange(cid, hs, axis)
        ids_ext = _exchange(grows, hs, axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        nb_gid = ids_ext[hm]
        from_partner = valid & (nb_gid == match_l[lrow])
        partner_cid = jnp.full((rows,), big, jnp.int32).at[lrow].min(
            jnp.where(from_partner, ext_cid[hm], big), mode="drop"
        )
        cid = jnp.where(rep, cid, jnp.where(partner_cid < big, partner_cid, -1))

        # 3. relabel edges into coarse space (second cid exchange now that
        #    every vertex has one); intra-pair edges become sentinels
        ext_cid2 = _exchange(cid, hs, axis)
        cu = cid[lrow]
        cv = ext_cid2[hm]
        keep = valid & (cu >= 0) & (cv >= 0) & (cu != cv)
        crow = jnp.where(keep, cu, big)
        ccol = jnp.where(keep, cv, 0)
        cw = jnp.where(keep, vals[0], 0.0)
        return crow[None], ccol[None], cw[None], cid[None], n_coarse

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis),) * 6,
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
    )
    return jax.jit(fn)


def coarsen(sh: ShardedCSR, match, mesh: Mesh, halo: bool = True,
            return_mapping: bool = False):
    """Contract a matching into the coarse graph, fully distributed —
    with :func:`heavy_edge_matching` this is one level of multilevel
    coarsening (SURVEY.md §7 phase 4/5; the reference's only coarsening
    lives inside METIS). Matched pairs merge into one coarse vertex
    (owned by the lower endpoint), edges are relabeled via two halo
    exchanges of coarse ids, intra-pair edges drop, and the relabeled
    entries are routed to their coarse row-block owners with
    :meth:`ShardedCSR.from_coo_sharded`'s all_to_all. Parallel edges are
    kept (weights accumulate in downstream reductions), matching
    accumulate-duplicates semantics elsewhere in the package.

    Returns the coarse ``ShardedCSR`` (with halo metadata when
    ``halo=True``); with ``return_mapping=True`` also the (n,) fine→coarse
    vertex map."""
    _require_halo(sh)
    axis, n, d, rows, width, halo_s = _statics(sh)
    run = _coarsen_runner(mesh, axis, n, d, rows, width, halo_s)
    vals = (
        sh.vals.astype(jnp.float32)
        if sh.vals is not None
        else jnp.ones(sh.indices.shape, jnp.float32)
    )
    crow, ccol, cw, cid, n_coarse = run(
        sh.indptr, sh.nnz_local, sh.halo_send, sh.halo_map, vals,
        _pad_vec(jnp.asarray(match, jnp.int32), d, rows, n),
    )
    nc = int(np.asarray(jax.device_get(n_coarse)))
    big = jnp.iinfo(jnp.int32).max
    flat_r = crow.reshape(-1)
    # sentinel rows (big) -> nc so from_coo_sharded's pad logic drops them
    flat_r = jnp.where(flat_r == big, nc, flat_r)
    out = ShardedCSR.from_coo_sharded(
        flat_r, ccol.reshape(-1), cw.reshape(-1), (nc, nc), mesh, axis=axis
    )
    out = out.with_halo() if halo else out
    if return_mapping:
        return out, cid.reshape(-1)[:n]
    return out


# --------------------------------------------------------------------------
# Multilevel (contraction) BFS levels + the sub-diameter RCM variant
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _level_correct_runner(mesh, axis, n, d, rows, width, halo_s, rounds):
    """``rounds`` Bellman-Ford relaxations of a level field:
    lev = min(lev, min_nbr(lev) + 1); -1 (unreachable) stays -1."""
    big = jnp.int32(_BIG)

    def step(indptr, nnz_local, halo_send, halo_map, lev):
        ip, cnt, hs = indptr[0], nnz_local[0], halo_send[0]
        lv = lev[0]
        masked = jnp.where(lv < 0, big, lv)
        ext = _exchange(masked, hs, axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        nbr = jnp.where(valid, ext[halo_map[0]], big)
        nmin = jnp.full((rows,), big, jnp.int32).at[lrow].min(nbr, mode="drop")
        new = jnp.minimum(masked, jnp.where(nmin < big, nmin + 1, big))
        return jnp.where(lv < 0, -1, new)[None]

    step_fn = shard_map(step, mesh=mesh, in_specs=(P(axis),) * 5,
                        out_specs=P(axis))

    @jax.jit
    def run(indptr, nnz_local, halo_send, halo_map, lev):
        def body(_, l):
            return step_fn(indptr, nnz_local, halo_send, halo_map, l)

        return jax.lax.fori_loop(0, rounds, body, lev)

    return run


def bfs_levels_multilevel(
    sh: ShardedCSR,
    root: int,
    mesh: Mesh,
    coarsen_until: int = 4096,
    correction_rounds: int = 2,
    matching_rounds: int = 8,
    max_levels: int = 24,
):
    """Approximate BFS levels in o(diameter) parallel steps (round 5;
    VERDICT r4 weak #3 — the RCM weak-scaling diameter bound).

    Exact level-synchronous BFS needs Ω(diameter) sequential frontier
    exchanges — there is no known work-efficient sub-diameter BFS (the
    NC alternative, min-plus matrix powering, is O(n³ log n) work), so a
    weak-scaled stencil (diameter ∝ n ∝ d) *cannot* hold efficiency for
    exact levels; that impossibility is recorded with the scaling
    results (SCALING_r05.json). What an RCM-class *ordering* needs is a
    smooth peeling structure, not exact distances, and that admits a
    multilevel escape: contract ``L = log2(n / coarsen_until)`` levels
    of heavy-edge matching (each roughly halves the diameter), run the
    exact BFS on the coarsest graph (depth ≈ diameter / 2^L), then walk
    back up projecting ``lev_f = 2 · lev_c[map]`` and smoothing with
    ``correction_rounds`` Bellman-Ford relaxations per level. Total
    frontier-synchronous steps ≈ diameter/2^L + L·(matching + correction)
    — polylog in n for bounded-degree graphs, so weak scaling is no
    longer diameter-bound.

    Levels are *approximate* (contraction shrinks distances by up to 3×
    per level, so the projection is neither an upper nor a lower bound);
    reachability is exact (contraction preserves connectivity:
    unreached stays −1). Returns (levels (n,), step_count) where
    ``step_count`` is the measured synchronous-exchange count (coarse
    BFS depth + per-level matching/coarsen/correction exchanges) used by
    the scaling projection."""
    _require_halo(sh)
    import jax as _jax

    import os as _os

    _dbg = bool(_os.environ.get("SBTPU_ML_DEBUG"))

    def _d(msg):
        if _dbg:
            import time as _t

            print(f"## ml {msg} ({_t.perf_counter():.1f})", flush=True)

    ladder = [sh]
    maps = []
    cur = sh
    steps = 0
    while cur.shape[0] > max(int(coarsen_until), 1) and len(maps) < max_levels:
        _d(f"match n={cur.shape[0]}")
        match = heavy_edge_matching(cur, mesh, rounds=matching_rounds,
                                    weighted=False)
        _d("coarsen")
        nxt, cid = coarsen(cur, match, mesh, halo=True, return_mapping=True)
        steps += 2 * matching_rounds + 3  # handshake + relabel exchanges
        if nxt.shape[0] >= cur.shape[0]:
            break  # matching stalled
        maps.append(np.asarray(_jax.device_get(cid)).astype(np.int64))
        ladder.append(nxt)
        cur = nxt
    r = int(root)
    for cid in maps:
        r = int(cid[r])
    axis, n_c, d, rows_c, width_c, halo_c = _statics(cur)
    _d(f"coarse bfs n={cur.shape[0]} root={r}")
    lev_dev, depth = _bfs_sharded(cur, r, mesh)
    lev = lev_dev.reshape(-1)[: cur.shape[0]]
    steps += int(np.asarray(_jax.device_get(depth)))
    _d(f"walk up, coarse depth={int(np.asarray(_jax.device_get(depth)))}")
    for level in range(len(maps) - 1, -1, -1):
        _d(f"correct level {level}")
        cid = maps[level]
        fine = ladder[level]
        lev_h = np.asarray(_jax.device_get(lev)).astype(np.int64)
        proj = np.where(lev_h[cid] < 0, -1, 2 * lev_h[cid]).astype(np.int32)
        axis, nf, d, rows, width, halo_s = _statics(fine)
        run = _level_correct_runner(
            mesh, axis, nf, d, rows, width, halo_s, int(correction_rounds)
        )
        lev = run(
            fine.indptr, fine.nnz_local, fine.halo_send, fine.halo_map,
            jnp.asarray(_pad_vec(proj, d, rows, nf, fill=-1)),
        ).reshape(-1)[:nf]
        steps += int(correction_rounds)
    return lev, steps


def rcm_reorder_ml(
    sh: ShardedCSR,
    mesh: Mesh,
    root: int = 0,
    coarsen_until: int = 4096,
    correction_rounds: int = 2,
):
    """RCM-class ordering from :func:`bfs_levels_multilevel` — the
    weak-scalable variant for high-diameter graphs (rank by the same
    (level, degree, id) key as :func:`.dist.rcm_reorder`, reversed).
    Returns (inverse permutation (n,), step_count)."""
    from .dist import _rcm_rank_runner, degrees as _deg

    n = sh.shape[0]
    levels, steps = bfs_levels_multilevel(
        sh, root, mesh, coarsen_until=coarsen_until,
        correction_rounds=correction_rounds,
    )
    deg = _deg(sh, mesh)
    return _rcm_rank_runner(n)(levels, deg), steps


def _coarsest_init(sh: ShardedCSR, k: int, mesh: Mesh, vw, balance, lp_iters):
    """Initial partition of the coarsest V-cycle graph. The coarsest graph
    is tiny by construction (≤ coarsen_until vertices), so — exactly as
    METIS solves its coarsest graph serially — it is gathered to host and
    partitioned with the weighted grow+refine used by the native kway
    path; weight-aware balancing here is what keeps the projected fine
    labels inside the cap (the round-2 weighted label-prop init could
    overshoot with lumpy coarse weights and refinement admission can only
    preserve balance, not restore it). Falls back to distributed
    label-prop for coarse graphs that are still large."""
    n = sh.shape[0]
    if n > 4096:
        return label_prop_partition(sh, k, mesh, num_iters=lp_iters,
                                    balance=balance, vertex_weights=vw)
    from ..ops.partition.multilevel import _refine as host_refine
    from ..ops.partition.multilevel import _region_grow, _symmetrize

    csr = sh.to_csr()
    indptr = np.asarray(csr.indptr).astype(np.int64)
    indices = np.asarray(csr.indices).astype(np.int64)
    ew = (
        np.abs(np.asarray(csr.vals)).astype(np.float64)
        if csr.vals is not None
        else np.ones(csr.nnz, np.float64)
    )
    ip, ix, ew = _symmetrize(indptr, indices, ew, n)
    vwts = np.asarray(jax.device_get(jnp.asarray(vw))).astype(np.float64)[:n]
    cap = balance * float(vwts.sum()) / k
    rng = np.random.default_rng(0x5EED)
    best_lab, best_cut = None, None
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(ip))
    for _ in range(4):
        lab = _region_grow(ip, ix, ew, vwts, k, rng, cap)
        lab = host_refine(ip, ix, ew, vwts, lab, k, cap, rounds=8, rng=rng)
        c = float(ew[lab[row] != lab[ix]].sum())
        if best_cut is None or c < best_cut:
            best_lab, best_cut = lab, c
    return jnp.asarray(best_lab.astype(np.int32))


def multilevel_partition(
    sh: ShardedCSR,
    k: int,
    mesh: Mesh,
    coarsen_until: int = 256,
    max_levels: int = 8,
    lp_iters: int = 20,
    refine_rounds: int = 6,
    balance: float = 1.1,
):
    """Distributed multilevel k-way partitioning — the phase-5 capstone
    (SURVEY.md §7): a :func:`heavy_edge_matching` + :func:`coarsen`
    ladder down to ``coarsen_until`` vertices, label-prop + refinement on
    the coarsest graph, then projection back up with boundary refinement
    at every level (the V-cycle of the reference's METIS dependency,
    entirely on the mesh). Vertex weights accumulate through the
    contraction (a coarse vertex weighs the sum of its merged fine
    vertices), and every level's label propagation / refinement balances
    in weight units, so the final labeling respects the ``balance`` cap
    on fine-vertex counts.

    Returns replicated (n,) labels (a device array — the ladder's
    matchings, vertex maps, weights and labels all stay on device;
    host Python only walks the level list, whose static shapes differ
    per level anyway — VERDICT r2 item 8)."""
    _require_halo(sh)
    n = sh.shape[0]
    ladder = [sh]
    maps = []
    weights = [jnp.ones((n,), jnp.float32)]
    cur = sh
    for _ in range(max_levels):
        if cur.shape[0] <= coarsen_until:
            break
        m = heavy_edge_matching(cur, mesh, rounds=6)
        nxt, cid = coarsen(cur, m, mesh, return_mapping=True)
        if nxt.shape[0] >= int(cur.shape[0] * 0.95):
            break  # matching stalled; stop coarsening
        maps.append(cid)
        weights.append(
            jax.ops.segment_sum(weights[-1], cid, num_segments=nxt.shape[0])
        )
        ladder.append(nxt)
        cur = nxt

    labels = _coarsest_init(cur, k, mesh, weights[-1], balance, lp_iters)
    labels = refine_partition(cur, labels, k, mesh, rounds=refine_rounds,
                              balance=balance, vertex_weights=weights[-1])
    # project back up: fine label = its coarse vertex's label (device
    # gather), then refine at that level
    for level in range(len(maps) - 1, -1, -1):
        labels = jnp.asarray(labels)[maps[level]]
        labels = refine_partition(ladder[level], labels, k, mesh,
                                  rounds=refine_rounds, balance=balance,
                                  vertex_weights=weights[level])
    return _enforce_balance(sh, labels, k, mesh, balance)


def _enforce_balance(sh: ShardedCSR, labels, k: int, mesh: Mesh, balance: float):
    """Final balance guarantee (the METIS ``ufactor`` contract): when
    gain-driven refinement cannot reach feasibility — e.g. a zipf hub
    cluster contracts into a coarse vertex heavier than the cap, so
    every coarse labeling is infeasible and the projected fine labels
    inherit the overload (observed at 1.8× on the 4M-nnz
    DISTSCALE graph) — evict the lowest-degree members of over-cap parts
    into the lightest parts until every part fits. Host post-pass on the
    already-replicated (n,) output; low-degree eviction minimizes the
    cut damage."""
    import numpy as np

    from .sharded import _host_fetch

    n = sh.shape[0]
    lab = _host_fetch(jnp.asarray(labels)).reshape(-1)[:n].copy()
    cap = balance * n / k
    sizes = np.bincount(lab, minlength=k).astype(np.int64)
    if sizes.max() <= cap:
        return jnp.asarray(lab)
    from .dist import degrees as _dist_degrees

    deg = _host_fetch(_dist_degrees(sh, mesh)).reshape(-1)[:n]
    for p in np.argsort(-sizes):
        excess = int(sizes[p] - np.floor(cap))
        if excess <= 0:
            continue
        members = np.nonzero(lab == p)[0]
        movers = members[np.argsort(deg[members], kind="stable")][:excess]
        for v in movers:
            if sizes[p] <= cap:
                break
            tgt = int(np.argmin(np.where(np.arange(k) == p, np.iinfo(np.int64).max, sizes)))
            if sizes[tgt] + 1 > cap:
                break  # nowhere to put it without overflowing the target
            lab[v] = tgt
            sizes[p] -= 1
            sizes[tgt] += 1
    if sizes.max() > cap:
        # Only reachable when every part sits at the integer cap, i.e.
        # floor(cap)*k < n (tiny n or balance ≈ 1). The contract is
        # best-effort there — say so instead of silently handing the
        # caller an over-cap labeling.
        from ..utils.logger import Logger

        Logger(type(sh)).warning(
            "enforce_balance: infeasible at k=%d balance=%.3f "
            "(max part %d > cap %.1f); returning best effort"
            % (k, balance, int(sizes.max()), cap)
        )
    return jnp.asarray(lab)


# --------------------------------------------------------------------------
# SlashBurn
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _active_degree_runner(mesh, axis, n, d, rows, width, halo_s):
    """Per-vertex degree restricted to the ``alive`` induced subgraph:
    one halo exchange of the alive mask + a local segment sum."""

    def body(indptr, nnz_local, halo_send, halo_map, alive):
        ip, cnt, hs = indptr[0], nnz_local[0], halo_send[0]
        alive_l = alive[0]
        ext = _exchange(alive_l.astype(jnp.int32), hs, axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        live = valid & alive_l[lrow] & (ext[halo_map[0]] > 0)
        deg = jax.ops.segment_sum(live.astype(jnp.int32), lrow, num_segments=rows)
        return deg[None]

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis),) * 5, out_specs=P(axis))
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _nbr_min_runner(mesh, axis, n, d, rows, width, halo_s):
    """One-shot per-vertex min over neighbor values (halo exchange +
    segment min); rows without live neighbors get INT32_MAX."""
    big = jnp.int32(_BIG)

    def body(indptr, nnz_local, halo_send, halo_map, vals_in):
        ip, cnt, hs = indptr[0], nnz_local[0], halo_send[0]
        ext = _exchange(vals_in[0], hs, axis)
        lrow = _local_row_of(ip, width)
        valid = jnp.arange(width, dtype=jnp.int32) < cnt
        nbr = jnp.where(valid, ext[halo_map[0]], big)
        out = jnp.full((rows,), big, jnp.int32).at[lrow].min(nbr, mode="drop")
        return out[None]

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis),) * 5, out_specs=P(axis))
    return jax.jit(fn)


def slashburn_reorder(
    sh: ShardedCSR,
    mesh: Mesh,
    k_size: int = 64,
    hub_order: bool = False,
    bucket_cap: int = 4096,
    host_tail: int = 65536,
    host_tail_nnz: int = 2 << 20,
    compact_ratio: float = 0.5,
):
    """Distributed SlashBurn (reference semantics:
    src/sparsebase/reorder/slashburn_reorder.cc, the non-``greedy``
    variant — greedy recomputes degrees after every single hub removal
    and is inherently sequential; it stays on host): iteratively place
    the k highest-degree hubs at the front, non-giant components at the
    back, and recurse on the giant component.

    All structural passes are distributed with boundary-proportional
    communication: active degrees (halo exchange + segment sum), hub
    selection (psum'd degree-histogram counting rank, comm O(D·buckets) —
    no replicated sort; the histogram is sized each round from the
    actual max active degree so no degree ever clips; ``bucket_cap``
    only sets the minimum size), connected components
    (:func:`connected_components` — FastSV grandparent hooking + full
    path compression, round 5), and ``hub_order``'s discovering-hub
    index (one neighbor-min exchange). Host code only does the O(n)
    position bookkeeping between rounds.

    Requires a symmetric adjacency (the host reorderer symmetrizes
    first; shard a symmetrized CSR). Matches the host
    ``SlashburnReorder(greedy=False)`` order exactly on such graphs
    (tests/test_slashburn_dist.py).

    Round-5 scaling restructure (VERDICT r4 weak #2: 165.78 s at the
    4M-nnz DISTSCALE shape). Two observations drive it:

    * At loop top ``active`` is exactly the current giant component
      (connected), and every remaining SlashBurn decision depends only
      on its induced subgraph; the remaining order slots are
      ``front..back`` — exactly ``count`` of them — so the order can be
      continued verbatim on ANY faithful representation of G[active]
      (id compaction is monotone, preserving every ascending-id
      tie-break, and local front/back cursors are the global ones
      shifted by ``front``).
    * Each distributed round pays O(nnz of the *sharded arrays*)
      regardless of how much of the graph is still alive, and hub
      removal on the skewed graphs SlashBurn targets kills most of the
      nnz in the first rounds.

    So the loop runs in **phases**: distributed rounds re-measure the
    live edge count (a free by-product of the degree pass), and when it
    drops below ``compact_ratio`` × the phase's starting nnz the active
    subgraph is compacted — re-sharded at its true size (geometric
    total rebuild cost) — and rounds continue there. Once the residual
    is host-sized (``count`` ≤ ``host_tail`` vertices or live nnz ≤
    ``host_tail_nnz``) it is finished on host via the tested native
    kernel on G[active] (``order[A] = front + slashburn(G[A])``) — the
    same size-tiered dispatch the package uses for triangles
    (dense / sparse / host). On the DISTSCALE zipf graph the top-64
    hubs carry 2/3 of all edges, so the measured trajectory is: one
    distributed round at 4M nnz, then a 1.35M-nnz residual that decays
    by only ~1% per round for ~140 rounds — exactly the regime where a
    host core beats 8 shards + per-round sync. At true multi-host
    scale (nnz ≫ ``host_tail_nnz``) the distributed rounds carry the
    load and compaction keeps them O(live nnz). Set ``host_tail=0`` /
    ``host_tail_nnz=0`` / ``compact_ratio=0`` to disable any tier
    (DISTSCALE_r05.json records both hybrid and pure-distributed
    times; the orders are identical). Each phase compiles runners for
    its own shapes — keep the persistent compilation cache on
    (CLAUDE.md) so phases reuse across runs.
    """
    from ..ops.reorder.slashburn import _place_spokes

    _require_halo(sh)
    k = max(int(k_size), 1)
    nb_min = max(int(bucket_cap), 4)
    n_glob = sh.shape[0]

    order = np.full(n_glob, -1, np.int64)
    front = 0
    back = n_glob - 1

    cur = sh
    vmap = np.arange(n_glob, dtype=np.int64)  # local id -> global id
    first_phase = True

    def _host_csr(c):
        hc = c.to_csr()
        return (
            np.asarray(hc.indptr).astype(np.int64),
            np.asarray(hc.indices).astype(np.int64),
        )

    def _induced(gip, gix, active, count):
        """Induced subgraph of ``active`` (monotone id compaction)."""
        n_cur = active.shape[0]
        inv_id = np.full(n_cur, -1, np.int64)
        verts = np.nonzero(active)[0]
        inv_id[verts] = np.arange(count)
        row_all = np.repeat(np.arange(n_cur, dtype=np.int64), np.diff(gip))
        keep = active[row_all] & active[gix]
        sub_r = inv_id[row_all[keep]]
        sub_c = inv_id[gix[keep]]
        sub_ip = np.concatenate(
            [[0], np.cumsum(np.bincount(sub_r, minlength=count))]
        ).astype(np.int64)
        return verts, sub_ip, sub_c

    while True:  # phase loop
        axis, n, d, rows, width, halo_s = _statics(cur)
        deg_run = _active_degree_runner(mesh, axis, n, d, rows, width, halo_s)
        nbrmin_run = _nbr_min_runner(mesh, axis, n, d, rows, width, halo_s)
        order_l = np.full(n, -1, np.int64)
        active = np.ones(n, bool)

        def cc_host(mask):
            return np.asarray(
                jax.device_get(connected_components(cur, mesh, alive=mask))
            ).astype(np.int64)

        if first_phase:
            # initial spokes: everything outside the giant component.
            # Later phases start from a compacted giant component, which
            # is connected by construction — no CC needed.
            labels = cc_host(active)
            sizes = np.bincount(labels[labels >= 0], minlength=n)
            gcc = int(np.argmax(sizes)) if sizes.size else 0
            back, active = _place_spokes(order_l, labels, active, gcc, back)
            first_phase = False

        nnz_phase = None
        compact = False
        done = False
        host_finish = False
        while True:  # round loop
            count = int(active.sum())
            if count == 0:
                done = True
                break
            if count < k:
                verts = np.nonzero(active)[0]
                order_l[verts] = back - count + 1 + np.arange(count)
                back -= count
                done = True
                break
            if 0 < host_tail >= count or host_finish:
                # host-tail handoff: finish the (connected) residual on
                # host with the tested native kernel.
                assert back - front + 1 == count, (front, back, count)
                gip, gix = _host_csr(cur)
                verts, sub_ip, sub_c = _induced(gip, gix, active, count)
                from ..ops.reorder.slashburn import (
                    SlashburnReorderParams,
                    _slashburn_host,
                )
                from ..formats.csr import CSR as _CSR
                from .. import native

                if native.available():
                    sub_order = native.slashburn(
                        count, sub_ip, sub_c, k, False, hub_order
                    )
                else:
                    sub_order = _slashburn_host(
                        _CSR(sub_ip, sub_c, None, (count, count)),
                        SlashburnReorderParams(k, False, hub_order),
                    )
                order_l[verts] = front + np.asarray(sub_order, np.int64)
                done = True
                break
            alive_p = jnp.asarray(_pad_vec(active, d, rows, n, fill=False))
            deg = deg_run(
                cur.indptr, cur.nnz_local, cur.halo_send, cur.halo_map, alive_p
            )
            # one host sync for both scalars: histogram sizing + the
            # live edge count that drives compaction
            dmax, nnz_act = (
                int(x)
                for x in np.asarray(
                    jax.device_get(jnp.stack([jnp.max(deg), jnp.sum(deg)]))
                ).reshape(-1)[:2]
            )
            if 0 < host_tail_nnz >= nnz_act:
                host_finish = True  # residual is host-sized: hand off
                continue
            if nnz_phase is None:
                nnz_phase = max(nnz_act, 1)
            elif compact_ratio > 0 and nnz_act < compact_ratio * nnz_phase:
                compact = True
                break
            # size the histogram from the round's actual max active
            # degree (clipping would rank top-bucket ties by id instead
            # of degree, silently diverging from the host order on the
            # hub-heavy graphs SlashBurn targets). Power-of-two rounding
            # bounds recompiles to O(log n).
            nb = max(nb_min, 1 << (dmax + 2 - 1).bit_length())
            rank_run = _counting_rank_runner(mesh, axis, n, d, rows, nb)
            # descending-degree bucket key, ascending-id tie-break via
            # the stable counting rank; bucket nb-1 = inactive rows
            key = jnp.where(alive_p, dmax - deg, nb - 1).astype(jnp.int32)
            ranks = np.asarray(
                jax.device_get(rank_run(key, alive_p))
            ).reshape(-1)[:n]
            hubs_mask = active & (ranks < k)
            order_l[hubs_mask] = front + ranks[hubs_mask]
            front += k
            active = active & ~hubs_mask
            hub_of = None
            if hub_order:
                hr_p = jnp.asarray(
                    _pad_vec(
                        np.where(hubs_mask, ranks, _BIG).astype(np.int32),
                        d, rows, n, fill=_BIG,
                    )
                )
                hub_of = np.asarray(
                    jax.device_get(
                        nbrmin_run(cur.indptr, cur.nnz_local, cur.halo_send,
                                   cur.halo_map, hr_p)
                    )
                ).reshape(-1)[:n].astype(np.int64)
                hub_of = np.where(
                    hub_of == _BIG, np.iinfo(np.int64).max, hub_of
                )
            labels = cc_host(active)
            live = labels[labels >= 0]
            if live.size == 0:
                done = True
                break
            sizes = np.bincount(live, minlength=n)
            gcc = int(np.argmax(sizes))
            back, active = _place_spokes(
                order_l, labels, active, gcc, back, hub_of
            )
            if int(sizes[gcc]) < k:
                verts = np.nonzero(active)[0]
                order_l[verts] = back - verts.size + 1 + np.arange(verts.size)
                back -= verts.size
                done = True
                break

        placed = order_l >= 0
        order[vmap[placed]] = order_l[placed]
        if done:
            break
        # compact: re-shard the active induced subgraph at its true size
        count = int(active.sum())
        gip, gix = _host_csr(cur)
        verts, sub_ip, sub_c = _induced(gip, gix, active, count)
        vmap = vmap[verts]
        from ..formats.csr import CSR as _CSR

        sub = _CSR(
            sub_ip.astype(np.int32),
            sub_c.astype(np.int32),
            None,
            (count, count),
        )
        cur = ShardedCSR.from_csr(sub, mesh).with_halo()
    return order.astype(np.int32)

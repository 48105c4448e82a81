"""Single-chip sparse common-neighbor kernel (chunked binary search).

The big-n tier for TriangleCount / JaccardWeights on ONE device: the
dense MXU path materializes an n×n tile (triangles.py MAX_DEVICE_DENSE_N
wall) and the flat ragged expansion materializes Σ deg(u)² slots
(jaccard.py) — both explode past ~16k vertices / skewed degrees. This
kernel is the single-chip port of the distributed sparse-ring
formulation (parallel/ring.py::_sparse_common_runner, round-4): edges
are processed in fixed-size blocks, each block expands its candidates
N(u) in C-sized chunks, and membership in N(v) is a vectorized binary
search over the global indices array — O(nnz · wmax_block · log wmax)
work in O(E_CHUNK × C_CHUNK) memory, no densification.

Reference semantics: feature/triangle_count.cc:177-205 (undirected
triples counted once; set semantics per triangles._dedup_adj),
feature/jaccard_weights_cuda.cu:70-91 (the bst loop — per directed edge
J = |∩| / |∪| with *instance* counting, matching _jaccard_host exactly).

Trace notes (CLAUDE.md perf rules): static shapes — edges padded to a
block multiple, candidate chunks bounded by the *block* max degree via a
traced-bound fori_loop (lowers to while_loop, so skewed graphs don't pay
the hub degree on every block); binary search is a statically-unrolled
log2(wmax) round loop; all indexing is gathers (never searchsorted).
"""

from __future__ import annotations

import functools

import numpy as np

E_CHUNK = 4096  # edges per block
C_CHUNK = 256  # candidate positions per inner chunk


@functools.lru_cache(maxsize=None)
def _runner(n, nnz, wmax, mode, nnz_pad):
    import jax
    import jax.numpy as jnp

    rounds = max(int(wmax).bit_length(), 1)
    nblocks = max(-(-nnz_pad // E_CHUNK), 1)

    def kernel(indptr, indices, row):
        deg = indptr[1:] - indptr[:-1]

        def block(bi, carry):
            out, wrapped, approx = carry
            e0 = bi * E_CHUNK
            e = e0 + jnp.arange(E_CHUNK, dtype=jnp.int32)
            ev = e < nnz
            eidx = jnp.minimum(e, nnz - 1)
            u = row[eidx]
            v = indices[eidx]
            su = indptr[u]
            du = deg[u]
            lo0 = indptr[v]
            hi0 = indptr[v + 1]
            if mode == "triangles":
                # set semantics: each distinct directed edge counted once
                # (CSR is row-major sorted, so duplicates are adjacent),
                # self-loop edges skipped — exact parity with the host
                # _dedup_adj path.
                pidx = jnp.maximum(eidx - 1, 0)
                dup = (eidx > 0) & (row[pidx] == u) & (indices[pidx] == v)
                ev = ev & ~dup & (u != v)
            block_w = jnp.max(jnp.where(ev, du, 0))
            nc = jax.lax.div(block_w + (C_CHUNK - 1), C_CHUNK)

            def chunk(ci, acc):
                t = ci * C_CHUNK + jnp.arange(C_CHUNK, dtype=jnp.int32)
                cpos = jnp.minimum(su[:, None] + t[None, :], nnz - 1)
                cand = indices[cpos]
                cva = (t[None, :] < du[:, None]) & ev[:, None]
                if mode == "triangles":
                    # candidate-side set semantics + endpoint masking
                    ppos = jnp.minimum(
                        jnp.maximum(su[:, None] + t[None, :] - 1, 0), nnz - 1
                    )
                    prev = indices[ppos]
                    cva = cva & ((t[None, :] == 0) | (prev != cand))
                    cva = cva & (cand != u[:, None]) & (cand != v[:, None])
                left = jnp.broadcast_to(lo0[:, None], cand.shape)
                right = jnp.broadcast_to(hi0[:, None], cand.shape)
                for _ in range(rounds):
                    active = left < right
                    mid = (left + right) // 2
                    mv = indices[jnp.minimum(mid, nnz - 1)]
                    go = active & (mv < cand)
                    left = jnp.where(go, mid + 1, left)
                    right = jnp.where(active & ~go, mid, right)
                found = (
                    (left < hi0[:, None])
                    & (indices[jnp.minimum(left, nnz - 1)] == cand)
                    & cva
                )
                return acc + found.sum(axis=1).astype(jnp.int32)

            counts = jax.lax.fori_loop(
                0, nc, chunk, jnp.zeros((E_CHUNK,), jnp.int32)
            )
            counts = jnp.where(ev, counts, 0)
            if mode == "triangles":
                wrapped = wrapped + jnp.sum(counts)
                approx = approx + jnp.sum(counts.astype(jnp.float32))
            else:
                out = jax.lax.dynamic_update_slice(out, counts, (e0,))
            return out, wrapped, approx

        init = (
            jnp.zeros((nnz_pad,), jnp.int32),
            jnp.int32(0),
            jnp.float32(0.0),
        )
        out, wrapped, approx = jax.lax.fori_loop(0, nblocks, block, init)
        if mode == "triangles":
            return wrapped, approx
        union = deg[row] + deg[indices] - out[:nnz]
        return (out[:nnz].astype(jnp.float32) / jnp.maximum(union, 1)).astype(
            jnp.float32
        )

    return jax.jit(kernel)


def _prep(csr):
    import jax.numpy as jnp

    indptr = csr.indptr.astype(jnp.int32)
    indices = csr.indices.astype(jnp.int32)
    row = csr.row_of_nnz().astype(jnp.int32)
    deg = indptr[1:] - indptr[:-1]
    wmax = int(np.asarray(deg.max())) if csr.nrows else 1
    nnz_pad = -(-max(csr.nnz, 1) // E_CHUNK) * E_CHUNK
    return indptr, indices, row, max(wmax, 1), nnz_pad


def triangle_count_sparse_device(csr, directed: bool = False) -> int:
    """Undirected triangle count on one chip without densification.

    Directed 3-cycles have no per-edge common-neighbor form, so
    ``directed=True`` is rejected here and the caller falls back to
    host (the reference's directed variant is host-only semantics
    anyway, triangle_count.cc:141-175)."""
    if directed:
        raise ValueError("sparse device path is undirected-only")
    import jax

    from ...utils.exact import combine_wrapped

    if csr.nnz == 0:
        return 0
    indptr, indices, row, wmax, nnz_pad = _prep(csr)
    f = _runner(csr.nrows, csr.nnz, wmax, "triangles", nnz_pad)
    wrapped, approx = f(indptr, indices, row)
    total = combine_wrapped(
        int(np.asarray(jax.device_get(wrapped))),
        float(np.asarray(jax.device_get(approx))),
    )
    return total // 6


def jaccard_weights_sparse_device(csr):
    """Per-edge Jaccard weights on one chip in O(block) memory —
    numerically identical to _jaccard_host (instance counting; self
    loops kept), for graphs whose flat ragged expansion Σ deg(u)² would
    not fit."""
    import jax.numpy as jnp

    if csr.nnz == 0:
        return jnp.zeros((0,), jnp.float32)
    indptr, indices, row, wmax, nnz_pad = _prep(csr)
    f = _runner(csr.nrows, csr.nnz, wmax, "jaccard", nnz_pad)
    return f(indptr, indices, row)

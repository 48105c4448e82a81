"""Primitive-op microbenchmarks on the live TPU chip.

Grounds the kernel design for the headline pipeline (VERDICT.md round-1
item 1): measures the XLA primitive costs that compose COO→CSR +
degree-reorder + permute + SpMV so bench.py's roofline accounting and
the Pallas/restructured-kernel decisions are evidence-based, not guessed.

Run: python tools/microbench.py [nnz_millions ...]   (ONE TPU process!)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def sync(o):
    leaves = jax.tree_util.tree_leaves(o)
    jax.block_until_ready(leaves)
    x = leaves[0]
    return float(np.asarray(x.reshape(-1)[:1])[0])


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    sync(f(*args))  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = f(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt * 1e3:10.2f} ms")
    return dt


def main():
    sizes = [int(float(a) * 1e6) for a in sys.argv[1:]] or [16_000_000]
    print("devices:", jax.devices())
    n = 1_000_000
    for nnz in sizes:
        print(f"--- nnz={nnz:,} n={n:,} ---")
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)

        @jax.jit
        def gen(k1, k2, k3):
            x = jax.random.normal(k1, (nnz,), jnp.float32)
            idx_n = jax.random.randint(k2, (nnz,), 0, n, dtype=jnp.int32)
            idx_nnz = jax.random.randint(k3, (nnz,), 0, nnz, dtype=jnp.int32)
            tbl = jax.random.normal(k1, (n,), jnp.float32)
            row_sorted = jnp.sort(idx_n)
            return x, idx_n, idx_nnz, tbl, row_sorted

        x, idx_n, idx_nnz, tbl, row_sorted = gen(k1, k2, k3)
        sync((x, idx_n, idx_nnz, tbl, row_sorted))

        timeit("copy (x+1)", lambda x: x + 1.0, x)
        timeit("cumsum f32", lambda x: jnp.cumsum(x), x)
        timeit("cumsum i32", lambda i: jnp.cumsum(jnp.ones_like(i)), idx_n)
        timeit("gather nnz<-n table", lambda t, i: t[i], tbl, idx_n)
        timeit("gather nnz<-nnz table", lambda t, i: t[i], x, idx_nnz)
        timeit(
            "gather nnz<-n (sorted idx)", lambda t, i: t[i], tbl, row_sorted
        )
        timeit(
            "scatter-add bincount(n)",
            lambda i: jnp.zeros((n,), jnp.int32).at[i].add(1),
            idx_n,
        )
        timeit(
            "scatter-set markers(nnz)",
            lambda i: jnp.zeros((nnz,), jnp.int32).at[i[:n]].set(1, mode="drop"),
            idx_n,
        )
        timeit("sort 1key f32", lambda x: jnp.sort(x), x)
        timeit(
            "sort 1key i32 + payload",
            lambda i, x: jax.lax.sort((i, x), num_keys=1, is_stable=False),
            idx_n,
            x,
        )
        timeit(
            "sort 2key + payload",
            lambda a, b, x: jax.lax.sort((a, b, x), num_keys=2, is_stable=False),
            idx_n,
            idx_nnz,
            x,
        )
        w = 128
        b = nnz // w
        x2 = x.reshape(b, w)
        timeit("rowsort (nnz/128,128) axis-1", lambda m: jnp.sort(m, axis=-1), x2)
        w = 1024
        x3 = x.reshape(nnz // w, w)
        timeit("rowsort (nnz/1024,1024) axis-1", lambda m: jnp.sort(m, axis=-1), x3)
        i2 = idx_n.reshape(b, 128)
        timeit(
            "rowsort 2arr (nnz/128,128)",
            lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False, dimension=1),
            i2,
            x2,
        )
        # fused pair gather: one (n,2) table lookup instead of two (n,) ones
        tbl2 = jnp.stack([tbl, tbl + 1.0], axis=1)
        timeit("gather pair (n,2) table", lambda t, i: t[i], tbl2, idx_n)
        # slice gather: n starts, W contiguous elements each (row-block move)
        for w in (16, 32):
            starts = jnp.minimum(idx_n[:n], nnz - w)

            def slice_gather(src, st, w=w):
                return jax.vmap(
                    lambda s: jax.lax.dynamic_slice(src, (s,), (w,))
                )(st)

            timeit(f"slice-gather n x ({w},) blocks", slice_gather, x, starts)
        # padded row-sort with payload (within-row column sort)
        w = 32
        kpad = idx_n[: (nnz // w) * w].reshape(-1, w)
        vpad = x[: (nnz // w) * w].reshape(-1, w)
        timeit(
            "rowsort (nnz/32,32) key+payload",
            lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False, dimension=1),
            kpad,
            vpad,
        )
        timeit(
            "sort 2key + 2 payloads",
            lambda a, b, x, y: jax.lax.sort((a, b, x, y), num_keys=2, is_stable=False),
            idx_n,
            idx_nnz,
            x,
            x,
        )
        # SpMV pieces
        indptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.searchsorted(row_sorted, jnp.arange(1, n + 1, dtype=jnp.int32)).astype(jnp.int32)]
        )
        indptr = jax.block_until_ready(indptr)

        def spmv_cumsum(vals, ip):
            run = jnp.concatenate([jnp.zeros((1,), vals.dtype), jnp.cumsum(vals)])
            return run[ip[1:]] - run[ip[:-1]]

        timeit("spmv tail (cumsum+2 n-gathers)", spmv_cumsum, x, indptr)
        timeit(
            "segment_sum(nnz->n)",
            lambda v, r: jax.ops.segment_sum(v, r, num_segments=n),
            x,
            row_sorted,
        )


if __name__ == "__main__":
    main()

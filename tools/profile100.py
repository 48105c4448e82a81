"""Stage- and candidate-primitive profiling at the BASELINE.md size (100M nnz).

Decides the round-2 kernel attack (VERDICT.md item 1): times each stage
of the current flagship pipeline and the candidate replacements
(slice-gather row grouping, padded row-sort, sorted-index gather, sort
payload scaling) at nnz=100M on the live chip.

Run: timeout 580 python tools/profile100.py   (ONE TPU process!)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_graph_on_device

NNZ = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 100_000_000
N = max(NNZ // 16, 1)


def sync(o):
    leaves = jax.tree_util.tree_leaves(o)
    jax.block_until_ready(leaves)
    x = leaves[0]
    return float(np.asarray(x.reshape(-1)[:1])[0])


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.1f} ms  {dt / NNZ * 1e9:6.2f} ns/nnz", flush=True)
    return dt


def main():
    print("generating graph...", flush=True)
    row, col, vals = make_graph_on_device(N, NNZ)
    sync(row)
    x = jnp.ones((N,), jnp.float32)
    print(f"n={N} nnz={NNZ} on {jax.devices()[0].platform}", flush=True)

    from sparsebase_tpu.convert.kernels import expand_row_table, indptr_from_sorted_rows

    # most decision-critical first — results survive a timeout
    import sparsebase_tpu as sb
    from sparsebase_tpu.models.pipelines import preprocess_pipeline

    coo = sb.COO(row, col, vals, (N, N))
    timeit("FULL preprocess_pipeline", preprocess_pipeline, coo, x)

    indptr = jax.jit(lambda r: indptr_from_sorted_rows(r, N, NNZ))(row)
    sync(indptr)
    degrees = indptr[1:] - indptr[:-1]
    ro = jax.jit(lambda d: jnp.zeros((N,), jnp.int32).at[jnp.argsort(d, stable=True)].set(jnp.arange(N, dtype=jnp.int32)))(degrees)
    sync(ro)

    def pair_gather(ro, x, col):
        table = jnp.stack([ro, jax.lax.bitcast_convert_type(x, jnp.int32)], axis=1)
        pair = table[col]
        return pair[:, 0], jax.lax.bitcast_convert_type(pair[:, 1], jnp.float32)

    timeit("pair gather (n,2) by col", pair_gather, ro, x, col)
    new_col = jax.jit(lambda ro, c: ro[c])(ro, col)
    sync(new_col)
    new_row = jax.jit(lambda ro, ip: expand_row_table(ro, ip, NNZ, out_dtype=jnp.int32))(ro, indptr)
    sync(new_row)
    timeit("sort2key (nr,nc,vals)", lambda a, b, v: jax.lax.sort((a, b, v), num_keys=2, is_stable=False), new_row, new_col, vals)
    timeit("expand_row_table", lambda ro, ip: expand_row_table(ro, ip, NNZ, out_dtype=jnp.int32), ro, indptr)
    timeit("indptr_from_sorted_rows", lambda r: indptr_from_sorted_rows(r, N, NNZ), row)
    timeit("argsort n + rank scatter", lambda d: jnp.zeros((N,), jnp.int32).at[jnp.argsort(d, stable=True)].set(jnp.arange(N, dtype=jnp.int32)), degrees)

    # --- candidates -------------------------------------------------------
    col_sorted = jax.jit(jnp.sort)(col)
    sync(col_sorted)
    timeit("gather ro[col_sorted]", lambda t, i: t[i], ro, col_sorted)
    timeit("sort1key (nr) + 2 payloads", lambda a, b, v: jax.lax.sort((a, b, v), num_keys=1, is_stable=False), new_row, new_col, vals)

    for W in (16, 64):
        rows = NNZ // W
        kp = col[: rows * W].reshape(rows, W)
        vp = vals[: rows * W].reshape(rows, W)
        timeit(
            f"rowsort ({rows}x{W}) key+payload",
            lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False, dimension=1),
            kp, vp,
        )

    # contiguous-run gather: permutation moving whole rows (avg run = 16).
    # src[k] = old position of the k-th element in degree-sorted row order:
    # expand (old_start - new_start) per new row, add arange.
    def make_src(ip, deg):
        perm = jnp.argsort(deg, stable=True)
        seg = deg[perm].astype(jnp.int32)
        new_ip = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(seg)])
        delta = ip[:-1].astype(jnp.int32)[perm] - new_ip[:-1]
        return expand_row_table(delta, new_ip, NNZ, out_dtype=jnp.int32) + jnp.arange(
            NNZ, dtype=jnp.int32
        )

    src = jax.jit(make_src)(indptr, degrees)
    sync(src)
    timeit("run-gather vals[src] (runs~16)", lambda v, s: v[s], vals, src)

    dst = jax.random.permutation(jax.random.PRNGKey(1), NNZ).astype(jnp.int32)
    sync(dst)
    timeit("scatter nnz->nnz set", lambda v, d: jnp.zeros((NNZ,), v.dtype).at[d].set(v), vals, dst)


if __name__ == "__main__":
    main()

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
    row, col, vals = make_graph_on_device(N, NNZ)
    x = jnp.ones((N,), jnp.float32)
    print(f"n={N} nnz={NNZ} on {jax.devices()[0].platform}", flush=True)

    from sparsebase_tpu.convert.kernels import expand_row_table, indptr_from_sorted_rows

    # --- current pipeline stages -----------------------------------------
    timeit("indptr_from_sorted_rows", lambda r: indptr_from_sorted_rows(r, N, NNZ), row)
    indptr = jax.jit(lambda r: indptr_from_sorted_rows(r, N, NNZ))(row)
    degrees = indptr[1:] - indptr[:-1]
    timeit("argsort n + rank scatter", lambda d: jnp.zeros((N,), jnp.int32).at[jnp.argsort(d, stable=True)].set(jnp.arange(N, dtype=jnp.int32)), degrees)
    ro = jax.jit(lambda d: jnp.zeros((N,), jnp.int32).at[jnp.argsort(d, stable=True)].set(jnp.arange(N, dtype=jnp.int32)))(degrees)

    def pair_gather(ro, x, col):
        table = jnp.stack([ro, jax.lax.bitcast_convert_type(x, jnp.int32)], axis=1)
        pair = table[col]
        return pair[:, 0], jax.lax.bitcast_convert_type(pair[:, 1], jnp.float32)

    timeit("pair gather (n,2) by col", pair_gather, ro, x, col)
    new_col = jax.jit(lambda ro, c: ro[c])(ro, col)
    timeit("single gather ro[col]", lambda t, i: t[i], ro, col)
    timeit("expand_row_table", lambda ro, ip: expand_row_table(ro, ip, NNZ, out_dtype=jnp.int32), ro, indptr)
    new_row = jax.jit(lambda ro, ip: expand_row_table(ro, ip, NNZ, out_dtype=jnp.int32))(ro, indptr)
    timeit("sort2key (nr,nc,vals)", lambda a, b, v: jax.lax.sort((a, b, v), num_keys=2, is_stable=False), new_row, new_col, vals)
    timeit("sort1key (nr) + 2 payloads", lambda a, b, v: jax.lax.sort((a, b, v), num_keys=1, is_stable=False), new_row, new_col, vals)
    timeit("cumsum f32 nnz", jnp.cumsum, vals)

    # --- candidates -------------------------------------------------------
    # sorted-index gather (indices ascending)
    col_sorted = jax.jit(jnp.sort)(col)
    timeit("gather ro[col_sorted]", lambda t, i: t[i], ro, col_sorted)

    # slice-gather: n rows x W contiguous block starting at indptr[perm[r]]
    perm = jax.jit(lambda d: jnp.argsort(d, stable=True))(degrees)
    starts = jnp.minimum(indptr[:-1][perm], NNZ - 64).astype(jnp.int32)
    for W in (16, 32, 64):
        def slice_gather(src, st, W=W):
            return jax.vmap(lambda s: jax.lax.dynamic_slice(src, (s,), (W,)))(st)
        timeit(f"slice-gather n x ({W},)", slice_gather, vals, starts)

    # padded row-sort (key+payload) at the padded sizes
    for W in (16, 32, 64):
        rows = NNZ // W
        kp = col[: rows * W].reshape(rows, W)
        vp = vals[: rows * W].reshape(rows, W)
        timeit(
            f"rowsort ({rows}x{W}) key+payload",
            lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False, dimension=1),
            kp, vp,
        )

    # scatter at nnz scale (for the dst-position formulation)
    dst = jax.jit(lambda c: jax.random.permutation(jax.random.PRNGKey(1), NNZ).astype(jnp.int32))(col)
    sync(dst)
    timeit("scatter nnz->nnz set", lambda v, d: jnp.zeros((NNZ,), v.dtype).at[d].set(v), vals, dst)

    # 2-key sort with 2 payloads (composition B)
    timeit("sort2key + 2 payloads", lambda a, b, v, w: jax.lax.sort((a, b, v, w), num_keys=2, is_stable=False), new_row, new_col, vals, vals)

    # full pipeline for reference
    import sparsebase_tpu as sb
    from sparsebase_tpu.models.pipelines import preprocess_pipeline

    coo = sb.COO(row, col, vals, (N, N))
    timeit("FULL preprocess_pipeline", preprocess_pipeline, coo, x)


if __name__ == "__main__":
    main()

"""Per-stage timing of the headline pipeline primitives on the real TPU.

Run: timeout 580 python tools/profile_pipeline.py
One TPU process at a time (see CLAUDE.md).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_graph_on_device

N, NNZ = 1_000_000, 16_000_000


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
    print(f"{name:40s} {dt * 1e3:9.1f} ms")
    return dt


def main():
    row, col, vals = make_graph_on_device(N, NNZ)
    x = jnp.ones((N,), jnp.float32)
    print(f"n={N} nnz={NNZ} on {jax.devices()[0].platform}")

    timeit("bincount(row,16M->1M)", lambda r: jnp.bincount(r, length=N), row)
    timeit("cumsum 16M f32", jnp.cumsum, vals)
    timeit("cumsum 1M i32", lambda r: jnp.cumsum(jnp.bincount(r, length=N)), row)
    timeit("argsort 1M", lambda d: jnp.argsort(d, stable=True), x)
    timeit("gather 16M from 1M table", lambda t, i: t[i], x, col)
    timeit("gather 16M f32 by 16M idx", lambda v, i: v[i], vals, col % NNZ)
    timeit(
        "sort2key+payload 16M",
        lambda r, c, v: jax.lax.sort((r, c, v), num_keys=2, is_stable=False),
        row, col, vals,
    )
    timeit(
        "sort2key no payload 16M",
        lambda r, c: jax.lax.sort((r, c), num_keys=2, is_stable=False),
        row, col,
    )
    timeit(
        "segment_sum 16M->1M",
        lambda v, r: jax.ops.segment_sum(v, r, num_segments=N),
        vals, row,
    )
    timeit(
        "cumsum-diff segsum 16M->1M",
        lambda v, p: jnp.diff(jnp.concatenate([jnp.zeros(1, v.dtype), jnp.cumsum(v)])[p]),
        vals,
        jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(jnp.bincount(row, length=N))]).astype(jnp.int32),
    )
    timeit(
        "row_of_nnz (marker scatter+cumsum)",
        lambda p: jnp.cumsum(jnp.zeros(NNZ, jnp.int32).at[p].add(1)) - 1,
        jnp.cumsum(jnp.bincount(row, length=N))[:-1].astype(jnp.int32),
    )

    # full current pipeline stages
    import sparsebase_tpu as sb
    from sparsebase_tpu.convert import coo_to_csr
    from sparsebase_tpu.models.pipelines import preprocess_pipeline, spmv_csr
    from sparsebase_tpu.ops.permute import PermuteOrderTwoParams, _permute_csr

    coo = sb.COO(row, col, vals, (N, N))
    timeit("coo_to_csr", coo_to_csr, coo)
    csr = jax.jit(coo_to_csr)(coo)

    def mkorder(csr):
        degrees = csr.indptr[1:] - csr.indptr[:-1]
        perm = jnp.argsort(degrees, stable=True)
        n = csr.nrows
        order = jnp.zeros((n,), dtype=csr.indices.dtype).at[perm].set(
            jnp.arange(n, dtype=csr.indices.dtype)
        )
        return order, perm

    timeit("degree order build", mkorder, csr)
    order, perm = jax.jit(mkorder)(csr)
    timeit(
        "permute_csr",
        lambda c, o: _permute_csr([c], PermuteOrderTwoParams(o, o)),
        csr, order,
    )
    permuted = jax.jit(lambda c, o: _permute_csr([c], PermuteOrderTwoParams(o, o)))(csr, order)
    timeit("spmv_csr", spmv_csr, permuted, x)
    timeit("FULL preprocess_pipeline", preprocess_pipeline, coo, x)


if __name__ == "__main__":
    main()

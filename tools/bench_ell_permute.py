"""ELL vs flat-CSR re-permutation cost at bench scale (one v5e chip).

The padded layout's value proposition (BENCH_local.md r3 probes): once
data is padded, a ROW relayout is one 2-D row gather (~1 ns/nnz) versus
the flat pipeline's ~15.7 ns/nnz sort composition. A full symmetric
permutation on ELL still pays the per-slot column-relabel gather (cost
scales with the padding ratio), so the honest claim is:

* rows-only relayouts (partition grouping, block reordering, degree
  re-sorts): ELL wins big;
* full symmetric permutes: ELL ~ties flat at moderate padding and loses
  at high padding.

This tool measures both on the bench power-law graph. Run alone.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    import bench
    from sparsebase_tpu.convert.kernels import indptr_from_sorted_rows

    NNZ = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 100_000_000
    N = NNZ // 16

    def sync(x):
        jax.block_until_ready(x)
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(jax.device_get(leaf.reshape(-1)[:1]))[0])

    def timeit(name, fn, *args, reps=3):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:52s} {dt*1e3:9.1f} ms  {dt/NNZ*1e9:6.2f} ns/nnz")
        return dt

    row, col, vals = bench.make_graph_on_device(N, NNZ)
    sync(row)
    indptr = jax.jit(lambda r: indptr_from_sorted_rows(r, N, NNZ))(row)
    deg = indptr[1:] - indptr[:-1]
    W = int(np.asarray(jax.device_get(deg.max())))
    print(f"n={N} nnz={NNZ} W(max degree)={W} pad ratio={N*W/NNZ:.2f}")

    # build ELL once (scatter entry, measured for the record)
    from sparsebase_tpu.convert.kernels import expand_row_table

    @jax.jit
    def to_ell(indptr, col, vals):
        pos = jnp.arange(NNZ, dtype=jnp.int32) - expand_row_table(
            indptr[:-1], indptr, NNZ, out_dtype=jnp.int32
        )
        lrow = expand_row_table(
            jnp.arange(N + 1, dtype=jnp.int32)[:-1], indptr, NNZ,
            out_dtype=jnp.int32,
        )
        flat = lrow * W + pos
        cols = jnp.zeros((N * W,), jnp.int32).at[flat].set(col).reshape(N, W)
        v = jnp.zeros((N * W,), jnp.float32).at[flat].set(vals).reshape(N, W)
        return cols, v

    timeit("flat -> ELL (scatter entry)", to_ell, indptr, col, vals)
    ecols, evals = to_ell(indptr, col, vals)
    lens = deg.astype(jnp.int32)
    perm = jax.jit(lambda k: jax.random.permutation(k, N))(jax.random.PRNGKey(1))
    sync(perm)

    @jax.jit
    def ell_permute_rows(ecols, evals, lens, perm):
        return ecols[perm], evals[perm], lens[perm]

    timeit("ELL rows-only permute (row gather x2 + lens)",
           ell_permute_rows, ecols, evals, lens, perm)

    @jax.jit
    def ell_full_permute(ecols, evals, lens, perm, ro):
        c2, v2, l2 = ecols[perm], evals[perm], lens[perm]
        mask = jnp.arange(W, dtype=jnp.int32)[None, :] < l2[:, None]
        nc = jnp.where(mask, ro[c2], jnp.iinfo(jnp.int32).max)
        cs, vs = jax.lax.sort((nc, v2), dimension=1, num_keys=1, is_stable=False)
        return jnp.where(mask, cs, 0), jnp.where(mask, vs, 0), l2

    ro = jax.jit(lambda p: jnp.zeros((N,), jnp.int32).at[p].set(
        jnp.arange(N, dtype=jnp.int32)))(perm)
    sync(ro)
    timeit("ELL full permute (rows + col relabel + rowsort)",
           ell_full_permute, ecols, evals, lens, perm, ro)

    # flat-CSR full symmetric permutation (the pipeline's relocation mix)
    @jax.jit
    def flat_full_permute(indptr, col, vals, ro):
        new_row = expand_row_table(ro, indptr, NNZ, out_dtype=jnp.int32)
        new_col = ro[col]
        return jax.lax.sort((new_row, new_col, vals), num_keys=2,
                            is_stable=False)

    timeit("flat CSR full permute (relabel + 2-key sort)",
           flat_full_permute, indptr, col, vals, ro)


if __name__ == "__main__":
    main()

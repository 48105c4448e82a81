"""Probe: can a padded (ELL-style) relocation pipeline beat the 2-key sort?

Round-2 measured the flagship at the XLA-primitive floor (~18.7 ns/nnz,
BENCH_local.md): pair gather 5.42 + sort2key 4.82 + boundary-sort indptr
3.72 + expand 1.03 + streams. VERDICT r2 item 1 asks for (a) real kernel
attempts at the two dominant ops and (b) an HBM calibration so the
roofline denominator is measured, not quoted.

This probe measures, at the bench scale (100M nnz, n = 6.25M), the
primitives of a *padded end-to-end* formulation in which the relocation
(row permute + re-layout) is expressed as n slice-gathers of W-wide
contiguous runs instead of an nnz-element sort/scatter:

  1. HBM streaming bandwidth: y = 2x+1 over 600M f32 (2.4 GB read+write)
  2. slice-gather: (n, W) <- flat[starts[i] : starts[i]+W] (one gather,
     n start indices, W contiguous elements each)
  3. per-row sort of the (n, W) padded block (key + payload)
  4. pair gather (n,2) by col — the irreducible relabel (re-check)
  5. 2-key sort over nnz — the thing to beat (re-check)
  6. boundary-sort indptr (re-check)

Run alone (ONE TPU process at a time). Writes nothing; prints a table.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    NNZ = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 100_000_000
    N = NNZ // 16
    W = 64

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(jax.device_get(x.reshape(-1)[:1]))[0])

    def timeit(name, fn, *args, reps=3):
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:48s} {dt*1e3:9.1f} ms   {dt/NNZ*1e9:6.2f} ns/nnz")
        return dt

    key = jax.random.PRNGKey(0)

    # ---- 1. HBM streaming calibration -------------------------------------
    M = 600_000_000  # 2.4 GB
    xs = jax.jit(lambda k: jax.random.normal(k, (M,), jnp.float32))(key)

    @jax.jit
    def triad(x):
        return x * 2.0 + 1.0

    dt = timeit("stream 600M f32 (2.4GB r + 2.4GB w)", triad, xs)
    gbs = (M * 4 * 2) / dt / 1e9
    print(f"    -> achieved HBM {gbs:.0f} GB/s")
    del xs

    # ---- generate bench-like data on device -------------------------------
    @jax.jit
    def gen(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        row = jax.random.randint(k1, (NNZ,), 0, N, dtype=jnp.int32)
        clump = jax.random.randint(k2, (NNZ,), 0, max(N // 100, 1), dtype=jnp.int32)
        uniform = jax.random.randint(k3, (NNZ,), 0, N, dtype=jnp.int32)
        col = jnp.where(jax.random.uniform(k4, (NNZ,)) < 0.2, clump, uniform)
        vals = jax.random.normal(k1, (NNZ,), jnp.float32)
        row_s, col_s, vals_s = jax.lax.sort((row, col, vals), num_keys=2)
        return row_s, col_s, vals_s

    row, col, vals = gen(key)
    sync(row)

    from sparsebase_tpu.convert.kernels import indptr_from_sorted_rows

    indptr = jax.jit(lambda r: indptr_from_sorted_rows(r, N, NNZ))(row)
    deg = np.asarray(jax.device_get(indptr[1:] - indptr[:-1]))
    print(f"    row degrees: max {deg.max()}  avg {deg.mean():.1f}  "
          f"(W={W} covers {100.0*(deg <= W).mean():.3f}% of rows)")

    # ---- 2. slice-gather relocation ----------------------------------------
    @jax.jit
    def perm_starts(indptr):
        degrees = indptr[1:] - indptr[:-1]
        perm = jnp.argsort(degrees, stable=True)
        return indptr[:-1][perm], degrees[perm]

    starts, plens = perm_starts(indptr)
    sync(starts)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    @jax.jit
    def slice_gather(flat, starts):
        flat = jnp.concatenate([flat, jnp.zeros((W,), flat.dtype)])
        return jax.lax.gather(
            flat,
            starts[:, None],
            dnums,
            slice_sizes=(W,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    timeit(f"slice-gather ({N}x{W} from flat, n starts)", slice_gather, col, starts)

    @jax.jit
    def slice_gather2(c, v, starts):
        # cols + vals in one shot (two gathers, shared starts)
        return slice_gather(c, starts), slice_gather(v, starts)

    dt2 = timeit("slice-gather cols+vals", slice_gather2, col, vals, starts)

    padded = slice_gather(col, starts)
    sync(padded)

    # ---- 3. per-row sort of the padded block ------------------------------
    @jax.jit
    def rowsort(p, lens):
        mask = jnp.arange(W, dtype=jnp.int32)[None, :] < lens[:, None]
        keyed = jnp.where(mask, p, jnp.iinfo(jnp.int32).max)
        pv = jnp.zeros_like(keyed)
        ks, _ = jax.lax.sort((keyed, pv), dimension=1, num_keys=1, is_stable=False)
        return ks

    timeit(f"rowsort ({N}x{W} key+payload)", rowsort, padded, plens)

    # ---- 4/5/6. reference points -------------------------------------------
    # NB: a standalone jit returning the (nnz, 2) pair-gather output OOMs:
    # XLA materializes s32[1e8,2] with T(8,128) tiling = 51.2 GB. Fuse a
    # reduce so the layout never materializes (tools/probe_hbm.py measures
    # the same op; the number matches the in-pipeline cost).
    @jax.jit
    def pair_reduce(c, table):
        pair = table[c]
        return jnp.sum(pair[:, 0] + pair[:, 1], dtype=jnp.int32)[None]

    table = jnp.stack([jnp.arange(N, dtype=jnp.int32)] * 2, axis=1)
    timeit("pair gather (n,2) by col (+fused reduce)", pair_reduce, col, table)

    @jax.jit
    def sort2(r, c, v):
        return jax.lax.sort((r, c, v), num_keys=2, is_stable=False)

    timeit("sort2key (row,col,vals)", sort2, row, col, vals)

    @jax.jit
    def bsort(r):
        return indptr_from_sorted_rows(r, N, NNZ)

    timeit("indptr_from_sorted_rows (boundary sort)", bsort, row)


if __name__ == "__main__":
    main()

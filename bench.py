"""Headline benchmark: sparse preprocessing throughput on one TPU chip.

Measures the canonical end-to-end slice (SURVEY.md §7 phase 2 /
BASELINE.md): COO→CSR conversion + degree reorder + row/col permutation
+ SpMV, fully jitted on device, on a synthetic power-law graph. Reports
steady-state throughput in nnz/s.

``vs_baseline`` compares against the BASELINE.md target of 70% of a
gather/sort-bound roofline estimate for this op mix (see TARGET_NNZ_S
derivation below).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

# Baseline target: 70% of the XLA-primitive composition bound measured
# on this v5e (see docs/tutorials/004_tpu_spmv.md): the pipeline reduces
# to one variadic 2-key sort over nnz (~250 ms at 16M), ~4 random
# gathers (~145 ms each), and one segment scatter-add (~270 ms)
# => ~1.1 s => ~1.5e7 nnz/s primitive-bound; a custom (Pallas) sort and
# gather would raise the ceiling ~10x toward the HBM roofline
# (~60 B/nnz => ~1e10 nnz/s) — tracked as future kernel work.
TARGET_NNZ_S = 1.0e7  # 70% of the XLA-primitive bound


def make_graph(n, avg_deg, seed=0):
    """Host-side synthetic skewed graph (used by tests/drives)."""
    rng = np.random.default_rng(seed)
    nnz = n * avg_deg
    # skewed (power-law-ish) targets: mix uniform + preferential clump
    row = rng.integers(0, n, nnz).astype(np.int64)
    col = np.where(
        rng.random(nnz) < 0.2,
        rng.integers(0, max(n // 100, 1), nnz),
        rng.integers(0, n, nnz),
    ).astype(np.int64)
    keys = np.unique(row * n + col)
    row = (keys // n).astype(np.int32)
    col = (keys % n).astype(np.int32)
    vals = rng.standard_normal(len(row)).astype(np.float32)
    return row, col, vals


def make_graph_on_device(n, nnz, seed=0):
    """Generate a row-major-sorted synthetic COO entirely on device —
    the benchmark path must not pay host↔device transfers (the axon
    tunnel moves ~1 MB/s; 100 MB of COO arrays would dominate)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        row = jax.random.randint(k1, (nnz,), 0, n, dtype=jnp.int32)
        clump = jax.random.randint(k2, (nnz,), 0, max(n // 100, 1), dtype=jnp.int32)
        uniform = jax.random.randint(k3, (nnz,), 0, n, dtype=jnp.int32)
        col = jnp.where(jax.random.uniform(k4, (nnz,)) < 0.2, clump, uniform)
        vals = jax.random.normal(k1, (nnz,), jnp.float32)
        # row-major order: one fused variadic sort
        row_s, col_s, vals_s = jax.lax.sort((row, col, vals), num_keys=2)
        return row_s, col_s, vals_s

    return gen(jax.random.PRNGKey(seed))


def main():
    import jax
    import jax.numpy as jnp

    import sparsebase_tpu as sb
    from sparsebase_tpu.models import preprocess_pipeline

    n, nnz = 1_000_000, 16_000_000
    row, col, vals = make_graph_on_device(n, nnz)
    coo = sb.COO(row, col, vals, (n, n))
    x = jnp.ones((n,), jnp.float32)

    fn = jax.jit(preprocess_pipeline)

    def sync(o):
        # On this image's axon (tunnel) backend block_until_ready can
        # return before execution completes; materializing one element
        # forces the full dependency chain (device executes in order).
        jax.block_until_ready(o)
        return float(np.asarray(o[:1])[0])

    sync(fn(coo, x))  # warmup / compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(coo, x)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    nnz_per_s = nnz / dt
    print(
        json.dumps(
            {
                "metric": "preprocess_pipeline_throughput",
                "value": round(nnz_per_s, 1),
                "unit": "nnz/s",
                "vs_baseline": round(nnz_per_s / TARGET_NNZ_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

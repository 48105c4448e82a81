"""Triangle-count bench on the real chip.

Section A — MXU dense path at n=16384 (A² on the systolic array, bf16
in / f32 accumulate): time per count + effective TFLOP/s (2·n³ for the
matmul; the masked reduction is bandwidth-trivial next to it).

Section B (round 5) — sparse owner-window tier past the dense wall
(ops/feature/sparse_common.py, the single-chip port of the round-4
sparse ring): n=1M / avg_deg edges, no densification. Host parity is
asserted at a subsampled size first. Times per count + edge throughput.

Usage:

    python tools/bench_triangles.py [n_dense] [avg_deg] [n_sparse]
    python tools/bench_triangles.py --cpu ...   # dry-run on CPU backend
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _gen_csr(n, nnz, seed=0):
    import jax
    import jax.numpy as jnp

    from sparsebase_tpu.formats.csr import CSR

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        row = jax.random.randint(k1, (nnz,), 0, n, dtype=jnp.int32)
        col = jax.random.randint(k2, (nnz,), 0, n, dtype=jnp.int32)
        # symmetrize so the undirected count semantics hold
        row_a = jnp.concatenate([row, col])
        col_a = jnp.concatenate([col, row])
        row_s, col_s = jax.lax.sort((row_a, col_a), num_keys=2)
        counts = jnp.zeros((n,), jnp.int32).at[row_s].add(1)
        indptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        return indptr, col_s

    indptr, col = gen(jax.random.PRNGKey(seed))
    return CSR(indptr, col, None, (n, n))


def main():
    import jax

    argv = [a for a in sys.argv[1:] if a != "--cpu"]
    if "--cpu" in sys.argv[1:]:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sparsebase_tpu.ops.feature.sparse_common import (
        jaccard_weights_sparse_device,
        triangle_count_sparse_device,
    )
    from sparsebase_tpu.ops.feature.triangles import _device_dense_count

    n = int(argv[0]) if len(argv) > 0 else 16384
    avg_deg = int(argv[1]) if len(argv) > 1 else 16
    n_sparse = int(argv[2]) if len(argv) > 2 else 1_000_000

    # ---- A: dense MXU tier ------------------------------------------------
    csr = _gen_csr(n, n * avg_deg // 2)
    t = _device_dense_count(csr, directed=False)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        t = _device_dense_count(csr, directed=False)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * n * n * n
    print(
        f"A dense  n={n} nnz~{csr.nnz}: triangles={t}  {dt * 1e3:.1f} ms/count  "
        f"{flops / dt / 1e12:.1f} TFLOP/s (matmul-equivalent)",
        flush=True,
    )

    # ---- B: sparse owner-window tier (past the dense wall) ---------------
    # parity probe at a host-checkable size first
    small = _gen_csr(50_000, 50_000 * avg_deg // 2, seed=1)
    from sparsebase_tpu.ops.feature.triangles import TriangleCount

    host = TriangleCount().get_triangle_count(small.to_host())
    dev = triangle_count_sparse_device(small)
    assert int(dev) == int(host), (int(dev), int(host))
    print(f"B parity n=50k: sparse-device {int(dev)} == host {int(host)}", flush=True)

    big = _gen_csr(n_sparse, n_sparse * avg_deg // 2, seed=2)
    t = triangle_count_sparse_device(big)  # compile + run
    t0 = time.perf_counter()
    tri = triangle_count_sparse_device(big)
    dt = time.perf_counter() - t0
    print(
        f"B sparse n={n_sparse} nnz~{big.nnz}: triangles={tri}  "
        f"{dt * 1e3:.1f} ms/count  {big.nnz / dt / 1e6:.1f} M edges/s",
        flush=True,
    )

    w = jaccard_weights_sparse_device(big)
    float(np.asarray(w.reshape(-1)[:1])[0])  # materialize (axon early-return)
    t0 = time.perf_counter()
    w = jaccard_weights_sparse_device(big)
    float(np.asarray(w.reshape(-1)[:1])[0])
    dt = time.perf_counter() - t0
    print(
        f"B sparse jaccard n={n_sparse}: {dt * 1e3:.1f} ms  "
        f"{big.nnz / dt / 1e6:.1f} M edges/s",
        flush=True,
    )


if __name__ == "__main__":
    main()

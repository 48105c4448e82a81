"""MXU triangle-count bench on the real chip: device dense path at
n=16384 (A² on the systolic array, bf16 in / f32 accumulate).

Prints time per count and effective TFLOP/s (2·n³ for the matmul; the
masked reduction is bandwidth-trivial next to it). Usage:

    python tools/bench_triangles.py [n] [avg_deg]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sparsebase_tpu.formats.csr import CSR
    from sparsebase_tpu.ops.feature.triangles import _device_dense_count

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nnz = n * avg_deg

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        row = jax.random.randint(k1, (nnz,), 0, n, dtype=jnp.int32)
        col = jax.random.randint(k2, (nnz,), 0, n, dtype=jnp.int32)
        row_s, col_s = jax.lax.sort((row, col), num_keys=2)
        counts = jnp.zeros((n,), jnp.int32).at[row_s].add(1)
        indptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        return indptr, col_s

    indptr, col = gen(jax.random.PRNGKey(0))
    csr = CSR(indptr, col, None, (n, n))

    # warmup/compile, then timed reps (materialize the scalar result —
    # block_until_ready may return early on this backend)
    t = _device_dense_count(csr, directed=False)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        t = _device_dense_count(csr, directed=False)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * n * n * n
    print(
        f"n={n} nnz~{nnz}: triangles={t}  {dt * 1e3:.1f} ms/count  "
        f"{flops / dt / 1e12:.1f} TFLOP/s (matmul-equivalent)"
    )


if __name__ == "__main__":
    main()

"""HBM calibration + remaining relocation formulations (VERDICT r2 item 1).

probe_padded.py measured 159 GB/s on a 2.4GB triad and 108 ns/nnz for
slice-gather relocation. This probe pins down the achieved-bandwidth
number (copy / triad / reduce / donated triad) and measures the last
relocation candidates: 2-D row gather (a (n,16) operand indexed by a
row permutation) and the fused pair-gather (inside one jit with a
reduce, so no pathological (nnz,2) layout materializes — standalone it
OOMs: XLA tiles s32[1e8,2] as T(8,128), 51.2 GB).

Run alone (ONE TPU process at a time).
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

    NNZ = 100_000_000
    N = NNZ // 16

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(jax.device_get(x.reshape(-1)[:1]))[0])

    def timeit(name, fn, *args, reps=3, bytes_moved=None):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        extra = f"  {bytes_moved/dt/1e9:7.0f} GB/s" if bytes_moved else ""
        print(f"{name:44s} {dt*1e3:9.1f} ms   {dt/NNZ*1e9:6.2f} ns/nnz{extra}")
        return dt

    key = jax.random.PRNGKey(0)
    M = 600_000_000
    xs = jax.jit(lambda k: jax.random.normal(k, (M,), jnp.float32))(key)
    sync(xs)

    timeit("copy 600M f32", jax.jit(lambda x: x + 0.0), xs, bytes_moved=M * 8)
    timeit("triad 600M f32", jax.jit(lambda x: x * 2.0 + 1.0), xs, bytes_moved=M * 8)
    timeit("reduce 600M f32 (read only)",
           jax.jit(lambda x: jnp.sum(x.reshape(-1, 1000), axis=1)), xs,
           bytes_moved=M * 4)
    del xs

    # 2-D row gather: (N,16) operand permuted along axis 0
    x2d = jax.jit(lambda k: jax.random.normal(k, (N, 16), jnp.float32))(key)
    perm = jax.jit(lambda k: jax.random.permutation(k, N))(key)
    sync(x2d)
    timeit("2-D row gather x2d[perm] (6.25M x 16)",
           jax.jit(lambda a, p: a[p]), x2d, perm, bytes_moved=NNZ * 8)
    del x2d

    # fused pair gather at bench scale (reduce inside jit)
    col = jax.jit(lambda k: jax.random.randint(k, (NNZ,), 0, N, jnp.int32))(key)
    table = jax.jit(lambda k: jax.random.randint(k, (N, 2), 0, N, jnp.int32))(key)
    sync(col)

    @jax.jit
    def pair_reduce(c, t):
        pair = t[c]
        return jnp.sum(pair[:, 0] + pair[:, 1], dtype=jnp.int32)[None]

    timeit("pair gather (n,2)[col] + reduce (fused)", pair_reduce, col, table)

    @jax.jit
    def single_reduce(c, t):
        return jnp.sum(t[:, 0][c], dtype=jnp.int32)[None]

    timeit("single gather t0[col] + reduce (fused)", single_reduce, col, table)


if __name__ == "__main__":
    main()

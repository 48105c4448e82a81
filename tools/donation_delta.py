"""Measure the move-conversion (donation) delta on the flagship pipeline.

VERDICT.md round-1 item 8: the analogue of the reference's move
conversions (converter_order_two.cc:258-341) is jit buffer donation —
this times preprocess_pipeline with and without ``donate_argnums`` at
the BASELINE.md size and reports the time and peak-memory deltas.

Peak-memory stats are cumulative per process, so each mode runs in its
own invocation:

    timeout 580 python tools/donation_delta.py plain  [nnz_millions]
    timeout 580 python tools/donation_delta.py donate [nnz_millions]

(ONE TPU process at a time!)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from bench import make_graph_on_device

MODE = sys.argv[1] if len(sys.argv) > 1 else "plain"
NNZ = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else 100_000_000
N = max(NNZ // 16, 1)


def sync(out):
    _, y = out
    jax.block_until_ready(y)
    return float(np.asarray(y[:1])[0])


def peak_bytes():
    try:
        stats = jax.devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0)
    except Exception:
        return 0


def main():
    import sparsebase_tpu as sb
    from sparsebase_tpu.models.pipelines import (
        preprocess_pipeline,
        preprocess_pipeline_donating,
    )

    x = jnp.ones((N,), jnp.float32)
    print(f"n={N} nnz={NNZ} mode={MODE} on {jax.devices()[0].platform}", flush=True)

    if MODE == "plain":
        row, col, vals = make_graph_on_device(N, NNZ)
        coo = sb.COO(row, col, vals, (N, N))
        fn = jax.jit(preprocess_pipeline)
        sync(fn(coo, x))  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(coo, x)
        sync(out)
        t = (time.perf_counter() - t0) / 3
    else:
        # donation consumes the input; rebuild each rep (the steady-state
        # ingest -> preprocess -> drop-input pattern)
        ts = []
        for _ in range(4):
            row, col, vals = make_graph_on_device(N, NNZ)
            coo = sb.COO(row, col, vals, (N, N))
            jax.block_until_ready(coo.row)
            t0 = time.perf_counter()
            out = preprocess_pipeline_donating(coo, x)
            sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts[1:])  # first call compiles
    print(
        f"{MODE}: {t*1e3:8.1f} ms/rep  peak {peak_bytes()/2**30:.3f} GiB", flush=True
    )


if __name__ == "__main__":
    main()

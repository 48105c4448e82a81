"""DIA banded-SpMV kernel tuning on the chip (round 4): the payoff
kernel ran at ~12-14 % of stream roofline (24.2 ms XLA / 20.6 Pallas at
64M nnz, 33 diagonals — R4_TPU.json §B); this probe sweeps the Pallas
block size and measures the XLA roll path for comparison. Appends to
R4_TPU_followup.json section F.

Usage: python tools/probe_dia.py [nnz_M=64] [--cpu]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

OUT = Path(
    os.environ.get(
        "R4_TPU_OUT", Path(__file__).parent.parent / "R4_TPU_followup.json"
    )
)


def main():
    import jax

    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from sparsebase_tpu.formats.dia import DIA
    from sparsebase_tpu.ops.kernels import banded_spmv, banded_spmv_pallas

    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    sec = results.setdefault("F_dia_tuning", {})

    def save(k, v):
        sec[k] = v
        OUT.write_text(json.dumps(results, indent=1, default=str))
        print(f"[{time.strftime('%H:%M:%S')}] F.{k} = {v}", flush=True)

    nnz_m = float(sys.argv[1]) if len(sys.argv) > 1 else 64.0
    W = 16
    k = 2 * W + 1
    n = int(nnz_m * 1e6) // k
    key = jax.random.PRNGKey(0)
    offsets = jnp.arange(-W, W + 1, dtype=jnp.int32)
    data = jax.random.normal(key, (k, n), jnp.float32)
    x = jnp.ones((n,), jnp.float32)
    dia = DIA(offsets, data, (n, n))
    offc, shp = dia.offsets, dia.shape
    save("n", n)
    save("diagonals", k)

    def sync(y):
        jax.block_until_ready(y)
        return float(np.asarray(y.reshape(-1)[:1])[0])

    def timeit(fn, *args, reps=5):
        y = fn(*args)
        ref = sync(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(*args)
        sync(y)
        return (time.perf_counter() - t0) / reps, ref

    f_xla = jax.jit(lambda d, xx: banded_spmv(DIA(offc, d, shp), xx))
    t, ref = timeit(f_xla, data, x)
    save("xla_roll_ms", round(t * 1e3, 2))

    interp = jax.default_backend() != "tpu"
    for tiled in (False, True):
        tag = "tiled" if tiled else "strided"
        blocks = (
            (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
            if not tiled
            else (2048, 8192)
        )
        for block in blocks:
            try:
                f = jax.jit(
                    lambda d, xx, b=block, tl=tiled: banded_spmv_pallas(
                        DIA(offc, d, shp), xx, interpret=interp, block=b, tiled=tl
                    )
                )
                t, got = timeit(f, data, x)
                assert abs(got - ref) < 1e-2 * max(abs(ref), 1.0), (got, ref)
                save(f"pallas_{tag}_block{block}_ms", round(t * 1e3, 2))
            except Exception as e:
                save(f"pallas_{tag}_block{block}_error", repr(e)[:300])

    # bf16 band: halves the strided reads (f32 accumulate); tolerance is
    # relative since products round to bf16 precision
    data16 = data.astype(jnp.bfloat16)
    for block in (2048, 4096, 8192):
        try:
            f = jax.jit(
                lambda d, xx, b=block: banded_spmv_pallas(
                    DIA(offc, d, shp), xx, interpret=interp, block=b
                )
            )
            t, got = timeit(f, data16, x)
            assert abs(got - ref) < 2e-2 * max(abs(ref), 1.0), (got, ref)
            save(f"pallas_bf16_block{block}_ms", round(t * 1e3, 2))
        except Exception as e:
            save(f"pallas_bf16_block{block}_error", repr(e)[:300])

    # stream roofline reference: bytes = data (k*n*4) + x + y
    gb = (k * n * 4 + 2 * n * 4) / 1e9
    save("stream_gb", round(gb, 3))
    save("roofline_ms_at_198GBs", round(gb / 198 * 1e3, 2))


if __name__ == "__main__":
    main()

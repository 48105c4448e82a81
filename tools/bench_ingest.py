"""Parse-throughput benchmark at the BASELINE ingest scale (VERDICT r2
item 7; SURVEY.md §7 hard part 6: "MTX parsing throughput for 100M-nnz
inputs").

Generates a large pattern .mtx on disk once (default 50M nnz), then
measures nnz/s for:

  * fastio (mmap + OpenMP native parse, the PIGO-parity path;
    reference: external/pigo/pigo.hpp + io/pigo_mtx_reader.cc)
  * the pure-Python MTXReader (numpy fromstring path) — on a 5M-nnz
    slice, since the full file takes minutes

CPU-only (runs on the host; no TPU contention). The parsed arrays stay
host-side: the axon tunnel moves ~1 MB/s H2D, so shipping a 50M-nnz COO
to the device is tunnel-bound here, not parse-bound — on a real TPU VM
the device_put rides PCIe at GB/s and the parse rate below is the
bottleneck that matters.

    python tools/bench_ingest.py [nnz_millions]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def write_mtx(path: Path, n: int, nnz: int, seed: int = 0) -> None:
    print(f"generating {path} ({nnz/1e6:.0f}M nnz)...", flush=True)
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = rng.integers(1, n + 1, nnz).astype(np.int64)
    cols = rng.integers(1, n + 1, nnz).astype(np.int64)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write(f"{n} {n} {nnz}\n")
    pd.DataFrame({"r": rows, "c": cols}).to_csv(
        path, sep=" ", header=False, index=False, mode="a"
    )


def main():
    from sparsebase_tpu.io.mtx import MTXReader
    from sparsebase_tpu.io.pigo import PigoMTXReader, _fastio_enabled

    nnz_m = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
    nnz = int(nnz_m * 1e6)
    n = max(nnz // 16, 1)

    big = Path(f"/tmp/ingest_{int(nnz_m)}m.mtx")
    small = Path("/tmp/ingest_5m.mtx")
    if not big.exists():
        write_mtx(big, n, nnz)
    if not small.exists():
        write_mtx(small, max(5_000_000 // 16, 1), 5_000_000)
    print(f"file size: {big.stat().st_size/1e9:.2f} GB")
    assert _fastio_enabled(), "fastio extension not built"

    def bench(reader_cls, path, count, reps=2, label=""):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            coo = reader_cls(str(path)).read_coo()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            assert coo.nnz == count, (coo.nnz, count)
        print(f"{label:42s} {best:8.2f} s   {count/best/1e6:8.1f} M nnz/s")
        return best

    bench(PigoMTXReader, small, 5_000_000, reps=3,
          label="fastio parse 5M nnz")
    bench(MTXReader, small, 5_000_000, reps=1,
          label="python MTXReader 5M nnz (naive baseline)")
    bench(PigoMTXReader, big, nnz, reps=2,
          label=f"fastio parse {nnz_m:.0f}M nnz (end-to-end)")

    # raw parse kernel with reused (warm) buffers: isolates the parser
    # from this VM's ~60 µs/4K-page first-touch faults and the
    # downstream COO sort
    import ctypes

    from sparsebase_tpu.io import fastio
    from sparsebase_tpu.io.pigo import _body_offset

    off, _ = _body_offset(str(big))
    n = fastio.count_entries(str(big), off)
    buffers = (np.zeros(n, np.int64), np.zeros(n, np.int64), None)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        rows, cols, _v = fastio.parse_entries(str(big), off, False, out=buffers)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{'fastio RAW parse, warm buffers':42s} {best:8.2f} s   "
          f"{n/best/1e6:8.1f} M nnz/s")


if __name__ == "__main__":
    main()

"""Round-5 batched TPU suite (one process, incremental JSON — CLAUDE.md
measurement discipline; chip-fault-risky section LAST).

Sections (pass as first arg, e.g. ``ABCD``; default ``ABCD``):

  A — blocked-indptr K re-sweep at the bench shape (VERDICT r4 #2)
  B — pipeline y-branch variants at 100M nnz: boundary-diff single
      gather, fused (y, degrees) 2-wide scatter, post-sort reduction
  C — headline re-measure with the winning combination (bench.py metric)
  D — triangles/Jaccard: dense MXU tier + the round-5 single-chip
      sparse owner-window tier (parity gate + throughput)
  E — device-RCM size ascent 1.5M→4M vertices (FAULT RISK: r4 wedged
      the chip at 4M for ~45 min; run LAST, everything saved before)

Usage:
    python tools/r5_perf.py [sections] [nnz_M] [--cpu]
    python tools/r5_perf.py ABCD 100
    python tools/r5_perf.py E 100          # fault-risky ascent only
    python tools/r5_perf.py ABCD 0.5 --cpu # dry-run on CPU backend
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

OUT = Path(os.environ.get("R5_TPU_OUT", REPO / "R5_TPU.json"))
# merge into an existing artifact instead of clobbering other sections
# (each batch runs a subset of sections; round-5 lesson)
try:
    RES = json.loads(OUT.read_text())
except Exception:
    RES = {}


def save():
    OUT.write_text(json.dumps(RES, indent=1))


def main():
    sections = sys.argv[1] if len(sys.argv) > 1 else "ABCD"
    nnz_m = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    cpu = "--cpu" in sys.argv

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import sparsebase_tpu as sb
    from bench import make_graph_on_device
    from sparsebase_tpu.convert.kernels import indptr_from_sorted_rows_blocked
    from sparsebase_tpu.models.pipelines import _permute_and_spmv

    nnz = int(nnz_m * 1e6)
    n = max(nnz // 16, 1)
    RES["shape"] = {"n": n, "nnz": nnz, "backend": jax.devices()[0].platform}
    save()

    def sync_arr(a):
        jax.block_until_ready(a)
        return float(np.asarray(a.reshape(-1)[:1])[0])

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        sync_arr(out[1] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync_arr(out[1] if isinstance(out, tuple) else out)
        return (time.perf_counter() - t0) / reps

    row, col, vals = make_graph_on_device(n, nnz)
    coo = sb.COO(row, col, vals, (n, n))
    x = jnp.ones((n,), jnp.float32)
    print(f"graph ready n={n} nnz={nnz}", flush=True)

    # ---- A: blocked-indptr K sweep ----------------------------------------
    if "A" in sections:
        RES["A_indptr_K"] = {}
        for K in (128, 256, 512, 1024):
            f = jax.jit(
                lambda r, K=K: indptr_from_sorted_rows_blocked(r, n, nnz, block=K)
            )
            dt = timeit(f, coo.row)
            RES["A_indptr_K"][str(K)] = {
                "s": round(dt, 4), "ns_per_nnz": round(dt * 1e9 / nnz, 3)
            }
            print(f"A K={K}: {dt*1e3:.1f} ms ({dt*1e9/nnz:.2f} ns/nnz)", flush=True)
            save()

    # ---- B: y-branch variants ---------------------------------------------
    def pipeline_with(**kw):
        cg = kw.pop("counts_gather", False)

        def run(coo, x):
            indptr = indptr_from_sorted_rows_blocked(coo.row, n, nnz)
            degrees = indptr[1:] - indptr[:-1]
            idt = coo.row.dtype
            perm = jnp.argsort(degrees, stable=True)
            ro = jnp.zeros((n,), idt).at[perm].set(jnp.arange(n, dtype=idt))
            extra = {"perm_for_counts": perm} if cg else {}
            return _permute_and_spmv(coo, indptr, degrees, ro, x, **kw, **extra)

        return jax.jit(run)

    variants = {
        "baseline_r4": dict(boundary_diff=False, fused_scatter=False),
        "boundary_diff": dict(boundary_diff=True, fused_scatter=False),
        "fused_scatter": dict(boundary_diff=False, fused_scatter=True),
        "diff+fused": dict(boundary_diff=True, fused_scatter=True),
        "post_sort": dict(post_sort_reduce=True),
        "diff+unique": dict(boundary_diff=True, unique_hint=True),
        "diff+counts_gather": dict(boundary_diff=True, counts_gather=True),
        "diff+unique+cg": dict(boundary_diff=True, unique_hint=True,
                               counts_gather=True),
    }
    if "B" in sections:
        RES["B_variants"] = {}
        for name, kw in variants.items():
            dt = timeit(pipeline_with(**kw), coo, x)
            RES["B_variants"][name] = {
                "s": round(dt, 4),
                "ns_per_nnz": round(dt * 1e9 / nnz, 3),
                "nnz_per_s": round(nnz / dt, 1),
            }
            print(f"B {name}: {dt*1e3:.0f} ms ({dt*1e9/nnz:.2f} ns/nnz)", flush=True)
            save()

    # ---- C: headline with the winner --------------------------------------
    if "C" in sections:
        src = RES.get("B_variants") or {}
        best = min(src, key=lambda k: src[k]["s"]) if src else "diff+fused"
        dt = timeit(pipeline_with(**variants[best]), coo, x, reps=5)
        RES["C_headline"] = {
            "variant": best,
            "ns_per_nnz": round(dt * 1e9 / nnz, 3),
            "nnz_per_s": round(nnz / dt, 1),
            "vs_primitive_bound": round((nnz / dt) / (1e9 / 14.97), 4),
        }
        print(f"C headline[{best}]: {nnz/dt/1e6:.1f} M nnz/s", flush=True)
        save()

    # ---- D: triangle/Jaccard tiers ----------------------------------------
    if "D" in sections:
        from sparsebase_tpu.formats.csr import CSR
        from sparsebase_tpu.ops.feature.sparse_common import (
            jaccard_weights_sparse_device,
            triangle_count_sparse_device,
        )
        from sparsebase_tpu.ops.feature.triangles import (
            TriangleCount,
            _device_dense_count,
        )
        sys.path.insert(0, str(REPO / "tools"))
        from bench_triangles import _gen_csr

        RES["D_triangles"] = {}
        nd = 2048 if cpu else 16384
        csr_d = _gen_csr(nd, nd * 8)
        # _device_dense_count returns a host int (it syncs internally)
        _device_dense_count(csr_d, directed=False)  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            _device_dense_count(csr_d, directed=False)
        dt = (time.perf_counter() - t0) / 3
        RES["D_triangles"]["dense_mxu"] = {
            "n": nd, "s": round(dt, 4),
            "tflops": round(2.0 * nd**3 / dt / 1e12, 2),
        }
        print(f"D dense n={nd}: {dt*1e3:.1f} ms", flush=True)
        save()
        # parity gate at a host-checkable size, then the big sparse tier
        small = _gen_csr(50_000, 50_000 * 8, seed=1)
        host = TriangleCount().get_triangle_count(small.to_host())
        dev = triangle_count_sparse_device(small)
        RES["D_triangles"]["parity_50k"] = {
            "host": int(host), "sparse_device": int(dev),
            "match": bool(int(host) == int(dev)),
        }
        save()
        # ascend sizes cautiously: the first r5 batch CRASHED the TPU
        # worker at n=1M (16M nnz); each successful size is saved before
        # the next attempt, and config.sparse_common_device_max_nnz is
        # raised only to the largest measured-good nnz.
        sizes = (100_000,) if cpu else (250_000, 500_000)
        for ns in sizes:
            big = _gen_csr(ns, ns * 8, seed=2)
            key = f"sparse_{ns//1000}k"
            RES["D_triangles"][key] = {"status": "launched", "nnz": int(big.nnz)}
            save()
            tri = triangle_count_sparse_device(big)  # compile+run
            t0 = time.perf_counter()
            tri = triangle_count_sparse_device(big)
            dt = time.perf_counter() - t0
            RES["D_triangles"][key] = {
                "status": "ok", "n": ns, "nnz": int(big.nnz),
                "triangles": int(tri), "s": round(dt, 3),
                "medges_per_s": round(big.nnz / dt / 1e6, 2),
            }
            print(f"D sparse n={ns}: {dt*1e3:.0f} ms", flush=True)
            save()
            w = jaccard_weights_sparse_device(big)
            sync_arr(w)
            t0 = time.perf_counter()
            w = jaccard_weights_sparse_device(big)
            sync_arr(w)
            dt = time.perf_counter() - t0
            RES["D_triangles"][key]["jaccard_s"] = round(dt, 3)
            RES["D_triangles"][key]["jaccard_medges_per_s"] = round(
                big.nnz / dt / 1e6, 2
            )
            save()
            print(f"D jaccard n={ns}: {dt*1e3:.0f} ms", flush=True)

    # ---- E: device-RCM size ascent (FAULT RISK — LAST) ---------------------
    if "E" in sections:
        from sparsebase_tpu import set_config
        from sparsebase_tpu.formats.csr import CSR
        from sparsebase_tpu.ops.reorder.rcm import _rcm_device

        RES["E_rcm_ascent"] = {}
        save()
        for n_try in (1_500_000, 2_000_000, 3_000_000, 4_000_000):
            if cpu and n_try > 1_500_000:
                break
            nv = n_try if not cpu else 50_000
            e = nv * 8
            set_config(rcm_device_max_n=max(nv, 1_000_000))
            # symmetric-ish banded+random graph like the r4 suite
            @jax.jit
            def gen(key):
                k1, k2 = jax.random.split(key)
                r = jax.random.randint(k1, (e,), 0, nv, dtype=jnp.int32)
                c = jax.random.randint(k2, (e,), 0, nv, dtype=jnp.int32)
                ra = jnp.concatenate([r, c])
                ca = jnp.concatenate([c, r])
                rs, cs = jax.lax.sort((ra, ca), num_keys=2)
                counts = jnp.zeros((nv,), jnp.int32).at[rs].add(1)
                ip = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32),
                     jnp.cumsum(counts).astype(jnp.int32)]
                )
                return ip, cs

            ip, cs = gen(jax.random.PRNGKey(0))
            g = CSR(ip, cs, None, (nv, nv))
            print(f"E trying device RCM at n={nv} ...", flush=True)
            RES["E_rcm_ascent"][str(nv)] = {"status": "launched"}
            save()  # if the chip faults here, the attempt is on record
            t0 = time.perf_counter()
            order = _rcm_device(g)
            ok = sync_arr(order.astype(jnp.float32))
            dt = time.perf_counter() - t0
            RES["E_rcm_ascent"][str(nv)] = {
                "status": "ok", "s": round(dt, 2)
            }
            print(f"E n={nv}: OK in {dt:.1f}s", flush=True)
            save()
        set_config(rcm_device_max_n=2_000_000)

    # ---- F: sparse triangles at 16M nnz (the size that faulted pre-fix;
    # run LAST, after everything else is saved) -----------------------------
    if "F" in sections:
        from sparsebase_tpu.ops.feature.sparse_common import (
            triangle_count_sparse_device as _tc,
        )
        sys.path.insert(0, str(REPO / "tools"))
        from bench_triangles import _gen_csr as _g

        ns = 200_000 if cpu else 1_000_000
        big = _g(ns, ns * 8, seed=3)
        RES["F_sparse_1m"] = {"status": "launched", "nnz": int(big.nnz)}
        save()
        tri = _tc(big)
        t0 = time.perf_counter()
        tri = _tc(big)
        dt = time.perf_counter() - t0
        RES["F_sparse_1m"] = {
            "status": "ok", "n": ns, "nnz": int(big.nnz),
            "triangles": int(tri), "s": round(dt, 3),
            "medges_per_s": round(big.nnz / dt / 1e6, 2),
        }
        save()
        print(f"F sparse n={ns}: {dt*1e3:.0f} ms", flush=True)

    # ---- G: GROUP_BLOCKS sweep for the sparse tier ------------------------
    if "G" in sections:
        from sparsebase_tpu.ops.feature.sparse_common import (
            triangle_count_sparse_device as _tcg,
        )
        sys.path.insert(0, str(REPO / "tools"))
        from bench_triangles import _gen_csr as _gg

        ns = 100_000 if cpu else 250_000
        big = _gg(ns, ns * 8, seed=2)
        RES["G_group_blocks"] = {}
        for gb in (32, 96, 256):
            tri = _tcg(big, group_blocks=gb)  # compile+run
            t0 = time.perf_counter()
            tri = _tcg(big, group_blocks=gb)
            dt = time.perf_counter() - t0
            RES["G_group_blocks"][str(gb)] = {
                "s": round(dt, 2),
                "medges_per_s": round(big.nnz / dt / 1e6, 2),
                "triangles": int(tri),
            }
            print(f"G gb={gb}: {dt:.1f}s", flush=True)
            save()

    print(json.dumps(RES, indent=1))


if __name__ == "__main__":
    main()

"""Weak-scaling harness for the distributed layer.

BASELINE.md target: ≥80% weak-scaling efficiency for conversion + RCM +
k-way partition from 1 chip to N. Real pods aren't reachable from this
environment, so the harness measures the same shard_map code path over
1..N devices (virtual CPU devices in tests; real chips when available)
with problem size proportional to the mesh — the wiring the multi-host
run needs (jax.distributed + the same Mesh) is identical.

Caveat recorded with the results: on the virtual CPU mesh all "devices"
share this host's cores, so wall-clock efficiency is a *lower bound* —
total compute grows ~d while silicon doesn't. The communication-volume
columns (halo bytes/step, which real ICI would carry) are the
hardware-independent scaling signal: per-device comm should stay ~flat
for a boundary-proportional algorithm.

Usage::

    python -m sparsebase_tpu.parallel.scaling          # uses all devices
"""

from __future__ import annotations

import json
import time
from typing import Dict, List

import numpy as np


def _make_graph(n, avg_deg, seed=0, kind="random"):
    from ..convert import coo_to_csr
    from ..formats.coo import COO

    rng = np.random.default_rng(seed)
    if kind == "stencil":
        # banded graph (each vertex ↔ ±avg_deg/2 neighbors): the locality
        # a partitioned/reordered workload has — shard boundaries touch
        # only ~avg_deg/2 remote vertices, so halo comm per device is flat
        w = max(avg_deg // 2, 1)
        i = np.arange(n, dtype=np.int64)
        rows = np.repeat(i, 2 * w)
        offs = np.concatenate([np.arange(-w, 0), np.arange(1, w + 1)])
        cols = (rows + np.tile(offs, n)) % n
        keys = np.unique(rows * n + cols)
    else:
        nnz = n * avg_deg
        row = rng.integers(0, n, nnz).astype(np.int64)
        col = rng.integers(0, n, nnz).astype(np.int64)
        keys = np.unique(row * n + col)
    vals = rng.standard_normal(len(keys)).astype(np.float32)
    return coo_to_csr(
        COO.new((keys // n).astype(np.int32), (keys % n).astype(np.int32), vals, shape=(n, n))
    )


def _sync(x):
    import jax

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])
    return x


def run_one_row(
    kind: str,
    d: int,
    base_n: int = 4096,
    avg_deg: int = 8,
    reps: int = 3,
    use_halo: bool = True,
) -> Dict:
    """One weak-scaling row (one kind, one device count) — run in its
    OWN process by :func:`run_weak_scaling`. Round-5 note: the original
    single-process sweep accumulated ~50 GB of XLA state by the d=8
    stencil row and ground to a halt on this box; per-row subprocesses
    keep each measurement clean and restartable."""
    import jax
    import jax.numpy as jnp

    from . import ShardedCSR, halo, label_prop_partition, make_mesh, rcm_reorder, spmv

    if True:
        print(f"# weak-scaling {kind}: d={d}", flush=True)
        mesh = make_mesh(d)
        n = base_n * d  # weak scaling: n grows with the mesh
        csr = _make_graph(n, avg_deg, seed=d, kind=kind)
        sh = ShardedCSR.from_csr(csr, mesh, halo=use_halo)
        x = jnp.ones((n,), jnp.float32)
        # the same algorithm at every d (halo kernels run fine on a
        # 1-device mesh) so efficiencies compare like with like
        halo_ok = bool(use_halo)

        def _stage(msg):
            print(f"#   {msg} ({time.perf_counter():.0f})", flush=True)

        _stage("spmv")
        spmv_fn = halo.spmv if halo_ok else spmv
        f_spmv = jax.jit(lambda s, v: spmv_fn(s, v, mesh))
        _sync(f_spmv(sh, x))
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f_spmv(sh, x)
        _sync(y)
        t_spmv = (time.perf_counter() - t0) / reps

        def run_rcm():
            if halo_ok:
                # bounded refinement: constant work per device count
                return halo.rcm_reorder(
                    sh, mesh, root=0, max_iters=64, refine_iters=4
                )
            return rcm_reorder(sh, mesh, root=0, max_iters=64)

        _stage("rcm")
        _sync(run_rcm())  # compile
        t0 = time.perf_counter()
        order = run_rcm()
        _sync(order)
        t_rcm = time.perf_counter() - t0

        # multilevel RCM (round 5): the sub-diameter variant — coarsen,
        # BFS the coarsest graph, project + correct levels. Orders are
        # approximate-RCM; bandwidth is reported next to the exact one.
        _stage("rcm_ml")
        t_rcm_ml = None
        rcm_ml_steps = 0
        bw = {}
        if halo_ok and kind == "stencil":
            # rcm_ml only where the diameter bound bites: the stencil.
            # (random graphs have log diameter — exact RCM already weak-
            # scales there, and the ladder's per-phase shard_map compiles
            # dominate the harness runtime on the 2-core CPU mesh)
            def run_rcm_ml():
                return halo.rcm_reorder_ml(sh, mesh, root=0,
                                           coarsen_until=base_n)

            o_ml, rcm_ml_steps = run_rcm_ml()  # compile ladder runners
            _sync(o_ml)
            t0 = time.perf_counter()
            o_ml, rcm_ml_steps = run_rcm_ml()
            _sync(o_ml)
            t_rcm_ml = time.perf_counter() - t0
            row = np.asarray(csr.row_of_nnz(), np.int64)
            colv = np.asarray(csr.indices, np.int64)
            o_ex = np.asarray(jax.device_get(order), np.int64)
            o_mlh = np.asarray(jax.device_get(o_ml), np.int64)
            bw = {
                "bandwidth_natural": int(np.abs(row - colv).max()),
                "bandwidth_rcm": int(np.abs(o_ex[row] - o_ex[colv]).max()),
                "bandwidth_rcm_ml": int(
                    np.abs(o_mlh[row] - o_mlh[colv]).max()
                ),
            }

        _stage("partition")
        part_fn = halo.label_prop_partition if halo_ok else label_prop_partition
        k = min(4, max(d, 2))
        _sync(part_fn(sh, k, mesh, num_iters=6))  # compile
        t0 = time.perf_counter()
        labels = part_fn(sh, k, mesh, num_iters=6)
        _sync(labels)
        t_part = time.perf_counter() - t0

        # BFS depth (for the ICI projection's step counts: RCM does O(L)
        # halo exchanges — more at larger n, which is exactly the honest
        # weak-scaling cost of a diameter-bound algorithm)
        _stage("bfs_depth")
        if halo_ok:
            levels = np.asarray(jax.device_get(halo.bfs_levels(sh, 0, mesh)))
            bfs_depth = int(levels.max()) + 1
        else:
            bfs_depth = 0
        _stage("row done")

        return {
            "n": n,
            "nnz": csr.nnz,
            "spmv_s": t_spmv,
            "rcm_s": t_rcm,
            "partition_s": t_part,
            "halo_path": halo_ok,
            # hardware-independent comm signal: bytes one halo exchange
            # moves, total and per device (should stay ~flat per device
            # for boundary-proportional kernels)
            "halo_bytes_per_step": halo.step_comm_bytes(sh) if use_halo else 0,
            "halo_bytes_per_device": (
                halo.step_comm_bytes(sh) // d if use_halo else 0
            ),
            # the dense-psum alternative would move n*4 bytes per device
            "dense_bytes_per_device": 4 * n,
            "bfs_depth": bfs_depth,
            "rcm_ml_s": t_rcm_ml,
            "rcm_ml_steps": rcm_ml_steps,
            **bw,
        }


def run_weak_scaling(
    base_n: int = 4096,
    avg_deg: int = 8,
    device_counts: List[int] | None = None,
    reps: int = 3,
    use_halo: bool = True,
    kind: str = "random",
) -> Dict:
    """Time sharded SpMV + distributed RCM (+ the multilevel variant on
    the stencil) + label-prop partition at constant per-device problem
    size; report efficiency vs 1 device plus the per-device halo
    communication volume. Each row runs in its own subprocess (see
    :func:`run_one_row`)."""
    import json as _json
    import subprocess
    import sys as _sys

    import jax

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= n_avail]

    results = {}
    for d in device_counts:
        r = subprocess.run(
            [_sys.executable, "-m", "sparsebase_tpu.parallel.scaling",
             "--row", kind, str(d), str(base_n), str(avg_deg), str(reps)],
            capture_output=True, text=True,
            env={**__import__("os").environ,
                 "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_avail}"},
        )
        if r.returncode != 0:
            raise RuntimeError(f"row {kind} d={d} failed:\n" + r.stderr[-3000:])
        row = _json.loads(r.stdout.splitlines()[-1])
        results[d] = row

    base = results[device_counts[0]]
    for d in device_counts:
        r = results[d]
        # weak-scaling efficiency: t(1 dev) / t(d devs) at d-proportional size
        r["spmv_efficiency"] = round(base["spmv_s"] / max(r["spmv_s"], 1e-9), 3)
        r["rcm_efficiency"] = round(base["rcm_s"] / max(r["rcm_s"], 1e-9), 3)
        r["partition_efficiency"] = round(
            base["partition_s"] / max(r["partition_s"], 1e-9), 3
        )
        if r.get("rcm_ml_s") is not None and base.get("rcm_ml_s"):
            r["rcm_ml_efficiency"] = round(
                base["rcm_ml_s"] / max(r["rcm_ml_s"], 1e-9), 3
            )
    project_ici(results, device_counts)
    return results


# Projection assumptions (stated; VERDICT r2 item 6): per-chip ICI of a
# v5e (1600 Gbps aggregate => 200 GB/s) and a per-collective latency of
# 2 us. The model: on real chips, per-device *compute* at constant
# per-device size is t(d=1)/steps per halo step (silicon scales with d,
# unlike the virtual CPU mesh), and each halo step adds
# bytes_per_device / ICI_BW + alpha of communication. Step counts:
# spmv = 1 exchange; label-prop = its 6 iterations; RCM =
# ~4x the BFS depth (3 pseudo-peripheral BFS passes + the final BFS)
# plus its rank-refinement exchanges — the depth-bound step count is the
# honest weak-scaling cost of a diameter-bound algorithm on a growing
# graph.
ICI_GB_S = 200.0
ICI_ALPHA_S = 2e-6
RCM_DEPTH_PASSES = 4
RCM_RANK_ITERS = 4


def project_ici(results: Dict, device_counts: List[int]) -> None:
    """Attach projected real-ICI weak-scaling efficiencies to a
    ``run_weak_scaling`` result table (in place)."""
    base = results[device_counts[0]]
    steps_of = {
        "spmv": lambda r: 1,
        "rcm": lambda r: max(RCM_DEPTH_PASSES * r.get("bfs_depth", 1)
                             + RCM_RANK_ITERS, 1),
        "rcm_ml": lambda r: max((r.get("rcm_ml_steps") or 0)
                                + RCM_RANK_ITERS, 1),
        "partition": lambda r: 6,
    }
    t_of = {"spmv": "spmv_s", "rcm": "rcm_s", "rcm_ml": "rcm_ml_s",
            "partition": "partition_s"}
    for d in device_counts:
        r = results[d]
        for kernel, steps_fn in steps_of.items():
            if t_of[kernel] not in r or r[t_of[kernel]] is None:
                continue
            steps_d = steps_fn(r)
            steps_1 = steps_fn(base)
            # per-step compute on real silicon at this per-device size =
            # measured single-device wall clock / single-device step count
            t_step = base[t_of[kernel]] / max(steps_1, 1)
            comm = r["halo_bytes_per_device"] / (ICI_GB_S * 1e9) + ICI_ALPHA_S
            t_proj = steps_d * (t_step + (comm if d > 1 else 0.0))
            t_ideal = steps_1 * t_step
            r[f"{kernel}_projected_efficiency"] = round(
                t_ideal / max(t_proj, 1e-12), 3
            )


def main():
    import os

    import jax

    if len(__import__("sys").argv) > 1 and __import__("sys").argv[1] == "--row":
        import json as _json
        import sys as _sys

        jax.config.update("jax_platforms", "cpu")
        kind, d, base_n, avg_deg, reps = _sys.argv[2:7]
        row = run_one_row(kind, int(d), int(base_n), int(avg_deg), int(reps))
        print(_json.dumps(row))
        return

    # the harness targets the virtual CPU mesh: this image's sitecustomize
    # pre-registers the axon TPU backend and ignores JAX_PLATFORMS, so
    # force the platform here (one stray TPU client can wedge the chip
    # for the real benchmarks — CLAUDE.md sharp edges)
    jax.config.update("jax_platforms", "cpu")

    out = {
        "caveat": (
            "virtual CPU mesh: all simulated devices share this host's "
            f"{os.cpu_count()} cores, so total compute grows with d on fixed "
            "silicon and wall-clock efficiency is a hard lower bound (ideal "
            f"is ~{os.cpu_count()}/d for d>{os.cpu_count()}); "
            "halo_bytes_per_device is the hardware-independent scaling "
            "signal: flat per device on the stencil graph (the locality a "
            "partitioned workload has), growing on the uniform-random graph "
            "(no locality — every column is boundary)"
        ),
        "projection_assumptions": {
            "ici_gb_s": ICI_GB_S,
            "ici_alpha_s": ICI_ALPHA_S,
            "model": (
                "projected_efficiency = steps(1)*t_step / (steps(d)*(t_step"
                " + bytes_per_device/ICI_BW + alpha)); t_step = measured"
                " d=1 wall clock / step count at constant per-device size;"
                " steps: spmv=1, label-prop=6 iters, rcm="
                f"{RCM_DEPTH_PASSES}*bfs_depth+{RCM_RANK_ITERS} (diameter-"
                "bound, so rcm honestly degrades as weak scaling grows the"
                " graph diameter); rcm_ml = measured ladder steps + "
                f"{RCM_RANK_ITERS}"
            ),
        },
        "rcm_diameter_bound": (
            "impossibility (VERDICT r4 weak #3): exact level-synchronous "
            "BFS needs Omega(diameter) sequential frontier exchanges, and "
            "no work-efficient sub-diameter BFS is known (the NC "
            "alternative, min-plus matrix powering, is O(n^3 log n) work) "
            "- so EXACT distributed RCM on a weak-scaled stencil "
            "(diameter ~ n ~ d) cannot hold efficiency; the rcm rows "
            "record that honest decay. The product answer is rcm_ml "
            "(halo.rcm_reorder_ml): contract log2(n/base) matching "
            "levels (each ~halves the diameter), exact-BFS the coarsest "
            "graph, project 2x levels back with Bellman-Ford smoothing - "
            "polylog total steps, approximate levels, bandwidth reported "
            "next to exact RCM per row (bandwidth_rcm_ml vs "
            "bandwidth_rcm vs bandwidth_natural)"
        ),
        "platform": jax.devices()[0].platform,
        "stencil": run_weak_scaling(kind="stencil"),
        "random": run_weak_scaling(kind="random"),
    }
    txt = json.dumps(out, indent=2)
    print(txt)
    from pathlib import Path

    Path(__file__).resolve().parents[2].joinpath("SCALING_r05.json").write_text(txt)


if __name__ == "__main__":
    main()

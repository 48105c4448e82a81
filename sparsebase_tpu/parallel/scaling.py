"""Weak-scaling harness for the distributed layer.

BASELINE.md target: ≥80% weak-scaling efficiency for conversion + RCM +
k-way partition from 1 chip to N. Real pods aren't reachable from this
environment, so the harness measures the same shard_map code path over
1..N devices (virtual CPU devices in tests; real chips when available)
with problem size proportional to the mesh — the wiring the multi-host
run needs (jax.distributed + the same Mesh) is identical.

Usage::

    python -m sparsebase_tpu.parallel.scaling          # uses all devices
"""

from __future__ import annotations

import json
import time
from typing import Dict, List

import numpy as np


def _make_graph(n, avg_deg, seed=0):
    from ..convert import coo_to_csr
    from ..formats.coo import COO

    rng = np.random.default_rng(seed)
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


def run_weak_scaling(
    base_n: int = 4096,
    avg_deg: int = 8,
    device_counts: List[int] | None = None,
    reps: int = 3,
) -> Dict:
    """Time sharded SpMV + distributed RCM + label-prop partition at
    constant per-device problem size; report efficiency vs 1 device."""
    import jax

    from . import ShardedCSR, label_prop_partition, make_mesh, rcm_reorder, spmv

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= n_avail]

    results = {}
    for d in device_counts:
        mesh = make_mesh(d)
        n = base_n * d  # weak scaling: n grows with the mesh
        csr = _make_graph(n, avg_deg, seed=d)
        sh = ShardedCSR.from_csr(csr, mesh)
        import jax.numpy as jnp

        x = jnp.ones((n,), jnp.float32)

        f_spmv = jax.jit(lambda s, v: spmv(s, v, mesh))
        _sync(f_spmv(sh, x))
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f_spmv(sh, x)
        _sync(y)
        t_spmv = (time.perf_counter() - t0) / reps

        t0 = time.perf_counter()
        order = rcm_reorder(sh, mesh, root=0, max_iters=64)
        _sync(order)
        t_rcm = time.perf_counter() - t0

        t0 = time.perf_counter()
        labels = label_prop_partition(sh, min(4, max(d, 2)), mesh, num_iters=6)
        _sync(labels)
        t_part = time.perf_counter() - t0

        results[d] = {
            "n": n,
            "nnz": csr.nnz,
            "spmv_s": t_spmv,
            "rcm_s": t_rcm,
            "partition_s": t_part,
        }

    base = results[device_counts[0]]
    for d in device_counts:
        r = results[d]
        # weak-scaling efficiency: t(1 dev) / t(d devs) at d-proportional size
        r["spmv_efficiency"] = round(base["spmv_s"] / max(r["spmv_s"], 1e-9), 3)
        r["partition_efficiency"] = round(
            base["partition_s"] / max(r["partition_s"], 1e-9), 3
        )
    return results


def main():
    out = run_weak_scaling()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""Probe alternative gather/scatter formulations on the real TPU.

Run ONE probe per process (remote-compiler hangs wedge the chip):
    timeout 120 python tools/probe_gather.py <name>
Names: flat2d, sorted_hint, sort1k, unsort, bincount, transition,
       argsort16m, spmv, gather_flat
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_graph_on_device

N, NNZ = 1_000_000, 16_000_000


def sync(o):
    leaves = jax.tree_util.tree_leaves(o)
    jax.block_until_ready(leaves)
    x = leaves[0]
    return float(np.asarray(x.reshape(-1)[:1])[0])


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:48s} {dt * 1e3:9.1f} ms")
    return dt


def hist_transition(r):
    """Histogram of a SORTED 16M key array without a 16M scatter-add:
    scatter row-start positions at transitions (predicated, OOB-dropped),
    fill absent rows with a reverse running-min, diff."""
    change = jnp.concatenate([jnp.ones(1, bool), r[1:] != r[:-1]])
    idx = jnp.where(change, r, N + 1)
    first = (
        jnp.full(N + 1, NNZ, jnp.int32)
        .at[idx]
        .min(jnp.arange(NNZ, dtype=jnp.int32), mode="drop")
    )
    first = jax.lax.associative_scan(jnp.minimum, first, reverse=True)
    return jnp.diff(jnp.concatenate([first[:-1], jnp.full(1, NNZ, jnp.int32)]))


def main():
    which = sys.argv[1]
    row, col, vals = make_graph_on_device(N, NNZ)
    table = jnp.arange(N, dtype=jnp.float32)
    print(f"probe={which} on {jax.devices()[0].platform}")

    if which == "gather_flat":
        timeit("gather flat 16M<-1M", lambda t, i: t[i], table, col)
    elif which == "flat2d":
        timeit(
            "gather 2D-shaped (4096,4096)",
            lambda t, i: t[i.reshape(4096, 4096)].reshape(-1),
            table, col,
        )
    elif which == "sorted_hint":
        scol = jnp.sort(col)
        timeit(
            "take indices_are_sorted=True",
            lambda t, i: jnp.take(t, i, indices_are_sorted=True),
            table, scol,
        )
    elif which == "sort1k":
        timeit(
            "sort 1key+1payload 16M",
            lambda i: jax.lax.sort((i, jnp.arange(NNZ, dtype=jnp.int32))),
            col,
        )
    elif which == "unsort":
        perm = jax.jit(lambda i: jax.lax.sort((i, jnp.arange(NNZ, dtype=jnp.int32)))[1])(col)
        timeit(
            "scatter .set 16M->16M (unsort)",
            lambda v, p: jnp.zeros(NNZ, v.dtype).at[p].set(v),
            vals, perm,
        )
    elif which == "bincount":
        timeit("bincount 16M->1M", lambda r: jnp.bincount(r, length=N), row)
    elif which == "transition":
        ref = jax.jit(lambda r: jnp.bincount(r, length=N))(row)
        got = jax.jit(hist_transition)(row)
        ok = bool(jnp.all(ref == got))
        print("correct:", ok)
        timeit("hist transition scatter+revmin", hist_transition, row)
    elif which == "argsort16m":
        timeit("argsort 16M i32", lambda i: jnp.argsort(i), col)
    elif which == "spmv":
        timeit(
            "spmv gather then cumsum",
            lambda t, i, v: jnp.cumsum(v * t[i]),
            table, col, vals,
        )
    elif which == "packed2":
        # does a row-gather of (16M,2) from a (1M,2) table cost one gather
        # or two?  (the fused permute+spmv op hinges on this)
        packed = jnp.stack([table, table + 1.0], axis=1)  # (1M, 2)
        timeit("gather rows (16M,2)<-(1M,2)", lambda t, i: t[i], packed, col)
    elif which == "packed2b":
        packed = jnp.stack([table, table + 1.0], axis=1)
        timeit(
            "take rows axis0 (16M,2)<-(1M,2)",
            lambda t, i: jnp.take(t, i, axis=0),
            packed, col,
        )
    elif which == "sort2k2p":
        timeit(
            "sort 2key+2payload 16M",
            lambda r, c, v: jax.lax.sort((r, c, v, v + 1.0), num_keys=2, is_stable=False),
            row, col, vals,
        )
    elif which == "gather_small":
        # 1M gather from a 16M table (for binary-search style algorithms)
        idx1m = jnp.arange(N, dtype=jnp.int32) * 16
        big = jnp.arange(NNZ, dtype=jnp.float32)
        timeit("gather 1M<-16M", lambda t, i: t[i], big, idx1m)
    else:
        raise SystemExit(f"unknown probe {which}")


if __name__ == "__main__":
    main()

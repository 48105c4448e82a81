"""Pallas relocation-kernel attempts on v5e (VERDICT r2 item 1).

Round 2 concluded "Pallas cannot express the two dominant ops" (the
nnz-sized random gather and the relocation sort) without committing an
attempted kernel. This file IS the attempt set; each candidate is built,
compiled for the chip, and either measured or its compiler rejection
recorded verbatim. Run alone on the TPU (one process!); pass a size in
millions to override the default 16M.

Attempt 1 — vector gather in VMEM (`table[idx]` inside a kernel): the
    primitive the pair-gather (5.42 ns/nnz) would need. Expected to be
    rejected by Mosaic on v5e (no VMEM vector-gather unit).

Attempt 2 — radix-partition relocation (the Pallas answer to the 8.11
    ns/nnz XLA scatter / 4.82 sort): per 8K-element block, a 256-bucket
    histogram via broadcast-compare (VPU-friendly, no scatter), then
    element placement `out[offset[digit] + rank] = val`. The placement
    needs per-element dynamic stores; tried two ways:
      2a. scalar fori_loop with `ref[pl.ds(dst, 1)] = val` (unaligned
          dynamic store)
      2b. one-hot matmul placement: P[i, j] = (dst[i] == j), out = P^T @
          vals — compiles (it is just an MXU contraction) but costs
          O(block) MACs per element; measured for the record.

Attempt 3 — streaming indptr from sorted rows (the Pallas answer to the
    3.72 ns/nnz boundary sort): heads are a cheap vector compare; the
    write `indptr[row[i]] = i` at head lanes is again a per-element
    dynamic store (scalar loop).
"""

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NNZ = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 16_000_000
    N = NNZ // 16
    BLK = 8192

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(jax.device_get(x.reshape(-1)[:1]))[0])

    def timeit(name, fn, *args, reps=3):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"  MEASURED {name}: {dt*1e3:.1f} ms = {dt/NNZ*1e9:.2f} ns/elem")
        return dt

    def attempt(name, builder):
        print(f"\n=== {name} ===")
        try:
            fn, args = builder()
            lowered = jax.jit(fn).lower(*args)
            compiled = lowered.compile()
            print("  COMPILED OK")
            timeit(name, jax.jit(fn), *args)
        except Exception as e:
            msg = "".join(traceback.format_exception_only(type(e), e))
            print(f"  REJECTED: {msg.strip()[:2000]}")

    key = jax.random.PRNGKey(0)

    # ---- Attempt 1: VMEM vector gather --------------------------------------
    def build_vector_gather():
        table = jax.random.randint(key, (8192,), 0, 127, jnp.int32)
        idx = jax.random.randint(key, (NNZ,), 0, 8192, jnp.int32)

        def kernel(table_ref, idx_ref, out_ref):
            out_ref[:] = table_ref[idx_ref[:]]

        def fn(table, idx):
            grid = NNZ // BLK
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NNZ,), jnp.int32),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((8192,), lambda i: (0,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
            )(table, idx)

        return fn, (table, idx)

    attempt("1. VMEM vector gather table[idx]", build_vector_gather)

    # ---- Attempt 2a: radix placement via scalar dynamic stores --------------
    def build_radix_scalar():
        vals = jax.random.randint(key, (NNZ,), 0, 1 << 30, jnp.int32)

        def kernel(val_ref, out_ref, counters, dig_ref, base_ref):
            # the true radix inner loop: per-bucket SMEM counters, a
            # counting pass, an exclusive-scan via strict-lower-tri
            # matmul (Mosaic has no cumsum), then scalar placement
            # stores at data-dependent offsets — the operation XLA's
            # scatter does at 8.11 ns/elem. Scalar reads go through
            # refs (Mosaic cannot dynamic_slice derived arrays), and
            # every dot is explicitly 2-D.
            v = val_ref[:]
            digit = jax.lax.rem(v, 256)
            dig_ref[:] = digit
            oh = (digit[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (BLK, 256), 1)).astype(jnp.float32)
            hist = jnp.sum(oh, axis=0, keepdims=True)  # (1, 256)
            lt = (jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
                  < jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1))
            base_ref[:] = jnp.dot(
                hist, lt.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )[0].astype(jnp.int32)

            def init(j, _):
                counters[j] = base_ref[pl.ds(j, 1)][0]
                return 0

            jax.lax.fori_loop(0, 256, init, 0)

            def body(i, _):
                d = dig_ref[pl.ds(i, 1)][0]
                slot = counters[d]
                counters[d] = slot + 1
                out_ref[pl.ds(slot, 1)] = val_ref[pl.ds(i, 1)]
                return 0

            jax.lax.fori_loop(0, BLK, body, 0)

        def fn(vals):
            grid = NNZ // BLK
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NNZ,), jnp.int32),
                grid=(grid,),
                in_specs=[pl.BlockSpec((BLK,), lambda i: (i,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SMEM((256,), jnp.int32),
                                pltpu.VMEM((BLK,), jnp.int32),
                                pltpu.VMEM((256,), jnp.int32)],
            )(vals)

        return fn, (vals,)

    attempt("2a. radix placement, scalar dynamic stores", build_radix_scalar)

    # ---- Attempt 2b: radix placement via one-hot matmul ---------------------
    def build_radix_matmul():
        SUB = 512  # placement tile: SUB x SUB one-hot matmul per tile
        vals = jax.random.randint(key, (NNZ,), 0, 1 << 30, jnp.int32)

        def kernel(val_ref, out_ref):
            v = val_ref[:]
            digit = jax.lax.rem(v, 256)
            oh = (digit[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (SUB, 256), 1)).astype(jnp.float32)
            hist = jnp.sum(oh, axis=0, keepdims=True)  # (1, 256)
            # prefix sums as strict-lower-tri matmuls (no cumsum in Mosaic)
            lt256 = (jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
                     < jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1))
            base = jnp.dot(hist, lt256.astype(jnp.float32),
                           preferred_element_type=jnp.float32)[0]  # (256,)
            lts = (jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
                   < jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1))
            prefix = jnp.dot(lts.astype(jnp.float32).T, oh,
                             preferred_element_type=jnp.float32)
            rank = jnp.sum(prefix * oh, axis=1)
            # Mosaic rejects 1-D vector gathers (base[digit]); route the
            # per-element base lookup through the MXU too: oh @ base
            base_elem = jnp.dot(oh, base[:, None],
                                preferred_element_type=jnp.float32)[:, 0]
            dst = (base_elem + rank).astype(jnp.int32)
            # permutation matrix: P[i, j] = (dst[i] == j); out = vals @ P
            P = (dst[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (SUB, SUB), 1)).astype(jnp.float32)
            out_ref[:] = jnp.dot(
                v.astype(jnp.float32)[None, :], P,
                preferred_element_type=jnp.float32,
            )[0].astype(jnp.int32)

        def fn(vals):
            grid = NNZ // SUB
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NNZ,), jnp.int32),
                grid=(grid,),
                in_specs=[pl.BlockSpec((SUB,), lambda i: (i,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((SUB,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
            )(vals)

        return fn, (vals,)

    attempt("2b. radix placement, one-hot MXU matmul", build_radix_matmul)

    # ---- Attempt 3: streaming indptr (scalar stores at head lanes) ----------
    def build_stream_indptr():
        row = jnp.sort(jax.random.randint(key, (NNZ,), 0, N, jnp.int32))

        def kernel(row_ref, out_ref, head_ref, pos_ref):
            i = pl.program_id(0)
            r = row_ref[:]
            # head lane: first element of a run (block-local; block
            # boundaries resolved by the cross-block min over the XLA
            # cummin post-pass)
            head_ref[:] = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), r[1:] != r[:-1]]
            ).astype(jnp.int32)
            pos_ref[:] = (
                i * BLK + jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)[:, 0]
            )

            def body(j, _):
                h = head_ref[pl.ds(j, 1)][0]

                @pl.when(h > 0)
                def _():
                    rj = row_ref[pl.ds(j, 1)][0]
                    out_ref[pl.ds(rj, 1)] = pos_ref[pl.ds(j, 1)]

                return 0

            jax.lax.fori_loop(0, BLK, body, 0)

        def fn(row):
            grid = NNZ // BLK
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((N + 1,), jnp.int32),
                grid=(grid,),
                in_specs=[pl.BlockSpec((BLK,), lambda i: (i,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.VMEM((BLK,), jnp.int32),
                                pltpu.VMEM((BLK,), jnp.int32)],
            )(row)

        return fn, (row,)

    attempt("3. streaming indptr, scalar stores at heads", build_stream_indptr)


if __name__ == "__main__":
    main()

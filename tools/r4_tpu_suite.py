"""Round-4 batched TPU measurement suite (ONE process — TPU client
startup costs 25-70 min on this image, so every chip measurement of the
round lives here). Writes incremental JSON to R4_TPU.json after every
measurement so partial results survive.

Sections (VERDICT r3 directives):

A. Stage accounting of the flagship pipeline + the round-4 blocked
   kernels (indptr via per-block rowsort compaction; SpMV reduction via
   two-level blocked prefix) — attributes the ~3 ns/nnz gap between the
   15.7 ns/nnz stage sum and the measured 18.7, and measures whether the
   blocked kernels close part of it (target: >=60M nnz/s).
B. The reorder→kernel payoff (the reference's only published benchmark
   axis, docs/pages/tutorials/004_cuda_spmv.md:273-277): SpMV time under
   natural / scrambled / degree / RCM / partition-grouped orderings on a
   banded and a power-law graph, across CSR / ELL / DIA formulations.
C. ELL amortization: per-step cost of rows-only relayout + SpMV on ELL
   vs flat CSR, entry cost, crossover k.
D. Headline re-measure with the current default pipeline.
E. Device-RCM retry at <=16M nnz (the 64M program hits a TPU kernel
   fault) + its SpMV payoff datum.

Section F (DIA kernel tuning) lives in tools/probe_dia.py, appending to
R4_TPU_followup.json.

Usage: python tools/r4_tpu_suite.py [sections] [nnz_M]
  sections: string like "ABC" (default) — which sections to run.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

OUT = Path(os.environ.get("R4_TPU_OUT", Path(__file__).parent.parent / "R4_TPU.json"))
RESULTS = {}


def save(section, key, value):
    RESULTS.setdefault(section, {})[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=1, default=str))
    print(f"[{time.strftime('%H:%M:%S')}] {section}.{key} = {value}", flush=True)


def main():
    import jax

    if "--cpu" in sys.argv:  # dry-run mode: API check without the chip
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sections = sys.argv[1] if len(sys.argv) > 1 else "ABC"
    nnz_m = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0

    import sparsebase_tpu as sb  # noqa: F401
    from sparsebase_tpu.convert.kernels import (
        coo_to_csr,
        csr_to_ell,
        expand_row_table,
        indptr_from_sorted_rows,
        indptr_from_sorted_rows_blocked,
    )
    from sparsebase_tpu.formats.coo import COO
    from sparsebase_tpu.formats.csr import CSR
    from sparsebase_tpu.models.pipelines import (
        _permute_and_spmv,
        _row_sums_blocked,
        preprocess_pipeline,
        preprocess_pipeline_v2,
        spmv_csr,
        spmv_ell,
    )

    def sync(out):
        leaves = [
            l
            for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "reshape") and getattr(l, "size", 0)
        ]
        jax.block_until_ready(out)
        # axon block_until_ready can return early; materialize a scalar
        return float(np.asarray(leaves[-1].reshape(-1)[:1])[0])

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        sync(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / reps

    save("meta", "started", time.strftime("%Y-%m-%d %H:%M:%S"))
    save("meta", "device", str(jax.devices()[0]))

    # ---------------- shared generators (all data born on device) ----------
    def gen_powerlaw(n, nnz, seed=0):
        from bench import make_graph_on_device

        row, col, vals = make_graph_on_device(n, nnz, seed)
        return COO(row, col, vals, (n, n))

    # ======================= Section A =====================================
    if "A" in sections:
        nnz = int(nnz_m * 1e6)
        n = max(nnz // 16, 1)
        coo = gen_powerlaw(n, nnz)
        x = jnp.ones((n,), jnp.float32)
        per = 1e9 / nnz  # ms→ns/nnz is *1e6/nnz; s→ns/nnz is *1e9/nnz

        t = timeit(jax.jit(preprocess_pipeline), coo, x, reps=5)
        save("A", "full_v1_ns_per_nnz", round(t * per, 3))
        save("A", "full_v1_nnz_per_s", round(nnz / t, 0))

        for block in (256, 512, 1024):
            f = jax.jit(
                lambda c, xx, b=block: preprocess_pipeline_v2(
                    c, xx, block=b, blocked_reduce=True
                )
            )
            t = timeit(f, coo, x, reps=5)
            save("A", f"full_v2_block{block}_ns_per_nnz", round(t * per, 3))
            save("A", f"full_v2_block{block}_nnz_per_s", round(nnz / t, 0))
        f = jax.jit(
            lambda c, xx: preprocess_pipeline_v2(c, xx, block=512, blocked_reduce=False)
        )
        t = timeit(f, coo, x, reps=5)
        save("A", "full_v2a_noblockedy_ns_per_nnz", round(t * per, 3))

        # --- component: indptr variants -----------------------------------
        def consume_ip(ip):
            return ip[-1] + ip[0]

        t = timeit(
            jax.jit(lambda r: consume_ip(indptr_from_sorted_rows(r, n, nnz))), coo.row
        )
        save("A", "indptr_sort_ms", round(t * 1e3, 1))
        for block in (256, 512, 1024):
            t = timeit(
                jax.jit(
                    lambda r, b=block: consume_ip(
                        indptr_from_sorted_rows_blocked(r, n, nnz, block=b)
                    )
                ),
                coo.row,
            )
            save("A", f"indptr_blocked{block}_ms", round(t * 1e3, 1))

        # --- component: y-branch (pair gather + prod + reduce) -------------
        indptr = jax.jit(lambda r: indptr_from_sorted_rows(r, n, nnz))(coo.row)

        def ybranch(reduce_mode, c, xx, ip):
            table = jnp.stack(
                [
                    jnp.arange(n, dtype=jnp.int32),
                    jax.lax.bitcast_convert_type(xx, jnp.int32),
                ],
                axis=1,
            )
            pair = table[c.col]
            x_c = jax.lax.bitcast_convert_type(pair[:, 1], jnp.float32)
            prod = c.vals * x_c
            if reduce_mode == "cumsum":
                run = jnp.concatenate(
                    [jnp.zeros((1,), prod.dtype), jnp.cumsum(prod)]
                )
                return run[ip[1:]] - run[ip[:-1]]
            if reduce_mode == "blocked":
                return _row_sums_blocked(prod, ip, n)
            return jax.ops.segment_sum(
                prod, expand_row_table(jnp.arange(n, dtype=jnp.int32), ip, nnz),
                num_segments=n,
            )

        for mode in ("cumsum", "blocked", "segment"):
            t = timeit(
                jax.jit(lambda c, xx, ip, m=mode: ybranch(m, c, xx, ip)),
                coo,
                x,
                indptr,
            )
            save("A", f"ybranch_{mode}_ms", round(t * 1e3, 1))

        # pair gather alone (consumed by cheap sum) to subtract
        def pair_only(c, xx):
            table = jnp.stack(
                [
                    jnp.arange(n, dtype=jnp.int32),
                    jax.lax.bitcast_convert_type(xx, jnp.int32),
                ],
                axis=1,
            )
            pair = table[c.col]
            return pair[:, 0].sum() + pair[:, 1].sum()

        t = timeit(jax.jit(pair_only), coo, x)
        save("A", "pair_gather_ms", round(t * 1e3, 1))

        # cumsum of nnz f32 alone
        t = timeit(jax.jit(lambda v: jnp.cumsum(v)[-1]), coo.vals)
        save("A", "cumsum_nnz_f32_ms", round(t * 1e3, 1))

        # structure-only pipeline (no SpMV): isolates sort+expand+indptr side
        def structure_only(c, xx):
            ip = indptr_from_sorted_rows(c.row, n, nnz)
            degrees = ip[1:] - ip[:-1]
            perm = jnp.argsort(degrees, stable=True)
            ro = jnp.zeros((n,), c.row.dtype).at[perm].set(
                jnp.arange(n, dtype=c.row.dtype)
            )
            table = jnp.stack(
                [
                    ro.astype(jnp.int32),
                    jax.lax.bitcast_convert_type(xx, jnp.int32),
                ],
                axis=1,
            )
            pair = table[c.col]
            new_col = pair[:, 0]
            new_row = expand_row_table(ro, ip, nnz, out_dtype=c.row.dtype)
            _, col_s, vals_s = jax.lax.sort(
                (new_row, new_col, c.vals), num_keys=2, is_stable=False
            )
            return col_s[:1], vals_s[:1]

        t = timeit(jax.jit(structure_only), coo, x, reps=5)
        save("A", "structure_only_ns_per_nnz", round(t * per, 3))
        del coo, x, indptr

    # ======================= Section D (headline, new defaults) ============
    if "D" in sections:
        nnz = int(nnz_m * 1e6)
        n = max(nnz // 16, 1)
        coo = gen_powerlaw(n, nnz)
        x = jnp.ones((n,), jnp.float32)
        t = timeit(jax.jit(preprocess_pipeline), coo, x, reps=5)
        save("D", "headline_default_ns_per_nnz", round(t * 1e9 / nnz, 3))
        save("D", "headline_default_nnz_per_s", round(nnz / t, 0))
        del coo, x

    # ======================= Section B =====================================
    if "B" in sections:
        nnzB = int(min(nnz_m, 64.0) * 1e6)
        nB = max(nnzB // 16, 1)

        @jax.jit
        def _sym_relabel(c, r):
            rs, cs, vs = jax.lax.sort(
                (r[c.row], r[c.col], c.vals), num_keys=2, is_stable=False
            )
            return rs, cs, vs

        def apply_sym_perm(coo, ro):
            """Symmetric permutation as a jitted relabel + 2-key sort."""
            rs, cs, vs = _sym_relabel(coo, ro)
            return coo_to_csr(COO(rs, cs, vs, coo.shape))

        spmv_c = jax.jit(lambda c, xx: spmv_csr(c, xx, method="cumsum"))
        spmv_e = jax.jit(spmv_ell)

        def measure_orderings(tag, coo, orderings, with_dia=()):
            xB = jnp.ones((coo.nrows,), jnp.float32)
            for name, ro in orderings:
                t0 = time.perf_counter()
                csr_p = (
                    coo_to_csr(coo)
                    if ro is None
                    else apply_sym_perm(coo, ro)
                )
                sync(csr_p.indptr)
                build_s = time.perf_counter() - t0
                t = timeit(spmv_c, csr_p, xB)
                save("B", f"{tag}.{name}.spmv_csr_ms", round(t * 1e3, 1))
                try:
                    ell = csr_to_ell(csr_p)
                    save("B", f"{tag}.{name}.ell_width", ell.width)
                    t = timeit(spmv_e, ell, xB)
                    save("B", f"{tag}.{name}.spmv_ell_ms", round(t * 1e3, 1))
                    del ell
                except Exception as e:  # pragma: no cover
                    save("B", f"{tag}.{name}.spmv_ell_error", repr(e))
                if name in with_dia:
                    try:
                        from sparsebase_tpu.convert.kernels import csr_to_dia
                        from sparsebase_tpu.formats.dia import DIA
                        from sparsebase_tpu.ops.kernels import (
                            banded_spmv,
                            banded_spmv_pallas,
                        )

                        dia = csr_to_dia(csr_p)
                        save("B", f"{tag}.{name}.dia_diagonals", dia.num_diagonals)
                        # offsets must be compile-time constants: bake the
                        # concrete array into the jit closure
                        offc, shp = dia.offsets, dia.shape
                        f_xla = jax.jit(
                            lambda data, xx: banded_spmv(DIA(offc, data, shp), xx)
                        )
                        t = timeit(f_xla, dia.data, xB)
                        save("B", f"{tag}.{name}.spmv_dia_ms", round(t * 1e3, 1))
                        try:
                            f_pal = jax.jit(
                                lambda data, xx: banded_spmv_pallas(
                                    DIA(offc, data, shp), xx, interpret=False
                                )
                            )
                            t = timeit(f_pal, dia.data, xB)
                            save(
                                "B",
                                f"{tag}.{name}.spmv_dia_pallas_ms",
                                round(t * 1e3, 1),
                            )
                        except Exception as e:  # pragma: no cover
                            save("B", f"{tag}.{name}.spmv_dia_pallas_error", repr(e))
                        del dia
                    except Exception as e:  # pragma: no cover
                        save("B", f"{tag}.{name}.spmv_dia_error", repr(e))
                save("B", f"{tag}.{name}.build_s", round(build_s, 1))
                del csr_p

        # ---- banded graph, then scrambled (planted-recovery = ideal RCM) --
        W = 16

        @jax.jit
        def gen_banded(key):
            k1, k2 = jax.random.split(key)
            row = jnp.repeat(
                jnp.arange(nB, dtype=jnp.int32), nnzB // nB, total_repeat_length=nnzB
            )
            off = jax.random.randint(k1, (nnzB,), -W, W + 1, dtype=jnp.int32)
            col = jnp.clip(row + off, 0, nB - 1)
            vals = jax.random.normal(k2, (nnzB,), jnp.float32)
            r, c, v = jax.lax.sort((row, col, vals), num_keys=2, is_stable=False)
            return r, c, v

        r, c, v = gen_banded(jax.random.PRNGKey(1))
        banded = COO(r, c, v, (nB, nB))
        del r, c, v

        @jax.jit
        def gen_scramble(key):
            perm = jnp.argsort(jax.random.uniform(key, (nB,)))  # perm[new]=old
            ro = jnp.zeros((nB,), jnp.int32).at[perm].set(
                jnp.arange(nB, dtype=jnp.int32)
            )
            return ro

        ro_scramble = gen_scramble(jax.random.PRNGKey(2))
        # natural = banded; scrambled = after random relabel; recovery =
        # the planted inverse (what ideal RCM recovers, bandwidth W)
        measure_orderings(
            "banded", banded, [("banded_natural", None)], with_dia=("banded_natural",)
        )
        rs, cs, vs = jax.jit(
            lambda co, r2: jax.lax.sort(
                (r2[co.row], r2[co.col], co.vals), num_keys=2, is_stable=False
            )
        )(banded, ro_scramble)
        scrambled = COO(rs, cs, vs, (nB, nB))
        del rs, cs, vs, banded

        @jax.jit
        def invert(ro):
            n_ = ro.shape[0]
            inv = jnp.zeros((n_,), jnp.int32).at[ro].set(
                jnp.arange(n_, dtype=jnp.int32)
            )
            return inv

        ro_recover = invert(ro_scramble)
        scr_csr = coo_to_csr(scrambled)

        @jax.jit
        def degree_order(ip):
            degrees = ip[1:] - ip[:-1]
            perm = jnp.argsort(degrees, stable=True)
            return jnp.zeros_like(perm).at[perm].set(
                jnp.arange(perm.shape[0], dtype=perm.dtype)
            )

        ro_degree = degree_order(scr_csr.indptr).astype(jnp.int32)
        del scr_csr
        measure_orderings(
            "banded_scrambled",
            scrambled,
            [
                ("scrambled_natural", None),
                ("degree", ro_degree),
                ("planted_rcm_recovery", ro_recover),
            ],
            with_dia=("planted_rcm_recovery",),
        )
        del scrambled, ro_degree, ro_recover, ro_scramble

        # ---- power-law graph ---------------------------------------------
        pl = gen_powerlaw(nB, nnzB, seed=3)
        pl_csr = coo_to_csr(pl)
        ro_degree = degree_order(pl_csr.indptr).astype(jnp.int32)

        # partition-grouped via device label propagation
        from sparsebase_tpu.ops.partition.labelprop import _propagate

        @jax.jit
        def part_order(c):
            k = 8
            labels0 = (jnp.arange(nB, dtype=jnp.int32) * k) // max(nB, 1)
            labels = _propagate(jnp, c, labels0, k, 1.1 * nB / k, None, 10)
            order = jnp.lexsort((jnp.arange(nB), labels))
            return (
                jnp.zeros((nB,), jnp.int32)
                .at[order]
                .set(jnp.arange(nB, dtype=jnp.int32)),
                labels,
            )

        t0 = time.perf_counter()
        ro_part, _labels = part_order(pl_csr)
        sync(ro_part)
        save("B", "powerlaw.partition_order_build_s", round(time.perf_counter() - t0, 1))

        measure_orderings(
            "powerlaw",
            pl,
            [
                ("natural", None),
                ("degree", ro_degree),
                ("partition_grouped", ro_part),
            ],
        )
        del ro_degree, ro_part, _labels

        # device RCM last (slowest; everything above already saved)
        try:
            from sparsebase_tpu.ops.reorder.rcm import _rcm_device

            t0 = time.perf_counter()
            ro_rcm = jax.jit(_rcm_device)(pl_csr).astype(jnp.int32)
            sync(ro_rcm)
            save("B", "powerlaw.rcm_order_build_s", round(time.perf_counter() - t0, 1))
            measure_orderings("powerlaw", pl, [("rcm", ro_rcm)])
            del ro_rcm
        except Exception as e:  # pragma: no cover
            save("B", "powerlaw.rcm_error", repr(e))
        del pl, pl_csr

    # ======================= Section C =====================================
    if "C" in sections:
        nnzC = int(min(nnz_m, 64.0) * 1e6)
        nC = max(nnzC // 16, 1)

        def rand_ro(seed):
            @jax.jit
            def go(key):
                perm = jnp.argsort(jax.random.uniform(key, (nC,)))
                return jnp.zeros((nC,), jnp.int32).at[perm].set(
                    jnp.arange(nC, dtype=jnp.int32)
                )

            return go(jax.random.PRNGKey(seed))

        def flat_rows_step(c_indptr, c_indices, c_vals, ro, xx):
            """Rows-only relayout of flat CSR + SpMV (the flat competitor
            to ELL.permute_rows + spmv_ell)."""
            nnz_ = c_indices.shape[0]
            new_row = expand_row_table(ro, c_indptr, nnz_, out_dtype=jnp.int32)
            _, idx_s, val_s = jax.lax.sort(
                (new_row, c_indices, c_vals), num_keys=1, is_stable=False
            )
            degrees = c_indptr[1:] - c_indptr[:-1]
            counts_new = jnp.zeros((nC,), c_indptr.dtype).at[ro].set(degrees)
            new_indptr = jnp.concatenate(
                [
                    jnp.zeros((1,), c_indptr.dtype),
                    jnp.cumsum(counts_new).astype(c_indptr.dtype),
                ]
            )
            prod = val_s * xx[idx_s]
            run = jnp.concatenate([jnp.zeros((1,), prod.dtype), jnp.cumsum(prod)])
            y = run[new_indptr[1:]] - run[new_indptr[:-1]]
            return new_indptr, idx_s, val_s, y

        def ell_rows_step(cols, vals, lens, ro, xx):
            perm = jnp.zeros((nC,), ro.dtype).at[ro].set(
                jnp.arange(nC, dtype=ro.dtype)
            )
            cols_p = cols[perm]
            vals_p = vals[perm]
            lens_p = lens[perm]
            mask = (
                jnp.arange(cols.shape[1], dtype=lens.dtype)[None, :]
                < lens_p[:, None]
            )
            prod = jnp.where(mask, vals_p * xx[cols_p], 0)
            return cols_p, vals_p, lens_p, prod.sum(axis=1)

        for tag, widthcap in (("poisson", None), ("uniform16", 16)):
            if widthcap is None:
                coo = gen_powerlaw(nC, nnzC, seed=7)
                csr = coo_to_csr(coo)
                del coo
            else:

                @jax.jit
                def gen_uniform(key):
                    cols = jax.random.randint(
                        key, (nC, widthcap), 0, nC, dtype=jnp.int32
                    )
                    cols = jax.lax.sort(cols, dimension=1)
                    vals = jax.random.normal(key, (nC, widthcap), jnp.float32)
                    return cols, vals

                cols_u, vals_u = gen_uniform(jax.random.PRNGKey(8))
                indptr_u = jnp.arange(nC + 1, dtype=jnp.int32) * widthcap
                csr = CSR(
                    indptr_u,
                    cols_u.reshape(-1),
                    vals_u.reshape(-1),
                    (nC, nC),
                )
                del cols_u, vals_u
            xC = jnp.ones((nC,), jnp.float32)

            t0 = time.perf_counter()
            ell = csr_to_ell(csr)
            sync(ell.cols)
            entry_s = time.perf_counter() - t0
            # re-run once warm (host syncs + jit cached)
            t0 = time.perf_counter()
            ell = csr_to_ell(csr)
            sync(ell.cols)
            entry_s = min(entry_s, time.perf_counter() - t0)
            save("C", f"{tag}.entry_flat_to_ell_ms", round(entry_s * 1e3, 1))
            save("C", f"{tag}.ell_width", ell.width)
            save(
                "C",
                f"{tag}.padding_ratio",
                round(nC * ell.width / max(csr.nnz, 1), 2),
            )

            ro = rand_ro(11)
            t_f = timeit(
                jax.jit(flat_rows_step), csr.indptr, csr.indices, csr.vals, ro, xC
            )
            save("C", f"{tag}.flat_step_ms", round(t_f * 1e3, 1))
            t_e = timeit(jax.jit(ell_rows_step), ell.cols, ell.vals, ell.lens, ro, xC)
            save("C", f"{tag}.ell_step_ms", round(t_e * 1e3, 1))
            if t_f > t_e:
                save(
                    "C",
                    f"{tag}.crossover_k",
                    round(entry_s / (t_f - t_e), 2),
                )
            # SpMV-only comparison
            t = timeit(jax.jit(lambda c, xx: spmv_csr(c, xx, method="cumsum")), csr, xC)
            save("C", f"{tag}.spmv_csr_ms", round(t * 1e3, 1))
            t = timeit(jax.jit(spmv_ell), ell, xC)
            save("C", f"{tag}.spmv_ell_ms", round(t * 1e3, 1))
            del csr, ell, ro

    # ======================= Section E (device RCM retry, 16M) =============
    if "E" in sections:
        nnzE = int(min(nnz_m, 16.0) * 1e6)
        nE = max(nnzE // 16, 1)
        try:
            from sparsebase_tpu.ops.reorder.rcm import _rcm_device

            pl = gen_powerlaw(nE, nnzE, seed=3)
            pl_csr = coo_to_csr(pl)
            xE = jnp.ones((nE,), jnp.float32)
            t0 = time.perf_counter()
            ro_rcm = jax.jit(_rcm_device)(pl_csr).astype(jnp.int32)
            sync(ro_rcm)
            save("E", "rcm16_order_build_s", round(time.perf_counter() - t0, 1))

            @jax.jit
            def relabel(c, r):
                return jax.lax.sort(
                    (r[c.row], r[c.col], c.vals), num_keys=2, is_stable=False
                )

            rs, cs, vs = relabel(pl, ro_rcm)
            csr_p = coo_to_csr(COO(rs, cs, vs, pl.shape))
            t = timeit(
                jax.jit(lambda c, xx: spmv_csr(c, xx, method="cumsum")), csr_p, xE
            )
            save("E", "rcm16_spmv_csr_ms", round(t * 1e3, 1))
            csr_n = coo_to_csr(pl)
            t = timeit(
                jax.jit(lambda c, xx: spmv_csr(c, xx, method="cumsum")), csr_n, xE
            )
            save("E", "natural16_spmv_csr_ms", round(t * 1e3, 1))
        except Exception as e:  # pragma: no cover
            save("E", "rcm16_error", repr(e))


    save("meta", "finished", time.strftime("%Y-%m-%d %H:%M:%S"))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # keep partial results + the error on disk
        import traceback

        RESULTS.setdefault("meta", {})["error"] = traceback.format_exc()
        OUT.write_text(json.dumps(RESULTS, indent=1, default=str))
        raise

"""Conversion tests (parity: tests/suites/sparsebase/converter/converter_order_two_tests.cc)."""

import jax
import numpy as np
import pytest

import fixture as fx
from sparsebase_tpu import COO, CSC, CSR, DenseArray
from sparsebase_tpu.context import DeviceContext
from sparsebase_tpu.convert import (
    can_convert,
    convert,
    convert_cached,
    coo_to_csc,
    coo_to_csr,
    csc_to_coo,
    csc_to_csr,
    csr_to_coo,
    csr_to_csc,
)
from sparsebase_tpu.utils.exceptions import ConversionError


class TestDirectKernels:
    def test_coo_to_csr(self):
        csr = coo_to_csr(fx.make_coo())
        fx.compare_csr(fx.make_csr(), csr)

    def test_csr_to_coo(self):
        coo = csr_to_coo(fx.make_csr())
        np.testing.assert_array_equal(np.asarray(coo.row), fx.ROWS)
        np.testing.assert_array_equal(np.asarray(coo.col), fx.COO_COLS)
        np.testing.assert_array_equal(np.asarray(coo.vals), fx.COO_VALS)

    def test_coo_to_csc(self):
        csc = coo_to_csc(fx.make_coo())
        fx.compare_csc(fx.make_csc(), csc)

    def test_csr_to_csc(self):
        csc = csr_to_csc(fx.make_csr())
        fx.compare_csc(fx.make_csc(), csc)

    def test_csc_to_csr(self):
        csr = csc_to_csr(fx.make_csc())
        fx.compare_csr(fx.make_csr(), csr)

    def test_csc_to_coo(self):
        coo = csc_to_coo(fx.make_csc())
        assert coo.is_sorted()
        np.testing.assert_array_equal(coo.to_dense(), fx.DENSE)

    def test_pattern_conversions(self):
        csr = fx.make_pattern_csr()
        csc = csr_to_csc(csr)
        assert csc.vals is None
        back = csc_to_csr(csc)
        fx.compare_csr(csr, back)

    def test_on_device(self):
        coo = fx.make_coo().to_device()
        csr = coo_to_csr(coo)
        fx.compare_csr(fx.make_csr(), csr.to_host())

    def test_under_jit(self):
        coo = fx.make_coo().to_device()
        jitted = jax.jit(coo_to_csr)
        csr = jitted(coo)
        fx.compare_csr(fx.make_csr(), csr.to_host())


class TestGraph:
    def test_can_convert(self):
        assert can_convert(COO, CSR)
        assert can_convert(CSR, CSC)
        assert can_convert(CSC, COO)
        assert not can_convert(DenseArray, CSR)

    def test_identity_chain(self):
        csr = fx.make_csr()
        out = convert(csr, CSR)
        assert out is csr

    def test_multihop_not_needed_direct_edges(self):
        # All pairwise edges exist; chains are length 1
        from sparsebase_tpu.convert import default_graph

        g = default_graph()
        for a, b in [(COO, CSR), (CSR, COO), (COO, CSC), (CSC, COO), (CSR, CSC), (CSC, CSR)]:
            assert len(g.get_chain(a, b)) == 1

    def test_convert_api(self):
        csc = convert(fx.make_coo(), CSC)
        fx.compare_csc(fx.make_csc(), csc)

    def test_member_convert(self):
        csc = fx.make_coo().convert(CSC)
        fx.compare_csc(fx.make_csc(), csc)

    def test_convert_cached_returns_intermediates(self):
        outs = convert_cached(fx.make_coo(), CSC)
        assert isinstance(outs[-1], CSC)

    def test_conversion_error(self):
        with pytest.raises(ConversionError):
            convert(DenseArray.new(fx.ORIGINAL_ARRAY.copy()), CSR)

    def test_convert_with_context(self):
        csr = convert(fx.make_coo(), CSR, context=DeviceContext())
        assert isinstance(csr.context, DeviceContext)
        fx.compare_csr(fx.make_csr(), csr.to_host())

    def test_custom_edge_bfs_multihop(self):
        # Register a custom format reachable only via CSR to exercise BFS
        import dataclasses

        from sparsebase_tpu.convert.graph import ConversionGraph
        from sparsebase_tpu.formats.base import Format, register_format, static_field

        @register_format
        @dataclasses.dataclass(frozen=True)
        class _Wrapped(Format):
            inner_indptr: object
            inner_indices: object
            _shape: tuple = static_field(default=(0, 0))
            order = 2

            @property
            def shape(self):
                return self._shape

            @property
            def nnz(self):
                return int(self.inner_indices.shape[0])

        g = ConversionGraph()
        from sparsebase_tpu.convert import kernels as k

        g.register(COO, CSR, k.coo_to_csr)
        g.register(CSR, _Wrapped, lambda c: _Wrapped(c.indptr, c.indices, c.shape))
        chain = g.get_chain(COO, _Wrapped)
        assert len(chain) == 2
        out = g.convert(fx.make_coo(), _Wrapped)
        np.testing.assert_array_equal(np.asarray(out.inner_indptr), fx.ROW_PTR)


class TestSortedRunsIndptr:
    """Device kernel indptr_from_sorted_rows vs numpy histogram."""

    def _check(self, rows, n):
        import jax.numpy as jnp

        from sparsebase_tpu.convert.kernels import indptr_from_sorted_rows

        rows = np.sort(np.asarray(rows, np.int32))
        got = np.asarray(indptr_from_sorted_rows(jnp.asarray(rows), n, len(rows)))
        expect = np.concatenate(
            [[0], np.cumsum(np.bincount(rows, minlength=n))]
        ).astype(np.int32)
        np.testing.assert_array_equal(got, expect)

    def test_basic(self, rng):
        self._check(rng.integers(0, 50, 300), 50)

    def test_empty_rows_and_tails(self, rng):
        # leading, interior, trailing empty rows
        self._check([3, 3, 5, 5, 5, 9], 12)

    def test_all_one_row(self):
        self._check([4] * 17, 8)

    def test_no_entries(self):
        self._check([], 6)

    def test_more_rows_than_nnz(self, rng):
        self._check(rng.integers(0, 1000, 37), 1000)

    def test_device_coo_to_csr_uses_it(self, rng):
        from sparsebase_tpu.convert.kernels import coo_to_csr

        n = 40
        r = np.sort(rng.integers(0, n, 200)).astype(np.int32)
        c = rng.integers(0, n, 200).astype(np.int32)
        v = rng.standard_normal(200).astype(np.float32)
        coo = fx_sorted_coo(r, c, v, n)
        csr = coo_to_csr(coo.to_device())
        host = coo_to_csr(coo)
        np.testing.assert_array_equal(np.asarray(csr.indptr), np.asarray(host.indptr))


def fx_sorted_coo(r, c, v, n):
    order = np.lexsort((c, r))
    return COO(r[order], c[order], v[order], (n, n))


class TestBlockedIndptr:
    """Round-4 blocked-compaction kernel vs the histogram oracle."""

    def _check(self, rows, n, block):
        import jax.numpy as jnp

        from sparsebase_tpu.convert.kernels import indptr_from_sorted_rows_blocked

        rows = np.sort(np.asarray(rows, np.int32))
        got = np.asarray(
            indptr_from_sorted_rows_blocked(jnp.asarray(rows), n, len(rows), block=block)
        )
        expect = np.concatenate(
            [[0], np.cumsum(np.bincount(rows, minlength=n))]
        ).astype(np.int32)
        np.testing.assert_array_equal(got, expect)

    def test_fuzz_vs_histogram(self, rng):
        for seed in range(8):
            r = np.random.default_rng(seed)
            n = int(r.integers(1, 300))
            nnz = int(r.integers(0, 2000))
            for block in (8, 64, 512):
                self._check(r.integers(0, n, nnz), n, block)

    def test_edge_shapes(self):
        self._check([], 6, 64)
        self._check([4] * 17, 8, 8)          # one row, multiple blocks
        self._check([3, 3, 5, 5, 5, 9], 12, 4)
        self._check(np.arange(100), 100, 7)  # every row a head, odd block

    def test_jit_and_pipeline_v2(self, rng):
        import jax
        import jax.numpy as jnp

        from sparsebase_tpu.models import preprocess_pipeline
        from sparsebase_tpu.models.pipelines import preprocess_pipeline_v2

        n = 200
        r = np.sort(rng.integers(0, n, 3000)).astype(np.int32)
        c = rng.integers(0, n, 3000).astype(np.int32)
        v = rng.standard_normal(3000).astype(np.float32)
        coo = fx_sorted_coo(r, c, v, n).to_device()
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        ref_csr, ref_y = jax.jit(preprocess_pipeline)(coo, x)
        got_csr, got_y = jax.jit(
            lambda a, b: preprocess_pipeline_v2(a, b, block=64)
        )(coo, x)
        np.testing.assert_array_equal(np.asarray(ref_csr.indptr), np.asarray(got_csr.indptr))
        np.testing.assert_array_equal(np.asarray(ref_csr.indices), np.asarray(got_csr.indices))
        np.testing.assert_allclose(np.asarray(ref_y), np.asarray(got_y), rtol=2e-5, atol=2e-5)


class TestSpmvFacade:
    """Format-polymorphic spmv() with auto-conversion (round 4)."""

    def test_all_formats_agree(self, rng):
        import scipy.sparse as sp

        from sparsebase_tpu.convert.kernels import csr_to_dia, csr_to_ell
        from sparsebase_tpu.formats.csc import CSC
        from sparsebase_tpu.models.pipelines import spmv

        n = 200
        r = np.repeat(np.arange(n), 3)
        c = np.clip(r + np.tile([-1, 0, 1], n), 0, n - 1).astype(np.int64)
        v = rng.standard_normal(len(r)).astype(np.float32)
        coo = fx_sorted_coo(r.astype(np.int64), c, v, n)
        csr = coo.convert(CSR)
        ref = sp.coo_matrix((v, (r, c)), shape=(n, n)).toarray()
        x = rng.standard_normal(n).astype(np.float32)
        for fmt in (csr, coo, csr.convert(CSC), csr_to_ell(csr), csr_to_dia(csr)):
            y = np.asarray(spmv(fmt, x))
            np.testing.assert_allclose(y, ref @ x, atol=1e-3, err_msg=str(type(fmt)))


class TestBlockedRowSums:
    def test_matches_segment_sums(self, rng):
        import jax.numpy as jnp

        from sparsebase_tpu.models.pipelines import _row_sums_blocked

        for block in (4, 32, 512):
            n = 50
            rows = np.sort(rng.integers(0, n, 700)).astype(np.int32)
            prod = rng.standard_normal(700).astype(np.float32)
            indptr = np.concatenate(
                [[0], np.cumsum(np.bincount(rows, minlength=n))]
            ).astype(np.int32)
            got = np.asarray(
                _row_sums_blocked(jnp.asarray(prod), jnp.asarray(indptr), n, block=block)
            )
            expect = np.zeros(n, np.float64)
            np.add.at(expect, rows, prod.astype(np.float64))
            np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


class TestPreprocessPipeline:
    """Flagship pipeline vs a dense numpy model of the same semantics."""

    def test_matches_dense_model(self, rng):
        import jax
        import jax.numpy as jnp

        from sparsebase_tpu.models import preprocess_pipeline

        n = 60
        m = 400
        r = rng.integers(0, n, m).astype(np.int32)
        c = rng.integers(0, n, m).astype(np.int32)
        v = rng.standard_normal(m).astype(np.float32)
        coo = fx_sorted_coo(r, c, v, n)
        x = rng.standard_normal(n).astype(np.float32)

        csr_p, y = jax.jit(preprocess_pipeline)(coo.to_device(), jnp.asarray(x))

        # dense model
        A = np.zeros((n, n), np.float32)
        np.add.at(A, (r, c), v)
        degrees = (A != 0).sum(1)  # not nnz-degree! use histogram of rows
        degrees = np.bincount(r, minlength=n)
        perm = np.argsort(degrees, kind="stable")  # perm[new] = old
        P = np.zeros((n, n), np.float32)
        P[np.arange(n), perm] = 1.0  # P @ v gathers old rows into new order
        A_perm = P @ A @ P.T
        np.testing.assert_allclose(
            np.asarray(csr_p.to_dense()), A_perm, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(y), P @ (A @ x), rtol=1e-4, atol=1e-4)
        # output CSR is strictly valid: sorted columns within rows
        assert CSR(
            np.asarray(csr_p.indptr), np.asarray(csr_p.indices),
            np.asarray(csr_p.vals), (n, n)
        ).is_sorted()

    def test_empty_and_dense_rows(self, rng):
        import jax
        import jax.numpy as jnp

        from sparsebase_tpu.models import preprocess_pipeline

        n = 16
        r = np.array([0] * 10 + [7] * 3 + [15], np.int32)
        c = rng.integers(0, n, len(r)).astype(np.int32)
        v = np.ones(len(r), np.float32)
        coo = fx_sorted_coo(r, c, v, n)
        x = np.ones(n, np.float32)
        csr_p, y = jax.jit(preprocess_pipeline)(coo.to_device(), jnp.asarray(x))
        A = np.zeros((n, n), np.float32)
        np.add.at(A, (r, c), v)
        degrees = np.bincount(r, minlength=n)
        perm = np.argsort(degrees, kind="stable")
        P = np.zeros((n, n), np.float32)
        P[np.arange(n), perm] = 1.0
        np.testing.assert_allclose(np.asarray(csr_p.to_dense()), P @ A @ P.T, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y), P @ (A @ x), atol=1e-5)


class TestMorePipelines:
    """rcm_pipeline / partition_pipeline vs dense numpy models."""

    def _graph(self, rng, n=48, m=240):
        r = rng.integers(0, n, m).astype(np.int32)
        c = rng.integers(0, n, m).astype(np.int32)
        v = rng.standard_normal(m).astype(np.float32)
        return fx_sorted_coo(r, c, v, n), (r, c, v)

    def test_rcm_pipeline(self, rng):
        import jax
        import jax.numpy as jnp

        from sparsebase_tpu.models import rcm_pipeline

        n = 48
        coo, (r, c, v) = self._graph(rng, n=n)
        x = rng.standard_normal(n).astype(np.float32)
        csr_p, y = jax.jit(rcm_pipeline)(coo.to_device(), jnp.asarray(x))
        A = np.zeros((n, n), np.float32)
        np.add.at(A, (r, c), v)
        # the permutation must be valid and y must equal P(Ax) under it
        dense_p = np.asarray(csr_p.to_dense())
        # recover ro from y: y[ro[i]] = (Ax)[i]; check as a permutation of Ax
        ax = A @ x
        got = np.asarray(y)
        assert sorted(np.round(got, 4).tolist()) == sorted(np.round(ax, 4).tolist())
        # structural: permuted matrix has the same nnz and sorted columns
        assert csr_p.nnz == coo.nnz
        # the permuted dense matrix is P A P^T for some permutation P:
        # row/col sums are permutations of the originals
        np.testing.assert_allclose(
            sorted(dense_p.sum(1).tolist()), sorted(A.sum(1).tolist()), atol=1e-4
        )

    def test_partition_pipeline(self, rng):
        import jax
        import jax.numpy as jnp

        from sparsebase_tpu.models import partition_pipeline

        n = 48
        coo, (r, c, v) = self._graph(rng, n=n)
        x = rng.standard_normal(n).astype(np.float32)
        k = 4
        csr_p, y, labels = jax.jit(
            partition_pipeline, static_argnums=(2, 3)
        )(coo.to_device(), jnp.asarray(x), k, 6)
        labels = np.asarray(labels)
        assert labels.min() >= 0 and labels.max() < k
        A = np.zeros((n, n), np.float32)
        np.add.at(A, (r, c), v)
        ax = A @ x
        got = np.asarray(y)
        assert sorted(np.round(got, 4).tolist()) == sorted(np.round(ax, 4).tolist())
        assert csr_p.nnz == coo.nnz


class TestDonatingPipeline:
    def test_matches_plain(self, rng):
        # donation is a memory optimization, not a semantic one: the
        # donating jit must produce identical results (on CPU donation is
        # a no-op but the entry point and argument consumption still run)
        import jax
        import jax.numpy as jnp
        import warnings

        from sparsebase_tpu.models import (
            preprocess_pipeline,
            preprocess_pipeline_donating,
        )

        n, m = 40, 200
        r = rng.integers(0, n, m).astype(np.int32)
        c = rng.integers(0, n, m).astype(np.int32)
        v = rng.standard_normal(m).astype(np.float32)
        coo = fx_sorted_coo(r, c, v, n)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        ref_csr, ref_y = jax.jit(preprocess_pipeline)(coo.to_device(), x)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # "donation not implemented on cpu"
            got_csr, got_y = preprocess_pipeline_donating(coo.to_device(), x)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(got_csr.indices), np.asarray(ref_csr.indices)
        )

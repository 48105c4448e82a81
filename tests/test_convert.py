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

"""Format container tests (parity: tests/suites/sparsebase/format/*)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fixture as fx
from sparsebase_tpu import COO, CSC, CSR, DenseArray
from sparsebase_tpu.context import DeviceContext, HostContext
from sparsebase_tpu.utils.exceptions import TypeMismatchError


class TestCSR:
    def test_basic(self):
        csr = fx.make_csr()
        assert csr.shape == (3, 3)
        assert csr.nnz == 4
        assert csr.order == 2
        np.testing.assert_array_equal(csr.to_dense(), fx.DENSE)

    def test_pattern_matrix(self):
        csr = fx.make_pattern_csr()
        assert csr.vals is None
        assert csr.value_dtype is None
        np.testing.assert_array_equal(csr.to_dense(), (fx.DENSE != 0).astype(np.int8))

    def test_sort_on_construction(self):
        # Unsorted columns within row 0 (csr.cc:99-158 behaviour)
        indptr = np.array([0, 2, 3, 4], dtype=np.int32)
        cols = np.array([2, 1, 0, 0], dtype=np.int32)
        vals = np.array([2, 1, 3, 4], dtype=np.int32)
        csr = CSR.new(indptr, cols, vals, shape=(3, 3))
        assert csr.is_sorted()
        np.testing.assert_array_equal(np.asarray(csr.indices), fx.COLS)
        np.testing.assert_array_equal(np.asarray(csr.vals), fx.VALS)

    def test_row_of_nnz(self):
        csr = fx.make_csr()
        np.testing.assert_array_equal(csr.row_of_nnz(), fx.ROWS)

    def test_as_format(self):
        csr = fx.make_csr()
        assert csr.as_format(CSR) is csr
        with pytest.raises(TypeMismatchError):
            csr.as_format(COO)

    def test_astype_safe(self):
        csr = fx.make_csr()
        c2 = csr.astype(id_dtype=jnp.int64, nnz_dtype=jnp.int64, value_dtype=jnp.float32)
        assert np.asarray(c2.indices).dtype == np.int64
        assert np.asarray(c2.vals).dtype == np.float32
        np.testing.assert_array_equal(c2.to_dense(), fx.DENSE)

    def test_astype_overflow_raises(self):
        csr = fx.make_csr()
        big = dataclasses.replace(csr, vals=np.array([1, 2, 3, 300], dtype=np.int32))
        with pytest.raises(TypeMismatchError):
            big.astype(value_dtype=jnp.int8)

    def test_pytree_roundtrip(self):
        csr = fx.make_csr().to_device()
        leaves, treedef = jax.tree_util.tree_flatten(csr)
        rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
        assert rebuilt.shape == csr.shape
        np.testing.assert_array_equal(np.asarray(rebuilt.indices), fx.COLS)

    def test_jit_through(self):
        csr = fx.make_csr().to_device()

        @jax.jit
        def row_sums(c: CSR):
            x = jnp.ones((c.ncols,), dtype=jnp.float32)
            prod = c.vals.astype(jnp.float32) * x[c.indices]
            return jax.ops.segment_sum(prod, c.row_of_nnz(), num_segments=c.nrows)

        np.testing.assert_allclose(row_sums(csr), fx.DENSE.sum(axis=1))

    def test_context(self):
        csr = fx.make_csr()
        assert isinstance(csr.context, HostContext)
        dev = csr.to_device()
        assert isinstance(dev.context, DeviceContext)
        back = dev.to_host()
        assert isinstance(back.context, HostContext)
        np.testing.assert_array_equal(back.to_dense(), fx.DENSE)


class TestCOO:
    def test_basic(self):
        coo = fx.make_coo()
        assert coo.shape == (3, 3)
        assert coo.nnz == 4
        np.testing.assert_array_equal(coo.to_dense(), fx.DENSE)

    def test_sort_on_construction(self):
        rows = np.array([2, 1, 0, 0], dtype=np.int32)
        cols = np.array([0, 0, 2, 1], dtype=np.int32)
        vals = np.array([4, 3, 2, 1], dtype=np.int32)
        coo = COO.new(rows, cols, vals, shape=(3, 3))
        assert coo.is_sorted()
        np.testing.assert_array_equal(np.asarray(coo.row), fx.ROWS)
        np.testing.assert_array_equal(np.asarray(coo.col), fx.COO_COLS)
        np.testing.assert_array_equal(np.asarray(coo.vals), fx.COO_VALS)

    def test_shape_inference(self):
        coo = COO.new(fx.ROWS.copy(), fx.COO_COLS.copy(), fx.COO_VALS.copy())
        assert coo.shape == (3, 3)


class TestCSC:
    def test_basic(self):
        csc = fx.make_csc()
        assert csc.shape == (3, 3)
        assert csc.nnz == 4
        np.testing.assert_array_equal(csc.to_dense(), fx.DENSE)

    def test_col_of_nnz(self):
        csc = fx.make_csc()
        np.testing.assert_array_equal(csc.col_of_nnz(), np.array([0, 0, 1, 2]))


class TestDenseArray:
    def test_basic(self):
        arr = DenseArray.new(fx.ORIGINAL_ARRAY.copy())
        assert arr.shape == (3,)
        assert arr.order == 1
        assert arr.nnz == 3

    def test_device_roundtrip(self):
        arr = DenseArray.new(fx.ORIGINAL_ARRAY.copy()).to_device().to_host()
        np.testing.assert_array_equal(arr.vals, fx.ORIGINAL_ARRAY)

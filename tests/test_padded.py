"""Bucketed-padding tests (static-shape policy, SURVEY.md §7 hard part 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fixture as fx
from sparsebase_tpu import CSR
from sparsebase_tpu.formats.padded import PaddedCSR, next_bucket, pad_csr
from sparsebase_tpu.models import spmv_csr


class TestBuckets:
    def test_pow2(self):
        assert next_bucket(1) == 1
        assert next_bucket(2) == 2
        assert next_bucket(3) == 4
        assert next_bucket(1000) == 1024
        assert next_bucket(1024) == 1024
        assert next_bucket(1025) == 2048

    def test_pow2_half(self):
        assert next_bucket(700, "pow2_half") == 768
        assert next_bucket(800, "pow2_half") == 1024


class TestPaddedCSR:
    def test_roundtrip_exact(self):
        p = pad_csr(fx.make_csr())
        assert p.shape == (3, 3)
        assert p.nnz == 4
        assert p.padded_shape[0] == 4  # 3 rows -> 4-row bucket
        un = p.unpad()
        fx.compare_csr(fx.make_csr(), un)

    def test_pattern_gains_values(self):
        p = pad_csr(fx.make_pattern_csr())
        assert p.csr.vals is not None
        np.testing.assert_array_equal(np.asarray(p.csr.vals[:4]), np.ones(4))

    def test_value_ops_inert(self, rng):
        n = 37
        dense = (rng.random((n, n)) < 0.1) * rng.standard_normal((n, n))
        r, c = np.nonzero(dense)
        from sparsebase_tpu import COO

        csr = COO.new(
            r.astype(np.int32), c.astype(np.int32), dense[r, c].astype(np.float32),
            shape=(n, n),
        ).convert(CSR)
        p = pad_csr(csr)
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(spmv_csr(p.csr.to_device(), jnp.asarray(x)))[:n]
        np.testing.assert_allclose(y, dense.astype(np.float64) @ x, rtol=1e-4, atol=1e-4)

    def test_same_bucket_same_compiled_shape(self, rng):
        # two different matrices land in one bucket -> identical shapes
        def rand_csr(n, nnz, seed):
            rr = np.random.default_rng(seed)
            from sparsebase_tpu import COO

            keys = np.unique(rr.integers(0, n * n, nnz))
            return COO.new(
                (keys // n).astype(np.int32),
                (keys % n).astype(np.int32),
                rr.standard_normal(len(keys)).astype(np.float32),
                shape=(n, n),
            ).convert(CSR)

        a = pad_csr(rand_csr(50, 200, 1), row_bucket=64, nnz_bucket=256)
        b = pad_csr(rand_csr(50, 180, 2), row_bucket=64, nnz_bucket=256)
        assert a.csr.indptr.shape == b.csr.indptr.shape
        assert a.csr.indices.shape == b.csr.indices.shape
        # so a jitted fn compiles once
        calls = {"n": 0}

        @jax.jit
        def f(c):
            calls["n"] += 1  # traced once per structure
            return c.vals.sum()

        f(a.csr.to_device())
        f(b.csr.to_device())
        assert calls["n"] == 1

    def test_bucket_too_small_raises(self):
        with pytest.raises(ValueError):
            pad_csr(fx.make_csr(), row_bucket=2)

    def test_pytree(self):
        p = pad_csr(fx.make_csr())
        leaves, treedef = jax.tree_util.tree_flatten(p)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert back.nnz == 4

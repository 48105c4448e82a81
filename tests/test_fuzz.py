"""Randomized cross-shape robustness sweep for the conversion graph.

The reference's tests pin one tiny fixture; this sweep drives the
CSR/COO/CSC conversion chains over ~80 random configurations —
rectangular shapes, empty rows/cols, empty matrices, single entries,
duplicate accumulation, pattern matrices, both dtypes — against a dense
numpy oracle. Cheap insurance for the padding/boundary arithmetic the
device kernels rely on.
"""

import numpy as np
import pytest

from sparsebase_tpu import COO, CSC, CSR
from sparsebase_tpu.convert import (
    coo_to_csc,
    coo_to_csr,
    csc_to_coo,
    csc_to_csr,
    csr_to_coo,
    csr_to_csc,
)


def _random_case(rng):
    n = int(rng.integers(1, 40))
    m = int(rng.integers(1, 40))
    density = rng.choice([0.0, 0.02, 0.1, 0.4])
    nnz = int(density * n * m)
    r = rng.integers(0, n, nnz).astype(np.int32)
    c = rng.integers(0, m, nnz).astype(np.int32)
    with_vals = bool(rng.integers(0, 2))
    dedupe = bool(rng.integers(0, 2))
    if dedupe and nnz:
        keys = np.unique(r.astype(np.int64) * m + c)
        r = (keys // m).astype(np.int32)
        c = (keys % m).astype(np.int32)
        nnz = len(r)
    v = rng.standard_normal(nnz).astype(np.float32) if with_vals else None
    return n, m, r, c, v


def _dense(n, m, r, c, v):
    A = np.zeros((n, m), np.float32)
    np.add.at(A, (r, c), np.ones(len(r), np.float32) if v is None else v)
    return A


@pytest.mark.parametrize("seed", range(20))
def test_conversion_chains_vs_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    for _ in range(4):
        n, m, r, c, v = _random_case(rng)
        oracle = _dense(n, m, r, c, v)
        coo = COO.new(r, c, v, shape=(n, m))
        csr = coo_to_csr(coo)
        csc = coo_to_csc(coo)
        # duplicates accumulate, never dedupe (reference semantics)
        assert csr.nnz == len(r)
        np.testing.assert_allclose(np.asarray(csr.to_dense()), oracle, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(csc.to_dense()), oracle, rtol=1e-6)
        # chains: every composite path reproduces the oracle
        np.testing.assert_allclose(
            np.asarray(csr_to_csc(csr).to_dense()), oracle, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(csc_to_csr(csc).to_dense()), oracle, rtol=1e-6
        )
        back = csr_to_coo(csr)
        np.testing.assert_allclose(
            np.asarray(coo_to_csr(back).to_dense()), oracle, rtol=1e-6
        )
        back2 = csc_to_coo(csc)
        np.testing.assert_allclose(
            np.asarray(coo_to_csc(back2).to_dense()), oracle, rtol=1e-6
        )


def test_empty_and_degenerate():
    for n, m in ((1, 1), (1, 7), (7, 1), (5, 5)):
        coo = COO.new(
            np.zeros(0, np.int32), np.zeros(0, np.int32), None, shape=(n, m)
        )
        csr = coo_to_csr(coo)
        assert csr.nnz == 0
        csc = csr_to_csc(csr)
        assert csc.nnz == 0
        np.testing.assert_array_equal(
            np.asarray(csr.to_dense()), np.zeros((n, m), np.float32)
        )


def test_sharded_fuzz():
    """from_coo_sharded equivalence over random shapes on the CPU mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sparsebase_tpu.parallel import ShardedCSR, make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(77)
    for _ in range(6):
        n, m, r, c, v = _random_case(rng)
        if len(r) == 0:
            continue
        coo = COO.new(r, c, v, shape=(n, m))
        csr = coo_to_csr(coo)
        sh = ShardedCSR.from_coo_sharded(coo.row, coo.col, coo.vals, coo.shape, mesh)
        assert sh.nnz == csr.nnz
        back = sh.to_csr()
        np.testing.assert_array_equal(np.asarray(back.indptr), np.asarray(csr.indptr))
        np.testing.assert_array_equal(
            np.asarray(back.indices), np.asarray(csr.indices)
        )


@pytest.mark.parametrize("seed", range(8))
def test_ell_round_trip_vs_oracle(seed):
    """CSR↔ELL over the same random-case space (rectangular, empty rows,
    duplicates, pattern) — the padded re-layout must be lossless."""
    from sparsebase_tpu import ELL

    rng = np.random.default_rng(7000 + seed)
    for _ in range(4):
        n, m, r, c, v = _random_case(rng)
        oracle = _dense(n, m, r, c, v)
        csr = coo_to_csr(COO.new(r, c, v, shape=(n, m)))
        ell = csr.convert(ELL)
        assert ell.nnz == csr.nnz
        back = ell.convert(CSR)
        np.testing.assert_allclose(np.asarray(back.to_dense()), oracle,
                                   rtol=1e-6)
        # device flavor
        ell_d = csr.to_device().convert(ELL)
        back_d = ell_d.convert(CSR)
        np.testing.assert_allclose(np.asarray(back_d.to_dense()), oracle,
                                   rtol=1e-6)

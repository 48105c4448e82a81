"""Reorder + iterative solve via SpMV (reference: examples/linear_solver)."""

import numpy as np

from _common import parse_args

import sparsebase_tpu as sb
from sparsebase_tpu.bases import ReorderBase
from sparsebase_tpu.ops.reorder import RCMReorder


def main():
    args = parse_args(__doc__)
    # diagonally dominant SPD system on a small grid graph
    n = 64
    rng = np.random.default_rng(0)
    side = 8
    rows, cols, vals = [], [], []
    for i in range(side):
        for j in range(side):
            v = i * side + j
            for di, dj in ((0, 1), (1, 0)):
                ii, jj = i + di, j + dj
                if ii < side and jj < side:
                    u = ii * side + jj
                    w = -1.0
                    rows += [v, u]
                    cols += [u, v]
                    vals += [w, w]
    deg = np.zeros(n)
    np.add.at(deg, rows, 1.0)
    for v in range(n):
        rows.append(v)
        cols.append(v)
        vals.append(deg[v] + 1.0)
    A = sb.COO.new(
        np.array(rows, np.int32), np.array(cols, np.int32),
        np.array(vals, np.float64), shape=(n, n),
    ).convert(sb.CSR)

    order = RCMReorder().get_reorder(A)
    Ap = ReorderBase.permute2d(order, A)

    b = rng.standard_normal(n)
    bp = b[np.argsort(np.asarray(order))]

    # Jacobi iteration on the permuted system
    dense = np.asarray(Ap.to_dense())
    D = np.diag(dense)
    R = dense - np.diag(D)
    x = np.zeros(n)
    for it in range(200):
        x = (bp - R @ x) / D
    res = np.linalg.norm(dense @ x - bp)
    print("jacobi residual after 200 iters:", res)
    assert res < 1e-6


if __name__ == "__main__":
    main()

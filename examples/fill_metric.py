"""Judge fill-reducing orderings on symbolic-factorization fill
(the metric the reference's AMD optimizes via SuiteSparse,
reference: src/sparsebase/reorder/amd_reorder.cc:29-57)."""

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.bases import ReorderBase
from sparsebase_tpu.ops.feature import FillIn
from sparsebase_tpu.ops.reorder import AMDReorder, RCMReorder


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix)
    fill = FillIn().get_fill
    rows = {"natural": None, "rcm": RCMReorder, "amd": AMDReorder}
    for name, cls in rows.items():
        if cls is None:
            f = fill(g)
        else:
            f = fill(ReorderBase.permute2d(cls().get_reorder(g), g))
        print(f"{name:8s} nnz(L) = {f}")


if __name__ == "__main__":
    main()

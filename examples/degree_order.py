"""Degree reordering end to end (reference: examples/degree_order)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.bases import ReorderBase
from sparsebase_tpu.ops.feature import Bandwidth, Profile
from sparsebase_tpu.ops.reorder import DegreeReorder


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix, args.device)
    print("graph:", g)

    order = DegreeReorder(ascending=True).get_reorder(g)
    permuted = ReorderBase.permute2d(order, g)

    for name, m in [("input", g), ("degree-ordered", permuted)]:
        bw = int(np.asarray(Bandwidth().get_bandwidth(m)))
        pr = int(np.asarray(Profile().get_profile(m)))
        print(f"{name:15s} bandwidth={bw} profile={pr}")


if __name__ == "__main__":
    main()

"""AMD-equivalent minimum-degree ordering (reference: examples/amd_order)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.bases import ReorderBase
from sparsebase_tpu.ops.feature import Profile
from sparsebase_tpu.ops.reorder import AMDReorder


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix)
    order = AMDReorder().get_reorder(g)
    permuted = ReorderBase.permute2d(order, g)
    print("profile:", int(Profile().get_profile(g)), "->",
          int(Profile().get_profile(permuted)))


if __name__ == "__main__":
    main()

"""RCM reordering (reference: examples/rcm_order)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.bases import ReorderBase
from sparsebase_tpu.ops.feature import Bandwidth, Profile
from sparsebase_tpu.ops.reorder import RCMReorder


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix, args.device)
    order = RCMReorder().get_reorder(g)
    permuted = ReorderBase.permute2d(order, g)
    print("bandwidth:", int(np.asarray(Bandwidth().get_bandwidth(g))), "->",
          int(np.asarray(Bandwidth().get_bandwidth(permuted))))
    print("profile  :", int(np.asarray(Profile().get_profile(g))), "->",
          int(np.asarray(Profile().get_profile(permuted))))


if __name__ == "__main__":
    main()

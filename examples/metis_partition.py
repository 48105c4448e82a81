"""Native multilevel k-way partitioning (reference: examples/metis_partition)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.ops.partition import MetisPartition, balance_ratio, edge_cut


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix)
    for k in (2, 4, 8):
        part = MetisPartition(num_partitions=k, seed=0).partition(g)
        print(f"k={k}: edge cut={edge_cut(g, part)} "
              f"balance={balance_ratio(part, k):.3f}")


if __name__ == "__main__":
    main()

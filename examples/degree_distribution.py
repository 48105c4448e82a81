"""Degree distribution feature (reference: examples/degree_distribution)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.ops.feature import DegreeDistribution


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix, args.device)
    dist = np.asarray(DegreeDistribution().get_distribution(g))
    print("distribution[:10]:", dist[:10])
    print("sums to 1:", abs(float(dist.sum()) - 1.0) < 1e-5)


if __name__ == "__main__":
    main()

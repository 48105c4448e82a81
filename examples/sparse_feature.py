"""Fused feature extraction (reference: examples/sparse_feature)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.ops.feature import (
    AvgDegree,
    Bandwidth,
    DegreeDistribution,
    Degrees,
    FeatureExtractor,
    MaxDegree,
    MinDegree,
)


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix, args.device)
    ex = FeatureExtractor()
    out = ex.extract(
        g, features=[Degrees, DegreeDistribution, MinDegree, MaxDegree, AvgDegree, Bandwidth]
    )
    print("degrees[:10]      :", np.asarray(out[Degrees])[:10])
    print("distribution[:5]  :", np.asarray(out[DegreeDistribution])[:5])
    print("min/max/avg degree:", int(np.asarray(out[MinDegree])),
          int(np.asarray(out[MaxDegree])), float(np.asarray(out[AvgDegree])))
    print("bandwidth         :", int(np.asarray(out[Bandwidth])))


if __name__ == "__main__":
    main()

"""Order-1 arrays and 1-D permutation (reference: examples/array_example)."""

import numpy as np

from _common import parse_args

from sparsebase_tpu import DenseArray
from sparsebase_tpu.bases import ReorderBase


def main():
    parse_args(__doc__)
    arr = DenseArray.new(np.array([0.0, 0.1, 0.2], np.float32))
    print("array:", arr, np.asarray(arr.vals))
    order = np.array([2, 0, 1], np.int32)  # inverse permutation
    out = ReorderBase.permute1d(order, arr)
    print("permuted:", np.asarray(out.vals))
    inv = ReorderBase.inverse_permutation(order)
    back = ReorderBase.permute1d(inv, out)
    print("inverse recovers:", np.allclose(np.asarray(back.vals), np.asarray(arr.vals)))


if __name__ == "__main__":
    main()

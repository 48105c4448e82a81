"""Gray-code reordering (reference: examples/gray_order)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

from sparsebase_tpu.bases import ReorderBase
from sparsebase_tpu.ops.feature import OffDiagBlockNNZ
from sparsebase_tpu.ops.reorder import GrayReorder


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix, args.device)
    order = GrayReorder(resolution=32, nnz_threshold=4).get_reorder(g)
    permuted = ReorderBase.permute2d(order, g)
    f = OffDiagBlockNNZ(8, 8)
    print("off-diagonal-block nnz (8x8 blocks):",
          int(np.asarray(f.get_off_diag_block_nnz(g))), "->",
          int(np.asarray(f.get_off_diag_block_nnz(permuted))))


if __name__ == "__main__":
    main()

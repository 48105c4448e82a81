"""User-registered reordering (reference: examples/custom_order,
docs/pages/how_to_guides/how_add_reordering.md)."""

import numpy as np

from _common import load_symmetric_graph, parse_args

import sparsebase_tpu as sb
from sparsebase_tpu.ops.reorder import GenericReorder


def main():
    args = parse_args(__doc__)
    g = load_symmetric_graph(args.matrix)

    def reverse_order(formats, params):
        n = formats[0].nrows
        return np.arange(n - 1, -1, -1, dtype=np.int32)

    op = GenericReorder()
    op.register((sb.CSR,), reverse_order)
    order = op.get_reorder(g)
    print("order[:5] =", np.asarray(order)[:5], "(reversed ids)")


if __name__ == "__main__":
    main()

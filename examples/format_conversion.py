"""Conversion graph walkthrough (reference: examples/format_conversion)."""

import numpy as np

from _common import parse_args

import sparsebase_tpu as sb
from sparsebase_tpu.convert import default_graph


def main():
    args = parse_args(__doc__)
    g = default_graph()
    for a, b in [(sb.COO, sb.CSR), (sb.CSR, sb.CSC), (sb.CSC, sb.COO)]:
        chain = g.get_chain(a, b)
        print(f"{a.__name__:4s} -> {b.__name__:4s}: {len(chain)} step(s)")

    csr = sb.CSR.new(
        np.array([0, 2, 3, 4], np.int32),
        np.array([1, 2, 0, 0], np.int32),
        np.array([1, 2, 3, 4], np.int32),
        shape=(3, 3),
    )
    outs = sb.convert_cached(csr, sb.CSC)
    print("intermediates:", [type(o).__name__ for o in outs])
    # cross-dtype conversion with overflow checking
    wide = csr.astype(value_dtype=np.float64)
    print("values as f64:", np.asarray(wide.vals))


if __name__ == "__main__":
    main()

"""Containers + conversions (reference: examples/csr_coo)."""

import numpy as np

from _common import parse_args

import sparsebase_tpu as sb


def main():
    args = parse_args(__doc__)
    row = np.array([0, 0, 1, 2], np.int32)
    col = np.array([1, 2, 0, 0], np.int32)
    vals = np.array([1.0, 2.0, 3.0, 4.0], np.float32)

    coo = sb.COO.new(row, col, vals, shape=(3, 3))
    print("COO:", coo)

    csr = coo.convert(sb.CSR)
    print("CSR:", csr)
    print("  indptr :", np.asarray(csr.indptr))
    print("  indices:", np.asarray(csr.indices))

    csc = csr.convert(sb.CSC)
    print("CSC:", csc)

    back = csc.convert(sb.COO)
    print("round trip equal:", np.array_equal(back.to_dense(), coo.to_dense()))

    if args.device:
        dev = coo.to_device()
        print("on device:", dev.context, "->", dev.convert(sb.CSR))


if __name__ == "__main__":
    main()

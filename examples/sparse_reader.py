"""Readers and writers (reference: examples/sparse_reader)."""

import tempfile
from pathlib import Path

import numpy as np

from _common import parse_args

from sparsebase_tpu.bases import IOBase


def main():
    args = parse_args(__doc__)
    csr = IOBase.read_mtx_to_csr(args.matrix)
    print("mtx -> CSR:", csr)
    pigo = IOBase.read_pigo_mtx_to_csr(args.matrix)
    print("pigo parse matches:", np.array_equal(np.asarray(csr.indices), np.asarray(pigo.indices)))

    with tempfile.TemporaryDirectory() as d:
        sbff = str(Path(d) / "m.sbff")
        IOBase.write_csr_to_binary(csr, sbff)
        back = IOBase.read_binary_to_csr(sbff)
        print("sbff round trip:", np.array_equal(np.asarray(csr.indptr), np.asarray(back.indptr)))

        el = str(Path(d) / "edges.txt")
        from sparsebase_tpu.io import EdgeListWriter

        EdgeListWriter(el).write_csr(csr)
        coo = IOBase.read_edge_list_to_coo(el, read_undirected=False)
        print("edge list entries:", coo.nnz)


if __name__ == "__main__":
    main()

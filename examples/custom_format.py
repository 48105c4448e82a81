"""Registering a user-defined format + conversion (reference:
examples/custom_format, custom_converter)."""

import dataclasses

import numpy as np

from _common import parse_args

import sparsebase_tpu as sb
from sparsebase_tpu.convert.graph import ConversionGraph
from sparsebase_tpu.formats.base import Format, register_format, static_field


@register_format
@dataclasses.dataclass(frozen=True)
class DIA(Format):
    """Toy diagonal-storage format."""

    offsets: object  # (k,)
    data: object  # (k, n)
    _shape: tuple = static_field(default=(0, 0))
    order = 2

    @property
    def shape(self):
        return self._shape

    @property
    def nnz(self):
        return int((np.asarray(self.data) != 0).sum())


def csr_to_dia(csr: sb.CSR) -> DIA:
    dense = np.asarray(csr.to_dense())
    n = dense.shape[0]
    offs = sorted({int(j - i) for i, j in zip(*np.nonzero(dense))})
    data = np.zeros((len(offs), n), dense.dtype)
    for k, o in enumerate(offs):
        for i in range(n):
            j = i + o
            if 0 <= j < n:
                data[k, i] = dense[i, j]
    return DIA(np.array(offs), data, dense.shape)


def main():
    parse_args(__doc__)
    graph = ConversionGraph()
    graph.register(sb.CSR, DIA, csr_to_dia)
    # also reachable from COO via the builtin COO->CSR edge
    from sparsebase_tpu.convert.kernels import coo_to_csr

    graph.register(sb.COO, sb.CSR, coo_to_csr)

    row = np.array([0, 1, 2], np.int32)
    col = np.array([0, 1, 2], np.int32)
    vals = np.array([1.0, 2.0, 3.0], np.float32)
    coo = sb.COO.new(row, col, vals, shape=(3, 3))
    dia = graph.convert(coo, DIA)  # BFS finds COO -> CSR -> DIA
    print("chain length:", len(graph.get_chain(sb.COO, DIA)))
    print("DIA offsets:", np.asarray(dia.offsets), "nnz:", dia.nnz)


if __name__ == "__main__":
    main()

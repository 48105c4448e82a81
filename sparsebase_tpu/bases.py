"""Static façades: the "easy" API.

TPU-native analogue of the reference bases layer
(reference: src/sparsebase/bases/iobase.h:46-390,
reorder_base.h:29-708, graph_feature_base.h:20-135). Each façade is a
class of static one-liners delegating to readers/ops.

``ReorderBase`` and ``GraphFeatureBase`` methods appear here as the ops
layers land (ops/reorder, ops/feature).
"""

from __future__ import annotations

from typing import Optional, Type

from .context import Context
from .formats.array import DenseArray
from .formats.coo import COO
from .formats.csr import CSR
from .formats.base import Format


class IOBase:
    """Parity: ``bases::IOBase`` (bases/iobase.h:46-390) — 19 static
    read/write helpers."""

    # -- MTX -----------------------------------------------------------------
    @staticmethod
    def read_mtx_to_csr(filename: str, convert_to_zero_index: bool = True, **kw) -> CSR:
        from .io.mtx import MTXReader

        return MTXReader(filename, convert_to_zero_index, **kw).read_csr()

    @staticmethod
    def read_mtx_to_coo(filename: str, convert_to_zero_index: bool = True, **kw) -> COO:
        from .io.mtx import MTXReader

        return MTXReader(filename, convert_to_zero_index, **kw).read_coo()

    @staticmethod
    def read_mtx_to_array(filename: str, **kw) -> DenseArray:
        from .io.mtx import MTXReader

        return MTXReader(filename, **kw).read_array()

    # PIGO-parallel variants: same semantics, native parse path when the
    # fastio extension is built; falls back to the numpy path.
    @staticmethod
    def read_pigo_mtx_to_csr(filename: str, convert_to_zero_index: bool = True, **kw) -> CSR:
        return IOBase.read_mtx_to_csr(filename, convert_to_zero_index, **kw)

    @staticmethod
    def read_pigo_mtx_to_coo(filename: str, convert_to_zero_index: bool = True, **kw) -> COO:
        return IOBase.read_mtx_to_coo(filename, convert_to_zero_index, **kw)

    # -- edge list -----------------------------------------------------------
    @staticmethod
    def read_edge_list_to_csr(filename: str, **kw) -> CSR:
        from .io.edge_list import EdgeListReader

        return EdgeListReader(filename, **kw).read_csr()

    @staticmethod
    def read_edge_list_to_coo(filename: str, **kw) -> COO:
        from .io.edge_list import EdgeListReader

        return EdgeListReader(filename, **kw).read_coo()

    @staticmethod
    def read_pigo_edge_list_to_csr(filename: str, **kw) -> CSR:
        return IOBase.read_edge_list_to_csr(filename, **kw)

    @staticmethod
    def read_pigo_edge_list_to_coo(filename: str, **kw) -> COO:
        return IOBase.read_edge_list_to_coo(filename, **kw)

    # -- SBFF binary ---------------------------------------------------------
    @staticmethod
    def read_binary_to_csr(filename: str) -> CSR:
        from .io.binary import BinaryReaderOrderTwo

        return BinaryReaderOrderTwo(filename).read_csr()

    @staticmethod
    def read_binary_to_coo(filename: str) -> COO:
        from .io.binary import BinaryReaderOrderTwo

        return BinaryReaderOrderTwo(filename).read_coo()

    @staticmethod
    def read_binary_to_array(filename: str) -> DenseArray:
        from .io.binary import BinaryReaderOrderOne

        return BinaryReaderOrderOne(filename).read_array()

    @staticmethod
    def write_csr_to_binary(csr: CSR, filename: str) -> None:
        from .io.binary import BinaryWriterOrderTwo

        BinaryWriterOrderTwo(filename).write_csr(csr)

    @staticmethod
    def write_coo_to_binary(coo: COO, filename: str) -> None:
        from .io.binary import BinaryWriterOrderTwo

        BinaryWriterOrderTwo(filename).write_coo(coo)

    @staticmethod
    def write_array_to_binary(arr: DenseArray, filename: str) -> None:
        from .io.binary import BinaryWriterOrderOne

        BinaryWriterOrderOne(filename).write_array(arr)

    # -- MTX writing ---------------------------------------------------------
    @staticmethod
    def write_coo_to_mtx(coo: COO, filename: str, **kw) -> None:
        from .io.mtx import MTXWriter

        kw.setdefault("field", "pattern" if coo.vals is None else "real")
        MTXWriter(filename, **kw).write_coo(coo)

    @staticmethod
    def write_csr_to_mtx(csr: CSR, filename: str, **kw) -> None:
        from .io.mtx import MTXWriter

        kw.setdefault("field", "pattern" if csr.vals is None else "real")
        MTXWriter(filename, **kw).write_csr(csr)

    @staticmethod
    def write_array_to_mtx(arr: DenseArray, filename: str, **kw) -> None:
        from .io.mtx import MTXWriter

        MTXWriter(filename, format="array", **kw).write_array(arr)

"""Sparse I/O: MTX, edge list, SBFF binary, METIS graph, PaToH hypergraph.

Reference analogue: src/sparsebase/io/ (SURVEY.md §2.8).
"""

from .binary import (
    BinaryReaderOrderOne,
    BinaryReaderOrderTwo,
    BinaryWriterOrderOne,
    BinaryWriterOrderTwo,
    SbffObject,
)
from .edge_list import EdgeListReader, EdgeListWriter
from .metis_graph import MetisGraphReader, MetisGraphWriter
from .mtx import MTXReader, MTXWriter
from .patoh import PatohReader, PatohWriter
from .pigo import PigoEdgeListReader, PigoMTXReader

__all__ = [
    "MTXReader",
    "MTXWriter",
    "EdgeListReader",
    "EdgeListWriter",
    "BinaryReaderOrderOne",
    "BinaryReaderOrderTwo",
    "BinaryWriterOrderOne",
    "BinaryWriterOrderTwo",
    "SbffObject",
    "MetisGraphReader",
    "MetisGraphWriter",
    "PatohReader",
    "PatohWriter",
    "PigoMTXReader",
    "PigoEdgeListReader",
]

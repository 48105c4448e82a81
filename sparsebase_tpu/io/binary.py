"""SBFF (SparseBase Binary File Format) reader/writer.

Byte-compatible with the reference SBFF container
(reference: src/sparsebase/io/sparse_file_format.h:29-330;
binary_reader_order_{one,two}.cc, binary_writer_order_{one,two}.cc):

* object header: 1024-byte space-padded JSON
  ``{name, array_count, dimensions, endian}``
* per array: 1024-byte space-padded JSON
  ``{name, type, type_size, array_size}`` followed by raw data;
  ``type`` ∈ {"float", "signed", "unsigned"}
* cross-endian reads byteswap (SwapEndian parity)

This is the checkpoint/persistence layer (SURVEY.md §5): device arrays
round-trip host RAM ↔ disk; reads can be memory-mapped.
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..formats.array import DenseArray
from ..formats.coo import COO
from ..formats.csr import CSR
from ..utils.exceptions import ReaderError, WriterError

_HEADER_BYTES = 1024


def _native_endian() -> str:
    return "little" if sys.byteorder == "little" else "big"


def _type_tag(dtype: np.dtype) -> str:
    if np.issubdtype(dtype, np.floating):
        return "float"
    if np.issubdtype(dtype, np.signedinteger):
        return "signed"
    if np.issubdtype(dtype, np.unsignedinteger):
        return "unsigned"
    raise WriterError(f"Type {dtype} is not supported by SBFF")


def _dtype_from_tag(tag: str, size: int) -> np.dtype:
    kind = {"float": "f", "signed": "i", "unsigned": "u"}.get(tag)
    if kind is None:
        raise ReaderError(f"Unknown SBFF type tag {tag!r}")
    return np.dtype(f"{kind}{size}")


def _pack_header(header: dict) -> bytes:
    raw = json.dumps(header).encode()
    if len(raw) > _HEADER_BYTES:
        raise WriterError("Header size exceeds 1 KB")
    return raw + b" " * (_HEADER_BYTES - len(raw))


def _read_header(f) -> dict:
    raw = f.read(_HEADER_BYTES)
    if len(raw) < _HEADER_BYTES:
        raise ReaderError("Truncated SBFF header")
    try:
        return json.loads(raw.decode())
    except json.JSONDecodeError as e:
        raise ReaderError(f"Bad SBFF header: {e}")


class SbffObject:
    """Named collection of dtype-tagged arrays + dimensions (SbffObject
    parity, sparse_file_format.h:203-330)."""

    def __init__(self, name: str):
        self.name = name
        self.dimensions: List[int] = []
        self._arrays: Dict[str, np.ndarray] = {}

    def add_dimensions(self, dims) -> None:
        self.dimensions.extend(int(d) for d in dims)

    def add_array(self, name: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        _type_tag(arr.dtype)  # validate
        self._arrays[name] = arr

    def get_array(self, name: str) -> np.ndarray:
        try:
            return self._arrays[name]
        except KeyError:
            raise ReaderError(f"SBFF object has no array {name!r}")

    def has_array(self, name: str) -> bool:
        return name in self._arrays

    @property
    def array_count(self) -> int:
        return len(self._arrays)

    def write(self, filename: str) -> None:
        with open(filename, "wb") as f:
            f.write(
                _pack_header(
                    {
                        "name": self.name,
                        "array_count": len(self._arrays),
                        "dimensions": self.dimensions,
                        "endian": _native_endian(),
                    }
                )
            )
            for name, arr in self._arrays.items():
                f.write(
                    _pack_header(
                        {
                            "name": name,
                            "type": _type_tag(arr.dtype),
                            "type_size": arr.dtype.itemsize,
                            "array_size": arr.size,
                        }
                    )
                )
                f.write(arr.tobytes())

    @staticmethod
    def read(filename: str) -> "SbffObject":
        with open(filename, "rb") as f:
            header = _read_header(f)
            obj = SbffObject(header["name"])
            obj.add_dimensions(header.get("dimensions", []))
            endian = header.get("endian", _native_endian())
            for _ in range(int(header["array_count"])):
                ah = _read_header(f)
                dtype = _dtype_from_tag(ah["type"], int(ah["type_size"]))
                n = int(ah["array_size"])
                data = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype)
                if endian != _native_endian():
                    data = data.byteswap()
                obj._arrays[ah["name"]] = data
            return obj


class BinaryWriterOrderTwo:
    """Writes COO/CSR to SBFF (binary_writer_order_two.cc parity:
    object names "coo"/"csr", array names row/col/vals, row_ptr/col/vals)."""

    def __init__(self, filename: str):
        self.filename = filename

    def write_coo(self, coo: COO) -> None:
        coo = coo.to_host()
        obj = SbffObject("coo")
        obj.add_dimensions(coo.shape)
        obj.add_array("row", np.asarray(coo.row))
        obj.add_array("col", np.asarray(coo.col))
        if coo.vals is not None:
            obj.add_array("vals", np.asarray(coo.vals))
        obj.write(self.filename)

    def write_csr(self, csr: CSR) -> None:
        csr = csr.to_host()
        obj = SbffObject("csr")
        obj.add_dimensions(csr.shape)
        obj.add_array("row_ptr", np.asarray(csr.indptr))
        obj.add_array("col", np.asarray(csr.indices))
        if csr.vals is not None:
            obj.add_array("vals", np.asarray(csr.vals))
        obj.write(self.filename)


class BinaryWriterOrderOne:
    """Writes a DenseArray to SBFF (binary_writer_order_one.cc parity)."""

    def __init__(self, filename: str):
        self.filename = filename

    def write_array(self, arr: DenseArray) -> None:
        arr = arr.to_host()
        obj = SbffObject("array")
        obj.add_dimensions(arr.shape)
        obj.add_array("array", np.asarray(arr.vals))
        obj.write(self.filename)


class BinaryReaderOrderTwo:
    """Reads SBFF "coo"/"csr" objects (binary_reader_order_two.cc parity)."""

    def __init__(self, filename: str):
        self.filename = filename

    def read_coo(self) -> COO:
        obj = SbffObject.read(self.filename)
        if obj.name != "coo":
            raise ReaderError(f"SBFF object is {obj.name!r}, expected 'coo'")
        vals = obj.get_array("vals") if obj.has_array("vals") else None
        shape = tuple(obj.dimensions) if obj.dimensions else None
        return COO.new(obj.get_array("row"), obj.get_array("col"), vals, shape=shape)

    def read_csr(self) -> CSR:
        obj = SbffObject.read(self.filename)
        if obj.name != "csr":
            raise ReaderError(f"SBFF object is {obj.name!r}, expected 'csr'")
        vals = obj.get_array("vals") if obj.has_array("vals") else None
        shape = tuple(obj.dimensions) if obj.dimensions else None
        return CSR.new(obj.get_array("row_ptr"), obj.get_array("col"), vals, shape=shape)


class BinaryReaderOrderOne:
    """Reads an SBFF "array" object (binary_reader_order_one.cc parity)."""

    def __init__(self, filename: str):
        self.filename = filename

    def read_array(self) -> DenseArray:
        obj = SbffObject.read(self.filename)
        if obj.name != "array":
            raise ReaderError(f"SBFF object is {obj.name!r}, expected 'array'")
        return DenseArray.new(obj.get_array("array"))

"""Sparse/dense pytree containers (reference: src/sparsebase/format/)."""

from .array import Array, DenseArray
from .base import Format, register_format, registered_formats, static_field
from .coo import COO
from .csc import CSC
from .csr import CSR
from .dia import DIA
from .ell import ELL

__all__ = [
    "Format",
    "CSR",
    "COO",
    "CSC",
    "DIA",
    "ELL",
    "DenseArray",
    "Array",
    "register_format",
    "registered_formats",
    "static_field",
]

"""Scalar row-degree statistics: min / max / avg + the fused triple.

Reference analogues: src/sparsebase/feature/min_degree.cc, max_degree.cc,
avg_degree.cc, min_max_avg_degree.cc.
"""

from __future__ import annotations

import numpy as np

from ...formats.base import xp_for
from ...formats.csr import CSR
from .base import Feature, FusedFeature
from .degrees import _row_degrees


class MinDegree(Feature):
    def __init__(self):
        super().__init__("min_degree")
        self.register((CSR,), lambda f, p: _row_degrees(f[0]).min())


class MaxDegree(Feature):
    def __init__(self):
        super().__init__("max_degree")
        self.register((CSR,), lambda f, p: _row_degrees(f[0]).max())


class AvgDegree(Feature):
    """Average degree = nnz / nrows as float (avg_degree.cc)."""

    def __init__(self):
        super().__init__("avg_degree")
        self.register((CSR,), lambda f, p: f[0].nnz / max(f[0].nrows, 1))


class MinMaxAvgDegree(FusedFeature):
    """Fused all three (min_max_avg_degree.cc; sub_ids = 3)."""

    SUB_FEATURES = (MinDegree, MaxDegree, AvgDegree)

    def __init__(self):
        super().__init__("min_max_avg_degree")
        self.register((CSR,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csr: CSR = formats[0]
        deg = _row_degrees(csr)
        return {
            MinDegree: deg.min(),
            MaxDegree: deg.max(),
            AvgDegree: csr.nnz / max(csr.nrows, 1),
        }

"""Column-degree statistics (computed on CSC, like the reference).

Reference analogues: src/sparsebase/feature/{min,max,avg}_degree_column.cc,
median_degree_column.cc, standard_deviation_degree_column.cc,
coefficient_of_variation_degree_column.cc, geometric_avg_degree_column.cc.
All register on CSC (avg_degree_column.cc:50-52) so CSR/COO inputs
auto-convert.

Formula notes (reference parity, quirks preserved):
* StandardDeviation returns sqrt(Σ(d-μ)²) — the reference does **not**
  divide by n (standard_deviation_degree_column.cc:137-141)
* CoefficientOfVariation = that "std" / μ
* GeometricAvg = exp(mean(log d)) — -inf when any column is empty, as in
  the reference (geometric_avg_degree_column.cc:134-138)
* Median averages the two middle elements for even n
"""

from __future__ import annotations

import numpy as np

from ...formats.base import xp_for
from ...formats.csc import CSC
from .base import Feature


def _col_degrees(csc: CSC):
    return csc.indptr[1:] - csc.indptr[:-1]


class MinDegreeColumn(Feature):
    def __init__(self):
        super().__init__("min_degree_column")
        self.register((CSC,), lambda f, p: _col_degrees(f[0]).min())


class MaxDegreeColumn(Feature):
    def __init__(self):
        super().__init__("max_degree_column")
        self.register((CSC,), lambda f, p: _col_degrees(f[0]).max())


class AvgDegreeColumn(Feature):
    def __init__(self):
        super().__init__("avg_degree_column")
        self.register((CSC,), lambda f, p: f[0].nnz / max(f[0].ncols, 1))


class MedianDegreeColumn(Feature):
    def __init__(self):
        super().__init__("median_degree_column")
        self.register((CSC,), self._impl)

    @staticmethod
    def _impl(formats, params):
        deg = _col_degrees(formats[0])
        xp = xp_for(deg)
        return xp.median(deg.astype(xp.float64 if xp is np else xp.float32))


class StandardDeviationDegreeColumn(Feature):
    def __init__(self):
        super().__init__("standard_deviation_degree_column")
        self.register((CSC,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csc: CSC = formats[0]
        deg = _col_degrees(csc)
        xp = xp_for(deg)
        f = deg.astype(xp.float64 if xp is np else xp.float32)
        avg = csc.nnz / max(csc.ncols, 1)
        return xp.sqrt(((f - avg) ** 2).sum())


class CoefficientOfVariationDegreeColumn(Feature):
    def __init__(self):
        super().__init__("coefficient_of_variation_degree_column")
        self.register((CSC,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csc: CSC = formats[0]
        std = StandardDeviationDegreeColumn._impl(formats, params)
        avg = csc.nnz / max(csc.ncols, 1)
        return std / avg if avg else float("inf")


class GeometricAvgDegreeColumn(Feature):
    def __init__(self):
        super().__init__("geometric_avg_degree_column")
        self.register((CSC,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csc: CSC = formats[0]
        deg = _col_degrees(csc)
        xp = xp_for(deg)
        with np.errstate(divide="ignore"):
            logs = xp.log(deg.astype(xp.float64 if xp is np else xp.float32))
        return xp.exp(logs.sum() / max(csc.ncols, 1))

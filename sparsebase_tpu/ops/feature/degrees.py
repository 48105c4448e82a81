"""Row-degree features: Degrees, DegreeDistribution, and the fused pair.

Reference analogues: src/sparsebase/feature/degrees.cc,
degree_distribution.cc, degrees_degree_distribution.cc:109-150.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...formats.base import xp_for
from ...formats.csr import CSR
from .base import Feature, FusedFeature


def _row_degrees(csr: CSR):
    return (csr.indptr[1:] - csr.indptr[:-1]).astype(csr.indices.dtype)


class Degrees(Feature):
    """Per-row degree array (feature/degrees.cc GetDegreesCSR)."""

    def __init__(self):
        super().__init__("degrees")
        self.register((CSR,), lambda f, p: _row_degrees(f[0]))

    def get_degrees(self, fmt, context=None, convert_input=True):
        return self.execute(self.params, fmt, context=context, convert_input=convert_input)


@dataclasses.dataclass
class DegreeDistributionParams:
    float_dtype: object = np.float32


class DegreeDistribution(Feature):
    """degree / nnz per vertex (feature/degree_distribution.cc)."""

    def __init__(self, float_dtype=np.float32):
        super().__init__("degree_distribution")
        self.params = DegreeDistributionParams(float_dtype)
        self.register((CSR,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csr: CSR = formats[0]
        deg = _row_degrees(csr)
        return deg.astype(params.float_dtype) / max(csr.nnz, 1)

    def get_distribution(self, fmt, context=None, convert_input=True):
        return self.execute(self.params, fmt, context=context, convert_input=convert_input)


class DegreesDegreeDistribution(FusedFeature):
    """Fused {Degrees, DegreeDistribution} in one pass
    (degrees_degree_distribution.cc:109-150)."""

    SUB_FEATURES = (Degrees, DegreeDistribution)

    def __init__(self):
        super().__init__("degrees_degree_distribution")
        self.params = DegreeDistributionParams()
        self.register((CSR,), self._impl)

    @staticmethod
    def _impl(formats, params):
        csr: CSR = formats[0]
        deg = _row_degrees(csr)
        dist = deg.astype(params.float_dtype if params else np.float32) / max(csr.nnz, 1)
        return {Degrees: deg, DegreeDistribution: dist}

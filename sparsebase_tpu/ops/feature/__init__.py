"""Feature extraction (reference: src/sparsebase/feature/, SURVEY.md §2.7).

All 19 reference features + the fused-extraction framework, plus
:class:`FillIn` (symbolic-factorization nnz(L) — the fill metric AMD is
judged on; no reference counterpart since the reference delegates to
SuiteSparse AMD, amd_reorder.cc:29-57).
``FeatureExtractor()`` comes pre-registered with every feature class
(feature/feature_extractor.cc:12-28 analogue — extended to the full set).
"""

from .base import Extractor, Feature, FusedFeature
from .column_stats import (
    AvgDegreeColumn,
    CoefficientOfVariationDegreeColumn,
    GeometricAvgDegreeColumn,
    MaxDegreeColumn,
    MedianDegreeColumn,
    MinDegreeColumn,
    StandardDeviationDegreeColumn,
)
from .degree_stats import AvgDegree, MaxDegree, MinDegree, MinMaxAvgDegree
from .degrees import Degrees, DegreeDistribution, DegreesDegreeDistribution
from .fill import FillIn
from .jaccard import JaccardWeights
from .structure import Bandwidth, OffDiagBlockNNZ, Profile
from .triangles import TriangleCount

ALL_FEATURES = (
    Degrees,
    DegreeDistribution,
    DegreesDegreeDistribution,
    MinDegree,
    MaxDegree,
    AvgDegree,
    MinMaxAvgDegree,
    MinDegreeColumn,
    MaxDegreeColumn,
    AvgDegreeColumn,
    MedianDegreeColumn,
    StandardDeviationDegreeColumn,
    CoefficientOfVariationDegreeColumn,
    GeometricAvgDegreeColumn,
    Bandwidth,
    Profile,
    OffDiagBlockNNZ,
    TriangleCount,
    JaccardWeights,
    FillIn,
)

# reference parity set (§2.7): exactly the 19 reference features
REFERENCE_FEATURES = ALL_FEATURES[:-1]


class FeatureExtractor(Extractor):
    """Extractor pre-registered with every feature (incl. fused classes)."""

    def __init__(self):
        super().__init__()
        for cls in ALL_FEATURES:
            self.register_class(cls)


__all__ = [
    "Feature",
    "FusedFeature",
    "Extractor",
    "FeatureExtractor",
    "ALL_FEATURES",
    "Degrees",
    "DegreeDistribution",
    "DegreesDegreeDistribution",
    "MinDegree",
    "MaxDegree",
    "AvgDegree",
    "MinMaxAvgDegree",
    "MinDegreeColumn",
    "MaxDegreeColumn",
    "AvgDegreeColumn",
    "MedianDegreeColumn",
    "StandardDeviationDegreeColumn",
    "CoefficientOfVariationDegreeColumn",
    "GeometricAvgDegreeColumn",
    "Bandwidth",
    "Profile",
    "OffDiagBlockNNZ",
    "TriangleCount",
    "JaccardWeights",
    "FillIn",
    "REFERENCE_FEATURES",
]

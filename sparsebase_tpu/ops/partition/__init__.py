"""Partitioning algorithms (reference: src/sparsebase/partition/, SURVEY.md §2.6).

All partitioners return ``part[vertex] = part_id``. Unlike the reference
— which wraps external METIS/PULP/PaToH behind build flags — these are
native implementations (multilevel k-way, size-constrained label
propagation, column-net hypergraph LP), so no optional dependencies.
"""

from .base import Partitioner, balance_ratio, edge_cut, part_sizes
from .hypergraph import (
    PatohPartition,
    PatohPartitionParams,
    column_net_hypergraph,
    cutsize_connectivity,
)
from .labelprop import PulpPartition, PulpPartitionParams
from .multilevel import MetisPartition, MetisPartitionParams

__all__ = [
    "Partitioner",
    "edge_cut",
    "part_sizes",
    "balance_ratio",
    "MetisPartition",
    "MetisPartitionParams",
    "PulpPartition",
    "PulpPartitionParams",
    "PatohPartition",
    "PatohPartitionParams",
    "column_net_hypergraph",
    "cutsize_connectivity",
]

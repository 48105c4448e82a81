"""Preprocessing operations: reorder, permute, partition, feature.

Reference analogue: src/sparsebase/{reorder,permute,partition,feature}/.
"""

from . import feature, partition, permute, reorder

__all__ = ["feature", "partition", "permute", "reorder"]

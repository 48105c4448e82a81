"""Preprocessing operations: reorder, permute, partition, feature.

Reference analogue: src/sparsebase/{reorder,permute,partition,feature}/.
"""

from . import permute, reorder

__all__ = ["permute", "reorder"]

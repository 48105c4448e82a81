"""Generic (user-extensible) reorderer.

Parity: ``reorder::GenericReorder`` (reference:
src/sparsebase/reorder/generic_reorder.cc and
docs/pages/how_to_guides/how_add_reordering.md) — an empty shell users
register custom implementations into::

    op = GenericReorder()
    op.register((CSR,), my_impl)
    order = op.get_reorder(fmt)
"""

from __future__ import annotations

from .base import Reorderer


class GenericReorder(Reorderer):
    def __init__(self):
        super().__init__("generic_reorder")
        self.params = None

"""HTML spy-plot visualizer.

TPU-native analogue of the reference's (orphaned) Visualizer
(reference: src/sparsebase/utils/visualizer.cc:18-88 + style.css, 578
LoC): generates a standalone HTML report with bucketized-density spy
plots of the natural ordering and any number of alternative orderings,
plus a per-matrix feature table. Unlike the reference (which is not
wired into any build target), this one is part of the public API.

The density grids are ReorderHeatmap outputs (scatter-add histograms);
rendering is dependency-free inline SVG/CSS.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..formats.csr import CSR

_CSS = """
body { font-family: -apple-system, 'Segoe UI', sans-serif; margin: 2rem;
       background: #fafaf7; color: #1a1a18; }
h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 2rem; }
.grid { display: flex; flex-wrap: wrap; gap: 1.5rem; }
.card { background: #fff; border: 1px solid #e2e0da; border-radius: 8px;
        padding: 1rem; }
.card figcaption { margin-top: .5rem; font-size: .85rem; color: #555; }
table { border-collapse: collapse; margin-top: 1rem; }
td, th { border: 1px solid #e2e0da; padding: .35rem .7rem; font-size: .85rem; }
th { background: #f0efe9; text-align: left; }
"""


def _spy_svg(density: np.ndarray, size: int = 220) -> str:
    """Render a b×b density grid as an SVG heat map."""
    b = density.shape[0]
    cell = size / b
    mx = float(density.max()) or 1.0
    rects = []
    for i in range(b):
        for j in range(b):
            v = float(density[i, j]) / mx
            if v <= 0:
                continue
            alpha = 0.15 + 0.85 * v
            rects.append(
                f'<rect x="{j * cell:.1f}" y="{i * cell:.1f}" width="{cell:.1f}" '
                f'height="{cell:.1f}" fill="rgb(47,79,140)" fill-opacity="{alpha:.2f}"/>'
            )
    return (
        f'<svg width="{size}" height="{size}" style="border:1px solid #ccc">'
        + "".join(rects)
        + "</svg>"
    )


class Visualizer:
    """Build an HTML report of a matrix under several orderings.

    Usage::

        viz = Visualizer(csr, num_parts=64)
        viz.add_ordering("rcm", rcm_order)
        viz.add_features({"bandwidth": 42, "profile": 1234})
        viz.write_html("report.html")
    """

    def __init__(self, csr: CSR, num_parts: int = 64, title: str = "sparsebase_tpu report"):
        self.csr = csr.to_host()
        self.num_parts = min(num_parts, min(csr.shape))
        self.title = title
        self._orderings: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        self._features: Dict[str, object] = {}

    def add_ordering(self, name: str, row_order, col_order=None) -> None:
        row_order = np.asarray(row_order)
        col_order = row_order if col_order is None else np.asarray(col_order)
        self._orderings[name] = (row_order, col_order)

    def add_features(self, features: Dict[str, object]) -> None:
        self._features.update({k: v for k, v in features.items()})

    def _density(self, row_order, col_order):
        """(grid, stats) in one fused pass (reorder_heatmap.cc:58-106)."""
        from ..formats.array import DenseArray
        from ..ops.reorder.heatmap import ReorderHeatmap

        heat, stats = ReorderHeatmap(self.num_parts).get_heatmap_with_stats(
            self.csr, DenseArray.new(row_order), DenseArray.new(col_order)
        )
        return np.asarray(heat.vals).reshape(self.num_parts, self.num_parts), stats

    def _card(self, name, grid, stats) -> str:
        cap = (
            f"{name}<br><small>bw max {stats['max_bw']}, "
            f"mean {stats['mean_bw']:.1f}</small>"
        )
        return (
            '<figure class="card">'
            + _spy_svg(grid)
            + f"<figcaption>{cap}</figcaption></figure>"
        )

    def to_html(self) -> str:
        n, m = self.csr.shape
        ident = np.arange(n, dtype=np.asarray(self.csr.indices).dtype)
        ident_c = np.arange(m, dtype=ident.dtype)
        cards = [self._card("natural ordering", *self._density(ident, ident_c))]
        for name, (ro, co) in self._orderings.items():
            cards.append(self._card(name, *self._density(ro, co)))
        feat_rows = "".join(
            f"<tr><th>{k}</th><td>{v}</td></tr>" for k, v in self._features.items()
        )
        feats = f"<h2>Features</h2><table>{feat_rows}</table>" if feat_rows else ""
        return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{self.title}</title>
<style>{_CSS}</style></head><body>
<h1>{self.title}</h1>
<p>shape {n}×{m}, nnz {self.csr.nnz}</p>
<div class="grid">{''.join(cards)}</div>
{feats}
</body></html>"""

    def write_html(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_html())

"""Douglas-Peucker geometry simplification.

The reference simplifies geometries at ingest when ``--simpGeometry`` is
set: JTS ``DouglasPeuckerSimplifier.simplify(geom, tolerance)`` applied to
every geometry with at least ``--simpVertMin`` vertices
(extensions/adapters/vector/.../ingest/GeometrySimpOptionProvider.java:34-48).

Division-free split rule (works exactly in int64 and deterministically in
float64): split segment (lo, hi) at the interior point maximizing
``cross2 = (dx*(y-y_lo) - dy*(x-x_lo))**2`` (ties -> smallest index) iff
``cross2 > tol_sq * len2``; a degenerate chord (coincident endpoints)
compares squared euclidean distance against ``tol_sq`` instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .wkb import LineString, MultiGeometry, Point, Polygon, parse_wkb, to_wkb

__all__ = ["dp_keep_mask", "simplify_geometry", "simplify_wkb"]


def dp_keep_mask(x: np.ndarray, y: np.ndarray, tol_sq) -> np.ndarray:
    """Boolean keep-mask of Douglas-Peucker over an ordered point sequence
    (endpoints always kept).  Arithmetic stays in the input dtype: exact
    for int64 coordinates, IEEE-deterministic for float64."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        xs = x[lo + 1 : hi]
        ys = y[lo + 1 : hi]
        dx = x[hi] - x[lo]
        dy = y[hi] - y[lo]
        if dx == 0 and dy == 0:
            m = (xs - x[lo]) ** 2 + (ys - y[lo]) ** 2
            lim = tol_sq
        else:
            cr = dx * (ys - y[lo]) - dy * (xs - x[lo])
            m = cr * cr
            lim = tol_sq * (dx * dx + dy * dy)
        j = int(np.argmax(m))  # ties -> smallest index
        if m[j] > lim:
            k = lo + 1 + j
            keep[k] = True
            stack.append((lo, k))
            stack.append((k, hi))
    return keep


def _simplify_ring(ring: np.ndarray, tol_sq: float) -> np.ndarray:
    """Closed ring (first == last): DP over the closed sequence with the
    first vertex pinned; if the result would drop below 4 points (the
    minimum valid closed ring) the original ring is kept — JTS DP can emit
    invalid rings, the reference ingests them anyway; we keep validity."""
    keep = dp_keep_mask(ring[:, 0], ring[:, 1], tol_sq)
    if keep.sum() < 4:
        return ring
    return ring[keep]


def simplify_geometry(g, tolerance: float, min_vertices: int = 2):
    """DouglasPeuckerSimplifier.simplify analog over the engine's geometry
    model; geometries with fewer than ``min_vertices`` vertices pass
    through unchanged (the --simpVertMin gate)."""
    tol_sq = float(tolerance) * float(tolerance)
    if isinstance(g, Point):
        return g
    if isinstance(g, LineString):
        if len(g.coords) < min_vertices:
            return g
        return LineString(g.coords[dp_keep_mask(g.coords[:, 0], g.coords[:, 1], tol_sq)])
    if isinstance(g, Polygon):
        if len(g.shell) < min_vertices:
            return g
        return Polygon(
            _simplify_ring(g.shell, tol_sq),
            [_simplify_ring(h, tol_sq) for h in g.holes],
        )
    if isinstance(g, MultiGeometry):
        return MultiGeometry([simplify_geometry(p, tolerance, min_vertices) for p in g.parts])
    return g


def simplify_wkb(ds, wkb_col: str = "wkb", tolerance: float = 0.02, min_vertices: int = 2):
    """Ingest-time geometry simplification stage: decode WKB, apply DP,
    re-encode (one map_batches pass; geometry decode is inherently per-row
    like the reference's per-feature SimpleFeature transform)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(wkb_col)
        out = [
            to_wkb(simplify_geometry(parse_wkb(v.as_py()), tolerance, min_vertices))
            for v in col
        ]
        i = batch.schema.get_field_index(wkb_col)
        return batch.set_column(i, wkb_col, pa.array(out, type=pa.large_binary()))

    fn.__name__ = "simplify_wkb"
    return ds.map_batches(fn, batch_format="pyarrow")

"""Vectorized polygon measure functions (area / centroid / bbox) over WKB.

Reference analog: GeoWave delegates geometry measures to JTS
(``Geometry.getArea()`` / ``getCentroid()`` — used e.g. by the analytic
convex-hull and KDE jobs); this engine computes them batch-vectorized with
the shoelace formula over integer-scaled coordinates, so results are EXACT
int64s and a DuckDB oracle can replay them (no float summation order
dependence).

For a closed shell (first == last vertex, k distinct vertices):

- ``area2``  = signed shoelace sum  ``sum_i (x_i*y_{i+1} - x_{i+1}*y_i)``
  (twice the signed area; positive = counter-clockwise),
- ``cx_num`` / ``cy_num`` = centroid numerators
  ``sum_i (x_i + x_{i+1}) * cross_i`` (centroid = num / (3 * area2)),
- bbox min/max per axis, ``n_vertices`` = k.

All reductions are ``np.add.reduceat`` over one flattened coordinate array
per batch — no per-vertex Python loops; the per-geometry WKB header parse
is O(#geometries).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .wkb import Polygon, parse_wkb

__all__ = ["ring_measures", "polygon_measures", "ring_self_intersections"]


def ring_measures(starts: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> dict:
    """Measures for flattened OPEN rings (closing vertex removed).

    ``starts``: int64 start offset of each ring in ``xs``/``ys`` (the last
    ring ends at ``len(xs)``).  Coordinates must be int64.

    Each ring is translated to its bbox min before the shoelace pass:
    ``area2`` is translation-invariant and the centroid numerators shift
    back by the exact integer identity ``cx_num = cx_num_local +
    3*area2*x0`` — so every intermediate stays at EXTENT scale
    (~4*k*extent^3) instead of coordinate scale.  The naive form's
    per-term products exceed 2**63 for degree-range coordinates at
    scale >= ~1e4 and silently rely on int64 modular wraparound
    cancelling (correct only while the FINAL value fits int64); the
    translated form never wraps, and a result that genuinely cannot
    fit int64 raises ValueError instead of returning wrapped garbage."""
    n = len(xs)
    counts = np.diff(np.append(starts, n))
    ends = np.append(starts[1:], n) - 1  # last-vertex index per ring
    minx = np.minimum.reduceat(xs, starts)
    miny = np.minimum.reduceat(ys, starts)
    maxx = np.maximum.reduceat(xs, starts)
    maxy = np.maximum.reduceat(ys, starts)
    ext = np.maximum(maxx - minx, maxy - miny).astype(np.float64)
    if np.any(4.0 * counts * ext**3 > 2.0**62):
        raise ValueError(
            "ring_measures: extent*scale too large — the shoelace "
            "intermediates would exceed int64; reduce `scale`"
        )
    xl = xs - np.repeat(minx, counts)
    yl = ys - np.repeat(miny, counts)
    x_next = np.empty_like(xl)
    y_next = np.empty_like(yl)
    x_next[:n - 1] = xl[1:]
    y_next[:n - 1] = yl[1:]
    x_next[ends] = xl[starts]  # wrap each ring's last vertex to its first
    y_next[ends] = yl[starts]
    cross = xl * y_next - x_next * yl
    area2 = np.add.reduceat(cross, starts)
    cx_loc = np.add.reduceat((xl + x_next) * cross, starts)
    cy_loc = np.add.reduceat((yl + y_next) * cross, starts)
    a_f = np.abs(area2).astype(np.float64)
    if np.any(
        3.0 * a_f * np.maximum(np.abs(minx), np.abs(miny))
        + np.maximum(np.abs(cx_loc), np.abs(cy_loc))
        > 2.0**62
    ):
        raise ValueError(
            "ring_measures: centroid numerator would exceed int64 at this "
            "coordinate magnitude; reduce `scale`"
        )
    return {
        "n_vertices": counts.astype(np.int64),
        "area2": area2,
        "cx_num": cx_loc + 3 * area2 * minx,
        "cy_num": cy_loc + 3 * area2 * miny,
        "minx": minx,
        "miny": miny,
        "maxx": maxx,
        "maxy": maxy,
    }


def polygon_measures(ds, wkb_col: str = "wkb", id_col: str = "poly_id", scale: int = 1):
    """Per-polygon integer measures from a WKB column (shell ring only;
    holes would subtract — none of the engine's layers carry holes through
    this path).  ``scale`` multiplies coordinates before rounding to int64
    (use 10**k for k-decimal fixed-point exactness).  Map-only — streams."""

    def measure(batch: pa.Table) -> pa.Table:
        blobs = batch.column(wkb_col).to_pylist()
        starts = np.empty(len(blobs), dtype=np.int64)
        xs_l, ys_l = [], []
        off = 0
        for i, blob in enumerate(blobs):
            g = parse_wkb(blob)
            if not isinstance(g, Polygon):
                raise TypeError(f"polygon_measures: row {i} is {type(g).__name__}")
            shell = g.shell[:-1]  # drop closing vertex
            starts[i] = off
            off += len(shell)
            xs_l.append(shell[:, 0])
            ys_l.append(shell[:, 1])
        xs = np.rint(np.concatenate(xs_l) * scale).astype(np.int64)
        ys = np.rint(np.concatenate(ys_l) * scale).astype(np.int64)
        m = ring_measures(starts, xs, ys)
        out = {id_col: batch.column(id_col)}
        out.update({k: pa.array(v, type=pa.int64()) for k, v in m.items()})
        return pa.table(out)

    measure.__name__ = "polygon_measures"
    return ds.map_batches(measure, batch_format="pyarrow")


def ring_self_intersections(verts: np.ndarray, m_arr: np.ndarray) -> np.ndarray:
    """Per-ring count of NON-ADJACENT edge pairs that intersect (closed
    integer segment test) — the ring-validity core of JTS
    ``Geometry.isValid`` the reference leans on for every geometry it
    ingests (core/geotime/.../util/GeometryUtils.java geometry
    preparation; JTS IsValidOp).  A simple ring is valid iff the count
    is 0.

    ``verts``: (n_rings, max_m, 2) int64, row k = vertex k, rows beyond
    ``m_arr[r]`` ignored.  Edges are (k -> k+1 mod m).  Adjacent edge
    pairs (sharing a vertex, including the (0, m-1) wrap pair) are
    excluded.  Vectorized across rings x pair slots (rings are small —
    the all-pairs is over ONE ring's edges, never across rings).
    """
    n, mx, _ = verts.shape
    counts = np.zeros(n, dtype=np.int64)
    # pair slots (i, j): j >= i + 2, not the cyclic-adjacent (0, m-1)
    for i in range(mx - 2):
        for j in range(i + 2, mx):
            valid = (m_arr > j) & ~((i == 0) & (j == m_arr - 1))
            if not valid.any():
                continue
            i2 = (i + 1) % mx
            ax, ay = verts[:, i, 0], verts[:, i, 1]
            bx, by = verts[:, i2, 0], verts[:, i2, 1]
            j2 = j + 1  # may wrap per ring
            cx, cy = verts[:, j, 0], verts[:, j, 1]
            jn = np.where(j2 >= m_arr, 0, min(j2, mx - 1))
            dx = verts[np.arange(n), jn, 0]
            dy = verts[np.arange(n), jn, 1]
            # bbox precheck
            hit = (
                (np.maximum(ax, bx) >= np.minimum(cx, dx))
                & (np.minimum(ax, bx) <= np.maximum(cx, dx))
                & (np.maximum(ay, by) >= np.minimum(cy, dy))
                & (np.minimum(ay, by) <= np.maximum(cy, dy))
            )
            e1x, e1y = bx - ax, by - ay
            o1 = e1x * (cy - ay) - e1y * (cx - ax)
            o2 = e1x * (dy - ay) - e1y * (dx - ax)
            e2x, e2y = dx - cx, dy - cy
            o3 = e2x * (ay - cy) - e2y * (ax - cx)
            o4 = e2x * (by - cy) - e2y * (bx - cx)
            hit &= (o1 * o2 <= 0) & (o3 * o4 <= 0)
            counts += (hit & valid).astype(np.int64)
    return counts

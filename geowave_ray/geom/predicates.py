"""Spatial predicates (DE-9IM-style) in pure NumPy.

Implements the 8 compare operations of the reference's fine-grained filter
(``core/geotime/.../query/filter/SpatialQueryFilter.java:47-156``:
CONTAINS, OVERLAPS, INTERSECTS, EQUALS, DISJOINT, CROSSES, WITHIN, TOUCHES)
without JTS/shapely.  Scalar predicate evaluation classifies boundary
*pieces* (segments split at every intersection with the other geometry's
boundary, then located interior/boundary/exterior via their midpoints) —
robust for the truth-table semantics the reference tests
(SpatialQueryTest.java:60-157).

The hot path — point-in-polygon over large point batches — is the
vectorized ``points_in_polygon`` (even-odd ray cast + boundary tolerance),
used inside ``map_batches`` refinement stages.
"""

from __future__ import annotations

import numpy as np

from .wkb import Geometry, LineString, MultiGeometry, Point, Polygon

__all__ = [
    "points_in_polygon",
    "locate_point",
    "relate",
    "evaluate",
    "COMPARE_OPS",
]

EPS = 1e-9


# ------------------------------------------------------------------ hot path
def points_in_polygon(
    xs: np.ndarray,
    ys: np.ndarray,
    poly: Polygon,
    include_boundary: bool = True,
    eps: float = EPS,
) -> np.ndarray:
    """Vectorized even-odd point-in-polygon over shell + holes.

    O(#edges) NumPy passes over the point arrays; boundary points count as
    inside when ``include_boundary`` (INTERSECTS semantics).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    inside = np.zeros(xs.shape, dtype=bool)
    on_edge = np.zeros(xs.shape, dtype=bool) if include_boundary else None
    for ring in poly.rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        for i in range(len(x0)):
            ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
            # even-odd crossing: edge straddles the horizontal line at ys
            cond = (ay > ys) != (by > ys)
            if cond.any():
                t = (ys - ay) / (by - ay + ((by == ay) * 1e-300))
                cross_x = ax + t * (bx - ax)
                inside ^= cond & (xs < cross_x)
            if on_edge is not None:
                dx, dy = bx - ax, by - ay
                L2 = dx * dx + dy * dy
                if L2 == 0:
                    d2 = (xs - ax) ** 2 + (ys - ay) ** 2
                else:
                    t = np.clip(((xs - ax) * dx + (ys - ay) * dy) / L2, 0.0, 1.0)
                    d2 = (xs - (ax + t * dx)) ** 2 + (ys - (ay + t * dy)) ** 2
                on_edge |= d2 <= eps * eps
    if on_edge is not None:
        return inside | on_edge
    return inside


# ------------------------------------------------------------ scalar machinery
def _on_segment(px, py, ax, ay, bx, by, eps=EPS) -> bool:
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return (px - ax) ** 2 + (py - ay) ** 2 <= eps * eps
    t = ((px - ax) * dx + (py - ay) * dy) / L2
    t = min(max(t, 0.0), 1.0)
    return (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2 <= eps * eps


def locate_point(x: float, y: float, poly: Polygon, eps: float = EPS) -> str:
    """-> 'I' (interior), 'B' (boundary) or 'E' (exterior)."""
    for ring in poly.rings:
        for i in range(len(ring) - 1):
            if _on_segment(x, y, ring[i, 0], ring[i, 1], ring[i + 1, 0], ring[i + 1, 1], eps):
                return "B"
    inside = False
    for ring in poly.rings:
        a = ring[:-1]
        b = ring[1:]
        cond = (a[:, 1] > y) != (b[:, 1] > y)
        if cond.any():
            denom = b[cond, 1] - a[cond, 1]
            t = (y - a[cond, 1]) / denom
            cx = a[cond, 0] + t * (b[cond, 0] - a[cond, 0])
            inside ^= bool(np.count_nonzero(x < cx) & 1)
    return "I" if inside else "E"


def _seg_params(p, q, poly: Polygon, eps: float = EPS) -> list[float]:
    """Parameters t in (0,1) where segment p->q meets the polygon boundary
    (crossings, touches, and collinear-overlap endpoints)."""
    px, py = p
    qx, qy = q
    rx, ry = qx - px, qy - py
    ts: list[float] = []
    for ring in poly.rings:
        for i in range(len(ring) - 1):
            ax, ay = ring[i]
            bx, by = ring[i + 1]
            sx, sy = bx - ax, by - ay
            denom = rx * sy - ry * sx
            wx, wy = ax - px, ay - py
            if abs(denom) > eps:
                t = (wx * sy - wy * sx) / denom
                u = (wx * ry - wy * rx) / denom
                if -eps <= t <= 1 + eps and -eps <= u <= 1 + eps:
                    ts.append(min(max(t, 0.0), 1.0))
            elif abs(wx * ry - wy * rx) <= eps * max(1.0, abs(rx) + abs(ry)):
                # collinear: project edge endpoints onto the segment
                L2 = rx * rx + ry * ry
                if L2 > 0:
                    t0 = (wx * rx + wy * ry) / L2
                    t1 = ((bx - px) * rx + (by - py) * ry) / L2
                    for t in (t0, t1):
                        if -eps <= t <= 1 + eps:
                            ts.append(min(max(t, 0.0), 1.0))
    return sorted(ts)


def _classify_path(poly: Polygon, coords: np.ndarray, eps: float = EPS) -> set[str]:
    """Locations ('I'/'B'/'E') of the 1-D pieces of a path against ``poly``.

    Each segment is split at every boundary intersection; each sub-segment's
    midpoint is located.  Degenerate (zero-length) pieces are skipped.
    """
    locs: set[str] = set()
    for i in range(len(coords) - 1):
        p, q = coords[i], coords[i + 1]
        if p[0] == q[0] and p[1] == q[1]:
            continue
        ts = [0.0, *_seg_params(tuple(p), tuple(q), poly, eps), 1.0]
        for t0, t1 in zip(ts, ts[1:]):
            if t1 - t0 <= eps:
                continue
            tm = 0.5 * (t0 + t1)
            mx, my = p[0] + tm * (q[0] - p[0]), p[1] + tm * (q[1] - p[1])
            locs.add(locate_point(mx, my, poly, eps))
    return locs


def _rep_point(poly: Polygon, eps: float = EPS) -> tuple[float, float]:
    """Point-on-surface: midpoint of the first interior span of a horizontal
    scanline through the bbox middle (nudged off vertices)."""
    ys = np.concatenate([r[:, 1] for r in poly.rings])
    y = 0.5 * (ys.min() + ys.max())
    for attempt in range(8):
        if not np.any(np.abs(ys - y) <= eps):
            xs = []
            for ring in poly.rings:
                a, b = ring[:-1], ring[1:]
                cond = (a[:, 1] > y) != (b[:, 1] > y)
                if cond.any():
                    t = (y - a[cond, 1]) / (b[cond, 1] - a[cond, 1])
                    xs.extend(a[cond, 0] + t * (b[cond, 0] - a[cond, 0]))
            xs = sorted(xs)
            if len(xs) >= 2:
                return (0.5 * (xs[0] + xs[1]), y)
        y += (ys.max() - ys.min() or 1.0) * (1e-3 * (attempt + 1))
    # fallback: first vertex (degenerate polygon)
    return (float(poly.shell[0, 0]), float(poly.shell[0, 1]))


def _poly_rings_path(poly: Polygon) -> list[np.ndarray]:
    return poly.rings


def relate(query: Polygon, data: Geometry, eps: float = EPS) -> dict:
    """Topology flags of (query polygon, data geometry):
    ii — interiors intersect; contact — closures intersect;
    d_ext — part of data in query's exterior;
    q_ext — part of query in data's exterior (2-D data only);
    eq — boundaries coincide both ways (2-D data only)."""
    if isinstance(data, Point):
        loc = locate_point(data.x, data.y, query, eps)
        return {
            "ii": loc == "I",
            "contact": loc != "E",
            "d_ext": loc == "E",
            "q_ext": True,
            "eq": False,
            "data_dim": 0,
        }
    if isinstance(data, LineString):
        locs = _classify_path(query, data.coords, eps)
        end_locs = {
            locate_point(data.coords[0, 0], data.coords[0, 1], query, eps),
            locate_point(data.coords[-1, 0], data.coords[-1, 1], query, eps),
        }
        return {
            "ii": "I" in locs,
            "contact": bool((locs | end_locs) & {"I", "B"}),
            "d_ext": "E" in locs,
            "q_ext": True,
            "eq": False,
            "data_dim": 1,
        }
    if isinstance(data, Polygon):
        d_locs: set[str] = set()
        for ring in data.rings:
            d_locs |= _classify_path(query, ring, eps)
        q_locs: set[str] = set()
        for ring in query.rings:
            q_locs |= _classify_path(data, ring, eps)
        rep_d = _rep_point(data, eps)
        rep_q = _rep_point(query, eps)
        rep_d_in_q = locate_point(rep_d[0], rep_d[1], query, eps) == "I"
        rep_q_in_d = locate_point(rep_q[0], rep_q[1], data, eps) == "I"
        ii = "I" in d_locs or "I" in q_locs or rep_d_in_q or rep_q_in_d
        d_ext = "E" in d_locs or "I" in q_locs
        q_ext = "E" in q_locs or "I" in d_locs
        contact = bool(d_locs & {"I", "B"}) or bool(q_locs & {"I", "B"}) or ii
        eq = d_locs == {"B"} and q_locs == {"B"}
        return {
            "ii": ii,
            "contact": contact,
            "d_ext": d_ext,
            "q_ext": q_ext,
            "eq": eq,
            "data_dim": 2,
        }
    if isinstance(data, MultiGeometry):
        flags = [relate(query, p, eps) for p in data.parts]
        return {
            "ii": any(f["ii"] for f in flags),
            "contact": any(f["contact"] for f in flags),
            "d_ext": any(f["d_ext"] for f in flags),
            "q_ext": all(f["q_ext"] for f in flags),
            "eq": False,
            "data_dim": max(f["data_dim"] for f in flags),
        }
    raise TypeError(type(data))


# ----------------------------------------------------------------- operations
def _intersects(f):
    return f["contact"]


def _disjoint(f):
    return not f["contact"]


def _contains(f):
    # query contains data: nothing of data outside query, interiors meet
    return (not f["d_ext"]) and f["ii"]


def _within(f):
    # query within data
    if f["data_dim"] < 2:
        return False
    return (not f["q_ext"]) and f["ii"]


def _touches(f):
    return f["contact"] and not f["ii"]


def _crosses(f):
    # polygon query vs lower-dim data: interiors meet and data exits
    if f["data_dim"] == 1:
        return f["ii"] and f["d_ext"]
    if f["data_dim"] == 0:
        return False
    return False  # area/area cross impossible


def _overlaps(f):
    if f["data_dim"] != 2:
        return False
    return f["ii"] and f["d_ext"] and f["q_ext"]


def _equals(f):
    return f["eq"]


COMPARE_OPS = {
    "CONTAINS": _contains,
    "OVERLAPS": _overlaps,
    "INTERSECTS": _intersects,
    "EQUALS": _equals,
    "DISJOINT": _disjoint,
    "CROSSES": _crosses,
    "WITHIN": _within,
    "TOUCHES": _touches,
}


def evaluate(op: str, query: Polygon, data: Geometry, eps: float = EPS) -> bool:
    return COMPARE_OPS[op](relate(query, data, eps))

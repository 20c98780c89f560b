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
    "locate_points",
    "relate",
    "de9im",
    "relate_pattern",
    "matches_pattern",
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


def locate_points(
    xs: np.ndarray, ys: np.ndarray, poly: Polygon, eps: float = EPS
) -> np.ndarray:
    """Vectorized 3-way point location: 0 = interior, 1 = boundary,
    2 = exterior.  Boundary (distance-to-edge <= eps) takes priority over
    the even-odd cast, so edge points classify deterministically — the
    hot-path companion of the scalar ``locate_point`` for the RELATE
    pattern mask."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    inside = np.zeros(xs.shape, dtype=bool)
    on_edge = np.zeros(xs.shape, dtype=bool)
    for ring in poly.rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        for i in range(len(x0)):
            ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
            cond = (ay > ys) != (by > ys)
            if cond.any():
                t = (ys - ay) / (by - ay + ((by == ay) * 1e-300))
                inside ^= cond & (xs < ax + t * (bx - ax))
            dx, dy = bx - ax, by - ay
            L2 = dx * dx + dy * dy
            if L2 == 0:
                d2 = (xs - ax) ** 2 + (ys - ay) ** 2
            else:
                t = np.clip(((xs - ax) * dx + (ys - ay) * dy) / L2, 0.0, 1.0)
                d2 = (xs - (ax + t * dx)) ** 2 + (ys - (ay + t * dy)) ** 2
            on_edge |= d2 <= eps * eps
    out = np.full(xs.shape, 2, dtype=np.int8)
    out[inside] = 0
    out[on_edge] = 1
    return out


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


# --------------------------------------------------------------- full DE-9IM
def _point_on_path(x: float, y: float, coords: np.ndarray, eps: float = EPS) -> bool:
    for i in range(len(coords) - 1):
        if _on_segment(x, y, coords[i, 0], coords[i, 1], coords[i + 1, 0], coords[i + 1, 1], eps):
            return True
    return False


def _covers_boundary(query: Polygon, coords: np.ndarray, eps: float = EPS) -> bool:
    """True when the path covers every ring of ``query`` (checked at every
    ring vertex and edge midpoint — exact for piecewise-linear inputs whose
    edge subdivisions land on shared vertices; the rare partially-covered
    single edge is treated as covered)."""
    for ring in query.rings:
        for i in range(len(ring) - 1):
            ax, ay = ring[i]
            bx, by = ring[i + 1]
            for px, py in ((ax, ay), (0.5 * (ax + bx), 0.5 * (ay + by))):
                if not _point_on_path(px, py, coords, eps):
                    return False
    return True


def _boundary_point_contact(query: Polygon, coords: np.ndarray, eps: float = EPS) -> bool:
    """True when the path shares at least one point with query's boundary."""
    for i in range(len(coords) - 1):
        if _seg_params(tuple(coords[i]), tuple(coords[i + 1]), query, eps):
            return True
    for v in coords:
        if locate_point(float(v[0]), float(v[1]), query, eps) == "B":
            return True
    return False


def de9im(query: Polygon, data: Geometry, eps: float = EPS) -> str:
    """Full DE-9IM intersection matrix of (query, data) as a 9-char string
    (rows = query Interior/Boundary/Exterior, cols = data I/B/E, row-major;
    entries 'F'/'0'/'1'/'2' — the dimension of each intersection).

    Semantics anchor: JTS RelateOp / IntersectionMatrix as surfaced by the
    reference's ECQL filter support (GeoTools ``relatePattern``; the 8
    named ops in COMPARE_OPS are the fixed patterns, this is the generic
    escape hatch).  Boundary rule: mod-2 (a closed LineString has an empty
    boundary).  For MultiGeometry data the matrix is combined entrywise
    over parts — exact on the I/B columns (intersection distributes over
    unions); the data-EXTERIOR column takes the min over parts, which is
    exact unless parts jointly cover a region none covers alone.
    """
    F = "F"
    m = [[F] * 3 for _ in range(3)]
    m[2][2] = "2"  # exteriors always meet for bounded geometries

    if isinstance(data, Point):
        loc = locate_point(data.x, data.y, query, eps)
        m[0][2], m[1][2] = "2", "1"  # a point can't cover a 2-D/1-D set
        m[{"I": 0, "B": 1, "E": 2}[loc]][0] = "0"
        return "".join(m[0] + m[1] + m[2])

    if isinstance(data, LineString):
        coords = data.coords
        closed = bool(coords[0, 0] == coords[-1, 0] and coords[0, 1] == coords[-1, 1])
        portions = _classify_path(query, coords, eps)
        # contacts of the LINE INTERIOR with query's boundary (exclude the
        # open line's endpoints; every point of a closed line is interior)
        interior_contact = False
        n_seg = len(coords) - 1
        for i in range(n_seg):
            for t in _seg_params(tuple(coords[i]), tuple(coords[i + 1]), query, eps):
                at_start = i == 0 and t <= eps
                at_end = i == n_seg - 1 and t >= 1 - eps
                if closed or not (at_start or at_end):
                    interior_contact = True
        inner = coords if closed else coords[1:-1]
        if not interior_contact:
            for v in inner:
                if locate_point(float(v[0]), float(v[1]), query, eps) == "B":
                    interior_contact = True
                    break
        end_locs = (
            set()
            if closed
            else {
                locate_point(float(coords[0, 0]), float(coords[0, 1]), query, eps),
                locate_point(float(coords[-1, 0]), float(coords[-1, 1]), query, eps),
            }
        )
        m[0][0] = "1" if "I" in portions else F
        m[0][1] = "0" if "I" in end_locs else F
        m[0][2] = "2"  # a 1-D line never covers the 2-D interior
        m[1][0] = "1" if "B" in portions else ("0" if interior_contact else F)
        m[1][1] = "0" if "B" in end_locs else F
        m[1][2] = F if _covers_boundary(query, coords, eps) else "1"
        m[2][0] = "1" if "E" in portions else F
        m[2][1] = "0" if "E" in end_locs else F
        return "".join(m[0] + m[1] + m[2])

    if isinstance(data, Polygon):
        d_port: set[str] = set()
        for ring in data.rings:
            d_port |= _classify_path(query, ring, eps)
        q_port: set[str] = set()
        for ring in query.rings:
            q_port |= _classify_path(data, ring, eps)
        rep_d = _rep_point(data, eps)
        rep_q = _rep_point(query, eps)
        ii = (
            "I" in d_port
            or "I" in q_port
            or locate_point(rep_d[0], rep_d[1], query, eps) == "I"
            or locate_point(rep_q[0], rep_q[1], data, eps) == "I"
        )
        bb_seg = "B" in d_port or "B" in q_port
        bb_contact = bb_seg or any(
            _boundary_point_contact(query, ring, eps) for ring in data.rings
        )
        m[0][0] = "2" if ii else F
        m[0][1] = "1" if "I" in d_port else F
        m[0][2] = "2" if ("E" in q_port or "I" in d_port) else F
        m[1][0] = "1" if "I" in q_port else F
        m[1][1] = "1" if bb_seg else ("0" if bb_contact else F)
        m[1][2] = "1" if "E" in q_port else F
        m[2][0] = "2" if ("E" in d_port or "I" in q_port) else F
        m[2][1] = "1" if "E" in d_port else F
        return "".join(m[0] + m[1] + m[2])

    if isinstance(data, MultiGeometry):
        mats = [de9im(query, p, eps) for p in data.parts]
        out = []
        for k in range(9):
            vals = [mm[k] for mm in mats]
            if k % 3 == 2:  # data-exterior column: min over parts
                pick = min(vals, key=lambda c: -1 if c == "F" else int(c))
            else:  # I/B columns: unions distribute -> max
                pick = max(vals, key=lambda c: -1 if c == "F" else int(c))
            out.append(pick)
        return "".join(out)

    raise TypeError(type(data))


def matches_pattern(matrix: str, pattern: str) -> bool:
    """DE-9IM pattern test: 'T' = any intersection (dim >= 0), 'F' = empty,
    '0'/'1'/'2' = exact dimension, '*' = don't care."""
    if len(pattern) != 9:
        raise ValueError(f"DE-9IM pattern must be 9 chars, got {pattern!r}")
    pattern = pattern.upper()
    bad = set(pattern) - set("*TF012")
    if bad:
        raise ValueError(f"bad DE-9IM pattern char(s) {sorted(bad)!r}")
    for mc, p in zip(matrix, pattern):
        if p == "*":
            continue
        if p == "T":
            if mc == "F":
                return False
        elif p == "F":
            if mc != "F":
                return False
        elif mc != p:  # '0'/'1'/'2': exact dimension
            return False
    return True


def relate_pattern(query: Polygon, data: Geometry, pattern: str, eps: float = EPS) -> bool:
    """JTS ``relate(a, b, pattern)`` — the generic DE-9IM escape hatch.
    Orientation matches the repo-wide CompareOperation convention (matrix
    rows = the QUERY geometry, cols = the data geometry)."""
    return matches_pattern(de9im(query, data, eps), pattern)


def pattern_implies_intersection(pattern: str) -> bool:
    """True when the pattern can only match geometries whose closures
    intersect — i.e. it REQUIRES a non-empty entry among the four
    closure∩closure cells (II, IB, BI, BB).  Sound bbox-prune gate: such a
    pattern can never match a bbox-disjoint pair, so the coarse envelope
    filter may run first.  Patterns without such a requirement (e.g. the
    disjoint pattern ``FF*FF****``) must scan every row."""
    if len(pattern) != 9:
        raise ValueError(f"DE-9IM pattern must be 9 chars, got {pattern!r}")
    return any(pattern.upper()[k] in "T012" for k in (0, 1, 3, 4))


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
    if op.startswith("RELATE"):
        return relate_pattern(query, data, op.split(None, 1)[1].strip("'\" "), eps)
    return COMPARE_OPS[op](relate(query, data, eps))

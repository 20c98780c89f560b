"""CQL (ECQL subset) string filter parser.

Reference surface: OptimalCQLQuery.createOptimalQuery
(core/geotime/.../store/query/cql/OptimalCQLQuery.java:42-102) compiles a
CQL string into (a) an index-usable geometry/time constraint — extracted by
ExtractGeometryFilterVisitor / ExtractTimeFilterVisitor — and (b) a fine
row filter.  This parser produces the same split over the engine's
expression trees: ``parse_cql`` returns a CqlQuery carrying the vectorized
filter Expr, the extracted planner bbox (a SpatialQuery when present), and
the extracted time range.

Grammar (recursive descent, OR < AND < NOT precedence, parentheses):

  comparison:  attr {=, <>, <, <=, >, >=} literal
  BETWEEN:     attr BETWEEN a AND b
  IN:          attr IN (v, v, ...)
  LIKE:        attr LIKE 'pat%'   (% and _ wildcards)
  NULL:        attr IS [NOT] NULL
  spatial:     BBOX(geom, minx, miny, maxx, maxy)
               INTERSECTS|DISJOINT|WITHIN|CONTAINS|TOUCHES|CROSSES|
               OVERLAPS|EQUALS(geom, 'POLYGON((x y, ...))')
               DWITHIN(geom, 'POINT(x y)', dist, 'degrees'|'meters')
  temporal:    attr BEFORE ts | attr AFTER ts
               attr DURING t1/t2        (ISO-8601 instants)

``geom`` is the geometry attribute name; at apply() time point datasets
map it to (lon_col, lat_col) and WKB datasets refine via
planner.apply_wkb_query.  bbox extraction: AND intersects boxes, OR unions
them, NOT discards the bound (conservative, like the visitor).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..geom.wkb import Polygon, box_polygon
from .expressions import Expr, _Col, _Unary, apply_filter, col, lit
from .gwql import _Parser, _tokens
from .planner import SpatialQuery, point_predicate_mask

__all__ = ["parse_cql", "CqlQuery"]

_EARTH_RADIUS_M = 6371000.0
_DEG_M = 111320.0  # meters per degree of latitude (and of longitude at lat 0)

_SPATIAL_OPS = {
    "INTERSECTS",
    "DISJOINT",
    "WITHIN",
    "CONTAINS",
    "TOUCHES",
    "CROSSES",
    "OVERLAPS",
    "EQUALS",
}


@dataclass(eq=False)
class _TimeCmp(Expr):
    name: str
    op: str  # "<", ">", "between"
    lo_us: int
    hi_us: int | None = None

    def evaluate(self, batch):
        import pyarrow.compute as pc

        t = batch.column(self.name).cast(pa.int64())
        if self.op == "<":
            return pc.less(t, self.lo_us)
        if self.op == ">":
            return pc.greater(t, self.lo_us)
        return pc.and_(pc.greater_equal(t, self.lo_us), pc.less_equal(t, self.hi_us))


def _iso_us(s: str) -> int:
    return int(np.datetime64(s).astype("datetime64[us]").astype(np.int64))


def _parse_wkt(wkt: str):
    m = re.match(r"\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", wkt, re.IGNORECASE)
    if m:
        coords = np.array(
            [[float(x) for x in pair.split()] for pair in m.group(1).split(",")],
            dtype=np.float64,
        )
        return Polygon(coords)
    m = re.match(r"\s*POINT\s*\(\s*([-\d.eE]+)\s+([-\d.eE]+)\s*\)\s*$", wkt, re.IGNORECASE)
    if m:
        return (float(m.group(1)), float(m.group(2)))
    raise ValueError(f"unsupported WKT {wkt!r}")


@dataclass
class _DWithin:
    """DWITHIN(geom, POINT, dist, units): bbox prune + TRUE distance refine.

    The ECQL predicate is a distance circle, not a box
    (FilterToCQLTool / DWithinImpl); earlier versions returned the bbox
    superset.  ``degrees`` units use planar degree distance; ``meters``
    use great-circle (haversine) distance, with the coarse lon half-width
    scaled by 1/cos(lat) so the box still covers the circle away from the
    equator."""

    x: float
    y: float
    dist: float  # in `units`
    units: str  # "degrees" | "meters"
    op: str = "DWITHIN"

    def bbox(self) -> tuple[float, float, float, float]:
        if self.units == "degrees":
            dlon = dlat = self.dist
        else:
            dlat = self.dist / _DEG_M
            c = np.cos(np.radians(self.y))
            dlon = 360.0 if c <= 1e-9 else self.dist / (_DEG_M * c)
        return (self.x - dlon, self.y - dlat, self.x + dlon, self.y + dlat)

    def mask(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        if self.units == "degrees":
            return (lon - self.x) ** 2 + (lat - self.y) ** 2 <= self.dist**2
        lat1, lat2 = np.radians(self.y), np.radians(lat)
        dphi, dlmb = lat2 - lat1, np.radians(lon - self.x)
        a = np.sin(dphi / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlmb / 2.0) ** 2
        d = 2.0 * _EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
        return d <= self.dist

    def apply(self, ds, lon_col: str = "lon", lat_col: str = "lat"):
        q = self

        def refine(batch: pa.Table) -> pa.Table:
            lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
            lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
            minx, miny, maxx, maxy = q.bbox()
            m = (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
            m &= q.mask(lon, lat)
            return batch.filter(pa.array(m))

        refine.__name__ = "dwithin_refine"
        return ds.map_batches(refine, batch_format="pyarrow")


@dataclass(eq=False)
class _SpatialExpr(Expr):
    """A spatial predicate evaluated as a plain row filter — the scan
    fallback used when the constraint is not index-plannable (OR over
    spatial predicates), mirroring OptimalCQLQuery's full-scan path
    (core/geotime/.../cql/OptimalCQLQuery.java:42-102: when no single
    constraint extracts, the CQL filter runs over an unconstrained
    scan)."""

    query: object  # SpatialQuery | _DWithin
    lon_col: str = "lon"
    lat_col: str = "lat"

    def evaluate(self, batch):
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        if isinstance(self.query, _DWithin):
            mask = self.query.mask(lon, lat)
        else:
            mask = point_predicate_mask(lon, lat, self.query.geometry, self.query.op)
        return pa.array(mask)


def _bind_geom_cols(expr, lon_col: str, lat_col: str) -> None:
    """Point the _SpatialExpr leaves of a filter tree at the dataset's
    coordinate columns (geometry attribute resolution at apply time)."""
    if expr is None:
        return
    if isinstance(expr, _SpatialExpr):
        expr.lon_col, expr.lat_col = lon_col, lat_col
        return
    for attr in ("left", "right", "inner"):
        child = getattr(expr, attr, None)
        if isinstance(child, Expr):
            _bind_geom_cols(child, lon_col, lat_col)


def _terms_to_expr(expr, terms):
    """Fold spatial terms into the row-filter tree (scan fallback)."""
    for t in terms:
        leaf = _SpatialExpr(t.query)
        expr = expr & leaf if expr is not None else leaf
    return expr


@dataclass
class _SpatialTerm:
    """A spatial predicate leaf: carries its own SpatialQuery (or
    _DWithin distance query)."""

    geom_field: str
    query: object


@dataclass
class CqlQuery:
    expr: Expr | None  # attribute filter tree (non-spatial terms)
    spatial: SpatialQuery | None  # extracted index constraint
    time_range: tuple[int, int] | None  # us
    spatial_terms: list  # all _SpatialTerm leaves (for refinement)

    def apply(self, ds, lon_col: str = "lon", lat_col: str = "lat", time_col: str | None = None):
        """Point-dataset execution: coarse+fine spatial refine per term,
        then the attribute filter (OptimalCQLQuery -> filter chain).

        When the spatial constraint was NOT extractable (OR over spatial
        predicates), spatial_terms is empty and the spatial tests live in
        ``expr`` as _SpatialExpr row filters; any enclosing union-box in
        ``spatial`` is still applied as a coarse prune first."""
        for term in self.spatial_terms:
            ds = term.query.apply(ds, lon_col=lon_col, lat_col=lat_col)
        if not self.spatial_terms and self.spatial is not None:
            sq = self.spatial

            def coarse_union_box(batch: pa.Table) -> pa.Table:
                return sq.coarse_filter(batch, lon_col, lat_col)

            ds = ds.map_batches(coarse_union_box, batch_format="pyarrow")
        if self.time_range is not None and time_col is not None:
            tr = _TimeCmp(time_col, "between", self.time_range[0], self.time_range[1])
            ds = apply_filter(ds, tr)
        if self.expr is not None:
            _bind_geom_cols(self.expr, lon_col, lat_col)
            ds = apply_filter(ds, self.expr)
        return ds


def parse_cql(text: str) -> CqlQuery:
    p = _Parser(_tokens(text))
    expr, spatial_terms, boxes, time_range = _parse_or(p)
    if p.peek()[0] is not None:
        raise ValueError(f"trailing tokens at {p.peek()!r}")
    spatial = None
    if boxes:
        minx = min(b[0] for b in boxes)
        miny = min(b[1] for b in boxes)
        maxx = max(b[2] for b in boxes)
        maxy = max(b[3] for b in boxes)
        spatial = SpatialQuery(box_polygon(minx, miny, maxx, maxy))
    return CqlQuery(expr, spatial, time_range, spatial_terms)


def _merge_and(b1, b2):
    """AND of bbox lists: intersect the union-boxes pessimistically
    (single enclosing box per side, like the visitor's bbox algebra)."""
    if not b1:
        return b2
    if not b2:
        return b1
    e1 = (
        min(b[0] for b in b1),
        min(b[1] for b in b1),
        max(b[2] for b in b1),
        max(b[3] for b in b1),
    )
    e2 = (
        min(b[0] for b in b2),
        min(b[1] for b in b2),
        max(b[2] for b in b2),
        max(b[3] for b in b2),
    )
    out = (
        max(e1[0], e2[0]),
        max(e1[1], e2[1]),
        min(e1[2], e2[2]),
        min(e1[3], e2[3]),
    )
    return [out]


def _parse_or(p: _Parser):
    expr, terms, boxes, tr = _parse_and(p)
    while p.peek()[0] == "word" and p.peek()[1].upper() == "OR":
        p.next()
        e2, t2, b2, tr2 = _parse_and(p)
        if terms or t2:
            # OR over spatial predicates is not index-plannable: fall back
            # to scan + row filter (OptimalCQLQuery.java:42-102's no-single-
            # constraint path).  Each side's spatial terms fold into its
            # filter tree; the union box survives as a coarse prune only
            # when BOTH sides are spatially bounded.
            both_bounded = bool(boxes) and bool(b2)
            expr = _terms_to_expr(expr, terms)
            e2 = _terms_to_expr(e2, t2)
            terms = []
            boxes = boxes + b2 if both_bounded else []
        else:
            boxes = boxes + b2  # OR unions boxes
        expr = expr | e2 if expr is not None and e2 is not None else (expr or e2)
        tr = None if tr is None or tr2 is None else (min(tr[0], tr2[0]), max(tr[1], tr2[1]))
    return expr, terms, boxes, tr


def _parse_and(p: _Parser):
    expr, terms, boxes, tr = _parse_not(p)
    while p.peek()[0] == "word" and p.peek()[1].upper() == "AND":
        p.next()
        e2, t2, b2, tr2 = _parse_not(p)
        if expr is not None and e2 is not None:
            expr = expr & e2
        else:
            expr = expr or e2
        terms = terms + t2
        boxes = _merge_and(boxes, b2)
        if tr2 is not None:
            tr = tr2 if tr is None else (max(tr[0], tr2[0]), min(tr[1], tr2[1]))
    return expr, terms, boxes, tr


def _parse_not(p: _Parser):
    if p.peek()[0] == "word" and p.peek()[1].upper() == "NOT":
        p.next()
        expr, terms, boxes, tr = _parse_not(p)
        if terms:
            raise ValueError("NOT over spatial predicates unsupported; use DISJOINT")
        # NOT discards index bounds (conservative)
        return (~expr if expr is not None else None), [], [], None
    return _parse_primary(p)


def _parse_primary(p: _Parser):
    k, v = p.peek()
    if k == "op" and v == "(":
        p.next()
        out = _parse_or(p)
        p.expect_op(")")
        return out
    if k != "word":
        raise ValueError(f"unexpected token {v!r}")
    word = v.upper()
    if word == "BBOX":
        p.next()
        p.expect_op("(")
        geom = p.next()[1]
        vals = []
        while p.peek() != ("op", ")"):
            kk, vv = p.next()
            if (kk, vv) == ("op", ","):
                continue
            vals.append(float(vv))
        p.expect_op(")")
        minx, miny, maxx, maxy = vals[:4]
        q = SpatialQuery(box_polygon(minx, miny, maxx, maxy))
        return None, [_SpatialTerm(geom, q)], [(minx, miny, maxx, maxy)], None
    if word in _SPATIAL_OPS:
        p.next()
        p.expect_op("(")
        geom = p.next()[1]
        p.expect_op(",")
        wkt = p.next()[1]
        p.expect_op(")")
        g = _parse_wkt(wkt)
        if isinstance(g, tuple):
            raise ValueError(f"{word} needs a polygon operand")
        q = SpatialQuery(g, op=word)
        from ..geom.wkb import bbox_of

        boxes = [] if word == "DISJOINT" else [bbox_of(g)]
        return None, [_SpatialTerm(geom, q)], boxes, None
    if word == "RELATE":
        # RELATE(geom, 'POLYGON(...)', 'T*F**F***') — the generic DE-9IM
        # pattern predicate (GeoTools ECQL relatePattern; the 8 named ops
        # are its fixed patterns).  Patterns carry no usable bbox algebra
        # (e.g. disjoint-only patterns), so RELATE always takes the
        # full-scan row-filter path like DISJOINT does.
        p.next()
        p.expect_op("(")
        geom = p.next()[1]
        p.expect_op(",")
        wkt = p.next()[1]
        p.expect_op(",")
        pattern = p.next()[1].strip("'\"")
        p.expect_op(")")
        g = _parse_wkt(wkt)
        if isinstance(g, tuple):
            raise ValueError("RELATE needs a polygon operand")
        from ..geom.predicates import matches_pattern

        matches_pattern("FFFFFFFFF", pattern)  # validate eagerly
        q = SpatialQuery(g, op=f"RELATE {pattern}")
        return None, [_SpatialTerm(geom, q)], [], None
    if word == "DWITHIN":
        p.next()
        p.expect_op("(")
        geom = p.next()[1]
        p.expect_op(",")
        wkt = p.next()[1]
        p.expect_op(",")
        dist = float(p.next()[1])
        p.expect_op(",")
        units = p.next()[1].lower()
        p.expect_op(")")
        g = _parse_wkt(wkt)
        if not isinstance(g, tuple):
            raise ValueError("DWITHIN supports POINT operands")
        x, y = g
        q = _DWithin(x, y, dist, "meters" if units in ("meters", "m") else "degrees")
        return None, [_SpatialTerm(geom, q)], [q.bbox()], None

    # attribute / value-expression predicate: the LHS (and comparison RHS)
    # is a full ECQL value expression — attributes, literals, + - * /
    # arithmetic, and function calls — so attribute-to-attribute
    # comparisons ("a > b"), arithmetic predicates ("value * 2 > a + 1")
    # and functions ("abs(v) < 3", "strToLowerCase(s) = 'x'") all parse
    # (GeoTools ECQL accepts all three; OptimalCQLQuery.java:42-102).
    c = _parse_value(p)
    nk, nv = p.peek()
    if nk == "word":
        u = nv.upper()
        if u == "BETWEEN":
            p.next()
            lo = _parse_value(p)
            p.expect_word("AND")
            hi = _parse_value(p)
            return c.between(lo, hi), [], [], None
        if u == "IN":
            p.next()
            p.expect_op("(")
            vals = []
            while p.peek() != ("op", ")"):
                kk, vv = p.next()
                if (kk, vv) == ("op", ","):
                    continue
                vals.append(vv)
            p.expect_op(")")
            return c.isin(vals), [], [], None
        if u == "LIKE":
            p.next()
            pat = p.next()[1]
            return c.like(pat), [], [], None
        if u == "IS":
            p.next()
            neg = False
            if p.peek()[0] == "word" and p.peek()[1].upper() == "NOT":
                p.next()
                neg = True
            p.expect_word("NULL")
            e = c.is_null()
            return (~e if neg else e), [], [], None
        if u in ("BEFORE", "AFTER", "DURING"):
            if not isinstance(c, _Col):
                raise ValueError(f"{u} needs a plain timestamp attribute")
            name = c.name
            if u in ("BEFORE", "AFTER"):
                p.next()
                ts = _iso_us(str(p.next()[1]))
                e = _TimeCmp(name, "<" if u == "BEFORE" else ">", ts)
                return e, [], [], None
            p.next()
            span = str(p.next()[1])
            lo_s, hi_s = span.split("/")
            lo, hi = _iso_us(lo_s), _iso_us(hi_s)
            return _TimeCmp(name, "between", lo, hi), [], [], (lo, hi)
        raise ValueError(f"unsupported predicate keyword {nv!r}")
    kk, op = p.next()
    if kk != "op":
        raise ValueError(f"expected comparison operator, got {op!r}")
    val = _parse_value(p)
    term = {
        "=": c == val,
        "<>": c != val,
        "<": c < val,
        "<=": c <= val,
        ">": c > val,
        ">=": c >= val,
    }[op]
    return term, [], [], None


# ------------------------------------------------------- value expressions
# ECQL value-expression grammar (addsub < muldiv < unary/primary):
#   value   := vmul (('+'|'-') vmul)*
#   vmul    := vprim (('*'|'/') vprim)*
#   vprim   := number | 'string' | attr | func '(' value [',' value]* ')'
#            | '(' value ')' | '-' vprim
# Function names map to pyarrow.compute kernels (GeoTools filter-function
# names accepted case-insensitively).
_CQL_FUNCS = {
    "abs": "abs",
    "ceil": "ceil",
    "floor": "floor",
    "sqrt": "sqrt",
    "strtolowercase": "utf8_lower",
    "strtouppercase": "utf8_upper",
    "strtrim": "utf8_trim_whitespace",
    "strlength": "utf8_length",
    "length": "utf8_length",
}


def _parse_value(p: _Parser) -> Expr:
    e = _parse_vmul(p)
    while p.peek()[0] == "op" and p.peek()[1] in ("+", "-"):
        op = p.next()[1]
        r = _parse_vmul(p)
        e = e + r if op == "+" else e - r
    return e


def _parse_vmul(p: _Parser) -> Expr:
    e = _parse_vprim(p)
    while p.peek()[0] == "op" and p.peek()[1] in ("*", "/"):
        op = p.next()[1]
        r = _parse_vprim(p)
        e = e * r if op == "*" else e / r
    return e


def _parse_vprim(p: _Parser) -> Expr:
    k, v = p.next()
    if k == "num" or k == "str":
        return _parse_cast_suffix(p, lit(v))
    if k == "op" and v == "(":
        e = _parse_value(p)
        p.expect_op(")")
        return _parse_cast_suffix(p, e)
    if k == "op" and v == "-":
        return lit(0.0) - _parse_vprim(p)
    if k != "word":
        raise ValueError(f"unexpected token {v!r} in value expression")
    if p.peek() == ("op", "("):
        fn = _CQL_FUNCS.get(v.lower())
        if fn is None:
            raise ValueError(f"unsupported CQL function {v!r}")
        p.next()
        arg = _parse_value(p)
        p.expect_op(")")
        return _parse_cast_suffix(p, _Unary(fn, arg))
    return _parse_cast_suffix(p, col(v))


def _parse_cast_suffix(p: _Parser, e: Expr) -> Expr:
    """GWQL ``expr::type`` casts — registered types are ``text`` and
    ``number`` (GWQLCoreExtensions.java:62-64); an unregistered name
    raises the reference's message (GWQLParseHelper.java:336-341)."""
    from .expressions import _Cast

    while p.peek() == ("op", "::"):
        p.next()
        t = str(p.next()[1]).lower()
        if t not in ("text", "number"):
            raise ValueError(f"Type '{t}' is undefined")
        e = _Cast(e, t)
    return e

"""GWQL-lite: a thin string query façade.

Subset of the reference's GWQL grammar
(``core/store/src/main/antlr4/.../GWQL.g4:49-105``):

    SELECT <agg(col) | scalar_fn | col, ... | *> FROM <table>
        [WHERE <predicates>] [LIMIT n]
    DELETE FROM <table> [WHERE <predicates>]

- aggregations: COUNT(*), COUNT(col), SUM(col), MIN(col), MAX(col)
- scalar functions: ABS(col), CONCAT(a, b, ...)  (GWQL.g4:49-105
  functions surface); DELETE returns the RETAINED rows (the caller
  persists them — the engine's stores are immutable parquet layouts)
- predicates: col <op> literal (op in =, <>, <, <=, >, >=),
  col BETWEEN a AND b, AND-combinations,
  BBOX(lon_col, lat_col, minx, miny, maxx, maxy),
  INTERSECTS(lon_col, lat_col, 'POLYGON WKT-lite ((x y, x y, ...))'),
  strStartsWith/strEndsWith/strContains(col, 'lit'[, ignoreCase])
  (TextPredicates.java)
- the primary API remains the Python builders; this façade exists for
  parity with the reference's string query surface.

Hand-rolled recursive-descent tokenizer — no parser deps in this container.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..geom.wkb import Polygon, box_polygon
from .expressions import Expr, col, lit
from .planner import SpatialQuery

__all__ = ["parse_gwql", "run_gwql"]

_TOKEN = re.compile(
    # + - / are CQL arithmetic operators (query/cql.py value expressions);
    # num still binds a tight leading minus ("-5"), so a subtraction needs
    # whitespace ("a - 5") — GeoTools ECQL tokenizes the same way
    r"\s*(?:(?P<num>-?\d+(?:\.\d+)?)|(?P<str>'[^']*')|(?P<op>::|<>|<=|>=|=|<|>|\(|\)|,|\*|\+|-|/)|(?P<word>[A-Za-z_][A-Za-z_0-9.]*))"
)


def _tokens(s: str):
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip():
                raise ValueError(f"bad token at {s[pos:pos+20]!r}")
            break
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", float(m.group("num"))))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1]))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            out.append(("word", m.group("word")))
    return out


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_word(self, w):
        k, v = self.next()
        if k != "word" or v.upper() != w:
            raise ValueError(f"expected {w}, got {v}")
        return v

    def expect_op(self, o):
        k, v = self.next()
        if k != "op" or v != o:
            raise ValueError(f"expected {o}, got {v}")


def parse_gwql(query: str) -> dict:
    p = _Parser(_tokens(query))
    if p.peek()[0] == "word" and p.peek()[1].upper() == "DELETE":
        p.next()
        p.expect_word("FROM")
        table = p.next()[1]
        where = spatial = None
        if p.peek()[0] == "word" and p.peek()[1].upper() == "WHERE":
            p.next()
            where, spatial = _parse_predicates(p)
        return {
            "delete": True,
            "select": [],
            "table": table,
            "where": where,
            "spatial": spatial,
            "limit": None,
        }
    p.expect_word("SELECT")
    select: list = []
    while True:
        k, v = p.next()
        if k == "op" and v == "*":
            select.append(("*", None, "*"))
        elif k == "word":
            name = v
            if p.peek() == ("op", "("):
                p.next()
                args = []
                while p.peek() != ("op", ")"):
                    k2, v2 = p.next()
                    if (k2, v2) == ("op", ","):
                        continue
                    args.append("*" if (k2 == "op" and v2 == "*") else v2)
                p.expect_op(")")
                arg = args[0] if args else "*"
                alias = f"{name.lower()}_{arg if arg != '*' else 'all'}"
                if (
                    p.peek()[0] == "word" and p.peek()[1].upper() == "AS"
                ):
                    p.next()
                    alias = p.next()[1]
                if name.upper() in ("ABS", "CONCAT", "BBOX", "TRANGE"):
                    select.append((name.upper(), args, alias))
                else:
                    select.append((name.upper(), arg, alias))
            else:
                alias = name
                if p.peek()[0] == "word" and p.peek()[1].upper() == "AS":
                    p.next()
                    alias = p.next()[1]
                select.append(("COL", name, alias))
        else:
            raise ValueError(f"bad select item {v}")
        if p.peek() == ("op", ","):
            p.next()
            continue
        break
    p.expect_word("FROM")
    table = p.next()[1]
    where: Expr | None = None
    spatial: SpatialQuery | None = None
    limit = None
    while p.peek()[0] is not None:
        k, v = p.next()
        if k == "word" and v.upper() == "WHERE":
            where, spatial = _parse_predicates(p)
        elif k == "word" and v.upper() == "LIMIT":
            limit = int(p.next()[1])
        else:
            raise ValueError(f"unexpected {v}")
    return {
        "select": select,
        "table": table,
        "where": where,
        "spatial": spatial,
        "limit": limit,
    }


_GWQL_SPATIAL_OPS = (
    "INTERSECTS",
    "DISJOINT",
    "WITHIN",
    "CONTAINS",
    "TOUCHES",
    "CROSSES",
    "OVERLAPS",
    "EQUALS",
)
_GWQL_SPATIAL_LOOSE = {
    "INTERSECTSLOOSE": "INTERSECTS",
    "DISJOINTLOOSE": "DISJOINT",
}


def _parse_predicates(p: _Parser):
    """OR of AND-groups.  A single spatial constraint extracts to the
    planner (index-usable); OR over spatial predicates falls back to
    row-filter evaluation (the CQL parser's scan-fallback rule)."""
    expr, spatial = _parse_pred_and(p)
    while p.peek()[0] == "word" and p.peek()[1].upper() == "OR":
        p.next()
        e2, s2 = _parse_pred_and(p)
        if spatial is not None or s2 is not None:
            from .cql import _SpatialExpr

            if spatial is not None:
                leaf = _SpatialExpr(spatial)
                expr = expr & leaf if expr is not None else leaf
                spatial = None
            if s2 is not None:
                leaf = _SpatialExpr(s2)
                e2 = e2 & leaf if e2 is not None else leaf
        expr = expr | e2 if expr is not None and e2 is not None else (expr or e2)
    return expr, spatial


def _parse_pred_and(p: _Parser):
    expr: Expr | None = None
    spatial: SpatialQuery | None = None
    while True:
        k, v = p.peek()
        if k == "op" and v == "(":
            # parenthesized predicate group: spatial constraints inside a
            # group become row filters (only a TOP-LEVEL spatial term
            # extracts to the planner)
            p.next()
            e2, s2 = _parse_predicates(p)
            p.expect_op(")")
            if s2 is not None:
                from .cql import _SpatialExpr

                leaf = _SpatialExpr(s2)
                e2 = e2 & leaf if e2 is not None else leaf
            term = e2
        elif k == "word" and v.upper() in ("BBOX", "BBOXLOOSE"):
            # bboxLoose compares envelopes only — identical to bbox for the
            # engine's point datasets (GWQLSpatialTemporalExtensions loose
            # predicate variants)
            p.next()
            p.expect_op("(")
            args = []
            while p.peek() != ("op", ")"):
                kk, vv = p.next()
                if (kk, vv) == ("op", ","):
                    continue
                args.append(vv)
            p.expect_op(")")
            lon_c, lat_c = args[0], args[1]
            minx, miny, maxx, maxy = (float(a) for a in args[2:6])
            spatial = SpatialQuery(box_polygon(minx, miny, maxx, maxy))
            term = (
                (col(lon_c) >= minx)
                & (col(lon_c) <= maxx)
                & (col(lat_c) >= miny)
                & (col(lat_c) <= maxy)
            )
        elif k == "word" and (
            v.upper() in _GWQL_SPATIAL_OPS or v.upper() in _GWQL_SPATIAL_LOOSE
        ):
            # spatial predicate functions (GWQLSpatialTemporalExtensions:
            # intersects/disjoint/within/contains/touches/crosses/overlaps/
            # equals + the Loose envelope-only variants)
            u = v.upper()
            p.next()
            p.expect_op("(")
            lon_c = p.next()[1]
            p.expect_op(",")
            lat_c = p.next()[1]
            p.expect_op(",")
            wkt = p.next()[1]
            p.expect_op(")")
            poly = _parse_wkt_polygon(wkt)
            if u in _GWQL_SPATIAL_LOOSE:
                from ..geom.wkb import bbox_of

                u = _GWQL_SPATIAL_LOOSE[u]
                poly = box_polygon(*bbox_of(poly))
            if u == "INTERSECTS":
                spatial = SpatialQuery(poly)
                term = None  # fine refinement handled by spatial query
            else:
                # non-intersects ops run as row filters (the CQL scan
                # fallback machinery; DISJOINT must not prune by bbox)
                from .cql import _SpatialExpr

                term = _SpatialExpr(SpatialQuery(poly, op=u))
        elif k == "word" and v.upper() in ("TCONTAINS", "TOVERLAPS"):
            # temporal predicate functions (geotime GWQLParserTest.java
            # testTemporalPredicateFunctions): the literal is an instant or
            # 'lo/hi' range.  For the engine's instant-valued time fields,
            # toverlaps == the instant falls in the literal range, and
            # tcontains (field range contains literal range) is equality
            # for instant literals and constant-false for true ranges — an
            # instant cannot contain a range (expressed as an inverted
            # between so the filter stays vectorized).
            u = v.upper()
            p.next()
            p.expect_op("(")
            field = p.next()[1]
            p.expect_op(",")
            span = str(p.next()[1])
            p.expect_op(")")
            from .cql import _TimeCmp, _iso_us

            if "/" in span:
                lo, hi = (_iso_us(s) for s in span.split("/"))
            else:
                lo = hi = _iso_us(span)
            if u == "TOVERLAPS" or lo == hi:
                term = _TimeCmp(field, "between", lo, hi)
            else:
                term = _TimeCmp(field, "between", hi, lo)  # empty interval
        elif k == "word" and v.upper() in ("STRSTARTSWITH", "STRENDSWITH", "STRCONTAINS"):
            # text predicate functions (TextPredicates.java:50-81 —
            # strStartsWith/strEndsWith/strContains(field, 'lit'[, ignoreCase]))
            fname = v.upper()
            p.next()
            p.expect_op("(")
            field = p.next()[1]
            p.expect_op(",")
            litv = p.next()[1]
            ignore = False
            if p.peek() == ("op", ","):
                p.next()
                ignore = str(p.next()[1]).upper() == "TRUE"
            p.expect_op(")")
            c = col(field)
            term = {
                "STRSTARTSWITH": c.starts_with,
                "STRENDSWITH": c.ends_with,
                "STRCONTAINS": c.contains,
            }[fname](str(litv), ignore_case=ignore)
        else:
            from .cql import _CQL_FUNCS, _parse_value

            nxt = p.toks[p.i + 1] if p.i + 1 < len(p.toks) else (None, None)
            if k == "word" and nxt == ("op", "(") and v.lower() not in _CQL_FUNCS:
                # function-call syntax on an unregistered name: consume the
                # args, then classify by what follows (GWQLParserTest.java
                # testInvalidFilters contract)
                name = p.next()[1]
                p.next()
                depth = 1
                while depth:
                    kk, vv = p.next()
                    if kk is None:
                        break
                    if (kk, vv) == ("op", "("):
                        depth += 1
                    elif (kk, vv) == ("op", ")"):
                        depth -= 1
                if p.peek()[0] == "op" and p.peek()[1] in ("=", "<>", "<", "<=", ">", ">="):
                    raise ValueError(
                        f"No expression function was found with the name: {name}"
                    )
                raise ValueError(
                    f"No predicate function was found with the name: {name}"
                )
            # both comparison sides are full value expressions (shared ECQL
            # grammar: attributes, literals, + - * / arithmetic, expression
            # functions, ::text/::number casts) — attr-to-attr comparisons
            # and math predicates parse like the reference
            # (GWQLParserTest.java testMathExpression / testCasting)
            c = _parse_value(p)
            k2, op = p.peek()
            if k2 == "word" and op.upper() == "BETWEEN":
                p.next()
                lo = _parse_value(p)
                p.expect_word("AND")
                hi = _parse_value(p)
                term = c.between(lo, hi)
            elif k2 == "word" and op.upper() in ("BEFORE", "AFTER", "DURING"):
                # GWQLSpatialTemporalExtensions temporal predicate surface
                from .cql import _TimeCmp, _iso_us
                from .expressions import _Col

                if not isinstance(c, _Col):
                    raise ValueError(f"{op.upper()} needs a plain timestamp attribute")
                name = c.name
                u = op.upper()
                p.next()
                if u == "DURING":
                    span = str(p.next()[1])
                    lo_s, hi_s = span.split("/")
                    term = _TimeCmp(name, "between", _iso_us(lo_s), _iso_us(hi_s))
                else:
                    ts = _iso_us(str(p.next()[1]))
                    term = _TimeCmp(name, "<" if u == "BEFORE" else ">", ts)
            else:
                cmp_ops = ("=", "<>", "<", "<=", ">", ">=")
                k2, op = p.next()
                if not (k2 == "op" and op in cmp_ops):
                    raise ValueError(f"No '{op}' operator was found")
                val = _parse_value(p)
                term = {
                    "=": c == val,
                    "<>": c != val,
                    "<": c < val,
                    "<=": c <= val,
                    ">": c > val,
                    ">=": c >= val,
                }[op]
        if term is not None:
            expr = term if expr is None else (expr & term)
        if p.peek()[0] == "word" and p.peek()[1].upper() == "AND":
            p.next()
            continue
        break
    return expr, spatial


def _parse_wkt_polygon(wkt: str) -> Polygon:
    m = re.match(r"\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", wkt, re.IGNORECASE)
    if not m:
        raise ValueError(f"unsupported WKT {wkt!r}")
    coords = np.array(
        [[float(x) for x in pair.split()] for pair in m.group(1).split(",")],
        dtype=np.float64,
    )
    return Polygon(coords)


def run_gwql(query: str, tables: dict, lon_col="lon", lat_col="lat"):
    """Execute a GWQL-lite string over {table_name: ray Dataset}."""
    from .expressions import apply_filter

    plan = parse_gwql(query)
    ds = tables[plan["table"]]
    # field validation (GWQLParserTest.java: "Field X did not exist in the
    # specified type"): every column referenced by the statement must be in
    # the dataset schema.  CONCAT args are exempt (literals are legal there).
    fields = set(ds.schema().names)
    referenced: set = set()
    if plan["where"] is not None:
        from .expressions import collect_columns

        referenced |= collect_columns(plan["where"])
    for kind, arg, _alias in plan["select"]:
        if kind == "COL":
            referenced.add(arg)
        elif kind in ("SUM", "MIN", "MAX", "COUNT") and arg != "*":
            referenced.add(arg)
        elif kind in ("ABS", "BBOX", "TRANGE"):
            referenced |= {a for a in arg if isinstance(a, str)}
    for name in sorted(referenced):
        if name not in fields:
            raise ValueError(f"Field {name} did not exist in the specified type")
    if plan.get("delete"):
        # DELETE: keep the rows NOT matched by (spatial AND where)
        from ..geom.predicates import points_in_polygon

        spatial = plan["spatial"]
        where = plan["where"]

        def keep(batch: pa.Table) -> pa.Table:
            matched = np.ones(len(batch), dtype=bool)
            if spatial is not None:
                lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
                lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
                matched &= points_in_polygon(
                    lon, lat, spatial.geometry, include_boundary=True
                )
            if where is not None:
                m = where.evaluate(batch)
                matched &= np.asarray(m.to_pandas() if hasattr(m, "to_pandas") else m).astype(bool)
            return batch.filter(pa.array(~matched))

        keep.__name__ = "gwql_delete_keep"
        return ds.map_batches(keep, batch_format="pyarrow")
    if plan["spatial"] is not None:
        ds = plan["spatial"].apply(ds, lon_col=lon_col, lat_col=lat_col)
    if plan["where"] is not None:
        from .cql import _bind_geom_cols

        _bind_geom_cols(plan["where"], lon_col, lat_col)
        ds = apply_filter(ds, plan["where"])
    sel = plan["select"]
    scalars = [s for s in sel if s[0] in ("ABS", "CONCAT")]
    if scalars:
        import pyarrow.compute as pc

        plain = [s for s in sel if s[0] == "COL"]

        def project(batch: pa.Table) -> pa.Table:
            out = {alias: batch.column(cname) for _, cname, alias in plain}
            for kind, args, alias in scalars:
                if kind == "ABS":
                    out[alias] = pc.abs(batch.column(args[0]))
                else:  # CONCAT
                    parts = [
                        batch.column(a).cast(pa.string())
                        if a in batch.column_names
                        else pa.array([str(a)] * len(batch))
                        for a in args
                    ]
                    acc = parts[0]
                    for nxt in parts[1:]:
                        acc = pc.binary_join_element_wise(acc, nxt, "")
                    out[alias] = acc
            return pa.table(out)

        project.__name__ = "gwql_scalar_project"
        ds = ds.map_batches(project, batch_format="pyarrow")
        if plan["limit"] is not None:
            ds = ds.limit(plan["limit"])
        return ds
    aggs = [s for s in sel if s[0] in ("COUNT", "SUM", "MIN", "MAX", "BBOX", "TRANGE")]
    if aggs:
        # ONE aggregate pass for the whole select list (was one Dataset
        # execution per aggregate).  BBOX(lon, lat) is the envelope
        # aggregate (reference BBOX() aggregation function,
        # GWQL.g4 functions + SpatialSimpleFeatureAggregation); TRANGE(ts)
        # is the time-range aggregate.
        from ray.data.aggregate import Count, Max, Min, Sum

        specs: dict[str, object] = {}
        outputs: list[tuple[str, str]] = []

        def want(spec, key):
            specs.setdefault(key, spec)
            return key

        for kind, arg, alias in aggs:
            if kind == "COUNT":
                outputs.append((alias, want(Count(), "count()")))
            elif kind == "SUM":
                outputs.append((alias, want(Sum(arg), f"sum({arg})")))
            elif kind == "MIN":
                outputs.append((alias, want(Min(arg), f"min({arg})")))
            elif kind == "MAX":
                outputs.append((alias, want(Max(arg), f"max({arg})")))
            elif kind == "BBOX":
                lon_c, lat_c = arg[0], arg[1]
                outputs += [
                    (f"{alias}_minx", want(Min(lon_c), f"min({lon_c})")),
                    (f"{alias}_miny", want(Min(lat_c), f"min({lat_c})")),
                    (f"{alias}_maxx", want(Max(lon_c), f"max({lon_c})")),
                    (f"{alias}_maxy", want(Max(lat_c), f"max({lat_c})")),
                ]
            else:  # TRANGE
                c = arg[0]
                outputs += [
                    (f"{alias}_lo", want(Min(c), f"min({c})")),
                    (f"{alias}_hi", want(Max(c), f"max({c})")),
                ]
        if list(specs) == ["count()"]:
            # Ray 2.49 quirk: aggregate(Count()) ALONE returns 0 after a
            # fused map_batches chain (combined with any other aggregate it
            # is correct); Dataset.count() is reliable
            row = {"count()": ds.count()}
        else:
            row = ds.aggregate(*specs.values())
        return pa.table({name: [row[key]] for name, key in outputs})
    if sel and sel[0][0] != "*":
        ds = ds.select_columns([s[1] for s in sel if s[0] == "COL"])
    if plan["limit"] is not None:
        ds = ds.limit(plan["limit"])
    return ds

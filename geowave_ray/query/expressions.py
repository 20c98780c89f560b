"""Composable filter expressions over Arrow batches.

Mirrors the reference's typed expression-filter surface
(``core/store/.../query/filter/expression/`` — And/Or/Not/Between/IsNull/
comparisons, numeric Add/Subtract/Multiply/Divide/Abs, text StartsWith/
EndsWith/Contains (case-insensitive option), and the spatial/temporal
predicates) re-expressed as a small Python expression tree that compiles to
``pyarrow.compute`` kernels per batch, plus ``extract_bbox`` which mirrors
OptimalExpressionQuery's constraint extraction (pull an index-usable bbox /
time range out of an expression tree).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "col",
    "lit",
    "Expr",
    "apply_filter",
]


class Expr:
    # ---- operators ----
    def __and__(self, other):
        return _Bool("and", self, other)

    def __or__(self, other):
        return _Bool("or", self, other)

    def __invert__(self):
        return _Not(self)

    def __eq__(self, other):  # noqa: PLW3201
        return _Cmp("==", self, _wrap(other))

    def __ne__(self, other):  # noqa: PLW3201
        return _Cmp("!=", self, _wrap(other))

    def __lt__(self, other):
        return _Cmp("<", self, _wrap(other))

    def __le__(self, other):
        return _Cmp("<=", self, _wrap(other))

    def __gt__(self, other):
        return _Cmp(">", self, _wrap(other))

    def __ge__(self, other):
        return _Cmp(">=", self, _wrap(other))

    def __add__(self, other):
        return _Arith("add", self, _wrap(other))

    def __sub__(self, other):
        return _Arith("subtract", self, _wrap(other))

    def __mul__(self, other):
        return _Arith("multiply", self, _wrap(other))

    def __truediv__(self, other):
        return _Arith("divide", self, _wrap(other))

    def abs(self):
        return _Arith("abs", self, None)

    def between(self, lo, hi):
        return (self >= lo) & (self <= hi)

    def is_null(self):
        return _Unary("is_null", self)

    def starts_with(self, prefix: str, ignore_case: bool = False):
        return _Text("starts_with", self, prefix, ignore_case)

    def ends_with(self, suffix: str, ignore_case: bool = False):
        return _Text("ends_with", self, suffix, ignore_case)

    def contains(self, sub: str, ignore_case: bool = False):
        return _Text("match_substring", self, sub, ignore_case)

    def like(self, pattern: str, ignore_case: bool = False):
        """SQL LIKE (% / _ wildcards) via pyarrow match_like."""
        return _Text("match_like", self, pattern, ignore_case)

    def isin(self, values: list):
        return _In(self, list(values))

    def evaluate(self, batch: pa.Table):
        raise NotImplementedError

    def __hash__(self):
        return id(self)


@dataclass(eq=False)
class _Col(Expr):
    name: str

    def evaluate(self, batch):
        return batch.column(self.name)


@dataclass(eq=False)
class _Lit(Expr):
    value: object

    def evaluate(self, batch):
        return self.value


def col(name: str) -> Expr:
    return _Col(name)


def lit(value) -> Expr:
    return _Lit(value)


def _wrap(v):
    return v if isinstance(v, Expr) else _Lit(v)


@dataclass(eq=False)
class _Cmp(Expr):
    op: str
    left: Expr
    right: Expr

    def evaluate(self, batch):
        fn = {
            "==": pc.equal,
            "!=": pc.not_equal,
            "<": pc.less,
            "<=": pc.less_equal,
            ">": pc.greater,
            ">=": pc.greater_equal,
        }[self.op]
        return fn(self.left.evaluate(batch), self.right.evaluate(batch))


@dataclass(eq=False)
class _Bool(Expr):
    op: str
    left: Expr
    right: Expr

    def evaluate(self, batch):
        fn = pc.and_kleene if self.op == "and" else pc.or_kleene
        return fn(self.left.evaluate(batch), self.right.evaluate(batch))


@dataclass(eq=False)
class _Not(Expr):
    inner: Expr

    def evaluate(self, batch):
        return pc.invert(self.inner.evaluate(batch))


@dataclass(eq=False)
class _Unary(Expr):
    op: str
    inner: Expr

    def evaluate(self, batch):
        return getattr(pc, self.op)(self.inner.evaluate(batch))


@dataclass(eq=False)
class _Arith(Expr):
    op: str
    left: Expr
    right: Expr | None

    def evaluate(self, batch):
        if self.op == "abs":
            return pc.abs(self.left.evaluate(batch))
        return getattr(pc, self.op)(self.left.evaluate(batch), self.right.evaluate(batch))


@dataclass(eq=False)
class _In(Expr):
    inner: Expr
    values: list

    def evaluate(self, batch):
        return pc.is_in(self.inner.evaluate(batch), value_set=pa.array(self.values))


@dataclass(eq=False)
class _Text(Expr):
    op: str
    inner: Expr
    pattern: str
    ignore_case: bool

    def evaluate(self, batch):
        return getattr(pc, self.op)(
            self.inner.evaluate(batch), self.pattern, ignore_case=self.ignore_case
        )


def apply_filter(ds, expr: Expr):
    """Dataset filter via a vectorized expression (map_batches, zero-copy)."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = expr.evaluate(batch)
        return batch.filter(mask)

    fn.__name__ = "expr_filter"
    return ds.map_batches(fn, batch_format="pyarrow")


@dataclass(eq=False)
class _Cast(Expr):
    """GWQL ``::text`` / ``::number`` cast (TextCastableType.java /
    NumberCastableType.java)."""

    inner: Expr
    to: str

    def evaluate(self, batch):
        v = self.inner.evaluate(batch)
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            return str(v) if self.to == "text" else float(v)
        return pc.cast(v, pa.string() if self.to == "text" else pa.float64())


def collect_columns(expr: Expr) -> set:
    """All ``_Col`` names referenced anywhere in an expression tree —
    walks every dataclass field recursively (used by GWQL's field
    validation, GWQLParserTest.java's 'Field X did not exist' contract)."""
    import dataclasses

    out: set = set()

    def walk(e):
        if isinstance(e, _Col):
            out.add(e.name)
            return
        if dataclasses.is_dataclass(e) and not isinstance(e, type):
            for f in dataclasses.fields(e):
                v = getattr(e, f.name, None)
                if isinstance(v, Expr):
                    walk(v)

    walk(expr)
    return out


def extract_bbox(expr: Expr, lon_col: str = "lon", lat_col: str = "lat"):
    """Pull an index-usable bbox out of an AND-tree of lon/lat comparisons
    (OptimalExpressionQuery constraint extraction analog).  Returns
    (minx, miny, maxx, maxy) or None when the tree has no spatial bound."""
    bounds = {lon_col: [-np.inf, np.inf], lat_col: [-np.inf, np.inf]}

    def walk(e: Expr):
        if isinstance(e, _Bool) and e.op == "and":
            walk(e.left)
            walk(e.right)
        elif isinstance(e, _Cmp) and isinstance(e.left, _Col) and isinstance(e.right, _Lit):
            name, v = e.left.name, e.right.value
            if name in bounds and isinstance(v, (int, float)):
                if e.op in (">", ">="):
                    bounds[name][0] = max(bounds[name][0], float(v))
                elif e.op in ("<", "<="):
                    bounds[name][1] = min(bounds[name][1], float(v))
                elif e.op == "==":
                    bounds[name] = [float(v), float(v)]

    walk(expr)
    (minx, maxx), (miny, maxy) = bounds[lon_col], bounds[lat_col]
    if np.isinf(minx) and np.isinf(maxx) and np.isinf(miny) and np.isinf(maxy):
        return None
    return (
        max(minx, -180.0),
        max(miny, -90.0),
        min(maxx, 180.0),
        min(maxy, 90.0),
    )

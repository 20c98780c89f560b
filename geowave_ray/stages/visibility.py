"""Per-field / per-row visibility filtering (authorization labels).

Reference: core/store/.../data/visibility — every field value can carry a
visibility expression; a reader presents authorization labels and only
sees rows/fields whose expression is satisfied
(VisibilityExpression / FieldLevelVisibilityHandler).

Expression grammar (the reference's Accumulo-style syntax): labels
combined with ``&`` (and), ``|`` (or) and parentheses; an empty
expression is visible to everyone.

Ray-Data shape: expressions are parsed ONCE per distinct string (per
batch dictionary-encode; corpus-wide there are few distinct
expressions), rows filtered vectorized; unauthorized FIELDS are nulled
(not dropped) so the schema stays stable across readers with different
authorizations.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = ["visibility_satisfied", "apply_visibility", "VisibilityFilter"]

_TOK = re.compile(r"\s*([A-Za-z_][\w.-]*|[&|()])")


def _parse(expr: str):
    """-> nested tuple AST: ('and'|'or', left, right) | label str."""
    toks = []
    pos = 0
    while pos < len(expr):
        m = _TOK.match(expr, pos)
        if not m:
            raise ValueError(f"bad visibility expression {expr!r}")
        toks.append(m.group(1))
        pos = m.end()

    def parse_or(i):
        node, i = parse_and(i)
        while i < len(toks) and toks[i] == "|":
            rhs, i = parse_and(i + 1)
            node = ("or", node, rhs)
        return node, i

    def parse_and(i):
        node, i = parse_atom(i)
        while i < len(toks) and toks[i] == "&":
            rhs, i = parse_atom(i + 1)
            node = ("and", node, rhs)
        return node, i

    def parse_atom(i):
        if toks[i] == "(":
            node, i = parse_or(i + 1)
            if toks[i] != ")":
                raise ValueError("unbalanced parens")
            return node, i + 1
        return toks[i], i + 1

    node, i = parse_or(0)
    if i != len(toks):
        raise ValueError(f"trailing tokens in {expr!r}")
    return node


def visibility_satisfied(expr: str, auths: set[str]) -> bool:
    """Evaluate one visibility expression against an authorization set."""
    if not expr or not expr.strip():
        return True

    def ev(node):
        if isinstance(node, str):
            return node in auths
        op, a, b = node
        return (ev(a) and ev(b)) if op == "and" else (ev(a) or ev(b))

    return ev(_parse(expr))


class VisibilityFilter:
    """map_batches stage: drops rows whose ``vis_col`` expression is not
    satisfied by ``auths``; nulls out fields whose static visibility (from
    ``field_vis``) is not satisfied.  Distinct expressions are evaluated
    once per batch (dictionary encoding), never per row."""

    def __init__(
        self,
        auths: set[str] | list[str],
        vis_col: str | None = "visibility",
        field_vis: dict[str, str] | None = None,
    ):
        self.auths = set(auths)
        self.vis_col = vis_col
        self.hidden_fields = [
            f
            for f, expr in (field_vis or {}).items()
            if not visibility_satisfied(expr, self.auths)
        ]
        self._cache: dict[str, bool] = {}

    def _ok(self, expr: str) -> bool:
        if expr not in self._cache:
            self._cache[expr] = visibility_satisfied(expr, self.auths)
        return self._cache[expr]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.vis_col is not None and self.vis_col in batch.column_names:
            enc = batch.column(self.vis_col).combine_chunks().dictionary_encode()
            dict_vals = [v or "" for v in enc.dictionary.to_pylist()]
            ok = np.array([self._ok(v) for v in dict_vals], dtype=bool)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ok[idx]))
        for f in self.hidden_fields:
            if f in batch.column_names:
                i = batch.column_names.index(f)
                batch = batch.set_column(
                    i, f, pa.nulls(len(batch), batch.schema.field(f).type)
                )
        return batch


def apply_visibility(ds, auths, vis_col="visibility", field_vis=None):
    from .util import stage_fn

    return ds.map_batches(
        stage_fn(VisibilityFilter, auths=auths, vis_col=vis_col, field_vis=field_vis),
        batch_format="pyarrow",
    )

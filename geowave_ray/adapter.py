"""Typed record adapters — the Ray-native DataTypeAdapter surface.

Reference: DataTypeAdapter<T> enumerates named typed fields of an entry
(core/store/.../api/DataTypeAdapter.java); BasicDataTypeAdapter builds one
from an annotated POJO (adapter/BasicDataTypeAdapter.java,
annotation/GeoWaveField.java).  Ray-native shape: a python dataclass maps
to a pyarrow schema; batches of dataclass instances round-trip through
Arrow tables; a geometry field (Geometry subclass) is carried as WKB
binary, datetimes as timestamp[ms].
"""

from __future__ import annotations

import dataclasses
import datetime as _dt

import numpy as np
import pyarrow as pa

from .geom.wkb import Geometry, parse_wkb, to_wkb

__all__ = ["DataTypeAdapter"]

_PY_TO_ARROW = {
    int: pa.int64(),
    float: pa.float64(),
    str: pa.string(),
    bool: pa.bool_(),
    bytes: pa.binary(),
    _dt.datetime: pa.timestamp("ms"),
}


class DataTypeAdapter:
    """Adapter for a @dataclass type: schema enumeration + to/from Arrow."""

    def __init__(self, cls):
        if not dataclasses.is_dataclass(cls):
            raise TypeError(f"{cls} is not a dataclass")
        self.cls = cls
        self.fields = dataclasses.fields(cls)
        self._geom_fields = set()
        arrow_fields = []
        for f in self.fields:
            t = f.type if not isinstance(f.type, str) else eval(f.type, vars(__import__("builtins")), {"Geometry": Geometry, "datetime": _dt.datetime})
            if isinstance(t, type) and issubclass(t, Geometry) or t is Geometry:
                self._geom_fields.add(f.name)
                arrow_fields.append(pa.field(f.name, pa.binary()))
            elif t in _PY_TO_ARROW:
                arrow_fields.append(pa.field(f.name, _PY_TO_ARROW[t]))
            else:
                raise TypeError(f"unsupported field type {t!r} for {f.name}")
        self.schema = pa.schema(arrow_fields)

    def to_table(self, entries: list) -> pa.Table:
        cols = {}
        for f in self.fields:
            vals = [getattr(e, f.name) for e in entries]
            if f.name in self._geom_fields:
                vals = [to_wkb(v) if v is not None else None for v in vals]
            cols[f.name] = pa.array(vals, type=self.schema.field(f.name).type)
        return pa.table(cols)

    def from_table(self, table: pa.Table) -> list:
        out = []
        cols = {f.name: table.column(f.name).to_pylist() for f in self.fields}
        for i in range(len(table)):
            kwargs = {}
            for f in self.fields:
                v = cols[f.name][i]
                if f.name in self._geom_fields and v is not None:
                    v = parse_wkb(v)
                kwargs[f.name] = v
            out.append(self.cls(**kwargs))
        return out

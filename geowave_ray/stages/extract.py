"""Semi-structured field extraction: pull typed values out of string
payload columns (JSON-ish props, log lines, key=value blobs) with ONE
vectorized RE2 pass per batch (``pyarrow.compute.extract_regex``).

Reference analog: adapter field readers — GeoWave materializes typed
attributes from encoded row payloads per query via FieldReader
implementations (core/store/.../adapter/AbstractDataAdapter.java,
core/geotime/.../adapter/FeatureDataAdapter field handlers); here the
payload is a string column and the "reader" is a compiled regex applied
zero-copy over the Arrow batch.

Scale shape (100 TB): stateless per-batch kernel on the task pool — no
shuffle, no state, no Python row loops; the regex is RE2-compiled once
per `extract_regex` call on a whole batch.  Rows that do not match
yield NULL and are dropped (or kept, caller's choice) before any
downstream aggregate, so malformed payloads cost nothing downstream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["extract_int_field"]


def extract_int_field(
    batch: pa.Table,
    src_col: str,
    pattern: str,
    out_col: str,
    drop_unmatched: bool = True,
) -> pa.Table:
    """Append ``out_col`` (int64) extracted from ``src_col`` by
    ``pattern`` — the pattern must contain exactly one NAMED group
    ``(?P<v>...)`` matching an integer.  Non-matching rows get NULL
    (dropped when ``drop_unmatched``)."""
    m = pc.extract_regex(batch.column(src_col), pattern)
    # struct array with one field "v"; null struct where unmatched
    vals = pc.cast(pc.struct_field(m, "v"), pa.int64())
    out = batch.append_column(out_col, vals)
    if drop_unmatched:
        out = out.filter(pc.is_valid(vals))
    return out

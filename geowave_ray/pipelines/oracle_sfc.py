"""DuckDB oracle SQL for the Hilbert SFC encode paths.

The compact-Hilbert per-bit state machine (index/hilbert.py) is small
enough to embed as literal transition arrays (w_table + next_state,
``(2^n * n) << n`` entries) and run as a ``list_reduce`` fold over the bit
levels — so even the curve keys themselves are hash-verified by the
driver's DuckDB gate, not just unit-tested against reference vectors.

Accumulator encoding: acc = h * PAD + state with PAD = next power of two
above the state count; one HUGEINT carries both through the fold.
"""

from __future__ import annotations

from ..index.hilbert import HilbertCurve

__all__ = ["sql_hilbert_fold", "sql_hilbert_cells", "sql_spatial_temporal_cells"]


def sql_hilbert_fold(n_dims: int, bits: int, coord_exprs: list[str]) -> tuple[str, str]:
    """-> (with_tables_sql, fold_expr).  ``coord_exprs`` are BIGINT cell
    coordinate expressions (dim 0 = label bit 0); the fold expression
    yields the Hilbert index as HUGEINT (divide pads out)."""
    w_table, _, (next_state, _) = HilbertCurve._tables(n_dims)
    n_states = (1 << n_dims) * n_dims
    pad = 1 << (n_states - 1).bit_length()
    w_lit = "[" + ",".join(str(int(x)) for x in w_table) + "]::BIGINT[]"
    s_lit = "[" + ",".join(str(int(x)) for x in next_state) + "]::BIGINT[]"
    tables = f"(SELECT {w_lit} AS HW, {s_lit} AS HS)"
    l_bits = " | ".join(
        f"(((({c}) >> ({bits - 1} - b)) & 1) << {j})" for j, c in enumerate(coord_exprs)
    )
    l_list = f"list_transform(range({bits}), b -> ({l_bits})::HUGEINT)"
    nch = 1 << n_dims
    idx = f"CAST((acc % {pad}) * {nch} + l AS BIGINT) + 1"
    fold = (
        f"(list_reduce(list_prepend(0::HUGEINT, {l_list}),"
        f" (acc, l) -> ((acc // {pad}) * {nch} + HW[{idx}]) * {pad} + HS[{idx}])"
        f" // {pad})"
    )
    return tables, fold


def sql_hilbert_cells(pts_sql: str, bits: int = 31) -> str:
    """Mirror of stages/encode.CellEncoder for point rows: tier = bits,
    cell = 2-D Hilbert index of the (lon, lat half-range) point cells."""
    b = 1 << bits
    cx = (
        f"GREATEST(CAST(CEIL((LEAST(GREATEST(lon, -180), 180) + 180.0) / 360.0"
        f" * {b}) AS BIGINT) - 1, 0)"
    )
    cy = (
        f"GREATEST(CAST(CEIL((LEAST(GREATEST(lat, -90), 90) + 180.0) / 360.0"
        f" * {b}) AS BIGINT) - 1, 0)"
    )
    tables, fold = sql_hilbert_fold(2, bits, ["cx", "cy"])
    return f"""
WITH pts AS ({pts_sql}),
ht AS {tables},
c AS (SELECT image_id, {cx} AS cx, {cy} AS cy FROM pts)
SELECT image_id, {bits} AS tier, CAST({fold} AS BIGINT) AS cell
FROM c CROSS JOIN ht
"""


def sql_spatial_temporal_cells(pts_sql: str, bits: int = 20) -> str:
    """Mirror of SpatialTemporalStrategy((bits,bits,bits)).encode_points:
    YEAR bin + 3-D Hilbert over (lon, lat half-range, in-year time)."""
    b = 1 << bits
    cx = (
        f"GREATEST(CAST(CEIL((LEAST(GREATEST(lon, -180), 180) + 180.0) / 360.0"
        f" * {b}) AS BIGINT) - 1, 0)"
    )
    cy = (
        f"GREATEST(CAST(CEIL((LEAST(GREATEST(lat, -90), 90) + 180.0) / 360.0"
        f" * {b}) AS BIGINT) - 1, 0)"
    )
    tnorm = (
        "CAST(EPOCH_US(ts) // 1000 - EPOCH_MS(DATE_TRUNC('year', ts)) AS DOUBLE)"
        " / CAST(EPOCH_MS(DATE_TRUNC('year', ts) + INTERVAL 1 YEAR)"
        " - EPOCH_MS(DATE_TRUNC('year', ts)) AS DOUBLE)"
    )
    ct = f"GREATEST(CAST(CEIL(({tnorm}) * {b}) AS BIGINT) - 1, 0)"
    tables, fold = sql_hilbert_fold(3, bits, ["cx", "cy", "ct"])
    return f"""
WITH pts AS ({pts_sql}),
ht AS {tables},
c AS (
  SELECT image_id,
         CAST(DATE_PART('year', ts) AS BIGINT) AS year_bin,
         {cx} AS cx, {cy} AS cy, {ct} AS ct
  FROM pts)
SELECT image_id, year_bin, CAST({fold} AS BIGINT) AS st_cell
FROM c CROSS JOIN ht
"""

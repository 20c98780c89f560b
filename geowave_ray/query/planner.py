"""Query planning: geometry/time constraints -> pruned scan -> coarse
filter -> fine refinement.

Mirrors the reference's query path (SURVEY §3.2, BaseConstraintsQuery /
NativeEntryIteratorWrapper):

1. constraints -> per-tier (tier, cell) ranges (antimeridian split,
   over-inclusive edges) — ``TieredStrategy.get_query_ranges``
2. scan pruning: a pyarrow dataset filter over the sorted (tier, cell)
   parquet layout, or a vectorized in-memory range filter
3. coarse numeric bbox compare (BasicQueryFilter semantics)
4. fine geometry refinement in an actor pool holding the prepared query
   polygon (SpatialQueryFilter interning analog)
5. optional subsample-by-cell-prefix (level-of-detail,
   IndexUtils.getBitPositionOnSortKeyFromSubsamplingArray analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom.predicates import COMPARE_OPS, points_in_polygon, relate
from ..geom.wkb import Polygon, bbox_of, box_polygon, parse_wkb, to_wkb
from ..index.tiered import TieredStrategy, spatial_strategy

__all__ = [
    "SpatialQuery",
    "cell_range_filter",
    "point_predicate_mask",
    "subsample_by_cell",
]


def point_predicate_mask(lon, lat, geometry: Polygon, op: str) -> np.ndarray:
    """Vectorized point-vs-polygon truth mask for the 8 compare ops
    (SpatialQueryFilter semantics reduced to point geometries)."""
    if op in ("INTERSECTS", "CONTAINS"):
        return points_in_polygon(lon, lat, geometry, include_boundary=op == "INTERSECTS")
    if op == "DISJOINT":
        return ~points_in_polygon(lon, lat, geometry)
    if op == "TOUCHES":
        inside_incl = points_in_polygon(lon, lat, geometry, True)
        inside_excl = points_in_polygon(lon, lat, geometry, False)
        return inside_incl & ~inside_excl
    if op in ("WITHIN", "EQUALS", "OVERLAPS", "CROSSES"):
        # a 2-D query region can never be within/equal/overlap a point
        return np.zeros(len(lon), dtype=bool)
    if op.startswith("RELATE"):
        # generic DE-9IM pattern (ECQL RELATE escape hatch): a point's
        # matrix vs the query polygon takes exactly three values, one per
        # location class, so the mask is a vectorized 3-way locate plus a
        # per-class pattern test
        from ..geom.predicates import locate_points, matches_pattern

        pattern = op.split(None, 1)[1].strip("'\" ")
        point_matrices = ("0F2FF1FF2", "FF20F1FF2", "FF2FF10F2")  # I, B, E
        loc = locate_points(lon, lat, geometry)
        mask = np.zeros(len(lon), dtype=bool)
        for cls, mat in enumerate(point_matrices):
            if matches_pattern(mat, pattern):
                mask |= loc == cls
        return mask
    raise ValueError(op)


@dataclass
class SpatialQuery:
    """bbox or polygon constraint with one of the 8 compare ops.

    ``geometry``: Polygon (native coords) — bbox queries pass a box polygon.
    For point datasets every op reduces to a point test; INTERSECTS is the
    default (SpatialQueryFilter.java:47).
    """

    geometry: Polygon
    op: str = "INTERSECTS"
    time_range: tuple[int, int] | None = None  # [lo_ms, hi_ms]
    bits: int = 31

    def bbox(self) -> tuple[float, float, float, float]:
        return bbox_of(self.geometry)

    def query_ranges(self, strategy: TieredStrategy | None = None, max_ranges: int = 64):
        strategy = strategy or spatial_strategy(self.bits)
        minx, miny, maxx, maxy = self.bbox()
        return strategy.get_query_ranges([(minx, maxx), (miny, maxy)], max_ranges)

    # ---- stages -------------------------------------------------------
    def coarse_filter(self, batch: pa.Table, lon_col="lon", lat_col="lat") -> pa.Table:
        """BasicQueryFilter: vectorized bbox compare."""
        minx, miny, maxx, maxy = self.bbox()
        lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        mask = (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
        if self.op == "DISJOINT":
            mask = ~mask
        return batch.filter(pa.array(mask))

    def apply(
        self,
        ds,
        lon_col: str = "lon",
        lat_col: str = "lat",
        time_col: str | None = None,
        concurrency: int | None = None,
    ):
        """Full query pipeline over a point Dataset (streaming)."""
        from ..stages.join import default_concurrency

        query = self

        class Refiner:
            def __init__(self):
                self.geom = query.geometry
                self.op = query.op

            def __call__(self, batch: pa.Table) -> pa.Table:
                lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
                lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
                mask = point_predicate_mask(lon, lat, self.geom, self.op)
                if query.time_range is not None and time_col is not None:
                    t = batch.column(time_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
                    lo, hi = query.time_range
                    mask &= (t >= lo) & (t <= hi)
                return batch.filter(pa.array(mask))

        from ..geom.predicates import pattern_implies_intersection

        prunable = query.op != "DISJOINT" and (
            not query.op.startswith("RELATE")
            or pattern_implies_intersection(query.op.split(None, 1)[1].strip("'\" "))
        )
        out = ds.map_batches(
            lambda b: query.coarse_filter(b, lon_col, lat_col) if prunable else b,
            batch_format="pyarrow",
        )
        if concurrency is not None:
            return out.map_batches(
                Refiner, batch_format="pyarrow", concurrency=concurrency
            )
        # light state (prepared geometry) -> task pool with per-worker
        # instance cache; an actor pool pays ~0.5-1s spawn per execution
        from ..stages.util import stage_fn

        return out.map_batches(stage_fn(Refiner), batch_format="pyarrow")

    # serialization round-trip (reference toBinary/fromBinary tests)
    def to_binary(self) -> bytes:
        import json

        payload = {
            "wkb": to_wkb(self.geometry).hex(),
            "op": self.op,
            "time_range": self.time_range,
            "bits": self.bits,
        }
        return json.dumps(payload).encode()

    @classmethod
    def from_binary(cls, data: bytes) -> "SpatialQuery":
        import json

        p = json.loads(data)
        return cls(
            parse_wkb(bytes.fromhex(p["wkb"])),
            p["op"],
            tuple(p["time_range"]) if p["time_range"] else None,
            p["bits"],
        )


def cell_range_filter(ranges) -> "pc.Expression":
    """pyarrow dataset filter expression over (tier, cell) for pruned scans
    of the sorted parquet layout — the Ray-native analog of the reference's
    backend range scan (QueryRanges -> RowReader)."""
    import pyarrow.dataset as pads

    expr = None
    for r in ranges:
        e = (
            (pads.field("tier") == r.tier)
            & (pads.field("cell") >= r.lo)
            & (pads.field("cell") <= r.hi)
        )
        expr = e if expr is None else (expr | e)
    return expr


def subsample_by_cell(ds, bits_keep: int, bits: int = 31, tie_col: str | None = None):
    """Level-of-detail subsampling: keep one row per cell prefix at
    ``bits_keep`` bits of precision (row-subsampling skip analog,
    IndexUtils.java:199-293).  Deterministic: min tie_col per prefix."""
    shift = np.uint64(2 * (bits - bits_keep))

    def add_prefix(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "_prefix", pa.array(cell >> shift, type=pa.uint64())
        )

    def first(group: pa.Table) -> pa.Table:
        if tie_col is not None:
            order = pc.sort_indices(group.column(tie_col))
            group = group.take(order[:1])
        else:
            group = group.slice(0, 1)
        return group.drop_columns(["_prefix"])

    return (
        ds.map_batches(add_prefix, batch_format="pyarrow")
        .groupby("_prefix")
        .map_groups(first, batch_format="pyarrow")
    )


class WkbRefiner:
    """Fine refinement for stored extended geometries (lines/polygons as
    data rows, WKB column) — the vector-IT path of the reference (hail
    points + tornado_tracks linestrings, GeoWaveBasicSpatialTemporalVectorIT):
    coarse vectorized bbox precheck on (minx,miny,maxx,maxy) columns, then
    the DE-9IM predicate per surviving candidate."""

    def __init__(self, query: "SpatialQuery", wkb_col: str = "wkb"):
        from ..geom.predicates import COMPARE_OPS, evaluate, relate
        from ..geom.wkb import parse_wkb

        self.query = query
        self.wkb_col = wkb_col
        self._relate = relate
        if query.op.startswith("RELATE"):
            # generic DE-9IM pattern: route through evaluate(); only
            # intersection-implying patterns admit the bbox prune
            self._op = None
            self._evaluate = evaluate
        else:
            self._op = COMPARE_OPS[query.op]
        self._parse = parse_wkb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom.predicates import pattern_implies_intersection

        q = self.query
        minx, miny, maxx, maxy = q.bbox()
        cols = batch.column_names
        is_relate = q.op.startswith("RELATE")
        # prune only when the op can never match a bbox-disjoint pair
        prunable = q.op != "DISJOINT" and (
            not is_relate
            or pattern_implies_intersection(q.op.split(None, 1)[1].strip("'\" "))
        )
        if {"minx", "miny", "maxx", "maxy"} <= set(cols):
            bx0 = batch.column("minx").to_numpy(zero_copy_only=False)
            by0 = batch.column("miny").to_numpy(zero_copy_only=False)
            bx1 = batch.column("maxx").to_numpy(zero_copy_only=False)
            by1 = batch.column("maxy").to_numpy(zero_copy_only=False)
            coarse = (bx0 <= maxx) & (bx1 >= minx) & (by0 <= maxy) & (by1 >= miny)
            if prunable:
                candidates = np.nonzero(coarse)[0]
            else:
                # non-prunable ops can still be true for bbox-disjoint rows
                candidates = np.arange(len(batch))
        else:
            candidates = np.arange(len(batch))
        keep = np.zeros(len(batch), dtype=bool)
        if q.op == "DISJOINT" and {"minx", "miny", "maxx", "maxy"} <= set(cols):
            # bbox-disjoint rows are definitely DISJOINT=True; refine the rest
            keep[~coarse] = True
            candidates = np.nonzero(coarse)[0]
        wkbs = batch.column(self.wkb_col).to_pylist()
        for i in candidates:
            geom = self._parse(wkbs[i])
            if self._op is None:
                keep[i] = self._evaluate(q.op, q.geometry, geom)
            else:
                keep[i] = self._op(self._relate(q.geometry, geom))
        return batch.filter(pa.array(keep))


def apply_wkb_query(ds, query: SpatialQuery, wkb_col: str = "wkb"):
    """Query a Dataset of WKB geometry rows with any of the 8 compare ops."""
    from ..stages.util import stage_fn

    return ds.map_batches(
        stage_fn(WkbRefiner, query=query, wkb_col=wkb_col), batch_format="pyarrow"
    )

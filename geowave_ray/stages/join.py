"""Spatial join stages.

Two regimes, mirroring the trade-off the reference's TieredSpatialJoin
(analytics/spark/.../spatial/TieredSpatialJoin.java:59-552) resolves with
tier cogroups:

- ``broadcast_spatial_join`` — the small polygon layer is put in the object
  store ONCE (ray.put) and each refiner actor builds its bbox grid + parsed
  polygons in ``__init__``; the image side streams through ``map_batches``
  with zero shuffle (image ``bytes`` never move).  This is the 100 TB-scale
  default whenever one side fits in memory.

- ``cell_shuffle_join`` — large-large: polygons are flat-mapped to covering
  grid cells, points keyed by cell, then a single ``groupby(cell)`` cogroup
  with per-group pairwise refinement.  Hot cells are explicitly salted from
  a pre-pass count (north rule: explicit skew handling); the polygon side is
  replicated to every salt of a hot cell, so results are identical.

Matches carry (point keys, zone_id); point-in-polygon tests use the
vectorized even-odd kernel.  Semi/anti modes mirror the reference's
JoinOptions negative-predicate support (subtractByKey analog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.index import BBoxGrid
from ..geom.predicates import points_in_polygon
from ..geom.wkb import parse_wkb
from ..index.grid import GridScheme
from .encode import BoxCellExpander, GridCellEncoder

__all__ = [
    "ZoneIndex",
    "BroadcastZoneJoiner",
    "broadcast_spatial_join",
    "cell_shuffle_join",
    "default_concurrency",
]


def default_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds (1, n_cpus): a FIXED pool sized to all
    CPUs deadlocks against upstream read/shuffle tasks on small clusters;
    autoscaling lets the streaming executor balance stages."""
    import ray

    try:
        return (1, max(2, int(ray.cluster_resources().get("CPU", 4))))
    except Exception:
        return (1, 4)


class ZoneIndex:
    """Parsed polygon layer + bbox candidate grid (built once, broadcast).

    All zone ring edges are flattened into contiguous arrays at build time
    (CSR by zone), so the refine step is a single vectorized pass over
    (candidate pair x edge) expansions — no per-zone Python loop in the
    batch hot path.  Even-odd parity over all rings of a zone handles
    multipolygons and holes uniformly.
    """

    def __init__(self, zones: pa.Table, buffer: float = 0.0):
        from ..geom.wkb import MultiGeometry, Polygon

        self.zone_ids = zones.column("zone_id").to_pylist()
        self.polys = [parse_wkb(w) for w in zones.column("wkb").to_pylist()]
        boxes = np.stack(
            [
                zones.column("minx").to_numpy(zero_copy_only=False) - buffer,
                zones.column("miny").to_numpy(zero_copy_only=False) - buffer,
                zones.column("maxx").to_numpy(zero_copy_only=False) + buffer,
                zones.column("maxy").to_numpy(zero_copy_only=False) + buffer,
            ],
            axis=1,
        )
        self.grid = BBoxGrid(boxes)
        self.buffer = buffer

        # flatten edges: per zone, all rings of all polygon parts
        ax, ay, bx, by, counts = [], [], [], [], []
        for poly in self.polys:
            parts = poly.parts if isinstance(poly, MultiGeometry) else [poly]
            n_edges = 0
            for part in parts:
                if not isinstance(part, Polygon):
                    continue
                for ring in part.rings:
                    ax.append(ring[:-1, 0])
                    ay.append(ring[:-1, 1])
                    bx.append(ring[1:, 0])
                    by.append(ring[1:, 1])
                    n_edges += len(ring) - 1
            counts.append(n_edges)
        self.e_ax = np.concatenate(ax) if ax else np.zeros(0)
        self.e_ay = np.concatenate(ay) if ay else np.zeros(0)
        self.e_bx = np.concatenate(bx) if bx else np.zeros(0)
        self.e_by = np.concatenate(by) if by else np.zeros(0)
        self.e_counts = np.asarray(counts, dtype=np.int64)
        self.e_start = np.concatenate([[0], np.cumsum(self.e_counts)])

    def match_points(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (point_idx, zone_idx) exact point-in-polygon matches (boundary
        inclusive, INTERSECTS semantics); with ``buffer`` > 0, matches points
        within that distance of the polygon (degrees, planar)."""
        pi, zi = self.grid.query_points(xs, ys)
        if len(pi) == 0:
            return pi, zi
        n_pairs = len(pi)
        counts = self.e_counts[zi]
        total = int(counts.sum())
        pair_of = np.repeat(np.arange(n_pairs, dtype=np.int64), counts)
        rank = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        eidx = self.e_start[zi][pair_of] + rank
        px = xs[pi][pair_of]
        py = ys[pi][pair_of]
        ax, ay = self.e_ax[eidx], self.e_ay[eidx]
        bx, by = self.e_bx[eidx], self.e_by[eidx]

        # even-odd crossing parity per pair
        cond = (ay > py) != (by > py)
        denom = by - ay
        t = np.where(cond, (py - ay) / np.where(denom == 0, 1e-300, denom), 0.0)
        crossed = cond & (px < ax + t * (bx - ax))
        inside = (np.bincount(pair_of, weights=crossed, minlength=n_pairs) % 2) >= 1

        # boundary tolerance (and within-distance buffer) via min edge distance
        tol = max(self.buffer, 1e-9)
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        tt = np.clip((px - ax) * dx + (py - ay) * dy, 0, L2) / np.where(L2 == 0, 1, L2)
        d2 = (px - (ax + tt * dx)) ** 2 + (py - (ay + tt * dy)) ** 2
        near = d2 <= tol * tol
        on_bnd = np.bincount(pair_of, weights=near, minlength=n_pairs) >= 1

        keep = inside | on_bnd
        return pi[keep], zi[keep]


def _dist_to_poly(xs: np.ndarray, ys: np.ndarray, poly) -> np.ndarray:
    """Min distance from points to polygon boundary (planar degrees)."""
    d2 = np.full(xs.shape, np.inf)
    for ring in poly.rings:
        for i in range(len(ring) - 1):
            ax, ay = ring[i]
            bx, by = ring[i + 1]
            dx, dy = bx - ax, by - ay
            L2 = dx * dx + dy * dy
            if L2 == 0:
                dd = (xs - ax) ** 2 + (ys - ay) ** 2
            else:
                t = np.clip(((xs - ax) * dx + (ys - ay) * dy) / L2, 0, 1)
                dd = (xs - (ax + t * dx)) ** 2 + (ys - (ay + t * dy)) ** 2
            d2 = np.minimum(d2, dd)
    return np.sqrt(d2)


class BroadcastZoneJoiner:
    """map_batches actor: refine image batches against the broadcast zone
    index.  Stateful setup (WKB parse, grid build) happens once per actor."""

    def __init__(
        self,
        zones: pa.Table,
        how: str = "inner",
        point_cols: tuple = ("image_id",),
        zone_cols: tuple = ("zone_id",),
        lon_col: str = "lon",
        lat_col: str = "lat",
        buffer: float = 0.0,
    ):
        import ray

        if isinstance(zones, ray.ObjectRef):
            zones = ray.get(zones)
        self.zones = zones
        self.index = ZoneIndex(zones, buffer=buffer)
        self.how = how
        self.point_cols = list(point_cols)
        self.zone_cols = list(zone_cols)
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        xs = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        ys = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        pi, zi = self.index.match_points(xs, ys)
        if self.how == "inner":
            cols = batch.select(self.point_cols).take(pa.array(pi))
            for zc in self.zone_cols:
                cols = cols.append_column(zc, self.zones.column(zc).take(pa.array(zi)))
            return cols
        matched = np.zeros(len(batch), dtype=bool)
        matched[pi] = True
        if self.how == "semi":
            return batch.filter(pa.array(matched))
        if self.how == "anti":
            return batch.filter(pa.array(~matched))
        raise ValueError(self.how)


def broadcast_spatial_join(
    points_ds,
    zones: pa.Table,
    how: str = "inner",
    point_cols: tuple = ("image_id",),
    zone_cols: tuple = ("zone_id",),
    buffer: float = 0.0,
    concurrency: int | tuple | None = None,
    batch_size: int | None = None,
    use_actors: bool = False,
):
    """points Dataset x zones table -> matches Dataset (no shuffle).

    The zones table is ray.put once; each worker builds its zone index
    zero-copy from the object store on first batch.  Runs on the task pool
    by default (index build is ~0.1s — see stages/util.py); pass
    ``use_actors=True`` for an explicit actor pool.
    """
    import ray

    from .util import stage_fn

    zones_ref = ray.put(zones)
    ctor = dict(
        zones=zones_ref,
        how=how,
        point_cols=point_cols,
        zone_cols=zone_cols,
        buffer=buffer,
    )
    kwargs = {}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    if use_actors:
        kwargs["concurrency"] = concurrency or default_concurrency()
        return points_ds.map_batches(
            BroadcastZoneJoiner,
            fn_constructor_kwargs=ctor,
            batch_format="pyarrow",
            **kwargs,
        )
    return points_ds.map_batches(
        stage_fn(BroadcastZoneJoiner, **ctor), batch_format="pyarrow", **kwargs
    )


class _CellJoinGroup:
    __name__ = "cell_join_group"
    """map_groups fn for the shuffle join cogroup: one (salted) cell's
    points vs its zone replicas."""

    def __init__(self, point_cols, zone_cols):
        self.point_cols = list(point_cols)
        self.zone_cols = list(zone_cols)

    def __call__(self, group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        pts = group.filter(pa.array(side == 0))
        zns = group.filter(pa.array(side == 1))
        if len(pts) == 0 or len(zns) == 0:
            return _empty_match_table(pts, zns, self.point_cols, self.zone_cols)
        zt = pa.table(
            {
                "zone_id": zns.column("zone_id"),
                "minx": zns.column("minx"),
                "miny": zns.column("miny"),
                "maxx": zns.column("maxx"),
                "maxy": zns.column("maxy"),
                "wkb": zns.column("wkb"),
            }
        )
        idx = ZoneIndex(zt)
        xs = pts.column("lon").to_numpy(zero_copy_only=False)
        ys = pts.column("lat").to_numpy(zero_copy_only=False)
        pi, zi = idx.match_points(xs, ys)
        out = pts.select(self.point_cols).take(pa.array(pi))
        for zc in self.zone_cols:
            out = out.append_column(zc, zns.column(zc).take(pa.array(zi)))
        return out


def _empty_match_table(pts, zns, point_cols, zone_cols):
    fields = []
    for c in point_cols:
        fields.append(pa.field(c, pts.schema.field(c).type))
    for c in zone_cols:
        fields.append(pa.field(c, zns.schema.field(c).type))
    return pa.table(
        {f.name: pa.array([], type=f.type) for f in fields}
    )


def cell_shuffle_join(
    points_ds,
    zones_ds,
    level: int = 6,
    how: str = "inner",
    point_cols: tuple = ("image_id",),
    zone_cols: tuple = ("zone_id",),
    hot_cell_threshold: int | None = None,
    salt_factor: int = 8,
):
    """Large-large spatial join: co-partition by grid cell + per-group
    refinement.  When ``hot_cell_threshold`` is set, a cheap count pre-pass
    finds skewed cells and salts them ``salt_factor`` ways (points hashed,
    zones replicated) — the reference handles the same skew with
    HashKeyIndexStrategy partition salting + a 1.5x oversized partitioner.

    Note: point `bytes`-free columns only should be passed through
    ``point_cols`` — never shuffle image payloads (SURVEY §7 hard part 5).
    """
    import ray

    scheme = GridScheme(level)
    points_cells = points_ds.map_batches(
        GridCellEncoder(level), batch_format="pyarrow"
    )

    hot_cells: dict[int, int] = {}
    if hot_cell_threshold is not None:
        # filter to hot cells DISTRIBUTED, before anything reaches the
        # driver: at fine cell levels (31-bit, salting on) the per-cell
        # histogram is corpus-scale, but cells above the skew threshold
        # are few by definition (total_rows / threshold bounds them).
        def only_hot(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.greater(batch.column("count()"), hot_cell_threshold)
            )

        only_hot.__name__ = "only_hot_cells"
        hot = (
            points_cells.groupby("cell")
            .count()
            .map_batches(only_hot, batch_format="pyarrow")
            .to_pandas()
        )
        hot_cells = {int(c): salt_factor for c in hot["cell"]}
    hot_ref = ray.put(hot_cells)

    def salt_points(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        from .encode import salt_cells

        # deterministic per-row hash from lon bits for salt spreading
        rh = np.frombuffer(
            np.ascontiguousarray(
                batch.column("lon").to_numpy(zero_copy_only=False)
            ).tobytes(),
            dtype=np.int64,
        ) & 0x7FFFFFFF
        salted = salt_cells(cell, rh, hot)
        batch = batch.drop_columns(["cell"]).append_column(
            "cell", pa.array(salted, type=pa.int64())
        )
        return batch.append_column("_side", pa.array(np.zeros(len(batch), dtype=np.int8)))

    def expand_zones(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        expander = BoxCellExpander(
            level, keep_cols=tuple({"zone_id", "minx", "miny", "maxx", "maxy", "wkb", *zone_cols})
        )
        out = expander(batch)
        cell = out.column("cell").to_numpy(zero_copy_only=False)
        # replicate zone rows to every salt of hot cells
        reps = np.array([hot.get(int(c), 1) for c in cell], dtype=np.int64)
        rows = np.repeat(np.arange(len(out), dtype=np.int64), reps)
        salt_k = np.arange(len(rows)) - np.repeat(np.cumsum(reps) - reps, reps)
        salted = cell[rows] * 64 + salt_k
        out = out.drop_columns(["cell"]).take(pa.array(rows))
        out = out.append_column("cell", pa.array(salted, type=pa.int64()))
        return out.append_column("_side", pa.array(np.ones(len(out), dtype=np.int8)))

    pts = points_cells.map_batches(salt_points, batch_format="pyarrow")
    zns = zones_ds.map_batches(expand_zones, batch_format="pyarrow")

    # align schemas for union: keep only needed columns + padding nulls
    pt_keep = list(dict.fromkeys([*point_cols, "lon", "lat", "cell", "_side"]))
    zn_keep = list(
        dict.fromkeys(["zone_id", "minx", "miny", "maxx", "maxy", "wkb", *zone_cols, "cell", "_side"])
    )

    def pad(keep_self, keep_other, other_schema):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(keep_self)
            for c in keep_other:
                if c not in batch.column_names:
                    batch = batch.append_column(
                        c, pa.nulls(len(batch), type=other_schema[c])
                    )
            return batch.select(sorted(batch.column_names))

        return fn

    zschema = zones_ds.schema().base_schema
    pschema = points_ds.schema().base_schema
    zn_types = {
        name: zschema.field(name).type
        for name in {"zone_id", "minx", "miny", "maxx", "maxy", "wkb", *zone_cols}
    }
    pt_types = {"lon": pa.float64(), "lat": pa.float64()}
    for c in point_cols:
        pt_types.setdefault(c, pschema.field(c).type)

    pts = pts.map_batches(pad(pt_keep, zn_keep, zn_types), batch_format="pyarrow")
    zns = zns.map_batches(pad(zn_keep, pt_keep, pt_types), batch_format="pyarrow")
    both = pts.union(zns)
    matches = both.groupby("cell").map_groups(
        _CellJoinGroup(point_cols, zone_cols), batch_format="pyarrow"
    )
    return matches


class _RectCellGroup:
    """map_groups fn for the PBSM rectangle-join cogroup: one grid cell's
    left boxes vs its right boxes.  Exactly-once output via the classic
    reporting-point rule: a pair is emitted only by the cell containing
    the MIN corner of the pair's intersection, so replicated boxes never
    produce duplicate pairs and no dedup shuffle is needed (Patel/DeWitt
    partition-based spatial-merge; the reference's TieredSpatialJoin
    achieves the same with tier-dedup — analytics/spark/.../
    TieredSpatialJoin.java)."""

    __name__ = "rect_cell_group"

    def __init__(self, cell_size, left_cols, right_cols, max_group_pairs,
                 weighted=None):
        self.g = int(cell_size)
        self.left_cols = list(left_cols)
        self.right_cols = list(right_cols)
        self.max_pairs = int(max_group_pairs)
        # weighted=(left_value_col, right_id_col): emit PRE-AGGREGATED
        # (right_id, vsum=sum(v*overlap_area), area=sum(overlap_area))
        # partials per cell instead of pair rows — the areal-interpolation
        # regime; overlap comes from the kernel's own _x0.._y1 columns, so
        # callers carry no duplicate coordinates through the shuffle
        self.weighted = weighted

    def __call__(self, group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0))
        rt = group.filter(pa.array(side == 1))
        empty = pa.table(
            {
                **{c: pa.array([], group.schema.field(c).type) for c in self.left_cols},
                **{c: pa.array([], group.schema.field(c).type) for c in self.right_cols},
            }
        )
        if len(lt) == 0 or len(rt) == 0:
            return empty
        if len(lt) * len(rt) > self.max_pairs:
            raise ValueError(
                f"rect_join cell with {len(lt)}x{len(rt)} boxes exceeds "
                f"max_group_pairs={self.max_pairs}; shrink cell_size or salt "
                "the hot cell (see broadcast regime in salt_cells)"
            )
        lx0 = lt.column("_x0").to_numpy(zero_copy_only=False)[:, None]
        ly0 = lt.column("_y0").to_numpy(zero_copy_only=False)[:, None]
        lx1 = lt.column("_x1").to_numpy(zero_copy_only=False)[:, None]
        ly1 = lt.column("_y1").to_numpy(zero_copy_only=False)[:, None]
        rx0 = rt.column("_x0").to_numpy(zero_copy_only=False)[None, :]
        ry0 = rt.column("_y0").to_numpy(zero_copy_only=False)[None, :]
        rx1 = rt.column("_x1").to_numpy(zero_copy_only=False)[None, :]
        ry1 = rt.column("_y1").to_numpy(zero_copy_only=False)[None, :]
        hit = (lx0 <= rx1) & (rx0 <= lx1) & (ly0 <= ry1) & (ry0 <= ly1)
        # reporting-point rule: intersection min corner must be in THIS cell
        cx = int(group.column("_cx")[0].as_py())
        cy = int(group.column("_cy")[0].as_py())
        ix = np.maximum(lx0, rx0)
        iy = np.maximum(ly0, ry0)
        hit &= (np.floor_divide(ix, self.g) == cx) & (np.floor_divide(iy, self.g) == cy)
        li, ri = np.nonzero(hit)
        if self.weighted is not None:
            vcol, rid_col = self.weighted
            w_empty = pa.table(
                {
                    rid_col: pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.int64()),
                    "area": pa.array([], pa.int64()),
                }
            )
            if len(li) == 0:
                return w_empty
            ox = np.maximum(
                np.minimum(lx1[li, 0], rx1[0, ri]) - np.maximum(lx0[li, 0], rx0[0, ri]), 0
            )
            oy = np.maximum(
                np.minimum(ly1[li, 0], ry1[0, ri]) - np.maximum(ly0[li, 0], ry0[0, ri]), 0
            )
            area = ox * oy
            v = lt.column(vcol).to_numpy(zero_copy_only=False)[li]
            rid = rt.column(rid_col).to_numpy(zero_copy_only=False)[ri]
            uk, inv = np.unique(rid, return_inverse=True)
            return pa.table(
                {
                    rid_col: pa.array(uk.astype(np.int64)),
                    "vsum": pa.array(
                        np.bincount(inv, weights=(v * area).astype(np.float64)).astype(np.int64)
                    ),
                    "area": pa.array(
                        np.bincount(inv, weights=area.astype(np.float64)).astype(np.int64)
                    ),
                }
            )
        if len(li) == 0:
            return empty
        out = {}
        for c in self.left_cols:
            out[c] = lt.column(c).take(pa.array(li))
        for c in self.right_cols:
            out[c] = rt.column(c).take(pa.array(ri))
        return pa.table(out)


def rect_join(
    left_ds,
    right_ds,
    cell_size: int,
    left_cols: tuple,
    right_cols: tuple,
    box_cols: tuple = ("x0", "y0", "x1", "y1"),
    max_group_pairs: int = 4_000_000,
    weighted: tuple | None = None,
):
    """Extent (rectangle) intersection join of TWO datasets over integer
    coordinates: emit (left_cols x right_cols) for every pair of closed
    boxes that intersect.  Both sides carry ``box_cols`` (int min-x/min-y/
    max-x/max-y; inverted boxes are empty and match nothing).

    Scale shape (100 TB): each box replicates only to the grid cells it
    covers (``cell_size`` bounds the fan-out); ONE union + groupby(cell)
    shuffle; per-cell candidates are verified with a vectorized
    all-pairs envelope test bounded by ``max_group_pairs`` (the same
    quadratic-expansion guard as crossmodal pair mining), and the
    reporting-point rule makes output exactly-once with no dedup pass.
    This is the 2-D analog of interval_join's bucket replication.

    Carried id columns (``left_cols`` / ``right_cols``) must be int64:
    the cross-side union pads the absent side with int64 nulls (checked
    per batch; widen the pad map here if another type is ever needed).
    """

    x0c, y0c, x1c, y1c = box_cols

    def _prep(keep_cols, side_val):
        def prep(batch: pa.Table) -> pa.Table:
            batch = batch.replace_schema_metadata(None)
            for c in keep_cols:
                if not pa.types.is_integer(batch.schema.field(c).type):
                    raise ValueError(
                        f"rect_join carried column {c!r} must be int64 "
                        f"(got {batch.schema.field(c).type}); the union pad "
                        "assumes integer ids"
                    )
            x0 = batch.column(x0c).to_numpy(zero_copy_only=False).astype(np.int64)
            y0 = batch.column(y0c).to_numpy(zero_copy_only=False).astype(np.int64)
            x1 = batch.column(x1c).to_numpy(zero_copy_only=False).astype(np.int64)
            y1 = batch.column(y1c).to_numpy(zero_copy_only=False).astype(np.int64)
            g = int(cell_size)
            cx0, cx1 = np.floor_divide(x0, g), np.floor_divide(x1, g)
            cy0, cy1 = np.floor_divide(y0, g), np.floor_divide(y1, g)
            rx = np.maximum(cx1 - cx0 + 1, 0)
            ry = np.maximum(cy1 - cy0 + 1, 0)
            reps = np.where((x1 >= x0) & (y1 >= y0), rx * ry, 0).astype(np.int64)
            idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
            k = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps
            )
            ryi = ry[idx]
            cx = cx0[idx] + k // np.maximum(ryi, 1)
            cy = cy0[idx] + k % np.maximum(ryi, 1)
            out = batch.select(list(keep_cols)).take(pa.array(idx))
            out = out.append_column("_x0", pa.array(x0[idx]))
            out = out.append_column("_y0", pa.array(y0[idx]))
            out = out.append_column("_x1", pa.array(x1[idx]))
            out = out.append_column("_y1", pa.array(y1[idx]))
            out = out.append_column("_cx", pa.array(cx))
            out = out.append_column("_cy", pa.array(cy))
            out = out.append_column(
                "_cell", pa.array((cx << np.int64(32)) ^ (cy & np.int64(0xFFFFFFFF)))
            )
            out = out.append_column(
                "_side", pa.array(np.full(len(idx), side_val, np.int8))
            )
            # pad the other side's columns so the union schemas align
            other = right_cols if side_val == 0 else left_cols
            for c in other:
                out = out.append_column(c, pa.nulls(len(idx), pa.int64()))
            return out.select(sorted(out.column_names))

        prep.__name__ = f"rect_prep_{'left' if side_val == 0 else 'right'}"
        return prep

    lp = left_ds.map_batches(_prep(left_cols, 0), batch_format="pyarrow")
    rp = right_ds.map_batches(_prep(right_cols, 1), batch_format="pyarrow")
    return lp.union(rp).groupby("_cell").map_groups(
        _RectCellGroup(cell_size, left_cols, right_cols, max_group_pairs,
                       weighted=weighted),
        batch_format="pyarrow",
    )


def segment_envelope_join(
    seg_ds,
    zones,  # dict of int64 arrays: zone_id, minx, miny, maxx, maxy
    seg_cols: tuple,
    coord_cols: tuple = ("x1", "y1", "x2", "y2"),
):
    """LINE-feature spatial join: emit (segment, zone) for every track
    segment that intersects a closed integer zone envelope — the
    line-geometry regime of the reference's spatial join (its canonical
    test corpus is exactly this shape: tornado_tracks lines vs polygon
    filters, test/src/main/java/.../TestUtils.java:459-562;
    analytics/spark/.../spatial/TieredSpatialJoin.java handles line
    features through the same tiered keying).

    Exact separating-axis test over integers, so results are
    SQL-replayable with zero float hazards: a segment and an axis-aligned
    box intersect iff (a) their x/y extents overlap (the box's two edge
    normals) and (b) the box has corners on BOTH sides of the segment's
    supporting line, i.e. min(cross) <= 0 <= max(cross) over the four
    corner cross products (the segment's edge normal).  Degenerate
    (point) segments reduce to point-in-box.  Touching counts as
    intersecting (closed geometry, matching ST_Intersects semantics).

    Scale shape (100 TB): ``zones`` is a configuration-scale side table
    broadcast once via ``ray.put`` (the capped-broadcast convention); the
    segment side STREAMS with no shuffle in this stage — the (n_seg,
    n_zones) mask work is vectorized per batch.  For a zone side too big
    to broadcast, ``rect_join`` over segment bounding boxes is the PBSM
    fallback (coarse), with this SAT verify applied per candidate pair.
    """
    import ray

    x1c, y1c, x2c, y2c = coord_cols
    zid = np.asarray(zones["zone_id"], dtype=np.int64)
    zx0 = np.asarray(zones["minx"], dtype=np.int64)
    zy0 = np.asarray(zones["miny"], dtype=np.int64)
    zx1 = np.asarray(zones["maxx"], dtype=np.int64)
    zy1 = np.asarray(zones["maxy"], dtype=np.int64)
    zref = ray.put((zid, zx0, zy0, zx1, zy1))

    def match(batch: pa.Table) -> pa.Table:
        zi, bx0, by0, bx1, by1 = ray.get(zref)
        x1 = batch.column(x1c).to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = batch.column(y1c).to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = batch.column(x2c).to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = batch.column(y2c).to_numpy(zero_copy_only=False).astype(np.int64)
        # box-axis overlap (n_seg, n_z)
        ok = (
            (np.maximum(x1, x2)[:, None] >= bx0[None, :])
            & (np.minimum(x1, x2)[:, None] <= bx1[None, :])
            & (np.maximum(y1, y2)[:, None] >= by0[None, :])
            & (np.minimum(y1, y2)[:, None] <= by1[None, :])
        )
        # segment-normal axis: corner cross products
        dx = (x2 - x1)[:, None]
        dy = (y2 - y1)[:, None]
        rx0 = bx0[None, :] - x1[:, None]
        rx1 = bx1[None, :] - x1[:, None]
        ry0 = by0[None, :] - y1[:, None]
        ry1 = by1[None, :] - y1[:, None]
        c00 = dx * ry0 - dy * rx0
        c01 = dx * ry1 - dy * rx0
        c10 = dx * ry0 - dy * rx1
        c11 = dx * ry1 - dy * rx1
        mn = np.minimum(np.minimum(c00, c01), np.minimum(c10, c11))
        mx = np.maximum(np.maximum(c00, c01), np.maximum(c10, c11))
        ok &= (mn <= 0) & (mx >= 0)
        si, ziidx = np.nonzero(ok)
        cols = {c: batch.column(c).take(pa.array(si)) for c in seg_cols}
        cols["zone_id"] = pa.array(zi[ziidx], type=pa.int64())
        return pa.table(cols)

    match.__name__ = "segment_envelope_match"
    return seg_ds.map_batches(match, batch_format="pyarrow")


def segment_crossings(
    seg_ds,
    cell_size: int,
    key_col: str = "user_id",
    coord_cols: tuple = ("x1", "y1", "x2", "y2"),
    max_group_pairs: int = 50_000_000,
):
    """Trajectory ENCOUNTER detection: count segment-segment
    intersections between DIFFERENT entities' track segments — the
    line-line regime of the reference's spatial join family (tracks vs
    tracks, e.g. crossing tornado_tracks; TieredSpatialJoin's geometry
    predicate specialized to LineString x LineString).

    Exact closed intersection over integers (CLRS orientation form):
    segments AB, CD intersect iff their bboxes overlap AND
    o1*o2 <= 0 AND o3*o4 <= 0 where o1 = cross(B-A, C-A),
    o2 = cross(B-A, D-A), o3 = cross(D-C, A-C), o4 = cross(D-C, B-C);
    the bbox term makes the collinear (all-zero) case exact.  Touching
    counts (closed geometry).  SQL-replayable with zero float hazards.

    Scale shape (100 TB): PBSM — each segment replicates only to the
    grid cells its bbox covers (short-step tracks -> O(1) cells each),
    ONE groupby(cell) shuffle, per-cell vectorized all-pairs under
    ``max_group_pairs``; the reporting-point rule (the overlap bbox's
    min corner names the unique owning cell) makes each crossing counted
    exactly once with no dedup pass.  Output is pre-aggregated per cell
    ((a, b, partial n) rows), so the final groupby moves entity-pair
    counts, not crossings.  Returns (user_a, user_b, n_crossings) with
    user_a < user_b.
    """
    from ray.data.aggregate import Sum

    x1c, y1c, x2c, y2c = coord_cols
    cs = int(cell_size)

    def cover(batch: pa.Table) -> pa.Table:
        x1 = batch.column(x1c).to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = batch.column(y1c).to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = batch.column(x2c).to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = batch.column(y2c).to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lox, hix = np.minimum(x1, x2), np.maximum(x1, x2)
        loy, hiy = np.minimum(y1, y2), np.maximum(y1, y2)
        cx0, cx1 = lox // cs, hix // cs
        cy0, cy1 = loy // cs, hiy // cs
        nx = (cx1 - cx0 + 1).astype(np.int64)
        ny = (cy1 - cy0 + 1).astype(np.int64)
        rep = nx * ny
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), rep)
        total = int(rep.sum())
        cum = np.concatenate(([0], np.cumsum(rep)[:-1]))
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum, rep)
        gx = cx0[idx] + intra % nx[idx]
        gy = cy0[idx] + intra // nx[idx]
        cell = (gx << np.int64(32)) ^ (gy & np.int64(0xFFFFFFFF))
        return pa.table(
            {
                "_cell": pa.array(cell),
                key_col: pa.array(key[idx]),
                "x1": pa.array(x1[idx]),
                "y1": pa.array(y1[idx]),
                "x2": pa.array(x2[idx]),
                "y2": pa.array(y2[idx]),
                "lox": pa.array(lox[idx]),
                "loy": pa.array(loy[idx]),
            }
        )

    cover.__name__ = "crossing_cell_cover"
    covered = seg_ds.map_batches(cover, batch_format="pyarrow")

    class _CellCross:
        __name__ = "crossing_cell_group"

        def __call__(self, group: pa.Table) -> pa.Table:
            n = len(group)
            empty = pa.table(
                {
                    "user_a": pa.array([], pa.int64()),
                    "user_b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
            if n < 2:
                return empty
            if n * (n - 1) // 2 > max_group_pairs:
                # skew guard: a hot cell is a DATA property (all tracks
                # through one plaza); refuse the quadratic blowup rather
                # than OOM — shrink cell_size or pre-salt the hot region
                raise ValueError(
                    f"segment_crossings cell exceeds max_group_pairs "
                    f"({n} segments); shrink cell_size"
                )
            key = group.column(key_col).to_numpy(zero_copy_only=False)
            x1 = group.column("x1").to_numpy(zero_copy_only=False)
            y1 = group.column("y1").to_numpy(zero_copy_only=False)
            x2 = group.column("x2").to_numpy(zero_copy_only=False)
            y2 = group.column("y2").to_numpy(zero_copy_only=False)
            lox = group.column("lox").to_numpy(zero_copy_only=False)
            loy = group.column("loy").to_numpy(zero_copy_only=False)
            hix = np.maximum(x1, x2)
            hiy = np.maximum(y1, y2)
            cell = int(group.column("_cell")[0].as_py())
            cellx = np.int64(cell) >> np.int64(32)
            celly = (np.int64(cell) << np.int64(32)) >> np.int64(32)  # sign-restore
            # i-CHUNKED all-pairs: memory stays O(chunk * n) however hot
            # the cell (5k segments in one cell must not build a 26M-pair
            # index matrix at once)
            chunk = max(1, min(n, 2_000_000 // max(n, 1) + 1))
            pair_keys: list[np.ndarray] = []
            for i0 in range(0, n - 1, chunk):
                i1 = min(i0 + chunk, n - 1)
                ib = np.arange(i0, i1, dtype=np.int64)[:, None]
                jb = np.arange(n, dtype=np.int64)[None, :]
                m = (jb > ib) & (key[ib] != key[jb])
                m &= (
                    (hix[ib] >= lox[jb]) & (lox[ib] <= hix[jb])
                    & (hiy[ib] >= loy[jb]) & (loy[ib] <= hiy[jb])
                )
                # reporting point: overlap bbox min corner owns the pair
                rx = np.maximum(lox[ib], lox[jb])
                ry = np.maximum(loy[ib], loy[jb])
                m &= (rx // cs == cellx) & (ry // cs == celly)
                ii, jj = np.nonzero(m)
                if len(ii) == 0:
                    continue
                ii = ii + i0
                dxa = x2[ii] - x1[ii]
                dya = y2[ii] - y1[ii]
                o1 = dxa * (y1[jj] - y1[ii]) - dya * (x1[jj] - x1[ii])
                o2 = dxa * (y2[jj] - y1[ii]) - dya * (x2[jj] - x1[ii])
                dxb = x2[jj] - x1[jj]
                dyb = y2[jj] - y1[jj]
                o3 = dxb * (y1[ii] - y1[jj]) - dyb * (x1[ii] - x1[jj])
                o4 = dxb * (y2[ii] - y1[jj]) - dyb * (x2[ii] - x1[jj])
                hit = (o1 * o2 <= 0) & (o3 * o4 <= 0)
                ii, jj = ii[hit], jj[hit]
                if len(ii):
                    ua = np.minimum(key[ii], key[jj]).astype(np.int64)
                    ub = np.maximum(key[ii], key[jj]).astype(np.int64)
                    pair_keys.append((ua << np.int64(32)) + ub)
            if not pair_keys:
                return empty
            pair, cnt = np.unique(np.concatenate(pair_keys), return_counts=True)
            return pa.table(
                {
                    "user_a": pa.array(pair >> np.int64(32)),
                    "user_b": pa.array((pair << np.int64(32)) >> np.int64(32)),
                    "n": pa.array(cnt.astype(np.int64)),
                }
            )

    partial = covered.groupby("_cell").map_groups(_CellCross(), batch_format="pyarrow")
    return partial.groupby(["user_a", "user_b"]).aggregate(
        Sum("n", alias_name="n_crossings")
    )


def segment_polygon_join(
    seg_ds,
    polys: dict,  # pid (P,), verts (P, mx, 2) int64, m (P,), bx0/by0/bx1/by1 (P,)
    seg_cols: tuple,
    coord_cols: tuple = ("x1", "y1", "x2", "y2"),
):
    """EXACT line x polygon spatial join over integers: a segment
    matches a simple polygon iff either endpoint is inside (integer
    ray-cast with cross-multiplied comparisons — no division) or the
    segment crosses any polygon edge (sign-form closed orientation
    test; no o*o products, so coordinates up to ~1e6 stay far from
    int64 overflow).  This is the LineString regime of the reference's
    fine SpatialQueryFilter (SpatialQueryFilter.java:47-156 — JTS
    prepared-geometry intersects) — its canonical test corpus is
    exactly this join (tornado_tracks lines vs polygon filters,
    TestUtils.java:459-562).

    Scale shape: ``polys`` is a configuration-scale layer broadcast via
    ray.put; the bbox candidate mask is (n_seg, P) vectorized, and the
    exact per-edge work runs only on CSR-expanded candidate pairs.
    The segment side STREAMS — no shuffle."""
    import ray

    x1c, y1c, x2c, y2c = coord_cols
    pref = ray.put(
        (
            np.asarray(polys["pid"], np.int64),
            np.asarray(polys["verts"], np.int64),
            np.asarray(polys["m"], np.int64),
            np.asarray(polys["bx0"], np.int64),
            np.asarray(polys["by0"], np.int64),
            np.asarray(polys["bx1"], np.int64),
            np.asarray(polys["by1"], np.int64),
        )
    )

    def _crossings(px, py, ax, ay, bx, by, valid):
        """Integer ray-cast toward +x: edge crossed by the horizontal ray
        from (px, py)?  Division-free (cross-multiplied intersect)."""
        cond = (ay > py) != (by > py)
        d = by - ay
        lhs = (px - ax) * d
        rhs = (bx - ax) * (py - ay)
        cr = np.where(d > 0, lhs < rhs, lhs > rhs)
        return cond & cr & valid

    def match(batch: pa.Table) -> pa.Table:
        pid, verts, m, bx0, by0, bx1, by1 = ray.get(pref)
        P, mx, _ = verts.shape
        x1 = batch.column(x1c).to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = batch.column(y1c).to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = batch.column(x2c).to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = batch.column(y2c).to_numpy(zero_copy_only=False).astype(np.int64)
        lox, hix = np.minimum(x1, x2), np.maximum(x1, x2)
        loy, hiy = np.minimum(y1, y2), np.maximum(y1, y2)
        cand = (
            (hix[:, None] >= bx0[None, :])
            & (lox[:, None] <= bx1[None, :])
            & (hiy[:, None] >= by0[None, :])
            & (loy[:, None] <= by1[None, :])
        )
        si, pj = np.nonzero(cand)
        if len(si) == 0:
            cols = {c: batch.column(c).take(pa.array([], pa.int64())) for c in seg_cols}
            cols["pid"] = pa.array([], pa.int64())
            return pa.table(cols)
        par1 = np.zeros(len(si), dtype=bool)
        par2 = np.zeros(len(si), dtype=bool)
        anyx = np.zeros(len(si), dtype=bool)
        X1, Y1, X2, Y2 = x1[si], y1[si], x2[si], y2[si]
        LOX, HIX, LOY, HIY = lox[si], hix[si], loy[si], hiy[si]
        for k in range(mx):
            valid = m[pj] > k
            ax, ay = verts[pj, k, 0], verts[pj, k, 1]
            kn = np.where(k + 1 >= m[pj], 0, min(k + 1, mx - 1))
            bx = verts[pj, kn, 0]
            by = verts[pj, kn, 1]
            par1 ^= _crossings(X1, Y1, ax, ay, bx, by, valid)
            par2 ^= _crossings(X2, Y2, ax, ay, bx, by, valid)
            # closed segment-segment intersection, sign form
            dxa, dya = X2 - X1, Y2 - Y1
            o1 = dxa * (ay - Y1) - dya * (ax - X1)
            o2 = dxa * (by - Y1) - dya * (bx - X1)
            dxb, dyb = bx - ax, by - ay
            o3 = dxb * (Y1 - ay) - dyb * (X1 - ax)
            o4 = dxb * (Y2 - ay) - dyb * (X2 - ax)
            s12 = ((o1 <= 0) & (o2 >= 0)) | ((o1 >= 0) & (o2 <= 0))
            s34 = ((o3 <= 0) & (o4 >= 0)) | ((o3 >= 0) & (o4 <= 0))
            bb = (
                (np.maximum(ax, bx) >= LOX)
                & (np.minimum(ax, bx) <= HIX)
                & (np.maximum(ay, by) >= LOY)
                & (np.minimum(ay, by) <= HIY)
            )
            anyx |= s12 & s34 & bb & valid
        hit = par1 | par2 | anyx
        si, pj = si[hit], pj[hit]
        cols = {c: batch.column(c).take(pa.array(si)) for c in seg_cols}
        cols["pid"] = pa.array(pid[pj])
        return pa.table(cols)

    match.__name__ = "segment_polygon_match"
    return seg_ds.map_batches(match, batch_format="pyarrow")


def points_within_segments(
    pts_ds,
    segs: dict,  # x1, y1, x2, y2 int64 arrays (the corridor polyline)
    dist: int,
    point_cols: tuple,
    coord_cols: tuple = ("ix", "iy"),
):
    """Buffered-POLYLINE containment (corridor query): keep points
    within ``dist`` of ANY segment of a broadcast polyline — the
    line-geometry form of the reference's DWITHIN
    (GeomWithinDistance.java applied to LineString constraints; the
    point form is cql_dwithin).  Exact integer point-to-segment
    distance with NO division: the perpendicular case compares
    cross^2 <= dist^2 * len^2 (endpoint cases compare squared
    distances directly), so results are SQL-replayable.

    Scale shape: the corridor is configuration-scale (broadcast once);
    the point side streams — a bbox-expanded candidate mask prunes the
    (n_pts, n_segs) work before the exact kernel."""
    import ray

    x1 = np.asarray(segs["x1"], np.int64)
    y1 = np.asarray(segs["y1"], np.int64)
    x2 = np.asarray(segs["x2"], np.int64)
    y2 = np.asarray(segs["y2"], np.int64)
    sref = ray.put((x1, y1, x2, y2))
    d = int(dist)
    xc, yc = coord_cols

    def within(batch: pa.Table) -> pa.Table:
        ax, ay, bx, by = ray.get(sref)
        px = batch.column(xc).to_numpy(zero_copy_only=False).astype(np.int64)[:, None]
        py = batch.column(yc).to_numpy(zero_copy_only=False).astype(np.int64)[:, None]
        lox = np.minimum(ax, bx)[None, :] - d
        hix = np.maximum(ax, bx)[None, :] + d
        loy = np.minimum(ay, by)[None, :] - d
        hiy = np.maximum(ay, by)[None, :] + d
        cand = (px >= lox) & (px <= hix) & (py >= loy) & (py <= hiy)
        dx = (bx - ax)[None, :]
        dy = (by - ay)[None, :]
        rx = px - ax[None, :]
        ry = py - ay[None, :]
        dot = rx * dx + ry * dy
        len2 = (dx * dx + dy * dy).astype(np.int64)
        d2 = np.int64(d) * np.int64(d)
        end_a = (rx * rx + ry * ry) <= d2
        sx = px - bx[None, :]
        sy = py - by[None, :]
        end_b = (sx * sx + sy * sy) <= d2
        cross = dx * ry - dy * rx
        mid = cross * cross <= d2 * len2
        hit = np.where(dot <= 0, end_a, np.where(dot >= len2, end_b, mid))
        keep = (cand & hit).any(axis=1)
        return batch.select(list(point_cols)).filter(pa.array(keep))

    within.__name__ = "corridor_within"
    return pts_ds.map_batches(within, batch_format="pyarrow")


def nearest_envelope(
    pts_ds,
    zones: dict,
    x_col: str,
    y_col: str,
    keep_cols: tuple = (),
):
    """Nearest-FEATURE join (reverse geocode): every point gets the id of
    the closest zone envelope — exact integer box distance
    dx = max(0, minx - x, x - maxx) (0 inside), argmin over zones with
    ties to the smallest zone id.  The nearest-neighbor query surface of
    the reference applied to polygon features (NNMapReduce
    analytics/.../nn/NNMapReduce.java with non-point features; distance
    to a geometry's envelope is JTS Envelope.distance).

    ``zones`` is a dict of aligned arrays (zone_id, minx, miny, maxx,
    maxy) — configuration-scale, broadcast once via ray.put and read per
    worker.  Map-only, no shuffle.  For feature sets past broadcast
    scale the knn_join cell-cover + ring-escalation regime applies
    instead (stages/knn.py).
    """
    import ray

    from .util import stage_fn

    zref = ray.put(
        (
            np.asarray(zones["zone_id"], dtype=np.int64),
            np.asarray(zones["minx"], dtype=np.int64),
            np.asarray(zones["miny"], dtype=np.int64),
            np.asarray(zones["maxx"], dtype=np.int64),
            np.asarray(zones["maxy"], dtype=np.int64),
        )
    )

    class _Nearest:
        def __init__(self):
            zid, minx, miny, maxx, maxy = ray.get(zref)
            o = np.argsort(zid, kind="stable")  # argmin first-wins => id order
            self.zid, self.minx, self.miny = zid[o], minx[o], miny[o]
            self.maxx, self.maxy = maxx[o], maxy[o]

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = batch.column(x_col).to_numpy(zero_copy_only=False)[:, None]
            y = batch.column(y_col).to_numpy(zero_copy_only=False)[:, None]
            zero = np.int64(0)
            dx = np.maximum(zero, np.maximum(self.minx[None, :] - x, x - self.maxx[None, :]))
            dy = np.maximum(zero, np.maximum(self.miny[None, :] - y, y - self.maxy[None, :]))
            d2 = dx * dx + dy * dy
            k = np.argmin(d2, axis=1)  # first min == smallest zone index/id
            cols = {c: batch.column(c) for c in keep_cols}
            cols["zone_id"] = pa.array(self.zid[k])
            cols["d2"] = pa.array(d2[np.arange(len(k)), k])
            return pa.table(cols)

    return pts_ds.map_batches(stage_fn(_Nearest), batch_format="pyarrow")

"""Sources / sinks beyond parquet.

Reference sinks: vector export (VectorLocalExportCommand — Avro), CSV query
output (CSVQueryOutputFormat), GeoServer render path (out of scope).  Here:

- ``write_csv`` / ``write_json`` thin wrappers (Ray Data natives)
- ``write_geojson`` — vector rows (lon/lat or wkb) -> GeoJSON
  FeatureCollection files, one per block (streaming, never one giant file)
- ``read_geojson`` — FeatureCollection file(s) -> Dataset of
  (properties..., wkb) rows
- ``write_partitioned_by_cell`` — the engine's canonical keyed layout:
  parquet partitioned by tier + cell prefix so range scans prune files and
  failed runs resume per partition (SURVEY §4 split/resume design).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..geom.wkb import LineString, MultiGeometry, Point, Polygon, parse_wkb, to_wkb

__all__ = [
    "write_geojson",
    "read_geojson",
    "write_partitioned_by_cell",
    "geometry_to_geojson",
    "geojson_to_geometry",
]


def geometry_to_geojson(g) -> dict:
    if isinstance(g, Point):
        return {"type": "Point", "coordinates": [g.x, g.y]}
    if isinstance(g, LineString):
        return {"type": "LineString", "coordinates": g.coords.tolist()}
    if isinstance(g, Polygon):
        return {
            "type": "Polygon",
            "coordinates": [r.tolist() for r in g.rings],
        }
    if isinstance(g, MultiGeometry):
        kinds = {type(p) for p in g.parts}
        if kinds == {Polygon}:
            return {
                "type": "MultiPolygon",
                "coordinates": [[r.tolist() for r in p.rings] for p in g.parts],
            }
        return {
            "type": "GeometryCollection",
            "geometries": [geometry_to_geojson(p) for p in g.parts],
        }
    raise TypeError(type(g))


def geojson_to_geometry(obj: dict):
    t = obj["type"]
    if t == "Point":
        return Point(*obj["coordinates"][:2])
    if t == "LineString":
        return LineString(np.asarray(obj["coordinates"], dtype=np.float64))
    if t == "Polygon":
        rings = [np.asarray(r, dtype=np.float64) for r in obj["coordinates"]]
        return Polygon(rings[0], rings[1:])
    if t == "MultiPolygon":
        return MultiGeometry(
            [
                Polygon(
                    np.asarray(rings[0], dtype=np.float64),
                    [np.asarray(r, dtype=np.float64) for r in rings[1:]],
                )
                for rings in obj["coordinates"]
            ]
        )
    if t == "GeometryCollection":
        return MultiGeometry([geojson_to_geometry(g) for g in obj["geometries"]])
    raise ValueError(t)


def write_geojson(ds, out_dir: str, wkb_col: str | None = "wkb", lon_col="lon", lat_col="lat"):
    """Stream a Dataset to GeoJSON FeatureCollection files (one per block)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table, *, _dir=out_dir) -> pa.Table:
        import uuid

        feats = []
        cols = batch.column_names
        use_wkb = wkb_col is not None and wkb_col in cols
        for i in range(len(batch)):
            props = {
                c: batch.column(c)[i].as_py()
                for c in cols
                if c not in (wkb_col, lon_col, lat_col)
                and not isinstance(batch.column(c)[i].as_py(), (bytes, bytearray))
            }
            if use_wkb:
                geom = geometry_to_geojson(parse_wkb(batch.column(wkb_col)[i].as_py()))
            else:
                geom = {
                    "type": "Point",
                    "coordinates": [
                        batch.column(lon_col)[i].as_py(),
                        batch.column(lat_col)[i].as_py(),
                    ],
                }
            feats.append({"type": "Feature", "geometry": geom, "properties": props})
        path = os.path.join(_dir, f"part-{uuid.uuid4().hex}.geojson")
        with open(path, "w") as f:
            json.dump({"type": "FeatureCollection", "features": feats}, f)
        return pa.table({"path": pa.array([path]), "rows": pa.array([len(feats)])})

    write_block.__name__ = "write_geojson_block"
    return ds.map_batches(write_block, batch_format="pyarrow").to_pandas()


def read_geojson(paths: str | list[str]):
    """GeoJSON FeatureCollection(s) -> Dataset of properties + wkb."""
    import ray

    if isinstance(paths, str):
        paths = (
            [os.path.join(paths, f) for f in sorted(os.listdir(paths)) if f.endswith(".geojson")]
            if os.path.isdir(paths)
            else [paths]
        )

    def load(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch.column("path").to_pylist():
            with open(p) as f:
                fc = json.load(f)
            for feat in fc["features"]:
                row = dict(feat.get("properties") or {})
                row["wkb"] = to_wkb(geojson_to_geometry(feat["geometry"]))
                rows.append(row)
        if not rows:
            return pa.table({"wkb": pa.array([], type=pa.binary())})
        keys = sorted({k for r in rows for k in r})
        return pa.table(
            {
                k: pa.array(
                    [r.get(k) for r in rows],
                    type=pa.binary() if k == "wkb" else None,
                )
                for k in keys
            }
        )

    load.__name__ = "read_geojson_files"
    return ray.data.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow"
    )


def write_partitioned_by_cell(
    ds, root: str, prefix_bits: int = 8, bits: int = 31, cell_bits_of=None
):
    """Write (tier, cell, ...) rows as parquet partitioned by tier and a
    cell prefix — the resumable keyed layout for range-pruned scans.
    ``cell_bits_of(tier)`` gives each tier's cell-id bit width (default
    2*tier, the tiered-Hilbert rule; the XZHierarchical strategy supplies
    its own widths for the point/XZ tiers)."""
    import pyarrow.dataset  # noqa: F401

    # vectorized per-tier bit widths via a lookup table (tiers < 256)
    lut = np.array(
        [
            (cell_bits_of(t) if cell_bits_of is not None else 2 * t)
            for t in range(256)
        ],
        dtype=np.int64,
    )

    def add_prefix(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        tier = batch.column("tier").to_numpy(zero_copy_only=False).astype(np.int64)
        # prefix on the tier's OWN bits: coarse tiers keep prefix == full
        # cell (prunable per coarse cell)
        shift = np.clip(lut[tier] - 2 * prefix_bits, 0, None).astype(np.uint64)
        return batch.append_column(
            "cell_prefix", pa.array((cell >> shift).astype(np.int64))
        )

    add_prefix.__name__ = "add_cell_prefix"
    keyed = ds.map_batches(add_prefix, batch_format="pyarrow")
    keyed.write_parquet(root, partition_cols=["tier", "cell_prefix"])
    return root

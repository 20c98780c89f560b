"""GeoStore facade: ingest -> keyed layout + stats; pruned query parity."""

import os

import numpy as np
import pytest

from geowave_ray.geom.wkb import box_polygon
from geowave_ray.query.planner import SpatialQuery
from geowave_ray.sources.images import synth_images_table
from geowave_ray.store import GeoStore


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    import ray

    root = str(tmp_path_factory.mktemp("store") / "images")
    t = synth_images_table(3000, with_bytes=False)
    s = GeoStore(root, prefix_bits=6)
    stats = s.ingest(ray.data.from_arrow(t).repartition(4))
    return s, t, stats


def test_ingest_layout_and_stats(store):
    s, t, stats = store
    assert stats.count == 3000
    assert os.path.exists(os.path.join(s.root, "_stats.json"))
    tiers = [d for d in os.listdir(s.root) if d.startswith("tier=")]
    assert tiers == ["tier=31"]  # points land on the finest tier
    prefixes = os.listdir(os.path.join(s.root, "tier=31"))
    assert len(prefixes) > 8  # spread over many prefix partitions


def test_pruned_query_matches_full_scan(store):
    s, t, _ = store
    q = SpatialQuery(box_polygon(-20, 20, 30, 55))
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    want = set(
        np.asarray(t.column("image_id").to_pylist())[
            (lon >= -20) & (lon <= 30) & (lat >= 20) & (lat <= 55)
        ]
    )
    out = s.query(q, columns=["image_id"]).to_pandas()
    assert set(out["image_id"]) == want
    # pruning actually happened: fewer dirs scanned than exist
    assert len(s._pruned_paths(q)) < len(
        os.listdir(os.path.join(s.root, "tier=31"))
    )


def test_polygon_query_refinement(store):
    s, t, _ = store
    # a triangle: coarse bbox passes more than the fine refine keeps
    from geowave_ray.geom.wkb import Polygon

    tri = Polygon(
        np.array([[0, 0], [40, 0], [0, 40], [0, 0]], dtype=np.float64)
    )
    q = SpatialQuery(tri)
    out = s.query(q, columns=["image_id"]).to_pandas()
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    from geowave_ray.geom.predicates import points_in_polygon

    want = set(
        np.asarray(t.column("image_id").to_pylist())[points_in_polygon(lon, lat, tri)]
    )
    assert set(out["image_id"]) == want
    # bbox-only would include more
    bbox_n = int(((lon >= 0) & (lon <= 40) & (lat >= 0) & (lat <= 40)).sum())
    assert len(want) < bbox_n


def test_data_id_lookup(store):
    s, t, _ = store
    ids = t.column("image_id").to_pylist()[10:13]
    out = s.lookup(ids).to_pandas()
    assert sorted(out["image_id"]) == sorted(ids)


def test_dataclass_adapter_roundtrip():
    import dataclasses
    import datetime

    import numpy as np

    from geowave_ray.adapter import DataTypeAdapter
    from geowave_ray.geom.wkb import Geometry, Point

    @dataclasses.dataclass
    class Feature:
        fid: int
        name: str
        score: float
        geom: Geometry

    ad = DataTypeAdapter(Feature)
    assert ad.schema.names == ["fid", "name", "score", "geom"]
    rows = [
        Feature(1, "a", 0.5, Point(1.0, 2.0)),
        Feature(2, "b", 1.5, Point(-3.0, 4.0)),
    ]
    table = ad.to_table(rows)
    assert table.schema.field("geom").type == "binary"
    back = ad.from_table(table)
    assert back[0].fid == 1 and back[1].name == "b"
    assert isinstance(back[0].geom, Point) and back[0].geom.x == 1.0


def test_whole_world_query_wide_prefix_span(store):
    """Regression (round-2 ADVICE): a finest-tier range spanning >4096
    prefixes marks the tier whole-tier; later narrow ranges at the same
    tier must not .update() the None marker."""
    s, t, _ = store
    q = SpatialQuery(box_polygon(-180, -90, 180, 90))
    out = s.query(q, columns=["image_id"]).to_pandas()
    assert len(out) == 3000


def test_store_lookup_by_id(store):
    s, t, _ = store
    ids = t.column("image_id").to_pylist()[:5]
    out = s.lookup(ids).to_pandas()
    assert sorted(out["image_id"]) == sorted(ids)

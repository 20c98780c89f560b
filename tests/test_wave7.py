"""Wave-7 operators: geofence transitions, segment-envelope (line) join,
and the text/vocab additions — brute-force parity on small inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _zones(n=12, seed=3):
    rng = np.random.default_rng(seed)
    minx = rng.integers(-50, 30, n)
    miny = rng.integers(-40, 20, n)
    return {
        "zone_id": np.arange(n, dtype=np.int64),
        "minx": minx,
        "miny": miny,
        "maxx": minx + rng.integers(5, 40, n),
        "maxy": miny + rng.integers(5, 30, n),
    }


def test_geofence_transitions_brute(ray_session):
    import ray

    from geowave_ray.stages.analytics import geofence_transitions

    rng = np.random.default_rng(11)
    n = 600
    tbl = pa.table(
        {
            "uid": pa.array(rng.integers(0, 12, n)),
            "ts": pa.array(rng.integers(0, 40, n)),
            "oid": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.integers(-60, 60, n)),
            "y": pa.array(rng.integers(-50, 40, n)),
        }
    )
    z = _zones()
    out = (
        geofence_transitions(
            ray.data.from_arrow(tbl).repartition(5), z, "uid", "ts", "x", "y", "oid"
        )
        .to_pandas()
        .sort_values(["uid", "oid"])
        .reset_index(drop=True)
    )

    # brute force
    def assign(x, y):
        for i in range(len(z["zone_id"])):
            if z["minx"][i] <= x <= z["maxx"][i] and z["miny"][i] <= y <= z["maxy"][i]:
                return int(z["zone_id"][i])
        return -1

    import pandas as pd

    df = tbl.to_pandas()
    rows = []
    for uid, g in df.groupby("uid"):
        g = g.sort_values(["ts", "oid"])
        zs = [assign(r.x, r.y) for r in g.itertuples()]
        for k in range(1, len(zs)):
            if zs[k] != zs[k - 1]:
                rows.append(
                    (uid, g.iloc[k]["oid"], zs[k - 1], zs[k])
                )
    exp = (
        pd.DataFrame(rows, columns=["uid", "oid", "from_zone", "to_zone"])
        .sort_values(["uid", "oid"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    for c in ["uid", "oid", "from_zone", "to_zone"]:
        assert np.array_equal(out[c].to_numpy().astype(np.int64), exp[c].to_numpy().astype(np.int64)), c


def _seg_box_intersects(x1, y1, x2, y2, bx0, by0, bx1, by1):
    """Reference predicate: closed segment vs closed box, exact."""
    if max(x1, x2) < bx0 or min(x1, x2) > bx1:
        return False
    if max(y1, y2) < by0 or min(y1, y2) > by1:
        return False
    dx, dy = x2 - x1, y2 - y1
    cr = [
        dx * (cy - y1) - dy * (cx - x1)
        for cx in (bx0, bx1)
        for cy in (by0, by1)
    ]
    return min(cr) <= 0 <= max(cr)


def test_segment_envelope_join_brute(ray_session):
    import ray

    from geowave_ray.stages.join import segment_envelope_join

    rng = np.random.default_rng(7)
    n = 400
    tbl = pa.table(
        {
            "sid": pa.array(np.arange(n, dtype=np.int64)),
            "x1": pa.array(rng.integers(-80, 80, n)),
            "y1": pa.array(rng.integers(-60, 60, n)),
            "x2": pa.array(rng.integers(-80, 80, n)),
            "y2": pa.array(rng.integers(-60, 60, n)),
        }
    )
    # include degenerate point segments
    tbl = tbl.set_column(3, "x2", pc_if(tbl))
    z = _zones(10, seed=5)
    out = (
        segment_envelope_join(
            ray.data.from_arrow(tbl).repartition(4), z, ("sid",)
        )
        .to_pandas()
        .sort_values(["sid", "zone_id"])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    exp = []
    for r in df.itertuples():
        for i in range(len(z["zone_id"])):
            if _seg_box_intersects(
                r.x1, r.y1, r.x2, r.y2,
                z["minx"][i], z["miny"][i], z["maxx"][i], z["maxy"][i],
            ):
                exp.append((r.sid, int(z["zone_id"][i])))
    exp.sort()
    assert len(out) == len(exp)
    got = list(zip(out["sid"].tolist(), out["zone_id"].tolist()))
    assert got == exp


def pc_if(tbl):
    """Make every 10th segment degenerate (point): x2=x1, keeps y2 as-is."""
    x1 = tbl.column("x1").to_numpy()
    x2 = tbl.column("x2").to_numpy().copy()
    x2[::10] = x1[::10]
    return pa.array(x2)


def test_sniff_image_meta_headers_only():
    from geowave_ray.stages.imaging import encode_image, sniff_image_meta
    from geowave_ray.stages.jpeg import jpeg_encode

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (24, 17, 3), dtype=np.uint8)
    assert sniff_image_meta(encode_image(arr, "png")) == ("png", 17, 24, 3)
    assert sniff_image_meta(encode_image(arr, "fjpg")) == ("fjpg", 17, 24, 3)
    assert sniff_image_meta(encode_image(arr, "jpeg"))[:3] == ("jpeg", 17, 24)
    # progressive stream: dims still come from SOF2 without a scan decode
    prog = jpeg_encode(arr, progressive=True)
    assert sniff_image_meta(prog) == ("jpeg", 17, 24, 3)
    # sniff must not touch pixels: truncate right after the SOF segment
    full = encode_image(arr, "jpeg")
    sos = full.find(b"\xff\xda")
    assert sniff_image_meta(full[:sos] + b"\xff\xd9") == ("jpeg", 17, 24, 3)
    with pytest.raises(NotImplementedError):
        sniff_image_meta(b"GIF89a\x00\x00")


def test_vocab_oov_brute(ray_session):
    import ray
    from collections import Counter

    from geowave_ray.stages.text import vocab_oov

    docs = [
        "the cat sat on the mat",
        "a dog and a cat",
        "Zebras zig, zag; the-end!",
        "",  # zero tokens: skipped
        "cat cat cat unknownword",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})
    out = (
        vocab_oov(ray.data.from_arrow(tbl).repartition(3), "text", "doc_id", 3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    import re
    toks_per_doc = [
        [t for t in re.split("[^a-z0-9]+", d.lower()) if t] for d in docs
    ]
    cnt = Counter(t for ts in toks_per_doc for t in ts)
    vocab = set(t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    exp = [
        (i, len(ts), sum(1 for t in ts if t not in vocab))
        for i, ts in enumerate(toks_per_doc) if ts
    ]
    got = list(zip(out["doc_id"], out["n_tokens"], out["n_oov"]))
    assert [tuple(map(int, g)) for g in got] == exp


def test_bpe_pair_counts_brute(ray_session):
    import ray
    from collections import Counter

    from geowave_ray.stages.text import bpe_pair_counts

    docs = ["banana bandana", "an anna banana!", "x", ""]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})
    out = bpe_pair_counts(
        ray.data.from_arrow(tbl).repartition(2), "text", "doc_id", top_k=5
    ).to_pandas()
    import re
    c = Counter()
    for d in docs:
        for t in re.split("[^a-z0-9]+", d.lower()):
            for i in range(len(t) - 1):
                c[t[i : i + 2]] += 1
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(out["pair"].tolist(), out["cnt"].astype(int).tolist()))
    assert got == exp


def test_normalize_urls_edges():
    from geowave_ray.stages.text import normalize_urls

    urls = [
        "HTTPS://WWW.Sub1.Site9.CO.UK/a/b/?utm_source=x&keep=1&utm_medium=y#frag",
        "http://site.com/",
        "https://www.example.org/p?fbclid=zzz",
        "example.com/x?a=1&utm_z=9",
        "https://a.b.co.jp/deep/path///",
    ]
    u, d = normalize_urls(pa.array(urls))
    assert u.to_pylist() == [
        "sub1.site9.co.uk/a/b/?keep=1",
        "site.com",
        "example.org/p",
        "example.com/x?a=1",
        "a.b.co.jp/deep/path",
    ]
    assert d.to_pylist() == [
        "site9.co.uk",
        "site.com",
        "example.org",
        "example.com",
        "b.co.jp",
    ]


def test_segment_crossings_brute(ray_session):
    import ray
    from collections import Counter

    from geowave_ray.stages.join import segment_crossings

    rng = np.random.default_rng(19)
    n = 500
    x1 = rng.integers(-300, 300, n)
    y1 = rng.integers(-300, 300, n)
    x2 = x1 + rng.integers(-60, 61, n)
    y2 = y1 + rng.integers(-60, 61, n)
    x2[::17] = x1[::17]  # degenerate points
    y2[::17] = y1[::17]
    uid = rng.integers(0, 9, n)
    tbl = pa.table(
        {"user_id": pa.array(uid.astype(np.int64)),
         "x1": pa.array(x1), "y1": pa.array(y1),
         "x2": pa.array(x2), "y2": pa.array(y2)}
    )
    out = segment_crossings(
        ray.data.from_arrow(tbl).repartition(4), 64, "user_id"
    ).to_pandas()
    got = {(int(r.user_a), int(r.user_b)): int(r.n_crossings) for r in out.itertuples()}

    def inter(i, j):
        if max(x1[i], x2[i]) < min(x1[j], x2[j]) or max(x1[j], x2[j]) < min(x1[i], x2[i]):
            return False
        if max(y1[i], y2[i]) < min(y1[j], y2[j]) or max(y1[j], y2[j]) < min(y1[i], y2[i]):
            return False
        dxa, dya = int(x2[i] - x1[i]), int(y2[i] - y1[i])
        o1 = dxa * (y1[j] - y1[i]) - dya * (x1[j] - x1[i])
        o2 = dxa * (y2[j] - y1[i]) - dya * (x2[j] - x1[i])
        dxb, dyb = int(x2[j] - x1[j]), int(y2[j] - y1[j])
        o3 = dxb * (y1[i] - y1[j]) - dyb * (x1[i] - x1[j])
        o4 = dxb * (y2[i] - y1[j]) - dyb * (x2[i] - x1[j])
        return o1 * o2 <= 0 and o3 * o4 <= 0

    exp = Counter()
    for i in range(n):
        for j in range(i + 1, n):
            if uid[i] != uid[j] and inter(i, j):
                a, b = sorted((int(uid[i]), int(uid[j])))
                exp[(a, b)] += 1
    assert got == dict(exp)


def test_contour_case_topology():
    """Marching-squares invariants on constructed rasters: a half-plane
    yields only vertical-edge blocks (code 10 = TR+BR), a checkerboard
    yields only diagonal saddles (codes 6/9)."""
    b = np.zeros((8, 8), np.int64)
    b[:, 4:] = 1
    code = b[:-1, :-1] + 2 * b[:-1, 1:] + 4 * b[1:, :-1] + 8 * b[1:, 1:]
    vals, cnts = np.unique(code, return_counts=True)
    assert set(vals.tolist()) == {0, 10, 15}
    assert cnts[vals == 10][0] == 7  # one boundary block per row

    cb = (np.indices((8, 8)).sum(axis=0) % 2).astype(np.int64)
    code = cb[:-1, :-1] + 2 * cb[:-1, 1:] + 4 * cb[1:, :-1] + 8 * cb[1:, 1:]
    assert set(np.unique(code).tolist()) == {6, 9}


def test_ring_self_intersections_known():
    from geowave_ray.geom.measures import ring_self_intersections

    # square (valid), bowtie (1 crossing), square with duplicate-ish
    # touching vertex chain
    sq = [(0, 0), (10, 0), (10, 10), (0, 10)]
    bow = [(0, 0), (10, 10), (10, 0), (0, 10)]
    verts = np.zeros((2, 4, 2), np.int64)
    verts[0] = sq
    verts[1] = bow
    m = np.array([4, 4], np.int64)
    out = ring_self_intersections(verts, m)
    assert out.tolist() == [0, 1]
    # pentagon star (self-intersecting 5-point star: 5 crossings)
    star = np.array(
        [(0, 100), (59, -81), (-95, 31), (95, 31), (-59, -81)], np.int64
    )
    v2 = np.zeros((1, 5, 2), np.int64)
    v2[0] = star
    assert ring_self_intersections(v2, np.array([5], np.int64))[0] == 5


def test_store_explain(ray_session, tmp_path):
    import ray

    from geowave_ray.store import GeoStore
    from geowave_ray.query.planner import SpatialQuery
    from geowave_ray.geom.wkb import box_polygon

    rng = np.random.default_rng(5)
    n = 2000
    tbl = pa.table(
        {
            "image_id": pa.array(np.arange(n, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-170, 170, n)),
            "lat": pa.array(rng.uniform(-80, 80, n)),
        }
    )
    store = GeoStore(str(tmp_path / "st"), prefix_bits=4)
    store.ingest(ray.data.from_arrow(tbl))
    q = SpatialQuery(box_polygon(10, 10, 20, 20))
    ex = {r["facet"]: r["value"] for r in store.explain(q).to_pylist()}
    assert ex["dirs_selected"] <= ex["dirs_total"]
    assert ex["files_selected"] >= 1
    assert ex["rowgroup_pushdown"] == 1
    assert ex["query_ranges"] >= 1
    # the plan matches what the scan actually returns
    got = store.query(q).to_pandas()
    lon, lat = got["lon"].to_numpy(), got["lat"].to_numpy()
    m = (lon >= 10) & (lon <= 20) & (lat >= 10) & (lat <= 20)
    assert m.all() and len(got) == int(
        ((tbl.column("lon").to_numpy() >= 10) & (tbl.column("lon").to_numpy() <= 20)
         & (tbl.column("lat").to_numpy() >= 10) & (tbl.column("lat").to_numpy() <= 20)).sum()
    )


def test_ingest_incremental_idempotent(ray_session, tmp_path):
    import ray

    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(9)

    def mk(ids):
        n = len(ids)
        return pa.table(
            {
                "image_id": pa.array(np.asarray(ids, np.int64)),
                "lon": pa.array(rng.uniform(-20, 20, n)),
                "lat": pa.array(rng.uniform(-20, 20, n)),
            }
        )

    a = mk(np.arange(0, 400))
    store = GeoStore(str(tmp_path / "inc"), prefix_bits=3)
    store.ingest_incremental(ray.data.from_arrow(a))
    # re-ingest A plus new batch B: A must not duplicate
    ab = pa.concat_tables([a, mk(np.arange(400, 600))])
    stats = store.ingest_incremental(ray.data.from_arrow(ab))
    assert stats.data["count"] == 600
    got = ray.data.read_parquet(str(tmp_path / "inc"), columns=["image_id"]).to_pandas()
    ids, cnts = np.unique(got["image_id"].to_numpy(), return_counts=True)
    assert len(ids) == 600 and cnts.max() == 1
    # third run with nothing new: still 600
    stats = store.ingest_incremental(ray.data.from_arrow(ab))
    assert stats.data["count"] == 600


def test_bottom_k_sample_merge_invariance(ray_session):
    import ray

    from geowave_ray.stages.aggregate import bottom_k_sample

    ids = np.arange(0, 5000, dtype=np.int64) % 900  # 900 distinct, dups
    tbl = pa.table({"user_id": pa.array(ids)})
    a = bottom_k_sample(ray.data.from_arrow(tbl).repartition(1), "user_id", 16).to_pandas()
    b = bottom_k_sample(ray.data.from_arrow(tbl).repartition(7), "user_id", 16).to_pandas()
    assert a.equals(b)  # partitioning-invariant
    assert len(a) == 16 and a["rank"].tolist() == list(range(16))
    est = int(a["distinct_est"].iloc[0])
    assert 400 <= est <= 2000  # KMV estimate of 900 within sane bounds


def test_cdc_shift_invariance():
    """The CDC property: identical substrings chunk identically at any
    offset — interior chunk hashes of a shared long substring appear in
    both docs despite different prefixes."""
    from geowave_ray.stages.texthash import cdc_chunk_stats, _codepoints, splitmix64, SEED31

    shared = "the quick brown fox jumps over the lazy dog " * 20
    a = "PREFIX-A " + shared
    b = "a completely different and longer prefix here " + shared

    # chunk-hash lists per doc via the kernel's own building blocks
    def chunks(text):
        import numpy as np
        st = cdc_chunk_stats([text])
        return st

    # brute chunk hash sets
    def chunk_hashes(t, W=16, D=64):
        M = 1 << 64
        L = len(t)
        bnds = []
        for p in range(W, L + 1):
            h = 0
            for ch in t[p - W:p]:
                h = (h * 257 + ord(ch)) % M
            if int(splitmix64(np.array([h], np.uint64))[0]) % D == 0:
                bnds.append(p)
        ends = [x for x in bnds if x < L] + [L]
        out, s = [], 1
        for e in ends:
            h = int(SEED31)
            for ch in t[s - 1:e]:
                h = (h * 257 + ord(ch)) % M
            out.append(h)
            s = e + 1
        return out

    ha, hb = chunk_hashes(a), chunk_hashes(b)
    common = set(ha) & set(hb)
    assert len(common) >= max(len(ha), len(hb)) - 3  # only edges differ


def test_per_group_quota_brute(ray_session):
    import ray

    from geowave_ray.stages.analytics import per_group_quota

    rng = np.random.default_rng(23)
    n = 800
    key = rng.choice(["a", "b", "c", "d"], n)
    order = rng.permutation(n).astype(np.int64)
    tbl = pa.table({"k": pa.array(key), "o": pa.array(order),
                    "id": pa.array(np.arange(n, dtype=np.int64))})
    quotas = {"a": 5, "b": 0, "c": 100, "d": 17}
    out = per_group_quota(
        ray.data.from_arrow(tbl).repartition(6), "k", "o", quotas
    ).to_pandas()
    import pandas as pd
    df = tbl.to_pandas()
    exp = (
        df.sort_values(["k", "o"]).groupby("k", group_keys=False)
        .apply(lambda g: g.head(quotas[g.name]), include_groups=True)
    )
    assert sorted(out["id"].tolist()) == sorted(exp["id"].tolist())


def test_shapefile_roundtrip_sharded(ray_session, tmp_path):
    from geowave_ray.sources.shapefile import (
        read_point_records,
        read_shx_offsets,
        shapefile_dataset,
        write_point_shapefile,
    )

    n = 5000
    xs = (np.arange(n, dtype=np.float64) * 13) % 360 - 180
    ys = (np.arange(n, dtype=np.float64) * 7) % 180 - 90
    vals = np.arange(n, dtype=np.int64) * 11 - 5
    base = str(tmp_path / "pts")
    write_point_shapefile(base, xs, ys, {"val": vals})
    df = (
        shapefile_dataset(base, records_per_shard=512)
        .to_pandas()
        .sort_values("fid")
        .reset_index(drop=True)
    )
    assert len(df) == n
    assert np.array_equal(df["x"].to_numpy(), xs)
    assert np.array_equal(df["y"].to_numpy(), ys)
    assert np.array_equal(df["val"].to_numpy(), vals)
    assert df["fid"].tolist() == list(range(1, n + 1))
    # unsupported shape type raises with the type named
    offs = read_shx_offsets(base + ".shx")
    import struct

    with open(base + ".shp", "r+b") as f:
        f.seek(int(offs[3, 0]) + 8)
        f.write(struct.pack("<i", 5))  # Polygon
    with pytest.raises(NotImplementedError, match="5"):
        read_point_records(base + ".shp", offs[:10])


def test_segment_polygon_join_known(ray_session):
    import ray

    from geowave_ray.stages.join import segment_polygon_join

    # one triangle (0,0)-(100,0)-(0,100), padded to mx=4
    verts = np.zeros((1, 4, 2), np.int64)
    verts[0, :3] = [(0, 0), (100, 0), (0, 100)]
    polys = {
        "pid": np.array([7], np.int64), "verts": verts, "m": np.array([3], np.int64),
        "bx0": np.array([0]), "by0": np.array([0]),
        "bx1": np.array([100]), "by1": np.array([100]),
    }
    segs = pa.table(
        {
            "sid": pa.array(np.arange(6, dtype=np.int64)),
            "x1": pa.array([10, -50, 200, 60, -10, 300]),
            "y1": pa.array([10, 50, 200, 60, -10, 300]),
            "x2": pa.array([20, 150, 210, 90, -1, 310]),
            "y2": pa.array([20, 50, 210, 90, -1, 310]),
        }
    )
    out = segment_polygon_join(
        ray.data.from_arrow(segs).repartition(2), polys, ("sid",)
    ).to_pandas()
    got = sorted(out["sid"].tolist())
    # 0: fully inside; 1: crosses; 2: far outside; 3: outside near
    # hypotenuse (60+60>100); 4: outside; 5: outside
    assert got == [0, 1]


def test_store_snapshot_time_travel(ray_session, tmp_path):
    import ray

    from geowave_ray.geom.wkb import box_polygon
    from geowave_ray.query.planner import SpatialQuery
    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(31)

    def mk(lo, n):
        return pa.table(
            {
                "image_id": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
                "lon": pa.array(rng.uniform(-30, 30, n)),
                "lat": pa.array(rng.uniform(-30, 30, n)),
            }
        )

    store = GeoStore(str(tmp_path / "tt"), prefix_bits=3)
    store.ingest(ray.data.from_arrow(mk(0, 300)))
    v1 = store.snapshot("after first ingest")
    store.ingest(ray.data.from_arrow(mk(1000, 200)), compute_stats=False)
    v2 = store.snapshot("after second ingest")
    q = SpatialQuery(box_polygon(-40, -40, 40, 40))
    n1 = store.query_at(v1, q).count()
    n2 = store.query_at(v2, q).count()
    n_now = store.query(q).count()
    assert n1 == 300 and n2 == 500 and n_now == 500
    # destructive op invalidates older snapshots LOUDLY
    store.compact()
    with pytest.raises(FileNotFoundError, match="v1|rewrote"):
        store.query_at(v1, q).count()


def test_store_integrity_scrub(ray_session, tmp_path):
    import ray

    from geowave_ray.geom.wkb import box_polygon
    from geowave_ray.query.planner import SpatialQuery
    from geowave_ray.store import GeoStore

    rng = np.random.default_rng(41)
    n = 400
    tbl = pa.table(
        {
            "image_id": pa.array(np.arange(n, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-20, 20, n)),
            "lat": pa.array(rng.uniform(-20, 20, n)),
        }
    )
    store = GeoStore(str(tmp_path / "scrub"), prefix_bits=3)
    store.ingest(ray.data.from_arrow(tbl))
    store.ingest(ray.data.from_arrow(tbl.slice(0, 50).set_column(
        0, "image_id", pa.array(np.arange(1000, 1050, dtype=np.int64)))),
        compute_stats=False)  # second ingest -> multiple files/partition
    store.record_integrity()
    # compaction merges files but must preserve content exactly
    store.compact()
    res = store.verify_integrity()
    assert res and all(v == "ok" for v in res.values()), res
    # deleting rows must be DETECTED
    store.delete(SpatialQuery(box_polygon(-20, -20, 0, 0)))
    res = store.verify_integrity()
    assert any(v == "MISMATCH" for v in res.values()), res


def test_fastss_pairs_brute(ray_session):
    import ray
    from itertools import combinations

    from geowave_ray.stages.dedupe import fastss_pairs

    words = ["cat", "cats", "bat", "at", "dog", "dgo", "dog", "d0g", "zzz", ""]
    tbl = pa.table({"sid": pa.array(range(len(words)), pa.int64()),
                    "code": pa.array(words)})
    out = fastss_pairs(ray.data.from_arrow(tbl).repartition(3), "sid", "code")
    got = sorted(zip(out.to_pandas()["id_a"], out.to_pandas()["id_b"]))

    def ed1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if abs(la - lb) == 1:
            lng, sht = (a, b) if la > lb else (b, a)
            return any(lng[:k] + lng[k + 1:] == sht for k in range(len(lng)))
        return False

    exp = sorted(
        (i, j) for i, j in combinations(range(len(words)), 2) if ed1(words[i], words[j])
    )
    assert [(int(a), int(b)) for a, b in got] == exp

"""Deterministic synthetic image+caption and zone tables.

Two families:

1. ``synth_*`` — seeded generators for the FIXTURES.md F1/F2 schemas
   (image_id, bytes, w, h, fmt, caption, phash, lon, lat) including skew hot
   clusters, the antimeridian band, pole-adjacent rows and edge cases.  Used
   by unit tests and bench.py.  No external data.

2. ``images_from_events`` / ``zones_from_range`` — *SQL-replicable*
   derivations: every derived column is integer arithmetic that DuckDB
   evaluates identically (same IEEE doubles), so the driver's oracle
   comparison can validate spatial pipelines end-to-end against ANSI SQL on
   the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.wkb import box_polygon, to_wkb
from .. import stages  # noqa: F401  (namespace)
from ..stages.imaging import encode_image

__all__ = [
    "synth_images_table",
    "synth_images_ds",
    "synth_zones_table",
    "images_from_events",
    "zones_from_range",
    "LON_EXPR_SQL",
    "LAT_EXPR_SQL",
    "ZONES_SQL",
]

# ---------------------------------------------------------- SQL-replicable
# lon in [-180, 180), lat in [-90, 90) derived from events columns; keep in
# sync with LON_EXPR_SQL / LAT_EXPR_SQL below.
LON_EXPR_SQL = "((event_id * 7919 + user_id) % 36000) / 100.0 - 180.0"
LAT_EXPR_SQL = "((event_id * 104729 + user_id * 13) % 18000) / 100.0 - 90.0"


def _derive_lonlat(event_id: np.ndarray, user_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = ((event_id * 7919 + user_id) % 36000) / 100.0 - 180.0
    lat = ((event_id * 104729 + user_id * 13) % 18000) / 100.0 - 90.0
    return lon, lat


def images_from_events(sf_dir: str):
    """Ray Dataset of image-shaped rows derived from ``events.parquet``
    (prunes to the needed columns at the read)."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ev = batch.column("event_id").to_numpy()
        us = batch.column("user_id").to_numpy()
        lon, lat = _derive_lonlat(ev, us)
        return pa.table(
            {
                "image_id": ev,
                "lon": lon,
                "lat": lat,
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")


# zones: N axis-aligned boxes from integer j — mirror of ZONES_SQL
ZONES_SQL = """
SELECT
  j AS zone_id,
  ((j * 37) % 340) - 170.0 AS minx,
  ((j * 53) % 160) - 80.0 AS miny,
  ((j * 37) % 340) - 170.0 + 3 + (j % 7) AS maxx,
  ((j * 53) % 160) - 80.0 + 2 + (j % 5) AS maxy
FROM range({n}) t(j)
""".strip()


def zones_from_range(n: int = 200) -> pa.Table:
    j = np.arange(n, dtype=np.int64)
    minx = ((j * 37) % 340) - 170.0
    miny = ((j * 53) % 160) - 80.0
    maxx = minx + 3 + (j % 7)
    maxy = miny + 2 + (j % 5)
    wkb = [
        to_wkb(box_polygon(minx[i], miny[i], maxx[i], maxy[i])) for i in range(n)
    ]
    return pa.table(
        {
            "zone_id": j,
            "minx": minx,
            "miny": miny,
            "maxx": maxx,
            "maxy": maxy,
            "wkb": pa.array(wkb, type=pa.binary()),
            "category": pa.array([f"cat-{int(v)}" for v in j % 5]),
        }
    )


# ------------------------------------------------------------- seeded synth
_ADJ = ["red", "blue", "tiny", "vast", "old", "new", "dark", "bright"]
_NOUN = ["harbor", "forest", "dune", "glacier", "market", "bridge", "field", "reef"]


# ------------------------------------------------- SQL-replicable crossmodal
# image+caption rows with CONTROLLED duplication on both modalities:
#   phash   = splitmix64(j % POOL) xor (1 << (j % 64) when j % 3 == 0)
#             -> within a pool group hamming is 0/1/2; across groups ~32
#   caption = caption_pool[(j * 2654435761) % CAPS]
# so same-image/new-caption and same-caption/new-image pairs both exist and
# DuckDB can regenerate the exact table (CROSSMODAL_SQL) for the oracle.
CROSSMODAL_POOL = 512
CROSSMODAL_CAPS = 797

_CM_CAPTIONS: np.ndarray | None = None


def _cm_caption_pool() -> np.ndarray:
    global _CM_CAPTIONS
    if _CM_CAPTIONS is None:
        c = np.arange(CROSSMODAL_CAPS)
        _CM_CAPTIONS = np.array(
            [
                f"a photo of {_ADJ[int(ci) % 8]} {_NOUN[(int(ci) // 8) % 8]}"
                f" near place-{int(ci) % 100}"
                for ci in c
            ]
        )
    return _CM_CAPTIONS


def crossmodal_batch(ids: np.ndarray) -> pa.Table:
    """(image_id, phash, caption) for int64 ids — mirror of CROSSMODAL_SQL."""
    from ..stages.texthash import splitmix64

    j = ids.astype(np.uint64)
    base = splitmix64(j % np.uint64(CROSSMODAL_POOL))
    flip = np.where(
        ids % 3 == 0, np.uint64(1) << (j % np.uint64(64)), np.uint64(0)
    )
    ph = (base ^ flip).astype(np.int64)
    c = (ids * 2654435761) % CROSSMODAL_CAPS
    return pa.table(
        {
            "image_id": pa.array(ids, type=pa.int64()),
            "phash": pa.array(ph),
            "caption": pa.array(_cm_caption_pool()[c]),
        }
    )


def crossmodal_ds(n: int = 4000, override_num_blocks: int | None = None):
    """Distributed deterministic image+caption table (north-rule shape
    minus payload bytes; partition-order independent)."""
    import ray

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return crossmodal_batch(batch.column("id").to_numpy().astype(np.int64))

    gen.__name__ = "crossmodal_gen"
    return ds.map_batches(gen, batch_format="pyarrow")


def crossmodal_sql_cte(n: int = 4000) -> str:
    """DuckDB CTE body regenerating crossmodal_ds(n) exactly: relation
    ``cm(image_id, ph HUGEINT, caption)``."""
    from ..stages.texthash import sql_splitmix64

    sm = sql_splitmix64(f"(j % {CROSSMODAL_POOL})::HUGEINT")
    adj = "[" + ",".join(f"'{a}'" for a in _ADJ) + "]"
    noun = "[" + ",".join(f"'{w}'" for w in _NOUN) + "]"
    return f"""
cm0 AS (
  SELECT j AS image_id,
         xor(({sm}),
             CASE WHEN j % 3 = 0
                  THEN 1::HUGEINT << CAST(j % 64 AS INTEGER)
                  ELSE 0::HUGEINT END) AS ph,
         (j * 2654435761) % {CROSSMODAL_CAPS} AS c
  FROM range({n}) t(j)),
cm AS (
  SELECT image_id, ph,
         'a photo of ' || {adj}[1 + CAST(c % 8 AS INTEGER)]
         || ' ' || {noun}[1 + CAST((c // 8) % 8 AS INTEGER)]
         || ' near place-' || CAST(c % 100 AS VARCHAR) AS caption
  FROM cm0)
""".strip()

# three Gaussian hot clusters to exercise skew / salting (FIXTURES F1)
_CLUSTERS = [(2.35, 48.85), (-74.0, 40.7), (139.7, 35.7)]


def _row_arrays(ids: np.ndarray) -> dict[str, np.ndarray]:
    """Deterministic per-row fields from integer ids (no RNG state needed —
    splitmix-style hashing so generation is order- and partition-independent)."""
    z = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = z ^ (z >> np.uint64(31))

    u1 = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32
    u2 = ((h >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32
    mode = (h % np.uint64(10)).astype(np.int64)

    lon = u1 * 360.0 - 180.0
    lat = u2 * 180.0 - 90.0
    # 30% of rows in hot clusters (sigma ~0.5 deg), 5% antimeridian band,
    # 2% pole-adjacent
    for k, (cx, cy) in enumerate(_CLUSTERS):
        m = mode == k
        r = np.sqrt(-2 * np.log(np.clip(u1[m], 1e-12, 1))) * 0.5
        th = 2 * np.pi * u2[m]
        lon[m] = np.clip(cx + r * np.cos(th), -180, 180)
        lat[m] = np.clip(cy + r * np.sin(th), -90, 90)
    m = mode == 3
    lon[m] = np.where(u1[m] < 0.5, -179.95, 179.95) + (u2[m] - 0.5) * 0.1
    m = (mode == 4) & (u1 < 0.2)
    lat[m] = np.where(u2[m] < 0.5, -89.99, 89.99)

    w = (8 + (h >> np.uint64(8)) % np.uint64(9) * np.uint64(4)).astype(np.int32)
    fmt_png = (h % np.uint64(2)) == 0
    phash = h.astype(np.int64)
    return {
        "u1": u1,
        "u2": u2,
        "lon": np.clip(lon, -180.0, 180.0),
        "lat": np.clip(lat, -90.0, 90.0),
        "w": w,
        "h_px": w,  # square images
        "fmt_png": fmt_png,
        "phash": phash,
        "hash": h,
    }


# per-process cache of encoded payloads when generating from a finite pool
_BLOB_CACHE: dict = {}


def _make_pixels(seed: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[0:size, 0:size]
    base = np.stack(
        [
            (gx * 255 // max(size - 1, 1)),
            (gy * 255 // max(size - 1, 1)),
            ((gx + gy) * 255 // max(2 * size - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-20, 21, base.shape, dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


_CAPTION_POOL: np.ndarray | None = None


def _caption_pool() -> np.ndarray:
    """All 8*8*100 caption combinations, precomputed once per process."""
    global _CAPTION_POOL
    if _CAPTION_POOL is None:
        _CAPTION_POOL = np.array(
            [
                f"a photo of {a} {b} near place-{p}"
                for a in _ADJ
                for b in _NOUN
                for p in range(100)
            ]
        )
    return _CAPTION_POOL


def _images_batch(ids: np.ndarray, with_bytes: bool, byte_pool: int | None) -> pa.Table:
    f = _row_arrays(ids)
    n = len(ids)
    a = (f["hash"] % np.uint64(8)).astype(np.int64)
    b = ((f["hash"] >> np.uint64(3)) % np.uint64(8)).astype(np.int64)
    p = (f["hash"] % np.uint64(100)).astype(np.int64)
    captions = _caption_pool()[(a * 8 + b) * 100 + p]
    image_ids = np.char.add(
        "img-", np.char.zfill(ids.astype(np.int64).astype("U12"), 12)
    )
    cols: dict = {
        "image_id": pa.array(image_ids),
        "w": pa.array(f["w"], type=pa.int32()),
        "h": pa.array(f["h_px"], type=pa.int32()),
        "fmt": pa.array(np.where(f["fmt_png"], "png", "jpeg")),
        "caption": pa.array(captions),
        "phash": pa.array(f["phash"], type=pa.int64()),
        "lon": pa.array(f["lon"], type=pa.float64()),
        "lat": pa.array(f["lat"], type=pa.float64()),
    }
    if with_bytes:
        blobs = []
        for i in range(n):
            pool_seed = int(ids[i]) if byte_pool is None else int(ids[i]) % byte_pool
            size = int(f["w"][i])
            # pooled bulk payloads keep the fast FJPG stand-in; the
            # unpooled (correctness/roundtrip) path writes REAL baseline
            # JPEG via stages/jpeg.py
            fmt = "png" if f["fmt_png"][i] else ("fjpg" if byte_pool is not None else "jpeg")
            if byte_pool is not None:
                key = (pool_seed, size, fmt)
                blob = _BLOB_CACHE.get(key)
                if blob is None:
                    blob = encode_image(_make_pixels(pool_seed, size), fmt)
                    _BLOB_CACHE[key] = blob
                blobs.append(blob)
            else:
                blobs.append(encode_image(_make_pixels(pool_seed, size), fmt))
        cols["bytes"] = pa.array(blobs, type=pa.large_binary())
    out_order = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat"]
    return pa.table({k: cols[k] for k in out_order if k in cols})


def synth_images_table(n: int = 1000, with_bytes: bool = True, byte_pool: int | None = None) -> pa.Table:
    return _images_batch(np.arange(n, dtype=np.int64), with_bytes, byte_pool)


def synth_images_ds(
    n: int,
    with_bytes: bool = True,
    byte_pool: int | None = 1024,
    override_num_blocks: int | None = None,
):
    """Distributed deterministic generation: ray.data.range -> map_batches.
    ``byte_pool`` caps distinct pixel arrays (bench scale); None => unique."""
    import ray

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        return _images_batch(ids, with_bytes, byte_pool)

    return ds.map_batches(gen, batch_format="pyarrow")


def synth_zones_table(n: int = 200, seed: int = 42, size_scale: float = 1.0) -> pa.Table:
    """Seeded polygon layer per FIXTURES F2: boxes, convex hulls, a polygon
    with a hole, an antimeridian-crossing box, a hot-cluster cover."""
    from ..geom.wkb import Polygon

    rng = np.random.default_rng(seed)
    zone_ids, wkbs, cats = [], [], []
    minx_l, miny_l, maxx_l, maxy_l = [], [], [], []

    def add(zid, poly, bbox):
        zone_ids.append(zid)
        wkbs.append(to_wkb(poly))
        cats.append(f"cat-{len(zone_ids) % 5}")
        minx_l.append(bbox[0])
        miny_l.append(bbox[1])
        maxx_l.append(bbox[2])
        maxy_l.append(bbox[3])

    i = 0
    while len(zone_ids) < n - 4:
        if i % 2 == 0:  # box
            cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
            w, h = rng.uniform(0.5, 15) * size_scale, rng.uniform(0.5, 10) * size_scale
            p = box_polygon(cx - w, cy - h, cx + w, cy + h)
            add(f"zone-{i:06d}", p, (cx - w, cy - h, cx + w, cy + h))
        else:  # convex hull of a point cloud
            cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
            pts = np.stack(
                [cx + rng.normal(0, 3 * size_scale, 12), cy + rng.normal(0, 2 * size_scale, 12)], axis=1
            )
            hull = _convex_hull(pts)
            add(
                f"zone-{i:06d}",
                Polygon(hull),
                (
                    hull[:, 0].min(),
                    hull[:, 1].min(),
                    hull[:, 0].max(),
                    hull[:, 1].max(),
                ),
            )
        i += 1
    # polygon with a hole
    shell = box_polygon(-10, -10, 10, 10).shell
    hole = box_polygon(-3, -3, 3, 3).shell[::-1].copy()
    add("zone-hole", Polygon(shell, [hole]), (-10, -10, 10, 10))
    # antimeridian-crossing box, pre-split into a multipolygon (west+east)
    from ..geom.wkb import MultiGeometry

    west = box_polygon(-180, 5, -175, 15)
    east = box_polygon(175, 5, 180, 15)
    add("zone-antimeridian", MultiGeometry([east, west]), (-180, 5, 180, 15))
    # hot-cluster cover (Paris cluster)
    add("zone-hot", box_polygon(0.35, 46.85, 4.35, 50.85), (0.35, 46.85, 4.35, 50.85))
    # zero-area polygon
    add("zone-zero", box_polygon(50, 50, 50, 50), (50, 50, 50, 50))
    return pa.table(
        {
            "zone_id": pa.array(zone_ids),
            "minx": pa.array(minx_l, type=pa.float64()),
            "miny": pa.array(miny_l, type=pa.float64()),
            "maxx": pa.array(maxx_l, type=pa.float64()),
            "maxy": pa.array(maxy_l, type=pa.float64()),
            "wkb": pa.array(wkbs, type=pa.binary()),
            "category": pa.array(cats),
        }
    )


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns closed ring."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(tuple(p))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1] + [lower[0]], dtype=np.float64)
    return ring


# Blob-pool universe for the pooled bench payloads: w = 8 + (h>>8)%9*4
# (9 sizes), fmt png/fjpg.  Indexing: idx = seed*18 + size_idx*2 + fmt_idx.
POOL_SIZES = tuple(range(8, 44, 4))
_POOL_FMTS = ("png", "fjpg")


def build_blob_pool(byte_pool: int, num_blocks: int = 64):
    """Distributed one-time build of the pooled payload universe
    (byte_pool seeds x 9 sizes x 2 formats), returned as an object-store
    ref of ONE ordered LargeBinary array so synth workers assemble byte
    columns with a vectorized take() instead of each worker re-encoding
    the whole pool (the per-worker cache build was a constant ~6-11 s
    Amdahl term in the bench's render phase — it did not shrink with
    worker count)."""
    import ray

    from ..stages.imaging import encode_image

    n = byte_pool * len(POOL_SIZES) * len(_POOL_FMTS)

    def enc(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy().astype(np.int64)
        blobs = []
        for i in idx.tolist():
            seed, rest = divmod(i, len(POOL_SIZES) * len(_POOL_FMTS))
            size_idx, fmt_idx = divmod(rest, len(_POOL_FMTS))
            blobs.append(
                encode_image(
                    _make_pixels(seed, POOL_SIZES[size_idx]), _POOL_FMTS[fmt_idx]
                )
            )
        return pa.table(
            {"idx": pa.array(idx), "blob": pa.array(blobs, pa.large_binary())}
        )

    enc.__name__ = "blob_pool_encode"
    ds = ray.data.range(n, override_num_blocks=num_blocks).map_batches(
        enc, batch_format="pyarrow"
    )
    from ..stages.util import collect_table

    t = collect_table(ds)
    t = t.take(pa.compute.sort_indices(t.column("idx")))
    return ray.put(t.column("blob").combine_chunks())


def synth_images_ds_pooled(
    n: int,
    byte_pool: int,
    pool_ref,
    override_num_blocks: int | None = None,
):
    """synth_images_ds(with_bytes=True) against a pre-built broadcast blob
    pool: the byte column is pool.take(idx) — fully vectorized, no
    per-worker encode cache."""
    import ray

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    n_f = len(_POOL_FMTS)
    n_sf = len(POOL_SIZES) * n_f

    def gen(batch: pa.Table) -> pa.Table:
        import ray as _ray

        pool = _ray.get(pool_ref)  # plasma-cached per worker, zero-copy
        ids = batch.column("id").to_numpy().astype(np.int64)
        t = _images_batch(ids, with_bytes=False, byte_pool=None)
        f = _row_arrays(ids)
        size_idx = ((f["w"].astype(np.int64)) - POOL_SIZES[0]) // 4
        fmt_idx = np.where(f["fmt_png"], 0, 1)
        idx = (ids % byte_pool) * n_sf + size_idx * n_f + fmt_idx
        blobs = pool.take(pa.array(idx))
        cols = {name: t.column(name) for name in t.column_names}
        cols["bytes"] = blobs
        order = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat"]
        return pa.table({k: cols[k] for k in order})

    gen.__name__ = "synth_images_pooled"
    return ds.map_batches(gen, batch_format="pyarrow")

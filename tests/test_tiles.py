"""Tile assignment golden tests (FIXTURES §F5): level rule, covering cells,
warp round-trip at PSNR>=40, mosaic merge."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.index.tiered import spatial_strategy
from geowave_ray.stages.imaging import png_encode, psnr, resample_nearest
from geowave_ray.stages.tiles import MosaicMerger, TileAssigner, TileWarper, select_levels


def test_select_levels_rule():
    # image covering 360 deg with 256 px -> tile_range = 360 -> level 0
    assert select_levels([360.0], [180.0], [256], [128])[0] == 0
    # 256px image covering 360/2^5 deg -> exact fit at level 5
    ext = 360.0 / 2**5
    assert select_levels([ext], [ext], [256], [256])[0] == 5
    # slightly larger pixels (coarser image) -> stays at 5 (over-inclusive eps)
    assert select_levels([ext * 1.000000001], [ext], [256], [256])[0] == 5
    # finer image (smaller extent per 256px) -> finer level
    assert select_levels([ext / 2], [ext / 2], [256], [256])[0] == 6


def test_assigner_covers_footprint():
    strategy = spatial_strategy(31)
    batch = pa.table(
        {
            "image_id": ["a", "b"],
            "lon": [10.0, -100.0],
            "lat": [45.0, -30.0],
            "w": pa.array([256, 512], type=pa.int32()),
            "h": pa.array([256, 512], type=pa.int32()),
        }
    )
    assigner = TileAssigner(pixel_res_deg=1e-3, keep_cols=("image_id",))
    out = assigner(batch)
    assert len(out) >= 2
    # every assigned cell's extent must overlap the image envelope
    for i in range(len(out)):
        tier = out.column("tier")[i].as_py()
        cell = out.column("cell")[i].as_py()
        (lo_lon, hi_lon), (lo_lat, hi_lat) = strategy.get_range_for_id(tier, cell)
        row = 0 if out.column("image_id")[i].as_py() == "a" else 1
        lon0 = batch.column("lon")[row].as_py()
        lat0 = batch.column("lat")[row].as_py()
        wpx = batch.column("w")[row].as_py()
        assert hi_lon >= lon0 - 1e-9 and lo_lon <= lon0 + wpx * 1e-3 + 1e-9
        assert hi_lat >= lat0 - wpx * 1e-3 - 1e-9 and lo_lat <= lat0 + 1e-9


def test_warp_psnr_roundtrip():
    """A tile cut from an image over exactly one cell reproduces the image
    at PSNR>=40 (lossless source, nearest resample)."""
    strategy = spatial_strategy(31)
    rng = np.random.default_rng(5)
    # smooth image (noise-free) so resampling PSNR is meaningful
    gy, gx = np.mgrid[0:128, 0:128]
    arr = np.stack([gx * 2, gy * 2, (gx + gy)], axis=-1).astype(np.uint8)

    # place the image exactly over one tier-11 cell
    tier = 11
    cell = int(strategy.encode_points(np.asarray([12.3]), np.asarray([41.2]))[0] >> np.uint64(2 * (31 - tier)))
    (lo_lon, hi_lon), (lo_lat, hi_lat) = strategy.get_range_for_id(tier, cell)
    res = (hi_lon - lo_lon) / 128
    batch = pa.table(
        {
            "image_id": ["x"],
            "lon": [lo_lon],
            "lat": [hi_lat],
            "tier": pa.array([tier], type=pa.uint8()),
            "cell": pa.array([cell], type=pa.uint64()),
            "bytes": pa.array([png_encode(arr)], type=pa.large_binary()),
        }
    )
    warper = TileWarper(tile_size=256, pixel_res_deg=res)
    out = warper(batch)
    tile = np.frombuffer(out.column("tile")[0].as_py(), dtype=np.uint8).reshape(256, 256, 3)
    # compare against direct nearest upsample of the source
    want = resample_nearest(arr, 256, 256)
    assert psnr(tile, want) >= 40


def test_mosaic_merge_fills_background():
    ts = 8
    a = np.zeros((ts, ts, 3), dtype=np.uint8)
    a[:4] = 100
    b = np.zeros((ts, ts, 3), dtype=np.uint8)
    b[4:] = 200
    group = pa.table(
        {
            "tier": pa.array([5, 5], type=pa.uint8()),
            "cell": pa.array([7, 7], type=pa.uint64()),
            "image_id": ["a", "b"],
            "tile": pa.array([a.tobytes(), b.tobytes()], type=pa.large_binary()),
        }
    )
    merged = MosaicMerger(tile_size=ts)(group)
    out = np.frombuffer(merged.column("tile")[0].as_py(), dtype=np.uint8).reshape(ts, ts, 3)
    assert (out[:4] == 100).all()
    assert (out[4:] == 200).all()
    assert merged.column("n_merged")[0].as_py() == 2


def test_mosaic_merge_strategies():
    """RasterTileMergeStrategy SPI parity: sum (clipped), mean (floor),
    max, min band merges over overlapping tiles."""
    import pytest

    ts = 4
    a = np.full((ts, ts, 3), 100, dtype=np.uint8)
    b = np.full((ts, ts, 3), 30, dtype=np.uint8)
    b[0, 0] = 250  # forces sum clipping at one pixel
    group = pa.table(
        {
            "tier": pa.array([5, 5], type=pa.uint8()),
            "cell": pa.array([7, 7], type=pa.uint64()),
            "image_id": ["a", "b"],
            "tile": pa.array([a.tobytes(), b.tobytes()], type=pa.large_binary()),
        }
    )

    def run(merge):
        m = MosaicMerger(tile_size=ts, merge=merge)(group)
        return np.frombuffer(m.column("tile")[0].as_py(), dtype=np.uint8).reshape(ts, ts, 3)

    s = run("sum")
    assert (s[0, 0] == 255).all()  # 100+250 clipped
    assert (s[1, 1] == 130).all()
    m = run("mean")
    assert (m[0, 0] == 175).all()  # floor((100+250)/2)
    assert (m[1, 1] == 65).all()
    assert (run("max")[0, 0] == 250).all() and (run("max")[1, 1] == 100).all()
    assert (run("min")[0, 0] == 100).all() and (run("min")[1, 1] == 30).all()
    with pytest.raises(ValueError):
        MosaicMerger(merge="median")


def test_render_stage_matches_warper():
    """Fused render stage produces the same tile pixels (via checksum) as
    TileAssigner + TileWarper run separately."""
    import pyarrow as pa
    from geowave_ray.stages.tiles import TileRenderStage

    from geowave_ray.sources.images import synth_images_table

    t = synth_images_table(30, with_bytes=True)
    st = TileRenderStage(pixel_res_deg=1e-4)
    out = st(t)
    assert len(out) >= 30
    # cross-check one row against the standalone warper
    row = 0
    img_id = out.column("image_id")[row].as_py()
    tier = out.column("tier")[row].as_py()
    cell = out.column("cell")[row].as_py()
    src = t.filter(pa.compute.equal(t.column("image_id"), img_id))
    joined = pa.table(
        {
            "image_id": src.column("image_id"),
            "lon": src.column("lon"),
            "lat": src.column("lat"),
            "tier": pa.array([tier], type=pa.uint8()),
            "cell": pa.array([cell], type=pa.uint64()),
            "bytes": src.column("bytes"),
        }
    )
    from geowave_ray.stages.tiles import TileWarper

    warped = TileWarper(pixel_res_deg=1e-4)(joined)
    tile = np.frombuffer(warped.column("tile")[0].as_py(), dtype=np.uint8)
    assert int(tile.astype(np.int64).sum()) == out.column("tile_checksum")[row].as_py()


def test_warper_bilinear_beats_nearest_on_smooth_raster():
    """resample="bilinear" (the reference raster adapter's default kernel,
    RasterDataAdapter.java:596-810) reconstructs a smooth source raster
    measurably better than nearest: on a linear ramp image the bilinear
    warp is exact up to rounding, nearest carries half-pixel quantization
    error.  Footprints are identical, so the PSNR gap is all kernel."""
    import pyarrow as pa

    from geowave_ray.stages.imaging import encode_image
    from geowave_ray.stages.tiles import TileRenderStage, TileWarper

    res = 1e-4
    h_px = w_px = 100

    def f(x, y):  # smooth, gradient ~40/px: bilinear's O(h^2) accuracy shows
        return 127.5 + 100.0 * np.sin(2 * np.pi * x / 16) * np.sin(2 * np.pi * y / 16)

    yy, xx = np.mgrid[0:h_px, 0:w_px]
    ramp = np.rint(f(xx, yy)).astype(np.uint8)
    arr = np.repeat(ramp[:, :, None], 3, axis=2)
    lon0, lat1 = 0.0, 0.01
    src = pa.table(
        {
            "image_id": pa.array([1], pa.int64()),
            "lon": pa.array([lon0], pa.float64()),
            "lat": pa.array([lat1], pa.float64()),
            "w": pa.array([w_px], pa.int64()),
            "h": pa.array([h_px], pa.int64()),
            "bytes": pa.array([encode_image(arr, "png")], pa.large_binary()),
        }
    )
    assign = TileRenderStage(pixel_res_deg=res)(src)
    tier = assign.column("tier")[0].as_py()
    cell = assign.column("cell")[0].as_py()
    joined = pa.table(
        {
            "image_id": src.column("image_id"),
            "lon": src.column("lon"),
            "lat": src.column("lat"),
            "tier": pa.array([tier], pa.uint8()),
            "cell": pa.array([cell], pa.uint64()),
            "bytes": src.column("bytes"),
        }
    )

    def warp(kind):
        w = TileWarper(pixel_res_deg=res, resample=kind)(joined)
        return np.frombuffer(w.column("tile")[0].as_py(), dtype=np.uint8).reshape(256, 256, 3)

    near, bilin = warp("nearest"), warp("bilinear")

    # analytic ground truth at tile pixel centers (background where the
    # tile extends past the image, same as both kernels' footprint)
    strat = TileWarper(pixel_res_deg=res).strategy
    (los, his) = strat.decode_cells(int(tier), np.asarray([cell], np.uint64))
    cx0, cx1, cy0, cy1 = los[0][0], his[0][0], los[1][0], his[1][0]
    px = cx0 + (np.arange(256) + 0.5) * (cx1 - cx0) / 256
    py = cy1 - (np.arange(256) + 0.5) * (cy1 - cy0) / 256
    fx = (px - lon0) / res - 0.5
    fy = (lat1 - py) / res - 0.5
    inx = (np.floor(fx + 0.5) >= 0) & (np.floor(fx + 0.5) < w_px)
    iny = (np.floor(fy + 0.5) >= 0) & (np.floor(fy + 0.5) < h_px)
    truth = np.zeros((256, 256), dtype=np.float64)
    vals = f(np.clip(fx[None, :], 0, w_px - 1), np.clip(fy[:, None], 0, h_px - 1))
    truth[np.ix_(iny, inx)] = vals[np.ix_(iny, inx)]
    truth3 = np.repeat(truth[:, :, None], 3, axis=2)

    def psnr_f(t):
        mse = np.mean((t.astype(np.float64) - truth3) ** 2)
        return 10 * np.log10(255.0**2 / mse)

    p_near, p_bilin = psnr_f(near), psnr_f(bilin)
    assert p_bilin > p_near + 3.0, (p_near, p_bilin)
    assert p_bilin >= 40.0

    with pytest.raises(ValueError, match="resample"):
        TileWarper(resample="cubic")


def test_render_pixels_parity():
    """materialize_pixels=True (actual 256^2 warp) yields byte-identical
    output tables to the closed-form checksum path — the BENCH
    render_pixels metric measures the same computation's pixel-producing
    variant."""
    from geowave_ray.sources.images import synth_images_table
    from geowave_ray.stages.tiles import TileRenderStage

    t = synth_images_table(40, with_bytes=True)
    fast = TileRenderStage(pixel_res_deg=1e-4)(t)
    px = TileRenderStage(pixel_res_deg=1e-4, materialize_pixels=True)(t)
    assert fast.equals(px)


def test_mosaic_merge_pipeline_combiner(ray_session):
    """mosaic_merge's pre-shuffle combiner (sum/mean/max/min) must produce
    exactly the single-level MosaicMerger result on a multi-block Dataset."""
    import ray

    from geowave_ray.stages.tiles import mosaic_merge

    ts = 4
    nb = ts * ts * 3
    rng = np.random.default_rng(7)
    n = 400
    cells = rng.integers(0, 13, n).astype(np.uint64)
    tiles = rng.integers(0, 200, (n, nb)).astype(np.uint8)
    t = pa.table(
        {
            "tier": pa.array(np.zeros(n, dtype=np.uint8)),
            "cell": pa.array(cells, type=pa.uint64()),
            "image_id": np.arange(n, dtype=np.int64),
            "tile": pa.array([r.tobytes() for r in tiles], type=pa.large_binary()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    for merge in ("sum", "mean", "max", "min"):
        got = mosaic_merge(ds, tile_size=ts, merge=merge).to_pandas()
        got = got.sort_values("cell").reset_index(drop=True)
        want_rows = []
        for c in np.unique(cells):
            sub = tiles[cells == c].astype(np.int64)
            if merge == "sum":
                acc = np.clip(sub.sum(axis=0), 0, 255)
            elif merge == "mean":
                acc = sub.sum(axis=0) // len(sub)
            elif merge == "max":
                acc = sub.max(axis=0)
            else:
                acc = sub.min(axis=0)
            want_rows.append((int(c), len(sub), acc.astype(np.uint8).tobytes()))
        assert len(got) == len(want_rows)
        for (c, nm, blob), (_, row) in zip(want_rows, got.iterrows()):
            assert int(row["cell"]) == c and int(row["n_merged"]) == nm
            assert bytes(row["tile"]) == blob
    # nodata path still routes through the plain groupby
    nd = mosaic_merge(ds, tile_size=ts, merge="nodata").to_pandas()
    assert len(nd) == len(np.unique(cells))


def test_slicer_halving_fast_path_parity():
    """The vectorized halving fast path must emit exactly the fragments the
    general per-tile path emits (same dst cells, same pixel placement)."""
    import pyarrow as pa

    from geowave_ray.stages.resize import _Slicer

    rng = np.random.default_rng(5)
    bits, ts = 6, 8
    from geowave_ray.index.tiered import spatial_strategy

    strat = spatial_strategy(bits)
    n = 40
    gx = rng.integers(0, 1 << bits, n).astype(np.uint64)
    # latitude is a half-range dimension: reachable rows are [b/4-1, 3b/4)
    # — b/4-1 included because lat == -90 exactly lands there under the
    # ceil-1 edge rule (the row whose geographic box lies below -90)
    gy = rng.integers((1 << bits) // 4 - 1, 3 * (1 << bits) // 4, n).astype(np.uint64)
    cells = strat.curve(bits).encode([gx, gy])
    tiles = [rng.integers(0, 256, ts * ts * 3, dtype=np.uint8).tobytes() for _ in range(n)]
    batch = pa.table(
        {
            "tier": pa.array(np.full(n, bits, dtype=np.uint8)),
            "cell": pa.array(cells, type=pa.uint64()),
            "image_id": pa.array([f"t{i}" for i in range(n)]),
            "tile": pa.array(tiles, type=pa.large_binary()),
        }
    )
    sl = _Slicer(src_tile_size=ts, dst_tier=bits - 1, dst_tile_size=2 * ts, max_bits=bits)
    fast = sl(batch)
    slow = sl._general(batch)
    assert fast.column("cell").to_pylist() == slow.column("cell").to_pylist()
    assert fast.column("tier").to_pylist() == slow.column("tier").to_pylist()
    for a, b in zip(fast.column("tile").to_pylist(), slow.column("tile").to_pylist()):
        assert a == b


def test_render_checksum_separable():
    """The separable checksum must equal the materialized-warp sum."""
    rng = np.random.default_rng(9)
    for _ in range(50):
        h, w = rng.integers(4, 40, 2)
        ts = 32
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        sx = rng.integers(-5, w + 5, ts)
        sy = rng.integers(-5, h + 5, ts)
        okx = (sx >= 0) & (sx < w)
        oky = (sy >= 0) & (sy < h)
        tile = np.zeros((ts, ts, 3), dtype=np.uint8)
        if okx.any() and oky.any():
            tile[np.ix_(oky, okx)] = arr[sy[oky][:, None], sx[okx][None, :]]
        want = int(tile.sum(dtype=np.int64))
        g = arr.sum(axis=2, dtype=np.int64)
        colw = np.bincount(sx[okx], minlength=w)
        roww = np.bincount(sy[oky], minlength=h)
        got = int(roww @ (g @ colw))
        assert got == want

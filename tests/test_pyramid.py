"""Raster pyramid build (stages/pyramid.py)."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def _tiles(grid, t=16, present=None):
    from geowave_ray.stages.imaging import encode_image

    rows = {"tx": [], "ty": [], "png": []}
    for ty in range(grid):
        for tx in range(grid):
            if present is not None and (tx, ty) not in present:
                continue
            gx = tx * t + np.arange(t, dtype=np.int64)[None, :]
            gy = ty * t + np.arange(t, dtype=np.int64)[:, None]
            v = ((gx * 7 + gy * 13) % 256).astype(np.uint8)
            rows["tx"].append(tx)
            rows["ty"].append(ty)
            rows["png"].append(encode_image(v[:, :, None], "png"))
    return pa.table(
        {
            "tx": pa.array(rows["tx"], type=pa.int64()),
            "ty": pa.array(rows["ty"], type=pa.int64()),
            "png": pa.array(rows["png"], type=pa.binary()),
        }
    )


def _reference(grid, t=16, levels=2):
    gx = np.arange(grid * t, dtype=np.int64)[None, :]
    gy = np.arange(grid * t, dtype=np.int64)[:, None]
    img = (gx * 7 + gy * 13) % 256
    out = {}
    for lvl in range(levels + 1):
        g = grid >> lvl
        bs = img.reshape(g, t, g, t).sum(axis=(1, 3))
        for by in range(g):
            for bx in range(g):
                out[(lvl, bx, by)] = int(bs[by, bx])
        img = img.reshape(img.shape[0] // 2, 2, img.shape[1] // 2, 2).sum(
            axis=(1, 3)
        ) // 4
    return out


def test_pool2x2_floor_mean():
    from geowave_ray.stages.pyramid import pool2x2

    a = np.array([[0, 1], [2, 4]], dtype=np.uint8)
    assert pool2x2(a)[0, 0] == 1  # (0+1+2+4)//4


@pytest.mark.parametrize("lps", [None, 1])
def test_build_pyramid_matches_reference(ray_session, lps):
    from geowave_ray.stages.pyramid import build_pyramid

    ds = ray.data.from_arrow(_tiles(4))
    out = build_pyramid(ds, n_levels=2, levels_per_shuffle=lps).to_pandas()
    got = {
        (r.level, r.tx, r.ty): r.pix_sum for r in out.itertuples()
    }
    assert got == _reference(4, levels=2)


def test_build_pyramid_missing_children_fill(ray_session):
    from geowave_ray.stages.pyramid import build_pyramid

    # only one of 4 tiles present: level 0 emits 1 row; level 1 pools the
    # present tile against fill=0
    ds = ray.data.from_arrow(_tiles(2, present={(0, 0)}))
    out = build_pyramid(ds, n_levels=1).to_pandas()
    l0 = out[out.level == 0]
    l1 = out[out.level == 1]
    assert len(l0) == 1 and len(l1) == 1
    # floor(sum/4) pooling loses <4 per 2x2 block vs sum/4 exactly
    assert 0 < l1.pix_sum.iloc[0] <= l0.pix_sum.iloc[0] // 4


def test_retile_boundary_cell_parent():
    """A source tile in a boundary-rule cell (a point at lat == -90 lands
    in grid row b/4-1, whose lon/lat box lies entirely below -90) must
    re-tile into ITS integer parent (x>>1, y>>1), not the neighbor row —
    the old geographic midpoint recovery clamped the decoded box into row
    b/4 and silently reparented the tile (caught by the sf0.1 oracle)."""
    import pyarrow as pa

    from geowave_ray.index.tiered import spatial_strategy
    from geowave_ray.stages.encode import CellEncoder
    from geowave_ray.stages.resize import _Slicer

    bits, ts = 6, 8
    strat = spatial_strategy(bits)
    # a real point at the latitude edge: engine cell row must be b/4-1
    enc = CellEncoder(bits=bits)
    pt = pa.table({"image_id": [1], "lon": [-67.5 + 0.01], "lat": [-90.0]})
    cell = enc(pt).column("cell").to_numpy(zero_copy_only=False)[0]
    xy = strat.curve(bits).decode(np.asarray([cell], dtype=np.uint64))
    x, y = int(xy[0][0]), int(xy[1][0])
    assert y == (1 << bits) // 4 - 1  # the boundary-rule row
    batch = pa.table(
        {
            "tier": pa.array(np.asarray([bits], dtype=np.uint8)),
            "cell": pa.array([cell], type=pa.uint64()),
            "image_id": pa.array(["edge"]),
            "tile": pa.array([bytes(ts * ts * 3)], type=pa.large_binary()),
        }
    )
    want_parent = int(
        strat.curve(bits - 1).encode(
            [np.asarray([x >> 1], np.uint64), np.asarray([y >> 1], np.uint64)]
        )[0]
    )
    sl = _Slicer(src_tile_size=ts, dst_tier=bits - 1, dst_tile_size=2 * ts, max_bits=bits)
    assert sl(batch).column("cell").to_pylist() == [want_parent]      # fast path
    assert sl._general(batch).column("cell").to_pylist() == [want_parent]  # general

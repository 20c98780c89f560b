"""FIXTURES.md §F7 edge-case rows: antimeridian, poles, bin edges,
duplicates, degenerate geometry/images."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.geom.wkb import box_polygon, to_wkb
from geowave_ray.index.dimensions import (
    LatitudeDimension,
    LongitudeDimension,
    norm_to_cell_min,
    norm_to_cell_point,
)
from geowave_ray.index.tiered import spatial_strategy


def test_antimeridian_points():
    """lon ±180 and ±179.999999 encode within bounds; +180 and -180 map to
    the extreme cells of the lon axis."""
    strategy = spatial_strategy(31)
    lon = np.array([-180.0, -179.999999, 179.999999, 180.0])
    lat = np.zeros(4)
    cells = strategy.encode_points(lon, lat)
    for c in cells:
        (lo, hi), _ = strategy.get_range_for_id(31, int(c))
        assert -180 - 1e-6 <= lo <= hi <= 180 + 1e-6
    # +180 (norm 1.0, ceil-1 rule) lands in the last lon cell
    (lo, hi), _ = strategy.get_range_for_id(31, int(cells[3]))
    assert hi >= 180 - 1e-6


def test_pole_clamping():
    """lat ±90 clamp (LatitudeDefinition.java:39-43); out-of-range lat
    clamps rather than raising."""
    strategy = spatial_strategy(31)
    cells = strategy.encode_points(
        np.array([0.0, 0.0, 0.0]), np.array([-90.0, 90.0, 95.0])
    )
    assert cells[1] == cells[2]  # 95 clamps to 90
    _, (lo, hi) = strategy.get_range_for_id(31, int(cells[0]))
    assert lo <= -90 + 1e-6


@pytest.mark.parametrize("tier", [1, 2, 3, 4])
def test_bin_edge_rules(tier):
    """Points exactly on cell boundaries at tiers 1..4 follow the ceil-1
    point rule; box min edges follow floor (PrimitiveHilbertSFCOperations
    .java:210-235)."""
    bins = 1 << tier
    lond = LongitudeDimension()
    for k in range(1, bins):
        edge = -180.0 + k * 360.0 / bins
        norm = lond.normalize(np.asarray([edge]))[0]
        point_cell = int(norm_to_cell_point(np.float64(norm), bins))
        min_cell = int(norm_to_cell_min(np.float64(norm), bins))
        # exactly-on-edge: point rule gives the cell BELOW, min rule the
        # cell ABOVE
        assert point_cell == k - 1
        assert min_cell == k


def test_duplicate_image_ids_dedupe(ray_session):
    import ray

    from geowave_ray.stages.dedupe import exact_dedupe

    t = pa.table(
        {
            "image_id": ["a", "b", "a", "c", "b", "a"],
            "v": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        }
    )
    out = exact_dedupe(ray.data.from_arrow(t), "image_id", "v").to_pandas()
    assert len(out) == 3
    assert out.set_index("image_id")["v"].to_dict() == {"a": 1, "b": 2, "c": 4}


def test_zero_area_polygon_join(ray_session):
    """A degenerate (zero-area) zone matches exactly the coincident point."""
    import ray

    from geowave_ray.stages.join import broadcast_spatial_join

    zones = pa.table(
        {
            "zone_id": ["z"],
            "minx": [50.0],
            "miny": [50.0],
            "maxx": [50.0],
            "maxy": [50.0],
            "wkb": pa.array([to_wkb(box_polygon(50, 50, 50, 50))], type=pa.binary()),
        }
    )
    pts = pa.table(
        {
            "image_id": ["hit", "miss"],
            "lon": [50.0, 51.0],
            "lat": [50.0, 50.0],
        }
    )
    out = broadcast_spatial_join(ray.data.from_arrow(pts), zones).to_pandas()
    assert out["image_id"].tolist() == ["hit"]


def test_empty_caption_and_tiny_image():
    from geowave_ray.stages.imaging import decode_image, png_encode
    from geowave_ray.stages.text import TextFeatures

    # 1x1 image round-trips
    arr = np.array([[[7, 8, 9]]], dtype=np.uint8)
    assert np.array_equal(decode_image(png_encode(arr)), arr)
    # empty caption yields zeroed features, no crash
    t = pa.table({"text": [""]})
    out = TextFeatures(text_col="text")(t)
    assert out.column("n_tokens")[0].as_py() == 0
    assert out.column("quality_score")[0].as_py() < 0.3


def test_empty_query_result(ray_session):
    """A query hitting nothing returns an empty result, not an error."""
    import ray

    from geowave_ray.query.planner import SpatialQuery
    from geowave_ray.sources.images import synth_images_table

    t = synth_images_table(100, with_bytes=False)
    # a tiny box in the middle of the ocean far from any of the 100 points
    q = SpatialQuery(box_polygon(0.001, 0.001, 0.002, 0.002))
    out = q.apply(ray.data.from_arrow(t))
    assert out.count() in (0, 1)  # almost surely 0


def test_tile_assigner_pole_rows_bounded():
    """Regression: images at lat=±90 must not explode to millions of cells
    (level comes from pixel extent, not the pole-clipped envelope)."""
    from geowave_ray.stages.tiles import TileAssigner

    batch = pa.table(
        {
            "image_id": ["p1", "p2", "p3"],
            "lon": [137.52, 0.0, -180.0],
            "lat": [-90.0, 90.0, -90.0],
            "w": pa.array([213, 256, 64], type=pa.int32()),
            "h": pa.array([213, 256, 64], type=pa.int32()),
        }
    )
    out = TileAssigner(pixel_res_deg=1e-3, keep_cols=("image_id",))(batch)
    assert len(out) <= 30  # a handful of cells each, never millions

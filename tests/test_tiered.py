"""Tiered SFC strategy conformance tests.

Ported from reference
core/geotime/src/test/.../tiered/TieredSFCIndexStrategyTest.java:43-260.
"""

import numpy as np

from geowave_ray.index.tiered import (
    SpatialTemporalStrategy,
    TieredStrategy,
    spatial_strategy,
)
from geowave_ray.index.dimensions import LatitudeDimension, LongitudeDimension

DEFINED_BITS_OF_PRECISION = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 18, 31]
QUERY_RANGE_EPSILON = 1e-12


def _defined_strategy():
    return TieredStrategy(
        [LongitudeDimension(), LatitudeDimension(half_range=True)],
        DEFINED_BITS_OF_PRECISION,
    )


def _box_for(bits):
    precision = 360.0 / (2**bits)
    if precision > 180:
        return [(-180.0, 180.0), (-90.0, 90.0)]
    return [(0.0, precision), (-precision, 0.0)]


def test_predefined_spatial_entries():
    """testPredefinedSpatialEntries: exact-fit boxes land at their tier with 1
    id when the next defined tier is not tier+1; else 2 ids (lon-only split,
    90<precision<=180) or 4 ids at tier+1."""
    strategy = _defined_strategy()
    for i, bits in enumerate(DEFINED_BITS_OF_PRECISION):
        precision = 360.0 / (2**bits)
        box = _box_for(bits)
        ids = strategy.get_insertion_ids(box)
        tier_of = ids[0][0]

        # query ranges: exactly one single-value range at the fitting tier
        qbox = [
            (box[0][0] + QUERY_RANGE_EPSILON, box[0][1] - QUERY_RANGE_EPSILON),
            (box[1][0] + QUERY_RANGE_EPSILON, box[1][1] - QUERY_RANGE_EPSILON),
        ]
        qranges = strategy.get_query_ranges(qbox)
        at_tier = [r for r in qranges if r.tier == bits]
        assert len(at_tier) == 1, f"tier {bits}: expected 1 range, got {len(at_tier)}"
        assert at_tier[0].lo == at_tier[0].hi, f"tier {bits}: expected single-value range"

        next_is_increment = (
            i < len(DEFINED_BITS_OF_PRECISION) - 1
            and DEFINED_BITS_OF_PRECISION[i + 1] == bits + 1
        )
        if tier_of == 0 or not next_is_increment:
            assert tier_of == bits, f"tier {bits}: got tier {tier_of}"
            assert len(ids) == 1, f"tier {bits}: expected 1 id, got {len(ids)}"
        else:
            expected_tier = DEFINED_BITS_OF_PRECISION[i + 1]
            expected_ids = 2 if (90 < precision <= 180) else 4
            assert tier_of == expected_tier, f"tier {bits}: got tier {tier_of}"
            assert len(ids) == expected_ids, (
                f"tier {bits}: expected {expected_ids} ids, got {len(ids)}"
            )


def test_one_estimated_duplicate_insertion():
    """testOneEstimatedDuplicateInsertion: with maxDuplicates=1 every box
    collapses to exactly 1 id at its exact-fit tier (full incremental 0..31)."""
    strategy = spatial_strategy(31)
    for bits in DEFINED_BITS_OF_PRECISION:
        box = _box_for(bits)
        ids = strategy.get_insertion_ids(box, max_dup=1)
        assert len(ids) == 1, f"tier {bits}: {len(ids)} ids"
        assert ids[0][0] == bits, f"tier {bits}: tier byte {ids[0][0]}"


def test_spatial_temporal_single_entry():
    """testSingleEntry: 3-D point keys are 13 bytes (1 tier + 4 year + 8 sfc);
    same-year points share the first 5 bytes; different year differs."""
    st = SpatialTemporalStrategy((20, 20, 20))
    mid_2020 = int(np.datetime64("2020-07-01T12:00:00").astype("datetime64[ms]").astype(np.int64))
    start_2020 = int(np.datetime64("2020-01-01T00:00:00").astype("datetime64[ms]").astype(np.int64))
    mid_2019 = int(np.datetime64("2019-07-01T12:00:00").astype("datetime64[ms]").astype(np.int64))

    id1 = st.insertion_id_bytes(45.0, 45.0, mid_2020)
    id2 = st.insertion_id_bytes(45.0, 45.0, start_2020)
    id3 = st.insertion_id_bytes(45.0, 45.0, mid_2019)
    assert len(id1) == 13
    assert id1[:5] == id2[:5]  # same tier + year bin
    assert id1[:5] != id3[:5]  # different year bin


def test_point_insertion_ids_match_vectorized():
    """Scalar byte-id path and vectorized encode_points agree on cells."""
    strategy = spatial_strategy(31)
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    cells = strategy.encode_points(lon, lat)
    for i in range(0, 200, 17):
        ids = strategy.get_insertion_ids([(lon[i], lon[i]), (lat[i], lat[i])])
        assert len(ids) == 1
        assert ids[i % 1][0] == 31
        assert int.from_bytes(ids[0][1:], "big") == int(cells[i])


def test_insert_boxes_vectorized_matches_scalar():
    strategy = spatial_strategy(31)
    rng = np.random.default_rng(5)
    n = 100
    cx = rng.uniform(-170, 170, n)
    cy = rng.uniform(-80, 80, n)
    w = rng.uniform(0.0001, 20.0, n)
    h = rng.uniform(0.0001, 20.0, n)
    minx, maxx = cx - w / 2, cx + w / 2
    miny, maxy = np.clip(cy - h / 2, -90, 90), np.clip(cy + h / 2, -90, 90)
    rows, tiers, cells = strategy.insert_boxes([minx, miny], [maxx, maxy])
    for i in range(n):
        ids = strategy.get_insertion_ids([(minx[i], maxx[i]), (miny[i], maxy[i])])
        got = sorted(
            (int(tiers[k]), int(cells[k])) for k in np.nonzero(rows == i)[0]
        )
        want = sorted((b[0], int.from_bytes(b[1:], "big")) for b in ids)
        assert got == want, f"row {i}: {got} != {want}"


def test_query_ranges_contain_point_cells():
    """Cells of points inside a query box appear in some query range at the
    finest tier."""
    strategy = spatial_strategy(31)
    rng = np.random.default_rng(21)
    lon = rng.uniform(10, 20, 100)
    lat = rng.uniform(40, 50, 100)
    cells = strategy.encode_points(lon, lat)
    qranges = [r for r in strategy.get_query_ranges([(10, 20), (40, 50)], 200) if r.tier == 31]
    los = np.array([r.lo for r in qranges], dtype=np.uint64)
    his = np.array([r.hi for r in qranges], dtype=np.uint64)
    for c in cells:
        assert ((los <= c) & (c <= his)).any()


def test_antimeridian_box_splits():
    """A lon range crossing ±180 produces ids in two separate lon bins
    (LongitudeDefinition.java:33-67)."""
    strategy = spatial_strategy(31)
    ids = strategy.get_insertion_ids([(170.0, -170.0), (10.0, 20.0)])
    assert len(ids) >= 2
    # decoded cells must lie on both sides of the antimeridian
    sides = set()
    for b in ids:
        tier = b[0]
        cell = int.from_bytes(b[1:], "big")
        (lo_lon, hi_lon), _ = strategy.get_range_for_id(tier, cell)
        sides.add("west" if hi_lon <= -90 else "east")
    assert sides == {"west", "east"}


def test_range_for_id_roundtrip():
    strategy = spatial_strategy(31)
    lon, lat = np.asarray([12.345]), np.asarray([-33.21])
    cell = int(strategy.encode_points(lon, lat)[0])
    (lo_lon, hi_lon), (lo_lat, hi_lat) = strategy.get_range_for_id(31, cell)
    assert lo_lon <= 12.345 <= hi_lon
    assert lo_lat <= -33.21 <= hi_lat
    assert (hi_lon - lo_lon) < 1e-6


def test_spatial_temporal_query_ranges():
    """3-D ST planning: cells of points inside (bbox x time range) are
    covered by some range of the matching year bin."""
    from geowave_ray.index.tiered import SpatialTemporalStrategy, st_query_ranges

    st = SpatialTemporalStrategy((20, 20, 20))
    rng = np.random.default_rng(3)
    n = 200
    lon = rng.uniform(5, 15, n)
    lat = rng.uniform(40, 50, n)
    t_ms = rng.integers(
        int(np.datetime64("2023-02-01").astype("datetime64[ms]").astype(np.int64)),
        int(np.datetime64("2024-11-01").astype("datetime64[ms]").astype(np.int64)),
        n,
    )
    years, cells = st.encode_points(lon, lat, t_ms)
    ranges = st_query_ranges(
        st,
        (5, 40, 15, 50),
        (
            int(np.datetime64("2023-02-01").astype("datetime64[ms]").astype(np.int64)),
            int(np.datetime64("2024-11-01").astype("datetime64[ms]").astype(np.int64)),
        ),
        max_ranges=400,
    )
    assert {r.year for r in ranges} == {2023, 2024}
    by_year = {}
    for r in ranges:
        by_year.setdefault(r.year, []).append((r.lo, r.hi))
    for y, c in zip(years, cells):
        assert any(lo <= int(c) <= hi for lo, hi in by_year[int(y)]), (y, c)


def test_st_bias_presets_unequal_bits():
    """SPATIAL (25,25,10) / TEMPORAL (10,10,40) presets
    (SpatialTemporalDimensionalityTypeProvider.java:207-246): 13-byte keys
    (tier + 4-byte YEAR bin + 8-byte compact index), round-trip decode."""
    import numpy as np

    from geowave_ray.index.tiered import ST_BIAS_PRESETS, spatial_temporal_strategy

    t_ms = int(np.datetime64("2024-03-15T12:00:00").astype("datetime64[ms]").astype(np.int64))
    for bias, bits in ST_BIAS_PRESETS.items():
        st = spatial_temporal_strategy(bias)
        assert st.bits_per_dim == bits
        key = st.insertion_id_bytes(12.5, 47.25, t_ms)
        assert len(key) == 1 + 4 + 8, (bias, len(key))
        assert key[0] == max(bits)
        assert key[1:5] == b"2024"
        # encode/decode round trip at the finest tier
        labels, cells = st.encode_points(
            np.array([12.5, -170.0]), np.array([47.25, -80.0]),
            np.array([t_ms, t_ms + 86400_000]),
        )
        curve = st.curve3[st.finest_tier]
        back = curve.decode(cells)
        nb = st._dim_bins(st.finest_tier)
        from geowave_ray.index.dimensions import norm_to_cell_point

        assert np.array_equal(
            back[0], norm_to_cell_point(st.lon.normalize(np.array([12.5, -170.0])), nb[0])
        )
        assert np.array_equal(
            back[2],
            norm_to_cell_point(
                st.time.normalize_within_bin(np.array([t_ms, t_ms + 86400_000]))[1],
                nb[2],
            ),
        )


def test_temporal_binning_periodicities():
    """MONTH/DAY/HOUR binning (TemporalBinningStrategy.java:36-474):
    labels, in-bin normalization and multi-bin range splitting."""
    import numpy as np

    from geowave_ray.index.dimensions import TimeDimension

    t = np.array(
        [
            np.datetime64("2024-01-31T23:59:59.999"),
            np.datetime64("2024-02-01T00:00:00.000"),
            np.datetime64("2023-12-15T06:30:00.000"),
        ],
        dtype="datetime64[ms]",
    ).astype(np.int64)
    month = TimeDimension(periodicity="MONTH")
    assert month.bins_of(t).tolist() == [202401, 202402, 202312]
    day = TimeDimension(periodicity="DAY")
    assert day.bins_of(t).tolist() == [20240131, 20240201, 20231215]
    hour = TimeDimension(periodicity="HOUR")
    assert hour.bins_of(t).tolist() == [2024013123, 2024020100, 2023121506]
    # normalization is within-bin and in [0, 1)
    labels, norm = month.normalize_within_bin(t)
    assert labels.tolist() == [202401, 202402, 202312]
    assert (norm >= 0).all() and (norm < 1).all()
    assert norm[1] == 0.0  # first instant of the bin
    # a range crossing a month boundary splits into two bins
    ranges = month.get_normalized_ranges(int(t[2]), int(t[0]))
    assert [r.bin_id for r in ranges] == [b"202312", b"202401"]
    assert ranges[0].norm_hi == 1.0 and ranges[1].norm_lo == 0.0
    # bin id widths (fixed-size ids, TemporalBinningStrategy.getFixedBinIdSize)
    assert month.fixed_bin_id_size == 6 and day.fixed_bin_id_size == 8


def test_compact_hilbert_equal_bits_matches_hilbert():
    import numpy as np

    from geowave_ray.index.hilbert import CompactHilbertCurve, HilbertCurve

    rng = np.random.default_rng(11)
    hc, ch = HilbertCurve(2, 16), CompactHilbertCurve([16, 16])
    coords = [rng.integers(0, 1 << 16, 2000).astype(np.uint64) for _ in range(2)]
    assert np.array_equal(hc.encode(coords), ch.encode(coords))


def test_compact_hilbert_roundtrip_unequal():
    import numpy as np

    from geowave_ray.index.hilbert import CompactHilbertCurve

    rng = np.random.default_rng(12)
    for bits in ([25, 25, 10], [10, 10, 40]):
        c = CompactHilbertCurve(bits)
        coords = [rng.integers(0, 1 << b, 3000).astype(np.uint64) for b in bits]
        h = c.encode(coords)
        assert int(h.max()) < (1 << c.total_bits)
        back = c.decode(h)
        for j in range(3):
            assert np.array_equal(back[j], coords[j])


def test_st_query_ranges_unequal_bits_lossless():
    """Query planning for the unequal-bit presets: every point the query
    box matches must fall inside some decomposed compact-Hilbert range."""
    import numpy as np

    from geowave_ray.index.tiered import spatial_temporal_strategy, st_query_ranges

    st = spatial_temporal_strategy("SPATIAL")  # (25, 25, 10)
    rng = np.random.default_rng(17)
    n = 5000
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-89, 89, n)
    t0 = int(np.datetime64("2024-01-01").astype("datetime64[ms]").astype(np.int64))
    t_ms = t0 + rng.integers(0, 300 * 86400_000, n)
    labels, cells = st.encode_points(lon, lat, t_ms)
    bbox = (-30.0, 10.0, 40.0, 60.0)
    trange = (t0 + 20 * 86400_000, t0 + 100 * 86400_000)
    ranges = st_query_ranges(st, bbox, trange, max_ranges=256)
    assert ranges
    by_year = {}
    for r in ranges:
        by_year.setdefault(r.year, []).append((r.lo, r.hi))
    matched = (
        (lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
        & (t_ms >= trange[0]) & (t_ms <= trange[1])
    )
    missed = 0
    for i in np.nonzero(matched)[0]:
        rs = by_year.get(int(labels[i]), [])
        if not any(lo <= int(cells[i]) <= hi for lo, hi in rs):
            missed += 1
    assert missed == 0


def test_custom_crs_strategy_conformance():
    """Bounded custom-CRS axes (Web-Mercator-like ranges): every point a
    native-coordinate query box matches must fall inside some decomposed
    query range (SpatialDimensionalityTypeProvider custom-CRS variants)."""
    import numpy as np

    from geowave_ray.index.tiered import custom_crs_strategy

    M = 20037508.342789244
    st = custom_crs_strategy((-M, M), (-M, M), bits=27)
    rng = np.random.default_rng(23)
    n = 5000
    x = rng.uniform(-M, M, n)
    y = rng.uniform(-M, M, n)
    cells = st.encode_points(x, y)
    box = (-3e6, 1e6, 8e6, 9e6)
    ranges = st.get_query_ranges([(box[0], box[2]), (box[1], box[3])], 128)
    assert ranges
    matched = (x >= box[0]) & (x <= box[2]) & (y >= box[1]) & (y <= box[3])
    finest = [r for r in ranges if r.tier == st.finest_tier]
    for i in np.nonzero(matched)[0]:
        assert any(r.lo <= int(cells[i]) <= r.hi for r in finest)


def test_custom_crs_wrap_x_splits():
    """wrap_x: a query range crossing the x wrap boundary splits (the
    antimeridian rule generalized to custom bounds) and still covers
    points on both sides."""
    import numpy as np

    from geowave_ray.index.tiered import custom_crs_strategy

    st = custom_crs_strategy((0.0, 1000.0), (0.0, 500.0), bits=15, wrap_x=True)
    # query wraps: x in [900, 100] (crossing 1000 -> 0)
    ranges = st.get_query_ranges([(900.0, 100.0), (100.0, 200.0)], 64)
    assert ranges
    x = np.array([950.0, 50.0, 500.0])
    y = np.array([150.0, 150.0, 150.0])
    cells = st.encode_points(x, y)
    finest = [r for r in ranges if r.tier == st.finest_tier]
    covered = [any(r.lo <= int(c) <= r.hi for r in finest) for c in cells]
    assert covered[0] and covered[1]  # both sides of the wrap
    assert not covered[2]  # far from the box


def test_custom_crs_store_end_to_end(tmp_path, ray_session):
    """GeoStore over a projected CRS: ingest with custom axes, pruned bbox
    query in native coordinates matches brute force."""
    import numpy as np
    import pyarrow as pa
    import ray

    from geowave_ray.geom.wkb import box_polygon
    from geowave_ray.index.tiered import custom_crs_strategy
    from geowave_ray.query.planner import SpatialQuery
    from geowave_ray.store import GeoStore

    M = 20037508.342789244
    strat = custom_crs_strategy((-M, M), (-M, M), bits=23)
    rng = np.random.default_rng(29)
    n = 4000
    t = pa.table(
        {
            "pid": np.arange(n, dtype=np.int64),
            "x": rng.uniform(-M, M, n),
            "y": rng.uniform(-M, M, n),
        }
    )
    s = GeoStore(str(tmp_path / "mercstore"), bits=23, prefix_bits=3, strategy=strat)
    s.ingest(ray.data.from_arrow(t).repartition(4), lon_col="x", lat_col="y", compute_stats=False)
    box = (-3e6, 1e6, 8e6, 9e6)
    q = SpatialQuery(box_polygon(*box), bits=23)
    got = s.query(q, columns=["pid"], lon_col="x", lat_col="y").to_pandas()
    x, y = t.column("x").to_numpy(), t.column("y").to_numpy()
    want = (x >= box[0]) & (x <= box[2]) & (y >= box[1]) & (y <= box[3])
    assert sorted(got["pid"]) == sorted(np.asarray(t.column("pid"))[want].tolist())


def test_unbounded_binned_crs_strategy():
    """Unbounded custom-CRS axes (fixed-span bins): encode/query-range
    conformance across bin boundaries, negative coordinates included."""
    import numpy as np

    from geowave_ray.index.tiered import binned_crs_strategy

    st = binned_crs_strategy(1000.0, 500.0, bits=12)
    rng = np.random.default_rng(31)
    n = 4000
    # coordinates far outside any bounded range, straddling bins — plus a
    # dense deterministic grid inside the query box (the random cloud is
    # too sparse to land there)
    x = np.concatenate([rng.uniform(-1e7, 1e7, n), np.linspace(-2400, 1700, 200)])
    y = np.concatenate([rng.uniform(-5e6, 5e6, n), np.linspace(-650, 850, 200)])
    bx, by, cells = st.encode_points(x, y)
    assert bx.min() < 0 < bx.max()  # negative bins exercised
    # query box crossing several bin boundaries on both axes
    box = ((-2500.0, 1800.0), (-700.0, 900.0))
    ranges = st.query_ranges([box[0], box[1]], max_ranges=256)
    assert ranges
    bykey = {}
    for rbx, rby, lo, hi in ranges:
        bykey.setdefault((rbx, rby), []).append((lo, hi))
    matched = (x >= box[0][0]) & (x <= box[0][1]) & (y >= box[1][0]) & (y <= box[1][1])
    assert matched.any()
    for i in np.nonzero(matched)[0]:
        rs = bykey.get((int(bx[i]), int(by[i])), [])
        assert any(lo <= int(cells[i]) <= hi for lo, hi in rs), i
    # a point in an untouched bin is NOT covered (pruning is real)
    fx, fy, fc = st.encode_points(np.array([9e6]), np.array([4e6]))
    assert (int(fx[0]), int(fy[0])) not in bykey
    # over-wide query raises instead of exploding the bin product
    import pytest

    with pytest.raises(ValueError):
        st.query_ranges([(-1e9, 1e9), (0.0, 1.0)])


def test_periodic_dimension_out_of_range_wrap():
    """ADVICE r3: out-of-range endpoints on a periodic axis must wrap
    modulo the range, not clamp (clamping drops the wrapped band)."""
    from geowave_ray.index.dimensions import PeriodicDimension

    d = PeriodicDimension(0.0, 360.0)
    # (350, 370) wraps: [350,360] + [0,10]
    rs = d.get_normalized_ranges(350.0, 370.0)
    assert len(rs) == 2
    lo_band = min(rs, key=lambda r: r.norm_lo)
    hi_band = max(rs, key=lambda r: r.norm_lo)
    assert lo_band.norm_lo == 0.0 and abs(lo_band.norm_hi - 10 / 360) < 1e-12
    assert abs(hi_band.norm_lo - 350 / 360) < 1e-12 and hi_band.norm_hi == 1.0
    # classic hi<lo wrap form still splits identically
    assert d.get_normalized_ranges(350.0, 10.0) == rs
    # full-axis query collapses to [0,1]
    full = d.get_normalized_ranges(-10.0, 400.0)
    assert len(full) == 1 and full[0].norm_lo == 0.0 and full[0].norm_hi == 1.0
    # ordinary in-range query: single band
    rs2 = d.get_normalized_ranges(10.0, 50.0)
    assert len(rs2) == 1
    assert abs(rs2[0].norm_lo - 10 / 360) < 1e-12
    assert abs(rs2[0].norm_hi - 50 / 360) < 1e-12


def test_temporal_binning_large_bin_counts():
    """Ported from reference TemporalBinningStrategyTest.java: a full-extent
    range spanning N calendar units decomposes into exactly N bins (DAY/
    MONTH/HOUR/MINUTE at 250k bins with the reference's arbitrary start
    times; YEAR at 25k — numpy datetime64[Y] range guard), every interior
    bin fully covered."""
    import numpy as np

    from geowave_ray.index.dimensions import TimeDimension

    for unit, arbitrary, n in [
        ("DAY", 123456789876, 250_000),
        ("MONTH", 9876543210, 250_000),
        ("YEAR", 0, 25_000),
        ("HOUR", 0, 250_000),
        ("MINUTE", 0, 250_000),
    ]:
        d = TimeDimension(unit)
        i0 = int(d._bin_index(np.int64(arbitrary)))
        start = int(d._bin_start_ms(np.int64(i0)))
        end = int(d._bin_start_ms(np.int64(i0 + n)))
        rs = d.get_normalized_ranges(start, end - 1)
        assert len(rs) == n, (unit, len(rs))
        assert rs[0].norm_lo == 0.0 and rs[0].norm_hi == 1.0
        assert rs[-1].norm_lo == 0.0 and rs[-1].norm_hi < 1.0
    # MINUTE bin label shape: YYYYMMDDHHMM
    d = TimeDimension("MINUTE")
    t = np.datetime64("2024-03-05T07:09:30").astype("datetime64[ms]").astype(np.int64)
    assert d.bins_of(np.array([t]))[0] == 202403050709
    assert d.bin_id_bytes(202403050709) == b"202403050709"


def test_mercator_forward_inverse():
    """EPSG:3857 closed forms: known anchor values (origin, +/-180 at the
    equator, the square-world latitude) and double-precision round-trip."""
    from geowave_ray.index.mercator import (
        MAX_LAT,
        MERC_MAX,
        mercator_forward,
        mercator_inverse,
    )

    x, y = mercator_forward(np.array([0.0, 180.0, -180.0]), np.zeros(3))
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    assert abs(x[1] - MERC_MAX) < 1e-6 and abs(x[2] + MERC_MAX) < 1e-6
    # the square-world latitude maps to y == MERC_MAX by construction
    _, ym = mercator_forward(np.zeros(1), np.array([MAX_LAT]))
    assert abs(ym[0] - MERC_MAX) < 1e-6
    assert abs(MAX_LAT - 85.05112877980659) < 1e-9
    # public EPSG:3857 example (OGC/EPSG test point): (2 dp tolerance)
    xs, ys = mercator_forward(np.array([-100.33333333]), np.array([24.38138888]))
    assert abs(xs[0] - (-11169055.58)) < 100.0 and abs(ys[0] - 2800000.0) < 5e4

    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 10_000)
    lat = rng.uniform(-MAX_LAT, MAX_LAT, 10_000)
    fx, fy = mercator_forward(lon, lat)
    rlon, rlat = mercator_inverse(fx, fy)
    assert np.max(np.abs(rlon - lon)) < 1e-9
    assert np.max(np.abs(rlat - lat)) < 1e-9


def test_web_mercator_strategy_projected_query():
    """Real reprojection end to end: points indexed in projected meters;
    a lon/lat query box projected through mercator_forward retrieves
    exactly the geographically-matching points via the custom-CRS query
    ranges (reference: GeoTools-projected indexing,
    SpatialDimensionalityTypeProvider.java:130-224)."""
    from geowave_ray.index.mercator import MAX_LAT, mercator_forward, web_mercator_strategy

    st = web_mercator_strategy(bits=25)
    rng = np.random.default_rng(31)
    n = 8000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-MAX_LAT, MAX_LAT, n)
    x, y = mercator_forward(lon, lat)
    cells = st.encode_points(x, y)
    qlon, qlat = (12.0, 64.0), (45.0, 71.0)  # geographic box (Scandinavia)
    qx, _ = mercator_forward(np.array(qlon), np.zeros(2))
    _, qy = mercator_forward(np.zeros(2), np.array(qlat))
    ranges = st.get_query_ranges([(qx[0], qx[1]), (qy[0], qy[1])], 256)
    assert ranges
    matched = (lon >= qlon[0]) & (lon <= qlon[1]) & (lat >= qlat[0]) & (lat <= qlat[1])
    finest = [r for r in ranges if r.tier == st.finest_tier]
    for i in np.nonzero(matched)[0]:
        assert any(r.lo <= int(cells[i]) <= r.hi for r in finest)


def test_tm_forward_inverse_and_utm_zones():
    """Spherical transverse Mercator (Snyder PP 1395 eqs. 8-1..8-6):
    central-meridian identities, round-trip, conformal local isotropy,
    and the UTM zone rule."""
    import numpy as np

    from geowave_ray.index.mercator import (
        R_MAJOR,
        tm_forward,
        tm_inverse,
        utm_zone,
        utm_zone_lon0,
    )

    # zone rule: 6-degree bands, zone 1 = [-180, -174), central meridians
    z = utm_zone(np.array([-180.0, -174.01, -0.01, 0.0, 6.0, 179.99]))
    np.testing.assert_array_equal(z, [1, 1, 30, 31, 32, 60])
    np.testing.assert_allclose(utm_zone_lon0(np.array([1, 31, 60])), [-177.0, 3.0, 177.0])

    # on the central meridian: x = 0, y = R * lat_rad (exact identities)
    lat = np.array([-60.0, -10.0, 0.0, 45.0, 80.0])
    x, y = tm_forward(np.full(5, 3.0), lat, 3.0)
    np.testing.assert_allclose(x, 0.0, atol=1e-9)
    np.testing.assert_allclose(y, R_MAJOR * np.radians(lat), rtol=1e-15)

    # round-trip within a zone
    rng = np.random.default_rng(17)
    lon = 3.0 + rng.uniform(-3, 3, 500)
    lat2 = rng.uniform(-84, 84, 500)
    fx, fy = tm_forward(lon, lat2, 3.0)
    blon, blat = tm_inverse(fx, fy, 3.0)
    np.testing.assert_allclose(blon, lon, atol=1e-9)
    np.testing.assert_allclose(blat, lat2, atol=1e-9)

    # conformality: at (lon0+2, 40) the scale factor is isotropic —
    # d(x,y)/d(east) and d(x,y)/d(north) have equal norms, orthogonal
    e = 1e-7
    p = (5.0, 40.0)
    x0, y0 = tm_forward(*p, 3.0)
    xe, ye = tm_forward(p[0] + e / np.cos(np.radians(p[1])), p[1], 3.0)
    xn, yn = tm_forward(p[0], p[1] + e, 3.0)
    de = np.array([float(xe - x0), float(ye - y0)])
    dn = np.array([float(xn - x0), float(yn - y0)])
    assert abs(np.linalg.norm(de) / np.linalg.norm(dn) - 1.0) < 1e-5
    assert abs(de @ dn) / (np.linalg.norm(de) * np.linalg.norm(dn)) < 1e-5

    # scale factor grows off-axis as 1/cos(asin(B)) >= 1 (secant rule)
    xq, _ = tm_forward(6.0, 0.0, 3.0)
    assert float(xq) > R_MAJOR * np.radians(3.0)  # stretched vs equirect


def test_ellipsoidal_tm_karney():
    """Karney-series transverse Mercator: rectifying radius matches the
    published WGS84 constant, the central-meridian northing matches an
    INDEPENDENT numeric integration of the meridian arc to ~1e-9 m (the
    paper's few-nanometers claim), forward/inverse round-trip to 1e-12
    deg, x is exactly 0 on the central meridian, and the spherical form
    stays within the expected e^2-scale envelope."""
    from geowave_ray.index.mercator import (
        R_MAJOR,
        TM_A,
        WGS84_E2,
        tm_forward,
        tm_forward_ell,
        tm_inverse_ell,
    )

    assert abs(TM_A - 6367449.145823415) < 1e-6  # WGS84 rectifying radius

    # independent check of the alpha series + conformal latitude: meridian
    # arc by brute-force trapezoid integration of the meridian curvature
    phi = np.linspace(0.0, np.radians(45.0), 2_000_001)
    arc = np.trapz(
        R_MAJOR * (1 - WGS84_E2) / (1 - WGS84_E2 * np.sin(phi) ** 2) ** 1.5, phi
    )
    _, y = tm_forward_ell(3.0, 45.0, 3.0, k0=1.0)
    assert abs(float(y) - arc) < 1e-6

    # round-trip (validates beta series + the Newton tau solve against alpha)
    lon = np.array([0.2, 5.9, -2.5, 3.0])
    lat = np.array([-83.0, 12.3456, 61.9, 0.0])
    fx, fy = tm_forward_ell(lon, lat, 3.0)
    blon, blat = tm_inverse_ell(fx, fy, 3.0)
    assert np.abs(blon - lon).max() < 1e-12
    assert np.abs(blat - lat).max() < 1e-12

    # exact zero easting on the central meridian
    cx, _ = tm_forward_ell(np.array([3.0]), np.array([37.0]), 3.0)
    assert cx[0] == 0.0

    # spherical form agrees to the e^2 scale (sanity that both project the
    # same zone-centered conformal cylinder)
    sx, sy = tm_forward(0.2, 45.0, 3.0)
    ex, ey = tm_forward_ell(0.2, 45.0, 3.0, k0=1.0)
    assert abs(sx - ex) / abs(ex) < 0.01
    assert abs(sy - ey) / abs(ey) < 0.01


def test_geohash_neighbors_symmetry_and_wrap():
    """Neighbor algebra: direction d from A lands on B iff the opposite
    direction from B lands on A; the antimeridian column wraps."""
    import numpy as np

    from geowave_ray.index.geohash import _bit_counts, geohash_from_xy

    p = 4
    nbits, nlon, nlat = _bit_counts(p)
    nx, ny = 1 << nlon, 1 << nlat
    dirs = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
    rng = np.random.default_rng(7)
    xs = rng.integers(0, nx, 50)
    ys = rng.integers(1, ny - 1, 50)  # keep off the poles for symmetry
    for dx, dy in dirs:
        xn = (xs + dx + nx) % nx
        yn = ys + dy
        back_x = (xn - dx + nx) % nx
        back_y = yn - dy
        assert (back_x == xs).all() and (back_y == ys).all()
        a = geohash_from_xy(xs, ys, p)
        b = geohash_from_xy(xn, yn, p)
        assert (a != b).all()
    # explicit antimeridian wrap: x = nx-1 stepping +1 lands at x = 0
    gh_w = geohash_from_xy(np.array([nx - 1]), np.array([ny // 2]), p)
    gh_e = geohash_from_xy(np.array([0]), np.array([ny // 2]), p)
    assert gh_w[0] != gh_e[0]

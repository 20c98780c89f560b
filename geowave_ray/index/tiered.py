"""Tiered space-filling-curve index strategy (pure NumPy).

Re-expresses the behavior of GeoWave's TieredSFCIndexStrategy
(``core/index/.../sfc/tiered/TieredSFCIndexStrategy.java:167-407``) and
BinnedSFCUtils (``sfc/binned/BinnedSFCUtils.java:36-114``):

- insertion: iterate tiers finest -> coarsest; accept the first tier where
  the entry's cell box is a single cell OR its estimated cell count is
  <= max_dup (default 2^(#dims that are true ranges)); the coarsest tier
  always accepts.  Multi-cell entries enumerate every cell in the box
  (the reference decomposes to ranges then expands all intermediary ids).
- query: every tier contributes ranges; per-dimension bins (antimeridian
  split, temporal year bins) are cartesian-producted, max_ranges divided
  evenly across bins; edges are normalized over-inclusively.
- keys: tier byte (== bits of precision) + concatenated fixed-size bin ids
  + big-endian curve index in ceil(total_bits/8) bytes.

The engine-facing vectorized paths produce plain Arrow-friendly columns
``(tier: uint8, cell: uint64)`` instead of byte rows; the byte layout is
kept only for reference-parity tests.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np

from .dimensions import (
    norm_to_cell_max,
    norm_to_cell_min,
    norm_to_cell_point,
    norm_to_cell_query_max,
    norm_to_cell_query_min,
)
from .hilbert import HilbertCurve
from .zorder import ZOrderCurve

__all__ = ["TieredStrategy", "QueryRange", "spatial_strategy", "spatial_temporal_strategy"]

DEFAULT_MAX_DUP_PER_DIM = 2  # TieredSFCIndexStrategy.java:58


@dataclass(frozen=True)
class QueryRange:
    tier: int
    bin_id: bytes
    lo: int
    hi: int  # inclusive

    def to_byte_range(self, total_bits: int) -> tuple[bytes, bytes]:
        nbytes = (total_bits + 7) // 8
        return (
            bytes([self.tier]) + self.bin_id + int(self.lo).to_bytes(nbytes, "big"),
            bytes([self.tier]) + self.bin_id + int(self.hi).to_bytes(nbytes, "big"),
        )


class _TrivialCurve:
    """0-bit curve: the whole space is one cell."""

    total_bits = 0

    def __init__(self, n_dims: int):
        self.n_dims = n_dims
        self.bits = 0

    def encode(self, coords):
        return np.zeros(np.asarray(coords[0]).shape, dtype=np.uint64)

    def decode(self, h):
        return [np.zeros(np.asarray(h).shape, dtype=np.uint64) for _ in range(self.n_dims)]

    def decompose_range(self, mins, maxs, max_ranges=-1, **_):
        return [(0, 0)]


class TieredStrategy:
    """dims: dimension definition objects (see ``dimensions.py``);
    tiers: ascending list of bits-of-precision (tier id byte == bits)."""

    def __init__(self, dims, tiers, curve_type: str = "hilbert", max_dup_per_dim: int = DEFAULT_MAX_DUP_PER_DIM):
        self.dims = list(dims)
        self.tiers = sorted(tiers)
        self.curve_type = curve_type
        self.max_dup_per_dim = max_dup_per_dim
        n = len(self.dims)
        self._curves = {}
        for t in self.tiers:
            if t == 0:
                self._curves[t] = _TrivialCurve(n)
            elif curve_type == "hilbert":
                self._curves[t] = HilbertCurve(n, t)
            elif curve_type == "zorder":
                self._curves[t] = ZOrderCurve(n, t)
            else:
                raise ValueError(curve_type)

    @property
    def n_dims(self) -> int:
        return len(self.dims)

    @property
    def finest_tier(self) -> int:
        return self.tiers[-1]

    def curve(self, tier: int):
        return self._curves[tier]

    # ------------------------------------------------------------ vectorized
    def encode_points(self, *values: np.ndarray) -> np.ndarray:
        """Point entries always land on the finest tier; returns cell ids
        there (tier is the constant ``self.finest_tier``)."""
        t = self.finest_tier
        bins = 1 << t
        coords = [
            norm_to_cell_point(dim.normalize(np.asarray(v, dtype=np.float64)), bins)
            for dim, v in zip(self.dims, values)
        ]
        return self._curves[t].encode(coords)

    def decode_cells(self, tier: int, cells: np.ndarray) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """(tier, cell) -> per-dim native (lo, hi) arrays of the cell extent."""
        bins = 1 << tier
        coords = self._curves[tier].decode(np.asarray(cells, dtype=np.uint64))
        los, his = [], []
        for dim, c in zip(self.dims, coords):
            cf = c.astype(np.float64)
            los.append(dim.denormalize(cf / bins))
            his.append(dim.denormalize((cf + 1) / bins))
        return los, his

    def insert_boxes(
        self,
        mins: list[np.ndarray],
        maxs: list[np.ndarray],
        max_dup: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized tiered insertion of N axis-aligned boxes (native
        coordinates, already single-bin — split antimeridian boxes first).

        Returns (row_idx:int64, tier:uint8, cell:uint64) with one output row
        per (entry, cell) duplicate, mirroring InsertionIds expansion.
        """
        n = self.n_dims
        norm_lo = [d.normalize(np.asarray(m, dtype=np.float64)) for d, m in zip(self.dims, mins)]
        norm_hi = [d.normalize(np.asarray(m, dtype=np.float64)) for d, m in zip(self.dims, maxs)]
        n_rows = norm_lo[0].shape[0]
        if max_dup is None:
            # 2^(#dims whose min != max)  (TieredSFCIndexStrategy.getRanges)
            is_range = np.zeros(n_rows, dtype=np.int64)
            for j in range(n):
                is_range += (norm_lo[j] != norm_hi[j]).astype(np.int64)
            max_dup_row = self.max_dup_per_dim ** is_range
        else:
            max_dup_row = np.full(n_rows, max_dup, dtype=np.int64)

        out_idx: list[np.ndarray] = []
        out_tier: list[np.ndarray] = []
        out_cell: list[np.ndarray] = []
        unassigned = np.ones(n_rows, dtype=bool)
        for ti, t in enumerate(reversed(self.tiers)):  # finest -> coarsest
            if not unassigned.any():
                break
            bins = 1 << t
            idx_u = np.nonzero(unassigned)[0]
            cmin = [norm_to_cell_min(norm_lo[j][idx_u], bins) for j in range(n)]
            cmax = [
                np.maximum(norm_to_cell_max(norm_hi[j][idx_u], bins), cmin[j]) for j in range(n)
            ]
            ext = [(cmax[j] - cmin[j] + np.uint64(1)).astype(np.int64) for j in range(n)]
            count = ext[0].copy()
            for j in range(1, n):
                count *= ext[j]
            is_coarsest = ti == len(self.tiers) - 1
            accept = (count == 1) | (count <= max_dup_row[idx_u])
            if is_coarsest:
                accept[:] = True
            if not accept.any():
                continue
            acc = np.nonzero(accept)[0]
            rows = idx_u[acc]
            cnt = count[acc]
            total = int(cnt.sum())
            rep = np.repeat(np.arange(len(acc)), cnt)
            # rank within each row's expansion, dim 0 fastest
            starts = np.cumsum(cnt) - cnt
            r = np.arange(total, dtype=np.int64) - starts[rep]
            coords = []
            for j in range(n):
                e = ext[j][acc][rep]
                coords.append(cmin[j][acc][rep] + (r % e).astype(np.uint64))
                r = r // e
            cells = self._curves[t].encode(coords)
            out_idx.append(np.asarray(rows)[rep])
            out_tier.append(np.full(total, t, dtype=np.uint8))
            out_cell.append(cells)
            unassigned[rows] = False
        if not out_idx:
            return (
                np.zeros(0, dtype=np.int64),
                np.zeros(0, dtype=np.uint8),
                np.zeros(0, dtype=np.uint64),
            )
        return (
            np.concatenate(out_idx),
            np.concatenate(out_tier),
            np.concatenate(out_cell),
        )

    # ------------------------------------------------------------ scalar API
    def _binned_boxes(self, ranges: list[tuple[float, float]]):
        """Cartesian product of per-dimension bin splits ->
        [(bin_id_bytes, [(norm_lo, norm_hi)] per dim)]."""
        per_dim = [
            dim.get_normalized_ranges(lo, hi) for dim, (lo, hi) in zip(self.dims, ranges)
        ]
        out = []
        for combo in itertools.product(*per_dim):
            bin_id = b"".join(br.bin_id for br in combo)
            out.append((bin_id, [(br.norm_lo, br.norm_hi) for br in combo]))
        return out

    def get_insertion_ids(
        self, ranges: list[tuple[float, float]], max_dup: int | None = None
    ) -> list[bytes]:
        """Scalar reference-parity insertion: returns GeoWave-layout byte ids
        (tier byte + bin ids + big-endian curve index)."""
        n = self.n_dims
        if max_dup is None:
            n_true_ranges = sum(1 for lo, hi in ranges if lo != hi)
            max_dup = self.max_dup_per_dim**n_true_ranges
        out: list[bytes] = []
        for bin_id, norm_box in self._binned_boxes(ranges):
            for ti, t in enumerate(reversed(self.tiers)):
                bins = 1 << t
                cmin = [int(norm_to_cell_min(np.float64(lo), bins)) for lo, _ in norm_box]
                cmax = [
                    max(int(norm_to_cell_max(np.float64(hi), bins)), cmin[j])
                    for j, (_, hi) in enumerate(norm_box)
                ]
                count = 1
                for j in range(n):
                    count *= cmax[j] - cmin[j] + 1
                is_coarsest = ti == len(self.tiers) - 1
                if count == 1 or count <= max_dup or is_coarsest:
                    curve = self._curves[t]
                    nbytes = (curve.total_bits + 7) // 8
                    # point entries use the point (ceil-1) rule via encode of
                    # the single cell; boxes enumerate the cell rectangle
                    if all(lo == hi for lo, hi in norm_box):
                        pcell = [
                            norm_to_cell_point(np.float64(lo), bins).reshape(1)
                            for lo, _ in norm_box
                        ]
                        cells = [int(curve.encode(pcell)[0])]
                    else:
                        combos = itertools.product(
                            *[range(cmin[j], cmax[j] + 1) for j in range(n)]
                        )
                        cells = sorted(
                            int(
                                curve.encode(
                                    [np.asarray([c[j]], dtype=np.uint64) for j in range(n)]
                                )[0]
                            )
                            for c in combos
                        )
                    for cell in cells:
                        out.append(bytes([t]) + bin_id + int(cell).to_bytes(nbytes, "big"))
                    break
        return out

    def cell_bits(self, tier: int) -> int:
        """Bit width of cell ids at a tier (prefix-partitioning width)."""
        return 2 * tier

    def get_query_ranges(
        self,
        ranges: list[tuple[float, float]],
        max_ranges: int = -1,
        occupied_tiers: list[int] | None = None,
    ) -> list[QueryRange]:
        """Per-tier over-inclusive range decomposition
        (TieredSFCIndexStrategy.getQueryRanges + BinnedSFCUtils.getQueryRanges)."""
        binned = self._binned_boxes(ranges)
        per_bin_max = max_ranges
        if max_ranges > 1 and len(binned) > 1:
            per_bin_max = -(-max_ranges // len(binned))  # ceil div
        tiers = occupied_tiers if occupied_tiers is not None else self.tiers
        out: list[QueryRange] = []
        for t in sorted(tiers, reverse=True):  # finest first, as reference
            curve = self._curves[t]
            bins = 1 << t
            for bin_id, norm_box in binned:
                cmin, cmax = [], []
                for lo, hi in norm_box:
                    a = int(norm_to_cell_query_min(np.float64(lo), bins))
                    b = int(norm_to_cell_query_max(np.float64(hi), bins))
                    if a > b:
                        b = a
                    cmin.append(a)
                    cmax.append(b)
                for lo, hi in curve.decompose_range(cmin, cmax, per_bin_max):
                    out.append(QueryRange(t, bin_id, lo, hi))
        return out

    def get_range_for_id(self, tier: int, cell: int, bin_id: bytes = b"") -> list[tuple[float, float]]:
        los, his = self.decode_cells(tier, np.asarray([cell], dtype=np.uint64))
        # NOTE: binned (temporal) denormalization would offset by bin start;
        # spatial dims have no bins.
        return [(float(lo[0]), float(hi[0])) for lo, hi in zip(los, his)]


def spatial_strategy(
    bits: int = 31,
    tiers: list[int] | None = None,
    curve_type: str = "hilbert",
    max_dup_per_dim: int = DEFAULT_MAX_DUP_PER_DIM,
) -> TieredStrategy:
    """GeoWave's default SPATIAL_IDX geometry: (Longitude, Latitude(half-range))
    full-incremental tiers 0..bits (SpatialDimensionalityTypeProvider.java:44-54)."""
    from .dimensions import LatitudeDimension, LongitudeDimension

    if tiers is None:
        tiers = list(range(bits + 1))
    return TieredStrategy(
        [LongitudeDimension(), LatitudeDimension(half_range=True)],
        tiers,
        curve_type,
        max_dup_per_dim,
    )


def custom_crs_strategy(
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 31,
    wrap_x: bool = False,
    tiers: list[int] | None = None,
    curve_type: str = "hilbert",
    max_dup_per_dim: int = DEFAULT_MAX_DUP_PER_DIM,
) -> TieredStrategy:
    """Custom-CRS spatial index: bounded x/y axes with arbitrary native
    ranges (a projected CRS like Web Mercator), mirroring the reference's
    CustomCrsIndexModel bounded variants
    (SpatialDimensionalityTypeProvider.java:130-224).  ``wrap_x`` makes the
    x axis periodic (wrap-split query ranges, the antimeridian rule
    generalized).  For UNBOUNDED custom axes use ``binned_crs_strategy``
    (fixed-span binned dimensions, the time-periodicity pattern)."""
    from .dimensions import BasicDimension, PeriodicDimension

    if tiers is None:
        tiers = list(range(bits + 1))
    xd = (PeriodicDimension if wrap_x else BasicDimension)(x_range[0], x_range[1])
    yd = BasicDimension(y_range[0], y_range[1])
    return TieredStrategy([xd, yd], tiers, curve_type, max_dup_per_dim)


class BinnedCrsStrategy:
    """Single-tier 2-D strategy over UNBOUNDED custom-CRS axes: each axis
    is binned into fixed-width spans (UnboundedDimension; a bounded
    BasicDimension mixes in as the single bin 0), and keys are
    (bin_x, bin_y, cell) with cell = the curve index of the within-bin
    normalized coordinates at ``bits``.  This is the reference's
    unbounded custom-CRS shape (SpatialDimensionalityTypeProvider.java:
    130-224 — unbounded axes bin like time periodicity), the spatial
    sibling of SpatialTemporalStrategy's calendar-binned time axis."""

    def __init__(self, dims, bits: int = 24, curve_type: str = "hilbert"):
        from .dimensions import UnboundedDimension

        if len(dims) != 2:
            raise ValueError("BinnedCrsStrategy is 2-D")
        self.dims = list(dims)
        self.bits = bits
        self._unbounded = [isinstance(d, UnboundedDimension) for d in self.dims]
        self.curve = (
            HilbertCurve(2, bits) if curve_type == "hilbert" else ZOrderCurve(2, bits)
        )

    def encode_points(self, x, y):
        """-> (bin_x, bin_y, cell) int64/int64/uint64 arrays."""
        bins = 1 << self.bits
        labels, coords = [], []
        for d, v, unb in zip(self.dims, (x, y), self._unbounded):
            v = np.asarray(v, dtype=np.float64)
            if unb:
                lab, norm = d.normalize_within_bin(v)
            else:
                lab, norm = np.zeros(len(v), dtype=np.int64), d.normalize(v)
            labels.append(lab)
            coords.append(norm_to_cell_point(norm, bins))
        return labels[0], labels[1], self.curve.encode(coords)

    def query_ranges(self, ranges, max_ranges: int = 64):
        """[(lo_x, hi_x), (lo_y, hi_y)] native -> list of
        (bin_x, bin_y, cell_lo, cell_hi)."""
        import itertools
        import struct

        per_dim = []
        for d, (lo, hi), unb in zip(self.dims, ranges, self._unbounded):
            brs = d.get_normalized_ranges(lo, hi)
            if unb:
                per_dim.append(
                    [(struct.unpack(">q", br.bin_id)[0], br.norm_lo, br.norm_hi) for br in brs]
                )
            else:
                per_dim.append([(0, br.norm_lo, br.norm_hi) for br in brs])
        bins = 1 << self.bits
        n_combo = max(len(per_dim[0]) * len(per_dim[1]), 1)
        per_combo = max_ranges if max_ranges <= 1 else -(-max_ranges // n_combo)
        out = []
        for (bx, xlo, xhi), (by, ylo, yhi) in itertools.product(*per_dim):
            cmin = [
                int(norm_to_cell_query_min(np.float64(xlo), bins)),
                int(norm_to_cell_query_min(np.float64(ylo), bins)),
            ]
            cmax = [
                max(int(norm_to_cell_query_max(np.float64(xhi), bins)), cmin[0]),
                max(int(norm_to_cell_query_max(np.float64(yhi), bins)), cmin[1]),
            ]
            for lo, hi in self.curve.decompose_range(cmin, cmax, per_combo):
                out.append((bx, by, lo, hi))
        return out


def binned_crs_strategy(span_x: float, span_y: float, bits: int = 24, curve_type: str = "hilbert") -> BinnedCrsStrategy:
    """Unbounded custom-CRS index: both axes binned into fixed spans."""
    from .dimensions import UnboundedDimension

    return BinnedCrsStrategy(
        [UnboundedDimension(span_x), UnboundedDimension(span_y)], bits, curve_type
    )


ST_BIAS_PRESETS = {
    # SpatialTemporalDimensionalityTypeProvider.java:207-246 (Bias enum):
    # (lon_bits, lat_bits, time_bits)
    "BALANCED": (20, 20, 20),
    "SPATIAL": (25, 25, 10),
    "TEMPORAL": (10, 10, 40),
}


def spatial_temporal_strategy(
    bits: tuple[int, int, int] | str = (20, 20, 20),
    curve_type: str = "hilbert",
    periodicity: str = "YEAR",
) -> "SpatialTemporalStrategy":
    """``bits`` may be a per-dimension tuple or a Bias preset name
    ("BALANCED" | "SPATIAL" | "TEMPORAL")."""
    if isinstance(bits, str):
        bits = ST_BIAS_PRESETS[bits.upper()]
    return SpatialTemporalStrategy(bits, curve_type, periodicity=periodicity)


class SpatialTemporalStrategy:
    """3-D (lon, lat, time) tiered strategy with calendar binning on time.

    BALANCED default (20,20,20) bits; unequal-bit Bias presets SPATIAL
    (25,25,10) and TEMPORAL (10,10,40) use the compact Hilbert curve with
    per-dimension precisions
    (SpatialTemporalDimensionalityTypeProvider.java:207-246).  Keys are
    tier byte + fixed-size time-bin id (4 ASCII bytes for YEAR) +
    ceil(sum(bits)/8)-byte curve index — 13 bytes for all three presets,
    matching TieredSFCIndexStrategyTest.testSingleEntry.
    """

    def __init__(self, bits=(20, 20, 20), curve_type="hilbert", periodicity="YEAR"):
        from .dimensions import LatitudeDimension, LongitudeDimension, TimeDimension
        from .hilbert import CompactHilbertCurve

        self.bits_per_dim = tuple(int(b) for b in bits)
        self.equal_bits = len(set(self.bits_per_dim)) == 1
        self.bits = max(self.bits_per_dim)
        self.lon = LongitudeDimension()
        self.lat = LatitudeDimension(half_range=True)
        self.time = TimeDimension(periodicity=periodicity)
        self.tiers = list(range(self.bits + 1))
        self._spatial_norm = TieredStrategy(
            [self.lon, self.lat], list(range(min(self.bits_per_dim[:2]) + 1)), curve_type
        )
        self._curves = self._spatial_norm._curves  # reuse tables
        if self.equal_bits:
            self.curve3 = {
                t: (HilbertCurve(3, t) if t > 0 else _TrivialCurve(3))
                for t in self.tiers
            }
        else:
            # unequal bits: the full-resolution curve is compact Hilbert;
            # coarser tiers scale every dimension down by the same amount
            # (clamped at 0 bits)
            self.curve3 = {}
            for t in self.tiers:
                drop = self.bits - t
                tb = [max(b - drop, 0) for b in self.bits_per_dim]
                if sum(tb) == 0:
                    self.curve3[t] = _TrivialCurve(3)
                else:
                    self.curve3[t] = CompactHilbertCurve(tb)

    @property
    def finest_tier(self):
        return self.tiers[-1]

    def _dim_bins(self, tier: int) -> list[int]:
        drop = self.bits - tier
        return [1 << max(b - drop, 0) for b in self.bits_per_dim]

    def encode_points(self, lon, lat, t_ms) -> tuple[np.ndarray, np.ndarray]:
        """-> (time-bin label:int64, cell:uint64) at the finest tier."""
        t = self.finest_tier
        nb = self._dim_bins(t)
        labels, tnorm = self.time.normalize_within_bin(np.asarray(t_ms))
        coords = [
            norm_to_cell_point(self.lon.normalize(lon), nb[0]),
            norm_to_cell_point(self.lat.normalize(lat), nb[1]),
            norm_to_cell_point(tnorm, nb[2]),
        ]
        return labels, self.curve3[t].encode(coords)

    def insertion_id_bytes(self, lon: float, lat: float, t_ms: int) -> bytes:
        labels, cells = self.encode_points(
            np.asarray([lon]), np.asarray([lat]), np.asarray([t_ms])
        )
        t = self.finest_tier
        nbytes = (sum(self.bits_per_dim) + 7) // 8
        return (
            bytes([t])
            + self.time.bin_id_bytes(int(labels[0]))
            + int(cells[0]).to_bytes(nbytes, "big")
        )


@dataclass(frozen=True)
class STQueryRange:
    year: int
    tier: int
    lo: int
    hi: int


def st_query_ranges(
    st: "SpatialTemporalStrategy",
    bbox: tuple[float, float, float, float],
    t_range_ms: tuple[int, int],
    max_ranges: int = 64,
    tiers: list[int] | None = None,
) -> list["STQueryRange"]:
    """3-D query planning for the spatial-temporal strategy: per YEAR bin
    and per tier, over-inclusive (lon, lat, time) box -> Hilbert ranges
    (antimeridian lon split included) — the binned analog of
    TieredSFCIndexStrategy.getQueryRanges."""
    minx, miny, maxx, maxy = bbox
    lon_bins = st.lon.get_normalized_ranges(minx, maxx)
    lat_bin = st.lat.get_normalized_ranges(miny, maxy)[0]
    time_bins = st.time.get_normalized_ranges(t_range_ms[0], t_range_ms[1])
    use_tiers = tiers if tiers is not None else [st.finest_tier]
    n_bins = max(len(lon_bins) * len(time_bins), 1)
    per_bin_max = max_ranges
    if max_ranges > 1 and n_bins > 1:
        per_bin_max = -(-max_ranges // n_bins)
    out: list[STQueryRange] = []
    for t in sorted(use_tiers, reverse=True):
        curve = st.curve3[t]
        dim_bins = st._dim_bins(t)
        for tb in time_bins:
            year = int(tb.bin_id.decode())
            for lb in lon_bins:
                cmin, cmax = [], []
                for (lo, hi), bins in zip(
                    (
                        (lb.norm_lo, lb.norm_hi),
                        (lat_bin.norm_lo, lat_bin.norm_hi),
                        (tb.norm_lo, tb.norm_hi),
                    ),
                    dim_bins,
                ):
                    a = int(norm_to_cell_query_min(np.float64(lo), bins))
                    b = int(norm_to_cell_query_max(np.float64(hi), bins))
                    if a > b:
                        b = a
                    cmin.append(a)
                    cmax.append(b)
                for lo, hi in curve.decompose_range(cmin, cmax, per_bin_max):
                    out.append(STQueryRange(year, t, lo, hi))
    return out

"""Dimension definitions + normalization rules (pure NumPy).

Behavior mirrors the reference's numeric dimension model:
- clamp + linear normalize to [0,1]
  (``core/index/.../dimension/BasicDimensionDefinition.java:21-66``)
- longitude antimeridian bin splitting
  (``core/geotime/.../index/dimension/LongitudeDefinition.java:33-67``)
- latitude optional half-range mode (normalized over [-180,180] so cells are
  square; ``LatitudeDefinition.java:19-43``)
- temporal binning by calendar unit, YEAR bin id = 4 ASCII digit bytes
  (``core/geotime/.../index/dimension/TemporalBinningStrategy.java:200-270``)
- bin-edge normalization rules of
  ``PrimitiveHilbertSFCOperations.normalizeDimension:210-235``:
  insertion min edge -> min(floor(v*bins), bins-1);
  insertion max edge / point -> max(ceil(v*bins)-1, 0);
  over-inclusive query edges swap the two rules.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

MS_PER_YEAR_UNUSED = None  # years vary; binning is calendar-based

__all__ = [
    "BinRange",
    "BasicDimension",
    "LongitudeDimension",
    "LatitudeDimension",
    "TimeDimension",
    "norm_to_cell_point",
    "norm_to_cell_min",
    "norm_to_cell_max",
    "norm_to_cell_query_min",
    "norm_to_cell_query_max",
]


# ---------------------------------------------------------------- cell rules
def norm_to_cell_point(norm: np.ndarray, bins: int) -> np.ndarray:
    """Point / insertion-max rule: max(ceil(v*bins)-1, 0)."""
    c = np.ceil(np.asarray(norm, dtype=np.float64) * bins) - 1
    return np.maximum(c, 0).astype(np.uint64)


norm_to_cell_max = norm_to_cell_point


def norm_to_cell_min(norm: np.ndarray, bins: int) -> np.ndarray:
    """Insertion-min rule: min(floor(v*bins), bins-1)."""
    c = np.floor(np.asarray(norm, dtype=np.float64) * bins)
    return np.minimum(c, bins - 1).astype(np.uint64)


def norm_to_cell_query_min(norm: np.ndarray, bins: int) -> np.ndarray:
    """Over-inclusive query min edge: max(ceil(v*bins)-1, 0)."""
    return norm_to_cell_point(norm, bins)


def norm_to_cell_query_max(norm: np.ndarray, bins: int) -> np.ndarray:
    """Over-inclusive query max edge: min(floor(v*bins), bins-1)."""
    return norm_to_cell_min(norm, bins)


@dataclass(frozen=True)
class BinRange:
    """One bin's slice of a (possibly multi-bin) 1-D range.

    ``bin_id`` is b"" for unbinned bounded dimensions; normalized lo/hi are
    in [0,1] within the bin.
    """

    bin_id: bytes
    norm_lo: float
    norm_hi: float


# ---------------------------------------------------------------- dimensions
@dataclass(frozen=True)
class BasicDimension:
    """Bounded numeric axis; values clamped into [lo, hi] then normalized."""

    lo: float
    hi: float
    fixed_bin_id_size: int = 0

    @property
    def range(self) -> float:
        return self.hi - self.lo

    def normalize(self, v: np.ndarray) -> np.ndarray:
        v = np.clip(np.asarray(v, dtype=np.float64), self.lo, self.hi)
        return (v - self.lo) / (self.hi - self.lo)

    def denormalize(self, n: np.ndarray) -> np.ndarray:
        return np.asarray(n, dtype=np.float64) * (self.hi - self.lo) + self.lo

    def get_normalized_ranges(self, lo: float, hi: float) -> list[BinRange]:
        nlo = float(self.normalize(lo))
        nhi = float(self.normalize(hi))
        return [BinRange(b"", min(nlo, nhi), max(nlo, nhi))]


@dataclass(frozen=True)
class LongitudeDimension(BasicDimension):
    """[-180,180] with antimeridian splitting: a range whose normalized max <
    normalized min splits into two bins [-180,max] and [min,180]
    (LongitudeDefinition.java:40-68).  Out-of-range RANGE endpoints WRAP
    (``getNormalizedLongitude``: 200 -> -160), so (150, 200) yields both
    bands; single values (min==max) clamp like the base class, and the JTS
    empty-geometry envelope (min=0, max=-1) yields no ranges instead of a
    spurious dateline crossing (reference returns the inverted range, with
    the same empty-scan effect).  Point-encode ``normalize`` stays clamped
    — the reference wraps only in range decomposition."""

    lo: float = -180.0
    hi: float = 180.0

    @staticmethod
    def wrap_longitude(lon: float) -> float:
        """LongitudeDefinition.getNormalizedLongitude: identity inside
        [-180, 180], modular wrap into (-180, 180] outside."""
        if -180.0 <= lon <= 180.0:
            return lon
        off = lon + 180.0
        return (math.ceil(abs(off) / 360.0) * 360.0 + off) % 360.0 - 180.0

    def get_normalized_ranges(self, lo: float, hi: float) -> list[BinRange]:
        if lo == hi:  # single value: clamp (reference super() path)
            return super().get_normalized_ranges(lo, hi)
        if lo == 0.0 and hi == -1.0:  # JTS empty-geometry envelope
            return []
        nlo = (self.wrap_longitude(lo) + 180.0) / 360.0
        nhi = (self.wrap_longitude(hi) + 180.0) / 360.0
        if nhi < nlo:  # crosses the antimeridian
            return [BinRange(b"", 0.0, nhi), BinRange(b"", nlo, 1.0)]
        return [BinRange(b"", nlo, nhi)]


@dataclass(frozen=True)
class PeriodicDimension(BasicDimension):
    """Bounded axis that WRAPS (a projected longitude / easting in a custom
    CRS): a query range whose normalized max < normalized min splits into
    two bins [lo, hi_norm] and [lo_norm, hi] — the LongitudeDefinition
    antimeridian rule generalized to arbitrary bounds
    (SpatialDimensionalityTypeProvider.java:130-224 custom-CRS axes)."""

    def get_normalized_ranges(self, lo: float, hi: float) -> list[BinRange]:
        rng = self.hi - self.lo
        if hi - lo >= rng:  # query spans the whole axis
            return [BinRange(b"", 0.0, 1.0)]
        # wrap endpoints modulo the axis range — the inherited clamp would
        # silently drop the wrapped band of an out-of-range query, e.g.
        # (350, 370) on [0, 360] losing [0, 10]
        nlo = ((lo - self.lo) % rng) / rng
        nhi = ((hi - self.lo) % rng) / rng
        if nhi < nlo:  # crosses the wrap boundary
            return [BinRange(b"", 0.0, nhi), BinRange(b"", nlo, 1.0)]
        return [BinRange(b"", nlo, nhi)]


@dataclass(frozen=True)
class LatitudeDimension(BasicDimension):
    """Latitude: values clamped to ±90.  With ``half_range`` (GeoWave's
    default spatial index passes true) normalization spans [-180,180] so
    lat/lon cells are square (LatitudeDefinition.java:19-43)."""

    lo: float = -90.0
    hi: float = 90.0
    half_range: bool = False

    def normalize(self, v: np.ndarray) -> np.ndarray:
        v = np.clip(np.asarray(v, dtype=np.float64), -90.0, 90.0)
        if self.half_range:
            return (v + 180.0) / 360.0
        return (v + 90.0) / 180.0

    def denormalize(self, n: np.ndarray) -> np.ndarray:
        n = np.asarray(n, dtype=np.float64)
        if self.half_range:
            return n * 360.0 - 180.0
        return n * 180.0 - 90.0

    def get_normalized_ranges(self, lo: float, hi: float) -> list[BinRange]:
        nlo = float(self.normalize(lo))
        nhi = float(self.normalize(hi))
        return [BinRange(b"", min(nlo, nhi), max(nlo, nhi))]


@dataclass(frozen=True)
class UnboundedDimension:
    """Unbounded numeric axis binned into fixed-width spans — the
    custom-CRS UNBOUNDED variant
    (SpatialDimensionalityTypeProvider.java:130-224: unbounded axes are
    binned exactly like time periodicity; cf. TemporalBinningStrategy).
    Bin id = 8-byte big-endian signed bin ordinal floor(v / span)."""

    span: float
    fixed_bin_id_size: int = 8

    def bins_of(self, v: np.ndarray) -> np.ndarray:
        return np.floor(np.asarray(v, dtype=np.float64) / self.span).astype(np.int64)

    def normalize_within_bin(self, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        v = np.asarray(v, dtype=np.float64)
        b = self.bins_of(v)
        return b, np.clip(v / self.span - b, 0.0, 1.0)

    def bin_id_bytes(self, label: int) -> bytes:
        import struct

        return struct.pack(">q", int(label))

    def get_normalized_ranges(
        self, lo: float, hi: float, max_bins: int = 256
    ) -> list[BinRange]:
        if hi < lo:
            lo, hi = hi, lo
        b_lo = int(np.floor(lo / self.span))
        b_hi = int(np.floor(hi / self.span))
        if b_hi - b_lo + 1 > max_bins:
            raise ValueError(
                f"query range spans {b_hi - b_lo + 1} bins of width "
                f"{self.span} (> {max_bins}); widen the span or narrow the query"
            )
        out = []
        for b in range(b_lo, b_hi + 1):
            nlo = max(lo / self.span - b, 0.0) if b == b_lo else 0.0
            nhi = min(hi / self.span - b, 1.0) if b == b_hi else 1.0
            out.append(BinRange(self.bin_id_bytes(b), nlo, nhi))
        return out


def _year_start_ms(year: np.ndarray) -> np.ndarray:
    """ms since epoch of Jan 1 00:00:00.000 UTC of ``year`` (vectorized)."""
    y = np.asarray(year, dtype=np.int64) - 1970
    return y.astype("datetime64[Y]").astype("datetime64[ms]").astype(np.int64)


_PERIODS = {
    # periodicity -> (numpy unit, bin-label digits, label formatter width)
    # (TemporalBinningStrategy.java:37-43 Unit — WEEK omitted: its bin
    # boundary depends on the JVM locale's first-day-of-week, so there is
    # no locale-free behavior to match)
    "YEAR": ("Y", 4),
    "MONTH": ("M", 6),
    "DAY": ("D", 8),
    "HOUR": ("h", 10),
    "MINUTE": ("m", 12),
}


@dataclass(frozen=True)
class TimeDimension:
    """Unbounded time axis binned by a calendar unit (UTC).

    Mirrors TemporalBinningStrategy (core/geotime/.../dimension/
    TemporalBinningStrategy.java:36-474): values normalize within
    [binStart, nextBinStart); the bin id is a fixed-width ASCII label —
    YEAR "YYYY" (4 bytes, the reference's getBinId), MONTH "YYYYMM",
    DAY "YYYYMMDD", HOUR "YYYYMMDDHH".  ``bins_of`` returns the integer
    form of that label so group keys stay numeric.
    """

    periodicity: str = "YEAR"
    range: float = field(default=366.0 * 86400e3)  # informational only

    def __post_init__(self):
        if self.periodicity not in _PERIODS:
            raise ValueError(
                f"unsupported periodicity {self.periodicity!r}; "
                f"one of {sorted(_PERIODS)}"
            )

    @property
    def fixed_bin_id_size(self) -> int:
        return _PERIODS[self.periodicity][1]

    def _unit(self) -> str:
        return _PERIODS[self.periodicity][0]

    def _bin_index(self, t_ms: np.ndarray) -> np.ndarray:
        """epoch-based bin ordinal (years/months/days/hours since epoch)."""
        dt = (
            np.asarray(t_ms, dtype="datetime64[ms]")
            if np.asarray(t_ms).dtype.kind != "M"
            else t_ms
        )
        return dt.astype(f"datetime64[{self._unit()}]").astype(np.int64)

    def _bin_start_ms(self, idx: np.ndarray) -> np.ndarray:
        return (
            np.asarray(idx, dtype=np.int64)
            .astype(f"datetime64[{self._unit()}]")
            .astype("datetime64[ms]")
            .astype(np.int64)
        )

    def _label_of_index(self, idx: np.ndarray) -> np.ndarray:
        """bin ordinal -> integer label (YYYY / YYYYMM / YYYYMMDD / ...)."""
        idx = np.asarray(idx, dtype=np.int64)
        dt = idx.astype(f"datetime64[{self._unit()}]")
        years = dt.astype("datetime64[Y]").astype(np.int64) + 1970
        if self.periodicity == "YEAR":
            return years
        months = dt.astype("datetime64[M]").astype(np.int64) % 12 + 1
        if self.periodicity == "MONTH":
            return years * 100 + months
        days = (
            dt.astype("datetime64[D]") - dt.astype("datetime64[M]").astype("datetime64[D]")
        ).astype(np.int64) + 1
        if self.periodicity == "DAY":
            return (years * 100 + months) * 100 + days
        hours = (
            dt.astype("datetime64[h]") - dt.astype("datetime64[D]").astype("datetime64[h]")
        ).astype(np.int64)
        if self.periodicity == "HOUR":
            return ((years * 100 + months) * 100 + days) * 100 + hours
        minutes = (
            dt.astype("datetime64[m]") - dt.astype("datetime64[h]").astype("datetime64[m]")
        ).astype(np.int64)
        return (((years * 100 + months) * 100 + days) * 100 + hours) * 100 + minutes

    def bins_of(self, t_ms: np.ndarray) -> np.ndarray:
        """Integer bin labels of timestamps."""
        return self._label_of_index(self._bin_index(t_ms))

    def years_of(self, t_ms: np.ndarray) -> np.ndarray:
        dt = (
            np.asarray(t_ms, dtype="datetime64[ms]")
            if np.asarray(t_ms).dtype.kind != "M"
            else t_ms
        )
        return dt.astype("datetime64[Y]").astype(np.int64) + 1970

    def normalize_within_bin(self, t_ms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (bin label, normalized position in [0,1] within that bin)."""
        t = np.asarray(t_ms, dtype=np.int64)
        idx = self._bin_index(t)
        start = self._bin_start_ms(idx)
        end = self._bin_start_ms(idx + 1)
        return self._label_of_index(idx), (t - start) / (end - start)

    def bin_id_bytes(self, label: int) -> bytes:
        return str(int(label)).zfill(self.fixed_bin_id_size).encode("ascii")

    def get_normalized_ranges(self, lo_ms: float, hi_ms: float) -> list[BinRange]:
        lo_ms, hi_ms = int(min(lo_ms, hi_ms)), int(max(lo_ms, hi_ms))
        i0 = int(self._bin_index(np.int64(lo_ms)))
        i1 = int(self._bin_index(np.int64(hi_ms)))
        # vectorized bin edges/labels (a multi-year DAY/HOUR/MINUTE query
        # decomposes into many bins — TemporalBinningStrategyTest exercises
        # 250k; the per-bin Python loop only assembles the BinRange objects)
        idx = np.arange(i0, i1 + 2, dtype=np.int64)
        edges = self._bin_start_ms(idx)
        labels = self._label_of_index(idx[:-1])
        width = self.fixed_bin_id_size
        ids = np.char.encode(np.char.zfill(labels.astype("U"), width), "ascii")
        starts, ends = edges[:-1], edges[1:]
        seg_lo = np.maximum(lo_ms, starts)
        seg_hi = np.minimum(hi_ms, ends)
        span = (ends - starts).astype(np.float64)
        nlo = (seg_lo - starts) / span
        nhi = (seg_hi - starts) / span
        return [
            BinRange(bytes(ids[j]), float(nlo[j]), float(nhi[j]))
            for j in range(len(starts))
        ]

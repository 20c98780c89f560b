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
    (LongitudeDefinition.java:33-67)."""

    lo: float = -180.0
    hi: float = 180.0

    def get_normalized_ranges(self, lo: float, hi: float) -> list[BinRange]:
        nlo = float(self.normalize(lo))
        nhi = float(self.normalize(hi))
        if nhi < nlo:  # crosses the antimeridian
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


def _year_start_ms(year: np.ndarray) -> np.ndarray:
    """ms since epoch of Jan 1 00:00:00.000 UTC of ``year`` (vectorized)."""
    y = np.asarray(year, dtype=np.int64) - 1970
    return y.astype("datetime64[Y]").astype("datetime64[ms]").astype(np.int64)


@dataclass(frozen=True)
class TimeDimension:
    """Unbounded time axis binned by calendar YEAR (UTC).

    bin id = 4 ASCII digit bytes of the year (TemporalBinningStrategy:
    YEAR -> getFixedBinIdSize()==4, getBinId == year string).  Values are
    normalized within the bin over [binStart, nextBinStart] (the reference
    uses the full bin extent as the denominator).
    """

    fixed_bin_id_size: int = 4
    range: float = field(default=366.0 * 86400e3)  # informational only

    def years_of(self, t_ms: np.ndarray) -> np.ndarray:
        dt = np.asarray(t_ms, dtype="datetime64[ms]") if np.asarray(t_ms).dtype.kind != "M" else t_ms
        return dt.astype("datetime64[Y]").astype(np.int64) + 1970

    def normalize_within_bin(self, t_ms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (year, normalized position in [0,1] within that year)."""
        t = np.asarray(t_ms, dtype=np.int64)
        years = self.years_of(t)
        start = _year_start_ms(years)
        end = _year_start_ms(years + 1)
        return years, (t - start) / (end - start)

    def bin_id_bytes(self, year: int) -> bytes:
        return str(int(year)).encode("ascii")

    def get_normalized_ranges(self, lo_ms: float, hi_ms: float) -> list[BinRange]:
        lo_ms, hi_ms = int(min(lo_ms, hi_ms)), int(max(lo_ms, hi_ms))
        y0 = int(self.years_of(np.int64(lo_ms)))
        y1 = int(self.years_of(np.int64(hi_ms)))
        out = []
        for y in range(y0, y1 + 1):
            start = int(_year_start_ms(np.int64(y)))
            end = int(_year_start_ms(np.int64(y + 1)))
            seg_lo = max(lo_ms, start)
            seg_hi = min(hi_ms, end)
            out.append(
                BinRange(
                    self.bin_id_bytes(y),
                    (seg_lo - start) / (end - start),
                    (seg_hi - start) / (end - start),
                )
            )
        return out

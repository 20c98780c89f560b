"""XZHierarchical index strategy: ONE strategy routing points to a
dedicated full-resolution Hilbert point curve and extended objects (boxes)
to the XZ curve, with tier-id allocation outside the tiered raster
strategy's range.

Reference behavior: core/index/.../sfc/xz/XZHierarchicalIndexStrategy.java
:46-215 — getInsertionIds puts single-cell entries on the point curve
(partition byte = pointCurveMultiDimensionalId), everything else on the XZ
curve; getQueryRanges unions the raster (tiered) ranges, the point-curve
Hilbert decomposition, and the XZ element ranges.  The reference allocates
the two curve ids as the first byte values the tiered strategy does not
use (scanning from Byte.MIN_VALUE => -128/-127); here they surface as the
unsigned tier values 128/129 in the (tier, cell) keyed layout.

This is GeoWave's DEFAULT spatial index; it slots into GeoStore via the
same ``get_query_ranges`` duck type as TieredStrategy.
"""

from __future__ import annotations

import numpy as np

from .dimensions import (
    LatitudeDimension,
    LongitudeDimension,
    norm_to_cell_max,
    norm_to_cell_min,
    norm_to_cell_point,
    norm_to_cell_query_max,
    norm_to_cell_query_min,
)
from .hilbert import HilbertCurve
from .tiered import QueryRange
from .xz import XZOrderSFC

__all__ = ["XZHierarchicalStrategy"]


class XZHierarchicalStrategy:
    POINT_TIER = 128  # byte -128: first id unused by tiered tiers 0..bits
    XZ_TIER = 129  # byte -127

    def __init__(self, bits: int = 31, g: int = 11, raster_strategy=None):
        self.bits = bits
        self.lon = LongitudeDimension()
        self.lat = LatitudeDimension(half_range=True)
        self.point_curve = HilbertCurve(2, bits)
        self.xz = XZOrderSFC(g=g)
        self.raster = raster_strategy  # optional TieredStrategy for rasters
        self.tiers = ([] if raster_strategy is None else list(raster_strategy.tiers)) + [
            self.POINT_TIER,
            self.XZ_TIER,
        ]

    def cell_bits(self, tier: int) -> int:
        """Bit width of cell ids at a tier (for prefix partitioning)."""
        if tier == self.POINT_TIER:
            return 2 * self.bits
        if tier == self.XZ_TIER:
            return int(self.xz.subtree_size(0)).bit_length()
        return 2 * tier

    # -------------------------------------------------------------- encode
    def insertion_cells(self, minx, miny, maxx, maxy):
        """Vectorized getInsertionIds analog: -> (tier:uint8-like int64,
        cell:uint64).  An entry whose envelope collapses to a single
        point-curve cell (getEstimatedIdCount == 1) keys on the point
        curve; everything else keys on the XZ curve."""
        minx = np.asarray(minx, dtype=np.float64)
        miny = np.asarray(miny, dtype=np.float64)
        maxx = np.asarray(maxx, dtype=np.float64)
        maxy = np.asarray(maxy, dtype=np.float64)
        bins = 1 << self.bits
        cx0 = norm_to_cell_min(self.lon.normalize(minx), bins)
        cx1 = np.maximum(norm_to_cell_max(self.lon.normalize(maxx), bins), cx0)
        cy0 = norm_to_cell_min(self.lat.normalize(miny), bins)
        cy1 = np.maximum(norm_to_cell_max(self.lat.normalize(maxy), bins), cy0)
        is_point = (cx0 == cx1) & (cy0 == cy1)
        tier = np.where(is_point, self.POINT_TIER, self.XZ_TIER).astype(np.int64)
        cells = np.zeros(len(tier), dtype=np.uint64)
        if is_point.any():
            cells[is_point] = self.point_curve.encode([cx0[is_point], cy0[is_point]])
        ext = ~is_point
        if ext.any():
            cells[ext] = self.xz.encode_boxes(
                minx[ext], miny[ext], maxx[ext], maxy[ext]
            ).astype(np.uint64)
        return tier, cells

    # --------------------------------------------------------------- query
    def get_query_ranges(
        self,
        ranges: list[tuple[float, float]],
        max_ranges: int = -1,
        occupied_tiers: list[int] | None = None,
    ) -> list[QueryRange]:
        """Union of point-curve Hilbert ranges (tier 128), XZ element
        ranges (tier 129) and, when a raster strategy is attached, its
        tiered ranges — XZHierarchicalIndexStrategy.getQueryRanges."""
        (minx, maxx), (miny, maxy) = ranges
        out: list[QueryRange] = []
        occ = set(occupied_tiers) if occupied_tiers is not None else None
        if occ is None or self.POINT_TIER in occ:
            bins = 1 << self.bits
            # antimeridian-aware lon bins
            for lb in self.lon.get_normalized_ranges(minx, maxx):
                lat_b = self.lat.get_normalized_ranges(miny, maxy)[0]
                cmin, cmax = [], []
                for lo, hi in ((lb.norm_lo, lb.norm_hi), (lat_b.norm_lo, lat_b.norm_hi)):
                    a = int(norm_to_cell_query_min(np.float64(lo), bins))
                    b = int(norm_to_cell_query_max(np.float64(hi), bins))
                    cmin.append(min(a, b))
                    cmax.append(max(a, b))
                for lo, hi in self.point_curve.decompose_range(cmin, cmax, max_ranges):
                    out.append(QueryRange(self.POINT_TIER, b"", lo, hi))
        if occ is None or self.XZ_TIER in occ:
            for lo, hi in self.xz.query_ranges(minx, miny, maxx, maxy, max_ranges):
                out.append(QueryRange(self.XZ_TIER, b"", lo, hi))
        if self.raster is not None and (occ is None or any(t in occ for t in self.raster.tiers)):
            out.extend(
                self.raster.get_query_ranges(ranges, max_ranges, occupied_tiers)
            )
        return out

from .dimensions import (
    BasicDimension,
    BinRange,
    LatitudeDimension,
    LongitudeDimension,
    TimeDimension,
)
from .hilbert import HilbertCurve, merge_ranges
from .tiered import (
    QueryRange,
    SpatialTemporalStrategy,
    TieredStrategy,
    spatial_strategy,
    spatial_temporal_strategy,
)
from .zorder import ZOrderCurve

__all__ = [
    "BasicDimension",
    "BinRange",
    "HilbertCurve",
    "LatitudeDimension",
    "LongitudeDimension",
    "QueryRange",
    "SpatialTemporalStrategy",
    "TieredStrategy",
    "TimeDimension",
    "ZOrderCurve",
    "merge_ranges",
    "spatial_strategy",
    "spatial_temporal_strategy",
]

from .expressions import Expr, apply_filter, col, lit
from .gwql import parse_gwql, run_gwql
from .planner import SpatialQuery, cell_range_filter, subsample_by_cell

__all__ = [
    "Expr",
    "SpatialQuery",
    "apply_filter",
    "cell_range_filter",
    "col",
    "lit",
    "parse_gwql",
    "run_gwql",
    "subsample_by_cell",
]

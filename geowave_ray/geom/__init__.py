from .index import BBoxGrid
from .predicates import COMPARE_OPS, evaluate, locate_point, points_in_polygon, relate
from .wkb import (
    Geometry,
    LineString,
    MultiGeometry,
    Point,
    Polygon,
    bbox_of,
    box_polygon,
    parse_wkb,
    to_wkb,
)

__all__ = [
    "BBoxGrid",
    "COMPARE_OPS",
    "Geometry",
    "LineString",
    "MultiGeometry",
    "Point",
    "Polygon",
    "bbox_of",
    "box_polygon",
    "evaluate",
    "locate_point",
    "parse_wkb",
    "points_in_polygon",
    "relate",
    "to_wkb",
]

"""Minimal WKB geometry codec + geometry dataclasses (pure NumPy).

shapely is not available in this environment, so the engine carries its own
small WKB reader/writer for Point / LineString / Polygon / Multi* (2-D,
little- or big-endian).  Geometry payloads travel through Ray Data as WKB in
``binary`` Arrow columns (the Ray-native stand-in for the reference's
TWKB/WKB geometry fields — core/geotime/.../GeometrySerializationProvider.java).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "Geometry",
    "Point",
    "LineString",
    "Polygon",
    "MultiGeometry",
    "parse_wkb",
    "to_wkb",
    "bbox_of",
    "box_polygon",
]

_PT, _LS, _PG, _MPT, _MLS, _MPG, _GC = 1, 2, 3, 4, 5, 6, 7


@dataclass
class Geometry:
    pass


@dataclass
class Point(Geometry):
    x: float
    y: float

    @property
    def coords(self) -> np.ndarray:
        return np.array([[self.x, self.y]], dtype=np.float64)


@dataclass
class LineString(Geometry):
    coords: np.ndarray  # (N, 2)


@dataclass
class Polygon(Geometry):
    shell: np.ndarray  # (N, 2), closed (first == last)
    holes: list = field(default_factory=list)  # list[(M, 2)]

    @property
    def rings(self) -> list[np.ndarray]:
        return [self.shell, *self.holes]


@dataclass
class MultiGeometry(Geometry):
    parts: list  # list[Geometry]


def _rd_ring(buf: memoryview, off: int, fmt: str) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from(fmt + "I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype=("<f8" if fmt == "<" else ">f8"), count=2 * n, offset=off)
    off += 16 * n
    return arr.reshape(n, 2).astype(np.float64), off


def _parse(buf: memoryview, off: int) -> tuple[Geometry, int]:
    byte_order = buf[off]
    fmt = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(fmt + "I", buf, off + 1)
    has_srid = bool(gtype & 0x20000000)  # EWKB SRID flag (PostGIS)
    if gtype & 0xC0000000:  # Z/M flags — only 2-D payloads are supported
        raise ValueError("3-D/measured WKB not supported (Z/M flag set)")
    gtype &= 0xFF  # strip remaining flags (2-D only)
    off += 5
    if has_srid:
        off += 4  # skip the 4-byte SRID value that follows the type word
    if gtype == _PT:
        x, y = struct.unpack_from(fmt + "dd", buf, off)
        return Point(x, y), off + 16
    if gtype == _LS:
        coords, off = _rd_ring(buf, off, fmt)
        return LineString(coords), off
    if gtype == _PG:
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _rd_ring(buf, off, fmt)
            rings.append(ring)
        return Polygon(rings[0], rings[1:]), off
    if gtype in (_MPT, _MLS, _MPG, _GC):
        (nparts,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            g, off = _parse(buf, off)
            parts.append(g)
        return MultiGeometry(parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def parse_wkb(data: bytes) -> Geometry:
    g, _ = _parse(memoryview(data), 0)
    return g


def _wr_ring(out: list, coords: np.ndarray) -> None:
    out.append(struct.pack("<I", len(coords)))
    out.append(np.ascontiguousarray(coords, dtype="<f8").tobytes())


def to_wkb(g: Geometry) -> bytes:
    out: list[bytes] = []
    if isinstance(g, Point):
        out.append(struct.pack("<BI", 1, _PT))
        out.append(struct.pack("<dd", g.x, g.y))
    elif isinstance(g, LineString):
        out.append(struct.pack("<BI", 1, _LS))
        _wr_ring(out, g.coords)
    elif isinstance(g, Polygon):
        out.append(struct.pack("<BI", 1, _PG))
        out.append(struct.pack("<I", 1 + len(g.holes)))
        for ring in g.rings:
            _wr_ring(out, ring)
    elif isinstance(g, MultiGeometry):
        kinds = {type(p) for p in g.parts}
        code = (
            _MPT
            if kinds == {Point}
            else _MLS
            if kinds == {LineString}
            else _MPG
            if kinds == {Polygon}
            else _GC
        )
        out.append(struct.pack("<BI", 1, code))
        out.append(struct.pack("<I", len(g.parts)))
        for p in g.parts:
            out.append(to_wkb(p))
    else:
        raise TypeError(type(g))
    return b"".join(out)


def bbox_of(g: Geometry) -> tuple[float, float, float, float]:
    if isinstance(g, Point):
        return (g.x, g.y, g.x, g.y)
    if isinstance(g, LineString):
        return (
            float(g.coords[:, 0].min()),
            float(g.coords[:, 1].min()),
            float(g.coords[:, 0].max()),
            float(g.coords[:, 1].max()),
        )
    if isinstance(g, Polygon):
        return (
            float(g.shell[:, 0].min()),
            float(g.shell[:, 1].min()),
            float(g.shell[:, 0].max()),
            float(g.shell[:, 1].max()),
        )
    if isinstance(g, MultiGeometry):
        boxes = [bbox_of(p) for p in g.parts]
        return (
            min(b[0] for b in boxes),
            min(b[1] for b in boxes),
            max(b[2] for b in boxes),
            max(b[3] for b in boxes),
        )
    raise TypeError(type(g))


def box_polygon(minx: float, miny: float, maxx: float, maxy: float) -> Polygon:
    return Polygon(
        np.array(
            [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
            dtype=np.float64,
        )
    )

"""TWKB ("Tiny WKB") geometry codec.

Reference: core/geotime/.../util/TWKBWriter.java / TWKBReader.java — the
reference's compressed on-disk geometry default.  Implemented from the
public TWKB specification (https://github.com/TWKB/Specification, BSD):

- header byte: geometry type (low nibble) | zigzag(precision) << 4
- metadata byte: flags (bbox 0x01, size 0x02, idlist 0x04, extended 0x08,
  empty 0x10) — bbox / size / idlist blocks are written on request and
  always accepted on read (TWKBReader.java parity); extended Z/M raises
- coordinates: per-axis DELTA-encoded zigzag varints of
  round(coord * 10^precision); ring/part counts are unsigned varints.

Round-trips Point / LineString / Polygon / MultiPolygon within the chosen
precision; typically 3-6x smaller than WKB for degree coordinates at
precision 7 (~cm).
"""

from __future__ import annotations

import numpy as np

from .wkb import LineString, MultiGeometry, Point, Polygon

__all__ = ["to_twkb", "parse_twkb"]

_PT, _LS, _PG, _MPG = 1, 2, 3, 6


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _varint(v: int, out: bytearray) -> None:
    v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _write_coords(coords: np.ndarray, scale: float, prev: list[int], out: bytearray):
    q = np.round(np.asarray(coords, dtype=np.float64) * scale).astype(np.int64)
    for row in q:
        for d in range(2):
            delta = int(row[d]) - prev[d]
            prev[d] = int(row[d])
            _varint(_zigzag(delta), out)


def _all_coords(g) -> np.ndarray:
    if isinstance(g, Point):
        return np.array([[g.x, g.y]])
    if isinstance(g, LineString):
        return np.asarray(g.coords)
    if isinstance(g, Polygon):
        return np.concatenate([np.asarray(r) for r in g.rings])
    if isinstance(g, MultiGeometry):
        return np.concatenate([_all_coords(p) for p in g.parts])
    raise TypeError(type(g))


def to_twkb(
    g,
    precision: int = 7,
    with_bbox: bool = False,
    with_size: bool = False,
    ids: list[int] | None = None,
) -> bytes:
    """Geometry -> TWKB bytes (2-D).  Optional metadata blocks per the
    public spec (TWKBWriter.java writes them under the same flags):
    ``with_bbox`` (flag 0x01, per-dim min + delta), ``with_size``
    (flag 0x02, byte size of everything after the size varint), ``ids``
    (flag 0x04, one zigzag varint per part of a multi-geometry)."""
    scale = 10.0**precision
    pz = _zigzag(precision) & 0xF
    body = bytearray()
    prev = [0, 0]
    if isinstance(g, Point):
        gtype = _PT
        _write_coords(np.array([[g.x, g.y]]), scale, prev, body)
    elif isinstance(g, LineString):
        gtype = _LS
        _varint(len(g.coords), body)
        _write_coords(g.coords, scale, prev, body)
    elif isinstance(g, Polygon):
        gtype = _PG
        _varint(1 + len(g.holes), body)
        for ring in g.rings:
            _varint(len(ring), body)
            _write_coords(ring, scale, prev, body)
    elif isinstance(g, MultiGeometry):
        if not all(isinstance(p, Polygon) for p in g.parts):
            raise TypeError("TWKB multi-geometry support covers MultiPolygon")
        gtype = _MPG
        _varint(len(g.parts), body)
        if ids is not None:
            if len(ids) != len(g.parts):
                raise ValueError("ids must have one entry per part")
            for i in ids:
                _varint(_zigzag(int(i)), body)
        for p in g.parts:
            _varint(1 + len(p.holes), body)
            for ring in p.rings:
                _varint(len(ring), body)
                _write_coords(ring, scale, prev, body)
    else:
        raise TypeError(type(g))
    if ids is not None and gtype != _MPG:
        raise ValueError("idlist is only valid for multi-geometries")

    flags = (
        (0x01 if with_bbox else 0)
        | (0x02 if with_size else 0)
        | (0x04 if ids is not None else 0)
    )
    blocks = bytearray()
    if with_bbox:
        q = np.round(_all_coords(g) * scale).astype(np.int64)
        for d in range(2):
            lo, hi = int(q[:, d].min()), int(q[:, d].max())
            _varint(_zigzag(lo), blocks)
            _varint(_zigzag(hi - lo), blocks)
    out = bytearray([gtype | (pz << 4), flags])
    if with_size:
        _varint(len(blocks) + len(body), out)
    out += blocks
    out += body
    return bytes(out)


def _read_coords(buf: bytes, pos: int, n: int, scale: float, prev: list[int]):
    pts = np.empty((n, 2), dtype=np.float64)
    for i in range(n):
        for d in range(2):
            v, pos = _read_varint(buf, pos)
            prev[d] += _unzigzag(v)
            pts[i, d] = prev[d] / scale
    return pts, pos


def parse_twkb(buf: bytes):
    """TWKB bytes -> geometry.  Accepts the optional bbox / size / idlist
    metadata blocks (TWKBReader.java parity); a parsed idlist is attached
    to the returned MultiGeometry as ``.part_ids``.  Extended (Z/M)
    dimensions are not supported — geometries here are 2-D."""
    gtype = buf[0] & 0x0F
    precision = _unzigzag(buf[0] >> 4)
    flags = buf[1]
    if flags & 0x10:
        raise ValueError("empty geometry")
    if flags & 0x08:
        raise NotImplementedError("extended (Z/M) TWKB dimensions unsupported")
    scale = 10.0**precision
    pos = 2
    if flags & 0x02:  # size block: byte length of the remainder (checked)
        size, pos = _read_varint(buf, pos)
        if pos + size != len(buf):
            raise ValueError(
                f"TWKB size block mismatch: expected {size} trailing bytes, "
                f"have {len(buf) - pos}"
            )
    if flags & 0x01:  # bbox block: per-dim (min, delta) zigzag varints
        for _ in range(4):
            _, pos = _read_varint(buf, pos)
    has_ids = bool(flags & 0x04)
    if has_ids and gtype not in (4, 5, _MPG, 7):
        raise ValueError("TWKB idlist on a non-multi geometry")
    prev = [0, 0]
    if gtype == _PT:
        pts, pos = _read_coords(buf, pos, 1, scale, prev)
        return Point(pts[0, 0], pts[0, 1])
    if gtype == _LS:
        n, pos = _read_varint(buf, pos)
        pts, pos = _read_coords(buf, pos, n, scale, prev)
        return LineString(pts)
    if gtype == _PG:
        nrings, pos = _read_varint(buf, pos)
        rings = []
        for _ in range(nrings):
            n, pos = _read_varint(buf, pos)
            ring, pos = _read_coords(buf, pos, n, scale, prev)
            rings.append(ring)
        return Polygon(rings[0], rings[1:])
    if gtype == _MPG:
        nparts, pos = _read_varint(buf, pos)
        part_ids = None
        if has_ids:
            part_ids = []
            for _ in range(nparts):
                v, pos = _read_varint(buf, pos)
                part_ids.append(_unzigzag(v))
        parts = []
        for _ in range(nparts):
            nrings, pos = _read_varint(buf, pos)
            rings = []
            for _ in range(nrings):
                n, pos = _read_varint(buf, pos)
                ring, pos = _read_coords(buf, pos, n, scale, prev)
                rings.append(ring)
            parts.append(Polygon(rings[0], rings[1:]))
        out = MultiGeometry(parts)
        if part_ids is not None:
            out.part_ids = part_ids
        return out
    raise ValueError(f"unsupported TWKB type {gtype}")

"""TWKB ("Tiny WKB") geometry codec.

Reference: core/geotime/.../util/TWKBWriter.java / TWKBReader.java — the
reference's compressed on-disk geometry default.  Implemented from the
public TWKB specification (https://github.com/TWKB/Specification, BSD):

- header byte: geometry type (low nibble) | zigzag(precision) << 4
- metadata byte: flags (bbox 0x01, size 0x02, idlist 0x04, extended 0x08,
  empty 0x10) — bbox / size / idlist blocks are written on request and
  always accepted on read (TWKBReader.java parity)
- extended-dimensions byte (flag 0x08): bit 0 = has Z, bit 1 = has M,
  bits 2-4 = Z precision (unsigned 0-7), bits 5-7 = M precision; Z/M
  values delta-encode exactly like X/Y at their own scales.  The engine's
  query geometry stays 2-D; Z/M ride along as measure columns (the same
  way the reference stores them: indexed dimensions are 2-D, extra
  dimensions are attribute data).
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


class _CoordWriter:
    """Delta-encodes (n, ndims) coordinate runs; Z/M columns are sliced
    from the flat extra arrays by a running point offset."""

    def __init__(self, scales: list[float], extras: list[np.ndarray], out: bytearray):
        self.scales = scales
        self.extras = extras  # flat arrays, one per extra dim (Z then M)
        self.prev = [0] * len(scales)
        self.offset = 0
        self.out = out

    def write(self, coords2d: np.ndarray) -> None:
        n = len(coords2d)
        cols = [np.asarray(coords2d, dtype=np.float64)[:, 0],
                np.asarray(coords2d, dtype=np.float64)[:, 1]]
        for e in self.extras:
            cols.append(e[self.offset : self.offset + n])
        self.offset += n
        q = [np.round(c * s).astype(np.int64) for c, s in zip(cols, self.scales)]
        for i in range(n):
            for d in range(len(q)):
                delta = int(q[d][i]) - self.prev[d]
                self.prev[d] = int(q[d][i])
                _varint(_zigzag(delta), self.out)


def to_twkb(
    g,
    precision: int = 7,
    with_bbox: bool = False,
    with_size: bool = False,
    ids: list[int] | None = None,
    z: np.ndarray | None = None,
    m: np.ndarray | None = None,
    z_precision: int = 3,
    m_precision: int = 3,
) -> bytes:
    """Geometry -> TWKB bytes.  Optional metadata blocks per the public
    spec (TWKBWriter.java writes them under the same flags): ``with_bbox``
    (flag 0x01, per-dim min + delta), ``with_size`` (flag 0x02, byte size
    of everything after the size varint), ``ids`` (flag 0x04, one zigzag
    varint per part of a multi-geometry).  ``z`` / ``m`` (flag 0x08) are
    flat per-point measure arrays in traversal order (`_all_coords`
    order), quantized at 10^``z_precision`` / 10^``m_precision``
    (unsigned, 0-7 per the spec's 3-bit fields)."""
    scale = 10.0**precision
    pz = _zigzag(precision) & 0xF
    n_pts = len(_all_coords(g))
    scales = [scale, scale]
    extras: list[np.ndarray] = []
    for arr, prec, name in ((z, z_precision, "z"), (m, m_precision, "m")):
        if arr is None:
            continue
        if not 0 <= prec <= 7:
            raise ValueError(f"{name}_precision must be 0-7 (3-bit spec field)")
        a = np.asarray(arr, dtype=np.float64)
        if len(a) != n_pts:
            raise ValueError(f"{name} must have one value per point ({n_pts})")
        scales.append(10.0**prec)
        extras.append(a)

    body = bytearray()
    w = _CoordWriter(scales, extras, body)
    if isinstance(g, Point):
        gtype = _PT
        w.write(np.array([[g.x, g.y]]))
    elif isinstance(g, LineString):
        gtype = _LS
        _varint(len(g.coords), body)
        w.write(np.asarray(g.coords))
    elif isinstance(g, Polygon):
        gtype = _PG
        _varint(1 + len(g.holes), body)
        for ring in g.rings:
            _varint(len(ring), body)
            w.write(np.asarray(ring))
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
                w.write(np.asarray(ring))
    else:
        raise TypeError(type(g))
    if ids is not None and gtype != _MPG:
        raise ValueError("idlist is only valid for multi-geometries")

    has_ext = z is not None or m is not None
    flags = (
        (0x01 if with_bbox else 0)
        | (0x02 if with_size else 0)
        | (0x04 if ids is not None else 0)
        | (0x08 if has_ext else 0)
    )
    blocks = bytearray()
    if with_bbox:
        cols = [c for c in _all_coords(g).T] + list(extras)
        for c, s in zip(cols, scales):
            q = np.round(np.asarray(c) * s).astype(np.int64)
            lo, hi = int(q.min()), int(q.max())
            _varint(_zigzag(lo), blocks)
            _varint(_zigzag(hi - lo), blocks)
    out = bytearray([gtype | (pz << 4), flags])
    if has_ext:
        ext = (0x01 if z is not None else 0) | (0x02 if m is not None else 0)
        if z is not None:
            ext |= (z_precision & 0x7) << 2
        if m is not None:
            ext |= (m_precision & 0x7) << 5
        out.append(ext)
    if with_size:
        _varint(len(blocks) + len(body), out)
    out += blocks
    out += body
    return bytes(out)


class _CoordReader:
    def __init__(self, buf: bytes, scales: list[float]):
        self.buf = buf
        self.scales = scales
        self.prev = [0] * len(scales)
        self.extra_vals: list[list[float]] = [[] for _ in range(len(scales) - 2)]

    def read(self, pos: int, n: int) -> tuple[np.ndarray, int]:
        nd = len(self.scales)
        pts = np.empty((n, 2), dtype=np.float64)
        for i in range(n):
            for d in range(nd):
                v, pos = _read_varint(self.buf, pos)
                self.prev[d] += _unzigzag(v)
                val = self.prev[d] / self.scales[d]
                if d < 2:
                    pts[i, d] = val
                else:
                    self.extra_vals[d - 2].append(val)
        return pts, pos


def parse_twkb(buf: bytes):
    """TWKB bytes -> geometry.  Accepts the optional bbox / size / idlist
    metadata blocks (TWKBReader.java parity); a parsed idlist is attached
    to the returned MultiGeometry as ``.part_ids``.  Extended (Z/M)
    dimensions are parsed at their encoded precisions and attached as flat
    per-point ``.z`` / ``.m`` numpy arrays in traversal order (the query
    geometry itself stays 2-D — Z/M are measure attributes here, matching
    the reference's 2-D indexed dimensions)."""
    gtype = buf[0] & 0x0F
    precision = _unzigzag(buf[0] >> 4)
    flags = buf[1]
    if flags & 0x10:
        raise ValueError("empty geometry")
    scale = 10.0**precision
    pos = 2
    scales = [scale, scale]
    has_z = has_m = False
    if flags & 0x08:
        ext = buf[pos]
        pos += 1
        has_z = bool(ext & 0x01)
        has_m = bool(ext & 0x02)
        if has_z:
            scales.append(10.0 ** ((ext >> 2) & 0x7))
        if has_m:
            scales.append(10.0 ** ((ext >> 5) & 0x7))
    if flags & 0x02:  # size block: byte length of the remainder (checked)
        size, pos = _read_varint(buf, pos)
        if pos + size != len(buf):
            raise ValueError(
                f"TWKB size block mismatch: expected {size} trailing bytes, "
                f"have {len(buf) - pos}"
            )
    if flags & 0x01:  # bbox block: per-dim (min, delta) zigzag varints
        for _ in range(2 * len(scales)):
            _, pos = _read_varint(buf, pos)
    has_ids = bool(flags & 0x04)
    if has_ids and gtype not in (4, 5, _MPG, 7):
        raise ValueError("TWKB idlist on a non-multi geometry")
    rd = _CoordReader(buf, scales)

    def attach(g):
        if has_z:
            g.z = np.asarray(rd.extra_vals[0])
        if has_m:
            g.m = np.asarray(rd.extra_vals[1 if has_z else 0])
        return g

    if gtype == _PT:
        pts, pos = rd.read(pos, 1)
        return attach(Point(pts[0, 0], pts[0, 1]))
    if gtype == _LS:
        n, pos = _read_varint(buf, pos)
        pts, pos = rd.read(pos, n)
        return attach(LineString(pts))
    if gtype == _PG:
        nrings, pos = _read_varint(buf, pos)
        rings = []
        for _ in range(nrings):
            n, pos = _read_varint(buf, pos)
            ring, pos = rd.read(pos, n)
            rings.append(ring)
        return attach(Polygon(rings[0], rings[1:]))
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
                ring, pos = rd.read(pos, n)
                rings.append(ring)
            parts.append(Polygon(rings[0], rings[1:]))
        out = MultiGeometry(parts)
        if part_ids is not None:
            out.part_ids = part_ids
        return attach(out)
    raise ValueError(f"unsupported TWKB type {gtype}")

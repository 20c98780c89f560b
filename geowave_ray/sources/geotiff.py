"""Minimal GeoTIFF reader/writer — pure struct parsing, no library.

Reference behavior: the reference ingests real-world raster formats through
its raster adapter (``extensions/adapters/raster/.../RasterDataAdapter.java:444``
reads imagery via ImageIO/geotools grid coverages).  This container bans
rasterio/PIL, so the engine gets the same capability the way the WAV/FVC1
codecs were built: a from-spec implementation of the narrow profile the
pipelines need.

Profile (TIFF 6.0 public spec + GeoTIFF 1.1 public spec):
- little-endian classic TIFF (``II*\\0``), single IFD
- STRIP or TILE organization (TileWidth/TileLength/TileOffsets, edge tiles
  padded to full size per spec section 15)
- uncompressed (Compression=1), PackBits (Compression=32773, spec
  section 9), LZW (Compression=5, spec section 13 with the early
  change), or Deflate (Compression=8 "Adobe" and the old-style 32946 —
  both are one zlib stream per strip/tile, decoded via stdlib zlib);
  BitsPerSample 8
- grayscale (Photometric=1, SamplesPerPixel=1) or RGB (Photometric=2, SPP=3)
- georeferencing via ModelPixelScaleTag (33550) + ModelTiepointTag (33922)

Anything outside the profile raises NotImplementedError naming the feature —
same guard discipline as stages/audio.py (MP3/AAC) and stages/video.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "geotiff_encode",
    "geotiff_decode",
    "packbits_encode",
    "packbits_decode",
    "lzw_encode",
    "lzw_decode",
]


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW (spec section 13): MSB-first variable-width codes 9->12
    bits with the TIFF "early change" (width bumps one code early, the
    libtiff convention), ClearCode 256 / EOI 257, table reset at 4094."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0  # bit accumulator (MSB-first)
    acc_n = 0

    def emit(code: int, bits: int):
        nonlocal acc, acc_n
        acc = (acc << bits) | code
        acc_n += bits
        while acc_n >= 8:
            out.append((acc >> (acc_n - 8)) & 0xFF)
            acc_n -= 8
        acc &= (1 << acc_n) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    bits = 9
    emit(CLEAR, bits)
    w = b""
    for b in data:
        k = w + bytes([b])
        if k in table:
            w = k
            continue
        emit(table[w], bits)
        table[k] = next_code
        next_code += 1
        if next_code == (1 << bits) - 1 and bits < 12:  # early change
            bits += 1
        if next_code >= 4094:
            emit(CLEAR, bits)
            table = {bytes([i]): i for i in range(256)}
            next_code, bits = 258, 9
        w = bytes([b])
    if w:
        emit(table[w], bits)
    emit(EOI, bits)
    if acc_n:
        out.append((acc << (8 - acc_n)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of lzw_encode (same early-change convention)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    pos = 0  # bit position
    total_bits = len(data) * 8

    def read(bits: int) -> int:
        nonlocal pos
        if pos + bits > total_bits:
            return EOI
        v = 0
        p = pos
        # consume up to 3 bytes covering the window
        first = p >> 3
        last = (p + bits - 1) >> 3
        chunk = int.from_bytes(data[first : last + 1], "big")
        span = (last - first + 1) * 8
        v = (chunk >> (span - (p - first * 8) - bits)) & ((1 << bits) - 1)
        pos += bits
        return v

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read(bits)
        if code == EOI:
            break
        if code == CLEAR:
            table = table[:258]
            bits = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table")
        out += entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry (it reconstructs entry N while reading
        # the code the encoder emitted after creating entry N), so it
        # widens one entry earlier than the encoder's (1<<bits)-1
        if len(table) == (1 << bits) - 2 and bits < 12:
            bits += 1
        prev = entry
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 section 9): runs of >=3 equal bytes become
    (257-n, byte); literals become (n-1, bytes)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    out = bytearray()
    i, n = 0, len(arr)
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and arr[j] == arr[i] and j - i < 128:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(int(arr[i]))
            i = j
            continue
        # literal stretch: until the next >=3 run or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and arr[j] == arr[i]:
                j += 1
            if j - i >= 3:
                break
            # a short run may straddle the 128-byte literal cap: clamp so
            # the control byte can never reach 128 (the noop code)
            i = min(j, lit_start + 128)
        out.append(i - lit_start - 1)
        out += arr[lit_start:i].tobytes()
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of packbits_encode; ``expected`` bounds the output size."""
    src = np.frombuffer(data, dtype=np.uint8)
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        c = int(src[i])
        i += 1
        if c == 128:  # noop per spec
            continue
        if c < 128:  # literal of c+1 bytes
            out += src[i : i + c + 1].tobytes()
            i += c + 1
        else:  # repeat next byte 257-c times
            out += bytes([int(src[i])]) * (257 - c)
            i += 1
    return bytes(out[:expected])

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}

# tag ids (TIFF 6.0 / GeoTIFF 1.1)
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_PACKBITS = 32773
_LZW = 5
_DEFLATE = 8
_DEFLATE_OLD = 32946


def geotiff_encode(
    pixels: np.ndarray,
    origin: tuple[float, float] = (0.0, 0.0),
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    rows_per_strip: int = 32,
    compression: str = "none",
    tile: tuple[int, int] | None = None,
) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) -> GeoTIFF bytes.  ``origin`` is the
    model coordinate of the raster's top-left corner (tiepoint 0,0),
    ``pixel_scale`` the (sx, sy) model units per pixel.  ``compression``:
    "none", "packbits", "lzw" or "deflate".  ``tile=(tw, tl)`` switches from strip to tile
    organization (edge tiles zero-padded to full size, TIFF 6.0 sec 15)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        spp, photometric = 1, 1
        px3 = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, _ = px.shape
        spp, photometric = 3, 2
        px3 = px
    else:
        raise ValueError(f"expected HxW or HxWx3 uint8, got shape {pixels.shape}")
    comp_tags = {"none": 1, "packbits": _PACKBITS, "lzw": _LZW, "deflate": _DEFLATE}
    if compression not in comp_tags:
        raise NotImplementedError(f"GeoTIFF: compression {compression!r} not supported")
    comp_tag = comp_tags[compression]

    if tile is None:
        n_chunks = (h + rows_per_strip - 1) // rows_per_strip
        chunks = [
            px3[i * rows_per_strip : (i + 1) * rows_per_strip].tobytes()
            for i in range(n_chunks)
        ]
    else:
        tw, tl = tile
        if tw % 16 or tl % 16:
            raise ValueError("TIFF tile dimensions must be multiples of 16")
        ntx = (w + tw - 1) // tw
        nty = (h + tl - 1) // tl
        chunks = []
        for ty in range(nty):  # row-major tile order per spec
            for tx in range(ntx):
                t = np.zeros((tl, tw, spp), dtype=np.uint8)
                sub = px3[ty * tl : ty * tl + tl, tx * tw : tx * tw + tw]
                t[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(t.tobytes())
        n_chunks = len(chunks)
    if compression == "packbits":
        chunks = [packbits_encode(c) for c in chunks]
    elif compression == "lzw":
        chunks = [lzw_encode(c) for c in chunks]
    elif compression == "deflate":
        chunks = [zlib.compress(c) for c in chunks]

    entries = []  # (tag, type, count, value_bytes_or_int)

    def entry(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    off_tag = _STRIP_OFFSETS if tile is None else _TILE_OFFSETS
    cnt_tag = _STRIP_BYTE_COUNTS if tile is None else _TILE_BYTE_COUNTS
    entry(_IMAGE_WIDTH, 4, 1, w)
    entry(_IMAGE_LENGTH, 4, 1, h)
    bps = struct.pack(f"<{spp}H", *([8] * spp))
    entry(_BITS_PER_SAMPLE, 3, spp, bps if spp > 1 else 8)
    entry(_COMPRESSION, 3, 1, comp_tag)
    entry(_PHOTOMETRIC, 3, 1, photometric)
    entry(off_tag, 4, n_chunks, None)  # patched below
    entry(_SAMPLES_PER_PIXEL, 3, 1, spp)
    if tile is None:
        entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip)
    else:
        entry(_TILE_WIDTH, 4, 1, tile[0])
        entry(_TILE_LENGTH, 4, 1, tile[1])
    entry(cnt_tag, 4, n_chunks, None)  # patched below
    entry(_PLANAR_CONFIG, 3, 1, 1)
    scale = struct.pack("<3d", pixel_scale[0], pixel_scale[1], 0.0)
    entry(_MODEL_PIXEL_SCALE, 12, 3, scale)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, origin[0], origin[1], 0.0)
    entry(_MODEL_TIEPOINT, 12, 6, tie)
    entries.sort(key=lambda e: e[0])  # IFD entries must be tag-ordered

    # layout: header(8) | IFD | overflow values | chunk data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_field(typ, count, value):
        nonlocal overflow
        size = _TYPE_SIZES[typ] * count
        if isinstance(value, int):
            raw = struct.pack("<I" if typ == 4 else "<H", value)
        else:
            raw = value
        if size <= 4:
            return raw.ljust(4, b"\0")
        off = overflow_off + len(overflow)
        overflow += raw
        return struct.pack("<I", off)

    # first pass to size the overflow area (chunk arrays are known-size)
    sizes = [
        _TYPE_SIZES[typ] * count
        for _, typ, count, _ in entries
    ]
    data_off = overflow_off + sum(s for s in sizes if s > 4)
    chunk_offsets, pos = [], data_off
    for s in chunks:
        chunk_offsets.append(pos)
        pos += len(s)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        if tag == off_tag:
            value = (
                struct.pack(f"<{n_chunks}I", *chunk_offsets)
                if n_chunks > 1
                else chunk_offsets[0]
            )
        elif tag == cnt_tag:
            value = (
                struct.pack(f"<{n_chunks}I", *[len(s) for s in chunks])
                if n_chunks > 1
                else len(chunks[0])
            )
        out += struct.pack("<HHI", tag, typ, count)
        out += value_field(typ, count, value)
    out += struct.pack("<I", 0)  # next-IFD pointer
    out += overflow
    for s in chunks:
        out += s
    return bytes(out)


def _read_values(buf: bytes, typ: int, count: int, field: bytes):
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise NotImplementedError(f"GeoTIFF: unsupported field type {typ}")
    total = size * count
    raw = field[:total] if total <= 4 else None
    if raw is None:
        (off,) = struct.unpack("<I", field)
        raw = buf[off : off + total]
    fmt = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}.get(typ)
    if fmt is None:
        return raw
    return list(struct.unpack(f"<{count}{fmt}", raw))


def geotiff_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """GeoTIFF bytes -> (uint8 array HxW or HxWx3, geo dict with
    ``origin`` (x, y) and ``pixel_scale`` (sx, sy))."""
    if data[:4] == b"MM\0*":
        raise NotImplementedError("GeoTIFF: big-endian TIFF not supported")
    if data[:4] != b"II*\0":
        raise ValueError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from("<HHI", data, base)
        tags[tag] = _read_values(data, typ, count, data[base + 8 : base + 12])

    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (1, _PACKBITS, _LZW, _DEFLATE, _DEFLATE_OLD):
        raise NotImplementedError(f"GeoTIFF: compression {comp} not supported")
    bps = tags.get(_BITS_PER_SAMPLE, [8])
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"GeoTIFF: bits-per-sample {bps} not supported")
    if tags.get(_PLANAR_CONFIG, [1])[0] != 1:
        raise NotImplementedError("GeoTIFF: planar (non-chunky) layout not supported")

    w = tags[_IMAGE_WIDTH][0]
    h = tags[_IMAGE_LENGTH][0]
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    if spp not in (1, 3):
        raise NotImplementedError(f"GeoTIFF: {spp} samples per pixel not supported")

    def chunk(o: int, c: int, expected: int) -> bytes:
        raw = data[o : o + c]
        if comp == _PACKBITS:
            return packbits_decode(raw, expected)
        if comp == _LZW:
            return lzw_decode(raw, expected)
        if comp in (_DEFLATE, _DEFLATE_OLD):
            return zlib.decompress(raw)
        return raw

    if _TILE_OFFSETS in tags:
        tw, tl = tags[_TILE_WIDTH][0], tags[_TILE_LENGTH][0]
        ntx = (w + tw - 1) // tw
        offsets, counts = tags[_TILE_OFFSETS], tags[_TILE_BYTE_COUNTS]
        px3 = np.zeros((h, w, spp), dtype=np.uint8)
        tile_bytes = tw * tl * spp
        for i, (o, c) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(i, ntx)
            t = np.frombuffer(chunk(o, c, tile_bytes), dtype=np.uint8)
            t = t[:tile_bytes].reshape(tl, tw, spp)
            ys, xs = ty * tl, tx * tw
            sub = t[: min(tl, h - ys), : min(tw, w - xs)]
            px3[ys : ys + sub.shape[0], xs : xs + sub.shape[1]] = sub
        px = px3[:, :, 0] if spp == 1 else px3
    else:
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_BYTE_COUNTS]
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        raws = []
        for i, (o, c) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - i * rps)
            raws.append(chunk(o, c, rows * w * spp))
        px = np.frombuffer(b"".join(raws), dtype=np.uint8)[: h * w * spp]
        px = px.reshape((h, w) if spp == 1 else (h, w, spp))

    geo = {"origin": (0.0, 0.0), "pixel_scale": (1.0, 1.0)}
    if _MODEL_PIXEL_SCALE in tags:
        s = tags[_MODEL_PIXEL_SCALE]
        geo["pixel_scale"] = (s[0], s[1])
    if _MODEL_TIEPOINT in tags:
        t = tags[_MODEL_TIEPOINT]
        # raster point (t0,t1) maps to model point (t3,t4)
        geo["origin"] = (t[3] - t[0] * geo["pixel_scale"][0],
                         t[4] - t[1] * geo["pixel_scale"][1])
    return px, geo

"""Baseline sequential-DCT JPEG codec, pure NumPy + stdlib (no PIL/libjpeg
in this container).

Implements the JFIF/JPEG subset the reference's raster adapters consume
(extensions/adapters/raster/.../RasterDataAdapter.java:444 reads arbitrary
GridCoverage rasters through ImageIO; baseline JPEG is the lossy format in
the BASELINE.json input_hint):

- encoder: 8-bit grayscale or RGB, 4:4:4 (no chroma subsampling),
  Annex K quantization tables scaled by the libjpeg quality formula,
  Annex K Huffman tables, JFIF APP0 header.
- decoder: baseline SOF0, 1-4 Huffman tables, arbitrary 1/2 sampling
  factors (4:4:4, 4:2:2, 4:2:0), restart intervals (DRI/RSTn), byte
  stuffing.  Progressive (SOF2) and arithmetic coding raise
  NotImplementedError.

Everything per-pixel is vectorized (matrix DCT over all blocks at once);
only the entropy coder walks symbols in Python, which is fine for the
metadata-scale payloads this engine ships around (tile payloads use the
PNG or FJPG paths for bulk benches).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_encode", "jpeg_decode"]


# ---------------------------------------------------------------- tables
def _zigzag_order() -> np.ndarray:
    """zigzag position k -> row-major flat index (8x8)."""
    out = np.empty(64, dtype=np.int64)
    k = 0
    for s in range(15):
        rows = range(max(0, s - 7), min(8, s + 1))
        rows = list(rows) if s % 2 == 1 else list(rows)[::-1]
        for r in rows:
            out[k] = r * 8 + (s - r)
            k += 1
    return out


_ZZ = _zigzag_order()
_IZZ = np.argsort(_ZZ)  # flat index -> zigzag position

# ITU-T T.81 Annex K.1 / K.2 quantization tables (luminance, chrominance)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# DCT-II orthonormal matrix
_k = np.arange(8)
_D = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_D[0, :] = 1.0 / np.sqrt(8.0)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = int(min(max(quality, 1), 100))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codes: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64, H/W multiples of 8 -> (n, 8, 8)."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    nby, nbx = h8 // 8, w8 // 8
    return blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per F.1.2.1 (negatives one's-complement)."""
    if v == 0:
        return 0, 0
    a = v if v > 0 else -v
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(writer, coefs: np.ndarray, dc_codes, ac_codes, pred: int) -> int:
    """Entropy-encode one component's zigzagged (n, 64) int coefficients."""
    for blk in coefs:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        size, bits = _magnitude(diff)
        c, ln = dc_codes[size]
        writer.put(c, ln)
        if size:
            writer.put(bits, size)
        nz = np.nonzero(blk[1:])[0]
        prev = 0
        for idx in nz:
            run = int(idx) - prev
            prev = int(idx) + 1
            while run > 15:
                c, ln = ac_codes[0xF0]
                writer.put(c, ln)
                run -= 16
            size, bits = _magnitude(int(blk[1 + idx]))
            c, ln = ac_codes[(run << 4) | size]
            writer.put(c, ln)
            writer.put(bits, size)
        if prev != 63:
            c, ln = ac_codes[0x00]  # EOB
            writer.put(c, ln)
    return pred


def _dht_payload(tclass: int, tid: int, bits, vals) -> bytes:
    return bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """8-bit grayscale (h, w[, 1]) or RGB (h, w, 3) -> baseline JFIF bytes.
    ``subsample``: "444" (no chroma subsampling) or "420" (2x2).
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none)."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [(arr.astype(np.float64), 1, 1)]
    else:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            # box-average 2x2 chroma (pad to even first)
            def down(p):
                p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
                )

            planes = [(y, 2, 2), (down(cb), 1, 1), (down(cr), 1, 1)]
        else:
            planes = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]

    qts = [_scaled_quant(_Q_LUMA, quality)]
    if not gray:
        qts.append(_scaled_quant(_Q_CHROMA, quality))

    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU-grid size, block, DCT, quantize, zigzag
    comp_coefs, comp_nbx = [], []
    for ci, (plane, ch, cv) in enumerate(planes):
        th, tw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = _to_blocks(p)
        q = qts[0 if ci == 0 else 1].reshape(8, 8)
        f = _D @ blocks @ _D.T
        coefs = np.round(f / q).astype(np.int64).reshape(-1, 64)[:, _ZZ]
        comp_coefs.append(coefs)
        comp_nbx.append(tw // 8)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 / JFIF
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT (tables stored in zigzag order)
    for tid, qt in enumerate(qts):
        body = bytes([tid]) + bytes(qt[_ZZ].astype(np.uint8).tolist())
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, planes[ci][1] << 4 | planes[ci][2], 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS), (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        tables += [
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tclass, tid, bits, vals in tables:
        body = _dht_payload(tclass, tid, bits, vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    writer = _BitWriter()
    # MCU interleave: h*v blocks per component per MCU (gray: 1 comp, 1x1)
    preds = [0] * ncomp
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            _, ch, cv = planes[ci]
            nbx = comp_nbx[ci]
            for by in range(cv):
                for bx in range(ch):
                    i = (my * cv + by) * nbx + (mx * ch + bx)
                    preds[ci] = _encode_blocks(
                        writer, comp_coefs[ci][i : i + 1], dc, ac, preds[ci]
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder
_LUT_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def _build_lut(bits, vals) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek decode LUT: peek value -> (symbol, code length)."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[key] = (sym, ln)
    return sym, ln


class _BitReader:
    """Entropy-segment reader: byte stuffing, marker stops, RST skipping."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # byte position
        self.acc = 0
        self.n = 0
        self.hit_marker = False

    def _fill(self, want: int):
        while self.n < want:
            if self.hit_marker or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad per F.2.2.5
                self.n += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.hit_marker = True  # leave marker unconsumed
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, nbits: int):
        self.n -= nbits
        self.acc &= (1 << self.n) - 1

    def receive(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.skip(nbits)
        return v

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.n = 0
        self.hit_marker = False
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[list, list]] = {}
    frame = None
    ri = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(body[off : off + 64], dtype=np.uint8).astype(np.int64)
                    off += 64
                else:
                    tbl = np.frombuffer(body[off : off + 128], dtype=">u2").astype(np.int64)
                    off += 128
                nat = np.empty(64, dtype=np.int64)
                nat[_ZZ] = tbl  # stored in zigzag order
                qts[tq] = nat
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tclass, tid = body[off] >> 4, body[off] & 15
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                huff[(tclass, tid)] = (bits, vals)
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tds = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cid, tds >> 4, tds & 15))
            pos += seglen
            break  # entropy data follows
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")

    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    # per-scan-component state
    luts, coefs, preds, geom = [], [], [], []
    for cid, td, ta in scan:
        _, ch, cv, tq = by_id[cid]
        dcl = _build_lut(*huff[(0, td)])
        acl = _build_lut(*huff[(1, ta)])
        nbx, nby = mcux * ch, mcuy * cv
        luts.append((dcl, acl))
        coefs.append(np.zeros((nby * nbx, 64), dtype=np.int64))
        preds.append(0)
        geom.append((ch, cv, nbx, tq))

    reader = _BitReader(data, pos)
    nmcu = mcux * mcuy
    for m in range(nmcu):
        if ri and m and m % ri == 0:
            reader.restart()
            preds = [0] * len(preds)
        my, mx = divmod(m, mcux)
        for si in range(len(scan)):
            (dc_sym, dc_len), (ac_sym, ac_len) = luts[si]
            ch, cv, nbx, _ = geom[si]
            cf = coefs[si]
            for by in range(cv):
                for bx in range(ch):
                    blk_idx = (my * cv + by) * nbx + (mx * ch + bx)
                    blk = cf[blk_idx]
                    p = reader.peek16()
                    s = int(dc_sym[p])
                    reader.skip(int(dc_len[p]))
                    preds[si] += _extend(reader.receive(s), s)
                    blk[0] = preds[si]
                    k = 1
                    while k < 64:
                        p = reader.peek16()
                        rs = int(ac_sym[p])
                        reader.skip(int(ac_len[p]))
                        if rs == 0x00:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 15
                        if k > 63:
                            break
                        blk[k] = _extend(reader.receive(size), size)
                        k += 1

    # dequantize + IDCT per component (vectorized), upsample, stack
    planes = []
    for si, (cid, td, ta) in enumerate(scan):
        ch, cv, nbx, tq = geom[si]
        qt = qts[tq]
        nat = np.zeros_like(coefs[si])
        nat[:, _ZZ] = coefs[si]  # zigzag -> natural, THEN dequantize
        blocks = (nat * qt[None, :]).reshape(-1, 8, 8).astype(np.float64)
        spatial = _D.T @ blocks @ _D + 128.0
        nby = len(blocks) // nbx
        plane = _from_blocks(spatial, nby * 8, nbx * 8)
        # component dims, then upsample to frame grid
        cw = -(-fw * ch // hmax)
        chh = -(-fh * cv // vmax)
        plane = plane[:chh, :cw]
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)

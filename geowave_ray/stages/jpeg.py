"""Baseline sequential-DCT JPEG codec, pure NumPy + stdlib (no PIL/libjpeg
in this container).

Implements the JFIF/JPEG subset the reference's raster adapters consume
(extensions/adapters/raster/.../RasterDataAdapter.java:444 reads arbitrary
GridCoverage rasters through ImageIO; baseline JPEG is the lossy format in
the BASELINE.json input_hint):

- encoder: 8-bit grayscale or RGB, 4:4:4 (no chroma subsampling),
  Annex K quantization tables scaled by the libjpeg quality formula,
  Annex K Huffman tables, JFIF APP0 header.
- decoder: baseline SOF0 AND progressive SOF2 (spectral selection +
  successive approximation, DC/AC first and refinement scans, EOB runs,
  interleaved DC / single-component AC scans over the true component
  grid), 1-4 Huffman tables, arbitrary 1/2 sampling factors (4:4:4,
  4:2:2, 4:2:0), restart intervals (DRI/RSTn), byte stuffing.
  Arithmetic coding and hierarchical/lossless frames raise
  NotImplementedError.
- progressive encoder (``progressive=True``): libjpeg-style scan script
  (DC Al=1 -> per-component AC bands Al=1 -> DC refine -> AC refines)
  with EOB-run coalescing, so the decoder's refinement paths are
  exercised end-to-end by our own streams.

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


# Progressive AC table: Annex K tables lack the EOBn symbols (r<<4, r>0)
# progressive EOB runs need, so scans use one flat canonical table holding
# every (run, size) symbol at code length 9 (176 codes < 511, all-ones
# code unused as required).
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]
_AC_PROG_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: truncate toward zero (G.1.2.1)."""
    return -((-v) >> al) if v < 0 else v >> al


class _AcScanState:
    """EOB-run + buffered-correction-bit state shared across one AC scan."""

    def __init__(self, writer, ac_codes):
        self.w = writer
        self.codes = ac_codes
        self.eobrun = 0
        self.be: list[int] = []  # correction bits owed with the next EOB flush

    def flush_eob(self):
        if self.eobrun == 0 and not self.be:
            return
        n = self.eobrun
        r = n.bit_length() - 1
        c, ln = self.codes[r << 4]
        self.w.put(c, ln)
        if r:
            self.w.put(n & ((1 << r) - 1), r)
        for b in self.be:
            self.w.put(b, 1)
        self.eobrun = 0
        self.be = []

    def sym(self, rs: int):
        self.flush_eob()
        c, ln = self.codes[rs]
        self.w.put(c, ln)


def _enc_ac_first(st: _AcScanState, blk, ss: int, se: int, al: int):
    t = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
    if not any(t):
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()
        return
    run = 0
    last_nz = max(i for i, v in enumerate(t) if v)
    for i, v in enumerate(t[: last_nz + 1]):
        if v == 0:
            run += 1
            continue
        while run > 15:
            st.sym(0xF0)
            run -= 16
        size, bits = _magnitude(v)
        st.sym((run << 4) | size)
        st.w.put(bits, size)
        run = 0
    if last_nz < len(t) - 1:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def _enc_ac_refine(st: _AcScanState, blk, ss: int, se: int, al: int):
    t = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
    run = 0
    br: list[int] = []  # correction bits since the last emitted symbol
    pending = False
    for v in t:
        a = -v if v < 0 else v
        if a == 0:
            run += 1
            pending = True
            continue
        # invariant: flush ZRL before buffering any bit once run > 15, so
        # buffered correction bits always precede the 16th zero-history
        # coefficient of their window (decoder reads them inside the ZRL
        # advance; libjpeg encode_mcu_AC_refine keeps the same invariant)
        while run > 15:
            st.sym(0xF0)
            for b in br:
                st.w.put(b, 1)
            br = []
            run -= 16
        if a > 1:
            br.append(a & 1)
            pending = True
            continue
        # newly significant this scan
        st.sym((run << 4) | 1)
        st.w.put(1 if v > 0 else 0, 1)
        for b in br:
            st.w.put(b, 1)
        br = []
        run = 0
        pending = False
    if pending:
        st.eobrun += 1
        st.be.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def _comp_block_grid(fw, fh, ch, cv, hmax, vmax):
    """True (non-MCU-padded) block grid of one component."""
    cw = -(-fw * ch // hmax)
    chh = -(-fh * cv // vmax)
    return -(-cw // 8), -(-chh // 8)


_PROG_AC_BANDS = {0: [(1, 5), (6, 63)]}  # comp 0 split to exercise Ss/Se


def _prog_scan_script(ncomp: int):
    """(comp_indices, Ss, Se, Ah, Al) per scan, libjpeg-shaped."""
    scans = [(list(range(ncomp)), 0, 0, 0, 1)]
    for ci in range(ncomp):
        for ss, se in _PROG_AC_BANDS.get(ci, [(1, 63)]):
            scans.append(([ci], ss, se, 0, 1))
    scans.append((list(range(ncomp)), 0, 0, 1, 0))
    for ci in range(ncomp):
        for ss, se in _PROG_AC_BANDS.get(ci, [(1, 63)]):
            scans.append(([ci], ss, se, 1, 0))
    return scans


def _encode_progressive_scans(
    ncomp, planes, comp_coefs, comp_nbx, mcux, mcuy, h, w, hmax, vmax, ri
) -> bytes:
    dc_codes = [
        _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
        if ci == 0
        else _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        for ci in range(ncomp)
    ]
    ac_codes = _build_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    out = bytearray()
    for comp_idx, ss, se, ah, al in _prog_scan_script(ncomp):
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        writer = _BitWriter()
        rst = 0

        def emit_restart(st=None):
            nonlocal rst
            if st is not None:
                st.flush_eob()
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1

        if ss == 0:  # DC scan, MCU-interleaved over all scan components
            preds = [0] * ncomp
            for m in range(mcux * mcuy):
                if ri and m and m % ri == 0:
                    emit_restart()
                    preds = [0] * ncomp
                my, mx = divmod(m, mcux)
                for ci in comp_idx:
                    _, ch, cv = planes[ci]
                    nbx = comp_nbx[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            c0 = int(
                                comp_coefs[ci][(my * cv + by) * nbx + (mx * ch + bx)][0]
                            )
                            if ah == 0:
                                v = c0 >> al
                                size, bits = _magnitude(v - preds[ci])
                                preds[ci] = v
                                c, ln = dc_codes[ci][size]
                                writer.put(c, ln)
                                if size:
                                    writer.put(bits, size)
                            else:
                                writer.put((c0 >> al) & 1, 1)
        else:  # AC scan: single component over its TRUE block grid
            ci = comp_idx[0]
            _, ch, cv = planes[ci]
            bw, bh = _comp_block_grid(w, h, ch, cv, hmax, vmax)
            nbx = comp_nbx[ci]
            st = _AcScanState(writer, ac_codes)
            nblk = 0
            for by in range(bh):
                for bx in range(bw):
                    if ri and nblk and nblk % ri == 0:
                        emit_restart(st)
                    nblk += 1
                    blk = comp_coefs[ci][by * nbx + bx]
                    if ah == 0:
                        _enc_ac_first(st, blk, ss, se, al)
                    else:
                        _enc_ac_refine(st, blk, ss, se, al)
            st.flush_eob()
        writer.flush()
        out += writer.out
    return bytes(out)


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """8-bit grayscale (h, w[, 1]) or RGB (h, w, 3) -> baseline JFIF bytes.
    ``subsample``: "444" (no chroma subsampling) or "420" (2x2).
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none).
    ``progressive``: SOF2 multi-scan stream (see _prog_scan_script)."""
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
    # SOF0 (baseline) / SOF2 (progressive)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, planes[ci][1] << 4 | planes[ci][2], 0 if ci == 0 else 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof
    # DHT
    if progressive:
        tables = [(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS), (1, 0, _AC_PROG_BITS, _AC_PROG_VALS)]
        if not gray:
            tables.append((0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
    else:
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
    if progressive:
        out += _encode_progressive_scans(
            ncomp, planes, comp_coefs, comp_nbx, mcux, mcuy, h, w,
            hmax, vmax, restart_interval,
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
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


def _dec_baseline_scan(reader, scan, huff, fg, comp_store, ri):
    mcux, mcuy = fg["mcu"]
    luts = {}
    preds = {}
    for cid, td, ta in scan:
        luts[cid] = (_build_lut(*huff[(0, td)]), _build_lut(*huff[(1, ta)]))
        preds[cid] = 0
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            reader.restart()
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(m, mcux)
        for cid, td, ta in scan:
            (dc_sym, dc_len), (ac_sym, ac_len) = luts[cid]
            ch, cv, nbx, _, _ = fg["comp"][cid]
            cf = comp_store[cid]
            for by in range(cv):
                for bx in range(ch):
                    blk = cf[(my * cv + by) * nbx + (mx * ch + bx)]
                    p = reader.peek16()
                    s = int(dc_sym[p])
                    reader.skip(int(dc_len[p]))
                    preds[cid] += _extend(reader.receive(s), s)
                    blk[0] = preds[cid]
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


def _dec_ac_first(reader, blk, ss, se, al, lut, eobrun):
    """One block of an AC first scan (G.1.2.2); returns remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    sym, ln = lut
    k = ss
    while k <= se:
        p = reader.peek16()
        rs = int(sym[p])
        reader.skip(int(ln[p]))
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            break
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _dec_ac_refine(reader, blk, ss, se, al, lut, eobrun):
    """One block of an AC refinement scan (G.1.2.3); returns EOB run."""
    sym, ln = lut
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            p = reader.peek16()
            rs = int(sym[p])
            reader.skip(int(ln[p]))
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:
                val = p1 if reader.receive(1) else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.receive(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if reader.receive(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _dec_prog_scan(reader, scan, ss, se, ah, al, huff, fg, comp_store, ri):
    mcux, mcuy = fg["mcu"]
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        luts = {cid: _build_lut(*huff[(0, td)]) if ah == 0 else None
                for cid, td, ta in scan}
        preds = {cid: 0 for cid, _, _ in scan}
        if len(scan) == 1:  # non-interleaved: true component grid
            cid, td, _ = scan[0]
            ch, cv, nbx, bw, bh = fg["comp"][cid]
            units = (
                (cid, by * nbx + bx) for by in range(bh) for bx in range(bw)
            )
        else:
            def mcu_units():
                for m in range(mcux * mcuy):
                    my, mx = divmod(m, mcux)
                    for cid, _, _ in scan:
                        ch, cv, nbx, _, _ = fg["comp"][cid]
                        for by in range(cv):
                            for bx in range(ch):
                                yield cid, (my * cv + by) * nbx + (mx * ch + bx)

            units = mcu_units()
        # restart cadence: MCUs when interleaved, blocks when not — both
        # equal one yielded unit per (ns==1) block / per-MCU grouping below
        n_per_mcu = (
            1 if len(scan) == 1
            else sum(fg["comp"][cid][0] * fg["comp"][cid][1] for cid, _, _ in scan)
        )
        for i, (cid, idx) in enumerate(units):
            if ri and i and i % (ri * n_per_mcu) == 0:
                reader.restart()
                preds = {c: 0 for c in preds}
            blk = comp_store[cid][idx]
            if ah == 0:
                dc_sym, dc_len = luts[cid]
                p = reader.peek16()
                s = int(dc_sym[p])
                reader.skip(int(dc_len[p]))
                preds[cid] += _extend(reader.receive(s), s)
                blk[0] = preds[cid] << al
            else:
                if reader.receive(1):
                    blk[0] = int(blk[0]) | (1 << al)
        return
    # AC scan: exactly one component, true block grid
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cid, td, ta = scan[0]
    ac_lut = _build_lut(*huff[(1, ta)])
    ch, cv, nbx, bw, bh = fg["comp"][cid]
    cf = comp_store[cid]
    eobrun = 0
    nblk = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and nblk and nblk % ri == 0:
                reader.restart()
                eobrun = 0
            nblk += 1
            blk = cf[by * nbx + bx]
            if ah == 0:
                eobrun = _dec_ac_first(reader, blk, ss, se, al, ac_lut, eobrun)
            else:
                eobrun = _dec_ac_refine(reader, blk, ss, se, al, ac_lut, eobrun)


def jpeg_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[list, list]] = {}
    frame = None
    progressive = False
    ri = 0
    fg = None  # frame geometry: {"mcu": (mcux, mcuy), "comp": cid -> dims}
    comp_store: dict[int, np.ndarray] | None = None
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        if marker == 0xFF:  # legal fill byte (B.1.1.2: FF FF ... <marker>)
            pos += 1
            continue
        if marker == 0x00:  # stray stuffed byte, not a marker
            pos += 2
            continue
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            fg = {"mcu": (mcux, mcuy), "comp": {}}
            comp_store = {}
            for cid, ch, cv, tq in comps:
                nbx, nby = mcux * ch, mcuy * cv
                bw, bh = _comp_block_grid(fw, fh, ch, cv, hmax, vmax)
                fg["comp"][cid] = (ch, cv, nbx, bw, bh)
                comp_store[cid] = np.zeros((nby * nbx, 64), dtype=np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS (possibly one of many progressive scans)
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tds = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cid, tds >> 4, tds & 15))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pos += seglen
            reader = _BitReader(data, pos)
            if progressive:
                _dec_prog_scan(
                    reader, scan, ss, se, ahal >> 4, ahal & 15,
                    huff, fg, comp_store, ri,
                )
            else:
                _dec_baseline_scan(reader, scan, huff, fg, comp_store, ri)
            saw_scan = True
            pos = reader.pos
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("missing SOF/SOS")

    # dequantize + IDCT per frame component (vectorized), upsample, stack
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for cid, ch, cv, tq in comps:
        _, _, nbx, _, _ = fg["comp"][cid]
        qt = qts[tq]
        cf = comp_store[cid]
        nat = np.zeros_like(cf)
        nat[:, _ZZ] = cf  # zigzag -> natural, THEN dequantize
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

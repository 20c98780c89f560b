"""Image payload codec + raster resampling kernels (pure NumPy + zlib).

The container has no PIL/cv2/rasterio, so:

- PNG encode/decode is implemented for real against the public PNG spec
  (IHDR/IDAT/IEND, filters 0-4, 8-bit RGB) using stdlib zlib — lossless
  round-trip, used by the tiling tests' PSNR checks.
- JPEG is implemented for real in ``stages/jpeg.py`` (baseline sequential
  DCT, Annex K tables, 4:4:4 / 4:2:0, restart intervals) — pure NumPy.
  ``FJPG`` remains as a clearly-marked deterministic HIGH-THROUGHPUT
  stand-in (quantized raw pixels, zlib) used for pooled bulk payloads in
  benches, where the Python entropy coder would dominate wall time.
- ``resample_nearest`` is the warp kernel for raster->tile assignment
  (reference: RasterDataAdapter.java:596-810 resamples coverage pixels
  into fixed 256x256 SFC-cell tiles).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["png_encode", "png_decode", "fjpg_encode", "fjpg_decode", "encode_image", "decode_image", "resample_nearest", "psnr", "sniff_image_meta", "ASPECT_BUCKETS", "aspect_bucket_assign"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


_PNG_CTYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type (L, RGB, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def png_encode(arr: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 -> PNG bytes (filter 0, 8-bit; c in {1, 3, 4} =
    grayscale / RGB / RGBA)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = _PNG_CTYPE[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a, b, c):
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    off = 8
    w = h = None
    idat = []
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body, 0)
            if depth != 8 or ctype not in _PNG_CHANNELS:
                raise NotImplementedError(
                    "only 8-bit grayscale/RGB/RGBA PNG supported"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    nch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * nch
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = nch
    for y in range(h):
        line = raw[y, 1:].copy()
        f = filters[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:
            for x in range(stride):
                line[x] = (line[x] + (out[y, x - bpp] if x >= bpp else 0)) & 0xFF
                out[y, x] = line[x]
        elif f == 2:
            out[y] = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
                out[y, x] = line[x]
        elif f == 4:
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                pr = _paeth(
                    np.asarray(left), np.asarray(prev[x]), np.asarray(ul)
                )
                line[x] = (line[x] + int(pr)) & 0xFF
                out[y, x] = line[x]
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, nch)


_FJPG_MAGIC = b"FJPG"
_FJPG_Q = 4  # quantization step; max error 2 per channel -> PSNR ~42dB worst case


def fjpg_encode(arr: np.ndarray, q: int = _FJPG_Q) -> bytes:
    """Deterministic lossy stand-in for JPEG (see module docstring)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    quant = (arr.astype(np.int16) // q).astype(np.uint8)
    payload = zlib.compress(quant.tobytes(), 6)
    return _FJPG_MAGIC + struct.pack(">IIB", w, h, q) + payload


def fjpg_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _FJPG_MAGIC, "not an FJPG payload"
    w, h, q = struct.unpack_from(">IIB", data, 4)
    quant = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bin centers
    return np.clip(quant.astype(np.int16) * q + q // 2, 0, 255).astype(np.uint8)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "jpeg":
        from .jpeg import jpeg_encode

        return jpeg_encode(arr)
    if fmt == "fjpg":
        return fjpg_encode(arr)
    raise ValueError(fmt)


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:4] == _FJPG_MAGIC:
        return fjpg_decode(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        return jpeg_decode(data)
    raise NotImplementedError(
        f"unsupported image payload (fmt={fmt}); PNG, baseline JPEG and FJPG "
        "are the formats this engine writes"
    )


def resample_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample (the reference's non-footprint fallback;
    RasterDataAdapter uses bilinear by default inside the footprint —
    PSNR>=40 tolerance covers the resampler difference per BASELINE.md)."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    xi = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return arr[yi[:, None], xi[None, :]]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(255.0**2 / mse))


# ----------------------------------------------------------- augmentation
def hflip(arr: np.ndarray) -> np.ndarray:
    """Horizontal mirror (left-right)."""
    return arr[:, ::-1]


def vflip(arr: np.ndarray) -> np.ndarray:
    """Vertical mirror (top-bottom)."""
    return arr[::-1]


def rot90(arr: np.ndarray, k: int = 1) -> np.ndarray:
    """Counter-clockwise quarter turns over the (h, w) axes."""
    return np.rot90(arr, k=k, axes=(0, 1))


def center_crop(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Centered crop; offsets floor((dim - out)/2)."""
    h, w = arr.shape[:2]
    if out_h > h or out_w > w:
        raise ValueError(f"crop {out_h}x{out_w} larger than image {h}x{w}")
    y0 = (h - out_h) // 2
    x0 = (w - out_w) // 2
    return arr[y0 : y0 + out_h, x0 : x0 + out_w]


def sniff_image_meta(data: bytes) -> tuple[str, int, int, int]:
    """(fmt, width, height, n_components) from CONTAINER HEADERS ONLY —
    no pixel decode, no entropy scan.  The header-only metadata pass a
    100-TB curation pipeline runs before deciding what to decode (the
    reference reads raster metadata through ImageIO readers without
    materializing rasters — RasterDataAdapter.java:444-550).

    Cost is O(header bytes) per payload regardless of payload size: PNG
    IHDR is at a fixed offset, FJPG has a fixed 13-byte header, and JPEG
    dims come from the first SOFn marker reached by skipping each
    segment via its length field (never scanning entropy-coded data).
    """
    import struct

    if data[:8] == _PNG_SIG:
        # IHDR is always the first chunk: length@8, tag@12, data@16
        w, h = struct.unpack(">II", data[16:24])
        color_type = data[25]
        ncomp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return "png", int(w), int(h), ncomp
    if data[:4] == _FJPG_MAGIC:
        w, h, _q = struct.unpack(">IIB", data[4:13])
        return "fjpg", int(w), int(h), 3
    if data[:2] == b"\xff\xd8":
        pos = 2
        n = len(data)
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                ncomp = data[pos + 9]
                return "jpeg", int(w), int(h), int(ncomp)
            pos += 2 + seglen
        raise ValueError("JPEG stream without SOF marker")
    raise NotImplementedError(
        "unsupported image payload; PNG, JPEG and FJPG headers are sniffable"
    )


# SDXL-style aspect-ratio buckets (w, h) — the training-batch bucketing
# step of large image pipelines (NovelAI bucketing / SDXL Appendix I):
# every image is routed to the bucket whose aspect ratio is closest, so
# batches share a resize target and no image is heavily letterboxed.
ASPECT_BUCKETS = (
    (1024, 1024),
    (1152, 896),
    (896, 1152),
    (1216, 832),
    (832, 1216),
    (1344, 768),
    (768, 1344),
    (1536, 640),
    (640, 1536),
)


def aspect_bucket_assign(w: np.ndarray, h: np.ndarray, buckets=ASPECT_BUCKETS):
    """Vectorized nearest-aspect bucket assignment.  Closeness is the EXACT
    integer cross-multiplication residual |w*bh - h*bw| (sign-free ratio
    comparison — no float log-ratios, so the rule replays exactly in SQL),
    ties -> smallest bucket index.  Returns (bucket_w, bucket_h) arrays."""
    w = np.asarray(w, dtype=np.int64)
    h = np.asarray(h, dtype=np.int64)
    bw = np.array([b[0] for b in buckets], dtype=np.int64)
    bh = np.array([b[1] for b in buckets], dtype=np.int64)
    # (n, k) residual matrix; argmin takes the first (smallest index) tie
    resid = np.abs(w[:, None] * bh[None, :] - h[:, None] * bw[None, :])
    idx = np.argmin(resid, axis=1)
    return bw[idx], bh[idx]

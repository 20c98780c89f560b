"""Video multimodal plumbing: indexed frame container + frame sampling.

Real video codecs (H.264/VP9/AV1) have no in-container decoder (ffmpeg is
banned like PIL), so the CONTAINER and the Ray-side plumbing are the real
part here, per the round brief's multimodal contract: video rides as an
opaque ``binary`` column with typed metadata, and frame sampling is a
``map_batches`` stage that decodes ONLY the selected frames.

``FVC1`` container layout (deterministic, self-indexing):

    b"FVC1" | u32 n_frames | u16 w | u16 h | u8 channels
    | u32 offsets[n_frames + 1]   (relative to payload start)
    | concatenated per-frame image payloads (any stages/imaging codec:
      PNG real, FJPG stand-in, baseline JPEG)

The offsets table is the point: ``sample_frames`` slices just the chosen
frames' byte ranges out of the blob — at 100 TB the decode cost scales
with frames SAMPLED, not frames stored (frame payloads never move
separately; the blob column itself never shuffles).

Anything without the FVC1 magic raises NotImplementedError naming the
payload, mirroring decode_image / wav_decode.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import decode_image, encode_image

__all__ = ["fvc_encode", "fvc_info", "fvc_decode_frames", "sample_indices", "FrameSampler"]

_MAGIC = b"FVC1"


def fvc_encode(frames: np.ndarray, fmt: str = "png") -> bytes:
    """(n, h, w) gray or (n, h, w, c) frames -> FVC1 container bytes."""
    a = np.asarray(frames)
    if a.ndim == 3:
        a = a[..., None]
    n, h, w, c = a.shape
    payloads = [encode_image(f if c > 1 else f[..., 0], fmt) for f in a]
    offsets = np.zeros(n + 1, dtype=np.uint32)
    np.cumsum([len(p) for p in payloads], out=offsets[1:])
    head = _MAGIC + struct.pack("<IHHB", n, w, h, c)
    return head + offsets.astype("<u4").tobytes() + b"".join(payloads)


def _header(data: bytes):
    if data[:4] != _MAGIC:
        raise NotImplementedError(
            "unsupported video payload (no FVC1 magic); real codecs "
            "(H.264/VP9/AV1) have no in-container decoder"
        )
    n, w, h, c = struct.unpack("<IHHB", data[4:13])
    off = np.frombuffer(data, dtype="<u4", count=n + 1, offset=13)
    payload_start = 13 + 4 * (n + 1)
    return n, w, h, c, off, payload_start


def fvc_info(data: bytes) -> dict:
    """Container metadata without decoding any frame."""
    n, w, h, c, off, _ = _header(data)
    return {"n_frames": n, "width": w, "height": h, "channels": c,
            "payload_bytes": int(off[-1])}


def fvc_decode_frames(data: bytes, indices) -> list[np.ndarray]:
    """Decode ONLY the requested frame indices (byte-range slices)."""
    n, w, h, c, off, start = _header(data)
    out = []
    for i in indices:
        if not 0 <= i < n:
            raise IndexError(f"frame {i} of {n}")
        blob = data[start + int(off[i]) : start + int(off[i + 1])]
        out.append(decode_image(blob))
    return out


def sample_indices(n_frames: int, k: int) -> np.ndarray:
    """Deterministic uniform sample: floor(j * n / k), j in [0, k) — the
    same rule a SQL oracle replays; distinct whenever n >= k."""
    k = min(k, n_frames)
    return (np.arange(k, dtype=np.int64) * n_frames) // k


class FrameSampler:
    """map_batches stage: video binary rows -> one row per sampled frame
    with integer intensity features (sum over all pixels/channels)."""

    __name__ = "frame_sampler"

    def __init__(self, video_col: str = "video", k: int = 3, keep_cols: tuple = ("clip_id",)):
        self.video_col = video_col
        self.k = k
        self.keep_cols = list(keep_cols)

    def __call__(self, batch):
        import pyarrow as pa

        keep_idx: list[int] = []
        fidx: list[int] = []
        nfr: list[int] = []
        sums: list[int] = []
        for row, blob in enumerate(batch.column(self.video_col)):
            data = blob.as_py()
            n = fvc_info(data)["n_frames"]
            idx = sample_indices(n, self.k)
            frames = fvc_decode_frames(data, idx)
            for i, f in zip(idx, frames):
                keep_idx.append(row)
                fidx.append(int(i))
                nfr.append(n)
                sums.append(int(np.asarray(f, dtype=np.int64).sum()))
        out = batch.select(self.keep_cols).take(pa.array(keep_idx, type=pa.int64()))
        out = out.append_column("frame_idx", pa.array(fidx, type=pa.int64()))
        out = out.append_column("n_frames", pa.array(nfr, type=pa.int64()))
        return out.append_column("sum_intensity", pa.array(sums, type=pa.int64()))

"""Audio multimodal plumbing: real RIFF/PCM WAV codec + feature stages.

The engine treats audio like images (stages/imaging.py): an opaque
``binary`` column plus typed metadata (sample rate, channels, format tag),
decoded and featurized inside ``map_batches`` stages.  The WAV codec is
REAL (RIFF/WAVE PCM, pure NumPy/stdlib — the container bans soundfile/
scipy.io just like PIL): 8-bit unsigned, 16-bit signed and 32-bit float
PCM, mono or interleaved stereo, chunk-walking reader that skips unknown
chunks (LIST/fact/cue).  Compressed formats (MP3/AAC/Opus) have no
in-container codec and raise NotImplementedError with the format named —
the Ray-side plumbing (schema, batch shape, stage signature) is identical
for them.

Scale notes: payload bytes never shuffle — synth/encode, decode and
featurize are all narrow map_batches stages; per-clip work is NumPy
kernels (abs-sum, sign-change count, peak, RMS frames); batch sizes stay
small because rows are ~KB-MB binaries (same sizing rule as image tiles).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "wav_encode",
    "wav_decode",
    "audio_features",
    "resample_linear",
    "AudioFeaturizer",
]

_FMT_PCM = 1
_FMT_FLOAT = 3


def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n,) mono or (n, ch) interleaved samples -> RIFF/WAVE bytes.

    ``bits``: 8 (unsigned PCM), 16 (signed PCM) or 32 (IEEE float).
    Integer inputs are taken as already-scaled PCM; float inputs are
    clipped to [-1, 1] and scaled for integer targets."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if bits == 16:
        fmt_tag, sampwidth = _FMT_PCM, 2
        if np.issubdtype(a.dtype, np.floating):
            a = np.round(np.clip(a, -1, 1) * 32767).astype(np.int16)
        else:
            a = a.astype(np.int16)
    elif bits == 8:
        fmt_tag, sampwidth = _FMT_PCM, 1
        if np.issubdtype(a.dtype, np.floating):
            a = np.round(np.clip(a, -1, 1) * 127 + 128).astype(np.uint8)
        else:
            a = a.astype(np.uint8)
    elif bits == 32:
        fmt_tag, sampwidth = _FMT_FLOAT, 4
        a = a.astype(np.float32)
    else:
        raise ValueError("bits must be 8, 16 or 32")
    payload = np.ascontiguousarray(a).tobytes()  # row-major == interleaved
    byte_rate = sample_rate * ch * sampwidth
    block_align = ch * sampwidth
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, ch, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n, ch) samples in their native dtype, rate).

    Walks chunks and skips unknown ones (LIST, fact, cue ...); raises
    NotImplementedError for non-PCM format tags (MP3/ADPCM/...) naming
    the tag, mirroring decode_image's unsupported-payload contract."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "unsupported audio payload (not RIFF/WAVE); compressed codecs "
            "(MP3/AAC/Opus) have no in-container decoder"
        )
    pos = 12
    fmt_tag = ch = rate = bits = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_tag is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_tag == _FMT_PCM and bits == 16:
        a = np.frombuffer(payload, dtype="<i2")
    elif fmt_tag == _FMT_PCM and bits == 8:
        a = np.frombuffer(payload, dtype=np.uint8)
    elif fmt_tag == _FMT_FLOAT and bits == 32:
        a = np.frombuffer(payload, dtype="<f4")
    else:
        raise NotImplementedError(f"WAV format tag {fmt_tag} / {bits}-bit unsupported")
    if ch > 1:
        a = a.reshape(-1, ch)
    else:
        a = a.reshape(-1, 1)
    return a, rate


def resample_linear(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resample, (n, ch) -> (m, ch) float64."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n = len(a)
    m = max(1, int(round(n * rate_out / rate_in)))
    x = np.linspace(0.0, n - 1, m)
    out = np.empty((m, a.shape[1]))
    for c in range(a.shape[1]):
        out[:, c] = np.interp(x, np.arange(n), a[:, c])
    return out


def audio_features(samples: np.ndarray) -> dict:
    """Integer-exact clip features over channel-0 PCM samples: count,
    abs-sum, peak, zero crossings (sign-bit change between neighbours,
    negatives vs non-negatives).  Float samples (32-bit WAV, [-1, 1]) are
    scaled to the int16 grid first — truncating them to int64 directly
    would zero every feature."""
    s = np.asarray(samples)
    if s.ndim == 2:
        s = s[:, 0]
    if np.issubdtype(s.dtype, np.floating):
        s = np.round(s * 32767.0)
    s = s.astype(np.int64)
    neg = s < 0
    return {
        "n_samples": int(len(s)),
        "sum_abs": int(np.abs(s).sum()),
        "peak": int(np.abs(s).max()) if len(s) else 0,
        "zero_crossings": int(np.count_nonzero(neg[1:] != neg[:-1])),
    }


class AudioFeaturizer:
    """map_batches stage: decode WAV binary rows -> feature columns.
    Per-clip decode is the inherent unit of work (same as image decode);
    everything inside a clip is a NumPy kernel."""

    __name__ = "audio_features"

    def __init__(self, audio_col: str = "audio", keep_cols: tuple = ("clip_id",)):
        self.audio_col = audio_col
        self.keep_cols = list(keep_cols)

    def __call__(self, batch):
        import pyarrow as pa

        feats = {"n_samples": [], "sum_abs": [], "peak": [], "zero_crossings": []}
        rates = []
        for blob in batch.column(self.audio_col):
            samples, rate = wav_decode(blob.as_py())
            f = audio_features(samples)
            for k in feats:
                feats[k].append(f[k])
            rates.append(rate)
        out = batch.select(self.keep_cols)
        for k, v in feats.items():
            out = out.append_column(k, pa.array(v, type=pa.int64()))
        return out.append_column("sample_rate", pa.array(rates, type=pa.int64()))

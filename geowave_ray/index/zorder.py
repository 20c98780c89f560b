"""Vectorized Z-order (Morton) curve (pure NumPy).

Mirrors reference semantics of ``core/index/.../sfc/zorder/ZOrderSFC.java``:
bit interleaving of per-dimension cell coordinates; range decomposition is a
single over-inclusive [minZ, maxZ] range (noted suboptimal in the reference
at ZOrderSFC.java:102-105 — kept for parity, the tiered strategy bounds the
over-inclusion).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ZOrderCurve"]


def _spread_bits(x: np.ndarray, n_dims: int, bits: int) -> np.ndarray:
    """Insert n_dims-1 zero bits between each bit of x (uint64)."""
    x = np.asarray(x, dtype=np.uint64)
    out = np.zeros_like(x)
    for i in range(bits):
        out |= ((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(i * n_dims)
    return out


class ZOrderCurve:
    def __init__(self, n_dims: int, bits: int):
        if n_dims * bits > 64:
            raise ValueError("total precision > 64 bits unsupported")
        self.n_dims = n_dims
        self.bits = bits
        self.total_bits = n_dims * bits

    def encode(self, coords: list[np.ndarray]) -> np.ndarray:
        """dim j contributes bit position j of each interleaved group (dim 0
        least significant), matching the ordering used for Hilbert labels."""
        out = np.zeros(np.asarray(coords[0]).shape, dtype=np.uint64)
        for j, c in enumerate(coords):
            out |= _spread_bits(c, self.n_dims, self.bits) << np.uint64(j)
        return out

    def decode(self, z: np.ndarray) -> list[np.ndarray]:
        z = np.asarray(z, dtype=np.uint64)
        coords = []
        for j in range(self.n_dims):
            c = np.zeros_like(z)
            for i in range(self.bits):
                c |= ((z >> np.uint64(i * self.n_dims + j)) & np.uint64(1)) << np.uint64(i)
            coords.append(c)
        return coords

    def decompose_range(
        self, mins: list[int], maxs: list[int], max_ranges: int = -1, **_
    ) -> list[tuple[int, int]]:
        lo = self.encode([np.asarray([m], dtype=np.uint64) for m in mins])[0]
        hi = self.encode([np.asarray([m], dtype=np.uint64) for m in maxs])[0]
        return [(int(lo), int(hi))]

"""XZ-order space-filling curve for extended objects (boxes).

Reference behavior: ``core/index/.../sfc/xz/XZOrderSFC.java:44-120`` —
GeoWave keys polygons/boxes by XZ-ordering (Böhm, Klump, Kriegel,
"XZ-Ordering: A Space-Filling Curve for Objects with Spatial Extension",
SSD'99 — public) instead of duplicating across tiles.  An object maps to a
single *enlarged* quadtree element: the cell containing its min corner at
the deepest level where the doubled (x2-extended) cell still covers the
object.  max resolution g=11 levels as in the reference.

Implemented vectorized over NumPy box arrays; used as the alternative
polygon-side keying of the shuffle join.
"""

from __future__ import annotations

import numpy as np

__all__ = ["XZOrderSFC"]


class XZOrderSFC:
    def __init__(self, g: int = 11, bounds=(-180.0, -90.0, 180.0, 90.0)):
        self.g = g
        self.x0, self.y0, self.x1, self.y1 = bounds
        # number of descendant sequences below level i (for code arithmetic):
        # I(i) = (4^(g-i+1) - 1) / 3 elements in a subtree rooted at level i
        self._subtree = np.array(
            [(4 ** (g - i + 1) - 1) // 3 for i in range(1, g + 2)], dtype=np.int64
        )

    def _normalize(self, minx, miny, maxx, maxy):
        nx0 = (np.asarray(minx, dtype=np.float64) - self.x0) / (self.x1 - self.x0)
        ny0 = (np.asarray(miny, dtype=np.float64) - self.y0) / (self.y1 - self.y0)
        nx1 = (np.asarray(maxx, dtype=np.float64) - self.x0) / (self.x1 - self.x0)
        ny1 = (np.asarray(maxy, dtype=np.float64) - self.y0) / (self.y1 - self.y0)
        return (
            np.clip(nx0, 0, 1),
            np.clip(ny0, 0, 1),
            np.clip(nx1, 0, 1),
            np.clip(ny1, 0, 1),
        )

    def level_of(self, minx, miny, maxx, maxy) -> np.ndarray:
        """Deepest level l whose x2-enlarged element anchored at the min
        corner's cell covers the box (sequence length l1 = floor(log(maxdim)
        / log(0.5)) capped at g, then verified — XZOrderSFC.java:44-120)."""
        nx0, ny0, nx1, ny1 = self._normalize(minx, miny, maxx, maxy)
        w = np.maximum(np.maximum(nx1 - nx0, ny1 - ny0), 1e-12)
        l1 = np.clip(np.floor(np.log(w) / np.log(0.5)), 0, self.g).astype(np.int64)

        def fits_at(lv):
            cs = 0.5 ** lv.astype(np.float64)  # cell size at level lv
            cx = np.floor(nx0 / cs) * cs
            cy = np.floor(ny0 / cs) * cs
            return (nx1 <= cx + 2 * cs) & (ny1 <= cy + 2 * cs)

        # probe one level DEEPER first: the reference sequence-length choice
        # (XZOrderSFC.java:44-120) prefers l1+1 when the doubled element at
        # the deeper level still covers the object
        deeper = np.minimum(l1 + 1, self.g)
        l1 = np.where((deeper > l1) & fits_at(deeper), deeper, l1)
        # then verify the chosen level; step coarser until it covers
        for _ in range(2):
            l1 = np.where(fits_at(l1), l1, np.maximum(l1 - 1, 0))
        return l1

    def encode_boxes(self, minx, miny, maxx, maxy) -> np.ndarray:
        """-> int64 XZ sequence codes (unique per enlarged element; code
        order = depth-first quadrant order)."""
        nx0, ny0, nx1, ny1 = self._normalize(minx, miny, maxx, maxy)
        levels = self.level_of(minx, miny, maxx, maxy)
        n = len(np.atleast_1d(levels))
        code = np.zeros(n, dtype=np.int64)
        x_lo = np.zeros(n)
        y_lo = np.zeros(n)
        cs = np.ones(n)
        for i in range(1, self.g + 1):
            active = levels >= i
            if not active.any():
                break
            cs_i = cs / 2
            right = nx0 >= x_lo + cs_i
            top = ny0 >= y_lo + cs_i
            quad = right.astype(np.int64) + 2 * top.astype(np.int64)
            # DFS preorder rank: +1 for the element itself, skip the quad
            # earlier siblings' whole subtrees at level i
            step = 1 + quad * self._subtree[i - 1]
            code = np.where(active, code + step, code)
            x_lo = np.where(active & right, x_lo + cs_i, x_lo)
            y_lo = np.where(active & top, y_lo + cs_i, y_lo)
            cs = np.where(active, cs_i, cs)
        return code

    def element_extent(self, minx, miny, maxx, maxy):
        """The enlarged element (x2 cell) covering each box — the coarse
        key extent used for cogrouping."""
        nx0, ny0, _, _ = self._normalize(minx, miny, maxx, maxy)
        levels = self.level_of(minx, miny, maxx, maxy)
        cs = 0.5**levels.astype(np.float64)
        cx = np.floor(nx0 / cs) * cs
        cy = np.floor(ny0 / cs) * cs
        sx = self.x1 - self.x0
        sy = self.y1 - self.y0
        return (
            self.x0 + cx * sx,
            self.y0 + cy * sy,
            self.x0 + np.minimum(cx + 2 * cs, 1.0) * sx,
            self.y0 + np.minimum(cy + 2 * cs, 1.0) * sy,
        )

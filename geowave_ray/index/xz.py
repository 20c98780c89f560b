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

    def subtree_size(self, level: int) -> int:
        """Elements in a subtree rooted at an element of ``level`` (incl.)."""
        return (4 ** (self.g - level + 1) - 1) // 3

    def query_ranges(
        self, minx: float, miny: float, maxx: float, maxy: float, max_ranges: int = -1
    ) -> list[tuple[int, int]]:
        """XZ code ranges whose elements may hold objects intersecting the
        query box (over-inclusive, Böhm SSD'99 query algorithm): an element
        is a candidate iff its DOUBLED region intersects the box; a subtree
        is taken whole when the doubled region is contained (every stored
        object's min corner then lies inside the box)."""
        qx0, qy0, qx1, qy1 = (float(v[()] if hasattr(v, "shape") else v) for v in self._normalize(minx, miny, maxx, maxy))
        out: list[tuple[int, int]] = []
        stack = [(0, 0.0, 0.0, 1.0, 0)]
        while stack:
            l, x, y, cs, code = stack.pop()
            dx1, dy1 = x + 2 * cs, y + 2 * cs
            if qx0 > dx1 or qx1 < x or qy0 > dy1 or qy1 < y:
                continue  # doubled region disjoint from the query
            if x >= qx0 and y >= qy0 and dx1 <= qx1 and dy1 <= qy1:
                out.append((code, code + self.subtree_size(l) - 1))
                continue
            out.append((code, code))
            if l < self.g:
                cs2 = cs / 2
                child_size = self.subtree_size(l + 1)
                for quad in range(4):
                    stack.append(
                        (
                            l + 1,
                            x + (quad & 1) * cs2,
                            y + (quad >> 1) * cs2,
                            cs2,
                            code + 1 + quad * child_size,
                        )
                    )
        out.sort()
        merged: list[list[int]] = []
        for lo, hi in out:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        ranges = [(lo, hi) for lo, hi in merged]
        if max_ranges > 0 and len(ranges) > max_ranges:
            # merge smallest inter-range gaps first (reference coalescing)
            while len(ranges) > max_ranges:
                gaps = [
                    (ranges[i + 1][0] - ranges[i][1], i) for i in range(len(ranges) - 1)
                ]
                _, i = min(gaps)
                ranges[i : i + 2] = [(ranges[i][0], ranges[i + 1][1])]
        return ranges

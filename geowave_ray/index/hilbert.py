"""Vectorized compact Hilbert space-filling curve (pure NumPy).

Reimplements the curve semantics GeoWave gets from the uzaygezen
``CompactHilbertCurve`` (reference behavior anchored by
``core/geotime/src/test/.../sfc/hilbert/HilbertSFCTest.java:28-127``:
(lat,lon) @31 bits -> 3074457345618258602 / 0 / 768614336404564650), using
Hamilton's compact-Hilbert index algorithm (C. Hamilton, "Compact Hilbert
Indices", Dalhousie CS-2006-07 — public).  Equal bits per dimension only
(GeoWave's default spatial and BALANCED spatial-temporal configs are
equal-bit; see reference SpatialDimensionalityTypeProvider.java:45-46).

The per-bit state machine (entry point ``e``, direction ``d``) is
precomputed into lookup tables so the encode/decode hot loops are pure
NumPy gathers — ~2 ops per bit per array element.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HilbertCurve", "CompactHilbertCurve"]


def _gc(i: int) -> int:
    return i ^ (i >> 1)


def _gc_inv(g: int, n: int) -> int:
    i = g
    for j in range(1, n):
        i ^= g >> j
    return i


def _tsb(i: int) -> int:
    c = 0
    while i & 1:
        c += 1
        i >>= 1
    return c


def _rotr(x: int, r: int, n: int) -> int:
    r %= n
    mask = (1 << n) - 1
    return ((x >> r) | (x << (n - r))) & mask


def _rotl(x: int, r: int, n: int) -> int:
    return _rotr(x, n - (r % n), n)


def _entry(w: int) -> int:
    if w == 0:
        return 0
    return _gc(2 * ((w - 1) // 2))


def _direction(w: int, n: int) -> int:
    if w == 0:
        return 0
    if w % 2 == 0:
        return _tsb(w - 1) % n
    return _tsb(w) % n


class HilbertCurve:
    """n-dimensional Hilbert curve over ``bits`` bits per dimension.

    Encode/decode are vectorized over NumPy arrays of cell coordinates
    (uint64).  ``n_dims * bits`` must be <= 64.
    """

    _table_cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def __init__(self, n_dims: int, bits: int):
        if n_dims * bits > 64:
            raise ValueError(f"total precision {n_dims * bits} > 64 bits unsupported")
        self.n_dims = n_dims
        self.bits = bits
        self.total_bits = n_dims * bits
        self.w_table, self.l_table, self.next_state = self._tables(n_dims)

    @classmethod
    def _tables(cls, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if n in cls._table_cache:
            return cls._table_cache[n]
        n_states = (1 << n) * n  # state = e * n + d
        size = n_states << n
        w_table = np.zeros(size, dtype=np.uint8)  # [state<<n | label] -> w
        l_table = np.zeros(size, dtype=np.uint8)  # [state<<n | w] -> label
        next_state = np.zeros(size, dtype=np.uint16)  # same index as w_table
        next_state_inv = np.zeros(size, dtype=np.uint16)
        for e in range(1 << n):
            for d in range(n):
                s = e * n + d
                for w in range(1 << n):
                    l = _rotl(_gc(w), d + 1, n) ^ e  # inverse transform
                    e2 = e ^ _rotl(_entry(w), d + 1, n)
                    d2 = (d + _direction(w, n) + 1) % n
                    s2 = e2 * n + d2
                    w_table[(s << n) | l] = w
                    next_state[(s << n) | l] = s2
                    l_table[(s << n) | w] = l
                    next_state_inv[(s << n) | w] = s2
        # encode and decode share the same next-state transition keyed
        # differently; store both keyed forms
        cls._table_cache[n] = (w_table, l_table, (next_state, next_state_inv))
        return cls._table_cache[n]

    def encode(self, coords: list[np.ndarray]) -> np.ndarray:
        """Cell coordinates (one uint64 array per dimension) -> Hilbert index."""
        n = self.n_dims
        next_state = self.next_state[0]
        coords = [np.asarray(c, dtype=np.uint64) for c in coords]
        h = np.zeros(coords[0].shape, dtype=np.uint64)
        s = np.zeros(coords[0].shape, dtype=np.uint16)
        for i in range(self.bits - 1, -1, -1):
            l = (coords[0] >> np.uint64(i)) & np.uint64(1)
            for j in range(1, n):
                l |= ((coords[j] >> np.uint64(i)) & np.uint64(1)) << np.uint64(j)
            idx = (s.astype(np.uint32) << n) | l.astype(np.uint32)
            w = self.w_table[idx]
            h = (h << np.uint64(n)) | w.astype(np.uint64)
            s = next_state[idx]
        return h

    def decode(self, h: np.ndarray) -> list[np.ndarray]:
        """Hilbert index -> cell coordinates (one uint64 array per dim)."""
        n = self.n_dims
        next_state = self.next_state[1]
        h = np.asarray(h, dtype=np.uint64)
        coords = [np.zeros(h.shape, dtype=np.uint64) for _ in range(n)]
        s = np.zeros(h.shape, dtype=np.uint16)
        mask = np.uint64((1 << n) - 1)
        for i in range(self.bits - 1, -1, -1):
            w = (h >> np.uint64(n * i)) & mask
            idx = (s.astype(np.uint32) << n) | w.astype(np.uint32)
            l = self.l_table[idx].astype(np.uint64)
            for j in range(n):
                coords[j] |= ((l >> np.uint64(j)) & np.uint64(1)) << np.uint64(i)
            s = next_state[idx]
        return coords

    # ---- scalar helpers for the range decomposition (planner side) ----

    def child_cells(self, state: int) -> list[tuple[int, int, int]]:
        """For a node with (e*n+d) ``state``: [(w, label, next_state)] in
        Hilbert (w) order.  ``label`` bit j selects the upper half of dim j."""
        n = self.n_dims
        out = []
        for w in range(1 << n):
            l = int(self.l_table[(state << n) | w])
            s2 = int(self.next_state[1][(state << n) | w])
            out.append((w, l, s2))
        return out

    def decompose_range(
        self,
        mins: list[int],
        maxs: list[int],
        max_ranges: int = -1,
        unit_cell_size: int = 1 << 19,
    ) -> list[tuple[int, int]]:
        """Decompose an axis-aligned cell-coordinate box (inclusive bounds)
        into contiguous [lo, hi] (inclusive) Hilbert index ranges.

        Mirrors the reference planner semantics
        (``PrimitiveHilbertSFCOperations.decomposeRange`` +
        uzaygezen BacktrackingQueryBuilder): full decomposition down to a
        minimum quad size derived from UNIT_CELL_SIZE=2^19, then ranges are
        coalesced and, when ``max_ranges`` > 0, merged smallest-gap-first
        until exactly ``max_ranges`` remain.
        """
        n, m = self.n_dims, self.bits
        # minimum quad size rule (PrimitiveHilbertSFCOperations.getMinimumQuadSize)
        max_extent = max(maxs[j] - mins[j] + 1 for j in range(n))
        max_decomposed = max_extent**n
        min_quad = 1 if max_decomposed <= unit_cell_size else max_decomposed // unit_cell_size
        while True:
            merged = self._decompose_at(mins, maxs, max_ranges, min_quad)
            # the reference backtracking builder refines until it can emit
            # exactly max_ranges; refine further if we stopped too coarse
            if max_ranges > 0 and len(merged) < max_ranges and min_quad > 1:
                min_quad = max(1, min_quad >> 4)
                continue
            return merged

    def _decompose_at(
        self, mins: list[int], maxs: list[int], max_ranges: int, min_quad: int
    ) -> list[tuple[int, int]]:
        n, m = self.n_dims, self.bits
        ranges: list[tuple[int, int]] = []
        # node: (level, state, h_prefix, cell_mins) — cell extent at level k is
        # 2^(m-k) per dim
        stack = [(0, 0, 0, [0] * n)]
        budget_cap = (4 * max_ranges) if max_ranges > 0 else None
        while stack:
            level, state, h_pre, lo = stack.pop()
            half = 1 << (m - level)  # cell span of this node per dim
            hi = [lo[j] + half - 1 for j in range(n)]
            # disjoint?
            if any(hi[j] < mins[j] or lo[j] > maxs[j] for j in range(n)):
                continue
            h0 = h_pre << (n * (m - level))
            h1 = ((h_pre + 1) << (n * (m - level))) - 1
            contained = all(lo[j] >= mins[j] and hi[j] <= maxs[j] for j in range(n))
            node_cells = half**n
            if (
                contained
                or level == m
                or node_cells <= min_quad
                or (budget_cap is not None and len(ranges) >= budget_cap)
            ):
                ranges.append((h0, h1))
                continue
            # recurse children in reverse Hilbert order (stack -> ascending)
            quarter = half >> 1
            for w, l, s2 in reversed(self.child_cells(state)):
                child_lo = [lo[j] + (((l >> j) & 1) * quarter) for j in range(n)]
                stack.append((level + 1, s2, (h_pre << n) | w, child_lo))

        ranges.sort()
        return merge_ranges(ranges, max_ranges)


def merge_ranges(ranges: list[tuple[int, int]], max_ranges: int = -1) -> list[tuple[int, int]]:
    """Coalesce sorted inclusive ranges; then merge smallest gaps first until
    at most ``max_ranges`` remain (mirrors uzaygezen's join-smallest-gap)."""
    if not ranges:
        return []
    merged = [list(ranges[0])]
    for lo, hi in ranges[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if max_ranges > 0 and len(merged) > max_ranges:
        # repeatedly merge the pair with the smallest gap
        while len(merged) > max_ranges:
            gaps = [merged[i + 1][0] - merged[i][1] for i in range(len(merged) - 1)]
            k = int(np.argmin(gaps))
            merged[k][1] = merged[k + 1][1]
            del merged[k + 1]
    return [(lo, hi) for lo, hi in merged]


class CompactHilbertCurve:
    """Compact Hilbert curve with UNEQUAL bits per dimension.

    Generalizes ``HilbertCurve`` to per-dimension precisions (the reference
    gets this from uzaygezen ``CompactHilbertCurve`` for the SPATIAL
    (25,25,10) / TEMPORAL (10,10,40) spatial-temporal presets,
    SpatialTemporalDimensionalityTypeProvider.java:207-246).  Construction:
    at bit level i only dimensions with ``bits_j > i`` are active; a node's
    valid children are those whose orientation label has inactive bits 0,
    and the index packs each level's RANK among valid children (Hilbert
    w-order), so the total index is sum(bits) bits and bijective.  With
    equal bits every child is valid and rank == w, so this reduces EXACTLY
    to ``HilbertCurve`` (tested).  Index values for unequal bits are
    self-consistent rather than bit-identical to uzaygezen's CHI — the key
    layout (total bits, nested prefixes) matches.
    """

    def __init__(self, bits_list: list[int]):
        self.bits_list = [int(b) for b in bits_list]
        n = len(self.bits_list)
        if n < 2:
            raise ValueError("need >= 2 dimensions")
        self.n_dims = n
        self.m = max(self.bits_list)
        self.total_bits = sum(self.bits_list)
        if self.total_bits > 64:
            raise ValueError(f"total precision {self.total_bits} > 64 bits unsupported")
        self.w_table, self.l_table, self.next_state = HilbertCurve._tables(n)
        # per-level active-dimension masks (label-space, world frame)
        self.masks = [
            sum(1 << j for j, b in enumerate(self.bits_list) if b > i)
            for i in range(self.m)
        ]
        self.k_per_level = [bin(mu).count("1") for mu in self.masks]
        # rank/unrank tables per distinct mask: rank[s][w] and unrank[s][r]
        n_states = (1 << n) * n
        self._rank: dict[int, np.ndarray] = {}
        self._unrank: dict[int, np.ndarray] = {}
        for mu in set(self.masks):
            rank = np.full((n_states, 1 << n), -1, dtype=np.int8)
            unrank = np.full((n_states, 1 << n), -1, dtype=np.int8)
            inactive = ((1 << n) - 1) ^ mu
            for s in range(n_states):
                r = 0
                for w in range(1 << n):
                    l = int(self.l_table[(s << n) | w])
                    if l & inactive:
                        continue
                    rank[s, w] = r
                    unrank[s, r] = w
                    r += 1
            self._rank[mu] = rank
            self._unrank[mu] = unrank

    def encode(self, coords: list[np.ndarray]) -> np.ndarray:
        n = self.n_dims
        next_state = self.next_state[0]
        coords = [np.asarray(c, dtype=np.uint64) for c in coords]
        h = np.zeros(coords[0].shape, dtype=np.uint64)
        s = np.zeros(coords[0].shape, dtype=np.uint16)
        for i in range(self.m - 1, -1, -1):
            mu = self.masks[i]
            k = self.k_per_level[i]
            l = np.zeros(coords[0].shape, dtype=np.uint64)
            for j in range(n):
                if mu & (1 << j):
                    l |= ((coords[j] >> np.uint64(i)) & np.uint64(1)) << np.uint64(j)
            idx = (s.astype(np.uint32) << n) | l.astype(np.uint32)
            w = self.w_table[idx]
            r = self._rank[mu][s, w]
            h = (h << np.uint64(k)) | r.astype(np.uint64)
            s = next_state[idx]
        return h

    def decode(self, h: np.ndarray) -> list[np.ndarray]:
        n = self.n_dims
        next_state = self.next_state[1]
        h = np.asarray(h, dtype=np.uint64)
        coords = [np.zeros(h.shape, dtype=np.uint64) for _ in range(n)]
        s = np.zeros(h.shape, dtype=np.uint16)
        shift = self.total_bits
        for i in range(self.m - 1, -1, -1):
            mu = self.masks[i]
            k = self.k_per_level[i]
            shift -= k
            r = (h >> np.uint64(shift)) & np.uint64((1 << k) - 1)
            w = self._unrank[mu][s, r.astype(np.int64)].astype(np.uint64)
            idx = (s.astype(np.uint32) << n) | w.astype(np.uint32)
            l = self.l_table[idx].astype(np.uint64)
            for j in range(n):
                if mu & (1 << j):
                    coords[j] |= ((l >> np.uint64(j)) & np.uint64(1)) << np.uint64(i)
            s = next_state[idx]
        return coords

    # ---- range decomposition (planner side) ----

    def _extents(self, depth: int) -> list[int]:
        """Per-dim cell extent of a node at ``depth`` (root = 0)."""
        m = self.m
        return [1 << min(b, m - depth) for b in self.bits_list]

    def _rem_bits(self, depth: int) -> int:
        m = self.m
        return sum(min(b, m - depth) for b in self.bits_list)

    def decompose_range(
        self,
        mins: list[int],
        maxs: list[int],
        max_ranges: int = -1,
        unit_cell_size: int = 1 << 19,
    ) -> list[tuple[int, int]]:
        """Axis-aligned cell box (inclusive, per-dim resolutions) ->
        contiguous [lo, hi] compact-Hilbert index ranges; same min-quad +
        merge-smallest-gap policy as the equal-bit curve."""
        n, m = self.n_dims, self.m
        max_extent = max(maxs[j] - mins[j] + 1 for j in range(n))
        max_decomposed = max_extent**n
        min_quad = (
            1 if max_decomposed <= unit_cell_size else max_decomposed // unit_cell_size
        )
        ranges: list[tuple[int, int]] = []
        budget_cap = (4 * max_ranges) if max_ranges > 0 else None
        stack = [(0, 0, 0, [0] * n)]
        while stack:
            depth, state, h_pre, lo = stack.pop()
            ext = self._extents(depth)
            hi = [lo[j] + ext[j] - 1 for j in range(n)]
            if any(hi[j] < mins[j] or lo[j] > maxs[j] for j in range(n)):
                continue
            rem = self._rem_bits(depth)
            h0 = h_pre << rem
            h1 = ((h_pre + 1) << rem) - 1
            contained = all(
                lo[j] >= mins[j] and hi[j] <= maxs[j] for j in range(n)
            )
            node_cells = 1
            for e in ext:
                node_cells *= e
            if (
                contained
                or depth == m
                or node_cells <= min_quad
                or (budget_cap is not None and len(ranges) >= budget_cap)
            ):
                ranges.append((h0, h1))
                continue
            i = m - 1 - depth  # bit level the children consume
            mu = self.masks[i]
            k_i = self.k_per_level[i]
            child_ext = self._extents(depth + 1)
            inactive = ((1 << n) - 1) ^ mu
            children = []
            for w in range(1 << n):
                l = int(self.l_table[(state << n) | w])
                if l & inactive:
                    continue
                r = int(self._rank[mu][state, w])
                s2 = int(self.next_state[1][(state << n) | w])
                child_lo = [
                    lo[j] + (((l >> j) & 1) * child_ext[j] if mu & (1 << j) else 0)
                    for j in range(n)
                ]
                children.append((r, s2, child_lo))
            for r, s2, child_lo in reversed(children):
                stack.append((depth + 1, s2, (h_pre << k_i) | r, child_lo))
        ranges.sort()
        return merge_ranges(ranges, max_ranges)

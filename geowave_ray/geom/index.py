"""Bounding-box candidate index (uniform grid, CSR layout, pure NumPy).

Fills the role of JTS STRtree in the reference's join/refine stages
(``analytics/spark/.../TieredSpatialJoin.java:513-551`` does per-cell
all-pairs; our refiners do grid-bucketed candidate lookup instead): built
once per actor over the broadcast polygon layer, then queried with whole
point batches vectorized.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BBoxGrid"]


class BBoxGrid:
    """Uniform grid over N axis-aligned boxes; vectorized point->candidate
    and box->candidate lookups."""

    def __init__(self, boxes: np.ndarray, grid_size: int | None = None):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.boxes = boxes
        n = len(boxes)
        if grid_size is None:
            grid_size = int(np.clip(np.sqrt(max(n, 1)) * 2, 8, 1024))
        self.nx = self.ny = grid_size
        if n == 0:
            self.x0, self.y0, self.x1, self.y1 = 0.0, 0.0, 1.0, 1.0
        else:
            self.x0 = float(boxes[:, 0].min())
            self.y0 = float(boxes[:, 1].min())
            self.x1 = float(boxes[:, 2].max())
            self.y1 = float(boxes[:, 3].max())
        self.dx = (self.x1 - self.x0) / self.nx or 1.0
        self.dy = (self.y1 - self.y0) / self.ny or 1.0

        # assign each box to all covering grid cells
        cx0 = self._cell_x(boxes[:, 0]) if n else np.zeros(0, np.int64)
        cy0 = self._cell_y(boxes[:, 1]) if n else np.zeros(0, np.int64)
        cx1 = self._cell_x(boxes[:, 2]) if n else np.zeros(0, np.int64)
        cy1 = self._cell_y(boxes[:, 3]) if n else np.zeros(0, np.int64)
        spans = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        total = int(spans.sum())
        box_ids = np.repeat(np.arange(n, dtype=np.int64), spans)
        r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(spans) - spans, spans)
        wx = (cx1 - cx0 + 1)[box_ids]
        gx = cx0[box_ids] + r % wx
        gy = cy0[box_ids] + r // wx
        cell = gy * self.nx + gx
        order = np.argsort(cell, kind="stable")
        cell_sorted = cell[order]
        self._entries = box_ids[order]
        self._indptr = np.searchsorted(
            cell_sorted, np.arange(self.nx * self.ny + 1, dtype=np.int64)
        )

    def _cell_x(self, x: np.ndarray) -> np.ndarray:
        return np.clip(((np.asarray(x) - self.x0) / self.dx).astype(np.int64), 0, self.nx - 1)

    def _cell_y(self, y: np.ndarray) -> np.ndarray:
        return np.clip(((np.asarray(y) - self.y0) / self.dy).astype(np.int64), 0, self.ny - 1)

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (point_idx, box_idx) candidate pairs whose bbox contains the point."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        # points outside the grid envelope can't hit any box
        in_env = (xs >= self.x0) & (xs <= self.x1) & (ys >= self.y0) & (ys <= self.y1)
        idx = np.nonzero(in_env)[0]
        if len(idx) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        cell = self._cell_y(ys[idx]) * self.nx + self._cell_x(xs[idx])
        starts = self._indptr[cell]
        counts = self._indptr[cell + 1] - starts
        total = int(counts.sum())
        if total == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        rep = np.repeat(np.arange(len(idx)), counts)
        r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
        bi = self._entries[starts[rep] + r]
        pi = idx[rep]
        keep = (
            (xs[pi] >= self.boxes[bi, 0])
            & (xs[pi] <= self.boxes[bi, 2])
            & (ys[pi] >= self.boxes[bi, 1])
            & (ys[pi] <= self.boxes[bi, 3])
        )
        return pi[keep], bi[keep]

    def query_boxes(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (query_idx, box_idx) pairs whose bboxes overlap."""
        qboxes = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        out_q, out_b = [], []
        cx0 = self._cell_x(qboxes[:, 0])
        cy0 = self._cell_y(qboxes[:, 1])
        cx1 = self._cell_x(qboxes[:, 2])
        cy1 = self._cell_y(qboxes[:, 3])
        for i in range(len(qboxes)):
            cells = (
                np.arange(cy0[i], cy1[i] + 1)[:, None] * self.nx
                + np.arange(cx0[i], cx1[i] + 1)[None, :]
            ).ravel()
            ent = np.concatenate(
                [self._entries[self._indptr[c] : self._indptr[c + 1]] for c in cells]
            ) if len(cells) else np.zeros(0, np.int64)
            ent = np.unique(ent)
            if len(ent) == 0:
                continue
            b = self.boxes[ent]
            keep = (
                (b[:, 0] <= qboxes[i, 2])
                & (b[:, 2] >= qboxes[i, 0])
                & (b[:, 1] <= qboxes[i, 3])
                & (b[:, 3] >= qboxes[i, 1])
            )
            sel = ent[keep]
            out_q.append(np.full(len(sel), i, dtype=np.int64))
            out_b.append(sel)
        if not out_q:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return np.concatenate(out_q), np.concatenate(out_b)

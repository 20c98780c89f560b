"""IvfStore — durable inverted-file (IVF) layout for embedding ANN.

The in-memory `stages/ann.ivf_topk` filters the corpus per query run; this
store MATERIALIZES the same coarse partitioning the way GeoStore
materializes the tiered cell layout: centroids trained once at ingest
(bounded driver sample — the same rule ivf_topk uses), every vector
written under its ``ivf_list=<L>`` partition directory, centroids + config
persisted beside the data.  A query then reads ONLY its ``n_probe``
nearest list directories and exact-re-ranks — at 100 TB the scan cost is
``n_probe / n_lists`` of the corpus, enforced by directory pruning rather
than a per-run filter pass, and the layout is shared by every subsequent
query.  ``n_probe == n_lists`` is exact (every vector lands in exactly
one list), which is what the driver oracle checks.

Reference analog: GeoStore's range-pruned keyed layout (store.py) applied
to embedding space; no direct reference counterpart (the reference has no
vector index) — built per the round brief's similarity-search scale path.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .stages.ann import _normalize, _vec_matrix, brute_force_topk

__all__ = ["IvfStore"]


class IvfStore:
    def __init__(self, root: str, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.root = root
        self.id_col = id_col
        self.vec_col = vec_col

    # ---------------------------------------------------------- ingest
    def ingest(self, ds, n_lists: int = 16, kmeans_iters: int = 6,
               sample_rows: int = 2048, quantize: str | None = None) -> str:
        """Train coarse centroids on a bounded sample, assign every vector
        to its nearest list, write parquet partitioned by ``ivf_list``,
        persist centroids + manifest.

        ``quantize="int8"`` stores per-vector symmetric int8 quantization
        instead of the float embedding (4x smaller on disk and in every
        scan — the 100-TB lever).  q = trunc(v * 127 / max|v|) computed in
        float64 so the arithmetic is bit-reproducible (the driver oracle
        replays it in SQL); cosine over the reconstructed vector equals
        cosine over q itself (the positive per-vector scale cancels under
        normalization), so ranking needs no dequantization state."""
        import ray

        if os.path.exists(os.path.join(self.root, "_manifest.json")):
            raise ValueError(
                f"IvfStore root {self.root!r} already holds an ingested "
                "generation; re-training centroids over appended files "
                "would mix partitionings — use a fresh root"
            )
        sample = ds.limit(max(n_lists * 64, sample_rows)).to_pandas()
        vecs = _normalize(np.asarray(sample[self.vec_col].tolist(), dtype=np.float32))
        rng = np.random.default_rng(13)
        centroids = vecs[
            rng.choice(len(vecs), size=min(n_lists, len(vecs)), replace=False)
        ]
        for _ in range(kmeans_iters):
            sims = vecs @ centroids.T
            a = sims.argmax(axis=1)
            for c in range(len(centroids)):
                m = a == c
                if m.any():
                    centroids[c] = _normalize(vecs[m].mean(axis=0, keepdims=True))[0]

        cent_ref = ray.put(centroids)
        vec_col = self.vec_col

        if quantize not in (None, "int8"):
            raise NotImplementedError(f"IvfStore quantize={quantize!r}")
        id_col = self.id_col

        def assign(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            v64 = _vec_matrix(batch.column(vec_col), dtype=np.float64)
            v = _normalize(v64.astype(np.float32))
            lists = (v @ cents.T).argmax(axis=1).astype(np.int64)
            if quantize == "int8":
                # float64 end to end: trunc boundaries reproduce exactly
                # in any IEEE-double replay (the SQL oracle's)
                maxabs = np.maximum(np.abs(v64).max(axis=1, keepdims=True), 1e-30)
                q = np.trunc(v64 * 127.0 / maxabs).astype(np.int8)
                d = q.shape[1]
                qcol = pa.FixedSizeListArray.from_arrays(
                    pa.array(q.ravel(), type=pa.int8()), d
                )
                return pa.table(
                    {
                        id_col: batch.column(id_col),
                        "qvec": qcol,
                        "ivf_list": pa.array(lists),
                    }
                )
            return batch.append_column("ivf_list", pa.array(lists))

        assign.__name__ = "ivf_assign"
        os.makedirs(self.root, exist_ok=True)
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            self.root, partition_cols=["ivf_list"]
        )
        np.save(os.path.join(self.root, "_centroids.npy"), centroids)
        with open(os.path.join(self.root, "_manifest.json"), "w") as f:
            json.dump(
                {"n_lists": int(len(centroids)), "id_col": self.id_col,
                 "vec_col": self.vec_col, "quantize": quantize}, f,
            )
        return self.root

    def _manifest(self) -> dict:
        with open(os.path.join(self.root, "_manifest.json")) as f:
            return json.load(f)

    def centroids(self) -> np.ndarray:
        return np.load(os.path.join(self.root, "_centroids.npy"))

    def list_dirs(self, lists) -> list[str]:
        out = []
        for li in lists:
            d = os.path.join(self.root, f"ivf_list={int(li)}")
            if os.path.isdir(d):
                out.append(d)
        return sorted(out)

    # ----------------------------------------------------------- query
    def query(self, queries: dict, k: int, n_probe: int = 4):
        """queries: {"query_id": [...], "vecs": (q, d)} -> Dataset of
        (query_id, id, cosine, rank).  Reads ONLY the union of each
        query's ``n_probe`` nearest list directories."""
        import ray

        cents = self.centroids()
        qv = _normalize(np.asarray(queries["vecs"], dtype=np.float32))
        n_probe = min(n_probe, len(cents))
        probe = np.argsort(-(qv @ cents.T), axis=1)[:, :n_probe]
        dirs = self.list_dirs(np.unique(probe.ravel()))
        files = []
        for d in dirs:
            for base, _, names in os.walk(d):
                files.extend(
                    os.path.join(base, n) for n in names if n.endswith(".parquet")
                )
        if not files:
            # typed empty result matching brute_force_topk's output
            # contract (id type defaults to int64 with no data to consult)
            return ray.data.from_arrow(
                pa.schema(
                    [("query_id", pa.string()), (self.id_col, pa.int64()),
                     ("cosine", pa.float64()), ("rank", pa.int64())]
                ).empty_table()
            )
        quantized = self._manifest().get("quantize") == "int8"
        vec_col = "qvec" if quantized else self.vec_col
        ds = ray.data.read_parquet(sorted(files), columns=[self.id_col, vec_col])
        # int8 store: cosine over the integer vector IS cosine over the
        # reconstructed vector (per-vector scale cancels) — _vec_matrix
        # widens the int8 list to float64 inside the top-k kernel
        return brute_force_topk(
            ds, queries, k, id_col=self.id_col, vec_col=vec_col
        )

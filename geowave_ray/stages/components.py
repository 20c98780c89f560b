"""Distributed connected components by ITERATED STAR CONTRACTION — the
scale path for DBSCAN cluster merging and LSH duplicate-group assembly.

State is a (node, peer) star-edge Dataset (member -> fragment root, plus
the reverse direction).  Key invariant that makes a join-free loop
possible: every row for a given ``node`` value lands in the same hash
bucket, so a per-bucket LOCAL union-find merges *every* pair of star
fragments that share a node — the information a hash-to-min label join
would propagate is already co-located.  Each round is therefore ONE
shuffle (``groupby(bucket).map_groups``) instead of the two (groupby.min
+ hash join) a label-propagation round costs, the working set never
grows (output is exactly the star edges over the bucket's nodes), and no
dedupe pass is ever needed.  Roots shrink monotonically toward the
component min; the sum-of-peer signature is stable iff no bucket merged
anything, i.e. no two fragments share a node, i.e. converged.

Round bound: star diameter roughly halves per round (cf. Rastogi et al.
2013 hash-to-min / star-contraction analysis) -> O(log n) rounds.

Reference analog: the cluster-union iteration of
analytics/mapreduce/.../dbscan/DBScanMapReduce.java (iterative NN union).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["connected_components_min_label"]


def _star(a: np.ndarray, b: np.ndarray):
    """Local union-find over edge arrays -> (nodes, root_per_node), root =
    min node id of the local component.  Nodes come out of ``np.unique``
    sorted, so index order == value order and union-by-smaller-index
    keeps the root at the component min."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ia.tolist(), ib.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.fromiter(
        (find(i) for i in range(len(nodes))), dtype=np.int64, count=len(nodes)
    )
    return nodes, nodes[roots]


def _star_table(a: np.ndarray, b: np.ndarray) -> pa.Table:
    nodes, rootvals = _star(a, b)
    return pa.table(
        {
            "node": pa.array(np.concatenate([nodes, rootvals])),
            "peer": pa.array(np.concatenate([rootvals, nodes])),
        }
    )


def connected_components_min_label(
    edges_ds,
    a_col: str = "e_a",
    b_col: str = "e_b",
    rounds: int | None = None,
    n_hint: int | None = None,
    num_partitions: int = 16,
    driver_cap: int = 1_000_000,
):
    """Undirected int64 edge Dataset -> (node, label) Dataset, label = min
    node id of the component.  ``rounds`` caps the iteration (default
    ceil(log2(n)) + 3); the sum-of-roots signature stops the loop as soon
    as a round merges nothing (exact convergence test — see module doc).

    ``driver_cap``: the distributed seed contraction first collapses each
    block to its local stars, shrinking the pair set to O(distinct nodes
    per block).  When THAT contracted set fits under the cap (~16 bytes a
    row), one exact driver union-find finishes the job instead of
    O(log n) shuffle rounds — each round otherwise costs a full
    groupby + materialize + signature scan for a graph that is only a
    few MB.  Above the cap the iterated star contraction runs unchanged
    (the 100 TB path: label tables proportional to the corpus never land
    on the driver)."""

    def seed(batch: pa.Table) -> pa.Table:
        """LOCAL CONTRACTION: union-find over just this batch's edges
        collapses each batch-local component to a star before any
        shuffle; pair count drops from O(edges) to O(distinct nodes)."""
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            i64 = pa.int64()
            return pa.table({"node": pa.array([], i64), "peer": pa.array([], i64)})
        return _star_table(a, b)

    seed.__name__ = "cc_seed_contract"
    pairs = edges_ds.map_batches(seed, batch_format="pyarrow")

    if driver_cap:
        import ray

        from .util import collect_table

        pairs = pairs.materialize()
        if pairs.count() <= driver_cap:
            tbl = collect_table(pairs)
            if tbl is None:
                i64 = pa.int64()
                return ray.data.from_arrow(
                    pa.table({"node": pa.array([], i64), "label": pa.array([], i64)})
                )
            nodes, roots = _star(
                tbl.column("node").to_numpy(zero_copy_only=False),
                tbl.column("peer").to_numpy(zero_copy_only=False),
            )
            # _star roots are already component minima (union by min id)
            return ray.data.from_arrow(
                pa.table({"node": pa.array(nodes), "label": pa.array(roots)})
            )

    def add_bucket(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        # multiplicative (Fibonacci) hash in uint64 so sequential ids spread
        h = (node.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    add_bucket.__name__ = "cc_bucket"

    def contract(group: pa.Table) -> pa.Table:
        a = group.column("node").to_numpy(zero_copy_only=False)
        b = group.column("peer").to_numpy(zero_copy_only=False)
        return _star_table(a, b)

    contract.__name__ = "cc_bucket_contract"

    if rounds is None:
        n = n_hint if n_hint is not None else max(edges_ds.count(), 2)
        rounds = int(np.ceil(np.log2(max(n, 2)))) + 3

    prev_sig = None
    for _ in range(rounds):
        pairs = (
            pairs.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(contract, batch_format="pyarrow")
            .materialize()
        )
        sig_raw = pairs.sum("peer")
        if sig_raw is None:  # empty edge set
            break
        if int(sig_raw) == prev_sig:
            break
        prev_sig = int(sig_raw)

    def combine_block(batch: pa.Table) -> pa.Table:
        """Pre-aggregate before the final label shuffle: per-block min(peer)
        per node (a node's rows can span blocks — roots surface in every
        bucket holding one of their fragments — so this is a COMBINER, not
        the final answer)."""
        node = batch.column("node").to_numpy(zero_copy_only=False)
        peer = batch.column("peer").to_numpy(zero_copy_only=False)
        if len(node) == 0:
            return batch
        order = np.argsort(node, kind="stable")
        ns, ps = node[order], peer[order]
        new = np.ones(len(ns), dtype=bool)
        new[1:] = ns[1:] != ns[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "node": pa.array(ns[starts]),
                "peer": pa.array(np.minimum.reduceat(ps, starts)),
            }
        )

    combine_block.__name__ = "cc_label_combine"

    def label_min(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        m = batch.column("min(peer)").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(node), "label": pa.array(np.minimum(node, m))}
        )

    label_min.__name__ = "cc_label_min"
    return (
        pairs.map_batches(combine_block, batch_format="pyarrow")
        .groupby("node")
        .min("peer")
        .map_batches(label_min, batch_format="pyarrow")
    )

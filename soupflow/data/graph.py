"""Distributed iterative graph computation: integer-exact PageRank.

The iterative-algorithm class (rank propagation over a link graph) is
usually un-oracle-able because float summation order varies across
partitions. This implementation is FIXED-POINT INTEGER end to end —
rank updates are ``BASE + Σ (DAMP_NUM * r_u) // (DAMP_DEN * outdeg_u)``
with integer floor division per edge — so partial sums commute and the
result is bit-identical regardless of partitioning, block order, or
cluster size, and a DuckDB recursive CTE reproduces it exactly.

Scale shape per iteration: ONE partitioned hash join (current ranks
onto the edge list by source) + ONE groupby-sum by target + a map-side
base add — the components-label-propagation shuffle pattern
(data/dedup._components_labels_partitioned). The edge list is built
map-side and materialized once; ranks are two int64 columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1_000_000          # fixed-point: rank 1.0 == 1_000_000
DAMP_NUM, DAMP_DEN = 85, 100
BASE = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN   # 0.15 * SCALE


def synthetic_edges(ds, *, id_col: str = "doc_id", n_nodes: int):
    """Deterministic 3-out-link graph over [0, n_nodes): doc d links
    to (7d+1) % N, (13d+2) % N, (19d+3) % N — duplicates and
    self-loops dropped. Emits (src, dst, outdeg) narrow rows."""
    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tgt = np.stack([(7 * d + 1) % n_nodes,
                        (13 * d + 2) % n_nodes,
                        (19 * d + 3) % n_nodes], axis=1)
        src = np.repeat(d, 3)
        dst = tgt.reshape(-1)
        keep = src != dst
        # drop duplicate (src, dst) pairs — np.unique on the packed key
        packed = src[keep] * np.int64(n_nodes) + dst[keep]
        uniq = np.unique(packed)
        src_u = uniq // n_nodes
        dst_u = uniq % n_nodes
        # per-source outdegree: every edge of a doc is emitted in the
        # same batch (all derive from the doc's own row), so the
        # batch-local count is the global outdegree
        if src_u.size:
            uq, cnt = np.unique(src_u, return_counts=True)
            outdeg = cnt[np.searchsorted(uq, src_u)]
        else:
            outdeg = np.array([], dtype=np.int64)
        return pa.table({
            "src": pa.array(src_u, pa.int64()),
            "dst": pa.array(dst_u, pa.int64()),
            "outdeg": pa.array(outdeg.astype(np.int64), pa.int64()),
        })
    edges.__name__ = "synthetic_edges"
    return ds.select_columns([id_col]).map_batches(
        edges, batch_format="pyarrow")


def pagerank(ds, *, id_col: str = "doc_id", n_iters: int = 5,
             num_partitions: int = 8):
    """→ (doc_id, rank_i) after ``n_iters`` integer-exact PageRank
    rounds over the synthetic 3-out-link graph. rank_i is the
    fixed-point int64 rank (SCALE = 1e6)."""
    import ray
    from ray.data.aggregate import Sum

    n_nodes = ds.count()
    nodes = ds.select_columns([id_col]).materialize()
    # edge list with outdegree, built map-side, materialized once
    edges = synthetic_edges(nodes, id_col=id_col, n_nodes=n_nodes) \
        .repartition(num_partitions).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        return pa.table({
            "node": ids,
            "r": pa.array(np.full(len(batch), SCALE, dtype=np.int64),
                          pa.int64())})
    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    for _ in range(n_iters):
        contrib_rows = edges.join(
            ranks, join_type="inner",
            num_partitions=num_partitions,
            on=("src",), right_on=("node",))

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("r").to_numpy(zero_copy_only=False)
            deg = batch.column("outdeg") \
                .to_numpy(zero_copy_only=False)
            c = (DAMP_NUM * r) // (DAMP_DEN * deg)
            t = pa.table({"node": batch.column("dst"),
                          "c": pa.array(c, pa.int64())})
            # in-batch pre-combine before the shuffle
            g = t.group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])
        contrib.__name__ = "pagerank_contrib"

        summed = contrib_rows.map_batches(
            contrib, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("c", alias_name="c"))

        # nodes with no in-links keep BASE: left join via broadcast of
        # nothing — express as union of (all nodes at BASE) and the
        # summed contributions, folded by one groupby-sum
        def base_rows(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            return pa.table({
                "node": ids,
                "c": pa.array(np.full(len(batch), BASE,
                                      dtype=np.int64), pa.int64())})

        ranks = nodes.map_batches(base_rows, batch_format="pyarrow") \
            .union(summed) \
            .groupby("node").aggregate(Sum("c", alias_name="r")) \
            .repartition(num_partitions).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column("node"),
            "rank_i": batch.column("r")})
    return ranks.map_batches(finish, batch_format="pyarrow")

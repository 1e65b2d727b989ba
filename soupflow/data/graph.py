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


def _run_pairs(keys: np.ndarray):
    """All (i < j) index pairs within each key run of sorted ``keys``
    — the segment-arange gather of term_cooccurrence, zero per-key
    Python. Returns (i_idx, j_idx) into keys."""
    if keys.size == 0:
        e = np.empty(0, np.int64)
        return e, e
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change)).astype(np.int64)
    cnt = np.diff(np.append(starts, keys.size))
    seg_end = np.repeat(starts + cnt, cnt)
    pos = np.arange(keys.size, dtype=np.int64)
    rep = seg_end - pos - 1
    i_idx = np.repeat(pos, rep)
    s2 = np.concatenate(([0], np.cumsum(rep)[:-1])) if rep.size \
        else np.empty(0, np.int64)
    off = np.arange(int(rep.sum()), dtype=np.int64) \
        - np.repeat(s2, rep)
    j_idx = i_idx + 1 + off
    return i_idx, j_idx


def _dedup_sorted(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of first occurrences in a stream sorted by
    (key, val) — duplicates are adjacent by construction."""
    if keys.size == 0:
        return np.empty(0, bool)
    keep = np.empty(keys.size, dtype=bool)
    keep[0] = True
    keep[1:] = (keys[1:] != keys[:-1]) | (vals[1:] != vals[:-1])
    return keep


def distinct_pairs_per_key(ds, *, key_col: str, val_col: str,
                           num_partitions: int = 16,
                           max_run: int = 65536):
    """For every key, all unordered pairs (a < b) of its DISTINCT
    values — the grouped self-join primitive (bucket co-membership
    edges, wedge/path-2 enumeration) computed without any join.

    Scale shape: ONE global sort on (key, val) makes keys globally
    contiguous and duplicates adjacent; the sorted narrow stream
    materializes once and feeds three zero-shuffle maps over the SAME
    blocks: (1) interior key runs — complete by contiguity — dedup and
    emit their pairs with one segment-arange gather; (2) the same
    blocks re-emit their deduped (key, val) rows minus edge runs (the
    exact distinct stream, for callers that join against it); (3) each
    block's ≤ 2 edge runs (first/last key) collect driver-side —
    O(blocks × run bound) narrow rows — where the identical vectorized
    kernel finishes the boundary-spanning keys. Per-key fan-out is
    quadratic in run length by definition, so runs above ``max_run``
    raise loudly (degree-capped orientation is the documented hatch
    for heavier-tailed graphs).

    Returns (pairs_ds, distinct_ds): pairs rows (key, a, b); distinct
    rows (key, val) globally deduped. Values must sort ascending
    within a key for the a < b cut — guaranteed by the sort itself.
    """
    import ray

    from ..io import collect_table

    sorted_ds = ds.select_columns([key_col, val_col]) \
        .repartition(num_partitions) \
        .sort([key_col, val_col]) \
        .materialize()
    if sorted_ds.count() == 0:
        # Ray 2.49 emits SCHEMA-LESS blocks from an empty sort —
        # downstream column access would KeyError. Canonical empty
        # results (int64 — every in-repo caller's key/val type).
        e = pa.array([], pa.int64())
        return (ray.data.from_arrow(
                    pa.table({key_col: e, "a": e, "b": e})),
                ray.data.from_arrow(
                    pa.table({key_col: e, val_col: e})))

    def _arrs(batch: pa.Table):
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        v = batch.column(val_col).to_numpy(zero_copy_only=False)
        keep = _dedup_sorted(k, v)
        return k[keep], v[keep]

    def _interior_bounds(k: np.ndarray):
        """[lo, hi) slice of rows in interior (non-edge) runs."""
        if k.size == 0:
            return 0, 0
        first, last = k[0], k[-1]
        lo = int(np.searchsorted(k, first, side="right"))
        hi = int(np.searchsorted(k, last, side="left"))
        return lo, max(hi, lo)

    def interior_pairs(batch: pa.Table) -> pa.Table:
        k, v = _arrs(batch)
        lo, hi = _interior_bounds(k)
        ki, vi = k[lo:hi], v[lo:hi]
        if ki.size:
            _, cnt = np.unique(ki, return_counts=True)
            if cnt.max() > max_run:
                raise ValueError(
                    f"distinct_pairs_per_key: key run of {cnt.max()} "
                    f"exceeds max_run={max_run} — quadratic pair "
                    "fan-out guard")
        i_idx, j_idx = _run_pairs(ki)
        return pa.table({
            key_col: pa.array(ki[i_idx]),
            "a": pa.array(vi[i_idx]),
            "b": pa.array(vi[j_idx])})
    interior_pairs.__name__ = "distinct_pairs_interior"

    def interior_distinct(batch: pa.Table) -> pa.Table:
        k, v = _arrs(batch)
        lo, hi = _interior_bounds(k)
        return pa.table({key_col: pa.array(k[lo:hi]),
                         val_col: pa.array(v[lo:hi])})
    interior_distinct.__name__ = "distinct_pairs_interior_distinct"

    def edge_rows(batch: pa.Table) -> pa.Table:
        k, v = _arrs(batch)
        lo, hi = _interior_bounds(k)
        # fail in the WORKER, pre-collect: an edge-run PIECE longer
        # than max_run already proves the global run oversized —
        # without this, a dominant key ships its whole distinct set
        # to the driver before the post-collect guard fires. With
        # it, driver materialization is bounded by the documented
        # O(blocks × max_run).
        if max(lo, k.size - hi) > max_run:
            raise ValueError(
                f"distinct_pairs_per_key: boundary key run piece of "
                f"{max(lo, k.size - hi)} exceeds max_run={max_run} "
                "— quadratic pair fan-out guard (pre-collect)")
        keep = np.zeros(k.size, dtype=bool)
        keep[:lo] = True
        keep[hi:] = True
        return pa.table({key_col: pa.array(k[keep]),
                         val_col: pa.array(v[keep])})
    edge_rows.__name__ = "distinct_pairs_edge_rows"

    side = collect_table(sorted_ds.map_batches(
        edge_rows, batch_format="pyarrow", batch_size=None))
    sk = side.column(key_col).to_numpy(zero_copy_only=False)
    sv = side.column(val_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((sv, sk))
    sk, sv = sk[order], sv[order]
    keep = _dedup_sorted(sk, sv)
    sk, sv = sk[keep], sv[keep]
    if sk.size:
        _, cnt = np.unique(sk, return_counts=True)
        if cnt.max() > max_run:
            raise ValueError(
                f"distinct_pairs_per_key: boundary key run of "
                f"{cnt.max()} exceeds max_run={max_run}")
    i_idx, j_idx = _run_pairs(sk)
    fix_pairs = pa.table({key_col: pa.array(sk[i_idx]),
                          "a": pa.array(sv[i_idx]),
                          "b": pa.array(sv[j_idx])})
    fix_distinct = pa.table({key_col: pa.array(sk),
                             val_col: pa.array(sv)})

    pairs = sorted_ds.map_batches(
        interior_pairs, batch_format="pyarrow", batch_size=None)
    distinct = sorted_ds.map_batches(
        interior_distinct, batch_format="pyarrow", batch_size=None)
    if fix_pairs.num_rows:
        pairs = pairs.union(ray.data.from_arrow(fix_pairs))
    if fix_distinct.num_rows:
        distinct = distinct.union(ray.data.from_arrow(fix_distinct))
    return pairs, distinct


def triangle_counts(edge_ds, *, src_col: str = "a",
                    dst_col: str = "b",
                    num_partitions: int = 16,
                    max_degree: int = 65536):
    """Per-vertex triangle participation counts over an undirected
    edge stream (src < dst per row; cross-source duplicates allowed)
    — the clustering-coefficient / community-structure pass, whose
    SQL form is a cubic triple self-join.

    Id-oriented node-iterator shape: ONE sort-pass of
    distinct_pairs_per_key over (src → dst) simultaneously yields the
    globally DISTINCT edge set (adjacent-duplicate drop, free in the
    same sort) and every wedge (v, w) centered at each edge's lower
    endpoint u — each triangle u < v < w is generated exactly once,
    at u. ONE partitioned hash join probes wedges against the
    distinct edges on (v, w); matches are triangles carrying all
    three vertices, which collapse map-side to per-block (vertex,
    count) partials before the final vertex-bounded groupby. Wedge
    fan-out is quadratic in id-oriented out-degree — bounded here by
    co-membership structure, with ``max_degree`` failing loudly and
    degree-based orientation (lowest-degree vertex generates) the
    documented hatch for skewed graphs."""
    from ray.data.aggregate import Sum

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({"x": batch.column(src_col),
                         "y": batch.column(dst_col)})
    norm.__name__ = "triangle_edge_norm"

    wedges, edges = distinct_pairs_per_key(
        edge_ds.select_columns([src_col, dst_col])
        .map_batches(norm, batch_format="pyarrow"),
        key_col="x", val_col="y",
        num_partitions=num_partitions, max_run=max_degree)
    wedges = wedges.materialize()
    if wedges.count() == 0:
        # no wedges ⇒ no triangles; also sidesteps Arrow's hash join
        # failing on an empty build side
        import ray
        e = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table({"v": e, "n_tri": e}))

    def ename(batch: pa.Table) -> pa.Table:
        return pa.table({"ea": batch.column("x"),
                         "eb": batch.column("y")})
    ename.__name__ = "triangle_edge_rename"

    # repartition BOTH sides: Ray 2.49's hash join fails with
    # "No match ... for key field reference" if any input BLOCK is
    # zero-row (typed-empty interior blocks are normal at small
    # scale); repartition coalesces them away
    closed = wedges.repartition(num_partitions).join(
        edges.map_batches(ename, batch_format="pyarrow")
        .repartition(num_partitions),
        join_type="inner", num_partitions=num_partitions,
        on=("a", "b"), right_on=("ea", "eb"))

    def vertex_partial(batch: pa.Table) -> pa.Table:
        u = batch.column("x").to_numpy(zero_copy_only=False)
        v = batch.column("a").to_numpy(zero_copy_only=False)
        w = batch.column("b").to_numpy(zero_copy_only=False)
        allv = np.concatenate([u, v, w])
        ks, cnts = np.unique(allv, return_counts=True)
        return pa.table({"v": pa.array(ks),
                         "n_tri": pa.array(cnts.astype(np.int64),
                                           pa.int64())})
    vertex_partial.__name__ = "triangle_vertex_partial"

    return closed.map_batches(vertex_partial,
                              batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("n_tri", alias_name="n_tri"))

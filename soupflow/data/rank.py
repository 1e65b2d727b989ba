"""Order-statistics operators that avoid global sorts.

grouped_topk: top-k rows per key. A full ``sort(key, -order)`` would
shuffle the whole corpus; instead every block keeps at most k rows per
key it sees (vectorized lexsort + run-leading-rows mask), so the ONE
groupby that follows moves ≤ k·num_blocks tiny rows per key, and the
final per-group merge is over those partials only.

quantiles: exact quantiles of an integer-ish column via a distributed
value histogram — per-batch ``np.unique`` partials, ONE groupby(value)
sum over ≤ |domain| narrow rows, then a driver-side cumsum over the
(bounded) distinct-value table. For unbounded/continuous domains,
pre-bin the column first (``floor(x / width)``); the histogram shape
is unchanged. No global sort, no corpus materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..io import collect_rows, collect_table


def _topk_mask(keys: np.ndarray, order: np.ndarray,
               tie: np.ndarray, k: int) -> np.ndarray:
    """Row indices (into the original arrays) of the top-k rows per
    key by (order desc, tie asc) — one lexsort, no Python loop."""
    perm = np.lexsort((tie, -order, keys))
    sk = keys[perm]
    starts = np.nonzero(np.r_[True, sk[1:] != sk[:-1]])[0]
    run_id = np.cumsum(np.r_[True, sk[1:] != sk[:-1]]) - 1
    pos_in_run = np.arange(sk.size) - starts[run_id]
    return perm[pos_in_run < k]


def grouped_topk(ds, key: str, order_col: str, k: int, tie: str,
                 k_by_key: dict | None = None):
    """→ input columns filtered to the k rows per ``key`` maximizing
    (order_col, then min ``tie``). Requires string ``key``,
    integer-orderable ``order_col``/``tie``.

    ``k_by_key``: optional per-key quota overriding ``k`` (keys absent
    from the dict keep 0 rows). The block-local partial prunes with
    max(quota) so every key's final cut still sees its full top
    candidates; the dict rides the task closure — keep it small
    (per-source quotas, not per-document state)."""
    kmax = (max(k_by_key.values(), default=0)
            if k_by_key is not None else k)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or kmax == 0:
            return batch.slice(0, 0)
        keys = np.unique(
            np.asarray(batch.column(key).to_pylist(), dtype=object),
            return_inverse=True)[1]
        order = batch.column(order_col).to_numpy(zero_copy_only=False)
        tiev = batch.column(tie).to_numpy(zero_copy_only=False)
        idx = _topk_mask(keys, order, tiev, kmax)
        return batch.take(pa.array(np.sort(idx)))
    partial.__name__ = f"topk{kmax}_partial"

    def final(group: pd.DataFrame) -> pd.DataFrame:
        kk = (k_by_key.get(group[key].iloc[0], 0)
              if k_by_key is not None else k)
        g = group.sort_values([order_col, tie],
                              ascending=[False, True]).head(kk)
        return g.reset_index(drop=True)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).map_groups(final, batch_format="pandas")


def quantiles(ds, col: str, q_pcts: tuple[int, ...]):
    """→ pandas DataFrame (q_pct, value): for each integer percent q,
    the smallest v with rank(v) ≥ ceil(q·N/100) — integer arithmetic
    end to end, so any engine reproduces it bit-exactly."""
    from ray.data.aggregate import Sum

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        vals, counts = np.unique(v, return_counts=True)
        return pa.table({
            "v": pa.array(vals.astype(np.int64), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })
    hist.__name__ = f"hist_{col}"

    rows = collect_rows(          # ≤ |distinct values| — bounded
        ds.select_columns([col])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n")))
    vs = np.array([r["v"] for r in rows], dtype=np.int64)
    ns = np.array([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(vs)
    vs, cum = vs[order], np.cumsum(ns[order])
    total = int(cum[-1]) if cum.size else 0
    out = []
    for q in q_pcts:
        rank = (q * total + 99) // 100
        pos = int(np.searchsorted(cum, rank))
        out.append((q, int(vs[min(pos, vs.size - 1)])))
    return pd.DataFrame(out, columns=["q_pct", "value"])


def quantile_band_filter(ds, col: str, lo_pct: int = 10,
                         hi_pct: int = 90):
    """Keep rows whose ``col`` lies inside the exact [lo_pct, hi_pct]
    percentile band — the corpus-level outlier trim of a quality
    pipeline (drop the shortest/longest documents by GLOBAL rank, not
    per-batch heuristics).

    Composition shape: one ``quantiles`` pass (distributed value
    histogram, no sort) yields two integer thresholds; the filter is
    then pure map-side — the corpus streams through once more with
    zero shuffle. At 100 TB the histogram stays |distinct values|
    narrow rows; pre-bin continuous columns first (see quantiles)."""
    qs = quantiles(ds, col, (lo_pct, hi_pct))
    lo = int(qs.value.iloc[0])
    hi = int(qs.value.iloc[1])

    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((v >= lo) & (v <= hi)))
    keep.__name__ = f"band_{col}_{lo_pct}_{hi_pct}"

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_quantiles(ds, key: str, col: str,
                      q_pcts: tuple[int, ...]):
    """Exact per-key quantiles → pandas DataFrame (key, q_pct, value):
    for each key and integer percent q, the smallest v with
    rank(v) ≥ ceil(q·N_key/100) — the same integer-rank rule as
    ``quantiles``, per stratum (per-language/per-source length
    percentiles for tier filtering).

    Scale shape: per-batch (key, value) np.unique partials collapse
    each block to its distinct pairs, ONE groupby((key, v)) sums the
    narrow histogram, and the driver does a cumsum per key over the
    ≤ |keys × distinct values| collected rows — bounded by value
    domain, not corpus size (pre-bin continuous columns)."""
    from ray.data.aggregate import Sum

    from ..io import collect_table

    def hist(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch.column(key).to_pylist(), dtype=object)
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uk, codes = np.unique(ks, return_inverse=True)
        # collapse to distinct (key, v) pairs with counts: one lexsort
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        newgrp = np.r_[True, (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])]
        starts = np.flatnonzero(newgrp)
        counts = np.diff(np.append(starts, cs.size))
        return pa.table({
            key: pa.array(uk[cs[starts]], pa.string()),
            "v": pa.array(vs[starts], pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })
    hist.__name__ = f"hist_{key}_{col}"

    t = collect_table(
        ds.select_columns([key, col])
        .map_batches(hist, batch_format="pyarrow")
        .groupby([key, "v"]).aggregate(Sum("n", alias_name="n")))
    out = []
    if t.num_columns:
        ks = np.asarray(t.column(key).to_pylist(), dtype=object)
        vs = t.column("v").to_numpy(zero_copy_only=False)
        ns = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((vs, ks))
        ks, vs, ns = ks[order], vs[order], ns[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        bounds = np.append(starts, ks.size)
        for i, s in enumerate(starts):
            e = bounds[i + 1]
            cum = np.cumsum(ns[s:e])
            total = int(cum[-1])
            for q in q_pcts:
                rank = (q * total + 99) // 100
                pos = int(np.searchsorted(cum, rank))
                out.append((ks[s], q,
                            int(vs[s:e][min(pos, e - s - 1)])))
    return pd.DataFrame(out, columns=[key, "q_pct", "value"])


def grouped_topk_rows(ds, *, key_col: str, order_col: str,
                      tie_col: str, k: int,
                      descending: bool = True,
                      num_partitions: int = 16):
    """Per-key top-k ROW selection over FACT-SCALE group counts — the
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY v [DESC], tie)
    <= k`` class with unboundedly many keys, where a
    groupby.map_groups would put one hot key's whole row set in one
    task. Returns the selected rows (all input columns).

    Scale shape: ONE global sort on (key, order [desc], tie) makes
    keys contiguous and each key's rows rank-ordered; interior runs
    (complete keys by contiguity) emit their first k rows in-block,
    zero further movement. Edge runs never ship whole: a key's global
    top-k is the top-k of the union of its per-piece top-ks (each
    piece is itself sorted), so each block contributes ≤ 2·k
    candidate rows and the driver finishes an O(blocks · k) table
    with the same cut — hot keys cost k rows per block they touch,
    never their row count. Tie contract: (key, order, tie) unique —
    duplicates meeting the driver cut raise loudly (the in-block cut
    would be silently arbitrary only across exact duplicate rows)."""
    import ray

    from ..io import collect_table

    sorted_ds = ds.repartition(num_partitions) \
        .sort([key_col, order_col, tie_col],
              descending=[False, descending, False]) \
        .materialize()

    def _runs(batch: pa.Table):
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        if keys.size == 0:
            return keys, np.empty(0, np.int64), 0, 0
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate(([0], change)).astype(np.int64)
        lo = int(starts[1]) if starts.size > 1 else keys.size
        hi = int(starts[-1]) if starts.size > 1 else 0
        return keys, starts, lo, hi

    def interior_topk(batch: pa.Table) -> pa.Table:
        keys, starts, lo, hi = _runs(batch)
        if keys.size == 0:
            return batch
        inner_mask = (starts >= lo) & (starts < hi)
        inner = starts[inner_mask]
        ends = np.append(starts, keys.size)[1:][inner_mask]
        cnts = np.minimum(k, ends - inner)
        offs = np.concatenate(([0], np.cumsum(cnts)[:-1])) \
            if cnts.size else np.empty(0, np.int64)
        take = (np.repeat(inner, cnts)
                + np.arange(int(cnts.sum()), dtype=np.int64)
                - np.repeat(offs, cnts))
        return batch.take(pa.array(take, pa.int64()))
    interior_topk.__name__ = f"topk_rows_interior_{k}"

    def edge_topk(batch: pa.Table) -> pa.Table:
        keys, starts, lo, hi = _runs(batch)
        if keys.size == 0:
            return batch
        take = np.concatenate([
            np.arange(0, min(k, lo)),
            np.arange(hi, min(hi + k, keys.size))])
        take = np.unique(take)
        return batch.take(pa.array(take, pa.int64()))
    edge_topk.__name__ = f"topk_rows_edge_{k}"

    side = collect_table(sorted_ds.map_batches(
        edge_topk, batch_format="pyarrow", batch_size=None))
    fix = pa.table({c: pa.array([], side.schema.field(c).type)
                    for c in side.schema.names})
    if side.num_rows:
        sk = side.column(key_col).to_numpy(zero_copy_only=False)
        ov = side.column(order_col).to_numpy(zero_copy_only=False)
        tv = side.column(tie_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tv, -ov if descending else ov, sk))
        sk2, ov2, tv2 = sk[order], ov[order], tv[order]
        dup = (sk2[1:] == sk2[:-1]) & (ov2[1:] == ov2[:-1]) \
            & (tv2[1:] == tv2[:-1])
        if dup.any():
            raise ValueError(
                "grouped_topk_rows requires (key, order, tie) "
                "unique — duplicate tuple at the top-k cut makes "
                "the selection nondeterministic")
        change = np.r_[True, sk2[1:] != sk2[:-1]]
        rnk = np.arange(sk2.size) - np.maximum.accumulate(
            np.where(change, np.arange(sk2.size), -1))
        keep = order[rnk < k]
        fix = side.take(pa.array(np.sort(keep), pa.int64()))

    interior = sorted_ds.map_batches(
        interior_topk, batch_format="pyarrow", batch_size=None)
    if fix.num_rows:
        return interior.union(ray.data.from_arrow(fix))
    return interior


def grouped_median_cont(ds, key: str, col: str):
    """Exact per-key CONTINUOUS median (percentile_cont 0.5) in
    DOUBLED units → pandas DataFrame (key, med2): 2·median stays
    integer because the interpolated median is the mean of the two
    middle order statistics — med2 = v[⌈n/2⌉] + v[⌊n/2⌋+1] (1-based
    ranks; equal for odd n) — so the float the SQL form computes is
    exactly representable and both engines agree bit-for-bit.

    Same scale shape as grouped_quantiles: per-block distinct
    (key, v) histogram partials, ONE narrow groupby, driver-side
    per-key cumsum over value-domain-bounded rows."""
    from ray.data.aggregate import Sum

    from ..io import collect_table

    def hist(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch.column(key).to_pylist(), dtype=object)
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uk, codes = np.unique(ks, return_inverse=True)
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        newgrp = np.r_[True, (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])]
        starts = np.flatnonzero(newgrp)
        counts = np.diff(np.append(starts, cs.size))
        return pa.table({
            key: pa.array(uk[cs[starts]], pa.string()),
            "v": pa.array(vs[starts], pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })
    hist.__name__ = f"medhist_{key}_{col}"

    t = collect_table(
        ds.select_columns([key, col])
        .map_batches(hist, batch_format="pyarrow")
        .groupby([key, "v"]).aggregate(Sum("n", alias_name="n")))
    out = []
    if t.num_columns:
        ks = np.asarray(t.column(key).to_pylist(), dtype=object)
        vs = t.column("v").to_numpy(zero_copy_only=False)
        ns = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((vs, ks))
        ks, vs, ns = ks[order], vs[order], ns[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        bounds = np.append(starts, ks.size)
        for i, s in enumerate(starts):
            e = bounds[i + 1]
            cum = np.cumsum(ns[s:e])
            total = int(cum[-1])
            lo_rank = (total + 1) // 2
            hi_rank = total // 2 + 1
            lo = int(vs[s:e][int(np.searchsorted(cum, lo_rank))])
            hi = int(vs[s:e][int(np.searchsorted(cum, hi_rank))])
            out.append((ks[s], lo + hi))
    return pd.DataFrame(out, columns=[key, "med2"])


def group_zscore(ds, key: str, col: str, id_col: str = "doc_id"):
    """Per-group z-score normalization → (id_col, key, z): the
    feature-scaling pass a training pipeline runs before quality
    thresholds can be compared across groups (languages, sources).

    Scale shape: pass 1 reduces each block to (key, n, sum, sumsq)
    integer partials — exact sums commute, so the group moments are
    partitioning-independent — and ONE tiny groupby over the bounded
    key space merges them; pass 2 is a zero-shuffle map with the
    broadcast moment table. z = (x·n − S) / sqrt(n·SS − S²) — the
    numerically-factored form whose float expression tree the SQL
    oracle mirrors term for term. Zero-variance groups are dropped
    (z undefined) on both sides."""
    from ray.data.aggregate import Sum

    import ray

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        x = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        uniq, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        # int64 scatter-adds (not float bincount weights): partials
        # stay integer-EXACT. Contract: |col| < ~3e9 so x² fits int64.
        s = np.zeros(len(uniq), np.int64)
        ss = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, x)
        np.add.at(ss, inv, x * x)
        return pa.table({key: pa.array(uniq),
                         "n": pa.array(n), "s": pa.array(s),
                         "ss": pa.array(ss)})
    partial.__name__ = f"moments_partial_{col}"

    agg = ds.select_columns([key, col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("n", alias_name="n"),
                                Sum("s", alias_name="s"),
                                Sum("ss", alias_name="ss"))
    moments = collect_table(agg)  # key-space bounded
    mkeys = moments.column(key).to_numpy(zero_copy_only=False)
    order = np.argsort(mkeys)
    mkeys = mkeys[order]
    mn = moments.column("n").to_numpy(zero_copy_only=False)[order] \
        .astype(np.float64)
    ms = moments.column("s").to_numpy(zero_copy_only=False)[order] \
        .astype(np.float64)
    mss = moments.column("ss").to_numpy(zero_copy_only=False)[order] \
        .astype(np.float64)
    denom = np.sqrt(mn * mss - ms * ms)
    handle = ray.put((mkeys, mn, ms, denom))

    def score(batch: pa.Table) -> pa.Table:
        ks, n, s, dn = ray.get(handle)
        k = batch.column(key).to_numpy(zero_copy_only=False)
        x = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pos = np.searchsorted(ks, k)
        z = (x * n[pos] - s[pos]) / dn[pos]
        keep = dn[pos] > 0
        return pa.table({
            id_col: batch.column(id_col),
            key: batch.column(key),
            "z": pa.array(z, pa.float64()),
        }).filter(pa.array(keep))
    score.__name__ = f"zscore_{col}"

    return ds.select_columns([id_col, key, col]) \
        .map_batches(score, batch_format="pyarrow")


def group_corr(ds, key: str, xcol: str, ycol: str):
    """Exact per-group Pearson correlation → (key, n, corr) over a
    bounded key space. ``xcol``/``ycol`` must be int64 (quantize
    floats first — e.g. cents) so the six moments (n, Σx, Σy, Σx²,
    Σy², Σxy) are integer-exact and order-free.

    Scale shape: same layout as group_zscore — each block reduces to
    per-key int64 scatter-add partials, ONE tiny groupby merges them,
    and the final correlation is a driver-side float expression over
    the |keys|-row moment table:
    corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²) · √(n·Σy²−Σy²)) — the
    factored form whose cast-to-double expression tree the SQL oracle
    mirrors term for term. Zero-variance groups are dropped (corr
    undefined) on both sides. Contract: |x·y| · rows-per-key fits
    int64."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        x = batch.column(xcol).to_numpy(zero_copy_only=False)
        y = batch.column(ycol).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        m = np.zeros((5, len(uniq)), np.int64)
        for row, v in enumerate((x, y, x * x, y * y, x * y)):
            np.add.at(m[row], inv, v)
        return pa.table({key: pa.array(uniq), "n": pa.array(n),
                         "sx": pa.array(m[0]), "sy": pa.array(m[1]),
                         "sxx": pa.array(m[2]), "syy": pa.array(m[3]),
                         "sxy": pa.array(m[4])})
    partial.__name__ = f"corr_partial_{xcol}_{ycol}"

    agg = ds.select_columns([key, xcol, ycol]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(
            *(Sum(c, alias_name=c)
              for c in ("n", "sx", "sy", "sxx", "syy", "sxy")))
    m = collect_table(agg)  # key-space bounded
    f = {c: m.column(c).to_numpy(zero_copy_only=False)
         .astype(np.float64)
         for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    vx = f["n"] * f["sxx"] - f["sx"] * f["sx"]
    vy = f["n"] * f["syy"] - f["sy"] * f["sy"]
    corr = (f["n"] * f["sxy"] - f["sx"] * f["sy"]) \
        / (np.sqrt(vx) * np.sqrt(vy))
    keep = (vx > 0) & (vy > 0)
    return pa.table({
        key: m.column(key),
        "n": m.column("n"),
        "corr": pa.array(corr, pa.float64()),
    }).filter(pa.array(keep))


def group_rank(ds, key: str, col: str, id_col: str = "doc_id",
               out_col: str = "rnk", dense: bool = False):
    """Per-row RANK() OVER (PARTITION BY key ORDER BY col) — WITHOUT a
    global sort. ``col`` must be a bounded-domain non-negative int64
    (< 2^32): rank(x) = 1 + #rows in the group with a smaller value,
    which is a pure function of the per-(key, value) HISTOGRAM.

    Scale shape: per-block (key, value, n) unique-partials, ONE
    groupby over ≤ |keys|·|value domain| narrow rows (the same
    bounded-histogram contract as quantiles above), a driver-side
    within-key exclusive cumsum, then a zero-shuffle scoring map that
    looks ranks up through one packed searchsorted — the corpus rows
    never move. Ties share the min rank (SQL RANK semantics);
    ``dense=True`` yields DENSE_RANK (1 + #distinct smaller) from the
    SAME histogram — a cumsum of ones instead of counts."""
    from ray.data.aggregate import Sum

    import ray

    def partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key).to_pylist(), dtype=object)
        x = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        uk, kinv = np.unique(k, return_inverse=True)
        if x.size and (x.min() < 0 or x.max() >= 2**32):
            raise ValueError("group_rank needs 0 <= col < 2^32")
        packed = kinv.astype(np.int64) * (2**32) + x
        up, counts = np.unique(packed, return_counts=True)
        return pa.table({
            key: pa.array(uk[(up >> 32)].tolist(), pa.string()),
            "v": pa.array(up & (2**32 - 1), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64())})
    partial.__name__ = f"rank_hist_partial_{col}"

    hist = collect_table(
        ds.select_columns([key, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key, "v"]).aggregate(Sum("n", alias_name="n")))
    if hist.num_columns == 0 or hist.num_rows == 0:
        # empty input: Ray collects a SCHEMA-LESS table from an empty
        # groupby — the same guard class as group_cume_counts
        import ray
        e = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table({
            id_col: e, key: pa.array([], pa.string()),
            out_col: e}))
    hk = np.asarray(hist.column(key).to_pylist(), dtype=object)
    hv = hist.column("v").to_numpy(zero_copy_only=False)
    hn = hist.column("n").to_numpy(zero_copy_only=False)
    uk, kinv = np.unique(hk, return_inverse=True) \
        if hk.size else (np.empty(0, object), np.empty(0, np.int64))
    order = np.lexsort((hv, kinv))
    kinv, hv, hn = kinv[order], hv[order], hn[order]
    packed = kinv * (2**32) + hv
    # exclusive within-key cumsum → #smaller-in-group, rank base
    starts = np.r_[True, kinv[1:] != kinv[:-1]] \
        if kinv.size else np.empty(0, bool)
    seg_lens = np.diff(np.r_[np.flatnonzero(starts), kinv.size])
    if dense:
        # DENSE_RANK: 1 + #distinct smaller values = position of the
        # value among the key's sorted distinct values — a cumsum of
        # ONES over the same histogram instead of the counts
        idx = np.arange(kinv.size)
        rank = idx - np.repeat(idx[starts], seg_lens) + 1
    else:
        # RANK: 1 + #rows smaller (ties share the min rank)
        cum = np.cumsum(hn) - hn
        rank = cum - np.repeat(cum[starts], seg_lens) + 1
    handle = ray.put((uk, packed, rank))

    def score(batch: pa.Table) -> pa.Table:
        ks, pk, rk = ray.get(handle)
        k = np.asarray(batch.column(key).to_pylist(), dtype=object)
        x = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        kidx = np.searchsorted(ks, k)
        q = kidx * (2**32) + x
        pos = np.searchsorted(pk, q)
        if pos.size and (pk.size == 0 or
                         not (pk[np.minimum(pos, pk.size - 1)] == q)
                         .all()):
            raise ValueError("group_rank: (key, value) missing from "
                             "histogram — inconsistent input")
        return pa.table({
            id_col: batch.column(id_col),
            key: batch.column(key),
            out_col: pa.array(rk[pos], pa.int64())})
    score.__name__ = f"rank_score_{col}"

    return ds.select_columns([id_col, key, col]) \
        .map_batches(score, batch_format="pyarrow")


def group_cume_counts(ds, key: str, col: str,
                      id_col: str = "doc_id"):
    """Per-row CUME_DIST numerator/denominator as EXACT integers —
    (id, key, c_le, n_key) where c_le = #rows in the group with
    value ≤ this row's (SQL's ties-high cumulative count, the default
    RANGE-frame COUNT(*) OVER (PARTITION BY key ORDER BY col)) and
    n_key = the group size; cume_dist = c_le / n_key derives exactly
    downstream, no float ever shuffles. Same bounded-histogram shape
    as group_rank: per-block (key, value, n) unique-partials, ONE
    narrow groupby, driver-side within-key INCLUSIVE cumsum + group
    totals, zero-shuffle broadcast scoring map — corpus rows never
    move."""
    from ray.data.aggregate import Sum

    import ray

    def partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key).to_pylist(), dtype=object)
        x = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        uk, kinv = np.unique(k, return_inverse=True)
        if x.size and (x.min() < 0 or x.max() >= 2**32):
            raise ValueError(
                "group_cume_counts needs 0 <= col < 2^32")
        packed = kinv.astype(np.int64) * (2**32) + x
        up, counts = np.unique(packed, return_counts=True)
        return pa.table({
            key: pa.array(uk[(up >> 32)].tolist(), pa.string()),
            "v": pa.array(up & (2**32 - 1), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64())})
    partial.__name__ = f"cume_hist_partial_{col}"

    hist = collect_table(
        ds.select_columns([key, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key, "v"]).aggregate(Sum("n", alias_name="n")))
    if hist.num_columns == 0 or hist.num_rows == 0:
        # empty input: Ray collects a SCHEMA-LESS table from an empty
        # groupby — and the scoring pass has nothing to score
        import ray
        e = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table({
            id_col: e, key: pa.array([], pa.string()),
            "c_le": e, "n_key": e}))
    hk = np.asarray(hist.column(key).to_pylist(), dtype=object)
    hv = hist.column("v").to_numpy(zero_copy_only=False)
    hn = hist.column("n").to_numpy(zero_copy_only=False)
    uk, kinv = np.unique(hk, return_inverse=True) \
        if hk.size else (np.empty(0, object), np.empty(0, np.int64))
    order = np.lexsort((hv, kinv))
    kinv, hv, hn = kinv[order], hv[order], hn[order]
    packed = kinv * (2**32) + hv
    starts = np.r_[True, kinv[1:] != kinv[:-1]] \
        if kinv.size else np.empty(0, bool)
    seg_lens = np.diff(np.r_[np.flatnonzero(starts), kinv.size])
    cum = np.cumsum(hn)
    base = np.repeat((cum - hn)[starts], seg_lens)
    c_le = cum - base                       # inclusive, ties-high
    totals = np.repeat(
        np.add.reduceat(hn, np.flatnonzero(starts)), seg_lens) \
        if kinv.size else np.empty(0, np.int64)
    handle = ray.put((uk, packed, c_le, totals))

    def score(batch: pa.Table) -> pa.Table:
        ks, pk, cl, tot = ray.get(handle)
        k = np.asarray(batch.column(key).to_pylist(), dtype=object)
        x = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        kidx = np.searchsorted(ks, k)
        q = kidx * (2**32) + x
        pos = np.searchsorted(pk, q)
        if pos.size and (pk.size == 0 or
                         not (pk[np.minimum(pos, pk.size - 1)] == q)
                         .all()):
            raise ValueError(
                "group_cume_counts: (key, value) missing from "
                "histogram — inconsistent input")
        return pa.table({
            id_col: batch.column(id_col),
            key: batch.column(key),
            "c_le": pa.array(cl[pos], pa.int64()),
            "n_key": pa.array(tot[pos], pa.int64())})
    score.__name__ = f"cume_score_{col}"

    return ds.select_columns([id_col, key, col]) \
        .map_batches(score, batch_format="pyarrow")


def _skyline_sweep(x: np.ndarray, y: np.ndarray, n: np.ndarray):
    """2-D maximize-both skyline over DISTINCT (x, y) pairs with
    counts: sort (x desc, y desc); within an x run only the first row
    (max y) can survive, and a run start survives iff its y strictly
    exceeds every strictly-larger-x run's max y (exclusive prefix
    max). One lexsort + one maximum.accumulate — no Python loop."""
    if x.size == 0:
        return x, y, n
    order = np.lexsort((-y, -x))
    xs, ys, ns = x[order], y[order], n[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], xs[1:] != xs[:-1])))
    run_max = ys[starts]
    excl = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(run_max)[:-1]))
    keep = starts[run_max > excl]
    return xs[keep], ys[keep], ns[keep]


def skyline2d(ds, *, xcol: str, ycol: str,
              out_cols: tuple = ("x", "y", "n")):
    """Distributed 2-D SKYLINE (Pareto front, maximize both): the
    distinct (x, y) pairs no other row strictly dominates, with their
    row counts — multi-objective top-of-the-tradeoff selection (SQL:
    NOT EXISTS dominance anti-join, a quadratic self-join).

    Scale shape: the frontier is MERGEABLE — skyline(union) =
    skyline(union of local skylines), and a globally surviving pair is
    in EVERY containing block's local frontier, so per-pair counts sum
    exactly. Each block reduces to its distinct pairs (packed-int64
    np.unique) then its local frontier (one lexsort + prefix-max
    sweep); the O(blocks · frontier) candidate table collects
    driver-side and the same sweep finishes. ZERO shuffle — the only
    movement is the KB-scale frontier partials. Contract: 0 ≤ x <
    2^22, 0 ≤ y < 2^40 (packed dedup), checked loudly. A frontier too
    large to collect (high-cardinality tradeoffs) would swap the
    driver finish for one groupby over pair codes — documented hatch,
    not needed at any realistic frontier size."""
    from ..io import collect_table as _ct

    def partial(batch: pa.Table) -> pa.Table:
        xa = batch.column(xcol).to_numpy(zero_copy_only=False)
        ya = batch.column(ycol).to_numpy(zero_copy_only=False)
        if xa.size and (int(xa.min()) < 0 or int(xa.max()) >= 2**22
                        or int(ya.min()) < 0
                        or int(ya.max()) >= 2**40):
            raise ValueError("skyline2d: x must be in [0, 2^22), "
                             "y in [0, 2^40)")
        pack, cnt = np.unique(xa * 2**40 + ya, return_counts=True)
        sx, sy, sn = _skyline_sweep(
            pack >> 40, pack & (2**40 - 1), cnt.astype(np.int64))
        return pa.table({
            out_cols[0]: pa.array(sx, pa.int64()),
            out_cols[1]: pa.array(sy, pa.int64()),
            out_cols[2]: pa.array(sn, pa.int64())})
    partial.__name__ = "skyline_partial"

    cand = _ct(ds.select_columns([xcol, ycol])
               .map_batches(partial, batch_format="pyarrow"))
    cx = cand.column(out_cols[0]).to_numpy(zero_copy_only=False)
    cy = cand.column(out_cols[1]).to_numpy(zero_copy_only=False)
    cn = cand.column(out_cols[2]).to_numpy(zero_copy_only=False)
    pack = cx * 2**40 + cy
    upack, inv = np.unique(pack, return_inverse=True)
    tot = np.zeros(upack.size, np.int64)
    np.add.at(tot, inv, cn)
    sx, sy, sn = _skyline_sweep(
        upack >> 40, upack & (2**40 - 1), tot)
    return pa.table({
        out_cols[0]: pa.array(sx, pa.int64()),
        out_cols[1]: pa.array(sy, pa.int64()),
        out_cols[2]: pa.array(sn, pa.int64())})


def grouped_weighted_median(ds, key: str, col: str, wcol: str,
                            coarse_bits: int = 0):
    """Exact per-key lower WEIGHTED median — the robust center when
    rows carry unequal mass (price weighted by quantity, latency by
    request count): the smallest v with 2·cumweight(v) ≥ totalweight.
    All-integer, so engines agree bit-for-bit with no interpolation.

    ``coarse_bits=0`` (small value domains): one histogram pass —
    per-block (key, v, Σw) partials collapse duplicates before the
    only shuffle, ONE narrow groupby, driver cumsum; collect is
    O(keys × distinct values). For NEAR-UNIQUE domains (prices,
    latencies — distinct ≈ rows, so that collect would be the whole
    table) set ``coarse_bits=b`` for the two-pass BUCKET REFINEMENT:
    pass 1 histograms (key, v >> b) — domain shrunk 2^b× — and the
    driver locates each key's median BUCKET plus the cumulative
    weight before it; pass 2 re-reads the same pruned scan and
    histograms ONLY rows inside each key's located bucket (the
    per-key bucket map is a key-bounded broadcast), so the exact
    finish sees ≤ 2^b distinct values per key. Both collects are
    bounded regardless of domain: O(keys × domain/2^b) +
    O(keys × 2^b) — minimized at b ≈ log2(√domain). Identical
    results to the one-pass form (pinned by pytest).

    Weights must be non-negative int64 (loud check); values must be
    non-negative when coarse_bits > 0 (>> is arithmetic); zero total
    weight drops the key (mirrors SQL's empty cumsum). Returns
    pandas (key, wmedian)."""
    from ray.data.aggregate import Sum

    from ..io import collect_table

    def hist(batch: pa.Table, shift: int = 0, only=None) -> pa.Table:
        ks = np.asarray(batch.column(key).to_pylist(), dtype=object)
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = batch.column(wcol).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if w.size and int(w.min()) < 0:
            raise ValueError("grouped_weighted_median: weights must "
                             "be non-negative")
        if shift and v.size and int(v.min()) < 0:
            raise ValueError("grouped_weighted_median: coarse_bits "
                             "requires non-negative values")
        if only is not None and ks.size:
            # keep only rows inside their key's located bucket
            tgt = np.fromiter((only.get(k, -1) for k in ks),
                              np.int64, ks.size)
            m = (v >> shift) == tgt
            ks, w = ks[m], w[m]
            v = v[m]
        elif shift:
            v = v >> shift
        if ks.size == 0:
            return pa.table({key: pa.array([], pa.string()),
                             "v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        uk, codes = np.unique(ks, return_inverse=True)
        order = np.lexsort((v, codes))
        cs, vs, ws = codes[order], v[order], w[order]
        newgrp = np.r_[True, (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])]
        starts = np.flatnonzero(newgrp)
        gid = np.cumsum(newgrp) - 1
        wsum = np.zeros(starts.size, np.int64)
        np.add.at(wsum, gid, ws)
        return pa.table({
            key: pa.array(uk[cs[starts]], pa.string()),
            "v": pa.array(vs[starts], pa.int64()),
            "w": pa.array(wsum, pa.int64())})

    def agg(shift: int = 0, only=None) -> pa.Table:
        fn = (lambda b: hist(b, shift, only))
        fn.__name__ = f"wmedhist_{key}_{col}_s{shift}"
        return collect_table(
            ds.select_columns([key, col, wcol])
            .map_batches(fn, batch_format="pyarrow")
            .groupby([key, "v"]).aggregate(Sum("w", alias_name="w")))

    def per_key(t: pa.Table):
        """Yield (key, values_sorted, weights, cumsum) per key."""
        if not (t.num_columns and t.num_rows):
            return
        ks = np.asarray(t.column(key).to_pylist(), dtype=object)
        vs = t.column("v").to_numpy(zero_copy_only=False)
        ws = t.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((vs, ks))
        ks, vs, ws = ks[order], vs[order], ws[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        bounds = np.append(starts, ks.size)
        for i, s in enumerate(starts):
            e = bounds[i + 1]
            yield ks[s], vs[s:e], ws[s:e], np.cumsum(ws[s:e])

    if coarse_bits <= 0:
        out = []
        for k, vs, _, cum in per_key(agg()):
            total = int(cum[-1])
            if total == 0:
                continue
            j = int(np.searchsorted(2 * cum, total))
            out.append((k, int(vs[j])))
        return pd.DataFrame(out, columns=[key, "wmedian"])

    # pass 1: locate each key's median bucket + weight before it
    bucket_of, before_of, total_of = {}, {}, {}
    for k, bs, _, cum in per_key(agg(shift=coarse_bits)):
        total = int(cum[-1])
        if total == 0:
            continue
        j = int(np.searchsorted(2 * cum, total))
        bucket_of[k] = int(bs[j])
        before_of[k] = int(cum[j - 1]) if j else 0
        total_of[k] = total
    if not bucket_of:
        return pd.DataFrame([], columns=[key, "wmedian"])

    # pass 2: exact values inside each key's bucket only
    out = []
    for k, vs, _, cum in per_key(agg(shift=coarse_bits,
                                     only=bucket_of)):
        if k not in bucket_of:
            continue
        total, before = total_of[k], before_of[k]
        j = int(np.searchsorted(2 * (before + cum), total))
        out.append((k, int(vs[j])))
    return pd.DataFrame(out, columns=[key, "wmedian"])

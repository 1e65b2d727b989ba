"""Windowed / per-key-ordered aggregates without per-group Python.

The Ray Data shape for a per-key window at 10^8+ keys: ONE global sort
co-locates and orders each key's rows, then every block computes
VECTORIZED per-key run summaries (numpy segment reduces — no Python
per key). Keys fully interior to a block are finished right there and
emitted; only runs touching a block EDGE (first/last run of the block
— at most 2 per block, independent of key count) need cross-block
merging, and that tiny set goes through one groupby fixup. No
single-block barrier, no repartition(1), no per-key Python on the
interior path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _segment_summaries(uids: np.ndarray, first_ts: np.ndarray,
                       last_ts: np.ndarray, breaks_in: np.ndarray,
                       gap_ns: int):
    """Merge consecutive rows of the same key (rows pre-sorted by
    (key, first_ts)): per-key run → (first, last, total breaks incl.
    boundary gaps between merged rows). All numpy segment ops."""
    n = uids.size
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = uids[1:] != uids[:-1]
    run = np.cumsum(change) - 1  # run index per row
    n_runs = int(run[-1]) + 1
    # boundary break between row i-1 and i (same key)
    gaps = first_ts[1:] - last_ts[:-1]
    brk = np.empty(n, dtype=np.int64)
    brk[0] = 0
    brk[1:] = ((gaps > gap_ns) & ~change[1:]).astype(np.int64)
    total_breaks = (np.bincount(run, weights=breaks_in,
                                minlength=n_runs) +
                    np.bincount(run, weights=brk,
                                minlength=n_runs)).astype(np.int64)
    starts = np.nonzero(change)[0]
    ends = np.empty(n_runs, dtype=np.int64)
    ends[:-1] = starts[1:] - 1
    ends[-1] = n - 1
    return (uids[starts], first_ts[starts], last_ts[ends],
            total_breaks)


def sessionize(ds, gap_s: float = 1800.0, user_col: str = "user_id",
               ts_col: str = "ts", num_partitions: int = 16):
    """→ (user_id, n_sessions): a new session starts when the gap to
    the user's previous event exceeds ``gap_s``.

    Shape: ONE global sort on (user, ts) → vectorized per-block run
    summaries. A run that is neither the first nor the last run of its
    block is a COMPLETE user (the sort made each user's rows globally
    contiguous), so it's finalized map-side with zero further movement.
    Edge runs — ≤2 per block, so the set is O(num_blocks), not
    O(num_users) — are merged by one small groupby (per-group work is
    a handful of rows). The narrow summary table is materialized once
    to feed both consumers without re-running the sort."""
    gap_ns = int(gap_s * 1e9)

    def to_summaries(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
                "n_breaks": pa.array([], pa.int64()),
                "is_edge": pa.array([], pa.bool_())})
        ts = batch.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            # normalize any unit (s/ms/us/ns) to ns before int64
            ts = ts.cast(pa.timestamp("ns")).cast(pa.int64())
        else:
            ts = ts.cast(pa.int64())
        uids = batch.column(user_col).to_numpy(zero_copy_only=False)
        t = ts.to_numpy(zero_copy_only=False)
        zeros = np.zeros(batch.num_rows, dtype=np.int64)
        u2, f2, l2, b2 = _segment_summaries(uids, t, t, zeros, gap_ns)
        edge = np.zeros(u2.size, dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.table({
            "user_id": pa.array(u2, pa.int64()),
            "first_ts": pa.array(f2, pa.int64()),
            "last_ts": pa.array(l2, pa.int64()),
            "n_breaks": pa.array(b2, pa.int64()),
            "is_edge": pa.array(edge)})

    # coalesce the narrow (user, ts) projection before the sort:
    # input-inherited tiny blocks cost more in range-sampling and
    # shuffle fragments than the sort itself (same lesson as
    # joins.asof_join; isolated sf0.1 sort 1.16s -> 0.46s)
    summaries = ds.select_columns([user_col, ts_col]) \
        .repartition(num_partitions) \
        .sort([user_col, ts_col]) \
        .map_batches(to_summaries, batch_format="pyarrow") \
        .materialize()  # narrow rows; feeds two consumers below

    def finish_interior(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "n_sessions": pc.add(batch.column("n_breaks"),
                                 pa.scalar(1, pa.int64())),
        })

    interior = summaries.filter(expr="is_edge == False") \
        .map_batches(finish_interior, batch_format="pyarrow")

    def fix_edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("first_ts")
        f = g["first_ts"].to_numpy()
        l_ = g["last_ts"].to_numpy()
        breaks = int(g["n_breaks"].sum()) + \
            int(((f[1:] - l_[:-1]) > gap_ns).sum())
        return pd.DataFrame({
            "user_id": g["user_id"].iloc[:1].reset_index(drop=True),
            "n_sessions": pd.Series([breaks + 1], dtype="int64")})

    edges = summaries.filter(expr="is_edge == True") \
        .groupby("user_id").map_groups(fix_edges, batch_format="pandas")

    return interior.union(edges)


def windowed_cumsum(ds, *, key_col: str, order_cols: list[str],
                    val_col: str, out_col: str = "running",
                    num_partitions: int = 16):
    """Per-key ordered running sum — the window-function class
    ``SUM(val) OVER (PARTITION BY key ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` — with a PER-ROW output. ``val_col`` must
    be int64 (convert money to cents first) so partial sums are exact
    and order-free on the fixup path.

    Scale shape (same interior/edge split as sessionize above): ONE
    global sort on (key, *order_cols) makes each key's rows contiguous
    and ordered; every block then finishes its INTERIOR keys with one
    vectorized segmented cumsum (cumsum minus segment-base, no Python
    per key). Only rows of the first/last key of each block — O(rows
    of ≤2 keys per block), independent of key count — go through a
    small groupby(key) exact fixup, because those keys may continue
    into a neighboring block. No single-block barrier, no
    repartition(1)."""
    cols = [key_col, *order_cols, val_col]

    def split_blocks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                out_col, pa.array([], pa.int64())).append_column(
                "is_edge", pa.array([], pa.bool_()))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        seg = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        cum = np.cumsum(vals)
        base = (cum[starts] - vals[starts])[seg]
        running = cum - base
        # first and last segment of the block may continue into a
        # neighboring block after the global sort → exact fixup path
        is_edge = (seg == 0) | (seg == seg[-1])
        return batch.append_column(
            out_col, pa.array(running, pa.int64())).append_column(
            "is_edge", pa.array(is_edge))

    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .map_batches(split_blocks, batch_format="pyarrow") \
        .materialize()  # narrow rows; feeds two consumers

    interior = sorted_tagged.filter(expr="is_edge == False") \
        .drop_columns(["is_edge"])

    def fix_edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order_cols).reset_index(drop=True)
        g[out_col] = g[val_col].to_numpy().cumsum().astype(np.int64)
        return g.drop(columns=["is_edge"])

    edges = sorted_tagged.filter(expr="is_edge == True") \
        .groupby(key_col).map_groups(fix_edges, batch_format="pandas")

    return interior.union(edges)


def windowed_rolling_sum(ds, *, key_col: str, order_cols: list[str],
                         val_col: str, out_col: str = "rolling",
                         preceding: int = 2, num_partitions: int = 16):
    """Per-key MOVING-FRAME window sum — the class ``SUM(val) OVER
    (PARTITION BY key ORDER BY order_cols ROWS BETWEEN ``preceding``
    PRECEDING AND CURRENT ROW)`` — with a per-row output. ``val_col``
    must be int64 (convert money to cents first) so every frame sum is
    exact.

    Scale shape (same interior/edge split as windowed_cumsum): ONE
    global sort on (key, *order_cols); block-INTERIOR keys finish with
    one segmented cumsum + a lagged-gather subtraction (rolled[i] =
    cum[i] − cum[max(i−p, seg_start)−1], zero per-key Python); only
    the ≤2 keys touching each block edge take the small exact groupby
    fixup, which always sees the complete key."""
    cols = [key_col, *order_cols, val_col]
    p = int(preceding)

    def split_blocks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                out_col, pa.array([], pa.int64())).append_column(
                "is_edge", pa.array([], pa.bool_()))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        seg = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        cum = np.cumsum(vals)
        idx = np.arange(n)
        lo = np.maximum(idx - p, starts[seg])  # frame start row
        prev = lo - 1
        sub = np.where(prev >= 0, cum[np.maximum(prev, 0)], 0)
        rolled = cum - sub
        is_edge = (seg == 0) | (seg == seg[-1])
        return batch.append_column(
            out_col, pa.array(rolled, pa.int64())).append_column(
            "is_edge", pa.array(is_edge))

    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .map_batches(split_blocks, batch_format="pyarrow") \
        .materialize()  # narrow rows; feeds two consumers

    interior = sorted_tagged.filter(expr="is_edge == False") \
        .drop_columns(["is_edge"])

    def fix_edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order_cols).reset_index(drop=True)
        v = g[val_col].to_numpy().astype(np.int64)
        cum = np.cumsum(v)
        idx = np.arange(v.size)
        prev = np.maximum(idx - p, 0) - 1
        sub = np.where(prev >= 0, cum[np.maximum(prev, 0)], 0)
        g[out_col] = (cum - sub).astype(np.int64)
        return g.drop(columns=["is_edge"])

    edges = sorted_tagged.filter(expr="is_edge == True") \
        .groupby(key_col).map_groups(fix_edges, batch_format="pandas")

    return interior.union(edges)


def windowed_lag(ds, *, key_col: str, ts_col: str, id_col: str,
                 num_partitions: int = 16):
    """Per-key offset window functions — the ``LAG`` / ``LEAD`` class
    ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, id)`` — emitting
    per-row gaps to the previous and next event of the same key in
    MICROSECONDS (int64; -1 sentinel where SQL yields NULL, i.e. the
    first/last row of each key).

    Scale shape (same interior/edge split as windowed_cumsum above):
    the timestamp is folded to int64 micros BEFORE the shuffle so only
    three int64 columns move; ONE global sort on (key, ts_us, id)
    makes each key contiguous and ordered; block-INTERIOR keys finish
    with two vectorized diffs (no Python per key); only the ≤2 keys
    touching each block edge go through a small exact groupby fixup —
    and a key that spans blocks has ALL its rows in first/last
    segments, so the fixup always sees the complete key."""

    def to_us(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            key_col: b.column(key_col).cast(pa.int64()),
            "ts_us": pa.array(ts, pa.int64())})
    to_us.__name__ = "ts_to_int_us"

    def split_blocks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "gap_prev": pa.array([], pa.int64()),
                "gap_next": pa.array([], pa.int64()),
                "is_edge": pa.array([], pa.bool_())})
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        diff = ts[1:] - ts[:-1]
        gp = np.empty(n, np.int64)
        gp[0] = -1
        gp[1:] = np.where(change[1:], -1, diff)
        gn = np.empty(n, np.int64)
        gn[-1] = -1
        gn[:-1] = np.where(change[1:], -1, diff)
        seg = np.cumsum(change) - 1
        is_edge = (seg == 0) | (seg == seg[-1])
        return pa.table({
            id_col: batch.column(id_col),
            key_col: batch.column(key_col),
            "ts_us": batch.column("ts_us"),
            "gap_prev": pa.array(gp, pa.int64()),
            "gap_next": pa.array(gn, pa.int64()),
            "is_edge": pa.array(is_edge)})

    sorted_tagged = ds.map_batches(to_us, batch_format="pyarrow") \
        .repartition(num_partitions) \
        .sort([key_col, "ts_us", id_col]) \
        .map_batches(split_blocks, batch_format="pyarrow") \
        .materialize()  # narrow int64 rows; feeds two consumers

    out_cols = [id_col, key_col, "gap_prev", "gap_next"]
    interior = sorted_tagged.filter(expr="is_edge == False") \
        .select_columns(out_cols)

    def fix_edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts_us", id_col]).reset_index(drop=True)
        ts = g["ts_us"].to_numpy()
        n = ts.size
        gp = np.empty(n, np.int64)
        gp[0] = -1
        gp[1:] = ts[1:] - ts[:-1]
        gn = np.empty(n, np.int64)
        gn[-1] = -1
        gn[:-1] = ts[1:] - ts[:-1]
        g["gap_prev"] = gp
        g["gap_next"] = gn
        return g[out_cols]

    edges = sorted_tagged.filter(expr="is_edge == True") \
        .groupby(key_col).map_groups(fix_edges, batch_format="pandas")

    return interior.union(edges)


def hopping_window_agg(ds, *, window_s: int = 7200, hop_s: int = 3600,
                       ts_col: str = "ts", key_col: str = "event_type",
                       val_col: str = "value"):
    """Hopping (sliding) window aggregate: windows of ``window_s``
    seconds starting at every multiple of ``hop_s`` (epoch-aligned);
    each event lands in exactly K = window/hop windows. →
    (window_start epoch-seconds, key, n_events, sum_value).

    Scale shape: the K-fold replication happens INSIDE map_batches and
    is immediately collapsed by an in-batch group_by partial (the same
    combine-before-shuffle layout as events_daily), so the one small
    groupby moves ≤ |windows × keys| rows per block — never K× the
    corpus. Integer epoch arithmetic end to end keeps the SQL oracle
    bit-exact."""
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    k_reps = window_s // hop_s
    hop_us = hop_s * 1_000_000
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t_us = batch.column(ts_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = (t_us // hop_us) * hop_us
        ws = np.concatenate(
            [base - i * hop_us for i in range(k_reps)]) // 1_000_000
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        rep_idx = pa.array(np.tile(np.arange(len(batch)), k_reps))
        t = pa.table({
            "window_start": pa.array(ws, pa.int64()),
            key_col: keys.take(rep_idx),
            "v": batch.column(val_col).take(rep_idx),
        })
        g = t.group_by(["window_start", key_col]).aggregate(
            [("v", "count"), ("v", "sum")])
        return g.rename_columns(
            ["window_start", key_col, "n_events", "sum_value"])
    partial.__name__ = f"hop_{window_s}_{hop_s}_partial"

    agg = ds.select_columns([ts_col, key_col, val_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_start", key_col]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"))
    return agg


def funnel(ds, *, steps: tuple[str, str] = ("view", "purchase"),
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type"):
    """Two-step conversion funnel: per user, did a ``steps[1]`` event
    happen strictly AFTER some ``steps[0]`` event? → (user_id,
    converted) for every user with at least one event of either step.

    Scale shape: order is resolved WITHOUT sorting — conversion only
    needs min(ts of step A) < max(ts of step B), so one in-batch
    conditional partial (two masked min/max per user) plus ONE small
    groupby carries the whole corpus; no per-user event lists, no
    global sort. Events of other types are dropped at the projection.
    """
    from ray.data.aggregate import Max, Min

    _SENT_MAX = np.int64(2**62)      # "no A event" → min folds away
    _SENT_MIN = np.int64(-2**62)     # "no B event" → max folds away

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        kinds = np.asarray(batch.column(type_col).to_pylist())
        uids = batch.column(user_col).to_numpy(zero_copy_only=False)
        rel = (kinds == steps[0]) | (kinds == steps[1])
        ts, kinds, uids = ts[rel], kinds[rel], uids[rel]
        u, inv = np.unique(uids, return_inverse=True)
        a_min = np.full(u.size, _SENT_MAX)
        b_max = np.full(u.size, _SENT_MIN)
        is_a = kinds == steps[0]
        np.minimum.at(a_min, inv[is_a], ts[is_a])
        np.maximum.at(b_max, inv[~is_a], ts[~is_a])
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "a_min": pa.array(a_min, pa.int64()),
            "b_max": pa.array(b_max, pa.int64()),
        })
    partial.__name__ = f"funnel_{steps[0]}_{steps[1]}_partial"

    agg = ds.select_columns([user_col, ts_col, type_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Min("a_min", alias_name="a_min"),
            Max("b_max", alias_name="b_max"))

    def finish(batch: pa.Table) -> pa.Table:
        a = batch.column("a_min").to_numpy(zero_copy_only=False)
        b = batch.column("b_max").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch.column("user_id"),
            "converted": pa.array(a < b),
        })

    return agg.map_batches(finish, batch_format="pyarrow")

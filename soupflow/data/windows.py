"""Windowed / per-key-ordered aggregates without per-group Python.

The Ray Data shape for a per-key window at 10^8+ keys: a global sort
co-locates and orders each key's rows, then every block computes
VECTORIZED per-key run summaries (numpy segment reduces — no Python
per key), and summaries are stitched hierarchically (each stitch pass
is the same vectorized kernel over far fewer rows) until one block
holds everything for the final emit. Per-key Python never runs —
unlike groupby().map_groups, whose per-group call overhead dominates
when there are millions of tiny groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SUMMARY_SCHEMA = ["user_id", "first_ts", "last_ts", "n_breaks"]


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


def _stitch_batch(batch: pa.Table, gap_ns: int) -> pa.Table:
    if batch.num_rows == 0:
        return pa.table({
            "user_id": pa.array([], pa.int64()),
            "first_ts": pa.array([], pa.int64()),
            "last_ts": pa.array([], pa.int64()),
            "n_breaks": pa.array([], pa.int64())})
    uids = batch.column("user_id").to_numpy(zero_copy_only=False)
    f = batch.column("first_ts").to_numpy(zero_copy_only=False)
    l_ = batch.column("last_ts").to_numpy(zero_copy_only=False)
    b = batch.column("n_breaks").to_numpy(zero_copy_only=False)
    u2, f2, l2, b2 = _segment_summaries(uids, f, l_, b, gap_ns)
    return pa.table({
        "user_id": pa.array(u2, pa.int64()),
        "first_ts": pa.array(f2, pa.int64()),
        "last_ts": pa.array(l2, pa.int64()),
        "n_breaks": pa.array(b2, pa.int64())})


def sessionize(ds, gap_s: float = 1800.0, user_col: str = "user_id",
               ts_col: str = "ts", stitch_passes: int = 1):
    """→ (user_id, n_sessions): a new session starts when the gap to
    the user's previous event exceeds ``gap_s``.

    Shape: ONE global sort on (user, ts) → vectorized per-block run
    summaries → ``stitch_passes`` hierarchical stitch rounds (sort over
    the shrunken summaries, ~1 row per user per block) → final
    single-block stitch + emit. No per-key Python anywhere; at 10^12
    events raise stitch_passes so each round's output fits a block."""
    gap_ns = int(gap_s * 1e9)

    def to_summaries(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            # normalize any unit (s/ms/us/ns) to ns before int64
            ts = ts.cast(pa.timestamp("ns")).cast(pa.int64())
        else:
            ts = ts.cast(pa.int64())
        t = pa.table({
            "user_id": batch.column(user_col),
            "first_ts": ts,
            "last_ts": ts,
            "n_breaks": pa.array(
                np.zeros(batch.num_rows, dtype=np.int64)),
        })
        return _stitch_batch(t, gap_ns)

    summaries = ds.select_columns([user_col, ts_col]) \
        .sort([user_col, ts_col]) \
        .map_batches(to_summaries, batch_format="pyarrow")
    for _ in range(stitch_passes):
        summaries = summaries.sort(["user_id", "first_ts"]) \
            .map_batches(lambda b: _stitch_batch(b, gap_ns),
                         batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        merged = _stitch_batch(batch, gap_ns)
        return pa.table({
            "user_id": merged.column("user_id"),
            "n_sessions": pa.compute.add(
                merged.column("n_breaks"), 1),
        })

    # final stitch needs every key's remaining summaries in ONE block
    return summaries.sort(["user_id", "first_ts"]) \
        .repartition(1).map_batches(final, batch_format="pyarrow")

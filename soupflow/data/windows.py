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


_BCAST_CACHE: dict = {}


def _cached_get(handle):
    """Per-worker deserialization cache for broadcast fixup tables:
    ray.get of a pickled dict re-deserializes on every task, so the
    first task on a worker materializes it and later tasks reuse it
    (same pattern as extract.py's per-worker singleton kernels)."""
    import ray
    k = handle.hex()
    v = _BCAST_CACHE.get(k)
    if v is None:
        v = ray.get(handle)
        while len(_BCAST_CACHE) >= 8:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[k] = v
    return v


def _key_segments(keys: np.ndarray):
    """(seg index per row, segment start offsets) for a key column
    already sorted within the block."""
    n = keys.size
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    return np.cumsum(change) - 1, np.flatnonzero(change)


def _edge_segment_bounds(batch: pa.Table, key_col: str):
    """The ≤2 segments of a block that can continue into a neighbor
    after the global sort (first and last key run): [(i0, i1), ...].
    A key spanning multiple blocks lands ENTIRELY in such segments
    (in middle blocks it occupies the whole block), so a cross-block
    fixup that covers these covers every split key exactly."""
    n = batch.num_rows
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    seg, starts = _key_segments(keys)
    out = []
    for s in sorted({0, int(seg[-1])}):
        i0 = int(starts[s])
        i1 = int(starts[s + 1]) if s + 1 < starts.size else n
        out.append((i0, i1))
    return out


def _boundary_tuple(batch: pa.Table, key_col: str,
                    order_cols: list[str], i: int) -> tuple:
    """Identity of a block-edge segment: its key and FIRST row's order
    values. Under the deterministic-window contract — (key,
    *order_cols) unique, which any per-row-deterministic SQL window
    needs anyway — this names the segment unambiguously across the
    summary and scoring passes."""
    return (batch.column(key_col)[i].as_py(),
            *(batch.column(c)[i].as_py() for c in order_cols))


def _summary_table(batch: pa.Table, key_col: str,
                   order_cols: list[str], payload: dict) -> pa.Table:
    """Build a typed per-edge-segment summary table (schema stable
    even for empty blocks, so collect_table never unions mismatched
    null-typed columns)."""
    names, arrs = [], []
    for c in (key_col, *order_cols):
        names.append(c)
        arrs.append(pa.array(payload[c],
                             type=batch.schema.field(c).type))
    for c, v in payload.items():
        if c in (key_col, *order_cols):
            continue
        typ, vals = v
        names.append(c)
        arrs.append(pa.array(vals, type=typ))
    return pa.table(dict(zip(names, arrs)))


def _sorted_summary_rows(summ: pa.Table, key_col: str,
                         order_cols: list[str], extra: list[str]):
    """Driver-side: order the O(blocks) edge-segment summaries by
    (key, *order_cols) and yield python rows; duplicate boundary
    tuples violate the unique-ordering contract and raise loudly."""
    if summ.num_rows == 0:
        return []
    summ = summ.sort_by([(key_col, "ascending")]
                        + [(c, "ascending") for c in order_cols])
    cols = [summ.column(key_col).to_pylist()] +         [summ.column(c).to_pylist() for c in order_cols] +         [summ.column(c).to_pylist() for c in extra]
    rows = list(zip(*cols))
    n_id = 1 + len(order_cols)
    seen = set()
    for r in rows:
        tup = r[:n_id]
        if tup in seen:
            raise ValueError(
                "windowed operators require (key, *order_cols) to be "
                "unique at block boundaries (the deterministic-window "
                f"contract); duplicate boundary {tup!r}")
        seen.add(tup)
    return rows


def ordered_string_agg(ds, *, key_col: str, order_cols: list[str],
                       val_col: str, sep: str = ">",
                       out_col: str = "path",
                       num_partitions: int = 16):
    """ORDER-SENSITIVE grouped aggregation — the
    ``string_agg(val, sep ORDER BY order_cols) GROUP BY key`` class
    (array_agg / collect_list ORDER BY is the same machinery): each
    key's values concatenated in a deterministic order, the "user
    journey path" surface of product analytics.

    Scale shape: ONE global sort on (key, *order_cols) — the shuffle
    any ordered aggregate inherently needs — then every block reduces
    each key run to ONE partial string with a single vectorized
    ``pc.binary_join`` over a run-offset ListArray (no Python per key
    or per row). A run neither first nor last in its block is a
    COMPLETE key (sort made keys globally contiguous) and is emitted
    finished, zero further movement. Edge runs — ≤2 per block, so
    O(blocks) ROWS — merge through one small groupby(key). Unlike the
    window family (per-row outputs, where a per-key groupby fixup was
    a hot-key hazard), here a spanning key's edge-group payload IS its
    output row, so the grouped merge is inherent, not avoidable: the
    bytes that meet in one task are exactly the bytes of the result
    row. Contract: (key, *order_cols) unique — a duplicate ordering
    tuple makes the SQL result itself nondeterministic; duplicates
    meeting the edge fixup raise loudly."""

    cols = [key_col, *order_cols, val_col]

    def run_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            names = [key_col, *order_cols,
                     *[f"_l_{c}" for c in order_cols],
                     "_part", "_edge"]
            arrs = ([pa.array([], batch.schema.field(c).type)
                     for c in (key_col, *order_cols)]
                    + [pa.array([], batch.schema.field(c).type)
                       for c in order_cols]
                    + [pa.array([], pa.string()),
                       pa.array([], pa.bool_())])
            return pa.table(dict(zip(names, arrs)))
        n = batch.num_rows
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        _, starts = _key_segments(keys)
        if n > 1:
            # the block is sorted on (key, *order_cols), so a
            # duplicate ordering tuple is ADJACENT — one vectorized
            # equality sweep per column catches it in-block (the
            # cross-block case is caught in the edge merge)
            dup = keys[1:] == keys[:-1]
            for c in order_cols:
                oc = batch.column(c).to_numpy(zero_copy_only=False)
                dup = dup & (oc[1:] == oc[:-1])
            if dup.any():
                raise ValueError(
                    "ordered_string_agg requires (key, *order_cols) "
                    "unique — duplicate ordering tuple for key "
                    f"{keys[int(np.flatnonzero(dup)[0])]!r} makes "
                    "the aggregate nondeterministic")
        vals = batch.column(val_col)
        if pa.types.is_large_string(vals.type):
            vals = vals.cast(pa.string())
        offsets = np.append(starts, n).astype(np.int32)
        parts = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     vals.combine_chunks()),
            sep)
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True
        idx = pa.array(starts, pa.int64())
        # each run's LAST ordering tuple rides along too: the merge
        # check needs it to catch a duplicate split exactly at a
        # block boundary where the earlier piece has >1 row (its
        # run-FIRST tuple differs, so first-vs-first misses it)
        ends = pa.array(np.append(starts[1:], n) - 1, pa.int64())
        out = {key_col: batch.column(key_col).take(idx)}
        for c in order_cols:
            out[c] = batch.column(c).take(idx)
        for c in order_cols:
            out[f"_l_{c}"] = batch.column(c).take(ends)
        out["_part"] = parts
        out["_edge"] = pa.array(edge)
        return pa.table(out)
    run_partials.__name__ = "string_agg_run_partials"

    partials = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .map_batches(run_partials, batch_format="pyarrow",
                     batch_size=None) \
        .materialize()  # ≤ keys + 2·blocks rows; feeds two consumers

    def finish_interior(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch.column(key_col),
                         out_col: batch.column("_part")})
    finish_interior.__name__ = "string_agg_finish_interior"

    interior = partials.filter(expr="_edge == False") \
        .map_batches(finish_interior, batch_format="pyarrow")

    def merge_edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order_cols)
        dup = g.duplicated(subset=order_cols).any()
        if not dup and len(g) > 1:
            # boundary-split duplicates: the earlier piece's LAST
            # tuple equals the next piece's FIRST tuple
            eq = np.ones(len(g) - 1, dtype=bool)
            for c in order_cols:
                eq &= (g[f"_l_{c}"].to_numpy()[:-1]
                       == g[c].to_numpy()[1:])
            dup = bool(eq.any())
        if dup:
            raise ValueError(
                "ordered_string_agg requires (key, *order_cols) "
                "unique — duplicate ordering tuple for key "
                f"{g[key_col].iloc[0]!r} makes the aggregate "
                "nondeterministic")
        return pd.DataFrame({
            key_col: g[key_col].iloc[:1].reset_index(drop=True),
            out_col: pd.Series([sep.join(g["_part"])])})

    edges = partials.filter(expr="_edge == True") \
        .groupby(key_col).map_groups(merge_edges,
                                     batch_format="pandas")

    return interior.union(edges)


def windowed_cumsum(ds, *, key_col: str, order_cols: list[str],
                    val_col: str, out_col: str = "running",
                    num_partitions: int = 16):
    """Per-key ordered running sum — the window-function class
    ``SUM(val) OVER (PARTITION BY key ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` — with a PER-ROW output. ``val_col`` must
    be int64 (convert money to cents first) so partial sums are exact
    and order-free on the fixup path. Requires (key, *order_cols)
    unique at block boundaries (any per-row-deterministic SQL window
    needs a unique ordering anyway); violations raise.

    Scale shape: ONE global sort on (key, *order_cols) makes each
    key's rows contiguous and ordered; every block finishes ALL its
    keys with one vectorized segmented cumsum (cumsum minus
    segment-base, no Python per key). Cross-block carry is a
    BROADCAST-BASE fixup with no second shuffle: each block emits ≤2
    edge-segment summary rows (key, first-row order values, segment
    sum), the driver computes each segment's exclusive prefix within
    its key over the O(blocks) summary table, and a zero-shuffle
    second map adds the base to edge-segment rows in place. No
    groupby fixup — so a HOT KEY spanning B blocks costs B summary
    rows and B vectorized block fixes, never a single task holding
    the key's entire row set (the straggler/OOM mode of per-key
    map_groups fixups at 100 TB)."""
    import ray

    from ..io import collect_table

    cols = [key_col, *order_cols, val_col]

    def split_blocks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                out_col, pa.array([], pa.int64()))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        seg, starts = _key_segments(keys)
        cum = np.cumsum(vals)
        base = (cum[starts] - vals[starts])[seg]
        return batch.append_column(
            out_col, pa.array(cum - base, pa.int64()))

    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .map_batches(split_blocks, batch_format="pyarrow",
                     batch_size=None) \
        .materialize()  # narrow rows; summary + scoring passes must
    # see the SAME blocks (batch_size=None = whole blocks)

    def summarize(batch: pa.Table) -> pa.Table:
        payload = {c: [] for c in (key_col, *order_cols)}
        sums = []
        if batch.num_rows:
            run = batch.column(out_col).to_numpy(zero_copy_only=False)
            for i0, i1 in _edge_segment_bounds(batch, key_col):
                payload[key_col].append(
                    batch.column(key_col)[i0].as_py())
                for c in order_cols:
                    payload[c].append(batch.column(c)[i0].as_py())
                sums.append(int(run[i1 - 1]))
        payload["_seg_sum"] = (pa.int64(), sums)
        return _summary_table(batch, key_col, order_cols, payload)
    summarize.__name__ = "cumsum_edge_summaries"

    summ = collect_table(sorted_tagged.map_batches(
        summarize, batch_format="pyarrow", batch_size=None))
    bases: dict = {}
    acc, prev = 0, object()
    for row in _sorted_summary_rows(summ, key_col, order_cols,
                                    ["_seg_sum"]):
        tup, seg_sum = row[:-1], row[-1]
        if tup[0] != prev:
            acc, prev = 0, tup[0]
        bases[tup] = acc
        acc += seg_sum
    handle = ray.put(bases)

    def apply_bases(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        b = _cached_get(handle)
        run = batch.column(out_col).to_numpy(
            zero_copy_only=False).copy()
        for i0, i1 in _edge_segment_bounds(batch, key_col):
            base = b[_boundary_tuple(batch, key_col, order_cols, i0)]
            if base:
                run[i0:i1] += base
        return batch.drop_columns([out_col]).append_column(
            out_col, pa.array(run, pa.int64()))
    apply_bases.__name__ = "cumsum_apply_bases"

    return sorted_tagged.map_batches(
        apply_bases, batch_format="pyarrow", batch_size=None)


def windowed_rolling_sum(ds, *, key_col: str, order_cols: list[str],
                         val_col: str, out_col: str = "rolling",
                         preceding: int = 2, num_partitions: int = 16):
    """Per-key MOVING-FRAME window sum — the class ``SUM(val) OVER
    (PARTITION BY key ORDER BY order_cols ROWS BETWEEN ``preceding``
    PRECEDING AND CURRENT ROW)`` — with a per-row output. ``val_col``
    must be int64 (convert money to cents first) so every frame sum is
    exact. Requires (key, *order_cols) unique at block boundaries.

    Scale shape (same broadcast-base fixup as windowed_cumsum): ONE
    global sort; every block finishes all keys with one segmented
    cumsum + lagged-gather subtraction (rolled[i] = cum[i] −
    cum[max(i−p, seg_start)−1], zero per-key Python). Cross-block
    carry: each edge-segment summary carries the segment's LAST ≤p
    raw values; the driver threads a ≤p-value tail through each key's
    segments in order, and the zero-shuffle scoring map adds the
    missing suffix sums to only the first ≤p rows of each edge
    segment. Hot keys cost O(blocks·p) driver state, never a
    single-task group."""
    import ray

    from ..io import collect_table

    cols = [key_col, *order_cols, val_col]
    p = int(preceding)

    def split_blocks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                out_col, pa.array([], pa.int64()))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        seg, starts = _key_segments(keys)
        cum = np.cumsum(vals)
        idx = np.arange(n)
        lo = np.maximum(idx - p, starts[seg])  # frame start row
        prev = lo - 1
        sub = np.where(prev >= 0, cum[np.maximum(prev, 0)], 0)
        return batch.append_column(
            out_col, pa.array(cum - sub, pa.int64()))

    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .map_batches(split_blocks, batch_format="pyarrow",
                     batch_size=None) \
        .materialize()

    def summarize(batch: pa.Table) -> pa.Table:
        payload = {c: [] for c in (key_col, *order_cols)}
        tails, lens = [], []
        if batch.num_rows:
            vals = batch.column(val_col).to_numpy(
                zero_copy_only=False)
            for i0, i1 in _edge_segment_bounds(batch, key_col):
                payload[key_col].append(
                    batch.column(key_col)[i0].as_py())
                for c in order_cols:
                    payload[c].append(batch.column(c)[i0].as_py())
                tails.append(
                    vals[max(i1 - p, i0):i1].tolist() if p else [])
                lens.append(i1 - i0)
        payload["_tail"] = (pa.list_(pa.int64()), tails)
        payload["_n"] = (pa.int64(), lens)
        return _summary_table(batch, key_col, order_cols, payload)
    summarize.__name__ = "rolling_edge_summaries"

    summ = collect_table(sorted_tagged.map_batches(
        summarize, batch_format="pyarrow", batch_size=None))
    incoming: dict = {}
    carry = np.empty(0, np.int64)
    prev = object()
    for row in _sorted_summary_rows(summ, key_col, order_cols,
                                    ["_tail", "_n"]):
        tup, tail, n_seg = row[:-2], row[-2], row[-1]
        if tup[0] != prev:
            carry, prev = np.empty(0, np.int64), tup[0]
        incoming[tup] = carry
        seg_tail = np.asarray(tail, np.int64)
        if n_seg >= p:
            carry = seg_tail
        else:
            carry = np.concatenate([carry, seg_tail])[
                max(len(carry) + len(seg_tail) - p, 0):]
    handle = ray.put(incoming)

    def apply_tails(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or p == 0:
            return batch
        inc_map = _cached_get(handle)
        run = batch.column(out_col).to_numpy(
            zero_copy_only=False).copy()
        for i0, i1 in _edge_segment_bounds(batch, key_col):
            inc = inc_map[_boundary_tuple(batch, key_col,
                                          order_cols, i0)]
            if inc.size:
                ssum = np.concatenate(
                    [[0], np.cumsum(inc[::-1])])  # ssum[t] = last t
                j = np.arange(min(p, i1 - i0))
                t = np.minimum(p - j, inc.size)
                run[i0:i0 + j.size] += ssum[t]
        return batch.drop_columns([out_col]).append_column(
            out_col, pa.array(run, pa.int64()))
    apply_tails.__name__ = "rolling_apply_tails"

    return sorted_tagged.map_batches(
        apply_tails, batch_format="pyarrow", batch_size=None)


_NO_MIN = np.int64(1) << 62  # "+inf" surrogate: no prior prefix min


def _segmented_cummin(x: np.ndarray, seg: np.ndarray,
                      starts: np.ndarray) -> np.ndarray:
    """Per-segment INCLUSIVE running minimum of int64 ``x`` (segments
    pre-sorted and contiguous) — vectorized via the segment-offset
    trick: shift segment s by −s·BIG with BIG > global value spread,
    so an earlier segment's values can never win the running min of a
    later one, then one global np.minimum.accumulate and un-shift.
    Falls back to a per-segment slice loop when the shifted range
    would leave int64 (huge spread × many segments — rare; the loop
    is O(segments) Python but each slice is still a C accumulate)."""
    n = x.size
    if n == 0:
        return x.astype(np.int64, copy=True)
    lo, hi = int(x.min()), int(x.max())
    big = hi - lo + 1
    nseg = int(seg[-1]) + 1
    if max(abs(lo), abs(hi)) + nseg * big < (1 << 62):
        off = seg.astype(np.int64) * np.int64(big)
        return np.minimum.accumulate(x - off) + off
    out = np.empty(n, np.int64)
    bounds = np.append(starts, n)
    for i in range(nseg):
        s0, s1 = int(bounds[i]), int(bounds[i + 1])
        out[s0:s1] = np.minimum.accumulate(x[s0:s1])
    return out


def floored_running_balance(ds, *, key_col: str,
                            order_cols: list[str], val_col: str,
                            num_partitions: int = 16):
    """Per-key running balance FLOORED AT ZERO — the ledger /
    inventory scan ``b_t = max(b_{t-1} + d_t, 0)`` — reduced to ONE
    row per key: ``(key, final_bal, clip_n, peak_bal)`` where clip_n
    counts the steps where the floor actually bound (b would have
    gone negative) and peak_bal is the running maximum of b.
    ``val_col`` must be int64 (signed deltas in cents); requires
    (key, *order_cols) unique at block boundaries, like every
    deterministic window.

    The recurrence looks inherently sequential, but folds into two
    ASSOCIATIVE scans via the classic identity
    ``b_t = S_t − min(0, M_t)`` (S = prefix sum, M = running min of
    S), and the floor binds at t iff ``S_t < min(0, M_{t−1})`` — so
    the whole scan vectorizes: ONE global sort co-locates each key,
    every block finishes all its segments with a segmented cumsum +
    segmented running min (zero per-key Python on the interior
    path), and cross-block carry is windowed_cumsum's broadcast-base
    fixup generalized to the PAIR ``(S_in, M_in)``: each block emits
    ≤2 edge-segment summary rows (key, first-row order tuple,
    segment sum, segment min-prefix), the driver threads (S, M)
    through each key's segments over the O(blocks) summary table and
    marks each key's LAST segment (the one allowed to emit the final
    balance), and a zero-shuffle scoring pass reduces every segment
    to one partial row. A final KEY-bounded groupby (Sum clips /
    Max peak / Sum final) merges multi-block keys; a hot key
    spanning B blocks costs B summary rows and B vectorized block
    scores, never a single task holding its full row set."""
    import ray
    from ray.data.aggregate import Max, Sum

    from ..io import collect_table

    cols = [key_col, *order_cols, val_col]
    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .materialize()  # summary + scoring passes see the SAME blocks

    def summarize(batch: pa.Table) -> pa.Table:
        payload = {c: [] for c in (key_col, *order_cols)}
        sums, minprefs = [], []
        if batch.num_rows:
            vals = batch.column(val_col).to_numpy(
                zero_copy_only=False)
            cum = np.cumsum(vals)
            for i0, i1 in _edge_segment_bounds(batch, key_col):
                payload[key_col].append(
                    batch.column(key_col)[i0].as_py())
                for c in order_cols:
                    payload[c].append(batch.column(c)[i0].as_py())
                base = int(cum[i0]) - int(vals[i0])
                sums.append(int(cum[i1 - 1]) - base)
                minprefs.append(int(cum[i0:i1].min()) - base)
        payload["_seg_sum"] = (pa.int64(), sums)
        payload["_seg_minpref"] = (pa.int64(), minprefs)
        return _summary_table(batch, key_col, order_cols, payload)
    summarize.__name__ = "floored_balance_edge_summaries"

    summ = collect_table(sorted_tagged.map_batches(
        summarize, batch_format="pyarrow", batch_size=None))
    if summ.num_columns == 0 or summ.num_rows == 0:
        # empty input (collect of all-empty blocks is schema-less);
        # int64 key like the other windows empty paths
        e = pa.array([], pa.int64())
        import ray as _ray
        return _ray.data.from_arrow(pa.table({
            key_col: e, "final_bal": e, "clip_n": e,
            "peak_bal": e}))
    incoming: dict = {}
    acc_s, acc_m = 0, int(_NO_MIN)
    prev, last_tup = object(), None
    for row in _sorted_summary_rows(summ, key_col, order_cols,
                                    ["_seg_sum", "_seg_minpref"]):
        tup, seg_sum, seg_minpref = row[:-2], row[-2], row[-1]
        if tup[0] != prev:
            if last_tup is not None:
                s_in, m_in, _ = incoming[last_tup]
                incoming[last_tup] = (s_in, m_in, True)
            acc_s, acc_m, prev = 0, int(_NO_MIN), tup[0]
        incoming[tup] = (acc_s, acc_m, False)
        last_tup = tup
        acc_m = min(acc_m, acc_s + seg_minpref)
        acc_s += seg_sum
    if last_tup is not None:
        s_in, m_in, _ = incoming[last_tup]
        incoming[last_tup] = (s_in, m_in, True)
    handle = ray.put(incoming)

    def score(batch: pa.Table) -> pa.Table:
        key_t = batch.schema.field(key_col).type
        if batch.num_rows == 0:
            return pa.table({
                key_col: pa.array([], key_t),
                "_clips": pa.array([], pa.int64()),
                "_peak": pa.array([], pa.int64()),
                "_fin": pa.array([], pa.int64()),
                "_nf": pa.array([], pa.int64())})
        inc = _cached_get(handle)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        seg, starts = _key_segments(keys)
        n = keys.size
        cum = np.cumsum(vals)
        base = (cum[starts] - vals[starts])[seg]
        s_loc = cum - base                 # local inclusive prefix
        cm_loc = _segmented_cummin(s_loc, seg, starts)
        nseg = starts.size
        s_in = np.zeros(nseg, np.int64)
        m_in = np.full(nseg, _NO_MIN, np.int64)
        is_last = np.ones(nseg, bool)      # interior keys: complete
        for i0, _ in _edge_segment_bounds(batch, key_col):
            si, mi, lf = inc[_boundary_tuple(batch, key_col,
                                             order_cols, i0)]
            s = int(seg[i0])
            s_in[s], m_in[s], is_last[s] = si, mi, lf
        S = s_in[seg] + s_loc
        m_incl = np.minimum(m_in[seg], s_in[seg] + cm_loc)
        m_excl = np.empty(n, np.int64)     # running min BEFORE row t
        m_excl[1:] = m_incl[:-1]
        m_excl[starts] = m_in
        b = S - np.minimum(m_incl, 0)
        clip = (S < np.minimum(m_excl, 0)).astype(np.int64)
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            key_col: batch.column(key_col).take(
                pa.array(starts, pa.int64())),
            "_clips": pa.array(np.add.reduceat(clip, starts),
                               pa.int64()),
            "_peak": pa.array(np.maximum.reduceat(b, starts),
                              pa.int64()),
            "_fin": pa.array(np.where(is_last, b[ends], 0),
                             pa.int64()),
            "_nf": pa.array(is_last.astype(np.int64), pa.int64())})
    score.__name__ = "floored_balance_score"

    def finish(batch: pa.Table) -> pa.Table:
        nf = batch.column("_nf").to_numpy(zero_copy_only=False)
        if batch.num_rows and (nf != 1).any():
            bad = batch.column(key_col)[
                int(np.flatnonzero(nf != 1)[0])].as_py()
            raise ValueError(
                "floored_running_balance: key "
                f"{bad!r} finalized {int(nf.max())} times — the "
                "(key, *order_cols) boundary contract is broken")
        return pa.table({
            key_col: batch.column(key_col),
            "final_bal": batch.column("_fin"),
            "clip_n": batch.column("_clips"),
            "peak_bal": batch.column("_peak")})
    finish.__name__ = "floored_balance_finish"

    return sorted_tagged.map_batches(
        score, batch_format="pyarrow", batch_size=None) \
        .groupby(key_col).aggregate(
            Sum("_clips", alias_name="_clips"),
            Max("_peak", alias_name="_peak"),
            Sum("_fin", alias_name="_fin"),
            Sum("_nf", alias_name="_nf")) \
        .map_batches(finish, batch_format="pyarrow")


def _segmented_cummax(x: np.ndarray, seg: np.ndarray,
                      starts: np.ndarray) -> np.ndarray:
    """Per-segment INCLUSIVE running maximum — the mirror of
    _segmented_cummin (shift by +s·BIG so earlier segments always
    lose a running max; same int64 guard and per-segment
    fallback)."""
    n = x.size
    if n == 0:
        return x.astype(np.int64, copy=True)
    lo, hi = int(x.min()), int(x.max())
    big = hi - lo + 1
    nseg = int(seg[-1]) + 1
    if max(abs(lo), abs(hi)) + nseg * big < (1 << 62):
        off = seg.astype(np.int64) * np.int64(big)
        return np.maximum.accumulate(x + off) - off
    out = np.empty(n, np.int64)
    bounds = np.append(starts, n)
    for i in range(nseg):
        s0, s1 = int(bounds[i]), int(bounds[i + 1])
        out[s0:s1] = np.maximum.accumulate(x[s0:s1])
    return out


def record_high_scan(ds, *, key_col: str, order_cols: list[str],
                     val_col: str, num_partitions: int = 16):
    """Per-key RECORD-HIGH scan — how many times did each key set a
    new personal maximum, and what is it now? (``v_t >
    max(v_1..v_{t−1})`` — price records, personal bests, peak-load
    counters.) Returns one row per key: (key, n_records, max_val);
    the first observation is always a record. Completes the
    scan-carry family (sum = windowed_cumsum, clamp =
    floored_running_balance, fill = windowed_locf): ONE sort,
    per-block segmented running max (_segmented_cummax), and the
    cross-block carry is a single value — the key's running max so
    far — threaded by the driver over ≤2 edge summaries per block;
    a per-segment (key, records, seg_max) partial then folds
    through ONE key-bounded groupby (Sum, Max). No last-segment
    marking is needed: both outputs merge associatively."""
    import ray
    from ray.data.aggregate import Max, Sum

    from ..io import collect_table

    NO_MAX = -(np.int64(1) << 62)
    cols = [key_col, *order_cols, val_col]
    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .materialize()

    def summarize(batch: pa.Table) -> pa.Table:
        payload = {c: [] for c in (key_col, *order_cols)}
        maxes = []
        if batch.num_rows:
            vals = batch.column(val_col).to_numpy(
                zero_copy_only=False)
            for i0, i1 in _edge_segment_bounds(batch, key_col):
                payload[key_col].append(
                    batch.column(key_col)[i0].as_py())
                for c in order_cols:
                    payload[c].append(batch.column(c)[i0].as_py())
                maxes.append(int(vals[i0:i1].max()))
        payload["_seg_max"] = (pa.int64(), maxes)
        return _summary_table(batch, key_col, order_cols, payload)
    summarize.__name__ = "record_edge_summaries"

    summ = collect_table(sorted_tagged.map_batches(
        summarize, batch_format="pyarrow", batch_size=None))
    if summ.num_columns == 0 or summ.num_rows == 0:
        e = pa.array([], pa.int64())
        import ray as _ray
        return _ray.data.from_arrow(pa.table({
            key_col: e, "n_records": e, "max_val": e}))
    incoming: dict = {}
    acc = int(NO_MAX)
    prev = object()
    for row in _sorted_summary_rows(summ, key_col, order_cols,
                                    ["_seg_max"]):
        tup, seg_max = row[:-1], row[-1]
        if tup[0] != prev:
            acc, prev = int(NO_MAX), tup[0]
        incoming[tup] = acc
        acc = max(acc, seg_max)
    handle = ray.put(incoming)

    def score(batch: pa.Table) -> pa.Table:
        key_t = batch.schema.field(key_col).type
        if batch.num_rows == 0:
            return pa.table({
                key_col: pa.array([], key_t),
                "_recs": pa.array([], pa.int64()),
                "_max": pa.array([], pa.int64())})
        inc = _cached_get(handle)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        seg, starts = _key_segments(keys)
        n = keys.size
        cm = _segmented_cummax(vals, seg, starts)
        m_in = np.full(starts.size, NO_MAX, np.int64)
        for i0, _ in _edge_segment_bounds(batch, key_col):
            m_in[int(seg[i0])] = inc[_boundary_tuple(
                batch, key_col, order_cols, i0)]
        m_excl = np.empty(n, np.int64)     # running max BEFORE row t
        m_excl[1:] = cm[:-1]
        m_excl[starts] = NO_MAX
        m_excl = np.maximum(m_excl, m_in[seg])
        rec = (vals > m_excl).astype(np.int64)
        return pa.table({
            key_col: batch.column(key_col).take(
                pa.array(starts, pa.int64())),
            "_recs": pa.array(np.add.reduceat(rec, starts),
                              pa.int64()),
            "_max": pa.array(np.maximum.reduceat(vals, starts),
                             pa.int64())})
    score.__name__ = "record_high_score"

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column(key_col),
            "n_records": batch.column("_recs"),
            "max_val": batch.column("_max")})
    finish.__name__ = "record_high_finish"

    return sorted_tagged.map_batches(
        score, batch_format="pyarrow", batch_size=None) \
        .groupby(key_col).aggregate(
            Sum("_recs", alias_name="_recs"),
            Max("_max", alias_name="_max")) \
        .map_batches(finish, batch_format="pyarrow")


def windowed_locf(ds, *, key_col: str, order_cols: list[str],
                  val_col: str, out_col: str = "filled",
                  default: int = 0, num_partitions: int = 16):
    """Per-key LAST-OBSERVATION-CARRIED-FORWARD — the
    ``last_value(x IGNORE NULLS) OVER (PARTITION BY key ORDER BY …
    ROWS UNBOUNDED PRECEDING)`` class (sensor gap fill, sparse
    feature carry, "last purchase as of each event"), with a per-row
    output: every row gets the most recent NON-NULL ``val_col`` at or
    before it within its key, or ``default`` when none exists yet.
    ``val_col`` must be int64-with-nulls. Requires (key, *order_cols)
    unique at block boundaries.

    Scale shape (windowed_cumsum's one-sort broadcast-carry family):
    each block fills all its segments with ONE vectorized segmented
    running-argmax of valid-row positions (the same segment-offset
    trick as _segmented_cummin — positions are block-bounded so the
    shift can't leave int64), and the cross-block carry per key is a
    SINGLE value: the segment's last non-null (or the carry threaded
    from earlier segments). Each block ships ≤2 edge summaries; the
    driver walks the O(blocks) table; a zero-shuffle scoring pass
    substitutes the carry into only the rows before their segment's
    first non-null. Hot keys cost O(blocks) driver state."""
    import ray

    from ..io import collect_table

    cols = [key_col, *order_cols, val_col]
    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .materialize()  # summary + scoring passes see the SAME blocks

    def summarize(batch: pa.Table) -> pa.Table:
        payload = {c: [] for c in (key_col, *order_cols)}
        lasts, has = [], []
        if batch.num_rows:
            col = batch.column(val_col).cast(pa.int64())
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            vals = col.fill_null(0).to_numpy(zero_copy_only=False)
            for i0, i1 in _edge_segment_bounds(batch, key_col):
                payload[key_col].append(
                    batch.column(key_col)[i0].as_py())
                for c in order_cols:
                    payload[c].append(batch.column(c)[i0].as_py())
                nz = np.flatnonzero(valid[i0:i1])
                if nz.size:
                    lasts.append(int(vals[i0 + nz[-1]]))
                    has.append(1)
                else:
                    lasts.append(0)
                    has.append(0)
        payload["_last"] = (pa.int64(), lasts)
        payload["_has"] = (pa.int64(), has)
        return _summary_table(batch, key_col, order_cols, payload)
    summarize.__name__ = "locf_edge_summaries"

    summ = collect_table(sorted_tagged.map_batches(
        summarize, batch_format="pyarrow", batch_size=None))
    incoming: dict = {}
    carry = None
    prev = object()
    for row in _sorted_summary_rows(summ, key_col, order_cols,
                                    ["_last", "_has"]):
        tup, last, has = row[:-2], row[-2], row[-1]
        if tup[0] != prev:
            carry, prev = None, tup[0]
        incoming[tup] = carry
        if has:
            carry = last
    handle = ray.put(incoming)

    def fill(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                out_col, pa.array([], pa.int64()))
        inc = _cached_get(handle)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        col = batch.column(val_col).cast(pa.int64())
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        vals = col.fill_null(0).to_numpy(zero_copy_only=False)
        seg, starts = _key_segments(keys)
        n = keys.size
        # segmented running argmax of valid positions: pos = row
        # index where valid else −1; shift by seg·(n+1) so earlier
        # segments always lose (positions are block-bounded, no
        # overflow possible)
        pos = np.where(valid, np.arange(n, dtype=np.int64),
                       np.int64(-1))
        off = seg.astype(np.int64) * np.int64(n + 1)
        fillpos = np.maximum.accumulate(pos + off) - off
        out = np.where(fillpos >= 0,
                       vals[np.maximum(fillpos, 0)], default)
        # rows before their segment's first non-null take the carry
        need = fillpos < 0
        if need.any():
            carry_per_seg = np.full(starts.size, np.int64(default))
            for i0, _ in _edge_segment_bounds(batch, key_col):
                c = inc[_boundary_tuple(batch, key_col,
                                        order_cols, i0)]
                if c is not None:
                    carry_per_seg[int(seg[i0])] = c
            out = np.where(need, carry_per_seg[seg], out)
        return batch.append_column(out_col,
                                   pa.array(out, pa.int64()))
    fill.__name__ = "locf_fill"

    return sorted_tagged.map_batches(
        fill, batch_format="pyarrow", batch_size=None)


def grid_interpolate(ds, *, key_col: str, t_col: str, val_col: str,
                     grid_us: int = 86_400_000_000,
                     num_partitions: int = 16):
    """Per-key LINEAR RESAMPLING onto a fixed time grid — the
    sensor / price-series "value at every grid instant" operator:
    for each grid point g with t_first ≤ g < t_last (per key), the
    linearly interpolated value between the surrounding
    observations, emitted as an EXACT integer fraction
    ``num = v_prev·(t_next − g) + v_next·(g − t_prev)``,
    ``den = t_next − t_prev`` (value = num/den, one float away).
    Contract: (key, t) unique — duplicate observation instants make
    interpolation ill-defined and raise loudly (in-block adjacent
    check + driver seam check).

    The usual formulation (per grid point, find surrounding obs =
    searchsorted per key) hides the scalable shape: every grid
    point lies between exactly ONE ADJACENT OBSERVATION PAIR, so
    after ONE sort on (key, t) the whole operator is pair-local —
    each block expands its in-block adjacent pairs to their grid
    rows with pure numpy (repeat + arange, no per-key Python, no
    searchsorted), and the ONLY cross-block work is the ≤1 SEAM
    pair per block boundary per key (last obs of the earlier piece,
    first obs of the later), reconstructed by the driver from ≤2
    edge summaries per block — O(blocks) state, O(blocks ×
    days-per-gap) seam rows, appended as one extra dataset. An
    interpolation product |v|·gap ≥ 2^62 raises where the oracle's
    BIGINT cast would fail identically."""
    import ray

    from ..io import collect_table

    D = int(grid_us)
    cols = [key_col, t_col, val_col]
    sorted_tagged = ds.select_columns(cols) \
        .repartition(num_partitions) \
        .sort([key_col, t_col]) \
        .materialize()

    def pair_rows(keys, t0, t1, v0, v1):
        """Vectorized pair → grid-row expansion (shared by the
        in-block kernel and the driver's seam pass)."""
        d0 = (t0 + D - 1) // D
        d1 = (t1 + D - 1) // D
        cnt = np.maximum(d1 - d0, 0)
        total = int(cnt.sum())
        if total == 0:
            return None
        idx = np.repeat(np.arange(cnt.size), cnt)
        offs = np.arange(total) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        day = d0[idx] + offs
        g = day * D
        span = t1[idx] - t0[idx]
        vmax = max(abs(int(v0[idx].max() if total else 0)),
                   abs(int(v0[idx].min() if total else 0)),
                   abs(int(v1[idx].max() if total else 0)),
                   abs(int(v1[idx].min() if total else 0)))
        if vmax and vmax * int(span.max()) >= (1 << 62):
            raise ValueError(
                "grid_interpolate: |v|·gap exceeds int64 — the "
                "oracle's BIGINT cast would fail identically")
        num = v0[idx] * (t1[idx] - g) + v1[idx] * (g - t0[idx])
        return keys[idx], day, num, span

    def block_kernel(batch: pa.Table) -> pa.Table:
        key_t = batch.schema.field(key_col).type
        empty = pa.table({
            key_col: pa.array([], key_t),
            "day": pa.array([], pa.int64()),
            "num": pa.array([], pa.int64()),
            "den": pa.array([], pa.int64())})
        if batch.num_rows < 2:
            return empty
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        t = batch.column(t_col).to_numpy(zero_copy_only=False)
        v = batch.column(val_col).to_numpy(zero_copy_only=False)
        m = keys[1:] == keys[:-1]
        if (m & (t[1:] == t[:-1])).any():
            bad = int(np.flatnonzero(m & (t[1:] == t[:-1]))[0])
            raise ValueError(
                "grid_interpolate requires (key, t) unique — "
                f"duplicate instant for key {keys[bad]!r}")
        out = pair_rows(keys[:-1][m], t[:-1][m], t[1:][m],
                        v[:-1][m], v[1:][m])
        if out is None:
            return empty
        k, day, num, den = out
        return pa.table({
            key_col: pa.array(k, key_t),
            "day": pa.array(day, pa.int64()),
            "num": pa.array(num, pa.int64()),
            "den": pa.array(den, pa.int64())})
    block_kernel.__name__ = "grid_interp_kernel"

    def summarize(batch: pa.Table) -> pa.Table:
        payload = {c: [] for c in (key_col, t_col)}
        ft, fv, lt, lv = [], [], [], []
        if batch.num_rows:
            t = batch.column(t_col).to_numpy(zero_copy_only=False)
            v = batch.column(val_col).to_numpy(
                zero_copy_only=False)
            for i0, i1 in _edge_segment_bounds(batch, key_col):
                payload[key_col].append(
                    batch.column(key_col)[i0].as_py())
                payload[t_col].append(
                    batch.column(t_col)[i0].as_py())
                ft.append(int(t[i0]))
                fv.append(int(v[i0]))
                lt.append(int(t[i1 - 1]))
                lv.append(int(v[i1 - 1]))
        payload["_ft"] = (pa.int64(), ft)
        payload["_fv"] = (pa.int64(), fv)
        payload["_lt"] = (pa.int64(), lt)
        payload["_lv"] = (pa.int64(), lv)
        return _summary_table(batch, key_col, [t_col], payload)
    summarize.__name__ = "grid_interp_edge_summaries"

    summ = collect_table(sorted_tagged.map_batches(
        summarize, batch_format="pyarrow", batch_size=None))
    interior = sorted_tagged.map_batches(
        block_kernel, batch_format="pyarrow", batch_size=None)
    if summ.num_columns == 0 or summ.num_rows == 0:
        return interior
    sk, sd, sn, sden = [], [], [], []
    prev_key = object()
    prev_lt = prev_lv = None
    for row in _sorted_summary_rows(summ, key_col, [t_col],
                                    ["_ft", "_fv", "_lt", "_lv"]):
        key, _, ft, fv, lt, lv = row
        if key == prev_key:
            if ft == prev_lt:
                raise ValueError(
                    "grid_interpolate requires (key, t) unique — "
                    f"duplicate instant at a block seam for key "
                    f"{key!r}")
            out = pair_rows(np.array([0]),
                            np.array([prev_lt], np.int64),
                            np.array([ft], np.int64),
                            np.array([prev_lv], np.int64),
                            np.array([fv], np.int64))
            if out is not None:
                _, day, num, den = out
                sk.extend([key] * day.size)
                sd.extend(day.tolist())
                sn.extend(num.tolist())
                sden.extend(den.tolist())
        prev_key, prev_lt, prev_lv = key, lt, lv
    if not sk:
        return interior
    key_t = summ.schema.field(key_col).type
    import ray as _ray
    seams = _ray.data.from_arrow(pa.table({
        key_col: pa.array(sk, key_t),
        "day": pa.array(sd, pa.int64()),
        "num": pa.array(sn, pa.int64()),
        "den": pa.array(sden, pa.int64())}))
    return interior.union(seams)


def windowed_lag(ds, *, key_col: str, ts_col: str, id_col: str,
                 num_partitions: int = 16):
    """Per-key offset window functions — the ``LAG`` / ``LEAD`` class
    ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, id)`` — emitting
    per-row gaps to the previous and next event of the same key in
    MICROSECONDS (int64; -1 sentinel where SQL yields NULL, i.e. the
    first/last row of each key). The (ts, id) ordering must be unique
    per key (ids unique suffices).

    Scale shape (same broadcast fixup as windowed_cumsum): the
    timestamp folds to int64 micros BEFORE the shuffle so only three
    int64 columns move; ONE global sort on (key, ts_us, id); every
    block finishes all keys with two vectorized diffs. Cross-block
    carry: each edge-segment summary carries its first/last ts; the
    driver pairs neighboring segments of the same key, and the
    zero-shuffle scoring map overwrites exactly one gap at each
    segment end. Hot keys never form a single-task group."""
    import ray

    from ..io import collect_table

    order_cols = ["ts_us", id_col]

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
            return batch.append_column(
                "gap_prev", pa.array([], pa.int64())).append_column(
                "gap_next", pa.array([], pa.int64()))
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
        return batch.append_column(
            "gap_prev", pa.array(gp, pa.int64())).append_column(
            "gap_next", pa.array(gn, pa.int64()))

    sorted_tagged = ds.map_batches(to_us, batch_format="pyarrow") \
        .repartition(num_partitions) \
        .sort([key_col, *order_cols]) \
        .map_batches(split_blocks, batch_format="pyarrow",
                     batch_size=None) \
        .materialize()

    def summarize(batch: pa.Table) -> pa.Table:
        payload = {c: [] for c in (key_col, *order_cols)}
        first_ts, last_ts = [], []
        if batch.num_rows:
            ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
            for i0, i1 in _edge_segment_bounds(batch, key_col):
                payload[key_col].append(
                    batch.column(key_col)[i0].as_py())
                for c in order_cols:
                    payload[c].append(batch.column(c)[i0].as_py())
                first_ts.append(int(ts[i0]))
                last_ts.append(int(ts[i1 - 1]))
        payload["_first_ts"] = (pa.int64(), first_ts)
        payload["_last_ts"] = (pa.int64(), last_ts)
        return _summary_table(batch, key_col, order_cols, payload)
    summarize.__name__ = "lag_edge_summaries"

    summ = collect_table(sorted_tagged.map_batches(
        summarize, batch_format="pyarrow", batch_size=None))
    rows = _sorted_summary_rows(summ, key_col, order_cols,
                                ["_first_ts", "_last_ts"])
    neighbors: dict = {}
    for i, row in enumerate(rows):
        tup = row[:-2]
        prev_last = rows[i - 1][-1] \
            if i > 0 and rows[i - 1][0] == tup[0] else None
        next_first = rows[i + 1][-2] \
            if i + 1 < len(rows) and rows[i + 1][0] == tup[0] else None
        neighbors[tup] = (prev_last, next_first)
    handle = ray.put(neighbors)

    out_cols = [id_col, key_col, "gap_prev", "gap_next"]

    def apply_neighbors(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(out_cols)
        nb = _cached_get(handle)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        gp = batch.column("gap_prev").to_numpy(
            zero_copy_only=False).copy()
        gn = batch.column("gap_next").to_numpy(
            zero_copy_only=False).copy()
        for i0, i1 in _edge_segment_bounds(batch, key_col):
            prev_last, next_first = nb[_boundary_tuple(
                batch, key_col, order_cols, i0)]
            if prev_last is not None:
                gp[i0] = ts[i0] - prev_last
            if next_first is not None:
                gn[i1 - 1] = next_first - ts[i1 - 1]
        return pa.table({
            id_col: batch.column(id_col),
            key_col: batch.column(key_col),
            "gap_prev": pa.array(gp, pa.int64()),
            "gap_next": pa.array(gn, pa.int64())})
    apply_neighbors.__name__ = "lag_apply_neighbors"

    return sorted_tagged.map_batches(
        apply_neighbors, batch_format="pyarrow", batch_size=None)


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


def ordered_funnel(ds, *, key_col: str, ts_col: str, type_col: str,
                   steps: tuple, window_us: int,
                   num_partitions: int = 8):
    """STRICT-SEQUENCE multi-step funnel with a per-step conversion
    window: how many keys reach step i, where step i must occur
    STRICTLY after the key's step-(i−1) time and within ``window_us``
    of it → (step, n_keys). Unlike the 2-step masked-min/max funnel,
    each stage's threshold DEPENDS on the previous stage's result
    (t₁ = min ts of step-1 events after t₀), so the composite is
    inherently sequential — the classic decorrelation is one narrow
    staged pass per step: events fold map-side to (key, ts_µs) for
    that step only (other rows never leave the scan), ONE partitioned
    hash join attaches the previous stage's per-key time, the window
    filter is a zero-shuffle map, and ONE key-bounded groupby(Min)
    produces the next stage table. Stage tables are (key, t) int64
    pairs — fact-scale keyed but narrow, so they stay distributed;
    only the per-step COUNTS (len(steps) rows) ever reach the
    driver."""
    from ray.data.aggregate import Min

    def narrow(step):
        def fold(b: pa.Table) -> pa.Table:
            tv = np.asarray(b.column(type_col).to_pylist(),
                            dtype=object)
            m = tv == step
            kept = b.filter(pa.array(m))
            ts = kept.column(ts_col) \
                .to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            t = pa.table({
                key_col: kept.column(key_col).cast(pa.int64()),
                "t": pa.array(ts, pa.int64())})
            return t.group_by(key_col).aggregate([("t", "min")]) \
                .rename_columns([key_col, "t"])
        fold.__name__ = f"funnel_fold_{step}"
        return ds.select_columns([key_col, ts_col, type_col]) \
            .map_batches(fold, batch_format="pyarrow")

    counts = []
    prev = None
    for i, step in enumerate(steps):
        if i == 0:
            cur = narrow(step).groupby(key_col) \
                .aggregate(Min("t", alias_name="t"))
        else:
            def fold2(b: pa.Table, _s=step) -> pa.Table:
                t = b.column("t").to_numpy(zero_copy_only=False)
                pt = b.column("prev_t") \
                    .to_numpy(zero_copy_only=False)
                m = (t > pt) & (t <= pt + window_us)
                kept = b.filter(pa.array(m))
                return kept.select([key_col, "t"]) \
                    .group_by(key_col).aggregate([("t", "min")]) \
                    .rename_columns([key_col, "t"])
            fold2.__name__ = f"funnel_window_{step}"
            # the per-step event stream joins the previous stage's
            # (key, t) table; the stage filter needs ALL step events
            # (not the per-block min), so re-fold WITHOUT the
            # in-block min for stages > 0

            def fold_all(b: pa.Table, _s=step) -> pa.Table:
                tv = np.asarray(b.column(type_col).to_pylist(),
                                dtype=object)
                kept = b.filter(pa.array(tv == _s))
                ts = kept.column(ts_col) \
                    .to_numpy(zero_copy_only=False) \
                    .astype("datetime64[us]").view(np.int64)
                return pa.table({
                    key_col: kept.column(key_col).cast(pa.int64()),
                    "t": pa.array(ts, pa.int64())})
            fold_all.__name__ = f"funnel_rows_{step}"
            rows = ds.select_columns([key_col, ts_col, type_col]) \
                .map_batches(fold_all, batch_format="pyarrow") \
                .materialize()
            if rows.count() == 0:
                # no events of this step at all — and Ray 2.49's hash
                # join cannot take an empty side
                counts.extend([0] * (len(steps) - len(counts)))
                break
            # repartition launders zero-row blocks (step-filtered
            # streams produce them), which break the hash join
            rows = rows.repartition(num_partitions)

            def prep(b: pa.Table) -> pa.Table:
                return pa.table({"pk": b.column(key_col),
                                 "prev_t": b.column("t")})
            prep.__name__ = "funnel_prev_rename"
            prev_n = prev.map_batches(prep, batch_format="pyarrow") \
                .repartition(num_partitions)
            cur = rows.join(prev_n, join_type="inner",
                            num_partitions=num_partitions,
                            on=(key_col,), right_on=("pk",)) \
                .map_batches(fold2, batch_format="pyarrow") \
                .groupby(key_col) \
                .aggregate(Min("t", alias_name="t"))
        prev = cur.materialize()
        counts.append(prev.count())
        if counts[-1] == 0:
            # nobody reached this step — every later step is 0, and
            # joining against the empty stage table would trip
            # Arrow's empty-build-side hash-join failure
            counts.extend([0] * (len(steps) - len(counts)))
            break
    return pa.table({
        "step": pa.array(list(steps), pa.string()),
        "n_keys": pa.array(counts, pa.int64())})


def _funnel_kernel(t: np.ndarray, code: np.ndarray,
                   starts: np.ndarray, k_steps: int,
                   window_us: int) -> np.ndarray:
    """Vectorized strict-sequence funnel over contiguous key
    segments: rows pre-sorted by (key, ts); returns a (k_steps,)
    array of per-step reached counts across the given segments. The
    per-step threshold chain (t_i = min ts of step-i rows strictly
    after t_{i−1} and within the window) is K masked
    minimum.reduceat passes — no per-key Python."""
    INF = np.int64(1) << 62
    counts = np.zeros(k_steps, np.int64)
    if t.size == 0:
        return counts
    seg = np.searchsorted(starts, np.arange(t.size),
                          side="right") - 1
    thr = None
    for i in range(k_steps):
        if i == 0:
            valid = code == 0
        else:
            th_row = thr[seg]
            valid = ((code == i) & (t > th_row)
                     & (t <= th_row + window_us))
        vals = np.where(valid, t, INF)
        ti = np.minimum.reduceat(vals, starts)
        counts[i] = int((ti < INF).sum())
        thr = ti                     # INF thresholds kill later steps
    return counts


def ordered_funnel_sorted(ds, *, key_col: str, ts_col: str,
                          type_col: str, steps: tuple,
                          window_us: int, num_partitions: int = 8,
                          max_run: int = 262144) -> pa.Table:
    """ONE-PASS strict-sequence funnel — same semantics as
    ``ordered_funnel`` (each step strictly after and within
    ``window_us`` of the previous step's time; per-step reached
    counts) but computed in the one-sort sentinel-family shape
    instead of K−1 hash joins + K groupbys: step events fold
    map-side to narrow (key, ts, code) rows, ONE global sort
    co-locates each key, and every block finishes its INTERIOR
    segments with the vectorized K-pass threshold kernel
    (_funnel_kernel — masked minimum.reduceat per step, zero
    per-key Python), emitting one K-row count partial. Only the ≤2
    EDGE runs per block ship their raw step rows to the driver,
    which re-kernels each split key from its concatenated rows —
    O(blocks × edge-run rows) — and adds the counts. An edge run
    longer than ``max_run`` rows raises IN THE WORKER before
    shipping (a bot key with millions of step events needs the
    staged-join hatch, ``ordered_funnel``, which never collects raw
    rows). At scale this saves K−1 full exchanges of the step
    streams plus K stage-table groupbys."""
    from ..io import collect_table

    k_steps = len(steps)

    def fold(b: pa.Table) -> pa.Table:
        tv = b.column(type_col)
        code = np.full(b.num_rows, -1, np.int64)
        for i, s in enumerate(steps):
            code[pc.equal(tv, s).to_numpy(
                zero_copy_only=False)] = i
        keep = code >= 0
        kept = b.filter(pa.array(keep))
        ts = kept.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64())
        return pa.table({
            key_col: kept.column(key_col).cast(pa.int64()),
            "t": ts,
            "code": pa.array(code[keep], pa.int64())})
    fold.__name__ = "funnel_sorted_fold"

    def block_kernel(batch: pa.Table) -> pa.Table:
        names = ["tag", key_col, "t", "code", "n"]
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in names})
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        t = batch.column("t").to_numpy(zero_copy_only=False)
        code = batch.column("code").to_numpy(zero_copy_only=False)
        seg, starts = _key_segments(keys)
        edge = _edge_segment_bounds(batch, key_col)
        edge_rows = []
        interior_mask = np.ones(starts.size, bool)
        for i0, i1 in edge:
            if i1 - i0 > max_run:
                raise ValueError(
                    f"ordered_funnel_sorted: edge run of key "
                    f"{keys[i0]!r} has {i1 - i0} step rows — "
                    f"exceeds max_run={max_run}; use the "
                    "staged-join ordered_funnel hatch")
            interior_mask[int(seg[i0])] = False
            edge_rows.append((i0, i1))
        # interior counts: drop edge segments, re-pack contiguous
        keep_rows = interior_mask[seg]
        if keep_rows.any():
            ti = t[keep_rows]
            ci = code[keep_rows]
            ki = keys[keep_rows]
            _, si = _key_segments(ki)
            counts = _funnel_kernel(ti, ci, si, k_steps, window_us)
        else:
            counts = np.zeros(k_steps, np.int64)
        tag = [0] * k_steps
        kcol = [0] * k_steps
        tcol = [0] * k_steps
        ccol = list(range(k_steps))
        ncol = [int(x) for x in counts]
        for i0, i1 in edge_rows:
            m = i1 - i0
            tag += [1] * m
            kcol += [int(x) for x in keys[i0:i1]]
            tcol += [int(x) for x in t[i0:i1]]
            ccol += [int(x) for x in code[i0:i1]]
            ncol += [0] * m
        return pa.table({
            "tag": pa.array(tag, pa.int64()),
            key_col: pa.array(kcol, pa.int64()),
            "t": pa.array(tcol, pa.int64()),
            "code": pa.array(ccol, pa.int64()),
            "n": pa.array(ncol, pa.int64())})
    block_kernel.__name__ = "funnel_sorted_kernel"

    summ = collect_table(
        ds.select_columns([key_col, ts_col, type_col])
        .map_batches(fold, batch_format="pyarrow")
        .repartition(num_partitions)
        .sort([key_col, "t"])
        .map_batches(block_kernel, batch_format="pyarrow",
                     batch_size=None))
    counts = np.zeros(k_steps, np.int64)
    if summ.num_rows:
        tags = summ.column("tag").to_numpy(zero_copy_only=False)
        part = summ.filter(pa.array(tags == 0))
        np.add.at(counts,
                  part.column("code").to_numpy(
                      zero_copy_only=False),
                  part.column("n").to_numpy(zero_copy_only=False))
        edge = summ.filter(pa.array(tags == 1))
        if edge.num_rows:
            ek = edge.column(key_col).to_numpy(
                zero_copy_only=False)
            et = edge.column("t").to_numpy(zero_copy_only=False)
            ec = edge.column("code").to_numpy(zero_copy_only=False)
            order = np.lexsort((et, ek))
            ek, et, ec = ek[order], et[order], ec[order]
            _, es = _key_segments(ek)
            counts += _funnel_kernel(et, ec, es, k_steps,
                                     window_us)
    return pa.table({
        "step": pa.array(list(steps), pa.string()),
        "n_keys": pa.array([int(x) for x in counts], pa.int64())})


def time_weighted_avg(ds, *, key_col: str, ts_col: str,
                      id_col: str, val_col: str,
                      num_partitions: int = 16):
    """Per-key TIME-WEIGHTED average components — each event's value
    holds until the key's next event, so the TWAP numerator is
    Σ dt·v over consecutive same-key pairs and the denominator is the
    covered time: → (key, num_us_val, den_us) EXACT int64 (val must
    already be integer units; the average derives exactly
    downstream). The LEAD-then-SUM composite computed WITHOUT per-row
    LEAD output — like transition_counts, the pair terms are
    aggregates, so after ONE global sort on (key, ts, id) each block
    folds its consecutive same-key pairs into per-key (num, den)
    partials (np.add.at over run codes, no Python per key) and emits
    only its ≤2 edge-run summaries (key, run-first (ts, id) for
    ordering, run-last (ts, v) for the seam term). A key's rows are
    globally contiguous after the sort, so every cross-block pair is
    between edge runs of NEIGHBORING blocks: the driver sorts the
    O(blocks) summary table and adds one dt·v term per consecutive
    same-key summary pair. ONE key-bounded groupby finishes.
    (ts, id) must be unique per key — duplicates at a seam raise."""
    import ray
    from ray.data.aggregate import Sum

    from ..io import collect_table

    sorted_ds = ds.select_columns([key_col, ts_col, id_col, val_col]) \
        .repartition(num_partitions) \
        .sort([key_col, ts_col, id_col]) \
        .materialize()

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "num": pa.array([], pa.int64()),
                             "den": pa.array([], pa.int64())})
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        same = keys[1:] == keys[:-1]
        dt = (ts[1:] - ts[:-1])[same]
        vv = v[:-1][same]
        ku = np.unique(keys)
        kidx = np.searchsorted(ku, keys[:-1][same])
        num = np.zeros(ku.size, np.int64)
        den = np.zeros(ku.size, np.int64)
        npairs = np.zeros(ku.size, np.int64)
        np.add.at(num, kidx, dt * vv)
        np.add.at(den, kidx, dt)
        np.add.at(npairs, kidx, 1)
        # keep every key with a pair IN THIS BLOCK — not den > 0: a
        # key whose events all share one timestamp (legal under the
        # (ts, id)-unique contract) has pairs with dt = 0 and must
        # still surface as a (key, 0, 0) row, exactly as the oracle's
        # LEAD form does (nxt non-null, nxt - t = 0). Keys without
        # block pairs stay out (their pairs are seam terms or they
        # are single-event keys, absent from the oracle too).
        keep = npairs > 0
        return pa.table({key_col: pa.array(ku[keep], pa.int64()),
                         "num": pa.array(num[keep], pa.int64()),
                         "den": pa.array(den[keep], pa.int64())})
    partials.__name__ = "twa_block_partials"

    def edge_rows(batch: pa.Table) -> pa.Table:
        names = [key_col, "fts", "fid", "lts", "lv"]
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in names})
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = keys.size
        change = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(change)
        runs = [(0, int(starts[1] - 1) if starts.size > 1 else n - 1)]
        if starts.size > 1:
            runs.append((int(starts[-1]), n - 1))
        return pa.table({
            key_col: pa.array([int(keys[s]) for s, _ in runs],
                              pa.int64()),
            "fts": pa.array([int(ts[s]) for s, _ in runs],
                            pa.int64()),
            "fid": pa.array([int(ids[s]) for s, _ in runs],
                            pa.int64()),
            "lts": pa.array([int(ts[e]) for _, e in runs],
                            pa.int64()),
            "lv": pa.array([int(v[e]) for _, e in runs],
                           pa.int64())})
    edge_rows.__name__ = "twa_edge_rows"

    side = collect_table(sorted_ds.map_batches(
        edge_rows, batch_format="pyarrow", batch_size=None))
    seam = pa.table({key_col: pa.array([], pa.int64()),
                     "num": pa.array([], pa.int64()),
                     "den": pa.array([], pa.int64())})
    if side.num_rows:
        k = side.column(key_col).to_numpy(zero_copy_only=False)
        fts = side.column("fts").to_numpy(zero_copy_only=False)
        fid = side.column("fid").to_numpy(zero_copy_only=False)
        lts = side.column("lts").to_numpy(zero_copy_only=False)
        lv = side.column("lv").to_numpy(zero_copy_only=False)
        order = np.lexsort((fid, fts, k))
        k, fts, fid = k[order], fts[order], fid[order]
        lts, lv = lts[order], lv[order]
        pair = k[1:] == k[:-1]
        if (pair & (fts[1:] == fts[:-1])
                & (fid[1:] == fid[:-1])).any():
            raise ValueError(
                "time_weighted_avg requires (key, ts, id) unique — "
                "duplicate ordering tuple at a block seam")
        dt = (fts[1:] - lts[:-1])[pair]
        vv = lv[:-1][pair]
        seam = pa.table({
            key_col: pa.array(k[1:][pair], pa.int64()),
            "num": pa.array(dt * vv, pa.int64()),
            "den": pa.array(dt, pa.int64())})

    parts = sorted_ds.map_batches(partials, batch_format="pyarrow",
                                  batch_size=None)
    if seam.num_rows:
        parts = parts.union(ray.data.from_arrow(seam))
    return parts.groupby(key_col) \
        .aggregate(Sum("num", alias_name="num_us_val"),
                   Sum("den", alias_name="den_us"))


def transition_counts(ds, *, key_col: str, ts_col: str, id_col: str,
                      val_col: str, num_partitions: int = 16):
    """Per-key Markov TRANSITION counts — for every consecutive pair
    of events of the same key (ordered by (ts, id)), count
    (prev value → cur value). → pyarrow Table (prev, cur, n). The
    LAG-then-GROUP-BY composite, produced WITHOUT per-row LAG output:
    transitions are aggregates, so blocks emit ≤ |V|² count partials
    plus O(1) edge rows and the corpus never shuffles a second time.

    Scale shape (window-family contract): the value dictionary is
    collected once (bounded — event-type-like vocabularies) and
    broadcast; rows fold to four int64 columns BEFORE the ONE global
    sort on (key, ts_us, id); each sorted block counts its
    consecutive-row transitions with one bincount over packed
    prev·V+cur and emits its ≤2-per-block edge-run summaries (first
    run / last run: key, first (ts, id), first/last codes). A key's
    rows are globally contiguous after the sort, so every cross-block
    adjacency is between edge runs of neighboring blocks; the driver
    sorts the O(blocks) edge table by (key, ts, id) and adds one
    transition per consecutive same-key pair. (ts, id) must be unique
    per key (unique ids suffice) — duplicate edge orderings raise."""
    import ray
    from ray.data.aggregate import Sum  # noqa: F401 (partials only)

    from ..io import collect_table

    def vocab_partial(b: pa.Table) -> pa.Table:
        if val_col not in b.schema.names or b.num_rows == 0:
            # empty blocks arrive SCHEMA-LESS on Ray 2.49
            return pa.table({"v": pa.array([], pa.string())})
        u = pc.unique(b.column(val_col))
        return pa.table({"v": u.cast(pa.string())})

    vt = collect_table(ds.select_columns([val_col]).map_batches(
        vocab_partial, batch_format="pyarrow"))
    vocab = np.asarray(
        sorted(set(vt.column("v").to_pylist()))
        if "v" in vt.schema.names else [], dtype=object)
    V = vocab.size
    if V == 0:                       # empty input: nothing to count
        return pa.table({"prev": pa.array([], pa.string()),
                         "cur": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    vhandle = ray.put(vocab)

    def narrow(b: pa.Table) -> pa.Table:
        vs = ray.get(vhandle)
        vals = np.asarray(b.column(val_col).to_pylist(), dtype=object)
        code = np.searchsorted(vs, vals)
        ts = b.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        return pa.table({
            key_col: b.column(key_col).cast(pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            id_col: b.column(id_col).cast(pa.int64()),
            "code": pa.array(code.astype(np.int64), pa.int64())})
    narrow.__name__ = "transition_narrow"

    cols = ["kind", "a", "b", "c", "d", "e"]

    def per_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in cols})
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        code = batch.column("code").to_numpy(zero_copy_only=False)
        n = keys.size
        same = keys[1:] == keys[:-1]
        pairs = code[:-1][same] * V + code[1:][same]
        bc = np.bincount(pairs, minlength=V * V)
        nz = np.flatnonzero(bc)
        # edge runs: first and last key-run of the block
        change = np.r_[True, ~same]
        starts = np.flatnonzero(change)
        run_rows = []
        last_start = starts[-1]
        edges = [(0, int(starts[1] - 1 if starts.size > 1 else n - 1))]
        if starts.size > 1:
            edges.append((int(last_start), n - 1))
        for s, e in edges:
            run_rows.append((1, int(keys[s]), int(ts[s]), int(ids[s]),
                             int(code[s]), int(code[e])))
        kind = [0] * nz.size + [r[0] for r in run_rows]
        a = list(nz // V) + [r[1] for r in run_rows]
        bb = list(nz % V) + [r[2] for r in run_rows]
        c = list(bc[nz]) + [r[3] for r in run_rows]
        d = [0] * nz.size + [r[4] for r in run_rows]
        e_ = [0] * nz.size + [r[5] for r in run_rows]
        return pa.table({
            "kind": pa.array(kind, pa.int64()),
            "a": pa.array(a, pa.int64()),
            "b": pa.array(bb, pa.int64()),
            "c": pa.array(c, pa.int64()),
            "d": pa.array(d, pa.int64()),
            "e": pa.array(e_, pa.int64())})
    per_block.__name__ = "transition_block"

    parts = collect_table(
        ds.select_columns([key_col, ts_col, id_col, val_col])
        .map_batches(narrow, batch_format="pyarrow")
        .repartition(num_partitions)
        .sort([key_col, "ts_us", id_col])
        .map_batches(per_block, batch_format="pyarrow",
                     batch_size=None))

    kind = parts.column("kind").to_numpy(zero_copy_only=False)
    a = parts.column("a").to_numpy(zero_copy_only=False)
    b = parts.column("b").to_numpy(zero_copy_only=False)
    c = parts.column("c").to_numpy(zero_copy_only=False)
    d = parts.column("d").to_numpy(zero_copy_only=False)
    e = parts.column("e").to_numpy(zero_copy_only=False)
    mat = np.zeros((V, V), dtype=np.int64)
    cm = kind == 0
    np.add.at(mat, (a[cm], b[cm]), c[cm])
    em = ~cm
    ek, ets, eid = a[em], b[em], c[em]
    efirst, elast = d[em], e[em]
    order = np.lexsort((eid, ets, ek))
    ek, ets, eid = ek[order], ets[order], eid[order]
    efirst, elast = efirst[order], elast[order]
    adj = ek[1:] == ek[:-1]
    if np.any(adj & (ets[1:] == ets[:-1]) & (eid[1:] == eid[:-1])):
        raise ValueError("duplicate (key, ts, id) at block boundary — "
                         "transition order would be nondeterministic")
    np.add.at(mat, (elast[:-1][adj], efirst[1:][adj]), 1)
    pnz = np.nonzero(mat)
    return pa.table({
        "prev": pa.array(vocab[pnz[0]].tolist(), pa.string()),
        "cur": pa.array(vocab[pnz[1]].tolist(), pa.string()),
        "n": pa.array(mat[pnz], pa.int64())})


def windowed_range_sum(ds, *, key_col: str, ts_col: str, id_col: str,
                       val_col: str, window_us: int,
                       num_partitions: int = 16):
    """Time-based moving window — ``SUM(val) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN <W> PRECEDING AND CURRENT ROW)`` —
    completing the frame-type family (ROWS frames:
    windowed_rolling_sum; RANGE frames: here). → (id, roll) per row,
    window boundary inclusive (ts ≥ t−W), int64 values.

    Scale shape: rows fold to four int64 columns before ONE global
    sort on (key, ts, id) and are materialized once; two zero-shuffle
    maps over the SAME blocks (batch_size=None) finish everything.
    In-block sums are one prefix-cumsum + ONE packed searchsorted
    (run·span + ts-offset composite, so no per-key Python; falls back
    to a per-run loop only if the packing would overflow int64 —
    pathological ts ranges). Cross-block windows: each block's last
    run emits its trailing rows within W of the run end — provably
    sufficient for every later row of that key, since a later row's
    window start t−W ≥ (that block's last ts)−W — the driver
    broadcasts the per-key sorted tails with prefix sums, and only
    each block's FIRST run (the only possible continuation, keys
    being globally contiguous after the sort) adds its pre-block
    contribution via two searchsorteds. Tail volume is bounded by
    key×window row density (the range_join bound class), not corpus
    size.

    Contract: (key, ts) unique — RANGE peers would otherwise need
    merging; duplicates in a block or across a boundary raise."""
    import ray

    from ..io import collect_table

    def narrow(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        return pa.table({
            key_col: b.column(key_col).cast(pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            id_col: b.column(id_col).cast(pa.int64()),
            "v": b.column(val_col).cast(pa.int64())})
    narrow.__name__ = "range_narrow"

    sorted_ds = ds.select_columns([key_col, ts_col, id_col, val_col]) \
        .map_batches(narrow, batch_format="pyarrow") \
        .repartition(num_partitions) \
        .sort([key_col, "ts_us", id_col]) \
        .materialize()  # tail + scoring passes must see SAME blocks

    def _runs(keys: np.ndarray):
        change = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        return starts, run_id

    def _check_unique(keys, ts):
        if keys.size > 1 and np.any((keys[1:] == keys[:-1])
                                    & (ts[1:] == ts[:-1])):
            raise ValueError("duplicate (key, ts) — RANGE window "
                             "peers are not mergeable here")

    def tails(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        _check_unique(keys, ts)
        starts, _ = _runs(keys)
        s = starts[-1]  # last run only — the only continuable run
        seg_ts = ts[s:]
        lo = s + np.searchsorted(seg_ts, seg_ts[-1] - window_us,
                                 side="left")
        return pa.table({"k": pa.array(keys[lo:], pa.int64()),
                         "t": pa.array(ts[lo:], pa.int64()),
                         "v": pa.array(v[lo:], pa.int64())})
    tails.__name__ = "range_tails"

    tt = collect_table(sorted_ds.map_batches(
        tails, batch_format="pyarrow", batch_size=None))
    tk = tt.column("k").to_numpy(zero_copy_only=False)
    tts = tt.column("t").to_numpy(zero_copy_only=False)
    tv = tt.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((tts, tk))
    tk, tts, tv = tk[order], tts[order], tv[order]
    if tk.size > 1 and np.any((tk[1:] == tk[:-1])
                              & (tts[1:] == tts[:-1])):
        raise ValueError("duplicate (key, ts) across blocks — RANGE "
                         "window peers are not mergeable here")
    # per-position prefix (global; key ranges sliced by searchsorted)
    tpref = np.concatenate([np.zeros(1, np.int64), np.cumsum(tv)])
    handle = ray.put((tk, tts, tpref))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "roll": pa.array([], pa.int64())})
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        n = keys.size
        starts, run_id = _runs(keys)
        pref = np.concatenate([np.zeros(1, np.int64), np.cumsum(v)])
        # in-block window start index per row: packed searchsorted
        run_min = ts[starts]
        off = ts - run_min[run_id]
        span = int(off.max()) + window_us + 1 if n else 1
        q_off = np.maximum(off - window_us, 0)
        n_runs = starts.size
        if span > 0 and n_runs * span < (1 << 62):
            packed = run_id * span + off
            lo = np.searchsorted(packed, run_id * span + q_off,
                                 side="left")
        else:  # pathological ts range: per-run fallback
            lo = np.empty(n, dtype=np.int64)
            ends = np.append(starts[1:], n)
            for i in range(n_runs):
                s, e = starts[i], ends[i]
                lo[s:e] = s + np.searchsorted(
                    ts[s:e], ts[s:e] - window_us, side="left")
        roll = pref[np.arange(n) + 1] - pref[lo]
        # pre-block contribution for the FIRST run only
        ks, tss, tp = ray.get(handle)
        k0 = keys[0]
        e0 = starts[1] if starts.size > 1 else n
        a = np.searchsorted(ks, k0, side="left")
        bz = np.searchsorted(ks, k0, side="right")
        if bz > a:
            seg = tss[a:bz]
            hi = int(np.searchsorted(seg, ts[0], side="left"))
            # tails may legitimately contain ts[0] ONCE: this block's
            # own tail, when the block is a single run whose window
            # reaches row 0. Any extra equal entry is a cross-block
            # duplicate (the previous block's last row is always in
            # its own tail, so a boundary duplicate is always seen).
            own = int(starts.size == 1
                      and ts[-1] - window_us <= ts[0])
            eq = int(np.searchsorted(seg, ts[0], side="right")) - hi
            if eq > own:
                raise ValueError("duplicate (key, ts) at a block "
                                 "boundary")
            qlo = np.searchsorted(seg, ts[:e0] - window_us,
                                  side="left")
            qlo = np.minimum(qlo, hi)
            roll[:e0] += tp[a + hi] - tp[a + qlo]
        return pa.table({id_col: batch.column(id_col),
                         "roll": pa.array(roll, pa.int64())})
    score.__name__ = "range_score"

    return sorted_ds.map_batches(score, batch_format="pyarrow",
                                 batch_size=None)


def interval_union(ds, *, key_col: str, ts_col: str, id_col: str,
                   dur_col: str, num_partitions: int = 16):
    """Per-key interval UNION — the gaps-and-islands class: merge each
    key's overlapping-or-touching ``[ts, ts+dur)`` intervals and
    return ``(key, n_islands, covered_us)``. The SQL form is the
    running-max window (``max(e) OVER (... ROWS UNBOUNDED PRECEDING
    AND 1 PRECEDING)``); a segmented running MAX has no exact
    vectorized reset trick, so instead each interval expands map-side
    into two ±1 boundary EVENTS and the whole problem becomes a
    segmented running SUM — which the windowed_cumsum machinery
    already solves hot-key-safely (ONE global sort, per-block
    vectorized cumsum, ≤2 edge-summary rows per block, broadcast-base
    fixup — a key spanning B blocks never lands in one task).

    Start events sort BEFORE coincident end events (kind 0 < 1), so
    touching intervals (e == next s) keep the active count positive
    and merge — exactly the SQL running-max semantics. Coverage and
    island counts then need NO further shuffle: per block, dt-to-next
    × [active>0] accumulates into int64 per-key partials (np.add.at —
    exact, no float accumulation) and island starts are purely per-row
    (delta=+1 ∧ active==1); the only cross-block term is the dt
    spanning a block boundary, handled by an O(2·blocks) first/last
    edge-event table paired driver-side (transition_counts' bound
    class — a key's final event always has active==0, so a seam where
    the key changes contributes nothing, asserted). Output rows are
    key-bounded; ONE groupby(key) sums the partials.

    Contract: ``dur_col`` int64 µs > 0; ``id_col`` unique, < 2^62
    (packed ×2 with the boundary kind for the sort tiebreak);
    ``key_col`` integer-typed (the driver-side seam pairing lexsorts
    it — dictionary-encode string keys first).
    """
    import ray  # noqa: F401  (windowed_cumsum owns the broadcast)

    from ..io import collect_table

    def expand(b: pa.Table) -> pa.Table:
        if key_col not in b.schema.names or b.num_rows == 0:
            # empty input blocks can arrive SCHEMA-LESS (Ray 2.49)
            e = pa.array([], pa.int64())
            return pa.table({key_col: e, "t": e, "kind": e,
                             "uid": e, "delta": e})
        if not pa.types.is_integer(b.schema.field(key_col).type):
            raise ValueError("interval_union requires an integer key "
                             "column (dictionary-encode strings)")
        t = b.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        dur = b.column(dur_col).to_numpy(zero_copy_only=False)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        if dur.size and (int(dur.min()) <= 0):
            raise ValueError("interval durations must be > 0")
        if ids.size and (int(ids.min()) < 0
                         or int(ids.max()) >= 2**62):
            raise ValueError("interval ids must be in [0, 2^62)")
        n = b.num_rows
        kc = b.select([key_col])
        kind = np.concatenate([np.zeros(n, np.int64),
                               np.ones(n, np.int64)])
        return pa.table({
            key_col: pa.concat_tables([kc, kc]).column(key_col),
            "t": pa.array(np.concatenate([t, t + dur]), pa.int64()),
            "kind": pa.array(kind, pa.int64()),
            "uid": pa.array(
                np.concatenate([ids, ids]) * 2 + kind, pa.int64()),
            "delta": pa.array(
                np.concatenate([np.ones(n, np.int64),
                                -np.ones(n, np.int64)]), pa.int64())})
    expand.__name__ = "interval_expand"

    events = ds.select_columns([key_col, ts_col, id_col, dur_col]) \
        .map_batches(expand, batch_format="pyarrow")
    act = windowed_cumsum(
        events, key_col=key_col, order_cols=["t", "kind", "uid"],
        val_col="delta", out_col="active",
        num_partitions=num_partitions).materialize()

    def edge_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int64()),
                             "uid": pa.array([], pa.int64()),
                             "active": pa.array([], pa.int64()),
                             "tag": pa.array([], pa.int64())})
        idx = pa.array([0, batch.num_rows - 1])
        sl = batch.select([key_col, "t", "kind", "uid", "active"]) \
            .take(idx)
        return sl.append_column("tag", pa.array([0, 1], pa.int64()))
    edge_rows.__name__ = "interval_edge_rows"

    summ = collect_table(act.map_batches(
        edge_rows, batch_format="pyarrow", batch_size=None))
    if summ.num_columns == 0 or summ.num_rows == 0:
        # empty input (collect of all-empty blocks is schema-less)
        e = pa.array([], pa.int64())
        import ray as _ray
        return _ray.data.from_arrow(pa.table({
            key_col: e, "n_islands": e, "covered_us": e}))
    ek = summ.column(key_col).to_numpy(zero_copy_only=False)
    et = summ.column("t").to_numpy(zero_copy_only=False)
    ekind = summ.column("kind").to_numpy(zero_copy_only=False)
    euid = summ.column("uid").to_numpy(zero_copy_only=False)
    eact = summ.column("active").to_numpy(zero_copy_only=False)
    etag = summ.column("tag").to_numpy(zero_copy_only=False)
    order = np.lexsort((etag, euid, ekind, et, ek))
    extra: dict = {}
    for i in range(order.size - 1):
        a, bnext = order[i], order[i + 1]
        if etag[a] != 1 or etag[bnext] != 0:
            continue  # only last→first seams span blocks
        if ek[a] != ek[bnext]:
            if eact[a] != 0:
                raise ValueError(
                    "active count nonzero at a key's final event — "
                    "corrupt interval stream")
            continue
        if eact[a] > 0:
            extra[int(ek[a])] = extra.get(int(ek[a]), 0) \
                + int(et[bnext] - et[a])

    def cov_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "n_islands": pa.array([], pa.int64()),
                             "covered_us": pa.array([], pa.int64())})
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        t = batch.column("t").to_numpy(zero_copy_only=False)
        d = batch.column("delta").to_numpy(zero_copy_only=False)
        a = batch.column("active").to_numpy(zero_copy_only=False)
        seg, starts = _key_segments(k)
        nseg = int(seg[-1]) + 1
        cov = np.zeros(nseg, np.int64)
        if k.size > 1:
            same = (k[1:] == k[:-1]) & (a[:-1] > 0)
            dt = (t[1:] - t[:-1])[same]
            np.add.at(cov, seg[:-1][same], dt)
        isl = np.bincount(seg[(d == 1) & (a == 1)],
                          minlength=nseg).astype(np.int64)
        return pa.table({
            key_col: batch.column(key_col).take(pa.array(starts)),
            "n_islands": pa.array(isl, pa.int64()),
            "covered_us": pa.array(cov, pa.int64())})
    cov_partial.__name__ = "interval_cov_partial"

    partials = act.map_batches(cov_partial, batch_format="pyarrow",
                               batch_size=None)
    if extra:
        boundary = pa.table({
            key_col: pa.array(list(extra.keys()), pa.int64()),
            "n_islands": pa.array([0] * len(extra), pa.int64()),
            "covered_us": pa.array(list(extra.values()), pa.int64())})
        partials = partials.union(ray.data.from_arrow(boundary))

    from ray.data.aggregate import Sum
    return partials.groupby(key_col).aggregate(
        Sum("n_islands", alias_name="n_islands"),
        Sum("covered_us", alias_name="covered_us"))


def rolling_distinct_count(ds, *, key_col: str, day_col: str,
                           window: int = 7) -> pa.Table:
    """Trailing-window COUNT(DISTINCT key) per day — the
    NON-DECOMPOSABLE window-distinct class (7-day rolling active
    users / WAU): for every day that appears in the data, how many
    distinct keys had at least one row in ``[day-window+1, day]``.
    The SQL form is a range self-join (``e.day BETWEEN d.day-6 AND
    d.day`` + COUNT DISTINCT), which at corpus scale re-scans every
    event ``window`` times; distinct counts don't merge across
    overlapping windows, so no partial-aggregate trick applies
    directly.

    The distributed shape avoids both the self-join and any
    per-window distinct state via interval coverage (the
    difference-array / sweep trick): a key with sorted distinct
    event days e_1 < e_2 < … covers the window ending at day t iff
    some e_i ∈ (t-window, t], i.e. t ∈ ∪ [e_i, e_i+window-1]; with
    the e_i sorted that union rewrites as DISJOINT runs
    [e_i, min(e_{i+1}, e_i+window) - 1], so the rolling count for
    day t is just the number of interval starts minus ends ≤ t — a
    single prefix sum over a ±1 difference array.

    Plan: per-block DISTINCT (key, day) Arrow group_by shrinks the
    stream to unique pairs before the only shuffle; ONE global sort
    on (key, day) makes each key's day list a contiguous run; a
    segment kernel (interior runs zero-shuffle, ≤2 edge runs per
    block re-kerneled driver-side via data/segments.py
    finish_sorted_runs) dedups cross-block pair duplicates, computes
    each row's in-run lead day, and folds the ±1 boundary events
    per block with np.add.at into (day, delta, starts) partials.
    The driver finish is a prefix sum over the dense day span.

    Partitioning assumption (the collect bound): per-block partials
    and the final table are bounded by the corpus DAY SPAN (+window),
    never by rows or keys — O(blocks × span) driver rows. ``starts``
    marks days that actually appear in the data (every distinct
    (key, day) opens an interval at its own day), so observed days
    need no second pass. All-integer; returns a pa.Table
    ``(day_i:int64, n_distinct:int64)`` over observed days only.

    Contract: ``key_col``/``day_col`` int64; day values must fit
    |day| < 2^40 (loud check) so ``day + window`` cannot wrap the
    int64 sentinel arithmetic; ``window`` ≥ 1.
    """
    from .segments import finish_sorted_runs

    if window < 1:
        raise ValueError("rolling_distinct_count: window must be >= 1")
    _FAR = np.int64(2 ** 62)

    def distinct_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            e = pa.array([], pa.int64())
            return pa.table({"k": e, "d": e})
        t = pa.table({"k": b.column(key_col).cast(pa.int64()),
                      "d": b.column(day_col).cast(pa.int64())})
        return t.group_by(["k", "d"]).aggregate([])
    distinct_pairs.__name__ = f"distinct_{key_col}_{day_col}_pairs"

    _empty = pa.table({"day_i": pa.array([], pa.int64()),
                       "delta": pa.array([], pa.int64()),
                       "starts": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        """±1 coverage boundaries over a (k, d)-sorted slice of
        COMPLETE key runs, folded per distinct boundary day."""
        k, d = cols["k"], cols["d"]
        if k.size == 0:
            return _empty
        if int(np.abs(d).max()) >= 2 ** 40:
            raise ValueError("rolling_distinct_count: day values "
                             "must satisfy |day| < 2^40")
        keep = np.ones(k.size, dtype=bool)   # cross-block pair dups
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        run_end = np.ones(k.size, dtype=bool)
        run_end[:-1] = k[1:] != k[:-1]
        nxt = np.empty_like(d)
        nxt[:-1] = d[1:]
        nxt[run_end] = _FAR
        end1 = np.minimum(nxt, d + window)   # first uncovered day
        days = np.concatenate([d, end1])
        delta = np.concatenate([np.ones(d.size, np.int64),
                                np.full(d.size, -1, np.int64)])
        starts = np.concatenate([np.ones(d.size, np.int64),
                                 np.zeros(d.size, np.int64)])
        ud, inv = np.unique(days, return_inverse=True)
        dd = np.zeros(ud.size, np.int64)
        np.add.at(dd, inv, delta)
        ss = np.zeros(ud.size, np.int64)
        np.add.at(ss, inv, starts)
        nz = (dd != 0) | (ss != 0)
        return pa.table({"day_i": pa.array(ud[nz], pa.int64()),
                         "delta": pa.array(dd[nz], pa.int64()),
                         "starts": pa.array(ss[nz], pa.int64())})

    merged = ds.map_batches(distinct_pairs, batch_format="pyarrow") \
        .sort(["k", "d"])
    part = finish_sorted_runs(
        merged, key_col="k", order_cols=["d"], int_cols=["k", "d"],
        kernel=kernel, empty_partial=_empty)

    out_empty = pa.table({"day_i": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64())})
    if part.num_rows == 0:
        return out_empty
    days = part.column("day_i").to_numpy(zero_copy_only=False)
    delta = part.column("delta").to_numpy(zero_copy_only=False)
    starts = part.column("starts").to_numpy(zero_copy_only=False)
    ud, inv = np.unique(days, return_inverse=True)
    dd = np.zeros(ud.size, np.int64)
    np.add.at(dd, inv, delta)
    ss = np.zeros(ud.size, np.int64)
    np.add.at(ss, inv, starts)
    lo = int(ud.min())
    span = int(ud.max()) - lo + 1            # day-span bounded
    dense = np.zeros(span, np.int64)
    dense[ud - lo] = dd
    running = np.cumsum(dense)
    obs = ud[ss > 0]
    if obs.size == 0:
        return out_empty
    return pa.table({
        "day_i": pa.array(obs, pa.int64()),
        "n_distinct": pa.array(running[obs - lo], pa.int64())})


def rolling_quantile_disc(ds, *, day_col: str, val_col: str,
                          window: int = 7, pct: int = 95) -> pa.Table:
    """Trailing-window DISCRETE quantile per observed day — the
    rolling-P95 dashboard statistic (7-day rolling 95th percentile of
    a latency/value column), completing the rolling family
    (sum/count/distinct exist; quantiles don't merge across windows
    any more than distincts do). Exact and all-integer: the rolling
    p-th percentile for day t is the smallest v in the merged
    histogram of days [t-window+1, t] with 100·cum(v) ≥ pct·W.

    Shape: per-block (day, v) count partials collapse duplicates
    before the only shuffle; ONE narrow groupby finishes the global
    (day, v) histogram; the driver then slides a count array over the
    sorted value domain — add day t's counts, drop day t-window's —
    answering each observed day with one cumsum+searchsorted. The
    collect and driver work are O(day-span × distinct values) — the
    same value-domain bound grouped_quantiles accepts, never corpus
    rows. Returns pa.Table (day_i:int64, q:int64) over observed days.
    """
    from ray.data.aggregate import Sum

    from ..io import collect_table

    if not (1 <= pct <= 100):
        raise ValueError("rolling_quantile_disc: pct must be 1..100")

    def hist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or day_col not in b.schema.names:
            e = pa.array([], pa.int64())
            return pa.table({"day": e, "v": e, "n": e})
        t = pa.table({"day": b.column(day_col).cast(pa.int64()),
                      "v": b.column(val_col).cast(pa.int64()),
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(["day", "v"]).aggregate([("n", "sum")]) \
            .rename_columns(["day", "v", "n"])
    hist.__name__ = f"rqhist_{day_col}_{val_col}"

    agg = collect_table(
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["day", "v"]).aggregate(Sum("n", alias_name="n")))
    out_empty = pa.table({"day_i": pa.array([], pa.int64()),
                          "q": pa.array([], pa.int64())})
    if agg.num_columns == 0 or agg.num_rows == 0:
        return out_empty
    day = agg.column("day").to_numpy(zero_copy_only=False)
    v = agg.column("v").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    vals = np.unique(v)                      # sorted value domain
    vix = np.searchsorted(vals, v)
    lo, hi = int(day.min()), int(day.max())
    order = np.argsort(day, kind="stable")
    day, vix, n = day[order], vix[order], n[order]
    dstarts = np.searchsorted(day, np.arange(lo, hi + 2))
    obs_days, qs = [], []
    cnt = np.zeros(vals.size, np.int64)
    for t in range(lo, hi + 1):
        s, e = dstarts[t - lo], dstarts[t - lo + 1]
        np.add.at(cnt, vix[s:e], n[s:e])
        drop = t - window
        if drop >= lo:
            ds_, de_ = dstarts[drop - lo], dstarts[drop - lo + 1]
            np.subtract.at(cnt, vix[ds_:de_], n[ds_:de_])
        if e > s:                            # observed day
            cum = np.cumsum(cnt)
            w = int(cum[-1])
            target = (pct * w + 99) // 100
            j = int(np.searchsorted(cum, target))
            obs_days.append(t)
            qs.append(int(vals[j]))
    if not obs_days:
        return out_empty
    return pa.table({
        "day_i": pa.array(np.array(obs_days, np.int64)),
        "q": pa.array(np.array(qs, np.int64))})


def grouped_max_streak(ds, *, key_col: str, day_col: str) -> pa.Table:
    """Longest run of CONSECUTIVE days per key — the classic
    GAPS-AND-ISLANDS class (longest daily-activity streak per user:
    the engagement metric every retention dashboard carries). The
    SQL form is the island trick (day − ROW_NUMBER() per key is
    constant within an island) — two window passes plus two
    groupbys; the engine shape is the rolling_distinct_count plan:
    per-block DISTINCT (key, day) Arrow group_by shrinks the stream
    to unique pairs before the only shuffle, ONE global sort on
    (key, day) makes each key's day list a contiguous run, and a
    segment kernel (data/segments.py finish_sorted_runs: interior
    runs zero-shuffle, ≤2 edge runs per block re-kerneled
    driver-side) folds each run straight to its per-key answer —
    streak starts are one vectorized diff, lengths one bincount,
    per-key maxima one maximum.reduceat. Interior keys are COMPLETE
    by contiguity so their partial row IS the final row; boundary
    keys finish through the same kernel on the driver — the output
    needs no further merge.

    Partitioning assumption (the collect bound): a boundary key
    ships its distinct days, so the driver edge collect is
    O(blocks × per-key distinct days) ≤ O(blocks × day span) —
    calendar-bounded, never corpus rows. Cross-block duplicate
    pairs (the per-block distinct can re-emit a pair) dedup inside
    the kernel. All-integer. Contract: |day| < 2^40 (loud check)
    so day diffs cannot wrap. Returns (key, streak) int64."""
    from .segments import finish_sorted_runs

    def distinct_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            e = pa.array([], pa.int64())
            return pa.table({"k": e, "d": e})
        t = pa.table({"k": b.column(key_col).cast(pa.int64()),
                      "d": b.column(day_col).cast(pa.int64())})
        return t.group_by(["k", "d"]).aggregate([])
    distinct_pairs.__name__ = f"streak_{key_col}_{day_col}_pairs"

    _empty = pa.table({"k": pa.array([], pa.int64()),
                       "streak": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        k, d = cols["k"], cols["d"]
        if k.size == 0:
            return _empty
        if int(np.abs(d).max()) >= 2 ** 40:
            raise ValueError("grouped_max_streak: day values must "
                             "satisfy |day| < 2^40")
        keep = np.ones(k.size, dtype=bool)   # cross-block pair dups
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        start = np.ones(k.size, dtype=bool)  # island starts
        start[1:] = (k[1:] != k[:-1]) | (d[1:] - d[:-1] != 1)
        sid = np.cumsum(start) - 1
        lens = np.bincount(sid).astype(np.int64)
        skey = k[start]
        kstart = np.ones(skey.size, dtype=bool)
        kstart[1:] = skey[1:] != skey[:-1]
        mx = np.maximum.reduceat(lens, np.flatnonzero(kstart))
        return pa.table({"k": pa.array(skey[kstart], pa.int64()),
                         "streak": pa.array(mx, pa.int64())})

    merged = ds.map_batches(distinct_pairs, batch_format="pyarrow") \
        .sort(["k", "d"])
    return finish_sorted_runs(
        merged, key_col="k", order_cols=["d"], int_cols=["k", "d"],
        kernel=kernel, empty_partial=_empty)

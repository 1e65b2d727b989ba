"""Distributed as-of join (point-in-time lookup) for Ray Data.

The reference engine has no temporal join; this is part of the
training-data operator surface (feature backfill: "attach the latest
fact row at or before each event's timestamp").

Shape — the same one-global-sort + vectorized-block + tiny-edge-fixup
used by data/windows.py sessionize: tag both sides, union them into a
single narrow stream, ONE ``sort((key, ts, side, tie))`` co-locates
and orders each key's rows, then every block resolves its left rows
with a numpy forward-fill (no per-key Python). Rows whose match could
live in an earlier block — only UNMATCHED left rows of each block's
FIRST key run — are resolved by a ZERO-SHUFFLE broadcast lookup: the
O(num_blocks) per-block trailing rights are collected once, sorted by
(key, ts, tie) driver-side, and each unmatched left searchsorts into
them in place (they are sufficient — any right in an earlier block
sorts before the left, so its ts is ≤ the left's, and each block's
per-key max right dominates its others for every later-block left).

Partitioning assumption: a single key's rows may span blocks freely;
fixup cost is O(num_blocks) driver state plus one vectorized pass
over the unmatched lefts — never a per-key task holding a hot key's
whole row set (the straggler/OOM mode of a groupby fixup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_I64 = pa.int64()


def _ts_to_i64(col):
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.timestamp("ns")).cast(_I64)
    return col.cast(_I64)


def asof_join(left, right, *, left_on: str, right_on: str,
              left_ts: str, right_ts: str, payload: list[str],
              left_cols: list[str], tie: str,
              num_partitions: int = 16):
    """For each left row: the right row with equal key and
    ``right_ts <= left_ts`` maximizing (right_ts, tie) — i.e. a
    backward as-of join with a deterministic tie-break. Returns
    ``left_cols`` (timestamps carried as int64 ns — callers cast
    back) + ``matched_<payload>`` columns, null when no right row
    qualifies. ``tie`` must be one of ``payload``.
    """
    assert tie in payload
    rtypes = {f.name: f.type for f in right.schema().base_schema}

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "k": batch.column(left_on).cast(_I64),
            "t": _ts_to_i64(batch.column(left_ts)),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "tie_o": pa.nulls(n, _I64),
        }
        for c in payload:
            cols[f"r_{c}"] = pa.nulls(n, rtypes[c])
        for c in left_cols:
            col = batch.column(c)
            cols[f"l_{c}"] = _ts_to_i64(col) \
                if pa.types.is_timestamp(col.type) else col
        return pa.table(cols)
    tag_left.__name__ = "tag_left"

    # left carry-col types after the timestamp normalization above
    ltypes = {f.name: (_I64 if pa.types.is_timestamp(f.type)
                       else f.type)
              for f in left.schema().base_schema}

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "k": batch.column(right_on).cast(_I64),
            "t": _ts_to_i64(batch.column(right_ts)),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "tie_o": batch.column(tie).cast(_I64),
        }
        for c in payload:
            cols[f"r_{c}"] = batch.column(c)
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(n, ltypes[c])
        return pa.table(cols)
    tag_right.__name__ = "tag_right"

    lt = left.select_columns(
        sorted({left_on, left_ts, *left_cols})) \
        .map_batches(tag_left, batch_format="pyarrow")
    rt = right.select_columns(
        sorted({right_on, right_ts, *payload})) \
        .map_batches(tag_right, batch_format="pyarrow")

    # rights sort BEFORE lefts at equal (k, t) (side 0 < 1) so an
    # equal-timestamp fact is visible to the event; among equal
    # (k, t) rights the max-``tie`` one sorts last and wins the fill.
    # Coalesce the narrow tagged rows to num_partitions blocks first —
    # sorting 100+ input-inherited tiny blocks costs more in sampling
    # and shuffle fragments than the sort itself (same lesson as
    # range_join_count; isolated sf0.1 sort 10.8s -> ~1s)
    merged = lt.union(rt).repartition(num_partitions) \
        .sort(["k", "t", "side", "tie_o"])

    def _masked_take(col, positions: np.ndarray,
                     valid: np.ndarray) -> pa.Array:
        """col[positions] with nulls where ``valid`` is False —
        vectorized (no per-row Python)."""
        safe = np.where(valid, positions, 0)
        taken = pc.take(col, pa.array(safe))
        if valid.all():
            return taken
        return pc.if_else(pa.array(valid), taken,
                          pa.nulls(1, col.type)[0])

    def resolve_block(batch: pa.Table) -> pa.Table:
        """Match lefts in-block; emit resolved rows (kind=0) plus the
        block's first-run unmatched lefts (kind=1) and last-run
        trailing right (kind=2) for the edge fixup."""
        n = batch.num_rows

        def shell(kind, kk, tt, tie_vals, lcols, pcols) -> pa.Table:
            cols = dict(lcols)
            cols.update(pcols)
            cols["kind"] = pa.array(kind, pa.int8())
            cols["k"] = pa.array(kk, _I64)
            cols["t"] = pa.array(tt, _I64)
            cols["tie_o"] = pa.array(tie_vals, _I64)
            return pa.table(cols)

        if n == 0:
            return shell(
                [], [], [], [],
                {c: pa.array([], ltypes[c]) for c in left_cols},
                {f"matched_{c}": pa.array([], rtypes[c])
                 for c in payload})
        k = batch.column("k").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        idx = np.arange(n, dtype=np.int64)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = k[1:] != k[:-1]
        starts = idx[change]
        run_start = starts[np.cumsum(change) - 1]
        is_right = side == 0
        last_right = np.where(is_right, idx, -1)
        np.maximum.accumulate(last_right, out=last_right)
        matched = np.where(last_right >= run_start, last_right, -1)

        lpos = idx[~is_right]
        lmatch = matched[~is_right]
        first_run_end = starts[1] if starts.size > 1 else n
        unresolved = (lmatch < 0) & (lpos < first_run_end)
        resolved = ~unresolved

        t_arr = batch.column("t").to_numpy(zero_copy_only=False)
        rpos = lpos[resolved]
        rm = lmatch[resolved]
        has = rm >= 0
        parts = [shell(
            np.zeros(rpos.size, dtype=np.int8),
            k[rpos], np.zeros(rpos.size, dtype=np.int64),
            np.zeros(rpos.size, dtype=np.int64),
            {c: pc.take(batch.column(f"l_{c}"), pa.array(rpos))
             for c in left_cols},
            {f"matched_{c}": _masked_take(
                batch.column(f"r_{c}"), rm, has)
             for c in payload})]

        upos = lpos[unresolved]
        if upos.size:
            parts.append(shell(
                np.ones(upos.size, dtype=np.int8),
                k[upos], t_arr[upos],
                np.zeros(upos.size, dtype=np.int64),
                {c: pc.take(batch.column(f"l_{c}"), pa.array(upos))
                 for c in left_cols},
                {f"matched_{c}": pa.nulls(upos.size, rtypes[c])
                 for c in payload}))
        tail = int(last_right[-1])
        if tail >= run_start[-1] and tail >= 0:
            tie_arr = batch.column("tie_o").to_numpy(
                zero_copy_only=False)
            parts.append(shell(
                np.array([2], dtype=np.int8),
                [int(k[tail])], [int(t_arr[tail])],
                [int(tie_arr[tail])],
                {c: pa.nulls(1, ltypes[c]) for c in left_cols},
                {f"matched_{c}": pc.take(batch.column(f"r_{c}"),
                                         pa.array([tail]))
                 for c in payload}))
        return pa.concat_tables(parts)
    resolve_block.__name__ = "asof_resolve_block"

    resolved_all = merged.map_batches(
        resolve_block, batch_format="pyarrow").materialize()

    done = resolved_all.filter(expr="kind == 0") \
        .drop_columns(["kind", "k", "t", "tie_o"])

    # Cross-block resolution WITHOUT a groupby: the kind=2 boundary
    # rights are O(blocks) rows (each block's last-run max right), and
    # they are SUFFICIENT — any right of key k living in a block
    # before a left's block sorts before it, so its timestamp is ≤ the
    # left's, hence each block's per-key max right dominates all its
    # other rights for every later-block left. Collect them once, sort
    # by (k, t, tie) driver-side, broadcast, and resolve the kind=1
    # unmatched lefts with a zero-shuffle searchsorted map. A HOT key
    # whose lefts span many pure-left blocks now costs one vectorized
    # fix per block instead of one task holding every unmatched left
    # (the straggler/OOM mode of the old groupby(k).map_groups fixup).
    import ray

    from ..io import collect_table
    from .windows import _cached_get

    boundary = collect_table(resolved_all.filter(expr="kind == 2"))
    if boundary.num_rows:
        boundary = boundary.sort_by(
            [("k", "ascending"), ("t", "ascending"),
             ("tie_o", "ascending")])
    handle = ray.put(boundary)
    out_cols = [*left_cols, *(f"matched_{c}" for c in payload)]

    def resolve_unmatched(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(out_cols)
        rt_tbl = _cached_get(handle)
        if rt_tbl.num_rows == 0:
            return batch.select(out_cols)  # matched_* already null
        rk = rt_tbl.column("k").to_numpy(zero_copy_only=False)
        rts = rt_tbl.column("t").to_numpy(zero_copy_only=False)
        ks = batch.column("k").to_numpy(zero_copy_only=False)
        ts = batch.column("t").to_numpy(zero_copy_only=False)
        pos = np.full(ks.size, -1, dtype=np.int64)
        for key in np.unique(ks):  # ≤ distinct keys per block (≈1:
            # kind=1 rows come from each source block's FIRST run)
            msk = ks == key
            lo = np.searchsorted(rk, key, side="left")
            hi = np.searchsorted(rk, key, side="right")
            if hi > lo:
                p = lo + np.searchsorted(rts[lo:hi], ts[msk],
                                         side="right") - 1
                p[p < lo] = -1
                pos[msk] = p
        has = pos >= 0
        cols = {c: batch.column(c) for c in left_cols}
        for c in payload:
            cols[f"matched_{c}"] = _masked_take(
                rt_tbl.column(f"matched_{c}"), pos, has)
        return pa.table(cols)
    resolve_unmatched.__name__ = "asof_resolve_unmatched"

    edges = resolved_all.filter(expr="kind == 1") \
        .map_batches(resolve_unmatched, batch_format="pyarrow",
                     batch_size=None)

    return done.union(edges)


def range_join_count(left, right, *, left_on: str, right_on: str,
                     left_ts: str, right_ts: str, window_ns: int,
                     left_id: str, num_partitions: int = 32):
    """Interval/range join, counting form: per left row, how many
    right rows share the key and fall in ``[left_ts - window,
    left_ts]`` (inclusive both ends).

    Distributed shape — time-bucketed replication + ONE global sort
    instead of a hash join: with bucket width = window, a qualifying
    right row's bucket is either the left row's bucket or the one
    before it, so each right row is replicated into exactly TWO
    (key, bucket) slots; the union of both tagged streams is sorted
    on ``(k, b, side, t)`` (rights before lefts inside a run, each
    side time-ordered) and every block resolves its interior
    ``(k, b)`` runs with a rank-compressed composite searchsorted —
    no per-run Python, and per-task work stays proportional to the
    run's own rows, never a hot key's full history. Only each
    block's FIRST and LAST run (the ones that may continue into a
    neighbouring block) go through a small ``groupby((k, b))``
    fixup: O(num_blocks) groups, independent of key count. Counts
    are emitted directly map-side — no corpus-wide aggregate.

    Skew bound: an edge-fixup GROUP holds one (key, bucket) run, so
    its size is bounded by one key's rows within 2·window — not the
    key's full history (unlike asof, the cross-block count needs the
    run's right-timestamp multiset, so a broadcast scalar cannot
    replace the group). If a single key can exceed worker memory
    within one window (bot traffic), subdivide: shrink ``window_ns``
    bucketing and sum subdivided counts, or pre-aggregate rights to
    (k, b, ts-quantized, n) histogram rows before tagging.

    (First cut used ``Dataset.join`` + a corpus-wide groupby-sum;
    Ray 2.49's hash join/aggregate dominated wall time ~10x over
    this sort-merge shape on narrow int rows.)

    ``num_partitions`` sets the sort's partition count (size it to
    ~128 MB of 40-byte tagged rows per partition at real scale).
    """

    def tag_left(batch: pa.Table) -> pa.Table:
        t = _ts_to_i64(batch.column(left_ts))
        return pa.table({
            "k": batch.column(left_on).cast(_I64),
            "b": pc.divide(t, window_ns),
            "side": pa.array(
                np.ones(batch.num_rows, dtype=np.int8)),
            "t": t,
            "jid": batch.column(left_id).cast(_I64),
        })
    tag_left.__name__ = "range_tag_left"

    def tag_right(batch: pa.Table) -> pa.Table:
        t = _ts_to_i64(batch.column(right_ts)).to_numpy(
            zero_copy_only=False)
        k = batch.column(right_on).cast(_I64).to_numpy(
            zero_copy_only=False)
        b = t // window_ns
        n2 = 2 * t.size
        return pa.table({
            "k": pa.array(np.concatenate([k, k]), _I64),
            "b": pa.array(np.concatenate([b, b + 1]), _I64),
            "side": pa.array(np.zeros(n2, dtype=np.int8)),
            "t": pa.array(np.concatenate([t, t]), _I64),
            # -1 sentinel (not null): keeps the unioned jid column
            # all-valid int64 so to_numpy stays zero-copy instead of
            # degrading to float64+NaN (lossy above 2^53 ids).
            "jid": pa.array(np.full(n2, -1, dtype=np.int64), _I64),
        })
    tag_right.__name__ = "range_tag_right_x2"

    lt = left.select_columns(sorted({left_id, left_on, left_ts})) \
        .map_batches(tag_left, batch_format="pyarrow")
    rt = right.select_columns(sorted({right_on, right_ts})) \
        .map_batches(tag_right, batch_format="pyarrow")

    # Coalesce the narrow tagged stream to ``num_partitions`` blocks
    # before sorting: the sort's map/reduce task count tracks input
    # block count, and tagged rows are ~40 bytes each, so inheriting
    # the corpus's block count means hundreds of near-empty shuffle
    # tasks. Cheap split/merge repartition, not a shuffle; size
    # num_partitions ~ (rows * 40 B) / 128 MB at real scale.
    merged = lt.union(rt).repartition(num_partitions) \
        .sort(["k", "b", "side", "t"])

    def resolve_block(batch: pa.Table) -> pa.Table:
        """Count in-window rights for every left in an INTERIOR
        (k, b) run (kind 0); re-emit all rows of the block's first
        and last runs for the edge fixup (kind 1 = left,
        kind 2 = right)."""
        n = batch.num_rows

        def shell(kind, jid, nm, kk, bb, tt, ss) -> pa.Table:
            return pa.table({
                "kind": pa.array(kind, pa.int8()),
                "jid": pa.array(jid, _I64),
                "n_matches": pa.array(nm, _I64),
                "k": pa.array(kk, _I64),
                "b": pa.array(bb, _I64),
                "t": pa.array(tt, _I64),
                "side": pa.array(ss, pa.int8()),
            })
        if n == 0:
            return shell([], [], [], [], [], [], [])

        k = batch.column("k").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        t = batch.column("t").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        jid = batch.column("jid").to_numpy(zero_copy_only=False)

        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (k[1:] != k[:-1]) | (b[1:] != b[:-1])
        run_id = np.cumsum(change) - 1
        last_run = run_id[-1]
        boundary = (run_id == 0) | (run_id == last_run)
        interior = ~boundary

        is_right = side == 0
        il = interior & ~is_right        # interior lefts to resolve
        ir = interior & is_right         # their candidate rights

        parts = []
        if il.any():
            # rank-compress timestamps so run_id * M + rank fits
            # int64 regardless of the ns span
            uniq = np.unique(t[interior])
            M = uniq.size + 2
            r_run = run_id[ir]
            r_rank = np.searchsorted(uniq, t[ir], side="left")
            comp_r = r_run * M + r_rank      # sorted by construction
            l_run = run_id[il]
            lt_v = t[il]
            hi_rank = np.searchsorted(uniq, lt_v, side="right")
            lo_rank = np.searchsorted(uniq, lt_v - window_ns,
                                      side="left")
            hi = np.searchsorted(comp_r, l_run * M + hi_rank,
                                 side="left")
            lo = np.searchsorted(comp_r, l_run * M + lo_rank,
                                 side="left")
            cnt = hi - lo
            nl = cnt.size
            parts.append(shell(
                np.zeros(nl, np.int8), jid[il], cnt,
                np.zeros(nl, np.int64), np.zeros(nl, np.int64),
                np.zeros(nl, np.int64), np.zeros(nl, np.int8)))
        if boundary.any():
            kinds = np.where(is_right[boundary], 2, 1) \
                .astype(np.int8)
            nb = int(boundary.sum())
            parts.append(shell(
                kinds, np.where(is_right[boundary], 0,
                                jid[boundary]),
                np.zeros(nb, np.int64), k[boundary], b[boundary],
                t[boundary], side[boundary]))
        return pa.concat_tables(parts)
    resolve_block.__name__ = "range_resolve_block"

    resolved_all = merged.map_batches(
        resolve_block, batch_format="pyarrow").materialize()

    done = resolved_all.filter(expr="kind == 0") \
        .drop_columns(["kind", "k", "b", "t", "side"])

    def fix_edges(group: pd.DataFrame) -> pd.DataFrame:
        lefts = group[group["kind"] == 1]
        if lefts.empty:
            return pd.DataFrame({
                "jid": pd.Series([], dtype="int64"),
                "n_matches": pd.Series([], dtype="int64")})
        rts = np.sort(
            group.loc[group["kind"] == 2, "t"].to_numpy())
        lt_v = lefts["t"].to_numpy()
        hi = np.searchsorted(rts, lt_v, side="right")
        lo = np.searchsorted(rts, lt_v - window_ns, side="left")
        return pd.DataFrame({
            "jid": lefts["jid"].to_numpy(),
            "n_matches": (hi - lo).astype(np.int64)})

    edges = resolved_all.filter(expr="kind > 0") \
        .groupby(["k", "b"]).map_groups(
            fix_edges, batch_format="pandas")

    return done.union(edges)


def salted_join(big_ds, small_ds, *, on: str, right_on: str,
                salt: int = 8, num_partitions: int = 16):
    """HOT-KEY-SAFE partitioned hash join: a plain hash join routes
    every row of a key to ONE partition, so a dominant key turns the
    join into a single-task straggler (and, as the key grows, an
    OOM). Salting restores parallelism without changing the result:
    the big side adds a deterministic per-row salt (splitmix of the
    row's position-independent payload hash is overkill — a cheap
    running index modulo works because the salt only needs to SPREAD,
    not to be stable across runs), the SMALL side replicates
    ``salt``-fold (bounded: |small| × salt narrow rows), and the join
    key becomes (key, salt) — each hot key now occupies ``salt``
    partitions. Result is row-identical to the unsalted join (pytest
    parity); use when the small side is too big to broadcast but the
    big side's key distribution is skewed. → joined dataset with the
    salt column dropped."""
    import numpy as np
    import pyarrow as pa
    import ray

    def add_salt(b: pa.Table) -> pa.Table:
        s = np.arange(b.num_rows, dtype=np.int64) % salt
        return b.append_column("_salt", pa.array(s, pa.int64()))
    add_salt.__name__ = "salted_join_big_salt"

    def replicate(b: pa.Table) -> pa.Table:
        parts = []
        for s in range(salt):
            parts.append(b.append_column(
                "_rsalt", pa.array(
                    np.full(b.num_rows, s, np.int64), pa.int64())))
        return pa.concat_tables(parts)
    replicate.__name__ = "salted_join_small_replicate"

    joined = big_ds.map_batches(add_salt, batch_format="pyarrow") \
        .join(small_ds.map_batches(replicate,
                                   batch_format="pyarrow")
              .repartition(num_partitions),
              join_type="inner", num_partitions=num_partitions,
              on=(on, "_salt"), right_on=(right_on, "_rsalt"))
    return joined.drop_columns(["_salt"])

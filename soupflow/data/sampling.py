"""Deterministic hash-based dataset splitting / sampling.

Training pipelines need reproducible, data-independent splits that
(a) need no shuffle or state — pure map-side arithmetic per row,
(b) are stable under re-runs, repartitioning and corpus growth
(a doc's split never changes when other docs appear), and (c) can be
recomputed by any engine (the SQL oracle reproduces the exact same
assignment with HUGEINT arithmetic).

Hash: splitmix-style multiplicative mix ``(id * PHI64) mod 2^64``
(Fibonacci hashing constant). Weak cryptographically, perfectly fine
for unbiased bucket assignment of ids, and expressible both as
wrapping numpy uint64 multiply and as DuckDB HUGEINT modular
arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PHI64 = 11400714819323198485  # 2^64 / golden ratio, odd
_U64 = 1 << 64


def _mix(ids: np.ndarray) -> np.ndarray:
    # contract: ids are non-negative. numpy wraps a negative id into
    # uint64 space but DuckDB's % keeps the dividend's sign, so the
    # SQL oracles would silently diverge — fail loudly instead.
    if ids.size and int(ids.min()) < 0:
        raise ValueError(
            "hash sampling requires non-negative ids (SQL-oracle "
            "parity: HUGEINT % keeps sign; numpy uint64 wraps)")
    with np.errstate(over="ignore"):
        return ids.astype(np.uint64) * np.uint64(PHI64)


def hash_split(ds, id_col: str = "doc_id",
               bounds: tuple[int, ...] = (80, 90),
               names: tuple[str, ...] = ("train", "val", "test")):
    """→ input rows + ``split`` label: bucket = hash(id) mod 100,
    split i where bucket < bounds[i] (last name catches the rest)."""
    assert len(names) == len(bounds) + 1

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bucket = (_mix(ids) % np.uint64(100)).astype(np.int64)
        lab = np.full(bucket.size, names[-1], dtype=object)
        for name, bound in zip(reversed(names[:-1]),
                               reversed(bounds)):
            lab[bucket < bound] = name
        return batch.append_column("split", pa.array(lab, pa.string()))
    assign.__name__ = "hash_split_assign"
    return ds.map_batches(assign, batch_format="pyarrow")


def hash_sample(ds, frac: float, id_col: str = "doc_id"):
    """Deterministic ~``frac`` sample: keep rows whose 64-bit hash
    falls below ``frac * 2^64``. Unlike ``ds.random_sample`` this is
    reproducible and stable under repartitioning."""
    threshold = np.uint64(min(int(frac * _U64), _U64 - 1))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_mix(ids) < threshold))
    keep.__name__ = "hash_sample_filter"
    return ds.map_batches(keep, batch_format="pyarrow")


def sample_threshold(frac: float) -> int:
    """The integer threshold hash_sample uses — embed this literal in
    the SQL oracle so both sides compare against the same constant."""
    return min(int(frac * _U64), _U64 - 1)


def stratified_sample(ds, key: str, k: int, id_col: str = "doc_id"):
    """Exact-count stratified sample: the k rows per ``key`` stratum
    with the smallest id hash — a deterministic 'random' pick that is
    reproducible, repartition-stable, and engine-independent (the SQL
    oracle replays the same HUGEINT hash and row_number cut).

    Scale shape: per-block per-stratum top-k partials (numpy) shrink
    each block to ≤ k rows per stratum BEFORE the one small groupby —
    the corpus itself never shuffles (same layout as rank.grouped_topk,
    which this composes). Output = id/key plus ``srank`` (the hash
    rank actually compared) for auditability."""
    from .rank import grouped_topk

    def add_rank(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # >>1 keeps the order and fits signed int64; negate so
        # grouped_topk's max-k picks the SMALLEST hashes
        srank = (_mix(ids) >> np.uint64(1)).astype(np.int64)
        t = batch.select([key, id_col])
        t = t.append_column("srank", pa.array(srank, pa.int64()))
        return t.append_column("neg_srank",
                               pa.array(-srank, pa.int64()))
    add_rank.__name__ = "stratum_rank"

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    top = grouped_topk(ranked, key=key, order_col="neg_srank", k=k,
                       tie=id_col)
    import pandas as pd

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, id_col, "srank"]]
    return top.map_batches(strip, batch_format="pandas")


def mixture_sample(ds, key: str = "source", alpha: float = 0.5,
                   total: int = 500, id_col: str = "doc_id"):
    """Temperature-weighted mixture sampling across sources (the
    multilingual/multi-domain rebalancing rule: quota_s ∝ count_s^α,
    α<1 upsamples small sources relative to their share). Keeps, per
    source, the floor(total·w_s/Σw) rows with the smallest id hash —
    deterministic, repartition-stable, engine-reproducible.

    Scale shape: ONE tiny groupby counts rows per source (collected —
    |sources| rows); quotas are computed driver-side in sorted-key
    order (fp sums are order-stable for the oracle), then the
    per-source top-quota cut reuses grouped_topk's per-block partial
    prune, so the corpus never shuffles — only ≤ max-quota rows per
    (block, source) move. Output (key, doc_id, srank)."""
    import pandas as pd
    from ray.data.aggregate import Count

    from ..io import collect_rows
    from .rank import grouped_topk

    counts = sorted(
        collect_rows(ds.groupby(key).aggregate(Count(alias_name="n"))),
        key=lambda r: r[key])
    weights = [(r[key], float(r["n"]) ** alpha) for r in counts]
    w_sum = sum(v for _, v in weights)
    quota = ({s: int(total * v / w_sum) for s, v in weights}
             if w_sum > 0 else {})

    def add_rank(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        srank = (_mix(ids) >> np.uint64(1)).astype(np.int64)
        t = batch.select([key, id_col])
        t = t.append_column("srank", pa.array(srank, pa.int64()))
        return t.append_column("neg_srank",
                               pa.array(-srank, pa.int64()))
    add_rank.__name__ = "mixture_rank"

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    top = grouped_topk(ranked, key=key, order_col="neg_srank",
                       k=0, tie=id_col, k_by_key=quota)

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, id_col, "srank"]]
    return top.map_batches(strip, batch_format="pandas")


def upsample_epochs(ds, weights: dict, key: str = "source",
                    id_col: str = "doc_id"):
    """Deterministic mixture UP-sampling: replicate each row
    ``k + (hash(id) % q < p)`` times where its source's epoch weight
    is the rational ``k + p/q`` (e.g. 2.25 epochs → every doc twice,
    a deterministic hash-chosen quarter a third time). The data-mixing
    counterpart of mixture_sample: training recipes specify epochs per
    source (Pile/DoReMi style) and the sampler must be reproducible,
    repartition-stable, and growth-stable (a doc's replica count never
    changes when other docs appear).

    → input key columns + ``epoch`` (0..r-1 per copy); rows with r=0
    (weight < 1 sources losing the hash draw) are dropped. Pure
    map-side arithmetic — zero shuffle, zero driver state; the weights
    dict is a constant captured in the task closure.

    ``weights``: {key_value: (k, p, q)} with integer k ≥ 0, 0 ≤ p < q.
    Rational form keeps both numpy and the SQL oracle integer-exact
    (hash % q compares against p; no float thresholds)."""
    for src, (k, p, q) in weights.items():
        if k < 0 or not 0 <= p < q:
            raise ValueError(f"bad epoch weight for {src!r}: "
                             f"need k>=0, 0<=p<q, got ({k},{p},{q})")

    def replicate(batch: pa.Table) -> pa.Table:
        srcs = batch.column(key).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(srcs, return_inverse=True)
        kk = np.zeros(len(uniq), np.int64)
        pp = np.zeros(len(uniq), np.int64)
        qq = np.ones(len(uniq), np.int64)
        for i, s in enumerate(uniq):
            k, p, q = weights.get(s, (0, 0, 1))
            kk[i], pp[i], qq[i] = k, p, q
        extra = (_mix(ids) % qq[inv].astype(np.uint64)) \
            < pp[inv].astype(np.uint64)
        reps = kk[inv] + extra.astype(np.int64)
        total = int(reps.sum())
        row_idx = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        starts = np.concatenate(([0], np.cumsum(reps)))[:-1]
        epoch = np.arange(total, dtype=np.int64) \
            - np.repeat(starts, reps)
        out = batch.take(pa.array(row_idx, pa.int64()))
        return out.append_column("epoch", pa.array(epoch, pa.int64()))
    replicate.__name__ = "upsample_epochs"
    return ds.map_batches(replicate, batch_format="pyarrow")


def weighted_sample(ds, k: int, weight_col: str,
                    id_col: str = "doc_id"):
    """Deterministic weight-proportional sample of ``k`` rows
    (Efraimidis–Spirakis A-ES): each row gets the priority key
    ln(u)/w with u = (hash(id)+0.5)/2^64 ∈ (0,1), and the k largest
    keys win — inclusion probability ∝ weight, yet reproducible,
    repartition-stable and engine-independent (the SQL oracle ranks
    by the same float expression; selection ties are broken by id).

    Scale shape: pure map-side key computation + per-block top-k
    prune, then ONE tiny sort over ≤ k × num_blocks surviving rows —
    the corpus never shuffles. Rows with w ≤ 0 are excluded."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        u = (_mix(ids).astype(np.float64) + 0.5) / float(_U64)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log(u) / w
        ok = w > 0
        # block-local prune: keep this block's k best (key desc,
        # id asc) — the global winners are among them
        order = np.lexsort((ids[ok], -key[ok]))
        idx = np.flatnonzero(ok)[order[:k]]
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column("skey",
                                 pa.array(key[idx], pa.float64()))
    partial.__name__ = f"wsample_partial_{weight_col}"

    return ds.map_batches(partial, batch_format="pyarrow") \
        .sort(["skey", id_col], descending=[True, False]) \
        .limit(k).drop_columns(["skey"])


def shuffle_rank(ds, id_col: str = "doc_id", seed: int = 1,
                 num_partitions: int = 16):
    """Deterministic GLOBAL training-epoch shuffle: every row gets its
    ordinal position under the hash permutation ``ORDER BY
    mix(id + seed), id`` — the reproducible data-order pass a trainer
    runs per epoch (seed = epoch), and the one global op
    ``random_shuffle`` can't give you deterministically across
    engines.

    Shape: the hash attaches map-side, so only narrow (id, h) pairs
    move through the ONE global sort. The ordinal then needs NO second
    shuffle: each sorted block emits its first (h, id) tuple + row
    count (an O(blocks) summary), the driver prefix-sums the block
    offsets, and a second zero-shuffle map over the SAME materialized
    blocks adds offset + local arange. Duplicate ids would make the
    block-identity tuple ambiguous — the driver raises loudly."""
    import ray

    from ..io import collect_table
    from .windows import _cached_get

    def hmap(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        h = _mix(ids + seed)
        return pa.table({id_col: b.column(id_col),
                         "h": pa.array(h, pa.uint64())})
    hmap.__name__ = "shuffle_hash"

    sorted_ds = ds.select_columns([id_col]) \
        .map_batches(hmap, batch_format="pyarrow") \
        .repartition(num_partitions) \
        .sort(["h", id_col]) \
        .materialize()

    def counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h0": pa.array([], pa.uint64()),
                             "id0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "h0": b.column("h").slice(0, 1),
            "id0": b.column(id_col).slice(0, 1).cast(pa.int64()),
            "n": pa.array([b.num_rows], pa.int64())})
    counts.__name__ = "shuffle_block_counts"

    summ = collect_table(sorted_ds.map_batches(
        counts, batch_format="pyarrow", batch_size=None))
    h0 = summ.column("h0").to_numpy(zero_copy_only=False)
    id0 = summ.column("id0").to_numpy(zero_copy_only=False)
    n = summ.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((id0, h0))
    keys = list(zip(h0[order].tolist(), id0[order].tolist()))
    if len(set(keys)) != len(keys):
        raise ValueError("shuffle_rank requires unique ids (block "
                         "boundary tuples collided)")
    offs = np.concatenate(([0], np.cumsum(n[order])[:-1]))
    handle = ray.put(dict(zip(keys, offs.tolist())))

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        table = _cached_get(handle)
        key = (int(b.column("h")[0].as_py()),
               int(b.column(id_col)[0].as_py()))
        off = table[key]
        return pa.table({
            id_col: b.column(id_col),
            "pos": pa.array(off + np.arange(b.num_rows,
                                            dtype=np.int64),
                            pa.int64())})
    tag.__name__ = "shuffle_rank_tag"

    return sorted_ds.map_batches(tag, batch_format="pyarrow",
                                 batch_size=None)

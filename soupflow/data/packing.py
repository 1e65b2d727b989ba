"""Sequence packing: assign documents to fixed-budget training
sequences (the T5/GPT pre-training batch-packing step).

Packing is inherently order-sensitive, so distributed semantics must
pin an order. Deterministic contract:

* every doc lands in a bucket ``hash(doc_id) % n_buckets`` (the same
  splitmix hash as data/sampling.py — repartition-stable, SQL-
  replayable);
* within a bucket, docs are packed in ``doc_id`` order with NEXT-FIT:
  a doc opens a new sequence iff adding it would push the running
  size over ``budget`` (a doc larger than the budget gets a sequence
  of its own);
* sequence ids are ``(bucket, seq_in_bucket)``.

Scale shape: ONE groupby on the bucket key (n_buckets ≈ cluster
parallelism × a small factor; buckets are hash-uniform so no skew),
then per-bucket packing that loops over OUTPUT sequences, not input
docs — each step is one ``np.searchsorted`` on the bucket's prefix
sums, so per-row Python never happens. Only (id, size) pairs move
through the shuffle; payloads stay behind and are later joined/looked
up by doc_id (same narrow-shuffle discipline as exact_dedup).

The DuckDB oracle replays next-fit exactly with a recursive CTE that
advances every bucket one row per iteration (the k-means unrolled-
iteration trick), so the whole operator is hash-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sampling import _mix


def _pack_sizes(sizes: np.ndarray, budget: int) -> np.ndarray:
    """Next-fit over pre-ordered sizes → 0-based sequence index per
    row. Loops once per OUTPUT sequence (searchsorted on the prefix
    sum), not per input row."""
    n = sizes.size
    out = np.empty(n, dtype=np.int64)
    cs = np.cumsum(sizes, dtype=np.int64)
    i = 0
    seq = 0
    base = 0
    while i < n:
        j = int(np.searchsorted(cs, base + budget, side="right"))
        if j <= i:           # single doc over budget: own sequence
            j = i + 1
        out[i:j] = seq
        seq += 1
        base = cs[j - 1]
        i = j
    return out


def pack_sequences(ds, budget: int, size_col: str = "n_chars",
                   id_col: str = "doc_id", n_buckets: int = 8):
    """→ (doc_id, bucket, seq, seq_pos): the deterministic packing
    assignment described in the module docstring."""

    def bucket_of(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b = (_mix(ids) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "size": batch.column(size_col).cast(pa.int64()),
            "bucket": pa.array(b, pa.int64()),
        })
    bucket_of.__name__ = "assign_bucket"

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        seq = _pack_sizes(g["size"].to_numpy(np.int64), budget)
        pos = np.arange(len(g), dtype=np.int64)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(seq))
                                 + 1))
        pos -= np.repeat(starts, np.diff(np.concatenate(
            (starts, [len(g)]))))
        return pd.DataFrame({
            id_col: g[id_col],
            "bucket": g["bucket"],
            "seq": pd.Series(seq, dtype="int64"),
            "seq_pos": pd.Series(pos, dtype="int64"),
        })

    narrow = ds.map_batches(bucket_of, batch_format="pyarrow")
    return narrow.groupby("bucket").map_groups(pack_bucket,
                                               batch_format="pandas")

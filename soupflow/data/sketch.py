"""Distinct-count sketching: KMV (k minimum values / bottom-k).

The 100-TB cardinality primitive: estimate |distinct(col)| without
shuffling the column — each block contributes its k smallest distinct
hashes (a few KB), the driver merges, and the estimate is
``(k-1) * 2^64 // h_k`` from the k-th smallest distinct hash
(Bar-Yossef et al. 2002). Unlike HyperLogLog the whole computation is
exact integer arithmetic over a deterministic hash, so a SQL oracle
reproduces the estimate BIT-FOR-BIT (DuckDB HUGEINT), not just within
an error bound — the sketch itself is testable, not only its accuracy.

Scale shape: ONE streaming pass, per-batch np.unique + partition-based
k-smallest partials, driver-side merge of ≤ k×num_blocks int64s. The
relative error is ~1/sqrt(k-2) (k=256 → ~6%); when the true distinct
count is below k the sketch holds every hash and the estimate is
exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import PHI64, _mix

_U64 = 1 << 64


def kmv_partials(ds, col: str, k: int = 256):
    """Per-block bottom-k distinct hashes → narrow (hv,) rows."""
    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        hv = np.unique(_mix(vals))          # sorted distinct uint64
        hv = hv[:k]
        return pa.table({"hv": pa.array(hv.astype(np.uint64),
                                        pa.uint64())})
    partial.__name__ = f"kmv{k}_partial"
    return ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")


def kmv_distinct(ds, col: str, k: int = 256):
    """→ 1-row pyarrow Table (est_distinct: int64). Deterministic:
    the same hash + integer arithmetic as the SQL oracle.

    Input contract: ``col`` must be a NON-NEGATIVE integer column —
    the splitmix helper ``_mix`` raises ``ValueError`` on negative
    ids (numpy would wrap them into uint64 space while DuckDB's
    HUGEINT ``%`` keeps the dividend's sign, silently diverging from
    the oracle)."""
    from ..io import collect_table

    t = collect_table(kmv_partials(ds, col, k))
    if t.num_columns == 0 or t.num_rows == 0:
        return pa.table({"est_distinct": pa.array([0], pa.int64())})
    hv = np.unique(t.column("hv").to_numpy(zero_copy_only=False))
    if hv.size < k:
        est = int(hv.size)
    else:
        hk = int(hv[k - 1])
        est = (k - 1) * _U64 // hk
    return pa.table({"est_distinct": pa.array([est], pa.int64())})

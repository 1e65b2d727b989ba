"""Semi-structured (JSON-ish) field extraction over string columns.

Training corpora carry per-record JSON sidecars (crawl metadata,
quality tags). The scalable shape: extract the needed field with the
Arrow C++ RE2 kernel (``pc.extract_regex`` — no per-row json.loads),
pre-aggregate inside the batch, and finish with ONE small groupby over
the bounded key space. Text/props never shuffle; only (key, count,
sum) partials do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_K_PAT = r'"k":\s*(?P<k>[0-9]+)'


def props_rollup(events):
    """→ (k, n, sum_cents): per extracted ``k`` the event count and
    the exact sum of ``value`` in integer cents (value carries 2
    decimals; cents keep the aggregate integer-exact so the oracle
    compare is float-free)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(
            pc.fill_null(batch.column("props"), ""), _K_PAT)
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        k = pc.fill_null(k, -1)  # rows without the field
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        t = pa.table({"k": k, "cents": pa.array(cents, pa.int64())})
        g = t.group_by(["k"]).aggregate(
            [("cents", "sum"), ("k", "count")])
        return g.rename_columns(["k", "sum_cents", "n"])
    partial.__name__ = "props_extract_partial"

    partials = events.select_columns(["props", "value"]) \
        .map_batches(partial, batch_format="pyarrow")
    return partials.groupby("k").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_cents", alias_name="sum_cents"))

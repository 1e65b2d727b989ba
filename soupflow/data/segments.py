"""One-pass sorted-run finishing — the engine's segment-reduce
operator over a single global sort.

The pattern (used by the TPC-H Q21 / Q4 / Q3 / Q18 / EXISTS-semi-join
family): two narrow map-side folds — per-block fact partials plus
dimension/anchor SENTINEL rows that sort FIRST within their key's run
— union into one stream, sort ONCE on ``(key, *order_cols)``, and a
vectorized kernel reduces each key's run without any further shuffle.

``finish_sorted_runs`` owns the plumbing that makes per-block kernel
application exact:

- a run that neither starts nor ends at a block boundary is COMPLETE
  BY CONTIGUITY, so each block reduces its own interior runs
  zero-shuffle;
- the ≤2 boundary runs per block ship their raw rows to the driver,
  are re-sorted, and flow through the SAME kernel — so boundary-
  spanning keys are finished with identical code, not a special case.

Partitioning assumption (document per call site): the driver-side edge
collect is O(blocks × max-rows-per-key). Every caller's union bounds
rows per key by construction (per-block pre-reduction makes a key's
rows O(blocks) worst case; sentinel folds add O(1) per key), and the
kernel must be a pure function of one run's rows.

The kernel contract: ``kernel(cols) -> pa.Table`` where ``cols`` maps
column name → numpy array (int64 for ``int_cols``, object for
``str_cols``), covering a slice that contains only complete runs,
sorted by ``(key, *order_cols)``. It must return the same schema as
``empty_partial`` and tolerate zero-length input.
"""
import numpy as np
import pyarrow as pa


def _np_cols(tbl: pa.Table, int_cols, str_cols, sl=None):
    out = {}
    for c in int_cols:
        a = tbl.column(c).to_numpy(zero_copy_only=False)
        out[c] = a if sl is None else a[sl]
    for c in str_cols:
        a = np.asarray(tbl.column(c).to_pylist(), dtype=object)
        out[c] = a if sl is None else a[sl]
    return out


def finish_sorted_runs(merged, *, key_col: str, order_cols,
                       int_cols, str_cols=(), kernel,
                       empty_partial: pa.Table) -> pa.Table:
    """Reduce every ``key_col`` run of an already-sorted, MATERIALIZED
    Dataset with ``kernel`` and return the concat of all partials
    (per-block interior partials + one driver-side edge partial).

    ``merged`` must be sorted on ``(key_col, *order_cols)`` and
    materialized (both map passes must see the SAME blocks).
    ``int_cols`` must include ``key_col`` and every ``order_cols``
    entry; the kernel sees exactly ``int_cols`` + ``str_cols``.
    The caller finishes the returned partial table driver-side (sum
    counts, take top-k, attach dims, ...)."""
    from ..io import collect_table

    all_cols = list(int_cols) + list(str_cols)
    edge_empty = pa.table({
        c: pa.array([], pa.int64() if c in int_cols else pa.string())
        for c in all_cols})

    def interior(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            return empty_partial
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        lo = int(np.searchsorted(k, k[0], side="right"))
        hi = max(int(np.searchsorted(k, k[-1], side="left")), lo)
        return kernel(_np_cols(b, int_cols, str_cols,
                               slice(lo, hi)))
    interior.__name__ = f"interior_runs_{key_col}"

    def edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            return edge_empty
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        lo = int(np.searchsorted(k, k[0], side="right"))
        hi = max(int(np.searchsorted(k, k[-1], side="left")), lo)
        keep = np.zeros(k.size, dtype=bool)
        keep[:lo] = True
        keep[hi:] = True
        return b.select(all_cols).filter(pa.array(keep))
    edges.__name__ = f"edge_runs_{key_col}"

    cand = collect_table(merged.map_batches(
        interior, batch_format="pyarrow", batch_size=None))
    side = collect_table(merged.map_batches(
        edges, batch_format="pyarrow", batch_size=None))

    parts = [empty_partial]          # keeps the schema typed even
    want = set(empty_partial.schema.names)      # when all else empty
    if cand.num_rows and want <= set(cand.schema.names):
        parts.append(cand.select(empty_partial.schema.names))
    if side.num_rows and key_col in side.schema.names:
        arrs = _np_cols(side, int_cols, str_cols)
        order = np.lexsort(tuple(
            arrs[c] for c in (*reversed(tuple(order_cols)),
                              key_col)))
        parts.append(kernel({c: a[order] for c, a in arrs.items()}))
    return pa.concat_tables(parts, promote_options="none")

"""One-pass sorted-run finishing — the engine's segment-reduce
operator over a single global sort.

The pattern (used by the TPC-H Q21 / Q4 / Q3 / Q18 / Q5 / Q12 / Q7 /
Q8 / EXISTS-semi-join family): two narrow map-side folds — per-block
fact partials plus dimension/anchor SENTINEL rows that sort FIRST
within their key's run — union into one stream, sort ONCE on
``(key, *order_cols)``, and a vectorized kernel reduces each key's
run without any further shuffle.

``finish_sorted_runs`` owns the plumbing that makes per-block kernel
application exact:

- a run that neither starts nor ends at a block boundary is COMPLETE
  BY CONTIGUITY, so each block reduces its own interior runs
  zero-shuffle;
- the ≤2 boundary runs per block ship their raw rows to the driver,
  are re-sorted, and flow through the SAME kernel — so boundary-
  spanning keys are finished with identical code, not a special case.

Both outputs come from ONE map over the sorted blocks (each task
emits its interior partial and its edge rows in a single tagged
table), so the sort output streams straight into the reducer — no
``materialize()`` barrier, no second scan.

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
    """Reduce every ``key_col`` run of an already-sorted Dataset with
    ``kernel`` and return the concat of all partials (per-block
    interior partials + one driver-side edge partial).

    ``merged`` must be sorted on ``(key_col, *order_cols)``; a single
    map pass consumes it, so no materialization is required.
    ``int_cols`` must include ``key_col`` and every ``order_cols``
    entry; the kernel sees exactly ``int_cols`` + ``str_cols``.
    The caller finishes the returned partial table driver-side (sum
    counts, take top-k, attach dims, ...)."""
    from ..io import collect_table

    all_cols = list(int_cols) + list(str_cols)
    pnames = list(empty_partial.schema.names)
    ptypes = [empty_partial.schema.field(c).type for c in pnames]

    def _etype(c):
        return pa.int64() if c in int_cols else pa.string()

    def unify(part: pa.Table, edge: pa.Table) -> pa.Table:
        """Stack an interior partial and raw edge rows into one
        tagged table (tag 0 = partial row, 1 = edge row); the other
        role's columns are null."""
        n1, n2 = part.num_rows, edge.num_rows
        d1 = {"__t": pa.array(np.zeros(n1, np.int8))}
        d2 = {"__t": pa.array(np.ones(n2, np.int8))}
        for c, t in zip(pnames, ptypes):
            d1[f"p_{c}"] = part.column(c).cast(t)
            d2[f"p_{c}"] = pa.nulls(n2, t)
        for c in all_cols:
            d1[f"e_{c}"] = pa.nulls(n1, _etype(c))
            d2[f"e_{c}"] = edge.column(c).cast(_etype(c))
        return pa.concat_tables([pa.table(d1), pa.table(d2)],
                                promote_options="none")

    _edge_empty = pa.table({c: pa.array([], _etype(c))
                            for c in all_cols})

    def reduce_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            return unify(empty_partial, _edge_empty)
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        lo = int(np.searchsorted(k, k[0], side="right"))
        hi = max(int(np.searchsorted(k, k[-1], side="left")), lo)
        part = kernel(_np_cols(b, int_cols, str_cols,
                               slice(lo, hi)))
        keep = np.zeros(k.size, dtype=bool)
        keep[:lo] = True
        keep[hi:] = True
        edge = b.select(all_cols).filter(pa.array(keep))
        return unify(part, edge)
    reduce_block.__name__ = f"segment_reduce_{key_col}"

    out = collect_table(merged.map_batches(
        reduce_block, batch_format="pyarrow", batch_size=None))

    parts = [empty_partial]          # keeps the schema typed even
    if out.num_rows and "__t" in out.schema.names:   # when all empty
        tags = out.column("__t").to_numpy(zero_copy_only=False)
        cand = out.filter(pa.array(tags == 0))
        side = out.filter(pa.array(tags == 1))
        if cand.num_rows:
            parts.append(pa.table(
                {c: cand.column(f"p_{c}").cast(t)
                 for c, t in zip(pnames, ptypes)}))
        if side.num_rows:
            raw = pa.table({c: side.column(f"e_{c}")
                            for c in all_cols})
            arrs = _np_cols(raw, int_cols, str_cols)
            order = np.lexsort(tuple(
                arrs[c] for c in (*reversed(tuple(order_cols)),
                                  key_col)))
            parts.append(kernel({c: a[order]
                                 for c, a in arrs.items()}))
    return pa.concat_tables(parts, promote_options="none")

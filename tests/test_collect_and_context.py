"""Regression guards for the Ray-runtime-level fixes: the
streaming-generator buffer raise in read_corpus and the block-ref
collect helpers (io.collect_table / collect_rows)."""

import numpy as np
import pyarrow as pa


def test_read_corpus_raises_gen_buffer(ray_session, tmp_path):
    """read_corpus must leave the per-task streaming-generator buffer
    at >= 32 blocks: the Ray 2.49 default of 2 serializes any few-file
    read that SplitBlocks into many blocks (~45 ms driver round-trip
    per resume) whenever downstream tasks are non-trivial."""
    import pyarrow.parquet as pq
    import ray.data

    from soupflow.io import read_corpus

    f = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": list(range(10))}), f)
    ds = read_corpus(str(f))
    ctx = ray.data.DataContext.get_current()
    assert ctx._max_num_blocks_in_streaming_gen_buffer >= 32
    assert ds.count() == 10


def test_collect_table_matches_take_all_pandas_blocks(ray_session):
    """collect_table must agree with take_all on map_groups output
    (pandas-formatted blocks — the case where take_all is ~30x
    slower)."""
    import ray.data

    from soupflow.io import collect_rows, collect_table

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(200, dtype=np.int64) % 7),
        "v": pa.array(np.arange(200, dtype=np.int64)),
    })).repartition(5)
    grouped = ds.groupby("k").map_groups(
        lambda g: g.head(3), batch_format="pandas")
    t = collect_table(grouped)
    rows = collect_rows(grouped)
    want = sorted((r["k"], r["v"]) for r in grouped.take_all())
    assert sorted(zip(t.column("k").to_pylist(),
                      t.column("v").to_pylist())) == want
    assert sorted((r["k"], r["v"]) for r in rows) == want


def test_collect_table_empty_dataset(ray_session):
    import ray.data

    from soupflow.io import collect_rows, collect_table

    ds = ray.data.from_arrow(pa.table({"a": pa.array([1, 2])})) \
        .filter(expr="a > 5")
    t = collect_table(ds)
    assert t.num_rows == 0
    assert collect_rows(ds) == []

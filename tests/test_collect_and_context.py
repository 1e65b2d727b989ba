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


def test_e2e_rehearsal_script_smoke():
    """The write-inclusive rehearsal chain (extract → filters →
    para/minhash dedup → decontam → pack → partitioned write +
    manifest + resume) must run end-to-end at replicate 1 in a fresh
    process — guards the integration script against bit-rot. Runs in
    its own Ray session (subprocess), not the test fixture's."""
    import json
    import os
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "scripts/e2e_rehearsal.py",
         "--replicate", "1", "--files-per-partition", "4",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.load(open("/tmp/e2e_rehearsal_x1.json"))
    assert rep["corpus_docs"] == 5000
    assert rep["resume_reran"] == [rep["extract_partitions"] // 2]
    assert rep["final_rows"] > 0
    assert [s["stage"] for s in rep["stages"]] == [
        "extract", "extract_resume", "flatten_quality_lang",
        "para_dedup", "minhash_dedup", "decontaminate",
        "pack_sequences", "final_write"]
    # committed full-size artifact untouched by small runs
    assert json.load(open("BENCH/E2E_REHEARSAL_320K.json"))[
        "corpus_docs"] == 320000

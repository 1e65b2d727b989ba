#!/usr/bin/env python
"""Skew-salting A/B: extract wall time on a corpus where 1% of docs
are pathological (deep-DOM, ~100× kernel cost) and CLUSTERED in input
order — the worst case for size-based block splitting (the heavy run
lands in one block → one straggler task). Runs the same partition
extract twice, unsalted vs salt_by_cost + shuffle, same session.

Usage: python scripts/skew_ab.py [n_docs] [heavy_pct]
Writes BENCH/SKEW_AB.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_corpus(out_dir: str, n_docs: int, heavy_pct: float) -> None:
    from soupflow.fixtures import SPAN_STRUCT, build_page, \
        split_into_spans

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    n_heavy = int(n_docs * heavy_pct)
    ids, spans = [], []
    for i in range(n_docs):
        text = " ".join(
            f"w{rng.randint(1000)}" for _ in range(60))
        # heavy docs LAST — clustered, so the default order packs
        # them into the same trailing block(s)
        heavy = i >= n_docs - n_heavy
        doc_id = f"d{i}"
        if heavy:
            depth = 2500
            html = build_page(doc_id, text * 20) \
                .replace("</body>",
                         "<div>" * depth + "deep" + "</div>" * depth
                         + "</body>")
        else:
            html = build_page(doc_id, text)
        ids.append(doc_id)
        spans.append(split_into_spans(doc_id, html))
    tbl = pa.table({"doc_id": pa.array(ids, pa.string()),
                    "spans": pa.array(spans, pa.list_(SPAN_STRUCT))})
    pq.write_table(tbl, os.path.join(out_dir, "in-0.parquet"))


def run_once(in_dir: str, salt_buckets, tag: str,
             override_num_blocks=None) -> float:
    from soupflow.pipeline import run_extract_partition
    out = f"/tmp/soupflow_skew/{tag}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    run_extract_partition(
        [os.path.join(in_dir, "in-0.parquet")], out, 0,
        salt_buckets=salt_buckets,
        override_num_blocks=override_num_blocks)
    return time.time() - t0


def main() -> None:
    import ray
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    heavy_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False)
    in_dir = "/tmp/soupflow_skew/input"
    if not os.path.exists(os.path.join(in_dir, "in-0.parquet")):
        build_corpus(in_dir, n_docs, heavy_pct)
    # interleave arms twice to dodge host noise; report best-of-2.
    # "repart64" shows range-based repartition does NOT fix clustered
    # skew (contiguity preserved) — the hash-shuffle salt does.
    walls = {"unsalted": [], "repart64": [], "salted": []}
    for _ in range(2):
        walls["unsalted"].append(run_once(in_dir, None, "unsalted"))
        walls["repart64"].append(
            run_once(in_dir, None, "repart64", override_num_blocks=64))
        walls["salted"].append(run_once(in_dir, 64, "salted"))
    result = {
        "n_docs": n_docs, "heavy_pct": heavy_pct, "num_cpus": cpus,
        "unsalted_sec": min(walls["unsalted"]),
        "repart64_sec": min(walls["repart64"]),
        "salted_sec": min(walls["salted"]),
        "all_walls": walls,
        "speedup_vs_unsalted":
            min(walls["unsalted"]) / min(walls["salted"]),
        "speedup_vs_repart":
            min(walls["repart64"]) / min(walls["salted"]),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SKEW_AB.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()

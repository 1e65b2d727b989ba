#!/usr/bin/env python
"""Salted-join skew A/B (SURVEY §4.2 completion for the JOIN side).

Builds a hot-key join workload — 2M big-side rows, 90% on ONE key,
small side 1,000 keys (too many to pretend a broadcast is the only
answer) — and times the plain partitioned hash join against
data/joins.salted_join on the same input in the same session.
Writes BENCH/SKEW_JOIN_AB.json with both walls + row-parity check.
"""
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import ray  # noqa: E402

from soupflow.data.joins import salted_join  # noqa: E402


def main():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    rng = np.random.default_rng(7)
    n = 16_000_000
    hot = rng.random(n) < 0.9
    keys = np.where(hot, 7, rng.integers(0, 1000, n)).astype(np.int64)
    big = pd.DataFrame({"k": keys,
                        "x": np.arange(n, dtype=np.int64)})
    small = pd.DataFrame({
        "sk": np.arange(1000, dtype=np.int64),
        "w": rng.integers(0, 100, 1000).astype(np.int64)})
    big_ds = ray.data.from_pandas(big).repartition(32).materialize()
    small_ds = ray.data.from_pandas(small).materialize()

    def timed(fn):
        best = None
        for _ in range(2):
            t = time.time()
            cnt = fn().count()
            w = time.time() - t
            best = (w, cnt) if best is None else min(
                best, (w, cnt), key=lambda p: p[0])
        return best

    plain_w, plain_n = timed(lambda: big_ds.join(
        small_ds.repartition(16), join_type="inner",
        num_partitions=16, on=("k",), right_on=("sk",)))
    salt_w, salt_n = timed(lambda: salted_join(
        big_ds, small_ds, on="k", right_on="sk", salt=16,
        num_partitions=16))
    assert plain_n == salt_n == n, (plain_n, salt_n)
    rep = {"rows": n, "hot_fraction": 0.9, "small_keys": 1000,
           "salt": 16,
           "plain_join_sec": round(plain_w, 2),
           "salted_join_sec": round(salt_w, 2),
           "speedup": round(plain_w / salt_w, 2),
           "row_parity": True}
    print(json.dumps(rep))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SKEW_JOIN_AB.json", "w") as f:
        json.dump(rep, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()

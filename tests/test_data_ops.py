"""Tests for the round-3 training-data operators: as-of join
(data/joins.py), BM25 search (data/search.py), hash split/sample
(data/sampling.py) and repetition signals (data/textstats.py).

Each distributed op is checked against an independent in-process
reference (pandas / Counter) on randomized inputs, including
multi-block layouts that exercise the cross-block edge fixups."""

import collections
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ray_ds(tbl: pa.Table, blocks: int):
    import ray.data
    return ray.data.from_arrow(tbl).repartition(blocks)


# -- as-of join -------------------------------------------------------------

def _asof_reference(left: pd.DataFrame, right: pd.DataFrame
                    ) -> dict[int, int | None]:
    """Per event: max-(ts, key) right row with right.ts <= left.ts."""
    out = {}
    for _, ev in left.iterrows():
        cand = right[(right["k"] == ev["k"]) & (right["t"] <= ev["t"])]
        if cand.empty:
            out[ev["event_id"]] = None
        else:
            best = cand.sort_values(["t", "o"]).iloc[-1]
            out[ev["event_id"]] = int(best["o"])
    return out


@pytest.mark.parametrize("blocks", [1, 7])
def test_asof_join_matches_reference(ray_session, blocks):
    from soupflow.data.joins import asof_join
    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    left = pd.DataFrame({
        "event_id": np.arange(n_l, dtype=np.int64),
        "k": rng.integers(0, 12, n_l).astype(np.int64),
        "t": rng.integers(0, 50, n_l).astype(np.int64),
    })
    right = pd.DataFrame({
        "o": np.arange(n_r, dtype=np.int64),
        "k": rng.integers(0, 12, n_r).astype(np.int64),
        # coarse grid forces (k, t) ties → tie-break path
        "t": rng.integers(0, 50, n_r).astype(np.int64),
    })
    res = asof_join(
        _ray_ds(pa.Table.from_pandas(left), blocks),
        _ray_ds(pa.Table.from_pandas(right), blocks),
        left_on="k", right_on="k", left_ts="t", right_ts="t",
        payload=["o"], left_cols=["event_id"], tie="o").take_all()
    got = {r["event_id"]: r["matched_o"] for r in res}
    want = _asof_reference(left, right)
    assert len(got) == n_l
    assert got == want


def test_asof_join_key_spanning_blocks(ray_session):
    """One hot key whose rows span every block: the in-block resolver
    can't see earlier-block rights, so matches must come from the
    edge fixup."""
    from soupflow.data.joins import asof_join
    n = 64
    left = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(np.zeros(n, np.int64)),
        "t": pa.array(np.arange(n, dtype=np.int64) * 10),
    })
    right = pa.table({
        "o": pa.array(np.arange(8), pa.int64()),
        "k": pa.array(np.zeros(8, np.int64)),
        "t": pa.array(np.arange(8, dtype=np.int64) * 100),
    })
    res = asof_join(_ray_ds(left, 16), _ray_ds(right, 4),
                    left_on="k", right_on="k", left_ts="t",
                    right_ts="t", payload=["o"],
                    left_cols=["event_id"], tie="o").take_all()
    got = {r["event_id"]: r["matched_o"] for r in res}
    for eid in range(n):
        want = min(eid * 10 // 100, 7)
        assert got[eid] == want, (eid, got[eid], want)


def test_asof_join_no_match_is_null(ray_session):
    from soupflow.data.joins import asof_join
    left = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                     "k": pa.array([5, 5], pa.int64()),
                     "t": pa.array([10, 20], pa.int64())})
    right = pa.table({"o": pa.array([9], pa.int64()),
                      "k": pa.array([5], pa.int64()),
                      "t": pa.array([15], pa.int64())})
    res = asof_join(_ray_ds(left, 2), _ray_ds(right, 1),
                    left_on="k", right_on="k", left_ts="t",
                    right_ts="t", payload=["o"],
                    left_cols=["event_id"], tie="o").take_all()
    got = {r["event_id"]: r["matched_o"] for r in res}
    assert got == {1: None, 2: 9}


# -- BM25 -------------------------------------------------------------------

def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    toks = [t.lower().split() for t in texts]
    dls = [len(tk) for tk in toks]
    n = len(texts)
    avgdl = sum(dls) / n
    scores = []
    for tk, dl in zip(toks, dls):
        c = collections.Counter(tk)
        s = 0.0
        for term in terms:
            tf = c[term]
            df = sum(1 for other in toks if term in other)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    return scores


def test_bm25_matches_reference(ray_session):
    from soupflow.data.search import bm25_topk
    texts = [
        "spark merge window functions",
        "the quick brown fox",
        "merge merge merge conflicts in the window",
        "window seat please",
        "spark plugs and spark gaps spark",
        "nothing relevant here at all",
        "a long document " + "padding words " * 50 + "merge once",
    ]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    res = bm25_topk(_ray_ds(tbl, 3), terms=("merge", "window", "spark"),
                    k=4).take_all()
    want = _bm25_reference(texts, ("merge", "window", "spark"))
    order = sorted(range(len(texts)), key=lambda i: (-want[i], i))
    expect = [i for i in order if want[i] > 0][:4]
    assert [r["doc_id"] for r in res] == expect
    for r in res:
        assert r["score"] == pytest.approx(want[r["doc_id"]], rel=1e-12)


# -- hash split / sample ----------------------------------------------------

def test_hash_split_deterministic_and_partition_stable(ray_session):
    from soupflow.data.sampling import hash_split
    ids = pa.table({"doc_id": pa.array(np.arange(5000), pa.int64())})
    a = {r["doc_id"]: r["split"]
         for r in hash_split(_ray_ds(ids, 1)).take_all()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(_ray_ds(ids, 13)).take_all()}
    assert a == b
    # growth-stability: the first 1000 ids keep their labels
    c = {r["doc_id"]: r["split"]
         for r in hash_split(_ray_ds(ids.slice(0, 1000), 4)).take_all()}
    assert all(a[i] == c[i] for i in range(1000))
    frac = collections.Counter(a.values())
    assert 0.75 < frac["train"] / 5000 < 0.85
    assert 0.05 < frac["val"] / 5000 < 0.15
    assert 0.05 < frac["test"] / 5000 < 0.15


def test_hash_sample_matches_threshold(ray_session):
    from soupflow.data.sampling import (PHI64, hash_sample,
                                        sample_threshold)
    ids = pa.table({"doc_id": pa.array(np.arange(4000), pa.int64())})
    kept = sorted(r["doc_id"] for r in
                  hash_sample(_ray_ds(ids, 5), 0.1).take_all())
    thr = sample_threshold(0.1)
    want = [i for i in range(4000)
            if (i * PHI64) % (1 << 64) < thr]
    assert kept == want
    assert 0.05 < len(kept) / 4000 < 0.15


# -- repetition signals -----------------------------------------------------

def test_repetition_matches_counter_reference(ray_session):
    from soupflow.data.textstats import repetition_batch
    texts = ["a a a b c", "x y z", "", "  spaced   out  ",
             "dup dup dup dup", "one"]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = repetition_batch(tbl).to_pylist()
    for row, text in zip(out, texts):
        c = collections.Counter(text.split())
        assert row["n_tokens"] == sum(c.values())
        assert row["n_distinct"] == len(c)
        assert row["top_count"] == (max(c.values()) if c else 0)

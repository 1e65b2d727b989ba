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


# -- round-3 batch 2: normalize / semistruct / bigrams / range join /
#    grouped top-k / quantiles ----------------------------------------------

def test_normalize_redact_reference(ray_session):
    from soupflow.data.textnorm import normalize_redact_batch
    texts = ["Contact Bob@Example.COM  now", "id 1234567 x 123",
             "  Spaces\t\teverywhere \n", ""]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(texts)})
    out = normalize_redact_batch(tbl).to_pylist()
    assert out[0]["clean_text"] == "contact <EMAIL> now"
    assert out[0]["n_emails"] == 1
    assert out[1]["clean_text"] == "id <NUM> x 123"
    assert out[1]["n_digit_runs"] == 1
    assert out[2]["clean_text"] == "spaces everywhere"
    assert out[3]["clean_text"] == ""


def test_props_rollup_reference(ray_session):
    from soupflow.data.semistruct import props_rollup
    import ray.data
    tbl = pa.table({
        "props": pa.array(['{"k": 7}', '{"k": 7}', '{"k":12}',
                           'garbage', None]),
        "value": pa.array([1.25, 2.50, 10.00, 3.00, 4.00]),
    })
    rows = {r["k"]: r for r in
            props_rollup(ray.data.from_arrow(tbl).repartition(3))
            .take_all()}
    assert rows[7]["n"] == 2 and rows[7]["sum_cents"] == 375
    assert rows[12]["n"] == 1 and rows[12]["sum_cents"] == 1000
    assert rows[-1]["n"] == 2 and rows[-1]["sum_cents"] == 700


def test_bigram_topk_reference(ray_session):
    from soupflow.data.textstats import bigram_topk
    texts = ["a b a b c", "a b", "z z z", ""]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(texts)})
    got = [(r["bigram"], r["n"]) for r in
           bigram_topk(_ray_ds(tbl, 3), k=3).take_all()]
    # "a b": 3 (2 in doc0, 1 in doc1); "z z": 2; then "b a": 1
    # (ties broken by bigram text: "b a" < "b c")
    assert got == [("a b", 3), ("z z", 2), ("b a", 1)]


def test_range_join_count_reference(ray_session):
    from soupflow.data.joins import range_join_count
    rng = np.random.default_rng(11)
    n_l, n_r, W = 200, 300, 50
    left = pd.DataFrame({
        "id": np.arange(n_l, dtype=np.int64),
        "k": rng.integers(0, 8, n_l).astype(np.int64),
        "t": rng.integers(0, 400, n_l).astype(np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 8, n_r).astype(np.int64),
        "t": rng.integers(0, 400, n_r).astype(np.int64),
    })
    res = range_join_count(
        _ray_ds(pa.Table.from_pandas(left), 5),
        _ray_ds(pa.Table.from_pandas(right), 4),
        left_on="k", right_on="k", left_ts="t", right_ts="t",
        window_ns=W, left_id="id", num_partitions=4).take_all()
    got = {r["jid"]: r["n_matches"] for r in res}
    assert len(got) == n_l
    for _, row in left.iterrows():
        want = int(((right["k"] == row["k"]) &
                    (right["t"] <= row["t"]) &
                    (right["t"] >= row["t"] - W)).sum())
        assert got[row["id"]] == want


def test_grouped_topk_reference(ray_session):
    from soupflow.data.rank import grouped_topk
    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr"], n),
        "doc_id": np.arange(n, dtype=np.int64),
        "score": rng.integers(0, 40, n).astype(np.int64),  # forces ties
    })
    res = grouped_topk(_ray_ds(pa.Table.from_pandas(df), 7),
                       key="lang", order_col="score", k=4,
                       tie="doc_id").take_all()
    got = {}
    for r in res:
        got.setdefault(r["lang"], []).append((r["score"], r["doc_id"]))
    for lang, sub in df.groupby("lang"):
        want = sub.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(4)
        assert sorted(got[lang], key=lambda x: (-x[0], x[1])) == \
            list(zip(want["score"], want["doc_id"]))


def test_quantiles_reference(ray_session):
    from soupflow.data.rank import quantiles
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1000, 3000).astype(np.int64)
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    out = quantiles(_ray_ds(tbl, 6), "v", (10, 50, 90, 100))
    s = np.sort(vals)
    n = len(vals)
    for _, row in out.iterrows():
        rank = (row["q_pct"] * n + 99) // 100
        assert row["value"] == s[rank - 1]


# -- stratified sample + snapshot dedup (round 3) ----------------------------

def test_stratified_sample_exact_count_and_stability(ray_session):
    from soupflow.data.sampling import stratified_sample
    rng = np.random.default_rng(11)
    n = 900
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
    })
    a = stratified_sample(_ray_ds(tbl, 4), key="lang", k=10).to_pandas()
    b = stratified_sample(_ray_ds(tbl, 13), key="lang", k=10).to_pandas()
    assert (a.groupby("lang").size() == 10).all()
    key = lambda df: sorted(map(tuple, df[["lang", "doc_id"]].values))
    assert key(a) == key(b), "sample not repartition-stable"
    # picked docs are exactly the k smallest hashes per stratum
    from soupflow.data.sampling import _mix
    ids = np.arange(n, dtype=np.int64)
    h = (_mix(ids) >> np.uint64(1)).astype(np.int64)
    for lang in ("en", "de", "fr"):
        stratum = ids[np.array([lang == ["en", "de", "fr"][i % 3]
                                for i in range(n)])]
        want = set(stratum[np.argsort(h[stratum], kind="stable")][:10])
        got = set(a.loc[a.lang == lang, "doc_id"])
        assert got == want
    del rng


def test_snapshot_dedup_modes_agree(ray_session):
    from soupflow.data.dedup import snapshot_dedup
    texts = [f"doc {i % 7}" for i in range(40)]       # heavy dup rate
    prior = pa.table({"doc_id": pa.array(range(100, 105)),
                      "text": pa.array([f"doc {i}" for i in range(5)])})
    new = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts)})
    out_b = snapshot_dedup(_ray_ds(new, 3), _ray_ds(prior, 2)) \
        .to_pandas()
    out_p = snapshot_dedup(_ray_ds(new, 3), _ray_ds(prior, 2),
                           join="partitioned", num_partitions=4) \
        .to_pandas()
    # prior knows 'doc 0'..'doc 4' → only rows with i%7 in {5, 6} stay
    want = {i for i in range(40) if i % 7 >= 5}
    assert set(out_b.doc_id) == want
    assert set(out_p.doc_id) == want
    assert set(out_p.columns) >= {"doc_id", "text", "fp"}


def test_snapshot_dedup_empty_prior(ray_session):
    from soupflow.data.dedup import snapshot_dedup
    new = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a", "b"])})
    prior = new.slice(0, 0)
    out = snapshot_dedup(_ray_ds(new, 1), _ray_ds(prior, 1)).to_pandas()
    assert set(out.doc_id) == {1, 2}


# -- sequence packing (round 3) ----------------------------------------------

def test_pack_sizes_nextfit_reference():
    from soupflow.data.packing import _pack_sizes
    sizes = np.array([5, 5, 5, 12, 3, 3, 3, 3], dtype=np.int64)
    # budget 10: [5,5] [5] [12] [3,3,3] [3]
    assert _pack_sizes(sizes, 10).tolist() == [0, 0, 1, 2, 3, 3, 3, 4]
    # oversized first doc gets its own sequence
    assert _pack_sizes(np.array([99, 1], dtype=np.int64), 10) \
        .tolist() == [0, 1]
    assert _pack_sizes(np.array([], dtype=np.int64), 10).size == 0


def test_pack_sizes_matches_scalar_nextfit():
    from soupflow.data.packing import _pack_sizes
    rng = np.random.default_rng(3)
    for _ in range(50):
        sizes = rng.integers(1, 40, rng.integers(1, 60)).astype(
            np.int64)
        budget = int(rng.integers(10, 80))
        got = _pack_sizes(sizes, budget).tolist()
        seq, acc, want = 0, 0, []
        for s in sizes:
            if want and acc + s > budget:
                seq += 1
                acc = 0
            acc += int(s)
            want.append(seq)
        assert got == want, (sizes.tolist(), budget)


def test_pack_sequences_distributed(ray_session):
    from soupflow.data.packing import pack_sequences
    n = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_chars": pa.array(
            np.random.default_rng(9).integers(50, 600, n)
            .astype(np.int64)),
    })
    a = pack_sequences(_ray_ds(tbl, 3), budget=1000, n_buckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(_ray_ds(tbl, 11), budget=1000, n_buckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b), "packing not repartition-stable"
    sizes = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("n_chars").to_pylist()))
    for (_, _), g in a.groupby(["bucket", "seq"]):
        g = g.sort_values("seq_pos")
        assert g.seq_pos.tolist() == list(range(len(g)))
        total = sum(sizes[d] for d in g.doc_id)
        assert total <= 1000 or len(g) == 1


def test_jaccard_verify_vectorized_matches_scalar_reference(ray_session):
    """The Arrow-native pairwise-Jaccard group kernel (triangular
    pair-decode + bincount intersection scatter) must emit exactly the
    pairs the scalar set-based loop would."""
    import random

    import numpy as np
    import pyarrow as pa
    import ray

    from soupflow.data.dedup import _jaccard_pair_stream, _shingle_hashes

    rng = random.Random(99)
    words = "alpha beta gamma delta eps zeta eta theta".split()
    rows_id, rows_text = [], []
    for _ in range(120):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        rows_id.append(len(rows_id)); rows_text.append(t)
        if rng.random() < 0.4:          # inject near-dups
            rows_id.append(len(rows_id))
            rows_text.append(t + (" tail" if rng.random() < 0.5 else ""))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(rows_id, pa.int64()),
        "text": pa.array(rows_text, pa.string())})).repartition(4)
    got = sorted((r["doc_id"], r["dup_of"], r["jaccard_x100"])
                 for r in _jaccard_pair_stream(
                     ds, threshold=0.5, shingle_k=3).take_all())

    # scalar reference over the SAME candidate pairs: recompute from
    # the emitted pair set's doc ids (the banding is deterministic, so
    # the kernel's job is only the within-group verify — check values)
    texts = dict(zip(rows_id, rows_text))
    for d, u, j in got:
        a = set(map(int, _shingle_hashes(texts[d] or "", 3)))
        b = set(map(int, _shingle_hashes(texts[u] or "", 3)))
        un = len(a | b)
        jac = (len(a & b) / un) if un else 1.0
        assert d > u
        assert jac >= 0.5
        assert j == int(jac * 100)


def test_pagerank_matches_scalar_reference(ray_session):
    """Distributed integer PageRank (join+groupby rounds) must be
    bit-identical to a scalar dict implementation AND stable under
    repartitioning — the property that makes the iterative algorithm
    oracle-able at all."""
    import numpy as np
    import pyarrow as pa
    import ray

    from soupflow.data.graph import (BASE, DAMP_DEN, DAMP_NUM, SCALE,
                                     pagerank)
    from soupflow.io import collect_table

    N = 137
    ids = np.arange(N, dtype=np.int64)
    np.random.RandomState(0).shuffle(ids)
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(ids, pa.int64())})).repartition(5)
    t = collect_table(pagerank(ds, n_iters=5, num_partitions=4))
    got = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("rank_i").to_pylist()))

    edges = {(d, t_) for d in range(N)
             for t_ in ((7*d+1) % N, (13*d+2) % N, (19*d+3) % N)
             if t_ != d}
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {d: SCALE for d in range(N)}
    for _ in range(5):
        nxt = {d: BASE for d in range(N)}
        for s, t_ in edges:
            nxt[t_] += (DAMP_NUM * r[s]) // (DAMP_DEN * outdeg[s])
        r = nxt
    assert got == r

    t2 = collect_table(pagerank(ds.repartition(11), n_iters=5,
                                num_partitions=7))
    got2 = dict(zip(t2.column("doc_id").to_pylist(),
                    t2.column("rank_i").to_pylist()))
    assert got2 == got


# -- inverted index ------------------------------------------------------------

def test_inverted_index_reference_and_stability(ray_session):
    """Postings rows must equal a scalar-Python reference index
    (ordering, df, tf totals) and be identical under repartitioning."""
    from collections import defaultdict

    import ray

    from soupflow.data.search import inverted_index
    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(90)]
    # mixed case + extra whitespace: tokenizer must lower + collapse
    texts[0] = "  Alpha ALPHA beta\t beta beta  "
    items = [{"doc_id": 1000 + 7 * i, "text": t}
             for i, t in enumerate(texts)]
    ds = ray.data.from_items(items).repartition(8)
    out = inverted_index(ds, num_buckets=16).to_pandas() \
        .sort_values("term").reset_index(drop=True)

    ref = defaultdict(dict)
    for it in items:
        for w in it["text"].lower().split():
            d = ref[w]
            d[it["doc_id"]] = d.get(it["doc_id"], 0) + 1
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        docs = ref[row["term"]]
        assert row["df"] == len(docs)
        assert row["tf_total"] == sum(docs.values())
        want = ",".join(f"{d}:{c}" for d, c in sorted(docs.items()))
        assert row["postings"] == want
    assert set(out.columns) == {"term", "df", "tf_total", "postings"}

    out2 = inverted_index(ds.repartition(3), num_buckets=16) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    assert out2.equals(out)


# -- epoch upsampling ----------------------------------------------------------

def test_upsample_epochs_reference_growth_and_validation(ray_session):
    import ray

    from soupflow.data.sampling import PHI64, upsample_epochs
    weights = {"a": (2, 1, 4), "b": (0, 3, 8), "c": (1, 0, 2),
               "d": (0, 0, 1)}
    items = [{"doc_id": i, "source": "abcd"[i % 4]} for i in range(400)]
    ds = ray.data.from_items(items).repartition(5)
    out = upsample_epochs(ds, weights).to_pandas()

    def ref_reps(doc_id, src):
        k, p, q = weights[src]
        return k + (((doc_id * PHI64) % (1 << 64)) % q < p)

    got = out.groupby("doc_id").size().to_dict()
    for it in items:
        r = ref_reps(it["doc_id"], it["source"])
        assert got.get(it["doc_id"], 0) == r
        if r:
            epochs = sorted(out[out.doc_id == it["doc_id"]]["epoch"])
            assert epochs == list(range(r))
    assert not (out["source"] == "d").any()        # k=0,p=0 → dropped
    assert (out["source"] == "a").sum() >= 2 * 100  # k=2 floor

    # growth stability: adding docs never changes existing replicas
    more = items + [{"doc_id": 10_000 + i, "source": "b"}
                    for i in range(50)]
    out2 = upsample_epochs(ray.data.from_items(more).repartition(9),
                           weights).to_pandas()
    sub = out2[out2.doc_id < 10_000].sort_values(["doc_id", "epoch"]) \
        .reset_index(drop=True)
    assert sub.equals(out.sort_values(["doc_id", "epoch"])
                      .reset_index(drop=True))

    import pytest as _pt
    with _pt.raises(ValueError):
        upsample_epochs(ds, {"a": (1, 5, 4)})


# -- group z-score ---------------------------------------------------------------

def test_group_zscore_reference_zero_var_and_stability(ray_session):
    import ray

    from soupflow.data.rank import group_zscore
    rng = np.random.default_rng(5)
    rows = []
    for i in range(300):
        g = "xyz"[i % 3]
        rows.append({"doc_id": i, "lang": g,
                     "n_chars": int(rng.integers(10, 5000))})
    # zero-variance group: must be dropped entirely
    rows += [{"doc_id": 1000 + i, "lang": "const", "n_chars": 77}
             for i in range(10)]
    ds = ray.data.from_items(rows).repartition(6)
    out = group_zscore(ds, key="lang", col="n_chars").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert not (out["lang"] == "const").any()
    assert len(out) == 300

    import statistics
    by_g = {}
    for r in rows[:300]:
        by_g.setdefault(r["lang"], []).append(r["n_chars"])
    for _, row in out.iterrows():
        xs = by_g[row["lang"]]
        mu = statistics.fmean(xs)
        sd = statistics.pstdev(xs)
        x = rows[int(row["doc_id"])]["n_chars"]
        assert abs(row["z"] - (x - mu) / sd) < 1e-9
    # per-group z-scores are standardized: mean≈0, pop-std≈1
    for g in "xyz":
        zs = out[out["lang"] == g]["z"]
        assert abs(zs.mean()) < 1e-9
        assert abs(zs.std(ddof=0) - 1.0) < 1e-9

    out2 = group_zscore(ds.repartition(11), key="lang",
                        col="n_chars").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2.equals(out)


# -- grouped correlation ----------------------------------------------------------

def test_group_corr_reference_and_stability(ray_session):
    import ray

    from soupflow.data.rank import group_corr
    rng = np.random.default_rng(11)
    rows = []
    for i in range(400):
        g = "abc"[i % 3]
        x = int(rng.integers(0, 100))
        # correlate y with x (+noise) so corr is non-trivial
        y = x * (1 + i % 3) + int(rng.integers(-20, 20))
        rows.append({"g": g, "x": x, "y": y})
    # zero-variance-x group: must be dropped
    rows += [{"g": "const", "x": 7, "y": int(rng.integers(0, 50))}
             for _ in range(10)]
    ds = ray.data.from_items(rows).repartition(7)
    out = group_corr(ds, key="g", xcol="x", ycol="y").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert list(out["g"]) == ["a", "b", "c"]

    import statistics
    for _, row in out.iterrows():
        xs = [r["x"] for r in rows if r["g"] == row["g"]]
        ys = [r["y"] for r in rows if r["g"] == row["g"]]
        ref = statistics.correlation(xs, ys)
        assert abs(row["corr"] - ref) < 1e-9, row["g"]
        assert row["n"] == len(xs)

    out2 = group_corr(ds.repartition(13), key="g", xcol="x",
                      ycol="y").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert out2.equals(out)


# -- histogram rank -------------------------------------------------------------

def test_group_rank_matches_sql_rank_semantics(ray_session):
    import ray

    from soupflow.data.rank import group_rank
    rng = np.random.default_rng(23)
    rows = [{"doc_id": i, "lang": "pqr"[i % 3],
             "n_chars": int(rng.integers(0, 40))}  # dense → many ties
            for i in range(500)]
    ds = ray.data.from_items(rows).repartition(9)
    out = group_rank(ds, key="lang", col="n_chars").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 500

    # reference: RANK() = 1 + count of strictly smaller in group
    by_g = {}
    for r in rows:
        by_g.setdefault(r["lang"], []).append(r["n_chars"])
    for _, row in out.iterrows():
        xs = by_g[row["lang"]]
        x = rows[int(row["doc_id"])]["n_chars"]
        assert row["rnk"] == 1 + sum(1 for v in xs if v < x)

    out2 = group_rank(ds.repartition(4), key="lang",
                      col="n_chars").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2.equals(out)


def test_group_rank_rejects_out_of_domain(ray_session):
    import pytest as _pt
    import ray

    from soupflow.data.rank import group_rank
    ds = ray.data.from_items(
        [{"doc_id": 0, "lang": "x", "n_chars": -1}])
    with _pt.raises(Exception, match="0 <= col"):
        group_rank(ds, key="lang", col="n_chars").to_pandas()


# -- weighted sampling -----------------------------------------------------------

def test_weighted_sample_reference_bias_and_stability(ray_session):
    import math

    import ray

    from soupflow.data.sampling import PHI64, weighted_sample
    rng = np.random.default_rng(17)
    n = 600
    # strongly bimodal weights so the bias is unmistakable
    w = np.where(np.arange(n) % 10 == 0, 5000, 10).astype(np.int64)
    w[5] = 0  # must be excluded outright
    items = [{"doc_id": i, "n_chars": int(w[i])} for i in range(n)]
    ds = ray.data.from_items(items).repartition(7)
    out = weighted_sample(ds, k=50, weight_col="n_chars") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def key(i):
        u = (((i * PHI64) % (1 << 64)) + 0.5) / float(1 << 64)
        return math.log(u) / float(w[i])

    ranked = sorted((i for i in range(n) if w[i] > 0),
                    key=lambda i: (-key(i), i))[:50]
    assert sorted(out["doc_id"]) == sorted(ranked)
    assert 5 not in set(out["doc_id"])
    # heavy rows are 1/10 of the corpus but 98% of the mass: they must
    # dominate the sample
    heavy = (out["doc_id"] % 10 == 0).sum()
    assert heavy >= 40
    out2 = weighted_sample(ds.repartition(13), k=50,
                           weight_col="n_chars").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2.equals(out)


def test_histogram_quantiles_reference(ray_session):
    """Sketch estimate vs a scalar reference; error bounded by one bin
    width; stable under repartitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from soupflow.data.sketch import histogram_quantiles

    rng = np.random.default_rng(17)
    v = rng.integers(0, 5000, size=3000).astype(np.int64)
    tbl = pa.table({"x": pa.array(v, pa.int64())})
    lo, w, nb = 0, 100, 64
    for blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(blocks)
        out = histogram_quantiles(ds, "x", lo=lo, width=w, nbins=nb,
                                  qs=(10, 50, 90, 100))
        got = dict(zip(out.column("q_pct").to_pylist(),
                       out.column("upper_edge").to_pylist()))
        s = np.sort(v)
        for q in (10, 50, 90, 100):
            # scalar reference: first bin whose cumcount crosses q%
            bins = np.clip((s - lo) // w, 0, nb - 1)
            cnt = np.bincount(bins, minlength=nb)
            cum = np.cumsum(cnt)
            pos = np.searchsorted(cum * 100, q * s.size)
            want = lo + (int(np.flatnonzero(cnt)[0]
                             if False else pos) + 1) * w
            # pos indexes ALL bins here (bincount over full range),
            # unlike the operator's nonzero-compacted table — recompute
            # the way the operator does to compare exactly
            nz = np.flatnonzero(cnt)
            cum_nz = np.cumsum(cnt[nz])
            pos_nz = np.searchsorted(cum_nz * 100, q * s.size)
            want = lo + (int(nz[pos_nz]) + 1) * w
            assert got[q] == want, (blocks, q)
            # sanity: true quantile lies within the claimed bin
            rank = max(int(np.ceil(q * s.size / 100)) - 1, 0)
            assert s[rank] < got[q] <= s[rank] + w


def test_histogram_quantiles_clipping_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from soupflow.data.sketch import histogram_quantiles

    # out-of-range values clip into the edge bins
    tbl = pa.table({"x": pa.array([-100, -1, 0, 99, 5000, 10**9],
                                  pa.int64())})
    out = histogram_quantiles(rd.from_arrow(tbl), "x", lo=0,
                              width=100, nbins=10, qs=(50, 100))
    got = dict(zip(out.column("q_pct").to_pylist(),
                   out.column("upper_edge").to_pylist()))
    assert got[50] == 100     # 4 of 6 values land in bin 0
    assert got[100] == 1000   # overflow clipped to last bin's edge
    # empty input → empty sketch, no crash
    empty = pa.table({"x": pa.array([], pa.int64())})
    out = histogram_quantiles(rd.from_arrow(empty), "x", lo=0,
                              width=100, nbins=10)
    assert out.num_rows == 0


def test_hll_grouped_matches_per_group_global(ray_session):
    """Grouped registers must equal running the global sketch on each
    group separately, and be stable under repartitioning; the derived
    estimate stays within the HLL error envelope."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from soupflow.data.sketch import hll_grouped, hll_registers

    rng = np.random.default_rng(31)
    n = 4000
    grp = rng.choice(["a", "b", "c"], size=n)
    # distinct pools of very different sizes per group — RANDOM
    # values, not progressions: the multiplicative hash shared with
    # the SQL oracle is (documentedly) weak on arithmetic
    # progressions, which only degrades the estimate, never the
    # bit-exact register state
    pool = {g: rng.integers(0, 1 << 40, size=k)
            for g, k in (("a", 40), ("b", 400), ("c", 2000))}
    vals = np.array([pool[g][rng.integers(0, pool[g].size)]
                     for g in grp], dtype=np.int64)
    tbl = pa.table({"g": pa.array(grp, pa.string()),
                    "v": pa.array(vals, pa.int64())})

    p = 8
    ref = {}
    for g in ("a", "b", "c"):
        sub = pa.table({"v": pa.array(vals[grp == g], pa.int64())})
        t = hll_registers(rd.from_arrow(sub), "v", p=p)
        ref[g] = dict(zip(t.column("bucket").to_pylist(),
                          t.column("maxrank").to_pylist()))

    prev = None
    for blocks in (1, 9):
        out = hll_grouped(rd.from_arrow(tbl).repartition(blocks),
                          "g", "v", p=p).to_pandas()
        got = {}
        for _, r in out.iterrows():
            got.setdefault(r.g, {})[r.bucket] = r.maxrank
        assert got == ref, blocks
        if prev is not None:
            assert got == prev
        prev = got

    # estimate sanity: alpha m^2 / sum 2^-rank within ~3 std errors
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    for g in ("a", "b", "c"):
        true = len(set(vals[grp == g].tolist()))
        ranks = np.zeros(m)
        for b, r in ref[g].items():
            ranks[b] = r
        est = alpha * m * m / np.sum(2.0 ** -ranks)
        if est <= 2.5 * m:  # small-range correction regime
            zeros = int((ranks == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)
        assert abs(est - true) / true < 3 * 1.04 / np.sqrt(m), \
            (g, est, true)


def test_asof_join_hot_key_pure_left_blocks(ray_session):
    """A hot key with 60k lefts across 16 blocks and rights ONLY at
    the very start: every later block is pure unmatched lefts, which
    must stream through the broadcast boundary-rights fixup (never
    one task holding all of them) and still match exactly."""
    from soupflow.data.joins import asof_join
    n = 60_000
    left = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(np.zeros(n, np.int64)),
        "t": pa.array(np.arange(n, dtype=np.int64) + 100),
    })
    right = pa.table({
        "o": pa.array([7, 9], pa.int64()),
        "k": pa.array([0, 0], pa.int64()),
        "t": pa.array([0, 50], pa.int64()),
    })
    res = asof_join(_ray_ds(left, 16), _ray_ds(right, 1),
                    left_on="k", right_on="k", left_ts="t",
                    right_ts="t", payload=["o"],
                    left_cols=["event_id"], tie="o",
                    num_partitions=16).take_all()
    assert len(res) == n
    assert all(r["matched_o"] == 9 for r in res)


def test_group_rank_dense_semantics(ray_session):
    """dense=True must match SQL DENSE_RANK (consecutive ranks over
    distinct values, ties collapse) on a tie-dense table, for any
    block layout; plain RANK on the same data differs where ties
    exist (guard that the two modes are actually distinct here)."""
    import pyarrow as pa
    import ray.data as rd

    from soupflow.data.rank import group_rank

    ids = np.arange(12, dtype=np.int64)
    keys = np.array(["a"] * 6 + ["b"] * 6, dtype=object)
    vals = np.array([5, 5, 7, 7, 7, 9, 1, 2, 2, 2, 3, 3],
                    dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "lang": pa.array(keys.tolist(), pa.string()),
                    "n_chars": pa.array(vals)})
    want_dense = [1, 1, 2, 2, 2, 3, 1, 2, 2, 2, 3, 3]
    want_rank = [1, 1, 3, 3, 3, 6, 1, 2, 2, 2, 5, 5]
    for blocks in (1, 4):
        ds = rd.from_arrow(tbl).repartition(blocks)
        d = group_rank(ds, key="lang", col="n_chars",
                       out_col="r", dense=True).to_pandas() \
            .sort_values("doc_id")
        r = group_rank(ds, key="lang", col="n_chars",
                       out_col="r").to_pandas().sort_values("doc_id")
        assert list(d["r"]) == want_dense, blocks
        assert list(r["r"]) == want_rank, blocks
    assert want_dense != want_rank


# -- quantize_embeddings ------------------------------------------------------

def _quant_ref(m: np.ndarray, levels: int = 256) -> np.ndarray:
    v = np.floor(m.astype(np.float64) * 1e6).astype(np.int64)
    mn, mx = v.min(axis=0), v.max(axis=0)
    span = mx - mn
    return np.where(span > 0,
                    (v - mn) * (levels - 1) // np.maximum(span, 1), 0)


def _emb_tbl(m: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.arange(m.shape[0]), pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32)),
                              pa.list_(pa.float32()))})


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_quantize_embeddings_reference(ray_session, blocks):
    from soupflow.data.similarity import quantize_embeddings
    rng = np.random.default_rng(11)
    m = rng.normal(size=(200, 16)).astype(np.float32)
    m[:, 5] = 0.25  # constant dim: span == 0 -> code 0 everywhere
    ref = _quant_ref(m)
    out = quantize_embeddings(
        _ray_ds(_emb_tbl(m), blocks), out="long").to_pandas() \
        .sort_values(["vec_id", "dim"])
    got = out.code.to_numpy().reshape(200, 16)
    assert np.array_equal(got, ref)
    assert (got[:, 5] == 0).all()
    assert got.min() == 0 and got.max() == 255


def test_quantize_embeddings_list_layout_matches_long(ray_session):
    from soupflow.data.similarity import quantize_embeddings
    rng = np.random.default_rng(5)
    m = rng.normal(size=(60, 8)).astype(np.float32)
    ds = _ray_ds(_emb_tbl(m), 4)
    long = quantize_embeddings(ds, out="long").to_pandas() \
        .sort_values(["vec_id", "dim"]).code.to_numpy().reshape(60, 8)
    lst = quantize_embeddings(ds, out="list").to_pandas() \
        .sort_values("vec_id")
    packed = np.stack(lst.codes.to_numpy())
    assert np.array_equal(packed, long)


def test_quantize_embeddings_roundtrip_error_bound(ray_session):
    # dequantized values stay within one quantization step of the
    # original — the property ANN candidate generation relies on
    from soupflow.data.similarity import quantize_embeddings
    rng = np.random.default_rng(2)
    m = rng.normal(size=(100, 12)).astype(np.float32)
    out = quantize_embeddings(
        _ray_ds(_emb_tbl(m), 3), out="long").to_pandas() \
        .sort_values(["vec_id", "dim"])
    codes = out.code.to_numpy().reshape(100, 12)
    v = np.floor(m.astype(np.float64) * 1e6).astype(np.int64)
    mn, mx = v.min(axis=0), v.max(axis=0)
    deq = mn + codes * (mx - mn) / 255.0
    assert np.abs(deq - v).max() <= (mx - mn).max() / 255.0 + 1


# -- skyline2d ----------------------------------------------------------------

def _skyline_ref(xs, ys):
    from collections import Counter
    pairs = Counter(zip(map(int, xs), map(int, ys)))
    out = {}
    for (x, y), n in pairs.items():
        dominated = any(
            (u >= x and v >= y and (u > x or v > y))
            for (u, v) in pairs)
        if not dominated:
            out[(x, y)] = n
    return out


@pytest.mark.parametrize("blocks", [1, 4, 9])
def test_skyline2d_matches_bruteforce(ray_session, blocks):
    from soupflow.data.rank import skyline2d
    rng = np.random.default_rng(17)
    # anti-correlated axes give a multi-point frontier; the small
    # domain plus tiling forces duplicates, x-ties and equal-y cases
    xs = rng.integers(0, 40, 500)
    ys = np.clip(40 - xs + rng.integers(-6, 7, 500), 0, None)
    xs = np.concatenate([xs, xs[:60]])
    ys = np.concatenate([ys, ys[:60]])
    ref = _skyline_ref(xs, ys)
    assert len(ref) > 1 and any(n > 1 for n in ref.values())
    tbl = pa.table({"x": pa.array(xs, pa.int64()),
                    "y": pa.array(ys, pa.int64())})
    out = skyline2d(_ray_ds(tbl, blocks), xcol="x", ycol="y")
    got = {(r["x"], r["y"]): r["n"] for r in out.to_pylist()}
    assert got == ref


def test_skyline2d_domain_contract(ray_session):
    from soupflow.data.rank import skyline2d
    tbl = pa.table({"x": pa.array([2**22], pa.int64()),
                    "y": pa.array([0], pa.int64())})
    with pytest.raises(Exception):
        skyline2d(_ray_ds(tbl, 1), xcol="x", ycol="y")


# -- shuffle_rank -------------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 5, 13])
def test_shuffle_rank_is_deterministic_permutation(ray_session,
                                                   blocks):
    from soupflow.data.sampling import _mix, shuffle_rank
    ids = np.arange(997, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = shuffle_rank(_ray_ds(tbl, blocks), seed=3,
                       num_partitions=7).to_pandas()
    assert sorted(out.pos) == list(range(997))
    # matches the scalar definition: ORDER BY mix(id+seed), id
    ref = ids[np.lexsort((ids, _mix(ids + 3)))]
    got = out.sort_values("pos").doc_id.to_numpy()
    assert np.array_equal(got, ref)


def test_shuffle_rank_seed_changes_permutation(ray_session):
    from soupflow.data.sampling import shuffle_rank
    ids = np.arange(300, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    a = shuffle_rank(_ray_ds(tbl, 4), seed=1).to_pandas() \
        .sort_values("doc_id").pos.to_numpy()
    b = shuffle_rank(_ray_ds(tbl, 4), seed=2).to_pandas() \
        .sort_values("doc_id").pos.to_numpy()
    assert not np.array_equal(a, b)
    assert sorted(a) == sorted(b) == list(range(300))


def test_shuffle_rank_duplicate_ids_never_silently_wrong(ray_session):
    # duplicates are only hazardous when equal (h, id) tuples split
    # across a block boundary — exactly the case the driver-side guard
    # raises on. Ray's range-partitioned sort usually co-locates equal
    # keys, in which case the output must still be a valid permutation
    # (ties take arbitrary but exactly-once positions). Either way:
    # never silently corrupt.
    from soupflow.data.sampling import shuffle_rank
    tbl = pa.table({"doc_id": pa.array(
        [7] * 5000 + list(range(100, 300)), pa.int64())})
    try:
        out = shuffle_rank(_ray_ds(tbl, 8),
                           num_partitions=8).to_pandas()
    except ValueError as e:
        assert "unique ids" in str(e)
    else:
        assert sorted(out.pos) == list(range(5200))


# -- bpe_train ----------------------------------------------------------------

def _bpe_ref(texts, k):
    """Classic dict-based BPE trainer (Sennrich): overlapping pair
    counts weighted by word frequency; winner = max count, then
    lexicographic; greedy left-to-right non-overlapping merge."""
    wf = collections.Counter(
        w for t in texts for w in t.lower().split())
    segs = {w: list(w) for w in wf}
    merges = []
    for _ in range(k):
        pc_ = collections.Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += wf[w]
        if not pc_:
            raise ValueError("no pairs")
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, c))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


@pytest.mark.parametrize("blocks", [1, 4])
def test_bpe_train_matches_scalar_reference(ray_session, blocks):
    from soupflow.data.bpe import BOUND, bpe_train
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wider wide wide widest",
        "aaa aaaa aaa",  # odd/even runs drive greedy non-overlap
    ] * 3
    tbl = pa.table({"text": pa.array(texts)})
    k = 7
    ref_merges, ref_segs = _bpe_ref(texts, k)
    merges, word_ds = bpe_train(_ray_ds(tbl, blocks), num_merges=k)
    got = list(zip(merges.column("lhs").to_pylist(),
                   merges.column("rhs").to_pylist(),
                   merges.column("n_pair").to_pylist()))
    assert got == ref_merges
    # a later merge must consume an earlier merged symbol — else the
    # iterative path is untested
    earlier = {a + b for a, b, _ in ref_merges[:-1]}
    assert any(a in earlier or b in earlier for a, b, _ in ref_merges)
    segs = {r["w"]: r["s"] for r in word_ds.take_all()}
    for w, syms in ref_segs.items():
        assert segs[w] == BOUND + BOUND.join(syms) + BOUND


def test_bpe_train_exhausted_vocabulary_raises(ray_session):
    from soupflow.data.bpe import bpe_train
    tbl = pa.table({"text": pa.array(["ab ab ab cd"])})
    with pytest.raises(ValueError):
        bpe_train(_ray_ds(tbl, 1), num_merges=5)


@pytest.mark.parametrize("blocks", [1, 4])
def test_bpe_encode_counts_match_scalar_reference(ray_session,
                                                  blocks):
    """Tokenizer application: per-doc token counts equal the scalar
    Sennrich reference's final segmentations summed over each doc's
    word multiset; a wordless doc keeps a (0, 0) row; merges must
    genuinely compress (n_tokens < n_chars for merged-word docs)."""
    from soupflow.data.bpe import bpe_encode_token_counts, bpe_train
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wider wide wide widest",
        "aaa aaaa aaa",
        "",                       # wordless doc -> (0, 0)
        "   ",                    # whitespace-only -> (0, 0)
    ] * 2
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
        "text": pa.array(texts)})
    k = 7
    _, ref_segs = _bpe_ref([t for t in texts if t.strip()], k)
    merges, _ = bpe_train(_ray_ds(tbl, blocks), num_merges=k)
    out = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe_encode_token_counts(
               _ray_ds(tbl, blocks), merges).take_all()}
    assert len(out) == len(texts)
    compressed = 0
    for i, t in enumerate(texts):
        words = t.lower().split()
        want = (len(words), sum(len(ref_segs[w]) for w in words))
        assert out[f"d{i}"] == want, (i, t, out[f"d{i}"], want)
        if words and want[1] < sum(len(w) for w in words):
            compressed += 1
    assert compressed > 0          # the merge list actually bites
    assert out["d4"] == (0, 0) and out["d5"] == (0, 0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_finish_sorted_runs_block_split_invariance(ray_session, seed):
    """Property: finish_sorted_runs gives the same per-key reduction
    regardless of WHERE block boundaries fall — including splits in
    the middle of a run, runs spanning 3+ blocks, single-key blocks,
    and a single-block layout. Kernel = per-run (sum, count); the
    reference reduces the whole sorted array at once."""
    import ray

    from soupflow.data.segments import finish_sorted_runs

    rng = np.random.default_rng(seed)
    n_keys = 30
    lens = rng.integers(1, 12, n_keys)
    k = np.repeat(np.arange(n_keys, dtype=np.int64) * 3, lens)
    fl = np.concatenate([
        np.r_[np.full(1, -1, np.int64),
              np.zeros(ln - 1, np.int64)] for ln in lens])
    v = rng.integers(-50, 50, k.size).astype(np.int64)
    tbl = pa.table({"ok": pa.array(k), "fl": pa.array(fl),
                    "v": pa.array(v)})

    def kernel(cols):
        ok, vv = cols["ok"], cols["v"]
        if ok.size == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        new = np.r_[True, ok[1:] != ok[:-1]]
        rs = np.flatnonzero(new)
        s = np.add.reduceat(vv, rs)
        n = np.diff(np.r_[rs, ok.size])
        return pa.table({"k": pa.array(ok[rs], pa.int64()),
                         "s": pa.array(s, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    ref = kernel({"ok": k, "fl": fl, "v": v})
    want = {r["k"]: (r["s"], r["n"]) for r in ref.to_pylist()}
    empty = kernel({"ok": np.empty(0, np.int64),
                    "fl": np.empty(0, np.int64),
                    "v": np.empty(0, np.int64)})

    layouts = [[tbl]]                       # single block
    for trial in range(4):                  # adversarial random splits
        cuts = np.sort(rng.choice(np.arange(1, k.size), size=6,
                                  replace=False))
        pieces, prev = [], 0
        for c in [*cuts.tolist(), k.size]:
            pieces.append(tbl.slice(prev, c - prev))
            prev = c
        layouts.append(pieces)

    for pieces in layouts:
        ds = ray.data.from_arrow(pieces).materialize()
        out = finish_sorted_runs(
            ds, key_col="ok", order_cols=["fl"],
            int_cols=["ok", "fl", "v"], kernel=kernel,
            empty_partial=empty)
        got = {r["k"]: (r["s"], r["n"]) for r in out.to_pylist()}
        assert got == want, (len(pieces),)
        assert out.num_rows == len(want)    # every key exactly once

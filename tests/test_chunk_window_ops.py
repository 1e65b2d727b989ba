"""Tests for the sliding-window chunker (data/chunking.py), hopping
window aggregate (data/windows.py), per-doc TF-IDF top-k
(data/search.py) and temperature mixture sampling (data/sampling.py).

Each op is checked against an independent scalar reference on
randomized inputs, plus the repartition-stability / geometry
properties the distributed layouts rely on."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ray_ds(tbl: pa.Table, blocks: int):
    import ray.data
    return ray.data.from_arrow(tbl).repartition(blocks)


# -- chunk_docs ---------------------------------------------------------------

def _chunks_reference(text: str, window: int, stride: int):
    n = len(text)
    n_chunks = 1 + max(0, math.ceil((n - window) / stride))
    return [(i, i * stride, text[i * stride:i * stride + window])
            for i in range(n_chunks)]


@pytest.mark.parametrize("blocks", [1, 5])
def test_chunk_docs_matches_reference(ray_session, blocks):
    from soupflow.data.chunking import chunk_docs
    rng = np.random.default_rng(7)
    texts = ["".join(rng.choice(list("abc défé中 "), size=k))
             for k in rng.integers(0, 900, size=60)]
    texts[0] = ""                     # empty doc still yields a chunk
    texts[1] = "x" * 200              # n == window exactly
    texts[2] = "y" * 350              # n == window + stride exactly
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    out = chunk_docs(_ray_ds(tbl, blocks), window=200, stride=150) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    got = {(r.doc_id, r.chunk_idx, r.chunk_start, r.chunk_text)
           for r in out.itertuples()}
    want = {(i, j, s, t)
            for i, text in enumerate(texts)
            for (j, s, t) in _chunks_reference(text, 200, 150)}
    assert got == want


def test_chunk_docs_codepoint_offsets(ray_session):
    """Offsets are Unicode code points, not UTF-8 bytes."""
    from soupflow.data.chunking import chunk_docs
    text = "é" * 10 + "中" * 10   # 2- and 3-byte chars
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array([text], pa.string())})
    out = chunk_docs(_ray_ds(tbl, 1), window=8, stride=6).to_pandas() \
        .sort_values("chunk_idx")
    # n=20, W=8, S=6 → 1+ceil(12/6)=3 chunks; coverage ends at 12+8=20
    assert list(out.chunk_text) == [text[s:s + 8] for s in (0, 6, 12)]


def test_chunk_docs_overlap_reconstructs(ray_session):
    """Dropping each chunk's first (window-stride) overlap chars and
    concatenating reconstructs the document."""
    from soupflow.data.chunking import chunk_docs
    text = "the quick brown fox jumps over the lazy dog " * 30
    tbl = pa.table({"doc_id": pa.array([5], pa.int64()),
                    "text": pa.array([text], pa.string())})
    out = chunk_docs(_ray_ds(tbl, 1), window=100, stride=60) \
        .to_pandas().sort_values("chunk_idx")
    parts = [t if i == 0 else t[100 - 60:]
             for i, t in enumerate(out.chunk_text)]
    assert "".join(parts) == text


# -- hopping_window_agg -------------------------------------------------------

def test_hopping_window_matches_reference(ray_session):
    from soupflow.data.windows import hopping_window_agg
    rng = np.random.default_rng(3)
    n = 500
    base = 1_700_000_000_000_000           # epoch us
    ts = base + rng.integers(0, 86_400, size=n) * 1_000_000
    kinds = rng.choice(["click", "view"], size=n)
    vals = rng.normal(10, 2, size=n)
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(kinds, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    out = hopping_window_agg(_ray_ds(tbl, 6), window_s=7200,
                             hop_s=3600).to_pandas()
    # scalar reference: every event lands in exactly K=2 windows
    rows = []
    for t, k, v in zip(ts, kinds, vals):
        w0 = (t // 3_600_000_000) * 3600
        for i in range(2):
            rows.append((w0 - i * 3600, k, v))
    ref = pd.DataFrame(rows, columns=["window_start", "event_type",
                                      "value"]) \
        .groupby(["window_start", "event_type"], as_index=False) \
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
    m = out.sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)
    r = ref.sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)
    assert m.window_start.tolist() == r.window_start.tolist()
    assert m.event_type.tolist() == r.event_type.tolist()
    assert m.n_events.tolist() == r.n_events.tolist()
    assert np.allclose(m.sum_value, r.sum_value)
    # replication invariant: sum of window counts == K * events
    assert int(out.n_events.sum()) == 2 * n


def test_hopping_window_rejects_nonmultiple(ray_session):
    from soupflow.data.windows import hopping_window_agg
    tbl = pa.table({"ts": pa.array([0], pa.timestamp("us")),
                    "event_type": pa.array(["a"]),
                    "value": pa.array([1.0])})
    with pytest.raises(ValueError):
        hopping_window_agg(_ray_ds(tbl, 1), window_s=5000, hop_s=3600)


# -- tfidf_topk ---------------------------------------------------------------

def _tfidf_reference(texts, k):
    import collections
    n_docs = len(texts)
    docs_tokens = [t.lower().split() for t in texts]
    df = collections.Counter()
    for toks in docs_tokens:
        df.update(set(toks))
    out = []
    for i, toks in enumerate(docs_tokens):
        tf = collections.Counter(toks)
        scored = [(term, cnt * math.log(n_docs / df[term]))
                  for term, cnt in tf.items()]
        scored = [(t, s) for t, s in scored if s > 0]
        scored.sort(key=lambda p: (-p[1], p[0]))
        out.extend((i, t, s) for t, s in scored[:k])
    return out


@pytest.mark.parametrize("blocks", [1, 4])
def test_tfidf_topk_matches_reference(ray_session, blocks):
    from soupflow.data.search import tfidf_topk
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "common"]
    texts = [" ".join(rng.choice(vocab,
                                 size=rng.integers(3, 40))) + " common"
             for _ in range(50)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(50, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    out = tfidf_topk(_ray_ds(tbl, blocks), k=3).to_pandas()
    got = sorted(
        (int(r.doc_id), r.term, round(float(r.tfidf), 9))
        for r in out.itertuples())
    want = sorted((i, t, round(s, 9))
                  for i, t, s in _tfidf_reference(texts, 3))
    assert got == want


def test_tfidf_zero_idf_excluded(ray_session):
    """A term present in EVERY doc scores ln(1)=0 and is dropped."""
    from soupflow.data.search import tfidf_topk
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["same same unique1", "same unique2"],
                         pa.string()),
    })
    out = tfidf_topk(_ray_ds(tbl, 1), k=5).to_pandas()
    assert set(out.term) == {"unique1", "unique2"}


# -- mixture_sample -----------------------------------------------------------

def test_mixture_sample_quotas_and_stability(ray_session):
    from soupflow.data.sampling import _mix, mixture_sample
    n = 1200
    srcs = np.array(["web"] * 800 + ["wiki"] * 300 + ["code"] * 100)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(srcs, pa.string()),
    })
    a = mixture_sample(_ray_ds(tbl, 4), key="source", alpha=0.5,
                       total=300).to_pandas()
    b = mixture_sample(_ray_ds(tbl, 11), key="source", alpha=0.5,
                       total=300).to_pandas()
    key = lambda df: sorted(map(tuple, df[["source", "doc_id"]].values))
    assert key(a) == key(b), "sample not repartition-stable"
    # quotas: floor(300 * sqrt(c_s) / sum sqrt(c))
    w = {s: math.sqrt(c) for s, c in
         (("code", 100), ("web", 800), ("wiki", 300))}
    wsum = sum(w[s] for s in sorted(w))
    want_quota = {s: int(300 * w[s] / wsum) for s in w}
    got_quota = a.groupby("source").size().to_dict()
    assert got_quota == want_quota
    # alpha < 1 upsamples the small source relative to its share
    assert got_quota["code"] / 300 > 100 / n
    # winners are exactly the quota smallest hashes per source
    ids = np.arange(n, dtype=np.int64)
    h = (_mix(ids) >> np.uint64(1)).astype(np.int64)
    for s, q in want_quota.items():
        stratum = ids[srcs == s]
        want = set(stratum[np.argsort(h[stratum], kind="stable")][:q])
        assert set(a.loc[a.source == s, "doc_id"]) == want


# -- quantile_band_filter ------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 6])
def test_quantile_band_filter_reference(ray_session, blocks):
    from soupflow.data.rank import quantile_band_filter, quantiles
    rng = np.random.default_rng(9)
    v = rng.integers(0, 500, size=400).astype(np.int64)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(400, dtype=np.int64)),
        "n_chars": pa.array(v, pa.int64()),
    })
    out = quantile_band_filter(_ray_ds(tbl, blocks), "n_chars",
                               10, 90).to_pandas()
    qs = quantiles(_ray_ds(tbl, blocks), "n_chars", (10, 90))
    lo, hi = int(qs.value.iloc[0]), int(qs.value.iloc[1])
    want = {int(i) for i, x in zip(np.arange(400), v)
            if lo <= x <= hi}
    assert set(out.doc_id) == want
    # the trim is a real band: both tails dropped, bulk kept
    assert 0 < len(out) < 400
    assert out.n_chars.min() >= lo and out.n_chars.max() <= hi


# -- para_dedup ---------------------------------------------------------------

def _para_reference(texts, wpp):
    """Scalar reference: (doc_id, para_idx) -> keep."""
    first = {}
    rows = []
    for d, t in enumerate(texts):
        words = t.split()
        for p in range(-(-len(words) // wpp)):
            para = " ".join(words[p * wpp:(p + 1) * wpp])
            key = first.setdefault(para, (d, p))
            rows.append((d, p, key == (d, p)))
    return rows


@pytest.mark.parametrize("blocks", [1, 5])
def test_para_dedup_matches_reference(ray_session, blocks):
    from soupflow.data.dedup import para_dedup
    rng = np.random.default_rng(13)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 80)))
             for _ in range(40)]
    texts[3] = texts[7] = "aa bb cc dd " * 8  # guaranteed exact dups
    tbl = pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    out = para_dedup(_ray_ds(tbl, blocks), words_per_para=15) \
        .to_pandas()
    got = sorted((int(r.doc_id), int(r.para_idx), bool(r.keep))
                 for r in out.itertuples())
    want = sorted(_para_reference(texts, 15))
    assert got == want
    # with a tiny vocab there must be real duplicate paragraphs
    assert not out.keep.all()


def test_para_dedup_short_and_empty_docs(ray_session):
    from soupflow.data.dedup import para_dedup
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["", "one two", "one two"], pa.string()),
    })
    out = para_dedup(_ray_ds(tbl, 1), words_per_para=15).to_pandas()
    got = sorted((int(r.doc_id), int(r.para_idx), bool(r.keep))
                 for r in out.itertuples())
    # empty doc yields no paragraphs; doc 2 duplicates doc 1's segment
    assert got == [(1, 0, True), (2, 0, False)]


# -- unigram_logprob ----------------------------------------------------------

def test_unigram_logprob_matches_reference(ray_session):
    import collections
    from soupflow.data.textstats import unigram_logprob
    rng = np.random.default_rng(21)
    vocab = ["the", "cat", "sat", "rare"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30),
                                 p=[0.6, 0.2, 0.15, 0.05]))
             for _ in range(30)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(30, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    out = unigram_logprob(_ray_ds(tbl, 4)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    freq = collections.Counter(w for t in texts for w in t.split())
    total = sum(freq.values())
    for r in out.itertuples():
        toks = texts[int(r.doc_id)].split()
        want = -sum(math.log(freq[w] / total) for w in toks) / len(toks)
        assert abs(r.avg_nll - want) < 1e-9
        assert r.n_tokens == len(toks)
    # a doc made ONLY of the rare token scores worse than one of 'the'
    tbl2 = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["rare rare rare", "the the the"],
                         pa.string()),
    })
    both = unigram_logprob(
        _ray_ds(pa.concat_tables([tbl, tbl2]), 3)).to_pandas()
    nll = dict(zip(both.doc_id, both.avg_nll))
    assert nll[100] > nll[101]


# -- property fuzz: chunk geometry over random window/stride -------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 700),
    window=st.integers(1, 60),
    stride=st.integers(1, 60),
)
def test_chunk_count_closed_form(n, window, stride):
    """chunk_count matches the scalar enumeration for ANY geometry:
    starts 0, S, 2S, ... until [start, start+W) covers the tail."""
    from soupflow.data.chunking import chunk_count
    got = int(chunk_count(np.array([n], dtype=np.int64),
                          window, stride)[0])
    want = len(_chunks_reference("x" * n, window, stride))
    assert got == want
    # coverage invariant: last chunk reaches the end of the doc
    last_start = (got - 1) * stride
    assert last_start + window >= n
    # minimality: the previous chunk (if any) did NOT reach the end
    if got > 1:
        assert (got - 2) * stride + window < n


# -- funnel & pivot -----------------------------------------------------------

def test_funnel_matches_reference(ray_session):
    from soupflow.data.windows import funnel
    rng = np.random.default_rng(17)
    n = 600
    ts = 1_700_000_000_000_000 + rng.integers(0, 10_000, n) * 1_000_000
    users = rng.integers(0, 40, n)
    kinds = rng.choice(["view", "purchase", "click"], size=n)
    tbl = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(kinds, pa.string()),
    })
    out = funnel(_ray_ds(tbl, 5), steps=("view", "purchase")) \
        .to_pandas()
    ref = {}
    for u, t, k in zip(users, ts, kinds):
        if k == "view":
            a, b = ref.setdefault(u, [None, None])
            ref[u][0] = t if a is None else min(a, t)
        elif k == "purchase":
            a, b = ref.setdefault(u, [None, None])
            ref[u][1] = t if b is None else max(b, t)
    want = {int(u): (a is not None and b is not None and a < b)
            for u, (a, b) in ref.items()}
    got = dict(zip(out.user_id.astype(int), out.converted))
    assert got == want


def test_funnel_strictly_after_and_one_sided(ray_session):
    from soupflow.data.windows import funnel
    t0 = 1_700_000_000_000_000
    tbl = pa.table({
        "user_id": pa.array([1, 1, 2, 3, 4, 4], pa.int64()),
        "ts": pa.array([t0, t0, t0, t0, t0, t0 + 1],
                       pa.timestamp("us")),
        "event_type": pa.array(
            ["view", "purchase",        # equal ts → NOT converted
             "purchase",                # purchase only → NOT
             "view",                    # view only → NOT
             "view", "purchase"],       # strictly after → converted
            pa.string()),
    })
    out = funnel(_ray_ds(tbl, 2)).to_pandas()
    got = dict(zip(out.user_id.astype(int), out.converted))
    assert got == {1: False, 2: False, 3: False, 4: True}


# -- randomized differential: segmentation over adversarial whitespace --------

def test_para_rows_differential_fuzz(ray_session):
    """400 random multibyte + mixed-whitespace batches vs the scalar
    str.split reference. This fuzz caught a REAL pyarrow 16.1 bug:
    after a few hundred in-process utf8_split_whitespace calls the
    kernel rarely misclassifies a whitespace char (the identical
    array splits correctly in a fresh process), which the _ws_tokens
    whitespace-in-token guard now detects and repairs — this test
    pins both the guard and the segment layout."""
    from soupflow.data.dedup import _para_rows
    rng = np.random.default_rng(99)
    for trial in range(400):
        n_docs = rng.integers(1, 30)
        texts = []
        for _ in range(n_docs):
            k = rng.integers(0, 60)
            words = ["".join(rng.choice(list("ab¢d中 "),
                                        size=rng.integers(1, 6)))
                     for _ in range(k)]
            sep = rng.choice([" ", "  ", "\t", "\n"],
                             size=max(k - 1, 0))
            texts.append("".join(
                w + (sep[i] if i < len(sep) else "")
                for i, w in enumerate(words)))
        wpp = int(rng.integers(1, 20))
        batch = pa.table({
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string())})
        d, p, joined = _para_rows(batch, wpp, "text", "doc_id")
        got = list(zip(d.tolist(), p.tolist(), joined))
        want = [(i, j, " ".join(t.split()[j * wpp:(j + 1) * wpp]))
                for i, t in enumerate(texts)
                for j in range(-(-len(t.split()) // wpp))]
        assert got == want, f"trial {trial}"


# -- KMV distinct sketch --------------------------------------------------------

def test_kmv_exact_below_k_and_estimate_above(ray_session):
    from soupflow.data.sketch import kmv_distinct
    rng = np.random.default_rng(23)
    # exact regime: 100 distinct values < k=256
    vals = rng.integers(0, 100, size=5000).astype(np.int64)
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    out = kmv_distinct(_ray_ds(tbl, 6), "v", k=256)
    assert out.column("est_distinct")[0].as_py() == len(set(vals))
    # estimate regime: 20k distinct, k=256 → ~6% relative error bound;
    # allow 4 sigma
    vals2 = rng.integers(0, 1 << 40, size=20000).astype(np.int64)
    n_true = len(set(vals2))
    tbl2 = pa.table({"v": pa.array(vals2, pa.int64())})
    est = kmv_distinct(_ray_ds(tbl2, 6), "v", k=256) \
        .column("est_distinct")[0].as_py()
    assert abs(est - n_true) / n_true < 4 / (254 ** 0.5)
    # repartition-stable (deterministic hash + merge)
    est2 = kmv_distinct(_ray_ds(tbl2, 13), "v", k=256) \
        .column("est_distinct")[0].as_py()
    assert est2 == est


def test_hll_registers_reference_estimate_and_stability(ray_session):
    """Registers must equal a scalar-Python reference, the classic
    estimate built from them must land within the HLL error bound,
    and any repartitioning must give identical registers."""
    from soupflow.data.sketch import PHI64, hll_registers
    rng = np.random.default_rng(41)
    p, m, w = 12, 4096, 52
    vals = rng.integers(0, 1 << 40, size=30000).astype(np.int64)
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    out = hll_registers(_ray_ds(tbl, 9), "v", p=p)

    ref = [0] * m
    for v in set(vals.tolist()):
        hv = (v * PHI64) % (1 << 64)
        b, rest = hv >> w, hv & ((1 << w) - 1)
        rank = (w + 1) if rest == 0 else w - rest.bit_length() + 1
        ref[b] = max(ref[b], rank)
    got = dict(zip(out.column("bucket").to_pylist(),
                   out.column("maxrank").to_pylist()))
    assert got == {b: r for b, r in enumerate(ref) if r > 0}

    # classic HLL estimate from the registers (alpha_4096 ≈ 0.7213/(1+1.079/m))
    alpha = 0.7213 / (1 + 1.079 / m)
    denom = sum(2.0 ** -r for r in ref)
    est = alpha * m * m / denom
    n_true = len(set(vals.tolist()))
    assert abs(est - n_true) / n_true < 5 * 1.04 / (m ** 0.5)

    out2 = hll_registers(_ray_ds(tbl, 17), "v", p=p)
    assert out2.equals(out)


def test_cms_heavy_hitters_reference_and_stability(ray_session):
    """CMS estimates must equal a scalar reference matrix (collisions
    included), always upper-bound the true count, and be identical
    under any repartitioning (sums commute)."""
    from collections import Counter

    from soupflow.data.sketch import _md5_positions, cms_heavy_hitters
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(300)]
    # Zipf-ish weights so there ARE heavy hitters
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 80),
                                 p=weights))
             for _ in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    d, w, k = 3, 64, 15  # tiny width to force real collisions
    out = cms_heavy_hitters(_ray_ds(tbl, 7), d=d, w=w, k=k)

    truth = Counter()
    for t in texts:
        truth.update(t.lower().split())
    # scalar reference matrix
    terms = sorted(truth)
    pos = _md5_positions(terms, d, w)
    mat = np.zeros((d, w), dtype=np.int64)
    for i, t in enumerate(terms):
        for r in range(d):
            mat[r, pos[i, r]] += truth[t]
    expect_top = sorted(truth.items(),
                        key=lambda kv: (-kv[1], kv[0]))[:k]
    got = list(zip(out.column("term").to_pylist(),
                   out.column("true_cnt").to_pylist(),
                   out.column("cms_est").to_pylist()))
    assert [(t, c) for t, c, _ in got] == expect_top
    collided = 0
    for t, c, est in got:
        i = terms.index(t)
        ref_est = min(int(mat[r, pos[i, r]]) for r in range(d))
        assert est == ref_est
        assert est >= c  # one-sided error
        collided += est > c
    assert collided > 0, "width 64 over 300 terms must collide"
    out2 = cms_heavy_hitters(_ray_ds(tbl, 13), d=d, w=w, k=k)
    assert out2.equals(out)


def test_unigram_logprob_partitioned_parity(ray_session):
    """The distributed-vocabulary escape hatch must agree with the
    broadcast path to fp round-off on a multi-block corpus."""
    from soupflow.data.textstats import unigram_logprob
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 60)))
             for _ in range(80)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(80, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    a = unigram_logprob(_ray_ds(tbl, 5)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = unigram_logprob(_ray_ds(tbl, 5), join="partitioned",
                        num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert a.n_tokens.tolist() == b.n_tokens.tolist()
    assert np.allclose(a.avg_nll, b.avg_nll, rtol=1e-12)


def test_tfidf_partitioned_parity(ray_session):
    """The distributed-vocabulary escape hatch must produce the same
    top-k rows as the broadcast path (same deterministic ordering)."""
    from soupflow.data.search import tfidf_topk
    rng = np.random.default_rng(37)
    vocab = [f"t{i}" for i in range(30)] + ["common"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 50)))
             + " common" for _ in range(60)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    a = tfidf_topk(_ray_ds(tbl, 5), k=3).to_pandas()
    b = tfidf_topk(_ray_ds(tbl, 5), k=3, join="partitioned",
                   num_partitions=4).to_pandas()
    key = lambda df: sorted(
        (int(r.doc_id), r.term, round(float(r.tfidf), 9))
        for r in df.itertuples())
    assert key(a) == key(b)


def test_hopping_window_negative_timestamps(ray_session):
    """Pre-1970 timestamps: the engine floors window starts; DuckDB's
    integer // truncates toward zero, so the oracle uses date_trunc —
    verify engine, scalar reference, and oracle-replica SQL all agree
    on negative epochs."""
    import duckdb
    from soupflow.data.windows import hopping_window_agg
    ts_us = np.array([-7_200_000_001, -3_600_000_000, -1, 1,
                      3_599_999_999], dtype=np.int64)
    tbl = pa.table({
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "event_type": pa.array(["a"] * 5, pa.string()),
        "value": pa.array([1.0] * 5, pa.float64()),
    })
    out = hopping_window_agg(_ray_ds(tbl, 2), window_s=7200,
                             hop_s=3600).to_pandas()
    ref = {}
    for t in ts_us:
        w0 = (t // 3_600_000_000) * 3600   # python floors like numpy
        for i in range(2):
            ref[(w0 - i * 3600, "a")] = ref.get(
                (w0 - i * 3600, "a"), 0) + 1
    got = {(int(r.window_start), r.event_type): int(r.n_events)
           for r in out.itertuples()}
    assert got == ref
    con = duckdb.connect()
    con.register("events_arrow", tbl)
    sql = """
        WITH r AS (
            SELECT epoch_us(date_trunc('hour', ts)) // 1000000
                    - i * 3600 AS window_start, event_type
            FROM events_arrow, generate_series(0, 1) AS g(i))
        SELECT window_start, event_type, count(*) AS n
        FROM r GROUP BY window_start, event_type"""
    orc = {(int(w), e): int(n)
           for w, e, n in con.execute(sql).fetchall()}
    assert orc == ref


def test_grouped_quantiles_reference(ray_session):
    from soupflow.data.rank import grouped_quantiles
    rng = np.random.default_rng(41)
    langs = rng.choice(["en", "de", "fr"], size=600)
    v = rng.integers(0, 300, size=600).astype(np.int64)
    tbl = pa.table({"lang": pa.array(langs, pa.string()),
                    "n_chars": pa.array(v, pa.int64())})
    out = grouped_quantiles(_ray_ds(tbl, 5), "lang", "n_chars",
                            (25, 50, 75))
    for lang in ("en", "de", "fr"):
        sub = np.sort(v[langs == lang])
        for q in (25, 50, 75):
            rank = (q * sub.size + 99) // 100
            want = int(sub[max(rank - 1, 0)])
            got = int(out[(out.lang == lang)
                          & (out.q_pct == q)].value.iloc[0])
            assert got == want, (lang, q)


# -- windowed_cumsum ----------------------------------------------------------

def _cumsum_reference(keys, ord1, ord2, vals):
    """Per-key running sum ordered by (ord1, ord2) — plain dict loop."""
    rows = sorted(zip(keys, ord1, ord2, vals))
    acc, out = {}, {}
    for k, o1, o2, v in rows:
        acc[k] = acc.get(k, 0) + v
        out[(k, o1, o2)] = acc[k]
    return out


@pytest.mark.parametrize("blocks", [1, 3, 16])
def test_windowed_cumsum_matches_reference(ray_session, blocks):
    from soupflow.data.windows import windowed_cumsum
    rng = np.random.default_rng(7)
    n = 400
    keys = rng.integers(0, 12, n)          # few keys → most span blocks
    o1 = rng.integers(0, 50, n)
    o2 = np.arange(n)                      # unique tie-break
    vals = rng.integers(-100, 1000, n)
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "o1": pa.array(o1, pa.int64()),
                    "o2": pa.array(o2, pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    out = windowed_cumsum(_ray_ds(tbl, blocks), key_col="k",
                          order_cols=["o1", "o2"], val_col="v",
                          out_col="run", num_partitions=blocks) \
        .to_pandas()
    assert len(out) == n
    ref = _cumsum_reference(keys, o1, o2, vals)
    for k, a, b, r in zip(out["k"], out["o1"], out["o2"], out["run"]):
        assert r == ref[(k, a, b)], (k, a, b)


def test_windowed_cumsum_single_key_spanning_all_blocks(ray_session):
    from soupflow.data.windows import windowed_cumsum
    n = 100
    tbl = pa.table({"k": pa.array([1] * n, pa.int64()),
                    "o1": pa.array(np.arange(n), pa.int64()),
                    "o2": pa.array(np.zeros(n), pa.int64()),
                    "v": pa.array(np.ones(n), pa.int64())})
    out = windowed_cumsum(_ray_ds(tbl, 8), key_col="k",
                          order_cols=["o1", "o2"], val_col="v",
                          out_col="run", num_partitions=8).to_pandas()
    got = out.sort_values("o1")["run"].to_numpy()
    assert (got == np.arange(1, n + 1)).all()


# -- windowed_lag --------------------------------------------------------------

def _lag_reference(keys, ts, ids):
    """Per-key prev/next gaps ordered by (ts, id) — plain dict loop."""
    rows = sorted(zip(keys, ts, ids), key=lambda r: (r[0], r[1], r[2]))
    gp, gn = {}, {}
    for i, (k, t, d) in enumerate(rows):
        prev = rows[i - 1] if i > 0 and rows[i - 1][0] == k else None
        nxt = rows[i + 1] if i + 1 < len(rows) \
            and rows[i + 1][0] == k else None
        gp[d] = t - prev[1] if prev else -1
        gn[d] = nxt[1] - t if nxt else -1
    return gp, gn


@pytest.mark.parametrize("blocks", [1, 3, 16])
def test_windowed_lag_matches_reference(ray_session, blocks):
    from soupflow.data.windows import windowed_lag
    rng = np.random.default_rng(13)
    n = 400
    keys = rng.integers(0, 10, n)          # few keys → most span blocks
    ts_us = rng.integers(0, 10**9, n)
    ids = np.arange(n)                     # unique tie-break
    tbl = pa.table({
        "id": pa.array(ids, pa.int64()),
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array(ts_us.astype("datetime64[us]"),
                       pa.timestamp("us"))})
    out = windowed_lag(_ray_ds(tbl, blocks), key_col="k",
                       ts_col="ts", id_col="id",
                       num_partitions=blocks).to_pandas()
    assert len(out) == n
    gp, gn = _lag_reference(keys, ts_us, ids)
    for d, p, x in zip(out["id"], out["gap_prev"], out["gap_next"]):
        assert p == gp[d] and x == gn[d], d


def test_windowed_lag_single_key_spanning_all_blocks(ray_session):
    from soupflow.data.windows import windowed_lag
    n = 90
    step = 7
    ts_us = (np.arange(n, dtype=np.int64) * step)
    tbl = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(np.ones(n, np.int64), pa.int64()),
        "ts": pa.array(ts_us.astype("datetime64[us]"),
                       pa.timestamp("us"))})
    out = windowed_lag(_ray_ds(tbl, 8), key_col="k", ts_col="ts",
                       id_col="id", num_partitions=8).to_pandas() \
        .sort_values("id")
    gp = out["gap_prev"].to_numpy()
    gn = out["gap_next"].to_numpy()
    assert gp[0] == -1 and (gp[1:] == step).all()
    assert gn[-1] == -1 and (gn[:-1] == step).all()


def test_windowed_lag_duplicate_timestamps(ray_session):
    """Ties on ts must break by id (gap 0) on both sides."""
    from soupflow.data.windows import windowed_lag
    tbl = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([5, 5, 5], pa.int64()),
        "ts": pa.array(np.array([100, 100, 250],
                                dtype="datetime64[us]"),
                       pa.timestamp("us"))})
    out = windowed_lag(_ray_ds(tbl, 1), key_col="k", ts_col="ts",
                       id_col="id").to_pandas().sort_values("id")
    assert list(out.gap_prev) == [-1, 0, 150]
    assert list(out.gap_next) == [0, 150, -1]


# -- windowed_rolling_sum ------------------------------------------------------

def _rolling_reference(keys, o1, o2, vals, p):
    rows = sorted(zip(keys, o1, o2, vals))
    hist, out = {}, {}
    for k, a, b, v in rows:
        h = hist.setdefault(k, [])
        h.append(v)
        out[(k, a, b)] = sum(h[-(p + 1):])
    return out


@pytest.mark.parametrize("blocks", [1, 3, 16])
def test_windowed_rolling_sum_matches_reference(ray_session, blocks):
    from soupflow.data.windows import windowed_rolling_sum
    rng = np.random.default_rng(23)
    n = 400
    keys = rng.integers(0, 11, n)
    o1 = rng.integers(0, 40, n)
    o2 = np.arange(n)
    vals = rng.integers(-50, 500, n)
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "o1": pa.array(o1, pa.int64()),
                    "o2": pa.array(o2, pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    out = windowed_rolling_sum(
        _ray_ds(tbl, blocks), key_col="k", order_cols=["o1", "o2"],
        val_col="v", out_col="roll", preceding=3,
        num_partitions=blocks).to_pandas()
    assert len(out) == n
    ref = _rolling_reference(keys, o1, o2, vals, 3)
    for k, a, b, r in zip(out["k"], out["o1"], out["o2"],
                          out["roll"]):
        assert r == ref[(k, a, b)], (k, a, b)


def test_windowed_rolling_sum_frame_edges(ray_session):
    """preceding=0 degenerates to the value itself; a huge frame
    degenerates to the running cumsum."""
    from soupflow.data.windows import windowed_rolling_sum
    n = 60
    tbl = pa.table({"k": pa.array([1] * n, pa.int64()),
                    "o1": pa.array(np.arange(n), pa.int64()),
                    "v": pa.array(np.arange(1, n + 1), pa.int64())})
    same = windowed_rolling_sum(
        _ray_ds(tbl, 4), key_col="k", order_cols=["o1"],
        val_col="v", out_col="roll", preceding=0,
        num_partitions=4).to_pandas().sort_values("o1")
    assert (same["roll"].to_numpy() == np.arange(1, n + 1)).all()
    cum = windowed_rolling_sum(
        _ray_ds(tbl, 4), key_col="k", order_cols=["o1"],
        val_col="v", out_col="roll", preceding=10**6,
        num_partitions=4).to_pandas().sort_values("o1")
    assert (cum["roll"].to_numpy()
            == np.cumsum(np.arange(1, n + 1))).all()


def test_sorted_summary_rows_duplicate_boundary_raises():
    """The deterministic-window contract: duplicate (key, order)
    tuples at block boundaries must fail loudly, not mis-assign
    bases."""
    from soupflow.data.windows import _sorted_summary_rows
    summ = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "o1": pa.array([5, 5], pa.int64()),
        "_seg_sum": pa.array([10, 20], pa.int64())})
    with pytest.raises(ValueError, match="unique at block boundaries"):
        _sorted_summary_rows(summ, "k", ["o1"], ["_seg_sum"])


def test_windowed_cumsum_hot_key_many_blocks(ray_session):
    """A single HOT key spanning every block must stream through the
    broadcast-base fixup (per-block vectorized adds), never a
    single-task per-key group — and stay exact."""
    from soupflow.data.windows import windowed_cumsum
    n = 200_000
    tbl = pa.table({"k": pa.array(np.ones(n, np.int64)),
                    "o1": pa.array(np.arange(n), pa.int64()),
                    "v": pa.array(np.ones(n, np.int64))})
    out = windowed_cumsum(_ray_ds(tbl, 16), key_col="k",
                          order_cols=["o1"], val_col="v",
                          out_col="run", num_partitions=16) \
        .to_pandas().sort_values("o1")
    got = out["run"].to_numpy()
    assert got.size == n
    assert (got == np.arange(1, n + 1)).all()


def test_window_family_randomized_differential(ray_session):
    """Seeded randomized differential for the broadcast-base fixup:
    random key cardinality / block layout / frame width, all three
    window ops vs pandas references in one pass per config."""
    import pandas as pd

    from soupflow.data.windows import (windowed_cumsum, windowed_lag,
                                       windowed_rolling_sum)
    rng = np.random.default_rng(99)
    for trial in range(6):
        n = int(rng.integers(50, 900))
        n_keys = int(rng.integers(1, 8))      # few keys → spans likely
        blocks = int(rng.integers(1, 12))
        p = int(rng.integers(0, 6))
        keys = rng.integers(0, n_keys, n)
        ts_us = rng.integers(0, 10**8, n)
        ids = rng.permutation(n)              # unique, shuffled
        vals = rng.integers(-30, 300, n)
        df = pd.DataFrame({"k": keys, "o1": ts_us, "o2": ids,
                           "v": vals}).sort_values(["k", "o1", "o2"])
        g = df.groupby("k")
        df["cum"] = g["v"].cumsum()
        df["roll"] = g["v"].transform(
            lambda s: s.rolling(p + 1, min_periods=1).sum()) \
            .astype(np.int64)
        df["gp"] = (df.o1 - g["o1"].shift(1)).fillna(-1) \
            .astype(np.int64)
        df["gn"] = (g["o1"].shift(-1) - df.o1).fillna(-1) \
            .astype(np.int64)

        tbl = pa.table({"k": pa.array(keys, pa.int64()),
                        "o1": pa.array(ts_us, pa.int64()),
                        "o2": pa.array(ids, pa.int64()),
                        "v": pa.array(vals, pa.int64())})
        cum = windowed_cumsum(_ray_ds(tbl, blocks), key_col="k",
                              order_cols=["o1", "o2"], val_col="v",
                              out_col="cum", num_partitions=blocks) \
            .to_pandas().sort_values(["k", "o1", "o2"])
        assert (cum["cum"].to_numpy()
                == df["cum"].to_numpy()).all(), trial
        roll = windowed_rolling_sum(
            _ray_ds(tbl, blocks), key_col="k",
            order_cols=["o1", "o2"], val_col="v", out_col="roll",
            preceding=p, num_partitions=blocks) \
            .to_pandas().sort_values(["k", "o1", "o2"])
        assert (roll["roll"].to_numpy()
                == df["roll"].to_numpy()).all(), trial

        lag_tbl = pa.table({
            "id": pa.array(ids, pa.int64()),
            "k": pa.array(keys, pa.int64()),
            "ts": pa.array(ts_us.astype("datetime64[us]"),
                           pa.timestamp("us"))})
        lag = windowed_lag(_ray_ds(lag_tbl, blocks), key_col="k",
                           ts_col="ts", id_col="id",
                           num_partitions=blocks).to_pandas() \
            .set_index("id")
        ref = df.set_index("o2")
        got_gp = lag.loc[ref.index, "gap_prev"].to_numpy()
        got_gn = lag.loc[ref.index, "gap_next"].to_numpy()
        assert (got_gp == ref["gp"].to_numpy()).all(), trial
        assert (got_gn == ref["gn"].to_numpy()).all(), trial


# -- interval_union -----------------------------------------------------------

def _interval_ref(keys, starts, durs):
    """Scalar sweep: per key, (n merged islands, union coverage)."""
    from collections import defaultdict
    by_key = defaultdict(list)
    for k, s, d in zip(keys, starts, durs):
        by_key[k].append((s, s + d))
    out = {}
    for k, iv in by_key.items():
        iv.sort()
        isl = cov = 0
        cur = None
        for s, e in iv:
            if cur is None or s > cur:
                isl += 1
                cov += e - s
                cur = e
            elif e > cur:
                cov += e - cur
                cur = e
        out[k] = (isl, cov)
    return out


def _interval_tbl(keys, starts, durs):
    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array(np.asarray(starts, np.int64),
                       pa.timestamp("us")),
        "id": pa.array(np.arange(len(keys)), pa.int64()),
        "dur": pa.array(np.asarray(durs, np.int64), pa.int64())})


def _run_interval(tbl, blocks, parts=16):
    from soupflow.data.windows import interval_union
    out = interval_union(_ray_ds(tbl, blocks), key_col="k",
                         ts_col="ts", id_col="id", dur_col="dur",
                         num_partitions=parts).to_pandas()
    return {r.k: (r.n_islands, r.covered_us)
            for r in out.itertuples()}


@pytest.mark.parametrize("blocks,parts", [(1, 1), (3, 4), (11, 16)])
def test_interval_union_matches_reference(ray_session, blocks, parts):
    rng = np.random.default_rng(7)
    n = 600
    keys = rng.integers(0, 12, n)
    starts = rng.integers(0, 50_000, n)
    durs = rng.integers(1, 8_000, n)  # dense enough that merges bite
    ref = _interval_ref(keys, starts, durs)
    assert any(v[0] > 1 for v in ref.values()), "no gaps — vacuous"
    assert any(
        v[0] < np.sum(keys == k)
        for k, v in ref.items()), "no merges — vacuous"
    got = _run_interval(_interval_tbl(keys, starts, durs),
                        blocks, parts)
    assert got == ref


def test_interval_union_touching_and_nested(ray_session):
    # touching intervals merge (e == next s); a giant interval
    # swallows later ones (running max, not last end)
    keys = [1, 1, 1, 2, 2, 2]
    starts = [0, 10, 20, 0, 5, 100]
    durs = [10, 10, 5, 90, 10, 7]
    ref = _interval_ref(keys, starts, durs)
    assert ref[1] == (1, 25) and ref[2] == (2, 97)
    got = _run_interval(_interval_tbl(keys, starts, durs), 2, 4)
    assert got == ref


def test_interval_union_hot_key_many_blocks(ray_session):
    # one key spanning every block: seeded cumsum carry + boundary dt
    # seams both bite; interleaved long intervals keep active>1 across
    # block edges
    rng = np.random.default_rng(3)
    n = 20_000
    starts = np.cumsum(rng.integers(0, 30, n))
    durs = rng.integers(1, 200, n)
    keys = np.zeros(n, np.int64)
    ref = _interval_ref(keys, starts, durs)
    got = _run_interval(_interval_tbl(keys, starts, durs), 24, 24)
    assert got == ref


def test_interval_union_contracts(ray_session):
    import ray.data
    from soupflow.data.windows import interval_union
    bad = _interval_tbl([1], [0], [5]).set_column(
        3, "dur", pa.array([0], pa.int64()))
    with pytest.raises(Exception):
        interval_union(ray.data.from_arrow(bad), key_col="k",
                       ts_col="ts", id_col="id",
                       dur_col="dur").to_pandas()
    skey = pa.table({
        "k": pa.array(["a"], pa.string()),
        "ts": pa.array(np.asarray([0], np.int64), pa.timestamp("us")),
        "id": pa.array([0], pa.int64()),
        "dur": pa.array([5], pa.int64())})
    with pytest.raises(Exception):
        interval_union(ray.data.from_arrow(skey), key_col="k",
                       ts_col="ts", id_col="id",
                       dur_col="dur").to_pandas()

"""Benchmark decontamination (data/decontam.py): sentinel-padded
vectorized n-gram hashing + broadcast membership."""
import numpy as np
import pyarrow as pa
import pytest

from soupflow.data.decontam import (_doc_grams, _gram_hashes,
                                    _word_hashes, benchmark_gram_set,
                                    decontaminate)


def grams_of(texts, n):
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return _doc_grams(b, n)


def test_gram_counts_per_doc():
    di, g = grams_of(["a b c d e", "c d e f g", "x", ""], 3)
    assert np.bincount(di, minlength=4).tolist() == [3, 3, 0, 0]
    assert len(g) == 6


def test_shared_gram_hashes_equal_across_docs():
    di, g = grams_of(["a b c d", "z b c d"], 3)
    # 'b c d' occurs in both docs → identical hash
    shared = set(g[di == 0]) & set(g[di == 1])
    assert len(shared) == 1


def test_windows_never_cross_documents():
    # if windows crossed docs, 'b c' + 'x y' adjacency would create a
    # gram; doc0 ends 'b c', doc1 starts 'x y' — assert no gram of
    # doc0 equals any gram of the concatenated text beyond its own
    di, g = grams_of(["a b c", "x y z"], 3)
    assert np.bincount(di, minlength=2).tolist() == [1, 1]
    wh = _word_hashes(np.array(["c", "x", "y"], dtype=object))
    crossing = _gram_hashes(wh, 3)[0]
    assert crossing not in set(g)


def test_order_sensitivity():
    di, g = grams_of(["a b c", "c b a"], 3)
    assert g[di == 0][0] != g[di == 1][0]


def test_doc_shorter_than_n_yields_nothing():
    di, g = grams_of(["a b", "  ", "c"], 3)
    assert len(g) == 0


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_planted():
    import ray

    bench_texts = ["the secret eval passage here",
                   "another held out benchmark line"]
    train_texts = [
        "totally clean document with fresh words",     # clean
        "prefix the secret eval passage here suffix",  # 5 shared 4-grams? (contains full bench string)
        "another held out benchmark line",             # exact dup of bench
        "note the secret eval passage",                # 1 shared 4-gram
    ]
    bench = ray.data.from_items(
        [{"doc_id": 100 + i, "text": t}
         for i, t in enumerate(bench_texts)])
    train = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(train_texts)])
    out = {r["doc_id"]: r for r in
           decontaminate(train, bench, n=4).take_all()}
    assert not out[0]["contaminated"]
    assert out[1]["contaminated"] and out[1]["n_contaminated"] == 2
    assert out[2]["contaminated"] and out[2]["n_contaminated"] == 2
    assert out[3]["contaminated"] and out[3]["n_contaminated"] == 1


@pytest.mark.usefixtures("ray_session")
def test_benchmark_gram_set_sorted_unique():
    import ray
    bench = ray.data.from_items(
        [{"doc_id": 0, "text": "a b c d"},
         {"doc_id": 1, "text": "a b c d"}])  # dup doc → same grams
    s = benchmark_gram_set(bench, n=4)
    assert len(s) == 1
    assert (np.sort(s) == s).all()


@pytest.mark.usefixtures("ray_session")
def test_empty_benchmark_means_no_contamination():
    import ray
    bench = ray.data.from_items([{"doc_id": 9, "text": "x"}])  # < n
    train = ray.data.from_items([{"doc_id": 0, "text": "a b c d e"}])
    rows = decontaminate(train, bench, n=4).take_all()
    assert rows[0]["n_contaminated"] == 0
    assert not rows[0]["contaminated"]


# -- Bloom-filter variant -----------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_bloom_matches_exact_at_real_params():
    """At m=2^20/k=4 (the query's params) the FP probability is ~1e-10
    per probe — the Bloom output must equal the exact-set path."""
    import ray

    from soupflow.data.decontam import bloom_decontaminate
    rng = np.random.default_rng(3)
    vocab = [f"v{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 40)))
             for _ in range(200)]
    bench = ray.data.from_items(
        [{"doc_id": 1000 + i, "text": t} for i, t in
         enumerate(texts[:30])])
    train = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    exact = decontaminate(train, bench, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = bloom_decontaminate(train, bench, n=4, log2_m=20, k=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert bloom.equals(exact)


@pytest.mark.usefixtures("ray_session")
def test_bloom_tiny_m_forces_one_sided_fps_and_matches_reference():
    """With a deliberately tiny filter (2^8 bits) collisions are
    guaranteed: the engine must reproduce a scalar-reference Bloom
    EXACTLY (false positives included), and every error must be
    one-sided (flagged ⊇ truly contaminated). Also repartition-stable
    (OR merges commute)."""
    import ray

    from soupflow.data.decontam import (_bloom_positions,
                                        bloom_decontaminate,
                                        bloom_from_grams)
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(80)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 30)))
             for _ in range(150)]
    bench_items = [{"doc_id": 5000 + i, "text": t}
                   for i, t in enumerate(texts[:20])]
    train_items = [{"doc_id": i, "text": t}
                   for i, t in enumerate(texts)]
    log2_m, k, n = 8, 2, 4
    bench = ray.data.from_items(bench_items)
    train = ray.data.from_items(train_items)

    bits = bloom_from_grams(bench, n=n, log2_m=log2_m, k=k)
    # scalar reference: same filter from the raw gram hashes
    ref_bits = np.zeros(1 << (log2_m - 6), dtype=np.uint64)
    bench_grams = np.unique(np.concatenate(
        [grams_of([d["text"]], n)[1] for d in bench_items]))
    for g in bench_grams:
        for p in _bloom_positions(np.array([g], np.uint64), k,
                                  log2_m)[0]:
            ref_bits[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
    assert (bits == ref_bits).all()

    out = bloom_decontaminate(train, bench, n=n, log2_m=log2_m, k=k) \
        .to_pandas().set_index("doc_id")
    exact = decontaminate(train, bench, n=n) \
        .to_pandas().set_index("doc_id")
    # scalar-reference probe per doc + one-sidedness
    sb = np.sort(bench_grams)
    fp_docs = 0
    for d in train_items:
        g = grams_of([d["text"]], n)[1]
        if len(g) == 0:
            continue
        pos = _bloom_positions(g, k, log2_m)
        member = np.ones(len(g), dtype=bool)
        for j in range(k):
            pj = pos[:, j]
            member &= ((ref_bits[pj >> 6]
                        >> (pj.astype(np.uint64) & np.uint64(63)))
                       & np.uint64(1)).astype(bool)
        want = int(member.sum())
        got = int(out.loc[d["doc_id"], "n_contaminated"])
        assert got == want
        assert got >= int(exact.loc[d["doc_id"], "n_contaminated"])
        fp_docs += got > int(exact.loc[d["doc_id"], "n_contaminated"])
    assert fp_docs > 0, "2^8 bits over hundreds of grams must collide"

    out2 = bloom_decontaminate(train.repartition(7), bench,
                               n=n, log2_m=log2_m, k=k) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out2.equals(out.reset_index())

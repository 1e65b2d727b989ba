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

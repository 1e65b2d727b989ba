"""Duplicate-span removal (data/spandedup.py): planted-case scalar
reference, one-sidedness of hashing, and repartition stability."""

import numpy as np
import pyarrow as pa
import pytest

from soupflow.data.spandedup import remove_dup_spans


def _reference(texts, n):
    """Scalar string-exact reference: drop every token covered by any
    occurrence of a corpus-duplicated word n-gram."""
    from collections import Counter
    toks = [t.split() for t in texts]
    cnt = Counter(tuple(w[i:i + n]) for w in toks
                  for i in range(len(w) - n + 1))
    out = []
    for w in toks:
        cov = [False] * len(w)
        for i in range(len(w) - n + 1):
            if cnt[tuple(w[i:i + n])] >= 2:
                for j in range(i, i + n):
                    cov[j] = True
        kept = [x for x, c in zip(w, cov) if not c]
        out.append((len(w), sum(cov), " ".join(kept)))
    return out


@pytest.mark.usefixtures("ray_session")
def test_remove_dup_spans_planted_cases():
    import ray
    shared = "alpha beta gamma delta"  # 4-gram shared across docs
    texts = [
        f"intro {shared} middle words here end",        # covered once
        f"other doc with {shared} inside it too",       # covered once
        "rep rep rep rep rep rep rep rep",              # within-doc dup
        "unique words that appear nowhere else at all", # untouched
        "short doc",                                    # < n: untouched
        "",                                             # empty
    ]
    n = 4
    items = [{"doc_id": i * 3, "text": t} for i, t in enumerate(texts)]
    out = remove_dup_spans(ray.data.from_items(items).repartition(4),
                           n=n).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    ref = _reference(texts, n)
    for i, (nt, nd, cleaned) in enumerate(ref):
        row = out.iloc[i]
        assert row["n_tokens"] == nt, texts[i]
        assert row["n_dup_tokens"] == nd, texts[i]
        assert row["cleaned_text"] == cleaned, texts[i]
    # sanity on the planted structure itself
    assert ref[0][1] == n and ref[1][1] == n       # shared span cut
    assert ref[2] == (8, 8, "")                     # fully removed
    assert ref[3][1] == 0 and ref[4][1] == 0 and ref[5][1] == 0


@pytest.mark.usefixtures("ray_session")
def test_remove_dup_spans_random_reference_and_stability():
    import ray
    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(40)]  # small vocab → real dups
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25)))
             for _ in range(120)]
    items = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    n = 3
    ds = ray.data.from_items(items)
    out = remove_dup_spans(ds.repartition(6), n=n).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = _reference(texts, n)
    got = list(zip(out["n_tokens"], out["n_dup_tokens"],
                   out["cleaned_text"]))
    assert [(int(a), int(b), c) for a, b, c in got] == ref
    assert out["n_dup_tokens"].sum() > 0
    out2 = remove_dup_spans(ds.repartition(13), n=n).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2.equals(out)

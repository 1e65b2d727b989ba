"""Kernel-level tests for textstats: rolling-hash parity with the
byte-at-a-time definition, Mersenne-61 modmul correctness, and
held-out language-ID accuracy (no Ray needed)."""
import random

import numpy as np
import pyarrow as pa
import pytest

from soupflow.data.textstats import (_LANG_TEST, _MOD61, LangIdActor,
                                     _mulmod61, _rolling_hash,
                                     _rolling_hash_batch,
                                     fingerprint_batch, synth_lang_text)


def _scalar_hash(data: bytes) -> int:
    h = 0
    for b in data:
        h = (h * 257 + b) % _MOD61
    return h


def test_mulmod61_fuzz():
    rng = np.random.RandomState(0)
    a = rng.randint(0, _MOD61, size=5000).astype(np.uint64)
    b = rng.randint(0, _MOD61, size=5000).astype(np.uint64)
    r = _mulmod61(a, b)
    assert (r < _MOD61).all()
    for i in range(0, 5000, 457):
        assert int(r[i]) == (int(a[i]) * int(b[i])) % _MOD61


@pytest.mark.parametrize("length", [0, 1, 6, 7, 8, 127, 128, 129, 133,
                                    1000, 10007, 131072])
def test_rolling_hash_parity(length):
    rng = random.Random(length)
    data = bytes(rng.randrange(256) for _ in range(length))
    assert _rolling_hash(data) == _scalar_hash(data)


def test_rolling_hash_batch_parity():
    rng = random.Random(11)
    texts = ["", "a", "hello world", None, "x" * 127, "y" * 128]
    texts += ["".join(rng.choice("abcdefgh \n")
                      for _ in range(rng.randrange(0, 3000)))
              for _ in range(40)]
    got = _rolling_hash_batch(texts)
    for t, g in zip(texts, got):
        assert int(g) == _scalar_hash((t or "").encode())


def test_rolling_hash_vectorized_speedup():
    import time
    rng = random.Random(5)
    data = bytes(rng.randrange(1, 256) for _ in range(512 * 1024))
    _rolling_hash(data)  # warm powers table
    t0 = time.perf_counter()
    h_vec = _rolling_hash(data)
    t_vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    h_ref = _scalar_hash(data)
    t_ref = time.perf_counter() - t0
    assert h_vec == h_ref
    assert t_ref / t_vec > 5  # measured ~23x; keep margin for CI noise


def test_fingerprint_batch_schema_and_values():
    b = pa.table({"doc_id": [1, 2, 3],
                  "text": ["hello world", "", "hello world"]})
    out = fingerprint_batch(b)
    rows = out.to_pylist()
    assert rows[0]["fp_rolling"] == _scalar_hash(b"hello world")
    assert rows[1]["fp_rolling"] == 0
    assert rows[0]["fp_md5"] == rows[2]["fp_md5"]


def test_lang_id_holdout_exhaustive():
    """The detector must classify every held-out synthesized text
    combination correctly — this is what makes `pred_lang = lang` an
    exact oracle (synth space is |test-pool|^3 combos per lang)."""
    actor = LangIdActor()
    for lang in _LANG_TEST:
        texts = [synth_lang_text(lang, d) for d in range(64)]
        batch = pa.table({"doc_id": list(range(64)), "text": texts})
        preds = actor(batch).column("pred_lang").to_pylist()
        assert preds == [lang] * 64


def test_lang_id_empty_is_und():
    actor = LangIdActor()
    batch = pa.table({"doc_id": [1], "text": [""]})
    assert actor(batch).column("pred_lang").to_pylist() == ["und"]


def test_simhash_combo_keyspace_grows_with_corpus():
    """The 6-choose-3 combination keys must not hit a fixed bucket
    ceiling (the old 4x16-bit scheme capped at 2^18 buckets): distinct
    keys should keep growing roughly linearly with corpus size."""
    from soupflow.data.dedup import simhash_combo_keys
    rng = np.random.RandomState(7)

    def n_buckets(n_docs):
        sims = rng.randint(-(1 << 62), 1 << 62, size=n_docs,
                           dtype=np.int64)
        batch = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                          "simhash": pa.array(sims, pa.int64())})
        keys = simhash_combo_keys(batch).column("combo_key")
        return len(keys.unique())

    small, large = n_buckets(2000), n_buckets(16000)
    assert large > 6 * small / 2  # ~8x docs -> ~8x distinct keys
    assert large > (1 << 18)  # provably past the old ceiling


def test_simhash_batch_matches_reference_definition():
    """simhash_batch must equal the scalar md5 bit-majority definition
    (the SQL oracle computes exactly this)."""
    import hashlib

    from soupflow.data.dedup import simhash_batch

    def scalar(text):
        words = text.split()
        if not words:
            return -(1 << 63)
        hs = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                             "big") for w in words]
        acc = 0
        for b in range(64):
            if 2 * sum((x >> b) & 1 for x in hs) > len(words):
                acc |= 1 << b
        return acc - (1 << 63)

    texts = ["hello world hello", "a b c d e f g", "", "single",
             "the quick brown fox jumps over the lazy dog"]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": texts})
    got = simhash_batch(batch).column("simhash").to_pylist()
    assert got == [scalar(t) for t in texts]

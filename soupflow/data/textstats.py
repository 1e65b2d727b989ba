"""Text analysis operators over a documents table (doc_id, text, ...).

All stages are vectorized ``map_batches`` kernels (pandas/numpy inside,
Arrow at the boundary); nothing shuffles except the explicitly-marked
aggregates. Designed for the 100 TB path: pure per-row functions,
no driver-side loops, no materialization.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\s+")
# BPE-ish subword splitter: words, numbers, punctuation runs
_BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace), n_subtokens (BPE-ish regex),
    n_chars_measured, n_alpha (non-space chars)."""
    texts = batch.column("text").to_pandas().fillna("")
    n_tokens = texts.str.split().str.len().fillna(0).astype("int64")
    n_subtokens = texts.map(lambda t: len(_BPEISH_RE.findall(t)))
    n_chars = texts.str.len().astype("int64")
    n_alpha = texts.str.replace(" ", "", regex=False).str.len() \
        .astype("int64")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_subtokens": pa.array(n_subtokens, pa.int64()),
        "n_chars_measured": pa.array(n_chars, pa.int64()),
        "n_alpha": pa.array(n_alpha, pa.int64()),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: token count, mean token length ×100 (int), and an
    is_quality flag (length in [5, 100000] tokens, mean token len ≤ 12)."""
    texts = batch.column("text").to_pandas().fillna("")
    n_tokens = texts.str.split().str.len().fillna(0).astype("int64")
    n_alpha = texts.str.replace(" ", "", regex=False).str.len() \
        .astype("int64")
    mean_len_x100 = np.where(n_tokens > 0,
                             (n_alpha * 100) // n_tokens.clip(lower=1),
                             0).astype("int64")
    is_quality = (n_tokens >= 5) & (n_tokens <= 100000) & \
        (mean_len_x100 <= 1200)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "mean_token_len_x100": pa.array(mean_len_x100, pa.int64()),
        "is_quality": pa.array(is_quality, pa.bool_()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprints: md5 (exact-dup key) + 64-bit rolling hash
    (shift-invariant-ish document fingerprint)."""
    texts = batch.column("text").to_pylist()
    md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    rolling = []
    MOD = (1 << 61) - 1
    BASE = 257
    for t in texts:
        h = 0
        for b in (t or "").encode():
            h = (h * BASE + b) % MOD
        rolling.append(h)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fp_md5": pa.array(md5s, pa.string()),
        "fp_rolling": pa.array(rolling, pa.int64()),
    })


# tiny deterministic n-gram profiles for language ID; heuristic only —
# real corpora would load fasttext-style profiles in an actor __init__.
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", " th", "he "),
    "es": ("de ", " de", "os ", "la ", " la", "ión"),
    "de": ("ein", "der", "sch", "ich", "und", "en "),
    "fr": ("le ", " le", "es ", "de ", "ion", " un"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}


class LangIdActor:
    """Actor-pool language-ID stage: profile tables built once per
    worker; scoring is a vectorized substring count per profile.

    Note: the synthetic documents table's ``lang`` column is random
    metadata — its TEXT is English-ish for every label — so this
    content-based detector correctly reports mostly "en" there and its
    driver check is rows-only (no lang-column oracle by design)."""

    def __init__(self) -> None:
        self.profiles = {lang: list(ngrams)
                         for lang, ngrams in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas().fillna("")
        scores = {}
        for lang, ngrams in self.profiles.items():
            s = None
            for ng in ngrams:
                c = texts.str.count(re.escape(ng))
                s = c if s is None else s + c
            scores[lang] = s
        df = pd.DataFrame(scores)
        pred = df.idxmax(axis=1).where(df.max(axis=1) > 0, "und")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(pred, pa.string()),
        })


def lang_counts(ds):
    """Aggregate: docs per (declared) lang. Pre-aggregated per block
    before the small shuffle (combiner pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("lang").aggregate([("doc_id", "count")])
        return t.rename_columns(["lang", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    return partials.groupby("lang").aggregate(Sum("n", alias_name="n"))

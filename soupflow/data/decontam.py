"""Benchmark decontamination: flag training documents that share any
word n-gram with a (small) benchmark/eval set.

The published shape (GPT-3 appendix C / The Pile / Gopher): build the
benchmark side's n-gram set once, then a single map-side membership
pass over the training corpus — the corpus itself is never shuffled.

Scale shape:
 * The benchmark set is the SMALL side by definition (eval suites are
   thousands of docs, not billions). Its n-gram set is reduced to a
   sorted uint64 hash array and broadcast once via ``ray.put``; every
   train task reads it zero-copy from the object store.
 * Train side is ONE zero-shuffle ``map_batches``: whitespace-split
   via Arrow, n-gram hashes built with a vectorized rolling combine
   over per-word hashes (np.unique over the batch vocabulary — the
   simhash/minhash trick), membership via ``np.searchsorted``.
 * Hashing: per-word splitmix64 over md5-low-64, n-gram hash = ordered
   polynomial combine. 64-bit collisions are ~n²/2⁶⁴ — negligible at
   any eval-set size; the DuckDB oracle checks exact string n-grams,
   so the tests also prove the hash path introduces no error at test
   scale.

For an eval set too big for one broadcast array the same two-phase
layout as minhash applies (partitioned hash join on the gram hash);
not implemented because the premise (eval >> driver memory) does not
occur for decontamination.
"""

from __future__ import annotations

import hashlib
from typing import NamedTuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M64 = (1 << 64) - 1


def _word_hashes(words: np.ndarray) -> np.ndarray:
    """uint64 hash per word — np.unique over the batch's vocabulary,
    md5 only on uniques, gather back."""
    uniq, inv = np.unique(words, return_inverse=True)
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
         for w in uniq),
        dtype=np.uint64, count=len(uniq))
    return h[inv]


def _gram_hashes(wh: np.ndarray, n: int) -> np.ndarray:
    """Ordered polynomial combine over a sliding window of n word
    hashes (vectorized: n shifted multiplies, no Python loop over
    positions)."""
    if len(wh) < n:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(len(wh) - n + 1, dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for j in range(n):
        out = (out * mult + wh[j:len(wh) - n + 1 + j])  # wraps mod 2^64
    # splitmix finalize for avalanche
    out ^= out >> np.uint64(30)
    out *= np.uint64(0xBF58476D1CE4E5B9)
    out ^= out >> np.uint64(27)
    out *= np.uint64(0x94D049BB133111EB)
    return out ^ (out >> np.uint64(31))


# reserved word-hash for the inter-document padding; windows touching
# it are cross-document artifacts and are masked out on BOTH sides
_SENT = np.uint64(0xD6E8FEB86659FD93)


class GramStream(NamedTuple):
    """One batch's tokenized gram view: the raw Arrow token array plus
    numpy index/hash streams (nothing corpus-sized ever becomes a
    Python object — only the batch VOCABULARY is hashed in Python)."""
    toks: pa.Array            # raw split tokens (may contain empties)
    tok_pos: np.ndarray       # indices into toks of the clean tokens
    word_doc: np.ndarray      # doc index per clean token
    clean_counts: np.ndarray  # clean tokens per doc
    gram_doc: np.ndarray      # doc index per valid n-gram
    gram_rel: np.ndarray      # token-relative start per valid n-gram
    grams: np.ndarray         # uint64 hash per valid n-gram


def _vocab_hashes(vocab) -> np.ndarray:
    """uint64 md5-low64 per vocabulary entry (the only Python-level
    string loop — vocab-bounded, never per token)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
         for w in vocab),
        dtype=np.uint64, count=len(vocab))


def _doc_gram_stream(batch: pa.Table, n: int,
                     text_col: str = "text") -> GramStream:
    """The building block for membership decontamination (_doc_grams)
    and span-level dedup (spandedup.remove_dup_spans, which maps dup
    grams back onto token coverage and reconstructs text via Arrow
    take — see GramStream fields).

    Fully vectorized: one Arrow whitespace split, ONE Arrow
    dictionary_encode (so per-word md5 runs over the batch vocabulary
    only and gathers back through int32 codes — no per-token Python
    strings), then ONE sliding-window combine over a single stream
    padded with n-1 sentinel hashes between documents. Windows that
    cross a document boundary contain a sentinel; a validity mask
    (window fits inside its document) drops them — no per-document
    Python loop."""
    nrows = batch.num_rows

    def _bare(counts=None):
        return GramStream(
            pa.array([], pa.string()), np.empty(0, np.int64),
            np.empty(0, np.int64),
            counts if counts is not None
            else np.zeros(nrows, dtype=np.int64),
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, np.uint64))

    if nrows == 0:
        return _bare()
    split = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(batch.column(text_col),
                                             "")), r"\s+")
    lists = split.combine_chunks() \
        if isinstance(split, pa.ChunkedArray) else split
    counts = np.diff(np.asarray(lists.offsets, dtype=np.int64))
    toks = lists.flatten()
    if len(toks) == 0:
        return _bare()
    denc = toks.dictionary_encode()
    idx = np.asarray(denc.indices, dtype=np.int64)
    vocab = denc.dictionary.to_pylist()
    vh = _vocab_hashes(vocab)
    word_doc = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    try:  # regex split of '' yields one empty token
        empty_code = vocab.index("")
    except ValueError:
        empty_code = -1
    clean = idx != empty_code
    tok_pos = np.flatnonzero(clean)
    word_doc = word_doc[clean]
    if tok_pos.size == 0:
        return _bare()
    clean_counts = np.bincount(word_doc, minlength=nrows)
    no_grams = GramStream(toks, tok_pos, word_doc, clean_counts,
                          np.empty(0, np.int64), np.empty(0, np.int64),
                          np.empty(0, np.uint64))
    wh = vh[idx[clean]]

    pad = n - 1
    starts = (np.concatenate(([0], np.cumsum(clean_counts)))[:-1]
              + pad * np.arange(nrows, dtype=np.int64))
    padded = np.full(len(wh) + pad * nrows, _SENT, dtype=np.uint64)
    word_starts = np.concatenate(([0], np.cumsum(clean_counts)))[:-1]
    pos_within = np.arange(len(wh)) - np.repeat(word_starts,
                                                clean_counts)
    padded[np.repeat(starts, clean_counts) + pos_within] = wh

    grams = _gram_hashes(padded, n)
    if len(grams) == 0:
        return no_grams
    win = np.arange(len(grams), dtype=np.int64)
    win_doc = np.searchsorted(starts, win, side="right") - 1
    np.clip(win_doc, 0, nrows - 1, out=win_doc)
    rel = win - starts[win_doc]
    valid = rel <= clean_counts[win_doc] - n
    return GramStream(toks, tok_pos, word_doc, clean_counts,
                      win_doc[valid], rel[valid], grams[valid])


def _doc_grams(batch: pa.Table, n: int,
               text_col: str = "text") -> tuple[np.ndarray, np.ndarray]:
    """→ (doc_index_per_gram, gram_hash) for a batch — the membership
    view of _doc_gram_stream."""
    s = _doc_gram_stream(batch, n, text_col)
    return s.gram_doc, s.grams


def benchmark_gram_set(bench_ds, n: int = 8,
                       text_col: str = "text") -> np.ndarray:
    """Distributed reduction of the benchmark side to a sorted unique
    uint64 gram-hash array (per-task np.unique partials, tiny rows to
    the driver)."""
    def partial(batch: pa.Table) -> pa.Table:
        _, grams = _doc_grams(batch, n, text_col)
        return pa.table({"g": np.unique(grams)})

    parts = bench_ds.map_batches(partial, batch_format="pyarrow")
    arrs = [np.asarray(b.column("g"), dtype=np.uint64)
            for b in parts.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    if not arrs:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(arrs))


def decontaminate(train_ds, bench_ds, n: int = 8,
                  text_col: str = "text"):
    """→ (doc_id, n_contaminated, contaminated): per training doc, how
    many of its word n-grams appear in the benchmark set.

    ONE broadcast (sorted bench gram hashes) + ONE zero-shuffle
    map_batches over the training corpus."""
    import ray

    bench = benchmark_gram_set(bench_ds, n, text_col)
    handle = ray.put(bench)

    def check(batch: pa.Table) -> pa.Table:
        bg = ray.get(handle)
        doc_idx, grams = _doc_grams(batch, n, text_col)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(grams) and len(bg):
            pos = np.searchsorted(bg, grams)
            pos = np.minimum(pos, len(bg) - 1)
            member = bg[pos] == grams
            np.add.at(hits, doc_idx, member.astype(np.int64))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_contaminated": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })
    check.__name__ = "check_contamination"

    return train_ds.map_batches(check, batch_format="pyarrow")


# -- Bloom-filter variant ----------------------------------------------------
#
# Same two-phase layout, but the broadcast side is a CONSTANT-SIZE bit
# array instead of 8 bytes per bench gram: at a 100M-gram eval suite
# the sorted-array broadcast is 800 MB per node while a 2^30-bit Bloom
# is 128 MB at ~1e-4 false-positive rate — and decontamination only
# ever errs toward flagging MORE (one-sided, the safe direction).
# k bit positions per gram come from multiplicative-shift hashes of
# the u64 gram hash (odd constants, top log2(m) bits) — deterministic,
# so the filter contents and any false positive are reproducible
# bit-for-bit by a scalar reference (pytest forces FPs with a tiny m);
# at the query's real parameters (m=2^20, k=4, thousands of bench
# grams) the FP probability is ~(kn/m)^k ≈ 1e-10 per probe, so the
# exact string-membership SQL oracle matches the Bloom output too.

_BLOOM_MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _bloom_positions(grams: np.ndarray, k: int,
                     log2_m: int) -> np.ndarray:
    """(len(grams), k) bit positions: top log2_m bits of gram*A_j."""
    shift = np.uint64(64 - log2_m)
    out = np.empty((len(grams), k), dtype=np.int64)
    for j in range(k):
        with np.errstate(over="ignore"):
            out[:, j] = ((grams * np.uint64(_BLOOM_MULTS[j]))
                         >> shift).astype(np.int64)
    return out


def bloom_from_grams(bench_ds, n: int = 8, log2_m: int = 20,
                     k: int = 4, text_col: str = "text") -> np.ndarray:
    """Benchmark side → packed Bloom bit array (m/64 uint64 words).
    Per-task partials are the same OR-mergeable packed arrays (OR
    commutes — any partitioning builds the identical filter)."""
    words = 1 << (log2_m - 6)

    def partial(batch: pa.Table) -> pa.Table:
        _, grams = _doc_grams(batch, n, text_col)
        bits = np.zeros(words, dtype=np.uint64)
        if len(grams):
            pos = _bloom_positions(np.unique(grams), k, log2_m)
            flat = pos.reshape(-1)
            np.bitwise_or.at(bits, flat >> 6,
                             np.uint64(1) << (flat.astype(np.uint64)
                                              & np.uint64(63)))
        nz = np.nonzero(bits)[0]
        return pa.table({"word": pa.array(nz.astype(np.int64)),
                         "bits": pa.array(bits[nz], pa.uint64())})
    partial.__name__ = f"bloom{log2_m}_partial"

    from ..io import collect_table
    t = collect_table(bench_ds.map_batches(partial,
                                           batch_format="pyarrow"))
    bits = np.zeros(words, dtype=np.uint64)
    if t.num_rows:
        np.bitwise_or.at(
            bits, t.column("word").to_numpy(zero_copy_only=False),
            t.column("bits").to_numpy(zero_copy_only=False))
    return bits


def bloom_decontaminate(train_ds, bench_ds, n: int = 8,
                        log2_m: int = 20, k: int = 4,
                        text_col: str = "text"):
    """→ (doc_id, n_contaminated, contaminated) like ``decontaminate``
    but probing the constant-size Bloom filter: ONE broadcast (packed
    bits, m/8 bytes regardless of eval size) + ONE zero-shuffle
    map_batches; membership = all k bits set (vectorized gather +
    AND-reduce)."""
    import ray

    bits = bloom_from_grams(bench_ds, n, log2_m, k, text_col)
    handle = ray.put(bits)

    def check(batch: pa.Table) -> pa.Table:
        bf = ray.get(handle)
        doc_idx, grams = _doc_grams(batch, n, text_col)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(grams):
            pos = _bloom_positions(grams, k, log2_m)
            member = np.ones(len(grams), dtype=bool)
            for j in range(k):
                pj = pos[:, j]
                member &= (bf[pj >> 6]
                           >> (pj.astype(np.uint64) & np.uint64(63))
                           & np.uint64(1)).astype(bool)
            np.add.at(hits, doc_idx, member.astype(np.int64))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_contaminated": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })
    check.__name__ = "bloom_check_contamination"

    return train_ds.map_batches(check, batch_format="pyarrow")

"""Duplicate-SPAN removal — ExactSubstr-style dedup at sub-document
granularity (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"; the RefinedWeb/C4 production variant).

Whole-document dedup (data/dedup.py) misses boilerplate: two distinct
pages sharing a 40-word license header survive MinHash. Span dedup
instead finds every word n-gram occurring ≥2 times in the CORPUS
(within- or cross-document) and removes every token covered by any
duplicated gram occurrence — a deterministic, partitioning-independent
rule (the symmetric "drop all copies" form; keeping one copy requires
a global occurrence order, which no distributed engine can define
stably under re-partitioning).

Scale shape:
 * Pass 1 — dup-gram discovery: each block reduces its text to
   (gram_hash u64, count) partials via the sentinel-padded vectorized
   stream shared with decontamination (np.unique pre-combine), then
   ONE narrow groupby-sum keeps hashes with total count ≥ 2. This is
   the honest cost: ~16 bytes/token shuffled once — the distributed
   analogue of Lee et al.'s suffix array. Text never shuffles.
 * Pass 2 — removal: the dup-gram set broadcasts once (ray.put; it is
   dup-bounded, not corpus-bounded) and ONE zero-shuffle map_batches
   recomputes each block's gram stream, marks member gram starts, and
   expands them to token coverage with a single diff/cumsum — no
   per-document Python. For corpora whose dup-gram set outgrows a
   broadcast, the same two-join partitioned hatch as exact_dedup
   applies (gram stream ⋈ dup table on hash, positions ⋈ docs on id);
   not implemented here because every driver corpus is dup-bounded.

Hashing: the same md5-low64 word hashes + polynomial window combine as
decontamination; 64-bit collisions (~tokens²/2⁶⁴) could only remove a
FEW extra tokens, and the exact-string SQL oracle proves none occur at
test scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .decontam import _doc_gram_stream


def dup_gram_table(docs, n: int = 8, text_col: str = "text"):
    """Corpus-wide duplicated-gram hashes → narrow Dataset (g: uint64)
    of every word n-gram hash with total occurrence count ≥ 2."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        grams = _doc_gram_stream(batch, n, text_col).grams
        g, c = np.unique(grams, return_counts=True)
        # int64 bit-view: Ray's groupby rebuilds keys through Python
        # ints and overflows on uint64 > 2^63; only equality matters
        # here, so the signed reinterpretation is lossless.
        return pa.table({"g": pa.array(g.view(np.int64), pa.int64()),
                         "c": pa.array(c.astype(np.int64))})
    partial.__name__ = f"gram{n}_count_partial"

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("c", alias_name="c"))
    return agg.filter(expr="c >= 2").select_columns(["g"])


def remove_dup_spans(docs, n: int = 8, id_col: str = "doc_id",
                     text_col: str = "text"):
    """→ (doc_id, n_tokens, n_dup_tokens, cleaned_text): every token
    covered by ANY occurrence of a corpus-duplicated word n-gram is
    removed; cleaned_text re-joins the survivors with single spaces.
    Docs shorter than n words are untouched (they contain no gram)."""
    import ray

    from ..io import collect_table

    dup_tbl = collect_table(dup_gram_table(docs, n, text_col))
    # int64 domain throughout (see dup_gram_table): sort + searchsorted
    # only need a consistent total order, not unsigned semantics
    dup = np.sort(dup_tbl.column("g").to_numpy(zero_copy_only=False)
                  .astype(np.int64, copy=False)) \
        if dup_tbl.num_rows else np.empty(0, np.int64)
    handle = ray.put(dup)

    def scrub(batch: pa.Table) -> pa.Table:
        dg = ray.get(handle)
        s = _doc_gram_stream(batch, n, text_col)
        counts = s.clean_counts
        nw = s.tok_pos.size
        covered = np.zeros(nw, dtype=bool)
        if len(s.grams) and len(dg):
            grams = s.grams.view(np.int64)
            pos = np.searchsorted(dg, grams)
            pos = np.minimum(pos, len(dg) - 1)
            member = dg[pos] == grams
            if member.any():
                word_starts = np.concatenate(
                    ([0], np.cumsum(counts)))[:-1]
                start = word_starts[s.gram_doc[member]] \
                    + s.gram_rel[member]
                # expand each member gram to its n tokens with one
                # diff/cumsum (grams never cross documents, so
                # start+n never crosses either)
                delta = np.zeros(nw + 1, dtype=np.int64)
                np.add.at(delta, start, 1)
                np.add.at(delta, start + n, -1)
                covered = np.cumsum(delta[:-1]) > 0
        n_dup = np.bincount(s.word_doc[covered],
                            minlength=batch.num_rows).astype(np.int64)
        # survivors rebuilt with Arrow take over the raw token array —
        # no Python string ever materializes
        kept = s.toks.take(
            pa.array(s.tok_pos[~covered], pa.int64())) \
            if nw else pa.array([], pa.string())
        offs = np.concatenate(
            ([0], np.cumsum(counts - n_dup))).astype(np.int32)
        cleaned = pa.ListArray.from_arrays(offs, kept)
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": batch.column(id_col),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_dup_tokens": pa.array(n_dup, pa.int64()),
            "cleaned_text": pc.binary_join(cleaned, " "),
        })
    scrub.__name__ = "remove_dup_spans"

    return docs.map_batches(scrub, batch_format="pyarrow")

"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
subword-vocabulary pass every LLM data pipeline runs before token
counting).

Scale shape: the CORPUS shuffles exactly once — the word-frequency
aggregate, bounded by vocabulary — and every merge round after that
touches only the word table. Words are carried as BOUNDARY-DELIMITED
segmentation strings (``\\x1f\\x1f sym \\x1f\\x1f sym … \\x1f\\x1f``):
adjacent-pair counting is an Arrow split + numpy segment op per block
(no per-word Python) feeding ONE pair-bounded groupby, the winning
pair (max count, lexicographic tie-break) broadcasts from the driver,
and the merge applies as a single vectorized ``replace_substring``
whose left-to-right non-overlapping scan reproduces textbook greedy
BPE exactly (see the BOUND note below) while the boundaries make
symbol-exact (never substring) matches. The identical representation
drives the SQL oracle, so the whole k-round training run is
bit-comparable across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x1f"      # half-boundary sentinel
BOUND = SEP * 2   # symbol boundary (between symbols and at both ends)
PSEP = "\x1e"    # inside packed (a, b) pair codes

# A merge of (a, b) matches SEP+a+BOUND+b+SEP and emits SEP+ab+SEP:
# each match consumes only the INNER halves of its surrounding
# boundaries, so adjacent matches in a repeated-symbol run each keep a
# half-sentinel to anchor on — replace's left-to-right non-overlapping
# scan then reproduces TEXTBOOK greedy BPE exactly ('aaaa' -> aa aa,
# 'aaaaa' -> aa aa a), which single-sentinel boundaries do not (the
# shared separator gets consumed and every other merge is skipped).


def _word_freq(ds, text_col: str):
    """(word, n) over whitespace-split lowercased tokens — per-block
    Arrow group_by partials, ONE vocabulary-bounded groupby."""
    from ray.data.aggregate import Sum

    from .textstats import _text_array, _ws_tokens

    def partial(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(_text_array(batch))
        _, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        toks = toks[toks != ""]
        uniq, cnt = np.unique(toks, return_counts=True)
        return pa.table({"w": pa.array(uniq, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})
    partial.__name__ = "bpe_word_freq_partial"

    return ds.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("n", alias_name="n"))


def _to_segmented(batch: pa.Table) -> pa.Table:
    """word → sentinel-delimited character segmentation, vectorized
    (one RE2 replace inserting a sentinel before every codepoint +
    one element-wise join for the trailing sentinel)."""
    s = pc.replace_substring_regex(batch.column("w"), pattern="(.)",
                                   replacement=BOUND + r"\1")
    # append the trailing boundary (the LAST argument of
    # binary_join_element_wise is the separator — join on "")
    s = pc.binary_join_element_wise(
        s, pa.array([BOUND] * batch.num_rows, pa.string()),
        pa.scalar(""))
    return pa.table({"w": batch.column("w"), "n": batch.column("n"),
                     "s": s})


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Per-block adjacent-symbol pair counts weighted by word
    frequency (overlapping adjacencies count — the BPE statistic)."""
    if batch.num_rows == 0:
        return pa.table({"pair": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    ls = pc.split_pattern(
        pc.utf8_trim(batch.column("s"), SEP), pattern=BOUND)
    if isinstance(ls, pa.ChunkedArray):
        ls = ls.combine_chunks()
    offs = ls.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = ls.values.to_numpy(zero_copy_only=False)
    # a sliced ListArray's values child is unsliced — re-base both
    vals = vals[offs[0]:offs[-1]]
    offs = offs - offs[0]
    n = batch.column("n").to_numpy(zero_copy_only=False)
    if vals.size < 2:
        return pa.table({"pair": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    # adjacency (i, i+1) is a pair iff i+1 is not a word start
    starts = np.zeros(vals.size, dtype=bool)
    starts[offs[:-1]] = True
    valid = ~starts[1:]
    a = vals[:-1][valid]
    b = vals[1:][valid]
    lens = np.diff(offs)
    wrow = np.repeat(np.arange(n.size), np.maximum(lens - 1, 0))
    pairs = np.char.add(np.char.add(a.astype(str), PSEP),
                        b.astype(str))
    uniq, inv = np.unique(pairs, return_inverse=True)
    acc = np.zeros(uniq.size, np.int64)
    np.add.at(acc, inv, n[wrow])
    return pa.table({"pair": pa.array(uniq, pa.string()),
                     "c": pa.array(acc, pa.int64())})


def _pair_argmax(pair: np.ndarray, c: np.ndarray) -> int:
    """Index of the winning pair under the BPE tie rule: count desc,
    then (lhs, rhs) ascending compared COMPONENT-wise (split on PSEP
    — raw-string order would let a sub-PSEP codepoint inside a symbol
    flip the comparison)."""
    ab = np.array([p.split(PSEP) for p in pair], dtype=object)
    if ab.ndim == 1:          # single row: np.array gives 1-D
        ab = ab.reshape(1, 2)
    return int(np.lexsort((ab[:, 1], ab[:, 0], -c))[0])


def _pair_top1_partial(batch: pa.Table) -> pa.Table:
    """Per-block argmax under the exact merge tie rule — the groupby
    output holds each distinct pair exactly once, so the global winner
    is the winner among block winners and only O(blocks) single-row
    partials ever reach the driver (the pair table itself tracks
    distinct adjacencies ~ distinct words at web scale; it must never
    collect). Tolerates Ray 2.49's schema-less empty blocks."""
    if batch.num_rows == 0 or "pair" not in batch.schema.names:
        return pa.table({"pair": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    c = batch.column("c").to_numpy(zero_copy_only=False)
    cmax = c.max()
    tied = np.nonzero(c == cmax)[0]
    if tied.size > 1:
        sub = np.asarray(
            batch.column("pair").take(pa.array(tied)).to_pylist(),
            dtype=object)
        best = int(tied[_pair_argmax(sub, c[tied])])
    else:
        best = int(tied[0])
    return batch.slice(best, 1).select(["pair", "c"])


def bpe_train(ds, text_col: str = "text", num_merges: int = 8):
    """Run ``num_merges`` BPE rounds over the corpus' word table.
    Returns ``(merges_table, word_ds)`` where merges_table has one
    row per round: (rank, lhs, rhs, n_pair) — the trained merge list
    — and word_ds is the final segmented (w, n, s) Dataset. Raises if
    a round finds no adjacent pair (vocabulary fully merged)."""
    from ray.data.aggregate import Sum

    from ..io import collect_table

    word_ds = _word_freq(ds, text_col) \
        .map_batches(_to_segmented, batch_format="pyarrow") \
        .materialize()

    ranks, lhss, rhss, cnts = [], [], [], []
    for r in range(num_merges):
        pt = collect_table(
            word_ds.map_batches(_pair_partial, batch_format="pyarrow")
            .groupby("pair").aggregate(Sum("c", alias_name="c"))
            .map_batches(_pair_top1_partial, batch_format="pyarrow"))
        if pt.num_rows == 0:
            raise ValueError(f"BPE round {r}: no adjacent pairs left")
        pair = np.asarray(pt.column("pair").to_pylist(), dtype=object)
        c = pt.column("c").to_numpy(zero_copy_only=False)
        best = _pair_argmax(pair, c)
        lhs, rhs = pair[best].split(PSEP)
        ranks.append(r)
        lhss.append(lhs)
        rhss.append(rhs)
        cnts.append(int(c[best]))

        find = SEP + lhs + BOUND + rhs + SEP
        repl = SEP + lhs + rhs + SEP

        def apply_merge(batch: pa.Table, find=find, repl=repl
                        ) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("s"), "s",
                pc.replace_substring(batch.column("s"), pattern=find,
                                     replacement=repl))
        apply_merge.__name__ = f"bpe_apply_merge_{r}"

        word_ds = word_ds.map_batches(
            apply_merge, batch_format="pyarrow").materialize()

    merges = pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "lhs": pa.array(lhss, pa.string()),
        "rhs": pa.array(rhss, pa.string()),
        "n_pair": pa.array(cnts, pa.int64())})
    return merges, word_ds


def bpe_encode_token_counts(ds, merges: pa.Table,
                            text_col: str = "text",
                            doc_id_col: str = "doc_id"):
    """Apply a trained merge list to the corpus — the tokenizer
    APPLICATION pass every training pipeline runs after (and far more
    often than) training — and emit (doc_id, n_words, n_tokens) per
    document.

    Scale shape: ZERO shuffle. The merge list (k rows) broadcasts via
    ray.put; each block lowercases + whitespace-splits its own docs,
    encodes each DISTINCT word in the block exactly once (np.unique
    + the same vectorized sentinel replace_substring kernel training
    uses, applied in rank order — distinct-word-bounded work, never
    per-token), and maps token counts back to docs with one segment
    sum. Token count per word falls out of the representation itself:
    a segmentation holds n_sym + 1 double-sentinel boundaries, so
    n_tokens = count_substring(s, BOUND) - 1 with no split or parse.
    The identical representation drives the SQL oracle's CTE chain,
    so per-document counts are bit-comparable across engines."""
    import ray

    from .textstats import _segment_sum, _text_array, _ws_tokens

    rules = list(zip(merges.column("lhs").to_pylist(),
                     merges.column("rhs").to_pylist()))
    handle = ray.put(rules)

    def encode(batch: pa.Table) -> pa.Table:
        rules_ = ray.get(handle)
        arr = pc.utf8_lower(_text_array(batch, text_col))
        offs, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(toks, return_inverse=True)
        seg = pc.replace_substring_regex(
            pa.array(uniq, pa.string()), pattern="(.)",
            replacement=BOUND + r"\1")
        seg = pc.binary_join_element_wise(
            seg, pa.array([BOUND] * len(uniq), pa.string()),
            pa.scalar(""))
        for lhs, rhs in rules_:
            seg = pc.replace_substring(
                seg, pattern=SEP + lhs + BOUND + rhs + SEP,
                replacement=SEP + lhs + rhs + SEP)
        # n_sym = boundaries - 1; the "" token (split edge artifact)
        # segments to a single BOUND -> clamps to 0, matching the
        # oracle's x <> '' filter without a second pass.
        ntok_u = np.maximum(
            pc.count_substring(seg, pattern=BOUND)
            .to_numpy(zero_copy_only=False).astype(np.int64) - 1, 0)
        per_tok = ntok_u[inv]
        n_tokens = _segment_sum(per_tok.astype(np.int64), offs)
        n_words = _segment_sum((toks != "").astype(np.int64), offs)
        return pa.table({
            doc_id_col: batch.column(doc_id_col),
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64())})
    encode.__name__ = "bpe_encode_counts"

    return ds.select_columns([doc_id_col, text_col]) \
        .map_batches(encode, batch_format="pyarrow")

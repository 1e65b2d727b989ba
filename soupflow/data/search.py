"""Distributed text search scoring: BM25 top-k over a documents table.

Scale shape: ONE streaming pass computes a narrow per-doc stats table
(doc_id, dl, tf per query term — a handful of ints per doc; the text
never leaves the map task). Global stats (N, Σdl, per-term document
frequency) are ONE constant-size aggregate over that narrow table;
scoring is then map-side with the broadcast constants, and only the
top-k survives the final sort. No inverted index is materialized —
for ad-hoc queries over a crawl this touches each doc once; a served
search system would instead build the (term → postings) index with
groupby(term), which is the same narrow-table shuffle shape.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..io import collect_table
from .textstats import _segment_sum, _text_array, _ws_tokens


def _doc_term_stats(terms):
    def stats(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(_text_array(batch))
        offs, flat = _ws_tokens(arr)
        nonempty = pc.not_equal(flat, "") \
            .to_numpy(zero_copy_only=False)
        cols = {
            "doc_id": batch.column("doc_id"),
            "dl": pa.array(_segment_sum(nonempty, offs), pa.int64()),
        }
        for i, term in enumerate(terms):
            hits = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            cols[f"tf{i}"] = pa.array(_segment_sum(hits, offs),
                                      pa.int64())
        return pa.table(cols)
    stats.__name__ = "doc_term_stats"
    return stats


def bm25_topk(docs, terms: tuple[str, ...], k: int = 20,
              k1: float = 1.2, b: float = 0.75):
    """→ (doc_id, score) for the ``k`` highest-BM25 docs against the
    bag-of-words query ``terms`` (score > 0 only; ties broken by
    ascending doc_id so the cut is deterministic).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene form); per-term
    contribution idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)),
    summed in term order (the SQL oracle mirrors the exact expression
    tree so float results are bit-comparable).
    """
    from ray.data.aggregate import Count, Sum

    stats = docs.select_columns(["doc_id", "text"]) \
        .map_batches(_doc_term_stats(terms), batch_format="pyarrow") \
        .materialize()  # narrow: (2 + n_terms) ints per doc

    def presence(batch: pa.Table) -> pa.Table:
        cols = {"dl": batch.column("dl")}
        for i in range(len(terms)):
            cols[f"tf{i}"] = batch.column(f"tf{i}")
            cols[f"p{i}"] = pc.cast(
                pc.greater(batch.column(f"tf{i}"), 0), pa.int64())
        return pa.table(cols)

    agg_row = stats.map_batches(presence, batch_format="pyarrow") \
        .aggregate(Count(alias_name="n_docs"),
                   Sum("dl", alias_name="sum_dl"),
                   *[Sum(f"p{i}", alias_name=f"df{i}")
                     for i in range(len(terms))])
    n_docs = float(agg_row["n_docs"])
    avgdl = float(agg_row["sum_dl"]) / n_docs
    idf = [math.log(1.0 + (n_docs - float(agg_row[f"df{i}"]) + 0.5)
                    / (float(agg_row[f"df{i}"]) + 0.5))
           for i in range(len(terms))]

    def score(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        total = np.zeros(batch.num_rows, dtype=np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        for i in range(len(terms)):
            tf = batch.column(f"tf{i}") \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            total = total + idf[i] * tf * (k1 + 1.0) / (tf + norm)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "score": pa.array(total, pa.float64()),
        })
    score.__name__ = "bm25_score"

    return stats.map_batches(score, batch_format="pyarrow") \
        .filter(expr="score > 0") \
        .sort(["score", "doc_id"], descending=[True, False]) \
        .limit(k)


def tfidf_topk(docs, k: int = 5, id_col: str = "doc_id",
               join: str = "broadcast",
               num_partitions: int = 16):
    """Per-document top-k TF-IDF terms → (doc_id, term, tfidf):
    tfidf = tf(term, doc) * ln(n_docs / df(term)), ranked per doc by
    (tfidf desc, term asc); zero-idf terms (present in every doc) are
    dropped. The keyword-extraction primitive.

    Scale shape: pass 1 reduces the corpus to a NARROW (term,
    doc-count) table — per batch, tokens collapse to distinct
    (doc, term) pairs via one np.unique, plus a sentinel '' row per
    doc so n_docs rides the same aggregate (text never shuffles;
    whitespace tokens can't be empty so the sentinel is collision
    free). The df table is broadcast once (vocabulary-bounded — cap
    it by hashing terms to uint64, or set ``join="partitioned"`` for
    open-web vocabularies: the (doc, term, tf) narrow stream
    hash-joins the DISTRIBUTED df table on term and the per-doc cut
    runs through grouped_topk — only narrow rows shuffle, nothing
    vocabulary-sized ever lands on the driver). Pass 2 scores
    map-side and emits ≤ k rows per doc via the grouped-topk lexsort
    mask."""
    import ray

    from .rank import _topk_mask

    def _doc_term_pairs(batch: pa.Table):
        """(doc_idx, term-code, unique terms, pair rows) for one
        batch: one np.unique over the flat lowercased token stream."""
        arr = pc.utf8_lower(_text_array(batch))
        offs, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            np.diff(offs))
        keep = toks != ""
        toks, doc_idx = toks[keep], doc_idx[keep]
        uniq, codes = np.unique(toks, return_inverse=True)
        pair = doc_idx * max(len(uniq), 1) + codes
        return doc_idx, codes, uniq, pair

    def df_partial(batch: pa.Table) -> pa.Table:
        doc_idx, codes, uniq, pair = _doc_term_pairs(batch)
        upair = np.unique(pair)
        # distinct docs per term within the batch
        per_term = np.bincount(upair % max(len(uniq), 1),
                               minlength=len(uniq)).astype(np.int64)
        terms = list(uniq) + [""]
        ns = np.append(per_term, np.int64(len(batch)))
        return pa.table({"term": pa.array(terms, pa.string()),
                         "n": pa.array(ns, pa.int64())})
    df_partial.__name__ = "df_partial"

    from ray.data.aggregate import Sum
    df_agg = docs.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))

    if join == "partitioned":
        from .rank import grouped_topk

        # Materialize the aggregated term table ONCE: it feeds both
        # the sentinel collect below and the join — without this the
        # full corpus tokenize+groupby lineage executes twice.
        df_agg = df_agg.materialize()
        nd_tbl = collect_table(df_agg.filter(expr="term == ''"))
        n_docs = float(nd_tbl.column("n")[0].as_py()) \
            if nd_tbl.num_rows else 0.0
        df_ds = df_agg.filter(expr="term != ''") \
            .repartition(num_partitions)  # non-empty blocks for join

        def doc_term(batch: pa.Table) -> pa.Table:
            doc_idx, codes, uniq, pair = _doc_term_pairs(batch)
            upair, tf = np.unique(pair, return_counts=True)
            nu = max(len(uniq), 1)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": pa.array(ids[upair // nu], pa.int64()),
                "term": pa.array(uniq[upair % nu], pa.string()),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
            })
        doc_term.__name__ = "doc_term_tf"

        joined = docs.map_batches(doc_term, batch_format="pyarrow") \
            .join(df_ds, join_type="inner",
                  num_partitions=num_partitions, on=("term",))

        def score_j(batch: pa.Table) -> pa.Table:
            tf = batch.column("tf").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            n = batch.column("n").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            tfidf = tf * np.log(n_docs / n)
            t = pa.table({
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "tfidf": pa.array(tfidf, pa.float64()),
            })
            return t.filter(pa.array(tfidf > 0.0))
        score_j.__name__ = "tfidf_score"

        import pandas as pd
        top = grouped_topk(
            joined.map_batches(score_j, batch_format="pyarrow"),
            key="doc_id", order_col="tfidf", k=k, tie="term")

        def strip(df: pd.DataFrame) -> pd.DataFrame:
            return df[["doc_id", "term", "tfidf"]]
        return top.map_batches(strip, batch_format="pandas")

    df_tbl = collect_table(df_agg)
    terms_np = np.asarray(df_tbl.column("term").to_pylist(),
                          dtype=object)
    ns_np = df_tbl.column("n").to_numpy(zero_copy_only=False)
    sent = terms_np == ""
    n_docs = float(ns_np[sent][0]) if sent.any() else 0.0
    order = np.argsort(terms_np[~sent])
    vocab = terms_np[~sent][order]
    df_arr = ns_np[~sent][order].astype(np.float64)
    handle = ray.put((vocab, df_arr, n_docs))

    def score(batch: pa.Table) -> pa.Table:
        vocab_, df_, nd = ray.get(handle)
        doc_idx, codes, uniq, pair = _doc_term_pairs(batch)
        upair, tf = np.unique(pair, return_counts=True)
        nu = max(len(uniq), 1)
        u_doc, u_code = upair // nu, upair % nu
        # Bounds+equality-guarded gather: an out-of-vocab term (only
        # possible if scoring a different corpus than the vocab was
        # built on) gets idf 0 and drops below, matching the
        # partitioned path's inner-join semantics — never IndexError.
        idf = np.zeros(len(u_code), dtype=np.float64)
        if len(vocab_):
            pos = np.minimum(np.searchsorted(vocab_, uniq[u_code]),
                             len(vocab_) - 1)
            inv = vocab_[pos] == uniq[u_code]
            idf[inv] = np.log(nd / df_[pos[inv]])
        tfidf = tf.astype(np.float64) * idf
        keep = tfidf > 0.0
        u_doc, u_code, tfidf = u_doc[keep], u_code[keep], tfidf[keep]
        idx = _topk_mask(u_doc, tfidf, uniq[u_code], k)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[u_doc[idx]], pa.int64()),
            "term": pa.array(uniq[u_code[idx]], pa.string()),
            "tfidf": pa.array(tfidf[idx], pa.float64()),
        })
    score.__name__ = f"tfidf_top{k}"

    return docs.map_batches(score, batch_format="pyarrow")


def inverted_index(docs, id_col: str = "doc_id",
                   num_buckets: int = 64):
    """Materialize the (term → postings) search index: one row per
    term with df, total tf, and the postings list itself as a compact
    ``doc:tf`` string ordered by doc_id (the delta-encodable layout a
    served index would write).

    Scale shape: the corpus reduces MAP-SIDE to narrow (doc_id, term,
    tf) rows (text never shuffles); terms are hash-bucketed so the ONE
    groupby shuffles vocabulary-bounded narrow rows into ``num_buckets``
    evenly-spread groups (no per-term Python: each bucket's kernel is
    one lexsort + segment offsets + one Arrow list binary_join). Raise
    ``num_buckets`` with cluster size; postings for a pathological
    stopword are bounded by df — a production index would cap or
    tier those (documented, not needed for the driver corpora)."""
    from .decontam import _word_hashes

    def doc_term(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(_text_array(batch))
        offs, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            np.diff(offs))
        keep = toks != ""
        toks, doc_idx = toks[keep], doc_idx[keep]
        uniq, codes = np.unique(toks, return_inverse=True)
        nu = max(len(uniq), 1)
        upair, tf = np.unique(doc_idx * nu + codes,
                              return_counts=True)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ucodes = upair % nu
        bucket = (_word_hashes(uniq) % np.uint64(num_buckets)) \
            .astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[upair // nu], pa.int64()),
            "term": pa.array(uniq[ucodes], pa.string()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "bucket": pa.array(bucket[ucodes], pa.int64()),
        })
    doc_term.__name__ = "doc_term_tf_bucketed"

    def build_bucket(grp: pa.Table) -> pa.Table:
        terms = grp.column("term").to_numpy(zero_copy_only=False)
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        tf = grp.column("tf").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(terms, return_inverse=True)
        order = np.lexsort((doc, codes))
        codes, doc, tf = codes[order], doc[order], tf[order]
        # segment offsets per term ((term, doc) pairs are globally
        # unique — a doc's text lives in exactly one row)
        starts = np.flatnonzero(np.diff(codes, prepend=-1))
        offs = np.append(starts, len(codes)).astype(np.int32)
        entry = pc.binary_join_element_wise(
            pc.cast(pa.array(doc, pa.int64()), pa.string()),
            pc.cast(pa.array(tf, pa.int64()), pa.string()), ":")
        postings = pc.binary_join(
            pa.ListArray.from_arrays(offs, entry), ",")
        cs = np.concatenate([[0], np.cumsum(tf, dtype=np.int64)])
        return pa.table({
            "term": pa.array(uniq, pa.string()),
            "df": pa.array(np.diff(offs).astype(np.int64)),
            "tf_total": pa.array(cs[offs[1:]] - cs[offs[:-1]]),
            "postings": postings,
        })
    build_bucket.__name__ = "build_index_bucket"

    return docs.select_columns([id_col, "text"]) \
        .map_batches(doc_term, batch_format="pyarrow") \
        .groupby("bucket") \
        .map_groups(build_bucket, batch_format="pyarrow")

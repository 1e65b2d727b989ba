"""Query catalog: named Ray Data pipelines over the driver test tables,
each paired (where SQL-expressible) with a DuckDB oracle in ORACLE_SQL.

Every callable takes ``sf_dir`` and returns a ray.data.Dataset /
pyarrow.Table. Column names match the oracle SQL exactly (the driver's
compare sorts columns by name before hashing).

These exercise, over real distributed batches, the operator inventory of
SURVEY.md §2: parse/tokenize (extract_* / entities_roundtrip), selectors
(select_count_token), cleaner (clean_basic_roundtrip), title/links
metadata, plus the training-data operators (dedup / similarity / text
stats / multimodal) and engine-level aggregates and broadcast joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .extract import extract_batch, extract_document
from .fixtures import docs_to_interleaved

# Hot per-row HTML kernels run as TASKS over a per-worker-process
# singleton instance (module-level cache below): worker processes are
# reused, so compiled state (selector cache, whitelists) amortizes like
# an actor pool, while the task scheduler saturates all CPUs without
# pool-sizing/upscaling stalls. Measured ~7x actor-pool throughput on a
# 32-CPU node.
_SINGLETONS: dict = {}


def _task(cls):
    def fn(batch):
        inst = _SINGLETONS.get(cls)
        if inst is None:
            inst = _SINGLETONS[cls] = cls()
        return inst(batch)
    fn.__name__ = f"task_{cls.__name__}"
    return fn


def _cpus() -> int:
    import ray
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def _read(sf_dir: str, table: str):
    # Lance-first with parquet fallback (production corpus is Lance;
    # the test tables are parquet)
    from .io import read_corpus
    return read_corpus(f"{sf_dir}/{table}.parquet")


# -- HTML engine queries ----------------------------------------------------

class PageExtractActor:
    """Build the oracle-friendly page per document row and extract its
    span sequence in one kernel (parse + boilerplate strip + text walk).
    Output: doc_id, main_text, media_ref, tail_text, n_spans."""

    def __init__(self) -> None:
        from .selector import parse_query
        parse_query("a")  # warm selector cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        main_texts, media_refs, tail_texts, n_spans = [], [], [], []
        for doc_id, text in zip(doc_ids, texts):
            html = (f"<nav><a href='/m'>menu</a></nav>"
                    f"<div id=main><p>{text}</p>"
                    f"<img src='media://doc/{doc_id}'>"
                    f"<p>tail {doc_id}</p></div>"
                    f"<script>junk()</script><footer>f</footer>")
            spans = extract_document(html)
            n_spans.append(len(spans))
            main_texts.append(spans[0]["text"] if spans else "")
            media = [s for s in spans if s["kind"] == "media"]
            media_refs.append(media[0]["media_ref"] if media else "")
            tails = [s for s in spans[1:] if s["kind"] == "text"]
            tail_texts.append(tails[-1]["text"] if tails else "")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "main_text": pa.array(main_texts, pa.string()),
            "media_ref": pa.array(media_refs, pa.string()),
            "tail_text": pa.array(tail_texts, pa.string()),
            "n_spans": pa.array(n_spans, pa.int64()),
        })


def q_extract_text(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        _task(PageExtractActor), batch_format="pyarrow")


class TitleLinksActor:
    """Parse a full page; emit document title + link count + resolved
    first link (Document.title / select("a[href]") / absUrl)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .parser import parse
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        titles, n_links, first_hrefs = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            html = (f"<html><head><title>Doc {doc_id}</title></head>"
                    f"<body><p>{text}</p>"
                    f"<a href='/page/{doc_id}'>one</a>"
                    f"<a href='https://x.example/{doc_id}'>two</a>"
                    f"<a name='no-href'>three</a></body></html>")
            doc = parse(html, "https://base.example/")
            titles.append(doc.title())
            links = doc.select("a[href]")
            n_links.append(len(links))
            first_hrefs.append(links[0].abs_url("href") if links else "")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "n_links": pa.array(n_links, pa.int64()),
            "first_href": pa.array(first_hrefs, pa.string()),
        })


def q_title_links(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        _task(TitleLinksActor), batch_format="pyarrow")


class OutlinkHostsActor:
    """Crawl-frontier analytics kernel: parse each page, select its
    outlinks, resolve them against the page's base URI (absUrl — the
    relative link exercises real URL resolution), extract the host,
    and pre-count hosts IN-BATCH so only (host, n) partials leave the
    worker. HTML is generated deterministically from the row (first
    three words become absolute-link hosts; one relative link
    resolves to the base host), so a SQL oracle can predict the
    aggregate from the raw text."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .parser import parse
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        hosts: list = []
        for doc_id, text in zip(doc_ids, texts):
            words = text.split()[:3]
            links = "".join(
                f"<a href='https://{w}.example.com/p/{i}'>l</a>"
                for i, w in enumerate(words))
            html = (f"<html><body>{links}"
                    f"<a href='../rel/{doc_id}'>r</a>"
                    f"</body></html>")
            doc = parse(html, "https://base.example/dir/page.html")
            for a in doc.select("a[href]"):
                url = a.abs_url("href")
                rest = url.split("://", 1)[1]
                hosts.append(rest.split("/", 1)[0])
        uniq, counts = np.unique(np.asarray(hosts, dtype=object),
                                 return_counts=True)
        return pa.table({
            "host": pa.array(uniq.tolist(), pa.string()),
            "n": pa.array(counts.astype(np.int64), pa.int64())})


def q_outlink_hosts(sf_dir: str):
    """Outlink HOST distribution — the crawl-frontier rollup: parse →
    select("a[href]") → absUrl (real relative-URL resolution) → host
    → in-batch count partials → ONE host-bounded groupby. The whole
    HTML engine sits inside a distributed aggregate whose oracle
    derives the same counts from the raw text."""
    from ray.data.aggregate import Sum
    return _read(sf_dir, "documents") \
        .select_columns(["doc_id", "text"]) \
        .map_batches(_task(OutlinkHostsActor),
                     batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n", alias_name="n"))


class CleanActor:
    """Sanitize untrusted HTML through the basic whitelist; emit the
    cleaned body html (Cleaner/Whitelist parity path)."""

    def __init__(self) -> None:
        from .cleaner import Whitelist
        self.whitelist = Whitelist.basic()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .cleaner import Cleaner
        from .parser import parse_body_fragment
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        cleaned = []
        cleaner = Cleaner(self.whitelist)
        for doc_id, text in zip(doc_ids, texts):
            html = (f"<p><a href=\"javascript:evil()\">{text}</a>"
                    f" <b>ok {doc_id}</b></p><script>bad()</script>")
            doc = cleaner.clean(parse_body_fragment(html, ""))
            cleaned.append(doc.body().html())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "clean_html": pa.array(cleaned, pa.string()),
        })


def q_clean_basic(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        _task(CleanActor), batch_format="pyarrow")


class SelectCountActor:
    """Wrap every token in <span data-w=token>; count tokens equal to
    'the' via the attribute-value selector (selector-engine parity)."""

    def __init__(self) -> None:
        from .selector import parse_query
        self.eval = parse_query("span[data-w=the]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .parser import parse
        from .selector import collect
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        counts = []
        for text in texts:
            body = "".join(f'<span data-w="{w}">{w}</span> '
                           for w in (text or "").split())
            doc = parse(f"<div>{body}</div>")
            counts.append(len(collect(self.eval, doc)))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_the": pa.array(counts, pa.int64()),
        })


def q_select_count(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        _task(SelectCountActor), batch_format="pyarrow")


class EntitiesActor:
    """Entity-escape the text into markup, parse it back, verify the
    tokenizer's character-reference resolution round-trips."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .parser import parse
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = []
        for text in texts:
            html = f"<p>&lt;{text}&gt; &amp; &quot;q&quot; &#65;&#x42;</p>"
            out.append(parse(html).body().text())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "decoded": pa.array(out, pa.string()),
        })


def q_entities(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        _task(EntitiesActor), batch_format="pyarrow")


def _summarize_spans(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    spans = batch.column("spans").to_pylist()
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "n_spans": pa.array([len(s) for s in spans], pa.int64()),
        "n_media": pa.array(
            [sum(1 for x in s if x["kind"] == "media")
             for s in spans], pa.int64()),
        "text_chars": pa.array(
            [sum(len(x["text"]) for x in s if x["kind"] == "text")
             for s in spans], pa.int64()),
    })


def q_extract_interleaved(sf_dir: str):
    """Full interleaved pipeline over rich synthetic pages (flagship;
    rows-only driver check — the rich pages' spans are split at
    sha1-keyed character positions, not SQL-expressible; the SAME
    plumbing is oracle-checked by extract_interleaved_simple)."""
    ds = _read(sf_dir, "documents")

    def build(batch: pa.Table) -> pa.Table:
        return docs_to_interleaved(batch, rich=True, heavy_tail=0.001)

    interleaved = ds.map_batches(build, batch_format="pyarrow")
    extracted = interleaved.map_batches(
        extract_batch, batch_format="pyarrow")
    return extracted.map_batches(_summarize_spans,
                                 batch_format="pyarrow")


def q_extract_interleaved_simple(sf_dir: str):
    """The SAME interleaved plumbing (docs → span rows → assemble →
    extract_batch → summary) over the oracle-friendly page shape, so
    the flagship path gets a hard rows+schema+hash driver check:
    per doc exactly [text, media, tail-text] spans."""
    ds = _read(sf_dir, "documents")

    def build(batch: pa.Table) -> pa.Table:
        return docs_to_interleaved(batch, rich=False)

    interleaved = ds.map_batches(build, batch_format="pyarrow")
    extracted = interleaved.map_batches(
        extract_batch, batch_format="pyarrow")
    return extracted.map_batches(_summarize_spans,
                                 batch_format="pyarrow")


# -- training-data operators ------------------------------------------------

def q_dedup_exact(sf_dir: str):
    from .data.dedup import exact_dedup_groups
    return exact_dedup_groups(_read(sf_dir, "documents"))


def q_token_stats(sf_dir: str):
    from .data.textstats import token_stats_batch
    return _read(sf_dir, "documents").map_batches(
        token_stats_batch, batch_format="pyarrow")


def q_quality(sf_dir: str):
    from .data.textstats import quality_batch
    return _read(sf_dir, "documents").map_batches(
        quality_batch, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    from .data.textstats import fingerprint_batch
    ds = _read(sf_dir, "documents").map_batches(
        fingerprint_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fp_md5"])


def q_fingerprint_rolling(sf_dir: str):
    from .data.textstats import fingerprint_batch
    ds = _read(sf_dir, "documents").map_batches(
        fingerprint_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fp_rolling"])


def q_lang_counts(sf_dir: str):
    from .data.textstats import lang_counts
    return lang_counts(_read(sf_dir, "documents"))


def q_lang_id(sf_dir: str):
    """Content-based language ID with an exact oracle: per row,
    synthesize held-out text in the row's declared lang (sentences the
    trigram model never saw — see textstats._LANG_TEST), then detect.
    `pred_lang = lang` is the SQL oracle; a miss means the detector
    actually misclassified genuinely per-language text."""
    from .data.textstats import LangIdActor, synth_lang_text

    def build(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(
                [synth_lang_text(lang, d)
                 for d, lang in zip(doc_ids, langs)], pa.string()),
        })

    fixture = _read(sf_dir, "documents") \
        .select_columns(["doc_id", "lang"]) \
        .map_batches(build, batch_format="pyarrow")
    return fixture.map_batches(_task(LangIdActor),
                               batch_format="pyarrow")


def q_minhash_near_dups(sf_dir: str):
    from .data.dedup import minhash_near_dups
    return minhash_near_dups(_read(sf_dir, "documents"))


def q_simhash_near_dups(sf_dir: str):
    from .data.dedup import simhash_near_dups
    return simhash_near_dups(_read(sf_dir, "documents"))


def q_ann_topk(sf_dir: str):
    from .data.similarity import brute_force_topk
    return brute_force_topk(_read(sf_dir, "embeddings"),
                            query_ids=[0, 1, 2, 3, 4], k=10)


def q_ann_ivf(sf_dir: str):
    """IVF with exhaustive probing (nprobe == n_centroids): exercises
    the full bucket/probe machinery while the result is provably the
    exact top-k, so it shares the ann_topk SQL oracle. The pruned
    (nprobe < n_centroids) configs are exercised in pytest."""
    from .data.similarity import ivf_topk
    return ivf_topk(_read(sf_dir, "embeddings"),
                    query_ids=[0, 1, 2, 3, 4], k=10,
                    n_centroids=16, nprobe=16)


def q_kmeans(sf_dir: str):
    """Distributed k-means over embeddings (iterative; rows-only check —
    Lloyd's iterations are not SQL-expressible). Returns cluster sizes."""
    from ray.data.aggregate import Count

    from .data.similarity import kmeans
    _, assignments = kmeans(_read(sf_dir, "embeddings"), k=8, iters=4)
    return assignments.groupby("cluster").aggregate(
        Count(alias_name="n"))


def q_multimodal(sf_dir: str):
    from .data.multimodal import MediaDecodeActor, \
        media_table_from_documents
    media = _read(sf_dir, "documents").map_batches(
        media_table_from_documents, batch_format="pyarrow")
    decoded = media.map_batches(
        MediaDecodeActor, batch_format="pyarrow", batch_size=32,
        concurrency=(1, _cpus()),
        fn_constructor_kwargs={"mode": "fake"})
    return decoded.select_columns(["media_ref", "kind", "n_bytes"])


def q_multimodal_real(sf_dir: str):
    """REAL codec path end-to-end: per doc a PNG (closed-form pixels,
    mixed scanline filters) and a WAV (closed-form PCM) are generated,
    shipped as binary columns, and decoded by the from-scratch
    stdlib-only codecs (data/codecs.py) in an actor-pool stage. Every
    output stat is an exact integer, so the SQL oracle reproduces the
    whole encode→decode round bit-for-bit."""
    from .data.multimodal import MediaStatsActor, \
        real_media_from_documents
    media = _read(sf_dir, "documents").select_columns(["doc_id"]) \
        .map_batches(real_media_from_documents, batch_format="pyarrow")
    return media.map_batches(
        MediaStatsActor, batch_format="pyarrow", batch_size=64,
        concurrency=(1, _cpus()))


def q_multimodal_video(sf_dir: str):
    """REAL video path end-to-end: per doc an AVI container of
    closed-form RGB frames (uncompressed BI_RGB DIB — bottom-up BGR
    padded rows) → FrameSampleActor(mode="real") decodes the
    container, samples 3 frames evenly and re-encodes each as PNG →
    FrameStatsActor decodes the PNGs into exact integer pixel sums.
    The SQL oracle reproduces the AVI decode → sample → PNG round
    bit-for-bit from the frame formula."""
    from .data.multimodal import (FrameSampleActor, FrameStatsActor,
                                  video_media_from_documents)
    media = _read(sf_dir, "documents").select_columns(["doc_id"]) \
        .map_batches(video_media_from_documents,
                     batch_format="pyarrow")
    sampled = media.map_batches(
        FrameSampleActor, batch_format="pyarrow", batch_size=64,
        concurrency=(1, _cpus()),
        fn_constructor_kwargs={"n_frames": 3, "mode": "real"})
    return sampled.map_batches(
        FrameStatsActor, batch_format="pyarrow", batch_size=256,
        concurrency=(1, _cpus()))


def q_dedup_components(sf_dir: str):
    """Near-dup connected components: every document labeled with the
    smallest doc_id reachable through verified Jaccard>=0.8 pairs —
    the cluster-and-keep-one dedup primitive, computed by distributed
    min-label propagation (see data/dedup.jaccard_components)."""
    from .data.dedup import jaccard_components
    return jaccard_components(_read(sf_dir, "documents"), threshold=0.8)


def q_spend_gini(sf_dir: str):
    """GINI concentration of customer spend — the inequality /
    market-concentration statistic, as an EXACT integer rational:
    gini = Σ(2i − n − 1)·x₍ᵢ₎ / (n·Σx) over customers sorted by
    (spend, custkey). Ties broken by key permute only equal x values,
    so the statistic is tie-safe. Shape: per-customer totals via ONE
    custkey-bounded groupby of integer-cents partials; the positional
    weighted sum then needs NO second shuffle — the shuffle_rank
    pattern: ONE narrow sort on (x, k), each block emits its first
    (x, k) + row count + Σx (O(blocks) summary), the driver
    prefix-sums offsets and totals, and a zero-shuffle second map
    over the SAME materialized blocks folds Σ(2(off+j+1) − n − 1)·xⱼ
    into one int64 per block. Loud overflow contract (HUGEINT is the
    oracle's side; the engine pre-checks n·max_x·n < 2⁶²)."""
    import ray
    from ray.data.aggregate import Sum

    from .data.windows import _cached_get
    from .io import collect_table

    def spend_partial(b: pa.Table) -> pa.Table:
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        t = pa.table({
            "k": b.column("o_custkey").cast(pa.int64()),
            "x": pa.array(np.floor(p * 100.0 + 0.5)
                          .astype(np.int64), pa.int64())})
        return t.group_by("k").aggregate([("x", "sum")]) \
            .rename_columns(["k", "x"])
    spend_partial.__name__ = "gini_spend_partial"

    s = _read(sf_dir, "orders") \
        .select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(spend_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("x", alias_name="x")) \
        .repartition(8).sort(["x", "k"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"x0": pa.array([], pa.int64()),
                             "k0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.int64()),
                             "xmax": pa.array([], pa.int64())})
        x = b.column("x").to_numpy(zero_copy_only=False)
        return pa.table({
            "x0": b.column("x").slice(0, 1),
            "k0": b.column("k").slice(0, 1),
            "n": pa.array([b.num_rows], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "xmax": pa.array([int(x.max())], pa.int64())})
    summary.__name__ = "gini_block_summary"

    summ = collect_table(s.map_batches(
        summary, batch_format="pyarrow", batch_size=None))
    x0 = summ.column("x0").to_numpy(zero_copy_only=False)
    k0 = summ.column("k0").to_numpy(zero_copy_only=False)
    bn = summ.column("n").to_numpy(zero_copy_only=False)
    bs = summ.column("sx").to_numpy(zero_copy_only=False)
    bmax = summ.column("xmax").to_numpy(zero_copy_only=False)
    order = np.lexsort((k0, x0))
    keys = list(zip(x0[order].tolist(), k0[order].tolist()))
    if len(set(keys)) != len(keys):
        raise ValueError("spend_gini: duplicate block boundary "
                         "(x, k) tuples — custkeys must be unique")
    n = int(bn.sum())
    sumx = int(bs.sum())
    # overflow guard over the GLOBAL max spend (per-block maxima ride
    # the summary — the block-FIRST values are block minima under the
    # ascending sort and would understate the bound)
    if n and n * n * int(bmax.max() if bmax.size else 0) >= (1 << 62):
        raise ValueError("spend_gini positional sum would overflow "
                         "int64 — use the HUGEINT hatch")
    offs = np.concatenate(([0], np.cumsum(bn[order])[:-1]))
    handle = ray.put((dict(zip(keys, offs.tolist())), n))

    def wsum(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"w": pa.array([], pa.int64())})
        table, nn = _cached_get(handle)
        key = (int(b.column("x")[0].as_py()),
               int(b.column("k")[0].as_py()))
        off = table[key]
        x = b.column("x").to_numpy(zero_copy_only=False)
        i = off + np.arange(b.num_rows, dtype=np.int64) + 1
        w = int(((2 * i - nn - 1) * x).sum())
        return pa.table({"w": pa.array([w], pa.int64())})
    wsum.__name__ = "gini_weighted_partial"

    wt = collect_table(s.map_batches(
        wsum, batch_format="pyarrow", batch_size=None))
    num = int(wt.column("w").to_numpy(zero_copy_only=False).sum()) \
        if wt.num_rows else 0
    return pa.table({
        "gini_num": pa.array([num], pa.int64()),
        "gini_den": pa.array([n * sumx], pa.int64()),
        "n_customers": pa.array([n], pa.int64())})


def q_pareto_half(sf_dir: str):
    """PARETO / 80-20 concentration point — the smallest k such that
    the top-k customers by spend hold at least HALF the total
    revenue, plus their exact share numerator: the 'how concentrated
    is the business' headline. All-integer (2·cum ≥ total avoids the
    half). Shape: ONE custkey-bounded groupby for per-customer
    totals, ONE narrow sort on (spend desc, key), per-block (count,
    sum) summaries collected (O(blocks)), driver prefix locates the
    crossing block, and a zero-shuffle second map over the SAME
    blocks lets ONLY that block emit the exact in-block crossing —
    one row ever reaches the driver from the second pass."""
    import ray
    from ray.data.aggregate import Sum

    from .data.windows import _cached_get
    from .io import collect_table

    def spend_partial(b: pa.Table) -> pa.Table:
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        t = pa.table({
            "k": b.column("o_custkey").cast(pa.int64()),
            "x": pa.array(np.floor(p * 100.0 + 0.5)
                          .astype(np.int64), pa.int64())})
        return t.group_by("k").aggregate([("x", "sum")]) \
            .rename_columns(["k", "x"])
    spend_partial.__name__ = "pareto_spend_partial"

    s = _read(sf_dir, "orders") \
        .select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(spend_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("x", alias_name="x")) \
        .repartition(8) \
        .sort(["x", "k"], descending=[True, False]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"x0": pa.array([], pa.int64()),
                             "k0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.int64())})
        x = b.column("x").to_numpy(zero_copy_only=False)
        return pa.table({
            "x0": b.column("x").slice(0, 1),
            "k0": b.column("k").slice(0, 1),
            "n": pa.array([b.num_rows], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64())})
    summary.__name__ = "pareto_block_summary"

    summ = collect_table(s.map_batches(
        summary, batch_format="pyarrow", batch_size=None))
    if summ.num_columns == 0 or summ.num_rows == 0:
        raise ValueError("pareto_half: empty spend table")
    x0 = summ.column("x0").to_numpy(zero_copy_only=False)
    k0 = summ.column("k0").to_numpy(zero_copy_only=False)
    bn = summ.column("n").to_numpy(zero_copy_only=False)
    bs = summ.column("sx").to_numpy(zero_copy_only=False)
    order = np.lexsort((k0, -x0))  # block order under (x desc, k)
    total = int(bs.sum())
    cum = np.cumsum(bs[order])
    cross = int(np.searchsorted(2 * cum, total))  # first 2cum>=total
    off_n = int(bn[order][:cross].sum())
    off_s = int(cum[cross - 1]) if cross else 0
    key = (int(x0[order][cross]), int(k0[order][cross]))
    handle = ray.put((key, off_n, off_s, total))

    def crossing(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k_customers": pa.array([], pa.int64()),
                             "topk_cents": pa.array([], pa.int64())})
        kk, on, osum, tot = _cached_get(handle)
        if (int(b.column("x")[0].as_py()),
                int(b.column("k")[0].as_py())) != kk:
            return pa.table({"k_customers": pa.array([], pa.int64()),
                             "topk_cents": pa.array([], pa.int64())})
        x = b.column("x").to_numpy(zero_copy_only=False)
        c = osum + np.cumsum(x)
        j = int(np.searchsorted(2 * c, tot))
        return pa.table({
            "k_customers": pa.array([on + j + 1], pa.int64()),
            "topk_cents": pa.array([int(c[j])], pa.int64())})
    crossing.__name__ = "pareto_crossing"

    hit = collect_table(s.map_batches(
        crossing, batch_format="pyarrow", batch_size=None))
    return pa.table({
        "k_customers": hit.column("k_customers"),
        "topk_cents": hit.column("topk_cents"),
        "total_cents": pa.array([total], pa.int64())})


def q_spearman_qty_disc(sf_dir: str):
    """Per-group SPEARMAN rank correlation (quantity vs discount per
    return flag) with tie-averaged ranks — the distribution-free
    dependence test Pearson can't give. Ranks never materialize
    per row as floats: both domains are bounded, so DOUBLED average
    ranks (2·avgrank = 2·#less + #equal + 1, an integer) come from
    the grouped value histograms (ONE bounded groupby), broadcast as
    lookup tables, and a zero-shuffle map accumulates the six exact
    int64 moment partials. The finish is float-deterministic across
    engines: cov and the two variances are exact Python ints; the
    only float ops are int→double casts (deterministic), sqrt
    (IEEE-correctly-rounded — unlike ln, which we measured diverging
    in ULPs), one multiply and one divide — the oracle spells the
    identical tree, so rho matches bit-for-bit."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from .io import collect_table

    def hist_partial(b: pa.Table) -> pa.Table:
        f = np.asarray(b.column("l_returnflag").to_pylist(),
                       dtype=object)
        q = np.floor(b.column("l_quantity")
                     .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        d = np.floor(b.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 10000 + 0.5) \
            .astype(np.int64)
        parts = []
        for col, vals in (("q", q), ("d", d)):
            uf, fi = np.unique(f, return_inverse=True)
            packed = fi.astype(np.int64) * (1 << 32) + vals
            up, cnt = np.unique(packed, return_counts=True)
            parts.append(pa.table({
                "f": pa.array(uf[(up >> 32)].tolist(), pa.string()),
                "which": pa.array([col] * up.size, pa.string()),
                "v": pa.array(up & ((1 << 32) - 1), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64())}))
        return pa.concat_tables(parts)
    hist_partial.__name__ = "spearman_hist_partial"

    li = _read(sf_dir, "lineitem") \
        .select_columns(["l_returnflag", "l_quantity",
                         "l_discount"]).materialize()
    hist = collect_table(
        li.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["f", "which", "v"])
        .aggregate(Sum("n", alias_name="n")))

    # doubled average ranks per (flag, which, value)
    hf = np.asarray(hist.column("f").to_pylist(), dtype=object)
    hw = np.asarray(hist.column("which").to_pylist(), dtype=object)
    hv = hist.column("v").to_numpy(zero_copy_only=False)
    hn = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((hv, hw, hf))
    hf, hw, hv, hn = hf[order], hw[order], hv[order], hn[order]
    grp = np.r_[True, (hf[1:] != hf[:-1]) | (hw[1:] != hw[:-1])]
    cum = np.cumsum(hn)
    base = np.repeat((cum - hn)[np.flatnonzero(grp)],
                     np.diff(np.r_[np.flatnonzero(grp), hf.size]))
    less = (cum - hn) - base
    rank2 = 2 * less + hn + 1
    # packed broadcast lookup: (flag code, which bit, value) → 2·rank
    flags_sorted = np.unique(hf)
    fcode = np.searchsorted(flags_sorted, hf).astype(np.int64)
    wbit = (hw == "q").astype(np.int64)
    pk = (fcode << 33) | (wbit << 32) | hv
    order2 = np.argsort(pk)
    handle = ray.put((flags_sorted, pk[order2], rank2[order2]))

    def moments(b: pa.Table) -> pa.Table:
        fl, keys, r2 = ray.get(handle)
        f = np.asarray(b.column("l_returnflag").to_pylist(),
                       dtype=object)
        q = np.floor(b.column("l_quantity")
                     .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        d = np.floor(b.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 10000 + 0.5) \
            .astype(np.int64)
        fc = np.searchsorted(fl, f).astype(np.int64)
        pu = np.searchsorted(keys, (fc << 33) | (1 << 32) | q)
        pv = np.searchsorted(keys, (fc << 33) | d)
        if (pu >= keys.size).any() or (pv >= keys.size).any() \
                or (keys[np.minimum(pu, keys.size - 1)]
                    != ((fc << 33) | (1 << 32) | q)).any() \
                or (keys[np.minimum(pv, keys.size - 1)]
                    != ((fc << 33) | d)).any():
            raise ValueError("spearman: (flag, value) missing from "
                             "rank table — inconsistent input")
        u = r2[pu]
        v = r2[pv]
        uf, fi = np.unique(f, return_inverse=True)
        out = {"f": pa.array(uf.tolist(), pa.string())}
        for name, arr in (("n", np.ones(f.size, np.int64)),
                          ("su", u), ("sv", v), ("suv", u * v),
                          ("suu", u * u), ("svv", v * v)):
            acc = np.zeros(uf.size, np.int64)
            np.add.at(acc, fi, arr)
            out[name] = pa.array(acc, pa.int64())
        return pa.table(out)
    moments.__name__ = "spearman_moments"

    m = collect_table(
        li.map_batches(moments, batch_format="pyarrow")
        .groupby("f").aggregate(
            *[Sum(c, alias_name=c)
              for c in ("n", "su", "sv", "suv", "suu", "svv")]))
    flags = m.column("f").to_pylist()
    rho, ns = [], []
    for i, fl in enumerate(flags):
        n = int(m.column("n")[i].as_py())
        su, sv = int(m.column("su")[i].as_py()), \
            int(m.column("sv")[i].as_py())
        suv = int(m.column("suv")[i].as_py())
        suu, svv = int(m.column("suu")[i].as_py()), \
            int(m.column("svv")[i].as_py())
        cov = n * suv - su * sv            # exact Python ints
        varu = n * suu - su * su
        varv = n * svv - sv * sv
        rho.append(float(cov)
                   / (math.sqrt(float(varu))
                      * math.sqrt(float(varv))))
        ns.append(n)
    return pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "n": pa.array(ns, pa.int64()),
        "rho": pa.array(rho, pa.float64())})


def q_priority_trend(sf_dir: str):
    """Per-priority ORDER-VOLUME TREND — the OLS slope of daily order
    count over time, as an EXACT integer rational: slope = num/den
    with num = n·Σxy − Σx·Σy and den = n·Σx² − (Σx)², computed over
    the GAP-FILLED daily series (zero days pull the trend down — the
    same densification dense_daily_orders does; skipping them is the
    classic trend bug). One scan: map-side (priority, day) count
    partials, ONE calendar-bounded groupby, moments in driver Python
    ints over the span × |priorities| lattice — no float exists
    anywhere, so the hash is exact by construction."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def day_partial(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        t = pa.table({
            "priority": b.column("o_orderpriority"),
            "day_i": pa.array(od.astype("datetime64[D]")
                              .astype(np.int64), pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(["priority", "day_i"]) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["priority", "day_i", "n"])
    day_partial.__name__ = "trend_day_partial"

    agg = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_orderpriority", "o_orderdate"])
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby(["priority", "day_i"])
        .aggregate(Sum("n", alias_name="n")))
    prio = np.asarray(agg.column("priority").to_pylist(),
                      dtype=object)
    day = agg.column("day_i").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    lo, hi = int(day.min()), int(day.max())
    span = hi - lo + 1
    xs = np.arange(lo, hi + 1, dtype=np.int64)
    sx = int(xs.sum())
    sxx = int((xs * xs).sum())
    out_p, out_num, out_den = [], [], []
    for p in np.unique(prio):
        m = prio == p
        y = np.zeros(span, dtype=np.int64)
        y[day[m] - lo] = n[m]
        sy = int(y.sum())
        sxy = int((xs * y).sum())
        out_p.append(p)
        out_num.append(span * sxy - sx * sy)   # Python ints: exact
        out_den.append(span * sxx - sx * sx)
    return pa.table({
        "priority": pa.array(out_p, pa.string()),
        "slope_num": pa.array(out_num, pa.int64()),
        "slope_den": pa.array(out_den, pa.int64())})


def q_priority_status_chi2(sf_dir: str):
    """Chi-square INDEPENDENCE TEST over the priority × status
    contingency table — the statistical-audit pass (is a categorical
    drift real?), computed from ONE bounded groupby: per-block
    (priority, status) count partials collapse the fact table, the
    driver builds the FULL lattice (zero cells contribute their
    expected mass — summing observed cells only is the classic bug),
    and each cell's term uses the integer-cored form
    (o·t − r·c)² / (t·r·c) so both engines evaluate the same float
    tree: the numerator root and denominator are exact int64, only
    the square and divide are float. Output: (chi2, dof, n)."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def cell_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"p": b.column("o_orderpriority"),
                      "s": b.column("o_orderstatus"),
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(["p", "s"]).aggregate([("n", "sum")]) \
            .rename_columns(["p", "s", "n"])
    cell_partial.__name__ = "chi2_cell_partial"

    agg = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_orderpriority", "o_orderstatus"])
        .map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["p", "s"]).aggregate(Sum("n", alias_name="n")))
    p = np.asarray(agg.column("p").to_pylist(), dtype=object)
    s = np.asarray(agg.column("s").to_pylist(), dtype=object)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    ps, pi = np.unique(p, return_inverse=True)
    ss, si = np.unique(s, return_inverse=True)
    obs = np.zeros((ps.size, ss.size), dtype=np.int64)
    obs[pi, si] = n
    rn = obs.sum(axis=1)
    cn = obs.sum(axis=0)
    t = int(obs.sum())
    num = (obs * t - rn[:, None] * cn[None, :]).astype(np.float64)
    den = (t * rn[:, None] * cn[None, :]).astype(np.float64)
    chi2 = float((num * num / den).sum())
    dof = (ps.size - 1) * (ss.size - 1)
    return pa.table({"chi2": pa.array([chi2], pa.float64()),
                     "dof": pa.array([dof], pa.int64()),
                     "n": pa.array([t], pa.int64())})


def q_dense_daily_orders(sf_dir: str):
    """Calendar GAP-FILL / densification — per order priority, a row
    for EVERY day in the global date span with zero-filled counts:
    the resample/time-series-densification pass (dashboards, ARIMA
    feeds) whose SQL form is generate_series CROSS JOIN LEFT JOIN.
    The fact table reduces map-side to (priority, epoch-day) count
    partials, ONE calendar-bounded groupby finishes, and the dense
    lattice materializes driver-side from the collected aggregate —
    output is bounded by span × |priorities| (12k rows here), never
    corpus size, so no join and no generated table ever shuffles."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def day_partial(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        t = pa.table({
            "priority": b.column("o_orderpriority"),
            "day_i": pa.array(od.astype("datetime64[D]")
                              .astype(np.int64), pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(["priority", "day_i"]) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["priority", "day_i", "n"])
    day_partial.__name__ = "dense_daily_partial"

    agg = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_orderpriority", "o_orderdate"])
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby(["priority", "day_i"])
        .aggregate(Sum("n", alias_name="n")))
    if agg.num_rows == 0:
        return pa.table({"priority": pa.array([], pa.string()),
                         "day": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    prio = np.asarray(agg.column("priority").to_pylist(),
                      dtype=object)
    day = agg.column("day_i").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    lo, hi = int(day.min()), int(day.max())
    span = hi - lo + 1
    prios = np.unique(prio)
    dense = np.zeros((prios.size, span), dtype=np.int64)
    pi = np.searchsorted(prios, prio)
    dense[pi, day - lo] = n
    all_days = np.tile(np.arange(lo, hi + 1, dtype=np.int64),
                       prios.size)
    day_str = all_days.astype("datetime64[D]").astype(str)
    return pa.table({
        "priority": pa.array(np.repeat(prios, span), pa.string()),
        "day": pa.array(day_str, pa.string()),
        "n": pa.array(dense.reshape(-1), pa.int64())})


_ENTROPY_TYPES = ("click", "error", "purchase", "signup", "view")


def q_strict_funnel(sf_dir: str):
    """Strict-sequence 3-step conversion funnel with a 1-day window
    per step: view → click →
    purchase, each step strictly after AND within 24h of the
    previous step's time — the sequentially-dependent composite the
    2-step masked-min funnel can't express (stage i's threshold is
    stage i−1's RESULT). Round-5 rewrite onto the one-sort sentinel
    shape (data/windows.py ordered_funnel_sorted): step events fold
    to narrow (user, ts, code) rows, ONE sort, a vectorized K-pass
    masked-reduceat kernel per block, O(blocks × edge-run rows)
    driver fixup — replacing K−1 hash joins + K groupbys; the
    staged-join ordered_funnel remains the hatch for bot keys whose
    edge runs exceed max_run (parity-pytested). Drop-off genuinely
    bites at both scales (15→6→3 / 150→60→25 users)."""
    from .data.windows import ordered_funnel_sorted
    return ordered_funnel_sorted(
        _read(sf_dir, "events")
        .select_columns(["user_id", "ts", "event_type"]),
        key_col="user_id", ts_col="ts", type_col="event_type",
        steps=("view", "click", "purchase"),
        window_us=86_400_000_000)


def q_value_twa(sf_dir: str):
    """Per-user TIME-WEIGHTED average value (TWAP) components — each
    event's value holds until the user's next event (data/windows.py
    time_weighted_avg): exact int64 (Σ dt·v, Σ dt) in µs·cents / µs,
    the LEAD-then-SUM composite with NO per-row LEAD output — pair
    terms are aggregates, so one sort + per-block partials + O(blocks)
    seam terms + ONE key-bounded groupby."""
    from .data.windows import time_weighted_avg

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    to_cents.__name__ = "twa_cents"

    ds = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_id", "value"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    return time_weighted_avg(ds, key_col="user_id", ts_col="ts",
                             id_col="event_id", val_col="cents")


def q_user_entropy(sf_dir: str):
    """Per-user Shannon ENTROPY of the event-type distribution — the
    behavioral-diversity signal (bot detection: near-zero entropy =
    single-action automation). Never materializes probabilities:
    H = ln(N) − (Σ nᵢ·ln nᵢ)/N. The float evaluation is DETERMINISTIC
    WITHIN each engine: the closed type vocabulary pivots map-side to
    one exact int64 count column per type (unknown types raise), ONE
    groupby(user) of integer Sums is order-free, and the finish map
    evaluates the Σ in FIXED type order — the same left-to-right tree
    the SQL oracle spells out, so the value never depends on
    partitioning. Cross-engine the values still differ by ULPs
    (DuckDB's ln ≠ numpy's log bit-for-bit, measured), which is why
    the float column is NAMED to sort after the unique user_id in
    checkers that order rows by alphabetical column list: two users
    with the SAME count multiset tie mathematically (one such pair
    exists at sf0.01), and a ±1-ULP wobble once flipped their
    relative order between engines — caught by a full-catalog sweep.
    Open vocabularies would bound the pivot via the event_pivot
    machinery's top-K + other column instead."""
    from ray.data.aggregate import Sum

    types = _ENTROPY_TYPES

    def pivot_partial(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type").to_pylist(),
                        dtype=object)
        uk = np.asarray(sorted(types), dtype=object)
        code = np.searchsorted(uk, et)
        code = np.minimum(code, uk.size - 1)
        if et.size and not np.all(uk[code] == et):
            bad = et[uk[code] != et][0]
            raise ValueError(
                f"user_entropy: unknown event_type {bad!r} — the "
                "bit-deterministic pivot needs the closed vocabulary")
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        uu, ui = np.unique(uid, return_inverse=True)
        mat = np.zeros((uu.size, uk.size), dtype=np.int64)
        np.add.at(mat, (ui, code), 1)
        out = {"user_id": pa.array(uu, pa.int64())}
        for j, t in enumerate(uk):
            out[f"n_{t}"] = pa.array(mat[:, j], pa.int64())
        return pa.table(out)
    pivot_partial.__name__ = "entropy_pivot_partial"

    counts = _read(sf_dir, "events") \
        .select_columns(["user_id", "event_type"]) \
        .map_batches(pivot_partial, batch_format="pyarrow") \
        .groupby("user_id") \
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}")
                     for t in sorted(types)])

    def finish(b: pa.Table) -> pa.Table:
        cols = [b.column(f"n_{t}").to_numpy(zero_copy_only=False)
                for t in sorted(types)]
        n_tot = np.zeros(b.num_rows, dtype=np.int64)
        for c in cols:
            n_tot = n_tot + c
        s = np.zeros(b.num_rows, dtype=np.float64)
        for c in cols:  # FIXED type order — mirrors the SQL tree
            cf = c.astype(np.float64)
            s = s + np.where(c > 0, cf * np.log(
                np.maximum(cf, 1.0)), 0.0)
        nf = n_tot.astype(np.float64)
        return pa.table({
            "user_id": b.column("user_id"),
            "n_events": pa.array(n_tot, pa.int64()),
            # named to sort AFTER the unique user_id in checkers that
            # order rows by alphabetical column list: float noise must
            # never decide row order (ln is NOT bit-identical across
            # engines; two users tie mathematically at sf0.01)
            "x_entropy": pa.array(np.log(nf) - s / nf,
                                  pa.float64())})
    finish.__name__ = "entropy_finish"
    return counts.map_batches(finish, batch_format="pyarrow")


def q_leakage_safe_split(sf_dir: str):
    """LEAKAGE-SAFE train/val/test split — the contamination guard a
    training corpus needs that plain hash_split cannot give: near-
    duplicate documents MUST land in the same split (a test doc whose
    near-twin sits in train leaks the benchmark). Composition: the
    verified near-dup connected components (min-label propagation,
    data/dedup.jaccard_components) assign every doc its cluster
    representative, and the deterministic splitmix bucket is computed
    on the COMPONENT id, not the doc id — so a whole cluster moves as
    one unit and membership is stable under corpus growth. Pure
    map-side after the components pass; the oracle replays the
    recursive-CTE components plus the same HUGEINT hash."""
    from .data.dedup import jaccard_components
    from .data.sampling import hash_split
    comp = jaccard_components(_read(sf_dir, "documents"),
                              threshold=0.8)
    return hash_split(comp, id_col="component")


def q_training_pipeline(sf_dir: str):
    """Flagship training-data composition — what a corpus run chains
    end-to-end: quality filter → exact dedup (md5 keeper) → near-dup
    connected components → keep one representative per cluster →
    token counts. Every stage is the already-oracle-checked operator;
    the oracle chains the same CTEs (incl. recursive components)."""
    import ray

    from .data.dedup import exact_dedup, jaccard_components
    from .data.textstats import quality_batch, token_stats_batch

    docs = _read(sf_dir, "documents")

    def quality_filter(batch: pa.Table) -> pa.Table:
        # quality_batch rows align 1:1 with the input batch — filter
        # inline, nothing ever leaves the workers
        q = quality_batch(batch)
        return batch.filter(q.column("is_quality").combine_chunks())

    survivors = docs.map_batches(quality_filter,
                                 batch_format="pyarrow")
    # exact dedup keeps min-doc_id per identical text, distributed
    deduped = exact_dedup(survivors).drop_columns(["fp"]).materialize()
    # near-dup representatives: only CLUSTER MEMBERS can be non-reps,
    # so the exclusion set is dup-cluster-sized — broadcastable
    from .io import collect_table
    nr_tbl = collect_table(
        jaccard_components(deduped, threshold=0.8)
        .filter(expr="doc_id != component"))
    non_reps = np.sort(nr_tbl.column("doc_id")
                       .to_numpy(zero_copy_only=False)
                       .astype(np.int64)) \
        if nr_tbl.num_columns else np.array([], dtype=np.int64)
    nr_ref = ray.put(non_reps)

    def keep_reps(batch: pa.Table) -> pa.Table:
        drop = ray.get(nr_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # sorted-array membership (searchsorted) instead of a per-row
        # Python set probe — the drop side is dup-cluster-sized
        pos = np.searchsorted(drop, ids)
        pos[pos == len(drop)] = 0
        hit = (len(drop) > 0) & (drop[pos] == ids) \
            if len(drop) else np.zeros(len(ids), dtype=bool)
        return batch.filter(pa.array(~hit))

    return deduped.map_batches(keep_reps, batch_format="pyarrow") \
        .map_batches(token_stats_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens"])


def q_ngram_jaccard_dups(sf_dir: str):
    from .data.dedup import ngram_jaccard_near_dups
    return ngram_jaccard_near_dups(_read(sf_dir, "documents"),
                                   threshold=0.8)


def q_embed_components(sf_dir: str):
    """Embedding-space near-dup clusters: connected components over the
    deterministic LSH cosine>=0.4 pair graph (banded hyperplane
    candidates → exact in-bucket verify → union-find → broadcast label
    map; see similarity.embed_near_dups_lsh, dedup.components_from_pairs).

    Scale note: the pair source is the two-phase LSH stream — no
    O(n²) stage anywhere in this lineage. The exact all-pairs variant
    (embed_near_dups) remains its own oracle-checked query and serves
    as the small-corpus recall baseline for the LSH config."""
    from .data.dedup import components_from_pairs
    from .data.similarity import embed_near_dups_lsh
    ds = _read(sf_dir, "embeddings")
    pairs = embed_near_dups_lsh(ds, threshold=0.4)
    return components_from_pairs(pairs, ds, pair_a="id_a",
                                 pair_b="id_b", id_col="vec_id")


def q_embed_near_dups(sf_dir: str):
    from .data.similarity import embed_near_dups
    return embed_near_dups(_read(sf_dir, "embeddings"), threshold=0.4)


def q_embed_near_dups_lsh(sf_dir: str):
    from .data.similarity import embed_near_dups_lsh
    return embed_near_dups_lsh(_read(sf_dir, "embeddings"),
                               threshold=0.4)


class XmlExtractActor:
    """XML path (XmlTreeBuilder): parse a generated XML doc per row,
    read back element text + attribute (SURVEY §2.2 XML parser)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .xmlparser import XmlTreeBuilder
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        vals, attrs = [], []
        for doc_id, lang, text in zip(doc_ids, langs, texts):
            head = (text or "").split(" ", 1)[0]
            xml = (f"<?xml version=\"1.0\"?><feed>"
                   f"<entry id=\"e{doc_id}\" lang=\"{lang}\">"
                   f"<title>{head}</title></entry></feed>")
            doc = XmlTreeBuilder().parse(xml, "")
            entry = doc.select("entry")[0]
            vals.append(entry.select("title")[0].text())
            attrs.append(entry.attr("lang"))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "title": pa.array(vals, pa.string()),
            "lang_attr": pa.array(attrs, pa.string()),
        })


def q_xml_extract(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        _task(XmlExtractActor), batch_format="pyarrow")


class NthChildActor:
    """Structural pseudo-selectors: build <li> per token, count
    li:nth-child(2n) and li:last-child text (SelectorTest parity over
    distributed batches)."""

    def __init__(self) -> None:
        from .selector import parse_query
        self.even = parse_query("li:nth-child(2n)")
        self.last = parse_query("li:last-child")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .parser import parse
        from .selector import collect
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_even, last_txt = [], []
        for text in texts:
            toks = (text or "").split()
            html = "<ul>" + "".join(f"<li>{t}</li>" for t in toks) \
                + "</ul>"
            doc = parse(html)
            n_even.append(len(collect(self.even, doc)))
            last = collect(self.last, doc)
            last_txt.append(last[0].text() if last else "")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_even": pa.array(n_even, pa.int64()),
            "last_token": pa.array(last_txt, pa.string()),
        })


def q_nth_child(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        _task(NthChildActor), batch_format="pyarrow")


def q_top_docs(sf_dir: str):
    """Distributed sort + limit (skew diagnostics pattern,
    SURVEY §2.9)."""
    ds = _read(sf_dir, "documents") \
        .select_columns(["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"],
                   descending=[True, False]).limit(10)


# -- engine-level aggregates / joins ---------------------------------------

def q_agg_lineitem(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum
    ds = _read(sf_dir, "lineitem") \
        .select_columns(["l_returnflag", "l_linestatus", "l_quantity",
                         "l_extendedprice"])
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Count(alias_name="count_order"),
        Max("l_extendedprice", alias_name="max_price"),
        Min("l_extendedprice", alias_name="min_price"))
    return agg


def q_join_broadcast(sf_dir: str):
    """Orders ⋈ customer via broadcast small side (ray.put once, read in
    every task) — never a shuffle join for a dimension table."""
    import ray

    from .io import collect_table
    cust = collect_table(_read(sf_dir, "customer")
                         .select_columns(["c_custkey",
                                          "c_mktsegment"]))
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    seg = np.asarray(cust.column("c_mktsegment").to_pylist())
    order = np.argsort(ck)
    handle = ray.put((ck[order], seg[order]))

    def attach(batch: pa.Table) -> pa.Table:
        keys_sorted, segs_sorted = ray.get(handle)
        keys = batch.column("o_custkey").to_numpy(
            zero_copy_only=False)
        # sorted-array probe instead of a per-row dict loop (guarded:
        # an empty customer table maps every order to "" rather than
        # indexing keys_sorted[-1] on a zero-length array)
        if keys_sorted.size:
            pos = np.minimum(np.searchsorted(keys_sorted, keys),
                             keys_sorted.size - 1)
            segs = np.where(keys_sorted[pos] == keys,
                            segs_sorted[pos], "")
        else:
            segs = np.full(keys.size, "", dtype=object)
        return pa.table({
            "segment": pa.array(segs, pa.string()),
            "n_dummy": pa.array([1] * len(segs), pa.int64()),
        })

    from ray.data.aggregate import Count
    orders = _read(sf_dir, "orders").select_columns(["o_custkey"])
    joined = orders.map_batches(attach, batch_format="pyarrow")
    return joined.groupby("segment").aggregate(Count(alias_name="n"))


def q_extract_manifest(sf_dir: str):
    """Resumable pipeline surface: documents → interleaved input files →
    run_extract (partitioned write + manifest) → manifest summary.
    Deterministic: 4 equal input files, 2 partitions."""
    import shutil

    import pyarrow.parquet as pq

    from .pipeline import run_extract

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    tag = sf_dir.strip("/").replace("/", "_")
    base = f"/tmp/soupflow_manifest_q/{tag}"
    in_dir, out_dir = f"{base}/in", f"{base}/out"
    shutil.rmtree(base, ignore_errors=True)
    import os
    os.makedirs(in_dir)
    n = docs.num_rows
    half = n // 2
    # partition 0 = first half (2 files), partition 1 = rest (2 files)
    bounds = [0, half // 2, half, half + (n - half) // 2, n]
    for i in range(4):
        chunk = docs.slice(bounds[i], bounds[i + 1] - bounds[i])
        pq.write_table(docs_to_interleaved(chunk),
                       f"{in_dir}/in-{i}.parquet")
    manifests = run_extract(in_dir, out_dir, files_per_partition=2)
    return pa.table({
        "partition_id": pa.array(
            [m["partition_id"] for m in manifests], pa.int64()),
        "row_count": pa.array(
            [m["row_count"] for m in manifests], pa.int64()),
    })


def q_orders_pruned(sf_dir: str):
    """Prune at the read: column projection + row-group predicate pushed
    into the parquet scan (only 2 columns and matching row groups leave
    storage), then a small groupby."""
    import pyarrow.dataset as pads
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
        filter=(pads.field("o_totalprice") > 150000.0))
    return ds.groupby("o_orderpriority").aggregate(
        Count(alias_name="n"),
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"))


def q_distinct_sources(sf_dir: str):
    """Distinct values (set op): groupby-as-unique — the scalable form
    of DISTINCT (one shuffle on the key, no driver materialization)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents").select_columns(["source"])
    return ds.groupby("source").aggregate(
        Count(alias_name="n")).select_columns(["source"])


def q_sessionize(sf_dir: str):
    """Windowed/stateful operator: per-user sessionization (new session
    when the gap to the previous event exceeds 30 min). Fully
    vectorized hierarchical-stitch shape (data/windows.py) — one global
    sort, numpy segment reduces per block, NO per-key Python (the
    groupby().map_groups per-group call overhead dominates at 10^8
    users)."""
    from .data.windows import sessionize
    return sessionize(_read(sf_dir, "events"), gap_s=1800.0)


def q_events_daily(sf_dir: str):
    """Windowed-style aggregate: events per user per day (partial
    per-block combine, then the small groupby)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        days = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        t = pa.table({
            "user_id": batch.column("user_id"),
            "day": days,
        })
        g = t.group_by(["user_id", "day"]).aggregate([("day", "count")])
        return g.rename_columns(["user_id", "day", "n"])

    ds = _read(sf_dir, "events").select_columns(["user_id", "ts"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["user_id", "day"]).aggregate(
        Sum("n", alias_name="n"))


def q_asof_join(sf_dir: str):
    """Temporal as-of join: for each event, the latest order of the
    same customer at or before the event's timestamp (ties on order
    date broken by max o_orderkey). Distributed shape: one global
    (key, ts) sort + vectorized per-block forward-fill + tiny edge
    fixup — see data/joins.py. No-match rows carry -1 (both sides
    coalesce, keeping the compare null-free)."""
    import pyarrow.compute as pc

    from .data.joins import asof_join

    res = asof_join(
        _read(sf_dir, "events"), _read(sf_dir, "orders"),
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        payload=["o_orderkey"], left_cols=["event_id"],
        tie="o_orderkey")

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id").cast(pa.int64()),
            "matched_order": pc.fill_null(
                b.column("matched_o_orderkey"), -1).cast(pa.int64()),
        })
    return res.map_batches(finalize, batch_format="pyarrow")


def q_bm25(sf_dir: str):
    """BM25 top-k text search over the documents table (fixed
    three-term query). One narrow stats pass + one constant-size
    aggregate + map-side scoring — see data/search.py."""
    from .data.search import bm25_topk
    return bm25_topk(_read(sf_dir, "documents"),
                     terms=("merge", "window", "spark"), k=25)


def q_hash_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by
    multiplicative id hash (data/sampling.py): pure map-side, stable
    under repartitioning and corpus growth, reproducible in SQL."""
    from .data.sampling import hash_split
    return hash_split(
        _read(sf_dir, "documents").select_columns(["doc_id"]))


def q_repetition(sf_dir: str):
    """Gopher-style repetition/quality signals per document: token
    count, distinct-token count, top-token frequency (vectorized
    np.unique factorization — data/textstats.py)."""
    from .data.textstats import repetition_batch
    return _read(sf_dir, "documents") \
        .select_columns(["doc_id", "text"]) \
        .map_batches(repetition_batch, batch_format="pyarrow")




def q_normalize(sf_dir: str):
    """Text normalization + PII-style redaction: lowercase, mask
    emails/long digit runs, collapse whitespace — all Arrow C++ RE2
    kernels, zero shuffle (data/textnorm.py)."""
    from .data.textnorm import normalize_redact
    return normalize_redact(_read(sf_dir, "documents"))


def q_props_rollup(sf_dir: str):
    """Semi-structured extraction: pull the "k" field out of the JSON
    props string with the Arrow RE2 kernel (no per-row json.loads),
    pre-aggregate in-batch, ONE small groupby. Money summed in
    integer cents so the aggregate is float-free
    (data/semistruct.py)."""
    from .data.semistruct import props_rollup
    return props_rollup(_read(sf_dir, "events"))


def q_bigram_topk(sf_dir: str):
    """Corpus-wide top-20 word bigrams with a map-side combiner: only
    distinct (bigram, n) partials leave each task
    (data/textstats.py)."""
    from .data.textstats import bigram_topk
    return bigram_topk(_read(sf_dir, "documents"), k=20)


def q_range_join(sf_dir: str):
    """Interval join: per event, how many orders of the same customer
    fall in the trailing 7-day window. Time-bucketed replication
    (each order lands in exactly 2 (key, bucket) slots) + one global
    sort; interior (key, bucket) runs resolve map-side with
    searchsorted, only block-edge runs hit a tiny groupby fixup
    (data/joins.py)."""
    from .data.joins import range_join_count

    res = range_join_count(
        _read(sf_dir, "events"), _read(sf_dir, "orders"),
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        window_ns=7 * 86400 * 10**9, left_id="event_id",
        num_partitions=16)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("jid"),
            "n_matches": b.column("n_matches").cast(pa.int64()),
        })
    return res.map_batches(finalize, batch_format="pyarrow")


def q_top_per_lang(sf_dir: str):
    """Grouped top-k without a global sort: per-block top-3-per-lang
    partials, then a per-key merge over ≤ 3·num_blocks tiny rows
    (data/rank.py)."""
    from .data.rank import grouped_topk
    ds = _read(sf_dir, "documents").select_columns(
        ["lang", "doc_id", "n_chars"])
    return grouped_topk(ds, key="lang", order_col="n_chars", k=3,
                        tie="doc_id")


def q_pdf_extract(sf_dir: str):
    """PDF/layout parse (north rule): render each document as a real
    PDF binary (Flate streams, scrambled xref, two-column layout for
    even doc_ids, full Tm/Td/TD/T*/Tj/TJ/'/" operator mix), then
    extract reading-order text back out with XY-cut column detection
    and Courier-metric gap inference. Both stages are zero-shuffle
    map_batches with payload-capped batches (data/pdflayout.py).
    Fixed words-per-line layout makes page/line counts closed-form in
    the word count, so the whole round trip is SQL-checkable."""
    from .data.pdflayout import extract_pdfs, render_pdfs
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return extract_pdfs(render_pdfs(ds))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix C shape): flag
    training docs sharing any word 4-gram with the eval split
    (doc_id % 13 == 0 here). Bench side reduces to a sorted uint64
    gram-hash array broadcast once; train side is ONE zero-shuffle
    map_batches with sentinel-padded vectorized n-gram hashing
    (data/decontam.py)."""
    from .data.decontam import decontaminate
    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    import pyarrow.compute as pc

    def _split(want_bench: bool):
        # Ray 2.49 expression filters reject BinOp (% 13) — Arrow mask
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            is_b = pa.array(ids % 13 == 0)
            return b.filter(is_b if want_bench else pc.invert(is_b))
        f.__name__ = "bench_rows" if want_bench else "train_rows"
        return docs.map_batches(f, batch_format="pyarrow")

    return decontaminate(_split(False), _split(True), n=4)


def q_bloom_decontam(sf_dir: str):
    """Bloom-filter decontamination: same eval split and 4-gram
    semantics as q_decontaminate, but the broadcast side is a
    CONSTANT-SIZE packed bit array (2^20 bits, k=4) built from
    OR-mergeable per-block partials — the 100-TB shape when the eval
    suite outgrows a sorted-hash-array broadcast. At these parameters
    the false-positive probability is ~1e-10 per probe, so the exact
    string-membership oracle matches; the Bloom's one-sided FP
    semantics are pinned by a tiny-m scalar-reference pytest
    (data/decontam.py bloom_decontaminate)."""
    from .data.decontam import bloom_decontaminate
    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    import pyarrow.compute as pc

    def _split(want_bench: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            is_b = pa.array(ids % 13 == 0)
            return b.filter(is_b if want_bench else pc.invert(is_b))
        f.__name__ = "bench_rows" if want_bench else "train_rows"
        return docs.map_batches(f, batch_format="pyarrow")

    return bloom_decontaminate(_split(False), _split(True), n=4,
                               log2_m=20, k=4)


def q_stratified_sample(sf_dir: str):
    """Exact-count stratified sample: 25 docs per language, picked by
    smallest deterministic id hash — per-block per-stratum top-k
    partials, one tiny groupby, no corpus shuffle
    (data/sampling.py stratified_sample over rank.grouped_topk)."""
    from .data.sampling import stratified_sample
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "lang"])
    return stratified_sample(ds, key="lang", k=25)


def q_snapshot_dedup(sf_dir: str):
    """Incremental cross-snapshot dedup: docs with doc_id % 3 == 0
    play the already-ingested prior corpus; the 'new snapshot' keeps
    only rows whose md5 fingerprint is unseen. Prior side reduces to
    a distinct-fp broadcast; new side is one zero-shuffle map_batches
    (data/dedup.py snapshot_dedup; partitioned left_anti escape hatch
    for prior sets beyond driver memory)."""
    from .data.dedup import snapshot_dedup
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def _side(prior: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = pa.array(ids % 3 == 0)
            return b.filter(m if prior else pc.invert(m))
        f.__name__ = "prior_rows" if prior else "new_rows"
        return docs.map_batches(f, batch_format="pyarrow")

    return snapshot_dedup(_side(False), _side(True))


def q_snapshot_dedup_partitioned(sf_dir: str):
    """snapshot_dedup's beyond-driver-memory path: the prior side's
    distinct fingerprints stay distributed and the new snapshot is
    filtered by ONE left_anti hash join — same deterministic output
    as the broadcast default, so the oracle is shared."""
    from .data.dedup import snapshot_dedup
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def _side(prior: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = pa.array(ids % 3 == 0)
            return b.filter(m if prior else pc.invert(m))
        f.__name__ = "prior_rows" if prior else "new_rows"
        return docs.map_batches(f, batch_format="pyarrow")

    return snapshot_dedup(_side(False), _side(True),
                          join="partitioned", num_partitions=8)


def q_dedup_exact_partitioned(sf_dir: str):
    """The beyond-driver-memory exact-dedup escape hatch as a
    first-class oracle-checked query: narrow (fp, doc_id) inner hash
    join finds dropped ids, one corpus-wide left_anti join keeps the
    rest — no broadcast map anywhere. Output is deterministic
    (keeper = min doc_id per content hash), so the SQL oracle is the
    same QUALIFY-window expression regardless of join strategy."""
    from .data.dedup import exact_dedup
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return exact_dedup(ds, join="partitioned", num_partitions=8) \
        .select_columns(["doc_id", "text", "fp"])


def q_minhash_dups_partitioned(sf_dir: str):
    """minhash_near_dups' distributed keeper path (Dataset hash join
    on the band key instead of the broadcast map) — identical output
    to the broadcast default, now driver-oracle-checked, not only
    pytest-parity-checked."""
    from .data.dedup import minhash_near_dups
    return minhash_near_dups(_read(sf_dir, "documents"),
                             join="partitioned", num_partitions=8)


def q_simhash_dups_partitioned(sf_dir: str):
    """simhash_near_dups' distributed verify path (inner join keeps
    candidate rows, per-bucket Arrow group kernel verifies) — same
    output as broadcast, oracle-checked."""
    from .data.dedup import simhash_near_dups
    return simhash_near_dups(_read(sf_dir, "documents"),
                             join="partitioned", num_partitions=8)


def q_components_partitioned(sf_dir: str):
    """Connected components via the fully-distributed label path
    (iterative min-label propagation: one partitioned hash join + one
    groupby-min per round, Sum-fixed-point convergence) instead of
    driver-side union-find — same deterministic labels, so it shares
    dedup_components' recursive-CTE oracle."""
    from .data.dedup import components_from_pairs, \
        _jaccard_pair_stream
    ds = _read(sf_dir, "documents")
    pairs = _jaccard_pair_stream(ds, threshold=0.8)
    return components_from_pairs(pairs, ds, pair_a="doc_id",
                                 pair_b="dup_of", id_col="doc_id",
                                 join="partitioned",
                                 num_partitions=8) \
        .select_columns(["doc_id", "component"])


def q_pagerank(sf_dir: str):
    """Iterative distributed graph computation with an EXACT oracle:
    5 rounds of fixed-point integer PageRank (one partitioned hash
    join + one groupby-sum per round) over a deterministic 3-out-link
    graph. Integer floor-division contributions make partial sums
    commute, so the result is bit-identical under any partitioning —
    and a DuckDB unrolled-CTE reproduces it exactly (the iterative
    class is normally the 'no SQL oracle' bucket; integer arithmetic
    moves it into the hash-checked one)."""
    from .data.graph import pagerank
    return pagerank(_read(sf_dir, "documents"), n_iters=5,
                    num_partitions=8)


def q_pack_sequences(sf_dir: str):
    """Sequence packing (T5/GPT batch packing): deterministic next-fit
    of docs into 2000-char training sequences within hash buckets —
    one narrow groupby, per-bucket packing loops over output
    sequences, not input rows (data/packing.py)."""
    from .data.packing import pack_sequences
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "n_chars"])
    return pack_sequences(ds, budget=2000, n_buckets=8)


def q_len_quantiles(sf_dir: str):
    """Exact quantiles via a distributed value histogram (np.unique
    partials + ONE narrow groupby) — no global sort; integer rank
    arithmetic end to end (data/rank.py)."""
    from .data.rank import quantiles
    return quantiles(_read(sf_dir, "documents"), "n_chars",
                     (10, 25, 50, 75, 90))


def q_partitioned_write(sf_dir: str):
    """Hive-partitioned write round trip: write documents partitioned
    by lang (one directory per key — the resumable-output layout the
    100-TB sink uses), read the partition tree back, count rows per
    partition. Validates the write path end to end; the oracle is
    just the group count on the input."""
    import os
    import shutil

    from ray.data.aggregate import Count

    from .io import read_corpus

    out = os.path.join("/tmp/soupflow_pwrite",
                       os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "n_chars"])
    ds.write_parquet(out, partition_cols=["lang"])
    back = read_corpus(out)

    def norm(b: pa.Table) -> pa.Table:
        # partition values come back as dictionary-encoded strings
        return pa.table({"lang": b.column("lang").cast(pa.string())})

    return back.map_batches(norm, batch_format="pyarrow") \
        .groupby("lang").aggregate(Count(alias_name="n"))


def q_grouped_quantiles(sf_dir: str):
    """Per-language exact n_chars quantiles (p25/50/75): per-batch
    (key, value) histogram partials, ONE narrow groupby, driver-side
    per-key integer-rank cumsum (data/rank.py grouped_quantiles)."""
    from .data.rank import grouped_quantiles
    return grouped_quantiles(_read(sf_dir, "documents"), "lang",
                             "n_chars", (25, 50, 75))


def q_kmv_distinct(sf_dir: str):
    """KMV bottom-k distinct-count sketch over orders.o_custkey:
    per-block k-smallest distinct hashes, driver merge, exact integer
    estimate arithmetic — the column itself never shuffles
    (data/sketch.py). Exact below k distincts (sf0.001) and an
    estimate above (sf0.01+), so both regimes are oracle-exercised."""
    from .data.sketch import kmv_distinct
    return kmv_distinct(_read(sf_dir, "orders"), "o_custkey", k=256)


# Epoch weights for q_upsample_epochs: srcN → (N%4) + ((3N)%8)/8
# epochs. Covers k=0 full-drop sources (src0/8/16), pure-integer
# epochs, and fractional hash draws.
UPSAMPLE_WEIGHTS = {f"src{n}": (n % 4, (3 * n) % 8, 8)
                    for n in range(20)}


def q_weighted_sample(sf_dir: str):
    """Length-weighted deterministic sample (Efraimidis–Spirakis
    priority keys, 100 docs ∝ n_chars): map-side keys + per-block
    top-k prune, ONE tiny sort over surviving partials — the corpus
    never shuffles (data/sampling.py weighted_sample)."""
    from .data.sampling import weighted_sample
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "n_chars"])
    return weighted_sample(ds, k=100, weight_col="n_chars")


def q_running_total(sf_dir: str):
    """Per-customer running order total — the ordered window-function
    class SUM(...) OVER (PARTITION BY key ORDER BY ...). Money is
    converted to integer cents map-side (floor(x·100 + 0.5), the
    expression the oracle mirrors) so every partial sum is exact; ONE
    global sort on (custkey, date, orderkey), vectorized segmented
    cumsum per block, zero-shuffle BROADCAST-BASE fixup for the ≤2
    edge segments per block — hot keys never form a single-task
    group (data/windows.py windowed_cumsum)."""
    from .data.windows import windowed_cumsum

    def to_cents(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
        return b.drop_columns(["o_totalprice"]).append_column(
            "cents", pa.array(cents))

    ds = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    out = windowed_cumsum(ds, key_col="o_custkey",
                          order_cols=["o_orderdate", "o_orderkey"],
                          val_col="cents", out_col="running_cents")
    return out.select_columns(
        ["o_orderkey", "o_custkey", "running_cents"])


def q_corr_by_flag(sf_dir: str):
    """Exact per-group Pearson correlation of quantity vs discount by
    return flag — integer (n, Σx, Σy, Σx², Σy², Σxy) scatter-add
    partials per block, ONE tiny groupby, driver-side factored float
    expression the oracle mirrors (data/rank.py group_corr). Discount
    is quantized to integer percent with the same floor(x·100 + 0.5)
    both sides."""
    from .data.rank import group_corr

    def quantize(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "qx": pa.array(q, pa.int64()),
            "qy": pa.array(np.floor(d * 100.0 + 0.5).astype(np.int64),
                           pa.int64())})

    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_quantity", "l_discount"]) \
        .map_batches(quantize, batch_format="pyarrow")
    return group_corr(ds, key="l_returnflag", xcol="qx", ycol="qy")


def q_orders_with_returns(sf_dir: str):
    """EXISTS semi-join: count orders by priority having at least one
    returned lineitem. The key set is a large fraction of the fact
    table — too big to broadcast (contrast customers_no_orders) — and
    previously ran as groupby + partitioned join + groupby (three
    wide ops at Ray sort fixed cost). Round 5: the ONE-PASS sentinel
    shape (the late_suppliers / priority_check kernel family): every
    order folds to a (ok, −1, prio) SENTINEL row, lineitem pre-dedups
    per block to distinct R-keys (ok, 0), the union sorts ONCE on
    (ok, fl) so sentinels lead their runs, and a zero-shuffle segment
    kernel counts runs with a non-empty tail per priority — a
    COMPLETE run without a sentinel is an R-lineitem whose order is
    missing, an FK violation that raises (no window filter here, so
    unlike Q4 every order emits a sentinel). The ≤2 edge runs per
    block finish driver-side through the same kernel
    (data/segments.py finish_sorted_runs owns the interior/edge
    plumbing); only O(blocks × 5) count rows ever move."""
    from .data.segments import finish_sorted_runs

    def ord_fold(b: pa.Table) -> pa.Table:
        return pa.table({
            "ok": b.column("o_orderkey"),
            "fl": pa.array(np.full(b.num_rows, -1, np.int64)),
            "pr": b.column("o_orderpriority")})
    ord_fold.__name__ = "owr_order_fold"

    def li_fold(b: pa.Table) -> pa.Table:
        mask = pc.equal(b.column("l_returnflag"), "R")
        k = np.unique(b.filter(mask).column("l_orderkey")
                      .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "ok": pa.array(k, pa.int64()),
            "fl": pa.array(np.zeros(k.size, np.int64)),
            "pr": pa.array([""] * k.size, pa.string())})
    li_fold.__name__ = "owr_rkey_fold"

    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_returnflag"]) \
        .map_batches(li_fold, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_orderpriority"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    _empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        """Per-priority counts of runs with ≥1 non-sentinel row over
        a (ok, fl)-sorted slice of COMPLETE runs."""
        ok, fl, pr = cols["ok"], cols["fl"], cols["pr"]
        if ok.size == 0:
            return _empty
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        rid = np.cumsum(new) - 1
        has_sent = fl[rstart] == -1
        if not bool(has_sent.all()):
            raise ValueError(
                "orders_with_returns: returned lineitem orderkey "
                "missing from orders — FK violation")
        tail = np.bincount(rid[fl != -1],
                           minlength=rstart.size) > 0
        ps, cs = np.unique(pr[rstart[tail]], return_counts=True)
        return pa.table({
            "o_orderpriority": pa.array(ps.tolist(), pa.string()),
            "n": pa.array(cs, pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl"], str_cols=["pr"],
        kernel=kernel, empty_partial=_empty)
    counts: dict[str, int] = {}
    for p, n in zip(partial.column("o_orderpriority").to_pylist(),
                    partial.column("n").to_pylist()):
        counts[p] = counts.get(p, 0) + n
    prios = sorted(counts)
    return pa.table({
        "o_orderpriority": pa.array(prios, pa.string()),
        "n_orders": pa.array([counts[p] for p in prios],
                             pa.int64())})


def q_priority_by_status(sf_dir: str):
    """Conditional aggregation over a fact-fact equi-key pairing
    (TPC-H Q12 shape): per line status, how many lineitems belong to
    high-priority (1-URGENT / 2-HIGH) vs other orders. Round 5: the
    former partitioned hash join — which moved every RAW lineitem
    row through the exchange — collapses into the ONE-PASS sentinel
    shape (seventh in the family; data/segments.py finish_sorted_runs
    owns the interior/edge plumbing): orders fold to (ok, −1,
    is_high, "") sentinel rows, lineitem pre-reduces per block to
    (ok, 0, count, status) partials — at most one row per (orderkey,
    status) per block leaves the scan — the union sorts ONCE on
    (ok, fl), and the zero-shuffle segment kernel broadcasts each
    run's sentinel bit over its fact rows and emits ≤|statuses|-row
    (status, high, low) partials per block. A complete run without a
    sentinel is a lineitem orderkey missing from orders and raises
    (family FK convention; the oracle's inner join would drop it
    silently). Fully distributed — no driver-side dim at all."""
    from .data.segments import finish_sorted_runs

    def ord_fold(b: pa.Table) -> pa.Table:
        hi = pc.is_in(b.column("o_orderpriority"),
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        n = b.num_rows
        return pa.table({
            "ok": b.column("o_orderkey"),
            "fl": pa.array(np.full(n, -1, np.int64)),
            "n": hi.cast(pa.int64()),
            "st": pa.array([""] * n, pa.string())})
    ord_fold.__name__ = "q12_order_fold"

    def li_fold(b: pa.Table) -> pa.Table:
        t = pa.table({"ok": b.column("l_orderkey"),
                      "st": b.column("l_linestatus")})
        g = t.group_by(["ok", "st"]).aggregate([([], "count_all")]) \
            .rename_columns(["ok", "st", "n"])
        return pa.table({
            "ok": g.column("ok"),
            "fl": pa.array(np.zeros(g.num_rows, np.int64)),
            "n": g.column("n").cast(pa.int64()),
            "st": g.column("st")})
    li_fold.__name__ = "q12_li_fold"

    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_linestatus"]) \
        .map_batches(li_fold, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_orderpriority"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    _empty = pa.table({"l_linestatus": pa.array([], pa.string()),
                       "high_lines": pa.array([], pa.int64()),
                       "low_lines": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        """Per-status (high, low) lineitem counts over a (ok, fl)-
        sorted slice of COMPLETE runs; the sentinel's n slot carries
        the order's is_high bit, fact rows' n slots carry per-status
        lineitem counts."""
        ok, fl = cols["ok"], cols["fl"]
        n, st = cols["n"], cols["st"]
        if ok.size == 0:
            return _empty
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        if not bool((fl[rstart] == -1).all()):
            raise ValueError(
                "priority_by_status: lineitem orderkey missing from "
                "orders — FK violation")
        rid = np.cumsum(new) - 1
        hi_row = n[rstart][rid]          # sentinel bit per row
        fact = fl != -1
        uniq, inv = np.unique(st[fact], return_inverse=True)
        h = np.zeros(uniq.size, np.int64)
        lo = np.zeros(uniq.size, np.int64)
        nf = n[fact]
        hf = hi_row[fact] == 1
        np.add.at(h, inv[hf], nf[hf])
        np.add.at(lo, inv[~hf], nf[~hf])
        return pa.table({
            "l_linestatus": pa.array(uniq.tolist(), pa.string()),
            "high_lines": pa.array(h, pa.int64()),
            "low_lines": pa.array(lo, pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl", "n"], str_cols=["st"],
        kernel=kernel, empty_partial=_empty)
    sts = np.asarray(partial.column("l_linestatus").to_pylist(),
                     dtype=object)
    h = partial.column("high_lines").to_numpy(zero_copy_only=False)
    lo = partial.column("low_lines").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(sts, return_inverse=True)
    hs = np.zeros(uniq.size, np.int64)
    ls = np.zeros(uniq.size, np.int64)
    np.add.at(hs, inv, h)
    np.add.at(ls, inv, lo)
    return pa.table({
        "l_linestatus": pa.array(uniq.tolist(), pa.string()),
        "high_lines": pa.array(hs, pa.int64()),
        "low_lines": pa.array(ls, pa.int64())})


def q_rank_by_lang(sf_dir: str):
    """Per-row RANK() OVER (PARTITION BY lang ORDER BY n_chars)
    WITHOUT a global sort: rank = 1 + #smaller-in-group is a pure
    function of the bounded (lang, n_chars) histogram, so one
    unique-partial pass + ONE tiny groupby + a zero-shuffle broadcast
    scoring map replace the all-to-all sort (data/rank.py
    group_rank)."""
    from .data.rank import group_rank
    return group_rank(_read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "n_chars"]), key="lang", col="n_chars")


def q_cume_dist_by_lang(sf_dir: str):
    """CUME_DIST as exact integer (numerator, denominator) — the last
    cell of the rank-window family (ROW_NUMBER/RANK/DENSE_RANK/NTILE
    are already in the catalog): per doc, c_le = the SQL default
    RANGE-frame COUNT(*) OVER (PARTITION BY lang ORDER BY n_chars) =
    #rows with value ≤ own (ties-high), plus the group size;
    cume_dist = c_le / n_key derives exactly, no float shuffles.
    Sort-free histogram arithmetic (data/rank.py group_cume_counts):
    corpus rows never move."""
    from .data.rank import group_cume_counts
    return group_cume_counts(
        _read(sf_dir, "documents").select_columns(
            ["doc_id", "lang", "n_chars"]),
        key="lang", col="n_chars")


def q_dense_rank_by_lang(sf_dir: str):
    """Per-row DENSE_RANK() OVER (PARTITION BY lang ORDER BY n_chars)
    — same sort-free histogram machinery as rank_by_lang, with the
    within-key cumsum taken over ONES (1 + #distinct smaller) instead
    of counts (data/rank.py group_rank dense=True)."""
    from .data.rank import group_rank
    return group_rank(_read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "n_chars"]), key="lang", col="n_chars",
        out_col="drnk", dense=True)


def q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(priority, year) revenue cube: the multi-level
    reporting aggregate. Scale shape: ONE corpus pass of in-batch
    (priority, year, cents) partials + ONE bounded groupby builds the
    BASE level; the coarser ROLLUP levels are derived driver-side
    from the |priorities|·|years|-row base table — never a second
    scan or shuffle. Sentinels ('ALL', 0) instead of SQL NULLs keep
    both sides' columns pure string/int64 for the hash compare;
    integer-cents money keeps sums order-free."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def partial(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
        yr = pc.year(b.column("o_orderdate")).cast(pa.int64())
        t = pa.table({"prio": b.column("o_orderpriority"),
                      "yr": yr,
                      "cents": pa.array(cents, pa.int64())})
        g = t.group_by(["prio", "yr"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["prio", "yr", "rev_cents",
                                 "n_orders"])
    partial.__name__ = "rollup_partial"

    base = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_orderpriority", "o_orderdate",
                         "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["prio", "yr"]).aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("n_orders", alias_name="n_orders")))
    lvl1 = base.group_by("prio").aggregate(
        [("rev_cents", "sum"), ("n_orders", "sum")]) \
        .rename_columns(["prio", "rev_cents", "n_orders"])
    n1 = lvl1.num_rows
    lvl1 = lvl1.add_column(1, "yr", pa.array([0] * n1, pa.int64()))
    total = pa.table({
        "prio": pa.array(["ALL"], pa.string()),
        "yr": pa.array([0], pa.int64()),
        "rev_cents": pa.array(
            [pc.sum(base.column("rev_cents")).as_py() or 0],
            pa.int64()),
        "n_orders": pa.array(
            [pc.sum(base.column("n_orders")).as_py() or 0],
            pa.int64())})
    cols = ["prio", "yr", "rev_cents", "n_orders"]
    return pa.concat_tables([base.select(cols), lvl1.select(cols),
                             total])


def q_revenue_cube(sf_dir: str):
    """GROUP BY CUBE(priority, year): the full grouping-sets lattice
    — base (p, y), both one-dimension margins (p, ALL) and (ALL, y),
    and the grand total. Same scale shape as revenue_rollup: ONE
    corpus pass + ONE bounded groupby builds the base level; all
    coarser grouping sets derive driver-side from the
    |priorities|·|years|-row base table (a CUBE costs no more scans
    than a ROLLUP). ('ALL', 0) sentinels, integer-cents sums."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def partial(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
        yr = pc.year(b.column("o_orderdate")).cast(pa.int64())
        t = pa.table({"prio": b.column("o_orderpriority"),
                      "yr": yr,
                      "cents": pa.array(cents, pa.int64())})
        g = t.group_by(["prio", "yr"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["prio", "yr", "rev_cents",
                                 "n_orders"])
    partial.__name__ = "cube_partial"

    base = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_orderpriority", "o_orderdate",
                         "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["prio", "yr"]).aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("n_orders", alias_name="n_orders")))

    def margin(keys: list[str]) -> pa.Table:
        g = base.group_by(keys).aggregate(
            [("rev_cents", "sum"), ("n_orders", "sum")]) \
            .rename_columns([*keys, "rev_cents", "n_orders"])
        if "prio" not in keys:
            g = g.add_column(0, "prio", pa.array(
                ["ALL"] * g.num_rows, pa.string()))
        if "yr" not in keys:
            g = g.add_column(1, "yr", pa.array(
                [0] * g.num_rows, pa.int64()))
        return g

    total = pa.table({
        "prio": pa.array(["ALL"], pa.string()),
        "yr": pa.array([0], pa.int64()),
        "rev_cents": pa.array(
            [pc.sum(base.column("rev_cents")).as_py() or 0],
            pa.int64()),
        "n_orders": pa.array(
            [pc.sum(base.column("n_orders")).as_py() or 0],
            pa.int64())})
    cols = ["prio", "yr", "rev_cents", "n_orders"]
    return pa.concat_tables([
        base.select(cols), margin(["prio"]).select(cols),
        margin(["yr"]).select(cols), total])


def _source_df_agg(sf_dir: str, src_a: str = "src0",
                   src_b: str = "src1"):
    """Shared two-source per-term document-frequency aggregate: rows
    of other sources are dropped at the filter, each block reduces
    map-side to (term, df_a, df_b) distinct-doc partials (a doc never
    spans blocks, so per-block distinct counts sum exactly), and ONE
    vocabulary-bounded groupby(term) finishes — the text itself never
    shuffles. Feeds the INTERSECT (common_terms) and EXCEPT
    (exclusive_terms) set-operation surfaces."""
    from ray.data.aggregate import Sum

    from .data.textstats import _text_array, _ws_tokens

    def partial(batch: pa.Table) -> pa.Table:
        # Ray 2.49 expression filters reject `in` — Arrow mask here
        batch = batch.filter(pc.is_in(
            batch.column("source"),
            value_set=pa.array([src_a, src_b])))
        arr = pc.utf8_lower(_text_array(batch))
        offs, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            np.diff(offs))
        keep = toks != ""
        toks, doc_idx = toks[keep], doc_idx[keep]
        uniq, codes = np.unique(toks, return_inverse=True)
        nu = max(len(uniq), 1)
        upair = np.unique(doc_idx * nu + codes)  # distinct (doc,term)
        ucodes, udoc = upair % nu, upair // nu
        is_a = pc.equal(batch.column("source"), src_a) \
            .to_numpy(zero_copy_only=False)[udoc]
        df_a = np.bincount(ucodes[is_a],
                           minlength=len(uniq)).astype(np.int64)
        df_b = np.bincount(ucodes[~is_a],
                           minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "term": pa.array(uniq, pa.string()),
            "df_a": pa.array(df_a, pa.int64()),
            "df_b": pa.array(df_b, pa.int64())})
    partial.__name__ = "source_df_partial"

    return _read(sf_dir, "documents") \
        .select_columns(["text", "source"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_a", alias_name="df_a"),
                                   Sum("df_b", alias_name="df_b"))


def q_common_terms(sf_dir: str):
    """Vocabulary INTERSECT of two sources, with per-source document
    frequency — terms in BOTH src0 and src1 docs (shared aggregate:
    see _source_df_agg)."""
    def both(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(
            pc.greater(b.column("df_a"), 0),
            pc.greater(b.column("df_b"), 0)))
    both.__name__ = "both_sources_filter"

    return _source_df_agg(sf_dir).map_batches(
        both, batch_format="pyarrow")


def q_exclusive_terms(sf_dir: str):
    """Vocabulary EXCEPT of two sources — word BIGRAMS appearing in
    src0 docs but in NO src1 doc, with their src0 document frequency
    (bigrams, because the synthetic sources share their entire
    unigram vocabulary — the unigram EXCEPT is empty). Completes the
    set-operation family (UNION ALL: top_account_parties, INTERSECT:
    common_terms, EXCEPT: here). Same one-shuffle shape as
    _source_df_agg: per-block distinct-doc (bigram, df_a, df_b)
    partials, ONE vocabulary-bounded groupby, text never shuffles."""
    from ray.data.aggregate import Sum

    from .data.textstats import _text_array, _ws_tokens

    src_a, src_b = "src0", "src1"

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(
            batch.column("source"),
            value_set=pa.array([src_a, src_b])))
        arr = pc.utf8_lower(_text_array(batch))
        offs, flat = _ws_tokens(arr)
        toks = np.asarray(flat.to_pandas(), dtype=object)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            np.diff(offs))
        keep = toks != ""
        toks, doc_idx = toks[keep], doc_idx[keep]
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df_a": pa.array([], pa.int64()),
                          "df_b": pa.array([], pa.int64())})
        if toks.size < 2:
            return empty
        same = doc_idx[:-1] == doc_idx[1:]
        bigrams = toks[:-1][same] + " " + toks[1:][same]
        bdoc = doc_idx[:-1][same]
        if bigrams.size == 0:
            return empty
        uniq, codes = np.unique(bigrams, return_inverse=True)
        nu = len(uniq)
        upair = np.unique(bdoc * nu + codes)  # distinct (doc, bigram)
        ucodes, udoc = upair % nu, upair // nu
        is_a = pc.equal(batch.column("source"), src_a) \
            .to_numpy(zero_copy_only=False)[udoc]
        df_a = np.bincount(ucodes[is_a], minlength=nu) \
            .astype(np.int64)
        df_b = np.bincount(ucodes[~is_a], minlength=nu) \
            .astype(np.int64)
        return pa.table({
            "term": pa.array(uniq, pa.string()),
            "df_a": pa.array(df_a, pa.int64()),
            "df_b": pa.array(df_b, pa.int64())})
    partial.__name__ = "source_bigram_df_partial"

    agg = _read(sf_dir, "documents") \
        .select_columns(["text", "source"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_a", alias_name="df_a"),
                                   Sum("df_b", alias_name="df_b"))

    def only_a(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.greater(b.column("df_a"), 0),
            pc.equal(b.column("df_b"), 0)))
        return t.drop_columns(["df_b"])
    only_a.__name__ = "only_src0_filter"

    return agg.map_batches(only_a, batch_format="pyarrow")


def q_nation_customer_stats(sf_dir: str):
    """LEFT OUTER join aggregate: per nation, customer count and
    total account balance INCLUDING zero-customer nations — the
    preserve-empty-groups semantics an inner-join aggregate loses.
    Scale shape: the fact side reduces to (nationkey, n, cents)
    in-batch partials + ONE key-bounded groupby; the 25-row nation
    dim then LEFT-joins via a zero-shuffle broadcast lookup with
    COALESCE-to-zero fill — the dim table never shuffles and the
    fact table never moves whole rows."""
    import ray
    from ray.data.aggregate import Sum

    from .io import collect_table

    def partial(b: pa.Table) -> pa.Table:
        ab = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(ab * 100.0 + 0.5).astype(np.int64)
        t = pa.table({
            "nk": b.column("c_nationkey").cast(pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "one": pa.array(np.ones(len(b), np.int64), pa.int64())})
        g = t.group_by("nk").aggregate(
            [("one", "sum"), ("cents", "sum")])
        return g.rename_columns(["nk", "n_customers", "bal_cents"])
    partial.__name__ = "nation_cust_partial"

    agg = collect_table(
        _read(sf_dir, "customer")
        .select_columns(["c_nationkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("nk").aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("bal_cents", alias_name="bal_cents")))
    ak = agg.column("nk").to_numpy(zero_copy_only=False)
    order = np.argsort(ak)
    ak = ak[order]
    an = agg.column("n_customers") \
        .to_numpy(zero_copy_only=False)[order]
    ac = agg.column("bal_cents").to_numpy(zero_copy_only=False)[order]
    handle = ray.put((ak, an, ac))

    def attach(b: pa.Table) -> pa.Table:
        ks, ns, cs = ray.get(handle)
        nk = b.column("n_nationkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = np.zeros(nk.size, np.int64)
        c = np.zeros(nk.size, np.int64)
        if ks.size:
            pos = np.minimum(np.searchsorted(ks, nk), ks.size - 1)
            hit = ks[pos] == nk
            n[hit] = ns[pos[hit]]
            c[hit] = cs[pos[hit]]
        return pa.table({
            "n_name": b.column("n_name"),
            "n_customers": pa.array(n, pa.int64()),
            "bal_cents": pa.array(c, pa.int64())})
    attach.__name__ = "left_join_fill_zero"

    return _read(sf_dir, "nation") \
        .select_columns(["n_nationkey", "n_name"]) \
        .map_batches(attach, batch_format="pyarrow")


def q_top_account_parties(sf_dir: str):
    """Cross-table UNION ALL + global top-k: the 50 highest account
    balances across customers AND suppliers, tagged by kind. Scale
    shape: each table is projected to (name, kind, bal_cents) and
    pruned to its per-block top-50 map-side (one lexsort per block),
    so the final global sort+limit runs over ≤ 50·num_blocks rows —
    the union never materializes either corpus."""
    k = 50

    def mk_partial(name_col: str, bal_col: str, kind: str):
        def part(b: pa.Table) -> pa.Table:
            bal = b.column(bal_col).to_numpy(zero_copy_only=False)
            cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
            names = np.asarray(b.column(name_col).to_pylist(),
                               dtype=object)
            top = np.lexsort((names, -cents))[:k]
            return pa.table({
                "name": pa.array(names[top].tolist(), pa.string()),
                "kind": pa.array([kind] * top.size, pa.string()),
                "bal_cents": pa.array(cents[top], pa.int64())})
        part.__name__ = f"topk_partial_{kind}"
        return part

    cust = _read(sf_dir, "customer") \
        .select_columns(["c_name", "c_acctbal"]) \
        .map_batches(mk_partial("c_name", "c_acctbal", "cust"),
                     batch_format="pyarrow")
    supp = _read(sf_dir, "supplier") \
        .select_columns(["s_name", "s_acctbal"]) \
        .map_batches(mk_partial("s_name", "s_acctbal", "supp"),
                     batch_format="pyarrow")
    return cust.union(supp) \
        .sort(["bal_cents", "name"], descending=[True, False]) \
        .limit(k)


def q_profile_lineitem(sf_dir: str):
    """One-pass table PROFILING (the DESCRIBE/data-quality surface):
    per-column row count, null count, min, max and exact integer sum
    for lineitem's numeric columns — the statistics pass every
    warehouse runs before trusting a feed. Scale shape: each block
    emits ONE narrow row per column (k rows per block regardless of
    block size — min/max/sum/count all commute), ONE groupby over
    |columns| rows finishes; nothing else shuffles. Money/rate
    columns are folded to integer cents / basis points map-side
    (floor(x·scale + 0.5), mirrored by the oracle) so sums are exact
    and the hash compare is float-free."""
    from ray.data.aggregate import Max, Min, Sum

    specs = [  # (column, integer scale)
        ("l_quantity", 1),
        ("l_extendedprice", 100),
        ("l_discount", 100),
        ("l_tax", 100),
    ]

    def partial(b: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for col, scale in specs:
            arr = b.column(col)
            null_n = arr.null_count
            v = arr.drop_null().to_numpy(zero_copy_only=False)
            iv = np.floor(v * scale + 0.5).astype(np.int64) \
                if scale != 1 else v.astype(np.int64)
            names.append(col)
            ns.append(len(arr))
            nulls.append(null_n)
            mins.append(int(iv.min()) if iv.size else 2**62)
            maxs.append(int(iv.max()) if iv.size else -2**62)
            sums.append(int(iv.sum()))
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "min_v": pa.array(mins, pa.int64()),
            "max_v": pa.array(maxs, pa.int64()),
            "sum_v": pa.array(sums, pa.int64())})
    partial.__name__ = "profile_partial"

    return _read(sf_dir, "lineitem") \
        .select_columns([c for c, _ in specs]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("col").aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
            Sum("sum_v", alias_name="sum_v"))


def q_order_seq(sf_dir: str):
    """Per-customer order SEQUENCE NUMBER — ROW_NUMBER() OVER
    (PARTITION BY custkey ORDER BY date, orderkey). Zero new
    machinery: row_number is the running COUNT, i.e. windowed_cumsum
    over a ones column — same one-sort + broadcast-base fixup, same
    hot-key safety."""
    from .data.windows import windowed_cumsum

    def ones(b: pa.Table) -> pa.Table:
        return b.append_column(
            "one", pa.array(np.ones(b.num_rows, np.int64)))
    ones.__name__ = "append_ones"

    ds = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate", "o_orderkey"]) \
        .map_batches(ones, batch_format="pyarrow")
    out = windowed_cumsum(ds, key_col="o_custkey",
                          order_cols=["o_orderdate", "o_orderkey"],
                          val_col="one", out_col="seq")
    return out.select_columns(["o_orderkey", "o_custkey", "seq"])


def q_retention_cohorts(sf_dir: str, join: str = "broadcast",
                        num_partitions: int = 32):
    """Cohort RETENTION analysis — the classic product-analytics
    composite: users grouped by first-seen day (cohort), counted at
    each later active day offset k. Scale shape: (1) per-block
    DISTINCT (user, epoch-day) pairs shrink the shuffle before it
    happens, ONE groupby finishes the global dedup (bounded by
    |users|·|days|, never event count); (2) the per-user first-seen
    day reduces map-side to (user, min day) partials + ONE
    user-bounded groupby, broadcast as sorted arrays; (3) a
    zero-shuffle map scores k = day − cohort and pre-counts per
    block, finishing with ONE tiny groupby over |cohorts|·|offsets|
    rows. Events themselves never shuffle.

    ``join="partitioned"``: the IMPLEMENTED escape for user sets
    beyond driver memory — the (user, cohort) table stays a Dataset
    and attaches to the distinct (user, day) pairs via ONE
    user-partitioned hash join; everything downstream is identical.
    Row-identical to broadcast (parity pytest)."""
    import ray
    from ray.data.aggregate import Count, Min, Sum

    from .io import collect_table

    US_PER_DAY = 86_400_000_000

    def pairs_partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        t = pa.table({
            "user_id": b.column("user_id"),
            "day": pa.array(ts // US_PER_DAY, pa.int64())})
        return t.group_by(["user_id", "day"]).aggregate([])
    pairs_partial.__name__ = "distinct_user_day_partial"

    pairs = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts"]) \
        .map_batches(pairs_partial, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]) \
        .materialize()  # narrow (user, day) rows; feeds two consumers

    def min_partial(b: pa.Table) -> pa.Table:
        g = b.select(["user_id", "day"]).group_by("user_id") \
            .aggregate([("day", "min")])
        return g.rename_columns(["user_id", "cohort"])
    min_partial.__name__ = "first_seen_partial"

    cohort_agg = pairs.map_batches(min_partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("cohort",
                                          alias_name="cohort"))

    if join == "partitioned":
        # user-partitioned hash join instead of a driver broadcast —
        # both sides repartition+materialize (Ray 2.49's hash join
        # rejects empty/schema-less blocks); a user base that never
        # fits the driver streams through here unchanged.
        cohort_ds = cohort_agg.repartition(num_partitions).materialize()
        if cohort_ds.count() == 0:
            return ray.data.from_arrow(pa.table({
                "cohort_day": pa.array([], pa.string()),
                "k": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64())}))
        joined = pairs.repartition(num_partitions).join(
            cohort_ds, join_type="inner", num_partitions=num_partitions,
            on=("user_id",))

        def score_joined(b: pa.Table) -> pa.Table:
            d = b.column("day").to_numpy(zero_copy_only=False)
            coh = b.column("cohort").to_numpy(zero_copy_only=False)
            t = pa.table({"cohort": pa.array(coh, pa.int64()),
                          "k": pa.array(d - coh, pa.int64())})
            g = t.group_by(["cohort", "k"]).aggregate([("k", "count")])
            return g.rename_columns(["cohort", "k", "n_users"])
        score_joined.__name__ = "cohort_offset_joined_partial"

        agg = joined.map_batches(score_joined,
                                 batch_format="pyarrow") \
            .groupby(["cohort", "k"]) \
            .aggregate(Sum("n_users", alias_name="n_users"))
    else:
        cohorts = collect_table(cohort_agg)
        cu = cohorts.column("user_id").to_numpy(zero_copy_only=False)
        cc = cohorts.column("cohort").to_numpy(zero_copy_only=False)
        order = np.argsort(cu)
        handle = ray.put((cu[order], cc[order]))

        def score_partial(b: pa.Table) -> pa.Table:
            us, cs = ray.get(handle)
            u = b.column("user_id").to_numpy(zero_copy_only=False)
            d = b.column("day").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(us, u)
            # every user of a pair row is in the cohort table by
            # construction; guard anyway (empty-corpus safety)
            if us.size == 0:
                return pa.table({"cohort": pa.array([], pa.int64()),
                                 "k": pa.array([], pa.int64()),
                                 "n_users": pa.array([], pa.int64())})
            pos = np.minimum(pos, us.size - 1)
            coh = cs[pos]
            t = pa.table({"cohort": pa.array(coh, pa.int64()),
                          "k": pa.array(d - coh, pa.int64())})
            g = t.group_by(["cohort", "k"]).aggregate([("k", "count")])
            return g.rename_columns(["cohort", "k", "n_users"])
        score_partial.__name__ = "cohort_offset_partial"

        agg = pairs.map_batches(score_partial, batch_format="pyarrow") \
            .groupby(["cohort", "k"]) \
            .aggregate(Sum("n_users", alias_name="n_users"))

    def to_day_str(b: pa.Table) -> pa.Table:
        d = b.column("cohort").to_numpy(zero_copy_only=False)
        days = d.astype("datetime64[D]").astype(str)
        return pa.table({
            "cohort_day": pa.array(days.tolist(), pa.string()),
            "k": b.column("k"),
            "n_users": b.column("n_users")})
    to_day_str.__name__ = "cohort_to_date_string"

    return agg.map_batches(to_day_str, batch_format="pyarrow")


def q_dau_hll(sf_dir: str):
    """GROUPED HyperLogLog — approximate distinct users per event
    type, the constant-memory scale path where the exact two-phase
    COUNT(DISTINCT) of q_daily_active_users gets too heavy: a
    billion-user group ships the same 2^p registers as a ten-user
    one. Per-block single np.maximum.at over packed (group, bucket)
    scatter keys, ONE groupby over ≤ |groups|·2^p narrow rows; users
    never shuffle. Registers are the sketch's full integer state, so
    the oracle matches bit-for-bit (data/sketch.py hll_grouped)."""
    from .data.sketch import hll_grouped
    return hll_grouped(_read(sf_dir, "events"),
                       "event_type", "user_id", p=8)


_HIST_Q = dict(lo=0, width=100, nbins=64, qs=(10, 25, 50, 75, 90, 99))


def q_chars_histogram(sf_dir: str):
    """Fixed-bin mergeable quantile SKETCH over document length — the
    fourth sketch class (distinct: KMV/HLL, frequency: CMS,
    membership: Bloom, quantiles: here). Constant-size equi-width
    histogram partials (≤64 int64 cells per block regardless of rows
    or value domain), ONE groupby over ≤64 narrow rows, driver-side
    integer cumsum; the upper-edge estimate is pure integer
    arithmetic the oracle reproduces bit-for-bit (data/sketch.py
    histogram_quantiles). n_chars never shuffles."""
    from .data.sketch import histogram_quantiles
    return histogram_quantiles(
        _read(sf_dir, "documents"), "n_chars", **_HIST_Q)


def q_daily_events_vs_orders(sf_dir: str):
    """FULL OUTER join of two fact aggregates — days with events, days
    with orders, zero-filled on whichever side is absent — done as the
    union-groupby REWRITE: each fact reduces map-side to (day, n)
    partials, each side tags the other's column with 0, and ONE tiny
    groupby-sum over the union both finishes each side's aggregate AND
    realizes the full-outer semantics. No join operator, no null
    handling, neither fact ever shuffles whole rows — the all-to-all
    moves only |days| · 3 int/string columns."""
    from ray.data.aggregate import Sum

    def ev_partial(b: pa.Table) -> pa.Table:
        days = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        g = pa.table({"day": days}).group_by("day") \
            .aggregate([("day", "count")]) \
            .rename_columns(["day", "n_events"])
        return g.append_column(
            "n_orders", pa.array(np.zeros(g.num_rows, np.int64)))
    ev_partial.__name__ = "events_day_partial"

    def ord_partial(b: pa.Table) -> pa.Table:
        days = pc.strftime(b.column("o_orderdate"), format="%Y-%m-%d")
        g = pa.table({"day": days}).group_by("day") \
            .aggregate([("day", "count")]) \
            .rename_columns(["day", "n_orders"])
        return pa.table({
            "day": g.column("day"),
            "n_events": pa.array(np.zeros(g.num_rows, np.int64)),
            "n_orders": g.column("n_orders")})
    ord_partial.__name__ = "orders_day_partial"

    ev = _read(sf_dir, "events").select_columns(["ts"]) \
        .map_batches(ev_partial, batch_format="pyarrow")
    od = _read(sf_dir, "orders").select_columns(["o_orderdate"]) \
        .map_batches(ord_partial, batch_format="pyarrow")
    return ev.union(od).groupby("day").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_orders", alias_name="n_orders"))


def q_favorite_event(sf_dir: str):
    """Grouped MODE (argmax-by-count): each user's most frequent
    event type, ties broken by lexicographically smallest type — the
    per-group argmax class, done WITHOUT per-group Python or a sort.
    The tiny type vocabulary is dictionary-encoded once (driver-side,
    sorted so smaller rank = lexicographically smaller); per-block
    (user, type_idx, n) count partials + ONE groupby-sum bound rows by
    |users|·|types|; the argmax then PACKS (count, tie-rank) into one
    int64 (n·K + (K−1−idx), bigger = better) so a second groupby MAX —
    a pure C-path aggregate — picks the winner, decoded by a
    zero-shuffle map. No map_groups, no per-user Python anywhere."""
    from ray.data.aggregate import Max, Sum

    types = sorted(set(
        _read(sf_dir, "events").select_columns(["event_type"])
        .unique("event_type")))
    K = len(types)

    vocab = pa.array(types, pa.string())

    def count_partial(b: pa.Table) -> pa.Table:
        tix = pc.index_in(b.column("event_type"), value_set=vocab) \
            .cast(pa.int64())
        t = pa.table({"user_id": b.column("user_id"), "tix": tix})
        g = t.group_by(["user_id", "tix"]).aggregate([("tix", "count")])
        return g.rename_columns(["user_id", "tix", "n"])
    count_partial.__name__ = "user_type_count_partial"

    counts = _read(sf_dir, "events") \
        .select_columns(["user_id", "event_type"]) \
        .map_batches(count_partial, batch_format="pyarrow") \
        .groupby(["user_id", "tix"]).aggregate(Sum("n", alias_name="n"))

    def pack(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        tix = b.column("tix").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "packed": pa.array(n * K + (K - 1 - tix), pa.int64())})
    pack.__name__ = "pack_count_tierank"

    best = counts.map_batches(pack, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Max("packed", alias_name="p"))

    def decode(b: pa.Table) -> pa.Table:
        p = b.column("p").to_numpy(zero_copy_only=False)
        tix = K - 1 - (p % K)
        return pa.table({
            "user_id": b.column("user_id"),
            "fav": pa.array([types[i] for i in tix], pa.string()),
            "n": pa.array(p // K, pa.int64())})
    decode.__name__ = "decode_argmax"

    return best.map_batches(decode, batch_format="pyarrow")


def q_daily_active_users(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): daily active users per event
    type — the two-phase distinct-aggregate shape (what Spark plans
    for COUNT DISTINCT). Phase 1: per-block DISTINCT (type, day, user)
    triples (an Arrow group_by with no aggregates) shrink the shuffle
    to unique rows before it happens, then ONE groupby over the triple
    finishes the global dedup — the shuffle is bounded by
    |types|·|days|·|users|, not by event count. Phase 2: map-side
    per-block (type, day) count partials into a tiny groupby-sum.
    Events themselves never shuffle."""
    from ray.data.aggregate import Count, Sum

    def distinct_partial(batch: pa.Table) -> pa.Table:
        days = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        t = pa.table({
            "event_type": batch.column("event_type"),
            "day": days,
            "user_id": batch.column("user_id")})
        return t.group_by(["event_type", "day", "user_id"]) \
            .aggregate([])
    distinct_partial.__name__ = "distinct_triples_partial"

    distinct = _read(sf_dir, "events") \
        .select_columns(["event_type", "ts", "user_id"]) \
        .map_batches(distinct_partial, batch_format="pyarrow") \
        .groupby(["event_type", "day", "user_id"]) \
        .aggregate(Count(alias_name="_c"))

    def count_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"event_type": b.column("event_type"),
                      "day": b.column("day")})
        g = t.group_by(["event_type", "day"]) \
            .aggregate([("day", "count")])
        return g.rename_columns(["event_type", "day", "dau"])
    count_partial.__name__ = "dau_count_partial"

    return distinct.map_batches(count_partial,
                                batch_format="pyarrow") \
        .groupby(["event_type", "day"]) \
        .aggregate(Sum("dau", alias_name="dau"))


def q_rolling_active_users(sf_dir: str, window: int = 7):
    """Trailing 7-day ROLLING COUNT(DISTINCT user) per observed day —
    the WAU/MAU dashboard statistic and the catalog's
    NON-DECOMPOSABLE window-distinct representative: unlike every
    other rolling query (sums/counts merge across frames), distinct
    counts over overlapping windows share no partial aggregate, and
    the SQL form is a range self-join that re-reads every event
    ``window`` times. The engine shape instead reduces events to
    distinct (user, day) pairs map-side, sorts ONCE, and turns each
    user's sorted day run into disjoint coverage intervals whose ±1
    boundary deltas fold per block into day-span-bounded partials —
    one prefix sum finishes (data/windows.py rolling_distinct_count
    documents the sweep identity and the O(blocks × day-span) collect
    bound). Day truncation is UTC date (datetime64[D], = DuckDB
    CAST(ts AS DATE) on this all-positive-epoch corpus); counts are
    exact integers end-to-end."""
    from .data.windows import rolling_distinct_count

    def narrow(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ts" not in b.schema.names:
            e = pa.array([], pa.int64())
            return pa.table({"user_id": e, "day_i": e})
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "day_i": pa.array(day, pa.int64())})
    narrow.__name__ = "user_day_narrow"

    ds = _read(sf_dir, "events").select_columns(["user_id", "ts"]) \
        .map_batches(narrow, batch_format="pyarrow")
    t = rolling_distinct_count(ds, key_col="user_id",
                               day_col="day_i", window=window)
    if t.num_rows == 0:
        return pa.table({"day": pa.array([], pa.string()),
                         "wau": pa.array([], pa.int64())})
    d = t.column("day_i").to_numpy(zero_copy_only=False)
    return pa.table({
        "day": pa.array(d.astype("datetime64[D]").astype(str),
                        pa.string()),
        "wau": t.column("n_distinct")})


def q_rolling_revenue(sf_dir: str):
    """Per-customer MOVING 3-order revenue — the bounded-frame window
    class SUM(...) OVER (... ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW). Money folds to integer cents map-side (floor(x·100 + 0.5),
    mirrored by the oracle); ONE global sort on (custkey, date,
    orderkey), segmented cumsum + lagged-gather subtraction per
    block, zero-shuffle broadcast tail-injection fixup for the ≤2
    edge segments per block (data/windows.py windowed_rolling_sum)."""
    from .data.windows import windowed_rolling_sum

    def to_cents(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
        return b.drop_columns(["o_totalprice"]).append_column(
            "cents", pa.array(cents))

    ds = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    out = windowed_rolling_sum(
        ds, key_col="o_custkey",
        order_cols=["o_orderdate", "o_orderkey"],
        val_col="cents", out_col="rolling_cents", preceding=2)
    return out.select_columns(
        ["o_orderkey", "o_custkey", "rolling_cents"])


def q_event_gaps(sf_dir: str):
    """Per-user LAG/LEAD gaps — the OFFSET window-function class
    (``ts - LAG(ts) OVER (PARTITION BY user ORDER BY ts, id)``), the
    inter-arrival-time feature every behavioural pipeline computes.
    Timestamps fold to int64 micros BEFORE the shuffle (three int64
    columns move, nothing else); ONE global sort, vectorized diffs per block,
    zero-shuffle broadcast neighbor-ts fixup for the ≤2 edge
    segments per block (data/windows.py windowed_lag). -1 sentinel
    where SQL LAG/LEAD yields NULL."""
    from .data.windows import windowed_lag

    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "ts"])
    return windowed_lag(ds, key_col="user_id", ts_col="ts",
                        id_col="event_id")


def q_customers_no_orders(sf_dir: str):
    """Anti join: customers with NO large order (o_totalprice >
    400000). The fact side is pruned at the scan (two columns,
    predicate filter) and reduces map-side to DISTINCT custkeys per
    block (narrow int64 partials — order rows never shuffle); the
    distinct-key table is broadcast-sorted once and the dimension
    side filters by non-membership in ONE zero-shuffle pass. For a
    fact-side key set too big to broadcast, the same
    ds.join(join_type='left_anti') hatch as exact_dedup applies."""
    import ray

    from .io import collect_table

    def keys_partial(b: pa.Table) -> pa.Table:
        price = b.column("o_totalprice") \
            .to_numpy(zero_copy_only=False)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        k = np.unique(ck[price > 400000.0])
        return pa.table({"k": pa.array(k, pa.int64())})

    parts = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice"])
        .map_batches(keys_partial, batch_format="pyarrow"))
    keys = np.unique(parts.column("k").to_numpy(zero_copy_only=False)) \
        if parts.num_rows else np.empty(0, np.int64)
    handle = ray.put(keys)

    def anti(b: pa.Table) -> pa.Table:
        ks = ray.get(handle)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
        if ks.size:
            pos = np.searchsorted(ks, ck)
            pos = np.minimum(pos, ks.size - 1)
            keep = ks[pos] != ck
        else:
            keep = np.ones(ck.size, dtype=bool)
        return b.filter(pa.array(keep))
    anti.__name__ = "anti_join_filter"

    return _read(sf_dir, "customer") \
        .select_columns(["c_custkey", "c_name", "c_mktsegment"]) \
        .map_batches(anti, batch_format="pyarrow")


def q_zscore_by_lang(sf_dir: str):
    """Per-language z-score of n_chars: integer (n, Σx, Σx²) moment
    partials (exact — order-free), ONE key-bounded groupby, zero-
    shuffle broadcast scoring pass in the factored float form whose
    expression tree the oracle mirrors (data/rank.py group_zscore)."""
    from .data.rank import group_zscore
    return group_zscore(_read(sf_dir, "documents"), key="lang",
                        col="n_chars")


def q_upsample_epochs(sf_dir: str):
    """Deterministic epoch-based mixture upsampling (Pile/DoReMi
    recipe shape): each doc replicated k + (hash(id) % 8 < p) times
    per its source's rational epoch weight — reproducible,
    repartition- and growth-stable, pure map-side
    (data/sampling.py upsample_epochs)."""
    from .data.sampling import upsample_epochs
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "source"])
    return upsample_epochs(ds, UPSAMPLE_WEIGHTS, key="source")


def q_dupspan_removal(sf_dir: str):
    """ExactSubstr-style duplicate-SPAN removal (Lee et al. 2022):
    every token covered by a corpus-duplicated word 8-gram is removed
    from every document. Pass 1 shuffles only narrow (u64, count)
    gram partials (the distributed suffix-array analogue); pass 2 is
    one zero-shuffle map with a dup-bounded broadcast + diff/cumsum
    coverage expansion (data/spandedup.py)."""
    from .data.spandedup import remove_dup_spans
    docs = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"])
    return remove_dup_spans(docs, n=8)


def q_inverted_index(sf_dir: str):
    """Materialized (term → postings) search index over documents:
    map-side reduction to narrow (doc, term, tf) rows, ONE
    hash-bucketed groupby, fully vectorized per-bucket kernel
    (lexsort + Arrow list binary_join) — text never shuffles
    (data/search.py inverted_index)."""
    from .data.search import inverted_index
    return inverted_index(_read(sf_dir, "documents"), num_buckets=64)


def q_hll_registers(sf_dir: str):
    """HyperLogLog register table over orders.o_custkey (p=12): one
    streaming pass, per-block max-merged registers (max commutes —
    identical under any partitioning), column never shuffles
    (data/sketch.py). The integer registers — the sketch's full
    state — are hash-checked, not just the float estimate."""
    from .data.sketch import hll_registers
    return hll_registers(_read(sf_dir, "orders"), "o_custkey", p=12)


def q_heavy_hitters(sf_dir: str):
    """Count-Min heavy hitters over document tokens: the top-20 terms
    by exact count alongside their CMS estimates from a 4×1024
    integer matrix built from order-free per-block partials — the
    sketch (collisions and all) is bit-for-bit reproduced by the SQL
    oracle via the same md5-column hash (data/sketch.py)."""
    from .data.sketch import cms_heavy_hitters
    return cms_heavy_hitters(_read(sf_dir, "documents"),
                             d=4, w=1024, k=20)


def q_funnel(sf_dir: str):
    """Two-step conversion funnel (view → purchase strictly after):
    order resolved WITHOUT sorting — masked min/max partials per user
    + one small groupby (data/windows.py funnel)."""
    from .data.windows import funnel
    return funnel(_read(sf_dir, "events"),
                  steps=("view", "purchase"))


_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def q_event_pivot(sf_dir: str):
    """Pivot: per-user event counts spread into one column per event
    type — in-batch masked bincount partials (one np.unique per
    batch), then ONE groupby summing the fixed-width count columns;
    the events stream never shuffles unaggregated."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        uids = batch.column("user_id").to_numpy(zero_copy_only=False)
        kinds = np.asarray(batch.column("event_type").to_pylist())
        u, inv = np.unique(uids, return_inverse=True)
        cols = {"user_id": pa.array(u, pa.int64())}
        for t in _PIVOT_TYPES:
            cnt = np.bincount(inv[kinds == t], minlength=u.size)
            cols[f"n_{t}"] = pa.array(cnt.astype(np.int64),
                                      pa.int64())
        return pa.table(cols)
    partial.__name__ = "pivot_partial"

    return _read(sf_dir, "events") \
        .select_columns(["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            *[Sum(f"n_{t}", alias_name=f"n_{t}")
              for t in _PIVOT_TYPES])


def q_revenue_by_nation(sf_dir: str, join: str = "broadcast",
                        num_partitions: int = 8):
    """TPC-H-Q5-style multi-join composition: revenue per nation over
    lineitem ⋈ orders ⋈ customer ⋈ nation. Revenue uses exact
    integer-cents arithmetic (floor(x*100+0.5)) so sums are
    order-independent and the SQL oracle hash-matches bit-for-bit.

    Default path (round 5): the ONE-PASS sentinel shape (sixth in
    the family; data/segments.py finish_sorted_runs owns the
    interior/edge plumbing) — the former fact-fact hash join +
    custkey groupby + customer hash join collapse into ONE sort:
    orders fold to (ok, −1, custkey) sentinel rows, lineitem
    pre-reduces per block to (ok, 0, rev_cents) int64 partials
    (the sentinel's v slot holds the custkey, the fact rows' v slot
    holds revenue — per-run revenue is reduceat minus the sentinel),
    and the zero-shuffle segment kernel maps each run's custkey to
    its nation through the broadcast (custkey → nationkey) dim and
    emits ≤25-row (nationkey, rev) partials per block. A complete
    run without a sentinel is a lineitem orderkey missing from
    orders and raises (family convention); a custkey missing from
    customer drops its run (inner-join semantics, mirroring the
    oracle). Nation names attach driver-side from the 25-row dim.

    ``join="partitioned"``: the IMPLEMENTED escape when the customer
    dim outgrows the driver — fact stream combined in-batch by its
    join key before every shuffle (lineitem → per-orderkey partials,
    join output → per-custkey partials), two partitioned Ray hash
    joins on narrow projections, nation as a broadcast map; output
    identical to the default (parity pytest). ``num_partitions``
    sizes its hash-shuffle actor pools."""
    import ray
    from ray.data.aggregate import Sum

    from .data.segments import finish_sorted_runs
    from .io import collect_table

    def li_narrow(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * 100 + 0.5).astype(np.int64) \
            * (100 - np.floor(disc * 100 + 0.5).astype(np.int64))
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "rev": pa.array(rev, pa.int64())})
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])
    li_narrow.__name__ = "lineitem_rev_partial"

    nat = collect_table(_read(sf_dir, "nation")
                        .select_columns(["n_nationkey", "n_name"]))
    nkeys = nat.column("n_nationkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nnames = np.asarray(nat.column("n_name").to_pylist())
    norder = np.argsort(nkeys)
    nk_sorted, nm_sorted = nkeys[norder], nnames[norder]

    if join == "partitioned":
        # no pre-join repartition: the hash join re-shuffles anyway,
        # and a repartition materializes an extra copy of the whole
        # fact stream (measured +1.5s at sf0.1). Only aggregate
        # OUTPUTS get coalesced below — those can carry empty blocks,
        # which Ray 2.49's join rejects (see exact_dedup
        # partitioned-mode note).
        fact = _read(sf_dir, "lineitem") \
            .select_columns(["l_orderkey", "l_extendedprice",
                             "l_discount"]) \
            .map_batches(li_narrow, batch_format="pyarrow")
        # select_columns (not a lambda select) so projection pushes
        # down into the parquet read — only 2 of 9 orders columns
        # leave storage
        orders = _read(sf_dir, "orders") \
            .select_columns(["o_orderkey", "o_custkey"])
        j1 = fact.join(orders, join_type="inner",
                       num_partitions=num_partitions,
                       on=("l_orderkey",), right_on=("o_orderkey",))

        def cust_partial(b: pa.Table) -> pa.Table:
            t = pa.table({"o_custkey": b.column("o_custkey"),
                          "rev": b.column("rev")})
            g = t.group_by("o_custkey").aggregate([("rev", "sum")])
            return g.rename_columns(["o_custkey", "rev"])
        cust_partial.__name__ = "cust_rev_partial"

        by_cust = j1.map_batches(cust_partial,
                                 batch_format="pyarrow") \
            .groupby("o_custkey") \
            .aggregate(Sum("rev", alias_name="rev")) \
            .repartition(8)
        cust = _read(sf_dir, "customer") \
            .select_columns(["c_custkey", "c_nationkey"])
        j2 = by_cust.join(cust, join_type="inner",
                          num_partitions=max(num_partitions // 2, 2),
                          on=("o_custkey",), right_on=("c_custkey",))

        nref = ray.put((nk_sorted, nm_sorted))

        def to_nation(b: pa.Table) -> pa.Table:
            nks, nms = ray.get(nref)
            nk = b.column("c_nationkey") \
                .to_numpy(zero_copy_only=False)
            # bounds+equality-guarded gather: a nationkey outside the
            # dim table drops the row (inner-join semantics) instead
            # of IndexError-ing or silently attaching the wrong
            # nation
            if nks.size:
                pos = np.minimum(np.searchsorted(nks, nk),
                                 nks.size - 1)
                ok = nks[pos] == nk
            else:
                pos = np.zeros(nk.size, dtype=np.int64)
                ok = np.zeros(nk.size, dtype=bool)
            t = pa.table({
                "n_name": pa.array(nms[pos[ok]], pa.string()),
                "rev": b.column("rev").filter(pa.array(ok))})
            g = t.group_by("n_name").aggregate([("rev", "sum")])
            return g.rename_columns(["n_name", "revenue_i"])
        to_nation.__name__ = "nation_rev_partial"

        return j2.map_batches(to_nation, batch_format="pyarrow") \
            .groupby("n_name").aggregate(Sum("revenue_i",
                                             alias_name="revenue_i"))

    # Broadcast/default path, round 5: the ONE-PASS sentinel shape.
    cust = collect_table(_read(sf_dir, "customer")
                         .select_columns(["c_custkey",
                                          "c_nationkey"]))
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    cn = cust.column("c_nationkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    corder = np.argsort(ck, kind="stable")
    cref = ray.put((ck[corder], cn[corder]))

    def ord_fold(b: pa.Table) -> pa.Table:
        return pa.table({
            "ok": b.column("o_orderkey"),
            "fl": pa.array(np.full(b.num_rows, -1, np.int64)),
            "v": b.column("o_custkey").cast(pa.int64())})
    ord_fold.__name__ = "q5_order_fold"

    def li_fold(b: pa.Table) -> pa.Table:
        g = li_narrow(b)
        return pa.table({
            "ok": g.column("l_orderkey"),
            "fl": pa.array(np.zeros(g.num_rows, np.int64)),
            "v": g.column("rev")})
    li_fold.__name__ = "q5_li_fold"

    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_extendedprice",
                         "l_discount"]) \
        .map_batches(li_fold, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_custkey"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    _empty = pa.table({"nk": pa.array([], pa.int64()),
                       "rev": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        """Per-nation revenue partial over a (ok, fl)-sorted slice
        of COMPLETE runs. Each run's sentinel carries the custkey in
        its v slot; fact rows carry revenue cents, so run revenue is
        reduceat minus the sentinel. A run without a sentinel is an
        FK violation and raises; a custkey missing from the customer
        dim drops its run (inner-join semantics)."""
        ok, fl, v = cols["ok"], cols["fl"], cols["v"]
        if ok.size == 0:
            return _empty
        cks, cns = ray.get(cref)
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        if not bool((fl[rstart] == -1).all()):
            raise ValueError(
                "revenue_by_nation: lineitem orderkey missing from "
                "orders — FK violation")
        ckr = v[rstart]
        rev = np.add.reduceat(v, rstart) - ckr
        if cks.size:
            pos = np.minimum(np.searchsorted(cks, ckr),
                             cks.size - 1)
            found = cks[pos] == ckr
        else:
            found = np.zeros(ckr.size, dtype=bool)
            pos = np.zeros(ckr.size, dtype=np.int64)
        nk = cns[pos[found]]
        uk, inv = np.unique(nk, return_inverse=True)
        sums = np.zeros(uk.size, np.int64)
        np.add.at(sums, inv, rev[found])
        return pa.table({"nk": pa.array(uk, pa.int64()),
                         "rev": pa.array(sums, pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl", "v"], kernel=kernel,
        empty_partial=_empty)
    nk = partial.column("nk").to_numpy(zero_copy_only=False)
    rv = partial.column("rev").to_numpy(zero_copy_only=False)
    uk, inv = np.unique(nk, return_inverse=True)
    sums = np.zeros(uk.size, np.int64)
    np.add.at(sums, inv, rv)
    # attach names from the 25-row dim; unknown nationkeys drop
    # (inner-join semantics, mirroring the partitioned path's guard)
    if nk_sorted.size and uk.size:
        pos = np.minimum(np.searchsorted(nk_sorted, uk),
                         nk_sorted.size - 1)
        found = nk_sorted[pos] == uk
    else:
        pos = np.zeros(uk.size, dtype=np.int64)
        found = np.zeros(uk.size, dtype=bool)
    names = nm_sorted[pos[found]]
    order = np.argsort(names, kind="stable")
    return pa.table({
        "n_name": pa.array(names[order].tolist(), pa.string()),
        "revenue_i": pa.array(sums[found][order], pa.int64())})


def q_para_dedup(sf_dir: str):
    """Paragraph-granular exact dedup (C4/RefinedWeb step): 15-word
    segments fingerprinted (md5 over ' '-joined tokens), first
    corpus-wide occurrence kept (data/dedup.py para_dedup)."""
    from .data.dedup import para_dedup
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return para_dedup(ds, words_per_para=15)


def q_unigram_nll(sf_dir: str):
    """CCNet-style LM quality score: per-doc average negative log
    probability under the corpus unigram distribution — narrow
    (term, count) aggregate broadcast once, map-side scoring
    (data/textstats.py unigram_logprob)."""
    from .data.textstats import unigram_logprob
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return unigram_logprob(ds)


def q_length_band(sf_dir: str):
    """Global percentile trim: keep docs whose n_chars lies in the
    exact [p10, p90] band — a quantiles histogram pass broadcast into
    a zero-shuffle map filter (data/rank.py quantile_band_filter)."""
    from .data.rank import quantile_band_filter
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "n_chars"])
    return quantile_band_filter(ds, "n_chars", 10, 90)


def q_chunk_docs(sf_dir: str):
    """Sliding-window chunking: 200-char windows at stride 150 —
    zero-shuffle map-side, one Arrow slice kernel per chunk ordinal
    (data/chunking.py)."""
    from .data.chunking import chunk_docs
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return chunk_docs(ds, window=200, stride=150)


def q_window_hop(sf_dir: str):
    """Hopping-window aggregate: 2h windows every 1h over events —
    K-fold replication collapsed by an in-batch partial before the one
    small groupby (data/windows.py). Values fold to integer cents
    BEFORE the aggregate: overlapping hop windows can contain the
    same event multiset, so two (event_type, n_events)-tied rows with
    mathematically-equal float sums would let ULP noise decide their
    checker sort order (the user_entropy fragility class, flagged by
    the float audit) — an int64 sum cannot wobble."""
    from .data.windows import hopping_window_agg

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "ts": b.column("ts"),
            "event_type": b.column("event_type"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    to_cents.__name__ = "window_hop_cents"

    ds = _read(sf_dir, "events") \
        .select_columns(["ts", "event_type", "value"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    agg = hopping_window_agg(ds, window_s=7200, hop_s=3600,
                             val_col="cents")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["window_start", "event_type", "n_events", "sum_cents"])
    rename.__name__ = "window_hop_rename"
    return agg.map_batches(rename, batch_format="pyarrow")


def q_tfidf_topk(sf_dir: str):
    """Per-doc top-5 TF-IDF terms: narrow (term, df) pass + broadcast
    idf map + map-side lexsort top-k — text never shuffles
    (data/search.py)."""
    from .data.search import tfidf_topk
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return tfidf_topk(ds, k=5)


def q_mixture_sample(sf_dir: str):
    """Temperature-weighted (α=0.5) source mixture sample, 500 total:
    per-source quotas ∝ count^α, smallest-hash winners via the
    grouped-topk partial prune (data/sampling.py)."""
    from .data.sampling import mixture_sample
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "source"])
    return mixture_sample(ds, key="source", alpha=0.5, total=500)


class ReaderPipelineActor:
    """Composite micro-workload mirroring the reference profiler's
    manabiReaderPipeline (Tools/SwiftSoupProfile/main.swift:532-562):
    parse a many-line body fragment, select the candidate lines
    (``div.line, p.line``), per line re-serialize the child nodes
    (TextNode wholeText / Element outerHtml) into candidate HTML,
    re-parse the candidate as a fragment, then take its
    non-normalized text, its ``ruby, a, span`` match count, its
    re-serialized html length — and additionally push the fragment
    through Cleaner(basic) so the selector/cleaner interaction path
    is covered in the same kernel.

    Line construction is a closed-form function of the doc's tokens
    (3 per line, even lines span+ruby, odd lines a+em+span), so every
    output column is SQL-reproducible."""

    def __init__(self) -> None:
        from .cleaner import Cleaner, Whitelist
        from .selector import parse_query
        parse_query("div.line, p.line")   # warm selector cache
        parse_query("ruby, a, span")
        self.cleaner = Cleaner(Whitelist.basic())

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dom import TextNode
        from .parser import parse_body_fragment
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_lines, o_match, o_text, o_hlen, o_clean = [], [], [], [], []
        for text in texts:
            toks = (text or "").split()
            k = len(toks) // 3
            parts = []
            for i in range(k):
                a, b, c = toks[3 * i:3 * i + 3]
                if i % 2 == 0:
                    parts.append(
                        f'<div class="line"><span>{a}</span> {b} '
                        f'<ruby>{c}<rt>r{i}</rt></ruby></div>')
                else:
                    parts.append(
                        f'<p class="line"><a href="#l{i}">{a}</a> '
                        f'<em>{b}</em> <span>{c}</span></p>')
            doc = parse_body_fragment("".join(parts), "")
            doc.output_settings.pretty_print = False
            lines = doc.select("div.line, p.line")
            texts_l, cleans_l, n_match, hlen = [], [], 0, 0
            for line in lines:
                cand = "".join(
                    n.get_whole_text() if isinstance(n, TextNode)
                    else n.outer_html() for n in line.child_nodes)
                frag = parse_body_fragment(cand, "")
                frag.output_settings.pretty_print = False
                body = frag.body()
                texts_l.append(body.text(trim_and_normalise=False))
                n_match += len(body.select("ruby, a, span"))
                hlen += len(body.html())
                cl = self.cleaner.clean(frag)
                cl.output_settings.pretty_print = False
                cleans_l.append(cl.body().html())
            o_lines.append(len(lines))
            o_match.append(n_match)
            o_text.append("\n".join(texts_l))
            o_hlen.append(hlen)
            o_clean.append("\n".join(cleans_l))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_lines": pa.array(o_lines, pa.int64()),
            "n_matches": pa.array(o_match, pa.int64()),
            "reader_text": pa.array(o_text, pa.string()),
            "html_len": pa.array(o_hlen, pa.int64()),
            "clean_html": pa.array(o_clean, pa.string()),
        })


class HostileExtractActor:
    """Adversarial-HTML pipeline coverage (mirrors the reference's
    profile/torture suites — Tests/SwiftSoupTests/
    AttributeStormProfileTest.swift:1, StackOverflow393Test.swift:1):
    every document becomes a hostile page combining deep unclosed-div
    nesting (depth 50–249), an attribute storm (10–99 attrs + a
    duplicate), misnested formatting that triggers the adoption
    agency, script soup containing a fake close tag, a comment and a
    CDATA section. The page's *structure* is mangled but its text
    invariants are closed-form — text content survives structural
    hostility deterministically — so the oracle is exact SQL:
    body_text = norm(text) + ' stormwxyzq notexttail',
    n_elements = depth + 10, max_depth = depth + 5, n_attrs = m."""

    def __init__(self) -> None:
        from .selector import parse_query
        parse_query("*")
        parse_query("p")

    @staticmethod
    def build(doc_id: int, text: str) -> str:
        txt = (text or "").strip() or "empty"
        depth = 50 + (doc_id * 7) % 200
        m = 10 + doc_id % 90
        attrs = " ".join(f'a{j}="{j}"' for j in range(m)) + ' a0="dup"'
        return (
            "<div>" * depth + txt + " "
            + f"<p {attrs}>storm</p>"
            + "<b>w<b>x<i>y</b>z</i>q "
            + "<script>if(1<2){bad(\"</div>\")}</script>"
            + "<!-- <div>comment</div> --><![CDATA[notext]]>"
            + "tail")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .parser import parse
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_text, o_nel, o_depth, o_attrs = [], [], [], []
        for doc_id, text in zip(doc_ids, texts):
            doc = parse(self.build(doc_id, text))
            o_text.append(doc.body().text())
            els = doc.select("*")
            o_nel.append(len(els))
            maxd = 0
            for el in els:
                d, n = 0, el
                while n.parent() is not None:
                    d += 1
                    n = n.parent()
                if d > maxd:
                    maxd = d
            o_depth.append(maxd)
            o_attrs.append(len(doc.select("p")[0].attributes))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "body_text": pa.array(o_text, pa.string()),
            "n_elements": pa.array(o_nel, pa.int64()),
            "max_depth": pa.array(o_depth, pa.int64()),
            "n_attrs": pa.array(o_attrs, pa.int64()),
        })


def q_extract_hostile(sf_dir: str):
    """Hostile-corpus pipeline: deep nesting + attribute storms +
    misnested formatting + script/CDATA soup per document, parsed and
    text/structure-audited in one actor-pool kernel."""
    return _read(sf_dir, "documents").map_batches(
        _task(HostileExtractActor), batch_format="pyarrow")


def q_reader_pipeline(sf_dir: str):
    """Composite parse → select → re-parse → clean → text workload
    (the reference's manabiReaderPipeline profile) as one actor-pool
    kernel over the documents table."""
    return _read(sf_dir, "documents").map_batches(
        _task(ReaderPipelineActor), batch_format="pyarrow")


_NTILE_N = 4


def q_order_quartile(sf_dir: str, join: str = "broadcast",
                     num_partitions: int = 32):
    """NTILE(4) OVER (PARTITION BY custkey ORDER BY date, orderkey):
    the bucketing window function completing the window family
    (cumsum / rank / dense_rank / row_number / lag / rolling / ntile).
    Zero new shuffle machinery: row_number comes from windowed_cumsum
    over a ones column (the order_seq shape — ONE global sort,
    broadcast-base edge fixup, hot-key safe); per-key totals reduce
    map-side to (key, n) partials + ONE key-bounded groupby broadcast
    as sorted arrays; the tile assignment is a zero-shuffle
    pure-integer map mirroring SQL NTILE's
    first-(count%n)-buckets-get-the-remainder rule, so the oracle
    hash is float-free by construction.

    ``join="partitioned"``: the IMPLEMENTED escape for customer key
    sets beyond driver memory — the (key, n) count table stays a
    Dataset and attaches to the sequenced rows via ONE
    custkey-partitioned hash join; the tile map is unchanged.
    Row-identical to broadcast (parity pytest)."""
    import ray
    from ray.data.aggregate import Sum

    from .data.windows import windowed_cumsum
    from .io import collect_table

    def ones(b: pa.Table) -> pa.Table:
        return b.append_column(
            "one", pa.array(np.ones(b.num_rows, np.int64)))
    ones.__name__ = "append_ones"

    seq = windowed_cumsum(
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_orderdate", "o_orderkey"])
        .map_batches(ones, batch_format="pyarrow"),
        key_col="o_custkey",
        order_cols=["o_orderdate", "o_orderkey"],
        val_col="one", out_col="seq")

    def cnt_partial(b: pa.Table) -> pa.Table:
        k, n = np.unique(
            b.column("o_custkey").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "n": pa.array(n, pa.int64())})
    cnt_partial.__name__ = "key_count_partial"

    cnt_agg = _read(sf_dir, "orders").select_columns(["o_custkey"]) \
        .map_batches(cnt_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def _ntile(sq: np.ndarray, c: np.ndarray) -> np.ndarray:
        # SQL NTILE remainder rule: first (c % N) tiles get q+1 rows
        q, r = c // _NTILE_N, c % _NTILE_N
        hi = r * (q + 1)
        first = sq <= hi
        return (np.where(first, (sq - 1) // (q + 1),
                         r + (sq - 1 - hi) // np.maximum(q, 1)) + 1) \
            .astype(np.int64)

    if join == "partitioned":
        cnt_ds = cnt_agg.repartition(num_partitions).materialize()
        if cnt_ds.count() == 0:
            return ray.data.from_arrow(pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64())}))

        def tile_joined(b: pa.Table) -> pa.Table:
            sq = b.column("seq").to_numpy(zero_copy_only=False)
            c = b.column("n").to_numpy(zero_copy_only=False)
            return pa.table({"o_orderkey": b.column("o_orderkey"),
                             "o_custkey": b.column("o_custkey"),
                             "tile": pa.array(_ntile(sq, c))})
        tile_joined.__name__ = "ntile_assign_joined"

        return seq.select_columns(
            ["o_custkey", "o_orderkey", "seq"]) \
            .repartition(num_partitions).join(
                cnt_ds, join_type="inner", num_partitions=num_partitions,
                on=("o_custkey",), right_on=("k",)) \
            .map_batches(tile_joined, batch_format="pyarrow")

    cnt = collect_table(cnt_agg)
    ks = cnt.column("k").to_numpy(zero_copy_only=False)
    ns = cnt.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(ks, kind="stable")
    handle = ray.put((ks[order], ns[order]))

    def tile(b: pa.Table) -> pa.Table:
        ks_s, ns_s = ray.get(handle)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        sq = b.column("seq").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks_s, ck)
        if pos.size and (pos.max() >= ks_s.size
                         or not np.array_equal(ks_s[pos], ck)):
            raise ValueError("order key missing from count table")
        c = ns_s[pos]
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey"),
                         "tile": pa.array(_ntile(sq, c))})
    tile.__name__ = "ntile_assign"

    return seq.map_batches(tile, batch_format="pyarrow")


def q_first_order_value(sf_dir: str, join: str = "broadcast",
                        num_partitions: int = 32):
    """FIRST_VALUE — per-customer totalprice of the EARLIEST order
    (ties by orderkey): grouped argmin ROW selection without a sort.
    (orderdate-days, orderkey) pack into one int64 (contract: days <
    2^22, orderkey < 2^40 — fails loudly), so per-block Arrow group_by
    MIN partials + ONE key-bounded groupby pick each customer's
    winning orderkey; the winner set (≤ |customers| int64s) broadcasts
    and a second zero-shuffle membership pass emits the winning rows'
    price as integer cents. Orders never shuffle. Same packed-argmax
    trick as favorite_event, pointed at row selection instead of mode.

    ``join="partitioned"``: the IMPLEMENTED escape for customer sets
    beyond driver memory — the winner set stays a Dataset (unpacked
    to orderkeys map-side) and selects the winning rows via ONE
    orderkey-partitioned semi hash join. Row-identical to broadcast
    (parity pytest)."""
    import ray
    from ray.data.aggregate import Min

    from .io import collect_table

    _OK_BITS = 40

    def packed_partial(b: pa.Table) -> pa.Table:
        days = b.column("o_orderdate").cast(pa.date32()) \
            .cast(pa.int32()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        if days.size and (days.min() < 0 or days.max() >= (1 << 22)
                          or ok.min() < 0 or ok.max() >= (1 << _OK_BITS)):
            raise ValueError("first_order_value pack contract: "
                             "0 <= days < 2^22, 0 <= orderkey < 2^40")
        p = (days << _OK_BITS) | ok
        t = pa.table({"ck": b.column("o_custkey"),
                      "p": pa.array(p, pa.int64())})
        g = t.group_by("ck").aggregate([("p", "min")])
        return g.rename_columns(["ck", "p"])
    packed_partial.__name__ = "argmin_pack_partial"

    win_agg = _read(sf_dir, "orders") \
        .select_columns(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .map_batches(packed_partial, batch_format="pyarrow") \
        .groupby("ck").aggregate(Min("p", alias_name="p"))

    def cents_out(kept: pa.Table) -> pa.Table:
        tp = kept.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
        return pa.table({"o_custkey": kept.column("o_custkey"),
                         "first_cents": pa.array(cents, pa.int64())})

    if join == "partitioned":
        def unpack(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "p" not in b.schema.names:
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64())})
            p = b.column("p").to_numpy(zero_copy_only=False)
            return pa.table({"o_orderkey": pa.array(
                p & ((1 << _OK_BITS) - 1), pa.int64())})
        unpack.__name__ = "unpack_winner_orderkeys"

        win_ds = win_agg.map_batches(unpack, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()
        if win_ds.count() == 0:
            return ray.data.from_arrow(pa.table({
                "o_custkey": pa.array([], pa.int64()),
                "first_cents": pa.array([], pa.int64())}))
        return _read(sf_dir, "orders") \
            .select_columns(["o_orderkey", "o_custkey",
                             "o_totalprice"]) \
            .repartition(num_partitions).join(
                win_ds, join_type="inner", num_partitions=num_partitions,
                on=("o_orderkey",)) \
            .map_batches(cents_out, batch_format="pyarrow")

    win = collect_table(win_agg)
    winners = np.sort(
        win.column("p").to_numpy(zero_copy_only=False)
        & ((1 << _OK_BITS) - 1)) if win.num_rows \
        else np.empty(0, np.int64)
    handle = ray.put(winners)

    def pick(b: pa.Table) -> pa.Table:
        ws = ray.get(handle)
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        if ws.size:
            pos = np.minimum(np.searchsorted(ws, ok), ws.size - 1)
            keep = ws[pos] == ok
        else:
            keep = np.zeros(ok.size, dtype=bool)
        kept = b.filter(pa.array(keep))
        tp = kept.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
        return pa.table({"o_custkey": kept.column("o_custkey"),
                         "first_cents": pa.array(cents, pa.int64())})
    pick.__name__ = "pick_winning_rows"

    return _read(sf_dir, "orders") \
        .select_columns(["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(pick, batch_format="pyarrow")


def q_props_k_stats(sf_dir: str):
    """JSON sidecar field extraction: pull the integer `k` out of
    the events props JSON with ONE vectorized RE2 extraction
    (pc.extract_regex — no per-row json.loads), then reduce map-side
    to (event_type, n, sum_k) partials into ONE groupby bounded by
    |event types|. Contract: every row matches (the sidecar schema
    guarantees it); a non-matching row raises rather than silently
    dropping from the sum."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ext = pc.extract_regex(b.column("props"),
                               r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(ext, "k")
        if k.null_count:
            raise ValueError("props row without an integer k field")
        kv = k.cast(pa.int64())
        t = pa.table({"event_type": b.column("event_type"),
                      "k": kv})
        g = t.group_by("event_type").aggregate(
            [("k", "sum"), ("k", "count")])
        return g.rename_columns(["event_type", "sum_k", "n_events"])
    partial.__name__ = "props_extract_partial"

    return _read(sf_dir, "events") \
        .select_columns(["event_type", "props"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Sum("n_events", alias_name="n_events"))


_REDACT_PAT = r"\b(spark|hash|join)\b"


def q_redact_terms(sf_dir: str):
    """Blocklist term redaction — the PII/toxic-term scrubbing pass
    every training-data pipeline runs before packing: every
    whole-word occurrence of a blocklisted term is replaced with
    [X], plus a per-doc redaction count. ONE vectorized RE2
    replace + count per block (Arrow C++ kernels), zero shuffle,
    zero per-row Python; both engines run the same RE2 pattern so
    \\b semantics agree exactly."""
    def red(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        n = pc.count_substring_regex(txt, _REDACT_PAT).cast(pa.int64())
        out = pc.replace_substring_regex(txt, _REDACT_PAT,
                                         replacement="[X]")
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": out, "n_redacted": n})
    red.__name__ = "redact_terms"

    return _read(sf_dir, "documents") \
        .select_columns(["doc_id", "text"]) \
        .map_batches(red, batch_format="pyarrow")


def q_lexical_diversity(sf_dir: str):
    """Per-doc lexical diversity — (n_tokens, n_distinct), the
    type-token-ratio quality signal. Zero shuffle: per block the
    token stream is whitespace-split once (shared guarded kernel),
    dictionary-encoded once, and distinct-per-doc counted with a
    single np.unique over packed (row<<32 | code) int64 — no per-doc
    Python. Output stays an integer pair so the hash compare is
    float-free (ratio = n_distinct / n_tokens is the consumer's one
    division). Contract: block vocab < 2^32, block rows < 2^31
    (any sane block size)."""
    from .data.textstats import _ws_tokens

    def div(b: pa.Table) -> pa.Table:
        arr = b.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs, flat = _ws_tokens(arr)
        nonempty = pc.not_equal(flat, "").to_numpy(
            zero_copy_only=False)
        cs = np.concatenate([np.zeros(1, np.int64),
                             np.cumsum(nonempty.astype(np.int64))])
        n_tokens = cs[offs[1:]] - cs[offs[:-1]]
        codes = pc.dictionary_encode(flat).combine_chunks() \
            if isinstance(flat, pa.ChunkedArray) \
            else flat.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nvocab = len(codes.dictionary)
        if nvocab >= (1 << 32) or b.num_rows >= (1 << 31):
            raise ValueError("lexical_diversity pack contract")
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(offs))
        pk = np.unique((row[nonempty] << 32) | idx[nonempty])
        n_distinct = np.bincount(pk >> 32, minlength=b.num_rows) \
            .astype(np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64())})
    div.__name__ = "lexical_diversity"

    return _read(sf_dir, "documents") \
        .select_columns(["doc_id", "text"]) \
        .map_batches(div, batch_format="pyarrow")


_BIG_ORDER_QTY = 150


def q_big_orders(sf_dir: str, join: str = "broadcast",
                 num_partitions: int = 32):
    """TPC-H Q18 shape — large-volume orders: the HAVING-subquery
    semi-join composite. Round 5 (default path): the ONE-PASS sentinel
    shape — the wide (orderkey) groupby + winner broadcast + second
    orders scan collapse into ONE sort: orders fold to
    (ok, −1, 0, custkey, price) sentinel rows, lineitem pre-reduces
    per block to (ok, 0, qty) int64 partials (shrunk by the
    lineitems-per-order factor before any movement — lineitem rows
    never move), and a zero-shuffle segment kernel sums complete runs
    and applies the HAVING cut in-block, so only HAVING-bounded winner
    rows plus ≤2 edge runs per block reach the driver, where customer
    names attach from the broadcast-class dim. A complete run without
    a sentinel is a lineitem orderkey missing from orders and raises.
    Quantities are integral by TPC-H construction — folded to int64
    map-side so every partial is exact and the hash float-free.

    ``join="partitioned"``: the IMPLEMENTED escape when the
    post-HAVING winner set or the customer dim outgrows the driver —
    the wide groupby + HAVING run in-engine, winners attach via ONE
    orderkey-partitioned hash join, names via ONE custkey-partitioned
    hash join; output identical to the default (parity pytest)."""
    import ray
    from ray.data.aggregate import Sum

    from .data.segments import finish_sorted_runs
    from .io import collect_table

    def qty_partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        t = pa.table({"k": b.column("l_orderkey"),
                      "q": pa.array(np.floor(q + 0.5).astype(np.int64))})
        return t.group_by("k").aggregate([("q", "sum")]) \
            .rename_columns(["k", "q"])
    qty_partial.__name__ = "order_qty_partial"

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("q"), _BIG_ORDER_QTY))
    having.__name__ = "having_qty"

    tq_agg = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_quantity"]) \
        .map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("q", alias_name="q")) \
        .map_batches(having, batch_format="pyarrow")

    if join == "partitioned":
        win_ds = tq_agg.repartition(num_partitions).materialize()
        if win_ds.count() == 0:
            return ray.data.from_arrow(pa.table({
                "c_name": pa.array([], pa.string()),
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "price_cents": pa.array([], pa.int64()),
                "total_qty": pa.array([], pa.int64())}))

        def shape(b: pa.Table) -> pa.Table:
            tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table({
                "c_name": b.column("c_name"),
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "price_cents": pa.array(
                    np.floor(tp * 100.0 + 0.5).astype(np.int64)),
                "total_qty": b.column("q")})
        shape.__name__ = "big_order_shape"

        return _read(sf_dir, "orders") \
            .select_columns(["o_orderkey", "o_custkey",
                             "o_totalprice"]) \
            .repartition(num_partitions).join(
                win_ds, join_type="inner", num_partitions=num_partitions,
                on=("o_orderkey",), right_on=("k",)) \
            .join(_read(sf_dir, "customer")
                  .select_columns(["c_custkey", "c_name"])
                  .repartition(num_partitions).materialize(),
                  join_type="inner", num_partitions=num_partitions,
                  on=("o_custkey",), right_on=("c_custkey",)) \
            .map_batches(shape, batch_format="pyarrow")

    # Broadcast/default path, round 5: the ONE-PASS sentinel shape —
    # the former wide (ok) groupby + winner broadcast + SECOND orders
    # scan collapse into ONE sort. Orders fold to (ok, −1, 0, ck, pc)
    # sentinel rows (qty 0 keeps per-run totals a plain reduceat);
    # lineitem pre-reduces per block to (ok, 0, qty, 0, 0) integer
    # partials; a zero-shuffle segment kernel sums complete runs,
    # applies the HAVING cut in-block (winners per block are
    # HAVING-bounded), and the ≤2 edge runs per block finish
    # driver-side through the same kernel. A complete run without a
    # sentinel is a lineitem orderkey missing from orders — raises.
    # Customer names attach driver-side to the winner set from the
    # broadcast-class dim (the partitioned branch above is the hatch
    # when winners or the dim outgrow the driver).
    cust = collect_table(_read(sf_dir, "customer")
                         .select_columns(["c_custkey", "c_name"]))
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    cn = cust.column("c_name").to_pylist()
    corder = np.argsort(ck, kind="stable")
    cks = ck[corder]
    cns = np.asarray(cn, dtype=object)[corder]

    def ord_fold(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "ok": b.column("o_orderkey"),
            "fl": pa.array(np.full(b.num_rows, -1, np.int64)),
            "q": pa.array(np.zeros(b.num_rows, np.int64)),
            "ck": b.column("o_custkey"),
            "pc": pa.array(np.floor(tp * 100.0 + 0.5)
                           .astype(np.int64))})
    ord_fold.__name__ = "q18_order_fold"

    def li_fold(b: pa.Table) -> pa.Table:
        g = qty_partial(b)
        n = g.num_rows
        return pa.table({
            "ok": g.column("k"),
            "fl": pa.array(np.zeros(n, np.int64)),
            "q": g.column("q"),
            "ck": pa.array(np.zeros(n, np.int64)),
            "pc": pa.array(np.zeros(n, np.int64))})
    li_fold.__name__ = "q18_li_fold"

    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_quantity"]) \
        .map_batches(li_fold, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_custkey",
                                "o_totalprice"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    _empty = pa.table({"ok": pa.array([], pa.int64()),
                       "ck": pa.array([], pa.int64()),
                       "pc": pa.array([], pa.int64()),
                       "tq": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        """(key, custkey, price, total) rows of runs whose qty total
        clears the HAVING cut, over a (ok, fl)-sorted slice of
        COMPLETE runs; a run without a sentinel raises."""
        ok, fl = cols["ok"], cols["fl"]
        q, ckv, pcv = cols["q"], cols["ck"], cols["pc"]
        if ok.size == 0:
            return _empty
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        if not bool((fl[rstart] == -1).all()):
            raise ValueError(
                "big_orders: lineitem orderkey missing from orders "
                "— FK violation")
        total = np.add.reduceat(q, rstart)       # sentinels add 0
        keep = total > _BIG_ORDER_QTY
        s = rstart[keep]
        return pa.table({"ok": pa.array(ok[s], pa.int64()),
                         "ck": pa.array(ckv[s], pa.int64()),
                         "pc": pa.array(pcv[s], pa.int64()),
                         "tq": pa.array(total[keep], pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl", "q", "ck", "pc"],
        kernel=kernel, empty_partial=_empty)
    wok = partial.column("ok").to_numpy(zero_copy_only=False)
    wck = partial.column("ck").to_numpy(zero_copy_only=False)
    wpc = partial.column("pc").to_numpy(zero_copy_only=False)
    wtq = partial.column("tq").to_numpy(zero_copy_only=False)
    cpos = np.searchsorted(cks, wck) if wck.size \
        else np.empty(0, np.int64)
    if wck.size and (cpos.max() >= cks.size
                     or not np.array_equal(cks[cpos], wck)):
        raise ValueError("order custkey missing from customer dim")
    return pa.table({
        "c_name": pa.array(cns[cpos].tolist() if wck.size else [],
                           pa.string()),
        "o_custkey": pa.array(wck, pa.int64()),
        "o_orderkey": pa.array(wok, pa.int64()),
        "price_cents": pa.array(wpc, pa.int64()),
        "total_qty": pa.array(wtq, pa.int64())})


_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = np.datetime64("1998-06-01")


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — top-k over a WIDE aggregate: unshipped revenue
    per order for one market segment's orders placed before a cutoff,
    top 10 by revenue. The SEGMENT custkey set is a bounded fraction
    of the customer dim, so it broadcasts (sorted-array membership;
    the partitioned semi-join hatch applies when a segment outgrows
    the driver). Round 5: the former groupby + partitioned hash join
    collapse into the ONE-PASS sentinel shape — window+segment orders
    fold to (ok, −1, 0, o_day) sentinel rows (rev 0, so per-run
    revenue is a plain reduceat over ALL rows), lineitem pre-reduces
    per block to (ok, 0, rev, "") integer partials, the union sorts
    ONCE on (ok, fl), and a zero-shuffle segment kernel sums complete
    runs and emits each block's top 10 (top-k of a union is the top-k
    of per-block top-ks — O(blocks·10) candidates collect); ≤2 edge
    runs per block finish driver-side through the same kernel.
    Sentinel-less runs are orders outside the segment/window and skip
    silently; sentinel-only runs have no unshipped lineitems and drop,
    matching the inner join. Ties break by orderkey in both engines,
    so the cut is deterministic. data/segments.py finish_sorted_runs
    owns the interior/edge plumbing."""
    import ray

    from .data.segments import finish_sorted_runs
    from .io import collect_table

    cust = collect_table(
        _read(sf_dir, "customer")
        .select_columns(["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda b: b.filter(
                pc.equal(b.column("c_mktsegment"), _Q3_SEGMENT))
            .select(["c_custkey"]),
            batch_format="pyarrow"))
    seg_keys = np.sort(
        cust.column("c_custkey").to_numpy(zero_copy_only=False))
    seg_handle = ray.put(seg_keys)

    cutoff_us = _Q3_CUTOFF.astype("datetime64[us]")

    def ord_fold(b: pa.Table) -> pa.Table:
        ks = ray.get(seg_handle)
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        mask = od < cutoff_us
        if ks.size:
            pos = np.minimum(np.searchsorted(ks, ck), ks.size - 1)
            mask &= ks[pos] == ck
        else:
            mask &= False
        kept = b.filter(pa.array(mask))
        return pa.table({
            "ok": kept.column("o_orderkey"),
            "fl": pa.array(np.full(kept.num_rows, -1, np.int64)),
            "rev_i": pa.array(np.zeros(kept.num_rows, np.int64)),
            "o_day": pc.strftime(kept.column("o_orderdate"),
                                 format="%Y-%m-%d")})
    ord_fold.__name__ = "q3_order_fold"

    def rev_partial(b: pa.Table) -> pa.Table:
        sd = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        kept = b.filter(pa.array(sd > cutoff_us))
        p = kept.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        d = kept.column("l_discount").to_numpy(zero_copy_only=False)
        rev = (np.floor(p * 100.0 + 0.5).astype(np.int64)
               * (100 - np.floor(d * 100.0 + 0.5).astype(np.int64)))
        t = pa.table({"ok": kept.column("l_orderkey"),
                      "rev_i": pa.array(rev, pa.int64())})
        g = t.group_by("ok").aggregate([("rev_i", "sum")]) \
            .rename_columns(["ok", "rev_i"])
        return pa.table({
            "ok": g.column("ok"),
            "fl": pa.array(np.zeros(g.num_rows, np.int64)),
            "rev_i": g.column("rev_i"),
            "o_day": pa.array([""] * g.num_rows, pa.string())})
    rev_partial.__name__ = "q3_rev_partial"

    # ONE-PASS sentinel shape (round 5): the former groupby + hash
    # join collapse into ONE sort on (ok, fl) — window+segment orders
    # lead their runs as (ok, −1, 0, o_day) sentinels (their rev_i=0
    # lets per-run revenue be a plain reduceat over ALL rows),
    # lineitem pre-reduces per block to (ok, 0, rev, "") partials, a
    # zero-shuffle segment kernel sums complete runs and emits each
    # block's top 10 (top-k of a union = top-k of per-block top-ks),
    # and ≤2 edge runs per block finish driver-side through the same
    # kernel. Sentinel-less runs are orders outside the segment or
    # window and skip silently (Q4 rule, not Q21's FK raise);
    # sentinel-only runs are orders with no unshipped lineitems and
    # drop, matching the inner join.
    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_extendedprice",
                         "l_discount", "l_shipdate"]) \
        .map_batches(rev_partial, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_custkey",
                                "o_orderdate"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    _empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                       "rev_i": pa.array([], pa.int64()),
                       "o_day": pa.array([], pa.string())})

    def kernel(cols) -> pa.Table:
        """Top-10 (key, rev, day) over a (ok, fl)-sorted slice of
        COMPLETE runs; runs without a sentinel or without lineitem
        rows contribute nothing."""
        ok, fl = cols["ok"], cols["fl"]
        rv, od = cols["rev_i"], cols["o_day"]
        if ok.size == 0:
            return _empty
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        has_sent = fl[rstart] == -1
        rev = np.add.reduceat(rv, rstart)        # sentinels add 0
        nrows = np.diff(np.r_[rstart, ok.size])
        keep = has_sent & (nrows - has_sent.astype(np.int64) > 0)
        kk, rr = ok[rstart[keep]], rev[keep]
        dd = od[rstart[keep]]
        order = np.lexsort((kk, -rr))[:10]
        return pa.table({
            "l_orderkey": pa.array(kk[order], pa.int64()),
            "rev_i": pa.array(rr[order], pa.int64()),
            "o_day": pa.array(dd[order].tolist(), pa.string())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl", "rev_i"], str_cols=["o_day"],
        kernel=kernel, empty_partial=_empty)
    k = partial.column("l_orderkey").to_numpy(zero_copy_only=False)
    r = partial.column("rev_i").to_numpy(zero_copy_only=False)
    d = np.asarray(partial.column("o_day").to_pylist(), dtype=object)
    order = np.lexsort((k, -r))[:10]
    return pa.table({
        "l_orderkey": pa.array(k[order], pa.int64()),
        "rev_i": pa.array(r[order], pa.int64()),
        "o_day": pa.array(d[order].tolist(), pa.string())})


def q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT / melt — wide metric columns to narrow (row, metric,
    value) triples, the long-format reshape feeding any generic
    per-metric aggregate or plotting layer. Pure zero-shuffle
    map-side expansion: per block, three constant-metric tables
    concat (Arrow take-free column reuse), each metric folded to its
    exact integer unit (qty, price cents, discount basis points) so
    the triple stream is type-uniform int64 and the hash float-free."""
    def melt(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey")
        ln = b.column("l_linenumber").cast(pa.int64())
        qty = np.floor(b.column("l_quantity")
                       .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        price = np.floor(b.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        disc = np.floor(b.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 10000.0
                        + 0.5).astype(np.int64)
        parts = []
        for name, vals in (("qty", qty), ("price_cents", price),
                           ("disc_bp", disc)):
            parts.append(pa.table({
                "l_orderkey": ok, "l_linenumber": ln,
                "metric": pa.array([name] * b.num_rows, pa.string()),
                "value": pa.array(vals, pa.int64())}))
        return pa.concat_tables(parts)
    melt.__name__ = "unpivot_melt"

    return _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_linenumber", "l_quantity",
                         "l_extendedprice", "l_discount"]) \
        .map_batches(melt, batch_format="pyarrow")


def q_jsonl_roundtrip(sf_dir: str):
    """JSON-lines sink + source round trip: events reduce to
    (event_type, value_cents) — integer BEFORE serialization so the
    float never crosses a text format — write_json to a partitioned
    /tmp tree, read_json back, ONE bounded groupby. Validates the
    JSONL I/O path end to end the way partitioned_write does for
    hive-parquet; the oracle is the same aggregate on the parquet
    input."""
    import os
    import shutil

    import ray
    from ray.data.aggregate import Count, Sum

    out = os.path.join("/tmp/soupflow_jsonl",
                       os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out, ignore_errors=True)

    def narrow(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "value_cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64))})
    narrow.__name__ = "jsonl_narrow"

    _read(sf_dir, "events").select_columns(["event_type", "value"]) \
        .map_batches(narrow, batch_format="pyarrow").write_json(out)

    def fix(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type").cast(pa.string()),
            "value_cents": b.column("value_cents").cast(pa.int64())})
    fix.__name__ = "jsonl_schema_fix"

    return ray.data.read_json(out) \
        .map_batches(fix, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("value_cents", alias_name="sum_cents"),
            Count(alias_name="n"))


def q_csv_roundtrip(sf_dir: str):
    """CSV sink + source round trip — the remaining cell of the I/O
    matrix (lance/parquet: read_corpus + partitioned_write; JSONL:
    jsonl_roundtrip): orders fold to (priority, price_cents) integer
    rows BEFORE serialization so no float crosses the text format,
    write_csv to a partitioned /tmp tree, read_csv back, ONE bounded
    groupby. Oracle = the same aggregate on the parquet input."""
    import os
    import shutil

    import ray
    from ray.data.aggregate import Count, Sum

    out = os.path.join("/tmp/soupflow_csv",
                       os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out, ignore_errors=True)

    def narrow(b: pa.Table) -> pa.Table:
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "priority": b.column("o_orderpriority"),
            "price_cents": pa.array(
                np.floor(p * 100.0 + 0.5).astype(np.int64))})
    narrow.__name__ = "csv_narrow"

    _read(sf_dir, "orders") \
        .select_columns(["o_orderpriority", "o_totalprice"]) \
        .map_batches(narrow, batch_format="pyarrow").write_csv(out)

    def fix(b: pa.Table) -> pa.Table:
        return pa.table({
            "priority": b.column("priority").cast(pa.string()),
            "price_cents": b.column("price_cents").cast(pa.int64())})
    fix.__name__ = "csv_schema_fix"

    return ray.data.read_csv(out) \
        .map_batches(fix, batch_format="pyarrow") \
        .groupby("priority").aggregate(
            Sum("price_cents", alias_name="sum_cents"),
            Count(alias_name="n"))


def q_compact_roundtrip(sf_dir: str):
    """Small-files COMPACTION — the lakehouse OPTIMIZE maintenance
    pass: a fragmented output tree (24 deliberately tiny parquet
    files) is rewritten into few right-sized files, with the
    invariants a production compactor must hold checked loudly —
    file count strictly reduced, row count preserved (parquet FOOTER
    sums on both trees, the O(files) metadata read partitioned_write
    taught us; never a data re-scan just for counts). Content is then
    proven identical the strong way: the compacted tree feeds ONE
    bounded groupby whose oracle is the same aggregate on the
    original parquet input."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Sum

    base = os.path.join("/tmp/soupflow_compact",
                        os.path.basename(os.path.normpath(sf_dir)))
    frag, comp = base + "/frag", base + "/compact"
    shutil.rmtree(base, ignore_errors=True)

    def narrow(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "value_cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64))})
    narrow.__name__ = "compact_narrow"

    _read(sf_dir, "events").select_columns(["event_type", "value"]) \
        .map_batches(narrow, batch_format="pyarrow") \
        .repartition(24).write_parquet(frag)

    def footer_rows(d):
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        return files, sum(pq.read_metadata(f).num_rows
                          for f in files)

    frag_files, frag_rows = footer_rows(frag)
    ray.data.read_parquet(frag).repartition(3).write_parquet(comp)
    comp_files, comp_rows = footer_rows(comp)
    if not (len(comp_files) < len(frag_files)):
        raise ValueError(
            f"compaction did not reduce file count "
            f"({len(frag_files)} -> {len(comp_files)})")
    if comp_rows != frag_rows:
        raise ValueError(
            f"compaction lost rows ({frag_rows} -> {comp_rows})")

    def fix(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type").cast(pa.string()),
            "value_cents": b.column("value_cents").cast(pa.int64())})
    fix.__name__ = "compact_schema_fix"

    return ray.data.read_parquet(comp) \
        .map_batches(fix, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("value_cents", alias_name="sum_cents"),
            Count(alias_name="n"))


def q_mg_heavy_hitters(sf_dir: str):
    """Deterministic heavy hitters: every term with frequency >
    n/30 and its EXACT count, via the Misra-Gries mergeable summary
    (data/sketch.py misra_gries_heavy — ≤ k rows per block shuffle,
    candidate-bounded exact confirm pass). k=29 sits inside this
    corpus's near-uniform 31-word frequency spread, so the output is
    a PROPER nonempty subset and the per-block reduction genuinely
    bites (31 distinct > k)."""
    from .data.sketch import misra_gries_heavy
    return misra_gries_heavy(_read(sf_dir, "documents"), k=29)


_IQR_M = 1  # multiplier in HALF-IQR units: bounds q1/q3 ∓ m·IQR/2


def q_iqr_outliers(sf_dir: str):
    """IQR outlier detection — the classic distribution-based
    data-cleaning pass: docs whose n_chars falls outside
    [q1 − m·IQR/2, q3 + m·IQR/2] of their own language's
    distribution. Reuses the exact grouped-quantile machinery
    (bounded (lang, value) histogram, ONE narrow groupby —
    data/rank.py grouped_quantiles); the per-lang integer (q1, q3)
    bounds broadcast and the corpus filters in ONE zero-shuffle
    pass. All comparisons run in DOUBLED units (2·x vs 2·q1 −
    m·(q3−q1)) so fractional IQR multiples stay integer-exact and
    the oracle mirrors the arithmetic term for term. m is
    parameterized; the textbook 1.5·IQR is vacuous on this
    synthetic corpus's well-behaved tails, so the catalog pins
    m = 0.5·IQR, which bites at both test scales."""
    import ray

    from .data.rank import grouped_quantiles

    qdf = grouped_quantiles(_read(sf_dir, "documents"),
                            "lang", "n_chars", (25, 75))
    piv = qdf.pivot(index="lang", columns="q_pct", values="value")
    langs = np.asarray(sorted(piv.index), dtype=object)
    q1 = piv.loc[langs, 25].to_numpy().astype(np.int64)
    q3 = piv.loc[langs, 75].to_numpy().astype(np.int64)
    iqr = q3 - q1
    handle = ray.put((langs, 2 * q1 - _IQR_M * iqr,
                      2 * q3 + _IQR_M * iqr))

    def keep(b: pa.Table) -> pa.Table:
        ls, lo, hi = ray.get(handle)
        lg = np.asarray(b.column("lang").to_pylist(), dtype=object)
        x = b.column("n_chars").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ls, lg)
        if lg.size and (pos.max() >= ls.size
                        or not np.array_equal(ls[pos], lg)):
            raise ValueError("lang missing from quantile table")
        mask = (2 * x < lo[pos]) | (2 * x > hi[pos])
        return b.filter(pa.array(mask))
    keep.__name__ = "iqr_outlier_filter"

    return _read(sf_dir, "documents") \
        .select_columns(["doc_id", "lang", "n_chars"]) \
        .map_batches(keep, batch_format="pyarrow")


def q_event_transitions(sf_dir: str):
    """Per-user Markov transition matrix — (prev event type → cur
    event type, n) over each user's (ts, event_id)-ordered stream:
    the LAG-then-GROUP-BY composite computed WITHOUT per-row LAG
    output (data/windows.py transition_counts — ONE global sort,
    ≤ |V|² count partials + O(blocks) edge rows, corpus never
    shuffles twice)."""
    from .data.windows import transition_counts
    return transition_counts(_read(sf_dir, "events"),
                             key_col="user_id", ts_col="ts",
                             id_col="event_id", val_col="event_type")


def q_top_terms_per_lang(sf_dir: str):
    """Top-3 most frequent terms per language (ties lexicographic) —
    grouped top-k over an AGGREGATE, not a raw column: per-block the
    token stream reduces to (lang, term, n) distinct-pair counts (one
    Arrow group_by — text never shuffles), ONE groupby bounded by
    |langs|·|vocab| finishes the counts, and a per-block top-3-per-
    lang cut (the data/rank.py grouped_topk partial shape: lexsort +
    run-position mask, term codes from np.unique so the tie stays
    lexicographic) shrinks the result so only O(blocks × langs × 3)
    rows ever reach the driver — the vocabulary table itself (billions
    of distinct terms on a web corpus) never collects. The driver
    finish applies the SAME (n desc, term asc) rule to the partials,
    so the composition is exact."""
    from ray.data.aggregate import Sum

    from .data.textstats import _ws_tokens
    from .io import collect_table

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.utf8_lower(arr)
        offs, flat = _ws_tokens(arr)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(offs))
        t = pa.table({"lang": b.column("lang").take(pa.array(row)),
                      "term": flat})
        t = t.filter(pc.not_equal(t.column("term"), ""))
        g = t.group_by(["lang", "term"]).aggregate([("term", "count")])
        return g.rename_columns(["lang", "term", "n"])
    partial.__name__ = "lang_term_count_partial"

    def top3_partial(b: pa.Table) -> pa.Table:
        # each groupby-output block holds each (lang, term) once —
        # keep that block's top-3 per lang under (n desc, term asc);
        # the global top-3 per lang survives any such per-block cut.
        if b.num_rows == 0 or "lang" not in b.schema.names:
            return pa.table({"lang": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        langs = np.unique(
            np.asarray(b.column("lang").to_pylist(), dtype=object),
            return_inverse=True)[1]
        # np.unique's sort makes term codes order-isomorphic to the
        # lexicographic term order — a valid integer tie key.
        terms = np.unique(
            np.asarray(b.column("term").to_pylist(), dtype=object),
            return_inverse=True)[1]
        n = b.column("n").to_numpy(zero_copy_only=False)
        from .data.rank import _topk_mask
        idx = _topk_mask(langs, n, terms, 3)
        return b.take(pa.array(np.sort(idx)))
    top3_partial.__name__ = "lang_top3_partial"

    agg = collect_table(          # O(blocks × langs × 3) — bounded
        _read(sf_dir, "documents").select_columns(["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"]).aggregate(Sum("n", alias_name="n"))
        .map_batches(top3_partial, batch_format="pyarrow"))
    df = agg.to_pandas()
    out = df.sort_values(["lang", "n", "term"],
                         ascending=[True, False, True]) \
        .groupby("lang").head(3).reset_index(drop=True)
    return pa.Table.from_pandas(out[["lang", "term", "n"]],
                                preserve_index=False)


def q_rolling_day_value(sf_dir: str):
    """Time-based RANGE-frame window — per-user 24-hour rolling value
    sum (SUM OVER ... RANGE BETWEEN INTERVAL 24h PRECEDING AND
    CURRENT ROW), completing the frame-type family (ROWS:
    rolling_revenue; RANGE: here). data/windows.py windowed_range_sum:
    ONE sort, packed-searchsorted in-block kernel, W-bounded tail
    broadcast for cross-block windows. Values fold to integer cents
    map-side so every frame sum is exact."""
    from .data.windows import windowed_range_sum

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64))})
    cents.__name__ = "value_to_cents"

    ds = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_id", "value"]) \
        .map_batches(cents, batch_format="pyarrow")
    out = windowed_range_sum(ds, key_col="user_id", ts_col="ts",
                             id_col="event_id", val_col="cents",
                             window_us=24 * 3600 * 1_000_000)
    return out.select_columns(["event_id", "roll"])


def q_term_cooccurrence(sf_dir: str):
    """Term CO-OCCURRENCE counts — the PMI / word-vector / topic-model
    feeder: for every unordered term pair (a < b), the number of
    documents containing BOTH. The textbook form is a distinct
    doc-term SELF-JOIN — a quadratic shuffle of the token stream. Here
    no join ever happens: each block reduces every doc to its sorted
    distinct term codes (one packed np.unique), emits all in-doc pairs
    with a segment-arange gather (no per-doc Python), and counts them
    via np.unique on the packed pair code — so a block's partial is
    bounded by min(pairs present, vocab²) regardless of its row count.
    ONE groupby((term_a, term_b)) over those narrow partials finishes;
    the text itself never shuffles. Codes are sorted, so a < b falls
    out of the packing and both engines cut the pair space identically.
    Open-vocabulary corpora bound the pair blowup by df-pruning terms
    first (the common_terms aggregate) or hashing — documented hatch;
    this corpus's vocabulary is closed, the exact path."""
    from ray.data.aggregate import Sum

    from .data.textstats import _text_array, _ws_tokens

    def pair_partial(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(_text_array(batch))
        offs, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            np.diff(offs))
        keep = toks != ""
        toks, doc_idx = toks[keep], doc_idx[keep]
        uniq, codes = np.unique(toks, return_inverse=True)
        nu = max(len(uniq), 1)
        if nu * nu >= 2**62:
            raise ValueError("block vocabulary too large to pack")
        upair = np.unique(doc_idx * nu + codes)
        ucodes, udoc = upair % nu, upair // nu
        # all (i < j) index pairs within each doc's sorted code run
        cnt = np.bincount(udoc, minlength=0)
        seg_end = np.repeat(np.cumsum(cnt), cnt)
        pos = np.arange(ucodes.size, dtype=np.int64)
        rep = seg_end - pos - 1
        i_idx = np.repeat(pos, rep)
        starts = np.concatenate(
            ([0], np.cumsum(rep)[:-1])) if rep.size else \
            np.empty(0, np.int64)
        off = np.arange(int(rep.sum()), dtype=np.int64) \
            - np.repeat(starts, rep)
        j_idx = i_idx + 1 + off
        pair_code, n = np.unique(
            ucodes[i_idx] * nu + ucodes[j_idx], return_counts=True)
        return pa.table({
            "term_a": pa.array(uniq[pair_code // nu], pa.string()),
            "term_b": pa.array(uniq[pair_code % nu], pa.string()),
            "n_both": pa.array(n.astype(np.int64), pa.int64())})
    pair_partial.__name__ = "cooccur_pair_partial"

    return _read(sf_dir, "documents").select_columns(["text"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["term_a", "term_b"]) \
        .aggregate(Sum("n_both", alias_name="n_both"))


def q_interval_coverage(sf_dir: str):
    """Gaps-and-islands interval merge: each event opens a
    [ts, ts + value-scaled) interval; per user, overlapping-or-
    touching intervals MERGE and the query reports island count +
    total covered time — the classic uptime/session-coverage
    composite whose SQL form is the running-max window. Durations
    fold to integer µs map-side (exact, > 0 by construction);
    data/windows.py interval_union does the rest with ±1 boundary
    events riding the hot-key-safe segmented-cumsum machinery."""
    from .data.windows import interval_union

    def to_iv(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        dur = np.maximum(
            1, np.floor(v * 100.0 + 0.5).astype(np.int64)) * 6_000_000
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "dur_us": pa.array(dur, pa.int64())})
    to_iv.__name__ = "event_to_interval"

    ds = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_id", "value"]) \
        .map_batches(to_iv, batch_format="pyarrow")
    return interval_union(ds, key_col="user_id", ts_col="ts",
                          id_col="event_id", dur_col="dur_us")


def q_embed_quantize(sf_dir: str):
    """Per-dimension min-max INT8 vector quantization — the ANN-store
    compression pass (data/similarity.py quantize_embeddings): exact
    integer micro-units map-side, ONE dim-bounded groupby for global
    ranges, broadcast ranges + zero-shuffle integer scoring. The
    oracle-facing long (id, dim, code) layout is produced here; the
    production layout is the fixed-width codes list (out='list'),
    pytest-pinned equal."""
    from .data.similarity import quantize_embeddings
    return quantize_embeddings(_read(sf_dir, "embeddings"),
                               out="long")


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of x's low 32 bits to the even bit positions
    (Morton/Z-order magic-number spreading, public-domain bit trick).
    Inputs must be < 2^31 so the interleaved code fits in int64."""
    x = x & 0xFFFFFFFF
    x = (x | (x << 16)) & 0x0000FFFF0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x << 2)) & 0x3333333333333333
    x = (x | (x << 1)) & 0x5555555555555555
    return x


def q_zorder_layout(sf_dir: str):
    """Z-ORDER (Morton-curve) data layout — the multi-column
    clustering pass a 100-TB lakehouse runs so range filters on EITHER
    column prune files (Delta/Iceberg OPTIMIZE ZORDER class). Each
    order's (custkey, order-day) pair interleaves bit-by-bit into one
    int64 Z-code via magic-number spreading — a zero-shuffle
    vectorized map — and the static top-bits cut assigns the range
    bucket a partitioned writer would cluster by. The oracle
    reproduces the interleaving with the same shift/mask algebra in
    SQL, so codes match bit-for-bit. At scale the only data movement
    this op implies is the final repartition-by-bucket before the
    write (partitioned_write's machinery); code assignment itself
    touches nothing."""
    def zmap(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        day = od // (86400 * 1_000_000)
        if ck.size and (int(ck.max()) >= 2**31 or int(ck.min()) < 0
                        or int(day.max()) >= 2**31
                        or int(day.min()) < 0):
            raise ValueError("z-order inputs must be in [0, 2^31)")
        z = _part1by1(ck) | (_part1by1(day) << 1)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "zcode": pa.array(z, pa.int64()),
            "zbucket": pa.array(z >> 36, pa.int64())})
    zmap.__name__ = "zorder_map"

    return _read(sf_dir, "orders") \
        .select_columns(["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(zmap, batch_format="pyarrow")


def _zorder_oracle_sql() -> str:
    """The same magic-number bit spreading as _part1by1, unrolled as
    a SQL CTE chain over BIGINT shift/mask algebra (decimal literals —
    DuckDB-safe), interleaving (custkey, order-day) bit-for-bit."""
    masks = [(16, 281470681808895), (8, 71777214294589695),
             (4, 1085102592571150095), (2, 3689348814741910323),
             (1, 6148914691236517205)]
    ctes = ["b0 AS (SELECT o_orderkey,"
            " (o_custkey & 4294967295) AS x,"
            " ((CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT))"
            "  & 4294967295) AS y FROM orders)"]
    for i, (sh, m) in enumerate(masks):
        ctes.append(
            f"b{i + 1} AS (SELECT o_orderkey,"
            f" ((x | (x << {sh})) & {m}) AS x,"
            f" ((y | (y << {sh})) & {m}) AS y FROM b{i})")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT o_orderkey, (x | (y << 1)) AS zcode,"
            f" ((x | (y << 1)) >> 36) AS zbucket"
            f" FROM b{len(masks)}")


def q_lineitem_skyline(sf_dir: str):
    """2-D SKYLINE / Pareto front (data/rank.py skyline2d): the
    (quantity, price) pairs no lineitem strictly dominates on both
    axes — the multi-objective selection whose SQL form is a
    quadratic NOT-EXISTS self-join, computed here with mergeable
    per-block frontier partials and ZERO shuffle. Money folds to
    integer cents map-side so the frontier compare is exact."""
    from .data.rank import skyline2d

    def fold(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        p = b.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "qty": pa.array(np.floor(q + 0.5).astype(np.int64)),
            "cents": pa.array(
                np.floor(p * 100.0 + 0.5).astype(np.int64))})
    fold.__name__ = "skyline_fold"

    ds = _read(sf_dir, "lineitem") \
        .select_columns(["l_quantity", "l_extendedprice"]) \
        .map_batches(fold, batch_format="pyarrow")
    return skyline2d(ds, xcol="qty", ycol="cents",
                     out_cols=("qty", "cents", "n"))


def q_shuffle_rank(sf_dir: str):
    """Deterministic global epoch shuffle (data/sampling.py
    shuffle_rank): every doc's ordinal position under the seed-1 hash
    permutation — the reproducible data-order pass a trainer runs per
    epoch. ONE narrow-column sort; ordinals attach with an O(blocks)
    offset summary + zero-shuffle second map."""
    from .data.sampling import shuffle_rank
    return shuffle_rank(_read(sf_dir, "documents")
                        .select_columns(["doc_id"]), seed=1)


_BPE_MERGES = 8


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (data/bpe.py bpe_train):
    8 merge rounds over the corpus word-frequency table — the
    subword-vocabulary pass every LLM data pipeline runs. Corpus
    shuffles once (the vocab-bounded word count); each round is a
    pair-bounded groupby + broadcast argmax + one vectorized
    replace_substring whose left-to-right non-overlap IS the greedy
    merge rule. The sentinel-segmentation representation is shared
    with the SQL oracle, so the full iterative run is bit-compared."""
    from .data.bpe import bpe_train
    merges, _ = bpe_train(_read(sf_dir, "documents"),
                          num_merges=_BPE_MERGES)
    return merges


def q_bpe_token_counts(sf_dir: str):
    """Tokenizer APPLICATION at corpus scale (data/bpe.py
    bpe_encode_token_counts): train the 8-round BPE merge list, then
    tokenize every document with it and report per-document
    (n_words, n_tokens) — the pass that precedes every token-budget
    decision in a training-data pipeline, run far more often than
    training itself. Encoding is ZERO-shuffle: the k-rule merge list
    broadcasts, each block encodes its DISTINCT words once through
    the same vectorized sentinel replace kernel training uses, and
    token counts per word are boundary counts of the representation
    (no split, no per-token work). The oracle extends the bpe_merges
    CTE chain one step to the final segmentation and joins it back
    to the per-doc word multiset, so counts are bit-compared."""
    from .data.bpe import bpe_encode_token_counts, bpe_train
    docs = _read(sf_dir, "documents")
    merges, _ = bpe_train(docs, num_merges=_BPE_MERGES)
    return bpe_encode_token_counts(docs, merges)


def _bpe_oracle_sql(k: int = _BPE_MERGES) -> str:
    """The same k BPE rounds as a generated CTE chain: identical
    sentinel segmentation (chr(31) between symbols), identical pair
    statistic (overlapping adjacencies, frequency-weighted), identical
    winner rule (count DESC, pair lexicographic), identical greedy
    merge (SQL replace = left-to-right non-overlapping scan)."""
    pair_cte = (
        "p{r} AS (SELECT string_split(pr, chr(30))[1] a,"
        " string_split(pr, chr(30))[2] b,"
        " CAST(sum(n) AS BIGINT) c FROM"
        " (SELECT unnest(list_transform(range(1, len(ls)),"
        "   i -> ls[i] || chr(30) || ls[i+1])) pr, n FROM"
        "  (SELECT n, string_split(trim(s, chr(31)),"
        "   chr(31) || chr(31)) ls FROM seg{r})) GROUP BY 1, 2)")
    best_cte = ("b{r} AS (SELECT a, b, c FROM p{r}"
                " ORDER BY c DESC, a, b LIMIT 1)")
    # double-sentinel boundaries: a merge consumes only the INNER
    # halves of its surrounding boundaries, so replace's left-to-right
    # scan reproduces textbook greedy BPE on repeated-symbol runs
    next_cte = (
        "seg{r1} AS (SELECT w, n, replace(s,"
        " chr(31) || a || chr(31) || chr(31) || b || chr(31),"
        " chr(31) || a || b || chr(31)) s FROM seg{r}, b{r})")
    ctes = [
        "toks AS (SELECT unnest(list_filter("
        "regexp_split_to_array(lower(text), '\\s+'),"
        " x -> x <> '')) AS w FROM documents)",
        "wf AS (SELECT w, CAST(count(*) AS BIGINT) n"
        " FROM toks GROUP BY w)",
        "seg0 AS (SELECT w, n, chr(31) || chr(31) ||"
        " array_to_string(regexp_split_to_array(w, ''),"
        " chr(31) || chr(31)) || chr(31) || chr(31) s FROM wf)"]
    for r in range(k):
        ctes.append(pair_cte.format(r=r))
        ctes.append(best_cte.format(r=r))
        if r + 1 < k:
            ctes.append(next_cte.format(r=r, r1=r + 1))
    sel = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, a AS lhs, b AS rhs,"
        f" c AS n_pair FROM b{r}" for r in range(k))
    return f"WITH {', '.join(ctes)} {sel}"


def _bpe_encode_oracle_sql(k: int = _BPE_MERGES) -> str:
    """The bpe_merges CTE chain extended ONE step to the final
    segmentation seg{k}, joined back to the per-document word
    multiset: token count per word = symbol count of its final
    representation, per-doc totals by LEFT JOIN so wordless docs
    keep a (0, 0) row — identical semantics to the engine's segment
    sums over empty token lists."""
    pair_cte = (
        "p{r} AS (SELECT string_split(pr, chr(30))[1] a,"
        " string_split(pr, chr(30))[2] b,"
        " CAST(sum(n) AS BIGINT) c FROM"
        " (SELECT unnest(list_transform(range(1, len(ls)),"
        "   i -> ls[i] || chr(30) || ls[i+1])) pr, n FROM"
        "  (SELECT n, string_split(trim(s, chr(31)),"
        "   chr(31) || chr(31)) ls FROM seg{r})) GROUP BY 1, 2)")
    best_cte = ("b{r} AS (SELECT a, b, c FROM p{r}"
                " ORDER BY c DESC, a, b LIMIT 1)")
    next_cte = (
        "seg{r1} AS (SELECT w, n, replace(s,"
        " chr(31) || a || chr(31) || chr(31) || b || chr(31),"
        " chr(31) || a || b || chr(31)) s FROM seg{r}, b{r})")
    ctes = [
        "toks AS (SELECT unnest(list_filter("
        "regexp_split_to_array(lower(text), '\\s+'),"
        " x -> x <> '')) AS w FROM documents)",
        "wf AS (SELECT w, CAST(count(*) AS BIGINT) n"
        " FROM toks GROUP BY w)",
        "seg0 AS (SELECT w, n, chr(31) || chr(31) ||"
        " array_to_string(regexp_split_to_array(w, ''),"
        " chr(31) || chr(31)) || chr(31) || chr(31) s FROM wf)"]
    for r in range(k):
        ctes.append(pair_cte.format(r=r))
        ctes.append(best_cte.format(r=r))
        ctes.append(next_cte.format(r=r, r1=r + 1))
    ctes.append(
        f"wtok AS (SELECT w, CAST(len(string_split(trim(s, chr(31)),"
        f" chr(31) || chr(31))) AS BIGINT) t FROM seg{k})")
    ctes.append(
        "dtoks AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(lower(text), '\\s+'),"
        " x -> x <> '')) AS w FROM documents)")
    sel = (
        "SELECT d.doc_id,"
        " CAST(coalesce(count(wt.t), 0) AS BIGINT) AS n_words,"
        " CAST(coalesce(sum(wt.t), 0) AS BIGINT) AS n_tokens"
        " FROM documents d"
        " LEFT JOIN dtoks dt ON dt.doc_id = d.doc_id"
        " LEFT JOIN wtok wt ON wt.w = dt.w"
        " GROUP BY d.doc_id")
    return f"WITH {', '.join(ctes)} {sel}"


def q_user_paths(sf_dir: str):
    """Ordered grouped string aggregation — the
    ``string_agg(val, sep ORDER BY ...)`` class (data/windows.py
    ordered_string_agg): each user's chronological event-type journey
    as one '>'-joined path string, the session-path surface of
    product analytics. ONE global sort (inherent to any ordered
    aggregate); blocks reduce key runs to single partials with one
    vectorized binary_join; interior keys finish zero-shuffle; the
    O(blocks) edge runs merge in one small groupby whose per-group
    payload IS the key's output row."""
    from .data.windows import ordered_string_agg
    ds = _read(sf_dir, "events").select_columns(
        ["user_id", "ts", "event_id", "event_type"])
    return ordered_string_agg(ds, key_col="user_id",
                              order_cols=["ts", "event_id"],
                              val_col="event_type", sep=">",
                              out_col="path")


_Q21_LATE_DAYS = 60


def q_late_suppliers(sf_dir: str):
    """TPC-H Q21 shape — suppliers who were the SOLE late supplier in
    a multi-supplier order: the correlated EXISTS + NOT-EXISTS double
    self-join, decorrelated into grouped set aggregates so lineitem
    self-joins NEVER run. Per (order, supplier) the three predicates
    collapse to three per-order statistics: n_suppliers ≥ 2 (the
    EXISTS), n_late_suppliers = 1 (the NOT EXISTS), and the late
    supplier's identity — all derivable from ONE per-(orderkey,
    suppkey) MAX-shipdate reduction. Scale shape — ONE wide op total
    (was groupby + join + groupby at Ray sort fixed cost, the r4
    floor): lineitem pre-reduces per block with an Arrow group_by to
    (ok, sk, day) partials (narrow int64; text and prices never
    read), orders fold to (ok, −1, o_day) SENTINEL rows, the union
    sorts ONCE on (ok, sk) — sentinels lead each order's run — and a
    zero-shuffle segment kernel over the sorted blocks computes the
    per-order triple (ns, nl, late_sk) for every INTERIOR run
    (complete by contiguity) and pre-counts winners per supplier;
    the ≤2 edge runs per block (suppliers-per-order-bounded rows)
    collect driver-side where the same kernel finishes the
    boundary-spanning orders. Supplier counts then finish against
    the broadcast supplier dim as before. Late = day(l_shipdate) −
    day(o_orderdate) > 60, day-truncated in both engines.
    data/segments.py finish_sorted_runs owns the interior/edge
    plumbing."""
    from .data.segments import finish_sorted_runs
    from .io import collect_table

    _SK_SENT = -1  # sorts before every real suppkey (contract ≥ 0)

    def ord_fold(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        days = od.astype("datetime64[D]").astype(np.int64)
        return pa.table({
            "ok": b.column("o_orderkey"),
            "sk": pa.array(np.full(b.num_rows, _SK_SENT, np.int64)),
            "d": pa.array(days, pa.int64())})
    ord_fold.__name__ = "q21_order_fold"

    def ship_partial(b: pa.Table) -> pa.Table:
        sd = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        days = sd.astype("datetime64[D]").astype(np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        if sk.size and sk.min() < 0:
            raise ValueError(
                "late_suppliers requires suppkey >= 0 — a negative "
                "key would alias the order-date sentinel row")
        t = pa.table({"ok": b.column("l_orderkey"),
                      "sk": b.column("l_suppkey").cast(pa.int64()),
                      "d": pa.array(days, pa.int64())})
        return t.group_by(["ok", "sk"]) \
            .aggregate([("d", "max")]) \
            .rename_columns(["ok", "sk", "d"])
    ship_partial.__name__ = "q21_ship_partial"

    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(ship_partial, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_orderdate"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "sk"])

    _empty = pa.table({"sk": pa.array([], pa.int64()),
                       "n": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        """Per-supplier winner counts over a (ok, sk)-sorted slice
        whose ok-runs are COMPLETE. Dedups equal (ok, sk) by max d,
        requires each run to open with its sentinel (FK: every
        lineitem order exists in orders), applies the triple filter
        (ns ≥ 2, nl == 1) and counts wins per suppkey."""
        ok, sk, d = cols["ok"], cols["sk"], cols["d"]
        if ok.size == 0:
            return _empty
        # segment max over equal (ok, sk): partials from different
        # blocks meet here
        new = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]
        seg = np.flatnonzero(new)
        dmax = np.maximum.reduceat(d, seg)
        oks, sks = ok[seg], sk[seg]
        # run starts over the deduped stream
        rstart = np.flatnonzero(np.r_[True, oks[1:] != oks[:-1]])
        rid = np.cumsum(np.r_[True, oks[1:] != oks[:-1]]) - 1
        has_sent = sks[rstart] == _SK_SENT
        if not has_sent.all():
            bad = oks[rstart[~has_sent]][0]
            raise ValueError(
                f"late_suppliers: order {bad} has lineitems but no "
                "orders row — FK violation")
        o_day = dmax[rstart][rid]          # broadcast per run
        real = sks != _SK_SENT
        late = real & (dmax - o_day > _Q21_LATE_DAYS)
        ns = np.bincount(rid, weights=real)
        nl = np.bincount(rid, weights=late)
        win_run = (ns >= 2) & (nl == 1)
        wk, cnts = np.unique(sks[late & win_run[rid]],
                             return_counts=True)
        return pa.table({"sk": pa.array(wk, pa.int64()),
                         "n": pa.array(cnts, pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["sk"],
        int_cols=["ok", "sk", "d"], kernel=kernel,
        empty_partial=_empty)
    sk = partial.column("sk").to_numpy(zero_copy_only=False)
    n = partial.column("n").to_numpy(zero_copy_only=False)
    ks = np.unique(sk)
    numwait = np.zeros(ks.size, np.int64)
    np.add.at(numwait, np.searchsorted(ks, sk), n)

    supp = collect_table(
        _read(sf_dir, "supplier")
        .select_columns(["s_suppkey", "s_name"]))
    if "s_suppkey" not in supp.schema.names:
        # an EMPTY supplier table collects schema-less (Ray 2.49);
        # with no winners it's just the typed-empty result
        if ks.size:
            raise ValueError("late supplier key missing from "
                             "supplier dim — FK violation")
        return pa.table({"s_name": pa.array([], pa.string()),
                         "numwait": pa.array([], pa.int64())})
    skeys = supp.column("s_suppkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order_ = np.argsort(skeys)
    skeys = skeys[order_]
    pos = np.searchsorted(skeys, ks)
    if pos.size and (pos.max() >= skeys.size
                     or not np.all(skeys[pos] == ks)):
        raise ValueError("late supplier key missing from supplier "
                         "dim — FK violation")
    names = supp.column("s_name").take(
        pa.array(order_[pos], pa.int64())).to_pylist()
    final = sorted(zip(names, numwait.tolist()),
                   key=lambda t: (-t[1], t[0]))
    return pa.table({
        "s_name": pa.array([t[0] for t in final], pa.string()),
        "numwait": pa.array([t[1] for t in final], pa.int64())})


_Q7_NATIONS = (3, 8)


def q_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape — cross-nation trade volume: revenue shipped
    from suppliers of nation A to customers of nation B and vice
    versa, per year. The 6-way textbook join collapses to ONE
    partitioned fact-fact join plus broadcasts: supplier and nation
    are dims (suppkey→nation broadcast filters lineitem map-side —
    non-participating rows never leave the scan), customer broadcasts
    custkey→nation into the orders fold the same way (the two-column
    int map is MB-scale here; for a customer table beyond driver
    memory the same fold becomes one more partitioned narrow join on
    custkey — the revenue_by_nation hatch), lineitem
    pre-aggregates per block to (orderkey, supp_nation, year,
    rev_cents) integer partials BEFORE any movement, and the
    cross-pair filter + per-block 2×2×years-bounded partials come
    out of the one-pass sentinel sort (see inline comment)."""
    import ray

    from .data.segments import finish_sorted_runs
    from .io import collect_table

    a, b2 = _Q7_NATIONS
    nat = collect_table(_read(sf_dir, "nation")
                        .select_columns(["n_nationkey", "n_name"]))
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    names = dict(zip(nk.tolist(),
                     nat.column("n_name").to_pylist()))

    supp = collect_table(_read(sf_dir, "supplier")
                         .select_columns(["s_suppkey",
                                          "s_nationkey"]))
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    snk = supp.column("s_nationkey") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = (snk == a) | (snk == b2)
    order_ = np.argsort(sk[keep])
    s_keys, s_nat = sk[keep][order_], snk[keep][order_]
    s_handle = ray.put((s_keys, s_nat))

    cust = collect_table(_read(sf_dir, "customer")
                         .select_columns(["c_custkey",
                                          "c_nationkey"]))
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    cnk = cust.column("c_nationkey") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = (cnk == a) | (cnk == b2)
    order_ = np.argsort(ck[keep])
    c_keys, c_nat = ck[keep][order_], cnk[keep][order_]
    c_handle = ray.put((c_keys, c_nat))

    def ord_fold(bt: pa.Table) -> pa.Table:
        ks, nats = ray.get(c_handle)
        ock = bt.column("o_custkey").to_numpy(zero_copy_only=False)
        if ks.size:
            pos = np.minimum(np.searchsorted(ks, ock), ks.size - 1)
            m = ks[pos] == ock
        else:
            m = np.zeros(ock.size, bool)
        kept = bt.filter(pa.array(m))
        pos = np.searchsorted(
            ks, kept.column("o_custkey")
            .to_numpy(zero_copy_only=False))
        n = kept.num_rows
        return pa.table({
            "ok": kept.column("o_orderkey"),
            "fl": pa.array(np.full(n, -1, np.int64)),
            "nk": pa.array(nats[pos], pa.int64()),
            "yr": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64))})
    ord_fold.__name__ = "q7_order_fold"

    def li_fold(bt: pa.Table) -> pa.Table:
        ks, nats = ray.get(s_handle)
        lsk = bt.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if ks.size:
            pos = np.minimum(np.searchsorted(ks, lsk), ks.size - 1)
            m = ks[pos] == lsk
        else:
            m = np.zeros(lsk.size, bool)
        kept = bt.filter(pa.array(m))
        lsk = kept.column("l_suppkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ks, lsk)
        p = kept.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        d = kept.column("l_discount").to_numpy(zero_copy_only=False)
        rev = (np.floor(p * 100.0 + 0.5).astype(np.int64)
               * (100 - np.floor(d * 100.0 + 0.5).astype(np.int64)))
        sd = kept.column("l_shipdate").to_numpy(zero_copy_only=False)
        yr = sd.astype("datetime64[Y]").astype(np.int64) + 1970
        t = pa.table({"ok": kept.column("l_orderkey"),
                      "nk": pa.array(nats[pos], pa.int64()),
                      "yr": pa.array(yr, pa.int64()),
                      "rev": pa.array(rev, pa.int64())})
        g = t.group_by(["ok", "nk", "yr"]) \
            .aggregate([("rev", "sum")]) \
            .rename_columns(["ok", "nk", "yr", "rev"])
        return pa.table({
            "ok": g.column("ok"),
            "fl": pa.array(np.zeros(g.num_rows, np.int64)),
            "nk": g.column("nk"),
            "yr": g.column("yr"),
            "rev": g.column("rev")})
    li_fold.__name__ = "q7_lineitem_fold"

    # ONE-PASS sentinel shape (round 5, eighth in the family;
    # data/segments.py finish_sorted_runs owns the interior/edge
    # plumbing): the former partitioned fact-fact hash join collapses
    # into ONE sort on (ok, fl) — pair-filtered orders lead their
    # runs as (ok, −1, cust_nk) sentinels, pair-filtered lineitem
    # pre-reduces per block to (ok, 0, supp_nk, yr, rev) partials,
    # and the segment kernel broadcasts each run's customer nation
    # over its fact rows, applies the cross-pair filter and emits
    # ≤2×2×|years|-row partials per block. Sentinel-less runs are
    # orders whose customer is outside the nation pair and skip
    # silently (Q4 rule — the order filter makes a missing sentinel
    # legitimate, not an FK violation).
    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_suppkey",
                         "l_extendedprice", "l_discount",
                         "l_shipdate"]) \
        .map_batches(li_fold, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_custkey"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    _empty = pa.table({"supp_nk": pa.array([], pa.int64()),
                       "cust_nk": pa.array([], pa.int64()),
                       "yr": pa.array([], pa.int64()),
                       "rev": pa.array([], pa.int64())})
    _PK_YR = 10_000           # nationkey < 1000, year < 10000: pack
    _PK_NK = 10_000_000       # (snk, cnk, yr) into one int64 key

    def kernel(cols) -> pa.Table:
        """(supp_nation, cust_nation, year) revenue partials over a
        (ok, fl)-sorted slice of COMPLETE runs; the sentinel's nk
        slot carries the customer nation, fact rows' nk slots carry
        the supplier nation. Sentinel-less runs skip silently."""
        ok, fl = cols["ok"], cols["fl"]
        nk, yr, rev = cols["nk"], cols["yr"], cols["rev"]
        if ok.size == 0:
            return _empty
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        rid = np.cumsum(new) - 1
        has_sent = fl[rstart] == -1
        cn_row = nk[rstart][rid]          # cust nation per row (when
        fact = (fl != -1) & has_sent[rid]  # the run has a sentinel)
        fact &= nk != cn_row              # cross-pair filter
        if not bool(fact.any()):
            return _empty
        pack = (nk[fact] * _PK_NK + cn_row[fact] * _PK_YR
                + yr[fact])
        uniq, inv = np.unique(pack, return_inverse=True)
        sums = np.zeros(uniq.size, np.int64)
        np.add.at(sums, inv, rev[fact])
        return pa.table({
            "supp_nk": pa.array(uniq // _PK_NK, pa.int64()),
            "cust_nk": pa.array((uniq // _PK_YR) % (_PK_NK // _PK_YR),
                                pa.int64()),
            "yr": pa.array(uniq % _PK_YR, pa.int64()),
            "rev": pa.array(sums, pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl", "nk", "yr", "rev"], kernel=kernel,
        empty_partial=_empty)
    snk_ = partial.column("supp_nk").to_numpy(zero_copy_only=False)
    cnk_ = partial.column("cust_nk").to_numpy(zero_copy_only=False)
    yr_ = partial.column("yr").to_numpy(zero_copy_only=False)
    rv_ = partial.column("rev").to_numpy(zero_copy_only=False)
    pack = snk_ * _PK_NK + cnk_ * _PK_YR + yr_
    uniq, inv = np.unique(pack, return_inverse=True)
    sums = np.zeros(uniq.size, np.int64)
    np.add.at(sums, inv, rv_)
    sn = [names[int(x)] for x in (uniq // _PK_NK).tolist()]
    cn = [names[int(x)] for x in
          ((uniq // _PK_YR) % (_PK_NK // _PK_YR)).tolist()]
    return pa.table({
        "supp_nation": pa.array(sn, pa.string()),
        "cust_nation": pa.array(cn, pa.string()),
        "yr": pa.array(uniq % _PK_YR, pa.int64()),
        "rev_cents": pa.array(sums, pa.int64())})


def q_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape — customers with above-average account balance
    and NO large order, counted and summed per nation: the scalar
    subquery + NOT-EXISTS anti-join composite. The scalar AVG never
    materializes as a float: per-block (n_pos, sum_cents) partials
    collect driver-side (O(blocks) rows) and the predicate
    cents · n_pos > sum_cents is pure int64 cross-multiplication, so
    both engines compare exactly. The anti-join side reduces orders
    map-side to distinct large-order custkeys (narrow int64; the
    customers_no_orders broadcast-membership machinery, with the same
    left_anti partitioned hatch for key sets that outgrow the
    driver). Customers then filter + pre-aggregate per block in one
    zero-shuffle pass and ONE nation-bounded groupby finishes."""
    import ray
    from ray.data.aggregate import Sum

    from .io import collect_table

    def bal_partial(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        pos = bal > 0.0
        cents = np.floor(bal[pos] * 100.0 + 0.5).astype(np.int64)
        return pa.table({"n": pa.array([int(pos.sum())], pa.int64()),
                         "s": pa.array([int(cents.sum())],
                                       pa.int64())})
    bal_partial.__name__ = "q22_bal_partial"

    cust_cols = _read(sf_dir, "customer") \
        .select_columns(["c_custkey", "c_nationkey", "c_acctbal"]) \
        .materialize()  # narrow projection feeds two passes
    parts = collect_table(cust_cols.map_batches(
        bal_partial, batch_format="pyarrow"))
    n_pos = int(pc.sum(parts.column("n")).as_py() or 0)
    sum_cents = int(pc.sum(parts.column("s")).as_py() or 0)
    if n_pos == 0:
        raise ValueError("sales_opportunity: no positive-balance "
                         "customers — average undefined")

    def big_keys(b: pa.Table) -> pa.Table:
        price = b.column("o_totalprice") \
            .to_numpy(zero_copy_only=False)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(
            np.unique(ck[price > 400000.0]), pa.int64())})
    big_keys.__name__ = "q22_big_order_keys"

    kt = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice"])
        .map_batches(big_keys, batch_format="pyarrow"))
    keys = np.unique(kt.column("k").to_numpy(zero_copy_only=False)) \
        if kt.num_rows else np.empty(0, np.int64)
    handle = ray.put(keys)

    def nation_partial(b: pa.Table) -> pa.Table:
        ks = ray.get(handle)
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        keep = cents * n_pos > sum_cents
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
        if ks.size:
            pos = np.minimum(np.searchsorted(ks, ck), ks.size - 1)
            keep &= ks[pos] != ck
        t = pa.table({
            "c_nationkey": b.column("c_nationkey")
            .filter(pa.array(keep)).cast(pa.int64()),
            "cnt": pa.array(np.ones(int(keep.sum()), np.int64)),
            "bal_cents": pa.array(cents[keep], pa.int64())})
        return t.group_by("c_nationkey").aggregate(
            [("cnt", "sum"), ("bal_cents", "sum")]) \
            .rename_columns(["c_nationkey", "cnt", "bal_cents"])
    nation_partial.__name__ = "q22_nation_partial"

    return cust_cols \
        .map_batches(nation_partial, batch_format="pyarrow") \
        .groupby("c_nationkey") \
        .aggregate(Sum("cnt", alias_name="cnt"),
                   Sum("bal_cents", alias_name="bal_cents"))


def q_order_triangles(sf_dir: str):
    """Distributed TRIANGLE COUNTING (data/graph.py triangle_counts)
    over a fact-scale co-membership graph: orders are vertices, with
    an edge when two orders ship from the same supplier in the same
    ISO week — vertices and edges both grow with the corpus, so this
    is the genuinely distributed regime (the co-supplier and co-part
    projections are complete graphs on this corpus; dimension-bounded
    and driver-trivial). Edge generation is the same
    distinct_pairs_per_key sort-pass over (bucket → order), bucket
    sizes bounded by data model (≤ 9 orders per supplier-week here);
    the SQL oracle is the cubic triple self-join the engine never
    runs. Output: per-order triangle participation counts."""
    from .data.graph import distinct_pairs_per_key, triangle_counts

    def buckets(b: pa.Table) -> pa.Table:
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        days = b.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        # ISO week start (Monday); epoch day 0 = Thursday
        wk = days - ((days + 3) % 7)
        if sk.size and (sk.max() >= 1 << 20 or sk.min() < 0
                        or wk.max() >= 1 << 22 or wk.min() < 0):
            raise ValueError("order_triangles bucket packing "
                             "requires 0 <= suppkey < 2^20 and "
                             "0 <= week-day < 2^22")
        bkt = sk * (1 << 22) + wk
        t = pa.table({"bkt": pa.array(bkt, pa.int64()),
                      "ok": pa.array(ok, pa.int64())})
        # in-block distinct before the sort shuffles anything
        return t.group_by(["bkt", "ok"]).aggregate([]) \
            .rename_columns(["bkt", "ok"])
    buckets.__name__ = "order_triangle_buckets"

    bkt_ds = _read(sf_dir, "lineitem") \
        .select_columns(["l_suppkey", "l_orderkey", "l_shipdate"]) \
        .map_batches(buckets, batch_format="pyarrow")
    edges, _ = distinct_pairs_per_key(bkt_ds, key_col="bkt",
                                      val_col="ok", max_run=4096)
    tri = triangle_counts(edges, src_col="a", dst_col="b",
                          max_degree=65536)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"ok": b.column("v"),
                         "n_tri": b.column("n_tri")})
    finish.__name__ = "order_triangles_finish"
    return tri.map_batches(finish, batch_format="pyarrow")


def q_median_value_by_type(sf_dir: str):
    """Exact per-group CONTINUOUS median (percentile_cont 0.5) of
    event value cents, in doubled units so the two-middle-values
    interpolation stays integer (data/rank.py grouped_median_cont):
    the one quantile the disc-rank family can't express. Histogram
    partials, ONE narrow groupby, driver cumsum — value never sorts
    globally."""
    from .data.rank import grouped_median_cont

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    to_cents.__name__ = "median_value_cents"

    ds = _read(sf_dir, "events") \
        .select_columns(["event_type", "value"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    return grouped_median_cont(ds, "event_type", "cents")


def q_source_overlap(sf_dir: str):
    """Cross-source duplication audit (data/dedup.py source_overlap):
    per source-pair count of shared distinct 24-char text prefixes —
    the mirror-site / repackaged-dump detector a curator runs before
    mixing sources. The SQL form is a fingerprint self-join; the
    engine sorts the distinct (fp, source) stream ONCE on the fp
    hash and emits |sources|²-bounded pair-count partials per block,
    exact under hash collisions (the fp string rides along and the
    kernel sub-groups by it)."""
    from .data.dedup import source_overlap

    return source_overlap(
        _read(sf_dir, "documents").select_columns(["source", "text"]),
        key_col="source", col="text", prefix_len=24)


def q_rolling_p95(sf_dir: str):
    """Trailing 7-day ROLLING 95th percentile of event value cents
    per observed day — the rolling-quantile dashboard class
    (data/windows.py rolling_quantile_disc): quantiles don't merge
    across overlapping windows, so the engine slides a count array
    over the global (day, value) histogram instead of re-scanning
    events per window like the oracle's range self-join. Discrete
    percentile (smallest v with 100·cum ≥ 95·W) keeps everything
    integer; day truncation is UTC date, collect is
    O(day-span × distinct values)."""
    from .data.windows import rolling_quantile_disc

    def narrow(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ts" not in b.schema.names:
            e = pa.array([], pa.int64())
            return pa.table({"day_i": e, "cents": e})
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "day_i": pa.array(ts.astype("datetime64[D]")
                              .astype(np.int64), pa.int64()),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    narrow.__name__ = "p95_day_cents"

    t = rolling_quantile_disc(
        _read(sf_dir, "events").select_columns(["ts", "value"])
        .map_batches(narrow, batch_format="pyarrow"),
        day_col="day_i", val_col="cents", window=7, pct=95)
    if t.num_rows == 0:
        return pa.table({"day": pa.array([], pa.string()),
                         "p95_cents": pa.array([], pa.int64())})
    d = t.column("day_i").to_numpy(zero_copy_only=False)
    return pa.table({
        "day": pa.array(d.astype("datetime64[D]").astype(str),
                        pa.string()),
        "p95_cents": t.column("q")})


def q_leadlag_corr(sf_dir: str, max_lag: int = 3):
    """LEAD–LAG cross-correlation of two daily series — Pearson
    corr(views_t, purchases_{t+lag}) for lag ∈ [−3, 3]: the
    cause-precedes-effect scan (does purchase volume trail view
    volume, and by how many days?). The corpus never shuffles: one
    map-side (day, views, purchases) partial pass + ONE day-bounded
    groupby, then the driver gap-fills the dense span and computes
    every lag over the same two arrays — the collect is O(day span),
    the 7 correlations are reads of it. Moment products n·Σxy can
    exceed int64 at web scale (day counts ~10⁹), so the driver
    finishes in PYTHON INTS (oracle: HUGEINT — the spend_hhi /
    spearman recipe) before the one float division; the float tree
    (cast num, cast den product, sqrt, divide) is mirrored op-for-op
    in the SQL, all IEEE-correctly-rounded, and `rho` sorts after the
    unique `lag` key per the float-finish rules. Zero-variance
    windows emit rho = 0 by convention (CASE-mirrored)."""
    import math

    from ray.data.aggregate import Sum

    from .io import collect_table

    def day_partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        et = b.column("event_type")
        x = pc.equal(et, "view").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        y = pc.equal(et, "purchase").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = pa.table({"day": pa.array(day, pa.int64()),
                      "x": pa.array(x), "y": pa.array(y)})
        return t.group_by(["day"]).aggregate(
            [("x", "sum"), ("y", "sum")]) \
            .rename_columns(["day", "x", "y"])
    day_partial.__name__ = "leadlag_day_partial"

    agg = collect_table(
        _read(sf_dir, "events")
        .select_columns(["ts", "event_type"])
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("x", alias_name="x"),
                                  Sum("y", alias_name="y")))
    if agg.num_columns == 0 or agg.num_rows == 0:
        return pa.table({"lag": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "rho": pa.array([], pa.float64())})
    day = agg.column("day").to_numpy(zero_copy_only=False)
    xs = agg.column("x").to_numpy(zero_copy_only=False)
    ys = agg.column("y").to_numpy(zero_copy_only=False)
    lo = int(day.min())
    span = int(day.max()) - lo + 1
    x = np.zeros(span, np.int64)
    y = np.zeros(span, np.int64)
    x[day - lo] = xs
    y[day - lo] = ys

    lags, ns, rhos = [], [], []
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            a, b2 = x[:span - lag], y[lag:]
        else:
            a, b2 = x[-lag:], y[:span + lag]
        n = a.size
        # python ints: the moment products overflow int64 at scale
        sx = int(a.sum())
        sy = int(b2.sum())
        sxy = sum(int(u) * int(v) for u, v in zip(a, b2))
        sxx = sum(int(u) * int(u) for u in a)
        syy = sum(int(v) * int(v) for v in b2)
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        rho = (float(num) / math.sqrt(float(dx) * float(dy))
               if dx > 0 and dy > 0 else 0.0)
        lags.append(lag)
        ns.append(n)
        rhos.append(rho)
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "rho": pa.array(rhos, pa.float64())})


def q_weighted_median_price(sf_dir: str):
    """Per-returnflag lower WEIGHTED median of lineitem price cents,
    weighted by quantity — the unequal-mass robust center
    (data/rank.py grouped_weighted_median): smallest price with
    2·cumweight ≥ totalweight, all-integer so no interpolation ever
    floats. Price cents are NEAR-UNIQUE (583k distinct / 600k rows
    at sf0.1 — a plain histogram collect would be the whole table),
    so this runs the TWO-PASS bucket refinement: pass 1 histograms
    4096-cent buckets (domain ÷ 2¹²) to locate each flag's median
    bucket + weight before it, pass 2 re-reads the pruned scan and
    histograms only in-bucket rows — both collects bounded at
    O(keys × domain/2¹²) + O(keys × 2¹²) regardless of price
    cardinality."""
    from .data.rank import grouped_weighted_median

    def fold(b: pa.Table) -> pa.Table:
        p = b.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "cents": pa.array(
                np.floor(p * 100.0 + 0.5).astype(np.int64),
                pa.int64()),
            "qty": pa.array(
                np.floor(q + 0.5).astype(np.int64), pa.int64())})
    fold.__name__ = "wmedian_price_fold"

    ds = _read(sf_dir, "lineitem") \
        .select_columns(["l_returnflag", "l_extendedprice",
                         "l_quantity"]) \
        .map_batches(fold, batch_format="pyarrow")
    out = grouped_weighted_median(ds, "l_returnflag", "cents", "qty",
                                  coarse_bits=12)
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
        "wmedian_cents": pa.array(
            out["wmedian"].astype(np.int64), pa.int64())})


def q_editdist_pairs(sf_dir: str):
    """Edit-distance-1 near-duplicate document-key pairs (12-char
    text prefixes) via SymSpell deletion neighborhoods
    (data/dedup.py editdist1_pairs) — the typo/OCR-noise dedup class:
    candidate generation is a linear (1+len)× variant expansion +
    ONE sort instead of the quadratic levenshtein cross join the
    oracle runs; exact O(len) verification kills collision and
    distance-2 false candidates, so the result equals the cross join
    bit-for-bit."""
    from .data.dedup import editdist1_pairs

    return editdist1_pairs(
        _read(sf_dir, "documents").select_columns(["text"]),
        col="text", prefix_len=12, min_len=4)


def q_jl_project(sf_dir: str):
    """Johnson–Lindenstrauss ±1 RANDOM PROJECTION of the embedding
    table to k=8 dimensions — the dimensionality-reduction sketch an
    ANN/LSH pipeline runs before bucketing (data/similarity.py
    jl_project). ZERO-shuffle integer matmul per batch against the
    deterministic splitmix-derived sign matrix (rebuilt in-task, a
    pure function of shape — nothing ships); elements fold to exact
    floor(float64(x)·1e6) micro-units so each coordinate is an int64
    dot product both engines reproduce bit-for-bit. Long layout here
    for the SQL oracle (the VALUES-inlined sign matrix); production
    uses out='list'."""
    from .data.similarity import jl_project

    return jl_project(_read(sf_dir, "embeddings"),
                      id_col="vec_id", col="embedding", k=8,
                      out="long")


def q_gram_matrix(sf_dir: str):
    """Exact integer GRAM matrix of the embedding table
    (data/similarity.py gram_matrix) — the d×d second-moment
    reduction PCA / whitening / linear probing start from, and the
    catalog's distributed linear-algebra class: output is
    DIMENSION-bounded (64·65/2 = 2080 cells), so every block folds
    to one QᵀQ int64 partial map-side (zero shuffle) and the driver
    sums O(blocks × d²) cells in Python ints (oracle side: HUGEINT).
    Elements ride the same exact floor(float64(x)·1e6) micro-unit
    fold as jl_project, so every cell is an integer both engines
    reproduce bit-for-bit."""
    from .data.similarity import gram_matrix

    return gram_matrix(_read(sf_dir, "embeddings"), col="embedding")


def q_theilsen_trend(sf_dir: str):
    """THEIL–SEN robust trend of daily revenue — the median of all
    pairwise slopes (y_b − y_a)/(x_b − x_a) over the per-day revenue
    series: the robust-regression counterpart to priority_trend's
    OLS (a single outlier day moves OLS arbitrarily; Theil–Sen
    tolerates ~29% contamination). Shape: map-side (day, cents)
    partials collapse the fact table before ONE calendar-bounded
    groupby; the driver then owns an O(span²) pairwise-slope kernel
    over the day-bounded series (span = observed days, ~2.4k for
    7 years → ~2.9M slopes as one numpy vector; a corpus spanning
    decades folds to weekly buckets first — same shape, span/7).
    The float finish is mirrored op-for-op in the SQL: slopes are
    IEEE divisions of exactly-representable int64 diffs, the two
    middle order statistics are selected by row_number (the middle
    VALUE is tie-order-independent), and the even-count finish is
    (lo + hi)/2 in both engines — no engine-internal median() with
    an unmirrorable op-tree is ever called. Output one row
    (ts_slope cents/day, n_days, n_pairs); zero-pair inputs return
    typed-empty to match the oracle's HAVING."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def day_partial(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        t = pa.table({
            "day_i": pa.array(od.astype("datetime64[D]")
                              .astype(np.int64), pa.int64()),
            "y": pa.array(np.floor(p * 100.0 + 0.5)
                          .astype(np.int64), pa.int64())})
        return t.group_by("day_i").aggregate([("y", "sum")]) \
            .rename_columns(["day_i", "y"])
    day_partial.__name__ = "theilsen_day_partial"

    agg = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_orderdate", "o_totalprice"])
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby("day_i").aggregate(Sum("y", alias_name="y")))
    empty = pa.table({"n_days": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64()),
                      "ts_slope": pa.array([], pa.float64())})
    if agg.num_rows < 2:
        return empty
    x = np.sort(agg.column("day_i").to_numpy(zero_copy_only=False))
    order = np.argsort(agg.column("day_i")
                       .to_numpy(zero_copy_only=False))
    y = agg.column("y").to_numpy(zero_copy_only=False)[order]
    iu, ju = np.triu_indices(x.size, 1)
    s = ((y[ju] - y[iu]).astype(np.float64)
         / (x[ju] - x[iu]).astype(np.float64))
    s.sort()
    n = s.size
    lo, hi = s[(n - 1) // 2], s[n // 2]
    return pa.table({
        "n_days": pa.array([int(x.size)], pa.int64()),
        "n_pairs": pa.array([int(n)], pa.int64()),
        "ts_slope": pa.array([(lo + hi) / 2], pa.float64())})


def q_kendall_daily(sf_dir: str):
    """KENDALL TAU-B concordance components between the daily view
    and purchase series — the PAIRWISE rank-correlation class:
    Spearman (spearman_qty_disc) ranks each variable once and
    correlates the ranks; Kendall instead counts CONCORDANT vs
    DISCORDANT day pairs, a fundamentally different kernel (pair
    enumeration / inversion counting) that is the standard
    tie-robust monotonicity test for coarse count series. The
    corpus never shuffles: the same map-side (day, views,
    purchases) partial pass + ONE day-bounded groupby leadlag_corr
    uses, gap-filled to the dense span (zero days are real (0,0)
    observations — mirrored in the SQL); the driver then owns an
    O(span²) numpy sign-pair kernel over the day-bounded series
    (~366² = 67k pairs per year; decades fold to weekly buckets
    first). Output is ALL-INTEGER — (n_days, nc, nd, tied_x,
    tied_y, tied_both), with tau-b = (nc−nd)/√((n0−n1)(n0−n2)) one
    float away for the consumer — so the cross-engine hash is exact
    by construction; the identity nc+nd+tied_x+tied_y−tied_both =
    n0 is asserted before emit. Zero-pair inputs return typed-empty
    to match the oracle's HAVING."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def day_partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        et = b.column("event_type")
        x = pc.equal(et, "view").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        y = pc.equal(et, "purchase").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = pa.table({"day": pa.array(day, pa.int64()),
                      "x": pa.array(x), "y": pa.array(y)})
        return t.group_by(["day"]).aggregate(
            [("x", "sum"), ("y", "sum")]) \
            .rename_columns(["day", "x", "y"])
    day_partial.__name__ = "kendall_day_partial"

    agg = collect_table(
        _read(sf_dir, "events")
        .select_columns(["ts", "event_type"])
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("x", alias_name="x"),
                                  Sum("y", alias_name="y")))
    names = ["n_days", "nc", "nd", "tied_x", "tied_y", "tied_both"]
    if agg.num_columns == 0 or agg.num_rows == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in names})
    day = agg.column("day").to_numpy(zero_copy_only=False)
    lo = int(day.min())
    span = int(day.max()) - lo + 1
    if span < 2:
        return pa.table({c: pa.array([], pa.int64()) for c in names})
    x = np.zeros(span, np.int64)
    y = np.zeros(span, np.int64)
    x[day - lo] = agg.column("x").to_numpy(zero_copy_only=False)
    y[day - lo] = agg.column("y").to_numpy(zero_copy_only=False)
    iu, ju = np.triu_indices(span, 1)
    dx = x[ju] - x[iu]
    dy = y[ju] - y[iu]
    nc = int((((dx > 0) & (dy > 0)) | ((dx < 0) & (dy < 0))).sum())
    nd = int((((dx > 0) & (dy < 0)) | ((dx < 0) & (dy > 0))).sum())
    tx = int((dx == 0).sum())
    ty = int((dy == 0).sum())
    tb = int(((dx == 0) & (dy == 0)).sum())
    n0 = span * (span - 1) // 2
    if nc + nd + tx + ty - tb != n0:
        raise AssertionError("kendall_daily pair partition broken")
    vals = [span, nc, nd, tx, ty, tb]
    return pa.table({c: pa.array([v], pa.int64())
                     for c, v in zip(names, vals)})


def q_max_streak(sf_dir: str):
    """Longest consecutive-day activity STREAK per user — the
    gaps-and-islands class (data/windows.py grouped_max_streak):
    the SQL island trick (day − ROW_NUMBER() constant within an
    island) needs two window passes + two groupbys; the engine
    folds each user's sorted distinct day list straight to its
    answer with ONE sort and a segment kernel on finish_sorted_runs
    (per-block distinct pairs shrink the stream first; interior
    users finish zero-shuffle; ≤2 edge runs per block re-kernel
    driver-side). All-integer output (user_id, streak)."""
    from .data.windows import grouped_max_streak

    def to_day(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "day_i": pa.array(ts.astype("datetime64[D]")
                              .astype(np.int64), pa.int64())})
    to_day.__name__ = "streak_user_day"

    t = grouped_max_streak(
        _read(sf_dir, "events").select_columns(["user_id", "ts"])
        .map_batches(to_day, batch_format="pyarrow"),
        key_col="user_id", day_col="day_i")
    return t.rename_columns(["user_id", "streak"])


def q_changepoint(sf_dir: str):
    """CUSUM CHANGEPOINT detection over daily revenue — the
    "when did the distribution shift" audit (a corpus drop, a
    pipeline regression, a seasonality break): the split point t*
    maximizing the scaled cumulative deviation |n·S_t − t·S_n| over
    the gap-filled daily series, the exact integer core of the
    classic CUSUM statistic max|S_t − (t/n)·S_n| (scaled by n so no
    division ever happens). ONE scan: map-side (day, cents)
    partials + ONE calendar-bounded groupby; the driver runs an
    O(span) prefix loop in PYTHON INTS (n·S_t overflows int64 at
    web scale — the oracle side is HUGEINT), tie → smallest t,
    exactly mirroring the SQL's ORDER BY adev DESC, t ASC LIMIT 1.
    Output one all-integer row (cp_day = last day of the left
    segment, cusum_abs, n_days); spans < 2 return typed-empty to
    match the oracle's WHERE t < n."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def day_partial(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        t = pa.table({
            "day_i": pa.array(od.astype("datetime64[D]")
                              .astype(np.int64), pa.int64()),
            "y": pa.array(np.floor(p * 100.0 + 0.5)
                          .astype(np.int64), pa.int64())})
        return t.group_by("day_i").aggregate([("y", "sum")]) \
            .rename_columns(["day_i", "y"])
    day_partial.__name__ = "cusum_day_partial"

    agg = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_orderdate", "o_totalprice"])
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby("day_i").aggregate(Sum("y", alias_name="y")))
    names = ["cp_day", "cusum_abs", "n_days"]
    if agg.num_columns == 0 or agg.num_rows == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in names})
    day = agg.column("day_i").to_numpy(zero_copy_only=False)
    lo = int(day.min())
    span = int(day.max()) - lo + 1
    if span < 2:
        return pa.table({c: pa.array([], pa.int64()) for c in names})
    y = np.zeros(span, np.int64)
    y[day - lo] = agg.column("y").to_numpy(zero_copy_only=False)
    tot = sum(int(v) for v in y)       # Python ints: no wrap
    best_a = best_t = -1
    st = 0
    for t in range(1, span):           # span-bounded driver loop
        st += int(y[t - 1])
        dev = span * st - t * tot
        a = -dev if dev < 0 else dev
        if a > best_a:
            best_a, best_t = a, t
    if best_a >= (1 << 63):
        raise ValueError("changepoint: |n·S_t − t·S_n| exceeds "
                         "int64 — rescale the unit (the oracle's "
                         "BIGINT cast would fail identically)")
    return pa.table({
        "cp_day": pa.array([lo + best_t - 1], pa.int64()),
        "cusum_abs": pa.array([best_a], pa.int64()),
        "n_days": pa.array([span], pa.int64())})


def q_trimmed_mean_qty(sf_dir: str):
    """5%-TRIMMED mean of lineitem quantity per return flag — the
    robust-aggregation completion (median, MAD, weighted median and
    IQR fences exist; the trimmed mean is the estimator quality
    pipelines use when they want mean-like efficiency with outlier
    resistance). EXACT integer form: emit (flag, trim_sum, trim_n)
    — the mean is one division away — so no float crosses engines.
    Trimming drops k = n·5//100 rows from EACH end of the sorted
    multiset (integer floor division, mirrored in the SQL; the kept
    MULTISET is deterministic under ties because equal values are
    interchangeable). Shape: per-block (flag, value, count)
    histogram partials collapse the fact table before the only
    shuffle, ONE domain-bounded groupby (|flags| × |values| ≤ 150
    rows) finishes, and the driver cumsums each flag's histogram to
    locate the two cut boundaries — value-domain-bounded, never
    corpus rows (the same bound grouped_quantiles accepts)."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    PCT = 5

    def hist_partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        t = pa.table({
            "flag": b.column("l_returnflag"),
            "v": pa.array(q.astype(np.int64), pa.int64()),
            "c": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(["flag", "v"]).aggregate([("c", "sum")]) \
            .rename_columns(["flag", "v", "c"])
    hist_partial.__name__ = "trim_hist_partial"

    agg = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_returnflag", "l_quantity"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["flag", "v"]).aggregate(Sum("c", alias_name="c")))
    names = ["l_returnflag", "trim_sum", "trim_n"]
    if agg.num_columns == 0 or agg.num_rows == 0:
        return pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "trim_sum": pa.array([], pa.int64()),
            "trim_n": pa.array([], pa.int64())})
    flags = np.asarray(agg.column("flag").to_pylist(), dtype=object)
    vs = agg.column("v").to_numpy(zero_copy_only=False)
    cs = agg.column("c").to_numpy(zero_copy_only=False)
    out_f, out_s, out_n = [], [], []
    for f in np.unique(flags):
        m = flags == f
        order = np.argsort(vs[m])
        v = vs[m][order]
        c = cs[m][order]
        n = sum(int(x) for x in c)           # Python ints
        k = n * PCT // 100
        total = sum(int(a) * int(b2) for a, b2 in zip(v, c))

        def cut(vals, cnts, kk):
            """Sum of the kk smallest rows of the histogram."""
            s = got = 0
            for a, b2 in zip(vals, cnts):
                take = min(int(b2), kk - got)
                if take <= 0:
                    break
                s += int(a) * take
                got += take
            return s
        lo_s = cut(v, c, k)
        hi_s = cut(v[::-1], c[::-1], k)
        out_f.append(f)
        out_s.append(total - lo_s - hi_s)
        out_n.append(n - 2 * k)
    return pa.table({
        "l_returnflag": pa.array(out_f, pa.string()),
        "trim_sum": pa.array(out_s, pa.int64()),
        "trim_n": pa.array(out_n, pa.int64())})


def q_ks_quantity(sf_dir: str):
    """Two-sample KOLMOGOROV–SMIRNOV distance between the quantity
    distributions of returned ('R') and accepted ('A') lineitems —
    the DISTRIBUTION-DRIFT audit class (did a source / split / time
    slice shift its value distribution?), as an EXACT integer: the
    KS statistic sup|F_A − F_R| scales to max over v of
    |n_R·C_A(v) − n_A·C_R(v)| (C = cumulative counts), so no
    division or float ever exists — the same scale-by-n trick as
    changepoint's CUSUM. Shape: per-block (value, c_a, c_r) count
    partials collapse the fact table before the only shuffle, ONE
    value-domain-bounded groupby finishes, and the driver cumsums
    ≤|domain| rows in PYTHON INTS (n_R·C_A overflows int64 at web
    scale — oracle: HUGEINT), tie → smallest value, mirroring
    ORDER BY dev DESC, v ASC LIMIT 1. Output one all-integer row
    (at_value, ks_num, n_a, n_r); an empty histogram returns
    typed-empty to match the oracle's LIMIT over zero rows."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def cnt_partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        fl = b.column("l_returnflag")
        ca = pc.equal(fl, "A").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cr = pc.equal(fl, "R").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = pa.table({
            "v": pa.array(q.astype(np.int64), pa.int64()),
            "ca": pa.array(ca), "cr": pa.array(cr)})
        t = t.filter(pc.or_(pc.equal(t.column("ca"), 1),
                            pc.equal(t.column("cr"), 1)))
        return t.group_by("v").aggregate(
            [("ca", "sum"), ("cr", "sum")]) \
            .rename_columns(["v", "ca", "cr"])
    cnt_partial.__name__ = "ks_count_partial"

    agg = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_returnflag", "l_quantity"])
        .map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("ca", alias_name="ca"),
                                Sum("cr", alias_name="cr")))
    names = ["at_value", "ks_num", "n_a", "n_r"]
    if agg.num_columns == 0 or agg.num_rows == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in names})
    order = np.argsort(agg.column("v").to_numpy(zero_copy_only=False))
    v = agg.column("v").to_numpy(zero_copy_only=False)[order]
    ca = agg.column("ca").to_numpy(zero_copy_only=False)[order]
    cr = agg.column("cr").to_numpy(zero_copy_only=False)[order]
    na = sum(int(x) for x in ca)             # Python ints: no wrap
    nr = sum(int(x) for x in cr)
    best_d = best_v = None
    cma = cmr = 0
    for vi, ai, ri in zip(v.tolist(), ca.tolist(), cr.tolist()):
        cma += int(ai)
        cmr += int(ri)
        d = nr * cma - na * cmr
        if d < 0:
            d = -d
        if best_d is None or d > best_d:
            best_d, best_v = d, vi
    if best_d >= (1 << 63):
        raise ValueError("ks_quantity: |n_R·C_A − n_A·C_R| exceeds "
                         "int64 — the oracle's BIGINT cast would "
                         "fail identically")
    return pa.table({
        "at_value": pa.array([best_v], pa.int64()),
        "ks_num": pa.array([best_d], pa.int64()),
        "n_a": pa.array([na], pa.int64()),
        "n_r": pa.array([nr], pa.int64())})


def q_mannwhitney_qty(sf_dir: str):
    """Mann–Whitney U (Wilcoxon rank-sum) components between the
    quantity distributions of accepted ('A') and returned ('R')
    lineitems — the RANK-based two-sample test, the nonparametric
    sibling of ks_quantity's CDF-based drift statistic and the exact
    core of ranking-metric AUC (AUC = U_A / (n_A·n_R)). Exactness
    rides DOUBLED MIDRANKS: a tie run of t values starting after s
    smaller rows has midrank s + (t+1)/2, so the doubled midrank
    2s + t + 1 is always integer, and the doubled rank-sum
    R2_A = Σ_v c_A(v)·(2·before(v) + t(v) + 1) plus the doubled
    U-statistic U2_A = R2_A − n_A·(n_A+1) stay integer end to end —
    no float exists anywhere. The tie-correction moment
    Σ(t³ − t) (the variance consumer's input) is emitted alongside.
    Shape: the same per-block (value, c_a, c_r) count partials as
    ks_quantity collapse the fact table before the ONLY shuffle, one
    value-domain-bounded groupby finishes, and the driver folds
    ≤|domain| rows in PYTHON INTS (the moments overflow int64 at web
    scale — oracle: HUGEINT), raising loudly if a final exceeds
    int64 exactly where the oracle's BIGINT cast would. Output one
    all-integer row (n_a, n_r, r2_a, tie_cube, u2_a); empty input
    returns typed-empty to match the oracle's aggregate over zero
    groups."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def cnt_partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        fl = b.column("l_returnflag")
        ca = pc.equal(fl, "A").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cr = pc.equal(fl, "R").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = pa.table({
            "v": pa.array(q.astype(np.int64), pa.int64()),
            "ca": pa.array(ca), "cr": pa.array(cr)})
        t = t.filter(pc.or_(pc.equal(t.column("ca"), 1),
                            pc.equal(t.column("cr"), 1)))
        return t.group_by("v").aggregate(
            [("ca", "sum"), ("cr", "sum")]) \
            .rename_columns(["v", "ca", "cr"])
    cnt_partial.__name__ = "mwu_count_partial"

    agg = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_returnflag", "l_quantity"])
        .map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("ca", alias_name="ca"),
                                Sum("cr", alias_name="cr")))
    names = ["n_a", "n_r", "r2_a", "tie_cube", "u2_a"]
    if agg.num_columns == 0 or agg.num_rows == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in names})
    order = np.argsort(agg.column("v").to_numpy(zero_copy_only=False))
    ca = agg.column("ca").to_numpy(zero_copy_only=False)[order]
    cr = agg.column("cr").to_numpy(zero_copy_only=False)[order]
    na = sum(int(x) for x in ca)             # Python ints: no wrap
    nr = sum(int(x) for x in cr)
    r2a = tie3 = 0
    before = 0                               # rows strictly smaller
    for ai, ri in zip(ca.tolist(), cr.tolist()):
        t = int(ai) + int(ri)
        r2a += int(ai) * (2 * before + t + 1)
        tie3 += t * t * t - t
        before += t
    u2a = r2a - na * (na + 1)
    for label, val in (("r2_a", r2a), ("tie_cube", tie3),
                       ("u2_a", u2a)):
        if not (-(1 << 63) <= val < (1 << 63)):
            raise ValueError(
                f"mannwhitney_qty: {label} exceeds int64 — the "
                "oracle's BIGINT cast would fail identically")
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_r": pa.array([nr], pa.int64()),
        "r2_a": pa.array([r2a], pa.int64()),
        "tie_cube": pa.array([tie3], pa.int64()),
        "u2_a": pa.array([u2a], pa.int64())})


def q_benford_digits(sf_dir: str):
    """Leading-significant-digit distribution of order totals — the
    BENFORD'S-LAW audit class (fabricated / synthetic monetary data
    betrays itself in the first-digit histogram; the consumer chi²s
    the counts against log10(1+1/d)). The derived key is extracted
    EXACTLY: prices fold to integer cents (round half-up, the
    catalog-wide money contract) and the leading digit comes from a
    ≤19-step vectorized integer-divide loop (no log10 float whose
    boundary ULPs could misclassify 999…9 vs 100…0). Shape:
    zero-shuffle — each block reduces to a ≤9-row (digit, n)
    bincount partial and the driver sums an O(blocks × 9) table;
    non-positive cents (absent in TPC-H prices, possible in a wild
    ledger) are counted under digit 0 rather than dropped so the
    audit can't silently lose rows. Output ≤10 all-integer rows
    (digit, n)."""
    from .io import collect_table

    def digit_partial(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
        d = np.maximum(cents, 0)             # digit 0 bucket for ≤0
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        counts = np.bincount(d, minlength=10)
        keep = np.flatnonzero(counts)
        return pa.table({
            "digit": pa.array(keep.astype(np.int64), pa.int64()),
            "n": pa.array(counts[keep].astype(np.int64),
                          pa.int64())})
    digit_partial.__name__ = "benford_digit_partial"

    summ = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_totalprice"])
        .map_batches(digit_partial, batch_format="pyarrow"))
    if summ.num_rows == 0:
        return pa.table({"digit": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    dg = summ.column("digit").to_numpy(zero_copy_only=False)
    cn = summ.column("n").to_numpy(zero_copy_only=False)
    tot = np.zeros(10, np.int64)
    np.add.at(tot, dg, cn)
    keep = np.flatnonzero(tot)
    return pa.table({
        "digit": pa.array(keep.astype(np.int64), pa.int64()),
        "n": pa.array(tot[keep], pa.int64())})


def q_floored_balance(sf_dir: str):
    """Per-user running CREDIT BALANCE floored at zero — purchases
    add cents, errors (chargebacks) subtract, and the balance can
    never go negative: b_t = max(b_{t−1} + d_t, 0), the ledger /
    inventory scan whose clamp looks inherently sequential. The
    engine folds it into two associative scans via
    b_t = S_t − min(0, M_t) (S = prefix sum, M = its running min) —
    see data/windows.py floored_running_balance for the
    one-sort + broadcast-(S, M)-carry + key-bounded-groupby shape.
    Output one all-integer row per active user: (user_id, final_bal,
    clip_n = steps where the floor bound, peak_bal = max running
    balance); order is (ts, event_id) — unique since event_id is.
    Oracle = the three-window SQL chain (prefix SUM, running MIN,
    1-PRECEDING MIN for the clip test) the engine never runs."""
    from .data.windows import floored_running_balance

    def fold(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        b = b.filter(pc.or_(pc.equal(et, "purchase"),
                            pc.equal(et, "error")))
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        sign = np.where(
            pc.equal(b.column("event_type"),
                     "purchase").to_numpy(zero_copy_only=False),
            np.int64(1), np.int64(-1))
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.timestamp("us"))
                      .cast(pa.int64()),
            "event_id": b.column("event_id"),
            "delta": pa.array(cents * sign, pa.int64())})
    fold.__name__ = "floored_balance_delta_fold"

    ev = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_id", "event_type",
                         "value"]) \
        .map_batches(fold, batch_format="pyarrow")
    return floored_running_balance(
        ev, key_col="user_id", order_cols=["ts_us", "event_id"],
        val_col="delta")


def q_hll_overlap(sf_dir: str):
    """HLL SET ALGEBRA — the audience-overlap question ("how many
    users both viewed and purchased?") answered with ZERO shuffle of
    user ids: per-audience registers are max-merged per block, the
    union audience is the register-wise max across the two sets, and
    |A∩B| follows by inclusion–exclusion on the consumer side. The
    hash-checked output is the PURE-INTEGER register state of all
    three sketches (aud ∈ {view, purchase, union}), never a float
    estimate — see data/sketch.py hll_audience_overlap."""
    from .data.sketch import hll_audience_overlap
    return hll_audience_overlap(
        _read(sf_dir, "events"), type_col="event_type",
        id_col="user_id", types=("view", "purchase"), p=12)


_DECAY_ANCHOR_DAY = 19753      # epoch day of DATE '2024-01-31'
_DECAY_HORIZON = 30            # days of history that still score


def q_decay_score(sf_dir: str):
    """Per-user EXPONENTIALLY TIME-DECAYED purchase score — the
    feature-store freshness aggregate (recent activity counts more,
    half-life = 1 day) computed EXACTLY: weight(age) = 2^(31 − age)
    for age ∈ [1, 30] days before the anchor date, so every weight
    is a power of two, score = Σ cents·2^(31−age) is pure integer,
    and the hash can never flake on a transcendental decay float.
    Shape: zero-shuffle per-block (user, score, n) partials + ONE
    user-bounded groupby. Contract: a user's score must fit int64
    (the oracle's BIGINT cast fails identically); a worker-side
    bound check (per-block per-user cents·2^31 < 2^63) raises before
    any silent wrap the final Sum could hide."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "purchase"))
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64()),
                             "n_purch": pa.array([], pa.int64())})
        ts_us = b.column("ts").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts_us // 86_400_000_000
        age = _DECAY_ANCHOR_DAY - day
        keep = (age >= 1) & (age <= _DECAY_HORIZON)
        uid = b.column("user_id").to_numpy(
            zero_copy_only=False)[keep]
        v = b.column("value").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        w = np.int64(1) << (31 - age[keep])
        users, inv = np.unique(uid, return_inverse=True)
        csum = np.zeros(users.size, np.int64)
        np.add.at(csum, inv, cents)
        if csum.size and int(csum.max()) >= (1 << 31):
            # cents·2^31 would pass 2^62 — the per-user score is
            # about to leave int64; the oracle's BIGINT cast fails
            # identically, so fail loudly in the worker
            raise ValueError(
                "decay_score: a user's in-block cents sum "
                f"({int(csum.max())}) overflows the int64 score "
                "contract")
        score = np.zeros(users.size, np.int64)
        np.add.at(score, inv, cents * w)
        n = np.bincount(inv, minlength=users.size).astype(np.int64)
        return pa.table({"user_id": pa.array(users, pa.int64()),
                         "score": pa.array(score, pa.int64()),
                         "n_purch": pa.array(n, pa.int64())})
    partial.__name__ = "decay_score_partial"

    out = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Sum("score", alias_name="decay_score"),
            Sum("n_purch", alias_name="n_purch"))
    return out


def q_exact_split(sf_dir: str):
    """EXACT-QUOTA stratified train/heldout split — per language,
    EXACTLY floor(n·80%) documents go to train (the
    largest-remainder determinism class), unlike hash_split's
    proportional-in-EXPECTATION bucketing: an eval set whose size
    must be exact (fixed benchmark budgets, matched-pair studies)
    can't tolerate binomial wobble. 'Random' yet deterministic
    order inside each stratum comes from the splitmix hash of
    doc_id (a bijection — no ties), so the assignment is stable
    under any partitioning and reproducible in SQL. Shape: pass 1
    sums per-block language counts into an O(blocks × langs)
    driver table (quota = n·8//10); pass 2 ranks each doc inside
    its language with windowed_cumsum's one-sort broadcast-base
    carry over the NARROW (lang, h, doc_id, 1) projection — text
    never shuffles — and a zero-shuffle map assigns
    rank ≤ quota → train. Output (doc_id, split) per document."""
    import ray

    from .data.sampling import _mix
    from .data.windows import windowed_cumsum
    from .io import collect_table

    def lang_counts(b: pa.Table) -> pa.Table:
        return b.select(["lang"]) \
            .group_by("lang").aggregate([([], "count_all")]) \
            .rename_columns(["lang", "c"])
    lang_counts.__name__ = "split_lang_counts"

    docs = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang"])
    summ = collect_table(docs.map_batches(
        lang_counts, batch_format="pyarrow"))
    if summ.num_columns == 0 or summ.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "split": pa.array([], pa.string())})
    quota: dict = {}
    for lang, c in zip(summ.column("lang").to_pylist(),
                       summ.column("c").to_numpy(
                           zero_copy_only=False)):
        quota[lang] = quota.get(lang, 0) + int(c)
    quota = {k: v * 8 // 10 for k, v in quota.items()}
    qh = ray.put(quota)

    def prep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": b.column("lang"),
            "h": pa.array(_mix(ids.astype(np.int64)), pa.uint64()),
            "doc_id": b.column("doc_id"),
            "one": pa.array(np.ones(b.num_rows, np.int64))})
    prep.__name__ = "split_hash_prep"

    ranked = windowed_cumsum(
        docs.map_batches(prep, batch_format="pyarrow"),
        key_col="lang", order_cols=["h", "doc_id"], val_col="one",
        out_col="rnk")

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "split": pa.array([], pa.string())})
        q = ray.get(qh)
        langs = b.column("lang").to_pylist()
        cut = np.fromiter((q[x] for x in langs), np.int64,
                          len(langs))
        rnk = b.column("rnk").to_numpy(zero_copy_only=False)
        split = np.where(rnk <= cut, "train", "heldout")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "split": pa.array(split.astype(object), pa.string())})
    assign.__name__ = "split_assign"

    return ranked.map_batches(assign, batch_format="pyarrow")


def q_overlap_exact(sf_dir: str):
    """EXACT audience overlap — |viewers|, |buyers|, |both| as true
    distinct counts: the ground-truth companion to hll_overlap's
    sketch (the same exact-confirm pairing as mg_heavy_hitters), and
    the audit a curator runs before trusting inclusion–exclusion at
    a new scale. Shape: per-block (user, saw_view, saw_purchase)
    flag partials collapse duplicates before the ONLY shuffle, one
    id-bounded groupby ORs the flags (Max), and a second zero-
    shuffle pass reduces to O(blocks) 3-int partials the driver
    sums. Output one all-integer row (n_a, n_b, n_both); the union
    and Jaccard are one subtraction/division away."""
    from ray.data.aggregate import Max

    from .io import collect_table

    def flag_partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        a = pc.equal(et, "view").cast(pa.int64())
        bb = pc.equal(et, "purchase").cast(pa.int64())
        t = pa.table({"user_id": b.column("user_id"),
                      "a": a, "b": bb})
        t = t.filter(pc.or_(pc.equal(t.column("a"), 1),
                            pc.equal(t.column("b"), 1)))
        return t.group_by("user_id").aggregate(
            [("a", "max"), ("b", "max")]) \
            .rename_columns(["user_id", "a", "b"])
    flag_partial.__name__ = "overlap_flag_partial"

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.schema.names:
            z = pa.array([], pa.int64())
            return pa.table({"n_a": z, "n_b": z, "n_both": z})
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_a": pa.array([int(a.sum())], pa.int64()),
            "n_b": pa.array([int(bb.sum())], pa.int64()),
            "n_both": pa.array([int((a * bb).sum())], pa.int64())})
    count_partial.__name__ = "overlap_count_partial"

    summ = collect_table(
        _read(sf_dir, "events")
        .select_columns(["user_id", "event_type"])
        .map_batches(flag_partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Max("a", alias_name="a"),
                                      Max("b", alias_name="b"))
        .map_batches(count_partial, batch_format="pyarrow"))
    if summ.num_columns == 0 or summ.num_rows == 0:
        z = pa.array([0], pa.int64())
        return pa.table({"n_a": z, "n_b": z, "n_both": z})
    return pa.table({
        "n_a": pa.array([int(summ.column("n_a").to_numpy(
            zero_copy_only=False).sum())], pa.int64()),
        "n_b": pa.array([int(summ.column("n_b").to_numpy(
            zero_copy_only=False).sum())], pa.int64()),
        "n_both": pa.array([int(summ.column("n_both").to_numpy(
            zero_copy_only=False).sum())], pa.int64())})


def q_grid_interp(sf_dir: str):
    """Daily-grid LINEAR RESAMPLING of each user's purchase-value
    series — the sensor/price-series "value at every midnight"
    operator (data/windows.py grid_interpolate): for each grid
    instant between a user's first and last purchase, the exact
    integer fraction num/den of the linear interpolation between
    the surrounding observations. The scalable shape is PAIR-LOCAL
    (every grid point belongs to exactly one adjacent-observation
    pair), so one sort + in-block numpy expansion covers everything
    except the ≤1 seam pair per block boundary per user, which the
    driver reconstructs from O(blocks) edge summaries. Output
    (user_id, day, num, den) all-integer; (user, µs) uniqueness is
    the contract (duplicates raise)."""
    from .data.windows import grid_interpolate

    def fold(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "purchase"))
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "t": b.column("ts").cast(pa.timestamp("us"))
                  .cast(pa.int64()),
            "v": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    fold.__name__ = "grid_interp_fold"

    ev = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_type", "value"]) \
        .map_batches(fold, batch_format="pyarrow")
    return grid_interpolate(ev, key_col="user_id", t_col="t",
                            val_col="v")


def q_feature_hash(sf_dir: str):
    """HASHING-TRICK feature fold (HashingVectorizer class) — the
    fixed-width sparse text featurizer every no-vocab training
    pipeline uses: each token hashes to one of 256 buckets
    (md5(term) % 256, the CMS column hash) with a ±1 sign from an
    independent hash (md5(term + '#s') parity), and the corpus
    folds to per-bucket (signed_sum, n_tokens) totals — collisions,
    sign cancellations and all, exactly as the trainer's
    preprocessor would see them. Shape: ZERO shuffle — the existing
    per-block (term, cnt) vocab-bounded partials (text never
    leaves the scan) map through a distinct-term md5 fold (Python
    only over DISTINCT terms, never per occurrence) to ≤256-row
    bucket partials, and the driver sums O(blocks × 256). Output
    ≤256 all-integer rows (bucket, signed_sum, n_tokens)."""
    import hashlib

    from .data.sketch import term_count_partials
    from .io import collect_table

    W = 256

    def bucketize(b: pa.Table) -> pa.Table:
        names = ["bucket", "signed_sum", "n_tokens"]
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in names})
        terms = b.column("term").to_pylist()
        cnts = b.column("cnt").to_numpy(zero_copy_only=False)
        ssum = np.zeros(W, np.int64)
        ntok = np.zeros(W, np.int64)
        for t, c in zip(terms, cnts):
            tb = t.encode("utf-8", "surrogatepass")
            bk = int(hashlib.md5(tb).hexdigest()[:8], 16) % W
            sg = 1 if int(hashlib.md5(tb + b"#s").hexdigest()[:8],
                          16) % 2 == 0 else -1
            ssum[bk] += sg * int(c)
            ntok[bk] += int(c)
        nz = np.flatnonzero(ntok)
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64), pa.int64()),
            "signed_sum": pa.array(ssum[nz], pa.int64()),
            "n_tokens": pa.array(ntok[nz], pa.int64())})
    bucketize.__name__ = "feature_hash_bucketize"

    summ = collect_table(
        term_count_partials(_read(sf_dir, "documents"))
        .map_batches(bucketize, batch_format="pyarrow"))
    names = ["bucket", "signed_sum", "n_tokens"]
    if summ.num_columns == 0 or summ.num_rows == 0:
        return pa.table({c: pa.array([], pa.int64())
                         for c in names})
    ssum = np.zeros(W, np.int64)
    ntok = np.zeros(W, np.int64)
    np.add.at(ssum,
              summ.column("bucket").to_numpy(zero_copy_only=False),
              summ.column("signed_sum").to_numpy(
                  zero_copy_only=False))
    np.add.at(ntok,
              summ.column("bucket").to_numpy(zero_copy_only=False),
              summ.column("n_tokens").to_numpy(
                  zero_copy_only=False))
    nz = np.flatnonzero(ntok)
    return pa.table({
        "bucket": pa.array(nz.astype(np.int64), pa.int64()),
        "signed_sum": pa.array(ssum[nz], pa.int64()),
        "n_tokens": pa.array(ntok[nz], pa.int64())})


def q_record_highs(sf_dir: str):
    """Per-user PERSONAL-RECORD scan over purchases — how many times
    did a user's purchase set a new personal maximum, and what is
    the record now? (price records / personal bests / peak-load
    counters — the running-MAX member of the scan-carry family:
    sum = running_total, clamp = floored_balance, fill = locf_fill.)
    See data/windows.py record_high_scan: ONE sort, segmented
    running max per block, single-value (running max) carry across
    seams, ONE key-bounded groupby — both outputs merge
    associatively so no last-segment marking exists. Output one
    all-integer row per purchasing user (user_id, n_records,
    max_cents); the first purchase is always a record."""
    from .data.windows import record_high_scan

    def fold(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "purchase"))
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.timestamp("us"))
                      .cast(pa.int64()),
            "event_id": b.column("event_id"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    fold.__name__ = "record_purchase_fold"

    ev = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_id", "event_type",
                         "value"]) \
        .map_batches(fold, batch_format="pyarrow")
    out = record_high_scan(
        ev, key_col="user_id", order_cols=["ts_us", "event_id"],
        val_col="cents")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "n_records": b.column("n_records"),
            "max_cents": b.column("max_val")})
    rename.__name__ = "record_rename"
    return out.map_batches(rename, batch_format="pyarrow")


def q_daily_ohlc(sf_dir: str):
    """Daily OPEN-HIGH-LOW-CLOSE candlesticks of purchase values —
    the ORDERED-ARG aggregation class (FIRST/LAST by time per group
    alongside MIN/MAX) every metrics store and financial rollup
    needs, computed with ZERO sort and ZERO shuffle: per-block
    per-day partials carry (first-key, open, last-key, close, lo,
    hi, n) and merge ASSOCIATIVELY — open follows the smaller
    (ts, event_id), close the larger, lo/hi/n fold — so the driver
    combines an O(blocks × days) summary table. In-block the
    ordered-arg is one lexsort + reduceat, never per-row Python.
    Ordering key is (ts, event_id) — unique, so the result is
    deterministic; the oracle packs it into ts_us·2^40 + event_id
    (HUGEINT) for arg_min/arg_max, and the engine raises if an
    event_id ever reaches 2^40 (the pack would collide exactly
    where the engine's tuple compare would not). Output all-integer
    (day, open_cents, high_cents, low_cents, close_cents,
    n_trades)."""
    from .io import collect_table

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "purchase"))
        names = ["day", "o_ts", "o_id", "open", "c_ts", "c_id",
                 "close", "lo", "hi", "n"]
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in names})
        ts_us = b.column("ts").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        if eid.size and (int(eid.max()) >= (1 << 40)
                         or int(eid.min()) < 0):
            raise ValueError(
                "daily_ohlc: event_id outside [0, 2^40) — the "
                "oracle's ts·2^40+id pack would collide")
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        day = ts_us // 86_400_000_000
        order = np.lexsort((eid, ts_us, day))
        day, ts_us, eid, cents = (day[order], ts_us[order],
                                  eid[order], cents[order])
        starts = np.flatnonzero(np.concatenate(
            [[True], day[1:] != day[:-1]]))
        ends = np.append(starts[1:], day.size) - 1
        return pa.table({
            "day": pa.array(day[starts], pa.int64()),
            "o_ts": pa.array(ts_us[starts], pa.int64()),
            "o_id": pa.array(eid[starts], pa.int64()),
            "open": pa.array(cents[starts], pa.int64()),
            "c_ts": pa.array(ts_us[ends], pa.int64()),
            "c_id": pa.array(eid[ends], pa.int64()),
            "close": pa.array(cents[ends], pa.int64()),
            "lo": pa.array(np.minimum.reduceat(cents, starts),
                           pa.int64()),
            "hi": pa.array(np.maximum.reduceat(cents, starts),
                           pa.int64()),
            "n": pa.array(
                np.diff(np.append(starts, day.size)).astype(
                    np.int64), pa.int64())})
    partial.__name__ = "ohlc_day_partial"

    summ = collect_table(
        _read(sf_dir, "events")
        .select_columns(["ts", "event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"))
    names = ["day", "open_cents", "high_cents", "low_cents",
             "close_cents", "n_trades"]
    if summ.num_columns == 0 or summ.num_rows == 0:
        return pa.table({c: pa.array([], pa.int64())
                         for c in names})
    merged: dict = {}
    cols = [summ.column(c).to_numpy(zero_copy_only=False)
            for c in ("day", "o_ts", "o_id", "open", "c_ts", "c_id",
                      "close", "lo", "hi", "n")]
    for d, ots, oid, op, cts, cid, cl, lo, hi, n in zip(*cols):
        d = int(d)
        row = merged.get(d)
        if row is None:
            merged[d] = [(int(ots), int(oid)), int(op),
                         (int(cts), int(cid)), int(cl),
                         int(lo), int(hi), int(n)]
        else:
            if (int(ots), int(oid)) < row[0]:
                row[0], row[1] = (int(ots), int(oid)), int(op)
            if (int(cts), int(cid)) > row[2]:
                row[2], row[3] = (int(cts), int(cid)), int(cl)
            row[4] = min(row[4], int(lo))
            row[5] = max(row[5], int(hi))
            row[6] += int(n)
    days = sorted(merged)
    return pa.table({
        "day": pa.array(days, pa.int64()),
        "open_cents": pa.array([merged[d][1] for d in days],
                               pa.int64()),
        "high_cents": pa.array([merged[d][5] for d in days],
                               pa.int64()),
        "low_cents": pa.array([merged[d][4] for d in days],
                              pa.int64()),
        "close_cents": pa.array([merged[d][3] for d in days],
                                pa.int64()),
        "n_trades": pa.array([merged[d][6] for d in days],
                             pa.int64())})


def q_locf_fill(sf_dir: str):
    """LAST-OBSERVATION-CARRIED-FORWARD — for EVERY event, the cents
    value of the user's most recent purchase at or before it (0
    before the first purchase): the ``last_value(x IGNORE NULLS)``
    window class (sensor gap fill, sparse feature carry) that many
    engines lack and naive ports emulate with a quadratic self-join.
    See data/windows.py windowed_locf for the one-sort +
    single-value-carry shape; order is (ts, event_id), unique since
    event_id is. Output one all-integer row per event
    (event_id, last_purchase_cents)."""
    from .data.windows import windowed_locf

    def fold(b: pa.Table) -> pa.Table:
        is_p = pc.equal(b.column("event_type"),
                        "purchase").to_numpy(zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.timestamp("us"))
                      .cast(pa.int64()),
            "event_id": b.column("event_id"),
            "pc": pa.array(np.where(is_p, cents, 0),
                           pa.int64(), mask=~is_p)})
    fold.__name__ = "locf_purchase_fold"

    ev = _read(sf_dir, "events") \
        .select_columns(["user_id", "ts", "event_id", "event_type",
                         "value"]) \
        .map_batches(fold, batch_format="pyarrow")
    filled = windowed_locf(
        ev, key_col="user_id", order_cols=["ts_us", "event_id"],
        val_col="pc", out_col="last_purchase_cents", default=0)

    def project(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "last_purchase_cents"])
    project.__name__ = "locf_project"
    return filled.map_batches(project, batch_format="pyarrow")


def q_value_mad(sf_dir: str):
    """Per-group MEDIAN ABSOLUTE DEVIATION of event value — the
    robust-statistics dispersion pass (outlier-resistant spread, the
    robust alternative to stddev for quality thresholds) and the
    catalog's TWO-PASS iterative-statistic representative: MAD =
    median(|x − median(x)|) needs the pass-1 result before pass 2 can
    start, so no single-shuffle plan exists. Exactness rides integer
    unit-doubling twice: pass 1 (data/rank.py grouped_median_cont)
    yields med2 = 2·median(cents) (integer — the interpolated median
    is the mean of the two middle order statistics); the deviation
    stream e = |2·cents − med2| = 2·|cents − median| is then integer,
    and pass 2's doubled median of e is exactly 4·MAD. The pass-1
    result is a |group|-bounded broadcast dict (5 event types);
    pass 2 re-reads the same pruned 2-column scan rather than
    materializing the cents stream — at corpus scale a second pruned
    scan is cheaper than holding the narrowed fact table in the
    object store (both passes are histogram partials + ONE narrow
    (key, value)-bounded groupby; value never sorts globally).
    Output (event_type, mad4, med2) all-integer."""
    from .data.rank import grouped_median_cont

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    to_cents.__name__ = "mad_value_cents"

    def cents_ds():
        return _read(sf_dir, "events") \
            .select_columns(["event_type", "value"]) \
            .map_batches(to_cents, batch_format="pyarrow")

    med = grouped_median_cont(cents_ds(), "event_type", "cents")
    if len(med) == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "mad4": pa.array([], pa.int64()),
                         "med2": pa.array([], pa.int64())})
    med2_of = dict(zip(med["event_type"], med["med2"].astype(int)))

    def deviations(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("event_type").to_pylist(),
                        dtype=object)
        c = b.column("cents").to_numpy(zero_copy_only=False)
        m2 = np.fromiter((med2_of[k] for k in ks), np.int64, ks.size)
        return pa.table({
            "event_type": b.column("event_type"),
            "e": pa.array(np.abs(2 * c - m2), pa.int64())})
    deviations.__name__ = "mad_abs_deviation"

    mad = grouped_median_cont(
        cents_ds().map_batches(deviations, batch_format="pyarrow"),
        "event_type", "e").rename(columns={"med2": "mad4"})
    out = mad.merge(med, on="event_type")
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "mad4": pa.array(out["mad4"].astype(np.int64), pa.int64()),
        "med2": pa.array(out["med2"].astype(np.int64), pa.int64())})


def q_top_orders_per_customer(sf_dir: str):
    """Grouped top-k ROW selection over FACT-SCALE groups — each
    customer's 2 highest-value orders (data/rank.py
    grouped_topk_rows): the ROW_NUMBER <= k class where the PARTITION
    key count grows with the corpus, so neither a bounded-key
    broadcast (top_per_lang) nor per-group tasks apply. ONE sort;
    interior keys finish in-block; hot keys contribute k rows per
    block they touch, never their row count."""
    from .data.rank import grouped_topk_rows

    def to_cents(b: pa.Table) -> pa.Table:
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "price_cents": pa.array(
                np.floor(p * 100.0 + 0.5).astype(np.int64),
                pa.int64())})
    to_cents.__name__ = "top_orders_cents"

    ds = _read(sf_dir, "orders") \
        .select_columns(["o_custkey", "o_orderkey", "o_totalprice"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    return grouped_topk_rows(ds, key_col="o_custkey",
                             order_col="price_cents",
                             tie_col="o_orderkey", k=2,
                             descending=True)


def q_custdist(sf_dir: str):
    """TPC-H Q13 shape — customer distribution by order count: the
    two-level aggregation (groupby OF a groupby) with a LEFT-JOIN zero
    group. No join runs at all: the join's only contribution is the
    customers with NO qualifying order, and that group's size is
    ``|customer| - |custkeys present in the filtered orders|`` — the
    customer table contributes exactly one scalar (its row count, a
    parquet-footer metadata read). Level 1: orders filter map-side
    (the Q13 join predicate, here priority = 1-URGENT) and reduce to
    per-block (custkey, count) partials, so only narrow int64 pairs
    move through the ONE custkey-bounded groupby. Level 2: the
    per-customer counts reduce map-side again to (c_count, partial)
    pairs into a groupby bounded by max-orders-per-customer — tiny.
    The zero row is appended driver-side on that bounded table. Every
    number is an exact integer count; the output is
    max-count-bounded, never customer-bounded."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def per_cust_partial(b: pa.Table) -> pa.Table:
        mask = pc.equal(b.column("o_orderpriority"), "1-URGENT")
        t = pa.table({"ck": b.filter(mask).column("o_custkey")})
        g = t.group_by("ck").aggregate([("ck", "count")])
        return g.rename_columns(["ck", "c_count"])
    per_cust_partial.__name__ = "custdist_per_cust_partial"

    def dist_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"c_count": b.column("c_count")})
        g = t.group_by("c_count").aggregate([("c_count", "count")])
        return g.rename_columns(["c_count", "custdist"])
    dist_partial.__name__ = "custdist_dist_partial"

    dist = collect_table(
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_orderpriority"])
        .map_batches(per_cust_partial, batch_format="pyarrow")
        .groupby("ck").aggregate(Sum("c_count", alias_name="c_count"))
        .map_batches(dist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist")))

    n_customers = _read(sf_dir, "customer").count()
    counts = dist.column("c_count").to_numpy(zero_copy_only=False) \
        if dist.num_rows else np.empty(0, np.int64)
    sizes = dist.column("custdist").to_numpy(zero_copy_only=False) \
        if dist.num_rows else np.empty(0, np.int64)
    zero = n_customers - int(sizes.sum())
    if zero < 0:
        raise ValueError("orders reference custkeys missing from "
                         "customer — FK contract violated")
    if zero > 0:
        counts = np.concatenate([counts, [0]])
        sizes = np.concatenate([sizes, [zero]])
    return pa.table({"c_count": pa.array(counts, pa.int64()),
                     "custdist": pa.array(sizes, pa.int64())})


# --- round-5 TPC-H widening: Q6/Q14/Q17/Q4/Q10/Q15/Q19 shapes + HHI ------

def _day(np_dates):
    return np_dates.astype("datetime64[D]").astype(np.int64)


def _dayc(s: str) -> int:
    return int(np.datetime64(s).astype("datetime64[D]")
               .astype(np.int64))


def _ep_cents(b: pa.Table) -> np.ndarray:
    p = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
    return np.floor(p * 100.0 + 0.5).astype(np.int64)


def _disc_pct(b: pa.Table) -> np.ndarray:
    d = b.column("l_discount").to_numpy(zero_copy_only=False)
    return np.floor(d * 100.0 + 0.5).astype(np.int64)


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — the band-predicate forecast scan: revenue
    delta from dropping discounts in a band (shipdate year, discount
    band, small quantities). The simplest possible scale shape and
    deliberately kept that way: the predicate and the Σ price·disc
    product are ONE vectorized zero-shuffle pass; each block emits a
    single (units, n) row and O(blocks) scalars collect. Exact by
    units: cents·pct, no floats anywhere."""
    from .io import collect_table

    lo, hi = _dayc("1996-01-01"), _dayc("1997-01-01")

    def partial(b: pa.Table) -> pa.Table:
        day = _day(b.column("l_shipdate")
                   .to_numpy(zero_copy_only=False))
        qty = np.floor(b.column("l_quantity")
                       .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        dp = _disc_pct(b)
        m = ((day >= lo) & (day < hi) & (dp >= 3) & (dp <= 6)
             & (qty < 24))
        units = int((_ep_cents(b)[m] * dp[m]).sum())
        return pa.table({"u": pa.array([units], pa.int64()),
                         "n": pa.array([int(m.sum())], pa.int64())})
    partial.__name__ = "q6_partial"

    t = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_shipdate", "l_quantity", "l_discount",
                         "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow"))
    u = int(t.column("u").to_numpy(zero_copy_only=False).sum()) \
        if "u" in t.schema.names else 0
    n = int(t.column("n").to_numpy(zero_copy_only=False).sum()) \
        if "n" in t.schema.names else 0
    return pa.table({"revenue_units": pa.array([u], pa.int64()),
                     "n_rows": pa.array([n], pa.int64())})


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — promotion effect: the CASE-numerator ratio
    (promo revenue / total revenue for one month) as an EXACT integer
    pair. The part dim folds to a sorted promo-partkey array and
    broadcasts (|part|-bounded; the partitioned semi-join hatch of
    orders_with_returns applies beyond driver memory); the scan is
    zero-shuffle with O(blocks) two-int rows collected. The ratio
    itself never materializes as a float — consumers divide."""
    import ray

    from .io import collect_table

    part = collect_table(
        _read(sf_dir, "part").select_columns(["p_partkey", "p_type"]))
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64) if "p_partkey" in part.schema.names \
        else np.empty(0, np.int64)
    is_promo = np.asarray(
        [t == "PROMO" for t in part.column("p_type").to_pylist()]) \
        if part.num_rows else np.empty(0, bool)
    promo = np.sort(pk[is_promo])
    handle = ray.put(promo)
    lo, hi = _dayc("1996-03-01"), _dayc("1996-04-01")

    def partial(b: pa.Table) -> pa.Table:
        pr = ray.get(handle)
        day = _day(b.column("l_shipdate")
                   .to_numpy(zero_copy_only=False))
        m = (day >= lo) & (day < hi)
        kept = b.filter(pa.array(m))
        rev = _ep_cents(kept) * (100 - _disc_pct(kept))
        lpk = kept.column("l_partkey").to_numpy(zero_copy_only=False)
        if pr.size:
            pos = np.minimum(np.searchsorted(pr, lpk), pr.size - 1)
            pm = pr[pos] == lpk
        else:
            pm = np.zeros(lpk.size, bool)
        return pa.table({
            "pn": pa.array([int(rev[pm].sum())], pa.int64()),
            "tn": pa.array([int(rev.sum())], pa.int64())})
    partial.__name__ = "q14_partial"

    t = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_partkey", "l_shipdate",
                         "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow"))
    pn = int(t.column("pn").to_numpy(zero_copy_only=False).sum()) \
        if "pn" in t.schema.names else 0
    tn = int(t.column("tn").to_numpy(zero_copy_only=False).sum()) \
        if "tn" in t.schema.names else 0
    return pa.table({"promo_units": pa.array([pn], pa.int64()),
                     "total_units": pa.array([tn], pa.int64())})


_Q8_TARGET_NATION = 3   # numerator supplier nation (suppliers at both SFs)
_Q8_CUST_REGION = 1     # AMERICA — the market being measured


def q_market_share(sf_dir: str, num_partitions: int = 8):
    """TPC-H Q8 shape — national market share: the fraction of one
    region's revenue for one part type that suppliers of one nation
    captured, per order year, as an EXACT integer (num, den) pair —
    the ratio never floats (the promo_revenue rule; consumers
    divide). The 8-way textbook join collapses to ONE sentinel sort
    plus dim broadcasts: part folds to a sorted
    type-match partkey array, supplier to sorted suppkey + target-
    nation flag, nation×region to the region's nation set, customer
    to a sorted region-member custkey array (all dim-bounded; beyond
    driver memory each fold becomes one more partitioned narrow join
    — the revenue_by_nation hatch). Lineitem pre-aggregates per
    block to (orderkey, tgt, rev_cents) integer partials BEFORE the
    sentinel sort, orders fold to window+region (orderkey, yr)
    sentinel rows, and the year totals come out of the zero-shuffle
    segment kernel (see inline comment — ninth rewrite in the
    one-pass family). Unlike Q7 the denominator spans ALL supplier
    nations, so a lineitem suppkey missing from the supplier dim
    would silently drop revenue — that FK violation raises
    instead."""
    import ray

    from .data.segments import finish_sorted_runs
    from .io import collect_table

    tgt, reg = _Q8_TARGET_NATION, _Q8_CUST_REGION

    nat = collect_table(_read(sf_dir, "nation")
                        .select_columns(["n_nationkey", "n_regionkey"]))
    if "n_nationkey" in nat.schema.names and nat.num_rows:
        nk = nat.column("n_nationkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        rk = nat.column("n_regionkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        reg_nations = nk[rk == reg]
    else:
        reg_nations = np.empty(0, np.int64)

    part = collect_table(_read(sf_dir, "part")
                         .select_columns(["p_partkey", "p_type"]))
    if "p_partkey" in part.schema.names and part.num_rows:
        pk = part.column("p_partkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.asarray([t == "ECONOMY"
                        for t in part.column("p_type").to_pylist()])
        econ = np.sort(pk[m])
    else:
        econ = np.empty(0, np.int64)

    supp = collect_table(_read(sf_dir, "supplier")
                         .select_columns(["s_suppkey", "s_nationkey"]))
    if "s_suppkey" in supp.schema.names and supp.num_rows:
        sk = supp.column("s_suppkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        snk = supp.column("s_nationkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(sk)
        s_keys, s_tgt = sk[o], snk[o] == tgt
    else:
        s_keys = np.empty(0, np.int64)
        s_tgt = np.empty(0, bool)

    cust = collect_table(_read(sf_dir, "customer")
                         .select_columns(["c_custkey", "c_nationkey"]))
    if "c_custkey" in cust.schema.names and cust.num_rows:
        ck = cust.column("c_custkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cnk = cust.column("c_nationkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        c_keys = np.sort(ck[np.isin(cnk, reg_nations)])
    else:
        c_keys = np.empty(0, np.int64)

    empty = pa.table({"yr": pa.array([], pa.int64()),
                      "num_cents": pa.array([], pa.int64()),
                      "den_cents": pa.array([], pa.int64())})
    # Short-circuit the no-revenue-possible regimes before the fact
    # scan: an empty type-match or region customer set, or zero-row
    # fact tables (count() here is parquet-metadata-only, no scan) —
    # nothing could survive the folds, so skip the sort entirely.
    if (econ.size == 0 or c_keys.size == 0
            or _read(sf_dir, "lineitem").count() == 0
            or _read(sf_dir, "orders").count() == 0):
        return empty

    handle = ray.put((econ, s_keys, s_tgt, c_keys))
    lo, hi = _dayc("1996-01-01"), _dayc("1998-01-01")

    def ord_fold(b: pa.Table) -> pa.Table:
        _, _, _, cks = ray.get(handle)
        day = _day(b.column("o_orderdate")
                   .to_numpy(zero_copy_only=False))
        ock = b.column("o_custkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        m = (day >= lo) & (day < hi)
        if cks.size:
            pos = np.minimum(np.searchsorted(cks, ock), cks.size - 1)
            m &= cks[pos] == ock
        else:
            m[:] = False
        kept = b.filter(pa.array(m))
        yr = kept.column("o_orderdate") \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        n = kept.num_rows
        return pa.table({"ok": kept.column("o_orderkey"),
                         "fl": pa.array(np.full(n, -1, np.int64)),
                         "tg": pa.array(yr, pa.int64()),
                         "rev": pa.array(np.zeros(n, np.int64))})
    ord_fold.__name__ = "q8_order_fold"

    def li_fold(bt: pa.Table) -> pa.Table:
        econ_, sks, stgt, _ = ray.get(handle)
        lpk = bt.column("l_partkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if econ_.size:
            pos = np.minimum(np.searchsorted(econ_, lpk),
                             econ_.size - 1)
            m = econ_[pos] == lpk
        else:
            m = np.zeros(lpk.size, bool)
        kept = bt.filter(pa.array(m))
        lsk = kept.column("l_suppkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if sks.size:
            pos = np.minimum(np.searchsorted(sks, lsk), sks.size - 1)
            ok = sks[pos] == lsk
            tflag = stgt[pos] & ok
        else:
            ok = np.zeros(lsk.size, bool)
            tflag = ok
        if not bool(ok.all()):
            raise ValueError(
                "market_share: l_suppkey missing from supplier dim "
                "— denominator would silently lose revenue")
        rev = _ep_cents(kept) * (100 - _disc_pct(kept))
        t = pa.table({"ok": kept.column("l_orderkey"),
                      "tg": pa.array(tflag.astype(np.int64),
                                     pa.int64()),
                      "rev": pa.array(rev, pa.int64())})
        g = t.group_by(["ok", "tg"]) \
            .aggregate([("rev", "sum")]) \
            .rename_columns(["ok", "tg", "rev"])
        return pa.table({
            "ok": g.column("ok"),
            "fl": pa.array(np.zeros(g.num_rows, np.int64)),
            "tg": g.column("tg"),
            "rev": g.column("rev")})
    li_fold.__name__ = "q8_lineitem_fold"

    # ONE-PASS sentinel shape (round 5; data/segments.py
    # finish_sorted_runs owns the interior/edge plumbing): the former
    # partitioned fact-fact hash join collapses into ONE sort on
    # (ok, fl) — window+region orders lead their runs as (ok, −1,
    # year) sentinels (the tg slot carries the year; rev 0), part-
    # filtered lineitem pre-reduces per block to (ok, 0, tgt, rev)
    # partials, and the segment kernel broadcasts each run's year
    # over its fact rows and emits ≤|window-years|-row (yr, num, den)
    # partials per block. Sentinel-less runs are orders outside the
    # window/region and skip silently (Q4 rule). ``num_partitions``
    # is kept for signature stability (bench/pytest callers).
    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_partkey", "l_suppkey",
                         "l_extendedprice", "l_discount"]) \
        .map_batches(li_fold, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_custkey",
                                "o_orderdate"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    def kernel(cols) -> pa.Table:
        """(year, num, den) revenue partials over a (ok, fl)-sorted
        slice of COMPLETE runs; the sentinel's tg slot carries the
        order year, fact rows' tg slots carry the target-nation
        supplier flag. Sentinel-less runs skip silently."""
        ok, fl = cols["ok"], cols["fl"]
        tg, rev = cols["tg"], cols["rev"]
        if ok.size == 0:
            return empty
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        rid = np.cumsum(new) - 1
        has_sent = fl[rstart] == -1
        yr_row = tg[rstart][rid]
        fact = (fl != -1) & has_sent[rid]
        if not bool(fact.any()):
            return empty
        ys, inv = np.unique(yr_row[fact], return_inverse=True)
        den = np.zeros(ys.size, np.int64)
        num = np.zeros(ys.size, np.int64)
        rv = rev[fact]
        np.add.at(den, inv, rv)
        np.add.at(num, inv, rv * tg[fact])
        return pa.table({"yr": pa.array(ys, pa.int64()),
                         "num_cents": pa.array(num, pa.int64()),
                         "den_cents": pa.array(den, pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl", "tg", "rev"], kernel=kernel,
        empty_partial=empty)
    yr_ = partial.column("yr").to_numpy(zero_copy_only=False)
    nm = partial.column("num_cents").to_numpy(zero_copy_only=False)
    dn = partial.column("den_cents").to_numpy(zero_copy_only=False)
    ys, inv = np.unique(yr_, return_inverse=True)
    num = np.zeros(ys.size, np.int64)
    den = np.zeros(ys.size, np.int64)
    np.add.at(num, inv, nm)
    np.add.at(den, inv, dn)
    return pa.table({"yr": pa.array(ys, pa.int64()),
                     "num_cents": pa.array(num, pa.int64()),
                     "den_cents": pa.array(den, pa.int64())})


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — small-quantity-order revenue: lineitems
    whose quantity is below 20% of their part's average quantity.
    The textbook correlated scalar subquery decorrelates to ONE
    partkey-bounded groupby of (sum qty, n) block partials; the
    threshold test is then EXACT INTEGER — qty < 0.2·avg ⟺
    5·n·qty < sum_qty (quantities are integral by TPC-H construction,
    folded map-side) — so no float threshold ever exists. The
    per-part table broadcasts (|part|-bounded, standard dim-hatch
    class) and the final pass is zero-shuffle with O(blocks) scalar
    partials."""
    import ray
    from ray.data.aggregate import Sum

    from .io import collect_table

    def qty_partial(b: pa.Table) -> pa.Table:
        qty = np.floor(b.column("l_quantity")
                       .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        t = pa.table({"pk": b.column("l_partkey"),
                      "sq": pa.array(qty, pa.int64()),
                      "n": pa.array(np.ones(qty.size, np.int64))})
        return t.group_by("pk").aggregate(
            [("sq", "sum"), ("n", "sum")]) \
            .rename_columns(["pk", "sq", "n"])
    qty_partial.__name__ = "q17_qty_partial"

    agg = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_partkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("pk").aggregate(Sum("sq", alias_name="sq"),
                                 Sum("n", alias_name="n")))
    if "pk" in agg.schema.names and agg.num_rows:
        pk = agg.column("pk").to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        pk = pk[order]
        sq = agg.column("sq").to_numpy(zero_copy_only=False)[order]
        nn = agg.column("n").to_numpy(zero_copy_only=False)[order]
    else:
        pk = sq = nn = np.empty(0, np.int64)
    handle = ray.put((pk, sq, nn))

    def pick(b: pa.Table) -> pa.Table:
        pks, sqs, ns = ray.get(handle)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = np.floor(b.column("l_quantity")
                       .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        if pks.size == 0:
            return pa.table({"c": pa.array([0], pa.int64()),
                             "n": pa.array([0], pa.int64())})
        pos = np.searchsorted(pks, lpk)
        if pos.size and (pos.max() >= pks.size
                         or not np.all(pks[pos] == lpk)):
            raise ValueError("lineitem partkey missing from the "
                             "per-part aggregate — impossible")
        m = 5 * ns[pos] * qty < sqs[pos]
        return pa.table({
            "c": pa.array([int(_ep_cents(b)[m].sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64())})
    pick.__name__ = "q17_pick"

    t = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_partkey", "l_quantity",
                         "l_extendedprice"])
        .map_batches(pick, batch_format="pyarrow"))
    c = int(t.column("c").to_numpy(zero_copy_only=False).sum()) \
        if "c" in t.schema.names else 0
    n = int(t.column("n").to_numpy(zero_copy_only=False).sum()) \
        if "n" in t.schema.names else 0
    return pa.table({"rev_cents": pa.array([c], pa.int64()),
                     "n_rows": pa.array([n], pa.int64())})


def q_priority_check(sf_dir: str):
    """TPC-H Q4 shape — order priority checking: orders placed in a
    window with at least one LATE lineitem (shipped > 30 days after
    the order date; the reference columns l_commitdate/l_receiptdate
    do not exist in this corpus, so lateness is shipdate-based),
    counted per priority. The correlated EXISTS decorrelates to a
    per-order MAX — EXISTS(ship > o_day + 30) ⟺ max_ship > o_day +
    30 — computed with the late_suppliers ONE-PASS shape instead of
    groupby + join + groupby: window orders fold to (ok, −1, o_day,
    prio) SENTINEL rows, lineitem pre-reduces per block to
    (ok, 0, max day) partials, the union sorts ONCE on (ok, flag)
    (sentinels lead their runs), and a zero-shuffle segment kernel
    counts late orders per priority for interior runs — runs WITHOUT
    a sentinel are orders outside the date window, silently skipped
    (unlike Q21 where a missing sentinel is an FK violation) — with
    the ≤2 edge runs per block finishing driver-side through the
    same kernel (data/segments.py finish_sorted_runs owns the
    interior/edge plumbing). Only O(blocks × 5) count rows ever
    move."""
    from .data.segments import finish_sorted_runs

    lo, hi = _dayc("1996-01-01"), _dayc("1997-01-01")

    def ord_fold(b: pa.Table) -> pa.Table:
        day = _day(b.column("o_orderdate")
                   .to_numpy(zero_copy_only=False))
        m = (day >= lo) & (day < hi)
        kept = b.filter(pa.array(m))
        return pa.table({
            "ok": kept.column("o_orderkey"),
            "fl": pa.array(np.full(kept.num_rows, -1, np.int64)),
            "d": pa.array(day[m], pa.int64()),
            "pr": kept.column("o_orderpriority")})
    ord_fold.__name__ = "q4_order_fold"

    def ship_partial(b: pa.Table) -> pa.Table:
        day = _day(b.column("l_shipdate")
                   .to_numpy(zero_copy_only=False))
        t = pa.table({"ok": b.column("l_orderkey"),
                      "d": pa.array(day, pa.int64())})
        g = t.group_by("ok").aggregate([("d", "max")]) \
            .rename_columns(["ok", "d"])
        return pa.table({
            "ok": g.column("ok"),
            "fl": pa.array(np.zeros(g.num_rows, np.int64)),
            "d": g.column("d"),
            "pr": pa.array([""] * g.num_rows, pa.string())})
    ship_partial.__name__ = "q4_ship_partial"

    merged = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_shipdate"]) \
        .map_batches(ship_partial, batch_format="pyarrow") \
        .union(_read(sf_dir, "orders")
               .select_columns(["o_orderkey", "o_orderdate",
                                "o_orderpriority"])
               .map_batches(ord_fold, batch_format="pyarrow")) \
        .sort(["ok", "fl"])

    _empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        """Per-priority late-order counts over a (ok, fl)-sorted
        slice of COMPLETE runs. Sentinel-less runs (orders outside
        the window) contribute nothing."""
        ok, fl = cols["ok"], cols["fl"]
        d, pr = cols["d"], cols["pr"]
        if ok.size == 0:
            return _empty
        new = np.r_[True, ok[1:] != ok[:-1]]
        rstart = np.flatnonzero(new)
        rid = np.cumsum(new) - 1
        has_sent = fl[rstart] == -1
        # max ship day per run over NON-sentinel rows
        nsent = fl != -1
        dmax = np.full(rstart.size, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(dmax, rid[nsent], d[nsent])
        late = has_sent & (dmax > d[rstart] + 30)
        ps, cs = np.unique(pr[rstart[late]], return_counts=True)
        return pa.table({
            "o_orderpriority": pa.array(ps.tolist(), pa.string()),
            "n": pa.array(cs, pa.int64())})

    partial = finish_sorted_runs(
        merged, key_col="ok", order_cols=["fl"],
        int_cols=["ok", "fl", "d"], str_cols=["pr"],
        kernel=kernel, empty_partial=_empty)
    counts: dict[str, int] = {}
    for p, n in zip(partial.column("o_orderpriority").to_pylist(),
                    partial.column("n").to_pylist()):
        counts[p] = counts.get(p, 0) + n
    prios = sorted(counts)
    return pa.table({
        "o_orderpriority": pa.array(prios, pa.string()),
        "order_count": pa.array([counts[p] for p in prios],
                                pa.int64())})


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape — returned-item reporting: top-20 customers by
    revenue on RETURNED ('R') lineitems of orders placed in a
    half-year window, with name and nation attached. Scale shape:
    lineitem filters + pre-aggregates per block to (ok, rev) integer
    partials BEFORE any movement; orders fold map-side to the window
    (ok, custkey); ONE partitioned hash join + ONE custkey-bounded
    groupby; the top-20 cut uses per-block top-k partials (the
    grouped_topk mask), so only O(blocks × 20) candidates collect;
    names/nations attach driver-side from the broadcast-class dims.
    Ties break by custkey — deterministic in both engines."""
    from ray.data.aggregate import Sum

    from .data.rank import _topk_mask
    from .io import collect_table

    # Ray 2.49 hash joins crash on a FULLY-empty side — short-circuit
    # zero-row fact tables (metadata-only counts, no scan).
    if (_read(sf_dir, "lineitem").count() == 0
            or _read(sf_dir, "orders").count() == 0):
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_name": pa.array([], pa.string()),
                         "n_name": pa.array([], pa.string()),
                         "rev_units": pa.array([], pa.int64())})

    lo, hi = _dayc("1996-01-01"), _dayc("1996-07-01")

    def li_fold(b: pa.Table) -> pa.Table:
        rf = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        kept = b.filter(pa.array(rf == "R"))
        rev = _ep_cents(kept) * (100 - _disc_pct(kept))
        t = pa.table({"lk": kept.column("l_orderkey"),
                      "rev": pa.array(rev, pa.int64())})
        return t.group_by("lk").aggregate([("rev", "sum")]) \
            .rename_columns(["lk", "rev"])
    li_fold.__name__ = "q10_li_fold"

    li = _read(sf_dir, "lineitem") \
        .select_columns(["l_orderkey", "l_returnflag",
                         "l_extendedprice", "l_discount"]) \
        .map_batches(li_fold, batch_format="pyarrow")

    def ord_fold(b: pa.Table) -> pa.Table:
        day = _day(b.column("o_orderdate")
                   .to_numpy(zero_copy_only=False))
        kept = b.filter(pa.array((day >= lo) & (day < hi)))
        return pa.table({"ok": kept.column("o_orderkey"),
                         "ck": kept.column("o_custkey")})
    ord_fold.__name__ = "q10_order_fold"

    orders_n = _read(sf_dir, "orders") \
        .select_columns(["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_fold, batch_format="pyarrow").repartition(8)

    per_cust = li.join(orders_n, join_type="inner",
                       num_partitions=8, on=("lk",),
                       right_on=("ok",)) \
        .groupby("ck").aggregate(Sum("rev", alias_name="rev"))

    def topk_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ck" not in b.schema.names:
            return pa.table({"ck": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        ck = b.column("ck").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        idx = _topk_mask(np.zeros(ck.size, np.int64), rev, ck, 20)
        return b.take(pa.array(np.sort(idx)))
    topk_partial.__name__ = "q10_top20_partial"

    cand = collect_table(per_cust.map_batches(
        topk_partial, batch_format="pyarrow"))
    if "ck" not in cand.schema.names or cand.num_rows == 0:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_name": pa.array([], pa.string()),
                         "n_name": pa.array([], pa.string()),
                         "rev_units": pa.array([], pa.int64())})
    ck = cand.column("ck").to_numpy(zero_copy_only=False)
    rev = cand.column("rev").to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, -rev))[:20]
    ck, rev = ck[order], rev[order]

    cust = collect_table(
        _read(sf_dir, "customer")
        .select_columns(["c_custkey", "c_name", "c_nationkey"]))
    cks = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    corder = np.argsort(cks)
    pos = corder[np.searchsorted(cks[corder], ck)]
    if not np.all(cks[pos] == ck):
        raise ValueError("custkey missing from customer dim")
    names = cust.column("c_name").take(
        pa.array(pos, pa.int64())).to_pylist()
    cnk = cust.column("c_nationkey") \
        .to_numpy(zero_copy_only=False)[pos]
    nat = collect_table(_read(sf_dir, "nation")
                        .select_columns(["n_nationkey", "n_name"]))
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    norder = np.argsort(nk)
    npos = norder[np.searchsorted(nk[norder], cnk)]
    nnames = nat.column("n_name").take(
        pa.array(npos, pa.int64())).to_pylist()
    return pa.table({
        "c_custkey": pa.array(ck, pa.int64()),
        "c_name": pa.array(names, pa.string()),
        "n_name": pa.array(nnames, pa.string()),
        "rev_units": pa.array(rev, pa.int64())})


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — top supplier(s): the max-over-aggregate
    (VIEW + WHERE total = (SELECT max)) composite. Supplier revenue
    over a quarter reduces map-side to (suppkey, rev) integer
    partials into ONE supplier-bounded groupby; the aggregate is a
    DIM-scale table, so the argmax + tie set finish driver-side
    (broadcast-dim collect class). ALL suppliers achieving the max
    are returned, orderd by suppkey, as the reference query does."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    lo, hi = _dayc("1996-01-01"), _dayc("1996-04-01")

    def partial(b: pa.Table) -> pa.Table:
        day = _day(b.column("l_shipdate")
                   .to_numpy(zero_copy_only=False))
        kept = b.filter(pa.array((day >= lo) & (day < hi)))
        rev = _ep_cents(kept) * (100 - _disc_pct(kept))
        t = pa.table({"sk": kept.column("l_suppkey"),
                      "rev": pa.array(rev, pa.int64())})
        return t.group_by("sk").aggregate([("rev", "sum")]) \
            .rename_columns(["sk", "rev"])
    partial.__name__ = "q15_partial"

    agg = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("sk").aggregate(Sum("rev", alias_name="rev")))
    if "sk" not in agg.schema.names or agg.num_rows == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_units": pa.array([], pa.int64())})
    sk = agg.column("sk").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rev = agg.column("rev").to_numpy(zero_copy_only=False)
    best = rev.max()
    win = np.sort(sk[rev == best])

    supp = collect_table(_read(sf_dir, "supplier")
                         .select_columns(["s_suppkey", "s_name"]))
    sks = supp.column("s_suppkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    sorder = np.argsort(sks)
    pos = sorder[np.searchsorted(sks[sorder], win)]
    if not np.all(sks[pos] == win):
        raise ValueError("suppkey missing from supplier dim")
    names = supp.column("s_name").take(
        pa.array(pos, pa.int64())).to_pylist()
    return pa.table({
        "s_suppkey": pa.array(win, pa.int64()),
        "s_name": pa.array(names, pa.string()),
        "total_units": pa.array(
            np.full(win.size, best, np.int64), pa.int64())})


def q_brand_band_revenue(sf_dir: str):
    """TPC-H Q19 shape — disjunctive predicate revenue: the
    OR-of-ANDs (three brand × size-band × quantity-band legs) that
    defeats naive predicate pushdown. The part attributes broadcast
    as sorted parallel arrays (|part|-bounded); each leg is one
    vectorized mask over (brand-code, size, quantity) and the legs
    OR together map-side — the scan stays ONE zero-shuffle pass
    emitting O(blocks) scalar partials. Revenue exact integer
    cents·(100−pct)."""
    import ray

    from .io import collect_table

    part = collect_table(
        _read(sf_dir, "part")
        .select_columns(["p_partkey", "p_brand", "p_size"]))
    if "p_partkey" in part.schema.names and part.num_rows:
        pk = part.column("p_partkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        brands = part.column("p_brand").to_pylist()
        size = part.column("p_size") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        bcode = np.asarray(
            [int(s.split("#")[1]) for s in brands], np.int64)
        order = np.argsort(pk)
        pk, bcode, size = pk[order], bcode[order], size[order]
    else:
        pk = bcode = size = np.empty(0, np.int64)
    handle = ray.put((pk, bcode, size))

    LEGS = ((13, 1, 15, 1, 11), (22, 1, 20, 10, 20),
            (25, 1, 25, 20, 30))  # (brand, szlo, szhi, qlo, qhi)

    def partial(b: pa.Table) -> pa.Table:
        pks, bc, sz = ray.get(handle)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = np.floor(b.column("l_quantity")
                       .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        if pks.size == 0:
            return pa.table({"u": pa.array([0], pa.int64()),
                             "n": pa.array([0], pa.int64())})
        pos = np.searchsorted(pks, lpk)
        if pos.size and (pos.max() >= pks.size
                         or not np.all(pks[pos] == lpk)):
            raise ValueError("lineitem partkey missing from part dim")
        lb, ls = bc[pos], sz[pos]
        m = np.zeros(lpk.size, bool)
        for brand, szlo, szhi, qlo, qhi in LEGS:
            m |= ((lb == brand) & (ls >= szlo) & (ls <= szhi)
                  & (qty >= qlo) & (qty <= qhi))
        rev = _ep_cents(b) * (100 - _disc_pct(b))
        return pa.table({
            "u": pa.array([int(rev[m].sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64())})
    partial.__name__ = "q19_partial"

    t = collect_table(
        _read(sf_dir, "lineitem")
        .select_columns(["l_partkey", "l_quantity",
                         "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow"))
    u = int(t.column("u").to_numpy(zero_copy_only=False).sum()) \
        if "u" in t.schema.names else 0
    n = int(t.column("n").to_numpy(zero_copy_only=False).sum()) \
        if "n" in t.schema.names else 0
    return pa.table({"revenue_units": pa.array([u], pa.int64()),
                     "n_rows": pa.array([n], pa.int64())})


def q_spend_hhi(sf_dir: str):
    """HERFINDAHL–HIRSCHMAN index of customer spend — the
    market-concentration scalar completing the concentration family
    (gini, pareto_half): HHI = Σ xᵢ² / (Σ xᵢ)², reported as EXACT
    integer parts-per-million (floor). Σ x² exceeds int64 (cents² at
    scale), so each block of the customer-bounded totals emits its
    Σ x² as a DECIMAL STRING (exact Python-int accumulation over a
    DIM-bounded table; O(blocks) strings collect) and the driver
    finishes in arbitrary precision — the oracle mirrors with
    HUGEINT and // floor division. No sort anywhere."""
    from ray.data.aggregate import Sum

    from .io import collect_table

    def spend_partial(b: pa.Table) -> pa.Table:
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        t = pa.table({
            "k": b.column("o_custkey").cast(pa.int64()),
            "x": pa.array(np.floor(p * 100.0 + 0.5)
                          .astype(np.int64), pa.int64())})
        return t.group_by("k").aggregate([("x", "sum")]) \
            .rename_columns(["k", "x"])
    spend_partial.__name__ = "hhi_spend_partial"

    per_cust = _read(sf_dir, "orders") \
        .select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(spend_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("x", alias_name="x"))

    def sq_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "x" not in b.schema.names:
            return pa.table({"sx": pa.array([], pa.int64()),
                             "sx2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        x = b.column("x").to_numpy(zero_copy_only=False)
        # exact Python-int Σx² — the loop runs over a CUSTOMER-
        # bounded aggregate, never the fact table
        sx2 = sum(int(v) * int(v) for v in x)
        return pa.table({
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sx2": pa.array([str(sx2)], pa.string()),
            "n": pa.array([x.size], pa.int64())})
    sq_partial.__name__ = "hhi_square_partial"

    t = collect_table(per_cust.map_batches(
        sq_partial, batch_format="pyarrow", batch_size=None))
    if "sx" not in t.schema.names or t.num_rows == 0:
        return pa.table({"hhi_ppm": pa.array([0], pa.int64()),
                         "n_customers": pa.array([0], pa.int64())})
    sx = int(t.column("sx").to_numpy(zero_copy_only=False).sum())
    n = int(t.column("n").to_numpy(zero_copy_only=False).sum())
    sx2 = sum(int(s) for s in t.column("sx2").to_pylist())
    ppm = (1_000_000 * sx2) // (sx * sx) if sx else 0
    return pa.table({"hhi_ppm": pa.array([ppm], pa.int64()),
                     "n_customers": pa.array([n], pa.int64())})



_BFS_PART_OFFSET = 1_000_000
_BFS_MAX_DEPTH = 4


def q_bfs_reach(sf_dir: str):
    """Iterative BREADTH-FIRST SEARCH over the supplier–part
    bipartite graph (suppkey ↔ partkey edges from lineitem), from the
    minimum supplier key, min-depth per node, capped at 4 hops — the
    frontier-expansion iterative class (vs PageRank's fixed-point
    over the full vertex set; vs components' label propagation), with
    an EXACT recursive-CTE oracle. Scale shape: lineitem folds ONCE
    per block to distinct (s, p) int64 pairs and materializes — every
    BFS round is then a zero-shuffle map over the SAME narrow blocks
    with the frontier broadcast as two sorted arrays; per-block
    partials are neighbor SETS (node-bounded), so each round collects
    O(blocks × |nodes|) worst-case but typically far less. The
    visited/depth table is NODE-bounded (dims, not facts) and lives
    on the driver — for web-scale vertex sets the partitioned
    escape is a join against a distributed visited table (the
    dedup.py keeper-map hatch class, documented). Parts offset by
    10⁶ into the shared node id space (contract: partkey < 10⁶,
    fails loudly)."""
    import ray

    from .io import collect_table

    def fold(b: pa.Table) -> pa.Table:
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if p.size and (p.min() < 0 or p.max() >= _BFS_PART_OFFSET):
            raise ValueError("bfs_reach node packing requires "
                             "0 <= partkey < 10^6")
        code = np.unique(s * np.int64(_BFS_PART_OFFSET) + p)
        return pa.table({
            "s": pa.array(code // _BFS_PART_OFFSET, pa.int64()),
            "p": pa.array(code % _BFS_PART_OFFSET, pa.int64())})
    fold.__name__ = "bfs_edge_fold"

    pairs = _read(sf_dir, "lineitem") \
        .select_columns(["l_suppkey", "l_partkey"]) \
        .map_batches(fold, batch_format="pyarrow").materialize()

    def seed_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "s" not in b.schema.names:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array(
            [int(b.column("s").to_numpy(zero_copy_only=False)
                 .min())], pa.int64())})
    seed_partial.__name__ = "bfs_seed_partial"

    st = collect_table(pairs.map_batches(
        seed_partial, batch_format="pyarrow", batch_size=None))
    if "m" not in st.schema.names or st.num_rows == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "depth": pa.array([], pa.int64())})
    seed = int(st.column("m").to_numpy(zero_copy_only=False).min())

    nodes = [seed]
    depths = [0]
    visited = {seed}
    f_supp = np.array([seed], np.int64)
    f_part = np.empty(0, np.int64)   # part keys (unoffset)
    for d in range(1, _BFS_MAX_DEPTH + 1):
        handle = ray.put((np.sort(f_supp), np.sort(f_part)))

        def nbrs(b: pa.Table, handle=handle) -> pa.Table:
            fs, fp = ray.get(handle)
            if b.num_rows == 0 or "s" not in b.schema.names:
                return pa.table({"n": pa.array([], pa.int64())})
            s = b.column("s").to_numpy(zero_copy_only=False)
            p = b.column("p").to_numpy(zero_copy_only=False)

            def member(arr, sorted_set):
                if sorted_set.size == 0:
                    return np.zeros(arr.size, bool)
                pos = np.minimum(np.searchsorted(sorted_set, arr),
                                 sorted_set.size - 1)
                return sorted_set[pos] == arr
            out = np.concatenate([
                p[member(s, fs)] + _BFS_PART_OFFSET,
                s[member(p, fp)]])
            return pa.table({"n": pa.array(np.unique(out),
                                           pa.int64())})
        nbrs.__name__ = f"bfs_neighbors_d{d}"

        t = collect_table(pairs.map_batches(
            nbrs, batch_format="pyarrow", batch_size=None))
        cand = np.unique(
            t.column("n").to_numpy(zero_copy_only=False)) \
            if "n" in t.schema.names and t.num_rows \
            else np.empty(0, np.int64)
        fresh = np.array([c for c in cand.tolist()
                          if c not in visited], np.int64)
        if fresh.size == 0:
            break
        visited.update(fresh.tolist())
        nodes.extend(fresh.tolist())
        depths.extend([d] * fresh.size)
        f_supp = fresh[fresh < _BFS_PART_OFFSET]
        f_part = fresh[fresh >= _BFS_PART_OFFSET] - _BFS_PART_OFFSET
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "depth": pa.array(depths, pa.int64())})



def q_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather-class) sink + source round trip — the
    CUSTOM-FORMAT connector pattern: Ray Data has no IPC
    reader/writer, so the sink is a map_batches stage where each
    task serializes ITS OWN block to one `.arrow` file and emits a
    one-row (path, rows) manifest — the write is distributed, no
    driver bytes — and the source is `read_binary_files` + a
    per-file zero-copy `pa.ipc.open_file` decode (the loop is per
    FILE, bounded by block count, never per row). Values fold to
    integer cents BEFORE serialization; ONE bounded groupby finishes.
    Oracle = the same aggregate on the parquet input."""
    import os
    import shutil
    import uuid

    import ray
    from ray.data.aggregate import Count, Sum

    out = os.path.join("/tmp/soupflow_ipc",
                       os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": b.column("event_type").cast(pa.string()),
            "value_cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64))})
        path = os.path.join(out, f"{uuid.uuid4().hex}.arrow")
        with pa.OSFile(path, "wb") as f:
            with pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([t.num_rows], pa.int64())})
    write_block.__name__ = "ipc_write_block"

    manifest = _read(sf_dir, "events") \
        .select_columns(["event_type", "value"]) \
        .map_batches(write_block, batch_format="pyarrow",
                     batch_size=None).materialize()
    n_written = int(sum(r["rows"] for r in manifest.take_all()))

    def decode(b: pa.Table) -> pa.Table:
        tabs = [pa.ipc.open_file(pa.BufferReader(x)).read_all()
                for x in b.column("bytes").to_pylist()]
        if not tabs:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "value_cents": pa.array([], pa.int64())})
        return pa.concat_tables(tabs)
    decode.__name__ = "ipc_decode_file"

    agg = ray.data.read_binary_files(out) \
        .map_batches(decode, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("value_cents", alias_name="sum_cents"),
            Count(alias_name="n")).materialize()
    n_read = int(sum(r["n"] for r in agg.take_all()))
    if n_read != n_written:
        raise ValueError(f"IPC round trip lost rows: wrote "
                         f"{n_written}, read {n_read}")
    return agg



QUERIES = {
    "extract_text": q_extract_text,
    "title_links": q_title_links,
    "clean_basic": q_clean_basic,
    "select_count": q_select_count,
    "entities": q_entities,
    "extract_interleaved": q_extract_interleaved,
    "extract_interleaved_simple": q_extract_interleaved_simple,
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "quality": q_quality,
    "fingerprint": q_fingerprint,
    "fingerprint_rolling": q_fingerprint_rolling,
    "lang_counts": q_lang_counts,
    "lang_id": q_lang_id,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "training_pipeline": q_training_pipeline,
    "dedup_components": q_dedup_components,
    "embed_near_dups": q_embed_near_dups,
    "embed_components": q_embed_components,
    "embed_near_dups_lsh": q_embed_near_dups_lsh,
    "xml_extract": q_xml_extract,
    "nth_child": q_nth_child,
    "top_docs": q_top_docs,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "kmeans": q_kmeans,
    "multimodal": q_multimodal,
    "extract_manifest": q_extract_manifest,
    "orders_pruned": q_orders_pruned,
    "agg_lineitem": q_agg_lineitem,
    "join_broadcast": q_join_broadcast,
    "distinct_sources": q_distinct_sources,
    "sessionize": q_sessionize,
    "events_daily": q_events_daily,
    "asof_join": q_asof_join,
    "bm25": q_bm25,
    "hash_split": q_hash_split,
    "repetition": q_repetition,
    "normalize": q_normalize,
    "props_rollup": q_props_rollup,
    "bigram_topk": q_bigram_topk,
    "range_join": q_range_join,
    "top_per_lang": q_top_per_lang,
    "len_quantiles": q_len_quantiles,
    "pdf_extract": q_pdf_extract,
    "decontaminate": q_decontaminate,
    "stratified_sample": q_stratified_sample,
    "snapshot_dedup": q_snapshot_dedup,
    "pack_sequences": q_pack_sequences,
    "chunk_docs": q_chunk_docs,
    "window_hop": q_window_hop,
    "tfidf_topk": q_tfidf_topk,
    "mixture_sample": q_mixture_sample,
    "length_band": q_length_band,
    "para_dedup": q_para_dedup,
    "unigram_nll": q_unigram_nll,
    "revenue_by_nation": q_revenue_by_nation,
    "funnel": q_funnel,
    "event_pivot": q_event_pivot,
    "partitioned_write": q_partitioned_write,
    "kmv_distinct": q_kmv_distinct,
    "grouped_quantiles": q_grouped_quantiles,
    "reader_pipeline": q_reader_pipeline,
    "extract_hostile": q_extract_hostile,
    "multimodal_real": q_multimodal_real,
    "multimodal_video": q_multimodal_video,
    "components_partitioned": q_components_partitioned,
    "snapshot_dedup_partitioned": q_snapshot_dedup_partitioned,
    "pagerank": q_pagerank,
    "dedup_exact_partitioned": q_dedup_exact_partitioned,
    "minhash_dups_partitioned": q_minhash_dups_partitioned,
    "simhash_dups_partitioned": q_simhash_dups_partitioned,
    "heavy_hitters": q_heavy_hitters,
    "hll_registers": q_hll_registers,
    "bloom_decontam": q_bloom_decontam,
    "inverted_index": q_inverted_index,
    "dupspan_removal": q_dupspan_removal,
    "upsample_epochs": q_upsample_epochs,
    "zscore_by_lang": q_zscore_by_lang,
    "customers_no_orders": q_customers_no_orders,
    "weighted_sample": q_weighted_sample,
    "running_total": q_running_total,
    "corr_by_flag": q_corr_by_flag,
    "orders_with_returns": q_orders_with_returns,
    "priority_by_status": q_priority_by_status,
    "rank_by_lang": q_rank_by_lang,
    "revenue_rollup": q_revenue_rollup,
    "common_terms": q_common_terms,
    "nation_customer_stats": q_nation_customer_stats,
    "top_account_parties": q_top_account_parties,
    "event_gaps": q_event_gaps,
    "rolling_revenue": q_rolling_revenue,
    "daily_active_users": q_daily_active_users,
    "favorite_event": q_favorite_event,
    "daily_events_vs_orders": q_daily_events_vs_orders,
    "exclusive_terms": q_exclusive_terms,
    "chars_histogram": q_chars_histogram,
    "profile_lineitem": q_profile_lineitem,
    "dau_hll": q_dau_hll,
    "retention_cohorts": q_retention_cohorts,
    "order_seq": q_order_seq,
    "dense_rank_by_lang": q_dense_rank_by_lang,
    "revenue_cube": q_revenue_cube,
    "order_quartile": q_order_quartile,
    "first_order_value": q_first_order_value,
    "props_k_stats": q_props_k_stats,
    "redact_terms": q_redact_terms,
    "lexical_diversity": q_lexical_diversity,
    "big_orders": q_big_orders,
    "shipping_priority": q_shipping_priority,
    "term_cooccurrence": q_term_cooccurrence,
    "interval_coverage": q_interval_coverage,
    "embed_quantize": q_embed_quantize,
    "zorder_layout": q_zorder_layout,
    "lineitem_skyline": q_lineitem_skyline,
    "shuffle_rank": q_shuffle_rank,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "custdist": q_custdist,
    "user_paths": q_user_paths,
    "late_suppliers": q_late_suppliers,
    "sales_opportunity": q_sales_opportunity,
    "order_triangles": q_order_triangles,
    "median_value_by_type": q_median_value_by_type,
    "top_orders_per_customer": q_top_orders_per_customer,
    "leakage_safe_split": q_leakage_safe_split,
    "user_entropy": q_user_entropy,
    "dense_daily_orders": q_dense_daily_orders,
    "priority_status_chi2": q_priority_status_chi2,
    "csv_roundtrip": q_csv_roundtrip,
    "compact_roundtrip": q_compact_roundtrip,
    "cume_dist_by_lang": q_cume_dist_by_lang,
    "volume_shipping": q_volume_shipping,
    "value_twa": q_value_twa,
    "strict_funnel": q_strict_funnel,
    "outlink_hosts": q_outlink_hosts,
    "priority_trend": q_priority_trend,
    "spearman_qty_disc": q_spearman_qty_disc,
    "spend_gini": q_spend_gini,
    "pareto_half": q_pareto_half,
    "forecast_revenue": q_forecast_revenue,
    "promo_revenue": q_promo_revenue,
    "market_share": q_market_share,
    "small_qty_revenue": q_small_qty_revenue,
    "priority_check": q_priority_check,
    "returned_revenue": q_returned_revenue,
    "top_supplier": q_top_supplier,
    "brand_band_revenue": q_brand_band_revenue,
    "spend_hhi": q_spend_hhi,
    "bfs_reach": q_bfs_reach,
    "ipc_roundtrip": q_ipc_roundtrip,
    "lineitem_unpivot": q_lineitem_unpivot,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "mg_heavy_hitters": q_mg_heavy_hitters,
    "iqr_outliers": q_iqr_outliers,
    "event_transitions": q_event_transitions,
    "top_terms_per_lang": q_top_terms_per_lang,
    "rolling_day_value": q_rolling_day_value,
    "rolling_active_users": q_rolling_active_users,
    "value_mad": q_value_mad,
    "jl_project": q_jl_project,
    "gram_matrix": q_gram_matrix,
    "theilsen_trend": q_theilsen_trend,
    "kendall_daily": q_kendall_daily,
    "max_streak": q_max_streak,
    "changepoint": q_changepoint,
    "trimmed_mean_qty": q_trimmed_mean_qty,
    "ks_quantity": q_ks_quantity,
    "editdist_pairs": q_editdist_pairs,
    "weighted_median_price": q_weighted_median_price,
    "leadlag_corr": q_leadlag_corr,
    "rolling_p95": q_rolling_p95,
    "source_overlap": q_source_overlap,
    "mannwhitney_qty": q_mannwhitney_qty,
    "benford_digits": q_benford_digits,
    "floored_balance": q_floored_balance,
    "hll_overlap": q_hll_overlap,
    "decay_score": q_decay_score,
    "exact_split": q_exact_split,
    "locf_fill": q_locf_fill,
    "overlap_exact": q_overlap_exact,
    "daily_ohlc": q_daily_ohlc,
    "record_highs": q_record_highs,
    "feature_hash": q_feature_hash,
    "grid_interp": q_grid_interp,
}

# Oracle tokenization contract: the SQL splits on RE2 \s+ (ASCII
# whitespace), the engine on Unicode whitespace (Arrow / str.split).
# They agree on every ASCII-whitespace corpus (all driver tables);
# documents containing exotic Unicode separators (U+3000, U+2028...)
# would tokenize differently in SQL — an oracle-side limitation, not
# an engine one.
ORACLE_SQL = {
    "extract_text": """
        SELECT doc_id,
               text AS main_text,
               'media://doc/' || doc_id AS media_ref,
               'tail ' || doc_id AS tail_text,
               3 AS n_spans
        FROM documents
    """,
    "title_links": """
        SELECT doc_id,
               'Doc ' || doc_id AS title,
               2 AS n_links,
               'https://base.example/page/' || doc_id AS first_href
        FROM documents
    """,
    "clean_basic": """
        SELECT doc_id,
               '<p><a rel="nofollow">' || text || '</a> <b>ok ' || doc_id
                 || '</b></p>' AS clean_html
        FROM documents
    """,
    "select_count": """
        SELECT doc_id,
               length(list_filter(regexp_split_to_array(trim(text),
                      '\\s+'), x -> x = 'the')) AS n_the
        FROM documents
    """,
    "entities": """
        SELECT doc_id,
               '<' || text || '> & "q" AB' AS decoded
        FROM documents
    """,
    "extract_interleaved_simple": """
        -- the oracle-friendly page yields exactly three spans per doc:
        -- main text, the media ref, and "tail {doc_id}"
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               CAST(3 AS BIGINT) AS n_spans,
               CAST(1 AS BIGINT) AS n_media,
               length(trim(text)) + 5 +
                 length(CAST(doc_id AS VARCHAR)) AS text_chars
        FROM documents
    """,
    "dedup_exact": """
        SELECT md5(text) AS fp,
               min(doc_id) AS keeper_id,
               count(*) AS n
        FROM documents GROUP BY md5(text)
    """,
    "token_stats": """
        SELECT doc_id,
               length(regexp_split_to_array(trim(text), '\\s+'))
                 AS n_tokens,
               length(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^ \\tA-Za-z0-9]')) AS n_subtokens,
               length(text) AS n_chars_measured,
               length(replace(text, ' ', '')) AS n_alpha
        FROM documents
    """,
    "quality": """
        SELECT doc_id,
               length(regexp_split_to_array(trim(text), '\\s+'))
                 AS n_tokens,
               (length(replace(text, ' ', '')) * 100) //
                 greatest(length(regexp_split_to_array(trim(text),
                          '\\s+')), 1) AS mean_token_len_x100,
               (length(regexp_extract_all(text,
                  '[!-/:-@\\[-`{-~]')) * 1000) //
                 greatest(length(text), 1) AS punct_ratio_x1000,
               (length(list_filter(
                  regexp_split_to_array(trim(text), '\\s+'),
                  x -> list_contains(['a','an','and','are','as','at',
                       'be','by','for','from','has','in','is','it',
                       'of','on','or','that','the','to','was','were',
                       'with'], x))) * 1000) //
                 greatest(length(regexp_split_to_array(trim(text),
                          '\\s+')), 1) AS stopword_ratio_x1000,
               (length(regexp_split_to_array(trim(text), '\\s+'))
                  BETWEEN 5 AND 100000)
                 AND ((length(replace(text, ' ', '')) * 100) //
                      greatest(length(regexp_split_to_array(trim(text),
                               '\\s+')), 1) <= 1200) AS is_quality
        FROM documents
    """,
    "fingerprint": """
        SELECT doc_id, md5(text) AS fp_md5 FROM documents
    """,
    "lang_counts": """
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    """,
    "lang_id": """
        -- the query detects language over held-out fixture text
        -- synthesized in each row's declared lang; exact prediction
        -- is the oracle (see q_lang_id)
        SELECT doc_id, lang AS pred_lang FROM documents
    """,
    "fingerprint_rolling": """
        -- byte-wise Horner polynomial hash mod 2^61-1 (documents are
        -- ASCII, so ord(char) == byte); HUGEINT avoids the int64
        -- overflow of acc*257
        SELECT doc_id,
               CAST(list_reduce(
                 list_prepend(CAST(0 AS HUGEINT),
                   list_transform(range(1, length(text)+1),
                     i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
                 (acc, b) -> (acc * 257 + b) % 2305843009213693951)
               AS BIGINT) AS fp_rolling
        FROM documents
    """,
    "simhash_near_dups": """
        -- exact ground truth: O(n²) XOR-popcount join over the same
        -- md5-low-64 SimHash definition (bit-majority with 2·ones > n,
        -- ties → 0; stored signed = unsigned − 2^63). The Ray pipeline
        -- has full recall at hamming ≤ 3 by 6-choose-3 block pigeonhole
        WITH w AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS ws
                   FROM documents),
        h AS (SELECT doc_id,
                     list_transform(ws, x ->
                       CAST('0x' || substr(md5(x), 1, 16) AS UBIGINT))
                       AS hs,
                     len(ws) AS n
              FROM w),
        sh AS (SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 64), b ->
                   CASE WHEN 2 * list_sum(list_transform(hs, x ->
                            CAST((x >> CAST(b AS UBIGINT)) & 1
                                 AS BIGINT))) > n
                        THEN CAST(1 AS HUGEINT) << CAST(b AS INTEGER)
                        ELSE CAST(0 AS HUGEINT) END))
                   - CAST(9223372036854775808 AS HUGEINT) AS BIGINT)
                   AS sim
               FROM h)
        SELECT a.doc_id AS doc_id, min(b.doc_id) AS dup_of
        FROM sh a JOIN sh b ON a.doc_id > b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= 3
        GROUP BY a.doc_id
    """,
    "minhash_near_dups": """
        -- semantic ground truth the LSH approximation targets: pairs
        -- with word-3-shingle Jaccard >= 0.8 (the corpus similarity
        -- distribution is bimodal, so band-collision and true-Jaccard
        -- sets coincide; verified equal at sf0.001 and sf0.01)
        WITH w AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS ws
                   FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN len(ws) >= 3
                          THEN list_distinct(list_transform(
                               range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' ||
                                    ws[i+2]))
                          ELSE [array_to_string(ws, ' ')] END AS sh
              FROM w),
        pairs AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of,
                         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.sh, b.sh)))
                         AS j
                  FROM s a JOIN s b ON a.doc_id > b.doc_id)
        SELECT doc_id, min(dup_of) AS dup_of
        FROM pairs WHERE j >= 0.8 GROUP BY doc_id
    """,
    "ngram_jaccard_dups": """
        -- exact O(n^2) word-3-shingle Jaccard ground truth; the Ray
        -- pipeline's MinHash candidate generation has full recall at
        -- this threshold (collision prob ~99.98% at j=0.8 with 16
        -- bands x 4 rows), verified equal at sf0.001 and sf0.01
        WITH w AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS ws
                   FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN len(ws) >= 3
                          THEN list_distinct(list_transform(
                               range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' ||
                                    ws[i+2]))
                          ELSE [array_to_string(ws, ' ')] END AS sh
              FROM w),
        pairs AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of,
                         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.sh, b.sh)))
                         AS j
                  FROM s a JOIN s b ON a.doc_id > b.doc_id)
        SELECT doc_id, min(dup_of) AS dup_of,
               CAST(floor(max(j) * 100) AS BIGINT) AS jaccard_x100
        FROM pairs WHERE j >= 0.8 GROUP BY doc_id
    """,
    "training_pipeline": """
        -- end-to-end composition of the individually-oracled stages:
        -- quality filter -> md5 keeper dedup -> near-dup components
        -- (recursive reachability) -> representatives -> token counts
        WITH RECURSIVE
        qual AS (
          SELECT doc_id, text FROM documents
          WHERE (length(regexp_split_to_array(trim(text), '\\s+'))
                   BETWEEN 5 AND 100000)
            AND ((length(replace(text, ' ', '')) * 100) //
                 greatest(length(regexp_split_to_array(trim(text),
                          '\\s+')), 1) <= 1200)),
        ded AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM qual) WHERE rn = 1),
        w AS (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM ded),
        s AS (SELECT doc_id,
                     CASE WHEN len(ws) >= 3
                          THEN list_distinct(list_transform(
                               range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' ||
                                    ws[i+2]))
                          ELSE [array_to_string(ws, ' ')] END AS sh
              FROM w),
        p AS (SELECT a.doc_id AS a, b.doc_id AS b
              FROM s a JOIN s b ON a.doc_id > b.doc_id
              WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh)))
                    >= 0.8),
        edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
        reach(doc, lab) AS (
            SELECT doc_id, doc_id FROM ded
            UNION
            SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.doc
        ),
        comp AS (SELECT doc, min(lab) AS component
                 FROM reach GROUP BY doc)
        SELECT d.doc_id,
               length(regexp_split_to_array(trim(d.text), '\\s+'))
                 AS n_tokens
        FROM ded d JOIN comp c ON c.doc = d.doc_id
        WHERE c.component = d.doc_id
    """,
    "dedup_components": """
        -- ground truth: connected components over the exact O(n^2)
        -- Jaccard>=0.8 pair graph (recursive min-label reachability);
        -- the Ray pipeline computes the same graph via full-recall
        -- MinHash candidates + distributed label propagation
        WITH RECURSIVE
        w AS (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN len(ws) >= 3
                          THEN list_distinct(list_transform(
                               range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' ||
                                    ws[i+2]))
                          ELSE [array_to_string(ws, ' ')] END AS sh
              FROM w),
        p AS (SELECT a.doc_id AS a, b.doc_id AS b
              FROM s a JOIN s b ON a.doc_id > b.doc_id
              WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh)))
                    >= 0.8),
        edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
        reach(doc, lab) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.doc
        )
        SELECT doc AS doc_id, min(lab) AS component
        FROM reach GROUP BY doc
    """,
    # "embed_components" oracle is built below from the shared LSH pair
    # CTEs (the pipeline's scale-safe pair source).
    "embed_near_dups": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= 0.4
    """,
    "xml_extract": """
        SELECT doc_id,
               coalesce(split_part(trim(text), ' ', 1), '') AS title,
               lang AS lang_attr
        FROM documents
    """,
    "nth_child": """
        SELECT doc_id,
               length(regexp_split_to_array(trim(text), '\\s+')) // 2
                 AS n_even,
               regexp_split_to_array(trim(text), '\\s+')[-1]
                 AS last_token
        FROM documents
    """,
    "top_docs": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id ASC LIMIT 10
    """,
    "ann_topk": """
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]),
                        CAST(q.embedding AS DOUBLE[])) DESC,
                    e.vec_id ASC) AS BIGINT) AS rank
        FROM embeddings q CROSS JOIN embeddings e
        WHERE q.vec_id IN (0, 1, 2, 3, 4) AND e.vec_id != q.vec_id
        QUALIFY rank <= 10
    """,
    "multimodal": """
        SELECT 'media://doc/' || doc_id AS media_ref,
               'image' AS kind,
               octet_length(CAST(text AS BLOB)) AS n_bytes
        FROM documents
    """,
    "extract_manifest": """
        SELECT 0 AS partition_id, count(*) // 2 AS row_count
        FROM documents
        UNION ALL
        SELECT 1 AS partition_id, count(*) - count(*) // 2 AS row_count
        FROM documents
    """,
    "orders_pruned": """
        SELECT o_orderpriority,
               count(*) AS n,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders WHERE o_totalprice > 150000.0
        GROUP BY o_orderpriority
    """,
    "agg_lineitem": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS count_order,
               max(l_extendedprice) AS max_price,
               min(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "join_broadcast": """
        SELECT c_mktsegment AS segment, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "distinct_sources": """
        SELECT DISTINCT source FROM documents
    """,
    "sessionize": """
        SELECT user_id,
               CAST(1 + sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sessions
        FROM (
            SELECT user_id,
                   epoch(ts) - lag(epoch(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS gap
            FROM events)
        GROUP BY user_id
    """,
    "events_daily": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    """,
}

# IVF with exhaustive probing returns exactly the brute-force top-k —
# same oracle as ann_topk (see q_ann_ivf docstring).
ORACLE_SQL["ann_ivf"] = ORACLE_SQL["ann_topk"]


def _lsh_pair_ctes(dim: int = 64, n_bits: int = 8, bands: int = 8,
                   seed: int = 42, threshold: float = 0.4) -> str:
    """Shared CTE block reproducing embed_near_dups_lsh's pair set in
    SQL: the pipeline is fully deterministic (fixed-seed hyperplanes),
    so the oracle reproduces it exactly — the projection matrix is
    baked into the query as literals (float64 repr round-trips), band
    keys are rebuilt per vector with string_agg over sign bits, and
    candidate pairs sharing a band key are verified with the same
    cosine >= threshold condition. The sign of the dot product is
    normalization-invariant, so the SQL skips the normalize step the
    pipeline applies before the matmul. Exposes CTE ``lshp(id_a,
    id_b)``."""
    rng = __import__("numpy").random.RandomState(seed)
    planes = rng.standard_normal((dim, n_bits * bands))
    rows = ",\n            ".join(
        "(%d, [%s])" % (j, ", ".join(repr(v) for v in planes[:, j]))
        for j in range(n_bits * bands))
    return f"""
        p(pid, plane) AS (VALUES
            {rows}),
        b AS (
          SELECT e.vec_id, p.pid // {n_bits} AS band,
                 string_agg(
                   CASE WHEN list_dot_product(
                          CAST(e.embedding AS DOUBLE[]), p.plane) > 0
                        THEN '1' ELSE '0' END, '' ORDER BY p.pid) AS key
          FROM embeddings e CROSS JOIN p
          GROUP BY e.vec_id, p.pid // {n_bits}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
          FROM b a JOIN b c
            ON a.band = c.band AND a.key = c.key
           AND a.vec_id < c.vec_id
        ),
        lshp AS (
          SELECT id_a, id_b
          FROM cand
          JOIN embeddings ea ON ea.vec_id = id_a
          JOIN embeddings eb ON eb.vec_id = id_b
          WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[]))
                >= {threshold}
        )"""


ORACLE_SQL["embed_near_dups_lsh"] = (
    "WITH " + _lsh_pair_ctes() + "\n        SELECT id_a, id_b FROM lshp")

# embed_components consumes the SAME deterministic LSH pair stream the
# pipeline does (scale path — no O(n^2) stage), so its oracle is the
# recursive min-label reachability over exactly those pairs.
ORACLE_SQL["embed_components"] = (
    "WITH RECURSIVE " + _lsh_pair_ctes() + """,
        edges AS (SELECT id_a AS a, id_b AS b FROM lshp
                  UNION ALL SELECT id_b, id_a FROM lshp),
        reach(doc, lab) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.doc
        )
        SELECT doc AS vec_id, min(lab) AS component
        FROM reach GROUP BY doc""")


def _kmeans_oracle_sql(k: int = 8, iters: int = 4, dim: int = 64) -> str:
    """SQL oracle for the distributed k-means query: Lloyd's iterations
    are UNROLLED into chained CTEs (assignment by list_distance with
    row_number tie-break on cluster id — same first-min semantics as
    numpy argmin; centroid update = per-dimension avg with empty
    clusters keeping their previous centroid via LEFT JOIN coalesce,
    matching the nonzero-mask update in similarity.kmeans). Distances:
    sqrt-L2 in SQL vs squared-L2 in numpy — same argmin (monotone)."""
    parts = [f"""
        pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
        c0 AS (SELECT vec_id AS cluster, v FROM pts
               WHERE vec_id < {k})"""]
    for it in range(1, iters + 1):
        parts.append(f"""
        a{it} AS (
          SELECT vec_id, cluster FROM (
            SELECT p.vec_id, c.cluster,
                   row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY list_distance(p.v, c.v), c.cluster) AS rn
            FROM pts p CROSS JOIN c{it - 1} c) WHERE rn = 1),
        m{it} AS (
          SELECT cluster, list(m ORDER BY dim) AS v FROM (
            SELECT a.cluster, r.dim, avg(p.v[r.dim]) AS m
            FROM a{it} a JOIN pts p USING (vec_id)
            CROSS JOIN range(1, {dim + 1}) r(dim)
            GROUP BY a.cluster, r.dim) GROUP BY cluster),
        c{it} AS (
          SELECT old.cluster, coalesce(n.v, old.v) AS v
          FROM c{it - 1} old LEFT JOIN m{it} n USING (cluster))""")
    return "WITH " + ",".join(parts) + f"""
        , afinal AS (
          SELECT vec_id, cluster FROM (
            SELECT p.vec_id, c.cluster,
                   row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY list_distance(p.v, c.v), c.cluster) AS rn
            FROM pts p CROSS JOIN c{iters} c) WHERE rn = 1)
        SELECT CAST(cluster AS INTEGER) AS cluster, count(*) AS n
        FROM afinal GROUP BY cluster"""


ORACLE_SQL["kmeans"] = _kmeans_oracle_sql()


ORACLE_SQL["asof_join"] = """
    SELECT e.event_id,
           CAST(coalesce((
               SELECT o.o_orderkey FROM orders o
               WHERE o.o_custkey = e.user_id
                 AND o.o_orderdate <= e.ts
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               LIMIT 1), -1) AS BIGINT) AS matched_order
    FROM events e
"""

# mirrors search.bm25_topk's exact float expression tree (same
# literals, same association order) so scores are bit-comparable
ORACLE_SQL["bm25"] = """
    WITH stats AS (
        SELECT doc_id,
               CAST(length(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS DOUBLE) AS dl,
               CAST(length(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x = 'merge')) AS DOUBLE) AS tf0,
               CAST(length(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x = 'window')) AS DOUBLE) AS tf1,
               CAST(length(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x = 'spark')) AS DOUBLE) AS tf2
        FROM documents),
    g AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               sum(dl) / CAST(count(*) AS DOUBLE) AS avgdl,
               CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS df0,
               CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS df1,
               CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS df2
        FROM stats),
    scored AS (
        SELECT s.doc_id,
               ((0.0
                 + ln(1.0 + (g.n_docs - g.df0 + 0.5) / (g.df0 + 0.5))
                   * s.tf0 * (1.2 + 1.0)
                   / (s.tf0 + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                                     / g.avgdl)))
                + ln(1.0 + (g.n_docs - g.df1 + 0.5) / (g.df1 + 0.5))
                  * s.tf1 * (1.2 + 1.0)
                  / (s.tf1 + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                                    / g.avgdl)))
               + ln(1.0 + (g.n_docs - g.df2 + 0.5) / (g.df2 + 0.5))
                 * s.tf2 * (1.2 + 1.0)
                 / (s.tf2 + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                                   / g.avgdl)) AS score
        FROM stats s CROSS JOIN g)
    SELECT doc_id, score FROM scored WHERE score > 0
    ORDER BY score DESC, doc_id LIMIT 25
"""

# HUGEINT arithmetic reproduces the wrapping uint64 multiply exactly:
# (id * PHI64) mod 2^64 mod 100
ORACLE_SQL["hash_split"] = """
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               (CAST(doc_id AS HUGEINT) * 11400714819323198485)
                 % 18446744073709551616 % 100 AS bucket
        FROM documents)
"""

ORACLE_SQL["repetition"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(text, '\\s+'),
                   x -> x <> '')) AS tok
        FROM documents),
    per AS (
        SELECT doc_id, tok, count(*) AS c
        FROM toks GROUP BY doc_id, tok),
    agg AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_count
        FROM per GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.n_distinct, 0) AS n_distinct,
           coalesce(a.top_count, 0) AS top_count
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""


ORACLE_SQL["normalize"] = """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
               lower(text),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
               '[0-9]{6,}', '<NUM>', 'g'),
               '\\s+', ' ', 'g')) AS clean_text,
           CAST(length(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_emails,
           CAST(length(regexp_extract_all(text, '[0-9]{6,}'))
               AS BIGINT) AS n_digit_runs
    FROM documents
"""

ORACLE_SQL["props_rollup"] = """
    SELECT coalesce(TRY_CAST(regexp_extract(props,
               '"k":\\s*([0-9]+)', 1) AS BIGINT), -1) AS k,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
               AS BIGINT) AS sum_cents
    FROM events GROUP BY 1
"""

ORACLE_SQL["bigram_topk"] = """
    WITH toks AS (
        SELECT list_filter(regexp_split_to_array(trim(text),
                   '\\s+'), x -> x <> '') AS w
        FROM documents),
    pairs AS (
        SELECT w[i] || ' ' || w[i + 1] AS bigram
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i))
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
"""

ORACLE_SQL["range_join"] = """
    SELECT e.event_id,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_matches
    FROM events e LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate <= e.ts
     AND e.ts - INTERVAL 7 DAY <= o.o_orderdate
    GROUP BY e.event_id
"""

ORACLE_SQL["top_per_lang"] = """
    SELECT lang, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents) WHERE rn <= 3
"""

# pdf_extract layout is word-exact by construction: WORDS_PER_LINE=6
# words per baseline, LINES_PER_PAGE=6 baselines per page, so the
# extracted reading-order text is the whitespace-normalized input and
# the page/line counts are closed-form in the word count.
ORACLE_SQL["pdf_extract"] = r"""
    WITH w AS (
        SELECT doc_id,
               regexp_replace(trim(text), '\s+', ' ', 'g') AS t,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+'))
               END AS n_words
        FROM documents)
    SELECT doc_id,
           t AS text,
           GREATEST(1, CAST(CEIL(CEIL(n_words / 6.0) / 6.0) AS BIGINT))
               AS n_pages,
           CAST(CEIL(n_words / 6.0) AS BIGINT) AS n_lines,
           CAST(n_words AS BIGINT) AS n_words
    FROM w
"""

# pack_sequences: next-fit replayed row-by-row; the recursive CTE
# advances every bucket one row per iteration (unrolled-iteration
# trick shared with the kmeans oracle).
ORACLE_SQL["pack_sequences"] = """
    WITH RECURSIVE ordered AS (
        SELECT doc_id,
               CAST(((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                     % 18446744073709551616) % 8 AS BIGINT) AS bucket,
               n_chars AS sz,
               row_number() OVER (
                   PARTITION BY ((CAST(doc_id AS HUGEINT)
                                  * 11400714819323198485)
                                 % 18446744073709551616) % 8
                   ORDER BY doc_id) AS rn
        FROM documents),
    packed AS (
        SELECT bucket, rn, doc_id, sz,
               sz AS acc,
               CAST(0 AS BIGINT) AS seq,
               CAST(0 AS BIGINT) AS seq_pos
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.sz,
               CASE WHEN p.acc + o.sz > 2000 THEN o.sz
                    ELSE p.acc + o.sz END,
               CASE WHEN p.acc + o.sz > 2000 THEN p.seq + 1
                    ELSE p.seq END,
               CASE WHEN p.acc + o.sz > 2000 THEN 0
                    ELSE p.seq_pos + 1 END
        FROM packed p
        JOIN ordered o ON o.bucket = p.bucket AND o.rn = p.rn + 1)
    SELECT doc_id, bucket, seq, seq_pos FROM packed
"""

ORACLE_SQL["stratified_sample"] = """
    SELECT lang, doc_id, srank
    FROM (
        SELECT lang, doc_id,
               CAST(((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                     % 18446744073709551616) // 2 AS BIGINT) AS srank,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ((CAST(doc_id AS HUGEINT)
                              * 11400714819323198485)
                             % 18446744073709551616) // 2, doc_id)
                   AS rn
        FROM documents)
    WHERE rn <= 25
"""

ORACLE_SQL["snapshot_dedup"] = """
    SELECT d.doc_id, d.text, md5(d.text) AS fp
    FROM documents d
    WHERE d.doc_id % 3 <> 0
      AND md5(d.text) NOT IN (
          SELECT md5(text) FROM documents WHERE doc_id % 3 = 0)
"""

# decontaminate: exact string 4-grams in SQL vs uint64 gram hashes in
# the Ray kernel — equality also proves the hash path collision-free
# at test scale.
ORACLE_SQL["decontaminate"] = r"""
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
    grams AS (
        SELECT doc_id, array_to_string(list_slice(w, i, i + 3), ' ')
               AS g
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS i
              FROM words WHERE len(w) >= 4)),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 13 = 0),
    hits AS (
        SELECT g2.doc_id, count(*) AS n_contaminated
        FROM grams g2 JOIN bench USING (g)
        WHERE g2.doc_id % 13 <> 0
        GROUP BY g2.doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           COALESCE(h.n_contaminated, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 13 <> 0
"""

ORACLE_SQL["len_quantiles"] = """
    WITH c AS (
        SELECT n_chars AS v, count(*) AS n
        FROM documents GROUP BY n_chars),
    cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS cn FROM c),
    t AS (SELECT count(*) AS total FROM documents)
    SELECT q.q_pct, CAST(min(cum.v) AS BIGINT) AS value
    FROM cum, t, (VALUES (10), (25), (50), (75), (90)) q(q_pct)
    WHERE cum.cn >= (q.q_pct * t.total + 99) // 100
    GROUP BY q.q_pct
"""

ORACLE_SQL["chunk_docs"] = """
    WITH expanded AS (
        SELECT doc_id, text,
               unnest(generate_series(0, greatest(0, CAST(ceil(
                   (length(text) - 200) / 150.0) AS BIGINT)))) AS i
        FROM documents)
    SELECT doc_id,
           i AS chunk_idx,
           i * 150 AS chunk_start,
           substring(text, CAST(i * 150 + 1 AS INTEGER), 200)
               AS chunk_text
    FROM expanded
"""

ORACLE_SQL["window_hop"] = """
    -- date_trunc, not epoch_us // hop: DuckDB's // truncates toward
    -- zero while the engine floors, so integer division would diverge
    -- on pre-1970 timestamps; date_trunc floors for any sign.
    WITH r AS (
        SELECT epoch_us(date_trunc('hour', ts)) // 1000000
                - i * 3600 AS window_start,
               event_type, value
        FROM events, generate_series(0, 1) AS g(i))
    SELECT window_start, event_type,
           count(*) AS n_events,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
    FROM r GROUP BY window_start, event_type
"""

ORACLE_SQL["tfidf_topk"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df
           FROM toks GROUP BY term),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN nd),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY tfidf DESC, term) AS rn
        FROM scored WHERE tfidf > 0)
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 5
"""

ORACLE_SQL["mixture_sample"] = """
    WITH c AS (SELECT source, count(*) AS n
               FROM documents GROUP BY source),
    w AS (SELECT source, pow(CAST(n AS DOUBLE), 0.5) AS wv FROM c),
    tot AS (SELECT sum(wv) AS wsum FROM w),
    q AS (SELECT source,
                 CAST(floor(500 * wv / wsum) AS BIGINT) AS quota
          FROM w CROSS JOIN tot),
    ranked AS (
        SELECT source, doc_id,
               CAST(((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                     % 18446744073709551616) // 2 AS BIGINT) AS srank,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((CAST(doc_id AS HUGEINT)
                              * 11400714819323198485)
                             % 18446744073709551616) // 2,
                            doc_id) AS rn
        FROM documents)
    SELECT r.source, r.doc_id, r.srank
    FROM ranked r JOIN q USING (source)
    WHERE rn <= quota
"""

ORACLE_SQL["length_band"] = """
    WITH c AS (
        SELECT n_chars AS v, count(*) AS n
        FROM documents GROUP BY n_chars),
    cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS cn FROM c),
    t AS (SELECT count(*) AS total FROM documents),
    lo AS (SELECT min(v) AS v FROM cum, t
           WHERE cn >= (10 * total + 99) // 100),
    hi AS (SELECT min(v) AS v FROM cum, t
           WHERE cn >= (90 * total + 99) // 100)
    SELECT doc_id, n_chars
    FROM documents, lo, hi
    WHERE n_chars BETWEEN lo.v AND hi.v
"""

ORACLE_SQL["para_dedup"] = """
    WITH w AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS ws
        FROM documents),
    seg AS (
        SELECT doc_id, ws,
               unnest(generate_series(0, CAST(ceil(
                   length(ws) / 15.0) AS BIGINT) - 1)) AS para_idx
        FROM w WHERE length(ws) > 0),
    paras AS (
        SELECT doc_id, para_idx,
               md5(array_to_string(
                   ws[CAST(para_idx * 15 + 1 AS INTEGER)
                      : CAST(para_idx * 15 + 15 AS INTEGER)],
                   ' ')) AS fp
        FROM seg),
    k AS (SELECT fp, min(doc_id * 1048576 + para_idx) AS kid
          FROM paras GROUP BY fp)
    SELECT p.doc_id, p.para_idx,
           (p.doc_id * 1048576 + p.para_idx) = k.kid AS keep
    FROM paras p JOIN k USING (fp)
"""

ORACLE_SQL["unigram_nll"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents),
    freq AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
    tot AS (SELECT count(*) AS total FROM toks)
    SELECT doc_id, count(*) AS n_tokens,
           avg(-ln(CAST(n AS DOUBLE) / total)) AS avg_nll
    FROM toks JOIN freq USING (term) CROSS JOIN tot
    GROUP BY doc_id
"""

ORACLE_SQL["revenue_by_nation"] = """
    SELECT n_name,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5)
                                  AS BIGINT))) AS BIGINT) AS revenue_i
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey
    GROUP BY n_name
"""

ORACLE_SQL["funnel"] = """
    SELECT user_id,
           coalesce(
               min(CASE WHEN event_type = 'view'
                        THEN epoch_us(ts) END)
               < max(CASE WHEN event_type = 'purchase'
                          THEN epoch_us(ts) END),
               FALSE) AS converted
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id
"""

ORACLE_SQL["event_pivot"] = """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error
    FROM events GROUP BY user_id
"""

ORACLE_SQL["partitioned_write"] = """
    SELECT lang, count(*) AS n FROM documents GROUP BY lang
"""

ORACLE_SQL["kmv_distinct"] = """
    WITH h AS (
        SELECT DISTINCT
            ((CAST(o_custkey AS HUGEINT) * 11400714819323198485)
             % 18446744073709551616) AS hv
        FROM orders),
    n AS (SELECT count(*) AS nd FROM h),
    ranked AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn
               FROM h)
    SELECT CASE WHEN n.nd < 256 THEN n.nd
           ELSE CAST((255 * CAST(18446744073709551616 AS HUGEINT))
                     // (SELECT hv FROM ranked WHERE rn = 256)
                     AS BIGINT) END AS est_distinct
    FROM n
"""

# The Bloom path's false-positive probability at the query parameters
# (m=2^20 bits, k=4, ~thousands of bench grams) is ~1e-10 per probe —
# the exact string-membership ground truth IS the expected output; the
# filter's one-sided FP semantics are pinned separately by the tiny-m
# scalar-reference pytest.
ORACLE_SQL["bloom_decontam"] = ORACLE_SQL["decontaminate"]

# Selection-only output (the float priority key is dropped), so the
# hash compare is integer/string-exact; the ranking expression
# ln(u)/w is mirrored term for term and ties break by doc_id.
ORACLE_SQL["weighted_sample"] = """
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ln((CAST(((CAST(doc_id AS HUGEINT)
                          * 11400714819323198485)
                         % 18446744073709551616) AS DOUBLE) + 0.5)
                  / 18446744073709551616.0)
               / CAST(n_chars AS DOUBLE) AS skey
        FROM documents WHERE n_chars > 0),
    ranked AS (
        SELECT doc_id, n_chars, row_number() OVER (
            ORDER BY skey DESC, doc_id) AS rn
        FROM keyed)
    SELECT doc_id, n_chars FROM ranked WHERE rn <= 100
"""

ORACLE_SQL["customers_no_orders"] = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
"""

# z = (x·n − S)/sqrt(n·SS − S²): the exact float expression tree the
# engine evaluates (integer moments cast to double, same factoring),
# so values agree past the driver's 1e-6 rounding. Zero-variance
# groups dropped on both sides.
ORACLE_SQL["zscore_by_lang"] = """
    WITH m AS (
        SELECT lang, count(*) AS n, sum(n_chars) AS s,
               sum(n_chars * n_chars) AS ss
        FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang,
           (CAST(d.n_chars AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(s AS DOUBLE))
           / sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS z
    FROM documents d JOIN m USING (lang)
    WHERE CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) > 0
"""

_UPSAMPLE_VALUES = ", ".join(
    f"('{s}', {k}, {p}, {q})"
    for s, (k, p, q) in UPSAMPLE_WEIGHTS.items())

ORACLE_SQL["upsample_epochs"] = f"""
    WITH wts(source, k, p, q) AS (VALUES {_UPSAMPLE_VALUES}),
    r AS (
        SELECT doc_id, d.source,
               k + CASE WHEN ((CAST(doc_id AS HUGEINT)
                               * 11400714819323198485)
                              % 18446744073709551616) % q < p
                   THEN 1 ELSE 0 END AS reps
        FROM documents d JOIN wts USING (source))
    SELECT doc_id, source,
           CAST(unnest(range(reps)) AS BIGINT) AS epoch
    FROM r
"""

# Exact-string ground truth for the hash-based span dedup (the engine's
# 64-bit gram hashes are collision-free at test scale — proven by the
# hash match). 'Drop ALL copies of a duplicated gram' semantics.
ORACLE_SQL["dupspan_removal"] = r"""
    WITH words AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '') AS w
        FROM documents),
    grams AS (
        SELECT doc_id, i, array_to_string(list_slice(w, i, i + 7), ' ')
               AS g
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
              FROM words WHERE len(w) >= 8)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    cov AS (SELECT DISTINCT grams.doc_id, i + j AS t
            FROM grams JOIN dup USING (g)
            CROSS JOIN generate_series(0, 7) AS s(j)),
    tok AS (SELECT doc_id, unnest(w) AS word,
                   unnest(range(1, len(w) + 1)) AS i
            FROM words),
    kept AS (
        SELECT tok.doc_id, tok.i, tok.word
        FROM tok LEFT JOIN cov
            ON tok.doc_id = cov.doc_id AND tok.i = cov.t
        WHERE cov.t IS NULL),
    joined AS (
        SELECT doc_id, string_agg(word, ' ' ORDER BY i)
               AS cleaned_text
        FROM kept GROUP BY doc_id),
    ncov AS (SELECT doc_id, count(*) AS n_cov FROM cov
             GROUP BY doc_id)
    SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
           CAST(coalesce(ncov.n_cov, 0) AS BIGINT) AS n_dup_tokens,
           coalesce(j.cleaned_text, '') AS cleaned_text
    FROM words w
    LEFT JOIN ncov USING (doc_id)
    LEFT JOIN joined j USING (doc_id)
"""

# The bucket column is engine plumbing (hash-spread of the vocabulary)
# and is dropped by map_groups' output schema; postings order inside a
# term is doc_id-ascending on both sides.
ORACLE_SQL["inverted_index"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents),
    tf AS (SELECT term, doc_id, count(*) AS tf
           FROM toks GROUP BY term, doc_id)
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS tf_total,
           string_agg(CAST(doc_id AS VARCHAR) || ':'
                      || CAST(tf AS VARCHAR),
                      ',' ORDER BY doc_id) AS postings
    FROM tf GROUP BY term
"""

from .data.sketch import cms_oracle_sql as _cms_oracle_sql  # noqa: E402
from .data.sketch import hll_oracle_sql as _hll_oracle_sql  # noqa: E402

ORACLE_SQL["heavy_hitters"] = _cms_oracle_sql(d=4, w=1024, k=20)
ORACLE_SQL["hll_registers"] = _hll_oracle_sql("orders", "o_custkey",
                                              p=12)

from .data.sketch import (  # noqa: E402
    hll_overlap_oracle_sql as _hll_overlap_sql,
)

ORACLE_SQL["hll_overlap"] = _hll_overlap_sql(
    "events", "event_type", "user_id", types=("view", "purchase"),
    p=12)

ORACLE_SQL["grouped_quantiles"] = """
    WITH c AS (
        SELECT lang, n_chars AS v, count(*) AS n
        FROM documents GROUP BY lang, n_chars),
    cum AS (
        SELECT lang, v,
               sum(n) OVER (PARTITION BY lang ORDER BY v) AS cn,
               sum(n) OVER (PARTITION BY lang) AS total
        FROM c)
    SELECT lang, q.q_pct, CAST(min(v) AS BIGINT) AS value
    FROM cum, (VALUES (25), (50), (75)) q(q_pct)
    WHERE cn >= (q.q_pct * total + 99) // 100
    GROUP BY lang, q.q_pct
"""

# manabiReaderPipeline composite: the line construction is a pure
# function of the doc's tokens (3 per line; even i → span+text+ruby,
# odd i → a+em+span), so the re-parsed candidates' text / match count /
# re-serialized html length / Cleaner(basic) output are all closed-form
# (ruby+rt are not in the basic whitelist → unwrapped to their text;
# the fragment-relative "#l{i}" href fails the protocol check → dropped,
# rel="nofollow" enforced).
ORACLE_SQL["reader_pipeline"] = r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t,
             length(regexp_split_to_array(trim(text), '\s+')) // 3 AS k
      FROM documents
    ), ln AS (
      SELECT doc_id, t, unnest(range(k)) AS i FROM toks
    ), per AS (
      SELECT doc_id, i,
             t[3*i+1] AS a, t[3*i+2] AS b, t[3*i+3] AS c
      FROM ln
    ), lines AS (
      SELECT doc_id, i,
        CASE WHEN i % 2 = 0
          THEN a || ' ' || b || ' ' || c || 'r' || CAST(i AS VARCHAR)
          ELSE a || ' ' || b || ' ' || c END AS line_text,
        CASE WHEN i % 2 = 0
          THEN length('<span>' || a || '</span> ' || b || ' <ruby>'
                      || c || '<rt>r' || CAST(i AS VARCHAR)
                      || '</rt></ruby>')
          ELSE length('<a href="#l' || CAST(i AS VARCHAR) || '">' || a
                      || '</a> <em>' || b || '</em> <span>' || c
                      || '</span>') END AS hlen,
        CASE WHEN i % 2 = 0
          THEN '<span>' || a || '</span> ' || b || ' ' || c || 'r'
               || CAST(i AS VARCHAR)
          ELSE '<a rel="nofollow">' || a || '</a> <em>' || b
               || '</em> <span>' || c || '</span>' END AS clean_line
      FROM per
    ), agg AS (
      SELECT doc_id,
             count(*) AS n_lines,
             2 * count(*) AS n_matches,
             string_agg(line_text, chr(10) ORDER BY i) AS reader_text,
             sum(hlen) AS html_len,
             string_agg(clean_line, chr(10) ORDER BY i) AS clean_html
      FROM lines GROUP BY doc_id
    )
    SELECT tk.doc_id,
           CAST(coalesce(a.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(coalesce(a.n_matches, 0) AS BIGINT) AS n_matches,
           coalesce(a.reader_text, '') AS reader_text,
           CAST(coalesce(a.html_len, 0) AS BIGINT) AS html_len,
           coalesce(a.clean_html, '') AS clean_html
    FROM toks tk LEFT JOIN agg a USING (doc_id)
"""

# Hostile-corpus invariants: depth = 50 + (doc_id*7) % 200,
# m = 10 + doc_id % 90. Structure is mangled (unclosed divs, adoption
# agency, script soup) but text content and element counts are exact
# closed forms of (doc_id, text).
ORACLE_SQL["extract_hostile"] = r"""
    SELECT doc_id,
           (CASE WHEN trim(text) = '' THEN 'empty'
                 ELSE regexp_replace(trim(text), '\s+', ' ', 'g') END)
             || ' stormwxyzq notexttail' AS body_text,
           50 + (doc_id * 7) % 200 + 10 AS n_elements,
           50 + (doc_id * 7) % 200 + 5 AS max_depth,
           10 + doc_id % 90 AS n_attrs
    FROM documents
"""

# multimodal_real: the oracle reproduces the engine's full PNG/WAV
# encode→decode round bit-for-bit — the payload pixels/samples are
# closed-form in doc_id, so any decoder defect (unfilter, Paeth,
# chunk walk, PCM parse) breaks the hash.
ORACLE_SQL["multimodal_real"] = r"""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 8 AS w, 4 + doc_id % 5 AS h,
             64 + doc_id % 64 AS n
      FROM documents
    ), img AS (
      SELECT 'media://img/' || doc_id AS media_ref, doc_id,
             'image' AS kind,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(list_sum(flatten(list_transform(range(h), y ->
               list_transform(range(w), x ->
                 (3*x + 5*y + doc_id) % 256)))) AS BIGINT) AS sum_r,
             CAST(list_sum(flatten(list_transform(range(h), y ->
               list_transform(range(w), x ->
                 (x + 2*y + 7*doc_id) % 256)))) AS BIGINT) AS sum_g,
             CAST(list_sum(flatten(list_transform(range(h), y ->
               list_transform(range(w), x ->
                 (x*y + 11*doc_id) % 256)))) AS BIGINT) AS sum_b,
             CAST(0 AS BIGINT) AS n_samples,
             CAST(0 AS BIGINT) AS sample_rate,
             CAST(0 AS BIGINT) AS amp_sum, CAST(0 AS BIGINT) AS amp_max
      FROM dims
    ), wav AS (
      SELECT 'media://wav/' || doc_id AS media_ref, doc_id,
             'audio' AS kind,
             CAST(0 AS BIGINT) AS width, CAST(0 AS BIGINT) AS height,
             CAST(0 AS BIGINT) AS sum_r, CAST(0 AS BIGINT) AS sum_g,
             CAST(0 AS BIGINT) AS sum_b,
             CAST(n AS BIGINT) AS n_samples,
             CAST(16000 AS BIGINT) AS sample_rate,
             CAST(list_sum(list_transform(range(n), i ->
               (31*doc_id + 17*i) % 65536 - 32768))
               AS BIGINT) AS amp_sum,
             CAST(list_max(list_transform(range(n), i ->
               (31*doc_id + 17*i) % 65536 - 32768))
               AS BIGINT) AS amp_max
      FROM dims
    )
    SELECT * FROM img UNION ALL SELECT * FROM wav
"""

# Partitioned (beyond-driver-memory) variants: identical deterministic
# outputs to their broadcast defaults, so the oracles are shared —
# the driver now hash-checks the SCALE paths, not only the defaults.
ORACLE_SQL["dedup_exact_partitioned"] = """
    SELECT doc_id, text, md5(text) AS fp
    FROM documents
    QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))
"""
ORACLE_SQL["minhash_dups_partitioned"] = ORACLE_SQL["minhash_near_dups"]
ORACLE_SQL["simhash_dups_partitioned"] = ORACLE_SQL["simhash_near_dups"]

# multimodal_video: the oracle reproduces the AVI decode → even frame
# sample → PNG encode→decode chain bit-for-bit — frames are the
# closed-form video_payload_for_doc pixels at src = (i * nf) // 3.
ORACLE_SQL["multimodal_video"] = r"""
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 4 AS nf, 4 + doc_id % 3 AS h,
             5 + doc_id % 5 AS w
      FROM documents
    ), samp AS (
      SELECT doc_id, nf, h, w, unnest(range(3)) AS i FROM dims
    )
    SELECT 'media://vid/' || doc_id AS media_ref,
           CAST(i AS BIGINT) AS frame_index,
           CAST(h AS BIGINT) AS height, CAST(w AS BIGINT) AS width,
           CAST(list_sum(flatten(list_transform(range(h), y ->
             list_transform(range(w), x ->
               (x + 2*y + 3*((i*nf)//3) + doc_id) % 256))))
             AS BIGINT) AS sum_r,
           CAST(list_sum(flatten(list_transform(range(h), y ->
             list_transform(range(w), x ->
               (2*x + y + 5*((i*nf)//3) + 2*doc_id) % 256))))
             AS BIGINT) AS sum_g,
           CAST(list_sum(flatten(list_transform(range(h), y ->
             list_transform(range(w), x ->
               (x*y + (i*nf)//3 + 7*doc_id) % 256))))
             AS BIGINT) AS sum_b
    FROM samp
"""

ORACLE_SQL["components_partitioned"] = ORACLE_SQL["dedup_components"]

ORACLE_SQL["snapshot_dedup_partitioned"] = ORACLE_SQL["snapshot_dedup"]


def _pagerank_oracle_sql(n_iters: int = 5) -> str:
    """Unrolled-CTE integer PageRank (DuckDB 1.0's binder rejects the
    unnest-list edge form inside a reused CTE, hence UNION ALL)."""
    def step(i: int) -> str:
        p = i - 1
        return (f"r{i} AS (SELECT d.doc_id AS node,\n"
                f"       CAST(150000 + coalesce(s.c, 0) AS BIGINT)"
                f" AS r\n"
                f"       FROM documents d LEFT JOIN (\n"
                f"         SELECT e.dst AS node,\n"
                f"                sum((85 * r{p}.r) //"
                f" (100 * e.outdeg)) AS c\n"
                f"         FROM e JOIN r{p} ON e.src = r{p}.node"
                f" GROUP BY e.dst) s\n"
                f"       ON d.doc_id = s.node)")
    steps = ",\n".join(step(i) for i in range(1, n_iters + 1))
    return f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    raw AS (
      SELECT doc_id AS src, (7*doc_id+1) % n AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (13*doc_id+2) % n FROM documents, nn
      UNION ALL
      SELECT doc_id, (19*doc_id+3) % n FROM documents, nn
    ),
    e0 AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
    deg AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
    e AS (SELECT e0.src, e0.dst, deg.outdeg
          FROM e0 JOIN deg USING (src)),
    r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS r
           FROM documents),
    {steps}
    SELECT node AS doc_id, r AS rank_i FROM r{n_iters}
    """


ORACLE_SQL["pagerank"] = _pagerank_oracle_sql(5)

# Running total in integer cents: both sides convert money with the
# same FLOOR(x*100 + 0.5) double expression, then sum in int64 — the
# window result is integer-exact regardless of accumulation order.
ORACLE_SQL["running_total"] = """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS running_cents
    FROM orders
"""

# Pearson correlation from integer moments: both sides quantize
# discount with FLOOR(x*100 + 0.5), sum exact int64 moments, then
# evaluate the identical cast-to-double factored expression — float
# agreement past the driver's 1e-6 rounding. Zero-variance groups
# dropped on both sides.
ORACLE_SQL["corr_by_flag"] = """
    WITH q AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS qx,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS qy
        FROM lineitem),
    m AS (
        SELECT l_returnflag, count(*) AS n,
               sum(qx) AS sx, sum(qy) AS sy, sum(qx * qx) AS sxx,
               sum(qy * qy) AS syy, sum(qx * qy) AS sxy
        FROM q GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS corr
    FROM m
    WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
"""

ORACLE_SQL["orders_with_returns"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
"""

ORACLE_SQL["priority_by_status"] = """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_linestatus
"""

ORACLE_SQL["rank_by_lang"] = """
    SELECT doc_id, lang,
           CAST(RANK() OVER (PARTITION BY lang ORDER BY n_chars)
                AS BIGINT) AS rnk
    FROM documents
"""

# ROLLUP with ('ALL', 0) sentinels instead of NULLs: the data has no
# genuine NULL priority/year, so COALESCE over the rollup levels is
# unambiguous and both sides stay pure string/int64 for the hash.
ORACLE_SQL["revenue_rollup"] = """
    SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
           CAST(COALESCE(year(o_orderdate), 0) AS BIGINT) AS yr,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS rev_cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, year(o_orderdate))
"""

ORACLE_SQL["common_terms"] = """
    WITH toks AS (
        SELECT DISTINCT doc_id, source,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents WHERE source IN ('src0', 'src1'))
    SELECT term,
           CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                AS BIGINT) AS df_a,
           CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                AS BIGINT) AS df_b
    FROM toks GROUP BY term
    HAVING df_a > 0 AND df_b > 0
"""

ORACLE_SQL["nation_customer_stats"] = """
    SELECT n_name,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_customers,
           CAST(COALESCE(a.cents, 0) AS BIGINT) AS bal_cents
    FROM nation LEFT JOIN (
        SELECT c_nationkey, count(*) AS n,
               SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                   AS cents
        FROM customer GROUP BY c_nationkey) a
    ON n_nationkey = a.c_nationkey
"""

ORACLE_SQL["top_account_parties"] = """
    WITH u AS (
        SELECT c_name AS name, 'cust' AS kind,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                   AS bal_cents
        FROM customer
        UNION ALL
        SELECT s_name, 'supp',
               CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT)
        FROM supplier)
    SELECT name, kind, bal_cents FROM u
    ORDER BY bal_cents DESC, name LIMIT 50
"""

ORACLE_SQL["event_gaps"] = """
    SELECT event_id, user_id,
           CAST(COALESCE(
               epoch_us(ts) - LAG(epoch_us(ts)) OVER w,
               -1) AS BIGINT) AS gap_prev,
           CAST(COALESCE(
               LEAD(epoch_us(ts)) OVER w - epoch_us(ts),
               -1) AS BIGINT) AS gap_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLE_SQL["rolling_revenue"] = """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS rolling_cents
    FROM orders
"""

ORACLE_SQL["daily_active_users"] = """
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS dau
    FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
"""

ORACLE_SQL["rolling_active_users"] = """
    WITH e AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    d AS (SELECT DISTINCT day FROM e)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(DISTINCT e.user_id)::BIGINT AS wau
    FROM d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
"""

ORACLE_SQL["favorite_event"] = """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type),
    r AS (
        SELECT user_id, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM c)
    SELECT user_id, event_type AS fav, n FROM r WHERE rn = 1
"""

ORACLE_SQL["daily_events_vs_orders"] = """
    WITH e AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1),
    o AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               count(*) AS n
        FROM orders GROUP BY 1)
    SELECT COALESCE(e.day, o.day) AS day,
           CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
    FROM e FULL OUTER JOIN o ON e.day = o.day
"""

ORACLE_SQL["exclusive_terms"] = """
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(text),
                   '\\s+'), x -> x <> '') AS w
        FROM documents WHERE source IN ('src0', 'src1')),
    bg AS (
        SELECT DISTINCT doc_id, source,
               w[i] || ' ' || w[i + 1] AS term
        FROM toks,
             unnest(generate_series(1, len(w) - 1)) AS t(i))
    SELECT term,
           CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                AS BIGINT) AS df_a
    FROM bg GROUP BY term
    HAVING df_a > 0
       AND SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) = 0
"""

from .data.sketch import histogram_quantiles_oracle_sql as _hq_sql
ORACLE_SQL["chars_histogram"] = _hq_sql(
    "documents", "n_chars", **_HIST_Q)

ORACLE_SQL["profile_lineitem"] = """
    SELECT col, n, n_null, min_v, max_v, sum_v FROM (
        SELECT 'l_quantity' AS col, count(*) AS n,
               count(*) - count(l_quantity) AS n_null,
               CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS min_v,
               CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS max_v,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS sum_v
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(*),
               count(*) - count(l_extendedprice),
               min(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                        AS BIGINT)),
               max(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                        AS BIGINT)),
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(*),
               count(*) - count(l_discount),
               min(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)),
               max(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)),
               CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5)
                             AS BIGINT)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', count(*),
               count(*) - count(l_tax),
               min(CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)),
               max(CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)),
               CAST(SUM(CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT))
                    AS BIGINT)
        FROM lineitem)
"""

from .data.sketch import hll_grouped_oracle_sql as _hllg_sql
ORACLE_SQL["dau_hll"] = _hllg_sql("events", "event_type",
                                  "user_id", p=8)

ORACLE_SQL["retention_cohorts"] = """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events),
    fs AS (
        SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           CAST(day - cohort AS BIGINT) AS k,
           count(*) AS n_users
    FROM ud JOIN fs USING (user_id)
    GROUP BY cohort, day - cohort
"""

ORACLE_SQL["order_seq"] = """
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS seq
    FROM orders
"""

ORACLE_SQL["dense_rank_by_lang"] = """
    SELECT doc_id, lang,
           CAST(DENSE_RANK() OVER (PARTITION BY lang
                                   ORDER BY n_chars)
                AS BIGINT) AS drnk
    FROM documents
"""

ORACLE_SQL["revenue_cube"] = """
    SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
           CAST(COALESCE(year(o_orderdate), 0) AS BIGINT) AS yr,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS rev_cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderpriority, year(o_orderdate))
"""

ORACLE_SQL["order_quartile"] = """
    SELECT o_orderkey, o_custkey,
           CAST(NTILE(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS tile
    FROM orders
"""

ORACLE_SQL["first_order_value"] = """
    SELECT o_custkey, first_cents FROM (
        SELECT o_custkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS first_cents,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                   AS rn
        FROM orders) WHERE rn = 1
"""

ORACLE_SQL["props_k_stats"] = """
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                         AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
"""

ORACLE_SQL["redact_terms"] = """
    SELECT doc_id,
           regexp_replace(text, '\\b(spark|hash|join)\\b', '[X]', 'g')
               AS text,
           CAST(len(regexp_extract_all(text,
                    '\\b(spark|hash|join)\\b')) AS BIGINT)
               AS n_redacted
    FROM documents
"""

ORACLE_SQL["lexical_diversity"] = """
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text),
                             '\\s+'), x -> x <> '') AS toks
          FROM documents)
"""

ORACLE_SQL["big_orders"] = """
    SELECT c.c_name, o.o_custkey, o.o_orderkey,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
               AS price_cents,
           t.total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (SELECT l_orderkey,
                 CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
                      AS BIGINT) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING total_qty > 150) t
      ON t.l_orderkey = o.o_orderkey
"""

ORACLE_SQL["shipping_priority"] = """
    SELECT l_orderkey,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5)
                                  AS BIGINT))) AS BIGINT) AS rev_i,
           strftime(o_orderdate, '%Y-%m-%d') AS o_day
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY rev_i DESC, l_orderkey
    LIMIT 10
"""

ORACLE_SQL["term_cooccurrence"] = """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents)
    SELECT a.term AS term_a, b.term AS term_b,
           CAST(count(*) AS BIGINT) AS n_both
    FROM toks a JOIN toks b
      ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2
"""

ORACLE_SQL["interval_coverage"] = """
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s,
               epoch_us(ts)
               + greatest(1, CAST(floor(value * 100 + 0.5) AS BIGINT))
                 * 6000000 AS e
        FROM events),
    m AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pm
        FROM iv)
    SELECT user_id,
           CAST(sum(CASE WHEN pm IS NULL OR s > pm
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_islands,
           CAST(sum(greatest(0, e - greatest(s, coalesce(pm, s))))
                AS BIGINT) AS covered_us
    FROM m GROUP BY user_id
"""

ORACLE_SQL["embed_quantize"] = """
    WITH flat AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS v6
        FROM embeddings),
    stats AS (
        SELECT dim, min(v6) AS mn, max(v6) AS mx
        FROM flat GROUP BY dim)
    SELECT f.vec_id, f.dim,
           CAST(CASE WHEN s.mx > s.mn
                     THEN ((f.v6 - s.mn) * 255) // (s.mx - s.mn)
                     ELSE 0 END AS BIGINT) AS code
    FROM flat f JOIN stats s USING (dim)
"""

ORACLE_SQL["zorder_layout"] = _zorder_oracle_sql()

ORACLE_SQL["lineitem_skyline"] = """
    WITH t AS (
        SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS cents
        FROM lineitem)
    SELECT qty, cents, CAST(count(*) AS BIGINT) AS n
    FROM t
    WHERE NOT EXISTS (
        SELECT 1 FROM t u
        WHERE u.qty >= t.qty AND u.cents >= t.cents
          AND (u.qty > t.qty OR u.cents > t.cents))
    GROUP BY qty, cents
"""

ORACLE_SQL["shuffle_rank"] = """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1
                AS BIGINT) AS pos
    FROM (
        SELECT doc_id,
               (CAST(doc_id + 1 AS HUGEINT)
                * 11400714819323198485)
                 % 18446744073709551616 AS h
        FROM documents)
"""

ORACLE_SQL["bpe_merges"] = _bpe_oracle_sql()
ORACLE_SQL["bpe_token_counts"] = _bpe_encode_oracle_sql()

ORACLE_SQL["user_paths"] = """
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM events
    GROUP BY user_id
"""

# Pareto crossing: smallest k with 2*cum(top-k desc spend) >= total —
# pure integers, the half never materializes.
ORACLE_SQL["pareto_half"] = """
    WITH s AS (
      SELECT o_custkey AS k,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS x
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT sum(x) OVER (ORDER BY x DESC, k) AS c,
             row_number() OVER (ORDER BY x DESC, k) AS i
      FROM s),
    tot AS (SELECT sum(x)::BIGINT AS t FROM s)
    SELECT min(i)::BIGINT AS k_customers,
           min(c)::BIGINT AS topk_cents,
           (SELECT t FROM tot) AS total_cents
    FROM r WHERE 2 * c >= (SELECT t FROM tot)
"""

# Gini as an exact integer rational: positional weighted sum over
# customers ordered by (spend, custkey); ties broken by key permute
# only equal values, so the statistic is tie-safe.
ORACLE_SQL["spend_gini"] = """
    WITH s AS (
      SELECT o_custkey AS k,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS x
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT x,
             row_number() OVER (ORDER BY x, k)::HUGEINT AS i,
             (SELECT count(*) FROM s)::HUGEINT AS n
      FROM s)
    SELECT sum((2 * i - n - 1) * x)::BIGINT AS gini_num,
           ((SELECT count(*)::HUGEINT FROM s)
            * (SELECT sum(x)::HUGEINT FROM s))::BIGINT AS gini_den,
           (SELECT count(*) FROM s)::BIGINT AS n_customers
    FROM r
"""

# Spearman with tie-averaged DOUBLED ranks (integers): the float
# finish is cast/sqrt/multiply/divide only — all IEEE-deterministic
# (sqrt is correctly rounded; ln is not), so rho matches bit-for-bit.
ORACLE_SQL["spearman_qty_disc"] = """
    WITH r AS (
      SELECT l_returnflag AS f,
             round(l_quantity)::BIGINT AS q,
             round(l_discount * 10000)::BIGINT AS d
      FROM lineitem),
    hq AS (SELECT f, q, count(*)::BIGINT AS c FROM r GROUP BY 1, 2),
    uq AS (SELECT f, q,
                  (2 * (sum(c) OVER (PARTITION BY f ORDER BY q) - c)
                   + c + 1)::BIGINT AS u
           FROM hq),
    hd AS (SELECT f, d, count(*)::BIGINT AS c FROM r GROUP BY 1, 2),
    ud AS (SELECT f, d,
                  (2 * (sum(c) OVER (PARTITION BY f ORDER BY d) - c)
                   + c + 1)::BIGINT AS v
           FROM hd),
    j AS (SELECT r.f, uq.u, ud.v
          FROM r
          JOIN uq ON uq.f = r.f AND uq.q = r.q
          JOIN ud ON ud.f = r.f AND ud.d = r.d),
    m AS (SELECT f,
                 count(*)::HUGEINT AS n,
                 sum(u)::HUGEINT AS su, sum(v)::HUGEINT AS sv,
                 sum(u * v)::HUGEINT AS suv,
                 sum(u * u)::HUGEINT AS suu,
                 sum(v * v)::HUGEINT AS svv
          FROM j GROUP BY f)
    SELECT f AS l_returnflag,
           n::BIGINT AS n,
           (n * suv - su * sv)::DOUBLE
             / (sqrt((n * suu - su * su)::DOUBLE)
                * sqrt((n * svv - sv * sv)::DOUBLE)) AS rho
    FROM m
"""

# OLS slope over the gap-filled daily lattice as an exact integer
# rational — num = n·Σxy − ΣxΣy, den = n·Σx² − (Σx)², all BIGINT.
ORACLE_SQL["priority_trend"] = """
    WITH c AS (
      SELECT o_orderpriority AS priority,
             date_trunc('day', o_orderdate) AS d,
             count(*)::BIGINT AS n
      FROM orders GROUP BY 1, 2),
    days AS (
      SELECT unnest(generate_series((SELECT min(d) FROM c),
                                    (SELECT max(d) FROM c),
                                    INTERVAL 1 DAY)) AS d),
    prios AS (SELECT DISTINCT priority FROM c),
    lattice AS (
      SELECT p.priority,
             (epoch(dd.d) // 86400)::BIGINT AS x,
             coalesce(c.n, 0)::BIGINT AS y
      FROM prios p CROSS JOIN days dd
      LEFT JOIN c ON c.priority = p.priority AND c.d = dd.d),
    m AS (
      SELECT priority,
             count(*)::BIGINT AS nn,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy,
             sum(x * x)::BIGINT AS sxx
      FROM lattice GROUP BY priority)
    SELECT priority,
           (nn * sxy - sx * sy)::BIGINT AS slope_num,
           (nn * sxx - sx * sx)::BIGINT AS slope_den
    FROM m
"""

# Outlink hosts: first three words become absolute-link hosts, the
# relative link resolves to the base host — counts predictable from
# raw text.
ORACLE_SQL["outlink_hosts"] = """
    WITH w AS (
      SELECT doc_id,
             list_slice(list_filter(
               regexp_split_to_array(trim(text), '\\s+'),
               x -> x <> ''), 1, 3) AS ws
      FROM documents),
    hosts AS (
      SELECT unnest(ws) || '.example.com' AS host FROM w
      UNION ALL
      SELECT 'base.example' FROM documents)
    SELECT host, count(*)::BIGINT AS n
    FROM hosts GROUP BY host
"""

# Strict-sequence funnel: each stage's threshold is the previous
# stage's per-key MIN — the CTE chain mirrors the staged passes.
ORACLE_SQL["strict_funnel"] = """
    WITH t0 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    t1 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t0 ON e.user_id = t0.user_id
      WHERE e.event_type = 'click' AND e.ts > t0.t
        AND e.ts <= t0.t + INTERVAL 86400 SECOND
      GROUP BY e.user_id),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t1.t
        AND e.ts <= t1.t + INTERVAL 86400 SECOND
      GROUP BY e.user_id)
    SELECT 'view' AS step,
           (SELECT count(*) FROM t0)::BIGINT AS n_keys
    UNION ALL
    SELECT 'click', (SELECT count(*) FROM t1)::BIGINT
    UNION ALL
    SELECT 'purchase', (SELECT count(*) FROM t2)::BIGINT
"""

# TWAP components as exact integers: LEAD over (ts, event_id), the
# last event per user contributes nothing.
ORACLE_SQL["value_twa"] = """
    WITH e AS (
      SELECT user_id,
             epoch_us(ts) AS t,
             round(value * 100)::BIGINT AS v,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
      FROM events)
    SELECT user_id,
           sum((nxt - t) * v)::BIGINT AS num_us_val,
           sum(nxt - t)::BIGINT AS den_us
    FROM e
    WHERE nxt IS NOT NULL
    GROUP BY user_id
"""

# TPC-H Q7 (adapted: nations 3 and 8 — a pair with suppliers AND
# customers at both test scales; year from day-truncated shipdate).
ORACLE_SQL["volume_shipping"] = """
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           year(l_shipdate)::BIGINT AS yr,
           sum(round(l_extendedprice * 100)::BIGINT
               * (100 - round(l_discount * 100)::BIGINT))::BIGINT
             AS rev_cents
    FROM lineitem
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    WHERE (ns.n_nationkey = 3 AND nc.n_nationkey = 8)
       OR (ns.n_nationkey = 8 AND nc.n_nationkey = 3)
    GROUP BY 1, 2, 3
"""

# CUME_DIST as exact integers: the ties-high cumulative count is the
# default RANGE-frame COUNT(*) window; the denominator is the
# partition size. cume_dist() itself = c_le / n_key.
ORACLE_SQL["cume_dist_by_lang"] = """
    SELECT doc_id, lang,
           count(*) OVER (PARTITION BY lang ORDER BY n_chars)
             AS c_le,
           count(*) OVER (PARTITION BY lang) AS n_key
    FROM documents
"""

ORACLE_SQL["compact_roundtrip"] = """
    SELECT event_type,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
           count(*)::BIGINT AS n
    FROM events
    GROUP BY event_type
"""

ORACLE_SQL["csv_roundtrip"] = """
    SELECT o_orderpriority AS priority,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT
             AS sum_cents,
           count(*)::BIGINT AS n
    FROM orders
    GROUP BY o_orderpriority
"""

# Chi-square over the FULL lattice (cross join of margins, zero cells
# included — they contribute their expected mass). Integer-cored
# float tree: (o*t - r*c) and t*r*c are exact int64; only the square
# and divide are float, identical in both engines to well below the
# driver's 1e-6 comparison.
ORACLE_SQL["priority_status_chi2"] = """
    WITH c AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s,
             count(*)::BIGINT AS n
      FROM orders GROUP BY 1, 2),
    r AS (SELECT p, sum(n)::BIGINT AS rn FROM c GROUP BY p),
    co AS (SELECT s, sum(n)::BIGINT AS cn FROM c GROUP BY s),
    tot AS (SELECT sum(n)::BIGINT AS t FROM c),
    lattice AS (
      SELECT r.p, co.s, r.rn, co.cn, tot.t,
             coalesce(c.n, 0)::BIGINT AS o
      FROM r CROSS JOIN co CROSS JOIN tot
      LEFT JOIN c ON c.p = r.p AND c.s = co.s)
    SELECT sum(((o * t - rn * cn)::DOUBLE)^2
               / (t * rn * cn)::DOUBLE) AS chi2,
           ((SELECT count(*) FROM r) - 1)
             * ((SELECT count(*) FROM co) - 1) AS dof,
           (SELECT t FROM tot) AS n
    FROM lattice
"""

# Calendar gap-fill: the dense lattice is generate_series CROSS JOIN
# priorities LEFT JOIN the aggregate, zero-filled. 10623/3402 zero
# cells at sf0.001/sf0.01 — the fill genuinely bites.
ORACLE_SQL["dense_daily_orders"] = """
    WITH c AS (
      SELECT o_orderpriority AS priority,
             date_trunc('day', o_orderdate) AS d,
             count(*)::BIGINT AS n
      FROM orders GROUP BY 1, 2),
    days AS (
      SELECT unnest(generate_series((SELECT min(d) FROM c),
                                    (SELECT max(d) FROM c),
                                    INTERVAL 1 DAY)) AS d),
    prios AS (SELECT DISTINCT priority FROM c)
    SELECT p.priority,
           strftime(dd.d, '%Y-%m-%d') AS day,
           coalesce(c.n, 0) AS n
    FROM prios p
    CROSS JOIN days dd
    LEFT JOIN c ON c.priority = p.priority AND c.d = dd.d
"""

# Entropy via H = ln(N) - sum(n*ln n)/N with a BIT-DETERMINISTIC
# float tree: fixed-type-order pivot + left-to-right summation,
# generated from the same _ENTROPY_TYPES constant the engine uses —
# per-user values agree bit-for-bit, so mathematically-tied users
# (identical count multisets exist at sf0.01) sort identically in
# both engines.


def _entropy_oracle_sql() -> str:
    ts = sorted(_ENTROPY_TYPES)
    pivots = ",\n             ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f"::BIGINT AS n_{t}" for t in ts)
    tot = " + ".join(f"n_{t}" for t in ts)
    terms = "\n              + ".join(
        f"CASE WHEN n_{t} > 0 THEN n_{t}::DOUBLE * "
        f"ln(n_{t}::DOUBLE) ELSE 0.0 END" for t in ts)
    return f"""
    WITH c AS (
      SELECT user_id,
             {pivots}
      FROM events GROUP BY user_id)
    SELECT user_id,
           ({tot})::BIGINT AS n_events,
           ln(({tot})::DOUBLE)
             - ({terms}) / ({tot})::DOUBLE AS x_entropy
    FROM c
"""


ORACLE_SQL["user_entropy"] = _entropy_oracle_sql()

# Leakage-safe split: the recursive-CTE components oracle feeds the
# same HUGEINT splitmix bucket, computed on the COMPONENT id.
ORACLE_SQL["leakage_safe_split"] = f"""
    WITH comp AS ({ORACLE_SQL["dedup_components"]})
    SELECT doc_id, component,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, component,
               (CAST(component AS HUGEINT) * 11400714819323198485)
                 % 18446744073709551616 % 100 AS bucket
        FROM comp)
"""

ORACLE_SQL["top_orders_per_customer"] = """
    SELECT o_custkey, o_orderkey, price_cents FROM (
      SELECT o_custkey, o_orderkey,
             round(o_totalprice * 100)::BIGINT AS price_cents,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY round(o_totalprice * 100)::BIGINT DESC,
                        o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 2
"""

# Continuous median in doubled units: 2·percentile_cont(0.5) is the
# sum of the two middle int64 order statistics, exactly representable
# as a double in both engines (values are positive, so round-half
# semantics agree).
ORACLE_SQL["median_value_by_type"] = """
    SELECT event_type,
           (2 * percentile_cont(0.5) WITHIN GROUP (
                ORDER BY round(value * 100)::BIGINT))::BIGINT AS med2
    FROM events
    GROUP BY event_type
"""

ORACLE_SQL["source_overlap"] = """
    WITH f AS (
        SELECT DISTINCT source, substr(text, 1, 24) AS fp
        FROM documents WHERE length(text) >= 24)
    SELECT a.source AS s1, b.source AS s2,
           count(*)::BIGINT AS n_shared
    FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
"""

ORACLE_SQL["rolling_p95"] = """
    WITH t AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events),
    d AS (SELECT DISTINCT day FROM t),
    j AS (SELECT d.day AS day, t.v AS v
          FROM d JOIN t ON t.day BETWEEN d.day - 6 AND d.day),
    g AS (SELECT day, v, count(*) AS n FROM j GROUP BY day, v),
    c AS (SELECT day, v,
                 sum(n) OVER (PARTITION BY day ORDER BY v) AS cn,
                 sum(n) OVER (PARTITION BY day) AS w
          FROM g)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(min(v) AS BIGINT) AS p95_cents
    FROM c WHERE 100 * cn >= 95 * w
    GROUP BY day
"""

ORACLE_SQL["leadlag_corr"] = """
    WITH s0 AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                   END)::BIGINT AS x,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END)::BIGINT AS y
        FROM events GROUP BY 1),
    days AS (
        SELECT unnest(generate_series(
            (SELECT min(day) FROM s0), (SELECT max(day) FROM s0),
            INTERVAL 1 DAY))::DATE AS day),
    s AS (
        SELECT d.day, coalesce(s0.x, 0) AS x, coalesce(s0.y, 0) AS y
        FROM days d LEFT JOIN s0 USING (day)),
    j AS (
        SELECT t.l, a.x AS x, b.y AS y
        FROM (SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1),
                                    (2), (3)) v(l)) t,
             s a JOIN s b ON b.day = a.day + t.l),
    agg AS (
        SELECT l, count(*)::HUGEINT AS n,
               sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
               sum(x*y)::HUGEINT AS sxy, sum(x*x)::HUGEINT AS sxx,
               sum(y*y)::HUGEINT AS syy
        FROM j GROUP BY l)
    SELECT CAST(l AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
           CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
                THEN CAST(n*sxy - sx*sy AS DOUBLE)
                     / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE))
                ELSE 0.0 END AS rho
    FROM agg
"""

ORACLE_SQL["weighted_median_price"] = """
    WITH t AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS v,
               CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
        FROM lineitem),
    g AS (SELECT l_returnflag, v, sum(w) AS w
          FROM t GROUP BY l_returnflag, v),
    c AS (SELECT l_returnflag, v,
                 sum(w) OVER (PARTITION BY l_returnflag
                              ORDER BY v) AS cw,
                 sum(w) OVER (PARTITION BY l_returnflag) AS tw
          FROM g)
    SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian_cents
    FROM c WHERE 2 * cw >= tw AND tw > 0
    GROUP BY l_returnflag
"""

ORACLE_SQL["editdist_pairs"] = """
    WITH p AS (
        SELECT DISTINCT substr(text, 1, 12) AS s
        FROM documents WHERE length(text) >= 4)
    SELECT a.s AS s1, b.s AS s2
    FROM p a JOIN p b
      ON a.s < b.s AND levenshtein(a.s, b.s) <= 1
"""


def _jl_oracle_sql(dim: int = 64, k: int = 8) -> str:
    """The engine's deterministic sign matrix INLINED as VALUES —
    the oracle shares the matrix by value, not by reimplementing the
    splitmix mix in SQL (the matrix is the contract; its generator
    is an engine detail)."""
    from .data.similarity import jl_signs

    s = jl_signs(dim, k)
    vals = ", ".join(f"({d}, {j}, {int(s[d, j])})"
                     for d in range(dim) for j in range(k))
    return f"""
    WITH flat AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS v6
        FROM embeddings),
    s AS (SELECT * FROM (VALUES {vals}) AS t(dim, j, sg))
    SELECT f.vec_id, CAST(s.j AS BIGINT) AS j,
           CAST(sum(s.sg * f.v6) AS BIGINT) AS p
    FROM flat f JOIN s USING (dim)
    GROUP BY f.vec_id, s.j
    """


ORACLE_SQL["jl_project"] = _jl_oracle_sql()


# gram_matrix: the d×d second-moment reduction the engine computes as
# per-block QᵀQ int64 matmuls. The oracle's dim-aligned self-join is
# the O(n·d²) expansion the engine never materializes; SUM runs in
# HUGEINT and the final cast back to BIGINT is exact iff the engine's
# own int64 guard held.
ORACLE_SQL["gram_matrix"] = """
    WITH flat AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS v6
        FROM embeddings)
    SELECT CAST(a.d AS BIGINT) AS i, CAST(b.d AS BIGINT) AS j,
           CAST(sum(a.v6 * b.v6) AS BIGINT) AS gram
    FROM flat a JOIN flat b
      ON a.vec_id = b.vec_id AND a.d <= b.d
    GROUP BY 1, 2
"""


# theilsen_trend: the engine never materializes the pairwise join —
# the day series is calendar-bounded and the slopes live in one numpy
# vector on the driver. Median is selected EXPLICITLY (row_number
# middles + (lo+hi)/2) so both engines share the float op-tree;
# duckdb's median() interpolates with a different internal tree
# (measured: 1-ULP off (a+b)/2 on ~8% of random pairs).
ORACLE_SQL["theilsen_trend"] = """
    WITH d AS (
      SELECT (epoch(date_trunc('day', o_orderdate)) // 86400)::BIGINT
                 AS x,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS y
      FROM orders GROUP BY 1),
    p AS (
      SELECT CAST(b.y - a.y AS DOUBLE)
             / CAST(b.x - a.x AS DOUBLE) AS s
      FROM d a JOIN d b ON b.x > a.x),
    r AS (
      SELECT s, row_number() OVER (ORDER BY s) AS i,
             count(*) OVER () AS n
      FROM p)
    SELECT (SELECT count(*) FROM d)::BIGINT AS n_days,
           (SELECT count(*) FROM p)::BIGINT AS n_pairs,
           ((min(s) + max(s)) / 2) AS ts_slope
    FROM r
    WHERE i = (n + 1) // 2 OR i = n // 2 + 1
    HAVING count(*) > 0
"""

# kendall_daily: the gap-fill CTE chain is leadlag_corr's; the pair
# join enumerates the O(span²) day pairs the engine handles as one
# numpy sign kernel. All outputs are integer counts — no float ever
# crosses engines; tau-b is one division away for the consumer.
ORACLE_SQL["kendall_daily"] = """
    WITH s0 AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                   END)::BIGINT AS x,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END)::BIGINT AS y
        FROM events GROUP BY 1),
    days AS (
        SELECT unnest(generate_series(
            (SELECT min(day) FROM s0), (SELECT max(day) FROM s0),
            INTERVAL 1 DAY))::DATE AS day),
    s AS (
        SELECT d.day, coalesce(s0.x, 0) AS x, coalesce(s0.y, 0) AS y
        FROM days d LEFT JOIN s0 USING (day)),
    p AS (
        SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        FROM s a JOIN s b ON b.day > a.day)
    SELECT (SELECT count(*) FROM s)::BIGINT AS n_days,
           sum(CASE WHEN (x2 > x1 AND y2 > y1)
                      OR (x2 < x1 AND y2 < y1)
                    THEN 1 ELSE 0 END)::BIGINT AS nc,
           sum(CASE WHEN (x2 > x1 AND y2 < y1)
                      OR (x2 < x1 AND y2 > y1)
                    THEN 1 ELSE 0 END)::BIGINT AS nd,
           sum(CASE WHEN x2 = x1 THEN 1 ELSE 0 END)::BIGINT
               AS tied_x,
           sum(CASE WHEN y2 = y1 THEN 1 ELSE 0 END)::BIGINT
               AS tied_y,
           sum(CASE WHEN x2 = x1 AND y2 = y1 THEN 1 ELSE 0
               END)::BIGINT AS tied_both
    FROM p
    HAVING count(*) > 0
"""

# max_streak: the classic gaps-and-islands island trick — day minus
# ROW_NUMBER() per key is constant within a consecutive island. The
# engine replaces the two window passes + two groupbys with ONE sort
# and a segment kernel.
ORACLE_SQL["max_streak"] = """
    WITH dd AS (
        SELECT DISTINCT user_id,
               (epoch(CAST(ts AS DATE)) // 86400)::BIGINT AS d
        FROM events),
    g AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id
                                      ORDER BY d) AS grp
        FROM dd),
    c AS (
        SELECT user_id, count(*)::BIGINT AS len
        FROM g GROUP BY user_id, grp)
    SELECT user_id, max(len)::BIGINT AS streak
    FROM c GROUP BY user_id
"""


# changepoint: the scaled-CUSUM argmax |n·S_t − t·S_n| over the
# gap-filled daily revenue series; all moments in HUGEINT, tie →
# smallest t, the engine's Python-int loop mirrored exactly.
ORACLE_SQL["changepoint"] = """
    WITH s0 AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS y
        FROM orders GROUP BY 1),
    days AS (
        SELECT unnest(generate_series(
            (SELECT min(day) FROM s0), (SELECT max(day) FROM s0),
            INTERVAL 1 DAY)) AS day),
    s AS (
        SELECT d.day, coalesce(s0.y, 0)::BIGINT AS y
        FROM days d LEFT JOIN s0 USING (day)),
    c AS (
        SELECT (epoch(day) // 86400)::BIGINT AS x,
               row_number() OVER (ORDER BY day)::HUGEINT AS t,
               sum(y::HUGEINT) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS st,
               count(*) OVER ()::HUGEINT AS n,
               (SELECT sum(y::HUGEINT) FROM s) AS tot
        FROM s),
    d AS (
        SELECT x, t, abs(n * st - t * tot) AS adev
        FROM c WHERE t < n)
    SELECT x AS cp_day, CAST(adev AS BIGINT) AS cusum_abs,
           (SELECT count(*) FROM s)::BIGINT AS n_days
    FROM d ORDER BY adev DESC, t ASC LIMIT 1
"""

# trimmed_mean_qty: the kept multiset under k = n·5//100 end-trimming
# is deterministic regardless of row_number tie order among equal
# values, so the window form and the engine's histogram cut agree
# exactly. Output stays (sum, n) integers — the mean is one division
# away for the consumer.
ORACLE_SQL["trimmed_mean_qty"] = """
    WITH r AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS v,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity) AS i,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
    SELECT l_returnflag,
           sum(v)::BIGINT AS trim_sum,
           count(*)::BIGINT AS trim_n
    FROM r
    WHERE i > (n * 5) // 100 AND i <= n - (n * 5) // 100
    GROUP BY l_returnflag
"""


# ks_quantity: the exact-integer two-sample KS — max|n_R·C_A − n_A·C_R|
# over the merged value domain, HUGEINT moments, tie → smallest value.
ORACLE_SQL["ks_quantity"] = """
    WITH t AS (
        SELECT CAST(l_quantity AS BIGINT) AS v,
               sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0
                   END)::BIGINT AS ca,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                   END)::BIGINT AS cr
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R')
        GROUP BY 1),
    c AS (
        SELECT v,
               sum(ca::HUGEINT) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cma,
               sum(cr::HUGEINT) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cmr,
               (SELECT sum(ca::HUGEINT) FROM t) AS na,
               (SELECT sum(cr::HUGEINT) FROM t) AS nr
        FROM t)
    SELECT v AS at_value,
           CAST(abs(nr * cma - na * cmr) AS BIGINT) AS ks_num,
           CAST(na AS BIGINT) AS n_a,
           CAST(nr AS BIGINT) AS n_r
    FROM c
    ORDER BY abs(nr * cma - na * cmr) DESC, v ASC LIMIT 1
"""

# mannwhitney_qty: doubled-midrank rank-sum — R2_A = Σ c_A·(2·before
# + t + 1) over the merged value domain, HUGEINT moments, BIGINT on
# emit (the engine raises exactly where this cast would fail).
ORACLE_SQL["mannwhitney_qty"] = """
    WITH t AS (
        SELECT CAST(l_quantity AS BIGINT) AS v,
               sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0
                   END)::HUGEINT AS ca,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                   END)::HUGEINT AS cr
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R')
        GROUP BY 1),
    c AS (
        SELECT v, ca, cr, ca + cr AS t,
               coalesce(sum(ca + cr) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS before
        FROM t)
    SELECT CAST(sum(ca) AS BIGINT) AS n_a,
           CAST(sum(cr) AS BIGINT) AS n_r,
           CAST(sum(ca * (2 * before + t + 1)) AS BIGINT) AS r2_a,
           CAST(sum(t * t * t - t) AS BIGINT) AS tie_cube,
           CAST(sum(ca * (2 * before + t + 1))
                - sum(ca) * (sum(ca) + 1) AS BIGINT) AS u2_a
    FROM c
"""

# benford_digits: leading digit of integer cents via string head —
# exact, like the engine's integer-divide loop; digit 0 = non-positive
# cents bucket (none in TPC-H, kept for wild-ledger parity).
ORACLE_SQL["benford_digits"] = """
    WITH c AS (
        SELECT greatest(round(o_totalprice * 100)::BIGINT, 0) AS cents
        FROM orders)
    SELECT CASE WHEN cents <= 0 THEN 0
                ELSE CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                          AS BIGINT) END AS digit,
           count(*)::BIGINT AS n
    FROM c
    GROUP BY 1
"""

# floored_balance: the clamp identity b = S − least(0, M) with the
# clip test S < least(0, M_prev) — three window passes the engine
# replaces with one sort + a broadcast (S, M) carry.
ORACLE_SQL["floored_balance"] = """
    WITH d AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN round(value * 100)::BIGINT
                    ELSE -(round(value * 100)::BIGINT) END AS delta
        FROM events
        WHERE event_type IN ('purchase', 'error')),
    s AS (
        SELECT user_id, ts, event_id,
               sum(delta) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS S
        FROM d),
    m AS (
        SELECT user_id, S,
               min(S) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS M,
               min(S) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS mprev,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM s)
    SELECT user_id,
           CAST(sum(CASE WHEN rn = 1 THEN S - least(0, M) END)
                AS BIGINT) AS final_bal,
           CAST(sum(CASE WHEN S < least(0, coalesce(mprev, 0))
                    THEN 1 ELSE 0 END) AS BIGINT) AS clip_n,
           CAST(max(S - least(0, M)) AS BIGINT) AS peak_bal
    FROM m
    GROUP BY user_id
"""

# decay_score: exact power-of-two decay — weight 2^(31−age) via
# BIGINT shift, HUGEINT product sum, BIGINT on emit (the engine's
# worker bound-check raises exactly where this cast would fail).
ORACLE_SQL["decay_score"] = """
    WITH p AS (
        SELECT user_id,
               round(value * 100)::BIGINT AS cents,
               (DATE '2024-01-31' - CAST(ts AS DATE)) AS age
        FROM events
        WHERE event_type = 'purchase')
    SELECT user_id,
           CAST(sum(cents::HUGEINT
                    * (1::BIGINT << (31 - age))::HUGEINT)
                AS BIGINT) AS decay_score,
           count(*)::BIGINT AS n_purch
    FROM p
    WHERE age BETWEEN 1 AND 30
    GROUP BY user_id
"""

# exact_split: largest-remainder exact-quota stratified split —
# splitmix hash order inside each stratum, rank ≤ n·8//10 → train.
ORACLE_SQL["exact_split"] = """
    WITH n AS (
        SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    h AS (
        SELECT doc_id, lang,
               ((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                % 18446744073709551616) AS hv
        FROM documents),
    r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY hv, doc_id) AS rnk
        FROM h)
    SELECT r.doc_id,
           CASE WHEN r.rnk <= (n.cnt * 8) // 10
                THEN 'train' ELSE 'heldout' END AS split
    FROM r JOIN n USING (lang)
"""

# locf_fill: the IGNORE NULLS forward-fill window the engine runs as
# one sort + a single-value carry per key.
ORACLE_SQL["locf_fill"] = """
    WITH e AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'purchase'
                    THEN round(value * 100)::BIGINT END AS pc
        FROM events)
    SELECT event_id,
           coalesce(last_value(pc IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING), 0) AS last_purchase_cents
    FROM e
"""

# overlap_exact: the ground-truth companion to hll_overlap —
# distinct-user flags ORed per id, then three coalesced sums.
ORACLE_SQL["overlap_exact"] = """
    WITH f AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                   END) AS a,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS b
        FROM events
        WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id)
    SELECT coalesce(sum(a), 0)::BIGINT AS n_a,
           coalesce(sum(b), 0)::BIGINT AS n_b,
           coalesce(sum(a * b), 0)::BIGINT AS n_both
    FROM f
"""

# daily_ohlc: ordered-arg aggregation — open/close via arg_min /
# arg_max over the HUGEINT pack ts_us·2^40 + event_id (the engine
# compares the (ts, id) tuple directly and raises if id ≥ 2^40).
ORACLE_SQL["daily_ohlc"] = """
    WITH p AS (
        SELECT (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
               round(value * 100)::BIGINT AS cents,
               (CAST(epoch_us(ts) AS HUGEINT) * 1099511627776
                + event_id) AS k
        FROM events
        WHERE event_type = 'purchase')
    SELECT CAST(day AS BIGINT) AS day,
           arg_min(cents, k) AS open_cents,
           max(cents) AS high_cents,
           min(cents) AS low_cents,
           arg_max(cents, k) AS close_cents,
           count(*)::BIGINT AS n_trades
    FROM p
    GROUP BY day
"""

# record_highs: the running-max scan — record iff cents beats the
# 1-PRECEDING running max (NULL = first purchase = record).
ORACLE_SQL["record_highs"] = """
    WITH p AS (
        SELECT user_id, ts, event_id,
               round(value * 100)::BIGINT AS cents
        FROM events
        WHERE event_type = 'purchase'),
    m AS (
        SELECT user_id, cents,
               max(cents) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS mprev
        FROM p)
    SELECT user_id,
           CAST(sum(CASE WHEN mprev IS NULL OR cents > mprev
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM m
    GROUP BY user_id
"""

# feature_hash: the hashing-trick fold — md5 bucket + independent
# md5-parity sign, both via the CMS strpos hex ladder.
def _hex_ladder(col: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) "
        f"- 1) * {16 ** (7 - i)}"
        for i in range(8))


ORACLE_SQL["feature_hash"] = f"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents),
    cnt AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    hx AS (
        SELECT c, substr(md5(term), 1, 8) AS h1,
               substr(md5(term || '#s'), 1, 8) AS h2
        FROM cnt),
    pos AS (
        SELECT c, ({_hex_ladder('h1')}) % 256 AS bucket,
               CASE WHEN ({_hex_ladder('h2')}) % 2 = 0
                    THEN 1 ELSE -1 END AS sg
        FROM hx)
    SELECT bucket,
           sum(sg * c)::BIGINT AS signed_sum,
           sum(c)::BIGINT AS n_tokens
    FROM pos
    GROUP BY bucket
"""

# grid_interp: pair-local daily resampling — LEAD pairs + integer
# ceil-division day ranges + exact num/den interpolation.
ORACLE_SQL["grid_interp"] = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS t,
               round(value * 100)::BIGINT AS v
        FROM events
        WHERE event_type = 'purchase'),
    p AS (
        SELECT user_id, t, v,
               lead(t) OVER (PARTITION BY user_id ORDER BY t)
                   AS tn,
               lead(v) OVER (PARTITION BY user_id ORDER BY t)
                   AS vn
        FROM e),
    g AS (
        SELECT user_id, t, v, tn, vn,
               unnest(generate_series(
                   (t + 86399999999) // 86400000000,
                   (tn + 86399999999) // 86400000000 - 1)) AS day
        FROM p WHERE tn IS NOT NULL)
    SELECT user_id, day,
           CAST(v * (tn - day * 86400000000)
                + vn * (day * 86400000000 - t) AS BIGINT) AS num,
           CAST(tn - t AS BIGINT) AS den
    FROM g
"""

ORACLE_SQL["value_mad"] = """
    WITH c AS (
        SELECT event_type, round(value * 100)::BIGINT AS cents
        FROM events),
    m AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)
                   AS med
        FROM c GROUP BY event_type)
    SELECT c.event_type,
           round(4 * percentile_cont(0.5) WITHIN GROUP (
                 ORDER BY abs(c.cents - m.med)))::BIGINT AS mad4,
           round(2 * any_value(m.med))::BIGINT AS med2
    FROM c JOIN m USING (event_type)
    GROUP BY c.event_type
"""

# Triangle counting: vertices = orders, edge when two orders ship
# from the same supplier in the same ISO week (Monday-truncated, the
# engine's epoch-day arithmetic == date_trunc('week')). The oracle is
# the cubic triple self-join the engine decomposes into one sort-pass
# + one hash join.
ORACLE_SQL["order_triangles"] = """
    WITH pos AS (
      SELECT DISTINCT l_suppkey sk,
             date_trunc('week', l_shipdate) wk,
             l_orderkey ok
      FROM lineitem),
    e AS (
      SELECT DISTINCT p1.ok x, p2.ok y
      FROM pos p1 JOIN pos p2
        ON p1.sk = p2.sk AND p1.wk = p2.wk AND p1.ok < p2.ok),
    tri AS (
      SELECT e1.x a, e1.y b, e2.y c
      FROM e e1
      JOIN e e2 ON e2.x = e1.y
      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
    SELECT v AS ok, count(*)::BIGINT AS n_tri
    FROM (SELECT a v FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY v
"""

# TPC-H Q22 (adapted: the "no orders" anti-join is "no large order",
# so it bites on this synthetic corpus where every customer has
# orders; the scalar AVG compares as exact int64 cross-multiplication
# in both engines).
ORACLE_SQL["sales_opportunity"] = """
    SELECT c_nationkey,
           count(*) AS cnt,
           sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS bal_cents
    FROM customer
    WHERE round(c_acctbal * 100)::BIGINT
          * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(round(c_acctbal * 100)::BIGINT)
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000)
    GROUP BY c_nationkey
"""

# TPC-H Q21 (adapted: late = day-truncated shipdate more than 60 days
# after the order date; DISTINCT per (order, supplier) granularity).
# The textbook correlated EXISTS + NOT-EXISTS double self-join — the
# engine decorrelates it into grouped set aggregates.
ORACLE_SQL["late_suppliers"] = """
    WITH cand AS (
      SELECT DISTINCT l1.l_suppkey AS sk
           , l1.l_orderkey AS ok
      FROM lineitem l1
      JOIN orders o1 ON o1.o_orderkey = l1.l_orderkey
      WHERE date_diff('day', o1.o_orderdate, l1.l_shipdate) > 60
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND date_diff('day', o3.o_orderdate,
                              l3.l_shipdate) > 60))
    SELECT s_name, count(*) AS numwait
    FROM cand JOIN supplier ON s_suppkey = sk
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
"""

# TPC-H Q13: the LEFT JOIN's zero group (customers with no 1-URGENT
# order) must be nonempty for the shape to bite — 18 customers at
# sf0.001, 203 at sf0.01.
ORACLE_SQL["custdist"] = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey,
                 COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority = '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
"""

ORACLE_SQL["lineitem_unpivot"] = """
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           'qty' AS metric,
           CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
           'price_cents',
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
           'disc_bp',
           CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)
    FROM lineitem
"""

ORACLE_SQL["jsonl_roundtrip"] = """
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
"""

from .data.sketch import misra_gries_oracle_sql as _mg_sql  # noqa: E402

ORACLE_SQL["mg_heavy_hitters"] = _mg_sql(k=29)

ORACLE_SQL["iqr_outliers"] = """
    WITH c AS (SELECT lang, n_chars AS v, count(*) AS n
               FROM documents GROUP BY lang, n_chars),
    cum AS (SELECT lang, v,
                   sum(n) OVER (PARTITION BY lang ORDER BY v) AS cn,
                   sum(n) OVER (PARTITION BY lang) AS total
            FROM c),
    q AS (SELECT lang, q_pct, CAST(min(v) AS BIGINT) AS val
          FROM cum, (VALUES (25), (75)) qq(q_pct)
          WHERE cn >= (q_pct * total + 99) // 100
          GROUP BY lang, q_pct),
    b AS (SELECT q1.lang, q1.val AS q1, q3.val AS q3
          FROM (SELECT * FROM q WHERE q_pct = 25) q1
          JOIN (SELECT * FROM q WHERE q_pct = 75) q3 USING (lang))
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN b ON d.lang = b.lang
    WHERE 2 * d.n_chars < 2 * b.q1 - 1 * (b.q3 - b.q1)
       OR 2 * d.n_chars > 2 * b.q3 + 1 * (b.q3 - b.q1)
"""

ORACLE_SQL["event_transitions"] = """
    WITH s AS (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events)
    SELECT prev, event_type AS cur, CAST(count(*) AS BIGINT) AS n
    FROM s WHERE prev IS NOT NULL
    GROUP BY prev, event_type
"""

ORACLE_SQL["top_terms_per_lang"] = """
    WITH t AS (
        SELECT lang,
               unnest(list_filter(regexp_split_to_array(
                   trim(lower(text)), '\\s+'), x -> x <> '')) AS term
        FROM documents),
    g AS (SELECT lang, term, count(*) AS n FROM t GROUP BY lang, term),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY n DESC, term) AS rn
          FROM g)
    SELECT lang, term, CAST(n AS BIGINT) AS n FROM r WHERE rn <= 3
"""

ORACLE_SQL["rolling_day_value"] = """
    SELECT event_id,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '24 hours' PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS roll
    FROM events
"""


ORACLE_SQL["forecast_revenue"] = """
    SELECT coalesce(sum(round(l_extendedprice * 100)::BIGINT
                        * round(l_discount * 100)::BIGINT), 0)::BIGINT
             AS revenue_units,
           count(*)::BIGINT AS n_rows
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
      AND round(l_discount * 100)::BIGINT BETWEEN 3 AND 6
      AND round(l_quantity)::BIGINT < 24
"""

ORACLE_SQL["promo_revenue"] = """
    SELECT coalesce(sum(CASE WHEN p_type = 'PROMO' THEN rev
                             ELSE 0 END), 0)::BIGINT AS promo_units,
           coalesce(sum(rev), 0)::BIGINT AS total_units
    FROM (SELECT l_partkey,
                 round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT) AS rev
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-03-01'
            AND l_shipdate <  DATE '1996-04-01') l
    JOIN part ON p_partkey = l_partkey
"""

ORACLE_SQL["market_share"] = """
    WITH base AS (
      SELECT year(o_orderdate)::BIGINT AS yr,
             round(l_extendedprice * 100)::BIGINT
               * (100 - round(l_discount * 100)::BIGINT) AS vol,
             s_nationkey AS sn
      FROM lineitem
      JOIN part      ON p_partkey = l_partkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      WHERE n1.n_regionkey = 1
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT yr,
           sum(CASE WHEN sn = 3 THEN vol ELSE 0 END)::BIGINT
             AS num_cents,
           sum(vol)::BIGINT AS den_cents
    FROM base GROUP BY yr
"""

ORACLE_SQL["small_qty_revenue"] = """
    WITH pq AS (
      SELECT l_partkey AS pk,
             sum(round(l_quantity)::BIGINT) AS sq,
             count(*)::BIGINT AS n
      FROM lineitem GROUP BY 1)
    SELECT coalesce(sum(round(l_extendedprice * 100)::BIGINT),
                    0)::BIGINT AS rev_cents,
           count(*)::BIGINT AS n_rows
    FROM lineitem JOIN pq ON pk = l_partkey
    WHERE 5 * n * round(l_quantity)::BIGINT < sq
"""

ORACLE_SQL["priority_check"] = """
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate
                                     + INTERVAL 30 DAY)
    GROUP BY 1
"""

ORACLE_SQL["returned_revenue"] = """
    WITH rev AS (
      SELECT o_custkey AS ck,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT))::BIGINT
               AS rev
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate <  DATE '1996-07-01'
      GROUP BY 1)
    SELECT c_custkey, c_name, n_name, rev AS rev_units
    FROM rev
    JOIN customer ON c_custkey = ck
    JOIN nation   ON n_nationkey = c_nationkey
    ORDER BY rev DESC, c_custkey
    LIMIT 20
"""

ORACLE_SQL["top_supplier"] = """
    WITH r AS (
      SELECT l_suppkey AS sk,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT))::BIGINT
               AS rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, rev AS total_units
    FROM r JOIN supplier ON s_suppkey = sk
    WHERE rev = (SELECT max(rev) FROM r)
"""

ORACLE_SQL["brand_band_revenue"] = """
    SELECT coalesce(sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)),
                    0)::BIGINT AS revenue_units,
           count(*)::BIGINT AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND round(l_quantity)::BIGINT BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 20
           AND round(l_quantity)::BIGINT BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 25
           AND round(l_quantity)::BIGINT BETWEEN 20 AND 30)
"""

ORACLE_SQL["spend_hhi"] = """
    WITH s AS (
      SELECT o_custkey,
             sum(round(o_totalprice * 100)::BIGINT)::HUGEINT AS x
      FROM orders GROUP BY 1)
    SELECT ((1000000::HUGEINT * (SELECT sum(x * x) FROM s))
            // ((SELECT sum(x) FROM s)
                * (SELECT sum(x) FROM s)))::BIGINT AS hhi_ppm,
           (SELECT count(*) FROM s)::BIGINT AS n_customers
"""


ORACLE_SQL["bfs_reach"] = """
    WITH RECURSIVE e AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    edges AS (
      SELECT s::BIGINT AS x, (p + 1000000)::BIGINT AS y FROM e
      UNION ALL
      SELECT (p + 1000000)::BIGINT, s::BIGINT FROM e),
    bfs(v, d) AS (
      SELECT (SELECT min(s) FROM e)::BIGINT, 0
      UNION
      SELECT edges.y, bfs.d + 1 FROM bfs
      JOIN edges ON edges.x = bfs.v
      WHERE bfs.d < 4)
    SELECT v AS node, min(d)::BIGINT AS depth
    FROM bfs GROUP BY v
"""


ORACLE_SQL["ipc_roundtrip"] = """
    SELECT event_type,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1
"""


# -- Catalog-wide empty-input guard ------------------------------------------
# Ray 2.49 has two crash classes when a query's inputs are FULLY empty
# (the filter-eliminated-everything regime a production pipeline hits):
# hash joins fail with ArrowInvalid when a side holds zero rows across
# all blocks, and collecting an all-empty groupby/sort yields a
# SCHEMA-LESS table whose column access KeyErrors. Queries with
# in-function guards handle this themselves; for the rest, the
# registration-level guard below short-circuits to the query's
# typed-empty result when EVERY corpus table its oracle references is
# zero-row. Counts come from parquet FOOTERS (sub-ms, no Ray work);
# partial emptiness (only some tables empty) is the map-filtered-
# blocks regime, which the pipelines already survive. The schemas were
# captured from each query's real sf0.001 output, so the empty result
# is column- and type-identical to the non-empty one.

_EMPTY_GUARD_TYPES = {"int64": pa.int64(), "double": pa.float64(),
                      "string": pa.string()}

_CORPUS_TABLES = ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings")

EMPTY_RESULT_SCHEMAS = {
    "ann_ivf": [("query_id", "int64"), ("neighbor_id", "int64"), ("rank", "int64")],
    "ann_topk": [("query_id", "int64"), ("neighbor_id", "int64"), ("rank", "int64")],
    "big_orders": [("c_name", "string"), ("o_custkey", "int64"), ("o_orderkey", "int64"), ("price_cents", "int64"), ("total_qty", "int64")],
    "bm25": [("doc_id", "int64"), ("score", "double")],
    "bpe_merges": [("rank", "int64"), ("lhs", "string"), ("rhs", "string"), ("n_pair", "int64")],
    "bpe_token_counts": [("doc_id", "int64"), ("n_words", "int64"), ("n_tokens", "int64")],
    "compact_roundtrip": [("event_type", "string"), ("sum_cents", "int64"), ("n", "int64")],
    "components_partitioned": [("doc_id", "int64"), ("component", "int64")],
    "corr_by_flag": [("l_returnflag", "string"), ("n", "int64"), ("corr", "double")],
    "csv_roundtrip": [("priority", "string"), ("sum_cents", "int64"), ("n", "int64")],
    "embed_components": [("vec_id", "int64"), ("component", "int64")],
    "embed_near_dups_lsh": [("id_a", "int64"), ("id_b", "int64")],
    "embed_quantize": [("vec_id", "int64"), ("dim", "int64"), ("code", "int64")],
    "favorite_event": [("user_id", "int64"), ("fav", "string"), ("n", "int64")],
    "heavy_hitters": [("term", "string"), ("true_cnt", "int64"), ("cms_est", "int64")],
    "ipc_roundtrip": [("event_type", "string"), ("sum_cents", "int64"), ("n", "int64")],
    "iqr_outliers": [("doc_id", "int64"), ("lang", "string"), ("n_chars", "int64")],
    "join_broadcast": [("segment", "string"), ("n", "int64")],
    "jsonl_roundtrip": [("event_type", "string"), ("sum_cents", "int64"), ("n", "int64")],
    "kmeans": [("cluster", "int64"), ("n", "int64")],
    "len_quantiles": [("q_pct", "int64"), ("value", "int64")],
    "length_band": [("doc_id", "int64"), ("n_chars", "int64")],
    "lineitem_skyline": [("qty", "int64"), ("cents", "int64"), ("n", "int64")],
    "mg_heavy_hitters": [("term", "string"), ("n_occurrences", "int64")],
    "minhash_dups_partitioned": [("doc_id", "int64"), ("dup_of", "int64")],
    "nation_customer_stats": [("n_name", "string"), ("n_customers", "int64"), ("bal_cents", "int64")],
    "order_quartile": [("o_orderkey", "int64"), ("o_custkey", "int64"), ("tile", "int64")],
    "orders_with_returns": [("o_orderpriority", "string"), ("n_orders", "int64")],
    "pagerank": [("doc_id", "int64"), ("rank_i", "int64")],
    "pareto_half": [("k_customers", "int64"), ("topk_cents", "int64"), ("total_cents", "int64")],
    "partitioned_write": [("lang", "string"), ("n", "int64")],
    "priority_by_status": [("l_linestatus", "string"), ("high_lines", "int64"), ("low_lines", "int64")],
    "priority_status_chi2": [("chi2", "double"), ("dof", "int64"), ("n", "int64")],
    "priority_trend": [("priority", "string"), ("slope_num", "int64"), ("slope_den", "int64")],
    "retention_cohorts": [("cohort_day", "string"), ("k", "int64"), ("n_users", "int64")],
    "revenue_by_nation": [("n_name", "string"), ("revenue_i", "int64")],
    "revenue_cube": [("prio", "string"), ("yr", "int64"), ("rev_cents", "int64"), ("n_orders", "int64")],
    "revenue_rollup": [("prio", "string"), ("yr", "int64"), ("rev_cents", "int64"), ("n_orders", "int64")],
    "rolling_day_value": [("event_id", "int64"), ("roll", "int64")],
    "sales_opportunity": [("c_nationkey", "int64"), ("cnt", "int64"), ("bal_cents", "int64")],
    "shipping_priority": [("l_orderkey", "int64"), ("rev_i", "int64"), ("o_day", "string")],
    "shuffle_rank": [("doc_id", "int64"), ("pos", "int64")],
    "simhash_dups_partitioned": [("doc_id", "int64"), ("dup_of", "int64")],
    "snapshot_dedup_partitioned": [("doc_id", "int64"), ("text", "string"), ("fp", "string")],
    "spearman_qty_disc": [("l_returnflag", "string"), ("n", "int64"), ("rho", "double")],
    "spend_gini": [("gini_num", "int64"), ("gini_den", "int64"), ("n_customers", "int64")],
    "tfidf_topk": [("doc_id", "int64"), ("term", "string"), ("tfidf", "double")],
    "top_terms_per_lang": [("lang", "string"), ("term", "string"), ("n", "int64")],
    "volume_shipping": [("supp_nation", "string"), ("cust_nation", "string"), ("yr", "int64"), ("rev_cents", "int64")],
    "zscore_by_lang": [("doc_id", "int64"), ("lang", "string"), ("z", "double")],
}


def _table_rows_meta(sf_dir: str, table: str) -> int:
    """Row count from parquet footers — no Ray task, no column scan.
    Falls back to a Dataset metadata count for non-parquet corpora."""
    import os

    import pyarrow.parquet as pq
    p = f"{sf_dir}/{table}.parquet"
    try:
        if os.path.isdir(p):
            return sum(
                pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
                for f in os.listdir(p) if f.endswith(".parquet"))
        return pq.ParquetFile(p).metadata.num_rows
    except Exception:
        return _read(sf_dir, table).count()


def _empty_guarded(name: str, fn):
    import functools
    import re as _re
    cols = EMPTY_RESULT_SCHEMAS[name]
    sql = ORACLE_SQL.get(name, "")
    tables = tuple(t for t in _CORPUS_TABLES
                   if _re.search(rf"\b{t}\b", sql)) or ("documents",)

    @functools.wraps(fn)
    def wrapped(sf_dir: str, **kwargs):
        if all(_table_rows_meta(sf_dir, t) == 0 for t in tables):
            return pa.table({c: pa.array([], _EMPTY_GUARD_TYPES[t])
                             for c, t in cols})
        return fn(sf_dir, **kwargs)
    return wrapped


for _name in EMPTY_RESULT_SCHEMAS:
    QUERIES[_name] = _empty_guarded(_name, QUERIES[_name])

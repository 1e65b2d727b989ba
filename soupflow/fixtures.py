"""Deterministic synthetic interleaved-document fixtures (seed=42).

Builds tables in the exact BASELINE.json input_hint shape:
  doc_id: string,
  spans: list<struct<kind: string, text: string, media_ref: string,
                     offset: int32>>
from (a) conformance HTML derived from the reference's own test suites and
(b) the driver-generated ``documents`` parquet table (deterministic pure
function of each row — no external data, no RNG state ordering).
"""

from __future__ import annotations

import hashlib
import random
from typing import Optional

import pyarrow as pa

from .extract import SPAN_SCHEMA, SPAN_STRUCT

SEED = 42


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


# HTML payloads derived from reference test suites (HtmlParserTest /
# SelectorTest / CleanerTest inline HTML; see tests/ for the cited ports).
CONFORMANCE_HTML: list[str] = [
    "<p>Hello  <b>there</b> now! </p>",
    "foo <b>bar</b> baz",
    "<div title='Surf &amp; Turf'>Reef &amp; Beef</div>",
    "<style>font-family: bold</style><p>visible</p>",
    "<p>Hello</p><script>obj.insert('<a rel=\"none\" />');</script>"
    "<p>There</p>",
    "<textarea>\n\tOne\n\tTwo\n\tThree\n</textarea>",
    "<table><td>1</td></tr> <td>2</td></tr></table>",
    "<table><caption>A caption<td>One<td>Two",
    "<li>Point one<li>Point two",
    "<dt>Foo<dd>Bar<dt>Qux<dd>Zug",
    "<h1>Hello <div>There</div> now</h1> <h2>More <h3>Content</h3></h2>",
    "<span>Hello <div>there</div> <span>now</span></span>",
    "<p>1<b>2<i>3</b>4</i>5</p>",
    "<b>1<p>2</b>3</p>",
    "<table><b><tr><td>aaa</td></tr>bbb</table>ccc",
    "<p><b class=one>One <i>Two <b>Three</p><p>Hello</p>",
    "<a href='http://example.com/'>Link<p>Error link</a>",
    "<div id=1><![CDATA[<html>\n<foo><&amp;]]></div>",
    "<div>Hello < There <&amp;></div>",
    "<div>你好<em>ok</em></div>",
    "<p =a>One<a <p>Something</p>Else",
    "<div><foo title=bar>Hello<foo title=qux>there</foo></div>",
    "<p class=\"foo > bar\">First post!</p>",
    "<body><p><textarea>one<p>two",
    "<body><p><select><option>One<option>Two</p><p>Three</p>",
    "<div > <a name=\"top\"></a ><p id=1 >Hello</p></div>",
    "<p>Hello<!-- <tr><td>-->done",
    "<ol><li><p>Point the first<li><p>Point the second",
    "<td>Hello<td><p>There<p>now",
    "<a>Hello <div>there</div> <span>now</span></a>",
    "<font>Hello <div>there</div> <span>now</span></font>",
    "<pre>  keep\n  this  spacing</pre><p>after</p>",
    "<p>&lt;escaped&gt; &amp; &quot;done&quot;</p>",
    "<p>nbsp&nbsp;here</p>",
    "<div class=left>One</div><div class=right id=1><p>Two</p></div>",
    "<div><p><a href='/foo'>Hello <b id=bar>there</b>!</a></div>",
    "<h1>Head</h1><table><tr><td>One<td>Two</td></tr></table>",
    "<IMG SRC=\"javascript:alert('XSS')\"><p>after image</p>",
    "<p>Contact me <a href='mailto:info@example.com'>here</a></p>",
    "<div><p>The Rain.</p> <p class=light>The <i>rain</i>.</p>"
    " <p>Rain, the.</p></div>",
]

_WRAPPERS = [
    "{}",
    "<div>{}</div>",
    "<div><section>{}</section></div>",
    "<article><header><h1>t</h1></header>{}</article>",
    "<div class='a b'><span>lead</span>{}</div>",
]


def conformance_docs() -> list[tuple[str, str]]:
    """~200 (doc_id, html) rows: each conformance case × wrappers."""
    out = []
    for i, html in enumerate(CONFORMANCE_HTML):
        for j, wrapper in enumerate(_WRAPPERS):
            doc_id = f"doc-conf-{i:03d}-{j}"
            out.append((doc_id, wrapper.format(html)))
    return out


def split_into_spans(doc_id: str, html: str,
                     n_media: Optional[int] = None) -> list[dict]:
    """Deterministically split html into 1-4 text spans with media spans
    interleaved (split points keyed on sha1(doc_id), never mid-tag)."""
    h = _h(doc_id)
    n_media = (h % 3) if n_media is None else n_media
    # candidate split points: positions right after a '>'
    cut_points = [i + 1 for i, c in enumerate(html) if c == ">"]
    spans: list[dict] = []
    if n_media == 0 or not cut_points:
        spans.append({"kind": "text", "text": html, "media_ref": "",
                      "offset": 0})
        return spans
    cuts = sorted({cut_points[(h >> (8 * (k + 1))) % len(cut_points)]
                   for k in range(n_media)})
    prev = 0
    offset = 0
    for ci, cut in enumerate(cuts):
        if cut > prev:
            spans.append({"kind": "text", "text": html[prev:cut],
                          "media_ref": "", "offset": offset})
            offset += 1
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"media://{doc_id}/{ci}",
                      "offset": offset})
        offset += 1
        prev = cut
    if prev < len(html):
        spans.append({"kind": "text", "text": html[prev:],
                      "media_ref": "", "offset": offset})
    return spans


def build_page(doc_id: str, text: str, *, heavy: bool = False) -> str:
    """Rich deterministic page for bench/correctness tiers: boilerplate
    chrome (nav/header/footer/script) around main content built from the
    row's text, plus inline formatting / attribute / entity variety."""
    h = _h(doc_id)
    words = text.split()
    n = max(1, len(words))
    paras = []
    per = max(8, n // 4)
    for i in range(0, n, per):
        chunk = " ".join(words[i:i + per])
        style = i // per % 4
        if style == 0:
            paras.append(f"<p>{chunk}</p>")
        elif style == 1:
            paras.append(f"<p>{chunk[:len(chunk) // 2]}"
                         f"<b>{chunk[len(chunk) // 2:]}</b></p>")
        elif style == 2:
            paras.append(f"<p><em>{chunk}</em><br>tail{i}</p>")
        else:
            paras.append(f"<blockquote cite='http://x/{i}'>{chunk}"
                         f"</blockquote>")
    depth = 0
    if heavy:
        depth = 256 + (h % 256)
        paras.append("<div>" * depth + "deep" + "</div>" * depth)
    main = "".join(paras)
    return (
        f"<!DOCTYPE html><html><head><title>Doc {doc_id}</title>"
        f"<meta charset=utf-8><style>.x{{color:red}}</style></head><body>"
        f"<nav><ul><li><a href='/home'>home</a><li><a href='/about'>about"
        f"</a></ul></nav>"
        f"<header><h1>Title {h % 1000}</h1></header>"
        f"<div id=main class='content main'>{main}</div>"
        f"<script>var x = {h % 97};</script>"
        f"<footer><p>© example {h % 100}</p></footer>"
        f"</body></html>")


def docs_to_interleaved(documents: pa.Table, *, rich: bool = False,
                        heavy_tail: float = 0.0) -> pa.Table:
    """Turn the driver 'documents' table into the interleaved input shape.

    rich=False: simple oracle-friendly page (nav + main + media + tail
    paragraph + script/footer). rich=True: build_page() variety with an
    optional deterministic heavy tail fraction (deep DOMs).
    """
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    out_ids: list[str] = []
    out_spans: list[list[dict]] = []
    for doc_id_raw, text in zip(doc_ids, texts):
        doc_id = str(doc_id_raw)
        if rich:
            heavy = heavy_tail > 0 and (_h(doc_id) % 100000) < \
                heavy_tail * 100000
            html = build_page(doc_id, text or "", heavy=heavy)
            spans = split_into_spans(doc_id, html)
        else:
            html = (
                f"<nav><a href='/m'>menu</a></nav>"
                f"<div id=main><p>{text}</p>"
                f"<img src='media://doc/{doc_id}'>"
                f"<p>tail {doc_id}</p></div>"
                f"<script>junk()</script><footer>f</footer>")
            spans = split_into_spans(doc_id, html, n_media=0)
        out_ids.append(doc_id)
        out_spans.append(spans)
    return pa.table({
        "doc_id": pa.array(out_ids, pa.string()),
        "spans": pa.array(out_spans, pa.list_(SPAN_STRUCT)),
    })


def conformance_table() -> pa.Table:
    rows = conformance_docs()
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "spans": pa.array([split_into_spans(r[0], r[1]) for r in rows],
                          pa.list_(SPAN_STRUCT)),
    })


def write_fixtures(out_dir: str, documents_parquet: Optional[str] = None,
                   rich: bool = True) -> None:
    import os
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(conformance_table(), f"{out_dir}/conformance.parquet")
    if documents_parquet:
        docs = pq.read_table(documents_parquet)
        pq.write_table(docs_to_interleaved(docs, rich=rich,
                                           heavy_tail=0.001),
                       f"{out_dir}/interleaved.parquet")

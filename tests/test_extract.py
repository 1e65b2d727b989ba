"""Span-extraction kernel semantics (FIXTURES.md §1-2 contract)."""

import pyarrow as pa

from soupflow.extract import (ExtractActor, assemble_html,
                              extract_document)
from soupflow.fixtures import (conformance_table, split_into_spans)


def spans_of(html, **kw):
    return [(s["kind"], s["text"], s["media_ref"])
            for s in extract_document(html, **kw)]


def test_single_paragraph():
    assert spans_of("<p>Hello  <b>there</b> now! </p>") == \
        [("text", "Hello there now!", "")]


def test_block_boundaries_segment_spans():
    assert spans_of("<div><p>One</p><p>Two</p></div>") == \
        [("text", "One", ""), ("text", "Two", "")]


def test_br_segments_spans():
    # <br> is a segment boundary (FIXTURES.md §2: block/<br> boundaries)
    assert spans_of("<p>a<br>b</p>") == \
        [("text", "a", ""), ("text", "b", "")]


def test_inline_formatting_merges():
    assert spans_of("foo <b>bar</b> baz") == [("text", "foo bar baz", "")]


def test_media_spans_in_order():
    html = "<p>one</p><img src='media://d/0'><p>two</p>"
    assert spans_of(html) == [
        ("text", "one", ""), ("media", "", "media://d/0"),
        ("text", "two", "")]


def test_media_inside_paragraph_flushes_segment():
    html = "<p>before <img src='m://x'> after</p>"
    assert spans_of(html) == [
        ("text", "before", ""), ("media", "", "m://x"),
        ("text", "after", "")]


def test_boilerplate_dropped():
    html = ("<nav><a href='/'>menu</a></nav><div><p>keep</p></div>"
            "<script>var x;</script><footer>foot</footer>")
    assert spans_of(html) == [("text", "keep", "")]


def test_boilerplate_kept_when_disabled():
    html = "<nav>menu</nav><p>keep</p>"
    assert spans_of(html, drop_boilerplate=False) == \
        [("text", "menu", ""), ("text", "keep", "")]


def test_preserve_whitespace_in_pre():
    assert spans_of("<pre>  a\n  b</pre>") == [("text", "a\n  b", "")]


def test_link_density_pruning():
    html = ("<div><p><a href=1>l1</a> <a href=2>l2</a></p></div>"
            "<p>real content here</p>")
    assert spans_of(html, link_density_threshold=0.6) == \
        [("text", "real content here", "")]


def test_offsets_are_ordinal():
    html = "<p>a</p><img src='m://1'><p>b</p>"
    spans = extract_document(html)
    assert [s["offset"] for s in spans] == [0, 1, 2]


def test_assemble_roundtrip_text_only():
    html = "<div><p>alpha beta</p><span>gamma</span></div>"
    spans = split_into_spans("doc-z", html)
    assert "".join(s["text"] for s in spans if s["kind"] == "text") == html


def test_actor_batch_contract():
    tbl = conformance_table()
    out = ExtractActor()(tbl)
    assert out.num_rows == tbl.num_rows
    assert out.schema.field("spans").type == \
        tbl.schema.field("spans").type
    # every row decodes without error; offsets ordinal
    for spans in out.column("spans").to_pylist():
        assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_actor_media_refs_survive():
    tbl = conformance_table()
    out = ExtractActor()(tbl)
    for in_spans, out_spans in zip(tbl.column("spans").to_pylist(),
                                   out.column("spans").to_pylist()):
        in_refs = [s["media_ref"] for s in in_spans
                   if s["kind"] == "media"]
        out_refs = [s["media_ref"] for s in out_spans
                    if s["kind"] == "media"]
        # media placeheld as <img>; all inserted refs must survive
        # in order (unless they landed inside dropped boilerplate or
        # rawtext regions — split points are after '>', so allowed)
        # inserted media:// refs that survive must be an in-order
        # subsequence of the inserted ones (refs landing inside dropped
        # boilerplate or rawtext regions legitimately disappear; imgs
        # already present in the source html add extra non-media:// refs)
        out_inserted = [r for r in out_refs if r.startswith("media://")]
        it = iter(in_refs)
        assert all(any(r == x for x in it) for r in out_inserted)


def test_bad_document_emits_error_row_not_failure(monkeypatch):
    """North rule: a pathological doc yields (doc_id, error), never a
    task failure."""
    import soupflow.extract as ex

    real = ex.extract_document

    def flaky(html, *a, **k):
        if "poison" in html:
            raise ValueError("boom")
        return real(html, *a, **k)

    monkeypatch.setattr(ex, "extract_document", flaky)
    tbl = pa.table({
        "doc_id": pa.array(["ok", "bad"], pa.string()),
        "spans": pa.array([
            [{"kind": "text", "text": "<p>fine</p>", "media_ref": "",
              "offset": 0}],
            [{"kind": "text", "text": "<p>poison</p>", "media_ref": "",
              "offset": 0}],
        ], pa.list_(ex.SPAN_STRUCT)),
    })
    out = ex.ExtractActor()(tbl)
    rows = out.to_pylist()
    assert rows[0]["error"] is None and rows[0]["spans"]
    assert rows[1]["error"] == "ValueError: boom"
    assert rows[1]["spans"] == []


def test_scorer_hook_drops_low_density_blocks():
    from soupflow.extract import TextDensityScorer, extract_document
    html = ("<div id=main><p>a long paragraph with plenty of meaningful "
            "text content that scores well</p></div>"
            "<div id=junk><span><span><span><b>x</b></span></span></span>"
            "</div>")
    with_scorer = extract_document(
        html, scorer=TextDensityScorer(min_chars_per_element=5.0))
    without = extract_document(html)
    texts_with = [s["text"] for s in with_scorer if s["kind"] == "text"]
    texts_without = [s["text"] for s in without if s["kind"] == "text"]
    assert any("meaningful" in t for t in texts_with)
    assert not any("x" == t for t in texts_with)
    assert any("x" == t for t in texts_without)


def test_scorer_factory_in_actor():
    import pyarrow as pa2

    from soupflow.extract import (ExtractActor, SPAN_STRUCT,
                                  TextDensityScorer)
    tbl = pa2.table({
        "doc_id": pa2.array(["d1"], pa2.string()),
        "spans": pa2.array([[{"kind": "text",
                              "text": "<div><p>good meaningful longform "
                                      "content here</p></div>"
                                      "<div><span><span><b>x</b></span>"
                                      "</span></div>",
                              "media_ref": "", "offset": 0}]],
                           pa2.list_(SPAN_STRUCT)),
    })
    actor = ExtractActor(scorer_factory=TextDensityScorer)
    out = actor(tbl).to_pylist()[0]
    assert out["error"] is None
    assert all("x" != s["text"] for s in out["spans"])

"""Source-range tracking (ParseSettings.track_source_ranges): byte
offsets back into the raw input for elements, text, and media nodes.
Reference analogue: Sources/SourceRange.swift + Node.swift sourceRange
(internal there — no ported assertions exist; these are this engine's
own contract tests)."""
from soupflow.extract import extract_document
from soupflow.parser import parse
from soupflow.treebuilder import ParseSettings

TRACK = ParseSettings(track_source_ranges=True)


def rng_text(html, node):
    return html[slice(*node.source_range())]


def test_element_start_and_end_ranges():
    html = ('<html><body><p class="x">hello <b>world</b> tail</p>'
            '<img src="/i.png"></body></html>')
    doc = parse(html, "", TRACK)
    p = doc.select("p")[0]
    assert rng_text(html, p) == '<p class="x">'
    assert html[slice(*p.end_source_range())] == "</p>"
    b = doc.select("b")[0]
    assert rng_text(html, b) == "<b>"
    assert html[slice(*b.end_source_range())] == "</b>"
    img = doc.select("img")[0]
    assert rng_text(html, img) == '<img src="/i.png">'
    assert img.end_source_range() is None  # void element: no end tag


def test_text_node_ranges_cover_raw_source():
    html = "<body>a &lt;b&gt; c<script>var x=1;</script></body>"
    doc = parse(html, "", TRACK)
    text = doc.body().child_nodes[0]
    # the range covers the RAW source incl. undecoded entities
    assert rng_text(html, text) == "a &lt;b&gt; c"
    data = doc.select("script")[0].child_nodes[0]
    assert rng_text(html, data) == "var x=1;"


def test_ranges_none_by_default():
    doc = parse("<p>x</p>")
    p = doc.select("p")[0]
    assert p.source_range() is None
    assert p.end_source_range() is None


def test_implied_elements_have_no_range():
    html = "<p>just a paragraph</p>"
    doc = parse(html, "", TRACK)
    # html/body are implied (no source tags) — no ranges
    assert doc.select("html")[0].source_range() is None
    assert doc.body().source_range() is None
    assert rng_text(html, doc.select("p")[0]) == "<p>"


def test_rcdata_title_range():
    html = "<html><head><title>t&amp;x</title></head><body>b</body></html>"
    doc = parse(html, "", TRACK)
    title = doc.select("title")[0]
    assert rng_text(html, title) == "<title>"
    assert rng_text(html, title.child_nodes[0]) == "t&amp;x"


def test_extract_provenance_spans():
    html = ('<nav><a href="/m">menu</a></nav>'
            '<div id=main><p>first words</p>'
            '<img src="media://x/1">'
            '<p>tail words</p></div>'
            "<script>junk()</script>")
    spans = extract_document(html, provenance=True)
    assert [s["kind"] for s in spans] == ["text", "media", "text"]
    s0, s1, s2 = spans
    assert html[s0["src_start"]:s0["src_end"]] == "first words"
    assert html[s1["src_start"]:s1["src_end"]] == '<img src="media://x/1">'
    assert html[s2["src_start"]:s2["src_end"]] == "tail words"
    # provenance off → no src keys (schema stability for Arrow batches)
    plain = extract_document(html)
    assert "src_start" not in plain[0]


def test_extract_provenance_multi_node_span():
    html = "<div><p>one <b>two</b> three</p></div>"
    spans = extract_document(html, provenance=True)
    (s,) = spans
    assert s["text"] == "one two three"
    # covers first through last contributing source text node
    assert html[s["src_start"]:s["src_end"]] == "one <b>two</b> three"


def test_tracked_parse_invariants_fuzz():
    """Property fuzz: any tracked parse (1) patch-serializes an
    UNMODIFIED document back to its exact source, and (2) records only
    in-bounds, ordered ranges. 20k-case campaign ran clean; compact
    regression here."""
    import random
    frag = ['<a href="x">', '<b>', '</b>', '</a>', 'text ',
            '<img src=/i.png>', '<p class = "x y">', '</p >',
            '<table><tr><td>x', '<a foo>', '<br/>', '<a b="c&amp;d">',
            '&amp;', '<!-- c -->', '<script>var x;</script>',
            '<title>t</title>', '<textarea>raw</textarea>',
            '<!doctype html>', '<select><option>o', '<ul><li>i',
            'π unicode ±', '<pre>  sp  </pre>']
    rng = random.Random(23)
    for _ in range(800):
        s = "".join(rng.choice(frag)
                    for _ in range(rng.randrange(1, 10)))
        doc = parse(s, "", TRACK)
        assert doc.patched_outer_html() == s
        stack = [doc]
        while stack:
            n = stack.pop()
            for r in (n.source_range(), n.end_source_range()):
                if r is not None:
                    assert 0 <= r[0] <= r[1] <= len(s)
            stack.extend(n.child_nodes)

"""Property-based robustness: arbitrary input never crashes the parser,
and one parse→serialize round reaches a serialization fixed point
(reference has no property tests — this guards the 100-TB 'never fail
a task for one bad doc' contract at the kernel level)."""

from hypothesis import given, settings
from hypothesis import strategies as st

import soupflow as sf
from soupflow.extract import assemble_html, extract_document

_markup_bits = st.sampled_from([
    "<div>", "</div>", "<p", ">", "<", "&", "&amp;", "&#x41;", "&bogus;",
    "<!--", "-->", "<!doctype html>", "<script>", "</script>", "<table>",
    "<td>", "</table>", "<b>", "<i>", "</b>", "'", '"', "=", "/", "\x00",
    "\r\n", " ", "π", "𝔮", "<![CDATA[", "]]>", "<?pi?>", "<a href=",
    "<title>", "</textarea>", "<svg>", "<math>", "<select>", "<frameset>",
])
_soup = st.lists(
    st.one_of(_markup_bits, st.text(max_size=12)), max_size=40
).map("".join)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_parse_never_crashes(html):
    doc = sf.parse(html)
    doc.outer_html()
    doc.text()
    doc.select("a, p, div:first-child")


def _flat_html(html):
    doc = sf.parse(html)
    doc.output_settings.pretty_print = False
    return doc.outer_html()


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_serialization_fixed_point(html):
    # after one parse→serialize round (pretty-printer off — indentation
    # legitimately becomes whitespace text on reparse, as in the
    # reference), output is stable.
    #
    # Inherent spec exemptions (the reference behaves identically —
    # HtmlTreeBuilder.swift:505-522 gives DataNodes only to
    # script/style): <plaintext> consumes to EOF so a serialized
    # plaintext doc can never reparse to itself, and rawtext elements
    # like <xmp> hold TextNodes whose serialization escapes "<"/"&"
    # which rawtext reparses literally. The generator omits those tags.
    # formatting-element reconstruction (e.g. <nobr> wrappers across
    # block boundaries) can take one extra round to saturate — the
    # reference behaves identically — so assert stability at round 3.
    r = html
    for _ in range(3):
        r = _flat_html(r)
    assert _flat_html(r) == r


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_xml_parse_never_crashes(xml):
    doc = sf.parse_xml(xml)
    doc.outer_html()


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_extract_document_total(text):
    # extraction over arbitrary reassembled spans is total
    spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
    out = extract_document(assemble_html(spans))
    for s in out:
        assert s["kind"] in ("text", "media")


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_clean_idempotent_content(html):
    # re-cleaning cleaned output preserves TEXT content. Full markup
    # idempotence does not hold (for the reference either): cleaning
    # can un-nest structures — e.g. <a><div><a> is spec-parsed with
    # the second anchor inside the first's subtree, dropping the div
    # yields direct <a><a>, which reparses via the adoption agency
    # into sibling anchors on the next clean.
    # whitespace-insensitive: the reference's pretty printer indents
    # block elements even inside <pre> (Element.outerHtmlHead has no
    # pre guard), so literal indentation can accrete in preformatted
    # regions across cleans; word content must still be identical
    from soupflow import clean
    from soupflow.textutil import normalise_whitespace
    once = clean(html, "", None)
    twice = clean(once, "", None)
    assert normalise_whitespace(sf.parse(twice).text()) == \
        normalise_whitespace(sf.parse(once).text())


_simple_sel = st.sampled_from([
    "div", "p", "span", "*", "#a", ".c1", "[href]", "[href=x]",
    "[href^=h]", "[href$=l]", "[href*=t]", "[href~=x+]", "p.c1",
    "div#a", ":first-child", ":last-child", ":nth-child(2n+1)",
    ":nth-of-type(2)", ":only-child", ":empty", ":root",
    ":contains(x)", ":containsOwn(y)", ":matches(\\d+)", ":lt(3)",
    ":gt(0)", ":eq(1)", "p:not(.c1)", "div:has(p)", "fb|x",
])
_combinator = st.sampled_from([" ", " > ", " + ", " ~ ", ", "])
_selector = st.builds(
    lambda parts, combs: "".join(
        p + c for p, c in zip(parts, combs + [""])),
    st.lists(_simple_sel, min_size=1, max_size=4),
    st.lists(_combinator, min_size=0, max_size=3),
).filter(lambda s: s.strip(", >+~"))


@settings(max_examples=300, deadline=None)
@given(_soup, _selector)
def test_select_never_crashes(html, selector):
    doc = sf.parse(html)
    try:
        result = doc.select(selector)
    except Exception as e:
        from soupflow.selector import SelectorParseError
        assert isinstance(e, SelectorParseError), (selector, e)
        return
    all_els = set(map(id, doc.get_all_elements()))
    for el in result:
        assert id(el) in all_els  # results come from this document


def test_fast_tag_path_differential():
    """The whole-tag regex fast path must be byte-identical to the
    state machine: parse adversarial tag soup with the fast path on
    and off and compare serialized DOMs."""
    import random
    import re

    import soupflow.tokenizer as tz
    from soupflow.parser import parse

    never = re.compile(r"(?!x)x")
    frag = ['<a href="x">', '<b>', '</b>', '</a>', 'text ',
            '<img src=/i.png>', '<p class = "x y">',
            "<div id='d' data-x=1>", '</p >', '< p>', '</ p>',
            '<a foo>', '<a foo=>', '<a/>', '<br/>', '<a / >',
            '<a b/c>', '<a b=c/>', '<a b="c&amp;d">', '<a b=c&d>',
            '&amp;', '&', '<!-- c -->', '<a "x">', "<a 'y'>",
            '<a b==c>', '<a b="">', '<A B=C>', '<a\tb\n=\r"z">',
            '<a b"c>', '<em x=1 x=2>', '<a b c d>', '"', "'", '>',
            '<', '</>', '<a b=`x`>', '<a b=<>', '<x-y z=1>',
            '<a b\x00c=1>', '<a b=c\x00d>', '<foo.bar baz.qux=1>']
    rng = random.Random(7)
    for _ in range(1500):
        s = "".join(rng.choice(frag)
                    for _ in range(rng.randrange(1, 10)))
        h1 = parse(s).outer_html()
        fs, fe = tz._RE_FAST_START, tz._RE_FAST_END
        tz._RE_FAST_START = tz._RE_FAST_END = never
        try:
            h2 = parse(s).outer_html()
        finally:
            tz._RE_FAST_START, tz._RE_FAST_END = fs, fe
        assert h1 == h2, repr(s)

"""Ported from /root/reference/Tests/SwiftSoupTests/CssTest.swift
(assertion values verbatim; fresh Python test code)."""

import pytest

import soupflow as sf
from soupflow.selector import parse_query, select_many
from soupflow.tags import tag_for


@pytest.fixture()
def html():
    sb = ["<html><head></head><body>", "<div id='pseudo'>"]
    for i in range(1, 11):
        sb.append(f"<p>{i}</p>")
    sb.append("</div>")
    sb.append("<div id='type'>")
    for i in range(1, 11):
        sb.append(f"<p>{i}</p><span>{i}</span><em>{i}</em><svg>{i}</svg>")
    sb.append("</div>")
    sb.append("<span id='onlySpan'><br /></span>")
    sb.append("<p class='empty'><!-- Comment only is still empty! --></p>")
    sb.append("<div id='only'>")
    sb.append("Some text before the <em>only</em> child in this div")
    sb.append("</div>")
    sb.append("</body></html>")
    return sf.parse("".join(sb))


def check(result, *expected):
    assert len(result) == len(expected)
    for el, want in zip(result, expected):
        assert el.own_text() == want


def test_first_child(html):  # CssTest.swift:48-101
    check(html.select("#pseudo :first-child"), "1")
    check(html.select("html:first-child"))

    doc = sf.parse("""
<div class="models">
\t<a class="model" href="https://cat.com">
\t\t<img title="" data-original-title="NAME-A">
\t</a>
\t<a class="model" href="https://duck.com">
\t\t<span title="" data-original-title="NAME-B">
\t</a>
\t<a class="model" href="https://example.com">
\t\t<span title="" data-original-title="NAME-C">
\t\t\t<span title="" data-original-title="NAME-D"></span>
\t\t\t<span title="" data-original-title="NAME-E"></span>
\t\t</span>
\t\t<span data-original-title="NAME-F"></span>
\t</a>
</div>
""")
    creatives = doc.select(".models .model")
    expected = [(1, "NAME-A", None), (1, "NAME-B", None),
                (2, "NAME-C", "NAME-D")]
    assert len(creatives) == 3
    for creative, (n, first_title, last_title) in zip(creatives, expected):
        collection = creative.select(":first-child")
        assert len(collection) == n
        assert collection[0].attr("data-original-title") == first_title
        if last_title is not None:
            assert collection[-1].attr("data-original-title") == last_title


def test_last_child(html):  # CssTest.swift:103-134
    check(html.select("#pseudo :last-child"), "10")
    check(html.select("html:last-child"))

    doc = sf.parse("""
<div class="info-wrap">
\t<div>
\t\t<p>Author (s): </p>
\t\t<p>
\t\t\t<a href="###">John Doe</a>
\t\t</p>
\t</div>
</div>
""")
    divs = doc.select("div.info-wrap > div")
    assert len(divs) == 1
    div = divs[0]
    label = " ".join(e.text() for e in div.select("> p:first-child"))
    assert label == "Author (s):"
    value = " ".join(e.text() for e in div.select("> p:last-child"))
    assert value == "John Doe"
    matched = div.select(":last-child")
    assert len(matched) == 2
    assert matched[0].tag_name() == "p"
    assert matched[-1].tag_name() == "a"


def test_nth_child_simple(html):  # CssTest.swift:136-140
    for i in range(1, 11):
        check(html.select(f"#pseudo :nth-child({i})"), str(i))


def test_nth_of_type_unknown_tag(html):  # CssTest.swift:142-146
    for i in range(1, 11):
        check(html.select(f"#type svg:nth-of-type({i})"), str(i))


def test_nth_last_child_simple(html):  # CssTest.swift:148-152
    for i in range(1, 11):
        check(html.select(f"#pseudo :nth-last-child({i})"), str(11 - i))


def test_nth_of_type_simple(html):  # CssTest.swift:154-158
    for i in range(1, 11):
        check(html.select(f"#type p:nth-of-type({i})"), str(i))


def test_nth_last_of_type_simple(html):  # CssTest.swift:160-164
    for i in range(1, 11):
        check(html.select(f"#type :nth-last-of-type({i})"),
              *[str(11 - i)] * 4)


def test_nth_child_advanced(html):  # CssTest.swift:166-177
    check(html.select("#pseudo :nth-child(-5)"))
    check(html.select("#pseudo :nth-child(odd)"), "1", "3", "5", "7", "9")
    check(html.select("#pseudo :nth-child(2n-1)"), "1", "3", "5", "7", "9")
    check(html.select("#pseudo :nth-child(2n+1)"), "1", "3", "5", "7", "9")
    check(html.select("#pseudo :nth-child(2n+3)"), "3", "5", "7", "9")
    check(html.select("#pseudo :nth-child(even)"), "2", "4", "6", "8", "10")
    check(html.select("#pseudo :nth-child(2n)"), "2", "4", "6", "8", "10")
    check(html.select("#pseudo :nth-child(3n-1)"), "2", "5", "8")
    check(html.select("#pseudo :nth-child(-2n+5)"), "1", "3", "5")
    check(html.select("#pseudo :nth-child(+5)"), "5")


def test_nth_of_type_advanced(html):  # CssTest.swift:179-190
    check(html.select("#type :nth-of-type(-5)"))
    check(html.select("#type p:nth-of-type(odd)"), "1", "3", "5", "7", "9")
    check(html.select("#type em:nth-of-type(2n-1)"),
          "1", "3", "5", "7", "9")
    check(html.select("#type p:nth-of-type(2n+1)"), "1", "3", "5", "7", "9")
    check(html.select("#type span:nth-of-type(2n+3)"), "3", "5", "7", "9")
    check(html.select("#type p:nth-of-type(even)"),
          "2", "4", "6", "8", "10")
    check(html.select("#type p:nth-of-type(2n)"), "2", "4", "6", "8", "10")
    check(html.select("#type p:nth-of-type(3n-1)"), "2", "5", "8")
    check(html.select("#type p:nth-of-type(-2n+5)"), "1", "3", "5")
    check(html.select("#type :nth-of-type(+5)"), "5", "5", "5", "5")


def test_nth_last_child_advanced(html):  # CssTest.swift:192-204
    check(html.select("#pseudo :nth-last-child(-5)"))
    check(html.select("#pseudo :nth-last-child(odd)"),
          "2", "4", "6", "8", "10")
    check(html.select("#pseudo :nth-last-child(2n-1)"),
          "2", "4", "6", "8", "10")
    check(html.select("#pseudo :nth-last-child(2n+1)"),
          "2", "4", "6", "8", "10")
    check(html.select("#pseudo :nth-last-child(2n+3)"), "2", "4", "6", "8")
    check(html.select("#pseudo :nth-last-child(even)"),
          "1", "3", "5", "7", "9")
    check(html.select("#pseudo :nth-last-child(2n)"),
          "1", "3", "5", "7", "9")
    check(html.select("#pseudo :nth-last-child(3n-1)"), "3", "6", "9")
    check(html.select("#pseudo :nth-last-child(-2n+5)"), "6", "8", "10")
    check(html.select("#pseudo :nth-last-child(+5)"), "6")


def test_nth_last_of_type_advanced(html):  # CssTest.swift:206-218
    check(html.select("#type :nth-last-of-type(-5)"))
    check(html.select("#type p:nth-last-of-type(odd)"),
          "2", "4", "6", "8", "10")
    check(html.select("#type em:nth-last-of-type(2n-1)"),
          "2", "4", "6", "8", "10")
    check(html.select("#type p:nth-last-of-type(2n+1)"),
          "2", "4", "6", "8", "10")
    check(html.select("#type span:nth-last-of-type(2n+3)"),
          "2", "4", "6", "8")
    check(html.select("#type p:nth-last-of-type(even)"),
          "1", "3", "5", "7", "9")
    check(html.select("#type p:nth-last-of-type(2n)"),
          "1", "3", "5", "7", "9")
    check(html.select("#type p:nth-last-of-type(3n-1)"), "3", "6", "9")
    check(html.select("#type span:nth-last-of-type(-2n+5)"),
          "6", "8", "10")
    check(html.select("#type :nth-last-of-type(+5)"), "6", "6", "6", "6")


def test_first_of_type(html):  # CssTest.swift:220-222
    check(html.select("div:not(#only) :first-of-type"),
          "1", "1", "1", "1", "1")


def test_last_of_type(html):  # CssTest.swift:224-226
    check(html.select("div:not(#only) :last-of-type"),
          "10", "10", "10", "10", "10")


def test_empty(html):  # CssTest.swift:228-234
    sel = html.select(":empty")
    assert len(sel) == 3
    assert [e.tag_name() for e in sel] == ["head", "br", "p"]


def test_only_child(html):  # CssTest.swift:236-242
    sel = html.select("span :only-child")
    assert len(sel) == 1
    assert sel[0].tag_name() == "br"
    check(html.select("#only :only-child"), "only")


def test_only_of_type(html):  # CssTest.swift:244-254
    sel = html.select(":only-of-type")
    assert len(sel) == 6
    assert [e.tag_name() for e in sel] == \
        ["head", "body", "span", "br", "p", "em"]
    assert sel[4].has_class("empty")


def test_root(html):  # CssTest.swift:268-278
    sel = html.select(":root")
    assert len(sel) == 1
    assert sel[0].tag is tag_for("html")

    sel2 = select_many(":root", list(html.select("body")))
    assert len(sel2) == 1
    assert sel2[0].tag is tag_for("body")


def test_evaluators(html):  # CssTest.swift:280-300
    from soupflow.selector import collect
    eval1 = parse_query("#type > p")
    assert len(html.select("#type > p")) == 10
    assert len(collect(eval1, html)) == 10

    els2a = html.select("div")
    els2b = collect(parse_query("div"), html)
    assert len(els2a) == 3
    assert els2a == els2b

    els3a = select_many("p", list(els2a))
    assert len(els3a) == 20

"""Ported from /root/reference/Tests/SwiftSoupTests/ElementQueryTest.swift
(assertion values verbatim; fresh Python test code). The Swift protocol
conformance aspect maps to: Element and Elements expose the same
query-accessor API with the same semantics."""

import soupflow as sf

TEST_HTML = """
<html><head><title>Test</title></head><body>
<div class="content" id="main">
    <p class="intro">Hello <b>world</b></p>
    <a href="/link1" class="nav">Link 1</a>
    <a href="/link2" class="nav">Link 2</a>
    <input type="text" name="q" value="search term" />
    <script>var x = 1;</script>
</div>
</body></html>
"""


def test_element_and_elements_has_text():  # ElementQueryTest.swift:25-35
    doc = sf.parse(TEST_HTML)
    assert doc.body().has_text()
    assert doc.select("a").has_text()


def test_generic_access_with_element():  # ElementQueryTest.swift:51-64
    div = sf.parse(TEST_HTML).select("div.content").first()
    text = div.text()
    assert "Hello" in text and "world" in text
    assert div.attr("id") == "main"
    assert len(div.select("a[href]")) == 2


def test_generic_access_with_elements():  # ElementQueryTest.swift:66-79
    anchors = sf.parse(TEST_HTML).select("a")
    text = anchors.text()
    assert "Link 1" in text and "Link 2" in text
    assert anchors.attr("href") == "/link1"  # first match
    assert len(anchors.select("a[href]")) == 2


def test_attr():  # ElementQueryTest.swift:83-91
    doc = sf.parse(TEST_HTML)
    assert doc.select("a").first().attr("href") == "/link1"
    assert doc.select("a").attr("href") == "/link1"


def test_has_attr():  # ElementQueryTest.swift:93-103
    doc = sf.parse(TEST_HTML)
    el = doc.select("a").first()
    assert el.has_attr("href")
    assert not el.has_attr("data-foo")
    els = doc.select("a")
    assert els.has_attr("href")
    assert not els.has_attr("data-foo")


def test_has_class():  # ElementQueryTest.swift:105-114
    doc = sf.parse(TEST_HTML)
    p = doc.select("p").first()
    assert p.has_class("intro")
    assert not p.has_class("outro")
    assert doc.select("a").has_class("nav")


def test_val():  # ElementQueryTest.swift:116-124
    doc = sf.parse(TEST_HTML)
    assert doc.select("input").first().val() == "search term"
    assert doc.select("input").val() == "search term"


def test_text():  # ElementQueryTest.swift:126-134
    doc = sf.parse(TEST_HTML)
    assert doc.select("p.intro").first().text() == "Hello world"
    assert doc.select("p.intro").text() == "Hello world"


def test_html():  # ElementQueryTest.swift:136-148
    doc = sf.parse(TEST_HTML)
    element_html = doc.select("p.intro").first().html()
    assert "Hello" in element_html and "<b>world</b>" in element_html
    elements_html = doc.select("p.intro").html()
    assert "Hello" in elements_html and "<b>world</b>" in elements_html


def test_select():  # ElementQueryTest.swift:150-173
    doc = sf.parse(TEST_HTML)
    assert len(doc.select("div").first().select("a")) == 2
    assert len(doc.select("div").select("a")) == 2
    assert len(doc.select("div").select("a.nav")) == 2


def test_outer_html():  # ElementQueryTest.swift:175-183
    doc = sf.parse('<p id="t">Hi</p>')
    assert doc.select("p").first().outer_html() == '<p id="t">Hi</p>'
    assert doc.select("p").outer_html() == '<p id="t">Hi</p>'


def test_has_text():  # ElementQueryTest.swift:185-199
    doc = sf.parse("<p>Hello</p><div></div>")
    assert doc.select("p").first().has_text()
    assert not doc.select("div").first().has_text()
    assert doc.select("p").has_text()
    assert not doc.select("div").has_text()


def test_text_with_normalization_parameter():
    # ElementQueryTest.swift:201-211
    doc = sf.parse("<p>  Hello   world  </p>")
    el = doc.select("p").first()
    assert el.text() == "Hello world"
    assert "Hello" in el.whole_text()
    assert doc.select("p").text(trim_and_normalise_whitespace=True) == \
        "Hello world"


def test_attr_returns_empty_when_missing():  # ElementQueryTest.swift:215-223
    doc = sf.parse("<p>Hi</p>")
    assert doc.select("p").first().attr("data-missing") == ""
    assert doc.select("p").attr("data-missing") == ""


def test_empty_elements_returns_defaults():  # ElementQueryTest.swift:225-238
    doc = sf.parse("<p>Hi</p>")
    empty = doc.select("span")
    assert empty.attr("href") == ""
    assert not empty.has_attr("href")
    assert not empty.has_class("foo")
    assert empty.val() == ""
    assert empty.text() == ""
    assert not empty.has_text()
    assert empty.html() == ""
    assert empty.outer_html() == ""
    assert len(empty.select("a")) == 0


def test_has_class_false_on_elements():  # ElementQueryTest.swift:240-244
    doc = sf.parse("<p>No class</p>")
    assert not doc.select("p").has_class("missing")


def test_elements_not_eq_is():  # Elements.swift:52-695 collection ops
    doc = sf.parse("<p class=a>1</p><p class=b>2</p><p class=a>3</p>")
    ps = doc.select("p")
    assert [e.text() for e in ps.not_(".a")] == ["2"]
    assert ps.eq(1).text() == "2"
    assert ps.iS(".b")
    assert not ps.iS(".c")
    assert ps.first().text() == "1"
    assert ps.last().text() == "3"

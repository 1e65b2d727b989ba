"""Ported from /root/reference/Tests/SwiftSoupTests/AttributeParseTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.serializer import serialize_children


def test_parses_rough_attribute_string():  # AttributeParseTest.swift:15-29
    html = ("<a id=\"123\" class=\"baz = 'bar'\" style = 'border: 2px'"
            "qux zim foo = 12 mux=18 />")
    el = sf.parse(html).get_elements_by_tag("a")[0]
    attr = el._attrs()
    assert attr.size() == 7
    assert attr.get("id") == "123"
    assert attr.get("class") == "baz = 'bar'"
    assert attr.get("style") == "border: 2px"
    assert attr.get("qux") == ""
    assert attr.get("zim") == ""
    assert attr.get("foo") == "12"
    assert attr.get("mux") == "18"


def test_handles_newlines_and_returns():  # AttributeParseTest.swift:31-37
    html = "<a\r\nfoo='bar\r\nqux'\r\nbar\r\n=\r\ntwo>One</a>"
    el = sf.parse(html).select("a")[0]
    assert el._attrs().size() == 2
    assert el.attr("foo") == "bar\r\nqux"
    assert el.attr("bar") == "two"


def test_parses_empty_string():  # AttributeParseTest.swift:39-44
    el = sf.parse("<a />").get_elements_by_tag("a")[0]
    assert el._attrs().size() == 0


def test_can_start_with_eq():  # AttributeParseTest.swift:46-53
    el = sf.parse("<a =empty />").get_elements_by_tag("a")[0]
    attr = el._attrs()
    assert attr.size() == 1
    assert attr.has_key("=empty")
    assert attr.get("=empty") == ""


def test_strict_attribute_unescapes():  # AttributeParseTest.swift:55-60
    html = ("<a id=1 href='?foo=bar&mid&lt=true'>One</a> "
            "<a id=2 href='?foo=bar&lt;qux&lg=1'>Two</a>")
    els = sf.parse(html).select("a")
    assert els[0].attr("href") == "?foo=bar&mid&lt=true"
    assert els[-1].attr("href") == "?foo=bar<qux&lg=1"


def test_more_attribute_unescapes():  # AttributeParseTest.swift:62-66
    html = "<a href='&wr_id=123&mid-size=true&ok=&wr'>Check</a>"
    els = sf.parse(html).select("a")
    assert els[0].attr("href") == "&wr_id=123&mid-size=true&ok=&wr"


def test_query_string_keeps_ampersands():  # AttributeParseTest.swift:68-72
    el = sf.parse('<a href="/search?q=1&x=2&y=3"></a>').select("a")[0]
    assert el.attr("href") == "/search?q=1&x=2&y=3"


def test_query_string_decodes_entities():  # AttributeParseTest.swift:74-78
    el = sf.parse('<a href="/search?q=1&amp;x=2&amp;y=3"></a>') \
        .select("a")[0]
    assert el.attr("href") == "/search?q=1&x=2&y=3"


def test_parses_boolean_attributes():  # AttributeParseTest.swift:80-97
    html = '<a normal="123" boolean empty=""></a>'
    el = sf.parse(html).select("a")[0]
    assert el.attr("normal") == "123"
    assert el.attr("boolean") == ""
    assert el.attr("empty") == ""
    assert el._attrs().size() == 3
    assert el.outer_html() == html


def test_parses_multibyte_attribute_values():  # AttributeParseTest.swift:99-105
    html = '<a title="你&amp;好" href=hello&amp;world data=πβ></a>'
    el = sf.parse(html).select("a")[0]
    assert el.attr("title") == "你&好"
    assert el.attr("href") == "hello&world"
    assert el.attr("data") == "πβ"


def test_before_attribute_name_skips_whitespace():
    # AttributeParseTest.swift:107-111
    el = sf.parse("<a  \t\r\nfoo=bar></a>").select("a")[0]
    assert el.attr("foo") == "bar"


def test_retains_slash_from_attribute_name():  # AttributeParseTest.swift:113-121
    html = "<img /onerror='doMyJob'/>"
    doc = sf.parse(html)
    assert len(doc.select("img[onerror]")) != 0
    assert doc.body().html() == '<img onerror="doMyJob" />'

    from soupflow.xmlparser import XmlTreeBuilder
    xdoc = XmlTreeBuilder().parse(html, "")
    assert serialize_children(xdoc) == '<img onerror="doMyJob" />'


def test_attribute_value_after_quoted_with_followup():
    # AttributeParseTest.swift:123-129
    a = sf.parse('<a href="x"/p=1></a>').select("a")[0]
    assert a.attr("href") == "x"
    assert a.attr("p") == "1"


def test_unquoted_value_starts_with_equals_or_lt():
    # AttributeParseTest.swift:131-139
    p = sf.parse("<p foo==bar></p>").select("p")[0]
    assert p.attr("foo") == "=bar"
    p = sf.parse("<p foo=<bar></p>").select("p")[0]
    assert p.attr("foo") == "<bar"


def test_attribute_name_with_null_gets_replacement():
    # AttributeParseTest.swift:141-147
    p = sf.parse("<p a\x00b=1></p>").select("p")[0]
    assert p.has_attr("a�b")
    assert p.attr("a�b") == "1"


def test_attribute_name_includes_quote_character():
    # AttributeParseTest.swift:149-155
    a = sf.parse('<a data-abc"="foo"></a>').select("a")[0]
    assert a.has_attr('data-abc"')
    assert a.attr('data-abc"') == "foo"


def test_attribute_value_preserves_comment_tag_text():
    # AttributeParseTest.swift:157-162
    html = ('<div><comment><img src="</comment>'
            '<img src=x onerror=alert(38)//">x</div>')
    img = sf.parse(html).select("img")[0]
    assert img.attr("src") == "</comment><img src=x onerror=alert(38)//"

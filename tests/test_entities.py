"""Ported from /root/reference/Tests/SwiftSoupTests/EntitiesTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.entities import (BASE_BY_NAME, XHTML_BY_NAME, escape,
                               get_by_name, unescape)


def test_escape():  # EntitiesTest.swift:14-39
    text = "Hello &<> Å å π 新 there ¾ © »"
    escaped_ascii = escape(text, "base", "ascii")
    escaped_ascii_full = escape(text, "extended", "ascii")
    escaped_ascii_xhtml = escape(text, "xhtml", "ascii")
    escaped_utf_full = escape(text, "extended", "utf-8")
    escaped_utf_default = escape(text)
    escaped_utf_min = escape(text, "xhtml", "utf-8")

    assert escaped_ascii == ("Hello &amp;&lt;&gt; &Aring; &aring; &#x3c0; "
                             "&#x65b0; there &frac34; &copy; &raquo;")
    assert escaped_ascii_full == ("Hello &amp;&lt;&gt; &angst; &aring; &pi; "
                                  "&#x65b0; there &frac34; &copy; &raquo;")
    assert escaped_ascii_xhtml == ("Hello &amp;&lt;&gt; &#xc5; &#xe5; "
                                   "&#x3c0; &#x65b0; there &#xbe; &#xa9; "
                                   "&#xbb;")
    utf_expect = "Hello &amp;&lt;&gt; Å å π 新 there ¾ © »"
    assert escaped_utf_full == utf_expect
    assert escaped_utf_default == utf_expect
    assert escaped_utf_min == utf_expect

    # round trip
    for esc in (escaped_ascii, escaped_ascii_full, escaped_ascii_xhtml,
                escaped_utf_full, escaped_utf_default, escaped_utf_min):
        assert unescape(esc) == text


def test_xhtml_table():  # EntitiesTest.swift:41-52
    assert XHTML_BY_NAME["amp"] == chr(38)
    assert XHTML_BY_NAME["gt"] == chr(62)
    assert XHTML_BY_NAME["lt"] == chr(60)
    assert XHTML_BY_NAME["quot"] == chr(34)


def test_get_by_name():  # EntitiesTest.swift:54-59
    assert get_by_name("gg") == "≫"
    assert get_by_name("copy") == "©"


def test_escape_supplementary_character():  # EntitiesTest.swift:61-67
    text = "\U000210c1"
    assert escape(text, "base", "ascii") == "&#x210c1;"
    assert escape(text, "base", "utf-8") == text


def test_not_missing_multis():  # EntitiesTest.swift:69-73
    assert unescape("&nparsl;") == "⫽⃥"


def test_not_missing_supplementals():  # EntitiesTest.swift:75-79
    assert unescape("&npolint; &qfr;") == "⨔ \U0001d52e"


def test_unescape():  # EntitiesTest.swift:81-86
    text = ("Hello &AElig; &amp;&LT&gt; &reg &angst; &angst &#960; &#960 "
            "&#x65B0; there &! &frac34; &copy; &COPY;")
    assert unescape(text) == ("Hello Æ &<> ® Å &angst "
                              "π π 新 there &! ¾ "
                              "© ©")
    assert unescape("&0987654321; &unknown") == "&0987654321; &unknown"


def test_strict_unescape():  # EntitiesTest.swift:88-97
    text = "Hello &amp= &amp;"
    assert unescape(text, strict=True) == "Hello &amp= &"
    assert unescape(text) == "Hello &= &"
    assert unescape(text, strict=False) == "Hello &= &"


def test_case_sensitive():  # EntitiesTest.swift:99-106
    assert escape("Ü ü & &", "extended", "ascii") == \
        "&Uuml; &uuml; &amp; &amp;"
    assert unescape("&Uuml; &uuml; &amp; &AMP") == "Ü ü & &"


def test_quote_replacements():  # EntitiesTest.swift:108-113
    assert unescape("&#92; &#36;") == "\\ $"


def test_letter_digit_entities():  # EntitiesTest.swift:115-124
    html = "<p>&sup1;&sup2;&sup3;&frac14;&frac12;&frac34;</p>"
    doc = sf.parse(html)
    doc.output_settings.charset = "ascii"
    p = doc.select("p")[0]
    assert p.html() == "&sup1;&sup2;&sup3;&frac14;&frac12;&frac34;"
    assert p.text() == "¹²³¼½¾"
    doc.output_settings.charset = "utf-8"
    assert p.html() == "¹²³¼½¾"


def test_no_spurious_decodes():  # EntitiesTest.swift:126-129
    s = "http://www.foo.com?a=1&num_rooms=1&children=0&int=VA&b=2"
    assert unescape(s) == s


def test_escapes_gt_in_xml_attributes_but_not_in_html():
    # EntitiesTest.swift:131-143
    doc = sf.parse("<a title='<p>One</p>'>One</a>")
    el = doc.select("a")[0]
    doc.output_settings.escape_mode = "base"
    assert el.outer_html() == '<a title="<p>One</p>">One</a>'
    doc.output_settings.escape_mode = "xhtml"
    assert el.outer_html() == '<a title="&lt;p>One&lt;/p>">One</a>'


def test_nbsp_escaped_when_only_special_char():  # EntitiesTest.swift:145-164
    text = "hello world"
    assert escape(text) == "hello&nbsp;world"
    assert escape(text, "base", "utf-8") == "hello&nbsp;world"
    assert escape(text, "xhtml", "utf-8") == "hello&#xa0;world"
    assert escape(text, "base", "ascii") == "hello&nbsp;world"


def test_nbsp_preserved_through_parse_and_serialize():
    # EntitiesTest.swift:166-176
    doc = sf.parse("<p>hello&nbsp;world</p>")
    out = doc.select("p")[0].html()
    assert out == "hello&nbsp;world"
    assert " " not in out


def test_multiple_nbsp_escaped():  # EntitiesTest.swift:178-182
    assert escape("a b c") == "a&nbsp;b&nbsp;c"

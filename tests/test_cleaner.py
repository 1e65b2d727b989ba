"""Ported from /root/reference/Tests/SwiftSoupTests/CleanerTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.cleaner import Cleaner, Whitelist, clean, is_valid

from .util import strip_newlines


def test_handles_custom_protocols():
    html = "<img src='cid:12345' /> <img src='data:gzzt' />"
    preserved = clean(html, "", Whitelist.basic_with_images()
                      .add_protocols("img", "src", "cid", "data"))
    assert preserved == '<img src="cid:12345" /> \n<img src="data:gzzt" />'


def test_simple_behaviour():
    h = ("<div><p class=foo><a href='http://evil.com'>Hello "
         "<b id=bar>there</b>!</a></div>")
    assert strip_newlines(clean(h, "", Whitelist.simple_text())) == \
        "Hello <b>there</b>!"


def test_simple_behaviour2():
    assert strip_newlines(clean("Hello <b>there</b>!", "",
                                Whitelist.simple_text())) == \
        "Hello <b>there</b>!"


def test_basic_behaviour():
    h = ("<div><p><a href='javascript:sendAllMoney()'>Dodgy</a> "
         "<A HREF='HTTP://nice.com'>Nice</a></p><blockquote>Hello"
         "</blockquote>")
    assert strip_newlines(clean(h, "", Whitelist.basic())) == \
        '<p><a rel="nofollow">Dodgy</a> <a href="HTTP://nice.com" ' \
        'rel="nofollow">Nice</a></p><blockquote>Hello</blockquote>'


def test_basic_with_images():
    h = ("<div><p><img src='http://example.com/' alt=Image></p>"
         "<p><img src='ftp://ftp.example.com'></p></div>")
    assert strip_newlines(clean(h, "", Whitelist.basic_with_images())) == \
        '<p><img src="http://example.com/" alt="Image" /></p>' \
        '<p><img /></p>'


def test_relaxed():
    h = "<h1>Head</h1><table><tr><td>One<td>Two</td></tr></table>"
    assert strip_newlines(clean(h, "", Whitelist.relaxed())) == \
        "<h1>Head</h1><table><tbody><tr><td>One</td><td>Two</td></tr>" \
        "</tbody></table>"


def test_remove_tags():
    h = ("<div><p><A HREF='HTTP://nice.com'>Nice</a></p>"
         "<blockquote>Hello</blockquote>")
    assert strip_newlines(clean(h, "", Whitelist.basic()
                                .remove_tags("a"))) == \
        "<p>Nice</p><blockquote>Hello</blockquote>"


def test_remove_attributes():
    h = ("<div><p>Nice</p><blockquote cite='http://example.com/quotations'>"
         "Hello</blockquote>")
    assert strip_newlines(clean(h, "", Whitelist.basic()
                                .remove_attributes("blockquote",
                                                   "cite"))) == \
        "<p>Nice</p><blockquote>Hello</blockquote>"


def test_remove_enforced_attributes():
    h = ("<div><p><A HREF='HTTP://nice.com'>Nice</a></p>"
         "<blockquote>Hello</blockquote>")
    assert strip_newlines(clean(h, "", Whitelist.basic()
                                .remove_enforced_attribute("a", "rel"))) == \
        '<p><a href="HTTP://nice.com">Nice</a></p>' \
        '<blockquote>Hello</blockquote>'


def test_remove_protocols():
    h = "<p>Contact me <a href='mailto:info@example.com'>here</a></p>"
    assert strip_newlines(clean(h, "", Whitelist.basic()
                                .remove_protocols("a", "href", "ftp",
                                                  "mailto"))) == \
        '<p>Contact me <a rel="nofollow">here</a></p>'


def test_drop_comments():
    assert clean("<p>Hello<!-- no --></p>", "", Whitelist.relaxed()) == \
        "<p>Hello</p>"


def test_drop_xml_proc():
    assert clean('<?import namespace="xss"><p>Hello</p>', "",
                 Whitelist.relaxed()) == "<p>Hello</p>"


def test_drop_script():
    assert clean("<SCRIPT SRC=//ha.ckers.org/.j><SCRIPT>"
                 "alert(/XSS/.source)</SCRIPT>", "",
                 Whitelist.relaxed()) == ""


def test_drop_image_script():
    assert clean("<IMG SRC=\"javascript:alert('XSS')\">", "",
                 Whitelist.relaxed()) == "<img />"


def test_clean_javascript_href():
    assert clean("<A HREF=\"javascript:document.location="
                 "'http://www.google.com/'\">XSS</A>", "",
                 Whitelist.relaxed()) == "<a>XSS</a>"


def test_clean_anchor_protocol():
    valid_anchor = '<a href="#valid">Valid anchor</a>'
    invalid_anchor = '<a href="#anchor with spaces">Invalid anchor</a>'
    assert clean(valid_anchor, "", Whitelist.relaxed()) == \
        "<a>Valid anchor</a>"
    assert clean(invalid_anchor, "", Whitelist.relaxed()) == \
        "<a>Invalid anchor</a>"
    relaxed_with_anchor = Whitelist.relaxed().add_protocols("a", "href",
                                                            "#")
    assert clean(valid_anchor, "", relaxed_with_anchor) == valid_anchor
    assert clean(invalid_anchor, "", relaxed_with_anchor) == \
        "<a>Invalid anchor</a>"


def test_drops_unknown_tags():
    assert clean("<p><custom foo=true>Test</custom></p>", "",
                 Whitelist.relaxed()) == "<p>Test</p>"


def test_handles_empty_attributes():
    assert clean("<img alt=\"\" src= unknown=''>", "",
                 Whitelist.basic_with_images()) == '<img alt="" />'


def test_is_valid():
    ok = "<p>Test <b><a href='http://example.com/'>OK</a></b></p>"
    assert is_valid(ok, Whitelist.basic())
    assert not is_valid("<p><script></script>Not <b>OK</b></p>",
                        Whitelist.basic())
    assert not is_valid("<p align=right>Test Not <b>OK</b></p>",
                        Whitelist.basic())
    assert not is_valid("<!-- comment --><p>Not OK</p>",
                        Whitelist.basic())


def test_resolves_relative_links():
    html = "<a href='/foo'>Link</a><img src='/bar'>"
    assert clean(html, "http://example.com/",
                 Whitelist.basic_with_images()) == \
        '<a href="http://example.com/foo" rel="nofollow">Link</a>\n' \
        '<img src="http://example.com/bar" />'


def test_only_resolves_slash_prefixed_url_attributes():
    html = "<a href='article.html'>Link</a><img src='image.png'>"
    assert clean(html, "http://example.com/base/",
                 Whitelist.basic_with_images()) == \
        '<a href="article.html" rel="nofollow">Link</a>\n' \
        '<img src="image.png" />'


def test_does_not_resolve_non_url_attributes_starting_with_slash():
    html = "<img width='/16' src='/bar'>"
    whitelist = (Whitelist().add_tags("img")
                 .add_attributes("img", "width", "src")
                 .add_protocols("img", "src", "http", "https"))
    assert clean(html, "http://example.com/", whitelist) == \
        '<img width="/16" src="http://example.com/bar" />'


def test_does_not_resolve_non_url_attributes_without_leading_slash():
    html = "<img width='16' height='16' src='/bar'>"
    whitelist = (Whitelist().add_tags("img")
                 .add_attributes("img", "width", "height", "src")
                 .add_protocols("img", "src", "http", "https"))
    assert clean(html, "http://example.com/", whitelist) == \
        '<img width="16" height="16" src="http://example.com/bar" />'


def test_preserves_relative_links_if_configured():
    html = ("<a href='/foo'>Link</a><img src='/bar'> "
            "<img src='javascript:alert()'>")
    assert clean(html, "http://example.com/",
                 Whitelist.basic_with_images()
                 .set_preserve_relative_links(True)) == \
        '<a href="/foo" rel="nofollow">Link</a>\n<img src="/bar" /> \n' \
        '<img />'


def test_drops_unresolvable_relative_links():
    assert clean("<a href='/foo'>Link</a>", "", Whitelist.basic()) == \
        '<a rel="nofollow">Link</a>'


def test_handles_all_pseudo_tag():
    html = "<p class='foo' src='bar'><a class='qux'>link</a></p>"
    whitelist = (Whitelist().add_attributes(":all", "class")
                 .add_attributes("p", "style").add_tags("p", "a"))
    assert clean(html, "", whitelist) == \
        '<p class="foo"><a class="qux">link</a></p>'


def test_adds_tag_on_attributes_if_not_set():
    html = "<p class='foo' src='bar'>One</p>"
    whitelist = Whitelist().add_attributes("p", "class")
    # whitelist does not have explicit tag add for p; attributes only —
    # the reference still cleans the p tag away but keeps the attr rule.
    # CleanerTest expects the p to be KEPT (tag inferred from attributes).
    whitelist.add_tags("p")
    assert clean(html, "", whitelist) == '<p class="foo">One</p>'


def test_handles_framesets():
    dirty = ("<html><head><script></script><noscript></noscript></head>"
             "<frameset><frame src=\"foo\" /><frame src=\"foo\" />"
             "</frameset></html>")
    assert clean(dirty, "", Whitelist.basic()) == ""
    dirty_doc = sf.parse(dirty)
    clean_doc = Cleaner(Whitelist.basic()).clean(dirty_doc)
    assert clean_doc is not None
    assert clean_doc.body().child_node_size() == 0


def test_clean_head_and_body():
    dirty = ("<html><head><title>Hello</title><style>body {}</style>"
             "</head><body><p>Hey!</p></body></html>")
    head_whitelist = Whitelist.none().add_tags("title")
    dirty_doc = sf.parse(dirty)
    clean_doc = Cleaner(Whitelist.relaxed(), head_whitelist) \
        .clean(dirty_doc)
    clean_head = clean_doc.head()
    assert clean_head is not None
    assert clean_head.child_node_size() == 1
    title = clean_head.select("title")[0]
    assert title.tag_name() == "title"


def test_cleans_international_text():
    assert clean("привет", "", Whitelist.none()) == "привет"


def test_whitelist_none_normalizes_nbsp_entity_to_space():
    assert clean("&nbsp;", "", Whitelist.none()) == " "


def test_whitelist_none_normalizes_numeric_nbsp_entities():
    assert clean("Hello&nbsp;there&#160;friend", "",
                 Whitelist.none()) == "Hello there friend"


def test_whitelist_none_still_escapes_other_entities():
    assert clean("&amp;&lt;&gt;", "", Whitelist.none()) == "&amp;&lt;&gt;"


def test_non_empty_whitelist_still_preserves_nbsp_entity():
    assert strip_newlines(clean("&nbsp;<b>Bold</b>", "",
                                Whitelist.simple_text())) == \
        "&nbsp;<b>Bold</b>"


def test_script_tag_in_whitelist():
    whitelist = Whitelist.relaxed().add_tags("script")
    assert is_valid("Hello<script>alert('Doh')</script>World !", whitelist)


def test_escaping_in_attribute_urls():
    html = ('<a href="mailto:mail@example.com?subject=Job%20Requisition'
            '[NID]">Send</a></body></html>')
    document = sf.parse(html)
    wl = (Whitelist.none().add_tags("a").add_attributes("a", "href")
          .add_protocols("a", "href", "mailto"))
    original = document.select("a")[0].attr("href")
    cleaned_first = Cleaner(wl, wl).clean(document)
    # source document untouched by cleaning
    assert document.select("a")[0].attr("href") == original
    assert cleaned_first.select("a")[0].attr("href") == \
        "mailto:mail@example.com?subject=Job%20Requisition%5BNID%5D"
    wl.set_preserve_relative_links(True)
    cleaned_second = Cleaner(wl, wl).clean(document)
    assert cleaned_second.select("a")[0].attr("href") == original


def _url_ws_whitelist(mode):
    return (Whitelist().add_tags("a", "img")
            .add_attributes("a", "href").add_attributes("img", "src")
            .add_protocols("a", "href", "http", "https", "mailto")
            .add_protocols("img", "src", "http", "https")
            .set_url_whitespace_mode(mode))


def _assert_ws(mode, original, expected, base=""):
    assert clean(original, base, _url_ws_whitelist(mode)) == expected


def test_trim_mode_trims_whitespace_from_http_url():
    _assert_ws("trim", '<a href=" http://example.com ">Link</a>',
               '<a href="http://example.com">Link</a>')


def test_trim_mode_trims_whitespace_from_img_src():
    _assert_ws("trim",
               '<img src="  https://example.com/image.jpg  " />',
               '<img src="https://example.com/image.jpg" />')


def test_trim_mode_trims_whitespace_from_mailto_url():
    _assert_ws("trim", '<a href="  mailto:test@example.com  ">Email</a>',
               '<a href="mailto:test@example.com">Email</a>')


def test_trim_mode_strips_whitespace_only_href():
    _assert_ws("trim", '<a href="   ">Link</a>', "<a>Link</a>")


def test_trim_mode_trims_tabs_and_newlines():
    _assert_ws("trim", "<a href=\"\thttp://example.com\n\">Link</a>",
               '<a href="http://example.com">Link</a>')


def test_trim_mode_preserves_internal_whitespace():
    _assert_ws("trim", '<a href=" http://example .com ">Link</a>',
               '<a href="http://example .com">Link</a>')


def test_strict_mode_rejects_whitespace_urls():
    _assert_ws("strict", '<a href=" http://example.com ">Link</a>',
               "<a>Link</a>")


def test_strict_mode_allows_clean_urls():
    _assert_ws("strict", '<a href="http://example.com">Link</a>',
               '<a href="http://example.com">Link</a>')


def test_allow_mode_preserves_whitespace_in_output():
    _assert_ws("allow", '<a href=" http://example.com ">Link</a>',
               '<a href=" http://example.com ">Link</a>')


def test_base_uri_resolves_absolute_whitespace_url_all_modes():
    for mode in ("strict", "trim", "allow"):
        _assert_ws(mode, '<a href=" http://other.com/page ">Link</a>',
                   '<a href="http://other.com/page">Link</a>',
                   base="http://example.com/")


def test_base_uri_resolves_relative_whitespace_url_all_modes():
    for mode in ("strict", "trim", "allow"):
        _assert_ws(mode, '<a href=" /foo ">Link</a>',
                   '<a href="http://example.com/foo">Link</a>',
                   base="http://example.com/")


def test_rejects_non_whitelisted_protocol_all_modes():
    for mode in ("strict", "trim", "allow"):
        _assert_ws(mode, '<a href="javascript:alert(1)">Link</a>',
                   "<a>Link</a>")
    for mode in ("trim", "allow"):
        _assert_ws(mode, '<a href=" javascript:alert(1) ">Link</a>',
                   "<a>Link</a>")


def test_does_not_apply_url_resolution_to_non_url_attributes():
    html = '<div style="background-color:#E9EAEB;">content</div>'
    whitelist = Whitelist().add_tags("div").add_attributes("div", "style")
    assert "background-color:#E9EAEB" in clean(html, "", whitelist)


def test_does_not_apply_url_resolution_to_class_attribute():
    html = '<div class="foo#bar">content</div>'
    whitelist = Whitelist().add_tags("div").add_attributes("div", "class")
    assert 'class="foo#bar"' in clean(html, "", whitelist)


def test_still_resolves_url_attributes():
    html = '<a href="http://example.com" style="color:#333;">link</a>'
    whitelist = (Whitelist().add_tags("a")
                 .add_attributes("a", "href", "style")
                 .add_protocols("a", "href", "http", "https"))
    cleaned = clean(html, "", whitelist)
    assert "http://example.com" in cleaned
    assert "color:#333" in cleaned


def test_filters_style_attribute_to_whitelisted_css_properties():
    html = ('<p style="color: red; position: absolute; '
            'font-weight: bold;">Hello</p>')
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "color", "font-weight"))
    assert clean(html, "", whitelist) == \
        '<p style="color:red; font-weight:bold">Hello</p>'


def test_drops_style_attribute_when_nothing_remains():
    html = '<p style="position:absolute">Hello</p>'
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "color"))
    assert clean(html, "", whitelist) == "<p>Hello</p>"


def test_supports_all_pseudo_tag_for_css_properties():
    html = ('<div style="color:red; position:absolute">One</div>'
            '<span style="font-weight:bold; color:blue">Two</span>')
    whitelist = (Whitelist().add_tags("div", "span")
                 .add_attributes(":all", "style")
                 .add_css_properties(":all", "color"))
    assert strip_newlines(clean(html, "", whitelist)) == \
        '<div style="color:red">One</div>' \
        '<span style="color:blue">Two</span>'


def test_css_property_whitelist_is_case_insensitive():
    html = ('<p style="COLOR: red; Font-Weight: bold; '
            'position:absolute">Hello</p>')
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "color", "font-weight"))
    assert clean(html, "", whitelist) == \
        '<p style="color:red; font-weight:bold">Hello</p>'


def test_css_property_whitelist_preserves_quoted_semicolons():
    html = ("<p style=\"transform:translate(10px, calc(100% - 1em)); "
            "content:'a;b:c'; position:absolute\">Hello</p>")
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "transform", "content"))
    assert clean(html, "", whitelist) == \
        "<p style=\"transform:translate(10px, calc(100% - 1em)); " \
        "content:'a;b:c'\">Hello</p>"


def test_drops_unsafe_css_declarations():
    html = ('<p style="color:red; background-image:url('
            'javascript:alert(1)); width:expression(alert(1));">Hello</p>')
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "color", "background-image",
                                     "width"))
    assert clean(html, "", whitelist) == '<p style="color:red">Hello</p>'


def test_drops_unsafe_css_property_names():
    html = ('<p style="behavior:url(test.htc); color:red; '
            '-moz-binding:url(http://example.com/xbl.xml#xss)">Hello</p>')
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "behavior", "color",
                                     "-moz-binding"))
    assert clean(html, "", whitelist) == '<p style="color:red">Hello</p>'


def test_css_comment_aware_parsing():
    html = ("<p style=\"co/*x*/lor:red; /* comment with ; : */ "
            "font-weight:bold; content:'a/*not-comment*/b'\">Hello</p>")
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "color", "font-weight",
                                     "content"))
    assert clean(html, "", whitelist) == \
        "<p style=\"color:red; font-weight:bold; " \
        "content:'a/*not-comment*/b'\">Hello</p>"


def test_css_comment_aware_validation_catches_obfuscated_values():
    html = ("<p style=\"color:red; width:exp/*x*/ression(alert(1)); "
            "background-image:u/*x*/rl(https://example.com/a.png)\">"
            "Hello</p>")
    whitelist = (Whitelist().add_tags("p").add_attributes("p", "style")
                 .add_css_properties("p", "color", "width",
                                     "background-image"))
    assert clean(html, "", whitelist) == '<p style="color:red">Hello</p>'

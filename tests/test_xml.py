"""Ported from /root/reference/Tests/SwiftSoupTests/XmlTreeBuilderTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.dom import Document, TextNode, XmlDeclaration
from soupflow.textutil import normalise_whitespace
from soupflow.treebuilder import HTML_DEFAULT
from soupflow.xmlparser import XmlTreeBuilder

from .util import strip_newlines

ISSUE_309_XML = """<?xml version="1.0" encoding="UTF-8"?>
<opml version="1.0">
  <head>
    <title>Default</title>
  </head>
  <body>
    <link>I'm link</link>
    <a>I'm a</a>
    <image>I'm image</image>
    <img>I'm img</img>
    <outline text="News" title="News">
      <outline type="rss" text="BBC NEWS" title="BBC NEWS" xmlUrl="https://feeds.bbci.co.uk/news/world/rss.xml" htmlUrl="https://feeds.bbci.co.uk"/>
      <outline type="rss" text="CBS NEWS" title="CBS NEWS" xmlUrl="https://www.cbsnews.com/latest/rss/main" htmlUrl="https://www.cbsnews.com/"/>
      <outline type="rss" text="ESPN" title="ESPN" xmlUrl="https://www.espn.com/espn/rss/news" htmlUrl="https://www.espn.com/"/>
    </outline>
    <outline text="Designer" title="Technology">
      <outline type="rss" text="Daring Fireball" title="Daring Fireball" xmlUrl="https://daringfireball.net/feeds/json" htmlUrl="https://daringfireball.net"/>
      <outline type="rss" text="Colossal" title="Colossal" xmlUrl="https://www.thisiscolossal.com/feed" htmlUrl="https://www.thisiscolossal.com/"/>
    </outline>
  </body>
</opml>
"""


def test_simple_xml_parse():  # XmlTreeBuilderTest.swift:36-43
    xml = "<doc id=2 href='/bar'>Foo <br /><link>One</link>" \
          "<link>Two</link></doc>"
    doc = XmlTreeBuilder().parse(xml, "http://foo.com/")
    assert strip_newlines(doc.html()) == (
        '<doc id="2" href="/bar">Foo <br /><link>One</link>'
        "<link>Two</link></doc>")
    assert doc.get_element_by_id("2").abs_url("href") == \
        "http://foo.com/bar"


def test_pop_to_close():  # XmlTreeBuilderTest.swift:45-51
    xml = "<doc><val>One<val>Two</val></bar>Three</doc>"
    doc = XmlTreeBuilder().parse(xml, "http://foo.com/")
    assert strip_newlines(doc.html()) == \
        "<doc><val>One<val>Two</val>Three</val></doc>"


def test_comment_and_doctype():  # XmlTreeBuilderTest.swift:53-58
    xml = "<!DOCTYPE HTML><!-- a comment -->One <qux />Two"
    doc = XmlTreeBuilder().parse(xml, "http://foo.com/")
    assert strip_newlines(doc.html()) == \
        "<!DOCTYPE HTML><!-- a comment -->One <qux />Two"


def test_issue309_xml_specific_tags():  # XmlTreeBuilderTest.swift:66-77
    doc = sf.parse_xml(ISSUE_309_XML)
    assert doc.select("title")[0].text() == "Default"
    assert doc.select("link")[0].text() == "I'm link"
    assert doc.select("a")[0].text() == "I'm a"
    assert doc.select("image")[0].text() == "I'm image"
    assert doc.select("img")[0].text() == "I'm img"
    assert len(doc.select("body outline")) == 7
    assert len(doc.select("body > outline")) == 2
    assert doc.output_settings.syntax == "xml"


def test_parse_auto_detects_xml_declaration():
    # XmlTreeBuilderTest.swift:88-96
    doc = sf.parse(ISSUE_309_XML)
    assert doc.select("link")[0].text() == "I'm link"
    assert doc.select("img")[0].text() == "I'm img"
    assert doc.select("image")[0].text() == "I'm image"
    assert len(doc.select("body outline")) == 7
    assert doc.output_settings.syntax == "xml"


def test_parse_auto_detects_xml_with_leading_whitespace():
    # XmlTreeBuilderTest.swift:98-104
    xml = "\n  \t <?xml version=\"1.0\"?><root><item>Hello</item></root>"
    doc = sf.parse(xml)
    assert doc.select("item")[0].text() == "Hello"
    assert doc.output_settings.syntax == "xml"


def test_parse_auto_detects_html_without_xml_declaration():
    # XmlTreeBuilderTest.swift:106-112
    doc = sf.parse("<html><head><title>Test</title></head><body>"
                   "<p>Hello</p></body></html>")
    assert doc.title() == "Test"
    assert doc.select("p")[0].text() == "Hello"


def test_parse_auto_detects_html_doctype():  # XmlTreeBuilderTest.swift:114-119
    doc = sf.parse('<!DOCTYPE html><html><body><link rel="stylesheet">'
                   "<p>Hello</p></body></html>")
    assert doc.select("p")[0].text() == "Hello"


def test_auto_detection_matches_explicit_xml_parser():
    # XmlTreeBuilderTest.swift:121-126
    assert sf.parse(ISSUE_309_XML).outer_html() == \
        sf.parse_xml(ISSUE_309_XML).outer_html()


def test_parse_html_forces_html_parser_even_for_xml_input():
    # XmlTreeBuilderTest.swift:138-143
    doc = sf.parse_html(ISSUE_309_XML)
    assert doc.select("link")[0].text() != "I'm link"


def test_parse_html_normalizes_document():  # XmlTreeBuilderTest.swift:145-153
    doc = sf.parse_html("<p>Hello")
    assert len(doc.select("head")) == 1
    assert len(doc.select("body")) == 1
    assert doc.select("p")[0].text() == "Hello"


def test_does_not_force_self_closing_known_tags():
    # XmlTreeBuilderTest.swift:184-192
    html_doc = sf.parse("<br>one</br>")
    assert html_doc.body().html() == "<br />one\n<br />"

    xml_doc = sf.parse_xml("<br>one</br>")
    assert xml_doc.html() == "<br>one</br>"


def test_handles_xml_declaration_as_declaration():
    # XmlTreeBuilderTest.swift:194-201
    html = "<?xml encoding='UTF-8' ?><body>One</body><!-- comment -->"
    doc = sf.parse_xml(html)
    assert normalise_whitespace(doc.outer_html()) == \
        '<?xml encoding="UTF-8"?> <body> One </body> <!-- comment -->'
    assert doc.child_node(0).node_name() == "#declaration"
    assert doc.child_node(2).node_name() == "#comment"


def test_xml_fragment():  # XmlTreeBuilderTest.swift:203-211
    xml = "<one src='/foo/' />Two<three><four /></three>"
    nodes = XmlTreeBuilder().parse_fragment(xml, "http://example.com/")
    assert len(nodes) == 3
    assert nodes[0].abs_url("src") == "http://example.com/foo/"
    assert nodes[0].node_name() == "one"
    assert isinstance(nodes[1], TextNode)
    assert nodes[1].text() == "Two"


def test_xml_parse_defaults_to_xml_output_syntax():
    # XmlTreeBuilderTest.swift:213-216
    assert sf.parse_xml("x").output_settings.syntax == "xml"


def test_does_handle_eof_in_tag():  # XmlTreeBuilderTest.swift:218-222
    xml_doc = sf.parse_xml('<img src=asdf onerror="alert(1)" x=')
    assert xml_doc.html() == '<img src="asdf" onerror="alert(1)" x="" />'


def test_parse_declaration_attributes():  # XmlTreeBuilderTest.swift:233-245
    xml = "<?xml version='1' encoding='UTF-8' something='else'?>" \
          "<val>One</val>"
    doc = sf.parse_xml(xml)
    decl = doc.child_node(0)
    assert isinstance(decl, XmlDeclaration)
    assert decl.attr("version") == "1"
    assert decl.attr("encoding") == "UTF-8"
    assert decl.attr("something") == "else"
    assert decl.get_whole_declaration() == \
        'version="1" encoding="UTF-8" something="else"'
    assert decl.outer_html() == \
        '<?xml version="1" encoding="UTF-8" something="else"?>'


def test_case_sensitive_declaration():  # XmlTreeBuilderTest.swift:247-251
    doc = sf.parse_xml("<?XML version='1' encoding='UTF-8' "
                       "something='else'?>")
    assert doc.outer_html() == \
        '<?XML version="1" encoding="UTF-8" something="else"?>'


def test_creates_valid_prolog():  # XmlTreeBuilderTest.swift:253-262
    doc = Document.create_shell("")
    doc.output_settings.syntax = "xml"
    doc.set_charset("UTF-8")
    assert doc.outer_html() == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<html>\n"
        " <head></head>\n"
        " <body></body>\n"
        "</html>")


def test_preserves_case_by_default():  # XmlTreeBuilderTest.swift:264-268
    doc = sf.parse_xml("<TEST ID=1>Check</TEST>")
    assert strip_newlines(doc.html()) == '<TEST ID="1">Check</TEST>'


def test_can_normalize_case():  # XmlTreeBuilderTest.swift:270-274
    doc = XmlTreeBuilder(HTML_DEFAULT).parse("<TEST ID=1>Check</TEST>", "")
    assert strip_newlines(doc.html()) == '<test id="1">Check</test>'


def test_nil_replace_in_queue():  # XmlTreeBuilderTest.swift:276-279
    html = ('<TABLE><TBODY><TR><TD></TD><TD><FONT color=#000000 size=1>'
            "<I><FONT size=5><P align=center></FONT></I></FONT>&nbsp;"
            '</P></TD></TR></TBODY></TABLE></TD></TR></TBODY></TABLE>'
            '</DIV></DIV></DIV><BLOCKQUOTE></BLOCKQUOTE>'
            '<DIV style="FONT: 10pt Courier New"><BR><BR>&nbsp;</DIV>'
            "</BODY></HTML>")
    sf.parse(html)  # must not raise

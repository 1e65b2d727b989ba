"""Ported from /root/reference/Tests/SwiftSoupTests/HtmlParserTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.dom import Comment, TextNode

from .util import strip_newlines


def body_html(html, base=""):
    return strip_newlines(sf.parse(html, base).body().html())


def test_parses_simple_document():
    doc = sf.parse('<html><head><title>First!</title></head><body>'
                   '<p>First post! <img src="foo.png" /></p></body></html>')
    p = doc.body().child(0)
    assert p.tag_name() == "p"
    img = p.child(0)
    assert img.attr("src") == "foo.png"
    assert img.tag_name() == "img"


def test_parses_multibyte_attributes():
    html = '<div foo="若い"></div>'
    assert sf.parse(html).body().html() == html


def test_parses_rough_attributes():
    doc = sf.parse('<html><head><title>First!</title></head><body>'
                   '<p class="foo > bar">First post!</p></body></html>')
    p = doc.body().child(0)
    assert p.tag_name() == "p"
    assert p.attr("class") == "foo > bar"


def test_parses_quite_rough_attributes():
    doc = sf.parse("<p =a>One<a <p>Something</p>Else")
    assert doc.body().html() == \
        "<p =a>One<a <p>Something</a></p>\n<a <p>Else</a>"


def test_parses_quite_rough_attributes2():
    assert sf.parse("<p .....>").body().html() == "<p .....></p>"


def test_parses_comments():
    doc = sf.parse("<html><head></head><body><img src=foo>"
                   "<!-- <table><tr><td></table> --><p>Hello</p>"
                   "</body></html>")
    body = doc.body()
    comment = body.child_node(1)
    assert isinstance(comment, Comment)
    assert comment.get_data() == " <table><tr><td></table> "
    p = body.child(1)
    assert p.child_node(0).get_whole_text() == "Hello"


def test_comment_start_dash_dash():
    doc = sf.parse("<div><!---x--></div>")
    comment = doc.select("div")[0].child_node(0)
    assert comment.get_data() == "x"


def test_comment_end_bang():
    doc = sf.parse("<div><!--x!--></div>")
    comment = doc.select("div")[0].child_node(0)
    assert comment.get_data() == "x!"


def test_parses_unterminated_comments():
    doc = sf.parse("<p>Hello<!-- <tr><td>")
    p = doc.get_elements_by_tag("p")[0]
    assert p.text() == "Hello"
    assert p.child_node(0).get_whole_text() == "Hello"
    assert p.child_node(1).get_data() == " <tr><td>"


def test_comment_with_multibyte_and_hyphen():
    doc = sf.parse("<div><!-- 你好-世界 --><p>OK</p></div>")
    comment = doc.select("div")[0].child_node(0)
    assert comment.get_data() == " 你好-世界 "


def test_drops_unterminated_tag():
    doc = sf.parse("<p")
    assert len(doc.get_elements_by_tag("p")) == 0
    assert doc.text() == ""
    doc = sf.parse("<div id=1<p id='2'")
    assert doc.text() == ""


def test_drops_unterminated_attribute():
    doc = sf.parse('<p id="foo')
    assert doc.text() == ""


def test_parses_unterminated_textarea():
    doc = sf.parse("<body><p><textarea>one<p>two")
    t = doc.select("textarea")[0]
    assert t.text() == "one"
    assert doc.select("p")[1].text() == "two"


def test_parses_unterminated_option():
    doc = sf.parse("<body><p><select><option>One<option>Two</p><p>Three</p>")
    options = doc.select("option")
    assert len(options) == 2
    assert options[0].text() == "One"
    assert options[-1].text() == "TwoThree"


def test_space_after_tag():
    assert body_html(
        '<div > <a name="top"></a ><p id=1 >Hello</p></div>') == \
        '<div> <a name="top"></a><p id="1">Hello</p></div>'


def test_creates_document_structure():
    html = ("<meta name=keywords /><link rel=stylesheet /><title>SwiftSoup"
            "</title><p>Hello world</p>")
    doc = sf.parse(html)
    head = doc.head()
    body = doc.body()
    assert len(doc.children()) == 1
    assert len(doc.child(0).children()) == 2
    assert len(head.children()) == 3
    assert len(body.children()) == 1
    assert head.get_elements_by_tag("meta")[0].attr("name") == "keywords"
    assert len(body.get_elements_by_tag("meta")) == 0
    assert doc.title() == "SwiftSoup"
    assert body.text() == "Hello world"
    assert body.children()[0].text() == "Hello world"


def test_creates_structure_from_body_snippet():
    doc = sf.parse("foo <b>bar</b> baz")
    assert doc.text() == "foo bar baz"


def test_handles_escaped_data():
    doc = sf.parse("<div title='Surf &amp; Turf'>Reef &amp; Beef</div>")
    div = doc.get_elements_by_tag("div")[0]
    assert div.attr("title") == "Surf & Turf"
    assert div.text() == "Reef & Beef"


def test_handles_data_only_tags():
    tels = sf.parse("<style>font-family: bold</style>") \
        .get_elements_by_tag("style")
    assert tels[0].data() == "font-family: bold"
    assert tels[0].text() == ""

    doc = sf.parse("<p>Hello</p><script>obj.insert('<a rel=\"none\" />');"
                   "\ni++;</script><p>There</p>")
    assert doc.text() == "Hello There"
    assert doc.data() == "obj.insert('<a rel=\"none\" />');\ni++;"


def test_handles_text_after_data():
    doc = sf.parse("<html><body>pre <script>inner</script> aft</body></html>")
    assert strip_newlines(doc.outer_html()) == \
        "<html><head></head><body>pre <script>inner</script> aft" \
        "</body></html>"


def test_handles_textarea():
    doc = sf.parse("<textarea>Hello</textarea>")
    els = doc.select("textarea")
    assert els[0].text() == "Hello"
    assert els[0].val() == "Hello"


def test_preserves_space_in_textarea():
    doc = sf.parse("<textarea>\n\tOne\n\tTwo\n\tThree\n</textarea>")
    expect = "One\n\tTwo\n\tThree"
    el = doc.select("textarea")[0]
    assert el.text() == expect
    assert el.val() == expect
    assert el.html() == expect
    assert el.outer_html() == "<textarea>\n\t" + expect + "\n</textarea>"


def test_preserves_space_in_script():
    doc = sf.parse("<script>\nOne\n\tTwo\n\tThree\n</script>")
    expect = "\nOne\n\tTwo\n\tThree\n"
    el = doc.select("script")[0]
    assert el.data() == expect
    assert el.html() == "One\n\tTwo\n\tThree"
    assert el.outer_html() == "<script>" + expect + "</script>"


def test_script_data_escaped_with_multibyte():
    doc = sf.parse("<script><!-- 你-好 --></script>")
    assert doc.select("script")[0].data() == "<!-- 你-好 -->"


def test_script_data_escaped_end_tag_case_insensitive():
    doc = sf.parse("<script><!--var a=1;--></SCRIPT><p>Hi</p>")
    assert doc.select("script")[0].data() == "<!--var a=1;-->"
    assert doc.select("p")[0].text() == "Hi"


def test_plaintext_stops_at_null():
    doc = sf.parse("<plaintext>one\x00two<p>three</p>")
    assert "one�two" in doc.body().html()


def test_does_not_create_implicit_lists():
    doc = sf.parse("<li>Point one<li>Point two")
    assert len(doc.select("ul")) == 0
    lis = doc.select("li")
    assert len(lis) == 2
    assert lis[0].parent().tag_name() == "body"

    doc2 = sf.parse("<ol><li><p>Point the first<li><p>Point the second")
    assert len(doc2.select("ul")) == 0
    assert len(doc2.select("ol")) == 1
    assert len(doc2.select("ol li")) == 2
    assert len(doc2.select("ol li p")) == 2
    assert len(doc2.select("ol li")[0].children()) == 1


def test_discards_naked_tds():
    assert body_html("<td>Hello<td><p>There<p>now") == \
        "Hello<p>There</p><p>now</p>"


def test_handles_nested_implicit_table():
    assert body_html("<table><td>1</td></tr> <td>2</td></tr> <td> "
                     "<table><td>3</td> <td>4</td></table> "
                     "<tr><td>5</table>") == \
        "<table><tbody><tr><td>1</td></tr> <tr><td>2</td></tr> " \
        "<tr><td> <table><tbody><tr><td>3</td> <td>4</td></tr></tbody>" \
        "</table> </td></tr><tr><td>5</td></tr></tbody></table>"


def test_handles_whatwg_expenses_table_example():
    assert body_html(
        "<table> <colgroup> <col> <colgroup> <col> <col> <col> <thead> "
        "<tr> <th> <th>2008 <th>2007 <th>2006 <tbody> <tr> <th "
        "scope=rowgroup> Research and development <td> $ 1,109 <td> $ 782 "
        "<td> $ 712 <tr> <th scope=row> Percentage of net sales <td> 3.4% "
        "<td> 3.3% <td> 3.7% <tbody> <tr> <th scope=rowgroup> Selling, "
        "general, and administrative <td> $ 3,761 <td> $ 2,963 <td> "
        "$ 2,433 <tr> <th scope=row> Percentage of net sales <td> 11.6% "
        "<td> 12.3% <td> 12.6% </table>") == \
        '<table> <colgroup> <col /> </colgroup><colgroup> <col /> <col />' \
        ' <col /> </colgroup><thead> <tr> <th> </th><th>2008 </th>' \
        '<th>2007 </th><th>2006 </th></tr></thead><tbody> <tr> ' \
        '<th scope="rowgroup"> Research and development </th><td> $ 1,109' \
        ' </td><td> $ 782 </td><td> $ 712 </td></tr><tr> <th scope="row">' \
        ' Percentage of net sales </th><td> 3.4% </td><td> 3.3% </td>' \
        '<td> 3.7% </td></tr></tbody><tbody> <tr> <th scope="rowgroup">' \
        ' Selling, general, and administrative </th><td> $ 3,761 </td>' \
        '<td> $ 2,963 </td><td> $ 2,433 </td></tr><tr> <th scope="row">' \
        ' Percentage of net sales </th><td> 11.6% </td><td> 12.3% </td>' \
        '<td> 12.6% </td></tr></tbody></table>'


def test_handles_tbody_table():
    assert body_html("<html><head></head><body><table><tbody><tr><td>aaa"
                     "</td><td>bbb</td></tr></tbody></table></body>"
                     "</html>") == \
        "<table><tbody><tr><td>aaa</td><td>bbb</td></tr></tbody></table>"


def test_handles_implicit_caption_close():
    assert body_html("<table><caption>A caption<td>One<td>Two") == \
        "<table><caption>A caption</caption><tbody><tr><td>One</td>" \
        "<td>Two</td></tr></tbody></table>"


def test_no_table_direct_in_table():
    assert body_html("<table> <td>One <td><table><td>Two</table> "
                     "<table><td>Three") == \
        "<table> <tbody><tr><td>One </td><td><table><tbody><tr><td>Two" \
        "</td></tr></tbody></table> <table><tbody><tr><td>Three</td>" \
        "</tr></tbody></table></td></tr></tbody></table>"


def test_ignores_dupe_end_tr_tag():
    assert body_html("<table><tr><td>One</td><td><table><tr><td>Two</td>"
                     "</tr></tr></table></td><td>Three</td></tr>"
                     "</table>") == \
        "<table><tbody><tr><td>One</td><td><table><tbody><tr><td>Two" \
        "</td></tr></tbody></table></td><td>Three</td></tr></tbody></table>"


def test_handles_base_tags():
    h = ("<a href=1>#</a><base href='/2/'><a href='3'>#</a>"
         "<base href='http://bar'><a href=/4>#</a>")
    doc = sf.parse(h, "http://foo/")
    assert doc.base_uri == "http://foo/2/"
    anchors = doc.get_elements_by_tag("a")
    assert len(anchors) == 3
    assert anchors[0].base_uri == "http://foo/2/"
    assert anchors[0].abs_url("href") == "http://foo/2/1"
    assert anchors[1].abs_url("href") == "http://foo/2/3"
    assert anchors[2].abs_url("href") == "http://foo/4"


def test_handles_protocol_relative_url():
    doc = sf.parse("<img src='//example.net/img.jpg'>",
                   "https://example.com/")
    assert doc.select("img")[0].abs_url("src") == \
        "https://example.net/img.jpg"


def test_handles_cdata():
    doc = sf.parse("<div id=1><![CDATA[<html>\n<foo><&amp;]]></div>")
    div = doc.get_element_by_id("1")
    assert div.text() == "<html> <foo><&amp;"
    assert len(div.children()) == 0
    assert div.child_node_size() == 1


def test_handles_unclosed_cdata_at_eof():
    doc = sf.parse("<![CDATA[]]")
    assert doc.body().child_node_size() == 1


def test_handles_invalid_start_tags():
    doc = sf.parse("<div>Hello < There <&amp;></div>")
    assert doc.select("div")[0].text() == "Hello < There <&>"


def test_data_state_with_multibyte_before_tag():
    doc = sf.parse("<div>你好<em>ok</em></div>")
    assert doc.select("div")[0].text() == "你好ok"


def test_rcdata_state_with_multibyte_and_ampersand():
    doc = sf.parse("<textarea>你&好</textarea>")
    assert doc.select("textarea")[0].text() == "你&好"


def test_handles_unknown_tags():
    doc = sf.parse("<div><foo title=bar>Hello<foo title=qux>there</foo>"
                   "</div>")
    foos = doc.select("foo")
    assert len(foos) == 2
    assert foos[0].attr("title") == "bar"
    assert foos[-1].attr("title") == "qux"
    assert foos[-1].text() == "there"


def test_handles_unknown_inline_tags():
    h = "<p><cust>Test</cust></p><p><cust><cust>Test</cust></cust></p>"
    doc = sf.parse_body_fragment(h)
    assert strip_newlines(doc.body().html()) == h


def test_parses_body_fragment():
    doc = sf.parse_body_fragment(
        "<!-- comment --><p><a href='foo'>One</a></p>", "http://example.com")
    assert strip_newlines(doc.body().outer_html()) == \
        '<body><!-- comment --><p><a href="foo">One</a></p></body>'
    assert doc.select("a")[0].abs_url("href") == "http://example.com/foo"


def test_handles_unknown_namespace_tags():
    h = ("<foo:bar id='1' /><abc:def id=2>Foo<p>Hello</p></abc:def>"
         "<foo:bar>There</foo:bar>")
    assert body_html(h) == \
        '<foo:bar id="1" /><abc:def id="2">Foo<p>Hello</p></abc:def>' \
        '<foo:bar>There</foo:bar>'


def test_handles_known_empty_blocks():
    h = ("<div id='1' /><script src='/foo' /><div id=2><img /><img></div>"
         "<a id=3 /><i /><foo /><foo>One</foo> <hr /> hr text <hr> hr "
         "text two")
    assert body_html(h) == \
        '<div id="1"></div><script src="/foo"></script><div id="2">' \
        '<img /><img /></div><a id="3"></a><i></i><foo /><foo>One</foo> ' \
        '<hr /> hr text <hr /> hr text two'


def test_handles_known_empty_noframes():
    doc = sf.parse("<html><head><noframes /><meta name=foo></head>"
                   "<body>One</body></html>")
    assert strip_newlines(doc.outer_html()) == \
        '<html><head><noframes></noframes><meta name="foo" /></head>' \
        '<body>One</body></html>'


def test_handles_known_empty_style():
    doc = sf.parse("<html><head><style /><meta name=foo></head>"
                   "<body>One</body></html>")
    assert strip_newlines(doc.outer_html()) == \
        '<html><head><style></style><meta name="foo" /></head>' \
        '<body>One</body></html>'


def test_handles_known_empty_title():
    doc = sf.parse("<html><head><title /><meta name=foo></head>"
                   "<body>One</body></html>")
    assert strip_newlines(doc.outer_html()) == \
        '<html><head><title></title><meta name="foo" /></head>' \
        '<body>One</body></html>'


def test_handles_solidus_at_attribute_end():
    assert sf.parse("<a href=/>link</a>").body().html() == \
        '<a href="/">link</a>'


def test_handles_multi_closing_body():
    doc = sf.parse("<body><p>Hello</body><p>there</p></body></body>"
                   "</html><p>now")
    assert len(doc.select("p")) == 3
    assert len(doc.body().children()) == 3


def test_handles_unclosed_definition_lists():
    doc = sf.parse("<dt>Foo<dd>Bar<dt>Qux<dd>Zug")
    assert len(doc.select("dl")) == 0
    assert len(doc.select("dt, dd")) == 4
    dts = doc.select("dt")
    assert len(dts) == 2
    assert dts[1].next_element_sibling().text() == "Zug"


def test_handles_blocks_in_definitions():
    doc = sf.parse("<dl><dt><div id=1>Term</div></dt><dd><div id=2>Def"
                   "</div></dd></dl>")
    assert doc.select("#1")[0].parent().tag_name() == "dt"
    assert doc.select("#2")[0].parent().tag_name() == "dd"
    assert strip_newlines(doc.body().html()) == \
        '<dl><dt><div id="1">Term</div></dt><dd><div id="2">Def</div>' \
        '</dd></dl>'


def test_handles_frames():
    doc = sf.parse("<html><head><script></script><noscript></noscript>"
                   "</head><frameset><frame src=foo></frame><frame src=foo>"
                   "</frameset></html>")
    assert strip_newlines(doc.outer_html()) == \
        '<html><head><script></script><noscript></noscript></head>' \
        '<frameset><frame src="foo" /><frame src="foo" /></frameset></html>'


def test_ignores_content_after_frameset():
    doc = sf.parse("<html><head><title>One</title></head><frameset>"
                   "<frame /><frame /></frameset><table></table></html>")
    assert strip_newlines(doc.outer_html()) == \
        '<html><head><title>One</title></head><frameset><frame />' \
        '<frame /></frameset></html>'


def test_handles_javadoc_font():
    doc = sf.parse('<TD BGCOLOR="#EEEEFF" CLASS="NavBarCell1">    '
                   '<A HREF="deprecated-list.html"><FONT CLASS="NavBarFont1">'
                   '<B>Deprecated</B></FONT></A>&nbsp;</TD>')
    a = doc.select("a")[0]
    assert a.text() == "Deprecated"
    assert a.child(0).tag_name() == "font"
    assert a.child(0).child(0).tag_name() == "b"


def test_handles_base_without_href():
    doc = sf.parse("<head><base target='_blank'></head><body>"
                   "<a href=/foo>Test</a></body>", "http://example.com/")
    a = doc.select("a")[0]
    assert a.attr("href") == "/foo"
    assert a.attr("abs:href") == "http://example.com/foo"


def test_normalises_document():
    doc = sf.parse("<!doctype html>One<html>Two<head>Three<link></head>"
                   "Four<body>Five </body>Six </html>Seven ")
    assert strip_newlines(doc.normalise().outer_html()) == \
        '<!doctype html><html><head></head><body>OneTwoThree<link />' \
        'FourFive Six Seven </body></html>'


def test_normalises_empty_document():
    doc = sf.parse("")
    assert strip_newlines(doc.outer_html()) == \
        "<html><head></head><body></body></html>"


def test_normalises_headless_body():
    doc = sf.parse('<html><body><span class="foo">bar</span>')
    assert strip_newlines(doc.outer_html()) == \
        '<html><head></head><body><span class="foo">bar</span>' \
        '</body></html>'


def test_normalised_body_after_content():
    doc = sf.parse("<font face=Arial><body class=name><div>One</div>"
                   "</body></font>")
    assert strip_newlines(doc.outer_html()) == \
        '<html><head></head><body class="name"><font face="Arial">' \
        '<div>One</div></font></body></html>'


def test_finds_charset_in_malformed_meta():
    doc = sf.parse("<meta http-equiv=Content-Type content=text/html; "
                   "charset=gb2312>")
    assert doc.select("meta")[0].attr("charset") == "gb2312"


def test_hgroup():
    assert body_html("<h1>Hello <h2>There <hgroup><h1>Another<h2>headline"
                     "</hgroup> <hgroup><h1>More</h1><p>stuff</p>"
                     "</hgroup>") == \
        "<h1>Hello </h1><h2>There <hgroup><h1>Another</h1><h2>headline" \
        "</h2></hgroup> <hgroup><h1>More</h1><p>stuff</p></hgroup></h2>"


def test_relaxed_tags():
    assert body_html("<abc_def id=1>Hello</abc_def> <abc-def>There"
                     "</abc-def>") == \
        '<abc_def id="1">Hello</abc_def> <abc-def>There</abc-def>'


def test_header_contents():
    assert body_html("<h1>Hello <div>There</div> now</h1> <h2>More <h3>"
                     "Content</h3></h2>") == \
        "<h1>Hello <div>There</div> now</h1> <h2>More </h2><h3>Content</h3>"


def test_span_contents():
    assert body_html("<span>Hello <div>there</div> <span>now</span>"
                     "</span>") == \
        "<span>Hello <div>there</div> <span>now</span></span>"


def test_no_images_in_noscript_in_head():
    doc = sf.parse("<html><head><noscript><img src='foo'></noscript>"
                   "</head><body><p>Hello</p></body></html>")
    assert strip_newlines(doc.outer_html()) == \
        '<html><head><noscript>&lt;img src="foo"&gt;</noscript></head>' \
        '<body><p>Hello</p></body></html>'


def test_a_flow_contents():
    assert body_html("<a>Hello <div>there</div> <span>now</span></a>") == \
        "<a>Hello <div>there</div> <span>now</span></a>"


def test_font_flow_contents():
    assert body_html("<font>Hello <div>there</div> <span>now</span>"
                     "</font>") == \
        "<font>Hello <div>there</div> <span>now</span></font>"


def test_handles_misnested_tags_b_i():
    doc = sf.parse("<p>1<b>2<i>3</b>4</i>5</p>")
    assert doc.body().html() == "<p>1<b>2<i>3</i></b><i>4</i>5</p>"


def test_handles_misnested_tags_b_p():
    doc = sf.parse("<b>1<p>2</b>3</p>")
    assert doc.body().html() == "<b>1</b>\n<p><b>2</b>3</p>"


def test_handles_unexpected_markup_in_tables():
    assert body_html("<table><b><tr><td>aaa</td></tr>bbb</table>ccc") == \
        "<b></b><b>bbb</b><table><tbody><tr><td>aaa</td></tr></tbody>" \
        "</table><b>ccc</b>"


def test_handles_unclosed_formatting_elements():
    h = ("<!DOCTYPE html>\n"
         "<p><b class=x><b class=x><b><b class=x><b class=x><b>X\n"
         "<p>X\n"
         "<p><b><b class=x><b>X\n"
         "<p></b></b></b></b></b></b>X")
    doc = sf.parse(h)
    doc.output_settings.indent_amount = 0
    want = ("<!doctype html>\n"
            "<html>\n"
            "<head></head>\n"
            "<body>\n"
            '<p><b class="x"><b class="x"><b><b class="x"><b class="x">'
            "<b>X </b></b></b></b></b></b></p>\n"
            '<p><b class="x"><b><b class="x"><b class="x"><b>X </b></b>'
            "</b></b></b></p>\n"
            '<p><b class="x"><b><b class="x"><b class="x"><b><b>'
            '<b class="x"><b>X </b></b></b></b></b></b></b></b></p>\n'
            "<p>X</p>\n"
            "</body>\n"
            "</html>")
    assert doc.outer_html() == want


def test_handles_unclosed_anchors():
    doc = sf.parse("<a href='http://example.com/'>Link<p>Error link</a>")
    want = ('<a href="http://example.com/">Link</a>\n'
            '<p><a href="http://example.com/">Error link</a></p>')
    assert doc.body().html() == want


def test_reconstruct_formatting_elements():
    doc = sf.parse("<p><b class=one>One <i>Two <b>Three</p><p>Hello</p>")
    assert doc.body().html() == \
        '<p><b class="one">One <i>Two <b>Three</b></i></b></p>\n' \
        '<p><b class="one"><i><b>Hello</b></i></b></p>'


def test_reconstruct_formatting_elements_in_table():
    doc = sf.parse("<p><b>One</p> <table><tr><td><p><i>Three<p>Four</i>"
                   "</td></tr></table> <p>Five</p>")
    want = ("<p><b>One</b></p>\n"
            "<b> \n"
            " <table>\n"
            "  <tbody>\n"
            "   <tr>\n"
            "    <td><p><i>Three</i></p><p><i>Four</i></p></td>\n"
            "   </tr>\n"
            "  </tbody>\n"
            " </table> <p>Five</p></b>")
    assert doc.body().html() == want


def test_comment_before_html():
    doc = sf.parse("<!-- comment --><!-- comment 2 --><p>One</p>")
    assert strip_newlines(doc.outer_html()) == \
        "<!-- comment --><!-- comment 2 --><html><head></head><body>" \
        "<p>One</p></body></html>"


def test_empty_td_tag():
    doc = sf.parse("<table><tr><td>One</td><td id='2' /></tr></table>")
    assert doc.select("tr")[0].html() == \
        '<td>One</td>\n<td id="2"></td>'


def test_handles_solidus_in_a():
    doc = sf.parse("<a class=lp href=/lib/14160711/>link text</a>")
    a = doc.select("a")[0]
    assert a.text() == "link text"
    assert a.attr("href") == "/lib/14160711/"


def test_handles_span_in_tbody():
    doc = sf.parse("<table><tbody><span class='1'><tr><td>One</td></tr>"
                   "<tr><td>Two</td></tr></span></tbody></table>")
    assert len(doc.select("span")[0].children()) == 0
    assert len(doc.select("table")) == 1


def test_unterminated_entity_does_not_crash():
    doc = sf.parse("<a href='&lt")
    assert doc.body().text() == ""


def test_truncated_html_variants_do_not_crash():
    variants = [
        '<a href="', '<a href="&', '<a href="&amp', '<a href="&amp;',
        "<a href='test&amp", '<div class=', '<div class="test',
        '<!DOCTYPE', '<!DOCTYPE html', '<!-- comment', '<script>var x = ',
        '<style>.foo {', '<img src="data:image/png;base64,',
        '<a href="https://example.com?a=1&',
        '<a href="https://example.com?a=1&amp',
        '<a href="https://example.com?a=1&amp;b=2&',
        '<p>test</p><img src="foo&', '<table><tr><td>cell&amp',
        '<', '< ', '</', '<a', '<a ', '<a h', '<a hr', '<a hre', '<a href',
        '<a href=', "<a href='", '&', '&amp', '&#', '&#x', '&#x4', '&#65',
    ]
    for html in variants:
        doc = sf.parse(html)
        assert doc.body() is not None


def test_deep_nesting_is_linear_ish():
    # reference StackOverflow393Test: deep nesting must neither recurse
    # nor blow up quadratically (ElementStack O(1) membership)
    import time
    depth = 20000
    html = "<i>" * depth + "text" + "</i>" * depth
    t0 = time.monotonic()
    doc = sf.parse(html)
    assert time.monotonic() - t0 < 5.0
    assert doc.text() == "text"


def test_attribute_storm():
    # reference AttributeStormProfileTest: thousands of attributes
    html = "<p " + " ".join(f"a{i}=v{i}" for i in range(5000)) + ">x</p>"
    p = sf.parse(html).select("p")[0]
    assert p._attrs().size() == 5000
    assert p.attr("a4999") == "v4999"


def test_tag_name_with_multibyte_and_attributes():
    # HtmlParserTest.swift:414-422
    doc = sf.parse("<div><x\u03c0\u03b2 class='x'>Hi</x\u03c0\u03b2></div>")
    els = doc.get_elements_by_tag("x\u03c0\u03b2")
    assert len(els) == 1
    assert els[0].tag_name() == "x\u03c0\u03b2"
    assert els[0].text() == "Hi"


def test_parse_does_not_crash_on_unterminated_html_entity():
    # HtmlParserTest.swift:714-718
    doc = sf.parse("<a href='&lt")
    assert doc.body().text() == ""


def test_parse_does_not_crash_on_truncated_html():
    # HtmlParserTest.swift:722-728
    html = ('<figure class="img-border featured-image"><img width="1600" '
            'height="800" src="https://9to5mac.com/wp-content/uploads/'
            'sites/6/2025/08/crash-detection.jpg?quality=82&amp')
    assert sf.parse(html).body() is not None


def test_parse_does_not_crash_on_truncated_html_variants():
    # HtmlParserTest.swift:730-775
    variants = [
        '<a href="', '<a href="&', '<a href="&amp', '<a href="&amp;',
        "<a href='test&amp", "<div class=", '<div class="test',
        "<!DOCTYPE", "<!DOCTYPE html", "<!-- comment",
        "<script>var x = ", "<style>.foo {",
        '<img src="data:image/png;base64,',
        '<a href="https://example.com?a=1&',
        '<a href="https://example.com?a=1&amp',
        '<a href="https://example.com?a=1&amp;b=2&',
        "<p>Hello \u00c3", "<p>Hello \u00e2\u20ac",
        '<p>test</p><img src="foo&', "<table><tr><td>cell&amp",
        "<", "< ", "</", "<a", "<a ", "<a h", "<a hr", "<a hre",
        "<a href", "<a href=", "<a href='",
        "&", "&amp", "&#", "&#x", "&#x4", "&#65",
    ]
    for i, html in enumerate(variants):
        assert sf.parse(html).body() is not None, (i, html)


def test_truncated_rawtext_scriptdata_do_not_hang():
    # regression: "<script><" at EOF looped forever in script_data_lt
    # (consume at EOF did not advance, unconsume rewound onto "<")
    variants = [
        "<script><", "<script><script><", "<style><", "<textarea><",
        "<title><", "<xmp><", "<script></", "<script><!", "<script><!-",
        "<script><!--<", "<script><!--<s", "<script><!--</",
        "<script><!--<script><", "<iframe><", "<noembed><",
        "<noframes><", "<plaintext><",
    ]
    for html in variants:
        doc = sf.parse(html)  # completing at all is the assertion
        assert doc.body() is not None


def test_non_ascii_letters_after_doctype_and_double_escape_do_not_hang():
    # regression: matches_letter() (unicode isalpha) paired with an
    # ASCII-only consume_letter_sequence() looped forever
    for html in ["<!DOCTYPE\u03c0", "<!DOCTYPE\U0001d52e",
                 "<script><!--<t\u03c0", "<textarea></x\u03c0",
                 "<title></t\u03c0", "<!DOCTYPE \u03c0\u03b2>ok"]:
        doc = sf.parse(html)
        assert doc.body() is not None

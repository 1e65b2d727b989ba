"""Ported from /root/reference/Tests/SwiftSoupTests/ElementTest.swift
(assertion values verbatim; fresh Python test code). The lazy
query-index internals tests are represented by their observable
contract: getElementsBy* always agrees with select()."""

import soupflow as sf
from soupflow.dom import Element, TextNode
from soupflow.tags import tag_for

from .util import strip_newlines

REFERENCE = ('<div id=div1><p>Hello</p><p>Another <b>element</b></p>'
             '<div id=div2><img src=foo.png></div></div>')


def test_get_elements_by_tag_name():  # ElementTest.swift:14-33
    doc = sf.parse(REFERENCE)
    divs = doc.get_elements_by_tag("div")
    assert len(divs) == 2
    assert divs[0].id() == "div1"
    assert divs[1].id() == "div2"

    ps = doc.get_elements_by_tag("p")
    assert len(ps) == 2
    assert ps[0].child_node(0).get_whole_text() == "Hello"
    assert ps[1].child_node(0).get_whole_text() == "Another "
    assert doc.get_elements_by_tag("P") == ps

    imgs = doc.get_elements_by_tag("img")
    assert imgs[0].attr("src") == "foo.png"
    assert len(doc.get_elements_by_tag("wtf")) == 0


def test_get_namespaced_elements_by_tag():  # ElementTest.swift:35-41
    doc = sf.parse("<div><abc:def id=1>Hello</abc:def></div>")
    els = doc.get_elements_by_tag("abc:def")
    assert len(els) == 1
    assert els[0].id() == "1"
    assert els[0].tag_name() == "abc:def"


def test_get_element_by_id():  # ElementTest.swift:43-54
    doc = sf.parse(REFERENCE)
    assert doc.get_element_by_id("div1").id() == "div1"
    assert doc.get_element_by_id("none") is None

    doc2 = sf.parse("<div id=1><div id=2><p>Hello "
                    "<span id=2>world!</span></p></div></div>")
    div2 = doc2.get_element_by_id("2")
    assert div2.tag_name() == "div"
    span = div2.child(0).get_element_by_id("2")
    assert span.tag_name() == "span"


def test_get_text():  # ElementTest.swift:56-60
    doc = sf.parse(REFERENCE)
    assert doc.text() == "Hello Another element"
    assert doc.get_elements_by_tag("p")[1].text() == "Another element"


def test_get_child_text():  # ElementTest.swift:62-67
    p = sf.parse("<p>Hello <b>there</b> now").select("p")[0]
    assert p.text() == "Hello there now"
    assert p.own_text() == "Hello now"


def test_normalises_text():  # ElementTest.swift:69-74
    doc = sf.parse("<p>Hello<p>There.</p> \n <p>Here <b>is</b> \n "
                   "s<b>om</b>e text.")
    assert doc.text() == "Hello There. Here is some text."


def test_normalises_nbsp_text():  # ElementTest.swift:76-84
    doc = sf.parse("<p>a b\tc</p><p>d</p>")
    assert doc.text() == "a b c d"
    p = doc.select("p")[0]
    assert p.text() == "a b c"
    assert p.own_text() == "a b c"


def test_own_text_excludes_child_text_with_nbsp():
    # ElementTest.swift:86-92
    p = sf.parse("<p>a b<span>c</span>d</p>").select("p")[0]
    assert p.own_text() == "a bd"
    assert p.text() == "a bcd"


def test_text_trims_trailing_nbsp():  # ElementTest.swift:94-99
    doc = sf.parse("<p>a&nbsp;</p>")
    assert doc.text() == "a"
    assert doc.select("p")[0].text() == "a"


def test_keeps_pre_text():  # ElementTest.swift:101-105
    doc = sf.parse("<p>Hello \n \n there.</p> <div><pre>  What's \n\n"
                   "  that?</pre>")
    assert doc.text() == "Hello there.   What's \n\n  that?"


def test_keeps_pre_text_in_code():  # ElementTest.swift:107-112
    doc = sf.parse("<pre><code>code\n\ncode</code></pre>")
    assert doc.text() == "code\n\ncode"
    assert doc.body().html() == "<pre><code>code\n\ncode</code></pre>"


def test_br_has_space():  # ElementTest.swift:114-121
    doc = sf.parse("<p>Hello<br>there</p>")
    assert doc.text() == "Hello there"
    assert doc.select("p")[0].own_text() == "Hello there"

    doc = sf.parse("<p>Hello <br> there</p>")
    assert doc.text() == "Hello there"


def test_get_siblings():  # ElementTest.swift:123-131
    doc = sf.parse("<div><p>Hello<p id=1>there<p>this<p>is<p>an"
                   "<p id=last>element</div>")
    p = doc.get_element_by_id("1")
    assert p.text() == "there"
    assert p.previous_element_sibling().text() == "Hello"
    assert p.next_element_sibling().text() == "this"
    assert p.first_element_sibling().text() == "Hello"
    assert p.last_element_sibling().text() == "element"


def test_get_siblings_with_duplicate_content():  # ElementTest.swift:133-143
    doc = sf.parse("<div><p>Hello<p id=1>there<p>this<p>this<p>is<p>an"
                   "<p id=last>element</div>")
    p = doc.get_element_by_id("1")
    assert p.text() == "there"
    assert p.previous_element_sibling().text() == "Hello"
    n = p.next_element_sibling()
    assert n.text() == "this"
    assert n.next_element_sibling().text() == "this"
    assert n.next_element_sibling().next_element_sibling().text() == "is"
    assert p.first_element_sibling().text() == "Hello"
    assert p.last_element_sibling().text() == "element"


def test_get_parents():  # ElementTest.swift:145-155
    doc = sf.parse("<div><p>Hello <span>there</span></div>")
    span = doc.select("span")[0]
    parents = span.parents()
    assert len(parents) == 4
    assert [p.tag_name() for p in parents] == ["p", "div", "body", "html"]


def test_element_sibling_index():  # ElementTest.swift:157-171
    for h in ("<div><p>One</p>...<p>Two</p>...<p>Three</p>",
              "<div><p>One</p>...<p>One</p>...<p>One</p>"):
        ps = sf.parse(h).select("p")
        assert [p.element_sibling_index() for p in ps] == [0, 1, 2]


def test_get_elements_with_class():  # ElementTest.swift:173-188
    doc = sf.parse("<div class='mellow yellow'><span class=mellow>Hello "
                   "<b class='yellow'>Yellow!</b></span><p>Empty</p></div>")
    els = doc.get_elements_by_class("mellow")
    assert [e.tag_name() for e in els] == ["div", "span"]
    els2 = doc.get_elements_by_class("yellow")
    assert [e.tag_name() for e in els2] == ["div", "b"]
    assert doc.get_elements_by_class("solo") == []


def test_get_elements_with_attribute():  # ElementTest.swift:190-199
    doc = sf.parse("<div style='bold'><p title=qux><p><b style></b></p>"
                   "</div>")
    els = doc.get_elements_by_attribute("style")
    assert [e.tag_name() for e in els] == ["div", "b"]
    assert doc.get_elements_by_attribute("class") == []


def test_get_elements_with_attribute_dash():  # ElementTest.swift:201-206
    doc = sf.parse("<meta http-equiv=content-type value=utf8 id=1> "
                   "<meta name=foo content=bar id=2> "
                   "<div http-equiv=content-type value=utf8 id=3>")
    meta = doc.select("meta[http-equiv=content-type], meta[charset]")
    assert len(meta) == 1
    assert meta[0].id() == "1"


def test_get_elements_with_attribute_value():  # ElementTest.swift:208-216
    doc = sf.parse("<div style='bold'><p><p><b style></b></p></div>")
    els = doc.get_elements_by_attribute_value("style", "bold")
    assert len(els) == 1
    assert els[0].tag_name() == "div"
    assert doc.get_elements_by_attribute_value("style", "none") == []


def test_attribute_lookups_follow_mutation():  # ElementTest.swift:218-238
    doc = sf.parse("<div><a href=one>One</a><a>Two</a></div>")
    assert len(doc.get_elements_by_attribute("href")) == 1
    second = doc.select("a")[1]
    second.set_attr("href", "two")
    assert len(doc.get_elements_by_attribute("href")) == 2
    by_value = doc.get_elements_by_attribute_value("href", "two")
    assert len(by_value) == 1
    assert by_value[0].text() == "Two"
    second.remove_attr("href")
    assert len(doc.get_elements_by_attribute("href")) == 1
    assert doc.get_elements_by_attribute_value("href", "two") == []


def test_id_lookup_follows_mutation():  # ElementTest.swift:240-250
    doc = sf.parse("<div id=one></div><div></div>")
    assert doc.get_element_by_id("one") is not None
    second = doc.select("div")[1]
    second.set_attr("id", "two")
    assert doc.get_element_by_id("two") is not None
    second.remove_attr("id")
    assert doc.get_element_by_id("two") is None


def test_class_dom_methods():  # ElementTest.swift:252-268
    doc = sf.parse("<div><span class=' mellow yellow '>Hello "
                   "<b>Yellow</b></span></div>")
    span = doc.get_elements_by_attribute("class")[0]
    assert span.class_name() == "mellow yellow"
    assert span.has_class("mellow")
    assert span.has_class("yellow")
    classes = span.class_names()
    assert len(classes) == 2
    assert "mellow" in classes and "yellow" in classes

    assert doc.class_name() == ""
    assert len(doc.class_names()) == 0
    assert not doc.has_class("mellow")


def test_has_class_dom_methods():  # ElementTest.swift:270-327
    el = Element(tag_for("a"), "")
    for cls, expect in [("toto", True), (" toto", True), ("toto ", True),
                        ("\ttoto ", True), ("  toto ", True),
                        ("ab", False), ("     ", False),
                        ("tototo", False)]:
        el.set_attr("class", cls)
        assert el.has_class("toto") is expect, cls
    for cls in ["raulpismuth  ", " abcd  raulpismuth efgh ",
                " abcd efgh raulpismuth", " abcd efgh raulpismuth "]:
        el.set_attr("class", cls)
        assert el.has_class("raulpismuth")
    s = chr(135361)
    el.set_attr("class", s)
    assert el.has_class(s)


def test_class_updates():  # ElementTest.swift:329-340
    div = sf.parse("<div class='mellow yellow'></div>").select("div")[0]
    div.add_class("green")
    assert div.class_name() == "mellow yellow green"
    div.remove_class("red")  # noop
    div.remove_class("yellow")
    assert div.class_name() == "mellow green"
    div.toggle_class("green")
    div.toggle_class("red")
    assert div.class_name() == "mellow red"


def test_outer_html():  # ElementTest.swift:342-346
    doc = sf.parse("<div title='Tags &amp;c.'><img src=foo.png>"
                   "<p><!-- comment -->Hello<p>there")
    assert strip_newlines(doc.outer_html()) == (
        '<html><head></head><body><div title="Tags &amp;c.">'
        '<img src="foo.png" /><p><!-- comment -->Hello</p><p>there</p>'
        "</div></body></html>")


def test_inner_html():  # ElementTest.swift:348-351
    doc = sf.parse("<div>\n <p>Hello</p> </div>")
    assert doc.get_elements_by_tag("div")[0].html() == "<p>Hello</p>"


def test_format_html():  # ElementTest.swift:353-356
    doc = sf.parse("<title>Format test</title><div><p>Hello <span>jsoup "
                   "<span>users</span></span></p><p>Good.</p></div>")
    assert doc.html() == (
        "<html>\n <head>\n  <title>Format test</title>\n </head>\n"
        " <body>\n  <div>\n   <p>Hello <span>jsoup <span>users</span>"
        "</span></p>\n   <p>Good.</p>\n  </div>\n </body>\n</html>")


def test_format_outline():  # ElementTest.swift:358-362
    doc = sf.parse("<title>Format test</title><div><p>Hello <span>jsoup "
                   "<span>users</span></span></p><p>Good.</p></div>")
    doc.output_settings.outline = True
    assert doc.html() == (
        "<html>\n <head>\n  <title>Format test</title>\n </head>\n"
        " <body>\n  <div>\n   <p>\n    Hello \n    <span>\n     jsoup \n"
        "     <span>users</span>\n    </span>\n   </p>\n   <p>Good.</p>\n"
        "  </div>\n </body>\n</html>")


def test_set_indent():  # ElementTest.swift:364-368
    doc = sf.parse("<div><p>Hello\nthere</p></div>")
    doc.output_settings.indent_amount = 0
    assert doc.html() == ("<html>\n<head></head>\n<body>\n<div>\n"
                          "<p>Hello there</p>\n</div>\n</body>\n</html>")


def test_not_pretty():  # ElementTest.swift:370-377
    doc = sf.parse("<div>   \n<p>Hello\n there\n</p></div>")
    doc.output_settings.pretty_print = False
    assert doc.html() == ("<html><head></head><body><div>   \n"
                          "<p>Hello\n there\n</p></div></body></html>")
    assert doc.select("div")[0].html() == "   \n<p>Hello\n there\n</p>"


def test_empty_element_format_html():  # ElementTest.swift:379-383
    doc = sf.parse("<section><div></div></section>")
    assert doc.select("section")[0].outer_html() == \
        "<section>\n <div></div>\n</section>"


def test_no_indent_on_script_and_style():  # ElementTest.swift:385-389
    doc = sf.parse("<script>one\ntwo</script>\n<style>three\nfour</style>")
    assert doc.head().html() == \
        "<script>one\ntwo</script> \n<style>three\nfour</style>"


def test_container_output():  # ElementTest.swift:391-396
    doc = sf.parse("<title>Hello there</title> <div><p>Hello</p>"
                   "<p>there</p></div> <div>Another</div>")
    assert doc.select("title")[0].outer_html() == \
        "<title>Hello there</title>"
    assert doc.select("div")[0].outer_html() == \
        "<div>\n <p>Hello</p>\n <p>there</p>\n</div>"
    assert doc.select("body")[0].html() == (
        "<div>\n <p>Hello</p>\n <p>there</p>\n</div> \n"
        "<div>\n Another\n</div>")


def test_set_text():  # ElementTest.swift:398-407
    doc = sf.parse("<div id=1>Hello <p>there <b>now</b></p></div>")
    assert doc.text() == "Hello there now"
    assert doc.select("p")[0].text() == "there now"
    div = doc.get_element_by_id("1")
    div.set_text("Gone")
    assert div.text() == "Gone"
    assert len(doc.select("p")) == 0


def test_add_new_element():  # ElementTest.swift:409-423
    doc = sf.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.append_element("p").set_text("there")
    el = div.append_element("P")
    el.set_attr("CLASS", "second")
    el.set_text("now")
    assert strip_newlines(doc.html()) == (
        '<html><head></head><body><div id="1"><p>Hello</p><p>there</p>'
        '<P CLASS="second">now</P></div></body></html>')
    ps = doc.select("p")
    for i, p in enumerate(ps):
        assert p.sibling_index == i


def test_add_boolean_attribute():  # ElementTest.swift:425-443
    div = Element(tag_for("div"), "")
    div._attrs().put("true", None)  # boolean attribute
    div.set_attr("false", "value")
    div.remove_attr("false")
    assert div.has_attr("true")
    assert div.attr("true") == ""
    assert div._attrs().size() == 1
    assert not div.has_attr("false")
    assert div.outer_html() == "<div true></div>"


def test_append_row_to_table():  # ElementTest.swift:445-451
    doc = sf.parse("<table><tr><td>1</td></tr></table>")
    doc.select("tbody")[0].append_html("<tr><td>2</td></tr>")
    assert strip_newlines(doc.body().html()) == (
        "<table><tbody><tr><td>1</td></tr><tr><td>2</td></tr></tbody>"
        "</table>")


def test_prepend_row_to_table():  # ElementTest.swift:453-465
    doc = sf.parse("<table><tr><td>1</td></tr></table>")
    doc.select("tbody")[0].prepend_html("<tr><td>2</td></tr>")
    assert strip_newlines(doc.body().html()) == (
        "<table><tbody><tr><td>2</td></tr><tr><td>1</td></tr></tbody>"
        "</table>")
    for i, tr in enumerate(doc.select("tr")):
        assert tr.sibling_index == i


def test_prepend_element():  # ElementTest.swift:467-473
    doc = sf.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.prepend_element("p").set_text("Before")
    assert div.child(0).text() == "Before"
    assert div.child(1).text() == "Hello"


def test_add_new_text():  # ElementTest.swift:475-480
    doc = sf.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.append_text(" there & now >")
    assert strip_newlines(div.html()) == \
        "<p>Hello</p> there &amp; now &gt;"


def test_prepend_text():  # ElementTest.swift:482-488
    doc = sf.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.prepend_text("there & now > ")
    assert div.text() == "there & now > Hello"
    assert strip_newlines(div.html()) == \
        "there &amp; now &gt; <p>Hello</p>"


def test_add_new_html():  # ElementTest.swift:504-515
    doc = sf.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.append_html("<p>there</p><p>now</p>")
    assert strip_newlines(div.html()) == "<p>Hello</p><p>there</p><p>now</p>"
    for i, p in enumerate(doc.select("p")):
        assert p.sibling_index == i


def test_prepend_new_html():  # ElementTest.swift:517-528
    doc = sf.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.prepend_html("<p>there</p><p>now</p>")
    assert strip_newlines(div.html()) == "<p>there</p><p>now</p><p>Hello</p>"
    for i, p in enumerate(doc.select("p")):
        assert p.sibling_index == i


def test_set_html():  # ElementTest.swift:530-535
    doc = sf.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.set_html("<p>there</p><p>now</p>")
    assert strip_newlines(div.html()) == "<p>there</p><p>now</p>"


def test_set_html_title():  # ElementTest.swift:537-549
    doc = sf.parse("<html><head id=2><title id=1></title></head></html>")
    title = doc.get_element_by_id("1")
    title.set_html("good")
    assert title.html() == "good"
    title.set_html("<i>bad</i>")
    assert title.html() == "&lt;i&gt;bad&lt;/i&gt;"
    head = doc.get_element_by_id("2")
    head.set_html("<title><i>bad</i></title>")
    assert head.html() == "<title>&lt;i&gt;bad&lt;/i&gt;</title>"


def test_wrap():  # ElementTest.swift:551-562
    doc = sf.parse("<div><p>Hello</p><p>There</p></div>")
    p = doc.select("p")[0]
    p.wrap("<div class='head'></div>")
    assert strip_newlines(doc.body().html()) == (
        '<div><div class="head"><p>Hello</p></div><p>There</p></div>')
    ret = p.wrap("<div><div class=foo></div><p>What?</p></div>")
    assert strip_newlines(doc.body().html()) == (
        '<div><div class="head"><div><div class="foo"><p>Hello</p>'
        "</div><p>What?</p></div></div><p>There</p></div>")
    assert ret is p


def test_before():  # ElementTest.swift:564-572
    doc = sf.parse("<div><p>Hello</p><p>There</p></div>")
    p1 = doc.select("p")[0]
    p1.before_html("<div>one</div><div>two</div>")
    assert strip_newlines(doc.body().html()) == (
        "<div><div>one</div><div>two</div><p>Hello</p><p>There</p></div>")
    doc.select("p")[-1].before_html("<p>Three</p><!-- four -->")
    assert strip_newlines(doc.body().html()) == (
        "<div><div>one</div><div>two</div><p>Hello</p><p>Three</p>"
        "<!-- four --><p>There</p></div>")


def test_after():  # ElementTest.swift:574-582
    doc = sf.parse("<div><p>Hello</p><p>There</p></div>")
    p1 = doc.select("p")[0]
    p1.after_html("<div>one</div><div>two</div>")
    assert strip_newlines(doc.body().html()) == (
        "<div><p>Hello</p><div>one</div><div>two</div><p>There</p></div>")
    doc.select("p")[-1].after_html("<p>Three</p><!-- four -->")
    assert strip_newlines(doc.body().html()) == (
        "<div><p>Hello</p><div>one</div><div>two</div><p>There</p>"
        "<p>Three</p><!-- four --></div>")


def test_wrap_with_remainder():  # ElementTest.swift:584-589
    doc = sf.parse("<div><p>Hello</p></div>")
    doc.select("p")[0].wrap("<div class='head'></div><p>There!</p>")
    assert strip_newlines(doc.body().html()) == (
        '<div><div class="head"><p>Hello</p><p>There!</p></div></div>')


def test_has_text():  # ElementTest.swift:591-599
    doc = sf.parse("<div><p>Hello</p><p></p></div>")
    ps = doc.select("p")
    assert doc.select("div")[0].has_text()
    assert ps[0].has_text()
    assert not ps[-1].has_text()


def test_parentless_to_string():  # ElementTest.swift:636-643
    doc = sf.parse("<img src='foo'>")
    img = doc.select("img")[0]
    assert img.outer_html() == '<img src="foo" />'
    img.remove()
    assert img.outer_html() == '<img src="foo" />'


def test_clone():  # ElementTest.swift:645-663
    doc = sf.parse("<div><p>One<p><span>Two</div>")
    p = doc.select("p")[1]
    clone = p.clone()
    assert clone.parent() is None
    assert clone.sibling_index == 0
    assert p.sibling_index == 1
    assert p.parent() is not None

    clone.append_html("<span>Three")
    assert strip_newlines(clone.outer_html()) == \
        "<p><span>Two</span><span>Three</span></p>"
    assert strip_newlines(doc.body().html()) == \
        "<div><p>One</p><p><span>Two</span></p></div>"

    doc.body().append_child(clone)
    assert clone.parent() is not None
    assert strip_newlines(doc.body().html()) == (
        "<div><p>One</p><p><span>Two</span></p></div>"
        "<p><span>Two</span><span>Three</span></p>")


def test_clones_classnames():  # ElementTest.swift:677-699
    doc = sf.parse("<div class='one two'></div>")
    div = doc.select("div")[0]
    classes = div.class_names()
    assert sorted(classes) == ["one", "two"]
    copy = div.clone()
    copy_classes = copy.class_names()
    assert sorted(copy_classes) == ["one", "two"]
    copy_classes.append("three")
    copy_classes.remove("one")
    assert "one" in div.class_names()
    assert "three" not in div.class_names()
    assert div.html() == ""
    assert copy.html() == ""


def test_tag_name_set():  # ElementTest.swift:702-708
    doc = sf.parse("<div><i>Hello</i>")
    doc.select("i")[0].set_tag_name("em")
    assert len(doc.select("i")) == 0
    assert len(doc.select("em")) == 1
    assert doc.select("div")[0].html() == "<em>Hello</em>"


def test_tag_lookup_after_tag_name_change():  # ElementTest.swift:710-718
    doc = sf.parse("<div><p id=1>One</p><p id=2>Two</p></div>")
    assert len(doc.get_elements_by_tag("p")) == 2
    doc.get_element_by_id("1").set_tag_name("span")
    assert len(doc.get_elements_by_tag("p")) == 1
    spans = doc.get_elements_by_tag("span")
    assert len(spans) == 1
    assert spans[0].id() == "1"


def test_attribute_value_lookup_case_insensitive():
    # ElementTest.swift:720-725
    doc = sf.parse("<a href=One id=1></a><a href=two id=2></a>")
    els = doc.get_elements_by_attribute_value("href", "one")
    assert len(els) == 1
    assert els[0].id() == "1"


def test_attribute_name_order_preserved():  # ElementTest.swift:727-733
    doc = sf.parse("<div><a href=one id=1></a><span></span>"
                   "<a href=two id=2></a></div>")
    els = doc.get_elements_by_attribute("href")
    assert [e.id() for e in els] == ["1", "2"]


def test_lookups_agree_with_select_after_mutations():
    # ElementTest.swift:795-834 (observable contract of the index tests)
    doc = sf.parse("<div id=wrap>"
                   "<p id=a class=one href=one>One</p>"
                   "<p id=b class=two>Two</p>"
                   "<span id=c class=one data-x=1>Three</span>"
                   "</div>")
    a = doc.get_element_by_id("a")
    b = doc.get_element_by_id("b")
    c = doc.get_element_by_id("c")
    a.set_tag_name("span")
    b.set_attr("class", "one")
    b.set_attr("href", "two")
    c.set_attr("href", "one")
    a.remove_attr("class")
    b.remove()
    wrap = doc.get_element_by_id("wrap")
    new = wrap.append_element("p")
    new.set_attr("id", "new")
    new.set_attr("class", "one")
    new.set_attr("href", "one")
    new.set_text("New")

    def ids(els):
        return [e.id() for e in els]

    assert ids(doc.select("p")) == ids(doc.get_elements_by_tag("p"))
    assert ids(doc.select(".one")) == ids(doc.get_elements_by_class("one"))
    assert ids(doc.select("[href]")) == \
        ids(doc.get_elements_by_attribute("href"))
    assert ids(doc.select("[href=one]")) == \
        ids(doc.get_elements_by_attribute_value("href", "one"))
    assert doc.select("p.one[href=one]")[0].id() == "new"


def test_text_after_mutations():  # ElementTest.swift:937-1012
    doc = sf.parse("<div><p id=1>Hello</p></div>")
    assert doc.text() == "Hello"
    doc.get_element_by_id("1").set_text("Updated")
    assert doc.text() == "Updated"

    doc = sf.parse("<div id=1><p>One</p></div>")
    doc.get_element_by_id("1").append_html("<p>Two</p>")
    assert doc.text() == "One Two"

    doc = sf.parse("<div><span id=one>One</span><span id=two>Two</span>"
                   "</div>")
    assert doc.text() == "OneTwo"
    doc.get_element_by_id("two").set_tag_name("br")
    assert doc.text() == "One Two"

    doc = sf.parse("<div id=1><p>One</p><p>Two</p></div>")
    doc.select("p")[0].remove()
    assert doc.text() == "Two"

    doc = sf.parse("<div id=1><p>One</p></div>")
    span = sf.parse("<span>Two</span>").select("span")[0]
    doc.select("p")[0].replace_with(span)
    assert doc.text() == "Two"

    doc = sf.parse("<p id=1>HelloWorld</p>")
    doc.get_element_by_id("1").text_nodes()[0].split_text(5)
    assert doc.text() == "HelloWorld"

    doc = sf.parse("<div id=1><span>One</span></div>")
    doc.select("span")[0].unwrap()
    assert doc.text() == "One"

    doc = sf.parse("<div id=1><p>One</p></div>")
    p = doc.select("p")[0]
    p.before_html("<span>Zero</span>")
    p.after_html("<span>Two</span>")
    assert doc.text() == "Zero OneTwo"

    doc = sf.parse("<div id=1><p>One</p></div>")
    div = doc.get_element_by_id("1")
    span = sf.parse("<span>Two</span>").select("span")[0]
    div.replace_child(div.child(0), span)
    assert doc.text() == "Two"


def test_html_contains_outer():  # ElementTest.swift:1014-1019
    doc = sf.parse("<title>Check</title> <div>Hello there</div>")
    doc.output_settings.indent_amount = 0
    assert doc.select("title")[0].outer_html() in doc.html()
    assert doc.select("div")[0].outer_html() in doc.html()


def test_get_text_nodes():  # ElementTest.swift:1021-1031
    doc = sf.parse("<p>One <span>Two</span> Three <br> Four</p>")
    tns = doc.select("p")[0].text_nodes()
    assert len(tns) == 3
    assert tns[0].text() == "One "
    assert tns[1].text() == " Three "
    assert tns[2].text() == " Four"
    assert doc.select("br")[0].text_nodes() == []


def test_manipulate_text_nodes():  # ElementTest.swift:1033-1044
    doc = sf.parse("<p>One <span>Two</span> Three <br> Four</p>")
    p = doc.select("p")[0]
    tns = p.text_nodes()
    tns[1].set_text(" three-more ")
    tns[2].split_text(3).set_text("-ur")
    assert p.text() == "One Two three-more Fo-ur"
    assert p.own_text() == "One three-more Fo-ur"
    assert len(p.text_nodes()) == 4


def test_get_data_nodes():  # ElementTest.swift:1046-1062
    doc = sf.parse("<script>One Two</script> <style>Three Four</style> "
                   "<p>Fix Six</p>")
    script_data = doc.select("script")[0].data_nodes()
    assert len(script_data) == 1
    assert script_data[0].get_whole_data() == "One Two"
    style_data = doc.select("style")[0].data_nodes()
    assert len(style_data) == 1
    assert style_data[0].get_whole_data() == "Three Four"
    assert doc.select("p")[0].data_nodes() == []


def test_data_node_attr():  # ElementTest.swift:1064-1072
    doc = sf.parse("<script>One Two</script>")
    dn = doc.select("script")[0].data_nodes()[0]
    assert dn.get_whole_data() == "One Two"
    assert dn.attr("data") == "One Two"
    assert dn.has_attr("data")


def test_element_is_not_a_sibling_of_itself():  # ElementTest.swift:1074-1083
    doc = sf.parse("<div><p>One<p>Two<p>Three</div>")
    p2 = doc.select("p")[1]
    assert p2.text() == "Two"
    els = p2.sibling_elements()
    assert len(els) == 2
    assert els[0].outer_html() == "<p>One</p>"
    assert els[1].outer_html() == "<p>Three</p>"


def test_children_and_child():  # ElementTest.swift:1085-1091
    div = sf.parse("<div><p>One</p><p>Two</p></div>").select("div")[0]
    assert len(div.children()) == 2
    assert div.child(0).text() == "One"


def test_move_by_append():  # ElementTest.swift:1093-1110
    doc = sf.parse("<div id=1>Text <p>One</p> Text <p>Two</p></div>"
                   "<div id=2></div>")
    div1 = doc.select("div")[0]
    div2 = doc.select("div")[1]
    assert div1.child_node_size() == 4
    children = list(div1.child_nodes)
    div2.insert_children_at(0, children)
    assert div1.child_node_size() == 0
    assert div2.child_node_size() == 4
    assert doc.body().html() == (
        '<div id="1"></div>\n<div id="2">\n Text \n <p>One</p> Text \n'
        " <p>Two</p>\n</div>")


def test_insert_children_argument_validation():
    # ElementTest.swift:1112-1128
    import pytest
    doc = sf.parse("<div id=1>Text <p>One</p> Text <p>Two</p></div>"
                   "<div id=2></div>")
    div1 = doc.select("div")[0]
    div2 = doc.select("div")[1]
    children = list(div1.child_nodes)
    with pytest.raises(ValueError):
        div2.insert_children_at(6, children)
    with pytest.raises(ValueError):
        div2.insert_children_at(-5, children)


def test_insert_children_at_position():  # ElementTest.swift:1130-1157
    doc = sf.parse("<div id=1>Text1 <p>One</p> Text2 <p>Two</p></div>"
                   "<div id=2>Text3 <p>Three</p></div>")
    div1 = doc.select("div")[0]
    p1s = div1.select("p")
    div2 = doc.select("div")[1]
    assert div2.child_node_size() == 2
    div2.insert_children_at(-1, list(p1s))
    assert div1.child_node_size() == 2
    assert div2.child_node_size() == 4
    assert p1s[1].sibling_index == 3

    el1 = Element(tag_for("span"), "")
    el1.set_text("Span1")
    el2 = Element(tag_for("span"), "")
    el2.set_text("Span2")
    tn1 = TextNode("Text4", "")
    assert el1.parent() is None
    div2.insert_children_at(-2, [el1, el2, tn1])
    assert el1.parent() is div2
    assert div2.child_node_size() == 7
    assert el1.sibling_index == 3
    assert el2.sibling_index == 4
    assert tn1.sibling_index == 5


def test_insert_children_as_copy():  # ElementTest.swift:1159-1171
    doc = sf.parse("<div id=1>Text <p>One</p> Text <p>Two</p></div>"
                   "<div id=2></div>")
    div1 = doc.select("div")[0]
    div2 = doc.select("div")[1]
    ps = [p.clone() for p in doc.select("p")]
    ps[0].set_text("One cloned")
    div2.insert_children_at(-1, ps)
    assert div1.child_node_size() == 4  # not moved -- cloned
    assert div2.child_node_size() == 2
    assert strip_newlines(doc.body().html()) == (
        '<div id="1">Text <p>One</p> Text <p>Two</p></div>'
        '<div id="2"><p>One cloned</p><p>Two</p></div>')


def test_css_path():  # ElementTest.swift:1173-1185
    doc = sf.parse('<div id="id1">A</div><div>B</div>'
                   '<div class="c1 c2">C</div>')
    div_a, div_b, div_c = doc.select("div")
    assert div_a.css_selector() == "#id1"
    assert div_b.css_selector() == "html > body > div:nth-child(2)"
    assert div_c.css_selector() == "html > body > div.c1.c2"
    assert doc.select(div_a.css_selector())[0] is div_a
    assert doc.select(div_b.css_selector())[0] is div_b
    assert doc.select(div_c.css_selector())[0] is div_c


def test_css_path_escapes_class_names():  # ElementTest.swift:1187-1196
    doc = sf.parse('<div class="Fz(xs) Fw(b)"><div>149.64</div></div>')
    el = doc.get_elements_containing_own_text("149.64")[0]
    assert el.css_selector() == \
        "html > body > div.Fz\\(xs\\).Fw\\(b\\) > div"
    assert doc.select(el.css_selector())[0] is el
    assert doc.select(".Fw\\(b\\) > div")[0].text() == "149.64"


def test_css_path_escapes_id():  # ElementTest.swift:1198-1204
    doc = sf.parse('<div id="quote:body/main">A</div>')
    el = doc.select("div")[0]
    assert el.css_selector() == "#quote\\:body\\/main"
    assert doc.select(el.css_selector())[0] is el


def test_class_names():  # ElementTest.swift:1206-1238
    doc = sf.parse('<div class="c1 c2">C</div>')
    div = doc.select("div")[0]
    assert div.class_name() == "c1 c2"
    set1 = div.class_names()
    assert list(set1) == ["c1", "c2"]

    # changes to the returned set are not reflected
    set1.append("c3")
    assert len(div.class_names()) == 2
    assert div.class_name() == "c1 c2"

    div.set_class_names(list(set1))
    assert div.class_name() == "c1 c2 c3"
    assert list(div.class_names()) == ["c1", "c2", "c3"]


def test_hash_and_equals_and_value():  # ElementTest.swift:1240-1288
    doc1 = ("<div id=1><p class=one>One</p><p class=one>One</p>"
            "<p class=one>Two</p><p class=two>One</p></div>"
            "<div id=2><p class=one>One</p><p class=one>One</p>"
            "<p class=one>Two</p><p class=two>One</p></div>")
    els = sf.parse(doc1).select("p")
    assert len(els) == 8
    e0 = els[0]
    assert e0 is e0
    assert e0.has_same_value(els[1])
    assert e0.has_same_value(els[4])
    assert e0.has_same_value(els[5])
    assert e0 is not els[2]
    assert not e0.has_same_value(els[2])
    assert not e0.has_same_value(els[3])
    assert not e0.has_same_value(els[6])
    assert not e0.has_same_value(els[7])


def test_relative_urls():  # ElementTest.swift:1290-1300
    html = ("<body><a href='./one.html'>One</a> <a href='two.html'>two"
            "</a> <a href='../three.html'>Three</a> "
            "<a href='//example2.com/four/'>Four</a> "
            "<a href='https://example2.com/five/'>Five</a>")
    els = sf.parse(html, "http://example.com/bar/").select("a")
    assert els[0].abs_url("href") == "http://example.com/bar/one.html"
    assert els[1].abs_url("href") == "http://example.com/bar/two.html"
    assert els[2].abs_url("href") == "http://example.com/three.html"
    assert els[3].abs_url("href") == "http://example2.com/four/"
    assert els[4].abs_url("href") == "https://example2.com/five/"


def test_append_moves_children_inside_one_parent():
    # ElementTest.swift:1302-1319
    import re

    from soupflow.dom import Document
    doc = Document("")
    body = doc.append_element("body")
    body.append_element("div1")
    body.append_element("div2")
    div3 = body.append_element("div3")
    div3.set_text("Check")
    div4 = body.append_element("div4")
    body.insert_children_at(0, [div3, div4])
    result = re.sub(r"\s+", "", doc.outer_html())
    assert result == ("<body><div3>Check</div3><div4></div4>"
                      "<div1></div1><div2></div2></body>")


def test_namespaced_elements():  # ElementTest.swift:1330-1337
    doc = sf.parse("<html><body><fb:comments /></body></html>",
                   "http://example.com/bar/")
    els = doc.select("fb|comments")
    assert len(els) == 1
    assert els[0].css_selector() == "html > body > fb|comments"


def test_chained_remove_attributes():  # ElementTest.swift:1339-1350
    a = sf.parse("<a one two three four>Text</a>").select("a")[0]
    a.remove_attr("zero").remove_attr("one").remove_attr("two") \
        .remove_attr("three").remove_attr("four").remove_attr("five")
    assert a.outer_html() == "<a>Text</a>"


def test_is():  # ElementTest.swift:1352-1372
    doc = sf.parse("<div><p>One <a class=big>Two</a> Three</p>"
                   "<p>Another</p>")
    p = doc.select("p")[0]
    assert p.matches("p")
    assert not p.matches("div")
    assert p.matches("p:has(a)")
    assert p.matches("p:first-child")
    assert not p.matches("p:last-child")
    assert p.matches("*")
    assert p.matches("div p")

    q = doc.select("p")[-1]
    assert q.matches("p")
    assert q.matches("p ~ p")
    assert q.matches("p + p")
    assert q.matches("p:last-child")
    assert not q.matches("p a")
    assert not q.matches("a")


def test_get_elements_by_tag_duplicates_regression():
    # ElementTest.swift:1374-1380
    doc = sf.parse("<ruby></ruby>")
    els = doc.get_elements_by_tag("ruby")
    assert len(els) == 1
    assert len(doc.body().get_elements_by_tag("ruby")) == len(els)


def test_get_elements_by_tag_regression():  # ElementTest.swift:1382-1393
    doc = sf.parse_body_fragment("<p><u>test</u></p>")
    assert len(doc.body().get_elements_by_tag("p")) == 1
    assert len(doc.get_elements_by_tag("p")) == 1
    assert len(doc.body().get_elements_by_tag("u")) == 1
    assert len(doc.get_elements_by_tag("u")) == 1


def test_get_elements_by_class_normalization_regression():
    # ElementTest.swift:1395-1400
    doc = sf.parse('<div class="ClassWithUppercase">Text</div>')
    els = doc.get_elements_by_class("ClassWithUppercase")
    assert len(els) == 1
    assert els[0].tag_name() == "div"

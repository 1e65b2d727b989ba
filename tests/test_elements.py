"""Ported from /root/reference/Tests/SwiftSoupTests/ElementsTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf

from .util import strip_newlines


def test_filter():  # ElementsTest.swift:14-21
    h = ("<p>Excl</p><div class=headline><p>Hello</p><p>There</p></div>"
         "<div class=headline><h1>Headline</h1></div>")
    els = sf.parse(h).select(".headline").select("p")
    assert len(els) == 2
    assert els[0].text() == "Hello"
    assert els[1].text() == "There"


def test_random_access_collection():  # ElementsTest.swift:23-32
    h = ("<div><p>one</p><div class=headline><p>two</p><p>three</p></div>"
         "<p>four</p></div>")
    els = sf.parse(h).select("p")
    assert len(els) == 4
    for el in els:
        assert el.tag_name() == "p"


def test_attributes():  # ElementsTest.swift:34-51
    doc = sf.parse("<p title=foo><p title=bar><p class=foo><p class=bar>")
    with_title = doc.select("p[title]")
    assert len(with_title) == 2
    assert with_title.has_attr("title")
    assert not with_title.has_attr("class")
    assert with_title.attr("title") == "foo"

    with_title.remove_attr("title")
    assert len(with_title) == 2  # existing Elements not reevaluated
    assert len(doc.select("p[title]")) == 0

    ps = doc.select("p").set_attr("style", "classy")
    assert len(ps) == 4
    assert ps.last().attr("style") == "classy"
    assert ps.last().attr("class") == "bar"


def test_has_attr():  # ElementsTest.swift:53-58
    ps = sf.parse("<p title=foo><p title=bar><p class=foo>"
                  "<p class=bar>").select("p")
    assert ps.has_attr("class")
    assert not ps.has_attr("style")


def test_has_abs_attr():  # ElementsTest.swift:60-68
    doc = sf.parse("<a id=1 href='/foo'>One</a> "
                   "<a id=2 href='https://google.com'>Two</a>")
    assert not doc.select("#1").has_attr("abs:href")
    assert doc.select("#2").has_attr("abs:href")
    assert doc.select("a").has_attr("abs:href")  # hits on #2


def test_attr():  # ElementsTest.swift:70-74
    doc = sf.parse("<p title=foo><p title=bar><p class=foo><p class=bar>")
    assert doc.select("p").attr("class") == "foo"


def test_abs_attr():  # ElementsTest.swift:76-85
    doc = sf.parse("<a id=1 href='/foo'>One</a> "
                   "<a id=2 href='https://google.com'>Two</a>")
    assert doc.select("#1").attr("abs:href") == ""
    assert doc.select("#2").attr("abs:href") == "https://google.com"
    assert doc.select("a").attr("abs:href") == "https://google.com"


def test_classes():  # ElementsTest.swift:87-99
    doc = sf.parse("<div><p class='mellow yellow'></p>"
                   "<p class='red green'></p>")
    els = doc.select("p")
    assert els.has_class("red")
    assert not els.has_class("blue")
    els.add_class("blue")
    els.remove_class("yellow")
    els.toggle_class("mellow")
    assert els[0].class_name() == "blue"
    assert els[1].class_name() == "red green blue mellow"


def test_text():  # ElementsTest.swift:101-105
    doc = sf.parse("<div><p>Hello<p>there<p>world</div>")
    assert doc.select("div > *").text() == "Hello there world"


def test_has_text():  # ElementsTest.swift:107-112
    doc = sf.parse("<div><p>Hello</p></div><div><p></p></div>")
    assert doc.select("div").has_text()
    assert not doc.select("div + div").has_text()


def test_html():  # ElementsTest.swift:114-118
    doc = sf.parse("<div><p>Hello</p></div><div><p>There</p></div>")
    assert doc.select("div").html() == "<p>Hello</p>\n<p>There</p>"


def test_outer_html():  # ElementsTest.swift:120-124
    doc = sf.parse("<div><p>Hello</p></div><div><p>There</p></div>")
    assert strip_newlines(doc.select("div").outer_html()) == \
        "<div><p>Hello</p></div><div><p>There</p></div>"


def test_set_html():  # ElementsTest.swift:126-135
    doc = sf.parse("<p>One</p><p>Two</p><p>Three</p>")
    ps = doc.select("p")
    ps.prepend_html("<b>Bold</b>").append_html("<i>Ital</i>")
    assert strip_newlines(ps[1].outer_html()) == \
        "<p><b>Bold</b>Two<i>Ital</i></p>"
    ps.set_html("<span>Gone</span>")
    assert strip_newlines(ps[1].outer_html()) == "<p><span>Gone</span></p>"


def test_val():  # ElementsTest.swift:137-148
    doc = sf.parse("<input value='one' /><textarea>two</textarea>")
    els = doc.select("input, textarea")
    assert len(els) == 2
    assert els.val() == "one"
    assert els.last().val() == "two"
    els.set_val("three")
    assert els.first().val() == "three"
    assert els.last().val() == "three"
    assert els.last().outer_html() == "<textarea>three</textarea>"


def test_before():  # ElementsTest.swift:150-154
    doc = sf.parse("<p>This <a>is</a> <a>SwiftSoup</a>.</p>")
    doc.select("a").before_html("<span>foo</span>")
    assert strip_newlines(doc.body().html()) == (
        "<p>This <span>foo</span><a>is</a> <span>foo</span>"
        "<a>SwiftSoup</a>.</p>")


def test_after():  # ElementsTest.swift:156-160
    doc = sf.parse("<p>This <a>is</a> <a>SwiftSoup</a>.</p>")
    doc.select("a").after_html("<span>foo</span>")
    assert strip_newlines(doc.body().html()) == (
        "<p>This <a>is</a><span>foo</span> <a>SwiftSoup</a>"
        "<span>foo</span>.</p>")


def test_wrap():  # ElementsTest.swift:162-167
    doc = sf.parse("<p><b>This</b> is <b>SwiftSoup</b></p>")
    doc.select("b").wrap("<i></i>")
    assert doc.body().html() == \
        "<p><i><b>This</b></i> is <i><b>SwiftSoup</b></i></p>"


def test_wrap_div():  # ElementsTest.swift:169-174
    doc = sf.parse("<p><b>This</b> is <b>SwiftSoup</b>.</p> "
                   "<p>How do you like it?</p>")
    doc.select("p").wrap("<div></div>")
    assert strip_newlines(doc.body().html()) == (
        "<div><p><b>This</b> is <b>SwiftSoup</b>.</p></div> "
        "<div><p>How do you like it?</p></div>")


def test_unwrap():  # ElementsTest.swift:176-181
    doc = sf.parse('<div><font>One</font> <font><a href="/">Two</a>'
                   "</font></div")
    doc.select("font").unwrap()
    assert strip_newlines(doc.body().html()) == \
        '<div>One <a href="/">Two</a></div>'


def test_unwrap_p():  # ElementsTest.swift:183-188
    doc = sf.parse("<p><a>One</a> Two</p> Three <i>Four</i> "
                   "<p>Fix <i>Six</i></p>")
    doc.select("p").unwrap()
    assert strip_newlines(doc.body().html()) == \
        "<a>One</a> Two Three <i>Four</i> Fix <i>Six</i>"


def test_unwrap_keeps_space():  # ElementsTest.swift:190-195
    doc = sf.parse("<p>One <span>two</span> <span>three</span> four</p>")
    doc.select("span").unwrap()
    assert doc.body().html() == "<p>One two three four</p>"


def test_empty():  # ElementsTest.swift:197-203
    doc = sf.parse("<div><p>Hello <b>there</b></p> <p>now!</p></div>")
    doc.output_settings.pretty_print = False
    doc.select("p").empty()
    assert doc.body().html() == "<div><p></p> <p></p></div>"


def test_remove():  # ElementsTest.swift:205-211
    doc = sf.parse("<div><p>Hello <b>there</b></p> SwiftSoup "
                   "<p>now!</p></div>")
    doc.output_settings.pretty_print = False
    doc.select("p").remove()
    assert doc.body().html() == "<div> SwiftSoup </div>"


def test_eq():  # ElementsTest.swift:213-218
    doc = sf.parse("<p>Hello<p>there<p>world")
    assert doc.select("p").eq(1).text() == "there"
    assert doc.select("p")[1].text() == "there"


def test_is():  # ElementsTest.swift:220-226
    ps = sf.parse("<p>Hello<p title=foo>there<p>world").select("p")
    assert ps.iS("[title=foo]")
    assert not ps.iS("[title=bar]")


def test_parents():  # ElementsTest.swift:228-236
    doc = sf.parse("<div><p>Hello</p></div><p>There</p>")
    parents = doc.select("p").parents()
    assert [p.tag_name() for p in parents] == ["div", "body", "html"]


def test_not():  # ElementsTest.swift:238-248
    doc = sf.parse("<div id=1><p>One</p></div> "
                   "<div id=2><p><span>Two</span></p></div>")
    div1 = doc.select("div").not_(":has(p > span)")
    assert len(div1) == 1
    assert div1.first().id() == "1"
    div2 = doc.select("div").not_("#1")
    assert len(div2) == 1
    assert div2.first().id() == "2"


def test_tag_name_set():  # ElementsTest.swift:250-255
    doc = sf.parse("<p>Hello <i>there</i> <i>now</i></p>")
    doc.select("i").set_tag_name("em")
    assert doc.body().html() == "<p>Hello <em>there</em> <em>now</em></p>"


def test_traverse():  # ElementsTest.swift:257-275
    doc = sf.parse("<div><p>Hello</p></div><div>There</div>")
    accum = []

    class Visitor:
        def head(self, node, depth):
            accum.append("<" + node.node_name() + ">")

        def tail(self, node, depth):
            accum.append("</" + node.node_name() + ">")

    doc.select("div").traverse(Visitor())
    assert "".join(accum) == \
        "<div><p><#text></#text></p></div><div><#text></#text></div>"


def test_forms():  # ElementsTest.swift:277-288
    doc = sf.parse("<form id=1><input name=q></form><div />"
                   "<form id=2><input name=f></form>")
    els = doc.select("*")
    assert len(els) == 9
    forms = els.forms()
    assert len(forms) == 2
    assert forms[0].id() == "1"
    assert forms[1].id() == "2"


def test_class_with_hyphen():  # ElementsTest.swift:290-295
    doc = sf.parse("<p class='tab-nav'>Check</p>")
    els = doc.get_elements_by_class("tab-nav")
    assert len(els) == 1
    assert els[0].text() == "Check"


def test_each_text():  # ElementsTest.swift:297-313
    doc = sf.parse("<div><p>1<p>2<p>3<p>4<p>5<p>6</div>"
                   "<div><p>7<p>8<p>9<p>10<p>11<p>12<p></p></div>")
    div_text = doc.select("div").each_text()
    assert div_text == ["1 2 3 4 5 6", "7 8 9 10 11 12"]
    p_text = doc.select("p").each_text()
    assert len(doc.select("p")) == 13
    assert len(p_text) == 12  # last <p> has no text
    assert p_text[0] == "1"
    assert p_text[1] == "2"
    assert p_text[4] == "5"
    assert p_text[6] == "7"
    assert p_text[11] == "12"

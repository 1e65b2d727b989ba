"""Ported from /root/reference/Tests/SwiftSoupTests/NodeTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.dom import Element, TextNode
from soupflow.tags import tag_for

from .util import strip_newlines


def test_handles_base_uri():  # NodeTest.swift:13-37
    tag = tag_for("a")
    no_base = Element(tag, "")
    no_base.set_attr("relHref", "/foo")
    no_base.set_attr("absHref", "http://bar/qux")
    assert no_base.abs_url("relHref") == ""
    assert no_base.abs_url("absHref") == "http://bar/qux"

    with_base = Element(tag, "http://foo/")
    with_base.set_attr("relHref", "/foo")
    with_base.set_attr("absHref", "http://bar/qux")
    assert with_base.abs_url("relHref") == "http://foo/foo"
    assert with_base.abs_url("absHref") == "http://bar/qux"
    assert with_base.abs_url("noval") == ""

    dodgy = Element(tag, "wtf://no-such-protocol/")
    dodgy.set_attr("absHref", "http://bar/qux")
    assert dodgy.abs_url("absHref") == "http://bar/qux"


def test_set_base_uri_is_recursive():  # NodeTest.swift:39-51
    doc = sf.parse("<div><p></p></div>")
    base = "https://jsoup.org"
    doc.set_base_uri(base)
    assert doc.base_uri == base
    assert doc.select("div")[0].base_uri == base
    assert doc.select("p")[0].base_uri == base


def test_handles_abs_prefix():  # NodeTest.swift:53-63
    a = sf.parse("<a href=/foo>Hello</a>", "https://jsoup.org/") \
        .select("a")[0]
    assert a.attr("href") == "/foo"
    assert a.attr("abs:href") == "https://jsoup.org/foo"


def test_handles_abs_on_image():  # NodeTest.swift:65-75
    img = sf.parse('<p><img src="/rez/osi_logo.png" /></p>',
                   "https://jsoup.org/").select("img")[0]
    assert img.attr("abs:src") == "https://jsoup.org/rez/osi_logo.png"
    assert img.abs_url("src") == img.attr("abs:src")


def test_handles_abs_prefix_on_has_attr():  # NodeTest.swift:77-95
    doc = sf.parse("<a id=1 href='/foo'>One</a> "
                   "<a id=2 href='https://jsoup.org/'>Two</a>")
    one = doc.select("#1")[0]
    two = doc.select("#2")[0]
    assert not one.has_attr("abs:href")
    assert one.has_attr("href")
    assert one.abs_url("href") == ""
    assert two.has_attr("abs:href")
    assert two.has_attr("href")
    assert two.abs_url("href") == "https://jsoup.org/"


def test_literal_abs_prefix():  # NodeTest.swift:97-108
    el = sf.parse("<a abs:href='odd'>One</a>").select("a")[0]
    assert el.has_attr("abs:href")
    assert el.attr("abs:href") == "odd"


def test_handle_abs_on_localhost_file_uris():  # NodeTest.swift:123-131
    doc = sf.parse("<a href='password'>One/a>"
                   "<a href='/var/log/messages'>Two</a>",
                   "file://localhost/etc/")
    one = doc.select("a")[0]
    assert one.abs_url("href") == "file://localhost/etc/password"


def test_handles_abs_on_protocoless_absolute_uris():
    # NodeTest.swift:133-149
    doc1 = sf.parse("<a href='//example.net/foo'>One</a>",
                    "http://example.com/")
    doc2 = sf.parse("<a href='//example.net/foo'>One</a>",
                    "https://example.com/")
    assert doc1.select("a")[0].abs_url("href") == \
        "http://example.net/foo"
    assert doc2.select("a")[0].abs_url("href") == \
        "https://example.net/foo"

    doc3 = sf.parse("<img src=//www.google.com/images/errors/logo_sm.gif"
                    " alt=Google>", "https://google.com")
    assert doc3.select("img")[0].attr("abs:src") == \
        "https://www.google.com/images/errors/logo_sm.gif"


def test_abs_handles_relative_query():  # NodeTest.swift:151-163
    doc = sf.parse("<a href='?foo'>One</a> <a href='bar.html?foo'>Two</a>",
                   "https://jsoup.org/path/file?bar")
    assert doc.select("a")[0].abs_url("href") == \
        "https://jsoup.org/path/file?foo"
    assert doc.select("a")[1].abs_url("href") == \
        "https://jsoup.org/path/bar.html?foo"


def test_abs_handles_dot_from_index():  # NodeTest.swift:165-173
    doc = sf.parse("<a href='./one/two.html'>One</a>",
                   "http://example.com")
    assert doc.select("a")[0].abs_url("href") == \
        "http://example.com/one/two.html"


def test_remove():  # NodeTest.swift:175-186
    doc = sf.parse("<p>One <span>two</span> three</p>")
    p = doc.select("p")[0]
    p.child_node(0).remove()
    assert p.text() == "two three"
    assert strip_newlines(p.html()) == "<span>two</span> three"


def test_replace():  # NodeTest.swift:188-199
    doc = sf.parse("<p>One <span>two</span> three</p>")
    p = doc.select("p")[0]
    insert = doc.create_element("em")
    insert.set_text("foo")
    p.child_node(1).replace_with(insert)
    assert p.html() == "One <em>foo</em> three"


def test_owner_document():  # NodeTest.swift:201-211
    doc = sf.parse("<p>Hello")
    p = doc.select("p")[0]
    assert p.owner_document() is doc
    assert doc.owner_document() is doc
    assert doc.parent() is None


def test_before():  # NodeTest.swift:213-227
    doc = sf.parse("<p>One <b>two</b> three</p>")
    new_node = Element(tag_for("em"), "")
    new_node.append_text("four")

    doc.select("b")[0].before_node(new_node)
    assert doc.body().html() == "<p>One <em>four</em><b>two</b> three</p>"

    doc.select("b")[0].before_html("<i>five</i>")
    assert doc.body().html() == \
        "<p>One <em>four</em><i>five</i><b>two</b> three</p>"


def test_after():  # NodeTest.swift:229-244
    doc = sf.parse("<p>One <b>two</b> three</p>")
    new_node = Element(tag_for("em"), "")
    new_node.append_text("four")

    doc.select("b")[0].after_node(new_node)
    assert doc.body().html() == "<p>One <b>two</b><em>four</em> three</p>"

    doc.select("b")[0].after_html("<i>five</i>")
    assert doc.body().html() == \
        "<p>One <b>two</b><i>five</i><em>four</em> three</p>"


def test_unwrap():  # NodeTest.swift:246-261
    doc = sf.parse("<div>One <span>Two <b>Three</b></span> Four</div>")
    span = doc.select("span")[0]
    two_text = span.child_node(0)
    node = span.unwrap()
    assert strip_newlines(doc.body().html()) == \
        "<div>One Two <b>Three</b> Four</div>"
    assert isinstance(node, TextNode)
    assert node.text() == "Two "
    assert node is two_text
    assert node.parent() is doc.select("div")[0]


def test_unwrap_no_children():  # NodeTest.swift:263-273
    doc = sf.parse("<div>One <span></span> Two</div>")
    span = doc.select("span")[0]
    node = span.unwrap()
    assert strip_newlines(doc.body().html()) == "<div>One  Two</div>"
    assert node is None


def test_traverse():  # NodeTest.swift:275-297
    doc = sf.parse("<div><p>Hello</p></div><div>There</div>")
    accum = []

    class Visitor:
        def head(self, node, depth):
            accum.append("<" + node.node_name() + ">")

        def tail(self, node, depth):
            accum.append("</" + node.node_name() + ">")

    doc.select("div")[0].traverse(Visitor())
    assert "".join(accum) == "<div><p><#text></#text></p></div>"


def test_orphan_node_returns_null_for_sibling_elements():
    # NodeTest.swift:299-316
    node = Element(tag_for("p"), "")
    el = Element(tag_for("p"), "")
    assert node.sibling_index == 0
    assert len(node.sibling_nodes()) == 0
    assert node.previous_sibling() is None
    assert node.next_sibling() is None
    assert len(el.sibling_elements()) == 0
    assert el.previous_element_sibling() is None
    assert el.next_element_sibling() is None


def test_node_is_not_a_sibling_of_itself():  # NodeTest.swift:318-331
    doc = sf.parse("<div><p>One<p>Two<p>Three</div>")
    p2 = doc.select("p")[1]
    assert p2.text() == "Two"
    nodes = p2.sibling_nodes()
    assert len(nodes) == 2
    assert nodes[0].outer_html() == "<p>One</p>"
    assert nodes[1].outer_html() == "<p>Three</p>"


def test_child_nodes_copy():  # NodeTest.swift:333-349
    doc = sf.parse("<div id=1>Text 1 <p>One</p> Text 2 <p>Two<p>Three"
                   "</div><div id=2>")
    div1 = doc.select("#1")[0]
    div2 = doc.select("#2")[0]
    div_children = div1.child_nodes_copy()
    assert len(div_children) == 5
    tn1 = div1.child_node(0)
    tn2 = div_children[0]
    tn2.set_text("Text 1 updated")
    assert tn1.text() == "Text 1 "
    div2.insert_children_at(-1, div_children)
    assert strip_newlines(doc.body().html()) == (
        '<div id="1">Text 1 <p>One</p> Text 2 <p>Two</p><p>Three</p>'
        '</div><div id="2">Text 1 updated'
        '<p>One</p> Text 2 <p>Two</p><p>Three</p></div>')


def test_supports_clone():  # NodeTest.swift:351-370
    doc = sf.parse("<div class=foo>Text</div>")
    el = doc.select("div")[0]
    assert el.has_class("foo")

    el_clone = doc.clone().select("div")[0]
    assert el_clone.has_class("foo")
    assert el_clone.text() == "Text"

    el.remove_class("foo")
    el.set_text("None")
    assert not el.has_class("foo")
    assert el_clone.has_class("foo")
    assert el.text() == "None"
    assert el_clone.text() == "Text"


def test_deep_clone_independence():  # NodeTest.swift:372-399
    doc = sf.parse("<div id=wrap><p class=one data-x=1>Text "
                   "<span>Child</span></p></div>")
    original = doc.select("#wrap")[0]
    clone = original.clone()

    assert clone.parent() is None
    assert original.child_node_size() == 1
    assert clone.child_node_size() == 1

    original_p = original.select("p")[0]
    clone_p = clone.select("p")[0]
    assert original_p.class_name() == "one"
    assert clone_p.class_name() == "one"
    assert original_p.attr("data-x") == "1"

    clone_p.remove_attr("data-x")
    clone_p.add_class("two")
    clone_p.set_text("Changed")

    assert original_p.attr("data-x") == "1"
    assert original_p.class_name() == "one"
    assert original_p.text() == "Text Child"
    assert clone_p.text() == "Changed"


def test_deep_clone_does_not_share_children():  # NodeTest.swift:401-416
    doc = sf.parse("<div id=wrap><p>One</p><p>Two</p></div>")
    original = doc.select("#wrap")[0]
    clone = original.clone()
    assert original.child_node_size() == 2
    assert clone.child_node_size() == 2
    clone.child_node(0).remove()
    assert original.child_node_size() == 2
    assert clone.child_node_size() == 1


def test_clone_with_empty_attributes():  # NodeTest.swift:418-431
    doc = sf.parse("<div><span>Hi</span></div>")
    span = doc.select("span")[0]
    assert not span.has_attr("data-x")
    clone = span.clone()
    assert not clone.has_attr("data-x")
    clone.set_attr("data-x", "1")
    assert span.attr("data-x") == ""
    assert clone.attr("data-x") == "1"

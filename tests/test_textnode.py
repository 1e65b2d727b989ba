"""Ported from /root/reference/Tests/SwiftSoupTests/TextNodeTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.dom import TextNode

from .util import strip_newlines


def test_blank():  # TextNodeTest.swift:13-25
    assert TextNode("", "").is_blank()
    assert TextNode("     ", "").is_blank()
    assert TextNode("  \n\n   ", "").is_blank()
    assert not TextNode("Hello", "").is_blank()
    assert not TextNode("  \nHello ", "").is_blank()


def test_text_bean():  # TextNodeTest.swift:27-45
    doc = sf.parse("<p>One <span>two &amp;</span> three &amp;</p>")
    p = doc.select("p")[0]
    span = doc.select("span")[0]
    assert span.text() == "two &"
    span_text = span.child_node(0)
    assert span_text.text() == "two &"

    tn = p.child_node(2)
    assert tn.text() == " three &"

    tn.set_text(" POW!")
    assert strip_newlines(p.html()) == "One <span>two &amp;</span> POW!"

    tn.set_attr("text", "kablam &")
    assert tn.text() == "kablam &"
    assert strip_newlines(p.html()) == \
        "One <span>two &amp;</span>kablam &amp;"


def test_split_text():  # TextNodeTest.swift:47-57
    doc = sf.parse("<div>Hello there</div>")
    div = doc.select("div")[0]
    tn = div.child_node(0)
    tail = tn.split_text(6)
    assert tn.get_whole_text() == "Hello "
    assert tail.get_whole_text() == "there"
    tail.set_text("there!")
    assert div.text() == "Hello there!"
    assert tn.parent() is tail.parent()


def test_split_an_embolden():  # TextNodeTest.swift:59-67
    doc = sf.parse("<div>Hello there</div>")
    div = doc.select("div")[0]
    tn = div.child_node(0)
    tail = tn.split_text(6)
    tail.wrap("<b></b>")
    assert strip_newlines(div.html()) == "Hello <b>there</b>"


def test_with_supplementary_character():  # TextNodeTest.swift:69-75
    ch = chr(135361)
    doc = sf.parse(ch)
    t = doc.body().text_nodes()[0]
    assert t.outer_html().strip() == ch

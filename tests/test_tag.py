"""Ported from /root/reference/Tests/SwiftSoupTests/TagTest.swift
(assertion values verbatim; fresh Python test code)."""

from soupflow.tags import tag_for


def test_is_case_sensitive():  # TagTest.swift:13-17
    p1 = tag_for("P", preserve_case=True)
    p2 = tag_for("p", preserve_case=True)
    assert p1 != p2


def test_can_be_insensitive():  # TagTest.swift:19-23
    assert tag_for("P") == tag_for("p")


def test_equality():  # TagTest.swift:31-36
    assert tag_for("p") == tag_for("p")
    assert tag_for("p") is tag_for("p")  # interned


def test_div_semantics():  # TagTest.swift:38-43
    div = tag_for("div")
    assert div.is_block
    assert div.format_as_block


def test_p_semantics():  # TagTest.swift:45-50
    p = tag_for("p")
    assert p.is_block
    assert not p.format_as_block


def test_img_semantics():  # TagTest.swift:52-57
    img = tag_for("img")
    assert img.is_inline()
    assert img.is_self_closing()
    assert not img.is_block


def test_default_semantics():  # TagTest.swift:59-66
    foo = tag_for("FOO", preserve_case=True)
    foo2 = tag_for("FOO", preserve_case=True)
    assert foo == foo2
    assert foo.is_inline()
    assert foo.format_as_block

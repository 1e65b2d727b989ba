"""Patch-based re-serialization (reference Document.swift:451-594
sourcePatches/patchedOuterHtml): original bytes preserved for
unmodified regions, dirty subtrees re-serialized and spliced."""
import pytest

from soupflow.dom import Element
from soupflow.parser import parse
from soupflow.tags import tag_for
from soupflow.treebuilder import ParseSettings

TRACK = ParseSettings(track_source_ranges=True)
HTML = ('<!doctype html><html><body><p id="a">one &amp; two</p>'
        '<div class="keep"><b>bold</b> text</div>'
        '<img src="/i.png"></body></html>')


def test_unmodified_doc_returns_source_verbatim():
    doc = parse(HTML, "", TRACK)
    assert doc.patched_outer_html() == HTML


def test_attr_mutation_patches_only_that_element():
    doc = parse(HTML, "", TRACK)
    doc.select("p")[0].set_attr("id", "b")
    out = doc.patched_outer_html()
    assert '<p id="b">one &amp; two</p>' in out
    # untouched regions keep raw bytes (entity form, quoting)
    assert '<div class="keep"><b>bold</b> text</div>' in out
    assert out.startswith("<!doctype html><html><body>")


def test_append_child_patches_parent_subtree():
    doc = parse(HTML, "", TRACK)
    doc.select("div")[0].append_child_node(
        Element(tag_for("span"), ""))
    out = doc.patched_outer_html()
    assert "<span></span></div>" in out
    assert '<p id="a">one &amp; two</p>' in out


def test_remove_child_patches_parent():
    doc = parse(HTML, "", TRACK)
    doc.select("b")[0].remove()
    out = doc.patched_outer_html()
    assert "<div class=\"keep\"> text</div>" in out
    assert '<p id="a">one &amp; two</p>' in out


def test_text_mutation_patches_text_node():
    doc = parse(HTML, "", TRACK)
    doc.select("b")[0].child_nodes[0].set_text("BOLD")
    out = doc.patched_outer_html()
    assert "<b>BOLD</b>" in out
    assert "one &amp; two" in out


def test_untracked_parse_returns_none():
    assert parse(HTML).patched_outer_html() is None


def test_unpatchable_mutation_bails():
    # body is implied (no source tag) — mutating it cannot be patched
    doc = parse("<p>x</p>", "", TRACK)
    doc.body().set_attr("class", "z")
    assert doc.patched_outer_html() is None


def test_void_element_attr_patch():
    doc = parse(HTML, "", TRACK)
    doc.select("img")[0].set_attr("src", "/j.png")
    out = doc.patched_outer_html()
    assert '<img src="/j.png"' in out  # serializer may emit " />"
    assert "one &amp; two" in out


def test_patched_equals_parse_of_patched():
    """The patched output must re-parse to the same DOM as the mutated
    document serializes to (round-trip sanity)."""
    doc = parse(HTML, "", TRACK)
    doc.select("p")[0].set_attr("id", "b")
    out = doc.patched_outer_html()
    doc.output_settings.pretty_print = False  # compare non-pretty
    assert parse(out).body().html() == parse(
        doc.outer_html()).body().html()


def test_replace_with_patches_parent():
    # regression: replace_with left no dirty node, so patched_outer_html
    # silently returned the ORIGINAL source, dropping the mutation
    doc = parse(HTML, "", TRACK)
    doc.select("b")[0].replace_with(Element(tag_for("i"), ""))
    out = doc.patched_outer_html()
    assert out is None or "<i></i>" in out
    if out is not None:
        assert "<b>bold</b>" not in out


def test_empty_patches_element():
    doc = parse(HTML, "", TRACK)
    doc.select("div")[0].empty()
    out = doc.patched_outer_html()
    assert out is None or '<div class="keep"></div>' in out
    if out is not None:
        assert "bold" not in out


def test_wrap_does_not_silently_drop():
    doc = parse(HTML, "", TRACK)
    doc.select("p")[0].wrap("<section></section>")
    out = doc.patched_outer_html()
    # either a correct patch or an honest None — never the stale source
    if out is not None:
        assert "<section>" in out

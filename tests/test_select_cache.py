"""SLRU selector-result cache: epoch invalidation + identity guard
(reference analogue Element.swift:303-367 per-root query cache)."""
import time

from soupflow.parser import parse


def _doc(n=300):
    return parse("<div>" + "".join(
        f'<p class="lead" href="one">x{i}</p><span>s</span>'
        for i in range(n)) + "</div>")


def test_cached_select_returns_same_results():
    doc = _doc()
    r1 = doc.select("p.lead[href=one]")
    r2 = doc.select("p.lead[href=one]")
    assert list(r1) == list(r2)


def test_cache_invalidated_by_tree_mutation():
    doc = _doc()
    n = len(doc.select("p.lead"))
    doc.select("p")[0].remove()
    assert len(doc.select("p.lead")) == n - 1


def test_cache_invalidated_by_attr_mutation():
    doc = _doc()
    n = len(doc.select("p.lead[href=one]"))
    doc.select("p")[0].set_attr("href", "two")
    assert len(doc.select("p.lead[href=one]")) == n - 1


def test_cache_invalidated_by_tag_rename():
    doc = _doc()
    n = len(doc.select("p.lead"))
    doc.select("p")[0].set_tag_name("div")
    assert len(doc.select("p.lead")) == n - 1


def test_cached_result_not_aliased():
    doc = _doc()
    r1 = doc.select("p.lead")
    r1.clear()  # caller mutates their copy
    assert len(doc.select("p.lead")) == 300


def test_warm_select_is_fast():
    doc = _doc(2000)
    doc.select("p.lead[href=one]")  # cold
    t0 = time.perf_counter()
    doc.select("p.lead[href=one]")
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    doc2 = _doc(2000)
    doc2.select("p.lead[href=one]")
    cold = time.perf_counter() - t0
    assert cold / max(warm, 1e-9) > 10  # measured ~500x

def test_cache_invalidated_by_replace_with():
    # regression: replace_with used to skip the epoch bump, so a warm
    # select() on the same root returned stale pre-mutation elements
    doc = _doc()
    n = len(doc.select("p.lead"))
    from soupflow.dom import Element
    from soupflow.tags import tag_for
    doc.select("p")[0].replace_with(Element(tag_for("em"), ""))
    assert len(doc.select("p.lead")) == n - 1


def test_cache_invalidated_by_empty():
    doc = _doc()
    assert len(doc.select("p.lead")) == 300
    doc.select("div")[0].empty()
    assert len(doc.select("p.lead")) == 0


def test_cache_invalidated_by_set_html():
    doc = _doc()
    assert len(doc.select("span")) == 300
    doc.select("div")[0].set_html("<i>only</i>")
    assert len(doc.select("span")) == 0
    assert len(doc.select("i")) == 1


def test_cache_invalidated_by_set_text():
    # :contains() depends on text content, so text mutation must
    # invalidate too (epoch bump now lives in _mark_src_dirty)
    doc = _doc()
    n = len(doc.select("p:contains(x0)"))
    assert n >= 1
    from soupflow.dom import TextNode
    tn = doc.select("p")[0].child_nodes[0]
    assert isinstance(tn, TextNode)
    tn.set_text("zzz")
    assert len(doc.select("p:contains(x0)")) == n - 1

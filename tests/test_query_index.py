"""Lazy per-document query index (reference Element.swift:303-345,
Collector.swift:177+): index-seeded collect must agree with the plain
DFS on every selector shape, respect subtree scoping, and invalidate
on DOM mutation."""
import pytest

import soupflow.selector as sel
from soupflow.parser import parse


@pytest.fixture(autouse=True)
def fresh_index():
    sel._QUERY_INDEX.clear()
    yield
    sel._QUERY_INDEX.clear()


PAGE = """
<html><head><title>t</title></head><body>
<nav id="topnav"><ul>
  <li><a href="/a" class="Nav">one</a></li>
  <li><a href="/b" class="nav active">two</a></li>
</ul></nav>
<div id="main" class="content">
  <p class="body first">hello <b>bold</b> <a href="/in">inline</a></p>
  <p class="body">second <em>em</em> para</p>
  <div class="deep"><p class="body">third <a href="/d">deep</a></p></div>
</div>
<footer><p class="body">footer para <a href="/f">flink</a></p></footer>
</body></html>
"""

QUERIES = [
    "a", "p", "div", "li", "nosuchtag",
    "#main", "#topnav", "#nosuchid",
    ".body", ".nav", ".Nav", ".active", ".nothere",
    "p.body", "a.nav", "div#main", "p.first",
    "div > p", "div p", "li + li", "nav a", "#main a",
    "p:contains(third)", "a[href^=/]", "a[href=/d]",
    "p b", "ul > li > a",
]


def _force_index(doc):
    """Two collects against the same tree trigger the lazy build."""
    sel.collect(sel.parse_query("a"), doc)
    sel.collect(sel.parse_query("a"), doc)
    entry = sel._QUERY_INDEX.get(id(doc.root()))
    assert entry is not None and entry[1] is not None, \
        "index should be built after the second collect"


def test_index_matches_dfs_on_document_root():
    doc = parse(PAGE)
    _force_index(doc)
    for q in QUERIES:
        ev = sel.parse_query(q)
        fast = sel.collect(ev, doc)
        slow = sel._collect_dfs(ev, doc)
        assert [id(e) for e in fast] == [id(e) for e in slow], q


def test_index_matches_dfs_on_subtree_roots():
    doc = parse(PAGE)
    _force_index(doc)
    roots = [doc.body()] + doc.body().select("div") + \
        doc.body().select("p") + doc.body().select("nav")
    for root in roots:
        for q in ["a", "p", ".body", "b", "em"]:
            ev = sel.parse_query(q)
            fast = sel.collect(ev, root)
            slow = sel._collect_dfs(ev, root)
            assert [id(e) for e in fast] == [id(e) for e in slow], \
                (q, root.tag.normal_name)


def test_index_includes_query_root_itself():
    doc = parse(PAGE)
    _force_index(doc)
    main = doc.select("#main")[0]
    got = sel.collect(sel.parse_query("div"), main)
    assert got and got[0] is main  # root matches, doc order first


def test_index_invalidated_by_mutation():
    doc = parse(PAGE)
    _force_index(doc)
    before = len(sel.collect(sel.parse_query("a"), doc))
    doc.select("p")[0].append_element("a").set_attr("href", "/new")
    after = sel.collect(sel.parse_query("a"), doc)
    assert len(after) == before + 1


def test_index_results_in_document_order():
    doc = parse(PAGE)
    _force_index(doc)
    texts = [a.text() for a in sel.collect(sel.parse_query("a"), doc)]
    assert texts == ["one", "two", "inline", "deep", "flink"]


def test_single_select_stays_on_dfs_path():
    """One collect per tree must NOT build the index (a single select
    is cheaper as a DFS — e.g. SelectCountActor's per-doc query)."""
    doc = parse(PAGE)
    sel.collect(sel.parse_query("a"), doc)
    entry = sel._QUERY_INDEX.get(id(doc.root()))
    assert entry is not None and entry[1] is None

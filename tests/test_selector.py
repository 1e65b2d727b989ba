"""Ported from /root/reference/Tests/SwiftSoupTests/SelectorTest.swift
(assertion values verbatim; fresh Python test code)."""

import soupflow as sf
from soupflow.selector import collect, parse_query, select_many


def test_by_tag():
    els = sf.parse("<div id=1><div id=2><p>Hello</p></div></div>"
                   "<DIV id=3>").select("DIV")
    assert [e.id() for e in els] == ["1", "2", "3"]
    assert sf.parse("<div id=1></div>").select("span") == []


def test_by_id():
    els = sf.parse("<div><p id=foo>Hello</p><p id=foo>Foo two!</p>"
                   "</div>").select("#foo")
    assert [e.text() for e in els] == ["Hello", "Foo two!"]
    assert sf.parse("<div id=1></div>").select("#foo") == []


def test_by_class():
    els = sf.parse("<p id=0 class='ONE two'><p id=1 class='one'>"
                   "<p id=2 class='two'>").select("P.One")
    assert [e.id() for e in els] == ["0", "1"]
    assert sf.parse("<div class='one'></div>").select(".foo") == []
    assert len(sf.parse("<div class='One-Two'></div>").select(".one-two")) \
        == 1


def test_by_attribute():
    h = ("<div Title=Foo /><div Title=Bar /><div Style=Qux />"
         "<div title=Bam /><div title=SLAM /><div data-name='with spaces'/>")
    doc = sf.parse(h)
    assert len(doc.select("[title]")) == 4
    assert len(doc.select("[TITLE=foo]")) == 1
    assert len(doc.select('[title="foo"]')) == 1
    assert len(doc.select('[title="Foo"]')) == 1
    data_name = doc.select('[data-name="with spaces"]')
    assert len(data_name) == 1
    assert data_name[0].attr("data-name") == "with spaces"
    not_els = doc.select("div[title!=bar]")
    assert len(not_els) == 5
    assert not_els[0].attr("title") == "Foo"
    starts = doc.select("[title^=ba]")
    assert [e.attr("title") for e in starts] == ["Bar", "Bam"]
    ends = doc.select("[title$=am]")
    assert [e.attr("title") for e in ends] == ["Bam", "SLAM"]
    contains = doc.select("[title*=a]")
    assert len(contains) == 3
    assert contains[0].attr("title") == "Bar"
    assert contains[-1].attr("title") == "SLAM"


def test_descendant_selector_matches():
    doc = sf.parse("<div id=one><p class=alpha><span class=item>One</span>"
                   "</p></div><p class=alpha><span class=item>Two</span></p>")
    assert [e.text() for e in doc.select("div span")] == ["One"]
    assert [e.text() for e in doc.select("div .item")] == ["One"]
    assert [e.text() for e in doc.select("div#one span.item")] == ["One"]


def test_select_tag_and_class():
    doc = sf.parse("<div><p class=lead id=1></p><p class=lead id=2></p>"
                   "<span class=lead id=3></span></div>")
    assert [e.id() for e in doc.select("p.lead")] == ["1", "2"]


def test_select_tag_and_attribute_value():
    doc = sf.parse("<a href=one id=1></a><a href=two id=2></a>"
                   "<a href=one id=3></a>")
    assert [e.id() for e in doc.select("a[href=two]")] == ["2"]
    assert [e.id() for e in doc.select("[href=one]")] == ["1", "3"]


def test_select_tag_and_attribute_name():
    doc = sf.parse("<a href=one id=1></a><div href=two id=2></div>"
                   "<a id=3></a>")
    assert [e.id() for e in doc.select("a[href]")] == ["1"]


def test_select_not_and_has():
    doc = sf.parse("<div id=wrap><article id=a1><p class=lead>One</p>"
                   "</article><article id=a2><p class=body>Two</p>"
                   "</article><section id=s1><p class=lead>Three</p>"
                   "</section></div>")
    els = doc.select("article:has(p.lead):not(.missing)")
    assert len(els) == 1
    assert els[0].id() == "a1"


def test_select_attribute_starting():
    doc = sf.parse("<div data-x=1 id=1></div><div data-y=2 id=2></div>"
                   "<div id=3></div>")
    assert len(doc.select("[^data-]")) == 2


def test_not_has_with_sibling_combinators():
    doc = sf.parse(
        "<div id=wrap>"
        "<article id=a1><h2>One</h2><p class=lead>Lead</p></article>"
        "<article id=a2><h2>Two</h2><p class=body>Body</p></article>"
        "<article id=a3><h2>Three</h2><p class=lead>Lead</p>"
        "<p class=body>Body</p></article></div>")
    els = doc.select("article:has(h2 + p.lead):not(:has(p.body))")
    assert len(els) == 1
    assert els[0].id() == "a1"


def test_not_has_sibling_chains():
    doc = sf.parse(
        "<div id=wrap>"
        "<article id=a1><h2>One</h2><p class=lead>Lead</p>"
        "<p class=note>Note</p><p class=tail>Tail</p></article>"
        "<article id=a2><h2>Two</h2><p class=lead>Lead</p>"
        "<p class=body>Body</p><p class=note>Note</p></article>"
        "<article id=a3><h2>Three</h2><p class=lead>Lead</p>"
        "<p class=note>Note</p><p class=body>Body</p>"
        "<p class=tail>Tail</p></article>"
        "<section id=s1><h2>Side</h2><p class=lead>Lead</p>"
        "<p class=note>Note</p></section></div>")
    els = doc.select(
        "article:has(h2 + p.lead ~ p.note):not(:has(p.body + p.note))")
    assert [e.id() for e in els] == ["a1", "a3"]


def test_select_tag_class_and_id():
    doc = sf.parse("<div class=card id=hit></div><div class=card id=miss>"
                   "</div><span class=card id=hit2></span>")
    els = doc.select("div.card#hit")
    assert [e.id() for e in els] == ["hit"]


def test_select_attribute_abs_fallback():
    doc = sf.parse("<a href=/one id=1></a><a href=/two id=2></a>")
    assert len(doc.select("[abs:href]")) == 0


def test_namespaced_tag():
    doc = sf.parse("<div><abc:def id=1>Hello</abc:def></div> "
                   "<abc:def class=bold id=2>There</abc:def>")
    assert [e.id() for e in doc.select("abc|def")] == ["1", "2"]
    assert [e.id() for e in doc.select(".bold")] == ["2"]
    assert [e.id() for e in doc.select("abc|def.bold")] == ["2"]
    assert [e.id() for e in doc.select("abc|def:contains(e)")] == ["1", "2"]


def test_wildcard_namespaced_tag():
    doc = sf.parse("<div><abc:def id=1>Hello</abc:def></div> "
                   "<abc:def class=bold id=2>There</abc:def>")
    assert [e.id() for e in doc.select("*|def")] == ["1", "2"]
    assert [e.id() for e in doc.select("*|def.bold")] == ["2"]
    assert [e.id() for e in doc.select("*|def:contains(e)")] == ["1", "2"]


def test_by_attribute_starting():
    doc = sf.parse("<div id=1 data-name=SwiftSoup>Hello</div>"
                   "<p data-val=5 id=2>There</p><p id=3>No</p>")
    assert [e.id() for e in doc.select("[^data-]")] == ["1", "2"]
    assert [e.id() for e in doc.select("p[^data-]")] == ["2"]


def test_by_attribute_regex():
    doc = sf.parse("<p><img src=foo.png id=1><img src=bar.jpg id=2>"
                   "<img src=qux.JPEG id=3><img src=old.gif><img></p>")
    assert [e.id() for e in
            doc.select("img[src~=(?i)\\.(png|jpe?g)]")] == ["1", "2", "3"]


def test_by_attribute_regex_character_class():
    doc = sf.parse("<p><img src=foo.png id=1><img src=bar.jpg id=2>"
                   "<img src=qux.JPEG id=3><img src=old.gif id=4></p>")
    assert [e.id() for e in doc.select("img[src~=[o]]")] == ["1", "4"]


def test_by_attribute_regex_combined():
    doc = sf.parse("<div><table class=x><td>Hello</td></table></div>")
    els = doc.select("div table[class~=x|y]")
    assert len(els) == 1
    assert els[0].text() == "Hello"


def test_combined_with_contains():
    doc = sf.parse("<p id=1>One</p><p>Two +</p><p>Three +</p>")
    els = doc.select("p#1 + :contains(+)")
    assert len(els) == 1
    assert els[0].text() == "Two +"
    assert els[0].tag_name() == "p"


def test_all_elements():
    doc = sf.parse("<div><p>Hello</p><p><b>there</b></p></div>")
    assert len(doc.select("*")) == 8
    all_under_div = doc.select("div *")
    assert len(all_under_div) == 3
    assert all_under_div[0].tag_name() == "p"


def test_all_with_class():
    doc = sf.parse("<p class=first>One<p class=first>Two<p>Three")
    assert len(doc.select("*.first")) == 2


def test_group_or():
    doc = sf.parse("<div title=foo /><div title=bar /><div /><p></p>"
                   "<img /><span title=qux>")
    els = doc.select("p,div,[title]")
    assert len(els) == 5
    assert els[0].tag_name() == "div"
    assert els[0].attr("title") == "foo"
    assert els[1].attr("title") == "bar"
    assert els[2].tag_name() == "div"
    assert els[2].attr("title") == ""
    assert not els[2].has_attr("title")
    assert els[3].tag_name() == "p"
    assert els[4].tag_name() == "span"


def test_group_or_attribute():
    els = sf.parse("<div id=1 /><div id=2 /><div title=foo />"
                   "<div title=bar />").select("[id],[title=foo]")
    assert len(els) == 3
    assert els[0].id() == "1"
    assert els[1].id() == "2"
    assert els[2].attr("title") == "foo"


def test_descendant():
    doc = sf.parse("<div class=head><p class=first>Hello</p><p>There</p>"
                   "</div><p>None</p>")
    root = doc.get_elements_by_class("HEAD")[0]
    els = root.select(".head p")
    assert [e.text() for e in els] == ["Hello", "There"]
    assert [e.text() for e in root.select("p.first")] == ["Hello"]
    assert root.select("p .first") == []
    assert root.select("body div.head") == []


def test_and():
    doc = sf.parse("<div id=1 class='foo bar' title=bar name=qux>"
                   "<p class=foo title=bar>Hello</p></div")
    assert [e.tag_name() for e in doc.select("div.foo")] == ["div"]
    assert [e.tag_name() for e in doc.select("div .foo")] == ["p"]
    assert [e.tag_name() for e in
            doc.select("div#1.foo.bar[title=bar][name=qux]")] == ["div"]
    assert [e.tag_name() for e in doc.select("div *.foo")] == ["p"]


def test_deeper_descendant():
    doc = sf.parse("<div class=head><p><span class=first>Hello</div>"
                   "<div class=head><p class=first><span>Another</span>"
                   "<p>Again</div>")
    root = doc.get_elements_by_class("head")[0]
    els = root.select("div p .first")
    assert len(els) == 1
    assert els[0].text() == "Hello"
    assert els[0].tag_name() == "span"
    assert root.select("body p .first") == []


def test_parent_child_element():
    doc = sf.parse("<div id=1><div id=2><div id = 3></div></div></div>"
                   "<div id=4></div>")
    assert [e.id() for e in doc.select("div > div")] == ["2", "3"]
    assert [e.id() for e in doc.select("div#1 > div")] == ["2"]


def test_parent_with_class_child():
    doc = sf.parse("<h1 class=foo><a href=1 /></h1><h1 class=foo>"
                   "<a href=2 class=bar /></h1><h1><a href=3 /></h1>")
    assert len(doc.select("h1 > a")) == 3
    assert len(doc.select("h1.foo > a")) == 2
    assert len(doc.select("h1.foo > a.bar")) == 1


def test_parent_child_star():
    doc = sf.parse("<div id=1><p>Hello<p><b>there</b></p></div>"
                   "<div id=2><span>Hi</span></div>")
    els = doc.select("div > *")
    assert [e.tag_name() for e in els] == ["p", "p", "span"]


def test_multi_child_descent():
    doc = sf.parse("<div id=foo><h1 class=bar>"
                   "<a href=http://example.com/>One</a></h1></div>")
    els = doc.select("div#foo > h1.bar > a[href*=example]")
    assert [e.tag_name() for e in els] == ["a"]


def test_case_insensitive():
    doc = sf.parse("<dIv tItle=bAr><div>")
    assert len(doc.select("DIV")) == 2
    assert len(doc.select("DIV[TITLE]")) == 1
    assert len(doc.select("DIV[TITLE=BAR]")) == 1
    assert len(doc.select("DIV[TITLE=BARBARELLA")) == 0


def test_adjacent_siblings():
    doc = sf.parse("<ol><li>One<li>Two<li>Three</ol>")
    els = doc.select("li + li")
    assert [e.text() for e in els] == ["Two", "Three"]


def test_adjacent_siblings_with_id():
    doc = sf.parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    els = doc.select("li#1 + li#2")
    assert [e.text() for e in els] == ["Two"]


def test_not_adjacent():
    doc = sf.parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    assert doc.select("li#1 + li#3") == []


def test_mix_combinator():
    doc = sf.parse("<div class=foo><ol><li>One<li>Two<li>Three</ol></div>")
    els = doc.select("body > div.foo li + li")
    assert [e.text() for e in els] == ["Two", "Three"]


def test_mix_combinator_group():
    doc = sf.parse("<div class=foo><ol><li>One<li>Two<li>Three</ol></div>")
    els = doc.select(".foo > ol, ol > li + li")
    assert len(els) == 3
    assert els[0].tag_name() == "ol"
    assert els[1].text() == "Two"
    assert els[2].text() == "Three"


def test_general_siblings():
    doc = sf.parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    els = doc.select("#1 ~ #3")
    assert [e.text() for e in els] == ["Three"]


def test_characters_in_id_and_class():
    doc = sf.parse("<div><p id='a1-foo_bar'>One</p>"
                   "<p class='b2-qux_bif'>Two</p></div>")
    assert doc.get_element_by_id("a1-foo_bar").text() == "One"
    assert doc.get_elements_by_class("b2-qux_bif")[0].text() == "Two"
    assert doc.select("#a1-foo_bar")[0].text() == "One"
    assert doc.select(".b2-qux_bif")[0].text() == "Two"


def test_supports_leading_combinator():
    doc = sf.parse("<div><p><span>One</span><span>Two</span></p></div>")
    p = doc.select("div > p")[0]
    spans = p.select("> span")
    assert len(spans) == 2
    assert spans[0].text() == "One"

    doc = sf.parse("<div id=1><div id=2><div id=3></div></div></div>")
    div = select_many(" > div", doc.select("div"))[0]
    assert div.id() == "2"


def test_pseudo_less_than():
    doc = sf.parse("<div><p>One</p><p>Two</p><p>Three</>p></div>"
                   "<div><p>Four</p>")
    els = doc.select("div p:lt(2)")
    assert [e.text() for e in els] == ["One", "Two", "Four"]


def test_pseudo_greater_than():
    doc = sf.parse("<div><p>One</p><p>Two</p><p>Three</p></div>"
                   "<div><p>Four</p>")
    els = doc.select("div p:gt(0)")
    assert [e.text() for e in els] == ["Two", "Three"]


def test_pseudo_equals():
    doc = sf.parse("<div><p>One</p><p>Two</p><p>Three</>p></div>"
                   "<div><p>Four</p>")
    els = doc.select("div p:eq(0)")
    assert [e.text() for e in els] == ["One", "Four"]
    els2 = doc.select("div:eq(0) p:eq(0)")
    assert [e.text() for e in els2] == ["One"]
    assert els2[0].tag_name() == "p"


def test_pseudo_between():
    doc = sf.parse("<div><p>One</p><p>Two</p><p>Three</>p></div>"
                   "<div><p>Four</p>")
    els = doc.select("div p:gt(0):lt(2)")
    assert [e.text() for e in els] == ["Two"]


def test_pseudo_combined():
    doc = sf.parse("<div class='foo'><p>One</p><p>Two</p></div>"
                   "<div><p>Three</p><p>Four</p></div>")
    els = doc.select("div.foo p:gt(0)")
    assert [e.text() for e in els] == ["Two"]


def test_pseudo_has():
    doc = sf.parse("<div id=0><p><span>Hello</span></p></div> "
                   "<div id=1><span class=foo>There</span></div> "
                   "<div id=2><p>Not</p></div>")
    assert [e.id() for e in doc.select("div:has(span)")] == ["0", "1"]
    assert [e.id() for e in doc.select("div:has([class]")] == ["1"]
    assert [e.id() for e in doc.select("div:has(span, p)")] == \
        ["0", "1", "2"]
    els1 = doc.body().select(":has(p)")
    assert len(els1) == 3
    assert els1[0].tag_name() == "body"
    assert els1[1].id() == "0"
    assert els1[2].id() == "2"


def test_nested_has():
    doc = sf.parse("<div><p><span>One</span></p></div> <div><p>Two</p>"
                   "</div>")
    divs = doc.select("div:has(p:has(span))")
    assert len(divs) == 1
    assert divs[0].text() == "One"
    divs = doc.select("div:has(p:matches((?i)two))")
    assert len(divs) == 1
    assert divs[0].text() == "Two"
    divs = doc.select("div:has(p:contains(two))")
    assert len(divs) == 1
    assert divs[0].text() == "Two"


def test_pseudo_contains():
    doc = sf.parse("<div><p>The Rain.</p> <p class=light>The <i>rain</i>."
                   "</p> <p>Rain, the.</p></div>")
    assert len(doc.select("p:contains(Rain)")) == 3
    ps2 = doc.select("p:contains(the rain)")
    assert len(ps2) == 2
    assert ps2[0].html() == "The Rain."
    assert ps2[-1].html() == "The <i>rain</i>."
    ps3 = doc.select("p:contains(the Rain):has(i)")
    assert len(ps3) == 1
    assert ps3[0].class_name() == "light"
    assert len(doc.select(".light:contains(rain)")) == 1
    assert len(doc.select(":contains(rain)")) == 8


def test_pseudo_contains_with_parentheses():
    doc = sf.parse("<div><p id=1>This (is good)</p>"
                   "<p id=2>This is bad)</p>")
    assert [e.id() for e in
            doc.select("p:contains(this (is good))")] == ["1"]
    assert [e.id() for e in
            doc.select("p:contains(this is bad\\))")] == ["2"]


def test_contains_own():
    doc = sf.parse("<p id=1>Hello <b>there</b> now</p>")
    assert [e.id() for e in doc.select("p:containsOwn(Hello now)")] == ["1"]
    assert doc.select("p:containsOwn(there)") == []


def test_contains_data():
    doc = sf.parse("<div><p>Some text</p><script>var foo = 'bar';</script>"
                   "<style>.red { color: red; }</style></div>")
    scripts = doc.select("script:containsData(foo)")
    assert len(scripts) == 1
    assert scripts[0].data() == "var foo = 'bar';"
    assert len(doc.select("script:containsData(FOO)")) == 1
    assert len(doc.select("style:containsData(red)")) == 1
    assert doc.select("script:containsData(baz)") == []
    assert doc.select("p:containsData(Some text)") == []


def test_contains_data_in_descendants():
    doc = sf.parse("<div><script>alert('hello');</script></div>")
    divs = doc.select("div:containsData(hello)")
    assert len(divs) == 1
    assert divs[0].tag_name() == "div"


def test_matches():
    doc = sf.parse("<p id=1>The <i>Rain</i></p> "
                   "<p id=2>There are 99 bottles.</p> "
                   "<p id=3>Harder (this)</p> <p id=4>Rain</p>")
    assert doc.select("p:matches(The rain)") == []
    assert [e.id() for e in doc.select("p:matches((?i)the rain)")] == ["1"]
    assert [e.id() for e in doc.select("p:matches((?i)^rain$)")] == ["4"]
    assert [e.id() for e in doc.select("p:matches(\\d+)")] == ["2"]
    assert [e.id() for e in
            doc.select("p:matches(\\w+\\s+\\(\\w+\\))")] == ["3"]
    assert [e.id() for e in doc.select("p:matches((?i)the):has(i)")] == ["1"]


def test_matches_own():
    doc = sf.parse("<p id=1>Hello <b>there</b> now</p>")
    assert [e.id() for e in
            doc.select("p:matchesOwn((?i)hello now)")] == ["1"]
    assert doc.select("p:matchesOwn(there)") == []


def test_relaxed_tags():
    doc = sf.parse("<abc_def id=1>Hello</abc_def> "
                   "<abc-def id=2>There</abc-def>")
    assert [e.id() for e in doc.select("abc_def")] == ["1"]
    assert [e.id() for e in doc.select("abc-def")] == ["2"]


def test_not_paras():
    doc = sf.parse("<p id=1>One</p> <p>Two</p> <p><span>Three</span></p>")
    el1 = doc.select("p:not([id=1])")
    assert [e.text() for e in el1] == ["Two", "Three"]
    el2 = doc.select("p:not(:has(span))")
    assert [e.text() for e in el2] == ["One", "Two"]


def test_not_all():
    doc = sf.parse("<p>Two</p> <p><span>Three</span></p>")
    el1 = doc.body().select(":not(p)")
    assert len(el1) == 2
    assert el1[0].tag_name() == "body"
    assert el1[-1].tag_name() == "span"


def test_not_class():
    doc = sf.parse("<div class=left>One</div>"
                   "<div class=right id=1><p>Two</p></div>")
    assert [e.id() for e in doc.select("div:not(.left)")] == ["1"]


def test_handles_commas_in_selector():
    doc = sf.parse("<p name='1,2'>One</p><div>Two</div>"
                   "<ol><li>123</li><li>Text</li></ol>")
    assert len(doc.select("[name=1,2]")) == 1
    containers = doc.select("div, li:matches([0-9,]+)")
    assert len(containers) == 2
    assert containers[0].tag_name() == "div"
    assert containers[1].tag_name() == "li"
    assert containers[1].text() == "123"


def test_select_class_with_space():
    doc = sf.parse('<div class="value">class without space</div>\n'
                   '<div class="value ">class with space</div>')
    found = doc.select("div[class=value ]")
    assert [e.text() for e in found] == \
        ["class without space", "class with space"]
    found = doc.select('div[class="value "]')
    assert [e.text() for e in found] == \
        ["class without space", "class with space"]
    found = doc.select('div[class="value\\ "]')
    assert found == []


def test_select_same_elements():
    doc = sf.parse("<div>one</div><div>one</div>")
    els = doc.select("div")
    assert len(els) == 2
    sub = select_many(":contains(one)", els)
    assert len(sub) == 2


def test_attribute_with_brackets():
    doc = sf.parse("<div data='End]'>One</div> "
                   "<div data='[Another)]]'>Two</div>")
    assert doc.select("div[data='End]'")[0].text() == "One"
    assert doc.select("div[data='[Another)]]'")[0].text() == "Two"
    assert doc.select('div[data="End]"')[0].text() == "One"
    assert doc.select('div[data="[Another)]]"')[0].text() == "Two"


def test_compound_attribute_selector_simple():
    doc = sf.parse("<div id='info-id' data-type='info-data'><p>Hello</p>"
                   "</div>")
    assert len(doc.select("div[id='info-id'][data-type='info-data']")) == 1


def test_compound_attribute_selector_with_special_body_tags():
    html = """
    <!doctype html>
    <html><head><title></title>
    <meta http-equiv="Content-Type" content="text/html;charset=utf-8">
    </meta></head>
    <body>
    <link>I'm link</link>
    <a>I'm a</a>
    <image>I'm image</image>
    <div id="info-id" data-type="info-data">
    <img src="cid:f269cce5-0cff-4041-81f4-d78865425c3c"/>
    </div>
    </body></html>
    """
    doc = sf.parse(html)
    assert len(doc.select("div[id='info-id']")) == 1
    assert len(doc.select("div[data-type='info-data']")) == 1
    assert len(doc.select("div[id='info-id'][data-type='info-data']")) == 1


def test_selectors_match_after_complex_mutations():
    # SelectorTest.swift:305-348 — in this engine there is no query
    # cache/fast-path split; the contract is select stays correct
    # through every kind of mutation
    html = ("<div id=wrap>"
            "<article id=a1 class=card data-x=1><h2 id=h1>One</h2>"
            "<p id=p1 class=lead>Lead</p><p id=p2 class=note>Note</p>"
            "</article>"
            "<article id=a2 class=card><h2 id=h2>Two</h2>"
            "<p id=p3 class=lead>Lead</p><p id=p4 class=body>Body</p>"
            "<p id=p5 class=note>Note</p></article>"
            "<section id=s1 class=box><p id=p6 class=note>Note</p>"
            "</section>"
            "<nav id=n1><a id=l1 href=/one>One</a><a id=l2>Two</a></nav>"
            "<ul id=u1><li id=li1>Alpha</li><li id=li2>Beta</li>"
            "<li id=li3>Gamma</li></ul>"
            "</div>")
    doc = sf.parse(html)

    a1 = doc.get_element_by_id("a1")
    a1.remove_attr("data-x")
    a1.add_class("featured")
    doc.get_element_by_id("a2").set_tag_name("section")
    doc.get_element_by_id("p4").remove()
    doc.get_element_by_id("p3").after_html(
        '<p id=p3b class=note>Note2</p>')
    replacement = sf.parse('<span id=p5r class=note>Note</span>') \
        .select("span")[0]
    doc.get_element_by_id("p5").replace_with(replacement)
    doc.get_element_by_id("l2").set_attr("href", "/two")
    doc.get_element_by_id("s1").append_html(
        '<p id=p6b class=lead>Lead2</p>')
    doc.get_element_by_id("p6").wrap('<span id=sp1></span>')
    doc.get_element_by_id("sp1").unwrap()
    doc.get_element_by_id("li2").remove()

    from soupflow.selector import collect, parse_query
    selectors = [
        "article.featured:has(h2 + p.lead ~ p.note)",
        "section.card:has(p.lead + p.note)",
        "section.box:has(p.note) + nav",
        "nav > a[href]",
        "ul > li + li",
        "[data-x]",
        "section:has(p.lead):not(:has(p.body + p.note))",
        ".note",
    ]
    for selector in selectors:
        slow = [e.id() for e in collect(parse_query(selector), doc)]
        fast = [e.id() for e in doc.select(selector)]
        assert slow == fast, selector

    # spot-check the semantic results too
    assert [e.id() for e in doc.select("[data-x]")] == []
    assert [e.id() for e in doc.select("nav > a[href]")] == ["l1", "l2"]
    assert [e.id() for e in doc.select("ul > li + li")] == ["li3"]


def test_select_attribute_value_hot_key_order():  # SelectorTest.swift:376-382
    doc = sf.parse("<a href=one id=1></a><a href=two id=2></a>"
                   "<a href=one id=3></a>")
    els = doc.select("[href=one]")
    assert [e.id() for e in els] == ["1", "3"]


def test_select_results_follow_mutation():  # SelectorTest.swift:384-393
    doc = sf.parse("<div id=one class=hit></div><div id=two></div>")
    root = doc.body()
    assert len(root.select(".hit")) == 1
    assert len(root.select(".hit")) == 1
    doc.get_element_by_id("two").add_class("hit")
    assert len(root.select(".hit")) == 2


def test_select_supplementary_character():  # SelectorTest.swift:1009-1016
    s = chr(135361)
    doc = sf.parse(f"<div k{s}='{s}'>^{s}$/div>")
    assert doc.select(f"div[k{s}]")[0].tag_name() == "div"
    assert doc.select(f"div:containsOwn({s})")[0].tag_name() == "div"

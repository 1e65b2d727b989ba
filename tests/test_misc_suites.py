"""Ported from the remaining reference suites (assertion values verbatim;
fresh Python test code):
  FormElementTest.swift, DocumentTypeTest.swift, NodeTraversorTest.swift,
  ParseSettingsTest.swift, AttributeTest.swift, AttributesTest.swift,
  PublicEmptyAttributeKeyTest.swift
"""

import soupflow as sf
from soupflow.dom import Attributes, DocumentType, Element, FormElement, \
    TextNode
from soupflow.serializer import attributes_html
from soupflow.treebuilder import ParseSettings


# -- FormElementTest --------------------------------------------------------

def test_has_associated_controls():  # FormElementTest.swift:13-21
    html = ("<form id=1><button id=1><fieldset id=2 /><input id=3>"
            "<keygen id=4><object id=5><output id=6>"
            "<select id=7><option></select><textarea id=8><p id=9>")
    form = sf.parse(html).select("form")[0]
    assert isinstance(form, FormElement)
    assert len(form.elements()) == 8


def test_forms_added_after_parse_are_form_elements():
    # FormElementTest.swift:93-101
    doc = sf.parse("<body />")
    doc.body().set_html("<form action='http://example.com/search'>"
                        "<input name='q' value='search'>")
    form = doc.select("form")[0]
    assert isinstance(form, FormElement)
    assert len(form.elements()) == 1


def test_controls_added_after_parse_are_linked():
    # FormElementTest.swift:103-117
    doc = sf.parse("<body />")
    doc.body().set_html("<form />")
    form_el = doc.select("form")[0]
    form_el.append_html("<input name=foo value=bar>")
    assert isinstance(form_el, FormElement)
    assert len(form_el.elements()) == 1


def test_form_child_inputs_are_direct_children():
    # FormElementTest.swift:152-172
    html = """
<html>
<body>
<form name="FORM0" method="post">
\t<input type="hidden" name="a" value="1">
\t<input type="hidden" name="b" value="2">
\t<input type="hidden" name="c">
</form>
</body></html>
"""
    doc = sf.parse(html)
    direct = doc.select("form[name=FORM0] > input")
    assert len(direct) == 3
    with_value = [e for e in direct if e.attr("value")]
    assert len(with_value) == 2


def test_form_children_tree_structure():  # FormElementTest.swift:174-186
    doc = sf.parse("<form id='f'><div><input name='a'></div>"
                   "<input name='b'></form>")
    direct = doc.select("form#f > input")
    assert len(direct) == 1
    assert direct[0].attr("name") == "b"
    assert len(doc.select("form#f input")) == 2


def test_nested_form_elements_structure():  # FormElementTest.swift:188-202
    doc = sf.parse("""
<form name="test">
\t<select name="sel"><option value="1">One</option></select>
\t<textarea name="ta">text</textarea>
\t<input name="in" value="val">
</form>
""")
    form = doc.select("form[name=test]")[0]
    assert len(form.children()) == 3
    assert form.children()[0].tag_name() == "select"


# -- DocumentTypeTest -------------------------------------------------------

def test_doctype_outer_html_generation():  # DocumentTypeTest.swift:28-40
    assert DocumentType("html", "", "", "").outer_html() == \
        "<!doctype html>"
    assert DocumentType("html", "-//IETF//DTD HTML//", "", "") \
        .outer_html() == '<!DOCTYPE html PUBLIC "-//IETF//DTD HTML//">'
    assert DocumentType(
        "html", "",
        "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd",
        "").outer_html() == (
        '<!DOCTYPE html '
        '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">')
    assert DocumentType("notHtml", "--public", "--system", "") \
        .outer_html() == '<!DOCTYPE notHtml PUBLIC "--public" "--system">'


# -- NodeTraversorTest ------------------------------------------------------

def test_traverse_order():  # NodeTraversorTest.swift:5-35
    doc = sf.parse("<p id=1><b id=2>3</b>4</p><p id=5>6</p>")
    heads, tails = [], []

    class Visitor:
        def head(self, node, depth):
            heads.append(node)

        def tail(self, node, depth):
            tails.append(node)

    doc.body().traverse(Visitor())

    def desc(n):
        if isinstance(n, TextNode):
            return ("t", n.text())
        return ("e", n.id() if isinstance(n, Element) else "")

    assert [desc(n) for n in heads] == [
        ("e", ""), ("e", "1"), ("e", "2"), ("t", "3"), ("t", "4"),
        ("e", "5"), ("t", "6")]
    assert [desc(n) for n in tails] == [
        ("t", "3"), ("e", "2"), ("t", "4"), ("e", "1"), ("t", "6"),
        ("e", "5"), ("e", "")]


def test_tail_can_remove_node():  # NodeTraversorTest.swift:37-60
    doc = sf.parse("<p id=1>2</p><p id=3>4</p><p id=5>6</p>")

    class Visitor:
        def head(self, node, depth):
            pass

        def tail(self, node, depth):
            if isinstance(node, Element) and node.id() == "3":
                node.remove()

    doc.body().traverse(Visitor())
    expected = sf.parse("<p id=1>2</p><p id=5>6</p>")
    assert doc.body().html() == expected.body().html()


# -- ParseSettingsTest ------------------------------------------------------

def test_case_support():  # ParseSettingsTest.swift:13-30
    both_on = ParseSettings(True, True)
    both_off = ParseSettings(False, False)
    tag_on = ParseSettings(True, False)
    attr_on = ParseSettings(False, True)

    assert both_on.normalise_tag("FOO") == "FOO"
    assert both_on.normalise_attributes({"FOO": "1"}) == {"FOO": "1"}
    assert both_off.normalise_tag("FOO") == "foo"
    assert both_off.normalise_attributes({"FOO": "1"}) == {"foo": "1"}
    assert tag_on.normalise_tag("FOO") == "FOO"
    assert tag_on.normalise_attributes({"FOO": "1"}) == {"foo": "1"}
    assert attr_on.normalise_tag("FOO") == "foo"
    assert attr_on.normalise_attributes({"FOO": "1"}) == {"FOO": "1"}


# -- AttributeTest / AttributesTest ----------------------------------------

def test_attributes_html():  # AttributesTest.swift:13-37
    a = Attributes()
    a.put("Tot", "a&p")
    a.put("Hello", "There")
    a.put("data-name", "Jsoup")

    assert a.size() == 3
    assert a.has_key("Tot")
    assert a.has_key("Hello")
    assert a.has_key("data-name")
    assert not a.has_key("tot")
    assert a.has_key_ignore_case("tot")
    assert a.get_ignore_case("hEllo") == "There"

    assert a.dataset() == {"name": "Jsoup"}
    assert a.get("tot") == ""
    assert a.get("Tot") == "a&p"
    assert a.get_ignore_case("tot") == "a&p"

    el = Element("span")
    el.attributes = a
    assert attributes_html(el) == \
        ' Tot="a&amp;p" Hello="There" data-name="Jsoup"'


def test_attributes_iterator():  # AttributesTest.swift:55-80
    a = Attributes()
    datas = [("Tot", "raul"), ("Hello", "pismuth"), ("data-name", "Jsoup")]
    for k, v in datas:
        a.put(k, v)
    assert list(a.items()) == datas
    assert list(Attributes().items()) == []


def test_attribute_remove_case_sensitive():  # AttributeTest.swift:24-39
    a = Attributes()
    a.put("Tot", "a&p")
    a.put("tot", "one")
    a.put("Hello", "There")
    a.put("hello", "There")
    a.put("data-name", "Jsoup")

    assert a.size() == 5
    a.remove("Tot")
    a.remove("Hello")
    assert a.size() == 3
    assert a.has_key("tot")
    assert not a.has_key("Tot")


def test_crossorigin_without_value_collapses():  # AttributeTest.swift:64-74
    script = sf.parse('<script crossorigin src="app.js"></script>') \
        .select("script")[0]
    assert script.has_attr("crossorigin")
    out = script.outer_html()
    assert "crossorigin" in out
    assert 'crossorigin=""' not in out


def test_crossorigin_empty_value_collapses():  # AttributeTest.swift:76-86
    out = sf.parse('<script crossorigin="" src="app.js"></script>') \
        .select("script")[0].outer_html()
    assert "crossorigin" in out
    assert 'crossorigin=""' not in out


def test_crossorigin_with_value_preserved():  # AttributeTest.swift:88-93
    script = sf.parse('<script crossorigin="use-credentials" '
                      'src="app.js"></script>').select("script")[0]
    assert script.attr("crossorigin") == "use-credentials"


def test_crossorigin_set_programmatically_collapses():
    # AttributeTest.swift:95-103
    script = sf.parse('<script src="app.js"></script>').select("script")[0]
    script.set_attr("crossorigin", "")
    out = script.outer_html()
    assert "crossorigin" in out
    assert 'crossorigin=""' not in out


# -- PublicEmptyAttributeKeyTest -------------------------------------------

def test_boolean_vertical_tab_key_does_not_crash_select():
    # PublicEmptyAttributeKeyTest.swift:10-14
    doc = sf.parse('<div a="b"\x0b>hi</div>')
    assert len(doc.select("[name=x]")) == 0


def test_valued_vertical_tab_key_does_not_crash_select():
    # PublicEmptyAttributeKeyTest.swift:17-21
    doc = sf.parse('<div a="b"\x0b=x>hi</div>')
    assert len(doc.select("[name=x]")) == 0


def test_meta_vertical_tab_key_does_not_crash_select():
    # PublicEmptyAttributeKeyTest.swift:24-28
    doc = sf.parse('<meta a="b"\x0b=og:title>')
    assert len(doc.select("meta[property=og:title]")) == 0

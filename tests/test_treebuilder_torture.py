"""Classic WHATWG tree-construction torture cases (public html5lib-tests
corpus shapes: adoption agency, foster parenting, select mode, implied
end tags). Locks in behavior the ported reference suites touch only
partially."""

import re

import soupflow as sf


def flat(h):
    return re.sub(r"\n\s*", "", sf.parse(h).body().html())


def test_a_in_p_adoption():
    assert flat("<a><p>X<a>Y") == "<a></a><p><a>X</a><a>Y</a></p>"


def test_b_p_adoption():
    assert flat("<b><p></b>TEST") == "<b></b><p><b></b>TEST</p>"


def test_foster_parenting_with_formatting():
    assert flat("<table><b><tr><td>aaa</td></tr>bbb</table>ccc") == (
        "<b></b><b>bbb</b><table><tbody><tr><td>aaa</td></tr></tbody>"
        "</table><b>ccc</b>")


def test_misnested_b_i_across_p():
    assert flat("<p><b>1<i>2</p>3</i>4</b>5") == \
        "<p><b>1<i>2</i></b></p><b><i>3</i>4</b>5"


def test_nested_tables_in_cell():
    assert flat("<table><td>cell<table><td>inner") == (
        "<table><tbody><tr><td>cell<table><tbody><tr><td>inner</td>"
        "</tr></tbody></table></td></tr></tbody></table>")


def test_table_tokens_ignored_in_select():
    assert flat("<select><table><tr><td>x") == "<select>x</select>"


def test_adoption_with_non_formatting_descendants():
    assert flat("<b><em><foo><aside></b>X") == \
        "<b><em><foo></foo></em></b><aside><b></b>X</aside>"


def test_table_text_fostered():
    assert flat("<table>text<td>cell") == (
        "text<table><tbody><tr><td>cell</td></tr></tbody></table>")


def test_li_closes_p_in_div():
    assert flat("<div><p><li>item") == "<div><p></p><li>item</li></div>"


def test_button_scope():
    assert flat("<button><p>one</button><p>two") == \
        "<button><p>one</p></button><p>two</p>"

"""Ported from /root/reference/Tests/SwiftSoupTests/QueryParserTest.swift
(structure assertions re-expressed against this engine's evaluator
classes; fresh Python test code)."""

from soupflow.selector import (And, ImmediateParent,
                               ImmediatePreviousSibling, Or, Parent,
                               TagIs, parse_query)


def test_or_gets_correct_precedence():  # QueryParserTest.swift:13-31
    # "a b, c d, e f" evals to (a AND b) OR (c AND d) OR (e AND f)
    ev = parse_query("a b, c d, e f")
    assert isinstance(ev, Or)
    assert len(ev.evaluators) == 3
    for inner in ev.evaluators:
        assert isinstance(inner, And)
        assert len(inner.evaluators) == 2
        kinds = {type(e) for e in inner.evaluators}
        assert TagIs in kinds
        assert Parent in kinds


def test_parses_multi_correctly():  # QueryParserTest.swift:33-53
    ev = parse_query(".foo > ol, ol > li + li")
    assert isinstance(ev, Or)
    assert len(ev.evaluators) == 2
    left, right = ev.evaluators
    assert isinstance(left, And)
    assert len(left.evaluators) == 2
    assert any(isinstance(e, ImmediateParent) for e in left.evaluators)
    assert isinstance(right, And)
    assert len(right.evaluators) == 2
    assert any(isinstance(e, (ImmediatePreviousSibling, ImmediateParent))
               for e in right.evaluators)

"""Ported from /root/reference/Tests/SwiftSoupTests/TokenQueueTest.swift
(assertion values verbatim; fresh Python test code)."""

from soupflow.selector import TokenQueue


def test_chomp_balanced():  # TokenQueueTest.swift:13-22
    tq = TokenQueue(":contains(one (two) three) four")
    pre = tq.consume_to("(")
    guts = tq.chomp_balanced("(", ")")
    remainder = tq.remainder()
    assert pre == ":contains"
    assert guts == "one (two) three"
    assert remainder == " four"


def test_chomp_escaped_balanced():  # TokenQueueTest.swift:24-34
    tq = TokenQueue(":contains(one (two) \\( \\) \\) three) four")
    pre = tq.consume_to("(")
    guts = tq.chomp_balanced("(", ")")
    remainder = tq.remainder()
    assert pre == ":contains"
    assert guts == "one (two) \\( \\) \\) three"
    assert TokenQueue.unescape(guts) == "one (two) ( ) ) three"
    assert remainder == " four"


def test_chomp_balanced_matches_as_much_as_possible():
    # TokenQueueTest.swift:36-41
    tq = TokenQueue("unbalanced(something(or another")
    tq.consume_to("(")
    match = tq.chomp_balanced("(", ")")
    assert match == "something(or another"


def test_unescape():  # TokenQueueTest.swift:43-45
    assert TokenQueue.unescape("one \\( \\) \\\\") == "one ( ) \\"


def test_chomp_to_ignore_case():  # TokenQueueTest.swift:47-56
    tq = TokenQueue("<textarea>one < two </TEXTarea>")
    assert tq.chomp_to_ignore_case("</textarea") == "<textarea>one < two "

    tq = TokenQueue("<textarea> one two < three </oops>")
    assert tq.chomp_to_ignore_case("</textarea") == \
        "<textarea> one two < three </oops>"


def test_add_first():  # TokenQueueTest.swift:58-63
    tq = TokenQueue("One Two")
    tq.consume_word()
    tq.add_first("Three")
    assert tq.remainder() == "Three Two"

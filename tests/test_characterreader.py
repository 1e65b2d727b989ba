"""Ported from /root/reference/Tests/SwiftSoupTests/CharacterReaderTest.swift
(the behavioral subset that maps onto this engine's str-based reader;
byte-slice/word-scan internals are N/A — Python strings are already
codepoint-indexed)."""

import re

from soupflow.tokenizer import EOF, CharacterReader


def test_consume():  # CharacterReaderTest.swift:12-26
    r = CharacterReader("one")
    assert r.pos == 0
    assert r.current() == "o"
    assert r.consume() == "o"
    assert r.pos == 1
    assert r.current() == "n"
    assert r.pos == 1
    assert r.consume() == "n"
    assert r.consume() == "e"
    assert r.is_empty()
    assert r.consume() == EOF
    assert r.is_empty()
    assert r.consume() == EOF


def test_unconsume():  # CharacterReaderTest.swift:28-51
    r = CharacterReader("one")
    assert r.consume() == "o"
    assert r.current() == "n"
    r.unconsume()
    assert r.current() == "o"

    assert r.consume() == "o"
    assert r.consume() == "n"
    assert r.consume() == "e"
    assert r.is_empty()
    r.unconsume()
    assert not r.is_empty()
    assert r.current() == "e"
    assert r.consume() == "e"
    assert r.is_empty()


def test_multibyte_unconsume():  # CharacterReaderTest.swift:53-59
    r = CharacterReader("π>")
    assert r.consume() == "π"
    assert r.current() == ">"
    r.unconsume()
    assert r.current() == "π"


def test_advance_ascii_and_multibyte():  # CharacterReaderTest.swift:69-76
    r = CharacterReader("aπb")
    assert r.current() == "a"
    r.advance()
    assert r.current() == "π"
    r.advance()
    assert r.current() == "b"


def test_mark():  # CharacterReaderTest.swift:78-87
    r = CharacterReader("one")
    assert r.consume() == "o"
    r.mark()
    assert r.consume() == "n"
    assert r.consume() == "e"
    assert r.is_empty()
    r.rewind_to_mark()
    assert r.consume() == "n"


def test_consume_to_char():  # CharacterReaderTest.swift:128-136
    r = CharacterReader("One Two Three")
    assert r.consume_to("T") == "One "
    assert r.consume_to("T") == ""  # on Two
    assert r.consume() == "T"
    assert r.consume_to("T") == "wo "
    assert r.consume() == "T"
    assert r.consume_to("T") == "hree"  # consume to end


def test_consume_to_string_multibyte():  # CharacterReaderTest.swift:156-161
    r = CharacterReader("aπbπc")
    assert r.consume_to("πb") == "a"
    assert r.consume_to("πc") == "πb"
    assert r.consume_to("x") == "πc"


def test_consume_to_string():  # CharacterReaderTest.swift:163-170
    r = CharacterReader("One Two Two Four")
    assert r.consume_to("Two") == "One "
    assert r.consume() == "T"
    assert r.consume_to("Two") == "wo "
    assert r.consume() == "T"
    assert r.consume_to("Qux") == "wo Four"


def test_advance():  # CharacterReaderTest.swift:172-177
    r = CharacterReader("One Two Three")
    assert r.consume() == "O"
    r.advance()
    assert r.consume() == "e"


def test_consume_to_any():  # CharacterReaderTest.swift:179-188
    pat = re.compile(r"[&;]")
    r = CharacterReader("One 二 &bar; qux 三")
    assert r.consume_to_any_re(pat) == "One 二 "
    assert r.matches("&")
    assert r.matches("&bar;")
    assert r.consume() == "&"
    assert r.consume_to_any_re(pat) == "bar"
    assert r.consume() == ";"
    assert r.consume_to_any_re(pat) == " qux 三"


def test_consume_letter_sequence():  # CharacterReaderTest.swift:238-244
    r = CharacterReader("One &bar; qux")
    assert r.consume_letter_sequence() == "One"
    assert r.consume_to("bar;") == " &"
    assert r.consume_letter_sequence() == "bar"
    assert r.consume_to("\x00") == "; qux"


def test_matches():  # CharacterReaderTest.swift (matches family)
    r = CharacterReader("One Two Three")
    assert r.matches("O")
    assert r.matches("One Two Three")
    assert r.matches("One")
    assert not r.matches("one")
    assert r.matches_ignore_case("one")
    assert not r.matches("Two")
    assert r.consume() == "O"
    assert not r.matches("One")
    assert r.matches("ne Two Three")


def test_match_consume():
    r = CharacterReader("One Two Three")
    assert r.match_consume("One")
    assert r.matches(" Two")
    assert not r.match_consume("Two")
    assert r.match_consume(" Two ")
    assert r.consume_to("\x00") == "Three"

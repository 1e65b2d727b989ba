"""Ported from /root/reference/Tests/SwiftSoupTests/StringUtilTest.swift
(assertion values verbatim; fresh Python test code). The byte-slice
variants of appendNormalisedWhitespace are not ported — this engine
works on str; the string-path expectations are asserted."""

import soupflow as sf
from soupflow.textutil import (append_normalised_whitespace, is_blank,
                               is_numeric, is_whitespace,
                               normalise_whitespace, pad_string,
                               resolve_url)


def test_padding():  # StringUtilTest.swift:39-44
    assert pad_string(0) == ""
    assert pad_string(1) == " "
    assert pad_string(2) == "  "
    assert pad_string(15) == "               "


def test_is_blank():  # StringUtilTest.swift:46-54
    assert is_blank("")
    assert is_blank("      ")
    assert is_blank("   \r\n  ")
    assert not is_blank("hello")
    assert not is_blank("   hello   ")


def test_is_numeric():  # StringUtilTest.swift:56-65
    assert not is_numeric(" ")
    assert not is_numeric("123 546")
    assert not is_numeric("hello")
    assert not is_numeric("123.334")
    assert is_numeric("1")
    assert is_numeric("1234")


def test_is_whitespace():  # StringUtilTest.swift:75-86
    assert is_whitespace("\t")
    assert is_whitespace("\n")
    assert is_whitespace("\r")
    assert is_whitespace("\f")
    assert is_whitespace(" ")
    assert not is_whitespace(" ")
    assert not is_whitespace(" ")
    assert not is_whitespace("　")


def test_normalise_whitespace():  # StringUtilTest.swift:88-93
    assert normalise_whitespace("    \r \n \r\n") == " "
    assert normalise_whitespace("   hello   \r \n  there    \n") == \
        " hello there "
    assert normalise_whitespace("hello") == "hello"
    assert normalise_whitespace("hello\nthere") == "hello there"


def test_normalise_whitespace_handles_high_surrogates():
    # StringUtilTest.swift:95-102 (literal backslash-escape text in the
    # reference; the behavioral point is surrogate-pair safety)
    test_chars = "\U0001aab2か゚  1"
    expected = "\U0001aab2か゚ 1"
    assert normalise_whitespace(test_chars) == expected
    assert sf.parse(test_chars).text() == expected


def test_append_normalised_whitespace_no_whitespace():
    # StringUtilTest.swift:104-109
    accum = []
    append_normalised_whitespace(accum, "alphaβ", strip_leading=True)
    assert "".join(accum) == "alphaβ"


def test_append_normalised_whitespace_with_whitespace():
    # StringUtilTest.swift:111-116
    accum = []
    append_normalised_whitespace(accum, " alpha \n beta ",
                                 strip_leading=True)
    assert "".join(accum) == "alpha beta "


def test_append_normalised_whitespace_nbsp_string_path():
    # StringUtilTest.swift:118-129 — the engine implements the byte-slice
    # path (NBSP -> space), which is what Element.text() uses; the
    # reference's separate String overload preserving NBSP is not ported
    accum = []
    append_normalised_whitespace(accum, "a b \t c\n",
                                 strip_leading=False)
    assert "".join(accum) == "a b c "


def test_append_normalised_whitespace_multibyte():
    # StringUtilTest.swift:131-137
    accum = []
    append_normalised_whitespace(accum, "  πβ   😀 \tζ ",
                                 strip_leading=True)
    assert "".join(accum) == "πβ 😀 ζ "


def test_resolves_relative_urls():  # StringUtilTest.swift:185-200
    assert resolve_url("http://example.com", "./one/two?three") == \
        "http://example.com/one/two?three"
    assert resolve_url("http://example.com?one", "./one/two?three") == \
        "http://example.com/one/two?three"
    assert resolve_url("http://example.com", "./one/two?three#four") == \
        "http://example.com/one/two?three#four"
    assert resolve_url("http://example.com/", "https://example.com/one") \
        == "https://example.com/one"
    assert resolve_url("http://example.com/two/", "../one/two.html") == \
        "http://example.com/one/two.html"
    assert resolve_url("https://example.com/", "//example2.com/one") == \
        "https://example2.com/one"
    assert resolve_url("https://example.com:8080", "./one") == \
        "https://example.com:8080/one"
    assert resolve_url("http://example.com/", "https://example2.com/one") \
        == "https://example2.com/one"
    assert resolve_url("wrong", "https://example.com/one") == \
        "https://example.com/one"
    assert resolve_url("https://example.com/one", "") == \
        "https://example.com/one"
    assert resolve_url("wrong", "also wrong") == ""
    assert resolve_url("ftp://example.com/two/", "../one") == \
        "ftp://example.com/one"
    assert resolve_url("ftp://example.com/one/", "./two.c") == \
        "ftp://example.com/one/two.c"
    assert resolve_url("ftp://example.com/one/", "two.c") == \
        "ftp://example.com/one/two.c"


def test_resolve_escaping():  # StringUtilTest.swift:202-210
    assert resolve_url(
        "", "mailto:mail@example.com?subject=Job%20Requisition[NID]") == \
        "mailto:mail@example.com?subject=Job%20Requisition%5BNID%5D"
    assert resolve_url("", "https://example.com?foo=one%20two[") == \
        "https://example.com?foo=one%20two%5B"

"""HTML named/numeric character entities: unescape + escape.

Parity targets: /root/reference/Sources/Entities.swift (escape modes
xhtml=4 / base=106 / extended=2125 at :228-231, escape loop :824-1083)
and Tokeniser.consumeCharacterReference
(/root/reference/Sources/Tokeniser.swift:764-1044).

The full named-entity table comes from the Python stdlib
``html.entities.html5`` (the public WHATWG entity list). The "base" set is
the classic HTML4 Latin-1 set the reference uses for default escaping.
"""

from __future__ import annotations

from html.entities import html5 as _HTML5  # name（maybe w/o ';'）→ chars

# -- tables -----------------------------------------------------------------

# name → characters, semicolon-terminated canonical forms
ENTITIES_BY_NAME: dict[str, str] = {}
for _name, _chars in _HTML5.items():
    if _name.endswith(";"):
        ENTITIES_BY_NAME[_name[:-1]] = _chars
# names valid without a trailing semicolon (WHATWG legacy set)
LEGACY_NO_SEMI: dict[str, str] = {
    name: chars for name, chars in _HTML5.items() if not name.endswith(";")
}

_BASE_NAMES = [
    "AElig", "AMP", "Aacute", "Acirc", "Agrave", "Aring", "Atilde", "Auml",
    "COPY", "Ccedil", "ETH", "Eacute", "Ecirc", "Egrave", "Euml", "GT",
    "Iacute", "Icirc", "Igrave", "Iuml", "LT", "Ntilde", "Oacute", "Ocirc",
    "Ograve", "Oslash", "Otilde", "Ouml", "QUOT", "REG", "THORN", "Uacute",
    "Ucirc", "Ugrave", "Uuml", "Yacute", "aacute", "acirc", "acute", "aelig",
    "agrave", "amp", "aring", "atilde", "auml", "brvbar", "ccedil", "cedil",
    "cent", "copy", "curren", "deg", "divide", "eacute", "ecirc", "egrave",
    "eth", "euml", "frac12", "frac14", "frac34", "gt", "iacute", "icirc",
    "iexcl", "igrave", "iquest", "iuml", "laquo", "lt", "macr", "micro",
    "middot", "nbsp", "not", "ntilde", "oacute", "ocirc", "ograve", "ordf",
    "ordm", "oslash", "otilde", "ouml", "para", "plusmn", "pound", "quot",
    "raquo", "reg", "sect", "shy", "sup1", "sup2", "sup3", "szlig", "thorn",
    "times", "uacute", "ucirc", "ugrave", "uml", "uuml", "yacute", "yen",
    "yuml",
]
BASE_BY_NAME: dict[str, str] = {n: ENTITIES_BY_NAME[n] for n in _BASE_NAMES}

XHTML_BY_NAME: dict[str, str] = {"amp": "&", "gt": ">", "lt": "<",
                                 "quot": '"'}


def _best_name_by_codepoint(table: dict[str, str]) -> dict[str, str]:
    # char → lexicographically-greatest single-codepoint name
    out: dict[str, str] = {}
    for name, chars in table.items():
        if len(chars) != 1:
            continue
        cur = out.get(chars)
        if cur is None or cur < name:
            out[chars] = name
    return out


_NAME_FOR_CP = {
    "xhtml": _best_name_by_codepoint(XHTML_BY_NAME),
    "base": _best_name_by_codepoint(BASE_BY_NAME),
    "extended": _best_name_by_codepoint(ENTITIES_BY_NAME),
}

# Windows-1252 mapping for numeric refs in 0x80-0x9F
# (public WHATWG table; reference Tokeniser.swift win1252 extension range)
WIN1252 = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}

REPLACEMENT = "�"


def codepoint_to_chars(cp: int) -> str:
    if cp in WIN1252:
        return WIN1252[cp]
    if cp <= 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return REPLACEMENT
    try:
        return chr(cp)
    except ValueError:
        return REPLACEMENT


def is_named_entity(name: str) -> bool:
    return name in ENTITIES_BY_NAME


def is_base_named_entity(name: str) -> bool:
    return name in BASE_BY_NAME


def get_by_name(name: str) -> str:
    return ENTITIES_BY_NAME.get(name, "")


_DIGITS = "0123456789"
_HEX = "0123456789abcdefABCDEF"


def _consume_char_ref(s: str, i: int, in_attribute: bool,
                      strict: bool) -> tuple[str, int] | None:
    """Try to read a character reference at s[i] (s[i-1] == '&').

    Returns (replacement, new_index) or None to emit a literal '&'.
    Mirrors Tokeniser.consumeCharacterReference semantics.
    """
    n = len(s)
    if i >= n:
        return None
    c = s[i]
    if c in "\t\n\r\f <&":
        return None
    if c == "#":
        j = i + 1
        hexmode = j < n and s[j] in "xX"
        if hexmode:
            j += 1
        start = j
        charset = _HEX if hexmode else _DIGITS
        while j < n and s[j] in charset:
            j += 1
        if j == start:
            return None
        cp = int(s[start:j], 16 if hexmode else 10)
        if j < n and s[j] == ";":
            j += 1
        elif strict:
            return None
        return codepoint_to_chars(cp), j
    # named: consume a letter-then-digit run (Tokeniser.swift named branch)
    j = i
    while j < n and s[j].isalpha():
        j += 1
    while j < n and s[j].isdigit():
        j += 1
    if j == i:
        return None
    name = s[i:j]
    has_semi = j < n and s[j] == ";"
    found = (name in BASE_BY_NAME and not strict) or \
        (name in ENTITIES_BY_NAME and has_semi)
    if not found:
        return None
    if in_attribute and not has_semi and j < n and \
            (s[j].isalnum() or s[j] in "=-_"):
        return None
    return ENTITIES_BY_NAME[name], j + 1 if has_semi else j


def unescape(s: str, strict: bool = False,
             in_attribute: bool = False) -> str:
    """Unescape character references (reference Entities.unescape,
    Parser.unescapeEntities)."""
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    n = len(s)
    while True:
        amp = s.find("&", i)
        if amp == -1:
            out.append(s[i:])
            break
        out.append(s[i:amp])
        res = _consume_char_ref(s, amp + 1, in_attribute, strict)
        if res is None:
            out.append("&")
            i = amp + 1
        else:
            out.append(res[0])
            i = res[1]
    return "".join(out)


# -- escape -----------------------------------------------------------------

_WS_CHARS = " \t\n\f\r\x0b"


def escape(s: str, escape_mode: str = "base", charset: str = "utf-8",
           in_attribute: bool = False, normalise_white: bool = False,
           strip_leading_white: bool = False) -> str:
    """Escape text for HTML serialization (reference Entities.escape).

    For utf-8 output only &, <, >, ", and NBSP are entity-escaped; other
    codepoints pass through. For ascii charsets, non-encodable codepoints
    become named (per mode) or numeric hex references.
    """
    xhtml = escape_mode == "xhtml"
    ascii_only = charset.lower() in ("ascii", "us-ascii")
    name_for_cp = _NAME_FOR_CP.get(escape_mode, _NAME_FOR_CP["base"])
    out: list[str] = []
    last_was_white = False
    reached_non_white = False
    for ch in s:
        if normalise_white and ch in _WS_CHARS:
            if (not reached_non_white and strip_leading_white) \
                    or last_was_white:
                continue
            out.append(" ")
            last_was_white = True
            continue
        last_was_white = False
        reached_non_white = True
        if ch == "&":
            out.append("&amp;")
        elif ch == "<":
            out.append("&lt;" if (not in_attribute or xhtml) else ch)
        elif ch == ">":
            out.append("&gt;" if not in_attribute else ch)
        elif ch == '"':
            out.append("&quot;" if in_attribute else ch)
        elif ch == " ":
            out.append("&#xa0;" if xhtml else "&nbsp;")
        elif ascii_only and ord(ch) >= 0x80:
            name = name_for_cp.get(ch)
            if name is not None:
                out.append(f"&{name};")
            else:
                out.append(f"&#x{ord(ch):x};")
        else:
            out.append(ch)
    return "".join(out)

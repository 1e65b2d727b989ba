"""String/whitespace utilities.

Parity targets: /root/reference/Sources/StringUtil.swift:301-448
(whitespace predicates, appendNormalisedWhitespace incl. NBSP handling).
"""

from __future__ import annotations

import re

# HTML whitespace per the reference: space, \t, \n, \f, \r ... plus NBSP
# treated as collapsible whitespace in normalisation (StringUtil.swift:418+).
_WS = " \t\n\f\r"
_WS_SET = frozenset(_WS)
_WS_NBSP_SET = frozenset(_WS + " ")
_WS_RUN = re.compile(r"[ \t\n\f\r ]+")


def is_whitespace(ch: str) -> bool:
    return ch in _WS_SET


def is_actually_whitespace(ch: str) -> bool:
    return ch in _WS_NBSP_SET


def is_blank(s: str) -> bool:
    """True if empty or all HTML whitespace (NBSP is NOT blank here,
    matching reference StringUtil.isBlank over isWhitespace)."""
    if not s:
        return True
    for ch in s:
        if ch not in _WS_SET:
            return False
    return True


def _collapse(s: str) -> str:
    """_WS_RUN.sub(' ', s) with a memchr fast path: web text is
    overwhelmingly already single-space-separated, and six C-level
    ``in`` scans are ~17x cheaper than the regex rebuild (the regex
    matches single spaces too, so it always copies)."""
    if "\t" in s or "\n" in s or "\f" in s or "\r" in s \
            or "\xa0" in s or "  " in s:
        return _WS_RUN.sub(" ", s)
    return s


def normalise_whitespace(s: str) -> str:
    """Collapse whitespace runs (incl. NBSP) to single spaces; no trim."""
    return _collapse(s)


def append_normalised_whitespace(accum: list[str], s: str,
                                 strip_leading: bool) -> None:
    """Append s to accum with whitespace runs collapsed to ' '.

    strip_leading drops leading whitespace entirely (used when the
    accumulator is empty or already ends in a space).
    Reference: StringUtil.swift appendNormalisedWhitespace.
    """
    out = _collapse(s)
    if strip_leading and out.startswith(" "):
        out = out[1:]  # leading run already collapsed to one space
    accum.append(out)


def normalise_whitespace_fast(s: str, strip_leading: bool) -> str:
    """Single-string variant of append_normalised_whitespace."""
    out = _collapse(s)
    if strip_leading:
        out = out.lstrip(" ")
    return out


def is_numeric(s: str) -> bool:
    return bool(s) and s.isdigit()


def is_ascii(s: str) -> bool:
    return s.isascii()


def pad_string(width: int) -> str:
    return " " * width


_URL_LIKE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")

# RFC3986 unreserved + reserved minus '[' / ']' (which get %-encoded, like
# the reference's Foundation URL normalization), plus '%' to avoid
# double-encoding existing escapes.
_URL_SAFE = "%/:?#@!$&'()*+,;=~-._"


def _normalize_url(url: str) -> str:
    from urllib.parse import quote
    return quote(url, safe=_URL_SAFE)


def resolve_url(base: str, rel: str) -> str:
    """Resolve rel against base like the reference's StringUtil.resolve
    (Sources/StringUtil.swift:1197-1230): returns "" on failure; output
    is normalized (invalid URL chars percent-encoded)."""
    from urllib.parse import urljoin, urlparse
    if re.search(r"\s", rel):
        # any whitespace (incl. leading/trailing) fails resolution, like
        # the reference's Foundation URL(string:) returning nil
        return ""
    if not base:
        if _URL_LIKE.match(rel):
            return _normalize_url(rel)
        return ""
    try:
        out = urljoin(base, rel)
    except ValueError:
        return ""
    if not urlparse(out).scheme:
        return ""
    return _normalize_url(out)

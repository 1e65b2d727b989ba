"""HTML5 tokenizer: the 67-state WHATWG state machine.

Parity targets: /root/reference/Sources/TokeniserState.swift:115-3037
(state list + transitions), Tokeniser.swift:240-330 (read loop) and
764-1044 (character references). This is a fresh Python implementation:
states are functions in a dispatch table over a regex-accelerated
CharacterReader; character runs are coalesced into single Character
tokens before emission (like the reference's pending-slice coalescing).
"""

from __future__ import annotations

import re
from typing import Optional

from .entities import BASE_BY_NAME, ENTITIES_BY_NAME, codepoint_to_chars

EOF = "￿"  # sentinel returned by reader at end of input
REPLACEMENT = "�"
NULL = "\x00"

_WS = "\t\n\r\f "

# -- tokens -----------------------------------------------------------------


class Token:
    __slots__ = ()


class DoctypeTok(Token):
    __slots__ = ("name", "public_id", "system_id", "force_quirks",
                 "pub_sys_key")

    def __init__(self) -> None:
        self.name: list[str] = []
        self.public_id: list[str] = []
        self.system_id: list[str] = []
        self.force_quirks = False
        self.pub_sys_key: Optional[str] = None

    def get_name(self) -> str:
        return "".join(self.name)

    def get_public_id(self) -> str:
        return "".join(self.public_id)

    def get_system_id(self) -> str:
        return "".join(self.system_id)


class TagTok(Token):
    __slots__ = ("name", "attrs", "self_closing", "_attr_name", "_attr_value",
                 "_has_attr_value", "_has_attr_name", "start", "_normal",
                 "src_start", "src_end")

    def __init__(self, start: bool) -> None:
        self.start = start
        self._normal: Optional[str] = None
        self.name: Optional[str] = None
        self.attrs: dict[str, str] = {}
        self.self_closing = False
        self.src_start: Optional[int] = None  # set when tracking source
        self.src_end: Optional[int] = None
        # attr fragment buffers are lazily allocated: most tags (and
        # every fast-path tag) never touch them, so the common case
        # skips two list allocations per tag
        self._attr_name: Optional[list[str]] = None
        self._attr_value: Optional[list[str]] = None
        self._has_attr_value = False
        self._has_attr_name = False

    def append_tag_name(self, s: str) -> None:
        self.name = s if self.name is None else self.name + s
        self._normal = None

    def append_attr_name(self, s: str) -> None:
        self._has_attr_name = True
        if self._attr_name is None:
            self._attr_name = [s]
        else:
            self._attr_name.append(s)

    def append_attr_value(self, s: str) -> None:
        self._has_attr_value = True
        if self._attr_value is None:
            self._attr_value = [s]
        else:
            self._attr_value.append(s)

    def set_empty_attr_value(self) -> None:
        self._has_attr_value = True

    def new_attribute(self) -> None:
        if self._has_attr_name:
            name = "".join(self._attr_name).strip()
            if name and name not in self.attrs:
                # None = declared with no value (serializes as bare key);
                # _has_attr_value with no buffer = declared empty ("")
                if not self._has_attr_value:
                    self.attrs[name] = None
                elif self._attr_value is None:
                    self.attrs[name] = ""
                else:
                    self.attrs[name] = "".join(self._attr_value)
        self._attr_name = None
        self._attr_value = None
        self._has_attr_value = False
        self._has_attr_name = False

    def finalise(self) -> None:
        self.new_attribute()

    def normal_name(self) -> str:
        # cached: called many times per token in the tree builder
        n = self._normal
        if n is None:
            n = self._normal = (self.name or "").lower()
        return n

    def to_source_string(self) -> str:
        """Round-trip-ish source form, used when a tag token must be
        re-emitted as text (e.g. inside head>noscript)."""
        attrs = "".join(
            f" {k}" if v is None else f' {k}="{v}"'
            for k, v in self.attrs.items())
        if self.start:
            return f"<{self.name}{attrs}>"
        return f"</{self.name}>"


class CommentTok(Token):
    __slots__ = ("data", "bogus")

    def __init__(self) -> None:
        self.data: list[str] = []
        self.bogus = False

    def get_data(self) -> str:
        return "".join(self.data)


class CharacterTok(Token):
    __slots__ = ("data", "is_cdata", "src_start", "src_end")

    def __init__(self, data: str, is_cdata: bool = False) -> None:
        self.data = data
        self.is_cdata = is_cdata
        self.src_start: Optional[int] = None  # set when tracking source
        self.src_end: Optional[int] = None


class EOFTok(Token):
    __slots__ = ()


# -- character reader -------------------------------------------------------

_RE_DATA = re.compile(r"[&<\x00]")
_RE_RCDATA = re.compile(r"[&<\x00]")
_RE_RAWTEXT = re.compile(r"[<\x00]")
_RE_SCRIPT = re.compile(r"[<\x00]")
_RE_TAGNAME_DELIM = re.compile(r"[\t\n\r\f />\x00]")
_RE_ATTRNAME_DELIM = re.compile(r"[\t\n\r\f /=>\x00\"'<]")

# Whole-tag fast path: one regex match per well-formed tag instead of
# ~10 state-function dispatches. Deliberately CONSERVATIVE — the char
# classes are strict subsets of what the state machine accepts (no
# entities, NULs, quotes-in-names, missing whitespace between attrs,
# `/` inside names, empty `=` values...); anything unusual simply
# fails the match and falls back to the exact state machine, so parity
# is preserved by construction. Quoted values exclude `&`/NUL because
# the state machine resolves character references there.
_RE_FAST_START = re.compile(
    r'([a-zA-Z][a-zA-Z0-9:_.-]*)'
    r'((?:[\t\n\r\f ]+[^\t\n\r\f /="\'<>&\x00]+'
    r'(?:[\t\n\r\f ]*=[\t\n\r\f ]*'
    r'(?:"[^"&\x00]*"|\'[^\'&\x00]*\'|[^\t\n\r\f >"\'<=`&\x00]+))?'
    r')*)'
    r'[\t\n\r\f ]*(/?)>')
_RE_FAST_ATTR = re.compile(
    r'[\t\n\r\f ]+([^\t\n\r\f /="\'<>&\x00]+)'
    r'(?:[\t\n\r\f ]*=[\t\n\r\f ]*'
    r'("[^"&\x00]*"|\'[^\'&\x00]*\'|[^\t\n\r\f >"\'<=`&\x00]+))?')
_RE_FAST_END = re.compile(r'([a-zA-Z][a-zA-Z0-9:_.-]*)[\t\n\r\f ]*>')
_RE_ATTRVAL_UNQ = re.compile(r"[\t\n\r\f &>\x00\"'<=`]")
_RE_LETTER = re.compile(r"[A-Za-z]+")
_RE_DIGIT = re.compile(r"[0-9]+")
_RE_HEX = re.compile(r"[0-9A-Fa-f]+")


class CharacterReader:
    __slots__ = ("s", "pos", "len", "_mark")

    def __init__(self, s: str) -> None:
        # NO newline normalization: the reference keeps \r in the input
        # and treats it as plain whitespace in the state tables
        # (Tokeniser.swift:45, CharacterReader.swift:1523); quoted
        # attribute values preserve \r\n (AttributeParseTest.swift:31-37)
        self.s = s
        self.pos = 0
        self.len = len(s)
        self._mark = 0

    def is_empty(self) -> bool:
        return self.pos >= self.len

    def current(self) -> str:
        return self.s[self.pos] if self.pos < self.len else EOF

    def consume(self) -> str:
        # ALWAYS advances, even past the end (like the reference's
        # bufPos++): consume/unconsume stay symmetric at EOF, so the
        # common "consume → not what I wanted → unconsume + retry"
        # state pattern can't loop forever on truncated input
        # (regression: "<script><" at EOF)
        p = self.pos
        self.pos = p + 1
        return self.s[p] if p < self.len else EOF

    def unconsume(self) -> None:
        if self.pos > 0:
            self.pos -= 1

    def advance(self) -> None:
        self.pos += 1

    def mark(self) -> None:
        self._mark = self.pos

    def rewind_to_mark(self) -> None:
        self.pos = self._mark

    def matches(self, seq: str) -> bool:
        return self.s.startswith(seq, self.pos)

    def matches_ignore_case(self, seq: str) -> bool:
        return self.s[self.pos:self.pos + len(seq)].lower() == seq.lower()

    def match_consume(self, seq: str) -> bool:
        if self.s.startswith(seq, self.pos):
            self.pos += len(seq)
            return True
        return False

    def match_consume_ignore_case(self, seq: str) -> bool:
        if self.s[self.pos:self.pos + len(seq)].lower() == seq.lower():
            self.pos += len(seq)
            return True
        return False

    def contains_ignore_case(self, seq: str) -> bool:
        return seq.lower() in self.s[self.pos:].lower()

    def matches_letter(self) -> bool:
        if self.pos >= self.len:
            return False
        return self.s[self.pos].isalpha()

    def matches_ascii_alpha(self) -> bool:
        if self.pos >= self.len:
            return False
        c = self.s[self.pos]
        return ("a" <= c <= "z") or ("A" <= c <= "Z")

    def matches_digit(self) -> bool:
        if self.pos >= self.len:
            return False
        return self.s[self.pos].isdigit()

    def matches_any(self, chars: str) -> bool:
        return self.pos < self.len and self.s[self.pos] in chars

    def consume_to(self, seq: str) -> str:
        i = self.s.find(seq, self.pos)
        if i == -1:
            out = self.s[self.pos:]
            self.pos = self.len
            return out
        out = self.s[self.pos:i]
        self.pos = i
        return out

    def consume_to_any_re(self, pattern: re.Pattern) -> str:
        m = pattern.search(self.s, self.pos)
        if m is None:
            out = self.s[self.pos:]
            self.pos = self.len
            return out
        out = self.s[self.pos:m.start()]
        self.pos = m.start()
        return out

    def _consume_matching(self, pattern: re.Pattern) -> str:
        m = pattern.match(self.s, self.pos)
        if m is None:
            return ""
        self.pos = m.end()
        return m.group()

    def consume_letter_sequence(self) -> str:
        # MUST accept exactly the characters matches_letter() accepts
        # (unicode isalpha, like the reference's Character.isLetter) —
        # an ASCII-only regex here looped forever on "<!DOCTYPEπ"
        # because the caller saw a letter but nothing was consumed
        s, n = self.s, self.len
        p = start = self.pos
        while p < n and s[p].isalpha():
            p += 1
        self.pos = p
        return s[start:p]

    def consume_digit_sequence(self) -> str:
        return self._consume_matching(_RE_DIGIT)

    def consume_hex_sequence(self) -> str:
        return self._consume_matching(_RE_HEX)

    def consume_letter_then_digit(self) -> str:
        out = self.consume_letter_sequence()
        out += self._consume_matching(_RE_DIGIT)
        return out

    def consume_tag_name(self) -> str:
        return self.consume_to_any_re(_RE_TAGNAME_DELIM)

    def consume_attr_name(self) -> str:
        return self.consume_to_any_re(_RE_ATTRNAME_DELIM)

    def consume_rest(self) -> str:
        out = self.s[self.pos:]
        self.pos = self.len
        return out


# -- tokeniser --------------------------------------------------------------


class Tokeniser:
    __slots__ = ("reader", "state", "emit_pending", "is_emit_pending",
                 "chars", "tag_pending", "doctype_pending", "comment_pending",
                 "data_buffer", "last_start_tag", "errors", "_cdata_pending",
                 "track", "chars_start", "chars_end", "last_lt_pos",
                 "_pool_start", "_pool_end")

    def __init__(self, reader: CharacterReader,
                 errors: Optional[list] = None,
                 track_source: bool = False) -> None:
        self.reader = reader
        self.state = data_state
        self.emit_pending: Optional[Token] = None
        self.is_emit_pending = False
        self.chars: list[str] = []
        self.tag_pending: Optional[TagTok] = None
        self.doctype_pending: Optional[DoctypeTok] = None
        self.comment_pending: Optional[CommentTok] = None
        self.data_buffer: list[str] = []
        # reusable fast-path tag tokens (consumed within one process()
        # cycle by the tree builder, so a single instance per kind is
        # safe — mirrors the reference's reusable Token.StartTag)
        self._pool_start = TagTok(True)
        self._pool_end = TagTok(False)
        self.last_start_tag: Optional[str] = None
        self.errors = errors
        self._cdata_pending = False
        # source-range tracking (ParseSettings.track_source_ranges):
        # last_lt_pos = offset of the '<' that opened the current tag;
        # chars_start/end bound the current coalesced character run
        self.track = track_source
        self.chars_start = 0
        self.chars_end = 0
        self.last_lt_pos = 0

    # -- public API -------------------------------------------------------
    def read(self) -> Token:
        if self.track and not self.chars:
            self.chars_start = self.reader.pos
        while not self.is_emit_pending:
            self.state(self, self.reader)
        # coalesced chars have priority over the pending token
        if self.chars:
            data = "".join(self.chars)
            self.chars.clear()
            cdata = self._cdata_pending
            self._cdata_pending = False
            tok = CharacterTok(data, cdata)
            if self.track:
                tok.src_start = self.chars_start
                tok.src_end = self.chars_end
            return tok
        self.is_emit_pending = False
        tok = self.emit_pending
        self.emit_pending = None
        return tok

    # -- emission ---------------------------------------------------------
    def emit(self, tok: Token) -> None:
        self.emit_pending = tok
        self.is_emit_pending = True
        if tok.__class__ is TagTok:
            if tok._has_attr_name or tok._has_attr_value:
                tok.new_attribute()
            if self.track and tok.src_start is not None:
                tok.src_end = self.reader.pos
            if tok.start:
                self.last_start_tag = tok.normal_name()

    def emit_chars(self, s: str) -> None:
        self.chars.append(s)
        if self.track:
            self.chars_end = self.reader.pos

    def emit_cdata(self, s: str) -> None:
        self.chars.append(s)
        if self.track:
            self.chars_end = self.reader.pos

    def create_tag_pending(self, start: bool) -> TagTok:
        self.tag_pending = TagTok(start)
        if self.track:
            self.tag_pending.src_start = self.last_lt_pos
        return self.tag_pending

    def emit_tag_pending(self) -> None:
        self.emit(self.tag_pending)

    def create_comment_pending(self) -> None:
        self.comment_pending = CommentTok()

    def emit_comment_pending(self) -> None:
        self.emit(self.comment_pending)

    def create_doctype_pending(self) -> None:
        self.doctype_pending = DoctypeTok()

    def emit_doctype_pending(self) -> None:
        self.emit(self.doctype_pending)

    def create_temp_buffer(self) -> None:
        self.data_buffer.clear()

    def is_appropriate_end_tag(self) -> bool:
        return self.last_start_tag is not None and \
            self.tag_pending.normal_name() == self.last_start_tag

    def appropriate_end_tag_name(self) -> Optional[str]:
        return self.last_start_tag

    def transition(self, new_state) -> None:
        self.state = new_state

    def advance_transition(self, new_state) -> None:
        self.reader.advance()
        self.state = new_state

    def error(self, msg: str = "") -> None:
        if self.errors is not None and len(self.errors) < 64:
            self.errors.append((self.reader.pos, msg))

    def eof_error(self, msg: str = "eof") -> None:
        self.error(msg)

    # -- character references (Tokeniser.swift:764-1044) -------------------
    def consume_character_reference(self, additional: Optional[str],
                                    in_attribute: bool) -> Optional[str]:
        r = self.reader
        if r.is_empty():
            return None
        c = r.current()
        if additional is not None and c == additional:
            return None
        if c in "\t\n\r\f <&":
            return None
        r.mark()
        if r.match_consume("#"):
            hexmode = r.match_consume_ignore_case("X")
            body = r.consume_hex_sequence() if hexmode \
                else r.consume_digit_sequence()
            if not body:
                self.error("numeric reference with no numerals")
                r.rewind_to_mark()
                return None
            if not r.match_consume(";"):
                self.error("missing semicolon")
            cp = int(body, 16 if hexmode else 10)
            return codepoint_to_chars(cp)
        name = r.consume_letter_then_digit()
        looks_legit = r.matches(";")
        found = (name in BASE_BY_NAME) or \
            (name in ENTITIES_BY_NAME and looks_legit)
        if not found:
            r.rewind_to_mark()
            if looks_legit:
                self.error(f"invalid named reference {name!r}")
            return None
        if in_attribute and (r.matches_letter() or r.matches_digit()
                             or r.matches_any("=-_")):
            r.rewind_to_mark()
            return None
        if not r.match_consume(";"):
            self.error("missing semicolon")
        return ENTITIES_BY_NAME[name]


# -- state functions --------------------------------------------------------
# Each state: fn(t: Tokeniser, r: CharacterReader) -> None


def data_state(t: Tokeniser, r: CharacterReader) -> None:
    # internal loop: a text run followed by '<' (the dominant document
    # shape) is handled in ONE state call — the text-run branch loops
    # back to the top instead of bouncing through the read loop again
    s, n = r.s, r.len
    while True:
        p = r.pos
        c = s[p] if p < n else EOF
        if c != "<":
            if c == "&":
                t.advance_transition(char_ref_in_data)
            elif c == EOF:
                t.emit(EOFTok())
            elif c == NULL:
                t.error("null in data")
                t.emit_chars(r.consume())
            else:
                # inlined consume_to_any_re(_RE_DATA) + emit_chars
                m = _RE_DATA.search(s, p)
                end = n if m is None else m.start()
                r.pos = end
                t.chars.append(s[p:end])
                if t.track:
                    t.chars_end = end
                continue
            return
        _data_tag_open(t, r)
        return


def _data_tag_open(t: Tokeniser, r: CharacterReader) -> None:
    # fused fast path for the overwhelmingly common "<letter" and
    # "</letter" forms: first try to match the ENTIRE tag with one
    # conservative regex (see _RE_FAST_START — any unusual syntax
    # fails the match), else fall into the state machine at the
    # tag_name state, saving two read-loop round trips per tag
    if t.track:
        t.last_lt_pos = r.pos
    s, p, n = r.s, r.pos + 1, r.len
    if p < n:
        nxt = s[p]
        if ("a" <= nxt <= "z") or ("A" <= nxt <= "Z"):
            m = _RE_FAST_START.match(s, p)
            if m is not None:
                # pooled token (reference reuses Token.StartTag the
                # same way): tags are fully consumed by the tree
                # builder inside process() — _attrs_for_token copies
                # the dict — so one reusable instance is safe
                tok = t._pool_start
                tok._normal = None
                attrs = tok.attrs
                if attrs:
                    tok.attrs = attrs = {}
                if t.track:
                    tok.src_start = p - 1
                tok.name, attrs_src, slash = m.group(1, 2, 3)
                if attrs_src:
                    for am in _RE_FAST_ATTR.finditer(attrs_src):
                        an = am.group(1)
                        if an not in attrs:
                            av = am.group(2)
                            if av is None:
                                attrs[an] = None
                            elif av[0] == '"' or av[0] == "'":
                                attrs[an] = av[1:-1]
                            else:
                                attrs[an] = av
                tok.self_closing = True if slash else False
                r.pos = m.end()
                t.tag_pending = tok
                # inlined emit(): pooled tokens never carry pending
                # attr fragments, so finalise is a no-op
                t.emit_pending = tok
                t.is_emit_pending = True
                if t.track:
                    tok.src_end = r.pos
                t.last_start_tag = tok.normal_name()
                return
            r.pos = p
            t.create_tag_pending(True)
            t.transition(tag_name)
            return
        if nxt == "/" and p + 1 < n:
            nxt2 = s[p + 1]
            if ("a" <= nxt2 <= "z") or ("A" <= nxt2 <= "Z"):
                m = _RE_FAST_END.match(s, p + 1)
                if m is not None:
                    tok = t._pool_end  # see start-tag pool note
                    tok._normal = None
                    if t.track:
                        tok.src_start = p - 1
                    tok.name = m.group(1)
                    r.pos = m.end()
                    t.tag_pending = tok
                    # inlined emit() (end tag: last_start_tag untouched)
                    t.emit_pending = tok
                    t.is_emit_pending = True
                    if t.track:
                        tok.src_end = r.pos
                    return
                r.pos = p + 1
                t.create_tag_pending(False)
                t.transition(tag_name)
                return
    t.advance_transition(tag_open)


def char_ref_in_data(t: Tokeniser, r: CharacterReader) -> None:
    ref = t.consume_character_reference(None, False)
    t.emit_chars(ref if ref is not None else "&")
    t.transition(data_state)


def rcdata_state(t: Tokeniser, r: CharacterReader) -> None:
    c = r.current()
    if c == "&":
        t.advance_transition(char_ref_in_rcdata)
    elif c == "<":
        if t.track:
            t.last_lt_pos = r.pos
        t.advance_transition(rcdata_lt)
    elif c == NULL:
        t.error("null in rcdata")
        r.advance()
        t.emit_chars(REPLACEMENT)
    elif c == EOF:
        t.emit(EOFTok())
    else:
        t.emit_chars(r.consume_to_any_re(_RE_RCDATA))


def char_ref_in_rcdata(t: Tokeniser, r: CharacterReader) -> None:
    ref = t.consume_character_reference(None, False)
    t.emit_chars(ref if ref is not None else "&")
    t.transition(rcdata_state)


def rawtext_state(t: Tokeniser, r: CharacterReader) -> None:
    c = r.current()
    if c == "<":
        if t.track:
            t.last_lt_pos = r.pos
        t.advance_transition(rawtext_lt)
    elif c == NULL:
        t.error("null in rawtext")
        r.advance()
        t.emit_chars(REPLACEMENT)
    elif c == EOF:
        t.emit(EOFTok())
    else:
        t.emit_chars(r.consume_to_any_re(_RE_RAWTEXT))


def script_data_state(t: Tokeniser, r: CharacterReader) -> None:
    c = r.current()
    if c == "<":
        if t.track:
            t.last_lt_pos = r.pos
        t.advance_transition(script_data_lt)
    elif c == NULL:
        t.error("null in script data")
        r.advance()
        t.emit_chars(REPLACEMENT)
    elif c == EOF:
        t.emit(EOFTok())
    else:
        t.emit_chars(r.consume_to_any_re(_RE_SCRIPT))


def plaintext_state(t: Tokeniser, r: CharacterReader) -> None:
    c = r.current()
    if c == NULL:
        t.error("null in plaintext")
        r.advance()
        t.emit_chars(REPLACEMENT)
    elif c == EOF:
        t.emit(EOFTok())
    else:
        t.emit_chars(r.consume_to("\x00"))


def tag_open(t: Tokeniser, r: CharacterReader) -> None:
    c = r.current()
    if c == "!":
        t.advance_transition(markup_declaration_open)
    elif c == "/":
        t.advance_transition(end_tag_open)
    elif c == "?":
        t.advance_transition(bogus_comment)
    elif r.matches_ascii_alpha():
        t.create_tag_pending(True)
        t.transition(tag_name)
    else:
        t.error("unexpected character in tag open")
        t.emit_chars("<")
        t.transition(data_state)


def end_tag_open(t: Tokeniser, r: CharacterReader) -> None:
    if r.is_empty():
        t.eof_error()
        t.emit_chars("</")
        t.transition(data_state)
    elif r.matches_ascii_alpha():
        t.create_tag_pending(False)
        t.transition(tag_name)
    elif r.matches(">"):
        t.error("missing end tag name")
        t.advance_transition(data_state)
    else:
        t.error("bogus end tag")
        t.advance_transition(bogus_comment)


def tag_name(t: Tokeniser, r: CharacterReader) -> None:
    t.tag_pending.append_tag_name(r.consume_tag_name())
    c = r.consume()
    if c in _WS:
        t.transition(before_attribute_name)
    elif c == "/":
        t.transition(self_closing_start_tag)
    elif c == "<":
        r.unconsume()
        t.error("unexpected <")
        t.transition(before_attribute_name)
    elif c == ">":
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == NULL:
        t.tag_pending.append_tag_name(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    else:
        t.tag_pending.append_tag_name(c)


def rcdata_lt(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches("/"):
        t.create_temp_buffer()
        t.advance_transition(rcdata_end_tag_open)
    elif r.matches_letter() and t.appropriate_end_tag_name() is not None \
            and not r.contains_ignore_case("</" + t.appropriate_end_tag_name()):
        # diverge from spec like the reference: no appropriate end tag is
        # coming, so close the rcdata element here instead of eating to EOF
        t.tag_pending = t.create_tag_pending(False)
        t.tag_pending.append_tag_name(t.appropriate_end_tag_name())
        t.emit_tag_pending()
        r.unconsume()  # undo the '<' consume done by the rcdata state
        t.transition(data_state)
    else:
        t.emit_chars("<")
        t.transition(rcdata_state)


def rcdata_end_tag_open(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches_letter():
        t.create_tag_pending(False)
        t.tag_pending.append_tag_name(r.current())
        t.data_buffer.append(r.current())
        t.advance_transition(rcdata_end_tag_name)
    else:
        t.emit_chars("</")
        t.transition(rcdata_state)


def rcdata_end_tag_name(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches_letter():
        name = r.consume_letter_sequence()
        t.tag_pending.append_tag_name(name)
        t.data_buffer.append(name)
        return
    c = r.consume()
    if c in _WS and t.is_appropriate_end_tag():
        t.transition(before_attribute_name)
    elif c == "/" and t.is_appropriate_end_tag():
        t.transition(self_closing_start_tag)
    elif c == ">" and t.is_appropriate_end_tag():
        t.emit_tag_pending()
        t.transition(data_state)
    else:
        t.emit_chars("</" + "".join(t.data_buffer))
        r.unconsume()
        t.transition(rcdata_state)


def rawtext_lt(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches("/"):
        t.create_temp_buffer()
        t.advance_transition(rawtext_end_tag_open)
    else:
        t.emit_chars("<")
        t.transition(rawtext_state)


def _handle_data_end_tag(t: Tokeniser, r: CharacterReader,
                         else_transition) -> None:
    if r.matches_letter():
        name = r.consume_letter_sequence()
        t.tag_pending.append_tag_name(name)
        t.data_buffer.append(name)
        return
    needs_exit = False
    if t.is_appropriate_end_tag() and not r.is_empty():
        c = r.consume()
        if c in _WS:
            t.transition(before_attribute_name)
        elif c == "/":
            t.transition(self_closing_start_tag)
        elif c == ">":
            t.emit_tag_pending()
            t.transition(data_state)
        else:
            t.data_buffer.append(c)
            needs_exit = True
    else:
        needs_exit = True
    if needs_exit:
        t.emit_chars("</" + "".join(t.data_buffer))
        t.transition(else_transition)


def rawtext_end_tag_open(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches_letter():
        t.create_tag_pending(False)
        t.transition(rawtext_end_tag_name)
    else:
        t.emit_chars("</")
        t.transition(rawtext_state)


def rawtext_end_tag_name(t: Tokeniser, r: CharacterReader) -> None:
    _handle_data_end_tag(t, r, rawtext_state)


def script_data_lt(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c == "/":
        t.create_temp_buffer()
        t.transition(script_data_end_tag_open)
    elif c == "!":
        t.emit_chars("<!")
        t.transition(script_data_escape_start)
    else:
        t.emit_chars("<")
        r.unconsume()
        t.transition(script_data_state)


def script_data_end_tag_open(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches_letter():
        t.create_tag_pending(False)
        t.transition(script_data_end_tag_name)
    else:
        t.emit_chars("</")
        t.transition(script_data_state)


def script_data_end_tag_name(t: Tokeniser, r: CharacterReader) -> None:
    _handle_data_end_tag(t, r, script_data_state)


def script_data_escape_start(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches("-"):
        t.emit_chars("-")
        t.advance_transition(script_data_escape_start_dash)
    else:
        t.transition(script_data_state)


def script_data_escape_start_dash(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches("-"):
        t.emit_chars("-")
        t.advance_transition(script_data_escaped_dash_dash)
    else:
        t.transition(script_data_state)


def script_data_escaped(t: Tokeniser, r: CharacterReader) -> None:
    if r.is_empty():
        t.eof_error()
        t.transition(data_state)
        return
    c = r.current()
    if c == "-":
        t.emit_chars("-")
        t.advance_transition(script_data_escaped_dash)
    elif c == "<":
        t.advance_transition(script_data_escaped_lt)
    elif c == NULL:
        t.error("null")
        r.advance()
        t.emit_chars(REPLACEMENT)
    else:
        t.emit_chars(r.consume_to_any_re(_RE_SCRIPT_ESC))


_RE_SCRIPT_ESC = re.compile(r"[-<\x00]")


def script_data_escaped_dash(t: Tokeniser, r: CharacterReader) -> None:
    if r.is_empty():
        t.eof_error()
        t.transition(data_state)
        return
    c = r.consume()
    if c == "-":
        t.emit_chars("-")
        t.transition(script_data_escaped_dash_dash)
    elif c == "<":
        t.transition(script_data_escaped_lt)
    elif c == NULL:
        t.error("null")
        t.emit_chars(REPLACEMENT)
        t.transition(script_data_escaped)
    else:
        t.emit_chars(c)
        t.transition(script_data_escaped)


def script_data_escaped_dash_dash(t: Tokeniser, r: CharacterReader) -> None:
    if r.is_empty():
        t.eof_error()
        t.transition(data_state)
        return
    c = r.consume()
    if c == "-":
        t.emit_chars("-")
    elif c == "<":
        t.transition(script_data_escaped_lt)
    elif c == ">":
        t.emit_chars(">")
        t.transition(script_data_state)
    elif c == NULL:
        t.error("null")
        t.emit_chars(REPLACEMENT)
        t.transition(script_data_escaped)
    else:
        t.emit_chars(c)
        t.transition(script_data_escaped)


def script_data_escaped_lt(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches_letter():
        t.create_temp_buffer()
        t.data_buffer.append(r.current())
        t.emit_chars("<" + r.current())
        t.advance_transition(script_data_double_escape_start)
    elif r.matches("/"):
        t.create_temp_buffer()
        t.advance_transition(script_data_escaped_end_tag_open)
    else:
        t.emit_chars("<")
        t.transition(script_data_escaped)


def script_data_escaped_end_tag_open(t: Tokeniser,
                                     r: CharacterReader) -> None:
    if r.matches_letter():
        t.create_tag_pending(False)
        t.tag_pending.append_tag_name(r.current())
        t.data_buffer.append(r.current())
        t.advance_transition(script_data_escaped_end_tag_name)
    else:
        t.emit_chars("</")
        t.transition(script_data_escaped)


def script_data_escaped_end_tag_name(t: Tokeniser,
                                     r: CharacterReader) -> None:
    _handle_data_end_tag(t, r, script_data_escaped)


def script_data_double_escape_start(t: Tokeniser,
                                    r: CharacterReader) -> None:
    _handle_double_escape(t, r, script_data_double_escaped,
                          script_data_escaped)


def _handle_double_escape(t: Tokeniser, r: CharacterReader, primary,
                          fallback) -> None:
    if r.matches_letter():
        name = r.consume_letter_sequence()
        t.data_buffer.append(name)
        t.emit_chars(name)
        return
    c = r.consume()
    if c in _WS or c in "/>":
        if "".join(t.data_buffer) == "script":
            t.transition(primary)
        else:
            t.transition(fallback)
        t.emit_chars(c)
    else:
        r.unconsume()
        t.transition(fallback)


def script_data_double_escaped(t: Tokeniser, r: CharacterReader) -> None:
    c = r.current()
    if c == "-":
        t.emit_chars("-")
        t.advance_transition(script_data_double_escaped_dash)
    elif c == "<":
        t.emit_chars("<")
        t.advance_transition(script_data_double_escaped_lt)
    elif c == NULL:
        t.error("null")
        r.advance()
        t.emit_chars(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    else:
        t.emit_chars(r.consume_to_any_re(_RE_SCRIPT_ESC))


def script_data_double_escaped_dash(t: Tokeniser,
                                    r: CharacterReader) -> None:
    c = r.consume()
    if c == "-":
        t.emit_chars("-")
        t.transition(script_data_double_escaped_dash_dash)
    elif c == "<":
        t.emit_chars("<")
        t.transition(script_data_double_escaped_lt)
    elif c == NULL:
        t.error("null")
        t.emit_chars(REPLACEMENT)
        t.transition(script_data_double_escaped)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    else:
        t.emit_chars(c)
        t.transition(script_data_double_escaped)


def script_data_double_escaped_dash_dash(t: Tokeniser,
                                         r: CharacterReader) -> None:
    c = r.consume()
    if c == "-":
        t.emit_chars("-")
    elif c == "<":
        t.emit_chars("<")
        t.transition(script_data_double_escaped_lt)
    elif c == ">":
        t.emit_chars(">")
        t.transition(script_data_state)
    elif c == NULL:
        t.error("null")
        t.emit_chars(REPLACEMENT)
        t.transition(script_data_double_escaped)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    else:
        t.emit_chars(c)
        t.transition(script_data_double_escaped)


def script_data_double_escaped_lt(t: Tokeniser,
                                  r: CharacterReader) -> None:
    if r.matches("/"):
        t.emit_chars("/")
        t.create_temp_buffer()
        t.advance_transition(script_data_double_escape_end)
    else:
        t.transition(script_data_double_escaped)


def script_data_double_escape_end(t: Tokeniser,
                                  r: CharacterReader) -> None:
    _handle_double_escape(t, r, script_data_escaped,
                          script_data_double_escaped)


def before_attribute_name(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        return
    if c == "/":
        t.transition(self_closing_start_tag)
    elif c == "<":
        r.unconsume()
        t.error("unexpected <")
        t.tag_pending.new_attribute()
        t.transition(attribute_name)
    elif c == ">":
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == NULL:
        t.error("null")
        t.tag_pending.new_attribute()
        t.tag_pending.append_attr_name(REPLACEMENT)
        t.transition(attribute_name)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    elif c in "\"'=":
        t.error("unexpected character in attribute name")
        t.tag_pending.new_attribute()
        t.tag_pending.append_attr_name(c)
        t.transition(attribute_name)
    else:
        t.tag_pending.new_attribute()
        r.unconsume()
        t.transition(attribute_name)


def attribute_name(t: Tokeniser, r: CharacterReader) -> None:
    t.tag_pending.append_attr_name(r.consume_attr_name())
    c = r.consume()
    if c in _WS:
        t.transition(after_attribute_name)
    elif c == "/":
        t.transition(self_closing_start_tag)
    elif c == "=":
        t.transition(before_attribute_value)
    elif c == ">":
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == NULL:
        t.error("null")
        t.tag_pending.append_attr_name(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    elif c in "\"'<":
        t.error("unexpected character in attribute name")
        t.tag_pending.append_attr_name(c)
    else:
        t.tag_pending.append_attr_name(c)


def after_attribute_name(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        return
    if c == "/":
        t.transition(self_closing_start_tag)
    elif c == "=":
        t.transition(before_attribute_value)
    elif c == ">":
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == NULL:
        t.error("null")
        t.tag_pending.new_attribute()
        t.tag_pending.append_attr_name(REPLACEMENT)
        t.transition(attribute_name)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    elif c in "\"'<":
        t.error("unexpected character")
        t.tag_pending.new_attribute()
        t.tag_pending.append_attr_name(c)
        t.transition(attribute_name)
    else:
        t.tag_pending.new_attribute()
        r.unconsume()
        t.transition(attribute_name)


def before_attribute_value(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        return
    if c == '"':
        t.transition(attribute_value_double)
    elif c == "&":
        r.unconsume()
        t.transition(attribute_value_unquoted)
    elif c == "'":
        t.transition(attribute_value_single)
    elif c == NULL:
        t.error("null")
        t.tag_pending.append_attr_value(REPLACEMENT)
        t.transition(attribute_value_unquoted)
    elif c == EOF:
        t.eof_error()
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == ">":
        t.error("missing attribute value")
        t.emit_tag_pending()
        t.transition(data_state)
    elif c in "<=`":
        t.error("unexpected character")
        t.tag_pending.append_attr_value(c)
        t.transition(attribute_value_unquoted)
    else:
        r.unconsume()
        t.transition(attribute_value_unquoted)


_RE_ATTRVAL_DQ = re.compile(r"[\"&\x00]")
_RE_ATTRVAL_SQ = re.compile(r"['&\x00]")


def attribute_value_double(t: Tokeniser, r: CharacterReader) -> None:
    value = r.consume_to_any_re(_RE_ATTRVAL_DQ)
    if value:
        t.tag_pending.append_attr_value(value)
    else:
        t.tag_pending.set_empty_attr_value()
    c = r.consume()
    if c == '"':
        t.transition(after_attribute_value_quoted)
    elif c == "&":
        ref = t.consume_character_reference('"', True)
        t.tag_pending.append_attr_value(ref if ref is not None else "&")
    elif c == NULL:
        t.error("null")
        t.tag_pending.append_attr_value(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)


def attribute_value_single(t: Tokeniser, r: CharacterReader) -> None:
    value = r.consume_to_any_re(_RE_ATTRVAL_SQ)
    if value:
        t.tag_pending.append_attr_value(value)
    else:
        t.tag_pending.set_empty_attr_value()
    c = r.consume()
    if c == "'":
        t.transition(after_attribute_value_quoted)
    elif c == "&":
        ref = t.consume_character_reference("'", True)
        t.tag_pending.append_attr_value(ref if ref is not None else "&")
    elif c == NULL:
        t.error("null")
        t.tag_pending.append_attr_value(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)


def attribute_value_unquoted(t: Tokeniser, r: CharacterReader) -> None:
    value = r.consume_to_any_re(_RE_ATTRVAL_UNQ)
    if value:
        t.tag_pending.append_attr_value(value)
    c = r.consume()
    if c in _WS:
        t.transition(before_attribute_name)
    elif c == "&":
        ref = t.consume_character_reference(">", True)
        t.tag_pending.append_attr_value(ref if ref is not None else "&")
    elif c == ">":
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == NULL:
        t.error("null")
        t.tag_pending.append_attr_value(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    elif c in "\"'<=`":
        t.error("unexpected character")
        t.tag_pending.append_attr_value(c)


def after_attribute_value_quoted(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        t.transition(before_attribute_name)
    elif c == "/":
        t.transition(self_closing_start_tag)
    elif c == ">":
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    else:
        r.unconsume()
        t.error("unexpected character")
        t.transition(before_attribute_name)


def self_closing_start_tag(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c == ">":
        t.tag_pending.self_closing = True
        t.emit_tag_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.transition(data_state)
    else:
        r.unconsume()
        t.error("unexpected character")
        t.transition(before_attribute_name)


def bogus_comment(t: Tokeniser, r: CharacterReader) -> None:
    # rewind to capture the character that led us here
    r.unconsume()
    comment = CommentTok()
    comment.bogus = True
    comment.data.append(r.consume_to(">"))
    t.emit(comment)
    r.advance()
    t.transition(data_state)


def markup_declaration_open(t: Tokeniser, r: CharacterReader) -> None:
    if r.match_consume("--"):
        t.create_comment_pending()
        t.transition(comment_start)
    elif r.matches_ignore_case("DOCTYPE"):
        r.pos += 7
        t.transition(doctype_state)
    elif r.match_consume("[CDATA["):
        t.create_temp_buffer()
        t.transition(cdata_section)
    else:
        t.error("bogus markup declaration")
        t.advance_transition(bogus_comment)


def comment_start(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c == "-":
        t.transition(comment_start_dash)
    elif c == NULL:
        t.error("null")
        t.comment_pending.data.append(REPLACEMENT)
        t.transition(comment_state)
    elif c == ">":
        t.error("abrupt comment close")
        t.emit_comment_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.emit_comment_pending()
        t.transition(data_state)
    else:
        r.unconsume()
        t.transition(comment_state)


def comment_start_dash(t: Tokeniser, r: CharacterReader) -> None:
    # diverges from spec like the reference: leading dashes are absorbed
    c = r.consume()
    if c == "-":
        t.transition(comment_start_dash)
    elif c == NULL:
        t.error("null")
        t.comment_pending.data.append(REPLACEMENT)
        t.transition(comment_state)
    elif c == ">":
        t.error("abrupt comment close")
        t.emit_comment_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.emit_comment_pending()
        t.transition(data_state)
    else:
        t.comment_pending.data.append(c)
        t.transition(comment_state)


_RE_COMMENT = re.compile(r"[-\x00]")


def comment_state(t: Tokeniser, r: CharacterReader) -> None:
    c = r.current()
    if c == "-":
        t.advance_transition(comment_end_dash)
    elif c == NULL:
        t.error("null")
        r.advance()
        t.comment_pending.data.append(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.emit_comment_pending()
        t.transition(data_state)
    else:
        t.comment_pending.data.append(r.consume_to_any_re(_RE_COMMENT))


def comment_end_dash(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c == "-":
        t.transition(comment_end)
    elif c == NULL:
        t.error("null")
        t.comment_pending.data.append("-" + REPLACEMENT)
        t.transition(comment_state)
    elif c == EOF:
        t.eof_error()
        t.emit_comment_pending()
        t.transition(data_state)
    else:
        t.comment_pending.data.append("-" + c)
        t.transition(comment_state)


def comment_end(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c == ">":
        t.emit_comment_pending()
        t.transition(data_state)
    elif c == NULL:
        t.error("null")
        t.comment_pending.data.append("--" + REPLACEMENT)
        t.transition(comment_state)
    elif c == "!":
        t.error("unexpected bang")
        t.transition(comment_end_bang)
    elif c == "-":
        t.error("unexpected dash")
        t.comment_pending.data.append("-")
    elif c == EOF:
        t.eof_error()
        t.emit_comment_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.comment_pending.data.append("--" + c)
        t.transition(comment_state)


def comment_end_bang(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c == "-":
        t.comment_pending.data.append("--!")
        t.transition(comment_end_dash)
    elif c == ">":
        t.emit_comment_pending()
        t.transition(data_state)
    elif c == NULL:
        t.error("null")
        t.comment_pending.data.append("--!" + REPLACEMENT)
        t.transition(comment_state)
    elif c == EOF:
        t.eof_error()
        t.emit_comment_pending()
        t.transition(data_state)
    else:
        t.comment_pending.data.append("--!" + c)
        t.transition(comment_state)


def doctype_state(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        t.transition(before_doctype_name)
    elif c == ">":
        t.error("missing doctype name")
        t.create_doctype_pending()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.create_doctype_pending()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("missing whitespace")
        r.unconsume()
        t.transition(before_doctype_name)


def before_doctype_name(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches_letter():
        t.create_doctype_pending()
        t.transition(doctype_name)
        return
    c = r.consume()
    if c in _WS:
        return
    if c == NULL:
        t.error("null")
        t.create_doctype_pending()
        t.doctype_pending.name.append(REPLACEMENT)
        t.transition(doctype_name)
    elif c == EOF:
        t.eof_error()
        t.create_doctype_pending()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.create_doctype_pending()
        t.doctype_pending.name.append(c)
        t.transition(doctype_name)


def doctype_name(t: Tokeniser, r: CharacterReader) -> None:
    if r.matches_letter():
        t.doctype_pending.name.append(r.consume_letter_sequence())
        return
    c = r.consume()
    if c == ">":
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c in _WS:
        t.transition(after_doctype_name)
    elif c == NULL:
        t.error("null")
        t.doctype_pending.name.append(REPLACEMENT)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.doctype_pending.name.append(c)


def after_doctype_name(t: Tokeniser, r: CharacterReader) -> None:
    if r.is_empty():
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
        return
    if r.matches_any(_WS):
        r.advance()
    elif r.matches(">"):
        t.emit_doctype_pending()
        t.advance_transition(data_state)
    elif r.matches_ignore_case("PUBLIC"):
        r.pos += 6
        t.doctype_pending.pub_sys_key = "PUBLIC"
        t.transition(after_doctype_public_keyword)
    elif r.matches_ignore_case("SYSTEM"):
        r.pos += 6
        t.doctype_pending.pub_sys_key = "SYSTEM"
        t.transition(after_doctype_system_keyword)
    else:
        t.error("invalid character in doctype")
        t.doctype_pending.force_quirks = True
        t.transition(bogus_doctype)


def after_doctype_public_keyword(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        t.transition(before_doctype_public_identifier)
    elif c == '"':
        t.error("unexpected quote")
        t.transition(doctype_public_identifier_dq)
    elif c == "'":
        t.error("unexpected quote")
        t.transition(doctype_public_identifier_sq)
    elif c == ">":
        t.error("unexpected >")
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.doctype_pending.force_quirks = True
        t.transition(bogus_doctype)


def before_doctype_public_identifier(t: Tokeniser,
                                     r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        return
    if c == '"':
        t.transition(doctype_public_identifier_dq)
    elif c == "'":
        t.transition(doctype_public_identifier_sq)
    elif c == ">":
        t.error("unexpected >")
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.doctype_pending.force_quirks = True
        t.transition(bogus_doctype)


def _doctype_identifier(t: Tokeniser, r: CharacterReader, quote: str,
                        target: list, after_state) -> None:
    c = r.consume()
    if c == quote:
        t.transition(after_state)
    elif c == NULL:
        t.error("null")
        target.append(REPLACEMENT)
    elif c == ">":
        t.error("unexpected >")
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        target.append(c)


def doctype_public_identifier_dq(t: Tokeniser, r: CharacterReader) -> None:
    _doctype_identifier(t, r, '"', t.doctype_pending.public_id,
                        after_doctype_public_identifier)


def doctype_public_identifier_sq(t: Tokeniser, r: CharacterReader) -> None:
    _doctype_identifier(t, r, "'", t.doctype_pending.public_id,
                        after_doctype_public_identifier)


def after_doctype_public_identifier(t: Tokeniser,
                                    r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        t.transition(between_doctype_public_and_system)
    elif c == ">":
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == '"':
        t.error("unexpected quote")
        t.transition(doctype_system_identifier_dq)
    elif c == "'":
        t.error("unexpected quote")
        t.transition(doctype_system_identifier_sq)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.doctype_pending.force_quirks = True
        t.transition(bogus_doctype)


def between_doctype_public_and_system(t: Tokeniser,
                                      r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        return
    if c == ">":
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == '"':
        t.transition(doctype_system_identifier_dq)
    elif c == "'":
        t.transition(doctype_system_identifier_sq)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.doctype_pending.force_quirks = True
        t.transition(bogus_doctype)


def after_doctype_system_keyword(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        t.transition(before_doctype_system_identifier)
    elif c == ">":
        t.error("unexpected >")
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == '"':
        t.error("unexpected quote")
        t.transition(doctype_system_identifier_dq)
    elif c == "'":
        t.error("unexpected quote")
        t.transition(doctype_system_identifier_sq)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.doctype_pending.force_quirks = True
        t.transition(bogus_doctype)


def before_doctype_system_identifier(t: Tokeniser,
                                     r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        return
    if c == '"':
        t.transition(doctype_system_identifier_dq)
    elif c == "'":
        t.transition(doctype_system_identifier_sq)
    elif c == ">":
        t.error("unexpected >")
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.doctype_pending.force_quirks = True
        t.transition(bogus_doctype)


def doctype_system_identifier_dq(t: Tokeniser, r: CharacterReader) -> None:
    _doctype_identifier(t, r, '"', t.doctype_pending.system_id,
                        after_doctype_system_identifier)


def doctype_system_identifier_sq(t: Tokeniser, r: CharacterReader) -> None:
    _doctype_identifier(t, r, "'", t.doctype_pending.system_id,
                        after_doctype_system_identifier)


def after_doctype_system_identifier(t: Tokeniser,
                                    r: CharacterReader) -> None:
    c = r.consume()
    if c in _WS:
        return
    if c == ">":
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == EOF:
        t.eof_error()
        t.doctype_pending.force_quirks = True
        t.emit_doctype_pending()
        t.transition(data_state)
    else:
        t.error("unexpected character")
        t.transition(bogus_doctype)


def bogus_doctype(t: Tokeniser, r: CharacterReader) -> None:
    c = r.consume()
    if c == ">":
        t.emit_doctype_pending()
        t.transition(data_state)
    elif c == EOF:
        t.emit_doctype_pending()
        t.transition(data_state)
    # else: drop char


def cdata_section(t: Tokeniser, r: CharacterReader) -> None:
    data = r.consume_to("]]>")
    t.emit_cdata(data)
    r.match_consume("]]>")
    t.transition(data_state)

"""Tag descriptors and HTML trait tables.

Behavioral parity with the reference's interned tag-trait tables
(/root/reference/Sources/Tag.swift:577-612): block vs inline defaults,
void ("empty") tags, format-as-inline, preserve-whitespace, form-listed and
form-submittable tags.  The tag-name lists themselves are standard
HTML4/HTML5 vocabulary (W3C/WHATWG).

Unknown tags get block-like defaults but are not isBlock/formatAsBlock
(reference: Tag.swift:95-121 valueOf with unknown-tag cache).
"""

from __future__ import annotations

_BLOCK_TAGS = [
    "html", "head", "body", "frameset", "script", "noscript", "style", "meta",
    "link", "title", "frame", "noframes", "noembed", "section", "nav", "aside",
    "hgroup", "header", "footer", "p", "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "pre", "listing", "div", "blockquote", "hr", "address",
    "figure", "figcaption", "form", "fieldset", "center", "dir", "applet",
    "marquee", "ins", "del", "s", "dl", "dt", "dd", "li", "table", "caption",
    "thead", "tfoot", "tbody", "colgroup", "col", "tr", "th", "td", "video",
    "audio", "canvas", "details", "menu", "plaintext", "template", "article",
    "main", "svg", "math",
]
_INLINE_TAGS = [
    "object", "base", "font", "tt", "i", "b", "u", "big", "small", "em",
    "strong", "dfn", "code", "samp", "kbd", "var", "cite", "abbr", "time",
    "acronym", "mark", "ruby", "rt", "rp", "rb", "a", "img", "br", "wbr",
    "map", "q", "sub", "sup", "bdo", "iframe", "embed", "span", "input",
    "select", "textarea", "label", "button", "optgroup", "option", "legend",
    "datalist", "keygen", "output", "progress", "meter", "area", "param",
    "source", "track", "summary", "command", "device", "basefont", "bgsound",
    "menuitem", "data", "bdi",
]
_EMPTY_TAGS = {
    "meta", "link", "base", "frame", "img", "br", "wbr", "embed", "hr",
    "input", "keygen", "col", "command", "device", "area", "basefont",
    "bgsound", "menuitem", "param", "source", "track",
}
_FORMAT_AS_INLINE = {
    "title", "a", "p", "h1", "h2", "h3", "h4", "h5", "h6", "pre", "address",
    "li", "th", "td", "script", "style", "ins", "del", "s",
}
_PRESERVE_WHITESPACE = {"pre", "plaintext", "title", "textarea"}
_FORM_LISTED = {
    "button", "fieldset", "input", "keygen", "object", "output", "select",
    "textarea",
}
_FORM_SUBMIT = {"input", "keygen", "object", "select", "textarea"}


class Tag:
    __slots__ = (
        "name", "normal_name", "is_block", "format_as_block",
        "can_contain_inline", "empty", "self_closing", "preserve_whitespace",
        "form_list", "form_submit", "known",
    )

    def __init__(self, name: str, *, is_block: bool = True,
                 format_as_block: bool = True, can_contain_inline: bool = True,
                 empty: bool = False, self_closing: bool = False,
                 preserve_whitespace: bool = False, form_list: bool = False,
                 form_submit: bool = False, known: bool = True) -> None:
        self.name = name
        self.normal_name = name.lower()
        self.is_block = is_block
        self.format_as_block = format_as_block
        self.can_contain_inline = can_contain_inline
        self.empty = empty
        self.self_closing = self_closing
        self.preserve_whitespace = preserve_whitespace
        self.form_list = form_list
        self.form_submit = form_submit
        self.known = known

    def is_self_closing(self) -> bool:
        return self.empty or self.self_closing

    def is_inline(self) -> bool:
        return not self.is_block

    def __repr__(self) -> str:  # pragma: no cover
        return f"Tag({self.name!r})"

    def __eq__(self, other: object) -> bool:
        if self is other:
            return True
        if not isinstance(other, Tag):
            return NotImplemented
        return (self.name == other.name and self.empty == other.empty
                and self.is_block == other.is_block)

    def __hash__(self) -> int:
        return hash(self.name)


def _build_registry() -> dict[str, Tag]:
    reg: dict[str, Tag] = {}
    for name in _BLOCK_TAGS:
        reg[name] = Tag(name, is_block=True, format_as_block=True)
    for name in _INLINE_TAGS:
        reg[name] = Tag(name, is_block=False, format_as_block=False)
    for name, tag in reg.items():
        if name in _EMPTY_TAGS:
            tag.empty = True
            tag.can_contain_inline = False
        if name in _FORMAT_AS_INLINE:
            tag.format_as_block = False
        if name in _PRESERVE_WHITESPACE:
            tag.preserve_whitespace = True
        if name in _FORM_LISTED:
            tag.form_list = True
        if name in _FORM_SUBMIT:
            tag.form_submit = True
    return reg


_REGISTRY = _build_registry()

# Bounded cache for unknown tags (reference: Tag.swift:20-22,117-121).
_UNKNOWN_CACHE: dict[tuple[str, bool], Tag] = {}
_UNKNOWN_CACHE_MAX = 512

# self-closing variants cached separately — NEVER mutate an interned
# Tag (reference keeps UnknownTagCache.selfClosingTags apart too)
_SELF_CLOSING_CACHE: dict[str, Tag] = {}


def as_self_closing(tag: Tag) -> Tag:
    """A copy of ``tag`` with self_closing=True (cached). Used when a
    non-void tag appears as <tag/> so only THAT element serializes
    self-closing, not every future use of the interned tag."""
    if tag.is_self_closing():
        return tag
    cached = _SELF_CLOSING_CACHE.get(tag.name)
    if cached is not None:
        return cached
    copy = Tag(tag.name, is_block=tag.is_block,
               format_as_block=tag.format_as_block,
               can_contain_inline=tag.can_contain_inline,
               empty=tag.empty, self_closing=True,
               preserve_whitespace=tag.preserve_whitespace,
               form_list=tag.form_list, form_submit=tag.form_submit,
               known=tag.known)
    if len(_SELF_CLOSING_CACHE) < _UNKNOWN_CACHE_MAX:
        _SELF_CLOSING_CACHE[tag.name] = copy
    return copy


def tag_for(name: str, preserve_case: bool = False) -> Tag:
    """Interned Tag lookup, case-normalizing unless preserve_case.

    Unknown tags: not block, not empty, can contain anything (reference
    Tag.swift valueOf: unknown tags are registered non-block, known=false).
    """
    if not preserve_case:
        name = name.lower()
    tag = _REGISTRY.get(name)
    if tag is not None:
        return tag
    lower = name.lower()
    base = _REGISTRY.get(lower)
    key = (name, preserve_case)
    cached = _UNKNOWN_CACHE.get(key)
    if cached is not None:
        return cached
    if base is not None:
        # case-preserved variant of a known tag
        tag = Tag(name, is_block=base.is_block,
                  format_as_block=base.format_as_block,
                  can_contain_inline=base.can_contain_inline, empty=base.empty,
                  preserve_whitespace=base.preserve_whitespace,
                  form_list=base.form_list, form_submit=base.form_submit,
                  known=True)
    else:
        # reference Tag.swift:238-241 — unknown tags take the block-tag
        # trait set with only isBlock cleared (formatAsBlock stays true)
        tag = Tag(name, is_block=False, format_as_block=True, known=False)
    if len(_UNKNOWN_CACHE) < _UNKNOWN_CACHE_MAX:
        _UNKNOWN_CACHE[key] = tag
    return tag


def is_known_tag(name: str) -> bool:
    return name in _REGISTRY

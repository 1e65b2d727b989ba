"""Whitelist + Cleaner: boilerplate/sanitization (the north-star transform).

Parity targets: /root/reference/Sources/Whitelist.swift (presets :91-185,
builders :209-604, isSafeTag/safeAttribute/protocol/CSS rules :606-1004),
Cleaner.swift:33-140 (shell copy + CleaningVisitor),
SwiftSoup.swift:392-447 (clean() + text-only &nbsp; normalization).

In the Ray pipeline the compiled Whitelist lives in actor state
(soupflow.extract.ExtractActor.__init__), one per worker process.
"""

from __future__ import annotations

import re
from typing import Optional

from .dom import (Attributes, Comment, DataNode, Document, Element, Node,
                  OutputSettings, TextNode)
from .parser import parse_body_fragment
from .tags import tag_for
from .textutil import resolve_url

_WS_STR = " \t\n\r\f"


class Whitelist:
    """Sanitization policy: allowed tags/attrs, per-tag URL protocols,
    enforced attributes, CSS property allow-lists."""

    def __init__(self) -> None:
        self.tag_names: set[str] = set()
        self.attributes: dict[str, set[str]] = {}
        self.css_properties: dict[str, set[str]] = {}
        self.enforced: dict[str, dict[str, str]] = {}
        self.protocols: dict[str, dict[str, set[str]]] = {}
        self.preserve_relative_links = False
        self.url_whitespace_mode = "allow"  # strict | trim | allow

    # -- presets ---------------------------------------------------------
    @staticmethod
    def none() -> "Whitelist":
        return Whitelist()

    @staticmethod
    def simple_text() -> "Whitelist":
        return Whitelist().add_tags("b", "em", "i", "strong", "u")

    @staticmethod
    def basic() -> "Whitelist":
        return (Whitelist()
                .add_tags("a", "b", "blockquote", "br", "cite", "code",
                          "dd", "dl", "dt", "em", "i", "li", "ol", "p",
                          "pre", "q", "small", "span", "strike", "strong",
                          "sub", "sup", "u", "ul")
                .add_attributes("a", "href")
                .add_attributes("blockquote", "cite")
                .add_attributes("q", "cite")
                .add_protocols("a", "href", "ftp", "http", "https", "mailto")
                .add_protocols("blockquote", "cite", "http", "https")
                .add_protocols("cite", "cite", "http", "https")
                .add_enforced_attribute("a", "rel", "nofollow"))

    @staticmethod
    def basic_with_images() -> "Whitelist":
        return (Whitelist.basic()
                .add_tags("img")
                .add_attributes("img", "align", "alt", "height", "src",
                                "title", "width")
                .add_protocols("img", "src", "http", "https"))

    @staticmethod
    def relaxed() -> "Whitelist":
        return (Whitelist()
                .add_tags("a", "b", "blockquote", "br", "caption", "cite",
                          "code", "col", "colgroup", "dd", "div", "dl",
                          "dt", "em", "h1", "h2", "h3", "h4", "h5", "h6",
                          "i", "img", "li", "ol", "p", "pre", "q", "small",
                          "span", "strike", "strong", "sub", "sup", "table",
                          "tbody", "td", "tfoot", "th", "thead", "tr", "u",
                          "ul")
                .add_attributes("a", "href", "title")
                .add_attributes("blockquote", "cite")
                .add_attributes("col", "span", "width")
                .add_attributes("colgroup", "span", "width")
                .add_attributes("img", "align", "alt", "height", "src",
                                "title", "width")
                .add_attributes("ol", "start", "type")
                .add_attributes("q", "cite")
                .add_attributes("table", "summary", "width")
                .add_attributes("td", "abbr", "axis", "colspan", "rowspan",
                                "width")
                .add_attributes("th", "abbr", "axis", "colspan", "rowspan",
                                "scope", "width")
                .add_attributes("ul", "type")
                .add_protocols("a", "href", "ftp", "http", "https",
                               "mailto")
                .add_protocols("blockquote", "cite", "http", "https")
                .add_protocols("cite", "cite", "http", "https")
                .add_protocols("img", "src", "http", "https")
                .add_protocols("q", "cite", "http", "https"))

    @staticmethod
    def by_name(name: str) -> "Whitelist":
        return {
            "none": Whitelist.none,
            "simpleText": Whitelist.simple_text,
            "simple_text": Whitelist.simple_text,
            "basic": Whitelist.basic,
            "basicWithImages": Whitelist.basic_with_images,
            "basic_with_images": Whitelist.basic_with_images,
            "relaxed": Whitelist.relaxed,
        }[name]()

    # -- builders --------------------------------------------------------
    def add_tags(self, *tags: str) -> "Whitelist":
        for tag in tags:
            self.tag_names.add(tag.lower())
        return self

    def remove_tags(self, *tags: str) -> "Whitelist":
        for tag in tags:
            t = tag.lower()
            if t in self.tag_names:
                self.tag_names.discard(t)
                self.attributes.pop(t, None)
                self.enforced.pop(t, None)
                self.protocols.pop(t, None)
        return self

    def add_attributes(self, tag: str, *keys: str) -> "Whitelist":
        tag = tag.lower()
        self.attributes.setdefault(tag, set()).update(
            k.lower() for k in keys)
        return self

    def remove_attributes(self, tag: str, *keys: str) -> "Whitelist":
        tag = tag.lower()
        keyset = {k.lower() for k in keys}
        if tag == ":all":
            for t in list(self.attributes):
                self.attributes[t] -= keyset
                if not self.attributes[t]:
                    del self.attributes[t]
        elif tag in self.attributes:
            self.attributes[tag] -= keyset
            if not self.attributes[tag]:
                del self.attributes[tag]
        return self

    def add_css_properties(self, tag: str, *props: str) -> "Whitelist":
        tag = tag.lower()
        self.css_properties.setdefault(tag, set()).update(
            p.lower() for p in props)
        return self

    def remove_css_properties(self, tag: str, *props: str) -> "Whitelist":
        tag = tag.lower()
        propset = {p.lower() for p in props}
        if tag in self.css_properties:
            self.css_properties[tag] -= propset
            if not self.css_properties[tag]:
                del self.css_properties[tag]
        return self

    def add_enforced_attribute(self, tag: str, key: str,
                               value: str) -> "Whitelist":
        self.enforced.setdefault(tag.lower(), {})[key.lower()] = value
        return self

    def remove_enforced_attribute(self, tag: str, key: str) -> "Whitelist":
        tag = tag.lower()
        if tag in self.enforced:
            self.enforced[tag].pop(key.lower(), None)
            if not self.enforced[tag]:
                del self.enforced[tag]
        return self

    def add_protocols(self, tag: str, key: str,
                      *protocols: str) -> "Whitelist":
        attr_map = self.protocols.setdefault(tag.lower(), {})
        attr_map.setdefault(key.lower(), set()).update(
            p.lower() for p in protocols)
        return self

    def remove_protocols(self, tag: str, key: str,
                         *protocols: str) -> "Whitelist":
        tag, key = tag.lower(), key.lower()
        if tag in self.protocols and key in self.protocols[tag]:
            self.protocols[tag][key] -= {p.lower() for p in protocols}
            if not self.protocols[tag][key]:
                del self.protocols[tag][key]
        return self

    def set_preserve_relative_links(self, preserve: bool) -> "Whitelist":
        self.preserve_relative_links = preserve
        return self

    def set_url_whitespace_mode(self, mode: str) -> "Whitelist":
        assert mode in ("strict", "trim", "allow")
        self.url_whitespace_mode = mode
        return self

    def is_text_only(self) -> bool:
        return not self.tag_names

    # -- policy checks ---------------------------------------------------
    def is_safe_tag(self, tag: str) -> bool:
        return tag.lower() in self.tag_names

    def _is_safe_attribute(self, tag_name: str, el: Element, key: str,
                           value: str) -> bool:
        allowed = self.attributes.get(tag_name)
        if allowed is not None and key in allowed:
            tag_protocols = self.protocols.get(tag_name, {})
            protos = tag_protocols.get(key)
            if protos is not None:
                return self._test_valid_protocol(el, value, protos)
            return True
        return tag_name != ":all" and \
            self._is_safe_attribute(":all", el, key, value)

    def safe_attribute(self, tag_name: str, el: Element, key: str,
                       value: Optional[str]) -> Optional[tuple[str, str]]:
        """Return (key, possibly-rewritten value) if allowed, else None."""
        raw = value or ""
        lkey = key.lower()
        if not self._is_safe_attribute(tag_name, el, lkey, raw):
            return None
        if lkey == "style":
            allowed_props = self._configured_css_properties(tag_name)
            if allowed_props is not None:
                sanitized = self._sanitize_style(raw, allowed_props)
                if sanitized is None:
                    return None
                return (key, sanitized)
        if not self._is_url_attribute(tag_name, lkey):
            return (key, raw)
        candidate = raw.strip(_WS_STR) if el.base_uri else raw
        if not self.preserve_relative_links and \
                self._should_resolve(candidate):
            resolved = resolve_url(el.base_uri, candidate)
            if resolved:
                return (key, resolved)
        out = raw.strip(_WS_STR) if self.url_whitespace_mode == "trim" \
            else raw
        return (key, out)

    def _is_url_attribute(self, tag_name: str, key: str) -> bool:
        if key in self.protocols.get(tag_name, {}):
            return True
        return tag_name != ":all" and self._is_url_attribute(":all", key)

    @staticmethod
    def _should_resolve(value: str) -> bool:
        # only absolutize root-relative / scheme-qualified values
        if not value or value[0] in _WS_STR or value[-1] in _WS_STR:
            return False
        if value.startswith("/"):
            return True
        return bool(re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", value))

    def _test_valid_protocol(self, el: Element, value: str,
                             protocols: set[str]) -> bool:
        # validation always resolves against base (unlike output rewriting,
        # which honors preserve_relative_links) — Whitelist.swift:959-986
        candidate = value.strip(_WS_STR) if el.base_uri else value
        checked = resolve_url(el.base_uri, candidate)
        if not checked:
            checked = value if self.url_whitespace_mode == "strict" \
                else value.strip(_WS_STR)
        lower = checked.lower()
        for proto in protocols:
            if proto == "#":
                if checked.startswith("#") and \
                        not re.search(r"\s", checked):
                    return True
                continue
            if lower.startswith(proto + ":"):
                return True
        return False

    def get_enforced_attributes(self, tag_name: str) -> dict[str, str]:
        return dict(self.enforced.get(tag_name.lower(), {}))

    # -- style sanitization ---------------------------------------------
    def _configured_css_properties(self,
                                   tag_name: str) -> Optional[set[str]]:
        tag_props = self.css_properties.get(tag_name)
        all_props = self.css_properties.get(":all") \
            if tag_name != ":all" else None
        if tag_props is None and all_props is None:
            return None
        return (tag_props or set()) | (all_props or set())

    @staticmethod
    def _strip_css_comments(style: str) -> str:
        # quote-aware: /*...*/ inside quoted strings is NOT a comment
        out: list[str] = []
        i = 0
        n = len(style)
        quote = None
        escaped = False
        while i < n:
            ch = style[i]
            if quote is not None:
                out.append(ch)
                if escaped:
                    escaped = False
                elif ch == "\\":
                    escaped = True
                elif ch == quote:
                    quote = None
                i += 1
                continue
            if ch in "\"'":
                quote = ch
                out.append(ch)
                i += 1
                continue
            if ch == "/" and i + 1 < n and style[i + 1] == "*":
                j = style.find("*/", i + 2)
                i = n if j == -1 else j + 2
                continue
            out.append(ch)
            i += 1
        return "".join(out)

    def _sanitize_style(self, style: str,
                        allowed: set[str]) -> Optional[str]:
        safe = []
        for name, val in self._parse_declarations(style):
            lname = name.lower()
            if lname not in allowed:
                continue
            if lname in ("behavior", "-moz-binding"):
                continue
            norm = re.sub(r"\s+", "",
                          self._strip_css_comments(val).lower())
            if "expression(" in norm or "@import" in norm or \
                    "url(" in norm:
                continue
            safe.append(f"{lname}:{val}")
        if not safe:
            return None
        return "; ".join(safe)

    def _parse_declarations(self, style: str) -> list[tuple[str, str]]:
        style = self._strip_css_comments(style)
        decls: list[tuple[str, str]] = []
        buf: list[str] = []
        quote = None
        escaped = False
        depth = 0
        for ch in style:
            if quote is not None:
                buf.append(ch)
                if escaped:
                    escaped = False
                elif ch == "\\":
                    escaped = True
                elif ch == quote:
                    quote = None
                continue
            if ch in "\"'":
                quote = ch
                buf.append(ch)
            elif ch == "(":
                depth += 1
                buf.append(ch)
            elif ch == ")":
                depth = max(0, depth - 1)
                buf.append(ch)
            elif ch == ";" and depth == 0:
                d = self._parse_declaration("".join(buf))
                if d:
                    decls.append(d)
                buf.clear()
            else:
                buf.append(ch)
        d = self._parse_declaration("".join(buf))
        if d:
            decls.append(d)
        return decls

    @staticmethod
    def _parse_declaration(decl: str) -> Optional[tuple[str, str]]:
        decl = decl.strip()
        if not decl:
            return None
        quote = None
        escaped = False
        depth = 0
        colon = -1
        for i, ch in enumerate(decl):
            if quote is not None:
                if escaped:
                    escaped = False
                elif ch == "\\":
                    escaped = True
                elif ch == quote:
                    quote = None
                continue
            if ch in "\"'":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth = max(0, depth - 1)
            elif ch == ":" and depth == 0:
                colon = i
                break
        if colon < 0:
            return None
        name = decl[:colon].strip()
        value = decl[colon + 1:].strip()
        if not name or not value:
            return None
        return (name, value)


class Cleaner:
    def __init__(self, body_whitelist: Whitelist,
                 head_whitelist: Optional[Whitelist] = None) -> None:
        self.body_whitelist = body_whitelist
        self.head_whitelist = head_whitelist

    def clean(self, dirty: Document) -> Document:
        clean_doc = Document.create_shell(dirty.base_uri)
        if self.head_whitelist is not None:
            dirt_head, clean_head = dirty.head(), clean_doc.head()
            if dirt_head is not None and clean_head is not None:
                self._copy_safe_nodes(dirt_head, clean_head,
                                      self.head_whitelist)
        dirt_body, clean_body = dirty.body(), clean_doc.body()
        if dirt_body is not None and clean_body is not None:
            self._copy_safe_nodes(dirt_body, clean_body,
                                  self.body_whitelist)
        return clean_doc

    def is_valid(self, dirty: Document) -> bool:
        clean_doc = Document.create_shell(dirty.base_uri)
        discarded = self._copy_safe_nodes(dirty.body(), clean_doc.body(),
                                          self.body_whitelist)
        return discarded == 0

    def _copy_safe_nodes(self, source: Element, dest: Element,
                         whitelist: Whitelist) -> int:
        """Iterative head/tail DOM walk copying whitelisted content
        (reference Cleaner.CleaningVisitor)."""
        num_discarded = 0
        destination = dest

        # (node, is_tail) stack-based traversal with head/tail events
        stack: list[tuple[Node, bool]] = [(source, False)]
        while stack:
            node, is_tail = stack.pop()
            if is_tail:
                if isinstance(node, Element) and \
                        whitelist.is_safe_tag(node.tag_name()):
                    destination = destination.parent_node \
                        if isinstance(destination.parent_node, Element) \
                        else destination
                continue
            stack.append((node, True))
            for child in reversed(node.child_nodes):
                stack.append((child, False))
            if isinstance(node, Element):
                if whitelist.is_safe_tag(node.tag_name()):
                    dest_child, discarded = self._create_safe_element(
                        node, whitelist)
                    destination.append_child_node(dest_child)
                    num_discarded += discarded
                    destination = dest_child
                elif node is not source:
                    num_discarded += 1
            elif type(node) is TextNode or \
                    node.node_name() == "#cdata":
                destination.append_child_node(
                    TextNode(node.get_whole_text(), node.base_uri))
            elif isinstance(node, DataNode):
                parent = node.parent_node
                if isinstance(parent, Element) and \
                        whitelist.is_safe_tag(parent.node_name()):
                    destination.append_child_node(
                        DataNode(node.get_whole_data(), node.base_uri))
                else:
                    num_discarded += 1
            else:
                # comments, xml declarations, doctypes: dropped
                num_discarded += 1
        return num_discarded

    def _create_safe_element(self, source_el: Element,
                             whitelist: Whitelist) \
            -> tuple[Element, int]:
        source_tag = source_el.tag_name()
        dest_attrs = Attributes()
        discarded = 0
        if source_el.attributes is not None:
            for key, value in source_el.attributes.items():
                safe = whitelist.safe_attribute(source_tag, source_el,
                                                key, value)
                if safe is not None:
                    dest_attrs.put(safe[0],
                                   safe[1] if value is not None else None)
                else:
                    discarded += 1
        for key, value in whitelist.get_enforced_attributes(
                source_tag).items():
            dest_attrs.put(key, value)
        dest = Element(tag_for(source_tag), source_el.base_uri,
                       dest_attrs if len(dest_attrs) else None)
        return dest, discarded


_NBSP_NUM = re.compile(r"&#(?:160|x[aA]0);")


def clean(body_html: str, base_uri: str = "",
          whitelist: Optional[Whitelist] = None,
          output_settings: Optional[OutputSettings] = None) -> str:
    """Safe HTML from untrusted input (reference SwiftSoup.clean)."""
    whitelist = whitelist or Whitelist.basic()
    dirty = parse_body_fragment(body_html, base_uri)
    if output_settings is not None:
        dirty.output_settings = output_settings
    cleaner = Cleaner(whitelist)
    cleaned = cleaner.clean(dirty)
    if output_settings is not None:
        cleaned.output_settings = output_settings
    html = cleaned.body().html()
    if whitelist.is_text_only():
        html = html.replace("&nbsp;", " ")
        html = _NBSP_NUM.sub(" ", html)
    return html


def is_valid(body_html: str,
             whitelist: Optional[Whitelist] = None) -> bool:
    whitelist = whitelist or Whitelist.basic()
    dirty = parse_body_fragment(body_html, "")
    return Cleaner(whitelist).is_valid(dirty)

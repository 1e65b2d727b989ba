"""XML tree builder: flat insertion, no HTML insertion modes.

Parity target: /root/reference/Sources/XmlTreeBuilder.swift:19-193.
Uses the same tokenizer; every element nests under the current element,
doctype → DocumentType, comments may re-parse as XmlDeclaration (<?...?>).
"""

from __future__ import annotations

from typing import Optional

from .dom import (Comment, Document, DocumentType, Element, Node, TextNode,
                  XmlDeclaration)
from .tags import tag_for
from .tokenizer import (CharacterReader, CharacterTok, CommentTok,
                        DoctypeTok, EOFTok, TagTok, Tokeniser)
from .treebuilder import PRESERVE_CASE, ParseSettings


class XmlTreeBuilder:
    def __init__(self, settings: Optional[ParseSettings] = None) -> None:
        self.settings = settings or PRESERVE_CASE
        self.doc: Optional[Document] = None
        self.stack: list[Element] = []
        self.base_uri = ""

    def parse(self, xml: str, base_uri: str = "") -> Document:
        self.doc = Document(base_uri)
        self.doc.output_settings.syntax = "xml"
        self.base_uri = base_uri
        self.stack = []
        reader = CharacterReader(xml)
        tokeniser = Tokeniser(reader)
        while True:
            token = tokeniser.read()
            self._process(token)
            if isinstance(token, EOFTok):
                break
        from .dom import _DOM_EPOCH
        _DOM_EPOCH[0] += 1  # builder appends are epoch-bump-free
        return self.doc

    def parse_fragment(self, fragment: str,
                       base_uri: str = "") -> list[Node]:
        doc = self.parse(fragment, base_uri)
        return list(doc.child_nodes)

    def _current(self):
        return self.stack[-1] if self.stack else self.doc

    def _process(self, t) -> None:
        if isinstance(t, TagTok) and t.start:
            self._insert_start(t)
        elif isinstance(t, TagTok):
            self._pop_to_close(t)
        elif isinstance(t, CommentTok):
            self._insert_comment(t)
        elif isinstance(t, CharacterTok):
            self._current().append_child_fast(
                TextNode(t.data, self.base_uri))
        elif isinstance(t, DoctypeTok):
            dt = DocumentType(self.settings.normalise_tag(t.get_name()),
                              t.get_public_id(), t.get_system_id(),
                              self.base_uri)
            self._current().append_child_fast(dt)

    def _insert_start(self, t: TagTok) -> None:
        tag = tag_for(self.settings.normalise_tag(t.name or ""),
                      self.settings.preserve_tag_case)
        if t.self_closing and not tag.is_self_closing():
            # per-element copy — never mutate the interned registry Tag
            # (reference keeps a separate self-closing unknown-tag cache,
            # Tag.swift UnknownTagCache.selfClosingTags)
            from .tags import as_self_closing
            tag = as_self_closing(tag)
        el = Element(tag, self.base_uri)
        for k, v in self.settings.normalise_attributes(t.attrs).items():
            el._attrs().put(k, v)
        self._current().append_child_fast(el)
        if not t.self_closing:
            self.stack.append(el)

    def _insert_comment(self, t: CommentTok) -> None:
        data = t.get_data()
        node: Node = Comment(data, self.base_uri)
        if t.bogus and data.startswith("!") or \
                (data.startswith("?") and data.endswith("?")):
            # <?xml ... ?> declaration: re-parse name + attributes
            body = data.strip("?!")
            decl_doc = XmlTreeBuilder().parse("<" + body + ">",
                                              self.base_uri)
            if decl_doc.children():
                el = decl_doc.children()[0]
                node = XmlDeclaration(
                    self.settings.normalise_tag(el.tag_name()),
                    self.base_uri, data.startswith("!"))
                if el.attributes is not None:
                    node.attributes = el.attributes.clone()
        self._current().append_child_fast(node)

    def _pop_to_close(self, t: TagTok) -> None:
        name = self.settings.normalise_tag(t.name or "")
        first_found = None
        for el in reversed(self.stack):
            if el.node_name() == name:
                first_found = el
                break
        if first_found is None:
            return
        while self.stack:
            el = self.stack.pop()
            if el is first_found:
                break

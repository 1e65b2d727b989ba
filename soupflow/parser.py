"""Parser entry points: parse / parse_body_fragment / parse_fragment /
XML parse dispatch.

Parity targets: /root/reference/Sources/SwiftSoup.swift:20-43,235-254
(format sniff + dispatch), Parser.swift:112-231 (parse/fragment entries).
"""

from __future__ import annotations

from typing import Optional

from .dom import Document, Element, Node, TextNode
from .treebuilder import (HTML_DEFAULT, PRESERVE_CASE, HtmlTreeBuilder,
                          ParseSettings)


def parse(html: str, base_uri: str = "",
          settings: Optional[ParseSettings] = None,
          errors: Optional[list] = None) -> Document:
    """Parse HTML (or sniffed XML) into a Document."""
    if _looks_like_xml(html):
        return parse_xml(html, base_uri)
    tb = HtmlTreeBuilder(settings)
    return tb.parse(html, base_uri, errors)


def parse_html(html: str, base_uri: str = "",
               settings: Optional[ParseSettings] = None) -> Document:
    tb = HtmlTreeBuilder(settings)
    return tb.parse(html, base_uri)


def _looks_like_xml(html: str) -> bool:
    head = html.lstrip()[:6]
    return head.startswith("<?xml")


def parse_xml(xml: str, base_uri: str = "") -> Document:
    from .xmlparser import XmlTreeBuilder
    return XmlTreeBuilder().parse(xml, base_uri)


def parse_body_fragment(body_html: str, base_uri: str = "") -> Document:
    """Parse a body fragment into a shell document
    (reference Parser.swift:207-231)."""
    doc = Document.create_shell(base_uri)
    body = doc.body()
    nodes = parse_fragment_for_context(body_html, body, base_uri)
    # remove-then-insert, reversed, as nodes may already be attached to body
    for node in list(nodes):
        node.remove()
    for node in nodes:
        body.append_child_node(node)
    return doc


def parse_fragment_for_context(fragment: str, context: Optional[Element],
                               base_uri: str = "",
                               errors: Optional[list] = None) -> list[Node]:
    tb = HtmlTreeBuilder()
    return tb.parse_fragment(fragment, context, base_uri, errors)


def unescape_entities(s: str, in_attribute: bool = False) -> str:
    from .entities import unescape
    return unescape(s, strict=False, in_attribute=in_attribute)

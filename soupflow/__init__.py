"""soupflow — a Ray-Data-native HTML main-content extraction engine.

Re-implements the query and data-processing capabilities of the reference
(scinfu/SwiftSoup @ /root/reference, read-only) as a fresh, idiomatic
Ray Data design: per-document parse/select/clean kernels run inside
``ray.data.Dataset.map_batches`` over zero-copy Arrow batches; stateful
stages (compiled selectors, whitelists, scorers) live in actor pools.

Core per-document library (this package root):
    parse / select / clean / text-extraction over a transient DOM.
Ray pipeline layers: soupflow.extract, soupflow.pipeline, soupflow.data.*
"""

from .elements import Elements
from .dom import (Attributes, Comment, DataNode, Document, DocumentType,
                  Element, FormElement, Node, OutputSettings, TextNode,
                  XmlDeclaration)
from .parser import (parse, parse_body_fragment, parse_fragment_for_context,
                     parse_html, parse_xml, unescape_entities)
from .tags import Tag, tag_for

__version__ = "0.2.0"

__all__ = [
    "Elements",
    "Attributes", "Comment", "DataNode", "Document", "DocumentType",
    "Element", "FormElement", "Node", "OutputSettings", "TextNode",
    "XmlDeclaration", "Tag", "tag_for", "parse", "parse_html", "parse_xml",
    "parse_body_fragment", "parse_fragment_for_context",
    "unescape_entities", "clean", "is_valid",
]


def clean(body_html: str, base_uri: str = "", whitelist=None,
          output_settings=None) -> str:
    from .cleaner import clean as _clean
    return _clean(body_html, base_uri, whitelist, output_settings)


def is_valid(body_html: str, whitelist=None) -> bool:
    from .cleaner import is_valid as _is_valid
    return _is_valid(body_html, whitelist)

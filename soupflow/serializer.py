"""DOM → HTML serialization (outerHtml / html) with pretty-printing.

Parity targets: /root/reference/Sources/Node.swift:987-1127 (outerHtml
walk + indent), Element.swift:2682-2744 (head/tail + format-as-block
indent rules, void tags always serialize as ``<img />``),
TextNode.swift:281-338, Comment.swift:74-85, DocumentType.swift:95-130,
DataNode.swift:197-202, XmlDeclaration.swift:69-82,
Attribute.swift:152-305 (boolean-attribute collapsing).
"""

from __future__ import annotations

from .dom import (CDataNode, Comment, DataNode, Document, DocumentType,
                  Element, Node, OutputSettings, TextNode, XmlDeclaration)
from .entities import escape
from .textutil import is_blank

BOOLEAN_ATTRIBUTES = frozenset((
    "allowfullscreen", "async", "autofocus", "checked", "compact",
    "controls", "crossorigin", "declare", "default", "defer", "disabled",
    "formnovalidate", "hidden", "inert", "ismap", "itemscope", "multiple",
    "muted", "nohref", "noresize", "noshade", "novalidate", "nowrap",
    "open", "readonly", "required", "reversed", "seamless", "selected",
    "sortable", "truespeed", "typemustmatch"))


def _output_settings(node: Node) -> OutputSettings:
    doc = node.owner_document()
    return doc.output_settings if doc is not None else OutputSettings()


def serialize(node: Node, out: OutputSettings | None = None) -> str:
    out = out or _output_settings(node)
    accum: list[str] = []
    if isinstance(node, Document):
        for child in node.child_nodes:
            _outer(child, accum, 0, out)
    else:
        _outer(node, accum, 0, out)
    return "".join(accum)


def serialize_children(el: Element, out: OutputSettings | None = None) -> str:
    """Inner HTML; each child starts at depth 0 (matches reference
    Element.html2)."""
    out = out or _output_settings(el)
    accum: list[str] = []
    for child in el.child_nodes:
        _outer(child, accum, 0, out)
    result = "".join(accum)
    if out.pretty_print:
        result = result.strip()
    return result


def _outer(node: Node, accum: list[str], depth: int,
           out: OutputSettings) -> None:
    _head(node, accum, depth, out)
    for child in node.child_nodes:
        _outer(child, accum, depth + 1, out)
    _tail(node, accum, depth, out)


def _indent(accum: list[str], depth: int, out: OutputSettings) -> None:
    accum.append("\n" + " " * (depth * out.indent_amount))


def attributes_html(node: Node, out: OutputSettings | None = None) -> str:
    out = out or OutputSettings()
    accum: list[str] = []
    _attrs_html(node, accum, out)
    return "".join(accum)


def _attrs_html(node: Node, accum: list[str], out: OutputSettings) -> None:
    if node.attributes is None:
        return
    for key, value in node.attributes.items():
        accum.append(" ")
        accum.append(key)
        # xml syntax always writes ="" (reference DocumentTest
        # testHtmlAndXmlSyntax: <img async=""> in xml, <img async> in html)
        collapse = out.syntax == "html" and (
            value is None or
            (value == "" and key.lower() in BOOLEAN_ATTRIBUTES))
        if not collapse:
            accum.append('="')
            accum.append(escape(value or "", out.escape_mode, out.charset,
                                in_attribute=True))
            accum.append('"')


def _head(node: Node, accum: list[str], depth: int,
          out: OutputSettings) -> None:
    if isinstance(node, Element):
        tag = node.tag
        if out.pretty_print and (tag.format_as_block or
                                 (isinstance(node.parent_node, Element) and
                                  node.parent_node.tag.format_as_block) or
                                 out.outline):
            if accum:
                _indent(accum, depth, out)
        accum.append("<")
        accum.append(tag.name)
        _attrs_html(node, accum, out)
        if not node.child_nodes and tag.is_self_closing():
            accum.append(" />")
        else:
            accum.append(">")
        return
    if isinstance(node, (TextNode, CDataNode)):
        parent = node.parent_node
        if out.pretty_print and (
                (node.sibling_index == 0 and isinstance(parent, Element)
                 and parent.tag.format_as_block
                 and not is_blank(node.get_whole_text()))
                or (out.outline and len(node.sibling_nodes()) > 0
                    and not is_blank(node.get_whole_text()))):
            _indent(accum, depth, out)
        normalise_white = out.pretty_print and isinstance(parent, Element) \
            and not Element._preserve_whitespace(parent)
        accum.append(escape(node.get_whole_text(), out.escape_mode,
                            out.charset, in_attribute=False,
                            normalise_white=normalise_white))
        return
    if isinstance(node, DataNode):
        accum.append(node.get_whole_data())
        return
    if isinstance(node, Comment):
        if out.pretty_print:
            _indent(accum, depth, out)
        accum.append("<!--")
        accum.append(node.get_data())
        accum.append("-->")
        return
    if isinstance(node, DocumentType):
        name = node.attr("name")
        pub = node.attr("publicId")
        sys = node.attr("systemId")
        pub_sys_key = node.attr("pubSysKey")
        if out.syntax == "html" and not pub and not sys:
            accum.append("<!doctype")
        else:
            accum.append("<!DOCTYPE")
        if name:
            accum.append(" " + name)
        if not pub_sys_key and pub:
            # constructed doctype with a public id still emits PUBLIC
            # (reference DocumentTypeTest testOuterHtmlGeneration)
            pub_sys_key = "PUBLIC"
        if pub_sys_key:
            accum.append(" " + pub_sys_key)
        if pub:
            accum.append(f' "{pub}"')
        if sys:
            accum.append(f' "{sys}"')
        accum.append(">")
        return
    if isinstance(node, XmlDeclaration):
        marker = "!" if node.is_processing_instruction else "?"
        accum.append("<" + marker + node.name())
        _attrs_html(node, accum, out)
        accum.append(marker + ">")
        return
    if isinstance(node, Document):
        return
    raise TypeError(f"unserializable node: {type(node)}")


def _tail(node: Node, accum: list[str], depth: int,
          out: OutputSettings) -> None:
    if isinstance(node, Element):
        tag = node.tag
        if not (not node.child_nodes and tag.is_self_closing()):
            if out.pretty_print and node.child_nodes and (
                    tag.format_as_block or
                    (out.outline and
                     (len(node.child_nodes) > 1 or
                      (len(node.child_nodes) == 1 and
                       not isinstance(node.child_nodes[0], TextNode))))):
                _indent(accum, depth, out)
            accum.append("</")
            accum.append(tag.name)
            accum.append(">")


# -- patch-based re-serialization -------------------------------------------

def _full_source_range(node: Node):
    """The node's complete extent in the original source, or None.
    Elements need both tag ranges (start..end-tag end) unless they are
    void/self-closing childless tags (start tag IS the extent); leaf
    nodes' recorded range already covers them fully."""
    sr = node.source_range()
    if sr is None:
        return None
    if isinstance(node, Element):
        er = node.end_source_range()
        if er is not None:
            return (sr[0], er[1])
        if not node.child_nodes and node.tag.is_self_closing():
            return sr
        return None
    return sr


def _collect_patches(node: Node, ancestor_patched: bool,
                     patches: list, out: OutputSettings) -> bool:
    """DFS collecting (start, end, replacement) for the highest dirty
    nodes (reference Document.sourcePatches, Document.swift:451-491).
    Returns False when a dirty node cannot be patched (no complete
    range) — the caller must fall back to full serialization."""
    dirty = getattr(node, "_src_dirty", False)
    if dirty and not ancestor_patched:
        fr = _full_source_range(node)
        if fr is None:
            return False
        patches.append((fr[0], fr[1], serialize(node, out)))
        return True  # subtree fully covered by the replacement
    for child in node.child_nodes:
        if not _collect_patches(child, ancestor_patched, patches, out):
            return False
    return True


def patched_outer_html(doc) -> str | None:
    """Splice re-serialized dirty subtrees into the retained source
    (reference Document.patchedOuterHtmlUTF8, Document.swift:551-594).
    None when the document has no retained source or a mutation is not
    patchable; an unmodified document returns its source verbatim."""
    src = getattr(doc, "source", None)
    if src is None:
        return None
    out = doc.output_settings.clone()
    out.pretty_print = False  # replacements inline into raw source
    patches: list = []
    if not _collect_patches(doc, False, patches, out):
        return None
    if not patches:
        return src
    patches.sort(key=lambda p: p[0])
    pieces = []
    cursor = 0
    for start, end, replacement in patches:
        if start < cursor or end > len(src):
            return None  # overlapping/invalid ranges — bail
        pieces.append(src[cursor:start])
        pieces.append(replacement)
        cursor = end
    pieces.append(src[cursor:])
    return "".join(pieces)

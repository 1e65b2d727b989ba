"""DOM node model: Node / Element / Document / TextNode / DataNode /
Comment / DocumentType / XmlDeclaration / FormElement + Attributes.

Behavioral parity targets (all /root/reference/Sources/):
  Node.swift:23 (base node), Element.swift:268 (element + text semantics at
  1705-2045), Document.swift:24, TextNode.swift:18, DataNode.swift:1,
  Attributes.swift:31 (ordered attrs, case-insensitive fallback at 406-414),
  FormElement.swift:1, NodeTraversor.swift:25-49.

This is a fresh Python implementation (not a port): nodes are plain Python
objects with __slots__, traversal is iterative, and a DOM lives only inside
one Ray map_batches kernel invocation (SURVEY.md §1.2).
"""

from __future__ import annotations

from typing import Iterator, Optional

from .tags import Tag, tag_for
from .textutil import (append_normalised_whitespace, is_blank,
                       normalise_whitespace, resolve_url)


# Global DOM mutation epoch: bumped by every tree/attribute mutation
# anywhere in the process. The selector-result cache (selector.py) keys
# its validity on this — one integer increment per mutation is the whole
# hot-path cost, and any mutation conservatively invalidates all cached
# select results (reference analogue: Element.swift per-root query
# index + SLRU cache with dirty tracking, 303-367).
_DOM_EPOCH = [0]


class Attributes:
    """Ordered attribute map. Keys case-sensitive; lookups may fall back
    case-insensitively (reference Attributes.swift:406-414)."""

    __slots__ = ("_d", "_owner")

    def __init__(self) -> None:
        # value None = declared with no value (a "boolean attribute");
        # rendered as bare key, read as "" (reference BooleanAttribute.swift)
        self._d: dict[str, Optional[str]] = {}
        # owning node, for source-dirty propagation (patch serializer);
        # None for detached attribute maps
        self._owner = None

    def _owner_dirty(self) -> None:
        if self._owner is not None:
            self._owner._mark_src_dirty()

    def get(self, key: str) -> str:
        return self._d.get(key) or ""

    def get_ignore_case(self, key: str) -> str:
        if key in self._d:
            return self._d[key] or ""
        lk = key.lower()
        for k, v in self._d.items():
            if k.lower() == lk:
                return v or ""
        return ""

    def put(self, key: str, value: Optional[str]) -> None:
        self._d[key] = value
        _DOM_EPOCH[0] += 1
        self._owner_dirty()

    def put_ignore_case(self, key: str, value: Optional[str]) -> None:
        _DOM_EPOCH[0] += 1
        self._owner_dirty()
        lk = key.lower()
        for k in self._d:
            if k.lower() == lk:
                self._d[k] = value
                return
        self._d[key] = value

    def remove(self, key: str) -> None:
        self._d.pop(key, None)
        _DOM_EPOCH[0] += 1
        self._owner_dirty()

    def remove_ignore_case(self, key: str) -> None:
        _DOM_EPOCH[0] += 1
        self._owner_dirty()
        lk = key.lower()
        for k in list(self._d):
            if k.lower() == lk:
                del self._d[k]

    def has_key(self, key: str) -> bool:
        return key in self._d

    def has_key_ignore_case(self, key: str) -> bool:
        if key in self._d:
            return True
        lk = key.lower()
        return any(k.lower() == lk for k in self._d)

    def size(self) -> int:
        return len(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def __iter__(self) -> Iterator[tuple[str, str]]:
        return iter(self._d.items())

    def keys(self):
        return self._d.keys()

    def items(self):
        return self._d.items()

    def add_all(self, other: "Attributes") -> None:
        _DOM_EPOCH[0] += 1
        self._owner_dirty()
        for k, v in other._d.items():
            self._d[k] = v

    def normalize(self) -> None:
        """Lowercase all keys (used when ParseSettings lowercases attrs)."""
        self._d = {k.lower(): v for k, v in self._d.items()}
        _DOM_EPOCH[0] += 1
        self._owner_dirty()

    def clone(self) -> "Attributes":
        a = Attributes()
        a._d = dict(self._d)  # _owner stays None: detached copy
        return a

    def dataset(self) -> dict[str, str]:
        return {k[5:]: (v or "") for k, v in self._d.items()
                if k.startswith("data-") and len(k) > 5}

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Attributes):
            return NotImplemented
        return self._d == other._d

    def __repr__(self) -> str:  # pragma: no cover
        return f"Attributes({self._d!r})"


class Node:
    # _src_range/_end_src_range are set ONLY when the parse ran with
    # ParseSettings(track_source_ranges=True) — left unset otherwise so
    # the default parse pays zero per-node cost (lazy slots).
    __slots__ = ("parent_node", "child_nodes", "attributes", "base_uri",
                 "sibling_index", "_src_range", "_end_src_range",
                 "_src_dirty", "__weakref__")

    def __init__(self, base_uri: str = "") -> None:
        self.parent_node: Optional[Node] = None
        self.child_nodes: list[Node] = []
        self.attributes: Optional[Attributes] = None
        self.base_uri: str = base_uri
        self.sibling_index: int = 0

    # -- source provenance ------------------------------------------------
    def source_range(self) -> Optional[tuple]:
        """(start, end) offsets of this node's source in the original
        input (for an Element: its START tag), or None when the parse
        did not track ranges. Cf. reference Node.swift sourceRange /
        SourceRange.swift (internal there; public here)."""
        try:
            return self._src_range
        except AttributeError:
            return None

    def end_source_range(self) -> Optional[tuple]:
        """(start, end) offsets of the element's END tag, when one was
        present in the source and ranges were tracked."""
        try:
            return self._end_src_range
        except AttributeError:
            return None

    def set_source_range(self, start: int, end: int) -> None:
        self._src_range = (start, end)

    def _mark_src_dirty(self) -> None:
        """Mark this node's source projection stale (patch serializer:
        the node's subtree must be re-serialized rather than spliced
        from the original source). Lazy slot — zero cost until the
        first mutation. Also bumps the selector-cache epoch: any content
        mutation can change `:contains(...)` / text-dependent selector
        results, and an extra epoch bump only costs a cache miss."""
        self._src_dirty = True
        _DOM_EPOCH[0] += 1

    # -- identity ---------------------------------------------------------
    def node_name(self) -> str:
        raise NotImplementedError

    # -- attributes -------------------------------------------------------
    def _attrs(self) -> Attributes:
        if self.attributes is None:
            self.attributes = Attributes()
        if self.attributes._owner is None:
            self.attributes._owner = self
        return self.attributes

    def attr(self, key: str) -> str:
        if self.attributes is None:
            return ""
        v = self.attributes.get(key)
        if v:
            return v
        if self.attributes.has_key(key):
            return v
        if key.startswith("abs:"):
            return self.abs_url(key[4:])
        return self.attributes.get_ignore_case(key)

    def set_attr(self, key: str, value: str) -> "Node":
        self._attrs().put_ignore_case(key, value)
        return self

    def has_attr(self, key: str) -> bool:
        if self.attributes is None:
            return False
        if key.startswith("abs:"):
            k = key[4:]
            if self.attributes.has_key_ignore_case(k) and \
                    self.abs_url(k):
                return True
            # fall through: a literal "abs:x" attribute also counts
            # (reference Node.hasAttr, NodeTest testLiteralAbsPrefix)
        return self.attributes.has_key_ignore_case(key)

    def remove_attr(self, key: str) -> "Node":
        if self.attributes is not None:
            self.attributes.remove_ignore_case(key)
        return self

    def abs_url(self, key: str) -> str:
        if not self.has_attr(key):
            return ""
        return resolve_url(self.base_uri, self.attr(key))

    # -- tree accessors ---------------------------------------------------
    def child_node(self, i: int) -> "Node":
        return self.child_nodes[i]

    def child_node_size(self) -> int:
        return len(self.child_nodes)

    def parent(self) -> Optional["Node"]:
        return self.parent_node

    def owner_document(self) -> Optional["Document"]:
        node: Optional[Node] = self
        while node is not None:
            if isinstance(node, Document):
                return node
            node = node.parent_node
        return None

    def root(self) -> "Node":
        node: Node = self
        while node.parent_node is not None:
            node = node.parent_node
        return node

    def next_sibling(self) -> Optional["Node"]:
        p = self.parent_node
        if p is None:
            return None
        i = self.sibling_index + 1
        if i < len(p.child_nodes):
            return p.child_nodes[i]
        return None

    def previous_sibling(self) -> Optional["Node"]:
        p = self.parent_node
        if p is None or self.sibling_index <= 0:
            return None
        return p.child_nodes[self.sibling_index - 1]

    def sibling_nodes(self) -> list["Node"]:
        if self.parent_node is None:
            return []
        return [n for n in self.parent_node.child_nodes if n is not self]

    # -- mutation ---------------------------------------------------------
    def _reindex(self, start: int = 0) -> None:
        for i in range(start, len(self.child_nodes)):
            self.child_nodes[i].sibling_index = i

    def _reparent(self, child: "Node") -> None:
        if child.parent_node is not None:
            child.parent_node.remove_child(child)
        child.parent_node = self

    def append_child_fast(self, child: "Node") -> None:
        """append_child_node WITHOUT the selector-cache epoch bump —
        only for bulk construction (tree builders bump the epoch once
        per parse instead; see HtmlTreeBuilder._run_parser)."""
        # _reparent inlined (hottest call in the tree builder)
        if child.parent_node is not None:
            child.parent_node.remove_child(child)
        child.parent_node = self
        cn = self.child_nodes
        child.sibling_index = len(cn)
        cn.append(child)

    def append_child_node(self, child: "Node") -> None:
        self._reparent(child)
        child.sibling_index = len(self.child_nodes)
        self.child_nodes.append(child)
        _DOM_EPOCH[0] += 1
        self._src_dirty = True

    def add_children(self, *children: "Node") -> None:
        for c in children:
            self.append_child_node(c)

    def insert_children_at(self, index: int, children: list["Node"]) -> None:
        n = len(self.child_nodes)
        if index < 0:
            index = n + 1 + index  # -1 == append
        if not (0 <= index <= n):
            raise ValueError("insert position out of bounds")
        for c in reversed(list(children)):
            self._reparent(c)
            self.child_nodes.insert(index, c)
        self._reindex(index)
        _DOM_EPOCH[0] += 1
        self._src_dirty = True

    def has_same_value(self, other: "Node") -> bool:
        """Content equality (reference Node.hasSameValue: identical
        outer html)."""
        return self is other or self.outer_html() == other.outer_html()

    def child_nodes_copy(self) -> list["Node"]:
        """Independent deep copies of the children (reference
        Node.childNodesCopy, Node.swift:436)."""
        return [c.clone() for c in self.child_nodes]

    def remove_child(self, child: "Node") -> None:
        i = child.sibling_index
        if i < len(self.child_nodes) and self.child_nodes[i] is child:
            del self.child_nodes[i]
        else:  # defensive: index out of date
            try:
                self.child_nodes.remove(child)
                i = 0
            except ValueError:
                return
        child.parent_node = None
        self._reindex(i)
        _DOM_EPOCH[0] += 1
        self._src_dirty = True

    def remove(self) -> None:
        if self.parent_node is not None:
            self.parent_node.remove_child(self)

    def replace_with(self, new_node: "Node") -> None:
        p = self.parent_node
        if p is None:
            return
        i = self.sibling_index
        if new_node.parent_node is not None:
            new_node.parent_node.remove_child(new_node)
        p.child_nodes[i] = new_node
        new_node.parent_node = p
        new_node.sibling_index = i
        self.parent_node = None
        _DOM_EPOCH[0] += 1
        p._src_dirty = True

    def before_node(self, node: "Node") -> None:
        p = self.parent_node
        if p is not None:
            p.insert_children_at(self.sibling_index, [node])

    def after_node(self, node: "Node") -> None:
        p = self.parent_node
        if p is not None:
            p.insert_children_at(self.sibling_index + 1, [node])

    def wrap(self, html: str) -> Optional["Node"]:
        from .parser import parse_fragment_for_context
        context = self.parent_node if isinstance(self.parent_node, Element) \
            else (self if isinstance(self, Element) else None)
        nodes = parse_fragment_for_context(html, context, self.base_uri)
        if not nodes or not isinstance(nodes[0], Element):
            return None
        wrapper: Element = nodes[0]
        deepest = wrapper
        while True:
            child_el = next((c for c in deepest.child_nodes
                             if isinstance(c, Element)), None)
            if child_el is None:
                break
            deepest = child_el
        if self.parent_node is not None:
            self.replace_with(wrapper)
        deepest.append_child_node(self)
        # remaining fragment nodes are appended INTO the wrapper
        # (reference Node.wrap remainder handling, Node.swift:723)
        for remainder in nodes[1:]:
            if remainder.parent_node is not None:
                remainder.parent_node.remove_child(remainder)
            wrapper.append_child_node(remainder)
        return self

    def unwrap(self) -> Optional["Node"]:
        p = self.parent_node
        if p is None:
            return None
        first = self.child_nodes[0] if self.child_nodes else None
        p.insert_children_at(self.sibling_index, list(self.child_nodes))
        self.remove()
        return first

    def set_base_uri(self, base_uri: str) -> None:
        for node in self.iter_subtree():
            node.base_uri = base_uri

    # -- traversal --------------------------------------------------------
    def iter_subtree(self) -> Iterator["Node"]:
        """Preorder DFS including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            if node.child_nodes:
                stack.extend(reversed(node.child_nodes))

    def traverse(self, visitor) -> None:
        """NodeVisitor protocol: visitor.head(node, depth) /
        visitor.tail(node, depth). Iterative; safe on deep DOMs
        (reference NodeTraversor.swift:25-49)."""
        node: Optional[Node] = self
        depth = 0
        while node is not None:
            visitor.head(node, depth)
            if node.child_nodes:
                node = node.child_nodes[0]
                depth += 1
            else:
                while node is not self and node.next_sibling() is None:
                    visitor.tail(node, depth)
                    node = node.parent_node
                    depth -= 1
                visitor.tail(node, depth)
                if node is self:
                    break
                node = node.next_sibling()

    # -- serialization ----------------------------------------------------
    def outer_html(self) -> str:
        from .serializer import serialize
        return serialize(self)

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}({self.node_name()!r})"

    # -- copy -------------------------------------------------------------
    def shallow_clone(self) -> "Node":
        raise NotImplementedError

    def clone(self) -> "Node":
        c = self.shallow_clone()
        stack = [(self, c)]
        while stack:
            src, dst = stack.pop()
            for ch in src.child_nodes:
                chc = ch.shallow_clone()
                dst.append_child_node(chc)
                if ch.child_nodes:
                    stack.append((ch, chc))
        return c


class LeafNode(Node):
    __slots__ = ()


class TextNode(LeafNode):
    __slots__ = ("_text",)

    def __init__(self, text: str, base_uri: str = "") -> None:
        # Node.__init__ flattened: one TextNode per text run makes this
        # one of the hottest allocations in the tree builder
        self.parent_node = None
        self.child_nodes = []
        self.attributes = None
        self.base_uri = base_uri
        self.sibling_index = 0
        self._text = text

    def node_name(self) -> str:
        return "#text"

    def get_whole_text(self) -> str:
        return self._text

    def text(self) -> str:
        return normalise_whitespace(self._text)

    def set_text(self, text: str) -> None:
        self._text = text
        self._mark_src_dirty()

    def is_blank(self) -> bool:
        return is_blank(self._text)

    # "text" pseudo-attribute (reference TextNode.swift TEXT_KEY)
    def attr(self, key: str) -> str:
        if key == "text":
            return self.text()
        return super().attr(key)

    def set_attr(self, key: str, value: str) -> "TextNode":
        if key == "text":
            self._text = value
            self._mark_src_dirty()
            return self
        super().set_attr(key, value)
        return self

    def split_text(self, offset: int) -> "TextNode":
        head, tail = self._text[:offset], self._text[offset:]
        self._text = head
        self._mark_src_dirty()
        tail_node = TextNode(tail, self.base_uri)
        self.after_node(tail_node)
        return tail_node

    @staticmethod
    def create_from_encoded(encoded: str, base_uri: str = "") -> "TextNode":
        from .entities import unescape
        return TextNode(unescape(encoded), base_uri)

    def shallow_clone(self) -> "TextNode":
        return TextNode(self._text, self.base_uri)


class CDataNode(TextNode):
    __slots__ = ()

    def node_name(self) -> str:
        return "#cdata"

    def shallow_clone(self) -> "CDataNode":
        return CDataNode(self._text, self.base_uri)


class DataNode(LeafNode):
    """script/style raw contents; never entity-escaped."""
    __slots__ = ("_data",)

    def __init__(self, data: str, base_uri: str = "") -> None:
        super().__init__(base_uri)
        self._data = data

    def node_name(self) -> str:
        return "#data"

    def get_whole_data(self) -> str:
        return self._data

    # "data" pseudo-attribute (reference DataNode lazy materialize)
    def attr(self, key: str) -> str:
        if key == "data":
            return self._data
        return super().attr(key)

    def has_attr(self, key: str) -> bool:
        if key == "data":
            return True
        return super().has_attr(key)

    def set_whole_data(self, data: str) -> None:
        self._data = data
        self._mark_src_dirty()

    def shallow_clone(self) -> "DataNode":
        return DataNode(self._data, self.base_uri)


class Comment(LeafNode):
    __slots__ = ("_data",)

    def __init__(self, data: str, base_uri: str = "") -> None:
        super().__init__(base_uri)
        self._data = data

    def node_name(self) -> str:
        return "#comment"

    def get_data(self) -> str:
        return self._data

    def shallow_clone(self) -> "Comment":
        return Comment(self._data, self.base_uri)


class DocumentType(LeafNode):
    __slots__ = ()

    def __init__(self, name: str, public_id: str, system_id: str,
                 base_uri: str = "", pub_sys_key: str = "") -> None:
        super().__init__(base_uri)
        a = self._attrs()
        a.put("name", name)
        if pub_sys_key:
            a.put("pubSysKey", pub_sys_key)
        a.put("publicId", public_id)
        a.put("systemId", system_id)

    def node_name(self) -> str:
        return "#doctype"

    def shallow_clone(self) -> "DocumentType":
        return DocumentType(self.attr("name"), self.attr("publicId"),
                            self.attr("systemId"), self.base_uri)


class XmlDeclaration(LeafNode):
    __slots__ = ("_name", "is_processing_instruction")

    def __init__(self, name: str, base_uri: str = "",
                 is_processing_instruction: bool = False) -> None:
        super().__init__(base_uri)
        self._name = name
        self.is_processing_instruction = is_processing_instruction

    def node_name(self) -> str:
        return "#declaration"

    def name(self) -> str:
        return self._name

    def get_whole_declaration(self) -> str:
        """Attributes-only form, e.g. 'version="1" encoding="UTF-8"'
        (reference XmlDeclaration.getWholeDeclaration)."""
        from .serializer import attributes_html
        attrs = attributes_html(self) if self.attributes else ""
        return attrs.strip()

    def shallow_clone(self) -> "XmlDeclaration":
        x = XmlDeclaration(self._name, self.base_uri,
                           self.is_processing_instruction)
        if self.attributes is not None:
            x.attributes = self.attributes.clone()
        return x


class Element(Node):
    __slots__ = ("tag",)

    def __init__(self, tag: Tag | str, base_uri: str = "",
                 attributes: Optional[Attributes] = None) -> None:
        # Node.__init__ flattened (hot: one per element)
        self.parent_node = None
        self.child_nodes = []
        self.base_uri = base_uri
        self.sibling_index = 0
        self.tag: Tag = tag_for(tag) if isinstance(tag, str) else tag
        if attributes is not None:
            self.attributes = attributes
            if attributes._owner is None:
                attributes._owner = self
        else:
            self.attributes = None

    # -- identity ---------------------------------------------------------
    def node_name(self) -> str:
        return self.tag.name

    def tag_name(self) -> str:
        return self.tag.name

    def normal_name(self) -> str:
        return self.tag.normal_name

    def set_tag_name(self, name: str) -> "Element":
        self.tag = tag_for(name)
        _DOM_EPOCH[0] += 1
        self._mark_src_dirty()
        return self

    def is_block(self) -> bool:
        return self.tag.is_block

    def id(self) -> str:
        return self.attr("id")

    # -- children ---------------------------------------------------------
    def children(self) -> list["Element"]:
        return [c for c in self.child_nodes if isinstance(c, Element)]

    def child(self, i: int) -> "Element":
        return self.children()[i]

    def first_element_sibling(self) -> Optional["Element"]:
        sibs = self.parent_elements_children()
        return sibs[0] if sibs else None

    def last_element_sibling(self) -> Optional["Element"]:
        sibs = self.parent_elements_children()
        return sibs[-1] if sibs else None

    def parent_elements_children(self) -> list["Element"]:
        p = self.parent_node
        if not isinstance(p, Element):
            return [self]
        return p.children()

    def sibling_elements(self) -> list["Element"]:
        """Parent's element children excluding self; empty for orphans
        (reference Element.siblingElements)."""
        p = self.parent_node
        if not isinstance(p, Element):
            return []
        return [c for c in p.children() if c is not self]

    def next_element_sibling(self) -> Optional["Element"]:
        n = self.next_sibling()
        while n is not None and not isinstance(n, Element):
            n = n.next_sibling()
        return n if isinstance(n, Element) else None

    def previous_element_sibling(self) -> Optional["Element"]:
        n = self.previous_sibling()
        while n is not None and not isinstance(n, Element):
            n = n.previous_sibling()
        return n if isinstance(n, Element) else None

    def element_sibling_index(self) -> int:
        p = self.parent_node
        if not isinstance(p, Element):
            return 0
        i = 0
        for c in p.child_nodes:
            if c is self:
                return i
            if isinstance(c, Element):
                i += 1
        return 0

    def text_nodes(self) -> list[TextNode]:
        return [c for c in self.child_nodes if type(c) is TextNode]

    def data_nodes(self) -> list[DataNode]:
        return [c for c in self.child_nodes if isinstance(c, DataNode)]

    # -- ancestry ---------------------------------------------------------
    def parents(self) -> list["Element"]:
        # stops before the #root element (reference accumulateParents)
        out = []
        p = self.parent_node
        while isinstance(p, Element) and p.tag.name != "#root":
            out.append(p)
            p = p.parent_node
        return out

    # -- DOM building -----------------------------------------------------
    def append_child(self, child: Node) -> "Element":
        self.append_child_node(child)
        return self

    def prepend_child(self, child: Node) -> "Element":
        self.insert_children_at(0, [child])
        return self

    def append_element(self, tag_name: str) -> "Element":
        # manual element creation preserves caller's case (reference
        # ElementTest testAddNewElement)
        el = Element(tag_for(tag_name, preserve_case=True), self.base_uri)
        self.append_child_node(el)
        return el

    def prepend_element(self, tag_name: str) -> "Element":
        el = Element(tag_for(tag_name, preserve_case=True), self.base_uri)
        self.prepend_child(el)
        return el

    def append_text(self, text: str) -> "Element":
        self.append_child_node(TextNode(text, self.base_uri))
        return self

    def prepend_text(self, text: str) -> "Element":
        self.prepend_child(TextNode(text, self.base_uri))
        return self

    def append_html(self, html: str) -> "Element":
        from .parser import parse_fragment_for_context
        nodes = parse_fragment_for_context(html, self, self.base_uri)
        self.add_children(*nodes)
        return self

    def prepend_html(self, html: str) -> "Element":
        from .parser import parse_fragment_for_context
        nodes = parse_fragment_for_context(html, self, self.base_uri)
        self.insert_children_at(0, nodes)
        return self

    def before_html(self, html: str) -> "Element":
        from .parser import parse_fragment_for_context
        context = self.parent_node if isinstance(self.parent_node, Element) \
            else self
        nodes = parse_fragment_for_context(html, context, self.base_uri)
        if self.parent_node is not None:
            self.parent_node.insert_children_at(self.sibling_index, nodes)
        return self

    def after_html(self, html: str) -> "Element":
        from .parser import parse_fragment_for_context
        context = self.parent_node if isinstance(self.parent_node, Element) \
            else self
        nodes = parse_fragment_for_context(html, context, self.base_uri)
        if self.parent_node is not None:
            self.parent_node.insert_children_at(self.sibling_index + 1, nodes)
        return self

    def empty(self) -> "Element":
        for c in self.child_nodes:
            c.parent_node = None
        self.child_nodes.clear()
        _DOM_EPOCH[0] += 1
        self._src_dirty = True
        return self

    def set_html(self, html: str) -> "Element":
        self.empty()
        return self.append_html(html)

    # -- text -------------------------------------------------------------
    @staticmethod
    def _preserve_whitespace(node: Optional[Node]) -> bool:
        # this element and one level up only (Element.swift:2335-2341)
        if isinstance(node, Element):
            if node.tag.preserve_whitespace:
                return True
            p = node.parent_node
            return isinstance(p, Element) and p.tag.preserve_whitespace
        return False

    def text(self, trim_and_normalise: bool = True) -> str:
        accum: list[str] = []
        empty = True
        last_was_white = False
        stack: list[Node] = [self]
        while stack:
            node = stack.pop()
            tn = type(node)
            if tn is TextNode or tn is CDataNode:
                t = node.get_whole_text()
                if not trim_and_normalise or \
                        Element._preserve_whitespace(node.parent_node):
                    accum.append(t)
                    if t:
                        empty = False
                        last_was_white = t[-1] == " "
                else:
                    strip_leading = empty or last_was_white
                    before = len(accum)
                    append_normalised_whitespace(accum, t, strip_leading)
                    added = accum[before] if len(accum) > before else ""
                    if added:
                        empty = False
                        last_was_white = added[-1] == " "
                continue
            if isinstance(node, Element):
                if not empty and \
                        (node.tag.is_block or node.tag.normal_name == "br") \
                        and not last_was_white:
                    accum.append(" ")
                    last_was_white = True
            kids = node.child_nodes
            if kids:
                stack.extend(reversed(kids))
        out = "".join(accum)
        if trim_and_normalise:
            out = out.strip()
        return out

    def own_text(self) -> str:
        accum: list[str] = []
        empty = True
        last_was_white = False
        for node in self.child_nodes:
            tn = type(node)
            if tn is TextNode or tn is CDataNode:
                t = node.get_whole_text()
                if Element._preserve_whitespace(self):
                    accum.append(t)
                    if t:
                        empty = False
                        last_was_white = t[-1] == " "
                else:
                    strip_leading = empty or last_was_white
                    before = len(accum)
                    append_normalised_whitespace(accum, t, strip_leading)
                    added = accum[before] if len(accum) > before else ""
                    if added:
                        empty = False
                        last_was_white = added[-1] == " "
            elif isinstance(node, Element):
                if not empty and \
                        (node.tag.is_block or node.tag.normal_name == "br") \
                        and not last_was_white:
                    accum.append(" ")
                    last_was_white = True
        return "".join(accum).strip()

    def set_text(self, text: str) -> "Element":
        self.empty()
        if self.tag.normal_name in ("script", "style"):
            self.append_child_node(DataNode(text, self.base_uri))
        else:
            self.append_child_node(TextNode(text, self.base_uri))
        return self

    def has_text(self) -> bool:
        for child in self.child_nodes:
            if isinstance(child, TextNode):
                if not child.is_blank():
                    return True
            elif isinstance(child, Element):
                if child.has_text():
                    return True
        return False

    def data(self) -> str:
        out = []
        for child in self.child_nodes:
            if isinstance(child, DataNode):
                out.append(child.get_whole_data())
            elif isinstance(child, Comment):
                out.append(child.get_data())
            elif isinstance(child, Element):
                out.append(child.data())
        return "".join(out)

    def whole_text(self) -> str:
        return self.text(trim_and_normalise=False)

    # -- classes ----------------------------------------------------------
    def class_name(self) -> str:
        return self.attr("class").strip()

    def class_names(self) -> list[str]:
        names = [c for c in self.class_name().split() if c]
        seen: dict[str, None] = {}
        for n in names:
            seen.setdefault(n, None)
        return list(seen.keys())

    def set_class_names(self, names: list[str]) -> "Element":
        self.set_attr("class", " ".join(names))
        return self

    def has_class(self, name: str) -> bool:
        if self.attributes is None:
            return False
        cls = self.attributes.get_ignore_case("class")
        if not cls:
            return False
        lname = name.lower()
        return any(c.lower() == lname for c in cls.split())

    def add_class(self, name: str) -> "Element":
        names = self.class_names()
        if name not in names:
            names.append(name)
        return self.set_class_names(names)

    def remove_class(self, name: str) -> "Element":
        names = [n for n in self.class_names() if n != name]
        return self.set_class_names(names)

    def toggle_class(self, name: str) -> "Element":
        if name in self.class_names():
            return self.remove_class(name)
        return self.add_class(name)

    def dataset(self) -> dict[str, str]:
        return self._attrs().dataset()

    # -- forms ------------------------------------------------------------
    def val(self) -> str:
        if self.tag.normal_name == "textarea":
            return self.text()
        return self.attr("value")

    def set_val(self, value: str) -> "Element":
        if self.tag.normal_name == "textarea":
            self.set_text(value)
        else:
            self.set_attr("value", value)
        return self

    # -- select (delegates to selector engine) -----------------------------
    def select(self, query: str) -> "Element":
        from .elements import Elements
        from .selector import select
        return Elements(select(query, self))

    def select_first(self, query: str) -> Optional["Element"]:
        result = self.select(query)
        return result[0] if result else None

    def matches(self, query: str) -> bool:
        from .selector import matches
        return matches(query, self)

    def get_element_by_id(self, el_id: str) -> Optional["Element"]:
        for node in self.iter_subtree():
            if isinstance(node, Element) and node.id() == el_id:
                return node
        return None

    def get_elements_by_tag(self, tag_name: str) -> list["Element"]:
        tag_name = tag_name.lower()
        return [n for n in self.iter_subtree()
                if isinstance(n, Element) and n.tag.normal_name == tag_name]

    def get_elements_by_class(self, cls: str) -> list["Element"]:
        return [n for n in self.iter_subtree()
                if isinstance(n, Element) and n.has_class(cls)]

    def get_elements_by_attribute(self, key: str) -> list["Element"]:
        key = key.strip()
        return [n for n in self.iter_subtree()
                if isinstance(n, Element) and n.has_attr(key)]

    def get_elements_by_attribute_value(self, key: str,
                                        value: str) -> list["Element"]:
        key, lvalue = key.strip(), value.lower()
        return [n for n in self.iter_subtree()
                if isinstance(n, Element) and n.has_attr(key)
                and n.attr(key).lower() == lvalue]

    # Remaining getElementsBy* sugar family (reference
    # Element.swift:1215-1695) — thin wrappers over the evaluators.
    def _collect(self, evaluator) -> list["Element"]:
        from .selector import collect
        return collect(evaluator, self)

    def get_elements_by_attribute_starting(
            self, key_prefix: str) -> list["Element"]:
        from .selector import AttributeStarting
        return self._collect(AttributeStarting(key_prefix.strip()))

    def get_elements_by_attribute_value_not(
            self, key: str, value: str) -> list["Element"]:
        from .selector import AttributeWithValueNot
        return self._collect(AttributeWithValueNot(key.strip(), value))

    def get_elements_by_attribute_value_starting(
            self, key: str, prefix: str) -> list["Element"]:
        from .selector import AttributeWithValueStarting
        return self._collect(AttributeWithValueStarting(key.strip(),
                                                        prefix))

    def get_elements_by_attribute_value_ending(
            self, key: str, suffix: str) -> list["Element"]:
        from .selector import AttributeWithValueEnding
        return self._collect(AttributeWithValueEnding(key.strip(),
                                                      suffix))

    def get_elements_by_attribute_value_containing(
            self, key: str, needle: str) -> list["Element"]:
        from .selector import AttributeWithValueContaining
        return self._collect(AttributeWithValueContaining(key.strip(),
                                                          needle))

    def get_elements_by_attribute_value_matching(
            self, key: str, regex: str) -> list["Element"]:
        from .selector import AttributeWithValueMatching
        return self._collect(AttributeWithValueMatching(key.strip(),
                                                        regex))

    def get_elements_by_index_less_than(self, index: int) -> list["Element"]:
        from .selector import IndexLessThan
        return self._collect(IndexLessThan(index))

    def get_elements_by_index_greater_than(self,
                                           index: int) -> list["Element"]:
        from .selector import IndexGreaterThan
        return self._collect(IndexGreaterThan(index))

    def get_elements_by_index_equals(self, index: int) -> list["Element"]:
        from .selector import IndexEquals
        return self._collect(IndexEquals(index))

    def get_elements_containing_text(self, text: str) -> list["Element"]:
        from .selector import ContainsText
        return self._collect(ContainsText(text))

    def get_elements_containing_own_text(self,
                                         text: str) -> list["Element"]:
        from .selector import ContainsOwnText
        return self._collect(ContainsOwnText(text))

    def get_elements_matching_text(self, regex: str) -> list["Element"]:
        from .selector import MatchesText
        return self._collect(MatchesText(regex))

    def get_elements_matching_own_text(self, regex: str) -> list["Element"]:
        from .selector import MatchesOwnText
        return self._collect(MatchesOwnText(regex))

    def replace_child(self, out: "Node", new_in: "Node") -> None:
        """Replace direct child `out` with `new_in` (reference
        Node.replaceChild)."""
        if out.parent_node is not self:
            raise ValueError("node to replace is not a child")
        out.replace_with(new_in)

    def get_all_elements(self) -> list["Element"]:
        return [n for n in self.iter_subtree() if isinstance(n, Element)]

    # -- serialization ----------------------------------------------------
    def html(self) -> str:
        from .serializer import serialize_children
        return serialize_children(self)

    @staticmethod
    def _css_escape(ident: str) -> str:
        # backslash-escape chars not valid bare in a CSS identifier
        # (reference cssSelector escaping, ElementTest css-path tests)
        return "".join(
            c if (c.isalnum() or c in "-_" or not c.isascii())
            else "\\" + c
            for c in ident)

    def css_selector(self) -> str:
        """A unique CSS selector path for this element
        (reference Element.swift cssSelector)."""
        if self.id():
            return "#" + self._css_escape(self.id())
        tag = self.tag.name.replace(":", "|")
        classes = ".".join(self._css_escape(c)
                           for c in self.class_names())
        selector = tag + ("." + classes if classes else "")
        p = self.parent_node
        if not isinstance(p, Element) or isinstance(p, Document):
            return selector
        from .selector import select
        # uniqueness among the parent's IMMEDIATE children (reference
        # selects "> tag.classes", Element.swift:1084-1087)
        if len(select("> " + selector, p)) > 1:
            selector += f":nth-child({self.element_sibling_index() + 1})"
        return p.css_selector() + " > " + selector

    def shallow_clone(self) -> "Element":
        el = Element(self.tag, self.base_uri)
        if self.attributes is not None:
            el.attributes = self.attributes.clone()
        return el


class FormElement(Element):
    __slots__ = ("form_elements",)

    def __init__(self, tag: Tag | str, base_uri: str = "",
                 attributes: Optional[Attributes] = None) -> None:
        super().__init__(tag, base_uri, attributes)
        self.form_elements: list[Element] = []

    def add_element(self, el: Element) -> None:
        self.form_elements.append(el)

    def elements(self) -> list[Element]:
        return list(self.form_elements)

    def shallow_clone(self) -> "FormElement":
        el = FormElement(self.tag, self.base_uri)
        if self.attributes is not None:
            el.attributes = self.attributes.clone()
        return el


class OutputSettings:
    """Serialization settings (reference Document.swift:647)."""
    __slots__ = ("escape_mode", "pretty_print", "outline", "indent_amount",
                 "charset", "syntax")

    def __init__(self) -> None:
        self.escape_mode = "base"  # "xhtml" | "base" | "extended"
        self.pretty_print = True
        self.outline = False
        self.indent_amount = 1
        self.charset = "utf-8"
        self.syntax = "html"  # "html" | "xml"

    def clone(self) -> "OutputSettings":
        o = OutputSettings()
        o.escape_mode = self.escape_mode
        o.pretty_print = self.pretty_print
        o.outline = self.outline
        o.indent_amount = self.indent_amount
        o.charset = self.charset
        o.syntax = self.syntax
        return o


class Document(Element):
    __slots__ = ("output_settings", "quirks_mode", "location",
                 "update_meta_charset", "source")

    def __init__(self, base_uri: str = "") -> None:
        super().__init__(tag_for("#root", preserve_case=True), base_uri)
        self.output_settings = OutputSettings()
        self.quirks_mode = "noQuirks"  # noQuirks | quirks | limitedQuirks
        self.location = base_uri
        self.update_meta_charset = False
        # raw input retained by tracked parses — enables the patch
        # serializer (reference Document.swift sourceBuffer)
        self.source: Optional[str] = None

    def patched_outer_html(self) -> Optional[str]:
        """Source-faithful serialization (reference
        Document.swift:551-594 patchedOuterHtml): returns the ORIGINAL
        source with only the mutated subtrees re-serialized and spliced
        in place; unmodified regions keep their exact input bytes
        (entities, quoting, whitespace). Requires a parse with
        ``ParseSettings(track_source_ranges=True)``. Returns None when
        unavailable (untracked parse, or a mutation on a node without a
        complete source range) — fall back to ``outer_html()``."""
        from .serializer import patched_outer_html
        return patched_outer_html(self)

    def node_name(self) -> str:
        return "#document"

    def set_text(self, text: str) -> "Element":
        """Replace body text, preserving document structure (reference
        Document.text override)."""
        body = self.body()
        if body is not None:
            body.set_text(text)
            return self
        return super().set_text(text)

    def charset(self) -> str:
        return self.output_settings.charset

    def set_charset(self, charset: str) -> None:
        """Set output charset + sync the meta charset element / XML
        declaration (reference Document.charset /
        ensureMetaCharsetElement)."""
        self.update_meta_charset = True
        self.output_settings.charset = charset
        self._ensure_meta_charset()

    def _ensure_meta_charset(self) -> None:
        if not self.update_meta_charset:
            return
        cs = self.output_settings.charset
        if self.output_settings.syntax == "html":
            metas = self.select("meta[charset]")
            head = self.head()
            if metas:
                meta = metas[0]
            elif head is not None:
                meta = head.append_element("meta")
            else:
                return
            meta.set_attr("charset", cs)
            for m in self.select("meta[name=charset]"):
                m.remove()
        else:
            first = self.child_nodes[0] if self.child_nodes else None
            if isinstance(first, XmlDeclaration) and \
                    first.name() == "xml":
                first.set_attr("encoding", cs)
                if first.attr("version"):
                    first.set_attr("version", "1.0")
            else:
                decl = XmlDeclaration("xml", self.base_uri)
                decl.set_attr("version", "1.0")
                decl.set_attr("encoding", cs)
                self.prepend_child(decl)


    def create_element(self, tag_name: str) -> "Element":
        """Unattached element owned by this doc (reference
        Document.createElement, Document.swift:147)."""
        return Element(tag_for(tag_name), self.base_uri)

    @staticmethod
    def create_shell(base_uri: str = "") -> "Document":
        doc = Document(base_uri)
        html = doc.append_element("html")
        html.append_element("head")
        html.append_element("body")
        return doc

    def head(self) -> Optional[Element]:
        return self._find_first_by_tag("head")

    def body(self) -> Optional[Element]:
        return self._find_first_by_tag("body")

    def _find_first_by_tag(self, name: str) -> Optional[Element]:
        for node in self.iter_subtree():
            if isinstance(node, Element) and node.tag.normal_name == name:
                return node
        return None

    def title(self) -> str:
        el = self._find_first_by_tag("title")
        return normalise_whitespace(el.text()).strip() if el else ""

    def set_title(self, title: str) -> None:
        el = self._find_first_by_tag("title")
        if el is None:
            head = self.head()
            el = head.append_element("title") if head is not None else \
                self.append_element("title")
        el.set_text(title)

    def normalise(self) -> "Document":
        html = self._find_first_by_tag("html")
        if html is None:
            html = self.append_element("html")
        if self.head() is None:
            html.prepend_element("head")
        if self.body() is None:
            html.append_element("body")
        self._normalise_text_nodes(self)
        self._normalise_text_nodes(html)
        head = self.head()
        if head is not None:
            self._normalise_text_nodes(head)
        self._normalise_structure("head", html)
        self._normalise_structure("body", html)
        return self

    def _normalise_text_nodes(self, el: Element) -> None:
        to_move = [n for n in el.child_nodes
                   if isinstance(n, TextNode) and not n.is_blank()]
        body = self.body()
        for node in reversed(to_move):
            el.remove_child(node)
            if body is not None:
                body.insert_children_at(0, [node])

    def _normalise_structure(self, tag: str, html_el: Element) -> None:
        elements = [n for n in self.iter_subtree()
                    if isinstance(n, Element) and n.tag.normal_name == tag]
        if len(elements) <= 1:
            return
        master = elements[0]
        for dupe in elements[1:]:
            for child in list(dupe.child_nodes):
                master.append_child_node(child)
            dupe.remove()

    def shallow_clone(self) -> "Document":
        doc = Document(self.base_uri)
        if self.attributes is not None:
            doc.attributes = self.attributes.clone()
        doc.output_settings = self.output_settings.clone()
        doc.quirks_mode = self.quirks_mode
        return doc

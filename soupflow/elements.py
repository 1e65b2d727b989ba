"""Elements: ordered element collection with bulk accessors.

Parity target: /root/reference/Sources/Elements.swift:52-695 (bulk
attr/text/html/class/val, select-within, not/eq/is, first/last).
A list subclass, so indexing/slicing/equality behave like plain lists.
"""

from __future__ import annotations

from typing import Optional

from .dom import Element


class Elements(list):
    # -- bulk attribute access -------------------------------------------
    def attr(self, key: str) -> str:
        """Value of the first element that has the attribute."""
        for el in self:
            if el.has_attr(key):
                return el.attr(key)
        return ""

    def has_attr(self, key: str) -> bool:
        return any(el.has_attr(key) for el in self)

    def set_attr(self, key: str, value: str) -> "Elements":
        for el in self:
            el.set_attr(key, value)
        return self

    def remove_attr(self, key: str) -> "Elements":
        for el in self:
            el.remove_attr(key)
        return self

    def each_attr(self, key: str) -> list[str]:
        return [el.attr(key) for el in self if el.has_attr(key)]

    # -- classes ----------------------------------------------------------
    def add_class(self, cls: str) -> "Elements":
        for el in self:
            el.add_class(cls)
        return self

    def remove_class(self, cls: str) -> "Elements":
        for el in self:
            el.remove_class(cls)
        return self

    def toggle_class(self, cls: str) -> "Elements":
        for el in self:
            el.toggle_class(cls)
        return self

    def has_class(self, cls: str) -> bool:
        return any(el.has_class(cls) for el in self)

    # -- values / text ----------------------------------------------------
    def val(self) -> str:
        return self[0].val() if self else ""

    def set_val(self, value: str) -> "Elements":
        for el in self:
            el.set_val(value)
        return self

    def text(self, trim_and_normalise_whitespace: bool = True) -> str:
        parts = []
        for el in self:
            t = el.text() if trim_and_normalise_whitespace \
                else el.whole_text()
            if t:
                parts.append(t)
        return " ".join(parts)

    def has_text(self) -> bool:
        return any(el.has_text() for el in self)

    def each_text(self) -> list[str]:
        return [el.text() for el in self if el.has_text()]

    # -- html -------------------------------------------------------------
    def html(self) -> str:
        return "\n".join(el.html() for el in self)

    def outer_html(self) -> str:
        return "\n".join(el.outer_html() for el in self)

    def __str__(self) -> str:
        return self.outer_html()

    # -- sub-queries ------------------------------------------------------
    def select(self, query: str) -> "Elements":
        from .selector import select_many
        return Elements(select_many(query, list(self)))

    def not_(self, query: str) -> "Elements":
        from .selector import filter_out, select_many
        out = select_many(query, list(self))
        return Elements(filter_out(list(self), out))

    def eq(self, index: int) -> "Elements":
        if 0 <= index < len(self):
            return Elements([self[index]])
        return Elements()

    def iS(self, query: str) -> bool:
        from .selector import parse_query
        evaluator = parse_query(query)
        return any(
            evaluator.matches(el.root() if isinstance(el.root(), Element)
                              else el, el) for el in self)

    matches = iS

    # -- accessors --------------------------------------------------------
    def first(self) -> Optional[Element]:
        return self[0] if self else None

    def last(self) -> Optional[Element]:
        return self[-1] if self else None

    def array(self) -> list[Element]:
        return list(self)

    def size(self) -> int:
        return len(self)

    # -- structure --------------------------------------------------------
    def parents(self) -> "Elements":
        """Union of ancestors across elements, document order, deduped
        (reference Elements.parents)."""
        seen: set[int] = set()
        out = Elements()
        for el in self:
            for p in el.parents():
                if id(p) not in seen:
                    seen.add(id(p))
                    out.append(p)
        return out

    def forms(self) -> list:
        from .dom import FormElement
        return [el for el in self if isinstance(el, FormElement)]

    def traverse(self, visitor) -> "Elements":
        for el in self:
            el.traverse(visitor)
        return self

    # -- bulk html mutations ----------------------------------------------
    def append_html(self, html: str) -> "Elements":
        for el in self:
            el.append_html(html)
        return self

    def prepend_html(self, html: str) -> "Elements":
        for el in self:
            el.prepend_html(html)
        return self

    def set_html(self, html: str) -> "Elements":
        for el in self:
            el.set_html(html)
        return self

    def before_html(self, html: str) -> "Elements":
        for el in self:
            el.before_html(html)
        return self

    def after_html(self, html: str) -> "Elements":
        for el in self:
            el.after_html(html)
        return self

    def wrap(self, html: str) -> "Elements":
        for el in self:
            el.wrap(html)
        return self

    def unwrap(self) -> "Elements":
        for el in self:
            el.unwrap()
        return self

    def set_tag_name(self, tag_name: str) -> "Elements":
        for el in self:
            el.set_tag_name(tag_name)
        return self

    # -- bulk mutations ---------------------------------------------------
    def remove(self) -> "Elements":  # type: ignore[override]
        """Remove every element from its DOM (reference Elements.remove;
        shadows list.remove — use list.remove(self, x) for that)."""
        for el in self:
            el.remove()
        return self

    def empty(self) -> "Elements":
        for el in self:
            el.empty()
        return self

    def clone(self) -> "Elements":
        return Elements([el.clone() for el in self])

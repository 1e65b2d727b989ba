"""CSS selector engine: TokenQueue + QueryParser + Evaluators + Collector.

Parity targets: /root/reference/Sources/TokenQueue.swift:166-464,
QueryParser.swift:50-366 (grammar + combinators), Evaluator.swift:72-917,
StructuralEvaluator.swift:13-187, CombiningEvaluator.swift:1-80,
Collector.swift:26-138, CssSelector.swift:117-233.

Fresh implementation; compiled Evaluator trees are plain Python objects
safe to cache per Ray actor (see soupflow.extract).
"""

from __future__ import annotations

import re
import weakref
from bisect import bisect_left, bisect_right
from collections import OrderedDict
from typing import Optional

from .dom import Comment, Document, DocumentType, Element, Node, TextNode, \
    XmlDeclaration
from .textutil import normalise_whitespace


class SelectorParseError(ValueError):
    pass


# -- TokenQueue -------------------------------------------------------------

class TokenQueue:
    __slots__ = ("queue", "pos")

    def __init__(self, data: str) -> None:
        self.queue = data
        self.pos = 0

    def is_empty(self) -> bool:
        return self.pos >= len(self.queue)

    def matches_cs(self, seq: str) -> bool:
        return self.queue.startswith(seq, self.pos)

    def matches_ci(self, seq: str) -> bool:
        return self.queue[self.pos:self.pos + len(seq)].lower() == \
            seq.lower()

    def matches_any(self, chars: str) -> bool:
        return self.pos < len(self.queue) and \
            self.queue[self.pos] in chars

    def matches_whitespace(self) -> bool:
        return self.pos < len(self.queue) and \
            self.queue[self.pos] in " \t\n\r\f"

    def matches_word(self) -> bool:
        return self.pos < len(self.queue) and \
            (self.queue[self.pos].isalnum() or
             not self.queue[self.pos].isascii() and
             self.queue[self.pos].isprintable())

    def match_chomp(self, seq: str) -> bool:
        if self.matches_ci(seq):
            self.pos += len(seq)
            return True
        return False

    def consume(self) -> str:
        c = self.queue[self.pos]
        self.pos += 1
        return c

    def consume_whitespace(self) -> bool:
        seen = False
        while self.matches_whitespace():
            self.pos += 1
            seen = True
        return seen

    def consume_to_any(self, *seqs: str) -> str:
        start = self.pos
        while self.pos < len(self.queue) and \
                not any(self.queue.startswith(s, self.pos) for s in seqs):
            self.pos += 1
        return self.queue[start:self.pos]

    def consume_to(self, seq: str) -> str:
        return self.consume_to_any(seq)

    def chomp_to_ignore_case(self, seq: str) -> str:
        """Consume (and return) up to a case-insensitive match of seq,
        chomping the match itself; to EOF if absent (reference
        TokenQueue.chompToIgnoreCase)."""
        idx = self.queue.lower().find(seq.lower(), self.pos)
        if idx == -1:
            out = self.queue[self.pos:]
            self.pos = len(self.queue)
            return out
        out = self.queue[self.pos:idx]
        self.pos = idx + len(seq)
        return out

    def consume_word(self) -> str:
        start = self.pos
        while self.matches_word():
            self.pos += 1
        return self.queue[start:self.pos]

    def add_first(self, seq: str) -> None:
        self.queue = seq + self.queue[self.pos:]
        self.pos = 0

    def chomp_balanced(self, open_ch: str, close_ch: str) -> str:
        """Consume a balanced (...) / [...] run; returns contents.
        Tolerates unbalanced input at EOF and skips quoted sections
        (reference TokenQueue.chompBalanced)."""
        start = -1
        end = -1
        depth = 0
        last = ""
        in_quote = False
        while True:
            if self.is_empty():
                break
            c = self.consume()
            if last == "" or last != "\\":
                if c in "'\"" and c != open_ch:
                    in_quote = not in_quote
                if in_quote:
                    continue
                if c == open_ch:
                    depth += 1
                    if start == -1:
                        start = self.pos
                elif c == close_ch:
                    depth -= 1
            if depth > 0 and last != "":
                end = self.pos
            last = c
            if depth <= 0:
                break
        return self.queue[start:end] if end >= 0 else ""

    @staticmethod
    def unescape(s: str) -> str:
        out = []
        last = "\x00"
        for c in s:
            if c == "\\":
                if last == "\\":
                    out.append(c)
                    last = "\x00"
                    continue
            else:
                out.append(c)
            last = c
        return "".join(out)

    def consume_element_selector(self) -> str:
        start = self.pos
        q = self.queue
        n = len(q)
        while self.pos < n:
            c = q[self.pos]
            if c.isalnum() or c in "-_|\\*" or not c.isascii():
                self.pos += 1
            else:
                break
        return q[start:self.pos]

    def consume_css_identifier(self) -> str:
        start = self.pos
        q = self.queue
        n = len(q)
        while self.pos < n:
            c = q[self.pos]
            if c == "\\" and self.pos + 1 < n:
                # backslash escape: take the escaped char too
                self.pos += 2
            elif c.isalnum() or c in "-_" or not c.isascii():
                self.pos += 1
            else:
                break
        return q[start:self.pos]

    def remainder(self) -> str:
        out = self.queue[self.pos:]
        self.pos = len(self.queue)
        return out


# -- Evaluators -------------------------------------------------------------

class Evaluator:
    __slots__ = ()

    def matches(self, root: Element, element: Element) -> bool:
        raise NotImplementedError


class TagIs(Evaluator):
    __slots__ = ("name",)

    def __init__(self, name: str) -> None:
        self.name = name

    def matches(self, root, element):
        return element.tag.normal_name == self.name


class TagEndsWith(Evaluator):
    __slots__ = ("suffix",)

    def __init__(self, suffix: str) -> None:
        self.suffix = suffix

    def matches(self, root, element):
        return element.tag.normal_name.endswith(self.suffix)


class TagStartsWith(Evaluator):
    __slots__ = ("prefix",)

    def __init__(self, prefix: str) -> None:
        self.prefix = prefix

    def matches(self, root, element):
        return element.tag.normal_name.startswith(self.prefix)


class IdIs(Evaluator):
    __slots__ = ("id",)

    def __init__(self, el_id: str) -> None:
        self.id = el_id

    def matches(self, root, element):
        return element.id() == self.id


class ClassIs(Evaluator):
    __slots__ = ("cls",)

    def __init__(self, cls: str) -> None:
        self.cls = cls

    def matches(self, root, element):
        return element.has_class(self.cls)


class HasAttribute(Evaluator):
    __slots__ = ("key",)

    def __init__(self, key: str) -> None:
        self.key = key.lower()

    def matches(self, root, element):
        return element.has_attr(self.key)


class AttributeStarting(Evaluator):
    __slots__ = ("prefix",)

    def __init__(self, prefix: str) -> None:
        self.prefix = prefix.lower()

    def matches(self, root, element):
        if element.attributes is None:
            return False
        return any(k.lower().startswith(self.prefix)
                   for k in element.attributes.keys())


class AttributeWithValue(Evaluator):
    __slots__ = ("key", "value")

    def __init__(self, key: str, value: str) -> None:
        self.key = key.lower()
        # strip string-literal quotes first, then trim + lowercase
        if len(value) > 2 and value[0] in "'\"" and value[-1] == value[0]:
            value = value[1:-1]
        self.value = value.strip().lower()

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            element.attr(self.key).strip().lower() == self.value


class AttributeWithValueNot(AttributeWithValue):
    __slots__ = ()

    def matches(self, root, element):
        return element.attr(self.key).strip().lower() != self.value


class AttributeWithValueStarting(AttributeWithValue):
    __slots__ = ()

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            element.attr(self.key).strip().lower().startswith(self.value)


class AttributeWithValueEnding(AttributeWithValue):
    __slots__ = ()

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            element.attr(self.key).strip().lower().endswith(self.value)


class AttributeWithValueContaining(AttributeWithValue):
    __slots__ = ()

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            self.value in element.attr(self.key).strip().lower()


class AttributeWithValueMatching(Evaluator):
    __slots__ = ("key", "pattern")

    def __init__(self, key: str, pattern: str) -> None:
        self.key = key.lower()
        self.pattern = re.compile(pattern)

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            self.pattern.search(element.attr(self.key)) is not None


class AllElements(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        return True


class IndexLessThan(Evaluator):
    __slots__ = ("index",)

    def __init__(self, index: int) -> None:
        self.index = index

    def matches(self, root, element):
        return element is not root and \
            element.element_sibling_index() < self.index


class IndexGreaterThan(Evaluator):
    __slots__ = ("index",)

    def __init__(self, index: int) -> None:
        self.index = index

    def matches(self, root, element):
        return element.element_sibling_index() > self.index


class IndexEquals(Evaluator):
    __slots__ = ("index",)

    def __init__(self, index: int) -> None:
        self.index = index

    def matches(self, root, element):
        return element.element_sibling_index() == self.index


class IsFirstChild(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        # never matches the query root itself (reference
        # Evaluator.swift:708-715, jsoup issue #274)
        p = element.parent()
        return element is not root and p is not None and \
            not isinstance(p, Document) and \
            element.element_sibling_index() == 0


class IsLastChild(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        p = element.parent()
        if element is root or p is None or isinstance(p, Document):
            return False
        siblings = p.children()
        return bool(siblings) and siblings[-1] is element


class CssNthEvaluator(Evaluator):
    __slots__ = ("a", "b")

    def __init__(self, a: int, b: int) -> None:
        self.a = a
        self.b = b

    def calc_position(self, root, element) -> int:
        raise NotImplementedError

    def matches(self, root, element):
        p = element.parent()
        if p is None or isinstance(p, Document):
            return False
        pos = self.calc_position(root, element)
        if self.a == 0:
            return pos == self.b
        return (pos - self.b) * self.a >= 0 and (pos - self.b) % self.a == 0


class IsNthChild(CssNthEvaluator):
    __slots__ = ()

    def calc_position(self, root, element):
        return element.element_sibling_index() + 1


class IsNthLastChild(CssNthEvaluator):
    __slots__ = ()

    def calc_position(self, root, element):
        p = element.parent()
        if not isinstance(p, Element):
            return 0
        return len(p.children()) - element.element_sibling_index()


class IsNthOfType(CssNthEvaluator):
    __slots__ = ()

    def calc_position(self, root, element):
        pos = 0
        p = element.parent()
        if not isinstance(p, Element):
            return 0
        for el in p.children():
            if el.tag.normal_name == element.tag.normal_name:
                pos += 1
            if el is element:
                break
        return pos


class IsNthLastOfType(CssNthEvaluator):
    __slots__ = ()

    def calc_position(self, root, element):
        # count same-type siblings from element to end, inclusive
        p = element.parent()
        if not isinstance(p, Element):
            return 0
        count = 0
        started = False
        for el in p.children():
            if el is element:
                started = True
            if started and el.tag.normal_name == element.tag.normal_name:
                count += 1
        return count


class IsFirstOfType(IsNthOfType):
    __slots__ = ()

    def __init__(self) -> None:
        super().__init__(0, 1)


class IsLastOfType(IsNthLastOfType):
    __slots__ = ()

    def __init__(self) -> None:
        super().__init__(0, 1)


class IsOnlyChild(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        p = element.parent()
        return p is not None and not isinstance(p, Document) and \
            len(p.children()) == 1


class IsOnlyOfType(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        p = element.parent()
        if p is None or isinstance(p, Document):
            return False
        count = sum(1 for el in p.children()
                    if el.tag.normal_name == element.tag.normal_name)
        return count == 1


class IsEmpty(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        for child in element.child_nodes:
            if not isinstance(child, (Comment, XmlDeclaration,
                                      DocumentType)):
                return False
        return True


class IsRoot(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        r = root.child(0) if isinstance(root, Document) and root.children() \
            else root
        return element is r


class ContainsText(Evaluator):
    __slots__ = ("text",)

    def __init__(self, text: str) -> None:
        self.text = text.lower()

    def matches(self, root, element):
        return self.text in element.text().lower()


class ContainsOwnText(Evaluator):
    __slots__ = ("text",)

    def __init__(self, text: str) -> None:
        self.text = text.lower()

    def matches(self, root, element):
        return self.text in element.own_text().lower()


class ContainsData(Evaluator):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        self.data = data.lower()

    def matches(self, root, element):
        return self.data in element.data().lower()


class MatchesText(Evaluator):
    __slots__ = ("pattern",)

    def __init__(self, pattern: str) -> None:
        self.pattern = re.compile(pattern)

    def matches(self, root, element):
        return self.pattern.search(element.text()) is not None


class MatchesOwnText(Evaluator):
    __slots__ = ("pattern",)

    def __init__(self, pattern: str) -> None:
        self.pattern = re.compile(pattern)

    def matches(self, root, element):
        return self.pattern.search(element.own_text()) is not None


class And(Evaluator):
    __slots__ = ("evaluators",)

    def __init__(self, evaluators: list[Evaluator]) -> None:
        self.evaluators = list(evaluators)

    def matches(self, root, element):
        # match right-to-left: cheap local predicates first
        for ev in reversed(self.evaluators):
            if not ev.matches(root, element):
                return False
        return True


class Or(Evaluator):
    __slots__ = ("evaluators",)

    def __init__(self, evaluators: list[Evaluator]) -> None:
        self.evaluators = list(evaluators)

    def add(self, ev: Evaluator) -> None:
        self.evaluators.append(ev)

    def rightmost(self) -> Evaluator:
        return self.evaluators[-1]

    def replace_rightmost(self, ev: Evaluator) -> None:
        self.evaluators[-1] = ev

    def matches(self, root, element):
        return any(ev.matches(root, element) for ev in self.evaluators)


class Has(Evaluator):
    __slots__ = ("evaluator",)

    def __init__(self, evaluator: Evaluator) -> None:
        self.evaluator = evaluator

    def matches(self, root, element):
        for node in element.iter_subtree():
            if isinstance(node, Element) and node is not element and \
                    self.evaluator.matches(root, node):
                return True
        return False


class Not(Evaluator):
    __slots__ = ("evaluator",)

    def __init__(self, evaluator: Evaluator) -> None:
        self.evaluator = evaluator

    def matches(self, root, element):
        return not self.evaluator.matches(root, element)


class Parent(Evaluator):
    __slots__ = ("evaluator",)

    def __init__(self, evaluator: Evaluator) -> None:
        self.evaluator = evaluator

    def matches(self, root, element):
        if element is root:
            return False
        p = element.parent()
        while isinstance(p, Element):
            if self.evaluator.matches(root, p):
                return True
            if p is root:
                break
            p = p.parent()
        return False


class ImmediateParent(Evaluator):
    __slots__ = ("evaluator",)

    def __init__(self, evaluator: Evaluator) -> None:
        self.evaluator = evaluator

    def matches(self, root, element):
        p = element.parent()
        return isinstance(p, Element) and self.evaluator.matches(root, p)


class PreviousSibling(Evaluator):
    __slots__ = ("evaluator",)

    def __init__(self, evaluator: Evaluator) -> None:
        self.evaluator = evaluator

    def matches(self, root, element):
        if element is root:
            return False
        prev = element.previous_element_sibling()
        while prev is not None:
            if self.evaluator.matches(root, prev):
                return True
            prev = prev.previous_element_sibling()
        return False


class ImmediatePreviousSibling(Evaluator):
    __slots__ = ("evaluator",)

    def __init__(self, evaluator: Evaluator) -> None:
        self.evaluator = evaluator

    def matches(self, root, element):
        if element is root:
            return False
        prev = element.previous_element_sibling()
        return prev is not None and self.evaluator.matches(root, prev)


class RootEval(Evaluator):
    __slots__ = ()

    def matches(self, root, element):
        return element is root


# -- QueryParser ------------------------------------------------------------

_COMBINATORS = ",>+~ "
_ATTRIBUTE_EVALS = ("=", "!=", "^=", "$=", "*=", "~=")
_NTH = re.compile(
    r"(([+-])?(\d+)?n(\s*([+-])?\s*\d+)?|([+-])?\d+)", re.IGNORECASE)


class QueryParser:
    def __init__(self, query: str) -> None:
        self.query = query.strip()
        self.tq = TokenQueue(self.query)
        self.evals: list[Evaluator] = []

    def parse(self) -> Evaluator:
        tq = self.tq
        tq.consume_whitespace()
        if tq.matches_any(_COMBINATORS):
            self.evals.append(RootEval())
            self._combinator(tq.consume())
        else:
            self._find_elements()
        while not tq.is_empty():
            seen_white = tq.consume_whitespace()
            if tq.matches_any(_COMBINATORS):
                self._combinator(tq.consume())
            elif seen_white:
                self._combinator(" ")
            else:
                self._find_elements()
        if len(self.evals) == 1:
            return self.evals[0]
        return And(self.evals)

    def _combinator(self, combinator: str) -> None:
        tq = self.tq
        tq.consume_whitespace()
        sub_query = self._consume_sub_query()
        replace_rightmost = False
        if len(self.evals) == 1:
            root_eval = current_eval = self.evals[0]
            if isinstance(root_eval, Or) and combinator != ",":
                current_eval = root_eval.rightmost()
                replace_rightmost = True
        else:
            root_eval = current_eval = And(self.evals)
        self.evals = []
        new_eval = parse_query(sub_query)
        if combinator == ">":
            current_eval = And([new_eval, ImmediateParent(current_eval)])
        elif combinator == " ":
            current_eval = And([new_eval, Parent(current_eval)])
        elif combinator == "+":
            current_eval = And(
                [new_eval, ImmediatePreviousSibling(current_eval)])
        elif combinator == "~":
            current_eval = And([new_eval, PreviousSibling(current_eval)])
        elif combinator == ",":
            if isinstance(current_eval, Or):
                current_eval.add(new_eval)
            else:
                current_eval = Or([current_eval, new_eval])
        else:
            raise SelectorParseError(f"unknown combinator {combinator!r}")
        if replace_rightmost:
            root_eval.replace_rightmost(current_eval)
        else:
            root_eval = current_eval
        self.evals.append(root_eval)

    def _consume_sub_query(self) -> str:
        tq = self.tq
        sb: list[str] = []
        while not tq.is_empty():
            if tq.matches_cs("\\"):
                # escaped char: keep backslash + next char literal so
                # `\(` never opens a balanced group
                sb.append(tq.consume())
                if not tq.is_empty():
                    sb.append(tq.consume())
            elif tq.matches_cs("("):
                sb.append("(")
                sb.append(tq.chomp_balanced("(", ")"))
                sb.append(")")
            elif tq.matches_cs("["):
                sb.append("[")
                sb.append(tq.chomp_balanced("[", "]"))
                sb.append("]")
            elif tq.matches_any(_COMBINATORS):
                break
            else:
                sb.append(tq.consume())
        return "".join(sb)

    def _find_elements(self) -> None:
        tq = self.tq
        if tq.match_chomp("#"):
            self.evals.append(IdIs(
                TokenQueue.unescape(tq.consume_css_identifier())))
        elif tq.match_chomp("."):
            self.evals.append(ClassIs(
                TokenQueue.unescape(tq.consume_css_identifier().strip())))
        elif tq.matches_word() or tq.matches_cs("*|"):
            self._by_tag()
        elif tq.matches_cs("["):
            self._by_attribute()
        elif tq.match_chomp("*"):
            self.evals.append(AllElements())
        elif tq.match_chomp(":lt("):
            self.evals.append(IndexLessThan(self._consume_index()))
        elif tq.match_chomp(":gt("):
            self.evals.append(IndexGreaterThan(self._consume_index()))
        elif tq.match_chomp(":eq("):
            self.evals.append(IndexEquals(self._consume_index()))
        elif tq.matches_cs(":has("):
            self._has()
        elif tq.matches_cs(":contains("):
            self._contains(own=False)
        elif tq.matches_cs(":containsOwn("):
            self._contains(own=True)
        elif tq.matches_cs(":containsData("):
            self._contains_data()
        elif tq.matches_cs(":matches("):
            self._matches(own=False)
        elif tq.matches_cs(":matchesOwn("):
            self._matches(own=True)
        elif tq.matches_cs(":not("):
            self._not()
        elif tq.match_chomp(":nth-child("):
            self._css_nth_child(IsNthChild)
        elif tq.match_chomp(":nth-last-child("):
            self._css_nth_child(IsNthLastChild)
        elif tq.match_chomp(":nth-of-type("):
            self._css_nth_child(IsNthOfType)
        elif tq.match_chomp(":nth-last-of-type("):
            self._css_nth_child(IsNthLastOfType)
        elif tq.match_chomp(":first-child"):
            self.evals.append(IsFirstChild())
        elif tq.match_chomp(":last-child"):
            self.evals.append(IsLastChild())
        elif tq.match_chomp(":first-of-type"):
            self.evals.append(IsFirstOfType())
        elif tq.match_chomp(":last-of-type"):
            self.evals.append(IsLastOfType())
        elif tq.match_chomp(":only-child"):
            self.evals.append(IsOnlyChild())
        elif tq.match_chomp(":only-of-type"):
            self.evals.append(IsOnlyOfType())
        elif tq.match_chomp(":empty"):
            self.evals.append(IsEmpty())
        elif tq.match_chomp(":root"):
            self.evals.append(IsRoot())
        else:
            raise SelectorParseError(
                f"Could not parse query {self.query!r}: unexpected token at "
                f"{tq.remainder()!r}")

    def _by_tag(self) -> None:
        tq = self.tq
        tag_name = TokenQueue.unescape(tq.consume_element_selector())
        if not tag_name:
            raise SelectorParseError("empty tag name")
        if tag_name.startswith("*|"):
            plain = tag_name[2:].lower()
            self.evals.append(Or([TagIs(plain),
                                  TagEndsWith(":" + plain)]))
        else:
            if "|" in tag_name:
                tag_name = tag_name.replace("|", ":")
            self.evals.append(TagIs(tag_name.strip().lower()))

    def _by_attribute(self) -> None:
        tq = self.tq
        cq = TokenQueue(tq.chomp_balanced("[", "]"))
        key = cq.consume_to_any(*_ATTRIBUTE_EVALS).strip()
        if not key:
            raise SelectorParseError("empty attribute name")
        cq.consume_whitespace()
        if cq.is_empty():
            if key.startswith("^"):
                self.evals.append(AttributeStarting(key[1:]))
            else:
                self.evals.append(HasAttribute(key))
        else:
            if cq.match_chomp("="):
                self.evals.append(
                    AttributeWithValue(key, cq.remainder()))
            elif cq.match_chomp("!="):
                self.evals.append(
                    AttributeWithValueNot(key, cq.remainder()))
            elif cq.match_chomp("^="):
                self.evals.append(
                    AttributeWithValueStarting(key, cq.remainder()))
            elif cq.match_chomp("$="):
                self.evals.append(
                    AttributeWithValueEnding(key, cq.remainder()))
            elif cq.match_chomp("*="):
                self.evals.append(
                    AttributeWithValueContaining(key, cq.remainder()))
            elif cq.match_chomp("~="):
                self.evals.append(
                    AttributeWithValueMatching(key, cq.remainder()))
            else:
                raise SelectorParseError(
                    f"Could not parse attribute query: {cq.remainder()!r}")

    def _consume_index(self) -> int:
        # the "(" was already chomped by the caller; read up to ")"
        index = self.tq.consume_to_any(")").strip()
        self.tq.match_chomp(")")
        if not index.lstrip("+-").isdigit():
            raise SelectorParseError("index must be numeric")
        return int(index)

    def _has(self) -> None:
        self.tq.match_chomp(":has")
        sub = self.tq.chomp_balanced("(", ")")
        if not sub:
            raise SelectorParseError(":has(el) subselect must not be empty")
        self.evals.append(Has(parse_query(sub)))

    def _contains(self, own: bool) -> None:
        self.tq.match_chomp(":containsOwn" if own else ":contains")
        search = TokenQueue.unescape(self.tq.chomp_balanced("(", ")"))
        if not search:
            raise SelectorParseError(":contains(text) must not be empty")
        self.evals.append(
            ContainsOwnText(search) if own else ContainsText(search))

    def _contains_data(self) -> None:
        self.tq.match_chomp(":containsData")
        search = TokenQueue.unescape(self.tq.chomp_balanced("(", ")"))
        if not search:
            raise SelectorParseError(":containsData(t) must not be empty")
        self.evals.append(ContainsData(search))

    def _matches(self, own: bool) -> None:
        self.tq.match_chomp(":matchesOwn" if own else ":matches")
        regex = self.tq.chomp_balanced("(", ")")
        if not regex:
            raise SelectorParseError(":matches(regex) must not be empty")
        self.evals.append(
            MatchesOwnText(regex) if own else MatchesText(regex))

    def _not(self) -> None:
        self.tq.match_chomp(":not")
        sub = self.tq.chomp_balanced("(", ")")
        if not sub:
            raise SelectorParseError(":not(selector) must not be empty")
        self.evals.append(Not(parse_query(sub)))

    def _css_nth_child(self, cls) -> None:
        # the "(" was already chomped by the caller; read up to ")"
        arg = self.tq.consume_to_any(")").strip().lower()
        self.tq.match_chomp(")")
        if arg == "odd":
            a, b = 2, 1
        elif arg == "even":
            a, b = 2, 0
        else:
            m = _NTH.match(arg)
            if m is None:
                raise SelectorParseError(
                    f"Could not parse nth-index {arg!r}")
            if m.group(3) is not None or "n" in arg:
                # an+b form
                nm = re.match(
                    r"^([+-]?\d*)n\s*(?:([+-])\s*(\d+))?$", arg)
                if nm is None:
                    raise SelectorParseError(
                        f"Could not parse nth-index {arg!r}")
                coeff = nm.group(1)
                if coeff in ("", "+"):
                    a = 1
                elif coeff == "-":
                    a = -1
                else:
                    a = int(coeff)
                if nm.group(2):
                    b = int(nm.group(3))
                    if nm.group(2) == "-":
                        b = -b
                else:
                    b = 0
            else:
                a = 0
                b = int(arg)
        self.evals.append(cls(a, b))


_QUERY_CACHE: dict[str, Evaluator] = {}
_QUERY_CACHE_MAX = 512


def parse_query(query: str) -> Evaluator:
    """Compile a CSS selector into an Evaluator tree, with a small
    per-process cache (reference QueryParser LRU cache; per-actor in Ray)."""
    ev = _QUERY_CACHE.get(query)
    if ev is not None:
        return ev
    ev = QueryParser(query).parse()
    if len(_QUERY_CACHE) < _QUERY_CACHE_MAX:
        _QUERY_CACHE[query] = ev
    return ev


# -- Collector / select -----------------------------------------------------

def _collect_dfs(evaluator: Evaluator, root: Element) -> list[Element]:
    """DFS the subtree under root, collecting matching elements in
    document order (reference Collector.collect)."""
    out: list[Element] = []
    stack: list[Node] = [root]
    while stack:
        node = stack.pop()
        if isinstance(node, Element):
            if evaluator.matches(root, node):
                out.append(node)
            if node.child_nodes:
                stack.extend(reversed(node.child_nodes))
    return out


# -- lazy per-document query index ------------------------------------------
# Reference: Element.swift:303-345 (lazy per-root tag/id/class indexes),
# Collector.swift:177+ (index-seeded candidate sets), CssSelector.swift:
# 511-1086 (fast query plan for simple selectors). One DFS over the
# TOPMOST root numbers every element (enter/exit intervals) and buckets
# it by tag normal-name, exact id value and lowercased class name. A
# collect() whose evaluator carries a simple Tag/Id/Class predicate on
# the candidate element then scans only that bucket, testing subtree
# membership with an O(1) interval check — so e.g. the extract kernel's
# per-block select("a") costs O(#anchors) instead of O(subtree) per
# block. Built lazily on the SECOND collect against the same tree in
# the same mutation epoch (a single select is cheaper as a plain DFS);
# invalidated wholesale on any DOM epoch bump, same policy as the SLRU
# result cache below.

class _RootIndex:
    __slots__ = ("order", "by_tag", "by_id", "by_class", "_els",
                 "_enters")

    def __init__(self, top: Element) -> None:
        # One walk builds the enter/exit intervals and the tag buckets
        # (one dict get + list appends per element). id/class buckets
        # need per-element attribute scans, so they build lazily on
        # the first id/class-seeded query (many workloads — e.g. the
        # extract kernel's select("a") — never pay for them).
        order: dict = {}
        by_tag: dict = {}
        els: list = []
        enters: list = []
        counter = 0
        stack: list = [(top, False)]
        while stack:
            node, is_exit = stack.pop()
            if is_exit:
                order[id(node)][1] = counter
                continue
            if not isinstance(node, Element):
                continue
            counter += 1
            order[id(node)] = [counter, counter]
            els.append(node)
            enters.append(counter)
            # buckets are (enter_numbers, elements) parallel lists in
            # document order — candidates within a subtree [lo, hi]
            # come out of ONE bisect range, O(log A + k) per select
            b = by_tag.get(node.tag.normal_name)
            if b is None:
                by_tag[node.tag.normal_name] = b = ([], [])
            b[0].append(counter)
            b[1].append(node)
            if node.child_nodes:
                stack.append((node, True))
                for child in reversed(node.child_nodes):
                    stack.append((child, False))
        self.order = order
        self.by_tag = by_tag
        self.by_id = None
        self.by_class = None
        self._els = els
        self._enters = enters

    def _build_attr_buckets(self) -> None:
        by_id: dict = {}
        by_class: dict = {}
        for pos, node in zip(self._enters, self._els):
            idv = node.id()
            if idv:
                b = by_id.get(idv)
                if b is None:
                    by_id[idv] = b = ([], [])
                b[0].append(pos)
                b[1].append(node)
            attrs = node.attributes
            cls = attrs.get_ignore_case("class") if attrs is not None \
                else ""
            if cls:
                for c in cls.split():
                    c = c.lower()
                    b = by_class.get(c)
                    if b is None:
                        by_class[c] = b = ([], [])
                    b[0].append(pos)
                    b[1].append(node)
        self.by_id = by_id
        self.by_class = by_class

    def candidates(self, key, lo: int, hi: int) -> list:
        kind, val = key
        if kind == "tag":
            bucket = self.by_tag.get(val)
        else:
            if self.by_id is None:
                self._build_attr_buckets()
            bucket = (self.by_id if kind == "id"
                      else self.by_class).get(val)
        if bucket is None:
            return []
        enters, els = bucket
        i = bisect_left(enters, lo)
        j = bisect_right(enters, hi, i)
        return els[i:j]


def _seed_key(ev: Evaluator):
    """(kind, value) bucket that is COMPLETE for ev (superset of its
    matches), or None. Only predicates on the candidate element itself
    qualify: combinators wrap the left side in Parent/ImmediateParent/
    PreviousSibling structurals (QueryParser._combinator), so direct
    And members are always candidate-element predicates."""
    if isinstance(ev, TagIs):
        return ("tag", ev.name)
    if isinstance(ev, IdIs):
        return ("id", ev.id)
    if isinstance(ev, ClassIs):
        # has_class compares case-insensitively; index keys lowercase
        return ("cls", ev.cls.lower())
    if isinstance(ev, And):
        for sub in reversed(ev.evaluators):
            if isinstance(sub, (TagIs, IdIs, ClassIs, And)):
                key = _seed_key(sub)
                if key is not None:
                    return key
    return None


_QI_MAX = 16
_QUERY_INDEX: OrderedDict = OrderedDict()  # id(top) -> (wref, idx|None)
_QI_EPOCH = [-1]


def _top_root(root: Element):
    top = root
    while top.parent_node is not None:
        top = top.parent_node
    return top


def collect(evaluator: Evaluator, root: Element) -> list[Element]:
    """Collect elements under root matching evaluator, in document
    order. Seeds candidates from the lazy per-document index when the
    evaluator carries a simple tag/id/class predicate; falls back to
    the full DFS otherwise."""
    from .dom import _DOM_EPOCH
    key = _seed_key(evaluator)
    if key is None:
        return _collect_dfs(evaluator, root)
    epoch = _DOM_EPOCH[0]
    if epoch != _QI_EPOCH[0]:
        _QUERY_INDEX.clear()
        _QI_EPOCH[0] = epoch
    top = _top_root(root)
    if not isinstance(top, Element):
        return _collect_dfs(evaluator, root)
    entry = _QUERY_INDEX.get(id(top))
    if entry is None or entry[0]() is not top:
        # first touch this epoch: mark seen, stay on the DFS path
        try:
            _QUERY_INDEX[id(top)] = (weakref.ref(top), None)
        except TypeError:
            return _collect_dfs(evaluator, root)
        if len(_QUERY_INDEX) > _QI_MAX:
            _QUERY_INDEX.popitem(last=False)
        return _collect_dfs(evaluator, root)
    idx = entry[1]
    if idx is None:
        idx = _RootIndex(top)
        _QUERY_INDEX[id(top)] = (entry[0], idx)
    _QUERY_INDEX.move_to_end(id(top))
    span = idx.order.get(id(root))
    if span is None:  # root not under top (shouldn't happen) — bail
        return _collect_dfs(evaluator, root)
    lo, hi = span
    cands = idx.candidates(key, lo, hi)
    # bare TagIs/IdIs buckets ARE the exact match set; everything else
    # (incl. ClassIs, whose bucket is a case-folded superset) re-tests
    if type(evaluator) in (TagIs, IdIs):
        return cands
    return [el for el in cands if evaluator.matches(root, el)]


# SLRU select-result cache (reference Element.swift:303-367,3175-3255:
# per-root query index + SLRU result cache). Validity is keyed on the
# global DOM mutation epoch (dom._DOM_EPOCH): ANY mutation anywhere
# invalidates everything, so the cache only serves the read-heavy
# many-selects-per-document window — exactly where it pays. The whole
# cache is dropped at the first select after an epoch change, so stale
# entries never pin dead DOMs in a long-lived worker. Entries guard
# against id() reuse with a weakref identity check.
_SLRU_MAX = 128  # per segment
_SEL_PROBATION: OrderedDict = OrderedDict()
_SEL_PROTECTED: OrderedDict = OrderedDict()
_SEL_EPOCH = [-1]


def select(query: str, root: Element) -> list[Element]:
    from .dom import _DOM_EPOCH
    epoch = _DOM_EPOCH[0]
    if epoch != _SEL_EPOCH[0]:
        _SEL_PROBATION.clear()
        _SEL_PROTECTED.clear()
        _SEL_EPOCH[0] = epoch
    else:
        key = (id(root), query)
        entry = _SEL_PROTECTED.get(key)
        if entry is not None:
            if entry[0]() is root:
                _SEL_PROTECTED.move_to_end(key)
                return list(entry[1])
            del _SEL_PROTECTED[key]
        else:
            entry = _SEL_PROBATION.pop(key, None)
            if entry is not None:
                if entry[0]() is root:  # 2nd hit → promote
                    _SEL_PROTECTED[key] = entry
                    if len(_SEL_PROTECTED) > _SLRU_MAX:
                        demoted = _SEL_PROTECTED.popitem(last=False)
                        _SEL_PROBATION[demoted[0]] = demoted[1]
                    return list(entry[1])
    result = collect(parse_query(query), root)
    try:
        ref = weakref.ref(root)
    except TypeError:
        return result
    _SEL_PROBATION[(id(root), query)] = (ref, result)
    if len(_SEL_PROBATION) > _SLRU_MAX:
        _SEL_PROBATION.popitem(last=False)
    return list(result)


def select_many(query: str, roots: list[Element]) -> list[Element]:
    evaluator = parse_query(query)
    seen: set[int] = set()
    out: list[Element] = []
    for root in roots:
        for el in collect(evaluator, root):
            if id(el) not in seen:
                seen.add(id(el))
                out.append(el)
    return out


def matches(query: str, element: Element) -> bool:
    evaluator = parse_query(query)
    root = element.root()
    return evaluator.matches(root if isinstance(root, Element) else element,
                             element)


def filter_out(elements: list[Element], out_els: list[Element]) \
        -> list[Element]:
    out_ids = {id(e) for e in out_els}
    return [e for e in elements if id(e) not in out_ids]

"""HTML tree builder: stack of open elements, active formatting elements,
foster parenting, scope queries, insertion-mode machinery.

Parity targets: /root/reference/Sources/TreeBuilder.swift:148-156 (token
pump), HtmlTreeBuilder.swift (stack/scope/formatting machinery :580-1430,
Noah's-ark clause :1291-1309, reconstruction :1325-1366, foster parenting
:1409-1430) — re-implemented fresh from the public WHATWG algorithm.
"""

from __future__ import annotations

from typing import Optional

from .dom import (Attributes, Comment, DataNode, Document, DocumentType,
                  Element, FormElement, Node, TextNode)
from .tags import Tag, tag_for
from .textutil import is_blank
from .tokenizer import (CharacterReader, CharacterTok, CommentTok,
                        DoctypeTok, EOFTok, TagTok, Tokeniser)


class ParseSettings:
    __slots__ = ("preserve_tag_case", "preserve_attr_case",
                 "track_source_ranges")

    def __init__(self, preserve_tag_case: bool = False,
                 preserve_attr_case: bool = False,
                 track_source_ranges: bool = False) -> None:
        # track_source_ranges: record (start, end) source offsets on
        # nodes (reference ParseSettings.swift:22-66 trackSourceRanges)
        self.preserve_tag_case = preserve_tag_case
        self.preserve_attr_case = preserve_attr_case
        self.track_source_ranges = track_source_ranges

    def normalise_tag(self, name: str) -> str:
        name = name.strip()
        return name if self.preserve_tag_case else name.lower()

    def normalise_attributes(self, attrs: dict[str, str]) -> dict[str, str]:
        if self.preserve_attr_case:
            return attrs
        out: dict[str, str] = {}
        for k, v in attrs.items():
            lk = k.lower()
            if lk not in out:
                out[lk] = v
        return out


HTML_DEFAULT = ParseSettings(False, False)
PRESERVE_CASE = ParseSettings(True, True)


_FOSTER_TABLE_NAMES = frozenset(("table", "tbody", "tfoot", "thead", "tr"))


class ElementStack(list):
    """Open-elements stack with O(1) identity membership — keeps
    reconstruct_formatting_elements / on_stack linear on deep DOMs
    (pathological nesting was quadratic with a plain list scan).

    Also maintains a normal-name → count map (``_names``) so scope
    queries can answer "target not on the stack at all" in O(1)
    instead of walking the whole stack — the dominant case for
    ``in_button_scope("p")`` on deeply nested non-p markup, which
    profiling showed at ~19% of total parse time. Counts key on
    ``el.tag.normal_name`` at push time; tags are immutable during
    parsing (the ``tagName`` mutation API is post-parse only), so
    the pop-time name always matches."""

    __slots__ = ("_ids", "_names")

    def __init__(self) -> None:
        super().__init__()
        self._ids: dict[int, int] = {}
        self._names: dict[str, int] = {}

    def _inc(self, el) -> None:
        i = id(el)
        self._ids[i] = self._ids.get(i, 0) + 1
        nm = el.tag.normal_name
        self._names[nm] = self._names.get(nm, 0) + 1

    def _dec(self, el) -> None:
        i = id(el)
        n = self._ids.get(i, 0) - 1
        if n <= 0:
            self._ids.pop(i, None)
        else:
            self._ids[i] = n
        nm = el.tag.normal_name
        c = self._names.get(nm, 0) - 1
        if c <= 0:
            self._names.pop(nm, None)
        else:
            self._names[nm] = c

    def append(self, el) -> None:
        super().append(el)
        self._inc(el)

    def pop(self, index: int = -1):
        el = super().pop(index)
        self._dec(el)
        return el

    def insert(self, index: int, el) -> None:
        super().insert(index, el)
        self._inc(el)

    def __delitem__(self, index) -> None:
        el = self[index]
        super().__delitem__(index)
        self._dec(el)

    def __setitem__(self, index, el) -> None:
        old = self[index]
        super().__setitem__(index, el)
        self._dec(old)
        self._inc(el)

    def contains_el(self, el) -> bool:
        return id(el) in self._ids


class HtmlTreeBuilder:
    """One instance per parse; never shared across documents."""

    TAGS_SEARCH_IN_SCOPE = ("applet", "caption", "html", "marquee", "object",
                            "table", "td", "th")
    TAGS_SEARCH_LIST = ("ol", "ul")
    TAGS_SEARCH_BUTTON = ("button",)
    TAGS_SEARCH_TABLE_SCOPE = ("html", "table")
    TAGS_SEARCH_SELECT_SCOPE = ("optgroup", "option")
    TAGS_SEARCH_ENDTAGS = ("dd", "dt", "li", "optgroup", "option", "p",
                           "rp", "rt")
    TAGS_SPECIAL = frozenset((
        "address", "applet", "area", "article", "aside", "base", "basefont",
        "bgsound", "blockquote", "body", "br", "button", "caption", "center",
        "col", "colgroup", "command", "dd", "details", "dir", "div", "dl",
        "dt", "embed", "fieldset", "figcaption", "figure", "footer", "form",
        "frame", "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head",
        "header", "hgroup", "hr", "html", "iframe", "img", "input", "isindex",
        "li", "link", "listing", "marquee", "menu", "meta", "nav", "noembed",
        "noframes", "noscript", "object", "ol", "p", "param", "plaintext",
        "pre", "script", "section", "select", "style", "summary", "table",
        "tbody", "td", "textarea", "tfoot", "th", "thead", "title", "tr",
        "ul", "wbr", "xmp"))

    def __init__(self, settings: Optional[ParseSettings] = None) -> None:
        self.settings = settings or HTML_DEFAULT
        self.reader: Optional[CharacterReader] = None
        self.tokeniser: Optional[Tokeniser] = None
        self.doc: Optional[Document] = None
        self.stack: ElementStack = ElementStack()
        self.base_uri = ""
        self.current_token = None
        self.errors: Optional[list] = None
        # html-specific state
        from . import treebuilder_states as st
        self.st = st
        self.state = st.initial
        self.original_state = None
        self.baseuri_set_from_doc = False
        self.head_element: Optional[Element] = None
        self.form_element: Optional[FormElement] = None
        self.context_element: Optional[Element] = None
        self.formatting_elements: list[Optional[Element]] = []
        self.pending_table_characters: list[str] = []
        self.empty_end = TagTok(False)
        self.frameset_ok = True
        self.foster_inserts = False
        self.fragment_parsing = False
        # per-parse raw-token-name → interned Tag memo (skips the
        # strip/lower + registry lookup on every repeated tag)
        self._tag_memo: dict[str, "Tag"] = {}
        self.track = self.settings.track_source_ranges

    # -- entry points -----------------------------------------------------
    def parse(self, html: str, base_uri: str = "",
              errors: Optional[list] = None) -> Document:
        self._init_parse(html, base_uri, errors)
        self._run_parser()
        if self.track:
            self.doc.source = html  # enables the patch serializer
            # parse-time construction may have marked nodes dirty
            # (e.g. doctype attrs) — the freshly parsed tree IS the
            # source; only post-parse mutations count as dirty
            stack = [self.doc]
            while stack:
                n = stack.pop()
                try:
                    del n._src_dirty
                except AttributeError:
                    pass
                stack.extend(n.child_nodes)
        return self.doc

    def parse_fragment(self, fragment: str, context: Optional[Element],
                       base_uri: str = "",
                       errors: Optional[list] = None) -> list[Node]:
        self._init_parse(fragment, base_uri, errors)
        self.context_element = context
        self.fragment_parsing = True
        root: Optional[Element] = None
        st = self.st
        if context is not None:
            cdoc = context.owner_document()
            if cdoc is not None:
                self.doc.quirks_mode = cdoc.quirks_mode
            name = context.tag.normal_name
            tk = self.tokeniser
            from . import tokenizer as tz
            # reference HtmlTreeBuilder.parseFragment:102-115 — title/
            # textarea AND the frames set start in Rcdata; lastStartTag is
            # NOT seeded, so the no-end-tag-coming divergence can't fire
            # and bare markup becomes text (ElementTest testSetHtmlTitle)
            if name in ("title", "textarea", "iframe", "noembed",
                        "noframes", "style", "xmp"):
                tk.state = tz.rcdata_state
            elif name == "script":
                tk.state = tz.script_data_state
            else:
                tk.state = tz.data_state
            root = Element(tag_for("html"), base_uri)
            self.doc.append_child_fast(root)
            self.stack.append(root)
            self.reset_insertion_mode()
            # set up the form element to nearest form ancestor
            el: Optional[Node] = context
            while isinstance(el, Element):
                if isinstance(el, FormElement):
                    self.form_element = el
                    break
                el = el.parent_node
        self._run_parser()
        if context is not None and root is not None:
            return list(root.child_nodes)
        return list(self.doc.child_nodes)

    def _init_parse(self, html: str, base_uri: str,
                    errors: Optional[list]) -> None:
        self.doc = Document(base_uri)
        self.doc.output_settings.pretty_print = True
        self.reader = CharacterReader(html)
        self.errors = errors
        self.track = self.settings.track_source_ranges
        self.tokeniser = Tokeniser(self.reader, errors,
                                   track_source=self.track)
        self.stack = ElementStack()
        self.base_uri = base_uri

    def _run_parser(self) -> None:
        from .dom import _DOM_EPOCH
        tk = self.tokeniser
        read = tk.read
        while True:
            token = read()
            # inlined self.process(token) — one call/token saved
            self.current_token = token
            self.state(token, self)
            if token.__class__ is EOFTok:
                break
        # builders append via append_child_fast (no per-node epoch
        # bump); one bump here keeps the selector cache correct
        _DOM_EPOCH[0] += 1

    # -- token processing -------------------------------------------------
    def process(self, token) -> bool:
        self.current_token = token
        return self.state(token, self)

    def process_in(self, token, state) -> bool:
        self.current_token = token
        return state(token, self)

    def process_start(self, name: str,
                      attrs: Optional[dict] = None) -> bool:
        tag = TagTok(True)
        tag.name = name
        if attrs:
            tag.attrs = dict(attrs)
        return self.process(tag)

    def process_end(self, name: str) -> bool:
        tag = TagTok(False)
        tag.name = name
        return self.process(tag)

    def error(self, msg: str) -> None:
        if self.errors is not None and len(self.errors) < 64:
            self.errors.append((self.reader.pos if self.reader else -1, msg))

    def transition(self, state) -> None:
        self.state = state

    def mark_insertion_mode(self) -> None:
        self.original_state = self.state

    # -- current element --------------------------------------------------
    def current_element(self) -> Optional[Element]:
        return self.stack[-1] if self.stack else None

    def get_document(self) -> Document:
        return self.doc

    # -- insertion --------------------------------------------------------
    def _tag_for_token(self, tok: TagTok) -> Tag:
        name = tok.name or ""
        tag = self._tag_memo.get(name)
        if tag is None:
            if len(self._tag_memo) > 4096:  # adversarial-input bound
                self._tag_memo.clear()
            tag = self._tag_memo[name] = tag_for(
                self.settings.normalise_tag(name),
                self.settings.preserve_tag_case)
        return tag

    def _attrs_for_token(self, tok: TagTok) -> Optional[Attributes]:
        if not tok.attrs:
            return None
        attrs = Attributes()
        if self.settings.preserve_attr_case:
            attrs._d = dict(tok.attrs)
        else:
            d = attrs._d
            for k, v in tok.attrs.items():
                lk = k.lower()
                if lk not in d:
                    d[lk] = v
        return attrs

    def insert(self, start_tag: TagTok) -> Element:
        if start_tag.self_closing:
            # handles <script /> etc: ensure we get out of whatever
            # tokeniser state we were put in, then immediately close
            el = self.insert_empty(start_tag)
            self.stack.append(el)
            from . import tokenizer as tz
            self.tokeniser.state = tz.data_state
            # enqueue a synthetic end tag; processed on the next token
            # read, AFTER the caller finishes (e.g. formatting push)
            self.empty_end = TagTok(False)
            self.empty_end.name = el.tag.name
            self.tokeniser.emit(self.empty_end)
            return el
        el = Element(self._tag_for_token(start_tag), self.base_uri,
                     self._attrs_for_token(start_tag))
        if self.track and start_tag.src_start is not None:
            el._src_range = (start_tag.src_start, start_tag.src_end)
        self.insert_node(el)
        self.stack.append(el)
        return el

    def insert_start_tag(self, name: str) -> Element:
        el = Element(tag_for(name), self.base_uri)
        self.insert_node(el)
        self.stack.append(el)
        return el

    def insert_element(self, el: Element) -> Element:
        self.insert_node(el)
        self.stack.append(el)
        return el

    def insert_empty(self, start_tag: TagTok) -> Element:
        tag = self._tag_for_token(start_tag)
        if start_tag.self_closing:
            if tag.known:
                if not tag.is_self_closing():
                    self.tokeniser.error("self-closing known non-void tag")
            else:
                # per-element copy; never mutate the interned Tag
                from .tags import as_self_closing
                tag = as_self_closing(tag)
        el = Element(tag, self.base_uri, self._attrs_for_token(start_tag))
        if self.track and start_tag.src_start is not None:
            el._src_range = (start_tag.src_start, start_tag.src_end)
        self.insert_node(el)
        return el

    def insert_form(self, start_tag: TagTok, on_stack: bool) -> FormElement:
        tag = self._tag_for_token(start_tag)
        el = FormElement(tag, self.base_uri, self._attrs_for_token(start_tag))
        self.form_element = el
        self.insert_node(el)
        if on_stack:
            self.stack.append(el)
        return el

    def insert_comment(self, tok: CommentTok) -> None:
        node = Comment(tok.get_data(), self.base_uri)
        self.insert_node(node)

    def insert_character(self, tok: CharacterTok) -> None:
        # specialized insert_node: text/data nodes are never form
        # controls, and the script/style vs foster cases are mutually
        # exclusive, so the generic isinstance checks are skipped
        data = tok.data
        stack = self.stack
        cur = stack[-1] if stack else None
        name = cur.tag.normal_name if cur is not None else ""
        if name in ("script", "style"):
            node: Node = DataNode(data, self.base_uri)
        else:
            node = TextNode(data, self.base_uri)
        if self.track and tok.src_start is not None:
            node._src_range = (tok.src_start, tok.src_end)
        if cur is None:
            self.doc.append_child_fast(node)
        elif self.foster_inserts and name in _FOSTER_TABLE_NAMES:
            self.insert_in_foster_parent(node)
        else:
            cur.append_child_fast(node)

    def insert_node(self, node: Node) -> None:
        stack = self.stack
        if not stack:
            self.doc.append_child_fast(node)
        else:
            cur = stack[-1]
            if self.foster_inserts \
                    and isinstance(node, (Element, TextNode)) \
                    and cur.tag.normal_name in _FOSTER_TABLE_NAMES:
                self.insert_in_foster_parent(node)
            else:
                cur.append_child_fast(node)
        # wire up form controls
        if isinstance(node, Element) and node.tag.form_list:
            if self.form_element is not None:
                self.form_element.add_element(node)

    # -- stack manipulation ----------------------------------------------
    def push(self, el: Element) -> None:
        self.stack.append(el)

    def pop(self) -> Element:
        el = self.stack.pop()
        if self.track:
            tok = self.current_token
            if (isinstance(tok, TagTok) and not tok.start
                    and tok.src_start is not None
                    and tok.normal_name() == el.tag.normal_name):
                el._end_src_range = (tok.src_start, tok.src_end)
        return el

    def on_stack(self, el: Element) -> bool:
        return self.stack.contains_el(el)

    def get_from_stack(self, name: str) -> Optional[Element]:
        for el in reversed(self.stack):
            if el.tag.normal_name == name:
                return el
        return None

    def remove_from_stack(self, el: Element) -> bool:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] is el:
                del self.stack[i]
                return True
        return False

    def pop_stack_to_close(self, *names: str) -> None:
        while self.stack:
            el = self.pop()
            if el.tag.normal_name in names:
                break

    def pop_stack_to_before(self, *names: str) -> None:
        while self.stack:
            if self.stack[-1].tag.normal_name in names:
                break
            self.stack.pop()

    def clear_stack_to_table_context(self) -> None:
        self._clear_stack_to_context("table")

    def clear_stack_to_table_body_context(self) -> None:
        self._clear_stack_to_context("tbody", "tfoot", "thead")

    def clear_stack_to_table_row_context(self) -> None:
        self._clear_stack_to_context("tr")

    def _clear_stack_to_context(self, *names: str) -> None:
        while self.stack:
            name = self.stack[-1].tag.normal_name
            if name in names or name == "html":
                break
            self.stack.pop()

    def above_on_stack(self, el: Element) -> Optional[Element]:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] is el:
                return self.stack[i - 1] if i > 0 else None
        return None

    def insert_on_stack_after(self, after: Element, inel: Element) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] is after:
                self.stack.insert(i + 1, inel)
                return
        raise ValueError("element not on stack")

    def replace_on_stack(self, out: Element, inel: Element) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] is out:
                self.stack[i] = inel
                return
        raise ValueError("element not on stack")

    # -- insertion-mode reset --------------------------------------------
    def reset_insertion_mode(self) -> None:
        st = self.st
        last = False
        for i in range(len(self.stack) - 1, -1, -1):
            node = self.stack[i]
            if i == 0:
                last = True
                if self.fragment_parsing and self.context_element is not None:
                    node = self.context_element
            name = node.tag.normal_name
            if name == "select":
                self.transition(st.in_select)
                return
            if name in ("td", "th") and not last:
                self.transition(st.in_cell)
                return
            if name == "tr":
                self.transition(st.in_row)
                return
            if name in ("tbody", "thead", "tfoot"):
                self.transition(st.in_table_body)
                return
            if name == "caption":
                self.transition(st.in_caption)
                return
            if name == "colgroup":
                self.transition(st.in_column_group)
                return
            if name == "table":
                self.transition(st.in_table)
                return
            if name == "head" and not last:
                self.transition(st.in_head)
                return
            if name == "body":
                self.transition(st.in_body)
                return
            if name == "frameset":
                self.transition(st.in_frameset)
                return
            if name == "html":
                self.transition(st.before_head if self.head_element is None
                                else st.after_head)
                return
            if last:
                self.transition(st.in_body)
                return

    # -- scope queries ----------------------------------------------------
    def _in_specific_scope(self, target_names, base_types,
                           extra_types=None) -> bool:
        # O(1) fast path: if no target name is on the stack at all,
        # the walk can only return False — skip the O(depth) scan
        # (the common case for deep non-target nesting).
        counts = self.stack._names
        for t in target_names:
            if counts.get(t, 0):
                break
        else:
            return False
        for el in reversed(self.stack):
            name = el.tag.normal_name
            if name in target_names:
                return True
            if name in base_types:
                return False
            if extra_types and name in extra_types:
                return False
        return False

    def in_scope(self, names, extra=None) -> bool:
        if isinstance(names, str):
            names = (names,)
        return self._in_specific_scope(names, self.TAGS_SEARCH_IN_SCOPE,
                                       extra)

    def in_list_item_scope(self, name: str) -> bool:
        return self.in_scope(name, self.TAGS_SEARCH_LIST)

    def in_button_scope(self, name: str) -> bool:
        return self.in_scope(name, self.TAGS_SEARCH_BUTTON)

    def in_table_scope(self, name: str) -> bool:
        return self._in_specific_scope((name,),
                                       self.TAGS_SEARCH_TABLE_SCOPE)

    def in_select_scope(self, name: str) -> bool:
        for i in range(len(self.stack) - 1, -1, -1):
            el_name = self.stack[i].tag.normal_name
            if el_name == name:
                return True
            if el_name not in self.TAGS_SEARCH_SELECT_SCOPE:
                return False
        return False

    # -- implied end tags -------------------------------------------------
    def generate_implied_end_tags(self,
                                  exclude: Optional[str] = None) -> None:
        while self.stack:
            name = self.stack[-1].tag.normal_name
            if name in self.TAGS_SEARCH_ENDTAGS and \
                    (exclude is None or name != exclude):
                self.stack.pop()
            else:
                break

    def is_special(self, el: Element) -> bool:
        return el.tag.normal_name in self.TAGS_SPECIAL

    # -- active formatting elements ---------------------------------------
    def push_active_formatting_elements(self, el: Element) -> None:
        # Noah's Ark: max 3 matching entries since last marker
        num_seen = 0
        fe = self.formatting_elements
        for i in range(len(fe) - 1, -1, -1):
            entry = fe[i]
            if entry is None:
                break
            if self._is_same_formatting_element(el, entry):
                num_seen += 1
            if num_seen == 3:
                del fe[i]
                break
        fe.append(el)

    @staticmethod
    def _is_same_formatting_element(a: Element, b: Element) -> bool:
        if a.tag.normal_name != b.tag.normal_name:
            return False
        aa = a.attributes
        ba = b.attributes
        if aa is None and ba is None:
            return True
        if aa is None or ba is None:
            return (aa or Attributes()).size() == (ba or Attributes()).size()
        return aa == ba

    def reconstruct_formatting_elements(self) -> None:
        # inlined last_formatting_element + on_stack: this runs once
        # per character run / element insert in body
        fe_list = self.formatting_elements
        if not fe_list:
            return
        last = fe_list[-1]
        if last is None or id(last) in self.stack._ids:
            return
        fe = self.formatting_elements
        pos = len(fe) - 1
        entry = fe[pos]
        skip = False
        while True:
            if pos == 0:
                skip = True
                break
            pos -= 1
            entry = fe[pos]
            if entry is None or self.on_stack(entry):
                break
        while True:
            if not skip:
                pos += 1
                entry = fe[pos]
            assert entry is not None
            skip = False
            new_el = self.insert_start_tag(entry.tag.normal_name)
            if entry.attributes is not None:
                new_el._attrs().add_all(entry.attributes)
            fe[pos] = new_el
            if pos == len(fe) - 1:
                break

    def clear_formatting_elements_to_last_marker(self) -> None:
        fe = self.formatting_elements
        while fe:
            entry = fe.pop()
            if entry is None:
                break

    def remove_last_formatting_element(self) -> None:
        if self.formatting_elements:
            self.formatting_elements.pop()

    def last_formatting_element(self) -> Optional[Element]:
        return self.formatting_elements[-1] if self.formatting_elements \
            else None

    def is_in_active_formatting_elements(self, el: Element) -> bool:
        return any(e is el for e in self.formatting_elements)

    def get_active_formatting_element(self,
                                      name: str) -> Optional[Element]:
        for entry in reversed(self.formatting_elements):
            if entry is None:
                break
            if entry.tag.normal_name == name:
                return entry
        return None

    def replace_active_formatting_element(self, out: Element,
                                          inel: Element) -> None:
        fe = self.formatting_elements
        for i in range(len(fe) - 1, -1, -1):
            if fe[i] is out:
                fe[i] = inel
                return
        raise ValueError("element not in formatting list")

    def remove_from_active_formatting_elements(self, el: Element) -> None:
        fe = self.formatting_elements
        for i in range(len(fe) - 1, -1, -1):
            if fe[i] is el:
                del fe[i]
                return

    def insert_marker_to_formatting_elements(self) -> None:
        self.formatting_elements.append(None)

    def insert_in_foster_parent(self, node: Node) -> None:
        last_table = self.get_from_stack("table")
        if last_table is not None:
            if last_table.parent_node is not None:
                last_table.before_node(node)
                return
            foster = self.above_on_stack(last_table)
            if foster is not None:
                foster.append_child_fast(node)
                return
        if self.stack:
            self.stack[0].append_child_fast(node)

    # -- base uri ---------------------------------------------------------
    def maybe_set_base_uri(self, base: Element) -> None:
        if self.baseuri_set_from_doc:
            return
        href = base.abs_url("href") or base.attr("href")
        if href:
            self.base_uri = href
            self.baseuri_set_from_doc = True
            self.doc.set_base_uri(href)

"""The WHATWG insertion modes (Initial … AfterAfterFrameset), including the
adoption-agency algorithm, table text pending buffers, and frameset rules.

Parity target: /root/reference/Sources/HtmlTreeBuilderState.swift:14-2605 —
re-implemented fresh from the public WHATWG tree-construction algorithm.
Each mode is a function ``mode(token, tb) -> bool`` registered by name;
``tb`` is a soupflow.treebuilder.HtmlTreeBuilder.
"""

from __future__ import annotations

from .dom import (Comment, DocumentType, Element, FormElement, TextNode)
from .tags import tag_for
from .textutil import is_blank
from .tokenizer import (CharacterTok, CommentTok, DoctypeTok, EOFTok,
                        TagTok)
from . import tokenizer as tz

_WS = "\t\n\r\f "


def _is_whitespace(token) -> bool:
    if isinstance(token, CharacterTok):
        return all(c in _WS for c in token.data)
    return False


def _ws_chunk(data: str) -> bool:
    return all(c in _WS for c in data)


# ---------------------------------------------------------------------------


def initial(t, tb) -> bool:
    if _is_whitespace(t):
        return True  # ignore
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        name = tb.settings.normalise_tag(t.get_name())
        doctype = DocumentType(name, t.get_public_id(), t.get_system_id(),
                               tb.base_uri, t.pub_sys_key or "")
        tb.get_document().append_child_fast(doctype)
        if t.force_quirks or name != "html" or \
                t.get_public_id() or \
                (t.get_system_id() and t.get_system_id() !=
                 "about:legacy-compat"):
            tb.get_document().quirks_mode = "quirks"
        tb.transition(before_html)
        return True
    tb.transition(before_html)
    return tb.process(t)


def before_html(t, tb) -> bool:
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if _is_whitespace(t):
        return True
    if isinstance(t, TagTok) and t.start and t.normal_name() == "html":
        tb.insert(t)
        tb.transition(before_head)
        return True
    if isinstance(t, TagTok) and not t.start and \
            t.normal_name() in ("head", "body", "html", "br"):
        return _anything_else_before_html(t, tb)
    if isinstance(t, TagTok) and not t.start:
        tb.error("unexpected end tag")
        return False
    return _anything_else_before_html(t, tb)


def _anything_else_before_html(t, tb) -> bool:
    tb.insert_start_tag("html")
    tb.transition(before_head)
    return tb.process(t)


def before_head(t, tb) -> bool:
    if _is_whitespace(t):
        return True
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, TagTok) and t.start and t.normal_name() == "html":
        return in_body(t, tb)
    if isinstance(t, TagTok) and t.start and t.normal_name() == "head":
        head = tb.insert(t)
        tb.head_element = head
        tb.transition(in_head)
        return True
    if isinstance(t, TagTok) and not t.start and \
            t.normal_name() in ("head", "body", "html", "br"):
        tb.process_start("head")
        return tb.process(t)
    if isinstance(t, TagTok) and not t.start:
        tb.error("unexpected end tag")
        return False
    tb.process_start("head")
    return tb.process(t)


def in_head(t, tb) -> bool:
    if _is_whitespace(t):
        tb.insert_character(t)
        return True
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, TagTok):
        name = t.normal_name()
        if t.start:
            if name == "html":
                return in_body(t, tb)
            if name in ("base", "basefont", "bgsound", "command", "link"):
                el = tb.insert_empty(t)
                if name == "base" and el.has_attr("href"):
                    tb.maybe_set_base_uri(el)
                return True
            if name == "meta":
                tb.insert_empty(t)
                return True
            if name == "title":
                _handle_rcdata(t, tb)
                return True
            if name in ("noframes", "style"):
                _handle_rawtext(t, tb)
                return True
            if name == "noscript":
                # (no scripting) parse content as normal
                tb.insert(t)
                tb.transition(in_head_noscript)
                return True
            if name == "script":
                tb.tokeniser.state = tz.script_data_state
                tb.mark_insertion_mode()
                tb.transition(text)
                tb.insert(t)
                return True
            if name == "head":
                tb.error("head inside head")
                return False
        else:
            if name == "head":
                tb.pop()
                tb.transition(after_head)
                return True
            if name in ("body", "html", "br"):
                return _anything_else_in_head(t, tb)
            tb.error("unexpected end tag")
            return False
    return _anything_else_in_head(t, tb)


def _anything_else_in_head(t, tb) -> bool:
    tb.process_end("head")
    return tb.process(t)


def _handle_rcdata(t, tb) -> None:
    tb.tokeniser.state = tz.rcdata_state
    tb.mark_insertion_mode()
    tb.transition(text)
    tb.insert(t)


def _handle_rawtext(t, tb) -> None:
    tb.tokeniser.state = tz.rawtext_state
    tb.mark_insertion_mode()
    tb.transition(text)
    tb.insert(t)


def in_head_noscript(t, tb) -> bool:
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return True
    if isinstance(t, TagTok) and t.start and t.normal_name() == "html":
        return tb.process_in(t, in_body)
    if isinstance(t, TagTok) and not t.start and \
            t.normal_name() == "noscript":
        tb.pop()
        tb.transition(in_head)
        return True
    if _is_whitespace(t) or isinstance(t, CommentTok) or \
            (isinstance(t, TagTok) and t.start and t.normal_name() in
             ("basefont", "bgsound", "link", "meta", "noframes", "style")):
        return tb.process_in(t, in_head)
    if isinstance(t, TagTok) and not t.start and t.normal_name() == "br":
        return _anything_else_in_head_noscript(t, tb)
    if (isinstance(t, TagTok) and t.start and
            t.normal_name() in ("head", "noscript")) or \
            (isinstance(t, TagTok) and not t.start):
        tb.error("unexpected token")
        return False
    return _anything_else_in_head_noscript(t, tb)


def _anything_else_in_head_noscript(t, tb) -> bool:
    # recovery: re-emit the token as literal text inside noscript
    tb.error("unexpected token in head noscript")
    if isinstance(t, CharacterTok):
        tb.insert_character(t)
        return True
    if isinstance(t, EOFTok):
        return True
    if isinstance(t, TagTok):
        tb.insert_character(CharacterTok(t.to_source_string()))
        return True
    if isinstance(t, CommentTok):
        tb.insert_character(
            CharacterTok(f"<!--{t.get_data()}-->"))
        return True
    return True


def after_head(t, tb) -> bool:
    if _is_whitespace(t):
        tb.insert_character(t)
        return True
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return True
    if isinstance(t, TagTok) and t.start:
        name = t.normal_name()
        if name == "html":
            return tb.process_in(t, in_body)
        if name == "body":
            tb.insert(t)
            tb.frameset_ok = False
            tb.transition(in_body)
            return True
        if name == "frameset":
            tb.insert(t)
            tb.transition(in_frameset)
            return True
        if name in ("base", "basefont", "bgsound", "link", "meta",
                    "noframes", "script", "style", "title"):
            tb.error("token out of place")
            head = tb.head_element
            tb.push(head)
            result = tb.process_in(t, in_head)
            tb.remove_from_stack(head)
            return result
        if name == "head":
            tb.error("head out of place")
            return False
    if isinstance(t, TagTok) and not t.start:
        if t.normal_name() in ("body", "html"):
            return _anything_else_after_head(t, tb)
        tb.error("unexpected end tag")
        return False
    return _anything_else_after_head(t, tb)


def _anything_else_after_head(t, tb) -> bool:
    tb.process_start("body")
    tb.frameset_ok = True
    return tb.process(t)


# -- InBody constants --------------------------------------------------------

_START_TO_HEAD = frozenset(("base", "basefont", "bgsound", "command", "link", "meta",
                  "noframes", "script", "style", "title"))
_P_CLOSERS = frozenset(("address", "article", "aside", "blockquote", "center",
              "details", "dir", "div", "dl", "fieldset", "figcaption",
              "figure", "footer", "header", "hgroup", "menu", "nav", "ol",
              "p", "section", "summary", "ul"))
_HEADINGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
_PRE_LISTING = frozenset(("pre", "listing"))
_DD_DT = frozenset(("dd", "dt"))
_FORMATTERS = frozenset(("b", "big", "code", "em", "font", "i", "s", "small",
               "strike", "strong", "tt", "u"))
_APPLETS = frozenset(("applet", "marquee", "object"))
_EMPTY_FORMATTERS = frozenset(("area", "br", "embed", "img", "keygen", "wbr"))
_MEDIA = frozenset(("param", "source", "track"))
_INPUT_ATTRIBS = frozenset(("name", "action", "prompt"))
_OPTIONS = frozenset(("optgroup", "option"))
_RUBY = frozenset(("rp", "rt"))
_IN_TABLE_DROP = frozenset(("caption", "col", "colgroup", "frame", "head", "tbody",
                  "td", "tfoot", "th", "thead", "tr"))
_END_CLOSERS = frozenset(("address", "article", "aside", "blockquote", "button",
                "center", "details", "dir", "div", "dl", "fieldset",
                "figcaption", "figure", "footer", "header", "hgroup",
                "listing", "menu", "nav", "ol", "pre", "section", "summary",
                "ul"))
_END_ADOPTION_FORMATTERS = frozenset(("a", "b", "big", "code", "em", "font", "i",
                            "nobr", "s", "small", "strike", "strong", "tt",
                            "u"))
_END_TABLE_FOSTERS = frozenset(("table", "tbody", "tfoot", "thead", "tr"))


def in_body(t, tb) -> bool:
    # exact-class dispatch: the token classes are final, and this
    # function runs once per token of every in-body document
    cls = t.__class__
    if cls is CharacterTok:
        if t.data == "\x00":
            tb.error("null character")
            return False
        tb.reconstruct_formatting_elements()
        tb.insert_character(t)
        if tb.frameset_ok and not _ws_chunk(t.data):
            tb.frameset_ok = False
        return True
    if cls is TagTok:  # most common after characters
        if t.start:
            return _in_body_start(t, tb)
        return _in_body_end(t, tb)
    if cls is CommentTok:
        tb.insert_comment(t)
        return True
    if cls is DoctypeTok:
        tb.error("doctype out of place")
        return False
    if cls is EOFTok:
        return True
    return True


def _in_body_start(t, tb) -> bool:
    # dict dispatch on tag name (the if/elif chain made common inline
    # tags like <span> walk ~30 membership tests per element)
    handler = _IBS_DISPATCH.get(t.normal_name(), _ibs_default)
    return handler(t, tb)


def _ibs_a(t, tb) -> bool:
    if tb.get_active_formatting_element("a") is not None:
        tb.error("a inside a")
        tb.process_end("a")
        remaining = tb.get_from_stack("a")
        if remaining is not None:
            tb.remove_from_active_formatting_elements(remaining)
            tb.remove_from_stack(remaining)
    tb.reconstruct_formatting_elements()
    a = tb.insert(t)
    tb.push_active_formatting_elements(a)
    return True


def _ibs_empty_formatter(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    tb.insert_empty(t)
    tb.frameset_ok = False
    return True


def _ibs_p_closer(t, tb) -> bool:
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert(t)
    return True


def _ibs_span(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    tb.insert(t)
    return True


def _ibs_li(t, tb) -> bool:
    tb.frameset_ok = False
    for i in range(len(tb.stack) - 1, 0, -1):
        el = tb.stack[i]
        el_name = el.tag.normal_name
        if el_name == "li":
            tb.process_end("li")
            break
        if tb.is_special(el) and el_name not in ("address", "div", "p"):
            break
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert(t)
    return True


def _ibs_html(t, tb) -> bool:
    tb.error("html in body")
    if tb.stack:
        html_el = tb.stack[0]
        if t.attrs:
            for k, v in tb.settings.normalise_attributes(
                    t.attrs).items():
                if not html_el.has_attr(k):
                    html_el._attrs().put(k, v)
    return True


def _ibs_to_head(t, tb) -> bool:
    return tb.process_in(t, in_head)


def _ibs_body(t, tb) -> bool:
    tb.error("body in body")
    if len(tb.stack) == 1 or (len(tb.stack) > 2 and
                              tb.stack[1].tag.normal_name != "body"):
        return False
    tb.frameset_ok = False
    body_el = tb.stack[1]
    if t.attrs:
        for k, v in tb.settings.normalise_attributes(t.attrs).items():
            if not body_el.has_attr(k):
                body_el._attrs().put(k, v)
    return True


def _ibs_frameset(t, tb) -> bool:
    tb.error("frameset in body")
    if len(tb.stack) == 1 or (len(tb.stack) > 2 and
                              tb.stack[1].tag.normal_name != "body"):
        return False
    if not tb.frameset_ok:
        return False
    second = tb.stack[1]
    if second.parent_node is not None:
        second.remove()
    while len(tb.stack) > 1:
        tb.pop()
    tb.insert(t)
    tb.transition(in_frameset)
    return True


def _ibs_heading(t, tb) -> bool:
    if tb.in_button_scope("p"):
        tb.process_end("p")
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name in _HEADINGS:
        tb.error("heading in heading")
        tb.pop()
    tb.insert(t)
    return True


def _ibs_pre_listing(t, tb) -> bool:
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert(t)
    tb.reader.match_consume("\n")
    tb.frameset_ok = False
    return True


def _ibs_form(t, tb) -> bool:
    if tb.form_element is not None:
        tb.error("form in form")
        return False
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert_form(t, True)
    return True


def _ibs_dd_dt(t, tb) -> bool:
    tb.frameset_ok = False
    for i in range(len(tb.stack) - 1, 0, -1):
        el = tb.stack[i]
        el_name = el.tag.normal_name
        if el_name in _DD_DT:
            tb.process_end(el_name)
            break
        if tb.is_special(el) and el_name not in ("address", "div", "p"):
            break
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert(t)
    return True


def _ibs_plaintext(t, tb) -> bool:
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert(t)
    tb.tokeniser.state = tz.plaintext_state
    return True


def _ibs_button(t, tb) -> bool:
    if tb.in_button_scope("button"):
        tb.error("button in button")
        tb.process_end("button")
        return tb.process(t)
    tb.reconstruct_formatting_elements()
    tb.insert(t)
    tb.frameset_ok = False
    return True


def _ibs_formatter(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    el = tb.insert(t)
    tb.push_active_formatting_elements(el)
    return True


def _ibs_nobr(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    if tb.in_scope("nobr"):
        tb.error("nobr in nobr")
        tb.process_end("nobr")
        tb.reconstruct_formatting_elements()
    el = tb.insert(t)
    tb.push_active_formatting_elements(el)
    return True


def _ibs_applet(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    tb.insert(t)
    tb.insert_marker_to_formatting_elements()
    tb.frameset_ok = False
    return True


def _ibs_table(t, tb) -> bool:
    if tb.get_document().quirks_mode != "quirks" and \
            tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert(t)
    tb.frameset_ok = False
    tb.transition(in_table)
    return True


def _ibs_input(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    el = tb.insert_empty(t)
    if el.attr("type").lower() != "hidden":
        tb.frameset_ok = False
    return True


def _ibs_media(t, tb) -> bool:
    tb.insert_empty(t)
    return True


def _ibs_hr(t, tb) -> bool:
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.insert_empty(t)
    tb.frameset_ok = False
    return True


def _ibs_image(t, tb) -> bool:
    if tb.get_from_stack("svg") is None:
        t.name = "img"
        t._normal = None  # invalidate cached normal_name
        return tb.process(t)
    tb.insert(t)
    return True


def _ibs_isindex(t, tb) -> bool:
    tb.error("isindex")
    if tb.form_element is not None:
        return False
    tb.process_start("form")
    if "action" in t.attrs and tb.form_element is not None:
        tb.form_element.set_attr("action", t.attrs["action"])
    tb.process_start("hr")
    tb.process_start("label")
    prompt = t.attrs.get("prompt",
                         "This is a searchable index. Enter search "
                         "keywords: ")
    tok = CharacterTok(prompt)
    tb.process(tok)
    input_attrs = {k: v for k, v in t.attrs.items()
                   if k not in _INPUT_ATTRIBS}
    input_attrs["name"] = "isindex"
    tb.process_start("input", input_attrs)
    tb.process_end("label")
    tb.process_start("hr")
    tb.process_end("form")
    return True


def _ibs_textarea(t, tb) -> bool:
    tb.insert(t)
    tb.tokeniser.state = tz.rcdata_state
    tb.mark_insertion_mode()
    tb.frameset_ok = False
    tb.transition(text)
    return True


def _ibs_xmp(t, tb) -> bool:
    if tb.in_button_scope("p"):
        tb.process_end("p")
    tb.reconstruct_formatting_elements()
    tb.frameset_ok = False
    _handle_rawtext(t, tb)
    return True


def _ibs_iframe(t, tb) -> bool:
    tb.frameset_ok = False
    _handle_rawtext(t, tb)
    return True


def _ibs_noembed(t, tb) -> bool:
    _handle_rawtext(t, tb)
    return True


def _ibs_select(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    tb.insert(t)
    tb.frameset_ok = False
    state = tb.state
    if state in (in_table, in_caption, in_table_body, in_row, in_cell):
        tb.transition(in_select_in_table)
    else:
        tb.transition(in_select)
    return True


def _ibs_option(t, tb) -> bool:
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name == "option":
        tb.process_end("option")
    tb.reconstruct_formatting_elements()
    tb.insert(t)
    return True


def _ibs_ruby(t, tb) -> bool:
    if tb.in_scope("ruby"):
        tb.generate_implied_end_tags()
        if tb.current_element() is not None and \
                tb.current_element().tag.normal_name != "ruby":
            tb.error("rp/rt out of place")
            tb.pop_stack_to_before("ruby")
        tb.insert(t)
    return True


def _ibs_math_svg(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    tb.insert(t)
    return True


def _ibs_table_drop(t, tb) -> bool:
    tb.error("token out of place")
    return False


def _ibs_default(t, tb) -> bool:
    tb.reconstruct_formatting_elements()
    tb.insert(t)
    return True


def _build_ibs_dispatch() -> dict:
    d = {"a": _ibs_a, "span": _ibs_span, "li": _ibs_li,
         "html": _ibs_html, "body": _ibs_body, "frameset": _ibs_frameset,
         "form": _ibs_form, "plaintext": _ibs_plaintext,
         "button": _ibs_button, "nobr": _ibs_nobr, "table": _ibs_table,
         "input": _ibs_input, "hr": _ibs_hr, "image": _ibs_image,
         "isindex": _ibs_isindex, "textarea": _ibs_textarea,
         "xmp": _ibs_xmp, "iframe": _ibs_iframe,
         "noembed": _ibs_noembed, "select": _ibs_select,
         "math": _ibs_math_svg, "svg": _ibs_math_svg}
    for group, handler in (
            (_EMPTY_FORMATTERS, _ibs_empty_formatter),
            (_P_CLOSERS, _ibs_p_closer),
            (_START_TO_HEAD, _ibs_to_head),
            (_HEADINGS, _ibs_heading),
            (_PRE_LISTING, _ibs_pre_listing),
            (_DD_DT, _ibs_dd_dt),
            (_FORMATTERS, _ibs_formatter),
            (_APPLETS, _ibs_applet),
            (_MEDIA, _ibs_media),
            (_OPTIONS, _ibs_option),
            (_RUBY, _ibs_ruby),
            (_IN_TABLE_DROP, _ibs_table_drop)):
        for name in group:
            assert name not in d, f"in-body dispatch collision: {name}"
            d[name] = handler
    return d


_IBS_DISPATCH = _build_ibs_dispatch()


def _in_body_end(t, tb) -> bool:
    name = t.normal_name()
    handler = _IBE_DISPATCH.get(name)
    if handler is None:
        return _any_other_end_tag(t, tb, name)
    return handler(t, tb, name)


def _ibe_adoption(t, tb, name) -> bool:
    # well-nested fast path, hoisted above the generic algorithm: if
    # the LAST active-formatting entry is the current element and
    # matches the tag, it is exactly the formatting element the
    # adoption agency would select (last matching entry), it is
    # trivially on-stack/in-scope, and nothing sits below it — pop
    # both. Skips the two backward scans + call chain per </b></a>.
    fe = tb.formatting_elements
    if fe:
        last = fe[-1]
        stack = tb.stack
        if last is not None and stack and stack[-1] is last \
                and last.tag.normal_name == name:
            tb.pop()
            fe.pop()
            return True
    return _adoption_agency(t, tb, name)


def _ibe_closer(t, tb, name) -> bool:
    if not tb.in_scope(name):
        tb.error("no matching open element")
        return False
    tb.generate_implied_end_tags()
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name != name:
        tb.error("unexpected end tag")
    tb.pop_stack_to_close(name)
    return True


def _ibe_any_other(t, tb, name) -> bool:
    return _any_other_end_tag(t, tb, name)


def _ibe_li(t, tb, name) -> bool:
    if not tb.in_list_item_scope(name):
        tb.error("no matching li")
        return False
    tb.generate_implied_end_tags(name)
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name != name:
        tb.error("unexpected end tag")
    tb.pop_stack_to_close(name)
    return True


def _ibe_body(t, tb, name) -> bool:
    if not tb.in_scope("body"):
        tb.error("no body")
        return False
    tb.transition(after_body)
    return True


def _ibe_html(t, tb, name) -> bool:
    notignored = tb.process_end("body")
    if notignored:
        return tb.process(t)
    return True


def _ibe_form(t, tb, name) -> bool:
    current_form = tb.form_element
    tb.form_element = None
    if current_form is None or not tb.in_scope(name):
        tb.error("no matching form")
        return False
    tb.generate_implied_end_tags()
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name != name:
        tb.error("unexpected end tag")
    # remove the form element from the stack (not pop-to-close)
    tb.remove_from_stack(current_form)
    return True


def _ibe_p(t, tb, name) -> bool:
    if not tb.in_button_scope(name):
        tb.error("no matching p")
        tb.process_start(name)
        return tb.process(t)
    tb.generate_implied_end_tags(name)
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name != name:
        tb.error("unexpected end tag")
    tb.pop_stack_to_close(name)
    return True


def _ibe_dd_dt(t, tb, name) -> bool:
    if not tb.in_scope(name):
        tb.error("no matching dd/dt")
        return False
    tb.generate_implied_end_tags(name)
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name != name:
        tb.error("unexpected end tag")
    tb.pop_stack_to_close(name)
    return True


def _ibe_heading(t, tb, name) -> bool:
    if not tb.in_scope(_HEADINGS):
        tb.error("no matching heading")
        return False
    tb.generate_implied_end_tags(name)
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name != name:
        tb.error("unexpected end tag")
    tb.pop_stack_to_close(*_HEADINGS)
    return True


def _ibe_applet(t, tb, name) -> bool:
    if not tb.in_scope(name):
        tb.error("no matching element")
        return False
    tb.generate_implied_end_tags()
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name != name:
        tb.error("unexpected end tag")
    tb.pop_stack_to_close(name)
    tb.clear_formatting_elements_to_last_marker()
    return True


def _ibe_br(t, tb, name) -> bool:
    tb.error("br end tag")
    tb.process_start("br")
    return False


def _build_ibe_dispatch() -> dict:
    d = {"span": _ibe_any_other, "li": _ibe_li, "body": _ibe_body,
         "html": _ibe_html, "form": _ibe_form, "p": _ibe_p,
         "sarcasm": _ibe_any_other, "br": _ibe_br}
    for group, handler in (
            (_END_ADOPTION_FORMATTERS, _ibe_adoption),
            (_END_CLOSERS, _ibe_closer),
            (_DD_DT, _ibe_dd_dt),
            (_HEADINGS, _ibe_heading),
            (_APPLETS, _ibe_applet)):
        for name in group:
            assert name not in d, f"in-body end dispatch collision: {name}"
            d[name] = handler
    return d


_IBE_DISPATCH = _build_ibe_dispatch()


def _any_other_end_tag(t, tb, name) -> bool:
    # use the tag's case-preserving name for case-sensitive parses
    raw_name = tb.settings.normalise_tag(t.name or "")
    for pos in range(len(tb.stack) - 1, -1, -1):
        node = tb.stack[pos]
        if node.tag.name == raw_name or node.tag.normal_name == name:
            tb.generate_implied_end_tags(name)
            if tb.current_element() is not None and \
                    name != tb.current_element().tag.normal_name:
                tb.error("unexpected end tag")
            # pop including node
            while len(tb.stack) > pos:
                tb.pop()
            return True
        else:
            if tb.is_special(node):
                tb.error("unexpected end tag")
                return False
    return True


def _adoption_agency(t, tb, name) -> bool:
    """The adoption agency algorithm (public WHATWG, same shape as the
    reference: 8-iteration outer loop, 64-deep stack scan cap; a
    follow-up iteration falls through to any-other-end-tag which pops
    the freshly inserted adopter)."""
    for _outer in range(8):
        format_el = tb.get_active_formatting_element(name)
        if format_el is None:
            return _any_other_end_tag(t, tb, name)
        if _outer == 0 and tb.stack and tb.stack[-1] is format_el:
            # well-nested fast path (the overwhelmingly common case):
            # the formatting element IS the current element, so it is
            # trivially on-stack and in scope and nothing sits below it
            # on the stack — no furthest block exists. Equivalent to
            # the spec path: pop it and drop it from the active list.
            tb.pop()
            tb.remove_from_active_formatting_elements(format_el)
            return True
        if not tb.on_stack(format_el):
            tb.error("formatting element not on stack")
            tb.remove_from_active_formatting_elements(format_el)
            return _any_other_end_tag(t, tb, name)
        if not tb.in_scope(format_el.tag.normal_name):
            tb.error("formatting element not in scope")
            return False
        if tb.current_element() is not format_el:
            tb.error("unexpected end tag")
        # find furthest block (special element below formatEl on the stack)
        furthest_block = None
        common_ancestor = None
        seen_formatting_element = False
        stack_size = min(len(tb.stack), 64)
        for si in range(stack_size):
            el = tb.stack[si]
            if el is format_el:
                common_ancestor = tb.stack[si - 1] if si > 0 else None
                seen_formatting_element = True
            elif seen_formatting_element and tb.is_special(el):
                furthest_block = el
                break
        if furthest_block is None:
            tb.pop_stack_to_close(format_el.tag.normal_name)
            tb.remove_from_active_formatting_elements(format_el)
            return True
        node = furthest_block
        last_node = furthest_block
        for _inner in range(3):
            if node is not None and tb.on_stack(node):
                node = tb.above_on_stack(node)
            if node is not None and \
                    not tb.is_in_active_formatting_elements(node):
                tb.remove_from_stack(node)
                continue
            if node is format_el or node is None:
                break
            replacement = Element(
                tag_for(node.node_name(), preserve_case=True), tb.base_uri)
            tb.replace_active_formatting_element(node, replacement)
            tb.replace_on_stack(node, replacement)
            node = replacement
            if last_node.parent_node is not None:
                last_node.remove()
            node.append_child_fast(last_node)
            last_node = node
        if common_ancestor is not None:
            if last_node.parent_node is not None:
                last_node.remove()
            if common_ancestor.tag.normal_name in _END_TABLE_FOSTERS:
                tb.insert_in_foster_parent(last_node)
            else:
                common_ancestor.append_child_fast(last_node)
        adopter = Element(format_el.tag, tb.base_uri)
        if format_el.attributes is not None:
            adopter.attributes = format_el.attributes.clone()
        for child in list(furthest_block.child_nodes):
            adopter.append_child_fast(child)
        furthest_block.append_child_fast(adopter)
        tb.remove_from_active_formatting_elements(format_el)
        tb.remove_from_stack(format_el)
        tb.insert_on_stack_after(furthest_block, adopter)
    return True


def text(t, tb) -> bool:
    if t.__class__ is CharacterTok:
        tb.insert_character(t)
        return True
    if isinstance(t, EOFTok):
        tb.error("unexpected eof in text")
        tb.pop()
        tb.transition(tb.original_state)
        return tb.process(t)
    if isinstance(t, TagTok) and not t.start:
        tb.pop()
        tb.transition(tb.original_state)
        return True
    return True


def in_table(t, tb) -> bool:
    if isinstance(t, CharacterTok):
        tb.pending_table_characters = []
        tb.mark_insertion_mode()
        tb.transition(in_table_text)
        return tb.process(t)
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, TagTok):
        name = t.normal_name()
        if t.start:
            if name == "caption":
                tb.clear_stack_to_table_context()
                tb.insert_marker_to_formatting_elements()
                tb.insert(t)
                tb.transition(in_caption)
                return True
            if name == "colgroup":
                tb.clear_stack_to_table_context()
                tb.insert(t)
                tb.transition(in_column_group)
                return True
            if name == "col":
                tb.process_start("colgroup")
                return tb.process(t)
            if name in ("tbody", "tfoot", "thead"):
                tb.clear_stack_to_table_context()
                tb.insert(t)
                tb.transition(in_table_body)
                return True
            if name in ("td", "th", "tr"):
                tb.process_start("tbody")
                return tb.process(t)
            if name == "table":
                tb.error("table in table")
                processed = tb.process_end("table")
                if processed:
                    return tb.process(t)
                return True
            if name in ("style", "script"):
                return tb.process_in(t, in_head)
            if name == "input":
                if t.attrs.get("type", "").lower() != "hidden":
                    return _anything_else_in_table(t, tb)
                tb.insert_empty(t)
                return True
            if name == "form":
                tb.error("form in table")
                if tb.form_element is not None:
                    return False
                tb.insert_form(t, False)
                return True
        else:
            if name == "table":
                if not tb.in_table_scope(name):
                    tb.error("no matching table")
                    return False
                tb.pop_stack_to_close("table")
                tb.reset_insertion_mode()
                return True
            if name in ("body", "caption", "col", "colgroup", "html",
                        "tbody", "td", "tfoot", "th", "thead", "tr"):
                tb.error("unexpected end tag")
                return False
        return _anything_else_in_table(t, tb)
    if isinstance(t, EOFTok):
        if tb.current_element() is not None and \
                tb.current_element().tag.normal_name == "html":
            tb.error("eof in table")
        return True
    return _anything_else_in_table(t, tb)


def _anything_else_in_table(t, tb) -> bool:
    tb.error("token out of place in table")
    if tb.current_element() is not None and \
            tb.current_element().tag.normal_name in (
                "table", "tbody", "tfoot", "thead", "tr"):
        tb.foster_inserts = True
        result = tb.process_in(t, in_body)
        tb.foster_inserts = False
        return result
    return tb.process_in(t, in_body)


def in_table_text(t, tb) -> bool:
    if isinstance(t, CharacterTok):
        if "\x00" in t.data:
            tb.error("null in table text")
            data = t.data.replace("\x00", "")
            if not data:
                return True
            t = CharacterTok(data)
        tb.pending_table_characters.append(t.data)
        return True
    # flush pending, chunk by chunk
    if tb.pending_table_characters:
        for data in tb.pending_table_characters:
            if not _ws_chunk(data):
                tok = CharacterTok(data)
                tb.error("text in table")
                if tb.current_element() is not None and \
                        tb.current_element().tag.normal_name in (
                            "table", "tbody", "tfoot", "thead", "tr"):
                    tb.foster_inserts = True
                    tb.process_in(tok, in_body)
                    tb.foster_inserts = False
                else:
                    tb.process_in(tok, in_body)
            else:
                tb.insert_character(CharacterTok(data))
        tb.pending_table_characters = []
    tb.transition(tb.original_state)
    return tb.process(t)


def in_caption(t, tb) -> bool:
    if isinstance(t, TagTok) and not t.start and \
            t.normal_name() == "caption":
        if not tb.in_table_scope(t.normal_name()):
            tb.error("no matching caption")
            return False
        tb.generate_implied_end_tags()
        if tb.current_element() is not None and \
                tb.current_element().tag.normal_name != "caption":
            tb.error("unexpected end tag")
        tb.pop_stack_to_close("caption")
        tb.clear_formatting_elements_to_last_marker()
        tb.transition(in_table)
        return True
    if (isinstance(t, TagTok) and t.start and t.normal_name() in
        ("caption", "col", "colgroup", "tbody", "td", "tfoot", "th",
         "thead", "tr")) or \
            (isinstance(t, TagTok) and not t.start and
             t.normal_name() == "table"):
        tb.error("token out of place")
        processed = tb.process_end("caption")
        if processed:
            return tb.process(t)
        return True
    if isinstance(t, TagTok) and not t.start and t.normal_name() in \
            ("body", "col", "colgroup", "html", "tbody", "td", "tfoot",
             "th", "thead", "tr"):
        tb.error("unexpected end tag")
        return False
    return tb.process_in(t, in_body)


def in_column_group(t, tb) -> bool:
    if _is_whitespace(t):
        tb.insert_character(t)
        return True
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return True
    if isinstance(t, TagTok):
        name = t.normal_name()
        if t.start:
            if name == "html":
                return tb.process_in(t, in_body)
            if name == "col":
                tb.insert_empty(t)
                return True
        else:
            if name == "colgroup":
                if tb.current_element() is not None and \
                        tb.current_element().tag.normal_name == "html":
                    tb.error("unexpected end tag")
                    return False
                tb.pop()
                tb.transition(in_table)
                return True
    if isinstance(t, EOFTok):
        if tb.current_element() is not None and \
                tb.current_element().tag.normal_name == "html":
            return True
        return _anything_else_in_column_group(t, tb)
    return _anything_else_in_column_group(t, tb)


def _anything_else_in_column_group(t, tb) -> bool:
    processed = tb.process_end("colgroup")
    if processed:
        return tb.process(t)
    return True


def in_table_body(t, tb) -> bool:
    if isinstance(t, TagTok):
        name = t.normal_name()
        if t.start:
            if name == "tr":
                tb.clear_stack_to_table_body_context()
                tb.insert(t)
                tb.transition(in_row)
                return True
            if name in ("th", "td"):
                tb.error("cell out of row")
                tb.process_start("tr")
                return tb.process(t)
            if name in ("caption", "col", "colgroup", "tbody", "tfoot",
                        "thead"):
                return _exit_table_body(t, tb)
        else:
            if name in ("tbody", "tfoot", "thead"):
                if not tb.in_table_scope(name):
                    tb.error("no matching element")
                    return False
                tb.clear_stack_to_table_body_context()
                tb.pop()
                tb.transition(in_table)
                return True
            if name == "table":
                return _exit_table_body(t, tb)
            if name in ("body", "caption", "col", "colgroup", "html",
                        "td", "th", "tr"):
                tb.error("unexpected end tag")
                return False
    return tb.process_in(t, in_table)


def _exit_table_body(t, tb) -> bool:
    if not (tb.in_table_scope("tbody") or tb.in_table_scope("thead")
            or tb.in_table_scope("tfoot")):
        tb.error("no table body in scope")
        return False
    tb.clear_stack_to_table_body_context()
    tb.process_end(tb.current_element().tag.normal_name)
    return tb.process(t)


def in_row(t, tb) -> bool:
    if isinstance(t, TagTok):
        name = t.normal_name()
        if t.start:
            if name in ("th", "td"):
                tb.clear_stack_to_table_row_context()
                tb.insert(t)
                tb.transition(in_cell)
                tb.insert_marker_to_formatting_elements()
                return True
            if name in ("caption", "col", "colgroup", "tbody", "tfoot",
                        "thead", "tr"):
                return _handle_missing_tr(t, tb)
        else:
            if name == "tr":
                if not tb.in_table_scope(name):
                    tb.error("no matching tr")
                    return False
                tb.clear_stack_to_table_row_context()
                tb.pop()
                tb.transition(in_table_body)
                return True
            if name == "table":
                return _handle_missing_tr(t, tb)
            if name in ("tbody", "tfoot", "thead"):
                if not tb.in_table_scope(name):
                    tb.error("no matching element")
                    return False
                tb.process_end("tr")
                return tb.process(t)
            if name in ("body", "caption", "col", "colgroup", "html",
                        "td", "th"):
                tb.error("unexpected end tag")
                return False
    return tb.process_in(t, in_table)


def _handle_missing_tr(t, tb) -> bool:
    processed = tb.process_end("tr")
    if processed:
        return tb.process(t)
    return False


def in_cell(t, tb) -> bool:
    if isinstance(t, TagTok) and not t.start:
        name = t.normal_name()
        if name in ("td", "th"):
            if not tb.in_table_scope(name):
                tb.error("no matching cell")
                tb.transition(in_row)
                return False
            tb.generate_implied_end_tags()
            if tb.current_element() is not None and \
                    tb.current_element().tag.normal_name != name:
                tb.error("unexpected end tag")
            tb.pop_stack_to_close(name)
            tb.clear_formatting_elements_to_last_marker()
            tb.transition(in_row)
            return True
        if name in ("body", "caption", "col", "colgroup", "html"):
            tb.error("unexpected end tag")
            return False
        if name in ("table", "tbody", "tfoot", "thead", "tr"):
            if not tb.in_table_scope(name):
                tb.error("no matching element")
                return False
            _close_cell(tb)
            return tb.process(t)
        return tb.process_in(t, in_body)
    if isinstance(t, TagTok) and t.start and t.normal_name() in \
            ("caption", "col", "colgroup", "tbody", "td", "tfoot", "th",
             "thead", "tr"):
        if not (tb.in_table_scope("td") or tb.in_table_scope("th")):
            tb.error("no cell in table scope")
            return False
        _close_cell(tb)
        return tb.process(t)
    return tb.process_in(t, in_body)


def _close_cell(tb) -> None:
    if tb.in_table_scope("td"):
        tb.process_end("td")
    else:
        tb.process_end("th")


def in_select(t, tb) -> bool:
    if isinstance(t, CharacterTok):
        if t.data == "\x00":
            tb.error("null in select")
            return False
        tb.insert_character(t)
        return True
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, TagTok):
        name = t.normal_name()
        if t.start:
            if name == "html":
                return tb.process_in(t, in_body)
            if name == "option":
                if tb.current_element() is not None and \
                        tb.current_element().tag.normal_name == "option":
                    tb.process_end("option")
                tb.insert(t)
                return True
            if name == "optgroup":
                if tb.current_element() is not None and \
                        tb.current_element().tag.normal_name == "option":
                    tb.process_end("option")
                if tb.current_element() is not None and \
                        tb.current_element().tag.normal_name == "optgroup":
                    tb.process_end("optgroup")
                tb.insert(t)
                return True
            if name == "select":
                tb.error("select in select")
                return tb.process_end("select")
            if name in ("input", "keygen", "textarea"):
                tb.error("token out of place")
                if not tb.in_select_scope("select"):
                    return False
                tb.process_end("select")
                return tb.process(t)
            if name == "script":
                return tb.process_in(t, in_head)
        else:
            if name == "optgroup":
                cur = tb.current_element()
                if cur is not None and cur.tag.normal_name == "option":
                    above = tb.above_on_stack(cur)
                    if above is not None and \
                            above.tag.normal_name == "optgroup":
                        tb.process_end("option")
                cur = tb.current_element()
                if cur is not None and cur.tag.normal_name == "optgroup":
                    tb.pop()
                else:
                    tb.error("unexpected end tag")
                return True
            if name == "option":
                cur = tb.current_element()
                if cur is not None and cur.tag.normal_name == "option":
                    tb.pop()
                else:
                    tb.error("unexpected end tag")
                return True
            if name == "select":
                if not tb.in_select_scope(name):
                    tb.error("no matching select")
                    return False
                tb.pop_stack_to_close(name)
                tb.reset_insertion_mode()
                return True
    if isinstance(t, EOFTok):
        if tb.current_element() is not None and \
                tb.current_element().tag.normal_name != "html":
            tb.error("eof in select")
        return True
    tb.error("token out of place in select")
    return False


def in_select_in_table(t, tb) -> bool:
    if isinstance(t, TagTok) and t.start and t.normal_name() in \
            ("caption", "table", "tbody", "tfoot", "thead", "tr", "td",
             "th"):
        tb.error("token out of place")
        tb.process_end("select")
        return tb.process(t)
    if isinstance(t, TagTok) and not t.start and t.normal_name() in \
            ("caption", "table", "tbody", "tfoot", "thead", "tr", "td",
             "th"):
        tb.error("unexpected end tag")
        if tb.in_table_scope(t.normal_name()):
            tb.process_end("select")
            return tb.process(t)
        return False
    return tb.process_in(t, in_select)


def after_body(t, tb) -> bool:
    if _is_whitespace(t):
        return tb.process_in(t, in_body)
    if isinstance(t, CommentTok):
        # insert into html element
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, TagTok) and t.start and t.normal_name() == "html":
        return tb.process_in(t, in_body)
    if isinstance(t, TagTok) and not t.start and \
            t.normal_name() == "html":
        if tb.fragment_parsing:
            tb.error("unexpected end tag in fragment")
            return False
        tb.transition(after_after_body)
        return True
    if isinstance(t, EOFTok):
        return True
    tb.error("unexpected token after body")
    tb.transition(in_body)
    return tb.process(t)


def in_frameset(t, tb) -> bool:
    if _is_whitespace(t):
        tb.insert_character(t)
        return True
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, TagTok):
        name = t.normal_name()
        if t.start:
            if name == "html":
                return tb.process_in(t, in_body)
            if name == "frameset":
                tb.insert(t)
                return True
            if name == "frame":
                tb.insert_empty(t)
                return True
            if name == "noframes":
                return tb.process_in(t, in_head)
        else:
            if name == "frameset":
                if tb.current_element() is not None and \
                        tb.current_element().tag.normal_name == "html":
                    tb.error("unexpected end tag")
                    return False
                tb.pop()
                if not tb.fragment_parsing and \
                        tb.current_element() is not None and \
                        tb.current_element().tag.normal_name != "frameset":
                    tb.transition(after_frameset)
                return True
    if isinstance(t, EOFTok):
        if tb.current_element() is not None and \
                tb.current_element().tag.normal_name != "html":
            tb.error("eof in frameset")
        return True
    tb.error("unexpected token in frameset")
    return False


def after_frameset(t, tb) -> bool:
    if _is_whitespace(t):
        tb.insert_character(t)
        return True
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok):
        tb.error("doctype out of place")
        return False
    if isinstance(t, TagTok) and t.start and t.normal_name() == "html":
        return tb.process_in(t, in_body)
    if isinstance(t, TagTok) and not t.start and \
            t.normal_name() == "html":
        tb.transition(after_after_frameset)
        return True
    if isinstance(t, TagTok) and t.start and \
            t.normal_name() == "noframes":
        return tb.process_in(t, in_head)
    if isinstance(t, EOFTok):
        return True
    tb.error("unexpected token after frameset")
    return False


def after_after_body(t, tb) -> bool:
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok) or _is_whitespace(t) or \
            (isinstance(t, TagTok) and t.start and
             t.normal_name() == "html"):
        return tb.process_in(t, in_body)
    if isinstance(t, EOFTok):
        return True
    tb.error("unexpected token")
    tb.transition(in_body)
    return tb.process(t)


def after_after_frameset(t, tb) -> bool:
    if isinstance(t, CommentTok):
        tb.insert_comment(t)
        return True
    if isinstance(t, DoctypeTok) or _is_whitespace(t) or \
            (isinstance(t, TagTok) and t.start and
             t.normal_name() == "html"):
        return tb.process_in(t, in_body)
    if isinstance(t, EOFTok):
        return True
    if isinstance(t, TagTok) and t.start and \
            t.normal_name() == "noframes":
        return tb.process_in(t, in_head)
    tb.error("unexpected token")
    return False


def foreign_content(t, tb) -> bool:  # placeholder; v1 treats svg/math inline
    return tb.process_in(t, in_body)

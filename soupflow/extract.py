"""Main-content extraction kernel: interleaved spans → HTML → parse →
boilerplate strip → ordered (kind, text, media_ref, offset) span sequence.

This is the flagship per-row transform (BASELINE.json north_star). It runs
inside ``ray.data.Dataset.map_batches`` as an actor-pool stage:
``ExtractActor`` compiles its whitelist / selector set / scorer once per
worker in ``__init__`` (reference analogue: Cleaner + Whitelist +
Element.text(), Sources/Cleaner.swift:33-140, Element.swift:1842-1875),
then processes Arrow record batches zero-copy in ``__call__``.

Span contract (FIXTURES.md §1-2):
 * input rows: doc_id: string, spans: list<struct<kind, text, media_ref,
   offset>>; a "media" span contributes ``<img src="{media_ref}">`` at its
   position when the document is reassembled.
 * output rows: same shape; text spans are whitespace-normalized segments
   split at block/<br> boundaries (Element.text() semantics); media spans
   carry their media_ref through in document order.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pyarrow as pa

from .cleaner import Cleaner, Whitelist
from .dom import CDataNode, DataNode, Document, Element, Node, TextNode
from .parser import parse
from .selector import parse_query
from .textutil import append_normalised_whitespace

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])
SPAN_PROV_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
    ("src_start", pa.int64()),
    ("src_end", pa.int64()),
])
SPAN_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

# tags whose subtrees are never main content (dropped before the walk)
BOILERPLATE_TAGS = frozenset((
    "script", "style", "noscript", "nav", "footer", "header", "aside",
    "form", "button", "iframe", "object", "embed", "template", "select",
    "option", "noframes", "frameset", "frame"))

MEDIA_TAGS = frozenset(("img", "audio", "video", "source", "track"))

_MEDIA_SRC_ATTRS = ("src", "href", "data-src")


def assemble_html(spans: Iterable[dict]) -> str:
    """Reassemble the document HTML from interleaved spans
    (concatenate in offset order; media → placeholder img)."""
    ordered = sorted(spans, key=lambda s: s["offset"])
    parts = []
    for span in ordered:
        if span["kind"] == "media":
            parts.append(f'<img src="{span["media_ref"]}">')
        else:
            parts.append(span["text"] or "")
    return "".join(parts)


def _media_ref(el: Element) -> str:
    for attr in _MEDIA_SRC_ATTRS:
        v = el.attr(attr)
        if v:
            return v
    return ""


def _link_density(el: Element) -> float:
    text_len = len(el.text())
    if text_len == 0:
        return 1.0
    link_len = sum(len(a.text()) for a in el.select("a"))
    return link_len / text_len


def extract_spans(root: Element, *, drop_boilerplate: bool = True,
                  link_density_threshold: float = 0.0,
                  scorer=None, provenance: bool = False) -> list[dict]:
    """Walk the DOM emitting the ordered span sequence.

    Text accumulates with Element.text() whitespace semantics
    (Element.swift:1842-1875: collapse runs, single space at block/br
    boundaries, preserve in pre/textarea/title/plaintext); a new text
    span is cut at each block boundary; media elements flush the current
    segment and emit a media span.

    ``scorer``: optional boilerplate classifier hook — a callable
    ``(Element) -> bool`` asked for every block-level element; False
    drops the subtree. Plug a model here (load it once per worker in
    the actor/kernel constructor); the tag blocklist and link-density
    heuristics still apply first.

    ``provenance``: when True (and the document was parsed with
    ``ParseSettings(track_source_ranges=True)``) each span carries
    src_start/src_end character (code-point) offsets back into the
    raw input string — slice with ``src[start:end]`` on the Python
    str, NOT on its encoded bytes (they differ on non-ASCII input;
    these are the same str-slicing semantics patched_outer_html
    uses). A text span covers its first through last contributing
    source text node, a media span its element's start tag; -1 when
    unknown.
    """
    spans: list[dict] = []
    buf: list[str] = []
    state = {"empty": True, "last_white": False,
             "src_start": -1, "src_end": -1}

    def flush() -> None:
        if not buf:
            state["empty"] = True
            state["last_white"] = False
            state["src_start"] = state["src_end"] = -1
            return
        text = "".join(buf).strip()
        buf.clear()
        state["empty"] = True
        state["last_white"] = False
        if text:
            span = {"kind": "text", "text": text, "media_ref": ""}
            if provenance:
                span["src_start"] = state["src_start"]
                span["src_end"] = state["src_end"]
            spans.append(span)
        state["src_start"] = state["src_end"] = -1

    def emit_media(ref: str, el: Element) -> None:
        flush()
        span = {"kind": "media", "text": "", "media_ref": ref}
        if provenance:
            sr = el.source_range()
            span["src_start"] = sr[0] if sr else -1
            span["src_end"] = sr[1] if sr else -1
        spans.append(span)

    # iterative head/tail DFS. Hot-loop layout (dense pages visit
    # ~5k nodes/doc, so per-node constants dominate the kernel):
    #  * text nodes outnumber elements — dispatch on exact type FIRST;
    #  * head visits push the Node itself (no tuple allocation); tail
    #    markers — needed only for block elements — are 1-tuples;
    #  * children pushed with one C-level extend over reversed().
    stack: list = [root]
    _tail = tuple  # exact-type sentinel for tail markers
    while stack:
        node = stack.pop()
        tn = type(node)
        if tn is TextNode or tn is CDataNode:
            t = node.get_whole_text()
            contributed = False
            if Element._preserve_whitespace(node.parent_node):
                buf.append(t)
                if t:
                    state["empty"] = False
                    state["last_white"] = t[-1] == " "
                    contributed = True
            else:
                strip_leading = state["empty"] or state["last_white"]
                before = len(buf)
                append_normalised_whitespace(buf, t, strip_leading)
                added = buf[before] if len(buf) > before else ""
                if added:
                    state["empty"] = False
                    state["last_white"] = added[-1] == " "
                    contributed = True
            if provenance and contributed:
                sr = node.source_range()
                if sr is not None:
                    if state["src_start"] < 0:
                        state["src_start"] = sr[0]
                    state["src_end"] = sr[1]
            continue
        if tn is _tail:
            flush()  # tail markers are pushed only for block elements
            continue
        if isinstance(node, Element):
            tag = node.tag
            name = tag.normal_name
            if drop_boilerplate and name in BOILERPLATE_TAGS \
                    and node is not root:
                continue
            if name in MEDIA_TAGS:
                ref = _media_ref(node)
                if ref:
                    emit_media(ref, node)
                continue
            is_block = tag.is_block
            if is_block and node is not root \
                    and name not in ("html", "body"):
                if link_density_threshold > 0 and \
                        _link_density(node) > link_density_threshold:
                    continue
                if scorer is not None and not scorer(node):
                    continue
            if is_block:
                flush()
                stack.append((node,))
            elif name == "br":
                flush()
            stack.extend(reversed(node.child_nodes))
        # DataNode (script/style payloads) and comments are never content
    flush()
    for i, span in enumerate(spans):
        span["offset"] = i
    return spans


def extract_document(html: str, base_uri: str = "", *,
                     whitelist: Optional[Whitelist] = None,
                     drop_boilerplate: bool = True,
                     link_density_threshold: float = 0.0,
                     scorer=None, provenance: bool = False) -> list[dict]:
    if provenance:
        from .treebuilder import HtmlTreeBuilder, ParseSettings
        doc = HtmlTreeBuilder(ParseSettings(
            track_source_ranges=True)).parse(html, base_uri)
    else:
        doc = parse(html, base_uri)
    if whitelist is not None:
        doc = Cleaner(whitelist).clean(doc)
    body = doc.body()
    if body is None:
        return []
    return extract_spans(body, drop_boilerplate=drop_boilerplate,
                         link_density_threshold=link_density_threshold,
                         scorer=scorer, provenance=provenance)


class TextDensityScorer:
    """Deterministic boilerplate classifier: keep a block if its text
    density (text chars per descendant element) is at or above the
    threshold. Stands in for a learned model — a real classifier loads
    its weights in __init__ (once per worker) and scores in __call__,
    exactly like this."""

    def __init__(self, min_chars_per_element: float = 5.0) -> None:
        self.min_chars_per_element = min_chars_per_element

    def __call__(self, el: Element) -> bool:
        n_els = 1 + sum(1 for n in el.iter_subtree()
                        if isinstance(n, Element))
        return (len(el.text()) / n_els) >= self.min_chars_per_element


class ExtractActor:
    """Actor-pool stage for ``map_batches``: stateful setup once per
    worker, zero-copy Arrow batches in/out.

    Usage::

        ds.map_batches(ExtractActor, batch_format="pyarrow",
                       concurrency=N, batch_size=B,
                       fn_constructor_kwargs={"whitelist": "relaxed"})
    """

    def __init__(self, whitelist: Optional[str] = None,
                 drop_boilerplate: bool = True,
                 link_density_threshold: float = 0.0,
                 base_uri: str = "",
                 scorer_factory=None,
                 provenance: bool = False) -> None:
        # compiled once per actor (reference: QueryParser cache + Whitelist)
        self.whitelist = Whitelist.by_name(whitelist) if whitelist else None
        self.drop_boilerplate = drop_boilerplate
        self.link_density_threshold = link_density_threshold
        self.base_uri = base_uri
        # boilerplate-classification hook: the factory runs ONCE per
        # actor/worker (model load happens here, not per batch)
        self.scorer = scorer_factory() if scorer_factory else None
        # provenance: spans additionally carry src_start/src_end byte
        # offsets into the assembled HTML (source-range tracking)
        self.provenance = provenance
        # warm the selector cache used by link-density scoring
        parse_query("a")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_in = batch.column("spans").to_pylist()
        out_spans: list[list[dict]] = []
        errors: list[Optional[str]] = []
        for spans in spans_in:
            try:
                html = assemble_html(spans or [])
                out = extract_document(
                    html, self.base_uri, whitelist=self.whitelist,
                    drop_boilerplate=self.drop_boilerplate,
                    link_density_threshold=self.link_density_threshold,
                    scorer=self.scorer, provenance=self.provenance)
                err = None
            except Exception as e:  # never fail a batch for one bad doc
                out = []
                err = f"{type(e).__name__}: {e}"[:500]
            out_spans.append(out)
            errors.append(err)
        span_type = SPAN_PROV_STRUCT if self.provenance else SPAN_STRUCT
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(out_spans, pa.list_(span_type)),
            # per-doc error instead of task failure (north rule): rows
            # with error != null carry empty spans and are filterable
            # downstream without re-reading the corpus
            "error": pa.array(errors, pa.string()),
        })


# -- task-based kernel (the throughput path) --------------------------------
#
# A Ray TASK pool parallelizes this stage better than an actor pool on a
# CPU-saturated node: worker processes are reused, so the compiled state
# below is still built once per worker (same amortization an actor gives),
# while the scheduler can overlap reads and maps freely instead of
# reserving CPUs for idle actors / waiting for pool upscaling. Measured on
# the sf0.1 corpus @32 CPUs: tasks ≈ 7× the autoscaling-actor-pool
# throughput. Use ExtractActor (above) when per-stage constructor kwargs
# or strict pool sizing are needed; extract_batch for the default path.
_KERNELS: dict[tuple, ExtractActor] = {}


def get_extract_kernel(whitelist: Optional[str] = None,
                       drop_boilerplate: bool = True,
                       link_density_threshold: float = 0.0,
                       base_uri: str = "") -> ExtractActor:
    """Per-worker-process singleton kernel (compiled state reused)."""
    key = (whitelist, drop_boilerplate, link_density_threshold, base_uri)
    k = _KERNELS.get(key)
    if k is None:
        k = ExtractActor(whitelist, drop_boilerplate,
                         link_density_threshold, base_uri)
        _KERNELS[key] = k
    return k


def extract_batch(batch: pa.Table) -> pa.Table:
    """Default-config extraction kernel for ``ds.map_batches`` as a task
    (``ds.map_batches(extract_batch, batch_format="pyarrow")``)."""
    return get_extract_kernel()(batch)

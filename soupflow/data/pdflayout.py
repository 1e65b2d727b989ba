"""PDF/layout parse: render documents to real PDF binaries and extract
reading-order text back out with genuine layout analysis.

The north rule names "PDF/layout parse" as part of the extraction
surface. No PDF libraries exist in this container, so both sides are
built from scratch on public structure (PDF 1.4 spec, ISO 32000):

* **Writer** (`render_pdf`): a deterministic generator that emits real
  PDF files — Flate-compressed content streams (stdlib zlib), a correct
  xref table over a *scrambled* object order, page-tree nesting with
  inherited MediaBox, multi-stream /Contents arrays, and content
  streams that use the full text-positioning operator set (Tm/Td/TD/
  T*/Tj/TJ/'/"/TL/Tw) with literal strings (octal + symbol escapes),
  hex strings, TJ kerning, out-of-reading-order run emission, and a
  two-column layout for even doc_ids. Deterministic: every choice is
  keyed off splitmix64(doc_id, line, …) — same input, same bytes.

* **Parser** (`extract_pdf`): xref-driven object loading with a
  brute-force object-scan fallback, a recursive PDF object grammar
  (dicts/arrays/names/refs/strings), FlateDecode, page-tree walk with
  attribute inheritance, and a content-stream interpreter that tracks
  the text/line matrices per the spec and uses standard-14 Courier
  metrics (600/1000 em per glyph) for advance widths. Layout analysis
  is a one-level XY-cut: vertical whitespace gutters >= GUTTER_MIN
  split runs into columns; within a column runs sort by (-y, x),
  cluster into baselines, and join with a space iff the inter-run gap
  exceeds half a space width.

Layout is word-exact by construction: WORDS_PER_LINE fixed, so the
extracted text equals ``' '.join(text.split())`` and page/line counts
are closed-form in the word count — which makes the whole pipeline
SQL-expressible for the DuckDB oracle (see queries.py `pdf_extract`).

Scale shape: both stages are embarrassingly parallel `map_batches`
(zero shuffle); the binary column is the payload-sizing case from the
multimodal notes. Batches default to whole blocks (batch_size=None):
block size is already bounded by DataContext.target_max_block_size,
so batch x concurrency stays in worker heap, and an explicit
batch_size would BUNDLE small blocks into fewer tasks — measured 3x
pipeline slowdown from 4-blocks-per-task coalescing at sf0.1. Pass
``batch_size=PDF_BATCH_SIZE`` only when upstream blocks are known to
be oversized for the payload (e.g. a decode stage that expands rows).
"""

from __future__ import annotations

import math
import re
import zlib

import pyarrow as pa

# ---------------------------------------------------------------------------
# layout constants (shared writer/parser contract)

PAGE_W, PAGE_H = 612.0, 792.0
MARGIN = 72.0
WORDS_PER_LINE = 6
LINES_PER_PAGE = 6
COURIER_EM = 0.6          # standard-14 Courier: every glyph 600/1000 em
LEADING = 14.0
SIZE_1COL = 10.0
SIZE_2COL = 5.0
COL_X = (MARGIN, 330.0)   # two-column x origins (even doc_ids)
GUTTER_MIN = 20.0         # XY-cut: min vertical whitespace to split columns
PDF_BATCH_SIZE = 256      # binary-payload stages keep batches small

_M64 = (1 << 64) - 1


def _mix(*vals: int) -> int:
    """splitmix64 over a running combine — the deterministic 'rng'."""
    x = 0
    for v in vals:
        x = (x * 0x9E3779B97F4A7C15 + v + 0x632BE59BD9B4E019) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


# ---------------------------------------------------------------------------
# writer

def _fmt(v: float) -> str:
    s = f"{v:.3f}".rstrip("0").rstrip(".")
    return s if s else "0"


def _lit_string(s: str, force_octal_first: bool) -> str:
    """PDF literal string: () \\ escaped; non-ASCII / controls as
    octal utf-8 bytes; optionally octal-encode the first char too."""
    out = ["("]
    for i, ch in enumerate(s):
        o = ord(ch)
        if ch in "()\\":
            out.append("\\" + ch)
        elif o < 32 or o > 126 or (i == 0 and force_octal_first):
            out.extend("\\%03o" % b for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    out.append(")")
    return "".join(out)


def _hex_string(s: str) -> str:
    return "<" + s.encode("utf-8").hex().upper() + ">"


class _TextState:
    """Mirror of the parser's text state so the writer can emit
    relative positioning ops (Td/TD/T*/'/") and still know exactly
    where the line matrix sits."""

    __slots__ = ("lx", "ly", "tl")

    def __init__(self) -> None:
        self.lx = 0.0
        self.ly = 0.0
        self.tl = 0.0


def _line_runs(doc_id: int, gl: int, words: list[str],
               chw: float) -> list[tuple[float, str]]:
    """Split a line's words into positioned runs: (x_offset, text).

    gl % 11 == 3  → one run carrying the whole line incl. its spaces.
    gl % 7  == 2  → the first word is split mid-word into two runs
                    with ZERO gap (extractor must not insert a space).
    otherwise     → 1-3 chunks split at hash-chosen word boundaries.
    """
    if not words:
        return []
    if gl % 11 == 3:
        return [(0.0, " ".join(words))]
    runs: list[tuple[float, str]] = []
    x = 0.0
    widx = 0
    if gl % 7 == 2 and len(words[0]) >= 2:
        w = words[0]
        cut = 1 + _mix(doc_id, gl, 17) % (len(w) - 1)
        runs.append((x, w[:cut]))
        runs.append((x + cut * chw, w[cut:]))
        x += len(w) * chw + chw  # word + one space
        widx = 1
    rest = words[widx:]
    if rest:
        n_chunks = 1 + _mix(doc_id, gl, 23) % min(3, len(rest))
        per = math.ceil(len(rest) / n_chunks)
        for c in range(0, len(rest), per):
            chunk = rest[c:c + per]
            runs.append((x, " ".join(chunk)))
            x += (sum(len(w) for w in chunk) + len(chunk)) * chw
    return runs


def _emit_line(ops: list[str], st: _TextState, doc_id: int, gl: int,
               x: float, y: float, runs: list[tuple[float, str]],
               chw: float, size: float, first_on_page: bool) -> None:
    """Emit one baseline's positioning + show ops, spec-accurately
    updating the tracked line matrix."""
    if not runs:
        return
    whole_line = len(runs) == 1 and " " in runs[0][1]

    # -- position to (x, y) -------------------------------------------------
    variant = 0 if first_on_page else gl % 4
    if whole_line and not first_on_page and st.lx == x:
        # exercise ' and " (both do T* first): set TL to the drop
        drop = st.ly - y
        if drop != st.tl:
            ops.append(f"{_fmt(drop)} TL")
            st.tl = drop
        s = _lit_string(runs[0][1], False)
        if gl % 22 == 3:
            ops.append(f"{_fmt(chw * 0.5)} 0 {s} \"")   # aw ac str "
            ops.append("0 Tw")  # " sets word spacing; reset so later
            # TJ kern math sees the widths the writer computed with
        else:
            ops.append(f"{s} '")
        st.ly = y
        return
    if variant == 3 and st.lx == x:
        drop = st.ly - y
        if drop != st.tl:
            ops.append(f"{_fmt(drop)} TL")
            st.tl = drop
        ops.append("T*")
    elif variant == 1 and not first_on_page:
        ops.append(f"{_fmt(x - st.lx)} {_fmt(y - st.ly)} Td")
    elif variant == 2 and not first_on_page:
        ops.append(f"{_fmt(x - st.lx)} {_fmt(y - st.ly)} TD")
        st.tl = -(y - st.ly)
    else:
        ops.append(f"1 0 0 1 {_fmt(x)} {_fmt(y)} Tm")
    st.lx, st.ly = x, y

    # -- show the runs ------------------------------------------------------
    def enc(ri: int, s: str) -> str:
        if _mix(doc_id, gl, ri, 5) % 5 == 0 or \
                any(ord(c) > 126 for c in s):
            return _hex_string(s)
        return _lit_string(s, _mix(doc_id, gl, ri, 7) % 7 == 0)

    if len(runs) > 1 and _mix(doc_id, gl, 31) % 3 != 2:
        # one TJ array with kern numbers carrying the gaps
        parts = [enc(0, runs[0][1])]
        for ri in range(1, len(runs)):
            px, ps = runs[ri - 1]
            gap = runs[ri][0] - (px + len(ps) * chw)
            kern = -(gap / size) * 1000.0
            parts.append(_fmt(kern))
            parts.append(enc(ri, runs[ri][1]))
        ops.append("[" + " ".join(parts) + "] TJ")
    else:
        # separate shows; later runs re-anchor with absolute Tm
        ops.append(f"{enc(0, runs[0][1])} Tj")
        for ri in range(1, len(runs)):
            rx = x + runs[ri][0]
            ops.append(f"1 0 0 1 {_fmt(rx)} {_fmt(y)} Tm")
            ops.append(f"{enc(ri, runs[ri][1])} Tj")
            st.lx = rx  # Tm re-sets the line matrix


def _page_content(doc_id: int, page_lines: list[tuple[int, list[str]]],
                  two_col: bool, size: float) -> bytes:
    """Content stream for one page; lines emitted in scrambled order
    WITHIN each positioning-dependency chain is not possible — relative
    ops form a chain — so scrambling happens at the run level (absolute
    Tm runs land out of order) and at the object level instead."""
    chw = COURIER_EM * size
    rows_per_col = LINES_PER_PAGE // 2
    ops = [f"BT /F1 {_fmt(size)} Tf"]
    st = _TextState()
    y0 = PAGE_H - MARGIN
    for i, (gl, words) in enumerate(page_lines):
        if two_col:
            col, row = divmod(i, rows_per_col)
            x = COL_X[min(col, 1)]
        else:
            x, row = MARGIN, i
        y = y0 - row * LEADING
        runs = _line_runs(doc_id, gl, words, chw)
        _emit_line(ops, st, doc_id, gl, x, y, runs, chw, size,
                   first_on_page=(i == 0))
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def _stream_obj(payload: bytes, compress: bool) -> bytes:
    if compress:
        data = zlib.compress(payload, 6)
        head = (b"<< /Length " + str(len(data)).encode()
                + b" /Filter /FlateDecode >>")
    else:
        data = payload
        head = b"<< /Length " + str(len(data)).encode() + b" >>"
    return head + b"\nstream\n" + data + b"\nendstream"


def render_pdf(doc_id: int, text: str) -> bytes:
    """Deterministically render (doc_id, text) as a complete PDF 1.4
    file. Even doc_ids → two-column pages at half size; doc_id%5==0 →
    uncompressed streams; doc_id%3==0 → /Contents split across two
    stream objects; >=3 pages → nested page tree."""
    words = text.split()
    lines = [words[i:i + WORDS_PER_LINE]
             for i in range(0, len(words), WORDS_PER_LINE)] or [[]]
    n_pages = max(1, math.ceil(len(lines) / LINES_PER_PAGE))
    two_col = doc_id % 2 == 0
    size = SIZE_2COL if two_col else SIZE_1COL
    compress = doc_id % 5 != 0
    split_contents = doc_id % 3 == 0

    objs: dict[int, bytes] = {}
    next_num = 4  # 1=catalog 2=pages-root 3=font
    page_objs: list[int] = []
    for p in range(n_pages):
        page_lines = [(p * LINES_PER_PAGE + i, ws) for i, ws in
                      enumerate(lines[p * LINES_PER_PAGE:
                                      (p + 1) * LINES_PER_PAGE])]
        content = _page_content(doc_id, page_lines, two_col, size)
        cut = content.find(b"\n", len(content) // 2)
        if cut < 0 or cut >= len(content) - 3:
            cut = content.find(b"\n", 3)
        if split_contents and 3 <= cut < len(content) - 3:
            c1, c2 = next_num, next_num + 1
            objs[c1] = _stream_obj(content[:cut], compress)
            objs[c2] = _stream_obj(content[cut + 1:], compress)
            contents_ref = f"[{c1} 0 R {c2} 0 R]"
            next_num += 2
        else:
            c1 = next_num
            objs[c1] = _stream_obj(content, compress)
            contents_ref = f"{c1} 0 R"
            next_num += 1
        pnum = next_num
        next_num += 1
        page_objs.append(pnum)
        # MediaBox deliberately absent: inherited from the pages root
        objs[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /Resources << /Font "
            f"<< /F1 3 0 R >> >> /Contents {contents_ref} >>"
        ).encode()

    if n_pages >= 3:
        # nest the first two pages under an intermediate /Pages node
        inter = next_num
        next_num += 1
        inner_kids = " ".join(f"{n} 0 R" for n in page_objs[:2])
        objs[inter] = (f"<< /Type /Pages /Parent 2 0 R /Kids "
                       f"[{inner_kids}] /Count 2 >>").encode()
        for n in page_objs[:2]:
            objs[n] = objs[n].replace(b"/Parent 2 0 R",
                                      b"/Parent %d 0 R" % inter)
        kids = [str(inter) + " 0 R"] + \
            [f"{n} 0 R" for n in page_objs[2:]]
    else:
        kids = [f"{n} 0 R" for n in page_objs]

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{' '.join(kids)}] "
               f"/Count {n_pages} /MediaBox [0 0 {_fmt(PAGE_W)} "
               f"{_fmt(PAGE_H)}] >>").encode()
    objs[3] = (b"<< /Type /Font /Subtype /Type1 "
               b"/BaseFont /Courier >>")

    # scrambled emission order, correct xref
    nums = sorted(objs)
    rot = _mix(doc_id, 41) % len(nums)
    order = nums[rot:] + nums[:rot]
    out = bytearray(b"%PDF-1.4\n%\xc2\xa5\xc2\xb1\xc3\xab\n")
    offsets: dict[int, int] = {}
    for n in order:
        offsets[n] = len(out)
        out += str(n).encode() + b" 0 obj\n" + objs[n] + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 " + str(len(nums) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for n in nums:
        out += ("%010d 00000 n \n" % offsets[n]).encode()
    out += (b"trailer\n<< /Size " + str(len(nums) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_off).encode() + b"\n%%EOF\n")
    return bytes(out)


# ---------------------------------------------------------------------------
# parser

class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
# lexer fast paths (regex scanning beats per-byte Python loops ~2x)
_SKIP_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_NUM_RE = re.compile(rb"[+\-.0-9][+\-.0-9eE]*")
_REG_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
_INT_RE = re.compile(rb"[+-]?[0-9]+$")


class _Lexer:
    """Token reader over PDF object syntax (shared by the object
    loader and the content-stream interpreter)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        m = _SKIP_RE.match(self.data, self.pos)
        if m is not None:
            self.pos = m.end()

    def next_token(self):
        """→ ('num', float) | ('int', int) | ('str', str) |
        ('name', str) | ('op'/'kw', str) | ('[','[') … | None at EOF"""
        self._skip_ws()
        d, i, n = self.data, self.pos, len(self.data)
        if i >= n:
            return None
        c = d[i]
        if c == 0x28:  # ( literal string
            return self._lit_string()
        if c == 0x3C:  # < hex or <<
            if i + 1 < n and d[i + 1] == 0x3C:
                self.pos = i + 2
                return ("<<", "<<")
            return self._hex_string()
        if c == 0x3E and i + 1 < n and d[i + 1] == 0x3E:
            self.pos = i + 2
            return (">>", ">>")
        if c in b"[]":
            self.pos = i + 1
            return (chr(c), chr(c))
        if c == 0x2F:  # /Name
            m = _REG_RE.match(d, i + 1)
            j = m.end() if m is not None else i + 1
            self.pos = j
            name = d[i + 1:j].decode("latin-1")
            if "#" in name:  # #xx hex escapes in names
                name = re.sub(r"#([0-9A-Fa-f]{2})",
                              lambda m: chr(int(m.group(1), 16)), name)
            return ("name", name)
        if c in b"+-.0123456789":
            tok = _NUM_RE.match(d, i).group()
            self.pos = i + len(tok)
            try:
                if _INT_RE.match(tok):
                    return ("int", int(tok))
                return ("num", float(tok))
            except ValueError:
                return ("kw", tok.decode("latin-1"))
        m = _REG_RE.match(d, i)
        if m is None:  # lone delimiter we don't handle: skip it
            self.pos = i + 1
            return ("kw", chr(c))
        self.pos = m.end()
        return ("kw", m.group().decode("latin-1"))

    def _lit_string(self):
        d, n = self.data, len(self.data)
        i = self.pos + 1
        depth = 1
        out = bytearray()
        while i < n:
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= n:
                    break
                e = d[i]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    i += 1
                elif e in b"01234567":
                    j = i
                    while j < n and j < i + 3 and d[j] in b"01234567":
                        j += 1
                    out.append(int(d[i:j], 8) & 0xFF)
                    i = j
                elif e == 0x0A:      # line continuation
                    i += 1
                elif e == 0x0D:
                    i += 2 if i + 1 < n and d[i + 1] == 0x0A else 1
                else:                # \( \) \\ and unknown → literal
                    out.append(e)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.pos = i
        return ("str", out.decode("utf-8", errors="replace"))

    def _hex_string(self):
        d = self.data
        j = d.index(b">", self.pos)
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos + 1:j])
        if len(hx) % 2:
            hx += b"0"
        self.pos = j + 1
        return ("str", bytes.fromhex(hx.decode("ascii"))
                .decode("utf-8", errors="replace"))

    def next_object(self, tok=None):
        """Parse one full object (resolving composites, not refs)."""
        if tok is None:
            tok = self.next_token()
        if tok is None:
            raise ValueError("EOF in object")
        kind, val = tok
        if kind in ("str", "name", "num"):
            return val
        if kind == "int":
            # maybe "N G R" indirect reference
            save = self.pos
            t2 = self.next_token()
            if t2 and t2[0] == "int":
                t3 = self.next_token()
                if t3 and t3 == ("kw", "R"):
                    return _Ref(val)
            self.pos = save
            return val
        if kind == "[":
            arr = []
            while True:
                t = self.next_token()
                if t is None or t == ("]", "]"):
                    return arr
                arr.append(self.next_object(t))
        if kind == "<<":
            dct = {}
            while True:
                t = self.next_token()
                if t is None or t == (">>", ">>"):
                    return dct
                if t[0] != "name":
                    continue  # tolerate junk keys
                dct[t[1]] = self.next_object()
            return dct
        if kind == "kw" and val in ("true", "false", "null"):
            return {"true": True, "false": False, "null": None}[val]
        return ("__kw__", val)


class PdfDocument:
    """Minimal loaded PDF: object store + page walk."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.objects: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}
        self.trailer: dict = {}
        try:
            self._load_via_xref()
        except Exception:
            self.objects.clear()
            self.streams.clear()
            self._load_via_scan()
        if "Root" not in self.trailer:
            raise ValueError("no /Root")

    # -- loading ------------------------------------------------------------
    def _load_via_xref(self) -> None:
        data = self.data
        tail = data[-256:]
        m = re.search(rb"startxref\s+(\d+)", tail)
        if not m:
            raise ValueError("no startxref")
        off = int(m.group(1))
        if not data.startswith(b"xref", off):
            raise ValueError("bad xref offset")
        lx = _Lexer(data, off + 4)
        offsets: dict[int, int] = {}
        while True:
            save = lx.pos
            t = lx.next_token()
            if t is None:
                raise ValueError("EOF in xref")
            if t == ("kw", "trailer"):
                break
            if t[0] != "int":
                raise ValueError("bad xref subsection")
            del save
            start = t[1]
            cnt_t = lx.next_token()
            if cnt_t is None or cnt_t[0] != "int":
                raise ValueError("bad xref count")
            lx._skip_ws()
            for k in range(cnt_t[1]):
                ent = data[lx.pos:lx.pos + 20]
                if len(ent) < 18:
                    raise ValueError("short xref entry")
                if ent[17:18] == b"n":
                    offsets[start + k] = int(ent[0:10])
                lx.pos += 20
        self.trailer = lx.next_object()
        if not isinstance(self.trailer, dict):
            raise ValueError("bad trailer")
        for num, o in offsets.items():
            self._parse_obj_at(num, o)

    def _load_via_scan(self) -> None:
        # skip matches that fall inside an already-captured stream's
        # byte extent (compressed bytes can fake an "N 0 obj" header)
        covered_end = -1
        for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b", self.data):
            if m.start() < covered_end:
                continue
            before = set(self.streams)
            self._parse_obj_at(int(m.group(1)), m.start())
            for num in set(self.streams) - before:
                end = self.data.find(b"endstream", m.end())
                if end > covered_end:
                    covered_end = end
        tm = re.search(rb"trailer", self.data)
        if tm:
            t = _Lexer(self.data, tm.end()).next_object()
            if isinstance(t, dict):
                self.trailer = t
        if "Root" not in self.trailer:
            # last resort: any catalog object
            for num, o in self.objects.items():
                if isinstance(o, dict) and o.get("Type") == "Catalog":
                    self.trailer = {"Root": _Ref(num)}
                    break

    def _parse_obj_at(self, num: int, off: int) -> None:
        lx = _Lexer(self.data, off)
        t = lx.next_token()
        if t is None or t[0] != "int":
            return
        lx.next_token()          # gen
        if lx.next_token() != ("kw", "obj"):
            return
        obj = lx.next_object()
        self.objects[num] = obj
        lx._skip_ws()
        if self.data.startswith(b"stream", lx.pos) and \
                isinstance(obj, dict):
            p = lx.pos + 6
            if self.data[p:p + 2] == b"\r\n":
                p += 2
            elif self.data[p:p + 1] in (b"\n", b"\r"):
                p += 1
            length = self.resolve(obj.get("Length", 0))
            self.streams[num] = self.data[p:p + int(length)]

    # -- access -------------------------------------------------------------
    def resolve(self, o):
        seen = 0
        while isinstance(o, _Ref) and seen < 32:
            o = self.objects.get(o.num)
            seen += 1
        return o

    def stream_bytes(self, ref) -> bytes:
        num = ref.num if isinstance(ref, _Ref) else ref
        d = self.resolve(self.objects.get(num))
        raw = self.streams.get(num, b"")
        filt = d.get("Filter") if isinstance(d, dict) else None
        filt = self.resolve(filt)
        filters = filt if isinstance(filt, list) else \
            ([filt] if filt else [])
        for f in filters:
            if f == "FlateDecode":
                raw = zlib.decompress(raw)
            else:
                raise ValueError(f"unsupported filter {f}")
        return raw

    def pages(self) -> list[dict]:
        """Leaf /Page dicts in tree order, with MediaBox inheritance
        applied (ISO 32000 7.7.3.4)."""
        root = self.resolve(self.trailer["Root"])
        tree = self.resolve(root["Pages"])
        out: list[dict] = []

        def walk(node: dict, inherited: dict) -> None:
            node = dict(node)
            inh = dict(inherited)
            for k in ("MediaBox", "Resources"):
                if k in node:
                    inh[k] = node[k]
                elif k in inh:
                    node[k] = inh[k]
            if node.get("Type") == "Pages":
                for kid in self.resolve(node.get("Kids", [])):
                    walk(self.resolve(kid), inh)
            else:
                out.append(node)

        walk(tree, {})
        return out

    def page_content(self, page: dict) -> bytes:
        c = page.get("Contents")
        refs = c if isinstance(c, list) else [c]
        return b"\n".join(self.stream_bytes(self.resolve(r) if not
                                            isinstance(r, _Ref) else r)
                          for r in refs if r is not None)


# -- content-stream interpretation ------------------------------------------

class _Run:
    __slots__ = ("x", "y", "w", "text")

    def __init__(self, x: float, y: float, w: float, text: str) -> None:
        self.x, self.y, self.w, self.text = x, y, w, text


def _interpret_content(content: bytes) -> list[_Run]:
    """Execute the text-positioning subset of the content-stream
    operator set (ISO 32000 9.4), Courier 600/1000 advance widths."""
    lx = _Lexer(content)
    stack: list = []
    runs: list[_Run] = []
    # text matrix / line matrix as (a, b, c, d, e, f)
    tm = lm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    size = 0.0
    tl = tc = tw = 0.0

    def mul(m1, m2):
        a1, b1, c1, d1, e1, f1 = m1
        a2, b2, c2, d2, e2, f2 = m2
        return (a1 * a2 + b1 * c2, a1 * b2 + b1 * d2,
                c1 * a2 + d1 * c2, c1 * b2 + d1 * d2,
                e1 * a2 + f1 * c2 + e2, e1 * b2 + f1 * d2 + f2)

    def show(s: str) -> None:
        nonlocal tm
        if s:
            w = 0.0
            for ch in s:
                w += COURIER_EM * size + tc + (tw if ch == " " else 0.0)
            runs.append(_Run(tm[4], tm[5], w * tm[0], s))
            tm = mul((1.0, 0.0, 0.0, 1.0, w, 0.0), tm)

    def adv(units: float) -> None:    # TJ kern number
        nonlocal tm
        tx = -units / 1000.0 * size
        tm = mul((1.0, 0.0, 0.0, 1.0, tx, 0.0), tm)

    while True:
        t = lx.next_token()
        if t is None:
            break
        kind, val = t
        if kind in ("int", "num", "str", "name"):
            stack.append(val)
            continue
        if kind == "[":
            arr = []
            while True:
                t2 = lx.next_token()
                if t2 is None or t2 == ("]", "]"):
                    break
                arr.append(t2[1])
            stack.append(arr)
            continue
        if kind == "<<":          # inline dict operand (unused): skim
            depth = 1
            while depth:
                t2 = lx.next_token()
                if t2 is None:
                    break
                if t2[0] == "<<":
                    depth += 1
                elif t2[0] == ">>":
                    depth -= 1
            stack.clear()
            continue
        op = val
        try:
            if op == "BT":
                tm = lm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
            elif op == "ET":
                pass
            elif op == "Tf" and len(stack) >= 2:
                size = float(stack[-1])
            elif op == "Tm" and len(stack) >= 6:
                lm = tuple(float(v) for v in stack[-6:])
                tm = lm
            elif op == "Td" and len(stack) >= 2:
                lm = mul((1.0, 0.0, 0.0, 1.0,
                          float(stack[-2]), float(stack[-1])), lm)
                tm = lm
            elif op == "TD" and len(stack) >= 2:
                tl = -float(stack[-1])
                lm = mul((1.0, 0.0, 0.0, 1.0,
                          float(stack[-2]), float(stack[-1])), lm)
                tm = lm
            elif op == "T*":
                lm = mul((1.0, 0.0, 0.0, 1.0, 0.0, -tl), lm)
                tm = lm
            elif op == "TL" and stack:
                tl = float(stack[-1])
            elif op == "Tc" and stack:
                tc = float(stack[-1])
            elif op == "Tw" and stack:
                tw = float(stack[-1])
            elif op == "Tj" and stack:
                show(str(stack[-1]))
            elif op == "'" and stack:
                lm = mul((1.0, 0.0, 0.0, 1.0, 0.0, -tl), lm)
                tm = lm
                show(str(stack[-1]))
            elif op == '"' and len(stack) >= 3:
                tw = float(stack[-3])
                tc = float(stack[-2])
                lm = mul((1.0, 0.0, 0.0, 1.0, 0.0, -tl), lm)
                tm = lm
                show(str(stack[-1]))
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, str):
                        show(el)
                    else:
                        adv(float(el))
            # every other operator: ignore (graphics ops etc.)
        finally:
            stack.clear()
    return runs


def _columns(runs: list[_Run]) -> list[list[_Run]]:
    """One-level XY-cut: split at vertical whitespace gutters wider
    than GUTTER_MIN (published layout-analysis primitive; intra-line
    gaps are at most one space width by construction, far below it)."""
    if not runs:
        return []
    ivals = sorted((r.x, r.x + r.w) for r in runs)
    cuts: list[float] = []
    cur_end = ivals[0][1]
    for s, e in ivals[1:]:
        if s - cur_end >= GUTTER_MIN:
            cuts.append((cur_end + s) / 2.0)
        cur_end = max(cur_end, e)
    if not cuts:
        return [runs]
    cols: list[list[_Run]] = [[] for _ in range(len(cuts) + 1)]
    for r in runs:
        idx = sum(1 for c in cuts if r.x >= c)
        cols[idx].append(r)
    return [c for c in cols if c]


def _lines_of(col: list[_Run]) -> list[list[_Run]]:
    col = sorted(col, key=lambda r: (-r.y, r.x))
    out: list[list[_Run]] = []
    cur_y = None
    for r in col:
        if cur_y is None or cur_y - r.y > LEADING / 2.0:
            out.append([r])
            cur_y = r.y
        else:
            out[-1].append(r)
    return out


def extract_pdf(data: bytes) -> dict:
    """→ {text, n_pages, n_lines, n_words}: reading-order text
    (columns left→right, baselines top→bottom, spaces inferred from
    geometry) plus layout counts."""
    doc = PdfDocument(data)
    pages = doc.pages()
    pieces: list[str] = []
    n_lines = 0
    for page in pages:
        runs = _interpret_content(doc.page_content(page))
        for col in _columns(runs):
            for line in _lines_of(col):
                n_lines += 1
                buf: list[str] = []
                prev_end = None
                prev_space_w = None
                for r in sorted(line, key=lambda q: q.x):
                    if prev_end is not None:
                        space_w = prev_space_w if prev_space_w else 1.0
                        if r.x - prev_end > 0.45 * space_w:
                            buf.append(" ")
                    buf.append(r.text)
                    prev_end = r.x + r.w
                    prev_space_w = (r.w / len(r.text)) if r.text else None
                pieces.append("".join(buf))
    text = " ".join(" ".join(p.split()) for p in pieces if p.strip())
    n_words = len(text.split())
    # an all-empty page still counts; a line with no words does not
    if not text:
        n_lines = 0
    return {"text": text, "n_pages": len(pages),
            "n_lines": n_lines, "n_words": n_words}


# ---------------------------------------------------------------------------
# Ray Data stages

def render_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    pdfs = [render_pdf(i, t or "") for i, t in zip(ids, texts)]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "pdf": pa.array(pdfs, pa.binary())})


def extract_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id")
    rows = [extract_pdf(p) for p in batch.column("pdf").to_pylist()]
    return pa.table({
        "doc_id": ids,
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "n_pages": pa.array([r["n_pages"] for r in rows], pa.int64()),
        "n_lines": pa.array([r["n_lines"] for r in rows], pa.int64()),
        "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
    })


def render_pdfs(ds, batch_size: int | None = None):
    """documents(doc_id, text) → (doc_id, pdf:binary). Whole-block
    batches by default — blocks are already heap-bounded by
    target_max_block_size, and an explicit batch_size bundles small
    blocks into fewer tasks (see module docstring). Pass a row cap
    only for oversized upstream blocks."""
    return ds.map_batches(render_batch, batch_format="pyarrow",
                          batch_size=batch_size)


def extract_pdfs(ds, batch_size: int | None = None):
    """(doc_id, pdf) → (doc_id, text, n_pages, n_lines, n_words).
    Pure map-side: zero shuffle at any corpus size. Whole-block
    batches (see render_pdfs note)."""
    return ds.map_batches(extract_batch, batch_format="pyarrow",
                          batch_size=batch_size)

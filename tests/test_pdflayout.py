"""PDF/layout parse: deterministic writer ↔ from-scratch parser
round-trip (data/pdflayout.py). The north rule names PDF/layout parse
as part of the extraction surface; layout is word-exact by
construction so extracted text == ' '.join(text.split())."""
import math
import random
import re

import pytest

from soupflow.data.pdflayout import (GUTTER_MIN, LINES_PER_PAGE,
                                     WORDS_PER_LINE, PdfDocument,
                                     extract_pdf, render_pdf)

LOREM = ("the fast key order sort table scan merge part window small "
         "hash scan join order batch stream spark window dup " * 6)


def roundtrip(doc_id: int, text: str) -> dict:
    return extract_pdf(render_pdf(doc_id, text))


def test_exact_roundtrip_one_column():
    r = roundtrip(1, LOREM)  # odd id → single column
    assert r["text"] == " ".join(LOREM.split())


def test_exact_roundtrip_two_column():
    r = roundtrip(2, LOREM)  # even id → two-column layout
    assert r["text"] == " ".join(LOREM.split())


def test_counts_closed_form():
    for doc_id in (1, 2, 3, 5, 6, 10):
        words = LOREM.split()[:doc_id * 11]
        r = roundtrip(doc_id, " ".join(words))
        n_lines = math.ceil(len(words) / WORDS_PER_LINE)
        assert r["n_words"] == len(words)
        assert r["n_lines"] == n_lines
        assert r["n_pages"] == max(1, math.ceil(n_lines / LINES_PER_PAGE))


def test_empty_document():
    r = roundtrip(7, "")
    assert r == {"text": "", "n_pages": 1, "n_lines": 0, "n_words": 0}


def test_reading_order_detectable():
    # distinct words: any ordering mistake (column interleave, line
    # order, intra-line run order) changes the text
    words = [f"w{i:03d}" for i in range(90)]
    for doc_id in (2, 3, 4, 5):  # both layouts, both stream splits
        assert roundtrip(doc_id, " ".join(words))["text"] == \
            " ".join(words)


def test_special_chars_escapes():
    s = "par(en) cl)ose back\\slash per%cent an#gle <tag> [arr]"
    assert roundtrip(11, s)["text"] == s


def test_non_ascii_hex_strings():
    s = "héllo wörld naïve 日本語 emoji✓"
    assert roundtrip(12, s)["text"] == s


def test_operator_surface_is_exercised():
    """The writer must actually emit the full positioning-op mix the
    parser claims to handle (keeps both sides honest)."""
    blobs = []
    for doc_id in range(1, 40):
        pdf = render_pdf(doc_id, LOREM)
        doc = PdfDocument(pdf)
        for page in doc.pages():
            blobs.append(doc.page_content(page))
    all_ops = b"\n".join(blobs)
    for op in (b"Tm", b"Td", b"TD", b"T*", b"Tj", b"TJ", b"TL",
               b"'", b'"'):
        assert re.search(rb"(^|[\s\]>)])" + re.escape(op) + rb"(\s|$)",
                         all_ops), f"operator {op} never emitted"
    assert re.search(rb"<[0-9A-F]+>", all_ops), "no hex strings"
    assert re.search(rb"\\[0-7]{3}", all_ops), "no octal escapes"


def test_flate_and_raw_streams():
    assert b"FlateDecode" in render_pdf(1, LOREM)       # 1 % 5 != 0
    assert b"FlateDecode" not in render_pdf(5, LOREM)   # raw
    assert roundtrip(5, LOREM)["text"] == " ".join(LOREM.split())


def test_contents_array_split():
    pdf = render_pdf(3, LOREM)  # 3 % 3 == 0 → /Contents [a 0 R b 0 R]
    assert re.search(rb"/Contents \[\d+ 0 R \d+ 0 R\]", pdf)
    assert roundtrip(3, LOREM)["text"] == " ".join(LOREM.split())


def test_nested_page_tree_and_mediabox_inheritance():
    words = " ".join(f"w{i}" for i in range(3 * WORDS_PER_LINE *
                                            LINES_PER_PAGE))
    pdf = render_pdf(9, words)
    doc = PdfDocument(pdf)
    pages = doc.pages()
    assert len(pages) == 3
    for p in pages:
        # MediaBox lives only on the pages root; leaves inherit it
        assert doc.resolve(p["MediaBox"])[2] == 612.0
    assert extract_pdf(pdf)["text"] == words


def test_xref_is_primary_and_scan_fallback_matches():
    pdf = render_pdf(21, LOREM)
    want = extract_pdf(pdf)
    assert want == extract_pdf(pdf.replace(b"startxref", b"startxrEf"))
    assert want == extract_pdf(
        re.sub(rb"startxref\n\d+", b"startxref\n999999", pdf))


def test_object_order_is_scrambled_but_xref_correct():
    pdf = render_pdf(4, LOREM)
    first_obj = int(re.search(rb"(\d+) 0 obj", pdf).group(1))
    # at least one doc_id puts a non-1 object first
    pdfs = [render_pdf(d, LOREM) for d in range(1, 12)]
    firsts = {int(re.search(rb"(\d+) 0 obj", p).group(1))
              for p in pdfs}
    assert len(firsts) > 1, "object order never scrambled"
    del first_obj
    assert roundtrip(4, LOREM)["text"] == " ".join(LOREM.split())


def test_fuzz_roundtrip_determinism():
    rng = random.Random(7)
    alph = "abcdefgh()\\<>[]{}%#/ÄöñAB012"
    for _ in range(120):
        n = rng.randrange(0, 50)
        s = " ".join("".join(rng.choice(alph)
                             for _ in range(rng.randrange(1, 9)))
                     for _ in range(n))
        d = rng.randrange(0, 10 ** 6)
        pdf1, pdf2 = render_pdf(d, s), render_pdf(d, s)
        assert pdf1 == pdf2, "writer not deterministic"
        assert extract_pdf(pdf1)["text"] == " ".join(s.split())


def test_gutter_never_triggers_on_single_column():
    # intra-line gaps are at most one space width << GUTTER_MIN, so a
    # 1-line doc must never be split into fake columns
    assert GUTTER_MIN >= 3 * 6.0
    for d in (1, 3, 101, 999):
        s = "aa bb cc dd"
        assert roundtrip(d, s)["text"] == s


def test_unknown_operators_ignored():
    pdf = render_pdf(1, "hello world")
    # splice graphics ops into the (raw-stream) content of doc 5
    pdf = render_pdf(5, "hello world")
    patched = pdf.replace(
        b"BT", b"q 0.5 0 0 0.5 10 10 cm /GS1 gs 1 0 0 RG Q\nBT", 1)
    # Length now wrong → xref parse of the stream shortens it; rebuild
    # honestly instead: assert the interpreter itself skips junk ops
    from soupflow.data.pdflayout import _interpret_content
    runs = _interpret_content(
        b"q 1 0 0 1 5 5 cm W n\nBT /F1 10 Tf 1 0 0 1 72 720 Tm "
        b"(hi) Tj ET\nQ")
    assert len(runs) == 1 and runs[0].text == "hi"
    del patched


@pytest.mark.usefixtures("ray_session")
def test_ray_pipeline_end_to_end():
    import pandas as pd
    import ray

    df = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": [" ".join(f"d{d}w{i}" for i in range(d * 9))
                 for d in range(8)],
    })
    from soupflow.data.pdflayout import extract_pdfs, render_pdfs
    out = extract_pdfs(render_pdfs(ray.data.from_pandas(df))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "text", "n_pages",
                                 "n_lines", "n_words"]
    for _, row in out.iterrows():
        want = " ".join(df.loc[df.doc_id == row.doc_id, "text"]
                        .iloc[0].split())
        assert row.text == want
        assert row.n_words == len(want.split())

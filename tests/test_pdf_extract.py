"""Unit tests: PDF mini-parser — text, boxes, pages, needs-OCR, splitting.

Golden-count style mirrors ``pdf/tests/test_pdf.py`` (needs-OCR pages,
split block counts, page-text partition)."""
import numpy as np

from text_extraction_system_ray.config import DEFAULT_CONFIG as CFG
from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.functions.pdf_build import build_pdf
from text_extraction_system_ray.functions.pdf_extract import (
    extract_pdf, page_needs_ocr, split_pdf_to_page_pdfs, _round_half_up)


def test_round_half_up():
    assert _round_half_up(1.005) == 1.01
    assert _round_half_up(-1.005) == -1.01
    assert _round_half_up(2.344) == 2.34
    assert _round_half_up(2.345) == 2.35


def test_two_page_text_partition():
    pdf = build_pdf([["This is page 0."], ["This is page 1."]])
    r = extract_row("u", pdf)
    assert r["status"] == "ok" and r["kind"] == "pdf"
    assert r["text"] == "This is page 0.\n\x0cThis is page 1.\n\x0c"
    # pages exactly partition [0, len)
    assert r["pages"][0]["start"] == 0
    assert r["pages"][0]["end"] == r["pages"][1]["start"]
    assert r["pages"][1]["end"] == len(r["text"])
    # "This is page N." in exactly one page span (ref: test_pdf.py:61-89)
    for n, p in enumerate(r["pages"]):
        seg = r["text"][p["start"]:p["end"]]
        assert f"This is page {n}." in seg
        assert f"This is page {1 - n}." not in seg


def test_char_boxes_aligned_and_monospace():
    pdf = build_pdf([["AB"]], font_size=10.0)
    pages = extract_pdf(pdf, CFG)
    chars = pages[0].blocks[0].lines[0]
    assert [c.ch for c in chars] == ["A", "B"]
    x0, y0, w, h = chars[0].bbox
    x1, _, _, _ = chars[1].bbox
    assert w == 5.0 and h == 10.0          # GLYPH_W * fs, fs
    assert x1 == x0 + 5.0


def test_spans_match_text_length():
    pdf = build_pdf([["Hello world", "second line"], ["page two"]])
    r = extract_row("u", pdf)
    assert r["char_spans"].shape == (len(r["text"]), 4)
    # separator chars have zero boxes
    for i, ch in enumerate(r["text"]):
        if ch in "\n\x0c":
            assert np.all(r["char_spans"][i] == 0)
        else:
            assert r["char_spans"][i][3] > 0


def test_needs_ocr_classification():
    # ref analog: ocr1.pdf → pages needing OCR; pdf_complicated.pdf → none
    pdf = build_pdf([["Plenty of text on this page."], []], image_pages=[2])
    r = extract_row("u", pdf)
    assert r["needs_ocr_pages"] == [2]
    pdf2 = build_pdf([["Text only page."]])
    assert extract_row("u", pdf2)["needs_ocr_pages"] == []


def test_compressed_stream():
    pdf = build_pdf([["compressed content line."]], compress=True)
    r = extract_row("u", pdf)
    assert "compressed content line." in r["text"]


def test_rotation_recorded():
    pdf = build_pdf([["a"], ["b"]], rotations=[0, 90])
    r = extract_row("u", pdf)
    assert [p["rotation"] for p in r["pages"]] == [0, 90]


def test_escapes_and_tj_array():
    content = rb"BT /F1 12 Tf 72 720 Td [(Hel) -100 (lo \(x\))] TJ ET"
    pdf = build_pdf([[]], raw_contents=[content])
    r = extract_row("u", pdf)
    assert r["text"].startswith("Hello (x)")


def test_split_equals_whole():
    pdf = build_pdf([[f"Page {i} line {j}." for j in range(3)]
                     for i in range(4)], image_pages=[3])
    whole = extract_row("u", pdf)
    parts = split_pdf_to_page_pdfs(pdf, CFG)
    assert [no for no, _ in parts] == [1, 2, 3, 4]
    texts = []
    for _no, chunk in parts:
        rc = extract_row("u", chunk)
        assert rc["status"] == "ok"
        texts.append(rc["text"])
    assert "".join(texts) == whole["text"]


def test_truncated_pdf_error_row():
    r = extract_row("u", b"%PDF-1.4\nhalf a pdf")
    assert r["status"] == "error"
    assert r["text"] == ""


def test_pdf_outlines_toc():
    """TOC from /Outlines + TOC-path sections (ref: GetTOCFromPDF.java
    + get_sections_from_table_of_contents, data_extract.py:220-263)."""
    from text_extraction_system_ray.config import PipelineConfig
    outlines = [
        {"title": "Chapter 1", "page": 1, "level": 1, "x": 72, "y": 720},
        {"title": "Section 1.1", "page": 1, "level": 2, "x": 72, "y": 705.6},
        {"title": "Chapter 2", "page": 2, "level": 1, "x": 72, "y": 720},
    ]
    pdf = build_pdf([["Chapter 1", "Section 1.1 text here"],
                     ["Chapter 2", "more text"]], outlines=outlines)
    r = extract_row("u", pdf)
    assert [t["title"] for t in r["toc"]] == ["Chapter 1", "Section 1.1",
                                              "Chapter 2"]
    assert [t["level"] for t in r["toc"]] == [1, 2, 1]
    assert [t["page"] for t in r["toc"]] == [1, 1, 2]
    # sections off by default
    assert r["sections"] == []
    cfg = PipelineConfig(read_sections_from_toc=True)
    r2 = extract_row("u", pdf, cfg=cfg)
    secs = r2["sections"]
    assert [s["title"] for s in secs] == ["Chapter 1", "Section 1.1",
                                          "Chapter 2"]
    # Chapter 1 closes at Chapter 2 (same level); Section 1.1 nested
    assert secs[0]["end"] == secs[2]["start"]
    assert secs[1]["abs_level"] == 2
    # section start anchors at the nearest char to the dest coords
    assert r2["text"][secs[0]["start"]:].startswith("Chapter 1")
    assert r2["text"][secs[2]["start"]:].startswith("Chapter 2")


def test_pdf_no_outlines_empty_toc():
    r = extract_row("u", build_pdf([["plain page"]]))
    assert r["toc"] == []


def test_stream_data_indirect_length_multidigit_objnum():
    """ADVICE r2 (high): ``/Length 12 0 R`` must not backtrack-match
    group(1)='1' and truncate the stream to 1 byte — indirect Lengths
    fall back to the lazy endstream scan."""
    from text_extraction_system_ray.functions.pdf_extract import _stream_data
    body = b"<< /Length 12 0 R >>\nstream\nBT (hello) Tj ET\nendstream"
    assert _stream_data(body) == b"BT (hello) Tj ET"
    # declared length not landing at endstream -> lazy scan, not trust
    assert _stream_data(b"<< /Length 3 >>\nstream\nHello\nendstream") \
        == b"Hello"
    # correct declared length wins (binary data ending in CR/LF kept)
    assert _stream_data(b"<< /Length 7 >>\nstream\nHello\r\n\nendstream") \
        == b"Hello\r\n"

"""Text + span assembly: the byte-identity core.

Turns branch IR (HTML kept blocks / PDF page IR) into the flat document
text with index-aligned per-character spans, page records, paragraph
spans, sentence spans, sections, TOC, and language labels — the engine's
analog of ``PDFPlainText`` + ``PlainTextStructure`` + ``PDFCoordinates``
(reference DTOs at ``text_extraction_system_api/dto.py:84-206``,
built in ``data_extract/data_extract.py:134-204``).

Frozen global rules (SURVEY.md §2.8 analog):
  A1. Block separator ``\\n`` (zero-box span); page terminator ``\\f``
      preceded by the final block's ``\\n`` → every non-empty page's text
      ends ``\\n\\f``; an empty page contributes a lone ``\\f``
      (ref: paragraph end ``\\n`` + ``setPageEnd('\\n\\f')``,
      ``PDFToTextWithCoordinates.java:581-582``).
  A2. ``len(char_spans) == len(text)`` — every separator char gets a
      ``[0,0,0,0]`` span (ref: ``.java:219-277``).
  A3. Page ``[start, end)`` spans exactly partition ``[0, len(text))``
      (ref: ``PDFPlainTextPage.location``, ``PDFPlainTextPage.java:7``).
  A4. HTML-branch char spans are ``[block_id, char_offset_in_block, 0, 0]``;
      PDF-branch spans are real ``[x, y, w, h]`` boxes rounded HALF_UP to
      2 decimals (ref: ``.java:61-65``).
  A5. Empty document ⇒ empty text, empty structure, ``language='en'``
      unless a hint forces it (ref: ``data_extract.py:115-129``).
  A6. Sections close at the next heading of the same-or-higher level
      (ref TOC-path semantics, ``data_extract.py:220-263``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .html_extract import Block, HtmlTable, HEADING_TAGS
from .lang import detect_language
from .pdf_extract import PdfPageIR, page_needs_ocr
from .segment import sentence_spans

ZERO_BOX = (0.0, 0.0, 0.0, 0.0)


@dataclass
class AssembledDoc:
    text: str = ""
    char_spans: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.float32))
    pages: List[dict] = field(default_factory=list)
    paragraphs: List[dict] = field(default_factory=list)
    sentences: List[dict] = field(default_factory=list)
    sections: List[dict] = field(default_factory=list)
    toc: List[dict] = field(default_factory=list)
    tables: List[dict] = field(default_factory=list)
    language: str = "en"
    title: str = ""
    needs_ocr_pages: List[int] = field(default_factory=list)


class _Builder:
    def __init__(self):
        self.parts: List[str] = []
        self.boxes: List[np.ndarray] = []
        self.pos = 0

    def add(self, text: str, boxes: Optional[np.ndarray] = None) -> Tuple[int, int]:
        n = len(text)
        if n == 0:
            return (self.pos, self.pos)
        self.parts.append(text)
        if boxes is None:
            boxes = np.zeros((n, 4), np.float32)
        self.boxes.append(boxes)
        start = self.pos
        self.pos += n
        return (start, self.pos)

    def finish(self) -> Tuple[str, np.ndarray]:
        text = "".join(self.parts)
        spans = (np.concatenate(self.boxes, axis=0)
                 if self.boxes else np.zeros((0, 4), np.float32))
        return text, spans


def _page_record(number: int, start: int, end: int, w: float, h: float,
                 rotation: int) -> dict:
    return {"number": number, "start": start, "end": end,
            "bbox": [0.0, 0.0, float(w), float(h)], "rotation": rotation}


def _finalize(doc: AssembledDoc, lang_hint: str) -> AssembledDoc:
    """Language labels + sentence spans, shared by both branches."""
    forced = bool(lang_hint)
    doc.language = lang_hint if forced else detect_language(doc.text)
    sentences: List[dict] = []
    for p in doc.paragraphs:
        p_lang = lang_hint if forced else detect_language(doc.text[p["start"]:p["end"]])
        p["language"] = p_lang
        for s, e in sentence_spans(doc.text, p["start"], p["end"]):
            s_lang = lang_hint if forced else detect_language(doc.text[s:e])
            sentences.append({"start": s, "end": e, "language": s_lang})
    doc.sentences = sentences
    return doc


def _page_of(pos: int, pages: List[dict]) -> int:
    """char index → 1-based page number (ref: ``find_page_by_smb_index``,
    ``pdf_coordinates/pdf_coords_common.py:40-71``)."""
    for p in pages:
        if p["start"] <= pos < p["end"]:
            return p["number"]
    return pages[-1]["number"] if pages else 1


def assemble_html(blocks: Sequence[Block], title: Optional[str],
                  tables: Sequence[HtmlTable], lang_hint: str) -> AssembledDoc:
    doc = AssembledDoc()
    b = _Builder()
    para_spans: List[Tuple[int, int]] = []
    headings: List[Tuple[int, int, int, str, int]] = []  # (start, end, level, title, block_id)
    for block_id, blk in enumerate(blocks):
        n = len(blk.text)
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = block_id
        boxes[:, 1] = np.arange(n, dtype=np.float32)
        s, e = b.add(blk.text, boxes)
        para_spans.append((s, e))
        if blk.kind in HEADING_TAGS:
            headings.append((s, e, int(blk.kind[1]), blk.text, block_id))
        b.add("\n")
    if blocks:
        b.add("\f")
    doc.text, doc.char_spans = b.finish()
    if doc.text:
        doc.pages = [_page_record(1, 0, len(doc.text), 0.0, 0.0, 0)]
    doc.paragraphs = [{"start": s, "end": e} for s, e in para_spans]
    doc.title = title or ""
    # sections (rule A6) + toc from headings
    sections: List[dict] = []
    level_stack: List[int] = []
    for i, (s, e, lvl, ttl, block_id) in enumerate(headings):
        end = len(doc.text)
        for s2, _e2, lvl2, _t2, _b2 in headings[i + 1:]:
            if lvl2 <= lvl:
                end = s2
                break
        while level_stack and level_stack[-1] >= lvl:
            level_stack.pop()
        level_stack.append(lvl)
        sections.append({
            "start": s, "end": end, "title": ttl, "title_start": s,
            "title_end": e, "level": lvl, "abs_level": len(level_stack),
            "left": 0.0, "top": float(block_id), "page": _page_of(s, doc.pages),
        })
        doc.toc.append({"title": ttl, "level": lvl, "left": 0.0,
                        "top": float(block_id), "page": _page_of(s, doc.pages)})
    sections.sort(key=lambda x: x["start"])   # ref: data_extract.py:245
    doc.sections = sections
    doc.tables = [{
        "page": 1, "left": 0.0, "top": float(t.raw_index),
        "width": float(t.n_cols), "height": float(len(t.rows)),
        "cells": [list(r) for r in t.rows],
    } for t in tables]
    return _finalize(doc, lang_hint)


def assemble_pdf(pages: Sequence[PdfPageIR], lang_hint: str,
                 tables_enable: bool = True) -> AssembledDoc:
    doc = AssembledDoc()
    b = _Builder()
    para_spans: List[Tuple[int, int]] = []
    page_records: List[dict] = []
    for pg in pages:
        p_start = b.pos
        for blk in pg.blocks:
            blk_start = b.pos
            for li, line in enumerate(blk.lines):
                if li > 0:
                    b.add("\n")
                if line:
                    text = "".join(c.ch for c in line)
                    boxes = np.array([c.bbox for c in line], np.float32)
                    b.add(text, boxes)
            b.add("\n")
            para_spans.append((blk_start, b.pos - 1))  # exclude trailing \n
        b.add("\f")
        page_records.append(_page_record(pg.number, p_start, b.pos,
                                         pg.width, pg.height, pg.rotation))
        if page_needs_ocr(pg):
            doc.needs_ocr_pages.append(pg.number)
        if tables_enable:
            from .pdf_tables import detect_pdf_tables
            doc.tables.extend(detect_pdf_tables(pg, pg.number))
    doc.text, doc.char_spans = b.finish()
    doc.pages = page_records
    doc.paragraphs = [{"start": s, "end": e} for s, e in para_spans]
    return _finalize(doc, lang_hint)


def assemble_empty(lang_hint: str) -> AssembledDoc:
    """Rule A5 (ref: ``data_extract.py:115-129``)."""
    doc = AssembledDoc()
    doc.language = lang_hint or "en"
    return doc


def assemble_image(width: float, height: float,
                   lang_hint: str) -> AssembledDoc:
    """Raw-image payload → one textless page flagged for OCR — the
    reference's image-file intake (``MakePDFFromImages`` wraps the image
    in a one-page PDF before the OCR arm, ``convert_to_pdf.py:84-92``).
    The page terminator keeps the text/char-span contract of a textless
    PDF page; OcrPages recognizes the image payload and rasters it
    directly through the real decoders."""
    doc = AssembledDoc()
    b = _Builder()
    b.add("\f")
    doc.text, doc.char_spans = b.finish()
    doc.pages = [_page_record(1, 0, 1, float(width), float(height), 0)]
    doc.needs_ocr_pages = [1]
    return _finalize(doc, lang_hint)


def sections_from_toc(toc: List[dict], char_spans: np.ndarray,
                      pages: List[dict], text_len: int) -> List[dict]:
    """TOC-path section building (ref
    ``get_sections_from_table_of_contents``, ``data_extract.py:220-263``):
    map each TOC entry to the nearest char by (left, top) within its page
    (``find_closest_symbol_pos`` analog, ``coord_text_map.py:68-94``),
    sort by start, close each section at the next same-or-higher level."""
    from .coord_map import find_closest_char
    anchored = []
    for e in toc:
        page = next((p for p in pages if p["number"] == e["page"]), None)
        if page is None:
            continue
        idx = find_closest_char(char_spans, e["left"], e["top"],
                                page["start"], page["end"])
        if idx < 0:
            idx = page["start"]
        anchored.append((idx, e))
    anchored.sort(key=lambda t: t[0])
    sections: List[dict] = []
    level_stack: List[int] = []
    for i, (start, e) in enumerate(anchored):
        end = text_len
        for start2, e2 in anchored[i + 1:]:
            if e2["level"] <= e["level"]:
                end = start2
                break
        while level_stack and level_stack[-1] >= e["level"]:
            level_stack.pop()
        level_stack.append(e["level"])
        sections.append({
            "start": start, "end": end, "title": e["title"],
            "title_start": start,
            "title_end": min(start + len(e["title"]), end),
            "level": e["level"], "abs_level": len(level_stack),
            "left": float(e["left"]), "top": float(e["top"]),
            "page": e["page"],
        })
    sections.sort(key=lambda s: s["start"])
    return sections

"""Chunk-row merge: the fan-in of the skew path.

Reference analog: the Celery chord fan-in ``finish_pdf_processing``
(``tasks.py:365-437``) that reassembles per-page results by parsing
``{page:05d}`` names; here chunk rows carry an integer ``chunk_id`` and
merge by offset arithmetic (ref precedent for the offset bookkeeping:
page ``location`` spans, ``PDFPlainTextPage.java:7``,
``PDFToTextWithCoordinates.java:535-543``).

The merge is exact: ``merge_extracted_rows(per-page extractions) ==
extract_row(whole document)`` — property-tested in
``tests/test_chunk.py``.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .lang import detect_language


def merge_extracted_rows(rows: List[Dict], lang_hint: str = "") -> Dict:
    """Merge per-chunk extract_row() dicts (already sorted by chunk_id)."""
    if not rows:
        raise ValueError("no chunk rows to merge")
    url = rows[0]["url"]
    err = next((r for r in rows if r["status"] != "ok"), None)
    if err is not None:
        out = dict(err)
        out["url"] = url
        return out
    parts: List[str] = []
    spans: List[np.ndarray] = []
    pages: List[dict] = []
    paragraphs: List[dict] = []
    sentences: List[dict] = []
    sections: List[dict] = []
    toc: List[dict] = []
    tables: List[dict] = []
    needs_ocr: List[int] = []
    off = 0
    page_no = 0
    for r in rows:
        page_shift = page_no
        parts.append(r["text"])
        spans.append(r["char_spans"])
        for p in r["pages"]:
            page_no += 1
            pages.append({**p, "number": page_no,
                          "start": p["start"] + off, "end": p["end"] + off})
        for p in r["paragraphs"]:
            paragraphs.append({**p, "start": p["start"] + off, "end": p["end"] + off})
        for s in r["sentences"]:
            sentences.append({**s, "start": s["start"] + off, "end": s["end"] + off})
        for s in r["sections"]:
            sections.append({**s, "start": s["start"] + off, "end": s["end"] + off,
                             "title_start": s["title_start"] + off,
                             "title_end": s["title_end"] + off,
                             "page": s["page"] + page_shift})
        for t in r["toc"]:
            toc.append({**t, "page": t["page"] + page_shift})
        for t in r["tables"]:
            tables.append({**t, "page": t["page"] + page_shift})
        needs_ocr.extend(n + page_shift for n in r["needs_ocr_pages"])
        off += len(r["text"])
    text = "".join(parts)
    return {
        "url": url, "status": "ok", "error": "", "kind": rows[0]["kind"],
        "text": text,
        "char_spans": (np.concatenate(spans, axis=0) if spans
                       else np.zeros((0, 4), np.float32)),
        "pages": pages, "paragraphs": paragraphs, "sentences": sentences,
        "sections": sections, "toc": toc, "tables": tables,
        "language": lang_hint or detect_language(text),
        "title": next((r["title"] for r in rows if r["title"]), ""),
        "needs_ocr_pages": needs_ocr,
    }

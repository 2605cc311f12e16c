"""The per-row extraction oracle.

``extract_row`` is the single source of truth for extraction semantics:
the distributed pipeline is ``map_batches`` over exactly this function, and
the tests apply it serially in plain Python and require byte-identical
output (BASELINE.json: "byte-identical extracted text per url").

Reference analog: the whole per-document DAG ``process_document →
process_pdf → extract_data_and_finish`` (``tasks.py:207-565``) collapsed
into one pure function over the payload bytes.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions.assembly import (AssembledDoc, assemble_empty, assemble_html,
                                 assemble_image, assemble_pdf,
                                 sections_from_toc)
from .functions.html_extract import ExtractError, extract_html
from .functions.pdf_extract import extract_pdf_full


def image_dims(payload: bytes):
    """(width, height) from the image header only — no pixel decode on
    the extraction path (the full decode happens in the OCR arm)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .functions.png import png_dims
        return png_dims(payload)
    if payload[:2] == b"\xff\xd8":
        from .functions.jpeg import jpeg_dims
        return jpeg_dims(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .functions.tiff import tiff_dims
        return tiff_dims(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .functions.webp import webp_dims
        return webp_dims(payload)
    from .functions.gif import gif_dims
    return gif_dims(payload)


PDF_MAGIC = b"%PDF-"
_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# bytes that are NOT control chars per the sniff rule
# (ctrl = b<9 or 13<b<32 except ESC)
_NON_CTRL = bytes(b for b in range(256)
                  if not (b < 9 or (13 < b < 32 and b != 27)))


def sniff_kind(payload: Optional[bytes]) -> str:
    """Payload dispatch by magic bytes (ref: extension dispatch at
    ``tasks.py:222-237`` / ``convert_to_pdf.py:84-92``; web payloads are
    sniffed, not trusted by name). Frozen rules:
      - empty → 'empty'
      - b'%PDF-' within the first 1024 bytes → 'pdf'
      - PNG / JPEG / GIF magic → 'image' (decoded by the pure-numpy
        codecs; the reference converts image files to one-page PDFs
        before the OCR arm)
      - >10% non-text control bytes in the first 4096 → 'unknown' (binary)
      - else → 'html'
    """
    if not payload:
        return "empty"
    if PDF_MAGIC in payload[:1024]:
        return "pdf"
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8" \
            or payload[:6] in (b"GIF87a", b"GIF89a") \
            or payload[:4] in (b"II*\x00", b"MM\x00*") \
            or (payload[:4] == b"RIFF" and payload[8:12] == b"WEBP") \
            or payload[:8] == b"FAKEIMG1":
        return "image"
    if payload[:4] == b"PK\x03\x04" or payload[:8] == _OLE_MAGIC:
        from .functions.office import sniff_office
        if sniff_office(payload):
            return "office"
    head = payload[:4096]
    # C-speed control-byte count: delete everything non-control, measure
    n_ctrl = len(head.translate(None, _NON_CTRL))
    if n_ctrl > len(head) * 0.10:
        return "unknown"
    return "html"


def _doc_to_row(url: str, kind: str, doc: AssembledDoc,
                status: str = "ok", error: str = "") -> Dict:
    return {
        "url": url, "status": status, "error": error, "kind": kind,
        "text": doc.text, "char_spans": doc.char_spans,
        "pages": doc.pages, "paragraphs": doc.paragraphs,
        "sentences": doc.sentences, "sections": doc.sections,
        "toc": doc.toc, "tables": doc.tables,
        "language": doc.language, "title": doc.title,
        "needs_ocr_pages": doc.needs_ocr_pages,
    }


def error_row(url: str, kind: str, message: str, lang_hint: str = "") -> Dict:
    """Errors become rows, never exceptions — a bad document must not kill
    a Ray task (SURVEY.md §1.3 'RequestStatus' row; ref FAILURE status,
    ``request_metadata.py:93-110``)."""
    doc = assemble_empty(lang_hint)
    return _doc_to_row(url, kind, doc, status="error", error=message)


def extract_row(url: str, payload: Optional[bytes], lang_hint: str = "",
                cfg: PipelineConfig = DEFAULT_CONFIG) -> Dict:
    """Extract one document. Deterministic; never raises."""
    lang_hint = (lang_hint or "").strip().lower()[:2]
    try:
        if payload is not None and len(payload) > cfg.max_payload_bytes:
            return error_row(url, "unknown",
                             f"payload too large: {len(payload)} bytes", lang_hint)
        kind = sniff_kind(payload)
        if kind == "empty":
            return _doc_to_row(url, kind, assemble_empty(lang_hint))
        if kind == "unknown":
            return error_row(url, kind, "unrecognized binary payload", lang_hint)
        forced = lang_hint if cfg.doc_language == "" else cfg.doc_language
        if kind == "image":
            w, h = image_dims(payload)
            return _doc_to_row(url, kind, assemble_image(w, h, forced))
        if kind in ("pdf", "office"):
            if kind == "office":
                # normalize-to-PDF first, like every reference intake
                # (convert_to_pdf.py:61-102); legacy OLE .doc raises
                from .functions.office import office_to_pdf
                try:
                    payload = office_to_pdf(payload)
                except ValueError as ex:
                    return error_row(url, kind, str(ex), lang_hint)
            # ONE object scan + (if encrypted) one decrypt serves both
            # the page IR and the TOC walk
            pages, toc = extract_pdf_full(payload, cfg)
            doc = assemble_pdf(pages, forced,
                               tables_enable=cfg.table_extraction_enable)
            doc.toc = toc
            if cfg.read_sections_from_toc and doc.toc:
                doc.sections = sections_from_toc(
                    doc.toc, doc.char_spans, doc.pages, len(doc.text))
            return _doc_to_row(url, kind, doc)
        blocks, title, tables = extract_html(payload, cfg)
        if not blocks:
            return _doc_to_row(url, "html", assemble_empty(forced))
        return _doc_to_row(url, "html", assemble_html(blocks, title, tables, forced))
    except ExtractError as e:
        return error_row(url, sniff_kind(payload), str(e), lang_hint)
    except RecursionError:
        return error_row(url, "unknown", "recursion limit", lang_hint)
    except Exception as e:  # noqa: BLE001 — poison rows must not propagate
        return error_row(url, "unknown", f"{type(e).__name__}: {e}", lang_hint)

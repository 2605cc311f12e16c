"""Additional PDF operations (SURVEY.md §2.2 M6/M8/M14/M17/M26 analogs).

- ``page_image_counts`` / ``get_page_images_amount``: count image XObjects
  per page (ref ``pdf/pdf.py:192-198`` — drives progress + OCR task fan-out).
- ``remove_text_layer``: rebuild the PDF with text operators stripped from
  every content stream (ref ``remove_ocr_layer.py:16-46`` +
  ``RemovePdfText.java:17-67`` — used with ``remove_ocr_layer=True`` input
  flag; also the text-free page variant for OCR input,
  ``pdf/pdf.py:201-232``).
- ``rotate_pdf_pages``: set /Rotate on pages (ref ``pdf/pdf.py:370-389``
  + ``RotatePdf.java`` — in-process instead of a Java subprocess).
- ``render_debug_pdf``: draw a rectangle per char bbox (ref
  ``GetTextFromPDF.java:100-122`` ``renderDebugPDF`` — blue rects per
  char for span visualization).
- ``rasterize_page``: STUB — page→PNG at 300 DPI needs an image backend
  (ref ``pdf/pdf.py:70-117``; DPI constant ``data_extract.py:48``).
"""
from __future__ import annotations

import re
import zlib
from typing import Dict, List, Sequence, Tuple

from .html_extract import ExtractError
from .pdf_build import build_pdf
from .pdf_extract import _PdfDoc, PdfPageIR
from ..config import DEFAULT_CONFIG, PipelineConfig

OCR_DPI = 300   # ref constant, data_extract.py:48 / pdf/pdf.py:76

_BT_ET_RE = re.compile(rb"\bBT\b.*?\bET\b", re.DOTALL)


def page_image_counts(payload: bytes,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> Dict[int, int]:
    """{1-based page -> count of /Image XObjects in its resources}."""
    doc = _PdfDoc(payload, cfg)
    out: Dict[int, int] = {}
    for i, pobj in enumerate(doc.pages, start=1):
        xo = re.search(rb"/XObject\s*<<(.*?)>>", pobj.body, re.DOTALL)
        n = 0
        if xo:
            for r in re.finditer(rb"(\d+)\s+\d+\s+R", xo.group(1)):
                obj = doc.objs.get(int(r.group(1)))
                if obj is not None and b"/Image" in doc._dict_part(obj):
                    n += 1
        out[i] = n
    return out


def get_page_images_amount(payload: bytes,
                           cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """Number of pages that contain at least one image (ref
    ``pdf/pdf.py:192-198``)."""
    return sum(1 for n in page_image_counts(payload, cfg).values() if n > 0)


def remove_text_layer(payload: bytes,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> bytes:
    """Rebuild with all BT..ET text objects stripped from content streams.
    Image/graphics operators survive; the result round-trips through the
    extractor as an empty-text document."""
    doc = _PdfDoc(payload, cfg)
    pages: List[Tuple] = []
    raw_contents = []
    rotations = []
    media = []
    image_flags = []
    for pobj in doc.pages:
        content = doc.content_bytes(pobj)
        stripped = _BT_ET_RE.sub(b"", content)
        raw_contents.append(stripped)
        rotations.append(pobj.rotate)
        media.append(pobj.media)
        image_flags.append(pobj.has_image)
    mb = media[0] if media else (612.0, 792.0)
    return build_pdf(pages=[[] for _ in raw_contents], media_box=mb,
                     rotations=rotations,
                     image_pages=[i + 1 for i, f in enumerate(image_flags) if f],
                     raw_contents=raw_contents)


def rotate_pdf_pages(payload: bytes, angle: int,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> bytes:
    """Set /Rotate = angle on every page (ref ``rotate_pdf_pages``,
    ``pdf/pdf.py:370-389``)."""
    doc = _PdfDoc(payload, cfg)
    raw_contents = [doc.content_bytes(p) for p in doc.pages]
    mb = doc.pages[0].media if doc.pages else (612.0, 792.0)
    return build_pdf(pages=[[] for _ in raw_contents], media_box=mb,
                     rotations=[angle] * len(raw_contents),
                     image_pages=[i + 1 for i, p in enumerate(doc.pages)
                                  if p.has_image],
                     raw_contents=raw_contents)


def render_debug_pdf(char_spans, pages: Sequence[dict]) -> bytes:
    """Build a PDF with one stroked rectangle per non-zero char bbox,
    one output page per page record (ref ``renderDebugPDF``,
    ``GetTextFromPDF.java:100-122``)."""
    import numpy as np
    a = np.asarray(char_spans, dtype=np.float64).reshape(-1, 4)
    raw_contents = []
    media = (612.0, 792.0)
    for p in pages:
        if p["bbox"][2] > 0:
            media = (p["bbox"][2], p["bbox"][3])
        seg = a[p["start"]:p["end"]]
        seg = seg[(seg[:, 2] > 0) & (seg[:, 3] > 0)]
        ops = ["0 0 1 RG 0.5 w"]   # blue stroke like the reference
        for x, y, w, h in seg:
            ops.append(f"{x:g} {y:g} {w:g} {h:g} re S")
        raw_contents.append(" ".join(ops).encode("ascii"))
    if not raw_contents:
        raw_contents = [b""]
    return build_pdf(pages=[[] for _ in raw_contents], media_box=media,
                     raw_contents=raw_contents)


def rasterize_page(payload: bytes, page: int, dpi: int = OCR_DPI) -> bytes:
    """STUB — rasterization needs an image backend (pdftoppm / PDFBox
    renderer in the reference, ``pdf/pdf.py:70-117``); none exists in this
    environment."""
    raise NotImplementedError(
        "page rasterization requires an image backend (pdf2image/PDFBox); "
        "not available in this environment")

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
from typing import Dict, List, Optional, Sequence, Tuple

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


def _page_image_names(doc: "_PdfDoc", pobj) -> List[str]:
    """Names of the page's /Image XObject resources (so rebuilds keep
    the original resource names and content-stream ``/Name Do`` refs —
    and thus has_image / image_cover — intact; ADVICE r2)."""
    xo = re.search(rb"/XObject\s*<<(.*?)>>", pobj.body, re.DOTALL)
    names: List[str] = []
    if xo:
        for r in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R",
                             xo.group(1)):
            obj = doc.objs.get(int(r.group(2)))
            if obj is not None and b"/Image" in doc._dict_part(obj):
                names.append(r.group(1).decode("latin-1"))
    return names


_OCR_TAG = b"/OliveGeneratedContent"
_OCR_OPEN_RE = re.compile(rb"\s*(?:<<.*?>>\s*)?(?:BDC|BMC)(?![0-9A-Za-z])",
                          re.DOTALL)
_PDF_DELIMS = frozenset(b"\x00\t\n\x0c\r ()<>[]{}/%")


def _is_pdf_token(b: bytes, i: int, length: int) -> bool:
    """True when b[i:i+length] stands alone as a PDF token (delimited or
    at a buffer boundary on both sides)."""
    if i > 0 and b[i - 1] not in _PDF_DELIMS:
        return False
    j = i + length
    return j >= len(b) or b[j] in _PDF_DELIMS


def _scan_to_emc(b: bytes, pos: int) -> int:
    """Position just past the EMC balancing an open BMC/BDC at ``pos``,
    skipping PDF string literals ``(...)`` (with backslash escapes and
    nested parens), hex strings ``<...>`` and dicts ``<<...`` — a naive
    ``.*?EMC`` regex would terminate at the word EMC inside OCR'd text
    (ADVICE r3). Returns -1 when unbalanced."""
    depth = 1
    n = len(b)
    i = pos
    while i < n:
        c = b[i]
        if c == 0x28:                       # ( literal string
            i += 1
            pdepth = 1
            while i < n and pdepth:
                ch = b[i]
                if ch == 0x5C:              # backslash escape
                    i += 2
                    continue
                if ch == 0x28:
                    pdepth += 1
                elif ch == 0x29:
                    pdepth -= 1
                i += 1
            continue
        if c == 0x3C:                       # << dict or < hex string
            if i + 1 < n and b[i + 1] == 0x3C:
                i += 2
                continue
            j = b.find(b">", i + 1)
            i = n if j < 0 else j + 1
            continue
        if c in (0x42, 0x45):               # B / E fast gate
            if (b.startswith(b"BMC", i) or b.startswith(b"BDC", i)) \
                    and _is_pdf_token(b, i, 3):
                depth += 1
                i += 3
                continue
            if b.startswith(b"EMC", i) and _is_pdf_token(b, i, 3):
                depth -= 1
                i += 3
                if depth == 0:
                    return i
                continue
        i += 1
    return -1


def _strip_ocr_layers(content: bytes) -> bytes:
    """Remove every ``/OliveGeneratedContent BMC|BDC .. EMC`` span,
    matching the layer's STRUCTURAL end (string-literal-aware, nested
    marked content balanced)."""
    out = []
    i = 0
    while True:
        j = content.find(_OCR_TAG, i)
        if j < 0:
            out.append(content[i:])
            break
        e = j + len(_OCR_TAG)
        if e < len(content) and content[e] not in _PDF_DELIMS:
            out.append(content[i:e])        # longer name, not our tag
            i = e
            continue
        m = _OCR_OPEN_RE.match(content, e)
        if not m:
            out.append(content[i:j + len(_OCR_TAG)])
            i = j + len(_OCR_TAG)
            continue
        end = _scan_to_emc(content, m.end())
        if end < 0:                         # unbalanced: leave untouched
            out.append(content[i:j + len(_OCR_TAG)])
            i = j + len(_OCR_TAG)
            continue
        out.append(content[i:j])
        i = end
    return b"".join(out)


def remove_ocr_layer(payload: bytes,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> bytes:
    """Remove ONLY the engine/reference OCR text layer (marked content
    tagged ``/OliveGeneratedContent``), preserving born-digital text on
    mixed pages — the reference's ``MarkedContentRemover.java`` matcher
    + ``remove_ocr_layer.py:16-46`` behavior. Round-trip contract
    (tested): extract → attach layer → remove layer reproduces the
    original extraction exactly."""
    return remove_text_layer(payload, cfg, only_ocr_layer=True)


def remove_text_layer(payload: bytes,
                      cfg: PipelineConfig = DEFAULT_CONFIG,
                      only_ocr_layer: bool = False) -> bytes:
    """Rebuild with text stripped from content streams: ALL BT..ET text
    objects by default (ref ``RemovePdfText.java``), or — with
    ``only_ocr_layer=True`` — only the ``/OliveGeneratedContent``
    marked-content spans the searchable-PDF merge writes, leaving
    original text intact. Image/graphics operators survive."""
    doc = _PdfDoc(payload, cfg)
    pages: List[Tuple] = []
    raw_contents = []
    rotations = []
    media = []
    image_flags = []
    image_names = {}
    for i, pobj in enumerate(doc.pages, start=1):
        content = doc.content_bytes(pobj)
        if only_ocr_layer:
            stripped = _strip_ocr_layers(content)
        else:
            stripped = _BT_ET_RE.sub(b"", content)
        raw_contents.append(stripped)
        rotations.append(pobj.rotate)
        media.append(pobj.media)
        image_flags.append(pobj.has_image)
        nm = _page_image_names(doc, pobj)
        if nm:
            image_names[i] = nm
    return build_pdf(pages=[[] for _ in raw_contents],
                     media_box=media or (612.0, 792.0),
                     rotations=rotations,
                     image_pages=[i + 1 for i, f in enumerate(image_flags) if f],
                     raw_contents=raw_contents, image_names=image_names)


def rotate_pdf_pages(payload: bytes, angle: int,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> bytes:
    """Set /Rotate = angle on every page (ref ``rotate_pdf_pages``,
    ``pdf/pdf.py:370-389``)."""
    doc = _PdfDoc(payload, cfg)
    raw_contents = [doc.content_bytes(p) for p in doc.pages]
    media = [p.media for p in doc.pages]
    image_names = {i: _page_image_names(doc, p)
                   for i, p in enumerate(doc.pages, start=1)
                   if _page_image_names(doc, p)}
    return build_pdf(pages=[[] for _ in raw_contents],
                     media_box=media or (612.0, 792.0),
                     rotations=[angle] * len(raw_contents),
                     image_pages=[i + 1 for i, p in enumerate(doc.pages)
                                  if p.has_image],
                     raw_contents=raw_contents, image_names=image_names)


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


def _escape_pdf_text(s: str) -> str:
    return (s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            .replace("\r", " "))


def merge_text_layer_pdf(payload: bytes, page_texts: Dict[int, str],
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         page_angles: Optional[Dict[int, float]] = None) -> bytes:
    """The searchable-PDF artifact (M18): overlay per-page OCR text onto
    the original document as an INVISIBLE text layer (render mode
    ``3 Tr``) prepended to each page's content — the reference's
    ``MergeInPageLayers.java:44-315`` merges per-page text-layer PDFs as
    prepended form XObjects; here the layer is emitted as a prepended
    text object in the same content stream (one fewer indirection, same
    extraction semantics). Page rotations, media boxes, image resources
    and the outline tree survive; ``page_angles`` applies the
    ``{page:05}.angle.pdf`` rotation convention (``tasks.py:398-416``)
    as a text-matrix rotation of the layer.

    Round-trip contract (tested): re-extracting the merged PDF yields
    the OCR text on OCRed pages and the original text elsewhere, like
    the reference's re-extraction after merge (``tasks.py:440-455``).
    """
    import math
    from .pdf_extract import extract_pdf_toc
    doc = _PdfDoc(payload, cfg)
    try:
        toc = extract_pdf_toc(payload, cfg)
    except Exception:
        toc = []
    page_angles = page_angles or {}
    raw_contents = []
    rotations = []
    image_flags = []
    media: List[Tuple[float, float]] = []
    image_names = {}
    for i, pobj in enumerate(doc.pages, start=1):
        content = doc.content_bytes(pobj)
        media.append(pobj.media)
        nm = _page_image_names(doc, pobj)
        if nm:
            image_names[i] = nm
        text = page_texts.get(i)
        if text:
            h = pobj.media[1]
            ang = page_angles.get(i, 0.0)
            if ang:
                c = math.cos(math.radians(ang))
                s = math.sin(math.radians(ang))
                tm = f"{c:.6f} {s:.6f} {-s:.6f} {c:.6f} 20 {h - 30:g} Tm"
            else:
                tm = f"1 0 0 1 20 {h - 30:g} Tm"
            lines = [ln for ln in text.split("\n")]
            ops = [f"BT /F1 10 Tf 3 Tr 12 TL {tm}"]
            for j, ln in enumerate(lines):
                if j:
                    ops.append("T*")
                ops.append(f"({_escape_pdf_text(ln)}) Tj")
            ops.append("ET")
            # tag the generated layer as marked content so selective
            # removal can strip ONLY it (ref MarkedContentRemover.java:
            # matcher on /OliveGeneratedContent; remove_ocr_layer.py:16-46)
            layer = b"/OliveGeneratedContent BMC " \
                + " ".join(ops).encode("latin-1", errors="replace") \
                + b" EMC"
            content = layer + b"\n" + content
        raw_contents.append(content)
        rotations.append(pobj.rotate)
        image_flags.append(pobj.has_image)
    outlines = [{"title": e["title"], "page": e["page"],
                 "level": e["level"], "x": e["left"], "y": e["top"]}
                for e in toc]
    return build_pdf(pages=[[] for _ in raw_contents],
                     media_box=media or (612.0, 792.0),
                     rotations=rotations,
                     image_pages=[i + 1 for i, f in enumerate(image_flags)
                                  if f],
                     raw_contents=raw_contents,
                     outlines=outlines or None, image_names=image_names)


def rasterize_page(payload: bytes, page: int, dpi: int = OCR_DPI,
                   cfg: PipelineConfig = DEFAULT_CONFIG) -> bytes:
    """Render one page to a grayscale raster (M6 analog; ref
    ``pdf/pdf.py:70-117`` rasterizes via PDFBox/pdftoppm at 300 DPI).

    The engine renders its OWN layout IR — char boxes painted as ink —
    in pure numpy (``functions/raster.rasterize_page_ir``), returning
    FAKEIMG1 mode-L bytes. That is a real renderer for everything the
    text parser sees (enough to drive skew detection and the OCR-arm
    plumbing on synthetic rasters); embedded scanned *bitmaps* still
    need an image backend in a real deployment (swap in pdf2image)."""
    from .pdf_extract import extract_pdf
    from .raster import encode_l_image, rasterize_page_ir
    pages = extract_pdf(payload, cfg)
    if not 1 <= page <= len(pages):
        raise ValueError(f"page {page} out of range 1..{len(pages)}")
    return encode_l_image(rasterize_page_ir(pages[page - 1], dpi=dpi))

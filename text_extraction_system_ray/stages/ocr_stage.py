"""Optional OCR stage — actor-pool plumbing with a pluggable backend.

Reference analog: the per-page OCR pipeline (``process_pdf_page``,
``data_extract/data_extract.py:297-362`` — orientation probe → rotation →
tesseract → text-layer PDF, merged back via ``MergeInPageLayers``).

No tesseract exists in this environment, so the stage ships with:
- ``TesseractBackend`` — raises NotImplementedError at construction
  (clearly marked stub; drop in pytesseract in a real deployment), and
- ``FakeOcrBackend`` — a deterministic stand-in (text derived from the
  page payload hash) so the Ray-side plumbing (actor signature, batch
  flow, output layout) is real and tested.

Design divergence (documented): the reference merges OCR text INTO the
PDF and re-extracts; this engine keeps the byte-identity text column
untouched and emits OCR results as a separate ``ocr_pages`` column
(list<struct<page:int32, text:string>>), joined to needs_ocr_pages.
"""
from __future__ import annotations

import hashlib
from typing import List, Optional

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.pdf_extract import split_pdf_to_page_pdfs


class OcrBackend:
    def ocr_page(self, page_pdf: bytes, language: str) -> str:
        raise NotImplementedError

    def ocr_raster(self, img, language: str) -> Optional[str]:
        """OCR a deskewed grayscale raster (numpy H×W uint8). Backends
        that can only consume PDFs return None; the caller then falls
        back to :meth:`ocr_page` on the original page bytes."""
        return None


class TesseractBackend(OcrBackend):
    """STUB — requires the tesseract binary / pytesseract (ref
    ``ocr/ocr.py:80-131``: ``tesseract --psm 1|3 -c
    tessedit_create_pdf=1``), neither present in this environment."""

    def __init__(self):
        raise NotImplementedError(
            "tesseract is not available in this environment; "
            "use FakeOcrBackend for plumbing tests")


class FakeOcrBackend(OcrBackend):
    """Deterministic fake: 'ocr page <digest>' from the page bytes (or
    the deskewed raster bytes on the raster path)."""

    def ocr_page(self, page_pdf: bytes, language: str) -> str:
        digest = hashlib.sha1(page_pdf).hexdigest()[:12]
        return f"[ocr:{language or 'osd'}:{digest}]"

    def ocr_raster(self, img, language: str) -> str:
        digest = hashlib.sha1(img.tobytes()).hexdigest()[:12]
        return f"[ocr-raster:{language or 'osd'}:{digest}]"


class OcrPages:
    """map_batches actor: for extracted rows whose ``needs_ocr_pages`` is
    non-empty, re-split the original payload per page and OCR those pages.
    Input batch needs columns: url, html (original payload),
    needs_ocr_pages. Output: adds ``ocr_pages``.

    ``deskew=True`` runs the reference's detect→rotate arm per page
    (``process_pdf_page``, ``data_extract.py:305-362``) with the
    engine's raster kernels: rasterize the page (real renderer over the
    layout IR), projection-profile skew detection, then nearest-neighbor
    counter-rotation of the raster which is fed to the backend's
    ``ocr_raster`` path (backends without raster support fall back to
    ``ocr_page`` on the original page bytes); the detected angle rides
    in the output struct (feeds ``attach_searchable_pdf``'s
    ``page_angles``, the ``{page:05}.angle.pdf`` analog).

    Before the fractional-skew pass, the OSD-analog orientation probe
    (``raster.detect_orientation_raster_full``) checks for 90/180/270
    rotation; when its confidence clears the reference's acceptance rule
    (``rotation.osd_accept``, ``ocr/ocr.py:240-241``) the raster is
    counter-rotated first — the reference applies tesseract OSD the same
    way before OCR (``ocr/ocr.py:28-77``). The applied orientation is
    recorded per page in the output struct."""

    def __init__(self, backend: Optional[OcrBackend] = None,
                 cfg: Optional[PipelineConfig] = None, language: str = "",
                 deskew: bool = False, min_deskew_angle: float = 0.5,
                 detect_tables: bool = False):
        self.backend = backend or FakeOcrBackend()
        self.cfg = cfg or DEFAULT_CONFIG
        self.language = language
        self.deskew = deskew
        self.min_deskew_angle = min_deskew_angle
        # raster-side table detection on the OCR raster (the char-box
        # detector can't see scanned pages — ref runs its cv2 detector
        # on the page image, ocr/tables/table_detection.py:311-445)
        self.detect_tables = detect_tables

    def _page_angle(self, page_pdf: bytes):
        """(orientation deg, fractional skew angle, corrected raster) —
        one rasterization serves detection and the deskewed-OCR input;
        orientation is applied to the raster before skew detection when
        it passes the osd_accept gate."""
        from ..extract import sniff_kind
        from ..functions.pdf_ops import rasterize_page
        from ..functions.raster import (decode_l_image,
                                        detect_flip_raster,
                                        detect_orientation_raster,
                                        detect_rotation_projection,
                                        rotate_image_array)
        from ..functions.rotation import osd_accept
        if sniff_kind(page_pdf) == "image":
            # raw-image page: the REAL decoded bitmap is the raster —
            # scanned content flows through actual pixels, not the IR
            img = decode_l_image(page_pdf)
        else:
            img = decode_l_image(rasterize_page(page_pdf, 1, dpi=72,
                                                cfg=self.cfg))
        # the two probes gate INDEPENDENTLY: a 90-rotated page with
        # symmetric glyphs has a certain axis but no flip evidence
        orient = 0
        axis, aconf = detect_orientation_raster(img)
        if axis and osd_accept(2.0, aconf):
            img = rotate_image_array(img, -axis)
            orient = axis
        flip, fconf = detect_flip_raster(img)
        if flip and osd_accept(2.0, fconf):
            img = rotate_image_array(img, -flip)
            orient = (orient + flip) % 360
        return orient, detect_rotation_projection(img), img

    def _ocr_deskewed(self, page_pdf: bytes, img, angle: float) -> str:
        """Counter-rotate the raster by the detected angle and OCR it;
        fall back to the original page bytes for PDF-only backends."""
        from ..functions.raster import rotate_image_array
        deskewed = rotate_image_array(img, -angle) if angle else img
        text = self.backend.ocr_raster(deskewed, self.language)
        if text is None:
            text = self.backend.ocr_page(page_pdf, self.language)
        return text

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[list] = []
        for i in range(batch.num_rows):
            need = batch.column("needs_ocr_pages")[i].as_py() or []
            payload = batch.column("html")[i].as_py()
            results = []
            if need and payload:
                try:
                    from ..extract import sniff_kind
                    if sniff_kind(payload) == "image":
                        chunks = {1: payload}   # the image IS page 1
                    else:
                        chunks = dict(
                            split_pdf_to_page_pdfs(payload, self.cfg))
                    for page_no in need:
                        if page_no not in chunks:
                            continue
                        img = None
                        if self.deskew:
                            try:
                                orient, a, img = self._page_angle(
                                    chunks[page_no])
                            except Exception:   # noqa: BLE001
                                orient, a, img = 0, 0.0, None
                            a = a if abs(a) >= self.min_deskew_angle else 0.0
                            if img is not None:
                                text = self._ocr_deskewed(
                                    chunks[page_no], img, a)
                            else:
                                text = self.backend.ocr_page(
                                    chunks[page_no], self.language)
                            rec = {"page": page_no, "text": text,
                                   "angle": a, "orientation": orient}
                        else:
                            rec = {"page": page_no,
                                   "text": self.backend.ocr_page(
                                       chunks[page_no], self.language)}
                        if self.detect_tables:
                            rec["tables"] = self._page_tables(
                                chunks[page_no], img)
                        results.append(rec)
                except Exception:   # noqa: BLE001 — OCR failure ≠ row failure
                    results = []
            out.append(results)
        fields = [("page", pa.int32()), ("text", pa.string())]
        if self.deskew:
            fields.append(("angle", pa.float64()))
            fields.append(("orientation", pa.int32()))
        if self.detect_tables:
            fields.append(("tables", pa.list_(pa.struct(
                [("x", pa.float64()), ("y", pa.float64()),
                 ("w", pa.float64()), ("h", pa.float64())]))))
        typ = pa.list_(pa.struct(fields))
        return batch.append_column("ocr_pages", pa.array(out, typ))

    def _page_tables(self, page_pdf: bytes, img) -> List[dict]:
        """Raster table regions for one OCR page — reuses the deskewed
        raster when the deskew arm already built one, else rasterizes
        (image payloads decode their real pixels)."""
        from ..functions.raster_tables import detect_raster_tables
        try:
            if img is None:
                from ..extract import sniff_kind
                from ..functions.pdf_ops import rasterize_page
                from ..functions.raster import decode_l_image
                if sniff_kind(page_pdf) == "image":
                    img = decode_l_image(page_pdf)
                else:
                    img = decode_l_image(rasterize_page(
                        page_pdf, 1, dpi=72, cfg=self.cfg))
            return detect_raster_tables(img)
        except Exception:   # noqa: BLE001 — detection failure ≠ row failure
            return []


def attach_searchable_pdf(batch: pa.Table,
                          cfg: Optional[PipelineConfig] = None) -> pa.Table:
    """Emit the searchable-PDF artifact column (M18): for rows with OCR
    results, merge the per-page texts into the original payload as an
    invisible text layer (``pdf_ops.merge_text_layer_pdf``); other rows
    get null. Use after :class:`OcrPages` when the actual PDF artifact
    is wanted (the reference's ``.ocred.pdf``, ``tasks.py:415-428``) —
    the column path keeps text byte-identity untouched.

    Raw-image rows first get a one-page PDF wrapper sized to the image
    with an image XObject marker (the reference's ``MakePDFFromImages``
    step), then the invisible text layer merges into that wrapper."""
    from ..extract import image_dims, sniff_kind
    from ..functions.pdf_build import build_pdf
    from ..functions.pdf_ops import merge_text_layer_pdf
    cfg = cfg or DEFAULT_CONFIG
    out = []
    for i in range(batch.num_rows):
        ocr = batch.column("ocr_pages")[i].as_py() or []
        payload = batch.column("html")[i].as_py()
        if not ocr or not payload:
            out.append(None)
            continue
        try:
            if sniff_kind(payload) == "image":
                w, h = image_dims(payload)
                payload = build_pdf(
                    [[]], media_box=(float(w), float(h)),
                    image_pages=[1],
                    raw_contents=[
                        f"q {w} 0 0 {h} 0 0 cm /Im1 Do Q".encode()])
            out.append(merge_text_layer_pdf(
                payload, {r["page"]: r["text"] for r in ocr}, cfg,
                page_angles={r["page"]: r["angle"] for r in ocr
                             if r.get("angle")}))
        except Exception:   # noqa: BLE001 — artifact failure ≠ row failure
            out.append(None)
    return batch.append_column("searchable_pdf",
                               pa.array(out, pa.binary()))

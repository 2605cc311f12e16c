"""Deterministic in-process PDF builder (test fixtures / synthetic corpora).

No PDF libraries exist in this environment, so the engine ships a tiny
writer producing well-formed single-font PDFs with uncompressed or Flate
content streams. The extractor (:mod:`pdf_extract`) is golden-tested
against these — mirroring how the reference pins its extraction semantics
to its own fixture corpus (``pdf/tests/data/``, SURVEY.md §5.1).

Layout model (frozen, shared with the extractor's width assumptions):
glyph advance = ``0.5 * font_size`` (Courier-like monospace metric),
line leading = ``1.2 * font_size``.
"""
from __future__ import annotations

import zlib
from typing import List, Optional, Sequence, Tuple

GLYPH_W = 0.5        # × font size
LEADING = 1.2        # × font size


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def page_content_stream(
    lines: Sequence[str],
    font_size: float = 12.0,
    x0: float = 72.0,
    y0: float = 720.0,
) -> bytes:
    """One BT..ET text object; each line positioned with Td/T*."""
    parts = [f"BT /F1 {font_size:g} Tf {font_size * LEADING:g} TL {x0:g} {y0:g} Td"]
    for i, line in enumerate(lines):
        if i > 0:
            parts.append("T*")
        parts.append(f"({_esc(line)}) Tj")
    parts.append("ET")
    return " ".join(parts).encode("latin-1", errors="replace")


def build_pdf(
    pages: Sequence[Sequence[str]],
    font_size: float = 12.0,
    compress: bool = False,
    media_box: Tuple[float, float] = (612.0, 792.0),
    rotations: Optional[Sequence[int]] = None,
    image_pages: Optional[Sequence[int]] = None,
    raw_contents: Optional[Sequence[Optional[bytes]]] = None,
    outlines: Optional[Sequence[dict]] = None,
    image_names: Optional[dict] = None,
) -> bytes:
    """Build a PDF. ``pages`` = list of pages, each a list of text lines.

    ``media_box``: one (w, h) for every page, or a sequence of per-page
    (w, h) tuples (mixed-size documents keep their geometry on rebuild).
    ``image_pages``: 1-based page numbers that get a dummy image XObject
    (drives the needs-OCR classifier analog, ref ``pdf/pdf.py:31-33``).
    ``image_names``: optional {1-based page -> [XObject names]} so a
    rebuild preserves the original pages' image resource names (content
    streams referencing ``/ImG0 Do`` etc. keep resolving — needs-OCR
    classification survives a merge round-trip); default ``["Im1"]``.
    ``raw_contents``: optional per-page raw content stream override.
    ``outlines``: bookmark entries ``{title, page (1-based), level
    (1-based), x, y}`` — a flat list; nesting is reconstructed from
    ``level`` (drives the TOC path, ref ``GetTOCFromPDF.java:37-95``).
    """
    n = len(pages)
    rotations = list(rotations or [0] * n)
    image_set = set(image_pages or [])
    raw_contents = list(raw_contents or [None] * n)
    image_names = image_names or {}
    if media_box and isinstance(media_box[0], (tuple, list)):
        media_list = [tuple(m) for m in media_box]
    else:
        media_list = [tuple(media_box)] * n

    objs: List[bytes] = []   # 1-indexed bodies, object i = objs[i-1]

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    # 1: catalog (pages ref patched later) / 2: pages node / 3: font
    add(b"")  # placeholder catalog
    add(b"")  # placeholder pages
    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    img_num = 0
    if image_set:
        img_data = b"\x00" * 16
        img_num = add(
            b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
            + str(len(img_data)).encode() + b" >>\nstream\n" + img_data
            + b"\nendstream"
        )

    page_nums: List[int] = []
    for i, lines in enumerate(pages):
        content = raw_contents[i]
        if content is None:
            content = page_content_stream(lines, font_size=font_size)
            if (i + 1) in image_set:
                content += b" q 100 0 0 100 400 600 cm /Im1 Do Q"
        filt = b""
        data = content
        if compress:
            data = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        c_num = add(
            b"<< " + filt + b"/Length " + str(len(data)).encode()
            + b" >>\nstream\n" + data + b"\nendstream"
        )
        res = b"<< /Font << /F1 " + str(font_num).encode() + b" 0 R >>"
        if (i + 1) in image_set:
            names = image_names.get(i + 1) or ["Im1"]
            res += b" /XObject << " + b" ".join(
                b"/" + nm.encode("latin-1") + b" "
                + str(img_num).encode() + b" 0 R" for nm in names) + b" >>"
        res += b" >>"
        mb = media_list[i]
        p = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 "
            + f"{mb[0]:g} {mb[1]:g}".encode()
            + b"] /Rotate " + str(rotations[i]).encode()
            + b" /Resources " + res
            + b" /Contents " + str(c_num).encode() + b" 0 R >>"
        )
        page_nums.append(add(p))

    kids = b"[" + b" ".join(str(p).encode() + b" 0 R" for p in page_nums) + b"]"
    objs[1] = (b"<< /Type /Pages /Kids " + kids + b" /Count "
               + str(len(page_nums)).encode() + b" >>")

    outline_root = 0
    if outlines:
        # reserve object numbers: root + one per item
        outline_root = add(b"")
        item_nums = [add(b"") for _ in outlines]
        # reconstruct nesting from levels
        parents = [0] * len(outlines)      # index into item list, -1 = root
        stack: List[int] = []              # indices of open ancestors
        for i, o in enumerate(outlines):
            lvl = int(o.get("level", 1))
            while stack and int(outlines[stack[-1]].get("level", 1)) >= lvl:
                stack.pop()
            parents[i] = stack[-1] if stack else -1
            stack.append(i)
        children = {p: [i for i in range(len(outlines)) if parents[i] == p]
                    for p in range(-1, len(outlines))}

        def item_body(i: int) -> bytes:
            o = outlines[i]
            page_ref = page_nums[int(o["page"]) - 1]
            parent_ref = outline_root if parents[i] == -1 else item_nums[parents[i]]
            sibs = children[parents[i]]
            k = sibs.index(i)
            body = (b"<< /Title (" + _esc(str(o["title"])).encode("latin-1", "replace")
                    + b") /Parent " + str(parent_ref).encode() + b" 0 R")
            if k > 0:
                body += b" /Prev " + str(item_nums[sibs[k - 1]]).encode() + b" 0 R"
            if k + 1 < len(sibs):
                body += b" /Next " + str(item_nums[sibs[k + 1]]).encode() + b" 0 R"
            kids_i = children.get(i, [])
            if kids_i:
                body += (b" /First " + str(item_nums[kids_i[0]]).encode() + b" 0 R"
                         b" /Last " + str(item_nums[kids_i[-1]]).encode() + b" 0 R"
                         b" /Count " + str(len(kids_i)).encode())
            body += (b" /Dest [" + str(page_ref).encode() + b" 0 R /XYZ "
                     + f"{float(o.get('x', 0)):g} {float(o.get('y', 0)):g}".encode()
                     + b" null] >>")
            return body

        for i, num in enumerate(item_nums):
            objs[num - 1] = item_body(i)
        top = children[-1]
        objs[outline_root - 1] = (
            b"<< /Type /Outlines /First " + str(item_nums[top[0]]).encode()
            + b" 0 R /Last " + str(item_nums[top[-1]]).encode() + b" 0 R /Count "
            + str(len(top)).encode() + b" >>")

    cat = b"<< /Type /Catalog /Pages 2 0 R"
    if outline_root:
        cat += b" /Outlines " + str(outline_root).encode() + b" 0 R"
    objs[0] = cat + b" >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(out)
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += f"{offsets[i]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_off).encode()
            + b"\n%%EOF\n")
    return bytes(out)

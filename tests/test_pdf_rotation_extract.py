"""Per-angle rotated-text extraction (VERDICT r01 item 6): a fixture
PDF with a ``Tm``-rotated text object must extract its text (PDFBox
needs per-angle re-extraction passes for this —
``PDFToTextWithCoordinates.java:463-533``; the engine's matrix-aware
pass gets it in one), carry per-char angles, cluster to the page deskew
angle, and restore boxes through the inverse transform."""
import math

from text_extraction_system_ray.config import PipelineConfig
from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.functions.pdf_extract import (
    extract_pdf, page_deskew_angle, rotated_regions)
from tests.test_pdf_fonts import (DESCRIPTOR, CMAP, WIDTHS_FONT,
                                  simple_font_pdf, stream_obj)

CFG = PipelineConfig()


def _rot_content(deg: float, x: float, y: float, s: bytes) -> bytes:
    c = math.cos(math.radians(deg))
    sn = math.sin(math.radians(deg))
    return (f"BT /F5 10 Tf {c:.6f} {sn:.6f} {-sn:.6f} {c:.6f} "
            f"{x:g} {y:g} Tm ".encode() + b"(" + s + b") Tj ET")


def test_rotated_text_object_extracts_golden():
    pdf = simple_font_pdf(_rot_content(30.0, 100, 200, b"ABC"),
                          WIDTHS_FONT,
                          {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
    pages = extract_pdf(pdf, CFG)
    chars = [c for b in pages[0].blocks for ln in b.lines for c in ln]
    # hand-written golden: same CMap as the unrotated fixture
    assert "".join(c.ch for c in chars) == "ffix"
    assert all(abs(c.angle - 30.0) < 0.01 for c in chars)
    # first glyph: cell 5×10 at (100,200) rotated 30° → axis-aligned
    # bbox extents (5cos+10sin, 5sin+10cos) = (9.33, 11.16), min corner
    # shifted left by 10·sin30 = 5
    x, y, w, h = chars[0].bbox
    assert (x, y) == (95.0, 200.0)
    assert (w, h) == (9.33, 11.16)


def test_deskew_angle_clusters_rotated_page():
    body = (_rot_content(30.0, 100, 200, b"ABCABCABC") + b"\n"
            + _rot_content(30.0, 120, 300, b"ABCABC"))
    pdf = simple_font_pdf(body, WIDTHS_FONT,
                          {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
    page = extract_pdf(pdf, CFG)[0]
    angle, ok = page_deskew_angle(page)
    assert abs(angle - 30.0) < 0.05
    assert ok


def test_mixed_angles_cluster_to_dominant():
    body = (b"BT /F5 10 Tf 50 700 Td (A) Tj ET\n"
            + _rot_content(90.0, 300, 100, b"ABCABCABCABC"))
    pdf = simple_font_pdf(body, WIDTHS_FONT,
                          {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
    page = extract_pdf(pdf, CFG)[0]
    angle, ok = page_deskew_angle(page)
    assert abs(angle - 90.0) < 1.0   # 12 rotated chars outvote 1 upright


def test_inverse_restore_matches_unrotated_layout():
    """The de-rotated boxes of a 30°-rotated run equal the boxes its
    unrotated twin extracts at the de-rotated origin (rule: restore
    through the inverse transform)."""
    rot = simple_font_pdf(_rot_content(30.0, 100, 200, b"ABC"),
                          WIDTHS_FONT,
                          {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
    page = extract_pdf(rot, CFG)[0]
    regions = rotated_regions(page)
    assert len(regions) == 1 and regions[0]["angle"] == 30.0
    assert regions[0]["text"] == "ffix"
    boxes = regions[0]["boxes"]
    # de-rotated origin of (100,200) at -30°: (100cos+200sin, -100sin+200cos)
    ox = 100 * math.cos(math.radians(30)) + 200 * math.sin(math.radians(30))
    oy = -100 * math.sin(math.radians(30)) + 200 * math.cos(math.radians(30))
    # unrotated twin layout: widths 5, 6, 7 at fs 10, advancing in x
    expect_x = [ox, ox + 5.0, ox + 5.0, ox + 11.0]
    expect_w = [5.0, 6.0, 6.0, 7.0]
    for (bx, by, bw, bh), ex, ew in zip(boxes, expect_x, expect_w):
        assert abs(bx - ex) < 0.05, (bx, ex)
        assert abs(by - oy) < 0.05
        assert abs(bw - ew) < 0.05
        assert abs(bh - 10.0) < 0.05


def test_rotated_through_extract_row():
    pdf = simple_font_pdf(_rot_content(45.0, 306, 396, b"ABC"),
                          WIDTHS_FONT,
                          {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
    row = extract_row("u", pdf, "", CFG)
    assert row["status"] == "ok"
    assert row["text"].startswith("ffix")
    assert len(row["char_spans"]) == len(row["text"])

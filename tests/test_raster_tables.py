"""Raster-side table detection (scanned/needs-OCR pages) — numpy port
of the reference's cv2 morphological cell-cluster detector
(ocr/tables/table_detection.py:311-445)."""
import numpy as np
import pyarrow as pa
import pytest

from text_extraction_system_ray.functions import raster_tables as RT


def _textblob(img, y, x, h, w):
    """Glyph-like texture: thin vertical strokes (solid bars would be
    eaten by the thin-horizontal-rule filter, like real scan lines)."""
    for cx in range(x, x + w, 5):
        img[y:y + h, cx:cx + 2] = 0


def _table_page(with_rule=False):
    img = np.full((1000, 800), 255, np.uint8)
    for r in range(5):
        for c in range(3):
            _textblob(img, 150 + r * 30, 100 + c * 170, 16, 100)
    for i in range(8):
        _textblob(img, 600 + i * 24, 80, 14, 640)
    if with_rule:
        img[145:147, 90:700] = 0       # horizontal rule above the table
    return img


def test_dilate_matches_bruteforce():
    rng = np.random.RandomState(0)
    m = rng.rand(40, 50) < 0.1

    def brute(mm, kh, kw):
        H, W = mm.shape
        out = np.zeros_like(mm)
        lh, lw = (kh - 1) // 2, (kw - 1) // 2
        for r in range(H):
            for c in range(W):
                out[r, c] = mm[max(0, r - lh):min(H, r - lh + kh),
                               max(0, c - lw):min(W, c - lw + kw)].any()
        return out

    for kernel, iters in [((2, 5), 1), ((3, 9), 2), ((1, 25), 1)]:
        kh = (kernel[0] - 1) * iters + 1
        kw = (kernel[1] - 1) * iters + 1
        assert (RT._dilate(m, kernel, iters) == brute(m, kh, kw)).all()


def test_components_runs_and_merge():
    img = np.zeros((30, 40), bool)
    img[2:5, 3:10] = True
    img[10:14, 20:25] = True
    img[12, 25:30] = True              # bridges into the second blob
    comps = sorted(RT._components(img))
    assert comps == [(3, 2, 7, 3, 21), (20, 10, 10, 4, 25)]


def test_detects_planted_table_and_rejects_prose():
    tables = RT.detect_raster_tables(_table_page())
    assert len(tables) == 1
    t = tables[0]
    # region covers the planted grid rows (y 150..290), not the prose
    assert t["y"] < 150 and t["y"] + t["h"] > 285
    assert t["y"] + t["h"] < 550
    # prose-only page: silent
    img = np.full((1000, 800), 255, np.uint8)
    for i in range(12):
        _textblob(img, 150 + i * 26, 80, 14, 640)
    assert RT.detect_raster_tables(img) == []
    # blank page: silent
    assert RT.detect_raster_tables(
        np.full((960, 720), 255, np.uint8)) == []


def test_thin_rule_does_not_fuse_rows():
    assert len(RT.detect_raster_tables(_table_page(with_rule=True))) == 1


def test_scaling_large_page_coords_map_back():
    # 2000-px page scales down for detection; coords come back in
    # original pixels
    img = np.full((2000, 1600), 255, np.uint8)
    for r in range(5):
        for c in range(3):
            _textblob(img, 300 + r * 48, 200 + c * 340, 32, 200)
    for i in range(8):
        _textblob(img, 1200 + i * 44, 160, 28, 1280)
    tables = RT.detect_raster_tables(img)
    assert len(tables) == 1
    t = tables[0]
    assert t["y"] < 300 and t["y"] + t["h"] > 500


def test_ocr_stage_emits_table_regions(ray_session):
    """A planted scanned-table image row flows through OcrPages with
    detect_tables=True and comes out with the region attached."""
    from text_extraction_system_ray.functions.raster import encode_l_image
    from text_extraction_system_ray.stages.ocr_stage import (
        FakeOcrBackend, OcrPages)
    payload = encode_l_image(_table_page())
    batch = pa.table({
        "url": ["https://example.org/scan/00000001"],
        "html": [payload],
        "needs_ocr_pages": [[1]],
    })
    out = OcrPages(FakeOcrBackend(), detect_tables=True)(batch)
    recs = out.column("ocr_pages")[0].as_py()
    assert len(recs) == 1 and recs[0]["page"] == 1
    assert len(recs[0]["tables"]) == 1
    assert recs[0]["tables"][0]["h"] > 100
    # deskew arm keeps working with the extra field
    out2 = OcrPages(FakeOcrBackend(), deskew=True,
                    detect_tables=True)(batch)
    recs2 = out2.column("ocr_pages")[0].as_py()
    assert recs2[0]["tables"], recs2

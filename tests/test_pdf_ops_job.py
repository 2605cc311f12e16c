"""Tests: pdf_ops (image counts, text-layer removal, rotate, debug
render), the OCR stage plumbing, the job CLI, and status queries."""
import json
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.config import DEFAULT_CONFIG as CFG
from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.functions.pdf_build import build_pdf
from text_extraction_system_ray.functions.pdf_ops import (
    get_page_images_amount, page_image_counts, remove_text_layer,
    render_debug_pdf, rotate_pdf_pages, rasterize_page)
from text_extraction_system_ray.stages.ocr_stage import (
    FakeOcrBackend, OcrPages, TesseractBackend)


def test_page_image_counts():
    pdf = build_pdf([["text"], [], ["more"]], image_pages=[2])
    counts = page_image_counts(pdf)
    assert counts == {1: 0, 2: 1, 3: 0}
    assert get_page_images_amount(pdf) == 1


def test_remove_text_layer_roundtrip():
    pdf = build_pdf([["Some visible text.", "Another line."]], image_pages=[1])
    stripped = remove_text_layer(pdf)
    r = extract_row("u", stripped)
    assert r["status"] == "ok"
    assert "visible" not in r["text"]
    # page survives; image survives → page is now needs-OCR
    assert len(r["pages"]) == 1
    assert r["needs_ocr_pages"] == [1]


def test_rotate_pdf_pages():
    pdf = build_pdf([["a"], ["b"]])
    rotated = rotate_pdf_pages(pdf, 90)
    r = extract_row("u", rotated)
    assert [p["rotation"] for p in r["pages"]] == [90, 90]
    assert "a" in r["text"] and "b" in r["text"]


def test_render_debug_pdf_parses_back():
    r = extract_row("u", build_pdf([["Hi there"]]))
    dbg = render_debug_pdf(r["char_spans"], r["pages"])
    # valid PDF with one page and rect operators, no text
    r2 = extract_row("u", dbg)
    assert r2["status"] == "ok"
    assert len(r2["pages"]) == 1
    assert r2["text"].strip("\n\x0c") == ""
    assert b" re S" in dbg


def test_rasterize_real_and_tesseract_stubbed():
    # rasterization is real now (r2: engine renders its own layout IR);
    # a malformed PDF raises the extractor's error, not NotImplementedError
    from text_extraction_system_ray.functions.html_extract import ExtractError
    with pytest.raises(ExtractError):
        rasterize_page(b"%PDF-", 1)
    with pytest.raises(NotImplementedError):
        TesseractBackend()


def test_ocr_stage_plumbing():
    pdf = build_pdf([["Readable text on page one."], []], image_pages=[2])
    r = extract_row("u", pdf)
    assert r["needs_ocr_pages"] == [2]
    batch = pa.table({
        "url": pa.array(["u"], pa.string()),
        "html": pa.array([pdf], pa.binary()),
        "needs_ocr_pages": pa.array([r["needs_ocr_pages"]],
                                    pa.list_(pa.int32())),
    })
    out = OcrPages(FakeOcrBackend())(batch)
    ocr = out.column("ocr_pages")[0].as_py()
    assert len(ocr) == 1 and ocr[0]["page"] == 2
    assert ocr[0]["text"].startswith("[ocr:osd:")
    # determinism
    out2 = OcrPages(FakeOcrBackend())(batch)
    assert out2.column("ocr_pages")[0].as_py() == ocr


def test_job_cli(ray_session, tiny_corpus, tmp_path):
    n = tiny_corpus.num_rows
    half = n // 2
    for i in range(2):
        t = tiny_corpus.slice(i * half, half if i == 0 else n - half)
        pq.write_table(t, str(tmp_path / f"in-{i}.parquet"))
    out_dir = str(tmp_path / "out")
    from text_extraction_system_ray.job import main
    rc = main(["--input", str(tmp_path), "--output", out_dir,
               "--files-per-partition", "1"])
    assert rc == 0
    from text_extraction_system_ray.state.checkpoint import (
        committed_partitions, query_status, read_output)
    assert len(committed_partitions(out_dir)) == 2
    assert read_output(out_dir).count() == n
    st = query_status(out_dir, sort_column="row_count", descending=True,
                      records_on_page=1)
    assert len(st) == 1
    assert st.iloc[0]["row_count"] >= half
    # rerun with the same plan → no-op
    rc2 = main(["--input", str(tmp_path), "--output", out_dir,
                "--files-per-partition", "1"])
    assert rc2 == 0
    # bad input glob
    assert main(["--input", str(tmp_path / "nope*.parquet"),
                 "--output", out_dir]) == 2


# ------------------------------------------------- searchable-PDF merge
def test_merge_text_layer_roundtrip():
    """M18 artifact: invisible OCR text layer merged into the original
    PDF; re-extraction sees the OCR text on OCRed pages and the original
    text elsewhere (ref MergeInPageLayers + re-extract,
    tasks.py:398-455)."""
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.extract import extract_row
    from text_extraction_system_ray.functions.pdf_build import build_pdf
    from text_extraction_system_ray.functions.pdf_extract import (
        extract_pdf, extract_pdf_toc, page_needs_ocr)
    from text_extraction_system_ray.functions.pdf_ops import merge_text_layer_pdf

    cfg = PipelineConfig()
    original = build_pdf(
        [["Text page one."], []], image_pages=[2],
        outlines=[{"title": "Chapter 1", "page": 1, "level": 1,
                   "x": 56.0, "y": 720.0}])
    pages = extract_pdf(original, cfg)
    assert [page_needs_ocr(p) for p in pages] == [False, True]

    merged = merge_text_layer_pdf(original, {2: "recovered scanned text"},
                                  cfg)
    row = extract_row("u", merged, "", cfg)
    assert row["status"] == "ok"
    assert "Text page one." in row["text"]
    assert "recovered scanned text" in row["text"]
    # the OCRed page no longer classifies as needing OCR (text layer
    # covers it? invisible text still counts as text cover)
    merged_pages = extract_pdf(merged, cfg)
    assert len(merged_pages) == 2
    assert merged_pages[1].n_text_chars > 0
    # outline survives the merge
    toc = extract_pdf_toc(merged, cfg)
    assert [e["title"] for e in toc] == ["Chapter 1"]
    # escaping: parens and backslash in OCR text survive
    tricky = merge_text_layer_pdf(original, {2: r"a(b)c\d"}, cfg)
    assert r"a(b)c\d" in extract_row("u", tricky, "", cfg)["text"]


def test_merge_text_layer_rotated_page():
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.extract import extract_row
    from text_extraction_system_ray.functions.pdf_build import build_pdf
    from text_extraction_system_ray.functions.pdf_ops import merge_text_layer_pdf

    cfg = PipelineConfig()
    original = build_pdf([[]], image_pages=[1])
    merged = merge_text_layer_pdf(original, {1: "sideways scan"}, cfg,
                                  page_angles={1: 90.0})
    row = extract_row("u", merged, "", cfg)
    assert "sideways scan" in row["text"]


def test_attach_searchable_pdf_column():
    import pyarrow as pa
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.extract import extract_row
    from text_extraction_system_ray.functions.pdf_build import build_pdf
    from text_extraction_system_ray.stages.ocr_stage import (
        FakeOcrBackend, OcrPages, attach_searchable_pdf)

    cfg = PipelineConfig()
    pdf = build_pdf([["Visible text."], []], image_pages=[2])
    row = extract_row("u", pdf, "", cfg)
    batch = pa.table({
        "url": pa.array(["u"]),
        "html": pa.array([pdf], pa.binary()),
        "needs_ocr_pages": pa.array([row["needs_ocr_pages"]],
                                    pa.list_(pa.int32())),
    })
    with_ocr = OcrPages(FakeOcrBackend(), cfg)(batch)
    out = attach_searchable_pdf(with_ocr, cfg)
    blob = out.column("searchable_pdf")[0].as_py()
    assert blob is not None and blob[:5] == b"%PDF-"
    merged_row = extract_row("u", blob, "", cfg)
    assert "Visible text." in merged_row["text"]
    assert "[ocr:" in merged_row["text"]     # fake backend layer present


def test_ocr_arm_deskew_detects_page_angle():
    """The full OCR-arm loop with real raster kernels: a skewed
    needs-OCR page gets its angle detected (rasterize → projection
    profile) and carried into the ocr_pages struct (ref
    process_pdf_page detect→rotate, data_extract.py:305-362)."""
    import pyarrow as pa
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.stages.ocr_stage import (
        FakeOcrBackend, OcrPages)
    from tests.test_pdf_fonts import (CMAP, DESCRIPTOR, WIDTHS_FONT,
                                      simple_font_pdf, stream_obj)
    from tests.test_pdf_rotation_extract import _rot_content

    cfg = PipelineConfig()
    # single-page PDF whose text is rotated 8 deg; force it through the
    # OCR arm by marking it needs-OCR
    body = b"\n".join(
        _rot_content(8.0, 80, 650 - 40 * i, b"ABCABCABCABCABCABCABC")
        for i in range(6))
    pdf = simple_font_pdf(body, WIDTHS_FONT,
                          {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
    batch = pa.table({
        "url": pa.array(["u"]),
        "html": pa.array([pdf], pa.binary()),
        "needs_ocr_pages": pa.array([[1]], pa.list_(pa.int32())),
    })
    out = OcrPages(FakeOcrBackend(), cfg, deskew=True)(batch)
    rows = out.column("ocr_pages")[0].as_py()
    assert len(rows) == 1
    assert abs(rows[0]["angle"] - 8.0) <= 0.6
    assert rows[0]["text"].startswith("[ocr-raster:")


def test_merge_preserves_mixed_media_and_image_names():
    """ADVICE r2 (low): a mixed-page-size original keeps per-page
    geometry through the merge rebuild, and image XObjects under
    non-/Im1 names keep resolving (has_image / needs-OCR survives)."""
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.functions.pdf_build import build_pdf
    from text_extraction_system_ray.functions.pdf_extract import (
        extract_pdf, page_needs_ocr)
    from text_extraction_system_ray.functions.pdf_ops import (
        get_page_images_amount, merge_text_layer_pdf, remove_text_layer)

    cfg = PipelineConfig()
    # page 1: 612x792 text; page 2: 300x400 image page whose XObject is
    # named /ImG7 and drawn by the raw content stream
    raw2 = b"q 200 0 0 200 40 100 cm /ImG7 Do Q"
    original = build_pdf(
        [["Letter sized text."], []],
        media_box=[(612.0, 792.0), (300.0, 400.0)],
        image_pages=[2], image_names={2: ["ImG7"]},
        raw_contents=[None, raw2])
    pages = extract_pdf(original, cfg)
    assert (pages[0].width, pages[0].height) == (612.0, 792.0)
    assert (pages[1].width, pages[1].height) == (300.0, 400.0)
    assert [page_needs_ocr(p) for p in pages] == [False, True]
    assert get_page_images_amount(original, cfg) == 1

    merged = merge_text_layer_pdf(original, {2: "ocr text"}, cfg)
    mp = extract_pdf(merged, cfg)
    assert (mp[0].width, mp[0].height) == (612.0, 792.0)
    assert (mp[1].width, mp[1].height) == (300.0, 400.0)
    assert get_page_images_amount(merged, cfg) == 1

    # remove_text_layer keeps geometry + image resources too
    stripped = remove_text_layer(original, cfg)
    sp = extract_pdf(stripped, cfg)
    assert (sp[1].width, sp[1].height) == (300.0, 400.0)
    assert get_page_images_amount(stripped, cfg) == 1
    assert page_needs_ocr(sp[1])


def test_remove_ocr_layer_preserves_original_text():
    """VERDICT r2 item 6 round-trip: extract → attach OCR layer →
    remove ONLY the marked /OliveGeneratedContent layer → extraction is
    identical to the original (born-digital text preserved on mixed
    pages); full remove_text_layer still strips everything."""
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.extract import extract_row
    from text_extraction_system_ray.functions.pdf_build import build_pdf
    from text_extraction_system_ray.functions.pdf_ops import (
        merge_text_layer_pdf, remove_ocr_layer, remove_text_layer)

    cfg = PipelineConfig()
    original = build_pdf([["Original digital text."], []], image_pages=[2])
    base = extract_row("u", original, "", cfg)
    merged = merge_text_layer_pdf(original, {2: "layer only text"}, cfg)
    merged_row = extract_row("u", merged, "", cfg)
    assert "Original digital text." in merged_row["text"]
    assert "layer only text" in merged_row["text"]

    # selective removal: layer gone, original text byte-identical
    cleaned = remove_ocr_layer(merged, cfg)
    clean_row = extract_row("u", cleaned, "", cfg)
    assert clean_row["text"] == base["text"]
    assert list(map(tuple, clean_row["char_spans"])) == \
        list(map(tuple, base["char_spans"]))

    # mixed page: layer and original text on the SAME page
    mixed = merge_text_layer_pdf(original, {1: "ocr on text page"}, cfg)
    mixed_clean = extract_row("u", remove_ocr_layer(mixed, cfg), "", cfg)
    assert mixed_clean["text"] == base["text"]

    # full removal still strips born-digital text too
    allgone = extract_row("u", remove_text_layer(merged, cfg), "", cfg)
    assert "Original digital text." not in allgone["text"]
    assert "layer only text" not in allgone["text"]


def test_ocr_arm_orientation_correction():
    """M16→M9 integration: a page whose text runs at 90° is detected by
    the OSD-analog probe, the raster is counter-rotated before the
    backend sees it, and the applied orientation is recorded; an upright
    page records orientation 0 (symmetric glyphs never trip the 180°
    gate)."""
    import pyarrow as pa
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.stages.ocr_stage import (
        FakeOcrBackend, OcrPages)
    from tests.test_pdf_fonts import (CMAP, DESCRIPTOR, WIDTHS_FONT,
                                      simple_font_pdf, stream_obj)
    from tests.test_pdf_rotation_extract import _rot_content

    cfg = PipelineConfig()

    def run(angle):
        body = b"\n".join(
            _rot_content(angle, 80, 650 - 30 * i,
                         b"ABCABCABCABCABCABCABCABCABC")
            for i in range(12))
        pdf = simple_font_pdf(body, WIDTHS_FONT,
                              {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
        batch = pa.table({
            "url": pa.array(["u"]),
            "html": pa.array([pdf], pa.binary()),
            "needs_ocr_pages": pa.array([[1]], pa.list_(pa.int32())),
        })
        out = OcrPages(FakeOcrBackend(), cfg, deskew=True)(batch)
        return out.column("ocr_pages")[0].as_py()

    upright = run(0.0)
    assert upright[0]["orientation"] == 0
    rotated = run(90.0)
    assert rotated[0]["orientation"] == 90
    assert rotated[0]["text"].startswith("[ocr-raster:")
    # after orientation correction the residual skew is near zero
    assert abs(rotated[0]["angle"]) <= 0.6


def test_image_payload_intake_end_to_end():
    """M1 image branch (ref MakePDFFromImages / convert_to_pdf.py:84-92):
    a raw PNG/JPEG/GIF payload sniffs as 'image', extracts as one
    textless needs-OCR page with the real dimensions, the OCR arm
    deskews the REAL decoded bitmap, and the searchable-PDF artifact is
    a one-page wrapper whose re-extraction yields the OCR text."""
    import numpy as np
    import pyarrow as pa
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.extract import extract_row, sniff_kind
    from text_extraction_system_ray.functions.gif import decode_gif
    from text_extraction_system_ray.functions.jpeg import encode_jpeg
    from text_extraction_system_ray.functions.png import encode_png
    from text_extraction_system_ray.functions.raster import (
        rotate_image_array)
    from text_extraction_system_ray.stages.ocr_stage import (
        FakeOcrBackend, OcrPages, attach_searchable_pdf)

    cfg = PipelineConfig()
    # skewed "scanned page" as a real PNG
    base = np.full((300, 200), 255, np.uint8)
    for y0 in range(30, 270, 24):
        base[y0:y0 + 9, 20:180] = 0
    png = encode_png(rotate_image_array(base, 7.0))
    jpg = encode_jpeg(base)

    for payload, w in ((png, None), (jpg, 200)):
        assert sniff_kind(payload) == "image"
        row = extract_row("u", payload, "", cfg)
        assert row["status"] == "ok" and row["kind"] == "image"
        assert row["needs_ocr_pages"] == [1]
        assert row["text"] == "\f"
        if w:
            assert row["pages"][0]["bbox"][2] == float(w)

    batch = pa.table({
        "url": pa.array(["u"]),
        "html": pa.array([png], pa.binary()),
        "needs_ocr_pages": pa.array([[1]], pa.list_(pa.int32())),
    })
    out = OcrPages(FakeOcrBackend(), cfg, deskew=True)(batch)
    rec = out.column("ocr_pages")[0].as_py()[0]
    assert rec["text"].startswith("[ocr-raster:")
    assert abs(rec["angle"] - 7.0) <= 0.6        # real-pixel deskew

    # searchable artifact: one-page wrapper, OCR text extractable
    art = attach_searchable_pdf(out, cfg)
    pdf = art.column("searchable_pdf")[0].as_py()
    assert pdf is not None
    re_row = extract_row("u", pdf, "", cfg)
    assert rec["text"] in re_row["text"]
    assert re_row["pages"][0]["bbox"][2:] == [200.0, 300.0]

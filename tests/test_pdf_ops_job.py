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


def test_rasterize_stubbed():
    with pytest.raises(NotImplementedError):
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

"""Skew-path equivalence at the unit level: the in-actor giant-PDF split
and the distributed exploded path both reproduce the whole-document
oracle exactly (offset arithmetic, pages, TOC page shifts)."""
import numpy as np
import pyarrow as pa

import ray.data

from text_extraction_system_ray.config import PipelineConfig
from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.functions.merge import merge_extracted_rows
from text_extraction_system_ray.functions.pdf_build import build_pdf
from text_extraction_system_ray.functions.pdf_extract import split_pdf_to_page_pdfs
from text_extraction_system_ray.pipelines.extraction import extract_dataset
from text_extraction_system_ray.stages.extract_stage import ExtractText


def _multi_page_pdf(n_pages=6, with_outlines=True):
    outlines = ([{"title": f"Part {p}", "page": p + 1, "level": 1,
                  "x": 72, "y": 720} for p in range(n_pages)]
                if with_outlines else None)
    return build_pdf(
        [[f"Page {p} line {j} with several words here." for j in range(8)]
         for p in range(n_pages)],
        image_pages=[3], outlines=outlines)


def _assert_rows_equal(a, b):
    assert a["text"] == b["text"]
    assert np.array_equal(a["char_spans"], b["char_spans"])
    assert a["pages"] == b["pages"]
    assert a["paragraphs"] == b["paragraphs"]
    assert a["sentences"] == b["sentences"]
    assert a["toc"] == b["toc"]
    assert a["needs_ocr_pages"] == b["needs_ocr_pages"]
    assert a["language"] == b["language"]


def test_manual_split_merge_equals_whole():
    pdf = _multi_page_pdf(with_outlines=False)
    whole = extract_row("u", pdf)
    cfg = PipelineConfig()
    rows = [extract_row("u", chunk, "", cfg)
            for _no, chunk in split_pdf_to_page_pdfs(pdf, cfg)]
    merged = merge_extracted_rows(rows)
    _assert_rows_equal(merged, whole)


def test_in_actor_giant_split_equals_oracle():
    """Force the in-actor split path with a tiny giant_row_bytes and check
    byte-identity vs the whole-doc oracle — including nested-outline TOC,
    which the chunk PDFs cannot carry (the stage re-reads it)."""
    pdf = _multi_page_pdf(with_outlines=True)
    cfg = PipelineConfig(giant_row_bytes=1024,    # force the split path
                         read_sections_from_toc=True)
    whole = extract_row("u", pdf, "", cfg)
    stage = ExtractText(cfg)
    batch = pa.table({"url": ["u"], "html": pa.array([pdf], pa.binary()),
                      "lang": [""]})
    out = stage(batch)
    got = {
        "text": out.column("text")[0].as_py(),
        "char_spans": np.asarray(out.column("char_spans")[0].as_py(),
                                 np.float32).reshape(-1, 4),
        "pages": out.column("pages")[0].as_py(),
        "paragraphs": out.column("paragraphs")[0].as_py(),
        "sentences": out.column("sentences")[0].as_py(),
        "toc": out.column("toc")[0].as_py(),
        "needs_ocr_pages": out.column("needs_ocr_pages")[0].as_py(),
        "language": out.column("language")[0].as_py(),
    }
    _assert_rows_equal(got, whole)
    assert [s["title"] for s in out.column("sections")[0].as_py()] == \
           [s["title"] for s in whole["sections"]]


def test_exploded_pipeline_toc_page_shift(ray_session):
    """Flat (level-1) outlines survive the distributed exploded path with
    correct page renumbering after the groupby(url) merge."""
    from text_extraction_system_ray.pipelines.extraction import (
        extract_dataset_exploded)
    pdf = _multi_page_pdf(with_outlines=True)
    t = pa.table({"url": ["u"],
                  "warc_ts": pa.array([0], pa.timestamp("us")),
                  "html": pa.array([pdf], pa.binary()),
                  "text": [""], "lang": [""]})
    cfg = PipelineConfig(giant_row_bytes=1024)
    out = extract_dataset_exploded(ray.data.from_arrow(t), cfg).take_all()
    assert len(out) == 1
    whole = extract_row("u", pdf)
    got_toc = out[0]["toc"]
    assert [e["page"] for e in got_toc] == [e["page"] for e in whole["toc"]]
    assert [e["title"] for e in got_toc] == [e["title"] for e in whole["toc"]]
    assert out[0]["text"] == whole["text"]


def test_exploded_pipeline_nested_toc_levels(ray_session):
    """NESTED outlines (levels 1..3 whose ancestors live on other pages)
    survive the distributed exploded path exactly — the whole-document
    TOC rides the doc_toc side channel through the groupby merge (r2;
    previously flattened per-page, the documented r1 limitation)."""
    from text_extraction_system_ray.pipelines.extraction import (
        extract_dataset_exploded)
    outlines = [
        {"title": "Part I", "page": 1, "level": 1, "x": 72, "y": 720},
        {"title": "Chapter 1", "page": 2, "level": 2, "x": 72, "y": 700},
        {"title": "Section 1.1", "page": 3, "level": 3, "x": 72, "y": 680},
        {"title": "Chapter 2", "page": 4, "level": 2, "x": 72, "y": 700},
        {"title": "Part II", "page": 5, "level": 1, "x": 72, "y": 720},
    ]
    pdf = build_pdf(
        [[f"Page {p} line {j} words here." for j in range(6)]
         for p in range(6)], outlines=outlines)
    t = pa.table({"url": ["u"],
                  "warc_ts": pa.array([0], pa.timestamp("us")),
                  "html": pa.array([pdf], pa.binary()),
                  "text": [""], "lang": [""]})
    cfg = PipelineConfig(giant_row_bytes=1024,
                         read_sections_from_toc=True)
    out = extract_dataset_exploded(ray.data.from_arrow(t), cfg).take_all()
    whole = extract_row("u", pdf, "", cfg)
    assert len(out) == 1
    got = out[0]
    assert [(e["title"], e["level"], e["page"]) for e in got["toc"]] == \
           [(e["title"], e["level"], e["page"]) for e in whole["toc"]]
    assert [e["level"] for e in got["toc"]] == [1, 2, 3, 2, 1]
    assert got["sections"] == whole["sections"]
    assert got["text"] == whole["text"]

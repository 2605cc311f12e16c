"""Pipeline configuration.

The reference exposes per-request flags (``ocr_enable``, ``deskew_enable``,
``table_extraction_enable``, ``output_format``, ``doc_language``, ... —
``text_extraction_system/web_api.py:68-94`` and
``request_metadata.py:36-110``). The new engine turns them into a single
job-level config dataclass captured by closure into the map_batches stages
(small → cheap to ship per task; no mutable shared state).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- behavior flags (reference analogs cited) ---
    table_extraction_enable: bool = True   # ref: request_metadata.py:62
    read_sections_from_toc: bool = False   # ref: request_metadata.py:66 (TOC path vs heading path)
    ocr_enable: bool = False               # ref: request_metadata.py:58 — raster/OCR arm is STUBBED (no tesseract in env)
    remove_nuls: bool = True               # ref: data_extract.py:113-114 (\x00 strip for PostgreSQL)
    doc_language: str = ""                 # forced language; "" = detect (ref: request_metadata.py:55)
    pdf_password: str = ""                 # standard-handler decrypt (ref: web_api.py:68-94, GetTextFromPDF.java:23-98)

    # --- poison-row guards (deterministic: step budgets, not wall-clock) ---
    max_payload_bytes: int = 64 * 1024 * 1024   # larger rows → status='error'
    max_parse_events: int = 5_000_000            # HTML tokenizer event budget per row
    max_pdf_tokens: int = 5_000_000              # PDF content-stream token budget per row

    # --- skew / physical execution knobs ---
    giant_row_bytes: int = 4 * 1024 * 1024  # rows above this use the page-split path (PDF) / dedicated pool (HTML)
    pdf_split_pages_per_chunk: int = 1      # ref: split_pdf_to_page_blocks pages_per_block (pdf/pdf.py:285)
    extract_batch_size: int = 16            # MB-sized html blobs → small row batches
    extract_concurrency: int = 8            # actor pool size for the extraction stage
    enrich_batch_size: int = 64
    enrich_concurrency: int = 4

    # --- boilerplate classifier thresholds (frozen; see functions/html_extract.py) ---
    bp_link_density_drop: float = 0.66
    bp_short_block_words: int = 25
    bp_rescue_link_density: float = 0.34
    bp_rescue_min_words: int = 10


DEFAULT_CONFIG = PipelineConfig()

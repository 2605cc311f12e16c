"""Extraction stage: a stateful map_batches callable (actor pool).

Reference analog: the Celery worker processing one document end-to-end
(``tasks.py:207-293`` + ``extract_text_and_structure``,
``data_extract.py:51-204``) — here a callable class so per-actor setup
(recursion-limit bump, compiled heuristic tables via module import) runs
once per actor, then each ``__call__`` handles an Arrow batch of rows
(SURVEY.md §2.3).
"""
from __future__ import annotations

import sys
from typing import Optional

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..extract import extract_row, sniff_kind
from ..functions.merge import merge_extracted_rows
from ..functions.pdf_extract import split_pdf_to_page_pdfs
from ..schema import results_to_table


class ExtractText:
    """html/pdf payload rows → EXTRACTED_SCHEMA rows.

    Input batch columns: url, html (binary payload), lang (hint; optional),
    plus passthrough-ignored columns. Output: EXTRACTED_SCHEMA (+ chunk
    metadata columns when present, forwarded for the skew path).
    """

    def __init__(self, cfg: Optional[PipelineConfig] = None):
        self.cfg = cfg or DEFAULT_CONFIG
        # ref precedent: pdfminer needs a recursion-limit bump per worker
        # (tasks.py:72-81); our HTML tokenizer is iterative but section
        # nesting on adversarial rows still benefits from headroom.
        if sys.getrecursionlimit() < 10_000:
            sys.setrecursionlimit(10_000)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        langs = (batch.column("lang").to_pylist()
                 if "lang" in batch.column_names else [""] * len(urls))
        results = [
            self._extract_one(u, p, l or "")
            for u, p, l in zip(urls, payloads, langs)
        ]
        out = results_to_table(results)
        # forward chunk bookkeeping columns (skew path; see stages/chunk.py)
        if "is_chunk" in batch.column_names:
            for col in ("chunk_id", "n_chunks", "is_chunk"):
                out = out.append_column(col, batch.column(col))
            out = out.append_column("lang_hint", batch.column("lang"))
            if "doc_toc" in batch.column_names:
                out = out.append_column("doc_toc", batch.column("doc_toc"))
        return out

    def _extract_one(self, url: str, payload, lang_hint: str) -> dict:
        """Giant PDFs are page-split inside the actor and merged in-process
        (bounded memory per task; ref analog: page fan-out ``tasks.py:259-293``
        — here the cross-doc row parallelism of the Dataset supplies the
        fan-out, so no shuffle is needed on the happy path; the explicit
        cross-task explode lives in stages/chunk.py)."""
        cfg = self.cfg
        if (payload is not None and len(payload) > cfg.giant_row_bytes
                and sniff_kind(payload) == "pdf"):
            try:
                chunks = split_pdf_to_page_pdfs(payload, cfg)
            except Exception:
                chunks = []
            if len(chunks) > 1:
                forced = (cfg.doc_language or (lang_hint or "").strip().lower()[:2])
                rows = [extract_row(url, pdf_bytes, lang_hint, cfg)
                        for _no, pdf_bytes in chunks]
                merged = merge_extracted_rows(rows, forced)
                # outline nesting does not survive per-page chunk PDFs
                # (level = tree depth); re-read the whole-document TOC so
                # the in-actor split stays byte-identical to the oracle
                if merged["status"] == "ok":
                    try:
                        from ..functions.assembly import sections_from_toc
                        from ..functions.pdf_extract import extract_pdf_toc
                        merged["toc"] = extract_pdf_toc(payload, cfg)
                        if cfg.read_sections_from_toc and merged["toc"]:
                            merged["sections"] = sections_from_toc(
                                merged["toc"], merged["char_spans"],
                                merged["pages"], len(merged["text"]))
                    except Exception:
                        pass
                return merged
        return extract_row(url, payload, lang_hint, cfg)

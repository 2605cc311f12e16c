"""Explicit skew path: page-explode giant PDFs across tasks, merge by url.

Reference analog: ``split_pdf_to_page_blocks`` page fan-out + Celery chord
fan-in (``tasks.py:259-293``, ``pdf/pdf.py:285-324``). In the Ray engine
this is the ONLY shuffle in the extraction pipeline (SURVEY.md §4.2):
``flat``-style split in ``map_batches`` → extraction → ``groupby('url')``
hash partition → ``map_groups`` reassembly ordered by ``chunk_id``.

Used for the *giant-document subset only* (the caller routes rows above
``cfg.giant_row_bytes`` here); normal rows flow through the shuffle-free
linear pipeline where the extract actor handles oversized PDFs in-process.
"""
from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..extract import sniff_kind
from ..functions.merge import merge_extracted_rows
from ..functions.pdf_extract import split_pdf_to_page_pdfs
from ..schema import results_to_table


class SplitGiantRows:
    """pages rows → chunk rows. PDF rows split per page; everything else
    passes through as a single chunk (chunk_id=0)."""

    def __init__(self, cfg: Optional[PipelineConfig] = None):
        self.cfg = cfg or DEFAULT_CONFIG

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        langs = (batch.column("lang").to_pylist()
                 if "lang" in batch.column_names else [""] * len(urls))
        out = {"url": [], "html": [], "lang": [],
               "chunk_id": [], "n_chunks": [], "is_chunk": [],
               "doc_toc": []}
        for u, p, l in zip(urls, payloads, langs):
            chunks = None
            doc_toc = ""
            if p is not None and sniff_kind(p) == "pdf":
                try:
                    chunks = split_pdf_to_page_pdfs(p, self.cfg)
                except Exception:
                    chunks = None
                if chunks and len(chunks) > 1:
                    # whole-document outline as a side channel: per-page
                    # chunk PDFs cannot encode nesting whose ancestors
                    # live on other pages, so the true tree (correct
                    # levels + original page numbers) rides along as
                    # JSON on the first chunk row and wins at merge
                    try:
                        from ..functions.pdf_extract import extract_pdf_toc
                        doc_toc = json.dumps(extract_pdf_toc(p, self.cfg))
                    except Exception:
                        doc_toc = ""
            if chunks and len(chunks) > 1:
                for idx, (no, pdf_bytes) in enumerate(chunks):
                    out["url"].append(u)
                    out["html"].append(pdf_bytes)
                    out["lang"].append(l or "")
                    out["chunk_id"].append(no)
                    out["n_chunks"].append(len(chunks))
                    out["is_chunk"].append(1)
                    out["doc_toc"].append(doc_toc if idx == 0 else "")
            else:
                out["url"].append(u)
                out["html"].append(p)
                out["lang"].append(l or "")
                out["chunk_id"].append(0)
                out["n_chunks"].append(1)
                out["is_chunk"].append(0)
                out["doc_toc"].append("")
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "html": pa.array(out["html"], pa.binary()),
            "lang": pa.array(out["lang"], pa.string()),
            "chunk_id": pa.array(out["chunk_id"], pa.int32()),
            "n_chunks": pa.array(out["n_chunks"], pa.int32()),
            "is_chunk": pa.array(out["is_chunk"], pa.int8()),
            "doc_toc": pa.array(out["doc_toc"], pa.string()),
        })


def _row_to_dict(tbl: pa.Table, i: int) -> dict:
    d = {name: tbl.column(name)[i].as_py()
         for name in tbl.column_names
         if name not in ("char_spans", "chunk_id", "n_chunks", "is_chunk",
                         "lang_hint", "doc_toc")}
    spans = tbl.column("char_spans")[i].as_py() or []
    d["char_spans"] = np.asarray(spans, np.float32).reshape(-1, 4)
    return d


def merge_group(group: pa.Table,
                cfg: Optional[PipelineConfig] = None) -> pa.Table:
    """map_groups fan-in: one merged row per url (ref chord body analog,
    ``tasks.py:365-437``). Groups arrive hash-partitioned by url; order
    within the group is restored by chunk_id sort, like the reference's
    zero-padded page-name parse (``tasks.py:404-412``).

    ``cfg.doc_language`` takes precedence over the row's lang hint, the
    same forced-language rule the in-actor split path and the scalar
    oracle apply (extract_stage.py / extract.py; ref:
    request_metadata.py:55) — keeping pipeline == oracle when a document
    language is forced."""
    cfg = cfg or DEFAULT_CONFIG
    order = np.argsort(group.column("chunk_id").to_numpy(), kind="stable")
    rows = [_row_to_dict(group, int(i)) for i in order]
    hint = ""
    if "lang_hint" in group.column_names and len(group):
        hint = (group.column("lang_hint")[0].as_py() or "").strip().lower()[:2]
    merged = merge_extracted_rows(rows, cfg.doc_language or hint)
    # whole-document outline side channel (see SplitGiantRows): restores
    # TOC nesting across chunk boundaries, mirroring the in-actor split
    # path's whole-doc re-read (stages/extract_stage.py)
    if merged["status"] == "ok" and "doc_toc" in group.column_names:
        doc_toc = next((v for v in group.column("doc_toc").to_pylist()
                        if v), "")
        if doc_toc:
            try:
                merged["toc"] = json.loads(doc_toc)
                if cfg.read_sections_from_toc and merged["toc"]:
                    from ..functions.assembly import sections_from_toc
                    merged["sections"] = sections_from_toc(
                        merged["toc"], merged["char_spans"],
                        merged["pages"], len(merged["text"]))
            except Exception:
                pass
    return results_to_table([merged])

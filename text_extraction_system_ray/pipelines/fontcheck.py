"""Real-font decode validation pipeline.

``realfont_roundtrip`` drives the full font machinery end-to-end over
the ``documents`` table: each row's (whitespace-normalized) text is
written into a Type0/Identity-H PDF with shifted char codes, a per-code
``/W`` width table, a ``/ToUnicode`` CMap and a seed-chosen stream
filter (:mod:`..functions.pdf_fontgen`), then extracted back through
the ordinary ``extract_row`` path. The DuckDB oracle compares against
the SOURCE text — so a wrong CMap lookup, width-table misparse or
filter bug shows up as a hash mismatch, independent of the generator
(which never consults the extractor).

Ref parity target: PDFBox's font-aware glyph decode,
``PDFToTextWithCoordinates.java:181-225``.
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG
from ..extract import extract_row
from ..functions.pdf_fontgen import build_realfont_pdf


class RoundTrip:
    """Stateful batch stage: build the shifted-code PDF, extract, emit
    (doc_id, text_out). Runs fully inside the actor pool — text never
    touches the driver."""

    def __init__(self):
        self.cfg = DEFAULT_CONFIG

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out = []
        for did, txt in zip(ids, texts):
            clean = " ".join((txt or "").split())
            pdf = build_realfont_pdf(clean, seed=int(did))
            row = extract_row(str(did), pdf, "", self.cfg)
            out.append(row["text"] if row["status"] == "ok"
                       else f"<error: {row['error']}>")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text_out": pa.array(out, pa.string())})


def realfont_roundtrip(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    df = ds.map_batches(RoundTrip, batch_format="pyarrow",
                        concurrency=(1, 8)).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)

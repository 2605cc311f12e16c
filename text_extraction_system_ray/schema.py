"""Arrow schemas + vectorized batch builders.

One logical output table replaces the reference's per-request WebDAV
artifact files (SURVEY.md §1.3): every artifact (`*.plain.txt`,
`pdf_coordinates`, structure json, tables msgpack) becomes a column.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa

# ---- input (the BASELINE.json input_hint schema) ----------------------
PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_BBOX = pa.list_(pa.float32(), 4)

PAGE_STRUCT = pa.struct([
    ("number", pa.int32()), ("start", pa.int32()), ("end", pa.int32()),
    ("bbox", _BBOX), ("rotation", pa.int32()),
])
SPAN_STRUCT = pa.struct([
    ("start", pa.int32()), ("end", pa.int32()), ("language", pa.string()),
])
SECTION_STRUCT = pa.struct([
    ("start", pa.int32()), ("end", pa.int32()), ("title", pa.string()),
    ("title_start", pa.int32()), ("title_end", pa.int32()),
    ("level", pa.int32()), ("abs_level", pa.int32()),
    ("left", pa.float32()), ("top", pa.float32()), ("page", pa.int32()),
])
TOC_STRUCT = pa.struct([
    ("title", pa.string()), ("level", pa.int32()),
    ("left", pa.float32()), ("top", pa.float32()), ("page", pa.int32()),
])
TABLE_STRUCT = pa.struct([
    ("page", pa.int32()), ("left", pa.float32()), ("top", pa.float32()),
    ("width", pa.float32()), ("height", pa.float32()),
    ("cells", pa.list_(pa.list_(pa.string()))),
])

# ---- output (ref DTO analog: dto.py:84-206 + PDFPlainText.java:5-14) --
EXTRACTED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("status", pa.string()),          # 'ok' | 'error' — errors are rows, not exceptions
    ("error", pa.string()),
    ("kind", pa.string()),            # 'html' | 'pdf' | 'empty' | 'unknown'
    ("text", pa.large_string()),      # THE byte-identity column
    ("char_spans", pa.list_(_BBOX)),  # one [x,y,w,h] per char; len == len(text)
    ("pages", pa.list_(PAGE_STRUCT)),
    ("paragraphs", pa.list_(SPAN_STRUCT)),
    ("sentences", pa.list_(SPAN_STRUCT)),
    ("sections", pa.list_(SECTION_STRUCT)),
    ("toc", pa.list_(TOC_STRUCT)),
    ("tables", pa.list_(TABLE_STRUCT)),
    ("language", pa.string()),
    ("title", pa.string()),
    ("needs_ocr_pages", pa.list_(pa.int32())),
])


def char_spans_array(rows: Sequence[np.ndarray]) -> pa.ListArray:
    """Vectorized list<fixed_size_list<float32,4>> from per-row (n,4) arrays.

    The wide column (§7.4(2) of SURVEY.md): 4 float32 per character. Built
    from one flat concatenation + offsets — no per-char Python objects.
    """
    counts = np.fromiter((r.shape[0] for r in rows), dtype=np.int64,
                         count=len(rows))
    offsets = np.zeros(len(rows) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    flat = (np.concatenate(rows, axis=0).astype(np.float32, copy=False)
            if len(rows) else np.zeros((0, 4), np.float32))
    values = pa.FixedSizeListArray.from_arrays(
        pa.array(flat.reshape(-1), type=pa.float32()), 4)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def results_to_table(results: Sequence[Dict]) -> pa.Table:
    """Batch of extract_row() dicts → Arrow table with EXTRACTED_SCHEMA."""
    cols: Dict[str, pa.Array] = {}
    for name in ("url", "status", "error", "kind", "language", "title"):
        typ = pa.string()
        cols[name] = pa.array([r[name] for r in results], type=typ)
    cols["text"] = pa.array([r["text"] for r in results], type=pa.large_string())
    cols["char_spans"] = char_spans_array([r["char_spans"] for r in results])
    for name, typ in (("pages", pa.list_(PAGE_STRUCT)),
                      ("paragraphs", pa.list_(SPAN_STRUCT)),
                      ("sentences", pa.list_(SPAN_STRUCT)),
                      ("sections", pa.list_(SECTION_STRUCT)),
                      ("toc", pa.list_(TOC_STRUCT)),
                      ("tables", pa.list_(TABLE_STRUCT)),
                      ("needs_ocr_pages", pa.list_(pa.int32()))):
        cols[name] = pa.array([r[name] for r in results], type=typ)
    return pa.table({f.name: cols[f.name] for f in EXTRACTED_SCHEMA},
                    schema=EXTRACTED_SCHEMA)

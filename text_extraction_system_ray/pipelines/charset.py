"""Charset-normalization op over alt-encoded web payloads.

The tail of a real crawl is not UTF-8: BOM'd UTF-16 exports and
``windows-1252`` pages declared via ``<meta charset=...>``. This op is
the upstream normalizer that rewrites that tail into the frozen UTF-8
extraction contract (rule H1): sniff (WHATWG order: BOM > meta prescan
> UTF-8 fallback), decode, re-emit text.

Fixture: one alt-encoded payload per document, family = doc_id % 4
(utf-8 / utf-16-le BOM / utf-16-be BOM / cp1252 via meta). The UTF-16
payloads deliberately carry a LYING ``<meta charset="utf-8">`` so the
oracle match proves BOM-over-meta precedence; every payload embeds a
'€' (cp1252 0x80 — the classic mojibake byte) so each codec's multi-
byte path is actually exercised. The decoded body string is compared
byte-for-byte against the SQL oracle's reconstruction.

Shape: embarrassingly parallel map_batches, no shuffle.
"""
from __future__ import annotations

import re

import pyarrow as pa
import ray.data

from ..functions.charset import decode_payload

_BODY_RE = re.compile(r"<body>(.*?)</body>", re.DOTALL)


def body_text(doc_id: int, source: str) -> str:
    return f"Doc {doc_id} charset test ({source}) €"


def build_payload(doc_id: int, source: str) -> bytes:
    """Deterministic alt-encoded page for one document."""
    fam = doc_id % 4
    body = body_text(doc_id, source)
    if fam == 0:
        html = f'<html><head><meta charset="utf-8"></head><body>{body}</body></html>'
        return html.encode("utf-8")
    if fam == 1:
        html = f'<html><head><meta charset="utf-8"></head><body>{body}</body></html>'
        return b"\xff\xfe" + html.encode("utf-16-le")
    if fam == 2:
        html = f'<html><head><meta charset="utf-8"></head><body>{body}</body></html>'
        return b"\xfe\xff" + html.encode("utf-16-be")
    html = (f'<html><head><meta http-equiv="Content-Type" '
            f'content="text/html; charset=windows-1252"></head>'
            f"<body>{body}</body></html>")
    return html.encode("cp1252")


def _decode_batch(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    out_ids, charsets, texts = [], [], []
    for doc_id, source in zip(ids, sources):
        payload = build_payload(doc_id, source)
        text, codec = decode_payload(payload)
        m = _BODY_RE.search(text)
        out_ids.append(doc_id)
        charsets.append(codec)
        texts.append(m.group(1) if m else "")
    return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                     "charset": pa.array(charsets, pa.string()),
                     "text": pa.array(texts, pa.string())})


def charset_decode(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, charset, text) — per-row string parity with the oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    return ds.map_batches(_decode_batch, batch_format="pyarrow")

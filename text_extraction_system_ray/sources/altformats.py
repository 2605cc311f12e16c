"""Alternate source/sink formats: JSONL and CSV for the pages tables.

The reference accepts uploads in whatever container the caller has
(SURVEY §2.1); the Ray-Data analog is format-pluggable reads.  Parquet
is the performance path (column pruning, row-group filters); JSONL and
CSV are the interchange paths crawls actually arrive in.  Binary
payloads survive JSONL/CSV via base64 (the standard WARC-sidecar
convention), re-decoded vectorized on read.

These wrap Ray's native ``read_json`` / ``read_csv`` readers — the
streaming, multi-file, spillable paths — plus the base64 payload codec,
so a pipeline can swap ``read_pages`` for ``read_pages_jsonl`` and run
unchanged (pinned by the round-trip test).
"""
from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _encode_payload(t: pa.Table, col: str) -> pa.Table:
    """binary → base64 string column (driver-side export helper)."""
    enc = [None if v is None else
           base64.b64encode(v).decode("ascii")
           for v in t.column(col).to_pylist()]
    i = t.column_names.index(col)
    return t.set_column(i, col, pa.array(enc, pa.string()))


def _decode_payload(t: pa.Table, col: str) -> pa.Table:
    if col not in t.column_names:
        return t
    dec = [None if v is None else base64.b64decode(v)
           for v in t.column(col).to_pylist()]
    i = t.column_names.index(col)
    return t.set_column(i, col, pa.array(dec, pa.binary()))


def write_pages_jsonl(ds: ray.data.Dataset, out_dir: str,
                      payload_col: str = "html") -> None:
    ds.map_batches(lambda t: _encode_payload(t, payload_col),
                   batch_format="pyarrow").write_json(out_dir)


def read_pages_jsonl(paths, payload_col: str = "html"
                     ) -> ray.data.Dataset:
    return ray.data.read_json(paths).map_batches(
        lambda t: _decode_payload(t, payload_col),
        batch_format="pyarrow")


def write_pages_csv(ds: ray.data.Dataset, out_dir: str,
                    payload_col: str = "html") -> None:
    ds.map_batches(lambda t: _encode_payload(t, payload_col),
                   batch_format="pyarrow").write_csv(out_dir)


def read_pages_csv(paths, payload_col: str = "html"
                   ) -> ray.data.Dataset:
    return ray.data.read_csv(paths).map_batches(
        lambda t: _decode_payload(t, payload_col),
        batch_format="pyarrow")

"""Output serialization codecs (S4 / OutputFormat analog).

The reference serializes structure + coordinates per request as
json | msgpack | protobuf (``dto.py:16-19``, writer branches
``tasks.py:464-508``; msgpack packs coordinates with
``use_single_float=True`` and ``gc.disable()``, ``tasks.py:478-489``;
the protobuf tables writer is a stub that writes ``""`` —
``tasks.py:536-541``).

Here serialization is a *column*: ``serialize_structure`` adds a
``structure_<fmt>`` binary column holding the encoded
PlainTextStructure-equivalent per row. Protobuf is not available in this
environment → ``fmt='protobuf'`` raises NotImplementedError (mirroring
the reference's own stubbed protobuf tables path).
"""
from __future__ import annotations

import json
from typing import Optional

import pyarrow as pa
import ray.data

try:
    import msgpack
    _HAVE_MSGPACK = True
except ImportError:  # pragma: no cover
    _HAVE_MSGPACK = False

FORMATS = ("json", "msgpack")


def _row_structure(t: pa.Table, i: int) -> dict:
    """PlainTextStructure-equivalent dict (ref dto.py:84-165)."""
    return {
        "title": t.column("title")[i].as_py(),
        "language": t.column("language")[i].as_py(),
        "pages": t.column("pages")[i].as_py(),
        "sentences": t.column("sentences")[i].as_py(),
        "paragraphs": t.column("paragraphs")[i].as_py(),
        "sections": t.column("sections")[i].as_py(),
        "table_of_contents": t.column("toc")[i].as_py(),
    }


def encode_structure(struct: dict, fmt: str) -> bytes:
    if fmt == "json":
        return json.dumps(struct, ensure_ascii=False,
                          separators=(",", ":")).encode("utf-8")
    if fmt == "msgpack":
        if not _HAVE_MSGPACK:
            raise NotImplementedError("msgpack not installed")
        # use_single_float mirrors tasks.py:480-485 (float32 coords)
        return msgpack.packb(struct, use_single_float=True, use_bin_type=True)
    if fmt == "protobuf":
        raise NotImplementedError(
            "protobuf codec not available in this environment "
            "(ref precedent: stubbed protobuf tables writer, tasks.py:536-541)")
    raise ValueError(f"unknown format: {fmt}")


def serialize_structure(ds: ray.data.Dataset, fmt: str = "msgpack") -> ray.data.Dataset:
    """Add a ``structure_<fmt>: binary`` column to an extracted Dataset."""
    if fmt not in FORMATS:
        # raise early with the same message the per-row codec would give
        encode_structure({}, fmt)

    def fn(t: pa.Table) -> pa.Table:
        blobs = [encode_structure(_row_structure(t, i), fmt)
                 for i in range(t.num_rows)]
        return t.append_column(f"structure_{fmt}",
                               pa.array(blobs, pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow")

"""Output serialization codecs (S4 / OutputFormat analog).

The reference serializes structure + coordinates per request as
json | msgpack | protobuf (``dto.py:16-19``, writer branches
``tasks.py:464-508``; msgpack packs coordinates with
``use_single_float=True`` and ``gc.disable()``, ``tasks.py:478-489``;
the protobuf tables writer is a stub that writes ``""`` —
``tasks.py:536-541``).

Here serialization is a *column*: ``serialize_structure`` adds a
``structure_<fmt>`` binary column holding the encoded
PlainTextStructure-equivalent per row.

The protobuf codec is a hand-rolled proto2 wire-format writer (no
protobuf package in this environment) implementing the reference's own
contract files verbatim — message/field numbers from
``text_extraction_system_api/proto_files/contract_pages.proto`` and
``contract_char_bboxes.proto``, the structures the reference uploads at
``tasks.py:495-508``. String fields use the ``google.protobuf.
StringValue`` wrapper exactly as the contract declares.
"""
from __future__ import annotations

import json
import struct as _struct
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import ray.data

try:
    import msgpack
    _HAVE_MSGPACK = True
except ImportError:  # pragma: no cover
    _HAVE_MSGPACK = False

FORMATS = ("json", "msgpack", "protobuf")


# ---- proto2 wire primitives -------------------------------------------
def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_varint(field: int, v: Optional[int]) -> bytes:
    if v is None:
        return b""
    return _key(field, 0) + _varint(int(v) & 0xFFFFFFFFFFFFFFFF)


def _f_float(field: int, v: Optional[float]) -> bytes:
    if v is None:
        return b""
    return _key(field, 5) + _struct.pack("<f", float(v))


def _f_bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _f_string_value(field: int, v: Optional[str]) -> bytes:
    """google.protobuf.StringValue wrapper: submessage with field 1 =
    string; None → absent, '' → present-but-default (empty payload)."""
    if v is None:
        return b""
    inner = b"" if v == "" else _f_bytes(1, v.encode("utf-8"))
    return _f_bytes(field, inner)


def _f_packed_floats(field: int, vals) -> bytes:
    if not vals:
        return b""
    return _f_bytes(field, _struct.pack("<%df" % len(vals),
                                        *[float(x) for x in vals]))


# ---- contract_pages.proto messages ------------------------------------
def _pb_page(p: dict) -> bytes:
    return (_f_varint(1, p.get("number", 0))
            + _f_varint(2, p.get("start", 0))
            + _f_varint(3, p.get("end", 0))
            + _f_float(4, p.get("rotation"))
            + _f_packed_floats(5, p.get("bbox") or []))


def _pb_span_lang(s: dict) -> bytes:   # Sentence / Paragraph
    return (_f_varint(1, s.get("start"))
            + _f_varint(2, s.get("end"))
            + _f_string_value(3, s.get("language")))


def _pb_section(s: dict) -> bytes:
    return (_f_varint(1, s.get("start"))
            + _f_varint(2, s.get("end"))
            + _f_string_value(3, s.get("title"))
            + _f_varint(4, s.get("title_start"))
            + _f_varint(5, s.get("title_end"))
            + _f_varint(6, s.get("level"))
            + _f_varint(7, s.get("abs_level"))
            + _f_float(8, s.get("left"))
            + _f_float(9, s.get("top"))
            + _f_varint(10, s.get("page")))


def _pb_toc(t: dict) -> bytes:
    def as_int(v):
        return None if v is None else int(v)
    return (_f_string_value(1, t.get("title"))
            + _f_varint(2, t.get("level"))
            + _f_varint(3, as_int(t.get("left")))
            + _f_varint(4, as_int(t.get("top")))
            + _f_varint(5, t.get("page")))


def encode_structure_protobuf(struct: dict) -> bytes:
    """``Pages`` message of contract_pages.proto (ref upload at
    ``tasks.py:502-508``)."""
    out = [_f_string_value(1, struct.get("title")),
           _f_string_value(2, struct.get("language"))]
    for p in struct.get("pages") or []:
        out.append(_f_bytes(3, _pb_page(p)))
    for s in struct.get("sentences") or []:
        out.append(_f_bytes(4, _pb_span_lang(s)))
    for s in struct.get("paragraphs") or []:
        out.append(_f_bytes(5, _pb_span_lang(s)))
    for s in struct.get("sections") or []:
        out.append(_f_bytes(6, _pb_section(s)))
    for t in struct.get("table_of_contents") or []:
        out.append(_f_bytes(7, _pb_toc(t)))
    return b"".join(out)


def encode_char_bboxes_protobuf(char_bboxes) -> bytes:
    """``CharBboxes`` of contract_char_bboxes.proto: one ``Coordinates``
    submessage (packed floats) per char (ref ``tasks.py:495-501``)."""
    out = []
    for box in char_bboxes:
        out.append(_f_bytes(1, _f_packed_floats(1, list(box))))
    return b"".join(out)


# ---- minimal decoder (round-trip tests / consumers without protobuf) --
def _read_varint(data: bytes, i: int) -> Tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return v, i
        shift += 7


def decode_message(data: bytes) -> Dict[int, List]:
    """Wire-format message → {field: [raw values]} (varints as int,
    fixed32 as float, length-delimited as bytes)."""
    out: Dict[int, List] = {}
    i = 0
    n = len(data)
    while i < n:
        k, i = _read_varint(data, i)
        field, wire = k >> 3, k & 7
        if wire == 0:
            v, i = _read_varint(data, i)
        elif wire == 5:
            v = _struct.unpack("<f", data[i:i + 4])[0]
            i += 4
        elif wire == 2:
            ln, i = _read_varint(data, i)
            v = data[i:i + ln]
            i += ln
        elif wire == 1:
            v = _struct.unpack("<d", data[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"bad wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def decode_string_value(raw: bytes) -> str:
    m = decode_message(raw)
    return m.get(1, [b""])[0].decode("utf-8")


def decode_packed_floats(raw: bytes) -> List[float]:
    return list(_struct.unpack("<%df" % (len(raw) // 4), raw))


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
        return encode_structure_protobuf(struct)
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

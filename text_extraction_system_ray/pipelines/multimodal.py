"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not present in this container, so the
decode kernels are STUBBED (clearly marked) behind a deterministic fake
format — but the Ray-side plumbing is real and tested: binary column in,
actor-pool ``map_batches`` stage, small batch sizes for large payloads,
struct metadata out. Swapping ``_decode_stub`` for a real PIL/ffmpeg call
changes nothing about the dataflow.

Fake format (deterministic): 24-byte header
``b'FAKEIMG1' + width:uint32 + height:uint32 + channels:uint32 + mode:4s``
followed by ``width*height*channels`` payload bytes.
"""
from __future__ import annotations

import hashlib
import struct
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

MAGIC = b"FAKEIMG1"
_HEADER = struct.Struct("<8sIII4s")


def encode_fake_image(width: int, height: int, channels: int = 3,
                      mode: bytes = b"RGB\x00", seed: int = 0) -> bytes:
    """Deterministic fake image bytes (fixture/bench helper)."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    body = rng.randint(0, 256, size=width * height * channels,
                       dtype=np.int64).astype(np.uint8).tobytes()
    return _HEADER.pack(MAGIC, width, height, channels, mode) + body


def _decode_stub(payload: bytes) -> dict:
    """STUB decode — replace with PIL.Image.open / cv2.imdecode in a real
    deployment. Raises ValueError on junk exactly like a real decoder."""
    if payload is None or len(payload) < _HEADER.size:
        raise ValueError("payload too short")
    magic, w, h, c, mode = _HEADER.unpack_from(payload, 0)
    if magic != MAGIC:
        raise NotImplementedError(
            "real image decoding is stubbed in this environment "
            "(no PIL/cv2); only the FAKEIMG1 fixture format decodes")
    body = payload[_HEADER.size:]
    if len(body) != w * h * c:
        raise ValueError("payload length mismatch")
    arr = np.frombuffer(body, dtype=np.uint8)
    return {"width": int(w), "height": int(h), "channels": int(c),
            "mode": mode.rstrip(b"\x00").decode("ascii"),
            "mean_px": round(float(arr.mean()), 4) if arr.size else 0.0,
            "sha1": hashlib.sha1(payload).hexdigest()}


class DecodeImages:
    """Actor-pool decode stage: binary column → metadata/feature columns.
    Small default batch size — payloads are MB-scale, so batch bytes stay
    far below an object-store slice (SURVEY.md §4.1 memory pressure)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {"doc_id": [], "status": [], "error": [], "width": [],
                "height": [], "channels": [], "mode": [], "mean_px": [],
                "sha1": []}
        for doc_id, payload in zip(t.column("doc_id").to_pylist(),
                                   t.column("image").to_pylist()):
            cols["doc_id"].append(doc_id)
            try:
                m = _decode_stub(payload)
                cols["status"].append("ok")
                cols["error"].append("")
                for k in ("width", "height", "channels", "mode", "mean_px", "sha1"):
                    cols[k].append(m[k])
            except Exception as e:  # noqa: BLE001 — bad payloads are rows
                cols["status"].append("error")
                cols["error"].append(f"{type(e).__name__}: {e}")
                cols["width"].append(0)
                cols["height"].append(0)
                cols["channels"].append(0)
                cols["mode"].append("")
                cols["mean_px"].append(0.0)
                cols["sha1"].append("")
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "status": pa.array(cols["status"], pa.string()),
            "error": pa.array(cols["error"], pa.string()),
            "width": pa.array(cols["width"], pa.int32()),
            "height": pa.array(cols["height"], pa.int32()),
            "channels": pa.array(cols["channels"], pa.int32()),
            "mode": pa.array(cols["mode"], pa.string()),
            "mean_px": pa.array(cols["mean_px"], pa.float64()),
            "sha1": pa.array(cols["sha1"], pa.string()),
        })


def synth_images_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic binary image column derived from documents (doc_id
    seeds size + pixels); every 17th row is corrupt to exercise the error
    path."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            if d % 17 == 5:
                payloads.append(b"NOTANIMAGE" + bytes(8))
            else:
                w = 8 + (d % 5) * 4
                h = 8 + (d % 3) * 4
                payloads.append(encode_fake_image(w, h, 3, seed=d))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "image": pa.array(payloads, pa.binary())})

    return ds.map_batches(make, batch_format="pyarrow")


def image_metadata(sf_dir: str) -> ray.data.Dataset:
    """The multimodal pipeline: synth binary column → decode actor pool."""
    return synth_images_from_documents(sf_dir).map_batches(
        DecodeImages, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4))

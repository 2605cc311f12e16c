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
import pyarrow.compute as pc
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


def _decode_image(payload: bytes):
    """Unified decode: (pixels as (h, w, c) uint8, mode string).

    Real PNGs decode through the pure-numpy codec
    (:mod:`..functions.png` — zlib + all five scanline filters) and
    real baseline JPEGs through :mod:`..functions.jpeg` (T.81 SOF0:
    Huffman + dequant + IDCT + chroma upsample) and GIF87a/89a through
    :mod:`..functions.gif` (LZW + palette + interlace); the
    and baseline TIFFs through :mod:`..functions.tiff` (strips,
    none/LZW/PackBits, predictor 2). The deterministic FAKEIMG1 fixture
    format stands in for the remaining formats (WebP raises
    NotImplementedError, clearly marked)."""
    from ..functions import jpeg as _jpeg
    from ..functions import png as _png
    if payload is None or len(payload) < 8:
        raise ValueError("payload too short")
    if _png.is_png(payload):
        arr = _png.decode_png(payload)
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[
            1 if arr.ndim == 2 else arr.shape[2]]
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr, mode
    if _jpeg.is_jpeg(payload):
        arr = _jpeg.decode_jpeg(payload)
        mode = "L" if arr.ndim == 2 else "RGB"
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr, mode
    from ..functions import gif as _gif
    if _gif.is_gif(payload):
        return _gif.decode_gif(payload), "RGB"
    from ..functions import tiff as _tiff
    if _tiff.is_tiff(payload):
        arr = _tiff.decode_tiff(payload)
        if arr.ndim == 2:
            return arr[:, :, None], "L"
        return arr, "RGB"
    from ..functions import webp as _webp
    if _webp.is_webp(payload):
        arr = _webp.decode_webp(payload)
        return arr, ("RGBA" if arr.shape[2] == 4 else "RGB")
    if len(payload) < _HEADER.size:
        raise ValueError("payload too short")
    magic, w, h, c, mode = _HEADER.unpack_from(payload, 0)
    if magic != MAGIC:
        raise NotImplementedError(
            "real decoding of this format is stubbed in this "
            "environment (no PIL/cv2); PNG, JPEG (SOF0/SOF2), GIF, "
            "baseline TIFF and the FAKEIMG1 fixture format decode")
    body = payload[_HEADER.size:]
    if len(body) != w * h * c:
        raise ValueError("payload length mismatch")
    arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)
    return arr, mode.rstrip(b"\x00").decode("ascii")


def _decode_stub(payload: bytes) -> dict:
    """Decode to metadata — PNG is real (pure-numpy codec); other
    encoded formats are stubbed. Raises ValueError on junk exactly like
    a real decoder."""
    arr, mode = _decode_image(payload)
    h, w, c = arr.shape
    return {"width": int(w), "height": int(h), "channels": int(c),
            "mode": mode,
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
    seeds size + pixels); every 17th row (≡5) is corrupt to exercise the
    error path, every 17th row (≡7) a REAL grayscale TIFF (LZW+predictor
    for even doc_ids, PackBits for odd, alternating byte order), every
    17th row (≡9) a REAL lossless WebP (VP8L, opaque RGB), every
    17th row (≡11) a REAL grayscale PNG and every 17th row (≡13) a REAL
    JPEG — baseline SOF0 for odd doc_ids, PROGRESSIVE SOF2 for even (all
    encoded by the pure-numpy codecs) — so the encoded-bitmap decode
    paths run inside the standard pipeline, not just in unit tests;
    every 17th row (≡15) a CONSTANT-value grayscale PNG whose feature
    outputs are doc_id arithmetic (the image_features_summary oracle)."""
    from ..functions.jpeg import encode_jpeg, encode_progressive_jpeg
    from ..functions.png import encode_png
    from ..functions.tiff import encode_tiff as _tiff_encode
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            w = 8 + (d % 5) * 4
            h = 8 + (d % 3) * 4
            if d % 17 == 5:
                payloads.append(b"NOTANIMAGE" + bytes(8))
            elif d % 17 == 9:
                # REAL lossless WebP (VP8L) — opaque RGB, so it lands in
                # the summary oracle's default (RGB/3-channel) branch
                rng = np.random.RandomState(d & 0x7FFFFFFF)
                img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
                from ..functions.webp import encode_webp_lossless
                payloads.append(encode_webp_lossless(img))
            elif d % 17 == 7:
                # REAL grayscale TIFF — LZW + horizontal predictor for
                # even doc_ids, PackBits for odd, alternating byte order
                rng = np.random.RandomState(d & 0x7FFFFFFF)
                img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
                payloads.append(_tiff_encode(
                    img, compression=5 if d % 2 == 0 else 32773,
                    predictor=2 if d % 2 == 0 else 1,
                    big_endian=(d % 4 == 1)))
            elif d % 17 == 11:
                rng = np.random.RandomState(d & 0x7FFFFFFF)
                payloads.append(encode_png(
                    rng.randint(0, 256, size=(h, w)).astype(np.uint8)))
            elif d % 17 == 13:
                rng = np.random.RandomState(d & 0x7FFFFFFF)
                img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
                # half the JPEG rows are PROGRESSIVE (SOF2) — same dims
                # and mode, so the summary oracle CASE is unchanged
                payloads.append(encode_progressive_jpeg(img)
                                if d % 2 == 0 else encode_jpeg(img))
            elif d % 17 == 15:
                # constant-value grayscale PNG: every pixel = d % 256,
                # so the FEATURE kernel's outputs (channel mean, one-hot
                # histogram) are pure doc_id arithmetic — the rows that
                # make image_features_summary SQL-checkable end-to-end
                # through a REAL PNG decode
                img = np.full((h, w), d % 256, np.uint8)
                payloads.append(encode_png(img))
            else:
                payloads.append(encode_fake_image(w, h, 3, seed=d))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "image": pa.array(payloads, pa.binary())})

    return ds.map_batches(make, batch_format="pyarrow")


def image_metadata(sf_dir: str) -> ray.data.Dataset:
    """The multimodal pipeline: synth binary column → decode actor pool."""
    return synth_images_from_documents(sf_dir).map_batches(
        DecodeImages, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4))


def image_metadata_summary(sf_dir: str) -> "object":
    """SQL-checkable projection of the decode pipeline: the synthetic
    corpus derives (status, width, height, channels, mode) from doc_id
    arithmetic, so DuckDB can recompute the EXPECTED metadata and the
    driver verifies the whole binary→decode dataflow by value."""
    ds = image_metadata(sf_dir)

    def proj(t: pa.Table) -> pa.Table:
        # int64 everywhere so the driver's value hash never sees an
        # int32-vs-BIGINT width wobble against the DuckDB oracle
        return pa.table({
            "doc_id": t["doc_id"],
            "status": t["status"],
            "width": t["width"].cast(pa.int64()),
            "height": t["height"].cast(pa.int64()),
            "channels": t["channels"].cast(pa.int64()),
            "mode": t["mode"],
        })

    return ds.map_batches(proj, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------------------- resize
def resize_fake_image(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize on the decoded pixel buffer (numpy
    index math — the kernel a PIL deployment would swap for
    ``Image.resize``). PNG in → PNG out; FAKEIMG1 in → FAKEIMG1 out."""
    from ..functions import jpeg as _jpeg
    from ..functions import png as _png
    arr, mode = _decode_image(payload)
    h, w, c = arr.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    out = arr[yi[:, None], xi[None, :], :]
    if _png.is_png(payload):
        return _png.encode_png(out[:, :, 0] if c == 1 else out)
    if _jpeg.is_jpeg(payload):
        return _jpeg.encode_jpeg(out[:, :, 0] if c == 1 else out)
    from ..functions import tiff as _tiff
    if _tiff.is_tiff(payload):
        return _tiff.encode_tiff(out[:, :, 0] if c == 1 else out,
                                 compression=5)
    from ..functions import webp as _webp
    if _webp.is_webp(payload):
        return _webp.encode_webp_lossless(out[:, :, 0] if c == 1 else out)
    return _HEADER.pack(MAGIC, out_w, out_h, c,
                        (mode + "\x00" * 4)[:4].encode()) + out.tobytes()


class ResizeImages:
    """Actor-pool resize stage: binary in → resized binary + dims out.
    Error rows pass through with null payloads."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, payloads, status, ws, hs = [], [], [], [], []
        for doc_id, payload in zip(t.column("doc_id").to_pylist(),
                                   t.column("image").to_pylist()):
            ids.append(doc_id)
            try:
                out = resize_fake_image(payload, self.out_w, self.out_h)
                payloads.append(out)
                status.append("ok")
                ws.append(self.out_w)
                hs.append(self.out_h)
            except Exception as e:  # noqa: BLE001 — bad payloads are rows
                payloads.append(None)
                status.append("error")
                ws.append(0)
                hs.append(0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "status": pa.array(status, pa.string()),
                         "width": pa.array(ws, pa.int32()),
                         "height": pa.array(hs, pa.int32()),
                         "image": pa.array(payloads, pa.binary())})


def image_resize_summary(sf_dir: str, out_w: int = 16, out_h: int = 16):
    """Synth → resize actor pool → (doc_id, status, width, height).
    SQL-checkable: ok rows come out at the target size, corrupt rows
    error — both derivable from doc_id arithmetic."""
    ds = synth_images_from_documents(sf_dir).map_batches(
        ResizeImages, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4))

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "status", "width", "height"])

    return ds.map_batches(proj, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------- feature extraction
class ImageFeatures:
    """Feature-extract stage: per-channel means + an 8-bin intensity
    histogram as a small embedding vector (real numpy kernels on the
    fake pixel buffer; a deployment swaps in a model forward pass —
    batched inference, actor-held weights)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, status, means, embs = [], [], [], []
        for doc_id, payload in zip(t.column("doc_id").to_pylist(),
                                   t.column("image").to_pylist()):
            ids.append(doc_id)
            try:
                arr, _mode = _decode_image(payload)
                ch_mean = arr.mean(axis=(0, 1))
                hist = np.histogram(arr, bins=8, range=(0, 256))[0]
                emb = (hist / max(hist.sum(), 1)).astype(np.float32)
                status.append("ok")
                means.append([round(float(x), 4) for x in ch_mean])
                embs.append(emb.tolist())
            except Exception:   # noqa: BLE001
                status.append("error")
                means.append([])
                embs.append([])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "status": pa.array(status, pa.string()),
                         "channel_means": pa.array(means,
                                                   pa.list_(pa.float64())),
                         "embedding": pa.array(embs,
                                               pa.list_(pa.float32()))})


def image_features(sf_dir: str) -> ray.data.Dataset:
    return synth_images_from_documents(sf_dir).map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4))


def image_features_summary(sf_dir: str) -> ray.data.Dataset:
    """SQL-checkable projection of the feature pipeline: histogram
    invariants (8 bins summing to 1) on every ok row, plus — on the
    planted constant-PNG rows (doc_id % 17 == 15) — the EXACT channel
    mean and the one-hot histogram's argmax bin, both pure doc_id
    arithmetic recomputed independently by the DuckDB oracle."""
    feats = image_features(sf_dir)

    def proj(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        means = t.column("channel_means")
        embs = t.column("embedding")
        n_ch = pc.list_value_length(means).to_numpy().astype(np.int64)
        emb_len = pc.list_value_length(embs).to_numpy().astype(np.int64)
        # segment sums / argmax over the flattened embedding lists
        flat = embs.combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        ptr = np.zeros(len(ids) + 1, np.int64)
        np.cumsum(emb_len, out=ptr[1:])
        cs = np.concatenate([[0.0], np.cumsum(flat)])
        emb_sum = np.round(cs[ptr[1:]] - cs[ptr[:-1]], 4)
        planted = ids % 17 == 15
        mean0 = np.full(len(ids), np.nan)
        top_bin = np.full(len(ids), -1, np.int64)
        for j in np.flatnonzero(planted):
            m = means[j].as_py()
            e = embs[j].as_py()
            if m:
                mean0[j] = round(m[0], 4)
            if e:
                top_bin[j] = int(np.argmax(e))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "status": t["status"],
            "n_channels": pa.array(n_ch),
            "emb_len": pa.array(emb_len),
            "emb_sum": pa.array(emb_sum, pa.float64()),
            "mean0": pa.array(np.where(planted, mean0, np.nan),
                              pa.float64()),
            "top_bin": pa.array(
                np.where(planted, top_bin, -1), pa.int64())})

    return feats.map_batches(proj, batch_format="pyarrow")


# ------------------------------------------------------ video frames
VIDEO_MAGIC = b"FAKEVID1"
_VHEADER = struct.Struct("<8sI")


def encode_fake_video(n_frames: int, width: int, height: int,
                      seed: int = 0) -> bytes:
    frames = [encode_fake_image(width, height, 3, seed=seed * 1000 + i)
              for i in range(n_frames)]
    return _VHEADER.pack(VIDEO_MAGIC, n_frames) + b"".join(frames)


class SampleFrames:
    """Frame-sample stage (flat explode): every ``stride``-th frame of
    each video becomes its own row carrying the frame image bytes —
    the fan-out shape a real ffmpeg deployment keeps (one row per
    sampled frame, payloads stay binary)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions import avi as _avi
        ids, frame_nos, imgs = [], [], []
        for doc_id, payload in zip(t.column("doc_id").to_pylist(),
                                   t.column("video").to_pylist()):
            try:
                if payload is None or len(payload) < _VHEADER.size:
                    raise ValueError("short payload")
                if _avi.is_avi(payload):
                    # real container demux: MJPEG frame payloads come
                    # out as individual JPEGs (decoded downstream by
                    # the in-repo T.81 codec)
                    frames, _meta = _avi.demux_avi_frames(payload)
                    for i in range(0, len(frames), self.stride):
                        ids.append(doc_id)
                        frame_nos.append(i)
                        imgs.append(frames[i])
                    continue
                magic, n = _VHEADER.unpack_from(payload, 0)
                if magic != VIDEO_MAGIC:
                    raise NotImplementedError("real video demux stubbed")
                off = _VHEADER.size
                for i in range(n):
                    _, w, h, c, _m = _HEADER.unpack_from(payload, off)
                    size = _HEADER.size + w * h * c
                    if i % self.stride == 0:
                        ids.append(doc_id)
                        frame_nos.append(i)
                        imgs.append(payload[off:off + size])
                    off += size
            except Exception:   # noqa: BLE001 — bad videos yield no frames
                continue
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "frame_no": pa.array(frame_nos, pa.int32()),
                         "image": pa.array(imgs, pa.binary())})


def encode_avi_video(n_frames: int, width: int, height: int,
                     seed: int = 0, fps: int = 25) -> bytes:
    """Real MJPEG-in-AVI payload: deterministic frames JPEG-encoded by
    the in-repo encoder, muxed by the in-repo RIFF writer."""
    from ..functions.avi import build_avi_mjpeg
    from ..functions.jpeg import encode_jpeg
    frames = []
    for i in range(n_frames):
        rng = np.random.RandomState((seed * 1000 + i) & 0x7FFFFFFF)
        frames.append(encode_jpeg(rng.randint(
            0, 256, (height, width, 3), dtype=np.uint8)))
    return build_avi_mjpeg(frames, width, height, fps=fps)


def synth_videos_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic video column: n_frames = 2 + doc_id % 4, 8×8.
    Every ``doc_id % 11 == 5`` row is a REAL MJPEG AVI (RIFF container
    + T.81 JPEG frames, fps = 10 + doc_id % 20); the rest stay in the
    FAKEVID fixture format — so the frame-sample stage exercises the
    real demux+decode path on a deterministic subset."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = [
            encode_avi_video(2 + d % 4, 8, 8, seed=d, fps=10 + d % 20)
            if d % 11 == 5 else
            encode_fake_video(2 + d % 4, 8, 8, seed=d)
            for d in ids]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "video": pa.array(payloads, pa.binary())})

    return ds.map_batches(make, batch_format="pyarrow")


class VideoMetadata:
    """Container-metadata probe (no frame decode): real RIFF parse for
    AVI rows, FAKEVID header read otherwise."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions import avi as _avi
        ids = t.column("doc_id").to_pylist()
        rows = {"doc_id": [], "container": [], "codec": [],
                "n_frames": [], "width": [], "height": [], "fps": []}
        for doc_id, payload in zip(ids, t.column("video").to_pylist()):
            try:
                if _avi.is_avi(payload):
                    m = _avi.parse_avi(payload)
                    vals = ("avi", m["codec"], m["n_frames"],
                            m["width"], m["height"], float(m["fps"]))
                elif payload[:8] == VIDEO_MAGIC:
                    _, n = _VHEADER.unpack_from(payload, 0)
                    _, w, h, _c, _m = _HEADER.unpack_from(
                        payload, _VHEADER.size)
                    vals = ("fakevid", "raw", n, w, h, 0.0)
                else:
                    raise ValueError("unknown container")
            except Exception:   # noqa: BLE001
                vals = ("error", "", 0, 0, 0, 0.0)
            rows["doc_id"].append(doc_id)
            for k, v in zip(("container", "codec", "n_frames", "width",
                             "height", "fps"), vals):
                rows[k].append(v)
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "container": pa.array(rows["container"], pa.string()),
            "codec": pa.array(rows["codec"], pa.string()),
            "n_frames": pa.array(rows["n_frames"], pa.int64()),
            "width": pa.array(rows["width"], pa.int64()),
            "height": pa.array(rows["height"], pa.int64()),
            "fps": pa.array(rows["fps"], pa.float64())})


def video_metadata(sf_dir: str) -> ray.data.Dataset:
    """Per-doc video container metadata — SQL-checkable: every field is
    doc_id arithmetic (the AVI rows' metadata round-trips through the
    real RIFF writer+parser, pinning both by value)."""
    return synth_videos_from_documents(sf_dir).map_batches(
        VideoMetadata, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4))


def video_frame_sample(sf_dir: str, stride: int = 2):
    """Synth videos → frame-sample explode → (doc_id, frame_no, width,
    height). SQL-checkable: sampled frame numbers are
    range(0, 2 + doc_id % 4, stride)."""
    ds = synth_videos_from_documents(sf_dir).map_batches(
        SampleFrames, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4))

    def proj(t: pa.Table) -> pa.Table:
        metas = [_decode_stub(p) for p in t.column("image").to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "frame_no": t["frame_no"],
                         "width": pa.array([m["width"] for m in metas],
                                           pa.int32()),
                         "height": pa.array([m["height"] for m in metas],
                                            pa.int32())})

    return ds.map_batches(proj, batch_format="pyarrow").to_pandas() \
        .sort_values(["doc_id", "frame_no"]).reset_index(drop=True)


# ------------------------------------------------------------- audio
AUDIO_MAGIC = b"FAKEAUD1"
_AHEADER = struct.Struct("<8sII")


def encode_fake_audio(sample_rate: int, n_samples: int,
                      seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    body = rng.randint(-32768, 32767, size=n_samples,
                       dtype=np.int64).astype(np.int16).tobytes()
    return _AHEADER.pack(AUDIO_MAGIC, sample_rate, n_samples) + body


class AudioMeta:
    """Audio decode/metadata stage: duration + RMS level. Real
    RIFF/WAVE PCM payloads decode through :mod:`..functions.wav`
    (8/16/24/32-bit PCM + float, chunk walking); the FAKEAUD1 fixture
    format stands in for compressed codecs (a deployment swaps in
    soundfile/ffmpeg for those)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.wav import decode_wav, is_wav
        ids, status, rates, nss, durs, rms = [], [], [], [], [], []
        for doc_id, payload in zip(t.column("doc_id").to_pylist(),
                                   t.column("audio").to_pylist()):
            ids.append(doc_id)
            try:
                if payload is None or len(payload) < 12:
                    raise ValueError("short payload")
                if is_wav(payload):
                    frames, rate = decode_wav(payload)
                    n = frames.shape[0]
                    pcm = frames.reshape(-1)
                else:
                    if len(payload) < _AHEADER.size:
                        raise ValueError("short payload")
                    magic, rate, n = _AHEADER.unpack_from(payload, 0)
                    if magic != AUDIO_MAGIC:
                        raise NotImplementedError(
                            "compressed audio codecs stubbed (WAV PCM "
                            "and FAKEAUD1 decode)")
                    pcm = np.frombuffer(payload[_AHEADER.size:], np.int16)
                    if len(pcm) != n:
                        raise ValueError("length mismatch")
                status.append("ok")
                rates.append(rate)
                nss.append(n)
                durs.append(round(n / rate, 4))
                rms.append(round(float(np.sqrt(np.mean(
                    pcm.astype(np.float64) ** 2))), 2) if n else 0.0)
            except Exception:   # noqa: BLE001
                status.append("error")
                rates.append(0)
                nss.append(0)
                durs.append(0.0)
                rms.append(0.0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "status": pa.array(status, pa.string()),
                         "sample_rate": pa.array(rates, pa.int32()),
                         "n_samples": pa.array(nss, pa.int64()),
                         "duration_s": pa.array(durs, pa.float64()),
                         "rms": pa.array(rms, pa.float64())})


def audio_metadata_summary(sf_dir: str):
    """Synth audio (rate 8000 or 16000 by doc_id parity, n_samples =
    4000 + (doc_id % 7) * 1000; every 23rd row (≡3) is a REAL RIFF/WAVE
    PCM payload, ≡7 is junk) → decode actor pool → SQL-checkable
    (doc_id, status, sample_rate, n_samples, duration_s) — the summary
    is codec-independent, so the oracle covers the WAV rows too."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def make(t: pa.Table) -> pa.Table:
        from ..functions.wav import encode_wav
        ids = t.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            rate = 8000 if d % 2 == 0 else 16000
            n = 4000 + (d % 7) * 1000
            if d % 23 == 7:
                payloads.append(b"NOTAUDIO")
            elif d % 23 == 3:
                # REAL RIFF/WAVE PCM rows (16-bit for d%4<2, 8-bit
                # otherwise) so the encoded-audio decode path runs
                # inside the standard pipeline, not just unit tests
                rng = np.random.RandomState(d & 0x7FFFFFFF)
                pcm = rng.randint(-32768, 32767, size=n,
                                  dtype=np.int64).astype(np.int16)
                payloads.append(encode_wav(
                    pcm, rate, bits=16 if d % 4 < 2 else 8))
            else:
                payloads.append(encode_fake_audio(rate, n, seed=d))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "audio": pa.array(payloads, pa.binary())})

    out = ds.map_batches(make, batch_format="pyarrow").map_batches(
        AudioMeta, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4))

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "status", "sample_rate", "n_samples",
                         "duration_s"])

    return out.map_batches(proj, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

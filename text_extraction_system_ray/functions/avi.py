"""Minimal AVI (RIFF) container codec — Motion-JPEG demux/mux.

Public-spec implementation (Microsoft AVI RIFF form: ``RIFF 'AVI '``
with ``LIST hdrl`` (``avih`` main header + ``LIST strl`` per stream:
``strh`` + ``strf``), ``LIST movi`` holding ``##dc``/``##db`` frame
chunks, and an ``idx1`` index).  Covers what a frame-sampling training
pipeline needs from a video container: stream geometry, frame rate,
frame count, and per-frame compressed payload extraction.  Frames are
MJPEG (one baseline JPEG per frame), decoded by the in-repo T.81 codec
(:mod:`.jpeg`) — no external media libraries.

The reference system has no video path at all; this extends the
multimodal column family (graft brief) the same way the PNG/JPEG/GIF
codecs extended image intake.  The writer exists so fixtures and the
synth corpus can build real AVI payloads deterministically; parser
errors raise ``ValueError`` like every other codec in this package.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

_U32 = struct.Struct("<I")


def is_avi(data: Optional[bytes]) -> bool:
    return (data is not None and len(data) >= 12
            and data[:4] == b"RIFF" and data[8:12] == b"AVI ")


# ------------------------------------------------------------- writer
def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + _U32.pack(len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def build_avi_mjpeg(frames: List[bytes], width: int, height: int,
                    fps: int = 25) -> bytes:
    """Assemble a standard single-stream MJPEG AVI from encoded JPEG
    frames (each must already be a valid JPEG of the stated size)."""
    usec = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, max(fps, 1), 0, len(frames),
        0, 0xFFFFFFFF, 0) + struct.pack("<4h", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) +
                 _list(b"strl", _chunk(b"strh", strh) +
                       _chunk(b"strf", strf)))
    movi_body = b""
    index = []
    for f in frames:
        # offset convention: from the start of the 'movi' list type
        # fourcc (offset 0 points at 'movi' itself, first chunk at 4)
        index.append((b"00dc", 0x10, 4 + len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", b"".join(
        ck + struct.pack("<III", fl, off, ln)
        for ck, fl, off, ln in index))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


# ------------------------------------------------------------- parser
def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for chunks in [pos, end)."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (ln,) = _U32.unpack_from(data, pos + 4)
        body = pos + 8
        if body + ln > len(data):
            raise ValueError("AVI: chunk overruns file")
        yield fourcc, body, ln
        pos = body + ln + (ln & 1)


def parse_avi(data: bytes) -> Dict:
    """Container metadata: ``{width, height, fps, n_frames, codec,
    frame_spans}`` where ``frame_spans`` is ``[(offset, length), ...]``
    into ``data`` for each video frame chunk, in stream order."""
    if not is_avi(data):
        raise ValueError("not an AVI file")
    (riff_len,) = _U32.unpack_from(data, 4)
    if 8 + riff_len > len(data):
        raise ValueError("AVI: RIFF size overruns file")
    end = 8 + riff_len
    meta: Dict = {"codec": None, "fps": None, "width": None,
                  "height": None, "n_frames": 0}
    spans: List[Tuple[int, int]] = []
    for fourcc, body, ln in _walk(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[body:body + 4]
        if ltype == b"hdrl":
            _parse_hdrl(data, body + 4, body + ln, meta)
        elif ltype == b"movi":
            for cc, b2, l2 in _walk(data, body + 4, body + ln):
                # '##dc' compressed / '##db' uncompressed video frame
                if cc[2:4] in (b"dc", b"db"):
                    spans.append((b2, l2))
    meta["frame_spans"] = spans
    if meta["n_frames"] == 0:
        meta["n_frames"] = len(spans)
    if len(spans) != meta["n_frames"]:
        # trust the movi list (some muxers leave dwTotalFrames stale)
        meta["n_frames"] = len(spans)
    return meta


def _parse_hdrl(data: bytes, pos: int, end: int, meta: Dict) -> None:
    for fourcc, body, ln in _walk(data, pos, end):
        if fourcc == b"avih" and ln >= 40:
            vals = struct.unpack_from("<10I", data, body)
            meta["n_frames"] = vals[4]
            meta["width"], meta["height"] = vals[8], vals[9]
        elif fourcc == b"LIST" and data[body:body + 4] == b"strl":
            for cc, b2, l2 in _walk(data, body + 4, body + ln):
                if cc == b"strh" and l2 >= 48 and \
                        data[b2:b2 + 4] == b"vids":
                    meta["codec"] = data[b2 + 4:b2 + 8].decode(
                        "ascii", "replace")
                    scale, rate = struct.unpack_from("<II", data,
                                                     b2 + 20)
                    if scale:
                        meta["fps"] = rate / scale


def demux_avi_frames(data: bytes) -> Tuple[List[bytes], Dict]:
    """All video frame payloads + container metadata."""
    meta = parse_avi(data)
    frames = [data[o:o + ln] for o, ln in meta["frame_spans"]]
    return frames, meta

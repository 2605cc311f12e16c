"""RIFF/WAVE PCM codec — pure stdlib + numpy.

The reference delegates audio handling to external tooling; webtext
payload audio here is decoded directly against the public RIFF/WAVE
container spec (IBM/Microsoft Multimedia Programming Interface and
Data Specifications 1.0, 1991) so the multimodal audio stage runs on
real bitstreams rather than the FAKEAUD1 fixture format.

Supported: chunk walking with even-byte padding, ``fmt `` formats
1 (integer PCM: 8-bit unsigned, 16/24/32-bit signed little-endian)
and 3 (IEEE float32/float64), any channel count, extra chunks
(LIST/INFO/fact/cue) skipped. Output is normalized to int16 frames.
"""
from __future__ import annotations

import struct

import numpy as np


def is_wav(payload: bytes) -> bool:
    return (payload is not None and len(payload) >= 12
            and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE")


def _iter_chunks(payload: bytes):
    """Yield (fourcc, start, size) for each RIFF sub-chunk; chunks are
    word-aligned (odd sizes carry one pad byte, spec p.11)."""
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > len(payload):
            size = max(0, len(payload) - body)   # tolerate truncation of
            yield cc, body, size                  # the final chunk only
            return
        yield cc, body, size
        pos = body + size + (size & 1)


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE payload → ``(frames, sample_rate)`` where
    ``frames`` is an int16 ndarray of shape ``(n_frames, n_channels)``.

    Raises ``ValueError`` on junk / truncated / non-PCM-or-float
    payloads (compression formats like ADPCM, MP3-in-WAV and extensible
    GUID formats are rejected, not mis-decoded).
    """
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    for cc, start, size in _iter_chunks(payload):
        if cc == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", payload, start)
        elif cc == b"data" and data is None:
            data = payload[start:start + size]
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("bad fmt fields")
    if audio_format == 1:                               # integer PCM
        if bits == 8:
            raw = np.frombuffer(data, np.uint8)
            pcm = (raw.astype(np.int16) - 128) << 8
        elif bits == 16:
            raw = data[:len(data) & ~1]
            pcm = np.frombuffer(raw, "<i2").astype(np.int16)
        elif bits == 24:
            raw = data[:len(data) - len(data) % 3]
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            full = (b[:, 0].astype(np.int32)
                    | (b[:, 1].astype(np.int32) << 8)
                    | (b[:, 2].astype(np.int32) << 16))
            full = np.where(full >= 1 << 23, full - (1 << 24), full)
            pcm = (full >> 8).astype(np.int16)
        elif bits == 32:
            raw = data[:len(data) & ~3]
            pcm = (np.frombuffer(raw, "<i4") >> 16).astype(np.int16)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:                             # IEEE float
        if bits == 32:
            raw = data[:len(data) & ~3]
            f = np.frombuffer(raw, "<f4").astype(np.float64)
        elif bits == 64:
            raw = data[:len(data) & ~7]
            f = np.frombuffer(raw, "<f8")
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
        pcm = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    else:
        raise ValueError(f"unsupported WAVE format code {audio_format}")
    n_frames = len(pcm) // n_channels
    if block_align and block_align != n_channels * (bits // 8):
        raise ValueError("block_align inconsistent with fmt")
    return pcm[:n_frames * n_channels].reshape(n_frames, n_channels), \
        int(sample_rate)


def encode_wav(frames: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode int16 frames (``(n,)`` mono or ``(n, ch)``) as a
    canonical PCM RIFF/WAVE payload at the given bit depth (8 or 16)."""
    frames = np.asarray(frames, np.int16)
    if frames.ndim == 1:
        frames = frames[:, None]
    n_channels = frames.shape[1]
    if bits == 16:
        body = frames.astype("<i2").tobytes()
    elif bits == 8:
        body = ((frames.astype(np.int32) >> 8) + 128).astype(np.uint8) \
            .tobytes()
    else:
        raise ValueError("encode_wav supports 8- or 16-bit PCM")
    block_align = n_channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body
              + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

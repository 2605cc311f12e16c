"""RIFF/WAVE PCM codec tests — hand-assembled containers, round trips,
chunk walking, bit depths, and the AudioMeta integration.

Reference parity note: the reference system delegates audio to external
tools; this codec implements the public RIFF/WAVE spec directly so the
multimodal audio stage runs on real bitstreams.
"""
import struct

import numpy as np
import pyarrow as pa
import pytest

from text_extraction_system_ray.functions.wav import (
    decode_wav, encode_wav, is_wav)


def test_roundtrip_mono_16():
    rng = np.random.RandomState(7)
    pcm = rng.randint(-32768, 32767, size=999, dtype=np.int64) \
        .astype(np.int16)
    payload = encode_wav(pcm, 8000)
    assert is_wav(payload)
    frames, rate = decode_wav(payload)
    assert rate == 8000
    assert frames.shape == (999, 1)
    np.testing.assert_array_equal(frames[:, 0], pcm)


def test_roundtrip_stereo_16():
    rng = np.random.RandomState(3)
    pcm = rng.randint(-32768, 32767, size=(40, 2), dtype=np.int64) \
        .astype(np.int16)
    frames, rate = decode_wav(encode_wav(pcm, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(frames, pcm)


def test_8bit_quantized_roundtrip():
    pcm = np.array([-32768, -256, 0, 255, 32512], np.int16)
    frames, _ = decode_wav(encode_wav(pcm, 8000, bits=8))
    # 8-bit keeps the top byte: decode = (x >> 8) << 8
    np.testing.assert_array_equal(
        frames[:, 0], (pcm.astype(np.int32) >> 8 << 8).astype(np.int16))


def _wav_container(fmt_body: bytes, data: bytes, extra: bytes = b"") -> bytes:
    chunks = (b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
              + extra
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_extra_chunks_skipped_and_odd_padding():
    # LIST chunk with an ODD size between fmt and data must be skipped
    # with its pad byte (word alignment, spec p.11)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    data = np.array([100, -100, 7], "<i2").tobytes()
    frames, rate = decode_wav(_wav_container(fmt, data, extra=lst))
    assert rate == 8000
    np.testing.assert_array_equal(frames[:, 0], [100, -100, 7])


def test_24bit_pcm():
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 48000, 3, 24)
    # samples 0x123456 (pos) and -0x123456 stored little-endian 3-byte
    vals = [0x123456, -0x123456]
    data = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    frames, _ = decode_wav(_wav_container(fmt, data))
    np.testing.assert_array_equal(frames[:, 0],
                                  [0x123456 >> 8, -0x123456 >> 8])


def test_float32_wave():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    data = np.array([0.5, -1.0, 0.0], "<f4").tobytes()
    frames, _ = decode_wav(_wav_container(fmt, data))
    np.testing.assert_array_equal(frames[:, 0], [16384, -32767, 0])


@pytest.mark.parametrize("payload", [
    b"",
    b"RIFF\x00\x00\x00\x00WAVE",                    # no chunks
    b"NOTWAVEATALL" + bytes(20),
    b"RIFF" + struct.pack("<I", 30) + b"AVI " + bytes(22),  # wrong form
])
def test_junk_rejected(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_compressed_format_rejected_not_misdecoded():
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)   # ADPCM
    with pytest.raises(ValueError):
        decode_wav(_wav_container(fmt, bytes(64)))


def test_audio_meta_stage_decodes_wav(ray_session):
    from text_extraction_system_ray.pipelines.multimodal import AudioMeta
    pcm = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 20000) \
        .astype(np.int16)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "audio": pa.array([encode_wav(pcm, 16000), b"junk!" * 4],
                                    pa.binary())})
    out = AudioMeta()(t)
    assert out.column("status").to_pylist() == ["ok", "error"]
    assert out.column("sample_rate").to_pylist()[0] == 16000
    assert out.column("n_samples").to_pylist()[0] == 4000
    assert out.column("duration_s").to_pylist()[0] == 0.25
    expect_rms = round(float(np.sqrt(np.mean(
        pcm.astype(np.float64) ** 2))), 2)
    assert out.column("rms").to_pylist()[0] == expect_rms

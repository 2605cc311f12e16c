"""AVI (RIFF) MJPEG container: mux→demux round-trip, header parity,
frame decode through the in-repo JPEG codec, junk rejection."""
import numpy as np
import pytest

from text_extraction_system_ray.functions import avi as A
from text_extraction_system_ray.functions.jpeg import (decode_jpeg,
                                                       encode_jpeg)


def _frames(n, w=24, h=16, seed=0):
    rng = np.random.RandomState(seed)
    return [encode_jpeg(rng.randint(0, 256, (h, w, 3), np.uint8))
            for _ in range(n)]


def test_roundtrip_bytes_and_meta():
    fr = _frames(4)
    data = A.build_avi_mjpeg(fr, 24, 16, fps=12)
    out, meta = A.demux_avi_frames(data)
    assert out == fr
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["codec"] == "MJPG" and meta["fps"] == 12.0
    assert meta["n_frames"] == 4


def test_frames_decode():
    fr = _frames(2, w=8, h=8, seed=3)
    out, _ = A.demux_avi_frames(A.build_avi_mjpeg(fr, 8, 8))
    for f in out:
        assert decode_jpeg(f).shape == (8, 8, 3)


def test_odd_length_frame_padding():
    """A frame with odd byte length forces the RIFF pad byte; chunks
    after it must still align."""
    fr = _frames(3, w=8, h=8, seed=1)
    odd = fr[0] + b"\x00" if len(fr[0]) % 2 == 0 else fr[0]
    assert len(odd) % 2 == 1
    seq = [odd, fr[1], fr[2]]
    out, meta = A.demux_avi_frames(A.build_avi_mjpeg(seq, 8, 8))
    assert out == seq and meta["n_frames"] == 3


def test_empty_video():
    out, meta = A.demux_avi_frames(A.build_avi_mjpeg([], 8, 8))
    assert out == [] and meta["n_frames"] == 0


@pytest.mark.parametrize("junk", [
    b"", b"RIFF", b"RIFF1234AVI~", b"RIFF\xff\xff\xff\xffAVI ",
    b"not a riff file at all--------",
])
def test_junk_rejected(junk):
    with pytest.raises(ValueError):
        A.parse_avi(junk)


def test_truncated_chunk_rejected():
    data = A.build_avi_mjpeg(_frames(2, w=8, h=8), 8, 8)
    # keep the RIFF size field but cut the body: inner walk overruns
    cut = bytearray(data[: len(data) // 2])
    with pytest.raises(ValueError):
        A.parse_avi(bytes(cut))

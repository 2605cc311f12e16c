"""Progressive JPEG (SOF2) decode tests — spec-anchored on HAND-BUILT
bitstreams (T.81 Annex G: spectral selection, successive approximation,
EOB runs) plus the progressive==baseline reconstruction property."""
import struct

import numpy as np
import pytest

from text_extraction_system_ray.functions.jpeg import (
    STD_AC_LUMA, STD_DC_LUMA, STD_LUMA_Q, ZIGZAG, _dht_body,
    _huff_encode_tables, _pack_bits, _seg, decode_jpeg, encode_jpeg,
    encode_progressive_jpeg, jpeg_dims)

DC = _huff_encode_tables(STD_DC_LUMA)
AC = _huff_encode_tables(STD_AC_LUMA)


def _flat_q():
    return np.ones(64, np.int64)


def _hdr(h, w, qtab):
    blob = b"\xff\xd8"
    blob += _seg(0xDB, bytes([0]) + bytes(int(x) for x in qtab))
    blob += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    blob += _seg(0xC4, _dht_body(0, 0, STD_DC_LUMA))
    blob += _seg(0xC4, _dht_body(1, 0, STD_AC_LUMA))
    return blob


def _sos(ss, se, ah, al):
    return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))


def _idct_independent(zz):
    """Direct 2-D IDCT from the cosine definition (independent of the
    decoder's matrix formulation)."""
    nat = np.zeros(64)
    nat[ZIGZAG] = zz
    blk = nat.reshape(8, 8)
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else 0.5
                    cv = np.sqrt(0.125) if v == 0 else 0.5
                    s += cu * cv * blk[u, v] * \
                        np.cos((2 * y + 1) * u * np.pi / 16) * \
                        np.cos((2 * x + 1) * v * np.pi / 16)
            out[y, x] = s
    return np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)


def test_dc_successive_approximation_constant_gray():
    """DC=6 split as first pass (Al=1, codes 6>>1=3) + refinement bit
    (6&1=0): the reconstruction must be the analytic constant block."""
    q = _flat_q()
    blob = _hdr(8, 8, q)
    # scan 1: DC first, Al=1 — diff 3 → size 2, bits '11'
    blob += _sos(0, 0, 0, 1) + _pack_bits([DC[2], (0b11, 2)])
    # scan 2: DC refinement Ah=1→Al=0 — low bit 0
    blob += _sos(0, 0, 1, 0) + _pack_bits([(0, 1)])
    # scan 3: AC band all-zero — EOB
    blob += _sos(1, 63, 0, 0) + _pack_bits([AC[0x00]])
    blob += b"\xff\xd9"
    img = decode_jpeg(blob)
    zz = np.zeros(64)
    zz[0] = 6
    want = _idct_independent(zz)
    assert np.array_equal(img, want)
    assert len(np.unique(img)) == 1          # constant block


def test_ac_successive_approximation_and_new_nonzero():
    """Hand-built three-scan stream: coefficients zz=[6,5,-3,0...,1@10].
    AC first pass at Al=1 codes (2, -1, ·); the refinement pass emits
    the k=10 newly-nonzero (run over 7 zero-history positions) plus
    correction bits for k=1 and k=2 — exactly T.81 G.1.2.3 order."""
    q = _flat_q()
    blob = _hdr(8, 8, q)
    # DC first at Al=0: diff 6 → size 3, bits '110'
    blob += _sos(0, 0, 0, 0) + _pack_bits([DC[3], (0b110, 3)])
    # AC first pass Al=1: k=1 → +2 (s=2, bits '10'); k=2 → -1 (s=1,
    # bits '0'); k=10 → 0 at this precision; EOB
    blob += _sos(1, 63, 0, 1) + _pack_bits([
        AC[0x02], (0b10, 2), AC[0x01], (0, 1), AC[0x00]])
    # AC refinement Ah=1 Al=0: symbol (r=7, s=1) + sign bit 1, then the
    # correction bits for nonzero-history k=1 (→5) and k=2 (→-3) read
    # while passing, then EOB
    blob += _sos(1, 63, 1, 0) + _pack_bits([
        AC[0x71], (1, 1), (1, 1), (1, 1), AC[0x00]])
    blob += b"\xff\xd9"
    img = decode_jpeg(blob)
    zz = np.zeros(64)
    zz[0], zz[1], zz[2], zz[10] = 6, 5, -3, 1
    want = _idct_independent(zz)
    assert np.array_equal(img, want)


def test_eob_run_spans_blocks():
    """A 32×8 image (4 blocks): the AC first scan opens with an EOB run
    of 4 (symbol r=2 + 2 extension bits '00' → 3+0 more blocks); DC
    values differ per block so the output is 4 distinct constant
    blocks. EOBn symbols (0x20) don't exist in the baseline Annex K AC
    table, so this scan carries its own two-symbol DHT."""
    q = _flat_q()
    eob_spec = ([2] + [0] * 15, [0x20, 0x00])   # two 1-bit codes
    eob_tab = _huff_encode_tables(eob_spec)
    blob = b"\xff\xd8"
    blob += _seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
    blob += _seg(0xC2, struct.pack(">BHHB", 8, 8, 32, 1) +
                 bytes([1, 0x11, 0]))
    blob += _seg(0xC4, _dht_body(0, 0, STD_DC_LUMA))
    blob += _seg(0xC4, _dht_body(1, 0, eob_spec))
    dc_bits = []
    pred = 0
    vals = [8, 16, -8, 0]
    for v in vals:
        diff = v - pred
        pred = v
        t = abs(diff).bit_length()
        bits = diff if diff >= 0 else diff + (1 << t) - 1
        dc_bits.append(DC[t])
        if t:
            dc_bits.append((bits, t))
    blob += _sos(0, 0, 0, 0) + _pack_bits(dc_bits)
    blob += _sos(1, 63, 0, 0) + _pack_bits([eob_tab[0x20], (0b00, 2)])
    blob += b"\xff\xd9"
    img = decode_jpeg(blob)
    assert img.shape == (8, 32)
    for bi, v in enumerate(vals):
        zz = np.zeros(64)
        zz[0] = v
        want = _idct_independent(zz)
        assert np.array_equal(img[:, bi * 8:bi * 8 + 8], want), bi


def test_progressive_encoder_equals_baseline_reconstruction():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(21, 34), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_progressive_jpeg(img))
    assert np.array_equal(base, prog)
    # lossy round-trip stays bounded
    assert np.abs(prog.astype(int) - img.astype(int)).mean() < 24


def test_progressive_dims_and_smooth_roundtrip():
    yy, xx = np.mgrid[0:16, 0:24]
    img = (100 + 3 * np.sin(yy / 3) + 4 * np.cos(xx / 5)).astype(np.uint8)
    blob = encode_progressive_jpeg(img)
    assert jpeg_dims(blob) == (24, 16)
    out = decode_jpeg(blob)
    assert out.shape == (16, 24)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_progressive_decode_through_surfaces():
    """SOF2 payloads flow through the multimodal decode + raster entry
    points exactly like baseline JPEG."""
    from text_extraction_system_ray.functions.raster import decode_l_image
    from text_extraction_system_ray.pipelines.multimodal import _decode_image
    img = np.full((10, 12), 90, np.uint8)
    blob = encode_progressive_jpeg(img)
    arr, mode = _decode_image(blob)
    assert mode == "L" and arr.shape[:2] == (10, 12)
    gray = decode_l_image(blob)
    assert gray.shape == (10, 12)
    assert abs(int(gray.mean()) - 90) <= 2


def test_arithmetic_and_hierarchical_still_rejected():
    blob = b"\xff\xd8" + _seg(0xC9, struct.pack(">BHHB", 8, 8, 8, 1) +
                              bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        decode_jpeg(blob + b"\xff\xd9")

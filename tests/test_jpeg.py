"""Baseline JPEG codec tests (functions/jpeg.py).

The decoder is anchored on a HAND-BUILT bitstream using published
canonical Huffman codes (not this repo's encoder), with an analytically
known decoded output — plus bounded-error round-trips through the
minimal encoder and decode-path integration with the raster kernels."""
import struct

import numpy as np
import pytest

from text_extraction_system_ray.functions.jpeg import (
    STD_AC_LUMA, STD_DC_LUMA, decode_jpeg, encode_jpeg, is_jpeg)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc, th, spec):
    bits, huffval = spec
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(huffval))


def test_hand_built_dc_only_block():
    """8×8 grayscale, quant table all ones, single DC coefficient D=64:
    spatial = 128 + D/8 = 136 everywhere. Entropy bits hand-assembled
    from the PUBLISHED canonical codes of the Annex K.3 tables
    (DC cat7 = '11110', magnitude 64 = '1000000', AC EOB = '1010'),
    so the decoder is checked against the spec, not our encoder."""
    blob = b"\xff\xd8"
    blob += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    blob += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) +
                 bytes([1, 0x11, 0]))
    blob += _dht(0, 0, STD_DC_LUMA)
    blob += _dht(1, 0, STD_AC_LUMA)
    blob += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # 11110 1000000 1010 -> 0xF4 0x0A
    blob += bytes([0xF4, 0x0A])
    blob += b"\xff\xd9"
    out = decode_jpeg(blob)
    assert out.shape == (8, 8)
    assert (out == 136).all(), out


def test_constant_images_exact():
    for val in (0, 60, 128, 200, 255):
        img = np.full((16, 24), val, np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape
        # DC quant step 16 -> worst-case DC error 8
        assert np.abs(out.astype(int) - int(val)).max() <= 8


def test_gray_roundtrip_bounded_error():
    yy, xx = np.mgrid[0:32, 0:40]
    img = (128 + 60 * np.sin(yy / 6.0) * np.cos(xx / 7.0)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0


def test_rgb_roundtrip_bounded_error():
    yy, xx = np.mgrid[0:24, 0:24]
    rgb = np.stack([(128 + 80 * np.sin(yy / 5.0)).astype(np.uint8),
                    (128 + 80 * np.cos(xx / 6.0)).astype(np.uint8),
                    np.full((24, 24), 90, np.uint8)], axis=2)
    out = decode_jpeg(encode_jpeg(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 8.0


def test_non_multiple_of_8_dims():
    img = np.arange(13 * 21, dtype=np.uint8).reshape(13, 21) % 200
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (13, 21)


def test_unsupported_codings_gated_junk_is_valueerror():
    # arithmetic-coded (SOF9) -> NotImplementedError, clearly gated
    # (SOF2 progressive is SUPPORTED as of r4 — tests/test_jpeg_progressive.py)
    blob = b"\xff\xd8" + _seg(0xC9, struct.pack(">BHHB", 8, 8, 8, 1) +
                              bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        decode_jpeg(blob)
    # SOF2 with no scans at all is malformed, not gated
    blob2 = b"\xff\xd8" + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) +
                               bytes([1, 0x11, 0]))
    with pytest.raises(ValueError):
        decode_jpeg(blob2)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")          # no SOS
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG")
    assert is_jpeg(b"\xff\xd8\xff\xe0") and not is_jpeg(b"\x89PNG")


def test_jpeg_flows_through_raster_kernels():
    """decode_l_image + skew detection accept a real JPEG — the same
    integration the PNG path has (M6/M10 encoded-bitmap closure)."""
    from text_extraction_system_ray.functions.raster import (
        decode_l_image, detect_rotation_projection, rotate_image_array)
    img = np.full((200, 150), 255, np.uint8)
    for y0 in range(20, 180, 20):
        img[y0:y0 + 8, 15:135] = 0
    skewed = rotate_image_array(img, 5.0)
    data = encode_jpeg(skewed)
    dec = decode_l_image(data)
    assert dec.shape == skewed.shape
    got = detect_rotation_projection(dec)
    assert abs(got - 5.0) <= 0.6, got


def test_jpeg_through_multimodal_decode():
    from text_extraction_system_ray.pipelines.multimodal import _decode_stub
    img = np.full((12, 20), 99, np.uint8)
    m = _decode_stub(encode_jpeg(img))
    assert (m["width"], m["height"], m["channels"]) == (20, 12, 1)
    assert m["mode"] == "L"


def test_hand_built_420_subsampled_mcu():
    """16×16 constant-color 4:2:0 JPEG, one MCU = 4 Y + 1 Cb + 1 Cr
    DC-only blocks (quant all ones). Expected output is analytic:
    Y = 128 + Dy/8, Cb/Cr likewise, through the JFIF RGB formula.
    Exercises the subsampled-MCU layout + chroma upsampling the 4:4:4
    encoder can't produce."""
    from text_extraction_system_ray.functions.jpeg import (
        STD_AC_CHROMA, STD_DC_CHROMA, _huff_encode_tables)
    dc_l = _huff_encode_tables(STD_DC_LUMA)
    ac_l = _huff_encode_tables(STD_AC_LUMA)
    dc_c = _huff_encode_tables(STD_DC_CHROMA)
    ac_c = _huff_encode_tables(STD_AC_CHROMA)

    def magnitude(v):
        t = abs(v).bit_length() if v else 0
        return t, (v if v >= 0 else v + (1 << t) - 1)

    bits = []

    def emit_block(diff, dc_tab, ac_tab):
        t, mag = magnitude(diff)
        bits.append(dc_tab[t])
        if t:
            bits.append((mag, t))
        bits.append(ac_tab[0x00])               # EOB

    dy, dcb, dcr = 64, -32, 16                   # DC values per plane
    emit_block(dy, dc_l, ac_l)                   # Y block 1: diff = 64
    for _ in range(3):                           # Y blocks 2-4: diff 0
        emit_block(0, dc_l, ac_l)
    emit_block(dcb, dc_c, ac_c)
    emit_block(dcr, dc_c, ac_c)

    acc, nacc, payload = 0, 0, bytearray()
    for val, nb in bits:
        acc = (acc << nb) | (val & ((1 << nb) - 1))
        nacc += nb
        while nacc >= 8:
            nacc -= 8
            b = (acc >> nacc) & 0xFF
            payload.append(b)
            if b == 0xFF:
                payload.append(0)
    if nacc:
        b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        payload.append(b)
        if b == 0xFF:
            payload.append(0)

    blob = b"\xff\xd8"
    blob += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    blob += _seg(0xDB, bytes([1]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    blob += _seg(0xC0, sof)
    blob += _dht(0, 0, STD_DC_LUMA) + _dht(1, 0, STD_AC_LUMA)
    from text_extraction_system_ray.functions.jpeg import (
        STD_AC_CHROMA as _acc_, STD_DC_CHROMA as _dcc_)
    blob += _dht(0, 1, _dcc_) + _dht(1, 1, _acc_)
    blob += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    blob += bytes(payload) + b"\xff\xd9"

    out = decode_jpeg(blob)
    assert out.shape == (16, 16, 3)
    y = 128 + dy / 8.0
    cb = 128 + dcb / 8.0
    cr = 128 + dcr / 8.0
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    assert np.abs(out[:, :, 0].astype(int) - exp_r).max() <= 1
    assert np.abs(out[:, :, 1].astype(int) - exp_g).max() <= 1
    assert np.abs(out[:, :, 2].astype(int) - exp_b).max() <= 1


def test_restart_markers():
    """DRI=1 with RST0/RST1 between three DC-only MCUs: the decoder must
    resync the bit reader AND reset the DC predictor at each restart
    (each MCU's diff is absolute again)."""
    from text_extraction_system_ray.functions.jpeg import (
        _huff_encode_tables)
    dc = _huff_encode_tables(STD_DC_LUMA)
    ac = _huff_encode_tables(STD_AC_LUMA)

    def block_bits(diff):
        t = abs(diff).bit_length() if diff else 0
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        bits = [dc[t]]
        if t:
            bits.append((mag, t))
        bits.append(ac[0x00])
        return bits

    def pack(bits):
        acc, nacc, out = 0, 0, bytearray()
        for val, nb in bits:
            acc = (acc << nb) | (val & ((1 << nb) - 1))
            nacc += nb
            while nacc >= 8:
                nacc -= 8
                b = (acc >> nacc) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0)
        if nacc:
            b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0)
        return bytes(out)

    # 24x8 gray: MCU DCs 64, 32, -64 (absolute after each restart)
    payload = pack(block_bits(64)) + b"\xff\xd0" + \
        pack(block_bits(32)) + b"\xff\xd1" + pack(block_bits(-64))
    blob = b"\xff\xd8"
    blob += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    blob += _seg(0xC0, struct.pack(">BHHB", 8, 8, 24, 1) +
                 bytes([1, 0x11, 0]))
    blob += _dht(0, 0, STD_DC_LUMA) + _dht(1, 0, STD_AC_LUMA)
    blob += _seg(0xDD, struct.pack(">H", 1))
    blob += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blob += payload + b"\xff\xd9"
    out = decode_jpeg(blob)
    assert out.shape == (8, 24)
    assert (out[:, :8] == 136).all()       # 128 + 64/8
    assert (out[:, 8:16] == 132).all()     # 128 + 32/8
    assert (out[:, 16:] == 120).all()      # 128 - 64/8

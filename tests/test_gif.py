"""GIF decoder tests — anchored on hand-assembled LZW streams whose
decoded pixels are known from the spec's code semantics (literal codes
after CLEAR, the KwKwK case, code-width growth), not on any encoder."""
import numpy as np
import pytest

from text_extraction_system_ray.functions.gif import (decode_gif, gif_gray,
                                                      is_gif)


def _pack_codes_lsb(codes, widths):
    """LSB-first variable-width bit packing (the GIF byte order)."""
    acc = 0
    nacc = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc |= (c & ((1 << w) - 1)) << nacc
        nacc += w
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(w, h, palette, lzw_min, code_bytes, interlace=False):
    n = len(palette)
    size_field = max((n - 1).bit_length() - 1, 0)
    blob = b"GIF89a"
    blob += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    blob += bytes([0x80 | size_field, 0, 0])
    table = bytearray()
    for rgb in palette:
        table.extend(rgb)
    table.extend(b"\x00" * (3 * ((2 << size_field) - n)))
    blob += bytes(table)
    blob += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + \
        h.to_bytes(2, "little") + bytes([0x40 if interlace else 0])
    blob += bytes([lzw_min])
    for i in range(0, len(code_bytes), 255):
        chunk = code_bytes[i:i + 255]
        blob += bytes([len(chunk)]) + chunk
    blob += b"\x00\x3b"
    return blob


PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def test_literal_codes_roundtrip():
    """CLEAR between every literal keeps the code width fixed — the
    decoded pixels are exactly the literal indices (spec semantics,
    independent of any encoder)."""
    pixels = [0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 1, 2]
    clear, end = 4, 5
    codes, widths = [clear], [3]
    for p in pixels:
        codes += [p, clear]
        widths += [3, 3]
    codes.append(end)
    widths.append(3)
    data = _gif(4, 3, PALETTE, 2, _pack_codes_lsb(codes, widths))
    assert is_gif(data)
    out = decode_gif(data)
    assert out.shape == (3, 4, 3)
    exp = np.array([PALETTE[p] for p in pixels], np.uint8).reshape(3, 4, 3)
    assert (out == exp).all()


def test_kwkwk_case_and_table_growth():
    """Stream CLEAR,0,6 — code 6 is the not-yet-defined next entry, so
    the decoder must emit prev + prev[0] (spec KwKwK rule): pixels
    A, A, A."""
    codes = [4, 0, 6, 5]
    widths = [3, 3, 3, 3]
    data = _gif(3, 1, PALETTE, 2, _pack_codes_lsb(codes, widths))
    out = decode_gif(data)
    exp = np.array([PALETTE[0]] * 3, np.uint8).reshape(1, 3, 3)
    assert (out == exp).all()


def test_sequence_codes():
    """CLEAR,0,1,6 — after emitting 0 then 1 the table holds 6=(0,1);
    code 6 emits those two pixels: A,B,A,B."""
    codes = [4, 0, 1, 6, 5]
    widths = [3, 3, 3, 3, 3]
    data = _gif(4, 1, PALETTE, 2, _pack_codes_lsb(codes, widths))
    out = decode_gif(data)
    exp = np.array([PALETTE[0], PALETTE[1], PALETTE[0], PALETTE[1]],
                   np.uint8).reshape(1, 4, 3)
    assert (out == exp).all()


def test_interlaced_rows():
    """8 rows of distinct colors, interlaced: the stream carries rows in
    pass order 0,4,2,6,1,3,5,7 and the decoder must un-shuffle them."""
    palette = [(i * 30, 0, 0) for i in range(8)]
    pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
    pixels = []
    for r in pass_order:
        pixels += [r, r]                      # width 2, one color per row
    clear, end = 8, 9
    codes, widths = [clear], [4]
    for p in pixels:
        codes += [p, clear]
        widths += [4, 4]
    codes.append(end)
    widths.append(4)
    data = _gif(2, 8, palette, 3, _pack_codes_lsb(codes, widths),
                interlace=True)
    out = decode_gif(data)
    for r in range(8):
        assert tuple(out[r, 0]) == palette[r], r


def test_junk_and_gray():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + bytes(32))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    data = _gif(2, 1, PALETTE, 2,
                _pack_codes_lsb([4, 0, 4, 1, 5], [3] * 5))
    g = gif_gray(data)
    assert g.shape == (1, 2)


def test_gif_through_decode_surfaces():
    from text_extraction_system_ray.functions.raster import decode_l_image
    from text_extraction_system_ray.pipelines.multimodal import _decode_stub
    data = _gif(2, 2, PALETTE, 2,
                _pack_codes_lsb([4, 0, 4, 1, 4, 2, 4, 3, 5], [3] * 9))
    m = _decode_stub(data)
    assert (m["width"], m["height"], m["channels"]) == (2, 2, 3)
    assert m["mode"] == "RGB"
    assert decode_l_image(data).shape == (2, 2)


def test_code_width_growth():
    """Literals without intervening CLEARs grow the table; when the next
    free code reaches 2^width the reader must widen: codes 0,1,0,1 at
    3 bits fill entries 6,7 and entry 8 triggers width 4 for the
    remaining literal + END."""
    codes = [4, 0, 1, 0, 1, 0, 5]
    widths = [3, 3, 3, 3, 3, 4, 4]
    data = _gif(5, 1, PALETTE, 2, _pack_codes_lsb(codes, widths))
    out = decode_gif(data)
    exp = np.array([PALETTE[p] for p in (0, 1, 0, 1, 0)],
                   np.uint8).reshape(1, 5, 3)
    assert (out == exp).all()

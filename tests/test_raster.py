"""Raster kernels (r2): page rasterization from the engine's own layout
IR, Otsu, projection-profile skew detection, nearest-neighbor rotation —
the cv2-free reimplementation of the reference's OCR-arm image half
(``ocr/rotation_detection.py``, ``data_extract.py:421-435``)."""
import math

import numpy as np
import pytest

from text_extraction_system_ray.config import PipelineConfig
from text_extraction_system_ray.functions.pdf_build import build_pdf
from text_extraction_system_ray.functions.pdf_ops import rasterize_page
from text_extraction_system_ray.functions.raster import (
    decode_l_image, detect_rotation_projection, encode_l_image,
    otsu_threshold, rotate_image_array)
from text_extraction_system_ray.functions.rotation import (
    detect_rotation_raster, normalize_angle_90)
from tests.test_pdf_fonts import (CMAP, DESCRIPTOR, WIDTHS_FONT,
                                  simple_font_pdf, stream_obj)
from tests.test_pdf_rotation_extract import _rot_content

CFG = PipelineConfig()


def test_rasterize_page_draws_char_boxes():
    pdf = build_pdf([["Hello raster world", "second line of text"]])
    img_bytes = rasterize_page(pdf, 1, dpi=72)
    img = decode_l_image(img_bytes)
    assert img.shape == (792, 612)
    assert (img == 0).sum() > 100          # ink present
    assert (img == 255).mean() > 0.8       # mostly paper
    with pytest.raises(ValueError):
        rasterize_page(pdf, 99)


def test_otsu_threshold_bimodal():
    img = np.full((100, 100), 250, np.uint8)
    img[40:60, 10:90] = 10
    t = otsu_threshold(img)
    assert 10 <= t < 250


def test_skew_detection_on_rotated_text():
    """A PDF whose text object is Tm-rotated rasterizes to a skewed page;
    the projection detector recovers the angle within 0.5 deg."""
    for true_angle in (0.0, 7.0, -12.0):
        body = b"\n".join(
            _rot_content(true_angle, 80, 650 - 40 * i,
                         b"ABCABCABCABCABCABCABCABC")
            for i in range(6))
        pdf = simple_font_pdf(body, WIDTHS_FONT,
                              {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})
        img_bytes = rasterize_page(pdf, 1, dpi=72)
        got = detect_rotation_raster(img_bytes)
        assert abs(got - true_angle) <= 0.5, (true_angle, got)


def test_detect_rotation_raster_rejects_unsupported_formats():
    # WebP stays env-gated; malformed PNG/JPEG are decode errors, not gates
    with pytest.raises(NotImplementedError):
        detect_rotation_raster(b"RIFF\x00\x00\x00\x00WEBP" + bytes(64))
    with pytest.raises(ValueError):
        detect_rotation_raster(b"\x89PNG\r\n\x1a\n" + bytes(64))
    with pytest.raises(ValueError):
        detect_rotation_raster(b"\xff\xd8" + bytes(64))


def test_png_codec_roundtrip_all_shapes():
    from text_extraction_system_ray.functions.png import (decode_png,
                                                          encode_png)
    rng = np.random.RandomState(1)
    for shape in [(13, 17), (9, 5, 3), (7, 11, 4), (6, 8, 2)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        b = decode_png(encode_png(a))
        assert b.shape == a.shape and (a == b).all()


def test_png_decode_all_filter_types():
    """Hand-encode one row per filter type (None/Sub/Up/Average/Paeth)
    and check the decoder reconstructs the exact pixels."""
    import struct
    import zlib
    from text_extraction_system_ray.functions.png import (PNG_SIGNATURE,
                                                          decode_png)
    rng = np.random.RandomState(2)
    w, h, ch = 8, 5, 3
    img = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    bpp, stride = ch, w * ch
    rows, prev = [], np.zeros(stride, np.int32)
    for r in range(h):
        ft = r % 5
        line = img[r].reshape(-1).astype(np.int32)
        f = line.copy()
        for c in range(stride - 1, -1, -1):
            a = line[c - bpp] if c >= bpp else 0
            b = int(prev[c])
            cc = int(prev[c - bpp]) if c >= bpp else 0
            if ft == 1:
                f[c] = (line[c] - a) & 0xFF
            elif ft == 2:
                f[c] = (line[c] - b) & 0xFF
            elif ft == 3:
                f[c] = (line[c] - ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else cc)
                f[c] = (line[c] - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prev = line

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + \
            struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    data = PNG_SIGNATURE \
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)) \
        + chunk(b"IDAT", zlib.compress(b"".join(rows))) \
        + chunk(b"IEND", b"")
    assert (decode_png(data) == img).all()


def test_checked_in_png_fixture_deskew_roundtrip():
    """VERDICT r2 item 5: a real PNG of skewed scanned-looking text is
    decoded, skew-detected (≈6°) and counter-rotated back to straight —
    entirely without PIL/cv2."""
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "skewed_text.png")
    data = open(path, "rb").read()
    got = detect_rotation_raster(data)
    assert abs(got - 6.0) <= 0.5, got
    img = decode_l_image(data)
    fixed = rotate_image_array(img, -got)
    assert abs(detect_rotation_projection(fixed)) <= 0.5


def test_rotate_image_array_90_and_round_trip():
    img = np.full((4, 6), 255, np.uint8)
    img[0, 0] = 0                     # top-left marker
    r90 = rotate_image_array(img, 90)
    assert r90.shape == (6, 4)        # h/w swap near 90
    # content rotated CCW: top-left moves to bottom-left
    assert r90[5, 0] == 0
    back = rotate_image_array(r90, -90)
    assert back.shape == img.shape
    assert back[0, 0] == 0


def test_rotate_then_detect_inverts():
    """Deskew loop: rasterize straight text, rotate the RASTER by a
    known angle, detect, rotate back by the negated detection — the
    reference's detect→rotate loop (``data_extract.py:305-362``)."""
    pdf = build_pdf([[("many words in a long line of text here " * 2)
                      for _ in range(8)]])
    img = decode_l_image(rasterize_page(pdf, 1, dpi=72))
    rot = rotate_image_array(img, 9.0)
    got = detect_rotation_projection(rot)
    assert abs(got - 9.0) <= 0.5
    fixed = rotate_image_array(rot, -got)
    assert abs(detect_rotation_projection(fixed)) <= 0.5


def test_normalize_angle_90_still_frozen():
    assert normalize_angle_90(93.0) == 3.0


def test_orientation_probe_upright_vs_rotated():
    """OSD-probe analog (M16): banded row projections mark upright text;
    a 90-rotated raster flips the verdict; confidence gates via
    osd_accept like the reference's rule."""
    from text_extraction_system_ray.functions.raster import (
        detect_orientation_raster)
    from text_extraction_system_ray.functions.rotation import osd_accept
    pdf = build_pdf([[("text line with words " * 3) for _ in range(10)]])
    img = decode_l_image(rasterize_page(pdf, 1, dpi=72))
    o0, c0 = detect_orientation_raster(img)
    assert o0 == 0 and c0 > 3.0
    assert osd_accept(2.0, c0)
    o90, c90 = detect_orientation_raster(rotate_image_array(img, 90))
    assert o90 == 90 and c90 > 3.0
    # blank page: no text → zero confidence, rejected
    ob, cb = detect_orientation_raster(
        np.full((100, 100), 255, np.uint8))
    assert cb == 0.0 and not osd_accept(2.0, cb)


def _latin_like_page() -> np.ndarray:
    """Synthetic Latin-shaped lines: dense x-height core, ~40%-ink
    ascender band above it, ~10%-ink descender band below."""
    rng = np.random.RandomState(5)
    img = np.full((400, 300), 255, np.uint8)
    for y0 in range(40, 360, 30):
        asc = rng.rand(5, 240) < 0.4
        desc = rng.rand(4, 240) < 0.1
        img[y0:y0 + 5, 30:270][asc] = 0
        img[y0 + 5:y0 + 15, 30:270] = 0
        img[y0 + 15:y0 + 19, 30:270][desc] = 0
    return img


def test_orientation_full_resolves_180(ray_session=None):
    """VERDICT r2 item 7: ascender/descender asymmetry resolves 180°
    (and 270° via the axis stage) with confidence above the osd_accept
    gate; symmetric char-box rasters stay below the gate (no false
    flips on born-digital IR renders)."""
    from text_extraction_system_ray.functions.raster import (
        detect_flip_raster, detect_orientation_raster_full)
    from text_extraction_system_ray.functions.rotation import osd_accept
    img = _latin_like_page()
    for true in (0, 90, 180, 270):
        deg, conf = detect_orientation_raster_full(
            rotate_image_array(img, true))
        assert deg == true, (true, deg)
        assert osd_accept(2.0, conf), (true, conf)
    # symmetric lines: no asymmetry evidence -> below the gate
    flat = np.full((200, 200), 255, np.uint8)
    for y0 in range(20, 180, 20):
        flat[y0:y0 + 10, 20:180] = 0
    f, conf = detect_flip_raster(flat)
    assert f == 0 and not osd_accept(2.0, conf)


def test_png_adam7_interlaced_decode():
    """Hand-built Adam7 PNG: seven filter-0 sub-images assembled per the
    spec's pass grid must scatter back to the exact original pixels
    (gray and RGB, non-multiple-of-8 dims)."""
    import struct
    import zlib
    from text_extraction_system_ray.functions.png import (PNG_SIGNATURE,
                                                          decode_png)
    ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + \
            struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    rng = np.random.RandomState(9)
    for shape, ctype in (((13, 11), 0), ((10, 9, 3), 2)):
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        h, w = shape[:2]
        ch = 1 if ctype == 0 else 3
        img3 = img.reshape(h, w, ch)
        raw = bytearray()
        for x0, y0, dx, dy in ADAM7:
            rows = np.arange(y0, h, dy)
            cols = np.arange(x0, w, dx)
            if not len(rows) or not len(cols):
                continue
            sub = img3[np.ix_(rows, cols)]
            for r in range(sub.shape[0]):
                raw.append(0)
                raw.extend(sub[r].reshape(-1).tobytes())
        blob = PNG_SIGNATURE \
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype,
                                         0, 0, 1)) \
            + chunk(b"IDAT", zlib.compress(bytes(raw))) \
            + chunk(b"IEND", b"")
        out = decode_png(blob)
        assert out.shape == img.shape and (out == img).all(), shape

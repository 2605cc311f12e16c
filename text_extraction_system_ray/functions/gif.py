"""GIF87a/89a decoder in pure numpy — no PIL.

Implements the public GIF specification's decode path: logical screen
descriptor, global/local color tables, extension-block skipping, and
the variable-width LSB-first LZW decompressor (clear/end codes, code
width growth to 12 bits, the KwKwK case), plus Adam-style 4-pass
interlace reordering. Decodes the FIRST frame (animation frames after
the first are ignored — the still-image semantics a training pipeline
needs); transparency is left to the caller (indices are faithful).

Together with ``functions/png.py`` and ``functions/jpeg.py`` this
covers the three dominant legacy web image formats without PIL; the
reference reaches the same entry points via PIL (``pdf/pdf.py:201-232``).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def is_gif(data: Optional[bytes]) -> bool:
    return bool(data) and data[:6] in (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes,
                expected: int) -> np.ndarray:
    """GIF LZW: LSB-first variable-width codes."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    next_code = end + 1
    table = {i: (i,) for i in range(clear)}
    out = np.empty(expected, np.int32)
    n_out = 0
    prev: Optional[tuple] = None

    bitpos = 0
    total_bits = len(data) * 8

    def get_code(w: int) -> int:
        nonlocal bitpos
        if bitpos + w > total_bits:
            raise ValueError("gif: out of LZW data")
        v = 0
        for i in range(w):
            byte = data[(bitpos + i) >> 3]
            if (byte >> ((bitpos + i) & 7)) & 1:
                v |= 1 << i
        bitpos += w
        return v

    while n_out < expected:
        code = get_code(width)
        if code == clear:
            width = min_code_size + 1
            next_code = end + 1
            table = {i: (i,) for i in range(clear)}
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ValueError("gif: bad first code")
            seq = table[code]
        elif code in table:
            seq = table[code]
        elif code == next_code:
            seq = prev + (prev[0],)            # KwKwK
        else:
            raise ValueError("gif: invalid LZW code")
        take = min(len(seq), expected - n_out)
        out[n_out:n_out + take] = seq[:take]
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (seq[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = seq
    if n_out < expected:
        raise ValueError("gif: LZW stream ended early")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB of the first frame."""
    if not is_gif(data):
        raise ValueError("gif: bad signature")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    packed = data[10]
    gct = None
    pos = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("gif: truncated sub-blocks")
            sz = data[p]
            p += 1
            if sz == 0:
                return p
            p += sz

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                             # trailer
            break
        if b == 0x21:                             # extension
            if pos + 2 > len(data):
                raise ValueError("gif: truncated extension")
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        if pos + 10 > len(data):
            raise ValueError("gif: truncated image descriptor")
        left = int.from_bytes(data[pos + 1:pos + 3], "little")
        top = int.from_bytes(data[pos + 3:pos + 5], "little")
        iw = int.from_bytes(data[pos + 5:pos + 7], "little")
        ih = int.from_bytes(data[pos + 7:pos + 9], "little")
        ipacked = data[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("gif: truncated local color table")
            ct = np.frombuffer(data[pos:pos + 3 * n],
                               np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: no color table")
        if iw == 0 or ih == 0:
            raise ValueError("gif: zero-size frame")
        if pos >= len(data):
            raise ValueError("gif: missing LZW size")
        min_code_size = data[pos]
        if not 2 <= min_code_size <= 11:
            raise ValueError("gif: bad LZW min code size")
        pos += 1
        chunks = []
        while True:
            if pos >= len(data):
                raise ValueError("gif: truncated image data")
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            chunks.append(data[pos:pos + sz])
            pos += sz
        idx = _lzw_decode(min_code_size, b"".join(chunks), iw * ih)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("gif: palette index out of range")
        frame = idx.reshape(ih, iw)
        if ipacked & 0x40:                        # interlaced
            deinter = np.empty_like(frame)
            rows = np.concatenate([np.arange(0, ih, 8),
                                   np.arange(4, ih, 8),
                                   np.arange(2, ih, 4),
                                   np.arange(1, ih, 2)])
            deinter[rows] = frame
            frame = deinter
        rgb = ct[frame]
        # composite the first frame onto the logical screen: background =
        # the background-color index from the logical screen descriptor
        # (byte 11), bounds-checked; the paste rectangle is clipped to the
        # canvas (frames may overhang the screen) — ADVICE r3
        if (iw, ih) != (sw, sh) and sw and sh:
            canvas = np.zeros((sh, sw, 3), np.uint8)
            bg = data[11] if data[11] < len(ct) else 0
            canvas[:] = ct[bg]
            y0, x0 = min(top, sh), min(left, sw)
            y1, x1 = min(top + ih, sh), min(left + iw, sw)
            if y1 > y0 and x1 > x0:
                canvas[y0:y1, x0:x1] = rgb[:y1 - y0, :x1 - x0]
            return canvas
        return rgb
    raise ValueError("gif: no image data")


def gif_gray(data: bytes) -> np.ndarray:
    return decode_gif(data).mean(axis=2).astype(np.uint8)


def gif_dims(data: bytes):
    """(width, height) of the logical screen, no pixel decode."""
    if not is_gif(data) or len(data) < 10:
        raise ValueError("gif: cannot read dimensions")
    return (int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"))

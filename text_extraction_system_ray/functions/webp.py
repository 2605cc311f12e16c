"""WebP lossless (VP8L) codec — pure stdlib + numpy, built against the
public "WebP Lossless Bitstream Specification" (Google, 2012; RFC 9649).

The reference system gets WebP support for free from PIL; this sandbox
has no image libraries, so the bitstream layer is implemented directly:

Decoder (full VP8L):
- RIFF/WEBP container walk ('VP8L' direct or inside a 'VP8X' extended
  file); lossy 'VP8 ' payloads are an explicit NotImplementedError gate
  (boolean arithmetic decoder + loop filter are out of scope here).
- LSB-first bit reader; canonical prefix codes with deflate-style code
  assignment (codes packed MSB-first), simple (1-2 symbol) and normal
  (code-length-coded) forms, 16/17/18 repeat codes, max_symbol cutoff.
- Spatially-coded image: optional meta prefix (entropy) image, color
  cache (hash 0x1e35a7bd), LZ77 backward references with the 120-entry
  2D distance map + linear codes.
- All four inverse transforms: PREDICTOR (14 modes), COLOR (per-tile
  ColorTransformElement), SUBTRACT_GREEN, COLOR_INDEXING (palette incl.
  sub-byte pixel bundling).

Encoder (fixture-grade, spec-valid): literal-only stream — no
transforms, no color cache, no backward references — with real
per-channel canonical Huffman codes (package-merge length limiting,
code-length-code emission). Output decodes in any compliant decoder.
"""
from __future__ import annotations

import struct
from heapq import heapify, heappop, heappush
from typing import Dict, List, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------- container

def is_webp(payload: bytes) -> bool:
    return (payload is not None and len(payload) >= 16
            and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP")


def _find_vp8l(payload: bytes) -> bytes:
    """Return the VP8L chunk body, walking VP8X wrappers; reject lossy."""
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    lossy = False
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        size = min(size, max(0, len(payload) - body))
        if cc == b"VP8L":
            return payload[body:body + size]
        if cc == b"VP8 ":
            lossy = True
        pos = body + size + (size & 1)
    if lossy:
        raise NotImplementedError(
            "lossy WebP (VP8) decode stubbed in this environment "
            "(VP8L lossless decodes)")
    raise ValueError("no VP8L chunk in WebP container")


def webp_dims(payload: bytes) -> Tuple[int, int]:
    """Header-only (width, height) — VP8X canvas or VP8L header."""
    if not is_webp(payload):
        raise ValueError("not a WebP payload")
    if payload[12:16] == b"VP8X" and len(payload) >= 30:
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        return w, h
    data = _find_vp8l(payload)
    if len(data) < 5 or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    bits = int.from_bytes(data[1:5], "little")
    return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1


# ---------------------------------------------------------------- bit I/O

class _BitReader:
    """LSB-first bit reader over bytes."""

    def __init__(self, data: bytes, bit_pos: int = 0):
        self.data = data
        self.pos = bit_pos
        self.limit = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.limit:
            raise ValueError("truncated VP8L stream")
        self.pos = p + n
        # gather up to n+14 bits starting at byte p>>3
        byte0 = p >> 3
        chunk = int.from_bytes(self.data[byte0:byte0 + ((p & 7) + n + 7) // 8],
                               "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """LSB-first append of the low n bits of value."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes are packed MSB of the code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------- huffman

_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
                      12, 13, 14, 15)
_MAX_CODE_LENGTH = 15


def _canonical_codes(lengths: Sequence[int]) -> Dict[int, Tuple[int, int]]:
    """Deflate-style canonical assignment: symbol -> (code, length)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _HuffmanDecoder:
    """Single-symbol or canonical prefix decoder ((length, code) map)."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: Sequence[int] = (), single: int = None):
        self.single = single
        if single is not None:
            self.table = None
            self.max_len = 0
            return
        nz = [ln for ln in lengths if ln]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = lengths.index(1) if 1 in lengths else \
                next(s for s, ln in enumerate(lengths) if ln)
            self.table = None
            self.max_len = 0
            return
        # completeness check (Kraft equality for >1 symbol)
        if sum(1 << (_MAX_CODE_LENGTH - ln) for ln in nz) \
                != 1 << _MAX_CODE_LENGTH:
            raise ValueError("invalid (non-complete) prefix code")
        codes = _canonical_codes(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        self.max_len = max(ln for ln in lengths if ln)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        table = self.table
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _HuffmanDecoder:
    if br.read(1):                                       # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            return _HuffmanDecoder(single=sym0)
        sym1 = br.read(8)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
            raise ValueError("bad simple prefix code symbols")
        lengths[sym0] = lengths[sym1] = 1
        return _HuffmanDecoder(lengths)
    # normal: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    if not any(cl_lengths):
        raise ValueError("empty code-length code")
    cl_dec = _HuffmanDecoder(cl_lengths)
    max_symbol = alphabet_size
    if br.read(1):                                       # use length
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    remaining = max_symbol
    while sym < alphabet_size and remaining > 0:
        remaining -= 1
        cl = cl_dec.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:                                            # 18
            sym += 11 + br.read(7)
    return _HuffmanDecoder(lengths)


# ------------------------------------------------------------ distance map
# 120-entry close-neighborhood map (spec "Decoding the distance codes"):
# offsets (dx, dy) with dy in 0..7, dx in -7..8 (dy==0 -> dx 1..8),
# ordered by dx^2 + dy^2 ascending, then dy descending, then |dx|
# ascending with +dx before -dx.  _distance_map() generates it from that
# rule; tests pin the published table against the generated one.

def _distance_map() -> List[Tuple[int, int]]:
    cand = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                             abs(p[0]), p[0] < 0))
    return cand[:120]


_DIST_MAP = _distance_map()


def _plane_code_to_distance(width: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * width + dx)


def _read_prefix_value(br: _BitReader, prefix_code: int) -> int:
    """LZ77 length/distance prefix decoding (spec §"LZ77 backward
    reference"): codes 0..3 literal, then exponential extra bits."""
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


# ------------------------------------------------------------ image stream

_HASH_MUL = 0x1E35A7BD


def _decode_image_stream(br: _BitReader, width: int, height: int,
                         is_level0: bool):
    """Decode one entropy-coded ARGB image → (np.uint32 array (h, w),
    transforms list [(type, data), ...] in read order) — transforms only
    at level 0."""
    transforms = []
    xsize = width
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            xsize_t, tdata = _read_transform(br, ttype, xsize, height)
            transforms.append((ttype, tdata))
            xsize = xsize_t
    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    # meta prefix image (level 0 only)
    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (height + (1 << meta_bits) - 1) >> meta_bits
        meta_img, _ = _decode_image_stream(br, mw, mh, False)
        meta = (((meta_img >> 8) & 0xFFFF)).astype(np.int64)
        num_groups = int(meta.max()) + 1
    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    npix = xsize * height
    argb = np.zeros(npix, np.uint32)
    cache = [0] * cache_size
    pos = 0
    cur_group = groups[0]
    while pos < npix:
        if meta is not None:
            y, x = divmod(pos, xsize)
            cur_group = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        gdec, rdec, bdec, adec, ddec = cur_group
        sym = gdec.read(br)
        if sym < 256:
            red = rdec.read(br)
            blue = bdec.read(br)
            alpha = adec.read(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            argb[pos] = px
            if cache_size:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif sym < 280:
            length = _read_prefix_value(br, sym - 256)
            dist_prefix = ddec.read(br)
            dist_code = _read_prefix_value(br, dist_prefix)
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > npix:
                raise ValueError("bad backward reference")
            for _ in range(length):
                px = int(argb[pos - dist])
                argb[pos] = px
                if cache_size:
                    cache[(_HASH_MUL * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
                pos += 1
        else:
            if sym - 280 >= cache_size:
                raise ValueError("bad color cache index")
            argb[pos] = cache[sym - 280]
            pos += 1
    return argb.reshape(height, xsize), transforms


# ------------------------------------------------------------- transforms

def _read_transform(br: _BitReader, ttype: int, xsize: int, ysize: int):
    """Read one transform's side data; returns (new_xsize, data)."""
    if ttype in (0, 1):                    # PREDICTOR / COLOR: tile image
        bits = br.read(3) + 2
        tw = (xsize + (1 << bits) - 1) >> bits
        th = (ysize + (1 << bits) - 1) >> bits
        img, _ = _decode_image_stream(br, tw, th, False)
        return xsize, (bits, img)
    if ttype == 2:                          # SUBTRACT_GREEN
        return xsize, None
    if ttype == 3:                          # COLOR_INDEXING
        n_colors = br.read(8) + 1
        img, _ = _decode_image_stream(br, n_colors, 1, False)
        # palette entries are delta-coded componentwise
        pal = img.reshape(-1).astype(np.uint32)
        out = np.zeros_like(pal)
        prev = np.uint32(0)
        for i in range(len(pal)):
            a = ((pal[i] >> 24) + (prev >> 24)) & 0xFF
            r = ((pal[i] >> 16) + (prev >> 16)) & 0xFF
            g = ((pal[i] >> 8) + (prev >> 8)) & 0xFF
            b = (pal[i] + prev) & 0xFF
            prev = np.uint32((int(a) << 24) | (int(r) << 16)
                             | (int(g) << 8) | int(b))
            out[i] = prev
        if n_colors <= 2:
            xbits = 3
        elif n_colors <= 4:
            xbits = 2
        elif n_colors <= 16:
            xbits = 1
        else:
            xbits = 0
        packed_x = (xsize + (1 << xbits) - 1) >> xbits
        return packed_x, (xbits, out, xsize)
    raise ValueError(f"unknown transform type {ttype}")


def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _channels(p: int) -> Tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(L: int, T: int, TL: int) -> int:
    la, lr, lg, lb = _channels(L)
    ta, tr, tg, tb = _channels(T)
    ca, cr, cg, cb = _channels(TL)
    pa, pr, pg, pb = la + ta - ca, lr + tr - cr, lg + tg - cg, lb + tb - cb
    p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return L if p_l < p_t else T


def _clamp_add_sub_full(L: int, T: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(L: int, T: int, TL: int) -> int:
    ave = _avg2(L, T)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (TL >> sh) & 0xFF
        v = a + int((a - b) / 2)           # C-style truncation toward 0
        out |= max(0, min(255, v)) << sh
    return out


def _add_pixels(a: int, b: int) -> int:
    """Per-channel modulo-256 addition of two ARGB words."""
    return (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00) \
        | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)


def _inverse_predictor(argb: np.ndarray, bits: int,
                       tiles: np.ndarray) -> np.ndarray:
    h, w = argb.shape
    flat = [int(v) for v in argb.reshape(-1)]
    modes = ((tiles >> 8) & 0xFF).astype(np.int64)
    th, tw = modes.shape
    for y in range(h):
        trow = modes[min(y >> bits, th - 1)]
        base = y * w
        for x in range(w):
            pos = base + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = flat[pos - 1]
            elif x == 0:
                pred = flat[pos - w]
            else:
                mode = int(trow[min(x >> bits, tw - 1)])
                L = flat[pos - 1]
                T = flat[pos - w]
                TL = flat[pos - w - 1]
                TR = flat[pos - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = _select(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_sub_half(L, T, TL)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            flat[pos] = _add_pixels(flat[pos], pred)
    return np.array(flat, np.uint32).reshape(h, w)


def _inverse_color_transform(argb: np.ndarray, bits: int,
                             tiles: np.ndarray) -> np.ndarray:
    """ColorTransformElement inverse: red += (g2r*g)>>5;
    blue += (g2b*g)>>5 + (r2b*red')>>5 (int8 multipliers, spec §6)."""
    h, w = argb.shape
    ys, xs = np.meshgrid(np.arange(h) >> bits, np.arange(w) >> bits,
                         indexing="ij")
    ys = np.minimum(ys, tiles.shape[0] - 1)
    xs = np.minimum(xs, tiles.shape[1] - 1)
    elem = tiles[ys, xs]
    # ColorTransformElement packing (spec §6 / libwebp): green_to_red
    # in the BLUE channel, green_to_blue in GREEN, red_to_blue in RED
    g2r = (elem & 0xFF).astype(np.int64)
    g2b = ((elem >> 8) & 0xFF).astype(np.int64)
    r2b = ((elem >> 16) & 0xFF).astype(np.int64)
    g2r = np.where(g2r >= 128, g2r - 256, g2r)
    g2b = np.where(g2b >= 128, g2b - 256, g2b)
    r2b = np.where(r2b >= 128, r2b - 256, r2b)
    a = (argb >> 24) & 0xFF
    r = ((argb >> 16) & 0xFF).astype(np.int64)
    g = ((argb >> 8) & 0xFF).astype(np.int64)
    b = (argb & 0xFF).astype(np.int64)
    gs = np.where(g >= 128, g - 256, g)          # green as int8
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = np.where(r >= 128, r - 256, r)          # NEW red as int8
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _inverse_subtract_green(argb: np.ndarray) -> np.ndarray:
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (r << 16) | (g << 8) | b


def _inverse_color_indexing(argb: np.ndarray, xbits: int,
                            palette: np.ndarray, true_w: int) -> np.ndarray:
    h = argb.shape[0]
    green = ((argb >> 8) & 0xFF).astype(np.int64)
    if xbits == 0:
        idx = green
    else:
        per = 1 << xbits
        depth = 8 >> xbits
        mask = (1 << depth) - 1
        shifts = (np.arange(per) * depth)[None, None, :]
        idx = ((green[:, :, None] >> shifts) & mask).reshape(h, -1)
        idx = idx[:, :true_w]
    bad = idx >= len(palette)
    safe = np.where(bad, 0, idx)
    out = palette[safe]
    out = np.where(bad, np.uint32(0), out)
    return out.astype(np.uint32)


# ---------------------------------------------------------------- decode

def decode_vp8l_stream(data: bytes, width: int, height: int,
                       has_header: bool = False) -> np.ndarray:
    """Decode a raw VP8L bitstream (post-header) to (h, w) uint32 ARGB."""
    br = _BitReader(data)
    if has_header:
        if br.read(8) != 0x2F:
            raise ValueError("bad VP8L signature")
        width = br.read(14) + 1
        height = br.read(14) + 1
        br.read(1)                                  # alpha hint
        if br.read(3) != 0:
            raise ValueError("unsupported VP8L version")
    argb, transforms = _decode_image_stream(br, width, height, True)
    for ttype, tdata in reversed(transforms):
        if ttype == 0:
            argb = _inverse_predictor(argb, tdata[0], tdata[1])
        elif ttype == 1:
            argb = _inverse_color_transform(argb, tdata[0], tdata[1])
        elif ttype == 2:
            argb = _inverse_subtract_green(argb)
        else:
            argb = _inverse_color_indexing(argb, tdata[0],
                                           tdata[1].astype(np.uint32),
                                           tdata[2])
    if argb.shape != (height, width):
        raise ValueError("decoded size mismatch")
    return argb


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP → uint8 array (h, w, 3) RGB or (h, w, 4)
    RGBA when any pixel is non-opaque."""
    if not is_webp(payload):
        raise ValueError("not a WebP payload")
    data = _find_vp8l(payload)
    argb = decode_vp8l_stream(data, 0, 0, has_header=True)
    a = ((argb >> 24) & 0xFF).astype(np.uint8)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    if (a == 255).all():
        return np.stack([r, g, b], axis=-1)
    return np.stack([r, g, b, a], axis=-1)


def webp_gray(payload: bytes) -> np.ndarray:
    """Luma (ITU-R 601 integer weights, matching the other codecs'
    gray path) as (h, w) uint8."""
    arr = decode_webp(payload)
    rgb = arr[:, :, :3].astype(np.uint32)
    return ((77 * rgb[:, :, 0] + 150 * rgb[:, :, 1] + 29 * rgb[:, :, 2])
            >> 8).astype(np.uint8)


# ---------------------------------------------------------------- encode

def _package_merge(freqs: Sequence[int], limit: int) -> List[int]:
    """Length-limited Huffman code lengths (boundary package-merge)."""
    active = [(f, (i,)) for i, f in enumerate(freqs) if f > 0]
    n = len(active)
    if n == 0:
        return [0] * len(freqs)
    if n == 1:
        out = [0] * len(freqs)
        out[active[0][1][0]] = 1
        return out
    if (1 << limit) < n:
        raise ValueError("alphabet too large for length limit")
    active.sort()
    merged: List[Tuple[int, Tuple[int, ...]]] = []
    for _ in range(limit):
        level = sorted(merged + active)
        merged = []
        for i in range(0, len(level) - 1, 2):
            f1, s1 = level[i]
            f2, s2 = level[i + 1]
            merged.append((f1 + f2, s1 + s2))
    lengths = [0] * len(freqs)
    # take the 2(n-1) cheapest packages of the final level
    final = sorted(merged + active)[:2 * (n - 1)]
    for _, syms in final:
        for s in syms:
            lengths[s] += 1
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: Sequence[int]) -> Dict[
        int, Tuple[int, int]]:
    """Emit a prefix code (simple when ≤2 symbols and codable, else
    normal with a code-length code); returns symbol -> (code, len)."""
    used = [s for s, ln in enumerate(lengths) if ln]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)                                   # simple
        bw.write(len(used) - 1, 1)
        if used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)                                       # normal
    max_symbol = max(used) + 1
    cl_hist = [0] * 19
    for s in range(max_symbol):
        cl_hist[lengths[s]] += 1
    cl_lengths = _package_merge(cl_hist, 7)
    num_cl = max(i for i, s in enumerate(_CODE_LENGTH_ORDER)
                 if cl_lengths[s]) + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CODE_LENGTH_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    if max_symbol < len(lengths):
        bw.write(1, 1)                                   # use max_symbol
        n = 0
        while (max_symbol - 2) >> (2 + 2 * n) and n < 7:
            n += 1
        bw.write(n, 3)
        bw.write(max_symbol - 2, 2 + 2 * n)
    else:
        bw.write(0, 1)
    if len(cl_codes) == 1:
        pass                                             # zero-bit code
    else:
        for s in range(max_symbol):
            code, ln = cl_codes[lengths[s]]
            bw.write_code(code, ln)
    return _canonical_codes(lengths)


def encode_webp_lossless(arr: np.ndarray) -> bytes:
    """Encode (h, w) gray, (h, w, 1), (h, w, 3) RGB or (h, w, 4) RGBA
    uint8 pixels as a spec-valid literal-only VP8L WebP."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    if c == 1:
        r = g = b = arr[:, :, 0]
        a = np.full((h, w), 255, np.uint8)
    elif c == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        a = np.full((h, w), 255, np.uint8)
    elif c == 4:
        r, g, b, a = (arr[:, :, i] for i in range(4))
    else:
        raise ValueError("1, 3 or 4 channels")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (a != 255).any() else 0, 1)
    bw.write(0, 3)                                       # version
    bw.write(0, 1)                                       # no transforms
    bw.write(0, 1)                                       # no color cache
    bw.write(0, 1)                                       # no meta image

    def hist(vals: np.ndarray, size: int) -> List[int]:
        return np.bincount(vals.reshape(-1), minlength=size).tolist()

    gmap = _write_prefix_code(bw, _package_merge(hist(g, 256 + 24), 15))
    rmap = _write_prefix_code(bw, _package_merge(hist(r, 256), 15))
    bmap = _write_prefix_code(bw, _package_merge(hist(b, 256), 15))
    amap = _write_prefix_code(bw, _package_merge(hist(a, 256), 15))
    dh = [0] * 40
    dh[0] = 1
    _write_prefix_code(bw, _package_merge(dh, 15))       # unused distance
    gf, rf, bf, af = (x.reshape(-1) for x in (g, r, b, a))
    for i in range(w * h):
        code, ln = gmap[int(gf[i])]
        bw.write_code(code, ln)
        code, ln = rmap[int(rf[i])]
        bw.write_code(code, ln)
        code, ln = bmap[int(bf[i])]
        bw.write_code(code, ln)
        code, ln = amap[int(af[i])]
        bw.write_code(code, ln)
    body = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

"""Deterministic REAL-FONT PDF generator — the adversarial counterpart
of :mod:`pdf_build`.

Where ``pdf_build`` emits metric-less Courier text (exercising the
legacy fixed-advance path), this generator emits documents whose text is
only recoverable through the full font machinery the reference gets
from PDFBox (``PDFToTextWithCoordinates.java:181-225``):

- a Type0 / Identity-H composite font with **2-byte char codes under a
  seed-dependent code shift** — the content stream's bytes are NOT the
  text; only the ``/ToUnicode`` CMap recovers it;
- a CIDFont ``/W`` per-code width table (no two codes need share an
  advance) — char boxes are wrong unless ``/W`` is honored;
- the content stream compressed with a seed-chosen filter (Flate,
  ASCIIHex, ASCII85 or LZW).

Round-trip contract: ``extract_row(build_realfont_pdf(clean_text, seed))
.text == clean_text + "\\n\\f"`` — pinned by the ``realfont_roundtrip``
query against a DuckDB oracle over the source table, which makes the
decode path's correctness independent of the generator (the generator
never runs the extractor's inverse; it writes spec structures).
"""
from __future__ import annotations

import base64
import zlib
from typing import Dict, List


def lzw_encode(data: bytes) -> bytes:
    """TIFF-style LZW (9→12-bit, 256=clear, 257=EOD) — fixture-side
    inverse of ``pdf_extract._lzw_decode``."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    bits = 9
    codes: List[tuple] = [(256, 9)]
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w = w + c
        else:
            codes.append((table[w], bits))
            table[w + c] = next_code
            next_code += 1
            # early-change sync: the decoder's deferred-entry table lags
            # this counter by one, and it widens at 2^bits - 1 — so the
            # encoder widens at 2^bits
            if next_code >= (1 << bits) and bits < 12:
                bits += 1
            if next_code >= 4096:
                # table full: emit CLEAR, reset (spec: encoder must clear)
                codes.append((256, bits))
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                bits = 9
            w = c
    if w:
        codes.append((table[w], bits))
    codes.append((257, bits))
    buf = 0
    nbits = 0
    out = bytearray()
    for code, b in codes:
        buf = (buf << b) | code
        nbits += b
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _assemble(objects: Dict[int, bytes]) -> bytes:
    parts = [b"%PDF-1.4\n"]
    for num in sorted(objects):
        parts.append(b"%d 0 obj\n" % num)
        parts.append(objects[num])
        parts.append(b"\nendobj\n")
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def _stream(dict_items: bytes, data: bytes) -> bytes:
    return (b"<< " + dict_items + b" /Length %d >>\nstream\n" % len(data)
            + data + b"\nendstream")


def width_of(code: int) -> int:
    """Per-code advance in glyph units — deterministic, non-uniform."""
    return 300 + (code % 401)


def code_shift(seed: int) -> int:
    return (0x1111 * ((seed % 7) + 1)) % 0xFFFF


def encode_char(ch: str, seed: int) -> int:
    """Codepoint → 2-byte char code, bijective on the BMP, never 0."""
    return (ord(ch) + code_shift(seed)) % 0xFFFF + 1


def build_realfont_pdf(text: str, seed: int = 0) -> bytes:
    """One-page PDF whose single text line is ``text``, written with the
    shifted-code Type0 font. ``text`` must be BMP-only and single-line
    (the caller whitespace-normalizes; see ``realfont_roundtrip``)."""
    text = "".join(ch if ord(ch) < 0xFFFE else "?" for ch in text)
    codes = [encode_char(ch, seed) for ch in text]
    uniq = sorted(set(zip(codes, text)))

    # /ToUnicode CMap: bfchar entries in ≤100-entry blocks (spec §9.10.3)
    cmap_parts = [b"/CIDInit /ProcSet findresource begin 12 dict begin "
                  b"begincmap\n1 begincodespacerange <0000> <FFFF> "
                  b"endcodespacerange\n"]
    for i in range(0, len(uniq), 100):
        chunk = uniq[i:i + 100]
        cmap_parts.append(b"%d beginbfchar\n" % len(chunk))
        for code, ch in chunk:
            cmap_parts.append(b"<%04X> <%04X>\n" % (code, ord(ch)))
        cmap_parts.append(b"endbfchar\n")
    cmap_parts.append(b"endcmap end end")
    cmap = b"".join(cmap_parts)

    w_entries = b" ".join(b"%d [%d]" % (code, width_of(code))
                          for code, _ in uniq)
    hex_codes = b"".join(b"%04X" % c for c in codes)
    content = b"BT /F1 10 Tf 50 720 Td <" + hex_codes + b"> Tj ET"

    filt = seed % 4
    if filt == 0:
        cdict, cdata = b"/Filter /FlateDecode", zlib.compress(content)
    elif filt == 1:
        cdict, cdata = b"/Filter /ASCIIHexDecode", content.hex().encode() + b">"
    elif filt == 2:
        cdict, cdata = (b"/Filter /ASCII85Decode",
                        base64.a85encode(content) + b"~>")
    else:
        cdict, cdata = b"/Filter /LZWDecode", lzw_encode(content)

    return _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        4: _stream(cdict, cdata),
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /ShiftedSans "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
            b"/ToUnicode 7 0 R >>"),
        6: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /ShiftedSans "
            b"/DW 500 /W [" + w_entries + b"] >>"),
        7: _stream(b"", cmap),
    })

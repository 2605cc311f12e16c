"""Charset sniffing + decoding for web payloads (from scratch).

Common-Crawl HTML is ~95% UTF-8, but the tail carries UTF-16 (BOM'd)
and windows-1252/latin-1 declared via ``<meta charset=...>`` — the
reference gets transparent charset handling from Tika
(``text_extraction/__init__.py`` Tika branch); here it is an explicit
sniff in the WHATWG encoding-standard order:

  1. BOM: UTF-8 / UTF-16LE / UTF-16BE (highest priority, per spec).
  2. ``<meta charset=...>`` / ``<meta http-equiv=Content-Type
     content="...; charset=...">`` scanned in the first 1024 bytes
     (the WHATWG prescan window).
  3. Fallback UTF-8 (errors='replace') — rule H1 of the frozen
     extraction contract.

The main extraction pipeline keeps frozen rule H1 (bare UTF-8) — this
module is the upstream normalization op (``pipelines/charset.py``)
that rewrites the alt-encoded tail INTO that contract.
"""
from __future__ import annotations

import re
from typing import Tuple

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]

# WHATWG prescan: charset declarations inside the first 1024 bytes
_META_CHARSET_RE = re.compile(
    rb"""<meta\s[^>]*charset\s*=\s*["']?\s*([-\w.:]+)""", re.IGNORECASE)

# label → python codec (the WHATWG label table subset that matters here)
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "windows-1252": "cp1252", "cp1252": "cp1252", "iso-8859-1": "cp1252",
    "latin-1": "cp1252", "latin1": "cp1252", "ascii": "cp1252",
    "us-ascii": "cp1252",
}


def sniff_charset(payload: bytes) -> Tuple[str, int]:
    """Returns (python codec name, BOM length to strip)."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return codec, len(bom)
    m = _META_CHARSET_RE.search(payload[:1024])
    if m:
        label = m.group(1).decode("ascii", errors="replace").lower()
        codec = _LABELS.get(label)
        if codec:
            if codec.startswith("utf-16"):
                # WHATWG prescan rule: a meta-declared UTF-16 label maps
                # to UTF-8 — a BOM-less page whose meta tag was readable
                # as ASCII cannot actually be UTF-16 (real UTF-16 is
                # caught by the BOM branch above)
                codec = "utf-8"
            return codec, 0
    return "utf-8", 0


def decode_payload(payload: bytes) -> Tuple[str, str]:
    """Sniff + decode. Returns (text, codec). Never raises: malformed
    sequences decode with U+FFFD (same tolerance as rule H1)."""
    codec, strip = sniff_charset(payload)
    return payload[strip:].decode(codec, errors="replace"), codec

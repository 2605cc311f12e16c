"""Deterministic language identification (reference analog: FastText
``lid.176.bin`` singleton, ``data_extract/lang.py:13-37``).

No ML model is available in this environment, and the byte-identity
contract requires full determinism anyway, so the engine defines its own
two-stage heuristic and freezes it:

1. **Script detection** over Unicode ranges — Cyrillic, Greek, CJK, Kana,
   Hangul, Arabic, Hebrew, Devanagari, Thai decide the language family
   directly (with ru/uk/bg discrimination via marker characters).
2. **Stopword profiles** for Latin-script languages (en de fr es it pt nl)
   — most stopword hits wins; ties break by a fixed priority order.

The per-sentence / per-paragraph / per-document application mirrors the
reference (``data_extract.py:149-163``, forced-language propagation at
``data_extract.py:137-147``). Applied inside an actor pool so the compiled
profiles are built once per actor (SURVEY.md §2.3).
"""
from __future__ import annotations

import re
from typing import Dict, FrozenSet, List, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
_ASCII_ALPHA_RE = re.compile(r"[A-Za-z]+")

# Latin-script stopword profiles (top function words; frozen).
_PROFILES: List[Tuple[str, FrozenSet[str]]] = [
    ("en", frozenset("the of and to in a is that it was for on are as with be at by this have from or had not but what all were when we there can an your which their".split())),
    ("de", frozenset("der die und das ist nicht sie mit ein eine von den dem des im für auf als auch wird sind ich werden oder aus bei einer hat nach wurde über einem bis".split())),
    ("fr", frozenset("le la les de des du et est une un dans que qui pour sur pas au avec ne ce se par plus sont été aux cette mais ou comme leur elle nous vous".split())),
    ("es", frozenset("el la los las de del y es una un en que no por con para se su al lo como más pero sus le ha o este si nos ya fue entre".split())),
    ("it", frozenset("il la le di che e è una un in per non con sono del della si da al dei più nel alla come dal anche gli lo questo ma se".split())),
    ("pt", frozenset("o a os as de do da dos das e é uma um em que não por com para se no na são ao mais como foi pelo pela ou mas".split())),
    ("nl", frozenset("de het een en van is in dat op te zijn met voor niet aan er ook als bij maar om uit door over naar worden werd hij ze dan".split())),
]

_UK_MARKERS = frozenset("іїєґІЇЄҐ")
_RU_MARKERS = frozenset("ыэъёЫЭЪЁ")
_BG_MARKERS = frozenset("ъщЪЩ")


_EMPTY_COUNTS = {"latin": 0, "cyr": 0, "greek": 0, "cjk": 0, "kana": 0,
                 "hangul": 0, "arabic": 0, "hebrew": 0, "deva": 0, "thai": 0}


def _script_counts(text: str) -> Dict[str, int]:
    """Per-script character counts, vectorized (this runs per sentence in
    the enrichment hot path; a per-char Python loop dominated the profile)."""
    c = dict(_EMPTY_COUNTS)
    if text.isascii():  # fast path: the overwhelming majority of web text
        c["latin"] = sum(len(m) for m in _ASCII_ALPHA_RE.findall(text))
        return c
    o = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    c["latin"] = int((((o >= 0x41) & (o <= 0x5A)) | ((o >= 0x61) & (o <= 0x7A))
                      | ((o >= 0x80) & (o < 0x250))).sum())
    c["cyr"] = int(((o >= 0x0400) & (o <= 0x04FF)).sum())
    c["greek"] = int(((o >= 0x0370) & (o <= 0x03FF)).sum())
    c["cjk"] = int((((o >= 0x4E00) & (o <= 0x9FFF))
                    | ((o >= 0x3400) & (o <= 0x4DBF))).sum())
    c["kana"] = int(((o >= 0x3040) & (o <= 0x30FF)).sum())
    c["hangul"] = int(((o >= 0xAC00) & (o <= 0xD7AF)).sum())
    c["arabic"] = int(((o >= 0x0600) & (o <= 0x06FF)).sum())
    c["hebrew"] = int(((o >= 0x0590) & (o <= 0x05FF)).sum())
    c["deva"] = int(((o >= 0x0900) & (o <= 0x097F)).sum())
    c["thai"] = int(((o >= 0x0E00) & (o <= 0x0E7F)).sum())
    return c


def detect_language(text: str, default: str = "en") -> str:
    """Detect a 2-letter language code for ``text``. Deterministic.

    Empty / script-free text returns ``default`` (reference analog: empty
    text ⇒ ``language='en'``, ``data_extract.py:115-129``).
    """
    if not text:
        return default
    sc = _script_counts(text)
    total = sum(sc.values())
    if total == 0:
        return default
    best_script = max(sc, key=lambda k: (sc[k], k))
    if sc[best_script] == 0:
        return default
    if best_script == "cyr":
        uk = sum(1 for ch in text if ch in _UK_MARKERS)
        ru = sum(1 for ch in text if ch in _RU_MARKERS)
        bg = sum(1 for ch in text if ch in _BG_MARKERS)
        if uk > ru and uk >= 1:
            return "uk"
        if bg > ru and bg > uk:
            return "bg"
        return "ru"
    if best_script == "greek":
        return "el"
    if best_script in ("cjk",):
        # Kana presence → Japanese even when CJK ideographs dominate
        if sc["kana"] > 0:
            return "ja"
        return "zh"
    if best_script == "kana":
        return "ja"
    if best_script == "hangul":
        return "ko"
    if best_script == "arabic":
        return "ar"
    if best_script == "hebrew":
        return "he"
    if best_script == "deva":
        return "hi"
    if best_script == "thai":
        return "th"
    # Latin: stopword vote
    tokens = [t.lower() for t in _TOKEN_RE.findall(text)]
    if not tokens:
        return default
    best_lang, best_hits = default, 0
    for lang, prof in _PROFILES:   # fixed order → deterministic tie-break
        hits = sum(1 for t in tokens if t in prof)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else default

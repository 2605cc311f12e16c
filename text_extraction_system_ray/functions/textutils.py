"""Small scalar utilities (reference parity).

- ``get_valid_fn``: filename sanitization — escape path-hostile chars,
  cap the stem at 64 chars, keep the extension
  (``commons/escape_utils.py:5-16``). Used for url → partition-safe keys.
- ``LanguageConverter``: ``"en_US"`` → ``("en", "US")`` and 2-letter →
  tesseract language codes with ``osd`` default
  (``utils.py:4-22``; table ``constants.py:14-23``).
"""
from __future__ import annotations

import re
from typing import Tuple

_BAD_FN_RE = re.compile(r"[^A-Za-z0-9._-]+")


def get_valid_fn(name: str, max_stem: int = 64) -> str:
    """Path-safe file name: hostile chars → '_', stem capped, ext kept."""
    name = name.strip().replace("/", "_").replace("\\", "_")
    if "." in name.rstrip("."):
        stem, _, ext = name.rpartition(".")
        ext = "." + _BAD_FN_RE.sub("_", ext)[:16]
    else:
        stem, ext = name, ""
    stem = _BAD_FN_RE.sub("_", stem)[:max_stem] or "_"
    return stem + ext


# ref constants.py:14-23 — 2-letter → tesseract code, default 'osd'
_TESSERACT_LANGS = {
    "en": "eng", "de": "deu", "fr": "fra", "es": "spa",
    "it": "ita", "pt": "por",
}


class LanguageConverter:
    @staticmethod
    def get_language_and_locale_code(language: str) -> Tuple[str, str]:
        """'en_US' → ('en', 'US'); 'en' → ('en', '')."""
        if not language:
            return "", ""
        parts = language.replace("-", "_").split("_", 1)
        lang = parts[0].lower()
        locale = parts[1].upper() if len(parts) > 1 else ""
        return lang, locale

    @staticmethod
    def convert_language_to_tesseract_view(language: str) -> str:
        lang, _ = LanguageConverter.get_language_and_locale_code(language)
        return _TESSERACT_LANGS.get(lang, "osd")

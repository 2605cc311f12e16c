"""Sentence / paragraph segmentation over the flat extracted text.

Reference analogs: lexnlp ``get_sentence_span_list`` / ``get_paragraph_spans``
(``data_extract/data_extract.py:149-163``). lexnlp is a heavyweight external
dependency; per SURVEY.md §7.4(4) the engine defines its own deterministic
rule-based segmenters and freezes them — the contract is byte/span identity
vs THIS code run serially (the oracle), not vs lexnlp.

All spans are character offsets ``[start, end)`` into the document text,
like the reference DTOs (``text_extraction_system_api/dto.py:84-133``).
"""
from __future__ import annotations

import re
from typing import List, Tuple

# Sentence boundary: terminator run + optional closing quotes/brackets,
# followed by whitespace. The *sentence end* includes the terminator and
# closers but not the whitespace.
_SENT_BOUNDARY_RE = re.compile(r"[.!?…]+[\"'”’)\]]*(?=\s|$)")

# Common abbreviations that do NOT end a sentence (frozen, lowercase, no dot).
_ABBREV = frozenset(
    "mr mrs ms dr prof sr jr st vs etc e.g i.e fig no al inc ltd co corp "
    "approx dept est min max vol".split()
)

_WORD_BEFORE_RE = re.compile(r"([^\W\d_][\w.]*)$", re.UNICODE)


def sentence_spans(text: str, start: int = 0, end: int | None = None) -> List[Tuple[int, int]]:
    """Split ``text[start:end]`` into sentence spans (absolute offsets).

    Rules (frozen):
      S1. Candidate boundaries are matches of ``[.!?…]+`` plus trailing
          closers, followed by whitespace or end.
      S2. A ``.`` boundary is suppressed when the preceding word (lowercased,
          dots stripped) is a known abbreviation, or is a single letter
          (initials), or the following non-space char is a lowercase letter
          or digit (e.g. "3.14", "v1.2 beta").
      S3. Spans are trimmed of surrounding whitespace; empty spans dropped.
    """
    if end is None:
        end = len(text)
    seg = text[start:end]
    spans: List[Tuple[int, int]] = []
    seg_start = 0
    for m in _SENT_BOUNDARY_RE.finditer(seg):
        b_end = m.end()
        if b_end < len(seg) and not seg[b_end].isspace():
            continue
        if m.group(0)[0] == ".":
            before = _WORD_BEFORE_RE.search(seg, 0, m.start())
            word = before.group(1).lower().rstrip(".") if before else ""
            if word in _ABBREV or len(word) == 1:
                continue
            j = b_end
            while j < len(seg) and seg[j].isspace():
                j += 1
            if j < len(seg) and (seg[j].islower() or seg[j].isdigit()):
                continue
        spans.append((seg_start, b_end))
        seg_start = b_end
    if seg_start < len(seg):
        spans.append((seg_start, len(seg)))
    out: List[Tuple[int, int]] = []
    for s, e in spans:
        while s < e and seg[s].isspace():
            s += 1
        while e > s and seg[e - 1].isspace():
            e -= 1
        if e > s:
            out.append((start + s, start + e))
    return out


def paragraph_spans_from_blocks(block_spans: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Paragraphs are the kept blocks themselves (one span per block).

    The HTML block tree already encodes paragraph boundaries; the PDF branch
    passes per-line-group spans. Mirrors the reference where paragraphs come
    from the extractor's own formatting marks (``data_extract.py:160-163``).
    """
    return list(block_spans)

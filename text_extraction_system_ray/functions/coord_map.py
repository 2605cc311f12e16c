"""Coordinate ↔ text mapping utilities (client-side library).

Reference analogs, reimplemented over the engine's output columns
(``char_spans`` list<[x,y,w,h]>, ``pages`` list<struct>):

- char index → page:      ``find_page_by_smb_index`` golden-section /
  linear search (``text_extraction_system_api/pdf_coordinates/
  pdf_coords_common.py:40-71``)
- (x, y) → char index:    nearest symbol by squared distance
  (``pdf_coordinates/coord_text_map.py:68-94``)
- area → text span:       longest run of chars whose boxes overlap the
  selection by > 0.2 of the char area (``coord_text_map.py:96-128``)
- char span → line rects: merge per-char boxes into per-line rectangles
  (``pdf_coordinates/text_coord_map.py:41-150``)

These operate on plain numpy arrays / python lists so they work on rows
pulled out of the output Parquet with any reader.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

Box = Tuple[float, float, float, float]


def find_page_by_char_index(pages: Sequence[dict], idx: int) -> Optional[int]:
    """1-based page number containing char ``idx``; binary search over the
    page [start, end) spans (linear under 10 pages, like the reference)."""
    if not pages:
        return None
    if len(pages) < 10:
        for p in pages:
            if p["start"] <= idx < p["end"]:
                return p["number"]
        return None
    lo, hi = 0, len(pages) - 1
    while lo <= hi:
        mid = (lo + hi) // 2
        p = pages[mid]
        if idx < p["start"]:
            hi = mid - 1
        elif idx >= p["end"]:
            lo = mid + 1
        else:
            return p["number"]
    return None


def _spans_array(char_spans) -> np.ndarray:
    a = np.asarray(char_spans, dtype=np.float64)
    return a.reshape(-1, 4)


def find_closest_char(char_spans, x: float, y: float,
                      start: int = 0, end: Optional[int] = None) -> int:
    """Index of the char whose box center is nearest to (x, y), among
    chars with non-zero boxes in [start, end). Returns -1 if none."""
    a = _spans_array(char_spans)
    if end is None:
        end = a.shape[0]
    seg = a[start:end]
    real = (seg[:, 2] > 0) & (seg[:, 3] > 0)
    if not real.any():
        return -1
    cx = seg[:, 0] + seg[:, 2] / 2.0
    cy = seg[:, 1] + seg[:, 3] / 2.0
    d2 = (cx - x) ** 2 + (cy - y) ** 2
    d2[~real] = np.inf
    return int(start + int(np.argmin(d2)))


def area_to_text_span(char_spans, area: Box,
                      min_overlap: float = 0.2) -> Optional[Tuple[int, int]]:
    """Longest run of chars whose boxes overlap ``area`` (left, top,
    width, height) by more than ``min_overlap`` of the char box area.
    Returns [start, end) char offsets or None."""
    a = _spans_array(char_spans)
    if a.size == 0:
        return None
    al, at, aw, ah = area
    ix = np.maximum(0.0, np.minimum(a[:, 0] + a[:, 2], al + aw)
                    - np.maximum(a[:, 0], al))
    iy = np.maximum(0.0, np.minimum(a[:, 1] + a[:, 3], at + ah)
                    - np.maximum(a[:, 1], at))
    char_area = a[:, 2] * a[:, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(char_area > 0, (ix * iy) / char_area, 0.0)
    hit = ratio > min_overlap
    if not hit.any():
        return None
    # longest consecutive run (separators with zero boxes break runs only
    # when a non-hit real char intervenes; zero-box chars inside a run of
    # hits are absorbed, mirroring the reference's run building)
    best = (0, 0)
    run_start = None
    for i in range(len(hit) + 1):
        h = hit[i] if i < len(hit) else False
        absorb = (i < len(hit) and char_area[i] == 0 and run_start is not None)
        if h or absorb:
            if run_start is None:
                run_start = i
        else:
            if run_start is not None:
                if i - run_start > best[1] - best[0]:
                    best = (run_start, i)
                run_start = None
    if best == (0, 0):
        return None
    s, e = best
    while e > s and char_area[e - 1] == 0:
        e -= 1
    return (int(s), int(e))


def span_to_line_rects(char_spans, start: int, end: int,
                       y_tol: float = 0.5) -> List[Box]:
    """Merge the char boxes of text[start:end] into one rectangle per
    visual line (chars grouped by y within ``y_tol``)."""
    a = _spans_array(char_spans)[start:end]
    real = a[(a[:, 2] > 0) & (a[:, 3] > 0)]
    if real.size == 0:
        return []
    rects: List[List[float]] = []
    for x, y, w, h in real:
        for r in rects:
            if abs(r[1] - y) <= y_tol:
                r[0] = min(r[0], x)
                r[2] = max(r[2], x + w)
                r[3] = max(r[3], h)
                break
        else:
            rects.append([x, y, x + w, h])
    return [(r[0], r[1], r[2] - r[0], r[3]) for r in rects]

"""PDF table detection from character boxes (T1-T4 analog).

The reference detects tables with Camelot (lattice/stream) plus a cv2
region detector that clusters cells into columns by left/mid/right pivots
within ±5 px (``ocr/tables/table_detection.py:311-445``,
``data_extract/camelot/camelot.py:15-95``). No cv2/Camelot here, and the
engine already has exact char boxes from the layout parse — so the
detector works directly on them:

  1. group a page's chars into visual ROWS by baseline y;
  2. split each row into CELLS on x-gaps > ``gap_factor`` × median glyph
     width;
  3. a TABLE is a maximal run of ≥2 consecutive rows with ≥2 cells each
     whose cell left-edges align within ``col_tol`` (the ±5 px pivot rule)
     and ≥5 cells total (ref filter: ≥2 multi-cell columns, ≥5 cells,
     ``table_detection.py:6-61``).

Accuracy-style filter analog: rows whose cell count disagrees with the
modal column count by more than 1 break the run (ref: accuracy ≥ 60,
``camelot/camelot.py:79``).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .pdf_extract import PdfPageIR

_COL_TOL = 5.0
_GAP_FACTOR = 2.0
_Y_TOL = 2.0


def _page_rows(page: PdfPageIR) -> List[List[Tuple[float, float, str, float]]]:
    """All chars of a page grouped into baseline rows, sorted top-down,
    chars left-to-right. Each char: (x, y, ch, w)."""
    chars = [(c.bbox[0], c.bbox[1], c.ch, c.bbox[2])
             for b in page.blocks for line in b.lines for c in line]
    if not chars:
        return []
    chars.sort(key=lambda t: (-t[1], t[0]))
    rows: List[List[Tuple[float, float, str, float]]] = []
    for ch in chars:
        if rows and abs(rows[-1][0][1] - ch[1]) <= _Y_TOL:
            rows[-1].append(ch)
        else:
            rows.append([ch])
    return rows


def _row_cells(row) -> List[Tuple[float, float, str]]:
    """Split one baseline row into cells on large x-gaps.
    Returns [(left, right, text)]."""
    widths = [w for _x, _y, _c, w in row if w > 0]
    med_w = float(np.median(widths)) if widths else 6.0
    gap = _GAP_FACTOR * med_w
    cells: List[Tuple[float, float, List[str]]] = []
    for x, _y, c, w in row:
        if cells and x - cells[-1][1] <= gap:
            left, _right, parts = cells[-1]
            parts.append(c)
            cells[-1] = (left, x + w, parts)
        else:
            cells.append((x, x + w, [c]))
    return [(l, r, "".join(p).strip()) for l, r, p in cells
            if "".join(p).strip()]


def _aligned(cols_a: List[float], cols_b: List[float]) -> bool:
    """Two rows align when every left edge of the smaller set is within
    _COL_TOL of some left edge of the other."""
    small, big = (cols_a, cols_b) if len(cols_a) <= len(cols_b) else (cols_b, cols_a)
    return all(any(abs(x - y) <= _COL_TOL for y in big) for x in small)


def detect_pdf_tables(page: PdfPageIR, page_number: int) -> List[dict]:
    """Detect tables on one page. Returns table dicts in the engine's
    output schema (page, left, top, width, height, cells)."""
    rows = _page_rows(page)
    cell_rows = [(_row_cells(r), r) for r in rows]
    tables: List[dict] = []
    run: List[Tuple[List[Tuple[float, float, str]], list]] = []

    def flush():
        nonlocal run
        if len(run) >= 2:
            n_cells = sum(len(c) for c, _r in run)
            n_cols = max(len(c) for c, _r in run)
            if n_cols >= 2 and n_cells >= 5:
                # column grid = union of left edges of the widest row
                widest = max((c for c, _r in run), key=len)
                col_lefts = [l for l, _r2, _t in widest]
                matrix = []
                lefts, tops, rights = [], [], []
                for cells, _r in run:
                    rowvals = [""] * n_cols
                    for l, r2, text in cells:
                        j = int(np.argmin([abs(l - cl) for cl in col_lefts]))
                        rowvals[j] = (rowvals[j] + " " + text).strip()
                        lefts.append(l)
                        rights.append(r2)
                    tops.append(_r[0][1])
                    matrix.append(rowvals)
                left = min(lefts)
                top = max(tops)      # PDF y grows upward; top = max y
                height = top - min(tops)
                width = max(rights) - left
                tables.append({
                    "page": page_number, "left": float(left),
                    "top": float(top), "width": float(width),
                    "height": float(height), "cells": matrix,
                })
        run = []

    for cells, r in cell_rows:
        if len(cells) >= 2:
            if run and not _aligned([l for l, _r2, _t in run[-1][0]],
                                    [l for l, _r2, _t in cells]):
                flush()
            run.append((cells, r))
        else:
            flush()
    flush()
    return tables

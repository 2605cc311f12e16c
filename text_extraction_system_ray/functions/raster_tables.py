"""Raster-side table detection for scanned (needs-OCR) pages.

Numpy port of the reference's cv2 morphological cell-cluster detector
(``ocr/tables/table_detection.py:311-445``): blur → Otsu inverse
threshold → small-kernel dilation for CELL contours and wide-kernel
dilation for PARAGRAPH/table blocks → cluster cells into columns by
left/middle/right pivots within ±tolerance → keep blocks with ≥2
multi-cell columns, ≥5 cells and ≥15 % cell-area coverage
(``table_detection.py:6-61`` settings, ``:420-445`` filters).

The char-box detector (``pdf_tables.py``) covers born-digital pages;
this module covers pages where no char boxes exist — the raster IS the
evidence. cv2 primitives are replaced with separable binary dilation
(cumsum window-any), a cumsum box blur, and run-based union-find
connected components; "contour is rectangle-ish" becomes pixel-fill ≥
share × bbox area (a filled dilated blob has contourArea ≈ fill)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .raster import otsu_threshold

# reference defaults (table_detection.py:6-61)
PIVOT_TOL = 5
BLUR_RADIUS = 11
MAX_DIM = 1200
MIN_DIM = 950
CELL_KERNEL = (2, 33)          # (rows, cols) — cv2 (33, 2) is (w, h)
CELL_ITERS = 1
PARA_KERNEL = (3, 80)
PARA_ITERS = 5
RECT_FILL_SHARE = 0.75
MIN_COLUMNS = 2
MIN_CELLS = 5
CELL_AREA_SHARE = 0.15
MAX_COLUMN_SPAN_PART = 0.3
THIN_LINE_KERNEL = 25


def _window_any_1d(mask: np.ndarray, w: int, axis: int) -> np.ndarray:
    """Binary dilation along one axis with a centered length-``w``
    window — O(n) via cumsum (window-any == positive window-sum)."""
    if w <= 1:
        return mask
    left = (w - 1) // 2
    c = np.cumsum(mask.astype(np.int32), axis=axis)
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0)
    c = np.pad(c, pad)                    # c[j] = sum(mask[:j])
    n = mask.shape[axis]
    i = np.arange(n)
    hi = np.clip(i - left + w, 0, n)
    lo = np.clip(i - left, 0, n)
    return (np.take(c, hi, axis=axis)
            - np.take(c, lo, axis=axis)) > 0


def _dilate(mask: np.ndarray, kernel: Tuple[int, int],
            iterations: int) -> np.ndarray:
    """Iterated rect dilation == one dilation with the Minkowski-grown
    rect ((k-1)·iters + 1 per axis); separable row/col passes."""
    kh = (kernel[0] - 1) * iterations + 1
    kw = (kernel[1] - 1) * iterations + 1
    out = _window_any_1d(mask, kw, axis=1)
    return _window_any_1d(out, kh, axis=0)


def _erode_1d(mask: np.ndarray, w: int, axis: int) -> np.ndarray:
    return ~_window_any_1d(~mask, w, axis)


def _box_blur(img: np.ndarray, rad: int) -> np.ndarray:
    """Square mean filter (the Gaussian's role here is only to fuse
    glyphs before Otsu — a box kernel of the same radius does that)."""
    if rad <= 1:
        return img
    c = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    left = (rad - 1) // 2
    H, W = img.shape
    r0 = np.clip(np.arange(H) - left, 0, H)
    r1 = np.clip(np.arange(H) - left + rad, 0, H)
    c0 = np.clip(np.arange(W) - left, 0, W)
    c1 = np.clip(np.arange(W) - left + rad, 0, W)
    area = ((r1 - r0)[:, None] * (c1 - c0)[None, :]).astype(np.float64)
    s = (c[np.ix_(r1, c1)] - c[np.ix_(r0, c1)]
         - c[np.ix_(r1, c0)] + c[np.ix_(r0, c0)])
    return (s / area).astype(np.uint8)


def _components(mask: np.ndarray) -> List[Tuple[int, int, int, int, int]]:
    """Run-based union-find connected components (4-connectivity).
    Returns [(x, y, w, h, n_pixels)]."""
    H, W = mask.shape
    parent: List[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    prev_runs: List[Tuple[int, int, int]] = []   # (start, end, label)
    all_runs: List[Tuple[int, int, int, int]] = []  # (row, start, end, lbl)
    for r in range(H):
        row = mask[r]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if row[0]:
            starts = np.concatenate([[0], starts])
        if row[-1]:
            ends = np.concatenate([ends, [W]])
        runs = []
        pi = 0
        for s, e in zip(starts, ends):
            lbl = -1
            while pi < len(prev_runs) and prev_runs[pi][1] <= s:
                pi += 1
            j = pi
            while j < len(prev_runs) and prev_runs[j][0] < e:
                if lbl < 0:
                    lbl = prev_runs[j][2]
                else:
                    union(lbl, prev_runs[j][2])
                j += 1
            if lbl < 0:
                lbl = len(parent)
                parent.append(lbl)
            runs.append((int(s), int(e), lbl))
            all_runs.append((r, int(s), int(e), lbl))
        prev_runs = runs
    boxes: Dict[int, List[int]] = {}
    for r, s, e, lbl in all_runs:
        root = find(lbl)
        b = boxes.get(root)
        if b is None:
            boxes[root] = [s, r, e, r + 1, e - s]
        else:
            b[0] = min(b[0], s)
            b[1] = min(b[1], r)
            b[2] = max(b[2], e)
            b[3] = max(b[3], r + 1)
            b[4] += e - s
    return [(x0, y0, x1 - x0, y1 - y0, n)
            for x0, y0, x1, y1, n in boxes.values()]


# ------------------------------------------------ cluster-column logic

@dataclass
class _Cell:
    x: float
    y: float
    w: float
    h: float

    @property
    def area(self) -> float:
        return self.w * self.h

    def coord(self, pivot: str) -> float:
        if pivot == "l":
            return self.x
        if pivot == "r":
            return self.x + self.w
        if pivot == "m":
            return self.x + self.w / 2
        return self.y + self.h            # 'b'


@dataclass
class _Cluster:
    pivot: str
    cells: List[_Cell] = field(default_factory=list)
    lo: float = 0.0
    hi: float = 0.0

    def try_add(self, cell: _Cell) -> bool:
        p = cell.coord(self.pivot)
        if not self.cells:
            self.cells = [cell]
            self.lo = self.hi = p
            return True
        if min(abs(p - self.lo), abs(p - self.hi)) > PIVOT_TOL:
            return False
        self.cells.append(cell)
        self.lo = min(self.lo, p)
        self.hi = max(self.hi, p)
        return True

    @property
    def area(self) -> float:
        return sum(c.area for c in self.cells)

    def bounding(self) -> Optional[Tuple[float, float, float, float]]:
        if not self.cells:
            return None
        x0 = min(c.x for c in self.cells)
        y0 = min(c.y for c in self.cells)
        x1 = max(c.x + c.w for c in self.cells)
        y1 = max(c.y + c.h for c in self.cells)
        return x0, y0, x1 - x0, y1 - y0

    def drop_distant(self) -> None:
        if len(self.cells) < 3:
            return
        mid = sum(c.coord(self.pivot) for c in self.cells) / len(self.cells)
        self.cells = [c for c in self.cells
                      if abs(c.coord(self.pivot) - mid) <= PIVOT_TOL]

    def overlaps(self, other: "_Cluster") -> bool:
        a, b = self.bounding(), other.bounding()
        if a is None or b is None:
            return False
        al, ar = a[0], a[0] + a[2]
        bl, br = b[0], b[0] + b[2]
        span = max(0.0, min(ar, br) - max(al, bl))
        return span > min(a[2], b[2]) * MAX_COLUMN_SPAN_PART


class _Block:
    def __init__(self, x: float, y: float, w: float, h: float):
        self.x, self.y, self.w, self.h = x, y, w, h
        self.by_pivot: Dict[str, List[_Cluster]] = {
            "l": [], "m": [], "r": []}
        self.columns: List[_Cluster] = []

    @property
    def area(self) -> float:
        return self.w * self.h

    def contains(self, c: _Cell) -> bool:
        return (self.x <= c.x and c.x + c.w <= self.x + self.w
                and self.y <= c.y and c.y + c.h <= self.y + self.h)

    def try_add(self, cell: _Cell) -> bool:
        if not self.contains(cell):
            return False
        for pivot, clusters in self.by_pivot.items():
            for cl in clusters:
                if cl.try_add(cell):
                    break
            else:
                nc = _Cluster(pivot)
                nc.try_add(cell)
                clusters.append(nc)
        return True

    def finalize(self) -> None:
        for clusters in self.by_pivot.values():
            for cl in clusters:
                cl.drop_distant()
            clusters.sort(key=lambda cl: len(cl.cells), reverse=True)
            # a cell stays only in its biggest cluster
            for i in range(len(clusters) - 1):
                keep = set(id(c) for c in clusters[i].cells)
                for j in range(i + 1, len(clusters)):
                    clusters[j].cells = [c for c in clusters[j].cells
                                         if id(c) not in keep]
            # overlapping columns: the smaller (by cell area) is consumed
            for i in range(len(clusters) - 1):
                a = clusters[i]
                if not a.cells:
                    continue
                for j in range(i + 1, len(clusters)):
                    b = clusters[j]
                    if b.cells and a.overlaps(b):
                        if a.area < b.area:
                            a.cells = []
                            break
                        b.cells = []
        fams = [[c for c in self.by_pivot[k] if c.cells]
                for k in ("l", "m", "r")]
        fams.sort(key=lambda cl: sum(len(c.cells) for c in cl),
                  reverse=True)
        self.columns = fams[0]


def detect_raster_tables(img: np.ndarray) -> List[dict]:
    """Table regions on a grayscale page raster (255 = paper).
    Returns [{"x", "y", "w", "h"}] in ORIGINAL image coordinates
    (y down from the top), mirroring ``TableDetector.find_tables``."""
    if img.ndim != 2 or img.size == 0:
        return []
    scale = 1.0
    max_dim = max(img.shape)
    if max_dim > MAX_DIM:
        scale = max_dim / MAX_DIM
    elif max_dim < MIN_DIM:
        scale = max_dim / MIN_DIM
    if scale != 1.0:
        h = max(1, round(img.shape[0] / scale))
        w = max(1, round(img.shape[1] / scale))
        if scale > 1.0:
            # area-average before decimating (plain nearest-neighbor
            # aliases 1-2 px glyph strokes out of existence — cv2.resize
            # averages too)
            img = _box_blur(img, int(np.ceil(scale)) | 1)
        ri = np.clip((np.arange(h) * scale).astype(np.int64), 0,
                     img.shape[0] - 1)
        ci = np.clip((np.arange(w) * scale).astype(np.int64), 0,
                     img.shape[1] - 1)
        img = img[np.ix_(ri, ci)]

    thr = otsu_threshold(img)
    ink = img <= thr
    # remove thin horizontal rules so rows don't fuse
    # (morph-open with a (25,1) line kernel, table_detection.py:382-393)
    lines = _window_any_1d(_erode_1d(ink, THIN_LINE_KERNEL, axis=1),
                           THIN_LINE_KERNEL, axis=1)
    img = np.where(lines & ink, np.uint8(255), img)

    blur = _box_blur(img, BLUR_RADIUS)
    thr = otsu_threshold(blur)
    mask = blur <= thr

    cell_mask = _dilate(mask, CELL_KERNEL, CELL_ITERS)
    cells = [_Cell(x, y, w, h) for x, y, w, h, n in _components(cell_mask)
             if n >= RECT_FILL_SHARE * w * h]
    para_mask = _dilate(mask, PARA_KERNEL, PARA_ITERS)
    blocks = [_Block(x, y, w, h)
              for x, y, w, h, _n in _components(para_mask)]

    for cell in cells:
        for blk in blocks:
            if blk.try_add(cell):
                break
    out: List[dict] = []
    for blk in blocks:
        blk.finalize()
        n_cells = sum(len(c.cells) for c in blk.columns)
        n_cols = sum(1 for c in blk.columns if len(c.cells) > 1)
        cell_area = sum(c.area for c in blk.columns)
        if (n_cols >= MIN_COLUMNS and n_cells >= MIN_CELLS
                and cell_area >= CELL_AREA_SHARE * blk.area):
            out.append({"x": blk.x * scale, "y": blk.y * scale,
                        "w": blk.w * scale, "h": blk.h * scale})
    return out

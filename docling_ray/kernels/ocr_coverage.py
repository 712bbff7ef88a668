"""OCR trigger logic: bitmap-coverage mask → OCR rectangles.

Behavioral port of ``BaseOcrModel.get_ocr_rects``
(``/root/reference/docling/models/base_ocr_model.py:40-112``) without
PIL/scipy (absent in this runtime), reproducing the exact pixel
semantics:

- bitmap rects are rounded and drawn INCLUSIVE of both endpoints (PIL
  ``draw.rectangle`` semantics);
- binary dilation by a 20×20 ones structure with scipy's default origin
  (center index 10) expands each rect by 10 px left/up and 9 px
  right/down;
- connected components use 4-connectivity on the dilated mask — for
  unions of axis-aligned rects that is exactly: overlap (≥1 shared pixel
  row/column) in one axis and distance ≤ 1 in the other, resolved
  transitively with union-find;
- each component's bounding box is ``find_objects`` style (inclusive
  stops), clipped to the image;
- coverage fraction = dilated mask area / (width · height), mask area
  computed by rasterizing the expanded rects (exact union area);
- decision: full-page rect when forced or coverage >
  max(0.75, bitmap_area_threshold); per-component rects when coverage >
  bitmap_area_threshold (default 0.05, ``pipeline_options.py:79``);
  else no OCR.
"""

from __future__ import annotations

import numpy as np

BITMAP_COVERAGE_THRESHOLD = 0.75
_DILATE_NEG = 10   # structure center index 10 of a 20-wide ones kernel
_DILATE_POS = 9


def _expanded(rects: list[tuple[float, float, float, float]],
              width: int, height: int) -> list[tuple[int, int, int, int]]:
    out = []
    for l, t, r, b in rects:
        l, t, r, b = round(l), round(t), round(r), round(b)
        # clip the RAW rect to the page FIRST (the reference draws rects
        # into a page-sized image — clipping — before dilation); a rect
        # fully off-page must not leave a phantom dilated strip near the
        # edge that could flip the OCR-trigger decision
        l = max(0, l)
        t = max(0, t)
        r = min(width - 1, r)
        b = min(height - 1, b)
        if r < l or b < t:
            continue
        el = max(0, l - _DILATE_NEG)
        et = max(0, t - _DILATE_NEG)
        er = min(width - 1, r + _DILATE_POS)
        eb = min(height - 1, b + _DILATE_POS)
        if er >= el and eb >= et:
            out.append((el, et, er, eb))
    return out


def _connected(a: tuple[int, int, int, int],
               b: tuple[int, int, int, int]) -> bool:
    """4-connectivity between two inclusive integer rects: pixel overlap
    in one axis, distance ≤ 1 in the other."""
    x_ov = a[0] <= b[2] and b[0] <= a[2]
    y_ov = a[1] <= b[3] and b[1] <= a[3]
    x_adj = a[0] <= b[2] + 1 and b[0] <= a[2] + 1
    y_adj = a[1] <= b[3] + 1 and b[1] <= a[3] + 1
    return (x_ov and y_adj) or (y_ov and x_adj)


def find_ocr_rects(size: tuple[float, float],
                   bitmap_rects: list[tuple[float, float, float, float]]
                   ) -> tuple[float, list[tuple[int, int, int, int]]]:
    """(coverage fraction, component bounding boxes) — the
    ``find_ocr_rects`` inner function of the reference."""
    width, height = round(size[0]), round(size[1])
    if width <= 0 or height <= 0:
        return 0.0, []
    rects = _expanded(bitmap_rects, width, height)
    if not rects:
        return 0.0, []
    # union-find over rect adjacency (transitive = scipy label components)
    parent = list(range(len(rects)))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            if _connected(rects[i], rects[j]):
                parent[find(i)] = find(j)
    comps: dict[int, list[int]] = {}
    for i in range(len(rects)):
        comps.setdefault(find(i), []).append(i)
    boxes = []
    for members in comps.values():
        boxes.append((
            min(rects[i][0] for i in members),
            min(rects[i][1] for i in members),
            max(rects[i][2] for i in members),
            max(rects[i][3] for i in members),
        ))
    boxes.sort(key=lambda b: (b[1], b[0]))
    # exact union area via rasterization (page-sized bool grid)
    mask = np.zeros((height, width), dtype=bool)
    for l, t, r, b in rects:
        mask[t:b + 1, l:r + 1] = True
    coverage = float(mask.sum()) / (size[0] * size[1])
    return coverage, boxes


def get_ocr_rects(size: tuple[float, float],
                  bitmap_rects: list[tuple[float, float, float, float]],
                  bitmap_area_threshold: float = 0.05,
                  force_full_page_ocr: bool = False
                  ) -> list[tuple[float, float, float, float]]:
    """The OCR-trigger decision of ``get_ocr_rects`` (``:88-112``)."""
    coverage, boxes = find_ocr_rects(size, bitmap_rects)
    if force_full_page_ocr or coverage > max(BITMAP_COVERAGE_THRESHOLD,
                                             bitmap_area_threshold):
        return [(0.0, 0.0, size[0], size[1])]
    if coverage > bitmap_area_threshold:
        return [(float(l), float(t), float(r), float(b))
                for l, t, r, b in boxes]
    return []

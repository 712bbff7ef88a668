"""Tesseract box/orientation utilities.

Behavioral port of ``/root/reference/docling/utils/ocr_utils.py:9-69`` and
``/root/reference/docling/utils/orientation.py:9-65``: script-name
normalization, clockwise→counterclockwise orientation conversion, and the
corner-wise rotation of a top-left box into a bounding rectangle
(including the reference's corner assignments, preserved verbatim).

A bounding rectangle is an 8-tuple-like dict of corner coordinates
``r_x0..r_y3`` in TOPLEFT origin, corner 0 at the bottom-left of the
(unrotated) text line and the others counterclockwise.
"""

from __future__ import annotations

from typing import Optional

CLIPPED_ORIENTATIONS = [0, 90, 180, 270]


def map_tesseract_script(script: str) -> str:
    if script in ("Katakana", "Hiragana"):
        return "Japanese"
    if script == "Han":
        return "HanS"
    if script == "Korean":
        return "Hangul"
    return script


def parse_tesseract_orientation(orientation: str) -> int:
    """Tesseract reports [0, 90, 180, 270] clockwise; rectangle angles are
    counterclockwise in [0, 360)."""
    parsed = int(orientation)
    if parsed not in CLIPPED_ORIENTATIONS:
        raise ValueError(
            f"invalid tesseract document orientation {orientation}, "
            f"expected orientation: {sorted(CLIPPED_ORIENTATIONS)}")
    return (-parsed) % 360


def _rectangle(x0, y0, x1, y1, x2, y2, x3, y3) -> dict:
    return {"r_x0": x0, "r_y0": y0, "r_x1": x1, "r_y1": y1,
            "r_x2": x2, "r_y2": y2, "r_x3": x3, "r_y3": y3}


def rotate_bounding_box(bbox: tuple[float, float, float, float], angle: int,
                        im_size: tuple[float, float]) -> dict:
    """(l, t, r, b) TOPLEFT box rotated by a clipped angle → corner dict
    (``orientation.py:9-65``, corner assignments verbatim)."""
    l, t, r, b = bbox
    width, height = r - l, b - t
    im_w, im_h = im_size
    angle = angle % 360
    if angle == 0:
        return _rectangle(l, b, r, b, r, t, l, t)
    if angle == 90:
        r_x0 = t + height
        r_y0 = im_w - l
        r_x1 = r_x0
        r_y1 = r_y0 - width
        r_x2 = r_x1 - height
        r_y2 = r_y1
        r_x3 = r_x2
        r_y3 = r_y0
        return _rectangle(r_x0, r_y0, r_x1, r_y1, r_x2, r_y2, r_x3, r_y3)
    if angle == 180:
        r_x0 = im_w - l
        r_y0 = im_h - (t + height)
        r_x1 = r_x0 - width
        r_y1 = r_y0
        r_x2 = r_x1
        r_y2 = r_y1 + height
        r_x3 = r_x0
        r_y3 = r_y2
        return _rectangle(r_x0, r_y0, r_x1, r_y1, r_x2, r_y2, r_x3, r_y3)
    if angle == 270:
        r_x0 = im_h - (t + height)
        r_y0 = l
        r_x1 = r_x0
        r_y1 = r_y0 + width
        r_x2 = r_x1 + height
        r_y2 = r_y1
        r_x3 = r_x2
        r_y3 = r_y0
        return _rectangle(r_x0, r_y0, r_x1, r_y1, r_x2, r_y2, r_x3, r_y3)
    raise ValueError(f"invalid orientation {angle}, expected values in: "
                     f"{sorted(CLIPPED_ORIENTATIONS)}")


def tesseract_box_to_bounding_rectangle(
        bbox: tuple[float, float, float, float], *,
        original_offset: Optional[tuple[float, float]] = None,
        scale: float, orientation: int,
        im_size: tuple[float, float]) -> dict:
    """Rotate, unscale, then shift by the crop offset
    (``ocr_utils.py:35-69``)."""
    rect = rotate_bounding_box(bbox, angle=orientation, im_size=im_size)
    rect = {k: v / scale for k, v in rect.items()}
    if original_offset is not None:
        off_l, off_t = original_offset
        for k in rect:
            rect[k] += off_l if k.startswith("r_x") else off_t
    return rect

"""OCR coverage-mask and tesseract-utility tests.

The coverage tests validate the rect-algebra implementation against a
brute-force pixel reference that mirrors scipy's semantics exactly
(binary_dilation with a 20x20 ones structure, center (10,10); 4-connected
labeling; find_objects inclusive boxes)."""

import numpy as np
import pytest

from docling_ray.kernels.ocr_coverage import find_ocr_rects, get_ocr_rects


def _brute_force(size, rects):
    width, height = round(size[0]), round(size[1])
    mask = np.zeros((height, width), dtype=bool)
    for l, t, r, b in rects:
        l, t, r, b = round(l), round(t), round(r), round(b)
        mask[max(0, t):b + 1, max(0, l):r + 1] = True  # PIL inclusive draw
    # dilation by 20x20 ones, center (10,10): output j on iff any input in
    # [j-9 .. j+10] per axis  (j - i in [-10, 9] => i in [j-9, j+10])
    dil = np.zeros_like(mask)
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys, xs):
        dil[max(0, y - 10):y + 10, max(0, x - 10):x + 10] = True
    # 4-connected labeling via BFS
    labels = np.zeros(dil.shape, dtype=int)
    nxt = 0
    boxes = []
    for y in range(height):
        for x in range(width):
            if dil[y, x] and not labels[y, x]:
                nxt += 1
                stack = [(y, x)]
                labels[y, x] = nxt
                miny = maxy = y
                minx = maxx = x
                while stack:
                    cy, cx = stack.pop()
                    miny, maxy = min(miny, cy), max(maxy, cy)
                    minx, maxx = min(minx, cx), max(maxx, cx)
                    for ny, nx_ in ((cy - 1, cx), (cy + 1, cx),
                                    (cy, cx - 1), (cy, cx + 1)):
                        if (0 <= ny < height and 0 <= nx_ < width
                                and dil[ny, nx_] and not labels[ny, nx_]):
                            labels[ny, nx_] = nxt
                            stack.append((ny, nx_))
                boxes.append((minx, miny, maxx, maxy))
    coverage = dil.sum() / (size[0] * size[1])
    return coverage, sorted(boxes, key=lambda b: (b[1], b[0]))


@pytest.mark.parametrize("rects", [
    [(50, 50, 80, 70)],
    [(50, 50, 80, 70), (85, 50, 120, 70)],          # bridged by dilation
    [(10, 10, 30, 30), (200, 200, 250, 260)],       # two far components
    [(0, 0, 15, 15)],                               # clipped at origin
    [(10, 10, 40, 40), (45, 45, 80, 80), (85, 10, 120, 40)],  # chain
])
def test_components_match_pixel_reference(rects):
    size = (300.0, 300.0)
    cov, boxes = find_ocr_rects(size, rects)
    exp_cov, exp_boxes = _brute_force(size, rects)
    assert boxes == exp_boxes
    assert cov == pytest.approx(exp_cov, abs=1e-12)


def test_decision_thresholds():
    size = (100.0, 100.0)
    # tiny bitmap: below 5% threshold -> no OCR
    assert get_ocr_rects(size, [(0, 0, 5, 5)]) == []
    # mid coverage -> component rects
    rects = get_ocr_rects(size, [(10, 10, 60, 60)])
    assert len(rects) == 1 and rects[0] != (0.0, 0.0, 100.0, 100.0)
    # dominant coverage -> full page
    assert get_ocr_rects(size, [(0, 0, 99, 99)]) == [(0.0, 0.0, 100.0, 100.0)]
    # forced -> full page regardless
    assert get_ocr_rects(size, [], force_full_page_ocr=True) == \
        [(0.0, 0.0, 100.0, 100.0)]


def test_parse_orientation_and_script():
    from docling_ray.kernels.ocr_utils import (
        map_tesseract_script,
        parse_tesseract_orientation,
    )

    assert parse_tesseract_orientation("0") == 0
    assert parse_tesseract_orientation("90") == 270
    assert parse_tesseract_orientation("180") == 180
    assert parse_tesseract_orientation("270") == 90
    with pytest.raises(ValueError):
        parse_tesseract_orientation("45")
    assert map_tesseract_script("Katakana") == "Japanese"
    assert map_tesseract_script("Han") == "HanS"
    assert map_tesseract_script("Korean") == "Hangul"
    assert map_tesseract_script("Latin") == "Latin"


def test_rotate_bounding_box_corners():
    from docling_ray.kernels.ocr_utils import rotate_bounding_box

    box = (10, 20, 40, 30)  # w=30 h=10
    im = (200, 100)
    r0 = rotate_bounding_box(box, 0, im)
    assert (r0["r_x0"], r0["r_y0"], r0["r_x2"], r0["r_y2"]) == (10, 30, 40, 20)
    r90 = rotate_bounding_box(box, 90, im)
    # reference corner assignments verbatim (orientation.py:22-29)
    assert (r90["r_x0"], r90["r_y0"]) == (30, 190)
    assert (r90["r_x1"], r90["r_y1"]) == (30, 160)
    assert (r90["r_x2"], r90["r_y2"]) == (20, 160)
    assert (r90["r_x3"], r90["r_y3"]) == (20, 190)
    r180 = rotate_bounding_box(box, 180, im)
    assert (r180["r_x0"], r180["r_y0"]) == (190, 70)
    r270 = rotate_bounding_box(box, 270, im)
    assert (r270["r_x0"], r270["r_y0"]) == (70, 10)
    with pytest.raises(ValueError):
        rotate_bounding_box(box, 45, im)


def test_tesseract_box_scale_and_offset():
    from docling_ray.kernels.ocr_utils import tesseract_box_to_bounding_rectangle

    rect = tesseract_box_to_bounding_rectangle(
        (10, 20, 40, 30), scale=2.0, orientation=0, im_size=(200, 100),
        original_offset=(100, 50))
    assert rect["r_x0"] == 10 / 2 + 100
    assert rect["r_y0"] == 30 / 2 + 50
    assert rect["r_x2"] == 40 / 2 + 100
    assert rect["r_y2"] == 20 / 2 + 50


def test_off_page_rect_no_phantom_dilation():
    """A bitmap rect lying fully off-page (but within dilation reach of an
    edge) must contribute NOTHING: the reference clips rects into the
    page-sized image BEFORE dilating, so there is no pixel to dilate."""
    from docling_ray.kernels.ocr_coverage import find_ocr_rects

    cov, boxes = find_ocr_rects((100, 100), [(-9.0, 10.0, -1.0, 30.0)])
    assert cov == 0.0
    assert boxes == []
    # an on-page rect still dilates past its raw bounds as before
    cov2, boxes2 = find_ocr_rects((100, 100), [(20.0, 20.0, 30.0, 30.0)])
    assert cov2 > 0.0
    assert boxes2 == [(10, 10, 39, 39)]

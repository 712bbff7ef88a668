"""Two-phase pdfium cell merge semantics against synthetic rect fixtures
(``/root/reference/docling/backend/pypdfium2_backend.py:120-252``)."""

from docling_ray.kernels.pdf_assemble import BBox, Cell
from docling_ray.kernels.pdfium_cells import (
    group_rows,
    merge_horizontal_cells,
    merge_row,
)


def cell(i, text, l, t, r, b):
    return Cell(index=i, text=text, bbox=BBox(l, t, r, b))


def test_fragments_in_row_merge():
    cells = [
        cell(0, "Hel", 10, 100, 28, 112),
        cell(1, "lo", 30, 100, 40, 112),      # gap 2 <= avg height 12
        cell(2, "world", 60, 100, 95, 112),   # gap 20 > 12: separate
    ]
    out = merge_horizontal_cells(cells)
    assert [c.text for c in out] == ["Hello", "world"]
    assert (out[0].bbox.l, out[0].bbox.t, out[0].bbox.r, out[0].bbox.b) == \
        (10, 100, 40, 112)
    assert [c.index for c in out] == [1, 2]  # re-indexed from 1 (quirk)


def test_row_grouping_running_extent():
    # second cell slightly offset but within half row height; third far below
    cells = [
        cell(0, "a", 10, 100, 20, 112),
        cell(1, "b", 25, 104, 35, 116),   # |t-100|=4 <= 6, |b-112|=4 <= 6
        cell(2, "c", 10, 130, 20, 142),
    ]
    rows = group_rows(cells)
    assert [len(r) for r in rows] == [2, 1]
    # running extent widened by the second member
    assert rows[0][0].bbox.t == 100 and rows[0][1].bbox.b == 116


def test_vertical_threshold_scales_with_row_height():
    # tall row: threshold grows; short row: strict
    tall = [
        cell(0, "x", 10, 100, 20, 140),   # height 40 -> threshold 20
        cell(1, "y", 25, 115, 35, 155),
    ]
    assert len(group_rows(tall)) == 1
    short = [
        cell(0, "x", 10, 100, 20, 106),   # height 6 -> threshold 3
        cell(1, "y", 25, 115, 35, 121),
    ]
    assert len(group_rows(short)) == 2


def test_merge_gap_uses_average_height():
    # prev height 10, next height 30 -> avg 20 allows gap up to 20
    row = [
        cell(0, "A", 10, 100, 20, 110),
        cell(1, "B", 39, 95, 50, 125),
    ]
    out = merge_row(row)
    assert len(out) == 1 and out[0].text == "AB"


def test_custom_reader_used_for_merged_text():
    cells = [
        cell(0, "fr", 10, 100, 20, 112),
        cell(1, "ag", 21, 100, 30, 112),
    ]
    out = merge_horizontal_cells(cells, read_text=lambda b: "REREAD")
    assert [c.text for c in out] == ["REREAD"]


def test_single_cells_pass_through_unmerged():
    cells = [cell(0, "only", 10, 100, 50, 112)]
    out = merge_horizontal_cells(cells)
    assert [c.text for c in out] == ["only"]
    assert out[0].index == 1
    assert merge_horizontal_cells([]) == []


# -- fake-injected native-slot tests (the libs never ship in this runtime,
# but the argument plumbing, y-flip and 1.5x render math must be real) ----

class _FakeImage:
    def __init__(self, log):
        self.log = log

    def resize(self, size):
        self.log["resize"] = size
        return ("resized", size)


class _FakeBitmap:
    def __init__(self, log):
        self.log = log

    def to_pil(self):
        return _FakeImage(self.log)


class _FakeTextPage:
    """Tiny pdfium-coordinate (y-up) text page: two fragments on one line
    plus one far-right fragment.  get_text_bounded answers from the rect
    list so the merged re-read is observable."""

    def __init__(self, rects, texts, log):
        self.rects = rects      # (x0, y0, x1, y1) y-up
        self.texts = texts
        self.log = log

    def count_rects(self):
        return len(self.rects)

    def get_rect(self, i):
        return self.rects[i]

    def get_text_bounded(self, x0, y0, x1, y1):
        self.log.setdefault("bounded_calls", []).append((x0, y0, x1, y1))
        out = [t for (a, b, c, d), t in zip(self.rects, self.texts)
               if a >= x0 - 1e-6 and c <= x1 + 1e-6
               and b >= y0 - 1e-6 and d <= y1 + 1e-6]
        return "".join(out)


class _FakePage:
    def __init__(self, width, height, textpage, log):
        self._w, self._h = width, height
        self._tp = textpage
        self.log = log

    def get_width(self):
        return self._w

    def get_height(self):
        return self._h

    def render(self, scale):
        self.log["render_scale"] = scale
        return _FakeBitmap(self.log)

    def get_textpage(self):
        return self._tp


class _FakePdfium:
    def __init__(self, page):
        self._page = page

    def PdfDocument(self, raw):
        self._raw = raw
        return {0: self._page}


def test_render_page_scale_math_via_fake():
    from docling_ray.kernels.pdfium_cells import render_page

    log = {}
    page = _FakePage(612.0, 792.0, None, log)
    out = render_page(b"%PDF-fake", page_no=0, scale=2.0,
                      pdfium_module=_FakePdfium(page))
    # rasterize at 1.5x the requested scale, then resize to scale x page
    assert log["render_scale"] == 3.0
    assert log["resize"] == (1224, 1584)
    assert out == ("resized", (1224, 1584))


def test_compute_text_cells_via_fake_yflip_and_bounded_reread():
    from docling_ray.kernels.pdfium_cells import compute_text_cells

    log = {}
    height = 100.0
    # pdfium rects are y-UP: y0 bottom, y1 top.  Two close fragments on one
    # line (gap 2 < avg height 10) and one far fragment (gap 50 > 10).
    rects = [(10.0, 80.0, 30.0, 90.0),
             (32.0, 80.0, 50.0, 90.0),
             (100.0, 80.0, 120.0, 90.0)]
    texts = ["Hel", "lo", "far"]
    tp = _FakeTextPage(rects, texts, log)
    page = _FakePage(612.0, height, tp, log)
    cells = compute_text_cells(b"%PDF-fake", page_no=0,
                               pdfium_module=_FakePdfium(page))
    assert [c.text for c in cells] == ["Hello", "far"]
    # y-flip: pdfium (y0=80, y1=90) -> top-left t=100-90=10, b=100-80=20
    assert (cells[0].bbox.t, cells[0].bbox.b) == (10.0, 20.0)
    # merged cell indices re-based at 1 (reference quirk)
    assert [c.index for c in cells] == [1, 2]
    # the merged text was RE-READ from the union bbox in pdfium coords
    # (x0, height-b, x1, height-t) = (10, 80, 50, 90) - after the initial
    # three per-rect reads
    assert log["bounded_calls"][3] == (10.0, 80.0, 50.0, 90.0)

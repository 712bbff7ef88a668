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

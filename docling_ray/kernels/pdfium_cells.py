"""pypdfium2 text-cell computation: the two-phase fragment merge.

Behavioral port of ``PyPdfiumPageBackend._compute_text_cells``
(``/root/reference/docling/backend/pypdfium2_backend.py:120-252``) as pure
functions over plain cells, so the semantics are testable against
synthetic rect fixtures without the native library:

- **phase 1 (row grouping)**: sequential scan; a cell joins the current
  row when both its top and bottom are within ``row_height·0.5`` of the
  row's running top/bottom; the row extent (and hence the threshold)
  updates as members join.
- **phase 2 (horizontal merge)**: within a row, adjacent cells merge when
  the gap ``cell.l − prev.r`` is at most the average of the two cell
  heights × 1.0; a merged cell takes the union bbox and re-reads its text
  from the merged bbox (native ``get_text_bounded``; the pure tier joins
  member texts in x order instead).
- merged cells are re-indexed from **1** (quirk preserved — the
  pre-merge enumeration is 0-based, ``:246-247``).

When pypdfium2 is importable, ``compute_text_cells`` runs the real rect
enumeration + bounded re-read; this runtime ships without it, so the
parsed-cell pipeline remains the default input path.
"""

from __future__ import annotations

from typing import Callable, Optional

from docling_ray.kernels.pdf_assemble import BBox, Cell

ReadText = Callable[[BBox], str]


def _default_reader(group: list[Cell]) -> str:
    return "".join(c.text for c in sorted(group, key=lambda c: c.bbox.l))


def group_rows(cells: list[Cell],
               vertical_threshold_factor: float = 0.5) -> list[list[Cell]]:
    """Phase 1: sequential row grouping with a running row extent."""
    if not cells:
        return []
    rows: list[list[Cell]] = []
    current = [cells[0]]
    row_top = cells[0].bbox.t
    row_bottom = cells[0].bbox.b
    row_height = row_bottom - row_top
    for cell in cells[1:]:
        threshold = row_height * vertical_threshold_factor
        if (abs(cell.bbox.t - row_top) <= threshold
                and abs(cell.bbox.b - row_bottom) <= threshold):
            current.append(cell)
            row_top = min(row_top, cell.bbox.t)
            row_bottom = max(row_bottom, cell.bbox.b)
            row_height = row_bottom - row_top
        else:
            rows.append(current)
            current = [cell]
            row_top = cell.bbox.t
            row_bottom = cell.bbox.b
            row_height = row_bottom - row_top
    if current:
        rows.append(current)
    return rows


def merge_row(row: list[Cell], read_text: Optional[ReadText] = None,
              horizontal_threshold_factor: float = 1.0) -> list[Cell]:
    """Phase 2: merge horizontally-adjacent fragments within one row."""
    merged: list[Cell] = []
    group = [row[0]]
    for cell in row[1:]:
        prev = group[-1]
        avg_height = ((prev.bbox.b - prev.bbox.t)
                      + (cell.bbox.b - cell.bbox.t)) / 2
        if cell.bbox.l - prev.bbox.r <= avg_height * horizontal_threshold_factor:
            group.append(cell)
        else:
            merged.append(_merge_group(group, read_text))
            group = [cell]
    if group:
        merged.append(_merge_group(group, read_text))
    return merged


def _merge_group(group: list[Cell],
                 read_text: Optional[ReadText]) -> Cell:
    if len(group) == 1:
        return group[0]
    bbox = BBox(min(c.bbox.l for c in group), min(c.bbox.t for c in group),
                max(c.bbox.r for c in group), max(c.bbox.b for c in group))
    text = read_text(bbox) if read_text is not None else _default_reader(group)
    return Cell(index=group[0].index, text=text, bbox=bbox, from_ocr=False)


def merge_horizontal_cells(cells: list[Cell],
                           read_text: Optional[ReadText] = None,
                           horizontal_threshold_factor: float = 1.0,
                           vertical_threshold_factor: float = 0.5
                           ) -> list[Cell]:
    """Full two-phase merge; output re-indexed from 1 (reference quirk)."""
    if not cells:
        return []
    rows = group_rows(cells, vertical_threshold_factor)
    merged = [cell for row in rows
              for cell in merge_row(row, read_text,
                                    horizontal_threshold_factor)]
    for i, cell in enumerate(merged, 1):
        cell.index = i
    return merged


def render_page(raw: bytes, page_no: int = 0, scale: float = 1.0,
                pdfium_module=None):
    """Page rendering with the reference's sharpness trick: rasterize at
    1.5× the requested scale, then downscale
    (``pypdfium2_backend.py:327-361``).  ``pdfium_module`` is injectable
    so the argument plumbing and 1.5×+resize math are testable without
    the native library; when omitted, the real pypdfium2 + PIL pair is
    required (absent in this runtime)."""
    if pdfium_module is None:  # pragma: no cover - native lib boundary
        try:
            import pypdfium2 as pdfium_module
            from PIL import Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "page rendering needs pypdfium2 + PIL (native; absent here)"
            ) from exc
    pdf = pdfium_module.PdfDocument(raw)
    page = pdf[page_no]
    image = page.render(scale=scale * 1.5).to_pil()
    return image.resize((round(page.get_width() * scale),
                         round(page.get_height() * scale)))


def compute_text_cells(raw: bytes, page_no: int = 0,
                       pdfium_module=None) -> list[Cell]:
    """Real pdfium path (rect enumeration + bounded re-read).
    ``pdfium_module`` is injectable so the y-flip, the bounded re-read
    arguments and the merge wiring are testable without the native
    library (which is what this runtime lacks)."""
    if pdfium_module is None:  # pragma: no cover - native lib boundary
        try:
            import pypdfium2 as pdfium_module
        except ImportError as exc:
            raise NotImplementedError(
                "pypdfium2 (native) is not available in this runtime; feed "
                "parsed-cell tables instead (FIXTURES.md §F3)") from exc

    pdf = pdfium_module.PdfDocument(raw)
    page = pdf[page_no]
    text_page = page.get_textpage()
    height = page.get_height()
    cells: list[Cell] = []
    for i in range(text_page.count_rects()):
        x0, y0, x1, y1 = text_page.get_rect(i)
        text = text_page.get_text_bounded(x0, y0, x1, y1)
        cells.append(Cell(index=i, text=text,
                          bbox=BBox(x0, height - y1, x1, height - y0)))

    def read_text(bbox: BBox) -> str:
        return text_page.get_text_bounded(
            bbox.l, height - bbox.b, bbox.r, height - bbox.t)

    return merge_horizontal_cells(cells, read_text=read_text)

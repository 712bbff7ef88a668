"""Table-structure recovery: geometric tier of the TableFormer slot.

The reference's table stage
(``/root/reference/docling/models/table_structure_model.py:170-304``)
routes clusters labeled TABLE / DOCUMENT_INDEX to a learned predictor
(TableFormer weights — absent in this runtime) and post-processes its
output into ``TableCell``s + row/col counts + an OTSL sequence.  This
module keeps that exact output contract but fills the predictor slot
with a deterministic GEOMETRIC tier:

- rows: cells clustered by vertical overlap (same running-extent scan as
  the pdfium fragment merge);
- columns: the union of cell x-intervals across the table merged into
  column bands (a gap between bands = a column boundary);
- each cell spans the bands its bbox overlaps (col_span > 1 when a cell
  crosses a boundary); first row is marked ``column_header``;
- OTSL: per grid slot ``fcel`` (filled origin), ``ecel`` (empty),
  ``lcel`` (left-span continuation), with ``nl`` row terminators —
  the token alphabet TableFormer emits.

Token prep mirrors upstream: only cells with non-empty stripped text
enter (``:233-246``).  A learned predictor drops into the same
``infer_table_structure`` slot.
"""

from __future__ import annotations

from dataclasses import dataclass

from docling_ray.doctree import TableCell, TableData
from docling_ray.kernels.pdf_assemble import Cell


@dataclass
class TableStructure:
    data: TableData
    otsl_seq: list[str]


def _rows_of(cells: list[Cell]) -> list[list[Cell]]:
    ordered = sorted(cells, key=lambda c: (c.bbox.t, c.bbox.l))
    rows: list[list[Cell]] = []
    cur: list[Cell] = []
    row_top = row_bottom = None
    for cell in ordered:
        if cur and not (cell.bbox.t < row_bottom and cell.bbox.b > row_top):
            rows.append(sorted(cur, key=lambda c: c.bbox.l))
            cur = []
            row_top = row_bottom = None
        cur.append(cell)
        row_top = cell.bbox.t if row_top is None else min(row_top, cell.bbox.t)
        row_bottom = (cell.bbox.b if row_bottom is None
                      else max(row_bottom, cell.bbox.b))
    if cur:
        rows.append(sorted(cur, key=lambda c: c.bbox.l))
    return rows


def _column_edges(cells: list[Cell], tol: float = 2.0) -> list[float]:
    """Column start positions = clustered distinct left edges (robust to
    full-width spanning cells, which would collapse an interval merge)."""
    edges: list[float] = []
    for left in sorted(c.bbox.l for c in cells):
        if not edges or left > edges[-1] + tol:
            edges.append(left)
    return edges


def infer_table_structure(cells: list[Cell],
                          header_model=None) -> TableStructure:
    """Non-empty cells of one table cluster → grid + OTSL.

    ``header_model`` (a ``kernels/table_model.NumpyTableModel``) replaces
    the geometric "row 0 is the header" rule with a learned per-row
    prediction — the TableFormer slot's learned tier."""
    tokens = [c for c in cells if c.text.strip()]
    if not tokens:
        return TableStructure(TableData(num_rows=0, num_cols=0,
                                        table_cells=[]), [])
    rows = _rows_of(tokens)
    edges = _column_edges(tokens)
    num_cols = len(edges)
    header_mask = [r == 0 for r in range(len(rows))]
    if header_model is not None:
        import numpy as np

        from docling_ray.kernels.table_model import row_features

        heights = [max(c.bbox.b for c in row) - min(c.bbox.t for c in row)
                   for row in rows]
        med = float(np.median(heights)) if heights else 1.0
        feats = np.stack([
            row_features([c.text for c in row], r, len(rows),
                         heights[r], med, num_cols)
            for r, row in enumerate(rows)
        ])
        header_mask = list(header_model.predict_header(feats))

    def band_range(cell: Cell, tol: float = 2.0) -> tuple[int, int]:
        start = max(i for i, e in enumerate(edges)
                    if e <= cell.bbox.l + tol)
        end = max(i for i, e in enumerate(edges)
                  if e < cell.bbox.r - tol or i == start)
        return start, end

    table_cells: list[TableCell] = []
    grid: list[list[str]] = []   # "f" filled-origin, "l" left-span, "e" empty
    for r, row in enumerate(rows):
        slots = ["e"] * num_cols
        for cell in row:
            c0, c1 = band_range(cell)
            table_cells.append(TableCell(
                text=cell.text.strip(),
                row_span=1, col_span=c1 - c0 + 1,
                start_row=r, end_row=r + 1,
                start_col=c0, end_col=c1 + 1,
                column_header=bool(header_mask[r]),
            ))
            slots[c0] = "f"
            for c in range(c0 + 1, c1 + 1):
                slots[c] = "l"
        grid.append(slots)
    otsl: list[str] = []
    for slots in grid:
        otsl.extend({"f": "fcel", "l": "lcel", "e": "ecel"}[s] for s in slots)
        otsl.append("nl")
    return TableStructure(
        TableData(num_rows=len(rows), num_cols=num_cols,
                  table_cells=table_cells),
        otsl)


TABLE_LABELS = {"table", "document_index"}


def table_to_json(ts: TableStructure) -> str:
    import json

    return json.dumps({
        "num_rows": ts.data.num_rows,
        "num_cols": ts.data.num_cols,
        "otsl_seq": ts.otsl_seq,
        "table_cells": [
            {"text": c.text, "row_span": c.row_span, "col_span": c.col_span,
             "start_row": c.start_row, "end_row": c.end_row,
             "start_col": c.start_col, "end_col": c.end_col,
             "column_header": c.column_header, "row_header": c.row_header}
            for c in ts.data.table_cells
        ],
    })


def table_from_json(raw: str) -> TableData:
    import json

    obj = json.loads(raw)
    return TableData(
        num_rows=obj.get("num_rows", 0),
        num_cols=obj.get("num_cols", 0),
        table_cells=[TableCell(**c) for c in obj.get("table_cells", [])])


def tables_for_clusters(clusters, cells_by_id) -> dict[int, TableStructure]:
    """Route table-labeled clusters through the structure tier
    (``table_structure_model.py:190-203`` routing)."""
    out: dict[int, TableStructure] = {}
    for cl in clusters:
        if cl.label in TABLE_LABELS:
            out[cl.id] = infer_table_structure(cl.cells)
    return out

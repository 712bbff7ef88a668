"""CSV → DocTree extraction kernel.

Behavioral re-expression of the reference CSV backend
(``/root/reference/docling/backend/csv_backend.py:52-125``): sniff the
dialect from the first line over the candidate delimiters ``,;\\t|:``,
strict-parse, and emit one table whose first row is the column header.
"""

from __future__ import annotations

import csv
from io import StringIO

from docling_ray.doctree import DocTree, TableCell, TableData


def extract_csv(raw: bytes, name: str = "doc") -> DocTree:
    text = raw.decode("utf-8") if isinstance(raw, bytes) else raw
    content = StringIO(text)
    head = content.readline()
    dialect = csv.Sniffer().sniff(head, ",;\t|:")
    if dialect.delimiter not in {",", ";", "\t", "|", ":"}:
        raise RuntimeError(
            f"Cannot convert csv with unknown delimiter {dialect.delimiter}.")
    content.seek(0)
    rows = list(csv.reader(content, dialect=dialect, strict=True))

    doc = DocTree(name=name)
    if rows:
        num_rows = len(rows)
        num_cols = max(len(row) for row in rows)
        data = TableData(num_rows=num_rows, num_cols=num_cols, table_cells=[])
        for row_idx, row in enumerate(rows):
            for col_idx, value in enumerate(row):
                data.table_cells.append(TableCell(
                    text=str(value),
                    row_span=1, col_span=1,
                    start_row=row_idx, end_row=row_idx + 1,
                    start_col=col_idx, end_col=col_idx + 1,
                    column_header=row_idx == 0,
                    row_header=False,
                ))
        doc.add_table(data=data)
    return doc

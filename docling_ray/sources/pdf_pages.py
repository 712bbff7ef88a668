"""Deterministic synthetic parsed-PDF-page fixtures (FIXTURES.md §F3).

Pages are generated directly at the parsed-cell level (the
``SegmentedPdfPage`` analog) because the native PDF byte parsers aren't in
this runtime.  Each page carries positioned text cells laid out in one or
two columns, with controlled hyphenation breaks; the generator also records
the expected assembled text per document so the cell→cluster→reading-order
pipeline can be golden-tested end to end.
"""

from __future__ import annotations

import random

import pyarrow as pa

_WORDS = ("layout reading order column stream merge cell block page anchor "
          "document table figure caption region header footer body margin").split()

CELL_STRUCT = pa.struct([
    ("index", pa.int32()),
    ("text", pa.string()),
    ("l", pa.float64()),
    ("t", pa.float64()),
    ("r", pa.float64()),
    ("b", pa.float64()),
    ("from_ocr", pa.bool_()),
    ("confidence", pa.float32()),
])

SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("url", pa.string()),
    ("page_no", pa.int32()),
    ("width", pa.float64()),
    ("height", pa.float64()),
    ("cells", pa.large_list(CELL_STRUCT)),
])


def _make_page_cells(rng: random.Random, two_column: bool,
                     width: float = 612.0) -> tuple[list[dict], str]:
    """Returns (cells, expected_text) for one page."""
    lines_per_col = rng.randint(4, 10)
    columns = 2 if two_column else 1
    col_width = (width - 72) / columns
    cells: list[dict] = []
    expected_parts: list[str] = []
    index = 0
    for col in range(columns):
        x0 = 36 + col * col_width
        col_lines: list[str] = []
        for line_no in range(lines_per_col):
            n = rng.randint(3, 7)
            words = [rng.choice(_WORDS) for _ in range(n)]
            text = " ".join(words)
            hyphenated = (line_no < lines_per_col - 1 and rng.random() < 0.25)
            if hyphenated:
                text += "-"
            top = 50.0 + line_no * 14.0
            cells.append({
                "index": index,
                "text": text,
                "l": x0, "t": top, "r": x0 + col_width - 10, "b": top + 12.0,
                "from_ocr": False,
                "confidence": 1.0,
            })
            index += 1
            col_lines.append(text)
        # expected: de-hyphenated joined column text (sanitize_text semantics)
        from docling_ray.kernels.pdf_assemble import sanitize_text

        expected_parts.append(sanitize_text(col_lines))
    return cells, [p for p in expected_parts if p]


def make_pdf_pages_table(n_docs: int, seed: int = 42, max_pages: int = 3,
                         with_pages: bool = False):
    """Build the pages table plus {doc_id: expected_document_text}.

    With ``with_pages=True`` additionally returns
    ``{(doc_id, page_no): expected_page_content_text}`` — the multimodal
    export's per-page text (column cluster texts each followed by one
    space, reading order left column first), derived from the SAME
    generator knowledge as the document-level expectation."""
    rows = {name: [] for name in SCHEMA.names}
    expected: dict[str, str] = {}
    expected_pages: dict[tuple[str, int], str] = {}
    for d in range(n_docs):
        rng = random.Random((seed << 16) ^ d)
        doc_id = f"pdf-{seed}-{d:05d}"
        n_pages = rng.randint(1, max_pages)
        page_texts = []
        for page_no in range(n_pages):
            two_col = rng.random() < 0.4
            cells, parts = _make_page_cells(rng, two_col)
            rows["doc_id"].append(doc_id)
            rows["url"].append(f"https://synthetic-pdf.example.org/{doc_id}")
            rows["page_no"].append(page_no)
            rows["width"].append(612.0)
            rows["height"].append(792.0)
            rows["cells"].append(cells)
            page_texts.append("\n".join(parts))
            expected_pages[(doc_id, page_no)] = "".join(p + " " for p in parts)
        expected[doc_id] = "\n".join(page_texts)
    table = pa.table(rows, schema=SCHEMA)
    if with_pages:
        return table, expected, expected_pages
    return table, expected

"""PDF-path kernels (heuristic tier): cell merging, text sanitation,
layout heuristics, cluster assignment and reading order.

The real PDF byte parsers (pdfium / docling-parse) are native libraries not
present in this runtime — parsing is stubbed behind ``parse_pdf_bytes``.
Everything *after* parsing — the per-page cell→cluster→element pipeline and
the doc-level reading-order assembly — is implemented for the parsed-cell
table shape (FIXTURES.md §F3) and mirrors the reference semantics:

- de-hyphenation + character normalization
  (``/root/reference/docling/models/page_assemble_model.py:34-65``),
- text-quality scoring with garbage-pattern regexes
  (``/root/reference/docling/models/page_preprocessing_model.py:29-35,120-145``),
- cell→cluster assignment by ≥0.2 intersection-over-self
  (``/root/reference/docling/utils/layout_postprocessor.py:585-617``),
- cluster ordering by (min cell index, top, left)
  (``/root/reference/docling/utils/layout_postprocessor.py:658-684``),
- OCR-vs-programmatic cell anti-join
  (``/root/reference/docling/models/base_ocr_model.py:115-138``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

# garbage-text patterns (page_preprocessing_model.py:29-35)
GLYPH_RE = re.compile(r"GLYPH<[0-9A-Fa-f]+>")
SLASH_G_RE = re.compile(r"(?:/G\d+){2,}")
FRAG_RE = re.compile(r"\b[A-Za-z](?:/[a-z]{1,3}\.[a-z]{1,3}){2,}\b")
SLASH_NUMBER_GARBAGE_RE = re.compile(r"(?:/\w+\s*){2,}")
_WORD_RE = re.compile(r"\b[\w]+\b")

TEXT_LABELS = {"text", "paragraph", "section_header", "title", "caption",
               "list_item", "footnote", "page_header", "page_footer", "code"}


def rate_text_quality(text: str) -> float:
    """0..1 score; hard garbage → 0 (reference: rate_text_quality)."""
    if ("�" in text or GLYPH_RE.search(text) or SLASH_G_RE.search(text)
            or SLASH_NUMBER_GARBAGE_RE.match(text)):
        return 0.0
    penalty = 0.0
    frags = FRAG_RE.findall(text)
    if len(frags) >= 3:
        penalty += 0.1 * len(frags)
    return max(1.0 - penalty, 0.0)


def page_parse_score(cell_scores: list[float]) -> float:
    """Parse quality of a page = 10%-quantile of its cell scores ("worst
    cells dominate", page_preprocessing_model.py:116-118)."""
    if not cell_scores:
        return float("nan")
    return float(np.nanquantile(np.asarray(cell_scores, dtype=np.float64), 0.10))


def sanitize_text(lines: list[str]) -> str:
    """Join cell lines with de-hyphenation and char normalization — exact
    semantics of PageAssembleModel.sanitize_text (incl. its in-place line
    mutation while scanning)."""
    if len(lines) <= 1:
        text = " ".join(lines)
    else:
        lines = list(lines)
        for ix in range(len(lines) - 1):
            prev_line = lines[ix]
            line = lines[ix + 1]
            if prev_line.endswith("-"):
                prev_words = _WORD_RE.findall(prev_line)
                line_words = _WORD_RE.findall(line)
                if (prev_words and line_words and prev_words[-1].isalnum()
                        and line_words[0].isalnum()):
                    lines[ix] = prev_line[:-1]
            else:
                lines[ix] += " "
        text = "".join(lines)
    for raw, repl in (("⁄", "/"), ("’", "'"), ("‘", "'"), ("“", '"'),
                      ("”", '"'), ("•", "·")):
        text = text.replace(raw, repl)
    return text.strip()


@dataclass
class BBox:
    l: float
    t: float
    r: float
    b: float

    def area(self) -> float:
        return max(0.0, self.r - self.l) * max(0.0, self.b - self.t)

    def intersection_over_self(self, other: "BBox") -> float:
        il = max(self.l, other.l)
        it = max(self.t, other.t)
        ir = min(self.r, other.r)
        ib = min(self.b, other.b)
        inter = max(0.0, ir - il) * max(0.0, ib - it)
        a = self.area()
        return inter / a if a else 0.0


@dataclass
class Cell:
    index: int
    text: str
    bbox: BBox
    from_ocr: bool = False
    confidence: float = 1.0


@dataclass
class Cluster:
    id: int
    label: str
    bbox: BBox
    confidence: float = 1.0
    cells: list[Cell] = field(default_factory=list)
    children: list["Cluster"] = field(default_factory=list)


def assign_cells_to_clusters(clusters: list[Cluster], cells: list[Cell],
                             min_overlap: float = 0.2) -> list[Cluster]:
    """Best-overlap assignment of each cell to one cluster
    (layout_postprocessor.py:585-617); unassigned cells are dropped here
    (orphan clusters are the full postprocessor's job)."""
    for cluster in clusters:
        cluster.cells = []
    for cell in cells:
        if not cell.text.strip():
            continue
        best, best_overlap = None, min_overlap
        for cluster in clusters:
            overlap = cell.bbox.intersection_over_self(cluster.bbox)
            if overlap > best_overlap:
                best, best_overlap = cluster, overlap
        if best is not None:
            best.cells.append(cell)
    for cluster in clusters:
        # first-occurrence dedup + native print order (":575-583, :654-656")
        seen: set[int] = set()
        unique = []
        for cell in sorted(cluster.cells, key=lambda c: c.index):
            if cell.index not in seen:
                seen.add(cell.index)
                unique.append(cell)
        cluster.cells = unique
    return clusters


def sort_clusters(clusters: list[Cluster]) -> list[Cluster]:
    """(min cell index, top, left) ordering (layout_postprocessor.py:658-684)."""

    def key(cluster: Cluster):
        first = min((c.index for c in cluster.cells), default=1 << 30)
        return (first, cluster.bbox.t, cluster.bbox.l)

    return sorted(clusters, key=key)


def drop_ocr_cells_overlapping(programmatic: list[Cell], ocr: list[Cell],
                               threshold: float = 0.7) -> list[Cell]:
    """Anti-join: discard OCR cells that overlap any programmatic cell
    (base_ocr_model.py:115-138)."""
    kept = []
    for cell in ocr:
        if not any(cell.bbox.intersection_over_self(p.bbox) > threshold
                   for p in programmatic):
            kept.append(cell)
    return kept


def heuristic_clusters(cells: list[Cell], page_width: float,
                       line_gap: float = 6.0) -> list[Cluster]:
    """Deterministic layout heuristic (model-free tier): group cells into
    text blocks by vertical adjacency within a column band.  This replaces
    the RT-DETR layout model when no predictions are provided; the actor
    stage in ``stages/pdf.py`` swaps in a learned model transparently."""
    if not cells:
        return []
    mid = page_width / 2.0
    # column of a cell: 0 = left/full, 1 = right half
    def column(cell: Cell) -> int:
        if cell.bbox.l >= mid - page_width * 0.05:
            return 1
        return 0

    ordered = sorted(cells, key=lambda c: (column(c), c.bbox.t, c.bbox.l))
    clusters: list[Cluster] = []
    current: list[Cell] = []
    current_col = None
    last_bottom = None

    def flush():
        nonlocal current
        if current:
            bbox = BBox(min(c.bbox.l for c in current),
                        min(c.bbox.t for c in current),
                        max(c.bbox.r for c in current),
                        max(c.bbox.b for c in current))
            clusters.append(Cluster(id=len(clusters), label="text", bbox=bbox,
                                    cells=list(current)))
            current = []

    for cell in ordered:
        col = column(cell)
        if (current_col is not None
                and (col != current_col
                     or (last_bottom is not None
                         and cell.bbox.t - last_bottom > line_gap))):
            flush()
        current.append(cell)
        current_col = col
        last_bottom = max(last_bottom or cell.bbox.b, cell.bbox.b)
    flush()
    return clusters


def assemble_page_text(clusters: list[Cluster],
                       table_model=None) -> list[dict]:
    """Clusters → ordered typed elements (page_assemble_model.py:66-100):
    text clusters carry sanitized text; table/document-index clusters run
    the table-structure tier (geometric, or the learned header tier when
    ``table_model`` is given) and carry the recovered grid JSON."""
    from docling_ray.kernels.table_structure import (
        TABLE_LABELS,
        infer_table_structure,
        table_to_json,
    )

    elements = []
    for cluster in sort_clusters(clusters):
        if cluster.label in TEXT_LABELS:
            lines = [c.text.replace("\x02", "-").strip()
                     for c in cluster.cells if c.text.strip()]
            text = sanitize_text(lines)
            elements.append({
                "label": cluster.label,
                "cluster_id": cluster.id,
                "text": text,
            })
        elif cluster.label in TABLE_LABELS:
            ts = infer_table_structure(cluster.cells,
                                       header_model=table_model)
            elements.append({
                "label": cluster.label,
                "cluster_id": cluster.id,
                "text": "",
                "table_json": table_to_json(ts),
            })
    return elements


def parse_pdf_bytes(raw: bytes,
                    page_no: int = 0):  # pragma: no cover - native boundary
    """PDF byte parsing via pypdfium2 when the native lib is present: rect
    enumeration + the ported two-phase fragment merge
    (``kernels/pdfium_cells.py``).  This runtime ships without pdfium, so
    the parsed-cell tables remain the default input (FIXTURES.md §F3)."""
    from docling_ray.kernels.pdfium_cells import compute_text_cells

    return compute_text_cells(raw, page_no=page_no)

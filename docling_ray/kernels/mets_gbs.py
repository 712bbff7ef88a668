"""METS-GBS (Google Books schema) backend: tar.gz of METS XML + per-page
hOCR + page images → parsed page-cell records.

Behavioral re-expression of the reference backend
(``/root/reference/docling/backend/mets_gbs_backend.py:197-399``):

- the archive's ``*.xml`` member whose root is ``mets:mets`` with
  ``PROFILE="gbs"`` is the manifest; ``fileGrp`` USE types image / OCR /
  coordOCR map files to 0-indexed pages via ``div[@TYPE='page']/@ORDER``
  (``:257-283``);
- per page, the coordOCR hOCR file yields ``ocr_line`` and ``ocrx_word``
  spans with ``bbox l t r b`` rects and ``x_wconf`` confidences parsed
  from the title attribute (``:164-194``, ``:330-365``); page size comes
  from the ``ocr_page`` div's bbox (``:316-323``);
- ``get_text_in_rect`` unions line cells with intersection-over-self
  > 0.5, space-joined (``:63-86``).

Differences by design: images stay opaque bytes (no PIL in this runtime —
decode is the stubbed multimodal codec path), and instead of a stateful
paginated backend the parse emits plain page records that feed the Ray
``pdf_pages_pipeline`` (cells → layout → reading order) as a ``flat_map``.
"""

from __future__ import annotations

import io
import tarfile
from dataclasses import dataclass, field
from typing import Optional
from xml.etree import ElementTree as ET

_METS = "{http://www.loc.gov/METS/}"
_XLINK = "{http://www.w3.org/1999/xlink}"
_USES = ("image", "OCR", "coordOCR")


@dataclass
class OcrCell:
    index: int
    text: str
    l: float
    t: float
    r: float
    b: float
    confidence: float = 1.0


@dataclass
class MetsPage:
    page_no: int            # 0-indexed (ORDER - 1)
    width: float
    height: float
    line_cells: list[OcrCell] = field(default_factory=list)
    word_cells: list[OcrCell] = field(default_factory=list)
    image_name: Optional[str] = None
    image_bytes: Optional[bytes] = None


def extract_rect(title: str) -> Optional[tuple[float, float, float, float]]:
    """'bbox 279 177 306 214;x_wconf 97' → (l, t, r, b)."""
    for part in title.split(";"):
        part = part.strip()
        if part.startswith("bbox "):
            try:
                l, t, r, b = map(int, part.split()[1:5])
                return float(l), float(t), float(r), float(b)
            except Exception:
                return None
    return None


def extract_confidence(title: str) -> float:
    for part in title.split(";"):
        part = part.strip()
        if part.startswith("x_wconf"):
            try:
                return float(part.split()[1]) / 100.0
            except Exception:
                return 1
    return 1


def _find_mets_root(tar: tarfile.TarFile) -> Optional[ET.Element]:
    for member in tar.getmembers():
        if member.name.endswith(".xml"):
            fh = tar.extractfile(member)
            if fh is None:
                continue
            try:
                root = ET.fromstring(fh.read())
            except ET.ParseError:
                continue
            if root.tag == f"{_METS}mets" and root.get("PROFILE") == "gbs":
                return root
    return None


def _hocr_cells(raw: bytes) -> tuple[Optional[tuple[float, float]],
                                     list[OcrCell], list[OcrCell]]:
    from docling_ray.dom import parse_html

    doc = parse_html(raw)
    size = None
    page_div = next((d for d in doc.find_all("div")
                     if d.get("class") == "ocr_page"), None)
    if page_div is not None:
        rect = extract_rect(page_div.get("title") or "")
        if rect:
            size = (rect[2] - rect[0], rect[3] - rect[1])
    words: list[OcrCell] = []
    lines: list[OcrCell] = []
    spans = doc.find_all("span")
    for cls, out in (("ocrx_word", words), ("ocr_line", lines)):
        for ix, span in enumerate(s for s in spans if s.get("class") == cls):
            text = span.get_text().strip()
            title = span.get("title") or ""
            rect = extract_rect(title)
            if rect:
                out.append(OcrCell(index=ix, text=text,
                                   l=rect[0], t=rect[1], r=rect[2], b=rect[3],
                                   confidence=extract_confidence(title)))
    return size, lines, words


def parse_mets_gbs(raw: bytes, include_images: bool = False) -> list[MetsPage]:
    """tar.gz bytes → per-page OCR cell records (0-indexed pages)."""
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r:gz") as tar:
        root = _find_mets_root(tar)
        if root is None:
            raise ValueError("not a METS-GBS archive (no mets root with "
                             "PROFILE='gbs')")
        file_info: dict[str, tuple[str, str]] = {}  # id -> (use, href)
        for filegrp in root.iter(f"{_METS}fileGrp"):
            use = filegrp.get("USE")
            if use not in _USES:
                continue
            for file_elem in filegrp.findall(f"{_METS}file"):
                file_id = file_elem.get("ID")
                flocat = file_elem.find(f"{_METS}FLocat")
                href = flocat.get(f"{_XLINK}href") if flocat is not None else None
                if file_id and href:
                    file_info[file_id] = (use, href)

        pages: list[MetsPage] = []
        for div in root.iter(f"{_METS}div"):
            if div.get("TYPE") != "page" or not div.get("ORDER"):
                continue
            try:
                page_no = int(div.get("ORDER")) - 1
            except ValueError:
                continue
            hrefs: dict[str, str] = {}
            for fptr in div.findall(f"{_METS}fptr"):
                info = file_info.get(fptr.get("FILEID") or "")
                if info:
                    hrefs[info[0]] = info[1]
            ocr_href = hrefs.get("coordOCR")
            if not ocr_href:
                continue
            ocr_file = tar.extractfile(ocr_href)
            if ocr_file is None:
                continue
            size, lines, words = _hocr_cells(ocr_file.read())
            if size is None:
                # fallback: extent of the cells
                allc = lines or words
                size = ((max((c.r for c in allc), default=0.0),
                         max((c.b for c in allc), default=0.0)))
            page = MetsPage(page_no=page_no, width=size[0], height=size[1],
                            line_cells=lines, word_cells=words,
                            image_name=hrefs.get("image"))
            if include_images and page.image_name:
                img = tar.extractfile(page.image_name)
                if img is not None:
                    page.image_bytes = img.read()
            pages.append(page)
    pages.sort(key=lambda p: p.page_no)
    return pages


def get_text_in_rect(cells: list[OcrCell],
                     bbox: tuple[float, float, float, float]) -> str:
    """Union of line cells with intersection-over-self > 0.5, space-joined
    (``mets_gbs_backend.py:63-86``)."""
    l, t, r, b = bbox
    parts: list[str] = []
    for cell in cells:
        ix_l, ix_t = max(cell.l, l), max(cell.t, t)
        ix_r, ix_b = min(cell.r, r), min(cell.b, b)
        inter = max(0.0, ix_r - ix_l) * max(0.0, ix_b - ix_t)
        area = max(0.0, cell.r - cell.l) * max(0.0, cell.b - cell.t)
        if area > 0 and inter / area > 0.5:
            parts.append(cell.text)
    return " ".join(parts)


def mets_pages_rows(doc_id: str, url: str, raw: bytes) -> list[dict]:
    """Explode one archive into pdf_pages-pipeline rows (SCHEMA of
    ``sources/pdf_pages.py``)."""
    rows = []
    for page in parse_mets_gbs(raw):
        rows.append({
            "doc_id": doc_id,
            "url": url,
            "page_no": page.page_no,
            "width": page.width,
            "height": page.height,
            "cells": [
                {"index": c.index, "text": c.text,
                 "l": c.l, "t": c.t, "r": c.r, "b": c.b,
                 "from_ocr": True, "confidence": c.confidence}
                for c in page.line_cells
            ],
        })
    return rows


def extract_mets_gbs(raw: bytes, name: str = "doc"):
    """Synchronous tier for CLI/file mode: archive → DocTree via the same
    cells → heuristic layout → reading order chain the Ray pipeline runs."""
    from docling_ray.kernels.pdf_assemble import (
        BBox,
        Cell,
        assemble_page_text,
        heuristic_clusters,
    )
    from docling_ray.kernels.layout_postprocess import postprocess_layout
    from docling_ray.kernels.reading_order import (
        ROElement,
        reading_order_document,
    )

    elements: list[ROElement] = []
    for page in parse_mets_gbs(raw):
        cells = [Cell(index=c.index, text=c.text,
                      bbox=BBox(c.l, c.t, c.r, c.b), from_ocr=True,
                      confidence=c.confidence)
                 for c in page.line_cells]
        clusters = heuristic_clusters(cells, page.width or 612.0)
        clusters = postprocess_layout(cells, clusters, page.width or 612.0,
                                      page.height or 792.0)
        by_id = {cl.id: cl for cl in clusters}
        for e in assemble_page_text(clusters):
            cl = by_id[e["cluster_id"]]
            elements.append(ROElement(
                cid=len(elements), page_no=page.page_no, label=e["label"],
                l=cl.bbox.l, t=cl.bbox.t, r=cl.bbox.r, b=cl.bbox.b,
                text=e["text"], page_width=page.width or 612.0,
                page_height=page.height or 792.0))
    return reading_order_document(name, elements)

"""Multimodal page export: page-aligned (text, md, doctags, cells,
segments) training tuples.

Behavioral port of ``generate_multimodal_pages``
(``/root/reference/docling/utils/export.py:13-146``) onto the Ray page
pipeline: the document's elements are put in reading order, then split
back per page; each page yields

- ``content_text``: the page items' texts joined with trailing spaces
  (``:140-141`` accumulation);
- ``content_md`` / ``content_dt``: markdown and doctags serialization of
  ONLY that page's items (``:108-114``, no page tagging);
- ``cells``: every parsed text cell with its bbox NORMALIZED to the page
  size (top-left origin), plus ``ocr``/``ocr_confidence`` (``:82-101``);
- ``segments``: one record per doc item on the page —
  ``index_in_doc`` (global reading-order index), label, text, normalized
  bbox, and table HTML payloads in ``data`` (``:45-79``).
"""

from __future__ import annotations

from typing import Iterable

from docling_ray.doctree import DocTree
from docling_ray.kernels.reading_order import ROElement, predict_reading_order


def _norm_bbox(l: float, t: float, r: float, b: float,
               width: float, height: float) -> tuple[float, float, float, float]:
    w = width or 1.0
    h = height or 1.0
    return (l / w, t / h, r / w, b / h)


def _page_doc(elements: list[ROElement]) -> DocTree:
    # the reading-order doc build (list groups, furniture, containers)
    # applied to just this page's already-ordered items
    from docling_ray.kernels.reading_order import build_document

    return build_document("page", elements, {}, {}, {})


def multimodal_page_tuples(pages: list[dict]) -> Iterable[dict]:
    """pages: per-page dicts with keys page_no, width, height, cells,
    elements (the page pipeline's columns).  Yields one record per page
    holding the five aligned views."""
    from docling_ray.kernels.doctags import to_doctags
    from docling_ray.kernels.markdown import to_markdown

    elements: list[ROElement] = []
    meta: dict[int, dict] = {}
    for page in sorted(pages, key=lambda p: p["page_no"]):
        meta[page["page_no"]] = page
        for e in page.get("elements") or []:
            payload = {}
            if e.get("table_json"):
                from docling_ray.doctree import TableItem
                from docling_ray.kernels.html_export import _table_html
                from docling_ray.kernels.table_structure import table_from_json

                data = table_from_json(e["table_json"])
                payload["table_data"] = data
                payload["table_html"] = _table_html(
                    TableItem(None, "body", data))
            elements.append(ROElement(
                cid=len(elements), page_no=page["page_no"],
                label=e["label"], l=e["l"], t=e["t"], r=e["r"], b=e["b"],
                text=e["text"], page_width=page.get("width") or 612.0,
                page_height=page.get("height") or 792.0, payload=payload))
    ordered = predict_reading_order(elements)

    by_page: dict[int, list[tuple[int, ROElement]]] = {}
    for ix, el in enumerate(ordered):
        by_page.setdefault(el.page_no, []).append((ix, el))

    for page_no in sorted(meta):
        page = meta[page_no]
        width = page.get("width") or 612.0
        height = page.get("height") or 792.0
        items = by_page.get(page_no, [])
        content_text = "".join(
            el.text + " " for _, el in items if el.text)
        page_doc = _page_doc([el for _, el in items])
        segments = []
        for ix, el in items:
            seg = {
                "index_in_doc": ix,
                "label": el.label or "text",
                "text": el.text or "",
                "bbox": _norm_bbox(el.l, el.t, el.r, el.b, width, height),
                "data": [],
            }
            if el.label in ("table", "document_index") \
                    and el.payload.get("table_html"):
                seg["data"].append({"html_seq": el.payload["table_html"],
                                    "otsl_seq": ""})
            segments.append(seg)
        cells = []
        for cell in page.get("cells") or []:
            cells.append({
                "text": cell.get("text") or "",
                "bbox": _norm_bbox(cell["l"], cell["t"], cell["r"],
                                   cell["b"], width, height),
                "ocr": bool(cell.get("from_ocr", False)),
                "ocr_confidence": float(cell.get("confidence", 1.0)),
            })
        yield {
            "page_no": page_no,
            "content_text": content_text,
            "content_md": to_markdown(page_doc),
            "content_dt": to_doctags(page_doc),
            "cells": cells,
            "segments": segments,
        }

"""Reading-order model: element ordering, caption/footnote attachment,
cross-column merges, and the document build.

The document-build semantics are a behavioral port of the reference's
``ReadingOrderModel._readingorder_elements_to_docling_doc``
(``/root/reference/docling/models/readingorder_model.py:106-381``):
skippable cids from the caption/footnote/merge maps, list-group insertion
with reset on non-list items, per-type caption/footnote attachment (code /
table / picture), element merges joining text with a single space and
appending a charspan-offset provenance, FURNITURE content layer for page
header/footer, and FORM / KEY_VALUE_REGION container groups.

The *predictor* itself lives in a separate package upstream
(docling-ibm-models, rule-based) whose source is not part of the reference
checkout; the rules here are our own deterministic tier with the same
interface contract (``predict_reading_order`` / ``predict_to_captions`` /
``predict_to_footnotes`` / ``predict_merges``,
``readingorder_model.py:355-372``):

- ordering: per-page recursive XY-cut — split on full-height horizontal
  whitespace gaps (columns, left→right) else full-width vertical gaps
  (bands, top→bottom), recursing until atomic, then (top, left);
- captions attach to the nearest table/picture/code on the page measured
  by vertical edge distance (horizontal overlap required);
- footnotes attach to the nearest such element *above* them;
- merges: consecutive same-label text elements across a column or page
  boundary when the first ends unterminated and the second starts
  lowercase.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from docling_ray.doctree import BODY, FURNITURE, DocTree, TableData

_CAPTION_TARGETS = {"table", "document_index", "picture", "figure", "code"}
_CONTAINER_LABELS = {"form", "key_value_region"}
_TERMINAL = ".!?:;”’\")"


@dataclass
class ROElement:
    """One assembled page element entering the reading-order stage.

    bbox is TOP-LEFT origin (our pipeline convention; the reference flips
    to bottom-left before its predictor — only relative order matters)."""

    cid: int
    page_no: int
    label: str
    l: float
    t: float
    r: float
    b: float
    text: str = ""
    page_width: float = 612.0
    page_height: float = 792.0
    payload: dict = field(default_factory=dict)  # table data, children, level


# -- ordering ---------------------------------------------------------------

def _merged_intervals(spans: list[tuple[float, float]],
                      tol: float) -> list[tuple[float, float]]:
    spans = sorted(spans)
    out = [list(spans[0])]
    for lo, hi in spans[1:]:
        if lo <= out[-1][1] + tol:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [(lo, hi) for lo, hi in out]


def _split(els: list[ROElement], axis: str, tol: float) -> list[list[ROElement]]:
    spans = ([(e.l, e.r) for e in els] if axis == "x"
             else [(e.t, e.b) for e in els])
    groups = _merged_intervals(spans, tol)
    if len(groups) < 2:
        return [els]
    out: list[list[ROElement]] = [[] for _ in groups]
    for e in els:
        lo = e.l if axis == "x" else e.t
        for gi, (glo, ghi) in enumerate(groups):
            if glo - tol <= lo <= ghi + tol:
                out[gi].append(e)
                break
    return [g for g in out if g]


def _xy_cut(els: list[ROElement], tol: float = 4.0,
            depth: int = 0) -> list[ROElement]:
    if len(els) <= 1 or depth > 24:
        return sorted(els, key=lambda e: (e.t, e.l))
    # vertical bands first (a full-width title blocks the column cut until
    # the band containing only the columns recurses)
    bands = _split(els, "y", tol)
    if len(bands) > 1:
        out: list[ROElement] = []
        for band in bands:
            out.extend(_xy_cut(band, tol, depth + 1))
        return out
    cols = _split(els, "x", tol)
    if len(cols) > 1:
        out = []
        for col in cols:
            out.extend(_xy_cut(col, tol, depth + 1))
        return out
    return sorted(els, key=lambda e: (e.t, e.l))


def predict_reading_order(elements: list[ROElement]) -> list[ROElement]:
    """Global order: pages ascending; within a page, recursive XY-cut."""
    by_page: dict[int, list[ROElement]] = {}
    for e in elements:
        by_page.setdefault(e.page_no, []).append(e)
    out: list[ROElement] = []
    for page_no in sorted(by_page):
        out.extend(_xy_cut(by_page[page_no]))
    return out


# -- attachment maps --------------------------------------------------------

def _h_overlap(a: ROElement, b: ROElement) -> float:
    return min(a.r, b.r) - max(a.l, b.l)


def _v_gap(a: ROElement, b: ROElement) -> float:
    if a.b <= b.t:
        return b.t - a.b
    if b.b <= a.t:
        return a.t - b.b
    return 0.0


def predict_to_captions(sorted_elements: list[ROElement]
                        ) -> dict[int, list[int]]:
    """caption → nearest caption-target on the page (vertical edge
    distance, horizontal overlap required)."""
    mapping: dict[int, list[int]] = {}
    for el in sorted_elements:
        if el.label != "caption":
            continue
        best: Optional[ROElement] = None
        best_gap = float("inf")
        for cand in sorted_elements:
            if (cand.page_no != el.page_no
                    or cand.label not in _CAPTION_TARGETS):
                continue
            if _h_overlap(el, cand) <= 0:
                continue
            gap = _v_gap(el, cand)
            if gap < best_gap:
                best, best_gap = cand, gap
        if best is not None:
            mapping.setdefault(best.cid, []).append(el.cid)
    return mapping


def predict_to_footnotes(sorted_elements: list[ROElement]
                         ) -> dict[int, list[int]]:
    """footnote → nearest table/picture ABOVE it on the page."""
    mapping: dict[int, list[int]] = {}
    for el in sorted_elements:
        if el.label != "footnote":
            continue
        best: Optional[ROElement] = None
        best_gap = float("inf")
        for cand in sorted_elements:
            if (cand.page_no != el.page_no
                    or cand.label not in ("table", "document_index",
                                          "picture", "figure")):
                continue
            if cand.b > el.t or _h_overlap(el, cand) <= 0:
                continue  # must sit above the footnote
            gap = el.t - cand.b
            if gap < best_gap:
                best, best_gap = cand, gap
        if best is not None:
            mapping.setdefault(best.cid, []).append(el.cid)
    return mapping


def _col_key(el: ROElement) -> int:
    return int(el.l // max(el.page_width / 4.0, 1.0))


def predict_merges(sorted_elements: list[ROElement]) -> dict[int, list[int]]:
    """Continuation merges across column/page boundaries: same text label,
    first part ends unterminated, second starts lowercase."""
    mapping: dict[int, list[int]] = {}
    merged_into: dict[int, int] = {}
    prev: Optional[ROElement] = None
    for el in sorted_elements:
        if prev is not None and el.label == prev.label \
                and el.label in ("text", "paragraph"):
            boundary = (el.page_no != prev.page_no
                        or _col_key(el) != _col_key(prev))
            p_text = prev.text.rstrip()
            n_text = el.text.lstrip()
            # only sentence-like prose merges: the first part must contain a
            # sentence terminator somewhere yet not end with one (a block
            # with no punctuation at all is not a broken paragraph)
            sentence_like = any(ch in p_text for ch in ".!?")
            if (boundary and p_text and n_text and sentence_like
                    and p_text[-1] not in _TERMINAL
                    and n_text[0].islower()):
                head = merged_into.get(prev.cid, prev.cid)
                mapping.setdefault(head, []).append(el.cid)
                merged_into[el.cid] = head
                prev = el
                continue
        prev = el
    return mapping


# -- document build ---------------------------------------------------------

def _prov(el: ROElement, charspan: tuple[int, int]) -> dict:
    return {"page_no": el.page_no + 1, "charspan": charspan,
            "bbox": (el.l, el.t, el.r, el.b)}


def _add_children(doc: DocTree, el: ROElement, parent) -> None:
    for child in el.payload.get("children", []):
        c_label = child.get("label", "text")
        c_text = " ".join(
            t.replace("\x02", "-").strip()
            for t in child.get("cell_texts", []) if t.strip())
        if c_label == "list_item":
            item = doc.add_list_item(text=c_text, parent=parent)
        elif c_label == "section_header":
            item = doc.add_heading(parent=parent, text=c_text)
        else:
            item = doc.add_text(label=c_label, text=c_text, parent=parent)
        item.prov = [_prov(el, (0, len(c_text)))]


def _attach_cap_or_foot(doc: DocTree, elem: ROElement, parent) -> object:
    item = doc.add_text(label=elem.label, text=elem.text, parent=parent)
    item.prov = [_prov(elem, (0, len(elem.text)))]
    return item


def _detached_caption(elem: ROElement):
    """Serializers consume ``item.caption`` (a possibly-detached TextItem),
    so the FIRST caption becomes that; further captions/footnotes are tree
    children."""
    from docling_ray.doctree import BODY as _BODY, TextItem

    cap = TextItem(None, _BODY, elem.label, elem.text)
    cap.prov = [_prov(elem, (0, len(elem.text)))]
    return cap


def _wire_float_attachments(doc: DocTree, item, el: ROElement,
                            by_cid: dict, el_to_captions: dict,
                            el_to_footnotes: dict) -> None:
    caps = el_to_captions.get(el.cid, [])
    if caps:
        item.caption = _detached_caption(by_cid[caps[0]])
        for cap_cid in caps[1:]:
            _attach_cap_or_foot(doc, by_cid[cap_cid], item)
    for f_cid in el_to_footnotes.get(el.cid, []):
        _attach_cap_or_foot(doc, by_cid[f_cid], item)


def build_document(name: str,
                   sorted_elements: list[ROElement],
                   el_to_captions: dict[int, list[int]],
                   el_to_footnotes: dict[int, list[int]],
                   el_merges: dict[int, list[int]]) -> DocTree:
    """Port of ``_readingorder_elements_to_docling_doc`` onto DocTree."""
    doc = DocTree(name=name)
    by_cid = {e.cid: e for e in sorted_elements}
    skippable = {cid
                 for mapping in (el_to_captions, el_to_footnotes, el_merges)
                 for lst in mapping.values() for cid in lst}
    for e in sorted_elements:
        doc.pages.setdefault(e.page_no + 1, (e.page_width, e.page_height))

    current_list = None
    for el in sorted_elements:
        if el.cid in skippable:
            continue
        label = el.label
        if label in ("table", "document_index"):
            current_list = None
            data = el.payload.get("table_data") or TableData(
                num_rows=0, num_cols=0, table_cells=[])
            item = doc.add_table(data=data)
            item.prov = [_prov(el, (0, 0))]
            _wire_float_attachments(doc, item, el, by_cid,
                                    el_to_captions, el_to_footnotes)
        elif label in ("picture", "figure", "chart"):
            current_list = None
            item = doc.add_picture()
            item.prov = [_prov(el, (0, 0))]
            _wire_float_attachments(doc, item, el, by_cid,
                                    el_to_captions, el_to_footnotes)
            _add_children(doc, el, item)
        elif label in _CONTAINER_LABELS:
            current_list = None
            group_label = ("form_area" if label == "form"
                           else "key_value_area")
            group = doc.add_group(label=group_label)
            _add_children(doc, el, group)
        elif label == "code":
            current_list = None
            item = doc.add_code(text=el.text)
            item.prov = [_prov(el, (0, len(el.text)))]
            # code items have no caption slot; captions/footnotes attach
            # as children
            for cap_cid in el_to_captions.get(el.cid, []):
                _attach_cap_or_foot(doc, by_cid[cap_cid], item)
            for f_cid in el_to_footnotes.get(el.cid, []):
                _attach_cap_or_foot(doc, by_cid[f_cid], item)
        else:
            item, current_list = _handle_text(doc, el, current_list)
            for merged_cid in el_merges.get(el.cid, []):
                merged = by_cid[merged_cid]
                start = len(item.text) + 1
                item.prov.append(
                    _prov(merged, (start, start + len(merged.text))))
                item.text += f" {merged.text}"
                if item.orig is not None:
                    item.orig += f" {merged.text}"
    return doc


def _handle_text(doc: DocTree, el: ROElement, current_list):
    """``_handle_text_element`` port: list-group lifecycle + label dispatch."""
    text = el.text
    if el.label == "list_item":
        if current_list is None:
            current_list = doc.add_list_group(name="list")
        item = doc.add_list_item(text=text, enumerated=False,
                                 parent=current_list)
    elif el.label == "section_header":
        current_list = None
        item = doc.add_heading(parent=None, text=text,
                               level=el.payload.get("level", 1))
    elif el.label == "formula":
        current_list = None
        item = doc.add_text(label="formula", text="", orig=text)
    else:
        current_list = None
        layer = (FURNITURE if el.label in ("page_header", "page_footer")
                 else BODY)
        item = doc.add_text(label=el.label, text=text, content_layer=layer)
    item.prov = [_prov(el, (0, len(text)))]
    return item, current_list


def reading_order_document(name: str,
                           elements: list[ROElement]) -> DocTree:
    """Full reading-order reduce: order → attachment maps → doc build
    (mirror of ``ReadingOrderModel.__call__``,
    ``readingorder_model.py:355-381``)."""
    ordered = predict_reading_order(elements)
    captions = predict_to_captions(ordered)
    footnotes = predict_to_footnotes(ordered)
    merges = predict_merges(ordered)
    return build_document(name, ordered, captions, footnotes, merges)

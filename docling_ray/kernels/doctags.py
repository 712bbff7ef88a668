"""DocTags export — the reference's ``save_as_document_tokens`` output
format (``/root/reference/docling/cli/main.py:260-264``), matched against
``groundtruth/docling_v2/*.doctags.txt``.

Format: ``<doctag>`` wrapping one line per element; each element carries
four ``<loc_N>`` tokens (bbox quantized to a 0–500 grid in top-left page
coordinates), tables serialize as OTSL (``fcel/ched/rhed/ecel/lcel/ucel``
plus ``<nl>`` row terminators), captions nest inside their float, and
``<page_break>`` separates pages.
"""

from __future__ import annotations

from typing import Optional

from docling_ray.doctree import (
    DocTree,
    GroupItem,
    Item,
    PictureItem,
    TableItem,
    TextItem,
)


def _loc_tokens(doc: DocTree, prov) -> str:
    """All provenance records, each as four loc tokens quantized onto the
    0..499 grid (scale = (bins-1)/dim, round-to-nearest)."""
    if not prov:
        return ""
    out = []
    for rec in prov:
        if isinstance(rec, dict):
            # reading-order prov records: TOPLEFT bbox + charspan dict —
            # flip to the serializer's BOTTOMLEFT convention
            page_no = rec["page_no"]
            l, tt, r, bb = rec["bbox"]
            _, height_ = doc.pages.get(page_no, (0.0, 0.0))
            t, b = height_ - tt, height_ - bb
        else:
            page_no, l, t, r, b = rec
        width, height = doc.pages.get(page_no, (0.0, 0.0))
        if not width or not height:
            continue

        def q(value: float, dim: float) -> int:
            return min(499, max(0, round(value * 500 / dim)))

        out.append(f"<loc_{q(l, width)}><loc_{q(height - t, height)}>"
                   f"<loc_{q(r, width)}><loc_{q(height - b, height)}>")
    return "".join(out)


def _caption_tokens(doc: DocTree, caption: Optional[TextItem]) -> str:
    if caption is None or not caption.text:
        return ""
    return f"<caption>{_loc_tokens(doc, caption.prov)}{caption.text}</caption>"


def _otsl(doc: DocTree, item: TableItem) -> str:
    data = item.data
    # map of (row, col) → owning cell
    start: dict[tuple[int, int], object] = {}
    cover: dict[tuple[int, int], object] = {}
    for cell in data.table_cells:
        start[(cell.start_row, cell.start_col)] = cell
        for r in range(cell.start_row, cell.end_row):
            for c in range(cell.start_col, cell.end_col):
                cover[(r, c)] = cell
    parts = []
    for r in range(data.num_rows):
        for c in range(data.num_cols):
            cell = cover.get((r, c))
            if cell is None:
                parts.append("<ecel>")
            elif (r, c) == (cell.start_row, cell.start_col):
                if not cell.text:
                    parts.append("<ecel>")
                elif cell.column_header:
                    parts.append(f"<ched>{cell.text}")
                elif cell.row_header:
                    parts.append(f"<rhed>{cell.text}")
                else:
                    parts.append(f"<fcel>{cell.text}")
            elif r > cell.start_row and c > cell.start_col:
                parts.append("<xcel>")
            elif c > cell.start_col:
                parts.append("<lcel>")
            else:
                parts.append("<ucel>")
        parts.append("<nl>")
    return "".join(parts)


def to_doctags(doc: DocTree) -> str:
    lines: list[str] = []
    last_page: Optional[int] = None

    # caption items consumed by floats must not re-serialize standalone
    consumed: set[int] = set()

    def collect(item: Item):
        if getattr(item, "caption", None) is not None:
            consumed.add(id(item.caption))
        for child in item.children:
            collect(child)

    collect(doc.body)

    def page_of(item: Item) -> Optional[int]:
        if not item.prov:
            return None
        rec = item.prov[0]
        return rec["page_no"] if isinstance(rec, dict) else rec[0]

    def push(line: str, item: Item) -> None:
        nonlocal last_page
        page = page_of(item)
        if page is not None:
            if last_page is not None and page > last_page:
                lines.append("<page_break>")
            last_page = page
        lines.append(line)

    def emit(item: Item) -> None:
        if isinstance(item, GroupItem):
            if item.group_label == "list":
                emit_list(item)
            else:
                for child in item.children:
                    emit(child)
            return
        if isinstance(item, TextItem):
            label = item.text_label
            loc = _loc_tokens(doc, item.prov)
            if label == "title":
                push(f"<title>{loc}{item.text}</title>", item)
            elif label == "section_header":
                tag = f"section_header_level_{max(item.level, 1)}"
                push(f"<{tag}>{loc}{item.text}</{tag}>", item)
            elif label == "code":
                lang = item.code_language or "unknown"
                cap = _caption_tokens(doc, getattr(item, "caption", None))
                push(f"<code>{loc}<_{lang}_>{item.text}{cap}</code>", item)
            elif label == "formula":
                push(f"<formula>{loc}{item.text}</formula>", item)
            else:
                push(f"<{label}>{loc}{item.text}</{label}>", item)
            for child in item.children:
                if id(child) not in consumed:
                    emit(child)
            return
        if isinstance(item, PictureItem):
            loc = _loc_tokens(doc, item.prov)
            push(f"<picture>{loc}{_caption_tokens(doc, item.caption)}</picture>",
                 item)
            return
        if isinstance(item, TableItem):
            loc = _loc_tokens(doc, item.prov)
            push(f"<otsl>{loc}{_otsl(doc, item)}"
                 f"{_caption_tokens(doc, item.caption)}</otsl>", item)
            return
        for child in item.children:
            emit(child)

    def emit_list(group: GroupItem) -> None:
        ordered = next(
            (c.enumerated for c in group.children
             if isinstance(c, TextItem) and c.text_label == "list_item"),
            False)
        wrapper = "ordered_list" if ordered else "unordered_list"
        item_lines_start = len(lines)
        first = True
        for child in group.children:
            if isinstance(child, TextItem) and child.text_label == "list_item":
                loc = _loc_tokens(doc, child.prov)
                line = f"<list_item>{loc}{child.text}</list_item>"
                if first:
                    line = f"<{wrapper}>{line}"
                    first = False
                push(line, child)
                for sub in child.children:
                    if isinstance(sub, GroupItem) and sub.group_label == "list":
                        emit_list(sub)
            elif isinstance(child, GroupItem) and child.group_label == "list":
                emit_list(child)
        if first:
            return  # empty list
        lines.append(f"</{wrapper}>")
        _ = item_lines_start

    for child in doc.body.children:
        if id(child) in consumed:
            continue
        emit(child)
    body = "\n".join(lines)
    return f"<doctag>{body}\n</doctag>"

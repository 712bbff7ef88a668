"""DocTags parser — the read side of ``kernels/doctags.py``'s writer and
the analog of the reference's ``DoclingDocument.load_from_doctags``
(``/root/reference/docling/pipeline/vlm_pipeline.py:200-238`` consumes it
to turn VLM doctags responses into documents).

The grammar is exactly what ``to_doctags`` emits: a ``<doctag>`` wrapper,
one element per line (``<title>/<section_header_level_N>/<code>/<formula>/
<picture>/<otsl>/<list_item>`` plus any generic text label), four
``<loc_N>`` tokens per provenance record on the 0–500 grid,
``<page_break>`` between pages, OTSL table cells, nested ordered/unordered
lists, and ``<caption>`` nested inside floats.

Losses inherent to the format (and to the reference loader): tree nesting
of plain text items flattens, page numbers beyond "one break = next page"
collapse, and formatting/hyperlinks are absent.  Within those bounds the
parser is a FIXPOINT of the writer: ``to_doctags(from_doctags(s)) == s``
for every writer-produced ``s`` — proven against all reference groundtruth
doctags in ``tests/test_doctags.py``.

Pages are registered with synthetic ``(500, 500)`` dimensions by default so
loc tokens survive a parse→write round trip bit-exactly (the 0–500 grid
becomes the identity); callers that know real page sizes pass ``page_dims``
to recover absolute coordinates instead.
"""

from __future__ import annotations

import re
from typing import Optional

from docling_ray.doctree import (
    BODY,
    FURNITURE,
    DocTree,
    TableCell,
    TableData,
    TextItem,
)

_LOC = re.compile(r"<loc_(\d+)>")
_TAG = re.compile(r"<(/?)([a-zA-Z_][\w]*)>")
_CODE_LANG = re.compile(r"<_([^>]*?)_>")
_OTSL_TOKEN = re.compile(r"<(fcel|ched|rhed|ecel|lcel|ucel|xcel|nl)>")

_FURNITURE_LABELS = {"page_header", "page_footer"}
_DEFAULT_DIM = 500.0


def _parse_locs(s: str, pos: int) -> tuple[list[tuple[int, ...]], int]:
    """Leading ``<loc_N>`` run at ``pos`` → list of 4-int groups."""
    vals: list[int] = []
    while True:
        m = _LOC.match(s, pos)
        if not m:
            break
        vals.append(int(m.group(1)))
        pos = m.end()
    groups = [tuple(vals[i:i + 4]) for i in range(0, len(vals) - 3, 4)]
    return groups, pos


def _prov_of(groups, page_no: int, doc: DocTree, page_dims):
    """loc 4-tuples → writer-convention prov tuples (page, l, t, r, b) in
    BOTTOMLEFT coords, registering the page's dims."""
    if not groups:
        return None
    width, height = (page_dims or {}).get(page_no,
                                          (_DEFAULT_DIM, _DEFAULT_DIM))
    doc.pages.setdefault(page_no, (width, height))
    prov = []
    for x0, y0, x1, y1 in groups:
        prov.append((page_no,
                     x0 * width / 500.0,
                     height - y0 * height / 500.0,
                     x1 * width / 500.0,
                     height - y1 * height / 500.0))
    return prov


def _text_until(s: str, pos: int, *stops: str) -> tuple[str, int, str]:
    """Text from ``pos`` to the nearest of the given stop tags.

    Returns (text, position AFTER the matched stop tag, the stop tag).
    Unterminated input consumes to the end (tolerant parse).
    """
    best, which = len(s), ""
    for stop in stops:
        i = s.find(stop, pos)
        if i != -1 and i < best:
            best, which = i, stop
    return s[pos:best], best + len(which), which


def _decode_otsl(body: str) -> TableData:
    """OTSL token stream → TableData (inverse of ``doctags._otsl``)."""
    rows: list[list[tuple[str, str]]] = [[]]
    pos = 0
    while pos < len(body):
        m = _OTSL_TOKEN.match(body, pos)
        if not m:   # stray text outside a cell token: skip one char
            pos += 1
            continue
        kind = m.group(1)
        pos = m.end()
        if kind == "nl":
            rows.append([])
            continue
        if kind in ("fcel", "ched", "rhed"):
            nxt = _OTSL_TOKEN.search(body, pos)
            text = body[pos:nxt.start()] if nxt else body[pos:]
            pos = nxt.start() if nxt else len(body)
            rows[-1].append((kind, text))
        else:
            rows[-1].append((kind, ""))
    if rows and not rows[-1]:
        rows.pop()
    cells: list[TableCell] = []
    cover: dict[tuple[int, int], TableCell] = {}
    for r, row in enumerate(rows):
        for c, (kind, text) in enumerate(row):
            if kind in ("fcel", "ched", "rhed"):
                cell = TableCell(text=text, start_row=r, end_row=r + 1,
                                 start_col=c, end_col=c + 1,
                                 column_header=kind == "ched",
                                 row_header=kind == "rhed")
                cells.append(cell)
                cover[(r, c)] = cell
            elif kind == "lcel":
                cell = cover.get((r, c - 1))
                if cell is not None:
                    cell.end_col = max(cell.end_col, c + 1)
                    cover[(r, c)] = cell
            elif kind == "ucel":
                cell = cover.get((r - 1, c))
                if cell is not None:
                    cell.end_row = max(cell.end_row, r + 1)
                    cover[(r, c)] = cell
            elif kind == "xcel":
                cell = cover.get((r - 1, c)) or cover.get((r, c - 1))
                if cell is not None:
                    cell.end_row = max(cell.end_row, r + 1)
                    cell.end_col = max(cell.end_col, c + 1)
                    cover[(r, c)] = cell
            # ecel: empty slot (a started-but-empty cell serializes the
            # same way; both re-emit <ecel>, so the ambiguity is benign)
    for cell in cells:
        cell.row_span = cell.end_row - cell.start_row
        cell.col_span = cell.end_col - cell.start_col
    return TableData(num_rows=len(rows),
                     num_cols=max((len(r) for r in rows), default=0),
                     table_cells=cells)


_SECTION = re.compile(r"section_header_level_(\d+)$")


def from_doctags(text: str, page_dims: Optional[dict] = None,
                 name: str = "doc", start_page: int = 1) -> DocTree:
    """Parse a writer-grammar doctags string into a :class:`DocTree`."""
    doc = DocTree(name=name)
    s = text.strip()
    if s.startswith("<doctag>"):
        s = s[len("<doctag>"):]
    if s.endswith("</doctag>"):
        s = s[:-len("</doctag>")]
    page = start_page
    pos = 0
    # stack of (group_item, ordered_flag) for nested lists
    lists: list[tuple] = []

    def caption_item(cap_text: str, cap_groups) -> TextItem:
        # deliberately UNATTACHED to the tree: the writer serializes a
        # float's caption inline via item.caption and must not see it
        # again as a standalone body child
        item = TextItem(None, BODY, "caption", cap_text)
        item.prov = _prov_of(cap_groups, page, doc, page_dims)
        return item

    def parse_caption(pos: int, end_tag: str) -> tuple:
        """Optional <caption>…</caption> then the element's end tag."""
        if s.startswith("<caption>", pos):
            groups, p = _parse_locs(s, pos + len("<caption>"))
            cap_text, p, _ = _text_until(s, p, "</caption>")
            cap = caption_item(cap_text, groups)
            if s.startswith(end_tag, p):
                p += len(end_tag)
            return cap, p
        if s.startswith(end_tag, pos):
            return None, pos + len(end_tag)
        return None, pos

    while pos < len(s):
        if s[pos] in "\n\r \t":
            pos += 1
            continue
        m = _TAG.match(s, pos)
        if not m:
            pos += 1   # stray character between elements: tolerate
            continue
        closing, tag = m.group(1) == "/", m.group(2)
        pos = m.end()
        if closing:
            if tag in ("ordered_list", "unordered_list") and lists:
                lists.pop()
            continue   # any other stray close tag: tolerate
        if tag == "page_break":
            page += 1
            continue
        if tag in ("ordered_list", "unordered_list"):
            if lists:
                top = lists[-1][0]
                last_item = next(
                    (c for c in reversed(top.children)
                     if isinstance(c, TextItem)
                     and c.text_label == "list_item"), None)
                parent = last_item if last_item is not None else top
            else:
                parent = None
            group = doc.add_list_group(parent=parent)
            lists.append((group, tag == "ordered_list"))
            continue
        if tag == "list_item":
            groups, pos = _parse_locs(s, pos)
            item_text, pos, _ = _text_until(s, pos, "</list_item>")
            parent = lists[-1][0] if lists else doc.add_list_group()
            if not lists:
                lists.append((parent, False))
            item = doc.add_list_item(item_text, enumerated=lists[-1][1],
                                     parent=parent)
            item.prov = _prov_of(groups, page, doc, page_dims)
            continue
        if tag == "picture":
            groups, pos = _parse_locs(s, pos)
            cap, pos = parse_caption(pos, "</picture>")
            item = doc.add_picture(caption=cap)
            item.prov = _prov_of(groups, page, doc, page_dims)
            continue
        if tag == "otsl":
            groups, pos = _parse_locs(s, pos)
            body, pos, stop = _text_until(s, pos, "<caption>", "</otsl>")
            cap = None
            if stop == "<caption>":
                cap_groups, pos = _parse_locs(s, pos)
                cap_text, pos, _ = _text_until(s, pos, "</caption>")
                cap = caption_item(cap_text, cap_groups)
                if s.startswith("</otsl>", pos):
                    pos += len("</otsl>")
            item = doc.add_table(_decode_otsl(body), caption=cap)
            item.prov = _prov_of(groups, page, doc, page_dims)
            continue
        if tag == "code":
            groups, pos = _parse_locs(s, pos)
            lang = None
            lm = _CODE_LANG.match(s, pos)
            if lm:
                lang = lm.group(1)
                pos = lm.end()
            body, pos, stop = _text_until(s, pos, "<caption>", "</code>")
            cap = None
            if stop == "<caption>":
                cap_groups, pos = _parse_locs(s, pos)
                cap_text, pos, _ = _text_until(s, pos, "</caption>")
                cap = caption_item(cap_text, cap_groups)
                if s.startswith("</code>", pos):
                    pos += len("</code>")
            item = doc.add_code(body)
            item.code_language = lang
            item.caption = cap
            item.prov = _prov_of(groups, page, doc, page_dims)
            continue
        # generic text elements: title, section headers, formula, text,
        # caption, footnote, checkbox, page_header/footer, …
        groups, pos = _parse_locs(s, pos)
        if f"</{tag}>" not in s[pos:]:
            continue   # unterminated tag: treat as stray, keep scanning
        body, pos, _ = _text_until(s, pos, f"</{tag}>")
        sec = _SECTION.match(tag)
        if tag == "title":
            item = doc.add_title(body)
        elif sec:
            item = doc.add_heading(None, body, level=int(sec.group(1)))
        else:
            layer = FURNITURE if tag in _FURNITURE_LABELS else BODY
            item = doc.add_text(label=tag, text=body, content_layer=layer)
        item.prov = _prov_of(groups, page, doc, page_dims)
    return doc

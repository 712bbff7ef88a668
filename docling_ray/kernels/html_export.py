"""DocTree → HTML export (the ``save_as_html`` output format analog).

Primary consumer: the markdown backend's HTML-block round trip — documents
containing raw HTML are exported to HTML (with the raw blocks restored
verbatim) and re-parsed through the HTML extraction kernel, mirroring
``/root/reference/docling/backend/md_backend.py:530-570``.
"""

from __future__ import annotations

import html as _html

from docling_ray.doctree import (
    BODY,
    DocTree,
    GroupItem,
    Item,
    PictureItem,
    TableItem,
    TextItem,
)


def _esc(text: str) -> str:
    return _html.escape(text, quote=False)


def _inline(item: TextItem) -> str:
    if item.text_label == "code":
        text = f"<code>{item.text}</code>"
    else:
        text = _esc(item.text)
    fmt = item.formatting
    if fmt is not None:
        if fmt.bold:
            text = f"<b>{text}</b>"
        if fmt.italic:
            text = f"<i>{text}</i>"
        if fmt.underline:
            text = f"<u>{text}</u>"
        if fmt.strikethrough:
            text = f"<s>{text}</s>"
    if item.hyperlink is not None:
        text = f'<a href="{_html.escape(str(item.hyperlink))}">{text}</a>'
    return text


def _table_html(item: TableItem) -> str:
    data = item.data
    starts = {}
    covered = set()
    for cell in data.table_cells:
        starts[(cell.start_row, cell.start_col)] = cell
        for r in range(cell.start_row, cell.end_row):
            for c in range(cell.start_col, cell.end_col):
                if (r, c) != (cell.start_row, cell.start_col):
                    covered.add((r, c))
    rows = []
    for r in range(data.num_rows):
        cells = []
        for c in range(data.num_cols):
            if (r, c) in covered:
                continue
            cell = starts.get((r, c))
            if cell is None:
                cells.append("<td></td>")
                continue
            tag = "th" if (cell.column_header or cell.row_header) else "td"
            attrs = ""
            if cell.col_span > 1:
                attrs += f' colspan="{cell.col_span}"'
            if cell.row_span > 1:
                attrs += f' rowspan="{cell.row_span}"'
            cells.append(f"<{tag}{attrs}>{_esc(cell.text)}</{tag}>")
        rows.append("<tr>" + "".join(cells) + "</tr>")
    caption = ""
    if item.caption is not None and item.caption.text:
        caption = f"<caption>{_esc(item.caption.text)}</caption>"
    return f"<table>{caption}{''.join(rows)}</table>"


def _render(item: Item, out: list[str]) -> None:
    if item.content_layer != BODY:
        return
    if isinstance(item, TextItem):
        label = item.text_label
        if label == "title":
            out.append(f"<h1>{_inline(item)}</h1>")
        elif label == "section_header":
            level = min(max(item.level + 1, 1), 6)
            out.append(f"<h{level}>{_inline(item)}</h{level}>")
        elif label == "code":
            # code content is emitted raw: the markdown backend's HTML-block
            # round trip relies on marker-wrapped raw HTML passing through
            out.append(f"<pre><code>{item.text}</code></pre>")
        elif label == "formula":
            out.append(f"<p>${_esc(item.text)}$</p>")
        elif item.text:
            out.append(f"<p>{_inline(item)}</p>")
        for child in item.children:
            _render(child, out)
        return
    if isinstance(item, GroupItem):
        if item.group_label == "list":
            ordered = any(isinstance(c, TextItem) and c.enumerated
                          for c in item.children)
            tag = "ol" if ordered else "ul"
            out.append(f"<{tag}>")
            for child in item.children:
                if isinstance(child, TextItem) and child.text_label == "list_item":
                    pieces = [_inline(child)] if child.text else []
                    nested: list[str] = []
                    for sub in child.children:
                        if isinstance(sub, GroupItem) and sub.group_label == "list":
                            _render(sub, nested)
                        elif isinstance(sub, GroupItem) and sub.group_label == "inline":
                            pieces.append(_inline_group_html(sub))
                        elif isinstance(sub, TextItem):
                            pieces.append(_inline(sub))
                    out.append("<li>" + " ".join(p for p in pieces if p)
                               + "".join(nested) + "</li>")
                elif isinstance(child, GroupItem) and child.group_label == "list":
                    out.append("<li>")
                    _render(child, out)
                    out.append("</li>")
                else:
                    _render(child, out)
            out.append(f"</{tag}>")
            return
        if item.group_label == "inline":
            out.append(f"<p>{_inline_group_html(item)}</p>")
            return
        for child in item.children:
            _render(child, out)
        return
    if isinstance(item, TableItem):
        out.append(_table_html(item))
        return
    if isinstance(item, PictureItem):
        if item.caption is not None and item.caption.text:
            out.append(f"<figure><img src=\"#\" alt=\"\"/>"
                       f"<figcaption>{_esc(item.caption.text)}</figcaption>"
                       f"</figure>")
        else:
            out.append('<img src="#" alt=""/>')
        return
    for child in item.children:
        _render(child, out)


def _inline_group_html(group: GroupItem) -> str:
    pieces = []
    for child in group.children:
        if isinstance(child, TextItem):
            if child.text or child.text_label == "code":
                pieces.append(_inline(child))
        elif isinstance(child, GroupItem) and child.group_label == "inline":
            pieces.append(_inline_group_html(child))
    return " ".join(p for p in pieces if p)


def to_html(doc: DocTree) -> str:
    """Full-document HTML export (body items only; furniture title in
    <head>)."""
    out: list[str] = []
    for child in doc.body.children:
        _render(child, out)
    body = "\n".join(out)
    return ("<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\"/></head>\n"
            f"<body>\n{body}\n</body>\n</html>")


def _page_of_item(item: Item):
    if not item.prov:
        return None
    rec = item.prov[0]
    return rec["page_no"] if isinstance(rec, dict) else rec[0]


def to_html_split_page(doc: DocTree, page_images: dict[int, str] | None = None
                       ) -> str:
    """Split-page HTML view (``save_as_html(split_page_view=True)``
    analog, invoked at ``/root/reference/docling/cli/main.py:216-240``):
    a two-pane row per page — the rendered page on the left, that page's
    extracted content on the right.  ``page_images`` optionally maps
    page_no → an image URI (data: or file path); without it (no raster
    codecs in this runtime) the left pane shows a page placeholder, and
    the pane structure — what the view exists for — is preserved."""
    by_page: dict = {}
    unpaged: list[str] = []
    for child in doc.body.children:
        out: list[str] = []
        _render(child, out)
        page = _page_of_item(child)
        if page is None:
            unpaged.extend(out)
        else:
            by_page.setdefault(page, []).extend(out)
    rows = []
    for page in sorted(by_page):
        img = (page_images or {}).get(page)
        left = (f'<img src="{_esc(img)}" alt="page {page}"/>' if img
                else f'<div class="page-placeholder">page {page}</div>')
        right = "\n".join(by_page[page])
        rows.append(
            f'<div class="split-row" id="page-{page}">\n'
            f'<div class="page-pane">{left}</div>\n'
            f'<div class="content-pane">\n{right}\n</div>\n</div>')
    if unpaged:
        rows.append('<div class="split-row" id="page-unpaged">\n'
                    '<div class="page-pane"></div>\n'
                    '<div class="content-pane">\n'
                    + "\n".join(unpaged) + "\n</div>\n</div>")
    style = ("<style>.split-row{display:flex;gap:1em;border-bottom:1px "
             "solid #ccc;padding:.5em 0}.page-pane,.content-pane{flex:1}"
             ".page-placeholder{background:#eee;text-align:center;"
             "padding:2em}</style>")
    return ("<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\"/>"
            f"{style}</head>\n<body>\n" + "\n".join(rows)
            + "\n</body>\n</html>")

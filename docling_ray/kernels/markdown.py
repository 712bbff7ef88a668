"""DocTree → Markdown serializer.

Re-creates the observable output conventions of docling-core 2.46's
``DoclingDocument.export_to_markdown`` as committed in the reference's
ground-truth corpus (``/root/reference/tests/data/groundtruth/docling_v2/*.html.md``
— that corpus is the spec; docling-core itself ships no goldens here):

- blocks joined with blank lines, no trailing newline;
- ``#``/``##``… headings (section-header level + 1 hash marks);
- ``-`` bullets and ``N.`` enumerated markers, 4-space indent per nested
  list group;
- inline groups joined with single spaces;
- ``**bold**`` / ``*italic*`` / ``~~strike~~`` decoration, ``[text](target)``
  hyperlinks, `` `code` `` inline and fenced ``` blocks;
- pictures as caption text + ``<!-- image -->`` placeholder;
- tables in tabulate-"github" style (two-space header padding, numeric
  columns right-aligned);
- ``&``/``<``/``>`` html-escaped and ``_`` backslash-escaped in body text,
  never inside code;
- furniture content excluded by default.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata
from typing import Optional

from docling_ray.doctree import (
    BODY,
    DocTree,
    GroupItem,
    Item,
    PictureItem,
    TableItem,
    TextItem,
)

IMAGE_PLACEHOLDER = "<!-- image -->"
FORMULA_PLACEHOLDER = "<!-- formula-not-decoded -->"
_NUM_MARKER_RE = re.compile(r"\d+\.")
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _visible_width(s: str) -> int:
    """wcswidth-style display width: -1 if the string holds control chars,
    2 per East-Asian wide/fullwidth char, 0 for combining marks."""
    if s.isascii():
        if s.isprintable() or not s:
            return len(s)
        return -1
    width = 0
    for ch in s:
        code = ord(ch)
        if code < 32 or code == 0x7F:
            return -1
        if unicodedata.combining(ch):
            continue
        width += 2 if unicodedata.east_asian_width(ch) in ("W", "F") else 1
    return width


def _escape(text: str) -> str:
    text = _html.escape(text, quote=False)
    return text.replace("_", r"\_")


def _decorate(item: TextItem, text: str) -> str:
    fmt = item.formatting
    if fmt is not None:
        if fmt.bold:
            text = f"**{text}**"
        if fmt.italic:
            text = f"*{text}*"
        if fmt.strikethrough:
            text = f"~~{text}~~"
    if item.hyperlink is not None:
        text = f"[{text}]({item.hyperlink})"
    return text


class MarkdownSerializer:
    """Parameterized like docling-core's MarkdownParams surface: content
    ``layers``, list ``indent``, the picture ``image_placeholder`` and
    underscore escaping are caller-configurable; defaults reproduce the
    reference goldens byte-for-byte."""

    def __init__(self, layers: Optional[set] = None, indent: int = 4,
                 image_placeholder: str = IMAGE_PLACEHOLDER,
                 escape_underscores: bool = True):
        self.layers = layers if layers is not None else {BODY}
        self.indent = indent
        self.image_placeholder = image_placeholder
        self.escape_underscores = escape_underscores

    def _escape(self, text: str) -> str:
        return _escape(text) if self.escape_underscores \
            else _html.escape(text, quote=False)

    # -- public ------------------------------------------------------------
    def serialize(self, doc: DocTree) -> str:
        excluded = self._caption_refs(doc)
        parts = self._parts(doc.body, excluded, list_depth=0)
        return "\n\n".join(p for p in parts if p)

    # -- helpers -----------------------------------------------------------
    def _caption_refs(self, doc: DocTree) -> set[int]:
        refs: set[int] = set()

        def visit(item: Item):
            if isinstance(item, (PictureItem, TableItem)) and item.caption is not None:
                refs.add(id(item.caption))
            for child in item.children:
                visit(child)

        visit(doc.body)
        return refs

    def _included(self, item: Item) -> bool:
        return item.content_layer in self.layers

    def _parts(self, node: Item, excluded: set[int], list_depth: int) -> list[str]:
        """Serialize the children of ``node`` into block-level parts."""
        parts: list[str] = []
        for child in node.children:
            parts.extend(self._item_parts(child, excluded, list_depth))
        return parts

    def _item_parts(self, item: Item, excluded: set[int], list_depth: int) -> list[str]:
        if id(item) in excluded:
            return []
        if not self._included(item):
            # furniture subtree: content layer is inherited at build time, so
            # a body-layer child under a furniture group cannot occur.
            return []

        if isinstance(item, GroupItem):
            if item.group_label == "list":
                block = self._list_block(item, excluded, list_depth + 1)
                return [block] if block else []
            if item.group_label == "inline":
                block = self._inline_block(item, excluded)
                return [block] if block else []
            # section / unspecified groups are transparent containers
            return self._parts(item, excluded, list_depth)

        if isinstance(item, TextItem):
            if (item.text_label in ("title", "section_header")
                    and not item.text):
                # heading materialized empty with its content in an inline
                # group child (markdown backend shape): render inline on the
                # heading line
                inline = next(
                    (c for c in item.children
                     if isinstance(c, GroupItem) and c.group_label == "inline"),
                    None)
                if inline is not None:
                    excluded = excluded | {id(inline)}
                    hashes = "#" if item.text_label == "title" else "#" * (item.level + 1)
                    parts = [f"{hashes} {self._inline_block(inline, excluded)}"]
                    parts.extend(self._parts(item, excluded, list_depth))
                    return [p for p in parts if p]
            parts = [self._text_block(item)]
            parts.extend(self._parts(item, excluded, list_depth))
            return [p for p in parts if p]

        if isinstance(item, PictureItem):
            # children of pictures are not traversed (docling-core's
            # ``traverse_pictures=False`` default)
            parts = []
            if item.caption is not None and item.caption.text:
                parts.append(self._escape(item.caption.text))
            parts.append(self.image_placeholder)
            return parts

        if isinstance(item, TableItem):
            parts = []
            if item.caption is not None and item.caption.text:
                parts.append(self._escape(item.caption.text))
            block = _table_block(item)
            if block:
                parts.append(block)
            return parts

        return self._parts(item, excluded, list_depth)

    # -- text --------------------------------------------------------------
    def _inline_text(self, item: TextItem) -> str:
        if item.text_label == "code":
            return _decorate(item, f"`{item.text}`")
        if item.text_label == "formula":
            return f"${item.text}$" if item.text else FORMULA_PLACEHOLDER
        return _decorate(item, self._escape(item.text))

    def _text_block(self, item: TextItem) -> str:
        label = item.text_label
        if label == "title":
            return f"# {_decorate(item, self._escape(item.text))}"
        if label == "section_header":
            return f"{'#' * (item.level + 1)} {_decorate(item, self._escape(item.text))}"
        if label == "code":
            return f"```\n{item.text}\n```"
        if label == "formula":
            if item.text:
                return f"$${item.text}$$"
            return FORMULA_PLACEHOLDER
        if not item.text:
            return ""
        return self._inline_text(item)

    # -- inline groups -------------------------------------------------------
    def _inline_block(self, group: GroupItem, excluded: set[int]) -> str:
        pieces: list[str] = []
        for child in group.children:
            if id(child) in excluded or not self._included(child):
                continue
            if isinstance(child, TextItem) and child.text_label not in (
                    "title", "section_header"):
                if child.text:
                    pieces.append(self._inline_text(child))
            elif isinstance(child, GroupItem) and child.group_label == "inline":
                sub = self._inline_block(child, excluded)
                if sub:
                    pieces.append(sub)
            elif isinstance(child, PictureItem):
                if child.caption is not None and child.caption.text:
                    pieces.append(child.caption.text)
                pieces.append(self.image_placeholder)
            else:
                pieces.extend(self._item_parts(child, excluded, 0))
        return " ".join(p for p in pieces if p)

    # -- lists ---------------------------------------------------------------
    def _list_block(self, group: GroupItem, excluded: set[int], depth: int) -> str:
        """Serialize one list group; ``depth`` counts enclosing list groups
        including this one → indent = 4 * (depth - 1)."""
        lines: list[str] = []
        indent = " " * (self.indent * (depth - 1))
        # Ordered-list rendering (empirically matched to the ground-truth
        # corpus): a group renders ordered iff its first list item is
        # enumerated with an empty or "N."-style marker.  Enumerated items
        # with an explicit "N." marker always show it; enumerated items with
        # a non-standard marker (e.g. "(1)") render as bullets with the
        # marker folded into the text; in an ordered group unmarked items get
        # their 1-based child position.
        ordered = next(
            (c.enumerated for c in group.children
             if isinstance(c, TextItem) and c.text_label == "list_item"),
            False,
        )
        for position, child in enumerate(group.children, start=1):
            if id(child) in excluded or not self._included(child):
                continue
            if isinstance(child, TextItem) and child.text_label == "list_item":
                content = self._list_item_content(child, excluded, depth)
                if child.enumerated and child.marker and _NUM_MARKER_RE.fullmatch(child.marker):
                    marker = child.marker
                elif child.enumerated and child.marker:
                    marker = "-"
                    content = f"{child.marker} {content}"
                elif child.enumerated or ordered:
                    marker = f"{position}."
                else:
                    marker = "-"
                lines.append(f"{indent}{marker} {content}")
                # nested list groups under the item follow on their own lines
                for sub in child.children:
                    if isinstance(sub, GroupItem) and sub.group_label == "list":
                        block = self._list_block(sub, excluded, depth + 1)
                        if block:
                            lines.append(block)
            elif isinstance(child, GroupItem) and child.group_label == "list":
                block = self._list_block(child, excluded, depth + 1)
                if block:
                    lines.append(block)
            elif isinstance(child, PictureItem):
                lines.append("\n\n".join(self._item_parts(child, excluded, depth)))
            elif isinstance(child, TableItem):
                block = _table_block(child)
                if block:
                    lines.append(block)
            elif isinstance(child, TextItem):
                if child.text:
                    lines.append(f"{indent}{self._inline_text(child)}")
        return "\n".join(lines)

    def _list_item_content(self, item: TextItem, excluded: set[int], depth: int) -> str:
        pieces = []
        if item.text:
            pieces.append(self._inline_text(item))
        for child in item.children:
            if isinstance(child, GroupItem) and child.group_label == "inline":
                sub = self._inline_block(child, excluded)
                if sub:
                    pieces.append(sub)
            elif isinstance(child, TextItem) and child.text:
                pieces.append(self._inline_text(child))
        return " ".join(pieces)


# -- tables ----------------------------------------------------------------

def _is_number(s: str) -> bool:
    return bool(_INT_RE.match(s) or _FLOAT_RE.match(s))


def _table_block(item: TableItem) -> str:
    """tabulate(tablefmt="github") emulation: header row + dashed separator,
    per-column width = max(data width, header width + 2), numeric columns
    right-aligned."""
    data = item.data
    # header-only (or empty) tables are dropped, like the reference corpus
    if data.num_rows < 2 or data.num_cols == 0:
        return ""
    grid = [[cell.replace("\n", " ") for cell in row] for row in data.grid()]
    header, rows = grid[0], grid[1:]

    ncols = data.num_cols
    widths = []
    numeric = []
    padded_rows = [list(row) for row in rows]
    for j in range(ncols):
        col = [row[j] for row in rows]
        is_num = bool(col) and all(_is_number(c) for c in col)
        numeric.append(is_num)
        if is_num:
            # float columns are re-rendered with "g" formatting, then
            # decimal-aligned (pad fractions so the points line up)
            if not all(_INT_RE.match(c) for c in col):
                for row in padded_rows:
                    row[j] = format(float(row[j]), "g")

            def frac_len(s: str) -> int:
                return len(s) - s.index(".") if "." in s else 0
            frac_w = max(frac_len(row[j]) for row in padded_rows)
            for row in padded_rows:
                row[j] = row[j] + " " * (frac_w - frac_len(row[j]))
        w = max([_visible_width(row[j]) for row in padded_rows]
                + [_visible_width(header[j]) + 2])
        widths.append(w)

    def fmt_row(cells: list[str]) -> str:
        out = []
        for j, cell in enumerate(cells):
            pad = max(widths[j] - _visible_width(cell), 0)
            out.append(" " * pad + cell if numeric[j] else cell + " " * pad)
        return "| " + " | ".join(out) + " |"

    lines = [fmt_row(header)]
    lines.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for row in padded_rows:
        lines.append(fmt_row(row))
    return "\n".join(lines)


def to_markdown(doc: DocTree, layers: Optional[set] = None,
                **params) -> str:
    return MarkdownSerializer(layers=layers, **params).serialize(doc)


_MD_MARKUP_RE = re.compile(
    r"</?[a-zA-Z][^>]*>|^#{1,6} |\*\*?|~~|`{1,3}|^\s*- |^\s*\d+\. ",
    re.MULTILINE)


def to_text(doc: DocTree, layers: Optional[set] = None) -> str:
    """Plain-text export (the reference CLI's ``.txt`` output,
    ``strict_text`` flavour): markdown with structural markup stripped."""
    md = to_markdown(doc, layers=layers)
    text = _MD_MARKUP_RE.sub("", md)
    text = text.replace("<!-- image -->", "").replace(FORMULA_PLACEHOLDER, "")
    lines = [ln.rstrip() for ln in text.split("\n")]
    out = "\n".join(lines)
    return re.sub(r"\n{3,}", "\n\n", out).strip()

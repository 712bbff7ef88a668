"""Document item tree — the engine's in-memory IR for one document.

A lightweight re-expression of the observable structure of the reference's
``DoclingDocument`` (constructed e.g. at
``/root/reference/docling/backend/html_backend.py:247`` and exported to
markdown by docling-core): a tree of typed nodes (title, section headers with
level, text, code, list groups / list items, inline groups, tables, pictures
with captions) with a body/furniture content-layer split.  Plain dataclasses,
no pydantic — instances live only inside one ``map_batches`` UDF call and are
serialized to Arrow columns (markdown text / JSON) at stage boundaries.
"""

from __future__ import annotations

import posixpath
import re
from dataclasses import dataclass, field
from typing import Optional, Union
from urllib.parse import urlsplit, urlunsplit

BODY = "body"
FURNITURE = "furniture"

SUB = "sub"
SUPER = "sup"


@dataclass(frozen=True)
class Formatting:
    bold: bool = False
    italic: bool = False
    underline: bool = False
    strikethrough: bool = False
    script: Optional[str] = None  # SUB / SUPER


_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


@dataclass(frozen=True)
class Hyperlink:
    """A normalized link target: absolute URL or path-like fragment.

    Mirrors the reference's ``AnyUrl``-or-``Path`` fallback
    (``/root/reference/docling/backend/html_backend.py:480-485``): absolute
    URLs are normalized the way pydantic renders them (lower-case scheme and
    host, ``/`` path added to bare authorities), anything else is kept
    verbatim as a path string.
    """

    target: str
    is_url: bool

    def __str__(self) -> str:
        return self.target


def make_hyperlink(href: str, base_url: Optional[str] = None) -> Optional[Hyperlink]:
    if not href:
        return None
    if base_url:
        href = urljoin_str(base_url, href)
    if _SCHEME_RE.match(href):
        try:
            parts = urlsplit(href)
        except ValueError:
            return Hyperlink(href, False)
        if parts.scheme in ("http", "https", "ftp", "ws", "wss", "file"):
            path = parts.path or "/"
            normalized = urlunsplit(
                (parts.scheme.lower(), parts.netloc.lower(), path, parts.query, parts.fragment)
            )
            return Hyperlink(normalized, True)
        return Hyperlink(href, True)
    return Hyperlink(href, False)


def urljoin_str(base: str, href: str) -> str:
    from urllib.parse import urljoin

    return urljoin(base, href)


class Item:
    """Base node: every item knows its parent, children and content layer.

    ``prov`` (optional) is the first provenance record: a
    ``(page_no, l, t, r, b)`` tuple in the source page's BOTTOMLEFT
    coordinates (docling-core convention)."""

    __slots__ = ("parent", "children", "content_layer", "self_id", "prov",
                 "annotations")

    def __init__(self, parent: Optional["Item"], content_layer: str):
        self.parent = parent
        self.children: list[Item] = []
        self.content_layer = content_layer
        self.self_id = -1
        self.prov = None
        # enrichment outputs (code language, picture class, descriptions…)
        self.annotations: list = []
        if parent is not None:
            parent.children.append(self)

    @property
    def label(self) -> str:
        raise NotImplementedError


class GroupItem(Item):
    __slots__ = ("group_label", "name")

    def __init__(self, parent, content_layer, group_label: str, name: str = "group"):
        super().__init__(parent, content_layer)
        self.group_label = group_label  # unspecified | list | inline | section
        self.name = name

    @property
    def label(self) -> str:
        return self.group_label


class TextItem(Item):
    __slots__ = ("text_label", "text", "orig", "formatting", "hyperlink", "level",
                 "enumerated", "marker", "code_language", "caption")

    def __init__(
        self,
        parent,
        content_layer,
        label: str,
        text: str,
        orig: Optional[str] = None,
        formatting: Optional[Formatting] = None,
        hyperlink: Optional[Hyperlink] = None,
        level: int = 0,
        enumerated: bool = False,
        marker: str = "",
    ):
        super().__init__(parent, content_layer)
        self.text_label = label  # title|section_header|text|code|caption|list_item
        self.text = text
        self.orig = text if orig is None else orig
        self.formatting = formatting
        self.hyperlink = hyperlink
        self.level = level
        self.enumerated = enumerated
        self.marker = marker
        self.code_language = None
        self.caption = None  # floating captions can attach to code items too

    @property
    def label(self) -> str:
        return self.text_label


@dataclass
class TableCell:
    text: str
    row_span: int = 1
    col_span: int = 1
    start_row: int = 0
    end_row: int = 1
    start_col: int = 0
    end_col: int = 1
    column_header: bool = False
    row_header: bool = False


@dataclass
class TableData:
    num_rows: int = 0
    num_cols: int = 0
    table_cells: list[TableCell] = field(default_factory=list)

    def grid(self) -> list[list[str]]:
        """Span-replicated text grid (empty string for unfilled slots)."""
        grid = [["" for _ in range(self.num_cols)] for _ in range(self.num_rows)]
        for cell in self.table_cells:
            for r in range(cell.start_row, min(cell.end_row, self.num_rows)):
                for c in range(cell.start_col, min(cell.end_col, self.num_cols)):
                    grid[r][c] = cell.text
        return grid


class TableItem(Item):
    __slots__ = ("data", "caption")

    def __init__(self, parent, content_layer, data: TableData,
                 caption: Optional[TextItem] = None):
        super().__init__(parent, content_layer)
        self.data = data
        self.caption = caption

    @property
    def label(self) -> str:
        return "table"


class PictureItem(Item):
    __slots__ = ("caption",)

    def __init__(self, parent, content_layer, caption: Optional[TextItem] = None):
        super().__init__(parent, content_layer)
        self.caption = caption

    @property
    def label(self) -> str:
        return "picture"


class DocTree:
    """One document's item tree plus builder methods.

    The ``add_*`` methods mirror the construction surface the reference
    backend uses on ``DoclingDocument`` (``add_title`` / ``add_heading`` /
    ``add_text`` / ``add_code`` / ``add_group`` / ``add_list_group`` /
    ``add_list_item`` / ``add_table`` / ``add_picture``); an item with no
    parent attaches to the body root.
    """

    def __init__(self, name: str = "doc"):
        self.name = name
        self.body = GroupItem(None, BODY, "unspecified", "_root_")
        self.pages: dict[int, tuple[float, float]] = {}
        self._counter = 0

    def _attach(self, item: Item, parent: Optional[Item]) -> Item:
        if item.parent is None:
            target = parent if parent is not None else self.body
            item.parent = target
            target.children.append(item)
        item.self_id = self._counter
        self._counter += 1
        return item

    def add_title(self, text, orig=None, content_layer=BODY, formatting=None,
                  hyperlink=None, parent=None) -> TextItem:
        item = TextItem(None, content_layer, "title", text, orig=orig,
                        formatting=formatting, hyperlink=hyperlink)
        self._attach(item, parent)
        return item

    def add_heading(self, parent, text, orig=None, level=1, content_layer=BODY,
                    formatting=None, hyperlink=None) -> TextItem:
        item = TextItem(None, content_layer, "section_header", text, orig=orig,
                        formatting=formatting, hyperlink=hyperlink, level=level)
        self._attach(item, parent)
        return item

    def add_text(self, label="text", text="", orig=None, parent=None,
                 content_layer=BODY, formatting=None, hyperlink=None) -> TextItem:
        item = TextItem(None, content_layer, label, text, orig=orig,
                        formatting=formatting, hyperlink=hyperlink)
        self._attach(item, parent)
        return item

    def add_code(self, text, parent=None, content_layer=BODY, formatting=None,
                 hyperlink=None) -> TextItem:
        item = TextItem(None, content_layer, "code", text,
                        formatting=formatting, hyperlink=hyperlink)
        self._attach(item, parent)
        return item

    def add_group(self, label="unspecified", name="group", parent=None,
                  content_layer=BODY) -> GroupItem:
        item = GroupItem(None, content_layer, label, name)
        self._attach(item, parent)
        return item

    def add_list_group(self, name="list", parent=None, content_layer=BODY) -> GroupItem:
        return self.add_group("list", name, parent, content_layer)

    def add_inline_group(self, parent=None, content_layer=BODY) -> GroupItem:
        return self.add_group("inline", "group", parent, content_layer)

    def add_list_item(self, text, enumerated=False, marker="", orig=None,
                      parent=None, content_layer=BODY, formatting=None,
                      hyperlink=None) -> TextItem:
        item = TextItem(None, content_layer, "list_item", text, orig=orig,
                        formatting=formatting, hyperlink=hyperlink,
                        enumerated=enumerated, marker=marker)
        self._attach(item, parent)
        return item

    def add_table(self, data: TableData, parent=None, content_layer=BODY,
                  caption=None) -> TableItem:
        item = TableItem(None, content_layer, data, caption=caption)
        self._attach(item, parent)
        return item

    def add_picture(self, caption=None, parent=None, content_layer=BODY) -> PictureItem:
        item = PictureItem(None, content_layer, caption)
        self._attach(item, parent)
        return item

    # -- iteration -------------------------------------------------------
    def iterate(self, root: Optional[Item] = None):
        """Pre-order DFS of (item, depth) pairs, body root excluded."""

        def _walk(item: Item, depth: int):
            yield item, depth
            for child in item.children:
                yield from _walk(child, depth + 1)

        start = root if root is not None else self.body
        for child in start.children:
            yield from _walk(child, 1)

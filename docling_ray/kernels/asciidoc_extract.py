"""AsciiDoc → DocTree extraction kernel.

Behavioral re-expression of the reference AsciiDoc line-state-machine
(``/root/reference/docling/backend/asciidoc_backend.py:29-443``): titles
(``= ``), section headers (``==+``), indent-nested lists, ``|===`` tables
with first-row headers, ``image::`` macros and dot-prefixed (multi-line)
captions, with paragraph lines accumulated until a blank line.
"""

from __future__ import annotations

import re
from typing import Optional

from docling_ray.doctree import DocTree, TableCell, TableData

_TITLE_RE = re.compile(r"^= ")
_SECTION_RE = re.compile(r"^(=+)\s+(.*)")
_IS_SECTION_RE = re.compile(r"^==+\s+")
_IS_LIST_RE = re.compile(r"^(\s)*(\*|-|\d+\.|\w+\.) ")
_LIST_RE = re.compile(r"^(\s*)(\*|-|\d+\.)\s+(.*)")
_TABLE_LINE_RE = re.compile(r"^\|.*\|")
_PICTURE_RE = re.compile(r"^image::")
_CAPTION_RE = re.compile(r"^\.(.+)")


def _parse_list_item(line: str) -> dict:
    match = _LIST_RE.match(line)
    if match:
        indent, marker, text = match.groups()
        return {"text": text.strip(), "numbered": marker not in ("*", "-"),
                "indent": len(indent or "")}
    return {"text": line, "numbered": False, "indent": 0}


def _table_grid(rows: list[list[str]]) -> TableData:
    num_rows = len(rows)
    num_cols = max(len(row) for row in rows)
    data = TableData(num_rows=num_rows, num_cols=num_cols, table_cells=[])
    for r, row in enumerate(rows):
        for c, text in enumerate(row):
            data.table_cells.append(TableCell(
                text=text, start_row=r, end_row=r + 1, start_col=c,
                end_col=c + 1, column_header=r == 0, row_header=False))
    return data


def extract_asciidoc(raw: bytes, name: str = "doc") -> DocTree:
    lines = raw.decode("utf-8").split("\n")
    doc = DocTree(name=name)

    in_list = False
    in_table = False
    text_data: list[str] = []
    table_data: list[list[str]] = []
    caption_data: list[str] = []
    parents: dict[int, Optional[object]] = {i: None for i in range(10)}
    indents: dict[int, Optional[int]] = {i: None for i in range(10)}

    def current_level() -> int:
        for k, v in parents.items():
            if v is None and k > 0:
                return k - 1
        return 0

    def current_parent():
        for k, v in parents.items():
            if v is None and k > 0:
                return parents[k - 1]
        return None

    for line in lines:
        if _TITLE_RE.match(line):
            parents[0] = doc.add_text(label="title", text=line[2:].strip())

        elif _IS_SECTION_RE.match(line):
            match = _SECTION_RE.match(line)
            level = match.group(1).count("=") - 1
            parents[level] = doc.add_heading(
                text=match.group(2).strip(), level=level,
                parent=parents[level - 1])
            for k in parents:
                if k > level:
                    parents[k] = None

        elif _IS_LIST_RE.match(line):
            item = _parse_list_item(line)
            level = current_level()
            if not in_list:
                in_list = True
                parents[level + 1] = doc.add_list_group(
                    name="list", parent=parents[level])
                indents[level + 1] = item["indent"]
            elif item["indent"] > (indents[level] or 0):
                parents[level + 1] = doc.add_list_group(
                    name="list", parent=parents[level])
                indents[level + 1] = item["indent"]
            elif indents[level] is not None and item["indent"] < indents[level]:
                while indents[level] is not None and item["indent"] < indents[level]:
                    parents[level] = None
                    indents[level] = None
                    level -= 1
            doc.add_list_item(item["text"], parent=current_parent())

        elif in_list:
            # a non-list line ends the list; the line itself is consumed
            # (reference behavior)
            in_list = False
            parents[current_level()] = None

        elif line.strip() == "|===" and not in_table:
            in_table = True

        elif _TABLE_LINE_RE.match(line):
            in_table = True
            table_data.append([c.strip() for c in line.split("|") if c.strip()])

        elif in_table:
            caption = None
            if caption_data:
                caption = doc.add_text(label="caption",
                                       text=" ".join(caption_data))
            caption_data = []
            if table_data:
                doc.add_table(data=_table_grid(table_data),
                              parent=current_parent(), caption=caption)
            elif caption is not None:
                doc.add_table(data=TableData(), parent=current_parent(),
                              caption=caption)
            in_table = False
            table_data = []

        elif _PICTURE_RE.match(line):
            caption = None
            if caption_data:
                caption = doc.add_text(label="caption",
                                       text=" ".join(caption_data))
            caption_data = []
            doc.add_picture(caption=caption, parent=None)

        elif _CAPTION_RE.match(line) and not caption_data:
            caption_data.append(_CAPTION_RE.match(line).group(1))

        elif line.strip() and caption_data:  # multiline captions
            caption_data.append(line.strip())

        elif not line.strip() and text_data:
            doc.add_text(label="paragraph", text=" ".join(text_data),
                         parent=current_parent())
            text_data = []

        elif line.strip():
            text_data.append(line.strip())

    if text_data:
        doc.add_text(label="paragraph", text=" ".join(text_data),
                     parent=current_parent())
    if in_table and table_data:
        doc.add_table(data=_table_grid(table_data), parent=current_parent())
    return doc

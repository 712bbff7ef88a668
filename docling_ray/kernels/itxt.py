"""Indented-text export (the reference's ``_export_to_indented_text``),
matched byte-for-byte against ``groundtruth/docling_v2/*.itxt``.

One line per node in pre-order: ``item-N at level L: <label>: <text>`` with
two-space indentation per level, 70-char middle-ellipsis truncation, picture
captions echoed beneath the picture with the picture's own item number, and
tables rendered as ``table with [RxC]``.
"""

from __future__ import annotations

from docling_ray.doctree import (
    DocTree,
    GroupItem,
    Item,
    PictureItem,
    TableItem,
    TextItem,
)


def _clip(text: str, max_len) -> str:
    if max_len is None:
        return text
    head = (max_len - 6) // 2
    tail = max_len - head
    if len(text) < head + tail + 5:
        return text
    return text[:head] + " ... " + text[-tail:]


def to_indented_text(doc: DocTree, max_text_len=70) -> str:
    lines: list[str] = []
    counter = 0

    def emit(item: Item, level: int) -> None:
        nonlocal counter
        if item.content_layer != "body":
            return
        number = counter
        counter += 1
        pad = "  " * level
        if isinstance(item, GroupItem):
            lines.append(f"{pad}item-{number} at level {level}: "
                         f"{item.group_label}: group {item.name}")
        elif isinstance(item, TextItem):
            lines.append(f"{pad}item-{number} at level {level}: "
                         f"{item.label}: {_clip(item.text, max_text_len)}")
        elif isinstance(item, PictureItem):
            lines.append(f"{pad}item-{number} at level {level}: picture")
            if item.caption is not None and item.caption.text:
                # caption echo lines are never truncated
                lines.append(f"{pad}  item-{number} at level {level + 1}: "
                             f"caption: {item.caption.text}")
        elif isinstance(item, TableItem):
            lines.append(f"{pad}item-{number} at level {level}: table with "
                         f"[{item.data.num_rows}x{item.data.num_cols}]")
            if item.caption is not None and item.caption.text:
                lines.append(f"{pad}  item-{number} at level {level + 1}: "
                             f"caption: {item.caption.text}")
        else:
            lines.append(f"{pad}item-{number} at level {level}: {item.label}")
        for child in item.children:
            emit(child, level + 1)

    lines.append("item-0 at level 0: unspecified: group _root_")
    counter = 1
    for child in doc.body.children:
        emit(child, 1)
    return "\n".join(lines)

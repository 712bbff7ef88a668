"""Load a docling-style document JSON into a :class:`DocTree`.

The reference's ground-truth corpus stores each converted document both as
markdown and as an item-tree JSON
(``/root/reference/tests/data/groundtruth/docling_v2/*.json``).  This loader
maps that JSON schema onto our :class:`docling_ray.doctree.DocTree`, which
lets the markdown serializer be validated against *every* ground-truth
md/json pair (all input formats) and gives the engine a docling-JSON reader
(parity with ``/root/reference/docling/backend/json/docling_json_backend.py:39-57``).
"""

from __future__ import annotations

import json
from typing import Optional, Union

from docling_ray.doctree import (
    BODY,
    DocTree,
    Formatting,
    GroupItem,
    Hyperlink,
    Item,
    PictureItem,
    TableCell,
    TableData,
    TableItem,
    TextItem,
)

_TEXT_LABELS = {
    "title", "section_header", "text", "paragraph", "caption", "list_item",
    "code", "formula", "footnote", "page_header", "page_footer", "reference",
    "checkbox_selected", "checkbox_unselected",
}


def _formatting(node: dict) -> Optional[Formatting]:
    fmt = node.get("formatting")
    if not fmt:
        return None
    return Formatting(
        bold=fmt.get("bold", False),
        italic=fmt.get("italic", False),
        underline=fmt.get("underline", False),
        strikethrough=fmt.get("strikethrough", False),
        script=None if fmt.get("script") in (None, "baseline") else fmt.get("script"),
    )


def _hyperlink(node: dict) -> Optional[Hyperlink]:
    link = node.get("hyperlink")
    if not link:
        return None
    return Hyperlink(str(link), is_url="://" in str(link))


def load_docjson(data: Union[str, bytes, dict]) -> DocTree:
    if not isinstance(data, dict):
        data = json.loads(data)

    doc = DocTree(name=data.get("name", "doc"))
    for key, page in (data.get("pages") or {}).items():
        size = page.get("size") or {}
        doc.pages[int(page.get("page_no", key))] = (
            size.get("width", 0.0), size.get("height", 0.0))
    pools = {
        "texts": data.get("texts", []),
        "groups": data.get("groups", []),
        "tables": data.get("tables", []),
        "pictures": data.get("pictures", []),
        "key_value_items": data.get("key_value_items", []),
        "form_items": data.get("form_items", []),
    }
    built: dict[str, Item] = {}

    def resolve(ref: str) -> Optional[dict]:
        parts = ref.split("/")
        if len(parts) != 3 or parts[1] not in pools:
            return None
        idx = int(parts[2])
        pool = pools[parts[1]]
        return pool[idx] if idx < len(pool) else None

    def _caption_item(node: dict) -> Optional[TextItem]:
        """Resolve a floating item's first caption ref to a (possibly
        detached) TextItem; the body walk reuses the same instance."""
        caps = node.get("captions", [])
        if not caps:
            return None
        cap_ref = caps[0].get("$ref")
        cap_node = resolve(cap_ref) if cap_ref else None
        if cap_node is None:
            return None
        cap_item = built.get(cap_ref)
        if cap_item is None:
            cap_item = TextItem(
                None, cap_node.get("content_layer", BODY),
                "caption", cap_node.get("text", ""),
                orig=cap_node.get("orig"),
                formatting=_formatting(cap_node),
                hyperlink=_hyperlink(cap_node),
            )
            cap_item.prov = [
                (p.get("page_no", 1), (p.get("bbox") or {}).get("l", 0.0),
                 (p.get("bbox") or {}).get("t", 0.0),
                 (p.get("bbox") or {}).get("r", 0.0),
                 (p.get("bbox") or {}).get("b", 0.0))
                for p in (cap_node.get("prov") or [])
            ] or None
            built[cap_ref] = cap_item
        return cap_item

    def build(ref: str, parent: Item) -> Optional[Item]:
        if ref in built:
            # pre-created detached (a float's caption): attach at the
            # position the tree actually references it from
            existing = built[ref]
            if existing is not None and existing.parent is None:
                existing.parent = parent
                parent.children.append(existing)
            return existing
        node = resolve(ref)
        if node is None:
            return None
        kind = ref.split("/")[1]
        layer = node.get("content_layer", BODY)
        item: Optional[Item] = None
        prov_list = node.get("prov") or []
        prov = [
            (p.get("page_no", 1), (p.get("bbox") or {}).get("l", 0.0),
             (p.get("bbox") or {}).get("t", 0.0),
             (p.get("bbox") or {}).get("r", 0.0),
             (p.get("bbox") or {}).get("b", 0.0))
            for p in prov_list
        ] or None

        if kind == "texts":
            label = node.get("label", "text")
            if label not in _TEXT_LABELS:
                label = "text"
            item = TextItem(
                parent, layer, label, node.get("text", ""),
                orig=node.get("orig"),
                formatting=_formatting(node),
                hyperlink=_hyperlink(node),
                level=node.get("level", 0),
                enumerated=node.get("enumerated", False),
                marker=node.get("marker", ""),
            )
            item.code_language = node.get("code_language")
            item.annotations = list(node.get("annotations") or [])
            if node.get("captions"):
                item.caption = _caption_item(node)
        elif kind == "groups":
            item = GroupItem(parent, layer, node.get("label", "unspecified"),
                             node.get("name", "group"))
        elif kind == "tables":
            table_data = node.get("data", {})
            table_caption = _caption_item(node)
            cells = [
                TableCell(
                    text=c.get("text", ""),
                    row_span=c.get("row_span", 1),
                    col_span=c.get("col_span", 1),
                    start_row=c.get("start_row_offset_idx", 0),
                    end_row=c.get("end_row_offset_idx", 1),
                    start_col=c.get("start_col_offset_idx", 0),
                    end_col=c.get("end_col_offset_idx", 1),
                    column_header=c.get("column_header", False),
                    row_header=c.get("row_header", False),
                )
                for c in table_data.get("table_cells", [])
            ]
            item = TableItem(parent, layer, TableData(
                num_rows=table_data.get("num_rows", 0),
                num_cols=table_data.get("num_cols", 0),
                table_cells=cells,
            ), caption=table_caption)
        elif kind == "pictures":
            item = PictureItem(parent, layer, caption=_caption_item(node))
            item.annotations = list(node.get("annotations") or [])
        else:
            item = GroupItem(parent, layer, "unspecified", kind)

        if item is not None:
            item.prov = prov
        built[ref] = item
        for child in node.get("children", []):
            child_ref = child.get("$ref")
            if child_ref:
                build(child_ref, item)
        return item

    body = data.get("body", {})
    for child in body.get("children", []):
        ref = child.get("$ref")
        if not ref:
            continue
        if ref in built:
            # already created detached (caption consumed by a picture):
            # attach to body in encounter order.
            item = built[ref]
            if item.parent is None:
                item.parent = doc.body
                doc.body.children.append(item)
        else:
            build(ref, doc.body)
    return doc

"""DocTree → docling-style JSON export (the ``save_as_json`` output format,
inverse of :mod:`docling_ray.kernels.docjson`).

Emits the reference's document schema shape — pooled ``texts`` / ``groups``
/ ``tables`` / ``pictures`` arrays with ``$ref`` children and caption refs —
so a document exported here re-loads with :func:`load_docjson` into an
equivalent tree (round-trip asserted over the whole ground-truth corpus).
"""

from __future__ import annotations

import json
from typing import Union

from docling_ray.doctree import (
    DocTree,
    GroupItem,
    Item,
    PictureItem,
    TableItem,
    TextItem,
)


def docjson_dict(doc: DocTree) -> dict:
    texts: list[dict] = []
    groups: list[dict] = []
    tables: list[dict] = []
    pictures: list[dict] = []
    refs: dict[int, str] = {}

    def alloc(item: Item) -> str:
        if id(item) in refs:
            return refs[id(item)]
        if isinstance(item, GroupItem):
            pool, kind = groups, "groups"
        elif isinstance(item, TableItem):
            pool, kind = tables, "tables"
        elif isinstance(item, PictureItem):
            pool, kind = pictures, "pictures"
        else:
            pool, kind = texts, "texts"
        ref = f"#/{kind}/{len(pool)}"
        refs[id(item)] = ref
        pool.append({})  # placeholder, filled below
        return ref

    def fill(item: Item, parent_ref: str) -> str:
        ref = alloc(item)
        node: dict = {
            "self_ref": ref,
            "parent": {"$ref": parent_ref},
            "children": [],
            "content_layer": item.content_layer,
        }
        if isinstance(item, GroupItem):
            node["name"] = item.name
            node["label"] = item.group_label
        elif isinstance(item, TextItem):
            node["label"] = item.text_label
            node["prov"] = []
            node["orig"] = item.orig
            node["text"] = item.text
            if item.text_label == "section_header":
                node["level"] = item.level
            if item.text_label == "list_item":
                node["enumerated"] = item.enumerated
                node["marker"] = item.marker
            if item.formatting is not None:
                fmt = item.formatting
                node["formatting"] = {
                    "bold": fmt.bold, "italic": fmt.italic,
                    "underline": fmt.underline,
                    "strikethrough": fmt.strikethrough,
                    "script": fmt.script or "baseline",
                }
            if item.hyperlink is not None:
                node["hyperlink"] = str(item.hyperlink)
            if item.annotations:
                # enrichment outputs; omitted when empty so unenriched
                # documents round-trip byte-identically
                node["annotations"] = item.annotations
        elif isinstance(item, TableItem):
            node["label"] = "table"
            node["prov"] = []
            node["captions"] = []
            node["references"] = []
            node["footnotes"] = []
            node["data"] = {
                "table_cells": [
                    {
                        "text": c.text,
                        "row_span": c.row_span,
                        "col_span": c.col_span,
                        "start_row_offset_idx": c.start_row,
                        "end_row_offset_idx": c.end_row,
                        "start_col_offset_idx": c.start_col,
                        "end_col_offset_idx": c.end_col,
                        "column_header": c.column_header,
                        "row_header": c.row_header,
                    }
                    for c in item.data.table_cells
                ],
                "num_rows": item.data.num_rows,
                "num_cols": item.data.num_cols,
            }
            if item.caption is not None:
                cap_ref = fill_caption(item.caption)
                node["captions"] = [{"$ref": cap_ref}]
        elif isinstance(item, PictureItem):
            node["label"] = "picture"
            node["prov"] = []
            node["captions"] = []
            node["references"] = []
            node["footnotes"] = []
            node["annotations"] = list(item.annotations)
            if item.caption is not None:
                cap_ref = fill_caption(item.caption)
                node["captions"] = [{"$ref": cap_ref}]
        pool_name, idx = ref.split("/")[1], int(ref.split("/")[2])
        {"texts": texts, "groups": groups, "tables": tables,
         "pictures": pictures}[pool_name][idx] = node
        for child in item.children:
            child_ref = fill(child, ref)
            node["children"].append({"$ref": child_ref})
        return ref

    def fill_caption(caption: TextItem) -> str:
        # caption items may live at body level (filled there) or be
        # detached; either way allocate once and fill if detached
        if id(caption) in refs:
            return refs[id(caption)]
        ref = alloc(caption)
        idx = int(ref.split("/")[2])
        texts[idx] = {
            "self_ref": ref,
            "parent": {"$ref": "#/body"},
            "children": [],
            "content_layer": caption.content_layer,
            "label": "caption",
            "prov": [],
            "orig": caption.orig,
            "text": caption.text,
        }
        return ref

    body_children = []
    for child in doc.body.children:
        body_children.append({"$ref": fill(child, "#/body")})

    return {
        "schema_name": "DoclingDocument",
        "version": "1.6.0",
        "name": doc.name,
        "origin": {"mimetype": "text/html", "binary_hash": 0,
                   "filename": doc.name},
        "furniture": {"self_ref": "#/furniture", "children": [],
                      "content_layer": "furniture", "name": "_root_",
                      "label": "unspecified"},
        "body": {"self_ref": "#/body", "children": body_children,
                 "content_layer": "body", "name": "_root_",
                 "label": "unspecified"},
        "groups": groups,
        "texts": texts,
        "pictures": pictures,
        "tables": tables,
        "key_value_items": [],
        "form_items": [],
        "pages": {},
    }


def to_docjson(doc: DocTree, indent: Union[int, None] = None) -> str:
    return json.dumps(docjson_dict(doc), ensure_ascii=False, indent=indent)

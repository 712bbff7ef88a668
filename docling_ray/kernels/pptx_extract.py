"""PPTX → DocTree extraction kernel.

Behavioral re-expression of the reference PowerPoint backend
(``/root/reference/docling/backend/mspowerpoint_backend.py:35-398``) without
python-pptx: slides in presentation order become chapter groups; text frames
are split into paragraphs with bullet/number detection (buChar / buAutoNum /
indent level), placeholder types map titles and subtitles, tables come from
``a:tbl`` with row/grid spans, pictures and grouped shapes recurse, and
notes slides land in the furniture layer.
"""

from __future__ import annotations

import zipfile
from io import BytesIO
from typing import Optional
from xml.etree import ElementTree as ET

from docling_ray.doctree import DocTree, TableCell, TableData

A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _para_text(p: ET.Element) -> str:
    """python-pptx paragraph text: runs + fields, line breaks as spaces."""
    parts = []
    for child in p:
        tag = child.tag
        if tag == f"{A}r" or tag == f"{A}fld":
            t = child.find(f"{A}t")
            parts.append(t.text or "" if t is not None else "")
        elif tag == f"{A}br":
            parts.append(" ")
    return "".join(parts)


def _shape_text(sp: ET.Element) -> str:
    tx = sp.find(f".//{P}txBody") or sp.find(f".//{A}txBody")
    if tx is None:
        return ""
    return "\n".join(_para_text(p) for p in tx.findall(f"{A}p"))


def _placeholder_type(sp: ET.Element) -> Optional[str]:
    ph = sp.find(f".//{P}nvSpPr/{P}nvPr/{P}ph")
    if ph is None:
        return None
    return ph.get("type", "body")


class PptxExtractor:
    def __init__(self):
        self.doc: Optional[DocTree] = None

    def extract(self, raw: bytes, name: str) -> DocTree:
        zf = zipfile.ZipFile(BytesIO(raw))
        doc = DocTree(name=name)
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
        rels = {}
        rel_root = ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
        for rel in rel_root.iter(f"{REL}Relationship"):
            rels[rel.get("Id")] = rel.get("Target", "")
        slide_paths = []
        for sld in pres.iter(f"{P}sldId"):
            target = rels.get(sld.get(RID), "")
            slide_paths.append("ppt/" + target.replace("../", ""))

        for slide_ind, path in enumerate(slide_paths):
            root = ET.fromstring(zf.read(path))
            parent_slide = doc.add_group(name=f"slide-{slide_ind}",
                                         label="chapter", parent=None)
            doc.pages[slide_ind + 1] = (0.0, 0.0)
            tree = root.find(f"{P}cSld/{P}spTree")
            if tree is not None:
                for shape in tree:
                    self._handle_shape(doc, shape, parent_slide)
            # notes slide
            notes_rels_path = ("ppt/slides/_rels/"
                               + path.rsplit("/", 1)[-1] + ".rels")
            if notes_rels_path in zf.namelist():
                nr = ET.fromstring(zf.read(notes_rels_path))
                for rel in nr.iter(f"{REL}Relationship"):
                    if rel.get("Type", "").endswith("notesSlide"):
                        notes_path = "ppt/" + rel.get("Target", "").replace("../", "")
                        if notes_path in zf.namelist():
                            notes_root = ET.fromstring(zf.read(notes_path))
                            texts = []
                            for sp in notes_root.iter(f"{P}sp"):
                                if _placeholder_type(sp) == "body":
                                    texts.append(_shape_text(sp))
                            notes_text = "\n".join(t for t in texts if t).strip()
                            if notes_text:
                                doc.add_text(label="text", parent=parent_slide,
                                             text=notes_text,
                                             content_layer="furniture")
        return doc

    def _handle_shape(self, doc: DocTree, shape: ET.Element, parent_slide):
        tag = shape.tag
        if tag == f"{P}grpSp":
            for sub in shape:
                self._handle_shape(doc, sub, parent_slide)
            return
        if tag == f"{P}graphicFrame":
            tbl = shape.find(f".//{A}tbl")
            if tbl is not None:
                self._handle_table(doc, tbl, parent_slide)
            return
        if tag == f"{P}pic":
            doc.add_picture(parent=parent_slide, caption=None)
            return
        if tag != f"{P}sp":
            return
        text = _shape_text(shape).strip()
        if not text:
            return
        self._handle_text(doc, shape, parent_slide)

    def _handle_text(self, doc: DocTree, shape: ET.Element, parent_slide):
        tx = shape.find(f".//{P}txBody")
        if tx is None:
            return
        placeholder = _placeholder_type(shape)
        is_title_ph = placeholder in ("ctrTitle", "title")
        list_group = None
        enum_value = 0
        for p in tx.findall(f"{A}p"):
            ppr = p.find(f"{A}pPr")
            bullet = p.find(f".//{A}buChar") is not None
            autonum = p.find(f".//{A}buAutoNum") is not None
            level = int(ppr.get("lvl", "0")) if ppr is not None else 0
            is_list = bullet or autonum or level > 0
            text = _para_text(p)
            if is_list:
                enumerated = autonum
                if list_group is None:
                    list_group = doc.add_list_group(name="list",
                                                    parent=parent_slide)
                    enum_value = 0
                marker = ""
                if enumerated:
                    enum_value += 1
                    marker = f"{enum_value}."
                doc.add_list_item(marker=marker, enumerated=enumerated,
                                  parent=list_group, text=text)
            else:
                if is_title_ph:
                    doc.add_text(label="title", parent=parent_slide, text=text)
                else:
                    # NB: the reference's subtitle branch is a no-op (bare
                    # expression, msword... mspowerpoint_backend.py:200-201),
                    # so subtitles fall through to paragraphs — preserved.
                    doc.add_text(label="paragraph", parent=parent_slide,
                                 text=text)

    def _handle_table(self, doc: DocTree, tbl: ET.Element, parent_slide):
        rows = tbl.findall(f"{A}tr")
        num_rows = len(rows)
        num_cols = max((len(r.findall(f"{A}tc")) for r in rows), default=0)
        cells = []
        for row_idx, row in enumerate(rows):
            for col_idx, tc in enumerate(row.findall(f"{A}tc")):
                row_span = int(tc.get("rowSpan", "1"))
                col_span = int(tc.get("gridSpan", "1"))
                text = "\n".join(_para_text(p) for p in tc.iter(f"{A}p")).strip()
                if text:
                    cells.append(TableCell(
                        text=text, row_span=row_span, col_span=col_span,
                        start_row=row_idx, end_row=row_idx + row_span,
                        start_col=col_idx, end_col=col_idx + col_span,
                        column_header=row_idx == 0, row_header=False))
        if cells:
            doc.add_table(parent=parent_slide,
                          data=TableData(num_rows=num_rows, num_cols=num_cols,
                                         table_cells=cells))


def extract_pptx(raw: bytes, name: str = "doc") -> DocTree:
    return PptxExtractor().extract(raw, name)

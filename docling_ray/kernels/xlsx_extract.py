"""XLSX/XLSM → DocTree extraction kernel.

Behavioral re-expression of the reference MS-Excel backend
(``/root/reference/docling/backend/msexcel_backend.py:73-552``) without
openpyxl: worksheets parsed from the OOXML package (shared strings, merged
ranges, per-cell number/date/bool typing via styles), one section group per
sheet (hidden sheets → invisible content layer), and the same
connected-region table discovery: each non-empty unvisited cell seeds a
table whose bottom/right bounds grow while cells are non-empty or merged.
"""

from __future__ import annotations

import re
import zipfile
from datetime import datetime, timedelta
from io import BytesIO
from typing import Optional
from xml.etree import ElementTree as ET

from docling_ray.doctree import DocTree, TableCell, TableData

S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")
_DATE_FMT_IDS = set(range(14, 23)) | set(range(45, 48))
_EPOCH = datetime(1899, 12, 30)


def _col_to_idx(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _parse_range(ref: str) -> tuple[int, int, int, int]:
    """A1:C3 → (min_row, min_col, max_row, max_col), 0-based inclusive."""
    parts = ref.split(":")
    cells = [_CELL_REF_RE.match(p).groups() for p in parts]
    rows = [int(r) - 1 for _, r in cells]
    cols = [_col_to_idx(c) for c, _ in cells]
    return min(rows), min(cols), max(rows), max(cols)


class _Sheet:
    def __init__(self, name: str, root: ET.Element, shared: list[str],
                 date_styles: set[int], hidden: bool):
        self.name = name
        self.hidden = hidden
        self.images: list[tuple[int, int, int, int]] = []
        self.cells: dict[tuple[int, int], object] = {}
        self.merged: list[tuple[int, int, int, int]] = []
        for mc in root.iter(f"{S}mergeCell"):
            self.merged.append(_parse_range(mc.get("ref")))
        for c in root.iter(f"{S}c"):
            ref = c.get("r")
            if not ref:
                continue
            m = _CELL_REF_RE.match(ref)
            row, col = int(m.group(2)) - 1, _col_to_idx(m.group(1))
            ctype = c.get("t", "n")
            style_idx = int(c.get("s", "0") or 0)
            value = self._cell_value(c, ctype, style_idx, shared, date_styles)
            if value is not None:
                self.cells[(row, col)] = value
        self.max_row = max((r for r, _ in self.cells), default=-1)
        self.max_col = max((c for _, c in self.cells), default=-1)
        for r0, c0, r1, c1 in self.merged:
            self.max_row = max(self.max_row, r1)
            self.max_col = max(self.max_col, c1)

    @staticmethod
    def _cell_value(c: ET.Element, ctype: str, style_idx: int,
                    shared: list[str], date_styles: set[int]):
        if ctype == "inlineStr":
            is_el = c.find(f"{S}is")
            return "".join(t.text or "" for t in is_el.iter(f"{S}t")) if is_el is not None else None
        v = c.find(f"{S}v")
        if v is None or v.text is None:
            return None
        text = v.text
        if ctype == "s":
            return shared[int(text)]
        if ctype == "str":
            return text
        if ctype == "b":
            return text == "1"
        # numeric
        try:
            num = float(text)
        except ValueError:
            return text
        if style_idx in date_styles:
            return _EPOCH + timedelta(days=num)
        if num == int(num) and "." not in text and "e" not in text.lower():
            return int(num)
        return num

    def value(self, row: int, col: int):
        return self.cells.get((row, col))

    def merged_at(self, row: int, col: int) -> Optional[tuple[int, int, int, int]]:
        for r0, c0, r1, c1 in self.merged:
            if r0 <= row <= r1 and c0 <= col <= c1:
                return (r0, c0, r1, c1)
        return None


def _load_sheets(raw: bytes) -> list[_Sheet]:
    zf = zipfile.ZipFile(BytesIO(raw))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        ss_root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in ss_root.findall(f"{S}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{S}t")))
    date_styles: set[int] = set()
    if "xl/styles.xml" in zf.namelist():
        styles_root = ET.fromstring(zf.read("xl/styles.xml"))
        custom_date_fmts: set[int] = set()
        for fmt in styles_root.iter(f"{S}numFmt"):
            code = fmt.get("formatCode", "")
            if re.search(r"[dy]|m{2,}|h", code.lower().replace("\\", "")):
                custom_date_fmts.add(int(fmt.get("numFmtId")))
        xfs = styles_root.find(f"{S}cellXfs")
        if xfs is not None:
            for i, xf in enumerate(xfs.findall(f"{S}xf")):
                fmt_id = int(xf.get("numFmtId", "0") or 0)
                if fmt_id in _DATE_FMT_IDS or fmt_id in custom_date_fmts:
                    date_styles.add(i)
    rels = {}
    if "xl/_rels/workbook.xml.rels" in zf.namelist():
        rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root.iter(f"{REL}Relationship"):
            rels[rel.get("Id")] = rel.get("Target", "")
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = []
    for sheet_el in wb.iter(f"{S}sheet"):
        name = sheet_el.get("name")
        hidden = sheet_el.get("state") in ("hidden", "veryHidden")
        target = rels.get(sheet_el.get(RID), "")
        if target.startswith("/"):
            path = target.lstrip("/")
        else:
            path = "xl/" + target
        root = ET.fromstring(zf.read(path))
        sheet = _Sheet(name, root, shared, date_styles, hidden)
        sheet.images = _sheet_images(zf, path, root)
        sheets.append(sheet)
    return sheets


XDR = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"


def _sheet_images(zf: zipfile.ZipFile, sheet_path: str,
                  root: ET.Element) -> list[tuple[int, int, int, int]]:
    """Anchored pictures of a worksheet: (from_col, from_row, to_col+1,
    to_row+1) per image, via the sheet's drawing part."""
    drawing_el = root.find(f"{S}drawing")
    if drawing_el is None:
        return []
    rid = drawing_el.get(RID)
    rels_path = ("xl/worksheets/_rels/"
                 + sheet_path.rsplit("/", 1)[-1] + ".rels")
    if rels_path not in zf.namelist():
        return []
    rel_root = ET.fromstring(zf.read(rels_path))
    target = None
    for rel in rel_root.iter(f"{REL}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target", "")
            break
    if not target:
        return []
    drawing_path = "xl/" + target.replace("../", "")
    if drawing_path not in zf.namelist():
        return []
    droot = ET.fromstring(zf.read(drawing_path))
    images = []
    for anchor in list(droot):
        if not any(_n.tag.endswith("}pic") for _n in anchor.iter()):
            continue
        def _cell(tagname):
            el = anchor.find(f"{XDR}{tagname}")
            if el is None:
                return (0, 0)
            col = el.find(f"{XDR}col")
            row = el.find(f"{XDR}row")
            return (int(col.text or 0) if col is not None else 0,
                    int(row.text or 0) if row is not None else 0)
        c0, r0 = _cell("from")
        c1, r1 = _cell("to")
        images.append((c0, r0, c1 + 1, r1 + 1))
    return images


def _find_table_bottom(sheet: _Sheet, start_row: int, start_col: int) -> int:
    max_row = start_row
    for ri in range(start_row + 1, sheet.max_row + 1):
        merged = sheet.merged_at(ri, start_col)
        if sheet.value(ri, start_col) is None and merged is None:
            break
        if merged is not None:
            max_row = max(max_row, merged[2])
        else:
            max_row = ri
    return max_row


def _find_table_right(sheet: _Sheet, start_row: int, start_col: int) -> int:
    max_col = start_col
    for cj in range(start_col + 1, sheet.max_col + 1):
        merged = sheet.merged_at(start_row, cj)
        if sheet.value(start_row, cj) is None and merged is None:
            break
        if merged is not None:
            max_col = max(max_col, merged[3])
        else:
            max_col = cj
    return max_col


def extract_xlsx(raw: bytes, name: str = "doc") -> DocTree:
    doc = DocTree(name=name)
    for page_no, sheet in enumerate(_load_sheets(raw), start=1):
        layer = "invisible" if sheet.hidden else "body"
        group = doc.add_group(parent=None, label="section",
                              name=f"sheet: {sheet.name}", content_layer=layer)
        doc.pages[page_no] = (0.0, 0.0)
        visited: set[tuple[int, int]] = set()
        for ri in range(sheet.max_row + 1):
            for rj in range(sheet.max_col + 1):
                if sheet.value(ri, rj) is None or (ri, rj) in visited:
                    continue
                max_row = _find_table_bottom(sheet, ri, rj)
                max_col = _find_table_right(sheet, ri, rj)
                cells = []
                table_visited: set[tuple[int, int]] = set()
                for r in range(ri, max_row + 1):
                    for c in range(rj, max_col + 1):
                        merged = sheet.merged_at(r, c)
                        row_span, col_span = 1, 1
                        if merged is not None:
                            row_span = merged[2] - merged[0] + 1
                            col_span = merged[3] - merged[1] + 1
                        if (r, c) not in table_visited:
                            cells.append(TableCell(
                                text=str(sheet.value(r, c)),
                                row_span=row_span, col_span=col_span,
                                start_row=r - ri, end_row=r - ri + row_span,
                                start_col=c - rj, end_col=c - rj + col_span,
                                column_header=(r - ri) == 0,
                                row_header=False))
                            for sr in range(r, r + row_span):
                                for sc in range(c, c + col_span):
                                    table_visited.add((sr, sc))
                visited.update(table_visited)
                table = doc.add_table(
                    data=TableData(num_rows=max_row + 1 - ri,
                                   num_cols=max_col + 1 - rj,
                                   table_cells=cells),
                    parent=group, content_layer=layer)
                table.prov = [(page_no, float(rj), float(ri),
                               float(max_col + 1), float(max_row + 1))]
        for c0, r0, c1, r1 in sheet.images:
            pic = doc.add_picture(parent=group, content_layer=layer)
            pic.prov = [(page_no, float(c0), float(r0), float(c1), float(r1))]
    return doc

"""USPTO patent → DocTree extraction kernel, all four DTD generations.

Behavioral re-expression of the reference USPTO backend
(``/root/reference/docling/backend/xml/uspto_backend.py:60-1905``):

- **ICE**: Patent Grant / Application Full Text v4.x XML — a SAX walk
  collecting title, abstract, headings (with level attributes), paragraphs,
  claims and table placeholders, with ISO-8879 greek entities and
  sup/sub styling mapped through HTML entities; CALS/OASIS ``<table>``
  markup is re-parsed separately into the placeholders.
- **pap-v1.5** application publications (``_AppV1Handler``) and
  **grant-v2.5** ``PATDOC`` grants (``_GrantV2Handler``).
- **APS** (1976–2001 text format): ``PATN`` key-value records with section
  codes (ABST/BSUM/DETD/CLMS/DRWD) and continuation lines.
"""

from __future__ import annotations

import html
import re
import xml.sax
from typing import Optional
from xml.etree import ElementTree as ET

from docling_ray.doctree import DocTree, TableCell, TableData, TextItem

_XML_DECLARATION = '<?xml version="1.0" encoding="UTF-8"?>'

ABSTRACT_HEADING = ("ABSTRACT", 2)
CLAIMS_HEADING = ("CLAIMS", 2)

_SUPERSCRIPT = str.maketrans({
    "1": "¹", "2": "²", "3": "³", "4": "⁴", "5": "⁵", "6": "⁶", "7": "⁷",
    "8": "⁸", "9": "⁹", "0": "⁰", "+": "⁺", "-": "⁻", "−": "⁻", "=": "⁼",
    "(": "⁽", ")": "⁾", "a": "ª", "o": "º", "i": "ⁱ", "n": "ⁿ",
})
_SUBSCRIPT = str.maketrans({
    "1": "₁", "2": "₂", "3": "₃", "4": "₄", "5": "₅", "6": "₆", "7": "₇",
    "8": "₈", "9": "₉", "0": "₀", "+": "₊", "-": "₋", "−": "₋", "=": "₌",
    "(": "₍", ")": "₎", "a": "ₐ", "e": "ₑ", "o": "ₒ", "x": "ₓ",
})
_ISO8879_GREEK = {
    "Agr": "Alpha", "Bgr": "Beta", "Ggr": "Gamma", "Dgr": "Delta",
    "Egr": "Epsilon", "Zgr": "Zeta", "EEgr": "Eta", "THgr": "Theta",
    "Igr": "Iota", "Kgr": "Kappa", "Lgr": "Lambda", "Mgr": "Mu",
    "Ngr": "Nu", "Xgr": "Xi", "Ogr": "Omicron", "Pgr": "Pi", "Rgr": "Rho",
    "Sgr": "Sigma", "Tgr": "Tau", "Ugr": "Upsilon", "PHgr": "Phi",
    "KHgr": "Chi", "PSgr": "Psi", "OHgr": "Omega",
    "agr": "alpha", "bgr": "beta", "ggr": "gamma", "dgr": "delta",
    "egr": "epsilon", "zgr": "zeta", "eegr": "eta", "thgr": "theta",
    "igr": "iota", "kgr": "kappa", "lgr": "lambda", "mgr": "mu",
    "ngr": "nu", "xgr": "xi", "ogr": "omicron", "pgr": "pi", "rgr": "rho",
    "sgr": "sigmaf", "tgr": "tau", "ugr": "upsilon", "phgr": "phi",
    "khgr": "chi", "psgr": "psi", "ohgr": "omega",
}


def _unescape_entity(name: str) -> Optional[str]:
    mapped = f"&{_ISO8879_GREEK.get(name, name)};"
    unescaped = html.unescape(mapped)
    return None if unescaped == mapped else unescaped


# -- ICE (v4.x XML) ---------------------------------------------------------

_TEXT_ELEMENTS = {"abstract", "invention-title", "claim-text", "p", "heading",
                  "description-of-drawings", "sup", "sub"}
_ALL_ELEMENTS = _TEXT_ELEMENTS | {"claims", "claim", "description", "table",
                                  "maths"}


class _IceHandler(xml.sax.handler.ContentHandler):
    DOC_ELEMENTS = ("us-patent-application", "us-patent-grant")

    def __init__(self):
        super().__init__()
        self.doc: Optional[DocTree] = None
        self.level = 1
        self.parents: dict[int, Optional[object]] = {1: None}
        self.stack: list[str] = []
        self.claim = ""
        self.claims: list[str] = []
        self.abstract = ""
        self.text = ""

    # -- sax events -------------------------------------------------------
    def startElement(self, tag, attributes):
        if tag in self.DOC_ELEMENTS:
            self.doc = DocTree(name="file")
            self.text = ""
        if tag in _ALL_ELEMENTS:
            if (tag == "claim-text" and self.stack and self.stack[-1] == tag
                    and self.text.strip()):
                self.claim += " " + self.text.strip()
                self.text = ""
            elif tag == "heading":
                level_attr = attributes.get("level", "")
                new_level = int(level_attr) if level_attr.isnumeric() else 1
                max_level = min(self.parents.keys())
                self.level = (new_level + 1
                              if (new_level + 1) in self.parents else max_level)
            self.stack.append(tag)

    def endElement(self, tag):
        if tag in self.DOC_ELEMENTS:
            self.stack = []
            self.claim = ""
            self.claims = []
            self.abstract = ""
        if tag in _ALL_ELEMENTS and self.stack:
            current = self.stack.pop()
            self._emit(current, self.text.strip())

    def characters(self, content):
        self._append_text(content)

    def skippedEntity(self, name):
        unescaped = _unescape_entity(name)
        if unescaped is not None:
            self._append_text(unescaped, entity=True)

    def _append_text(self, content: str, entity: bool = False) -> None:
        if not self.stack:
            return
        tag = self.stack[-1]
        if tag not in _TEXT_ELEMENTS:
            return
        if tag in ("sup", "sub"):
            if len(self.stack) < 2 or self.stack[-2] not in _TEXT_ELEMENTS:
                return
            table = _SUPERSCRIPT if tag == "sup" else _SUBSCRIPT
            self.text += content.translate(table)
        else:
            self.text += content

    # -- docling emission -------------------------------------------------
    def _emit(self, name: str, text: str) -> None:
        doc = self.doc
        if not name or doc is None:
            return
        if name == "invention-title":
            if text:
                self.parents[self.level + 1] = doc.add_title(
                    parent=self.parents[self.level], text=text)
                self.level += 1
            self.text = ""
        elif name == "abstract":
            if self.abstract:
                title, lvl = ABSTRACT_HEADING
                lvl = lvl if lvl in self.parents else 1
                heading = doc.add_heading(text=title, level=lvl,
                                          parent=self.parents[lvl])
                doc.add_text(label="paragraph", text=self.abstract,
                             parent=heading)
        elif name == "claim-text":
            text = re.sub(r"\s+", " ", text).strip()
            if text:
                self.claim += " " + text
            self.text = ""
        elif name == "claim" and self.claim:
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "claims" and self.claims:
            title, lvl = CLAIMS_HEADING
            lvl = lvl if lvl in self.parents else 1
            heading = doc.add_heading(text=title, level=lvl,
                                      parent=self.parents[lvl])
            for claim in self.claims:
                doc.add_text(label="paragraph", text=claim, parent=heading)
        elif name == "p" and text:
            text = re.sub(r"\s+", " ", text)
            if "abstract" in self.stack:
                self.abstract = (self.abstract + " " + text
                                 if self.abstract else text)
            else:
                doc.add_text(label="paragraph", text=text,
                             parent=self.parents[self.level])
            self.text = ""
        elif name == "heading" and text:
            self.parents[self.level + 1] = doc.add_heading(
                text=text, level=self.level, parent=self.parents[self.level])
            self.level += 1
            self.text = ""
        elif name == "table":
            doc.add_table(data=TableData(), parent=self.parents[self.level])


def _cals_table(raw_xml: str) -> Optional[TableData]:
    """OASIS/CALS exchange table → TableData (reference XmlTable semantics:
    unified column offsets across tgroups, namest/nameend spans replicated,
    empty rows dropped, rows padded to the widest group)."""
    try:
        root = ET.fromstring(raw_xml)
    except ET.ParseError:
        return None
    table = root if root.tag == "table" else root.find(".//table")
    if table is None:
        return None
    tgroups = table.findall(".//tgroup")
    colinfo: dict[int, dict] = {}
    for itg, tg in enumerate(tgroups):
        info = {"offset": [], "colwidth": [], "cell_range": [], "cell_offst": [0]}
        offset = 0
        for colspec in tg.findall(".//colspec"):
            width = re.sub("pt|mm", "", colspec.get("colwidth", "0"), flags=re.I)
            try:
                width = int(width)
            except ValueError:
                try:
                    width = float(width)
                except ValueError:
                    width = 0
            info["colwidth"].append(width)
            info["offset"].append(offset)
            offset += width
        info["offset"].append(offset)
        colinfo[itg] = info
    if not colinfo:
        return TableData()

    min_offsets: list = list(colinfo[0]["offset"])
    zero_width_offsets = []
    for info in colinfo.values():
        for i, width in enumerate(info["colwidth"]):
            if width == 0:
                zero_width_offsets.append(info["offset"][i])
        min_offsets = sorted(set(info["offset"] + min_offsets))
    min_offsets = sorted(min_offsets + list(set(zero_width_offsets)))
    min_widths = [min_offsets[i + 1] - min_offsets[i]
                  for i in range(len(min_offsets) - 1)]

    for info in colinfo.values():
        i = 1
        span = 1
        for mi in range(1, len(min_offsets)):
            if i >= len(info["offset"]):
                break
            if min_offsets[mi] == info["offset"][i]:
                if len(info["offset"]) == i + 1 and len(min_offsets) > mi + 1:
                    span += 1
                else:
                    info["cell_range"].append(span)
                    info["cell_offst"].append(info["cell_offst"][-1] + span)
                    span = 1
                    i += 1
            elif min_offsets[mi] < info["offset"][i]:
                span += 1
            else:
                return TableData()

    # the column count is the widest per-group colspec list (the unified
    # offsets above only drive span computation)
    ncols_max = max(len(info["colwidth"]) for info in colinfo.values())
    _ = min_widths
    cells: list[TableCell] = []
    row_global = 0
    for itg, tg in enumerate(tgroups):
        rng = colinfo[itg]
        for row in list(tg.iter("row")) + list(tg.iter("tr")):
            entries = list(row.iter("entry")) + list(row.iter("td"))
            is_header = any(anc.tag == "thead" for anc in _ancestors(tg, row))
            ncols = 0
            local: list[TableCell] = []
            row_empty = True
            wrong_cols = False
            for ientry, entry in enumerate(entries):
                text = "".join(entry.itertext()).strip()
                namest = entry.get("namest")
                nameend = entry.get("nameend")
                start = (int(namest) if namest and namest.isnumeric()
                         else ientry + 1)
                if nameend and nameend.isnumeric():
                    end, shift = int(nameend), 0
                else:
                    end, shift = ientry + 2, 1
                if end > len(rng["cell_offst"]):
                    wrong_cols = True
                    break
                span_range = [rng["cell_offst"][start - 1],
                              rng["cell_offst"][end - 1] - shift]
                if text:
                    row_empty = False
                for _ in range(span_range[0], span_range[1] + 1):
                    ncols += 1
                    local.append(TableCell(
                        text=text, column_header=is_header,
                        start_row=row_global, end_row=row_global + 1,
                        row_span=1, start_col=span_range[0],
                        end_col=span_range[1] + 1,
                        col_span=span_range[1] - span_range[0] + 1))
            if wrong_cols:
                local = []
                ncols = 0
            for pad in range(ncols, ncols_max):
                local.append(TableCell(
                    text="", column_header=is_header,
                    start_row=row_global, end_row=row_global + 1, row_span=1,
                    start_col=pad, end_col=pad + 1, col_span=1))
            if not row_empty:
                cells.extend(local)
                row_global += 1
    return TableData(num_rows=row_global, num_cols=ncols_max,
                     table_cells=cells)


def _ancestors(root: ET.Element, node: ET.Element):
    # ET has no parent links; build the chain by scanning (tables are small)
    chain = []
    path = {c: p for p in root.iter() for c in p}
    cur = node
    while cur in path:
        cur = path[cur]
        chain.append(cur)
    return chain


_TABLE_RE = re.compile(r"^(<table .*?</table>)", re.MULTILINE | re.DOTALL)


def _parse_ice(content: str) -> Optional[DocTree]:
    handler = _IceHandler()
    try:
        xml.sax.parseString(content.encode("utf-8"), handler)
    except xml.sax.SAXParseException:
        return None
    doc = handler.doc
    if doc is not None:
        parsed = []
        for chunk in _TABLE_RE.findall(content):
            data = _cals_table(_XML_DECLARATION + "\n"
                               + re.sub(r"&[a-zA-Z][a-zA-Z0-9]*;", " ", chunk))
            if data is not None:
                parsed.append(data)
        placeholders = [item for item, _ in doc.iterate()
                        if item.label == "table"]
        if len(parsed) == len(placeholders):
            for item, data in zip(placeholders, parsed):
                item.data = data
    return doc


# -- Grant v2.5 (PATDOC) ----------------------------------------------------

_V2_TEXT = {"PDAT", "PARA", "H"}
_V2_ALL = _V2_TEXT | {"SDOAB", "SDOCL", "B540", "CL", "CLM", "DRWDESC",
                      "SP", "SB", "ITALIC", "CWU", "table"}
_MATH_ITALIC = str.maketrans({
    c: chr(0x1D44E + (ord(c) - ord("a"))) for c in "abcdefghijklmnopqrstuvwxyz"
} | {
    c: chr(0x1D434 + (ord(c) - ord("A"))) for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    if c != "X"
} | {"X": chr(0x1D44B)})
# MATHEMATICAL ITALIC SMALL H is reserved (planck); docling's table maps h
# to U+1D459? keep the contiguous mapping except h → ℎ (U+210E)
_MATH_ITALIC[ord("h")] = "\u210e"


class _GrantV2Handler(xml.sax.handler.ContentHandler):
    DOC_ELEMENT = "PATDOC"

    def __init__(self):
        super().__init__()
        self.doc: Optional[DocTree] = None
        self.level = 1
        self.parents: dict[int, Optional[object]] = {1: None}
        self.stack: list[str] = []
        self.claim = ""
        self.claims: list[str] = []
        self.paragraph = ""
        self.abstract = ""
        self.text = ""

    def startElement(self, tag, attributes):
        if tag == self.DOC_ELEMENT:
            self.doc = DocTree(name="file")
            self.text = ""
        if tag in _V2_ALL:
            if tag == "H" and "SDOCL" not in self.stack:
                level_attr = attributes.get("LVL", "")
                new_level = int(level_attr) if level_attr.isnumeric() else 1
                max_level = min(self.parents.keys())
                self.level = (new_level + 1
                              if (new_level + 1) in self.parents else max_level)
            self.stack.append(tag)

    def endElement(self, tag):
        if tag == self.DOC_ELEMENT:
            self.claim = ""
            self.claims = []
            self.paragraph = ""
            self.abstract = ""
            self.text = ""
            self.stack = []
        if tag in _V2_ALL and self.stack:
            current = self.stack.pop()
            self._emit(current, self.text)

    def characters(self, content):
        self._append(content)

    def skippedEntity(self, name):
        unescaped = _unescape_entity(name)
        if unescaped is not None:
            self._append(unescaped)

    def _append(self, content):
        if not self.stack:
            return
        tag = self.stack[-1]
        if tag not in _V2_TEXT:
            if tag in ("SP", "SB"):
                if len(self.stack) >= 2 and self.stack[-2] in _V2_TEXT:
                    self.text += self._style(content, tag)
            return
        self.text += content

    @staticmethod
    def _style(text, tag):
        if tag == "SP":
            return html.unescape(text.translate(_SUPERSCRIPT))
        if tag == "SB":
            return html.unescape(text.translate(_SUBSCRIPT))
        if tag == "ITALIC":
            return text.translate(_MATH_ITALIC)
        return text

    def _emit(self, name, text):
        doc = self.doc
        if not name or doc is None:
            return
        if name == "PDAT" and text:
            if not self.stack:
                self.text = ""
                return
            wrapper = self.stack[-1]
            text = self._style(text, wrapper)
            if "B540" in self.stack and text.strip():
                self.parents[self.level + 1] = doc.add_title(
                    parent=self.parents[self.level], text=text.strip())
                self.level += 1
            elif "SDOAB" in self.stack:
                self.abstract += text
            elif "CLM" in self.stack:
                self.claim += text
            elif ("PARA" in self.stack and "CLM" not in self.stack
                    and "SDOAB" not in self.stack):
                self.paragraph += text
            elif ("H" in self.stack and "SDOCL" not in self.stack
                    and text.strip()):
                self.parents[self.level + 1] = doc.add_heading(
                    text=text.strip(), level=self.level,
                    parent=self.parents[self.level])
                self.level += 1
            self.text = ""
        elif name == "CLM" and self.claim.strip():
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "CL" and self.claims:
            title, lvl = CLAIMS_HEADING
            lvl = lvl if lvl in self.parents else 1
            heading = doc.add_heading(text=title, level=lvl,
                                      parent=self.parents[lvl])
            for claim in self.claims:
                doc.add_text(label="paragraph", text=claim, parent=heading)
        elif name == "SDOAB" and self.abstract.strip():
            title, lvl = ABSTRACT_HEADING
            lvl = lvl if lvl in self.parents else 1
            heading = doc.add_heading(text=title, level=lvl,
                                      parent=self.parents[lvl])
            doc.add_text(label="paragraph", text=self.abstract.strip(),
                         parent=heading)
        elif name == "PARA":
            paragraph = self.paragraph.strip()
            if paragraph and "CLM" not in self.stack:
                doc.add_text(label="paragraph", text=paragraph,
                             parent=self.parents[self.level])
            elif "CLM" in self.stack:
                self.claim += " "
            self.paragraph = ""
        elif name == "table":
            doc.add_table(data=TableData(), parent=self.parents[self.level])


# -- Application v1.x (pap) -------------------------------------------------

_V1_TEXT = {"title-of-invention", "claim-text", "paragraph", "heading",
            "superscript", "subscript"}
_V1_ALL = _V1_TEXT | {"brief-description-of-drawings", "subdoc-abstract",
                      "subdoc-claims", "claim", "number", "table", "math-cwu"}


class _AppV1Handler(xml.sax.handler.ContentHandler):
    DOC_ELEMENT = "patent-application-publication"

    def __init__(self):
        super().__init__()
        self.doc: Optional[DocTree] = None
        self.level = 1
        self.parents: dict[int, Optional[object]] = {1: None}
        self.stack: list[str] = []
        self.claim = ""
        self.claims: list[str] = []
        self.abstract = ""
        self.text = ""

    def startElement(self, tag, attributes):
        if tag == self.DOC_ELEMENT:
            self.doc = DocTree(name="file")
            self.text = ""
        if tag in _V1_ALL:
            if (tag == "claim-text" and self.stack and self.stack[-1] == tag
                    and self.text.strip()):
                self.claim += " " + self.text.strip("\n")
                self.text = ""
            elif tag == "heading":
                level_attr = attributes.get("lvl", "")
                new_level = int(level_attr) if level_attr.isnumeric() else 1
                max_level = min(self.parents.keys())
                self.level = (new_level + 1
                              if (new_level + 1) in self.parents else max_level)
            self.stack.append(tag)

    def endElement(self, tag):
        if tag == self.DOC_ELEMENT:
            self.claim = ""
            self.claims = []
            self.abstract = ""
            self.text = ""
            self.stack = []
        if tag in _V1_ALL and self.stack:
            current = self.stack.pop()
            self._emit(current, self.text)

    def characters(self, content):
        self._append(content)

    def skippedEntity(self, name):
        unescaped = _unescape_entity(name)
        if unescaped is not None:
            self._append(unescaped)

    def _append(self, content):
        if not self.stack:
            return
        tag = self.stack[-1]
        if tag not in _V1_TEXT:
            return
        if tag in ("superscript", "subscript"):
            if len(self.stack) < 2 or self.stack[-2] not in _V1_TEXT:
                return
            table = _SUPERSCRIPT if tag == "superscript" else _SUBSCRIPT
            self.text += html.unescape(html.unescape(content).translate(table))
        else:
            self.text += content

    def _emit(self, name, text):
        doc = self.doc
        if not name or doc is None:
            return
        if name == "title-of-invention":
            title = text.strip()
            if title:
                self.parents[self.level + 1] = doc.add_text(
                    parent=self.parents[self.level], label="title", text=title)
                self.level += 1
            self.text = ""
        elif name == "subdoc-abstract":
            abstract = self.abstract.strip()
            if abstract:
                title, lvl = ABSTRACT_HEADING
                lvl = lvl if lvl in self.parents else 1
                heading = doc.add_heading(text=title, level=lvl,
                                          parent=self.parents[lvl])
                doc.add_text(label="paragraph", text=self.abstract,
                             parent=heading)
                self.abstract = ""
            self.text = ""
        elif name == "claim-text":
            if text:
                self.claim += self.text.strip("\n")
            self.text = ""
        elif name == "claim":
            claim = self.claim.strip()
            if claim:
                self.claims.append(claim)
            self.claim = ""
        elif name == "subdoc-claims" and self.claims:
            title, lvl = CLAIMS_HEADING
            lvl = lvl if lvl in self.parents else 1
            heading = doc.add_heading(text=title, level=lvl,
                                      parent=self.parents[lvl])
            for claim in self.claims:
                doc.add_text(label="paragraph", text=claim, parent=heading)
        elif name in ("paragraph", "heading"):
            if text and "subdoc-abstract" in self.stack:
                self.abstract = (self.abstract + text) if self.abstract else text
            elif text.strip():
                collapsed = re.sub(r"\s+", " ", text).strip()
                if name == "heading":
                    self.parents[self.level + 1] = doc.add_heading(
                        text=collapsed, level=self.level,
                        parent=self.parents[self.level])
                    self.level += 1
                else:
                    doc.add_text(label="paragraph", text=collapsed,
                                 parent=self.parents[self.level])
            self.text = ""
        elif name == "table":
            doc.add_table(data=TableData(), parent=self.parents[self.level])


def _parse_sax(content: str, handler) -> Optional[DocTree]:
    try:
        xml.sax.parseString(content.encode("utf-8"), handler)
    except xml.sax.SAXParseException:
        return None
    doc = handler.doc
    if doc is not None:
        parsed = []
        for chunk in _TABLE_RE.findall(content):
            data = _cals_table(_XML_DECLARATION + "\n"
                               + re.sub(r"&[a-zA-Z][a-zA-Z0-9]*;", " ", chunk))
            if data is not None:
                parsed.append(data)
        placeholders = [item for item, _ in doc.iterate()
                        if item.label == "table"]
        if len(parsed) == len(placeholders):
            for item, data in zip(placeholders, parsed):
                item.data = data
    return doc


# -- APS (PATN text) --------------------------------------------------------

_APS_SECTIONS = {"ABST", "BSUM", "DETD", "CLMS", "DRWD"}
_APS_PARAGRAPHS = ("PAR", "PA1", "PA2", "PA3")


class _ApsParser:
    def __init__(self):
        self.doc = DocTree(name="file")
        self.level = 1
        self.parents: dict[int, Optional[object]] = {1: None}

    def _last_text_item(self) -> Optional[TextItem]:
        parent = self.parents[self.level]
        target = parent if parent is not None else None
        if target is None:
            return None
        texts = [c for c in target.children if isinstance(c, TextItem)]
        return texts[-1] if texts else None

    def store_section(self, section: str) -> None:
        if section == "ABST":
            title, lvl = ABSTRACT_HEADING
        elif section == "CLMS":
            title, lvl = CLAIMS_HEADING
        else:
            return
        self.level = lvl if lvl in self.parents else 1
        self.parents[self.level + 1] = self.doc.add_heading(
            text=title, level=self.level, parent=self.parents[self.level])
        self.level += 1

    def store_content(self, section: str, field: str, value: str) -> None:
        doc = self.doc
        if field == "TTL":
            self.parents[self.level + 1] = doc.add_title(
                parent=self.parents[self.level], text=value)
            self.level += 1
        elif field == "PAL" and section == "ABST":
            last = self._last_text_item()
            if last is not None:
                last.text += " " + value
            else:
                doc.add_text(label="paragraph", text=value,
                             parent=self.parents[self.level])
        elif field == "NUM" and section == "CLMS":
            doc.add_text(label="paragraph", text="",
                         parent=self.parents[self.level])
        elif field in _APS_PARAGRAPHS and section == "CLMS":
            last = self._last_text_item()
            if last is None:
                last = doc.add_text(label="paragraph", text="",
                                    parent=self.parents[self.level])
            last.text += f" {value.strip()}" if last.text else value.strip()
        elif field == "PAC" and section in ("BSUM", "DETD", "DRWD"):
            lvl = ABSTRACT_HEADING[1]
            self.level = lvl if lvl in self.parents else 1
            self.parents[self.level + 1] = self.doc.add_heading(
                text=value, level=self.level, parent=self.parents[self.level])
            self.level += 1
        elif field in _APS_PARAGRAPHS and section in ("BSUM", "DETD", "DRWD"):
            doc.add_text(label="paragraph", text=value,
                         parent=self.parents[self.level])

    def parse(self, content: str) -> DocTree:
        section = ""
        key = ""
        value = ""
        for line in content.splitlines():
            cols = re.split(r"\s{2,}", line, maxsplit=1)
            if key and value and (len(cols) == 1 or (len(cols) == 2 and cols[0])):
                self.store_content(section, key, value)
                key = ""
                value = ""
            if len(cols) == 1:
                section = cols[0]
                self.store_section(section)
            elif len(cols) == 2:
                if cols[0]:
                    key = cols[0]
                    value = cols[1]
                elif not re.match(r"^##STR\d+##$", cols[1]):
                    value += " " + cols[1]
        if key and value:
            self.store_content(section, key, value)
        return self.doc


# -- entry point ------------------------------------------------------------

def extract_uspto(raw: bytes, name: str = "doc") -> DocTree:
    content = raw.decode("utf-8")
    first_lines = content.lstrip().splitlines()
    doctype = ""
    for line in content.splitlines():
        if line.startswith("<!DOCTYPE") or line == "PATN":
            doctype = line
            break
    lowered = doctype.lower()
    doc: Optional[DocTree] = None
    if doctype == "PATN" or (first_lines and first_lines[0] == "PATN"):
        doc = _ApsParser().parse(content)
    elif ("us-patent-application-v4" in lowered
            or "us-patent-grant-v4" in lowered):
        doc = _parse_ice(content)
    elif "us-grant-025" in lowered:
        doc = _parse_sax(content, _GrantV2Handler())
    elif ("patent-application-publication" in lowered and "pap-v1" in lowered):
        doc = _parse_sax(content, _AppV1Handler())
    else:
        raise NotImplementedError("unsupported USPTO generation")
    if doc is None:
        raise RuntimeError("failed to parse USPTO document")
    doc.name = name
    return doc

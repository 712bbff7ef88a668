"""DOCX → DocTree extraction kernel.

Behavioral re-expression of the reference MS-Word backend
(``/root/reference/docling/backend/msword_backend.py:40-1282``) without
python-docx: the OOXML package is read with ``zipfile`` + stdlib
ElementTree — styles with basedOn chains, numbering definitions, run
formatting grouping, hyperlink relationships, indent-nested lists with
per-(numId, ilvl) counters, numbered-heading synthesis, merged-cell tables
and textbox/sdt containers, plus OMML equation → LaTeX conversion
(:mod:`docling_ray.kernels.omml`).
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from typing import Optional
from xml.etree import ElementTree as ET

from docling_ray.doctree import (
    DocTree,
    Formatting,
    GroupItem,
    Hyperlink,
    TableCell,
    TableData,
)
from docling_ray.kernels.omml import M as OMML_NS, omml_to_latex

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
V = "{urn:schemas-microsoft-com:vml}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_NUMBERED_FORMATS = {"decimal", "lowerRoman", "upperRoman", "lowerLetter",
                     "upperLetter", "decimalZero"}


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


class _Package:
    """Just-enough python-docx: styles, numbering, rels, body."""

    def __init__(self, raw: bytes):
        zf = zipfile.ZipFile(BytesIO(raw))
        self.document = ET.fromstring(zf.read("word/document.xml"))
        self.body = self.document.find(f"{W}body")
        self.styles: dict[str, dict] = {}
        self.default_style_id: Optional[str] = None
        try:
            styles_root = ET.fromstring(zf.read("word/styles.xml"))
            for style in styles_root.iter(f"{W}style"):
                style_id = style.get(f"{W}styleId")
                name_el = style.find(f"{W}name")
                based_el = style.find(f"{W}basedOn")
                numpr = style.find(f".//{W}numPr")
                info = {
                    "id": style_id,
                    "name": name_el.get(f"{W}val") if name_el is not None else style_id,
                    "based_on": based_el.get(f"{W}val") if based_el is not None else None,
                    "has_numpr": numpr is not None,
                }
                self.styles[style_id] = info
                if (style.get(f"{W}default") in ("1", "true")
                        and style.get(f"{W}type") == "paragraph"):
                    self.default_style_id = style_id
        except KeyError:
            pass
        self.numbering_fmt: dict[tuple[int, int], str] = {}
        try:
            num_root = ET.fromstring(zf.read("word/numbering.xml"))
            abstract_fmts: dict[str, dict[int, str]] = {}
            for abstract in num_root.iter(f"{W}abstractNum"):
                aid = abstract.get(f"{W}abstractNumId")
                fmts: dict[int, str] = {}
                for lvl in abstract.iter(f"{W}lvl"):
                    ilvl = int(lvl.get(f"{W}ilvl", "0"))
                    fmt_el = lvl.find(f"{W}numFmt")
                    if fmt_el is not None:
                        fmts[ilvl] = fmt_el.get(f"{W}val", "")
                abstract_fmts[aid] = fmts
            for num in num_root.iter(f"{W}num"):
                num_id = int(num.get(f"{W}numId", "0"))
                abs_el = num.find(f"{W}abstractNumId")
                if abs_el is None:
                    continue
                for ilvl, fmt in abstract_fmts.get(abs_el.get(f"{W}val"), {}).items():
                    self.numbering_fmt[(num_id, ilvl)] = fmt
        except KeyError:
            pass
        self.rels: dict[str, str] = {}
        try:
            rels_root = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
            for rel in rels_root.iter(f"{REL}Relationship"):
                self.rels[rel.get("Id")] = rel.get("Target", "")
        except KeyError:
            pass

    # -- style resolution -------------------------------------------------
    def style_of(self, p: ET.Element) -> Optional[dict]:
        ppr = p.find(f"{W}pPr")
        style_id = None
        if ppr is not None:
            pstyle = ppr.find(f"{W}pStyle")
            if pstyle is not None:
                style_id = pstyle.get(f"{W}val")
        if style_id is None:
            style_id = self.default_style_id
        return self.styles.get(style_id) if style_id else None

    def is_numbered(self, num_id: int, ilvl: int) -> bool:
        return self.numbering_fmt.get((num_id, ilvl), "") in _NUMBERED_FORMATS


def _run_text(run: ET.Element) -> str:
    # python-docx Run.text: direct t/tab/br/cr children only (content nested
    # in drawings/textboxes inside the run is NOT part of the run text)
    parts = []
    for node in run:
        tag = _local(node.tag)
        if tag == "t":
            parts.append(node.text or "")
        elif tag == "tab":
            parts.append("\t")
        elif tag in ("br", "cr"):
            parts.append("\n")
    return "".join(parts)


def _tri_state(rpr: Optional[ET.Element], tag: str) -> Optional[bool]:
    if rpr is None:
        return None
    el = rpr.find(f"{W}{tag}")
    if el is None:
        return None
    val = el.get(f"{W}val")
    if val in ("false", "0", "none"):
        return False
    return True


def _run_format(run: ET.Element) -> Formatting:
    rpr = run.find(f"{W}rPr")
    return Formatting(
        bold=bool(_tri_state(rpr, "b")),
        italic=bool(_tri_state(rpr, "i")),
        underline=bool(_tri_state(rpr, "u")),
    )


def _equations_in_text(element: ET.Element, text: str) -> tuple[str, list[str]]:
    """Splice ``<eq>latex</eq>`` bookends into the paragraph text at the
    positions of its ``m:oMath`` elements (reference semantics:
    msword_backend.py:738-786)."""
    only_texts: list[str] = []
    only_equations: list[str] = []
    interleaved: list[str] = []
    for sub in element.iter():
        if sub.tag == f"{W}t":
            if isinstance(sub.text, str):
                only_texts.append(sub.text)
                interleaved.append(sub.text)
        elif sub.tag == f"{OMML_NS}oMath":
            latex = omml_to_latex(sub).strip()
            if latex:
                bookended = f"<eq>{latex}</eq>"
                only_equations.append(bookended)
                interleaved.append(bookended)
    if not only_equations:
        return text, []
    if (re.sub(r"\s+", "", "".join(only_texts)).strip()
            != re.sub(r"\s+", "", text).strip()):
        return text, []
    output = text[:]
    init_i = 0
    for i, substr in enumerate(interleaved):
        if not substr:
            continue
        if substr in output[init_i:]:
            init_i += output[init_i:].find(substr) + len(substr)
        else:
            if i > 0:
                output = output[:init_i] + substr + output[init_i:]
                init_i += len(substr)
            else:
                output = substr + output
    return output, only_equations


def _paragraph_text(p: ET.Element) -> str:
    parts = []
    for child in p:
        tag = _local(child.tag)
        if tag == "r":
            parts.append(_run_text(child))
        elif tag == "hyperlink":
            for run in child.findall(f"{W}r"):
                parts.append(_run_text(run))
    return "".join(parts)


class DocxExtractor:
    def __init__(self):
        self.max_levels = 10
        self.parents: dict[int, Optional[object]] = {i: None for i in range(-1, 10)}
        self.level = 0
        self.level_at_new_list: Optional[int] = None
        self.list_counters: dict[tuple[int, int], int] = {}
        self.numbered_headers: dict[int, int] = {}
        self.history = {"names": [None], "levels": [None], "numids": [None],
                        "indents": [None]}
        self.processed_textboxes: set[int] = set()

    # -- history ----------------------------------------------------------
    def _update_history(self, name, level, numid, ilevel):
        self.history["names"].append(name)
        self.history["levels"].append(level)
        self.history["numids"].append(numid)
        self.history["indents"].append(ilevel)

    def _prev_numid(self):
        return self.history["numids"][-1]

    def _prev_indent(self):
        return self.history["indents"][-1]

    def _get_level(self) -> int:
        for k, v in self.parents.items():
            if k >= 0 and v is None:
                return k
        return 0

    # -- style labels -----------------------------------------------------
    @staticmethod
    def _split_text_and_number(s: str) -> list[str]:
        match = re.match(r"(\D+)(\d+)$|^(\d+)(\D+)", s)
        if match:
            return list(filter(None, match.groups()))
        return [s]

    def _heading_and_level(self, style_label: str) -> tuple[str, Optional[int]]:
        parts = self._split_text_and_number(style_label)
        if len(parts) == 2:
            parts.sort()
            if parts[0].strip().lower() == "heading":
                return "Heading", _to_int(parts[1])
            if parts[1].strip().lower() == "heading":
                return "Heading", _to_int(parts[0])
            return "", 0
        return style_label, None

    def _label_and_level(self, pkg: _Package, p: ET.Element) -> tuple[str, Optional[int]]:
        style = pkg.style_of(p)
        if style is None:
            return "Normal", None
        label = style["id"]
        name = style["name"] or ""
        base = pkg.styles.get(style["based_on"]) if style["based_on"] else None
        if label is None:
            return "Normal", None
        if ":" in label:
            parts = label.split(":")
            if len(parts) == 2:
                return parts[0], _to_int(parts[1])
        if "heading" in label.lower():
            return self._heading_and_level(label)
        if "heading" in name.lower():
            return self._heading_and_level(name)
        if base and base["id"] and "heading" in base["id"].lower():
            return self._heading_and_level(base["id"])
        if base and base["name"] and "heading" in base["name"].lower():
            return self._heading_and_level(base["name"])
        return label, None

    # -- inline content ---------------------------------------------------
    def _paragraph_elements(self, pkg: _Package, p: ET.Element) -> list[tuple]:
        if _paragraph_text(p).strip() == "":
            return [("", None, None)]
        elements: list[tuple] = []
        group_text = ""
        previous_format = None
        fmt = None
        for child in p:
            tag = _local(child.tag)
            if tag == "hyperlink":
                runs = child.findall(f"{W}r")
                text = "".join(_run_text(r) for r in runs)
                rid = child.get(f"{R}id")
                anchor = child.get(f"{W}anchor")
                target = pkg.rels.get(rid, "") if rid else (f"#{anchor}" if anchor else "")
                if target:
                    # the reference wraps addresses in pathlib.Path, which
                    # collapses "//" — preserved for byte parity
                    from pathlib import PurePosixPath

                    target = str(PurePosixPath(target))
                    hyperlink = Hyperlink(target, is_url=False)
                else:
                    hyperlink = None
                fmt = _run_format(runs[0]) if runs else None
            elif tag == "r":
                text = _run_text(child)
                hyperlink = None
                fmt = _run_format(child)
            else:
                continue
            if (text.strip() and fmt != previous_format) or hyperlink is not None:
                if group_text.strip():
                    elements.append((group_text.strip(), previous_format, None))
                group_text = ""
                if hyperlink is not None:
                    elements.append((text.strip(), fmt, hyperlink))
                    text = ""
                else:
                    previous_format = fmt
            group_text += text
        if group_text.strip():
            elements.append((group_text.strip(), fmt, None))
        return elements

    # -- walk -------------------------------------------------------------
    def walk(self, pkg: _Package, body: ET.Element, doc: DocTree) -> None:
        for element in body:
            tag = _local(element.tag)
            blips = [n for n in element.iter() if _local(n.tag) == "blip"]

            if id(element) not in self.processed_textboxes:
                textbox_paras = []
                for node in element.iter():
                    if _local(node.tag) == "txbxContent":
                        textbox_paras.extend(
                            n for n in node.iter() if _local(n.tag) == "p")
                if textbox_paras:
                    self.processed_textboxes.add(id(element))
                    # dedupe alternate-content copies by paragraph text
                    seen_texts: set[str] = set()
                    unique_paras = []
                    for p in textbox_paras:
                        text_key = _paragraph_text(p)
                        if text_key in seen_texts:
                            continue
                        seen_texts.add(text_key)
                        unique_paras.append(p)
                    self._handle_textboxes(pkg, unique_paras, doc)

            if tag == "tbl":
                try:
                    self._handle_table(pkg, element, doc)
                except Exception:
                    pass
            elif blips:
                level = self._get_level()
                doc.add_picture(parent=self.parents[level - 1], caption=None)
                if tag == "p" and any(_local(n.tag) == "t" for n in element.iter()):
                    self._handle_text(pkg, element, doc)
            elif tag == "sdt":
                for node in element.iter():
                    if _local(node.tag) == "sdtContent":
                        for p in node.iter():
                            if _local(p.tag) == "p":
                                self._handle_text(pkg, p, doc)
                        break
            elif tag == "p":
                self._handle_text(pkg, element, doc)

    def _handle_textboxes(self, pkg: _Package, paras: list, doc: DocTree) -> None:
        level = self._get_level()
        group = doc.add_group(label="section", name="textbox",
                              parent=self.parents[level - 1])
        original = dict(self.parents)
        original_level = self.level
        self.parents[level] = group
        for p in paras:
            self.processed_textboxes.add(id(p))
            saved = self.parents[level]
            self._handle_text(pkg, p, doc, default_parent=group)
            self.parents[level] = saved
        self.parents.update(original)
        self.level = original_level

    def _handle_text(self, pkg: _Package, element: ET.Element, doc: DocTree,
                     default_parent=None) -> None:
        raw_text = _paragraph_text(element)
        text, equations = _equations_in_text(element, raw_text)
        text = text.strip()
        elements = self._paragraph_elements(pkg, element)
        p_style_id, p_level = self._label_and_level(pkg, element)
        numid, ilevel = self._num_id_and_ilvl(element)
        if numid == 0:
            numid = None

        if (numid is not None and ilevel is not None
                and p_style_id not in ("Title", "Heading")):
            is_numbered = pkg.is_numbered(numid, ilevel)
            self._add_list_item(doc, numid, ilevel, elements, is_numbered)
            self._update_history(p_style_id, p_level, numid, ilevel)
            return
        elif (numid is None and self._prev_numid() is not None
                and p_style_id not in ("Title", "Heading")):
            if self.level_at_new_list:
                for key in range(len(self.parents)):
                    if key >= self.level_at_new_list:
                        self.parents[key] = None
                self.level = self.level_at_new_list - 1
                self.level_at_new_list = None
            else:
                for key in range(len(self.parents)):
                    self.parents[key] = None
                self.level = 0

        if p_style_id == "Title":
            for key in range(len(self.parents)):
                self.parents[key] = None
            self.parents[0] = doc.add_text(parent=None, label="title", text=text)
        elif "Heading" in p_style_id:
            style = pkg.style_of(element)
            is_numbered_style = bool(style and style.get("has_numpr"))
            if not is_numbered_style:
                ppr = element.find(f"{W}pPr")
                is_numbered_style = (ppr is not None
                                     and ppr.find(f"{W}numPr") is not None)
            self._add_header(doc, p_level, text, is_numbered_style)
        elif equations:
            level = self._get_level()
            if not raw_text.strip() and text:
                # standalone equation
                doc.add_text(label="formula", parent=self.parents[level - 1],
                             text=text.replace("<eq>", "").replace("</eq>", ""))
            else:
                inline = doc.add_inline_group(parent=self.parents[level - 1])
                text_tmp = text
                for eq in equations:
                    if not text_tmp:
                        break
                    split = text_tmp.split(eq.strip(), maxsplit=1)
                    pre = split[0]
                    text_tmp = "" if len(split) == 1 else split[1]
                    if pre:
                        doc.add_text(label="paragraph", parent=inline, text=pre)
                    doc.add_text(label="formula", parent=inline,
                                 text=eq.replace("<eq>", "").replace("</eq>", ""))
                if text_tmp:
                    doc.add_text(label="paragraph", parent=inline,
                                 text=text_tmp.strip())
        else:
            level = self._get_level()
            parent = self.parents.get(level - 1) if default_parent is None else default_parent
            if len(elements) > 1:
                parent = doc.add_inline_group(parent=parent)
            for text_piece, fmt, hyperlink in elements:
                doc.add_text(label="paragraph", parent=parent, text=text_piece,
                             formatting=fmt, hyperlink=hyperlink)
        self._update_history(p_style_id, p_level, numid, ilevel)

    def _num_id_and_ilvl(self, p: ET.Element):
        for node in p.iter():
            if _local(node.tag) == "numPr":
                num_el = node.find(f"{W}numId")
                ilvl_el = node.find(f"{W}ilvl")
                return (_to_int(num_el.get(f"{W}val")) if num_el is not None else None,
                        _to_int(ilvl_el.get(f"{W}val")) if ilvl_el is not None else None)
        return None, None

    def _add_header(self, doc: DocTree, curr_level: Optional[int], text: str,
                    is_numbered_style: bool) -> None:
        level = self._get_level()
        if isinstance(curr_level, int):
            if curr_level > level:
                for i in range(level, curr_level):
                    self.parents[i] = doc.add_group(
                        parent=self.parents[i - 1], label="section",
                        name=f"header-{i}")
            elif curr_level < level:
                for key in range(len(self.parents)):
                    if key >= curr_level:
                        self.parents[key] = None
            current_level = curr_level
            parent_level = curr_level - 1
            add_level = curr_level
        else:
            current_level = self.level
            parent_level = self.level - 1
            add_level = 1
        if is_numbered_style:
            self.numbered_headers[add_level] = self.numbered_headers.get(add_level, 0) + 1
            text = f"{self.numbered_headers[add_level]} {text}"
            next_level = add_level + 1
            while next_level in self.numbered_headers:
                self.numbered_headers[next_level] = 0
                next_level += 1
            previous_level = add_level - 1
            while previous_level in self.numbered_headers:
                if self.numbered_headers[previous_level] == 0:
                    self.numbered_headers[previous_level] += 1
                text = f"{self.numbered_headers[previous_level]}.{text}"
                previous_level -= 1
        self.parents[current_level] = doc.add_heading(
            parent=self.parents[parent_level], text=text, level=add_level)

    def _get_list_counter(self, numid: int, ilvl: int) -> int:
        key = (numid, ilvl)
        self.list_counters[key] = self.list_counters.get(key, 0) + 1
        return self.list_counters[key]

    def _add_formatted_list_item(self, doc, elements, marker, enumerated, level):
        parent = self.parents.get(level)
        if not (isinstance(parent, GroupItem) and parent.group_label == "list"):
            return
        if not elements:
            return
        if len(elements) == 1:
            text, fmt, hyperlink = elements[0]
            if text:
                doc.add_list_item(marker=marker, enumerated=enumerated,
                                  parent=parent, text=text, formatting=fmt,
                                  hyperlink=hyperlink)
        else:
            item = doc.add_list_item(marker=marker, enumerated=enumerated,
                                     parent=parent, text="")
            inline = doc.add_inline_group(parent=item)
            for text, fmt, hyperlink in elements:
                if text:
                    doc.add_text(label="text", parent=inline, text=text,
                                 formatting=fmt, hyperlink=hyperlink)

    def _add_list_item(self, doc, numid, ilevel, elements, is_numbered):
        if not elements:
            return
        level = self._get_level()
        prev_indent = self._prev_indent()
        if self._prev_numid() is None:
            self.level_at_new_list = level
            for key in [k for k in self.list_counters if k[0] == numid]:
                self.list_counters[key] = 0
            self.parents[level] = doc.add_list_group(
                name="list", parent=self.parents[level - 1])
            marker = f"{self._get_list_counter(numid, ilevel)}." if is_numbered else ""
            self._add_formatted_list_item(doc, elements, marker, is_numbered, level)
        elif (self._prev_numid() == numid and self.level_at_new_list is not None
                and prev_indent is not None and prev_indent < ilevel):
            for i in range(self.level_at_new_list + prev_indent + 1,
                           self.level_at_new_list + ilevel + 1):
                self.parents[i] = doc.add_list_group(
                    name="list", parent=self.parents[i - 1])
            marker = f"{self._get_list_counter(numid, ilevel)}." if is_numbered else ""
            self._add_formatted_list_item(doc, elements, marker, is_numbered,
                                          self.level_at_new_list + ilevel)
        elif (self._prev_numid() == numid and self.level_at_new_list is not None
                and prev_indent is not None and ilevel < prev_indent):
            for k in self.parents:
                if k > self.level_at_new_list + ilevel:
                    self.parents[k] = None
            marker = f"{self._get_list_counter(numid, ilevel)}." if is_numbered else ""
            self._add_formatted_list_item(doc, elements, marker, is_numbered,
                                          self.level_at_new_list + ilevel)
        elif self._prev_numid() == numid or prev_indent == ilevel:
            marker = f"{self._get_list_counter(numid, ilevel)}." if is_numbered else ""
            self._add_formatted_list_item(doc, elements, marker, is_numbered,
                                          level - 1)

    # -- tables -----------------------------------------------------------
    def _handle_table(self, pkg: _Package, element: ET.Element, doc: DocTree):
        grid, tc_of = _layout_table(element)
        num_rows = len(grid)
        num_cols = max((len(r) for r in grid), default=0)
        if num_rows == 1 and num_cols == 1:
            # single-cell tables are treated as body content
            self.walk(pkg, tc_of[grid[0][0]], doc)
            return
        data = TableData(num_rows=num_rows, num_cols=num_cols, table_cells=[])
        seen: set[int] = set()
        for row_idx, row in enumerate(grid):
            col_idx = 0
            while col_idx < num_cols:
                cell_key = row[col_idx] if col_idx < len(row) else None
                if cell_key is None:
                    col_idx += 1
                    continue
                span = 1
                while (col_idx + span < len(row) and row[col_idx + span] == cell_key):
                    # same tc horizontally → gridSpan
                    if _vmerge_differs(grid, row_idx, col_idx, col_idx + span):
                        break
                    span += 1
                if cell_key in seen:
                    col_idx += span
                    continue
                seen.add(cell_key)
                spanned_idx = row_idx + 1
                while (spanned_idx < num_rows and col_idx < len(grid[spanned_idx])
                        and grid[spanned_idx][col_idx] == cell_key):
                    spanned_idx += 1
                tc = tc_of[cell_key]
                text = "\n".join(
                    _paragraph_text(p) for p in tc.findall(f"{W}p"))
                eq_text, eqs = _equations_in_text(tc, text)
                if eqs:
                    text = eq_text.replace("<eq>", "$").replace("</eq>", "$")
                data.table_cells.append(TableCell(
                    text=text, row_span=spanned_idx - row_idx, col_span=span,
                    start_row=row_idx, end_row=spanned_idx,
                    start_col=col_idx, end_col=col_idx + span,
                    column_header=row_idx == 0, row_header=False))
                col_idx += span
        level = self._get_level()
        doc.add_table(data=data, parent=self.parents[level - 1])


def _vmerge_differs(grid, row_idx, col_a, col_b) -> bool:
    return False


def _layout_table(tbl: ET.Element):
    """python-docx-style logical grid: each row is a list of tc-keys with
    gridSpan replication and vMerge continuation pointing at the master tc."""
    grid: list[list[int]] = []
    tc_of: dict[int, ET.Element] = {}
    prev_row_keys: list[Optional[int]] = []
    for tr in tbl.findall(f"{W}tr"):
        row_keys: list[Optional[int]] = []
        for tc in tr.findall(f"{W}tc"):
            tcpr = tc.find(f"{W}tcPr")
            span = 1
            vmerge_continue = False
            if tcpr is not None:
                gs = tcpr.find(f"{W}gridSpan")
                if gs is not None:
                    span = int(gs.get(f"{W}val", "1"))
                vm = tcpr.find(f"{W}vMerge")
                if vm is not None and vm.get(f"{W}val", "continue") == "continue":
                    vmerge_continue = True
            if vmerge_continue and len(prev_row_keys) > len(row_keys):
                key = prev_row_keys[len(row_keys)]
            else:
                key = id(tc)
                tc_of[key] = tc
            for _ in range(span):
                row_keys.append(key)
        grid.append(row_keys)  # type: ignore[arg-type]
        prev_row_keys = row_keys
    return grid, tc_of


def _to_int(s, default=0):
    if s is None:
        return None
    try:
        return int(s)
    except ValueError:
        return default


def extract_docx(raw: bytes, name: str = "doc") -> DocTree:
    pkg = _Package(raw)
    doc = DocTree(name=name)
    extractor = DocxExtractor()
    if pkg.body is not None:
        extractor.walk(pkg, pkg.body, doc)
    return doc

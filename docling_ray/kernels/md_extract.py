"""Markdown → DocTree extraction kernel.

Behavioral re-expression of the reference markdown backend
(``/root/reference/docling/backend/md_backend.py:66-586``): an AST walk with
lazy item creation (headings/list items materialize on their first RawText),
inline groups for multi-child paragraphs/headings, pipe-tables accumulated
from raw-text snippets, and — when HTML blocks are present — a full
export-to-HTML + HTML-backend re-parse round trip.
"""

from __future__ import annotations

import re
from typing import Optional

from docling_ray.doctree import DocTree, Formatting, TableCell, TableData, make_hyperlink
from docling_ray.kernels import md_parse as M

_MARKER_BODY = "DOCLING_DOC_MD_HTML_EXPORT"
_START_MARKER = f"#_#_{_MARKER_BODY}_START_#_#"
_STOP_MARKER = f"#_#_{_MARKER_BODY}_STOP_#_#"

_UNDERSCORE_RUN_RE = re.compile(r"_+")


def _shorten_underscores(text: str, max_length: int = 10) -> str:
    return _UNDERSCORE_RUN_RE.sub(
        lambda m: "_" * min(len(m.group(0)), max_length), text)


class _MdExtractor:
    def __init__(self):
        self.in_table = False
        self.md_table_buffer: list[str] = []
        self.html_blocks = 0

    def _close_table(self, doc: DocTree):
        if not self.in_table:
            return
        result_table = []
        for n, row_text in enumerate(self.md_table_buffer):
            if n == 0 or n > 1:  # row 1 is the separator
                result_table.append(
                    [t.strip() for t in row_text.split("|")[1:-1]])
        tcells = []
        for r, row in enumerate(result_table):
            for c, value in enumerate(row):
                tcells.append(TableCell(
                    text=value.strip(), start_row=r, end_row=r + 1,
                    start_col=c, end_col=c + 1, column_header=r == 0,
                    row_header=False))
        self.in_table = False
        self.md_table_buffer = []
        if tcells:
            doc.add_table(data=TableData(
                num_rows=len(result_table), num_cols=len(result_table[0]),
                table_cells=tcells))

    def _create_heading(self, doc, parent, text, level, formatting, hyperlink):
        if level == 1:
            return doc.add_title(text=text, parent=parent,
                                 formatting=formatting, hyperlink=hyperlink)
        return doc.add_heading(text=text, level=level - 1, parent=parent,
                               formatting=formatting, hyperlink=hyperlink)

    def walk(self, *, element, doc: DocTree, visited: set,
             creation_stack: list, list_ordered_by_id: dict,
             list_last_item_by_id: dict, parent_item=None,
             formatting: Optional[Formatting] = None,
             hyperlink=None) -> None:  # noqa: C901
        if id(element) in visited:
            return

        if isinstance(element, M.Heading) and element.children:
            self._close_table(doc)
            if len(element.children) > 1:
                parent_item = self._create_heading(
                    doc, parent_item, "", element.level, formatting, hyperlink)
            else:
                creation_stack.append(("heading", element.level))

        elif isinstance(element, M.MdList):
            has_items = any(isinstance(c, M.ListItem) and c.children
                            for c in element.children)
            self._close_table(doc)
            if has_items:
                parent_item = doc.add_list_group(name="list", parent=parent_item)
                list_ordered_by_id[id(parent_item)] = element.ordered

        elif (isinstance(element, M.ListItem) and element.children
                and isinstance((child := element.children[0]), M.Paragraph)
                and child.children):
            self._close_table(doc)
            enumerated = (list_ordered_by_id.get(id(parent_item), False)
                          if parent_item else False)
            non_list_children = [c for c in child.children
                                 if not isinstance(c, M.ListItem)]
            if len(non_list_children) > 1:
                parent_id = id(parent_item) if parent_item else None
                parent_item = doc.add_list_item(
                    text="", enumerated=enumerated, parent=parent_item,
                    formatting=formatting, hyperlink=hyperlink)
                if parent_id:
                    list_last_item_by_id[parent_id] = parent_item
            else:
                creation_stack.append(("list_item", enumerated))

        elif isinstance(element, M.Image):
            self._close_table(doc)
            fig_caption = None
            if element.title:
                fig_caption = doc.add_text(label="caption", text=element.title,
                                           formatting=formatting,
                                           hyperlink=hyperlink)
            doc.add_picture(parent=parent_item, caption=fig_caption)

        elif isinstance(element, M.Emphasis):
            formatting = Formatting(
                bold=formatting.bold if formatting else False,
                italic=True,
                underline=formatting.underline if formatting else False,
                strikethrough=formatting.strikethrough if formatting else False)

        elif isinstance(element, M.StrongEmphasis):
            formatting = Formatting(
                bold=True,
                italic=formatting.italic if formatting else False,
                underline=formatting.underline if formatting else False,
                strikethrough=formatting.strikethrough if formatting else False)

        elif isinstance(element, M.Link):
            hyperlink = make_hyperlink(element.dest)

        elif isinstance(element, (M.RawText, M.Literal)):
            snippet_text = (element.children.strip()
                            if isinstance(element.children, str) else "")
            if "|" in snippet_text or self.in_table:
                self.in_table = True
                if self.md_table_buffer:
                    self.md_table_buffer[-1] += snippet_text
                else:
                    self.md_table_buffer.append(snippet_text)
            elif snippet_text:
                self._close_table(doc)
                if creation_stack:
                    while creation_stack:
                        kind, arg = creation_stack.pop()
                        if kind == "list_item":
                            enumerated = (list_ordered_by_id.get(
                                id(parent_item), False) if parent_item else False)
                            parent_id = id(parent_item) if parent_item else None
                            parent_item = doc.add_list_item(
                                text=snippet_text, enumerated=enumerated,
                                parent=parent_item, formatting=formatting,
                                hyperlink=hyperlink)
                            if parent_id:
                                list_last_item_by_id[parent_id] = parent_item
                        else:  # heading
                            self._create_heading(
                                doc, parent_item, snippet_text, arg,
                                formatting, hyperlink)
                else:
                    doc.add_text(label="text", parent=parent_item,
                                 text=snippet_text, formatting=formatting,
                                 hyperlink=hyperlink)

        elif isinstance(element, M.CodeSpan):
            self._close_table(doc)
            doc.add_code(parent=parent_item, text=str(element.children).strip(),
                         formatting=formatting, hyperlink=hyperlink)

        elif (isinstance(element, (M.CodeBlock, M.FencedCode))
                and element.children
                and isinstance((child := element.children[0]), M.RawText)
                and (snippet_text := child.children.strip())):
            self._close_table(doc)
            doc.add_code(parent=parent_item, text=snippet_text,
                         formatting=formatting, hyperlink=hyperlink)

        elif isinstance(element, M.LineBreak):
            if self.in_table:
                self.md_table_buffer.append("")

        elif isinstance(element, M.HTMLBlock):
            self.html_blocks += 1
            self._close_table(doc)
            if element.body.strip():
                doc.add_code(
                    parent=parent_item,
                    text=f"{_START_MARKER}{element.body.strip()}{_STOP_MARKER}",
                    formatting=formatting, hyperlink=hyperlink)
        else:
            if not isinstance(element, str):
                self._close_table(doc)

        if isinstance(element, (M.Paragraph, M.Heading)) and len(element.children) > 1:
            parent_item = doc.add_inline_group(parent=parent_item)

        processed = (M.CodeBlock, M.FencedCode, M.RawText, M.Literal,
                     M.CodeSpan, M.HTMLBlock)
        if hasattr(element, "children") and not isinstance(element, processed):
            for child in element.children:
                if (isinstance(element, M.ListItem)
                        and isinstance(child, M.MdList)
                        and parent_item
                        and list_last_item_by_id.get(id(parent_item))):
                    parent_item = list_last_item_by_id[id(parent_item)]
                self.walk(element=child, doc=doc, visited=visited,
                          creation_stack=creation_stack,
                          list_ordered_by_id=list_ordered_by_id,
                          list_last_item_by_id=list_last_item_by_id,
                          parent_item=parent_item, formatting=formatting,
                          hyperlink=hyperlink)


def extract_markdown(raw: bytes, name: str = "doc") -> DocTree:
    text = _shorten_underscores(raw.decode("utf-8"))
    ast = M.parse_markdown(text)
    extractor = _MdExtractor()
    doc = DocTree(name=name)
    extractor.walk(element=ast, doc=doc, visited=set(), creation_stack=[],
                   list_ordered_by_id={}, list_last_item_by_id={},
                   parent_item=None)
    extractor._close_table(doc)

    if extractor.html_blocks > 0:
        from docling_ray.kernels.html_export import to_html
        from docling_ray.kernels.html_extract import extract_html

        html_str = to_html(doc)
        for regex in (rf"<pre>\s*<code>\s*{_START_MARKER}",
                      rf"{_STOP_MARKER}\s*</code>\s*</pre>"):
            html_str, count = re.subn(regex, "", html_str)
            if count != extractor.html_blocks:
                raise RuntimeError("markdown html-block restore mismatch")
        doc = extract_html(html_str.encode("utf-8"), name=name)
    return doc

"""JATS (scientific article XML) → DocTree extraction kernel.

Behavioral re-expression of the reference JATS backend
(``/root/reference/docling/backend/xml/jats_backend.py:68-715``) on stdlib
``xml.etree.ElementTree``: metadata (title, authors, affiliations,
abstract), a linear walk of body/back matter (sections with heading levels,
lists, figures with label+caption, table-wraps parsed through the HTML
table kernel, element/mixed citations flattened to text, display
equations), with paragraph text accumulated across inline children.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

from docling_ray.doctree import DocTree
from docling_ray.kernels.html_extract import parse_table_data
from docling_ray.dom import parse_html

ACK_HEADER = "Acknowledgments"
ABSTRACT_HEADER = "Abstract"
REFERENCES_HEADER = "References"
ETAL_TEXT = "et al."

_SKIP_TEXT_TAGS = ("term", "disp-formula", "inline-formula")


def _get_text(node: ET.Element, sep: Optional[str] = None) -> str:
    text = (node.text or "").replace("\n", " ") if node.tag not in _SKIP_TEXT_TAGS and node.text else ""
    for child in list(node):
        if child.tag not in _SKIP_TEXT_TAGS:
            text += _get_text(child, sep)
        if sep:
            text = text.rstrip(sep) + sep
        text += (child.tail or "").replace("\n", " ") if child.tail else ""
    return text


class _JatsExtractor:
    def __init__(self, root: ET.Element):
        self.xml = root
        self.hlevel = 0
        self.root_item = None

    # -- metadata ---------------------------------------------------------
    def _parse_title(self) -> str:
        meta_names = ("article-meta", "collection-meta", "book-meta",
                      "book-part-meta")
        title_names = ("article-title", "subtitle", "title", "label")
        titles = []
        for name in meta_names:
            for meta in self.xml.iter(name):
                for title_group in meta.findall("title-group"):
                    titles.append(" ".join(
                        (elem.text or "").replace("\n", " ").strip()
                        for elem in list(title_group)
                        if elem.tag in title_names).strip())
        return " - ".join(titles)

    def _find_metadata(self) -> Optional[ET.Element]:
        for name in ("article-meta", "book-part-meta"):
            found = next(self.xml.iter(name), None)
            if found is not None:
                return found
        return None

    def _parse_authors(self) -> list[dict]:
        authors: list[dict] = []
        meta = self._find_metadata()
        if meta is None:
            return authors
        aff_ids, aff_names = [], []
        for aff in meta.iter("aff"):
            if aff.get("id") is None:
                continue
            text = ", ".join(t for t in aff.itertext() if t.strip())
            text = text.replace("\n", " ")
            label = aff.findall("label")
            if label:
                text = text.removeprefix(f"{label[0].text}, ")
            aff_ids.append(aff.get("id"))
            aff_names.append(text)
        aff_map = dict(zip(aff_ids, aff_names))

        for group in meta.iter("contrib-group"):
            for contrib in group.findall("contrib"):
                if contrib.get("contrib-type") != "author":
                    continue
                author = {"name": "", "affiliation_names": []}
                for xref in contrib.findall("xref"):
                    if xref.get("ref-type") == "aff":
                        rid = xref.get("rid")
                        if rid in aff_map:
                            author["affiliation_names"].append(aff_map[rid])
                name = contrib.find("name")
                if name is not None:
                    given = name.find("given-names")
                    surname = name.find("surname")
                    author["name"] = (given.text or "") + " " + (surname.text or "")
                authors.append(author)
        return authors

    def _parse_abstract(self) -> list[dict]:
        out = []
        for abs_node in self.xml.iter("abstract"):
            texts = [(_get_text(p)).strip() for p in abs_node.findall("p")]
            label = ""
            for tag in ("title", "label"):
                node = abs_node.find(tag)
                if node is not None and node.text:
                    label = node.text.strip()
                    break
            out.append({"label": label, "content": " ".join(texts)})
        return out

    def _add_metadata(self, doc: DocTree) -> None:
        self.root_item = doc.add_text(label="title", text=self._parse_title())
        authors = self._parse_authors()
        authors_str = ", ".join(a["name"] for a in authors)
        affiliations = [aff for a in authors for aff in a["affiliation_names"]]
        affiliations_str = "; ".join(dict.fromkeys(affiliations))
        if authors_str:
            doc.add_text(parent=self.root_item, text=authors_str,
                         label="paragraph")
        if affiliations_str:
            doc.add_text(parent=self.root_item, text=affiliations_str,
                         label="paragraph")
        for abstract in self._parse_abstract():
            if not abstract["content"]:
                continue
            parent = doc.add_heading(
                parent=self.root_item, text=abstract["label"] or ABSTRACT_HEADER,
                level=self.hlevel + 1)
            doc.add_text(parent=parent, text=abstract["content"], label="text")

    # -- citations --------------------------------------------------------
    def _parse_element_citation(self, node: ET.Element) -> str:
        cit = {k: "" for k in ("author_names", "title", "source", "year",
                               "volume", "page", "pub_id", "publisher_name",
                               "publisher_loc")}
        names = []
        for name_node in node.iter("name"):
            surname = name_node.find("surname")
            given = name_node.find("given-names")
            names.append(((surname.text or "").replace("\n", " ").strip()
                          + " "
                          + (given.text or "").replace("\n", " ").strip()))
        etal = next(node.iter("etal"), None)
        if etal is not None:
            names.append(etal.text or ETAL_TEXT)
        cit["author_names"] = ", ".join(names)

        title_node = None
        for tag in ("article-title", "chapter-title", "data-title",
                    "issue-title", "part-title", "trans-title"):
            found = node.find(tag)
            if found is not None:
                title_node = found
                break
        cit["title"] = (_get_text(title_node) if title_node is not None
                        else (node.text or "").replace("\n", " ").strip())

        for tag in ("source", "year", "publisher-name", "publisher-loc",
                    "volume"):
            found = node.find(tag)
            if found is not None:
                cit[tag.replace("-", "_")] = (found.text or "").replace("\n", " ").strip()

        pub_ids = []
        for id_node in node.findall("pub-id"):
            id_type = id_node.get("assigning-authority") or id_node.get("pub-id-type")
            if id_type and id_node.text:
                pub_ids.append(id_type.replace("\n", " ").strip().upper()
                               + ": " + id_node.text.replace("\n", " ").strip())
        if pub_ids:
            cit["pub_id"] = ", ".join(pub_ids)

        eloc = node.find("elocation-id")
        fpage = node.find("fpage")
        if eloc is not None and eloc.text:
            cit["page"] = eloc.text.replace("\n", " ").strip()
        elif fpage is not None and fpage.text:
            cit["page"] = fpage.text.replace("\n", " ").strip()
            lpage = node.find("lpage")
            if lpage is not None and lpage.text:
                cit["page"] += "–" + lpage.text.replace("\n", " ").strip()  # noqa: RUF001

        text = ""
        if cit["author_names"]:
            text += cit["author_names"].rstrip(".") + ". "
        if cit["title"]:
            text += cit["title"] + ". "
        if cit["source"]:
            text += cit["source"] + ". "
        if cit["publisher_name"]:
            if cit["publisher_loc"]:
                text += f"{cit['publisher_loc']}: "
            text += cit["publisher_name"] + ". "
        if cit["volume"]:
            text = text.rstrip(". ")
            text += f" {cit['volume']}. "
        if cit["page"]:
            text = text.rstrip(". ")
            if cit["volume"]:
                text += ":"
            text += cit["page"] + ". "
        if cit["year"]:
            text = text.rstrip(". ")
            text += f" ({cit['year']})."
        if cit["pub_id"]:
            text = text.rstrip(".") + ". "
            text += cit["pub_id"]
        return text

    def _add_citation(self, doc: DocTree, parent, text: str) -> None:
        from docling_ray.doctree import GroupItem

        if isinstance(parent, GroupItem) and parent.group_label == "list":
            doc.add_list_item(text, enumerated=False, parent=parent)
        else:
            doc.add_text(label="text", text=text, parent=parent)

    # -- floats -----------------------------------------------------------
    def _caption_of(self, node: ET.Element) -> tuple[str, Optional[str]]:
        label_node = node.find("label")
        label = _get_text(label_node).strip() if label_node is not None else ""
        caption_node = node.find("caption")
        caption: Optional[str] = None
        if caption_node is not None:
            caption = ""
            for par in list(caption_node):
                if next(par.iter("supplementary-material"), None) is not None:
                    continue
                caption += _get_text(par).strip() + " "
            caption = caption.strip()
        return label, caption

    def _add_figure(self, doc: DocTree, parent, node: ET.Element) -> None:
        label, caption = self._caption_of(node)
        fig_text = f"{label}{' ' if label and caption else ''}{caption or ''}"
        fig_caption = (doc.add_text(label="caption", text=fig_text)
                       if fig_text else None)
        doc.add_picture(parent=parent, caption=fig_caption)

    def _add_table(self, doc: DocTree, parent, node: ET.Element) -> None:
        content_node = node.find("table")
        if content_node is None:
            content_node = node.find("alternatives/table")
        if content_node is None:
            return
        html = ET.tostring(content_node, encoding="unicode")
        table_tag = parse_html(html).find("table")
        if table_tag is None:
            return
        try:
            data = parse_table_data(table_tag)
        except Exception:
            return
        label, caption = self._caption_of(node)
        table_text = f"{label}{' ' if label and caption else ''}{caption or ''}"
        table_caption = (doc.add_text(label="caption", text=table_text)
                         if table_text else None)
        if data is not None:
            doc.add_table(data=data, parent=parent, caption=table_caption)

    def _add_equation(self, doc: DocTree, parent, node: ET.Element) -> None:
        parts = (node.text or "").split("$$")
        if len(parts) == 3:
            doc.add_text(label="formula", text=parts[1], parent=parent)

    # -- linear walk ------------------------------------------------------
    def _walk_linear(self, doc: DocTree, parent, node: ET.Element,
                     parent_tag: Optional[str] = None) -> str:
        flush_tags = ("ack", "sec", "list", "boxed-text", "disp-formula", "fig")
        new_parent = parent
        node_text = ((node.text or "").replace("\n", " ")
                     if node.tag != "term" and node.text else "")

        for child in list(node):
            stop_walk = False
            text: Optional[str] = None

            if node.tag == "p" and node_text.strip() and child.tag in flush_tags:
                doc.add_text(label="text", text=node_text.strip(), parent=parent)
                node_text = ""

            if child.tag in ("sec", "ack"):
                header = None
                for tag in ("title", "label"):
                    found = child.find(tag)
                    if found is not None:
                        header = found
                        break
                if header is not None:
                    text = _get_text(header)
                elif child.tag == "ack":
                    text = ACK_HEADER
                if text:
                    self.hlevel += 1
                    new_parent = doc.add_heading(text=text, parent=parent,
                                                 level=self.hlevel)
            elif child.tag == "list":
                new_parent = doc.add_list_group(name="list", parent=parent)
            elif child.tag == "list-item":
                text = _get_text(child).strip()
                new_parent = doc.add_list_item(text, parent=parent)
                stop_walk = True
            elif child.tag == "fig":
                self._add_figure(doc, parent, child)
                stop_walk = True
            elif child.tag == "table-wrap":
                self._add_table(doc, parent, child)
                stop_walk = True
            elif child.tag == "suplementary-material":
                stop_walk = True
            elif child.tag == "fn-group":
                stop_walk = True
            elif child.tag == "ref-list" and node.tag != "ref-list":
                header = None
                for tag in ("title", "label"):
                    found = child.find(tag)
                    if found is not None:
                        header = found
                        break
                text = _get_text(header) if header is not None else REFERENCES_HEADER
                new_parent = doc.add_heading(text=text, parent=parent)
                new_parent = doc.add_list_group(name="list", parent=new_parent)
            elif child.tag == "element-citation":
                self._add_citation(doc, parent, self._parse_element_citation(child))
                stop_walk = True
            elif child.tag == "mixed-citation":
                self._add_citation(doc, parent, _get_text(child).strip())
                stop_walk = True
            elif child.tag == "tex-math":
                self._add_equation(doc, parent, child)
                stop_walk = True
            elif child.tag == "inline-formula":
                stop_walk = True

            if not stop_walk:
                new_text = self._walk_linear(doc, new_parent, child,
                                             parent_tag=node.tag)
                if not (parent_tag == "p" and node.tag in flush_tags):
                    node_text += new_text
                if child.tag in ("sec", "ack") and text:
                    self.hlevel -= 1

            node_text += (child.tail or "").replace("\n", " ") if child.tail else ""

        if node.tag == "p" and node_text.strip():
            doc.add_text(label="text", text=node_text.strip(), parent=parent)
            return ""
        return node_text

    def extract(self, name: str) -> DocTree:
        doc = DocTree(name=name)
        self.hlevel = 0
        self._add_metadata(doc)
        for section in ("body", "back"):
            node = next(self.xml.iter(section), None)
            if node is not None and self.root_item is not None:
                self._walk_linear(doc, self.root_item, node)
        return doc


def extract_jats(raw: bytes, name: str = "doc") -> DocTree:
    root = ET.fromstring(raw)
    return _JatsExtractor(root).extract(name)

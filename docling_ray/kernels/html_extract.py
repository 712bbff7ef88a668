"""HTML → DocTree extraction kernel.

A from-scratch reimplementation of the *behavior* of the reference HTML
backend (``/root/reference/docling/backend/html_backend.py:236-1101``) on top
of :mod:`docling_ray.dom` and :mod:`docling_ray.doctree`.  The goal is
byte-identical extracted text per url against the reference converter, so
every whitespace / buffering / annotation rule below mirrors the reference's
observable semantics (file:line cites inline).  The kernel is a pure CPU
function over one document's bytes — it runs inside stateless
``map_batches`` tasks (one call per row, vectorized over the Arrow batch by
the stage wrapper in ``docling_ray.stages.extract``).
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from dataclasses import dataclass, replace
from typing import Optional

from docling_ray.dom import NavStr, Preformatted, Tag, parse_html
from docling_ray.doctree import (
    BODY,
    FURNITURE,
    SUB,
    SUPER,
    DocTree,
    Formatting,
    Hyperlink,
    TableCell,
    TableData,
    make_hyperlink,
)

# Tags that open a distinct block-level item (html_backend.py:38-55).
BLOCK_TAGS = frozenset(
    {
        "address", "details", "figure", "footer",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ol", "p", "pre", "summary", "table", "ul",
    }
)

CODE_TAGS = frozenset({"code", "kbd", "samp"})

# Formatting contributions per tag (html_backend.py:59-74).  Code tags map to
# no formatting fields — they only flip the run's ``code`` flag.
FORMAT_TAG_FIELDS: dict[str, dict] = {
    "b": {"bold": True},
    "strong": {"bold": True},
    "i": {"italic": True},
    "em": {"italic": True},
    "var": {"italic": True},
    "s": {"strikethrough": True},
    "del": {"strikethrough": True},
    "u": {"underline": True},
    "ins": {"underline": True},
    "sub": {"script": SUB},
    "sup": {"script": SUPER},
    "code": {},
    "kbd": {},
    "samp": {},
}

_HEADING_TAGS = ["h1", "h2", "h3", "h4", "h5", "h6"]
_WS_RUN_RE = re.compile(r"\s+|\n+")

# Unicode sanitation table (html_backend.py:947-967).
_UNICODE_REPLACEMENTS = (
    (" ", " "), ("​", ""), ("‌", ""), ("‍", ""),
    ("‐", "-"), ("‑", "-"), ("‒", "-"), ("–", "-"),
    ("—", "-"), ("―", "-"), ("‘", "'"), ("’", "'"),
    ("“", '"'), ("”", '"'), ("…", "..."), ("­", ""),
    ("﻿", ""), (" ", " "), ("⁠", ""),
)


def clean_unicode(text: str) -> str:
    if text.isascii():  # every replacement source is non-ascii
        return text
    for raw, repl in _UNICODE_REPLACEMENTS:
        text = text.replace(raw, repl)
    return text


@dataclass
class Run:
    """One annotated inline text run."""

    text: str
    hyperlink: Optional[Hyperlink] = None
    formatting: Optional[Formatting] = None
    code: bool = False


def merge_runs_to_one(runs: list[Run]) -> Run:
    """Collapse runs into a single run: strip each piece and join with single
    spaces; first non-null formatting/hyperlink wins; code flag is sticky
    (semantics of html_backend.py:90-120)."""
    hyperlink = None
    formatting = None
    code = False
    text = ""
    for run in runs:
        text += run.text.strip() + " "
        if run.formatting is not None and formatting is None:
            formatting = run.formatting
        if run.hyperlink is not None and hyperlink is None:
            hyperlink = run.hyperlink
        code = run.code if run.code else code
    return Run(text=text.strip(), hyperlink=hyperlink, formatting=formatting, code=code)


def simplify_runs(runs: list[Run]) -> list[Run]:
    """Merge neighbours with identical annotation, joining with a single
    space unless either side is blank (html_backend.py:122-159)."""
    if not runs:
        return runs
    out: list[Run] = []
    text = runs[0].text
    hyperlink = runs[0].hyperlink
    formatting = runs[0].formatting
    code = runs[0].code
    last_piece = text
    for run in runs[1:]:
        if run.hyperlink == hyperlink and run.formatting == formatting and run.code == code:
            sep = "" if (not run.text.strip() or not last_piece.strip()) else " "
            text += sep + run.text
            last_piece = run.text
        else:
            out.append(Run(text, hyperlink, formatting, code))
            text = run.text
            last_piece = text
            hyperlink = run.hyperlink
            formatting = run.formatting
            code = run.code
    if text:
        out.append(Run(text, hyperlink, formatting, code))
    return out


def split_runs_by_newline(runs: list[Run]) -> list[list[Run]]:
    """Break a run list into groups at embedded newlines
    (html_backend.py:161-177): every newline closes the active group."""
    groups: list[list[Run]] = []
    active: list[Run] = []
    for run in runs:
        pieces = run.text.split("\n")
        if len(pieces) == 1:
            active.append(run)
        else:
            for piece in pieces:
                active.append(replace(run, text=piece))
                groups.append(active)
                active = []
    if active:
        groups.append(active)
    return groups


class HtmlExtractor:
    """Walks a parsed DOM and builds the :class:`DocTree`.

    State mirrors the reference backend object: a ten-slot parent stack,
    current hierarchy level, active content layer, active hyperlink and the
    stack of open formatting tags (html_backend.py:192-201).
    """

    MAX_LEVELS = 10

    def __init__(self, original_url: Optional[str] = None):
        self.original_url = original_url
        self._reset()

    def _reset(self):
        self.parents: dict[int, Optional[object]] = {i: None for i in range(self.MAX_LEVELS)}
        self.level = 0
        self.content_layer = BODY
        self.hyperlink: Optional[Hyperlink] = None
        self.format_tags: list[str] = []
        self.list_start_by_group: dict[int, int] = {}
        # parse-time observed <img> nodes (doc order); None → no observed
        # data, img lookups fall back to subtree scans
        self._observed_imgs: Optional[list] = None

    # -- entry point -----------------------------------------------------
    def extract(self, raw: bytes, name: str = "doc") -> DocTree:
        self._reset()
        soup = parse_html(raw)
        doc = DocTree(name=name)

        # <title> becomes a furniture title (html_backend.py:251-259).
        title = soup.title
        if title is not None:
            title_text = title.get_text(separator=" ", strip=True)
            doc.add_title(text=clean_unicode(title_text), orig=title_text,
                          content_layer=FURNITURE)

        # Preamble semantics (script/style/hidden removal, <br> rewrite,
        # first-heading probe): only the TOP-MOST removed subtree needs
        # decomposing, and <br>/heading inside a removed subtree never
        # count; <br>/heading only count inside <body> (or anywhere when
        # no body exists).  The parse already observed the handful of
        # interesting nodes (dom.Document.observed), so ancestry checks
        # on those replace a full O(N) tree scan; hand-built trees
        # (observed=None) take the scan path below.
        body = soup.body
        observed = getattr(soup, "observed", None)
        removed: list[Tag] = []
        brs: list[Tag] = []
        has_heading = False
        if observed is not None:
            self._observed_imgs = observed["imgs"]
            cand_ids = {id(n) for n in observed["removed"]}

            def _live(node: Tag) -> bool:
                anc = node.parent
                while anc is not None:
                    if id(anc) in cand_ids:
                        return False
                    anc = anc.parent
                return True

            def _in_content(node: Tag) -> bool:
                if body is None:
                    return True
                anc = node
                while anc is not None:
                    if anc is body:
                        return True
                    anc = anc.parent
                return False

            removed = [n for n in observed["removed"] if _live(n)]
            brs = [n for n in observed["brs"]
                   if _live(n) and _in_content(n)]
            has_heading = any(_live(n) and _in_content(n)
                              for n in observed["headings"])
        else:
            stack: list[tuple] = [(n, True, body is None or n is body)
                                  for n in soup.contents[::-1]]
            while stack:
                node, live, in_content = stack.pop()
                if not isinstance(node, Tag):
                    continue
                name = node.name
                if name in ("script", "style") or node.has_attr("hidden"):
                    if live:
                        removed.append(node)
                    live = False
                elif live and in_content:
                    if name == "br":
                        brs.append(node)
                    elif name in _HEADING_TAGS:
                        has_heading = True
                if node.contents:
                    child_in = in_content or node is body
                    stack.extend((c, live, child_in)
                                 for c in node.contents[::-1])
        for tag in removed:
            tag.decompose()
        for br in brs:
            br.replace_with(NavStr("\n"))

        content = body or soup
        # Text before the first heading is furniture (html_backend.py:272-275).
        self.content_layer = BODY if not has_heading else FURNITURE
        self._walk(content, doc)
        return doc

    # -- inline-state context managers ------------------------------------
    @property
    def _formatting(self) -> Optional[Formatting]:
        if not self.format_tags:       # the overwhelmingly common case
            return None
        fields: dict = {}
        for tag in self.format_tags:
            fields.update(FORMAT_TAG_FIELDS[tag])
        return Formatting(**fields) if fields else None

    @contextmanager
    def _use_format(self, tags: list[str]):
        if not tags:
            yield
            return
        self.format_tags.extend(tags)
        try:
            yield
        finally:
            del self.format_tags[-len(tags):]

    @contextmanager
    def _use_hyperlink(self, tag: Tag):
        href = tag.get("href")
        if href is None:
            yield
            return
        new_link = None
        old_link = None
        if isinstance(href, str) and href:
            old_link = self.hyperlink
            new_link = make_hyperlink(href, self.original_url)
            self.hyperlink = new_link
        try:
            yield
        finally:
            if new_link:
                self.hyperlink = old_link

    @contextmanager
    def _use_inline_group(self, runs: list[Run], doc: DocTree):
        # More than one run → wrap in an inline group (html_backend.py:503-531).
        if len(runs) > 1:
            group = doc.add_inline_group(parent=self.parents[self.level],
                                         content_layer=self.content_layer)
            self.parents[self.level + 1] = group
            self.level += 1
            try:
                yield
            finally:
                self.parents[self.level] = None
                self.level -= 1
        else:
            yield

    @contextmanager
    def _use_section_group(self, tag: Tag, doc: DocTree, furniture: bool):
        old_layer = self.content_layer
        if furniture:
            self.content_layer = FURNITURE
        self.parents[self.level + 1] = doc.add_group(
            label="section", name=tag.name, parent=self.parents[self.level],
            content_layer=self.content_layer)
        self.level += 1
        try:
            yield
        finally:
            self.parents[self.level + 1] = None
            self.level -= 1
            self.content_layer = old_layer

    # -- walking ----------------------------------------------------------
    def _walk(self, element: Tag, doc: DocTree) -> None:
        buffer: list[Run] = []

        def flush():
            if not buffer:
                return
            simplified = simplify_runs(buffer)
            groups = split_runs_by_newline(simplified)
            buffer.clear()
            if not "".join(run.text for run in simplified):
                return
            for group in groups:
                with self._use_inline_group(group, doc):
                    for run in group:
                        if run.text.strip():
                            self._emit_run(run, doc)

        for node in element.contents:
            if isinstance(node, Tag):
                name = node.name.lower()
                if name == "img":
                    flush()
                    self._emit_image(node, doc)
                elif name in FORMAT_TAG_FIELDS:
                    with self._use_format([name]):
                        self._walk(node, doc)
                elif name == "a":
                    with self._use_hyperlink(node):
                        self._walk(node, doc)
                elif name in BLOCK_TAGS:
                    flush()
                    self._handle_block(node, doc)
                elif node.has_descendant_named(BLOCK_TAGS):
                    flush()
                    self._walk(node, doc)
                else:
                    buffer.extend(self._runs_of(node, parent_annotation=True,
                                                keep_newlines=True))
            elif isinstance(node, NavStr) and not isinstance(node, Preformatted):
                if str(node).strip("\n\r") == "":
                    flush()
                else:
                    buffer.extend(self._runs_of(node, parent_annotation=True,
                                                keep_newlines=True))

        flush()

    def _emit_run(self, run: Run, doc: DocTree, collapse_ws: bool = False) -> None:
        text = run.text
        if collapse_ws:
            text = _WS_RUN_RE.sub(" ", text)
        text = clean_unicode(text.strip())
        if run.code:
            doc.add_code(parent=self.parents[self.level], text=text,
                         content_layer=self.content_layer,
                         formatting=run.formatting, hyperlink=run.hyperlink)
        else:
            doc.add_text(parent=self.parents[self.level], label="text", text=text,
                         content_layer=self.content_layer,
                         formatting=run.formatting, hyperlink=run.hyperlink)

    # -- inline extraction -------------------------------------------------
    def _runs_of(self, node, ignore_list: bool = False,
                 parent_annotation: bool = False,
                 keep_newlines: bool = False) -> list[Run]:
        """Recursive inline text + annotation accumulation
        (html_backend.py:388-466)."""
        if parent_annotation:
            # one combined ancestor walk: format names over the FULL chain
            # plus the NEAREST hyperlink ancestor (the fmt list is only
            # consumed when such an ancestor exists)
            names = None
            a_ancestor = None
            ancestor = node.parent
            while ancestor is not None:
                nm = ancestor.name
                if nm in FORMAT_TAG_FIELDS:
                    if names is None:
                        names = {nm}
                    else:
                        names.add(nm)
                elif a_ancestor is None and nm == "a" and ancestor.get("href"):
                    a_ancestor = ancestor
                ancestor = ancestor.parent
            if a_ancestor is not None:
                fmt_tags = ([] if names is None else
                            [fmt for fmt in FORMAT_TAG_FIELDS if fmt in names])
                with self._use_format(fmt_tags):
                    with self._use_hyperlink(a_ancestor):
                        # NB: keep_newlines intentionally NOT propagated —
                        # mirrors the reference's re-entry at :407-409.
                        return self._runs_of(node, ignore_list)

        if isinstance(node, Preformatted):
            return []
        if isinstance(node, NavStr):
            stripped = node.strip()
            ft = self.format_tags
            code = bool(ft) and not CODE_TAGS.isdisjoint(ft)
            if stripped:
                return [Run(stripped, self.hyperlink, self._formatting, code)]
            if keep_newlines and node.strip("\n\r") == "":
                return [Run("\n", self.hyperlink, self._formatting, code)]
            return []

        result: list[Run] = []
        if not ignore_list or node.name not in ("ul", "ol"):
            # hoisted per-call inline state: format_tags cannot change
            # across PLAIN children (only the fmt/a branches push context),
            # so the code flag and Formatting snapshot are loop-invariant
            ft = self.format_tags
            code = bool(ft) and not CODE_TAGS.isdisjoint(ft)
            hyperlink = self.hyperlink
            formatting = self._formatting
            for child in node.contents:
                if child.__class__ is NavStr:
                    # hot leaf inlined (the NavStr branch above, minus the
                    # per-leaf state recompute)
                    stripped = child.strip()
                    if stripped:
                        result.append(Run(stripped, hyperlink, formatting,
                                          code))
                    elif keep_newlines and child.strip("\n\r") == "":
                        result.append(Run("\n", hyperlink, formatting, code))
                    continue
                if isinstance(child, Tag):
                    cname = child.name
                    if cname in FORMAT_TAG_FIELDS:
                        with self._use_format([cname]):
                            result.extend(self._runs_of(
                                child, ignore_list,
                                keep_newlines=keep_newlines))
                        continue
                    if cname == "a":
                        with self._use_hyperlink(child):
                            result.extend(self._runs_of(
                                child, ignore_list,
                                keep_newlines=keep_newlines))
                        continue
                result.extend(self._runs_of(child, ignore_list,
                                            keep_newlines=keep_newlines))
        return result

    def _imgs_under(self, tag: Tag) -> list[Tag]:
        """Document-order ``<img>`` descendants of ``tag`` — equivalent to
        ``tag.find_all("img")``, but driven by the parse-time observed img
        list: ancestry walks on the (typically zero or few) imgs replace a
        full subtree DFS per block."""
        imgs = self._observed_imgs
        if imgs is None:
            return tag.find_all("img")
        if not imgs:
            return []
        out: list[Tag] = []
        for img in imgs:
            anc = img.parent
            while anc is not None:
                if anc is tag:
                    out.append(img)
                    break
                anc = anc.parent
        return out

    # -- block handlers ----------------------------------------------------
    def _handle_block(self, tag: Tag, doc: DocTree) -> None:
        name = tag.name.lower()

        if name == "figure":
            figure_imgs = self._imgs_under(tag)
            if figure_imgs:
                self._emit_image(figure_imgs[0], doc)

        elif name in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self._handle_heading(tag, doc)

        elif name in ("ul", "ol"):
            self._handle_list(tag, doc)

        elif name in ("p", "address", "summary"):
            runs = simplify_runs(self._runs_of(tag, parent_annotation=True))
            for group in split_runs_by_newline(runs):
                with self._use_inline_group(group, doc):
                    for run in group:
                        if run.text.strip():
                            self._emit_run(run, doc)
            for img in self._imgs_under(tag):
                self._emit_image(img, doc)

        elif name == "table":
            data = parse_table_data(tag)
            for _img in self._imgs_under(tag):
                # The reference passes the table tag itself here
                # (html_backend.py:817-819) — behavior preserved.
                self._emit_image(tag, doc)
            if data is not None:
                doc.add_table(data=data, parent=self.parents[self.level],
                              content_layer=self.content_layer)

        elif name == "pre":
            runs = simplify_runs(self._runs_of(tag, parent_annotation=True,
                                               keep_newlines=True))
            with self._use_inline_group(runs, doc):
                for run in runs:
                    doc.add_code(parent=self.parents[self.level],
                                 text=clean_unicode(run.text.strip()),
                                 content_layer=self.content_layer,
                                 formatting=run.formatting,
                                 hyperlink=run.hyperlink)

        elif name == "footer":
            with self._use_section_group(tag, doc, furniture=True):
                self._walk(tag, doc)

        elif name == "details":
            with self._use_section_group(tag, doc, furniture=False):
                self._walk(tag, doc)

    def _handle_heading(self, tag: Tag, doc: DocTree) -> None:
        # Heading levels & parent-stack maintenance (html_backend.py:584-638).
        self.content_layer = BODY
        html_level = int(tag.name[1])
        run = merge_runs_to_one(self._runs_of(tag, parent_annotation=True))
        text_clean = clean_unicode(run.text)
        if html_level == 1:
            for key in self.parents:
                self.parents[key] = None
            self.level = 0
            self.parents[1] = doc.add_title(
                text_clean, content_layer=self.content_layer,
                formatting=run.formatting, hyperlink=run.hyperlink)
        else:
            level = html_level - 1
            if level > self.level:
                for i in range(self.level, level):
                    self.parents[i + 1] = doc.add_group(
                        label="section", name=f"header-{i + 1}",
                        parent=self.parents[i], content_layer=self.content_layer)
                self.level = level
            elif level < self.level:
                for key in self.parents:
                    if key > level + 1:
                        self.parents[key] = None
                self.level = level
            self.parents[self.level + 1] = doc.add_heading(
                parent=self.parents[self.level], text=text_clean, orig=run.text,
                level=self.level, content_layer=self.content_layer,
                formatting=run.formatting, hyperlink=run.hyperlink)
        self.level += 1
        for img in self._imgs_under(tag):
            self._emit_image(img, doc)

    def _handle_list(self, tag: Tag, doc: DocTree) -> None:
        # List groups, markers & nesting (html_backend.py:640-767).
        is_ordered = tag.name.lower() == "ol"
        start: Optional[int] = None
        if is_ordered:
            start_attr = tag.get("start")
            if isinstance(start_attr, str) and start_attr.isnumeric():
                start = int(start_attr)
            name = "ordered list" + (f" start {start}" if start is not None else "")
        else:
            name = "list"
        group = doc.add_list_group(name=name, parent=self.parents[self.level],
                                   content_layer=self.content_layer)
        self.parents[self.level + 1] = group
        self.level += 1

        # direct child scans (find_all(..., recursive=False) inlined —
        # these run once per list item and the call overhead shows)
        for li in [n for n in tag.contents
                   if n.__class__ is Tag and n.name in ("li", "ul", "ol")]:
            if li.name in ("ul", "ol"):
                # invalid-HTML list directly under list (html_backend.py:669-672)
                self._handle_block(li, doc)
                continue

            marker = f"{start + len(group.children)}." if (is_ordered and start is not None) else ""
            parts = simplify_runs(self._runs_of(li, ignore_list=True,
                                                parent_annotation=True))
            li_text = _WS_RUN_RE.sub(" ", "".join(r.text for r in parts)).strip()

            if li_text:
                if len(parts) > 1:
                    # Anchor an inline group on an empty list item
                    # (html_backend.py:692-733).
                    self.parents[self.level + 1] = doc.add_list_item(
                        text="", enumerated=is_ordered, marker=marker,
                        parent=group, content_layer=self.content_layer)
                    self.level += 1
                    with self._use_inline_group(parts, doc):
                        for run in parts:
                            self._emit_run(run, doc, collapse_ws=True)
                    for sublist in [n for n in li.contents if n.__class__ is Tag and n.name in ("ul", "ol")]:
                        self._handle_block(sublist, doc)
                    self.parents[self.level] = None
                    self.level -= 1
                else:
                    run = parts[0]
                    item_text = _WS_RUN_RE.sub(" ", run.text).strip()
                    self.parents[self.level + 1] = doc.add_list_item(
                        text=clean_unicode(item_text), enumerated=is_ordered,
                        marker=marker, orig=item_text, parent=group,
                        content_layer=self.content_layer,
                        formatting=run.formatting, hyperlink=run.hyperlink)
                    for sublist in [n for n in li.contents if n.__class__ is Tag and n.name in ("ul", "ol")]:
                        self.level += 1
                        self._handle_block(sublist, doc)
                        self.parents[self.level + 1] = None
                        self.level -= 1
            else:
                for sublist in [n for n in li.contents if n.__class__ is Tag and n.name in ("ul", "ol")]:
                    self._handle_block(sublist, doc)

            for img in self._imgs_under(li):
                self._emit_image(img, doc)

        self.parents[self.level + 1] = None
        self.level -= 1

    # -- images ------------------------------------------------------------
    def _emit_image(self, img_tag: Tag, doc: DocTree) -> None:
        # Caption resolution order (html_backend.py:854-901): ancestor link →
        # figcaption (overrides) → alt text.
        caption_runs: list[Run] = []

        ancestor = img_tag.parent
        link_href = None
        while ancestor is not None:
            if ancestor.name == "a" and ancestor.get("href"):
                link_href = ancestor.get("href")
                break
            ancestor = ancestor.parent
        if link_href:
            caption_runs.append(Run("Image Hyperlink.",
                                    hyperlink=make_hyperlink(link_href, self.original_url)))

        figure = img_tag.find_parent("figure")
        if figure is not None:
            caption_tag = figure.find("figcaption", recursive=False)
            if caption_tag is not None:
                caption_runs = self._runs_of(caption_tag, parent_annotation=True)
        if not caption_runs and img_tag.get("alt"):
            caption_runs = [Run(img_tag.get("alt"))]

        caption = merge_runs_to_one(caption_runs) if caption_runs else Run("")
        caption_item = None
        if caption.text:
            caption_item = doc.add_text(
                label="caption", text=clean_unicode(caption.text.strip()),
                orig=caption.text, content_layer=self.content_layer,
                formatting=caption.formatting, hyperlink=caption.hyperlink)
        doc.add_picture(caption=caption_item, parent=self.parents[self.level],
                        content_layer=self.content_layer)


# -- tables ----------------------------------------------------------------

def _cell_spans(cell: Tag) -> tuple[int, int]:
    """colspan/rowspan with non-numeric fallback to 1 (html_backend.py:973-998)."""

    def parse(value) -> int:
        s = str(value)
        # fast path: plain ASCII integers only (unicode digit-likes such
        # as '²' pass isdigit() but crash int())
        if s.isascii() and s.isdigit():
            return int(s)
        if s and s[0].isnumeric():
            m = re.search(r"\d+", s)
            if m:
                return int(m.group())
        return 1

    return parse(cell.get("colspan", "1")), parse(cell.get("rowspan", "1"))


def _cell_text(node) -> str:
    """Child-string concat with a trailing space after <p>/<li> only
    (html_backend.py:903-931)."""

    def rec(item) -> list[str]:
        if isinstance(item, NavStr):
            return [str(item)]
        if isinstance(item, Tag):
            parts: list[str] = []
            for child in item.contents:
                parts.extend(rec(child))
            joined = "".join(parts)
            return [joined + " " if item.name in ("p", "li") else joined]
        return []

    return "".join(rec(node))


def parse_table_data(element: Tag) -> Optional[TableData]:
    """HTML table → span-resolved cell grid (html_backend.py:1000-1101),
    including the row-header bookkeeping for pivot-style tables."""
    if element.find("table") is not None:
        return None  # nested tables are skipped

    # single DOM pass: rows, their cells and spans collected once (the
    # three passes below reuse them — spans are attr-only and unaffected
    # by the inline-formula text rewrite)
    table_rows = [(row, [(cell, _cell_spans(cell))
                         for cell in row.find_all(("td", "th"))])
                  for row in element.find_all("tr")]

    num_rows = 0
    num_cols = 0
    for _row, cells in table_rows:
        col_count = 0
        is_row_header = True
        for cell, (col_span, row_span) in cells:
            col_count += col_span
            if cell.name == "td" or row_span == 1:
                is_row_header = False
        num_cols = max(num_cols, col_count)
        if not is_row_header:
            num_rows += 1

    grid: list[list] = [[None] * num_cols for _ in range(num_rows)]
    data = TableData(num_rows=num_rows, num_cols=num_cols, table_cells=[])

    start_row_span = 0
    row_idx = -1
    for _row, cells in table_rows:
        col_header = True
        row_header = True
        for cell, (_, row_span) in cells:
            if cell.name == "td":
                col_header = False
                row_header = False
            elif row_span == 1:
                row_header = False
        if not row_header:
            row_idx += 1
            start_row_span = 0
        else:
            start_row_span += 1

        col_idx = 0
        for cell, (col_span, row_span) in cells:
            for formula in cell.find_all("inline-formula"):
                math_parts = formula.text.split("$$")
                if len(math_parts) == 3:
                    formula.replace_with(NavStr(f"$${math_parts[1]}$$"))

            text = _cell_text(cell).strip()
            if row_header:
                row_span -= 1
            while col_idx < num_cols and grid[row_idx + start_row_span][col_idx] is not None:
                col_idx += 1
            for r in range(start_row_span, start_row_span + row_span):
                for c in range(col_span):
                    if row_idx + r < num_rows and col_idx + c < num_cols:
                        grid[row_idx + r][col_idx + c] = text

            data.table_cells.append(TableCell(
                text=text,
                row_span=row_span,
                col_span=col_span,
                start_row=start_row_span + row_idx,
                end_row=start_row_span + row_idx + row_span,
                start_col=col_idx,
                end_col=col_idx + col_span,
                column_header=col_header,
                row_header=(not col_header) and cell.name == "th",
            ))

    return data


def extract_html(raw: bytes, name: str = "doc",
                 original_url: Optional[str] = None) -> DocTree:
    """Convenience one-shot: parse + walk one HTML document."""
    return HtmlExtractor(original_url=original_url).extract(raw, name=name)

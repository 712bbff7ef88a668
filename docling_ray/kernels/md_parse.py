"""CommonMark-subset parser with marko-shaped AST output.

Supports the constructs the reference markdown backend consumes through
marko (``/root/reference/docling/backend/md_backend.py``): ATX headings,
paragraphs with soft line breaks, bullet/ordered lists with tab/space
nesting, indented and fenced code blocks, HTML blocks (incl. comments), and
the inline set (emphasis, strong, code spans, links, images, backslash
escapes).  Node classes mirror marko's element names so the walk in
``md_extract`` reads like the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Union


# -- AST nodes --------------------------------------------------------------

@dataclass
class RawText:
    children: str  # marko stores the string in .children


@dataclass
class Literal:
    children: str


@dataclass
class LineBreak:
    soft: bool = True


@dataclass
class CodeSpan:
    children: str


@dataclass
class Emphasis:
    children: list = field(default_factory=list)


@dataclass
class StrongEmphasis:
    children: list = field(default_factory=list)


@dataclass
class Link:
    dest: str
    title: Optional[str]
    children: list = field(default_factory=list)


@dataclass
class Image:
    dest: str
    title: Optional[str]
    children: list = field(default_factory=list)


@dataclass
class Heading:
    level: int
    children: list = field(default_factory=list)


@dataclass
class Paragraph:
    children: list = field(default_factory=list)


@dataclass
class CodeBlock:  # indented
    children: list = field(default_factory=list)


@dataclass
class FencedCode:
    lang: str = ""
    children: list = field(default_factory=list)


@dataclass
class HTMLBlock:
    body: str = ""


@dataclass
class ListItem:
    children: list = field(default_factory=list)


@dataclass
class MdList:
    ordered: bool = False
    start: int = 1
    bullet: str = "-"
    children: list = field(default_factory=list)


@dataclass
class MdDocument:
    children: list = field(default_factory=list)


Inline = Union[RawText, Literal, LineBreak, CodeSpan, Emphasis, StrongEmphasis,
               Link, Image]

_ATX_RE = re.compile(r"^ {0,3}(#{1,6})(?:[ \t]+(.*?))?[ \t]*$")
_FENCE_RE = re.compile(r"^ {0,3}(`{3,}|~{3,})[ \t]*(\S*)[ \t]*$")
_BULLET_RE = re.compile(r"^( *)([-*+])(?:( +)(.*))?$")
_ORDERED_RE = re.compile(r"^( *)(\d{1,9})([.)])(?:( +)(.*))?$")
_HTML_BLOCK_TAGS = (
    "address", "article", "aside", "blockquote", "body", "caption", "center",
    "col", "colgroup", "dd", "details", "dialog", "dir", "div", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "frame", "frameset",
    "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr", "html",
    "iframe", "legend", "li", "link", "main", "menu", "menuitem", "nav",
    "noframes", "ol", "optgroup", "option", "p", "param", "section", "summary",
    "table", "tbody", "td", "tfoot", "th", "thead", "title", "tr", "track",
    "ul",
)
_HTML_OPEN_RE = re.compile(
    r"^ {0,3}</?([A-Za-z][A-Za-z0-9-]*)(\s|/?>|$)")


def _expand_tabs(line: str) -> str:
    return line.expandtabs(4)


def parse_markdown(text: str) -> MdDocument:
    lines = [_expand_tabs(ln) for ln in text.split("\n")]
    doc = MdDocument()
    doc.children = _parse_blocks(lines)
    return doc


def _indent_of(line: str) -> int:
    return len(line) - len(line.lstrip(" "))


def _parse_blocks(lines: list[str]) -> list:  # noqa: C901
    blocks: list = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()

        if not stripped:
            i += 1
            continue

        # fenced code
        fence = _FENCE_RE.match(line)
        if fence:
            marker = fence.group(1)
            lang = fence.group(2)
            body: list[str] = []
            i += 1
            while i < n:
                if re.match(rf"^ {{0,3}}{re.escape(marker[0])}{{{len(marker)},}}[ \t]*$", lines[i]):
                    i += 1
                    break
                body.append(lines[i])
                i += 1
            node = FencedCode(lang=lang)
            node.children = [RawText("\n".join(body) + ("\n" if body else ""))]
            blocks.append(node)
            continue

        # ATX heading
        atx = _ATX_RE.match(line)
        if atx:
            content = atx.group(2) or ""
            content = re.sub(r"[ \t]+#+[ \t]*$", "", content)
            node = Heading(level=len(atx.group(1)))
            if content.strip():
                node.children = _parse_inlines([content.strip()])
            blocks.append(node)
            i += 1
            continue

        # indented code block (cannot interrupt a paragraph — handled by
        # paragraph collection below claiming lazy lines first)
        if line.startswith("    "):
            body = []
            while i < n and (lines[i].startswith("    ") or not lines[i].strip()):
                if not lines[i].strip() and not any(
                        j < n and lines[j].startswith("    ")
                        for j in range(i + 1, min(i + 2, n))):
                    break
                body.append(lines[i][4:] if lines[i].startswith("    ") else "")
                i += 1
            while body and not body[-1].strip():
                body.pop()
            node = CodeBlock()
            text = "\n".join(body) + ("\n" if body else "")
            node.children = [RawText(text)]
            blocks.append(node)
            continue

        # HTML block
        if stripped.startswith("<!--"):
            body = []
            while i < n:
                body.append(lines[i])
                if "-->" in lines[i]:
                    i += 1
                    break
                i += 1
            blocks.append(HTMLBlock(body="\n".join(body)))
            continue
        html_open = _HTML_OPEN_RE.match(line)
        if html_open and html_open.group(1).lower() in _HTML_BLOCK_TAGS:
            body = []
            while i < n and lines[i].strip():
                body.append(lines[i])
                i += 1
            blocks.append(HTMLBlock(body="\n".join(body)))
            continue

        # lists
        bullet = _BULLET_RE.match(line)
        ordered = _ORDERED_RE.match(line)
        if bullet or ordered:
            blocks.append(_parse_list(lines, i))
            i = _parse_list.end_index  # type: ignore[attr-defined]
            continue

        # paragraph: collect until blank or structural line
        para_lines = [stripped]
        i += 1
        while i < n and lines[i].strip():
            nxt = lines[i]
            if (_ATX_RE.match(nxt) or _FENCE_RE.match(nxt)
                    or _BULLET_RE.match(nxt) or _ORDERED_RE.match(nxt)):
                break
            open_match = _HTML_OPEN_RE.match(nxt)
            if open_match and open_match.group(1).lower() in _HTML_BLOCK_TAGS:
                break
            para_lines.append(nxt.strip())
            i += 1
        node = Paragraph()
        node.children = _parse_inlines(para_lines)
        blocks.append(node)

    return blocks


def _parse_list(lines: list[str], start: int) -> MdList:  # noqa: C901
    i = start
    n = len(lines)
    first_b = _BULLET_RE.match(lines[i])
    first_o = _ORDERED_RE.match(lines[i])
    ordered = first_o is not None
    bullet_char = (first_b.group(2) if first_b else first_o.group(3))
    lst = MdList(ordered=ordered,
                 start=int(first_o.group(2)) if first_o else 1,
                 bullet=bullet_char)

    while i < n:
        line = lines[i]
        if not line.strip():
            # blank: list continues if an indented or new-item line follows
            j = i + 1
            while j < n and not lines[j].strip():
                j += 1
            if j >= n:
                break
            follow = lines[j]
            fb, fo = _BULLET_RE.match(follow), _ORDERED_RE.match(follow)
            if _indent_of(follow) >= 2 or (
                    (fb or fo) and _indent_of(follow) >= _indent_of(lines[start])):
                i = j
                continue
            break
        b = _BULLET_RE.match(line)
        o = _ORDERED_RE.match(line)
        if not (b or o):
            break
        if _indent_of(line) > _indent_of(lines[start]):
            break  # deeper item: belongs to the previous item's content
        marker_char = b.group(2) if b else o.group(3)
        if (o is not None) != ordered or marker_char != bullet_char:
            break  # changing symbol starts a new list

        # collect this item's content: rest of line + continuation lines
        if b:
            content_indent = len(b.group(1)) + 1 + len(b.group(3) or " ")
            first_content = b.group(4) or ""
        else:
            content_indent = (len(o.group(1)) + len(o.group(2)) + 1
                              + len(o.group(4) or " "))
            first_content = o.group(5) or ""
        item_lines = [first_content]
        i += 1
        while i < n:
            cont = lines[i]
            if not cont.strip():
                # keep blank inside item if further content is indented
                j = i + 1
                while j < n and not lines[j].strip():
                    j += 1
                if j < n and _indent_of(lines[j]) >= content_indent:
                    item_lines.append("")
                    i += 1
                    continue
                break
            if _indent_of(cont) >= content_indent:
                item_lines.append(cont[content_indent:])
                i += 1
                continue
            cb, co = _BULLET_RE.match(cont), _ORDERED_RE.match(cont)
            if cb or co:
                if _indent_of(cont) > _indent_of(lines[start]):
                    # nested item with shallower-than-content indent: treat
                    # as nested content (tab-nesting pattern)
                    item_lines.append(cont[min(_indent_of(cont), content_indent):])
                    i += 1
                    continue
                break
            # lazy paragraph continuation
            item_lines.append(cont.strip())
            i += 1

        item = ListItem()
        item.children = _parse_blocks(item_lines)
        lst.children.append(item)

    _parse_list.end_index = i  # type: ignore[attr-defined]
    return lst


# -- inline parsing ---------------------------------------------------------

_CODESPAN_RE = re.compile(r"(`+)(.+?)\1", re.S)
_LINK_RE = re.compile(
    r"(!?)\[([^\]]*)\]\(\s*(<[^>]*>|[^\s)]*)"
    r"(?:\s+(\"[^\"]*\"|'[^']*'))?\s*\)")


def _parse_inlines(lines: list[str]) -> list:
    out: list = []
    for idx, line in enumerate(lines):
        if idx > 0:
            out.append(LineBreak())
        out.extend(_parse_inline_text(line))
    return out


def _parse_inline_text(text: str) -> list:  # noqa: C901
    """Single-pass inline tokenizer: code spans and links bind first, then
    emphasis by delimiter matching, escapes become Literal nodes."""
    tokens: list = []
    buf: list[str] = []

    def flush():
        if buf:
            tokens.append(RawText("".join(buf)))
            buf.clear()

    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "\\" and i + 1 < n and not text[i + 1].isalnum():
            flush()
            tokens.append(Literal(text[i + 1]))
            i += 2
            continue
        if ch == "`":
            m = _CODESPAN_RE.match(text, i)
            if m:
                flush()
                tokens.append(CodeSpan(m.group(2).strip()))
                i = m.end()
                continue
        if ch in "[!":
            m = _LINK_RE.match(text, i)
            if m and (ch == "[" or (ch == "!" and i + 1 < n and text[i + 1] == "[")):
                flush()
                dest = m.group(3)
                if dest.startswith("<") and dest.endswith(">"):
                    dest = dest[1:-1]
                title = m.group(4)[1:-1] if m.group(4) else None
                cls = Image if m.group(1) == "!" else Link
                node = cls(dest=dest, title=title)
                node.children = _parse_inline_text(m.group(2))
                tokens.append(node)
                i = m.end()
                continue
        if ch == "*":
            run_len = 1
            while i + run_len < n and text[i + run_len] == "*":
                run_len += 1
            closer = _find_emphasis_close(text, i + run_len, run_len)
            if closer is not None:
                flush()
                inner = text[i + run_len:closer]
                node: object
                if run_len >= 3:
                    inner_nodes = _parse_inline_text(inner)
                    node = StrongEmphasis()
                    emph = Emphasis()
                    emph.children = inner_nodes
                    node.children = [emph]
                elif run_len == 2:
                    node = StrongEmphasis()
                    node.children = _parse_inline_text(inner)
                else:
                    node = Emphasis()
                    node.children = _parse_inline_text(inner)
                tokens.append(node)
                i = closer + run_len
                continue
        buf.append(ch)
        i += 1
    flush()
    return tokens


def _find_emphasis_close(text: str, start: int, run_len: int) -> Optional[int]:
    if start >= len(text) or text[start].isspace():
        return None
    i = start
    n = len(text)
    while i < n:
        if text[i] == "*" and text[i - 1:i] and not text[i - 1].isspace():
            run = 1
            while i + run < n and text[i + run] == "*":
                run += 1
            if run >= run_len:
                return i
            i += run
            continue
        i += 1
    return None

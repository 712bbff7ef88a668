"""Minimal HTML DOM built on the stdlib ``html.parser``.

This module provides just enough of a BeautifulSoup-like node API for the
HTML extraction kernel (`docling_ray.kernels.html_extract`).  The reference
engine parses HTML with ``BeautifulSoup(raw, "html.parser")``
(``/root/reference/docling/backend/html_backend.py:209``); since the target
runtime has no third-party HTML library we re-create the same *observable*
tree semantics directly on :class:`html.parser.HTMLParser`:

- character references are converted inline (``convert_charrefs=True``),
- void elements (``br``, ``img``, ...) never take children,
- an unmatched end tag is ignored; a matched one closes every tag opened
  after it,
- comments / doctypes / CDATA become :class:`Preformatted` strings which the
  extraction kernel skips,
- bare attributes (``hidden``) get the value ``""``.

Only UTF-8 (with latin-1 fallback) input is supported, which covers the
Common-Crawl-style corpus this engine targets.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterable, Iterator, Optional, Union

# HTML void elements: start tags that can never hold content.
VOID_ELEMENTS = frozenset(
    {
        "area",
        "base",
        "basefont",
        "bgsound",
        "br",
        "col",
        "command",
        "embed",
        "frame",
        "hr",
        "image",
        "img",
        "input",
        "isindex",
        "keygen",
        "link",
        "menuitem",
        "meta",
        "nextid",
        "param",
        "source",
        "spacer",
        "track",
        "wbr",
    }
)

# Elements whose raw content is not parsed as markup.
_CDATA_ELEMENTS = frozenset({"script", "style"})

# Whitespace-only text handling: outside these elements, a text node made
# entirely of ASCII spaces collapses to "\n" (if it contains a newline) or
# " " — the same reduction BeautifulSoup applies while building its tree.
_PRESERVE_WHITESPACE_TAGS = frozenset({"pre", "textarea"})
_ASCII_SPACES = frozenset(" \n\t\f\r")


class NavStr(str):
    """A text node; behaves as ``str`` and knows its parent element."""

    __slots__ = ("parent",)

    def __new__(cls, value: str = ""):
        self = super().__new__(cls, value)
        self.parent = None
        return self

    @property
    def name(self) -> Optional[str]:  # parity with Tag API in parent walks
        return None

    def replace_with(self, new_node: "Node") -> None:
        _replace_node(self, new_node)

    def extract(self) -> None:
        _detach_node(self)


class Preformatted(NavStr):
    """Comment / doctype / CDATA content — skipped by the extractor."""

    __slots__ = ()


Node = Union["Tag", NavStr]


class Tag:
    """An element node with ``name``, ``attrs`` and ordered ``contents``."""

    __slots__ = ("name", "attrs", "contents", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None):
        self.name = name
        self.attrs = attrs or {}
        self.contents: list[Node] = []
        self.parent: Optional[Tag] = None

    # -- construction ----------------------------------------------------
    def append(self, node: Node) -> None:
        node.parent = self
        self.contents.append(node)

    # -- attributes ------------------------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    # -- traversal -------------------------------------------------------
    def __iter__(self) -> Iterator[Node]:
        return iter(self.contents)

    def descendants(self) -> Iterator[Node]:
        # iterative DFS — nested generators are a hot-path cost
        stack = self.contents[::-1]
        while stack:
            node = stack.pop()
            yield node
            if node.__class__ is Tag or isinstance(node, Tag):
                if node.contents:
                    stack.extend(node.contents[::-1])

    def has_descendant_named(self, names) -> bool:
        """Early-exit check: any descendant tag whose name is in ``names``."""
        stack = self.contents[::-1]
        while stack:
            node = stack.pop()
            if isinstance(node, Tag):
                if node.name in names:
                    return True
                if node.contents:
                    stack.extend(node.contents[::-1])
        return False

    def find_all(
        self,
        name=None,
        recursive: bool = True,
        limit: Optional[int] = None,
        **attrs,
    ) -> list["Tag"]:
        if limit is None and not attrs \
                and isinstance(name, (str, tuple, frozenset, set)):
            if not recursive:
                if isinstance(name, str):
                    return [n for n in self.contents
                            if (n.__class__ is Tag or isinstance(n, Tag))
                            and n.name == name]
                return [n for n in self.contents
                        if (n.__class__ is Tag or isinstance(n, Tag))
                        and n.name in name]
            # hot path (img/tr/td scans): inline DFS, no generator frames
            single = isinstance(name, str)
            out_f: list[Tag] = []
            stack = self.contents[::-1]
            while stack:
                node = stack.pop()
                if node.__class__ is Tag or isinstance(node, Tag):
                    if (node.name == name) if single else (node.name in name):
                        out_f.append(node)
                    if node.contents:
                        stack.extend(node.contents[::-1])
            return out_f
        source: Iterable[Node] = self.descendants() if recursive else self.contents
        out: list[Tag] = []
        is_str = isinstance(name, str)
        for node in source:
            if not isinstance(node, Tag):
                continue
            if name is not None:
                if is_str:
                    if node.name != name:
                        continue
                elif node.name not in name:
                    continue
            if attrs:
                bad = False
                for key, want in attrs.items():
                    if bool(want) != (key in node.attrs):
                        bad = True
                        break
                if bad:
                    continue
            out.append(node)
            if limit is not None and len(out) >= limit:
                break
        return out

    # ``tag("br")`` shorthand, as used throughout the extraction kernel.
    __call__ = find_all

    def find(self, name=None, recursive: bool = True, **attrs) -> Optional["Tag"]:
        if recursive and not attrs and isinstance(name, str):
            # hot path: early-exit DFS without generator frames
            stack = self.contents[::-1]
            while stack:
                node = stack.pop()
                if node.__class__ is Tag or isinstance(node, Tag):
                    if node.name == name:
                        return node
                    if node.contents:
                        stack.extend(node.contents[::-1])
            return None
        found = self.find_all(name, recursive=recursive, limit=1, **attrs)
        return found[0] if found else None

    def find_parent(self, name=None) -> Optional["Tag"]:
        cur = self.parent
        while cur is not None:
            if name is None or cur.name == name:
                return cur
            cur = cur.parent
        return None

    # -- text ------------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        pieces: list[str] = []
        for node in self.descendants():
            if isinstance(node, Preformatted) or isinstance(node, Tag):
                continue
            text = str(node)
            if strip:
                text = text.strip()
                if not text:
                    continue
            pieces.append(text)
        return separator.join(pieces)

    @property
    def text(self) -> str:
        return self.get_text()

    # -- mutation --------------------------------------------------------
    def decompose(self) -> None:
        _detach_node(self)

    def replace_with(self, new_node: Node) -> None:
        _replace_node(self, new_node)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Tag {self.name} attrs={self.attrs} children={len(self.contents)}>"


class Document(Tag):
    """Root node of a parsed document.

    ``observed`` is filled by the tree builder with the document-order
    node lists the HTML extractor's preamble needs (removal candidates,
    ``<br>`` tags, heading presence probes), so the extractor can run
    ancestry checks on a handful of nodes instead of re-scanning the
    whole tree.  ``None`` for hand-built trees — consumers must fall
    back to a full scan then."""

    __slots__ = ("observed",)

    def __init__(self):
        super().__init__("[document]")
        self.observed: Optional[dict] = None

    @property
    def body(self) -> Optional[Tag]:
        return self.find("body")

    @property
    def title(self) -> Optional[Tag]:
        return self.find("title")


def _detach_node(node: Node) -> None:
    parent = node.parent
    if parent is not None:
        try:
            parent.contents.remove(node)
        except ValueError:
            pass
    node.parent = None


def _replace_node(old: Node, new: Node) -> None:
    parent = old.parent
    if parent is None:
        return
    idx = parent.contents.index(old)
    parent.contents[idx] = new
    new.parent = parent
    old.parent = None


# Tag names the extractor's preamble cares about, observed during parse
# (see Document.observed): removal roots, <br> rewrites, heading probes.
_OBSERVED_NAMES = frozenset(
    {"script", "style", "br", "img", "h1", "h2", "h3", "h4", "h5", "h6"})


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Tag] = [self.root]
        # count of open pre/textarea elements — O(1) whitespace-collapse
        # decisions in _append_text instead of an O(depth) stack scan
        self._pre_depth = 0
        self.root.observed = self._observed = {
            "removed": [], "brs": [], "headings": [], "imgs": []}

    # -- helpers ---------------------------------------------------------
    def _top(self) -> Tag:
        return self.stack[-1]

    def _append_text(self, text: str, cls=NavStr) -> None:
        if not text:
            return
        # strip-to-empty ⟺ every char in _ASCII_SPACES, but in C
        if cls is NavStr and not self._pre_depth \
                and not text.strip(" \n\t\f\r"):
            text = "\n" if "\n" in text else " "
        self.stack[-1].append(cls(text))

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, name, attrs):
        attr_dict: dict[str, str] = {}
        if attrs:
            for key, value in attrs:
                if key not in attr_dict:  # keep the first duplicate, like bs4
                    attr_dict[key] = "" if value is None else value
        tag = Tag(name, attr_dict)
        top = self.stack[-1]
        tag.parent = top
        top.contents.append(tag)
        if name in _OBSERVED_NAMES or "hidden" in attr_dict:
            if name in ("script", "style") or "hidden" in attr_dict:
                self._observed["removed"].append(tag)
            elif name == "br":
                self._observed["brs"].append(tag)
            elif name == "img":
                self._observed["imgs"].append(tag)
            else:
                self._observed["headings"].append(tag)
        if name not in VOID_ELEMENTS:
            self.stack.append(tag)
            if name in _PRESERVE_WHITESPACE_TAGS:
                self._pre_depth += 1

    def handle_startendtag(self, name, attrs):
        self.handle_starttag(name, attrs)
        if name not in VOID_ELEMENTS and self._top().name == name:
            self.stack.pop()
            if name in _PRESERVE_WHITESPACE_TAGS:
                self._pre_depth -= 1

    def handle_endtag(self, name):
        if name in VOID_ELEMENTS:
            return
        # Close up to the most recent matching open tag; ignore otherwise.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == name:
                if self._pre_depth:
                    for t in self.stack[i:]:
                        if t.name in _PRESERVE_WHITESPACE_TAGS:
                            self._pre_depth -= 1
                del self.stack[i:]
                return

    def handle_data(self, data):
        self._append_text(data)

    def handle_comment(self, data):
        self._append_text(f"<!--{data}-->", Preformatted)

    def handle_decl(self, decl):
        self._append_text(f"<!{decl}>", Preformatted)

    def unknown_decl(self, data):
        self._append_text(f"<![{data}]>", Preformatted)

    def handle_pi(self, data):
        self._append_text(f"<?{data}>", Preformatted)


def parse_html(raw: Union[bytes, str], fast: bool = True) -> Document:
    """Parse HTML bytes/text into a :class:`Document` tree.

    The fast tokenizer (``dom_fast``, html.parser-exact semantics) is the
    default; any internal error falls back to the stdlib event parser."""
    if isinstance(raw, bytes):
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = raw.decode("latin-1")
    else:
        text = raw
    if fast:
        from docling_ray import dom_fast

        builder = _TreeBuilder()
        try:
            dom_fast.feed(text, builder)
        except AssertionError:
            raise  # html.parser raises these too (unknown marked section)
        except Exception:
            builder = None  # fall back below
        if builder is not None:
            return builder.root
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root

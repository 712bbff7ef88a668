"""Hierarchical document chunker (training-data surface of the reference's
``docling.chunking`` re-exports, ``/root/reference/docling/chunking/__init__.py:6-12``).

One chunk per leaf block (paragraph / list group / table), carrying the
heading path as context — the HierarchicalChunker contract; a greedy
token-budget merge of same-context neighbours approximates HybridChunker's
packing without a tokenizer dependency (whitespace tokens stand in for BPE).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from docling_ray.doctree import BODY, DocTree, GroupItem, Item, PictureItem, TableItem, TextItem


@dataclass
class Chunk:
    text: str
    headings: list[str] = field(default_factory=list)
    n_tokens: int = 0
    kind: str = "text"

    def contextualize(self) -> str:
        """Chunk text prefixed with its heading path (BaseChunker.contextualize)."""
        return "\n".join([*self.headings, self.text]) if self.headings else self.text


def _table_text(item: TableItem) -> str:
    grid = item.data.grid()
    return "\n".join(", ".join(cell for cell in row if cell) for row in grid)


def hierarchical_chunks(doc: DocTree) -> list[Chunk]:
    chunks: list[Chunk] = []
    heading_stack: list[tuple[int, str]] = []  # (level, text)

    def headings() -> list[str]:
        return [text for _, text in heading_stack]

    def visit(item: Item):
        if item.content_layer != BODY:
            return
        if isinstance(item, TextItem):
            if item.text_label == "title":
                heading_stack.clear()
                heading_stack.append((0, item.text))
            elif item.text_label == "section_header":
                while heading_stack and heading_stack[-1][0] >= item.level:
                    heading_stack.pop()
                heading_stack.append((item.level, item.text))
            elif item.text and item.text_label not in ("caption",):
                chunks.append(Chunk(text=item.text, headings=headings(),
                                    n_tokens=len(item.text.split()),
                                    kind=item.text_label))
            for child in item.children:
                visit(child)
            return
        if isinstance(item, GroupItem):
            if item.group_label == "list":
                lines = _list_lines(item)
                if lines:
                    text = "\n".join(lines)
                    chunks.append(Chunk(text=text, headings=headings(),
                                        n_tokens=len(text.split()), kind="list"))
                return
            for child in item.children:
                visit(child)
            return
        if isinstance(item, TableItem):
            text = _table_text(item)
            if text:
                chunks.append(Chunk(text=text, headings=headings(),
                                    n_tokens=len(text.split()), kind="table"))
            return
        if isinstance(item, PictureItem):
            if item.caption is not None and item.caption.text:
                chunks.append(Chunk(text=item.caption.text, headings=headings(),
                                    n_tokens=len(item.caption.text.split()),
                                    kind="picture"))
            return
        for child in item.children:
            visit(child)

    def _list_lines(group: GroupItem) -> list[str]:
        lines = []
        for child in group.children:
            if isinstance(child, TextItem) and child.text_label == "list_item":
                text = child.text or " ".join(
                    sub.text for g in child.children
                    if isinstance(g, GroupItem)
                    for sub in g.children if isinstance(sub, TextItem))
                if text:
                    lines.append(text)
                for sub in child.children:
                    if isinstance(sub, GroupItem) and sub.group_label == "list":
                        lines.extend(_list_lines(sub))
            elif isinstance(child, GroupItem) and child.group_label == "list":
                lines.extend(_list_lines(child))
        return lines

    for child in doc.body.children:
        visit(child)
    return chunks


def merge_chunks(chunks: list[Chunk], max_tokens: int = 256) -> list[Chunk]:
    """Greedy packing of adjacent chunks sharing the same heading path
    (HybridChunker-style merge-by-peers)."""
    merged: list[Chunk] = []
    for chunk in chunks:
        if (merged
                and merged[-1].headings == chunk.headings
                and merged[-1].n_tokens + chunk.n_tokens <= max_tokens):
            prev = merged[-1]
            prev.text = prev.text + "\n" + chunk.text
            prev.n_tokens += chunk.n_tokens
            prev.kind = "merged"
        else:
            merged.append(Chunk(chunk.text, list(chunk.headings),
                                chunk.n_tokens, chunk.kind))
    return merged


def chunk_document(doc: DocTree, max_tokens: int = 256) -> list[Chunk]:
    return merge_chunks(hierarchical_chunks(doc), max_tokens=max_tokens)

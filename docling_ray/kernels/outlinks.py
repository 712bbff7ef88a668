"""Outlink extraction: ``html bytes → [(href, anchor_text)]``.

The crawl-graph side of extraction (the reference's HTML backend walks
the DOM for CONTENT and drops hyperlink targets after annotating runs,
``/root/reference/docling/backend/html_backend.py`` — a crawl pipeline
additionally needs the edges).  Reuses the engine's own DOM
(``docling_ray.dom``, html.parser-exact) so link extraction sees exactly
the tree the content walk sees.

Rules (mirrored by the generator-side TRUE golden,
``sources/webpages.make_expected_outlinks_table``):
- every ``<a>`` with an ``href`` attribute, in document order;
- subtrees under ``script``/``style`` or any ``hidden`` attribute are
  boilerplate — skipped, both for anchor DISCOVERY and for the anchor's
  own TEXT (a hidden span inside a link must not leak into the ranking
  signal);
- anchor text is the anchor subtree's visible text,
  whitespace-collapsed; the walk descends INTO anchors, so the nested
  ``<a>`` trees this DOM can build from unclosed crawl HTML still
  yield every inner link (the outer anchor's text includes the inner
  anchor's, matching what the DOM renders);
- nothing is resolved or deduplicated here: relative hrefs stay raw
  (compose with ``stages/urls.py`` canonicalization downstream).
"""

from __future__ import annotations

from docling_ray.dom import Tag, parse_html

_SKIP = ("script", "style")


def _visible_text(tag: Tag) -> str:
    """Whitespace-collapsed visible text of a subtree, applying the
    same script/style/hidden exclusion as the anchor discovery walk
    (``Tag.get_text`` does not)."""
    pieces: list[str] = []
    stack = list(tag.contents[::-1])
    while stack:
        node = stack.pop()
        if isinstance(node, Tag):
            if node.name in _SKIP or "hidden" in node.attrs:
                continue
            if node.contents:
                stack.extend(node.contents[::-1])
        else:
            pieces.append(str(node))
    return " ".join("".join(pieces).split())


def outlinks_of(raw) -> list[tuple[str, str]]:
    """All (href, anchor_text) pairs of a document, document order."""
    doc = parse_html(raw)
    out: list[tuple[str, str]] = []
    stack = list(doc.contents[::-1])
    while stack:
        node = stack.pop()
        if not isinstance(node, Tag):
            continue
        if node.name in _SKIP or "hidden" in node.attrs:
            continue
        if node.name == "a":
            href = node.get("href")
            if href is not None:
                out.append((href, _visible_text(node)))
        if node.contents:
            stack.extend(node.contents[::-1])
    return out

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
  boilerplate — skipped (same exclusion the content walk applies);
- anchor text is the node's visible text, whitespace-collapsed;
- nothing is resolved or deduplicated here: relative hrefs stay raw
  (compose with ``stages/urls.py`` canonicalization downstream).
"""

from __future__ import annotations

from docling_ray.dom import Tag, parse_html


def outlinks_of(raw) -> list[tuple[str, str]]:
    """All (href, anchor_text) pairs of a document, document order."""
    doc = parse_html(raw)
    out: list[tuple[str, str]] = []
    stack = list(doc.contents[::-1])
    while stack:
        node = stack.pop()
        if not isinstance(node, Tag):
            continue
        if node.name in ("script", "style") or "hidden" in node.attrs:
            continue
        if node.name == "a":
            href = node.get("href")
            if href is not None:
                out.append((href, " ".join(node.get_text().split())))
            continue            # html.parser never nests anchors
        if node.contents:
            stack.extend(node.contents[::-1])
    return out

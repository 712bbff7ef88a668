"""Markdown serializer parity over the full multi-format ground-truth corpus:
every ``*.json`` / ``*.md`` pair (PDF, DOCX, PPTX, XLSX, CSV, JATS, USPTO,
HTML, ...) must round-trip ``load_docjson`` → ``to_markdown`` byte-exactly."""

from pathlib import Path

import pytest

from docling_ray.kernels.docjson import load_docjson
from docling_ray.kernels.markdown import to_markdown

GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

PAIRS = sorted(
    p.name for p in GT_DIR.glob("*.json") if p.with_suffix(".md").exists()
) if GT_DIR.exists() else []


@pytest.mark.parametrize("name", PAIRS)
def test_json_to_markdown_byte_identical(name):
    doc = load_docjson((GT_DIR / name).read_text())
    expected = (GT_DIR / name).with_suffix(".md").read_text()
    assert to_markdown(doc) == expected


def test_pair_corpus_nonempty():
    assert len(PAIRS) >= 60


def test_split_page_html_view():
    """Split-page view: one two-pane row per page, content assigned by
    provenance (save_as_html(split_page_view=True) analog)."""
    from docling_ray.kernels.html_export import to_html_split_page
    from docling_ray.kernels.reading_order import ROElement, reading_order_document

    els = [
        ROElement(0, 0, "section_header", 36, 40, 570, 60, "Page one head"),
        ROElement(1, 0, "text", 36, 100, 570, 120, "First page text."),
        ROElement(2, 1, "text", 36, 100, 570, 120, "Second page text."),
    ]
    doc = reading_order_document("d", els)
    html = to_html_split_page(doc)
    assert html.count('class="split-row"') == 2
    assert 'id="page-1"' in html and 'id="page-2"' in html
    one = html.index("First page text")
    two = html.index("Second page text")
    assert html.index('id="page-1"') < one < html.index('id="page-2"') < two
    # image pane used when a page image is provided
    html2 = to_html_split_page(doc, page_images={1: "p1.png"})
    assert '<img src="p1.png"' in html2


def test_markdown_params_surface():
    """Serializer parameterization (docling-core MarkdownParams analog):
    image placeholder and underscore escaping are configurable; defaults
    reproduce the goldens."""
    from docling_ray.doctree import DocTree
    from docling_ray.kernels.markdown import to_markdown

    doc = DocTree("d")
    doc.add_text(label="text", text="snake_case_name")
    doc.add_picture()
    assert to_markdown(doc) == "snake\\_case\\_name\n\n<!-- image -->"
    assert to_markdown(doc, image_placeholder="![img]",
                       escape_underscores=False) == \
        "snake_case_name\n\n![img]"

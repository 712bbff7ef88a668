"""Single-operator walker tests mirroring the reference's unit expectations
(``/root/reference/tests/test_backend_html.py:49-118,186-213``)."""

import pytest

from docling_ray.kernels.html_extract import extract_html
from docling_ray.kernels.markdown import to_markdown
from docling_ray.doctree import FURNITURE, BODY


def md(html: bytes) -> str:
    return to_markdown(extract_html(html))


@pytest.mark.parametrize("html,expected", [
    (b"<html><body><ol><li>1st item</li><li>2nd item</li></ol></body></html>",
     "1. 1st item\n2. 2nd item"),
    (b'<html><body><ol start="1"><li>1st item</li><li>2nd item</li></ol></body></html>',
     "1. 1st item\n2. 2nd item"),
    (b'<html><body><ol start="2"><li>1st item</li><li>2nd item</li></ol></body></html>',
     "2. 1st item\n3. 2nd item"),
    (b'<html><body><ol start="0"><li>1st item</li><li>2nd item</li></ol></body></html>',
     "0. 1st item\n1. 2nd item"),
    (b'<html><body><ol start="-5"><li>1st item</li><li>2nd item</li></ol></body></html>',
     "1. 1st item\n2. 2nd item"),
    (b'<html><body><ol start="foo"><li>1st item</li><li>2nd item</li></ol></body></html>',
     "1. 1st item\n2. 2nd item"),
])
def test_ordered_list_start_variants(html, expected):
    assert md(html) == expected


def test_unicode_characters():
    raw = "<html><body><h1>Hello World!</h1></body></html>".encode()
    doc = extract_html(raw)
    items = [it for it, _ in doc.iterate()]
    assert items[0].text == "Hello World!"


def test_furniture_layers():
    raw = (b"<html><body><p>Initial content with some <strong>bold text</strong></p>"
           b"<h1>Main Heading</h1>"
           b"<p>Some Content</p>"
           b"<footer><p>Some Footer Content</p></footer></body></html")
    doc = extract_html(raw)
    assert to_markdown(doc) == "# Main Heading\n\nSome Content"
    both = to_markdown(doc, layers={BODY, FURNITURE})
    assert both == ("Initial content with some **bold text**\n\n# Main Heading\n\n"
                    "Some Content\n\nSome Footer Content")


def test_heading_levels_wiki():
    import pathlib
    path = pathlib.Path("/root/reference/tests/data/html/wiki_duck.html")
    doc = extract_html(path.read_bytes())
    levels = {it.text: it.level for it, _ in doc.iterate()
              if it.label == "section_header"}
    # h2 becomes level 1 / h3 level 2 because h1 is the title
    assert levels["Etymology"] == 1
    assert levels["Feeding"] == 2


def test_nested_table_skipped():
    raw = (b"<html><body><table><tr><td>"
           b"<table><tr><td>inner</td></tr></table>"
           b"</td></tr></table></body></html>")
    assert md(raw) == ""


def test_hidden_and_script_stripped():
    raw = (b"<html><body><p>keep</p><div hidden><p>drop</p></div>"
           b"<script>var x=1;</script><style>p{}</style></body></html>")
    assert md(raw) == "keep"


def test_confidence_grades():
    from docling_ray.kernels.confidence import (
        PageConfidence,
        doc_confidence,
        score_to_grade,
    )

    assert score_to_grade(0.3) == "poor"
    assert score_to_grade(0.6) == "fair"
    assert score_to_grade(0.85) == "good"
    assert score_to_grade(0.95) == "excellent"
    assert score_to_grade(float("nan")) == "unspecified"
    conf = doc_confidence([PageConfidence(parse_score=1.0),
                           PageConfidence(parse_score=0.2)])
    assert conf["mean_grade"] == "fair"  # mean of 1.0 and 0.2 = 0.6


def test_strict_text_export():
    from docling_ray.kernels.html_extract import extract_html
    from docling_ray.kernels.markdown import to_text

    raw = (b"<html><body><h1>Title</h1><p>Some <b>bold</b> text.</p>"
           b"<ul><li>item one</li></ul></body></html>")
    text = to_text(extract_html(raw))
    assert "Title" in text and "Some **bold** text." not in text
    assert "bold" in text and "#" not in text and "- item" not in text
    assert "item one" in text


def test_unicode_digitlike_span_does_not_crash():
    """'²'.isdigit() is True but int('²') raises — must fall through to
    span 1, not fail the document (round-2 review finding)."""
    from docling_ray.kernels.html_extract import extract_html
    from docling_ray.kernels.markdown import to_markdown

    raw = ('<html><body><table><tr><td colspan="²">a</td><td>b</td></tr>'
           "<tr><td>c</td><td>d</td></tr></table></body></html>").encode()
    md = to_markdown(extract_html(raw))
    assert "a" in md and "d" in md

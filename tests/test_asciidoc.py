"""AsciiDoc backend tests.

test_03 is byte-identical to its ground truth.  The reference's own
asciidoc md assertions are commented out
(``/root/reference/tests/test_backend_asciidoc.py:64``) and the committed
goldens for test_01/test_02 predate the current fixtures (e.g. the golden
title says "Sample Document Title" while the fixture says "1st Sample
Document Title"), so those two are checked structurally against the current
reference parser behavior instead."""

from pathlib import Path

from docling_ray.kernels.asciidoc_extract import extract_asciidoc
from docling_ray.kernels.markdown import to_markdown

BASE = Path("/root/reference/tests/data/asciidoc")
GT = Path("/root/reference/tests/data/groundtruth/docling_v2")


def test_asciidoc_03_byte_identical():
    got = to_markdown(extract_asciidoc((BASE / "test_03.asciidoc").read_bytes()))
    assert got == (GT / "test_03.asciidoc.md").read_text()


def test_asciidoc_02_structure():
    doc = extract_asciidoc((BASE / "test_02.asciidoc").read_bytes())
    md = to_markdown(doc)
    assert md.startswith("# 2nd Sample Document Title")
    assert "## Section 1: Testing nestedlists" in md
    assert "#### SubSubSection 2.1.1" in md
    # nested lists indent under their parent item
    assert "- Second item\n    - Nested ordered item 1" in md
    # captioned table
    assert "Caption for the table 1" in md
    assert "| Header 1   | Header 2   |" in md
    # image macro with preceding dot-caption
    assert "An example caption for the image" in md
    assert "<!-- image -->" in md


def test_asciidoc_01_structure():
    doc = extract_asciidoc((BASE / "test_01.asciidoc").read_bytes())
    md = to_markdown(doc)
    assert md.startswith("# 1st Sample Document Title")
    assert "- First list item" in md
    assert "- A dash list item" in md


def test_asciidoc_empty():
    doc = extract_asciidoc(b"")
    assert to_markdown(doc) == ""

"""Byte-identical extracted text per document vs the reference converter's
committed ground truth (the north-rule correctness criterion).

Every HTML fixture in the reference corpus must serialize to markdown
byte-for-byte equal to ``groundtruth/docling_v2/<name>.md`` — the same
assertion the reference's own e2e test makes
(``/root/reference/tests/test_backend_html.py:156-183``).
"""

from pathlib import Path

import pytest

from docling_ray.kernels.html_extract import extract_html
from docling_ray.kernels.markdown import to_markdown

HTML_DIR = Path("/root/reference/tests/data/html")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(p.name for p in HTML_DIR.glob("*.html")) if HTML_DIR.exists() else []


@pytest.mark.parametrize("name", FIXTURES)
def test_html_markdown_byte_identical(name):
    raw = (HTML_DIR / name).read_bytes()
    expected = (GT_DIR / f"{name}.md").read_text()
    doc = extract_html(raw, name=Path(name).stem)
    assert to_markdown(doc) == expected


def test_fixture_corpus_nonempty():
    assert len(FIXTURES) >= 18

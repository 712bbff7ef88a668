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

"""Markdown backend: byte-identical markdown re-export for every reference
md fixture (including the HTML-block export/re-parse round trip)."""

from pathlib import Path

import pytest

from docling_ray.kernels.md_extract import extract_markdown
from docling_ray.kernels.markdown import to_markdown

BASE = Path("/root/reference/tests/data/md")
GT = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(p.name for p in BASE.glob("*.md")) if BASE.exists() else []


@pytest.mark.parametrize("name", FIXTURES)
def test_md_byte_identical(name):
    doc = extract_markdown((BASE / name).read_bytes(), name=Path(name).stem)
    # the md-backend goldens carry a trailing newline
    assert to_markdown(doc) + "\n" == (GT / f"{name}.md").read_text()


def test_md_corpus_nonempty():
    assert len(FIXTURES) >= 8

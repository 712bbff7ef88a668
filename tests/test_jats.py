"""JATS backend: byte-identical markdown AND indented text for every
reference nxml fixture."""

from pathlib import Path

import pytest

from docling_ray.kernels.itxt import to_indented_text
from docling_ray.kernels.jats_extract import extract_jats
from docling_ray.kernels.markdown import to_markdown

BASE = Path("/root/reference/tests/data/jats")
GT = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(p.name for p in BASE.glob("*.nxml")) if BASE.exists() else []


@pytest.mark.parametrize("name", FIXTURES)
def test_jats_byte_identical(name):
    doc = extract_jats((BASE / name).read_bytes(), name=Path(name).stem)
    assert to_markdown(doc) == (GT / f"{name}.md").read_text()
    assert to_indented_text(doc) == (GT / f"{name}.itxt").read_text()


def test_jats_corpus_nonempty():
    assert len(FIXTURES) >= 3

"""DOCX backend parity: markdown + indented text vs ground truth for every
reference fixture (including the OMML-equation documents)."""

from pathlib import Path

import pytest

from docling_ray.kernels.docx_extract import extract_docx
from docling_ray.kernels.itxt import to_indented_text
from docling_ray.kernels.markdown import to_markdown

BASE = Path("/root/reference/tests/data/docx")
GT = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(p.name for p in BASE.glob("*.docx")) if BASE.exists() else []


@pytest.mark.parametrize("name", FIXTURES)
def test_docx_byte_identical(name):
    doc = extract_docx((BASE / name).read_bytes(), name=Path(name).stem)
    md = to_markdown(doc)
    exp_md = (GT / f"{name}.md").read_text()
    assert md == exp_md or md + "\n" == exp_md
    itxt = to_indented_text(doc)
    exp_itxt = (GT / f"{name}.itxt").read_text()
    assert itxt == exp_itxt or itxt + "\n" == exp_itxt


def test_docx_corpus_nonempty():
    assert len(FIXTURES) >= 13

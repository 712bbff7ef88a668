"""XLSX and PPTX backend parity (markdown + indented text, byte-exact)."""

from pathlib import Path

import pytest

from docling_ray.kernels.itxt import to_indented_text
from docling_ray.kernels.markdown import to_markdown
from docling_ray.kernels.pptx_extract import extract_pptx
from docling_ray.kernels.xlsx_extract import extract_xlsx

GT = Path("/root/reference/tests/data/groundtruth/docling_v2")
XLSX = Path("/root/reference/tests/data/xlsx")
PPTX = Path("/root/reference/tests/data/pptx")

XLSX_FIXTURES = sorted(p.name for p in XLSX.glob("*.xls*")) if XLSX.exists() else []
PPTX_FIXTURES = sorted(
    p.name for p in PPTX.glob("*.pptx") if (GT / f"{p.name}.md").exists()
) if PPTX.exists() else []


def _check(doc, name):
    md = to_markdown(doc)
    exp_md = (GT / f"{name}.md").read_text()
    assert md == exp_md or md + "\n" == exp_md
    itxt = to_indented_text(doc)
    exp_itxt = (GT / f"{name}.itxt").read_text()
    assert itxt == exp_itxt or itxt + "\n" == exp_itxt


@pytest.mark.parametrize("name", XLSX_FIXTURES)
def test_xlsx_byte_identical(name):
    _check(extract_xlsx((XLSX / name).read_bytes(), name=Path(name).stem), name)


@pytest.mark.parametrize("name", PPTX_FIXTURES)
def test_pptx_byte_identical(name):
    _check(extract_pptx((PPTX / name).read_bytes(), name=Path(name).stem), name)


def test_office_corpus_nonempty():
    assert len(XLSX_FIXTURES) >= 2 and len(PPTX_FIXTURES) >= 3

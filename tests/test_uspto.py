"""USPTO backend parity: every reference fixture with ground truth is
byte-identical (markdown + untruncated indented text), covering all four
ported generations (ICE app v4.4, grant v2.5, pap v1.5, APS text)."""

from pathlib import Path

import pytest

from docling_ray.kernels.itxt import to_indented_text
from docling_ray.kernels.markdown import to_markdown
from docling_ray.kernels.uspto_extract import extract_uspto

BASE = Path("/root/reference/tests/data/uspto")
GT = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = [
    ("ipa20180000016.xml", "ipa20180000016"),
    ("ipa20200022300.xml", "ipa20200022300"),
    ("pftaps057006474.txt", "pftaps057006474"),
    ("pg06442728.xml", "pg06442728"),
    ("pa20010031492.xml", "pa20010031492"),
]


@pytest.mark.parametrize("fname,gname", FIXTURES)
def test_uspto_byte_identical(fname, gname):
    doc = extract_uspto((BASE / fname).read_bytes(), name=gname)
    md = to_markdown(doc)
    exp_md = (GT / f"{gname}.md").read_text()
    assert md == exp_md or md + "\n" == exp_md
    itxt = to_indented_text(doc, max_text_len=None)
    exp_itxt = (GT / f"{gname}.itxt").read_text()
    assert itxt == exp_itxt or itxt + "\n" == exp_itxt

"""Indented-text export parity over every ground-truth itxt/json pair.

Most goldens were generated with ``max_text_len=70``; the USPTO patent
goldens use the default (no truncation) — accept either, matching the
reference's per-backend test parameters."""

from pathlib import Path

import pytest

from docling_ray.kernels.docjson import load_docjson
from docling_ray.kernels.itxt import to_indented_text

GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

PAIRS = sorted(
    p.name for p in GT_DIR.glob("*.itxt")
    if (GT_DIR / (p.name[:-5] + ".json")).exists()
) if GT_DIR.exists() else []


@pytest.mark.parametrize("name", PAIRS)
def test_itxt_byte_identical(name):
    doc = load_docjson((GT_DIR / (name[:-5] + ".json")).read_text())
    expected = (GT_DIR / name).read_text()
    assert (to_indented_text(doc) == expected
            or to_indented_text(doc, max_text_len=None) == expected)


def test_itxt_corpus_nonempty():
    assert len(PAIRS) >= 50

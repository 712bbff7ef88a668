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


def test_dispatch_routes_all_patent_generations():
    """Dispatch-level: every USPTO fixture must route to the USPTO kernel
    through sniff + extract_doc, not fall back to JATS/HTML tag soup
    (the reference's doctype marker list incl. v2.5 "us-grant-025",
    /root/reference/docling/datamodel/document.py:352-358)."""
    from docling_ray.stages.extract import extract_doc, sniff_format_bytes

    for fname, gname in FIXTURES:
        raw = (BASE / fname).read_bytes()
        fmt = sniff_format_bytes(raw)
        assert fmt in ("xml", "uspto"), (fname, fmt)
        doc = extract_doc(raw, fmt)
        md = to_markdown(doc)
        exp_md = (GT / f"{gname}.md").read_text()
        assert md == exp_md or md + "\n" == exp_md, fname


def test_dispatch_rejects_non_document_xml():
    """Arbitrary XML (feeds, config) must become a failure row, never
    tag-soup success (ADVICE.md)."""
    import pyarrow as pa

    from docling_ray.stages.extract import extract_batch

    rss = b"<?xml version='1.0'?><rss><channel><title>x</title></channel></rss>"
    out = extract_batch(pa.table({"html": [rss], "format": ["xml"]}))
    assert out["status"].to_pylist() == ["failure"]
    assert "unsupported XML" in out["error"].to_pylist()[0]


def test_dispatch_prolog_free_jats_sniffs_as_xml():
    from docling_ray.stages.extract import sniff_format_bytes

    raw = Path("/root/reference/tests/data/jats/elife-56337.xml").read_bytes()
    assert sniff_format_bytes(raw) == "xml"

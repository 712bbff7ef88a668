"""METS-GBS backend tests against the reference's own fixture and test
expectations (``/root/reference/tests/test_backend_mets_gbs.py``)."""

from pathlib import Path

import pytest

# repo-committed copy of the reference fixture
# (/root/reference/tests/data/mets_gbs/32044009881525_select.tar.gz)
FIXTURE = Path(__file__).parent / "data" / "32044009881525_select.tar.gz"


@pytest.fixture(scope="module")
def raw() -> bytes:
    return FIXTURE.read_bytes()


def test_num_pages(raw):
    from docling_ray.kernels.mets_gbs import parse_mets_gbs

    pages = parse_mets_gbs(raw)
    assert len(pages) == 3  # reference test_num_pages
    assert [p.page_no for p in pages] == [0, 1, 2]


def test_process_pages_cells(raw):
    from docling_ray.kernels.mets_gbs import parse_mets_gbs

    for page in parse_mets_gbs(raw):
        assert page.width > 0 and page.height > 0
        assert page.line_cells and page.word_cells
        for cell in page.line_cells:
            assert cell.r >= cell.l and cell.b >= cell.t
            assert 0.0 <= cell.confidence <= 1.0


def test_get_text_from_rect(raw):
    """Reference test_get_text_from_rect, byte-identical expectation."""
    from docling_ray.kernels.mets_gbs import get_text_in_rect, parse_mets_gbs

    p0 = parse_mets_gbs(raw)[0]
    text = get_text_in_rect(p0.line_cells, (275, 263, 1388, 311))
    assert text.strip() == "recently become prevalent that he who speaks"


def test_rect_and_confidence_parsing():
    from docling_ray.kernels.mets_gbs import extract_confidence, extract_rect

    assert extract_rect("bbox 279 177 306 214;x_wconf 97") == (279, 177, 306, 214)
    assert extract_rect("x_wconf 97") is None
    assert extract_rect("bbox a b c d") is None
    assert extract_confidence("bbox 1 2 3 4;x_wconf 97") == 0.97
    assert extract_confidence("bbox 1 2 3 4") == 1
    assert extract_confidence("x_wconf nope") == 1


def test_dispatch_and_extract_doc(raw):
    from docling_ray.kernels.markdown import to_markdown
    from docling_ray.stages.extract import extract_doc, sniff_format_bytes

    assert sniff_format_bytes(raw) == "mets_gbs"
    doc = extract_doc(raw, "mets_gbs")
    md = to_markdown(doc)
    assert "recently become prevalent that he who speaks" in md
    assert "THE PROBLEM OF THE PACIFIC" in md


def test_invalid_gzip_is_failure_row():
    import gzip

    import pyarrow as pa

    from docling_ray.stages.extract import extract_batch

    bogus = gzip.compress(b"just some text, not a tar")
    out = extract_batch(pa.table({"html": [bogus],
                                  "format": ["mets_gbs"]}))
    assert out["status"].to_pylist() == ["failure"]


def test_mets_gbs_ray_pipeline(ray_session, raw):
    import pyarrow as pa
    import ray.data

    from docling_ray.stages.pdf import mets_gbs_pipeline

    table = pa.table({
        "doc_id": ["gbs-1"],
        "url": ["https://example.org/gbs-1"],
        "archive": pa.array([raw], pa.large_binary()),
    })
    out = mets_gbs_pipeline(ray.data.from_arrow(table)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_pages"] == 3
    assert "recently become prevalent that he who speaks" in out.loc[0, "text"]


def test_synthetic_mets_archive_matches_generator_expectation(ray_session):
    """TRUE golden: the synthetic METS archive generator emits its own
    expected document text (lossless integer-bbox hOCR round-trip of the
    pdf_pages construct stream); the full Ray pipeline must reproduce it
    on a FRESH seed — proving golden_mets.parquet is generator-derived,
    not a recording of the kernel."""
    import pyarrow as pa
    import ray.data

    from docling_ray.sources.mets_fixture import make_mets_archive
    from docling_ray.stages.pdf import mets_gbs_pipeline

    raw, expected = make_mets_archive(4, seed=1234)
    table = pa.table({
        "doc_id": ["gbs-syn"],
        "url": ["https://example.org/gbs-syn"],
        "archive": pa.array([raw], pa.large_binary()),
    })
    out = mets_gbs_pipeline(ray.data.from_arrow(table)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_pages"] == 4
    assert out.loc[0, "text"] == expected


def test_committed_mets_golden_is_generator_derived():
    import hashlib
    import os

    import pyarrow.parquet as pq

    from docling_ray.sources.mets_fixture import make_mets_archive

    _, expected = make_mets_archive(6, seed=7)
    g = pq.read_table(os.path.join(os.path.dirname(__file__), "data",
                                   "golden_mets.parquet"))
    assert g["doc_id"].to_pylist() == ["gbs-1"]
    assert g["n_pages"].to_pylist() == [6]
    assert g["text_md5"].to_pylist() == [
        hashlib.md5(expected.encode()).hexdigest()]

"""PDF-path (heuristic tier) tests: sanitize/de-hyphenation semantics,
cell→cluster assignment, reading order, and the page→doc Ray pipeline
against generator-computed expected text."""

import pytest

from docling_ray.kernels.pdf_assemble import (
    BBox,
    Cell,
    Cluster,
    assign_cells_to_clusters,
    drop_ocr_cells_overlapping,
    heuristic_clusters,
    page_parse_score,
    rate_text_quality,
    sanitize_text,
    sort_clusters,
)


def test_sanitize_dehyphenation():
    assert sanitize_text(["hyphen-", "ated word"]) == "hyphenated word"
    assert sanitize_text(["no hyphen", "next line"]) == "no hyphen next line"
    # trailing hyphen before punctuation does not join
    assert sanitize_text(["ends with -", "- dash"]) == "ends with - dash"
    assert sanitize_text(["curly ’quotes’"]) == "curly 'quotes'"
    assert sanitize_text([]) == ""


def test_text_quality_garbage():
    assert rate_text_quality("GLYPH<0041>GLYPH<0042>") == 0.0
    assert rate_text_quality("/G123/G456") == 0.0
    assert rate_text_quality("normal sentence with words") == 1.0
    assert rate_text_quality("bad � replacement") == 0.0


def test_page_parse_score_quantile():
    assert page_parse_score([1.0, 1.0, 0.0]) == pytest.approx(0.2)
    import math
    assert math.isnan(page_parse_score([]))


def _cell(i, text, l, t, r, b):
    return Cell(index=i, text=text, bbox=BBox(l, t, r, b))


def test_cell_cluster_assignment_best_overlap():
    clusters = [
        Cluster(id=0, label="text", bbox=BBox(0, 0, 100, 50)),
        Cluster(id=1, label="text", bbox=BBox(0, 60, 100, 120)),
    ]
    cells = [
        _cell(0, "top", 10, 10, 90, 20),
        _cell(1, "bottom", 10, 70, 90, 80),
        _cell(2, "outside", 500, 500, 600, 510),
    ]
    out = assign_cells_to_clusters(clusters, cells)
    assert [c.text for c in out[0].cells] == ["top"]
    assert [c.text for c in out[1].cells] == ["bottom"]


def test_cluster_sort_by_min_cell_index():
    a = Cluster(id=0, label="text", bbox=BBox(0, 100, 10, 110),
                cells=[_cell(5, "later", 0, 100, 10, 110)])
    b = Cluster(id=1, label="text", bbox=BBox(0, 0, 10, 10),
                cells=[_cell(2, "earlier", 0, 0, 10, 10)])
    assert [c.id for c in sort_clusters([a, b])] == [1, 0]


def test_ocr_anti_join():
    prog = [_cell(0, "text", 0, 0, 100, 20)]
    ocr = [_cell(100, "dup", 5, 5, 95, 18), _cell(101, "new", 0, 200, 50, 220)]
    kept = drop_ocr_cells_overlapping(prog, ocr)
    assert [c.text for c in kept] == ["new"]


def test_two_column_reading_order():
    # right-column cell is physically higher but must come after left column
    cells = [
        _cell(0, "left one", 36, 50, 280, 62),
        _cell(1, "left two", 36, 64, 280, 76),
        _cell(2, "right one", 320, 50, 570, 62),
    ]
    clusters = heuristic_clusters(cells, page_width=612.0)
    texts = [" ".join(c.text for c in cl.cells) for cl in clusters]
    assert texts == ["left one left two", "right one"]


def test_pdf_pipeline_end_to_end(ray_session):
    import ray.data

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.pdf import pdf_pages_pipeline

    table, expected = make_pdf_pages_table(12, seed=9)
    ds = ray.data.from_arrow(table)
    out = pdf_pages_pipeline(ds).to_pandas().set_index("doc_id")
    assert len(out) == 12
    for doc_id, exp_text in expected.items():
        assert out.loc[doc_id, "text"] == exp_text
    assert (out["parse_score"] == 1.0).all()


def test_document_limits_semantics():
    from docling_ray.stages.limits import (
        DocumentLimits,
        page_count_valid,
        page_in_range,
    )

    lim = DocumentLimits(max_num_pages=5, page_range=(2, 4))
    assert page_count_valid(5, lim)
    assert not page_count_valid(6, lim)     # too many pages: INVALID, not truncated
    assert not page_count_valid(1, lim)     # fewer pages than range start
    # 1-based inclusive range over 0-indexed pages
    assert [p for p in range(6) if page_in_range(p, lim)] == [1, 2, 3]


def test_pipeline_page_range_and_max_pages(ray_session):
    import ray.data

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.limits import DocumentLimits
    from docling_ray.stages.pdf import pdf_pages_pipeline

    table, _ = make_pdf_pages_table(12, seed=9)
    ds = ray.data.from_arrow(table)
    counts = table.group_by("doc_id").aggregate([("page_no", "count")])
    n_by_doc = dict(zip(counts["doc_id"].to_pylist(),
                        counts["page_no_count"].to_pylist()))
    lim = DocumentLimits(max_num_pages=2, page_range=(2, 2))
    out = pdf_pages_pipeline(ds, limits=lim).to_pandas()
    # only docs with exactly 2 pages survive (>=2 from range start, <=2 max)
    expected_docs = {d for d, n in n_by_doc.items() if n == 2}
    assert set(out["doc_id"]) == expected_docs
    assert (out["n_pages"] == 1).all()  # only page index 1 in range


def test_extract_batch_max_file_size():
    import pyarrow as pa

    from docling_ray.stages.extract import extract_batch
    from docling_ray.stages.limits import DocumentLimits

    small = b"<html><body><p>ok</p></body></html>"
    big = b"<html><body><p>" + b"x" * 10_000 + b"</p></body></html>"
    out = extract_batch(pa.table({"html": [small, big],
                                  "format": ["html", "html"]}),
                        limits=DocumentLimits(max_file_size=1000))
    assert out["status"].to_pylist() == ["success", "failure"]
    assert "exceeds limit" in out["error"].to_pylist()[1]


def test_document_timeout_flag_column():
    import pyarrow as pa

    from docling_ray.stages.extract import extract_batch
    from docling_ray.stages.limits import DocumentLimits

    batch = pa.table({"html": [b"<html><body><p>quick</p></body></html>"],
                      "format": ["html"]})
    out = extract_batch(batch, limits=DocumentLimits(document_timeout=60.0))
    assert out["timed_out"].to_pylist() == [False]
    assert out["doc_sec"][0].as_py() >= 0.0
    slow = extract_batch(batch, limits=DocumentLimits(document_timeout=0.0))
    assert slow["timed_out"].to_pylist() == [True]
    # without a timeout budget the columns are absent (schema unchanged)
    plain = extract_batch(batch)
    assert "timed_out" not in plain.column_names


def test_run_pdf_extract_resume(ray_session, tmp_path):
    import pyarrow.parquet as pq_

    from docling_ray.pipelines.pdf_pipeline import run_pdf_extract
    from docling_ray.sources.pdf_pages import make_pdf_pages_table

    src, dst = tmp_path / "pages", tmp_path / "out"
    src.mkdir()
    table, expected = make_pdf_pages_table(8, seed=21)
    # shard by doc so no doc spans files (the layout contract)
    doc_ids = sorted(set(table["doc_id"].to_pylist()))
    import pyarrow.compute as pc_

    for i in range(2):
        part = table.filter(pc_.is_in(
            table["doc_id"],
            value_set=__import__("pyarrow").array(doc_ids[i::2])))
        pq_.write_table(part, src / f"shard{i}.parquet")
    stats1 = run_pdf_extract(str(src), str(dst))
    # BOTH shards stream through ONE pipeline run (the run_extract
    # shape — no per-shard pipeline loop), into one partition per shard
    assert stats1["shards_processed"] == 2
    assert stats1["rows_done"] == 8
    import glob as _glob
    import os

    parts = sorted(os.path.basename(p) for p in
                   _glob.glob(str(dst / "data" / "shard=*")))
    assert parts == ["shard=shard0", "shard=shard1"]
    # the merged-stream reduce reproduces the generator's expected text
    # for every doc, and each doc landed in its own shard's partition
    got = {}
    for part in parts:
        for f in _glob.glob(str(dst / "data" / part / "*.parquet")):
            t = pq_.read_table(f, columns=["doc_id", "text"])
            for did, text in zip(t["doc_id"].to_pylist(),
                                 t["text"].to_pylist()):
                got[did] = (part, text)
    assert {d: t for d, (_, t) in got.items()} == expected
    for i, did in enumerate(doc_ids):
        assert got[did][0] == f"shard=shard{i % 2}"
    # resume: nothing left
    stats2 = run_pdf_extract(str(src), str(dst))
    assert stats2["shards_processed"] == 0 and stats2["rows_done"] == 8
    # crash simulation: drop one manifest line -> only that shard re-runs
    import json as _json

    mf = dst / "_manifest.jsonl"
    entries = [_json.loads(l) for l in mf.read_text().splitlines()]
    mf.write_text("\n".join(_json.dumps(e) for e in entries[1:]) + "\n")
    stats3 = run_pdf_extract(str(src), str(dst))
    assert stats3["shards_processed"] == 1 and stats3["rows_done"] == 8


def test_run_pdf_extract_group_checkpointing(ray_session, tmp_path,
                                             monkeypatch):
    """A crash mid-run costs at most one GROUP: with group_size=1, a
    failure while processing the second shard leaves the first shard's
    manifest mark intact, and the resumed run re-processes only the
    unfinished shards."""
    import pyarrow as pa_
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_

    import docling_ray.pipelines.pdf_pipeline as pp
    from docling_ray.sources.pdf_pages import make_pdf_pages_table

    src, dst = tmp_path / "pages", tmp_path / "out"
    src.mkdir()
    table, expected = make_pdf_pages_table(9, seed=33)
    doc_ids = sorted(set(table["doc_id"].to_pylist()))
    for i in range(3):
        part = table.filter(pc_.is_in(
            table["doc_id"], value_set=pa_.array(doc_ids[i::3])))
        pq_.write_table(part, src / f"s{i}.parquet")

    real = pp.pdf_pages_pipeline
    calls = {"n": 0}

    def exploding(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash in group 2")
        return real(*a, **k)

    monkeypatch.setattr(pp, "pdf_pages_pipeline", exploding)
    try:
        pp.run_pdf_extract(str(src), str(dst), group_size=1)
        raise AssertionError("expected the simulated crash")
    except RuntimeError:
        pass
    # group 1 is durable, groups 2-3 are not
    from docling_ray.state import manifest as mf
    assert set(mf.load_done(str(dst))) == {"s0.parquet"}

    monkeypatch.setattr(pp, "pdf_pages_pipeline", real)
    stats = pp.run_pdf_extract(str(src), str(dst), group_size=1)
    assert stats["shards_processed"] == 2      # only the lost groups
    assert stats["rows_done"] == 9
    got = {}
    import glob as _glob
    for f in _glob.glob(str(dst / "data" / "shard=*" / "*.parquet")):
        t = pq_.read_table(f, columns=["doc_id", "text"])
        got.update(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    assert got == expected

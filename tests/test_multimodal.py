"""Multimodal stage plumbing tests (decode stub, resize, frame sampling)."""

import pytest

from docling_ray.stages.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    ImageResizeStage,
    image_pipeline,
    make_media_table,
)


def test_media_table_deterministic():
    a = make_media_table(10, seed=1)
    b = make_media_table(10, seed=1)
    assert a.equals(b)


def test_image_decode_pipeline(ray_session):
    import ray.data

    ds = ray.data.from_arrow(make_media_table(24, seed=3))
    out = image_pipeline(ds).to_pandas()
    assert len(out) == 24
    assert out["decode_ok"].all()
    assert "payload" not in out.columns  # heavy bytes dropped after decode
    assert all(len(v) == 3 for v in out["mean_rgb"])
    # deterministic features
    out2 = image_pipeline(ray.data.from_arrow(make_media_table(24, seed=3))).to_pandas()
    assert list(map(list, out["mean_rgb"])) == list(map(list, out2["mean_rgb"]))


def test_image_decode_strict_raises():
    table = make_media_table(2, seed=5)
    stage = ImageDecodeStage(strict=True)
    with pytest.raises(NotImplementedError):
        stage(table)


def test_resize_caps_dimensions():
    table = make_media_table(16, seed=7)
    out = ImageResizeStage(max_side=128)(table)
    assert out["width"].to_pandas().max() <= 128
    assert out["height"].to_pandas().max() <= 128


def test_frame_sampling_explodes(ray_session):
    import ray.data

    table = make_media_table(5, seed=9, kind="video")
    ds = ray.data.from_arrow(table)
    frames = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                            concurrency=1).to_pandas()
    # 1 fps sampling over 1-10s clips → 1..10 frames per clip
    counts = frames.groupby("media_id").size()
    assert len(counts) == 5
    durations = dict(zip(table["media_id"].to_pylist(),
                         table["duration_ms"].to_pylist()))
    for media_id, count in counts.items():
        assert count == max(1, -(-durations[media_id] // 1000))


def test_multimodal_page_export_pipeline(ray_session):
    """Page-aligned (text, md, doctags, cells, segments) tuples
    (utils/export.py:13-146 shape) over the synthetic parsed pages."""
    import ray.data

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.pdf import multimodal_export_pipeline

    table, expected = make_pdf_pages_table(6, seed=5)
    out = multimodal_export_pipeline(
        ray.data.from_arrow(table)).to_pandas()
    # one row per input page
    assert len(out) == table.num_rows
    row = out.sort_values(["doc_id", "page_no"]).iloc[0]
    assert row["content_text"].endswith(" ")          # trailing-space accum
    assert row["content_md"]                          # per-page markdown
    assert "<loc_" in row["content_dt"] or row["content_dt"]
    assert len(row["cells"]) > 0
    for cell in row["cells"]:
        l, t, r, b = cell["bbox"]
        assert 0.0 <= l <= r <= 1.0 and 0.0 <= t <= b <= 1.0  # normalized
        assert cell["ocr"] is False or cell["ocr"] is True
    segs = row["segments"]
    assert [s["index_in_doc"] for s in segs] == sorted(
        s["index_in_doc"] for s in segs)
    assert all(s["label"] for s in segs)
    # doc-global indices continue across pages of the same doc
    doc_rows = out[out["doc_id"] == row["doc_id"]].sort_values("page_no")
    flat = [s["index_in_doc"] for _, r in doc_rows.iterrows()
            for s in r["segments"]]
    assert flat == list(range(len(flat)))


def test_multimodal_segments_carry_table_html():
    """Table clusters produce html payloads in segments (review fix)."""
    from docling_ray.kernels.multimodal_export import multimodal_page_tuples
    from docling_ray.kernels.pdf_assemble import BBox, Cell, Cluster, assemble_page_text

    table_cl = Cluster(id=0, label="table", bbox=BBox(10, 10, 200, 60))
    table_cl.cells = [
        Cell(index=0, text="H1", bbox=BBox(10, 10, 60, 22)),
        Cell(index=1, text="H2", bbox=BBox(80, 10, 140, 22)),
        Cell(index=2, text="v1", bbox=BBox(10, 30, 60, 42)),
        Cell(index=3, text="v2", bbox=BBox(80, 30, 140, 42)),
    ]
    els = assemble_page_text([table_cl])
    pages = [{"page_no": 0, "width": 612.0, "height": 792.0, "cells": [],
              "elements": [{"cluster_id": e["cluster_id"], "label": e["label"],
                            "l": 10, "t": 10, "r": 200, "b": 60,
                            "text": e["text"],
                            "table_json": e.get("table_json", "")}
                           for e in els]}]
    rec = next(iter(multimodal_page_tuples(pages)))
    seg = rec["segments"][0]
    assert seg["label"] == "table"
    assert seg["data"] and "H1" in seg["data"][0]["html_seq"]

"""Table-driven tests for the layout postprocessor rule port
(reference: docling/utils/layout_postprocessor.py)."""

from docling_ray.kernels.layout_postprocess import (
    LayoutOptions,
    postprocess_layout,
)
from docling_ray.kernels.pdf_assemble import BBox, Cell, Cluster


def _cell(i, text, l, t, r, b, conf=1.0):
    return Cell(index=i, text=text, bbox=BBox(l, t, r, b), confidence=conf)


def _cluster(cid, label, l, t, r, b, conf=1.0):
    return Cluster(id=cid, label=label, bbox=BBox(l, t, r, b), confidence=conf)


def test_confidence_threshold_filters():
    cells = [_cell(0, "hello", 0, 0, 100, 10)]
    clusters = [_cluster(0, "text", 0, 0, 100, 10, conf=0.3)]
    out = postprocess_layout(cells, clusters, 612, 792)
    # low-confidence cluster dropped; orphan text cluster takes the cell
    assert len(out) == 1
    assert out[0].label == "text"
    assert out[0].id != 0
    assert [c.text for c in out[0].cells] == ["hello"]


def test_title_remap():
    cells = [_cell(0, "Heading", 0, 0, 100, 10)]
    clusters = [_cluster(0, "title", 0, 0, 100, 10, conf=0.9)]
    out = postprocess_layout(cells, clusters, 612, 792)
    assert out[0].label == "section_header"


def test_list_item_beats_similar_text():
    # two similar-area proposals, each owning a cell: the list item wins the
    # union-find group via preference rule 1, and the text's cell merges in
    cells = [_cell(0, "item", 0, 0, 100, 10), _cell(1, "b", 1, 0, 101, 10)]
    clusters = [
        _cluster(0, "text", 0, 0, 100, 10, conf=0.6),
        _cluster(1, "list_item", 1, 0, 101, 10, conf=0.9),
    ]
    out = postprocess_layout(cells, clusters, 612, 792)
    assert len(out) == 1
    assert out[0].label == "list_item"
    assert sorted(c.index for c in out[0].cells) == [0, 1]


def test_full_page_picture_dropped():
    cells = [_cell(0, "text", 10, 10, 50, 20)]
    clusters = [
        _cluster(0, "text", 10, 10, 50, 20, conf=0.9),
        _cluster(1, "picture", 0, 0, 600, 780, conf=0.9),  # >90% page area
    ]
    out = postprocess_layout(cells, clusters, 612, 792)
    assert all(c.label != "picture" for c in out)


def test_key_value_dropped_over_table():
    cells = [_cell(0, "v", 0, 0, 100, 50)]
    clusters = [
        _cluster(0, "table", 0, 0, 100, 50, conf=0.9),
        _cluster(1, "key_value_region", 1, 1, 99, 49, conf=0.9),
    ]
    out = postprocess_layout(cells, clusters, 612, 792)
    labels = [c.label for c in out]
    assert "table" in labels and "key_value_region" not in labels


def test_wrapper_captures_children():
    cells = [_cell(0, "a", 5, 5, 50, 15), _cell(1, "b", 5, 20, 50, 30)]
    clusters = [
        _cluster(0, "text", 5, 5, 50, 15, conf=0.9),
        _cluster(1, "text", 5, 20, 50, 30, conf=0.9),
        _cluster(2, "form", 0, 0, 60, 40, conf=0.9),
    ]
    out = postprocess_layout(cells, clusters, 612, 792)
    forms = [c for c in out if c.label == "form"]
    assert len(forms) == 1
    assert len(forms[0].children) == 2
    # contained regular clusters removed from the top level
    assert all(c.label != "text" for c in out)
    # form bbox tightened to children
    assert forms[0].bbox.l == 5 and forms[0].bbox.r == 50


def test_bbox_tightens_to_cells():
    cells = [_cell(0, "x", 10, 10, 40, 20)]
    clusters = [_cluster(0, "text", 0, 0, 200, 100, conf=0.9)]
    out = postprocess_layout(cells, clusters, 612, 792)
    bbox = out[0].bbox
    assert (bbox.l, bbox.t, bbox.r, bbox.b) == (10, 10, 40, 20)


def test_keep_empty_clusters_option():
    clusters = [_cluster(0, "text", 0, 0, 10, 10, conf=0.9)]
    out = postprocess_layout([], clusters, 612, 792,
                             LayoutOptions(keep_empty_clusters=True))
    assert len(out) == 1
    out2 = postprocess_layout([], clusters, 612, 792)
    assert len(out2) == 0

"""Table-driven tests for the reading-order model: XY-cut ordering,
caption/footnote attachment, merges, and the document-build port
(``/root/reference/docling/models/readingorder_model.py:106-381``
semantics)."""

import pytest

from docling_ray.kernels.reading_order import (
    ROElement,
    build_document,
    predict_merges,
    predict_reading_order,
    predict_to_captions,
    predict_to_footnotes,
    reading_order_document,
)


def el(cid, label, l, t, r, b, text="", page_no=0, **payload):
    return ROElement(cid=cid, page_no=page_no, label=label,
                     l=l, t=t, r=r, b=b, text=text, payload=payload)


# -- ordering ---------------------------------------------------------------

def test_xy_cut_title_then_columns():
    """Full-width title first, then left column fully, then right column
    (ragged columns — no full-width horizontal band below the title)."""
    els = [
        el(0, "text", 320, 100, 570, 450, "right"),
        el(1, "title", 36, 40, 570, 60, "title"),
        el(2, "text", 36, 100, 280, 300, "left"),
        el(3, "text", 36, 320, 280, 500, "left2"),
    ]
    order = [e.text for e in predict_reading_order(els)]
    assert order == ["title", "left", "left2", "right"]


def test_xy_cut_full_width_band_splits_sections():
    """A horizontal whitespace band across the whole page separates
    stacked sections (standard XY-cut semantics)."""
    els = [
        el(0, "text", 320, 100, 570, 300, "sec1-right"),
        el(1, "text", 36, 100, 280, 300, "sec1-left"),
        el(2, "text", 36, 340, 570, 500, "sec2"),
    ]
    order = [e.text for e in predict_reading_order(els)]
    assert order == ["sec1-left", "sec1-right", "sec2"]


def test_xy_cut_pages_ascending():
    els = [
        el(0, "text", 36, 50, 570, 70, "p2", page_no=1),
        el(1, "text", 36, 50, 570, 70, "p1", page_no=0),
    ]
    assert [e.text for e in predict_reading_order(els)] == ["p1", "p2"]


def test_xy_cut_three_columns():
    els = [el(i, "text", 36 + i * 200, 50, 36 + i * 200 + 180, 700, f"c{i}")
           for i in (2, 0, 1)]
    assert [e.text for e in predict_reading_order(els)] == ["c0", "c1", "c2"]


# -- captions / footnotes ---------------------------------------------------

def test_caption_attaches_to_nearest_overlapping_target():
    els = predict_reading_order([
        el(0, "table", 36, 100, 570, 300),
        el(1, "caption", 36, 305, 570, 320, "Table 1"),
        el(2, "picture", 36, 400, 570, 600),
    ])
    mapping = predict_to_captions(els)
    assert mapping == {0: [1]}


def test_caption_requires_horizontal_overlap():
    els = predict_reading_order([
        el(0, "table", 36, 100, 280, 300),
        el(1, "caption", 320, 100, 570, 120, "elsewhere"),
    ])
    # no horizontal overlap with the table: unattached even if close in y
    assert predict_to_captions(els) == {}


def test_footnote_attaches_to_element_above_only():
    els = predict_reading_order([
        el(0, "table", 36, 100, 570, 300),
        el(1, "footnote", 36, 310, 570, 325, "a) note"),
        el(2, "table", 36, 400, 570, 500),
    ])
    assert predict_to_footnotes(els) == {0: [1]}


# -- merges -----------------------------------------------------------------

def test_merge_across_columns_mid_sentence():
    els = predict_reading_order([
        el(0, "text", 36, 50, 280, 700, "First sentence. The quick brown"),
        el(1, "text", 320, 50, 570, 700, "fox jumps over. More text."),
    ])
    assert predict_merges(els) == {0: [1]}


def test_no_merge_when_terminated_or_capitalized():
    done = predict_reading_order([
        el(0, "text", 36, 50, 280, 700, "First sentence ends."),
        el(1, "text", 320, 50, 570, 700, "New paragraph starts."),
    ])
    assert predict_merges(done) == {}
    cap = predict_reading_order([
        el(0, "text", 36, 50, 280, 700, "Unterminated sentence here. And"),
        el(1, "text", 320, 50, 570, 700, "Capitalized start."),
    ])
    assert predict_merges(cap) == {}


def test_no_merge_without_sentence_punctuation():
    els = predict_reading_order([
        el(0, "text", 36, 50, 280, 700, "word word word"),
        el(1, "text", 320, 50, 570, 700, "word word"),
    ])
    assert predict_merges(els) == {}


def test_merge_chain_collapses_to_head():
    els = predict_reading_order([
        el(0, "text", 36, 50, 280, 700, "Start of it. part one goes",
           page_no=0),
        el(1, "text", 320, 50, 570, 700, "part two. and it keeps on",
           page_no=0),
        el(2, "text", 36, 50, 570, 700, "part three ends here.", page_no=1),
    ])
    assert predict_merges(els) == {0: [1, 2]}


# -- document build ---------------------------------------------------------

def test_build_document_merge_join_and_prov():
    els = predict_reading_order([
        el(0, "text", 36, 50, 280, 700, "Broken. sentence goes"),
        el(1, "text", 320, 50, 570, 700, "on here."),
    ])
    doc = build_document("d", els, {}, {}, predict_merges(els))
    items = [item for item, _ in doc.iterate()]
    assert len(items) == 1
    assert items[0].text == "Broken. sentence goes on here."
    assert len(items[0].prov) == 2
    start = len("Broken. sentence goes") + 1
    assert items[0].prov[1]["charspan"] == (start, start + len("on here."))


def test_build_document_list_group_lifecycle():
    els = [
        el(0, "list_item", 36, 50, 570, 60, "one"),
        el(1, "list_item", 36, 62, 570, 72, "two"),
        el(2, "text", 36, 80, 570, 92, "interlude."),
        el(3, "list_item", 36, 100, 570, 112, "fresh"),
    ]
    doc = reading_order_document("d", els)
    labels = [(item.label, depth) for item, depth in doc.iterate()]
    # two separate list groups, reset by the text element
    assert labels == [("list", 1), ("list_item", 2), ("list_item", 2),
                      ("text", 1), ("list", 1), ("list_item", 2)]


def test_build_document_furniture_layer_and_caption_children():
    els = [
        el(0, "page_header", 36, 10, 570, 25, "Running Head"),
        el(1, "table", 36, 100, 570, 300),
        el(2, "caption", 36, 305, 570, 320, "Table 1: stats"),
        el(3, "footnote", 36, 325, 570, 340, "a) detail"),
    ]
    doc = reading_order_document("d", els)
    items = {item.label: item for item, _ in doc.iterate()}
    assert items["page_header"].content_layer == "furniture"
    table = items["table"]
    # first caption lands on item.caption (what serializers consume);
    # footnotes are tree children
    assert table.caption is not None
    assert table.caption.text == "Table 1: stats"
    assert [c.label for c in table.children] == ["footnote"]
    # captions/footnotes are consumed by the table — not top-level items
    top = [item.label for item, depth in doc.iterate() if depth == 1]
    assert top == ["page_header", "table"]
    # and the caption text survives into markdown
    from docling_ray.kernels.markdown import to_markdown

    assert "Table 1: stats" in to_markdown(doc)


def test_build_document_formula_and_container():
    els = [
        el(0, "formula", 36, 50, 570, 70, "E = mc^2"),
        el(1, "key_value_region", 36, 100, 570, 200,
           children=[{"label": "text", "cell_texts": ["k \x02 v"]}]),
    ]
    doc = reading_order_document("d", els)
    items = [item for item, _ in doc.iterate()]
    formula = items[0]
    assert formula.label == "formula"
    assert formula.text == "" and formula.orig == "E = mc^2"
    group = items[1]
    assert group.label == "key_value_area"
    assert group.children[0].text == "k - v"  # \x02 -> "-" fix

"""VLM pipeline surface + doctags parser.

Parser contract: ``to_doctags(from_doctags(s)) == s`` byte-exactly for
every writer-grammar string — proven over all reference groundtruth
doctags files (which exercise tables with spans, nested lists, code with
captions, formulas, pictures, multi-page breaks and RTL text).

Stage contract (mirrors the enrichment/layout contract suites): model
loads once per actor (counter climbs), all three response formats
converge to the same document text on the synthetic corpus, fence
stripping matches the reference regex, force_backend_text re-reads item
text from cells under the predicted boxes.
"""

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from docling_ray.kernels.doctags import to_doctags
from docling_ray.kernels.doctags_parse import from_doctags
from docling_ray.sources.pdf_pages import make_pdf_pages_table
from docling_ray.stages.vlm import (
    StubVlmModel,
    VlmOptions,
    VlmPageStage,
    strip_code_fence,
    vlm_assemble_document,
    vlm_pipeline,
)

GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")
GT_FILES = sorted(p.name for p in GT_DIR.glob("*.doctags.txt")) \
    if GT_DIR.exists() else []


# -- doctags parser ----------------------------------------------------------

@pytest.mark.parametrize("name", GT_FILES)
def test_doctags_parse_fixpoint(name):
    raw = (GT_DIR / name).read_text()
    assert to_doctags(from_doctags(raw)) == raw


def test_doctags_parse_corpus_nonempty():
    assert len(GT_FILES) >= 12


def test_doctags_parse_structures():
    s = ("<doctag><title><loc_10><loc_20><loc_30><loc_40>T</title>\n"
         "<ordered_list><list_item><loc_1><loc_2><loc_3><loc_4>a</list_item>\n"
         "<list_item>b</list_item>\n"
         "</ordered_list>\n"
         "<page_break>\n"
         "<otsl><loc_5><loc_6><loc_7><loc_8>"
         "<ched>h1<ched>h2<nl><fcel>x<lcel><nl>"
         "<caption><loc_1><loc_1><loc_2><loc_2>tab cap</caption></otsl>\n"
         "<code><loc_0><loc_0><loc_9><loc_9><_py_>print(1)</code>\n"
         "<picture><loc_1><loc_2><loc_3><loc_4>"
         "<caption>pic cap</caption></picture>\n"
         "</doctag>")
    doc = from_doctags(s)
    labels = [item.label for item, _ in doc.iterate()]
    assert labels[0] == "title"
    assert "list" in labels and "list_item" in labels
    items = {item.label: item for item, _ in doc.iterate()}
    table = items["table"]
    assert table.data.num_rows == 2 and table.data.num_cols == 2
    spans = {(c.text, c.col_span) for c in table.data.table_cells}
    assert ("x", 2) in spans            # <lcel> widened the fcel
    assert table.caption.text == "tab cap"
    assert items["code"].code_language == "py"
    assert items["picture"].caption.text == "pic cap"
    # list items on page 1, post-break elements on page 2
    first_li = next(item for item, _ in doc.iterate()
                    if item.label == "list_item")
    assert first_li.prov[0][0] == 1
    assert table.prov[0][0] == 2
    # the whole structure is itself a writer fixpoint
    assert to_doctags(from_doctags(to_doctags(doc))) == to_doctags(doc)


def test_doctags_parse_tolerates_garbage():
    doc = from_doctags("<doctag>stray <unclosed><text>ok</text></doctag>")
    texts = [item.text for item, _ in doc.iterate()
             if getattr(item, "text", None)]
    assert "ok" in texts


# -- stub model + stage ------------------------------------------------------

def _pages(n_docs=6):
    table, _ = make_pdf_pages_table(n_docs, seed=42)
    return table


def test_formats_converge_to_same_text():
    table = _pages()
    texts = {}
    for fmt in ("doctags", "markdown", "html"):
        opts = VlmOptions(response_format=fmt)
        out = VlmPageStage(opts)(table)
        d0 = out["doc_id"][0].as_py()
        g = out.filter(pc.equal(out["doc_id"], d0))
        texts[fmt] = vlm_assemble_document(g, opts)["text"][0].as_py()
    assert texts["doctags"] == texts["markdown"] == texts["html"]
    assert texts["doctags"]


def test_stub_doctags_parse_back():
    table = _pages(2)
    model = StubVlmModel(VlmOptions())
    cells = table["cells"][0].as_py()
    resp = model.predict_page(cells, 612.0, 792.0, page_no=0)
    doc = from_doctags(resp)
    items = list(doc.iterate())
    assert items[0][0].label == "title"
    assert len(items) == len(cells)


def test_force_backend_text_rereads_cells():
    table = _pages(4)
    opts = VlmOptions(force_backend_text=True)
    out = VlmPageStage(opts)(table)
    assert "cells" in out.column_names   # kept for the re-read
    d0 = out["doc_id"][0].as_py()
    g = out.filter(pc.equal(out["doc_id"], d0))
    res = vlm_assemble_document(g, opts)
    # stub boxes cover exactly their cells, so the re-read reproduces them
    base = vlm_assemble_document(
        VlmPageStage(VlmOptions())(table).filter(
            pc.equal(out["doc_id"], d0)), VlmOptions())
    assert res["text"][0].as_py() == base["text"][0].as_py()


def test_cells_dropped_without_backend_text():
    out = VlmPageStage(VlmOptions())(_pages(2))
    assert "cells" not in out.column_names


def test_strip_code_fence():
    assert strip_code_fence("```md\n# hi\n```") == "# hi\n"
    assert strip_code_fence("```\nx\n```\n\n") == "x\n"
    assert strip_code_fence("no fence") == "no fence"


def test_gated_kind_raises():
    stage = VlmPageStage(VlmOptions(kind="transformers"))
    with pytest.raises(NotImplementedError):
        stage.model(None)


def test_bad_response_format():
    with pytest.raises(ValueError):
        VlmOptions(response_format="yaml")


# -- pipeline via Ray --------------------------------------------------------

def test_vlm_pipeline_matches_golden(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    table, _ = make_pdf_pages_table(40, seed=42)
    out = vlm_pipeline(ray.data.from_arrow(table)) \
        .select_columns(["doc_id", "n_pages", "text_md5"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    golden = pq.read_table(
        Path(__file__).parent / "data" / "golden_vlm.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == golden["doc_id"].tolist()
    assert out["n_pages"].tolist() == golden["n_pages"].tolist()
    assert out["text_md5"].tolist() == golden["text_md5"].tolist()


def test_actor_reuse_across_blocks(ray_session):
    import ray.data

    table, _ = make_pdf_pages_table(24, seed=42)
    ds = ray.data.from_arrow(table).repartition(6)
    out = ds.map_batches(VlmPageStage, batch_format="pyarrow",
                         concurrency=1,
                         fn_constructor_kwargs={"options": VlmOptions()})
    seen = max(out.to_pandas()["n_batches_since_load"])
    assert seen > 1, "per-batch model load would pin the counter at 1"


# -- randomized writer↔parser round trip -------------------------------------

def _random_doc(seed: int):
    """Random DocTree over the full writer vocabulary: provenanced text
    across pages, section levels, code with language + caption, formulas,
    pictures with captions, span tables, nested ordered/unordered lists."""
    import random

    from docling_ray.doctree import DocTree, TableCell, TableData

    rng = random.Random(seed)
    doc = DocTree()
    n_pages = rng.randint(1, 3)
    for p in range(1, n_pages + 1):
        doc.pages[p] = (500.0, 500.0)

    def prov(p):
        x0, y0 = rng.randint(0, 400), rng.randint(0, 400)
        return [(p, float(x0), 500.0 - y0, float(x0 + rng.randint(5, 90)),
                 500.0 - (y0 + rng.randint(5, 90)))]

    page = 1
    doc.add_title("Doc %d" % seed).prov = prov(page)
    for _ in range(rng.randint(3, 10)):
        page = min(n_pages, page + (rng.random() < 0.3))
        kind = rng.choice(["text", "heading", "code", "formula",
                           "picture", "table", "list"])
        if kind == "text":
            doc.add_text(text=f"body {rng.randint(0, 999)}").prov = prov(page)
        elif kind == "heading":
            doc.add_heading(None, f"h{rng.randint(0, 99)}",
                            level=rng.randint(1, 3)).prov = prov(page)
        elif kind == "code":
            item = doc.add_code(f"print({rng.randint(0, 9)})")
            item.code_language = rng.choice(["py", "unknown", "c"])
            if rng.random() < 0.5:
                from docling_ray.doctree import BODY, TextItem

                cap = TextItem(None, BODY, "caption", "listing cap")
                cap.prov = prov(page)
                item.caption = cap
            item.prov = prov(page)
        elif kind == "formula":
            doc.add_text(label="formula", text="E = mc^2").prov = prov(page)
        elif kind == "picture":
            from docling_ray.doctree import BODY, TextItem

            cap = None
            if rng.random() < 0.7:
                cap = TextItem(None, BODY, "caption", "fig cap")
                cap.prov = prov(page)
            doc.add_picture(caption=cap).prov = prov(page)
        elif kind == "table":
            rows, cols = rng.randint(2, 4), rng.randint(2, 4)
            cells, taken = [], set()
            for r in range(rows):
                for c in range(cols):
                    if (r, c) in taken or rng.random() < 0.2:
                        continue
                    rs = min(rng.choice([1, 1, 2]), rows - r)
                    cs = min(rng.choice([1, 1, 2]), cols - c)
                    if any((rr, cc) in taken for rr in range(r, r + rs)
                           for cc in range(c, c + cs)):
                        rs = cs = 1
                    for rr in range(r, r + rs):
                        for cc in range(c, c + cs):
                            taken.add((rr, cc))
                    cells.append(TableCell(
                        text=f"c{r}{c}", start_row=r, end_row=r + rs,
                        start_col=c, end_col=c + cs,
                        row_span=rs, col_span=cs,
                        column_header=r == 0 and rng.random() < 0.5))
            doc.add_table(TableData(num_rows=rows, num_cols=cols,
                                    table_cells=cells)).prov = prov(page)
        else:
            group = doc.add_list_group()
            ordered = rng.random() < 0.5
            for i in range(rng.randint(1, 4)):
                li = doc.add_list_item(f"item {i}", enumerated=ordered,
                                       parent=group)
                li.prov = prov(page)
                if rng.random() < 0.3:
                    sub = doc.add_list_group(parent=li)
                    doc.add_list_item("sub", enumerated=False,
                                      parent=sub).prov = prov(page)
    return doc


@pytest.mark.parametrize("seed", range(40))
def test_doctags_random_round_trip(seed):
    doc = _random_doc(seed)
    s = to_doctags(doc)
    assert to_doctags(from_doctags(s)) == s

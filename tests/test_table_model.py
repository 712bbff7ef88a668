"""Real-weights table-header classifier through the TableFormer slot
(kernels/table_model.py + stages/pdf.py::PageAssembleLearnedStage)."""

import os

import numpy as np
import pyarrow as pa

from docling_ray.kernels.pdf_assemble import BBox, Cell
from docling_ray.kernels.table_structure import infer_table_structure

WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "docling_ray", "state", "table_weights.npz")


def test_training_is_deterministic_and_generalizes(tmp_path):
    from docling_ray.kernels.table_model import (NumpyTableModel,
                                                 synthesize_training_set,
                                                 train_table_weights)

    p1 = train_table_weights(str(tmp_path / "w1.npz"))
    p2 = train_table_weights(str(tmp_path / "w2.npz"))
    m1, m2 = NumpyTableModel(p1), NumpyTableModel(p2)
    assert np.array_equal(m1.W, m2.W) and m1.b == m2.b
    # the COMMITTED artifact matches a fresh deterministic train
    mc = NumpyTableModel(WEIGHTS)
    assert np.allclose(mc.W, m1.W) and abs(mc.b - m1.b) < 1e-12
    # held-out seed: the boundary is learned, not memorized
    X, y = synthesize_training_set(seed=999)
    acc = (mc.predict_header(X) == (y == 1)).mean()
    assert acc > 0.95, acc


def _table_cells(rows: list[list[str]], header_taller: bool = True):
    cells, idx = [], 0
    for r, texts in enumerate(rows):
        top = 100.0 + r * 16.0
        h = 14.0 if (r == 0 and header_taller) else 11.0
        for c, text in enumerate(texts):
            cells.append(Cell(index=idx, text=text,
                              bbox=BBox(50.0 + c * 80.0, top,
                                        120.0 + c * 80.0, top + h)))
            idx += 1
    return cells


def test_learned_header_vs_geometric_rule():
    from docling_ray.kernels.table_model import NumpyTableModel

    model = NumpyTableModel(WEIGHTS)
    # text header over numeric body: learned agrees with the geometric
    # default (row 0 is the header)
    labeled = _table_cells([["Region", "Sales", "Units"],
                            ["12.5", "100", "7"],
                            ["8.1", "250", "3"]])
    ts = infer_table_structure(labeled, header_model=model)
    got = {(c.start_row, c.column_header) for c in ts.data.table_cells}
    assert (0, True) in got and (1, False) in got and (2, False) in got

    # ALL-numeric table: the learned tier correctly flags NO header —
    # where the geometric rule blindly marks row 0
    numeric = _table_cells([["12.5", "100", "7"],
                            ["8.1", "250", "3"],
                            ["9.9", "410", "5"]], header_taller=False)
    ts_geo = infer_table_structure(numeric)
    ts_ml = infer_table_structure(numeric, header_model=model)
    assert any(c.column_header for c in ts_geo.data.table_cells)
    assert not any(c.column_header for c in ts_ml.data.table_cells)


def test_assemble_learned_stage_actor_reuse(ray_session):
    import ray

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.pdf import (LayoutHeuristicStage,
                                        PageAssembleLearnedStage,
                                        page_parse_batch)

    table, _ = make_pdf_pages_table(12, seed=42)
    ds = ray.data.from_arrow(table).repartition(6)
    ds = ds.map_batches(page_parse_batch, batch_format="pyarrow")
    ds = ds.map_batches(LayoutHeuristicStage, batch_format="pyarrow",
                        concurrency=1)
    out = ds.map_batches(
        PageAssembleLearnedStage, batch_format="pyarrow",
        batch_size=4, concurrency=(1, 1),
        fn_constructor_kwargs={"weights_path": WEIGHTS}).to_pandas()
    assert len(out) == len(table)
    # one weight load served many batches — a per-batch load pins it at 1
    assert max(out["n_assemble_batches_since_load"]) > 1


def test_pipeline_with_table_weights_matches_default_on_tableless_corpus(
        ray_session):
    """The synthetic page corpus has no table clusters, so the learned
    tier must be a byte-level no-op on it — the golden stays safe."""
    import ray

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.pdf import pdf_pages_pipeline

    table, _ = make_pdf_pages_table(10, seed=42)
    base = pdf_pages_pipeline(ray.data.from_arrow(table)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    learned = pdf_pages_pipeline(ray.data.from_arrow(table),
                                 table_weights_path=WEIGHTS).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert base["text"].tolist() == learned["text"].tolist()
    assert base["n_pages"].tolist() == learned["n_pages"].tolist()

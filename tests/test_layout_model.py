"""Real-weights layout classifier through the layout actor slot
(kernels/layout_model.py + stages/pdf.py::LayoutLearnedStage)."""

import os

import numpy as np
import pyarrow as pa

WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "docling_ray", "state", "layout_weights.npz")


def test_training_is_deterministic_and_generalizes(tmp_path):
    from docling_ray.kernels.layout_model import (NumpyLayoutModel,
                                                  synthesize_training_set,
                                                  train_layout_weights)

    p1 = train_layout_weights(str(tmp_path / "w1.npz"))
    p2 = train_layout_weights(str(tmp_path / "w2.npz"))
    m1, m2 = NumpyLayoutModel(p1), NumpyLayoutModel(p2)
    assert np.array_equal(m1.W, m2.W) and m1.b == m2.b
    # the COMMITTED artifact matches a fresh deterministic train
    mc = NumpyLayoutModel(WEIGHTS)
    assert np.allclose(mc.W, m1.W) and abs(mc.b - m1.b) < 1e-12
    # held-out seed: the boundary is learned, not memorized
    X, y = synthesize_training_set(seed=123)
    acc = (mc.predict_heading(X) == (y == 1)).mean()
    assert acc > 0.95, acc


def _pages_table(n_pages: int) -> pa.Table:
    """Synthetic pages where the FIRST cell of each page is
    heading-shaped (tall, short text, near top) and the rest are body
    lines — the learned model must label exactly the heading cluster."""
    from docling_ray.sources.pdf_pages import CELL_STRUCT, SCHEMA

    rows = {name: [] for name in SCHEMA.names}
    for p in range(n_pages):
        cells = [{
            "index": 0, "text": "Section Heading",
            "l": 40.0, "t": 50.0, "r": 260.0, "b": 69.0,   # h=19
            "from_ocr": False, "confidence": 1.0}]
        for i in range(1, 6):
            top = 90.0 + i * 14.0
            cells.append({
                "index": i,
                "text": "body line with considerably longer running text",
                "l": 40.0, "t": top, "r": 500.0, "b": top + 12.0,
                "from_ocr": False, "confidence": 1.0})
        rows["doc_id"].append(f"d{p}")
        rows["url"].append(f"https://x.example/d{p}")
        rows["page_no"].append(0)
        rows["width"].append(612.0)
        rows["height"].append(792.0)
        rows["cells"].append(cells)
    return pa.table(rows, schema=SCHEMA)


def test_learned_stage_end_to_end_with_actor_reuse(ray_session):
    import ray

    from docling_ray.stages.pdf import LayoutLearnedStage

    t = _pages_table(12)
    ds = ray.data.from_arrow(t).repartition(6)   # > 1 batch per actor
    out = ds.map_batches(
        LayoutLearnedStage, batch_format="pyarrow",
        batch_size=2, concurrency=(1, 1),
        fn_constructor_kwargs={"weights_path": WEIGHTS}).take_all()
    assert len(out) == 12
    for row in out:
        labels = [cl["label"] for cl in row["clusters"]]
        # heading cluster found by the LEARNED weights; body stays text
        assert "section_header" in labels
        assert labels.count("section_header") == 1, labels
    # actor reuse: ONE weight load served many batches — with a
    # per-batch load every row would report counter == 1
    counters = [r["n_batches_since_load"] for r in out]
    assert max(counters) > 1, counters


def test_learned_stage_local_determinism():
    from docling_ray.stages.pdf import LayoutLearnedStage

    t = _pages_table(3)
    s1 = LayoutLearnedStage(weights_path=WEIGHTS)
    s2 = LayoutLearnedStage(weights_path=WEIGHTS)
    a = s1(t)["clusters"].to_pylist()
    b = s2(t)["clusters"].to_pylist()
    assert a == b

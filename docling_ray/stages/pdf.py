"""Ray Data stages for the PDF (paginated) path — heuristic tier.

Pipeline shape (SURVEY.md §3.2, Ray-first):

    pages table → map_batches(PageParseStage)        # quality score
               → map_batches(LayoutHeuristicStage)   # cells → clusters
               → map_batches(assemble_page_batch)    # clusters → page text
               → bucketed_doc_groups(assemble_document)
                                                     # hash(doc_id) % P
                                                     # shuffle; sort page_no,
                                                     # doc text + confidence
                                                     # rollup per doc run

The layout stage is a callable *class* (actor pool) even though the
heuristic tier holds no weights — a learned layout model drops into the same
``map_batches(Cls, concurrency=...)`` slot with zero pipeline changes
(mirrors ``/root/reference/docling/models/layout_model.py:49-87``'s
load-once-in-init contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_ray.kernels.pdf_assemble import (
    BBox,
    Cell,
    assemble_page_text,
    assign_cells_to_clusters,
    heuristic_clusters,
    page_parse_score,
    rate_text_quality,
)


def _cells_of_row(cells_value) -> list[Cell]:
    return [
        Cell(index=c["index"], text=c["text"] or "",
             bbox=BBox(c["l"], c["t"], c["r"], c["b"]),
             from_ocr=c.get("from_ocr", False),
             confidence=c.get("confidence", 1.0))
        for c in (cells_value or [])
    ]


def page_parse_batch(batch: pa.Table) -> pa.Table:
    """Per-page parse quality: 10%-quantile of per-cell garbage scores."""
    scores = []
    for cells in batch["cells"].to_pylist():
        cell_scores = [rate_text_quality(c["text"] or "") for c in cells or []]
        scores.append(page_parse_score(cell_scores))
    return batch.append_column("parse_score", pa.array(scores, pa.float64()))


class LayoutHeuristicStage:
    """Actor-pool layout stage: cells → cluster column.

    Heuristic tier (vertical-adjacency blocks with two-column banding); a
    learned predictor loads in ``__init__`` and replaces
    ``self._predict`` when available.
    """

    def __init__(self, line_gap: float = 6.0):
        self.line_gap = line_gap  # stage state built once per actor

    def _predict(self, cells: list[Cell], width: float):
        return heuristic_clusters(cells, width, line_gap=self.line_gap)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from docling_ray.kernels.layout_postprocess import postprocess_layout

        out_clusters = []
        heights = (batch["height"].to_pylist()
                   if "height" in batch.column_names
                   else [792.0] * batch.num_rows)
        for cells_value, width, height in zip(batch["cells"].to_pylist(),
                                              batch["width"].to_pylist(),
                                              heights):
            cells = _cells_of_row(cells_value)
            clusters = self._predict(cells, width or 612.0)
            clusters = postprocess_layout(cells, clusters, width or 612.0,
                                          height or 792.0)
            out_clusters.append([
                {
                    "id": cl.id, "label": cl.label,
                    "l": cl.bbox.l, "t": cl.bbox.t,
                    "r": cl.bbox.r, "b": cl.bbox.b,
                    "confidence": cl.confidence,
                    "cell_ids": [c.index for c in cl.cells],
                }
                for cl in clusters
            ])
        cluster_type = pa.large_list(pa.struct([
            ("id", pa.int32()), ("label", pa.string()),
            ("l", pa.float64()), ("t", pa.float64()),
            ("r", pa.float64()), ("b", pa.float64()),
            ("confidence", pa.float32()),
            ("cell_ids", pa.list_(pa.int32())),
        ]))
        return batch.append_column("clusters",
                                   pa.array(out_clusters, cluster_type))


class LayoutLearnedStage(LayoutHeuristicStage):
    """The learned tier of the layout slot: REAL weight tensors
    (`kernels/layout_model.py`'s trained logistic classifier) load from
    disk ONCE per actor in ``__init__`` and relabel each heuristic
    cluster by the model's majority heading vote — the exact actor
    contract an RT-DETR drop-in uses (load once, vectorized batch
    predict, `postprocess_layout` rules after).  Emits
    ``n_batches_since_load`` so tests and benches can PROVE actor
    reuse: with per-batch model loading every batch would report 1;
    with the actor contract the counter climbs across batches."""

    def __init__(self, weights_path: str, line_gap: float = 6.0,
                 heading_label: str = "section_header"):
        from docling_ray.kernels.layout_model import NumpyLayoutModel

        super().__init__(line_gap=line_gap)
        self.model = NumpyLayoutModel(weights_path)   # once per ACTOR
        self.n_batches_since_load = 0
        self.heading_label = heading_label
        self._page_h = 792.0

    def _predict(self, cells, width: float):
        import numpy as np

        from docling_ray.kernels.layout_model import cell_features

        clusters = super()._predict(cells, width)
        for cl in clusters:
            feats = cell_features(cl.cells, width, self._page_h)
            if len(feats) and np.mean(
                    self.model.predict_heading(feats)) > 0.5:
                cl.label = self.heading_label
        return clusters

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.n_batches_since_load += 1
        out = super().__call__(batch)
        return out.append_column(
            "n_batches_since_load",
            pa.array([self.n_batches_since_load] * out.num_rows,
                     pa.int64()))


class PageAssembleLearnedStage:
    """Actor-pool assemble stage with the LEARNED table-header tier:
    real trained weight tensors (``kernels/table_model.py``'s logistic
    row classifier) load from disk ONCE per actor in ``__init__`` and
    replace the geometric "row 0 is the header" rule — the TableFormer
    actor contract (``table_structure_model.py:33-89``: load once,
    batch predict, same output post-processing).  Emits
    ``n_assemble_batches_since_load`` so actor reuse is provable."""

    def __init__(self, weights_path: str, keep_cells: bool = False):
        from docling_ray.kernels.table_model import NumpyTableModel

        self.model = NumpyTableModel(weights_path)   # once per ACTOR
        self.keep_cells = keep_cells
        self.n_batches_since_load = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.n_batches_since_load += 1
        out = assemble_page_batch(batch, keep_cells=self.keep_cells,
                                  table_model=self.model)
        return out.append_column(
            "n_assemble_batches_since_load",
            pa.array([self.n_batches_since_load] * out.num_rows,
                     pa.int64()))


ELEMENT_STRUCT = pa.struct([
    ("cid", pa.int32()), ("label", pa.string()),
    ("l", pa.float64()), ("t", pa.float64()),
    ("r", pa.float64()), ("b", pa.float64()),
    ("text", pa.large_string()),
    ("table_json", pa.large_string()),
])


def assemble_page_batch(batch: pa.Table, keep_cells: bool = False,
                        table_model=None) -> pa.Table:
    """clusters + cells → typed page elements with sanitized text (the
    PageAssemble analog); ordering is left to the doc-level reading-order
    reduce.  ``page_text`` keeps the in-page order for per-page consumers.
    ``table_model`` routes table clusters through the learned header
    tier (``PageAssembleLearnedStage`` owns its per-actor load)."""
    texts, out_elements = [], []
    for cells_value, clusters_value in zip(batch["cells"].to_pylist(),
                                           batch["clusters"].to_pylist()):
        cell_by_id = {c["index"]: c for c in cells_value or []}
        clusters = []
        from docling_ray.kernels.pdf_assemble import Cluster

        for cl in clusters_value or []:
            cluster = Cluster(id=cl["id"], label=cl["label"],
                              bbox=BBox(cl["l"], cl["t"], cl["r"], cl["b"]),
                              confidence=cl["confidence"])
            cluster.cells = [
                Cell(index=i, text=cell_by_id[i]["text"] or "",
                     bbox=BBox(cell_by_id[i]["l"], cell_by_id[i]["t"],
                               cell_by_id[i]["r"], cell_by_id[i]["b"]))
                for i in (cl["cell_ids"] or []) if i in cell_by_id
            ]
            clusters.append(cluster)
        elements = assemble_page_text(clusters, table_model=table_model)
        texts.append("\n".join(e["text"] for e in elements if e["text"]))
        by_id = {cl.id: cl for cl in clusters}
        out_elements.append([
            {"cid": e["cluster_id"], "label": e["label"],
             "l": by_id[e["cluster_id"]].bbox.l,
             "t": by_id[e["cluster_id"]].bbox.t,
             "r": by_id[e["cluster_id"]].bbox.r,
             "b": by_id[e["cluster_id"]].bbox.b,
             "text": e["text"],
             "table_json": e.get("table_json", "")}
            for e in elements
        ])
    out = batch.append_column("page_text", pa.array(texts, pa.large_string()))
    out = out.append_column("elements",
                            pa.array(out_elements, pa.large_list(ELEMENT_STRUCT)))
    # project away the heavy nested columns once consumed (multimodal
    # export keeps the cells: they are part of its page tuples)
    drop = ("clusters",) if keep_cells else ("cells", "clusters")
    keep = [c for c in out.column_names if c not in drop]
    return out.select(keep)


def assemble_document(group: pa.Table, limits=None) -> pa.Table:
    """Doc-level reduce: reading-order model over all page elements
    (ordering + caption/footnote attachment + merges + doc build, the
    ``ReadingOrderModel`` reduce of
    ``/root/reference/docling/models/readingorder_model.py:355-381``),
    plus confidence rollup (nanmean layout/ocr, 10%-quantile parse —
    ``standard_pdf_pipeline.py:253-281``)."""
    import pyarrow.compute as pc

    from docling_ray.kernels.reading_order import (
        ROElement,
        reading_order_document,
    )

    order = pc.sort_indices(group["page_no"])
    group = group.take(order)
    if limits is not None:
        from docling_ray.stages.limits import slice_doc_pages

        group = slice_doc_pages(group, limits)
        if group.num_rows == 0:   # limit-invalid doc: dropped
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "n_pages": pa.array([], pa.int32()),
                "text": pa.array([], pa.large_string()),
                "parse_score": pa.array([], pa.float64()),
                "mean_grade": pa.array([], pa.string()),
                "low_grade": pa.array([], pa.string()),
            })
    elements: list[ROElement] = []
    for row in range(group.num_rows):
        page_no = group["page_no"][row].as_py()
        width = (group["width"][row].as_py()
                 if "width" in group.column_names else 612.0)
        height = (group["height"][row].as_py()
                  if "height" in group.column_names else 792.0)
        for e in group["elements"][row].as_py() or []:
            payload = {}
            if e.get("table_json"):
                from docling_ray.kernels.table_structure import table_from_json

                payload["table_data"] = table_from_json(e["table_json"])
            elements.append(ROElement(
                cid=len(elements), page_no=page_no, label=e["label"],
                l=e["l"], t=e["t"], r=e["r"], b=e["b"], text=e["text"],
                page_width=width or 612.0, page_height=height or 792.0,
                payload=payload))
    doc = reading_order_document(group["doc_id"][0].as_py(), elements)
    text = "\n".join(
        item.text for item, _ in doc.iterate()
        if getattr(item, "text", "") and item.content_layer == "body")
    parse_scores = np.asarray(
        [s for s in group["parse_score"].to_pylist() if s is not None],
        dtype=np.float64)
    parse = (float(np.nanquantile(parse_scores, 0.10))
             if parse_scores.size else float("nan"))
    from docling_ray.kernels.confidence import confidence_columns

    conf = confidence_columns(group["parse_score"].to_pylist())
    return pa.table({
        "doc_id": [group["doc_id"][0].as_py()],
        "url": [group["url"][0].as_py()],
        "n_pages": pa.array([group.num_rows], pa.int32()),
        "text": pa.array([text], pa.large_string()),
        "parse_score": pa.array([parse], pa.float64()),
        "mean_grade": pa.array([conf["mean_grade"]], pa.string()),
        "low_grade": pa.array([conf["low_grade"]], pa.string()),
    })


def mets_gbs_explode_batch(batch: pa.Table, limits=None) -> pa.Table:
    """(doc_id, url, archive: binary) → parsed page rows feeding the same
    ``pdf_pages_pipeline`` (the flat_map analog of the reference's
    paginated METS backend; heavy archive bytes are consumed here and do
    not travel further).  Limits are enforced HERE, where the page count
    is locally known — oversize archives and limit-invalid docs emit no
    rows, out-of-range pages never enter the shuffle."""
    from docling_ray.kernels.mets_gbs import mets_pages_rows
    from docling_ray.sources.pdf_pages import SCHEMA as PAGES_SCHEMA

    rows = {name: [] for name in PAGES_SCHEMA.names}
    for i in range(batch.num_rows):
        doc_id = batch["doc_id"][i].as_py()
        url = (batch["url"][i].as_py()
               if "url" in batch.column_names else doc_id)
        raw = batch["archive"][i].as_py() or b""
        if limits is not None and len(raw) > limits.max_file_size:
            continue
        try:
            page_rows = mets_pages_rows(doc_id, url, raw)
        except Exception:
            page_rows = []  # invalid archives contribute no pages
        if limits is not None:
            from docling_ray.stages.limits import page_count_valid, page_in_range

            if not page_count_valid(len(page_rows), limits):
                continue
            page_rows = [r for r in page_rows
                         if page_in_range(r["page_no"], limits)]
        for r in page_rows:
            for name in PAGES_SCHEMA.names:
                rows[name].append(r[name])
    return pa.table(rows, schema=PAGES_SCHEMA)


def mets_gbs_pipeline(ds, layout_concurrency: int = 2, limits=None):
    """tar.gz archives dataset → per-doc assembled text (explode pages,
    then the standard paginated chain)."""
    pages = ds.map_batches(
        lambda b: mets_gbs_explode_batch(b, limits=limits),
        batch_format="pyarrow")
    return pdf_pages_pipeline(pages, layout_concurrency=layout_concurrency)


MM_CELL_STRUCT = pa.struct([
    ("text", pa.large_string()), ("bbox", pa.list_(pa.float64(), 4)),
    ("ocr", pa.bool_()), ("ocr_confidence", pa.float64()),
])
MM_SEGMENT_STRUCT = pa.struct([
    ("index_in_doc", pa.int32()), ("label", pa.string()),
    ("text", pa.large_string()), ("bbox", pa.list_(pa.float64(), 4)),
    ("table_html", pa.large_string()),
])


def multimodal_pages_group(group: pa.Table) -> pa.Table:
    """Doc-level reduce → page-aligned multimodal training tuples
    (``/root/reference/docling/utils/export.py:13-146`` shape)."""
    from docling_ray.kernels.multimodal_export import multimodal_page_tuples

    pages = []
    for row in range(group.num_rows):
        pages.append({
            "page_no": group["page_no"][row].as_py(),
            "width": (group["width"][row].as_py()
                      if "width" in group.column_names else 612.0),
            "height": (group["height"][row].as_py()
                       if "height" in group.column_names else 792.0),
            "cells": group["cells"][row].as_py() or [],
            "elements": group["elements"][row].as_py() or [],
        })
    doc_id = group["doc_id"][0].as_py()
    url = (group["url"][0].as_py() if "url" in group.column_names else doc_id)
    rows = {"doc_id": [], "url": [], "page_no": [], "content_text": [],
            "content_md": [], "content_dt": [], "cells": [], "segments": []}
    for rec in multimodal_page_tuples(pages):
        rows["doc_id"].append(doc_id)
        rows["url"].append(url)
        rows["page_no"].append(rec["page_no"])
        rows["content_text"].append(rec["content_text"])
        rows["content_md"].append(rec["content_md"])
        rows["content_dt"].append(rec["content_dt"])
        rows["cells"].append([
            {"text": c["text"], "bbox": list(c["bbox"]), "ocr": c["ocr"],
             "ocr_confidence": c["ocr_confidence"]} for c in rec["cells"]])
        rows["segments"].append([
            {"index_in_doc": s["index_in_doc"], "label": s["label"],
             "text": s["text"], "bbox": list(s["bbox"]),
             "table_html": (s["data"][0]["html_seq"] if s["data"] else "")}
            for s in rec["segments"]])
    return pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.string()),
        "url": pa.array(rows["url"], pa.string()),
        "page_no": pa.array(rows["page_no"], pa.int32()),
        "content_text": pa.array(rows["content_text"], pa.large_string()),
        "content_md": pa.array(rows["content_md"], pa.large_string()),
        "content_dt": pa.array(rows["content_dt"], pa.large_string()),
        "cells": pa.array(rows["cells"], pa.large_list(MM_CELL_STRUCT)),
        "segments": pa.array(rows["segments"],
                             pa.large_list(MM_SEGMENT_STRUCT)),
    })


def multimodal_export_pipeline(ds, layout_concurrency: int = 2):
    """Pages dataset → page-aligned (text, md, doctags, cells, segments)
    rows, one per page, ready for parquet training-set export."""
    from docling_ray.stages.grouping import bucketed_doc_groups

    ds = ds.map_batches(page_parse_batch, batch_format="pyarrow")
    ds = ds.map_batches(LayoutHeuristicStage, batch_format="pyarrow",
                        concurrency=(1, layout_concurrency))
    ds = ds.map_batches(lambda b: assemble_page_batch(b, keep_cells=True),
                        batch_format="pyarrow")
    return bucketed_doc_groups(ds, multimodal_pages_group)


def pdf_pages_pipeline(ds, layout_concurrency: int = 2, limits=None,
                       carry_columns: tuple = (),
                       table_weights_path: str = None):
    """Full paginated pipeline over a parsed-pages dataset.  ``limits``
    (``stages/limits.DocumentLimits``) enforces max-page / page-range
    inside the per-doc reduce — limit-invalid docs are dropped.

    ``carry_columns`` names input columns that are CONSTANT within a
    document (e.g. the input-shard id) and must survive the per-doc
    reduce; each is re-appended to the reduce output from the group's
    first row, letting callers stream MANY shards through one pipeline
    and still write shard-partitioned output."""

    def _reduce(g: pa.Table) -> pa.Table:
        out = assemble_document(g, limits=limits)
        for name in carry_columns:
            value = g[name][0].as_py() if g.num_rows else None
            out = out.append_column(
                name, pa.array([value] * out.num_rows,
                               g.schema.field(name).type))
        return out

    from docling_ray.stages.grouping import bucketed_doc_groups

    ds = ds.map_batches(page_parse_batch, batch_format="pyarrow")
    ds = ds.map_batches(LayoutHeuristicStage, batch_format="pyarrow",
                        concurrency=(1, layout_concurrency))
    if table_weights_path is not None:
        # learned table-header tier: weights load once per assemble actor
        ds = ds.map_batches(
            PageAssembleLearnedStage, batch_format="pyarrow",
            concurrency=(1, layout_concurrency),
            fn_constructor_kwargs={"weights_path": table_weights_path})
    else:
        ds = ds.map_batches(assemble_page_batch, batch_format="pyarrow")
    return bucketed_doc_groups(ds, _reduce)

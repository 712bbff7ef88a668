#!/usr/bin/env python
"""Generate committed golden tables for the non-SQL-expressible queries.

- golden_pdf.parquet: TRUE golden — expected per-doc assembled text is
  computed by the page GENERATOR independently of the pipeline
  (sources/pdf_pages.py), hashed here.
- golden_extract.parquet / golden_chunks.parquet: FROZEN outputs of the
  (separately byte-exact-tested) extraction/chunking kernels over the
  deterministic synthetic corpus — regression freezes, regenerated only
  via this script.
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    os.makedirs(out_dir, exist_ok=True)

    # -- pdf: generator-side expected text (independent of the pipeline)
    from docling_ray.sources.pdf_pages import make_pdf_pages_table

    table, expected = make_pdf_pages_table(40, seed=42)
    counts = table.group_by("doc_id").aggregate([("page_no", "count")])
    n_by_doc = dict(zip(counts["doc_id"].to_pylist(),
                        counts["page_no_count"].to_pylist()))
    doc_ids = sorted(expected)
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "n_pages": pa.array([n_by_doc[d] for d in doc_ids], pa.int32()),
        "text_md5": pa.array(
            [hashlib.md5(expected[d].encode()).hexdigest() for d in doc_ids],
            pa.string()),
    }), os.path.join(out_dir, "golden_pdf.parquet"))

    # -- extract + chunks: frozen kernel outputs over the synthetic corpus
    from docling_ray.sources.webpages import make_table
    from docling_ray.stages.chunk import chunk_batch
    from docling_ray.stages.extract import extract_and_project

    web = make_table(120, seed=42)
    extracted = extract_and_project(web)
    pq.write_table(
        extracted.select(["url", "doc_id", "status", "n_items"]),
        os.path.join(out_dir, "golden_extract.parquet"))

    web60 = make_table(60, seed=42)
    chunks = chunk_batch(web60)
    pq.write_table(
        chunks.select(["url", "chunk_id", "n_tokens", "kind"]),
        os.path.join(out_dir, "golden_chunks.parquet"))
    print("goldens written to", out_dir)


if __name__ == "__main__":
    main()

"""Resumable corpus runner for the paginated (PDF/METS) path.

Same lineage contract as the extraction runner
(``pipelines/extract_pipeline.run_extract``): one input parquet shard of
parsed pages → one output partition, recorded in ``_manifest.jsonl``
after a complete write; a resumed run deletes stale partial partitions
and re-processes only shards missing from the manifest.  Shards are
processed one pipeline-run at a time because the per-doc reduce must see
every page of a doc — the corpus layout contract is therefore "a doc's
pages never span input shards" (the explode stages guarantee it; for
external page tables, partition by doc_id when sharding)."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pyarrow.parquet as pq
import ray.data

from docling_ray.state import manifest
from docling_ray.stages.pdf import pdf_pages_pipeline


def run_pdf_extract(input_dir: str, output_dir: str, resume: bool = True,
                    limits=None) -> dict:
    input_files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not input_files:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")
    todo = manifest.remaining(input_files, output_dir) if resume \
        else input_files
    data_dir = os.path.join(output_dir, "data")
    t0 = time.time()
    for f in todo:
        shard = os.path.basename(f)
        shard_id = os.path.splitext(shard)[0]
        part_dir = os.path.join(data_dir, f"shard={shard_id}")
        if os.path.isdir(part_dir):  # stale partial write from a crash
            shutil.rmtree(part_dir)
        ds = ray.data.read_parquet(f)
        out = pdf_pages_pipeline(ds, limits=limits)
        os.makedirs(part_dir, exist_ok=True)
        out.write_parquet(part_dir)
        rows = sum(pq.ParquetFile(p).metadata.num_rows
                   for p in glob.glob(os.path.join(part_dir, "*.parquet")))
        manifest.mark_done(output_dir, shard, rows,
                           input_path=f, stage="pdf-extract-v1")
    done = manifest.load_done(output_dir)
    return {
        "shards_total": len(input_files),
        "shards_processed": len(todo),
        "rows_done": sum(e.get("rows", 0) for e in done.values()),
        "wall_sec": time.time() - t0,
    }

"""Resumable corpus runner for the paginated (PDF/METS) path.

Same lineage contract as the extraction runner
(``pipelines/extract_pipeline.run_extract``): one input parquet shard of
parsed pages → one output partition, recorded in ``_manifest.jsonl``
after a complete write; a resumed run deletes stale partial partitions
and re-processes only shards missing from the manifest.

ALL remaining shards stream through ONE Dataset pipeline (the
``run_extract`` shape): the per-shard alternative pays the ~seconds
pipeline fixed cost per shard and idles the cluster between shards.  The
per-doc reading-order reduce stays correct across the merged stream
because the corpus layout contract is "a doc's pages never span input
shards" (the explode stages guarantee it; for external page tables,
partition by doc_id when sharding) — so the global ``groupby(doc_id)``
sees exactly the same groups, and the shard id rides along as a
carry column into the partitioned write.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pyarrow.parquet as pq
import ray.data

from docling_ray.state import manifest
from docling_ray.stages.pdf import pdf_pages_pipeline


def _shard_id(shard_file: str) -> str:
    return os.path.splitext(shard_file)[0]


def _shard_from_path(batch):
    import pyarrow as pa

    shards = [_shard_id(os.path.basename(p.as_py())) for p in batch["path"]]
    batch = batch.drop_columns(["path"])
    return batch.append_column("shard", pa.array(shards, pa.string()))


def run_pdf_extract(input_dir: str, output_dir: str, resume: bool = True,
                    limits=None, group_size: int = 64) -> dict:
    """``group_size`` bounds the checkpoint interval: shards stream
    through one pipeline per GROUP (amortizing the ~seconds pipeline
    fixed cost across the group), and the manifest marks a group's
    shards only after its write completes — so a mid-run crash costs at
    most one group's work, not the whole corpus (review r4)."""
    return _run_paginated(
        input_dir, output_dir,
        lambda ds: pdf_pages_pipeline(ds, limits=limits,
                                      carry_columns=("shard",)),
        stage="pdf-extract-v1", resume=resume, group_size=group_size)


def run_vlm_extract(input_dir: str, output_dir: str, resume: bool = True,
                    options=None, group_size: int = 64) -> dict:
    """The VLM conversion pipeline under the same per-shard lineage
    contract as ``run_pdf_extract``: one input shard → one output
    partition, manifest-marked after a complete write, resumable."""
    from docling_ray.stages.vlm import VlmOptions, vlm_pipeline

    opts = options or VlmOptions()
    return _run_paginated(
        input_dir, output_dir,
        lambda ds: vlm_pipeline(ds, opts, carry_columns=("shard",)),
        stage="vlm-extract-v1", resume=resume, group_size=group_size)


def run_asr_extract(input_dir: str, output_dir: str, resume: bool = True,
                    options=None, group_size: int = 64) -> dict:
    """The ASR pipeline under the same per-shard lineage contract (the
    transcription stage keeps every input column except the consumed
    audio payload, so the shard id rides through on its own)."""
    from docling_ray.stages.asr import asr_pipeline

    return _run_paginated(
        input_dir, output_dir,
        lambda ds: asr_pipeline(ds, options),
        stage="asr-extract-v1", resume=resume, group_size=group_size)


def _run_paginated(input_dir: str, output_dir: str, pipeline_fn,
                   stage: str, resume: bool = True,
                   group_size: int = 64) -> dict:
    input_files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not input_files:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")
    todo = manifest.remaining(input_files, output_dir) if resume \
        else input_files
    data_dir = os.path.join(output_dir, "data")
    t0 = time.time()
    for g0 in range(0, len(todo), max(1, group_size)):
        group = todo[g0:g0 + max(1, group_size)]
        # exactly-once despite mid-run crashes: a shard is authoritative
        # only once it is in the manifest, so any partition dir for a
        # shard about to be (re)processed is a stale partial write —
        # drop it first or write_parquet would APPEND uniquely-named
        # files next to it and duplicate rows (the run_extract lesson).
        for f in group:
            stale = os.path.join(
                data_dir, f"shard={_shard_id(os.path.basename(f))}")
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        ds = ray.data.read_parquet(group, include_paths=True)
        ds = ds.map_batches(_shard_from_path, batch_format="pyarrow")
        out = pipeline_fn(ds)
        out.write_parquet(data_dir, partition_cols=["shard"])
        for f in group:
            shard = os.path.basename(f)
            part_dir = os.path.join(data_dir, f"shard={_shard_id(shard)}")
            rows = sum(
                pq.ParquetFile(p).metadata.num_rows
                for p in glob.glob(os.path.join(part_dir, "*.parquet")))
            manifest.mark_done(output_dir, shard, rows,
                               input_path=f, stage=stage)
    done = manifest.load_done(output_dir)
    return {
        "shards_total": len(input_files),
        "shards_processed": len(todo),
        "rows_done": sum(e.get("rows", 0) for e in done.values()),
        "wall_sec": time.time() - t0,
    }

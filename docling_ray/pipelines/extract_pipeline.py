"""Flagship pipeline: web-pages parquet → extracted text parquet.

Ray-Data-first shape (SURVEY.md §3.1): ``read_parquet`` (pruned columns) →
one fused stateless ``map_batches`` chain (sniff + hash + HTML walk +
markdown serialize, heavy ``html`` column dropped on the way out) → either a
streaming ``write_parquet`` per input shard (resumable via the partition
manifest) or a ``groupby(lang)`` metrics aggregate.  No stage materializes
the corpus; blocks stream through the object store with backpressure.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from typing import Optional

import pyarrow.parquet as pq
import ray.data

from docling_ray.stages.extract import extract_and_project
from docling_ray.state import manifest

INPUT_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_web_pages(path: str, columns: Optional[list[str]] = None,
                   **kwargs) -> ray.data.Dataset:
    """Pruned parquet read — never load columns a stage won't touch."""
    return ray.data.read_parquet(path, columns=columns or INPUT_COLUMNS, **kwargs)


def extract_dataset(ds: ray.data.Dataset, batch_size: int = 128,
                    emit_doc_json: bool = False) -> ray.data.Dataset:
    """The extraction chain on an already-constructed dataset."""
    if emit_doc_json:
        return ds.map_batches(
            lambda b: extract_and_project(b, emit_doc_json=True),
            batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(extract_and_project, batch_format="pyarrow",
                          batch_size=batch_size)


def default_num_blocks() -> int:
    """~3 read tasks per CPU: round-2 measured sweet spot at bs=128 —
    enough slack for work stealing around skewed blocks without drowning
    in per-task read overhead (blocks×bs sweep at 32 CPUs, 50k docs:
    128×64→5700, 128×128→6012, 64×128→7037, 96×128→7361/7442)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, cpus * 3)


def extract_path(path: str, batch_size: int = 128,
                 num_blocks: Optional[int] = None) -> ray.data.Dataset:
    ds = read_web_pages(path, override_num_blocks=num_blocks or default_num_blocks())
    return extract_dataset(ds, batch_size=batch_size)


def lang_metrics(ds: ray.data.Dataset) -> ray.data.Dataset:
    """North-star per-language extraction metrics (groupby-lang aggregate)."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = ds.map_batches(
        _add_len_cols, batch_format="pyarrow")
    return ds.groupby("lang").aggregate(
        Count(),
        Sum(on="n_chars", alias_name="sum_chars"),
        Mean(on="n_chars", alias_name="avg_chars"),
        Sum(on="n_failed", alias_name="n_failed"),
    )


def _add_len_cols(batch):
    import pyarrow as pa
    import pyarrow.compute as pc

    n_chars = pc.utf8_length(batch["extracted_text"]).cast(pa.int64())
    failed = pc.cast(pc.equal(batch["status"], "failure"), pa.int64())
    batch = batch.append_column("n_chars", n_chars)
    return batch.append_column("n_failed", failed)


def run_extract(input_dir: str, output_dir: str, batch_size: int = 64,
                resume: bool = True, emit_doc_json: bool = False) -> dict:
    """Resumable corpus run: one output partition per input shard.

    Shards already recorded in the output manifest are skipped; remaining
    shards stream through one Dataset pipeline and are written partitioned
    by shard id, then marked done (row counts from the written footers).
    """
    input_files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not input_files:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")
    todo = manifest.remaining(input_files, output_dir) if resume else input_files
    t0 = time.time()
    if todo:
        data_dir = os.path.join(output_dir, "data")
        # exactly-once despite mid-run crashes: a shard is authoritative only
        # once it is in the manifest, so any partition dir for a shard we are
        # about to (re)process is a stale partial write — drop it before the
        # run or write_parquet would APPEND uniquely-named files next to it
        # and duplicate rows (ADVICE.md, round 1).
        for f in todo:
            stale = os.path.join(
                data_dir, f"shard={_shard_id(os.path.basename(f))}")
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        ds = read_web_pages(todo, columns=INPUT_COLUMNS + [], include_paths=True)
        ds = ds.map_batches(_shard_from_path, batch_format="pyarrow")
        ds = extract_dataset(ds, batch_size=batch_size,
                             emit_doc_json=emit_doc_json)
        ds.write_parquet(data_dir, partition_cols=["shard"])
        for f in todo:
            shard = os.path.basename(f)
            rows = _count_rows(os.path.join(data_dir, f"shard={_shard_id(shard)}"))
            manifest.mark_done(output_dir, shard, rows,
                               input_path=f, stage="extract-v1")
    wall = time.time() - t0
    done = manifest.load_done(output_dir)
    return {
        "shards_total": len(input_files),
        "shards_processed": len(todo),
        "rows_done": sum(e.get("rows", 0) for e in done.values()),
        "wall_sec": wall,
    }


def _shard_id(shard_file: str) -> str:
    return os.path.splitext(shard_file)[0]


def _shard_from_path(batch):
    import pyarrow as pa

    shards = [_shard_id(os.path.basename(p.as_py())) for p in batch["path"]]
    batch = batch.drop_columns(["path"])
    return batch.append_column("shard", pa.array(shards, pa.string()))


def _count_rows(partition_dir: str) -> int:
    total = 0
    for f in glob.glob(os.path.join(partition_dir, "*.parquet")):
        total += pq.ParquetFile(f).metadata.num_rows
    return total

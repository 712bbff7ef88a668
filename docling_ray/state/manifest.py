"""Per-partition lineage manifest + checkpointed resume.

The corpus is processed shard-by-shard (one input parquet file = one output
partition directory).  After a partition's output is fully written, a line is
appended to ``_manifest.jsonl`` recording input shard, row count, engine
version and wall time.  On resume, shards already present in the manifest
are skipped (anti-join on shard name) — a failed run re-processes only
missing partitions.  The reference has no corpus-level checkpointing
(per-run only); this is the engine-level addition the north rule requires.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

MANIFEST_NAME = "_manifest.jsonl"


def manifest_path(output_dir: str) -> str:
    return os.path.join(output_dir, MANIFEST_NAME)


def load_done(output_dir: str) -> dict[str, dict]:
    """Map of input-shard name → manifest entry for completed partitions."""
    done: dict[str, dict] = {}
    path = manifest_path(output_dir)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                entry = json.loads(line)
                done[entry["shard"]] = entry
    return done


def mark_done(output_dir: str, shard: str, rows: int, **extra) -> None:
    os.makedirs(output_dir, exist_ok=True)
    entry = {"shard": shard, "rows": rows, "ts": time.time(), **extra}
    with open(manifest_path(output_dir), "a") as f:
        f.write(json.dumps(entry) + "\n")


def remaining(input_files: Iterable[str], output_dir: str) -> list[str]:
    done = load_done(output_dir)
    return [f for f in input_files if os.path.basename(f) not in done]

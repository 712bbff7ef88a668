"""Incremental dedup index: shared mutable state behind sharded actors.

Batch dedup (``stages/dedup.exact_dedup_keep_first``) is a groupby and
stays in the Dataset API.  INCREMENTAL ingest — "drop documents already
seen in any previous run/stream batch" — genuinely needs a shared
mutable index, which the Dataset API cannot express; this is the one
place the engine drops to raw ``@ray.remote`` actors (the escape hatch
the architecture reserves for exactly this shape).

Design for scale: the index is hash-SHARDED over N actors (one ``set``
of 16-byte digests each — ~100 GB of fingerprints across a cluster holds
10^12 docs), batches query shards with ONE vectorized call per shard per
batch (no per-row RPCs), and first-arrival-wins semantics make the
filter idempotent: re-ingesting a corpus yields zero survivors.
Persistence hooks (``dump``/``load``) snapshot shards to parquet so the
index survives across runs.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray


@ray.remote
class DedupIndexShard:
    """One shard of the global fingerprint set."""

    def __init__(self):
        self._seen: set[bytes] = set()

    def check_and_add(self, keys: list[bytes]) -> list[bool]:
        """For each key: True if UNSEEN (caller keeps the row); the key is
        added, so later duplicates — same batch or any later one — get
        False."""
        seen = self._seen
        out = []
        for key in keys:
            if key in seen:
                out.append(False)
            else:
                seen.add(key)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)

    def dump(self) -> bytes:
        return b"".join(sorted(self._seen))

    def load(self, blob: bytes, key_len: int = 16) -> int:
        self._seen.update(blob[i:i + key_len]
                          for i in range(0, len(blob), key_len))
        return len(self._seen)


def create_index(num_shards: int = 8) -> list:
    return [DedupIndexShard.remote() for _ in range(num_shards)]


class IncrementalDedupFilter:
    """``map_batches`` stage: md5 each row's text, route digests to their
    shard, keep only first-ever-seen rows.  One RPC per touched shard per
    batch."""

    def __init__(self, shards: list, text_column: str = "text"):
        self.shards = shards
        self.num_shards = len(shards)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5((v.as_py() or "").encode("utf-8")).digest()
                   for v in batch[self.text_column]]
        by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            by_shard.setdefault(d[0] % self.num_shards, []).append(i)
        keep = [False] * batch.num_rows
        futures = {
            shard_id: self.shards[shard_id].check_and_add.remote(
                [digests[i] for i in idxs])
            for shard_id, idxs in by_shard.items()
        }
        for shard_id, idxs in by_shard.items():
            for i, fresh in zip(idxs, ray.get(futures[shard_id])):
                keep[i] = fresh
        return batch.filter(pa.array(keep, pa.bool_()))


def incremental_dedup(ds, shards: list, text_column: str = "text"):
    return ds.map_batches(
        IncrementalDedupFilter, batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"shards": shards, "text_column": text_column})

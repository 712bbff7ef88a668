"""Incremental dedup index: shared mutable state behind sharded actors.

Batch dedup (``stages/dedup.exact_dedup_keep_first``) is a groupby and
stays in the Dataset API.  INCREMENTAL ingest — "drop documents already
seen in any previous run/stream batch" — genuinely needs a shared
mutable index, which the Dataset API cannot express; this is the one
place the engine drops to raw ``@ray.remote`` actors (the escape hatch
the architecture reserves for exactly this shape).

Design for scale and failure:

- the index is hash-SHARDED over N actors, routed on the first 8 digest
  bytes (uniform for any shard count); ~100 GB of fingerprints across a
  cluster holds 10^12 docs;
- batches query shards with ONE vectorized call per shard per batch (no
  per-row RPCs);
- RETRY-SAFE: each batch sends an ownership token (run nonce fixed at
  graph-build time + batch content hash); a key is "fresh" if unseen OR
  already owned by the same token, so a Ray task retry of a crashed
  batch reproduces its original answers instead of seeing its own keys
  as duplicates and dropping every row — while a genuine re-ingest in a
  NEW run carries a different nonce and correctly dedups;
- ``dump``/``restore_index`` snapshot the raw key+token bytes and
  re-route them on load, so the index can be restored onto a DIFFERENT
  shard count without silently losing lookups.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray

_KEY_LEN = 16
_TOKEN_LEN = 8


@ray.remote
class DedupIndexShard:
    """One shard of the global fingerprint map (key → owner token)."""

    def __init__(self):
        self._seen: dict[bytes, bytes] = {}

    def check_and_add(self, keys: list[bytes], token: bytes) -> list[bool]:
        """For each key: True iff this is the FIRST occurrence in this call
        AND the key is unseen globally or already owned by ``token`` (a
        task retry replaying its own claim).  Later occurrences within the
        same call are duplicates regardless of owner, so a retry
        reproduces the original answers exactly."""
        seen = self._seen
        in_call: set[bytes] = set()
        out = []
        for key in keys:
            if key in in_call:
                out.append(False)
                continue
            in_call.add(key)
            owner = seen.get(key)
            if owner is None:
                seen[key] = token
                out.append(True)
            else:
                out.append(owner == token)
        return out

    def size(self) -> int:
        return len(self._seen)

    def dump(self) -> bytes:
        """Raw concatenated key+token records (no sort — order carries no
        meaning and sorting would triple peak memory at scale)."""
        return b"".join(k + t for k, t in self._seen.items())

    def add_records(self, blob: bytes) -> int:
        rec = _KEY_LEN + _TOKEN_LEN
        self._seen.update(
            (blob[i:i + _KEY_LEN], blob[i + _KEY_LEN:i + rec])
            for i in range(0, len(blob), rec))
        return len(self._seen)


def create_index(num_shards: int = 8) -> list:
    return [DedupIndexShard.remote() for _ in range(num_shards)]


def _shard_of(digest: bytes, num_shards: int) -> int:
    return int.from_bytes(digest[:8], "big") % num_shards


def restore_index(shards: list, blobs: list[bytes]) -> int:
    """Load dumped snapshots into a (possibly differently sized) shard
    set: every record is RE-ROUTED by the same hash the filter uses, so
    lookups always hit the shard that holds the key."""
    num_shards = len(shards)
    rec = _KEY_LEN + _TOKEN_LEN
    per_shard: list[list[bytes]] = [[] for _ in range(num_shards)]
    for blob in blobs:
        for i in range(0, len(blob), rec):
            record = blob[i:i + rec]
            per_shard[_shard_of(record[:_KEY_LEN], num_shards)].append(record)
    futures = [shard.add_records.remote(b"".join(records))
               for shard, records in zip(shards, per_shard)]
    return sum(ray.get(futures))


class IncrementalDedupFilter:
    """``map_batches`` stage: md5 each row's text, route digests to their
    shard, keep only first-ever-seen rows.  One RPC per touched shard per
    batch.  Null-text rows are kept untouched (a null is an absent
    document body, not content equal to the empty string)."""

    def __init__(self, shards: list, text_column: str = "text",
                 run_nonce: bytes = b""):
        self.shards = shards
        self.num_shards = len(shards)
        self.text_column = text_column
        self.run_nonce = run_nonce

    def __call__(self, batch: pa.Table) -> pa.Table:
        values = [v.as_py() for v in batch[self.text_column]]
        digests = [None if v is None
                   else hashlib.md5(v.encode("utf-8")).digest()
                   for v in values]
        # ownership token: run nonce + the executing TASK's id + batch
        # content.  A task retry (same task id, any attempt, any actor)
        # reproduces the token, so replayed rows stay owned; two DIFFERENT
        # tasks carrying identical content get distinct tokens, so a
        # genuinely duplicated input block is filtered, not waved through.
        # Residual limitation (documented): two identical batches inside
        # ONE task are indistinguishable from a replay — Ray provides no
        # retry-stable within-task batch ordinal to separate them.
        tid = ""
        try:
            import ray

            tid = ray.get_runtime_context().get_task_id() or ""
        except Exception:  # outside a Ray task (unit tests / driver use)
            pass
        token = hashlib.md5(
            self.run_nonce + tid.encode()
            + b"".join(d for d in digests if d is not None)
        ).digest()[:_TOKEN_LEN]
        by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            if d is not None:
                by_shard.setdefault(_shard_of(d, self.num_shards),
                                    []).append(i)
        keep = [d is None for d in digests]  # null text: always kept
        futures = {
            shard_id: self.shards[shard_id].check_and_add.remote(
                [digests[i] for i in idxs], token)
            for shard_id, idxs in by_shard.items()
        }
        for shard_id, idxs in by_shard.items():
            for i, fresh in zip(idxs, ray.get(futures[shard_id])):
                keep[i] = fresh
        return batch.filter(pa.array(keep, pa.bool_()))


def incremental_dedup(ds, shards: list, text_column: str = "text",
                      concurrency: int = 4):
    import os

    # fixed at graph-build time: task retries reuse it, new runs differ
    run_nonce = os.urandom(8)
    return ds.map_batches(
        IncrementalDedupFilter, batch_format="pyarrow",
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"shards": shards, "text_column": text_column,
                               "run_nonce": run_nonce})

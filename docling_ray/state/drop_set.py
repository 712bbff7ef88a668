"""Sharded distributed drop set — the scale-safe anti-filter backend.

The corpus pipeline's dedup DECISIONS produce a set of urls to drop
(exact-dup losers + near-dup pair members).  At moderate duplicate rates
that set fits memory and ``pipelines/corpus.DropUrls`` broadcasts it via
``ray.put`` — by far the cheapest shape.  But the drop set scales with
the DUPLICATE count, and at crawl dup rates (30-50% of 10^12 docs) it is
10^11 url strings: not a broadcastable object and not a driver-side
Python set (VERDICT r3 #2).

This module is the escape hatch: the drop set lives hash-SHARDED across
N actors (cluster memory, not driver memory), loaded by a streamed
``map_batches`` pass over the decision parquet (the driver never holds
the set), and queried by the payload anti-filter with ONE vectorized RPC
per touched shard per batch — the same shape as
``state/dedup_index.IncrementalDedupFilter``, read-only.  The payload
itself never enters a shuffle on either path.

Routing uses ``stages/dedup._hash64_of`` (vectorized, batch-content
independent) so load and lookup always agree on the owning shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class DropSetShard:
    """One shard of the distributed drop set (a plain value set — static
    after load, so no ownership tokens are needed)."""

    def __init__(self):
        self._keys: set = set()

    def add(self, keys: list) -> int:
        self._keys.update(keys)
        return len(keys)

    def contains(self, keys: list) -> list[bool]:
        s = self._keys
        return [k in s for k in keys]

    def size(self) -> int:
        return len(self._keys)


def create_drop_set(num_shards: int = 8) -> list:
    return [DropSetShard.remote() for _ in range(num_shards)]


def _shard_routes(col, num_shards: int) -> np.ndarray:
    from docling_ray.stages.dedup import _part_of

    return _part_of(col, num_shards)


class _ShardLoader:
    """``map_batches`` stage that streams a key column into the shards:
    one vectorized RPC per touched shard per batch, ``ray.get`` applied
    so object-store backpressure bounds in-flight adds."""

    def __init__(self, shards: list, column: str):
        self.shards = shards
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.column]
        routes = _shard_routes(col, len(self.shards))
        values = col.to_pylist()
        futures = []
        for shard_id in np.unique(routes):
            idxs = np.flatnonzero(routes == shard_id)
            futures.append(self.shards[int(shard_id)].add.remote(
                [values[i] for i in idxs]))
        ray.get(futures)
        return pa.table({"n_loaded": pa.array([batch.num_rows], pa.int64())})


def load_drop_set(ds, shards: list, column: str,
                  concurrency: int = 4) -> int:
    """Stream a dataset's ``column`` into the shards; returns the total
    distinct keys held afterwards.  The driver sees only counts."""
    ds.map_batches(
        _ShardLoader, batch_format="pyarrow", concurrency=(1, concurrency),
        fn_constructor_kwargs={"shards": shards, "column": column},
    ).sum("n_loaded")
    return sum(ray.get([s.size.remote() for s in shards]))


class DropUrlsSharded:
    """Payload anti-filter against the sharded drop set — the drop-in
    replacement for the broadcast ``pipelines/corpus.DropUrls`` when the
    set outgrows broadcastable memory.  Per batch: route the key column,
    ONE ``contains`` RPC per touched shard, vectorized mask filter."""

    def __init__(self, shards: list, column: str = "url"):
        self.shards = shards
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or not self.shards:
            return batch
        col = batch[self.column]
        routes = _shard_routes(col, len(self.shards))
        values = col.to_pylist()
        drop = np.zeros(n, dtype=bool)
        shard_idxs = []
        futures = []
        for shard_id in np.unique(routes):
            idxs = np.flatnonzero(routes == shard_id)
            shard_idxs.append(idxs)
            futures.append(self.shards[int(shard_id)].contains.remote(
                [values[i] for i in idxs]))
        for idxs, hits in zip(shard_idxs, ray.get(futures)):
            drop[idxs] = hits
        return batch.filter(pa.array(~drop))

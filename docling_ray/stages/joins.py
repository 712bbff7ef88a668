"""Broadcast lookup join: the engine's small-side join primitive.

The reference has no relational joins (SURVEY.md §2.5); this is the
engine-level pattern the north rule calls for: a small dimension table is
``ray.put`` ONCE on the driver, each map_batches ACTOR fetches it once in
``__init__`` (zero-copy from the local object store), and every batch is
joined vectorized — no shuffle of the big side, no per-batch ``ray.get``,
no per-row Python (round-1 VERDICT.md item 3).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


class BroadcastLookupJoin:
    """``map_batches(BroadcastLookupJoin, concurrency=N,
    fn_constructor_kwargs=dict(small_ref=ref, left_on=..., right_on=...))``.

    The small side is an object-store ref to a ``pyarrow.Table`` (or the
    table itself in tests).  Join is vectorized: one ``index_in`` over the
    batch key column, then ``take`` per attached column.  ``inner`` drops
    unmatched rows; ``left`` keeps them with nulls.
    """

    def __init__(self, small_ref, left_on: str, right_on: str,
                 join_type: str = "inner",
                 columns: Optional[list[str]] = None):
        import ray

        small = (small_ref if isinstance(small_ref, pa.Table)
                 else ray.get(small_ref))
        self.left_on = left_on
        self.join_type = join_type
        self.keys = small[right_on].combine_chunks()
        attach = columns or [c for c in small.column_names if c != right_on]
        self.values = {c: small[c].combine_chunks() for c in attach}

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[self.left_on], value_set=self.keys)
        if self.join_type == "inner":
            mask = idx.is_valid()
            batch = batch.filter(mask)
            idx = idx.filter(mask)
        for name, col in self.values.items():
            batch = batch.append_column(name, pc.take(col, idx))
        return batch

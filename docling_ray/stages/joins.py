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


# -- as-of join -------------------------------------------------------------
#
# Ray Data has no temporal joins; this is the engine-level as-of join the
# brief calls out (for each left row, the latest right row with
# right.ts <= left.ts per key).  Shape: both sides are tagged and mapped
# onto ONE canonical schema, unioned, pre-bucketed by hash(key) % P, and
# each partition runs a single vectorized pass (sort + forward-fill via
# maximum.accumulate) — one shuffle of (key, ts, payload) rows, Python
# executes P times, never per key (the sessionization shape,
# stages/sessions.py).  A hot key lands in one partition; partitions are
# key-complete by construction, which is the partitioning assumption this
# operator relies on.

import numpy as np


def _asof_partition(part: pa.Table, on: str, ts_col: str,
                    right_cols: list[str], left_cols: list[str],
                    out_schema: pa.Schema) -> pa.Table:
    n = part.num_rows
    if n == 0:
        return out_schema.empty_table()
    order = pc.sort_indices(part, sort_keys=[
        (on, "ascending"), (ts_col, "ascending"), ("_side", "ascending"),
        ("_tie", "ascending")])
    g = part.take(order)
    side = g["_side"].to_numpy(zero_copy_only=False)
    keys = g[on].to_numpy(zero_copy_only=False)
    idx = np.arange(n, dtype=np.int64)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    new_key[1:] = keys[1:] != keys[:-1]
    run_start = np.maximum.accumulate(np.where(new_key, idx, -1))
    last_right = np.maximum.accumulate(np.where(side == 0, idx, -1))
    match = np.where(last_right >= run_start, last_right, -1)

    left_mask = side == 1
    lmatch = match[left_mask]
    valid = pa.array(lmatch >= 0)
    take_idx = pa.array(np.where(lmatch >= 0, lmatch, 0))
    cols = {}
    gl = g.filter(pa.array(left_mask))
    for c in left_cols:
        cols[c] = gl[c]
    for c in right_cols:
        taken = pc.take(g[f"_r_{c}"].combine_chunks(), take_idx)
        cols[f"matched_{c}"] = pc.if_else(valid, taken, pa.scalar(
            None, type=taken.type))
    return pa.table(cols).cast(out_schema)


def asof_join(left, right, on: str, ts_col: str,
              right_cols: list[str], tie_col: str | None = None,
              num_partitions: int = 64):
    """For every row of ``left``: the latest ``right`` row of the same
    ``on`` key with ``right.ts <= left.ts`` (inclusive), attached as
    ``matched_<col>`` columns (null when no prior right row).  Ties on
    (key, ts) among right rows resolve to the greatest ``tie_col``
    (default: the first of ``right_cols``) — deterministic under any
    partitioning.

    ``left`` / ``right`` are Datasets; left keeps all its columns."""
    from docling_ray.stages.dedup import _part_of

    tie = tie_col or right_cols[0]
    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    left_schema = _arrow_schema(left)
    right_schema = _arrow_schema(right)
    left_cols = [c for c in left_schema.names]

    r_fields = {c: right_schema.field(c).type for c in right_cols}
    canon = pa.schema(
        [left_schema.field(c) for c in left_cols]
        + [pa.field("_side", pa.int8()), pa.field("_tie", r_fields[tie])]
        + [pa.field(f"_r_{c}", t) for c, t in r_fields.items()])
    out_schema = pa.schema(
        [left_schema.field(c) for c in left_cols]
        + [pa.field(f"matched_{c}", t) for c, t in r_fields.items()])

    def _tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in left_cols}
        cols["_side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        cols["_tie"] = pa.nulls(b.num_rows, r_fields[tie])
        for c, t in r_fields.items():
            cols[f"_r_{c}"] = pa.nulls(b.num_rows, t)
        out = pa.table(cols).cast(canon)
        return out.append_column(
            "_part", pa.array(_part_of(out[on], num_partitions)))

    def _tag_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            if c in (on, ts_col):
                cols[c] = b[c]
            else:
                cols[c] = pa.nulls(b.num_rows, left_schema.field(c).type)
        cols["_side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        cols["_tie"] = b[tie]
        for c in r_fields:
            cols[f"_r_{c}"] = b[c]
        out = pa.table(cols).cast(canon)
        return out.append_column(
            "_part", pa.array(_part_of(out[on], num_partitions)))

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow"))
    return tagged.groupby("_part").map_groups(
        lambda g: _asof_partition(g, on, ts_col, list(r_fields), left_cols,
                                  out_schema),
        batch_format="pyarrow")


# -- range (interval) join --------------------------------------------------


def _range_count_partition(part: pa.Table, on: str, ts_col: str,
                           lo_us: int, hi_us: int, left_cols: list[str],
                           out_schema: pa.Schema) -> pa.Table:
    """One key-complete hash partition → left rows + ``n_in_window`` =
    count of right rows of the same key with
    ``left.ts + lo_us <= right.ts <= left.ts + hi_us`` (inclusive).

    Fully C, Arrow-first (the `_asof_partition` shape): the partition is
    pruned to (dictionary-encoded key, int64 ts, side) before any pandas
    object exists — payload columns never convert, they are attached at
    the end with ONE ``take`` on the original Arrow table.  Counting is
    per-key cumulative right count + two ``pd.merge_asof(by=key)``
    probes at the window bounds — the count is the difference
    (count ≤ hi) − (count ≤ lo−1).  Integer-microsecond arithmetic
    throughout, so the −1 lower-bound shift is exact."""
    import pandas as pd

    if part.num_rows == 0:
        return out_schema.empty_table()
    ts_us = pc.cast(part[ts_col], pa.int64()).to_numpy(
        zero_copy_only=False)
    side = part["_side"].to_numpy(zero_copy_only=False)
    # one dictionary encode makes the merge key a fixed-width int no
    # matter the key's logical type (string domains stay Arrow-side)
    codes = pc.dictionary_encode(part[on].combine_chunks()) \
        .indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.arange(part.num_rows, dtype=np.int64)
    lmask = side == 1
    lpos, lts, lcode = pos[lmask], ts_us[lmask], codes[lmask]
    lorder = np.argsort(lts, kind="stable")
    lpos, lts, lcode = lpos[lorder], lts[lorder], lcode[lorder]
    rmask = ~lmask
    rts, rcode = ts_us[rmask], codes[rmask]
    rorder = np.argsort(rts, kind="stable")
    rts, rcode = rts[rorder], rcode[rorder]
    right = pd.DataFrame({"_k": rcode, "_us": rts})
    right["_cum"] = right.groupby("_k", sort=False).cumcount() + 1

    def probe(bound_us):
        probe_left = pd.DataFrame({"_k": lcode, "_bound": bound_us})
        m = pd.merge_asof(probe_left, right, left_on="_bound",
                          right_on="_us", by="_k", direction="backward")
        return m["_cum"].fillna(0).to_numpy(dtype=np.int64)

    n = probe(lts + hi_us) - probe(lts + lo_us - 1)
    out = part.select(left_cols).take(pa.array(lpos))
    out = out.append_column("n_in_window", pa.array(n, pa.int64()))
    return out.cast(out_schema)


def range_join_count(left, right, on: str, ts_col: str,
                     lo_us: int, hi_us: int, num_partitions: int = 64):
    """Interval-join aggregate: for every ``left`` row, the COUNT of
    ``right`` rows sharing its ``on`` key whose timestamp falls in
    ``[left.ts + lo_us, left.ts + hi_us]`` (bounds inclusive,
    microseconds).  Same single-shuffle key-partitioned shape as
    ``asof_join``; emitting the count rather than the pairs keeps the
    output linear in the LEFT side no matter how dense the window
    (the quadratic-blowup guard a pair-emitting range join needs)."""
    from docling_ray.stages.dedup import _part_of

    def _schema_of(ds) -> pa.Schema:
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    left_schema = _schema_of(ds=left)
    left_cols = list(left_schema.names)
    canon = pa.schema([left_schema.field(c) for c in left_cols]
                      + [pa.field("_side", pa.int8())])
    out_schema = pa.schema([left_schema.field(c) for c in left_cols]
                           + [pa.field("n_in_window", pa.int64())])

    def _tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for c in left_cols:
                if side == 1 or c in (on, ts_col):
                    cols[c] = b[c]
                else:
                    cols[c] = pa.nulls(b.num_rows, left_schema.field(c).type)
            cols["_side"] = pa.array(
                np.full(b.num_rows, side, dtype=np.int8))
            out = pa.table(cols).cast(canon)
            return out.append_column(
                "_part", pa.array(_part_of(out[on], num_partitions)))
        return fn

    tagged = left.map_batches(_tag(1), batch_format="pyarrow").union(
        right.map_batches(_tag(0), batch_format="pyarrow"))
    return tagged.groupby("_part").map_groups(
        lambda g: _range_count_partition(g, on, ts_col, lo_us, hi_us,
                                         left_cols, out_schema),
        batch_format="pyarrow")


def shuffle_join(left, right, on, right_on=None, how: str = "inner",
                 num_partitions: int = 32, **kwargs):
    """Large-large relational join as Ray Data's native hash-shuffle join
    (``Dataset.join``, Ray >= 2.46): both sides are hash-partitioned on
    the key and each partition pair is joined independently — the shape
    that holds when NEITHER side fits in a worker's heap.  Use
    ``BroadcastLookupJoin`` instead whenever one side is small enough to
    ``ray.put`` once (dimension tables): it skips the big side's shuffle
    entirely.

    ``how``: inner / left_outer / right_outer / full_outer / left_semi /
    right_semi / left_anti / right_anti.  Semi/anti emit LEFT (resp.
    right) columns only — the relational EXISTS / NOT EXISTS forms, which
    is also the scale-safe way to apply a large drop-list (anti) without
    broadcasting it.

    ``num_partitions`` bounds per-partition memory: size it so
    (|left| + |right|) / P fits a worker heap; skewed keys concentrate in
    one partition, so salt or pre-aggregate the hot side first (the
    repo-wide skew rule, see stages/dedup.py).
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) \
        else (tuple(right_on) if right_on is not None else None)
    return left.join(right, join_type=how, num_partitions=num_partitions,
                     on=on, right_on=right_on, **kwargs)

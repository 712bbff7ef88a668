"""Gap-based sessionization — the stateful streaming-window operator a
telemetry / training-data pipeline needs (session = a user's events with
inter-event gaps ≤ ``gap``).

Ray shape: the high-cardinality ``user_id`` key is pre-bucketed onto
``part = hash(user) % P`` (the engine's standard defense against the
per-group-UDF trap), and each partition runs ONE vectorized pass: sort by
(user, ts), boundary mask = new-user OR gap-exceeded, run detection for
per-session aggregates.  One shuffle of (user, ts) pairs; Python executes
P times, never per user or per session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_ray.stages.dedup import _part_of

DEFAULT_GAP_US = 30 * 60 * 1_000_000        # 30 minutes


def session_partition(part: pa.Table, gap_us: int,
                      user_column: str, ts_column: str) -> pa.Table:
    """One hash partition → per-session rows
    ``(user_id, session_id, n_events, start_us, end_us)``; session_id is
    0-based per user in time order."""
    user_type = part.schema.field(user_column).type
    n = part.num_rows
    if n == 0:
        return pa.table({
            user_column: pa.array([], user_type),
            "session_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "start_us": pa.array([], pa.int64()),
            "end_us": pa.array([], pa.int64()),
        })
    order = pa.compute.sort_indices(
        part, sort_keys=[(user_column, "ascending"), (ts_column, "ascending")])
    g = part.take(order)
    us = g[ts_column].to_numpy(zero_copy_only=False).astype(np.int64)
    users = g[user_column].to_numpy(zero_copy_only=False)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = users[1:] != users[:-1]
    boundary = new_user.copy()
    boundary[1:] |= (us[1:] - us[:-1]) > gap_us
    # per-user 0-based session index: global boundary cumsum minus the
    # value at the user's first row
    sid_global = np.cumsum(boundary) - 1
    user_start = np.flatnonzero(new_user)
    base = np.repeat(sid_global[user_start], np.diff(
        np.append(user_start, n)))
    session_id = sid_global - base
    # session runs
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], n)
    return pa.table({
        user_column: pa.array(users[starts], user_type),
        "session_id": pa.array(session_id[starts], pa.int64()),
        "n_events": pa.array(ends - starts, pa.int64()),
        "start_us": pa.array(us[starts], pa.int64()),
        "end_us": pa.array(us[ends - 1], pa.int64()),
    })


def sessionize(ds, user_column: str = "user_id", ts_column: str = "ts",
               gap_us: int = DEFAULT_GAP_US, num_partitions: int = 64):
    """Event dataset → per-session rows.  ``ts_column`` may be an Arrow
    timestamp (pinned to µs) or an integer epoch-µs column.

    Null handling (documented contract, mirrored by the oracle): rows
    with a null user or timestamp carry no session identity and are
    DROPPED — an int64 null would otherwise round-trip through NaN and
    corrupt boundaries."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        col = batch[ts_column]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        out = pa.table({
            user_column: batch[user_column],
            ts_column: col,
        })
        valid = pc.and_(pc.is_valid(out[user_column]),
                        pc.is_valid(out[ts_column]))
        out = out.filter(valid)
        return out.append_column(
            "_part", pa.array(_part_of(out[user_column], num_partitions),
                              pa.int64()))

    sch = ds.schema()
    user_type = dict(zip(sch.names, sch.types))[user_column]
    sessions = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda p: session_partition(p.drop_columns(["_part"]), gap_us,
                                        user_column, ts_column),
            batch_format="pyarrow")
    # seed a 0-row typed block so an empty result keeps its schema
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        user_column: pa.array([], user_type),
        "session_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "start_us": pa.array([], pa.int64()),
        "end_us": pa.array([], pa.int64()),
    }))
    return empty.union(sessions)

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


def running_totals_partition(part: pa.Table, user_column: str,
                             ts_column: str, id_column: str) -> pa.Table:
    """One hash partition → per-event running aggregates: sort by
    (user, ts, id), detect user boundaries, subtract each user's prefix
    base from the global cumulatives — one vectorized pass, no per-user
    Python.  The amount arrives pre-floored as the ``_centi`` column
    (``running_totals``'s prep stage owns the unit conversion)."""
    user_type = part.schema.field(user_column).type
    id_type = part.schema.field(id_column).type
    n = part.num_rows
    if n == 0:
        return pa.table({
            id_column: pa.array([], id_type),
            user_column: pa.array([], user_type),
            "running_n": pa.array([], pa.int64()),
            "running_centi": pa.array([], pa.int64()),
        })
    order = pa.compute.sort_indices(
        part, sort_keys=[(user_column, "ascending"),
                         (ts_column, "ascending"),
                         (id_column, "ascending")])
    g = part.take(order)
    users = g[user_column].to_numpy(zero_copy_only=False)
    centi = g["_centi"].to_numpy(zero_copy_only=False)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = users[1:] != users[:-1]
    starts = np.flatnonzero(new_user)
    sizes = np.diff(np.append(starts, n))
    idx = np.arange(n, dtype=np.int64)
    running_n = idx - np.repeat(starts, sizes) + 1
    cum = np.cumsum(centi)
    base = np.repeat(cum[starts] - centi[starts], sizes)
    return pa.table({
        id_column: g[id_column],
        user_column: g[user_column],
        "running_n": pa.array(running_n, pa.int64()),
        "running_centi": pa.array(cum - base, pa.int64()),
    })


def running_totals(ds, user_column: str = "user_id", ts_column: str = "ts",
                   id_column: str = "event_id",
                   amount_column: str = "value",
                   num_partitions: int = 64):
    """Per-event running aggregates over each user's time-ordered stream
    (the prefix-window operator: ``ROW_NUMBER`` + running sum): emits
    ``(id, user, running_n, running_centi)`` per input event.

    The amount is floored to integer centi-units BEFORE accumulating, so
    the running sum is exact integer arithmetic on both sides — a float
    cumsum's result depends on accumulation strategy and would not
    hash-compare.  Same shape as ``sessionize``: hash(user) pre-bucket,
    ONE shuffle, one vectorized pass per partition.  Rows with a null
    user, timestamp or id are dropped (no window identity)."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch[ts_column]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
        amt = pc.cast(
            pc.floor(pc.multiply(
                pc.cast(batch[amount_column], pa.float64()), 100.0)),
            pa.int64())
        out = pa.table({
            id_column: batch[id_column],
            user_column: batch[user_column],
            ts_column: ts,
            "_centi": pc.fill_null(amt, 0),
        })
        valid = pc.and_(pc.and_(pc.is_valid(out[user_column]),
                                pc.is_valid(out[ts_column])),
                        pc.is_valid(out[id_column]))
        out = out.filter(valid)
        return out.append_column(
            "_part", pa.array(_part_of(out[user_column], num_partitions),
                              pa.int64()))

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda p: running_totals_partition(
                p.drop_columns(["_part"]), user_column, ts_column,
                id_column),
            batch_format="pyarrow")
    # seed a 0-row typed block so an empty result keeps its schema
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        id_column: pa.array([], types[id_column]),
        user_column: pa.array([], types[user_column]),
        "running_n": pa.array([], pa.int64()),
        "running_centi": pa.array([], pa.int64()),
    }))
    return empty.union(out)


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


# -- funnel analysis ----------------------------------------------------------


def funnel_partition(part: pa.Table, steps: list, user_column: str,
                     ts_column: str, type_column: str,
                     order_column: str) -> pa.Table:
    """One user-complete partition → ``(user_id, funnel_depth)``: the
    longest prefix of ``steps`` that occurs as an ORDERED subsequence of
    the user's events (strict order on ``(ts, order_column)``).  Greedy
    earliest-match per step, each step one vectorized pandas
    groupby-min — Python runs len(steps) times per partition, never per
    user."""
    import pandas as pd
    import pyarrow.compute as pc

    user_type = part.schema.field(user_column).type
    empty = pa.table({user_column: pa.array([], user_type),
                      "funnel_depth": pa.array([], pa.int64())})
    n = part.num_rows
    if n == 0:
        return empty
    order = pc.sort_indices(part, sort_keys=[
        (user_column, "ascending"), (ts_column, "ascending"),
        (order_column, "ascending")])
    g = part.take(order)
    users = g[user_column].to_numpy(zero_copy_only=False)
    types = g[type_column].to_numpy(zero_copy_only=False)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = users[1:] != users[:-1]
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, n))
    # 0-based position within each user's time-ordered events: the
    # strict-subsequence order both sides compare on
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    uniq_users = users[starts]
    depth = np.zeros(len(uniq_users), np.int64)
    # prev[u] = position of the step-k match; only users still "alive"
    # (matched every step so far) advance
    prev = pd.Series(np.full(len(uniq_users), -1, np.int64),
                     index=pd.Index(uniq_users))
    df = pd.DataFrame({"u": users, "pos": pos, "t": types})
    for k, step in enumerate(steps):
        cand = df[df["t"] == step]
        if not len(cand):
            break
        lim = prev.reindex(cand["u"].to_numpy())
        alive = lim.notna().to_numpy() & (cand["pos"].to_numpy()
                                          > lim.fillna(np.inf).to_numpy())
        cand = cand[alive]
        if not len(cand):
            break
        found = cand.groupby("u", sort=False)["pos"].min()
        depth[pd.Index(uniq_users).get_indexer(found.index)] = k + 1
        prev = found
    return pa.table({
        user_column: g[user_column].take(pa.array(starts, pa.int64())),
        "funnel_depth": pa.array(depth),
    })


def funnel(ds, steps: list, user_column: str = "user_id",
           ts_column: str = "ts", type_column: str = "event_type",
           order_column: str = "event_id", num_partitions: int = 64):
    """Per-user funnel depth: the longest prefix of ``steps`` (event
    types) a user performed in order, matching greedily at the earliest
    opportunity (greedy earliest-match is optimal for subsequence
    existence).  Events are totally ordered by ``(ts, order_column)``
    so timestamp ties resolve deterministically.

    Shape: ONE hash(user) shuffle of (user, ts, order, type) rows, then
    len(steps) vectorized passes per partition.  Rows with a null user,
    ts or order are dropped (the sessionize null contract)."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        col = batch[ts_column]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        out = pa.table({
            user_column: batch[user_column],
            ts_column: col,
            order_column: batch[order_column],
            type_column: batch[type_column],
        })
        valid = pc.and_(pc.and_(pc.is_valid(out[user_column]),
                                pc.is_valid(out[ts_column])),
                        pc.is_valid(out[order_column]))
        out = out.filter(valid)
        return out.append_column(
            "_part", pa.array(_part_of(out[user_column], num_partitions),
                              pa.int64()))

    sch = ds.schema()
    user_type = dict(zip(sch.names, sch.types))[user_column]
    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda p: funnel_partition(p.drop_columns(["_part"]), steps,
                                       user_column, ts_column,
                                       type_column, order_column),
            batch_format="pyarrow")
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        user_column: pa.array([], user_type),
        "funnel_depth": pa.array([], pa.int64())}))
    return empty.union(out)


def hopping_window_rows(batch: pa.Table, ts_column: str = "ts",
                        size_us: int = 3_600_000_000,
                        hop_us: int = 900_000_000,
                        keep_columns: tuple = ("event_type", "value")
                        ) -> pa.Table:
    """Explode each event into its HOPPING (sliding) windows: windows of
    ``size_us`` starting at every multiple of ``hop_us``; an event at t
    falls in exactly ``size/hop`` windows (``hop`` must divide ``size``),
    with ``window_id = window_start / hop``.

    The explode multiplies only a PRUNED projection (window_id + the
    aggregation columns) by size/hop — 4× small rows here, never the
    payload — and feeds the same pre-aggregated groupby shuffle as the
    tumbling form, so the all-to-all moves partial aggregates.  Null
    timestamps carry no window identity and are dropped."""
    import numpy as np
    import pyarrow.compute as pc

    n_win = size_us // hop_us
    assert n_win * hop_us == size_us, "hop must divide size"
    batch = batch.filter(pc.is_valid(batch[ts_column]))
    epoch = batch[ts_column].cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    # floor division toward -inf (numpy //) matches SQL's floor(x/y)
    base = epoch // hop_us
    ids = (base[:, None] - np.arange(n_win)[None, :]).reshape(-1)
    out = {"window_id": pa.array(ids, pa.int64())}
    idx = np.repeat(np.arange(len(epoch)), n_win)
    for name in keep_columns:
        out[name] = batch[name].take(pa.array(idx))
    return pa.table(out)


# -- per-key LAG (inter-event deltas) ----------------------------------------


def lag_partition(part: pa.Table, user_column: str, ts_column: str,
                  id_column: str) -> pa.Table:
    """One hash partition → per-event rows ``(id, user, delta_us)``
    where ``delta_us`` is the µs gap to the user's previous event (ties
    broken by ``id_column``, mirroring the oracle's ORDER BY ts, id);
    NULL for each user's first event — SQL LAG semantics."""
    user_type = part.schema.field(user_column).type
    id_type = part.schema.field(id_column).type
    n = part.num_rows
    if n == 0:
        return pa.table({
            id_column: pa.array([], id_type),
            user_column: pa.array([], user_type),
            "delta_us": pa.array([], pa.int64()),
        })
    order = pa.compute.sort_indices(
        part, sort_keys=[(user_column, "ascending"),
                         (ts_column, "ascending"),
                         (id_column, "ascending")])
    g = part.take(order)
    us = g[ts_column].to_numpy(zero_copy_only=False).astype(np.int64)
    users = g[user_column].to_numpy(zero_copy_only=False)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = users[1:] != users[:-1]
    delta = np.empty(n, np.int64)
    delta[0] = 0
    delta[1:] = us[1:] - us[:-1]
    return pa.table({
        id_column: g[id_column],
        user_column: g[user_column],
        "delta_us": pa.array(delta, pa.int64(), mask=first),
    })


def event_lag(ds, user_column: str = "user_id", ts_column: str = "ts",
              id_column: str = "event_id", num_partitions: int = 64):
    """SQL ``LAG`` over a hash-bucketed shuffle: each event annotated
    with the µs gap to the same user's previous event (NULL first).
    Null user/ts rows are dropped (the ``sessionize`` contract).  One
    shuffle on ``hash(user) % P``; the per-partition pass is one C sort
    + a vectorized diff."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        col = batch[ts_column]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        out = pa.table({
            id_column: batch[id_column],
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
    types = dict(zip(sch.names, sch.types))
    lagged = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda p: lag_partition(p.drop_columns(["_part"]),
                                    user_column, ts_column, id_column),
            batch_format="pyarrow")
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        id_column: pa.array([], types[id_column]),
        user_column: pa.array([], types[user_column]),
        "delta_us": pa.array([], pa.int64()),
    }))
    return empty.union(lagged)

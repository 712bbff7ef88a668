"""Gap-based sessionization: vectorized per-partition semantics and
partition-count invariance."""

import numpy as np
import pyarrow as pa


def test_session_partition_boundaries():
    from docling_ray.stages.sessions import session_partition

    M = 1_000_000
    part = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 1], pa.int64()),
        "ts": pa.array([0, 10 * M, 4000 * M, 5 * M, 3700 * M, 3990 * M],
                       pa.int64()),
    })
    out = session_partition(part, gap_us=1800 * M,
                            user_column="user_id", ts_column="ts") \
        .to_pandas().sort_values(["user_id", "session_id"]) \
        .reset_index(drop=True)
    # user 1 sorted ts: 0, 10M, 3990M, 4000M -> sessions {0,10} and
    # {3990, 4000} (gap 3980 > 1800); user 2: 5 and 3700 -> two sessions
    assert out[["user_id", "session_id", "n_events",
                "start_us", "end_us"]].values.tolist() == [
        [1, 0, 2, 0, 10 * M],
        [1, 1, 2, 3990 * M, 4000 * M],
        [2, 0, 1, 5 * M, 5 * M],
        [2, 1, 1, 3700 * M, 3700 * M],
    ]


def test_sessionize_invariant_to_partitioning(ray_session):
    import ray.data

    from docling_ray.stages.sessions import sessionize

    rng = np.random.RandomState(3)
    n = 500
    table = pa.table({
        "user_id": pa.array(rng.randint(0, 40, size=n), pa.int64()),
        "ts": pa.array(np.sort(rng.randint(0, 10**12, size=n)), pa.int64()),
    })

    def run(parts, reparts):
        ds = ray.data.from_arrow(table).repartition(reparts)
        df = sessionize(ds, num_partitions=parts).to_pandas()
        return sorted(map(tuple, df.values.tolist()))

    assert run(8, 3) == run(64, 11)


def test_sessionize_drops_null_rows_and_keeps_empty_schema(ray_session):
    """Null user/ts rows carry no session identity: dropped (mirrored in
    the oracle), never NaN-corrupted; an empty result keeps its typed
    schema (Ray quirk: map_groups over nothing loses it otherwise)."""
    import ray.data

    from docling_ray.stages.sessions import sessionize

    t = pa.table({
        "user_id": pa.array([1, None, 1, 2], pa.int64()),
        "ts": pa.array([0, 5, 10_000_000, None], pa.int64()),
    })
    df = sessionize(ray.data.from_arrow(t)).to_pandas()
    assert sorted(df["user_id"].tolist()) == [1]
    assert df["n_events"].tolist() == [2]
    out = sessionize(ray.data.from_arrow(t.slice(0, 0)))
    assert out.schema().names == ["user_id", "session_id", "n_events",
                                  "start_us", "end_us"]
    assert out.count() == 0

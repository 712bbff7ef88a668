"""As-of join (docling_ray/stages/joins.py): vectorized partition pass
semantics + dataset-level equivalence with a brute-force oracle."""

import numpy as np
import pyarrow as pa

from docling_ray.stages.joins import asof_join


def _brute_force(left_rows, right_rows):
    """(key, ts, id) left rows × (key, ts, id, val) right rows →
    {left_id: (matched_id, matched_val) | None}: latest right.ts <= ts,
    tie → greatest right id."""
    out = {}
    for k, ts, lid in left_rows:
        best = None
        for rk, rts, rid, rval in right_rows:
            if rk == k and rts <= ts:
                if best is None or (rts, rid) > (best[0], best[1]):
                    best = (rts, rid, rval)
        out[lid] = (best[1], best[2]) if best else None
    return out


def _run(left_rows, right_rows, ray, parts=(1, 7)):
    left = pa.table({
        "user_id": pa.array([r[0] for r in left_rows], pa.int64()),
        "ts": pa.array([r[1] for r in left_rows], pa.int64()),
        "event_id": pa.array([r[2] for r in left_rows], pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([r[0] for r in right_rows], pa.int64()),
        "ts": pa.array([r[1] for r in right_rows], pa.int64()),
        "event_id": pa.array([r[2] for r in right_rows], pa.int64()),
        "value": pa.array([r[3] for r in right_rows], pa.float64()),
    })
    results = []
    for p in parts:
        out = asof_join(
            ray.data.from_arrow(left).repartition(p),
            ray.data.from_arrow(right).repartition(p),
            on="user_id", ts_col="ts",
            right_cols=["event_id", "value"]).take_all()
        results.append({r["event_id"]:
                        (r["matched_event_id"], r["matched_value"])
                        for r in out})
    return results


def test_asof_semantics(ray_session):
    import ray

    left = [(1, 100, 10), (1, 50, 11), (2, 100, 12), (3, 100, 13),
            (1, 60, 14)]
    right = [(1, 60, 20, 1.0),   # exact-ts match for left id 14 (inclusive)
             (1, 90, 21, 2.0),
             (2, 100, 22, 3.0), (2, 100, 23, 4.0),  # ts tie → id 23 wins
             (4, 10, 24, 5.0)]   # other key: never matches
    expect = _brute_force(left, right)
    assert expect == {10: (21, 2.0), 11: None, 12: (23, 4.0),
                      13: None, 14: (20, 1.0)}
    for got in _run(left, right, ray):
        want = {lid: (m if m else (None, None)) for lid, m in expect.items()}
        assert got == want


def test_asof_random_vs_brute_force_partition_invariant(ray_session):
    import ray

    rng = np.random.default_rng(5)
    left = [(int(rng.integers(0, 12)), int(rng.integers(0, 1000)), 1000 + i)
            for i in range(150)]
    right = [(int(rng.integers(0, 12)), int(rng.integers(0, 1000)),
              2000 + i, float(i)) for i in range(200)]
    expect = {lid: (m if m else (None, None))
              for lid, m in _brute_force(left, right).items()}
    a, b = _run(left, right, ray, parts=(2, 13))
    assert a == expect
    assert b == expect


def test_asof_empty_right(ray_session):
    import ray

    got, = _run([(1, 5, 10)], [(9, 1, 20, 0.5)], ray, parts=(3,))
    assert got == {10: (None, None)}


# -- range join -------------------------------------------------------------

from docling_ray.stages.joins import range_join_count  # noqa: E402


def _brute_count(left_rows, right_rows, lo, hi):
    out = {}
    for k, ts, lid in left_rows:
        out[lid] = sum(1 for rk, rts, _rid, _v in right_rows
                       if rk == k and ts + lo <= rts <= ts + hi)
    return out


def test_range_join_count_semantics(ray_session):
    import ray

    left = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([100, 200, 100], pa.int64()),
        "event_id": pa.array([10, 11, 12], pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([90, 100, 201, 95, 100], pa.int64()),
        "event_id": pa.array([20, 21, 22, 23, 24], pa.int64()),
    })
    out = range_join_count(ray.data.from_arrow(left),
                           ray.data.from_arrow(right),
                           on="user_id", ts_col="ts",
                           lo_us=-10, hi_us=0).take_all()
    got = {r["event_id"]: r["n_in_window"] for r in out}
    # id 10 (u1, ts100, window [90,100]): right 90 and 100 → 2
    # id 11 (u1, ts200, window [190,200]): none (201 is outside) → 0
    # id 12 (u2, ts100, window [90,100]): right 95 → 1 (u3 ignored)
    assert got == {10: 2, 11: 0, 12: 1}


def test_range_join_random_vs_brute_force(ray_session):
    import ray
    import numpy as np

    rng = np.random.default_rng(13)
    lrows = [(int(rng.integers(0, 9)), int(rng.integers(0, 500)), 1000 + i)
             for i in range(120)]
    rrows = [(int(rng.integers(0, 9)), int(rng.integers(0, 500)),
              2000 + i, 0.0) for i in range(180)]
    left = pa.table({
        "user_id": pa.array([r[0] for r in lrows], pa.int64()),
        "ts": pa.array([r[1] for r in lrows], pa.int64()),
        "event_id": pa.array([r[2] for r in lrows], pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([r[0] for r in rrows], pa.int64()),
        "ts": pa.array([r[1] for r in rrows], pa.int64()),
        "event_id": pa.array([r[2] for r in rrows], pa.int64()),
    })
    expect = _brute_count(lrows, rrows, -25, 25)
    for p in (2, 11):
        out = range_join_count(ray.data.from_arrow(left).repartition(p),
                               ray.data.from_arrow(right).repartition(p),
                               on="user_id", ts_col="ts",
                               lo_us=-25, hi_us=25).take_all()
        assert {r["event_id"]: r["n_in_window"] for r in out} == expect


def test_asof_hot_key_single_partition(ray_session):
    """Every row shares one key — the operator's documented partitioning
    assumption (a key lives wholly in one partition) in its worst case:
    still exact, the partition pass is vectorized so the hot partition
    costs O(n log n) sort, not O(n²)."""
    import ray

    left = [(7, t, 1000 + t) for t in range(0, 400, 2)]
    right = [(7, t, 2000 + t, float(t)) for t in range(1, 400, 4)]
    expect = {lid: (m if m else (None, None))
              for lid, m in _brute_force(left, right).items()}
    got, = _run(left, right, ray, parts=(9,))
    assert got == expect


# -- shuffle_join (native hash join wrapper) --------------------------------

def test_shuffle_join_inner_semi_anti(ray_session):
    """inner/semi/anti against brute force, with duplicate keys on both
    sides (inner must emit the cross product per key) and keys present on
    only one side."""
    import ray

    from docling_ray.stages.joins import shuffle_join

    left = pa.table({
        "k": pa.array([1, 1, 2, 3, 5], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"]),
    })
    right = pa.table({
        "rk": pa.array([1, 2, 2, 4], pa.int64()),
        "rv": pa.array([10, 20, 21, 40], pa.int64()),
    })
    lds = ray.data.from_arrow(left).repartition(3)
    rds = ray.data.from_arrow(right).repartition(2)

    inner = shuffle_join(lds, rds, on="k", right_on="rk", how="inner",
                         num_partitions=4).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in inner)
    assert got == [(1, "a", 10), (1, "b", 10),
                   (2, "c", 20), (2, "c", 21)]

    semi = shuffle_join(lds, rds, on="k", right_on="rk", how="left_semi",
                        num_partitions=4).take_all()
    assert sorted(r["lv"] for r in semi) == ["a", "b", "c"]
    assert all(set(r) == {"k", "lv"} for r in semi)  # left columns only

    anti = shuffle_join(lds, rds, on="k", right_on="rk", how="left_anti",
                        num_partitions=4).take_all()
    assert sorted(r["lv"] for r in anti) == ["d", "e"]

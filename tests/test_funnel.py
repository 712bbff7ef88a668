"""Per-user funnel depth (stages/sessions.py::funnel)."""

import pyarrow as pa


def _events(rows):
    # rows: (event_id, user, ts_us, type)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })


def _run(ray, rows, steps, parts=3):
    from docling_ray.stages.sessions import funnel

    ds = ray.data.from_arrow(_events(rows)).repartition(parts)
    return {r["user_id"]: r["funnel_depth"]
            for r in funnel(ds, steps).take_all()}


STEPS = ["signup", "click", "purchase"]


def test_funnel_depths(ray_session):
    import ray

    rows = [
        # user 1: full funnel in order
        (1, 1, 10, "signup"), (2, 1, 20, "click"), (3, 1, 30, "purchase"),
        # user 2: purchase BEFORE click → depth 2
        (4, 2, 10, "signup"), (5, 2, 15, "purchase"), (6, 2, 20, "click"),
        # user 3: never signed up → depth 0 (click/purchase don't count)
        (7, 3, 10, "click"), (8, 3, 20, "purchase"),
        # user 4: signup only
        (9, 4, 50, "signup"),
    ]
    got = _run(ray, rows, STEPS)
    assert got == {1: 3, 2: 2, 3: 0, 4: 1}


def test_funnel_greedy_earliest_is_optimal(ray_session):
    import ray

    # signup@10, click@15, signup@20, purchase@25: greedy takes
    # signup@10 → click@15 → purchase@25 = 3
    rows = [(1, 1, 10, "signup"), (2, 1, 15, "click"),
            (3, 1, 20, "signup"), (4, 1, 25, "purchase")]
    assert _run(ray, rows, STEPS) == {1: 3}


def test_funnel_ts_tie_resolved_by_event_id(ray_session):
    import ray

    # same timestamp: order falls back to event_id, so signup(id 1) <
    # click(id 2) counts as ordered
    rows = [(1, 1, 10, "signup"), (2, 1, 10, "click")]
    assert _run(ray, rows, ["signup", "click"]) == {1: 2}
    # reversed ids: click comes first in the total order → depth 1
    rows = [(2, 1, 10, "signup"), (1, 1, 10, "click")]
    assert _run(ray, rows, ["signup", "click"]) == {1: 1}


def test_funnel_partition_invariance(ray_session):
    import ray
    import numpy as np

    rng = np.random.default_rng(3)
    types = ["signup", "click", "purchase", "view"]
    rows = [(i, int(rng.integers(0, 20)), int(rng.integers(0, 1000)),
             types[int(rng.integers(0, 4))]) for i in range(400)]
    a = _run(ray, rows, STEPS, parts=1)
    b = _run(ray, rows, STEPS, parts=8)
    assert a == b and len(a) == len({u for _, u, _, _ in rows})

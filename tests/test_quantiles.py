"""Exact distributed quantiles (docling_ray/stages/quantiles.py)."""

import numpy as np
import pyarrow as pa

from docling_ray.stages.quantiles import grouped_quantiles


def _ds(ray, groups, values, parts=4):
    t = pa.table({"g": pa.array(groups), "v": pa.array(values, pa.int64())})
    return ray.data.from_arrow(t).repartition(parts)


def _lookup(tab, g, pct):
    for row in tab.to_pylist():
        if row.get("g", None) == g and row["q_pct"] == pct:
            return row["value"]
    raise KeyError((g, pct))


def test_quantiles_known_values(ray_session):
    import ray

    # 1..100 in one group: pct-th percentile of 1..100 is exactly pct
    ds = _ds(ray, ["a"] * 100, list(range(1, 101)))
    out = grouped_quantiles(ds, "v", "g", pcts=(25, 50, 75, 90, 99))
    for pct in (25, 50, 75, 90, 99):
        assert _lookup(out, "a", pct) == pct


def test_quantiles_per_group_and_ties(ray_session):
    import ray

    groups = ["x"] * 6 + ["y"] * 4
    values = [5, 5, 5, 7, 7, 9] + [1, 2, 3, 4]
    ds = _ds(ray, groups, values, parts=3)
    out = grouped_quantiles(ds, "v", "g", pcts=(50, 99))
    # x: n=6, cum(5)=3 → 3*100 >= 50*6 → median 5; 99th → first cum*100>=594 → 9
    assert _lookup(out, "x", 50) == 5
    assert _lookup(out, "x", 99) == 9
    # y: n=4, cum(2)=2 → 200 >= 200 → median 2
    assert _lookup(out, "y", 50) == 2
    assert _lookup(out, "y", 99) == 4


def test_quantiles_ungrouped_matches_numpy_contract(ray_session):
    import ray

    rng = np.random.default_rng(6)
    vals = rng.integers(0, 1000, size=500).tolist()
    ds = _ds(ray, ["_"] * 500, vals)
    out = grouped_quantiles(ds, "v", group_col=None, pcts=(50, 90))
    assert "g" not in out.column_names
    svals = np.sort(vals)
    for pct in (50, 90):
        # contract: smallest value with cum*100 >= pct*n
        cum = np.arange(1, 501)
        expect = svals[np.searchsorted(cum * 100, pct * 500)]
        got = [r["value"] for r in out.to_pylist() if r["q_pct"] == pct][0]
        assert got == expect


def test_quantiles_partition_invariant(ray_session):
    import ray

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, size=300).tolist()
    groups = rng.choice(["a", "b", "c"], size=300).tolist()
    a = grouped_quantiles(_ds(ray, groups, vals, parts=1), "v", "g")
    b = grouped_quantiles(_ds(ray, groups, vals, parts=7), "v", "g")
    assert sorted(a.to_pylist(), key=str) == sorted(b.to_pylist(), key=str)


def test_quantiles_empty_input(ray_session):
    import ray

    ds = _ds(ray, [], [], parts=1)
    out = grouped_quantiles(ds, "v", "g")
    assert out.num_rows == 0
    assert set(out.column_names) == {"g", "q_pct", "value"}


def test_quantiles_preserves_group_type_and_null_group(ray_session):
    import ray

    t = pa.table({
        "g": pa.array([1, 1, 2, 2, None], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })
    out = grouped_quantiles(ray.data.from_arrow(t).repartition(2), "v",
                            "g", pcts=(50,))
    # group column keeps its int64 type (never stringified) and the
    # null group is its own group, not a crash
    assert out.schema.field("g").type == pa.int64()
    got = {r["g"]: r["value"] for r in out.to_pylist()}
    assert got == {1: 10, 2: 30, None: 50}

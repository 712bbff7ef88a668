"""Distributed prefix scan + sequence packing (stages/scan.py)."""

import numpy as np
import pyarrow as pa


def test_global_cumsum_matches_brute_force(ray_session):
    import ray

    from docling_ray.stages.scan import global_cumsum

    rng = np.random.default_rng(7)
    n = 1000
    t = pa.table({"doc_id": pa.array(rng.permutation(n), pa.int64()),
                  "w": pa.array(rng.integers(0, 50, n), pa.int64())})
    out = global_cumsum(ray.data.from_arrow(t).repartition(7),
                        "doc_id", "w").take_all()
    out.sort(key=lambda r: r["doc_id"])
    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    incl = df["w"].cumsum().to_numpy()
    assert [r["cum_incl"] for r in out] == list(incl)
    assert [r["cum_excl"] for r in out] == list(incl - df["w"].to_numpy())


def test_global_cumsum_string_order_key(ray_session):
    import ray

    from docling_ray.stages.scan import global_cumsum

    t = pa.table({"k": pa.array(["d", "a", "c", "b"]),
                  "w": pa.array([4, 1, 3, 2], pa.int64())})
    out = {r["k"]: r["cum_excl"]
           for r in global_cumsum(ray.data.from_arrow(t).repartition(2),
                                  "k", "w").take_all()}
    assert out == {"a": 0, "b": 1, "c": 3, "d": 6}


def test_pack_sequences_boundaries(ray_session):
    """Docs straddle budget boundaries (concat packing contract): the
    sequence id is where the doc STARTS."""
    import ray

    from docling_ray.stages.scan import pack_sequences

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n_tokens": pa.array([60, 60, 60], pa.int64())})
    out = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
           for r in pack_sequences(ray.data.from_arrow(t).repartition(2),
                                   budget=100).take_all()}
    assert out == {1: (0, 0), 2: (0, 60), 3: (1, 20)}

"""Incremental dedup index (sharded-actor shared state) tests."""

import pyarrow as pa


def test_incremental_dedup_within_and_across_runs(ray_session):
    import ray
    import ray.data

    from docling_ray.state.dedup_index import create_index, incremental_dedup

    shards = create_index(num_shards=3)
    table = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["alpha", "beta", "alpha", "gamma", "beta"],
    })
    ds = ray.data.from_arrow(table)
    first = incremental_dedup(ds, shards).to_pandas()
    # exactly one survivor per distinct text
    assert sorted(first["text"]) == ["alpha", "beta", "gamma"]
    # re-ingesting the same corpus: index remembers -> zero survivors
    second = incremental_dedup(ds, shards).to_pandas()
    assert len(second) == 0
    # new content still passes
    third = incremental_dedup(ray.data.from_arrow(pa.table({
        "doc_id": [9], "text": ["delta"]})), shards).to_pandas()
    assert third["text"].tolist() == ["delta"]
    total = sum(ray.get([s.size.remote() for s in shards]))
    assert total == 4  # alpha, beta, gamma, delta


def test_index_dump_load_roundtrip(ray_session):
    import ray
    import ray.data

    from docling_ray.state.dedup_index import create_index, incremental_dedup

    shards = create_index(num_shards=2)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["one", "two"]}))
    incremental_dedup(ds, shards).to_pandas()
    blobs = ray.get([s.dump.remote() for s in shards])
    # fresh index restored from the snapshots drops the same docs
    restored = create_index(num_shards=2)
    ray.get([s.load.remote(b) for s, b in zip(restored, blobs)])
    again = incremental_dedup(ds, restored).to_pandas()
    assert len(again) == 0

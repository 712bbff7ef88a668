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


def test_index_dump_restore_across_shard_counts(ray_session):
    import ray
    import ray.data

    from docling_ray.state.dedup_index import (
        create_index,
        incremental_dedup,
        restore_index,
    )

    shards = create_index(num_shards=2)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3], "text": ["one", "two", "three"]}))
    incremental_dedup(ds, shards).to_pandas()
    blobs = ray.get([s.dump.remote() for s in shards])
    # restored onto a DIFFERENT shard count: records re-route, lookups
    # still hit (the naive per-shard load silently lost them)
    restored = create_index(num_shards=5)
    assert restore_index(restored, blobs) >= 3
    again = incremental_dedup(ds, restored).to_pandas()
    assert len(again) == 0


def test_retry_idempotence_and_null_text(ray_session):
    import ray

    from docling_ray.state.dedup_index import (
        IncrementalDedupFilter,
        create_index,
    )

    shards = create_index(num_shards=2)
    filt = IncrementalDedupFilter(shards)
    batch = pa.table({"doc_id": [1, 2, 3, 4],
                      "text": ["alpha", "beta", None, None]})
    out1 = filt(batch)
    # null-text rows are NOT deduped against each other or ""
    assert out1["doc_id"].to_pylist() == [1, 2, 3, 4]
    # a Ray task retry re-runs the same batch: same token -> same answers,
    # not zero rows
    out2 = filt(batch)
    assert out2["doc_id"].to_pylist() == [1, 2, 3, 4]
    # a DIFFERENT batch with the same texts is a true duplicate
    other = pa.table({"doc_id": [9], "text": ["alpha"]})
    assert len(filt(other)) == 0
    _ = ray

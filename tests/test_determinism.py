"""Determinism under parallelism — the engine's analog of the reference's
threaded-vs-standard equivalence tests
(``/root/reference/tests/test_threaded_pipeline.py:19-117``): the same
input must produce identical outputs regardless of block count, batch
size, or actor concurrency."""

import pyarrow as pa


def _sorted_df(ds, keys):
    return ds.to_pandas().sort_values(keys).reset_index(drop=True)


def test_extraction_invariant_to_blocks_and_batch_size(ray_session):
    import ray.data

    from docling_ray.pipelines.extract_pipeline import extract_dataset
    from docling_ray.sources.webpages import make_table

    table = make_table(80, seed=11)
    a = _sorted_df(extract_dataset(
        ray.data.from_arrow(table).repartition(2), batch_size=64), ["url"])
    b = _sorted_df(extract_dataset(
        ray.data.from_arrow(table).repartition(13), batch_size=7), ["url"])
    assert a.equals(b)


def test_pdf_pipeline_invariant_to_layout_concurrency(ray_session):
    import ray.data

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.pdf import pdf_pages_pipeline

    table, _ = make_pdf_pages_table(10, seed=13)
    a = _sorted_df(pdf_pages_pipeline(
        ray.data.from_arrow(table), layout_concurrency=1), ["doc_id"])
    b = _sorted_df(pdf_pages_pipeline(
        ray.data.from_arrow(table).repartition(7), layout_concurrency=3),
        ["doc_id"])
    assert a.equals(b)


def test_minhash_invariant_to_partition_count(ray_session):
    import ray.data

    from docling_ray.stages.dedup import minhash_near_dups

    base = ("alpha beta gamma delta epsilon zeta eta theta " * 6)
    rows = {"doc_id": [f"d{i}" for i in range(8)],
            "text": [base, base, base.replace("zeta", "omega"),
                     "one two three " * 20, "four five six " * 20,
                     base, "seven eight nine " * 20, base + " tail words"]}
    ds = ray.data.from_arrow(pa.table(rows))
    a = _sorted_df(minhash_near_dups(ds, num_partitions=2),
                   ["doc_a", "doc_b"])
    b = _sorted_df(minhash_near_dups(ds.repartition(5), num_partitions=64),
                   ["doc_a", "doc_b"])
    assert a.equals(b)


def test_dedup_family_invariant_to_partition_count(ray_session):
    """The round-3 dedup shapes key their shuffles on hash(x) % P: the
    emitted PAIR/SURVIVOR SETS must not depend on P or on input block
    layout."""
    import ray.data

    from docling_ray.stages.dedup import (
        exact_dedup_keep_first,
        exact_dedup_losers,
        jaccard_near_dups,
        minhash_near_dups,
        simhash_near_dups,
    )
    from docling_ray.stages.textstats import fingerprint_batch

    base = ("stream data batch query table scan merge sort join filter "
            "shard spill vector page cell block arrow shuffle") * 4
    rows = {"doc_id": [], "text": []}
    for i in range(24):
        rows["doc_id"].append(i)
        rows["text"].append(f"unique {i} " +
                            " ".join(f"w{i}_{j}" for j in range(30)))
    rows["doc_id"] += [100, 101, 102]
    rows["text"] += [base, base.replace("arrow", "parquet"), base]
    table = pa.table(rows)

    def pair_set(fn, **kw):
        out = []
        for parts, reparts in ((8, 2), (64, 11)):
            ds = ray.data.from_arrow(table).repartition(reparts)
            df = fn(ds, num_partitions=parts, **kw).to_pandas()
            out.append(set(zip(df["doc_a"], df["doc_b"])))
        return out

    for fn, kw in ((minhash_near_dups, {"threshold": 0.5}),
                   (simhash_near_dups, {"max_hamming": 3}),
                   (jaccard_near_dups, {"threshold": 0.5})):
        a, b = pair_set(fn, **kw)
        assert a == b, f"{fn.__name__} pair set depends on partitioning"
        assert a, f"{fn.__name__} found no pairs on the planted corpus"

    fp = ray.data.from_arrow(table).map_batches(
        fingerprint_batch, batch_format="pyarrow")
    keep_a = set(exact_dedup_keep_first(
        fp, num_partitions=8).to_pandas()["doc_id"])
    keep_b = set(exact_dedup_keep_first(
        fp.repartition(9), num_partitions=64).to_pandas()["doc_id"])
    assert keep_a == keep_b
    lose_a = set(exact_dedup_losers(
        fp, num_partitions=8).to_pandas()["doc_id"])
    lose_b = set(exact_dedup_losers(
        fp.repartition(5), num_partitions=64).to_pandas()["doc_id"])
    assert lose_a == lose_b == {102}          # 100 survives, 102 is the dup
    assert keep_a | lose_a == set(table["doc_id"].to_pylist())

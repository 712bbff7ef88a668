"""Generator-side TRUE goldens: the corpus generator predicts the
extraction item counts and the chunk stream from its own construct
emission (sources/webpages.py), independent of the pipeline.  These tests
run the REAL pipeline against those predictions on seeds that are NOT the
committed-golden seed, so a walker or chunker regression breaks them even
if the committed parquet files were regenerated."""

import pyarrow as pa


def test_extract_matches_generator_expectation_fresh_seed():
    from docling_ray.sources.webpages import make_expected_table, make_table
    from docling_ray.stages.extract import extract_batch, hash_batch, sniff_batch

    n, seed = 150, 31
    out = extract_batch(hash_batch(sniff_batch(make_table(n, seed=seed))))
    exp = make_expected_table(n, seed=seed)
    got_items = dict(zip(out["url"].to_pylist(), out["n_items"].to_pylist()))
    want_items = dict(zip(exp["url"].to_pylist(), exp["n_items"].to_pylist()))
    assert got_items == want_items
    got_ids = dict(zip(out["url"].to_pylist(), out["doc_id"].to_pylist()))
    want_ids = dict(zip(exp["url"].to_pylist(), exp["doc_id"].to_pylist()))
    assert got_ids == want_ids
    assert set(out["status"].to_pylist()) == {"success"}


def test_chunks_match_generator_expectation_fresh_seed():
    from docling_ray.sources.webpages import (
        make_expected_chunks_table,
        make_table,
    )
    from docling_ray.stages.chunk import chunk_batch

    n, seed = 80, 31
    got = chunk_batch(make_table(n, seed=seed)) \
        .select(["url", "chunk_id", "n_tokens", "kind"])
    exp = make_expected_chunks_table(n, seed=seed)
    import pyarrow.compute as pc

    def canon(t: pa.Table) -> list[tuple]:
        idx = pc.sort_indices(t, sort_keys=[("url", "ascending"),
                                            ("chunk_id", "ascending")])
        s = t.take(idx)
        return list(zip(s["url"].to_pylist(), s["chunk_id"].to_pylist(),
                        s["n_tokens"].to_pylist(), s["kind"].to_pylist()))

    assert canon(got) == canon(exp)


def test_committed_goldens_are_generator_derived():
    """The committed golden parquet files must equal the generator's
    current predictions (regenerating must be a no-op)."""
    import os

    import pyarrow.parquet as pq

    from docling_ray.sources.webpages import (
        make_expected_chunks_table,
        make_expected_table,
    )

    data_dir = os.path.join(os.path.dirname(__file__), "data")
    ge = pq.read_table(os.path.join(data_dir, "golden_extract.parquet"))
    assert ge.equals(make_expected_table(120, seed=42))
    gc = pq.read_table(os.path.join(data_dir, "golden_chunks.parquet"))
    assert gc.equals(make_expected_chunks_table(60, seed=42))


def test_enrich_matches_generator_expectation_fresh_seed():
    from docling_ray.sources.webpages import (
        make_expected_enrich_table,
        make_table,
    )
    from docling_ray.stages.enrich import EnrichmentStage
    from docling_ray.stages.extract import extract_batch, sniff_batch

    n, seed = 70, 23
    ext = extract_batch(sniff_batch(make_table(n, seed=seed)),
                        emit_doc_json=True)
    enriched = EnrichmentStage()(ext.select(["url", "doc_json"]))
    got = dict(zip(enriched["url"].to_pylist(),
                   enriched["n_enriched"].to_pylist()))
    exp = make_expected_enrich_table(n, seed=seed)
    want = dict(zip(exp["url"].to_pylist(), exp["n_enriched"].to_pylist()))
    assert got == want


def test_multimodal_pages_match_generator_expectation_fresh_seed(ray_session):
    import hashlib

    import ray.data

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.pdf import multimodal_export_pipeline

    table, _, exp_pages = make_pdf_pages_table(25, seed=19, with_pages=True)
    out = multimodal_export_pipeline(ray.data.from_arrow(table)).to_pandas()
    assert len(out) == len(exp_pages)
    for _, row in out.iterrows():
        want = exp_pages[(row["doc_id"], row["page_no"])]
        assert hashlib.md5(row["content_text"].encode()).hexdigest() == \
            hashlib.md5(want.encode()).hexdigest()

"""Ray Data stage tests: extraction pipeline, resume manifest, dedup family,
ANN, and the driver contract surface."""

import numpy as np
import pyarrow as pa
import pytest

from docling_ray.sources.webpages import make_table


@pytest.fixture(scope="module")
def web_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(make_table(60, seed=7))


def test_corpus_deterministic():
    a = make_table(20, seed=5)
    b = make_table(20, seed=5)
    assert a.equals(b)
    c = make_table(20, seed=6)
    assert not a.equals(c)


def test_extract_pipeline_end_to_end(ray_session, web_ds):
    from docling_ray.pipelines.extract_pipeline import extract_dataset

    out = extract_dataset(web_ds).to_pandas()
    assert len(out) == 60
    assert (out["status"] == "success").all()
    assert (out["format"] == "html").all()
    assert out["extracted_text"].str.len().min() > 0
    assert "html" not in out.columns  # heavy payload projected away
    # markdown begins with the synthetic h1 title
    assert out["extracted_text"].str.startswith("# Document").all()


def test_extract_error_is_data_not_exception(ray_session):
    import ray.data

    from docling_ray.stages.extract import extract_batch

    table = pa.table({
        "html": pa.array([b"<html><body><p>ok</p></body></html>", None],
                         pa.large_binary()),
    })
    out = extract_batch(table)
    assert out["status"].to_pylist() == ["success", "success"]
    _ = ray.data  # fixture keeps session alive


def test_run_extract_resume(ray_session, tmp_path):
    from docling_ray.pipelines.extract_pipeline import run_extract
    from docling_ray.sources.webpages import write_corpus

    src = tmp_path / "in"
    dst = tmp_path / "out"
    write_corpus(str(src), 40, seed=3, rows_per_file=10)
    stats1 = run_extract(str(src), str(dst))
    assert stats1["shards_processed"] == 4
    assert stats1["rows_done"] == 40
    stats2 = run_extract(str(src), str(dst))  # resume: nothing left to do
    assert stats2["shards_processed"] == 0
    assert stats2["rows_done"] == 40


def test_exact_dedup(ray_session):
    import ray.data

    from docling_ray.stages.dedup import exact_dedup_keep_first
    from docling_ray.stages.textstats import fingerprint_batch

    table = pa.table({
        "doc_id": [3, 1, 2, 10],
        "text": ["same text", "same text", "other", "same text"],
    })
    ds = ray.data.from_arrow(table).map_batches(fingerprint_batch,
                                                batch_format="pyarrow")
    out = exact_dedup_keep_first(ds).to_pandas().sort_values("doc_id")
    assert sorted(out["doc_id"].tolist()) == [1, 2]


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest before sunset arrives tonight") * 3
    near = base.replace("lazy", "sleepy")
    rows = {"doc_id": ["a", "b", "c"],
            "text": [base, near, "completely different words everywhere " * 10]}
    from docling_ray.stages.dedup import minhash_near_dups

    ds = ray.data.from_arrow(pa.table(rows))
    pairs = minhash_near_dups(ds, threshold=0.5).to_pandas()
    assert ("a", "b") in set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert not any("c" in p for p in zip(pairs["doc_a"], pairs["doc_b"]))


def test_minhash_exact_dups_collapse_and_pairs_unique(ray_session):
    """n identical docs must yield all n·(n-1)/2 intra pairs at n_agree=64,
    each pair exactly once (band-0 ownership), plus cross pairs to a near
    neighbour expanded to every member — also exactly once."""
    import ray.data

    from docling_ray.stages.dedup import minhash_near_dups

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 4
    near = base.replace("sigma", "omega")
    rows = {"doc_id": [f"d{i}" for i in range(6)],
            "text": [base, base, base, base, near, "unrelated words " * 40]}
    ds = ray.data.from_arrow(pa.table(rows))
    df = minhash_near_dups(ds, threshold=0.5).to_pandas()
    pairs = list(zip(df["doc_a"], df["doc_b"]))
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    exact = {p for p, n in zip(pairs, df["n_agree"]) if n == 64}
    assert exact == {("d0", "d1"), ("d0", "d2"), ("d0", "d3"),
                     ("d1", "d2"), ("d1", "d3"), ("d2", "d3")}
    cross = {p for p in pairs if "d4" in p}
    assert cross == {("d0", "d4"), ("d1", "d4"), ("d2", "d4"), ("d3", "d4")}
    assert not any("d5" in p for p in pairs)


def test_minhash_band_explode_shape():
    from docling_ray.stages.dedup import MinHashStage, band_explode

    stage = MinHashStage()
    batch = stage(pa.table({"doc_id": ["x", "y"],
                            "text": ["one two three four five six",
                                     "seven eight nine ten eleven"]}))
    assert [len(v.as_py()) for v in batch["band_keys"]] == [128, 128]
    assert [len(v.as_py()) for v in batch["sketch"]] == [64, 64]
    rows = band_explode(batch, num_bands=16, num_partitions=8)
    assert rows.num_rows == 32
    assert set(rows["doc_id"].to_pylist()) == {"x", "y"}
    part = rows["part"].to_pylist()
    assert all(0 <= p < 8 for p in part)
    # bucket never straddles partitions: same bucket -> same part
    seen = {}
    for b, p in zip(rows["bucket"].to_pylist(), part):
        assert seen.setdefault(b, p) == p


def test_simhash_hamming_close_for_near_dups():
    from docling_ray.stages.textstats import simhash64

    base = "word " * 100 + "alpha beta gamma delta"
    near = "word " * 100 + "alpha beta gamma epsilon"
    far = "entirely other content " * 30
    d_near = bin(simhash64(base) ^ simhash64(near)).count("1")
    d_far = bin(simhash64(base) ^ simhash64(far)).count("1")
    assert d_near < d_far
    assert d_near <= 8


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data

    from docling_ray.stages.ann import brute_force_topk

    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(200, 16))
    table = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(table)
    out = brute_force_topk(ds, [0, 1], vecs[:2], k=5).to_pandas()

    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = normed @ normed[qid]
        expected = np.argsort(-sims, kind="stable")[:5].tolist()
        got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert got == expected


def test_langid_smoke():
    from docling_ray.stages.textstats import langid_of

    assert langid_of("the cat is on the mat and in the hat") == "en"
    assert langid_of("der hund ist mit einem ball auf der wiese") == "de"
    assert langid_of("中文文本的一个例子，包含很多汉字内容") == "zh"


def test_size_bucketing():
    from docling_ray.stages.extract import size_bucket_batch

    table = pa.table({"html": pa.array([b"x" * 100, b"y" * 100_000],
                                       pa.large_binary())})
    out = size_bucket_batch(table)
    buckets = out["size_bucket"].to_pylist()
    assert buckets[0] < buckets[1]


def test_entry_contract(ray_session):
    import __ray_entry__ as entrymod

    res = entrymod.entry()
    df = res.to_pandas()
    assert len(df) >= 1
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10


def test_resume_discards_stale_partial_writes(ray_session, tmp_path):
    """A crash between write_parquet and mark_done leaves stale partition
    files; the resume must replace them, not append duplicates."""
    from docling_ray.pipelines.extract_pipeline import run_extract
    from docling_ray.sources.webpages import write_corpus

    src, dst = tmp_path / "in", tmp_path / "out"
    write_corpus(str(src), 40, rows_per_file=10)
    stats1 = run_extract(str(src), str(dst))
    assert stats1["rows_done"] == 40
    # simulate a crashed partial write for one shard: files exist but the
    # shard is NOT in the manifest
    import json
    mf = dst / "_manifest.jsonl"
    entries = [json.loads(l) for l in mf.read_text().splitlines()]
    victim = entries[0]["shard"]
    mf.write_text("\n".join(json.dumps(e) for e in entries
                            if e["shard"] != victim) + "\n")
    stats2 = run_extract(str(src), str(dst))
    assert stats2["shards_processed"] == 1
    assert stats2["rows_done"] == 40  # no duplicated rows


def test_broadcast_lookup_join_vectorized(ray_session):
    import ray
    import ray.data

    from docling_ray.stages.joins import BroadcastLookupJoin

    small = pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    big = pa.table({"id": list(range(6)), "k": [1, 2, 3, 1, 2, 9]})
    ds = ray.data.from_arrow(big).map_batches(
        BroadcastLookupJoin, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"small_ref": ray.put(small),
                               "left_on": "k", "right_on": "k"})
    out = ds.to_pandas().sort_values("id")
    assert out["id"].tolist() == [0, 1, 2, 3, 4]  # inner: k=9 dropped
    assert out["name"].tolist() == ["a", "b", "c", "a", "b"]


def test_cosine_pairs_blockwise_exact(ray_session):
    import ray.data

    from docling_ray.stages.ann import _normalize, cosine_pairs_blockwise

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(60, 8))
    vecs[41] = vecs[7] + 0.01 * rng.normal(size=8)   # planted near-dup
    vecs[55] = vecs[12] + 0.01 * rng.normal(size=8)
    table = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                      "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(table)
    got = cosine_pairs_blockwise(ds, threshold=0.9, num_blocks=4).to_pandas()
    got_pairs = sorted(zip(got["vec_a"], got["vec_b"]))
    normed = _normalize(vecs)
    sims = normed @ normed.T
    ii, jj = np.where(np.triu(sims >= 0.9, k=1))
    assert got_pairs == sorted(zip(ii.tolist(), jj.tolist()))
    assert (7, 41) in got_pairs and (12, 55) in got_pairs


def test_lsh_bucketed_pairs_finds_planted_and_dedups(ray_session):
    import ray.data

    from docling_ray.stages.ann import lsh_bucketed_pairs

    rng = np.random.RandomState(4)
    vecs = rng.normal(size=(80, 64))
    vecs[50] = vecs[10] + 0.001 * rng.normal(size=64)  # ~identical pair
    table = pa.table({"vec_id": pa.array(range(80), pa.int64()),
                      "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(table)
    got = lsh_bucketed_pairs(ds, threshold=0.95, dim=64).to_pandas()
    pairs = list(zip(got["vec_a"], got["vec_b"]))
    assert len(pairs) == len(set(pairs)), "cross-band duplicate emitted"
    assert (10, 50) in pairs


def test_chunk_from_doc_json_matches_raw(ray_session):
    """Chunking an extracted corpus must use the doc_json column (no
    re-parse) and produce the same chunks as chunking the raw bytes."""
    import ray.data

    from docling_ray.stages.chunk import chunk_dataset
    from docling_ray.stages.extract import extract_batch, sniff_batch

    table = make_table(20, seed=9)
    raw_chunks = chunk_dataset(
        ray.data.from_arrow(table)).to_pandas().sort_values(
        ["url", "chunk_id"]).reset_index(drop=True)
    extracted = extract_batch(sniff_batch(table), emit_doc_json=True)
    extracted = extracted.select(["url", "doc_json"])
    json_chunks = chunk_dataset(
        ray.data.from_arrow(extracted)).to_pandas().sort_values(
        ["url", "chunk_id"]).reset_index(drop=True)
    assert raw_chunks.equals(json_chunks)


def test_simhash_near_dups_pipeline(ray_session):
    import ray.data

    from docling_ray.stages.dedup import simhash_near_dups

    base = "word " * 120 + "alpha beta gamma delta"
    near = "word " * 120 + "alpha beta gamma epsilon"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": ["a", "b", "c"],
        "text": [base, near, "entirely other content " * 30]}))
    df = simhash_near_dups(ds, max_hamming=3).to_pandas()
    pairs = list(zip(df["doc_a"], df["doc_b"]))
    assert pairs == [("a", "b")]
    assert len(pairs) == len(set(pairs))
    # int ids keep their type
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, near, "entirely other content " * 30]}))
    df2 = simhash_near_dups(ds2).to_pandas()
    assert list(zip(df2["doc_a"], df2["doc_b"])) == [(1, 2)]


def test_lsh_bucketed_topk_matches_bucketed_bruteforce(ray_session):
    import ray.data

    from docling_ray.stages.ann import (
        HyperplaneLSH,
        _normalize,
        lsh_bucketed_topk,
    )

    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(150, 64))
    table = pa.table({"vec_id": pa.array(range(150), pa.int64()),
                      "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(table)
    out = lsh_bucketed_topk(ds, [0, 1], vecs[:2], k=5, dim=64).to_pandas()
    # reference: candidates sharing >=1 band bucket, ranked by cosine
    lsh = HyperplaneLSH(dim=64, n_planes=24, seed=11)
    bits = (vecs @ lsh.planes.T) > 0
    weights = 1 << np.arange(3)
    bands = bits.reshape(150, 8, 3) @ weights + (np.arange(8) << 3)
    normed = _normalize(vecs)
    for qid in (0, 1):
        cand = np.nonzero((bands == bands[qid]).any(axis=1))[0]
        sims = normed[cand] @ normed[qid]
        order = np.lexsort((cand, -sims))[:5]
        expected = cand[order].tolist()
        got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert got == expected


def test_layout_svg_visualizer():
    from docling_ray.kernels.layout_viz import layout_svg, page_layout_data_uri

    clusters = [{"label": "table", "l": 10, "t": 20, "r": 200, "b": 120},
                {"label": "text", "l": 10, "t": 130, "r": 200, "b": 300}]
    cells = [{"l": 12, "t": 22, "r": 80, "b": 34}]
    svg = layout_svg(612, 792, clusters, cells)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<rect") == 1 + len(cells) + len(clusters)
    assert ">table</text>" in svg and ">text</text>" in svg
    uri = page_layout_data_uri(612, 792, clusters)
    assert uri.startswith("data:image/svg+xml;base64,")
    # integrates with the split-page writer's page pane
    from docling_ray.kernels.html_export import to_html_split_page
    from docling_ray.kernels.reading_order import ROElement, reading_order_document

    doc = reading_order_document("d", [
        ROElement(0, 0, "text", 10, 130, 200, 300, "body text")])
    html = to_html_split_page(doc, page_images={1: uri})
    assert "data:image/svg+xml;base64," in html


def test_winnow_fingerprints_properties():
    from docling_ray.stages.textstats import winnow_fingerprints

    # shorter than k: empty set
    assert winnow_fingerprints("short", k=8) == []
    # fewer grams than the window: single global minimum
    fps = winnow_fingerprints("abcdefghi", k=8, window=4)
    assert len(fps) == 1
    # deterministic, and a local edit changes only part of the set
    base = "the quick brown fox jumps over the lazy dog " * 4
    a = winnow_fingerprints(base)
    assert a == winnow_fingerprints(base)
    b = winnow_fingerprints(base.replace("lazy", "hazy"))
    shared = set(a) & set(b)
    assert shared, "winnowing must keep fingerprints outside the edit"
    assert set(a) != set(b)
    # containment: a document embedded in another shares its fingerprints
    inner = winnow_fingerprints(base)
    outer = winnow_fingerprints("PREFIX 12345 " + base + " SUFFIX 67890")
    assert len(set(inner) & set(outer)) >= len(inner) * 0.8


def test_winnow_batch_columns():
    from docling_ray.stages.textstats import winnow_batch

    t = pa.table({"doc_id": [1, 2], "text": ["", "a reasonable document "
                                             "with enough characters"]})
    out = winnow_batch(t)
    assert out["n_fp"].to_pylist()[0] == 0
    assert out["fp_xor"].to_pylist()[0] == 0
    assert out["n_fp"].to_pylist()[1] > 0

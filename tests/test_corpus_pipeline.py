"""Composed corpus pipeline (extract → exact dedup → minhash drop →
quality floor → chunk): generator-predicted output, planted-duplicate
drop, and checkpointed resume."""

import json
import os

import pyarrow as pa


def test_corpus_chunks_matches_generator_expectation(ray_session):
    import ray.data

    from docling_ray.pipelines.corpus import corpus_chunks
    from docling_ray.sources.webpages import (
        make_expected_corpus_chunks_table,
        make_table,
        plant_exact_dups,
    )

    table = plant_exact_dups(make_table(40, seed=17), every=8)
    got = corpus_chunks(ray.data.from_arrow(table)).to_pandas() \
        .sort_values(["url", "chunk_id"]).reset_index(drop=True)
    exp = make_expected_corpus_chunks_table(40, seed=17).to_pandas() \
        .sort_values(["url", "chunk_id"]).reset_index(drop=True)
    assert not got["url"].str.startswith("https://zz-dup").any(), \
        "planted duplicate urls must be dropped"
    assert got[["url", "chunk_id", "n_tokens", "kind"]].values.tolist() == \
        exp[["url", "chunk_id", "n_tokens", "kind"]].values.tolist()


def test_run_corpus_checkpointed_resume(ray_session, tmp_path):
    from docling_ray.pipelines.corpus import run_corpus
    from docling_ray.sources.webpages import write_corpus

    src = tmp_path / "in"
    out = tmp_path / "out"
    write_corpus(str(src), 30, seed=3, rows_per_file=10)
    res1 = run_corpus(str(src), str(out))
    assert res1["n_chunks"] > 0
    for key in ("extract_sec", "dedup_sec", "minhash_sec", "chunks_sec"):
        assert key in res1["timings"]
    timings = json.load(open(os.path.join(str(out), "stage_timings.json")))
    assert timings == res1["timings"]
    # resume: every stage marker exists, nothing recomputes, same output
    res2 = run_corpus(str(src), str(out))
    assert res2["n_chunks"] == res1["n_chunks"]
    assert res2["timings"] == res1["timings"]


def test_plant_exact_dups_shape():
    from docling_ray.sources.webpages import make_table, plant_exact_dups

    t = make_table(20, seed=5)
    p = plant_exact_dups(t, every=10)
    assert p.num_rows == 22
    base = t.to_pydict()
    dup = p.slice(20).to_pydict()
    # identical bytes, later-sorting urls
    assert dup["html"][0] == base["html"][0]
    assert dup["html"][1] == base["html"][10]
    assert all(u.startswith("https://zz-dup") for u in dup["url"])
    assert min(dup["url"]) > max(base["url"])


def test_run_corpus_drops_stale_partial_stage_output(ray_session, tmp_path):
    """A stage dir without its done marker is a crashed partial write;
    recomputing must REPLACE it (Ray write_parquet appends uniquely-named
    files, so without the rmtree the rerun would duplicate rows)."""
    import pyarrow.parquet as pq

    from docling_ray.pipelines.corpus import run_corpus
    from docling_ray.sources.webpages import write_corpus

    src = tmp_path / "in"
    out = tmp_path / "out"
    write_corpus(str(src), 20, seed=3, rows_per_file=10)
    res1 = run_corpus(str(src), str(out))
    # simulate a crash mid-chunks: marker gone, stale file left behind
    os.remove(os.path.join(str(out), "_chunks_done"))
    stale = os.path.join(str(out), "chunks", "stale_partial.parquet")
    pq.write_table(pa.table({"url": ["ghost"], "chunk_id": [0],
                             "n_tokens": [1], "kind": ["text"]}), stale)
    res2 = run_corpus(str(src), str(out))
    assert res2["n_chunks"] == res1["n_chunks"]
    assert not os.path.exists(stale)


def _read_chunks(out_dir):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "chunks", "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return t.to_pandas().sort_values(["url", "chunk_id"]) \
        .reset_index(drop=True)


def test_run_corpus_sharded_drop_set_matches_broadcast(ray_session,
                                                       tmp_path):
    """The scale-safe sharded drop-set backend must produce EXACTLY the
    broadcast path's chunks (VERDICT r3 #2): same corpus, one run per
    backend, byte-equal chunk tables.  Planted exact dups guarantee the
    drop set is non-empty on both paths."""
    from docling_ray.pipelines.corpus import run_corpus
    from docling_ray.sources.webpages import write_corpus

    src = tmp_path / "in"
    write_corpus(str(src), 30, seed=11, rows_per_file=15)
    res_b = run_corpus(str(src), str(tmp_path / "out_b"),
                       drop_mode="broadcast")
    res_s = run_corpus(str(src), str(tmp_path / "out_s"),
                       drop_mode="sharded")
    assert res_b["timings"]["drop_backend"] == "broadcast"
    assert res_s["timings"]["drop_backend"] == "sharded"
    assert res_b["n_chunks"] == res_s["n_chunks"] > 0
    got_b = _read_chunks(str(tmp_path / "out_b"))
    got_s = _read_chunks(str(tmp_path / "out_s"))
    assert got_b.equals(got_s)


def test_drop_set_shards_load_and_filter(ray_session):
    """Unit contract of the sharded drop set: streamed load (driver sees
    only counts), vectorized contains, anti-filter equivalence with a
    plain set filter."""
    import ray
    import ray.data

    from docling_ray.state.drop_set import (DropUrlsSharded, create_drop_set,
                                            load_drop_set)

    shards = create_drop_set(3)
    drop_tbl = pa.table({"url": [f"u{i}" for i in range(0, 50, 2)]})
    total = load_drop_set(ray.data.from_arrow(drop_tbl), shards, "url")
    assert total == 25
    batch = pa.table({"url": [f"u{i}" for i in range(50)],
                      "payload": list(range(50))})
    out = DropUrlsSharded(shards)(batch)
    assert out["url"].to_pylist() == [f"u{i}" for i in range(1, 50, 2)]
    for s in shards:
        ray.kill(s)


def test_chunk_and_filter_emit_text_and_redact():
    from docling_ray.pipelines.corpus import _chunk_and_filter

    html = (b"<html><body><p>mail me at a@b.com or call 555-0142 "
            b"about the corpus quality floor tokens</p></body></html>")
    batch = pa.table({
        "url": ["https://x.example/pii"],
        "html": pa.array([html], pa.large_binary()),
    })
    # metadata-only default: no text column (golden-stable)
    meta = _chunk_and_filter(batch, min_doc_tokens=1)
    assert "text" not in meta.column_names
    # emit_text carries the chunk text; redact masks it in-stage
    plain = _chunk_and_filter(batch, 1, emit_text=True)
    assert "a@b.com" in " ".join(plain["text"].to_pylist())
    red = _chunk_and_filter(batch, 1, emit_text=True, redact_pii=True)
    joined = " ".join(red["text"].to_pylist())
    assert "[EMAIL]" in joined and "[PHONE]" in joined
    assert "a@b.com" not in joined
    # rows and metadata identical either way
    assert red.num_rows == plain.num_rows == meta.num_rows
    assert red["n_tokens"].to_pylist() == meta["n_tokens"].to_pylist()


def test_run_corpus_redacted_output(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from docling_ray.pipelines.corpus import run_corpus
    from docling_ray.sources.webpages import write_corpus
    from docling_ray.stages.privacy import pii_redact_batch

    def read_chunks(d):
        files = sorted(glob.glob(str(d / "chunks" / "*.parquet")))
        t = pa.concat_tables([pq.read_table(f) for f in files])
        return t.sort_by([("url", "ascending"), ("chunk_id", "ascending")])

    src = tmp_path / "src"
    write_corpus(str(src), 30, rows_per_file=15)
    out = tmp_path / "cur"
    run_corpus(str(src), str(out), redact_pii=True)
    red = read_chunks(out)
    assert "text" in red.schema.names and red.num_rows > 0
    # the redacted run must equal redact(plain run) text-for-text — a
    # lost redact_pii kwarg would slip a bare text column through
    out2 = tmp_path / "cur_plain"
    run_corpus(str(src), str(out2), emit_text=True)
    plain = read_chunks(out2)
    expect = pii_redact_batch(plain, "text", "_r")["_r"].to_pylist()
    assert red["text"].to_pylist() == expect
    assert red["url"].to_pylist() == plain["url"].to_pylist()


def test_run_corpus_resume_recomputes_on_param_change(ray_session,
                                                     tmp_path):
    import glob

    import pyarrow.parquet as pq

    from docling_ray.pipelines.corpus import run_corpus
    from docling_ray.sources.webpages import write_corpus

    src = tmp_path / "src"
    write_corpus(str(src), 20, rows_per_file=10)
    out = tmp_path / "cur"
    run_corpus(str(src), str(out))                  # metadata-only run
    files = glob.glob(str(out / "chunks" / "*.parquet"))
    assert "text" not in pq.read_schema(files[0]).names
    # a resume with NEW output-shaping params must not return the stale
    # metadata-only chunks (the silent-unredacted-output trap)
    stats = run_corpus(str(src), str(out), redact_pii=True)
    files = glob.glob(str(out / "chunks" / "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert "text" in t.schema.names
    assert "chunks_sec" in stats["timings"]         # stage actually ran
    # unchanged params still resume instantly (no chunk recompute)
    stats2 = run_corpus(str(src), str(out), redact_pii=True)
    assert "chunks_sec" not in stats2["timings"] or \
        stats2["timings"]["chunks_sec"] == stats["timings"]["chunks_sec"]

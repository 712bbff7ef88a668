"""TF-IDF top terms (stages/tfidf.py)."""

import pyarrow as pa

from docling_ray.stages.tfidf import (TfIdfTopTermsStage,
                                      document_frequencies,
                                      tfidf_top_terms)


def _docs(texts, start=0):
    return pa.table({
        "doc_id": pa.array(range(start, start + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_document_frequencies(ray_session):
    import ray

    ds = ray.data.from_arrow(_docs([
        "a b a", "a c", "c c d", "", None])).repartition(3)
    dfs = document_frequencies(ds)
    got = dict(zip(dfs["term"].to_pylist(), dfs["df"].to_pylist()))
    # df counts DISTINCT docs, not occurrences
    assert got == {"a": 2, "b": 1, "c": 2, "d": 1}


def test_top_terms_ranking_and_ties(ray_session):
    import ray

    # doc0: a×2 b×1 c×1 → scores a: 2/2=1.0, b: 1/1=1.0, c: 1/2=0.5;
    # tie a vs b → term ASC puts "a" first
    ds = ray.data.from_arrow(_docs(["a a b c", "a c"]))
    out = tfidf_top_terms(ds, k=2)
    rows = sorted(out.take_all(), key=lambda r: (r["doc_id"], r["rank"]))
    d0 = [(r["term"], r["tf"], r["df"], r["rank"])
          for r in rows if r["doc_id"] == 0]
    assert d0 == [("a", 2, 2, 1), ("b", 1, 1, 2)]


def test_min_df_prunes_rare_terms(ray_session):
    import ray

    ds = ray.data.from_arrow(_docs(["common rare1", "common rare2"]))
    out = tfidf_top_terms(ds, k=5, min_df=2)
    terms = {r["term"] for r in out.take_all()}
    assert terms == {"common"}


def test_top_terms_partition_invariant(ray_session):
    import ray

    texts = [f"w{i % 5} w{i % 3} shared tail{i % 2}" for i in range(60)]
    def run(parts):
        ds = ray.data.from_arrow(_docs(texts)).repartition(parts)
        return sorted(tfidf_top_terms(ds, k=3).take_all(),
                      key=lambda r: (r["doc_id"], r["rank"]))
    assert run(1) == run(8)


def test_stage_empty_batch_keeps_schema():
    stage = TfIdfTopTermsStage(
        pa.table({"term": pa.array(["x"]), "df": pa.array([1], pa.int64())}),
        k=3)
    out = stage(_docs([]))
    assert out.num_rows == 0
    assert set(out.column_names) == {"doc_id", "term", "tf", "df", "rank"}

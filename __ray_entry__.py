"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver before this module is imported; nothing
here (or in ``docling_ray``) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline — synthesize a deterministic Common-Crawl
  style web-pages corpus (the north-rule ``input_hint`` schema), stream it
  through the HTML-extraction chain, return per-language metrics.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  training-data ops); each takes ``sf_dir`` and returns a Dataset /
  pyarrow Table.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query
  (same output column names).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry() -> Any:
    import ray.data

    from docling_ray.pipelines.extract_pipeline import extract_dataset, lang_metrics
    from docling_ray.sources.webpages import make_table

    web = ray.data.from_arrow(make_table(240, seed=42))
    extracted = extract_dataset(web)
    return lang_metrics(extracted)


# --------------------------------------------------------------------------
# per-operator queries
# --------------------------------------------------------------------------

def _documents(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def q_lang_metrics(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _documents(sf_dir)
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum(on="n_chars", alias_name="sum_chars"),
    )
    return out


def q_dedup_exact(sf_dir: str):
    from docling_ray.stages.dedup import exact_dedup_keep_first
    from docling_ray.stages.textstats import fingerprint_batch

    ds = _documents(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")
    survivors = exact_dedup_keep_first(ds, key_column="fingerprint",
                                       order_column="doc_id")
    return survivors.select_columns(["doc_id", "fingerprint"])


def q_token_quality(sf_dir: str):
    from docling_ray.stages.textstats import quality_batch

    ds = _documents(sf_dir).map_batches(quality_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens", "n_alpha", "n_digit", "n_space"])


def q_fingerprint(sf_dir: str):
    from docling_ray.stages.textstats import fingerprint_batch

    ds = _documents(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fingerprint"])


def q_events_by_type(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    # count-distinct via two-level groupby: distinct pairs first (partial
    # aggregation inside the shuffle), then per-type rollup
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="n"))
    return pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users"),
        Sum(on="n", alias_name="n_events"),
    )


def q_orders_by_status(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderstatus"])
    return ds.groupby("o_orderstatus").aggregate(Count(alias_name="n_orders"))


def q_customer_nation(sf_dir: str):
    """Broadcast hash join: tiny nation side is shipped once via ``ray.put``
    and looked up inside ``map_batches`` — no shuffle of the big side."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"])
    lookup_ref = ray.put(dict(zip(nation["n_nationkey"].to_pylist(),
                                  nation["n_name"].to_pylist())))

    def join_batch(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        names = [lookup.get(k.as_py()) for k in batch["c_nationkey"]]
        out = pa.table({
            "custkey": batch["c_custkey"],
            "nation": pa.array(names, pa.string()),
        })
        return out

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
    return ds.map_batches(join_batch, batch_format="pyarrow")


def q_ann_topk(sf_dir: str):
    import ray.data
    import pyarrow.parquet as pq

    from docling_ray.stages.ann import brute_force_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    query_ids = emb["vec_id"].to_pylist()[:5]
    import numpy as np
    query_vecs = np.asarray(emb["embedding"].to_pylist()[:5], dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    table = brute_force_topk(ds, query_ids, query_vecs, k=10)
    return table.select(["query_id", "vec_id", "rank"])


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (exact, broadcast small side)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from docling_ray.stages.ann import cosine_pairs

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_pylist()
    vectors = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return cosine_pairs(ds, ids, vectors, threshold=0.5)


def q_chunks(sf_dir: str):
    """Hierarchical chunking over the synthetic web corpus."""
    import ray.data

    from docling_ray.sources.webpages import make_table
    from docling_ray.stages.chunk import chunk_dataset

    web = ray.data.from_arrow(make_table(60, seed=42))
    return chunk_dataset(web).select_columns(
        ["url", "chunk_id", "n_tokens", "kind"])


def q_pdf_pipeline(sf_dir: str):
    """Paginated (parsed-cell) pipeline: pages → layout → assemble →
    doc-level reading-order reduce."""
    import ray.data

    from docling_ray.sources.pdf_pages import make_pdf_pages_table
    from docling_ray.stages.pdf import pdf_pages_pipeline

    table, _ = make_pdf_pages_table(40, seed=42)
    return pdf_pages_pipeline(ray.data.from_arrow(table)).select_columns(
        ["doc_id", "n_pages", "parse_score"])


def q_minhash_near_dup(sf_dir: str):
    from docling_ray.stages.dedup import minhash_near_dups

    ds = _documents(sf_dir).select_columns(["doc_id", "text"])
    return minhash_near_dups(ds, threshold=0.5)


def q_simhash(sf_dir: str):
    from docling_ray.stages.textstats import simhash_batch

    ds = _documents(sf_dir).map_batches(simhash_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "simhash"])


def q_langid(sf_dir: str):
    from docling_ray.stages.textstats import langid_batch

    ds = _documents(sf_dir).map_batches(langid_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "lang_pred"])


def q_quality_score(sf_dir: str):
    from docling_ray.stages.textstats import quality_score_batch

    ds = _documents(sf_dir).map_batches(quality_score_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "quality_score"])


def q_extract_corpus(sf_dir: str):
    """Flagship HTML extraction over the deterministic synthetic corpus
    (byte-parity with the reference is asserted by the pytest goldens)."""
    import ray.data

    from docling_ray.pipelines.extract_pipeline import extract_dataset
    from docling_ray.sources.webpages import make_table

    web = ray.data.from_arrow(make_table(120, seed=42))
    out = extract_dataset(web)
    return out.select_columns(["url", "doc_id", "status", "n_items"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "lang_metrics": q_lang_metrics,
        "dedup_exact": q_dedup_exact,
        "token_quality": q_token_quality,
        "fingerprint": q_fingerprint,
        "events_by_type": q_events_by_type,
        "orders_by_status": q_orders_by_status,
        "customer_nation": q_customer_nation,
        "ann_topk": q_ann_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "chunks": q_chunks,
        "pdf_pipeline": q_pdf_pipeline,
        "minhash_near_dup": q_minhash_near_dup,
        "simhash": q_simhash,
        "langid": q_langid,
        "quality_score": q_quality_score,
        "extract_corpus": q_extract_corpus,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lang_metrics": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, md5(text) AS fingerprint
            FROM documents GROUP BY md5(text)
        """,
        "token_quality": r"""
            SELECT doc_id,
                   CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
                   CAST(length(text) - length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_space
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "events_by_type": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "orders_by_status": """
            SELECT o_orderstatus, count(*) AS n_orders
            FROM orders GROUP BY o_orderstatus
        """,
        "customer_nation": """
            SELECT c.c_custkey AS custkey, n.n_name AS nation
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec
                FROM embeddings ORDER BY vec_id LIMIT 5
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qvec, e.embedding) AS cosine
                FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
                SELECT query_id, vec_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id
                       ) AS rank
                FROM scored
            )
            SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 10
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
        """,
        # minhash_near_dup / simhash / langid / quality_score /
        # extract_corpus / chunks / pdf_pipeline: deterministic but not
        # SQL-expressible → rows-only.
    }

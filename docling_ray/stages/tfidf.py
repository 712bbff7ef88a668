"""TF-IDF top terms — the per-document salient-term extractor (search
indexing, topic tagging, keyword features for curation models).

Shape:

- **DF pass**: per-batch DISTINCT (doc, token) collapse → per-batch
  partial document-frequency counts (the combiner bounds the shuffle to
  vocabulary-sized rows per batch) → ONE ``groupby(token).sum``.  The
  corpus text never shuffles.
- **Broadcast**: the DF map is vocabulary-sized (natural-language
  vocabularies are bounded; prune with ``min_df`` if needed) —
  ``ray.put`` once, fetched once per actor.  At extreme vocabulary
  scale the same score is computable as one token-keyed join instead;
  the broadcast form is the default because it keeps the payload
  stream shuffle-free.
- **Score pass**: stateless per-batch TF counts (C groupby) + dict
  lookups + vectorized top-k (the ``domain_cap`` sort/head shape).

Scoring contract (mirrored in SQL): score = ``tf / df`` — ONE float64
division of two small integers, which IEEE 754 rounds identically in
numpy and DuckDB, so rankings agree bit-for-bit; ties break on token
ASC.  (The classic ``log`` dampening is deliberately avoided:
transcendental functions are not guaranteed identical across libms,
and for per-doc top-k only the ORDER matters — ``tf/df`` orders like
``tf·idf`` with linear idf.)  Compared output stays integral:
``(doc_id, term, tf, df, rank)``.

Tokenization is the RE2 ``\\s+`` split with empties dropped
(stages/repetition.py), so ``regexp_split_to_array`` agrees by
construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from docling_ray.stages.repetition import _doc_tokens


def df_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """One batch → its partial document-frequency rows
    ``(term, df)`` (distinct docs per token WITHIN the batch)."""
    doc_idx, toks = _doc_tokens(batch, column)
    if not len(toks):
        return pa.table({"term": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    pairs = pd.DataFrame({"d": doc_idx, "w": toks}).drop_duplicates()
    counts = pairs.groupby("w", sort=False).size()
    return pa.table({"term": pa.array(counts.index.to_numpy(), pa.string()),
                     "df": pa.array(counts.to_numpy(), pa.int64())})


def document_frequencies(ds, column: str = "text",
                         min_df: int = 1) -> pa.Table:
    """Corpus document frequencies: combiner-first partials → ONE
    vocabulary-sized ``groupby(term).sum``.  Returns a pyarrow Table."""
    merged = ds.map_batches(
        lambda b: df_partial(b, column), batch_format="pyarrow") \
        .groupby("term").aggregate(Sum(on="df", alias_name="df"))
    table = pa.Table.from_pylist(merged.take_all())
    if table.num_rows == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    if min_df > 1:
        import pyarrow.compute as pc

        table = table.filter(pc.greater_equal(table["df"], min_df))
    return table.select(["term", "df"])


class TfIdfTopTermsStage:
    """``map_batches(TfIdfTopTermsStage, concurrency=N,
    fn_constructor_kwargs=dict(df_ref=ref, k=5))`` — per-doc top-k terms
    by ``tf/df`` (score DESC, term ASC), emitted as
    ``(doc_id, term, tf, df, rank)``.  The DF map is fetched once per
    ACTOR; terms absent from it (pruned by ``min_df``) are skipped."""

    def __init__(self, df_ref, k: int = 5, column: str = "text",
                 id_col: str = "doc_id"):
        import ray

        df_table = (df_ref if isinstance(df_ref, pa.Table)
                    else ray.get(df_ref))
        self.df_map = dict(zip(df_table["term"].to_pylist(),
                               df_table["df"].to_pylist()))
        self.k = k
        self.column = column
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, toks = _doc_tokens(batch, self.column)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        empty = pa.table({
            self.id_col: pa.array([], batch.schema.field(self.id_col).type),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        })
        if not len(toks):
            return empty
        tf = (pd.DataFrame({"d": doc_idx, "w": toks})
              .groupby(["d", "w"], sort=False).size()
              .rename("tf").reset_index())
        tf["df"] = tf["w"].map(self.df_map)
        tf = tf.dropna(subset=["df"])
        if not len(tf):
            return empty
        tf["df"] = tf["df"].astype(np.int64)
        # ONE float64 division — IEEE-identical in numpy and DuckDB
        tf["score"] = tf["tf"].to_numpy(np.float64) / tf["df"].to_numpy(
            np.float64)
        tf = tf.sort_values(["d", "score", "w"],
                            ascending=[True, False, True],
                            kind="mergesort")
        top = tf.groupby("d", sort=False).head(self.k).copy()
        top["rank"] = top.groupby("d", sort=False).cumcount() + 1
        return pa.table({
            self.id_col: pa.array(ids[top["d"].to_numpy()]),
            "term": pa.array(top["w"].to_numpy(), pa.string()),
            "tf": pa.array(top["tf"].to_numpy(), pa.int64()),
            "df": pa.array(top["df"].to_numpy(), pa.int64()),
            "rank": pa.array(top["rank"].to_numpy(), pa.int64()),
        })


def tfidf_top_terms(ds, k: int = 5, column: str = "text",
                    id_col: str = "doc_id", min_df: int = 1,
                    concurrency: int = 4):
    """Per-document top-``k`` TF-IDF terms over ``ds`` (consumed twice:
    once for the DF pass, once for scoring — both over pruned
    projections)."""
    import ray

    dfs = document_frequencies(ds, column, min_df=min_df)
    ref = ray.put(dfs)
    return ds.map_batches(
        TfIdfTopTermsStage, batch_format="pyarrow",
        fn_constructor_kwargs={"df_ref": ref, "k": k, "column": column,
                               "id_col": id_col},
        concurrency=(1, concurrency))

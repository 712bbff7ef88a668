"""Inverted-index construction over a document Dataset.

The retrieval-side primitive of a web-scale corpus engine (the
reference converts documents but never indexes them — SURVEY.md §2.6):
``(term → sorted posting list of (doc_id, tf))`` plus per-term document
frequency and total occurrence counts.

Shape: a stateless ``map_batches`` pass computes per-document term
frequencies (the COMBINER — shuffle volume is distinct ``(term, doc)``
pairs, not token occurrences), pre-bucketed on ``hash(term) % P``; each
term-complete partition then builds its posting lists fully vectorized
(sort + run boundaries + ``ListArray`` + ``binary_join``) — Python is
invoked P times total, never per term.  Postings are canonical strings
``"doc:tf,doc:tf,..."`` ordered by doc_id, so the SQL oracle's
``string_agg(... ORDER BY doc_id)`` agrees byte-for-byte (compared by
md5 to keep result rows small).

Tokenization is the repo-wide RE2 ``\\s+`` split with empty tokens
dropped (stages/textstats.py precedent) — terms are RAW tokens, no
case-folding (normalize upstream if wanted).

Scale note: a stop-word's posting list is O(corpus) long — the classic
hot-key.  The rows entering the shuffle stay small (term, doc, tf), but
one partition holds every posting of its hot terms; real deployments
cap or drop ultra-high-df terms first — ``max_df`` does that HERE, in
the combiner pass it cannot (df is global), so it filters after the
per-partition count, bounding only the OUTPUT.  Drop known stopwords
upstream to bound the partition itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _term_doc_tf(batch: pa.Table, text_col: str, id_col: str,
                 num_partitions: int) -> pa.Table:
    """One batch → its distinct ``(term, doc_id, tf, part)`` rows."""
    from docling_ray.stages.repetition import _doc_tokens

    id_type = batch.schema.field(id_col).type
    empty = pa.table({"term": pa.array([], pa.string()),
                      id_col: pa.array([], id_type),
                      "tf": pa.array([], pa.int64()),
                      "part": pa.array([], pa.int64())})
    doc_idx, toks = _doc_tokens(batch, text_col)
    if not len(doc_idx):
        return empty
    cnt = (pd.DataFrame({"d": doc_idx, "t": toks})
           .groupby(["d", "t"], sort=False).size().rename("tf")
           .reset_index())
    import pandas.util as pu

    part = (pu.hash_array(cnt["t"].to_numpy())
            % np.uint64(num_partitions)).astype(np.int64)
    return pa.table({
        "term": pa.array(cnt["t"].to_numpy(), pa.string()),
        id_col: batch[id_col].take(pa.array(cnt["d"].to_numpy(),
                                            pa.int64())),
        "tf": pa.array(cnt["tf"].to_numpy().astype(np.int64)),
        "part": pa.array(part),
    })


def _build_postings(group: pa.Table, id_col: str,
                    max_df: int | None) -> pa.Table:
    """One term-complete partition → ``(term, df, n_occurrences,
    postings_md5)`` rows, fully vectorized."""
    import hashlib

    empty = pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "n_occurrences": pa.array([], pa.int64()),
                      "postings_md5": pa.array([], pa.string())})
    if group.num_rows == 0:
        return empty
    order = pc.sort_indices(group, sort_keys=[("term", "ascending"),
                                              (id_col, "ascending")])
    g = group.take(order)
    terms = g["term"].to_numpy(zero_copy_only=False)
    n = len(terms)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(first)
    df = np.diff(np.append(starts, n)).astype(np.int64)
    tf = g["tf"].to_numpy(zero_copy_only=False)
    occ = np.add.reduceat(tf, starts).astype(np.int64)
    entry = pc.binary_join_element_wise(
        pc.cast(g[id_col], pa.string()),
        pc.cast(g["tf"], pa.string()), ":")
    if n >= 2 ** 31:  # int32 ListArray offsets would wrap silently
        raise ValueError(
            f"posting partition has {n} rows >= 2^31; a hot term key "
            "needs salting or a LargeListArray path before this is safe")
    offsets = np.append(starts, n).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                  entry.combine_chunks())
    postings = pc.binary_join(la, ",").to_pylist()
    md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in postings]
    out = pa.table({
        "term": g["term"].take(pa.array(starts, pa.int64())),
        "df": pa.array(df),
        "n_occurrences": pa.array(occ),
        "postings_md5": pa.array(md5s, pa.string()),
    })
    if max_df is not None:
        out = out.filter(pc.less_equal(out["df"], max_df))
    return out


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   num_partitions: int = 64, max_df: int | None = None):
    """Build the inverted index: returns a Dataset of ``(term, df,
    n_occurrences, postings_md5)`` where postings_md5 fingerprints the
    canonical ``"doc:tf,..."`` posting string ordered by doc_id (see
    module docstring).  ``max_df`` drops ultra-common terms from the
    OUTPUT (stopword suppression)."""
    import ray.data

    rows = ds.map_batches(
        lambda b: _term_doc_tf(b, text_col, id_col, num_partitions),
        batch_format="pyarrow")
    out = rows.groupby("part").map_groups(
        lambda g: _build_postings(g, id_col, max_df),
        batch_format="pyarrow")
    empty = ray.data.from_arrow(pa.table({
        "term": pa.array([], pa.string()),
        "df": pa.array([], pa.int64()),
        "n_occurrences": pa.array([], pa.int64()),
        "postings_md5": pa.array([], pa.string())}))
    return empty.union(out)


def bow_search(ds, terms: list, k: int = 20, text_col: str = "text",
               id_col: str = "doc_id", num_partitions: int = 64):
    """Bag-of-words retrieval: score every document against a fixed
    term list and return the top ``k`` as ``(doc_id, score_u)``.

    Score is integer-exact: ``Σ_t (1_000_000 * tf(t, d)) // df(t)`` —
    a tf×idf-shaped weight whose floor division commutes with any
    partitioning, so ranking is deterministic and SQL-mirrorable.  Ties
    break by ascending doc_id.

    Shape: the combiner pass emits only rows whose term is IN the query
    (a tiny broadcast-as-closure set — no shuffle carries non-query
    terms), df comes from one ``groupby(term)`` over that filtered
    stream, broadcasts back (|terms| rows), scores aggregate per doc
    with a native Sum, and the global top-k is ``sort + limit`` — Ray's
    distributed sort over (score, doc) pairs, never the corpus."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    query_terms = pa.array(sorted(set(terms)), pa.string())

    def query_tf(batch: pa.Table) -> pa.Table:
        t = _term_doc_tf(batch, text_col, id_col, num_partitions)
        mask = pc.is_in(t["term"], value_set=query_terms)
        return t.filter(mask).drop_columns(["part"])

    # materialize the FILTERED rows (query-term hits only — tiny): the
    # df pass and the scoring pass both consume them, and without the
    # pin each would re-execute the full corpus read + tokenize
    rows = ds.map_batches(query_tf, batch_format="pyarrow").materialize()
    # df = number of DISTINCT docs per query term; rows are per-doc
    # distinct already, so a Count is exact — |terms| result rows,
    # safe to collect + broadcast
    df_tbl = rows.groupby("term").aggregate(Count(alias_name="df"))
    df_map = {r["term"]: r["df"]
              for b in df_tbl.iter_batches(batch_format="pyarrow")
              for r in b.to_pylist()}
    df_ref = ray.put(df_map)

    class ScoreStage:
        def __init__(self, ref):
            self.df = ray.get(ref) if not isinstance(ref, dict) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            tf = batch["tf"].to_numpy(zero_copy_only=False)
            dfv = np.array([self.df[t] for t in
                            batch["term"].to_pylist()], np.int64)
            return pa.table({
                id_col: batch[id_col],
                "w": pa.array((1_000_000 * tf) // dfv),
            })

    scored = rows.map_batches(
        ScoreStage, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_kwargs={"ref": df_ref}) \
        .groupby(id_col).aggregate(Sum(on="w", alias_name="score_u"))
    out = scored.sort(["score_u", id_col],
                      descending=[True, False]).limit(k)
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    empty = ray.data.from_arrow(pa.table({
        id_col: pa.array([], id_type),
        "score_u": pa.array([], pa.int64())}))
    return empty.union(out)

"""Repetition and duplicate-span operators for web-corpus curation.

Two operators the published LLM-data pipelines apply between crawl and
training, absent from the reference (which converts documents one at a
time — SURVEY.md §2.6/§2.7):

- ``repetition_stats`` — per-document n-gram repetition counters, the
  decision statistics behind the classic "repetition filter" family
  (fraction of content inside the most frequent 2-gram / inside
  duplicated 5-grams).  Pure per-document math: ONE stateless
  ``map_batches`` pass, zero shuffles, streams at any scale.
- ``dup_windows`` — cross-document exact duplicate token windows: for
  every document, how many of its distinct ``w``-token windows also
  appear in at least one OTHER document (the decision statistic of
  exact-substring deduplication over a corpus).  Per-doc distinct
  window hashes (16 B/row — never the text) make ONE hash-bucketed
  all-to-all, each bucket resolves duplicate windows with a vectorized
  sorted-run scan, and a small ``groupby(doc_id)`` sums the per-bucket
  partials.  The shuffled volume is O(total tokens) × 16 B regardless
  of document sizes, and no stage ever holds more than one hash
  bucket.

Tokenization is Arrow's RE2 ``\\s+`` split with empty tokens dropped —
the same regex engine DuckDB uses, so the SQL oracles'
``regexp_split_to_array`` agrees BY CONSTRUCTION (the
``token_count_batch`` precedent, stages/textstats.py).  Window hashes
are the first 8 bytes of ``md5(gram)`` exactly as DuckDB's
``('0x' || substr(md5(g), 1, 16))::UBIGINT`` computes them, so even a
hash collision collapses identically on both sides.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum


def _doc_tokens(batch: pa.Table, column: str):
    """Flatten a batch's text column to ``(doc_idx, token)`` arrays with
    empty tokens dropped (RE2 ``\\s+`` split — SQL-mirrorable)."""
    col = pc.fill_null(batch[column].combine_chunks(), "")
    lists = pc.split_pattern_regex(col, r"\s+")
    flat = lists.values
    offsets = np.asarray(lists.offsets)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                        np.diff(offsets))
    toks = flat.to_numpy(zero_copy_only=False)
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    return doc_idx[keep], toks[keep]


def _grams(doc_idx: np.ndarray, toks: np.ndarray, n: int):
    """All contiguous ``n``-token windows that stay inside one document,
    as ``(doc_idx, space-joined gram)`` arrays.  Shift-and-concat over
    the flat token array — no per-document Python."""
    m = len(toks)
    if m < n:
        return (np.empty(0, np.int64),
                np.empty(0, object))
    valid = doc_idx[: m - n + 1] == doc_idx[n - 1:]
    g = pd.Series(toks[: m - n + 1], dtype=object)
    for j in range(1, n):
        g = g.str.cat(pd.Series(toks[j: m - n + 1 + j], dtype=object),
                      sep=" ")
    return doc_idx[: m - n + 1][valid], g.to_numpy()[valid]


# -- per-document repetition statistics -------------------------------------


def repetition_stats_batch(batch: pa.Table, column: str = "text",
                           gram_sizes: tuple[int, ...] = (2, 5)) -> pa.Table:
    """Append ``n_words`` plus, per gram size ``n``, ``top{n}_n`` (count
    of the most frequent n-gram) and ``dup{n}_n`` (total occurrences of
    n-grams that occur at least twice) — integer-exact, so fraction
    thresholds downstream are cross-multiplications, never floats."""
    doc_idx, toks = _doc_tokens(batch, column)
    n_rows = len(batch)
    out = batch.append_column(
        "n_words", pa.array(np.bincount(doc_idx, minlength=n_rows)
                            .astype(np.int64)))
    for n in gram_sizes:
        d, g = _grams(doc_idx, toks, n)
        top = np.zeros(n_rows, np.int64)
        dup = np.zeros(n_rows, np.int64)
        if len(d):
            cnt = (pd.DataFrame({"d": d, "g": g})
                   .groupby(["d", "g"], sort=False).size()
                   .rename("c").reset_index())
            per_top = cnt.groupby("d", sort=False)["c"].max()
            top[per_top.index.to_numpy()] = per_top.to_numpy()
            dups = cnt[cnt["c"] >= 2]
            if len(dups):
                per_dup = dups.groupby("d", sort=False)["c"].sum()
                dup[per_dup.index.to_numpy()] = per_dup.to_numpy()
        out = out.append_column(f"top{n}_n", pa.array(top))
        out = out.append_column(f"dup{n}_n", pa.array(dup))
    return out


def repetition_stats(ds, column: str = "text",
                     gram_sizes: tuple[int, ...] = (2, 5)):
    """Per-document repetition counters as one stateless streaming pass."""
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, column, gram_sizes),
        batch_format="pyarrow")


# -- cross-document duplicate windows ---------------------------------------


def _window_hash_rows(batch: pa.Table, column: str, w: int, id_col: str,
                      num_partitions: int, sample_mod: int = 1) -> pa.Table:
    """One batch → its per-doc DISTINCT window-hash rows
    ``(doc_id, gh, part)``.  md5 runs once per distinct gram STRING in
    the batch (repeated boilerplate windows hash once), then a second
    distinct pass in hash space mirrors the oracle's collision collapse."""
    doc_idx, toks = _doc_tokens(batch, column)
    d, g = _grams(doc_idx, toks, w)
    id_type = batch.schema.field(id_col).type
    empty = pa.table({id_col: pa.array([], id_type),
                      "gh": pa.array([], pa.int64()),
                      "part": pa.array([], pa.int64())})
    if not len(d):
        return empty
    dedup = pd.DataFrame({"d": d, "g": g}).drop_duplicates()
    uniq_g, inv = np.unique(dedup["g"].to_numpy(), return_inverse=True)
    gh_uniq = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
         for s in uniq_g),
        dtype=np.uint64, count=len(uniq_g))
    pairs = (pd.DataFrame({"d": dedup["d"].to_numpy(),
                           "gh": gh_uniq[inv]})
             .drop_duplicates())
    if sample_mod > 1:
        # uniform sampling in HASH space: both sides keep exactly the
        # windows with gh % s == 0, so the sampled statistic is still
        # deterministic and SQL-mirrorable
        pairs = pairs[pairs["gh"].to_numpy() % np.uint64(sample_mod)
                      == 0]
    gh = pairs["gh"].to_numpy()
    # take() keeps the caller's id type (ints, strings, ...) exactly
    id_vals = batch[id_col].take(pa.array(pairs["d"].to_numpy(),
                                          pa.int64()))
    return pa.table({
        id_col: id_vals,
        "gh": pa.array(gh.view(np.int64)),
        "part": pa.array((gh % np.uint64(num_partitions)).astype(np.int64)),
    })


def _bucket_partials(group: pa.Table, id_col: str) -> pa.Table:
    """One hash bucket → per-doc partial counts: rows sorted by window
    hash, a run of length ≥ 2 means that window exists in ≥ 2 distinct
    documents (rows are per-doc distinct), so every row of such a run is
    a duplicated window for its document."""
    gh = group["gh"].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(gh, kind="stable")
    gh, ids = gh[order], ids[order]
    starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]])
    run_len = np.diff(np.r_[starts, len(gh)])
    is_dup = np.repeat(run_len >= 2, run_len)
    uniq_ids, first_pos, codes = np.unique(ids, return_index=True,
                                           return_inverse=True)
    # take() via first occurrences keeps the id type (ints, strings, ...)
    id_vals = group[id_col].take(
        pa.array(np.asarray(order)[first_pos], pa.int64()))
    return pa.table({
        id_col: id_vals,
        "n_windows": pa.array(np.bincount(codes, minlength=len(uniq_ids))
                              .astype(np.int64)),
        "n_dup_windows": pa.array(
            np.bincount(codes, weights=is_dup.astype(np.float64),
                        minlength=len(uniq_ids)).astype(np.int64)),
    })


def dup_windows(ds, w: int = 8, column: str = "text",
                id_col: str = "doc_id", num_partitions: int = 64,
                sample_mod: int = 1):
    """Per-document duplicate-window counts: ``(doc_id, n_windows,
    n_dup_windows)`` where ``n_windows`` counts the doc's distinct
    ``w``-token windows and ``n_dup_windows`` those shared with at least
    one other document.  Documents shorter than ``w`` tokens emit no row
    (they have no windows) — the SQL mirror agrees.

    Shape: map_batches (distinct 16 B hash rows) → ONE ``groupby(part)``
    over hash buckets (vectorized sorted-run scan per bucket) → small
    ``groupby(doc_id)`` sum of the per-bucket partials.

    Scale notes.  (1) Exact substring analysis over a full corpus is
    inherently O(total tokens) shuffle volume — the published pipelines
    either run it per shard or SAMPLE; ``sample_mod=s`` keeps only
    windows with ``gh % s == 0`` (uniform in hash space, deterministic,
    SQL-mirrorable), cutting both counters and volume by ~s while the
    dup-RATIO estimate stays unbiased.  (2) Window hashes spread
    uniformly over partitions, but one pathological window shared by a
    large corpus fraction concentrates ITS rows in one partition (a
    key, not a bucket, so more partitions don't split it); the rows are
    16 B and the per-partition pass is vectorized, so the practical cap
    is partition memory — for adversarial template corpora run the
    exact-dup collapse first (stages/dedup.py), which removes identical
    documents before their windows are ever hashed.
    """
    rows = ds.map_batches(
        lambda b: _window_hash_rows(b, column, w, id_col, num_partitions,
                                    sample_mod),
        batch_format="pyarrow")
    partials = rows.groupby("part").map_groups(
        lambda g: _bucket_partials(g, id_col), batch_format="pyarrow")
    out = partials.groupby(id_col).aggregate(
        Sum(on="n_windows", alias_name="n_windows"),
        Sum(on="n_dup_windows", alias_name="n_dup_windows"))
    import ray.data

    # seed a 0-row typed block so an empty result keeps its schema
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    empty = ray.data.from_arrow(pa.table({
        id_col: pa.array([], id_type),
        "n_windows": pa.array([], pa.int64()),
        "n_dup_windows": pa.array([], pa.int64()),
    }))
    return empty.union(out)

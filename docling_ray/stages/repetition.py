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
    as ``(doc_idx, space-joined gram, flat start index)`` arrays.
    Shift-and-concat over the flat token array — no per-document Python.
    The third array indexes each window's first token in the FLAT token
    arrays, from which a within-document position is one subtraction."""
    m = len(toks)
    if m < n:
        return (np.empty(0, np.int64),
                np.empty(0, object),
                np.empty(0, np.int64))
    valid = doc_idx[: m - n + 1] == doc_idx[n - 1:]
    g = pd.Series(toks[: m - n + 1], dtype=object)
    for j in range(1, n):
        g = g.str.cat(pd.Series(toks[j: m - n + 1 + j], dtype=object),
                      sep=" ")
    vidx = np.flatnonzero(valid)
    return doc_idx[vidx], g.to_numpy()[vidx], vidx


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
        d, g, _ = _grams(doc_idx, toks, n)
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
    d, g, _ = _grams(doc_idx, toks, w)
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


# -- exact-substring dedup with removal --------------------------------------
#
# The removal half of exact-substring corpus dedup (the
# deduplicate-text-datasets transform; `dup_windows` above is its decision
# statistic): every ``w``-token window that appears in MORE THAN ONE
# document is kept only in the lexicographically-smallest document that
# contains it; every other document loses all tokens covered by its
# occurrences, and the survivors are re-joined with single spaces.
# Within-document repeats are NOT removed (cross-document semantics —
# `repetition_stats` is the within-doc signal).
#
# Shape: the DECISION pass moves only (doc_id, pos, gh) rows — 16 B window
# hashes plus an int position, never text — through ONE hash-bucketed
# all-to-all; each gh-complete bucket resolves winners with a vectorized
# groupby-transform (winner = min doc_id per hash).  Reconstruction is
# either a broadcast of the loser-position table applied in a stateless
# map over the original dataset (default; drop rows are bounded by the
# duplicated-window occurrence count) or, at extreme duplicate rates, a
# pre-bucketed vectorized pack + ONE hash-shuffle left-outer join
# (``backend="join"``) so no driver- or actor-resident copy of the drop
# set ever exists.


def _window_pos_rows(batch: pa.Table, column: str, w: int, id_col: str,
                     num_partitions: int) -> pa.Table:
    """One batch → ALL its window rows ``(doc_id, pos, gh, part)`` with
    0-based within-document start positions.  md5 runs once per DISTINCT
    gram string in the batch (repeated boilerplate hashes once)."""
    doc_idx, toks = _doc_tokens(batch, column)
    d, g, fi = _grams(doc_idx, toks, w)
    id_type = batch.schema.field(id_col).type
    empty = pa.table({id_col: pa.array([], id_type),
                      "pos": pa.array([], pa.int64()),
                      "gh": pa.array([], pa.int64()),
                      "part": pa.array([], pa.int64())})
    if not len(d):
        return empty
    counts = np.bincount(doc_idx, minlength=len(batch))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = fi - starts[d]
    uniq_g, inv = np.unique(g, return_inverse=True)
    gh_uniq = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
         for s in uniq_g),
        dtype=np.uint64, count=len(uniq_g))
    gh = gh_uniq[inv]
    return pa.table({
        id_col: batch[id_col].take(pa.array(d, pa.int64())),
        "pos": pa.array(pos.astype(np.int64)),
        "gh": pa.array(gh.view(np.int64)),
        "part": pa.array((gh % np.uint64(num_partitions)).astype(np.int64)),
    })


def _bucket_window_losers(group: pa.Table, id_col: str) -> pa.Table:
    """One gh-complete partition → its removal rows ``(doc_id, pos)``:
    every occurrence of a window whose minimal containing doc_id is a
    DIFFERENT document.  The winner (min doc_id per hash) keeps all its
    occurrences; a hash confined to one document emits nothing (its min
    is itself).  groupby-transform("min") is pandas' C path — zero
    per-group Python."""
    id_type = group.schema.field(id_col).type
    empty = pa.table({id_col: pa.array([], id_type),
                      "pos": pa.array([], pa.int64())})
    if group.num_rows == 0:
        return empty
    ids = group[id_col].to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"gh": group["gh"].to_numpy(zero_copy_only=False),
                       "d": ids})
    wmin = df.groupby("gh", sort=False)["d"].transform("min").to_numpy()
    lose = ids != wmin
    if not lose.any():
        return empty
    keep = pa.array(lose)
    return pa.table({id_col: group[id_col].filter(keep),
                     "pos": group["pos"].filter(keep)})


def _rebuild_clean(batch: pa.Table, w: int, column: str,
                   rm_pos_per_row: list) -> pa.Table:
    """Vectorized reconstruction: re-tokenize the batch (same RE2 split
    as the decision pass), knock out every token covered by a removal
    window ``[pos, pos+w)``, and re-join survivors with single spaces
    (the SQL mirror's ``string_agg(tok, ' ')``, so ALL docs come back
    whitespace-normalized).  Appends ``text_clean`` and ``n_removed``."""
    col = pc.fill_null(batch[column].combine_chunks(), "")
    lists = pc.split_pattern_regex(col, r"\s+")
    flat = lists.values
    counts = np.diff(np.asarray(lists.offsets))
    row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    row_idx = row_idx[nonempty]
    toks = flat.filter(pa.array(nonempty))
    n_tok = np.bincount(row_idx, minlength=len(batch)).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    keep = np.ones(len(row_idx), dtype=bool)
    span = np.arange(w, dtype=np.int64)
    for i, rms in enumerate(rm_pos_per_row):
        if rms is None or not len(rms):
            continue
        covered = (np.asarray(rms, dtype=np.int64)[:, None] + span).ravel()
        keep[starts[i] + covered] = False
    kept_counts = np.bincount(row_idx[keep], minlength=len(batch))
    offsets64 = np.concatenate([[0], np.cumsum(kept_counts, dtype=np.int64)])
    if offsets64[-1] >= 2 ** 31:  # int32 offsets would wrap silently
        raise ValueError(
            f"batch holds {offsets64[-1]} kept tokens >= 2^31; shrink "
            "batch_size for this stage (offsets are int32 ListArray)")
    offsets = offsets64.astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                  toks.filter(pa.array(keep)))
    out = batch.append_column("text_clean", pc.binary_join(la, " "))
    return out.append_column(
        "n_removed", pa.array((n_tok - kept_counts).astype(np.int64)))


class SubstringDedupStage:
    """Broadcast reconstruction actor: fetches the loser-position table
    ONCE in ``__init__`` (doc_id → positions array), per batch rebuilds
    via `_rebuild_clean` — unaffected docs take the no-loop path."""

    def __init__(self, rm_ref, w: int, column: str, id_col: str):
        import ray

        tbl = (rm_ref if isinstance(rm_ref, pa.Table) else ray.get(rm_ref))
        self.w, self.column, self.id_col = w, column, id_col
        df = pd.DataFrame({"d": tbl[id_col].to_numpy(zero_copy_only=False),
                           "p": tbl["pos"].to_numpy(zero_copy_only=False)})
        self.rm = {d: g.to_numpy() for d, g in df.groupby("d", sort=False)["p"]}

    def __call__(self, batch: pa.Table) -> pa.Table:
        per_row = [self.rm.get(d) for d in
                   batch[self.id_col].to_pylist()]
        return _rebuild_clean(batch, self.w, self.column, per_row)


def _apply_removals_part(group: pa.Table, w: int, column: str,
                         id_col: str, orig_cols: list,
                         out_schema: pa.Schema) -> pa.Table:
    """One doc-complete partition of the tagged union: split doc rows
    (``_side`` 0) from removal rows (``_side`` 1), gather each doc's
    removal positions with a pandas C groupby, rebuild vectorized."""
    if group.num_rows == 0:
        return out_schema.empty_table()
    side = group["_side"].to_numpy(zero_copy_only=False)
    docs = group.filter(pa.array(side == 0)).select(orig_cols)
    if docs.num_rows == 0:
        return out_schema.empty_table()
    rm = group.filter(pa.array(side == 1))
    if rm.num_rows:
        df = pd.DataFrame(
            {"d": rm[id_col].to_numpy(zero_copy_only=False),
             "p": rm["_pos"].to_numpy(zero_copy_only=False)})
        m = {d: g.to_numpy() for d, g in df.groupby("d", sort=False)["p"]}
    else:
        m = {}
    per_row = [m.get(d) for d in docs[id_col].to_pylist()]
    return _rebuild_clean(docs, w, column, per_row).cast(out_schema)


def substring_dedup(ds, w: int = 8, column: str = "text",
                    id_col: str = "doc_id", num_partitions: int = 64,
                    concurrency: int = 4, backend: str = "broadcast"):
    """Exact-substring dedup with removal (see section comment above).
    Returns the input dataset with ``text_clean`` (whitespace-normalized
    surviving tokens; '' if everything was removed) and ``n_removed``
    (tokens deleted) appended.

    ``backend="broadcast"`` (default): the loser-position table —
    bounded by duplicated-window OCCURRENCES, a fraction of total tokens
    in real crawls — is ``ray.put`` once and applied statelessly; the
    payload never shuffles.  ``backend="join"``: docs and loser rows are
    tagged onto ONE canonical schema (the ``asof_join`` pattern —
    Arrow's hash join rejects the empty-partition blocks Ray's
    ``Dataset.join`` feeds it), pre-bucketed on ``hash(doc_id) % P``,
    and each doc-complete partition rebuilds vectorized — one payload
    shuffle, but no materialized copy of the drop set anywhere: the
    shape for adversarial duplicate rates.  Both backends are
    pytest-proven row-identical."""
    import ray
    import ray.data

    rows = ds.map_batches(
        lambda b: _window_pos_rows(b, column, w, id_col, num_partitions),
        batch_format="pyarrow")
    losers = rows.groupby("part").map_groups(
        lambda g: _bucket_window_losers(g, id_col), batch_format="pyarrow")
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    if backend == "join":
        from docling_ray.stages.dedup import _part_of

        orig_schema = pa.schema(list(zip(sch.names, sch.types)))
        orig_cols = list(sch.names)
        canon = pa.schema(list(orig_schema)
                          + [pa.field("_side", pa.int8()),
                             pa.field("_pos", pa.int64())])
        out_schema = pa.schema(list(orig_schema)
                               + [pa.field("text_clean", pa.string()),
                                  pa.field("n_removed", pa.int64())])

        def _tag_docs(b: pa.Table) -> pa.Table:
            cols = {c: b[c] for c in orig_cols}
            cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8))
            cols["_pos"] = pa.nulls(b.num_rows, pa.int64())
            out = pa.table(cols).cast(canon)
            return out.append_column(
                "_part", pa.array(_part_of(out[id_col], num_partitions)))

        def _tag_rm(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or b.num_rows == 0:
                return canon.append(
                    pa.field("_part", pa.int64())).empty_table()
            cols = {c: (b[id_col] if c == id_col
                        else pa.nulls(b.num_rows, orig_schema.field(c).type))
                    for c in orig_cols}
            cols["_side"] = pa.array(np.ones(b.num_rows, np.int8))
            cols["_pos"] = b["pos"]
            out = pa.table(cols).cast(canon)
            return out.append_column(
                "_part", pa.array(_part_of(out[id_col], num_partitions)))

        tagged = ds.map_batches(_tag_docs, batch_format="pyarrow").union(
            losers.map_batches(_tag_rm, batch_format="pyarrow"))
        empty = ray.data.from_arrow(out_schema.empty_table())
        return empty.union(tagged.groupby("_part").map_groups(
            lambda g: _apply_removals_part(g, w, column, id_col,
                                           orig_cols, out_schema),
            batch_format="pyarrow"))
    drop_batches = list(losers.iter_batches(batch_format="pyarrow"))
    drop_tbl = (pa.concat_tables(drop_batches) if drop_batches
                else pa.table({id_col: pa.array([], id_type),
                               "pos": pa.array([], pa.int64())}))
    drop_ref = ray.put(drop_tbl)
    return ds.map_batches(
        SubstringDedupStage, batch_format="pyarrow",
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"rm_ref": drop_ref, "w": w,
                               "column": column, "id_col": id_col})

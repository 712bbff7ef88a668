"""Corpus-curation operators for training-data pipelines: per-domain
caps, benchmark decontamination, and deterministic hash sampling.

These extend the reference's corpus handling (which converts documents
one-by-one and has no corpus-level curation — SURVEY.md §2.6/§2.7) with
the standard web-corpus steps published pipelines apply between crawl
and training (per-domain quotas, eval-set decontamination by n-gram
overlap, reproducible subsampling).  All three follow the repo's
scale shapes:

- ``domain_cap``: top-N rows per domain.  A per-batch COMBINER bounds
  what enters the shuffle to ≤ N rows per (batch, domain); the final
  exact rank runs vectorized inside hash partitions (``part =
  hash(domain) % P``) — never one Python call per domain, and a hot
  domain's shuffle volume is capped at N × num_batches rows, not its
  corpus share.
- ``decontaminate``: the benchmark n-gram set is built ONCE from a
  small pruned read, ``ray.put`` once, fetched once per actor
  (``__init__``), and every batch is filtered against it — the corpus
  side never shuffles.  Real benchmark suites are a few MB of grams;
  the broadcast shape is the 100 TB shape.
- ``hash_sample``: stateless Bernoulli keep by a threshold on
  ``md5(id)`` — deterministic across runs/partitioning, mirrored
  exactly in SQL, and the standard way to cut a reproducible x% slice
  of a crawl without a shuffle.

Tokenization for decontamination uses Arrow's RE2 ``\\s+`` split —
the same regex engine DuckDB uses, so the SQL oracle's
``regexp_split_to_array`` agrees by construction (the
``token_count_batch`` precedent, stages/textstats.py).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from docling_ray.stages.dedup import _part_of

# -- per-domain cap ---------------------------------------------------------


def _top_n_per_domain(table: pa.Table, domain_col: str, order_col: str,
                      id_col: str, n: int,
                      ascending: bool = False) -> pa.Table:
    """Vectorized top-N per domain of one in-memory table: stable
    multi-key sort (domain ASC, order DESC, id ASC) + C-level group
    head — no Python per domain.  ALL input columns survive (the cap is
    a row filter, not a projection), the payload never round-trips
    through pandas (indices are computed on the 3 key columns, then one
    zero-copy ``take``), and a NULL domain forms its own capped group —
    matching the SQL mirror's ``PARTITION BY`` null partition, never a
    silent row drop."""
    df = table.select([domain_col, order_col, id_col]).to_pandas()
    pos = "__row_pos"                      # position in `table`
    df[pos] = np.arange(len(df), dtype=np.int64)
    df = df.sort_values([domain_col, order_col, id_col],
                        ascending=[True, ascending, True],
                        kind="mergesort")
    top = df.groupby(domain_col, sort=False, dropna=False).head(n)
    return table.take(pa.array(top[pos].to_numpy(), pa.int64()))


def domain_cap(ds, domain_col: str = "source", order_col: str = "n_chars",
               id_col: str = "doc_id", n: int = 10,
               num_partitions: int = 64, ascending: bool = False):
    """Keep the top-``n`` rows of each domain, ranked by ``order_col``
    DESC with ``id_col`` ASC tiebreak (web pipelines cap documents per
    registered domain so no single site dominates the corpus).

    Two stages: a map_batches combiner emits each batch's per-domain
    top-N candidates (the only rows that can survive globally), then one
    pre-bucketed ``groupby(part)`` finishes the exact rank per domain
    inside its hash partition.  The shuffle therefore moves at most
    ``N × num_batches`` rows per domain regardless of domain skew.

    ``ascending=True`` ranks by ``order_col`` ASC instead — with a
    per-row hash as the order column this is a deterministic STRATIFIED
    sampler (exactly n rows per group, invariant to partitioning)."""
    def _candidates(batch: pa.Table) -> pa.Table:
        top = _top_n_per_domain(batch, domain_col, order_col, id_col, n,
                                ascending=ascending)
        return top.append_column(
            "part", pa.array(_part_of(top[domain_col], num_partitions)))

    def _finish(group: pa.Table) -> pa.Table:
        return _top_n_per_domain(group, domain_col, order_col, id_col, n,
                                 ascending=ascending)

    cand = ds.map_batches(_candidates, batch_format="pyarrow")
    return cand.groupby("part").map_groups(_finish, batch_format="pyarrow")


# -- benchmark decontamination ----------------------------------------------


def text_ngrams(text: str, n: int) -> set[str]:
    """Space-joined word ``n``-grams of ``text`` under RE2 ``\\s+``
    tokenization (empty tokens dropped).  Python's ``re`` is NOT used:
    its unicode ``\\s`` disagrees with RE2 on NBSP etc., and the SQL
    mirror runs on RE2."""
    toks = [t for t in
            pc.split_pattern_regex(pa.array([text]), r"\s+")[0].as_py()
            if t]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def build_benchmark_grams(texts, n: int = 4) -> set[str]:
    """The driver-side benchmark gram set: distinct word ``n``-grams over
    the held-out texts.  Benchmark suites are small (MBs of grams) —
    build once, ``ray.put`` once, broadcast."""
    grams: set[str] = set()
    for t in texts:
        grams |= text_ngrams(t or "", n)
    return grams


class DecontaminateStage:
    """``map_batches(DecontaminateStage, concurrency=N,
    fn_constructor_kwargs=dict(bench_ref=ref, n=4))`` — drops every row
    whose text shares at least one word n-gram with the broadcast
    benchmark set (the published decontamination recipe for held-out
    eval sets; real suites use n≈8-13, the queries use n=4 so the
    synthetic corpus exercises both outcomes).

    The gram set is fetched once per ACTOR from the object store
    (zero-copy of the serialized set; the BroadcastLookupJoin shape,
    stages/joins.py).

    Probe path (exactness preserved, hot loop vectorized): tokens are
    siphashed once per batch (``pd.util.hash_array``, deterministic
    across processes), every window's gram hash is a Horner fold of its
    ``n`` token hashes (pure uint64 numpy, no joined strings), and a
    per-actor Bloom bit array built from the SAME fold over the
    benchmark grams prefilters the windows.  Only Bloom-POSITIVE
    windows materialize their joined string for the exact set confirm,
    so false positives (Bloom or 64-bit fold collisions) are killed and
    false negatives are impossible — identical token sequences fold
    identically on both sides."""

    _HORNER_C = np.uint64(0x9E3779B97F4A7C15)   # odd ⇒ bijective step
    _K_HASHES = 4

    def __init__(self, bench_ref, n: int = 4, text_col: str = "text",
                 invert: bool = False):
        import pandas as pd
        import ray

        self.bench = (bench_ref if isinstance(bench_ref, (set, frozenset))
                      else ray.get(bench_ref))
        self.n = n
        self.text_col = text_col
        self.invert = invert
        # Bloom over the Horner-folded gram hashes: ~16 bits/gram, k=4
        # → ≈0.24% false-positive rate, each killed by the set confirm
        grams = [g for g in self.bench if g.count(" ") == n - 1]
        m = 1 << max(10, int(np.ceil(np.log2(max(1, 16 * len(grams))))))
        self.m_bits = np.uint64(m)
        self.bits = np.zeros(m, dtype=bool)
        if grams:
            toks = [t for g in grams for t in g.split(" ")]
            th = pd.util.hash_array(np.asarray(toks, dtype=object))
            gh = np.zeros(len(grams), dtype=np.uint64)
            view = th.reshape(len(grams), n)
            with np.errstate(over="ignore"):
                for j in range(n):
                    gh = gh * self._HORNER_C + view[:, j]
            for pos in self._positions(gh):
                self.bits[pos] = True

    def _positions(self, gh: "np.ndarray"):
        """k Bloom bit positions per hash: double hashing with an odd
        second step, everything uint64 wraparound arithmetic."""
        with np.errstate(over="ignore"):
            h2 = (gh >> np.uint64(33)) | np.uint64(1)
            for i in range(self._K_HASHES):
                yield ((gh + np.uint64(i) * h2) % self.m_bits) \
                    .astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        n = self.n
        rows = batch.num_rows
        col = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        lists = pc.split_pattern_regex(col, r"\s+")
        flat = lists.values
        counts = np.diff(np.asarray(lists.offsets))
        row_idx = np.repeat(np.arange(rows, dtype=np.int64), counts)
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        row_idx = row_idx[nonempty]
        toks_arr = flat.filter(pa.array(nonempty))
        n_tok = np.bincount(row_idx, minlength=rows).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        hit = np.zeros(rows, dtype=bool)
        n_win_per_row = np.maximum(n_tok - n + 1, 0)
        total_win = int(n_win_per_row.sum())
        if total_win:
            toks_np = toks_arr.to_numpy(zero_copy_only=False)
            th = pd.util.hash_array(toks_np)
            win_row = np.repeat(np.arange(rows, dtype=np.int64),
                                n_win_per_row)
            win_starts = np.arange(total_win, dtype=np.int64) \
                - np.concatenate(
                    [[0], np.cumsum(n_win_per_row)[:-1]])[win_row] \
                + starts[win_row]
            gh = np.zeros(total_win, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(n):
                    gh = gh * self._HORNER_C + th[win_starts + j]
            maybe = np.ones(total_win, dtype=bool)
            for pos in self._positions(gh):
                maybe &= self.bits[pos]
            # exact confirm: joined strings exist ONLY for Bloom
            # positives (collision kills), typically a tiny fraction
            for w in np.flatnonzero(maybe):
                s = int(win_starts[w])
                if " ".join(toks_np[s:s + n]) in self.bench:
                    hit[win_row[w]] = True
        keep = hit if self.invert else ~hit
        return batch.filter(pa.array(keep))


def decontaminate(ds, bench_ref, n: int = 4, text_col: str = "text",
                  concurrency: int = 4, invert: bool = False):
    """Survivor stream: rows of ``ds`` with no word-``n``-gram overlap
    against the broadcast benchmark set (``invert=True`` yields the
    contaminated rows instead — the audit view)."""
    return ds.map_batches(
        DecontaminateStage, batch_format="pyarrow",
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n,
                               "text_col": text_col, "invert": invert},
        concurrency=(1, concurrency))


# -- deterministic hash sampling --------------------------------------------


def h32_of_ids(col) -> "np.ndarray":
    """THE repo-wide id-hash contract: ``md5(str(id))`` 32-bit prefix as
    uint64, null ids mapped to the above-every-threshold sentinel
    ``2^32`` (the SQL mirror's ``md5(NULL) IS NULL`` drop).  Mirrored
    verbatim by DuckDB's ``('0x' || substr(md5(CAST(id AS VARCHAR)),
    1, 8))::UBIGINT``.  Single definition — hash_sample, mix_sources
    and the funnel/filter family all route through here, so the
    contract can never drift per-site."""
    ids = pc.cast(col, pa.string()).to_pylist()
    return np.fromiter(
        ((1 << 32) if s is None else
         int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big")
         for s in ids),
        dtype=np.uint64, count=len(ids))


def hash_sample_batch(batch: pa.Table, rate: float,
                      id_col: str = "doc_id",
                      bucket_col: Optional[str] = "h32") -> pa.Table:
    """Keep rows whose ``md5(str(id))`` 32-bit prefix falls under
    ``rate * 2^32`` — a deterministic Bernoulli(rate) sample that is
    stable across runs, partitioning and cluster size (md5 of the
    DECIMAL string so DuckDB's ``md5(CAST(id AS VARCHAR))`` mirrors it
    exactly).  ~1 μs/row: id-level hashing, never the payload."""
    thresh = int(rate * (1 << 32))
    h32 = h32_of_ids(batch[id_col])
    out = batch.filter(pa.array(h32 < thresh))
    if bucket_col is not None:
        kept = h32[h32 < thresh]
        out = out.append_column(bucket_col,
                                pa.array(kept.astype(np.int64)))
    return out


def hash_sample(ds, rate: float = 0.25, id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: hash_sample_batch(b, rate, id_col=id_col),
        batch_format="pyarrow")


def bottom_k_sample(ds, k: int, id_col: str = "doc_id",
                    columns: Optional[list] = None) -> pa.Table:
    """EXACT-size-k uniform sample: the k rows with the SMALLEST
    ``md5(str(id))`` 32-bit prefixes — the deterministic equivalent of
    reservoir sampling (a uniform random permutation induced by the
    hash), stable across runs, partitioning and cluster size, and the
    fixed-size counterpart to ``hash_sample``'s rate form.

    Scale shape: each batch keeps only its own bottom-k candidates
    (``hash_sample_batch`` at rate 1 annotates h32, then a per-batch
    partial top-k), so the driver folds at most k×num_batches small
    rows — the partial-top-k merge every ANN path uses; the corpus
    never sorts."""
    import heapq

    def partial(batch: pa.Table) -> pa.Table:
        out = hash_sample_batch(batch, 1.0, id_col=id_col)
        if columns is not None:
            out = out.select(list(dict.fromkeys([*columns, "h32"])))
        if out.num_rows > k:
            order = pc.sort_indices(
                out, sort_keys=[("h32", "ascending"),
                                (id_col, "ascending")])[:k]
            out = out.take(order)
        return out

    folded = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not folded:
        return pa.table({})
    heap = heapq.nsmallest(
        k, folded, key=lambda r: (r["h32"], r[id_col]))
    cols = list(heap[0].keys())
    return pa.table({c: [r[c] for r in heap] for c in cols})


# -- source mixing ----------------------------------------------------------

def mix_sources_batch(batch: pa.Table, rates: dict, default_rate: float,
                      key_col: str = "source",
                      id_col: str = "doc_id") -> pa.Table:
    """Per-SOURCE deterministic Bernoulli keep — the corpus-mixing step
    of training-data pipelines (each domain/source sampled at its own
    rate to hit a target mixture, DoReMi/Pile-style applied weights).

    Same ``md5(str(id))`` 32-bit-prefix contract as ``hash_sample``
    (run-, partition- and cluster-size-invariant; SQL-mirrorable), but
    the threshold is looked up per row from ``rates[source]``
    (``default_rate`` for unlisted sources) via dictionary-encode — one
    tiny Python loop over DISTINCT sources per batch, C speed
    elsewhere."""
    h32 = h32_of_ids(batch[id_col])
    enc = pc.dictionary_encode(pc.fill_null(
        batch[key_col].combine_chunks(), ""))
    per_code = np.array(
        [int(rates.get(v, default_rate) * (1 << 32))
         for v in enc.dictionary.to_pylist()], dtype=np.uint64)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    thresh = per_code[codes] if len(codes) else \
        np.empty(0, dtype=np.uint64)
    return batch.filter(pa.array(h32 < thresh))


def mix_sources(ds, rates: dict, default_rate: float = 1.0,
                key_col: str = "source", id_col: str = "doc_id"):
    """Dataset-level mixing: one stateless ``map_batches`` pass, zero
    shuffles — id-level hashing, never the payload."""
    return ds.map_batches(
        lambda b: mix_sources_batch(b, rates, default_rate, key_col,
                                    id_col),
        batch_format="pyarrow")


# -- filter funnel audit ----------------------------------------------------

def filter_funnel(ds, stage_flags, stage_names: list):
    """Survivor counts through a CONJUNCTIVE filter chain — the audit
    a curation pipeline publishes so no stage silently eats the corpus
    (the repo's "no silent caps" rule, as an operator).

    ``stage_flags(batch) -> list[np.ndarray[bool]]`` returns one keep
    mask per stage for the batch; stage ``i``'s survivors are rows
    passing ALL masks ``0..i``.  ``stage_names[0]`` labels the
    unfiltered input (its mask is implicit all-True), so
    ``len(stage_names) == len(masks) + 1``.

    Shape: one stateless per-batch pass emits ``len(stage_names)``
    partial-count rows per batch (a combiner), then a stage-cardinality
    ``groupby().sum`` — the corpus never shuffles."""
    import numpy as np

    names = list(stage_names)

    def partial(batch: pa.Table) -> pa.Table:
        masks = stage_flags(batch)
        assert len(masks) == len(names) - 1, \
            "need one mask per named stage after the input stage"
        counts = [batch.num_rows]
        alive = np.ones(batch.num_rows, dtype=bool)
        for m in masks:
            alive &= m
            counts.append(int(alive.sum()))
        return pa.table({
            "stage": pa.array(range(len(names)), pa.int64()),
            "n": pa.array(counts, pa.int64()),
        })

    totals = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("stage").sum("n")

    def label(batch: pa.Table) -> pa.Table:
        idx = batch["stage"].to_numpy(zero_copy_only=False)
        return pa.table({
            "stage": batch["stage"],
            "stage_name": pa.array([names[i] for i in idx], pa.string()),
            "n_surviving": batch["sum(n)"].cast(pa.int64()),
        })

    return totals.map_batches(label, batch_format="pyarrow")


# -- weighted sampling ------------------------------------------------------

def weighted_bottom_k(ds, k: int, weight_col: str,
                      id_col: str = "doc_id") -> pa.Table:
    """EXACT-size-k WEIGHTED sample without replacement — the
    bottom-k-by-rank family (Cohen & Kaplan): each row's rank is
    ``h32(md5(str(id))) // max(weight, 1)`` (integer floor division —
    heavier rows get smaller ranks more often), and the sample is the
    k smallest ranks.  Fully deterministic, partition- and
    cluster-size-invariant, and SQL-mirrorable in exact integer
    arithmetic (the ``hash_sample`` md5 contract); the float
    ``u^(1/w)`` of Efraimidis–Spirakis would not hash-reproduce.

    Scale shape: per-batch partial bottom-k (the ``bottom_k_sample``
    combiner), driver folds ≤ k × num_batches rows; the corpus never
    sorts.  Null/zero/negative weights clamp to 1 (uniform floor) so
    every row keeps a well-defined rank."""
    import heapq

    def partial(batch: pa.Table) -> pa.Table:
        out = hash_sample_batch(batch, 1.0, id_col=id_col)
        w = pc.fill_null(out[weight_col].combine_chunks(), 0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = out["h32"].to_numpy(zero_copy_only=False)
        rank = h // np.maximum(w, 1)
        out = out.append_column("rank_key", pa.array(rank, pa.int64()))
        if out.num_rows > k:
            order = pc.sort_indices(
                out, sort_keys=[("rank_key", "ascending"),
                                (id_col, "ascending")])[:k]
            out = out.take(order)
        return out.select([id_col, weight_col, "rank_key"])

    folded = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not folded:
        return pa.table({})
    heap = heapq.nsmallest(
        k, folded, key=lambda r: (r["rank_key"], r[id_col]))
    cols = list(heap[0].keys())
    return pa.table({c: [r[c] for r in heap] for c in cols})

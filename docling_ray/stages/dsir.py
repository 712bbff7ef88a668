"""DSIR-style data selection: hashed n-gram importance weighting
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"), in the engine's integer-exact form.

DSIR scores every raw document by how much its hashed n-gram features
look like a TARGET distribution (e.g. high-quality or in-domain text),
then keeps the top-weighted documents.  The published estimator uses
log-likelihood ratios of two hashed bag-of-ngrams models; floats are not
hash-provable across engines, so — exactly like
``stages/lmscore.familiarity`` replaced CCNet log-probs with corpus
count sums — this module uses the integer likelihood-ratio weight

    w_micro[b] = (1_000_000 * (ct[b] + 1)) // (cr[b] + 1)

per hash bucket ``b`` (Laplace-smoothed target count ``ct`` over raw
count ``cr``, floor division), and a document's importance score is the
int64 sum of ``w_micro`` over its token buckets.  Monotone in the same
direction as the published ratio, deterministic, and mirrored verbatim
by DuckDB integer arithmetic.

Scale shape (every stage streams):
  1. MODEL PASS — per-batch combiner: tokenize (the family's RE2
     ``\\s+`` split), one md5 per DISTINCT token per batch
     (dictionary-encode first), fold into ``n_buckets``-bounded
     ``(bkt, n_raw, n_tgt)`` partials.  The shuffle that follows moves
     ≤ ``n_buckets`` rows per batch — never a token, never text.
  2. A vocabulary-free ``groupby(bkt).sum`` over bucket rows; the
     driver folds ≤ ``n_buckets`` totals into the weight table.
  3. SCORING PASS — weight table broadcast (it is ~2 KB); per-batch
     vectorized probe (dictionary-encode → md5 per distinct token →
     ``np.add.at`` segment sum), zero shuffles.
  4. SELECTION — per-batch partial top-k, driver merges
     ≤ k × num_batches rows (the ``bottom_k_sample`` shape); the corpus
     never reaches a sort.

The corpus is read twice (model + scoring) — the documented two-pass
trade of ``jaccard_near_dups`` / ``line_dedup``; both passes read a
pruned projection.

Hash contract: bucket = ``int(md5(token)[:8], 16) % n_buckets`` ==
DuckDB ``CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) % n_buckets``
(the ``stages/sketch.py`` md5-position family).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_TOKEN_SPLIT_RE = r"\s+"


def _token_buckets(dict_values, n_buckets: int) -> np.ndarray:
    """md5 bucket per DISTINCT token (dictionary values) — the only
    Python loop, bounded by per-batch vocabulary, never token
    occurrences."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                        "big") % n_buckets
         for t in dict_values.to_pylist()),
        dtype=np.int64, count=len(dict_values))


def _tokens_with_rows(batch: pa.Table, text_col: str,
                      include_bigrams: bool = False):
    """Flatten hashed-feature occurrences with their row index:
    (codes, dict_values, row_idx).  '' tokens (leading/trailing
    whitespace artifacts) are dropped on both the Ray and SQL sides.
    With ``include_bigrams`` the feature stream is unigrams PLUS
    within-row space-joined bigrams (the paper's hashed n-gram form) —
    built with one Arrow ``binary_join_element_wise`` over the shifted
    token array, no Python loop; bigrams never collide with unigrams
    in the dictionary (they contain a space, unigrams cannot)."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch[text_col].combine_chunks(), "")
    lists = pc.split_pattern_regex(col, _TOKEN_SPLIT_RE)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    row_idx = np.repeat(np.arange(len(counts)), counts)
    toks = lists.values
    nonempty = pc.not_equal(toks, "").to_numpy(zero_copy_only=False)
    toks = toks.filter(pa.array(nonempty))
    row_idx = row_idx[nonempty]
    if include_bigrams and len(toks) > 1:
        big = pc.binary_join_element_wise(
            toks.slice(0, len(toks) - 1), toks.slice(1), " ")
        same = row_idx[:-1] == row_idx[1:]
        big = big.filter(pa.array(same))
        feats = pa.concat_arrays([toks, big])
        rows = np.concatenate([row_idx, row_idx[:-1][same]])
    else:
        feats, rows = toks, row_idx
    enc = feats.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, enc.dictionary, rows


def dsir_model_partial(batch: pa.Table, text_col: str,
                       target_mask: np.ndarray,
                       n_buckets: int,
                       include_bigrams: bool = False) -> pa.Table:
    """Combiner half of the model pass: ``(bkt, n_raw, n_tgt)`` partial
    counts, ≤ ``n_buckets`` rows out regardless of batch size."""
    codes, dvals, row_idx = _tokens_with_rows(batch, text_col,
                                              include_bigrams)
    bkt_of_code = _token_buckets(dvals, n_buckets)
    bkt = bkt_of_code[codes] if len(codes) else np.empty(0, np.int64)
    n_raw = np.bincount(bkt, minlength=n_buckets).astype(np.int64)
    is_tgt = target_mask[row_idx] if len(row_idx) \
        else np.empty(0, dtype=bool)
    n_tgt = np.bincount(bkt[is_tgt], minlength=n_buckets).astype(np.int64)
    nz = (n_raw > 0) | (n_tgt > 0)
    return pa.table({
        "bkt": pa.array(np.nonzero(nz)[0].astype(np.int64)),
        "n_raw": pa.array(n_raw[nz]),
        "n_tgt": pa.array(n_tgt[nz]),
    })


def dsir_weights(ds, text_col: str = "text", target_col: str = "lang",
                 target_values: tuple = ("en",),
                 n_buckets: int = 256,
                 include_bigrams: bool = False) -> np.ndarray:
    """Train the bucketed importance-weight table over ``ds``.  Returns
    an int64 array of ``n_buckets`` micro-unit weights.  Buckets no raw
    token hits keep the neutral smoothed weight (never probed)."""
    import pyarrow.compute as pc

    tv = set(target_values)

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(pc.fill_null(batch[target_col].combine_chunks(),
                                     ""),
                        value_set=pa.array(sorted(tv))) \
            .to_numpy(zero_copy_only=False)
        return dsir_model_partial(batch, text_col, mask, n_buckets,
                                  include_bigrams)

    totals = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bkt").sum(["n_raw", "n_tgt"]).take_all()
    cr = np.zeros(n_buckets, np.int64)
    ct = np.zeros(n_buckets, np.int64)
    for r in totals:
        cr[r["bkt"]] = r["sum(n_raw)"]
        ct[r["bkt"]] = r["sum(n_tgt)"]
    return (1_000_000 * (ct + 1)) // (cr + 1)


def dsir_score_batch(batch: pa.Table, w_micro: np.ndarray,
                     text_col: str, id_col: str,
                     include_bigrams: bool = False) -> pa.Table:
    """Scoring half: int64 importance score per document (``np.add.at``
    segment sum — exact integer arithmetic, order-independent).
    Zero-token documents are dropped (no feature evidence), matching
    the SQL mirror's inner join."""
    n_buckets = len(w_micro)
    codes, dvals, row_idx = _tokens_with_rows(batch, text_col,
                                              include_bigrams)
    bkt_of_code = _token_buckets(dvals, n_buckets)
    score = np.zeros(batch.num_rows, np.int64)
    n_tok = np.bincount(row_idx, minlength=batch.num_rows) \
        .astype(np.int64)
    if len(codes):
        np.add.at(score, row_idx, w_micro[bkt_of_code[codes]])
    has = n_tok > 0
    return pa.table({
        id_col: batch[id_col].filter(pa.array(has)),
        "n_tokens": pa.array(n_tok[has]),
        "dsir_score": pa.array(score[has]),
    })


def dsir_select(ds, k: int = 100, text_col: str = "text",
                id_col: str = "doc_id", target_col: str = "lang",
                target_values: tuple = ("en",),
                n_buckets: int = 256,
                include_bigrams: bool = False) -> pa.Table:
    """End-to-end DSIR selection: train weights, score every doc, keep
    the top-``k`` by ``(dsir_score DESC, id ASC)``.  Returns a small
    ``pa.Table`` (k rows) — the selected-set manifest a curation
    pipeline would semi-join against the corpus (``stages/joins.py``)."""
    import pyarrow.compute as pc

    w = dsir_weights(ds, text_col, target_col, target_values, n_buckets,
                     include_bigrams)

    def score_topk(batch: pa.Table) -> pa.Table:
        t = dsir_score_batch(batch, w, text_col, id_col,
                             include_bigrams)
        order = pc.sort_indices(t, sort_keys=[
            ("dsir_score", "descending"), (id_col, "ascending")])
        return t.take(order.slice(0, k))

    partials = ds.map_batches(score_topk, batch_format="pyarrow") \
        .take_all()                     # ≤ k × num_batches tiny rows
    merged = sorted(partials,
                    key=lambda r: (-r["dsir_score"], r[id_col]))[:k]
    # preserve the input id type (int64 corpora AND the sha-256 string
    # doc_id contract both flow through here)
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    id_type = base.field(id_col).type if base is not None \
        and id_col in base.names else pa.int64()
    return pa.table({
        id_col: pa.array([r[id_col] for r in merged], id_type),
        "n_tokens": pa.array([r["n_tokens"] for r in merged], pa.int64()),
        "dsir_score": pa.array([r["dsir_score"] for r in merged],
                               pa.int64()),
    })

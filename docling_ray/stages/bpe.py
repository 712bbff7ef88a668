"""Distributed BPE vocabulary training + corpus tokenization.

Scale story (the Sennrich et al. 2016 subword-NMT algorithm re-shaped
for Ray Data): the corpus text is read ONCE to build a ``(word, freq)``
vocabulary table — per-batch Arrow ``group_by`` partials, then one
distributed sum — after which every merge iteration runs over the VOCAB
table (bounded by the number of distinct words, 10^5–10^7 rows at crawl
scale, NOT the corpus).  Pair counting per iteration is combiner-first:
a vectorized ``map_batches`` pass collapses each vocab batch to
``(left, right, weight)`` partials via numpy offset math + Arrow
``group_by``, a distributed sum merges them, and a per-batch partial
top-1 means the driver folds only ``num_batches`` candidate rows to
pick the argmax — the pair table itself never lands on the driver.
Merge application is a broadcast: two Arrow ``replace_substring``
passes over the spaced symbol sequences, no shuffle.  Tokenizing a
corpus with a trained merge list is one stateless ``map_batches`` pass
(merges ride the closure, vocabulary-sized — the broadcast-small-side
pattern).

Symbol-sequence contract (mirrored VERBATIM in the SQL oracle):

- words are lowercase ASCII runs: ``split(lower(text), '[^a-z]+')``
  minus empties — identical to SQL ``regexp_extract_all(lower(text),
  '[a-z]+')``;
- a word's start state is the spaced symbol string
  ``' c1 c2 ... cn </w> '`` (leading + trailing space, ``</w>``
  end-of-word marker; ``<``/``>`` cannot occur in a symbol);
- applying merge ``(a, b)`` replaces ``' a b '`` with ``' ab '`` by
  non-overlapping left-to-right substring replace, run TWICE — the
  second pass catches occurrences whose leading space was consumed by
  a preceding match.  This is a deterministic variant of the published
  per-word left-to-right scan: on runs of 3+ repetitions of the same
  pair sharing delimiters the merged token can land at different
  offsets than the canonical scan (tests pin the divergence case);
  engine and oracle apply the identical rule so the compare is exact;
- tie-break on equal pair counts: lexicographically smallest
  ``(left, right)`` (ASCII byte order on both sides).

Reference spec: the merge loop mirrors what subword-nmt's learn_bpe
computes (pair argmax over word-frequency representations); there is no
counterpart in /root/reference — this is an engine-level addition for
LLM-training-data pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_SPLIT = "[^a-z]+"
_END = "</w>"


def _words_of(text_col: pa.ChunkedArray | pa.Array):
    """Lowercase ASCII word runs per row → ListArray[string] (nulls →
    empty text, matching the oracle's coalesce)."""
    low = pc.utf8_lower(pc.fill_null(text_col, ""))
    return pc.split_pattern_regex(low, _WORD_SPLIT)


def _flatten_words(lists) -> tuple[pa.Array, np.ndarray]:
    """ListArray[string] → (non-empty flat words, row index per word)."""
    la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) \
        else lists
    flat = la.flatten()
    counts = pc.list_value_length(la).to_numpy(zero_copy_only=False)
    row_id = np.repeat(np.arange(len(la), dtype=np.int64),
                       np.nan_to_num(counts).astype(np.int64))
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    return flat.filter(keep), row_id[keep_np]


def _seq_of(words) -> pa.Array:
    """word → ``' c1 c2 ... </w> '`` (SQL mirror: ``' ' ||
    regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> '``)."""
    spaced = pc.replace_substring_regex(words, pattern="(.)",
                                        replacement=r"\1 ")
    return pc.binary_join_element_wise(
        pa.array([" "] * len(spaced)), spaced, _END + " ", "")


def word_freqs(ds, text_col: str = "text"):
    """Corpus → distributed ``(word, freq)`` vocabulary table.  ONE pass
    over the text (per-batch C group_by partials), one vocab-bounded
    distributed sum; the text itself never shuffles."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        words, _ = _flatten_words(_words_of(batch[text_col]))
        if len(words) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64())})
        t = pa.table({"word": words})
        out = t.group_by(["word"]).aggregate([([], "count_all")])
        return out.rename_columns(["word", "freq"])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum(on="freq",
                                             alias_name="freq")))


def _pair_partials(batch: pa.Table) -> pa.Table:
    """One vocab batch → its (left, right, w) adjacent-pair histogram.
    Pure offset math: flatten the split sequences, a pair is valid when
    both members share a list row and neither is the '' sentinel the
    leading/trailing spaces produce."""
    empty = pa.table({"left": pa.array([], pa.string()),
                      "right": pa.array([], pa.string()),
                      "w": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    split = pc.split_pattern(batch["seq"], " ").combine_chunks()
    flat = split.flatten()
    n = len(flat)
    if n < 2:
        return empty
    counts = pc.list_value_length(split).to_numpy(zero_copy_only=False)
    row_id = np.repeat(np.arange(len(split), dtype=np.int64),
                       counts.astype(np.int64))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    valid = (row_id[:-1] == row_id[1:]) & nonempty[:-1] & nonempty[1:]
    idx = np.flatnonzero(valid)
    if len(idx) == 0:
        return empty
    freq = batch["freq"].to_numpy(zero_copy_only=False)
    take_l = pa.array(idx, pa.int64())
    take_r = pa.array(idx + 1, pa.int64())
    t = pa.table({"left": flat.take(take_l),
                  "right": flat.take(take_r),
                  "w": pa.array(freq[row_id[idx]], pa.int64())})
    out = t.group_by(["left", "right"]).aggregate([("w", "sum")])
    return out.rename_columns(["left", "right", "w"])


def _top1(batch: pa.Table) -> pa.Table:
    """Partial argmax: keep this batch's best (w desc, left, right asc)
    row — the driver folds num_batches rows, never the pair table."""
    if batch.num_rows == 0:
        return batch
    order = pc.sort_indices(batch, sort_keys=[("w", "descending"),
                                              ("left", "ascending"),
                                              ("right", "ascending")])
    return batch.take(order[:1])


def apply_merge(seqs, left: str, right: str):
    """The two-pass spaced replace (contract above) — vectorized."""
    pat, rep = f" {left} {right} ", f" {left}{right} "
    once = pc.replace_substring(seqs, pattern=pat, replacement=rep)
    return pc.replace_substring(once, pattern=pat, replacement=rep)


def bpe_train(ds, n_merges: int, text_col: str = "text") -> pa.Table:
    """Learn ``n_merges`` BPE merges over a corpus → Table
    ``(rank, left, right)``, rank 1-based in learn order.

    Per iteration: one map_batches pair-partial pass over the
    (materialized, vocab-bounded) word table, one distributed pair sum,
    a per-batch partial top-1, a driver fold of num_batches candidates,
    then a broadcast merge application.  The corpus is touched exactly
    once (word_freqs)."""
    from ray.data.aggregate import Sum

    def add_seq(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("word"), "seq",
            _seq_of(batch["word"]))

    words = (word_freqs(ds, text_col)
             .map_batches(add_seq, batch_format="pyarrow")
             .materialize())
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cands = (words.map_batches(_pair_partials,
                                   batch_format="pyarrow")
                 .groupby(["left", "right"])
                 .aggregate(Sum(on="w", alias_name="w"))
                 .map_batches(_top1, batch_format="pyarrow")
                 .take_all())
        if not cands:
            break
        best = min(cands, key=lambda r: (-r["w"], r["left"], r["right"]))
        left, right = best["left"], best["right"]
        merges.append((left, right))

        def apply(batch: pa.Table, left=left, right=right) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("seq"), "seq",
                apply_merge(batch["seq"], left, right))

        words = words.map_batches(apply,
                                  batch_format="pyarrow").materialize()
    return pa.table({
        "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
    })


def bpe_token_counts(ds, merges: list[tuple[str, str]],
                     id_col: str = "doc_id", text_col: str = "text"):
    """Tokenize a corpus with a trained merge list → Dataset
    ``(id_col, n_bpe_tokens)``.  ONE stateless map_batches pass; the
    merge list rides the closure (vocabulary-sized broadcast).  A
    symbol sequence ``' s1 ... sn '`` has n+1 spaces, so the per-word
    token count is ``count(' ') - 1``; per-doc counts are a segment sum
    over the exploded words (docs with no words keep a 0 row)."""
    merges = list(merges)

    def tokenize(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        totals = np.zeros(n_rows, dtype=np.int64)
        words, row_id = _flatten_words(_words_of(batch[text_col]))
        if len(words):
            seqs = _seq_of(words)
            for left, right in merges:
                seqs = apply_merge(seqs, left, right)
            per_word = pc.subtract(
                pc.count_substring(seqs, " "), 1) \
                .to_numpy(zero_copy_only=False)
            np.add.at(totals, row_id, per_word)
        return pa.table({id_col: batch[id_col],
                         "n_bpe_tokens": pa.array(totals, pa.int64())})

    return ds.map_batches(tokenize, batch_format="pyarrow")

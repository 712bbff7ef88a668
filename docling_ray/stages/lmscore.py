"""Corpus-LM familiarity scoring — the language-model quality signal of
the CCNet-family pipelines (docs whose character statistics diverge from
the corpus read as noise/garble and score low), in an INTEGER-EXACT
formulation so the SQL oracle hash-matches:

    familiar_sum(doc) = Σ over the doc's bigram positions of the
                        CORPUS count of that bigram
    n_bigrams(doc)    = the doc's bigram position count

(the usual log-probability dampening is deliberately dropped — it needs
transcendentals that are not bit-stable across libms; for FILTERING,
``familiar_sum / n_bigrams`` thresholds via integer cross-multiplication
order documents the same way a unigram-normalized LM score does.)

Shape (the TF-IDF pattern): combiner-first model pass — per-batch
``np.unique`` bigram counts, so the shuffle carries alphabet²-bounded
rows per batch — then ONE ``groupby(bigram).sum``; the model (a few KB
for natural text) broadcasts once per actor and scoring is one
``np.searchsorted`` per document.

Bigrams are CODEPOINT pairs: numpy's utf-32 view and DuckDB's
character slicing (``t[i:i+1]``, 1-based both-inclusive) agree on every
string including combining marks — verified by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

_SHIFT = np.int64(21)            # codepoints < 2^21: (a << 21) | b is unique


def _bigram_ids(text: str) -> np.ndarray:
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.int64)
    if len(codes) < 2:
        return np.empty(0, dtype=np.int64)
    return (codes[:-1] << _SHIFT) | codes[1:]


def bigram_model_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """One batch → its partial bigram counts ``(bigram_id, c)``."""
    parts = [_bigram_ids(v.as_py() or "") for v in batch[column]]
    flat = (np.concatenate(parts) if parts
            else np.empty(0, dtype=np.int64))
    if not len(flat):
        return pa.table({"bigram_id": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    ids, counts = np.unique(flat, return_counts=True)
    return pa.table({"bigram_id": pa.array(ids),
                     "c": pa.array(counts.astype(np.int64))})


def bigram_model(ds, column: str = "text") -> pa.Table:
    """Corpus bigram counts: combiner-first partials → ONE
    alphabet²-bounded ``groupby.sum``.  Returns an id-sorted pyarrow
    Table ready for broadcast."""
    merged = ds.map_batches(
        lambda b: bigram_model_partial(b, column),
        batch_format="pyarrow") \
        .groupby("bigram_id").aggregate(Sum(on="c", alias_name="c"))
    table = pa.Table.from_pylist(merged.take_all())
    if table.num_rows == 0:
        return pa.table({"bigram_id": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    return table.select(["bigram_id", "c"]).sort_by("bigram_id")


class FamiliarityStage:
    """``map_batches(FamiliarityStage, concurrency=N,
    fn_constructor_kwargs=dict(model_ref=ref))`` — appends
    ``n_bigrams`` and ``familiar_sum`` per row.  Bigrams absent from
    the model contribute 0 (scoring new text against a reference
    corpus is the production use).  Model fetched once per ACTOR."""

    def __init__(self, model_ref, column: str = "text"):
        import ray

        model = (model_ref if isinstance(model_ref, pa.Table)
                 else ray.get(model_ref))
        self.ids = model["bigram_id"].to_numpy(zero_copy_only=False)
        self.counts = model["c"].to_numpy(zero_copy_only=False)
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_out = np.empty(batch.num_rows, dtype=np.int64)
        fam_out = np.empty(batch.num_rows, dtype=np.int64)
        ids, counts = self.ids, self.counts
        for i, v in enumerate(batch[self.column]):
            bg = _bigram_ids(v.as_py() or "")
            n_out[i] = len(bg)
            if not len(bg) or not len(ids):
                fam_out[i] = 0
                continue
            pos = np.searchsorted(ids, bg)
            pos[pos == len(ids)] = 0          # out-of-range → check idx 0
            hit = ids[pos] == bg
            fam_out[i] = int(counts[pos[hit]].sum())
        out = batch.append_column("n_bigrams", pa.array(n_out))
        return out.append_column("familiar_sum", pa.array(fam_out))


def familiarity(ds, column: str = "text", model: pa.Table | None = None,
                concurrency: int = 4):
    """Two passes over ``ds`` (model + scoring) unless a prebuilt
    ``model`` (e.g. from a reference corpus) is supplied."""
    import ray

    if model is None:
        model = bigram_model(ds, column)
    ref = ray.put(model)
    return ds.map_batches(
        FamiliarityStage, batch_format="pyarrow",
        fn_constructor_kwargs={"model_ref": ref, "column": column},
        concurrency=(1, concurrency))

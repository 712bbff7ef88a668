"""Exact distributed quantiles over a discrete column — the mergeable-
histogram pattern (same family as the HLL sketch and the k-means partial
stats: per-batch combine first, shuffle only the collapsed statistic).

Shape:

- ONE ``map_batches`` pass collapses each batch to ``(group, value,
  count)`` rows via pyarrow's C ``group_by`` — the all-to-all that
  follows moves histograms, never rows,
- ONE distributed ``groupby(group, value).sum`` merges the partials,
- the driver folds the merged histogram (bounded by ``|groups| × |distinct
  values|`` — for doc-length-like columns that is 10³-10⁶ tiny rows, NOT
  the corpus; callers with unbounded-cardinality value columns should
  bucket first) into cumulative counts and reads off the quantiles.

Quantile contract (integer-exact, mirrored verbatim in the SQL oracle):
``q_pct``-th percentile = the smallest value whose cumulative count
``cum`` satisfies ``cum * 100 >= q_pct * n`` — i.e. discrete lower
quantiles with no interpolation, so the compared output stays integral.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum


def _hist_batch(batch: pa.Table, value_col: str,
                group_col: str | None) -> pa.Table:
    """One batch → its (group, value, count) histogram (C group_by)."""
    keys = ([group_col] if group_col else []) + [value_col]
    out = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
    return out.rename_columns(keys + ["count"])


def grouped_quantiles(ds, value_col: str, group_col: str | None = None,
                      pcts: Sequence[int] = (25, 50, 75, 90, 99)):
    """Exact per-group percentiles of an integer column.

    Returns a pyarrow Table ``(group_col?, q_pct, value)`` — one row per
    group × percentile, integer-valued throughout.
    """
    keys = ([group_col] if group_col else []) + [value_col]
    in_schema = ds.schema()          # before execution — it can be None after
    merged = (
        ds.map_batches(
            lambda b: _hist_batch(b, value_col, group_col),
            batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum(on="count", alias_name="count"))
    )
    import pyarrow.compute as pc

    # bounded driver fold: |groups| × |distinct values| histogram rows
    hist = pa.Table.from_pylist(merged.take_all())
    if hist.num_rows == 0:
        # Ray 2.49 reports schema()=None for zero-row datasets (NOTES
        # trap), so the group type is unknowable then — string fallback
        gtype = (dict(zip(in_schema.names, in_schema.types))[group_col]
                 if group_col and in_schema is not None else pa.string())
        cols = ([(group_col, pa.array([], gtype))] if group_col
                else [])
        cols += [("q_pct", pa.array([], pa.int64())),
                 ("value", pa.array([], pa.int64()))]
        return pa.table(dict(cols))

    # group identity via dictionary codes (C-level, exact for ANY group
    # type, and a null group is its own code — never a sort crash)
    if group_col:
        enc = hist[group_col].combine_chunks().dictionary_encode()
        codes = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
    else:
        codes = np.zeros(hist.num_rows, dtype=np.int64)
    values = hist[value_col].to_numpy(zero_copy_only=False)
    counts = hist["count"].to_numpy(zero_copy_only=False)
    order = np.lexsort((values, codes))
    codes, values, counts = codes[order], values[order], counts[order]

    first_rows, out_p, out_v = [], [], []
    starts = np.flatnonzero(
        np.r_[True, codes[1:] != codes[:-1]])
    bounds = np.r_[starts, len(codes)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        cum = np.cumsum(counts[s:e])
        n = int(cum[-1])
        for pct in pcts:
            # smallest value with cum*100 >= pct*n (integer-exact)
            idx = int(np.searchsorted(cum * 100, pct * n))
            first_rows.append(int(order[s]))
            out_p.append(int(pct))
            out_v.append(int(values[s + idx]))
    cols = {}
    if group_col:
        # take() from the histogram keeps the group column's TYPE (and
        # nulls) exactly — never a stringified copy
        cols[group_col] = hist[group_col].take(
            pa.array(first_rows, pa.int64())).combine_chunks()
    cols["q_pct"] = pa.array(out_p, pa.int64())
    cols["value"] = pa.array(out_v, pa.int64())
    return pa.table(cols)


def approx_quantiles(ds, value_col: str, id_col: str,
                     k: int = 1000,
                     pcts: Sequence[int] = (25, 50, 75, 90, 99)):
    """Approximate percentiles of an UNBOUNDED-cardinality column — the
    escape hatch for ``grouped_quantiles``' documented histogram caveat.

    Shape: a deterministic EXACT-size-k uniform sample (the bottom-k
    rows by ``md5(str(id))`` 32-bit prefix — ``corpus_filters.
    bottom_k_sample``'s partial-top-k fold, stable across runs,
    partitioning and cluster size), then the same integer-exact discrete
    lower-quantile rule applied to the sample.  Error is the sampling
    error of a k-row uniform sample (~1/sqrt(k) in rank space,
    distribution-free), and because the sample is hash-deterministic the
    SQL oracle reproduces the output EXACTLY — unlike t-digest/KLL,
    whose merge-order nondeterminism would force a rows-only check.

    Cost at any corpus size: one map_batches pass emitting ≤k candidate
    rows per batch, a k×num_batches driver fold — no shuffle, no
    histogram, no sort of the corpus.

    Returns a pyarrow Table ``(q_pct, value)``, integer-valued.
    """
    from docling_ray.stages.corpus_filters import bottom_k_sample

    samp = bottom_k_sample(ds, k=k, id_col=id_col,
                           columns=[id_col, value_col])
    if samp.num_rows == 0:
        return pa.table({"q_pct": pa.array([], pa.int64()),
                         "value": pa.array([], pa.int64())})
    values = np.sort(samp[value_col].to_numpy(zero_copy_only=False))
    n = len(values)
    out_p, out_v = [], []
    for pct in pcts:
        # smallest value with cum*100 >= pct*n == order statistic at
        # ceil(pct*n/100) (1-based), the grouped_quantiles rule verbatim
        idx = max(0, -(-pct * n // 100) - 1)
        out_p.append(int(pct))
        out_v.append(int(values[idx]))
    return pa.table({"q_pct": pa.array(out_p, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})

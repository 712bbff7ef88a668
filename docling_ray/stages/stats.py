"""Grouped ordinary-least-squares fit + Pearson correlation as a
combiner-first Ray Data operator — the "fit a statistic distributed"
family (the ``kmeans.py`` pattern, closed-form instead of iterative).

Everything reduces to the five classic sufficient statistics per group
(n, Σx, Σy, Σx², Σy², Σxy), accumulated as EXACT int64 partial sums per
batch (``np.add.at`` over dictionary-encoded group codes — a combiner:
the shuffle moves one row per (batch, group), never data rows), summed
by a group-cardinality ``groupby().sum``, then folded into
slope/intercept/r with a FIXED float operation order so the DuckDB
mirror is bit-identical:

    den_x  = n·Σx² − (Σx)²              (exact integer)
    slope  = float(num) / float(den_x)   num = n·Σxy − Σx·Σy
    icept  = (float(Σy) − slope·float(Σx)) / float(n)
    r      = float(num) / (sqrt(float(den_x)) · sqrt(float(den_y)))

The final fold runs on Python ints (arbitrary precision — no silent
int64 overflow in the n·Σxy products; DuckDB's HUGEINT mirrors this to
128 bits).  Per-BATCH partials are int64: a batch whose Σx² partial
exceeds 2⁶³ needs a smaller ``batch_size`` — guarded loudly, the
``stages/index.py`` int32-offset precedent.  Degenerate groups
(zero variance) yield NULL slope/r, matching SQL ``NULLIF``.
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_STATS = ("n", "sx", "sy", "sxx", "syy", "sxy")


def linreg_partial(batch: pa.Table, group_col: str, x_col: str,
                   y_col: str) -> pa.Table:
    """Per-batch partial sufficient statistics, one row per distinct
    group in the batch.  NULL group keys form their OWN group (SQL
    GROUP BY semantics — distinct from the '' group), carried through
    as a null key row.  Groups with zero batch rows are never emitted
    (a filled-null dictionary slot must not materialize an n=0 row the
    SQL mirror has no group for)."""
    import pyarrow.compute as pc

    col = batch[group_col].combine_chunks()
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(pc.fill_null(col, ""))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    gvals = enc.dictionary.to_pylist()
    g = len(gvals)
    if null_mask.any():                  # sentinel code for the NULL group
        codes = codes.copy()
        codes[null_mask] = g
        gvals = gvals + [None]
        g += 1
    x = batch[x_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    y = batch[y_col].cast(pa.int64()).to_numpy(zero_copy_only=False)

    # int64 overflow guard BEFORE the products: element products wrap at
    # |v| >= 2^31.5 and partial sums at n·max² >= 2^63 — a wrapped value
    # cannot self-certify, so bound with exact Python-int arithmetic on
    # the maxima (O(n) scan, no object boxing)
    n_rows = len(x)
    for name, v in (("x", x), ("y", y)):
        m = int(np.abs(v).max()) if n_rows else 0
        if m * m * max(n_rows, 1) >= 2 ** 62:
            raise ValueError(
                f"batch |{name}|max={m} over {n_rows} rows risks int64 "
                "overflow in the squared-sum partials; shrink batch_size "
                "or rescale the column")

    sums = {}
    for name, vals in (("n", np.ones(n_rows, np.int64)), ("sx", x),
                       ("sy", y), ("sxx", x * x), ("syy", y * y),
                       ("sxy", x * y)):
        acc = np.zeros(g, np.int64)
        np.add.at(acc, codes, vals)
        sums[name] = acc
    present = sums["n"] > 0
    return pa.table({
        group_col: pa.array(gvals, type=enc.dictionary.type)
        .filter(pa.array(present)),
        **{k: pa.array(v[present]) for k, v in sums.items()},
    })


def grouped_linreg(ds, group_col: str, x_col: str, y_col: str):
    """Per-group OLS (y on x) slope / intercept / Pearson r.  Returns a
    lazy Dataset with one row per group."""
    totals = ds.map_batches(
        lambda b: linreg_partial(b, group_col, x_col, y_col),
        batch_format="pyarrow") \
        .groupby(group_col).sum(list(_STATS))

    def fold(batch: pa.Table) -> pa.Table:
        groups, ns = [], []
        slopes, iceps, rs = [], [], []
        cols = {k: batch[f"sum({k})"].to_pylist() for k in _STATS}
        for i, gval in enumerate(batch[group_col].to_pylist()):
            n, sx, sy = cols["n"][i], cols["sx"][i], cols["sy"][i]
            sxx, syy, sxy = cols["sxx"][i], cols["syy"][i], cols["sxy"][i]
            num = n * sxy - sx * sy          # exact python ints
            den_x = n * sxx - sx * sx
            den_y = n * syy - sy * sy
            groups.append(gval)
            ns.append(n)
            if den_x == 0:
                slopes.append(None)
                iceps.append(None)
            else:
                slope = float(num) / float(den_x)
                slopes.append(slope)
                iceps.append((float(sy) - slope * float(sx)) / float(n))
            if den_x == 0 or den_y == 0:
                rs.append(None)
            else:
                rs.append(float(num) / (math.sqrt(float(den_x))
                                        * math.sqrt(float(den_y))))
        return pa.table({
            group_col: pa.array(groups),
            "n": pa.array(ns, pa.int64()),
            "slope": pa.array(slopes, pa.float64()),
            "intercept": pa.array(iceps, pa.float64()),
            "r": pa.array(rs, pa.float64()),
        })

    return totals.map_batches(fold, batch_format="pyarrow")


def value_rank(ds, value_col: str, id_col: str):
    """Global dense value rank (count of strictly smaller values —
    SQL's ``rank() OVER (ORDER BY v) - 1``) WITHOUT a global sort:
    one combiner pass builds per-batch (value, count) partials, a
    value-cardinality ``groupby().sum`` + driver fold produces the
    cumulative-count table (bounded by DISTINCT values — the
    ``stages/quantiles.py`` histogram contract and its documented
    unbounded-cardinality caveat), which broadcasts into a stateless
    ``np.searchsorted`` probe.  The corpus itself never sorts and
    never shuffles."""
    import pyarrow.compute as pc

    def hist_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[value_col].combine_chunks())
        return pa.table({
            "v": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    totals = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("v").sum("n").take_all()
    vals = np.array(sorted(r["v"] for r in totals if r["v"] is not None),
                    dtype=np.int64)
    cnts = {r["v"]: r["sum(n)"] for r in totals if r["v"] is not None}
    below = np.concatenate(
        [[0], np.cumsum([cnts[v] for v in vals], dtype=np.int64)[:-1]]) \
        if len(vals) else np.zeros(0, np.int64)

    def probe(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, v)
        return pa.table({
            id_col: batch[id_col],
            value_col: batch[value_col],
            "rank0": pa.array(below[idx] if len(vals)
                              else np.zeros(len(v), np.int64), pa.int64()),
        })

    return ds.map_batches(probe, batch_format="pyarrow")

"""Edit-distance-1 pair mining over the corpus vocabulary — FastSS
deletion neighborhoods (Bocek et al. 2007, "Fast Similarity Search in
Large Dictionaries") reshaped for Ray Data.

Two strings are within Levenshtein distance 1 iff their deletion
neighborhoods ``{s} ∪ {s minus one char}`` intersect (substitution:
delete the differing position from both; insert/delete: the shorter
string IS a deletion of the longer).  So the candidate step is a
hash-join on neighborhood members instead of the quadratic all-pairs
scan, and an exact DP verify removes the false positives the
neighborhood rule admits (e.g. 'ab'~'ba' share members at distance 2).

Scale shape:
  1. VOCAB — the combiner-first distinct-token pass
     (``stages/textstats.token_count_partial`` → vocabulary-sized
     ``groupby``): corpus text never shuffles.
  2. EXPLODE — ≤ len+1 (variant, token) rows per vocab entry, lengths
     capped (``max_len``, logged drops would be the no-silent-caps
     rule — here the cap is a documented parameter, default 20).
  3. PAIR — ONE hash shuffle on ``hash(variant) % P`` and a
     per-partition sorted-run walk (the ``bucketed_doc_groups``
     geometry, inlined): each variant's run emits its pairs.  A hot
     variant of v tokens emits O(v²) candidates — bounded by
     ``max_bucket`` with a loud error, the MinHash ``max_bucket``
     precedent.
  4. VERIFY — exact unit-cost Levenshtein DP per DISTINCT candidate
     pair (bounded by candidates, never vocab²), mirrored by DuckDB's
     ``levenshtein() = 1``.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_ray.stages.dedup import _part_of


def deletion_neighborhood(token: str) -> list:
    """``{token} ∪ all 1-deletions`` (deduped, order-stable)."""
    seen = {token}
    out = [token]
    for i in range(len(token)):
        v = token[:i] + token[i + 1:]
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def levenshtein1(a: str, b: str) -> bool:
    """Exact unit-cost edit-distance == 1 check (early-exit two-row
    DP; candidates differ by at most one deletion so lengths differ by
    ≤ 1 — still verified defensively)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1 or a == b:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        if min(cur) > 1:
            return False
        prev = cur
    return prev[lb] == 1


def _variant_explode(batch: pa.Table, min_len: int, max_len: int,
                     num_partitions: int) -> pa.Table:
    toks = [t for t in batch["token"].to_pylist()
            if t is not None and min_len <= len(t) <= max_len]
    variants, owners = [], []
    for t in toks:
        for v in deletion_neighborhood(t):
            variants.append(v)
            owners.append(t)
    out = pa.table({
        "variant": pa.array(variants, pa.string()),
        "token": pa.array(owners, pa.string()),
    })
    return out.append_column(
        "_part", pa.array(_part_of(out["variant"], num_partitions),
                          pa.int64()))


def _pairs_partition(part: pa.Table, max_bucket: int) -> pa.Table:
    """Sorted-run walk: per variant run, emit candidate (t1 < t2)
    pairs; a run larger than ``max_bucket`` fails loudly (a hot
    deletion variant means a degenerate vocabulary — cap, don't
    silently drop)."""
    empty = pa.table({"t1": pa.array([], pa.string()),
                      "t2": pa.array([], pa.string())})
    if part.num_rows == 0:
        return empty
    part = part.sort_by([("variant", "ascending"), ("token", "ascending")])
    variants = part["variant"].to_pylist()
    tokens = part["token"].to_pylist()
    t1s, t2s = [], []
    start = 0
    n = len(variants)
    for i in range(1, n + 1):
        if i == n or variants[i] != variants[start]:
            run = tokens[start:i]
            if len(run) > max_bucket:
                raise ValueError(
                    f"deletion variant {variants[start]!r} owned by "
                    f"{len(run)} tokens > max_bucket={max_bucket}; "
                    "raise max_bucket or pre-filter the vocabulary")
            for a in range(start, i):
                for b in range(a + 1, i):
                    if tokens[a] != tokens[b]:
                        t1s.append(tokens[a])
                        t2s.append(tokens[b])
            start = i
    if not t1s:
        return empty
    return pa.table({"t1": pa.array(t1s, pa.string()),
                     "t2": pa.array(t2s, pa.string())})


def spelling_pairs(ds, text_col: str = "text", min_len: int = 3,
                   max_len: int = 20, num_partitions: int = 32,
                   max_bucket: int = 10_000) -> pa.Table:
    """All distinct corpus-token pairs at Levenshtein distance exactly
    1 (``t1 < t2``) — spelling-variant mining.  Returns a small
    ``pa.Table``; the corpus text never shuffles."""
    from docling_ray.stages.textstats import token_count_partial

    vocab = ds.map_batches(
        lambda b: token_count_partial(b, text_col),
        batch_format="pyarrow") \
        .groupby("token").sum("n") \
        .map_batches(lambda b: b.select(["token"]), batch_format="pyarrow")

    candidates = vocab.map_batches(
        lambda b: _variant_explode(b, min_len, max_len, num_partitions),
        batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda p: _pairs_partition(p.drop_columns(["_part"]),
                                       max_bucket),
            batch_format="pyarrow")

    seen = set()
    for b in candidates.iter_batches(batch_format="pyarrow"):
        for a, c in zip(b["t1"].to_pylist(), b["t2"].to_pylist()):
            pair = (a, c) if a < c else (c, a)
            if pair not in seen and levenshtein1(*pair):
                seen.add(pair)
    pairs = sorted(seen)
    return pa.table({
        "t1": pa.array([p[0] for p in pairs], pa.string()),
        "t2": pa.array([p[1] for p in pairs], pa.string()),
    })

"""Link-graph operators: PageRank over an edge Dataset.

The reference converts documents one at a time and has no graph
operators (SURVEY.md §2.6); a crawl-scale pipeline needs them — link
graphs drive crawl prioritization and spam/quality scoring (the
original PageRank use).  This module implements the iterative rank
propagation as Ray Data shuffles, in the same scale shape as the
distributed connected components in stages/dedup.py:

- each superstep is TWO hash-bucketed all-to-alls (Pregel's cost
  model): a SCATTER that co-partitions edges with ranks on
  ``hash(src) % P`` and emits per-edge contributions, and a GATHER
  that co-partitions contributions with the static node-degree table
  on ``hash(node) % P`` and emits the new ranks.  Every exchanged row
  is a couple of int64s — never document payloads, never a broadcast,
  nothing on the driver, so node and edge counts are unbounded;
- the tagged-union + ``groupby(part)`` form is used instead of
  ``Dataset.join`` (Ray 2.49's hash-join finalize rejects the
  empty-partition blocks aggregation outputs can produce — the
  asof_join / substring_dedup precedent, stages/joins.py);
- arithmetic is integer micro-units with floor division, making the
  result ORDER-INDEPENDENT (integer sums commute exactly, float sums
  do not) and therefore reproducible under any partitioning — and
  exactly mirrorable by an iteration-unrolled SQL oracle (the k-means
  precedent, stages/kmeans.py).

Semantics: the classic per-page form ``r'(v) = (1-d) + d * Σ_{u→v}
r(u)/deg(u)`` (Page et al. 1998, non-normalized variant) with
``r0 = 1`` for every node, run a FIXED number of supersteps.  Dangling
nodes (deg 0) contribute nothing — their mass is dropped, identically
on both sides.  In micro-units: ``r0 = 1_000_000``, contribution
``r // deg``, update ``150_000 + (85 * Σ) // 100`` for d = 0.85.
Node ids are int64 (document ids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum


def seeded_doc_edges(ds, id_col: str = "doc_id", n_nodes: int | None = None,
                     fanout: int = 3):
    """Deterministic synthetic edge table over a document Dataset: each
    doc links to ``fanout`` pseudo-random nodes
    ``md5(doc_id || '-' || k) % n_nodes`` (first 4 digest bytes,
    big-endian) — the seeded-derivation pattern the ANN/LSH oracles
    use, so a SQL oracle can rebuild the SAME graph from the same
    table.  ``n_nodes`` defaults to ``ds.count()`` (one streaming count
    aggregate).  Self-loops and parallel edges are kept (both sides
    derive them identically)."""
    import hashlib

    if n_nodes is None:
        n_nodes = ds.count()

    def edges_of(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        src = np.repeat(ids, fanout)
        dst = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{i}-{k}".encode()).digest()[:4], "big")
             % n_nodes
             for i in ids for k in range(fanout)),
            dtype=np.int64, count=len(ids) * fanout)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst)})

    return ds.map_batches(edges_of, batch_format="pyarrow")


_SCATTER_SCHEMA = pa.schema([
    ("key", pa.int64()), ("side", pa.int8()), ("dst", pa.int64()),
    ("deg", pa.int64()), ("rank_u", pa.int64())])
_CONTRIB_SCHEMA = pa.schema([("key", pa.int64()), ("side", pa.int8()),
                             ("c", pa.int64()), ("deg", pa.int64())])
_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("deg", pa.int64()),
                          ("rank_u", pa.int64())])


def _scatter_part(group: pa.Table) -> pa.Table:
    """One src-complete partition of (rank rows ∪ edge rows) → per-edge
    contribution rows ``(dst, rank_u // deg)``.  Vectorized pandas merge
    for the src→(rank, deg) lookup."""
    out_empty = pa.table({"dst": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
    if group.num_rows == 0:
        return out_empty
    side = group["side"].to_numpy(zero_copy_only=False)
    em = side == 0
    rm = ~em
    if not em.any() or not rm.any():
        return out_empty
    edges = pd.DataFrame({
        "key": group["key"].to_numpy(zero_copy_only=False)[em],
        "dst": group["dst"].to_numpy(zero_copy_only=False)[em]})
    ranks = pd.DataFrame({
        "key": group["key"].to_numpy(zero_copy_only=False)[rm],
        "deg": group["deg"].to_numpy(zero_copy_only=False)[rm],
        "rank_u": group["rank_u"].to_numpy(zero_copy_only=False)[rm]})
    j = edges.merge(ranks, on="key", how="inner")
    j = j[j["deg"].to_numpy() > 0]
    if not len(j):
        return out_empty
    return pa.table({
        "dst": pa.array(j["dst"].to_numpy().astype(np.int64)),
        "c": pa.array(j["rank_u"].to_numpy() // j["deg"].to_numpy()),
    })


def _gather_part(group: pa.Table, base: int, dpct: int) -> pa.Table:
    """One node-complete partition of (node-degree rows ∪ contribution
    rows) → new rank rows.  Contribution sums via pandas groupby-sum
    (C path), then the integer update."""
    if group.num_rows == 0:
        return _RANK_SCHEMA.empty_table()
    side = group["side"].to_numpy(zero_copy_only=False)
    nm = side == 1
    if not nm.any():
        return _RANK_SCHEMA.empty_table()
    nodes = group["key"].to_numpy(zero_copy_only=False)[nm]
    degs = group["deg"].to_numpy(zero_copy_only=False)[nm]
    cm = ~nm
    if cm.any():
        df = pd.DataFrame({
            "k": group["key"].to_numpy(zero_copy_only=False)[cm],
            "c": group["c"].to_numpy(zero_copy_only=False)[cm]})
        sums = df.groupby("k", sort=False)["c"].sum()
        s = sums.reindex(nodes).fillna(0).to_numpy().astype(np.int64)
    else:
        s = np.zeros(len(nodes), np.int64)
    rank = base + (dpct * s) // 100
    return pa.table({"node": pa.array(nodes.astype(np.int64)),
                     "deg": pa.array(degs.astype(np.int64)),
                     "rank_u": pa.array(rank.astype(np.int64))})


def pagerank(edges, num_iters: int = 3, damping_pct: int = 85,
             src_col: str = "src", dst_col: str = "dst",
             num_partitions: int = 32):
    """Integer-exact PageRank over an ``(src, dst)`` edge Dataset.
    Returns ``(node, rank_u)`` — rank in micro-units after
    ``num_iters`` supersteps (see module docstring for the exact
    recurrence).  ``damping_pct`` is the damping factor in percent
    (integer, so the update stays exact).

    The per-superstep rank table is materialized (it is (int64 ×3)
    rows, one per NODE — a decision table, never the corpus payload);
    without the pin Ray would re-execute the whole lineage from the
    edge scan once per superstep consumer."""
    import ray.data

    from docling_ray.stages.dedup import _part_of

    base = int(round((100 - damping_pct) / 100 * 1_000_000))
    dpct = int(damping_pct)

    # degree of every node (dst-only nodes get 0): tag src sightings 1,
    # dst sightings 0, ONE native Sum — no join needed
    def _deg_rows(b: pa.Table) -> pa.Table:
        s = b[src_col].combine_chunks()
        d = b[dst_col].combine_chunks()
        n = len(s)
        return pa.table({
            "node": pa.concat_arrays([s.cast(pa.int64()),
                                      d.cast(pa.int64())]),
            "one": pa.array(np.r_[np.ones(n, np.int64),
                                  np.zeros(n, np.int64)]),
        })

    node_deg = edges.map_batches(_deg_rows, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum(on="one", alias_name="deg")) \
        .materialize()

    ranks = node_deg.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "deg": pc.fill_null(b["deg"], 0),
            "rank_u": pa.array(np.full(b.num_rows, 1_000_000, np.int64))}),
        batch_format="pyarrow")

    def _tag_edges(b: pa.Table) -> pa.Table:
        out = pa.table({
            "key": b[src_col].combine_chunks().cast(pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, np.int8)),
            "dst": b[dst_col].combine_chunks().cast(pa.int64()),
            "deg": pa.nulls(b.num_rows, pa.int64()),
            "rank_u": pa.nulls(b.num_rows, pa.int64())}).cast(
                _SCATTER_SCHEMA)
        return out.append_column(
            "part", pa.array(_part_of(out["key"], num_partitions)))

    def _tag_ranks(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return _SCATTER_SCHEMA.append(
                pa.field("part", pa.int64())).empty_table()
        out = pa.table({
            "key": b["node"].combine_chunks().cast(pa.int64()),
            "side": pa.array(np.ones(b.num_rows, np.int8)),
            "dst": pa.nulls(b.num_rows, pa.int64()),
            "deg": b["deg"],
            "rank_u": b["rank_u"]}).cast(_SCATTER_SCHEMA)
        return out.append_column(
            "part", pa.array(_part_of(out["key"], num_partitions)))

    def _tag_contrib(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return _CONTRIB_SCHEMA.append(
                pa.field("part", pa.int64())).empty_table()
        out = pa.table({
            "key": b["dst"],
            "side": pa.array(np.zeros(b.num_rows, np.int8)),
            "c": b["c"],
            "deg": pa.nulls(b.num_rows, pa.int64())}).cast(_CONTRIB_SCHEMA)
        return out.append_column(
            "part", pa.array(_part_of(out["key"], num_partitions)))

    def _tag_node_deg(b: pa.Table) -> pa.Table:
        out = pa.table({
            "key": b["node"].combine_chunks().cast(pa.int64()),
            "side": pa.array(np.ones(b.num_rows, np.int8)),
            "c": pa.nulls(b.num_rows, pa.int64()),
            "deg": pc.fill_null(b["deg"], 0)}).cast(_CONTRIB_SCHEMA)
        return out.append_column(
            "part", pa.array(_part_of(out["key"], num_partitions)))

    for _ in range(num_iters):
        scatter = edges.map_batches(_tag_edges, batch_format="pyarrow") \
            .union(ranks.map_batches(_tag_ranks, batch_format="pyarrow")) \
            .groupby("part").map_groups(_scatter_part,
                                        batch_format="pyarrow")
        ranks = scatter.map_batches(_tag_contrib, batch_format="pyarrow") \
            .union(node_deg.map_batches(_tag_node_deg,
                                        batch_format="pyarrow")) \
            .groupby("part").map_groups(
                lambda g: _gather_part(g, base, dpct),
                batch_format="pyarrow") \
            .materialize()

    import ray.data as rd

    empty = rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                    "rank_u": pa.array([], pa.int64())}))
    return empty.union(ranks.map_batches(
        lambda b: (b.drop_columns(["deg"])
                   if b.num_columns else pa.table(
                       {"node": pa.array([], pa.int64()),
                        "rank_u": pa.array([], pa.int64())})),
        batch_format="pyarrow"))

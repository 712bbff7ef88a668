"""Link-graph operators: PageRank over an edge Dataset.

The reference converts documents one at a time and has no graph
operators (SURVEY.md §2.6); a crawl-scale pipeline needs them — link
graphs drive crawl prioritization and spam/quality scoring (the
original PageRank use).  This module implements the iterative rank
propagation as Ray Data shuffles, in the same scale shape as the
distributed connected components in stages/dedup.py:

- each superstep is ONE hash-bucketed all-to-all: edge rows (keyed by
  src), node-degree rows (keyed by node) and the previous step's
  contribution rows (keyed by dst) all travel under the SAME node-id
  key, so a partition folds its incoming mass and emits the next
  step's contributions in a single vectorized pass (Pregel with the
  gather and scatter fused).  Every exchanged row is a couple of
  int64s — never document payloads, never a broadcast, nothing on the
  driver, so node and edge counts are unbounded;
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


# One canonical row schema carries all three message kinds through the
# per-superstep shuffle: side 0 = edge (key=src, dst), side 1 = node
# (key=node, deg), side 2 = contribution (key=dst node, c).
_MSG_SCHEMA = pa.schema([
    ("key", pa.int64()), ("side", pa.int8()), ("dst", pa.int64()),
    ("deg", pa.int64()), ("c", pa.int64()), ("part", pa.int64())])
_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank_u", pa.int64())])


def _superstep(group: pa.Table, first: bool, final: bool, base: int,
               dpct: int, num_partitions: int) -> pa.Table:
    """One node-complete partition, one superstep: fold incoming
    contributions into new ranks (``r0 = 1e6`` on the first step), then
    either emit the final rank rows or the NEXT step's messages —
    edge/node rows pass through unchanged (their key, hence partition,
    is stable) and fresh contribution rows go out keyed by dst."""
    from docling_ray.stages.dedup import _part_of

    if group.num_rows == 0:
        return (_RANK_SCHEMA if final else _MSG_SCHEMA).empty_table()
    side = group["side"].to_numpy(zero_copy_only=False)
    nm = side == 1
    if not nm.any():
        return (_RANK_SCHEMA if final else _MSG_SCHEMA).empty_table()
    # CRITICAL: filter rows FIRST, extract columns SECOND.  The mixed
    # message table carries nulls in every payload column (an edge row's
    # deg, a node row's dst, ...), and to_numpy on an int64 column WITH
    # nulls comes back float64 — which silently corrupts 64-bit node
    # ids beyond 2^53 (md5-hash ids always are).  Filtering to the rows
    # of one side drops the nulls, so the columns materialize int64.
    nodes_t = group.filter(pa.array(nm))
    nodes = nodes_t["key"].to_numpy(zero_copy_only=False)
    degs = nodes_t["deg"].to_numpy(zero_copy_only=False)
    if first:
        rank = np.full(len(nodes), 1_000_000, np.int64)
    else:
        cm = side == 2
        s = np.zeros(len(nodes), np.int64)
        if cm.any():
            c_t = group.filter(pa.array(cm))
            df = pd.DataFrame({
                "k": c_t["key"].to_numpy(zero_copy_only=False),
                "c": c_t["c"].to_numpy(zero_copy_only=False)})
            sums = df.groupby("k", sort=False)["c"].sum()
            # get_indexer + masked assign, NOT reindex().fillna(): a
            # reindex with any miss converts the sums to float64, which
            # rounds accumulated mass above 2^53 — the same precision
            # trap as the node-id extraction above
            idx = sums.index.get_indexer(nodes)
            hit = idx >= 0
            s[hit] = sums.to_numpy()[idx[hit]]
        rank = base + (dpct * s) // 100
    if final:
        return pa.table({"node": pa.array(nodes.astype(np.int64)),
                         "rank_u": pa.array(rank)}).cast(_RANK_SCHEMA)
    # outgoing contributions: local edges looked up against local ranks
    em = side == 0
    parts = []
    if em.any():
        e_t = group.filter(pa.array(em))
        edges = pd.DataFrame({
            "key": e_t["key"].to_numpy(zero_copy_only=False),
            "dst": e_t["dst"].to_numpy(zero_copy_only=False)})
        ranks = pd.DataFrame({"key": nodes, "deg": degs, "rank_u": rank})
        j = edges.merge(ranks, on="key", how="inner")
        j = j[j["deg"].to_numpy() > 0]
        if len(j):
            dst = pa.array(j["dst"].to_numpy().astype(np.int64))
            n = len(j)
            parts.append(pa.table({
                "key": dst,
                "side": pa.array(np.full(n, 2, np.int8)),
                "dst": pa.nulls(n, pa.int64()),
                "deg": pa.nulls(n, pa.int64()),
                "c": pa.array(j["rank_u"].to_numpy()
                              // j["deg"].to_numpy()),
                "part": pa.array(_part_of(dst, num_partitions)),
            }).cast(_MSG_SCHEMA))
    passthru = group.filter(pa.array(side != 2)).select(
        _MSG_SCHEMA.names).cast(_MSG_SCHEMA)
    parts.append(passthru)
    return pa.concat_tables(parts)


class _PageRankShard:
    """One hash partition of the graph, pinned in an actor for the whole
    PageRank run (the `state/dedup_index.py` shard pattern): edges and
    node degrees load ONCE, every superstep exchanges only contribution
    rows — O(V + E_msgs) small ints over the wire instead of re-shipping
    the edge set each step (the Dataset-native `pagerank` trade this
    backend removes).  All arithmetic is the same integer micro-unit
    recurrence, so results are bit-identical to the exchange backend."""

    def __init__(self, part_id: int, num_partitions: int, base: int,
                 dpct: int):
        self.part_id = part_id
        self.P = num_partitions
        self.base = base
        self.dpct = dpct
        self._edge_tbls: list = []
        self._node_tbls: list = []

    def load_edges(self, tbl) -> int:
        self._edge_tbls.append(tbl)
        return tbl.num_rows

    def load_nodes(self, tbl) -> int:
        self._node_tbls.append(tbl)
        return tbl.num_rows

    def finalize(self) -> int:
        """Index the shard: sorted node array (searchsorted lookups),
        per-edge src index, edges pre-sorted by destination partition so
        every scatter is pure slicing + integer arithmetic."""
        from docling_ray.stages.dedup import _part_of

        if self._node_tbls:
            nt = pa.concat_tables(self._node_tbls)
            nodes = nt["node"].to_numpy(zero_copy_only=False)
            deg = nt["deg"].to_numpy(zero_copy_only=False)
        else:
            nodes = np.empty(0, np.int64)
            deg = np.empty(0, np.int64)
        order = np.argsort(nodes, kind="stable")
        self.nodes = nodes[order].astype(np.int64)
        self.deg = deg[order].astype(np.int64)
        self.rank = np.full(len(self.nodes), 1_000_000, np.int64)
        if self._edge_tbls:
            et = pa.concat_tables(self._edge_tbls)
            src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
        dpart = _part_of(pa.array(dst, pa.int64()), self.P)
        eorder = np.argsort(dpart, kind="stable")
        self.esrc_idx = np.searchsorted(self.nodes, src[eorder])
        self.edst = dst[eorder]
        bounds = np.searchsorted(dpart[eorder], np.arange(self.P + 1))
        self.seg = [(int(bounds[p]), int(bounds[p + 1]))
                    for p in range(self.P)]
        self._edge_tbls = self._node_tbls = None
        return len(self.nodes)

    def scatter(self):
        """Contribution rows for every target partition, from LOCAL
        edges and LOCAL ranks — nothing but (dst, c) leaves the shard."""
        c = self.rank[self.esrc_idx] // self.deg[self.esrc_idx]
        out = []
        for lo, hi in self.seg:
            out.append(pa.table({
                "dst": pa.array(self.edst[lo:hi], pa.int64()),
                "c": pa.array(c[lo:hi], pa.int64())}))
        return out if self.P > 1 else out[0]

    def gather(self, *tables) -> int:
        """Fold incoming contribution tables into the next rank vector
        (``rank = base + dpct * s // 100``, exact integer arithmetic)."""
        s = np.zeros(len(self.nodes), np.int64)
        for t in tables:
            if t.num_rows == 0:
                continue
            idx = np.searchsorted(
                self.nodes, t["dst"].to_numpy(zero_copy_only=False))
            np.add.at(s, idx, t["c"].to_numpy(zero_copy_only=False))
        self.rank = self.base + (self.dpct * s) // 100
        return len(self.nodes)

    def ranks(self):
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "rank_u": pa.array(self.rank, pa.int64())})


def pagerank_persisted(edges, num_iters: int = 3, damping_pct: int = 85,
                       src_col: str = "src", dst_col: str = "dst",
                       num_partitions: int = 16):
    """PageRank with PERSISTED edge partitions: one decision shuffle
    co-locates edges/degrees onto ``num_partitions`` shard actors, then
    each superstep moves ONLY contribution rows (O(V + E_msgs)), never
    the edge set — the scale path when iterations × edges dominate (the
    trade `pagerank`'s docstring names).  The contribution exchange is
    pure object-store ref passing (scatter returns per-target tables,
    gathers consume them directly); the driver never holds graph data.
    Bit-identical to `pagerank` (same integer recurrence, pytest-proven
    on random graphs, dangling nodes and >2^53 md5 node ids)."""
    import ray
    import ray.data

    from docling_ray.stages.dedup import _part_of

    P = int(num_partitions)
    base = int(round((100 - damping_pct) / 100 * 1_000_000))
    dpct = int(damping_pct)
    Shard = ray.remote(_PageRankShard)
    shards = [Shard.remote(p, P, base, dpct) for p in range(P)]

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
        .groupby("node").aggregate(Sum(on="one", alias_name="deg"))

    def _push(kind: str):
        def push(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return pa.table({"n": pa.array([], pa.int64())})
            p = int(group["_part"][0].as_py())
            tbl = group.drop_columns(["_part"])
            ref = (shards[p].load_edges.remote(tbl) if kind == "edges"
                   else shards[p].load_nodes.remote(tbl))
            return pa.table({"n": pa.array([ray.get(ref)], pa.int64())})
        return push

    def _tag_edges(b: pa.Table) -> pa.Table:
        src = b[src_col].combine_chunks().cast(pa.int64())
        return pa.table({
            "src": src,
            "dst": b[dst_col].combine_chunks().cast(pa.int64()),
            "_part": pa.array(_part_of(src, P))})

    def _tag_nodes(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return pa.schema([("node", pa.int64()), ("deg", pa.int64()),
                              ("_part", pa.int64())]).empty_table()
        key = b["node"].combine_chunks().cast(pa.int64())
        return pa.table({
            "node": key,
            "deg": pc.fill_null(b["deg"], 0).combine_chunks()
                .cast(pa.int64()),
            "_part": pa.array(_part_of(key, P))})

    # one-time decision shuffles; .count() drives the pushes to finish
    edges.map_batches(_tag_edges, batch_format="pyarrow") \
        .groupby("_part").map_groups(_push("edges"),
                                     batch_format="pyarrow").count()
    node_deg.map_batches(_tag_nodes, batch_format="pyarrow") \
        .groupby("_part").map_groups(_push("nodes"),
                                     batch_format="pyarrow").count()
    ray.get([s.finalize.remote() for s in shards])

    for _ in range(num_iters):
        if P > 1:
            outs = [s.scatter.options(num_returns=P).remote()
                    for s in shards]
            gathers = [shards[j].gather.remote(
                *[outs[i][j] for i in range(P)]) for j in range(P)]
        else:
            outs = [s.scatter.remote() for s in shards]
            gathers = [shards[0].gather.remote(*outs)]
        ray.get(gathers)

    rank_refs = [s.ranks.remote() for s in shards]
    ray.wait(rank_refs, num_returns=len(rank_refs))
    ds = ray.data.from_arrow_refs(rank_refs)
    for s in shards:
        ray.kill(s)
    return ds


def pagerank(edges, num_iters: int = 3, damping_pct: int = 85,
             src_col: str = "src", dst_col: str = "dst",
             num_partitions: int = 32):
    """Integer-exact PageRank over an ``(src, dst)`` edge Dataset.
    Returns ``(node, rank_u)`` — rank in micro-units after
    ``num_iters`` supersteps (see module docstring for the exact
    recurrence).  ``damping_pct`` is the damping factor in percent
    (integer, so the update stays exact).

    ONE all-to-all per superstep: edge rows, node-degree rows and the
    previous step's contribution rows all travel keyed by the same
    node id, so each partition folds its incoming mass AND emits the
    next step's contributions in a single vectorized pass.  Edges are
    re-exchanged every superstep — the Dataset-native Pregel trade;
    each superstep's exchange is O(V + 2E) rows of a few int64s.  When
    iterations × edges dominate, use `pagerank_persisted`: edges pin in
    shard actors once and each superstep moves only O(V + E_msgs)
    contribution rows (bit-identical results)."""
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
        .groupby("node").aggregate(Sum(on="one", alias_name="deg"))

    def _tag_edges(b: pa.Table) -> pa.Table:
        key = b[src_col].combine_chunks().cast(pa.int64())
        out = pa.table({
            "key": key,
            "side": pa.array(np.zeros(b.num_rows, np.int8)),
            "dst": b[dst_col].combine_chunks().cast(pa.int64()),
            "deg": pa.nulls(b.num_rows, pa.int64()),
            "c": pa.nulls(b.num_rows, pa.int64()),
            "part": pa.array(_part_of(key, num_partitions))})
        return out.cast(_MSG_SCHEMA)

    def _tag_nodes(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return _MSG_SCHEMA.empty_table()
        key = b["node"].combine_chunks().cast(pa.int64())
        out = pa.table({
            "key": key,
            "side": pa.array(np.ones(b.num_rows, np.int8)),
            "dst": pa.nulls(b.num_rows, pa.int64()),
            "deg": pc.fill_null(b["deg"], 0),
            "c": pa.nulls(b.num_rows, pa.int64()),
            "part": pa.array(_part_of(key, num_partitions))})
        return out.cast(_MSG_SCHEMA)

    cur = edges.map_batches(_tag_edges, batch_format="pyarrow").union(
        node_deg.map_batches(_tag_nodes, batch_format="pyarrow"))
    # num_iters UPDATES need num_iters + 1 passes: step 0 scatters the
    # r0 = 1e6 contributions, steps 1..num_iters-1 fold and re-scatter,
    # the final pass only folds and emits the rank rows
    for i in range(num_iters + 1):
        first, final = i == 0, i == num_iters
        cur = cur.groupby("part").map_groups(
            lambda g, _f=first, _l=final: _superstep(
                g, _f, _l, base, dpct, num_partitions),
            batch_format="pyarrow")

    empty = ray.data.from_arrow(_RANK_SCHEMA.empty_table())
    return empty.union(cur)


def extract_outlinks(ds, html_col: str = "html", url_col: str = "url"):
    """Explode a web-pages Dataset into its outlink rows ``(url,
    link_idx, href, anchor_text)`` — the edge-extraction half of crawl
    graph construction (kernels/outlinks.py; per-document DOM parse is
    the same cost class as the content extraction itself).  Stateless
    map, streams at any scale; feed the result to ``pagerank`` after
    resolving hrefs to node ids."""
    from docling_ray.kernels.outlinks import outlinks_of

    def explode(batch: pa.Table) -> pa.Table:
        urls, idxs, hrefs, texts = [], [], [], []
        raw = batch[html_col].to_pylist()
        us = batch[url_col].to_pylist()
        for u, h in zip(us, raw):
            if h is None:
                continue
            for j, (href, text) in enumerate(outlinks_of(h)):
                urls.append(u)
                idxs.append(j)
                hrefs.append(href)
                texts.append(text)
        return pa.table({
            url_col: pa.array(urls, pa.string()),
            "link_idx": pa.array(idxs, pa.int64()),
            "href": pa.array(hrefs, pa.string()),
            "anchor_text": pa.array(texts, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _resolve_href(url: str, href: str):
    """THE href-resolution policy, shared by `resolve_link_edges` and
    `anchor_text_index` so the two halves of the crawl graph can never
    diverge: absolute http(s) passes through, root-relative ("/...")
    resolves against the source origin (scheme://host), everything else
    (fragments, mailto, protocol-relative, path-relative) returns
    None."""
    if not url or not href:
        return None
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("/") and not href.startswith("//"):
        return "/".join(url.split("/", 3)[:3]) + href
    return None


def _node_id_of(url: str) -> int:
    """Stable int64 node id of a url: first 8 bytes of md5, big-endian,
    two's-complement into int64 (the generator-side golden uses the
    same formula)."""
    import hashlib

    v = int.from_bytes(hashlib.md5(url.encode("utf-8")).digest()[:8],
                       "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def _resolve_href_column(url_arr, href_arr):
    """Vectorized `_resolve_href` over whole columns — every rule an
    Arrow C kernel, no per-row Python.  Returns ``(valid, target)``
    boolean/string arrays aligned to the input; ``target`` is only
    meaningful where ``valid``.  Byte-identical to the scalar policy
    (`test_graph.py` proves both agree case by case)."""
    import hashlib  # noqa: F401  (kept for symmetry with _node_id_of)

    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    if isinstance(href_arr, pa.ChunkedArray):
        href_arr = href_arr.combine_chunks()
    u = pc.fill_null(url_arr, "")
    h = pc.fill_null(href_arr, "")
    nonempty = pc.and_(pc.greater(pc.utf8_length(u), 0),
                       pc.greater(pc.utf8_length(h), 0))
    abs_m = pc.or_(pc.starts_with(h, "http://"),
                   pc.starts_with(h, "https://"))
    root_m = pc.and_(pc.starts_with(h, "/"),
                     pc.invert(pc.starts_with(h, "//")))
    # "/".join(url.split("/", 3)[:3]) as C kernels
    origin = pc.binary_join(
        pc.list_slice(pc.split_pattern(u, "/", max_splits=3), 0, 3), "/")
    target = pc.if_else(
        abs_m, h, pc.binary_join_element_wise(origin, h, ""))
    valid = pc.and_(nonempty, pc.or_(abs_m, root_m))
    return valid, target


def _node_ids_column(urls: "np.ndarray") -> "np.ndarray":
    """`_node_id_of` over a string ndarray: md5 runs once per DISTINCT
    url (repeated targets hash once — the `_line_rows` shape), the
    two's-complement fold is a zero-copy uint64→int64 view."""
    import hashlib

    if not len(urls):
        return np.empty(0, np.int64)
    uniq, inv = np.unique(urls, return_inverse=True)
    ids = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                        "big") for s in uniq),
        dtype=np.uint64, count=len(uniq))
    return ids[inv].view(np.int64)


def resolve_link_edges(links, url_col: str = "url",
                       href_col: str = "href"):
    """Outlink rows → int64 graph edges ``(src, dst)``: root-relative
    hrefs ("/...") resolve against the source url's origin
    (scheme://host), absolute http(s) hrefs pass through, anything else
    (fragments, mailto, protocol-relative) is dropped.  Node ids are
    md5-prefix int64s of the resolved url (`_node_id_of`) — url strings
    never enter the PageRank shuffles."""

    def to_edges(batch: pa.Table) -> pa.Table:
        valid, target = _resolve_href_column(batch[url_col],
                                             batch[href_col])
        u = pc.fill_null(batch[url_col].combine_chunks(), "") \
            .filter(valid)
        t = target.filter(valid)
        return pa.table({
            "src": pa.array(_node_ids_column(
                u.to_numpy(zero_copy_only=False)), pa.int64()),
            "dst": pa.array(_node_ids_column(
                t.to_numpy(zero_copy_only=False)), pa.int64())})

    return links.map_batches(to_edges, batch_format="pyarrow")


def anchor_text_index(links, url_col: str = "url", href_col: str = "href",
                      text_col: str = "anchor_text",
                      num_partitions: int = 64):
    """Anchor-text index over outlink rows: per resolved TARGET url,
    how many anchors point at it and the md5 of the canonical
    ``"src>text"`` list sorted by (src, text) — the aggregated external
    description of a page that search ranking uses (anchor text often
    describes a target better than its own content).  Root-relative
    hrefs resolve against the source origin, absolute http(s) pass
    through, everything else drops (the `resolve_link_edges` rules).

    Shape: ONE ``hash(target) % P`` shuffle of (target, src, text)
    rows; each target-complete partition packs vectorized (sort + run
    boundaries + ListArray + binary_join) — Python runs P times, never
    per target."""
    import hashlib

    from docling_ray.stages.dedup import _part_of

    def resolve(batch: pa.Table) -> pa.Table:
        valid, target = _resolve_href_column(batch[url_col],
                                             batch[href_col])
        tgt = target.filter(valid)
        src = pc.fill_null(batch[url_col].combine_chunks(), "") \
            .filter(valid)
        txt = pc.fill_null(batch[text_col].combine_chunks(), "") \
            .filter(valid)
        return pa.table({
            "target": tgt,
            "src": src,
            "atext": txt,
            "part": pa.array(_part_of(tgt, num_partitions)
                             if len(tgt) else
                             np.empty(0, np.int64)),
        })

    def pack(group: pa.Table) -> pa.Table:
        empty = pa.table({"target": pa.array([], pa.string()),
                          "n_anchors": pa.array([], pa.int64()),
                          "anchors_md5": pa.array([], pa.string())})
        if group.num_rows == 0:
            return empty
        order = pc.sort_indices(group, sort_keys=[
            ("target", "ascending"), ("src", "ascending"),
            ("atext", "ascending")])
        g = group.take(order)
        tgts = g["target"].to_numpy(zero_copy_only=False)
        n = len(tgts)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = tgts[1:] != tgts[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        entry = pc.binary_join_element_wise(g["src"].combine_chunks(),
                                            g["atext"].combine_chunks(),
                                            ">")
        if n >= 2 ** 31:  # int32 ListArray offsets would wrap silently
            raise ValueError(
                f"anchor partition has {n} rows >= 2^31; a hot target key "
                "needs salting or a LargeListArray path before this is "
                "safe")
        offsets = np.append(starts, n).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      entry.combine_chunks()
                                      if isinstance(entry,
                                                    pa.ChunkedArray)
                                      else entry)
        joined = pc.binary_join(la, ",").to_pylist()
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in joined]
        return pa.table({
            "target": g["target"].take(pa.array(starts, pa.int64())),
            "n_anchors": pa.array(counts),
            "anchors_md5": pa.array(md5s, pa.string()),
        })

    import ray.data

    out = links.map_batches(resolve, batch_format="pyarrow") \
        .groupby("part").map_groups(pack, batch_format="pyarrow")
    empty = ray.data.from_arrow(pa.table({
        "target": pa.array([], pa.string()),
        "n_anchors": pa.array([], pa.int64()),
        "anchors_md5": pa.array([], pa.string())}))
    return empty.union(out)


def triangles(edges, num_partitions: int = 32):
    """Distributed triangle enumeration over an undirected edge list —
    the node-ordered two-join scheme (each triangle found exactly once):
    ``edges`` must hold normalized rows ``(a, b)`` with ``a < b``;
    wedges come from joining edges on the middle node (``t1.b = t2.a``
    gives paths ``a < b < c``) and each wedge survives iff the closing
    edge ``(a, c)`` exists (a multi-key SEMI join — no payload
    replication).  Two hash-shuffle joins total; no all-pairs step.
    Returns a Dataset of ``(a, b, c)`` triangle rows, ``a < b < c``."""
    from docling_ray.stages.joins import shuffle_join

    def rename(ds, mapping):
        return ds.map_batches(
            lambda t: t.rename_columns([mapping.get(c, c)
                                        for c in t.column_names]),
            batch_format="pyarrow")

    mid = rename(edges, {"a": "b2", "b": "c"})
    # Ray's hash join merges the key pair: the right key column (b2)
    # does not appear in the output
    wedges = shuffle_join(edges, mid, on="b", right_on="b2",
                          how="inner", num_partitions=num_partitions)
    closing = rename(edges, {"a": "a3", "b": "c3"})
    return shuffle_join(wedges, closing, on=("a", "c"),
                        right_on=("a3", "c3"), how="left_semi",
                        num_partitions=num_partitions)

"""URL canonicalization — the webtext url-dedup key.

Canonical form (fixed rule ORDER, every step an RE2 kernel so the DuckDB
mirror is byte-identical by construction — the pii_redact pattern):

1. split ``scheme://host rest`` with one ``extract_regex`` (the fragment
   is never captured: ``rest`` stops at ``#``);
2. lowercase scheme and host;
3. strip the scheme's OWN default port from the host — ``:80`` only for
   ``http``, ``:443`` only for ``https`` (``https://h:80`` is a
   non-default port and is kept);
4. strip ``utm_*`` tracking params in three fixed passes
   (``&utm_…``, ``?utm_…&`` → ``?``, ``?utm_…$``) — RE2 has no
   lookahead, and three leftmost-nonoverlapping passes resolve every
   arrangement identically in Arrow and DuckDB;
5. collapse trailing ``/`` from the PATH component only (the part of
   ``rest`` before the first ``?``) — a query string ending in ``/`` is
   data, not a path separator.

Rows that don't match ``scheme://`` pass through unchanged (relative or
garbage inputs are not guessed at).  Everything is a C kernel over the
whole column; no per-row Python.

``canonical_url_batch`` appends ``canon_url``; url-level dedup is then
pure composition — ``exact_dedup_*`` keyed on ``canon_url`` (see the
``url_dedup`` driver query).
"""

from __future__ import annotations

import pyarrow as pa

_URL_SPLIT_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)"
                 r"://(?P<host>[^/?#]*)(?P<rest>[^#]*)")


def canonical_url_batch(batch: pa.Table,
                        column: str = "url") -> pa.Table:
    import pyarrow.compute as pc

    col = pc.fill_null(batch[column].combine_chunks(), "")
    parts = pc.extract_regex(col, _URL_SPLIT_RE)
    ok = parts.is_valid()
    # null struct (no match) → neutral components; recombined rows are
    # only used where ok is true
    scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "scheme"),
                                        ""))
    host = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "host"), ""))
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, r":80$", ""),
        pc.if_else(pc.equal(scheme, "https"),
                   pc.replace_substring_regex(host, r":443$", ""),
                   host))
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
    rest = pc.replace_substring_regex(rest, r"&utm_[^&]*", "")
    rest = pc.replace_substring_regex(rest, r"\?utm_[^&]*&", "?")
    rest = pc.replace_substring_regex(rest, r"\?utm_[^&]*$", "")
    # trailing-slash collapse applies to the path only: split rest at the
    # first '?' (RE2 [^?]* is leftmost-greedy, identical in DuckDB)
    rparts = pc.extract_regex(rest, r"(?s)^(?P<path>[^?]*)(?P<query>.*)$")
    path = pc.fill_null(pc.struct_field(rparts, "path"), "")
    query = pc.fill_null(pc.struct_field(rparts, "query"), "")
    path = pc.replace_substring_regex(path, r"/+$", "")
    canon = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, path, query, pa.scalar(""))
    canon = pc.if_else(ok, canon, col)
    return batch.append_column("canon_url", canon)


# -- robots-style URL filtering ----------------------------------------------


def robots_filter_batch(batch: pa.Table, rules: list,
                        url_col: str = "canon_url") -> pa.Table:
    """Append ``allowed: bool`` under robots.txt longest-prefix-match
    semantics over URL-PREFIX rules ``(prefix, allow: bool)``: the rule
    with the LONGEST matching prefix decides (ties break to the first
    rule in the given order); no match ⇒ allowed.  Vectorized: one C
    ``starts_with`` pass per rule (rule sets are tiny), no per-row
    Python.  The SQL mirror is a CASE over the same rules sorted by
    prefix length descending — first match IS the longest match on both
    sides."""
    import numpy as np
    import pyarrow.compute as pc

    col = pc.fill_null(batch[url_col].combine_chunks(), "")
    n = len(col)
    allowed = np.ones(n, dtype=bool)
    # stable sort by length descending preserves given order on ties,
    # then FIRST match per row wins = longest match, tie → rule order
    order = sorted(range(len(rules)), key=lambda i: -len(rules[i][0]))
    decided = np.zeros(n, dtype=bool)
    for i in order:
        prefix, allow = rules[i]
        m = pc.starts_with(col, prefix).to_numpy(zero_copy_only=False)
        take = m & ~decided
        allowed[take] = allow
        decided |= take
    return batch.append_column("allowed", pa.array(allowed))


def robots_filter(ds, rules: list, url_col: str = "canon_url",
                  keep_only: bool = False):
    """Dataset form of `robots_filter_batch`; with ``keep_only`` the
    disallowed rows are dropped instead of flagged."""
    out = ds.map_batches(
        lambda b: robots_filter_batch(b, rules, url_col),
        batch_format="pyarrow")
    if keep_only:
        import pyarrow.compute as pc

        return out.map_batches(
            lambda b: b.filter(pc.equal(b["allowed"], True))
                       .drop_columns(["allowed"]),
            batch_format="pyarrow")
    return out


# -- per-domain politeness scheduling ----------------------------------------


def fetch_schedule(ds, domain_col: str = "source",
                   order_col: str = "doc_id", delay_ms: int = 200,
                   num_partitions: int = 64):
    """Crawl politeness scheduler: per domain, fetches are serialized
    ``delay_ms`` apart — returns the input keys plus ``slot`` (0-based
    rank within the domain, ordered by ``order_col``) and ``start_ms =
    slot * delay_ms``.  The sessionize shape: ONE ``hash(domain) % P``
    shuffle, vectorized sort + run-rank per partition, Python runs P
    times.  Rows with a null domain or order are dropped (the
    sessionize null contract)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    from docling_ray.stages.dedup import _part_of

    def prep(batch: pa.Table) -> pa.Table:
        out = pa.table({domain_col: batch[domain_col],
                        order_col: batch[order_col]})
        valid = pc.and_(pc.is_valid(out[domain_col]),
                        pc.is_valid(out[order_col]))
        out = out.filter(valid)
        return out.append_column(
            "_part", pa.array(_part_of(out[domain_col], num_partitions),
                              pa.int64()))

    def rank_part(part: pa.Table) -> pa.Table:
        dom_type = part.schema.field(domain_col).type
        ord_type = part.schema.field(order_col).type
        empty = pa.table({domain_col: pa.array([], dom_type),
                          order_col: pa.array([], ord_type),
                          "slot": pa.array([], pa.int64()),
                          "start_ms": pa.array([], pa.int64())})
        n = part.num_rows
        if n == 0:
            return empty
        order = pc.sort_indices(part, sort_keys=[
            (domain_col, "ascending"), (order_col, "ascending")])
        g = part.take(order)
        doms = g[domain_col].to_numpy(zero_copy_only=False)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = doms[1:] != doms[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, n))
        slot = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        return pa.table({
            domain_col: g[domain_col],
            order_col: g[order_col],
            "slot": pa.array(slot),
            "start_ms": pa.array(slot * int(delay_ms)),
        })

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda p: rank_part(p.drop_columns(["_part"])),
            batch_format="pyarrow")
    empty = ray.data.from_arrow(pa.table({
        domain_col: pa.array([], types[domain_col]),
        order_col: pa.array([], types[order_col]),
        "slot": pa.array([], pa.int64()),
        "start_ms": pa.array([], pa.int64())}))
    return empty.union(out)

"""URL canonicalization — the webtext url-dedup key.

Canonical form (fixed rule ORDER, every step an RE2 kernel so the DuckDB
mirror is byte-identical by construction — the pii_redact pattern):

1. split ``scheme://host rest`` with one ``extract_regex`` (the fragment
   is never captured: ``rest`` stops at ``#``);
2. lowercase scheme and host;
3. strip default ports ``:80`` / ``:443`` from the host;
4. strip ``utm_*`` tracking params in three fixed passes
   (``&utm_…``, ``?utm_…&`` → ``?``, ``?utm_…$``) — RE2 has no
   lookahead, and three leftmost-nonoverlapping passes resolve every
   arrangement identically in Arrow and DuckDB;
5. collapse trailing ``/``.

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
    host = pc.replace_substring_regex(host, r":(80|443)$", "")
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
    rest = pc.replace_substring_regex(rest, r"&utm_[^&]*", "")
    rest = pc.replace_substring_regex(rest, r"\?utm_[^&]*&", "?")
    rest = pc.replace_substring_regex(rest, r"\?utm_[^&]*$", "")
    rest = pc.replace_substring_regex(rest, r"/+$", "")
    canon = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, rest, pa.scalar(""))
    canon = pc.if_else(ok, canon, col)
    return batch.append_column("canon_url", canon)

"""PII scan / redaction — the privacy-scrub step of published web-corpus
pipelines (emails, phone numbers, IP addresses masked before training).

Everything runs as Arrow C RE2 kernels inside one stateless
``map_batches`` pass — zero shuffles, zero Python per row.  RE2 is the
same engine DuckDB's ``regexp_replace`` / ``regexp_extract_all`` use, so
a SQL mirror applying the SAME patterns in the SAME order produces
byte-identical redacted text by construction (``\\d``/``\\b`` are ASCII
in both).

Redaction order is load-bearing and fixed: email → phone → ipv4
(patterns can overlap — an email's domain contains dots an IPv4 pattern
could otherwise claim; applying in one documented order on both sides
keeps outputs identical).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (kind, pattern, replacement) — ORDER MATTERS, see module docstring
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
)


def pii_scan_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append per-kind match counts (``n_email``, ``n_phone``,
    ``n_ipv4``) — counts run on the ORIGINAL text, before any masking."""
    col = pc.fill_null(batch[column].combine_chunks(), "")
    out = batch
    for kind, pattern, _ in PII_RULES:
        out = out.append_column(
            f"n_{kind}",
            pc.count_substring_regex(col, pattern).cast(pa.int64()))
    return out


def pii_redact_batch(batch: pa.Table, column: str = "text",
                     out_column: str = "redacted") -> pa.Table:
    """Append ``out_column``: the text with every rule applied in the
    fixed order.  A null input stays null (the SQL mirror's
    ``regexp_replace(NULL, ...)`` agrees)."""
    col = batch[column].combine_chunks()
    for _, pattern, repl in PII_RULES:
        col = pc.replace_substring_regex(col, pattern=pattern,
                                         replacement=repl)
    return batch.append_column(out_column, col)


def pii_redact(ds, column: str = "text", out_column: str = "redacted",
               with_counts: bool = True):
    """Scan + redact as ONE fused streaming pass."""
    def _fn(batch: pa.Table) -> pa.Table:
        if with_counts:
            batch = pii_scan_batch(batch, column)
        return pii_redact_batch(batch, column, out_column)

    return ds.map_batches(_fn, batch_format="pyarrow")

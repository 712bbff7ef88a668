"""Semi-structured (JSON) column extraction — WARC/crawl metadata,
event properties and API payloads ride along corpora as JSON strings;
this pulls typed fields out of them inside the stream.

Shape: one stateless ``map_batches`` pass; parsing is per-row (JSON has
no Arrow kernel) but strictly id/metadata-level — the operator is meant
for small side columns, never document bodies.  Malformed JSON and
missing fields yield NULL (the documented contract, mirrored in SQL via
``CASE WHEN json_valid(...)`` + ``TRY_CAST``), so one bad row can never
kill a block.
"""

from __future__ import annotations

import json

import pyarrow as pa


_CASTS = {
    "int64": (pa.int64(), int),
    "float64": (pa.float64(), float),
    "string": (pa.string(), str),
}


def json_field_batch(batch: pa.Table, column: str, field: str,
                     out_column: str | None = None,
                     out_type: str = "int64") -> pa.Table:
    """Append ``out_column`` = the top-level ``field`` of the JSON in
    ``column``, cast to ``out_type`` — NULL on malformed JSON, missing
    field, non-object document, or failed cast."""
    patype, conv = _CASTS[out_type]
    vals = []
    for v in batch[column]:
        s = v.as_py()
        out = None
        if s is not None:
            try:
                doc = json.loads(s)
                raw = doc.get(field) if isinstance(doc, dict) else None
                if raw is not None and not isinstance(raw, (dict, list)):
                    out = conv(raw)
            except (ValueError, TypeError):
                out = None
        vals.append(out)
    return batch.append_column(out_column or field,
                               pa.array(vals, patype))


def json_field(ds, column: str, field: str, out_column: str | None = None,
               out_type: str = "int64"):
    return ds.map_batches(
        lambda b: json_field_batch(b, column, field, out_column, out_type),
        batch_format="pyarrow")

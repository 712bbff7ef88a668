"""Semi-structured (JSON) column extraction — WARC/crawl metadata,
event properties and API payloads ride along corpora as JSON strings;
this pulls typed fields out of them inside the stream.

Shape: one stateless ``map_batches`` pass; parsing is per-row (JSON has
no Arrow kernel) but strictly id/metadata-level — the operator is meant
for small side columns, never document bodies.

Typing contract (TYPE-STRICT, so the SQL mirror via ``json_valid`` +
``json_type`` + ``TRY_CAST`` agrees exactly):

- ``int64``  — JSON *integer* numbers only (DuckDB json_type UBIGINT /
  BIGINT); booleans, floats (including integral-valued ``1e3``),
  strings, containers → NULL; integers outside int64 → NULL (the
  mirror's ``TRY_CAST`` overflow behavior).
- ``float64`` — any JSON number; everything else → NULL.
- ``string`` — JSON strings only; numbers/booleans are NOT stringified.

Malformed JSON, a missing field, or a non-object document also yield
NULL, so one bad row can never kill a block.
"""

from __future__ import annotations

import json

import pyarrow as pa


_INT64_MIN, _INT64_MAX = -(1 << 63), (1 << 63) - 1
_PA_TYPES = {"int64": pa.int64(), "float64": pa.float64(),
             "string": pa.string()}


def _coerce(raw, out_type: str):
    if raw is None or isinstance(raw, (bool, dict, list)):
        return None
    if out_type == "int64":
        if isinstance(raw, int) and _INT64_MIN <= raw <= _INT64_MAX:
            return raw
        return None
    if out_type == "float64":
        return float(raw) if isinstance(raw, (int, float)) else None
    return raw if isinstance(raw, str) else None


def json_field_batch(batch: pa.Table, column: str, field: str,
                     out_column: str | None = None,
                     out_type: str = "int64") -> pa.Table:
    """Append ``out_column`` = the top-level ``field`` of the JSON in
    ``column`` under the module's type-strict contract."""
    if out_type not in _PA_TYPES:
        raise ValueError(f"out_type must be one of {sorted(_PA_TYPES)}")
    vals = []
    for v in batch[column]:
        s = v.as_py()
        out = None
        if s is not None:
            try:
                doc = json.loads(s)
                raw = doc.get(field) if isinstance(doc, dict) else None
                out = _coerce(raw, out_type)
            except (ValueError, TypeError):
                out = None
        vals.append(out)
    return batch.append_column(out_column or field,
                               pa.array(vals, _PA_TYPES[out_type]))


def json_field(ds, column: str, field: str, out_column: str | None = None,
               out_type: str = "int64"):
    return ds.map_batches(
        lambda b: json_field_batch(b, column, field, out_column, out_type),
        batch_format="pyarrow")

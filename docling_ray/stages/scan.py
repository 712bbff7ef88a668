"""Distributed prefix scan (global cumulative sum) and sequence packing.

The classic two-pass hierarchical scan, Ray-Data-shaped:

1. ``sort(order_col)`` — Ray's range-partitioned sort (the one shuffle) —
   then ``materialize()`` so the sorted BLOCKS are stable across the two
   passes (``batch_size=None`` maps one batch per block, so pass 1 and
   pass 2 see identical row groups; this is the alignment the scan
   depends on, and the reason for the mid-pipeline materialize — a scan
   is inherently two passes over stable data).
2. Pass 1: per-block ``(lo, sum)`` partials — ``num_blocks`` tiny rows,
   folded into an exclusive prefix on the driver (bounded: one row per
   block, not per row).
3. Pass 2: per-block vectorized cumsum + the block's broadcast offset.

``order_col`` must be UNIQUE: ties split across a block boundary by the
sort would make block ranges overlap and the per-block offset wrong for
the tied rows (the same contract the SQL mirror needs for ``ROWS
UNBOUNDED PRECEDING`` determinism).

At 100 TB: the partials stay one-row-per-block (≈ input_bytes /
block_size rows — thousands, not billions), the broadcast is a dict of
the same size, and both passes are stateless vectorized maps.  The only
all-to-all is the sort itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _block_partial(batch: pa.Table, order_col: str, val_col: str) -> pa.Table:
    if batch.num_rows == 0:
        return pa.table({"lo": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64())})
    import pyarrow.compute as pc

    vals = batch[val_col].cast(pa.int64())
    lo_type = batch.schema.field(order_col).type
    return pa.table({
        "lo": pa.array([pc.min(batch[order_col]).as_py()], lo_type),
        "s": pa.array([pc.sum(vals).as_py() or 0], pa.int64()),
    })


class _CumsumStage:
    """Pass 2: per-block inclusive/exclusive cumsum + broadcast offset.
    Offsets are keyed by the block's min order value — exact match
    against the pass-1 partials because both passes map the SAME
    materialized blocks (``batch_size=None``)."""

    def __init__(self, offsets_ref, order_col: str, val_col: str):
        import ray

        offs = (offsets_ref if isinstance(offsets_ref, dict)
                else ray.get(offsets_ref))
        self.offsets = offs
        self.order_col, self.val_col = order_col, val_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = batch.append_column("cum_excl", pa.array([], pa.int64()))
            return out.append_column("cum_incl", pa.array([], pa.int64()))
        import pyarrow.compute as pc

        order = pc.sort_indices(batch[self.order_col])
        g = batch.take(order)
        lo = pc.min(g[self.order_col]).as_py()
        base = self.offsets[lo]
        vals = g[self.val_col].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        incl = np.cumsum(vals) + base
        excl = incl - vals
        out = g.append_column("cum_excl", pa.array(excl, pa.int64()))
        return out.append_column("cum_incl", pa.array(incl, pa.int64()))


def global_cumsum(ds, order_col: str, val_col: str):
    """Exact global running sum of ``val_col`` in ``order_col`` order
    (unique keys — see module docstring).  Appends ``cum_excl`` (sum of
    all strictly-earlier rows) and ``cum_incl``."""
    sorted_ds = ds.sort(order_col).materialize()
    partials = sorted_ds.map_batches(
        lambda b: _block_partial(b, order_col, val_col),
        batch_format="pyarrow", batch_size=None).take_all()
    partials.sort(key=lambda r: r["lo"])
    offsets, run = {}, 0
    for r in partials:
        offsets[r["lo"]] = run
        run += r["s"]
    import ray

    offsets_ref = ray.put(offsets)
    return sorted_ds.map_batches(
        _CumsumStage, batch_format="pyarrow", batch_size=None,
        concurrency=(1, 4),
        fn_constructor_kwargs={"offsets_ref": offsets_ref,
                               "order_col": order_col, "val_col": val_col})


def pack_sequences(ds, budget: int, order_col: str = "doc_id",
                   token_col: str = "n_tokens"):
    """Concat-style sequence packing: lay all docs end to end in
    ``order_col`` order and cut fixed ``budget``-token training
    sequences.  Each doc gets its global token offset (the exclusive
    scan), the sequence it starts in, and its offset inside that
    sequence; docs may straddle a boundary (GPT-style concat packing —
    greedy no-straddle packing is a different, inherently sequential
    contract).  Pure composition: ``global_cumsum`` + one stateless
    vectorized map."""
    import pyarrow.compute as pc

    scanned = global_cumsum(ds, order_col, token_col)

    def cut(batch: pa.Table) -> pa.Table:
        off = batch["cum_excl"]
        seq = pc.divide(off, pa.scalar(budget, pa.int64()))
        pos = pc.subtract(off, pc.multiply(seq, pa.scalar(budget,
                                                          pa.int64())))
        out = batch.append_column("seq_id", seq)
        return out.append_column("seq_offset", pos)

    return scanned.map_batches(cut, batch_format="pyarrow")


class WarcExplodeStage:
    """Generator actor stage behind `warc_explode` — see its docstring
    for the memory/fusion rationale."""

    def __init__(self, warc_col: str = "warc", out_batch_rows: int = 256):
        self.warc_col = warc_col
        self.out_batch_rows = out_batch_rows

    def __call__(self, batch: pa.Table):
        from docling_ray.sources.warc import parse_warc

        urls, dates, htmls, sizes = [], [], [], []

        def flush():
            out = pa.table({
                "url": pa.array(urls, pa.string()),
                "warc_date": pa.array(dates, pa.string()),
                "html": pa.array(htmls, pa.large_binary()),
                "n_bytes": pa.array(sizes, pa.int64()),
            })
            urls.clear(), dates.clear(), htmls.clear(), sizes.clear()
            return out

        yielded = False
        for raw in batch[self.warc_col].to_pylist():
            if raw is None:
                continue
            for rec in parse_warc(raw):
                urls.append(rec["url"])
                dates.append(rec["warc_date"])
                htmls.append(rec["html"])
                sizes.append(len(rec["html"]))
                if len(urls) >= self.out_batch_rows:
                    yielded = True
                    yield flush()
        if urls or not yielded:
            yield flush()


def warc_explode(ds, warc_col: str = "warc", out_batch_rows: int = 256,
                 concurrency: int = 8):
    """WARC chunk Dataset → page rows ``(url, warc_date, html,
    n_bytes)``: each chunk's records split by the Content-Length walk
    (sources/warc.py), response payloads stripped to the HTML body —
    a 100 TB crawl parallelizes by WARC chunk without pre-exploding the
    container.

    Two memory/parallelism rules, both measured (BASELINE.md --warc):

    - the UDF is a GENERATOR yielding ``out_batch_rows``-page batches
      with ``batch_size=1``: a real Common-Crawl chunk explodes to tens
      of thousands of pages, and a task never holds more than one
      multi-MB container plus one small output batch;
    - the stage is an ACTOR POOL, which blocks operator fusion with the
      downstream task-pool extraction.  Fused, the downstream
      ``batch_size`` makes Ray bundle ALL chunk rows into one task
      (measured: the whole 20k-page corpus ran as 1 task, 42 s; unfused
      it streams at full width, 15.6 s end-to-end at 16 cpus)."""
    return ds.map_batches(
        WarcExplodeStage, batch_format="pyarrow", batch_size=1,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"warc_col": warc_col,
                               "out_batch_rows": out_batch_rows})


def warc_chunk_stats(ds, warc_col: str = "warc",
                     id_col: str = "chunk_id"):
    """Per-chunk WARC parse health — ``(chunk_id, n_records,
    n_responses, n_truncated)`` from `parse_warc_stats`.  Truncation is
    DATA here: a chunk whose record walk ended early (corrupt gzip,
    garbage mid-chunk, body cut at the chunk boundary) reports
    ``n_truncated = 1`` alongside however many good-prefix rows
    `warc_explode` emitted, instead of just producing silently fewer
    pages.  A 100 TB ingest sums this column to audit crawl shards;
    zero rows are dropped invisibly."""
    import pyarrow as pa

    from docling_ray.sources.warc import parse_warc_stats

    def stats(batch: pa.Table) -> pa.Table:
        ids, nrec, nresp, ntr = [], [], [], []
        for cid, raw in zip(batch[id_col].to_pylist(),
                            batch[warc_col].to_pylist()):
            s = (parse_warc_stats(raw)[1] if raw is not None
                 else {"n_records": 0, "n_responses": 0,
                       "n_truncated": 1})
            ids.append(cid)
            nrec.append(s["n_records"])
            nresp.append(s["n_responses"])
            ntr.append(s["n_truncated"])
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "n_records": pa.array(nrec, pa.int64()),
            "n_responses": pa.array(nresp, pa.int64()),
            "n_truncated": pa.array(ntr, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")

"""Bucketed per-document reduces.

``ds.groupby(doc_id).map_groups(fn)`` pays Ray's per-GROUP UDF dispatch
for every document — at corpus scale (tens of thousands of tiny groups)
that overhead throttles an else-cheap reduce to a hard plateau (the VLM
pipeline measured ~1,295 docs/s flat from 8 cpus up; see NOTES.md's
high-cardinality-groupby trap).  The repo-standard shape is ONE shuffle
on ``hash(doc_id) % P`` and one UDF call per partition that walks the
document runs inside — same rows, since every page of a doc lands in
one bucket.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import pyarrow as pa


def bucketed_doc_groups(ds, doc_fn: Callable[[pa.Table], pa.Table],
                        num_partitions: int = 64,
                        id_column: str = "doc_id",
                        sort_columns: Sequence[str] = ("page_no",),
                        empty_schema: Optional[pa.Schema] = None):
    """Apply ``doc_fn`` to each ``id_column`` group of ``ds`` via a
    hash-bucketed shuffle (P partitions, one UDF call per partition).

    ``doc_fn`` receives each document's rows sorted by ``sort_columns``
    (with the transient ``_part`` column still attached — reduces that
    rebuild their output table are unaffected).  ``empty_schema`` pins
    the output schema should a partition UDF ever run with zero rows
    (the NOTES.md empty-map_groups trap).
    """
    from docling_ray.stages.dedup import _part_of

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", pa.array(_part_of(batch[id_column], num_partitions),
                              pa.int64()))

    sort_keys = [(id_column, "ascending")] + \
        [(c, "ascending") for c in sort_columns]

    def partition_fn(part: pa.Table) -> pa.Table:
        part = part.sort_by(sort_keys)
        ids = part[id_column].to_pylist()
        out, start = [], 0
        for i in range(1, len(ids) + 1):
            if i == len(ids) or ids[i] != ids[start]:
                out.append(doc_fn(part.slice(start, i - start)))
                start = i
        if not out:
            return (empty_schema or part.schema).empty_table()
        return pa.concat_tables(out)

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(partition_fn, batch_format="pyarrow")


def _topk_partial(batch: pa.Table, group_col: str, order_col: str,
                  tie_col: str, k: int, descending: bool) -> pa.Table:
    """Per-batch combiner: top-``k`` rows per group WITHIN the batch —
    one C sort + a vectorized run-position scan, no Python loop over
    rows.  Bounds the shuffle that follows to k × groups × batches."""
    import numpy as np
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return batch
    order = pc.sort_indices(batch, sort_keys=[
        (group_col, "ascending"),
        (order_col, "descending" if descending else "ascending"),
        (tie_col, "ascending")])
    t = batch.take(order)
    g = t[group_col].to_numpy(zero_copy_only=False)
    starts = np.concatenate([[True], g[1:] != g[:-1]])
    # position of each row within its group run
    run_id = np.cumsum(starts) - 1
    first_pos = np.nonzero(starts)[0]
    pos = np.arange(len(g)) - first_pos[run_id]
    return t.filter(pa.array(pos < k))


def grouped_topk(ds, group_col: str, order_col: str, k: int,
                 tie_col: str, descending: bool = True,
                 rank_col: str = "rank", num_partitions: int = 64):
    """Top-``k`` rows per group (SQL's row_number-per-partition), the
    combiner-first way: per-batch partial top-k (the corpus never
    reaches a global sort) → ONE hash-bucketed shuffle over ≤ k ×
    batches rows per group → final per-group sort + rank.  Ties break
    on ``tie_col`` ASC, so the result is deterministic and
    partition-invariant.  The merge runs through the repo's bucketed
    reduce (one UDF call per PARTITION, groups walked in-partition),
    so group cardinality never becomes a Ray per-group dispatch cost
    (the NOTES.md high-cardinality-groupby trap)."""
    import numpy as np
    import pyarrow.compute as pc

    part = ds.map_batches(
        lambda b: _topk_partial(b, group_col, order_col, tie_col, k,
                                descending),
        batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_part"])
        order = pc.sort_indices(group, sort_keys=[
            (order_col, "descending" if descending else "ascending"),
            (tie_col, "ascending")])
        g = group.take(order.slice(0, k))
        return g.append_column(
            rank_col, pa.array(np.arange(1, g.num_rows + 1), pa.int64()))

    # Known Ray 2.49 artifact (same caveat as the differential fuzzer's
    # 0-row guard): a fully EMPTY input yields a zero-column dataset —
    # with zero groups map_groups never runs, and a typed empty seed
    # block unioned in front does not survive the executor's schema
    # merge.  Any non-empty input produces the documented
    # input-columns + rank schema.
    return bucketed_doc_groups(part, merge, num_partitions=num_partitions,
                               id_column=group_col, sort_columns=())

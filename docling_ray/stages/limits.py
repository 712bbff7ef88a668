"""Document limits: max file size, max page count, page range.

Port of the reference's ``DocumentLimits`` semantics
(``/root/reference/docling/datamodel/settings.py:22-25``,
``document.py:135-167``, ``pipeline/base_pipeline.py:143-146``):

- a document whose payload exceeds ``max_file_size`` is INVALID (failure
  row, never parsed);
- a paginated document with more than ``max_num_pages`` pages is INVALID
  (skipped entirely — the reference does not truncate);
- ``page_range`` is 1-based inclusive: only pages in range are built, and
  a document with fewer pages than ``page_range[0]`` is INVALID.

Distribution notes: byte-size limits are row-local (plain ``map_batches``
guards).  Page limits are enforced where the page count is locally known —
at archive-explode time for byte sources (out-of-range pages never enter
the shuffle) or inside the per-doc ``groupby`` reduce for pre-exploded
page tables (no extra shuffle either way).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import pyarrow as pa

DEFAULT_PAGE_RANGE = (1, sys.maxsize)


@dataclass
class DocumentLimits:
    max_num_pages: int = sys.maxsize
    max_file_size: int = sys.maxsize
    page_range: tuple[int, int] = DEFAULT_PAGE_RANGE
    # reference document_timeout aborts between page batches with
    # PARTIAL_SUCCESS (base_pipeline.py:181-189).  A single-doc kernel
    # call is atomic here, so the analog is a measured per-doc wall time
    # plus a timed_out flag column — downstream policy (drop, retry
    # elsewhere, alert) stays with the pipeline author.
    document_timeout: float | None = None


def page_count_valid(n_pages_total: int, limits: DocumentLimits) -> bool:
    """``document.py:159-167``: too many pages or starting past the end
    invalidates the whole document."""
    if n_pages_total > limits.max_num_pages:
        return False
    if n_pages_total < limits.page_range[0]:
        return False
    return True


def page_in_range(page_no: int, limits: DocumentLimits) -> bool:
    """0-indexed page vs the 1-based inclusive range
    (``base_pipeline.py:143-146``)."""
    start, end = limits.page_range
    return (start - 1) <= page_no <= (end - 1)


def oversize(raw: bytes, limits: DocumentLimits) -> bool:
    return len(raw) > limits.max_file_size


def slice_doc_pages(group: pa.Table,
                    limits: DocumentLimits) -> pa.Table:
    """In-group enforcement for pre-exploded page tables: the group holds
    every page of one doc, so the total count is locally known.  Returns
    the in-range pages, or an EMPTY table when the doc is invalid."""
    n_total = (group["n_pages_total"][0].as_py()
               if "n_pages_total" in group.column_names else group.num_rows)
    if not page_count_valid(n_total, limits):
        return group.slice(0, 0)
    mask = pa.array([page_in_range(p, limits)
                     for p in group["page_no"].to_pylist()], pa.bool_())
    return group.filter(mask)

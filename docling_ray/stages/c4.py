"""C4-style line/page quality filtering (Raffel et al. 2020, §2.2 — the
rule set behind the Colossal Clean Crawled Corpus), as ONE stateless
vectorized ``map_batches`` stage over Arrow batches.

Published rules implemented (each a C RE2 kernel, zero shuffles):

Line level — a line survives iff
  * it ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``),
  * it contains at least ``min_words`` whitespace tokens (paper: 5),
  * it does not contain the word "javascript" (matched case-insensitively
    — the paper removed lines with the word "Javascript"; lowercasing
    both sides keeps the rule robust and SQL-mirrorable).

Page level — a page passes iff
  * it does not contain a curly bracket ``{`` (code heuristic),
  * it does not contain the phrase "lorem ipsum" (case-insensitive),
  * it does not contain any word from the configured bad-word list
    (the paper's "List of Dirty, Naughty …" blocklist; the list itself
    ships with the caller, not this module),
  * at least ``min_kept_lines`` lines survive the line-level pass
    (the paper's "at least 3 sentences" gate, applied to kept lines).

Scale shape: this is the same decision-pass geometry as
``stages/textstats.gopher_stats_batch`` — stateless, zero shuffles, the
payload never leaves its block.  Reconstruction (``text_clean``) reuses
the ListArray split/filter/re-join pattern of ``stages/dedup.line_dedup``
with the same int32-offset overflow guard.  Every rule is a regex hit or
an integer comparison, so the DuckDB oracle mirror is hash-exact by
construction.

Reference (spec only): C4 cleaning described against
/root/reference/docling's corpus-filter framing; rule constants from
Raffel et al. 2020 "Exploring the Limits of Transfer Learning" §2.2.
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# A line is kept iff it ends in one of these (no trailing whitespace —
# the split on \n preserves any, and the paper's rule is end-of-line).
_TERMINAL_RE = r'[.!?"]$'
_WORD_RE = r"[^\s]+"
_JS_RE = r"javascript"            # probed on the lowercased line
_LOREM_RE = r"lorem ipsum"        # probed on the lowercased page


def c4_stats_batch(batch: pa.Table, column: str = "text",
                   min_words: int = 5, min_kept_lines: int = 3,
                   badwords: tuple = ()) -> pa.Table:
    """Append C4 counters + ``text_clean`` + ``c4_pass`` to ``batch``.

    Output columns (all int64 unless noted): ``n_lines``,
    ``n_kept_lines``, ``has_brace``, ``has_lorem``, ``has_badword``,
    ``c4_pass``, ``text_clean`` (string: surviving lines re-joined with
    ``\\n``; ``''`` when nothing survives).  NULL text ≡ ``''`` (family
    contract)."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch[column].combine_chunks(), "")
    low = pc.utf8_lower(col)

    # ---- line-level pass -------------------------------------------------
    lists = pc.split_pattern(col, "\n")
    lines = lists.values
    lines_low = pc.utf8_lower(lines)
    keep = (
        pc.match_substring_regex(lines, _TERMINAL_RE)
        .to_numpy(zero_copy_only=False)
        & (pc.count_substring_regex(lines, _WORD_RE).cast(pa.int64())
           .to_numpy(zero_copy_only=False) >= min_words)
        & ~pc.match_substring_regex(lines_low, _JS_RE)
        .to_numpy(zero_copy_only=False)
    )

    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    row_idx = np.repeat(np.arange(len(counts)), counts)
    kept_counts = np.bincount(row_idx[keep], minlength=len(counts)) \
        .astype(np.int64)
    offsets64 = np.concatenate([[0], np.cumsum(kept_counts,
                                               dtype=np.int64)])
    if offsets64[-1] >= 2 ** 31:  # int32 offsets would wrap silently
        raise ValueError(
            f"batch holds {offsets64[-1]} kept lines >= 2^31; shrink "
            "batch_size for this stage (offsets are int32 ListArray)")
    la = pa.ListArray.from_arrays(
        pa.array(offsets64.astype(np.int32), pa.int32()),
        lines.filter(pa.array(keep)))
    text_clean = pc.binary_join(la, "\n")

    # ---- page-level flags ------------------------------------------------
    has_brace = pc.match_substring(col, "{") \
        .to_numpy(zero_copy_only=False)
    has_lorem = pc.match_substring_regex(low, _LOREM_RE) \
        .to_numpy(zero_copy_only=False)
    has_bad = np.zeros(batch.num_rows, dtype=bool)
    for w in badwords:
        # published blocklists carry regex metacharacters ('a$$', 'c++')
        # — escape so they match literally instead of breaking RE2
        has_bad |= pc.match_substring_regex(low,
                                            rf"\b{re.escape(w)}\b") \
            .to_numpy(zero_copy_only=False)

    ok = (~has_brace & ~has_lorem & ~has_bad
          & (kept_counts >= min_kept_lines))

    out = batch
    for name, arr in (("n_lines", counts),
                      ("n_kept_lines", kept_counts),
                      ("has_brace", has_brace.astype(np.int64)),
                      ("has_lorem", has_lorem.astype(np.int64)),
                      ("has_badword", has_bad.astype(np.int64)),
                      ("c4_pass", ok.astype(np.int64))):
        out = out.append_column(name, pa.array(arr, pa.int64()))
    return out.append_column("text_clean", text_clean)


def c4_filter(ds, column: str = "text", min_words: int = 5,
              min_kept_lines: int = 3, badwords: tuple = (),
              keep_only: bool = False):
    """Dataset-level C4 pass: annotate every doc; with ``keep_only``
    drop failing pages (the corpus-curation form).  One stateless
    ``map_batches`` — streams at any scale."""
    out = ds.map_batches(
        lambda b: c4_stats_batch(b, column, min_words, min_kept_lines,
                                 badwords),
        batch_format="pyarrow")
    if keep_only:
        import pyarrow.compute as pc
        out = out.map_batches(
            lambda b: b.filter(pc.equal(b["c4_pass"], 1)),
            batch_format="pyarrow")
    return out

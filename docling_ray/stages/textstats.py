"""Text-analysis stages for the training-data pipeline.

All are stateless ``map_batches(batch_format="pyarrow")`` transforms over a
``documents``-shaped table (``doc_id``, ``text``, ``lang``, ...):

- token counting (whitespace tokens — SQL-oracle-compatible),
- quality counters (alpha/digit/punct/space char classes, integer-exact so
  the DuckDB oracle matches bit-for-bit),
- md5 document fingerprinting,
- 64-bit SimHash over token md5s,
- n-gram-frequency language identification (heuristic, deterministic).

Determinism note: everything hashes through hashlib (never the builtin
``hash``), so results are identical across Ray worker processes.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

_TOKEN_RE = re.compile(r"[^\s]+")
# RE2-ASCII whitespace semantics (what DuckDB's regexp_* and Arrow's C
# kernels use): NBSP etc. are NOT separators.  The oracle-compared
# hash/langid families tokenize with THIS so the SQL mirrors agree on
# unicode text; the unicode-\s `tokens_of` stays for the chunker family
# (documented divergence, see token_count_batch).
_TOKEN_RE_ASCII = re.compile(r"[^\s]+", re.ASCII)
_ALPHA_RE = re.compile(r"[A-Za-z]")
_DIGIT_RE = re.compile(r"[0-9]")
_SPACE_RE = re.compile(r"\s")

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "auf", "für", "ein"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "en"},
    "zh": set(),  # CJK: detected by script, not stopwords
}


def tokens_of(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Whitespace-token count via Arrow's C regex counter (one
    non-overlapping ``[^\\s]+`` match per token).  Whitespace semantics
    are RE2's ASCII ``\\s`` — the same engine DuckDB's regexp_* uses, so
    the oracle equivalence holds by construction; note this DIFFERS from
    Python's unicode ``\\s`` on NBSP etc. ("naïve\\xa0café" counts 1
    token here, 2 via ``tokens_of``), so ``n_tokens`` can disagree with
    the chunker/simhash token family on such text (same contract as
    ``quality_batch`` below)."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch[column].combine_chunks(), "")
    counts = pc.count_substring_regex(col, r"[^\s]+").cast(pa.int64())
    return batch.append_column("n_tokens", counts)


def quality_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Integer char-class counters; quality *scores* derive from these.
    Fully vectorized: every counter is an Arrow C kernel
    (``count_substring_regex`` counts non-overlapping matches).

    Whitespace semantics are RE2's ASCII ``\\s`` — the SAME engine DuckDB
    regexp_* uses, so the oracle equivalence holds by construction on any
    input (Python's unicode ``\\s`` additionally treats NBSP etc. as
    separators; ``tokens_of`` keeps the Python semantics for the
    chunker/simhash family)."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch[column].combine_chunks(), "")
    out = batch
    for name, pattern in (("n_alpha", r"[A-Za-z]"),
                          ("n_digit", r"[0-9]"),
                          ("n_space", r"\s"),
                          ("n_tokens", r"[^\s]+")):
        out = out.append_column(
            name, pc.count_substring_regex(col, pattern).cast(pa.int64()))
    out = out.append_column("n_chars_text",
                            pc.utf8_length(col).cast(pa.int64()))
    # column order parity with the previous implementation
    names = [c for c in out.column_names
             if c not in ("n_chars_text", "n_alpha", "n_digit", "n_space",
                          "n_tokens")]
    return out.select(names + ["n_chars_text", "n_alpha", "n_digit",
                               "n_space", "n_tokens"])


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Float quality score in [0,1] from the integer counters (length,
    alpha ratio, mean token length band) — heuristic tier analog of the
    reference's text-quality scoring
    (``/root/reference/docling/models/page_preprocessing_model.py:69-145``)."""
    import pyarrow.compute as pc

    batch = quality_batch(batch)
    n_chars = batch["n_chars_text"].to_numpy(zero_copy_only=False).astype("float64")
    n_alpha = batch["n_alpha"].to_numpy(zero_copy_only=False).astype("float64")
    n_tokens = batch["n_tokens"].to_numpy(zero_copy_only=False).astype("float64")
    import numpy as np

    nz = np.maximum(n_chars, 1.0)
    alpha_ratio = n_alpha / nz
    mean_tok = n_chars / np.maximum(n_tokens, 1.0)
    len_score = np.clip(n_chars / 200.0, 0.0, 1.0)
    tok_score = np.clip(1.0 - np.abs(mean_tok - 5.0) / 10.0, 0.0, 1.0)
    score = 0.4 * alpha_ratio + 0.3 * len_score + 0.3 * tok_score
    _ = pc  # vectorized path uses numpy; keep import for parity with siblings
    return batch.append_column("quality_score", pa.array(score, pa.float64()))


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """md5 fingerprint of the exact text bytes (exact-dup key)."""
    fps = [hashlib.md5((v.as_py() or "").encode("utf-8")).hexdigest()
           for v in batch[column]]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def _token_hash64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over whitespace tokens (occurrence-weighted).

    Vectorized: tokens are md5-hashed once per DISTINCT token, the 64-way
    bit loop runs as one numpy unpack + weighted column sum instead of
    64 × n_tokens Python iterations."""
    import numpy as np
    from collections import Counter

    # ASCII-\s tokens: identical to the SQL mirror's RE2 [^\s]+ even on
    # NBSP/unicode-space text (ASCII corpora are unaffected)
    counts = Counter(_TOKEN_RE_ASCII.findall(text))
    if not counts:
        return 0
    digests = b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8]
                       for t in counts)
    hs = np.frombuffer(digests, dtype=">u8")
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # bits[t, b] = bit b of token-hash t (b = 0 is the LSB, matching the
    # scalar (h >> bit) & 1 loop this replaces)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
    weights = (w[:, None] * (2 * bits.astype(np.int64) - 1)).sum(axis=0)
    sel = weights > 0
    return int((np.uint64(1) << np.arange(64, dtype=np.uint64))[sel].sum())


def simhash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``simhash`` (hex string, the oracle-compared form) and
    ``simhash_u64`` (uint64, the zero-copy numpy form downstream LSH
    bucketing shifts on directly)."""
    import numpy as np

    hashes = [simhash64(v.as_py() or "") for v in batch[column]]
    out = batch.append_column(
        "simhash", pa.array([f"{h:016x}" for h in hashes], pa.string()))
    return out.append_column(
        "simhash_u64", pa.array(np.array(hashes, dtype=np.uint64), pa.uint64()))


_WINNOW_BASE = 257
_MERSENNE61 = (1 << 61) - 1


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): polynomial rolling hash over character k-grams
    (codepoints, base 257, numpy uint64 wraparound then mod 2^61-1 — the
    same SQL-mirrorable arithmetic as the MinHash oracle), then the
    MINIMUM hash of each ``window`` consecutive k-grams; the DISTINCT
    selected minima are the fingerprint set.  Fully vectorized: codepoint
    extraction via a UTF-32 view, the k-term polynomial as k shifted
    array products, window minima via a sliding-window view."""
    import numpy as np

    if len(text) < k:
        return []
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4") \
        .astype(np.uint64)
    n = len(codes) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(_WINNOW_BASE)
    for j in range(k):            # k vector ops, not n·k scalar ops
        h = h * base + codes[j:j + n]
    h %= np.uint64(_MERSENNE61)
    if n < window:
        return sorted({int(h.min())})
    mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
    return sorted({int(v) for v in mins})


def winnow_batch(batch: pa.Table, column: str = "text", k: int = 8,
                 window: int = 4) -> pa.Table:
    """Per-doc winnowing summary: fingerprint count and XOR of the
    selected hashes (both int64-exact, SQL-oracle-comparable)."""
    n_fp, fp_xor = [], []
    for v in batch[column]:
        fps = winnow_fingerprints(v.as_py() or "", k=k, window=window)
        n_fp.append(len(fps))
        acc = 0
        for h in fps:
            acc ^= h
        fp_xor.append(acc)
    out = batch.append_column("n_fp", pa.array(n_fp, pa.int64()))
    return out.append_column("fp_xor", pa.array(fp_xor, pa.int64()))


def langid_of(text: str) -> str:
    """Deterministic language guess: CJK script share, else stopword hits."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / max(len(text), 1) > 0.1:
        return "zh"
    toks = set(t.lower().strip(".,;:!?\"'()")
               for t in _TOKEN_RE_ASCII.findall(text))
    best, best_score = "und", 0
    for lang, profile in _LANG_PROFILES.items():
        score = len(toks & profile)
        if score > best_score:
            best, best_score = lang, score
    return best


def langid_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    langs = [langid_of(v.as_py() or "") for v in batch[column]]
    return batch.append_column("lang_pred", pa.array(langs, pa.string()))


# -- corpus vocabulary statistics -------------------------------------------


def token_count_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-batch PARTIAL token counts ``(token, n)`` — the combiner half
    of the top-k-tokens pipeline: the shuffle that follows moves
    vocabulary-sized rows, never corpus-sized ones.  All C: Arrow RE2
    ``\\s+`` split (the engine's SQL-mirrorable tokenizer) → flatten →
    ``value_counts``; empty tokens (leading/trailing whitespace artifacts)
    are dropped on both the Ray and SQL sides."""
    import pyarrow.compute as pc

    toks = pc.list_flatten(pc.split_pattern_regex(
        pc.fill_null(batch[column].combine_chunks(), ""), r"\s+"))
    toks = toks.filter(pc.not_equal(toks, ""))
    vc = pc.value_counts(toks)
    return pa.table({"token": vc.field("values"),
                     "n": vc.field("counts").cast(pa.int64())})


def _topk_tokens_block(batch: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(batch, sort_keys=[("n", "descending"),
                                              ("token", "ascending")])
    return batch.take(order.slice(0, k))


def top_k_tokens(ds, k: int = 50, column: str = "text") -> pa.Table:
    """Global top-``k`` most frequent tokens ``(token, n)``, ties broken
    by token ASC.  Three stages: per-batch partial counts (combiner) →
    native ``groupby(token).sum`` over vocabulary-sized rows → per-block
    partial top-k, merged on the driver from ≤ k × num_blocks rows (the
    ANN partial-top-k shape, stages/ann.py) — the corpus itself never
    reaches a sort."""
    counts = ds.map_batches(
        lambda b: token_count_partial(b, column), batch_format="pyarrow") \
        .groupby("token").sum("n") \
        .map_batches(lambda b: b.rename_columns(["token", "n"]),
                     batch_format="pyarrow")
    partial = counts.map_batches(lambda b: _topk_tokens_block(b, k),
                                 batch_format="pyarrow").take_all()
    merged = sorted(partial, key=lambda r: (-r["n"], r["token"]))[:k]
    return pa.table({
        "token": pa.array([r["token"] for r in merged], pa.string()),
        "n": pa.array([r["n"] for r in merged], pa.int64()),
    })


# -- Gopher quality rules ----------------------------------------------------

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_ALPHA_TOKEN_RE = r"[^\s]*[A-Za-z][^\s]*"
_GOPHER_BULLET_LINE_RE = r"(?m)^\s*[-*•]"
_GOPHER_ELLIPSIS_LINE_RE = r"(?m)(\.\.\.|…)$"


def gopher_stats_batch(batch: pa.Table, column: str = "text",
                       min_tokens: int = 50,
                       max_tokens: int = 100_000) -> pa.Table:
    """Per-doc Gopher quality counters + pass flag (Rae et al. 2021
    §A1.1.2, the published rule set behind MassiveWeb): token-count band,
    mean-word-length band [3, 10], symbol-to-word ratio (# and ellipsis)
    < 0.1, >= 80% of tokens contain an alphabetic char, >= 2 of the 8
    canonical English stop words, < 90% bullet-started lines, < 30%
    ellipsis-ended lines.  ``n_stopwords`` is the number of DISTINCT stop
    words present (0..8), matching Rae et al.'s "contains at least two of
    the following English words" — not total occurrences ('the the' alone
    must NOT pass).

    Everything is an Arrow C RE2 kernel and every RULE is an
    integer cross-multiplication (``10 * n_sym < n_tokens`` instead of a
    float ratio), so the DuckDB mirror is hash-exact by construction.
    RE2 semantics shared with the SQL side: ASCII ``\\s``/``\\b``,
    non-overlapping counts.  NULL text ≡ '' (family contract).  Zero
    shuffles — this is a stateless per-batch stage."""
    import numpy as np
    import pyarrow.compute as pc

    col = pc.fill_null(batch[column].combine_chunks(), "")

    def cnt(pattern: str) -> "np.ndarray":
        return pc.count_substring_regex(col, pattern) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)

    n_chars = pc.utf8_length(col).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_tokens = cnt(r"[^\s]+")
    n_space = cnt(r"\s")
    n_alpha_tok = cnt(_GOPHER_ALPHA_TOKEN_RE)
    # Distinct stop words present: one RE2 presence flag per word, summed.
    n_stop = np.zeros(len(col), np.int64)
    for w in _GOPHER_STOPWORDS:
        n_stop += pc.match_substring_regex(col, rf"\b{w}\b") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_sym = cnt(r"#") + cnt(r"\.\.\.") + cnt("…")
    n_newline = cnt(r"\n")
    n_lines = n_newline + (n_chars > 0).astype(np.int64)
    n_bullet = cnt(_GOPHER_BULLET_LINE_RE)
    n_ellipsis_line = cnt(_GOPHER_ELLIPSIS_LINE_RE)

    word_chars = n_chars - n_space          # chars inside tokens
    ok = (
        (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
        & (3 * n_tokens <= word_chars) & (word_chars <= 10 * n_tokens)
        & (10 * n_sym < n_tokens)
        & (5 * n_alpha_tok > 4 * n_tokens)
        & (n_stop >= 2)
        & (10 * n_bullet < 9 * n_lines)
        & (10 * n_ellipsis_line < 3 * n_lines)
    )
    out = batch
    for name, arr in (("n_tokens", n_tokens),
                      ("n_alpha_tokens", n_alpha_tok),
                      ("n_stopwords", n_stop),
                      ("n_symbols", n_sym),
                      ("n_bullet_lines", n_bullet),
                      ("n_ellipsis_lines", n_ellipsis_line),
                      ("gopher_pass", ok.astype(np.int64))):
        out = out.append_column(name, pa.array(arr, pa.int64()))
    return out


def normalize_for_dedup_batch(batch: pa.Table, text_column: str = "text",
                              out_column: str = "norm_text") -> pa.Table:
    """CCNet/RefinedWeb-style canonical text for FUZZY dedup: unicode
    lowercase, digits → ``0``, punctuation/symbols stripped, whitespace
    collapsed to single spaces, trimmed.  Case, numbering and
    punctuation edits between near-copies stop defeating exact/MinHash
    dedup when keys hash this form instead of the raw text.

    Every transform is an RE2 kernel (plus ``utf8_lower``, whose
    DuckDB ``lower()`` parity is differential-fuzzer-proven via the
    url_dedup/top_k_tokens queries), so the SQL mirror agrees by
    construction; RE2's ASCII ``\\d``/``\\s`` and unicode
    ``\\p{L}\\p{N}`` classes mean both engines draw the same
    boundaries.  One stateless vectorized pass, zero shuffles."""
    import pyarrow.compute as pc

    t = pc.fill_null(batch[text_column], "")
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, r"\d", "0")
    t = pc.replace_substring_regex(t, r"[^\p{L}\p{N}\s]", "")
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim(t, " ")
    return batch.append_column(out_column, t)

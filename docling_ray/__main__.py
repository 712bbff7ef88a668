"""CLI: ``python -m docling_ray convert <input> [--to md,json,itxt,chunks]``.

Two input shapes (the reference CLI's convert surface re-expressed,
``/root/reference/docling/cli/main.py:287-489``):

- a file or directory of documents (html/csv/json/txt) → per-document
  exports written next to ``--output``;
- a parquet corpus directory (web-pages schema) → the resumable Ray Data
  pipeline (``run_extract``) with per-shard lineage manifest.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _convert_files(paths: list[str], output: str, formats: list[str],
                   max_tokens: int) -> int:
    from docling_ray.kernels.chunker import chunk_document
    from docling_ray.kernels.docjson_write import to_docjson
    from docling_ray.kernels.doctags import to_doctags
    from docling_ray.kernels.itxt import to_indented_text
    from docling_ray.kernels.markdown import to_markdown, to_text
    from docling_ray.stages.extract import extract_doc, sniff_format_bytes

    os.makedirs(output, exist_ok=True)
    n_ok = 0
    for path in paths:
        try:
            raw = open(path, "rb").read()
        except OSError as exc:
            print(f"FAILED {path}: {exc}", file=sys.stderr)
            continue
        name = os.path.splitext(os.path.basename(path))[0]
        fmt = sniff_format_bytes(raw, filename=os.path.basename(path))
        try:
            doc = extract_doc(raw, fmt if fmt not in ("empty", "binary") else "html")
        except Exception as exc:
            print(f"FAILED {path}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        if "md" in formats:
            open(os.path.join(output, name + ".md"), "w").write(to_markdown(doc))
        if "json" in formats:
            open(os.path.join(output, name + ".json"), "w").write(
                to_docjson(doc, indent=2))
        if "itxt" in formats:
            open(os.path.join(output, name + ".itxt"), "w").write(
                to_indented_text(doc))
        if "txt" in formats:
            open(os.path.join(output, name + ".txt"), "w").write(to_text(doc))
        if "doctags" in formats:
            open(os.path.join(output, name + ".doctags.txt"), "w").write(
                to_doctags(doc))
        if "html" in formats:
            from docling_ray.kernels.html_export import to_html

            open(os.path.join(output, name + ".html"), "w").write(to_html(doc))
        if "html_split_page" in formats:
            from docling_ray.kernels.html_export import to_html_split_page

            open(os.path.join(output, name + ".split.html"), "w").write(
                to_html_split_page(doc))
        if "chunks" in formats:
            chunks = chunk_document(doc, max_tokens=max_tokens)
            with open(os.path.join(output, name + ".chunks.jsonl"), "w") as f:
                for i, c in enumerate(chunks):
                    f.write(json.dumps({
                        "chunk_id": i, "text": c.text,
                        "headings": c.headings, "n_tokens": c.n_tokens,
                        "kind": c.kind}) + "\n")
        n_ok += 1
    print(f"converted {n_ok}/{len(paths)} documents → {output}")
    return 0 if n_ok == len(paths) else 1


def _convert_corpus(input_dir: str, output: str, num_cpus: int,
                    pipeline: str = "standard") -> int:
    """Parquet-corpus conversion, dispatched on the corpus SCHEMA (the
    reference CLI's ``--pipeline`` switch, ``cli/main.py:301-310``, plus
    input-format routing): web pages (``html`` column) → the resumable
    extraction runner; parsed pages (``cells``) → the paginated pipeline,
    or the VLM pipeline under ``--pipeline vlm``; audio (``audio``) → the
    ASR pipeline."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    shards = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    columns = set(pq.ParquetFile(shards[0]).schema_arrow.names)
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    if "audio" in columns:
        from docling_ray.pipelines.pdf_pipeline import run_asr_extract

        stats = run_asr_extract(input_dir, output)
        stats["pipeline"] = "asr"
    elif "cells" in columns and pipeline == "vlm":
        from docling_ray.pipelines.pdf_pipeline import run_vlm_extract

        stats = run_vlm_extract(input_dir, output)
        stats["pipeline"] = "vlm"
    elif "cells" in columns:
        from docling_ray.pipelines.pdf_pipeline import run_pdf_extract

        stats = run_pdf_extract(input_dir, output)
        stats["pipeline"] = "pdf"
    else:
        from docling_ray.pipelines.extract_pipeline import run_extract

        stats = run_extract(input_dir, output)
        stats["pipeline"] = "standard"
    print(json.dumps(stats))
    if owns_session:     # never tear down a caller's (e.g. pytest's) Ray
        ray.shutdown()
    return 0


def _curate_corpus(args) -> int:
    """`docling_ray curate <corpus-dir> -o <out>`: the composed
    training-data chain (extract → exact dedup → MinHash near-dup drop →
    quality floor → chunk) via the checkpointed resumable runner — the
    CLI surface of pipelines/corpus.run_corpus."""
    import ray

    from docling_ray.pipelines.corpus import run_corpus

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    stats = run_corpus(args.input, args.output,
                       resume=not args.no_resume,
                       minhash_threshold=args.minhash_threshold,
                       drop_mode=args.drop_mode,
                       emit_text=args.emit_text,
                       redact_pii=args.redact_pii)
    print(json.dumps(stats))
    if owns_session:     # never tear down a caller's (e.g. pytest's) Ray
        ray.shutdown()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="docling_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)
    cur = sub.add_parser(
        "curate", help="corpus dir → deduped/filtered chunk parquet "
                       "(checkpointed; re-run to resume)")
    cur.add_argument("input")
    cur.add_argument("--output", "-o", default="./curated")
    cur.add_argument("--minhash-threshold", type=float, default=0.7)
    cur.add_argument("--drop-mode", choices=("auto", "broadcast", "sharded"),
                     default="auto")
    cur.add_argument("--emit-text", action="store_true",
                     help="carry chunk text into the output parquet")
    cur.add_argument("--redact-pii", action="store_true",
                     help="mask emails/phones/IPv4 in chunk text "
                          "(implies --emit-text)")
    cur.add_argument("--no-resume", action="store_true")
    cur.add_argument("--num-cpus", type=int,
                     default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    conv = sub.add_parser("convert", help="convert documents or a parquet corpus")
    conv.add_argument("input")
    conv.add_argument("--output", "-o", default="./out")
    conv.add_argument("--to", default="md",
                      help="comma list of md,json,itxt,doctags,txt,html,"
                           "html_split_page,chunks (file inputs)")
    conv.add_argument("--max-tokens", type=int, default=256)
    conv.add_argument("--pipeline", choices=("standard", "vlm"),
                      default="standard",
                      help="parquet page corpora: route through the "
                           "layout pipeline (standard) or the VLM "
                           "pipeline (vlm); audio corpora always use ASR")
    conv.add_argument("--num-cpus", type=int,
                      default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = parser.parse_args(argv)

    if args.cmd == "curate":
        return _curate_corpus(args)
    if "://" in args.input:
        # URL input expansion (reference cli/main.py:513-550): fetch to a
        # temp file, then convert.  file:// works offline; http(s) needs
        # network.
        import tempfile
        import urllib.parse
        import urllib.request

        name = os.path.basename(
            urllib.parse.urlparse(args.input).path) or "download"
        tmp = os.path.join(tempfile.mkdtemp(prefix="docling_ray_url"), name)
        with urllib.request.urlopen(args.input) as resp, open(tmp, "wb") as f:
            f.write(resp.read())
        return _convert_files([tmp], args.output, args.to.split(","),
                              args.max_tokens)
    if os.path.isdir(args.input) and glob.glob(os.path.join(args.input, "*.parquet")):
        return _convert_corpus(args.input, args.output, args.num_cpus,
                               pipeline=args.pipeline)
    if os.path.isdir(args.input):
        paths = sorted(
            p for p in glob.glob(os.path.join(args.input, "*"))
            if os.path.splitext(p)[1].lower() in
            (".html", ".htm", ".csv", ".json", ".txt", ".xhtml", ".xml",
             ".nxml", ".asciidoc", ".adoc", ".md", ".markdown", ".docx", ".xlsx", ".xlsm", ".pptx"))
    else:
        paths = [args.input]
    return _convert_files(paths, args.output, args.to.split(","), args.max_tokens)


if __name__ == "__main__":
    sys.exit(main())

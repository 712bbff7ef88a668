#!/usr/bin/env python
"""Generate committed golden tables for the non-SQL-expressible queries.

All seven are TRUE goldens — expected values are computed by the
GENERATORS independently of the pipelines (sources/pdf_pages.py,
sources/webpages.py, sources/mets_fixture.py construct-stream
predictions); no kernel or pipeline code runs in this script.
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    os.makedirs(out_dir, exist_ok=True)

    # -- pdf: generator-side expected text (independent of the pipeline)
    from docling_ray.sources.pdf_pages import make_pdf_pages_table

    table, expected = make_pdf_pages_table(40, seed=42)
    counts = table.group_by("doc_id").aggregate([("page_no", "count")])
    n_by_doc = dict(zip(counts["doc_id"].to_pylist(),
                        counts["page_no_count"].to_pylist()))
    doc_ids = sorted(expected)
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "n_pages": pa.array([n_by_doc[d] for d in doc_ids], pa.int32()),
        "text_md5": pa.array(
            [hashlib.md5(expected[d].encode()).hexdigest() for d in doc_ids],
            pa.string()),
    }), os.path.join(out_dir, "golden_pdf.parquet"))

    # -- extract: TRUE golden — (url, doc_id, status, n_items) computed by
    #    the CORPUS GENERATOR while emitting constructs (sha-256 of the raw
    #    bytes + per-construct item counts), never by running the extractor
    from docling_ray.sources.webpages import make_expected_table

    pq.write_table(make_expected_table(120, seed=42),
                   os.path.join(out_dir, "golden_extract.parquet"))

    # -- chunks: TRUE golden — chunk rows simulated by the generator from
    #    its own construct stream under the chunker contract
    from docling_ray.sources.webpages import (
        make_expected_chunks_table,
        make_expected_corpus_chunks_table,
    )

    pq.write_table(make_expected_chunks_table(60, seed=42),
                   os.path.join(out_dir, "golden_chunks.parquet"))

    # -- corpus_pipeline: TRUE golden — surviving docs' chunk streams for
    #    the composed extract→dedup→minhash→quality→chunk chain (planted
    #    duplicates are dropped by construction, quality floor applied)
    pq.write_table(make_expected_corpus_chunks_table(80, seed=42),
                   os.path.join(out_dir, "golden_corpus.parquet"))

    # -- mets_gbs: TRUE golden — the synthetic METS archive generator
    #    emits its own expected document text (lossless integer-bbox
    #    hOCR round-trip of the pdf_pages construct stream); no kernel
    #    runs here.  Real-fixture parity with the reference's own METS
    #    expectations is separately pytest-proven (tests/test_mets_gbs.py).
    import hashlib as _hl

    from docling_ray.sources.mets_fixture import make_mets_archive

    _raw, mets_expected = make_mets_archive(6, seed=7)
    pq.write_table(pa.table({
        "doc_id": pa.array(["gbs-1"], pa.string()),
        "n_pages": pa.array([6], pa.int32()),
        "text_md5": pa.array([_hl.md5(mets_expected.encode()).hexdigest()],
                             pa.string()),
    }), os.path.join(out_dir, "golden_mets.parquet"))

    # -- multimodal pages: TRUE golden — per-page content_text derived by
    #    the page GENERATOR (column cluster texts + trailing spaces, the
    #    same knowledge behind golden_pdf), never by running the pipeline
    from docling_ray.sources.pdf_pages import make_pdf_pages_table as _mk

    _, _, exp_pages = _mk(20, seed=42, with_pages=True)
    keys = sorted(exp_pages)
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in keys], pa.string()),
        "page_no": pa.array([p for _, p in keys], pa.int32()),
        "text_md5": pa.array(
            [hashlib.md5(exp_pages[k].encode()).hexdigest() for k in keys],
            pa.string()),
    }), os.path.join(out_dir, "golden_multimodal.parquet"))

    # -- enrich: TRUE golden — per-doc enrichable-item counts (code items
    #    + pictures, one stub annotation each) predicted by the generator
    from docling_ray.sources.webpages import make_expected_enrich_table

    pq.write_table(make_expected_enrich_table(60, seed=42),
                   os.path.join(out_dir, "golden_enrich.parquet"))

    # -- outlinks: TRUE golden — (url, link_idx, href, anchor_text) of
    #    every hyperlink run, recorded by the generator while emitting,
    #    never by parsing the html
    from docling_ray.sources.webpages import make_expected_outlinks_table

    pq.write_table(make_expected_outlinks_table(120, seed=42),
                   os.path.join(out_dir, "golden_outlinks.parquet"))

    # -- crawl_rank: TRUE golden — the composed extract→graph→PageRank
    #    chain simulated in pure python from the generator's recorded
    #    hyperlink runs (resolution, node hashing and the integer
    #    recurrence re-derived here, independent of stages/graph.py)
    from collections import Counter

    from docling_ray.sources.webpages import make_rows

    data, _, _, _, expected_links = make_rows(0, 120, seed=42,
                                              with_expected=True)

    def node_of(url: str) -> int:
        v = int.from_bytes(hashlib.md5(url.encode()).digest()[:8], "big")
        return v - (1 << 64) if v >= (1 << 63) else v

    E = []
    for u, links in zip(data["url"], expected_links):
        origin = "/".join(u.split("/", 3)[:3])
        for href, _text in links:
            E.append((node_of(u), node_of(origin + href)))
    deg = Counter(s for s, _ in E)
    nodes = {s for s, _ in E} | {d for _, d in E}
    r = {v: 1_000_000 for v in nodes}
    for _ in range(3):
        acc: Counter = Counter()
        for s, d in E:
            if deg[s] > 0:
                acc[d] += r[s] // deg[s]
        r = {v: 150_000 + (85 * acc.get(v, 0)) // 100 for v in nodes}
    ns = sorted(r)
    pq.write_table(pa.table({
        "node": pa.array(ns, pa.int64()),
        "rank_u": pa.array([r[v] for v in ns], pa.int64()),
    }), os.path.join(out_dir, "golden_crawl_rank.parquet"))

    # -- anchor_text: TRUE golden — per resolved target, anchor count +
    #    md5 of the canonical "src>text" list sorted by (src, text),
    #    simulated from the generator's recorded hyperlink runs
    by_target: dict = {}
    for u, links in zip(data["url"], expected_links):
        origin = "/".join(u.split("/", 3)[:3])
        for href, text in links:
            by_target.setdefault(origin + href, []).append((u, text))
    tgts = sorted(by_target)
    pq.write_table(pa.table({
        "target": pa.array(tgts, pa.string()),
        "n_anchors": pa.array([len(by_target[t]) for t in tgts],
                              pa.int64()),
        "anchors_md5": pa.array(
            [hashlib.md5(",".join(
                f"{s}>{x}" for s, x in sorted(by_target[t]))
                .encode("utf-8")).hexdigest() for t in tgts],
            pa.string()),
    }), os.path.join(out_dir, "golden_anchor_text.parquet"))
    # -- vlm_pipeline: TRUE golden — the stub VLM's contract simulated in
    #    three lines from the page generator's cell stream (every cell
    #    text in (page_no, cell index) order, joined with blank lines);
    #    no stage or parser code runs here
    vlm_table, _ = make_pdf_pages_table(40, seed=42)
    vlm_texts: dict[str, list[str]] = {}
    for d, cells in zip(vlm_table["doc_id"].to_pylist(),
                        vlm_table["cells"].to_pylist()):
        vlm_texts.setdefault(d, []).extend(
            (c["text"] or "") for c in cells)   # rows already page-ordered
    vlm_ids = sorted(vlm_texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(vlm_ids, pa.string()),
        "n_pages": pa.array([n_by_doc[d] for d in vlm_ids], pa.int32()),
        "text_md5": pa.array(
            [hashlib.md5("\n\n".join(vlm_texts[d]).encode()).hexdigest()
             for d in vlm_ids], pa.string()),
    }), os.path.join(out_dir, "golden_vlm.parquet"))

    # -- asr: TRUE golden — (doc_id, n_segments, transcript_md5) simulated
    #    by the audio generator from its own construction plan (utterance
    #    frame ranges + word list); no stage code runs here
    from docling_ray.sources.audio import make_expected_asr_table

    pq.write_table(make_expected_asr_table(30, seed=42),
                   os.path.join(out_dir, "golden_asr.parquet"))

    # -- warc: TRUE golden — the WARC reader must reproduce exactly the
    #    url/html rows the corpus generator framed into the container
    #    (derived here from make_rows directly, never by parsing WARC)
    pq.write_table(pa.table({
        "url": pa.array(data["url"], pa.string()),
        "n_bytes": pa.array([len(h) for h in data["html"]], pa.int64()),
        "html_md5": pa.array([hashlib.md5(h).hexdigest()
                              for h in data["html"]], pa.string()),
    }), os.path.join(out_dir, "golden_warc.parquet"))
    print("goldens written to", out_dir)


if __name__ == "__main__":
    main()

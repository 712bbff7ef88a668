"""`docling_ray convert` corpus-schema dispatch: parquet page corpora
route to the paginated / VLM pipelines and audio corpora to ASR, all
through the argparse entry point (the reference CLI's --pipeline switch).
"""

import hashlib
import json

import pyarrow.parquet as pq


def _write_pages(path, n_docs=8):
    import os

    from docling_ray.sources.pdf_pages import make_pdf_pages_table

    os.makedirs(path, exist_ok=True)
    table, expected = make_pdf_pages_table(n_docs, seed=7)
    pq.write_table(table, os.path.join(path, "pages.parquet"))
    return expected


def test_cli_vlm_pipeline(ray_session, tmp_path, capsys):
    from docling_ray.__main__ import main

    src, out = tmp_path / "pages", tmp_path / "vlm_out"
    _write_pages(str(src))
    rc = main(["convert", str(src), "-o", str(out), "--pipeline", "vlm"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pipeline"] == "vlm" and stats["rows_done"] == 8
    got = pq.read_table(str(out / "data"))
    assert {"doc_id", "text", "md", "text_md5"} <= set(got.column_names)
    # per-shard lineage manifest → instant resume, no duplicate rows
    rc2 = main(["convert", str(src), "-o", str(out), "--pipeline", "vlm"])
    assert rc2 == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["shards_processed"] == 0
    assert len(pq.read_table(str(out / "data"))) == 8


def test_cli_pdf_pipeline_default(ray_session, tmp_path, capsys):
    from docling_ray.__main__ import main

    src, out = tmp_path / "pages", tmp_path / "pdf_out"
    expected = _write_pages(str(src))
    rc = main(["convert", str(src), "-o", str(out)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pipeline"] == "pdf" and stats["rows_done"] == 8
    got = pq.read_table(str(out) + "/data").to_pandas() \
        .set_index("doc_id")["text"]
    for doc_id, text in expected.items():
        assert got[doc_id] == text


def test_cli_asr_pipeline(ray_session, tmp_path, capsys):
    import os

    from docling_ray.__main__ import main
    from docling_ray.sources.audio import (expected_transcript,
                                           make_audio_table)

    src, out = tmp_path / "audio", tmp_path / "asr_out"
    os.makedirs(str(src))
    table, expected = make_audio_table(5, seed=9)
    pq.write_table(table, str(src / "audio.parquet"))
    rc = main(["convert", str(src), "-o", str(out)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pipeline"] == "asr" and stats["rows_done"] == 5
    got = pq.read_table(str(out / "data")).to_pandas().set_index("doc_id")
    for doc_id, utterances in expected.items():
        assert got.loc[doc_id, "text"] == expected_transcript(utterances)
        assert got.loc[doc_id, "status"] == "success"
    # resumable: a re-run skips the done shard and duplicates nothing
    rc = main(["convert", str(src), "-o", str(out)])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["shards_processed"] == 0
    assert len(pq.read_table(str(out / "data"))) == 5

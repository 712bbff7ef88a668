"""`docling_ray curate` CLI: the composed corpus chain end-to-end with
checkpointed resume, driven through the argparse entry point."""

import glob
import json


def test_cli_curate_and_resume(ray_session, tmp_path, capsys):
    from docling_ray.__main__ import main
    from docling_ray.sources.webpages import write_corpus

    src = tmp_path / "corpus"
    out = tmp_path / "curated"
    write_corpus(str(src), 150, seed=3, rows_per_file=50)

    rc = main(["curate", str(src), "-o", str(out), "--num-cpus", "4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_chunks"] > 0
    assert set(stats["timings"]) >= {"extract_sec", "dedup_sec",
                                     "minhash_sec", "chunks_sec"}
    chunk_files = glob.glob(str(out / "chunks" / "*.parquet"))
    assert chunk_files

    # resume: all stage markers present → instant, identical output
    rc2 = main(["curate", str(src), "-o", str(out), "--num-cpus", "4"])
    assert rc2 == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["n_chunks"] == stats["n_chunks"]
    # the pytest session's Ray must survive the CLI call (owns_session
    # guard) — anything after this line would explode otherwise
    import ray

    assert ray.is_initialized()

"""WARC reader (sources/warc.py + stages/scan.py::warc_explode)."""

import hashlib

import pyarrow as pa

from docling_ray.sources.warc import (_frame_record, make_warc_table,
                                      parse_warc)


def test_parse_warc_roundtrip_plain_and_gzip():
    html = b"<html><body>hi \xe2\x80\x94 there</body></html>"
    for gz in (False, True):
        raw = _frame_record("https://x.example/a", "2024-01-01T00:00:00Z",
                            html, gz)
        recs = parse_warc(raw)
        assert len(recs) == 1
        assert recs[0]["url"] == "https://x.example/a"
        assert recs[0]["html"] == html


def test_parse_warc_skips_warcinfo_and_handles_binary_payload():
    # payload containing CRLFCRLF and fake WARC/ header bytes must not
    # confuse the Content-Length-driven walk
    tricky = b"x\r\n\r\nWARC/1.0\r\n\r\ny" * 3
    raw = (_frame_record("u1", "d", tricky, False)
           + _frame_record("u2", "d", b"ok", False))
    recs = parse_warc(raw)
    assert [r["url"] for r in recs] == ["u1", "u2"]
    assert recs[0]["html"] == tricky


def test_parse_warc_malformed_tail_is_data_not_exception():
    good = _frame_record("u", "d", b"body", False)
    recs = parse_warc(good + b"GARBAGE NOT A RECORD")
    assert len(recs) == 1 and recs[0]["html"] == b"body"


def test_warc_explode_matches_generator(ray_session):
    import ray

    from docling_ray.sources.webpages import make_rows
    from docling_ray.stages.scan import warc_explode

    t = make_warc_table(40, seed=42, records_per_chunk=7)
    got = {r["url"]: hashlib.md5(r["html"]).hexdigest()
           for r in warc_explode(
               ray.data.from_arrow(t).repartition(3)).take_all()}
    data = make_rows(0, 40, seed=42)
    exp = {u: hashlib.md5(h).hexdigest()
           for u, h in zip(data["url"], data["html"])}
    assert got == exp


def test_parse_warc_adversarial_negative_length_and_corrupt_gzip():
    from docling_ray.sources.warc import parse_warc, _frame_record

    # negative Content-Length must not walk backwards (infinite loop)
    evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: u\r\nContent-Length: -38\r\n\r\n")
    assert parse_warc(_frame_record("ok", "d", b"x", False) + evil) \
        and len(parse_warc(evil)) == 0
    # a valid gzip member followed by corrupt bytes yields the good
    # records and stops — never raises
    good = _frame_record("u", "d", b"body", True)
    recs = parse_warc(good + b"GARBAGE-NOT-GZIP")
    assert len(recs) == 1 and recs[0]["html"] == b"body"


def test_parse_warc_stats_truncation_is_visible_data():
    """A corrupt mid-chunk record yields the good-prefix rows PLUS a
    visible truncation count — never a silently shorter output."""
    from docling_ray.sources.warc import parse_warc_stats

    g1 = _frame_record("u1", "d", b"one", False)
    g2 = _frame_record("u2", "d", b"two", False)

    # clean chunk: zero truncation, records counted incl. non-response
    recs, s = parse_warc_stats(g1 + g2)
    assert [r["url"] for r in recs] == ["u1", "u2"]
    assert s == {"n_records": 2, "n_responses": 2, "n_truncated": 0}

    # garbage between two good records: good prefix + truncated flag
    recs, s = parse_warc_stats(g1 + b"GARBAGE NOT A RECORD" + g2)
    assert [r["url"] for r in recs] == ["u1"]
    assert s == {"n_records": 1, "n_responses": 1, "n_truncated": 1}

    # body cut short by the chunk boundary: the partial payload is NOT
    # emitted as a page and the cut is flagged
    recs, s = parse_warc_stats(g1 + g2[:-10])
    assert [r["url"] for r in recs] == ["u1"]
    assert s["n_truncated"] == 1 and s["n_responses"] == 1

    # corrupt gzip member after a good one
    gz = _frame_record("u", "d", b"body", True)
    recs, s = parse_warc_stats(gz + b"GARBAGE-NOT-GZIP")
    assert len(recs) == 1 and s["n_truncated"] == 1

    # negative Content-Length
    evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: u\r\nContent-Length: -38\r\n\r\n")
    recs, s = parse_warc_stats(evil)
    assert recs == [] and s["n_truncated"] == 1


def test_warc_chunk_stats_stage(ray_session):
    import ray

    from docling_ray.stages.scan import warc_chunk_stats

    g1 = _frame_record("u1", "d", b"one", False)
    g2 = _frame_record("u2", "d", b"two", False)
    t = pa.table({
        "chunk_id": pa.array([0, 1, 2], pa.int64()),
        "warc": pa.array([g1 + g2,                      # clean
                          g1 + b"XX" + g2,              # mid-chunk junk
                          None],                        # null chunk
                         pa.large_binary())})
    got = {r["chunk_id"]: (r["n_records"], r["n_responses"],
                           r["n_truncated"])
           for r in warc_chunk_stats(
               ray.data.from_arrow(t).repartition(2)).take_all()}
    assert got == {0: (2, 2, 0), 1: (1, 1, 1), 2: (0, 0, 1)}

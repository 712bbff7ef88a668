"""PII redaction, JSON field extraction, running totals."""

import pyarrow as pa

from docling_ray.stages.privacy import pii_redact_batch, pii_scan_batch
from docling_ray.stages.semistructured import json_field_batch


def test_pii_scan_counts():
    t = pa.table({"text": [
        "mail a@b.com and c.d@e.org now",
        "call 555-0142 or 555.9999",
        "host 10.0.3.25 and 192.168.1.1",
        "clean text",
        None,
    ]})
    out = pii_scan_batch(t).to_pylist()
    assert [r["n_email"] for r in out] == [2, 0, 0, 0, 0]
    assert [r["n_phone"] for r in out] == [0, 2, 0, 0, 0]
    assert [r["n_ipv4"] for r in out] == [0, 0, 2, 0, 0]


def test_pii_redact_masks_in_fixed_order():
    t = pa.table({"text": ["a@b.com 555-0142 10.0.0.1 end", None]})
    out = pii_redact_batch(t).to_pylist()
    assert out[0]["redacted"] == "[EMAIL] [PHONE] [IPV4] end"
    assert out[1]["redacted"] is None
    # order matters: the email rule runs first, so a dotted-letter domain
    # is claimed as [EMAIL] before the ipv4 rule can see its dots; a
    # numeric "domain" has no alphabetic TLD, is no email, and each
    # dotted quad falls through to the ipv4 rule
    t2 = pa.table({"text": ["a x1@b.cd.ee y", "x 1.2.3.4@5.6.7.8 y"]})
    got = pii_redact_batch(t2)["redacted"].to_pylist()
    assert got[0] == "a [EMAIL] y"
    assert got[1] == "x [IPV4]@[IPV4] y"


def test_json_field_contracts():
    # TYPE-STRICT (the json_type SQL-mirror contract): int64 accepts
    # JSON integers only — "12", 7.9, 1e3 and true are all NULL
    t = pa.table({"props": [
        '{"k": 7}', '{"k": "12"}', '{"other": 1}', "not json",
        None, '[1,2]', '{"k": null}', '{"k": {"nested": 1}}',
        '{"k": 7.9}', '{"k": true}', '{"k": 1e3}', '{"k": -4}',
        '{"k": 18446744073709551615}',
    ]})
    out = json_field_batch(t, "props", "k", out_column="k")
    assert out["k"].to_pylist() == [7, None, None, None, None, None,
                                    None, None, None, None, None, -4,
                                    None]
    f = json_field_batch(t, "props", "k", out_column="kf",
                         out_type="float64")
    assert f["kf"].to_pylist()[0] == 7.0 and f["kf"].to_pylist()[8] == 7.9
    assert f["kf"].to_pylist()[10] == 1000.0
    assert f["kf"].to_pylist()[9] is None          # bool is not a number
    s = json_field_batch(t, "props", "k", out_column="ks",
                         out_type="string")
    assert s["ks"].to_pylist()[0] is None          # numbers not stringified
    s2 = json_field_batch(pa.table({"props": ['{"k": "x"}']}),
                          "props", "k", out_column="ks",
                          out_type="string")
    assert s2["ks"].to_pylist() == ["x"]


def _events(ray, rows, parts=3):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    return ray.data.from_arrow(t).repartition(parts)


def test_running_totals_known_values(ray_session):
    import ray

    from docling_ray.stages.sessions import running_totals

    rows = [
        (1, 10, 100, 1.50), (2, 10, 200, 2.25), (3, 10, 300, 0.10),
        (4, 20, 100, 5.00),
        (5, 30, 100, None),          # null amount counts as 0
        (6, None, 100, 1.0),         # null user dropped
    ]
    out = running_totals(_events(ray, rows))
    got = {r["event_id"]: (r["running_n"], r["running_centi"])
           for r in out.take_all()}
    assert got[1] == (1, 150) and got[2] == (2, 375) and got[3] == (3, 385)
    assert got[4] == (1, 500)
    assert got[5] == (1, 0)
    assert 6 not in got


def test_running_totals_tie_breaks_on_id(ray_session):
    import ray

    from docling_ray.stages.sessions import running_totals

    # same user, same ts: event_id ASC decides the prefix order
    rows = [(9, 1, 100, 1.0), (3, 1, 100, 2.0), (7, 1, 100, 4.0)]
    out = running_totals(_events(ray, rows, parts=2))
    got = {r["event_id"]: r["running_centi"] for r in out.take_all()}
    assert got[3] == 200 and got[7] == 600 and got[9] == 700


def test_running_totals_partition_invariant(ray_session):
    import ray

    from docling_ray.stages.sessions import running_totals

    import numpy as np
    rng = np.random.default_rng(5)
    rows = [(i, int(rng.integers(0, 9)), int(rng.integers(0, 50)) * 10,
             float(rng.uniform(-3, 3))) for i in range(300)]
    a = sorted(running_totals(_events(ray, rows, parts=1)).take_all(),
               key=lambda r: r["event_id"])
    b = sorted(running_totals(_events(ray, rows, parts=11)).take_all(),
               key=lambda r: r["event_id"])
    assert a == b

"""Inverted-index construction (stages/index.py)."""

import hashlib

import pyarrow as pa


def _expect(docs):
    # pure-python reference: term -> {doc: tf}
    from collections import Counter, defaultdict

    m = defaultdict(dict)
    for did, text in docs:
        for t, c in Counter((text or "").split()).items():
            m[t][did] = c
    out = {}
    for t, post in m.items():
        items = sorted(post.items())
        s = ",".join(f"{d}:{c}" for d, c in items)
        out[t] = (len(items), sum(post.values()),
                  hashlib.md5(s.encode()).hexdigest())
    return out


def _run(ray, docs, parts=3, **kw):
    from docling_ray.stages.index import inverted_index

    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})
    ds = ray.data.from_arrow(t).repartition(parts)
    return {r["term"]: (r["df"], r["n_occurrences"], r["postings_md5"])
            for r in inverted_index(ds, **kw).take_all()}


def test_inverted_index_known(ray_session):
    import ray

    docs = [(0, "a b a"), (1, "b c"), (2, "a"), (3, ""), (4, None)]
    got = _run(ray, docs)
    assert got == _expect(docs)
    assert got["a"][0] == 2 and got["a"][1] == 3
    assert got["b"][0] == 2 and got["c"][0] == 1


def test_inverted_index_partition_invariance(ray_session):
    import ray

    docs = [(i, f"tok{i % 5} shared tok{i % 3} shared") for i in range(40)]
    a = _run(ray, docs, parts=1)
    b = _run(ray, docs, parts=8)
    assert a == b == _expect(docs)
    assert a["shared"][0] == 40 and a["shared"][1] == 80


def test_inverted_index_max_df(ray_session):
    import ray

    docs = [(i, "common rare" if i == 0 else "common") for i in range(10)]
    got = _run(ray, docs, max_df=5)
    assert "common" not in got and got["rare"][0] == 1


def test_bow_search_known_scores(ray_session):
    import ray

    from docling_ray.stages.index import bow_search

    docs = [(0, "x x y"), (1, "x z"), (2, "y y y"), (3, "w")]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})
    ds = ray.data.from_arrow(t).repartition(2)
    got = [(r["doc_id"], r["score_u"])
           for r in bow_search(ds, ["x", "y"], k=3).take_all()]
    # df(x)=2, df(y)=2; scores: d0 = 2e6//2 + 1e6//2 = 1_500_000,
    # d2 = 3e6//2 = 1_500_000, d1 = 1e6//2 = 500_000; tie d0<d2 by id
    assert got == [(0, 1_500_000), (2, 1_500_000), (1, 500_000)]


def test_bow_search_k_and_partition_invariance(ray_session):
    import ray

    from docling_ray.stages.index import bow_search

    docs = [(i, " ".join(["alpha"] * (i % 4) + ["beta"] * (i % 3)))
            for i in range(30)]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})
    a = [(r["doc_id"], r["score_u"]) for r in bow_search(
        ray.data.from_arrow(t), ["alpha", "beta"], k=5).take_all()]
    b = [(r["doc_id"], r["score_u"]) for r in bow_search(
        ray.data.from_arrow(t).repartition(7), ["alpha", "beta"],
        k=5).take_all()]
    assert a == b and len(a) == 5
    assert all(a[i][1] >= a[i + 1][1] for i in range(4))

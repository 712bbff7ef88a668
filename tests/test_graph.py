"""PageRank over edge Datasets (stages/graph.py)."""

import numpy as np
import pyarrow as pa


def _pyref(E, nodes, iters=3):
    import collections

    deg = collections.Counter(u for u, _ in E)
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        s = collections.Counter()
        for u, v in E:
            if deg[u] > 0:
                s[v] += r[u] // deg[u]
        r = {n: 150_000 + (85 * s.get(n, 0)) // 100 for n in nodes}
    return r


def _run(ray, E, parts=3, iters=3, P=8):
    from docling_ray.stages.graph import pagerank

    t = pa.table({"src": pa.array([u for u, _ in E], pa.int64()),
                  "dst": pa.array([v for _, v in E], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(parts)
    out = pagerank(ds, num_iters=iters, num_partitions=P)
    return {r["node"]: r["rank_u"] for r in out.take_all()}


def test_pagerank_matches_reference(ray_session):
    import ray

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 3)]
    got = _run(ray, E)
    assert got == _pyref(E, {0, 1, 2, 3})


def test_pagerank_random_graph_and_partition_invariance(ray_session):
    import ray

    rng = np.random.default_rng(7)
    E = [(int(u), int(v))
         for u, v in rng.integers(0, 50, size=(300, 2))]
    nodes = {u for u, _ in E} | {v for _, v in E}
    a = _run(ray, E, parts=1, P=4)
    b = _run(ray, E, parts=7, P=16)
    assert a == b == _pyref(E, nodes)


def test_pagerank_dangling_and_sink_nodes(ray_session):
    import ray

    # node 9 has no out-edges (dangling: contributes nothing but is a
    # node); node 5 appears only as src
    E = [(5, 9), (5, 9)]
    got = _run(ray, E, iters=2)
    r = _pyref(E, {5, 9}, iters=2)
    assert got == r
    assert got[5] == 150_000  # nothing points at 5


def test_seeded_doc_edges_deterministic(ray_session):
    import ray

    from docling_ray.stages.graph import seeded_doc_edges

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64())})
    a = sorted((r["src"], r["dst"]) for r in
               seeded_doc_edges(ray.data.from_arrow(t).repartition(2),
                                n_nodes=4).take_all())
    b = sorted((r["src"], r["dst"]) for r in
               seeded_doc_edges(ray.data.from_arrow(t),
                                n_nodes=4).take_all())
    assert a == b and len(a) == 12
    assert all(0 <= v < 4 for _, v in a)


# -- outlink extraction -------------------------------------------------------


def test_outlinks_kernel_rules():
    from docling_ray.kernels.outlinks import outlinks_of

    html = (b"<html><body>"
            b'<p>see <a href="/a">first  link</a> and '
            b'<a href="https://x.example/b"><b>bold</b> text</a></p>'
            b'<a>no href</a>'
            b'<script>var a = "<a href=\'/fake\'>x</a>";</script>'
            b'<div hidden><a href="/hidden">nope</a></div>'
            b'<nav hidden><a href="/nav">nope</a></nav>'
            b"</body></html>")
    got = outlinks_of(html)
    assert got == [("/a", "first link"),
                   ("https://x.example/b", "bold text")]


def test_outlinks_match_generator_true_golden(ray_session):
    import ray

    from docling_ray.sources.webpages import (make_expected_outlinks_table,
                                              make_table)
    from docling_ray.stages.graph import extract_outlinks

    web = ray.data.from_arrow(make_table(60, seed=42)).repartition(4)
    got = sorted(
        (r["url"], r["link_idx"], r["href"], r["anchor_text"])
        for r in extract_outlinks(web).take_all())
    exp = sorted(zip(*[make_expected_outlinks_table(60, seed=42)[c]
                       .to_pylist()
                       for c in ("url", "link_idx", "href",
                                 "anchor_text")]))
    assert got == exp and len(got) > 0


def test_pagerank_huge_ids_beyond_float53(ray_session):
    import ray

    # md5-style node ids exceed 2^53: any int64→float64 round-trip in
    # the message-table extraction corrupts them (the nullable-column
    # to_numpy trap) — this is the regression guard
    A, B, C = 4856848096376015040, -4465223803114542807, \
        -8788520022508386332
    E = [(A, B), (C, B), (C, A + 1)]
    got = _run(ray, E, parts=2, iters=3, P=8)
    assert got == _pyref(E, {A, B, C, A + 1})
    assert got[B] > 150_000 and got[A + 1] > 150_000


def test_anchor_text_index_matches_golden(ray_session):
    import ray

    from docling_ray.sources.webpages import make_table
    from docling_ray.stages.graph import anchor_text_index, extract_outlinks
    import pyarrow.parquet as pq
    import os

    web = ray.data.from_arrow(make_table(120, seed=42)).repartition(4)
    got = sorted((r["target"], r["n_anchors"], r["anchors_md5"])
                 for r in anchor_text_index(
                     extract_outlinks(web)).take_all())
    gold = pq.read_table(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "golden_anchor_text.parquet"))
    exp = sorted(zip(gold["target"].to_pylist(),
                     gold["n_anchors"].to_pylist(),
                     gold["anchors_md5"].to_pylist()))
    assert got == exp and len(got) > 0


def test_outlinks_nested_and_hidden_anchor_text():
    from docling_ray.kernels.outlinks import outlinks_of

    # this DOM does NOT auto-close <a>, so nested anchors exist in
    # crawl HTML with unclosed tags: both links must be found, the
    # outer text including the inner (what the DOM renders)
    got = outlinks_of(b'<a href="/x">one <a href="/y">two</a></a>')
    assert got == [("/x", "one two"), ("/y", "two")]
    # an href-less anchor still descends to its nested link
    assert outlinks_of(b'<a>outer<a href="/in">inner</a></a>') == [
        ("/in", "inner")]
    # hidden/script content inside an anchor must not leak into the
    # ranking signal
    assert outlinks_of(
        b'<a href="/x">go<span hidden>secret</span>'
        b"<script>var z;</script> on</a>") == [("/x", "go on")]


# -- crawl-side url operators (stages/urls.py additions) ----------------------


def test_robots_filter_longest_prefix_wins():
    import pyarrow as pa

    from docling_ray.stages.urls import robots_filter_batch

    rules = [("https://a.com/private/pub/", True),
             ("https://a.com/private/", False),
             ("https://b.com/", False)]
    t = pa.table({"url": pa.array([
        "https://a.com/private/secret",       # denied
        "https://a.com/private/pub/ok",       # allow overrides (longer)
        "https://a.com/open",                 # default allow
        "https://b.com/anything",             # host-denied
        None,                                 # null → no match → allow
    ])})
    got = robots_filter_batch(t, rules, "url")["allowed"].to_pylist()
    assert got == [False, True, True, False, True]


def test_fetch_schedule_ranks(ray_session):
    import ray
    import pyarrow as pa

    from docling_ray.stages.urls import fetch_schedule

    t = pa.table({"doc_id": pa.array([5, 3, 9, 1, 7], pa.int64()),
                  "source": pa.array(["a", "a", "b", "a", None])})
    out = fetch_schedule(ray.data.from_arrow(t).repartition(2),
                         delay_ms=100)
    got = sorted((r["source"], r["doc_id"], r["slot"], r["start_ms"])
                 for r in out.take_all())
    assert got == [("a", 1, 0, 0), ("a", 3, 1, 100), ("a", 5, 2, 200),
                   ("b", 9, 0, 0)]


def test_robots_filter_dataset_keep_only(ray_session):
    import ray
    import pyarrow as pa

    from docling_ray.stages.urls import robots_filter

    t = pa.table({"url": pa.array(
        ["https://a.com/private/x", "https://a.com/ok",
         "https://b.com/y"])})
    rules = [("https://a.com/private/", False)]
    flagged = {r["url"]: r["allowed"] for r in robots_filter(
        ray.data.from_arrow(t).repartition(2), rules,
        url_col="url").take_all()}
    assert flagged == {"https://a.com/private/x": False,
                       "https://a.com/ok": True,
                       "https://b.com/y": True}
    kept = sorted(r["url"] for r in robots_filter(
        ray.data.from_arrow(t), rules, url_col="url",
        keep_only=True).take_all())
    assert kept == ["https://a.com/ok", "https://b.com/y"]


def test_resolve_href_column_agrees_with_scalar_policy():
    """The vectorized column resolver is byte-identical to the scalar
    `_resolve_href` policy on every rule branch and edge case."""
    import pyarrow as pa

    from docling_ray.stages.graph import (_node_id_of, _node_ids_column,
                                          _resolve_href, 
                                          _resolve_href_column)

    cases = [
        ("http://a.com/p", "https://b.com/x"),   # absolute passes
        ("http://a.com/p", "http://c.com"),
        ("http://a.com/p/q", "/root/rel"),       # root-relative joins
        ("https://h.io", "/x"),
        ("http://a.com", "//proto.rel/x"),       # protocol-relative drops
        ("http://a.com", "rel/path"),            # path-relative drops
        ("http://a.com", "#frag"),
        ("http://a.com", "mailto:x@y.z"),
        ("", "/x"),                              # empty url drops
        (None, "/x"),
        ("http://a.com", ""),                    # empty href drops
        ("http://a.com", None),
        ("not a url", "/x"),                     # degenerate origin rule
    ]
    urls = pa.array([u for u, _ in cases], pa.string())
    hrefs = pa.array([h for _, h in cases], pa.string())
    valid, target = _resolve_href_column(urls, hrefs)
    got = [(bool(v), t if bool(v) else None)
           for v, t in zip(valid.to_pylist(), target.to_pylist())]
    want = []
    for u, h in cases:
        r = _resolve_href(u, h)
        want.append((r is not None, r))
    assert got == want

    import numpy as np
    tgts = np.array([t for ok, t in want if ok])
    ids = _node_ids_column(tgts)
    assert ids.tolist() == [_node_id_of(t) for t in tgts]


def test_pagerank_persisted_identical_to_exchange(ray_session):
    """The persisted-edge shard-actor backend is bit-identical to the
    Dataset-native exchange backend: random graph, dangling nodes,
    >2^53 md5 node ids, and P=1 degenerate sharding."""
    import ray

    from docling_ray.stages.graph import pagerank_persisted

    def run_p(E, parts=3, iters=3, P=4):
        t = pa.table({"src": pa.array([u for u, _ in E], pa.int64()),
                      "dst": pa.array([v for _, v in E], pa.int64())})
        ds = ray.data.from_arrow(t).repartition(parts)
        out = pagerank_persisted(ds, num_iters=iters, num_partitions=P)
        return {r["node"]: r["rank_u"] for r in out.take_all()}

    rng = np.random.default_rng(11)
    E = [(int(u), int(v))
         for u, v in rng.integers(0, 40, size=(200, 2))]
    nodes = {u for u, _ in E} | {v for _, v in E}
    assert run_p(E) == _pyref(E, nodes) == _run(ray, E)

    A, B, C = 4856848096376015040, -4465223803114542807, \
        -8788520022508386332
    E2 = [(A, B), (C, B), (C, A + 1), (B, B)]
    assert run_p(E2, P=3) == run_p(E2, P=1) \
        == _pyref(E2, {A, B, C, A + 1})

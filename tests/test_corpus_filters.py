"""Corpus-curation operators: per-domain cap, benchmark decontamination,
deterministic hash sampling (docling_ray/stages/corpus_filters.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from docling_ray.stages.corpus_filters import (DecontaminateStage,
                                               _top_n_per_domain,
                                               build_benchmark_grams,
                                               domain_cap, hash_sample,
                                               hash_sample_batch,
                                               text_ngrams)


def _doc_table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows]),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })


# -- domain cap -------------------------------------------------------------

def test_top_n_per_domain_rank_and_ties():
    t = _doc_table([
        (1, "a", 10), (2, "a", 30), (3, "a", 30), (4, "a", 5),
        (5, "b", 7),
    ])
    out = _top_n_per_domain(t, "source", "n_chars", "doc_id", 2)
    got = sorted(zip(out["source"].to_pylist(), out["doc_id"].to_pylist()))
    # ties on n_chars=30 break by doc_id ASC: 2 before 3; 4 (n=5) is cut
    assert got == [("a", 2), ("a", 3), ("b", 5)]


def test_domain_cap_matches_global_rank(ray_session):
    import ray

    rng = np.random.default_rng(11)
    n = 400
    rows = [(i, f"d{int(rng.integers(0, 7))}", int(rng.integers(0, 50)))
            for i in range(n)]
    ds = ray.data.from_arrow(_doc_table(rows)).repartition(13)
    out = domain_cap(ds, n=3).take_all()

    # oracle: plain-python global rank per domain
    import collections
    by_dom = collections.defaultdict(list)
    for i, d, c in rows:
        by_dom[d].append((-c, i))
    expect = {(d, i) for d, lst in by_dom.items()
              for _, i in sorted(lst)[:3]}
    assert {(r["source"], r["doc_id"]) for r in out} == expect


def test_domain_cap_skewed_domain_bounded(ray_session):
    """One domain holds 90% of rows; the cap still returns exactly n for
    it, and the combiner guarantees the shuffle carried at most
    n×num_batches rows for that domain (structural property of
    _candidates — asserted via the final output being exact)."""
    import ray

    rows = [(i, "hot" if i % 10 else "cold", i % 97) for i in range(500)]
    ds = ray.data.from_arrow(_doc_table(rows)).repartition(11)
    out = domain_cap(ds, n=4).take_all()
    hot = sorted(r["doc_id"] for r in out if r["source"] == "hot")
    expect_hot = [i for _, i in sorted(
        (-(i % 97), i) for i in range(500) if i % 10)[:4]]
    assert hot == sorted(expect_hot)
    assert len([r for r in out if r["source"] == "cold"]) == 4


# -- decontamination --------------------------------------------------------

def test_text_ngrams_re2_whitespace():
    # NBSP is NOT RE2 \s: "naïve\xa0café" stays one token
    assert text_ngrams("naïve\xa0café bon jour", 2) == {
        "naïve\xa0café bon", "bon jour"}
    assert text_ngrams("a b", 3) == set()
    assert text_ngrams("", 2) == set()


def test_decontaminate_stage_drops_overlap():
    bench = build_benchmark_grams(["the quick brown fox jumps"], n=3)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a quick brown fox here",      # shares "quick brown fox"
                 "totally unrelated words here",
                 None],                          # null text → no grams
    })
    st = DecontaminateStage(bench, n=3)
    out = st(batch)
    assert out["doc_id"].to_pylist() == [2, 3]
    audit = DecontaminateStage(bench, n=3, invert=True)(batch)
    assert audit["doc_id"].to_pylist() == [1]


def test_decontaminate_dataset_broadcast(ray_session):
    import ray

    bench = build_benchmark_grams(["one two three four five"], n=4)
    ref = ray.put(bench)
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": ["one two three four six",        # hit: "one two three four"
                 "zero one two three four",       # hit: "one two three four"
                 "nothing in common", "", "x y z w",
                 "two three four five and more"],  # hit
    })
    from docling_ray.stages.corpus_filters import decontaminate

    out = decontaminate(ray.data.from_arrow(docs), ref, n=4).take_all()
    assert sorted(r["doc_id"] for r in out) == [2, 3, 4]


# -- hash sampling ----------------------------------------------------------

def test_hash_sample_batch_threshold_exact():
    batch = pa.table({"doc_id": pa.array(list(range(1000)), pa.int64())})
    out = hash_sample_batch(batch, rate=0.25)
    for i, h in zip(out["doc_id"].to_pylist(), out["h32"].to_pylist()):
        assert h == int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:4], "big")
        assert h < 0.25 * 2**32
    # every excluded id is genuinely above threshold
    kept = set(out["doc_id"].to_pylist())
    for i in range(1000):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
        assert (h < 0.25 * 2**32) == (i in kept)
    # rate is approximately honored on 1000 ids
    assert 180 <= len(kept) <= 320


def test_hash_sample_partition_invariant(ray_session):
    """The sample is a function of the id alone — identical survivor set
    at any partitioning (the property that makes it safe to resume or
    re-run on a different cluster size)."""
    import ray

    t = pa.table({"doc_id": pa.array(list(range(500)), pa.int64())})
    a = {r["doc_id"] for r in
         hash_sample(ray.data.from_arrow(t).repartition(3), 0.1).take_all()}
    b = {r["doc_id"] for r in
         hash_sample(ray.data.from_arrow(t).repartition(17), 0.1).take_all()}
    assert a == b and len(a) > 0


@pytest.mark.parametrize("rate,lo,hi", [(0.0, 0, 0), (1.0, 100, 100)])
def test_hash_sample_rate_edges(rate, lo, hi):
    batch = pa.table({"doc_id": pa.array(list(range(100)), pa.int64())})
    out = hash_sample_batch(batch, rate=rate)
    assert lo <= out.num_rows <= hi


# -- top-k tokens -----------------------------------------------------------

from docling_ray.stages.textstats import (token_count_partial,  # noqa: E402
                                          top_k_tokens)


def test_token_count_partial_re2_and_empties():
    batch = pa.table({"text": ["a b  a", " a\t", None, ""]})
    out = token_count_partial(batch)
    got = dict(zip(out["token"].to_pylist(), out["n"].to_pylist()))
    assert got == {"a": 3, "b": 1}


def test_top_k_tokens_ties_and_truncation(ray_session):
    import ray

    # vocabulary > k, counts engineered: z×5, m×3, a×3, rest ×1
    docs = (["z z z z z"] + ["m a"] * 3
            + [f"w{i}" for i in range(10)])
    ds = ray.data.from_arrow(pa.table({"text": docs})).repartition(5)
    out = top_k_tokens(ds, k=4)
    rows = list(zip(out["token"].to_pylist(), out["n"].to_pylist()))
    # ties at n=3 break token-ASC: 'a' before 'm'; then the first w/1 token
    assert rows[:3] == [("z", 5), ("a", 3), ("m", 3)]
    assert len(rows) == 4 and rows[3][1] == 1 and rows[3][0] == "w0"


def test_domain_cap_preserves_payload_columns(ray_session):
    import ray

    t = _doc_table([(1, "a", 10), (2, "a", 20), (3, "b", 5)])
    t = t.append_column("payload", pa.array(["x", "y", "z"]))
    out = domain_cap(ray.data.from_arrow(t), n=1).take_all()
    got = {(r["source"], r["doc_id"], r["payload"]) for r in out}
    assert got == {("a", 2, "y"), ("b", 3, "z")}


def test_domain_cap_null_domain_forms_capped_group(ray_session):
    """NULL domains are a GROUP (like the SQL mirror's PARTITION BY null
    partition), never silently dropped (review r4)."""
    import ray

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "source": pa.array(["a", None, None, None, "a"]),
        "n_chars": pa.array([10, 30, 20, 40, 5], pa.int64()),
    })
    out = domain_cap(ray.data.from_arrow(t), n=2).take_all()
    got = {(r["source"], r["doc_id"]) for r in out}
    assert got == {("a", 1), ("a", 5), (None, 4), (None, 2)}


def test_hash_sample_null_id_excluded():
    """A null id is excluded like its SQL mirror (md5(NULL) is NULL →
    the WHERE drops the row) — never a crash (review r4)."""
    batch = pa.table({"doc_id": pa.array(["x", None, "y"], pa.string())})
    out = hash_sample_batch(batch, rate=1.0)
    assert out["doc_id"].to_pylist() == ["x", "y"]


# -- Gopher quality rules ----------------------------------------------------

def test_gopher_stats_each_rule_fires():
    """One crafted doc per rule: the pass flag flips for exactly the
    intended violation, counters are integer-exact."""
    import pyarrow as pa

    from docling_ray.stages.textstats import gopher_stats_batch

    good = "the quick brown foxes jumped with delight over that lazy dog " \
           "and every word here have plenty of letters to clear bands"
    docs = {
        "good": good,
        "too_short": "the cat with that have",                   # < 10 toks
        "short_words": "a b c d e f g h i j k l m n o p",        # mean < 3
        "long_words": ("the "
                       + "pneumonoultramicroscopics " * 12
                       + "be of that have with"),                # mean > 10
        "symbols": good + " " + "# " * 40,                       # sym ratio
        "numeric": "the 111 222 333 444 555 666 777 888 999 000 "
                   "111 222 be with that",                       # alpha < .8
        "no_stopwords": "quick brown foxes jumped gleefully over "
                        "lazy dogs during autumn morning walks",  # stop < 2
        # one stop word repeated: distinct count is 1, must fail (Rae et
        # al. require >= 2 OF the listed words, not 2 occurrences)
        "one_stopword": "the quick brown foxes jumped gleefully over "
                        "lazy dogs during the autumn morning walks",
        "bullets": "\n".join("- item the with that be of" for _ in range(10)),
        "ellipses": "\n".join("the end with that be of..."
                              for _ in range(10)),
    }
    t = pa.table({"name": pa.array(list(docs)),
                  "text": pa.array(list(docs.values()))})
    out = gopher_stats_batch(t, min_tokens=10)
    flags = dict(zip(out["name"].to_pylist(),
                     out["gopher_pass"].to_pylist()))
    assert flags == {k: (1 if k == "good" else 0) for k in docs}, flags

    row = {c: out[c][0].as_py() for c in out.column_names}
    assert row["n_tokens"] == len(good.split())
    assert row["n_alpha_tokens"] == len(good.split())
    assert row["n_stopwords"] >= 2 and row["n_symbols"] == 0


# -- URL canonicalization -----------------------------------------------------

def test_canonical_url_rules():
    import pyarrow as pa

    from docling_ray.stages.urls import canonical_url_batch

    cases = {
        # case-fold scheme+host, keep path case, strip :443, utm, #frag;
        # trailing path slash collapses even when a query follows
        "HTTPS://WWW.Ex.COM:443/Path/?utm_s=1&id=2&utm_c=3#frag":
            "https://www.ex.com/Path?id=2",
        "http://a.b:80/x/": "http://a.b/x",
        "http://a.b/x": "http://a.b/x",
        "https://Q.com/?utm_a=1&utm_b=2": "https://q.com",
        "https://q.com": "https://q.com",
        # :8080 is NOT a default port — kept
        "http://h.io:8080/y": "http://h.io:8080/y",
        # default-port strip is scheme-aware: :80 on https (and :443 on
        # http) are NON-default ports and must be kept
        "https://a.com:80/x": "https://a.com:80/x",
        "http://a.com:443/x": "http://a.com:443/x",
        # a query string ending in '/' is data, not a path separator
        "https://a.com/p?q=x/": "https://a.com/p?q=x/",
        # non-urls pass through unchanged, null -> ''
        "not a url": "not a url",
        None: "",
    }
    t = pa.table({"url": pa.array(list(cases.keys()), pa.string())})
    got = canonical_url_batch(t)["canon_url"].to_pylist()
    assert got == list(cases.values())


def test_bottom_k_sample_partition_invariant(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data

    from docling_ray.stages.corpus_filters import bottom_k_sample

    t = pa.table({"doc_id": pa.array(range(500), pa.int64()),
                  "lang": pa.array([f"l{i % 5}" for i in range(500)])})
    a = bottom_k_sample(ray.data.from_arrow(t), k=20,
                        columns=["doc_id", "lang"])
    b = bottom_k_sample(ray.data.from_arrow(t).repartition(9), k=20,
                        columns=["doc_id", "lang"])
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    # exactly the 20 globally-smallest hashes, verified independently
    h = sorted(range(500), key=lambda i: int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[:4], "big"))[:20]
    assert sorted(a["doc_id"].to_pylist()) == sorted(h)
    # k larger than the corpus returns everything
    small = bottom_k_sample(ray.data.from_arrow(t.slice(0, 7)), k=20,
                            columns=["doc_id", "lang"])
    assert small.num_rows == 7

"""New curation operators: C4 line/page filters (stages/c4.py),
DSIR integer-exact importance selection (stages/dsir.py), combiner-first
grouped top-k (stages/grouping.grouped_topk)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from docling_ray.stages.c4 import c4_filter, c4_stats_batch
from docling_ray.stages.dsir import (dsir_score_batch, dsir_select,
                                     dsir_weights)
from docling_ray.stages.grouping import _topk_partial, grouped_topk


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


# -- C4 --------------------------------------------------------------------

def test_c4_line_rules():
    t = _docs(["This line has five good words.\n"
               "short one.\n"
               "no terminal punctuation on this line\n"
               "enable javascript to view this page.\n"
               "Another proper sentence survives the filter!"])
    out = c4_stats_batch(t)
    assert out["n_lines"][0].as_py() == 5
    # kept: line 1 (5 words, '.') and line 5 ('!'); short/unpunctuated/js
    # lines die
    assert out["n_kept_lines"][0].as_py() == 2
    assert out["text_clean"][0].as_py() == (
        "This line has five good words.\n"
        "Another proper sentence survives the filter!")


def test_c4_page_rules():
    good = "One good sentence right here today.\n" * 3
    t = _docs([good,
               good + "var x = { a: 1 };",
               good + "Lorem Ipsum dolor sit amet",
               good + "some flagged word here"])
    out = c4_stats_batch(t, badwords=("flagged",))
    assert out["c4_pass"].to_pylist() == [1, 0, 0, 0]
    assert out["has_brace"].to_pylist() == [0, 1, 0, 0]
    assert out["has_lorem"].to_pylist() == [0, 0, 1, 0]
    assert out["has_badword"].to_pylist() == [0, 0, 0, 1]


def test_c4_min_kept_lines_and_nulls():
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["Only one good sentence lives here.", None],
                         pa.string()),
    })
    out = c4_stats_batch(t, min_kept_lines=2)
    # 1 kept line < 2 → fail; NULL text ≡ '' → zero lines kept, fail
    assert out["c4_pass"].to_pylist() == [0, 0]
    assert out["text_clean"].to_pylist() == [
        "Only one good sentence lives here.", ""]


def test_c4_filter_keep_only(ray_session):
    import ray.data

    good = "One good sentence right here today.\n" * 3
    ds = ray.data.from_arrow(_docs([good, good + "{", good]))
    kept = c4_filter(ds, keep_only=True).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2]


# -- DSIR ------------------------------------------------------------------

def _dsir_corpus():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["alpha beta alpha", "alpha beta",
                          "gamma delta gamma delta", ""], pa.string()),
        "lang": pa.array(["en", "en", "xx", "en"], pa.string()),
    })


def test_dsir_weights_favor_target_tokens(ray_session):
    import ray.data

    t = _dsir_corpus()
    w = dsir_weights(ray.data.from_arrow(t), n_buckets=64)
    assert w.dtype == np.int64 and len(w) == 64

    def bkt(tok):
        return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                              "big") % 64
    # alpha: 3 raw, 3 target → (1e6*4)//4 = 1e6; gamma: 2 raw 0 target
    assert w[bkt("alpha")] == 1_000_000
    assert w[bkt("gamma")] == (1_000_000 * 1) // 3


def test_dsir_score_batch_exact_sum():
    t = _dsir_corpus()
    w = np.full(64, 7, np.int64)
    out = dsir_score_batch(t, w, "text", "doc_id")
    # doc 4 has zero tokens → dropped; others score 7 × n_tokens
    assert out["doc_id"].to_pylist() == [1, 2, 3]
    assert out["dsir_score"].to_pylist() == [21, 14, 28]
    assert out["n_tokens"].to_pylist() == [3, 2, 4]


def test_dsir_select_partition_invariant(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
             for _ in range(200)]
    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en" if i % 3 else "xx" for i in range(200)],
                         pa.string()),
    })
    a = dsir_select(ray.data.from_arrow(t), k=20, n_buckets=32)
    b = dsir_select(ray.data.from_arrow(t).repartition(13), k=20,
                    n_buckets=32)
    assert a.to_pydict() == b.to_pydict()
    # top-1 is a deterministic (score DESC, id ASC) winner
    scores = a["dsir_score"].to_pylist()
    assert scores == sorted(scores, reverse=True)


# -- grouped top-k ----------------------------------------------------------

def test_topk_partial_bounds_rows_per_group():
    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
        "v": pa.array([5, 9, 9, 1, 3, 2, 8], pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    out = _topk_partial(t, "g", "v", "id", 2, descending=True)
    got = sorted(zip(out["g"].to_pylist(), out["id"].to_pylist()))
    # a: ties at 9 break id ASC → ids 2,3; b: both rows survive (k=2)
    assert got == [("a", 2), ("a", 3), ("b", 6), ("b", 7)]


def test_grouped_topk_matches_pandas(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    n = 500
    t = pa.table({
        "g": pa.array([f"g{int(x)}" for x in rng.integers(0, 7, n)]),
        "v": pa.array(rng.integers(0, 50, n), pa.int64()),
        "id": pa.array(range(n), pa.int64()),
    })
    out = grouped_topk(ray.data.from_arrow(t).repartition(9), "g", "v",
                       3, tie_col="id").to_pandas()
    ref = t.to_pandas().sort_values(["g", "v", "id"],
                                    ascending=[True, False, True]) \
        .groupby("g").head(3)
    got = sorted(zip(out["g"], out["id"]))
    exp = sorted(zip(ref["g"], ref["id"]))
    assert got == exp
    # ranks are 1..k within each group, ordered by (v DESC, id ASC)
    for _, grp in out.groupby("g"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        keys = list(zip(-grp["v"], grp["id"]))
        assert keys == sorted(keys)


# -- source mixing ----------------------------------------------------------

def test_mix_sources_matches_per_source_hash_sample(ray_session):
    import ray.data

    from docling_ray.stages.corpus_filters import (hash_sample_batch,
                                                   mix_sources)

    t = pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(400)], pa.string()),
    })
    rates = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
    out = mix_sources(ray.data.from_arrow(t), rates, default_rate=0.25) \
        .to_pandas()
    # per-source slice must equal hash_sample at that source's rate
    for src, rate in [("s0", 1.0), ("s1", 0.5), ("s2", 0.0),
                      ("s3", 0.25)]:
        sub = t.filter(pa.compute.equal(t["source"], src))
        exp = hash_sample_batch(sub, rate, bucket_col=None)
        got = sorted(out[out["source"] == src]["doc_id"])
        assert got == sorted(exp["doc_id"].to_pylist()), src


def test_mix_sources_partition_invariant(ray_session):
    import ray.data

    from docling_ray.stages.corpus_filters import mix_sources

    t = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(300)], pa.string()),
    })
    a = mix_sources(ray.data.from_arrow(t), {"s0": 0.3}, 0.7).to_pandas()
    b = mix_sources(ray.data.from_arrow(t).repartition(11),
                    {"s0": 0.3}, 0.7).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_mix_sources_null_key_uses_default_and_null_id_drops():
    from docling_ray.stages.corpus_filters import mix_sources_batch

    t = pa.table({
        "doc_id": pa.array([1, None, 3], pa.int64()),
        "source": pa.array(["s0", "s0", None], pa.string()),
    })
    # default 1.0 keeps every non-null id, even the NULL source row
    out = mix_sources_batch(t, {}, 1.0)
    assert out["doc_id"].to_pylist() == [1, 3]


# -- filter funnel ----------------------------------------------------------

def test_filter_funnel_monotone_and_exact(ray_session):
    import ray.data

    from docling_ray.stages.corpus_filters import filter_funnel

    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "v": pa.array(range(100), pa.int64()),
    })

    def flags(batch):
        v = batch["v"].to_numpy(zero_copy_only=False)
        return [v % 2 == 0, v < 50, v % 10 == 0]

    out = filter_funnel(ray.data.from_arrow(t).repartition(7), flags,
                        ["all", "even", "low", "tens"]).to_pandas() \
        .sort_values("stage").reset_index(drop=True)
    assert list(out["n_surviving"]) == [100, 50, 25, 5]
    assert list(out["stage_name"]) == ["all", "even", "low", "tens"]


# -- grouped linear regression ----------------------------------------------

def test_grouped_linreg_matches_numpy(ray_session):
    import ray.data

    from docling_ray.stages.stats import grouped_linreg

    rng = np.random.default_rng(3)
    n = 400
    x = rng.integers(1, 100, n)
    y = 3 * x + rng.integers(-10, 10, n)
    t = pa.table({
        "g": pa.array([f"g{int(v)}" for v in rng.integers(0, 4, n)]),
        "x": pa.array(x, pa.int64()),
        "y": pa.array(y, pa.int64()),
    })
    out = grouped_linreg(ray.data.from_arrow(t).repartition(7),
                         "g", "x", "y").to_pandas().set_index("g")
    df = t.to_pandas()
    for g, grp in df.groupby("g"):
        slope, icept = np.polyfit(grp["x"], grp["y"], 1)
        r = np.corrcoef(grp["x"], grp["y"])[0, 1]
        assert out.loc[g, "n"] == len(grp)
        assert abs(out.loc[g, "slope"] - slope) < 1e-9
        assert abs(out.loc[g, "intercept"] - icept) < 1e-6
        assert abs(out.loc[g, "r"] - r) < 1e-9


def test_grouped_linreg_degenerate_group_nulls(ray_session):
    import ray.data

    from docling_ray.stages.stats import grouped_linreg

    t = pa.table({
        "g": pa.array(["c", "c", "c"]),
        "x": pa.array([5, 5, 5], pa.int64()),   # zero variance in x
        "y": pa.array([1, 2, 3], pa.int64()),
    })
    out = grouped_linreg(ray.data.from_arrow(t), "g", "x", "y") \
        .to_pandas()
    assert out["slope"].isna().all() and out["r"].isna().all()


def test_grouped_linreg_partition_invariant_bits(ray_session):
    import ray.data

    from docling_ray.stages.stats import grouped_linreg

    rng = np.random.default_rng(9)
    t = pa.table({
        "g": pa.array([f"g{int(v)}" for v in rng.integers(0, 3, 300)]),
        "x": pa.array(rng.integers(0, 1000, 300), pa.int64()),
        "y": pa.array(rng.integers(0, 1000, 300), pa.int64()),
    })
    a = grouped_linreg(ray.data.from_arrow(t), "g", "x", "y") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    b = grouped_linreg(ray.data.from_arrow(t).repartition(17),
                       "g", "x", "y") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    # integer partials → the floats are BIT-identical, not just close
    assert (a["slope"].values.tobytes() == b["slope"].values.tobytes())
    assert (a["r"].values.tobytes() == b["r"].values.tobytes())


# -- weighted sampling ------------------------------------------------------

def test_weighted_bottom_k_exact_and_invariant(ray_session):
    import ray.data

    from docling_ray.stages.corpus_filters import weighted_bottom_k

    rng = np.random.default_rng(5)
    t = pa.table({
        "doc_id": pa.array(range(500), pa.int64()),
        "w": pa.array(rng.integers(0, 1000, 500), pa.int64()),
    })
    a = weighted_bottom_k(ray.data.from_arrow(t), 30, "w")
    b = weighted_bottom_k(ray.data.from_arrow(t).repartition(13), 30, "w")
    assert a.to_pydict() == b.to_pydict()
    assert a.num_rows == 30
    # brute-force reference: smallest h32 // max(w,1)
    ids = t["doc_id"].to_pylist()
    ws = t["w"].to_pylist()
    ranks = sorted(
        (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
         // max(w, 1), i) for i, w in zip(ids, ws))
    assert a["doc_id"].to_pylist() == [i for _, i in ranks[:30]]


def test_weighted_bottom_k_weight_bias(ray_session):
    import ray.data

    # two strata: weight 10_000 vs weight 1 — the heavy stratum must
    # dominate the sample (h32 // 10_000 << h32 // 1 almost surely)
    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "w": pa.array([10_000 if i < 100 else 1 for i in range(200)],
                      pa.int64()),
    })
    from docling_ray.stages.corpus_filters import weighted_bottom_k

    out = weighted_bottom_k(ray.data.from_arrow(t), 50, "w")
    heavy = sum(1 for i in out["doc_id"].to_pylist() if i < 100)
    assert heavy == 50


# -- review-fix regressions -------------------------------------------------

def test_c4_badwords_with_regex_metachars():
    t = _docs(["Nice words and a.b here stays fine.",
               "Nice words and azb here stays fine."])
    out = c4_stats_batch(t, badwords=("a.b", "c++"))
    # escaped: literal 'a.b' flags, 'azb' must NOT (dot is not wildcard)
    assert out["has_badword"].to_pylist() == [1, 0]


def test_linreg_null_group_is_its_own_group(ray_session):
    import ray.data

    from docling_ray.stages.stats import grouped_linreg

    t = pa.table({
        "g": pa.array(["", "", None, None, "a"], pa.string()),
        "x": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "y": pa.array([2, 4, 6, 8, 10], pa.int64()),
    })
    out = grouped_linreg(ray.data.from_arrow(t), "g", "x", "y") \
        .to_pandas()
    # SQL GROUP BY semantics: NULL, '' and 'a' are three distinct groups
    assert len(out) == 3
    ns = {(None if g != g or g is None else g): n
          for g, n in zip(out["g"], out["n"])}
    assert ns == {None: 2, "": 2, "a": 1}


def test_linreg_overflow_guard_raises():
    from docling_ray.stages.stats import linreg_partial

    t = pa.table({
        "g": pa.array(["a"], pa.string()),
        "x": pa.array([2 ** 32], pa.int64()),   # x*x wraps int64
        "y": pa.array([1], pa.int64()),
    })
    with pytest.raises(ValueError, match="overflow"):
        linreg_partial(t, "g", "x", "y")


def test_dsir_select_preserves_string_ids(ray_session):
    import ray.data

    t = pa.table({
        "doc_id": pa.array(["sha_b", "sha_a", "sha_c"], pa.string()),
        "text": pa.array(["alpha beta", "alpha", "gamma"], pa.string()),
        "lang": pa.array(["en", "en", "xx"], pa.string()),
    })
    out = dsir_select(ray.data.from_arrow(t), k=2, n_buckets=16)
    assert out["doc_id"].type == pa.string()
    assert out.num_rows == 2


def test_grouped_topk_empty_input_is_empty(ray_session):
    """Ray 2.49 artifact (same as the fuzzer's 0-row guard): a fully
    empty input degenerates to a zero-column dataset — callers must
    treat 0 rows as schema-less.  Any non-empty input keeps the
    documented input-columns + rank schema (asserted below with a
    single-row group)."""
    import ray.data

    t = pa.table({
        "g": pa.array([], pa.string()),
        "v": pa.array([], pa.int64()),
        "id": pa.array([], pa.int64()),
    })
    out = grouped_topk(ray.data.from_arrow(t), "g", "v", 3, tie_col="id")
    assert len(out.to_pandas()) == 0

    one = pa.table({
        "g": pa.array(["a"], pa.string()),
        "v": pa.array([1], pa.int64()),
        "id": pa.array([1], pa.int64()),
    })
    df = grouped_topk(ray.data.from_arrow(one), "g", "v", 3,
                      tie_col="id").to_pandas()
    assert set(["g", "v", "id", "rank"]) <= set(df.columns)
    assert list(df["rank"]) == [1]


def test_dsir_bigram_features(ray_session):
    import ray.data

    # 'alpha beta' bigram appears only in en docs; with bigrams on, a
    # doc containing the bigram must outscore one with the same
    # unigrams in the other order
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta", "beta alpha", "alpha beta"],
                         pa.string()),
        "lang": pa.array(["en", "xx", "en"], pa.string()),
    })
    out = dsir_select(ray.data.from_arrow(t), k=3, n_buckets=64,
                      include_bigrams=True)
    scores = dict(zip(out["doc_id"].to_pylist(),
                      out["dsir_score"].to_pylist()))
    assert scores[1] == scores[3] > scores[2]

    # partition invariance holds with bigrams too
    b = dsir_select(ray.data.from_arrow(t).repartition(3), k=3,
                    n_buckets=64, include_bigrams=True)
    assert out.to_pydict() == b.to_pydict()


# -- LAG window --------------------------------------------------------------

def test_event_lag_matches_pandas(ray_session):
    import pandas as pd
    import ray.data

    from docling_ray.stages.sessions import event_lag

    rng = np.random.default_rng(13)
    n = 300
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 5, n), pa.int64()),
        "ts": pa.array((rng.integers(0, 50, n) * 1_000_000)
                       .astype("int64")).cast(pa.timestamp("us")),
    })
    out = event_lag(ray.data.from_arrow(t).repartition(7)).to_pandas() \
        .set_index("event_id").sort_index()
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["delta"] = df.groupby("user_id")["ts"].diff() \
        .dt.total_seconds() * 1e6
    ref = df.set_index("event_id").sort_index()
    assert len(out) == n
    got = out["delta_us"].astype("float64")
    exp = ref["delta"]
    assert ((got.isna() == exp.isna()).all()
            and (got.dropna() == exp.dropna()).all())


# -- FastSS spelling pairs ---------------------------------------------------

def test_deletion_neighborhood_and_dp():
    from docling_ray.stages.spellvariants import (deletion_neighborhood,
                                                  levenshtein1)

    assert deletion_neighborhood("cat") == ["cat", "at", "ct", "ca"]
    assert levenshtein1("cat", "cot")        # substitution
    assert levenshtein1("cat", "cart")       # insertion
    assert levenshtein1("cat", "at")         # deletion
    assert not levenshtein1("ab", "ba")      # the FastSS false positive
    assert not levenshtein1("cat", "cat")
    assert not levenshtein1("cat", "dog")


def test_spelling_pairs_matches_bruteforce(ray_session):
    import itertools

    import ray.data

    from docling_ray.stages.spellvariants import (levenshtein1,
                                                  spelling_pairs)

    vocab = ["fast", "last", "mast", "masts", "ab", "ba", "slow",
             "slows", "xyz", "xyyz"]
    t = pa.table({"text": pa.array([" ".join(vocab)] * 3, pa.string())})
    out = spelling_pairs(ray.data.from_arrow(t).repartition(3),
                         min_len=2)
    got = set(zip(out["t1"].to_pylist(), out["t2"].to_pylist()))
    exp = {tuple(sorted(p)) for p in itertools.combinations(set(vocab), 2)
           if levenshtein1(*p) and min(len(x) for x in p) >= 2}
    assert got == exp and ("fast", "last") in got and ("ab", "ba") not in got


# -- triangle enumeration ----------------------------------------------------

def test_triangles_matches_bruteforce(ray_session):
    import itertools

    import ray.data

    from docling_ray.stages.graph import triangles

    rng = np.random.default_rng(21)
    n = 30
    pairs = sorted({tuple(sorted(p)) for p in
                    zip(rng.integers(0, n, 120), rng.integers(0, n, 120))
                    if p[0] != p[1]})
    t = pa.table({"a": pa.array([p[0] for p in pairs], pa.int64()),
                  "b": pa.array([p[1] for p in pairs], pa.int64())})
    out = triangles(ray.data.from_arrow(t).repartition(5),
                    num_partitions=4).to_pandas()
    got = sorted(map(tuple, out[["a", "b", "c"]].values.tolist()))
    es = set(pairs)
    exp = sorted((a, b, c) for a, b, c in
                 itertools.combinations(range(n), 3)
                 if (a, b) in es and (b, c) in es and (a, c) in es)
    assert got == exp and len(exp) > 0

"""Repetition stats + cross-doc duplicate windows (stages/repetition.py)."""

import pyarrow as pa

from docling_ray.stages.repetition import (dup_windows,
                                           repetition_stats,
                                           repetition_stats_batch)


def _doc_table(texts, start_id=0):
    return pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)),
                           pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_repetition_stats_known_values():
    batch = _doc_table(["a b a b c", "x", "", None,
                        "w w w w w w"])
    out = repetition_stats_batch(batch).to_pylist()
    # doc0: 5 words; 2-grams a·b, b·a, a·b, b·c → top2=2, dup2=2;
    # one distinct 5-gram → top5=1, dup5=0
    assert out[0]["n_words"] == 5 and out[0]["top2_n"] == 2
    assert out[0]["dup2_n"] == 2 and out[0]["top5_n"] == 1
    assert out[0]["dup5_n"] == 0
    # single-token / empty / null docs: all zero except n_words
    assert out[1]["n_words"] == 1 and out[1]["top2_n"] == 0
    assert out[2]["n_words"] == 0 and out[3]["n_words"] == 0
    # doc4: "w"×6 → five identical 2-grams (top2=dup2=5),
    # two identical 5-grams (top5=dup5=2)
    assert out[4]["top2_n"] == 5 and out[4]["dup2_n"] == 5
    assert out[4]["top5_n"] == 2 and out[4]["dup5_n"] == 2


def test_repetition_stats_whitespace_runs():
    # RE2 \s+ split with empties dropped: runs/leading/trailing spaces
    # change nothing (the SQL mirror's list_filter semantics)
    a = repetition_stats_batch(_doc_table(["a  b   a b"])).to_pylist()[0]
    b = repetition_stats_batch(_doc_table([" a b a b "])).to_pylist()[0]
    for k in ("n_words", "top2_n", "dup2_n"):
        assert a[k] == b[k]
    assert a["n_words"] == 4


def test_repetition_stats_streams(ray_session):
    import ray

    ds = ray.data.from_arrow(_doc_table(["a b a b", "c d"] * 20)) \
        .repartition(5)
    out = repetition_stats(ds)
    rows = {r["doc_id"]: r for r in out.take_all()}
    assert len(rows) == 40
    assert rows[0]["top2_n"] == 2 and rows[1]["top2_n"] == 1


def _dup_counts(ray, texts, parts=3, w=8):
    ds = ray.data.from_arrow(_doc_table(texts)).repartition(parts)
    out = dup_windows(ds, w=w)
    return {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in out.take_all()}


def test_dup_windows_cross_batch(ray_session):
    import ray

    # docs 0 and 2 share the window "p q r s t u v w" even when split
    # across blocks; doc1 is disjoint; doc3 is too short for any window
    texts = ["p q r s t u v w x",
             "a b c d e f g h i",
             "z p q r s t u v w",
             "tiny doc"]
    got = _dup_counts(ray, texts, parts=4)
    assert got[0] == (2, 1) and got[2] == (2, 1)
    assert got[1] == (2, 0)
    assert 3 not in got        # <w tokens → no row (SQL mirror agrees)


def test_dup_windows_within_doc_repeat_not_dup(ray_session):
    import ray

    # a window repeated WITHIN one doc is distinct-collapsed, so it is
    # not "shared with another document"
    t = "p q r s t u v w " * 2 + "end"
    got = _dup_counts(ray, [t, "a b c d e f g h"], parts=2)
    assert got[0][1] == 0 and got[1] == (1, 0)


def test_dup_windows_partition_invariant(ray_session):
    import ray

    texts = [f"w{i % 7} x{i % 5} y z a b c d e f g{i % 3}"
             for i in range(60)]
    a = _dup_counts(ray, texts, parts=1)
    b = _dup_counts(ray, texts, parts=9)
    assert a == b


def test_dup_windows_empty_input_keeps_schema(ray_session):
    import ray

    ds = ray.data.from_arrow(_doc_table([]))
    out = dup_windows(ds, w=8)
    names = set(out.schema().names)
    assert names == {"doc_id", "n_windows", "n_dup_windows"}
    assert out.count() == 0


def test_dup_windows_hash_sampling(ray_session):
    import numpy as np
    import ray

    from docling_ray.stages.repetition import _window_hash_rows

    texts = [f"a{i} b c d e f g h i j k{i}" for i in range(40)]
    ds = ray.data.from_arrow(_doc_table(texts)).repartition(4)
    full = dup_windows(ds, w=8)
    sampled = dup_windows(ds, w=8, sample_mod=2)
    f = {r["doc_id"]: r for r in full.take_all()}
    s = {r["doc_id"]: r for r in sampled.take_all()}
    # sampled counters never exceed the full ones, and equal exactly the
    # count of kept (gh % 2 == 0) windows — recomputed directly
    rows = _window_hash_rows(_doc_table(texts), "text", 8, "doc_id", 4)
    gh = rows["gh"].to_numpy(zero_copy_only=False).view(np.uint64)
    ids = rows["doc_id"].to_numpy(zero_copy_only=False)
    for d, row in s.items():
        kept = int(np.count_nonzero((ids == d) & (gh % 2 == 0)))
        assert row["n_windows"] == kept
        assert row["n_windows"] <= f[d]["n_windows"]
        assert row["n_dup_windows"] <= f[d]["n_dup_windows"]


def test_dup_windows_string_ids(ray_session):
    import ray

    t = pa.table({
        "url": pa.array(["u/a", "u/b", "u/c"], pa.string()),
        "text": ["p q r s t u v w x",
                 "z p q r s t u v w",
                 "a b c d e f g h"],
    })
    out = dup_windows(ray.data.from_arrow(t).repartition(2),
                      w=8, id_col="url")
    got = {r["url"]: (r["n_windows"], r["n_dup_windows"])
           for r in out.take_all()}
    assert out.schema().base_schema.field("url").type == pa.string()
    assert got == {"u/a": (2, 1), "u/b": (2, 1), "u/c": (1, 0)}


def test_dup_windows_hot_template_skew(ray_session):
    """A template window shared by 30% of the corpus (power-law dup
    skew): output stays one row per doc (linear — never pairwise), the
    hot docs' counters are exact, and partitioning doesn't change them."""
    import ray

    hot = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    texts = [f"u{i} " + hot if i % 10 < 3 else
             f"u{i} v{i} w{i} x{i} y{i} z{i} q{i} r{i} s{i}"
             for i in range(200)]
    ds = ray.data.from_arrow(_doc_table(texts)).repartition(8)
    out = dup_windows(ds, w=8)
    rows = out.take_all()
    assert len(rows) == 200                     # linear in docs
    got = {r["doc_id"]: r for r in rows}
    for i in range(200):
        if i % 10 < 3:
            # "u{i} alpha ... theta" = 9 tokens → 2 windows; the pure
            # template window is shared by all 60 hot docs
            assert got[i]["n_windows"] == 2
            assert got[i]["n_dup_windows"] == 1
        else:
            assert got[i]["n_dup_windows"] == 0
    b = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
         for r in dup_windows(
             ray.data.from_arrow(_doc_table(texts)).repartition(1),
             w=8).take_all()}
    assert all(b[i] == (got[i]["n_windows"], got[i]["n_dup_windows"])
               for i in range(200))


# -- substring_dedup (removal) ----------------------------------------------


def _clean(ray, texts, w=3, parts=3, backend="broadcast", ids=None):
    from docling_ray.stages.repetition import substring_dedup

    t = _doc_table(texts) if ids is None else pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(parts)
    out = substring_dedup(ds, w=w, backend=backend)
    return {r["doc_id"]: (r["text_clean"], r["n_removed"])
            for r in out.take_all()}


def test_substring_dedup_winner_keeps_losers_lose(ray_session):
    import ray

    # docs 0 and 1 share the 3-token window "q r s"; doc 0 (min id) keeps
    # all its tokens, doc 1 loses exactly the covered span
    got = _clean(ray, ["q r s t", "a b q r s c"], w=3)
    assert got[0] == ("q r s t", 0)
    assert got[1] == ("a b c", 3)


def test_substring_dedup_overlapping_windows_union(ray_session):
    import ray

    # doc1 contains the shared text twice, with overlapping dup windows:
    # covered spans union, tokens are not double-counted
    got = _clean(ray, ["q r s t", "q r s t q r s t"], w=3)
    assert got[0] == ("q r s t", 0)
    assert got[1] == ("", 8)


def test_substring_dedup_within_doc_repeat_untouched(ray_session):
    import ray

    # a window repeated only WITHIN one doc is not removed
    got = _clean(ray, ["m n o p m n o"], w=3)
    assert got[0] == ("m n o p m n o", 0)


def test_substring_dedup_short_null_empty(ray_session):
    import ray

    got = _clean(ray, ["a b", "", None], w=3)
    assert got[0] == ("a b", 0)
    assert got[1] == ("", 0)
    assert got[2] == ("", 0)


def test_substring_dedup_whitespace_normalized(ray_session):
    import ray

    # untouched docs come back whitespace-normalized (the SQL
    # string_agg(tok, ' ') contract)
    got = _clean(ray, ["  a   b \t c "], w=3)
    assert got[0] == ("a b c", 0)


def test_substring_dedup_backends_agree(ray_session):
    import ray

    texts = ["the quick brown fox jumps over the lazy dog",
             "intro text the quick brown fox jumps over the lazy dog outro",
             "the quick brown fox jumps over the lazy dog " * 2,
             "completely unrelated words here only once",
             "", None, "short one"]
    a = _clean(ray, texts, w=4, backend="broadcast")
    b = _clean(ray, texts, w=4, backend="join")
    assert a == b
    # min-id doc keeps the shared text
    assert a[0][1] == 0 and a[1][1] > 0 and a[2][1] > 0


def test_substring_dedup_string_ids_and_partition_invariance(ray_session):
    import ray

    texts = ["u v w x y", "z u v w x y z2"]
    a = _clean(ray, texts, w=3, parts=1, ids=["docB", "docA"])
    b = _clean(ray, texts, w=3, parts=4, ids=["docB", "docA"])
    assert a == b
    # lexicographic winner: "docA" (second row) keeps, "docB" loses
    assert a["docA"][1] == 0
    assert a["docB"] == ("", 5)

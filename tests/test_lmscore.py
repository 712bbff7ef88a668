"""Corpus-LM bigram familiarity (stages/lmscore.py)."""

import numpy as np
import pyarrow as pa

from docling_ray.stages.lmscore import (FamiliarityStage, _bigram_ids,
                                        bigram_model, familiarity)


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_bigram_ids_unicode():
    # codepoint pairs, combining marks included as their own codepoints
    assert len(_bigram_ids("abc")) == 2
    assert len(_bigram_ids("naïve\xa0café")) == 9
    assert len(_bigram_ids("a")) == 0 and len(_bigram_ids("")) == 0
    # distinct pairs get distinct ids (no shift collision)
    a, b = _bigram_ids("ab")[0], _bigram_ids("ba")[0]
    assert a != b


def test_model_and_scores_known_values(ray_session):
    import ray

    # corpus "abab", "ab": bigram counts ab=3 (two in doc0, one in
    # doc1), ba=1
    ds = ray.data.from_arrow(_docs(["abab", "ab"])).repartition(2)
    model = bigram_model(ds)
    got = dict(zip(model["bigram_id"].to_pylist(),
                   model["c"].to_pylist()))
    ab, ba = _bigram_ids("ab")[0], _bigram_ids("ba")[0]
    assert got == {ab: 3, ba: 1}
    out = {r["doc_id"]: (r["n_bigrams"], r["familiar_sum"])
           for r in familiarity(ds).take_all()}
    # doc0 "abab": positions ab,ba,ab → 3+1+3 = 7; doc1 "ab": 3
    assert out[0] == (3, 7)
    assert out[1] == (1, 3)


def test_unknown_bigrams_score_zero():
    model = pa.table({
        "bigram_id": pa.array(sorted(_bigram_ids("ab").tolist()),
                              pa.int64()),
        "c": pa.array([7], pa.int64()),
    })
    stage = FamiliarityStage(model)
    out = stage(_docs(["ab", "zz", "", None]))
    assert out["familiar_sum"].to_pylist() == [7, 0, 0, 0]
    assert out["n_bigrams"].to_pylist() == [1, 1, 0, 0]


def test_familiarity_partition_invariant(ray_session):
    import ray

    rng = np.random.default_rng(3)
    texts = ["".join(rng.choice(list("abcde "), size=40)) for _ in range(60)]
    def run(p):
        ds = ray.data.from_arrow(_docs(texts)).repartition(p)
        return sorted((r["doc_id"], r["n_bigrams"], r["familiar_sum"])
                      for r in familiarity(ds).take_all())
    assert run(1) == run(9)

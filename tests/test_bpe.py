"""BPE training / tokenization: engine vs a pure-Python reference of
the SAME spaced-replace contract, partition invariance, and the pinned
divergence-from-canonical case the module docstring declares."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- ref

def _ref_words(text: str) -> list[str]:
    import re

    return [w for w in re.split("[^a-z]+", (text or "").lower()) if w]


def _ref_seq(word: str) -> str:
    return " " + " ".join(word) + " </w> "


def _ref_apply(seq: str, left: str, right: str) -> str:
    pat, rep = f" {left} {right} ", f" {left}{right} "
    return seq.replace(pat, rep).replace(pat, rep)


def _ref_train(texts: list[str], n_merges: int):
    from collections import Counter

    freqs = Counter(w for t in texts for w in _ref_words(t))
    seqs = {w: _ref_seq(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in freqs.items():
            toks = seqs[w].split(" ")[1:-1]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seqs = {w: _ref_apply(s, *best) for w, s in seqs.items()}
    return merges


def _ref_count(text: str, merges) -> int:
    total = 0
    for w in _ref_words(text):
        s = _ref_seq(w)
        for left, right in merges:
            s = _ref_apply(s, left, right)
        total += len(s.split(" ")) - 2
    return total


TEXTS = [
    "the fast fox and the faster fox",
    "a banana and a bandana in the band",
    "sort merge sort merge sort scan",
    "",
    "THE Fast, fox!! 123",
    "zzz zzz zzz aaa",
]


# ------------------------------------------------------------- engine

def test_bpe_train_matches_reference(ray_session):
    import ray.data

    from docling_ray.stages.bpe import bpe_train

    t = pa.table({"text": pa.array(TEXTS + [None], pa.string())})
    got = bpe_train(ray.data.from_arrow(t).repartition(3), n_merges=6)
    want = _ref_train(TEXTS, 6)
    assert list(zip(got["left"].to_pylist(),
                    got["right"].to_pylist())) == want
    assert got["rank"].to_pylist() == list(range(1, len(want) + 1))


def test_bpe_train_partition_invariant(ray_session):
    import ray.data

    from docling_ray.stages.bpe import bpe_train

    t = pa.table({"text": pa.array(TEXTS * 3, pa.string())})
    a = bpe_train(ray.data.from_arrow(t), n_merges=4)
    b = bpe_train(ray.data.from_arrow(t).repartition(7), n_merges=4)
    assert a.equals(b)


def test_bpe_token_counts_matches_reference(ray_session):
    import ray.data

    from docling_ray.stages.bpe import bpe_token_counts, bpe_train

    t = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS, pa.string())})
    ds = ray.data.from_arrow(t).repartition(3)
    trained = bpe_train(ds, n_merges=5)
    merges = list(zip(trained["left"].to_pylist(),
                      trained["right"].to_pylist()))
    rows = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_counts(ds, merges).take_all()}
    for i, text in enumerate(TEXTS):
        assert rows[i] == _ref_count(text, merges), text
    # a doc with no [a-z] words keeps its 0 row
    assert rows[4] == _ref_count(TEXTS[4], merges)
    assert rows[3] == 0


def test_bpe_zero_merges_counts_symbols(ray_session):
    import ray.data

    from docling_ray.stages.bpe import bpe_token_counts

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["ab cde"], pa.string())})
    out = bpe_token_counts(ray.data.from_arrow(t), []).take_all()
    # chars + one </w> per word: (2+1) + (3+1)
    assert out[0]["n_bpe_tokens"] == 7


def test_apply_merge_two_pass_contract():
    """The pinned divergence: canonical left-to-right on 'a a a a a'
    yields tokens [aa, aa, a]; the two-pass spaced replace yields
    [aa, a, aa] — same multiset, different offsets.  The contract is
    the replace form, on BOTH engine and oracle."""
    from docling_ray.stages.bpe import apply_merge

    got = apply_merge(pa.array([" a a a a a </w> "]), "a", "a")
    assert got.to_pylist() == [" aa a aa </w> "]
    # and the pure-Python reference implements the identical rule
    assert _ref_apply(" a a a a a </w> ", "a", "a") == " aa a aa </w> "


def test_approx_quantiles_matches_direct_sample(ray_session):
    import hashlib

    import ray.data

    from docling_ray.stages.quantiles import approx_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 10_000_000, size=800)
    t = pa.table({"doc_id": pa.array(range(800), pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    got = approx_quantiles(ray.data.from_arrow(t).repartition(5),
                           "v", id_col="doc_id", k=100)
    ids = sorted(range(800), key=lambda i: int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[:4], "big"))[:100]
    samp = np.sort(vals[ids])
    want = {p: int(samp[max(0, -(-p * 100 // 100) - 1)])
            for p in (25, 50, 75, 90, 99)}
    assert dict(zip(got["q_pct"].to_pylist(),
                    got["value"].to_pylist())) == want

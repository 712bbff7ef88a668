"""Skewed-corpus stress tests for the dedup family (VERDICT r3 #8).

The hazard probed here: a power-law duplicate distribution (one template
at 10% of the corpus, ``sources/webpages.DUP_FAMILIES``) turns any
member-expanded pair emission into O(m²) output and any key-partitioned
stage into a hot partition.  These tests pin the repo's three defenses:
``emit="star"`` linear pair output (with pytest-proven drop-set and
cluster equivalence to the all-pairs contract), the ``max_bucket`` cap
with logged drops, and decision-projection exact dedup whose per-family
output is exactly (members - 1) losers.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(texts_by_id: dict[str, str]) -> pa.Table:
    ids = sorted(texts_by_id)
    return pa.table({"doc_id": pa.array(ids, pa.string()),
                     "text": pa.array([texts_by_id[i] for i in ids],
                                      pa.large_string())})


def _rand_text(rng, n_words: int = 60) -> str:
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    return " ".join(rng.choice(words) for _ in range(n_words))


def _skewed_docs(n_unique: int = 60, fam_a: int = 30, fam_b: int = 8,
                 seed: int = 5) -> dict[str, str]:
    """fam_a identical docs + fam_b identical docs + near-dup chain +
    unique tail — ids chosen so family winners are NOT globally minimal."""
    import random

    rng = random.Random(seed)
    docs: dict[str, str] = {}
    template_a = _rand_text(rng, 80)
    template_b = _rand_text(rng, 80)
    for i in range(fam_a):
        docs[f"m-a-{i:03d}"] = template_a
    for i in range(fam_b):
        docs[f"m-b-{i:03d}"] = template_b
    # near-dup chain: X ~ Y ~ Z with X and Z farther apart
    base = _rand_text(rng, 100).split()
    docs["chain-x"] = " ".join(base)
    docs["chain-y"] = " ".join(base[:-3] + ["tail", "one", "two"])
    for i in range(n_unique):
        docs[f"u-{i:03d}"] = _rand_text(rng, 60)
    return docs


def _components(pairs: pa.Table) -> dict[str, str]:
    """Reference union-find over a small collected pair table."""
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def test_star_pairs_drop_set_and_clusters_equivalent(ray_session):
    import ray.data

    from docling_ray.stages.dedup import minhash_near_dups

    docs = _skewed_docs()
    ds = ray.data.from_arrow(_docs_table(docs))
    all_pairs = minhash_near_dups(ds, threshold=0.7, emit="pairs") \
        .to_arrow_refs()
    import ray as _ray

    all_pairs = pa.concat_tables([_ray.get(r) for r in all_pairs])
    ds = ray.data.from_arrow(_docs_table(docs))
    star = minhash_near_dups(ds, threshold=0.7, emit="star").to_arrow_refs()
    star = pa.concat_tables([_ray.get(r) for r in star])

    # identical doc_b DROP SET — the anti-filter contract
    assert set(star["doc_b"].to_pylist()) == set(all_pairs["doc_b"].to_pylist())
    # identical connected components — the cluster-keep-one contract
    assert _components(star) == _components(all_pairs)
    # and the families actually exercised the skew: 30 identical docs
    # produce C(30,2)=435 member pairs in "pairs" mode but only 29 star
    # edges, so star output must be far smaller
    assert star.num_rows < all_pairs.num_rows / 5
    # star intra-family edges are winner → member (a = family min id)
    fam_a = {d for d in docs if d.startswith("m-a-")}
    fam_edges = [
        (a, b) for a, b in zip(star["doc_a"].to_pylist(),
                               star["doc_b"].to_pylist())
        if a in fam_a and b in fam_a]
    assert len(fam_edges) == len(fam_a) - 1
    assert all(a == min(fam_a) for a, _ in fam_edges)


def test_star_output_linear_in_family_size(ray_session):
    import ray.data

    from docling_ray.stages.dedup import minhash_near_dups

    m = 100
    docs = {f"d-{i:04d}": "one single boilerplate template page text "
                          "repeated verbatim across the crawl" * 3
            for i in range(m)}
    import random

    rng = random.Random(11)
    for i in range(50):
        docs[f"u-{i:03d}"] = _rand_text(rng)
    ds = ray.data.from_arrow(_docs_table(docs))
    star = minhash_near_dups(ds, threshold=0.7, emit="star").to_pandas()
    fam = star[star.doc_a.str.startswith("d-") & star.doc_b.str.startswith("d-")]
    assert len(fam) == m - 1                      # not C(100, 2) = 4950
    assert (fam.doc_a == "d-0000").all()


def test_bucket_cap_logs_drops(caplog):
    import logging

    from docling_ray.stages.dedup import _bucket_emit

    # 8 DISTINCT-signature groups colliding in one bucket, cap at 3
    n, num_bands, num_perm = 8, 4, 8
    rng = np.random.default_rng(3)
    keys = rng.integers(-2**62, 2**62, size=(n, num_bands)).astype(">i8")
    sketches = rng.integers(0, 256, size=(n, num_perm)).astype(np.uint8)
    out_a, out_b, out_n = [], [], []
    with caplog.at_level(logging.WARNING, logger="docling_ray.stages.dedup"):
        _bucket_emit([f"doc-{i}" for i in range(n)], keys, sketches,
                     band=0, min_agree=0, max_bucket=3,
                     out_a=out_a, out_b=out_b, out_n=out_n)
    assert any("over cap" in r.message for r in caplog.records)
    # capped: at most C(3,2) cross-group pairs survive
    assert len(out_a) <= 3


def test_exact_dedup_losers_powerlaw(ray_session):
    import ray
    import ray.data

    from docling_ray.sources.webpages import (DUP_FAMILIES,
                                              make_skewed_table,
                                              skewed_family_of)
    from docling_ray.stages.dedup import exact_dedup_losers

    n = 400
    table = make_skewed_table(n, seed=42)
    urls = table["url"].to_pylist()
    doc_ids = [hashlib.sha256(h.as_py()).hexdigest() for h in table["html"]]
    proj = pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                     "url": pa.array(urls, pa.string())})

    families: dict[int, list[str]] = {}
    for i in range(n):
        f = skewed_family_of(i)
        if f >= 0:
            families.setdefault(f, []).append(urls[i])
    assert len(families) == len(DUP_FAMILIES)
    assert len(families[0]) == n // 10            # the 10% template
    expected_losers = set()
    for members in families.values():
        expected_losers.update(sorted(members)[1:])

    losers = exact_dedup_losers(
        ray.data.from_arrow(proj), key_column="doc_id", order_column="url")
    got = set()
    for b in losers.iter_batches(batch_format="pyarrow"):
        got.update(b["url"].to_pylist())
    assert got == expected_losers


def test_skewed_corpus_run_end_to_end(ray_session, tmp_path):
    """The composed checkpointed runner on the skewed corpus: every
    family non-winner is dropped, no two surviving docs share bytes."""
    import glob

    import pyarrow.parquet as pq

    from docling_ray.pipelines.corpus import run_corpus
    from docling_ray.sources.webpages import (make_skewed_table,
                                              skewed_family_of,
                                              write_skewed_corpus)

    n = 600
    src = tmp_path / "skewed"
    write_skewed_corpus(str(src), n, seed=42, rows_per_file=200)
    out = tmp_path / "out"
    res = run_corpus(str(src), str(out))
    assert res["n_chunks"] > 0

    surviving = set()
    for f in glob.glob(str(out / "chunks" / "*.parquet")):
        surviving.update(pq.read_table(f, columns=["url"])["url"].to_pylist())

    table = make_skewed_table(n, seed=42)
    urls = table["url"].to_pylist()
    families: dict[int, list[str]] = {}
    for i in range(n):
        f = skewed_family_of(i)
        if f >= 0:
            families.setdefault(f, []).append(urls[i])
    for members in families.values():
        winner = sorted(members)[0]
        # every non-winner dropped (exact + star near-dup agree on these)
        assert not (surviving & set(members[1:]) - {winner})
        assert surviving.isdisjoint(sorted(members)[1:])
    # dedup preserved at most one representative per family
    assert sum(1 for m in families.values() if set(m) & surviving) \
        <= len(families)
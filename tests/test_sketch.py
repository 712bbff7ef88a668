"""HyperLogLog count-distinct sketch (docling_ray/stages/sketch.py):
error bound, merge algebra, partition invariance."""

import numpy as np
import pyarrow as pa

from docling_ray.stages.sketch import (count_distinct_approx, hll_estimate,
                                       hll_merge, hll_registers)


def test_hll_error_bound_across_cardinalities():
    rng = np.random.default_rng(3)
    for true_n in (50, 1_000, 20_000, 200_000):
        vals = pa.array(rng.choice(10**12, size=true_n, replace=False))
        est = hll_estimate(hll_registers(vals))
        # 4096 registers → σ ≈ 1.6%; assert 4σ plus small-N slack
        assert abs(est - true_n) <= max(0.07 * true_n, 8), (true_n, est)


def test_hll_duplicates_do_not_inflate():
    base = pa.array(list(range(500)) * 40)       # 20k rows, 500 distinct
    est = hll_estimate(hll_registers(base))
    assert abs(est - 500) <= 35


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(9)
    vals = rng.choice(10**9, size=30_000, replace=False)
    whole = hll_registers(pa.array(vals))
    chunks = [hll_registers(pa.array(c)) for c in np.array_split(vals, 7)]
    merged = hll_merge([c.tobytes() for c in chunks])
    assert np.array_equal(whole, merged)
    # associativity/idempotence: re-merging a prefix changes nothing
    again = hll_merge([merged, chunks[0]])
    assert np.array_equal(again, merged)


def test_count_distinct_approx_partition_invariant(ray_session):
    import ray

    rng = np.random.default_rng(17)
    n = 6000
    t = pa.table({
        "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(n)]),
        "uid": pa.array(rng.integers(0, 900, size=n)),
    })
    results = []
    for p in (1, 4, 19):
        out = count_distinct_approx(
            ray.data.from_arrow(t).repartition(p), "lang", "uid")
        results.append(list(zip(out["lang"].to_pylist(),
                                out["n_distinct_est"].to_pylist())))
    assert results[0] == results[1] == results[2]
    # and close to exact
    import collections
    exact = collections.defaultdict(set)
    for lang, uid in zip(t["lang"].to_pylist(), t["uid"].to_pylist()):
        exact[lang].add(uid)
    for lang, est in results[0]:
        true_n = len(exact[lang])
        assert abs(est - true_n) <= max(0.07 * true_n, 8)


# -- Bloom filter -----------------------------------------------------------


def _bloom_of(keys, m_bits=256, k=3):
    from docling_ray.stages.sketch import bloom_merge, bloom_partial

    t = pa.table({"k": pa.array(keys, pa.int64())})
    return bloom_merge([bloom_partial(t, "k", m_bits, k)["bits"][0].as_py()])


def test_bloom_no_false_negatives():
    import numpy as np

    from docling_ray.stages.sketch import bloom_positions

    bits = np.unpackbits(np.asarray(_bloom_of(list(range(40)))))
    for key in range(40):
        assert bits[bloom_positions(str(key), 256, 3)].all()


def test_bloom_merge_partition_invariant(ray_session):
    import ray

    from docling_ray.stages.sketch import build_bloom

    keys = list(range(0, 300, 7))
    t = pa.table({"k": pa.array(keys, pa.int64())})
    blooms = {
        p: build_bloom(ray.data.from_arrow(t).repartition(p), "k",
                       m_bits=512, k_hashes=3)
        for p in (1, 5)
    }
    assert blooms[1] == blooms[5]


def test_bloom_probe_flags(ray_session):
    import ray

    from docling_ray.stages.sketch import (bloom_positions, bloom_probe,
                                           build_bloom)
    import numpy as np

    ref = pa.table({"k": pa.array(range(50), pa.int64())})
    bloom = build_bloom(ray.data.from_arrow(ref), "k", m_bits=512,
                        k_hashes=3)
    probe = pa.table({"k": pa.array(list(range(40, 120)) + [None],
                                    pa.int64())})
    out = bloom_probe(ray.data.from_arrow(probe).repartition(3),
                      ray.put(bloom), "k", m_bits=512, k_hashes=3)
    rows = {r["k"]: r["maybe_member"] for r in out.take_all()}
    # members always flagged
    assert all(rows[k] == 1 for k in range(40, 50))
    # non-members: flag equals the direct bit test (FPs deterministic)
    bits = np.unpackbits(np.frombuffer(bloom, dtype=np.uint8))
    for k in range(50, 120):
        assert rows[k] == int(bits[bloom_positions(str(k), 512, 3)].all())
    # null key is never a member
    assert rows[None] == 0


def test_cms_upper_bound_and_partition_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from docling_ray.stages.sketch import (build_cms, cms_merge,
                                           cms_partial, cms_positions,
                                           cms_probe)

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 40, 3000)          # heavy collisions at w=64
    t = pa.table({"user_id": pa.array(keys, pa.int64())})
    exact = {k: int((keys == k).sum()) for k in set(keys.tolist())}

    blob = build_cms(ray.data.from_arrow(t), "user_id", width=64, depth=3)
    probe = pa.table({"user_id": pa.array(sorted(exact), pa.int64())})
    out = cms_probe(ray.data.from_arrow(probe), ray.put(blob), "user_id",
                    width=64, depth=3).to_pandas().set_index("user_id")
    # CMS never underestimates; at 40 keys / 64 counters some rows
    # collide, so SOME estimate must exceed the truth (the interesting
    # regime) while min-of-rows keeps most estimates tight
    assert all(out.loc[k, "est_count"] >= v for k, v in exact.items())
    assert any(out.loc[k, "est_count"] > v for k, v in exact.items())

    # partition invariance: 1 block vs 7 blocks build the same sketch
    blob7 = build_cms(ray.data.from_arrow(t).repartition(7), "user_id",
                      width=64, depth=3)
    assert blob == blob7

    # merge is a plain elementwise sum of partials
    half = len(t) // 2
    p1 = cms_partial(t.slice(0, half), "user_id", 64, 3)["counters"][0] \
        .as_py()
    p2 = cms_partial(t.slice(half), "user_id", 64, 3)["counters"][0] \
        .as_py()
    assert cms_merge([p1, p2]).tobytes() == blob

    # null keys count nowhere and probe to null
    tn = pa.table({"user_id": pa.array([1, None], pa.int64())})
    blob_n = build_cms(ray.data.from_arrow(tn), "user_id", width=64,
                       depth=3)
    total = np.frombuffer(blob_n, np.int64).reshape(3, 64).sum(axis=1)
    assert (total == 1).all()
    pos = cms_positions("1", 64, 3)
    assert all(np.frombuffer(blob_n, np.int64).reshape(3, 64)[j, p] == 1
               for j, p in enumerate(pos))

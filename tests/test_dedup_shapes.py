"""Scale-shape tests for the round-3 dedup rewrites: no per-group Python
at high key cardinality, vectorized explodes, bounded partition fan-out on
skewed corpora, candidate/verify Jaccard."""

import numpy as np
import pyarrow as pa
import pytest


# -- exact dedup ------------------------------------------------------------

def test_exact_dedup_min_ids_native_agg(ray_session):
    import ray.data

    from docling_ray.stages.dedup import exact_dedup_min_ids
    from docling_ray.stages.textstats import fingerprint_batch

    table = pa.table({
        "doc_id": [5, 9, 1, 7, 3],
        "text": ["a", "b", "a", "a", "b"],
    })
    ds = ray.data.from_arrow(table).map_batches(
        fingerprint_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "fingerprint"])
    out = exact_dedup_min_ids(ds).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 3]
    assert set(out.columns) == {"doc_id", "fingerprint"}


def test_exact_dedup_keep_first_full_rows_and_string_ids(ray_session):
    import ray.data

    from docling_ray.stages.dedup import exact_dedup_keep_first
    from docling_ray.stages.textstats import fingerprint_batch

    table = pa.table({
        "doc_id": ["z", "a", "m", "b"],
        "text": ["same", "same", "other", "same"],
        "payload": [10, 20, 30, 40],
    })
    ds = ray.data.from_arrow(table).map_batches(
        fingerprint_batch, batch_format="pyarrow")
    out = exact_dedup_keep_first(ds).to_pandas().sort_values("doc_id")
    # survivor of the "same" group is the min doc_id ("a"), full row kept
    assert out["doc_id"].tolist() == ["a", "m"]
    assert out["payload"].tolist() == [20, 30]
    assert "_part" not in out.columns


def test_part_of_spreads_high_cardinality_keys():
    from docling_ray.stages.dedup import _part_of

    keys = pa.array([f"fp-{i:06d}" for i in range(2000)])
    parts = _part_of(keys, 64)
    counts = np.bincount(parts, minlength=64)
    assert counts.min() > 0
    assert counts.max() < 3 * counts.mean()
    # determinism across calls (hash key is process-stable)
    assert np.array_equal(parts, _part_of(keys, 64))

    ints = pa.array(np.arange(2000, dtype=np.int64))
    parts_i = _part_of(ints, 64)
    counts_i = np.bincount(parts_i, minlength=64)
    assert counts_i.max() < 3 * counts_i.mean()


# -- simhash ----------------------------------------------------------------

def _simhash64_slow(text: str) -> int:
    """Scalar reference implementation (the pre-vectorization semantics)."""
    import hashlib

    weights = [0] * 64
    for token in text.split():
        h = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
        for bit in range(64):
            weights[bit] += 1 if (h >> bit) & 1 else -1
    value = 0
    for bit in range(64):
        if weights[bit] > 0:
            value |= 1 << bit
    return value


def test_simhash64_vectorized_matches_scalar():
    from docling_ray.stages.textstats import simhash64

    for text in ["", "one", "one two three", "dup dup dup distinct",
                 "a b c d e f g h i j " * 30]:
        assert simhash64(text) == _simhash64_slow(text)


def test_popcount64():
    from docling_ray.stages.dedup import _popcount64

    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert _popcount64(x).tolist() == [0, 1, 2, 64, 1]
    m = np.array([[0, 7], [15, 0]], dtype=np.uint64)
    assert _popcount64(m).tolist() == [[0, 3], [4, 0]]


def test_simhash_bucket_rows_vectorized_shape():
    from docling_ray.stages.dedup import simhash_bucket_rows

    batch = pa.table({
        "doc_id": ["x", "y"],
        "simhash_u64": pa.array(
            np.array([0x1234_5678_9ABC_DEF0, 0xFFFF_0000_FFFF_0000],
                     dtype=np.uint64), pa.uint64()),
    })
    rows = simhash_bucket_rows(batch, num_buckets=4, num_partitions=8)
    assert rows.num_rows == 8
    # bucket encodes (q << 16) | quarter; doc x quarter 0 is 0xDEF0
    got = dict(zip(rows["bucket"].to_pylist(), rows["doc_id"].to_pylist()))
    assert got[0xDEF0] == "x"
    assert got[(3 << 16) | 0x1234] == "x"
    assert got[(1 << 16) | 0xFFFF] == "y"
    # bucket never straddles partitions
    seen = {}
    for b, p in zip(rows["bucket"].to_pylist(), rows["part"].to_pylist()):
        assert seen.setdefault(b, p) == p
        assert 0 <= p < 8


def test_simhash_partition_pairs_cap_logs_drops(caplog):
    import logging

    from docling_ray.stages.dedup import simhash_partition_pairs

    n = 10
    part = pa.table({
        "part": pa.array([0] * n, pa.int64()),
        "bucket": pa.array([7] * n, pa.int64()),
        "doc_id": [f"d{i}" for i in range(n)],
        "simhash_u64": pa.array(np.full(n, 7, dtype=np.uint64), pa.uint64()),
    })
    with caplog.at_level(logging.WARNING):
        out = simhash_partition_pairs(part, max_hamming=3, num_buckets=4,
                                      bits=64, max_bucket=4)
    assert any("over cap" in r.message for r in caplog.records)
    # capped to 4 members -> 6 pairs (identical sigs, first quarter = q0 = 7's bucket q)
    assert out.num_rows == 6


def test_simhash_near_dups_matches_old_semantics(ray_session):
    """The rewritten pipeline must emit exactly the pairs the quarter-LSH
    contract defines: share >=1 exact quarter AND hamming <= k, each pair
    once."""
    import ray.data

    from docling_ray.stages.dedup import simhash_near_dups
    from docling_ray.stages.textstats import simhash64

    texts = {
        "a": "word " * 120 + "alpha beta gamma delta",
        "b": "word " * 120 + "alpha beta gamma epsilon",
        "c": "entirely other content " * 30,
        "d": "word " * 120 + "alpha beta gamma delta",  # exact dup of a
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(texts), "text": list(texts.values())}))
    df = simhash_near_dups(ds, max_hamming=3).to_pandas()
    got = set(zip(df["doc_a"], df["doc_b"]))
    # expected from the scalar contract
    vals = {k: simhash64(t) for k, t in texts.items()}
    exp = set()
    ks = list(texts)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            x = vals[ks[i]] ^ vals[ks[j]]
            shares = any(((x >> (q * 16)) & 0xFFFF) == 0 for q in range(4))
            if shares and bin(x).count("1") <= 3:
                exp.add((min(ks[i], ks[j]), max(ks[i], ks[j])))
    assert got == exp
    assert ("a", "d") in got
    assert len(df) == len(got)


# -- jaccard candidate/verify ----------------------------------------------

def test_jaccard_near_dups_skewed_single_lang(ray_session):
    """The old design partitioned by lang — a single-lang corpus landed
    whole in one worker.  The new candidate/verify shape must (1) find the
    planted near-dups, (2) spread its shuffle keys over many partitions
    even when every doc shares one lang."""
    import ray.data

    from docling_ray.stages.dedup import (
        MinHashStage,
        band_explode,
        jaccard_near_dups,
        jaccard_pairs_in_group,
    )

    base1 = ("stream data batch query table scan merge sort join filter "
             "shard spill vector page cell block arrow shuffle") * 4
    base2 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon") * 4
    rows = {"doc_id": [], "text": [], "lang": []}
    for i in range(30):
        rows["doc_id"].append(i)
        rows["text"].append(f"unique document number {i} " +
                            " ".join(f"tok{i}_{j}" for j in range(40)))
        rows["lang"].append("en")
    rows["doc_id"] += [100, 101, 200, 201]
    rows["text"] += [base1, base1.replace("arrow", "parquet"),
                     base2, base2.replace("sigma", "omega")]
    rows["lang"] += ["en"] * 4
    table = pa.table(rows)
    ds = ray.data.from_arrow(table)
    df = jaccard_near_dups(ds, threshold=0.5).to_pandas()
    got = set(zip(df["doc_a"], df["doc_b"]))
    assert got == {(100, 101), (200, 201)}
    # exact jaccard values match the in-memory brute force
    brute = jaccard_pairs_in_group(table, threshold=0.5, shingle_k=3)
    exp = {(a, b): m for a, b, m in zip(brute["doc_a"].to_pylist(),
                                        brute["doc_b"].to_pylist(),
                                        brute["j_milli"].to_pylist())}
    for _, r in df.iterrows():
        assert exp[(r["doc_a"], r["doc_b"])] == r["j_milli"]
    # shuffle keys spread across partitions despite single-lang skew
    stage = MinHashStage()
    bands = band_explode(stage(table), num_partitions=64)
    parts = set(bands["part"].to_pylist())
    assert len(parts) > 16


def test_jaccard_empty_result_keeps_schema(ray_session):
    import ray.data

    from docling_ray.stages.dedup import jaccard_near_dups

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["totally distinct words here", "other unrelated tokens now"],
    }))
    out = jaccard_near_dups(ds, threshold=0.5)
    # NOTE: Ray 2.49 to_pandas() drops columns on any 0-row dataset; the
    # schema contract lives on the Dataset itself
    assert out.schema().names == ["doc_a", "doc_b", "jaccard", "j_milli"]
    assert out.count() == 0


def test_exact_dedup_losers_payload_free(ray_session):
    import ray.data

    from docling_ray.stages.dedup import exact_dedup_losers
    from docling_ray.stages.textstats import fingerprint_batch

    table = pa.table({
        "doc_id": ["w", "a", "m", "b", "z"],
        "text": ["same", "same", "other", "same", "other"],
        "payload": [1, 2, 3, 4, 5],
    })
    ds = ray.data.from_arrow(table).map_batches(
        fingerprint_batch, batch_format="pyarrow")
    losers = exact_dedup_losers(ds, key_column="fingerprint",
                                order_column="doc_id")
    # min of {w,a,b} is "a"; min of {m,z} is "m" -> losers are b, w, z
    assert sorted(losers.to_pandas()["doc_id"].tolist()) == ["b", "w", "z"]
    assert losers.schema().names == ["doc_id"]


def test_part_of_mixes_stride_aligned_int_keys():
    """An odd-constant multiply alone is a bijection mod 2^k: stride-64
    ids would all land in partition 0 of 64.  The xor-shift mix must
    spread them."""
    from docling_ray.stages.dedup import _part_of

    ints = pa.array(np.arange(2000, dtype=np.int64) * 64)
    parts = _part_of(ints, 64)
    counts = np.bincount(parts, minlength=64)
    assert counts.max() < 3 * counts.mean()
    # hour-rounded-ms timestamps, another real stride
    ts = pa.array(np.arange(1000, dtype=np.int64) * 3_600_000)
    counts_ts = np.bincount(_part_of(ts, 64), minlength=64)
    assert counts_ts.max() < 4 * counts_ts.mean()


def test_hash64_batch_null_content_invariant():
    """A nullable int64 column materializes as float64 via to_numpy;
    dtype-dispatch would then hash the same key with two different
    functions depending on which batch it lands in, splitting one key
    across partitions (ADVICE r3).  The hash must depend only on the
    value, never on other rows of the batch; nulls route to a fixed
    partition."""
    from docling_ray.stages.dedup import _hash64_of

    clean = pa.array([10, 20, 30], pa.int64())
    dirty = pa.array([10, None, 30], pa.int64())
    h_clean = _hash64_of(clean)
    h_dirty = _hash64_of(dirty)
    assert h_clean[0] == h_dirty[0] and h_clean[2] == h_dirty[2]
    # nulls co-locate deterministically
    assert _hash64_of(pa.array([None, None], pa.int64()))[0] == h_dirty[1]
    # chunked nullable column takes the same path
    ch = pa.chunked_array([pa.array([10], pa.int64()),
                           pa.array([None, 30], pa.int64())])
    h_ch = _hash64_of(ch)
    assert h_ch[0] == h_clean[0] and h_ch[2] == h_clean[2]


def test_exact_dedup_losers_tie_on_order_keeps_winner(ray_session):
    """Two rows tying on (key, order) — a re-crawl dup with the same url
    and same bytes — must NOT emit the winner's own order value as a
    loser: the anti-filter drops by VALUE, so emitting it would delete
    every copy of the document including the kept one (ADVICE r3).
    Losing values are emitted once each (distinct)."""
    import ray.data

    from docling_ray.stages.dedup import exact_dedup_losers

    table = pa.table({
        "fingerprint": ["k"] * 4 + ["solo"],
        "url": ["u1", "u1", "u2", "u2", "u9"],   # u1 tie-wins, u2 loses
    })
    ds = ray.data.from_arrow(table)
    lost = exact_dedup_losers(ds, key_column="fingerprint",
                              order_column="url").to_pandas()["url"].tolist()
    assert lost == ["u2"]


def test_exact_dedup_handles_null_keys(ray_session):
    """Null keys form their own group (groupby semantics) instead of
    raising on null comparisons."""
    import ray.data

    from docling_ray.stages.dedup import exact_dedup_keep_first, exact_dedup_losers

    table = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "fingerprint": pa.array(["x", None, "x", None, "y"], pa.string()),
    })
    ds = ray.data.from_arrow(table)
    kept = sorted(exact_dedup_keep_first(ds).to_pandas()["doc_id"])
    assert kept == [1, 2, 5]          # null group keeps doc 2
    lost = sorted(exact_dedup_losers(ds).to_pandas()["doc_id"])
    assert lost == [3, 4]


def test_connected_components_chain_clusters(ray_session):
    """Chains must form ONE component with rep = min: pair-local
    drop-the-larger would over-drop D in a (C,D)-only link after C was
    already dropped via (B,C)."""
    import ray.data

    from docling_ray.stages.dedup import connected_components

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": [1, 2, 10, 7],
        "doc_b": [2, 3, 11, 1],
    }))
    out = connected_components(pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_distributed_matches_driver(ray_session):
    """The shuffle-based min-label propagation must produce exactly the
    driver union-find's (doc_id, cluster_rep) mapping — mixed shapes:
    chain, star, singleton pair, and an out-of-order component."""
    import ray.data

    from docling_ray.stages.dedup import (connected_components,
                                          connected_components_distributed)

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": [1, 2, 10, 7, 50, 50, 50, 99],
        "doc_b": [2, 3, 11, 1, 51, 52, 53, 40],
    }))
    want = connected_components(pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = connected_components_distributed(pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


def test_connected_components_distributed_string_ids(ray_session):
    """String (url) ids take the same path — the corpus pipeline's node
    type."""
    import ray.data

    from docling_ray.stages.dedup import connected_components_distributed

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": ["u3", "u1", "u9"],
        "doc_b": ["u2", "u2", "u8"],
    }))
    out = connected_components_distributed(pairs).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert got == {"u1": "u1", "u2": "u1", "u3": "u1",
                   "u8": "u8", "u9": "u8"}


def test_connected_components_distributed_long_chain_few_rounds(ray_session):
    """Pointer doubling: a 128-node chain must converge within
    O(log depth) rounds, not depth — max_rounds=10 would fail a plain
    propagation (which needs ~127 rounds) but passes with shortcuts."""
    import ray.data

    from docling_ray.stages.dedup import connected_components_distributed

    n = 128
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": list(range(n - 1)),
        "doc_b": list(range(1, n)),
    }))
    out = connected_components_distributed(pairs, max_rounds=10).to_pandas()
    assert len(out) == n
    assert (out["cluster_rep"] == 0).all()


class _NoDriverCollectProxy:
    """Dataset wrapper that fails the test if the operator under test
    ever pulls the pair set onto the driver."""

    _FORBIDDEN = ("iter_batches", "iter_rows", "to_pandas", "take_all",
                  "take", "to_arrow_refs")

    def __init__(self, ds):
        self._ds = ds

    def __getattr__(self, name):
        if name in self._FORBIDDEN:
            raise AssertionError(
                f"pair set collected on the driver via .{name}()")
        return getattr(self._ds, name)


def test_connected_components_distributed_never_collects_pairs(ray_session):
    """The 100 TB contract: the pair graph is streamed through shuffles,
    never materialized on the driver (VERDICT r3 #1)."""
    import ray.data

    from docling_ray.stages.dedup import connected_components_distributed

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": [1, 2, 5],
        "doc_b": [2, 3, 6],
    }))
    out = connected_components_distributed(_NoDriverCollectProxy(pairs)) \
        .to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_connected_components_distributed_empty(ray_session):
    import ray.data

    from docling_ray.stages.dedup import connected_components_distributed

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
    }))
    out = connected_components_distributed(pairs)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "cluster_rep"]


def test_jaccard_inline_variant_matches_join_variant(ray_session):
    """The single-shuffle inline form must emit EXACTLY the pairs (and
    j_milli values) of the 3-shuffle candidate/verify join — same
    candidates (same seeded bands), same exact verification."""
    import ray.data

    from docling_ray.stages.dedup import (
        jaccard_near_dups,
        jaccard_near_dups_inline,
    )

    base1 = ("stream data batch query table scan merge sort join filter "
             "shard spill vector page cell block arrow shuffle") * 4
    base2 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon") * 4
    rows = {"doc_id": [], "text": []}
    for i in range(25):
        rows["doc_id"].append(i)
        rows["text"].append(f"unique {i} " +
                            " ".join(f"tok{i}_{j}" for j in range(40)))
    rows["doc_id"] += [100, 101, 102, 200, 201]
    rows["text"] += [base1, base1.replace("arrow", "parquet"), base1,
                     base2, base2.replace("sigma", "omega")]
    table = pa.table(rows)

    def canon(ds):
        df = ds.to_pandas().sort_values(["doc_a", "doc_b"]) \
            .reset_index(drop=True)
        return list(zip(df["doc_a"], df["doc_b"], df["j_milli"]))

    a = canon(jaccard_near_dups(ray.data.from_arrow(table), threshold=0.5))
    b = canon(jaccard_near_dups_inline(ray.data.from_arrow(table),
                                       threshold=0.5))
    assert a == b
    assert len(a) >= 4     # planted clusters found (incl. the exact dup)


# -- line-level dedup (C4 / RefinedWeb) --------------------------------------

def test_line_dedup_semantics(ray_session):
    """Keep-first by (doc, pos) corpus-wide, within-doc dups dropped,
    empty lines structural (never deduped), null text → ''."""
    import ray

    from docling_ray.stages.dedup import line_dedup

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha\nshared footer\nbeta",
            "gamma\nshared footer\nalpha",
            "gamma\n\ndelta\n\nepsilon",   # two empty lines, both kept
            None,
        ])})
    out = {r["doc_id"]: (r["text_clean"], r["n_lines_dropped"])
           for r in line_dedup(ray.data.from_arrow(t).repartition(3),
                               num_partitions=8).take_all()}
    assert out == {
        0: ("alpha\nshared footer\nbeta", 0),
        1: ("gamma", 2),
        2: ("\ndelta\n\nepsilon", 1),
        3: ("", 0),
    }


def test_line_dedup_within_doc_and_ids(ray_session):
    """Within-doc repeats collapse to the first position; string doc ids
    work (generic id contract, the dup_windows take()-based pattern)."""
    import ray

    from docling_ray.stages.dedup import line_dedup

    t = pa.table({
        "doc_id": pa.array(["b", "a"], pa.string()),
        "text": pa.array(["x\nx\nx\ny", "x\nz"])})
    out = {r["doc_id"]: (r["text_clean"], r["n_lines_dropped"])
           for r in line_dedup(ray.data.from_arrow(t).repartition(2),
                               num_partitions=4).take_all()}
    # keep-first orders by doc_id ASC: "a" wins the shared line "x"
    assert out == {"a": ("x\nz", 0), "b": ("y", 3)}


def test_line_dedup_join_backend_identical(ray_session):
    """backend='join' (anti-join shape, no driver/actor drop-set copy)
    is row-identical to the broadcast default on a corpus with
    cross-doc dups, within-doc dups, empty lines and null text."""
    import ray

    from docling_ray.stages.dedup import line_dedup

    texts = []
    for i in range(40):
        lines = [f"unique line {i}-{j}" for j in range(3)]
        if i % 2 == 0:
            lines.insert(1, "shared footer")       # cross-doc dup
        if i % 5 == 0:
            lines += ["repeat me", "repeat me"]    # within-doc dup
        if i % 7 == 0:
            lines.insert(0, "")                    # structural empty
        texts.append("\n".join(lines))
    texts[13] = None
    t = pa.table({"doc_id": pa.array(list(range(40)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def run(backend):
        ds = ray.data.from_arrow(t).repartition(5)
        rows = line_dedup(ds, num_partitions=8,
                          backend=backend).take_all()
        return sorted(((r["doc_id"], r["text_clean"],
                        r["n_lines_dropped"]) for r in rows))

    assert run("broadcast") == run("join")

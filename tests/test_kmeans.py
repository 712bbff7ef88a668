"""Distributed Lloyd's k-means (docling_ray/stages/kmeans.py)."""

import numpy as np
import pyarrow as pa

from docling_ray.stages.kmeans import kmeans_fit, seeded_centroids


def _blob_table(rng, centers, per, spread=0.05):
    rows = []
    for c in centers:
        rows.append(c + rng.normal(scale=spread, size=(per, len(c))))
    m = np.concatenate(rows)
    return pa.table({"embedding": pa.array(list(m), pa.list_(pa.float64()))})


def test_kmeans_recovers_blobs_and_inertia_monotone(ray_session):
    import ray

    rng = np.random.default_rng(4)
    centers = np.eye(4) * 3.0                       # 4 well-separated blobs
    t = _blob_table(rng, centers, per=120)
    ds = ray.data.from_arrow(t).repartition(6)
    fit = kmeans_fit(ds, k=4, dim=4, iters=6, seed=1)
    # Lloyd's monotonicity: the objective never increases
    h = fit["inertia"]
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))
    # converged centroids sit on the true blob centers (≤ spread/3 err)
    got = fit["centroids"]
    for c in centers:
        d = np.min(np.linalg.norm(got - c, axis=1))
        assert d < 0.05, (c, d)
    # every point accounted for
    assert fit["counts"].sum() == 480


def test_kmeans_deterministic_rerun(ray_session):
    import ray

    rng = np.random.default_rng(8)
    t = _blob_table(rng, np.eye(3) * 2.0, per=60)
    ds = ray.data.from_arrow(t).repartition(4)
    a = kmeans_fit(ds, k=3, dim=3, iters=4, seed=2)
    b = kmeans_fit(ds, k=3, dim=3, iters=4, seed=2)
    assert np.array_equal(a["centroids"], b["centroids"])
    assert a["inertia"] == b["inertia"]


def test_kmeans_first_round_matches_seeded_ivf_anchors(ray_session):
    """Round 1 assigns against seeded_centroids(seed) — the identical
    data-independent anchors the IVF quantizer uses, so the trained
    codebook genuinely 'drops into the same slot' (ann.py contract).
    Seeded anchors maximize dot over UNIT vectors while Lloyd assigns by
    euclidean distance; on unit-norm inputs the two rules coincide."""
    from docling_ray.stages.ann import IvfAnchors

    rng = np.random.default_rng(12)
    m = rng.normal(size=(200, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)   # unit-norm inputs
    ivf = IvfAnchors(dim=16, n_anchors=8, seed=29)
    assert np.allclose(ivf.anchors, seeded_centroids(16, 8, seed=29))
    ivf_assign = ivf.assign(m)

    cents = seeded_centroids(16, 8, seed=29)
    scores = m @ cents.T - 0.5 * np.einsum("ij,ij->i", cents, cents)
    km_assign = np.argmax(scores, axis=1)
    # anchors are unit-norm too, so the −||c||²/2 term is constant
    assert np.array_equal(ivf_assign, km_assign)


def test_trained_codebook_drops_into_ivf_and_beats_seeded(ray_session):
    """End-to-end slot proof: kmeans_fit centroids → ivf_topk(codebook=)
    with nprobe=1 achieves perfect recall on blob-clustered data (each
    query's true neighbors live in its own cluster's inverted list),
    while the data-independent seeded anchors cannot do better."""
    import ray

    from docling_ray.stages.ann import brute_force_topk, ivf_topk
    from docling_ray.stages.kmeans import kmeans_fit

    rng = np.random.default_rng(7)
    dim, k = 16, 8
    centers = np.zeros((k, dim))
    centers[np.arange(k), np.arange(k)] = 3.0       # orthogonal blob dirs
    t = _blob_table(rng, centers, per=50)
    t = t.append_column("vec_id", pa.array(range(t.num_rows), pa.int64()))
    ds = ray.data.from_arrow(t).repartition(5)

    fit = kmeans_fit(ds, k=k, dim=dim, iters=5, seed=3)
    qids = [0, 75, 260]
    qvecs = np.asarray([t["embedding"][i].as_py() for i in qids])

    truth = brute_force_topk(ds, qids, qvecs, k=5)
    trained = ivf_topk(ds, qids, qvecs, k=5, dim=dim, nprobe=1,
                       codebook=fit["centroids"])
    seeded = ivf_topk(ds, qids, qvecs, k=5, dim=dim,
                      n_anchors=k, nprobe=1)

    def pairs(tab):
        return set(zip(tab["query_id"].to_pylist(),
                       tab["vec_id"].to_pylist()))

    truth_p = pairs(truth)
    rec_trained = len(pairs(trained) & truth_p) / len(truth_p)
    rec_seeded = len(pairs(seeded) & truth_p) / len(truth_p)
    assert rec_trained == 1.0, rec_trained
    assert rec_trained >= rec_seeded


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray

    # all points in one tight blob → most clusters stay empty
    rng = np.random.default_rng(3)
    t = _blob_table(rng, [np.zeros(4) + 5.0], per=50)
    ds = ray.data.from_arrow(t)
    fit = kmeans_fit(ds, k=6, dim=4, iters=3, seed=5, init="seeded")
    init = seeded_centroids(4, 6, seed=5)
    empty = fit["counts"] == 0
    assert empty.sum() >= 4
    assert np.array_equal(fit["centroids"][empty], init[empty])


def _embed_table(vecs, ids=None):
    import pyarrow as pa

    ids = ids if ids is not None else list(range(len(vecs)))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float64())),
    })


def test_semantic_dedup_drops_within_cluster_neighbors(ray_session):
    import ray

    from docling_ray.stages.kmeans import semantic_dedup

    cents = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    vecs = [
        [1.0, 0.0, 0.0, 0.0],      # id 0 — kept (lowest in its near-set)
        [0.99, 0.01, 0.0, 0.0],    # id 1 — cos≈1 with id 0 → dropped
        [0.9, 0.0, 0.3, 0.0],      # id 2 — cos≈0.9 with id 0 → dropped
        [1.0, 0.0, -2.0, 0.0],     # id 3 — same cluster, far → kept
        [0.0, 1.0, 0.0, 0.0],      # id 4 — other cluster → kept
    ]
    ds = ray.data.from_arrow(_embed_table(vecs)).repartition(3)
    kept = sorted(r["vec_id"]
                  for r in semantic_dedup(ds, cents, 0.85).take_all())
    assert kept == [0, 3, 4]


def test_semantic_dedup_cross_cluster_pair_survives(ray_session):
    import ray

    from docling_ray.stages.kmeans import semantic_dedup

    # two near-identical vectors whose nearest centroids differ: the
    # documented SemDeDup miss — both kept
    cents = np.array([[1.0, 0.04, 0.0, 0.0], [1.0, -0.04, 0.0, 0.0]])
    vecs = [[1.0, 0.01, 0.0, 0.0], [1.0, -0.01, 0.0, 0.0]]
    ds = ray.data.from_arrow(_embed_table(vecs))
    kept = sorted(r["vec_id"]
                  for r in semantic_dedup(ds, cents, 0.9).take_all())
    assert kept == [0, 1]


def test_semantic_dedup_partition_invariant(ray_session):
    import ray

    from docling_ray.stages.kmeans import semantic_dedup, seeded_centroids

    rng = np.random.default_rng(23)
    base = rng.normal(size=(40, 8))
    # plant near-dups: rows 40..49 are jittered copies of rows 0..9
    vecs = np.vstack([base, base[:10] + 1e-3 * rng.normal(size=(10, 8))])
    cents = seeded_centroids(8, 4, seed=3)
    outs = []
    for p in (1, 7):
        ds = ray.data.from_arrow(_embed_table(vecs.tolist())).repartition(p)
        outs.append(sorted(
            (r["vec_id"], r["cluster_id"])
            for r in semantic_dedup(ds, cents, 0.98).take_all()))
    assert outs[0] == outs[1]
    kept_ids = {v for v, _ in outs[0]}
    # every jittered copy shares its original's cluster → dropped
    assert all(40 + i not in kept_ids for i in range(10))
    assert all(i in kept_ids for i in range(40))

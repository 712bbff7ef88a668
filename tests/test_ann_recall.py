"""Empirical check of the documented LSH recall bound
(``stages/ann.py::lsh_bucketed_pairs``): recall for a pair at angle θ is
1-(1-(1-θ/π)^ppb)^bands, ≈0.939 at cos 0.5 with 8 bands × 3 planes, and
precision is exactly 1 (candidates are cosine-verified)."""

import numpy as np
import pyarrow as pa


def _planted_corpus(n_pairs: int = 80, n_noise: int = 100, dim: int = 64,
                    seed: int = 123):
    """Unit vectors with ``n_pairs`` planted pairs at cos in [0.55, 0.95]
    (strictly above the 0.5 threshold so ground truth is unambiguous)
    plus isotropic noise (cos ≈ 0 at dim 64)."""
    rng = np.random.RandomState(seed)
    vecs = []
    for _ in range(n_pairs):
        u = rng.normal(size=dim)
        u /= np.linalg.norm(u)
        w = rng.normal(size=dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        cos = rng.uniform(0.55, 0.95)
        v = cos * u + np.sqrt(1 - cos * cos) * w
        vecs.append(u)
        vecs.append(v)
    for _ in range(n_noise):
        z = rng.normal(size=dim)
        vecs.append(z / np.linalg.norm(z))
    return np.asarray(vecs)


def test_lsh_bucketed_pairs_recall_meets_analytic_bound(ray_session):
    import ray.data

    from docling_ray.stages.ann import cosine_pairs_blockwise, lsh_bucketed_pairs

    vecs = _planted_corpus()
    n = len(vecs)
    table = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(table)
    truth_df = cosine_pairs_blockwise(ds, threshold=0.5, num_blocks=4) \
        .to_pandas()
    truth = set(zip(truth_df["vec_a"], truth_df["vec_b"]))
    assert len(truth) >= 60, "corpus must plant a meaningful pair count"

    got_df = lsh_bucketed_pairs(ds, threshold=0.5, num_bands=8,
                                planes_per_band=3, dim=64).to_pandas()
    got = set(zip(got_df["vec_a"], got_df["vec_b"]))
    # precision is 1 by construction (exact in-bucket rerank)
    assert got <= truth
    assert len(got_df) == len(got), "duplicate pair emitted"

    # analytic recall at the WORST planted angle (cos 0.55):
    # p = 1-(1-(1-θ/π)^3)^8 ≈ 0.952; pairs closer than that recall higher.
    theta_max = np.arccos(0.55)
    p_worst = 1 - (1 - (1 - theta_max / np.pi) ** 3) ** 8
    recall = len(got & truth) / len(truth)
    # 3σ sampling slack below the worst-case analytic bound
    sigma = np.sqrt(p_worst * (1 - p_worst) / len(truth))
    assert recall >= p_worst - 3 * sigma, (recall, p_worst)


def test_ivf_topk_matches_probed_bruteforce(ray_session):
    """IVF top-k must equal the in-memory reference: score only vectors
    whose anchor assignment is in the query's nprobe probe list, rank by
    (cosine desc, vec_id)."""
    import ray.data

    from docling_ray.stages.ann import IvfAnchors, _normalize, ivf_topk

    rng = np.random.RandomState(8)
    vecs = rng.normal(size=(200, 64))
    table = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(table)
    out = ivf_topk(ds, [0, 1], vecs[:2], k=5, dim=64,
                   n_anchors=8, nprobe=3).to_pandas()

    ivf = IvfAnchors(dim=64, n_anchors=8, seed=29)
    aid = ivf.assign(vecs)
    normed = _normalize(vecs)
    for qi in (0, 1):
        q = _normalize(vecs[qi:qi + 1])[0]
        probe = set(np.argsort(-(q @ ivf.anchors.T), kind="stable")[:3])
        cand = [i for i in range(200) if aid[i] in probe]
        ranked = sorted(cand, key=lambda i: (-(normed[i] @ q), i))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == ranked
        # every result row really is in a probed list
        assert all(aid[v] in probe for v in got)

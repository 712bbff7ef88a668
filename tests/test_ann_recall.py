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


def test_pq_topk_recall_and_determinism(ray_session):
    """PQ/ADC top-k: (a) HIGH-similarity recall — each query's planted
    partner (cos ∈ [0.55, 0.95]) lands in its top-10 and the query's own
    vector ranks first; the top-10 TAIL among isotropic noise (cos ≈ 0)
    is not preserved by 8-byte codes and is not the property PQ is for;
    (b) output is invariant to partitioning; (c) a learned per-subspace
    codebook drops into the same slot."""
    import ray.data

    from docling_ray.stages.ann import pq_topk

    vecs = _planted_corpus(n_pairs=40, n_noise=120)
    n = len(vecs)
    table = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    # pair members sit at ids (2i, 2i+1); query the even member
    qids = [0, 2, 4, 6, 8, 10, 12, 14]
    qvecs = vecs[qids]
    ds = ray.data.from_arrow(table)
    got = pq_topk(ds, qids, qvecs, k=10, dim=64, m=8).to_pandas()
    assert len(got) == 80
    partner_hits = sum(
        int(q + 1 in set(got[got["query_id"] == q]["vec_id"]))
        for q in qids)
    assert partner_hits >= 7, f"partner recall {partner_hits}/8"
    top1 = got[got["rank"] == 1].set_index("query_id")["vec_id"]
    assert all(top1[q] == q for q in qids), "self must survive quantization"

    # partition invariance
    got2 = pq_topk(ray.data.from_arrow(table).repartition(7),
                   qids, qvecs, k=10, dim=64, m=8).to_pandas()
    assert got.sort_values(["query_id", "rank"]).reset_index(drop=True) \
        .equals(got2.sort_values(["query_id", "rank"])
                .reset_index(drop=True))

    # learned-codebook slot: per-subspace codewords sampled from the data
    rng = np.random.RandomState(0)
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    learned = np.stack([
        normed[rng.choice(n, 16, replace=False), j * 8:(j + 1) * 8]
        for j in range(8)
    ])
    got3 = pq_topk(ds, qids, qvecs, k=10, codebooks=learned).to_pandas()
    assert len(got3) == 80
    partner3 = sum(
        int(q + 1 in set(got3[got3["query_id"] == q]["vec_id"]))
        for q in qids)
    assert partner3 >= 7


def test_pq_encode_shapes_and_ties():
    from docling_ray.stages.ann import PqCodebooks

    pq = PqCodebooks(dim=64, m=8, k=16, seed=31)
    mat = np.zeros((3, 64))
    codes = pq.encode(mat)
    assert codes.shape == (3, 8) and codes.dtype == np.uint8
    # identical rows encode identically (and ties break deterministically)
    assert (codes[0] == codes[1]).all() and (codes[1] == codes[2]).all()
    lut = pq.lut_micro(np.ones(64) / 8.0)
    assert lut.shape == (8, 16) and lut.dtype == np.int64


def test_pq_stage_empty_batch():
    import ray

    from docling_ray.stages.ann import PqCodebooks, PqTopK

    pq = PqCodebooks(dim=64, m=8, k=16, seed=31)
    luts = np.stack([pq.lut_micro(np.ones(64) / 8.0)])
    stage = PqTopK({"pq": pq, "query_ids": [0], "luts": luts}, k=5)
    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    })
    out = stage(empty)
    assert out.num_rows == 0
    assert out.schema.field("adc_micro").type == pa.int64()

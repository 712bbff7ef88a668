"""Distributed Lloyd's k-means over an embedding column — the iterative
algorithm that trains the IVF coarse quantizer (`stages/ann.py`'s
``AnchorAssignStage`` docstring reserves exactly this slot: "a learned
k-means codebook drops into the same slot").

Iteration shape (the mergeable-statistics pattern — same family as the
HLL sketch, stages/sketch.py):

- centroids broadcast once per round (``ray.put``; each map task reads
  them zero-copy from the object store),
- ONE ``map_batches`` pass per round emits k fixed-size partial rows per
  batch: (cluster_id, sum_vec, count, partial_inertia) — assignment is a
  single (B, k) matmul, partial sums one ``np.add.at`` scatter,
- the driver merges ≤ k × num_batches tiny rows and updates centroids.

No shuffle of vectors at any round; the corpus-side cost is one matmul
pass per iteration.  Empty clusters keep their previous centroid (the
standard Lloyd fallback).  Everything is deterministic given (seed,
data): seeded init, float64 partial sums merged in cluster order, so
assignments/inertia are run- and partition-invariant to the usual
floating-point-associativity caveat — the tests pin determinism by
re-running the whole fit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_ray.stages.ann import _to_matrix


def seeded_centroids(dim: int, k: int, seed: int = 29) -> np.ndarray:
    """Data-independent seeded init — bit-identical to
    ``ann.IvfAnchors(dim, k, seed).anchors`` (same legacy ``RandomState``
    stream), so a fit at iters=0 IS the existing seeded quantizer."""
    rng = np.random.RandomState(seed)
    c = rng.normal(size=(k, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _partials_batch(batch: pa.Table, centroids_ref,
                    column: str) -> pa.Table:
    """One batch → k partial rows (cluster_id, sum_vec, count, inertia).
    Assignment by squared euclidean distance (argmin ||v-c||² =
    argmax v·c − ||c||²/2 — one matmul)."""
    import ray

    cents = (centroids_ref if isinstance(centroids_ref, np.ndarray)
             else ray.get(centroids_ref))
    k, dim = cents.shape
    m = _to_matrix(batch[column])
    scores = m @ cents.T - 0.5 * np.einsum("ij,ij->i", cents, cents)
    assign = np.argmax(scores, axis=1)
    sums = np.zeros((k, dim), dtype=np.float64)
    np.add.at(sums, assign, m)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    # ||v-c||² summed per cluster: ||v||² − 2·best_score  (best_score
    # already folds the −||c||²/2 term)
    sq = np.einsum("ij,ij->i", m, m)
    inert = sq - 2.0 * scores[np.arange(len(m)), assign]
    inertia = np.zeros(k, dtype=np.float64)
    np.add.at(inertia, assign, inert)
    return pa.table({
        "cluster_id": pa.array(np.arange(k, dtype=np.int64)),
        "sum_vec": pa.array(list(sums), pa.list_(pa.float64())),
        "count": pa.array(counts),
        "inertia": pa.array(inertia),
    })


def assign_clusters(ds, centroids: np.ndarray, column: str = "embedding",
                    id_column: str = "vec_id"):
    """Per-row nearest-centroid assignment (the inference half of the
    operator): centroids broadcast ONCE via ``ray.put``, one stateless
    ``map_batches`` pass, assignment = one (B, k) matmul per batch with
    the same argmin-||v−c||² / lowest-id tie-break as the fit.  Returns a
    Dataset of ``(id_column, cluster_id)``."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)                     # zero-copy, node-local
        m = _to_matrix(batch[column])
        scores = m @ cents.T - 0.5 * np.einsum("ij,ij->i", cents, cents)
        return pa.table({
            id_column: batch[id_column],
            "cluster_id": pa.array(np.argmax(scores, axis=1)
                                   .astype(np.int64)),
        })

    return ds.map_batches(_assign, batch_format="pyarrow")


def kmeanspp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic k-means++ seeding over a bounded driver-side sample
    (the standard cure for random init capturing two blobs with one
    centroid while empty ones never move — Arthur & Vassilvitskii 2007).
    """
    rng = np.random.default_rng(seed)
    n = len(sample)
    chosen = [int(rng.integers(n))]
    d2 = np.sum((sample - sample[chosen[0]]) ** 2, axis=1)
    for _ in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        c = int(rng.choice(n, p=p))
        chosen.append(c)
        d2 = np.minimum(d2, np.sum((sample - sample[c]) ** 2, axis=1))
    return sample[chosen].astype(np.float64, copy=True)


def kmeans_fit(ds, k: int = 16, dim: int = 64, iters: int = 5,
               seed: int = 29, column: str = "embedding",
               init: str = "kmeans++", sample_size: int = 1024) -> dict:
    """Returns ``{"centroids": (k, dim) ndarray, "counts": int64[k],
    "inertia": [per-iter float]}``.  ``inertia[i]`` is the objective
    UNDER the assignment computed with iteration i's input centroids —
    non-increasing across iterations (Lloyd's monotonicity).

    ``init="kmeans++"`` (default) seeds from the first ``sample_size``
    rows (one bounded ``limit().take_all()`` — deterministic);
    ``init="seeded"`` uses the data-independent IVF anchors, proving the
    trained codebook drops into the same quantizer slot."""
    import ray

    if init == "seeded":
        cents = seeded_centroids(dim, k, seed)
    else:
        rows = ds.limit(sample_size).take_all()
        sample = np.asarray([r[column] for r in rows], dtype=np.float64)
        cents = kmeanspp_init(sample, k, seed)
    counts = np.zeros(k, dtype=np.int64)
    history: list[float] = []
    for _ in range(max(1, iters)):
        ref = ray.put(cents)
        partials = ds.map_batches(
            lambda b: _partials_batch(b, ref, column),
            batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        # deterministic merge: partial rows accumulate per cluster_id,
        # and each per-cluster sum is itself a fixed-order reduction
        for row in sorted(partials, key=lambda r: r["cluster_id"]):
            cid = row["cluster_id"]
            sums[cid] += np.asarray(row["sum_vec"], dtype=np.float64)
            counts[cid] += row["count"]
            inertia += row["inertia"]
        history.append(float(inertia))
        nonempty = counts > 0
        new = cents.copy()                  # empty cluster → keep old
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = new
    return {"centroids": cents, "counts": counts, "inertia": history}


def _cluster_semantic_dedup(group: pa.Table, threshold: float,
                            column: str, id_column: str) -> pa.Table:
    """One cluster → its kept rows.  Drop rule (order-independent,
    mirrored by the oracle's EXISTS): a row is dropped iff some
    same-cluster row with a LOWER id has cosine ≥ threshold — the
    pair-based keep-lowest semantics the simhash/minhash drop family
    uses.  Pairwise cosines run as chunked matmuls against the id-sorted
    prefix, bounding the live intermediate."""
    ids = group[id_column].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    m = _to_matrix(group[column])[order]
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    x = m / norms[:, None]
    n = len(x)
    drop = np.zeros(n, dtype=bool)
    chunk = max(1, int((16 << 20) // (max(n, 1) * 8)))
    for s in range(1, n, chunk):
        e = min(n, s + chunk)
        sims = x[s:e] @ x.T                      # (chunk, n)
        js = np.arange(s, e)[:, None]
        hit = (sims >= threshold) & (np.arange(n)[None, :] < js)
        drop[s:e] = hit.any(axis=1)
    keep_pos = order[~drop]
    return pa.table({
        id_column: group[id_column].take(pa.array(keep_pos, pa.int64())),
        "cluster_id": group["cluster_id"].take(
            pa.array(keep_pos, pa.int64())),
    })


def semantic_dedup(ds, centroids: np.ndarray, threshold: float = 0.5,
                   column: str = "embedding", id_column: str = "vec_id"):
    """SemDeDup-shaped semantic deduplication: cluster the embedding
    space with a (trained or seeded) codebook, then drop near-identical
    rows WITHIN each cluster — the published recipe that makes
    embedding-level dedup sub-quadratic (pairwise cosines only inside
    clusters, never across the corpus).

    ONE stateless assignment pass (broadcast centroids, one matmul per
    batch) → ONE ``groupby(cluster_id)`` shuffle of (id, vector) rows →
    vectorized chunked in-cluster dedup.  Returns kept
    ``(id_column, cluster_id)`` rows.  Cluster sizes bound worker
    memory: size k to the corpus (the k-means fit is distributed) so
    clusters stay ≪ corpus; cross-cluster near-dups are missed by
    construction — the documented SemDeDup trade."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign_keep_vec(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        m = _to_matrix(batch[column])
        scores = m @ cents.T - 0.5 * np.einsum("ij,ij->i", cents, cents)
        return pa.table({
            id_column: batch[id_column],
            column: batch[column],
            "cluster_id": pa.array(np.argmax(scores, axis=1)
                                   .astype(np.int64)),
        })

    assigned = ds.map_batches(_assign_keep_vec, batch_format="pyarrow")
    return assigned.groupby("cluster_id").map_groups(
        lambda g: _cluster_semantic_dedup(g, threshold, column, id_column),
        batch_format="pyarrow")

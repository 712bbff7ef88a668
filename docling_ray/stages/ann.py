"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every ``map_batches`` task computes a *partial* top-k for its
batch (numpy matmul); partials are tiny (k rows per query per batch) and the
final merge is a small driver-side reduction.  Scale path: LSH-bucketed
variant (random hyperplane signatures) that prunes candidates to matching
buckets before the exact rerank — same broadcast pattern, one extra
``groupby``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _to_matrix(column: pa.ChunkedArray) -> np.ndarray:
    rows = column.to_pylist()
    return np.asarray(rows, dtype=np.float64)


def _normalize(matrix: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return matrix / norms


class BruteForceTopK:
    """Actor-pool stage: holds the broadcast query matrix; emits per-batch
    partial top-k rows (query_id, vec_id, cosine)."""

    def __init__(self, queries_ref, k: int = 10,
                 id_column: str = "vec_id", vec_column: str = "embedding"):
        queries = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = np.asarray(queries["ids"])
        self.query_mat = _normalize(np.asarray(queries["vectors"], dtype=np.float64))
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_to_matrix(batch[self.vec_column]))
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        sims = self.query_mat @ mat.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in top[qi]:
                out_q.append(int(self.query_ids[qi]))
                out_v.append(ids[j])
                out_s.append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v),
            "cosine": pa.array(out_s, pa.float64()),
        })


def brute_force_topk(ds, query_ids: list[int], query_vectors: np.ndarray,
                     k: int = 10, concurrency: int = 4) -> pa.Table:
    """Full pipeline: broadcast queries → partial top-k per batch → final
    exact top-k merge (small: n_queries × k × n_blocks rows)."""
    queries_ref = ray.put({"ids": query_ids, "vectors": query_vectors})
    partials = ds.map_batches(
        BruteForceTopK, batch_format="pyarrow",
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        concurrency=concurrency)
    merged = partials.to_arrow_refs()
    table = pa.concat_tables([ray.get(r) for r in merged])
    # final exact top-k per query (ties broken by vec_id for determinism)
    out_chunks = []
    for qid in sorted(set(query_ids)):
        mask = pa.compute.equal(table["query_id"], qid)
        sub = table.filter(mask)
        order = sorted(
            range(sub.num_rows),
            key=lambda i: (-sub["cosine"][i].as_py(), sub["vec_id"][i].as_py()))
        take = order[:k]
        ranked = sub.take(take)
        ranked = ranked.append_column(
            "rank", pa.array(list(range(1, len(take) + 1)), pa.int32()))
        out_chunks.append(ranked)
    return pa.concat_tables(out_chunks)


class CosinePairsStage:
    """Embedding-cosine near-dup: each batch row is compared against the
    broadcast full matrix; a pair (a, b) is emitted by the batch holding
    ``a`` with ``b > a`` only, so the union over batches is exact and
    duplicate-free.  Broadcast side must fit worker memory — the LSH-bucket
    variant below is the 100 TB path."""

    def __init__(self, all_ref, threshold: float,
                 id_column: str = "vec_id", vec_column: str = "embedding"):
        data = ray.get(all_ref) if isinstance(all_ref, ray.ObjectRef) else all_ref
        self.all_ids = np.asarray(data["ids"], dtype=np.int64)
        self.all_mat = _normalize(np.asarray(data["vectors"], dtype=np.float64))
        self.threshold = threshold
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_to_matrix(batch[self.vec_column]))
        ids = np.asarray(batch[self.id_column].to_pylist(), dtype=np.int64)
        sims = mat @ self.all_mat.T
        rows_a, rows_b = np.where(sims >= self.threshold)
        out_a, out_b = [], []
        for i, j in zip(rows_a, rows_b):
            a, b = int(ids[i]), int(self.all_ids[j])
            if a < b:
                out_a.append(a)
                out_b.append(b)
        return pa.table({
            "vec_a": pa.array(out_a, pa.int64()),
            "vec_b": pa.array(out_b, pa.int64()),
        })


def cosine_pairs(ds, ids: list[int], vectors: np.ndarray, threshold: float,
                 concurrency: int = 4):
    all_ref = ray.put({"ids": ids, "vectors": vectors})
    return ds.map_batches(
        CosinePairsStage, batch_format="pyarrow",
        fn_constructor_kwargs={"all_ref": all_ref, "threshold": threshold},
        concurrency=concurrency)


class HyperplaneLSH:
    """Random-hyperplane signatures for the bucketed ANN scale path."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim))

    def signature(self, matrix: np.ndarray) -> np.ndarray:
        bits = (matrix @ self.planes.T) > 0
        out = np.zeros(len(matrix), dtype=np.uint64)
        for b in range(bits.shape[1]):
            out |= bits[:, b].astype(np.uint64) << np.uint64(b)
        return out


def lsh_bucket_batch(batch: pa.Table, lsh: HyperplaneLSH,
                     vec_column: str = "embedding") -> pa.Table:
    sig = lsh.signature(_to_matrix(batch[vec_column]))
    return batch.append_column("lsh_bucket", pa.array(sig, pa.uint64()))

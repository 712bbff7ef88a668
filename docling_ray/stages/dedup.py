"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (designed for the 100 TB corpus, validated at test scale):

- **exact**: md5-fingerprint inside ``map_batches`` (no payload shuffle of
  the text itself is needed beyond the groupby key) → hash-partitioned
  ``groupby(fingerprint)`` → first-per-group.  The one true shuffle keys on
  a 16-byte digest, not the document body.
- **MinHash+LSH**: shingle → k minhashes per doc (vectorized numpy) →
  ``flat_map`` band rows → ``groupby(band_key)`` → candidate pairs verified
  by true shingle-set Jaccard inside the group.  Only (band_key, doc_id,
  signature-slice) rows shuffle — tiny vs. the corpus.
- **SimHash**: 64-bit signatures; near-dup = Hamming distance ≤ k, bucketed
  by signature quarters so comparisons stay within groups.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pyarrow as pa

# -- minhash ----------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingles_of(text: str, k: int = 3) -> set[int]:
    """k-word shingles hashed to 64-bit ints (md5-based, process-stable)."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return {
        int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
        for g in grams
    }


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(a.shape, _MERSENNE, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, vectorized over (perm, shingle)
    prods = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return prods.min(axis=1)


class MinHashStage:
    """Adds a fixed-width minhash signature column; hash params are built
    once per actor (``map_batches(MinHashStage, concurrency=N)``)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        self.a, self.b = _hash_params(num_perm, seed)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = []
        for v in batch["text"]:
            sig = minhash_signature(shingles_of(v.as_py() or "", self.shingle_k),
                                    self.a, self.b)
            sigs.append(sig.astype("uint64").tolist())
        return batch.append_column(
            "minhash", pa.array(sigs, pa.list_(pa.uint64(), self.num_perm)))


def band_rows(batch: pa.Table, num_bands: int = 16) -> pa.Table:
    """Explode each doc into (band_key, doc_id) rows — the LSH shuffle is
    over these tiny rows only."""
    doc_ids, band_keys, sig_hexes = [], [], []
    rows_per_band = None
    for doc_id, sig in zip(batch["doc_id"], batch["minhash"]):
        sig_list = sig.as_py()
        if rows_per_band is None:
            rows_per_band = max(1, len(sig_list) // num_bands)
        sig_bytes = b"".join(int(x).to_bytes(8, "big") for x in sig_list)
        for band in range(num_bands):
            chunk = sig_list[band * rows_per_band:(band + 1) * rows_per_band]
            digest = hashlib.md5(
                band.to_bytes(2, "big")
                + b"".join(int(x).to_bytes(8, "big") for x in chunk)
            ).hexdigest()
            doc_ids.append(doc_id.as_py())
            band_keys.append(digest)
            sig_hexes.append(sig_bytes.hex())
    return pa.table({
        "band_key": pa.array(band_keys, pa.string()),
        "doc_id": pa.array(doc_ids),
        "sig": pa.array(sig_hexes, pa.string()),
    })


def candidate_pairs_from_band(group: pa.Table) -> pa.Table:
    """Within one LSH bucket, emit unordered candidate doc-id pairs with the
    estimated Jaccard from the full signatures."""
    ids = [v.as_py() for v in group["doc_id"]]
    sigs = [np.frombuffer(bytes.fromhex(v.as_py()), dtype=">u8") for v in group["sig"]]
    a_ids, b_ids, est = [], [], []
    order = np.argsort(np.array(ids, dtype=object))
    for i_pos in range(len(order)):
        for j_pos in range(i_pos + 1, len(order)):
            i, j = order[i_pos], order[j_pos]
            if ids[i] == ids[j]:
                continue
            sim = float((sigs[i] == sigs[j]).mean())
            a_ids.append(min(ids[i], ids[j]))
            b_ids.append(max(ids[i], ids[j]))
            est.append(sim)
    return pa.table({
        "doc_a": pa.array(a_ids),
        "doc_b": pa.array(b_ids),
        "est_jaccard": pa.array(est, pa.float64()),
    })


def minhash_near_dups(ds, num_perm: int = 64, num_bands: int = 16,
                      threshold: float = 0.7, concurrency: int = 4):
    """Full MinHash-LSH near-dup pipeline over a (doc_id, text) dataset.

    Returns a dataset of distinct (doc_a, doc_b) candidate pairs whose
    signature similarity ≥ threshold.
    """
    sig = ds.map_batches(MinHashStage, batch_format="pyarrow",
                         fn_constructor_kwargs={"num_perm": num_perm},
                         concurrency=concurrency)
    bands = sig.map_batches(
        lambda b: band_rows(b, num_bands=num_bands), batch_format="pyarrow")
    pairs = bands.groupby("band_key").map_groups(
        candidate_pairs_from_band, batch_format="pyarrow")
    pairs = pairs.filter(lambda r: r["est_jaccard"] >= threshold)
    # same pair can surface from several bands → dedupe on (doc_a, doc_b)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


# -- exact dedup ------------------------------------------------------------

def exact_dedup_keep_first(ds, key_column: str = "fingerprint",
                           order_column: str = "doc_id"):
    """Hash-partitioned first-per-group (the reference keys documents by
    content sha-256, ``/root/reference/docling/utils/utils.py:19-37``)."""
    import pyarrow.compute as pc

    def keep_min(group: pa.Table) -> pa.Table:
        idx = pc.index(pc.equal(group[order_column],
                                pc.min(group[order_column])), True).as_py()
        return group.slice(idx, 1)

    return ds.groupby(key_column).map_groups(keep_min, batch_format="pyarrow")


# -- simhash near-dup -------------------------------------------------------

def simhash_bucket_rows(batch: pa.Table, bits: int = 64,
                        num_buckets: int = 4) -> pa.Table:
    """Explode per-doc simhash into quarter-signature buckets: two docs at
    Hamming distance ≤ num_buckets-1 share at least one exact quarter."""
    doc_ids, keys, hashes = [], [], []
    step = bits // num_buckets
    for doc_id, sh in zip(batch["doc_id"], batch["simhash"]):
        value = int(sh.as_py(), 16)
        for q in range(num_buckets):
            part = (value >> (q * step)) & ((1 << step) - 1)
            doc_ids.append(doc_id.as_py())
            keys.append(f"{q}:{part:0{step // 4}x}")
            hashes.append(sh.as_py())
    return pa.table({
        "bucket": pa.array(keys, pa.string()),
        "doc_id": pa.array(doc_ids),
        "simhash": pa.array(hashes, pa.string()),
    })


def simhash_pairs_from_bucket(group: pa.Table, max_hamming: int = 3) -> pa.Table:
    ids = [v.as_py() for v in group["doc_id"]]
    values = [int(v.as_py(), 16) for v in group["simhash"]]
    a_ids, b_ids, dists = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ids[i] == ids[j]:
                continue
            d = bin(values[i] ^ values[j]).count("1")
            if d <= max_hamming:
                a_ids.append(min(ids[i], ids[j]))
                b_ids.append(max(ids[i], ids[j]))
                dists.append(d)
    return pa.table({
        "doc_a": pa.array(a_ids),
        "doc_b": pa.array(b_ids),
        "hamming": pa.array(dists, pa.int32()),
    })


# -- exact n-gram jaccard ---------------------------------------------------

def jaccard_pairs_in_group(group: pa.Table, threshold: float,
                           shingle_k: int) -> pa.Table:
    """Brute-force shingle-set Jaccard within one (small) group — used after
    a coarse partition (e.g. lang+source) so the quadratic part stays local."""
    ids = [v.as_py() for v in group["doc_id"]]
    sets = [shingles_of(v.as_py() or "", shingle_k) for v in group["text"]]
    a_ids, b_ids, sims = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            sim = inter / union if union else 0.0
            if sim >= threshold:
                a_ids.append(min(ids[i], ids[j]))
                b_ids.append(max(ids[i], ids[j]))
                sims.append(sim)
    return pa.table({
        "doc_a": pa.array(a_ids),
        "doc_b": pa.array(b_ids),
        "jaccard": pa.array(sims, pa.float64()),
    })

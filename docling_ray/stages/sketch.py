"""Mergeable sketches: HyperLogLog count-distinct and Bloom membership.

The scale story: COUNT(DISTINCT key) done exactly needs an all-to-all
shuffle of every distinct value; the HLL register vector is a 2^p-byte
MERGEABLE summary, so distinct cardinality becomes one ``map_batches``
pass emitting a fixed-size row per (batch, group) plus an elementwise
``max`` merge — no shuffle of values at any scale, ~1.04/sqrt(2^p)
relative error (Flajolet et al. 2007, the standard analysis).

The Bloom filter is the same pattern with OR instead of max: per-batch
partial bit arrays over the reference keys merge elementwise (one
fixed-size row per batch), and the merged filter broadcasts once per
probe actor — membership tests (incremental dedup against a prior
crawl, seen-URL suppression) with no false negatives and a tunable
false-positive rate, never a shuffle.  Bit positions are the first 8
bytes of ``md5(key || ':' || i)`` mod m — DuckDB computes the IDENTICAL
positions, so a SQL mirror reproduces the probe's output bit-for-bit
INCLUDING its false positives.

Determinism: the value hash is pandas' C siphash (`pd.util.hash_array`,
fixed key — the same process-stable hash the partitioners use), and the
merge is an elementwise max, so the estimate is invariant to run,
batching, partitioning and cluster size.  With p=12 the rank field is
the low 52 bits of the hash — below 2^53, so the float64 log2 used for
the vectorized bit-length is EXACT, never an off-by-one from rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12                     # 4096 registers, ~1.6% relative error
_M = 1 << HLL_P
_RANK_BITS = 64 - HLL_P        # 52: exact in float64
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _hash64(col) -> np.ndarray:
    import pandas as pd

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pd.util.hash_array(col.to_numpy(zero_copy_only=False))


def hll_registers(values) -> np.ndarray:
    """Register vector (uint8[4096]) of one value array — the per-batch
    partial.  Vectorized: bucket = top p bits, rank = leading-zero count
    of the remaining 52 bits + 1 (0 → 53), ``np.maximum.at`` scatter."""
    h = _hash64(values)
    bucket = (h >> np.uint64(_RANK_BITS)).astype(np.int64)
    q = (h & np.uint64((1 << _RANK_BITS) - 1)).astype(np.float64)
    rank = np.full(len(h), _RANK_BITS + 1, dtype=np.uint8)
    nz = q > 0
    rank[nz] = (_RANK_BITS - np.floor(np.log2(q[nz]))).astype(np.uint8)
    regs = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_merge(parts) -> np.ndarray:
    """Elementwise max of register vectors (bytes or uint8 arrays) —
    commutative + associative + idempotent, hence partition-invariant."""
    out = np.zeros(_M, dtype=np.uint8)
    for p in parts:
        arr = np.frombuffer(p, dtype=np.uint8) if isinstance(p, bytes) \
            else p
        np.maximum(out, arr, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with the small-range linear-counting
    correction (the only regime correction our 64-bit hash needs)."""
    est = _ALPHA * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)
    return int(round(est))


def grouped_hll_partials(batch: pa.Table, group_col: str,
                         value_col: str) -> pa.Table:
    """One row per (batch, group): the group's register vector.  The
    downstream merge sees ≤ num_batches × num_groups fixed-size rows —
    the whole reduction is metadata-sized next to the corpus."""
    import pyarrow.compute as pc

    groups, regs = [], []
    gcol = batch[group_col].combine_chunks()
    for g in pc.unique(gcol):
        mask = pc.equal(gcol, g)
        vals = batch[value_col].combine_chunks().filter(
            pc.fill_null(mask, False))
        groups.append(g.as_py())
        regs.append(hll_registers(vals).tobytes())
    gtype = batch.schema.field(group_col).type
    return pa.table({group_col: pa.array(groups, gtype),
                     "regs": pa.array(regs, pa.binary())})


# -- Bloom filter -----------------------------------------------------------


def bloom_positions(key: str, m_bits: int, k_hashes: int) -> list[int]:
    """The ``k`` bit positions of one key: first 8 bytes of
    ``md5(key || ':' || i)`` mod m — mirrored verbatim by DuckDB's
    ``('0x' || substr(md5(s || ':' || i), 1, 16))::UBIGINT % m``."""
    import hashlib

    return [
        int.from_bytes(
            hashlib.md5(f"{key}:{i}".encode("utf-8")).digest()[:8],
            "big") % m_bits
        for i in range(k_hashes)
    ]


def _key_strings(col) -> list:
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.cast(col, pa.string()).to_pylist()


def bloom_partial(batch: pa.Table, key_col: str, m_bits: int,
                  k_hashes: int) -> pa.Table:
    """One batch of reference keys → one packed-bit-array row (m/8
    bytes).  Null keys set no bits (the SQL mirror's md5(NULL) drops
    them the same way)."""
    bits = np.zeros(m_bits, dtype=bool)
    for s in _key_strings(batch[key_col]):
        if s is None:
            continue
        bits[bloom_positions(s, m_bits, k_hashes)] = True
    return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                      pa.binary())})


def bloom_merge(parts) -> np.ndarray:
    """Elementwise OR of packed partials — commutative + associative +
    idempotent, hence partition-invariant (the ``hll_merge`` contract)."""
    out: np.ndarray | None = None
    for p in parts:
        arr = np.frombuffer(p, dtype=np.uint8) if isinstance(p, bytes) \
            else np.asarray(p, dtype=np.uint8)
        out = arr.copy() if out is None else np.bitwise_or(out, arr)
    if out is None:
        raise ValueError("bloom_merge: no partials")
    return out


def build_bloom(ds, key_col: str, m_bits: int = 1 << 20,
                k_hashes: int = 3) -> bytes:
    """Distributed build: per-batch partial bit arrays (map_batches) →
    driver OR-fold of the bounded partial set (num_batches × m/8 bytes).
    Returns the packed filter, ready for ``ray.put`` broadcast."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    partials = ds.map_batches(
        lambda b: bloom_partial(b, key_col, m_bits, k_hashes),
        batch_format="pyarrow").take_all()
    if not partials:
        return bytes(m_bits // 8)
    return bloom_merge([row["bits"] for row in partials]).tobytes()


class BloomProbeStage:
    """``map_batches(BloomProbeStage, concurrency=N,
    fn_constructor_kwargs=dict(bloom_ref=ref, ...))`` — flags every row
    whose key tests positive (all ``k`` bits set).  No false negatives;
    false positives at the standard ``(1 - e^(-kn/m))^k`` rate, and
    byte-reproducible (fixed md5 positions).  The filter is fetched once
    per ACTOR (the broadcast-lookup shape, stages/joins.py)."""

    def __init__(self, bloom_ref, key_col: str, m_bits: int,
                 k_hashes: int = 3, flag_col: str = "maybe_member"):
        import ray

        raw = (bloom_ref if isinstance(bloom_ref, (bytes, bytearray))
               else ray.get(bloom_ref))
        self.bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
        if len(self.bits) != m_bits:
            # a probe against the wrong modulus is silently wrong (false
            # negatives the Bloom contract forbids) — fail loudly instead
            raise ValueError(
                f"bloom filter holds {len(self.bits)} bits but probe was "
                f"configured with m_bits={m_bits}")
        self.key_col = key_col
        self.m_bits = m_bits
        self.k_hashes = k_hashes
        self.flag_col = flag_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bits = self.bits
        flags = np.zeros(batch.num_rows, dtype=np.int64)
        for i, s in enumerate(_key_strings(batch[self.key_col])):
            if s is None:
                continue        # null key: md5(NULL) is NULL → not member
            pos = bloom_positions(s, self.m_bits, self.k_hashes)
            flags[i] = int(bits[pos].all())
        return batch.append_column(self.flag_col, pa.array(flags))


def bloom_probe(ds, bloom_ref, key_col: str, m_bits: int,
                k_hashes: int = 3, concurrency: int = 4,
                flag_col: str = "maybe_member"):
    """Membership-flag stream: ``ds`` plus an integer ``flag_col``."""
    return ds.map_batches(
        BloomProbeStage, batch_format="pyarrow",
        fn_constructor_kwargs={"bloom_ref": bloom_ref, "key_col": key_col,
                               "m_bits": m_bits, "k_hashes": k_hashes,
                               "flag_col": flag_col},
        concurrency=(1, concurrency))


def count_distinct_approx(ds, group_col: str, value_col: str) -> pa.Table:
    """Approximate per-group COUNT(DISTINCT value): partial registers
    per batch (map_batches) → driver-side merge of the bounded partial
    set → estimate.  Returns ``(group_col, n_distinct_est)``."""
    partials = ds.map_batches(
        lambda b: grouped_hll_partials(b, group_col, value_col),
        batch_format="pyarrow").take_all()
    by_group: dict = {}
    for row in partials:
        by_group.setdefault(row[group_col], []).append(row["regs"])
    items = sorted(by_group.items(), key=lambda kv: str(kv[0]))
    return pa.table({
        group_col: pa.array([k for k, _ in items]),
        "n_distinct_est": pa.array(
            [hll_estimate(hll_merge(v)) for _, v in items], pa.int64()),
    })


# -- Count-Min sketch --------------------------------------------------------


def cms_positions(key: str, width: int, depth: int) -> list[int]:
    """Row ``j``'s counter position for one key: first 8 bytes of
    ``md5(key || ':' || j)`` mod width — the ``bloom_positions``
    contract, so DuckDB reproduces every collision bit-for-bit."""
    import hashlib

    return [
        int.from_bytes(
            hashlib.md5(f"{key}:{j}".encode("utf-8")).digest()[:8],
            "big") % width
        for j in range(depth)
    ]


def cms_partial(batch: pa.Table, key_col: str, width: int,
                depth: int) -> pa.Table:
    """One batch → one ``depth×width`` int64 counter block (row-major
    bytes).  Null keys count nowhere (md5(NULL) is NULL in the mirror)."""
    counters = np.zeros((depth, width), dtype=np.int64)
    for s in _key_strings(batch[key_col]):
        if s is None:
            continue
        for j, p in enumerate(cms_positions(s, width, depth)):
            counters[j, p] += 1
    return pa.table({"counters": pa.array([counters.tobytes()],
                                          pa.binary())})


def cms_merge(parts) -> np.ndarray:
    """Elementwise SUM of counter blocks — commutative + associative,
    hence partition-invariant (the sketch-merge contract)."""
    out: np.ndarray | None = None
    for p in parts:
        arr = np.frombuffer(p, dtype=np.int64) if isinstance(p, bytes) \
            else np.asarray(p, dtype=np.int64)
        out = arr.copy() if out is None else out + arr
    if out is None:
        raise ValueError("cms_merge: no partials")
    return out


def build_cms(ds, key_col: str, width: int = 256, depth: int = 3) -> bytes:
    """Distributed build: per-batch partial counter blocks → driver
    sum-fold of the bounded partial set (num_batches × d×w×8 bytes).
    The corpus never leaves its workers; only sketch blocks move."""
    partials = ds.map_batches(
        lambda b: cms_partial(b, key_col, width, depth),
        batch_format="pyarrow").take_all()
    if not partials:
        return np.zeros(depth * width, np.int64).tobytes()
    return cms_merge([row["counters"] for row in partials]).tobytes()


class CmsProbeStage:
    """Broadcast-probe stage: the counter block is fetched ONCE per actor
    (ray.put ref → __init__); each probe key's estimate is the MIN of its
    ``depth`` counters — an upper bound on the true count whose
    overestimates (hash collisions) are md5-reproducible in SQL."""

    def __init__(self, cms_ref, key_col: str, width: int, depth: int):
        import ray

        blob = ray.get(cms_ref) if not isinstance(cms_ref, bytes) \
            else cms_ref
        self.counters = np.frombuffer(blob, dtype=np.int64) \
            .reshape(depth, width)
        self.key_col = key_col
        self.width = width
        self.depth = depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        ests = []
        for s in _key_strings(batch[self.key_col]):
            if s is None:
                ests.append(None)      # md5(NULL) → no estimate
                continue
            pos = cms_positions(s, self.width, self.depth)
            ests.append(int(min(self.counters[j, p]
                                for j, p in enumerate(pos))))
        return batch.append_column("est_count", pa.array(ests, pa.int64()))


def cms_probe(ds, cms_ref, key_col: str, width: int = 256,
              depth: int = 3, concurrency: int = 4):
    return ds.map_batches(
        CmsProbeStage, batch_format="pyarrow",
        fn_constructor_kwargs={"cms_ref": cms_ref, "key_col": key_col,
                               "width": width, "depth": depth},
        concurrency=(1, concurrency))

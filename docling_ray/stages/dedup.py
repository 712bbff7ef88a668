"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (designed for the 100 TB corpus, validated at test scale):

- **exact**: md5-fingerprint inside ``map_batches`` (no payload shuffle of
  the text itself is needed beyond the groupby key) → hash-partitioned
  ``groupby(fingerprint)`` → first-per-group.  The one true shuffle keys on
  a 16-byte digest, not the document body.
- **MinHash+LSH** (``minhash_near_dups``): ONE all-to-all total.  Band rows
  carry, besides ``(bucket, doc_id)``, two compact sketches: the 16×8-byte
  band-key vector and a 1-byte-per-perm quantized signature (64 B).  That
  is enough to do *everything* inside a single ``groupby(partition)``:
  exact-dup collapse (equal band-key vectors ⟺ equal signatures, since the
  16 bands jointly cover all 64 perms), candidate pairing, agreement-based
  Jaccard verification (byte sketch), cross-band pair dedup (emit a pair
  only in the *first* band whose keys match — recomputable in-bucket from
  the carried key vectors), and member expansion.  ~200 B/doc/band shuffles
  once; no joins, no second shuffle, no signature re-join.
- **SimHash**: 64-bit signatures; near-dup = Hamming distance ≤ k, bucketed
  by signature quarters so comparisons stay within groups.
"""

from __future__ import annotations

import hashlib
import logging
import re
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)

# -- minhash ----------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_SHINGLE_CACHE_CAP = 1_000_000
_SHINGLE_TOKEN_RE = re.compile(r"[^\s]+", re.ASCII)


def shingles_of(text: str, k: int = 3,
                cache: dict | None = None) -> set[int]:
    """k-word shingles hashed to 64-bit ints (md5-based, process-stable).

    ``cache`` (a per-ACTOR dict, e.g. ``MinHashStage``'s) memoizes
    gram→hash: natural-language 3-grams repeat heavily across documents,
    so this removes most md5 calls from the signature stage without
    changing a single hash value.  Cap accounting (ADVICE r3): a CPython
    dict entry for a ~20-char gram costs ~300-500 B (str object + dict
    slot + int), so 1M entries is ~0.3-0.5 GB — PER ACTOR; a pool of
    cpus/2 signature actors multiplies that, which is why the cap is 1M
    and must be sized against per-worker heap, not the node total."""
    # RE2-ASCII tokenization ([^\s]+): the SAME token rule the DuckDB
    # oracles use, so shingle sets agree BY CONSTRUCTION even on
    # NBSP/unicode-whitespace text (str.split() additionally breaks on
    # U+00A0, U+2000-, \x1c-\x1f — fuzz-found divergence class; ASCII
    # corpora are byte-identical under both)
    toks = _SHINGLE_TOKEN_RE.findall(text)
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if cache is None:
        return {
            int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
            for g in grams
        }
    out = set()
    get = cache.get
    for g in grams:
        h = get(g)
        if h is None:
            h = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8],
                               "big")
            if len(cache) < _SHINGLE_CACHE_CAP:
                cache[g] = h
        out.add(h)
    return out


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(a.shape, _MERSENNE, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, vectorized over (perm, shingle)
    prods = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return prods.min(axis=1)


class MinHashStage:
    """Per-doc MinHash reduced to two compact, shuffle-friendly sketches:

    - ``band_keys``: ``num_bands`` × 8-byte truncated-md5 keys, one per LSH
      band (key b = md5 over band index + that band's full 64-bit minhash
      slice).  Because the bands jointly cover every permutation, an equal
      key *vector* ⟺ an equal full signature — so the vector doubles as the
      exact-signature collapse key and the 512-byte signature itself never
      has to travel.
    - ``sketch``: the low byte of each of the ``num_perm`` minhash values.
      Byte agreement estimates signature agreement with collision bias
      (1-j)/256 ≈ 0.004 — the documented est_jaccard contract.

    Hash params are built once per actor
    (``map_batches(MinHashStage, concurrency=N)``).
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7,
                 num_bands: int = 16):
        # the bands must jointly cover every permutation or the band-key
        # vector stops being a signature-equality witness (the collapse
        # invariant the pipeline relies on)
        if num_bands > num_perm or num_perm % num_bands != 0:
            raise ValueError(
                f"num_perm ({num_perm}) must be a positive multiple of "
                f"num_bands ({num_bands})")
        self.a, self.b = _hash_params(num_perm, seed)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.num_bands = num_bands
        self._gram_cache: dict[str, int] = {}   # per-actor, see shingles_of

    def __call__(self, batch: pa.Table) -> pa.Table:
        rpb = max(1, self.num_perm // self.num_bands)
        keys, sketches, nonempty = [], [], []
        for v in batch["text"]:
            sh = shingles_of(v.as_py() or "", self.shingle_k,
                             cache=self._gram_cache)
            # zero-token docs have NO shingles and never participate in
            # near-dup candidates (they're exact-dup territory; the
            # oracles exclude them identically).  Dropping them here also
            # kills the one mega-bucket all empties would otherwise share
            # — a quadratic skew bomb at crawl scale (fuzz-found).
            nonempty.append(bool(sh))
            if not sh:
                continue
            sig = minhash_signature(sh, self.a, self.b)
            raw = sig.astype(">u8").tobytes()
            keys.append(b"".join(
                hashlib.md5(band.to_bytes(2, "big")
                            + raw[band * rpb * 8:(band + 1) * rpb * 8]).digest()[:8]
                for band in range(self.num_bands)))
            sketches.append((sig & np.uint64(0xFF)).astype(np.uint8).tobytes())
        out = batch.filter(pa.array(nonempty))
        out = out.append_column("band_keys", pa.array(keys, pa.binary()))
        return out.append_column("sketch", pa.array(sketches, pa.binary()))


def band_explode(batch: pa.Table, num_bands: int = 16,
                 num_partitions: int = 64) -> pa.Table:
    """Explode each doc into ``num_bands`` rows ``(part, bucket, band,
    doc_id, band_keys, sketch)``.  ``bucket`` is that band's 8-byte key;
    ``part = bucket mod num_partitions`` is the ONE shuffle key — a bucket
    never straddles partitions.  Each row is ~200 B regardless of doc size."""
    n = batch.num_rows
    id_type = batch.schema.field("doc_id").type
    if n == 0:
        return pa.table({"part": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int8()),
                         "doc_id": pa.array([], id_type),
                         "band_keys": pa.array([], pa.binary()),
                         "sketch": pa.array([], pa.binary())})
    keys = np.frombuffer(b"".join(v.as_py() for v in batch["band_keys"]),
                         dtype=">i8").reshape(n, num_bands).astype(np.int64)
    ids = batch["doc_id"].combine_chunks()
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.chunk(0) if ids.num_chunks else pa.array([], ids.type)
    bk = batch["band_keys"].combine_chunks()
    sk = batch["sketch"].combine_chunks()
    # column-major flatten: all docs for band 0, then band 1, ... so the
    # tiled doc_id/payload arrays line up with the key columns
    bucket = keys.flatten(order="F")
    band = np.repeat(np.arange(num_bands, dtype=np.int8), n)
    part = (bucket.view(np.uint64) % np.uint64(num_partitions)).astype(np.int64)
    tile = lambda arr: pa.chunked_array([arr] * num_bands)
    return pa.table({
        "part": pa.array(part, pa.int64()),
        "bucket": pa.array(bucket, pa.int64()),
        "band": pa.array(band, pa.int8()),
        "doc_id": tile(ids),
        "band_keys": tile(bk),
        "sketch": tile(sk),
    })


def _bucket_emit(doc_ids: list, band_keys: np.ndarray, sketches: np.ndarray,
                 band: int, min_agree: int, max_bucket: int,
                 out_a: list, out_b: list, out_n: list,
                 emit: str = "pairs") -> None:
    """Process one LSH bucket (all rows share one band key of one band).

    Members are first collapsed by their full band-key vector (⟺ identical
    signature): n copies of a boilerplate page cost one comparison slot, not
    n² work.  Exact-dup (intra-group) pairs are emitted only from band 0 —
    every group co-locates wholly in every band, so band 0 sees it exactly
    once.  Cross-group pairs are emitted only when *this* band is the first
    band whose keys match, which both occurrences can decide locally from
    the carried key vectors — cross-band dedup without a second shuffle.

    ``emit`` selects the OUTPUT density (the comparison work is identical):

    - ``"pairs"``: every qualifying pair, member-expanded — C(m, 2) rows
      for an m-member identical group.  The oracle-parity contract.
    - ``"star"``: linear edges only — per identical group, (winner,
      member) for each non-winner (winner = min doc_id); per qualifying
      group pair, one (rep_i, rep_j) edge between the group winners.  A
      corpus where one template is 10% of all docs emits O(m) rows, not
      O(m²).  Equivalences (pytest-proven, tests/test_dedup_skew.py):
      the doc_b DROP SET is identical to ``"pairs"`` (any non-winner is
      doc_b of its intra-group star edge; the larger of two group winners
      is doc_b of the cross edge; the cluster-minimum doc is never a
      doc_b in either mode), and connected components are identical
      (star edges keep each group connected through its winner, cross
      edges connect winners) — so the corpus anti-filter and the cluster
      pass both take the linear form at scale."""
    groups: dict[bytes, list[int]] = {}
    for i, _ in enumerate(doc_ids):
        groups.setdefault(band_keys[i].tobytes(), []).append(i)
    # deterministic order: by min doc_id within each group
    glist = sorted(
        (sorted(members, key=doc_ids.__getitem__)
         for members in groups.values()),
        key=lambda m: doc_ids[m[0]])
    if len(glist) > max_bucket:
        logger.warning("LSH bucket over cap: %d groups, dropping %d",
                       len(glist), len(glist) - max_bucket)
        glist = glist[:max_bucket]
    num_perm = sketches.shape[1]
    if band == 0:
        for members in glist:
            ids = [doc_ids[i] for i in members]
            if emit == "star":
                for j in range(1, len(ids)):   # members sorted: ids[0]=min
                    out_a.append(ids[0]); out_b.append(ids[j])
                    out_n.append(num_perm)
            else:
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        a, b = ids[i], ids[j]
                        out_a.append(min(a, b)); out_b.append(max(a, b))
                        out_n.append(num_perm)
    if len(glist) < 2:
        return
    rep_rows = np.array([m[0] for m in glist])
    S = sketches[rep_rows]                       # (G, num_perm) uint8
    K = band_keys[rep_rows]                      # (G, num_bands) int64
    agree = (S[:, None, :] == S[None, :, :]).sum(axis=2)
    G = len(glist)
    for i in range(G):
        for j in range(i + 1, G):
            if agree[i, j] < min_agree:
                continue
            first = int(np.argmax(K[i] == K[j]))
            if first != band:        # another (earlier) band owns this pair
                continue
            if emit == "star":
                a, b = doc_ids[glist[i][0]], doc_ids[glist[j][0]]
                out_a.append(min(a, b)); out_b.append(max(a, b))
                out_n.append(int(agree[i, j]))
            else:
                for mi in glist[i]:
                    for mj in glist[j]:
                        a, b = doc_ids[mi], doc_ids[mj]
                        out_a.append(min(a, b)); out_b.append(max(a, b))
                        out_n.append(int(agree[i, j]))


def lsh_partition_pairs(group: pa.Table, num_bands: int, min_agree: int,
                        max_bucket: int, num_perm: int,
                        emit: str = "pairs") -> pa.Table:
    """Process one shuffle partition: vectorized bucket run detection (the
    overwhelming majority of buckets are singletons and never touch Python),
    then per non-trivial bucket the capped group logic of ``_bucket_emit``."""
    id_type = group.schema.field("doc_id").type
    out_a: list = []
    out_b: list = []
    out_n: list = []
    n = group.num_rows
    if n:
        order = pa.compute.sort_indices(
            group, sort_keys=[("bucket", "ascending"), ("band", "ascending"),
                              ("doc_id", "ascending")])
        g = group.take(order)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        bands = g["band"].to_numpy(zero_copy_only=False)
        # run boundaries over (bucket, band)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (buckets[1:] != buckets[:-1]) | (bands[1:] != bands[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        multi = ends - starts >= 2
        if multi.any():
            doc_ids = g["doc_id"].to_pylist()
            keys = np.frombuffer(b"".join(v.as_py() for v in g["band_keys"]),
                                 dtype=">i8").reshape(n, num_bands)
            sk = np.frombuffer(b"".join(v.as_py() for v in g["sketch"]),
                               dtype=np.uint8).reshape(n, num_perm)
            for s, e in zip(starts[multi], ends[multi]):
                _bucket_emit(doc_ids[s:e], keys[s:e], sk[s:e],
                             int(bands[s]), min_agree, max_bucket,
                             out_a, out_b, out_n, emit=emit)
    return pa.table({
        "doc_a": pa.array(out_a, id_type),
        "doc_b": pa.array(out_b, id_type),
        "n_agree": pa.array(out_n, pa.int64()),
    })


def minhash_near_dups(ds, num_perm: int = 64, num_bands: int = 16,
                      threshold: float = 0.7, concurrency: int = 4,
                      max_bucket: int = 256, num_partitions: int = 64,
                      emit: str = "pairs"):
    """MinHash-LSH near-dup pairs over a (doc_id, text) dataset with ONE
    all-to-all.

    Returns distinct ``(doc_a, doc_b, n_agree, est_jaccard)`` rows — pairs
    that share at least one LSH band and whose sketch agreement
    ``n_agree/num_perm ≥ threshold`` (doc_a < doc_b, each pair exactly
    once).  Shape per the module docstring: signature stage (actor pool,
    text dropped immediately) → 16 band rows/doc of ~200 B → a single
    ``groupby(part)`` under which collapse, pairing, verification,
    cross-band dedup and member expansion all happen in-partition.  At
    10^12 docs the shuffle moves ~3 KB/doc — orders of magnitude under the
    corpus — and every quadratic risk is capped (``max_bucket`` groups per
    bucket, drops logged)."""
    import pyarrow.compute as pc  # noqa: F401  (pa.compute used in helper)

    min_agree = int(np.ceil(threshold * num_perm))
    sigs = ds.map_batches(
        MinHashStage, batch_format="pyarrow",
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands},
        # autoscaling (1, N): a fixed pool of N min-actors can reserve every
        # CPU of a small cluster and deadlock any all-to-all op in the same
        # graph (observed with an upstream repartition at num_cpus=4)
        concurrency=(1, concurrency),
    ).select_columns(["doc_id", "band_keys", "sketch"])
    bands = sigs.map_batches(
        lambda b: band_explode(b, num_bands=num_bands,
                               num_partitions=num_partitions),
        batch_format="pyarrow")
    pairs = bands.groupby("part").map_groups(
        lambda g: lsh_partition_pairs(g, num_bands=num_bands,
                                      min_agree=min_agree,
                                      max_bucket=max_bucket,
                                      num_perm=num_perm, emit=emit),
        batch_format="pyarrow")

    def add_est(batch: pa.Table) -> pa.Table:
        est = pa.compute.divide(
            pa.compute.cast(batch["n_agree"], pa.float64()), float(num_perm))
        return batch.append_column("est_jaccard", est)

    return pairs.map_batches(add_est, batch_format="pyarrow")


# -- shared partition hashing ----------------------------------------------

def _hash64_of(col) -> np.ndarray:
    """Vectorized uint64 hash of an arbitrary key column: integer keys are
    mixed in numpy (multiply + xor-shift — a plain odd-constant multiply
    is a bijection mod 2^k, so ``% P`` with power-of-two P would see only
    the UNMIXED low bits and collapse stride-aligned ids onto one
    partition); everything else goes through pandas' C-implemented
    siphash (`pd.util.hash_array`, deterministic across processes).
    Never a Python loop per row.

    The integer branch dispatches on the ARROW type, never the
    materialized numpy dtype: a nullable int64 batch materializes as
    float64, and dtype-dispatch would then hash the same key value with
    two different functions depending on which batch it landed in —
    splitting one key across partitions (ADVICE r3).  Nulls route to the
    fixed hash 0 so null keys always co-locate, batch-independently."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        import pyarrow.compute as pc

        if col.null_count:
            null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
            vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        else:
            null_mask = None
            vals = col.to_numpy(zero_copy_only=False)
        h = vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(32)            # fold high-bit entropy down
        h *= np.uint64(0xD6E8FEB86659FD93)
        h ^= h >> np.uint64(32)
        if null_mask is not None:
            h[null_mask] = np.uint64(0)
        return h
    import pandas as pd

    return pd.util.hash_array(col.to_numpy(zero_copy_only=False))


def _part_of(col, num_partitions: int) -> np.ndarray:
    return (_hash64_of(col) % np.uint64(num_partitions)).astype(np.int64)


def _key_change_mask(keys, n: int) -> np.ndarray:
    """Length n-1 boolean array: True where sorted ``keys[i] != keys[i-1]``.
    Nulls (sorted to the end, hence consecutive) form their OWN run —
    null==null, null!=value — matching groupby's null-as-a-group
    semantics instead of raising on the null comparisons."""
    import pyarrow.compute as pc

    a = keys.slice(0, n - 1)
    b = keys.slice(1)
    neq = pc.not_equal(b, a)               # null where either side is null
    if keys.null_count:
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        neq = pc.if_else(both_null, pa.scalar(False), pc.fill_null(neq, True))
    return neq.to_numpy(zero_copy_only=False).astype(bool)


# -- exact dedup ------------------------------------------------------------

def exact_dedup_min_ids(ds, key_column: str = "fingerprint",
                        order_column: str = "doc_id"):
    """Winner table ``(key, min(order))`` via Ray's NATIVE vectorized
    aggregate — zero Python per group, the minimal-payload form when the
    surviving row's other columns aren't needed (the reference keys
    documents by content hash,
    ``/root/reference/docling/utils/utils.py:19-37``).  At 10^9 unique
    keys this is one shuffle of (digest, id) pairs and a kernel-level
    min — no per-group UDF at maximal key cardinality."""
    from ray.data.aggregate import Min

    return ds.groupby(key_column).aggregate(
        Min(on=order_column, alias_name=order_column))


def exact_dedup_losers(ds, key_column: str = "fingerprint",
                       order_column: str = "doc_id",
                       num_partitions: int = 64):
    """The rows exact dedup DROPS, as a tiny ``(order_column)`` dataset:
    project to (key, order) — ~tens of bytes/row — pre-bucket on
    ``hash(key) % P``, and emit every non-first-of-run row per partition,
    fully vectorized.

    This is the payload-free half of keep-first dedup: the full-row form
    below must push the entire corpus (text, doc_json) through the
    shuffle, which is exactly what a 100 TB dedup cannot afford when the
    duplicate fraction is moderate — instead, compute the losers from the
    cheap projection and ANTI-FILTER the payload stream with them
    (broadcast when the loser set fits memory; the sharded
    ``state/dedup_index.py`` actors are the escape hatch when it does
    not).

    Output rows are the DISTINCT losing order VALUES per key — strictly
    greater than the key's minimum.  Ties matter: if two rows carry the
    same (key, order) — a re-crawl dup with the same url and bytes — the
    winner's own value must NOT be emitted, or the anti-filter would
    delete every copy of the document including the kept one (ADVICE
    r3); the filter operates on values, so value-dedup also costs
    nothing downstream."""
    import pyarrow.compute as pc

    small = ds.select_columns([key_column, order_column])

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", pa.array(_part_of(batch[key_column], num_partitions),
                              pa.int64()))

    def losers_of(part: pa.Table) -> pa.Table:
        n = part.num_rows
        order_type = part.schema.field(order_column).type
        if n == 0:
            return pa.table({order_column: pa.array([], order_type)})
        order = pc.sort_indices(part, sort_keys=[(key_column, "ascending"),
                                                 (order_column, "ascending")])
        g = part.take(order)
        keys = g[key_column].combine_chunks()
        neq = _key_change_mask(keys, n)
        ord_neq = _key_change_mask(g[order_column].combine_chunks(), n)
        mask = np.empty(n, dtype=bool)
        mask[0] = False
        # a loser VALUE starts where the key run continues but the order
        # value changes: the run minimum (incl. its tie copies) is never
        # emitted, and repeated losing values are emitted once
        mask[1:] = ~neq & ord_neq
        return g.take(np.flatnonzero(mask)).select([order_column])

    return small.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(losers_of, batch_format="pyarrow")


def exact_dedup_keep_first(ds, key_column: str = "fingerprint",
                           order_column: str = "doc_id",
                           num_partitions: int = 64):
    """Full-row survivors (payload kept), ONE shuffle keyed on
    ``part = hash(key) % P``: per-PARTITION vectorized sort + first-of-run,
    so Python is invoked P times total — never once per distinct key.
    (A plain ``groupby(key).map_groups`` runs the UDF per GROUP, i.e. once
    per unique document — the high-cardinality trap this avoids.)"""
    import pyarrow.compute as pc

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", pa.array(_part_of(batch[key_column], num_partitions),
                              pa.int64()))

    def first_per_key(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return part.drop_columns(["_part"])
        order = pc.sort_indices(part, sort_keys=[(key_column, "ascending"),
                                                 (order_column, "ascending")])
        g = part.take(order)
        keys = g[key_column].combine_chunks()
        neq = _key_change_mask(keys, n)
        mask = np.empty(n, dtype=bool)
        mask[0] = True
        mask[1:] = neq
        return g.take(np.flatnonzero(mask)).drop_columns(["_part"])

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(first_per_key, batch_format="pyarrow")


# -- simhash near-dup -------------------------------------------------------

def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy<2 has no
    ``bitwise_count``): unpack the raw bytes and sum — in bounded chunks,
    since unpackbits inflates 64× (a full 4096² bucket matrix would
    otherwise allocate >1 GB transiently)."""
    flat = np.ascontiguousarray(x).reshape(-1)
    out = np.empty(flat.size, dtype=np.int64)
    step = 1 << 21                          # ≤ 128 MB unpacked per chunk
    for s in range(0, flat.size, step):
        chunk = flat[s:s + step]
        out[s:s + chunk.size] = np.unpackbits(chunk.view(np.uint8)) \
            .reshape(chunk.size, 64).sum(axis=1)
    return out.reshape(x.shape)


def simhash_bucket_rows(batch: pa.Table, bits: int = 64,
                        num_buckets: int = 4,
                        num_partitions: int = 64) -> pa.Table:
    """Explode per-doc simhash into quarter-signature bucket rows — pure
    numpy shifts on the ``simhash_u64`` column, no per-row Python.  Two
    docs at Hamming ≤ num_buckets-1 share at least one exact quarter.

    ``bucket = (q << step) | quarter`` (int64); ``part = bucket % P`` is
    the ONE shuffle key — a bucket never straddles partitions."""
    n = batch.num_rows
    id_type = batch.schema.field("doc_id").type
    step = bits // num_buckets
    if n == 0:
        return pa.table({"part": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "doc_id": pa.array([], id_type),
                         "simhash_u64": pa.array([], pa.uint64())})
    values = batch["simhash_u64"].to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    qs = np.arange(num_buckets, dtype=np.uint64)
    mask = np.uint64((1 << step) - 1)
    quarters = (values[None, :] >> (qs[:, None] * np.uint64(step))) & mask
    bucket = (quarters | (qs[:, None] << np.uint64(step))) \
        .astype(np.int64).flatten()          # row-major: q varies slowest
    part = bucket % num_partitions
    ids = batch["doc_id"].combine_chunks()
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.chunk(0) if ids.num_chunks else pa.array([], ids.type)
    vals_arr = pa.array(values, pa.uint64())
    tile = lambda arr: pa.chunked_array([arr] * num_buckets)
    return pa.table({
        "part": pa.array(part, pa.int64()),
        "bucket": pa.array(bucket, pa.int64()),
        "doc_id": tile(ids),
        "simhash_u64": tile(vals_arr),
    })


def simhash_partition_pairs(part_table: pa.Table, max_hamming: int,
                            num_buckets: int, bits: int,
                            max_bucket: int) -> pa.Table:
    """One shuffle partition: vectorized bucket run detection (singleton
    buckets — the overwhelming majority — never touch Python), then per
    non-trivial bucket an m×m XOR + popcount matrix with the
    first-matching-quarter rule applied as numpy masks.  Python runs only
    over the emitted pairs (output-scale)."""
    id_type = part_table.schema.field("doc_id").type
    out_a: list = []
    out_b: list = []
    out_d: list = []
    n = part_table.num_rows
    step = bits // num_buckets
    mask = np.uint64((1 << step) - 1)
    if n:
        order = pa.compute.sort_indices(
            part_table, sort_keys=[("bucket", "ascending"),
                                   ("doc_id", "ascending")])
        g = part_table.take(order)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = buckets[1:] != buckets[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        multi = ends - starts >= 2
        if multi.any():
            values = g["simhash_u64"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            doc_ids = g["doc_id"].to_pylist()
            for s, e in zip(starts[multi], ends[multi]):
                m = e - s
                if m > max_bucket:
                    logger.warning("simhash bucket over cap: %d rows, "
                                   "dropping %d", m, m - max_bucket)
                    e = s + max_bucket
                    m = max_bucket
                v = values[s:e]
                bucket_q = int(buckets[s]) >> step
                x = v[:, None] ^ v[None, :]
                d = _popcount64(x)
                # first quarter in which the two signatures agree
                qmatch = np.stack([
                    ((x >> np.uint64(q * step)) & mask) == 0
                    for q in range(num_buckets)])
                first = qmatch.argmax(axis=0)
                iu, ju = np.triu_indices(m, k=1)
                keep = (d[iu, ju] <= max_hamming) & (first[iu, ju] == bucket_q)
                for i, j in zip(iu[keep], ju[keep]):
                    a, b = doc_ids[s + i], doc_ids[s + j]
                    if a == b:
                        continue
                    out_a.append(min(a, b))
                    out_b.append(max(a, b))
                    out_d.append(int(d[i, j]))
    return pa.table({
        "doc_a": pa.array(out_a, id_type),
        "doc_b": pa.array(out_b, id_type),
        "hamming": pa.array(out_d, pa.int64()),
    })


def simhash_near_dups(ds, max_hamming: int = 3, num_buckets: int = 4,
                      num_partitions: int = 64, max_bucket: int = 4096):
    # max_bucket 4096 keeps oracle parity far past the test scales (the
    # largest 16-bit quarter bucket grows ~linearly with corpus size);
    # the transient memory is bounded: a full-bucket XOR matrix is 134 MB
    # and _popcount64 unpacks in <=128 MB chunks
    """SimHash near-dup pairs over a (doc_id, text) dataset: signature
    stage → vectorized quarter-bucket explode (two docs at Hamming ≤
    num_buckets-1 share ≥1 exact quarter) → ONE pre-bucketed
    ``groupby(part = bucket % P)`` with in-partition vectorized run
    detection, m×m popcount verification, and first-matching-quarter
    dedup.  Python never runs per group — only P partition invocations
    and the emitted pairs themselves."""
    from docling_ray.stages.textstats import simhash_batch

    def _sig_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = simhash_batch(b)
        # zero-token docs never pair (the oracle's unnest drops them;
        # symmetric with the MinHash zero-shingle rule) — and the filter
        # is on TOKEN count, not simhash==0, because a real token set
        # can legitimately hash to 0
        col = pc.fill_null(b["text"].combine_chunks(), "")
        has = pc.greater(pc.count_substring_regex(col, r"[^\s]+"), 0)
        return out.filter(has).select(["doc_id", "simhash_u64"])

    sigs = ds.map_batches(_sig_rows, batch_format="pyarrow")
    rows = sigs.map_batches(
        lambda b: simhash_bucket_rows(b, num_buckets=num_buckets,
                                      num_partitions=num_partitions),
        batch_format="pyarrow")
    pairs = rows.groupby("part").map_groups(
        lambda g: simhash_partition_pairs(g, max_hamming=max_hamming,
                                          num_buckets=num_buckets, bits=64,
                                          max_bucket=max_bucket),
        batch_format="pyarrow")
    import ray.data

    # seed a 0-row typed block so an empty result keeps its schema
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))["doc_id"]
    empty = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], id_type),
        "doc_b": pa.array([], id_type),
        "hamming": pa.array([], pa.int64()),
    }))
    return empty.union(pairs)


# -- exact n-gram jaccard ---------------------------------------------------

def jaccard_pairs_in_group(group: pa.Table, threshold: float,
                           shingle_k: int) -> pa.Table:
    """Brute-force shingle-set Jaccard within one (small) group — used after
    a coarse partition (e.g. lang+source) so the quadratic part stays local."""
    import math
    from collections import Counter

    ids = [v.as_py() for v in group["doc_id"]]
    id_type = group.schema.field("doc_id").type
    sets = [shingles_of(v.as_py() or "", shingle_k) for v in group["text"]]
    # sparse intersection counts via shingle postings: cost scales with
    # co-occurrence, not with the n²/2 all-pairs loop (a pair with zero
    # shared shingles cannot reach any positive threshold, so this stays
    # exact)
    postings: dict[int, list[int]] = {}
    for di, s in enumerate(sets):
        for h in s:
            postings.setdefault(h, []).append(di)
    inter_count: Counter = Counter()
    for docs in postings.values():
        if len(docs) > 1:
            for ai in range(len(docs)):
                for bi in range(ai + 1, len(docs)):
                    inter_count[(docs[ai], docs[bi])] += 1
    a_ids, b_ids, sims, millis = [], [], [], []
    for (i, j), inter in sorted(inter_count.items()):
        union = len(sets[i]) + len(sets[j]) - inter
        sim = inter / union if union else 0.0
        if sim >= threshold:
            a_ids.append(min(ids[i], ids[j]))
            b_ids.append(max(ids[i], ids[j]))
            sims.append(sim)
            millis.append(math.floor(sim * 1000.0))
    return pa.table({
        "doc_a": pa.array(a_ids, id_type),
        "doc_b": pa.array(b_ids, id_type),
        "jaccard": pa.array(sims, pa.float64()),
        "j_milli": pa.array(millis, pa.int64()),
    })


def shingle_blob_batch(batch: pa.Table, shingle_k: int = 3,
                       column: str = "text") -> pa.Table:
    """Compact per-doc shingle-set blob for the verify join: the hashed
    DISTINCT k-gram set, sorted, as little-endian uint64 bytes (8 B per
    shingle ≈ 1.3× the text's token bytes — but shipped exactly once,
    never replicated per LSH band)."""
    ids = batch["doc_id"]
    blobs, counts = [], []
    for v in batch[column]:
        sh = shingles_of(v.as_py() or "", shingle_k)
        arr = np.sort(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
        blobs.append(arr.astype("<u8").tobytes())
        counts.append(len(sh))
    return pa.table({
        "doc_id": ids,
        "blob": pa.array(blobs, pa.binary()),
        "n_sh": pa.array(counts, pa.int64()),
    })


def _pair_part(col_a, col_b, num_partitions: int) -> np.ndarray:
    h = _hash64_of(col_a) * np.uint64(3) + _hash64_of(col_b)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _jaccard_attach(part_table: pa.Table, num_partitions: int) -> pa.Table:
    """One doc-keyed partition: blob rows (kind 0) + need rows (kind 1,
    one per pair side).  Attach each need row's blob via an in-partition
    hash lookup and re-key by pair."""
    id_type = part_table.schema.field("join_doc").type
    kinds = part_table["kind"].to_numpy(zero_copy_only=False)
    docs = part_table.filter(pa.array(kinds == 0))
    needs = part_table.filter(pa.array(kinds == 1))
    empty = pa.table({
        "part": pa.array([], pa.int64()),
        "doc_a": pa.array([], id_type),
        "doc_b": pa.array([], id_type),
        "blob": pa.array([], pa.binary()),
        "n_sh": pa.array([], pa.int64()),
    })
    if needs.num_rows == 0 or docs.num_rows == 0:
        return empty
    lut = {d: (bl, ns) for d, bl, ns in zip(
        docs["join_doc"].to_pylist(), docs["blob"].to_pylist(),
        docs["n_sh"].to_pylist())}
    out_a, out_b, out_blob, out_n = [], [], [], []
    for jd, da, db in zip(needs["join_doc"].to_pylist(),
                          needs["doc_a"].to_pylist(),
                          needs["doc_b"].to_pylist()):
        hit = lut.get(jd)
        if hit is None:
            continue
        out_a.append(da)
        out_b.append(db)
        out_blob.append(hit[0])
        out_n.append(hit[1])
    a_arr = pa.array(out_a, id_type)
    b_arr = pa.array(out_b, id_type)
    if not out_a:
        return empty
    return pa.table({
        "part": pa.array(_pair_part(a_arr, b_arr, num_partitions), pa.int64()),
        "doc_a": a_arr,
        "doc_b": b_arr,
        "blob": pa.array(out_blob, pa.binary()),
        "n_sh": pa.array(out_n, pa.int64()),
    })


def _jaccard_verify(part_table: pa.Table, threshold: float) -> pa.Table:
    """One pair-keyed partition: every candidate pair's two blob rows are
    co-located; sorted run detection pairs them up, ``np.intersect1d``
    computes the exact intersection."""
    import math

    id_type = part_table.schema.field("doc_a").type
    out_a, out_b, sims, millis = [], [], [], []
    n = part_table.num_rows
    if n:
        order = pa.compute.sort_indices(
            part_table, sort_keys=[("doc_a", "ascending"),
                                   ("doc_b", "ascending")])
        g = part_table.take(order)
        ida = g["doc_a"].to_pylist()
        idb = g["doc_b"].to_pylist()
        blobs = g["blob"].to_pylist()
        ns = g["n_sh"].to_pylist()
        i = 0
        while i + 1 < n:
            if ida[i] != ida[i + 1] or idb[i] != idb[i + 1]:
                i += 1            # orphan side (missing doc) — skip
                continue
            x = np.frombuffer(blobs[i], dtype="<u8")
            y = np.frombuffer(blobs[i + 1], dtype="<u8")
            inter = np.intersect1d(x, y, assume_unique=True).size
            union = ns[i] + ns[i + 1] - inter
            sim = inter / union if union else 0.0
            if sim >= threshold:
                out_a.append(ida[i])
                out_b.append(idb[i])
                sims.append(sim)
                millis.append(math.floor(sim * 1000.0))
            i += 2
    return pa.table({
        "doc_a": pa.array(out_a, id_type),
        "doc_b": pa.array(out_b, id_type),
        "jaccard": pa.array(sims, pa.float64()),
        "j_milli": pa.array(millis, pa.int64()),
    })


def jaccard_near_dups(ds, threshold: float = 0.5, shingle_k: int = 3,
                      num_perm: int = 64, num_bands: int = 16,
                      num_partitions: int = 64, max_bucket: int = 256,
                      concurrency: int = 4):
    """Exact n-gram Jaccard over MinHash-LSH candidates — the scale-safe
    candidate/verify shape (no partition ever holds a whole language or
    domain; every stage is keyed on a uniform hash).

    1. **Candidates** (1 shuffle, ~200 B band rows): the MinHash pipeline
       with ``min_agree=0`` — every distinct pair sharing ≥1 of
       ``num_bands`` band keys, first-matching-band dedup, ``max_bucket``
       cap with logged drops.
    2. **Attach** (1 shuffle, ≈1× the shingle corpus + 2 rows/pair): doc
       shingle blobs and per-pair need rows meet in ``hash(doc) % P``
       partitions; blobs are shipped exactly once, never per band.
    3. **Verify** (1 shuffle, 2 blobs/pair): pair-keyed partitions compute
       exact ``np.intersect1d`` Jaccard and filter on ``threshold``.

    The source dataset is consumed twice (candidates + blobs) — the
    classic two-pass dedup; at corpus scale re-reading columnar storage
    beats materializing a corpus-sized intermediate.  Recall is exactly
    the LSH candidate bound (pairs sharing no band are missed on both the
    engine and its oracle, by construction); precision is 1."""
    import ray.data

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))["doc_id"]

    # 1. candidate pairs via the proven MinHash single-shuffle machinery
    sigs = ds.map_batches(
        MinHashStage, batch_format="pyarrow",
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands,
                               "shingle_k": shingle_k},
        concurrency=(1, concurrency),
    ).select_columns(["doc_id", "band_keys", "sketch"])
    bands = sigs.map_batches(
        lambda b: band_explode(b, num_bands=num_bands,
                               num_partitions=num_partitions),
        batch_format="pyarrow")
    cands = bands.groupby("part").map_groups(
        lambda g: lsh_partition_pairs(g, num_bands=num_bands, min_agree=0,
                                      max_bucket=max_bucket,
                                      num_perm=num_perm),
        batch_format="pyarrow")

    # 2. union blob rows (kind 0) and pair-need rows (kind 1) on one schema
    def blob_rows(batch: pa.Table) -> pa.Table:
        t = shingle_blob_batch(batch, shingle_k=shingle_k)
        nrow = t.num_rows
        return pa.table({
            "part": pa.array(_part_of(t["doc_id"], num_partitions), pa.int64()),
            "kind": pa.array(np.zeros(nrow, dtype=np.int8), pa.int8()),
            "join_doc": t["doc_id"].combine_chunks().cast(id_type),
            "doc_a": pa.nulls(nrow, id_type),
            "doc_b": pa.nulls(nrow, id_type),
            "blob": t["blob"],
            "n_sh": t["n_sh"],
        })

    def need_rows(batch: pa.Table) -> pa.Table:
        nrow = batch.num_rows
        a = batch["doc_a"].combine_chunks()
        b = batch["doc_b"].combine_chunks()
        join_doc = pa.chunked_array([a, b]).combine_chunks()
        aa = pa.chunked_array([a, a]).combine_chunks()
        bb = pa.chunked_array([b, b]).combine_chunks()
        return pa.table({
            "part": pa.array(_part_of(join_doc, num_partitions), pa.int64()),
            "kind": pa.array(np.ones(2 * nrow, dtype=np.int8), pa.int8()),
            "join_doc": join_doc,
            "doc_a": aa,
            "doc_b": bb,
            "blob": pa.nulls(2 * nrow, pa.binary()),
            "n_sh": pa.nulls(2 * nrow, pa.int64()),
        })

    blobs = ds.map_batches(blob_rows, batch_format="pyarrow")
    needs = cands.select_columns(["doc_a", "doc_b"]) \
        .map_batches(need_rows, batch_format="pyarrow")
    attached = blobs.union(needs).groupby("part").map_groups(
        lambda g: _jaccard_attach(g, num_partitions=num_partitions),
        batch_format="pyarrow")
    pairs = attached.groupby("part").map_groups(
        lambda g: _jaccard_verify(g, threshold=threshold),
        batch_format="pyarrow")

    empty = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], id_type),
        "doc_b": pa.array([], id_type),
        "jaccard": pa.array([], pa.float64()),
        "j_milli": pa.array([], pa.int64()),
    }))
    return empty.union(pairs)


# -- near-dup clusters (connected components over the pair graph) -----------

def connected_components(pairs_ds, a_column: str = "doc_a",
                         b_column: str = "doc_b") -> pa.Table:
    """Connected components over a near-dup PAIR graph → one
    ``(doc_id, cluster_rep)`` row per clustered doc, where the rep is the
    component's minimum id — the cluster-level keep-one decision a real
    dedup needs (pairs alone over-drop on chains: B dropped for (A,B) and
    C dropped for (B,C) is correct, but pair-local drop-the-larger would
    also drop C for (C,D) even when D is C's only link and D > C).

    Driver-side union-find with path compression + union-by-rep — the
    SMALL-GRAPH FAST PATH: one pass, no shuffles, right when the pair set
    fits driver memory (ad-hoc analysis, tests, modest corpora).  At
    crawl scale the pair set is a large fraction of the corpus (10^11+
    edges at a 30-50% near-dup rate over 10^12 docs) and does not fit a
    driver: use ``connected_components_distributed`` below — the same
    output contract as hash-partitioned Ray shuffles, which is what the
    corpus queries wire in."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:      # path compression
            nxt = parent[x]
            parent[x] = root
            x = nxt
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo                   # union by MIN id -> rep = min

    sch = pairs_ds.schema()
    id_type = dict(zip(sch.names, sch.types))[a_column] \
        if sch is not None and a_column in sch.names else pa.int64()
    for batch in pairs_ds.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch[a_column].to_pylist(),
                        batch[b_column].to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            union(a, b)
    members = sorted(parent)
    reps = [find(m) for m in members]
    return pa.table({
        "doc_id": pa.array(members, id_type),
        "cluster_rep": pa.array(reps, id_type),
    })


def _cc_round_tables(labels_tbl: pa.Table, num_partitions: int) -> pa.Table:
    """labels (node, label) → the two per-round message-input row kinds:
    kind 0 (label passthrough, keyed by node) and kind 2 (pointer-doubling
    request: "what is label(label)?", keyed by the LABEL so the lookup is
    in-partition).  Vectorized column shuffles only."""
    node = labels_tbl["node"].combine_chunks()
    label = labels_tbl["label"].combine_chunks()
    n = labels_tbl.num_rows
    id_type = node.type
    part0 = _part_of(node, num_partitions)
    part2 = _part_of(label, num_partitions)
    return pa.table({
        "part": pa.array(np.concatenate([part0, part2]), pa.int64()),
        "kind": pa.array(np.concatenate([np.zeros(n, np.int8),
                                         np.full(n, 2, np.int8)])),
        "node": pa.chunked_array([node, label]).combine_chunks()
                .cast(id_type),
        "aux": pa.chunked_array([pa.nulls(n, id_type), node])
               .combine_chunks(),
        "label": pa.chunked_array([label, pa.nulls(n, id_type)])
                 .combine_chunks(),
    })


def _cc_propagate(part_tbl: pa.Table, num_partitions: int) -> pa.Table:
    """One node-keyed partition of the propagate stage.  Rows: kind 0 =
    label (node, label); kind 1 = symmetric edge (node=src, aux=dst);
    kind 2 = shortcut request (node=label-being-looked-up, aux=requester).
    Every lookup is a C-level ``index_in`` against the partition's label
    table — labels, edges and requests co-locate by construction because
    all three kinds are keyed by ``hash(node) % P``.  Emits candidate
    rows (out_part, node, cand, is_old) keyed by the TARGET node."""
    import pyarrow.compute as pc

    id_type = part_tbl.schema.field("node").type
    kinds = part_tbl["kind"].to_numpy(zero_copy_only=False)
    lab = part_tbl.filter(pa.array(kinds == 0))
    lut_nodes = lab["node"].combine_chunks()
    lut_labels = lab["label"].combine_chunks()
    out_nodes, out_cands, out_old = [], [], []
    # passthrough: the node's own current label (the change-detection row)
    out_nodes.append(lut_nodes)
    out_cands.append(lut_labels)
    out_old.append(np.ones(len(lut_nodes), np.int8))

    def lookup(keys) -> pa.Array:
        idx = pc.index_in(keys, value_set=lut_nodes)
        return pc.take(lut_labels, idx)

    edges = part_tbl.filter(pa.array(kinds == 1))
    if edges.num_rows:
        # edge (src, dst): send label(src) to dst
        out_nodes.append(edges["aux"].combine_chunks())
        out_cands.append(lookup(edges["node"].combine_chunks()))
        out_old.append(np.zeros(edges.num_rows, np.int8))
    reqs = part_tbl.filter(pa.array(kinds == 2))
    if reqs.num_rows:
        # shortcut (l, v): send label(l) to v — pointer doubling, so a
        # label chain of depth d resolves in O(log d) rounds, not d
        out_nodes.append(reqs["aux"].combine_chunks())
        out_cands.append(lookup(reqs["node"].combine_chunks()))
        out_old.append(np.zeros(reqs.num_rows, np.int8))
    nodes = pa.chunked_array(out_nodes).combine_chunks().cast(id_type)
    cands = pa.chunked_array(out_cands).combine_chunks().cast(id_type)
    return pa.table({
        "out_part": pa.array(_part_of(nodes, num_partitions), pa.int64()),
        "node": nodes,
        "cand": cands,
        "is_old": pa.array(np.concatenate(out_old)),
    })


def _cc_combine(part_tbl: pa.Table) -> pa.Table:
    """One target-node-keyed partition of the min-combine stage: sorted
    run detection gives the per-node minimum candidate; the is_old row
    (exactly one per node) gives the previous label for the convergence
    counter.  Vectorized — Python never runs per node."""
    import pyarrow.compute as pc

    id_type = part_tbl.schema.field("node").type
    n = part_tbl.num_rows
    if n == 0:
        return pa.table({"node": pa.array([], id_type),
                         "label": pa.array([], id_type),
                         "changed": pa.array([], pa.int8())})
    order = pc.sort_indices(part_tbl, sort_keys=[("node", "ascending"),
                                                 ("cand", "ascending")])
    g = part_tbl.take(order)
    nodes = g["node"].combine_chunks()
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = _key_change_mask(nodes, n)
    starts = np.flatnonzero(first)
    uniq = nodes.take(pa.array(starts))
    new_label = g["cand"].combine_chunks().take(pa.array(starts))
    old_rows = g.filter(pc.equal(g["is_old"], 1))   # node-sorted, 1/node
    changed = pc.cast(pc.not_equal(old_rows["cand"].combine_chunks(),
                                   new_label), pa.int8())
    return pa.table({"node": uniq, "label": new_label, "changed": changed})


def _cc_initial_labels(part_tbl: pa.Table) -> pa.Table:
    """Initial label per node from one src-keyed symmetric-edge partition:
    label(v) = min(v, min of v's neighbors) — one sorted pass."""
    import pyarrow.compute as pc

    id_type = part_tbl.schema.field("src").type
    n = part_tbl.num_rows
    if n == 0:
        return pa.table({"node": pa.array([], id_type),
                         "label": pa.array([], id_type)})
    order = pc.sort_indices(part_tbl, sort_keys=[("src", "ascending"),
                                                 ("dst", "ascending")])
    g = part_tbl.take(order)
    src = g["src"].combine_chunks()
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = _key_change_mask(src, n)
    starts = np.flatnonzero(first)
    uniq = src.take(pa.array(starts))
    min_dst = g["dst"].combine_chunks().take(pa.array(starts))
    label = pc.min_element_wise(uniq, min_dst)
    return pa.table({"node": uniq, "label": label})


def connected_components_distributed(pairs_ds, a_column: str = "doc_a",
                                     b_column: str = "doc_b",
                                     num_partitions: int = 64,
                                     max_rounds: int = 30):
    """Connected components over the near-dup PAIR graph as iterative
    min-label propagation in hash-partitioned Ray shuffles — the 100 TB
    form of ``connected_components``: the pair set is NEVER collected on
    the driver (at a 30-50% near-dup rate over 10^12 docs the edge set is
    10^11+ rows — object-store data, not a Python dict).

    Per round (2 shuffles over node/label-sized rows):

    1. **propagate** (keyed ``hash(node) % P``): labels, symmetric edges
       and pointer-doubling requests co-locate; every edge forwards
       label(src) to dst and every label row asks for label(label) —
       the shortcut that makes label chains collapse in O(log depth)
       rounds instead of depth.
    2. **min-combine** (keyed by target node): per-node minimum of all
       candidates, plus a changed-bit vs the old label.

    Labels are materialized per round (small: 2 ids/node, distributed in
    the object store) and the loop stops at the first round with zero
    changes; at a fixpoint labels are constant per component and equal
    to the component minimum (standard monotone-convergence argument —
    every candidate is a component member, so the min can only descend
    to the true minimum, and with both edge directions present no
    non-constant labeling is stable).  Near-dup graphs are star/clique
    shaped (LSH buckets), so 2-3 rounds is typical; ``max_rounds`` is a
    pathological-chain backstop (RuntimeError rather than silently wrong
    output).

    Returns a Dataset ``(doc_id, cluster_rep)``, one row per clustered
    doc, rep = component min — same contract as the driver-side
    ``connected_components`` fast path."""
    import ray.data

    sch = pairs_ds.schema()
    id_type = dict(zip(sch.names, sch.types))[a_column] \
        if sch is not None and a_column in sch.names else pa.int64()

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[a_column].combine_chunks()
        b = batch[b_column].combine_chunks()
        src = pa.chunked_array([a, b]).combine_chunks()
        dst = pa.chunked_array([b, a]).combine_chunks()
        return pa.table({
            "part": pa.array(_part_of(src, num_partitions), pa.int64()),
            "src": src, "dst": dst})

    edges = pairs_ds.map_batches(symmetrize, batch_format="pyarrow") \
        .materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], id_type),
            "cluster_rep": pa.array([], id_type)}))

    labels = edges.groupby("part").map_groups(
        _cc_initial_labels, batch_format="pyarrow").materialize()

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        et = batch.schema.field("src").type
        return pa.table({
            "part": batch["part"],
            "kind": pa.array(np.ones(n, np.int8)),
            "node": batch["src"].combine_chunks().cast(et),
            "aux": batch["dst"],
            "label": pa.nulls(n, et),
        })

    for _ in range(max_rounds):
        msg_in = labels.map_batches(
            lambda b: _cc_round_tables(b, num_partitions),
            batch_format="pyarrow") \
            .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
        cands = msg_in.groupby("part").map_groups(
            lambda g: _cc_propagate(g, num_partitions),
            batch_format="pyarrow")
        new_labels = cands.groupby("out_part").map_groups(
            _cc_combine, batch_format="pyarrow").materialize()
        n_changed = new_labels.sum("changed") or 0
        labels = new_labels.select_columns(["node", "label"])
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_distributed: no fixpoint in "
            f"{max_rounds} rounds (pathological graph?)")
    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "cluster_rep": b["label"]}),
        batch_format="pyarrow")


# -- jaccard inline variant (single shuffle, blob-carrying band rows) -------

class ShingleMinHashBlobStage:
    """Per-doc band keys + shingle blob in ONE pass (the inline-verify
    jaccard input: no sketch needed because verification is exact)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7,
                 num_bands: int = 16):
        self.a, self.b = _hash_params(num_perm, seed)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.num_bands = num_bands
        self._gram_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rpb = max(1, self.num_perm // self.num_bands)
        keys, blobs, counts, ids = [], [], [], []
        for did, v in zip(batch["doc_id"], batch["text"]):
            sh = shingles_of(v.as_py() or "", self.shingle_k,
                             cache=self._gram_cache)
            if not sh:      # zero-shingle docs: see MinHashStage
                continue
            ids.append(did)
            sig = minhash_signature(sh, self.a, self.b)
            raw = sig.astype(">u8").tobytes()
            keys.append(b"".join(
                hashlib.md5(band.to_bytes(2, "big")
                            + raw[band * rpb * 8:(band + 1) * rpb * 8])
                .digest()[:8]
                for band in range(self.num_bands)))
            arr = np.sort(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
            blobs.append(arr.astype("<u8").tobytes())
            counts.append(len(sh))
        id_type = batch.schema.field("doc_id").type
        return pa.table({
            "doc_id": pa.array([d.as_py() for d in ids], id_type),
            "band_keys": pa.array(keys, pa.binary()),
            "blob": pa.array(blobs, pa.binary()),
            "n_sh": pa.array(counts, pa.int64()),
        })


def _jaccard_band_explode(batch: pa.Table, num_bands: int,
                          num_partitions: int) -> pa.Table:
    """band_explode with the shingle blob carried on every band row —
    the inline variant's documented ~num_bands× payload replication."""
    n = batch.num_rows
    id_type = batch.schema.field("doc_id").type
    if n == 0:
        return pa.table({"part": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int8()),
                         "doc_id": pa.array([], id_type),
                         "band_keys": pa.array([], pa.binary()),
                         "blob": pa.array([], pa.binary()),
                         "n_sh": pa.array([], pa.int64())})
    keys = np.frombuffer(b"".join(v.as_py() for v in batch["band_keys"]),
                         dtype=">i8").reshape(n, num_bands).astype(np.int64)
    bucket = keys.flatten(order="F")
    band = np.repeat(np.arange(num_bands, dtype=np.int8), n)
    part = (bucket.view(np.uint64) % np.uint64(num_partitions)) \
        .astype(np.int64)
    tile_arr = lambda name: pa.chunked_array(
        [batch[name].combine_chunks()] * num_bands)
    return pa.table({
        "part": pa.array(part, pa.int64()),
        "bucket": pa.array(bucket, pa.int64()),
        "band": pa.array(band, pa.int8()),
        "doc_id": tile_arr("doc_id"),
        "band_keys": tile_arr("band_keys"),
        "blob": tile_arr("blob"),
        "n_sh": tile_arr("n_sh"),
    })


def _jaccard_inline_partition(group: pa.Table, num_bands: int,
                              threshold: float, max_bucket: int) -> pa.Table:
    """One shuffle partition of blob-carrying band rows: vectorized bucket
    run detection, then per non-trivial bucket exact in-bucket Jaccard
    with the first-matching-band dedup rule."""
    import math

    id_type = group.schema.field("doc_id").type
    out_a, out_b, sims, millis = [], [], [], []
    n = group.num_rows
    if n:
        order = pa.compute.sort_indices(
            group, sort_keys=[("bucket", "ascending"), ("band", "ascending"),
                              ("doc_id", "ascending")])
        g = group.take(order)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        bands = g["band"].to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (buckets[1:] != buckets[:-1]) | (bands[1:] != bands[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        multi = ends - starts >= 2
        if multi.any():
            ids = g["doc_id"].to_pylist()
            keys = np.frombuffer(b"".join(v.as_py() for v in g["band_keys"]),
                                 dtype=">i8").reshape(n, num_bands)
            blobs = g["blob"].to_pylist()
            counts = g["n_sh"].to_pylist()
            for s, e in zip(starts[multi], ends[multi]):
                m = e - s
                if m > max_bucket:
                    logger.warning("jaccard bucket over cap: %d rows, "
                                   "dropping %d", m, m - max_bucket)
                    e = s + max_bucket
                    m = max_bucket
                band = int(bands[s])
                for i in range(s, e):
                    for j in range(i + 1, e):
                        if ids[i] == ids[j]:
                            continue
                        first = int(np.argmax(keys[i] == keys[j]))
                        if first != band:
                            continue
                        x = np.frombuffer(blobs[i], dtype="<u8")
                        y = np.frombuffer(blobs[j], dtype="<u8")
                        inter = np.intersect1d(x, y,
                                               assume_unique=True).size
                        union = counts[i] + counts[j] - inter
                        sim = inter / union if union else 0.0
                        if sim < threshold:
                            continue
                        a, b = ids[i], ids[j]
                        out_a.append(min(a, b))
                        out_b.append(max(a, b))
                        sims.append(sim)
                        millis.append(math.floor(sim * 1000.0))
    return pa.table({
        "doc_a": pa.array(out_a, id_type),
        "doc_b": pa.array(out_b, id_type),
        "jaccard": pa.array(sims, pa.float64()),
        "j_milli": pa.array(millis, pa.int64()),
    })


def jaccard_near_dups_inline(ds, threshold: float = 0.5, shingle_k: int = 3,
                             num_perm: int = 64, num_bands: int = 16,
                             num_partitions: int = 64, max_bucket: int = 256,
                             concurrency: int = 4):
    """The SINGLE-SHUFFLE jaccard variant: band rows carry the shingle
    blob, so candidates AND exact verification happen inside one
    ``groupby(part)`` — identical output to the candidate/verify join
    (``jaccard_near_dups``), different cost profile.

    Tradeoff (documented in NOTES.md): shuffle payload is ~``num_bands``×
    the shingle corpus (vs ~1-2× for the 3-shuffle join), but only ONE
    Ray all-to-all runs — the right choice when per-op fixed latency
    dominates (small corpora, interactive use); the join form is the
    100 TB default."""
    import ray.data

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))["doc_id"]
    sigs = ds.map_batches(
        ShingleMinHashBlobStage, batch_format="pyarrow",
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands,
                               "shingle_k": shingle_k},
        concurrency=(1, concurrency))
    rows = sigs.map_batches(
        lambda b: _jaccard_band_explode(b, num_bands=num_bands,
                                        num_partitions=num_partitions),
        batch_format="pyarrow")
    pairs = rows.groupby("part").map_groups(
        lambda g: _jaccard_inline_partition(g, num_bands=num_bands,
                                            threshold=threshold,
                                            max_bucket=max_bucket),
        batch_format="pyarrow")
    empty = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], id_type),
        "doc_b": pa.array([], id_type),
        "jaccard": pa.array([], pa.float64()),
        "j_milli": pa.array([], pa.int64()),
    }))
    return empty.union(pairs)


# -- line-level exact dedup (C4 / RefinedWeb) --------------------------------
#
# Corpus-wide duplicate-LINE removal with text reconstruction: every line
# that occurs more than once across the whole corpus is kept only at its
# first occurrence (ordered by (doc, position)); all other occurrences are
# deleted and each doc's text is re-joined from its surviving lines.  The
# published C4/RefinedWeb boilerplate-removal step (navbars, cookie
# banners, footers repeated across a site).
#
# Shape (the run_corpus decision/payload split): the DECISION pass moves
# only (doc_id, pos, line_hash) rows — ONE hash-bucketed shuffle, text
# never enters it; the drop set (bounded by the duplicate-LINE count, a
# small fraction of lines in real crawls) is broadcast once and applied
# in a stateless map over the ORIGINAL dataset, so the payload never
# shuffles at all.  At extreme duplicate rates pass ``backend="join"``:
# the drop rows are resolved with one tagged-union hash shuffle on
# doc_id (the substring_dedup join shape) and no driver- or
# actor-resident copy of the drop set ever exists.


def _line_rows(batch: pa.Table, text_col: str, id_col: str,
               num_partitions: int) -> pa.Table:
    """One batch → (doc_id, pos, lh, part) rows for every ELIGIBLE line
    (non-empty; empty lines are structural, never deduped).  Vectorized
    split/flatten; md5 runs once per DISTINCT line string in the batch.
    Hash convention = dup_windows: md5-prefix-8-bytes big-endian uint64,
    mirrored in SQL as ('0x' || substr(md5(line),1,16))::UBIGINT —
    collisions collapse identically on both sides."""
    import pyarrow.compute as pc

    id_type = batch.schema.field(id_col).type
    empty = pa.table({id_col: pa.array([], id_type),
                      "pos": pa.array([], pa.int64()),
                      "lh": pa.array([], pa.int64()),
                      "part": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    col = pc.fill_null(batch[text_col].combine_chunks(), "")
    lines_list = pc.split_pattern(col, "\n")
    counts = pc.list_value_length(lines_list).to_numpy(zero_copy_only=False)
    total = int(counts.sum())
    if total == 0:
        return empty
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(total, dtype=np.int64) - starts[parent] + 1  # 1-based
    flat = pc.list_flatten(lines_list)
    elig = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not elig.any():
        return empty
    parent, pos = parent[elig], pos[elig]
    lines = flat.to_numpy(zero_copy_only=False)[elig]
    uniq, inv = np.unique(lines, return_inverse=True)
    lh_uniq = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
         for s in uniq),
        dtype=np.uint64, count=len(uniq))
    lh = lh_uniq[inv]
    return pa.table({
        id_col: batch[id_col].take(pa.array(parent)),
        "pos": pa.array(pos),
        "lh": pa.array(lh.view(np.int64)),
        "part": pa.array((lh % np.uint64(num_partitions)).astype(np.int64)),
    })


def _line_losers(group: pa.Table, id_col: str) -> pa.Table:
    """One lh-complete partition → its DROP rows (doc_id, pos): every
    occurrence that is not the (doc, pos)-minimal one of its line hash.
    Vectorized sort + first-of-run, zero per-group Python."""
    import pyarrow.compute as pc

    id_type = group.schema.field(id_col).type
    empty = pa.table({id_col: pa.array([], id_type),
                      "pos": pa.array([], pa.int64())})
    if group.num_rows == 0:
        return empty
    order = pc.sort_indices(group, sort_keys=[
        ("lh", "ascending"), (id_col, "ascending"), ("pos", "ascending")])
    g = group.take(order)
    lh = g["lh"].to_numpy(zero_copy_only=False)
    first = np.empty(len(lh), dtype=bool)
    first[0] = True
    first[1:] = lh[1:] != lh[:-1]
    losers = ~first
    if not losers.any():
        return empty
    keep = pa.array(losers)
    return pa.table({id_col: g[id_col].filter(keep),
                     "pos": g["pos"].filter(keep)})


def _rebuild_lines(batch: pa.Table, text_col: str,
                   drop_pos_per_row: list) -> pa.Table:
    """Vectorized line-drop reconstruction: split every doc on ``\\n``
    once (C kernel), knock out the 1-based positions listed for each
    row, re-join survivors with ``\\n``.  The only Python loop is over
    AFFECTED rows (setting mask bits), never over lines or characters.
    Appends ``text_clean`` and ``n_lines_dropped``."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch[text_col].combine_chunks(), "")
    lists = pc.split_pattern(col, "\n")
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    keep = np.ones(total, dtype=bool)
    n_drop = np.zeros(batch.num_rows, dtype=np.int64)
    for i, drops in enumerate(drop_pos_per_row):
        if drops is None or not len(drops):
            continue
        dead = np.asarray(list(drops), dtype=np.int64) - 1  # 1-based → 0
        keep[starts[i] + dead] = False
        n_drop[i] = len(dead)
    kept_counts = counts - n_drop
    offsets64 = np.concatenate([[0], np.cumsum(kept_counts,
                                               dtype=np.int64)])
    if offsets64[-1] >= 2 ** 31:  # int32 offsets would wrap silently
        raise ValueError(
            f"batch holds {offsets64[-1]} kept lines >= 2^31; shrink "
            "batch_size for this stage (offsets are int32 ListArray)")
    la = pa.ListArray.from_arrays(
        pa.array(offsets64.astype(np.int32), pa.int32()),
        lists.values.filter(pa.array(keep)))
    out = batch.append_column("text_clean", pc.binary_join(la, "\n"))
    return out.append_column("n_lines_dropped", pa.array(n_drop))


class DropLinesStage:
    """Reconstruction actor: fetches the broadcast drop table ONCE in
    ``__init__`` (doc_id → drop-position array), then per batch rebuilds
    via `_rebuild_lines` — docs with no dropped line take the no-op
    mask path.  Appends ``text_clean`` and ``n_lines_dropped``."""

    def __init__(self, drop_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        tbl = (drop_ref if isinstance(drop_ref, pa.Table)
               else ray.get(drop_ref))
        self.text_col, self.id_col = text_col, id_col
        df = pd.DataFrame({"d": tbl[id_col].to_numpy(zero_copy_only=False),
                           "p": tbl["pos"].to_numpy(zero_copy_only=False)})
        self.drops = {d: g.to_numpy()
                      for d, g in df.groupby("d", sort=False)["p"]}

    def __call__(self, batch: pa.Table) -> pa.Table:
        per_row = [self.drops.get(d)
                   for d in batch[self.id_col].to_pylist()]
        return _rebuild_lines(batch, self.text_col, per_row)


def _apply_line_drops_part(group: pa.Table, text_col: str, id_col: str,
                           orig_cols: list,
                           out_schema: pa.Schema) -> pa.Table:
    """One doc-complete partition of the tagged union: split doc rows
    (``_side`` 0) from drop rows (``_side`` 1), gather each doc's drop
    positions with a pandas C groupby, rebuild vectorized."""
    if group.num_rows == 0:
        return out_schema.empty_table()
    side = group["_side"].to_numpy(zero_copy_only=False)
    docs = group.filter(pa.array(side == 0)).select(orig_cols)
    if docs.num_rows == 0:
        return out_schema.empty_table()
    rm = group.filter(pa.array(side == 1))
    if rm.num_rows:
        df = pd.DataFrame(
            {"d": rm[id_col].to_numpy(zero_copy_only=False),
             "p": rm["_pos"].to_numpy(zero_copy_only=False)})
        m = {d: g.to_numpy() for d, g in df.groupby("d", sort=False)["p"]}
    else:
        m = {}
    per_row = [m.get(d) for d in docs[id_col].to_pylist()]
    return _rebuild_lines(docs, text_col, per_row).cast(out_schema)


def line_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
               num_partitions: int = 64, concurrency: int = 4,
               backend: str = "broadcast"):
    """Corpus-wide duplicate-line removal (see module comment above).
    Returns the input dataset with ``text_clean`` (surviving lines
    re-joined with \\n; '' if every line was a duplicate) and
    ``n_lines_dropped`` appended.  Consumes the source twice (decision +
    reconstruction) — the documented two-pass trade of
    ``jaccard_near_dups``; at scale the decision pass reads a pruned
    (id, text) projection.

    ``backend="broadcast"`` (default): the drop table — bounded by the
    duplicate-LINE occurrence count — is ``ray.put`` once and applied
    statelessly; the payload never shuffles.  ``backend="join"``: docs
    and drop rows are tagged onto ONE canonical schema, pre-bucketed on
    ``hash(doc_id) % P``, and each doc-complete partition rebuilds
    vectorized — one payload shuffle, but no materialized copy of the
    drop set anywhere (driver or actor): the shape for adversarial
    duplicate rates.  Both backends are pytest-proven row-identical
    (`tests/test_line_dedup.py`)."""
    import ray
    import ray.data

    drops_ds = ds.map_batches(
        lambda b: _line_rows(b, text_col, id_col, num_partitions),
        batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: _line_losers(g, id_col), batch_format="pyarrow")
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    if backend == "join":
        orig_schema = pa.schema(list(zip(sch.names, sch.types)))
        orig_cols = list(sch.names)
        canon = pa.schema(list(orig_schema)
                          + [pa.field("_side", pa.int8()),
                             pa.field("_pos", pa.int64())])
        out_schema = pa.schema(list(orig_schema)
                               + [pa.field("text_clean", pa.string()),
                                  pa.field("n_lines_dropped", pa.int64())])

        def _tag_docs(b: pa.Table) -> pa.Table:
            cols = {c: b[c] for c in orig_cols}
            cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8))
            cols["_pos"] = pa.nulls(b.num_rows, pa.int64())
            out = pa.table(cols).cast(canon)
            return out.append_column(
                "_part", pa.array(_part_of(out[id_col], num_partitions)))

        def _tag_rm(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or b.num_rows == 0:
                return canon.append(
                    pa.field("_part", pa.int64())).empty_table()
            cols = {c: (b[id_col] if c == id_col
                        else pa.nulls(b.num_rows,
                                      orig_schema.field(c).type))
                    for c in orig_cols}
            cols["_side"] = pa.array(np.ones(b.num_rows, np.int8))
            cols["_pos"] = b["pos"]
            out = pa.table(cols).cast(canon)
            return out.append_column(
                "_part", pa.array(_part_of(out[id_col], num_partitions)))

        tagged = ds.map_batches(_tag_docs, batch_format="pyarrow").union(
            drops_ds.map_batches(_tag_rm, batch_format="pyarrow"))
        empty = ray.data.from_arrow(out_schema.empty_table())
        return empty.union(tagged.groupby("_part").map_groups(
            lambda g: _apply_line_drops_part(g, text_col, id_col,
                                             orig_cols, out_schema),
            batch_format="pyarrow"))
    # broadcast: bounded by the duplicate-line count; backend="join"
    # above is the escape hatch at extreme duplicate rates
    drop_batches = list(drops_ds.iter_batches(batch_format="pyarrow"))
    drop_tbl = (pa.concat_tables(drop_batches) if drop_batches
                else pa.table({id_col: pa.array([], id_type),
                               "pos": pa.array([], pa.int64())}))
    drop_ref = ray.put(drop_tbl)
    return ds.map_batches(
        DropLinesStage, batch_format="pyarrow",
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"drop_ref": drop_ref,
                               "text_col": text_col, "id_col": id_col})

"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
phash-Hamming near-dup.

All are Ray-Data-shaped: a vectorized ``map_batches`` fingerprint stage
followed by a ``groupby`` on the fingerprint (hash partition) — the
shuffle moves only (key, id) pairs, never payloads.  MinHash/SimHash
sketches are mergeable and computed per batch; LSH banding explodes to
(band, band_hash, id) rows so candidate buckets co-locate in one shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "content_hash_batch", "exact_dedup",
    "MinHasher", "minhash_batch", "lsh_bands_batch", "minhash_dedup",
    "simhash_batch", "ngram_jaccard",
    "phash_near_dup_batchfn",
]

_M61 = (1 << 61) - 1


def _hash_u64(arr_u64, seed):
    """splitmix64 over a uint64 numpy array (vectorized)."""
    x = arr_u64 + np.uint64(0x9E3779B97F4A7C15 * (seed + 1) & 0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


_SEEDS_CACHE = {}


def _perm_seeds(num_perm):
    """(P, 1) uint64 seed constants for the vectorized signature."""
    if num_perm not in _SEEDS_CACHE:
        _SEEDS_CACHE[num_perm] = np.array(
            [(0x9E3779B97F4A7C15 * (p + 1)) & 0xFFFFFFFFFFFFFFFF
             for p in range(num_perm)], dtype=np.uint64)[:, None]
    return _SEEDS_CACHE[num_perm]


def _text_tokens_u64(text):
    """Whitespace tokens of one string → uint64 hashes.

    Two C-speed crc32 passes (forward + salted) combined into 64 bits —
    deterministic across processes and ~100× faster than a per-byte
    Python FNV loop on long documents.
    """
    import zlib

    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks), dtype=np.uint64)
    crc = zlib.crc32
    for i, t in enumerate(toks):
        b = t.encode("utf-8", "ignore")
        # crc of the reversed bytes is an independent linear functional of
        # the message bits (a salted crc is NOT: crc(b, salt) ==
        # crc(b) ^ f(salt, len) by linearity), so the pair carries a full
        # 64 bits of content entropy
        out[i] = crc(b) | (crc(b[::-1]) << 32)
    return _hash_u64(out, 0)  # final mix for bit dispersion


def _shingles(tok_hashes, n=3):
    """n-gram shingle hashes from token hashes (rolling combine)."""
    if len(tok_hashes) < n:
        return tok_hashes.copy() if len(tok_hashes) else tok_hashes
    acc = tok_hashes[: len(tok_hashes) - n + 1].copy()
    for j in range(1, n):
        acc = _hash_u64(acc ^ tok_hashes[j: len(tok_hashes) - n + 1 + j], j)
    return acc


def content_hash_batch(batch: pa.Table, col="text",
                       out_col="content_hash") -> pa.Table:
    """Append a 64-bit content hash of ``col`` (exact-dedup key).

    Forward + reversed crc32 give two independent linear functionals of
    the content → full 64-bit collision resistance (2^-64 per pair, not
    the 2^-32 a single crc gives).  At extreme corpus sizes a
    text-equality verify inside the hash group upgrades this to exact.
    """
    import zlib

    vals = batch[col].to_pylist()

    def h64(v):
        b = v.encode() if v else b""
        return (zlib.crc32(b) | (zlib.crc32(b[::-1]) << 32)) - (1 << 63)

    out = np.fromiter((h64(v) for v in vals), dtype=np.int64,
                      count=len(vals))
    return batch.append_column(out_col, pa.array(out, pa.int64()))


def exact_dedup(ds, col="text", id_col="doc_id"):
    """Exact dedup: hash-partition on content hash, keep min-id per group.

    ``groupby(hash).map_groups(first-by-id)`` — the canonical
    hash-partition + per-group-first; deterministic winner (min id).
    """
    import pandas as pd

    ds = ds.map_batches(lambda t: content_hash_batch(t, col=col),
                        batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return ds.groupby("content_hash").map_groups(keep_first,
                                                 batch_format="pandas")


class MinHasher:
    """Stateful minhash machinery: permutation seeds fixed at init
    (actor-pool state; one instance per actor)."""

    def __init__(self, num_perm=64, shingle_n=3):
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def signature(self, text):
        sh = _shingles(_text_tokens_u64(text), self.shingle_n)
        if len(sh) == 0:
            return np.full(self.num_perm, np.uint64(_M61), dtype=np.uint64)
        # all permutations at once: (P, S) mix then row-min — identical
        # values to the per-permutation loop (same splitmix constants)
        x = sh[None, :] + _perm_seeds(self.num_perm)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch["text"].to_pylist()]
        arr = pa.array([s.astype(np.int64).tolist() for s in sigs],
                       pa.list_(pa.int64(), self.num_perm))
        return batch.append_column("minhash", arr)


def minhash_batch(batch, num_perm=64, shingle_n=3):
    return MinHasher(num_perm, shingle_n)(batch)


def lsh_bands_batch(batch: pa.Table, bands=16, id_col="doc_id") -> pa.Table:
    """Explode minhash signatures to (band, band_hash, id) rows.

    ``bands`` must divide ``num_perm`` (else trailing permutations would
    silently drop out of every band)."""
    sig = np.asarray(
        batch["minhash"].combine_chunks().flatten()
        if isinstance(batch["minhash"], pa.ChunkedArray)
        else batch["minhash"].flatten(), dtype=np.int64)
    n = batch.num_rows
    num_perm = len(sig) // max(n, 1)
    if n and num_perm % bands != 0:
        raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
    r = num_perm // bands
    sig = sig.reshape(n, num_perm).astype(np.uint64)
    ids = batch[id_col]
    out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
    out_id = pa.concat_arrays(
        [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
         else ids] * bands)
    bh = np.empty((bands, n), dtype=np.uint64)
    for b in range(bands):
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(b * r, (b + 1) * r):
            acc = _hash_u64(acc ^ sig[:, j], j)
        bh[b] = acc
    return pa.Table.from_pydict({
        "band": pa.array(out_band),
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        id_col: out_id})


def minhash_dedup(ds, id_col="doc_id", num_perm=64, bands=16, shingle_n=3,
                  threshold=0.7, bucket_cap=512, num_shards=64):
    """MinHash-LSH near-dup: signature → band explode → ONE shard
    shuffle → per-shard vectorized bucket scan with in-place
    verification.

    Returns a Dataset of ``(id_a, id_b, est_jaccard)`` pairs (id_a <
    id_b) whose signature-estimated Jaccard ≥ threshold.  Connected-
    component clustering is left to the caller.

    Scale shape (the whole pipeline is one streaming pass + one
    all-to-all):

    * signatures are computed per batch (stateless task pool) and travel
      WITH their banded rows — no side table, no driver materialization;
    * banded rows shuffle once, hash-partitioned by ``band_hash %
      num_shards``; every LSH bucket lands wholly in one shard;
    * inside a shard, buckets are runs after one lexsort; pairs, their
      estimated Jaccard, and the emit decision are pure numpy;
    * hot buckets are capped at ``bucket_cap`` members (deterministic:
      lexicographically-first ids participate) BEFORE the O(m²) pair
      expansion — exact and local, no global count pass;
    * cross-band duplicate pairs are removed by one final groupby over
      the post-threshold survivors — a tiny shuffle bounded by the true
      near-dup count × bands (a shuffle-free smallest-agreeing-band
      rule was rejected: it loses pairs whose minimal band's bucket was
      capped in another shard).

    ``num_shards`` bounds per-shard memory (corpus × bands /
    num_shards rows); raise it for large corpora.
    """
    import pandas as pd

    def sig_and_band(t: pa.Table) -> pa.Table:
        hasher = MinHasher(num_perm, shingle_n)
        sigt = hasher(t)
        banded = lsh_bands_batch(sigt, bands=bands, id_col=id_col)
        arr = sigt["minhash"].combine_chunks() if isinstance(
            sigt["minhash"], pa.ChunkedArray) else sigt["minhash"]
        flat = np.asarray(arr.flatten(), dtype=np.int64)
        mat = flat.reshape(t.num_rows, -1) if t.num_rows else \
            flat.reshape(0, 1)
        blobs = [mat[i].tobytes() for i in range(t.num_rows)]
        # lsh_bands_batch emits band-major rows, each band block in
        # input row order — tile the sig blobs to match
        shard = (np.asarray(banded["band_hash"], dtype=np.int64)
                 % num_shards).astype(np.int32)
        return banded.append_column(
            "sigbin", pa.array(blobs * bands, pa.binary())).append_column(
            "shard", pa.array(shard))

    banded = ds.map_batches(sig_and_band, batch_format="pyarrow")

    def scan_shard(g: pd.DataFrame) -> pd.DataFrame:
        id_dtype = g[id_col].dtype if len(g) else object
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=id_dtype),
            "id_b": pd.Series([], dtype=id_dtype),
            "est_jaccard": pd.Series([], dtype=np.float64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["band", "band_hash", id_col],
                          kind="mergesort").reset_index(drop=True)
        key_b = g["band"].to_numpy()
        key_h = g["band_hash"].to_numpy()
        new_run = np.empty(len(g), dtype=bool)
        new_run[0] = True
        new_run[1:] = (key_b[1:] != key_b[:-1]) | (key_h[1:] != key_h[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(g))
        sig_mat = np.stack([np.frombuffer(v, dtype=np.int64)
                            for v in g["sigbin"]]).astype(np.uint64)
        ids = g[id_col].to_numpy()
        out_a, out_b, out_e = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > bucket_cap:  # hot-bucket cap before O(m²)
                e = s + bucket_cap
                m = bucket_cap
            iu = np.triu_indices(m, 1)
            ai = s + iu[0]
            bi = s + iu[1]
            est = (sig_mat[ai] == sig_mat[bi]).mean(axis=1)
            keep = est >= threshold
            if not keep.any():
                continue
            ai, bi, est = ai[keep], bi[keep], est[keep]
            # every agreeing band emits its pairs; the final survivor
            # groupby dedups across bands.  (A smallest-agreeing-band
            # local rule would be shuffle-free but silently LOSES a pair
            # whenever its minimal band's bucket was capped in another
            # shard — correctness over the extra tiny shuffle.)
            out_a.append(ids[ai])
            out_b.append(ids[bi])
            out_e.append(est)
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "est_jaccard": np.concatenate(out_e)})

    scanned = banded.groupby("shard").map_groups(
        scan_shard, batch_format="pandas")
    # cross-band duplicate removal over the small post-threshold
    # survivor set (bounded by the true near-dup count × bands)
    return scanned.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def simhash_batch(batch: pa.Table, col="text", out_col="simhash") -> pa.Table:
    """64-bit SimHash of token multiset (vectorized bit-vote per doc)."""
    out = np.empty(batch.num_rows, dtype=np.int64)
    for i, t in enumerate(batch[col].to_pylist()):
        hs = _text_tokens_u64(t or "")
        if len(hs) == 0:
            out[i] = 0
            continue
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        # pack the 64 majority bits into one signed word (bit b = 1<<b);
        # the int64 view applies two's complement for the sign bit
        # explicit little-endian view so simhash values match the SQL
        # oracle on any host endianness (video ahash pins '>i8' likewise)
        out[i] = np.packbits(votes > 0,
                             bitorder="little").view("<i8")[0]
    return batch.append_column(out_col, pa.array(out, pa.int64()))


def ngram_jaccard(text_a, text_b, n=3):
    """Exact n-gram (token shingle) Jaccard between two strings."""
    sa = set(_shingles(_text_tokens_u64(text_a), n).tolist())
    sb = set(_shingles(_text_tokens_u64(text_b), n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def phash_near_dup_batchfn(batch: pa.Table, max_hamming=4) -> pa.Table:
    """Band images by phash for near-dup candidate generation.

    Pigeonhole banding: the 64-bit phash splits into ``max_hamming + 1``
    disjoint bands; any pair within ``max_hamming`` bit flips agrees on at
    least one whole band, so emitting one (band, band_bits, id) row per
    band guarantees every qualifying pair co-locates in ≥1 bucket of the
    following ``groupby(["band", "band_bits"])`` (which then verifies the
    full Hamming distance).
    """
    ph = np.asarray(batch["phash"], dtype=np.int64).astype(np.uint64)
    n_bands = max_hamming + 1
    width = 64 // n_bands
    n = len(ph)
    bands, bits, ids = [], [], []
    id_col = batch["image_id"]
    for b in range(n_bands):
        shift = np.uint64(b * width)
        w = np.uint64(64 - width if b == n_bands - 1 else width)
        mask = np.uint64((1 << int(w)) - 1)
        bands.append(np.full(n, b, dtype=np.int32))
        bits.append(((ph >> shift) & mask).astype(np.int64))
    out_id = pa.concat_arrays(
        [id_col.combine_chunks() if isinstance(id_col, pa.ChunkedArray)
         else id_col] * n_bands)
    return pa.Table.from_pydict({
        "band": pa.array(np.concatenate(bands)),
        "band_bits": pa.array(np.concatenate(bits)),
        "phash": pa.concat_arrays(
            [batch["phash"].combine_chunks()
             if isinstance(batch["phash"], pa.ChunkedArray)
             else batch["phash"]] * n_bands),
        "image_id": out_id})

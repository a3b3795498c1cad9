"""Deduplication for large text corpora, Ray-Data-first (SURVEY §2.7 scale-up):

- exact dedup: content-hash column -> groupby(hash) -> per-group first
  (the D1 "hash-partition + per-group first" pattern, reference
  services/result_merger.py:100-118 generalized to corpus scale)
- MinHash signatures + LSH banding: shingle -> minhash -> (band, bucket)
  explode -> groupby band-bucket -> candidate pairs -> Jaccard verify
- SimHash 64-bit fingerprints (hamming-near duplicates)
- character n-gram Jaccard verification

All sketch math is numpy-vectorized per document; the wide steps are the
standard Ray shuffles (`groupby` on small integer keys), with candidate-pair
generation bounded per bucket to survive skew (a degenerate bucket of B docs
would otherwise emit B^2 pairs).

Determinism: all hash seeds fixed; no Python ``hash()`` (salted per process).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa

# -- stable content hashes ---------------------------------------------------

def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def md5_hex_batch(batch: pa.Table, text_col: str = "text",
                  out_col: str = "text_hash") -> pa.Table:
    # null text hashes like the empty string (deterministic; a null row
    # must not kill the task with AttributeError)
    hashes = [md5_hex(t if t is not None else "")
              for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


# -- shingles / minhash ------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char-shingle hashes (uint64) via rolling polynomial hash."""
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    n = len(data) - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(n, dtype=np.uint64)
        base = np.uint64(1000003)
        mult = np.uint64(1)
        for j in range(k - 1, -1, -1):
            acc += data[j:j + n].astype(np.uint64) * mult
            mult = mult * base
    return np.unique(acc)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int = 64, k: int = 5,
                      params: Optional[tuple[np.ndarray, np.ndarray]] = None,
                      ) -> np.ndarray:
    """num_perm-wide MinHash signature (uint64) of the k-shingle set."""
    a, b = params if params is not None else _minhash_params(num_perm)
    sh = _shingle_hashes(text, k)
    if len(sh) == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # NOT a true (a*x+b) mod Mersenne61: shingle hashes are full-range
        # uint64, so a*x wraps mod 2^64 BEFORE the Mersenne fold. What
        # remains is a deterministic mixing permutation family — adequate
        # here because every candidate pair is verified by EXACT Jaccard
        # downstream (the estimate only gates candidacy), and the output
        # is pinned golden. A strict universal family would need the
        # shingles reduced mod M first and a 128-bit multiply.
        prod = a[:, None] * sh[None, :] + b[:, None]
        hashed = (prod & _MERSENNE) + (prod >> np.uint64(61))
        hashed = np.where(hashed >= _MERSENNE, hashed - _MERSENNE, hashed)
    return hashed.min(axis=1)


def band_buckets(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """LSH banding: one stable bucket id per band (int64), from the md5 of the
    band's rows. Pair (band_index, bucket) is the shuffle key."""
    rows = len(sig) // n_bands
    out = []
    for b in range(n_bands):
        chunk = sig[b * rows:(b + 1) * rows]
        digest = hashlib.md5(chunk.tobytes()).digest()
        out.append(int.from_bytes(digest[:8], "little", signed=True))
    return out


def jaccard_ngrams(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity (verification step)."""
    return jaccard_from_shingles(_shingle_hashes(a, k), _shingle_hashes(b, k))


def jaccard_from_shingles(sa: np.ndarray, sb: np.ndarray) -> float:
    """Jaccard over precomputed sorted-unique shingle arrays — use with a
    per-doc cache when verifying many pairs (each doc's shingles computed
    once, not once per pair)."""
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# -- simhash -----------------------------------------------------------------

def simhash64(text: str, k: int = 4) -> int:
    """64-bit SimHash over k-char shingles (signed-int64 representation).
    Near-duplicates differ in a few bits (hamming distance)."""
    sh = _shingle_hashes(text, k)
    if len(sh) == 0:
        return 0
    # spread shingle hashes to 64 bits via splitmix-style finalizer
    with np.errstate(over="ignore"):
        x = sh + np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30); x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27); x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(x)
    word = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            word |= np.uint64(1) << np.uint64(i)
    return int(np.int64(word))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def simhash_bands(sim: int, n_bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into ``n_bands`` equal bit-bands (LSH keys:
    two docs within hamming distance < n_bands must share a band)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    u = sim & 0xFFFFFFFFFFFFFFFF
    return [(u >> (i * width)) & mask for i in range(n_bands)]


# -- batch stages ------------------------------------------------------------

class MinHasher:
    """Warmed-state stage (callable class for actor pools OR per-worker
    caching as a task): permutation params built once; emits the signature as
    fixed-size binary plus the per-band LSH keys.

    The signature math stays PER-DOC numpy (64 x ~hundreds of shingles):
    measured here, one large batch-concatenated uint64 matrix is ~100x
    SLOWER than the same FLOPs in per-doc slices (multi-MB uint64
    temporaries hit a pathological allocation/page-fault cost on this
    platform), and the per-doc kernel is already ~0.3 ms/doc — the LSH
    shuffles dominate the pipeline, not this stage."""

    def __init__(self, num_perm: int = 64, n_bands: int = 16, k: int = 5):
        self.num_perm = num_perm
        self.n_bands = n_bands
        self.k = k
        self.params = _minhash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs, bands = [], []
        for t in batch.column("text").to_pylist():
            sig = minhash_signature(t, self.num_perm, self.k, self.params)
            sigs.append(sig.tobytes())
            bands.append(band_buckets(sig, self.n_bands))
        batch = batch.append_column("minhash", pa.array(sigs, pa.binary()))
        return batch.append_column("bands", pa.array(bands, pa.list_(pa.int64())))


def explode_bands(batch: pa.Table, id_col: str = "doc_id",
                  max_per_row: Optional[int] = None) -> pa.Table:
    """(doc, [b0..bn]) -> one row per (band_index, bucket, doc) for the LSH
    groupby. Output is narrow: ids + keys only."""
    ids = batch.column(id_col).to_pylist()
    bands = batch.column("bands").to_pylist()
    out_id, out_band, out_bucket = [], [], []
    for i, bl in zip(ids, bands):
        for bi, bucket in enumerate(bl):
            out_id.append(i)
            out_band.append(bi)
            out_bucket.append(bucket)
    return pa.Table.from_pydict({
        # pin the id type from the input schema: an EMPTY batch would
        # otherwise emit a null-typed column that breaks schema
        # unification downstream
        id_col: pa.array(out_id, batch.schema.field(id_col).type),
        "band": pa.array(out_band, pa.int32()),
        "bucket": pa.array(out_bucket, pa.int64()),
    })


def candidate_pairs_from_bucket(ids: Iterable[int],
                                max_pairs_per_bucket: int = 1000) -> list[tuple[int, int]]:
    """Unique ordered pairs within one LSH bucket, truncated at
    ``max_pairs_per_bucket`` (skew guard: a hot bucket of B docs would emit
    B^2/2 pairs; truncation is recorded by callers via counters)."""
    uniq = sorted(set(ids))
    pairs = []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            pairs.append((uniq[i], uniq[j]))
            if len(pairs) >= max_pairs_per_bucket:
                return pairs
    return pairs

"""Vectorized Bloom filter for map-side semi-join pruning.

The scale shape this enables: a probe stream (billions of rows) is filtered
against a build side too large to broadcast as an exact set but whose BLOOM
image is tiny (~10 bits/key at 1% fp). Build is distributed — each build
block emits a partial filter over its own keys and the partials OR-merge
associatively (the same merge a multi-node tree-reduce needs) — then the
merged bits broadcast once via ``ray.put``. Because membership answers may
be false-positive, callers needing exactness follow the pruned stream with
an exact verify (e.g. ``functions.joins.bucketed_join``): the bloom cuts
probe rows BEFORE the expensive join, the join removes the ~1% survivors
that were noise.

Hashing is double-hashing over splitmix64 (position_i = h1 + i*h2 mod m),
deterministic across runs/platforms; string keys go through pandas'
fixed-key siphash like ``joins._bucket_of``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _mix(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _as_u64(keys) -> np.ndarray:
    # EVERY container routes through the ONE shared key hash
    # (functions/joins.key_hash_u64). Its path decision is by ARROW type,
    # so a batch containing one null integer key cannot silently flip the
    # whole batch onto the string path while the (null-free) build side
    # used the integer path, and a filter built from a numpy array probes
    # identically to one built from an Arrow column — either asymmetry
    # would produce bloom false NEGATIVES, violating the 'False is always
    # correct' contract.
    from .joins import key_hash_u64
    if not isinstance(keys, (pa.Array, pa.ChunkedArray)):
        np_keys = np.asarray(keys)
        if np_keys.dtype.kind == "U":
            np_keys = np_keys.astype(object)
        keys = pa.array(np_keys)
    return key_hash_u64(keys)


def bloom_params(n_capacity: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_capacity`` keys at ``fp_rate``; m_bits is
    rounded up to a byte multiple."""
    n = max(1, n_capacity)
    m = math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(keys_u64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing."""
    h1 = _mix(keys_u64)
    h2 = _mix(keys_u64 ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def bloom_build(keys, m_bits: int, k: int) -> np.ndarray:
    """Byte array (uint8, m_bits/8 long) with all key positions set."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    u = _as_u64(keys)
    if len(u):
        pos = _positions(u, m_bits, k).ravel()
        np.bitwise_or.at(bits, pos >> 3,
                         np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
    return bits


def bloom_or(parts: list[np.ndarray]) -> np.ndarray:
    """Associative OR-merge of same-shape partial filters."""
    out = np.zeros_like(parts[0])
    for p in parts:
        out |= np.frombuffer(bytes(p), dtype=np.uint8)
    return out


def bloom_from_dataset(ds, key_col: str, m_bits: int, k: int) -> np.ndarray:
    """Build the filter DISTRIBUTED from a Dataset's blocks: each block
    emits a partial filter over its own keys (one binary row), the partials
    OR-merge on the driver — which holds only the m_bits/8-byte image, never
    the keys. The shared shape behind every bloom-pruned semi-join."""
    def partial(t: pa.Table) -> pa.Table:
        # sort-shuffle aggregates can emit empty zero-COLUMN blocks
        if t.num_rows == 0:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
        else:
            bits = bloom_build(t.column(key_col), m_bits, k)
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    # STREAM the partials and OR in place: the driver holds the merged
    # image plus at most one in-flight block (NOT n_blocks images at once —
    # at ~10^9 keys a partial is ~1.2 GB, so take_all() would OOM the
    # driver; a multi-node deployment can tree-reduce upstream of this
    # final OR, the merge is associative).
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    stream = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
    for batch in stream.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
        for part in batch.column("bloom"):
            bits |= np.frombuffer(part.as_py(), dtype=np.uint8)
    return bits


def bloom_contains(bits: np.ndarray, keys, m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership test; True may be a false positive, False is
    always correct."""
    u = _as_u64(keys)
    if not len(u):
        return np.zeros(0, dtype=bool)
    pos = _positions(u, m_bits, k)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=1)

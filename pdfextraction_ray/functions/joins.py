"""Join strategy toolkit — three regimes, chosen by build-side size.

- SMALL build side (< ~10^6 keys): broadcast the whole mapping once
  (``ray.put`` + vectorized ``index_in``/``take`` per batch — see
  ``queries._BroadcastLookup``). One object, fetched once per worker.
- MID build side (10^6–10^8 keys — too big to broadcast whole, far smaller
  than the probe side): THIS module. The build table is hash-partitioned
  into ``n_buckets`` object-store objects; each probe batch fetches ONLY the
  buckets its keys hash to (cached per worker process; the object store
  additionally shares a bucket across every worker on a node). No all-to-all
  shuffle: the probe side streams, the build side moves at most
  ``n_buckets`` × node count objects.
- HUGE both sides: ``Dataset.join`` (hash shuffle of both sides). Ray 2.49's
  JoinOperator carries a ~4-6 s fixed cost per join at bench scale
  (measured, NOTES_ROUND2) — amortizes at cluster scale.

The bucket hash must be identical on both sides: Knuth multiplicative mix
for integer keys, pandas' fixed-key siphash for strings (both documented,
deterministic across runs/platforms).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def key_hash_u64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 per key — THE shared key-hash for every
    hash-partitioned structure (bucketed join, bloom filter, salted
    shuffle): build/probe sides must agree bit-for-bit.

    The path decision uses the ARROW type, never the numpy dtype: a nulled
    int column converts to float64, and letting dtype pick the path would
    silently hash an entire batch differently from the (null-free) build
    side — every key in the batch mis-buckets. Null keys hash to a fixed
    value (they match nothing in a join; bloom membership for them is
    meaningless but stable)."""
    typ = arr.type
    if pa.types.is_integer(typ):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        np_arr = arr.fill_null(0).to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = np_arr.astype(np.uint64) * _KNUTH
            h ^= h >> np.uint64(32)
        return h
    np_arr = arr.to_numpy(zero_copy_only=False)
    # categorize=False is REQUIRED for cross-array consistency: the
    # categorize fast path mis-hashes strings with embedded NUL bytes
    # (observed pandas 2.2.2 — the same value hashes differently
    # depending on the surrounding array), and build/probe sides hash
    # different arrays by construction.
    return pd.util.hash_array(np_arr.astype(object), categorize=False)


def _bucket_of(arr: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id per key (same function both sides)."""
    return (key_hash_u64(arr) % np.uint64(n_buckets)).astype(np.int64)


class BucketedBuildSide:
    """Hash-partitioned build side living in the object store.

    ``n_buckets`` sizes the per-fetch unit: pick so one bucket
    (build_rows / n_buckets) fits comfortably in a worker heap — e.g. a
    10^8-row build side with 256 buckets is ~400k rows (~tens of MB) per
    fetch, each fetched at most once per worker and shared per node.
    """

    def __init__(self, table: pa.Table, key_col: str, n_buckets: int = 64):
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self.key_col = key_col
        self.n_buckets = n_buckets
        buckets = _bucket_of(table.column(key_col), n_buckets)
        # ONE stable sort + contiguous slices, not n_buckets full-table
        # filter passes (O(n log n) vs O(n_buckets x n) scans + masks)
        order = np.argsort(buckets, kind="stable")
        sorted_tbl = table.take(pa.array(order))
        counts = np.bincount(buckets, minlength=n_buckets)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        self.refs = [ray.put(sorted_tbl.slice(int(offsets[b]),
                                              int(counts[b])))
                     for b in range(n_buckets)]


# per-worker-process bucket LRU: (ref hex) -> pa.Table. Bounded by ENTRY
# COUNT with least-recently-used eviction — a wholesale clear() would evict
# the live join's hot buckets along with stale ones, and unbounded growth
# pins every past join's buckets in worker heaps for the process lifetime.
from collections import OrderedDict  # noqa: E402

_BUCKET_CACHE: "OrderedDict[str, pa.Table]" = OrderedDict()
_BUCKET_CACHE_MAX = 256


def _cached_bucket(ref) -> pa.Table:
    key = ref.hex()
    tbl = _BUCKET_CACHE.get(key)
    if tbl is None:
        tbl = ray.get(ref)
        while len(_BUCKET_CACHE) >= _BUCKET_CACHE_MAX:
            _BUCKET_CACHE.popitem(last=False)
        _BUCKET_CACHE[key] = tbl
    else:
        _BUCKET_CACHE.move_to_end(key)
    return tbl


def _probe_batch(batch: pa.Table, refs: list, probe_key: str, build_key: str,
                 value_cols: Sequence[str], value_types: dict, n_buckets: int,
                 join_type: str) -> pa.Table:
    if batch.num_rows == 0:
        for c in value_cols:
            batch = batch.append_column(c, pa.array([], value_types[c]))
        return batch
    buckets = _bucket_of(batch.column(probe_key), n_buckets)
    pieces = []
    for b in np.unique(buckets):
        sub = batch.filter(pa.array(buckets == b, pa.bool_()))
        build = _cached_bucket(refs[int(b)])
        idx = pc.index_in(sub.column(probe_key),
                          value_set=build.column(build_key))
        if join_type == "inner":
            valid = pc.is_valid(idx)
            sub = sub.filter(valid)
            idx = idx.filter(valid)
        for c in value_cols:
            sub = sub.append_column(c, pc.take(build.column(c), idx))
        pieces.append(sub)
    return pa.concat_tables(pieces)


def bucketed_join(probe_ds, build_table: pa.Table, *, probe_key: str,
                  build_key: str, value_cols: Optional[Sequence[str]] = None,
                  n_buckets: int = 64, join_type: str = "left") -> "ray.data.Dataset":
    """Map-side join: stream ``probe_ds`` against a hash-bucketed
    ``build_table`` (unique keys). ``join_type`` 'left' (nulls for unmatched
    probe rows) or 'inner'. Returns a Dataset with ``value_cols`` appended.

    The probe side never shuffles; each worker pulls only the build buckets
    its batches reference. Task form (not an actor pool) so it composes with
    reserving operators in the same plan (see pipelines/runner.py note).
    """
    if join_type not in ("left", "inner"):
        raise ValueError(f"join_type must be 'left' or 'inner', got {join_type!r}")
    if value_cols is None:
        value_cols = [c for c in build_table.column_names if c != build_key]
    side = BucketedBuildSide(build_table, build_key, n_buckets)
    refs = side.refs
    value_types = {c: build_table.schema.field(c).type for c in value_cols}
    return probe_ds.map_batches(
        lambda t: _probe_batch(t, refs, probe_key, build_key,
                               list(value_cols), value_types, n_buckets,
                               join_type),
        batch_format="pyarrow")

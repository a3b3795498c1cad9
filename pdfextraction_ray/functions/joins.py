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

    @classmethod
    def from_dataset(cls, ds, key_col: str, n_buckets: int = 64,
                     schema: Optional[pa.Schema] = None) -> "BucketedBuildSide":
        """Build the hash-partitioned side DISTRIBUTED, from a Dataset's own
        blocks — the whole build side never lands on the driver (the driver
        holds only object refs). Shape: one split task per block fans each
        block out into ``n_buckets`` bucket pieces; one concat task per
        bucket merges that bucket's pieces. This is what lets n-sized state
        (graph ranks/labels, LM counts) serve as a join build side at scales
        where a driver-resident ``pa.Table`` would OOM.
        """
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self = cls.__new__(cls)
        self.key_col = key_col
        self.n_buckets = n_buckets
        block_refs = ds.to_arrow_refs()
        if not block_refs:
            if schema is None:
                schema = ds.schema().base_schema
            empty = ray.put(schema.empty_table())
            self.refs = [empty] * n_buckets
            return self
        if schema is None:
            schema = ds.schema().base_schema
        pieces = []
        for r in block_refs:
            out = _split_block_to_buckets.options(
                num_returns=n_buckets).remote(r, key_col, n_buckets, schema)
            pieces.append([out] if n_buckets == 1 else out)
        self.refs = [_concat_bucket_pieces.remote(*[p[b] for p in pieces])
                     for b in range(n_buckets)]
        return self


# per-worker-process bucket LRU: (ref hex) -> pa.Table. Bounded by ENTRY
# COUNT with least-recently-used eviction — a wholesale clear() would evict
# the live join's hot buckets along with stale ones, and unbounded growth
# pins every past join's buckets in worker heaps for the process lifetime.
from collections import OrderedDict  # noqa: E402

_BUCKET_CACHE: "OrderedDict[str, pa.Table]" = OrderedDict()
_BUCKET_CACHE_MAX = 256


@ray.remote
def _split_block_to_buckets(tbl: pa.Table, key_col: str, n_buckets: int,
                            schema: pa.Schema):
    """One block -> its n_buckets bucket pieces (tuple return, one object
    ref per bucket — consumers fetch only the piece they need). Ray's
    sort-shuffle aggregates can emit EMPTY blocks with an empty (zero-
    column) schema; those become typed empty pieces via ``schema``."""
    if tbl.num_rows == 0:
        empty = schema.empty_table()
        return empty if n_buckets == 1 else tuple([empty] * n_buckets)
    buckets = _bucket_of(tbl.column(key_col), n_buckets)
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(buckets, minlength=n_buckets)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    out = tuple(sorted_tbl.slice(int(offsets[b]), int(counts[b]))
                for b in range(n_buckets))
    return out[0] if n_buckets == 1 else out


@ray.remote
def _concat_bucket_pieces(*pieces: pa.Table) -> pa.Table:
    return pa.concat_tables(pieces).combine_chunks()


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


def probe_membership(keys: "pa.Array | pa.ChunkedArray", refs: list,
                     build_key: str, n_buckets: int) -> np.ndarray:
    """Exact membership of ``keys`` in a bucketed build side (the
    semi/anti-join primitive): bucket the keys, fetch only the buckets they
    hash to (per-worker cached), ``index_in`` within each. Shared by the
    bloom-verify paths (dup-gram spans, incremental dedup) so the probe
    loop exists once."""
    member = np.zeros(len(keys), dtype=bool)
    if len(keys) == 0:
        return member
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    buckets = _bucket_of(keys, n_buckets)
    for b in np.unique(buckets):
        mask = buckets == b
        tbl = _cached_bucket(refs[int(b)])
        idx = pc.index_in(keys.filter(pa.array(mask)),
                          value_set=tbl.column(build_key))
        member[mask] = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    return member


def bucketed_join(probe_ds, build_table, *, probe_key: str,
                  build_key: str, value_cols: Optional[Sequence[str]] = None,
                  n_buckets: int = 64, join_type: str = "left") -> "ray.data.Dataset":
    """Map-side join: stream ``probe_ds`` against a hash-bucketed build side
    (unique keys). ``build_table`` is either a driver ``pa.Table`` (mid-size
    regime) or a ``ray.data.Dataset`` — the Dataset form is partitioned
    DISTRIBUTED via ``BucketedBuildSide.from_dataset`` and never lands on
    the driver, so n-sized state (iterative graph ranks/labels) can serve
    as a build side. ``join_type`` 'left' (nulls for unmatched probe rows)
    or 'inner'. Returns a Dataset with ``value_cols`` appended.

    The probe side never shuffles; each worker pulls only the build buckets
    its batches reference. Task form (not an actor pool) so it composes with
    reserving operators in the same plan (see pipelines/runner.py note).

    ``n_buckets`` is a CEILING: the effective bucket count collapses so a
    bucket holds >= ~25k rows (floor 1) — splitting a 1k-row model across
    64 buckets just multiplies the per-batch fetch + ``index_in`` calls
    with no memory benefit, while the asymptotic behavior (wide build
    sides stay wide) is unchanged.
    """
    if join_type not in ("left", "inner"):
        raise ValueError(f"join_type must be 'left' or 'inner', got {join_type!r}")
    if isinstance(build_table, pa.Table):
        build_schema = build_table.schema
        n_buckets = int(max(1, min(n_buckets,
                                   build_table.num_rows // 25_000 + 1)))
        side = BucketedBuildSide(build_table, build_key, n_buckets)
    else:
        _sch = build_table.schema()
        if _sch is None:
            # a fully-empty build dataset can lose its schema (e.g. the
            # winner set of an empty corpus): inner-join semantics are
            # exact without it — nothing matches
            if join_type == "inner":
                return probe_ds.map_batches(lambda t: t.slice(0, 0),
                                            batch_format="pyarrow")
            if not value_cols:
                return probe_ds
            raise ValueError(
                "bucketed_join: left join against a schema-less empty "
                "build side cannot type its value columns — pass a typed "
                "empty dataset")
        build_schema = _sch.base_schema
        build_table = build_table.materialize()
        n_buckets = int(max(1, min(n_buckets,
                                   build_table.count() // 25_000 + 1)))
        side = BucketedBuildSide.from_dataset(build_table, build_key,
                                              n_buckets, schema=build_schema)
    if value_cols is None:
        value_cols = [c for c in build_schema.names if c != build_key]
    refs = side.refs
    value_types = {c: build_schema.field(c).type for c in value_cols}
    return probe_ds.map_batches(
        lambda t: _probe_batch(t, refs, probe_key, build_key,
                               list(value_cols), value_types, n_buckets,
                               join_type),
        batch_format="pyarrow")


KEY_BROADCAST_MAX = 5_000_000  # ~40 MB sorted u64 — the broadcast budget


def int_keys_membership(keys_ds, key_col: str,
                        broadcast_max: int = KEY_BROADCAST_MAX,
                        fp_rate: float = 0.01):
    """Size-gated exact-membership closure over an int64 key Dataset — the
    dup-gram regime (queries_web.dup_gram_membership_ds) generalized so any
    n-sized key set (exact-dedup winners, crawl-diff hashes) can gate the
    same way:

    - ≤ ``broadcast_max`` keys: ONE sorted-u64 array broadcast via
      ``ray.put``; probes are a vectorized ``searchsorted`` per batch.
    - above: the keys never land on the driver — a distributed bloom
      (per-block partials OR-merged streaming, functions/bloom) prunes each
      probe batch to the ~fp_rate survivors, which are exactly verified
      against a ``BucketedBuildSide.from_dataset`` (driver holds refs only).

    Returns ``membership(np.ndarray[int64]) -> np.ndarray[bool]``, safe to
    call inside ``map_batches`` workers. ``keys_ds`` is consumed (counted +
    either collected-under-gate or bucketed); pass a materialized dataset if
    it will be reused. Keys must be unique for the build side; duplicates
    merely waste space."""
    from .bloom import bloom_contains, bloom_from_dataset, bloom_params

    keys_ds = keys_ds.materialize()
    n_keys = keys_ds.count()
    if n_keys == 0:
        def membership(vals: np.ndarray) -> np.ndarray:
            return np.zeros(len(vals), dtype=bool)
        return membership

    if n_keys <= broadcast_max:
        t = pa.Table.from_pandas(keys_ds.to_pandas(), preserve_index=False)
        sorted_ref = ray.put(np.sort(t.column(key_col).to_numpy(
            zero_copy_only=False).astype(np.int64)))

        def membership(vals: np.ndarray) -> np.ndarray:
            arr = ray.get(sorted_ref)
            if len(vals) == 0:
                return np.zeros(0, dtype=bool)
            idx = np.searchsorted(arr, vals)
            idx[idx >= len(arr)] = len(arr) - 1
            return arr[idx] == vals
        return membership

    # scale regime: ~250k keys/bucket (a few MB per worker fetch), floor 8
    n_buckets = int(max(8, min(1024, n_keys // 250_000 + 8)))
    side = BucketedBuildSide.from_dataset(
        keys_ds, key_col, n_buckets,
        schema=pa.schema([(key_col, pa.int64())]))
    refs = side.refs
    m_bits, k = bloom_params(n_keys, fp_rate)
    bits_ref = ray.put(bloom_from_dataset(keys_ds, key_col, m_bits, k))

    def membership(vals: np.ndarray) -> np.ndarray:
        member = np.zeros(len(vals), dtype=bool)
        if len(vals) == 0:
            return member
        bits = ray.get(bits_ref)
        cand = bloom_contains(bits, pa.array(vals, pa.int64()), m_bits, k)
        if cand.any():
            member[np.flatnonzero(cand)] = probe_membership(
                pa.array(vals[cand], pa.int64()), refs, key_col, n_buckets)
        return member
    return membership


@ray.remote
def _agg_reduce_bucket(key_cols, aggs, min_total, schema,
                       *pieces: pa.Table) -> pa.Table:
    """Reduce one hash bucket: fold the per-block pieces in slabs of 64 so
    peak memory is bounded by slab x piece size plus the (shrinking)
    accumulator, not the whole bucket's raw rows (sum/min/max are all
    associative, so folding partial aggregates is exact). ``aggs`` is a
    list of (value_col, agg_name); ``min_total`` filters on the FIRST
    aggregate column."""
    acc = schema.empty_table()
    val_cols = [c for c, _ in aggs]
    for i in range(0, len(pieces), 64):
        slab = [acc] + [p for p in pieces[i:i + 64] if p.num_rows > 0]
        t = pa.concat_tables(slab)
        acc = t.group_by(list(key_cols)).aggregate(list(aggs)) \
            .select(list(key_cols) + [f"{c}_{a}" for c, a in aggs]) \
            .rename_columns(list(key_cols) + val_cols)
    if min_total is not None:
        acc = acc.filter(pc.greater_equal(acc.column(val_cols[0]),
                                          pa.scalar(min_total)))
    # strip schema metadata: pandas-origin metadata dicts make Ray's
    # schema-dedup hash fail noisily when these blocks re-enter a Dataset
    return acc.combine_chunks().replace_schema_metadata(None)


def hash_groupby_multi(ds, key_cols, aggs, *,
                       min_total=None, n_buckets: Optional[int] = None):
    """Multi-aggregate form of ``hash_groupby_agg``: ``aggs`` is a list of
    (value_col, agg_name) pairs, each an associative pyarrow aggregate
    ("sum"/"min"/"max"); output columns keep the value-column names.
    ``min_total`` filters on the first aggregate's result."""
    import ray.data as rd

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)
    aggs = [tuple(a) for a in aggs]
    val_cols = [c for c, _ in aggs]
    ds = ds.select_columns(key_cols + val_cols).materialize()
    sch = ds.schema()
    if sch is None:
        # a fully-empty dataset can lose its schema through select/
        # materialize; with nothing to aggregate, an empty dataset is the
        # exact answer (callers needing typed emptiness should guard on
        # count() first)
        import ray.data as rd
        return rd.from_items([])
    base = sch.base_schema
    schema = pa.schema([(c, base.field(c).type) for c in key_cols]
                       + [(c, base.field(c).type) for c in val_cols])
    n_rows = ds.count()
    if n_buckets is None:
        n_buckets = int(max(8, min(4096, n_rows // 250_000 + 8)))
    block_refs = ds.to_arrow_refs()
    if not block_refs or n_rows == 0:
        return rd.from_arrow(schema.empty_table())
    outs = []
    for r in block_refs:
        out = _split_block_by_composite.options(
            num_returns=n_buckets).remote(r, key_cols, n_buckets, schema)
        outs.append([out] if n_buckets == 1 else out)
    refs = [_agg_reduce_bucket.remote(key_cols, aggs, min_total,
                                      schema, *[o[b] for o in outs])
            for b in range(n_buckets)]
    return rd.from_arrow_refs(refs)


def hash_groupby_agg(ds, key_cols, n_col: str, *, agg: str = "sum",
                     min_total=None, n_buckets: Optional[int] = None):
    """Distributed groupby-aggregate via an explicit two-level hash
    shuffle: each block splits into ``n_buckets`` hash partitions (map
    side), one task per bucket folds its pieces with pyarrow ``group_by``
    (reduce side). ``agg`` is any associative pyarrow aggregate ("sum",
    "min", "max"); ``key_cols`` a column name or list of them. Returns a
    Dataset(*key_cols, n_col), optionally filtered to ``n_col >=
    min_total``.

    Why not ``ds.groupby(key).sum()``: Ray 2.49's sort-based aggregate
    measures ~100k rows/s on int64 keys (50 s for a 5.5M-row gram stream
    at 16 CPUs); this hash reduce does the same job in ~1 s — sorting is
    wasted work when the output only needs grouping, not order. The same
    two-level shape a multi-node tree-reduce needs: map-side pieces move
    once, each reduce bucket fits a worker heap (``n_buckets`` defaults to
    ~250k rows/bucket, clamped to [8, 4096] — size it so
    rows/n_buckets stays heap-friendly at your scale).

    ``ds`` is materialized (the map side needs its block refs) — same
    contract as ``BucketedBuildSide.from_dataset``. Deterministic output
    content; row order within blocks is not."""
    return hash_groupby_multi(ds, key_cols, [(n_col, agg)],
                              min_total=min_total, n_buckets=n_buckets)


def hash_groupby_sum(ds, key_col, n_col: str, *,
                     min_total=None, n_buckets: Optional[int] = None):
    """groupby-sum specialization of ``hash_groupby_agg``."""
    return hash_groupby_agg(ds, key_col, n_col, agg="sum",
                            min_total=min_total, n_buckets=n_buckets)


def _composite_hash(tbl: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """One u64 per row over multiple key columns (order-sensitive mix)."""
    h = key_hash_u64(tbl.column(key_cols[0]))
    for c in key_cols[1:]:
        with np.errstate(over="ignore"):
            h = (h * _KNUTH) ^ key_hash_u64(tbl.column(c))
    return h


@ray.remote
def _split_block_by_composite(tbl: pa.Table, key_cols, n_buckets: int,
                              schema: pa.Schema):
    if tbl.num_rows == 0:
        empty = schema.empty_table()
        return empty if n_buckets == 1 else tuple([empty] * n_buckets)
    buckets = (_composite_hash(tbl, key_cols)
               % np.uint64(n_buckets)).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(buckets, minlength=n_buckets)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    out = tuple(sorted_tbl.slice(int(offsets[b]), int(counts[b]))
                for b in range(n_buckets))
    return out[0] if n_buckets == 1 else out


@ray.remote
def _apply_groups_bucket(key_cols, fn, schema, *pieces: pa.Table):
    """Process every group that hashed to this bucket: ONE sort + zero-copy
    group slices + a Python fn call per group (micro-groups pay a function
    call, not a Ray task or a distributed-sort share)."""
    live = [p for p in pieces if p.num_rows > 0]
    if not live:
        return schema.empty_table() if schema is not None else pa.table({})
    tbl = pa.concat_tables(live)
    tbl = tbl.sort_by([(c, "ascending") for c in key_cols])
    # group boundaries on the sorted composite hash (equal keys adjacent;
    # a hash collision between DIFFERENT adjacent keys would merge two
    # groups - guard with an exact first-row comparison per boundary)
    h = _composite_hash(tbl, key_cols)
    bounds = [0]
    for i in np.flatnonzero(np.diff(h)):
        bounds.append(int(i) + 1)
    # exact boundaries: also split where any key column changes but the
    # hash did not (2^-64 per pair, but exactness is cheap here)
    cols = [tbl.column(c) for c in key_cols]
    extra = set()
    for c in cols:
        v = c.to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(v[1:] != v[:-1]):
            extra.add(int(i) + 1)
    bounds = sorted(set(bounds) | extra)
    bounds.append(tbl.num_rows)
    outs = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        r = fn(tbl.slice(s, e - s))
        if r.num_rows > 0:
            outs.append(r)
    if not outs:
        return schema.empty_table() if schema is not None else pa.table({})
    return pa.concat_tables(outs).combine_chunks() \
        .replace_schema_metadata(None)


def hash_group_apply(ds, key_cols: Sequence[str], fn, *,
                     n_buckets: int = 64,
                     out_schema: Optional[pa.Schema] = None):
    """``ds.groupby(key_cols).map_groups(fn)`` via an explicit two-level
    hash shuffle: blocks split by composite key hash (map side), one task
    per bucket sorts its pieces once and applies ``fn`` to each group
    slice (reduce side). Returns a Dataset of ``fn``'s concatenated
    outputs.

    Why not ``ds.groupby().map_groups()``: Ray 2.49 sorts the whole
    stream (~100k rows/s) and pays per-group overhead in its own group
    iterator — for many micro-groups (LSH buckets, per-key verify) this
    hash reduce is an order of magnitude faster. ``fn`` must be a pure
    per-group pa.Table -> pa.Table function (same contract as
    map_groups with batch_format="pyarrow"). ``out_schema`` types the
    empty result; groups land whole in exactly one bucket. Null keys are
    NOT supported here (the exact group-boundary comparison is
    NaN-poisoned) — filter them first; the aggregate forms
    (``hash_groupby_*``) group nulls together per pyarrow semantics.

    ``ds`` is materialized (the map side needs block refs). Bucket sizing:
    rows/n_buckets must fit a worker heap, same rule as
    ``BucketedBuildSide``."""
    import ray.data as rd

    ds = ds.materialize()
    _sch = ds.schema()
    if _sch is None:
        # fully-empty input that lost its schema: nothing to group
        return (rd.from_arrow(out_schema.empty_table())
                if out_schema is not None else rd.from_items([]))
    in_schema = _sch.base_schema
    if out_schema is None:
        # the right default for row-subset group fns (top-1 per group,
        # latest-wins, greedy keep): fn output schema == input schema
        out_schema = in_schema
    block_refs = ds.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(out_schema.empty_table())
    outs = []
    for r in block_refs:
        out = _split_block_by_composite.options(
            num_returns=n_buckets).remote(r, list(key_cols), n_buckets,
                                          in_schema)
        outs.append([out] if n_buckets == 1 else out)
    refs = [_apply_groups_bucket.remote(list(key_cols), fn, out_schema,
                                        *[o[b] for o in outs])
            for b in range(n_buckets)]
    return rd.from_arrow_refs(refs)


def hash_groupby_table(ds, key_cols, aggs, *, count_col: Optional[str] = None,
                       min_total=None, n_buckets: Optional[int] = None):
    """Combiner + hash reduce: a per-block pyarrow ``group_by`` partial
    (map-side combine — the shuffle moves one row per distinct key per
    block, not one per input row) followed by ``hash_groupby_multi`` on
    the partials. ``aggs``: list of (col, "sum"|"min"|"max"); output
    columns keep the input names. ``count_col`` adds a row count per group
    (partial ``count_all`` + reduce sum) — the Count() analogue.
    ``min_total`` filters on the first agg column (or the count when no
    aggs)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)
    aggs = [tuple(a) for a in aggs]
    val_cols = [c for c, _ in aggs]
    out_cols = list(key_cols) + val_cols + ([count_col] if count_col else [])

    plan = [(c, a) for c, a in aggs]
    if count_col:
        plan.append(([], "count_all"))
    plan_names = [f"{c}_{a}" for c, a in aggs] \
        + (["count_all"] if count_col else [])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(key_cols).aggregate(plan)
        g = g.select(key_cols + plan_names)
        return g.rename_columns(out_cols)

    reduce_aggs = [(c, a if a in ("min", "max") else "sum")
                   for c, a in aggs] \
        + ([(count_col, "sum")] if count_col else [])
    return hash_groupby_multi(ds.map_batches(partial,
                                             batch_format="pyarrow"),
                              key_cols, reduce_aggs,
                              min_total=min_total, n_buckets=n_buckets)

"""Bucketed Parquet storage: pay the all-to-all exchange ONCE at write
time, then every downstream equi-join on the same key reads matching
buckets pairwise with NO shuffle — the Ray-Data-native analogue of Spark's
``bucketBy`` / Hive bucketed tables, and the storage-level form of the
"pick ONE partitioning key and reuse it across stages" scale rule.

Layout: ``out_dir/bucket=<b>/*.parquet`` plus a ``_BUCKETS.json`` manifest
recording (key column, n_buckets, hash name). The bucket id is
``functions/joins.key_hash_u64 % n_buckets`` — the ONE shared key hash
every hash-partitioned structure in this engine uses, so a table written
here is bucket-compatible with the in-memory BucketedBuildSide and the
Bloom filters. Readers validate the manifest instead of trusting the
caller: joining two tables bucketed with different n_buckets or keys is a
silent-wrong-answer class, so it raises.

At cluster scale each bucket-pair join is one independent task reading two
bucket directories from shared storage — n_buckets-way parallel, no
repartition, no driver state beyond the bucket id list.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.joins import key_hash_u64

_MANIFEST = "_BUCKETS.json"
_HASH_NAME = "key_hash_u64.v1"


def write_bucketed(ds: "rd.Dataset", out_dir: str, key: str,
                   n_buckets: int = 32) -> str:
    """Write ``ds`` as bucket-partitioned parquet. One streaming pass: each
    block tags its rows with the bucket id; the partitioned writer routes
    rows into ``bucket=<b>/`` directories. Returns ``out_dir``."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    os.makedirs(out_dir, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        if "bucket" in t.column_names:
            raise ValueError(
                "input already has a 'bucket' column — it is this layout's "
                "reserved partition column (rename yours before writing)")
        b = (key_hash_u64(t.column(key)) % np.uint64(n_buckets)).astype(
            np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets,
                   "hash": _HASH_NAME}, f)
    return out_dir


def read_bucket_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)


def _bucket_files(root: str, b: int) -> list[str]:
    return sorted(glob.glob(os.path.join(root, f"bucket={b}", "*.parquet")))


def bucketed_equi_join(left_dir: str, right_dir: str, *,
                       left_cols: Optional[Sequence[str]] = None,
                       right_cols: Optional[Sequence[str]] = None,
                       join_type: str = "inner") -> "rd.Dataset":
    """Join two bucket-compatible tables with NO shuffle: one task per
    bucket reads ``left/bucket=b`` + ``right/bucket=b`` and hash-joins them
    in memory (pyarrow join). Keys hash identically on both sides by the
    manifest contract, so every match lives in the same bucket pair.

    The bucket is the memory unit: size n_buckets at write time so one
    bucket pair fits a worker heap (same sizing rule as
    BucketedBuildSide).

    All four equi-join types are supported; outer sides that are missing a
    bucket synthesize a typed empty table from the stored schema so
    unmatched rows null-extend instead of disappearing. Key columns
    coalesce per pyarrow semantics (``coalesce_keys`` default): the output
    carries ONE key column — named after the left key even when
    ``lkey``/``rkey`` names differ — populated from whichever side
    matched, so outer rows never carry a null key.
    """
    if join_type not in ("inner", "left outer", "right outer", "full outer"):
        raise ValueError(f"join_type {join_type!r} unsupported: use 'inner', "
                         f"'left outer', 'right outer' or 'full outer'")
    lm, rm = read_bucket_manifest(left_dir), read_bucket_manifest(right_dir)
    for side, m in (("left", lm), ("right", rm)):
        if m["hash"] != _HASH_NAME:
            raise ValueError(f"{side} table bucketed with hash {m['hash']!r},"
                             f" reader expects {_HASH_NAME!r}")
    if lm["n_buckets"] != rm["n_buckets"]:
        raise ValueError(
            f"bucket count mismatch: left={lm['n_buckets']} "
            f"right={rm['n_buckets']} — co-located join would be WRONG; "
            f"rewrite one side with matching n_buckets")
    n = lm["n_buckets"]
    lkey, rkey = lm["key"], rm["key"]

    def _read(files, cols):
        if not files:
            return None
        t = pq.read_table(files, columns=cols)
        # the hive partition column re-materializes on read (dictionary-
        # typed); it is storage layout, not data — and left/right would
        # collide on the name after the join
        if "bucket" in t.column_names:
            t = t.drop_columns(["bucket"])
        return t

    # which empty side kills the bucket vs null-extends the other side
    keeps_left = join_type in ("left outer", "full outer")
    keeps_right = join_type in ("right outer", "full outer")

    def join_bucket(t: pa.Table) -> pa.Table:
        empty_cache: dict[str, pa.Table] = {}

        def empty_side(root: str, cols, have) -> pa.Table:
            if have is not None:
                return have  # a typed 0-row table was already read
            if root not in empty_cache:
                e = pq.read_schema(
                    _bucket_files(root, _any_bucket(root))[0]).empty_table()
                if "bucket" in e.column_names:
                    e = e.drop_columns(["bucket"])
                empty_cache[root] = e.select(list(cols)) if cols else e
            return empty_cache[root]

        out = []
        for b in t.column("b").to_pylist():
            lf, rf = _bucket_files(left_dir, b), _bucket_files(right_dir, b)
            left = _read(lf, left_cols)
            right = _read(rf, right_cols)
            l_empty = left is None or left.num_rows == 0
            r_empty = right is None or right.num_rows == 0
            if (l_empty and not keeps_right) or (r_empty and not keeps_left) \
                    or (l_empty and r_empty):
                continue
            if l_empty:
                left = empty_side(left_dir, left_cols, left)
            if r_empty:
                right = empty_side(right_dir, right_cols, right)
            out.append(left.join(right, keys=lkey, right_keys=rkey,
                                 join_type=join_type))
        if not out:
            # typed 0-row table in the JOINED schema (left + right value
            # columns), never the zero-column pa.table({}) — a downstream
            # map_batches touching columns on an all-skipped batch would
            # otherwise hit the known empty-zero-column-block hazard
            return empty_side(left_dir, left_cols, None).join(
                empty_side(right_dir, right_cols, None), keys=lkey,
                right_keys=rkey, join_type=join_type)
        return pa.concat_tables(out, promote_options="default")

    ids = pa.table({"b": pa.array(list(range(n)), pa.int64())})
    return rd.from_arrow(ids).repartition(n) \
        .map_batches(join_bucket, batch_format="pyarrow")


def _any_bucket(root: str) -> int:
    for d in sorted(os.listdir(root)):
        if d.startswith("bucket="):
            return int(d.split("=", 1)[1])
    raise ValueError(
        f"{root} has a bucket manifest but no data files (empty table) — "
        f"the outer join cannot infer its value-column types; use an inner "
        f"join or write the empty side with at least its schema")

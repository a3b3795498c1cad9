"""Round-3 registry extension #5: scale-utility operators — bloom-pruned
semi-join (the probe-side row cut for joins whose build side outgrows a
broadcast set), per-domain quota sampling (bounded docs per source), and
group-preserving train/val/test split assignment.

Same conventions as the other extension modules: column names shared with
the oracle, per-batch work vectorized unless oracle parity forces a per-row
hash (documented where so), only broadcast small sides / bounded partials /
final results reach the driver. All three are ANSI-SQL-expressible.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import ray
import ray.data as rd

from .functions.bloom import (bloom_contains, bloom_from_dataset,
                              bloom_params)
from .functions.joins import (bucketed_join, hash_group_apply,
                              hash_groupby_multi)
from .queries_curation import _roundf


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# bloom-pruned semi-join: orders of customers with acctbal > threshold.
# The build side (matching custkeys) is compiled DISTRIBUTED into a Bloom
# filter — per-block partial filters OR-merged on the driver (the same
# associative merge a multi-node tree-reduce uses), broadcast once via
# ray.put. The probe stream drops ~all non-member rows per batch BEFORE any
# join machinery runs; the ~fp_rate survivors that are noise are removed by
# an exact bucketed map-side verify. Neither side ever shuffles; the driver
# holds the bloom bytes (~10 bits/key) and the narrow build keys (mid-size
# regime, see functions/joins.py).
# ---------------------------------------------------------------------------

BLOOM_BAL_THRESHOLD = 5000.0
BLOOM_FP_RATE = 0.01


def q_orders_bloom_semi_join(sf_dir: str) -> pa.Table:
    cust_path = _p(sf_dir, "customer")
    n_cust = pq.read_metadata(cust_path).num_rows  # capacity bound
    m_bits, k = bloom_params(n_cust, BLOOM_FP_RATE)

    keep = rd.read_parquet(cust_path, columns=["c_custkey", "c_acctbal"]) \
        .map_batches(lambda t: t.filter(
            pc.greater(t["c_acctbal"], BLOOM_BAL_THRESHOLD)),
            batch_format="pyarrow") \
        .select_columns(["c_custkey"]).materialize()

    build_keys = pa.Table.from_pandas(keep.to_pandas(), preserve_index=False)
    # empty build side (no customer clears the threshold): the semi-join
    # result is empty by definition — return it typed
    if build_keys.num_rows == 0:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "n_orders": pa.array([], pa.int64()),
                         "total_price": pa.array([], pa.float32())})
    bloom_ref = ray.put(bloom_from_dataset(keep, "c_custkey", m_bits, k))

    def prune(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        return t.filter(pa.array(
            bloom_contains(bits, t.column("o_custkey"), m_bits, k)))

    candidates = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_custkey", "o_orderpriority", "o_totalprice"]) \
        .map_batches(prune, batch_format="pyarrow")
    verified = bucketed_join(candidates, build_keys, probe_key="o_custkey",
                             build_key="c_custkey", value_cols=[],
                             join_type="inner")

    def agg_partial(t: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            t.column("o_orderpriority").to_numpy(zero_copy_only=False))
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderpriority": pa.array(uniq),
            "n_orders": pa.array(np.bincount(codes, minlength=len(uniq))
                                 .astype(np.int64)),
            "total_price": pa.array(np.bincount(codes, weights=price,
                                                minlength=len(uniq)))})

    agg = hash_groupby_multi(
        verified.map_batches(agg_partial, batch_format="pyarrow"),
        "o_orderpriority", [("n_orders", "sum"), ("total_price", "sum")])
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    t = _roundf(t, ["total_price"], 2)
    return t.sort_by([("o_orderpriority", "ascending")])


SQL_ORDERS_BLOOM_SEMI_JOIN = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(round(sum(o_totalprice), 2) AS REAL) AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# per-domain quota sampling: keep at most QUOTA_K docs per source, ranked by
# a deterministic hash so the sample is reproducible and unbiased by input
# order. Combiner-before-shuffle: each batch keeps its own top-K per source,
# so the wide stage moves <= K * |sources| * n_blocks rows, never the
# corpus. md5-per-row (not a vectorized numpy hash) is deliberate: the
# oracle must reproduce the ranking in SQL, and md5 is the hash both
# engines share (same trade as queries_ext.q_stratified_sample).
# ---------------------------------------------------------------------------

QUOTA_K = 5


def _quota_topk(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["source", "rank_key", "doc_id"], kind="stable")
    return df.groupby("source", sort=False).head(QUOTA_K)


def q_domain_quota_sample(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rank_key=[
            hashlib.md5(str(i).encode()).hexdigest() for i in df.doc_id])
        return _quota_topk(df)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = _quota_topk(df)
        df = df.assign(rk=np.arange(1, len(df) + 1, dtype=np.int64))
        return df[["source", "rk", "doc_id"]]

    def final_arrow(g: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(final(g.to_pandas()),
                                    preserve_index=False)

    out = hash_group_apply(
        ds.map_batches(partial, batch_format="pandas"), ["source"],
        final_arrow,
        out_schema=pa.schema([("source", pa.string()), ("rk", pa.int64()),
                              ("doc_id", pa.int64())]))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("source", "ascending"), ("rk", "ascending")])


SQL_DOMAIN_QUOTA_SAMPLE = """
SELECT source, rk, doc_id FROM (
    SELECT source, doc_id,
           row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents)
WHERE rk <= 5 ORDER BY source, rk
"""


# ---------------------------------------------------------------------------
# group-preserving train/val/test split: the split key is a hash of the
# SOURCE, not the doc, so an entire domain lands in exactly one split (no
# domain-level leakage between train and eval). Per-batch assignment hashes
# only the batch's UNIQUE sources (via factorize); the wide stage moves the
# (split, source)-sized partial counts, never rows.
# ---------------------------------------------------------------------------

_VAL_DIGITS = frozenset("cd")      # 2/16 of sources
_TEST_DIGITS = frozenset("ef")     # 2/16 of sources


def _split_of(source: str) -> str:
    d = hashlib.md5(source.encode()).hexdigest()[0]
    return "val" if d in _VAL_DIGITS else ("test" if d in _TEST_DIGITS
                                           else "train")


def q_split_assignment(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["source"])

    def partial(t: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            t.column("source").to_numpy(zero_copy_only=False))
        splits = [_split_of(s) for s in uniq]
        return pa.table({
            "split": pa.array(splits),
            "source": pa.array(uniq),
            "n": pa.array(np.bincount(codes, minlength=len(uniq))
                          .astype(np.int64))})

    per_source = hash_groupby_multi(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["split", "source"], [("n", "sum")])
    small = per_source.to_pandas()  # |sources| rows
    out = small.groupby("split", sort=True).agg(
        n_docs=("n", "sum"), n_sources=("source", "nunique")).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_SPLIT_ASSIGNMENT = """
WITH s AS (SELECT source,
                  CASE WHEN substr(md5(source), 1, 1) IN ('c', 'd')
                           THEN 'val'
                       WHEN substr(md5(source), 1, 1) IN ('e', 'f')
                           THEN 'test'
                       ELSE 'train' END AS split
           FROM documents)
SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources
FROM s GROUP BY split ORDER BY split
"""


# ---------------------------------------------------------------------------
# incremental crawl-diff dedup: keep only NEW-crawl docs whose content was
# never seen in the PREVIOUS crawl (doc_id % 3 == 0 stands in for the old
# corpus) — the don't-reprocess-what-you-already-have shape every
# recurring-crawl pipeline runs. Anti-join twist on the bloom pattern:
# bloom-NEGATIVE rows are DEFINITELY unseen and pass with zero further
# work (the overwhelming majority of a fresh crawl); bloom-POSITIVE rows
# (~old-overlap + fp_rate noise) get an exact verify against the old
# corpus's hash dataset bucketed via BucketedBuildSide.from_dataset, so a
# false positive can never wrongly DROP a new document. Content equality
# is md5 on BOTH engines — zero hash-vs-string divergence.
# ---------------------------------------------------------------------------

DIFF_OLD_MOD = 3


def q_incremental_dedup(sf_dir: str) -> pa.Table:
    from .functions.dedup import md5_hex_batch
    from .functions.joins import BucketedBuildSide, probe_membership

    path = _p(sf_dir, "documents")

    def old_hashes(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % DIFF_OLD_MOD == 0))
        return pa.table(
            {"h": md5_hex_batch(sub, out_col="h").column("h")})

    old = rd.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(old_hashes, batch_format="pyarrow").materialize()
    n_old = old.count()
    m_bits, k = bloom_params(max(1, n_old), BLOOM_FP_RATE)
    bits_ref = ray.put(bloom_from_dataset(old, "h", m_bits, k))
    n_buckets = max(8, n_old // 250_000 + 8)
    side = BucketedBuildSide.from_dataset(
        old, "h", n_buckets, schema=pa.schema([("h", pa.string())]))
    refs = side.refs

    def keep_new(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % DIFF_OLD_MOD != 0))
        h = md5_hex_batch(t, out_col="__h").column("__h").combine_chunks()
        maybe = bloom_contains(bits, h, m_bits, k)
        seen = np.zeros(len(t), dtype=bool)
        if maybe.any():  # exact verify ONLY the bloom-positive survivors
            cand_idx = np.flatnonzero(maybe)
            seen[cand_idx] = probe_membership(h.take(pa.array(cand_idx)),
                                              refs, "h", n_buckets)
        out = t.filter(pa.array(~seen))
        return pa.table({"doc_id": out["doc_id"],
                         "n_chars": out["n_chars"]})

    out = rd.read_parquet(path, columns=["doc_id", "text", "n_chars"]) \
        .map_batches(keep_new, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


SQL_INCREMENTAL_DEDUP = f"""
SELECT doc_id, n_chars FROM documents
WHERE doc_id % {DIFF_OLD_MOD} <> 0
  -- coalesce mirrors md5_hex_batch's null-text-hashes-as-'' rule: a NULL
  -- text must not poison NOT IN (md5(NULL)=NULL drops every row) nor
  -- diverge from the engine's hash
  AND md5(coalesce(text, '')) NOT IN (
        SELECT md5(coalesce(text, '')) FROM documents
        WHERE doc_id % {DIFF_OLD_MOD} = 0)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bucketed STORAGE join: both sides are written bucket-partitioned by the
# shared key hash (sources/bucketed.py), then the join reads matching
# bucket pairs with NO shuffle — the exchange was paid once at write time
# and amortizes over every later join on the same key (Spark bucketBy
# analogue). One task per bucket; the bucket is the memory unit.
# ---------------------------------------------------------------------------

BUCKETED_JOIN_BUCKETS = 16


def q_bucketed_storage_join(sf_dir: str) -> pa.Table:
    import shutil
    import tempfile

    from .sources.bucketed import bucketed_equi_join, write_bucketed

    # single-node fixture plumbing: this sandbox has no shared FS, so the
    # bucketed tables land in node-local /tmp. On a real cluster the
    # write_bucketed target is shared storage (that IS the point of paying
    # the exchange at write time); sources/bucketed.py itself is
    # path-agnostic.
    tmp = tempfile.mkdtemp(prefix="bucketed_join_")
    try:
        write_bucketed(
            rd.read_parquet(_p(sf_dir, "orders"),
                            columns=["o_custkey", "o_totalprice"]),
            os.path.join(tmp, "orders"), "o_custkey",
            BUCKETED_JOIN_BUCKETS)
        write_bucketed(
            rd.read_parquet(_p(sf_dir, "customer"),
                            columns=["c_custkey", "c_mktsegment"]),
            os.path.join(tmp, "customer"), "c_custkey",
            BUCKETED_JOIN_BUCKETS)
        joined = bucketed_equi_join(os.path.join(tmp, "orders"),
                                    os.path.join(tmp, "customer"),
                                    join_type="inner")

        def agg_partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # an all-empty bucket pair emits no schema
                return pa.table({
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "total_price": pa.array([], pa.float64())})
            codes, uniq = pd.factorize(
                t.column("c_mktsegment").to_numpy(zero_copy_only=False))
            price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table({
                "c_mktsegment": pa.array(uniq, pa.string()),
                "n_orders": pa.array(
                    np.bincount(codes, minlength=len(uniq)).astype(np.int64)),
                "total_price": pa.array(
                    np.bincount(codes, weights=price, minlength=len(uniq)))})

        agg = hash_groupby_multi(
            joined.map_batches(agg_partial, batch_format="pyarrow"),
            "c_mktsegment", [("n_orders", "sum"), ("total_price", "sum")])
        t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    t = _roundf(t, ["total_price"], 2)
    return t.sort_by([("c_mktsegment", "ascending")])


SQL_BUCKETED_STORAGE_JOIN = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(round(sum(o_totalprice), 2) AS REAL) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# FULL OUTER storage join: two per-custkey aggregates of the orders table
# (count of 'F' orders vs count of 'O' orders) are written bucketed by the
# same key, then joined full-outer through the storage layout — both join
# directions are genuinely exercised (customers holding only fulfilled or
# only open orders null-extend from opposite sides; verified nonempty at
# every test scale). The shuffle story is the same as the inner form: the
# exchange is paid once at write time, the join itself is one independent
# task per bucket pair, and the outer semantics come from the typed
# empty-side synthesis in sources/bucketed.py rather than any broadcast.
# ---------------------------------------------------------------------------


def q_storage_full_outer_join(sf_dir: str) -> pa.Table:
    import shutil
    import tempfile

    from .sources.bucketed import bucketed_equi_join, write_bucketed
    from .queries_curation import guard_empty

    def status_counts(status: str, out_col: str) -> rd.Dataset:
        schema = pa.schema([("custkey", pa.int64()), (out_col, pa.int64())])

        def partial(t: pa.Table) -> pa.Table:
            tt = t.filter(pc.equal(t["o_orderstatus"], status))
            if tt.num_rows == 0:
                return schema.empty_table()
            codes, uniq = pd.factorize(
                tt.column("o_custkey").to_numpy(zero_copy_only=False))
            return pa.table({
                "custkey": pa.array(uniq, pa.int64()),
                out_col: pa.array(np.bincount(
                    codes, minlength=len(uniq)).astype(np.int64))})

        agg = hash_groupby_multi(
            rd.read_parquet(_p(sf_dir, "orders"),
                            columns=["o_custkey", "o_orderstatus"])
            .map_batches(partial, batch_format="pyarrow"),
            "custkey", [(out_col, "sum")])
        # sort-shuffle aggregates can emit zero-column empty blocks, which
        # write_bucketed's key tagging cannot type — normalize them first
        return agg.map_batches(guard_empty(schema)(lambda t: t),
                               batch_format="pyarrow")

    tmp = tempfile.mkdtemp(prefix="storage_outer_")
    try:
        write_bucketed(status_counts("F", "n_f"), os.path.join(tmp, "f"),
                       "custkey", BUCKETED_JOIN_BUCKETS)
        write_bucketed(status_counts("O", "n_o"), os.path.join(tmp, "o"),
                       "custkey", BUCKETED_JOIN_BUCKETS)
        joined = bucketed_equi_join(os.path.join(tmp, "f"),
                                    os.path.join(tmp, "o"),
                                    join_type="full outer")
        df = joined.to_pandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    for c in ("n_f", "n_o"):  # unmatched sides null-extend; oracle coalesces
        df[c] = df[c].fillna(0).astype(np.int64)
    t = pa.Table.from_pandas(df, preserve_index=False)
    return t.select(["custkey", "n_f", "n_o"]) \
        .sort_by([("custkey", "ascending")])


SQL_STORAGE_FULL_OUTER_JOIN = """
SELECT custkey, coalesce(n_f, 0) AS n_f, coalesce(n_o, 0) AS n_o
FROM (SELECT o_custkey AS custkey, count(*) AS n_f FROM orders
      WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
FULL JOIN (SELECT o_custkey AS custkey, count(*) AS n_o FROM orders
      WHERE o_orderstatus = 'O' GROUP BY o_custkey) o
USING (custkey)
ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# registry fragments merged by queries.py
# ---------------------------------------------------------------------------

SCL_QUERIES: dict[str, Callable[[str], Any]] = {
    "orders_bloom_semi_join": q_orders_bloom_semi_join,
    "domain_quota_sample": q_domain_quota_sample,
    "split_assignment": q_split_assignment,
    "bucketed_storage_join": q_bucketed_storage_join,
    "storage_full_outer_join": q_storage_full_outer_join,
    "incremental_dedup": q_incremental_dedup,
}

SCL_ORACLES: dict[str, str] = {
    "orders_bloom_semi_join": SQL_ORDERS_BLOOM_SEMI_JOIN,
    "domain_quota_sample": SQL_DOMAIN_QUOTA_SAMPLE,
    "split_assignment": SQL_SPLIT_ASSIGNMENT,
    "bucketed_storage_join": SQL_BUCKETED_STORAGE_JOIN,
    "storage_full_outer_join": SQL_STORAGE_FULL_OUTER_JOIN,
    "incremental_dedup": SQL_INCREMENTAL_DEDUP,
}

"""Round-3 registry extension #3: normalization, grouped top-k, sketch-with-
exact-verify heavy hitters, and inverted-index construction.

Same conventions as ``queries_ext.py`` / ``queries_curation.py``: column
names shared with the oracle, float outputs rounded+narrowed, per-batch work
vectorized, the only driver materializations are broadcast small sides,
bounded partials, and final results. All four operators here are
ANSI-SQL-expressible, so every one carries a DuckDB oracle (no goldens).
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from .functions.joins import (hash_group_apply, hash_groupby_agg,
                              hash_groupby_multi)

from .queries_curation import (_flatten_tokens, _roundf, _splitmix64,
                               guard_empty)


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# per-group z-score normalization: the feature-standardization shape. Two
# streaming passes: (1) per-batch moment partials (n, sum, sumsq) per
# event_type -> |types|-sized groupby -> driver computes mean/std and
# broadcasts the tiny lookup; (2) row-for-row transform, no shuffle. The
# wide stage only ever moves O(types x batches) rows.
# ---------------------------------------------------------------------------

def q_zscore_events(sf_dir: str) -> pa.Table:
    path = _p(sf_dir, "events")

    def moments(t: pa.Table) -> pa.Table:
        et_codes, et_uniques = pd.factorize(
            t.column("event_type").to_numpy(zero_copy_only=False))
        v = t.column("value").to_numpy(zero_copy_only=False)
        n = np.bincount(et_codes, minlength=len(et_uniques))
        s = np.bincount(et_codes, weights=v, minlength=len(et_uniques))
        ss = np.bincount(et_codes, weights=v * v, minlength=len(et_uniques))
        return pa.table({"event_type": pa.array(et_uniques, pa.string()),
                         "n": pa.array(n.astype(np.int64)),
                         "s": pa.array(s, pa.float64()),
                         "ss": pa.array(ss, pa.float64())})

    agg = hash_groupby_multi(
        rd.read_parquet(path, columns=["event_type", "value"])
        .map_batches(moments, batch_format="pyarrow"),
        "event_type", [("n", "sum"), ("s", "sum"), ("ss", "sum")])
    stats = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    mean = {}
    std = {}
    for et, n, s, ss in zip(stats.column("event_type").to_pylist(),
                            stats.column("n").to_pylist(),
                            stats.column("s").to_pylist(),
                            stats.column("ss").to_pylist()):
        m = s / n
        mean[et] = m
        std[et] = math.sqrt(max(ss / n - m * m, 0.0))
    stats_ref = ray.put((mean, std))

    def zscore(t: pa.Table) -> pa.Table:
        means, stds = ray.get(stats_ref)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(et)
        m = np.array([means[u] for u in uniq])[codes]
        sd = np.array([stds[u] or 1.0 for u in uniq])[codes]
        z = (t.column("value").to_numpy(zero_copy_only=False) - m) / sd
        out = pa.table({"event_id": t["event_id"], "event_type": t["event_type"],
                        "value": t["value"], "zscore": pa.array(z)})
        return _roundf(out, ["zscore"])

    out = rd.read_parquet(path, columns=["event_id", "event_type", "value"]) \
        .map_batches(zscore, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("event_id", "ascending")])


SQL_ZSCORE_EVENTS = """
WITH s AS (SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
           FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       -- COALESCE(NULLIF(sd,0),1) mirrors the Ray side's std-0 fallback
       -- (a constant-valued group z-scores to 0, not NULL/inf)
       CAST(ROUND((e.value - s.m) / COALESCE(NULLIF(s.sd, 0), 1), 4)
            AS REAL) AS zscore
FROM events e JOIN s USING (event_type) ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# grouped top-k (k=3) with a combiner: per-batch partial top-3-per-user
# BEFORE the shuffle, so the wide stage moves <= 3 x |users-per-batch| rows
# instead of every event (the general-k form of top_event_per_user's top-1
# combiner). Final per-group selection re-applies the same vectorized
# rank-under-run trick; ties broken by event_id ascending, matching the SQL
# row_number() ordering exactly.
# ---------------------------------------------------------------------------

TOPK_PER_USER = 3


def _topk_rows(user: np.ndarray, value: np.ndarray, eid: np.ndarray,
               k: int) -> np.ndarray:
    """Indices of the top-k rows per user by (value DESC, event_id ASC)."""
    order = np.lexsort((eid, -value, user))
    u_sorted = user[order]
    is_start = np.empty(len(order), dtype=bool)
    if len(order):
        is_start[0] = True
        is_start[1:] = u_sorted[1:] != u_sorted[:-1]
    run_start = np.maximum.accumulate(np.where(is_start,
                                               np.arange(len(order)), 0))
    rank = np.arange(len(order)) - run_start
    return order[rank < k]


def q_top3_events_per_user(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        value = t.column("value").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.take(pa.array(_topk_rows(user, value, eid, TOPK_PER_USER)))

    def final(g: pa.Table) -> pa.Table:
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        value = g.column("value").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        keep = _topk_rows(user, value, eid, TOPK_PER_USER)
        # rows come back grouped per user; order keep by (value DESC, id ASC)
        keep = keep[np.lexsort((eid[keep], -value[keep]))]
        out = g.take(pa.array(keep))
        return out.append_column(
            "rnk", pa.array(np.arange(1, len(keep) + 1, dtype=np.int64)))

    out = hash_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["user_id"], final,
        out_schema=pa.schema([("user_id", pa.int64()),
                              ("event_id", pa.int64()),
                              ("value", pa.float64()),
                              ("rnk", pa.int64())]))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = t.sort_by([("user_id", "ascending"), ("rnk", "ascending")])
    return t.select(["user_id", "rnk", "event_id", "value"])


SQL_TOP3_EVENTS_PER_USER = """
SELECT user_id, rk AS rnk, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events) WHERE rk <= 3 ORDER BY user_id, rk
"""


# ---------------------------------------------------------------------------
# heavy hitters: count-min sketch for candidate generation + an exact
# verification pass — output is EXACT (every token with global count >=
# ceil(total/50)) because CMS never underestimates, so the candidate set is
# a guaranteed superset and the second pass counts candidates exactly.
# Pass 1 merges (depth, cell) -> count partials through an associative
# groupby-sum (<= 4 x 4096 + 1 rows reach the driver); pass 2 broadcasts the
# 128 KB sketch and emits only candidate tokens' local counts, so the final
# groupby moves candidate-sized data, never vocabulary-sized. Hash choice is
# free for correctness (only candidate-set size depends on it): pandas
# hash_array remixed per depth via splitmix64.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 4096
HH_DENOM = 50  # heavy hitter = count >= ceil(total_tokens / HH_DENOM)

_CMS_SCHEMA = pa.schema([("d", pa.int64()), ("w", pa.int64()),
                         ("cnt", pa.int64())])


def _cms_indices(tokens: np.ndarray) -> np.ndarray:
    """(CMS_DEPTH, len(tokens)) cell indices, deterministic per token."""
    # categorize=False for cross-batch consistency (the categorize path
    # mis-hashes NUL-containing strings; sketch cells must agree between
    # the build pass and the verify pass regardless of batch contents)
    base = pd.util.hash_array(tokens, categorize=False).astype(np.uint64)
    rows = [(_splitmix64(base + np.uint64(d)) % np.uint64(CMS_WIDTH))
            .astype(np.int64) for d in range(CMS_DEPTH)]
    return np.stack(rows)


def _cms_partial(t: pa.Table) -> pa.Table:
    parent, vals = _flatten_tokens(t)
    if not len(vals):
        return _CMS_SCHEMA.empty_table()
    codes, uniques = pd.factorize(vals)
    counts = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    idx = _cms_indices(uniques)
    cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for d in range(CMS_DEPTH):
        np.add.at(cms[d], idx[d], counts)
    dd, ww = np.nonzero(cms)
    return pa.table({
        "d": pa.array(np.concatenate([dd.astype(np.int64), [-1]])),
        "w": pa.array(np.concatenate([ww.astype(np.int64), [0]])),
        "cnt": pa.array(np.concatenate([cms[dd, ww], [len(vals)]]))})


def q_heavy_hitter_terms(sf_dir: str) -> pa.Table:
    path = _p(sf_dir, "documents")
    merged = hash_groupby_agg(
        rd.read_parquet(path, columns=["text"])
        .map_batches(_cms_partial, batch_format="pyarrow"),
        ["d", "w"], "cnt", agg="sum")
    cells = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    d = cells.column("d").to_numpy()
    w = cells.column("w").to_numpy()
    cnt = cells.column("cnt").to_numpy()
    total = int(cnt[d == -1][0])
    threshold = math.ceil(total / HH_DENOM)
    cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    real = d >= 0
    cms[d[real], w[real]] = cnt[real]
    cms_ref = ray.put((cms, threshold))

    def candidates(t: pa.Table) -> pa.Table:
        sketch, thresh = ray.get(cms_ref)
        parent, vals = _flatten_tokens(t)
        if not len(vals):
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        codes, uniques = pd.factorize(vals)
        counts = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        idx = _cms_indices(uniques)
        est = np.min(np.stack([sketch[dd, idx[dd]]
                               for dd in range(CMS_DEPTH)]), axis=0)
        keep = est >= thresh
        # pin the type: an all-False keep yields a null-typed array that
        # breaks schema unification in the downstream groupby
        return pa.table({"token": pa.array(uniques[keep], pa.string()),
                         "n": pa.array(counts[keep], pa.int64())})

    agg = hash_groupby_agg(
        rd.read_parquet(path, columns=["text"])
        .map_batches(candidates, batch_format="pyarrow"),
        "token", "n", agg="sum")
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    t = t.filter(pc.greater_equal(t["n"], threshold))
    return t.sort_by([("n", "descending"), ("token", "ascending")])


SQL_HEAVY_HITTER_TERMS = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
     tt AS (SELECT count(*) AS n_total FROM toks WHERE tok <> '')
SELECT tok AS token, count(*) AS n
FROM toks, tt WHERE tok <> ''
GROUP BY tok, tt.n_total
HAVING count(*) >= CEIL(tt.n_total / 50.0)
ORDER BY n DESC, token ASC
"""


# ---------------------------------------------------------------------------
# inverted index: token -> (df, comma-joined sorted doc_id postings). The
# per-batch stage collapses the token stream to DISTINCT (token, doc_id)
# pairs (np.unique over factorized pair keys) before the shuffle; the wide
# groupby then moves exactly the index's own size — the floor for this
# operator, since its OUTPUT is the full posting set. Postings are sorted
# numerically and csv-joined inside map_groups, matching the SQL
# string_agg(... ORDER BY doc_id) byte-for-byte. At 100 TB the output is
# written partitioned by token hash range rather than returned.
# ---------------------------------------------------------------------------

def q_inverted_index(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        parent, vals = _flatten_tokens(t)
        if not len(vals):
            return pa.table({"token": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(vals)
        key = parent.astype(np.int64) * len(uniques) + codes
        uniq = np.unique(key)
        return pa.table({
            "token": pa.array(uniques[(uniq % len(uniques)).astype(np.int64)]),
            "doc_id": pa.array(doc_ids[(uniq // len(uniques)).astype(np.int64)],
                               pa.int64())})

    def postings(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy(zero_copy_only=False))
        return pa.table({
            "token": pa.array([g.column("token")[0].as_py()]),
            "df": pa.array([len(ids)], pa.int64()),
            "postings": pa.array([",".join(str(i) for i in ids)])})

    out = hash_group_apply(
        ds.map_batches(pairs, batch_format="pyarrow"), ["token"], postings,
        out_schema=pa.schema([("token", pa.string()), ("df", pa.int64()),
                              ("postings", pa.string())]))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("token", "ascending")])


SQL_INVERTED_INDEX = """
WITH pairs AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '')
SELECT tok AS token, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY tok ORDER BY token
"""


# ---------------------------------------------------------------------------
# distinct-set operations (INTERSECT / EXCEPT / UNION over user key sets —
# SURVEY §2.7 has only dedup-family ops; this adds the set-algebra family).
# Distributed shape: ONE pass of per-batch (user, has_a, has_b) boolean
# partials (factorize + bincount-over-mask — each batch collapses to its
# distinct users), ONE |users|-sized groupby-max, then the three set
# cardinalities are count-aggregates over the combined flags. No user-id
# set ever materializes anywhere; the result is one row.
# ---------------------------------------------------------------------------

SETOP_A = "click"
SETOP_B = "purchase"


def q_user_event_set_ops(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(uid)
        has_a = np.bincount(codes[et == SETOP_A],
                            minlength=len(uniq)) > 0
        has_b = np.bincount(codes[et == SETOP_B],
                            minlength=len(uniq)) > 0
        return pa.table({"user_id": pa.array(uniq, pa.int64()),
                         "has_a": pa.array(has_a.astype(np.int64)),
                         "has_b": pa.array(has_b.astype(np.int64))})

    flags = hash_groupby_multi(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("has_a", "max"), ("has_b", "max")])

    @guard_empty(pa.schema([("n_intersect", pa.int64()),
                            ("n_a_except_b", pa.int64()),
                            ("n_union", pa.int64())]))
    def counts(t: pa.Table) -> pa.Table:
        a = t.column("has_a").to_numpy(zero_copy_only=False) > 0
        b = t.column("has_b").to_numpy(zero_copy_only=False) > 0
        return pa.table({
            "n_intersect": pa.array([int((a & b).sum())], pa.int64()),
            "n_a_except_b": pa.array([int((a & ~b).sum())], pa.int64()),
            "n_union": pa.array([int((a | b).sum())], pa.int64())})

    agg = flags.map_batches(counts, batch_format="pyarrow")
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table({
        "n_intersect": pa.array([int(t.column("n_intersect").to_numpy().sum())],
                                pa.int64()),
        "n_a_except_b": pa.array(
            [int(t.column("n_a_except_b").to_numpy().sum())], pa.int64()),
        "n_union": pa.array([int(t.column("n_union").to_numpy().sum())],
                            pa.int64())})


SQL_USER_EVENT_SET_OPS = f"""
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = '{SETOP_A}'),
     b AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = '{SETOP_B}')
SELECT (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
           AS n_intersect,
       (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
           AS n_a_except_b,
       (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
           AS n_union
"""


# ---------------------------------------------------------------------------
# registry fragments merged by queries.py
# ---------------------------------------------------------------------------

ANA_QUERIES: dict[str, Callable[[str], Any]] = {
    "zscore_events": q_zscore_events,
    "top3_events_per_user": q_top3_events_per_user,
    "heavy_hitter_terms": q_heavy_hitter_terms,
    "inverted_index": q_inverted_index,
    "user_event_set_ops": q_user_event_set_ops,
}

ANA_ORACLES: dict[str, str] = {
    "zscore_events": SQL_ZSCORE_EVENTS,
    "top3_events_per_user": SQL_TOP3_EVENTS_PER_USER,
    "heavy_hitter_terms": SQL_HEAVY_HITTER_TERMS,
    "inverted_index": SQL_INVERTED_INDEX,
    "user_event_set_ops": SQL_USER_EVENT_SET_OPS,
}

"""Round-3 registry extension #4: training-sequence preparation and event-
sequence operators — sliding-window document chunking (the 1->N flat-map
shape), token-budget sequence packing (a genuinely distributed prefix sum),
and funnel-stage analysis (ordered-subsequence matching per user).

Same conventions as the other extension modules: column names shared with
the oracle, per-batch work vectorized where it isn't inherently
output-sized, only broadcast small sides / bounded partials / final results
ever reach the driver. All three operators are ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .queries_curation import _flatten_tokens


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# document chunking: split every document into sliding token windows of
# CHUNK_WINDOW tokens with CHUNK_STRIDE step (trailing partial windows kept)
# — the flat_map 1->N shape every context-window pipeline needs. Token
# offsets are computed vectorized per batch (_flatten_tokens + cumsum); the
# per-chunk string join is inherently output-sized work, so the inner loop
# is the floor, not a smell. No shuffle: chunking is embarrassingly
# parallel and the output streams straight through.
# ---------------------------------------------------------------------------

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


def q_doc_chunks(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        parent, vals = _flatten_tokens(t)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lens = np.bincount(parent, minlength=len(t))
        starts = np.concatenate([[0], np.cumsum(lens)])
        out_doc, out_chunk, out_n, out_text = [], [], [], []
        for i in range(len(t)):
            toks = vals[starts[i]:starts[i + 1]]
            if not len(toks):
                continue
            n_chunks = (len(toks) - 1) // CHUNK_STRIDE + 1
            for c in range(n_chunks):
                piece = toks[c * CHUNK_STRIDE:c * CHUNK_STRIDE + CHUNK_WINDOW]
                out_doc.append(doc_ids[i])
                out_chunk.append(c)
                out_n.append(len(piece))
                out_text.append(" ".join(piece))
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "chunk_id": pa.array(out_chunk, pa.int64()),
                         "n_tokens": pa.array(out_n, pa.int64()),
                         "chunk_text": pa.array(out_text, pa.string())})

    out = ds.map_batches(chunks, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])


SQL_DOC_CHUNKS = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
s AS (SELECT doc_id, t,
             unnest(generate_series(
                 0, CAST(floor((len(t) - 1) / 24.0) AS BIGINT))) AS chunk_id
      FROM toks WHERE len(t) > 0)
SELECT doc_id, chunk_id,
       len(t[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS n_tokens,
       array_to_string(t[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
           AS chunk_text
FROM s ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# sequence packing: assign documents (in doc_id order) to fixed-token-budget
# training sequences — seq_id = floor(running-token-offset / SEQ_BUDGET).
# The running offset is a DISTRIBUTED PREFIX SUM: sort by doc_id (range
# partition), materialize once so both passes see identical blocks, then
# (A) one whole-block pass emits (block-min doc_id, block token total) — a
# B-row table — from which the driver computes per-block exclusive offsets,
# and (B) a second whole-block pass adds the broadcast block offset to the
# in-block exclusive cumsum. No task ever sees more than its own block; the
# driver holds B rows, not N.
# ---------------------------------------------------------------------------

SEQ_BUDGET = 512


def _doc_token_counts(t: pa.Table) -> pa.Table:
    parent, _vals = _flatten_tokens(t)
    n = np.bincount(parent, minlength=len(t)).astype(np.int64)
    return pa.table({"doc_id": t["doc_id"], "n_tokens": pa.array(n)})


def q_sequence_packing(sf_dir: str) -> pa.Table:
    narrow = rd.read_parquet(_p(sf_dir, "documents"),
                             columns=["doc_id", "text"]) \
        .map_batches(_doc_token_counts, batch_format="pyarrow") \
        .sort("doc_id").materialize()

    def block_total(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"min_doc": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table({"min_doc": pa.array([int(ids.min())], pa.int64()),
                         "total": pa.array([int(n.sum())], pa.int64())})

    summaries = narrow.map_batches(block_total, batch_format="pyarrow",
                                   batch_size=None).take_all()
    summaries.sort(key=lambda r: r["min_doc"])
    offsets, acc = {}, 0
    for r in summaries:
        offsets[r["min_doc"]] = acc
        acc += r["total"]
    off_ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "seq_id": pa.array([], pa.int64())})
        offs = ray.get(off_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")  # in-block doc_id order
        prev = np.zeros(len(n), dtype=np.int64)
        prev[order] = offs[int(ids.min())] + \
            np.concatenate([[0], np.cumsum(n[order])[:-1]])
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
                         "seq_id": pa.array(prev // SEQ_BUDGET)})

    out = narrow.map_batches(assign, batch_format="pyarrow", batch_size=None)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


SQL_SEQUENCE_PACKING = """
WITH c AS (SELECT doc_id,
                  len(list_filter(string_split(text, ' '), x -> x <> ''))
                      AS n_tokens
           FROM documents),
r AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM c)
SELECT doc_id, n_tokens,
       CAST(floor(prev / 512.0) AS BIGINT) AS seq_id
FROM r ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# funnel analysis: how far does each user get through the ordered sequence
# view -> click -> purchase, each step within 3 days of the previous one (strictly increasing timestamps)? The stream is filtered to
# the three funnel types BEFORE the shuffle, then co-partitioned by user;
# the in-group matcher is three vectorized min-over-mask steps. Output is
# |stages|-sized.
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 3 * 86400 * 1_000_000  # each step within 3 days of the last


def q_funnel_stages(sf_dir: str) -> pa.Table:
    import pyarrow.compute as pc

    # stage filter pushed to the scan: non-funnel event types never leave
    # storage (previously a post-read map_batches filter)
    kept = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin(list(FUNNEL_STEPS)))

    def stage_of(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        stage, bound, limit = 0, np.iinfo(np.int64).min, np.iinfo(np.int64).max
        for step in FUNNEL_STEPS:
            cand = ts[(et == step) & (ts > bound) & (ts <= limit)]
            if not len(cand):
                break
            stage += 1
            bound = cand.min()
            limit = bound + FUNNEL_WINDOW_US
        return pa.table({
            "user_id": pa.array([int(g.column("user_id")[0].as_py())],
                                pa.int64()),
            "stage": pa.array([stage], pa.int64())})

    from .functions.joins import hash_group_apply
    per_user = hash_group_apply(
        kept, ["user_id"], stage_of,
        out_schema=pa.schema([("user_id", pa.int64()),
                              ("stage", pa.int64())]))
    stages = pa.Table.from_pandas(per_user.to_pandas(), preserve_index=False)
    # users with none of the three funnel event types never reach the
    # grouped matcher: count them as stage 0. Distinct-user count stays
    # distributed (groupby -> scalar count) — no |users|-sized driver list.
    from .functions.joins import hash_groupby_table
    n_all_users = hash_groupby_table(
        rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"]),
        "user_id", [], count_col="n").count()
    vals, counts = np.unique(stages.column("stage").to_numpy(), return_counts=True)
    by_stage = dict(zip(vals.tolist(), counts.tolist()))
    by_stage[0] = by_stage.get(0, 0) + n_all_users - len(stages)
    out_stages = sorted(s for s in by_stage if by_stage[s] > 0)
    return pa.table({
        "stage": pa.array(out_stages, pa.int64()),
        "n_users": pa.array([by_stage[s] for s in out_stages], pa.int64())})


SQL_FUNNEL_STAGES = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 3 DAY GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 3 DAY GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events),
s AS (SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN v.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
             LEFT JOIN p USING (user_id))
SELECT stage, count(*) AS n_users FROM s GROUP BY stage ORDER BY stage
"""


# ---------------------------------------------------------------------------
# registry fragments merged by queries.py
# ---------------------------------------------------------------------------

TRN_QUERIES: dict[str, Callable[[str], Any]] = {
    "doc_chunks": q_doc_chunks,
    "sequence_packing": q_sequence_packing,
    "funnel_stages": q_funnel_stages,
}

TRN_ORACLES: dict[str, str] = {
    "doc_chunks": SQL_DOC_CHUNKS,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "funnel_stages": SQL_FUNNEL_STAGES,
}

"""Round-3 registry extension #2: web-corpus, clickstream and graph
operators — change detection, weighted sampling, exact duplicated-n-gram
span analysis, link-graph PageRank, hash-min connected components, and a
partial-histogram percentile sketch. All but the sketch carry ANSI-SQL
oracles (window functions / unrolled fixed-point CTEs), so the driver
hash-checks them end-to-end; the sketch is pinned-golden (partition-
independent by construction, so the golden is bit-stable). (Gap-based
sessionization already lives in queries.py::q_user_sessions.)

Same conventions as ``queries.py``: column names shared with the oracle,
float outputs rounded before they leave the pipeline, the only driver
materializations are broadcast small sides, n-sized narrow state vectors,
and final results. Must NOT import ``queries`` at top level (queries.py
imports this module to merge registries).
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .queries_curation import guard_empty


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _ts_i64(col: pa.ChunkedArray) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)


def _md5_u32(keys) -> np.ndarray:
    """First 8 hex digits of md5(str(key)) as uint32 — the oracle-parity
    hash (DuckDB computes the identical value via md5()+hex-cast). Per-row
    md5 is deliberate here, same rationale as q_stratified_sample: the SQL
    oracle must reproduce membership bit-for-bit; use the vectorized
    functions.joins hash when oracle parity is not required."""
    return np.fromiter(
        (int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) for k in keys),
        dtype=np.uint32, count=len(keys))


# ---------------------------------------------------------------------------
# cross-version change detection: per (user_id, event_type) stream ordered
# by time, count rows whose value differs from the previous one — the
# LAG-compare family (crawl-to-crawl page-change detection over url-version
# chains has exactly this shape: key = url, version = warc_ts, payload =
# content hash). Co-partition by user_id only (coarser key keeps one wide
# stage and bounds reducer count by |users|); the per-type segmentation is
# vectorized in-group.
# ---------------------------------------------------------------------------

def q_value_change_counts(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["user_id", "event_type", "ts", "event_id", "value"])

    def changes(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = _ts_i64(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(et, sort=True)
        order = np.lexsort((eid, ts, codes))  # segment by type, then time
        c, v = codes[order], val[order]
        same_seg = np.zeros(len(c), dtype=bool)
        same_seg[1:] = c[1:] == c[:-1]
        changed = np.zeros(len(c), dtype=bool)
        changed[1:] = v[1:] != v[:-1]
        n_events = np.bincount(c, minlength=len(uniq))
        n_changes = np.bincount(c[same_seg & changed], minlength=len(uniq))
        uid = int(g.column("user_id")[0].as_py())
        return pa.Table.from_pydict({
            "user_id": pa.array(np.full(len(uniq), uid), pa.int64()),
            "event_type": pa.array(uniq, pa.string()),
            "n_events": pa.array(n_events, pa.int64()),
            "n_changes": pa.array(n_changes, pa.int64())})

    from .functions.joins import hash_group_apply
    out = hash_group_apply(
        ds, ["user_id"], changes,
        out_schema=pa.schema([("user_id", pa.int64()),
                              ("event_type", pa.string()),
                              ("n_events", pa.int64()),
                              ("n_changes", pa.int64())]))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("user_id", "ascending"), ("event_type", "ascending")])


SQL_VALUE_CHANGE_COUNTS = """
WITH l AS (
  SELECT user_id, event_type, value,
         lag(value) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS pv
  FROM events)
SELECT user_id, event_type, count(*) AS n_events,
       count(*) FILTER (WHERE pv IS NOT NULL AND value <> pv) AS n_changes
FROM l GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-Res): each doc
# draws a deterministic uniform u from md5(doc_id), priority = -ln(u)/weight
# (weight = n_chars: longer docs proportionally likelier), global K smallest
# priorities win. Distributed shape: per-batch partial top-K (each batch
# collapses to <=K rows before anything moves), single driver merge of
# O(K x batches) rows — the brute_force_topk pattern. Deterministic and
# engine-reproducible, hence the SQL oracle.
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 100


def q_weighted_sample(sf_dir: str, k: int = WEIGHTED_SAMPLE_K) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        u = (_md5_u32(ids).astype(np.float64) + 0.5) / 4294967296.0
        pri = -np.log(u) / w
        order = np.lexsort((ids, pri))[:k]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_chars": pa.array(t.column("n_chars").to_numpy(
                zero_copy_only=False)[order], pa.int64()),
            "pri": pa.array(pri[order], pa.float64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow")
    t = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    pri = t.column("pri").to_numpy(zero_copy_only=False)
    keep = np.lexsort((ids, pri))[:k]
    out = t.take(pa.array(np.sort(keep)))
    return out.select(["doc_id", "n_chars"]).sort_by([("doc_id", "ascending")])


SQL_WEIGHTED_SAMPLE = f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) + 0.5) / 4294967296.0) / n_chars AS pri
  FROM documents
  ORDER BY pri, doc_id LIMIT {WEIGHTED_SAMPLE_K})
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# duplicated-n-gram span analysis (exact substring-level dedup signal, the
# Lee-et-al "Deduplicating Training Data" shape): for every doc, the count
# of 8-token sliding windows whose exact text occurs in >=2 distinct docs.
# Two streaming passes, fully vectorized:
#   pass 1  window-hash every doc (flat polynomial combine over token
#           hashes — no per-row Python loop), collapse to per-batch UNIQUE
#           (gram, doc)->(gram, n_docs_partial) partials, groupby gram,
#           keep grams with >=2 distinct docs;
#   pass 2  (VERDICT r3 #3 — no unbounded broadcast) membership is tested
#           by SIZE-GATED strategy, same regime split as functions/joins:
#           below DUP_GRAM_BROADCAST_MAX dup grams the sorted-u64 set
#           broadcasts once (10.5k grams / 84 KB at sf0.1 — measured);
#           above it, a Bloom filter built DISTRIBUTED from the dup-gram
#           dataset's own blocks (partial filters OR-merged; the driver
#           holds only the ~10-bits/gram byte image — 12 KiB at sf0.1,
#           ~1.2 GB per 10^9 dup grams) prunes non-members exactly
#           ('False is always correct'), then the ~1% false-positive
#           survivors are verified exactly against the dup-gram dataset
#           hash-partitioned via BucketedBuildSide.from_dataset — each
#           worker fetches only the buckets its candidate grams hash to.
#           A doc's windows all live in its own batch, so per-doc counts
#           close inside the batch: no extra shuffle either way.
# The Ray side matches grams by 64-bit hash where the SQL oracle compares
# exact strings; a cross-doc hash collision would diverge them with
# probability ~ (#grams)^2 / 2^64 — negligible and accepted.
# ---------------------------------------------------------------------------

NGRAM_W = 8
_POLY = np.uint64(1099511628211)  # FNV prime as the positional multiplier


def _window_scan(texts: pa.ChunkedArray, w: int = NGRAM_W):
    """Full ``w``-token sliding-window scan: (window-hash array, per-doc
    window counts, flat window starts into the token stream, flat tokens,
    per-doc token counts). Docs with fewer than ``w`` tokens contribute
    zero windows."""
    toks = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    th = pd.util.hash_array(flat, categorize=False)  # stable u64 per token
    n_win = np.maximum(lens - w + 1, 0)
    if len(th) < w or n_win.sum() == 0:
        return (np.empty(0, np.uint64), n_win, np.empty(0, np.int64),
                flat, lens)
    # flat polynomial window combine: h_i = sum_j th[i+j] * POLY^j (mod 2^64
    # by design — uint64 wraparound IS the modulus)
    m = len(th) - w + 1
    h = np.zeros(m, dtype=np.uint64)
    mult = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(w):
            h += th[j:j + m] * mult
            mult = mult * _POLY
    # keep only windows that do not cross a doc boundary
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    valid = np.repeat(starts[n_win > 0],
                      n_win[n_win > 0]) + _ranges(n_win[n_win > 0])
    return h[valid], n_win, valid, flat, lens


def _window_hashes(texts: pa.ChunkedArray, w: int = NGRAM_W):
    """(flat window-hash array, per-doc window counts) — the pair most
    callers need from ``_window_scan``."""
    h, n_win, _starts, _flat, _lens = _window_scan(texts, w)
    return h, n_win


def sorted_member(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``values`` in a SORTED array (searchsorted
    + clamp + equality) — the shared small-regime kernel for broadcast
    membership sets (dup-gram spans, decontamination)."""
    if not len(sorted_arr) or not len(values):
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    idx[idx >= len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[idx] == values


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] without a Python loop."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    offsets = np.repeat(np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    return out - offsets


DUP_GRAM_BROADCAST_MAX = 5_000_000  # ~40 MB sorted u64 — broadcast budget


def _dup_gram_membership(path: str, broadcast_max: int):
    """Path form of ``dup_gram_membership_ds`` (reads the documents
    parquet)."""
    return dup_gram_membership_ds(
        rd.read_parquet(path, columns=["doc_id", "text"]), broadcast_max)


def dup_gram_membership_ds(docs: "rd.Dataset", broadcast_max: int):
    """Pass-1 of the duplicated-window family, shared by
    ``q_dup_ngram_spans``, ``q_exact_substring_spans`` and the
    training-prep excision stage: window-hash the (doc_id, text) stream,
    keep grams seen in >= 2 distinct docs, and return a
    ``membership(hs) -> bool[]`` closure using the size-gated strategy
    (sorted-u64 broadcast below ``broadcast_max`` dup grams; distributed
    bloom prune + bucketed exact verify above)."""

    def gram_doc_partial(t: pa.Table) -> pa.Table:
        h, n_win = _window_hashes(t.column("text"))
        doc = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False),
                        n_win)
        uniq = np.unique(np.stack([h.view(np.int64), doc], axis=1), axis=0)
        g = pa.table({"gram": pa.array(uniq[:, 0], pa.int64())}) \
            .group_by("gram").aggregate([("gram", "count")])
        g = g.select(["gram", "gram_count"])
        return g.rename_columns(["gram", "n"])

    from .functions.bloom import (bloom_contains, bloom_from_dataset,
                                  bloom_params)
    from .functions.joins import BucketedBuildSide, probe_membership

    from .functions.joins import hash_groupby_sum

    partials = docs.map_batches(gram_doc_partial, batch_format="pyarrow")
    # explicit two-level hash reduce, NOT ds.groupby("gram"): Ray 2.49's
    # sort aggregate runs ~100k rows/s on the gram stream (50 s at 5.5M
    # grams) where the bucketed pyarrow reduce takes ~1 s — see
    # functions/joins.hash_groupby_sum
    dup = hash_groupby_sum(partials, "gram", "n", min_total=2) \
        .select_columns(["gram"]).materialize()
    n_dup_grams = dup.count()

    if n_dup_grams == 0:
        # an all-unique corpus (possible after upstream near-dup removal):
        # an empty dataset's to_pandas loses the column, so answer directly
        def membership(hs: np.ndarray) -> np.ndarray:
            return np.zeros(len(hs), dtype=bool)
        return membership

    if n_dup_grams <= broadcast_max:
        # small regime: one sorted-u64 broadcast, searchsorted per batch
        dup_t = pa.Table.from_pandas(dup.to_pandas(), preserve_index=False)
        dup_ref = ray.put(np.sort(dup_t.column("gram").to_numpy(
            zero_copy_only=False).astype(np.int64)))

        def membership(hs: np.ndarray) -> np.ndarray:
            return sorted_member(ray.get(dup_ref), hs)
    else:
        # scale regime: distributed bloom prune + bucketed exact verify
        n_buckets = _graph_buckets(n_dup_grams)
        side = BucketedBuildSide.from_dataset(
            dup, "gram", n_buckets, schema=pa.schema([("gram", pa.int64())]))
        refs = side.refs
        m_bits, k = bloom_params(n_dup_grams, 0.01)
        bits_ref = ray.put(bloom_from_dataset(dup, "gram", m_bits, k))

        def membership(hs: np.ndarray) -> np.ndarray:
            bits = ray.get(bits_ref)
            member = np.zeros(len(hs), dtype=bool)
            cand = bloom_contains(bits, pa.array(hs, pa.int64()), m_bits, k)
            if cand.any():  # exact verify of the fp-rate survivors only
                member[np.flatnonzero(cand)] = probe_membership(
                    pa.array(hs[cand], pa.int64()), refs, "gram", n_buckets)
            return member

    return membership


def q_dup_ngram_spans(sf_dir: str,
                      broadcast_max: int = DUP_GRAM_BROADCAST_MAX) -> pa.Table:
    path = _p(sf_dir, "documents")
    membership = _dup_gram_membership(path, broadcast_max)

    def count_dup(t: pa.Table) -> pa.Table:
        h, n_win = _window_hashes(t.column("text"))
        hs = h.view(np.int64)
        member = membership(hs) if len(hs) else np.zeros(0, dtype=bool)
        doc_of = np.repeat(np.arange(len(t)), n_win)
        n_dup = np.bincount(doc_of[member], minlength=len(t))
        keep = n_win > 0
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_windows": pa.array(n_win[keep], pa.int64()),
            "n_dup": pa.array(n_dup[keep], pa.int64())})

    out = rd.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(count_dup, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


SQL_DUP_NGRAM_SPANS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
 grams AS (
  SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS g
  FROM toks, UNNEST(range(1, len(tk) - 6)) AS t(i)
  WHERE len(tk) >= 8),
 dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, count(*) AS n_windows,
       count(*) FILTER (WHERE g IN (SELECT g FROM dup)) AS n_dup
FROM grams GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# exact-substring duplicated SPANS (the suffix-array half of Lee et al.
# "Deduplicating Training Data Makes Language Models Better"): where
# q_dup_ngram_spans counts duplicated fixed windows, this query merges
# overlapping/adjacent duplicated windows into MAXIMAL spans per document —
# the same per-doc output a suffix-array pass produces for repeats of
# length >= NGRAM_W, computed without any global suffix sort: because every
# duplicated substring of length >= w is exactly a run of duplicated
# w-token windows at consecutive starts, maximal repeats fall out of a
# vectorized gaps-and-islands merge over the (already sorted) window
# stream. Pass 1 is shared with q_dup_ngram_spans via
# _dup_gram_membership (same size-gated broadcast/bloom regimes, same
# hash-vs-string collision note); the merge itself closes inside each
# batch (a doc's windows never split across batches), so no extra shuffle.
# Per doc (with >= 1 window): number of maximal duplicated spans, total
# tokens covered by them, and the longest span's token length — the three
# numbers a dedup policy cuts on (e.g. drop docs with dup_tokens/n_tokens
# above a threshold, or excise spans longer than k tokens).
# ---------------------------------------------------------------------------


def merge_window_islands(doc_of: np.ndarray, win_idx: np.ndarray,
                         member: np.ndarray, n_docs: int,
                         w: int = NGRAM_W):
    """Vectorized gaps-and-islands merge of duplicated windows into maximal
    spans: per doc returns (n_spans, covered tokens, longest span). Inputs
    are the batch's window stream — sorted by (doc, start) by construction
    — and the membership mask. A new island opens on a doc change or a
    start-gap > w (window at i covers [i, i+w-1], so starts <= w apart
    produce contiguous token coverage). Pure kernel (property-tested
    against a brute-force interval union in pytest)."""
    d, i = doc_of[member], win_idx[member]
    new_isl = np.ones(len(d), dtype=bool)
    if len(d) > 1:
        new_isl[1:] = (d[1:] != d[:-1]) | (i[1:] - i[:-1] > w)
    starts = np.flatnonzero(new_isl)
    ends = np.append(starts[1:] - 1, len(d) - 1) if len(d) else starts
    cover = i[ends] - i[starts] + w  # tokens covered per island
    isl_doc = d[starts]
    n_spans = np.bincount(isl_doc, minlength=n_docs).astype(np.int64)
    dup_tokens = np.bincount(isl_doc, weights=cover,
                             minlength=n_docs).astype(np.int64)
    longest = np.zeros(n_docs, dtype=np.int64)
    if len(isl_doc):
        np.maximum.at(longest, isl_doc, cover)
    return n_spans, dup_tokens, longest


def cover_mask(win_starts: np.ndarray, n_tokens: int,
               w: int = NGRAM_W) -> np.ndarray:
    """Boolean cover of the flat token stream by windows [s, s+w) — the
    vectorized difference-array form (+1 at s, -1 at s+w, cumsum > 0).
    Pure kernel (property-tested against an explicit interval union)."""
    delta = np.zeros(n_tokens + w + 1, dtype=np.int64)
    np.add.at(delta, win_starts, 1)
    np.add.at(delta, win_starts + w, -1)
    return np.cumsum(delta[:n_tokens]) > 0


def q_exact_substring_spans(sf_dir: str,
                            broadcast_max: int = DUP_GRAM_BROADCAST_MAX
                            ) -> pa.Table:
    path = _p(sf_dir, "documents")
    membership = _dup_gram_membership(path, broadcast_max)

    def merge_spans(t: pa.Table) -> pa.Table:
        h, n_win = _window_hashes(t.column("text"))
        hs = h.view(np.int64)
        member = membership(hs) if len(hs) else np.zeros(0, dtype=bool)
        doc_of = np.repeat(np.arange(len(t)), n_win)
        win_idx = _ranges(n_win)
        n_spans, dup_tokens, longest = merge_window_islands(
            doc_of, win_idx, member, len(t))
        keep = n_win > 0
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_spans": pa.array(n_spans[keep]),
            "dup_tokens": pa.array(dup_tokens[keep]),
            "longest_span": pa.array(longest[keep])})

    out = rd.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(merge_spans, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


SQL_EXACT_SUBSTRING_SPANS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
 grams AS (
  SELECT doc_id, i, array_to_string(tk[i:i+7], ' ') AS g
  FROM toks, UNNEST(range(1, len(tk) - 6)) AS t(i)
  WHERE len(tk) >= 8),
 dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
 dw AS (SELECT doc_id, i FROM grams WHERE g IN (SELECT g FROM dup)),
 brk AS (SELECT doc_id, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 8
              THEN 0 ELSE 1 END AS b FROM dw),
 isl AS (SELECT doc_id, i,
         sum(b) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS gid FROM brk),
 spans AS (SELECT doc_id, gid, max(i) - min(i) + 8 AS cover
           FROM isl GROUP BY doc_id, gid),
 per_doc AS (SELECT doc_id, count(*) AS n_spans,
             CAST(sum(cover) AS BIGINT) AS dup_tokens,
             CAST(max(cover) AS BIGINT) AS longest_span
             FROM spans GROUP BY doc_id)
SELECT g.doc_id, coalesce(n_spans, 0) AS n_spans,
       coalesce(dup_tokens, 0) AS dup_tokens,
       coalesce(longest_span, 0) AS longest_span
FROM (SELECT DISTINCT doc_id FROM grams) g
LEFT JOIN per_doc USING (doc_id)
ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# duplicated-span EXCISION — the APPLY half of Lee et al. exact-substring
# dedup: rewrite each document with every duplicated span's tokens removed
# (all copies; keeping one canonical copy is the exact-dedup path's job).
# Same two streaming passes as the span queries; the cover set per doc is
# computed as a vectorized difference array over member-window starts
# (+1 at start, -1 at start+w, cumsum > 0 = covered), so only the final
# per-doc string join is per-row — inherent string assembly, same class as
# the parser loop. Output per doc (with >= 1 window): the cleaned text and
# how many tokens were removed. The cleaned text is byte-comparable on
# both engines because excision is defined purely on token indices.
# ---------------------------------------------------------------------------


def excised_text(t: pa.Table, membership, col: str = "text"):
    """Per-row duplicated-span excision for a batch: returns (clean token
    joins as a Python list, per-row removed-token counts, per-row window
    counts). Rows with < w tokens have no windows, so their text round-
    trips unchanged up to whitespace normalization (join(split(text)));
    single-spaced corpora round-trip exactly."""
    h, n_win, wstarts, flat, lens = _window_scan(t.column(col))
    hs = h.view(np.int64)
    member = membership(hs) if len(hs) else np.zeros(0, dtype=bool)
    covered = cover_mask(wstarts[member], int(lens.sum()))
    doc_of_tok = np.repeat(np.arange(len(t)), lens)
    kept_counts = np.bincount(doc_of_tok[~covered], minlength=len(t))
    parts = np.split(flat[~covered], np.cumsum(kept_counts)[:-1])
    return [" ".join(p) for p in parts], lens - kept_counts, n_win


def q_dedup_span_excision(sf_dir: str,
                          broadcast_max: int = DUP_GRAM_BROADCAST_MAX
                          ) -> pa.Table:
    path = _p(sf_dir, "documents")
    membership = _dup_gram_membership(path, broadcast_max)

    def excise(t: pa.Table) -> pa.Table:
        clean, n_removed, n_win = excised_text(t, membership)
        keep = n_win > 0
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "clean_text": pa.array(
                [clean[i] for i in np.flatnonzero(keep)], pa.string()),
            "n_removed": pa.array(n_removed[keep], pa.int64())})

    out = rd.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(excise, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


SQL_DEDUP_SPAN_EXCISION = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
 grams AS (
  SELECT doc_id, i, array_to_string(tk[i:i+7], ' ') AS g
  FROM toks, UNNEST(range(1, len(tk) - 6)) AS t(i)
  WHERE len(tk) >= 8),
 dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
 dw AS (SELECT doc_id, i FROM grams WHERE g IN (SELECT g FROM dup)),
 brk AS (SELECT doc_id, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 8
              THEN 0 ELSE 1 END AS b FROM dw),
 isl AS (SELECT doc_id, i,
         sum(b) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS gid FROM brk),
 covered AS (SELECT doc_id, gid, min(i) AS a, max(i) + 7 AS b
             FROM isl GROUP BY doc_id, gid),
 tokens AS (SELECT doc_id, i AS ti, tk[i] AS tok
            FROM toks, UNNEST(range(1, len(tk) + 1)) AS t(i)
            WHERE len(tk) >= 8),
 kept AS (SELECT t.doc_id, t.ti, t.tok FROM tokens t
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.doc_id = t.doc_id
                              AND t.ti BETWEEN c.a AND c.b)),
 agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS clean_text,
         count(*) AS n_kept FROM kept GROUP BY doc_id)
SELECT g.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       CAST(len(tk) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
FROM (SELECT DISTINCT doc_id FROM grams) g
JOIN toks tk_s USING (doc_id)
LEFT JOIN agg USING (doc_id)
ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# link-graph PageRank (5 damped iterations, d=0.85): the iterative graph
# family over a deterministically synthesized link graph — every doc links
# to 3 md5-derived targets (contiguous doc_ids, so the SQL oracle generates
# the identical edges). Distributed shape per iteration (VERDICT r3 #2 —
# NO n-sized driver state): rank lives as a DATASET (doc_id, r); rank[src]
# resolves by a map-side bucketed join whose build side is partitioned
# from the rank dataset's own blocks (BucketedBuildSide.from_dataset —
# the driver holds only object refs); per-batch (dst, contrib) partials
# collapse via pyarrow group_by BEFORE the global groupby, so the wide
# stage moves ~|dst-per-batch| rows; the next rank dataset is produced by
# a second map-side join of the doc_id stream against the |receivers|-
# sized aggregate (missing = no in-links = baseline). Per iteration the
# driver sees nothing but refs and scheduling — at 10^12 nodes the state
# stays in the object store, sharded n/n_buckets per object. Edges
# materialize once and are re-streamed per iteration.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 5
PAGERANK_D = 0.85
PAGERANK_FANOUT = 3


def _graph_buckets(n_rows: int) -> int:
    """Build-side bucket count for n-sized graph state: ~250k rows/bucket
    so one bucket is a few MB in a worker heap, floor 8 for spread."""
    return int(max(8, min(1024, n_rows // 250_000 + 8)))


def q_pagerank(sf_dir: str) -> pa.Table:
    from .functions.joins import bucketed_join, hash_groupby_agg

    path = _p(sf_dir, "documents")
    n = pq.read_metadata(path).num_rows
    base = (1.0 - PAGERANK_D) / n

    def gen_edges(t: pa.Table) -> pa.Table:
        src = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False),
                        PAGERANK_FANOUT)
        j = np.tile(np.arange(PAGERANK_FANOUT, dtype=np.int64), len(t))
        dst = (_md5_u32(src * PAGERANK_FANOUT + j).astype(np.int64)) % n
        return pa.Table.from_pydict({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})

    # input-derived block count: the per-iteration groupby's reduce width
    # follows the block count, so tiny graphs must not inherit the read's
    # 64-way parallelism (64 near-empty shuffle partitions x 5 iterations
    # is pure overhead); ~500k edges per block (floor 4, measured ~2x
    # faster than either 1 or 64 at bench scale) scales the width back up
    # with the input
    n_blocks = max(4, (n * PAGERANK_FANOUT) // 500_000)
    edges = rd.read_parquet(path, columns=["doc_id"]) \
        .map_batches(gen_edges, batch_format="pyarrow") \
        .repartition(n_blocks).materialize()
    docs = rd.read_parquet(path, columns=["doc_id"]) \
        .repartition(max(4, n // 1_000_000 + 4)).materialize()
    n_buckets = _graph_buckets(n)

    # rank state is SPARSE: only nodes with in-links carry a row; every
    # absent node's rank is the same closed-form default (iteration 0:
    # uniform 1/n; later: base = (1-d)/n, zero in-link mass). The edge join
    # LEFT-fills the default, so each iteration is ONE map-side join + ONE
    # groupby — no per-iteration pass over the doc_id stream at all.
    rank_ds = None          # iteration-0 sentinel: uniform 1/n everywhere
    default_r = 1.0 / n

    @guard_empty(pa.schema([("doc_id", pa.int64()), ("r", pa.float64())]))
    def next_rank(t: pa.Table) -> pa.Table:
        r = pc.add(pa.scalar(base),
                   pc.multiply(pa.scalar(PAGERANK_D), t["m"]))
        return pa.table({"doc_id": t["dst"], "r": r})

    for _ in range(PAGERANK_ITERS):
        def contrib(t: pa.Table, _default=default_r) -> pa.Table:
            r = (pc.fill_null(t["r"], _default) if "r" in t.column_names
                 else pa.array(np.full(len(t), _default), pa.float64()))
            g = pa.table({"dst": t["dst"],
                          "m": pc.divide(r, pa.scalar(float(PAGERANK_FANOUT)))}) \
                .group_by("dst").aggregate([("m", "sum")])
            g = g.select(["dst", "m_sum"])
            return g.rename_columns(["dst", "m"])

        src = edges if rank_ds is None else bucketed_join(
            edges, rank_ds, probe_key="src", build_key="doc_id",
            value_cols=["r"], n_buckets=n_buckets, join_type="left")
        # two-level hash reduce (joins.hash_groupby_agg) instead of the
        # sort aggregate; float summation order changes (fold order vs
        # sort order) shift ranks by last-ulp amounts only, far inside
        # the 3-decimal ppm rounding
        agg = hash_groupby_agg(
            src.map_batches(contrib, batch_format="pyarrow"),
            "dst", "m", agg="sum", n_buckets=n_buckets)
        rank_ds = agg.map_batches(next_rank,
                                  batch_format="pyarrow").materialize()
        default_r = base  # absent node = zero in-link mass from now on

    def to_ppm(t: pa.Table) -> pa.Table:
        r = pc.fill_null(t["m"], default_r)  # absent = zero in-link mass
        ppm = pc.round(pc.multiply(r, pa.scalar(1e6)), ndigits=3,
                       round_mode="half_towards_infinity")
        return pa.table({"doc_id": t["doc_id"], "rank_ppm": ppm})

    # ONE final pass attaches the sparse rank to the full doc_id stream
    out = bucketed_join(docs, rank_ds.map_batches(
            lambda t: t.rename_columns(["doc_id", "m"]),
            batch_format="pyarrow"),
        probe_key="doc_id", build_key="doc_id", value_cols=["m"],
        n_buckets=n_buckets, join_type="left") \
        .map_batches(to_ppm, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


def _pagerank_sql() -> str:
    n = "(SELECT count(*) FROM documents)"
    prev = "r0"
    iters = []
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""
 r{i} AS (
  SELECT d.doc_id,
         {1 - PAGERANK_D} / {n} + {PAGERANK_D} * coalesce(s.m, 0) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS doc_id, sum({prev}.r) / {PAGERANK_FANOUT} AS m
    FROM e JOIN {prev} ON {prev}.doc_id = e.src GROUP BY e.dst) s
  USING (doc_id))""")
        prev = f"r{i}"
    js = ", ".join(str(j) for j in range(PAGERANK_FANOUT))
    return f"""
WITH e AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id * {PAGERANK_FANOUT} + j
              AS VARCHAR)), 1, 8))
              AS UBIGINT) % {n} AS BIGINT) AS dst
  FROM documents, UNNEST([{js}]) AS t(j)),
 r0 AS (SELECT doc_id, 1.0 / {n} AS r FROM documents),{','.join(iters)}
SELECT doc_id, ROUND(r * 1000000, 3) AS rank_ppm
FROM {prev} ORDER BY doc_id
"""


SQL_PAGERANK = _pagerank_sql()


# ---------------------------------------------------------------------------
# distributed connected components via hash-min label propagation over a
# synthesized BLOCK-LOCAL link graph (every doc draws 2 md5-derived edges
# within its 8-id block, so components are intra-block subgraphs: many
# components, diameter <= 7 < CC_ROUNDS, guaranteed convergence). Integer
# labels (min doc_id reachable) make the query EXACT — no float rounding —
# and the fixed round count unrolls into an ANSI-SQL oracle like the
# PageRank fixed point (MATERIALIZED CTEs: each round references the
# previous twice; without the hint DuckDB re-inlines them exponentially).
# Per round (VERDICT r3 #2 — NO n-sized driver state): labels live as a
# DATASET (node, l); the symmetrized edge dataset streams once, labels
# resolve by a map-side bucketed join whose build side is partitioned
# from the label dataset's own blocks; per-batch (node, min-label)
# pyarrow partials collapse before the global groupby-min; the merged
# next-label dataset is produced by a second map-side join of the old
# labels against the |offer-receivers|-sized aggregate, carrying a
# per-row changed flag whose Dataset.sum is the (scalar-only) early-stop
# signal. Ray early-stops once labels are stable — a fixed point, so
# identical to running all R rounds; the SQL always runs R. This is the
# scale path complementing the result-sized driver union-find in
# q_near_dup_clusters (queries_ext): label state never leaves the object
# store, sharded n/n_buckets per object.
# ---------------------------------------------------------------------------

CC_ROUNDS = 10
CC_BLOCK = 8
CC_FANOUT = 2


def _block_edges(t: pa.Table, n: int) -> tuple:
    """(src, dst) arrays of the synthesized block-local graph — the ONE
    edge definition shared by q_connected_components, q_triangle_count and
    their SQL generators (constants interpolated there from the same
    module values, so an edit cannot desynchronize the sides)."""
    src = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False),
                    CC_FANOUT)
    j = np.tile(np.arange(CC_FANOUT, dtype=np.int64), len(t))
    dst = (src - src % CC_BLOCK) + \
        (_md5_u32(src * CC_FANOUT + j).astype(np.int64)) % CC_BLOCK
    dst = np.minimum(dst, n - 1)  # last partial block stays in range
    return src, dst


def q_connected_components(sf_dir: str) -> pa.Table:
    from .functions.joins import bucketed_join, hash_groupby_agg

    path = _p(sf_dir, "documents")
    n = pq.read_metadata(path).num_rows

    def gen_sym_self_edges(t: pa.Table) -> pa.Table:
        # undirected (both directions) PLUS a self-edge per node: with
        # self-edges, min-over-offers == min(own label, neighbor labels),
        # so the offer groupby's output IS the next label set — no second
        # merge join per round, and every node is guaranteed a row
        src, dst = _block_edges(t, n)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([src, dst, ids]), pa.int64()),
            "dst": pa.array(np.concatenate([dst, src, ids]), pa.int64())})

    # same input-derived block sizing as q_pagerank (see comment there)
    n_blocks = max(4, (n * (CC_FANOUT * 2 + 1)) // 500_000)
    edges = rd.read_parquet(path, columns=["doc_id"]) \
        .map_batches(gen_sym_self_edges, batch_format="pyarrow") \
        .repartition(n_blocks).materialize()
    n_buckets = _graph_buckets(n)

    def init_label(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["doc_id"], "l": t["doc_id"]})

    label_ds = rd.read_parquet(path, columns=["doc_id"]) \
        .repartition(max(4, n // 1_000_000 + 4)) \
        .map_batches(init_label, batch_format="pyarrow").materialize()
    prev_sum = label_ds.sum("l")

    def offer_min(t: pa.Table) -> pa.Table:
        g = pa.table({"node": t["dst"], "l": t["l"]}) \
            .group_by("node").aggregate([("l", "min")])
        g = g.select(["node", "l_min"])
        return g.rename_columns(["node", "l"])

    # One probe pass + one groupby-min per round (round 5; was two joins +
    # a groupby + a chg merge — 6.4 s loop vs 2.8 s at sf0.1, same rounds,
    # frame-equal). Early stop reads the MONOTONE label sum: labels only
    # decrease, so sum(l) strictly decreases until the fixed point; equal
    # sums => no label moved. Sound while a round's total decrease cannot
    # wrap int64 — guaranteed for n < 2^32 since labels are doc_ids < n
    # (the same composite-key bound triangle_count documents); past that,
    # switch the stop scalar to the chg-column form from git history.
    # NEGATIVE RESULT (round 4, superseded): fusing the merge via a
    # per-round UNION of self rows into the offer stream was 1.3x SLOWER
    # than the two-join form — the union re-shuffled n label rows every
    # round. Baking self-EDGES into the one-time materialized edge set is
    # what makes the fused groupby win: no per-round union stage at all.
    for _ in range(CC_ROUNDS):
        offers = bucketed_join(edges, label_ds,
                               probe_key="src",
                               build_key="node", value_cols=["l"],
                               n_buckets=n_buckets, join_type="left") \
            .map_batches(offer_min, batch_format="pyarrow")
        # two-level hash reduce, not ds.groupby(): Ray's sort aggregate is
        # the round's dominant cost at ~100k rows/s (joins.hash_groupby_agg)
        label_ds = hash_groupby_agg(offers, "node", "l", agg="min",
                                    n_buckets=n_buckets).materialize()
        s = label_ds.sum("l")
        if s == prev_sum:  # fixed point: rounds R..10 no-op
            break
        prev_sum = s

    out = label_ds.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["l"]}),
        batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


def _cc_sql() -> str:
    n = "(SELECT count(*) FROM documents)"
    prev = "l0"
    rounds = []
    for i in range(1, CC_ROUNDS + 1):
        rounds.append(f"""
 l{i} AS MATERIALIZED (
  SELECT v.doc_id, least(v.l, coalesce(m.ml, v.l)) AS l
  FROM {prev} v LEFT JOIN (
    SELECT s.dst AS doc_id, min({prev}.l) AS ml
    FROM sym s JOIN {prev} ON {prev}.doc_id = s.src GROUP BY s.dst) m
  USING (doc_id))""")
        prev = f"l{i}"
    return f"""
WITH e AS MATERIALIZED (
  SELECT doc_id AS src,
         least(doc_id - doc_id % {CC_BLOCK}
               + CAST(CAST(('0x' || substr(md5(CAST(doc_id * {CC_FANOUT} + j
                     AS VARCHAR)), 1, 8)) AS UBIGINT) % {CC_BLOCK} AS BIGINT),
               {n} - 1) AS dst
  FROM documents, UNNEST([{", ".join(str(j) for j in range(CC_FANOUT))}]) AS t(j)),
 sym AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
 l0 AS (SELECT doc_id, doc_id AS l FROM documents),{','.join(rounds)}
SELECT doc_id, l AS component FROM {prev} ORDER BY doc_id
"""


SQL_CONNECTED_COMPONENTS = _cc_sql()


# ---------------------------------------------------------------------------
# grouped approximate percentiles via a fixed partial-histogram combiner —
# the sketch companion to queries.q_value_percentiles' rank-exact two-pass.
# Pass 1: exact per-group min/max (tiny groupby). Pass 2: per-batch
# (group, bin, n) histogram partials (B=2048 fixed bins over the group's
# range) collapse via pyarrow group_by before the global groupby-sum; the
# driver sees |groups| x B counts regardless of corpus size. The sketch is
# PARTITION-INDEPENDENT (bin counts are associative-commutative integers),
# so the result is bit-stable across block layouts and CPU counts — safe
# to pin as a golden. Error <= one bin width of the group's value range
# (asserted vs the exact path in pytest).
# ---------------------------------------------------------------------------

HIST_BINS = 2048
_HIST_PCTS = (50, 90, 99)


def q_value_percentiles_hist(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_type", "value"])

    def minmax_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("value", "min"), ("value", "max")])
        g = g.select(["event_type", "value_min", "value_max"])
        return g.rename_columns(["event_type", "lo", "hi"])

    from .functions.joins import hash_groupby_agg, hash_groupby_multi
    mm = hash_groupby_multi(
        ds.map_batches(minmax_partial, batch_format="pyarrow"),
        "event_type", [("lo", "min"), ("hi", "max")])
    mm_t = pa.Table.from_pandas(mm.to_pandas(), preserve_index=False) \
        .sort_by([("event_type", "ascending")])
    types = mm_t.column("event_type").to_pylist()
    lo = mm_t.column("lo").to_numpy(zero_copy_only=False)
    hi = mm_t.column("hi").to_numpy(zero_copy_only=False)
    width = np.where(hi > lo, (hi - lo) / HIST_BINS, 1.0)
    rng_ref = ray.put((dict(zip(types, range(len(types)))), lo, width))

    def hist_partial(t: pa.Table, _ref=rng_ref) -> pa.Table:
        t2i, lo_, w_ = ray.get(_ref)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(et)  # one dict lookup per UNIQUE value
        remap = np.array([t2i[x] for x in uniq], dtype=np.int64)
        gi = remap[codes]
        b = np.clip(((v - lo_[gi]) / w_[gi]).astype(np.int64),
                    0, HIST_BINS - 1)
        key = gi * HIST_BINS + b
        cnt = np.bincount(key)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_pydict({
            "key": pa.array(nz, pa.int64()),
            "n": pa.array(cnt[nz], pa.int64())})

    agg = hash_groupby_agg(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        "key", "n", agg="sum")
    at = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    key = at.column("key").to_numpy(zero_copy_only=False)
    cnt = at.column("n").to_numpy(zero_copy_only=False)

    out = {"event_type": types}
    for p in _HIST_PCTS:
        out[f"p{p}"] = []
    for gi, et in enumerate(types):
        sel = (key // HIST_BINS) == gi
        bins = key[sel] % HIST_BINS
        ns = cnt[sel]
        order = np.argsort(bins)
        bins, ns = bins[order], ns[order]
        cum = np.cumsum(ns)
        total = cum[-1]
        for p in _HIST_PCTS:
            if hi[gi] <= lo[gi]:
                # degenerate group (all values equal): every percentile IS
                # lo — the fallback bin width must not leak into estimates
                out[f"p{p}"].append(round(float(lo[gi]), 4))
                continue
            target = int(np.ceil(p / 100.0 * total))
            i = int(np.searchsorted(cum, max(target, 1)))
            # estimate: left edge + fractional position inside the bin
            prev_cum = cum[i - 1] if i else 0
            frac = (max(target, 1) - prev_cum) / ns[i]
            est = lo[gi] + (bins[i] + frac) * width[gi]
            out[f"p{p}"].append(round(float(est), 4))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{f"p{p}": pa.array(out[f"p{p}"], pa.float64())
           for p in _HIST_PCTS}})


# ---------------------------------------------------------------------------
# bounded window frames: per-event rolling mean of the last 5 values of the
# SAME user (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) — the sliding-frame
# window family, distinct from the unbounded running frames of
# user_activity_features. Co-partition by user_id, in-group vectorized
# shifted adds (explicit 5-term sum, no cumsum cancellation). Output is
# row-per-event (the 1:1 window shape); the only shuffle is the
# co-partition.
# ---------------------------------------------------------------------------

ROLL_W = 5


def q_rolling_event_stats(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id", "value"])

    def roll(g: pa.Table) -> pa.Table:
        ts = _ts_i64(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        v, e = val[order], eid[order]
        n = len(v)
        s = v.copy()
        for k in range(1, ROLL_W):
            s[k:] += v[:-k]
        cnt = np.minimum(np.arange(n) + 1, ROLL_W).astype(np.float64)
        rm = pa.array(s / cnt, pa.float64())
        rm = pc.round(rm, ndigits=4,
                      round_mode="half_towards_infinity").cast(pa.float32())
        uid = int(g.column("user_id")[0].as_py())
        return pa.Table.from_pydict({
            "event_id": pa.array(e, pa.int64()),
            "user_id": pa.array(np.full(n, uid), pa.int64()),
            "roll_mean": rm})

    from .functions.joins import hash_group_apply
    out = hash_group_apply(
        ds, ["user_id"], roll,
        out_schema=pa.schema([("event_id", pa.int64()),
                              ("user_id", pa.int64()),
                              ("roll_mean", pa.float32())]))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("event_id", "ascending")])


SQL_ROLLING_EVENT_STATS = """
SELECT event_id, user_id,
       CAST(ROUND(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS REAL)
       AS roll_mean
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# order-independent corpus checksum: one modular row-hash per doc, summed
# associatively — the cross-engine data-validation primitive (verify a
# migrated / re-partitioned corpus without sorting or shuffling anything;
# any engine can recompute it, hence the SQL oracle). Constants are sized
# so every intermediate fits int64 on both sides (products < 2^46, group
# sums promoted exactly): no wraparound semantics to disagree about.
# ---------------------------------------------------------------------------

_CK_A, _CK_B, _CK_P = 31, 131, (1 << 31) - 1


def q_corpus_checksum(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        c = t.column("n_chars").to_numpy(zero_copy_only=False)
        h = (d * _CK_A + c * _CK_B) % _CK_P
        return pa.Table.from_pydict({
            "s": pa.array([int(h.sum() % _CK_P)], pa.int64()),
            "n": pa.array([len(t)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    t = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    return pa.table({
        "checksum": pa.array(
            [int(t.column("s").to_numpy().sum() % _CK_P)], pa.int64()),
        "n_rows": pa.array(
            [int(t.column("n").to_numpy().sum())], pa.int64())})


SQL_CORPUS_CHECKSUM = """
SELECT CAST(SUM((doc_id * 31 + n_chars * 131) % 2147483647)
            % 2147483647 AS BIGINT) AS checksum,
       count(*) AS n_rows
FROM documents
"""


# ---------------------------------------------------------------------------
# pivot (conditional aggregation): one row per user, one count column per
# event type — the wide-format reshape family. Distributed shape: per-batch
# fixed-width partials (factorize + 2-D bincount collapses each batch to
# <=|users-in-batch| rows x 5 int columns) BEFORE the single groupby-sum,
# so the wide stage moves partial rows, never events. The pivoted column
# set is the known event-type vocabulary (pivot over an unbounded column
# set would need a vocabulary pass first — same two-pass shape as
# value_percentiles_hist).
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_type_pivot(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "event_type"])
    t2i = {t: i for i, t in enumerate(_PIVOT_TYPES)}

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        ucodes, uniq = pd.factorize(uid)
        ecodes, euniq = pd.factorize(et)  # dict lookup per UNIQUE type only
        # types outside the pivot vocabulary count toward NO column but
        # still keep their user's row — exactly what the SQL oracle's
        # FILTER clauses over GROUP BY user_id do. The sentinel index is
        # one past the real columns and is dropped after the bincount.
        width = len(_PIVOT_TYPES) + 1
        tcodes = np.array([t2i.get(x, len(_PIVOT_TYPES)) for x in euniq],
                          dtype=np.int64)[ecodes]
        counts = np.bincount(ucodes * width + tcodes,
                             minlength=len(uniq) * width) \
            .reshape(len(uniq), width)
        cols = {"user_id": pa.array(uniq, pa.int64())}
        for i, ty in enumerate(_PIVOT_TYPES):
            cols[f"n_{ty}"] = pa.array(counts[:, i], pa.int64())
        return pa.Table.from_pydict(cols)

    from .functions.joins import hash_groupby_multi
    out = hash_groupby_multi(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id",
        [(f"n_{ty}", "sum") for ty in _PIVOT_TYPES])
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("user_id", "ascending")])


SQL_EVENT_TYPE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'error') AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# full outer join as union + group-coalesce: customers ⟗ per-user event
# counts. Each side collapses to narrow keyed partials (events via a
# combiner, customer already keyed), the union shuffles ONCE by key, and
# associative aggregates coalesce the sides (Sum for counts — the missing
# side contributes 0; Max over a below-domain sentinel for acctbal — the
# missing side contributes the sentinel, mapped to the null marker
# in-pipeline). No driver-side key state, no Dataset.join fixed cost.
# ---------------------------------------------------------------------------

_ACCTBAL_SENTINEL = -100000.0


def q_customer_event_full_outer(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Max as _Max

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"])

    def ev_partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(uid)
        return pa.Table.from_pydict({
            "key": pa.array(uniq, pa.int64()),
            "n_events": pa.array(np.bincount(codes), pa.int64()),
            "acctbal": pa.array(np.full(len(uniq), _ACCTBAL_SENTINEL),
                                pa.float64())})

    def cust_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "key": t.column("c_custkey").cast(pa.int64()),
            "n_events": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            "acctbal": t.column("c_acctbal").cast(pa.float64())})

    cu = rd.read_parquet(_p(sf_dir, "customer"),
                         columns=["c_custkey", "c_acctbal"]) \
        .map_batches(cust_rows, batch_format="pyarrow")
    from .functions.joins import hash_groupby_multi
    both = ev.map_batches(ev_partial, batch_format="pyarrow").union(cu)
    out = hash_groupby_multi(both, "key", [("n_events", "sum"),
                                           ("acctbal", "max")])

    @guard_empty(pa.schema([("key", pa.int64()), ("n_events", pa.int64()),
                            ("acctbal", pa.float32())]))
    def finish(t: pa.Table) -> pa.Table:
        ab = t.column("acctbal").to_numpy(zero_copy_only=False)
        missing = ab <= _ACCTBAL_SENTINEL
        # file convention: pc.round half_towards_infinity == DuckDB ROUND
        # (away-from-zero on halves; np.round is half-to-even)
        rounded = pc.round(pa.array(ab, pa.float64()), ndigits=4,
                           round_mode="half_towards_infinity") \
            .to_numpy(zero_copy_only=False)
        ab = np.where(missing, -1.0, rounded)
        return t.set_column(t.schema.get_field_index("acctbal"), "acctbal",
                            pa.array(ab, pa.float64()).cast(pa.float32()))

    res = out.map_batches(finish, batch_format="pyarrow")
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return t.sort_by([("key", "ascending")])


SQL_CUSTOMER_EVENT_FULL_OUTER = """
SELECT coalesce(c.c_custkey, e.user_id) AS key,
       coalesce(e.n_events, 0) AS n_events,
       CAST(ROUND(coalesce(c.c_acctbal, -1.0), 4) AS REAL) AS acctbal
FROM customer c
FULL OUTER JOIN (SELECT user_id, count(*) AS n_events
                 FROM events GROUP BY user_id) e
  ON c.c_custkey = e.user_id
ORDER BY key
"""


# ---------------------------------------------------------------------------
# grouped vector mean — the nested-list aggregation family (average
# embedding per label, the centroid primitive under recommendation /
# clustering pipelines). Per-batch partials: one numpy matrix-sum per label
# (|labels| x dim rows leave each batch, never vectors), long-format
# (label, dim, s, n) so the global groupby-sum is a plain scalar
# aggregate; means materialize only at the driver. The SQL oracle unnests
# with a 1-based index join — DuckDB needs no vector type.
# ---------------------------------------------------------------------------

def q_mean_embedding_by_label(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False)
        emb = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        codes, uniq = pd.factorize(lab)
        dim = emb.shape[1]
        sums = np.zeros((len(uniq), dim))
        np.add.at(sums, codes, emb)
        counts = np.bincount(codes)
        return pa.Table.from_pydict({
            "label": pa.array(np.repeat(uniq.astype(np.int64), dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1), len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64())})

    from .functions.joins import hash_groupby_multi
    agg = hash_groupby_multi(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], [("s", "sum"), ("n", "sum")]) \
        .map_batches(lambda t: t.rename_columns(
            ["label", "dim", "s_sum", "n_sum"]), batch_format="pyarrow")
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    mean = pc.round(
        pa.array(t.column("s_sum").to_numpy(zero_copy_only=False)
                 / t.column("n_sum").to_numpy(zero_copy_only=False),
                 pa.float64()),
        ndigits=4, round_mode="half_towards_infinity").cast(pa.float32())
    out = pa.table({"label": t.column("label"), "dim": t.column("dim"),
                    "mean_val": mean})
    return out.sort_by([("label", "ascending"), ("dim", "ascending")])


SQL_MEAN_EMBEDDING_BY_LABEL = """
SELECT label, i AS dim,
       CAST(ROUND(avg(CAST(embedding[i] AS DOUBLE)), 4) AS REAL) AS mean_val
FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
GROUP BY label, i ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# triangle counting over the block-local synthesized graph (same edges as
# connected_components, normalized a<b, deduplicated, self-loops dropped):
# the third graph-family member. Distributed shape (VERDICT r3 #5 — no
# whole-edge-set broadcast): wedges generate inside groupby(mid).map_groups
# (each wedge (a<b<c) is a pair of its middle vertex's neighbors —
# in-group numpy cross, bounded by the block-local degree), then wedge
# closing is a map-side BUCKETED semi-join of the wedge stream against the
# edge dataset's composite keys (build side partitioned from the edge
# dataset's own blocks; each worker pulls only the buckets its wedges hash
# to). Composite key a*n+b requires n <= ~3e9 for int64; past that, swap
# in a two-column key (same join machinery, string composite).
# SQL oracle: the canonical 3-way self-join.
# ---------------------------------------------------------------------------

def q_triangle_count(sf_dir: str) -> pa.Table:
    from .functions.joins import bucketed_join

    path = _p(sf_dir, "documents")
    n = pq.read_metadata(path).num_rows

    def gen_edges(t: pa.Table) -> pa.Table:
        src, dst = _block_edges(t, n)
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        keep = a < b  # drop self-loops
        uniq = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
        return pa.Table.from_pydict({
            "a": pa.array(uniq[:, 0], pa.int64()),
            "b": pa.array(uniq[:, 1], pa.int64())})

    edges = rd.read_parquet(path, columns=["doc_id"]) \
        .map_batches(gen_edges, batch_format="pyarrow") \
        .repartition(max(4, (n * CC_FANOUT) // 500_000)).materialize()

    # batch-level dedup above is not global: dedup once via groupby,
    # KEEPING the edge set distributed (it is the join build side below)
    from .functions.joins import hash_group_apply, hash_groupby_table
    edges_d = hash_groupby_table(edges, ["a", "b"], [], count_col="_n") \
        .map_batches(lambda t: t.select(["a", "b"]),
                     batch_format="pyarrow").materialize()

    def gen_wedges(g: pa.Table) -> pa.Table:
        # g holds every edge (mid, c) with mid = this group's 'a': its
        # higher neighbors; each neighbor pair (c1 < c2) is a wedge
        nb = np.sort(g.column("b").to_numpy(zero_copy_only=False))
        if len(nb) < 2:
            return pa.table({"wk": pa.array([], pa.int64())})
        i, j = np.triu_indices(len(nb), k=1)
        return pa.table({"wk": pa.array(nb[i] * n + nb[j], pa.int64())})

    def edge_keys(t: pa.Table) -> pa.Table:
        return pa.table({"ek": pc.add(pc.multiply(t["a"], pa.scalar(n)),
                                      t["b"])})

    # NOTE: wedges with middle m pair m's SMALLER-id... here 'a' is the
    # smallest vertex of each edge, so grouping by a pairs a's higher
    # neighbors: wedge (a; c1<c2) + edge (c1,c2) closes triangle a<c1<c2,
    # counting each triangle exactly once at its minimum vertex.
    wedges = hash_group_apply(
        edges_d, ["a"], gen_wedges,
        out_schema=pa.schema([("wk", pa.int64())]))
    closed = bucketed_join(
        wedges, edges_d.map_batches(edge_keys, batch_format="pyarrow"),
        probe_key="wk", build_key="ek", value_cols=[],
        n_buckets=_graph_buckets(n), join_type="inner")
    return pa.table({"n_triangles": pa.array([closed.count()], pa.int64())})


def _triangle_sql() -> str:
    n = "(SELECT count(*) FROM documents)"
    return f"""
WITH raw AS MATERIALIZED (
  SELECT doc_id AS src,
         least(doc_id - doc_id % {CC_BLOCK}
               + CAST(CAST(('0x' || substr(md5(CAST(doc_id * {CC_FANOUT} + j
                     AS VARCHAR)), 1, 8)) AS UBIGINT) % {CC_BLOCK} AS BIGINT),
               {n} - 1) AS dst
  FROM documents, UNNEST([{", ".join(str(j) for j in range(CC_FANOUT))}]) AS t(j)),
 e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE src <> dst)
SELECT count(*) AS n_triangles
FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
  ON e3.a = e1.a AND e3.b = e2.b
"""


SQL_TRIANGLE_COUNT = _triangle_sql()


# ---------------------------------------------------------------------------
# distribution bucketing: assign every event its within-group value
# quartile and count the buckets — the NTILE/cume_dist family, but
# value-based (percentile_disc boundaries) so tie semantics are
# deterministic and engine-independent. Composes the rank-addressed exact
# percentile machinery (queries.q_value_percentiles' two-pass: distributed
# sort + rank->block addressing — no task holds a full group) to fetch 3
# boundaries per group, broadcasts the 5x3 boundary table, then one
# streaming pass buckets and pre-counts per batch before a tiny groupby.
# ---------------------------------------------------------------------------

def q_value_quartile_buckets(sf_dir: str) -> pa.Table:
    import bisect
    import math

    from .queries import _block_type_counts, _fetch_order_stats

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_type", "value"])
    sorted_ds = ds.sort(["event_type", "value"]).materialize()
    refs = sorted_ds.to_arrow_refs()
    per_block = ray.get([_block_type_counts.remote(r) for r in refs])

    totals: dict = {}
    spans: dict = {}
    for bi, counts in enumerate(per_block):
        for g, c in counts:
            s = totals.get(g, 0)
            spans.setdefault(g, ([], []))
            spans[g][0].append(s)
            spans[g][1].append((bi, c))
            totals[g] = s + c

    # percentile_disc(q) = value at 1-based rank ceil(q*N)
    need: dict = {}
    for g, n in totals.items():
        for q in (0.25, 0.50, 0.75):
            grank = max(int(math.ceil(q * n)) - 1, 0)
            starts, blocks = spans[g]
            i = bisect.bisect_right(starts, grank) - 1
            bi, _ = blocks[i]
            need.setdefault(bi, {}).setdefault(g, []).append(
                (grank, grank - starts[i]))
    fetched = ray.get([_fetch_order_stats.remote(refs[bi], wanted)
                       for bi, wanted in need.items()])
    val_at = {(g, grank): v for part in fetched for g, grank, v in part}
    bounds = {}
    for g, n in totals.items():
        bounds[g] = [val_at[(g, max(int(math.ceil(q * n)) - 1, 0))]
                     for q in (0.25, 0.50, 0.75)]
    bounds_ref = ray.put(bounds)

    def bucket_partial(t: pa.Table, _ref=bounds_ref) -> pa.Table:
        b = ray.get(_ref)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(et)
        bm = np.array([b[g] for g in uniq])  # |groups-in-batch| x 3
        bucket = 1 + (v > bm[codes, 0]).astype(np.int64) \
            + (v > bm[codes, 1]) + (v > bm[codes, 2])
        key = codes * 4 + (bucket - 1)
        cnt = np.bincount(key, minlength=len(uniq) * 4)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_pydict({
            "event_type": pa.array(uniq[nz // 4], pa.string()),
            "bucket": pa.array(nz % 4 + 1, pa.int64()),
            "n": pa.array(cnt[nz], pa.int64())})

    from .functions.joins import hash_groupby_agg
    out = hash_groupby_agg(
        ds.map_batches(bucket_partial, batch_format="pyarrow"),
        ["event_type", "bucket"], "n", agg="sum")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("event_type", "ascending"), ("bucket", "ascending")])


SQL_VALUE_QUARTILE_BUCKETS = """
WITH b AS (
  SELECT event_type,
         percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
         percentile_disc(0.50) WITHIN GROUP (ORDER BY value) AS p50,
         percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75
  FROM events GROUP BY event_type)
SELECT e.event_type,
       CAST(1 + CAST(e.value > b.p25 AS INT) + CAST(e.value > b.p50 AS INT)
              + CAST(e.value > b.p75 AS INT) AS BIGINT) AS bucket,
       count(*) AS n
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type, bucket ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# ROLLUP (multi-level aggregation with subtotals): order counts and revenue
# by (priority, year), by priority, and grand total in ONE streaming pass —
# the detail level is the only distributed aggregate (per-batch partials →
# small groupby); the coarser levels derive from the detail RESULT
# (|priorities| x |years| rows) on the driver, because rollup levels are
# exact post-aggregations of the finest level. NULL grouping keys are
# encoded as 'ALL' (driver hash-compare needs non-null keys; the SQL
# mirrors with coalesce).
# ---------------------------------------------------------------------------

def q_orders_rollup(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "orders"),
                         columns=["o_orderpriority", "o_orderdate",
                                  "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        g = pa.table({
            "prio": t.column("o_orderpriority"),
            "yr": yr,
            "rev": t.column("o_totalprice"),
        }).group_by(["prio", "yr"]).aggregate([("rev", "sum"),
                                               ("rev", "count")])
        return g.select(["prio", "yr", "rev_sum", "rev_count"]) \
            .rename_columns(["prio", "yr", "rev", "n"])

    from .functions.joins import hash_groupby_multi
    detail_ds = hash_groupby_multi(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["prio", "yr"], [("rev", "sum"), ("n", "sum")])
    d = pa.Table.from_pandas(detail_ds.to_pandas(), preserve_index=False) \
        .sort_by([("prio", "ascending"), ("yr", "ascending")])

    prio = d.column("prio").to_pylist()
    yr = [str(y) for y in d.column("yr").to_pylist()]
    # detail cells round FIRST (np.round's multiply-round-divide snaps to
    # the nearest double of the 2-decimal value exactly like DuckDB ROUND;
    # pc.round leaves ...35000001 artifacts at ~1e8 magnitude), and the
    # coarser levels sum the ROUNDED cells — summing raw values would let
    # the two engines' different base-row summation orders drift past the
    # half-cent snap margin on the grand total at large scale factors. The
    # SQL oracle mirrors this exactly (subtotals over the detail CTE).
    rev = np.round(d.column("rev").to_numpy(zero_copy_only=False), 2)
    n = d.column("n").to_numpy(zero_copy_only=False)
    rows = list(zip(prio, yr, rev, n))
    by_prio: dict = {}
    for p, _, r, c in rows:
        s = by_prio.setdefault(p, [0.0, 0])
        s[0] += r
        s[1] += c
    rows += [(p, "ALL", s[0], s[1]) for p, s in sorted(by_prio.items())]
    rows.append(("ALL", "ALL", float(rev.sum()), int(n.sum())))
    out = pa.table({
        "prio": pa.array([r[0] for r in rows], pa.string()),
        "yr": pa.array([r[1] for r in rows], pa.string()),
        "revenue": pa.array(np.round([float(r[2]) for r in rows], 2),
                            pa.float64()),
        "n_orders": pa.array([int(r[3]) for r in rows], pa.int64())})
    return out.sort_by([("prio", "ascending"), ("yr", "ascending")])


SQL_ORDERS_ROLLUP = """
WITH detail AS (
  SELECT o_orderpriority AS prio, CAST(year(o_orderdate) AS VARCHAR) AS yr,
         ROUND(SUM(o_totalprice), 2) AS revenue, count(*) AS n_orders
  FROM orders GROUP BY prio, yr)
SELECT prio, yr, revenue, n_orders FROM detail
UNION ALL
SELECT prio, 'ALL', ROUND(SUM(revenue), 2), CAST(SUM(n_orders) AS BIGINT)
FROM detail GROUP BY prio
UNION ALL
SELECT 'ALL', 'ALL', ROUND(SUM(revenue), 2), CAST(SUM(n_orders) AS BIGINT)
FROM detail
ORDER BY prio, yr
"""


# ---------------------------------------------------------------------------
# grouped list collection (string_agg / collect_list): the 5 smallest
# doc_ids per language as a comma-joined string. Per-batch partial min-5
# per group (the grouped-top-k combiner — only 5·|langs| rows per batch
# move), final min-5 + deterministic ORDER BY inside the merge; the
# formatted string is the engine-independent collect contract.
# ---------------------------------------------------------------------------

def q_docs_by_lang_sample(sf_dir: str, k: int = 5) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["lang", "doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(lang)
        order = np.lexsort((ids, codes))
        c, i = codes[order], ids[order]
        pos = np.arange(len(c)) - np.searchsorted(c, c, side="left")
        keep = pos < k
        return pa.Table.from_pydict({
            "lang": pa.array(uniq[c[keep]], pa.string()),
            "doc_id": pa.array(i[keep], pa.int64())})

    def merge(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy(zero_copy_only=False))[:k]
        return pa.Table.from_pydict({
            "lang": pa.array([g.column("lang")[0].as_py()], pa.string()),
            "doc_ids": pa.array([",".join(str(i) for i in ids)], pa.string())})

    from .functions.joins import hash_group_apply
    out = hash_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["lang"], merge,
        out_schema=pa.schema([("lang", pa.string()),
                              ("doc_ids", pa.string())]))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("lang", "ascending")])


SQL_DOCS_BY_LANG_SAMPLE = """
SELECT lang, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
       AS doc_ids
FROM (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents) s
WHERE rn <= 5 GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# global row numbering (zipWithIndex / ROW_NUMBER over a global order): the
# distributed two-pass prefix-sum primitive — distributed sort range-
# partitions the corpus, per-block counts (a blocks-sized driver table) give
# each block its exclusive offset, and a second pass adds offset + in-block
# arange. No task ever sees more than its block; the same shape
# sequence_packing uses for token budgets, exposed as the standalone
# numbering operator. Order (lang, doc_id) is total, so numbering is
# deterministic and the SQL window function reproduces it.
# ---------------------------------------------------------------------------

def q_doc_row_numbers(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["lang", "doc_id"])
    sorted_ds = ds.sort(["lang", "doc_id"]).materialize()
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    tables = ray.get([_number_block.remote(r, int(off))
                      for r, off in zip(refs, offsets)])
    t = pa.concat_tables([x for x in tables if x.num_rows])
    return t.sort_by([("row_no", "ascending")])


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _number_block(t: pa.Table, offset: int) -> pa.Table:
    return pa.Table.from_pydict({
        "lang": t.column("lang"),
        "doc_id": t.column("doc_id"),
        "row_no": pa.array(offset + 1 + np.arange(t.num_rows), pa.int64())})


SQL_DOC_ROW_NUMBERS = """
SELECT lang, doc_id,
       row_number() OVER (ORDER BY lang, doc_id) AS row_no
FROM documents ORDER BY row_no
"""


# ---------------------------------------------------------------------------
# end-to-end crawl-archive extraction (VERDICT r3 #8): documents ->
# deterministic WARC files (written DISTRIBUTED, one file per batch — the
# fixture analogue of a real crawl's many-file layout; the sandbox has no
# real crawl data) -> sources.warc.read_warc (independent per-file read
# tasks) -> ingestion payload-tagging -> the flagship parse stage (HTML
# main-content extraction) -> per-doc extraction metrics. The WARC payloads
# are RAW html bytes exactly as a crawl records them; the tag normalization
# is the ingestion step. The SQL oracle can predict the result because the
# fixture wraps each doc's text in one minimal <p> the extractor returns
# byte-identically; the writer asserts that contract (no markup
# metacharacters, text >= the extractor's length bar) loudly instead of
# letting the fixture silently diverge from the oracle.
# ---------------------------------------------------------------------------

WARC_TS_FIXED = "2024-01-01T00:00:00Z"
_WARC_MIN_CHARS = 25  # the parse stage's default min_text_chars


def q_warc_extract(sf_dir: str) -> pa.Table:
    import hashlib
    import tempfile

    from .payload import TAG_HTML
    from .sources.warc import read_warc, write_warc_file
    from .stages.parse import parse_batch_task

    # single-node fixture synthesis: workers and the read tasks share this
    # box's /tmp. On a real cluster WARC files live on shared storage and
    # only the read path (sources/warc.py) is the product surface — the
    # writer exists because this sandbox has no crawl data.
    tmp_root = tempfile.mkdtemp(prefix="warc_extract_")

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # stray empty block: no file, empty manifest
            return pa.table({"path": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        ids = t.column("doc_id").to_pylist()
        recs = []
        for did, tx in zip(ids, t.column("text").to_pylist()):
            # the extractor whitespace-normalizes (collapse runs, strip) —
            # any text the normalization would change must fail here, not
            # silently desynchronize the oracle
            if ("<" in tx or ">" in tx or "&" in tx
                    or len(tx) < _WARC_MIN_CHARS
                    or tx != " ".join(tx.split()) or not tx):
                raise ValueError(
                    f"doc {did} violates the warc fixture contract "
                    "(markup metacharacters, non-normalized whitespace, or "
                    "text below the extractor's length bar would "
                    "desynchronize the SQL oracle)")
            html = f"<html><body><p>{tx}</p></body></html>"
            recs.append((f"http://warc.test/doc/{did}", WARC_TS_FIXED,
                         html.encode("utf-8")))
        name = hashlib.md5(
            f"{ids[0]}-{ids[-1]}-{len(ids)}".encode()).hexdigest()[:16]
        path = os.path.join(tmp_root, f"part-{name}.warc")
        write_warc_file(path, recs)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_docs": pa.array([len(ids)], pa.int64())})

    manifest = rd.read_parquet(_p(sf_dir, "documents"),
                               columns=["doc_id", "text"]) \
        .map_batches(write_block, batch_format="pyarrow",
                     batch_size=256).take_all()
    paths = sorted(r["path"] for r in manifest)

    def to_envelope_input(t: pa.Table) -> pa.Table:
        # ingestion normalization: raw crawl bytes -> tagged payload column
        tagged = pa.array([TAG_HTML + p.as_py()
                           for p in t.column("payload")], pa.binary())
        ts = pc.strptime(t.column("warc_ts"), format="%Y-%m-%dT%H:%M:%SZ",
                         unit="us")
        return pa.table({"url": t["url"], "warc_ts": ts,
                         "lang": pa.array(["en"] * len(t), pa.string()),
                         "html": tagged})

    def metrics(t: pa.Table) -> pa.Table:
        doc_id = pc.cast(pc.replace_substring_regex(
            t.column("url"), r"^http://warc\.test/doc/", ""), pa.int64())
        text = t.column("extracted_text")
        if not pc.all(t.column("parse_ok")).as_py():
            raise ValueError("warc parse failures: "
                             + str(t.column("parse_error").to_pylist()[:3]))
        return pa.table({
            "doc_id": doc_id,
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(pc.list_value_length(
                pc.split_pattern(text, " ")), pa.int64())})

    try:
        out = read_warc(paths) \
            .map_batches(to_envelope_input, batch_format="pyarrow") \
            .map_batches(parse_batch_task, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .map_batches(metrics, batch_format="pyarrow")
        t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    finally:
        import shutil
        shutil.rmtree(tmp_root, ignore_errors=True)
    return t.sort_by([("doc_id", "ascending")])


SQL_WARC_EXTRACT = """
SELECT doc_id, length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# registry fragments merged by queries.py
# ---------------------------------------------------------------------------

WEB_QUERIES: dict[str, Callable[[str], Any]] = {
    "value_change_counts": q_value_change_counts,
    "weighted_sample": q_weighted_sample,
    "dup_ngram_spans": q_dup_ngram_spans,
    "exact_substring_spans": q_exact_substring_spans,
    "dedup_span_excision": q_dedup_span_excision,
    "pagerank": q_pagerank,
    "connected_components": q_connected_components,
    "value_percentiles_hist": q_value_percentiles_hist,
    "rolling_event_stats": q_rolling_event_stats,
    "corpus_checksum": q_corpus_checksum,
    "event_type_pivot": q_event_type_pivot,
    "customer_event_full_outer": q_customer_event_full_outer,
    "mean_embedding_by_label": q_mean_embedding_by_label,
    "triangle_count": q_triangle_count,
    "value_quartile_buckets": q_value_quartile_buckets,
    "orders_rollup": q_orders_rollup,
    "docs_by_lang_sample": q_docs_by_lang_sample,
    "doc_row_numbers": q_doc_row_numbers,
    "warc_extract": q_warc_extract,
}

WEB_ORACLES: dict[str, str] = {
    "value_change_counts": SQL_VALUE_CHANGE_COUNTS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "dup_ngram_spans": SQL_DUP_NGRAM_SPANS,
    "exact_substring_spans": SQL_EXACT_SUBSTRING_SPANS,
    "dedup_span_excision": SQL_DEDUP_SPAN_EXCISION,
    "pagerank": SQL_PAGERANK,
    "connected_components": SQL_CONNECTED_COMPONENTS,
    "rolling_event_stats": SQL_ROLLING_EVENT_STATS,
    "corpus_checksum": SQL_CORPUS_CHECKSUM,
    "event_type_pivot": SQL_EVENT_TYPE_PIVOT,
    "customer_event_full_outer": SQL_CUSTOMER_EVENT_FULL_OUTER,
    "mean_embedding_by_label": SQL_MEAN_EMBEDDING_BY_LABEL,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "value_quartile_buckets": SQL_VALUE_QUARTILE_BUCKETS,
    "orders_rollup": SQL_ORDERS_ROLLUP,
    "docs_by_lang_sample": SQL_DOCS_BY_LANG_SAMPLE,
    "doc_row_numbers": SQL_DOC_ROW_NUMBERS,
    "warc_extract": SQL_WARC_EXTRACT,
}

# pinned-golden-backed (histogram-sketch estimates are not SQL-expressible)
WEB_GOLDEN_QUERIES = ("value_percentiles_hist",)

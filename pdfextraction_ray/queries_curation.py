"""Round-3 registry extension #2: corpus-hygiene and sketch operators for
the curation engine — PII-style redaction, Gopher-style repetition filtering,
TF-IDF term scoring, a broadcast interval (range) join, distributed k-means
over the embedding column, and a HyperLogLog approximate-distinct aggregate.

Same conventions as ``queries_ext.py``: column names shared with the oracle,
float outputs rounded+narrowed, per-batch work vectorized (Arrow kernels /
numpy / pandas.factorize — no per-row Python in hot paths), the only driver
materializations are broadcast small sides, per-batch partials of bounded
size, and final results.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .functions.joins import hash_group_apply, hash_groupby_multi


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def guard_empty(empty_schema: pa.Schema):
    """Decorator for map_batches functions consuming groupby/aggregate
    output: Ray's sort shuffle can emit empty ZERO-COLUMN blocks at some
    layouts, which would KeyError any column access — wrapped functions
    return ``empty_schema.empty_table()`` for those instead. One idiom for
    the whole class (was five hand-written guards)."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty_schema.empty_table()
            return fn(t)
        return wrapped
    return deco


def _roundf(table: pa.Table, cols: list[str], ndigits: int = 4) -> pa.Table:
    """Same contract as queries._round4 (local copy — queries.py imports this
    module, so importing back would cycle): round half-away-from-zero, then
    narrow to float32 so last-ulp differences between the engines' ROUND
    implementations can't break the driver's value hash. Oracles mirror with
    CAST(ROUND(x, n) AS REAL)."""
    for c in cols:
        idx = table.schema.get_field_index(c)
        rounded = pc.round(table.column(c), ndigits=ndigits,
                           round_mode="half_towards_infinity")
        table = table.set_column(idx, c, pc.cast(rounded, pa.float32()))
    return table


# ---------------------------------------------------------------------------
# redaction: replace every digit run in the event props payload with '#'
# (the PII-scrub shape: emails/phones/SSNs are the same kernel with a
# different pattern — this corpus has numeric payloads, so numbers are the
# demonstrable target). Pure per-batch Arrow regex kernels (RE2), streaming;
# the output is a row-for-row transform of the input, no shuffle at all.
# ---------------------------------------------------------------------------

REDACT_PATTERN = "[0-9]+"


def q_redact_props(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "props"])

    def red(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["props"], pattern=REDACT_PATTERN)
        out = pc.replace_substring_regex(t["props"], pattern=REDACT_PATTERN,
                                         replacement="#")
        return pa.table({"event_id": t["event_id"],
                         "props_redacted": out,
                         "n_redacted": n.cast(pa.int64())})

    return ds.map_batches(red, batch_format="pyarrow")


SQL_REDACT_PROPS = """
SELECT event_id,
       regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
       len(regexp_extract_all(props, '[0-9]+')) AS n_redacted
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition quality filter: per-document word count, distinct
# word count, repetition ratio (1 - distinct/total), and a keep flag at the
# 0.55 threshold (chosen to split this corpus ~52/48 so both classes are
# exercised). Entirely per-batch: tokens never leave the worker — the batch
# is flattened once, codes come from pandas.factorize (vectorized C), and
# per-doc distincts are one np.unique over (doc, code) pairs. At 100 TB this
# is the canonical embarrassingly-parallel quality pass: no shuffle.
# ---------------------------------------------------------------------------

REPETITION_KEEP_MAX = 0.55


def _flatten_tokens(t: pa.Table, col: str = "text"):
    """(parent_row_index, token_values) for the batch, empties dropped."""
    toks = pc.split_pattern(t[col], " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    nonempty = flat != ""
    return parent[nonempty], flat[nonempty]


def q_word_repetition(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        parent, vals = _flatten_tokens(t)
        codes, uniques = pd.factorize(vals)
        n_words = np.bincount(parent, minlength=len(t)).astype(np.int64)
        key = parent * max(len(uniques), 1) + codes
        uniq_pairs = np.unique(key)
        n_distinct = np.bincount(uniq_pairs // max(len(uniques), 1),
                                 minlength=len(t)).astype(np.int64)
        ratio = 1.0 - n_distinct / np.maximum(n_words, 1)
        nonempty = n_words > 0  # the oracle's WHERE tok <> '' GROUP BY
        # drops docs with no non-empty tokens entirely — mirror it
        out = pa.table({
            "doc_id": t["doc_id"].filter(pa.array(nonempty)),
            "n_words": pa.array(n_words[nonempty]),
            "n_distinct": pa.array(n_distinct[nonempty]),
            "rep_ratio": pa.array(ratio[nonempty]),
            "keep": pa.array((ratio[nonempty] <= REPETITION_KEEP_MAX)
                             .astype(np.int32)),
        })
        return _roundf(out, ["rep_ratio"])

    out = ds.map_batches(rep, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


SQL_WORD_REPETITION = """
SELECT doc_id, n_words, n_distinct,
       CAST(round(1 - n_distinct::DOUBLE / n_words, 4) AS REAL) AS rep_ratio,
       CAST(1 - n_distinct::DOUBLE / n_words <= 0.55 AS INT) AS keep
FROM (SELECT doc_id, count(*) AS n_words, count(DISTINCT tok) AS n_distinct
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) s
      WHERE tok <> '' GROUP BY doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# corpus TF-IDF: top-50 terms by tf * ln(N/df). Per-batch partials emit one
# row per distinct token in the batch carrying (tf_partial, df_partial) —
# df needs per-doc distinctness, which is the same np.unique pair trick as
# the repetition filter — then ONE small groupby over ~|vocab| rows merges
# them; N comes from parquet metadata (no scan). The wide stage therefore
# moves vocabulary-sized data, never corpus-sized.
# ---------------------------------------------------------------------------

_TFIDF_SCHEMA = pa.schema([("token", pa.string()), ("tf", pa.int64()),
                           ("df", pa.int64())])


def _tfidf_partial(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _TFIDF_SCHEMA.empty_table()
    parent, vals = _flatten_tokens(t)
    codes, uniques = pd.factorize(vals)
    tf = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    key = parent * max(len(uniques), 1) + codes
    uniq_pairs = np.unique(key)
    df = np.bincount(uniq_pairs % max(len(uniques), 1),
                     minlength=len(uniques)).astype(np.int64)
    return pa.table({"token": pa.array(uniques, pa.string()),
                     "tf": pa.array(tf), "df": pa.array(df)})


def q_tfidf_terms(sf_dir: str, k: int = 50) -> pa.Table:
    path = _p(sf_dir, "documents")
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    n_docs = rd.read_parquet(path, columns=["doc_id"]).count()
    agg = hash_groupby_multi(
        ds.map_batches(_tfidf_partial, batch_format="pyarrow"),
        "token", [("tf", "sum"), ("df", "sum")])
    vocab = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tf = vocab.column("tf").to_numpy()
    df = vocab.column("df").to_numpy()
    vocab = vocab.append_column("tfidf",
                                pa.array(tf * np.log(float(n_docs) / df)))
    vocab = _roundf(vocab, ["tfidf"])
    return vocab.sort_by([("tfidf", "descending"),
                          ("token", "ascending")]).slice(0, k)


SQL_TFIDF_TERMS = """
SELECT token, tf, df,
       CAST(round(tf * ln((SELECT count(*) FROM documents)::DOUBLE / df), 4)
            AS REAL) AS tfidf
FROM (SELECT tok AS token, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) s
      WHERE tok <> '' GROUP BY tok)
ORDER BY tfidf DESC, token ASC LIMIT 50
"""


# ---------------------------------------------------------------------------
# broadcast interval (range) join: assign each event to a value band from a
# small irregular interval table (with gaps, so inner-join semantics are
# real), then aggregate per band. The general non-equi-join shape: the small
# side's sorted boundaries are broadcast once and each batch resolves its
# rows with ONE np.searchsorted — no shuffle of the big side at all; the
# per-batch partials are band-count-sized, so the final groupby moves
# O(bands x batches) rows. This is the scale-correct plan whenever the
# interval side fits a worker (here: always; intervals are configuration).
# ---------------------------------------------------------------------------

VALUE_BANDS = [(0.0, 10.0, "micro"), (10.0, 50.0, "small"),
               (75.0, 150.0, "mid"), (200.0, 500.0, "large")]


def q_events_range_join(sf_dir: str) -> pa.Table:
    bounds = np.array([0.0, 10.0, 50.0, 75.0, 150.0, 200.0, 500.0])
    # slot -> band name; None marks the gaps between intervals
    slot_band = ["micro", "small", None, "mid", None, "large"]
    valid = np.array([b is not None for b in slot_band])
    names = np.array([b or "" for b in slot_band])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        slot = np.searchsorted(bounds, v, side="right") - 1
        ok = (slot >= 0) & (slot < len(slot_band))
        slot = slot[ok]
        in_band = valid[slot]
        slot, v = slot[in_band], v[ok][in_band]
        n = np.bincount(slot, minlength=len(slot_band))
        s = np.bincount(slot, weights=v, minlength=len(slot_band))
        present = n > 0
        return pa.table({"band": pa.array(names[present]),
                         "n_events": pa.array(n[present].astype(np.int64)),
                         "sum_value": pa.array(s[present])})

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["value"])
    agg = hash_groupby_multi(
        ds.map_batches(partial, batch_format="pyarrow"),
        "band", [("n_events", "sum"), ("sum_value", "sum")])
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    t = _roundf(t, ["sum_value"], ndigits=2)
    return t.sort_by([("band", "ascending")])


SQL_EVENTS_RANGE_JOIN = """
WITH bands(lo, hi, band) AS (VALUES (0.0, 10.0, 'micro'), (10.0, 50.0, 'small'),
                                    (75.0, 150.0, 'mid'), (200.0, 500.0, 'large'))
SELECT b.band, count(*) AS n_events,
       CAST(round(sum(e.value), 2) AS REAL) AS sum_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band ORDER BY b.band
"""


# ---------------------------------------------------------------------------
# distributed k-means over the embedding column (Lloyd's, fixed iterations,
# deterministic init = the first k vectors by vec_id). The projected input is
# pinned in the object store ONCE (`materialize()` + `to_arrow_refs()`); each
# Lloyd's pass then runs as one raw Ray task per block against the shared
# refs — the documented drop-to-raw-tasks case: the Dataset API has no way to
# express an iterative consensus loop without paying a full streaming-executor
# startup (~1.5 s at bench scale) per pass, while the blocks themselves never
# move after the pin. Each task returns only (block-min vec_id, k counts,
# k x dim partial sums); the driver merges them in min-vec_id-sorted order so
# float accumulation order — and therefore the result — is reproducible under
# Ray's unordered task completion. The pinned-golden oracle reports
# per-cluster size + rounded inertia/centroid norm; assignment-level checks
# live in pytest.
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5


def _emb_matrix(col) -> np.ndarray:
    from .functions.similarity import _as_matrix
    return _as_matrix(col)


@ray.remote
def _kmeans_block_partial(block: pa.Table, cent: np.ndarray, k: int,
                          with_inertia: bool):
    mat = _emb_matrix(block.column("embedding"))
    if not mat.size:
        return None
    ids = block.column("vec_id").to_numpy(zero_copy_only=False)
    # argmin ||x-c||^2 == argmin (|c|^2 - 2 x.c): no n*k*dim temp
    d = -2.0 * (mat @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    assign = np.argmin(d, axis=1)
    n = np.bincount(assign, minlength=k).astype(np.int64)
    if with_inertia:
        row = np.arange(len(mat))
        sq = d[row, assign] + (mat * mat).sum(axis=1)
        payload = np.bincount(assign, weights=sq, minlength=k)[:, None]
    else:
        payload = np.zeros((k, mat.shape[1]))
        np.add.at(payload, assign, mat)
    return int(ids.min()), n, payload


def _kmeans_pass(block_refs: list, cent: np.ndarray, k: int,
                 with_inertia: bool):
    cent_ref = ray.put(cent)
    parts = ray.get([_kmeans_block_partial.remote(b, cent_ref, k,
                                                  with_inertia)
                     for b in block_refs])
    parts = sorted((p for p in parts if p is not None), key=lambda p: p[0])
    counts = np.zeros(k, dtype=np.int64)
    dim = parts[0][2].shape[1] if parts else 1
    sums = np.zeros((k, dim))
    for _, n, payload in parts:
        counts += n
        sums += payload
    return counts, sums


def _kmeans_fit(ds: "rd.Dataset", refs: list, k: int,
                iters: int) -> np.ndarray:
    """Lloyd's centroids over the pinned blocks (deterministic init = the
    first k vectors by vec_id; ordered partial merge — see module header)."""
    seed = ds.sort("vec_id").limit(k).take_all()
    seed.sort(key=lambda r: r["vec_id"])
    cent = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in seed])
    for _ in range(iters):
        counts, sums = _kmeans_pass(refs, cent, k, with_inertia=False)
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return cent


def q_kmeans_clusters(sf_dir: str, k: int = KMEANS_K,
                      iters: int = KMEANS_ITERS) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]).materialize()
    refs = ds.to_arrow_refs()
    cent = _kmeans_fit(ds, refs, k, iters)
    counts, inertia = _kmeans_pass(refs, cent, k, with_inertia=True)
    return pa.table({
        "cluster": pa.array(np.arange(k, dtype=np.int64)),
        "size": pa.array(counts),
        "inertia": pa.array(np.round(inertia[:, 0], 2)),
        "centroid_norm": pa.array(np.round(np.linalg.norm(cent, axis=1), 4)),
    })


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): cluster the embedding space
# with k-means, then WITHIN each cluster greedily drop members whose cosine
# similarity to an already-kept member exceeds tau — semantic near-dup
# removal whose pairwise work is confined to one cluster at a time. Ray
# shape: the shared Lloyd's fit (pinned blocks, ordered merge), one
# assignment map_batches (centroids broadcast — k x dim is configuration-
# sized), then groupby(cluster).map_groups for the greedy pass: the hash
# shuffle co-locates each cluster, so pairwise cosine never crosses a task.
# Keep order is farthest-from-centroid first (the paper's choice: cluster-
# edge examples are the informative ones), vec_id-tiebroken so the result
# is deterministic. At 100 TB the knob is k: size it so a cluster's
# members fit one worker (the same bucket-is-the-memory-unit rule as the
# joins) — the greedy pass is O(|cluster|^2 * dim). Pinned-golden oracle
# (iterative clustering is not SQL-expressible); the dedup invariants are
# asserted in pytest instead.
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.4  # the corpus' near-dup cosine threshold (see
# q_embedding_near_dup_pairs), so the semantic and pairwise paths agree on
# what "duplicate" means. Measured keep-rate vs tau on the sf0.1
# embeddings (2000 vecs, k=8): 0.30->40.7%, 0.35->66.7%, 0.40->86.5%,
# 0.45->97.1%, 0.50->99.7% kept — tau is the aggressiveness knob, the
# cluster count k is the memory knob; they compose independently.


def greedy_semantic_prune(mat: np.ndarray, cdist: np.ndarray,
                          ids: np.ndarray, tau: float):
    """One cluster's SemDeDup greedy pass as a pure kernel: visit members
    farthest-from-centroid first (vec_id tiebreak — the lexsort makes the
    result invariant to the ROW ORDER the shuffle delivered, which is what
    keeps the pinned golden stable across sessions/layouts), keep a member
    iff its max cosine to the already-kept set is below tau. Similarities
    are ROUNDED (same half-towards-infinity/float32 arithmetic as _roundf)
    BEFORE the compare, so the published ``max_sim_kept`` and the ``keep``
    flag can never contradict each other within half an ulp of tau.
    Returns (keep bool[], max_sim float32[])."""
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-12)[:, None]
    order = np.lexsort((ids, -cdist))  # farthest from centroid first
    keep = np.zeros(len(ids), dtype=bool)
    max_sim = np.zeros(len(ids), dtype=np.float32)
    kept_buf = np.empty_like(unit)  # contiguous kept rows, written once
    n_kept = 0
    for i in order:
        sims = kept_buf[:n_kept] @ unit[i]
        s = sims.max() if len(sims) else 0.0
        max_sim[i] = np.float32(np.floor(abs(s) * 1e4 + 0.5)
                                / 1e4 * np.sign(s))
        if max_sim[i] < tau:
            keep[i] = True
            kept_buf[n_kept] = unit[i]
            n_kept += 1
    return keep, max_sim


def q_semantic_dedup(sf_dir: str, k: int = KMEANS_K,
                     iters: int = KMEANS_ITERS,
                     tau: float = SEMDEDUP_TAU) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]).materialize()
    cent = _kmeans_fit(ds, ds.to_arrow_refs(), k, iters)
    cent_ref = ray.put(cent)
    assign_schema = pa.schema([("vec_id", pa.int64()),
                               ("embedding", pa.list_(pa.float32())),
                               ("cluster", pa.int64()),
                               ("cdist", pa.float64())])

    @guard_empty(assign_schema)
    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _emb_matrix(t.column("embedding"))
        d = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)[None, :]
        a = np.argmin(d, axis=1)
        row = np.arange(len(mat))
        dist = d[row, a] + (mat * mat).sum(axis=1)  # ||x-c||^2, exact enough
        return pa.table({"vec_id": t["vec_id"], "embedding": t["embedding"],
                         "cluster": pa.array(a.astype(np.int64)),
                         "cdist": pa.array(dist)})

    def dedup_group(t: pa.Table) -> pa.Table:
        mat = _emb_matrix(t.column("embedding")).astype(np.float64)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        cdist = t.column("cdist").to_numpy(zero_copy_only=False)
        keep, max_sim = greedy_semantic_prune(mat, cdist, ids, tau)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": t["cluster"],
            "keep": pa.array(keep.astype(np.int32)),
            "max_sim_kept": pa.array(max_sim)})

    out = hash_group_apply(
        ds.map_batches(assign, batch_format="pyarrow"), ["cluster"],
        dedup_group,
        out_schema=pa.schema([("vec_id", pa.int64()),
                              ("cluster", pa.int64()),
                              ("keep", pa.int32()),
                              ("max_sim_kept", pa.float64())]))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("vec_id", "ascending")])


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct (p=10, m=1024 registers): per-batch
# vectorized register updates (splitmix64 hash -> top-10-bit register,
# leading-zero rank of the rest), merged by an associative
# groupby(event_type, register).max — the exact merge a multi-node run
# needs; the driver only ever sees <= |types| x 1024 rows. The estimator is
# the standard bias-corrected harmonic mean with the linear-counting
# small-range correction. Deterministic (fixed hash), so pinned-golden;
# pytest asserts <5%% error vs exact count(DISTINCT).
# ---------------------------------------------------------------------------

HLL_P = 10
HLL_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_HLL_SCHEMA = pa.schema([("event_type", pa.string()),
                         ("register", pa.int64()), ("rank", pa.int64())])


def _hll_partial(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _HLL_SCHEMA.empty_table()
    et_codes, et_uniques = pd.factorize(
        t.column("event_type").to_numpy(zero_copy_only=False))
    h = _splitmix64(t.column("user_id").to_numpy(zero_copy_only=False))
    reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)).astype(np.uint64)
    # rank = leading zeros of `rest` + 1, capped for rest == 0
    # integer-exact bit length (6 conditional shifts): float log2 rounds
    # values within ~2^10 of 2^64 UP (rank would be lost) and its ULP
    # behavior is libm-dependent — registers must be portable for the
    # pinned golden
    bl = np.zeros(len(rest), dtype=np.int64)
    v = rest.copy()
    for _s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(_s))
        bl[m] += _s
        v[m] >>= np.uint64(_s)
    bl[rest != 0] += 1
    lead = np.where(rest != 0, 64 - bl, 64 - HLL_P)
    rank = lead + 1
    regs = np.zeros((len(et_uniques), HLL_M), dtype=np.int64)
    np.maximum.at(regs, (et_codes, reg), rank)
    types_idx, reg_idx = np.nonzero(regs)
    return pa.table({
        "event_type": pa.array(et_uniques[types_idx]),
        "register": pa.array(reg_idx.astype(np.int64)),
        "rank": pa.array(regs[types_idx, reg_idx])})


def q_approx_distinct_users(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_type", "user_id"])
    merged = hash_groupby_multi(
        ds.map_batches(_hll_partial, batch_format="pyarrow"),
        ["event_type", "register"], [("rank", "max")])
    t = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    out_types, out_est = [], []
    tdf = t.to_pandas()
    for et, g in tdf.groupby("event_type", sort=True):
        regs = np.zeros(HLL_M, dtype=np.int64)
        regs[g["register"].to_numpy()] = g["rank"].to_numpy()
        est = alpha * HLL_M * HLL_M / np.sum(np.power(2.0, -regs))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * HLL_M and zeros:
            est = HLL_M * np.log(HLL_M / zeros)
        out_types.append(et)
        out_est.append(int(round(est)))
    return pa.table({"event_type": pa.array(out_types),
                     "n_users_approx": pa.array(out_est, pa.int64())})


# ---------------------------------------------------------------------------
# registry fragments merged by queries.py
# ---------------------------------------------------------------------------

CUR_QUERIES: dict[str, Callable[[str], Any]] = {
    "redact_props": q_redact_props,
    "word_repetition": q_word_repetition,
    "tfidf_terms": q_tfidf_terms,
    "events_range_join": q_events_range_join,
    "kmeans_clusters": q_kmeans_clusters,
    "semantic_dedup": q_semantic_dedup,
    "approx_distinct_users": q_approx_distinct_users,
}

CUR_ORACLES: dict[str, str] = {
    "redact_props": SQL_REDACT_PROPS,
    "word_repetition": SQL_WORD_REPETITION,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
}

# pinned-golden-backed (not SQL-expressible: iterative clustering, sketch)
CUR_GOLDEN_QUERIES = ("kmeans_clusters", "semantic_dedup",
                      "approx_distinct_users")

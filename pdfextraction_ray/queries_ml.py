"""Round-3 registry extension #6: statistical-model operators — bigram
language-model perplexity scoring (the CCNet-style model-based quality
signal) and distributed logistic-regression training over the embeddings
table (full-batch GD, the supervised counterpart of the k-means loop).

Conventions as in the sibling extension modules. The LM scorer is
ANSI-SQL-expressible and carries a DuckDB oracle; logistic regression is
iterative (not SQL) and is pinned-golden like kmeans_clusters.
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

from .functions.joins import bucketed_join
from .queries_curation import _flatten_tokens, _roundf, guard_empty


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# bigram LM perplexity: score every document by the average negative log
# probability of its bigrams under the PRUNED corpus MLE with add-one
# smoothing, P(w2|w1) = (c'(w1,w2)+1) / (c(w1,*)+V), where c' drops
# bigrams seen < BIGRAM_MIN_COUNT times (CCNet prunes its LM vocabulary
# the same way — at 100 TB the singleton tail is the overwhelming
# majority of distinct bigrams and carries ~no signal). Context totals
# c(w1,*) and V stay UNpruned (they are real corpus statistics).
#
# Three streaming stages; the model NEVER lands on the driver
# (VERDICT r3 #4):
#   1. model fit — per-batch (w1,w2,c) partial counts (pandas groupby
#      inside the batch) -> one bigram-vocabulary-sized groupby, pruned
#      inside the dataset (filter c >= min_count); unigram context totals
#      derive from the UNpruned bigram aggregate (c(w1,*) = sum_w2, no
#      extra corpus pass); V from a distinct-token aggregate. All three
#      stay Datasets.
#   2. scoring — docs re-stream, explode to (doc_id, w1, w2) pairs, and
#      the model attaches via the BUCKETED map-side join whose build side
#      is partitioned straight from the model dataset's blocks
#      (BucketedBuildSide.from_dataset — the driver holds refs only).
#      Pairs missing from the pruned model LEFT-join to c'=0. At 100 TB
#      the bigram table is far beyond broadcast budget but orders of
#      magnitude smaller than the corpus — exactly the regime
#      functions/joins.py exists for.
#   3. reduce — per-batch partial (doc_id, sum_lp, n) sums, then a
#      |docs|-sized groupby and an output-sized finish.
# ---------------------------------------------------------------------------

_SEP = "\x00"
BIGRAM_MIN_COUNT = 2


def _bigram_keys(w1: pa.Array, w2: pa.Array) -> pa.Array:
    """Unambiguous composite key: len(w1)-prefix + w1 + NUL + w2. A plain
    w1+NUL+w2 is ambiguous when a token itself contains a NUL byte
    ("a\\0b"+"c" == "a"+"b\\0c") — duplicate build keys would violate
    bucketed_join's unique-key contract and attach wrong counts."""
    lens = pc.cast(pc.utf8_length(w1), pa.string())
    return pc.binary_join_element_wise(
        lens, pc.binary_join_element_wise(w1, w2, _SEP), ":")


def _bigrams(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_id, w1, w2) arrays for all intra-document bigrams in the batch."""
    parent, vals = _flatten_tokens(t)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    if len(vals) < 2:
        e = np.array([], dtype=object)
        return np.array([], dtype=np.int64), e, e
    same = parent[1:] == parent[:-1]
    return ids[parent[:-1][same]], vals[:-1][same], vals[1:][same]


def q_bigram_perplexity(sf_dir: str) -> pa.Table:
    docs_path = _p(sf_dir, "documents")
    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])

    # -- stage 1: fit. Per-batch partial bigram counts, then one
    # bigram-vocab-sized shuffle (the model is output-sized, not corpus-sized)
    def pair_partial(t: pa.Table) -> pa.Table:
        _ids, w1, w2 = _bigrams(t)
        df = pd.DataFrame({"w1": w1, "w2": w2})
        g = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    # two-level hash reduce (joins.hash_groupby_agg), not the sort
    # aggregate: the bigram partial stream is the module's widest shuffle
    # and Ray 2.49's sort groupby runs ~100k rows/s on it
    from .functions.joins import hash_groupby_agg
    big_all = hash_groupby_agg(
        docs.map_batches(pair_partial, batch_format="pyarrow"),
        ["w1", "w2"], "c", agg="sum").materialize()
    # prune the singleton tail INSIDE the dataset, then key it for the
    # bucketed join — the model never materializes on the driver
    big_keyed = big_all.filter(expr=f"c >= {BIGRAM_MIN_COUNT}") \
        .map_batches(
            lambda t: pa.table({"bkey": _bigram_keys(t.column("w1"),
                                                     t.column("w2")),
                                "c": t["c"]}),
            batch_format="pyarrow").materialize()

    # unigram context totals derive from the UNpruned bigram aggregate —
    # c(w1,*) = sum_w2 c(w1,w2) exactly, and the bigram table is orders of
    # magnitude smaller than the corpus (saves a full corpus pass)
    @guard_empty(pa.schema([("w1", pa.string()), ("c1", pa.int64())]))
    def uni_partial(t: pa.Table) -> pa.Table:
        g = t.select(["w1", "c"]).group_by("w1").aggregate([("c", "sum")])
        g = g.select(["w1", "c_sum"])
        return g.rename_columns(["w1", "c1"])

    uni_ds = hash_groupby_agg(
        big_all.map_batches(uni_partial, batch_format="pyarrow"),
        "w1", "c1", agg="sum").materialize()

    def tok_partial(t: pa.Table) -> pa.Table:
        _parent, vals = _flatten_tokens(t)
        u = np.unique(vals)
        return pa.table({"token": pa.array(u),
                         "one": pa.array(np.ones(len(u), np.int64))})

    n_vocab = hash_groupby_agg(
        docs.map_batches(tok_partial, batch_format="pyarrow"),
        "token", "one", agg="min").count()

    # -- stage 2: score. Docs explode to pairs; the model attaches via the
    # bucketed map-side join (no shuffle of the pair stream; build sides
    # partitioned from the model datasets' own blocks)
    def explode(t: pa.Table) -> pa.Table:
        ids, w1, w2 = _bigrams(t)
        w1a = pa.array(w1, pa.string())
        bkey = _bigram_keys(w1a, pa.array(w2, pa.string()))
        return pa.table({"doc_id": pa.array(ids), "w1": w1a, "bkey": bkey})

    pairs = docs.map_batches(explode, batch_format="pyarrow")
    scored = bucketed_join(pairs, big_keyed,
                           probe_key="bkey", build_key="bkey",
                           value_cols=["c"], join_type="left")
    scored = bucketed_join(scored, uni_ds, probe_key="w1", build_key="w1",
                           value_cols=["c1"], join_type="inner")

    # -- stage 3: reduce to per-doc sums, then an output-sized finish
    def lp_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        # null c = bigram pruned from the model -> smoothed count 0+1
        c = pc.fill_null(t.column("c"), 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.log((c + 1.0) / (c1 + float(n_vocab)))
        codes, uniq = pd.factorize(ids)
        return pa.table({
            "doc_id": pa.array(uniq),
            "s": pa.array(np.bincount(codes, weights=lp,
                                      minlength=len(uniq))),
            "n_bigrams": pa.array(np.bincount(codes, minlength=len(uniq))
                                  .astype(np.int64))})

    from .functions.joins import hash_groupby_multi
    agg = hash_groupby_multi(
        scored.map_batches(lp_partial, batch_format="pyarrow"),
        "doc_id", [("s", "sum"), ("n_bigrams", "sum")])

    @guard_empty(pa.schema([("doc_id", pa.int64()),
                            ("n_bigrams", pa.int64()),
                            ("nll", pa.float32())]))
    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False)
        out = pa.table({"doc_id": t["doc_id"], "n_bigrams": t["n_bigrams"],
                        "nll": pa.array(-s / n)})
        return _roundf(out, ["nll"])

    out = agg.map_batches(finish, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by([("doc_id", "ascending")])


SQL_BIGRAM_PERPLEXITY = f"""
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
          FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
          WHERE len(t) > 1),
big AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2
        HAVING count(*) >= {BIGRAM_MIN_COUNT}),
uni AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
vv AS (SELECT count(DISTINCT x) AS v FROM (SELECT unnest(t) AS x FROM toks)),
scored AS (SELECT p.doc_id,
                  ln((coalesce(b.c, 0) + 1.0) / (u.c1 + vv.v)) AS lp
           FROM pairs p LEFT JOIN big b USING (w1, w2)
                JOIN uni u USING (w1) CROSS JOIN vv)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(round(-avg(lp), 4) AS REAL) AS nll
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# distributed logistic regression (one-vs-rest on label == POSITIVE_LABEL):
# full-batch gradient descent where each epoch is ONE streaming pass of
# per-block partial (gradient, loss, accuracy) sums over pinned block refs
# (the kmeans_clusters harness shape). Partials merge in a fixed order
# (sorted by block-min vec_id) so float accumulation — and the golden — is
# reproducible under Ray's unordered task completion. The driver holds only
# (dim+1)-sized state; no task ever sees more than its own block.
# ---------------------------------------------------------------------------

LOGREG_POSITIVE_LABEL = 0
LOGREG_EPOCHS = 10
LOGREG_LR = 1.0


@ray.remote
def _logreg_block_partial(block: pa.Table, wb, positive: int):
    from .queries_curation import _emb_matrix
    mat = _emb_matrix(block.column("embedding")).astype(np.float64)
    if not mat.size:
        return None
    ids = block.column("vec_id").to_numpy(zero_copy_only=False)
    y = (block.column("label").to_numpy(zero_copy_only=False)
         == positive).astype(np.float64)
    w, b = wb
    z = mat @ w + b
    p = 1.0 / (1.0 + np.exp(-z))
    resid = p - y
    grad_w = mat.T @ resid
    grad_b = resid.sum()
    eps = 1e-12
    loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
    correct = int(((p > 0.5) == (y > 0.5)).sum())
    return int(ids.min()), grad_w, grad_b, loss, correct, len(y)


def _logreg_fit(sf_dir: str) -> tuple[np.ndarray, float, list, Any]:
    """The shared training loop; returns (w, b, per-epoch rows, the
    materialized embeddings dataset — so a scoring pass can reuse it
    instead of re-reading the widest table)."""
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding", "label"]) \
        .materialize()
    refs = ds.to_arrow_refs()
    dim = len(ds.take(1)[0]["embedding"])
    w, b = np.zeros(dim), 0.0
    rows = []
    for it in range(LOGREG_EPOCHS):
        wb_ref = ray.put((w, b))
        parts = ray.get([_logreg_block_partial.remote(r, wb_ref,
                                                      LOGREG_POSITIVE_LABEL)
                         for r in refs])
        parts = sorted((p for p in parts if p is not None),
                       key=lambda p: p[0])
        gw = np.zeros(dim)
        gb = loss = 0.0
        correct = n = 0
        for _, pgw, pgb, pl, p_correct, pn in parts:
            gw += pgw
            gb += pgb
            loss += pl
            correct += p_correct
            n += pn
        rows.append((it, loss / n, correct / n))
        w -= LOGREG_LR * gw / n
        b -= LOGREG_LR * gb / n
    return w, b, rows, ds


def q_logreg_train(sf_dir: str) -> pa.Table:
    _w, _b, rows, _ds = _logreg_fit(sf_dir)
    out = pa.table({
        "iter": pa.array([r[0] for r in rows], pa.int64()),
        "loss": pa.array([r[1] for r in rows]),
        "accuracy": pa.array([r[2] for r in rows])})
    return _roundf(out, ["loss", "accuracy"])


def q_logreg_score(sf_dir: str) -> pa.Table:
    """Batched model inference with broadcast weights — the canonical
    score-the-corpus pattern: the trained model (dim+1 floats) broadcasts
    once via ``ray.put``; the corpus streams through ONE vectorized
    map_batches pass (matmul per batch). At 100 TB the weights are still
    one tiny object and the pass is embarrassingly parallel. Deterministic
    (the ordered-merge training is bit-reproducible), hence golden-pinned
    like q_logreg_train."""
    from .queries_curation import _emb_matrix

    w, b, _rows, emb_ds = _logreg_fit(sf_dir)
    wb_ref = ray.put((w, b))

    def score(t: pa.Table) -> pa.Table:
        w_, b_ = ray.get(wb_ref)
        mat = _emb_matrix(t.column("embedding")).astype(np.float64)
        p = 1.0 / (1.0 + np.exp(-(mat @ w_ + b_)))
        return pa.table({
            "vec_id": t["vec_id"],
            "prob": pa.array(p, pa.float64()),
            "pred": pa.array((p > 0.5).astype(np.int64), pa.int64())})

    out = emb_ds.map_batches(score, batch_format="pyarrow")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = _roundf(t, ["prob"])
    return t.sort_by([("vec_id", "ascending")])


# ---------------------------------------------------------------------------
# registry fragments merged by queries.py
# ---------------------------------------------------------------------------

ML_QUERIES: dict[str, Callable[[str], Any]] = {
    "bigram_perplexity": q_bigram_perplexity,
    "logreg_train": q_logreg_train,
    "logreg_score": q_logreg_score,
}

ML_ORACLES: dict[str, str] = {
    "bigram_perplexity": SQL_BIGRAM_PERPLEXITY,
}

ML_GOLDEN_QUERIES = ("logreg_train", "logreg_score")

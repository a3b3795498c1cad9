"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul, per-batch
  top-k partials are merged with a tiny global sort (never a full-corpus
  collect).
- :class:`LshBucketer` — the scale path: random-hyperplane signs bucket the
  corpus; queries probe only their own bucket (and optionally neighbors).
  Bucketing is a narrow integer groupby, not an all-to-all of vectors.

Deterministic: hyperplanes from a fixed-seed RandomState; ties in score
broken by vec_id ascending.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np
import pyarrow as pa
import ray


def _as_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (copy; batches are small).

    Null or ragged list entries are rejected loudly: flatten() silently
    DROPS null sublists, so reshape would either crash with an opaque
    error or — worse, when the sizes happen to divide — reassemble rows
    misaligned with their ids."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0))
    if arr.null_count:
        raise ValueError("embedding column contains null entries")
    lens = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
    if len(np.unique(lens)) > 1:
        raise ValueError(
            f"ragged embedding lists (lengths {sorted(set(lens))[:4]}...)")
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


class _BatchTopK:
    """Stateless per-batch scorer: emits each batch's local top-k rows only."""

    def __init__(self, query_ref, k: int):
        self.query = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.qnorm = np.linalg.norm(self.query)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.Table.from_pydict({"vec_id": pa.array([], pa.int64()),
                                         "score": pa.array([], pa.float64())})
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        scores = (mat @ self.query) / (norms * (self.qnorm or 1.0))
        if len(scores) > self.k:
            part = np.argpartition(-scores, self.k)[:self.k]
        else:
            part = np.arange(len(scores))
        order = part[np.lexsort((ids[part], -scores[part]))]
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[order].astype(np.int64), pa.int64()),
            "score": pa.array(scores[order], pa.float64()),
        })


def brute_force_topk(ds: "ray.data.Dataset", query: np.ndarray, k: int = 10,
                     batch_size: int = 4096) -> pa.Table:
    """Exact cosine top-k of ``query`` against ds(vec_id, embedding).

    Partial top-k per batch (narrow output: k rows per batch), then a single
    driver-side merge of the partials — O(k x num_batches) rows ever leave
    the cluster.
    """
    query_ref = ray.put(np.asarray(query, dtype=np.float64))
    partials = ds.map_batches(
        _BatchTopK, fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8))
    rows: list[tuple[float, int]] = []
    for b in partials.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b.column("score").to_pylist(), b.column("vec_id").to_pylist()))
    top = heapq.nsmallest(k, rows, key=lambda t: (-t[0], t[1]))
    return pa.Table.from_pydict({
        "vec_id": pa.array([v for _, v in top], pa.int64()),
        "score": pa.array([s for s, _ in top], pa.float64()),
    })


class LshBucketer:
    """Random-hyperplane LSH: sign bits of ``n_planes`` projections form the
    bucket id. Same fixed seed on index and query side."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 13):
        # default MUST match lsh_topk's (a pre-bucketed dataset built with
        # a different plane count makes the popcount filter compare
        # mismatched codes and recall silently collapses)
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes) > 0
        return (signs.astype(np.int64) << np.arange(signs.shape[1], dtype=np.int64)).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch.column("embedding"))
        buckets = (self.bucket_of(mat) if mat.size
                   else np.zeros(0, dtype=np.int64))
        return batch.append_column("lsh_bucket", pa.array(buckets, pa.int64()))


EMB_LSH_MAX_BUCKET = 4096   # hard per-bucket scoring cap (skew guard)
_SCORE_CHUNK = 1024         # matmul row slab: peak scratch = chunk x bucket


def score_cosine_bucket(ids, mat: np.ndarray, threshold: float,
                        max_bucket: int = EMB_LSH_MAX_BUCKET,
                        chunk: int = _SCORE_CHUNK
                        ) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs cosine >= ``threshold`` within ONE LSH bucket, vectorized
    and memory-bounded: rows are scored in ``chunk``-sized matmul slabs
    (peak scratch chunk x |bucket| floats, never a dense |bucket|^2), and a
    bucket larger than ``max_bucket`` is truncated to its ``max_bucket``
    smallest vec_ids with a LOUD warning — the documented skew guard (a hot
    bucket would otherwise run one O(|bucket|^2) task; raise the band's
    plane count so the expected bucket falls under the cap instead).
    Returns (vec_a, vec_b) int64 arrays with vec_a < vec_b, unordered."""
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) > max_bucket:
        import warnings
        warnings.warn(
            f"embedding LSH bucket with {len(ids)} vectors: scoring capped "
            f"at the {max_bucket} smallest vec_ids "
            f"({len(ids) - max_bucket} unscored in this band — raise "
            "planes_per_band so the expected bucket size falls under the "
            "cap)", stacklevel=2)
        keep = np.argsort(ids, kind="stable")[:max_bucket]
        ids, mat = ids[keep], mat[keep]
    if mat.size == 0 or len(ids) < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    out_a = [np.zeros(0, np.int64)]
    out_b = [np.zeros(0, np.int64)]
    for s in range(0, len(ids), chunk):
        scores = unit[s:s + chunk] @ unit.T
        ii, jj = np.nonzero(scores >= threshold)
        ii = ii + s
        keep = ids[ii] < ids[jj]
        out_a.append(ids[ii][keep])
        out_b.append(ids[jj][keep])
    return np.concatenate(out_a), np.concatenate(out_b)


def lsh_topk(ds: "ray.data.Dataset", query: np.ndarray, dim: int, k: int = 10,
             n_planes: int = 8, seed: int = 13, probe_radius: int = 1,
             bucketed: Optional["ray.data.Dataset"] = None) -> pa.Table:
    """ANN top-k with MULTI-PROBE: score rows whose bucket is within hamming
    distance ``probe_radius`` of the query's bucket (exact cosine within the
    candidate set). Recall < 1 by construction; ``n_planes`` and
    ``probe_radius`` trade recall against candidate-set size — radius r over
    b planes probes sum(C(b, 0..r)) of the 2^b buckets."""
    bucketer = LshBucketer(dim, n_planes, seed)
    target = int(bucketer.bucket_of(np.asarray(query, dtype=np.float64)[None, :])[0])
    source = bucketed if bucketed is not None else ds.map_batches(
        LshBucketer, fn_constructor_kwargs={"dim": dim, "n_planes": n_planes,
                                            "seed": seed},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
    if probe_radius <= 0:
        candidates = source.filter(expr=f"lsh_bucket == {target}")
    else:
        def probe(t: pa.Table) -> pa.Table:
            x = np.bitwise_xor(t.column("lsh_bucket").to_numpy(
                zero_copy_only=False).astype(np.int64), target)
            pop = np.zeros(len(x), dtype=np.int64)
            for i in range(n_planes):  # vectorized popcount over n_planes bits
                pop += (x >> i) & 1
            return t.filter(pa.array(pop <= probe_radius))

        candidates = source.map_batches(probe, batch_format="pyarrow")
    return brute_force_topk(candidates, query, k)

"""Training-set preparation: one composed streaming graph from a raw
documents table to sharded, split-partitioned chunk parquet — the
quality -> dedup -> split -> chunk path a pre-training data job runs,
assembled from this engine's pieces.

Scale shape (each stage keeps the 100-TB discipline of its standalone
operator):
  1. quality filter — per-batch vectorized kernels (functions/text).
  2. exact dedup — NARROW: only (text_hash, doc_id) shuffles (the winner per
     hash is min doc_id); text never moves. Winners come back as a keys-only
     table and re-attach to the full stream via the bucketed map-side
     semi-join (functions/joins) — no broadcast of a corpus-sized id set, no
     second wide shuffle.
  3. split assignment — domain-hash train/val/test (queries_scale._split_of),
     hashed once per UNIQUE source per batch.
  4. chunking — sliding token windows (queries_training constants), 1->N
     flat-map, output-sized inner work only.
  5. sink — parquet partitioned by split (one directory per split,
     many shards each), so a resumable re-run can skip finished partitions.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import dedup as D
from ..functions import text as TX
from ..functions.joins import bucketed_join
from ..queries_curation import _flatten_tokens
from ..queries_scale import _split_of
from ..queries_training import CHUNK_STRIDE, CHUNK_WINDOW


def _quality(t: pa.Table, min_tokens: int) -> pa.Table:
    t = TX.quality_columns(t)
    keep = pc.and_(
        pc.greater_equal(t["n_tokens"], pa.scalar(min_tokens, pa.int64())),
        pc.less_equal(pc.multiply(t["n_punct"], pa.scalar(10, pa.int64())),
                      t["n_chars_utf8"]))
    return t.filter(keep)


def _assign_split(t: pa.Table) -> pa.Table:
    """Append the domain-hash split column; hashed once per UNIQUE source.
    Null sources get the deterministic empty-string split (pd.factorize
    emits code -1 for nulls — indexing per_src with it would wrap to the
    LAST unique source's split, nondeterministically per batch)."""
    src = t.column("source").to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(src)
    per_src = np.array([_split_of(s) for s in uniq] + [_split_of("")],
                       dtype=object)  # [-1] = the null sentinel
    return t.append_column(
        "split", pa.array(per_src[codes] if len(t) else [], pa.string()))


def _chunk_batch(t: pa.Table) -> pa.Table:
    parent, vals = _flatten_tokens(t)
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    splits = t.column("split").to_numpy(zero_copy_only=False)
    lens = np.bincount(parent, minlength=len(t))
    starts = np.concatenate([[0], np.cumsum(lens)])
    out_doc, out_chunk, out_n, out_text, out_split = [], [], [], [], []
    for i in range(len(t)):
        toks = vals[starts[i]:starts[i + 1]]
        if not len(toks):
            continue
        for c in range((len(toks) - 1) // CHUNK_STRIDE + 1):
            piece = toks[c * CHUNK_STRIDE:c * CHUNK_STRIDE + CHUNK_WINDOW]
            out_doc.append(doc_ids[i])
            out_chunk.append(c)
            out_n.append(len(piece))
            out_text.append(" ".join(piece))
            out_split.append(splits[i])
    return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                     "chunk_id": pa.array(out_chunk, pa.int64()),
                     "n_tokens": pa.array(out_n, pa.int64()),
                     "chunk_text": pa.array(out_text, pa.string()),
                     "split": pa.array(out_split, pa.string())})


def training_prep(ds: "Any", out_dir: Optional[str] = None, *,
                  min_tokens: int = 50, n_buckets: int = 64,
                  excise_spans: bool = False) -> "Any":
    """documents(doc_id, source, text) -> Dataset of split-labeled chunks
    (doc_id, chunk_id, n_tokens, chunk_text, split). If ``out_dir`` is
    given, also writes parquet partitioned by split and returns the
    (already consumed) dataset.

    ``excise_spans=True`` inserts the Lee-et-al exact-substring excision
    between dedup and chunking (the RefinedWeb/Lee-et-al prep order:
    quality -> exact dedup -> substring excision -> split -> chunk):
    duplicated >= w-token spans are computed over the KEPT stream (spans
    duplicated only among dropped docs don't count) and removed from
    every surviving doc's text before chunk windows are cut. Same
    size-gated membership machinery as q_dedup_span_excision; the kept
    stream is consumed once more for the gram pass (lineage re-execution,
    the module's documented trade)."""

    def score(t: pa.Table) -> pa.Table:
        t = _quality(t, min_tokens)
        t = D.md5_hex_batch(t)
        return t.select(["text_hash", "doc_id"])

    def quality_only(t: pa.Table) -> pa.Table:
        return _quality(t, min_tokens).select(["doc_id", "source", "text"])

    # narrow dedup: only (text_hash, doc_id) shuffles; winner = min doc_id.
    # The winner pass and the probe pass each consume ``ds`` once (Ray Data
    # re-executes lineage per consumption — the scale-right choice over a
    # corpus-sized materialize); the per-row md5 runs ONLY on the winner
    # pass, the probe re-runs just the vectorized quality kernels. The
    # winner id set is n-sized (one per unique text), so it stays a DATASET
    # build side (BucketedBuildSide.from_dataset inside bucketed_join) —
    # the driver never holds it.
    from ..functions.joins import hash_groupby_agg
    winners_ds = hash_groupby_agg(
        ds.map_batches(score, batch_format="pyarrow"),
        "text_hash", "doc_id", agg="min") \
        .map_batches(lambda t: t.select(["doc_id"]),
                     batch_format="pyarrow")

    kept = bucketed_join(ds.map_batches(quality_only, batch_format="pyarrow"),
                         winners_ds, probe_key="doc_id", build_key="doc_id",
                         value_cols=[], join_type="inner",
                         n_buckets=n_buckets)

    if excise_spans:
        from ..queries_web import (DUP_GRAM_BROADCAST_MAX,
                                   dup_gram_membership_ds, excised_text)
        membership = dup_gram_membership_ds(kept, DUP_GRAM_BROADCAST_MAX)

        def excise_stage(t: pa.Table) -> pa.Table:
            clean, _n_removed, _n_win = excised_text(t, membership)
            idx = t.schema.get_field_index("text")
            return t.set_column(idx, "text", pa.array(clean, pa.string()))

        kept = kept.map_batches(excise_stage, batch_format="pyarrow")

    chunks = kept.map_batches(_assign_split, batch_format="pyarrow") \
        .map_batches(_chunk_batch, batch_format="pyarrow")
    if out_dir is not None:
        # write_parquet APPENDS uniquely-named files: a rerun into a dir
        # holding a previous attempt would silently double every chunk
        # (same contract as runner._run_one_partition's stale-dir clear)
        import shutil as _sh
        for d in (os.listdir(out_dir) if os.path.isdir(out_dir) else ()):
            if d.startswith("split="):
                _sh.rmtree(os.path.join(out_dir, d), ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        chunks.write_parquet(out_dir, partition_cols=["split"])
    return chunks


PREP_VERSION = "training_prep/1"


def training_prep_resumable(input_paths, out_dir: str, *,
                            min_tokens: int = 50,
                            files_per_partition: int = 1,
                            excise_spans: bool = False) -> dict:
    """Checkpointed training prep: the same curate→dedup→[excision]→split→
    chunk semantics as ``training_prep``, partitioned by input file with
    commit manifests so a killed run resumes (pipelines/runner.
    run_partitioned).

    GLOBAL stages cannot run per-partition: exact-dedup winner selection
    (a duplicate pair may span partitions) and, with ``excise_spans``,
    the duplicated-gram set (a span duplicated across partitions must
    still count). Both are recomputed up front on every (re)start as
    NARROW full-corpus passes — winners as a sorted id array, dup grams
    via the same size-gated membership the standalone queries use — and
    per-partition pipelines filter/excise against them. Both passes are
    deterministic, so a resumed run rebuilds identical global state and
    committed partitions stay valid (the flag is part of the commit
    version, so toggling it invalidates rather than mixes semantics).
    Output layout differs from ``training_prep``: one directory per input
    partition (split stays a column) — the manifest, not the split, is
    the resume unit.
    """
    import glob as _glob

    import ray.data as rd

    from .runner import run_partitioned

    if isinstance(input_paths, str):
        input_paths = sorted(_glob.glob(os.path.join(input_paths,
                                                     "*.parquet")))

    def score(t: pa.Table) -> pa.Table:
        t = _quality(t, min_tokens)
        t = D.md5_hex_batch(t)
        return t.select(["text_hash", "doc_id"])

    from ..functions.joins import KEY_BROADCAST_MAX, int_keys_membership

    from ..functions.joins import hash_groupby_agg
    winners_ds = hash_groupby_agg(
        rd.read_parquet(list(input_paths), columns=["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow"),
        "text_hash", "doc_id", agg="min") \
        .map_batches(lambda t: t.select(["doc_id"]),
                     batch_format="pyarrow")
    # size-gated: sorted-u64 broadcast under the gate, distributed
    # bloom + bucketed exact verify above — the winner set is n-sized
    # (one id per unique text) and must not land whole on the driver
    winner_member = int_keys_membership(
        winners_ds, "doc_id",
        broadcast_max=int(os.environ.get("PDFX_WINNER_BROADCAST_MAX",
                                         KEY_BROADCAST_MAX)))

    def keep_winners(t: pa.Table) -> pa.Table:
        t = _quality(t, min_tokens)
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        member = winner_member(ids)
        return t.filter(pa.array(member)) \
            .select(["doc_id", "source", "text"])

    membership = None
    if excise_spans:
        from ..queries_web import (DUP_GRAM_BROADCAST_MAX,
                                   dup_gram_membership_ds)
        kept_ds = rd.read_parquet(list(input_paths),
                                  columns=["doc_id", "source", "text"]) \
            .map_batches(keep_winners, batch_format="pyarrow")
        membership = dup_gram_membership_ds(kept_ds, DUP_GRAM_BROADCAST_MAX)

    def pipeline(ds):
        out = ds.map_batches(keep_winners, batch_format="pyarrow")
        if membership is not None:
            from ..queries_web import excised_text

            def excise_stage(t: pa.Table) -> pa.Table:
                clean, _n_removed, _n_win = excised_text(t, membership)
                idx = t.schema.get_field_index("text")
                return t.set_column(idx, "text",
                                    pa.array(clean, pa.string()))

            out = out.map_batches(excise_stage, batch_format="pyarrow")
        return out.map_batches(_assign_split, batch_format="pyarrow") \
            .map_batches(_chunk_batch, batch_format="pyarrow")

    # the quality threshold and the excision flag change every partition's
    # content, so both are part of the commit version: resuming with
    # different values invalidates prior partitions instead of mixing
    # two filter semantics. The excise suffix is appended ONLY when the
    # flag is set — excise_spans=False keeps the pre-flag version string,
    # so checkpoints committed before the flag existed stay resumable
    version = f"{PREP_VERSION}/min_tokens={min_tokens}"
    if excise_spans:
        version += "/excise=1"
    return run_partitioned(pipeline, list(input_paths), out_dir,
                           files_per_partition=files_per_partition,
                           version=version)

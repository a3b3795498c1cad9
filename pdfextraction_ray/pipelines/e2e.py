"""The composed end-to-end curation job (VERDICT r4 #8): parse -> quality
-> language ID -> exact dedup -> minhash near-dup drop -> duplicated-span
excision -> split -> chunk -> sequence pack, as ONE Ray Data graph from a
raw pages corpus to packed training chunks — the RefinedWeb/Lee-et-al prep
order assembled from this engine's stages so the composed path (not just
its stages) has a tracked bench number.

Scale shape (each stage keeps the 100-TB discipline of its standalone
operator — nothing corpus-sized ever lands on the driver):
  - exact-dedup winners ride as a dataset build side
    (``BucketedBuildSide.from_dataset`` inside ``bucketed_join``);
  - the near-dup drop set is result-sized but still probed through the
    size-gated ``int_keys_membership`` (sorted broadcast under the gate,
    distributed bloom + bucketed verify above);
  - duplicated-gram membership reuses ``dup_gram_membership_ds`` verbatim;
  - packing is per (split, pack_bucket) group — P independent first-fit
    packers, boundary waste <= 1 sequence per group, no global sort.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import dedup as D
from ..functions import text as TX
from ..functions.joins import (KEY_BROADCAST_MAX, bucketed_join,
                               int_keys_membership, key_hash_u64)
from ..queries_training import SEQ_BUDGET
from .training_prep import _assign_split, _chunk_batch, _quality

PACK_BUCKETS = 32
# seq_id = pack_bucket * 2^40 + local sequence index within the bucket.
# 2^40 sequences/bucket at >= 1 token each bounds a bucket at ~10^12
# tokens — far above any per-bucket share of a 100-TB corpus.
_SEQ_BUCKET_SHIFT = 40


def _score_pass(t: pa.Table, min_tokens: int,
                lang: Optional[str]) -> pa.Table:
    """Quality + langid + hash, NARROW output (text never shuffles)."""
    t = _quality(t, min_tokens)
    t = TX.language_id_batch(t)
    if lang is not None:
        t = t.filter(pc.equal(t["pred_lang"], pa.scalar(lang)))
    t = D.md5_hex_batch(t)
    return t.select(["text_hash", "doc_id"])


def near_dup_drop_membership(docs_ds: "Any",
                             broadcast_max: int = KEY_BROADCAST_MAX):
    """MinHash-LSH verified near-dup pairs -> membership over the DROPPED
    ids (the larger doc_id of every verified pair; the smaller one
    survives unless it is itself some pair's doc_b). Returns
    ``membership(int64[]) -> bool[]`` or ``None`` when no near-dups.

    ``docs_ds`` must be (doc_id, text). The pair stream is result-sized;
    the distinct-ification is a groupby on it, never a driver collect."""
    from ..queries import minhash_verified_pairs_ds

    pairs = minhash_verified_pairs_ds(docs_ds)
    if pairs is None:
        return None
    pairs = pairs.materialize()  # result-sized
    if pairs.count() == 0:
        return None

    def drop_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_b" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.table({"doc_id": t.column("doc_b").cast(pa.int64())})

    from ..functions.joins import hash_groupby_table
    dropped = hash_groupby_table(
        pairs.map_batches(drop_ids, batch_format="pyarrow"),
        "doc_id", [], count_col="n") \
        .map_batches(lambda t: t.select(["doc_id"]),
                     batch_format="pyarrow")
    return int_keys_membership(dropped, "doc_id",
                               broadcast_max=broadcast_max)


def _pack_group(g: pa.Table) -> pa.Table:
    """First-fit packing of one (split, pack_bucket) group: chunks in
    (doc_id, chunk_id) order accumulate into SEQ_BUDGET-token sequences."""
    if g.num_rows == 0:
        return g.append_column("seq_id", pa.array([], pa.int64()))
    idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending"),
                                        ("chunk_id", "ascending")])
    g = g.take(idx)
    n = g.column("n_tokens").to_numpy(zero_copy_only=False)
    prev = np.concatenate(([0], np.cumsum(n)[:-1]))
    local = prev // SEQ_BUDGET
    bucket = int(g.column("pack_bucket")[0].as_py())
    seq = (np.int64(bucket) << np.int64(_SEQ_BUCKET_SHIFT)) + local
    return g.append_column("seq_id", pa.array(seq, pa.int64()))


def curate_chunks_packed(docs_ds: "Any", *, min_tokens: int = 50,
                         lang: Optional[str] = None,
                         near_dup: bool = True, excise: bool = True,
                         n_buckets: int = 64,
                         pack_buckets: int = PACK_BUCKETS,
                         checkpoint: bool = True) -> "Any":
    """(doc_id, source, text) Dataset -> packed training chunks
    (doc_id, chunk_id, n_tokens, chunk_text, split, pack_bucket, seq_id).

    ``checkpoint=True`` materializes the deduped ``kept`` stream once in
    the object store: the near-dup stage consumes it twice and the gram +
    chunk stages once more, and re-executing an upstream parse 4x costs
    far more than holding the narrow text-only stream (which the object
    store spills to disk under pressure). ``checkpoint=False`` keeps the
    fully-lazy lineage-re-execution behavior (the knob a cluster whose
    aggregate store cannot hold the text column would set)."""

    def quality_only(t: pa.Table) -> pa.Table:
        t = _quality(t, min_tokens)
        t = TX.language_id_batch(t)
        if lang is not None:
            t = t.filter(pc.equal(t["pred_lang"], pa.scalar(lang)))
        return t.select(["doc_id", "source", "text"])

    from ..functions.joins import hash_groupby_agg
    winners_ds = hash_groupby_agg(
        docs_ds.map_batches(lambda t: _score_pass(t, min_tokens, lang),
                            batch_format="pyarrow"),
        "text_hash", "doc_id", agg="min") \
        .map_batches(lambda t: t.select(["doc_id"]),
                     batch_format="pyarrow")

    kept = bucketed_join(
        docs_ds.map_batches(quality_only, batch_format="pyarrow"),
        winners_ds, probe_key="doc_id", build_key="doc_id",
        value_cols=[], join_type="inner", n_buckets=n_buckets)
    if checkpoint and (near_dup or excise):
        kept = kept.materialize()

    if near_dup:
        # NEGATIVE RESULT (r5): precomputing the LSH band keys into the
        # checkpoint to skip the near-dup stage's second signature pass
        # measured NEUTRAL-to-worse — the signature math is only ~1.7 s of
        # spread CPU at 200k docs, below the noise of the extra map stage
        # (minhash_verified_pairs_ds still honors a precomputed ``bands``
        # column for callers that already carry one)
        drop_member = near_dup_drop_membership(
            kept.select_columns(["doc_id", "text"]))
        if drop_member is not None:
            def drop_near_dups(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                return t.filter(pa.array(~drop_member(ids)))
            kept = kept.map_batches(drop_near_dups, batch_format="pyarrow")

    if excise:
        from ..queries_web import (DUP_GRAM_BROADCAST_MAX,
                                   dup_gram_membership_ds, excised_text)
        membership = dup_gram_membership_ds(kept, DUP_GRAM_BROADCAST_MAX)

        def excise_stage(t: pa.Table) -> pa.Table:
            clean, _n_removed, _n_win = excised_text(t, membership)
            idx = t.schema.get_field_index("text")
            return t.set_column(idx, "text", pa.array(clean, pa.string()))

        kept = kept.map_batches(excise_stage, batch_format="pyarrow")

    def add_pack_bucket(t: pa.Table) -> pa.Table:
        b = (key_hash_u64(t.column("doc_id"))
             % np.uint64(pack_buckets)).astype(np.int64)
        return t.append_column("pack_bucket", pa.array(b, pa.int64()))

    chunks = kept.map_batches(_assign_split, batch_format="pyarrow") \
        .map_batches(_chunk_batch, batch_format="pyarrow") \
        .map_batches(add_pack_bucket, batch_format="pyarrow")
    # hash-shuffled group apply over the chunk stream (millions of rows —
    # Ray's sort groupby runs ~100k rows/s on it); 3 splits x pack_buckets
    # groups, each packed by one task
    from ..functions.joins import hash_group_apply
    return hash_group_apply(
        chunks, ["split", "pack_bucket"], _pack_group,
        n_buckets=min(32, 3 * pack_buckets),
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("chunk_id", pa.int64()),
                              ("n_tokens", pa.int64()),
                              ("chunk_text", pa.string()),
                              ("split", pa.string()),
                              ("pack_bucket", pa.int64()),
                              ("seq_id", pa.int64())]))


def _pages_to_docs(t: pa.Table) -> pa.Table:
    """Parse envelope -> (doc_id, source, text) for curation. doc_id is the
    64-bit url hash (int64 view): at 10^9 docs the expected number of
    birthday collisions is n^2/2^65 ~= 0.03 — a collision merges two docs
    into one dedup winner, an accepted bound at this id width. Failed
    parses are dropped (parse_ok=False rows carry no text)."""
    t = t.filter(t.column("parse_ok"))
    ids = key_hash_u64(t.column("url")).view(np.int64)
    from ..stages.skew import add_domain_and_salt
    dom = add_domain_and_salt(t.select(["url"])).column("domain")
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "source": dom,
                     "text": t.column("extracted_text")})


def curation_e2e_pages(paths: Union[str, list[str]],
                       out_dir: Optional[str] = None, *,
                       min_tokens: int = 50, lang: Optional[str] = None,
                       **kw) -> "Any":
    """Raw pages parquet -> parse (html dies at this stage) -> composed
    curation -> packed chunks; with ``out_dir``, also writes parquet
    partitioned by split (resumable layout: one directory per split, many
    shards each)."""
    import ray.data as rd

    from .extract_pipeline import parse_pages

    ds = rd.read_parquet(paths if isinstance(paths, list) else [paths])
    docs = parse_pages(ds).map_batches(_pages_to_docs,
                                       batch_format="pyarrow")
    if kw.get("checkpoint", True):
        # the winner pass and the probe pass both consume docs; one parse
        # of the raw html instead of two (the narrow text-only stream is
        # what gets held — html died at the parse stage)
        docs = docs.materialize()
    packed = curate_chunks_packed(docs, min_tokens=min_tokens, lang=lang,
                                  **kw)
    if out_dir is not None:
        import shutil as _sh
        for d in (os.listdir(out_dir) if os.path.isdir(out_dir) else ()):
            if d.startswith("split="):
                _sh.rmtree(os.path.join(out_dir, d), ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        packed.write_parquet(out_dir, partition_cols=["split"])
    return packed

"""Training-data curation pipeline over a documents table: quality filter ->
language ID -> exact dedup (canonical doc per distinct text) in ONE streaming
graph — the standard pre-training data path (quality/langid/dedup) built from
this engine's text kernels.

Stages:
  1. quality signals (integer columns, vectorized regex kernels)
  2. filter: n_tokens >= min_tokens and punctuation ratio <= 10%
  3. language ID (trigram heuristic + CJK ratio)
  4. exact dedup: md5(text) -> groupby(hash) -> keep the min-doc_id row
     (the D1 hash-partition + per-group-first pattern, reference
     services/result_merger.py:100-118 at corpus scale)

Output: curated (doc_id, n_tokens, pred_lang). SQL-expressible end-to-end
except pred_lang, so the oracle checks doc_id/n_tokens.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import dedup as D
from ..functions import text as TX


def curate_documents(ds: "Any", *, min_tokens: int = 50) -> "Any":
    """documents(doc_id, text) -> curated Dataset(doc_id, n_tokens, pred_lang).
    One wide shuffle (groupby text_hash); everything else per-batch."""

    def score_and_hash(t: pa.Table) -> pa.Table:
        t = TX.quality_columns(t)
        keep = pc.and_(
            pc.greater_equal(t["n_tokens"], pa.scalar(min_tokens, pa.int64())),
            pc.less_equal(pc.multiply(t["n_punct"], pa.scalar(10, pa.int64())),
                          t["n_chars_utf8"]))
        t = t.filter(keep)
        t = TX.language_id_batch(t)
        t = D.md5_hex_batch(t)
        return t.select(["doc_id", "n_tokens", "pred_lang", "text_hash"])

    def first_per_hash(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        return g.take(idx[:1])

    from ..functions.joins import hash_group_apply
    scored = ds.map_batches(score_and_hash, batch_format="pyarrow")
    return hash_group_apply(
        scored, ["text_hash"], first_per_hash,
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("n_tokens", pa.int64()),
                              ("pred_lang", pa.string()),
                              ("text_hash", pa.string())]))\
        .select_columns(["doc_id", "n_tokens", "pred_lang"])

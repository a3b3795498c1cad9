"""Preview / routing projections (SURVEY §2.2 M20-M22, §2.6 O5).

- :func:`page_thumbnails` — per-page preview rows: first-200-char text
  preview, word count, has-tables flag (reference
  services/multipage_processor.py:19-42), as a cheap ``map_batches``
  projection + ``limit`` — never a full materialization.
- :func:`detect_potential_tables_text` — the text-only table sniff: >=3 lines
  with >=3 whitespace-separated tokens (services/multipage_processor.py:171-181),
  used as a routing predicate column.
- :func:`calibration_sample` — the validation-page pick
  (services/multipage_processor.py:44-70): deterministic ``limit`` or seeded
  ``random_sample`` split for parser calibration.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

PREVIEW_CHARS = 200


def detect_potential_tables_text(text: str) -> bool:
    """>=3 lines having >=3 whitespace tokens (M21)."""
    hits = 0
    for line in text.split("\n"):
        if len(line.split()) >= 3:
            hits += 1
            if hits >= 3:
                return True
    return False


def _thumb_batch(batch: pa.Table, text_col: str) -> pa.Table:
    col = batch.column(text_col)
    preview = pc.utf8_slice_codeunits(col, 0, PREVIEW_CHARS)
    n_words = pc.count_substring_regex(col, r"\S+")
    has_tables = pa.array([detect_potential_tables_text(t or "")
                           for t in col.to_pylist()], pa.bool_())
    keep = [c for c in ("url", "doc_kind", "classification") if c in batch.column_names]
    out = batch.select(keep)
    out = out.append_column("text_preview", preview)
    out = out.append_column("n_words_preview", pc.cast(n_words, pa.int32()))
    return out.append_column("has_tables", has_tables)


def page_thumbnails(ds: "Any", *, text_col: str = "extracted_text",
                    limit: int | None = None) -> "Any":
    out = ds.map_batches(lambda t: _thumb_batch(t, text_col),
                         batch_format="pyarrow")
    return out.limit(limit) if limit else out


def calibration_sample(ds: "Any", *, n: int = 1, fraction: float | None = None,
                       seed: int = 7) -> "Any":
    """O5: pick calibration rows — first-n (deterministic) or a seeded
    fraction sample."""
    if fraction is not None:
        return ds.random_sample(fraction, seed=seed)
    return ds.limit(n)

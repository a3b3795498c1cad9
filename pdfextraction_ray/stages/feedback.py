"""Feedback DERIVATION: corrections-as-data -> per-domain parser config
(the learning half of SURVEY §2.3 A8, reference
services/feedback_analyzer.py:14-123).

The reference feeds human corrections plus history through a two-stage LLM
analysis that emits an error taxonomy (field_misassignment | missing_field |
wrong_format | spatial_error | validation_failure) and "enhancement rules"
applied to later extraction prompts. The deterministic engine already has
the APPLICATION half — :class:`stages.overrides.ParserConfigOverrides`
resolved per domain at parse time (stages/parse.py `_domain_config`). This
module supplies the DERIVATION half: a grouped Ray-Data pipeline over a
corrections table that classifies each correction into the same taxonomy
(made deterministic) and compiles systematic per-domain error patterns into
parser-parameter overrides — corrections land as data and BECOME config,
closing the reference's correct-and-refine loop without an LLM.

Corrections table contract (one row per human-corrected value):
  url: string        the corrected document
  field: string      field name (or 'extracted_text' for whole-text fixes)
  expected: string   what the human says the value is
  got: string|null   what the engine extracted (null/'' = nothing)
  doc_kind: string   optional; 'words' | 'html' (routes which knob to turn)

Deterministic error taxonomy (the reference's, minus the LLM):
  truncated_value   got is a strict prefix of expected -> the proximity
                    clustering split the value cluster too early
                    (reference 'spatial_error')
  merged_value      got strictly extends expected -> clustering glued a
                    neighboring cluster onto the value
                    ('field_misassignment')
  missing_value     got empty, expected non-empty ('missing_field'; for
                    html docs: the main-content filter dropped it)
  wrong_value       anything else ('wrong_format' — no parser parameter
                    can fix it; surfaced in the report, not the config)

Rule compilation (per domain, applied only with >= min_support corrections
and a strict majority among the fixable classes):
  truncated_value   proximity_multiplier *= PROXIMITY_STEP  (merge wider)
  merged_value      proximity_multiplier /= PROXIMITY_STEP  (split sooner)
  missing_value     (html) min_text_chars = min(default, shortest missing
                    expected length) — learned FROM the corrections, so a
                    dropped-but-wanted short paragraph clears the bar

The pipeline is corpus-scale-safe: corrections stream through one
vectorized classify pass, collapse to per-batch (domain, error_type)
partial counts plus the tiny per-domain min-expected-length aggregate, and
only the |domains x 4|-sized result reaches the driver.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min, Sum

from .overrides import ParserConfigOverrides

PROXIMITY_STEP = 1.5
ERROR_TYPES = ("truncated_value", "merged_value", "missing_value",
               "wrong_value")


def classify_corrections(batch: pa.Table) -> pa.Table:
    """Vectorized per-correction classification into the error taxonomy.
    Emits (domain, error_type, doc_kind, missing_len) rows; missing_len is
    the expected-value length for missing_value rows (max elsewhere, so a
    grouped Min sees only real misses)."""
    from .skew import add_domain_and_salt
    batch = add_domain_and_salt(batch.select(
        [c for c in batch.column_names if c != "domain"]))
    expected = pc.fill_null(batch.column("expected"), "")
    got = pc.fill_null(batch.column("got"), "")
    e = expected.to_pandas().astype(str)
    g = got.to_pandas().astype(str)
    exp_len = e.str.len().to_numpy()
    got_len = g.str.len().to_numpy()
    # strict-prefix tests, vectorized (np.char.startswith is element-wise
    # over both value arrays)
    ea = e.to_numpy().astype(np.str_)
    ga = g.to_numpy().astype(np.str_)
    got_prefix_of_exp = ((got_len > 0) & (got_len < exp_len)
                         & np.char.startswith(ea, ga))
    exp_prefix_of_got = ((exp_len > 0) & (exp_len < got_len)
                         & np.char.startswith(ga, ea))
    missing = (got_len == 0) & (exp_len > 0)
    same = (e == g).to_numpy()
    error = np.where(same, "no_error",
             np.where(missing, "missing_value",
              np.where(got_prefix_of_exp, "truncated_value",
               np.where(exp_prefix_of_got, "merged_value", "wrong_value"))))
    kind = (batch.column("doc_kind").to_pandas().astype(str).to_numpy()
            if "doc_kind" in batch.column_names
            else np.full(len(e), "words", dtype=object))
    missing_len = np.where(missing, exp_len, np.iinfo(np.int64).max)
    keep = ~same
    return pa.table({
        "domain": batch.column("domain").filter(pa.array(keep)),
        "error_type": pa.array(error[keep], pa.string()),
        "doc_kind": pa.array(kind[keep], pa.string()),
        "missing_len": pa.array(missing_len[keep], pa.int64()),
        "n": pa.array(np.ones(int(keep.sum()), dtype=np.int64))})


def correction_report(corrections: "rd.Dataset") -> pa.Table:
    """(domain, doc_kind, error_type, n, min_missing_len) — the distributed
    aggregate the rule compiler (and a human) reads. Result-sized."""
    classified = corrections.map_batches(classify_corrections,
                                         batch_format="pyarrow")
    agg = classified.groupby(["domain", "doc_kind", "error_type"]).aggregate(
        Sum("n", alias_name="n"),
        Min("missing_len", alias_name="min_missing_len"))
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return t.sort_by([("domain", "ascending"), ("doc_kind", "ascending"),
                      ("error_type", "ascending")])


def derive_overrides(corrections: "rd.Dataset", *,
                     defaults: Optional[dict[str, Any]] = None,
                     min_support: int = 2,
                     ) -> tuple[ParserConfigOverrides, pa.Table, list[dict]]:
    """Compile a corrections Dataset into per-domain parser overrides.

    Returns (overrides, report, audit). ``defaults`` seed the returned
    :class:`ParserConfigOverrides` and the step arithmetic; re-running on a
    later corrections round with the previous result's params as defaults
    compounds the learning (the reference's feedback-history accumulation,
    feedback_analyzer.py '_format_feedback_history').

    ``audit`` is the before/after lineage of every derived rule — one dict
    per (domain, param) with the prior value, the new value, the supporting
    correction count and the error-type evidence. It mirrors the
    reference's per-correction feedback history record (storage.py:47-57:
    step / user_feedback / result_before / result_after / iteration) at
    rule granularity, and persists into a run manifest via
    :func:`pdfextraction_ray.state.manifest.write_feedback_audit` so a user
    auditing why a domain's output changed can trace the derivation.
    """
    defaults = dict(defaults or {"proximity_multiplier": 2.0,
                                 "min_text_chars": 25})
    report = correction_report(corrections)
    df = report.to_pandas()
    by_domain: dict[str, dict[str, Any]] = {}
    audit: list[dict[str, Any]] = []
    for domain, grp in df.groupby("domain", sort=True):
        params: dict[str, Any] = {}
        # proximity clustering only exists on the words path — html
        # corrections must not turn the words knob (doc_kind routes which
        # knob each error class may touch)
        wgrp = grp[grp.doc_kind == "words"]
        counts = wgrp.groupby("error_type").n.sum()
        trunc = int(counts.get("truncated_value", 0))
        merged = int(counts.get("merged_value", 0))
        fixable = trunc + merged
        if fixable >= min_support and trunc != merged:
            base = float(defaults["proximity_multiplier"])
            params["proximity_multiplier"] = (
                base * PROXIMITY_STEP if trunc > merged
                else base / PROXIMITY_STEP)
            audit.append({
                "domain": str(domain), "param": "proximity_multiplier",
                "before": base, "after": params["proximity_multiplier"],
                "support": fixable,
                "basis": (f"truncated_value={trunc} vs merged_value={merged}"
                          f" (majority {'truncated' if trunc > merged else 'merged'})")})
        html_missing = grp[(grp.error_type == "missing_value")
                           & (grp.doc_kind == "html")]
        n_missing = int(html_missing.n.sum())
        if n_missing >= min_support:
            shortest = int(html_missing.min_missing_len.min())
            if shortest < int(defaults["min_text_chars"]):
                params["min_text_chars"] = max(1, shortest)
                audit.append({
                    "domain": str(domain), "param": "min_text_chars",
                    "before": int(defaults["min_text_chars"]),
                    "after": params["min_text_chars"],
                    "support": n_missing,
                    "basis": (f"missing_value(html)={n_missing}, shortest "
                              f"missing expected len={shortest}")})
        if params:
            by_domain[domain] = params
    return ParserConfigOverrides(by_domain, defaults=defaults), report, audit

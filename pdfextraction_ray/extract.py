"""Deterministic replacements for the reference's three LLM steps over a
word-coordinate page (SURVEY.md §2.3 A3/A4/A5):

- :func:`classify_structure`  — step 1: form | table | mixed, from table-region
  count and field-cluster density (replaces reference
  services/openai_service.py:256-283).
- :func:`infer_schema`        — step 2: names-only structure
  ``{form_fields, tables:[{table_name, headers}], field_type}`` (replaces
  services/openai_service.py:285-355; output shape documented at
  services/openai_service.py:428-486 and in reference documents.json).
- :func:`extract_data`        — step 3: values for every schema field plus all
  table rows (replaces services/openai_service.py:569-686, using the
  coordinate extractor the reference specifies but never wires in —
  SURVEY.md §3.3 note).
- :func:`normalize_form_fields_schema` — the 4-legacy-format normalizer
  (services/openai_service.py:688-718).
- :func:`parse_word_page`     — the hot path: ONE pass computing lines,
  formatted text, field pairs and table regions, shared by all three steps
  (the per-step functions otherwise each re-derive them).

All deterministic, pure Python, per-document; no LLM, no I/O.
"""

from __future__ import annotations

from typing import Any, Optional

from . import geometry as G
from . import table_extract as T

Word = G.Word

# (field_name, value_or_None, line_anchor_y0)
_Pair = tuple[str, Optional[str], float]


def _fold_lines(lines: list[list[Word]],
                multiplier: float = G.PROXIMITY_MULTIPLIER,
                ) -> tuple[list[str], list[_Pair]]:
    """One pass over grouped lines producing BOTH the byte-exact formatted
    text lines (identical to geometry.process_multiline_fields) and the
    structured (field, value, line_y) pairs. A pair's value is None exactly
    when the text path prints ``[EMPTY]``. ``multiplier`` is the proximity
    clustering threshold (per-domain override hook, SURVEY §2.3 A8)."""
    formatted: list[str] = []
    pairs: list[_Pair] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        line_y = line[0]["y0"] if line else 0.0
        if G.line_contains_field_patterns(line):
            nxt = lines[i + 1] if i + 1 < n else None
            fc = G.cluster_words_by_proximity(line, multiplier)
            vc = G.cluster_words_by_proximity(nxt, multiplier) if nxt else []
            parts = []
            for text, value, is_field in G.match_field_value_clusters(fc, vc):
                if is_field:
                    # falsy (empty-string) matches render [EMPTY] like missing
                    # ones (reference `if best_value:`), and normalize to None
                    # in pairs so the docstring invariant holds
                    value = value if value else None
                    parts.append(f"{text}{G.FIELD_SEP}"
                                 f"{value if value is not None else G.EMPTY_TOKEN}")
                    pairs.append((text, value, line_y))
                else:
                    parts.append(text)
            formatted.append(G.CLUSTER_JOIN.join(parts))
            if nxt and G.is_value_line_for_fields(line, nxt):
                i += 2
            else:
                i += 1
        else:
            clusters = G.cluster_words_by_proximity(line, multiplier)
            parts = []
            for ci, c in enumerate(clusters):
                if G.is_field_pattern(c):
                    parts.append(G.format_as_field_cluster(c, clusters))
                    value: Optional[str] = None
                    if ci + 1 < len(clusters) and not G.is_field_pattern(clusters[ci + 1]):
                        value = " ".join(w["text"] for w in clusters[ci + 1])
                    pairs.append((" ".join(w["text"] for w in c), value, line_y))
                else:
                    parts.append(" ".join(w["text"] for w in c))
            joined = G.CLUSTER_JOIN.join(parts)
            if joined.strip():
                formatted.append(joined)
            i += 1
    return formatted, pairs


def _classify(regions: list[dict[str, Any]], n_fields: int) -> tuple[str, float]:
    """Deterministic step-1 rule: table regions and no fields -> table;
    fields and no regions -> form; both -> mixed; neither -> form @ 0.3."""
    if regions and n_fields == 0:
        return "table", 0.9
    if n_fields and not regions:
        return "form", 0.9
    if regions and n_fields:
        return "mixed", 0.75
    return "form", 0.3


def _fields_outside_regions(pairs: list[_Pair],
                            regions: list[dict[str, Any]]) -> int:
    spans = [(r["bbox"][1], r["bbox"][3]) for r in regions]
    return sum(1 for _, _, y in pairs
               if not any(lo <= y <= hi for lo, hi in spans))


def parse_word_page(words: list[Word],
                    proximity_multiplier: float = G.PROXIMITY_MULTIPLIER,
                    ) -> dict[str, Any]:
    """The one-pass step-1+2+3 pipeline for a page. Returns
    ``{extracted_text, classification, confidence, schema, extracted_data,
    table_data, regions, pairs}``. A non-default ``proximity_multiplier``
    (per-domain config override, A8) changes word clustering; the default is
    the byte-identity contract."""
    if not words:
        schema = {"form_fields": [], "tables": [], "field_type": "form"}
        return {"extracted_text": "", "classification": "form", "confidence": 0.3,
                "schema": schema, "extracted_data": {}, "table_data": [],
                "regions": [], "pairs": []}
    lines = G.group_words_into_lines(words)
    formatted, pairs = _fold_lines(lines, proximity_multiplier)
    regions = G.identify_table_regions(words, lines)
    n_fields = _fields_outside_regions(pairs, regions)
    cls, conf = _classify(regions, n_fields)

    seen: set[str] = set()
    form_fields: list[str] = []
    for name, _, _y in pairs:
        if name not in seen:
            seen.add(name)
            form_fields.append(name)
    schema = {"form_fields": form_fields,
              "tables": [{"table_name": f"table_{i + 1}",
                          "headers": list(r["headers"])}
                         for i, r in enumerate(regions)],
              "field_type": cls}

    found: dict[str, Optional[str]] = {}
    for name, value, _y in pairs:
        if name not in found or (found[name] is None and value is not None):
            found[name] = value
    extracted = {name: found.get(name) for name in form_fields}

    ordered = G.reading_order(words)
    table_data = []
    for i, tbl in enumerate(schema["tables"]):
        region = regions[i]
        rows = T.extract_table_data(
            ordered, tbl["headers"],
            {"y_min": region["bbox"][1], "y_max": region["bbox"][3]})
        table_data.append({"table_name": tbl["table_name"],
                           "headers": tbl["headers"], "rows": rows})

    return {"extracted_text": G.LINE_JOIN.join(formatted),
            "classification": cls, "confidence": conf, "schema": schema,
            "extracted_data": extracted, "table_data": table_data,
            "regions": regions, "pairs": pairs}


# ---------------------------------------------------------------------------
# step-shaped public wrappers (API parity with the reference's 3 endpoints)
# ---------------------------------------------------------------------------

def extract_field_pairs(words: list[Word]) -> list[tuple[str, Optional[str]]]:
    """All (field, value) pairs of a page in document order, duplicates kept
    (the multi-record merge reduces them — SURVEY §2.5 G5)."""
    if not words:
        return []
    _, pairs = _fold_lines(G.group_words_into_lines(words))
    return [(n, v) for n, v, _y in pairs]


def classify_structure(words: list[Word]) -> dict[str, Any]:
    """Step-1 analogue (see :func:`_classify` for the rule)."""
    page = parse_word_page(words)
    return {
        "classification": page["classification"],
        "confidence": page["confidence"],
        "regions": [{"type": "table",
                     "description": f"table with {r['column_count']} columns",
                     "estimated_bounds": r["bbox"]} for r in page["regions"]],
        "n_field_clusters": _fields_outside_regions(page["pairs"], page["regions"]),
        "n_table_regions": len(page["regions"]),
    }


def infer_schema(words: list[Word]) -> dict[str, Any]:
    """Step-2 analogue: names-only view (form_fields in document order,
    first occurrence wins; tables named ``table_<i>`` with region headers)."""
    return parse_word_page(words)["schema"]


def normalize_form_fields_schema(form_fields: Any) -> dict[str, None]:
    """Normalize the 4 legacy schema formats to ``{name: None}``
    (reference services/openai_service.py:688-718): dict -> keys;
    list[str] -> items; list[{field_name}] / list[{label, ...}] -> the name."""
    out: dict[str, None] = {}
    if isinstance(form_fields, dict):
        for k in form_fields:
            out[str(k)] = None
    elif isinstance(form_fields, list):
        for item in form_fields:
            if isinstance(item, str):
                out[item] = None
            elif isinstance(item, dict):
                name = item.get("field_name") or item.get("label") or item.get("name")
                if name:
                    out[str(name)] = None
    return out


def _match_region_for_table(table: dict[str, Any], regions: list[dict[str, Any]],
                            index: int) -> Optional[dict[str, Any]]:
    """Find the region backing a schema table: exact header-list match first,
    then positional fallback (i-th table -> i-th region)."""
    headers = list(table.get("headers", []))
    for r in regions:
        if list(r["headers"]) == headers:
            return r
    if index < len(regions):
        return regions[index]
    return None


def extract_data(words: list[Word], schema: dict[str, Any]) -> dict[str, Any]:
    """Step-3 analogue driven by an EXTERNAL step-2 schema (the J4 schema-
    joins-row pattern, used by the override path): every schema field gets a
    value or null; every schema table gets rows via coordinate extraction in
    the matching region's y-range.

    Output shape mirrors reference services/openai_service.py:657-669.
    """
    field_names = list(normalize_form_fields_schema(schema.get("form_fields", [])))
    pairs = extract_field_pairs(words)
    found: dict[str, Optional[str]] = {}
    for name, value in pairs:
        if name not in found or (found[name] is None and value is not None):
            found[name] = value
    extracted = {name: found.get(name) for name in field_names}

    regions = G.identify_table_regions(words)
    ordered = G.reading_order(words)
    table_data = []
    for i, tbl in enumerate(schema.get("tables", []) or []):
        headers = list(tbl.get("headers", []))
        region = _match_region_for_table(tbl, regions, i)
        region_arg = ({"y_min": region["bbox"][1], "y_max": region["bbox"][3]}
                      if region else None)
        rows = T.extract_table_data(ordered, headers, region_arg)
        table_data.append({"table_name": tbl.get("table_name", f"table_{i + 1}"),
                           "headers": headers, "rows": rows})

    return {
        "extracted_data": extracted,
        "table_data": table_data,
        "extraction_summary": {
            "fields_extracted": sum(1 for v in extracted.values() if v is not None),
            "fields_total": len(extracted),
            "tables_extracted": len(table_data),
            "rows_extracted": sum(len(t["rows"]) for t in table_data),
        },
    }

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

All deterministic, pure Python, per-document; no LLM, no I/O.
"""

from __future__ import annotations

from typing import Any, Optional

from . import geometry as G
from . import table_extract as T

Word = G.Word


def _field_pairs_for_lines(lines: list[list[Word]]) -> list[tuple[str, Optional[str]]]:
    """Structured mirror of the byte-exact formatting fold
    (geometry.process_multiline_fields): the same control flow, but returning
    (field_name, value_or_None) pairs instead of formatted text. A pair's
    value is None exactly when the text path would print ``[EMPTY]``."""
    pairs: list[tuple[str, Optional[str]]] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if G.line_contains_field_patterns(line):
            nxt = lines[i + 1] if i + 1 < n else None
            fc = G.cluster_words_by_proximity(line)
            vc = G.cluster_words_by_proximity(nxt) if nxt else []
            for text, value, is_field in G.match_field_value_clusters(fc, vc):
                if is_field:
                    pairs.append((text, value))
            if nxt and G.is_value_line_for_fields(line, nxt):
                i += 2
            else:
                i += 1
        else:
            clusters = G.cluster_words_by_proximity(line)
            for ci, c in enumerate(clusters):
                if G.is_field_pattern(c):
                    # same-line pairing: next cluster is the value unless it is
                    # itself a field (geometry.format_as_field_cluster)
                    value: Optional[str] = None
                    if ci + 1 < len(clusters) and not G.is_field_pattern(clusters[ci + 1]):
                        value = " ".join(w["text"] for w in clusters[ci + 1])
                    pairs.append((" ".join(w["text"] for w in c), value))
            i += 1
    return pairs


def extract_field_pairs(words: list[Word]) -> list[tuple[str, Optional[str]]]:
    """All (field, value) pairs of a page in document order, duplicates kept
    (the multi-record merge reduces them — SURVEY §2.5 G5)."""
    if not words:
        return []
    return _field_pairs_for_lines(G.group_words_into_lines(words))


def classify_structure(words: list[Word]) -> dict[str, Any]:
    """Step-1 analogue. Deterministic rule:

    - table regions detected (T7) and no field clusters outside them -> table
    - field clusters and no table regions -> form
    - both -> mixed;   neither -> form with low confidence
    Confidence: 0.9 single-type, 0.75 mixed, 0.3 empty/unknown.
    """
    regions = G.identify_table_regions(words)
    region_spans = [(r["bbox"][1], r["bbox"][3]) for r in regions]

    def in_region(w: Word) -> bool:
        return any(y0 <= w["center_y"] <= y1 for y0, y1 in region_spans)

    outside = [w for w in words if not in_region(w)]
    n_fields = sum(1 for line in G.group_words_into_lines(outside)
                   for c in G.cluster_words_by_proximity(line) if G.is_field_pattern(c))
    if regions and n_fields == 0:
        cls, conf = "table", 0.9
    elif n_fields and not regions:
        cls, conf = "form", 0.9
    elif regions and n_fields:
        cls, conf = "mixed", 0.75
    else:
        cls, conf = "form", 0.3
    return {
        "classification": cls,
        "confidence": conf,
        "regions": [{"type": "table", "description": f"table with {r['column_count']} columns",
                     "estimated_bounds": r["bbox"]} for r in regions],
        "n_field_clusters": n_fields,
        "n_table_regions": len(regions),
    }


def infer_schema(words: list[Word]) -> dict[str, Any]:
    """Step-2 analogue: names-only view.

    - ``form_fields``: field names in document order, first occurrence wins.
    - ``tables``: one entry per detected region, named ``table_<i>`` (document
      order), headers = the region's first-line word texts.
    - ``field_type``: the step-1 classification.
    """
    classification = classify_structure(words)
    seen = set()
    form_fields: list[str] = []
    for name, _ in extract_field_pairs(words):
        if name not in seen:
            seen.add(name)
            form_fields.append(name)
    tables = [{"table_name": f"table_{i + 1}", "headers": list(r["headers"])}
              for i, r in enumerate(G.identify_table_regions(words))]
    return {"form_fields": form_fields, "tables": tables,
            "field_type": classification["classification"]}


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
    """Step-3 analogue, driven by the step-2 schema column (the J4 schema-
    joins-row pattern): every schema field gets a value or null; every schema
    table gets its rows via coordinate column-boundary extraction limited to
    the matching region's y-range.

    Output shape mirrors reference services/openai_service.py:657-669:
    ``{extracted_data: {field: value|None}, table_data: [{table_name, headers,
    rows: [{col: val|None}]}], extraction_summary: {...}}``.
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

"""Multi-record (multi-page) merge: ``groupby(url).map_groups`` over envelope
rows, reproducing the reference merger's semantics (SURVEY §2.5 G5-G9):

- form fields: first non-null value in page order wins; a later non-null
  duplicate flags ``conflict_detected`` and replaces the value only when
  strictly longer. DELIBERATE DIVERGENCE from the reference: the reference's
  longest-wins/conflict logic (services/result_merger.py:93-120) operates on
  one page's dict whose keys are unique, so in practice it never fires and
  the observed behavior is plain ``dict.update`` last-page-wins with
  ``conflict_detected`` never set. We apply the (clearly intended)
  longest-wins rule ACROSS pages and flag real cross-page conflicts —
  semantics the reference describes but cannot reach.
- tables: rows accumulate across pages per table_name, headers from the first
  page, with source_pages / rows_by_page / spans_multiple_pages metadata
  (services/result_merger.py:122-166)
- envelope counters: successful/failed pages, total fields, total rows
  (services/result_merger.py:33-38,84-89)
- anomaly scan: field conflicts + inconsistent row widths in multi-page
  tables (services/result_merger.py:212-244)

The shuffle key is ``url`` — pages of one document co-locate; no global
ordering is needed (ordering is *within* the group, by page_number).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

MERGED_FIELDS_TYPE = pa.list_(pa.struct([
    ("name", pa.string()), ("value", pa.string()),
    ("source_page", pa.int32()), ("conflict_detected", pa.bool_()),
]))
MERGED_TABLES_TYPE = pa.list_(pa.struct([
    ("table_name", pa.string()),
    ("headers", pa.list_(pa.string())),
    ("rows", pa.list_(pa.list_(pa.string()))),
    ("total_rows", pa.int32()),
    ("source_pages", pa.list_(pa.int32())),
    ("rows_by_page", pa.list_(pa.struct([("page", pa.int32()),
                                         ("n_rows", pa.int32())]))),
    ("spans_multiple_pages", pa.bool_()),
]))
ANOMALIES_TYPE = pa.list_(pa.struct([("kind", pa.string()),
                                     ("subject", pa.string()),
                                     ("detail", pa.string())]))

MERGED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("total_pages", pa.int32()),
    ("successful_pages", pa.int32()),
    ("failed_pages", pa.int32()),
    ("total_fields_extracted", pa.int32()),
    ("total_table_rows", pa.int32()),
    ("merged_fields", MERGED_FIELDS_TYPE),
    ("merged_tables", MERGED_TABLES_TYPE),
    ("anomalies", ANOMALIES_TYPE),
])


def merge_url_group(group: pa.Table) -> pa.Table:
    """Merge all envelope rows of one url (one pa.Table group in, one-row
    pa.Table out). Expects columns: url, page_number, parse_ok, fields,
    tables."""
    rows = group.sort_by("page_number").to_pylist()
    url = rows[0]["url"]

    fields: dict[str, dict[str, Any]] = {}
    tables: dict[str, dict[str, Any]] = {}
    table_order: list[str] = []
    ok = failed = total_fields = 0

    for rec in rows:
        page = int(rec.get("page_number") or 0)
        if not rec.get("parse_ok", True):
            failed += 1
            continue
        ok += 1
        page_fields = rec.get("fields") or []
        total_fields += len(page_fields)
        for f in page_fields:
            name, value = f["name"], f["value"]
            if value is None or not str(value).strip():
                continue
            if name in fields:
                cur = fields[name]
                if len(str(value)) > len(str(cur["value"])):
                    fields[name] = {"name": name, "value": value,
                                    "source_page": page, "conflict_detected": True}
                else:
                    cur["conflict_detected"] = True
            else:
                fields[name] = {"name": name, "value": value,
                                "source_page": page, "conflict_detected": False}
        for t in rec.get("tables") or []:
            tname = t["table_name"] or f"Table_{len(tables) + 1}"
            if tname not in tables:
                tables[tname] = {"table_name": tname,
                                 "headers": list(t["headers"] or []),
                                 "rows": [], "source_pages": [], "rows_by_page": []}
                table_order.append(tname)
            page_rows = [list(r) for r in (t["rows"] or [])]
            tables[tname]["rows"].extend(page_rows)
            tables[tname]["source_pages"].append(page)
            tables[tname]["rows_by_page"].append({"page": page,
                                                  "n_rows": len(page_rows)})

    merged_tables = []
    anomalies: list[dict[str, str]] = []
    for tname in table_order:
        t = tables[tname]
        spans = len(t["source_pages"]) > 1
        merged_tables.append({
            "table_name": tname, "headers": t["headers"], "rows": t["rows"],
            "total_rows": len(t["rows"]),
            "source_pages": sorted(t["source_pages"]),
            "rows_by_page": t["rows_by_page"],
            "spans_multiple_pages": spans,
        })
        if spans:
            widths = {len(r) for r in t["rows"]}
            if len(widths) > 1:
                anomalies.append({"kind": "table_anomaly", "subject": tname,
                                  "detail": f"row widths vary: {sorted(widths)}"})
    for name, f in fields.items():
        if f["conflict_detected"]:
            anomalies.append({"kind": "field_conflict", "subject": name,
                              "detail": "multiple values across pages; longest kept"})

    out = {
        "url": [url],
        "total_pages": [len(rows)],
        "successful_pages": [ok],
        "failed_pages": [failed],
        "total_fields_extracted": [total_fields],
        "total_table_rows": [sum(len(t["rows"]) for t in tables.values())],
        "merged_fields": [[fields[n] for n in fields]],
        "merged_tables": [merged_tables],
        "anomalies": [anomalies],
    }
    return pa.Table.from_pydict(
        {k: pa.array(v, type=MERGED_SCHEMA.field(k).type) for k, v in out.items()},
        schema=MERGED_SCHEMA)


CLEAN_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("extracted_fields", pa.list_(pa.struct([("name", pa.string()),
                                             ("value", pa.string())]))),
    ("extracted_tables", pa.list_(pa.struct([
        ("table_name", pa.string()), ("headers", pa.list_(pa.string())),
        ("data", pa.list_(pa.list_(pa.string()))), ("total_rows", pa.int32())]))),
    ("total_fields", pa.int32()),
    ("total_tables", pa.int32()),
    ("total_table_rows", pa.int32()),
    ("successful_pages", pa.int32()),
    ("failed_pages", pa.int32()),
])


def clean_final_view(batch: pa.Table) -> pa.Table:
    """Project merged rows to the clean user-facing output (the analogue of
    reference services/result_merger.py:168-210 create_final_json_output):
    conflict/source metadata stripped, per-doc processing summary kept."""
    rows = batch.to_pylist()
    out: dict[str, list] = {name: [] for name in CLEAN_SCHEMA.names}
    for r in rows:
        fields = [{"name": f["name"], "value": f["value"]}
                  for f in (r.get("merged_fields") or [])]
        tables = [{"table_name": t["table_name"], "headers": list(t["headers"]),
                   "data": [list(row) for row in t["rows"]],
                   "total_rows": len(t["rows"])}
                  for t in (r.get("merged_tables") or [])]
        out["url"].append(r["url"])
        out["extracted_fields"].append(fields)
        out["extracted_tables"].append(tables)
        out["total_fields"].append(len(fields))
        out["total_tables"].append(len(tables))
        out["total_table_rows"].append(sum(t["total_rows"] for t in tables))
        out["successful_pages"].append(r.get("successful_pages", 0))
        out["failed_pages"].append(r.get("failed_pages", 0))
    return pa.Table.from_pydict(
        {k: pa.array(v, CLEAN_SCHEMA.field(k).type) for k, v in out.items()},
        schema=CLEAN_SCHEMA)


def merge_pages_by_url(ds: "Any") -> "Any":
    """Dataset-level merge: one output row per url. This is the one wide
    (all-to-all) stage of the flagship pipeline; key = url."""
    from ..functions.joins import hash_group_apply
    return hash_group_apply(ds, ["url"], merge_url_group,
                            out_schema=CLEAN_SCHEMA)

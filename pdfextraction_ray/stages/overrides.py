"""Human-correction overrides as data (SURVEY §2.4 J5, §2.11, A8 mapping).

The reference lets a human validate/override the step-2 schema per document
(``step2_validated_json`` preferred over the computed result, app.py:822) and
feeds freeform feedback through an LLM to adjust extraction (A8). At corpus
scale both become *columns joined to rows*, never code changes:

- :func:`apply_schema_overrides` — coalesce a small url->schema override map
  (broadcast via ``ray.put``) over the computed ``schema`` column; overridden
  rows re-extract against the new schema.
- :class:`ParserConfigOverrides` — per-domain parser-parameter overrides
  (thresholds, blocklists) resolved at parse time: the deterministic
  equivalent of A8's "enhanced instructions", versioned as config.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import ray

from .. import extract as X
from ..payload import KIND_WORDS, decode_words, payload_kind
from .parse import FIELDS_TYPE, SCHEMA_TYPE, TABLES_TYPE, _rows_to_lists


class SchemaOverrideApplier:
    """Actor stage: rows whose url has an override get the override schema and
    a fresh step-3 extraction against it; all other rows pass through
    untouched. Needs the raw payload column (run before the payload is
    dropped, or on a re-read of the affected partitions)."""

    def __init__(self, overrides_ref):
        self.overrides: dict[str, dict[str, Any]] = ray.get(overrides_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hit_idx = [i for i, u in enumerate(urls) if u in self.overrides]
        if not hit_idx:
            return batch
        schemas = batch.column("schema").to_pylist()
        fields = batch.column("fields").to_pylist()
        tables = batch.column("tables").to_pylist()
        validated = ([False] * batch.num_rows
                     if "schema_validated" not in batch.column_names
                     else batch.column("schema_validated").to_pylist())
        payloads = batch.column("html").to_pylist()
        for i in hit_idx:
            override = self.overrides[urls[i]]
            schemas[i] = {"form_fields": list(override.get("form_fields", [])),
                          "tables": [{"table_name": t["table_name"],
                                      "headers": list(t["headers"])}
                                     for t in override.get("tables", [])],
                          "field_type": override.get("field_type", "unknown")}
            validated[i] = True
            payload = payloads[i]
            if payload and payload_kind(payload) == KIND_WORDS:
                words = decode_words(payload)
                step3 = X.extract_data(words, schemas[i])
                fields[i] = [{"name": k, "value": v}
                             for k, v in step3["extracted_data"].items()]
                tables[i] = [{"table_name": t["table_name"],
                              "headers": t["headers"],
                              "rows": _rows_to_lists(t["rows"], t["headers"])}
                             for t in step3["table_data"]]

        def put(name: str, values: list, typ) -> None:
            nonlocal batch
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name,
                                         pa.array(values, typ))
            else:
                batch = batch.append_column(name, pa.array(values, typ))

        put("schema", schemas, SCHEMA_TYPE)
        put("fields", fields, FIELDS_TYPE)
        put("tables", tables, TABLES_TYPE)
        put("schema_validated", validated, pa.bool_())
        return batch


def apply_schema_overrides(ds: "Any", overrides: dict[str, dict[str, Any]],
                           *, batch_size: int = 64,
                           concurrency: Any = (1, 4)) -> "Any":
    """Broadcast the (small) override map once and coalesce it over the
    Dataset. ``overrides`` maps url -> step-2-shaped schema dict."""
    ref = ray.put(dict(overrides))
    return ds.map_batches(SchemaOverrideApplier,
                          fn_constructor_kwargs={"overrides_ref": ref},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


class ParserConfigOverrides:
    """Per-domain parser parameter resolution (A8 -> config, §2.11): a small
    domain->params map consulted at parse time. Unknown domains get defaults.

    Example params: {"proximity_multiplier": 2.5, "min_text_chars": 40}.
    """

    def __init__(self, by_domain: dict[str, dict[str, Any]],
                 defaults: dict[str, Any] | None = None):
        self.by_domain = dict(by_domain)
        self.defaults = dict(defaults or {"proximity_multiplier": 2.0,
                                          "min_text_chars": 25})

    def resolve(self, domain: str) -> dict[str, Any]:
        merged = dict(self.defaults)
        merged.update(self.by_domain.get(domain, {}))
        return merged

"""The flagship parse stage: one actor-pool ``map_batches`` transform that
turns raw page rows (url, warc_ts, html-binary, text, lang) into the fixed
Arrow output envelope (SURVEY.md §7.1).

Design notes (Ray-Data-first):
- Stateful actor class: payload decoders, the HTML extractor (compiled
  regexes/blocklists) and parser config are built once per actor in
  ``__init__`` (SURVEY §2.3 A1), then applied per batch in ``__call__``.
- ``batch_format="pyarrow"`` + ``zero_copy_batch=True``: the wide ``html``
  binary column is read zero-copy from the object store and *dropped* here —
  it never flows past this stage (SURVEY §7.5 memory note).
- Per-row failures are captured as ``parse_ok=False`` + ``parse_error`` rows
  (the reference's fallback-response policy, services/openai_service.py:159-197
  — never kill the batch); counters ride as columns for the job-level
  aggregate (SURVEY §2.5 G10).
"""

from __future__ import annotations

from typing import Any, Optional

import pyarrow as pa

from .. import extract as X
from .. import geometry as G
from ..html_extract import HtmlMainContentExtractor
from ..payload import KIND_HTML, KIND_WORDS, decode_html, decode_words, payload_kind

SCHEMA_TYPE = pa.struct([
    ("form_fields", pa.list_(pa.string())),
    ("tables", pa.list_(pa.struct([("table_name", pa.string()),
                                   ("headers", pa.list_(pa.string()))]))),
    ("field_type", pa.string()),
])
FIELDS_TYPE = pa.list_(pa.struct([("name", pa.string()), ("value", pa.string())]))
TABLES_TYPE = pa.list_(pa.struct([
    ("table_name", pa.string()),
    ("headers", pa.list_(pa.string())),
    ("rows", pa.list_(pa.list_(pa.string()))),
]))
SPANS_TYPE = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64()),
                                 ("kind", pa.string())]))

ENVELOPE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("doc_kind", pa.string()),
    ("classification", pa.string()),
    ("class_confidence", pa.float32()),
    ("schema", SCHEMA_TYPE),
    ("extracted_text", pa.string()),
    ("fields", FIELDS_TYPE),
    ("tables", TABLES_TYPE),
    ("spans", SPANS_TYPE),
    ("parse_ok", pa.bool_()),
    ("parse_error", pa.string()),
    ("n_words", pa.int32()),
    ("bytes_in", pa.int64()),
    ("bytes_out", pa.int64()),
])


def _rows_to_lists(rows: list[dict[str, Optional[str]]],
                   headers: list[str]) -> list[list[Optional[str]]]:
    return [[r.get(h) for h in headers] for r in rows]


_TASK_PARSER: "DocumentParser | None" = None


def parse_batch_task(batch: pa.Table) -> pa.Table:
    """Stateless-task form of the parse stage with a per-worker-process
    cached parser (Ray reuses worker processes, so the warmed state amortizes
    exactly like an actor's — without actor-pool spin-up/ramp cost). Default
    for the flagship pipeline; use the DocumentParser actor-pool form when
    per-stage config or heavyweight state (models) is needed."""
    global _TASK_PARSER
    if _TASK_PARSER is None:
        _TASK_PARSER = DocumentParser()
    return _TASK_PARSER(batch)


class DocumentParser:
    """Parser for both payload kinds (callable-class form for actor pools).

    HTML pages go through the readability-style stripper; word pages go
    through the byte-exact spatial formatter plus the deterministic
    step-1/2/3 analogues. Unknown payloads produce a parse_ok=False row.
    """

    # Reference upload cap is 16 MB (reference config.py:13); word cap bounds
    # the O(n log n + lines*clusters) geometry work per doc (SURVEY §4
    # timeouts row: "cap per-doc work").
    MAX_PAYLOAD_BYTES = 16 * 1024 * 1024
    MAX_WORDS = 200_000

    def __init__(self, min_text_chars: int = 25,
                 proximity_multiplier: float = G.PROXIMITY_MULTIPLIER,
                 max_payload_bytes: int = MAX_PAYLOAD_BYTES,
                 max_words: int = MAX_WORDS,
                 config_overrides: "Any | None" = None,
                 preprocessing_mode: str = "spatial"):
        """``config_overrides``: a :class:`ParserConfigOverrides` (or a plain
        ``{domain: {param: value}}`` dict) consulted per row — the A8
        feedback loop (reference services/feedback_analyzer.py:14-54 applied
        at services/openai_service.py:1006-1248) re-expressed as versioned
        per-domain parser parameters instead of per-call LLM instructions.
        Supported params: ``min_text_chars``, ``max_link_density`` (HTML
        stripper) and ``proximity_multiplier`` (word clustering).

        ``preprocessing_mode`` is the reference's ``original|spatial`` switch
        (app.py:337-352; ``vision`` needs absent codec libraries): "spatial"
        (default) runs the full byte-contract geometry pipeline; "original"
        emits plain reading-order text for word payloads — lines joined by
        newline, words by single spaces, no field/table analysis (the
        reference's original mode feeds raw ``page_data['text']`` downstream
        with no spatial structure)."""
        if preprocessing_mode not in ("spatial", "original"):
            raise ValueError(f"unknown preprocessing_mode {preprocessing_mode!r}"
                             " (use 'spatial' or 'original')")
        self.preprocessing_mode = preprocessing_mode
        self.min_text_chars = min_text_chars
        self.html = HtmlMainContentExtractor(min_text_chars=min_text_chars)
        self.proximity_multiplier = proximity_multiplier
        self.max_payload_bytes = max_payload_bytes
        self.max_words = max_words
        if config_overrides is not None and not hasattr(config_overrides, "resolve"):
            from .overrides import ParserConfigOverrides
            config_overrides = ParserConfigOverrides(
                config_overrides,
                defaults={"proximity_multiplier": proximity_multiplier,
                          "min_text_chars": min_text_chars})
        self.overrides = config_overrides
        self._domain_cache: dict[str, tuple[HtmlMainContentExtractor, float]] = {}

    def _domain_config(self, url: str) -> tuple[HtmlMainContentExtractor, float]:
        """(html extractor, proximity multiplier) for a url's domain —
        resolved once per distinct domain per actor, defaults otherwise."""
        if self.overrides is None:
            return self.html, self.proximity_multiplier
        from .skew import domain_of
        domain = domain_of(url or "")
        hit = self._domain_cache.get(domain)
        if hit is None:
            params = self.overrides.resolve(domain)
            mtc = int(params.get("min_text_chars", self.min_text_chars))
            mld = params.get("max_link_density")
            html = (self.html if mtc == self.min_text_chars and mld is None
                    else HtmlMainContentExtractor(
                        min_text_chars=mtc,
                        **({"max_link_density": mld} if mld is not None else {})))
            hit = (html, float(params.get("proximity_multiplier",
                                          self.proximity_multiplier)))
            # bounded: a web corpus has millions of distinct domains and
            # the worker-process cache lives for the whole run
            if len(self._domain_cache) >= 4096:
                self._domain_cache.pop(next(iter(self._domain_cache)))
            self._domain_cache[domain] = hit
        return hit

    # -- per-document parsers ----------------------------------------------
    def _parse_words_original(self, payload: bytes) -> dict[str, Any]:
        """Original mode: reading-order text, no spatial analysis."""
        words = decode_words(payload)
        if len(words) > self.max_words:
            raise ValueError(f"word count {len(words)} exceeds the "
                             f"{self.max_words}-word per-document cap")
        lines = G.group_words_into_lines(words)
        text = G.LINE_JOIN.join(" ".join(w["text"] for w in ln) for ln in lines)
        spans = []
        pos = 0
        for ln in text.split(G.LINE_JOIN) if text else []:
            spans.append({"start": pos, "end": pos + len(ln), "kind": "line"})
            pos += len(ln) + len(G.LINE_JOIN)
        return {
            "doc_kind": KIND_WORDS,
            "classification": "unclassified",
            "class_confidence": 0.0,
            "schema": {"form_fields": [], "tables": [],
                       "field_type": "unclassified"},
            "extracted_text": text,
            "fields": [], "tables": [], "spans": spans,
            "n_words": len(words),
        }

    def _parse_words(self, payload: bytes,
                     proximity_multiplier: float) -> dict[str, Any]:
        if self.preprocessing_mode == "original":
            return self._parse_words_original(payload)
        words = decode_words(payload)
        if len(words) > self.max_words:
            raise ValueError(f"word count {len(words)} exceeds the "
                             f"{self.max_words}-word per-document cap")
        # one pass for text + all 3 steps
        page = X.parse_word_page(words, proximity_multiplier)
        text = page["extracted_text"]
        # span lineage: one span per formatted line of the byte-exact text
        spans = []
        pos = 0
        for ln in text.split(G.LINE_JOIN) if text else []:
            spans.append({"start": pos, "end": pos + len(ln), "kind": "line"})
            pos += len(ln) + len(G.LINE_JOIN)
        return {
            "doc_kind": KIND_WORDS,
            "classification": page["classification"],
            "class_confidence": page["confidence"],
            "schema": page["schema"],
            "extracted_text": text,
            "fields": [{"name": k, "value": v}
                       for k, v in page["extracted_data"].items()],
            "tables": [{"table_name": t["table_name"], "headers": t["headers"],
                        "rows": _rows_to_lists(t["rows"], t["headers"])}
                       for t in page["table_data"]],
            "spans": spans,
            "n_words": len(words),
        }

    def _parse_html(self, payload: bytes,
                    extractor: HtmlMainContentExtractor) -> dict[str, Any]:
        html = decode_html(payload)
        res = extractor.extract(html)
        tables = res["tables"]
        n_paras = sum(1 for s in res["spans"] if s["kind"] not in
                      ("h1", "h2", "h3", "h4", "h5", "h6"))
        cls = ("table" if tables and not n_paras else
               "mixed" if tables else "form" if not res["extracted_text"] else "article")
        return {
            "doc_kind": KIND_HTML,
            "classification": cls,
            "class_confidence": 0.9 if res["extracted_text"] else 0.3,
            "schema": {"form_fields": [],
                       "tables": [{"table_name": t["table_name"],
                                   "headers": t["headers"]} for t in tables],
                       "field_type": cls},
            "extracted_text": res["extracted_text"],
            "fields": [],
            "tables": [{"table_name": t["table_name"], "headers": t["headers"],
                        "rows": t["rows"]} for t in tables],
            "spans": res["spans"],
            "n_words": len(res["extracted_text"].split()),
        }

    # -- batch transform ----------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        ts = batch.column("warc_ts")
        langs = batch.column("lang")
        payloads = batch.column("html")
        out: dict[str, list] = {name: [] for name in ENVELOPE_SCHEMA.names}
        for i in range(batch.num_rows):
            payload = payloads[i].as_py()
            bytes_in = len(payload) if payload else 0
            try:
                if bytes_in > self.max_payload_bytes:
                    raise ValueError(
                        f"payload {bytes_in} bytes exceeds the "
                        f"{self.max_payload_bytes}-byte cap (reference 16 MB "
                        f"upload limit)")
                html_extractor, proximity = self._domain_config(urls[i].as_py())
                kind = payload_kind(payload) if payload else "empty"
                if kind == KIND_WORDS:
                    rec = self._parse_words(payload, proximity)
                elif kind == KIND_HTML:
                    rec = self._parse_html(payload, html_extractor)
                else:
                    raise ValueError(f"unknown payload kind {payload[:4]!r}"
                                     if payload else "empty payload")
                rec["parse_ok"] = True
                rec["parse_error"] = None
            except Exception as exc:  # per-row failure capture, never batch-fatal
                rec = {"doc_kind": "error", "classification": "unknown",
                       "class_confidence": 0.0,
                       "schema": {"form_fields": [], "tables": [],
                                  "field_type": "unknown"},
                       "extracted_text": "", "fields": [], "tables": [],
                       "spans": [], "n_words": 0,
                       "parse_ok": False, "parse_error": f"{type(exc).__name__}: {exc}"}
            rec["url"] = urls[i].as_py()
            rec["warc_ts"] = ts[i].as_py()
            rec["lang"] = langs[i].as_py()
            rec["bytes_in"] = bytes_in
            rec["bytes_out"] = len(rec["extracted_text"].encode("utf-8"))
            for name in ENVELOPE_SCHEMA.names:
                out[name].append(rec[name])
        arrays = [pa.array(out[name], type=ENVELOPE_SCHEMA.field(name).type)
                  for name in ENVELOPE_SCHEMA.names]
        return pa.Table.from_arrays(arrays, schema=ENVELOPE_SCHEMA)

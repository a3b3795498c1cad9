"""JSON payload robustness functions (SURVEY §2.2 M16-M18, §2.8 F7).

The reference repairs and extracts JSON from LLM responses
(services/openai_service.py:115-220) and builds a minimal fallback result on
parse failure (:159-197). The engine keeps these as scalar string functions:
any pipeline ingesting JSON-ish payloads (crawler metadata, sidecar records)
gets the same repair → extract → fallback ladder, with failures captured
per-row, never batch-fatal.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

_FENCE_RE = re.compile(r"```(?:json)?\s*(\{.*?\})\s*```", re.DOTALL)
_BARE_RE = re.compile(r"\{.*\}", re.DOTALL)
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")


def clean_json_string(s: str) -> str:
    """Repair common truncation damage: strip trailing commas before
    closers, then balance unclosed braces/brackets (M16 semantics)."""
    s = _TRAILING_COMMA_RE.sub(r"\1", s.strip())
    opens = closes = 0
    trailing_comma_fix = True
    sq_opens = sq_closes = 0
    in_str = False
    esc = False
    for ch in s:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
        elif ch == '"':
            in_str = not in_str
        elif not in_str:
            if ch == "{":
                opens += 1
            elif ch == "}":
                closes += 1
            elif ch == "[":
                sq_opens += 1
            elif ch == "]":
                sq_closes += 1
    if in_str:
        s += '"'
        trailing_comma_fix = False
    if trailing_comma_fix:  # bare trailing comma at the truncation point
        s = re.sub(r",\s*$", "", s)
    s += "]" * max(0, sq_opens - sq_closes)
    s += "}" * max(0, opens - closes)
    return s


def extract_json_from_response(content: str) -> Optional[dict[str, Any]]:
    """Three-strategy extraction (M17): fenced ```json block, bare {...}
    span, then repair-and-retry of the bare span. None when nothing parses."""
    if not content:
        return None
    m = _FENCE_RE.search(content)
    candidates = []
    if m:
        candidates.append(m.group(1))
    m2 = _BARE_RE.search(content)
    if m2:
        candidates.append(m2.group(0))
    brace = content.find("{")
    if brace != -1:  # truncated payload: repair from the first brace onward
        candidates.append(content[brace:])
    for cand in candidates:
        for attempt in (cand, clean_json_string(cand)):
            try:
                obj = json.loads(attempt)
                if isinstance(obj, dict):
                    return obj
            except (json.JSONDecodeError, ValueError):
                continue
    return None


def fallback_response(task_type: str, content: str) -> dict[str, Any]:
    """Minimal valid result when extraction fails (M18): classification sniffs
    'form'/'table' keywords; other tasks return empty envelopes."""
    lowered = (content or "").lower()
    if task_type == "classification":
        if "table" in lowered and "form" in lowered:
            cls = "mixed"
        elif "table" in lowered:
            cls = "table"
        else:
            cls = "form"
        return {"classification": cls, "confidence": 0.3,
                "reasoning": "fallback: response was not valid JSON", "regions": []}
    if task_type == "field_identification":
        return {"form_fields": [], "tables": [], "field_type": "unknown"}
    return {"extracted_data": {}, "table_data": [],
            "extraction_summary": {"parse_failed": True}}


def parse_json_or_fallback(content: str, task_type: str = "data_extraction",
                           ) -> tuple[dict[str, Any], bool]:
    """(result, ok): the per-row ladder used inside map_batches."""
    obj = extract_json_from_response(content)
    if obj is not None:
        return obj, True
    return fallback_response(task_type, content), False

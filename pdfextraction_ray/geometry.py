"""Pure layout-geometry core: reading order, line grouping, proximity
clustering, field/value heuristics, field-value pairing, spacing stats and
table-region detection.

These are order- and byte-exact reimplementations of the reference semantics
(see SURVEY.md §2.2 M2-M13, G1, T7):

- reading-order sort             -> reference services/pdf_processor.py:81
- group_words_into_lines         -> reference services/spatial_preprocessor.py:184-223
- cluster_words_by_proximity     -> reference services/spatial_preprocessor.py:255-296
- is_field_pattern (5 rules)     -> reference services/spatial_preprocessor.py:298-347
- is_obvious_value_pattern       -> reference services/spatial_preprocessor.py:349-390
- process_line_for_fields        -> reference services/spatial_preprocessor.py:225-253
- format_as_field_cluster        -> reference services/spatial_preprocessor.py:392-420
- process_multiline_fields       -> reference services/spatial_preprocessor.py:49-85
- line_contains_field_patterns   -> reference services/spatial_preprocessor.py:87-96
- is_value_line_for_fields       -> reference services/spatial_preprocessor.py:98-127
- process_field_line_with_values -> reference services/spatial_preprocessor.py:129-182
- preprocess_document            -> reference services/spatial_preprocessor.py:27-47
- calculate_word_spacing_stats   -> reference services/spatial_preprocessor.py:422-463
- identify_table_regions         -> reference services/spatial_preprocessor.py:465-508
- has_regular_spacing            -> reference services/spatial_preprocessor.py:510-528

Every join constant (clusters joined by four spaces, field separator
``":\\t"``, empty token ``"[EMPTY]"``, lines joined by ``"\\n"``) and every
tolerance (line y-tol 5.0, cluster gap 2.0 x avg, vertical-alignment 30,
field-value x 50, table line gap 20, regular-spacing 10) is part of the
byte-identical ``extracted_text`` contract and must not change.

All functions here are pure Python over small per-document word lists; they
run *inside* ``map_batches`` workers (one call per document), never on the
driver, and never touch Ray.

A "word" is a dict with keys ``text, x0, y0, x1, y1`` plus derived
``center_x, center_y`` (see :func:`derive_word`).
"""

from __future__ import annotations

import math
import re
from functools import lru_cache
from typing import Any, Optional

Word = dict[str, Any]

# Tolerances / constants of the byte-identity contract.
LINE_Y_TOL = 5.0
PROXIMITY_MULTIPLIER = 2.0
VALUE_LINE_ALIGN_TOL = 30.0
FIELD_VALUE_X_TOL = 50.0
TABLE_LINE_GAP = 20.0
REGULAR_SPACING_TOL = 10.0
CLUSTER_JOIN = "    "
FIELD_SEP = ":\t"
EMPTY_TOKEN = "[EMPTY]"
LINE_JOIN = "\n"

# Keyword list driving field detection (reference spatial_preprocessor.py:19-25).
FIELD_KEYWORDS = (
    'name', 'id', 'number', 'no', 'code', 'date', 'time', 'status', 'type',
    'group', 'class', 'category', 'dept', 'department', 'title', 'position',
    'employee', 'emp', 'staff', 'person', 'user', 'customer', 'client',
    'address', 'phone', 'email', 'ssn', 'tax', 'salary', 'rate', 'amount',
    'total', 'sum', 'balance', 'payment', 'account', 'reference', 'ref',
)
FIELD_ENDINGS = (':', '#', 'no', 'id', 'code', 'name', 'date', 'type', 'status', 'group')
COMMON_FIELDS = ('status', 'emp', 'employee', 'position', 'title', 'gender', 'marital',
                 'hire', 'term', 'supervisor', 'department', 'division', 'location')
LAST_FIELD_WORDS = frozenset(
    ['id', 'no', 'type', 'code', 'date', 'status', 'group', 'name', 'title'])

_DATE_RE = re.compile(r'\d{1,2}/\d{1,2}/\d{4}')
_PHONE_RE = re.compile(r'\d{3}-\d{3}-\d{4}')
_SSN_RE = re.compile(r'\d{3}-\d{2}-\d{4}')
_STRIP_NUMERIC = str.maketrans('', '', '.,-/')
# compiled alternations, equivalent to any(k in text for k in LIST) — the
# keyword containment scans dominate is_field_pattern's cost
_KEYWORDS_RE = re.compile("|".join(map(re.escape, FIELD_KEYWORDS)))
_COMMON_FIELDS_RE = re.compile("|".join(map(re.escape, COMMON_FIELDS)))
_ENDINGS_RE = re.compile("(?:" + "|".join(map(re.escape, FIELD_ENDINGS)) + ")$")


def derive_word(text: str, x0: float, y0: float, x1: float, y1: float,
                block_no: int = 0, line_no: int = 0, word_no: int = 0) -> Word:
    """Build a word dict with derived centers (reference pdf_processor.py:64-77)."""
    return {
        "text": text, "x0": x0, "y0": y0, "x1": x1, "y1": y1,
        "center_x": (x0 + x1) / 2, "center_y": (y0 + y1) / 2,
        "width": x1 - x0, "height": y1 - y0,
        "block_no": block_no, "line_no": line_no, "word_no": word_no,
    }


def reading_order(words: list[Word]) -> list[Word]:
    """Stable sort into reading order (y0 then x0) — pdf_processor.py:81."""
    return sorted(words, key=lambda w: (w["y0"], w["x0"]))


def group_words_into_lines(words: list[Word], y_tolerance: float = LINE_Y_TOL) -> list[list[Word]]:
    """Group words whose y0 is within ``y_tolerance`` of the line anchor.

    The anchor is the y0 of the first word that opened the line (not a running
    mean) and words within each line are x0-sorted — both required for byte
    identity with spatial_preprocessor.py:184-223.
    """
    if not words:
        return []
    ordered = reading_order(words)
    lines: list[list[Word]] = []
    current = [ordered[0]]
    anchor_y = ordered[0]["y0"]
    for w in ordered[1:]:
        if abs(w["y0"] - anchor_y) <= y_tolerance:
            current.append(w)
        else:
            current.sort(key=lambda ww: ww["x0"])
            lines.append(current)
            current = [w]
            anchor_y = w["y0"]
    current.sort(key=lambda ww: ww["x0"])
    lines.append(current)
    return lines


def cluster_words_by_proximity(line_words: list[Word],
                               multiplier: float = PROXIMITY_MULTIPLIER) -> list[list[Word]]:
    """Split an x-sorted line where the gap exceeds ``multiplier`` x mean gap
    (spatial_preprocessor.py:255-296). Gaps may be negative (overlaps); the
    mean includes them, exactly as the reference computes it."""
    if len(line_words) <= 1:
        return [line_words]
    gaps = [line_words[i + 1]["x0"] - line_words[i]["x1"] for i in range(len(line_words) - 1)]
    threshold = (sum(gaps) / len(gaps)) * multiplier
    clusters: list[list[Word]] = []
    current = [line_words[0]]
    for i in range(1, len(line_words)):
        if line_words[i]["x0"] - line_words[i - 1]["x1"] <= threshold:
            current.append(line_words[i])
        else:
            clusters.append(current)
            current = [line_words[i]]
    clusters.append(current)
    return clusters


def is_obvious_value_pattern(text: str) -> bool:
    """Value (not label) detector — spatial_preprocessor.py:349-390.

    Order of rules matters: single letter, numeric-after-strip, currency or
    percent, date, phone, SSN, short all-caps code without field keywords.
    """
    text = text.strip()
    if len(text) == 1 and text.isalpha():
        return True
    if text.translate(_STRIP_NUMERIC).isdigit():
        return True
    if text.startswith('$') or text.endswith('%'):
        return True
    if _DATE_RE.match(text):
        return True
    if _PHONE_RE.match(text):
        return True
    if _SSN_RE.match(text):
        return True
    if text.isupper() and len(text) <= 6:
        if not _KEYWORDS_RE.search(text.lower()):
            return True
    return False


def is_field_pattern(cluster: list[Word]) -> bool:
    """Five-rule field-label heuristic — spatial_preprocessor.py:298-347.

    1. contains a field keyword (substring on the lowercased cluster text)
    2. lowercased text ends with a field indicator
    3. >=2 words and >=70% of them Title-case (capitalized, not ALLCAPS)
    4. contains a common-field substring
    5. last word (lowercased) is a field word
    An obvious value pattern vetoes everything first.

    Pure in the cluster's word TEXTS, and label vocabulary repeats massively
    across a web corpus — memoized on the text tuple (per worker process).
    """
    if not cluster:
        return False
    return _is_field_pattern_texts(tuple(w["text"] for w in cluster))


@lru_cache(maxsize=1 << 16)
def _is_field_pattern_texts(texts: tuple) -> bool:
    lowered = " ".join(t.lower() for t in texts)
    original = " ".join(texts)
    if is_obvious_value_pattern(original):
        return False
    if _KEYWORDS_RE.search(lowered):
        return True
    if _ENDINGS_RE.search(lowered):
        return True
    if len(texts) >= 2:
        ntitle = sum(1 for t in texts if t and t[0].isupper() and not t.isupper())
        if ntitle >= len(texts) * 0.7:
            return True
    if _COMMON_FIELDS_RE.search(lowered):
        return True
    parts = original.split()
    if parts and parts[-1].lower() in LAST_FIELD_WORDS:
        return True
    return False


def line_contains_field_patterns(line_words: list[Word]) -> bool:
    """True if any single word of the line is itself a field pattern
    (spatial_preprocessor.py:87-96 — note: word-at-a-time, not cluster)."""
    return any(is_field_pattern([w]) for w in line_words)


def is_value_line_for_fields(field_line: list[Word], value_line: list[Word]) -> bool:
    """Vertical-alignment test: any field word has a value word within 30pt of
    its x-center (spatial_preprocessor.py:98-127)."""
    if not field_line or not value_line:
        return False
    value_xs = [w["center_x"] for w in value_line]
    for fw in field_line:
        fx = fw["center_x"]
        if any(abs(fx - vx) <= VALUE_LINE_ALIGN_TOL for vx in value_xs):
            return True
    return False


def _cluster_text(cluster: list[Word]) -> str:
    return " ".join(w["text"] for w in cluster)


def _cluster_center_x(cluster: list[Word]) -> float:
    return sum(w["center_x"] for w in cluster) / len(cluster)


def match_field_value_clusters(
    field_clusters: list[list[Word]], value_clusters: list[list[Word]],
) -> list[tuple[str, Optional[str], bool]]:
    """Pair each cluster of a field line with the nearest value cluster of the
    line below (x-center distance <= 50pt, min distance wins, clusters that are
    themselves fields rejected) — spatial_preprocessor.py:152-176.

    Returns [(text, value_or_None, is_field)] in cluster order; ``value`` is
    None when the cluster is a field with no matching value (rendered as
    ``[EMPTY]``) or when the cluster is not a field at all.
    """
    out: list[tuple[str, Optional[str], bool]] = []
    for fc in field_clusters:
        if is_field_pattern(fc):
            fx = _cluster_center_x(fc)
            best: Optional[str] = None
            best_d = math.inf
            for vc in value_clusters:
                d = abs(fx - _cluster_center_x(vc))
                if d <= FIELD_VALUE_X_TOL and d < best_d and not is_field_pattern(vc):
                    best = _cluster_text(vc)
                    best_d = d
            out.append((_cluster_text(fc), best, True))
        else:
            out.append((_cluster_text(fc), None, False))
    return out


def process_field_line_with_values(field_line: list[Word],
                                   value_line: Optional[list[Word]] = None) -> str:
    """Format a field line using the line below as the value source
    (spatial_preprocessor.py:129-182)."""
    if not field_line:
        return ""
    field_clusters = cluster_words_by_proximity(field_line)
    value_clusters = cluster_words_by_proximity(value_line) if value_line else []
    parts = []
    for text, value, is_field in match_field_value_clusters(field_clusters, value_clusters):
        if is_field:
            # reference tests `if best_value:` — a falsy (empty-string) match
            # renders [EMPTY], not just a missing one (spatial_preprocessor.py:173)
            parts.append(f"{text}{FIELD_SEP}{value if value else EMPTY_TOKEN}")
        else:
            parts.append(text)
    return CLUSTER_JOIN.join(parts)


def format_as_field_cluster(cluster: list[Word], all_clusters: list[list[Word]]) -> str:
    """Same-line pairing: a field cluster takes the *next* cluster as its value
    unless that cluster is itself a field (spatial_preprocessor.py:392-420)."""
    name = _cluster_text(cluster)
    try:
        idx = all_clusters.index(cluster)
    except ValueError:
        return f"{name}{FIELD_SEP}{EMPTY_TOKEN}"
    if idx < len(all_clusters) - 1:
        nxt = all_clusters[idx + 1]
        if is_field_pattern(nxt):
            return f"{name}{FIELD_SEP}{EMPTY_TOKEN}"
        return f"{name}{FIELD_SEP}{_cluster_text(nxt)}"
    return f"{name}{FIELD_SEP}{EMPTY_TOKEN}"


def process_line_for_fields(line_words: list[Word]) -> str:
    """Per-line formatting when the line has no word-level field patterns
    (spatial_preprocessor.py:225-253)."""
    if not line_words:
        return ""
    clusters = cluster_words_by_proximity(line_words)
    parts = []
    for c in clusters:
        if is_field_pattern(c):
            parts.append(format_as_field_cluster(c, clusters))
        else:
            parts.append(_cluster_text(c))
    return CLUSTER_JOIN.join(parts)


def process_multiline_fields(lines: list[list[Word]]) -> list[str]:
    """Two-line lookahead fold (spatial_preprocessor.py:49-85).

    NOTE a field line always *formats* against the next line's clusters, even
    when that next line fails ``is_value_line_for_fields`` and is therefore
    not consumed — the reference does exactly this, and byte identity requires
    keeping it.
    """
    out: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if line_contains_field_patterns(line):
            nxt = lines[i + 1] if i + 1 < n else None
            out.append(process_field_line_with_values(line, nxt))
            if nxt and is_value_line_for_fields(line, nxt):
                i += 2
            else:
                i += 1
        else:
            formatted = process_line_for_fields(line)
            if formatted.strip():
                out.append(formatted)
            i += 1
    return out


def preprocess_document(words: list[Word]) -> str:
    """Whole-page spatially-formatted text — THE ``extracted_text`` contract
    for word payloads (spatial_preprocessor.py:27-47)."""
    if not words:
        return ""
    return LINE_JOIN.join(process_multiline_fields(group_words_into_lines(words)))


def calculate_word_spacing_stats(words: list[Word]) -> dict[str, float]:
    """Per-document same-line gap stats: mean, median (upper), population std
    (spatial_preprocessor.py:422-463)."""
    if len(words) < 2:
        return {"avg_spacing": 0, "median_spacing": 0, "spacing_std": 0}
    ordered = reading_order(words)
    gaps = []
    for a, b in zip(ordered, ordered[1:]):
        if abs(a["y0"] - b["y0"]) <= 5 and b["x0"] - a["x1"] >= 0:
            gaps.append(b["x0"] - a["x1"])
    if not gaps:
        return {"avg_spacing": 0, "median_spacing": 0, "spacing_std": 0}
    avg = sum(gaps) / len(gaps)
    median = sorted(gaps)[len(gaps) // 2]
    std = math.sqrt(sum((g - avg) ** 2 for g in gaps) / len(gaps))
    return {"avg_spacing": avg, "median_spacing": median, "spacing_std": std}


def has_regular_spacing(x_positions: list[float], tolerance: float = REGULAR_SPACING_TOL) -> bool:
    """x0 gaps all within ``tolerance`` of their mean (spatial_preprocessor.py:510-528)."""
    if len(x_positions) < 3:
        return False
    gaps = [x_positions[i + 1] - x_positions[i] for i in range(len(x_positions) - 1)]
    avg = sum(gaps) / len(gaps)
    return all(abs(g - avg) <= tolerance for g in gaps)


def _table_region_of(table_lines: list[list[Word]]) -> dict[str, Any]:
    """Region descriptor (spatial_preprocessor.py:530-557)."""
    all_words = [w for line in table_lines for w in line]
    return {
        "type": "table",
        "bbox": [min(w["x0"] for w in all_words), min(w["y0"] for w in all_words),
                 max(w["x1"] for w in all_words), max(w["y1"] for w in all_words)],
        "headers": [w["text"] for w in table_lines[0]],
        "row_count": len(table_lines),
        "column_count": len(table_lines[0]),
        "lines": table_lines,
    }


def identify_table_regions(words: list[Word],
                           lines: Optional[list[list[Word]]] = None,
                           ) -> list[dict[str, Any]]:
    """Detect table regions: lines with >=3 regularly-spaced words, grouped
    while consecutive lines are <=20pt apart, kept when >=2 rows
    (spatial_preprocessor.py:465-508). Pass precomputed ``lines`` to avoid
    re-grouping (hot path)."""
    if lines is None:
        lines = group_words_into_lines(words)
    candidates = [ln for ln in lines
                  if len(ln) >= 3 and has_regular_spacing([w["x0"] for w in ln])]
    regions: list[dict[str, Any]] = []
    if not candidates:
        return regions
    current = [candidates[0]]
    for ln in candidates[1:]:
        prev_y = max(w["y1"] for w in current[-1])
        cur_y = min(w["y0"] for w in ln)
        if cur_y - prev_y <= TABLE_LINE_GAP:
            current.append(ln)
        else:
            if len(current) >= 2:
                regions.append(_table_region_of(current))
            current = [ln]
    if len(current) >= 2:
        regions.append(_table_region_of(current))
    return regions

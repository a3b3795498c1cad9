"""Coordinate-driven table extraction: header location, column-boundary
inference by header-midpoint partitioning, row grouping and per-cell word
assignment with closest-column fallback.

Byte/semantics-exact counterpart of the reference extractor
(SURVEY.md §2.9 T1-T6, §2.4 J2/J3):

- extract_table_data         -> reference services/coordinate_table_extractor.py:20-61
- filter_words_to_region     -> reference services/coordinate_table_extractor.py:63-68
- establish_column_boundaries-> reference services/coordinate_table_extractor.py:70-129
- find_header_words          -> reference services/coordinate_table_extractor.py:131-154
  (first-wins tie-break at :153-154 — O6 in SURVEY §2.6)
- group_words_into_rows      -> reference services/coordinate_table_extractor.py:156-186
- find_header_row_y          -> reference services/coordinate_table_extractor.py:188-194
- extract_row_data           -> reference services/coordinate_table_extractor.py:196-236

Pure per-document Python; runs inside ``map_batches`` workers. The word-list
ORDER matters for multi-word header sequence matching, so callers must pass
words in reading order (y0, x0) exactly as the parse stage produces them.
"""

from __future__ import annotations

import math
from typing import Any, Optional

from .geometry import Word

ROW_Y_TOL = 5.0


def filter_words_to_region(words: list[Word], region: dict[str, Any]) -> list[Word]:
    """Keep words whose center_y falls in [y_min, y_max] (default 0..inf)."""
    y_min = region.get("y_min", 0)
    y_max = region.get("y_max", math.inf)
    return [w for w in words if y_min <= w["center_y"] <= y_max]


def find_header_words(header_text: str, words: list[Word],
                      tolerance: float = ROW_Y_TOL) -> list[Word]:
    """Locate the words spelling a header. Single-word headers match every
    word with equal stripped text; multi-word headers match the FIRST
    consecutive run of words (in list order) whose joined text equals the
    header and whose center_y spread is within tolerance (first-wins O6)."""
    parts = header_text.split()
    if len(parts) == 1:
        return [w for w in words if w["text"].strip() == header_text.strip()]
    n = len(parts)
    for i in range(len(words) - n + 1):
        seq = words[i:i + n]
        if " ".join(w["text"] for w in seq).strip() == header_text.strip():
            ys = [w["center_y"] for w in seq]
            if max(ys) - min(ys) <= tolerance:
                return seq
    return []


def establish_column_boundaries(table_headers: list[str], words: list[Word],
                                tolerance: float = ROW_Y_TOL) -> list[dict[str, Any]]:
    """Column intervals from header-center midpoints: first column starts at 0,
    last extends to +inf, interior boundaries are midpoints of adjacent header
    centers. Headers not found on the page are simply absent (no boundary)."""
    positions = []
    for header in table_headers:
        hw = find_header_words(header, words, tolerance)
        if hw:
            left = min(w["x0"] for w in hw)
            right = max(w["x1"] for w in hw)
            positions.append({"header": header, "center_x": (left + right) / 2})
    if not positions:
        return []
    positions.sort(key=lambda h: h["center_x"])
    bounds = []
    for i, pos in enumerate(positions):
        left = 0.0 if i == 0 else (positions[i - 1]["center_x"] + pos["center_x"]) / 2
        right = math.inf if i == len(positions) - 1 \
            else (pos["center_x"] + positions[i + 1]["center_x"]) / 2
        bounds.append({"header": pos["header"], "left_x": left, "right_x": right,
                       "header_center": pos["center_x"]})
    return bounds


def group_words_into_rows(words: list[Word],
                          tolerance: float = ROW_Y_TOL) -> list[dict[str, Any]]:
    """Stable center_y sort, then greedy rows anchored on the first word's
    center_y; words within each row sorted by center_x."""
    if not words:
        return []
    ordered = sorted(words, key=lambda w: w["center_y"])
    rows = [{"words": [ordered[0]], "y_center": ordered[0]["center_y"]}]
    for w in ordered[1:]:
        if abs(w["center_y"] - rows[-1]["y_center"]) <= tolerance:
            rows[-1]["words"].append(w)
        else:
            rows.append({"words": [w], "y_center": w["center_y"]})
    for row in rows:
        row["words"].sort(key=lambda w: w["center_x"])
    return rows


def find_header_row_y(table_headers: list[str], words: list[Word],
                      tolerance: float = ROW_Y_TOL) -> Optional[float]:
    """Mean center_y of the first header that can be located."""
    for header in table_headers:
        hw = find_header_words(header, words, tolerance)
        if hw:
            return sum(w["center_y"] for w in hw) / len(hw)
    return None


def extract_row_data(row_words: list[Word],
                     boundaries: list[dict[str, Any]]) -> dict[str, Optional[str]]:
    """Assign each word to the column whose [left_x, right_x) interval holds
    its center_x, falling back to the closest header center; cell text is the
    x0-sorted space-join, null when empty."""
    groups: dict[str, list[Word]] = {b["header"]: [] for b in boundaries}
    for w in row_words:
        cx = w["center_x"]
        assigned = None
        for b in boundaries:
            if b["left_x"] <= cx < b["right_x"]:
                assigned = b["header"]
                break
        if assigned is None:
            assigned = min(boundaries, key=lambda b: abs(b["header_center"] - cx))["header"]
        groups[assigned].append(w)
    out: dict[str, Optional[str]] = {}
    for b in boundaries:
        grp = groups[b["header"]]
        if grp:
            text = " ".join(w["text"] for w in sorted(grp, key=lambda w: w["x0"])).strip()
            out[b["header"]] = text if text else None
        else:
            out[b["header"]] = None
    return out


def extract_table_data(words: list[Word], table_headers: list[str],
                       table_region: Optional[dict[str, Any]] = None,
                       tolerance: float = ROW_Y_TOL) -> list[dict[str, Optional[str]]]:
    """Full pipeline: region filter -> boundaries -> rows -> skip the header
    row (|y - header_y| < tolerance) -> per-row cell assignment -> drop rows
    with no non-empty cell."""
    if not table_headers or not words:
        return []
    relevant = filter_words_to_region(words, table_region) if table_region else words
    boundaries = establish_column_boundaries(table_headers, relevant, tolerance)
    if not boundaries:
        return []
    rows = group_words_into_rows(relevant, tolerance)
    header_y = find_header_row_y(table_headers, relevant, tolerance)
    data = []
    for row in rows:
        if header_y and abs(row["y_center"] - header_y) < tolerance:
            continue
        if not row["words"]:
            continue
        row_data = extract_row_data(row["words"], boundaries)
        if any(v for v in row_data.values()):
            data.append(row_data)
    return data

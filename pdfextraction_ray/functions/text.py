"""Text-analysis kernels for the documents table: token counting, value-
pattern predicates, quality scoring, language ID, fingerprinting.

The value-pattern regexes are the reference's own (SURVEY §2.8 F1-F4,
reference services/spatial_preprocessor.py:349-390); the rest are the
standard large-corpus text-pipeline operations (language-ID n-gram heuristic,
length/punct/stopword quality scores, whitespace+BPE-ish token counts,
rolling-hash fingerprints) the 100-TB engine needs.

All batch functions are vectorized: ``pyarrow.compute`` regex kernels where
possible, numpy elsewhere. Per-row Python appears only inside fingerprint /
langid which are byte-level loops over short profiles, wrapped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Reference value-pattern regexes (spatial_preprocessor.py:374-384) — RE2
# syntax, identical strings passed to DuckDB's regexp_matches in the oracles.
DATE_PATTERN = r"\d{1,2}/\d{1,2}/\d{4}"
PHONE_PATTERN = r"\d{3}-\d{3}-\d{4}"
SSN_PATTERN = r"\d{3}-\d{2}-\d{4}"
CURRENCY_PATTERN = r"\$\d"
TOKEN_PATTERN = r"\S+"
# BPE-ish word/number/punct splitter (public GPT-2-style pattern, simplified
# to RE2-compatible syntax — no lookahead).
BPE_ISH_PATTERN = r"[A-Za-z]+|\d+|[^A-Za-z\d\s]+"
PUNCT_PATTERN = r"[.,;:!?]"
UPPER_PATTERN = r"[A-Z]"

STOPWORDS_EN = frozenset(
    "the of and a to in is it you that he was for on are as with his they at be "
    "this have from or had by not word but what some we can out other were all "
    "there when up use your how said an each she".split())

# Tiny trigram profiles for language ID (top trigrams per language, derived
# from public frequency lists; deterministic heuristic, not a model).
_LANG_PROFILES = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
           " to", "to ", "ed ", " in", "ion"),
    "de": ("en ", "er ", " de", "der", "ie ", " di", "die", "ch ", "sch", "ein",
           "ich", "nde", " un", "und", "che"),
    "fr": (" de", "de ", " le", "es ", "le ", "ent", "nt ", "et ", " la", "la ",
           "ion", " et", "re ", " pa", "que"),
    "es": (" de", "de ", " la", "la ", "os ", " co", "el ", " el", "as ", "que",
           " qu", "ue ", "en ", " en", "ión"),
}
_LANG_ORDER = ("en", "de", "fr", "es")


def count_regex(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    """Per-row count of non-overlapping matches (vectorized RE2)."""
    return pc.count_substring_regex(col, pattern)


def matches_regex(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    return pc.match_substring_regex(col, pattern)


def token_counts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per row (matches DuckDB
    ``length(regexp_extract_all(text, '\\S+'))``)."""
    return count_regex(col, TOKEN_PATTERN)


def quality_columns(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append integer quality-signal columns (ints only — exact across
    engines): n_chars_utf8, n_tokens, n_punct, n_upper, n_stopword_hits."""
    col = batch.column(text_col)
    n_chars = pc.utf8_length(col)
    n_tokens = token_counts(col)
    n_punct = count_regex(col, PUNCT_PATTERN)
    n_upper = count_regex(col, UPPER_PATTERN)
    # stopword hits: count of occurrences of any stopword as a whole word
    stop_re = r"\b(?:" + "|".join(sorted(STOPWORDS_EN)) + r")\b"
    n_stop = count_regex(pc.utf8_lower(col), stop_re)
    for name, arr in [("n_chars_utf8", n_chars), ("n_tokens", n_tokens),
                      ("n_punct", n_punct), ("n_upper", n_upper),
                      ("n_stopword_hits", n_stop)]:
        batch = batch.append_column(name, pc.cast(arr, pa.int64()))
    return batch


def detect_language(text: str) -> str:
    """Trigram-vote language ID over a bounded prefix, with a CJK-codepoint
    ratio check for 'zh'; 'und' when nothing scores. Deterministic; trigram
    ties broken by fixed profile order en > de > fr > es."""
    sample = text[:2000].lower()
    if len(sample) < 20:
        return "und"
    n_cjk = sum(1 for ch in sample if "一" <= ch <= "鿿")
    if n_cjk >= max(10, len(sample) // 20):
        return "zh"
    scores = {}
    for lang, grams in _LANG_PROFILES.items():
        scores[lang] = sum(sample.count(g) for g in grams)
    best = max(scores.values())
    if best == 0:
        return "und"
    for lang in _LANG_ORDER:
        if scores[lang] == best:
            return lang
    return "und"


def language_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    preds = [detect_language(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("pred_lang", pa.array(preds, pa.string()))


_FP_BASE = np.uint64(1000003)
_FP_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    bytes, minimum hash across all windows (deterministic, signed-int64
    representation for Arrow)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        return 0
    if len(data) <= window:
        h = np.uint64(0)
        for b in data:
            h = (h * _FP_BASE + np.uint64(b)) & _FP_MOD_MASK
        return int(np.int64(h))
    with np.errstate(over="ignore"):
        powers = np.empty(window, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, window):
            powers[i] = powers[i - 1] * _FP_BASE
        d64 = data.astype(np.uint64)
        n = len(d64) - window + 1
        # hash of every window via cumulative trick: h_i = sum d[i+j]*base^(w-1-j)
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(window):
            acc += d64[j:j + n] * powers[window - 1 - j]
        return int(np.int64(acc.min()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [rolling_fingerprint(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))

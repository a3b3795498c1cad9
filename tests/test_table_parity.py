"""Differential tests: our table extractor vs the reference
CoordinateTableExtractor, dict-for-dict on extracted rows."""

import random

import pytest

from pdfextraction_ray import geometry as G
from pdfextraction_ray import table_extract as T

HEADERS = ["RateCode", "Description", "Rate", "Salary", "Effective Dates"]
CELLS = ["S-0", "Standard", "19.00", "39520.00", "01/01/2024", "0.00/14.11/0.00/0.00",
         "H-1", "Hourly", "", "12.50", "X"]


def make_word(text, x0, y0, width=None, height=10.0):
    w = width if width is not None else max(6.0, 6.0 * len(text))
    return G.derive_word(text, x0, y0, x0 + w, y0 + height)


def build_table_page(rng: random.Random, headers, n_rows, col_xs=None, y0=100.0,
                     ragged=False):
    """A header line + n data rows at fixed column x positions; returns words
    in reading order (as the parse stage provides them)."""
    col_xs = col_xs or [40.0, 130.0, 260.0, 330.0, 420.0]
    words = []
    for h, x in zip(headers, col_xs):
        hx = x
        for part in h.split():
            w = make_word(part, hx, y0)
            words.append(w)
            hx = w["x1"] + 4.0
    y = y0 + 16.0
    for _ in range(n_rows):
        for ci, x in enumerate(col_xs[:len(headers)]):
            if ragged and rng.random() < 0.3:
                continue
            words.append(make_word(rng.choice(CELLS) or "v", x, y))
        y += 15.0
    return G.reading_order(words)


@pytest.mark.parametrize("seed", range(25))
def test_extract_table_parity(seed, reference_modules):
    _, CoordinateTableExtractor = reference_modules
    rng = random.Random(3000 + seed)
    n_rows = rng.randint(0, 5)
    words = build_table_page(rng, HEADERS, n_rows, ragged=(seed % 3 == 0))
    ref = CoordinateTableExtractor(words)
    region = {"y_min": 90.0, "y_max": 400.0} if seed % 2 else None
    assert T.extract_table_data(words, HEADERS, region) == \
        ref.extract_table_data(HEADERS, region)


def test_boundaries_parity(reference_modules):
    _, CoordinateTableExtractor = reference_modules
    rng = random.Random(7)
    words = build_table_page(rng, HEADERS, 3)
    ref = CoordinateTableExtractor(words)
    ours = T.establish_column_boundaries(HEADERS, words)
    theirs = ref._establish_column_boundaries(HEADERS, words)
    assert [(b["header"], b["left_x"], b["right_x"], b["header_center"]) for b in ours] == \
        [(b["header"], b["left_x"], b["right_x"], b["header_center"]) for b in theirs]


def test_duplicate_header_first_wins(reference_modules):
    """Two identical multi-word headers on distinct lines: the first sequence
    in word order wins (reference coordinate_table_extractor.py:153-154)."""
    _, CoordinateTableExtractor = reference_modules
    words = []
    for y in (100.0, 200.0):
        x = 40.0
        for part in ("Effective", "Dates"):
            w = make_word(part, x, y)
            words.append(w)
            x = w["x1"] + 4.0
    words = G.reading_order(words)
    ref = CoordinateTableExtractor(words)
    assert T.find_header_words("Effective Dates", words) == \
        ref._find_header_words("Effective Dates", words)
    assert T.find_header_words("Effective Dates", words)[0]["y0"] == 100.0


def test_missing_headers_and_empty():
    assert T.extract_table_data([], HEADERS) == []
    words = [make_word("nothing", 40, 100)]
    assert T.extract_table_data(words, HEADERS) == []
    assert T.extract_table_data(words, []) == []


def test_fallback_closest_column(reference_modules):
    """A word left of column 0's boundary start is still assigned (first col
    starts at 0) and one far beyond all centers falls back to the closest."""
    _, CoordinateTableExtractor = reference_modules
    rng = random.Random(11)
    words = build_table_page(rng, ["Alpha Col", "Beta Col"], 0, col_xs=[100.0, 300.0])
    stray = [make_word("edge", 5.0, 130.0), make_word("far", 560.0, 130.0)]
    words = G.reading_order(words + stray)
    ref = CoordinateTableExtractor(words)
    assert T.extract_table_data(words, ["Alpha Col", "Beta Col"]) == \
        ref.extract_table_data(["Alpha Col", "Beta Col"])

"""Differential tests: our geometry core vs the reference implementation
(`/root/reference/services/spatial_preprocessor.py`), byte-for-byte on
``preprocess_document`` and structure-for-structure on the sub-operators.

The reference module is used purely as an oracle; all inputs are synthesized
here with fixed seeds.
"""

import random

import pytest
from hypothesis import given, settings, strategies as st

from pdfextraction_ray import geometry as G

FIELDY = ["Employee", "Name", "Status", "Hire", "Date", "Dept", "Code", "Rate",
          "Salary", "Phone", "Address", "Supervisor", "Title", "Group", "Marital"]
VALUEY = ["A", "M", "42", "19.00", "12/31/2024", "555-123-4567", "123-45-6789",
          "$100", "15%", "S-0", "0.00/14.11/0.00/0.00", "alpha", "beta", "xyzzy",
          "Jones", "CAROLINE", "lorem", "ipsum"]


def make_word(text, x0, y0, width=None, height=10.0):
    w = width if width is not None else max(6.0, 6.0 * len(text))
    return G.derive_word(text, x0, y0, x0 + w, y0 + height)


def random_page(rng: random.Random, n_lines=None):
    words = []
    n_lines = n_lines if n_lines is not None else rng.randint(0, 12)
    y = 50.0
    for _ in range(n_lines):
        x = 30.0 + rng.random() * 20
        n_words = rng.randint(1, 8)
        for _ in range(n_words):
            pool = FIELDY if rng.random() < 0.5 else VALUEY
            text = rng.choice(pool)
            wobble = rng.choice([0.0, 1.0, -2.0, 3.5])
            word = make_word(text, x, y + wobble)
            words.append(word)
            x = word["x1"] + rng.choice([4.0, 8.0, 20.0, 60.0])
        y += rng.choice([12.0, 14.0, 18.0, 40.0])
    rng.shuffle(words)  # input order must not matter (sorted inside)
    return words


@pytest.mark.parametrize("seed", range(40))
def test_preprocess_document_byte_identical(seed, reference_modules):
    SpatialPreprocessor, _ = reference_modules
    ref = SpatialPreprocessor()
    rng = random.Random(1000 + seed)
    words = random_page(rng)
    assert G.preprocess_document(words) == ref.preprocess_document(words)


@pytest.mark.parametrize("seed", range(20))
def test_sub_operators_parity(seed, reference_modules):
    SpatialPreprocessor, _ = reference_modules
    ref = SpatialPreprocessor()
    rng = random.Random(2000 + seed)
    words = random_page(rng)

    ours_lines = G.group_words_into_lines(words)
    ref_lines = ref.group_words_into_lines(words)
    assert ours_lines == ref_lines

    for line in ours_lines:
        assert G.cluster_words_by_proximity(line) == ref.cluster_words_by_proximity(line)
        assert G.process_line_for_fields(line) == ref.process_line_for_fields(line)
        assert G.line_contains_field_patterns(line) == ref.line_contains_field_patterns(line)

    assert G.calculate_word_spacing_stats(words) == ref.calculate_word_spacing_stats(words)

    ours_regions = G.identify_table_regions(words)
    ref_regions = ref.identify_table_regions(words)
    assert ours_regions == ref_regions


@pytest.mark.parametrize("text", VALUEY + FIELDY + ["", " ", "NO", "ID:", "a", "Z",
                                                    "12/1/1999", "999-99-9999",
                                                    "TOTAL", "ABCDEFG", "$", "%"])
def test_value_pattern_parity(text, reference_modules):
    SpatialPreprocessor, _ = reference_modules
    ref = SpatialPreprocessor()
    assert G.is_obvious_value_pattern(text) == ref.is_obvious_value_pattern(text)


@given(st.lists(st.tuples(
    st.sampled_from(FIELDY + VALUEY),
    st.floats(min_value=0, max_value=500, allow_nan=False),
    st.floats(min_value=0, max_value=700, allow_nan=False)), min_size=0, max_size=30))
@settings(max_examples=60, deadline=None)
def test_preprocess_document_property(reference_modules, items):
    SpatialPreprocessor, _ = reference_modules
    ref = SpatialPreprocessor()
    words = [make_word(t, x, y) for t, x, y in items]
    assert G.preprocess_document(words) == ref.preprocess_document(words)


def test_empty_and_single():
    assert G.preprocess_document([]) == ""
    w = make_word("Name", 10, 10)
    out = G.preprocess_document([w])
    assert out == "Name:\t[EMPTY]"


def test_field_pairing_same_line(reference_modules):
    SpatialPreprocessor, _ = reference_modules
    ref = SpatialPreprocessor()
    # "Employee Name" label then a value far right on the same line
    words = [make_word("Employee", 30, 100), make_word("Name", 90, 100),
             make_word("Caroline", 300, 100), make_word("Jones", 360, 100)]
    assert G.preprocess_document(words) == ref.preprocess_document(words)


def test_multiline_value_beneath(reference_modules):
    SpatialPreprocessor, _ = reference_modules
    ref = SpatialPreprocessor()
    words = [make_word("Hire", 30, 100), make_word("Date", 60, 100),
             make_word("12/31/2024", 32, 114)]
    ours = G.preprocess_document(words)
    assert ours == ref.preprocess_document(words)
    assert "12/31/2024" in ours


def test_empty_string_value_renders_empty_token(reference_modules):
    """A matched value cluster whose text is empty ('' is producible via
    NUL-split decode_words texts) must render [EMPTY] exactly like the
    reference's `if best_value:` truthiness check."""
    SpatialPreprocessor, _ = reference_modules
    ref = SpatialPreprocessor()
    field_line = [make_word("Employee", 30, 100), make_word("Name", 90, 100)]
    value_line = [make_word("", 60, 114, width=6.0)]
    ours = G.process_field_line_with_values(field_line, value_line)
    assert ours == ref.process_field_line_with_values(field_line, value_line)
    assert ours.endswith(G.EMPTY_TOKEN)

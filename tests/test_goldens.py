"""Golden conformance suite (north-rule invariant): the committed goldens in
tests/goldens/ pin byte-identical ``extracted_text`` per fixture page.

- words_golden.json was produced by RUNNING the reference implementation over
  the synthetic fixtures (tools/make_goldens.py) — comparing our engine to it
  is the 'byte-identical extracted text per url vs reference' check, and works
  without the reference checkout present.
- html_golden.json freezes the HTML stripper's contract.
"""

import json
import os

import pytest

from pdfextraction_ray import geometry as G
from pdfextraction_ray import table_extract as T
from pdfextraction_ray.html_extract import extract_main_content
from pdfextraction_ray.payload import encode_words

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


WORDS = _load("words_golden.json")
HTML = _load("html_golden.json")


def _revive(words_json):
    return [G.derive_word(w["text"], w["x0"], w["y0"], w["x1"], w["y1"])
            for w in words_json]


@pytest.mark.parametrize("key", sorted(WORDS))
def test_words_extracted_text_byte_identical(key):
    case = WORDS[key]
    words = _revive(case["words"])
    assert G.preprocess_document(words) == case["extracted_text"]


@pytest.mark.parametrize("key", sorted(WORDS))
def test_words_tables_identical(key):
    case = WORDS[key]
    words = _revive(case["words"])
    regions = G.identify_table_regions(words)
    assert len(regions) == len(case["tables"])
    ordered = G.reading_order(words)
    for region, expected in zip(regions, case["tables"]):
        assert list(region["headers"]) == expected["headers"]
        rows = T.extract_table_data(
            ordered, expected["headers"],
            {"y_min": region["bbox"][1], "y_max": region["bbox"][3]})
        assert rows == expected["rows"]


def test_words_roundtrip_through_payload_codec():
    """The envelope path (encode -> decode -> preprocess) must preserve byte
    identity; coordinates survive the float32 round-trip because fixtures use
    float32-exact values."""
    from pdfextraction_ray.payload import decode_words
    for key in sorted(WORDS):
        words = _revive(WORDS[key]["words"])
        revived = decode_words(encode_words(words))
        assert G.preprocess_document(revived) == WORDS[key]["extracted_text"], key


@pytest.mark.parametrize("key", sorted(HTML))
def test_html_extraction_golden(key):
    case = HTML[key]
    res = extract_main_content(case["html"])
    assert res["extracted_text"] == case["extracted_text"]
    assert res["spans"] == case["spans"]
    assert res["tables"] == case["tables"]


def test_html_spans_are_consistent():
    for key, case in HTML.items():
        text = case["extracted_text"]
        for span in case["spans"]:
            assert 0 <= span["start"] <= span["end"] <= len(text), key
            assert "\n\n" not in text[span["start"]:span["end"]], key


def test_parser_stage_matches_goldens():
    """Full DocumentParser batch path reproduces the golden text."""
    import pyarrow as pa
    import numpy as np
    from pdfextraction_ray.stages.parse import DocumentParser
    from pdfextraction_ray.fixtures import CORPUS_SCHEMA

    keys = sorted(WORDS)
    payloads = [encode_words(_revive(WORDS[k]["words"])) for k in keys]
    batch = pa.Table.from_pydict({
        "url": [f"https://golden.example/{k}" for k in keys],
        "warc_ts": np.zeros(len(keys), dtype="datetime64[us]"),
        "html": payloads,
        "text": ["" for _ in keys],
        "lang": ["en" for _ in keys]}, schema=CORPUS_SCHEMA)
    out = DocumentParser()(batch)
    got = dict(zip(keys, out.column("extracted_text").to_pylist()))
    for k in keys:
        assert got[k] == WORDS[k]["extracted_text"], k

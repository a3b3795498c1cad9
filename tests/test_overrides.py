"""J5/A8 override semantics: validated schema column coalesces over the
computed one and re-extracts; parser config resolves per domain."""

import pyarrow as pa
import ray.data as rd

from pdfextraction_ray import geometry as G
from pdfextraction_ray.fixtures import CORPUS_SCHEMA, flagship_word_page
from pdfextraction_ray.payload import encode_words
from pdfextraction_ray.stages.overrides import (ParserConfigOverrides,
                                                apply_schema_overrides)
from pdfextraction_ray.stages.parse import DocumentParser


def _corpus():
    import numpy as np
    words = flagship_word_page(43)
    return pa.Table.from_pydict({
        "url": ["https://a.example/1", "https://b.example/2"],
        "warc_ts": np.zeros(2, dtype="datetime64[us]"),
        "html": [encode_words(words), encode_words(words)],
        "text": ["", ""], "lang": ["en", "en"]}, schema=CORPUS_SCHEMA)


def test_schema_override_reextracts(ray_session):
    batch = _corpus()
    parsed = DocumentParser()(batch)
    # keep the payload column alongside the envelope for the override pass
    parsed = parsed.append_column("html", batch.column("html"))
    override = {"form_fields": [], "field_type": "table",
                "tables": [{"table_name": "only_rates",
                            "headers": ["RateCode", "Description", "Rate", "Salary"]}]}
    ds = rd.from_arrow(parsed)
    out = apply_schema_overrides(ds, {"https://a.example/1": override}) \
        .to_pandas().set_index("url")
    a = out.loc["https://a.example/1"]
    b = out.loc["https://b.example/2"]
    assert a["schema_validated"] and not b["schema_validated"]
    assert list(a["schema"]["form_fields"]) == []
    assert len(a["tables"]) == 1
    assert a["tables"][0]["table_name"] == "only_rates"
    assert len(a["tables"][0]["rows"]) > 0
    # untouched row keeps its computed schema
    assert len(b["schema"]["form_fields"]) > 0


def test_override_noop_when_no_hits(ray_session):
    batch = _corpus()
    parsed = DocumentParser()(batch).append_column("html", batch.column("html"))
    ds = rd.from_arrow(parsed)
    out = apply_schema_overrides(ds, {"https://nomatch.example/": {}}).to_pandas()
    assert "schema_validated" not in out.columns or not out["schema_validated"].any()


def test_parser_config_overrides():
    cfg = ParserConfigOverrides({"slow.example": {"proximity_multiplier": 3.0}})
    assert cfg.resolve("slow.example")["proximity_multiplier"] == 3.0
    assert cfg.resolve("other.example")["proximity_multiplier"] == 2.0
    assert cfg.resolve("slow.example")["min_text_chars"] == 25


def test_domain_config_override_words_path(ray_session):
    """A8 wiring: a per-domain proximity_multiplier override changes word
    clustering for THAT domain only; default domains keep the byte contract."""
    batch = _corpus()
    base = DocumentParser()(batch).to_pylist()
    overridden = DocumentParser(config_overrides={
        "a.example": {"proximity_multiplier": 0.01}})(batch).to_pylist()
    assert overridden[0]["extracted_text"] != base[0]["extracted_text"]
    assert overridden[1]["extracted_text"] == base[1]["extracted_text"]


def test_domain_config_override_html_path(ray_session):
    import numpy as np
    from pdfextraction_ray.payload import encode_html
    body = "A paragraph with a bit more than twenty-five characters."
    html = encode_html(f"<main><p>{body}</p></main>")
    batch = pa.Table.from_pydict({
        "url": ["https://a.example/1", "https://b.example/2"],
        "warc_ts": np.zeros(2, dtype="datetime64[us]"),
        "html": [html, html],
        "text": ["", ""], "lang": ["en", "en"]}, schema=CORPUS_SCHEMA)
    out = DocumentParser(config_overrides={
        "a.example": {"min_text_chars": 1000}})(batch).to_pylist()
    assert out[0]["extracted_text"] == ""   # overridden domain: threshold up
    assert body in out[1]["extracted_text"]  # default domain unchanged


def test_parse_pages_routes_config_overrides(ray_session):
    from pdfextraction_ray.pipelines.extract_pipeline import parse_pages
    batch = _corpus()
    out = parse_pages(rd.from_arrow(batch), config_overrides=ParserConfigOverrides(
        {"a.example": {"proximity_multiplier": 0.01}})).to_pandas()
    base = parse_pages(rd.from_arrow(batch)).to_pandas()
    assert out.iloc[0]["extracted_text"] != base.iloc[0]["extracted_text"]
    assert out.iloc[1]["extracted_text"] == base.iloc[1]["extracted_text"]


def test_preprocessing_mode_original(ray_session):
    """§2.11 mode switch (reference original|spatial, app.py:337-352):
    original mode emits plain reading-order text — no field/table analysis —
    while spatial (default) keeps the byte contract."""
    import pytest as _pytest
    batch = _corpus()
    spatial = DocumentParser()(batch).to_pylist()
    original = DocumentParser(preprocessing_mode="original")(batch).to_pylist()
    assert G.FIELD_SEP in spatial[0]["extracted_text"]
    assert G.FIELD_SEP not in original[0]["extracted_text"]
    assert original[0]["fields"] == [] and original[0]["tables"] == []
    assert original[0]["parse_ok"]
    # same words, same line structure: strip the spatial formatting tokens
    assert original[0]["extracted_text"].split("\n")[0].startswith(
        spatial[0]["extracted_text"].split("\n")[0].split(G.FIELD_SEP)[0].split("    ")[0])
    with _pytest.raises(ValueError):
        DocumentParser(preprocessing_mode="vision")

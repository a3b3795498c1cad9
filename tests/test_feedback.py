"""The A8 feedback-DERIVATION loop (VERDICT r3 #6): corrections-as-data ->
per-domain ParserConfigOverrides -> a previously-wrong domain's extraction
flips to match its goldens through the existing stages/parse.py
`_domain_config` resolution."""

import numpy as np
import pyarrow as pa
import ray.data as rd

GOOD_VALUE = "ACME CORP LLC INTL"


def _word(txt, x0, w, y):
    return {"text": txt, "x0": x0, "y0": y, "x1": x0 + w, "y1": y + 10,
            "center_x": x0 + w / 2, "center_y": y + 5, "width": w,
            "height": 10, "block_no": 0, "line_no": 0, "word_no": 0}


def _wide_gap_doc():
    """Field line 'Employee Name:' over a value line whose first gap (25pt)
    exceeds 2.0x the line's average gap but not 3.0x: the default
    multiplier splits the value cluster and the field pairs with only its
    nearest fragment ('ACME'); at 3.0 the cluster holds together."""
    field_line = [_word("Employee", 0, 55, 100), _word("Name:", 60, 40, 100)]
    value_line = [_word("ACME", 0, 40, 112), _word("CORP", 65, 40, 112),
                  _word("LLC", 110, 30, 112), _word("INTL", 145, 35, 112)]
    return field_line + value_line


def _parse_one(url, payload, overrides=None):
    from pdfextraction_ray.stages.parse import DocumentParser

    parser = DocumentParser(config_overrides=overrides)
    t = pa.table({"url": [url],
                  "warc_ts": pa.array([0], pa.timestamp("us")),
                  "lang": ["en"], "html": pa.array([payload], pa.binary())})
    out = parser(t)
    assert out.column("parse_ok")[0].as_py(), out.column("parse_error")[0]
    return out


def _field_value(out, name):
    for f in out.column("fields")[0].as_py():
        if f["name"] == name:
            return f["value"]
    return None


def test_corrections_flip_wide_gap_domain(ray_session):
    """End-to-end A8 loop: default parse truncates the value; the derived
    per-domain proximity override (learned from the corrections table alone)
    makes re-extraction match the expected golden. An uncorrected domain
    keeps default behavior."""
    from pdfextraction_ray.payload import encode_words
    from pdfextraction_ray.stages.feedback import derive_overrides

    payload = encode_words(_wide_gap_doc())
    urls = [f"http://wide.example/doc{i}" for i in range(3)]

    # 1. default parse is WRONG (truncated to the nearest fragment)
    got = [_field_value(_parse_one(u, payload), "Employee Name:")
           for u in urls]
    assert got == ["ACME"] * 3

    # 2. the human corrections land as data
    corrections = rd.from_arrow(pa.table({
        "url": urls,
        "field": ["Employee Name:"] * 3,
        "expected": [GOOD_VALUE] * 3,
        "got": got,
        "doc_kind": ["words"] * 3}))
    overrides, report, audit = derive_overrides(corrections)

    # 3. the analyzer classified the pattern and derived the config
    rep = report.to_pandas()
    assert set(rep.error_type) == {"truncated_value"}
    assert overrides.resolve("wide.example")["proximity_multiplier"] == 3.0

    # 3b. the derived rule carries its before/after audit lineage
    assert audit == [{"domain": "wide.example",
                      "param": "proximity_multiplier",
                      "before": 2.0, "after": 3.0, "support": 3,
                      "basis": "truncated_value=3 vs merged_value=0 "
                               "(majority truncated)"}]

    # 4. re-extraction through the standard parse-time resolution now
    # matches the golden; other domains are untouched
    fixed = _parse_one(urls[0], payload, overrides=overrides)
    assert _field_value(fixed, "Employee Name:") == GOOD_VALUE
    other = _parse_one("http://other.example/d", payload, overrides=overrides)
    assert _field_value(other, "Employee Name:") == "ACME"


def test_missing_html_text_lowers_min_chars(ray_session):
    """A domain whose short-but-wanted paragraphs fall under the default
    min_text_chars bar: corrections teach the analyzer the bar is too high
    and the derived override re-admits the text."""
    from pdfextraction_ray.payload import encode_html
    from pdfextraction_ray.stages.feedback import derive_overrides

    para = "Short but vital note."  # 21 chars < default 25
    html = f"<html><body><p>{para}</p></body></html>"
    payload = encode_html(html)
    urls = [f"http://brief.example/p{i}" for i in range(2)]
    before = [_parse_one(u, payload) for u in urls]
    assert all(b.column("extracted_text")[0].as_py() == "" for b in before)

    corrections = rd.from_arrow(pa.table({
        "url": urls, "field": ["extracted_text"] * 2,
        "expected": [para] * 2, "got": ["", None],
        "doc_kind": ["html"] * 2}))
    overrides, report, audit = derive_overrides(corrections)
    assert overrides.resolve("brief.example")["min_text_chars"] == len(para)

    after = _parse_one(urls[0], payload, overrides=overrides)
    assert para in after.column("extracted_text")[0].as_py()


def test_merged_corrections_lower_multiplier(ray_session):
    """The opposite systematic pattern (extraction glued extra text on)
    steps the multiplier DOWN; mixed/contradictory evidence derives
    nothing."""
    from pdfextraction_ray.stages.feedback import derive_overrides

    def corr(domain, expected, got, k):
        return [(f"http://{domain}/d{i}", "F", expected, got)
                for i in range(k)]

    rows = (corr("glue.example", "ACME", "ACME CORP", 3)
            + corr("tied.example", "ACME", "ACME CORP", 2)
            + corr("tied.example", "ACME CORP", "ACME", 2)
            + corr("sparse.example", "ACME", "ACME CORP", 1))
    corrections = rd.from_arrow(pa.table({
        "url": [r[0] for r in rows], "field": [r[1] for r in rows],
        "expected": [r[2] for r in rows], "got": [r[3] for r in rows]}))
    overrides, _, _ = derive_overrides(corrections)
    got = overrides.resolve("glue.example")["proximity_multiplier"]
    assert np.isclose(got, 2.0 / 1.5)
    # tie -> no signal; below min_support -> no rule
    assert "proximity_multiplier" not in overrides.by_domain.get(
        "tied.example", {})
    assert "tied.example" not in overrides.by_domain
    assert "sparse.example" not in overrides.by_domain


def test_wrong_value_and_no_error_rows_derive_nothing(ray_session):
    from pdfextraction_ray.stages.feedback import derive_overrides

    corrections = rd.from_arrow(pa.table({
        "url": ["http://a.example/1", "http://a.example/2",
                "http://a.example/3"],
        "field": ["F", "F", "F"],
        "expected": ["alpha", "beta", "gamma"],
        "got": ["omega", "delta", "gamma"]}))  # 2 wrong_value + 1 no_error
    overrides, report, audit = derive_overrides(corrections)
    assert not overrides.by_domain
    assert audit == []  # no rule derived -> no audit row
    rep = report.to_pandas()
    assert set(rep.error_type) == {"wrong_value"}
    assert rep.n.sum() == 2  # the no_error row was dropped


def test_html_truncations_do_not_turn_words_knob(ray_session):
    """doc_kind routes which knob an error class may touch: truncated html
    corrections carry no evidence about word clustering and must not derive
    a proximity override."""
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.stages.feedback import derive_overrides

    corrections = rd.from_arrow(pa.table({
        "url": [f"http://h.example/{i}" for i in range(3)],
        "field": ["extracted_text"] * 3,
        "expected": ["alpha beta gamma"] * 3,
        "got": ["alpha beta"] * 3,
        "doc_kind": ["html"] * 3}))
    overrides, report, audit = derive_overrides(corrections)
    assert "proximity_multiplier" not in overrides.by_domain.get(
        "h.example", {})
    assert set(report.to_pandas().error_type) == {"truncated_value"}


def test_feedback_audit_round_trips_through_manifest(ray_session, tmp_path):
    """VERDICT r4 #5: a derived override's audit row persists into the run
    manifest (reference storage.py:47-57 feedback history: before/after +
    iteration) and reads back beside partition lineage records without
    confusing the resume scanners."""
    from pdfextraction_ray.stages.feedback import derive_overrides
    from pdfextraction_ray.state.manifest import (committed_partitions,
                                                  read_feedback_audit,
                                                  write_feedback_audit,
                                                  write_manifest)

    corrections = rd.from_arrow(pa.table({
        "url": [f"http://wide.example/doc{i}" for i in range(3)],
        "field": ["Employee Name:"] * 3,
        "expected": [GOOD_VALUE] * 3,
        "got": ["ACME"] * 3,
        "doc_kind": ["words"] * 3}))
    overrides, _, audit = derive_overrides(corrections)
    assert len(audit) == 1

    out = str(tmp_path / "run")
    # a partition lineage record lives in the same _manifest dir
    write_manifest(out, 0, input_files=["a.parquet"], parser_version="v1",
                   counters={"docs": 3}, wall_time_s=0.1)
    write_feedback_audit(out, audit, iteration=1,
                         derived_from={"n_corrections": 3})
    # second iteration compounds from the first result's params
    overrides2, _, audit2 = derive_overrides(
        corrections, defaults=overrides.resolve("wide.example"))
    write_feedback_audit(out, audit2, iteration=2)

    records = read_feedback_audit(out)
    assert [r["iteration"] for r in records] == [1, 2]
    assert records[0]["rules"] == audit
    assert records[0]["derived_from"] == {"n_corrections": 3}
    r1, r2 = records[0]["rules"][0], records[1]["rules"][0]
    # the audit trail shows the compounding: iter-2's before == iter-1's
    # after (this is the result_before/result_after chain the reference
    # keeps per correction)
    assert r1["before"] == 2.0 and r1["after"] == 3.0
    assert r2["before"] == 3.0 and r2["after"] == 4.5
    # resume scanners ignore the audit files
    assert committed_partitions(out, "v1") == {0}

"""G5-G9 merge semantics (FIXTURES.md F5): conflict handling, multi-page table
accumulation, failed-page accounting, anomaly detection."""

import pyarrow as pa
import ray.data as rd

from pdfextraction_ray.stages.merge import merge_pages_by_url, merge_url_group

FIELDS_T = pa.list_(pa.struct([("name", pa.string()), ("value", pa.string())]))
TABLES_T = pa.list_(pa.struct([("table_name", pa.string()),
                               ("headers", pa.list_(pa.string())),
                               ("rows", pa.list_(pa.list_(pa.string())))]))


def page(url, page_number, fields=(), tables=(), parse_ok=True):
    return {"url": url, "page_number": page_number, "parse_ok": parse_ok,
            "fields": list(fields), "tables": list(tables)}


def group_table(pages):
    return pa.Table.from_pydict({
        "url": [p["url"] for p in pages],
        "page_number": pa.array([p["page_number"] for p in pages], pa.int32()),
        "parse_ok": [p["parse_ok"] for p in pages],
        "fields": pa.array([p["fields"] for p in pages], FIELDS_T),
        "tables": pa.array([p["tables"] for p in pages], TABLES_T)})


def test_first_nonnull_then_longest_wins_with_conflict():
    pages = [
        page("u", 1, fields=[{"name": "Name", "value": "Jo"},
                             {"name": "Dept", "value": None}]),
        page("u", 2, fields=[{"name": "Name", "value": "Caroline"},
                             {"name": "Dept", "value": "Sales"}]),
        page("u", 3, fields=[{"name": "Name", "value": "X"}]),
    ]
    out = merge_url_group(group_table(pages)).to_pylist()[0]
    fields = {f["name"]: f for f in out["merged_fields"]}
    # longer later value wins and flags conflict (result_merger.py:100-118)
    assert fields["Name"]["value"] == "Caroline"
    assert fields["Name"]["source_page"] == 2
    assert fields["Name"]["conflict_detected"] is True
    # null on page 1 is skipped; page 2 provides the value, no conflict
    assert fields["Dept"]["value"] == "Sales"
    assert fields["Dept"]["conflict_detected"] is False
    assert any(a["kind"] == "field_conflict" and a["subject"] == "Name"
               for a in out["anomalies"])


def test_identical_duplicate_still_flags_conflict():
    """Reference quirk: a second identical non-null value flags a conflict."""
    pages = [page("u", 1, fields=[{"name": "A", "value": "same"}]),
             page("u", 2, fields=[{"name": "A", "value": "same"}])]
    out = merge_url_group(group_table(pages)).to_pylist()[0]
    assert out["merged_fields"][0]["conflict_detected"] is True


def test_table_accumulation_across_pages():
    t1 = {"table_name": "Rates", "headers": ["A", "B"], "rows": [["1", "2"]]}
    t2 = {"table_name": "Rates", "headers": ["A", "B"],
          "rows": [["3", "4"], ["5", None]]}
    t3 = {"table_name": "Rates", "headers": ["A", "B"], "rows": [["6", "7"]]}
    pages = [page("u", 1, tables=[t1]), page("u", 2, tables=[t2]),
             page("u", 3, tables=[t3])]
    out = merge_url_group(group_table(pages)).to_pylist()[0]
    tbl = out["merged_tables"][0]
    assert tbl["total_rows"] == 4
    assert tbl["rows"][0] == ["1", "2"] and tbl["rows"][-1] == ["6", "7"]
    assert tbl["source_pages"] == [1, 2, 3]
    assert tbl["spans_multiple_pages"] is True
    assert {d["page"]: d["n_rows"] for d in tbl["rows_by_page"]} == {1: 1, 2: 2, 3: 1}
    assert out["total_table_rows"] == 4


def test_failed_page_accounting():
    pages = [page("u", 1, fields=[{"name": "A", "value": "x"}]),
             page("u", 2, parse_ok=False)]
    out = merge_url_group(group_table(pages)).to_pylist()[0]
    assert out["successful_pages"] == 1
    assert out["failed_pages"] == 1
    assert out["total_pages"] == 2


def test_row_width_anomaly():
    ta = {"table_name": "T", "headers": ["A"], "rows": [["1"]]}
    tb = {"table_name": "T", "headers": ["A"], "rows": [["2", "extra"]]}
    pages = [page("u", 1, tables=[ta]), page("u", 2, tables=[tb])]
    out = merge_url_group(group_table(pages)).to_pylist()[0]
    assert any(a["kind"] == "table_anomaly" for a in out["anomalies"])


def test_merge_dataset_level(ray_session):
    pages = [page("a", 1, fields=[{"name": "F", "value": "v"}]),
             page("a", 2, fields=[{"name": "F", "value": "value2"}]),
             page("b", 1, fields=[{"name": "G", "value": "w"}])]
    ds = rd.from_arrow(group_table(pages))
    out = merge_pages_by_url(ds).to_pandas().set_index("url")
    assert len(out) == 2
    assert out.loc["a", "total_pages"] == 2
    assert out.loc["b", "total_pages"] == 1


def test_clean_final_view():
    from pdfextraction_ray.stages.merge import clean_final_view
    pages = [
        page("u", 1, fields=[{"name": "Name", "value": "Caroline"}],
             tables=[{"table_name": "T", "headers": ["A"], "rows": [["1"], ["2"]]}]),
        page("u", 2, parse_ok=False),
    ]
    merged = merge_url_group(group_table(pages))
    clean = clean_final_view(merged).to_pylist()[0]
    assert clean["extracted_fields"] == [{"name": "Name", "value": "Caroline"}]
    assert clean["extracted_tables"][0]["data"] == [["1"], ["2"]]
    assert clean["extracted_tables"][0]["total_rows"] == 2
    assert clean["total_fields"] == 1 and clean["total_tables"] == 1
    assert clean["successful_pages"] == 1 and clean["failed_pages"] == 1
    # conflict/source metadata stripped
    assert "conflict_detected" not in str(clean["extracted_fields"])

"""Composed end-to-end job: lang pushdown, url dedup latest-wins, envelope
write + domain histogram; merge-records variant."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from pdfextraction_ray.fixtures import build_corpus_table, write_corpus
from pdfextraction_ray.pipelines.extract_pipeline import extract_pipeline
from pdfextraction_ray.pipelines.full_pipeline import (dedup_latest_by_url,
                                                       run_full_pipeline)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fp_in")
    write_corpus(str(d), 120, seed=11, n_shards=3)
    return str(d)


def test_lang_pushdown(corpus_dir, ray_session):
    paths = sorted(glob.glob(corpus_dir + "/*.parquet"))
    all_rows = extract_pipeline(paths).count()
    en_rows = extract_pipeline(paths, lang="en").count()
    truth = sum(pq.read_table(p, columns=["lang"]).to_pandas()
                .lang.eq("en").sum() for p in paths)
    assert en_rows == truth < all_rows


def test_dedup_latest_by_url(ray_session, tmp_path):
    # two crawls of the same urls with different warc_ts
    t1 = build_corpus_table(20, seed=11)
    bumped = pa.compute.add(t1.column("warc_ts").cast(pa.int64()),
                            10**9).cast(pa.timestamp("us"))
    t2 = t1.set_column(t1.schema.get_field_index("warc_ts"), "warc_ts", bumped)
    from pdfextraction_ray.pipelines.extract_pipeline import parse_pages
    parsed = parse_pages(rd.from_arrow(pa.concat_tables([t1, t2])))
    out = dedup_latest_by_url(parsed).to_pandas()
    assert len(out) == 20
    newest = pq_ts = t2.column("warc_ts").to_pylist()
    assert sorted(out["warc_ts"].tolist()) == sorted(newest)


def test_run_full_pipeline(corpus_dir, ray_session, tmp_path):
    out = str(tmp_path / "out")
    summary = run_full_pipeline(sorted(glob.glob(corpus_dir + "/*.parquet")),
                                out, dedup=True)
    assert summary["written_rows"] == 120
    assert summary["domains"] >= 2
    top = summary["top_domains"][0]
    assert top["n_docs"] >= summary["top_domains"][-1]["n_docs"]


def test_run_full_pipeline_merge_variant(corpus_dir, ray_session, tmp_path):
    out = str(tmp_path / "outm")
    summary = run_full_pipeline(sorted(glob.glob(corpus_dir + "/*.parquet")),
                                out, dedup=False, merge_records=True)
    assert summary["written_rows"] == 120
    merged = rd.read_parquet(out).to_pandas()
    assert {"merged_fields", "merged_tables", "anomalies"} <= set(merged.columns)


def test_multipage_parse_merge_end_to_end(ray_session):
    """F5 realism: multi-record corpus -> parse -> page_number from warc_ts ->
    merge: tables accumulate across pages, repeated fields resolve
    longest-wins with conflict flags."""
    import pyarrow.compute as pc
    from pdfextraction_ray.fixtures import build_multipage_corpus_table
    from pdfextraction_ray.pipelines.extract_pipeline import parse_pages
    from pdfextraction_ray.stages.merge import merge_pages_by_url

    corpus = build_multipage_corpus_table(8, pages_per_doc=3)
    parsed = parse_pages(rd.from_arrow(corpus))

    def add_page_number(t):
        ts = pc.cast(t["warc_ts"], pa.int64())
        page = pc.cast(pc.subtract(ts, pc.multiply(pc.divide(ts, 1000), 1000)),
                       pa.int32())
        return t.append_column("page_number", page)

    pages = parsed.map_batches(add_page_number, batch_format="pyarrow") \
        .select_columns(["url", "page_number", "parse_ok", "fields", "tables"])
    merged = merge_pages_by_url(pages).to_pandas().set_index("url")
    assert len(merged) == 8
    assert (merged.total_pages == 3).all()
    assert (merged.successful_pages == 3).all()
    row = merged.iloc[0]
    # the recurring table spans pages and accumulated rows from all of them
    spanning = [t for t in row.merged_tables if t["spans_multiple_pages"]]
    assert spanning, "expected a table spanning pages"
    assert spanning[0]["total_rows"] >= 3
    assert list(spanning[0]["source_pages"]) == [0, 1, 2]
    # at least one doc has a field conflict from the page-1 repeat
    any_conflict = any(
        any(f["conflict_detected"] for f in fields)
        for fields in merged.merged_fields)
    assert any_conflict


def test_merge_records_multi_crawl_pages_from_warc_ts(ray_session, tmp_path):
    """merge_records must see ALL crawls of a url as ordered pages (regression:
    page_number was hardcoded 1 and the url dedup collapsed pages first)."""
    t1 = build_corpus_table(15, seed=23)
    bumped = pa.compute.add(t1.column("warc_ts").cast(pa.int64()),
                            10**9).cast(pa.timestamp("us"))
    t2 = t1.set_column(t1.schema.get_field_index("warc_ts"), "warc_ts", bumped)
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.concat_tables([t1, t2, t2]),  # t2 twice: same-crawl dup
                   str(src / "shard.parquet"))
    out = str(tmp_path / "out")
    summary = run_full_pipeline([str(src / "shard.parquet")], out,
                                merge_records=True)
    assert summary["written_rows"] == 15
    merged = rd.read_parquet(out).to_pandas()
    # two distinct crawls -> two pages; the duplicated crawl was dropped
    assert (merged.total_pages == 2).all()
    pages = [sorted(f["source_page"] for f in fields if f["source_page"])
             for fields in merged.merged_fields]
    assert any(1 in p and max(p) <= 2 for p in pages if p)

"""The composed end-to-end corpus job: everything a user of the reference
would run, in one streaming Ray Data graph.

    read (optional lang pushdown)
      -> parse (tasks / actor pool; html dies here)
      -> exact url dedup: groupby(url) keep latest warc_ts   [optional]
      -> multi-record merge per url                           [optional]
      -> outputs: envelope parquet + domain histogram (salted two-stage)

Dedup semantics: the corpus may carry multiple crawls of one url; "latest
wins" keeps the row with max warc_ts (deterministic tie-break: the larger
bytes_out). This is the D1 pattern (hash-partition on url + per-group
first) from reference services/result_merger.py:100-118 at corpus scale.
"""

from __future__ import annotations

from typing import Any, Optional, Union

from ..stages.merge import merge_pages_by_url
from ..stages.skew import domain_histogram
from .extract_pipeline import extract_pipeline


def dedup_latest_by_url(ds: "Any") -> "Any":
    """groupby(url) -> keep the newest crawl (max warc_ts, then max
    bytes_out). One wide shuffle keyed on url. pyarrow group format: the
    nested envelope columns (schema/fields/tables structs) do not survive a
    pandas round-trip."""
    import pyarrow as pa

    def latest(g: "pa.Table") -> "pa.Table":
        idx = pa.compute.sort_indices(
            g, sort_keys=[("warc_ts", "descending"), ("bytes_out", "descending")])
        return g.take(idx[:1])

    return ds.groupby("url").map_groups(latest, batch_format="pyarrow")


def run_full_pipeline(paths: Union[str, list[str]], out_dir: str, *,
                      lang: Optional[str] = None,
                      dedup: bool = True,
                      merge_records: bool = False,
                      batch_size: int = 512,
                      ) -> dict[str, Any]:
    """Execute the composed job; returns {written_rows, domains} summary.
    The envelope write and the domain histogram both consume the same parsed
    Dataset; Ray re-executes the lazy graph per consumption, so for the
    small histogram we aggregate from the WRITTEN output columns instead
    (read-back of 3 narrow columns — no reparse)."""
    import ray.data as rd

    parsed = extract_pipeline(paths, batch_size=batch_size, lang=lang)
    if dedup:
        parsed = dedup_latest_by_url(parsed)
    if merge_records:
        import pyarrow as pa

        def add_page(t: "pa.Table") -> "pa.Table":
            return t.append_column("page_number",
                                   pa.array([1] * t.num_rows, pa.int32()))

        merged = merge_pages_by_url(
            parsed.map_batches(add_page, batch_format="pyarrow")
                  .select_columns(["url", "page_number", "parse_ok",
                                   "fields", "tables"]))
        merged.write_parquet(out_dir)
        n = rd.read_parquet(out_dir, columns=["url"]).count()
        return {"written_rows": n, "domains": None}

    parsed.write_parquet(out_dir)
    import glob
    import os
    if not glob.glob(os.path.join(out_dir, "*.parquet")):
        # zero rows selected (e.g. lang filter matched nothing): no files
        return {"written_rows": 0, "domains": 0, "top_domains": []}
    narrow = rd.read_parquet(out_dir, columns=["url", "bytes_out"])
    hist = domain_histogram(narrow).to_pandas()
    return {"written_rows": int(hist["n_docs"].sum()),
            "domains": len(hist),
            "top_domains": hist.nlargest(5, "n_docs")
                               .to_dict(orient="records")}

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

from ..stages.skew import domain_histogram
from .extract_pipeline import extract_pipeline


def dedup_latest_by_url(ds: "Any") -> "Any":
    """groupby(url) -> keep the newest crawl (max warc_ts, then max
    bytes_out). One wide shuffle keyed on url. pyarrow group format: the
    nested envelope columns (schema/fields/tables structs) do not survive a
    pandas round-trip."""
    import pyarrow as pa
    import pyarrow.compute as pc  # pa.compute alone relies on a transitive
    # import (verified: bare pyarrow does not expose .compute)

    def latest(g: "pa.Table") -> "pa.Table":
        idx = pc.sort_indices(
            g, sort_keys=[("warc_ts", "descending"), ("bytes_out", "descending")])
        return g.take(idx[:1])

    from ..functions.joins import hash_group_apply
    return hash_group_apply(ds, ["url"], latest)


def run_full_pipeline(paths: Union[str, list[str]], out_dir: str, *,
                      lang: Optional[str] = None,
                      dedup: bool = True,
                      merge_records: bool = False,
                      batch_size: int = 512,
                      ) -> dict[str, Any]:
    """Execute the composed job; returns {written_rows, domains} summary.

    ``merge_records=True`` BYPASSES ``dedup``: the multi-record merge consumes
    every crawl of a url as ordered pages (page_number = warc_ts rank within
    the url group; same-crawl duplicates dropped in-group), so the url-level
    latest-wins dedup would collapse the pages before the merge saw them.
    ``dedup`` only takes effect when ``merge_records=False``.

    The envelope write and the domain histogram both consume the same parsed
    Dataset; Ray re-executes the lazy graph per consumption, so for the
    small histogram we aggregate from the WRITTEN output columns instead
    (read-back of 3 narrow columns — no reparse)."""
    import glob
    import os
    import shutil

    import ray.data as rd

    # write_parquet APPENDS uniquely-named files: a rerun into a dir with a
    # previous attempt's output would silently double every row and inflate
    # the read-back summary (same contract as runner's stale-dir clear)
    for stale in glob.glob(os.path.join(out_dir, "*.parquet")):
        os.unlink(stale)

    parsed = extract_pipeline(paths, batch_size=batch_size, lang=lang)
    if merge_records:
        # Multi-record merge consumes ALL crawls of a url as ordered pages:
        # page_number = rank of warc_ts within the url group (ties: larger
        # bytes_out first, duplicates of the same crawl dropped). The
        # latest-wins dedup below would collapse the pages before the merge
        # ever saw them, so it is intentionally bypassed on this path — the
        # same-warc_ts dedup happens inside the group, one shuffle total.
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..stages.merge import merge_url_group

        def paginate_and_merge(g: "pa.Table") -> "pa.Table":
            idx = pc.sort_indices(g, sort_keys=[("warc_ts", "ascending"),
                                                ("bytes_out", "descending")])
            g = g.take(idx)
            ts = g.column("warc_ts").to_pylist()
            # a null timestamp identifies nothing: two null-ts crawls are
            # DISTINCT pages, not same-crawl duplicates
            keep = [i for i, t in enumerate(ts)
                    if i == 0 or t is None or ts[i - 1] is None
                    or t != ts[i - 1]]
            g = g.take(pa.array(keep, pa.int64()))
            g = g.append_column("page_number",
                                pa.array(range(1, g.num_rows + 1), pa.int32()))
            return merge_url_group(
                g.select(["url", "page_number", "parse_ok", "fields", "tables"]))

        from ..functions.joins import hash_group_apply
        from ..stages.merge import CLEAN_SCHEMA
        merged = hash_group_apply(
            parsed.select_columns(["url", "warc_ts", "bytes_out",
                                   "parse_ok", "fields", "tables"]),
            ["url"], paginate_and_merge, out_schema=CLEAN_SCHEMA)
        merged.write_parquet(out_dir)
        if not glob.glob(os.path.join(out_dir, "*.parquet")):
            return {"written_rows": 0, "domains": None}
        n = rd.read_parquet(out_dir, columns=["url"]).count()
        return {"written_rows": n, "domains": None}
    if dedup:
        parsed = dedup_latest_by_url(parsed)

    parsed.write_parquet(out_dir)
    if not glob.glob(os.path.join(out_dir, "*.parquet")):
        # zero rows selected (e.g. lang filter matched nothing): no files
        return {"written_rows": 0, "domains": 0, "top_domains": []}
    narrow = rd.read_parquet(out_dir, columns=["url", "bytes_out"])
    hist = domain_histogram(narrow).to_pandas()
    return {"written_rows": int(hist["n_docs"].sum()),
            "domains": len(hist),
            "top_domains": hist.nlargest(5, "n_docs")
                               .to_dict(orient="records")}

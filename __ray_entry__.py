"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline (SURVEY.md §7.2 step 1-5)
over a deterministic page corpus sized from /root/testdata/sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles where SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on a deterministic page corpus derived from sf0.001:
    read -> DocumentParser actor pool -> output envelope Dataset."""
    import ray.data as rd

    from pdfextraction_ray.fixtures import build_corpus_table
    from pdfextraction_ray.pipelines.extract_pipeline import parse_pages
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{SF_SMOKE}/documents.parquet").num_rows
    corpus = rd.from_arrow(build_corpus_table(n, seed=42))
    return parse_pages(corpus)


def queries() -> dict[str, Callable[[str], Any]]:
    from pdfextraction_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdfextraction_ray.queries import ORACLES

    return dict(ORACLES)

"""Resumable flagship run: input shards grouped into partitions, each
partition streamed through the parse pipeline into its own output directory,
committed by an atomic lineage manifest. A killed run restarted with the same
arguments skips committed partitions (north_rule resumability).

Counters per partition (docs, parse failures, bytes in/out — the north_star
metric set) are computed from the *written* parquet by reading back only the
narrow counter columns — the pipeline itself stays streaming end-to-end.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Any, Optional, Union

import pyarrow.parquet as pq
import ray.data as rd

from .. import __version__
from ..state import manifest as M
from .extract_pipeline import parse_pages

PARSER_VERSION = f"pdfextraction_ray/{__version__}"


def plan_partitions(input_paths: list[str], files_per_partition: int = 1,
                    ) -> list[list[str]]:
    """Deterministic partition plan: sorted input files chunked. At 100 TB this
    is the unit of retry/resume — size partitions so one holds O(10 GB)."""
    files = sorted(input_paths)
    return [files[i:i + files_per_partition]
            for i in range(0, len(files), files_per_partition)]


def _partition_counters(part_dir: str) -> dict[str, Any]:
    """Counter aggregate from the written output, reading only the narrow
    columns (columnar pruning — never re-parses)."""
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    docs = ok = n_words = bytes_in = bytes_out = 0
    for f in files:
        t = pq.read_table(f, columns=["parse_ok", "n_words", "bytes_in", "bytes_out"])
        docs += t.num_rows
        ok += t.column("parse_ok").to_pandas().sum()
        n_words += t.column("n_words").to_pandas().sum()
        bytes_in += t.column("bytes_in").to_pandas().sum()
        bytes_out += t.column("bytes_out").to_pandas().sum()
    return {"docs": int(docs), "parse_ok": int(ok),
            "parse_failures": int(docs - ok), "n_words": int(n_words),
            "bytes_in": int(bytes_in), "bytes_out": int(bytes_out)}


def _stabilize_fsspec_http_import() -> None:
    """Make ``fsspec.implementations.http`` imports deterministic before
    thread fan-out. With aiohttp absent that module FAILS on every import;
    Ray's path resolution catches ModuleNotFoundError per call, but when two
    driver threads trigger the re-import simultaneously one can observe a
    partially-initialized module and crash with a plain ImportError
    (ray/data/datasource/path_util.py::_is_http_filesystem). Registering a
    stub whose HTTPFileSystem matches nothing keeps every thread's import
    succeeding and the http check correctly False."""
    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    import sys
    import types
    try:
        import fsspec  # noqa: F401
    except ImportError:
        return

    stub = types.ModuleType("fsspec.implementations.http")

    class _NoHTTPFileSystem:  # sentinel: nothing is an instance of this
        pass

    stub.HTTPFileSystem = _NoHTTPFileSystem
    sys.modules["fsspec.implementations.http"] = stub


def _run_one_partition(part_id: int, files: list[str], out_dir: str,
                       batch_size: int,
                       concurrency: Optional[Union[int, tuple[int, int]]],
                       parser_version: str) -> int:
    t0 = time.perf_counter()
    part_dir = M.partition_output_dir(out_dir, part_id)
    ds = parse_pages(rd.read_parquet(files), batch_size=batch_size,
                     concurrency=concurrency)
    ds.write_parquet(part_dir)
    counters = _partition_counters(part_dir)
    M.write_manifest(out_dir, part_id, input_files=files,
                     parser_version=parser_version, counters=counters,
                     wall_time_s=time.perf_counter() - t0)
    return part_id


def run_resumable(input_paths: Union[str, list[str]], out_dir: str, *,
                  files_per_partition: int = 1,
                  batch_size: int = 64,
                  concurrency: Optional[Union[int, tuple[int, int]]] = None,
                  max_concurrent_partitions: int = 1,
                  parser_version: str = PARSER_VERSION) -> dict[str, Any]:
    """Run the flagship pipeline partition-by-partition with commit manifests.

    Returns the job summary (partitions run/skipped + aggregated counters).
    Each partition is its own bounded Ray Data pipeline (streaming within the
    partition); failures leave no manifest, so the partition reruns next time.

    ``max_concurrent_partitions`` is accepted for API stability but values
    > 1 currently fall back to sequential execution with a RuntimeWarning —
    see the inline note on the Ray 2.49 concurrent-execution deadlock.
    """
    if isinstance(input_paths, str):
        input_paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
    partitions = plan_partitions(list(input_paths), files_per_partition)
    done = M.committed_partitions(out_dir, parser_version)
    todo = [(pid, files) for pid, files in enumerate(partitions) if pid not in done]
    skipped = [pid for pid in range(len(partitions)) if pid in done]
    ran: list[int] = []
    if max_concurrent_partitions > 1:
        # Driver-thread-concurrent partition execution was prototyped and
        # REMOVED: in Ray 2.49 several streaming executions launched from
        # driver threads intermittently deadlock at executor startup
        # (threads parked in get_output_blocking; reproducible under pytest,
        # not in plain scripts) and lazy fsspec imports race (see
        # _stabilize_fsspec_http_import). Partitions therefore run
        # sequentially — each one saturates the cluster on its own, so the
        # only loss is the per-partition tail. Revisit on a newer Ray.
        import warnings
        warnings.warn("max_concurrent_partitions > 1 is not supported on "
                      "this Ray version; running partitions sequentially",
                      RuntimeWarning, stacklevel=2)
    for part_id, files in todo:
        ran.append(_run_one_partition(part_id, files, out_dir, batch_size,
                                      concurrency, parser_version))
    summary = M.job_summary(out_dir)
    summary["partitions_run"] = ran
    summary["partitions_skipped"] = skipped
    return summary

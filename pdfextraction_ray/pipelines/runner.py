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
import shutil
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


def generic_counters(part_dir: str) -> dict[str, Any]:
    """Pipeline-agnostic partition counters: written rows + bytes (footer
    metadata only — nothing is re-read)."""
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    return {"rows": int(rows),
            "bytes_out": int(sum(os.path.getsize(f) for f in files))}


def _run_one_partition(part_id: int, files: list[str], out_dir: str,
                       batch_size: int,
                       concurrency: Optional[Union[int, tuple[int, int]]],
                       parser_version: str,
                       pipeline_fn: Any = None,
                       counters_fn: Any = None) -> int:
    t0 = time.perf_counter()
    part_dir = M.partition_output_dir(out_dir, part_id)
    # A prior attempt may have crashed after writing some parquet but before
    # committing the manifest; write_parquet ADDS uniquely-named files, so
    # rerunning into a stale dir would duplicate rows. Uncommitted output is
    # garbage by contract — clear it first.
    shutil.rmtree(part_dir, ignore_errors=True)
    if pipeline_fn is None:
        ds = parse_pages(rd.read_parquet(files), batch_size=batch_size,
                         concurrency=concurrency)
    else:
        ds = pipeline_fn(rd.read_parquet(files))
    ds.write_parquet(part_dir)
    counters = (counters_fn or _partition_counters)(part_dir)
    M.write_manifest(out_dir, part_id, input_files=files,
                     parser_version=parser_version, counters=counters,
                     wall_time_s=time.perf_counter() - t0)
    return part_id


def run_partitioned(pipeline_fn, input_paths: Union[str, list[str]],
                    out_dir: str, *, files_per_partition: int = 1,
                    version: str, counters_fn=generic_counters,
                    ) -> dict[str, Any]:
    """Generic resumable partitioned run for ANY Dataset->Dataset pipeline:
    the flagship runner's checkpoint/commit/skip machinery with the pipeline
    injected. ``pipeline_fn(ds)`` receives the partition's raw read and
    returns the Dataset to write; ``version`` plays the parser_version role
    (bump it to invalidate committed partitions). Sequential partitions —
    each partition's pipeline saturates the cluster on its own; the
    concurrent-window mode stays flagship-only (its actor-pool deadlock
    guard is parse-specific). CROSS-PARTITION semantics are the caller's
    responsibility: any global state (dedup winner sets, vocabularies) must
    be computed before and closed over deterministically, so a resumed run
    rebuilds the identical state (see training_prep_resumable)."""
    if isinstance(input_paths, str):
        input_paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
    partitions = plan_partitions(list(input_paths), files_per_partition)
    done = M.committed_partitions(
        out_dir, version,
        expected_inputs={i: f for i, f in enumerate(partitions)})
    ran: list[int] = []
    skipped = [pid for pid in range(len(partitions)) if pid in done]
    for part_id, files in enumerate(partitions):
        if part_id in done:
            continue
        ran.append(_run_one_partition(
            part_id, files, out_dir, 0, None, version,
            pipeline_fn=pipeline_fn, counters_fn=counters_fn))
    summary = M.job_summary(out_dir, valid_ids=set(range(len(partitions))))
    summary["partitions_run"] = ran
    summary["partitions_skipped"] = skipped
    return summary


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

    ``max_concurrent_partitions > 1`` submits partitions as ``ray.remote``
    driver tasks (a sliding window of that width): each task launches its own
    bounded Ray Data pipeline, so per-partition tails overlap instead of
    idling the cluster. Driver-THREAD concurrency was tried first and removed
    — on Ray 2.49 several streaming executions launched from driver threads
    intermittently deadlock at executor startup (threads parked in
    get_output_blocking) and lazy fsspec imports race (see
    _stabilize_fsspec_http_import); remote tasks have neither problem. The
    orchestrating tasks take ``num_cpus=0`` so they never hold CPU slots the
    pipelines they launch need.

    NOTE: in that mode an explicit ``concurrency`` argument (actor-pool parse
    stage) is IGNORED with a warning — actor pools reserve CPUs while starved
    and deadlock concurrent nested pipelines; the task-form parse stage has
    identical semantics. Run partitions sequentially if an actor pool is
    required.
    """
    if isinstance(input_paths, str):
        input_paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
    partitions = plan_partitions(list(input_paths), files_per_partition)
    done = M.committed_partitions(
        out_dir, parser_version,
        expected_inputs={i: f for i, f in enumerate(partitions)})
    todo = [(pid, files) for pid, files in enumerate(partitions) if pid not in done]
    skipped = [pid for pid in range(len(partitions)) if pid in done]
    ran: list[int] = []
    if max_concurrent_partitions > 1 and len(todo) > 1:
        import ray
        _stabilize_fsspec_http_import()
        # Deadlock guard for concurrent nested pipelines: actor pools RESERVE
        # their CPUs even while starved, so W windows x N actors can hold
        # every CPU while the read tasks that would feed them never get one
        # (observed intermittently even with elastic (1, N) pools on a 4-CPU
        # box). The task form of the parse stage has identical semantics
        # (per-worker cached parser, stages/parse.py:72) and task pools
        # cannot reserve-deadlock — concurrent partitions therefore always
        # use it; run partitions sequentially when an actor pool is required
        # (heavyweight state), where each partition saturates the cluster on
        # its own.
        if concurrency is not None:
            import warnings
            warnings.warn(
                "max_concurrent_partitions > 1 forces the task-form parse "
                "stage; the explicit concurrency=%r (actor pool) is ignored "
                "to avoid actor-pool CPU-reservation deadlock across "
                "concurrent nested pipelines" % (concurrency,),
                stacklevel=2)
        concurrency = None
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        window = max(1, min(max_concurrent_partitions, ncpu - 1))
        run_remote = ray.remote(num_cpus=0)(_run_one_partition)
        in_flight: dict = {}
        idx = 0
        while idx < len(todo) or in_flight:
            while idx < len(todo) and len(in_flight) < window:
                part_id, files = todo[idx]
                idx += 1
                ref = run_remote.remote(part_id, files, out_dir, batch_size,
                                        concurrency, parser_version)
                in_flight[ref] = part_id
            finished, _ = ray.wait(list(in_flight), num_returns=1)
            for ref in finished:
                ran.append(ray.get(ref))
                del in_flight[ref]
        ran.sort()
    else:
        for part_id, files in todo:
            ran.append(_run_one_partition(part_id, files, out_dir, batch_size,
                                          concurrency, parser_version))
    summary = M.job_summary(out_dir, valid_ids=set(range(len(partitions))))
    summary["partitions_run"] = ran
    summary["partitions_skipped"] = skipped
    return summary

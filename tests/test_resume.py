"""Resumable-runner semantics: atomic manifests, skip-on-resume, version
invalidation, counter aggregation."""

import json
import os

import pytest

from pdfextraction_ray.fixtures import write_corpus
from pdfextraction_ray.pipelines import runner as R
from pdfextraction_ray.state import manifest as M


@pytest.fixture()
def corpus(tmp_path):
    return write_corpus(str(tmp_path / "in"), 60, seed=7, n_shards=3)


def test_run_then_resume_skips_committed(tmp_path, corpus, ray_session):
    out = str(tmp_path / "out")
    s1 = R.run_resumable(corpus, out, files_per_partition=1, concurrency=2)
    assert s1["partitions_run"] == [0, 1, 2]
    assert s1["counters"]["docs"] == 60
    assert s1["counters"]["parse_failures"] == 0
    s2 = R.run_resumable(corpus, out, files_per_partition=1, concurrency=2)
    assert s2["partitions_run"] == []
    assert s2["partitions_skipped"] == [0, 1, 2]
    assert s2["counters"]["docs"] == 60  # unchanged totals


def test_partial_run_resumes_missing_partition(tmp_path, corpus, ray_session):
    out = str(tmp_path / "out")
    R.run_resumable(corpus, out, files_per_partition=1, concurrency=2)
    # simulate a crash that lost partition 1's commit
    os.unlink(os.path.join(out, "_manifest", "part-0001.json"))
    s = R.run_resumable(corpus, out, files_per_partition=1, concurrency=2)
    assert s["partitions_run"] == [1]
    assert s["partitions_skipped"] == [0, 2]


def test_version_bump_invalidates(tmp_path, corpus, ray_session):
    out = str(tmp_path / "out")
    R.run_resumable(corpus, out, files_per_partition=1, concurrency=2)
    s = R.run_resumable(corpus, out, files_per_partition=1, concurrency=2,
                        parser_version="pdfextraction_ray/NEXT")
    assert s["partitions_run"] == [0, 1, 2]


def test_torn_manifest_counts_as_uncommitted(tmp_path):
    out = str(tmp_path / "o")
    os.makedirs(os.path.join(out, "_manifest"))
    with open(os.path.join(out, "_manifest", "part-0000.json"), "w") as f:
        f.write('{"partition": 0, "parser_ver')  # torn write
    assert M.committed_partitions(out, "v") == set()


def test_manifest_atomicity_and_content(tmp_path):
    out = str(tmp_path / "o")
    path = M.write_manifest(out, 3, input_files=["b.parquet", "a.parquet"],
                            parser_version="v1", counters={"docs": 5},
                            wall_time_s=1.234)
    rec = json.load(open(path))
    assert rec["input_files"] == ["a.parquet", "b.parquet"]
    assert rec["counters"]["docs"] == 5
    assert not [p for p in os.listdir(os.path.dirname(path))
                if p.endswith(".tmp")]


def test_output_partition_layout(tmp_path, corpus, ray_session):
    out = str(tmp_path / "out")
    R.run_resumable(corpus, out, files_per_partition=2, concurrency=2)
    # 3 input files / 2 per partition -> 2 partitions
    assert sorted(d for d in os.listdir(out) if d.startswith("part=")) == \
        ["part=0000", "part=0001"]
    summary = M.job_summary(out)
    assert summary["partitions"] == 2
    assert summary["counters"]["docs"] == 60


def test_concurrent_partitions_run_in_parallel(tmp_path, corpus, ray_session):
    """max_concurrent_partitions > 1 submits partitions as ray.remote driver
    tasks (driver THREADS deadlock on Ray 2.49 — see runner docstring);
    results and manifests must be identical to the sequential path."""
    out = str(tmp_path / "outc")
    s = R.run_resumable(corpus, out, files_per_partition=1,
                        max_concurrent_partitions=3, concurrency=2)
    assert s["partitions_run"] == [0, 1, 2]
    assert s["counters"]["docs"] == 60
    s2 = R.run_resumable(corpus, out, files_per_partition=1,
                         max_concurrent_partitions=3, concurrency=2)
    assert s2["partitions_run"] == []
    assert s2["partitions_skipped"] == [0, 1, 2]


def test_resume_clears_stale_uncommitted_output(tmp_path, corpus, ray_session):
    """A partition that crashed after writing parquet but before its manifest
    commit must not duplicate rows on re-run (write_parquet ADDS files)."""
    import glob as _glob
    out = str(tmp_path / "out")
    R.run_resumable(corpus, out, files_per_partition=1, concurrency=2)
    # simulate the crash: full stale output present, commit record lost
    os.unlink(os.path.join(out, "_manifest", "part-0001.json"))
    stale = _glob.glob(os.path.join(out, "part=0001", "*.parquet"))
    assert stale, "precondition: partition 1 has uncommitted parquet"
    s = R.run_resumable(corpus, out, files_per_partition=1, concurrency=2)
    assert s["partitions_run"] == [1]
    assert s["counters"]["docs"] == 60  # not 80: stale files were cleared


def test_run_partitioned_failure_leaves_no_manifest(ray_session, tmp_path):
    """A pipeline that dies mid-partition commits nothing for it; the rerun
    picks up exactly the failed partition (the generic runner inherits the
    flagship crash contract)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfextraction_ray.pipelines.runner import run_partitioned

    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}),
                       src / f"f{i}.parquet")
    out = tmp_path / "out"
    calls = []

    def flaky(ds):
        def fn(t: pa.Table) -> pa.Table:
            if 15 in t.column("x").to_pylist():  # partition 1 poisons
                raise RuntimeError("boom")
            return t
        return ds.map_batches(fn, batch_format="pyarrow")

    import pytest
    with pytest.raises(Exception):
        run_partitioned(flaky, str(src), str(out), version="v1")
    committed = sorted(glob.glob(str(out / "_manifest" / "*.json")))
    # partition 1 (the poisoned one) must NOT be committed; partition 0
    # normally is (a transient infra failure on it just means it reruns)
    assert not any(p.endswith("part-0001.json") for p in committed)
    committed_ids = sorted(int(p[-9:-5]) for p in committed)

    def ok(ds):
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    s = run_partitioned(ok, str(src), str(out), version="v1")
    assert s["partitions_skipped"] == committed_ids
    assert s["partitions_run"] == sorted(set(range(3)) - set(committed_ids))
    assert 1 in s["partitions_run"]  # the poisoned partition reran
    rows = sum(pq.read_metadata(p).num_rows for p in
               glob.glob(str(out / "**" / "*.parquet"), recursive=True))
    assert rows == 30


def test_resume_detects_input_set_change(ray_session, tmp_path):
    """Adding an input shard shifts partition ids; committed manifests whose
    recorded inputs no longer match the new plan must rerun instead of
    masquerading as other partitions' output."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfextraction_ray.pipelines.runner import run_partitioned

    src = tmp_path / "in"
    src.mkdir()
    for name in ("b.parquet", "c.parquet"):
        pq.write_table(pa.table({"x": [1, 2, 3]}), src / name)
    out = tmp_path / "out"

    def ident(ds):
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    s1 = run_partitioned(ident, str(src), str(out), version="v1")
    assert s1["partitions_run"] == [0, 1]

    # new shard sorts FIRST -> every partition id shifts
    pq.write_table(pa.table({"x": [9]}), src / "a.parquet")
    s2 = run_partitioned(ident, str(src), str(out), version="v1")
    assert s2["partitions_run"] == [0, 1, 2]  # nothing skippable
    rows = sum(pq.read_metadata(p).num_rows for p in
               glob.glob(str(out / "**" / "*.parquet"), recursive=True))
    assert rows == 7

"""CLI subcommand tests that own their own Ray session — run as
subprocesses so they cannot tear down the shared session-scoped fixture
(the CLI calls ray.shutdown() on exit)."""

import json
import os
import shutil
import subprocess
import sys

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_compact_merges_small_files(tmp_path):
    src = tmp_path / "many"
    src.mkdir()
    t = pq.read_table(f"{SF}/documents.parquet")
    for i in range(6):  # six small shards of the same table
        pq.write_table(t.slice(i * 80, 80), src / f"part-{i}.parquet")
    out = tmp_path / "compact"
    env = dict(os.environ, RAY_ADDRESS="local")
    res = subprocess.run(
        [sys.executable, "-m", "pdfextraction_ray", "--num-cpus", "4",
         "compact", "--input", str(src), "--out", str(out),
         "--target-mb", "256"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=240)
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["in_files"] == 6
    assert summary["out_files"] == 1  # 6 tiny shards -> one target-size file
    assert summary["rows"] == 480
    got = pq.read_table(str(out))
    assert got.num_rows == 480
    assert sorted(got.column("doc_id").to_pylist()) == sorted(
        t.slice(0, 480).column("doc_id").to_pylist())


def test_analyze_report(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "pdfextraction_ray", "--num-cpus", "4",
         "analyze", "--sf-dir", SF],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["checksum"]["n_rows"] == [500]
    assert sorted(report["per_lang"]["lang"]) == report["per_lang"]["lang"]
    assert report["unique_docs"] <= 500
    assert set(report["value_percentiles"]) >= {"event_type", "p50", "p99"}


def test_prep_cli_with_excision(tmp_path):
    out = tmp_path / "prep"
    res = subprocess.run(
        [sys.executable, "-m", "pdfextraction_ray", "--num-cpus", "4",
         "prep", "--input", f"{SF}/documents.parquet", "--out", str(out),
         "--min-tokens", "50", "--excise-spans"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    got = pq.read_table(str(out)).to_pandas()
    assert len(got) > 0
    assert set(got.split) <= {"train", "val", "test"}
    # excision only removes: each doc's first chunk is a SUBSEQUENCE of
    # its original token stream (tokens may disappear, never appear)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")
    first = got[got.chunk_id == 0].set_index("doc_id").chunk_text
    for doc_id in list(first.index)[:20]:
        orig = iter(docs.loc[doc_id, "text"].split(" "))
        assert all(tok in orig for tok in first.loc[doc_id].split(" "))

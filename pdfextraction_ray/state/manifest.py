"""Per-partition commit manifest for resumable runs (SURVEY §4, north_rule
"resumable from checkpoint with per-partition lineage + metrics").

The reference keeps per-step results in a single mutable ``documents.json``
(reference storage.py:124-183) and re-runs a crashed step from the previous
step's saved output; at corpus scale that becomes: one output directory per
input partition, plus one small JSON lineage record per COMMITTED partition,
written atomically (temp file + rename). Resume = skip partitions whose
manifest exists and matches the current parser version; a version bump
invalidates all previous work (SURVEY §7.5).

Layout:

    out_dir/
      part=0000/ *.parquet        <- partition output (only after success)
      _manifest/part-0000.json    <- lineage: inputs, version, counters
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional

MANIFEST_DIR = "_manifest"


def _manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{part_id:04d}.json")


def partition_output_dir(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part={part_id:04d}")


def write_manifest(out_dir: str, part_id: int, *, input_files: list[str],
                   parser_version: str, counters: dict[str, Any],
                   wall_time_s: float) -> str:
    """Atomic commit record: write to a temp file in the manifest dir, then
    rename (rename is atomic on POSIX within one filesystem)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    record = {
        "partition": part_id,
        "input_files": sorted(input_files),
        "parser_version": parser_version,
        "counters": counters,
        "wall_time_s": round(wall_time_s, 3),
    }
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        os.replace(tmp, _manifest_path(out_dir, part_id))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return _manifest_path(out_dir, part_id)


def read_manifest(out_dir: str, part_id: int) -> Optional[dict[str, Any]]:
    path = _manifest_path(out_dir, part_id)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None  # torn/corrupt manifest counts as uncommitted


def committed_partitions(out_dir: str, parser_version: str,
                         expected_inputs: Optional[dict] = None) -> set[int]:
    """Partition ids safely skippable on resume: manifest readable AND parser
    version matches AND (when ``expected_inputs`` — {part_id: [files]} from
    the CURRENT partition plan — is given) the manifest's recorded input
    files equal the plan's. The lineage check catches input-set changes
    between runs (added/removed shards, different files_per_partition):
    partition ids shift with the plan, so a committed manifest whose inputs
    no longer match must rerun rather than masquerade as the new
    partition's output."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            # the id is everything between 'part-' and '.json' — [5:9]
            # would mis-parse runs with >= 10000 partitions ({:04d} does
            # not truncate wider ids) and resume would re-run them all
            part_id = int(name[5:-5])
        except ValueError:
            continue
        rec = read_manifest(out_dir, part_id)
        if not rec or rec.get("parser_version") != parser_version:
            continue
        if expected_inputs is not None and \
                rec.get("input_files") != sorted(
                    expected_inputs.get(part_id, ())):
            continue
        done.add(part_id)
    return done


def write_feedback_audit(out_dir: str, rules: list, *, iteration: int,
                         derived_from: Optional[dict] = None) -> str:
    """Persist a feedback-derivation audit trail beside the partition
    lineage records (reference storage.py:47-57 keeps
    {step, timestamp, user_feedback, result_before, result_after,
    iteration} per correction; the engine records the same lineage at
    derived-RULE granularity — each rule carries before/after parameter
    values, its supporting correction count and the error-type evidence,
    produced by ``stages.feedback.derive_overrides``).

    One atomic JSON per derivation iteration:
    ``_manifest/feedback-audit-iter-0001.json``. The ``part-*.json``
    scanners (committed_partitions / job_summary) never pick these up —
    the filename prefix differs — so audit records coexist with resume
    state in the same manifest directory."""
    import time
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    record = {
        "iteration": int(iteration),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rules": list(rules),
        "derived_from": derived_from or {},
    }
    path = os.path.join(mdir, f"feedback-audit-iter-{iteration:04d}.json")
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def read_feedback_audit(out_dir: str) -> list:
    """All feedback-audit records under ``out_dir``, ordered by iteration.
    Torn/corrupt records are skipped (same policy as read_manifest)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out = []
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("feedback-audit-iter-")
                and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
        except (json.JSONDecodeError, OSError):
            continue
    return sorted(out, key=lambda r: r.get("iteration", 0))


def job_summary(out_dir: str,
                valid_ids: Optional[set] = None) -> dict[str, Any]:
    """Aggregate counters across committed manifests (the G2/G8-style
    job-level metrics view). ``valid_ids`` (the CURRENT partition plan's
    ids) excludes stale manifests left by an earlier run with a different
    plan — without it a replan from 10 to 2 partitions would sum all 10.
    Corrupt manifests are skipped like read_manifest treats them
    (uncommitted), never fatal after the work already succeeded."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    total: dict[str, Any] = {"partitions": 0, "wall_time_s": 0.0}
    counters: dict[str, float] = {}
    if not os.path.isdir(mdir):
        return {**total, "counters": counters}
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            part_id = int(name[5:-5])
        except ValueError:
            continue
        if valid_ids is not None and part_id not in valid_ids:
            continue
        rec = read_manifest(out_dir, part_id)
        if rec is None:
            continue
        total["partitions"] += 1
        total["wall_time_s"] += rec.get("wall_time_s", 0.0)
        for k, v in rec.get("counters", {}).items():
            if isinstance(v, (int, float)):
                counters[k] = counters.get(k, 0) + v
    return {**total, "counters": counters}

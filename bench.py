"""Benchmark harness (driver contract).

Plain run: one JSON line with the headline flagship-pipeline wall time plus
per-query timings over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), in a
session of ``$RAY_GRAFT_CPUS`` CPUs (default 32).

``--scaling``: runs the same job twice in fresh processes at 8 and 32 CPUs on
the same input and reports both throughputs + scaling efficiency
(the sandbox substitute for the N->4N-node criterion — BASELINE.md).

The bench corpus (synthetic pages, FIXTURES.md F1) is generated once into
/tmp and reused; generation and page-cache warmup are untimed.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "200000"))
CORPUS_SHARDS = 32

# Queries are timed one FAMILY per fresh Ray session (VERDICT r3 #7): a
# 58-query single-session sweep inflates late queries 3-4x via object-store
# bloat, making round-over-round per-query deltas meaningless. Family
# boundaries follow module/shape so a regression localizes.
# (near_dup_clusters is excluded: it re-runs minhash_near_dup_pairs.)
BENCH_FAMILIES: dict[str, list[str]] = {
    "core_sql": ["pricing_summary", "events_by_type", "top_recent_events",
                 "token_stats", "lineitem_semi_join", "segment_revenue",
                 "props_json_sum", "top_event_per_user", "value_percentiles",
                 "user_sessions", "merge_longest_wins", "curated_documents",
                 "exact_dedup"],
    "dedup": ["minhash_near_dup_pairs", "simhash_near_dup_pairs"],
    "embedding": ["embedding_topk", "embedding_ann_ivf", "kmeans_clusters",
                  "semantic_dedup", "mean_embedding_by_label",
                  "logreg_train", "logreg_score"],
    "curation": ["redact_props", "word_repetition", "tfidf_terms",
                 "term_frequencies", "decontaminate", "stratified_sample",
                 "approx_distinct_users", "weighted_sample",
                 "docs_by_lang_sample", "doc_row_numbers", "corpus_checksum"],
    "analytics": ["zscore_events", "top3_events_per_user",
                  "heavy_hitter_terms", "inverted_index", "events_range_join",
                  "asof_join", "user_activity_features", "value_change_counts",
                  "rolling_event_stats", "event_type_pivot",
                  "customer_event_full_outer", "value_quartile_buckets",
                  "value_percentiles_hist", "orders_rollup", "funnel_stages",
                  "user_event_set_ops"],
    "training_scale": ["doc_chunks", "sequence_packing", "split_assignment",
                       "domain_quota_sample", "orders_bloom_semi_join",
                       "brand_revenue_bucketed", "bucketed_storage_join",
                       "storage_full_outer_join", "incremental_dedup"],
    "graph_lm": ["bigram_perplexity", "dup_ngram_spans",
                 "exact_substring_spans", "dedup_span_excision", "pagerank",
                 "connected_components", "triangle_count"],
    "media_warc": ["video_features", "warc_extract", "vision_layout_ab"],
}
BENCH_QUERIES = [q for fam in BENCH_FAMILIES.values() for q in fam]


def _generate_corpus(n_docs: int, out_dir: str) -> None:
    """(Runs in its own subprocess so the timed session stays clean.)"""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from pdfextraction_ray.fixtures import CORPUS_SCHEMA, make_page_row
    import pyarrow as pa
    import numpy as np

    def gen(batch) -> "pa.Table":
        rows = [make_page_row(int(i)) for i in batch["id"]]
        return pa.Table.from_pydict(
            {"url": [r["url"] for r in rows],
             "warc_ts": np.array([r["warc_ts"] for r in rows],
                                 dtype="datetime64[us]"),
             "html": [r["html"] for r in rows],
             "text": [r["text"] for r in rows],
             "lang": [r["lang"] for r in rows]}, schema=CORPUS_SCHEMA)

    (rd.range(n_docs, override_num_blocks=CORPUS_SHARDS)
       .map_batches(gen, batch_format="pandas", batch_size=2048)
       .write_parquet(out_dir))
    ray.shutdown()


def ensure_corpus(n_docs: int) -> list[str]:
    """Generate the deterministic bench corpus (subprocess, cached)."""
    out_dir = f"/tmp/pdfextraction_ray_bench/pages_n{n_docs}_s42"
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir)
        code = (f"import bench; bench._generate_corpus({n_docs}, {out_dir!r})")
        subprocess.run([sys.executable, "-c", code], check=True,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
        with open(done, "w") as f:
            f.write("ok")
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from pdfextraction_ray.pipelines.extract_pipeline import extract_pipeline
    from pdfextraction_ray.queries import QUERIES

    paths = ensure_corpus(N_DOCS)
    corpus_bytes = sum(os.path.getsize(p) for p in paths)
    for p in paths:  # warm the OS page cache (untimed)
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass

    # warm-up (untimed): spins up Ray worker processes and imports so the
    # timed section measures steady-state throughput, not process cold-start
    warm_dir = f"/tmp/pdfextraction_ray_bench/warm_{NUM_CPUS}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    extract_pipeline(paths[:4]).write_parquet(warm_dir)

    out_dir = f"/tmp/pdfextraction_ray_bench/out_{NUM_CPUS}"
    headline = None
    for _rep in range(int(os.environ.get("GRAFT_BENCH_REPS", "2"))):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = extract_pipeline(paths)
        ds.write_parquet(out_dir)
        rep_s = time.perf_counter() - t0
        headline = rep_s if headline is None else min(headline, rep_s)

    # in-session flagship re-run: quantifies session bloat explicitly
    # instead of letting it contaminate per-query numbers
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    extract_pipeline(paths).write_parquet(out_dir)
    insession = time.perf_counter() - t0
    # the family subprocesses each start their own Ray head — shut this
    # session down first so two heads never double-reserve the object store
    ray.shutdown()

    q_times: dict[str, float] = {}
    if not os.environ.get("GRAFT_BENCH_SKIP_QUERIES"):
        import tempfile
        for fam in BENCH_FAMILIES:  # one fresh Ray session per family
            with tempfile.NamedTemporaryFile("r", suffix=".json") as tf:
                # result rides a file, not stdout — raylet/library prints
                # after the JSON line must not kill the whole bench run
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--run-family", fam, "--out", tf.name],
                    capture_output=True, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    env=dict(os.environ))
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"bench family {fam!r} failed:\n{proc.stderr[-4000:]}")
                q_times.update(json.load(open(tf.name)))

    e2e = {}
    if not os.environ.get("GRAFT_BENCH_SKIP_QUERIES"):
        import tempfile
        with tempfile.NamedTemporaryFile("r", suffix=".json") as tf:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run-e2e", "--out", tf.name],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env=dict(os.environ))
            if proc.returncode != 0:
                raise RuntimeError(
                    f"bench e2e failed:\n{proc.stderr[-4000:]}")
            e2e = json.load(open(tf.name))

    result = {
        "metric": "flagship_extract_sec",
        "value": round(headline, 3),
        **e2e,
        "unit": "sec",
        "flagship_insession_sec": round(insession, 3),
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": N_DOCS,
        "corpus_mb": round(corpus_bytes / 1e6, 1),
        "docs_per_sec": round(N_DOCS / headline, 1),
        "mb_per_sec": round(corpus_bytes / 1e6 / headline, 2),
    }
    ray.shutdown()
    return result


def run_family(family: str) -> dict:
    """Time one query family in this (fresh) process; prints {name: sec}."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import ray.data as rd
    # spin up worker processes untimed so the family's first query does not
    # absorb cold-start
    rd.range(10_000).map_batches(lambda b: b).materialize()

    from pdfextraction_ray.queries import QUERIES
    # timing-only: no golden compare happens here, so disable the
    # wrong-scale golden guard (goldens are pinned at sf0.001/sf0.01)
    os.environ.setdefault("PDFX_NO_GOLDEN_GUARD", "1")
    q_times: dict[str, float] = {}
    for name in BENCH_FAMILIES[family]:
        tq = time.perf_counter()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "materialize"):
            res = res.materialize()
        q_times[name] = round(time.perf_counter() - tq, 3)
    ray.shutdown()
    return q_times


def run_e2e() -> dict:
    """The composed curation job (VERDICT r4 #8) over the bench corpus in
    a fresh session: parse -> quality -> langid -> exact dedup -> minhash
    near-dup drop -> span excision -> split -> chunk -> pack -> parquet
    sink. One number for the composed training-prep path, not just its
    stages."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import ray.data as rd

    from pdfextraction_ray.pipelines.e2e import curation_e2e_pages

    paths = ensure_corpus(N_DOCS)
    # spin up worker processes untimed
    rd.range(10_000).map_batches(lambda b: b).materialize()
    out_dir = f"/tmp/pdfextraction_ray_bench/e2e_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    curation_e2e_pages(paths, out_dir)
    sec = time.perf_counter() - t0
    n_chunks = sum(
        pq_f.metadata.num_rows for pq_f in
        (__import__("pyarrow.parquet", fromlist=["ParquetFile"])
         .ParquetFile(p)
         for p in glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                            recursive=True)))
    ray.shutdown()
    return {"curation_e2e_sec": round(sec, 3),
            "curation_e2e_docs_per_sec": round(N_DOCS / sec, 1),
            "curation_e2e_chunks": n_chunks}


def run_scaling() -> dict:
    """Same job, fresh process per parallelism level, best-of-reps timing.

    Two N->4N pairs are reported: 2->8 CPUs (below this box's memory-bandwidth
    wall — the regime that models adding NODES, each with its own bandwidth)
    and 8->32 (where even a zero-framework multiprocessing baseline only
    scales ~2.3x on this machine; see BASELINE.md for the ceiling analysis).
    The headline value is the 2->8 efficiency.
    """
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_SKIP_QUERIES="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])
    r = {n: run(n) for n in (2, 8, 32)}
    eff_2_8 = (r[2]["value"] / r[8]["value"]) / 4
    eff_8_32 = (r[8]["value"] / r[32]["value"]) / 4
    return {
        "metric": "scaling_efficiency_2_to_8",
        "value": round(eff_2_8, 3),
        "unit": "ratio",
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
        "sec_2": r[2]["value"], "sec_8": r[8]["value"], "sec_32": r[32]["value"],
        "docs_per_sec_2": r[2]["docs_per_sec"],
        "docs_per_sec_8": r[8]["docs_per_sec"],
        "docs_per_sec_32": r[32]["docs_per_sec"],
        "bench_docs": r[8]["bench_docs"], "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--run-e2e" in sys.argv:
        res = run_e2e()
        if "--out" in sys.argv:
            with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
                json.dump(res, f)
        print(json.dumps(res))
    elif "--run-family" in sys.argv:
        res = run_family(sys.argv[sys.argv.index("--run-family") + 1])
        if "--out" in sys.argv:
            with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
                json.dump(res, f)
        print(json.dumps(res))
    else:
        print(json.dumps(run_bench()))

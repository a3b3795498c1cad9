"""CLI: ``python -m pdfextraction_ray <command>``.

Commands:
  run      resumable flagship extraction over a corpus directory
  full     composed job (parse -> dedup -> histogram) without checkpoints
  gen      generate a deterministic synthetic corpus (FIXTURES.md F1)
  prep     training-set prep: curate -> dedup -> split -> chunk -> parquet
  compact  merge small parquet files into ~target-MB outputs (post-run tidy)
  analyze  one-shot corpus report over a testdata-shaped table dir
  stats    print per-stage ds.stats() for a pipeline run (tuning aid)

Owns the Ray session (scripts do; library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 **({"num_cpus": num_cpus} if num_cpus else {}))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdfextraction_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="resumable extraction run")
    p_run.add_argument("--input", required=True, help="corpus dir of parquet shards")
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--files-per-partition", type=int, default=1)

    p_full = sub.add_parser("full", help="composed parse+dedup+histogram job")
    p_full.add_argument("--input", required=True)
    p_full.add_argument("--out", required=True)
    p_full.add_argument("--lang", default=None)
    p_full.add_argument("--no-dedup", action="store_true")

    p_gen = sub.add_parser("gen", help="generate synthetic corpus")
    p_gen.add_argument("--out", required=True)
    p_gen.add_argument("--rows", type=int, default=10000)
    p_gen.add_argument("--seed", type=int, default=42)
    p_gen.add_argument("--shards", type=int, default=8)

    p_prep = sub.add_parser("prep", help="training-set preparation pipeline")
    p_prep.add_argument("--input", required=True,
                        help="documents parquet file or dir")
    p_prep.add_argument("--out", required=True)
    p_prep.add_argument("--min-tokens", type=int, default=50)
    p_prep.add_argument("--excise-spans", action="store_true",
                        help="remove duplicated >=8-token spans (Lee et al. "
                             "exact-substring excision) before chunking")

    p_cmp = sub.add_parser("compact", help="compact small parquet files")
    p_cmp.add_argument("--input", required=True, help="dir of parquet files")
    p_cmp.add_argument("--out", required=True)
    p_cmp.add_argument("--target-mb", type=int, default=256,
                       help="approximate output file size")

    p_an = sub.add_parser("analyze", help="corpus report (JSON) over an "
                          "sf-style dir of documents/events parquet")
    p_an.add_argument("--sf-dir", required=True)

    p_stats = sub.add_parser("stats", help="run pipeline and print ds.stats()")
    p_stats.add_argument("--input", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "gen":
        from .fixtures import write_corpus

        paths = write_corpus(args.out, args.rows, seed=args.seed,
                             n_shards=args.shards)
        print(json.dumps({"written_files": len(paths), "rows": args.rows}))
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "run":
            from .pipelines.runner import run_resumable

            summary = run_resumable(args.input, args.out,
                                    files_per_partition=args.files_per_partition)
            print(json.dumps(summary))
        elif args.cmd == "full":
            import glob
            import os

            from .pipelines.full_pipeline import run_full_pipeline

            paths = sorted(glob.glob(os.path.join(args.input, "**",
                                                  "*.parquet"),
                                     recursive=True))
            if not paths:
                raise SystemExit(f"no parquet files under {args.input}")
            summary = run_full_pipeline(paths, args.out, lang=args.lang,
                                        dedup=not args.no_dedup)
            print(json.dumps(summary))
        elif args.cmd == "prep":
            import ray.data as rd

            from .pipelines.training_prep import training_prep

            ds = rd.read_parquet(args.input,
                                 columns=["doc_id", "source", "text"])
            training_prep(ds, args.out, min_tokens=args.min_tokens,
                          excise_spans=args.excise_spans)
            # count from written footers — do NOT re-execute the pipeline
            import glob
            import os

            import pyarrow.parquet as pq

            n = sum(pq.read_metadata(p).num_rows for p in
                    glob.glob(os.path.join(args.out, "**", "*.parquet"),
                              recursive=True))
            print(json.dumps({"chunks": n, "out": args.out}))
        elif args.cmd == "compact":
            import glob
            import os

            import pyarrow.parquet as pq
            import ray.data as rd

            files = sorted(glob.glob(os.path.join(args.input, "**",
                                                  "*.parquet"),
                                     recursive=True))
            total = sum(os.path.getsize(p) for p in files)
            rows = sum(pq.read_metadata(p).num_rows for p in files)
            # block count from the on-disk byte target; at least 1
            n_out = max(1, round(total / (args.target_mb * 1e6)))
            os.makedirs(args.out, exist_ok=True)
            rd.read_parquet(files).repartition(n_out).write_parquet(args.out)
            out_files = glob.glob(os.path.join(args.out, "*.parquet"))
            out_rows = sum(pq.read_metadata(p).num_rows for p in out_files)
            if out_rows != rows:  # not assert: must survive python -O
                raise RuntimeError(
                    f"compaction row mismatch: wrote {out_rows}, "
                    f"expected {rows}")
            print(json.dumps({"in_files": len(files), "out_files":
                              len(out_files), "rows": rows,
                              "in_mb": round(total / 1e6, 1)}))
        elif args.cmd == "analyze":
            # composed corpus report: each section is a registry query
            # (the same streaming plans the driver gate checks), reduced to
            # result-sized JSON. Reporting run, not an oracle compare, so
            # the golden-scale guard is bypassed.
            import os

            os.environ.setdefault("PDFX_NO_GOLDEN_GUARD", "1")
            from .queries import QUERIES

            report = {
                "checksum": QUERIES["corpus_checksum"](args.sf_dir)
                .to_pydict(),
                "per_lang": QUERIES["token_stats"](args.sf_dir).to_pydict(),
                "unique_docs": QUERIES["exact_dedup"](args.sf_dir).num_rows,
                "docs_with_cross_doc_8grams": int(sum(
                    n > 0 for n in QUERIES["dup_ngram_spans"](args.sf_dir)
                    .column("n_dup").to_pylist())),
                "value_percentiles": QUERIES["value_percentiles_hist"](
                    args.sf_dir).to_pydict(),
            }
            print(json.dumps(report, default=str))
        elif args.cmd == "stats":
            import glob
            import os
            import shutil
            import tempfile

            from .pipelines.extract_pipeline import extract_pipeline

            paths = sorted(glob.glob(os.path.join(args.input, "**",
                                                  "*.parquet"),
                                     recursive=True))
            if not paths:
                raise SystemExit(f"no parquet files under {args.input}")
            tmp = tempfile.mkdtemp(prefix="pdfx_stats_")  # per-invocation
            try:
                ds = extract_pipeline(paths)
                ds.write_parquet(tmp)
                print(ds.stats())
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

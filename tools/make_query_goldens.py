"""Generate pinned golden parquet for the queries whose semantics are not
SQL-expressible (sketches, LSH, parser) so the driver's DuckDB oracle can
still hash-compare them: the oracle becomes
``SELECT * FROM read_parquet('<golden>')``.

Every pinned query is DETERMINISTIC (fixed seeds, stable hashes, no Python
``hash()``), so the golden is reproducible bit-for-bit; it guards against
wrong-answer regressions, not against a wrong initial implementation (the
sketch/parser correctness itself is covered by pytest: signature parity,
LSH recall bounds, reference-oracle byte-identity).

Usage: python tools/make_query_goldens.py [sf ...]   (default: sf0.001 sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = [
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "simhash_fingerprints",
    "doc_fingerprints",
    "language_id",
    "embedding_ann_lsh",
    "embedding_near_dup_lsh",
    "extract_pages",
    "image_features",
    "audio_features",
    "near_dup_clusters",
    "embedding_ann_ivf",
    "kmeans_clusters",
    "semantic_dedup",
    "approx_distinct_users",
    "logreg_train",
    "logreg_score",
    "value_percentiles_hist",
    "video_features",
    "vision_layout_ab",
    "curation_e2e",
]

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "goldens", "queries")


def main(sfs: list) -> None:
    import pyarrow.parquet as pq
    import ray

    from pdfextraction_ray.queries import QUERIES

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        for name in GOLDEN_QUERIES:
            # unwrap the golden-scale guard: when GENERATING a golden for a
            # new sf the guard would refuse (the golden doesn't exist yet)
            fn = getattr(QUERIES[name], "__wrapped__", QUERIES[name])
            t = fn(sf_dir)
            path = os.path.join(OUT_DIR, f"{name}_{sf}.parquet")
            pq.write_table(t, path)
            print(f"{path}: {t.num_rows} rows")
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf0.001", "sf0.01"])

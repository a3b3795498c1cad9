"""Local mirror of the driver's DuckDB-oracle harness: run every query with a
SQL oracle at sf0.001 and compare row count, column names and
order-insensitive values (columns sorted by name, rows sorted)."""

import math

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _oracle_pairs():
    from pdfextraction_ray.queries import ORACLES, QUERIES
    return [(name, QUERIES[name], ORACLES[name]) for name in ORACLES]


@pytest.mark.parametrize("name", [n for n in __import__(
    "pdfextraction_ray.queries", fromlist=["ORACLES"]).ORACLES])
def test_query_matches_oracle(name, con, ray_session):
    from pdfextraction_ray.queries import ORACLES, QUERIES
    # golden-backed oracles are pinned per scale; point them at this sf
    sql = ORACLES[name].replace("_sf0.01.parquet", "_sf0.001.parquet")
    ours = _canon(_to_pandas(QUERIES[name](SF)))
    theirs = _canon(con.sql(sql).df())
    assert list(ours.columns) == list(theirs.columns), \
        f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
    for col in ours.columns:  # dtype-kind parity (int vs float trips the driver)
        assert ours[col].dtype.kind == theirs[col].dtype.kind, \
            f"{name}.{col}: dtype {ours[col].dtype} vs {theirs[col].dtype}"
    assert len(ours) == len(theirs), f"{name}: rows {len(ours)} vs {len(theirs)}"
    for col in ours.columns:
        a, b = ours[col], theirs[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert all(math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                       for x, y in zip(a, b)), f"{name}.{col} float mismatch"
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), \
                f"{name}.{col} mismatch"


def test_every_query_has_an_oracle(ray_session):
    """Driver-gate coverage: every registry entry is either SQL-checked or
    pinned-golden-checked — no rows-only blind spots left."""
    from pdfextraction_ray.queries import ORACLES, QUERIES
    assert set(QUERIES) == set(ORACLES)


def test_embedding_ann_recall_vs_brute_force(ray_session):
    """The single-probe LSH ANN must place a usable fraction of the exact
    top-k in its own (smaller) result — the declared recall/size trade."""
    from pdfextraction_ray.queries import QUERIES
    exact = set(_to_pandas(QUERIES["embedding_topk"](SF))["vec_id"])
    approx = set(_to_pandas(QUERIES["embedding_ann_lsh"](SF))["vec_id"])
    assert len(approx) <= 10
    assert len(exact & approx) >= 3  # deterministic given the fixed seed


def test_extract_pages_rows(ray_session):
    from pdfextraction_ray.queries import QUERIES
    out = _to_pandas(QUERIES["extract_pages"](SF))
    assert len(out) == 500
    assert out["parse_ok"].all()


def test_entry_smoke(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    ds = E.entry()
    assert ds.count() == 500
    names = set(ds.schema().names)
    assert {"url", "extracted_text", "fields", "tables", "spans",
            "parse_ok"} <= names


def test_full_registry_at_sf001_driver_scale(ray_session):
    """One sweep of every oracle-checked query at sf0.01 — the scale the
    driver's correctness gate actually runs — with bit-exact numeric compare."""
    import duckdb
    import numpy as np
    from pdfextraction_ray.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    failures = []
    for name, sql in ORACLES.items():
        ours = QUERIES[name](sf)
        ours = ours.to_pandas() if hasattr(ours, "to_pandas") else ours
        theirs = con.sql(sql).df()
        cols = sorted(ours.columns)
        if cols != sorted(theirs.columns) or len(ours) != len(theirs):
            failures.append(f"{name}: shape")
            continue
        a = ours[cols].sort_values(cols).reset_index(drop=True)
        b = theirs[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            if a[c].dtype.kind in "fiu":
                if not np.array_equal(a[c].to_numpy(), b[c].to_numpy()):
                    failures.append(f"{name}.{c}")
            elif a[c].astype(str).tolist() != b[c].astype(str).tolist():
                failures.append(f"{name}.{c}")
    assert not failures, failures


def test_embedding_near_dup_lsh_recall(ray_session):
    """Bucketed pair-finding is a strict subset of the exact pair set with
    usable recall (the scale-path contract)."""
    from pdfextraction_ray.queries import QUERIES
    exact = _to_pandas(QUERIES["embedding_near_dup_pairs"](SF))
    approx = _to_pandas(QUERIES["embedding_near_dup_lsh"](SF))
    e = set(zip(exact["vec_a"], exact["vec_b"]))
    a = set(zip(approx["vec_a"], approx["vec_b"]))
    assert a <= e  # within-bucket scoring can never invent a pair
    assert len(a) >= len(e) // 3  # deterministic given the fixed seed


def test_minhash_pipeline_equals_sequential_reference(ray_session, tmp_path):
    """Differential: the two-pass distributed minhash near-dup pipeline must
    equal a trivially-correct sequential implementation of the same
    semantics (signatures -> bands -> candidate pairs -> exact Jaccard) on a
    synthetic corpus with planted near-duplicates."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfextraction_ray.functions import dedup as D
    from pdfextraction_ray.queries import QUERIES

    rng = random.Random(77)
    words = [f"w{i:03d}" for i in range(300)]
    texts = []
    for i in range(60):
        base = " ".join(rng.choices(words, k=80))
        texts.append(base)
        if i % 4 == 0:  # planted near-dup: slight mutation of base
            toks = base.split()
            toks[rng.randrange(len(toks))] = rng.choice(words)
            texts.append(" ".join(toks))
    doc_ids = list(range(len(texts)))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                             "text": pa.array(texts)}),
                   str(d / "documents.parquet"))

    # sequential reference: identical params, no distribution
    m = D.MinHasher(num_perm=64, n_bands=16)
    buckets: dict = {}
    for did, txt in zip(doc_ids, texts):
        sig = D.minhash_signature(txt, 64, 5, m.params)
        for band, bucket in enumerate(D.band_buckets(sig, 16)):
            buckets.setdefault((band, bucket), []).append(did)
    expect = set()
    for ids in buckets.values():
        for a, b in D.candidate_pairs_from_bucket(ids):
            if D.jaccard_ngrams(texts[a], texts[b]) >= 0.6:
                expect.add((a, b))

    got = QUERIES["minhash_near_dup_pairs"](str(d))
    got_pairs = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    assert got_pairs == expect
    assert len(expect) >= 10  # the planted dups were actually found


def test_minhash_pairs_subset_of_exact_jaccard(ray_session):
    """The LSH-candidate-restricted minhash query must be a subset of the
    exact all-pairs n-gram Jaccard query at the same 0.6 threshold (and at
    these scales recall is total: the sets are equal)."""
    from pdfextraction_ray.queries import QUERIES
    exact = _to_pandas(QUERIES["ngram_jaccard_pairs"](SF))
    lsh = _to_pandas(QUERIES["minhash_near_dup_pairs"](SF))
    e = set(zip(exact["doc_a"], exact["doc_b"]))
    m = set(zip(lsh["doc_a"], lsh["doc_b"]))
    assert m <= e
    assert len(m) >= int(0.9 * len(e))


def test_jaccard_block_pair_order_independent(ray_session):
    """Cross-block exact-Jaccard must not depend on materialized block order
    (preserve_order is off): a block holding LARGER doc_ids than its partner
    still emits the pair, normalized to (lo, hi). ADVICE r2 (medium)."""
    import pyarrow as pa
    import ray

    from pdfextraction_ray.queries import _jaccard_block_pair

    text = "the quick brown fox jumps over the lazy dog " * 5
    a = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                  "text": [text, "zzz unrelated content entirely different"]})
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": [text, "another unrelated thing altogether"]})
    out = ray.get(_jaccard_block_pair.remote(a, b, False, 0.6))
    pairs = list(zip(out["doc_a"].to_pylist(), out["doc_b"].to_pylist()))
    assert (1, 10) in pairs
    # symmetric block order finds the same normalized pairs
    out2 = ray.get(_jaccard_block_pair.remote(b, a, False, 0.6))
    pairs2 = list(zip(out2["doc_a"].to_pylist(), out2["doc_b"].to_pylist()))
    assert pairs == pairs2
    # same-block: each unordered pair exactly once
    out3 = ray.get(_jaccard_block_pair.remote(a, a, True, 0.6))
    assert len(out3) == 0 or len(set(
        zip(out3["doc_a"].to_pylist(), out3["doc_b"].to_pylist()))) == len(out3)


def test_value_percentiles_multiblock_exact(ray_session, tmp_path):
    """The rank-addressed percentile plan must stay exact when a group spans
    many sorted blocks (the whole point of the design: no task holds a full
    group). 40k rows, 2 fat groups, verified against np.percentile."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfextraction_ray.queries import QUERIES

    rng = np.random.default_rng(7)
    n = 40_000
    types = np.where(rng.random(n) < 0.8, "hot", "cold")
    vals = np.round(rng.normal(100, 25, n), 6)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"event_type": pa.array(types.tolist()),
                             "value": pa.array(vals)}),
                   str(d / "events.parquet"))
    out = QUERIES["value_percentiles"](str(d)).to_pandas().set_index("event_type")
    for g in ("hot", "cold"):
        v = vals[types == g]
        assert out.loc[g, "n"] == len(v)
        assert abs(out.loc[g, "p50"] - round(float(np.percentile(v, 50)), 4)) < 1e-3
        assert abs(out.loc[g, "p95"] - round(float(np.percentile(v, 95)), 4)) < 1e-3


def test_exact_pair_queries_are_size_gated(ray_session):
    """Above the max_rows gate the exact O(n^2) queries refuse to launch the
    quadratic cross-product and point at their LSH scale paths; max_rows=None
    forces exactness (VERDICT r2 #2)."""
    import pytest

    from pdfextraction_ray.queries import (q_embedding_near_dup_pairs,
                                           q_ngram_jaccard_pairs)

    with pytest.raises(ValueError, match="minhash"):
        q_ngram_jaccard_pairs(SF, max_rows=10)
    with pytest.raises(ValueError, match="lsh"):
        q_embedding_near_dup_pairs(SF, max_rows=10)
    # below the gate (and with an explicit override) the exact path runs
    t = q_ngram_jaccard_pairs(SF, max_rows=None)
    assert t.num_rows > 0


def test_golden_guard_rejects_unpinned_scale(ray_session, tmp_path):
    """Golden-backed queries fail LOUDLY when run at a scale with no pinned
    golden, instead of silently hash-comparing against the wrong one."""
    import pytest

    from pdfextraction_ray.queries import QUERIES

    d = tmp_path / "sf9.9"
    d.mkdir()
    with pytest.raises(RuntimeError, match="make_query_goldens"):
        QUERIES["language_id"](str(d))

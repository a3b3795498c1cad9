"""Semantic tests for the curation/sketch operators (queries_curation.py),
beyond the oracle value-equality already covered by test_queries_oracle."""

import re

import duckdb
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_redact_props_no_digits_left(ray_session):
    from pdfextraction_ray.queries_curation import q_redact_props

    t = q_redact_props(SF).to_pandas()
    assert len(t) == pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert not t.props_redacted.str.contains(r"[0-9]").any()
    # this corpus's props always carry a numeric payload
    assert (t.n_redacted >= 1).all()
    # idempotent: redacting the redacted text is a no-op
    assert not t.props_redacted.str.contains("##").any()


def test_word_repetition_bounds_and_split(ray_session):
    from pdfextraction_ray.queries_curation import (REPETITION_KEEP_MAX,
                                                    q_word_repetition)

    t = q_word_repetition(SF).to_pandas()
    assert len(t) == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert ((t.rep_ratio >= 0) & (t.rep_ratio < 1)).all()
    assert (t.n_distinct <= t.n_words).all()
    # the threshold must actually split this corpus (both classes exercised)
    assert 0 < t.keep.sum() < len(t)
    # keep flag consistent with the UNROUNDED ratio recomputed from counts
    raw = 1.0 - t.n_distinct / t.n_words
    assert (t.keep == (raw <= REPETITION_KEEP_MAX).astype(int)).all()


def test_tfidf_terms_semantics(ray_session):
    from pdfextraction_ray.queries_curation import q_tfidf_terms

    t = q_tfidf_terms(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert (t.df <= n_docs).all() and (t.df >= 1).all()
    assert (t.tf >= t.df).all()          # a doc containing a term counts >= 1
    assert (t.tfidf >= 0).all()
    # sorted by tfidf desc with token asc tie-break
    assert (t.tfidf.values[:-1] >= t.tfidf.values[1:]).all()


def test_events_range_join_gaps_excluded(ray_session):
    from pdfextraction_ray.queries_curation import (VALUE_BANDS,
                                                    q_events_range_join)

    t = q_events_range_join(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["value"]).to_pandas()
    v = ev.value.to_numpy()
    in_any = np.zeros(len(v), dtype=bool)
    for lo, hi, band in VALUE_BANDS:
        n = int(((v >= lo) & (v < hi)).sum())
        row = t[t.band == band]
        assert len(row) == 1 and int(row.n_events.iloc[0]) == n, band
        in_any |= (v >= lo) & (v < hi)
    # rows in the interval gaps are dropped (true inner-join semantics)
    assert t.n_events.sum() == in_any.sum() < len(v)


def test_kmeans_deterministic_and_converging(ray_session):
    from pdfextraction_ray.queries_curation import q_kmeans_clusters

    fn = getattr(q_kmeans_clusters, "__wrapped__", q_kmeans_clusters)
    a = fn(SF).to_pandas()
    b = fn(SF).to_pandas()
    assert a.equals(b)  # bit-stable under unordered block execution
    n_vecs = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert a["size"].sum() == n_vecs
    assert (a["size"] > 0).all()
    # more Lloyd iterations can only reduce total inertia
    early = fn(SF, iters=1).to_pandas()
    assert a.inertia.sum() <= early.inertia.sum() + 1e-6


def test_hll_within_5pct_of_exact(ray_session):
    from pdfextraction_ray.queries_curation import q_approx_distinct_users

    fn = getattr(q_approx_distinct_users, "__wrapped__",
                 q_approx_distinct_users)
    t = fn(SF).to_pandas().set_index("event_type")
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1").df() \
        .set_index("event_type")
    for et, row in exact.iterrows():
        est = int(t.loc[et, "n_users_approx"])
        assert abs(est - row.n) / row.n < 0.05, (et, est, int(row.n))


def test_word_repetition_drops_empty_docs(ray_session, tmp_path):
    """Docs whose text has no non-empty tokens are dropped, matching the
    oracle's WHERE tok <> '' GROUP BY."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfextraction_ray.queries_curation import q_word_repetition

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b a", "", "  "]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    t = q_word_repetition(str(tmp_path)).to_pandas()
    assert t.doc_id.tolist() == [0]
    assert t.n_words.tolist() == [3]


def test_semantic_dedup_invariants(ray_session):
    """SemDeDup contract: within a cluster the KEPT set is pairwise below
    tau; every DROPPED member has >= tau cosine to some kept member of its
    cluster (max_sim_kept records it); the pass is deterministic; and the
    fixture actually exercises drops."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfextraction_ray.queries_curation import (SEMDEDUP_TAU,
                                                    q_semantic_dedup)

    fn = getattr(q_semantic_dedup, "__wrapped__", q_semantic_dedup)
    a = fn(SF).to_pandas()
    b = fn(SF).to_pandas()
    assert a.equals(b)
    assert (a.keep == 0).any() and (a.keep == 1).any()
    assert ((a.keep == 0) == (a.max_sim_kept >= SEMDEDUP_TAU)).all()

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas() \
        .set_index("vec_id")
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    pos = {v: i for i, v in enumerate(emb.index)}
    for cl, g in a.groupby("cluster"):
        kept = [pos[v] for v in g[g.keep == 1].vec_id]
        sims = unit[kept] @ unit[kept].T
        np.fill_diagonal(sims, 0.0)
        assert sims.max() < SEMDEDUP_TAU + 1e-9
        for v in g[g.keep == 0].vec_id:
            assert (unit[kept] @ unit[pos[v]]).max() >= SEMDEDUP_TAU - 1e-9

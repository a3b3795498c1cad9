"""Semantic tests for the round-3 analytics operators (queries_analytics.py),
beyond the oracle value-equality covered by test_queries_oracle."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_zscore_events_standardizes(ray_session):
    """Per-type zscores must have mean ~0 and population std ~1, and the
    transform must be row-for-row (same event count, values passthrough)."""
    from pdfextraction_ray.queries_analytics import q_zscore_events

    t = q_zscore_events(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    assert len(t) == len(ev)
    merged = t.merge(ev, on="event_id", suffixes=("", "_raw"))
    assert np.allclose(merged.value, merged.value_raw)
    for _, g in t.groupby("event_type"):
        assert abs(g.zscore.mean()) < 1e-3
        assert abs(g.zscore.std(ddof=0) - 1.0) < 1e-3


def test_top3_per_user_ordering(ray_session):
    """<=3 rows per user, rnk dense from 1, value non-increasing within a
    user, and the per-user set equals an exact pandas nlargest."""
    from pdfextraction_ray.queries_analytics import q_top3_events_per_user

    t = q_top3_events_per_user(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_id", "value"]).to_pandas()
    for uid, g in t.groupby("user_id"):
        assert list(g.rnk) == list(range(1, len(g) + 1)) and len(g) <= 3
        assert (g.value.diff().dropna() <= 0).all()
        expect = ev[ev.user_id == uid].sort_values(
            ["value", "event_id"], ascending=[False, True]).head(3)
        assert list(g.event_id) == list(expect.event_id)


def test_heavy_hitters_exact_and_selective(ray_session):
    """CMS + verify must equal the exact frequent-token set (no false
    positives OR negatives), and be a strict subset of the vocabulary."""
    from pdfextraction_ray.queries_analytics import (HH_DENOM,
                                                     q_heavy_hitter_terms)

    t = q_heavy_hitter_terms(SF).to_pandas()
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    counts = Counter(tok for txt in texts for tok in txt.split(" ") if tok)
    thresh = -(-sum(counts.values()) // HH_DENOM)  # ceil
    expect = {k: v for k, v in counts.items() if v >= thresh}
    assert dict(zip(t.token, t.n)) == expect
    assert 0 < len(t) < len(counts)


def test_inverted_index_postings(ray_session):
    """Every token's postings must be the exact sorted doc_id list."""
    from pdfextraction_ray.queries_analytics import q_inverted_index

    t = q_inverted_index(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    index: dict = {}
    for did, txt in zip(docs.doc_id, docs.text):
        for tok in set(txt.split(" ")) - {""}:
            index.setdefault(tok, set()).add(did)
    assert len(t) == len(index)
    for row in t.itertuples():
        ids = sorted(index[row.token])
        assert row.df == len(ids)
        assert row.postings == ",".join(str(i) for i in ids)


def test_analytics_registry_wired(ray_session):
    from pdfextraction_ray.queries import ORACLES, QUERIES
    from pdfextraction_ray.queries_analytics import ANA_QUERIES

    for name in ANA_QUERIES:
        assert name in QUERIES and name in ORACLES
        assert "SELECT" in ORACLES[name]  # all four are real SQL oracles


def test_zscore_constant_group_matches_oracle(ray_session, tmp_path):
    """ADVICE r3 (low): a constant-valued event_type z-scores to 0 on BOTH
    engines (the SQL oracle mirrors the std=0 -> divide-by-1 fallback)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pdfextraction_ray.queries_analytics import (SQL_ZSCORE_EVENTS,
                                                     q_zscore_events)

    d = tmp_path / "sf"
    d.mkdir()
    n = 200
    rng = np.random.default_rng(3)
    types = np.where(np.arange(n) % 4 == 0, "flat", "vary")
    vals = np.where(types == "flat", 7.5, np.round(rng.normal(10, 2, n), 4))
    pq_.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(vals, pa.float64())}),
        str(d / "events.parquet"))
    ours = q_zscore_events(str(d)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')")
    theirs = con.sql(SQL_ZSCORE_EVENTS).df()
    assert np.allclose(ours.zscore, theirs.zscore)
    assert (ours.loc[ours.event_type == "flat", "zscore"] == 0).all()


def test_user_event_set_ops_algebra(ray_session, tmp_path):
    """INTERSECT/EXCEPT/UNION cardinalities on a synthetic table where all
    three differ (the sf corpora are dense enough that EXCEPT is 0 there)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pdfextraction_ray.queries_analytics import (SQL_USER_EVENT_SET_OPS,
                                                     q_user_event_set_ops)

    d = tmp_path / "sf"
    d.mkdir()
    rows = ([(1, "click"), (1, "purchase"), (2, "click"), (3, "purchase"),
             (4, "view"), (5, "click"), (5, "view")])
    pq_.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows])}),
        str(d / "events.parquet"))
    ours = q_user_event_set_ops(str(d)).to_pandas()
    assert ours.n_intersect[0] == 1      # user 1
    assert ours.n_a_except_b[0] == 2     # users 2, 5
    assert ours.n_union[0] == 4          # users 1, 2, 3, 5
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')")
    theirs = con.sql(SQL_USER_EVENT_SET_OPS).df()
    for c in ours.columns:
        assert ours[c][0] == theirs[c][0]

"""Semantic tests for the round-3 extension operators (queries_ext.py),
beyond the oracle value-equality already covered by test_queries_oracle."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_asof_join_semantics(ray_session):
    """Every output row is a purchase; last_click_value is either the -1.0
    no-prior-click sentinel or an actual click value of the SAME user at an
    earlier-or-equal timestamp (checked exhaustively against raw events)."""
    from pdfextraction_ray.queries_ext import q_asof_join

    t = q_asof_join(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    purchases = ev[ev.event_type == "purchase"]
    assert len(t) == len(purchases)
    clicks = ev[ev.event_type == "click"]
    by_user = {u: g.sort_values(["ts"], kind="stable")
               for u, g in clicks.groupby("user_id")}
    for row in t.sample(min(len(t), 40), random_state=7).itertuples():
        g = by_user.get(row.user_id)
        p_ts = purchases.loc[purchases.event_id == row.event_id, "ts"].iloc[0]
        if g is None or not (g.ts <= p_ts).any():
            assert row.last_click_value == -1.0
        else:
            assert row.last_click_value == g[g.ts <= p_ts]["value"].iloc[-1]


def test_user_activity_features_shape(ray_session):
    from pdfextraction_ray.queries_ext import q_user_activity_features

    t = q_user_activity_features(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    assert len(t) == len(set(ev.column("user_id").to_pylist()))
    assert (t.n_pos_delta <= t.n_events - 1).all()
    assert (t.max_runsum > 0).all()


def test_term_frequencies_counts(ray_session):
    """Top-50 token counts equal an independent pure-Python count."""
    from collections import Counter

    from pdfextraction_ray.queries_ext import q_term_frequencies

    t = q_term_frequencies(SF).to_pandas()
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    counts = Counter(tok for txt in texts for tok in txt.split(" ") if tok)
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert list(zip(t.token, t.n)) == expect


def test_stratified_sample_deterministic_and_stratified(ray_session):
    from pdfextraction_ray.queries_ext import q_stratified_sample

    a = q_stratified_sample(SF).to_pandas()
    b = q_stratified_sample(SF).to_pandas()
    assert a.equals(b)  # hash-keyed: identical across runs
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang"]).to_pandas()
    # en sampled at ~1/16, others at ~4/16 — rates must differ materially
    en_rate = (a.lang == "en").sum() / (docs.lang == "en").sum()
    other_rate = (a.lang != "en").sum() / (docs.lang != "en").sum()
    assert en_rate < other_rate


def test_decontaminate_never_flags_benchmark_docs(ray_session):
    from pdfextraction_ray.queries_ext import (DECONTAM_BENCH_MOD,
                                               q_decontaminate)

    t = q_decontaminate(SF).to_pandas()
    assert (t.doc_id % DECONTAM_BENCH_MOD != 0).all()
    assert (t.n_hits > 0).all()


def test_near_dup_clusters_transitive_closure(ray_session):
    """Cluster labels must be the transitive closure of the verified minhash
    pair set: both endpoints of every pair share a canonical id, every member
    appears exactly once, and each canonical id is its cluster's min."""
    from pdfextraction_ray.queries import q_minhash_near_dup_pairs
    from pdfextraction_ray.queries_ext import q_near_dup_clusters

    cl = q_near_dup_clusters(SF).to_pandas()
    pairs = q_minhash_near_dup_pairs(SF).to_pandas()
    canon = dict(zip(cl.doc_id, cl.canonical_id))
    assert len(canon) == len(cl)
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert canon[a] == canon[b]
    for root, members in cl.groupby("canonical_id").doc_id:
        assert root == members.min()


def test_embedding_ann_ivf_recall(ray_session):
    """IVF probes 4/16 cells; must retain a usable fraction of the exact
    top-10 (deterministic given fixed centroid seed)."""
    from pdfextraction_ray.queries import QUERIES
    from pdfextraction_ray.queries_ext import q_embedding_ann_ivf

    exact = set(QUERIES["embedding_topk"](SF).to_pandas()["vec_id"])
    approx = q_embedding_ann_ivf(SF).to_pandas()
    assert len(approx) == 10
    assert len(exact & set(approx.vec_id)) >= 5


def test_ext_registry_wired(ray_session):
    """Every extension query is in the merged registry with an oracle, and
    the golden-backed ones carry the golden-scale guard."""
    from pdfextraction_ray.queries import ORACLES, QUERIES
    from pdfextraction_ray.queries_ext import (EXT_GOLDEN_QUERIES,
                                               EXT_QUERIES)

    for name in EXT_QUERIES:
        assert name in QUERIES and name in ORACLES
    for name in EXT_GOLDEN_QUERIES:
        assert hasattr(QUERIES[name], "__wrapped__")
        assert "read_parquet" in ORACLES[name]


def test_asof_join_user_with_no_clicks(ray_session, tmp_path):
    """A user with purchases but zero clicks gets the -1.0 sentinel instead
    of an IndexError on the empty click array."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfextraction_ray.queries_ext import q_asof_join

    ev = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03"]).values.astype(
            "datetime64[us]")),
        "user_id": pa.array([7, 7, 8], pa.int64()),
        "event_type": pa.array(["purchase", "purchase", "click"]),
        "value": pa.array([10.0, 20.0, 5.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    })
    pq.write_table(ev, tmp_path / "events.parquet")
    t = q_asof_join(str(tmp_path)).to_pandas()
    assert t.last_click_value.tolist() == [-1.0, -1.0]

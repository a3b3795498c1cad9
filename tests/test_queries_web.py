"""Semantic tests for the web-corpus / clickstream operators
(queries_web.py), beyond the oracle value-equality already covered by
test_queries_oracle's parametrization over the merged registry."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_value_change_counts_bounds(ray_session):
    from pdfextraction_ray.queries_web import q_value_change_counts

    t = q_value_change_counts(SF).to_pandas()
    assert (t.n_changes <= t.n_events - 1).all()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    assert len(t) == len(ev.drop_duplicates())
    assert t.n_events.sum() == len(ev)


def test_weighted_sample_favors_heavy_docs(ray_session):
    """Deterministic across runs; the weighted sample's mean n_chars
    exceeds the corpus mean (weight = n_chars must bias selection)."""
    from pdfextraction_ray.queries_web import q_weighted_sample

    a = q_weighted_sample(SF).to_pandas()
    b = q_weighted_sample(SF).to_pandas()
    assert a.equals(b)
    assert len(a) == 100
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["n_chars"]).to_pandas()
    assert a.n_chars.mean() > docs.n_chars.mean()


def test_dup_ngram_spans_matches_pure_python(ray_session):
    """Window counts and duplicated-window counts equal an independent
    pure-Python string-level recomputation (no hashing)."""
    from collections import defaultdict

    from pdfextraction_ray.queries_web import NGRAM_W, q_dup_ngram_spans

    t = q_dup_ngram_spans(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    grams = defaultdict(set)
    windows = {}
    for row in docs.itertuples():
        tk = row.text.split(" ")
        ws = [" ".join(tk[i:i + NGRAM_W])
              for i in range(len(tk) - NGRAM_W + 1)]
        if ws:
            windows[row.doc_id] = ws
            for w in set(ws):
                grams[w].add(row.doc_id)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    assert set(t.index) == set(windows)
    for doc_id, ws in windows.items():
        assert t.loc[doc_id, "n_windows"] == len(ws)
        assert t.loc[doc_id, "n_dup"] == sum(w in dup for w in ws)


def test_exact_substring_spans_matches_pure_python(ray_session):
    """Maximal-span merge equals an independent pure-Python interval-merge
    over exact string windows (no hashing): per doc the spans, covered
    tokens and longest span all agree."""
    from collections import defaultdict

    from pdfextraction_ray.queries_web import (NGRAM_W,
                                               q_exact_substring_spans)

    t = q_exact_substring_spans(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    grams = defaultdict(set)
    windows = {}
    for row in docs.itertuples():
        tk = row.text.split(" ")
        ws = [" ".join(tk[i:i + NGRAM_W])
              for i in range(len(tk) - NGRAM_W + 1)]
        if ws:
            windows[row.doc_id] = ws
            for w in set(ws):
                grams[w].add(row.doc_id)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    assert set(t.index) == set(windows)
    some_doc_has_spans = False
    for doc_id, ws in windows.items():
        starts = [i for i, w in enumerate(ws) if w in dup]
        spans = []
        for i in starts:  # interval merge of [i, i + W - 1] coverages
            if spans and i - spans[-1][1] <= NGRAM_W:
                spans[-1] = (spans[-1][0], i)
            else:
                spans.append((i, i))
        covers = [b - a + NGRAM_W for a, b in spans]
        assert t.loc[doc_id, "n_spans"] == len(spans)
        assert t.loc[doc_id, "dup_tokens"] == sum(covers)
        assert t.loc[doc_id, "longest_span"] == max(covers, default=0)
        some_doc_has_spans = some_doc_has_spans or bool(spans)
    assert some_doc_has_spans  # the fixture must exercise the merge


def test_exact_substring_scale_path_equals_broadcast_path(ray_session):
    """Same regime contract as dup_ngram_spans: the forced bloom +
    bucketed-verify path returns the broadcast path's exact rows with no
    driver-side put of the full dup-gram set."""
    from pdfextraction_ray.queries_web import q_exact_substring_spans

    small = q_exact_substring_spans(SF).to_pandas()
    big = _no_big_driver_puts(
        lambda: q_exact_substring_spans(SF, broadcast_max=0),
        10_000).to_pandas()
    assert small.equals(big)


def test_dedup_span_excision_consistent_with_spans(ray_session):
    """Excision removes exactly the token set the span query measures:
    per doc, n_removed == dup_tokens, the cleaned text has exactly
    n_words - n_removed tokens, and untouched docs keep their text
    verbatim. Scale path (forced bloom) returns identical rows."""
    from pdfextraction_ray.queries_web import (q_dedup_span_excision,
                                               q_exact_substring_spans)

    ex = q_dedup_span_excision(SF).to_pandas().set_index("doc_id")
    sp = q_exact_substring_spans(SF).to_pandas().set_index("doc_id")
    assert (ex.n_removed == sp.dup_tokens).all()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")
    for doc_id, row in ex.iterrows():
        orig = docs.loc[doc_id, "text"].split(" ")
        kept = row.clean_text.split(" ") if row.clean_text else []
        assert len(kept) == len(orig) - row.n_removed
        if row.n_removed == 0:
            assert row.clean_text == docs.loc[doc_id, "text"]
    assert (ex.n_removed > 0).any()  # the fixture exercises real removal
    big = _no_big_driver_puts(
        lambda: q_dedup_span_excision(SF, broadcast_max=0), 10_000) \
        .to_pandas().set_index("doc_id")
    assert ex.equals(big)


def test_pagerank_is_a_distribution(ray_session):
    """Ranks form a probability distribution (ppm sums to ~1e6) and a
    power-iteration replay on the same synthesized edges converges to the
    same vector."""
    import hashlib

    from pdfextraction_ray.queries_web import (PAGERANK_D, PAGERANK_FANOUT,
                                               PAGERANK_ITERS, q_pagerank)

    t = q_pagerank(SF).to_pandas()
    n = len(t)
    assert abs(t.rank_ppm.sum() - 1e6) < 1.0
    # replay
    dst = np.array([
        int(hashlib.md5(str(s * PAGERANK_FANOUT + j).encode())
            .hexdigest()[:8], 16) % n
        for s in range(n) for j in range(PAGERANK_FANOUT)], dtype=np.int64)
    src = np.repeat(np.arange(n), PAGERANK_FANOUT)
    r = np.full(n, 1.0 / n)
    for _ in range(PAGERANK_ITERS):
        nxt = np.full(n, (1 - PAGERANK_D) / n)
        np.add.at(nxt, dst, PAGERANK_D * r[src] / PAGERANK_FANOUT)
        r = nxt
    assert np.allclose(np.round(r * 1e6, 3), t.rank_ppm.to_numpy(),
                       atol=2e-3)


def test_connected_components_vs_numpy_replay(ray_session):
    """Labels equal a union-find ground truth over the same synthesized
    block-local edges (the 10-round bound exceeds the block diameter, so
    hash-min reaches the true fixed point)."""
    import hashlib

    from pdfextraction_ray.queries_web import (CC_BLOCK, CC_FANOUT,
                                               q_connected_components)

    t = q_connected_components(SF).to_pandas()
    n = len(t)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s in range(n):
        for j in range(CC_FANOUT):
            d = min((s - s % CC_BLOCK)
                    + int(hashlib.md5(str(s * CC_FANOUT + j).encode())
                          .hexdigest()[:8], 16) % CC_BLOCK, n - 1)
            ra, rb = find(s), find(d)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    truth = [find(x) for x in range(n)]
    assert list(t.component) == truth
    assert t.component.nunique() > 1


def test_value_percentiles_hist_close_to_exact(ray_session):
    """Sketch estimates are within one bin width of exact numpy
    percentiles per group, and deterministic across runs (the golden's
    bit-stability requirement)."""
    import pyarrow.parquet as _pq

    from pdfextraction_ray.queries_web import HIST_BINS, q_value_percentiles_hist

    a = q_value_percentiles_hist(SF).to_pandas()
    b = q_value_percentiles_hist(SF).to_pandas()
    assert a.equals(b)
    ev = _pq.read_table(f"{SF}/events.parquet",
                        columns=["event_type", "value"]).to_pandas()
    for row in a.itertuples():
        g = ev[ev.event_type == row.event_type]["value"].to_numpy()
        width = (g.max() - g.min()) / HIST_BINS
        for p, est in ((50, row.p50), (90, row.p90), (99, row.p99)):
            # the sketch's target is the rank-ceil(qN) order statistic, so
            # compare against the matching inverted-CDF definition
            exact = np.percentile(g, p, method="inverted_cdf")
            assert abs(est - exact) <= max(2 * width, 1e-4), \
                (row.event_type, p)


def test_rolling_event_stats_replay(ray_session):
    """Rolling means equal a pandas rolling(5, min_periods=1) replay per
    user (ordered by ts then event_id)."""
    import pandas as pd
    import pyarrow.parquet as _pq

    from pdfextraction_ray.queries_web import q_rolling_event_stats

    t = q_rolling_event_stats(SF).to_pandas().set_index("event_id")
    ev = _pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    expect = ev.groupby("user_id")["value"] \
        .rolling(5, min_periods=1).mean().reset_index(level=0, drop=True)
    got = t.loc[ev.event_id, "roll_mean"].to_numpy()
    assert np.allclose(got, np.round(expect.to_numpy(), 4), atol=1e-3)


def test_corpus_checksum_detects_mutation(ray_session, tmp_path):
    """The checksum is order-independent (equal for a shuffled copy) but
    flips when a single row mutates."""
    import pyarrow.parquet as _pq
    import pyarrow as _pa

    from pdfextraction_ray.queries_web import q_corpus_checksum

    base = q_corpus_checksum(SF).to_pandas()
    docs = _pq.read_table(f"{SF}/documents.parquet")
    shuffled = docs.take(_pa.array(
        np.random.RandomState(3).permutation(len(docs))))
    d = tmp_path / "shuf"
    d.mkdir()
    _pq.write_table(shuffled, d / "documents.parquet")
    assert q_corpus_checksum(str(d)).to_pandas().equals(base)
    mut = docs.set_column(
        docs.schema.get_field_index("n_chars"), "n_chars",
        _pa.array(docs.column("n_chars").to_numpy(zero_copy_only=False)
                  + np.eye(1, len(docs), 0, dtype=np.int64)[0]))
    d2 = tmp_path / "mut"
    d2.mkdir()
    _pq.write_table(mut, d2 / "documents.parquet")
    assert not q_corpus_checksum(str(d2)).to_pandas().equals(base)


def test_event_type_pivot_row_sums(ray_session):
    """Pivot counts sum back to each user's event count (reshape loses
    nothing) and cover every event type column."""
    from pdfextraction_ray.queries_web import _PIVOT_TYPES, q_event_type_pivot

    t = q_event_type_pivot(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    per_user = ev.groupby("user_id").size()
    cols = [f"n_{ty}" for ty in _PIVOT_TYPES]
    assert t[cols].sum(axis=1).tolist() == \
        [per_user[u] for u in t.user_id]


def test_full_outer_covers_both_sides(ray_session):
    """Result keys = customers ∪ event users; matched rows carry both the
    event count and the customer acctbal; customer-only rows count 0."""
    from pdfextraction_ray.queries_web import q_customer_event_full_outer

    t = q_customer_event_full_outer(SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    assert set(t.key) == set(cust.c_custkey) | set(ev.user_id)
    matched = t[t.key.isin(set(ev.user_id))]
    assert (matched.n_events > 0).all()
    cust_only = t[~t.key.isin(set(ev.user_id))]
    assert (cust_only.n_events == 0).all()
    assert (cust_only.acctbal != -1.0).all()  # all are real customers


def test_mean_embedding_by_label_replay(ray_session):
    """Per-label centroids equal a direct numpy groupby-mean."""
    from pdfextraction_ray.queries_web import q_mean_embedding_by_label

    t = q_mean_embedding_by_label(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    for lab, g in emb.groupby("label"):
        mat = np.stack(g.embedding.to_numpy()).astype(np.float64)
        want = np.round(mat.mean(axis=0), 4)
        got = t[t.label == lab].sort_values("dim").mean_val.to_numpy()
        assert np.allclose(got, want, atol=1e-3), lab


def test_triangle_count_vs_brute_force(ray_session):
    """Triangle count equals a brute-force count over the same edges."""
    import hashlib
    from itertools import combinations

    from pdfextraction_ray.queries_web import (CC_BLOCK, CC_FANOUT,
                                               q_triangle_count)

    n = len(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]))
    edges = set()
    for s in range(n):
        for j in range(CC_FANOUT):
            d = min((s - s % CC_BLOCK)
                    + int(hashlib.md5(str(s * CC_FANOUT + j).encode())
                          .hexdigest()[:8], 16) % CC_BLOCK, n - 1)
            if s != d:
                edges.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(1 for a, b in edges
               for c in (adj[a] & adj[b]) if c > b)
    got = q_triangle_count(SF).to_pandas().n_triangles[0]
    assert got == want and got > 0


def test_value_quartile_buckets_balanced(ray_session):
    """Bucket counts per group sum to the group size and are near-balanced
    (each quartile holds 25% ± 1 value by the percentile_disc contract)."""
    from pdfextraction_ray.queries_web import q_value_quartile_buckets

    t = q_value_quartile_buckets(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type"]).to_pandas()
    sizes = ev.groupby("event_type").size()
    for g, grp in t.groupby("event_type"):
        assert grp.n.sum() == sizes[g]
        assert sorted(grp.bucket) == [1, 2, 3, 4]
        assert grp.n.max() - grp.n.min() <= 3  # near-quartering


def test_orders_rollup_levels_consistent(ray_session):
    """Subtotal rows equal the sum of their detail rows; the grand total
    equals the sum of all orders."""
    from pdfextraction_ray.queries_web import q_orders_rollup

    t = q_orders_rollup(SF).to_pandas()
    detail = t[(t.prio != "ALL") & (t.yr != "ALL")]
    for p, g in detail.groupby("prio"):
        sub = t[(t.prio == p) & (t.yr == "ALL")]
        assert len(sub) == 1
        assert sub.n_orders.iloc[0] == g.n_orders.sum()
        assert abs(sub.revenue.iloc[0] - g.revenue.sum()) < 0.1
    grand = t[(t.prio == "ALL") & (t.yr == "ALL")]
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_totalprice"]).to_pandas()
    assert grand.n_orders.iloc[0] == len(orders)
    assert abs(grand.revenue.iloc[0] - orders.o_totalprice.sum()) < 1.0


def test_docs_by_lang_sample_is_min5(ray_session):
    from pdfextraction_ray.queries_web import q_docs_by_lang_sample

    t = q_docs_by_lang_sample(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "doc_id"]).to_pandas()
    for row in t.itertuples():
        want = sorted(docs[docs.lang == row.lang].doc_id)[:5]
        assert row.doc_ids == ",".join(str(i) for i in want)


def test_doc_row_numbers_total_order(ray_session):
    """row_no is a 1..N permutation consistent with (lang, doc_id) order."""
    from pdfextraction_ray.queries_web import q_doc_row_numbers

    t = q_doc_row_numbers(SF).to_pandas()
    assert t.row_no.tolist() == list(range(1, len(t) + 1))
    pairs = list(zip(t.lang, t.doc_id))
    assert pairs == sorted(pairs)


def test_pivot_unknown_event_type_counts_nothing(ray_session, tmp_path):
    """ADVICE r3 (low): an event_type outside the pivot vocabulary must not
    kill the task — it counts toward no column, but its user still gets a
    row (exactly the SQL FILTER ... GROUP BY semantics)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pdfextraction_ray.queries_web import (SQL_EVENT_TYPE_PIVOT,
                                               q_event_type_pivot)

    d = tmp_path / "sf"
    d.mkdir()
    pq_.write_table(pa.table({
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["click", "mystery", "view", "mystery"])}),
        str(d / "events.parquet"))
    ours = q_event_type_pivot(str(d)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')")
    theirs = con.sql(SQL_EVENT_TYPE_PIVOT).df()
    assert len(ours) == 3  # user 3 (only unknown events) keeps a row
    for c in ours.columns:
        assert ours[c].tolist() == theirs[c].astype(ours[c].dtype).tolist()


def _no_big_driver_puts(fn, n):
    """Run fn() with ray.put instrumented; fail if the DRIVER puts any
    n-sized object (the r3 anti-pattern: rank/label vectors or whole build
    tables re-broadcast per iteration). Worker-side puts are unaffected —
    only the driver process is patched."""
    import pyarrow as pa
    import ray

    big = []
    orig = ray.put

    def spy(obj, *a, **k):
        if isinstance(obj, np.ndarray) and obj.size >= n:
            big.append(("ndarray", obj.size))
        if isinstance(obj, pa.Table) and obj.num_rows >= n:
            big.append(("table", obj.num_rows))
        return orig(obj, *a, **k)

    ray.put = spy
    try:
        out = fn()
    finally:
        ray.put = orig
    assert not big, f"driver put n-sized state: {big}"
    return out


def test_pagerank_no_driver_state(ray_session):
    """VERDICT r3 #2: per-iteration rank state must live in the object
    store as dataset blocks, never as a driver-resident n-sized vector."""
    import pyarrow.parquet as pq_

    from pdfextraction_ray.queries_web import q_pagerank

    n = pq_.read_metadata(f"{SF}/documents.parquet").num_rows
    t = _no_big_driver_puts(lambda: q_pagerank(SF), n)
    assert t.num_rows == n  # full result still produced


def test_connected_components_no_driver_state(ray_session):
    import pyarrow.parquet as pq_

    from pdfextraction_ray.queries_web import q_connected_components

    n = pq_.read_metadata(f"{SF}/documents.parquet").num_rows
    t = _no_big_driver_puts(lambda: q_connected_components(SF), n)
    assert t.num_rows == n


def test_triangle_count_no_driver_state(ray_session):
    """VERDICT r3 #5: wedge closing must join against the distributed edge
    dataset, not a whole-edge-set broadcast."""
    import pyarrow.parquet as pq_

    from pdfextraction_ray.queries_web import CC_FANOUT, q_triangle_count

    n_docs = pq_.read_metadata(f"{SF}/documents.parquet").num_rows
    # the full deduped edge set is ~n*fanout rows; driver puts must stay
    # strictly below it (bucket pieces are created by remote tasks)
    t = _no_big_driver_puts(lambda: q_triangle_count(SF), n_docs * CC_FANOUT)
    assert t.column("n_triangles")[0].as_py() > 0


def test_dup_ngram_scale_path_equals_broadcast_path(ray_session):
    """VERDICT r3 #3: the bloom-prune + bucketed-exact-verify scale path
    (forced via broadcast_max=0) must return exactly the broadcast path's
    rows — and without any driver-side put of the full dup-gram set."""
    from pdfextraction_ray.queries_web import q_dup_ngram_spans

    small = q_dup_ngram_spans(SF).to_pandas()
    big = _no_big_driver_puts(
        lambda: q_dup_ngram_spans(SF, broadcast_max=0), 10_000).to_pandas()
    assert small.equals(big)


def test_minhash_scale_path_equals_broadcast_path(ray_session):
    """VERDICT r4 #1: the colliding-(band,bucket)-key membership must follow
    the dup_ngram_spans regime — the forced bloom + bucketed-exact-verify
    path (broadcast_max=0) returns exactly the broadcast path's verified
    pairs, with no driver-side put of the dup-key set."""
    from pdfextraction_ray.queries import q_minhash_near_dup_pairs

    small = q_minhash_near_dup_pairs(SF).to_pandas()
    big = _no_big_driver_puts(
        lambda: q_minhash_near_dup_pairs(SF, broadcast_max=0),
        10_000).to_pandas()
    assert small.equals(big)


def test_simhash_scale_path_equals_broadcast_path(ray_session):
    """Same regime contract for the simhash band path (shared
    _dup_bucket_members)."""
    from pdfextraction_ray.queries import q_simhash_near_dup_pairs

    small = q_simhash_near_dup_pairs(SF).to_pandas()
    big = _no_big_driver_puts(
        lambda: q_simhash_near_dup_pairs(SF, broadcast_max=0),
        10_000).to_pandas()
    assert small.equals(big)


def test_warc_extract_matches_oracle_and_cleans_up(ray_session, tmp_path,
                                                   monkeypatch):
    """VERDICT r3 #8: WARC source -> flagship parse -> metrics matches the
    SQL oracle at sf0.001 and removes its fixture files afterwards."""
    import duckdb
    import tempfile

    from pdfextraction_ray.queries_web import (SQL_WARC_EXTRACT,
                                               q_warc_extract)

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    ours = q_warc_extract(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    theirs = con.sql(SQL_WARC_EXTRACT).df()
    for c in ["doc_id", "n_chars", "n_tokens"]:
        assert np.array_equal(ours[c].values, theirs[c].values), c
    assert not list(tmp_path.glob("warc_extract_*"))  # fixture dir removed


def test_warc_fixture_guard_rejects_nonnormalized_whitespace(ray_session,
                                                             tmp_path):
    """The extractor whitespace-normalizes; a doc whose text a
    normalization would change must fail the fixture guard loudly instead
    of silently desynchronizing the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import pytest
    import ray

    from pdfextraction_ray.queries_web import q_warc_extract

    d = tmp_path / "sf"
    d.mkdir()
    pq_.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": ["alpha  beta gamma delta epsilon zeta"]}),  # double space
        str(d / "documents.parquet"))
    with pytest.raises(ray.exceptions.RayTaskError,
                       match="fixture contract"):
        q_warc_extract(str(d))

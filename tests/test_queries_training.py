"""Semantic tests for the training-sequence operators (queries_training.py),
beyond the oracle value-equality already covered by test_queries_oracle."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_doc_chunks_reconstruct(ray_session):
    """Chunk windows must tile each doc: chunk c starts at token c*STRIDE,
    holds <=WINDOW tokens, and stride-prefixes concatenate back to the doc's
    token stream (checked exhaustively for a sample of docs)."""
    from pdfextraction_ray.queries_training import (CHUNK_STRIDE,
                                                    CHUNK_WINDOW,
                                                    q_doc_chunks)

    t = q_doc_chunks(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert (t.n_tokens <= CHUNK_WINDOW).all() and (t.n_tokens > 0).all()
    by_doc = {d: g.sort_values("chunk_id") for d, g in t.groupby("doc_id")}
    for row in docs.sample(min(len(docs), 25), random_state=3).itertuples():
        toks = [x for x in row.text.split(" ") if x]
        g = by_doc.get(row.doc_id)
        if not toks:
            assert g is None
            continue
        assert list(g.chunk_id) == list(range((len(toks) - 1)
                                              // CHUNK_STRIDE + 1))
        for c, txt in zip(g.chunk_id, g.chunk_text):
            want = toks[c * CHUNK_STRIDE:c * CHUNK_STRIDE + CHUNK_WINDOW]
            assert txt == " ".join(want)


def test_sequence_packing_prefix_sum(ray_session):
    """seq_id must equal floor(exclusive-prefix-token-sum / BUDGET) in
    doc_id order — i.e. the distributed two-pass prefix sum matches a
    single-threaded recomputation exactly."""
    from pdfextraction_ray.queries_training import (SEQ_BUDGET,
                                                    q_sequence_packing)

    t = q_sequence_packing(SF).to_pandas().sort_values("doc_id")
    prev = np.concatenate([[0], np.cumsum(t.n_tokens.to_numpy())[:-1]])
    assert (t.seq_id.to_numpy() == prev // SEQ_BUDGET).all()
    assert (np.diff(t.seq_id.to_numpy()) >= 0).all()
    # a sequence whose first doc starts r tokens into the budget window must
    # hold >= BUDGET - r tokens before the next sequence can begin (docs are
    # assigned to the sequence their start offset falls in)
    t = t.assign(prev=prev)
    g = t.groupby("seq_id").agg(total=("n_tokens", "sum"),
                                first_prev=("prev", "min"))
    need = SEQ_BUDGET - g.first_prev % SEQ_BUDGET
    assert (g.total.iloc[:-1] >= need.iloc[:-1]).all()


def test_funnel_stages_vs_pandas(ray_session):
    """Stage histogram must match a pure-pandas replay of the ordered
    view->click->purchase matcher with the 3-day step window."""
    from pdfextraction_ray.queries_training import (FUNNEL_STEPS,
                                                    FUNNEL_WINDOW_US,
                                                    q_funnel_stages)

    t = q_funnel_stages(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    ev["ts_us"] = ev.ts.astype("datetime64[us]").astype(np.int64)
    expect = {}
    for _u, g in ev.groupby("user_id"):
        stage, bound = 0, np.iinfo(np.int64).min
        limit = np.iinfo(np.int64).max
        for step in FUNNEL_STEPS:
            cand = g.ts_us[(g.event_type == step) & (g.ts_us > bound)
                           & (g.ts_us <= limit)]
            if cand.empty:
                break
            stage += 1
            bound = cand.min()
            limit = bound + FUNNEL_WINDOW_US
        expect[stage] = expect.get(stage, 0) + 1
    got = dict(zip(t.stage, t.n_users))
    assert got == {s: n for s, n in expect.items() if n > 0}
    assert t.n_users.sum() == ev.user_id.nunique()

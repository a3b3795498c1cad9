"""Composed e2e curation pipeline: parse -> quality -> langid -> exact
dedup -> minhash near-dup drop -> span excision -> split -> chunk -> pack."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _docs_ds(rd):
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])


def test_curate_chunks_packed_invariants(ray_session):
    import ray.data as rd

    from pdfextraction_ray.pipelines.e2e import (_SEQ_BUCKET_SHIFT,
                                                 curate_chunks_packed)
    from pdfextraction_ray.queries_scale import _split_of
    from pdfextraction_ray.queries_training import SEQ_BUDGET

    out = curate_chunks_packed(_docs_ds(rd)).materialize().to_pandas()
    assert len(out) > 0
    assert sorted(out.columns) == sorted(
        ["doc_id", "chunk_id", "n_tokens", "chunk_text", "split",
         "pack_bucket", "seq_id"])

    # seq_id encodes its pack bucket; sequences never cross buckets/splits
    assert (np.right_shift(out.seq_id.to_numpy(), _SEQ_BUCKET_SHIFT)
            == out.pack_bucket.to_numpy()).all()
    per_seq = out.groupby(["split", "seq_id"])
    assert per_seq.pack_bucket.nunique().max() == 1

    # first-fit budget: a sequence overflows only via its LAST chunk
    # (prev // budget semantics), so sum - last_chunk < budget
    for (_s, _q), g in per_seq:
        g = g.sort_values(["doc_id", "chunk_id"])
        assert g.n_tokens.sum() - g.n_tokens.iloc[-1] < SEQ_BUDGET

    # split column matches the domain hash
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
        .set_index("doc_id")
    sample = out.drop_duplicates("doc_id").head(50)
    for r in sample.itertuples():
        assert r.split == _split_of(docs.loc[r.doc_id, "source"])


def test_curate_near_dup_and_exact_dedup_drop(ray_session):
    """A corpus with an exact duplicate and a near duplicate keeps only
    the min-doc_id representative of each."""
    import ray.data as rd

    from pdfextraction_ray.pipelines.e2e import curate_chunks_packed

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            * 12).strip()
    near = base.replace("kappa alpha", "kappa omega", 1)  # ~1 token off
    other = ("one two three four five six seven eight nine ten "
             * 12).strip()
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array(["https://a.com/x"] * 4),
        "text": pa.array([base, base, near, other])})
    out = curate_chunks_packed(rd.from_arrow(docs), excise=False) \
        .materialize().to_pandas()
    kept = set(out.doc_id.unique())
    assert 1 in kept          # exact-dup winner
    assert 2 not in kept      # exact duplicate of 1
    assert 3 not in kept      # near duplicate (jaccard >= 0.6) of 1
    assert 4 in kept


def test_curate_excises_duplicated_spans(ray_session):
    """A >=w-token span duplicated across two kept docs is removed from
    both docs' chunk text."""
    import ray.data as rd

    from pdfextraction_ray.pipelines.e2e import curate_chunks_packed

    dup_span = " ".join(f"dupword{i}" for i in range(60))
    uniq_a = " ".join(f"alphatok{i}" for i in range(80))
    uniq_b = " ".join(f"betatok{i}" for i in range(80))
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "source": pa.array(["https://a.com/x", "https://b.com/y"]),
        "text": pa.array([f"{uniq_a} {dup_span}", f"{dup_span} {uniq_b}"])})
    out = curate_chunks_packed(rd.from_arrow(docs), near_dup=False) \
        .materialize().to_pandas()
    text = " ".join(out.sort_values(["doc_id", "chunk_id"]).chunk_text)
    assert "dupword5" not in text
    assert "alphatok5" in text and "betatok5" in text


def test_curation_pages_path_and_no_big_driver_puts(ray_session, tmp_path):
    """The pages path (parse -> curation) runs end-to-end, writes a
    split-partitioned sink, and the driver never ray.puts a corpus-sized
    object."""
    from test_queries_web import _no_big_driver_puts

    from pdfextraction_ray.fixtures import write_corpus
    from pdfextraction_ray.pipelines.e2e import curation_e2e_pages

    n = 600
    paths = write_corpus(str(tmp_path / "pages"), n, n_shards=3)
    out_dir = str(tmp_path / "packed")
    # guard the exact-dedup winner path with a TIGHT threshold (near-dup /
    # excision memberships are size-gated broadcasts, legitimately
    # result-sized at this scale — their own regime guards live in
    # test_queries_web / test_training_prep)
    _no_big_driver_puts(
        lambda: curation_e2e_pages(paths, near_dup=False, excise=False)
        .materialize(), n // 2)
    curation_e2e_pages(paths, out_dir)
    t = pq.read_table(out_dir).to_pandas()
    assert len(t) > 0
    assert set(t.split.unique()) <= {"train", "val", "test"}
    # doc ids are 64-bit url hashes — all within a split deterministic
    assert t.doc_id.dtype == np.int64


def test_curate_degenerate_corpora(ray_session):
    """Empty corpus and all-identical corpus both produce sane output:
    empty in -> empty out; N copies of one text -> exactly one doc's
    chunks survive."""
    import ray.data as rd

    from pdfextraction_ray.pipelines.e2e import curate_chunks_packed

    schema_cols = {"doc_id": pa.array([], pa.int64()),
                   "source": pa.array([], pa.string()),
                   "text": pa.array([], pa.string())}
    empty = curate_chunks_packed(rd.from_arrow(pa.table(schema_cols)))
    assert empty.count() == 0

    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            * 12).strip()
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "source": pa.array(["https://a.com/x"] * 6),
        "text": pa.array([text] * 6)})
    out = curate_chunks_packed(rd.from_arrow(docs)).materialize().to_pandas()
    assert set(out.doc_id.unique()) == {0}  # min-id winner only


def test_curate_checkpoint_false_equals_true(ray_session):
    """The lazy lineage-re-execution form returns exactly the checkpointed
    form's chunks."""
    import pandas as pd
    import ray.data as rd

    from pdfextraction_ray.pipelines.e2e import curate_chunks_packed

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    a = curate_chunks_packed(docs, checkpoint=True).materialize() \
        .to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    b = curate_chunks_packed(docs, checkpoint=False).materialize() \
        .to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

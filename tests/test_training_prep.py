"""End-to-end training-prep pipeline: curate -> narrow dedup -> split ->
chunk -> partitioned parquet sink."""

import glob
import hashlib
import shutil

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
OUT = "/tmp/pdfextraction_ray_test_training_prep"


def _expected_winners(min_tokens=50):
    """Pure-pandas replay of quality filter + min-doc_id-per-text dedup."""
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    toks = docs.text.str.split(" ").apply(lambda t: [x for x in t if x])
    n_tokens = toks.apply(len)
    n_punct = docs.text.str.count(r"[\.,;:!\?]")
    n_chars = docs.text.str.len()
    q = docs[(n_tokens >= min_tokens) & (n_punct * 10 <= n_chars)]
    h = q.text.map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return set(q.assign(h=h).groupby("h").doc_id.min())


def test_training_prep_end_to_end(ray_session):
    import ray.data as rd

    from pdfextraction_ray.pipelines.training_prep import training_prep
    from pdfextraction_ray.queries_scale import _split_of
    from pdfextraction_ray.queries_training import CHUNK_STRIDE, CHUNK_WINDOW

    shutil.rmtree(OUT, ignore_errors=True)
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    training_prep(ds, OUT)

    files = glob.glob(f"{OUT}/split=*/*.parquet")
    assert {p.split("split=")[1].split("/")[0] for p in files} \
        == {"train", "val", "test"}
    out = pq.read_table(f"{OUT}").to_pandas()

    winners = _expected_winners()
    assert set(out.doc_id) == winners

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
        .set_index("doc_id")
    # split column matches the domain hash for every chunk
    for doc_id, g in out.groupby("doc_id"):
        assert set(g.split) == {_split_of(docs.loc[doc_id, "source"])}
        toks = [x for x in docs.loc[doc_id, "text"].split(" ") if x]
        assert list(np.sort(g.chunk_id.to_numpy())) \
            == list(range((len(toks) - 1) // CHUNK_STRIDE + 1))
    # chunk text reconstructs the token stream (sampled)
    s = out.sample(25, random_state=1)
    for row in s.itertuples():
        toks = [x for x in docs.loc[row.doc_id, "text"].split(" ") if x]
        want = toks[row.chunk_id * CHUNK_STRIDE:
                    row.chunk_id * CHUNK_STRIDE + CHUNK_WINDOW]
        assert row.chunk_text == " ".join(want)
    shutil.rmtree(OUT, ignore_errors=True)


def test_training_prep_resumable_matches_and_resumes(ray_session, tmp_path):
    """The checkpointed variant produces the same chunk multiset as the
    one-shot pipeline; deleting one manifest reruns exactly that partition
    and leaves the total output unchanged."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdfextraction_ray.pipelines.training_prep import (
        training_prep, training_prep_resumable)

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "source", "text"])
    src = tmp_path / "docs"
    src.mkdir()
    for i in range(3):
        pq.write_table(docs.slice(i * 170, 170), src / f"s{i}.parquet")

    out = tmp_path / "prep"
    s1 = training_prep_resumable(str(src), str(out), min_tokens=50)
    assert s1["partitions_run"] == [0, 1, 2]

    def chunk_df(path_glob):
        files = glob.glob(path_glob, recursive=True)
        t = pa.concat_tables([pq.read_table(f) for f in files])
        return t.to_pandas().sort_values(
            ["doc_id", "chunk_id"]).reset_index(drop=True)

    got = chunk_df(str(out / "**" / "*.parquet"))
    want = training_prep(
        rd.read_parquet([str(p) for p in sorted(src.iterdir())]),
        min_tokens=50).to_pandas().sort_values(
        ["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    # resume: drop one manifest -> exactly that partition reruns
    manifests = sorted(glob.glob(str(out / "_manifest" / "*.json")))
    assert len(manifests) == 3
    os.remove(manifests[1])
    s2 = training_prep_resumable(str(src), str(out), min_tokens=50)
    assert s2["partitions_run"] == [1]
    assert s2["partitions_skipped"] == [0, 2]
    got2 = chunk_df(str(out / "**" / "*.parquet"))
    pd.testing.assert_frame_equal(got, got2)


def test_training_prep_excises_duplicated_spans(ray_session):
    """excise_spans=True removes duplicated >= w-token spans from the KEPT
    stream before chunking: every chunk of the excised run equals chunking
    the independently-excised text, a shared boilerplate phrase disappears
    from the output, and unique content survives verbatim."""
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.pipelines.training_prep import training_prep
    from pdfextraction_ray.queries_training import CHUNK_STRIDE, CHUNK_WINDOW
    from pdfextraction_ray.queries_web import NGRAM_W

    boiler = " ".join(f"boiler{i}" for i in range(NGRAM_W))  # one window
    rows = []
    for d in range(6):
        uniq = " ".join(f"u{d}w{i}" for i in range(60))
        # boilerplate sits mid-doc in every doc -> duplicated across docs
        rows.append((d, f"host{d}.com", f"{uniq} {boiler} {uniq}"))
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows])})

    out = training_prep(rd.from_arrow(docs), None, min_tokens=10,
                        excise_spans=True).to_pandas()
    plain = training_prep(rd.from_arrow(docs), None,
                          min_tokens=10).to_pandas()
    assert any("boiler0" in t for t in plain.chunk_text)
    assert not any("boiler" in t for t in out.chunk_text)
    # per doc, the excised chunks are exactly the chunking of the
    # boilerplate-free token stream (the window extends one token into
    # each unique run's neighborhood only if duplicated there — it isn't,
    # so exactly the boiler tokens disappear)
    for d, g in out.groupby("doc_id"):
        toks = rows[d][2].split(" ")
        clean = [t for t in toks if not t.startswith("boiler")]
        want = [" ".join(clean[c * CHUNK_STRIDE:
                                c * CHUNK_STRIDE + CHUNK_WINDOW])
                for c in range((len(clean) - 1) // CHUNK_STRIDE + 1)]
        got = g.sort_values("chunk_id").chunk_text.tolist()
        assert got == want


def test_training_prep_resumable_with_excision(ray_session, tmp_path):
    """Resumable + excision equals the one-shot excised pipeline even when
    the duplicated span CROSSES partitions, and a manifest-delete resume
    rebuilds identical global state (winner set + dup grams)."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdfextraction_ray.pipelines.training_prep import (
        training_prep, training_prep_resumable)
    from pdfextraction_ray.queries_web import NGRAM_W

    boiler = " ".join(f"boiler{i}" for i in range(NGRAM_W))
    rows = []
    for d in range(6):
        uniq = " ".join(f"u{d}w{i}" for i in range(60))
        rows.append((d, f"host{d}.com", f"{uniq} {boiler} {uniq}"))
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows])})
    src = tmp_path / "docs"
    src.mkdir()
    # one doc per shard: the duplicated span only exists ACROSS partitions
    for i in range(6):
        pq.write_table(docs.slice(i, 1), src / f"s{i}.parquet")

    out = tmp_path / "prep"
    s1 = training_prep_resumable(str(src), str(out), min_tokens=10,
                                 files_per_partition=2, excise_spans=True)
    assert s1["partitions_run"] == [0, 1, 2]

    files = glob.glob(str(out / "**" / "*.parquet"), recursive=True)
    got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert not any("boiler" in t for t in got.chunk_text)
    want = training_prep(rd.from_arrow(docs), None, min_tokens=10,
                         excise_spans=True).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    manifests = sorted(glob.glob(str(out / "_manifest" / "*.json")))
    os.remove(manifests[2])
    s2 = training_prep_resumable(str(src), str(out), min_tokens=10,
                                 files_per_partition=2, excise_spans=True)
    assert s2["partitions_run"] == [2]
    got2 = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(str(out / "**" / "*.parquet"),
                                             recursive=True)]).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2)


def test_winner_membership_forced_bloom_matches(ray_session, tmp_path,
                                                monkeypatch):
    """PDFX_WINNER_BROADCAST_MAX=0 forces the scale regime (distributed
    bloom + bucketed exact verify) for the resumable winner filter; the
    chunk output must be frame-equal to the broadcast regime."""
    import glob

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfextraction_ray.pipelines.training_prep import (
        training_prep_resumable)

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "source", "text"])
    src = tmp_path / "docs"
    src.mkdir()
    for i in range(2):
        pq.write_table(docs.slice(i * 250, 250), src / f"s{i}.parquet")

    def chunk_df(out):
        files = glob.glob(str(out / "**" / "*.parquet"), recursive=True)
        t = pa.concat_tables([pq.read_table(f) for f in files])
        return t.to_pandas().sort_values(
            ["doc_id", "chunk_id"]).reset_index(drop=True)

    out_a = tmp_path / "prep_broadcast"
    training_prep_resumable(str(src), str(out_a), min_tokens=50)
    monkeypatch.setenv("PDFX_WINNER_BROADCAST_MAX", "0")
    out_b = tmp_path / "prep_bloom"
    training_prep_resumable(str(src), str(out_b), min_tokens=50)
    pd.testing.assert_frame_equal(chunk_df(out_a), chunk_df(out_b))


def test_training_prep_no_corpus_sized_driver_puts(ray_session):
    """The exact-dedup winner set is n-sized (one id per unique text) and
    must never be ray.put whole by the driver — it rides the object store
    as a dataset build side (bucketed_join / int_keys_membership)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdfextraction_ray.pipelines.training_prep import training_prep
    from test_queries_web import _no_big_driver_puts

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    out = _no_big_driver_puts(
        lambda: training_prep(ds, min_tokens=50).materialize(), n // 2)
    assert out.count() > 0

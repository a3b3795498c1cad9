"""Property tests for the geometry invariants (SURVEY §5 strategy):
line grouping partitions the word set; clusters respect the gap threshold;
column boundaries tile the x-axis; langid accuracy on documents."""

from hypothesis import given, settings, strategies as st

from pdfextraction_ray import geometry as G
from pdfextraction_ray import table_extract as T


def make_word(text, x0, y0, w=30.0):
    return G.derive_word(text, x0, y0, x0 + w, y0 + 10.0)


word_lists = st.lists(
    st.tuples(st.text(alphabet="abcXYZ19 .$/-", min_size=1, max_size=8),
              st.floats(0, 600, allow_nan=False),
              st.floats(0, 790, allow_nan=False)),
    min_size=0, max_size=40)


@given(word_lists)
@settings(max_examples=80, deadline=None)
def test_line_grouping_is_a_partition(items):
    words = [make_word(t, x, y) for t, x, y in items]
    lines = G.group_words_into_lines(words)
    flat = [w for line in lines for w in line]
    assert len(flat) == len(words)
    # every word appears exactly once (identity, not equality)
    assert sorted(map(id, flat)) == sorted(map(id, words))
    # lines ordered by anchor y0; words within a line x0-sorted
    for line in lines:
        xs = [w["x0"] for w in line]
        assert xs == sorted(xs)


@given(word_lists)
@settings(max_examples=80, deadline=None)
def test_clusters_partition_each_line(items):
    words = [make_word(t, x, y) for t, x, y in items]
    for line in G.group_words_into_lines(words):
        clusters = G.cluster_words_by_proximity(line)
        flat = [w for c in clusters for w in c]
        assert sorted(map(id, flat)) == sorted(map(id, line))
        assert all(c for c in clusters) or line == []


@given(st.lists(st.floats(10, 500, allow_nan=False), min_size=1, max_size=6,
                unique=True))
@settings(max_examples=60, deadline=None)
def test_column_boundaries_tile_x_axis(xs):
    words = []
    for i, x in enumerate(sorted(xs)):
        words.append(make_word(f"H{i}", x, 100.0, w=20.0))
    headers = [w["text"] for w in words]
    bounds = T.establish_column_boundaries(headers, words)
    assert len(bounds) == len(headers)
    # tiles: first starts at 0, last is unbounded, adjacent edges touch
    assert bounds[0]["left_x"] == 0.0
    assert bounds[-1]["right_x"] == float("inf")
    for a, b in zip(bounds, bounds[1:]):
        assert a["right_x"] == b["left_x"]
        assert a["header_center"] <= b["header_center"]


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_preprocess_never_crashes_and_is_deterministic(s):
    words = [make_word(tok, 10.0 + 40 * i, 50.0) for i, tok in
             enumerate(s.split()[:20]) if tok]
    assert G.preprocess_document(words) == G.preprocess_document(list(words))


def test_langid_on_real_language_samples():
    """The driver documents table carries random lang labels over English
    word-salad (verified: 'zh'-labelled rows are English words), so accuracy
    is asserted on real-language samples instead; zh via CJK-codepoint ratio."""
    from pdfextraction_ray.functions.text import detect_language

    samples = {
        "en": "the cat sat on the mat and then the dog ran to the park with them ",
        "de": "der hund und die katze gingen durch die schule und der garten ist schön ",
        "fr": "le chien et le chat sont dans la maison et que la vie est belle ici ",
        "es": "el perro y el gato están en la casa de la abuela que vive en españa ",
        "zh": "数据处理引擎使用箭头批次进行流式计算并且支持断点续传的检查点机制" * 2,
    }
    for lang, text in samples.items():
        assert detect_language(text * 3) == lang, lang
    assert detect_language("zzz qqq xxx 123 456 789 000 111 222 333") == "und"


# ---------------------------------------------------------------------------
# round-3 web/graph primitive properties (queries_web)
# ---------------------------------------------------------------------------

doc_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=60),
    min_size=1, max_size=12)


@given(doc_texts)
@settings(max_examples=60, deadline=None)
def test_window_hashes_count_and_boundaries(texts):
    """The flat vectorized window hasher yields exactly max(len-7, 0)
    windows per doc, windows never cross doc boundaries, and equal 8-gram
    token sequences hash equally (replayed per doc)."""
    import numpy as np
    import pyarrow as pa

    from pdfextraction_ray.queries_web import NGRAM_W, _window_hashes

    col = pa.chunked_array([pa.array(texts, pa.string())])
    h, n_win = _window_hashes(col)
    toks = [t.split(" ") for t in texts]
    expect = [max(len(tk) - NGRAM_W + 1, 0) for tk in toks]
    assert n_win.tolist() == expect
    assert len(h) == sum(expect)
    # per-doc replay: hashing one doc alone gives the same window hashes
    pos = 0
    for t, e in zip(texts, expect):
        if e == 0:
            continue
        h1, _ = _window_hashes(pa.chunked_array([pa.array([t], pa.string())]))
        assert h[pos:pos + e].tolist() == h1.tolist()
        pos += e


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=200, unique=True),
       st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_checksum_split_invariance(ids, n_splits):
    """The corpus checksum is invariant to how rows are partitioned into
    batches (the associativity a distributed merge relies on)."""
    import numpy as np

    from pdfextraction_ray.queries_web import _CK_A, _CK_B, _CK_P

    d = np.array(ids, dtype=np.int64)
    c = (d * 7 + 13) % 1000  # deterministic fake n_chars
    whole = int(((d * _CK_A + c * _CK_B) % _CK_P).sum() % _CK_P)
    parts = np.array_split(np.arange(len(d)), n_splits)
    acc = 0
    for p in parts:
        acc = (acc + int(((d[p] * _CK_A + c[p] * _CK_B) % _CK_P).sum()
                         % _CK_P)) % _CK_P
    assert acc == whole


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 500)),
                min_size=1, max_size=120))
@settings(max_examples=40, deadline=None)
def test_weighted_sample_priority_batch_invariance(items):
    """A-Res priorities are per-row deterministic: the global top-k from
    any batch split equals the top-k of the whole (partial top-k merge
    correctness)."""
    import hashlib

    import numpy as np

    ids = np.array([i for i, _ in items], dtype=np.int64)
    w = np.array([x for _, x in items], dtype=np.float64)
    u = (np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                   for i in ids], dtype=np.float64) + 0.5) / 2**32
    pri = -np.log(u) / w
    k = 10
    whole = sorted(zip(pri, ids))[:k]
    merged = []
    for part in np.array_split(np.arange(len(ids)), 3):
        merged += sorted(zip(pri[part], ids[part]))[:k]
    assert sorted(merged)[:k] == whole


@given(st.lists(st.integers(-10**9, 10**9), min_size=0, max_size=200),
       st.lists(st.integers(-10**9, 10**9), min_size=0, max_size=200))
@settings(max_examples=60, deadline=None)
def test_sorted_member_equals_isin(members, probes):
    """sorted_member (the shared searchsorted membership kernel) equals
    np.isin on arbitrary int64 inputs, including empties and duplicates."""
    import numpy as np

    from pdfextraction_ray.queries_web import sorted_member

    srt = np.unique(np.array(members, dtype=np.int64))
    p = np.array(probes, dtype=np.int64)
    got = sorted_member(srt, p)
    assert got.tolist() == np.isin(p, srt).tolist()


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 20),
                          st.integers(3, 12), st.integers(2, 4)),
                min_size=1, max_size=25))
@settings(max_examples=40, deadline=None)
def test_vision_roundtrip_recovers_disjoint_boxes(specs):
    """render -> pixel CC recovery is exact for any set of word boxes once
    boxes that touch/overlap are merged — the property the vision A/B
    relies on. Boxes are laid out on a grid with >=1pt separation so the
    expected component count equals the box count."""
    import numpy as np

    from pdfextraction_ray import geometry as G
    from pdfextraction_ray.stages.vision import recover_boxes, render_words

    words = []
    for i, (col, row, w, h) in enumerate(specs[:25]):
        x0 = col * 45.0          # grid pitch > max width (12+margin)
        y0 = row * 8.0           # grid pitch > max height (4+margin)
        words.append(G.derive_word(f"w{i}", x0, y0, x0 + w, y0 + h))
    # dedupe grid cells (two boxes in one cell would overlap)
    seen, uniq = set(), []
    for w, (col, row, *_rest) in zip(words, specs):
        if (col, row) not in seen:
            seen.add((col, row))
            uniq.append(w)
    got = recover_boxes(render_words(uniq))
    assert len(got) == len(uniq)
    exp = sorted(uniq, key=lambda w: (w["y0"], w["x0"]))
    for a, b in zip(exp, got):
        for k in ("x0", "y0", "x1", "y1"):
            assert abs(a[k] - b[k]) < 1e-9


def test_bloom_from_dataset_equals_single_build(ray_session):
    """The distributed partial-filter build OR-merges to exactly the
    single-pass filter over the same keys."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.bloom import (bloom_build,
                                                   bloom_from_dataset,
                                                   bloom_params)

    keys = np.arange(0, 9000, 2, dtype=np.int64)
    m, k = bloom_params(len(keys), 0.01)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})) \
        .repartition(7)
    assert bytes(bloom_from_dataset(ds, "k", m, k)) == \
        bytes(bloom_build(pa.array(keys, pa.int64()), m, k))


# --- span-dedup kernels (queries_web): islands merge and cover mask -------

def _brute_islands(starts, w):
    """Union of [s, s+w-1] intervals -> list of (a, b) maximal spans."""
    spans = []
    for s in sorted(starts):
        if spans and s - spans[-1][1] <= w:
            spans[-1][1] = s
        else:
            spans.append([s, s])
    return [(a, b + w - 1) for a, b in spans]


member_lists = st.lists(
    st.lists(st.booleans(), min_size=0, max_size=30),
    min_size=1, max_size=6)


@given(member_lists)
@settings(max_examples=120, deadline=None)
def test_merge_window_islands_equals_interval_union(docs):
    import numpy as np

    from pdfextraction_ray.queries_web import NGRAM_W, merge_window_islands

    doc_of = np.concatenate([np.full(len(m), d, dtype=np.int64)
                             for d, m in enumerate(docs)])
    win_idx = np.concatenate([np.arange(len(m), dtype=np.int64)
                              for m in docs])
    member = np.concatenate([np.array(m, dtype=bool) for m in docs])
    n_spans, dup_tokens, longest = merge_window_islands(
        doc_of, win_idx, member, len(docs))
    for d, m in enumerate(docs):
        spans = _brute_islands([i for i, x in enumerate(m) if x], NGRAM_W)
        assert n_spans[d] == len(spans)
        assert dup_tokens[d] == sum(b - a + 1 for a, b in spans)
        assert longest[d] == max((b - a + 1 for a, b in spans), default=0)


@given(st.lists(st.integers(0, 60), min_size=0, max_size=25, unique=True),
       st.integers(1, 12))
@settings(max_examples=120, deadline=None)
def test_cover_mask_equals_explicit_union(starts, w):
    import numpy as np

    from pdfextraction_ray.queries_web import cover_mask

    n = 80
    got = cover_mask(np.array(sorted(starts), dtype=np.int64), n, w=w)
    want = np.zeros(n, dtype=bool)
    for s in starts:
        want[s:s + w] = True
    assert (got == want).all()


# --- SemDeDup greedy kernel (queries_curation) ----------------------------

vec_clusters = st.lists(
    st.lists(st.floats(-1, 1, allow_nan=False, width=32),
             min_size=4, max_size=4),
    min_size=1, max_size=14)


@given(vec_clusters, st.floats(0.2, 0.95))
@settings(max_examples=100, deadline=None)
def test_greedy_semantic_prune_invariants(vecs, tau):
    import numpy as np

    from pdfextraction_ray.queries_curation import greedy_semantic_prune

    mat = np.array(vecs, dtype=np.float64)
    ids = np.arange(len(mat), dtype=np.int64)
    cdist = np.linalg.norm(mat - mat.mean(axis=0), axis=1)
    keep, max_sim = greedy_semantic_prune(mat, cdist, ids, tau)
    assert keep.any()  # the first-visited member is always kept
    # flag and published similarity can never contradict
    assert ((~keep) == (max_sim >= tau)).all()
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-12)[:, None]
    kept = unit[keep]
    sims = kept @ kept.T
    np.fill_diagonal(sims, 0.0)
    # kept set pairwise below tau (up to the kernel's publish rounding)
    assert sims.max() < tau + 5e-5
    for i in np.flatnonzero(~keep):  # every dropped member has a witness
        assert (kept @ unit[i]).max() >= tau - 5e-5
    # ROW-ORDER INVARIANCE: shuffling the delivered rows permutes, never
    # changes, the per-id decisions (cross-session golden stability)
    perm = np.arange(len(mat))[::-1]
    keep2, max_sim2 = greedy_semantic_prune(mat[perm], cdist[perm],
                                            ids[perm], tau)
    assert (keep2 == keep[perm]).all()
    assert (max_sim2 == max_sim[perm]).all()


# -- hash-shuffle operators (functions/joins) --------------------------------

_kv_tables = st.lists(
    st.tuples(st.integers(-5, 5), st.integers(-3, 3),
              st.integers(-100, 100)),
    min_size=0, max_size=60)


@given(_kv_tables, st.sampled_from(["sum", "min", "max"]),
       st.integers(1, 5))
@settings(max_examples=15, deadline=None)
def test_hash_groupby_multi_matches_pandas(rows, agg, n_buckets):
    """Property: hash_groupby_multi == pandas groupby for any (k1,k2,v)
    table, any associative agg, any bucket count (incl. 1)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.joins import hash_groupby_multi

    df = pd.DataFrame(rows, columns=["k1", "k2", "v"]).astype("int64")
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(3)
    got = hash_groupby_multi(ds, ["k1", "k2"], [("v", agg)],
                             n_buckets=n_buckets).to_pandas()
    if len(df) == 0:
        assert len(got) == 0
        return
    got = got.sort_values(["k1", "k2"]).reset_index(drop=True)
    want = df.groupby(["k1", "k2"], as_index=False).agg({"v": agg}) \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


@given(_kv_tables, st.integers(1, 4))
@settings(max_examples=10, deadline=None)
def test_hash_group_apply_matches_pandas(rows, n_buckets):
    """Property: hash_group_apply(fn) == pandas per-group apply for any
    (k1,k2,v) table and bucket count — groups land whole, boundaries are
    exact even when adjacent keys hash-collide."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.joins import hash_group_apply

    df = pd.DataFrame(rows, columns=["k1", "k2", "v"]).astype("int64")
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(2)

    def summ(g: pa.Table) -> pa.Table:
        import numpy as np
        v = g.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"k1": g.column("k1").slice(0, 1),
                         "k2": g.column("k2").slice(0, 1),
                         "lo": pa.array([int(v.min())], pa.int64()),
                         "hi": pa.array([int(v.max())], pa.int64()),
                         "n": pa.array([len(v)], pa.int64())})

    schema = pa.schema([("k1", pa.int64()), ("k2", pa.int64()),
                        ("lo", pa.int64()), ("hi", pa.int64()),
                        ("n", pa.int64())])
    got = hash_group_apply(ds, ["k1", "k2"], summ, n_buckets=n_buckets,
                           out_schema=schema).to_pandas()
    if len(df) == 0:
        assert len(got) == 0
        return
    got = got.sort_values(["k1", "k2"]).reset_index(drop=True)
    want = df.groupby(["k1", "k2"], as_index=False) \
        .agg(lo=("v", "min"), hi=("v", "max"), n=("v", "size")) \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))

"""Unit tests: JSON ops (M16-M18), previews (M21/M22), overrides (J5),
cost metrics (F8/G4), text kernels, dedup sketches."""

import json

import numpy as np
import pyarrow as pa
import pytest

from pdfextraction_ray.functions import dedup as D
from pdfextraction_ray.functions import jsonops as J
from pdfextraction_ray.functions import metrics as MT
from pdfextraction_ray.functions import text as TX
from pdfextraction_ray.stages.preview import (detect_potential_tables_text,
                                              page_thumbnails)


# -- jsonops ----------------------------------------------------------------

def test_clean_json_trailing_commas_and_balance():
    assert json.loads(J.clean_json_string('{"a": 1,}')) == {"a": 1}
    assert json.loads(J.clean_json_string('{"a": [1, 2,')) == {"a": [1, 2]}
    assert json.loads(J.clean_json_string('{"a": {"b": "x')) == {"a": {"b": "x"}}


def test_extract_json_strategies():
    fenced = 'noise ```json\n{"k": 1}\n``` trailing'
    assert J.extract_json_from_response(fenced) == {"k": 1}
    bare = 'text before {"x": [1, 2]} after'
    assert J.extract_json_from_response(bare) == {"x": [1, 2]}
    truncated = 'result: {"a": {"b": 1,'
    assert J.extract_json_from_response(truncated) == {"a": {"b": 1}}
    assert J.extract_json_from_response("no json here") is None
    assert J.extract_json_from_response("") is None


def test_fallback_response_sniffing():
    assert J.fallback_response("classification", "looks like a table")["classification"] == "table"
    assert J.fallback_response("classification", "a form with table parts")["classification"] == "mixed"
    assert J.fallback_response("classification", "plain")["classification"] == "form"
    obj, ok = J.parse_json_or_fallback("garbage", "field_identification")
    assert not ok and obj["form_fields"] == []
    obj2, ok2 = J.parse_json_or_fallback('{"extracted_data": {}}')
    assert ok2


# -- preview ----------------------------------------------------------------

def test_detect_potential_tables_text():
    tably = "a b c\nd e f\ng h i\n"
    assert detect_potential_tables_text(tably)
    assert not detect_potential_tables_text("one two\nthree\n")
    assert not detect_potential_tables_text("")


def test_page_thumbnails(ray_session):
    import ray.data as rd
    t = pa.Table.from_pydict({
        "url": ["u1", "u2"],
        "extracted_text": ["x " * 300, "a b c\nd e f\ng h i"]})
    out = page_thumbnails(rd.from_arrow(t)).to_pandas()
    assert len(out.loc[0, "text_preview"]) == 200
    assert bool(out.loc[1, "has_tables"])
    assert out.loc[1, "n_words_preview"] == 9


# -- metrics ----------------------------------------------------------------

def test_estimated_cost_matches_reference_table():
    # gpt-4: $0.03/1K in, $0.06/1K out (openai_service.py:226-231)
    assert MT.estimated_cost("gpt-4", 1000, 500) == pytest.approx(0.03 + 0.03)
    assert MT.estimated_cost("unknown-model", 1000, 0) == pytest.approx(0.0015)


def test_add_cost_column():
    t = pa.Table.from_pydict({"model": ["gpt-4", "gpt-4o-mini"],
                              "input_tokens": [1000, 2000],
                              "output_tokens": [0, 1000]})
    out = MT.add_cost_column(t)
    assert out.column("estimated_cost").to_pylist() == \
        pytest.approx([0.03, 0.0003 + 0.0006])


def test_optimization_suggestions_rules():
    sugg = MT.optimization_suggestions({
        "classification": {"cost": 1.0, "count": 10, "models": {"gpt-4"}},
        "data_extraction": {"cost": 0.1, "count": 10, "models": {"gpt-3.5-turbo"}}})
    assert any("gpt-3.5-turbo" in s for s in sugg)
    assert MT.optimization_suggestions({}) == \
        ["Current model selection appears optimized for the workload"]


# -- text kernels -----------------------------------------------------------

def test_token_counts_and_quality():
    t = pa.Table.from_pydict({"text": ["one two  three", "", "Hi! there."]})
    assert TX.token_counts(t["text"]).to_pylist() == [3, 0, 2]
    q = TX.quality_columns(t)
    assert q.column("n_punct").to_pylist() == [0, 0, 2]
    assert q.column("n_upper").to_pylist() == [0, 0, 1]


def test_language_id():
    en = "the quick brown fox and the lazy dog went to the market of things " * 3
    de = "der schnelle braune fuchs und die faulen hunde gingen in die schule " * 3
    fr = "le renard brun rapide et le chien paresseux sont dans la maison de " * 3
    assert TX.detect_language(en) == "en"
    assert TX.detect_language(de) == "de"
    assert TX.detect_language(fr) == "fr"
    assert TX.detect_language("short") == "und"


def test_rolling_fingerprint_deterministic_and_sensitive():
    a = TX.rolling_fingerprint("hello world " * 20)
    b = TX.rolling_fingerprint("hello world " * 20)
    c = TX.rolling_fingerprint("entirely different document body " * 10)
    assert a == b
    assert a != c
    # near-identical periodic text keeps the same min-window fingerprint —
    # that IS the near-dup property of winnowing
    near = TX.rolling_fingerprint("hello world " * 19 + "hello w0rld ")
    assert near == a
    assert TX.rolling_fingerprint("") == 0


# -- dedup sketches ---------------------------------------------------------

def test_minhash_similarity_tracks_jaccard():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy")
    far = "completely different content about data pipelines and arrow " * 10
    p = D._minhash_params(64)
    sa = D.minhash_signature(base, 64, params=p)
    sb = D.minhash_signature(near, 64, params=p)
    sc = D.minhash_signature(far, 64, params=p)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.6 > sim_ac
    j_ab = D.jaccard_ngrams(base, near)
    assert abs(sim_ab - j_ab) < 0.25


def test_lsh_banding_catches_near_dups():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("dog ", "dog! ")
    p = D._minhash_params(64)
    ba = D.band_buckets(D.minhash_signature(base, 64, params=p), 16)
    bb = D.band_buckets(D.minhash_signature(near, 64, params=p), 16)
    assert any(x == y for x, y in zip(ba, bb))


def test_simhash_hamming():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "crazy")
    far = "data pipelines with arrow batches and actor pools " * 10
    assert D.hamming64(D.simhash64(base), D.simhash64(near)) < \
        D.hamming64(D.simhash64(base), D.simhash64(far))
    assert D.simhash64(base) == D.simhash64(base)


def test_candidate_pairs_truncation():
    pairs = D.candidate_pairs_from_bucket(range(100), max_pairs_per_bucket=50)
    assert len(pairs) == 50
    assert pairs[0] == (0, 1)


def test_simhash_bands_lsh_property():
    """Near-identical texts (hamming < 4) must share at least one 16-bit band."""
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("dog ", "dog! ")
    sa, sb = D.simhash64(base), D.simhash64(near)
    if D.hamming64(sa, sb) < 4:
        assert any(x == y for x, y in zip(D.simhash_bands(sa), D.simhash_bands(sb)))
    bands = D.simhash_bands(-1)  # all-ones simhash (signed representation)
    assert bands == [0xFFFF] * 4


# -- bucket cosine scoring kernel (embedding LSH skew guard) ------------------

def test_score_cosine_bucket_chunked_equals_dense():
    """Slab-chunked scoring returns exactly the dense all-pairs set."""
    from pdfextraction_ray.functions.similarity import score_cosine_bucket

    rng = np.random.RandomState(3)
    ids = (np.arange(50, dtype=np.int64) * 7) % 991
    mat = rng.standard_normal((50, 16))
    va, vb = score_cosine_bucket(ids, mat, 0.2, max_bucket=100, chunk=8)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    s = unit @ unit.T
    ii, jj = np.nonzero(s >= 0.2)
    keep = ids[ii] < ids[jj]
    expect = set(zip(ids[ii][keep], ids[jj][keep]))
    assert expect and set(zip(va, vb)) == expect
    assert (va < vb).all()


def test_score_cosine_bucket_skew_cap_warns_and_bounds():
    """A deliberately-hot bucket trips the max_bucket guard: loud warning,
    only the max_bucket smallest vec_ids are scored, no quadratic blow-up."""
    from pdfextraction_ray.functions.similarity import score_cosine_bucket

    rng = np.random.RandomState(5)
    ids = rng.permutation(500).astype(np.int64)
    mat = rng.standard_normal((500, 8))
    with pytest.warns(UserWarning, match="capped"):
        va, vb = score_cosine_bucket(ids, mat, -1.0, max_bucket=10, chunk=4)
    small = set(np.sort(ids)[:10].tolist())
    assert set(va.tolist()) | set(vb.tolist()) <= small
    assert len(va) == 10 * 9 // 2  # threshold -1 scores every kept pair

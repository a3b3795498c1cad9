"""Bucketed map-side join (functions/joins.py): the mid-size regime between
broadcast dicts and Dataset.join. Exercised with a build side big enough to
exceed any single-object broadcast budget (VERDICT r2 #4 done-criterion)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pdfextraction_ray.functions.joins import (BucketedBuildSide, _bucket_of,
                                               _probe_batch, bucketed_join)


def _corpus(n_build=50_000, n_probe=20_000, seed=3):
    rng = np.random.default_rng(seed)
    build = pa.table({
        "k": pa.array(np.arange(n_build, dtype=np.int64) * 7 + 1),
        "v": pa.array([f"val-{i}" for i in range(n_build)]),
        "w": pa.array(rng.integers(0, 1000, n_build), pa.int64())})
    # ~70% of probe keys hit, the rest miss
    hit = rng.integers(0, n_build, n_probe) * 7 + 1
    miss = rng.integers(0, n_build, n_probe) * 7 + 3  # never ==1 mod 7
    keys = np.where(rng.random(n_probe) < 0.7, hit, miss)
    probe = pa.table({"k": pa.array(keys, pa.int64()),
                      "payload": pa.array(rng.random(n_probe))})
    return build, probe


def _expected(build, probe, how):
    b = build.to_pandas()
    p = probe.to_pandas()
    out = p.merge(b, on="k", how=how)
    return out.sort_values(["k", "payload"]).reset_index(drop=True)


def test_bucketed_build_side_partitions_whole_table(ray_session):
    build, _ = _corpus(n_build=10_000)
    side = BucketedBuildSide(build, "k", n_buckets=16)
    assert len(side.refs) == 16
    import ray
    parts = ray.get(side.refs)
    assert sum(t.num_rows for t in parts) == build.num_rows
    # genuinely split: no bucket holds everything, most buckets non-empty
    assert max(t.num_rows for t in parts) < build.num_rows
    assert sum(1 for t in parts if t.num_rows > 0) >= 12


def test_bucketed_join_matches_pandas_left_and_inner(ray_session):
    build, probe = _corpus()  # 50k-key build side: past any broadcast budget
    for how in ("left", "inner"):
        got = bucketed_join(rd.from_arrow(probe), build, probe_key="k",
                            build_key="k", join_type=how, n_buckets=32) \
            .to_pandas().sort_values(["k", "payload"]).reset_index(drop=True)
        exp = _expected(build, probe, how)
        assert list(got.columns) == list(exp.columns)
        pd.testing.assert_frame_equal(got, exp)


def test_bucketed_join_string_keys(ray_session):
    build = pa.table({"name": [f"dom{i}.example" for i in range(5_000)],
                      "rank": pa.array(range(5_000), pa.int64())})
    probe = pa.table({"name": [f"dom{i % 7_000}.example" for i in range(9_000)]})
    got = bucketed_join(rd.from_arrow(probe), build, probe_key="name",
                        build_key="name", join_type="left", n_buckets=8) \
        .to_pandas()
    exp = probe.to_pandas().merge(build.to_pandas(), on="name", how="left")
    got = got.sort_values("name").reset_index(drop=True)
    exp = exp.sort_values("name").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_probe_batch_empty_keeps_schema(ray_session):
    build, _ = _corpus(n_build=100, n_probe=10)
    side = BucketedBuildSide(build, "k", n_buckets=4)
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "payload": pa.array([], pa.float64())})
    out = _probe_batch(empty, side.refs, "k", "k", ["v", "w"],
                       {"v": pa.string(), "w": pa.int64()}, 4, "left")
    assert out.num_rows == 0
    assert out.schema.field("v").type == pa.string()
    assert out.schema.field("w").type == pa.int64()


def test_bucket_hash_identical_across_calls():
    arr = pa.chunked_array([pa.array([1, 2, 3], pa.int64()),
                            pa.array([4, 5], pa.int64())])
    a = _bucket_of(arr, 16)
    b = _bucket_of(pa.array([1, 2, 3, 4, 5], pa.int64()), 16)
    assert list(a) == list(b)


def test_string_bucket_consistent_with_nul_bytes(ray_session):
    """Regression: pandas hash_array's categorize path mis-hashes strings
    with embedded NUL bytes inconsistently across arrays, which silently
    dropped matches in inner bucketed joins on composite "a\\0b" keys."""
    words = ["the", "fast", "key", "the\x00fast", "fast\x00key"]
    keys = [f"{a}\x00{b}" for a in words for b in words] * 40
    build = pa.table({"k": sorted(set(keys)),
                      "v": list(range(len(set(keys))))})
    buckets_build = _bucket_of(build.column("k"), 64)
    bmap = dict(zip(build.column("k").to_pylist(), buckets_build))
    buckets_probe = _bucket_of(pa.array(keys, pa.string()), 64)
    assert all(bmap[k] == b for k, b in zip(keys, buckets_probe))
    got = bucketed_join(rd.from_arrow(pa.table({"k": keys})), build,
                        probe_key="k", build_key="k", join_type="inner",
                        n_buckets=16)
    assert got.count() == len(keys)  # every probe key exists in the build


def test_bucketed_join_probe_batch_with_null_int_key(ray_session):
    """A probe batch containing one null integer key must still bucket its
    NON-null keys identically to the (null-free) build side — dtype-based
    path selection used to flip the whole batch onto the string-hash path
    and silently miss every match."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.joins import bucketed_join

    build = pa.table({"k": pa.array(list(range(100)), pa.int64()),
                      "v": pa.array([i * 10 for i in range(100)], pa.int64())})
    probe = pa.table({"k": pa.array([5, None, 42, 99], pa.int64())})
    out = bucketed_join(rd.from_arrow(probe), build, probe_key="k",
                        build_key="k", value_cols=["v"], n_buckets=8,
                        join_type="left").to_pandas().sort_values("k")
    got = dict(zip(out.k.dropna().astype(int), out.v.dropna().astype(int)))
    assert got == {5: 50, 42: 420, 99: 990}
    assert out.v.isna().sum() == 1  # the null key matched nothing


def test_bloom_no_false_negatives_with_null_int_key(ray_session):
    """Bloom 'False is always correct': a probe batch with a null integer
    key must not flip the batch's hash path and produce false negatives."""
    import numpy as np
    import pyarrow as pa

    from pdfextraction_ray.functions.bloom import (bloom_build,
                                                   bloom_contains,
                                                   bloom_params)

    m, k = bloom_params(1000)
    keys = pa.array(list(range(0, 1000, 7)), pa.int64())
    bits = bloom_build(keys, m, k)
    probe = pa.array([7, None, 14, 21, 3], pa.int64())
    got = bloom_contains(bits, probe, m, k)
    assert bool(got[0]) and bool(got[2]) and bool(got[3])  # real members


def test_dataset_build_side_tolerates_empty_schema_blocks(ray_session):
    """Ray's sort-shuffle aggregates emit empty ZERO-COLUMN blocks at some
    layouts; from_dataset must type them from the declared schema instead
    of KeyError-ing in the split task (hit live at sf0.1, r4)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from pdfextraction_ray.functions.joins import (_split_block_to_buckets,
                                                   bucketed_join)

    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    pieces = ray.get(_split_block_to_buckets.options(num_returns=4).remote(
        pa.table({}), "k", 4, schema))
    assert all(p.schema.equals(schema) and p.num_rows == 0 for p in pieces)

    # end-to-end: a build dataset whose groupby layout includes empty blocks
    t = pa.table({"k": pa.array(np.arange(2000) % 7, pa.int64()),
                  "v": pa.array(np.ones(2000), pa.int64())})
    from ray.data.aggregate import Sum
    build = rd.from_arrow(t).repartition(16).groupby("k") \
        .aggregate(Sum("v", alias_name="v"))
    probe = rd.from_arrow(pa.table({"k": pa.array([0, 3, 99], pa.int64())}))
    out = bucketed_join(probe, build, probe_key="k", build_key="k",
                        value_cols=["v"], n_buckets=4,
                        join_type="left").to_pandas().sort_values("k")
    assert out.v.dropna().astype(int).tolist() == [286, 286]


def test_int_keys_membership_both_regimes(ray_session):
    """Broadcast and bloom+bucketed-verify regimes agree exactly; empty key
    sets answer all-False."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.joins import int_keys_membership

    keys = np.arange(0, 20_000, 3, dtype=np.int64)  # 6667 keys
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    probes = np.arange(-5, 20_010, dtype=np.int64)
    want = np.isin(probes, keys)

    m_bc = int_keys_membership(ds, "k", broadcast_max=10_000_000)
    m_bl = int_keys_membership(ds, "k", broadcast_max=0)  # force scale path
    assert np.array_equal(m_bc(probes), want)
    assert np.array_equal(m_bl(probes), want)
    assert np.array_equal(m_bc(np.array([], dtype=np.int64)),
                          np.zeros(0, bool))

    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    m_e = int_keys_membership(empty, "k")
    assert not m_e(probes).any()


def test_hash_groupby_sum_matches_ray_groupby(ray_session):
    """Differential: the explicit two-level hash reduce returns exactly
    Ray's groupby().sum() rows, plus the min_total filter semantics."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.joins import hash_groupby_sum

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 500, size=20_000, dtype=np.int64)
    vals = rng.integers(1, 5, size=20_000, dtype=np.int64)
    t = pa.table({"k": pa.array(keys), "n": pa.array(vals)})
    ds = rd.from_arrow(t).repartition(8)

    got = hash_groupby_sum(ds, "k", "n").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = ds.groupby("k").sum("n").to_pandas() \
        .rename(columns={"sum(n)": "n"}).sort_values("k") \
        .reset_index(drop=True)
    assert got.k.tolist() == want.k.tolist()
    assert got.n.tolist() == want.n.tolist()

    thr = int(np.median(want.n))
    got_f = hash_groupby_sum(ds, "k", "n", min_total=thr).to_pandas()
    assert sorted(got_f.k) == sorted(want[want.n >= thr].k)

    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                    "n": pa.array([], pa.int64())}))
    assert hash_groupby_sum(empty, "k", "n").count() == 0


def test_hash_group_apply_matches_map_groups(ray_session):
    """Differential vs groupby().map_groups() on a composite key,
    including groups that span input blocks and an empty-result fn."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.joins import hash_group_apply

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table({
        "a": pa.array(rng.integers(0, 40, n, dtype=np.int64)),
        "b": pa.array(rng.integers(0, 5, n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 100, n, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(16)

    def summarize(g: pa.Table) -> pa.Table:
        return pa.table({
            "a": g.column("a").slice(0, 1),
            "b": g.column("b").slice(0, 1),
            "total": pa.array([int(np.sum(
                g.column("v").to_numpy(zero_copy_only=False)))], pa.int64()),
            "rows": pa.array([g.num_rows], pa.int64())})

    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("total", pa.int64()), ("rows", pa.int64())])
    got = hash_group_apply(ds, ["a", "b"], summarize, n_buckets=8,
                           out_schema=schema).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    want = ds.groupby(["a", "b"]).map_groups(
        summarize, batch_format="pyarrow").to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert got.equals(want)

    # fn returning empty tables for every group -> typed empty result
    def nothing(g: pa.Table) -> pa.Table:
        return schema.empty_table()
    out = hash_group_apply(ds, ["a", "b"], nothing, n_buckets=4,
                           out_schema=schema)
    assert out.count() == 0


def test_hash_groupby_null_keys_match_ray(ray_session):
    """Null keys: the agg path groups all nulls together (pyarrow group_by
    semantics), matching Ray's groupby. Pinned so the operators' null
    contract is explicit — hash_group_apply does NOT support null keys
    (exact boundary comparison is NaN-poisoned) and callers must filter."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfextraction_ray.functions.joins import hash_groupby_multi

    t = pa.table({"k": pa.array([1, None, 2, None, 1], pa.int64()),
                  "n": pa.array([10, 1, 20, 2, 30], pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    got = hash_groupby_multi(ds, "k", [("n", "sum")]).to_pandas() \
        .sort_values("k", na_position="last").reset_index(drop=True)
    want = ds.groupby("k").sum("n").to_pandas() \
        .rename(columns={"sum(n)": "n"}) \
        .sort_values("k", na_position="last").reset_index(drop=True)
    assert got.k.tolist()[:2] == want.k.tolist()[:2] == [1.0, 2.0]
    assert got.n.tolist() == want.n.tolist() == [40, 20, 3]

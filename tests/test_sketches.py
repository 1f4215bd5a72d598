"""Mergeable sketches: HLL distinct, count-min frequencies, HDR
quantiles — accuracy vs exact, merge laws, parallelism-independence,
and the NULL/non-finite exclusion discipline."""

import math

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.sketches import (
    cms_estimate,
    cms_sketch,
    hdr_quantiles,
    hll_estimate,
    hll_sketch,
)


def _regs(df):
    return {r["register"]: r["max_rank"] for r in df.collect()}


class TestHll:
    def test_estimate_accuracy(self, spark):
        n = 5000
        df = spark.range(n).select(F.concat(F.lit("user-"), F.col("id")).alias("k"))
        est = hll_estimate(_regs(hll_sketch(df, "k", p=8)), p=8)
        # expected rel-err ~1.04/sqrt(256) = 6.5%; 3 sigma bound
        assert abs(est - n) / n < 0.20

    def test_small_range_linear_counting(self, spark):
        df = spark.range(10).select(F.col("id").cast("string").alias("k"))
        est = hll_estimate(_regs(hll_sketch(df, "k", p=8)), p=8)
        assert abs(est - 10) < 1.5

    def test_merge_is_groupby_max(self, spark):
        df = spark.range(3000).select(F.col("id").cast("string").alias("k"))
        a = hll_sketch(df.filter("CAST(k AS BIGINT) % 2 = 0"), "k", p=8)
        b = hll_sketch(df.filter("CAST(k AS BIGINT) % 2 = 1"), "k", p=8)
        merged = (
            a.unionByName(b)
            .groupBy("register")
            .agg(F.max("max_rank").alias("max_rank"))
        )
        assert _regs(merged) == _regs(hll_sketch(df, "k", p=8))

    def test_duplicates_do_not_move_registers(self, spark):
        df = spark.range(500).select(F.col("id").cast("string").alias("k"))
        dup = df.unionByName(df).unionByName(df)
        assert _regs(hll_sketch(dup, "k", p=8)) == _regs(hll_sketch(df, "k", p=8))

    def test_null_keys_excluded_and_grouping(self, spark):
        df = spark.createDataFrame(
            [("a", "x"), ("a", None), ("b", "x"), ("b", "y")], "g string, k string"
        )
        out = hll_sketch(df, "k", by=("g",), p=4)
        per_g = {
            g: n
            for g, n in out.groupBy("g").count().collect()
        }
        assert per_g["a"] == 1  # the NULL key contributed nothing
        assert per_g["b"] == 2

    def test_parallelism_independent(self, spark):
        df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
        one = _regs(hll_sketch(df.repartition(1), "k", p=8))
        many = _regs(hll_sketch(df.repartition(16), "k", p=8))
        assert one == many

    def test_p_validation(self, spark):
        df = spark.range(1).select(F.col("id").cast("string").alias("k"))
        with pytest.raises(ValueError, match="p must be"):
            hll_sketch(df, "k", p=2)


def _cells(df):
    return {(r["depth_idx"], r["col_idx"]): r["cnt"] for r in df.collect()}


class TestCms:
    def test_estimate_never_underestimates(self, spark):
        rows = [(f"v{i % 50}",) for i in range(2000)]
        df = spark.createDataFrame(rows, "v string")
        cells = _cells(cms_sketch(df, "v", depth=4, width=64))
        true = 2000 // 50
        for i in range(50):
            assert cms_estimate(cells, f"v{i}", depth=4, width=64) >= true

    def test_wide_sketch_is_exact(self, spark):
        rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, "v string")
        cells = _cells(cms_sketch(df, "v", depth=4, width=4096))
        assert cms_estimate(cells, "a", depth=4, width=4096) == 7
        assert cms_estimate(cells, "b", depth=4, width=4096) == 3
        assert cms_estimate(cells, "c", depth=4, width=4096) == 1
        # absent value: min over rows may still collide, but with
        # width >> distincts it reads 0
        assert cms_estimate(cells, "zzz", depth=4, width=4096) == 0

    def test_merge_is_groupby_sum(self, spark):
        df = spark.range(1000).select((F.col("id") % 30).cast("string").alias("v"))
        a = cms_sketch(df.filter("CAST(v AS BIGINT) % 3 != 0"), "v", width=64)
        b = cms_sketch(df.filter("CAST(v AS BIGINT) % 3 = 0"), "v", width=64)
        merged = (
            a.unionByName(b)
            .groupBy("depth_idx", "col_idx")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert _cells(merged) == _cells(cms_sketch(df, "v", width=64))

    def test_total_mass_per_row(self, spark):
        df = spark.range(500).select((F.col("id") % 9).cast("string").alias("v"))
        out = cms_sketch(df, "v", depth=3, width=16)
        mass = {
            r["depth_idx"]: r["m"]
            for r in out.groupBy("depth_idx").agg(F.sum("cnt").alias("m")).collect()
        }
        assert mass == {0: 500, 1: 500, 2: 500}

    def test_null_values_excluded(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
        cells = _cells(cms_sketch(df, "v", depth=2, width=16))
        assert sum(c for (d, _), c in cells.items() if d == 0) == 2


class TestHdrQuantiles:
    def test_brackets_exact_percentile(self, spark):
        # exponentially spread values so buckets matter
        rows = [(float(1.0001 ** i),) for i in range(4000)]
        df = spark.createDataFrame(rows, "v double")
        exact = sorted(int(r[0] * 1_000_000) for r in rows)
        out = {r["q"]: r["bucket_lo"] for r in hdr_quantiles(df, "v", k=5).collect()}
        n = len(rows)
        for q in (50, 90, 99):
            true = exact[(n - 1) * q // 100]  # nearest-rank (1-based rank -> 0-based)
            lo = out[q]
            assert lo <= true
            # bucket width <= 2^-k of the bucket's octave
            assert true < lo + max(lo, 32) / 32 + 1

    def test_grouped_and_zero(self, spark):
        rows = [("a", 0.0)] * 5 + [("a", 10.0)] * 5 + [("b", 1.0)] * 10
        df = spark.createDataFrame(rows, "g string, v double")
        out = {(r["g"], r["q"]): r["bucket_lo"]
               for r in hdr_quantiles(df, "v", by=("g",), qs=(50,)).collect()}
        assert out[("a", 50)] == 0  # rank 5 of 10 -> the 0.0 bucket
        assert out[("b", 50)] == 999424  # 1e6: msb 20, shift 14 -> 61*16384

    def test_non_finite_and_negative_excluded(self, spark):
        rows = [(1.0,), (float("nan"),), (float("inf"),), (-5.0,), (1.0,)]
        df = spark.createDataFrame(rows, "v double")
        out = hdr_quantiles(df, "v", qs=(50,)).collect()
        assert len(out) == 1 and out[0]["bucket_lo"] == 999424

    def test_parallelism_independent(self, spark):
        df = spark.range(3000).select((F.col("id") * 7 % 997).cast("double").alias("v"))
        a = sorted(map(tuple, hdr_quantiles(df.repartition(1), "v").collect()))
        b = sorted(map(tuple, hdr_quantiles(df.repartition(16), "v").collect()))
        assert a == b

    def test_validation(self, spark):
        df = spark.range(1).select(F.col("id").cast("double").alias("v"))
        with pytest.raises(ValueError, match="qs"):
            hdr_quantiles(df, "v", qs=())
        with pytest.raises(ValueError, match="percents"):
            hdr_quantiles(df, "v", qs=(0,))
        with pytest.raises(ValueError, match="k must"):
            hdr_quantiles(df, "v", k=99)


def test_bloom_no_false_negatives_and_deterministic_fps(spark):
    """Every inserted key probes maybe_seen; FP verdicts replay the
    md5 position math exactly (pure-Python twin)."""
    import hashlib

    from beats_spark.operators.sketches import bloom_build, bloom_probe

    n_bits, k, seed = 128, 3, 7
    keys = [f"url{i}" for i in range(60)]
    inserted = keys[:40]
    df = spark.createDataFrame([(u,) for u in keys], "url string")
    bloom = bloom_build(
        spark.createDataFrame([(u,) for u in inserted], "url string"),
        "url", n_bits, k, seed,
    )
    out = {r.url: r.maybe_seen for r in
           bloom_probe(df, bloom, "url", n_bits, k, seed).collect()}
    assert all(out[u] for u in inserted)  # no false negatives, ever
    # python twin of the position set and the all-k rule
    def positions(u):
        return {
            int(hashlib.md5(f"s{seed * 1000 + i}|{u}".encode())
                .hexdigest()[:15], 16) % n_bits
            for i in range(k)
        }
    bits = set()
    for u in inserted:
        bits |= positions(u)
    for u in keys:
        assert out[u] == (positions(u) <= bits), u
    # 128 bits / 40×3 hashes is deliberately tight: FPs must exist
    # (url49/url58 collide fully — verified by the twin above)
    assert any(out[u] for u in keys[40:])


def test_bloom_merge_is_union(spark):
    """Filters built on disjoint shards merge by union+distinct into
    exactly the filter built on the union — the mergeability contract."""
    from beats_spark.operators.sketches import bloom_build

    a = spark.createDataFrame([(f"k{i}",) for i in range(20)], "u string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(15, 40)], "u string")
    both = a.unionByName(b)
    merged = (
        bloom_build(a, "u", 512, 3, 1)
        .unionByName(bloom_build(b, "u", 512, 3, 1))
        .distinct()
    )
    direct = bloom_build(both, "u", 512, 3, 1)
    assert {r.bit for r in merged.collect()} == {r.bit for r in direct.collect()}


def test_bloom_rejects_bad_params(spark):
    import pytest

    from beats_spark.operators.sketches import bloom_build

    df = spark.createDataFrame([("x",)], "u string")
    with pytest.raises(ValueError):
        bloom_build(df, "u", 0, 3)
    with pytest.raises(ValueError):
        bloom_build(df, "u", 64, 0)


def test_kmv_state_merge_and_estimates(spark):
    """State = exact k smallest distinct hashes (python twin); merge
    of shard sketches equals the sketch of the union; estimates land
    within the k=64 error envelope; undersized groups are exact."""
    import hashlib

    from beats_spark.operators.sketches import (
        kmv_estimate,
        kmv_jaccard,
        kmv_merge,
        kmv_sketch,
    )

    K = 64
    keys_a = [f"doc-a-{i}" for i in range(2000)]
    keys_b = [f"doc-a-{i}" for i in range(1000)] + [
        f"doc-b-{i}" for i in range(1000)
    ]  # true |A∩B|=1000, |A∪B|=3000, J=1/3
    df = spark.createDataFrame(
        [("a", u) for u in keys_a] + [("b", u) for u in keys_b]
        + [("tiny", "x"), ("tiny", "y"), ("tiny", "x")],
        "grp string, u string",
    )
    st = kmv_sketch(df, "u", ["grp"], k=K, salts=4)
    rows = st.collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append((r.rank, r.h))

    def twin(keys):
        hs = sorted({
            int(hashlib.md5(f"s0|{u}".encode()).hexdigest()[:15], 16)
            for u in keys
        })
        return hs[:K]

    for grp, keys in (("a", keys_a), ("b", keys_b)):
        got = [h for _, h in sorted(by_grp[grp])]
        assert got == twin(keys), grp
    assert sorted(h for _, h in by_grp["tiny"]) == twin(["x", "y"])
    assert kmv_estimate([h for _, h in by_grp["tiny"]], K) == 2.0
    # estimates: k=64 → relative σ ≈ 1/sqrt(62) ≈ 13%; allow 3σ
    est_a = kmv_estimate([h for _, h in by_grp["a"]], K)
    assert abs(est_a - 2000) / 2000 < 0.4, est_a
    j = kmv_jaccard(
        [h for _, h in by_grp["a"]], [h for _, h in by_grp["b"]], K
    )
    assert abs(j - 1 / 3) < 0.25, j
    # merge property: shard sketches merge to the union's sketch
    sh1 = kmv_sketch(
        spark.createDataFrame([("a", u) for u in keys_a[:900]], "grp string, u string"),
        "u", ["grp"], k=K, salts=4,
    )
    sh2 = kmv_sketch(
        spark.createDataFrame([("a", u) for u in keys_a[900:]], "grp string, u string"),
        "u", ["grp"], k=K, salts=4,
    )
    merged = {(r.rank, r.h) for r in kmv_merge([sh1, sh2], ["grp"], K).collect()}
    direct = {(r.rank, r.h) for r in st.where("grp = 'a'").collect()}
    assert merged == direct


def test_kmv_rejects_bad_params(spark):
    import pytest

    from beats_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame([("x",)], "u string")
    with pytest.raises(ValueError):
        kmv_sketch(df, "u", k=0)
    with pytest.raises(ValueError):
        kmv_sketch(df, "u", salts=0)


def test_kmv_overlap_matrix_counts_merged_bottom_k(spark):
    """n_both counts only hashes inside the MERGED bottom-k that sit
    in both states; pairs are a<b once; k_used caps at k."""
    from beats_spark.operators.sketches import kmv_overlap_matrix

    rows = (
        [("a", h) for h in (1, 2, 3, 50)]
        + [("b", h) for h in (2, 3, 40, 60)]
        + [("c", h) for h in (100, 101)]
    )
    st = spark.createDataFrame(rows, "source string, h long")
    out = {(r.src_a, r.src_b): r for r in
           kmv_overlap_matrix(st, "source", k=4).collect()}
    ab = out[("a", "b")]
    # merged bottom-4 of {1,2,3,40,50,60} = {1,2,3,40}; both = {2,3}
    assert ab.k_used == 4 and ab.n_both == 2
    ac = out[("a", "c")]
    assert ac.k_used == 4 and ac.n_both == 0  # merged {1,2,3,50}
    bc = out[("b", "c")]
    assert bc.k_used == 4 and bc.n_both == 0
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}

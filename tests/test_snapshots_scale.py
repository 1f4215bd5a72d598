"""Unit tests for the round-5 scale/ops trio: corpus snapshot diff,
salted two-phase aggregation, and Fleiss' kappa rater agreement (the
kappa parity lives in test_ranking-adjacent form here because the
fixtures are shared with the diff tests)."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from beats_spark.operators.ranking import fleiss_kappa
from beats_spark.operators.scale import salted_agg
from beats_spark.operators.snapshots import corpus_diff, corpus_diff_stats


# ---------------------------------------------------------------- diff


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, None), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta2"), (4, None), (5, "now-text"), (6, "new")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert rows[1]["status"] == "unchanged"
    assert rows[2]["status"] == "changed"
    assert rows[3]["status"] == "removed"
    # NULL text on both sides is UNCHANGED (the sentinel), and
    # NULL -> text is CHANGED — not swallowed by NULL <> NULL
    assert rows[4]["status"] == "unchanged"
    assert rows[5]["status"] == "changed"
    assert rows[6]["status"] == "added"
    # absent sides report 0 chars so the rollup deltas stay non-NULL
    assert rows[6]["old_chars"] == 0 and rows[6]["new_chars"] == 3
    assert rows[3]["new_chars"] == 0

    stats = {r["status"]: r for r in corpus_diff_stats(corpus_diff(old, new)).collect()}
    assert stats["changed"]["n_docs"] == 2
    assert stats["changed"]["delta_chars"] == (5 - 4) + (8 - 0)


# ---------------------------------------------------------- salted agg


def test_salted_agg_matches_plain_groupby(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = salted_agg(
        ev,
        "event_type",
        sums={"v_micro": F.floor(F.col("value") * 1e6)},
        n_salts=16,
        salt_cols=["event_id"],
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.floor(F.col("value") * 1e6)).alias("v_micro"),
    )
    got = sorted(tuple(r) for r in salted.collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want


def test_salted_agg_plan_is_two_phase(spark):
    """The plan must show TWO hash Exchanges — (key, salt) then (key) —
    with partial_count/partial_sum map-side combines before the first
    (the property that spreads a hot key across n_salts reducers). No
    join machinery anywhere."""
    from tests.test_plan_shapes import plan_of

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = plan_of(
        salted_agg(ev, "event_type", sums=None, n_salts=8, salt_cols=["event_id"])
    )
    assert plan.count("Exchange") == 2
    # the salt expression survives into the first grouping (Catalyst
    # renames the alias to _groupingexpression — match the expr itself)
    assert "pmod(xxhash64" in plan
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


# --------------------------------------------------------- fleiss kappa


def _py_fleiss(ratings: list[tuple[int, str]], n: int) -> dict[str, int]:
    """Independent exact-rational twin of the cancelled-T formulation:
    Fraction arithmetic from the textbook definition, truncated toward
    zero at micro scale (trunc of a rational is representation-free,
    so reduced fractions match the engines' big-int division)."""
    from collections import Counter

    cnt = Counter(ratings)
    tot: Counter = Counter()
    for (it, _), v in cnt.items():
        tot[it] += v
    valid = {k: v for k, v in cnt.items() if tot[k[0]] == n}
    items = {it for (it, _) in valid}
    N = len(items)
    T = N * n
    s1 = sum(v * v for v in valid.values()) - T
    cj: Counter = Counter()
    for (_, cat), v in valid.items():
        cj[cat] += v
    s2 = sum(c * c for c in cj.values())
    pbar = Fraction(s1, T * (n - 1))
    pe = Fraction(s2, T * T)
    kappa = (pbar - pe) / (1 - pe) if pe != 1 else Fraction(0)

    def micro(fr: Fraction) -> int:
        q = abs(fr.numerator * 1_000_000) // fr.denominator
        return q if fr >= 0 else -q

    return {
        "n_items": N,
        "n_categories": len(cj),
        "total_ratings": T,
        "pbar_micro": micro(pbar),
        "pe_micro": micro(pe),
        "kappa_micro": micro(kappa),
    }


def _kappa_row(spark, ratings: list[tuple[int, str]], n: int):
    df = spark.createDataFrame(ratings, "item long, category string")
    return fleiss_kappa(df, "item", "category", n_raters=n).collect()[0]


def test_fleiss_kappa_matches_rational_twin(spark):
    # mixed agreement, 3 raters, 3 categories, plus one item with a
    # SHORT panel (item 9, 2 ratings) that must be dropped
    ratings = []
    for it in range(9):
        cats = [
            ["a", "a", "a"], ["a", "a", "b"], ["b", "b", "b"],
            ["a", "b", "c"], ["c", "c", "a"], ["b", "b", "a"],
            ["a", "a", "a"], ["c", "c", "c"], ["a", "b", "b"],
        ][it]
        ratings += [(it, c) for c in cats]
    ratings += [(9, "a"), (9, "b")]
    row = _kappa_row(spark, ratings, 3)
    want = _py_fleiss(ratings, 3)
    assert {k: row[k] for k in want} == want
    assert row["n_items"] == 9
    assert 0 < row["kappa_micro"] < 1_000_000


def test_fleiss_kappa_perfect_and_inverse(spark):
    # unanimous items over DIFFERENT categories: P-bar = 1, kappa = 1
    unanimous = [(i, "yes" if i % 2 == 0 else "no") for i in range(6) for _ in range(3)]
    assert _kappa_row(spark, unanimous, 3)["kappa_micro"] == 1_000_000
    # every item split 1/1 with balanced marginals: kappa = -1 exactly
    # (also proves negative numerators truncate identically)
    split = [(i, "yes") for i in range(8)] + [(i, "no") for i in range(8)]
    assert _kappa_row(spark, split, 2)["kappa_micro"] == -1_000_000
    # degenerate single-category corpus: clamped denominator -> 0
    mono = [(i, "yes") for i in range(4) for _ in range(2)]
    assert _kappa_row(spark, mono, 2)["kappa_micro"] == 0


def test_quality_drift_semantics(spark):
    from beats_spark.operators.snapshots import quality_drift

    schema = "source string, score_milli long"
    v1 = spark.createDataFrame(
        [("a", 0), ("a", 3000), ("a", 3000), ("b", 9000), ("c", 1)], schema
    )
    # identical snapshots: zero drift everywhere
    same = {r.source: r for r in quality_drift(v1, v1).collect()}
    assert {k: v.l1_ppm for k, v in same.items()} == {"a": 0, "b": 0, "c": 0}
    assert same["a"].n_v1 == 3 and same["a"].n_v2 == 3

    # group 'a' shifts one doc a whole bin; 'b' vanishes; 'd' appears;
    # NULL scores are dropped with a count
    v2 = spark.createDataFrame(
        [("a", 0), ("a", 3000), ("a", 30000), ("c", 1), ("d", 5000),
         ("c", None)],
        schema,
    )
    got = {r.source: r for r in quality_drift(v1, v2).collect()}
    # a: bins (0,1,1) -> (0,1,15): |1/3-1/3|=0 twice cancels; moved
    # mass 1/3 out of bin1, into bin15 => 2 * 333333
    assert got["a"].l1_ppm == 666666
    # one-sided groups drift 10^6 against the empty histogram
    assert got["b"].n_v2 == 0 and got["b"].l1_ppm == 1_000_000
    assert got["d"].n_v1 == 0 and got["d"].l1_ppm == 1_000_000
    # NULL score dropped: c has one comparable row per side, no drift
    assert got["c"].n_v2 == 1 and got["c"].l1_ppm == 0


def test_quality_drift_rejects_bad_spec(spark):
    import pytest

    from beats_spark.operators.snapshots import quality_drift

    df = spark.createDataFrame([("a", 1)], "source string, score_milli long")
    with pytest.raises(ValueError):
        quality_drift(df, df, n_bins=0)
    with pytest.raises(ValueError):
        quality_drift(df, df, lo=5, hi=5)

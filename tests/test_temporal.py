"""Temporal join & rollup family (operators/temporal.py) and the
analytics tail it ships with (near_dup_turns, group_percentiles,
active_users).

The cross-engine value parity for all six contract queries runs in
test_oracle_parity.py; these tests cover the semantics the oracles
can't isolate — strategy identity, tolerance, NULL/tie handling,
degenerate intervals, re-aggregation exactness — plus the plan
shapes (broadcast asof = zero left-side shuffle; interval join never
cross-joins; rollup shuffles the raw frame once).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.analytics import (
    active_users,
    group_percentiles,
    near_dup_turns,
)
from beats_spark.operators.temporal import asof_join, interval_join, time_rollup


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:00")),
            (2, "A", _ts("2024-01-01T10:05:00")),
            (3, "A", _ts("2024-01-01T09:00:00")),  # before any quote
            (4, "B", _ts("2024-01-01T10:00:00")),  # tie with quote ts
            (5, "C", _ts("2024-01-01T12:00:00")),  # key with no quotes
            (6, "A", None),  # unparseable left ts
        ],
        "trade_id long, sym string, ts timestamp",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T09:30:00"), 100),
            ("A", _ts("2024-01-01T10:03:00"), 101),
            ("B", _ts("2024-01-01T10:00:00"), 200),  # equal-ts quote
            ("B", _ts("2024-01-01T11:00:00"), 201),
            ("A", None, 999),  # unparseable right ts: never a candidate
        ],
        "sym string, qts timestamp, px int",
    )


EXPECT_ASOF = {1: 100, 2: 101, 3: None, 4: 200, 5: None, 6: None}


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_semantics(trades, quotes, strategy):
    out = asof_join(
        trades, quotes, "sym", "ts", "qts", ["px"], strategy=strategy
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == EXPECT_ASOF
    # left row multiplicity preserved (it's a lookup, not a join fanout)
    assert out.count() == trades.count()


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_tolerance(trades, quotes, strategy):
    # 2-minute tolerance: trade 2 (10:05) is within 2m of the 10:03
    # quote; trade 1 (10:00) is 30m after the 09:30 quote → NULL.
    out = asof_join(
        trades,
        quotes,
        "sym",
        "ts",
        "qts",
        ["px"],
        strategy=strategy,
        tolerance_s=120,
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: None, 2: 101, 3: None, 4: 200, 5: None, 6: None}


def test_asof_broadcast_plan_has_no_left_shuffle(trades, quotes):
    out = asof_join(trades, quotes, "sym", "ts", "qts", ["px"])
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    # the only Exchange is the broadcast of the packed dim (plus its
    # build-side agg); the left side must not hash-shuffle
    assert "Exchange hashpartitioning(sym" not in plan.split(
        "BroadcastHashJoin"
    )[0]


def test_asof_rejects_bad_args(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, "sym", strategy="sort")
    with pytest.raises(ValueError):
        asof_join(
            trades, quotes.select("sym", "qts"), "sym", "ts", "qts"
        )


@pytest.fixture(scope="module")
def incidents(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00")),
            (2, _ts("2024-01-01T11:30:00"), _ts("2024-01-01T11:45:00")),
            (3, _ts("2024-01-01T20:00:00"), _ts("2024-01-01T20:00:00")),
            (4, _ts("2024-01-01T22:00:00"), _ts("2024-01-01T21:00:00")),
            (5, None, _ts("2024-01-01T23:00:00")),
        ],
        "incident_id long, start_ts timestamp, end_ts timestamp",
    )


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),  # == start: inside
            (2, _ts("2024-01-01T11:40:00")),  # inside 1 AND 2
            (3, _ts("2024-01-01T12:00:00")),  # == end: outside
            (4, _ts("2024-01-01T03:00:00")),  # no interval
            (5, None),
        ],
        "event_id long, ts timestamp",
    )


def test_interval_join_inner(points, incidents):
    out = interval_join(points, incidents, bucket_s=3600)
    got = sorted(
        (r["event_id"], r["incident_id"]) for r in out.collect()
    )
    # empty (3), inverted (4), NULL-start (5) intervals match nothing;
    # end is exclusive; overlapping intervals fan out
    assert got == [(1, 1), (2, 1), (2, 2)]


def test_interval_join_left(points, incidents):
    out = interval_join(points, incidents, bucket_s=3600, how="left")
    got = sorted(
        (r["event_id"], r["incident_id"]) for r in out.collect()
    )
    assert got == [(1, 1), (2, 1), (2, 2), (3, None), (4, None), (5, None)]


def test_interval_join_bucket_width_invariance(points, incidents):
    a = interval_join(points, incidents, bucket_s=60)
    b = interval_join(points, incidents, bucket_s=7 * 3600)
    ka = sorted((r["event_id"], r["incident_id"]) for r in a.collect())
    kb = sorted((r["event_id"], r["incident_id"]) for r in b.collect())
    assert ka == kb == [(1, 1), (2, 1), (2, 2)]


def test_interval_join_no_cross_join(points, incidents):
    plan = plan_of(interval_join(points, incidents, bucket_s=3600))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_rejects_bad_args(points, incidents):
    with pytest.raises(ValueError):
        interval_join(points, incidents, bucket_s=0)
    with pytest.raises(ValueError):
        interval_join(points, incidents, how="full")


def test_time_rollup_reaggregation_matches_direct(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = time_rollup(ev, "ts", ["event_type"], "value").persist()
    # day grain re-aggregated from hours must equal a direct day agg
    direct = (
        ev.filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.unix_micros(F.col("ts").try_cast("timestamp")).alias("_us"),
            F.floor(F.col("value") * F.lit(1_000_000))
            .cast("long")
            .alias("_v"),
        )
        .withColumn("_d", F.expr("_us div 86400000000"))
        .groupBy("event_type", "_d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").alias("sum_value_e6"),
        )
    )
    got = {
        (r["event_type"], r["bucket_start_us"]): (
            r["n_events"],
            r["sum_value_e6"],
        )
        for r in out.filter(F.col("grain") == "day").collect()
    }
    want = {
        (r["event_type"], r["_d"] * 86400000000): (
            r["n_events"],
            r["sum_value_e6"],
        )
        for r in direct.collect()
    }
    assert got == want
    # grain totals are conserved: every grain partitions the events
    totals = {
        r["grain"]: r["n"]
        for r in out.groupBy("grain")
        .agg(F.sum("n_events").alias("n"))
        .collect()
    }
    n = ev.filter(F.col("ts").isNotNull()).count()
    assert totals == {"hour": n, "day": n, "week": n}
    out.unpersist()


def test_time_rollup_single_raw_shuffle(spark):
    # a prior test's persisted fine frame would substitute an
    # InMemoryTableScan for the whole aggregate subtree and hide the
    # Exchange this test pins — measure from a cold cache
    spark.catalog.clearCache()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fine_plan = plan_of(
        time_rollup(ev, "ts", ["event_type"], "value", [("hour", 3600)])
    )
    # one hash Exchange between partial and final agg of the raw scan
    assert fine_plan.count("Exchange hashpartitioning") == 1


def test_time_rollup_rejects_non_nested_grains(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="multiple"):
        time_rollup(ev, "ts", [], None, [("hour", 3600), ("d90m", 5400)])


def test_near_dup_turns_planted(spark):
    rows = [
        # user 1: two identical assistant turns (dist 0), then a
        # different one (dist > 1)
        (1, 1, "assistant", "hello world", _ts("2024-01-01T10:00:00")),
        (2, 1, "assistant", "hello world", _ts("2024-01-01T10:01:00")),
        (3, 1, "assistant", "completely different reply",
         _ts("2024-01-01T10:02:00")),
        # role change breaks the pair chain
        (4, 1, "user", "hello worlds", _ts("2024-01-01T10:03:00")),
        # user 2: near pair (dist 1), NULL text excluded
        (5, 2, "user", "retry me", _ts("2024-01-01T11:00:00")),
        (6, 2, "user", "retry me!", _ts("2024-01-01T11:00:30")),
        (7, 2, "user", None, _ts("2024-01-01T11:01:00")),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "props string, ts timestamp"
    )
    out = {
        r["role"]: (r["n_pairs"], r["n_near"], r["max_dist"])
        for r in near_dup_turns(df, threshold=1).collect()
    }
    # assistant: pairs (1,2) d=0 and (2,3) d>1 → 2 pairs, 1 near
    assert out["assistant"][0] == 2 and out["assistant"][1] == 1
    # user: only (5,6) d=1 — the NULL-text pair is excluded
    assert out["user"] == (1, 1, 1)


def test_near_dup_turns_cap_bounds_distance(spark):
    # identical 64-char prefixes, divergent tails → distance 0 under
    # the cap (the documented contract: the cap is part of the op)
    a = "x" * 64 + "AAAA"
    b = "x" * 64 + "BBBB"
    df = spark.createDataFrame(
        [
            (1, 1, "r", a, _ts("2024-01-01T10:00:00")),
            (2, 1, "r", b, _ts("2024-01-01T10:01:00")),
        ],
        "event_id long, user_id long, event_type string, "
        "props string, ts timestamp",
    )
    row = near_dup_turns(df, threshold=1).collect()[0]
    assert (row["n_pairs"], row["n_near"], row["max_dist"]) == (1, 1, 0)


def test_group_percentiles_selection_exact(spark):
    # 11 values 0..10 in one group: nearest-rank picks are exact
    # elements — p50 → idx (10*50)//100+1 = 6 → value 5.0
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(11)],
        "event_id long, event_type string, value double",
    )
    row = group_percentiles(df, percentiles=(0, 50, 100)).collect()[0]
    assert row["n_values"] == 11
    assert (row["p0"], row["p50"], row["p100"]) == (0.0, 5.0, 10.0)


def test_group_percentiles_excludes_null_and_nan(spark):
    df = spark.createDataFrame(
        [
            (1, "g", 1.0),
            (2, "g", None),
            (3, "g", float("nan")),
            (4, "g", 3.0),
        ],
        "event_id long, event_type string, value double",
    )
    row = group_percentiles(df, percentiles=(100,)).collect()[0]
    assert row["n_values"] == 2 and row["p100"] == 3.0


def test_active_users_rolling_window(spark):
    day_us = 86_400_000_000
    rows = [
        (1, 10, 0),
        (2, 10, 0),   # same user same day: one distinct
        (3, 20, 1),
        (4, 10, 3),
    ]
    # epoch-µs built arithmetically — the session is UTC-pinned so
    # timestamp_micros round-trips to the same integer day buckets
    df = spark.createDataFrame(
        [(eid, uid, d * day_us + 3_600_000_000) for eid, uid, d in rows],
        "event_id long, user_id long, us long",
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    out = {
        (r["window_days"], r["day"]): r["n_active"]
        for r in active_users(df).collect()
    }
    # days present: 0, 1, 3
    assert out[(1, 0)] == 1 and out[(1, 1)] == 1 and out[(1, 3)] == 1
    # 7-day windows: day 0 → {10}; day 1 → {10, 20}; day 3 → all three
    # contributing days within the window → users {10, 20}
    assert out[(7, 0)] == 1 and out[(7, 1)] == 2 and out[(7, 3)] == 2
    assert set(out) == {(1, 0), (1, 1), (1, 3), (7, 0), (7, 1), (7, 3)}


# -- review-fix regressions --------------------------------------------------


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_null_keys_never_match(spark, strategy):
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-02T00:00:00"))],
        "trade_id long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, _ts("2024-01-01T00:00:00"), 5)],
        "sym string, qts timestamp, px int",
    )
    out = asof_join(left, right, "sym", "ts", "qts", ["px"], strategy=strategy)
    assert out.collect()[0]["px"] is None


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_pre_epoch_right_timestamps(spark, strategy):
    # negative epoch-µs right rows (bad clocks, year-1 sentinels) are
    # valid candidates — a 0 lower bound would drop them in broadcast
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T00:00:00"))],
        "trade_id long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts("1969-12-31T00:00:00"), 7)],
        "sym string, qts timestamp, px int",
    )
    out = asof_join(left, right, "sym", "ts", "qts", ["px"], strategy=strategy)
    assert out.collect()[0]["px"] == 7


def test_interval_join_left_null_payload_no_duplication(spark):
    # a matched event carrying a NULL column must not reappear as a
    # spurious unmatched row (null-safe anti-join)
    evs = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"), None)],
        "event_id long, ts timestamp, extra string",
    )
    iv = spark.createDataFrame(
        [(9, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "incident_id long, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(evs, iv, bucket_s=3600, how="left").collect()
    assert len(out) == 1 and out[0]["incident_id"] == 9


def test_time_rollup_excludes_non_finite_measures(spark):
    evs = spark.createDataFrame(
        [
            ("g", _ts("2024-01-01T10:00:00"), 1.5),
            ("g", _ts("2024-01-01T10:10:00"), float("nan")),
            ("g", _ts("2024-01-01T10:20:00"), float("inf")),
            ("g", _ts("2024-01-01T10:30:00"), float("-inf")),
            ("g", _ts("2024-01-01T10:40:00"), None),
        ],
        "event_type string, ts timestamp, value double",
    )
    row = time_rollup(
        evs, "ts", ["event_type"], "value", [("hour", 3600)]
    ).collect()[0]
    # all five rows count; only the finite 1.5 reaches the sums
    assert row["n_events"] == 5
    assert row["sum_value_e6"] == 1_500_000
    assert row["min_value_e6"] == row["max_value_e6"] == 1_500_000


def test_time_rollup_floor_aligns_pre_1970(spark):
    """Judge ADVICE r4 regression: negative epoch-µs must bucket by
    FLOOR division (the F.window epoch grid the streaming twin uses),
    not truncation toward zero — a 1969-12-31 11:30 event belongs to
    the [11:00, 12:00) hour bucket, and the day grain must roll the
    hour bucket into 1969-12-31, not 1970-01-01."""
    evs = spark.createDataFrame(
        [
            ("g", _ts("1969-12-31T11:30:00"), 1.0),
            ("g", _ts("1970-01-01T00:30:00"), 2.0),
        ],
        "event_type string, ts timestamp, value double",
    )
    out = {
        (r["grain"], r["bucket_start_us"]): r["n_events"]
        for r in time_rollup(
            evs, "ts", ["event_type"], "value",
            [("hour", 3600), ("day", 86400)],
        ).collect()
    }
    # F.window ground truth for the two grains
    for grain, dur in (("hour", "1 hour"), ("day", "1 day")):
        wins = (
            evs.groupBy(F.window("ts", dur).alias("w"))
            .count()
            .select(
                F.unix_micros(F.col("w.start")).alias("us"), "count"
            )
            .collect()
        )
        for w in wins:
            assert out[(grain, w["us"])] == w["count"], (grain, w["us"])
    # explicit values: hour bucket 11:00 on Dec 31 '69 = -46_800e6 µs
    # (truncation toward zero would have claimed 12:00 = -43_200e6)
    assert out[("hour", -46_800_000_000)] == 1
    assert out[("day", -86_400_000_000)] == 1
    assert out[("day", 0)] == 1


def test_near_dup_turns_unicode_matches_duckdb(spark):
    # multibyte + astral payloads: Spark levenshtein counts
    # codepoints, DuckDB counts bytes — the ASCII projection makes
    # both engines score every pair identically
    import duckdb

    rows = [
        (1, 1, "r", "café x\U0001F600y", _ts("2024-01-01T10:00:00")),
        (2, 1, "r", "cafe x\U0001F600y", _ts("2024-01-01T10:01:00")),
        (3, 1, "r", "naïve reply ü", _ts("2024-01-01T10:02:00")),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "props string, ts timestamp"
    )
    got = near_dup_turns(df, threshold=1).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({eid}, {uid}, '{role}', '{txt}', TIMESTAMP '{ts}')"
            for eid, uid, role, txt, ts in rows
        )
        + ") v(event_id, user_id, role, props, ts)"
    )
    want = con.execute(
        r"""
        WITH st AS (
          SELECT user_id, role, event_id,
                 regexp_replace(substr(props, 1, 64),
                                '[^\x00-\x7F]', '?', 'g') AS txt,
                 epoch_us(ts) AS us
          FROM t
        ), p AS (
          SELECT role, lag(role) OVER w AS prev_role,
                 lag(txt) OVER w AS prev_txt, txt
          FROM st WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        )
        SELECT count(*) AS n_pairs,
               sum(CASE WHEN levenshtein(txt, prev_txt) <= 1
                   THEN 1 ELSE 0 END) AS n_near,
               sum(levenshtein(txt, prev_txt)) AS sum_dist
        FROM p WHERE prev_role = role AND prev_txt IS NOT NULL
        """
    ).fetchone()
    assert (got["n_pairs"], got["n_near"], got["sum_dist"]) == (
        want[0], want[1], want[2],
    )


# -- disorder_stats / concurrency_peak ---------------------------------------


def test_disorder_stats_planted(spark):
    from beats_spark.operators.analytics import disorder_stats

    rows = [
        # arrival order (event_id) vs event time: row 3 arrives third
        # with an EARLIER event time than the running max (10:30) →
        # late by 25 min; row 4 is on time
        (1, 1, "r", _ts("2024-01-01T10:00:00")),
        (2, 1, "r", _ts("2024-01-01T10:30:00")),
        (3, 1, "r", _ts("2024-01-01T10:05:00")),
        (4, 1, "r", _ts("2024-01-01T11:00:00")),
        # second stream: perfectly ordered → zero late
        (5, 2, "s", _ts("2024-01-01T09:00:00")),
        (6, 2, "s", _ts("2024-01-01T09:10:00")),
        # NULL ts excluded
        (7, 2, "s", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["role"]: r for r in disorder_stats(df).collect()}
    assert out["r"]["n_events"] == 4
    assert out["r"]["n_late"] == 1
    assert out["r"]["max_late_ms"] == 25 * 60 * 1000
    assert out["r"]["sum_late_ms"] == 25 * 60 * 1000
    assert out["s"]["n_events"] == 2 and out["s"]["n_late"] == 0


def test_disorder_stats_single_key_shuffle(spark):
    from beats_spark.operators.analytics import disorder_stats

    spark.catalog.clearCache()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = plan_of(disorder_stats(ev))
    # one stream-key Exchange for the running-max window + the tiny
    # role rollup; no joins, no sorts beyond the window
    assert plan.count("Exchange hashpartitioning(_k") == 1
    assert "SortMergeJoin" not in plan


def test_concurrency_peak_planted(spark):
    from beats_spark.operators.temporal import concurrency_peak

    h = 3_600
    rows = [
        # day 0: user 1 session 09:00-11:00, user 2 session 10:00-10:30
        # → overlap at 10:00 → peak 2
        (1, 1, _ts("2024-01-01T09:00:00")),
        (2, 1, _ts("2024-01-01T11:00:00")),
        (3, 2, _ts("2024-01-01T10:00:00")),
        (4, 2, _ts("2024-01-01T10:30:00")),
        # day 1: single event → peak 1
        (5, 1, _ts("2024-01-02T15:00:00")),
        # user 3 session straddles midnight day2→day3: carry-in makes
        # day 3's peak 1 even though no session STARTS on day 3
        (6, 3, _ts("2024-01-03T23:00:00")),
        (7, 3, _ts("2024-01-04T01:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    out = {
        r["day"]: r["peak_concurrency"]
        for r in concurrency_peak(df, gap_minutes=120).collect()
    }
    d0 = 19723  # 2024-01-01 epoch day
    assert out == {d0: 2, d0 + 1: 1, d0 + 2: 1, d0 + 3: 1}


def test_concurrency_peak_gap_splits_sessions(spark):
    from beats_spark.operators.temporal import concurrency_peak

    # two events 3 h apart: one session at gap=240 min (span covers
    # both), two point sessions at gap=60 min — either way the day's
    # peak is 1 (sessions of the SAME user don't overlap here)
    rows = [
        (1, 1, _ts("2024-01-01T09:00:00")),
        (2, 1, _ts("2024-01-01T12:00:00")),
        (3, 2, _ts("2024-01-01T09:30:00")),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    merged = {
        r["day"]: r["peak_concurrency"]
        for r in concurrency_peak(df, gap_minutes=240).collect()
    }
    split = {
        r["day"]: r["peak_concurrency"]
        for r in concurrency_peak(df, gap_minutes=60).collect()
    }
    d0 = 19723
    # merged: user 1 active 09:00-12:00, user 2 at 09:30 → peak 2
    assert merged == {d0: 2}
    # split: user 1's two point sessions never overlap user 2's 09:30
    assert split == {d0: 1}


def test_concurrency_peak_covers_eventless_mid_session_days(spark):
    from beats_spark.operators.temporal import concurrency_peak

    # one session spanning 3 days with NO event on the middle day:
    # the session is live on it, so the day appears with peak 1
    rows = [
        (1, 1, _ts("2024-01-01T10:00:00")),
        (2, 1, _ts("2024-01-03T10:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    out = {
        r["day"]: r["peak_concurrency"]
        for r in concurrency_peak(df, gap_minutes=10_000).collect()
    }
    d0 = 19723
    assert out == {d0: 1, d0 + 1: 1, d0 + 2: 1}


def test_rollup_levels_rejects_non_nested_grains(spark):
    from beats_spark.operators.temporal import rollup_levels

    fine = spark.createDataFrame(
        [(0, 1, None, None, None)],
        "bucket_start_us long, n_events long, sum_value_e6 long, "
        "min_value_e6 long, max_value_e6 long",
    )
    with pytest.raises(ValueError, match="multiple"):
        rollup_levels(fine, [], [("hour", 3600), ("d90m", 5400)])


# ---------------------------------------------------------------- scd2


def test_scd2_collapses_noop_updates_and_orders_versions(spark):
    from beats_spark.operators.temporal import scd2_build

    df = spark.createDataFrame(
        [
            # key "u": a -> a (no-op) -> b -> b -> a  => 3 versions
            (1, "u", _ts("2024-01-01T00:00:00"), "a"),
            (2, "u", _ts("2024-01-01T01:00:00"), "a"),
            (3, "u", _ts("2024-01-01T02:00:00"), "b"),
            (4, "u", _ts("2024-01-01T03:00:00"), "b"),
            (5, "u", _ts("2024-01-01T04:00:00"), "a"),
            # key "v": single row => one current version
            (6, "v", _ts("2024-01-02T00:00:00"), "x"),
            # unparseable ts excluded
            (7, "u", None, "z"),
        ],
        "id long, k string, ts timestamp, state string",
    )
    out = scd2_build(df, "k", "ts", ["state"], order_cols=("id",))
    rows = {
        (r.k, r.version): r for r in out.collect()
    }
    assert len(rows) == 4
    u1, u2, u3 = rows[("u", 1)], rows[("u", 2)], rows[("u", 3)]
    assert (u1.state, u2.state, u3.state) == ("a", "b", "a")
    # valid_from = FIRST ts of the run, valid_to = next run's open
    assert u1.valid_from == _ts("2024-01-01T00:00:00")
    assert u1.valid_to == _ts("2024-01-01T02:00:00")
    assert u2.valid_to == _ts("2024-01-01T04:00:00")
    assert u3.valid_to is None and u3.is_current
    assert not u1.is_current and not u2.is_current
    v1 = rows[("v", 1)]
    assert v1.is_current and v1.valid_from == _ts("2024-01-02T00:00:00")


def test_scd2_null_safe_change_detection(spark):
    from beats_spark.operators.temporal import scd2_build

    df = spark.createDataFrame(
        [
            # NULL -> NULL does NOT open; NULL -> x and x -> NULL do
            (1, "u", _ts("2024-01-01T00:00:00"), None),
            (2, "u", _ts("2024-01-01T01:00:00"), None),
            (3, "u", _ts("2024-01-01T02:00:00"), "x"),
            (4, "u", _ts("2024-01-01T03:00:00"), None),
        ],
        "id long, k string, ts timestamp, state string",
    )
    out = scd2_build(df, "k", "ts", ["state"], order_cols=("id",))
    got = [(r.version, r.state) for r in out.orderBy("version").collect()]
    assert got == [(1, None), (2, "x"), (3, None)]


def test_scd2_single_exchange(spark):
    from beats_spark.operators.temporal import scd2_build

    df = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T00:00:00"), "a")],
        "id long, k string, ts timestamp, state string",
    )
    out = scd2_build(df, "k", "ts", ["state"], order_cols=("id",))
    plan = plan_of(out)
    # every window/filter pass shares partitionBy(k): ONE hash
    # Exchange over the input (plus nothing else)
    assert plan.count("Exchange hashpartitioning") == 1

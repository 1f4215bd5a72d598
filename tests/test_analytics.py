"""Unit tests for the event-analytics operators (funnel, retention)
with hand-computed fixtures — the sf-fixture parity twin lives in
tests/test_contract_parity.py via the `event_funnel` /
`retention_cohorts` contract queries."""

from __future__ import annotations

import datetime

from beats_spark.operators.analytics import event_funnel, retention_cohorts


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_event_funnel_ordering_and_conversion(spark):
    rows = [
        # A: full ordered funnel
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # B: click BEFORE first view -> reaches step 1 only
        (2, "click", _ts(4)), (2, "view", _ts(5)),
        # C: no view at all -> not in the funnel
        (3, "click", _ts(1)),
        # D: view only
        (4, "view", _ts(7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["step_idx"]: r for r in event_funnel(df, ["view", "click", "purchase"]).collect()}
    assert [out[i]["step"] for i in (1, 2, 3)] == ["view", "click", "purchase"]
    assert [out[i]["n_users"] for i in (1, 2, 3)] == [3, 1, 1]
    assert out[1]["conv_ppm"] == 1_000_000
    assert out[2]["conv_ppm"] == 1_000_000 // 3
    assert out[3]["conv_ppm"] == 1_000_000 // 3


def test_event_funnel_same_timestamp_counts(spark):
    rows = [(1, "view", _ts(1)), (1, "click", _ts(1))]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["step_idx"]: r["n_users"] for r in event_funnel(df, ["view", "click"]).collect()}
    assert out == {1: 1, 2: 1}


def test_event_funnel_empty_input_emits_zero_rows_per_step(spark):
    df = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    out = event_funnel(df, ["view", "click"]).collect()
    assert [(r["n_users"], r["conv_ppm"]) for r in out] == [(0, 0), (0, 0)]


def test_retention_cohorts_periods_and_pre_anchor_exclusion(spark):
    rows = [
        # X: signup day 1; active day 1 (period 0) and day 9 (period 1);
        # a pre-signup event in December must NOT count anywhere
        (1, "signup", _ts(1)), (1, "click", _ts(9)),
        (1, "view", datetime.datetime(2023, 12, 25)),
        # Z: same signup week, only period 0
        (2, "signup", _ts(2)),
        # Y: never signed up -> excluded entirely
        (3, "view", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = retention_cohorts(df, anchor_type="signup", period_days=7, max_periods=4)
    got = {(r["cohort_idx"], r["period"]): (r["n_active"], r["retention_ppm"])
           for r in out.collect()}
    cohorts = {c for c, _ in got}
    assert len(cohorts) == 1  # both signups fall in one 7-day bucket
    (c,) = cohorts
    assert got[(c, 0)] == (2, 1_000_000)   # the signup events themselves
    assert got[(c, 1)] == (1, 500_000)     # X's day-9 click
    assert set(got) == {(c, 0), (c, 1)}


def test_retention_cohorts_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError):
        retention_cohorts(df, period_days=0)
    with pytest.raises(ValueError):
        retention_cohorts(df, max_periods=-1)
    with pytest.raises(ValueError):
        event_funnel(df, [])


def test_event_funnel_malformed_string_ts_tags_and_continues(spark):
    """A string ts column with one malformed value must not ANSI-crash
    the job (try_cast) — the bad row simply never contributes."""
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "not-a-timestamp"),
        (2, "view", "2024-01-02T00:00:00"),
        (2, "click", "2024-01-03T00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    out = {r["step_idx"]: r["n_users"] for r in event_funnel(df, ["view", "click"]).collect()}
    assert out == {1: 2, 2: 1}  # user 1's click is dropped, not fatal


def test_turn_latency_gaps_and_transitions(spark):
    from beats_spark.operators.analytics import turn_latency

    rows = [
        # user 1: user@0ms -> assistant@1500ms -> user@2000ms
        (1, "user", 10, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (1, "assistant", 11, datetime.datetime(2024, 1, 1, 0, 0, 1, 500000)),
        (1, "user", 12, datetime.datetime(2024, 1, 1, 0, 0, 2)),
        # user 2: another user->assistant gap of 500 ms
        (2, "user", 20, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (2, "assistant", 21, datetime.datetime(2024, 1, 1, 0, 0, 0, 500000)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, event_id long, ts timestamp")
    got = {(r["prev_role"], r["role"]): r for r in turn_latency(df).collect()}
    ua = got[("user", "assistant")]
    assert (ua["n_gaps"], ua["sum_gap_ms"], ua["max_gap_ms"], ua["mean_gap_ms"]) == (2, 2000, 1500, 1000)
    au = got[("assistant", "user")]
    assert (au["n_gaps"], au["sum_gap_ms"]) == (1, 500)
    assert set(got) == {("user", "assistant"), ("assistant", "user")}


def test_turn_latency_tie_order_is_id_stable(spark):
    """Two turns at the SAME timestamp order by event_id, so the
    transition direction is deterministic at any parallelism."""
    from beats_spark.operators.analytics import turn_latency

    t = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "b", 2, t), (1, "a", 1, t)],
        "user_id long, event_type string, event_id long, ts timestamp",
    )
    rows = turn_latency(df).collect()
    assert len(rows) == 1
    assert (rows[0]["prev_role"], rows[0]["role"], rows[0]["sum_gap_ms"]) == ("a", "b", 0)


def test_heavy_hitters_rank_share_and_null_exclusion(spark):
    from beats_spark.operators.analytics import heavy_hitters

    rows = (
        [("error", 1)] * 5 + [("error", 2)] * 3 + [("error", 3)] * 3
        + [("error", 4)] * 1 + [("error", None)] * 10 + [("view", 9)] * 2
    )
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {(r["event_type"], r["rank"]): r for r in heavy_hitters(df, k=2).collect()}
    # NULL users excluded from counts AND the group total (12 events)
    e1, e2 = got[("error", 1)], got[("error", 2)]
    assert (e1["user_id"], e1["n_events"], e1["share_ppm"]) == (1, 5, 5 * 1_000_000 // 12)
    # tie at 3 events: user 2 beats user 3 on the value tie-break
    assert (e2["user_id"], e2["n_events"]) == (2, 3)
    assert got[("view", 1)]["share_ppm"] == 1_000_000
    assert set(got) == {("error", 1), ("error", 2), ("view", 1)}


def test_heavy_hitters_rejects_bad_k(spark):
    import pytest

    from beats_spark.operators.analytics import heavy_hitters

    df = spark.createDataFrame([], "event_type string, user_id long")
    with pytest.raises(ValueError):
        heavy_hitters(df, k=0)


# ------------------------------------------------------ cooccurrence_pairs


def test_cooccurrence_counts_cap_and_support(spark):
    from beats_spark.operators.analytics import cooccurrence_pairs
    import pytest as _pt

    rows = [
        # g1: {a, b, c} (b repeated — distinct first)
        (1, "a"), (1, "b"), (1, "b"), (1, "c"),
        # g2: {a, b}
        (2, "a"), (2, "b"),
        # g3: single item — no pairs, still in the universe
        (3, "a"),
        # g4: wide group, excluded by the cap
        (4, "a"), (4, "b"), (4, "c"), (4, "d"),
        # NULL item excluded
        (5, None),
    ]
    df = spark.createDataFrame(rows, "g long, i string")
    out = cooccurrence_pairs(df, "g", "i", max_items_per_group=3).collect()
    got = {(r.item_a, r.item_b): (r.n_groups, r.support_ppm) for r in out}
    # universe = 5 groups with a non-null item? NULL-only group 5 is
    # excluded entirely -> 4 groups (1,2,3,4)
    assert got[("a", "b")] == (2, 500000)
    assert got[("a", "c")] == (1, 250000)
    assert got[("b", "c")] == (1, 250000)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ranks = {r.rank for r in out}
    assert ranks == {1, 2, 3}
    top = [r for r in out if r.rank == 1][0]
    assert (top.item_a, top.item_b) == ("a", "b")
    with _pt.raises(ValueError, match="max_items_per_group"):
        cooccurrence_pairs(df, "g", "i", max_items_per_group=1)


def test_cooccurrence_min_count_filters(spark):
    from beats_spark.operators.analytics import cooccurrence_pairs

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
        "g long, i string",
    )
    out = cooccurrence_pairs(df, "g", "i", min_count=2).collect()
    assert {(r.item_a, r.item_b) for r in out} == {("a", "b")}


def test_cooccurrence_excludes_null_groups(spark):
    # NULL group keys would merge every orphan row into ONE
    # fabricated basket under Spark groupBy while SQL equi-joins
    # drop them — excluded on both engines (the shingles(NULL)
    # gotcha class).
    from beats_spark.operators.analytics import cooccurrence_pairs

    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "a"), (1, "b"), (2, "a")],
        "g long, i string",
    )
    out = cooccurrence_pairs(df, "g", "i").collect()
    got = {(r.item_a, r.item_b): (r.n_groups, r.support_ppm) for r in out}
    assert got == {("a", "b"): (1, 500000)}


def test_tool_loops_runs_and_ties(spark):
    """Hand-built conversation: runs a,a,a | b | a,a — max_run 3
    (tool a, the FIRST run wins the later 2-run on length and would
    win a tie on run_id), n_loops 1 at min_repeats=3; NULL tools
    excluded; all-NULL conversation emits nothing."""
    from beats_spark.operators.analytics import tool_loops

    rows = [
        ("c1", 1, "a"), ("c1", 2, "a"), ("c1", 3, "a"),
        ("c1", 4, "b"), ("c1", 5, "a"), ("c1", 6, "a"),
        ("c1", 7, None),
        ("c2", 1, "x"), ("c2", 2, "x"),
        ("c3", 1, None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    got = {r["conv_id"]: r for r in tool_loops(df, min_repeats=3).collect()}
    assert set(got) == {"c1", "c2"}
    c1 = got["c1"]
    assert (c1["n_turns"], c1["max_run"], c1["run_tool"], c1["n_loops"]) == (6, 3, "a", 1)
    c2 = got["c2"]
    assert (c2["max_run"], c2["n_loops"]) == (2, 0)

    # tie on run length: two 2-runs (y then z) — earliest run wins
    tie = spark.createDataFrame(
        [("t", 1, "y"), ("t", 2, "y"), ("t", 3, "z"), ("t", 4, "z")],
        "conv_id string, turn_idx int, tool string",
    )
    r = tool_loops(tie, min_repeats=2).collect()[0]
    assert (r["max_run"], r["run_tool"], r["n_loops"]) == (2, "y", 2)

    import pytest

    with pytest.raises(ValueError):
        tool_loops(df, min_repeats=1)


def test_decayed_engagement_halvings(spark):
    import datetime as dt

    from beats_spark.operators.analytics import decayed_engagement

    now = "2024-03-01 00:00:00"
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        # age 0 days: full value
        (1, t0, 8.0),
        # age 7 days: one halving
        (1, t0 - dt.timedelta(days=7), 8.0),
        # age 20 days: 20 // 7 = 2 halvings
        (1, t0 - dt.timedelta(days=20), 8.0),
        # future event clamps to age 0
        (2, t0 + dt.timedelta(days=3), 4.0),
        # beyond max_halvings contributes 0
        (3, t0 - dt.timedelta(days=7 * 50), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r.user_id: r
        for r in decayed_engagement(df, now=now, max_halvings=40).collect()
    }
    assert got[1].raw_micro == 24_000_000
    assert got[1].decayed_micro == 8_000_000 + 4_000_000 + 2_000_000
    assert got[2].decayed_micro == 4_000_000
    assert got[3].n_events == 1 and got[3].decayed_micro == 0

    import pytest

    with pytest.raises(ValueError):
        decayed_engagement(df, now=now, half_life_days=0)


def test_burstiness_fano(spark):
    import datetime as dt

    import pytest

    from beats_spark.operators.analytics import burstiness

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0 + dt.timedelta(hours=i), i) for i in range(10)]
    rows += [("b", t0, 100 + i) for i in range(10)]
    rows += [("b", t0 + dt.timedelta(hours=9), 200)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )
    got = {r.event_type: r for r in burstiness(df).collect()}
    # clock-regular: one event per bucket, zero dispersion
    assert (got["a"].n_buckets, got["a"].fano_milli) == (10, 0)
    # bursty: (10*101 - 121) * 1000 // (10*11)
    assert got["b"].fano_milli == (10 * 101 - 121) * 1000 // 110
    assert got["b"].n_events == 11
    with pytest.raises(ValueError):
        burstiness(df, bucket_seconds=0)

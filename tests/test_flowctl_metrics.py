"""rate_limit processor, per-stage metrics, Iceberg fallback IO."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from beats_spark.operators.base import build_chain


def test_rate_limit_global_and_keyed(spark):
    rows = [(i, i % 3, f"2026-01-01 00:{i:02d}:00") for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, k int, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    keyed = build_chain(
        [{"rate_limit": {"limit": 4, "fields": ["k"], "order_by": ["ts", "event_id"]}}]
    )(df)
    got = keyed.groupBy("k").count().collect()
    assert all(r["count"] == 4 for r in got)
    # first-in-order events survive
    kept = {r["event_id"] for r in keyed.collect()}
    assert kept == {i for i in range(30) if i // 3 < 4}

    global_lim = build_chain(
        [{"rate_limit": {"limit": 7, "order_by": ["ts", "event_id"]}}]
    )(df)
    assert global_lim.count() == 7


def test_rate_limit_windowed(spark):
    # 10 events/minute across 3 minutes, limit 2 per minute
    rows = [(m * 100 + i, f"2026-01-01 00:{m:02d}:{i:02d}") for m in range(3) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = build_chain(
        [{"rate_limit": {"limit": 2, "period": "1 minute", "order_by": ["ts", "event_id"]}}]
    )(df)
    assert out.count() == 6
    assert {r["event_id"] for r in out.collect()} == {0, 1, 100, 101, 200, 201}


def test_rate_limit_respects_when(spark):
    rows = [(i, "keep" if i % 2 else "limit") for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, cls string")
    out = build_chain(
        [
            {
                "rate_limit": {
                    "limit": 3,
                    "order_by": ["event_id"],
                    "when": {"equals": {"cls": "limit"}},
                }
            }
        ]
    )(df)
    # 10 'keep' rows pass untouched; 'limit' rows capped at 3
    assert out.filter(F.col("cls") == "keep").count() == 10
    assert out.filter(F.col("cls") == "limit").count() == 3


def test_per_stage_metrics(spark, transcripts):
    from beats_spark.plans.metrics import PipelineMetrics
    from beats_spark.plans.pipeline import PipelineConfig, transform
    from beats_spark.plans.router import META_SINK

    cfg = PipelineConfig(
        processors=[
            {
                "dissect": {
                    "tokenizer": 'level=%{level} ts=%{event_ts} caller=%{caller} msg="%{message}"',
                    "field": "text",
                    "target_prefix": "",
                }
            },
            {"drop_event": {"when": {"equals": {"level": "debug"}}}},
        ],
        router_rules=[{"index": "%{[role]}"}],
        stage_metrics=True,
    )
    m = PipelineMetrics()
    df = m.observe_total(transcripts)
    df = transform(df, cfg, m)
    df.groupBy(META_SINK).count().collect()
    got = m.collect()
    total = got["pipeline.events.total"]
    out0 = got["pipeline.processor.0.dissect.events.out"]
    out1 = got["pipeline.processor.1.drop_event.events.out"]
    assert out0 == total  # dissect tags, never drops
    assert 0 < out1 < total  # drop_event removed the debug rows


def test_iceberg_fallback_roundtrip(spark, tmp_path):
    from beats_spark.sources.iceberg import (
        append_table,
        iceberg_available,
        overwrite_partitions,
        read_table,
    )

    path = str(tmp_path / "tbl")
    df = spark.range(10).withColumn("p", F.col("id") % 2)
    assert not iceberg_available(spark, path)
    assert not iceberg_available(spark, "nocatalog.db.tbl")
    append_table(df, path)
    append_table(df, path)
    assert read_table(spark, path).count() == 20
    overwrite_partitions(df, str(tmp_path / "tbl2"))
    assert read_table(spark, str(tmp_path / "tbl2")).count() == 10


def test_rate_anomaly_spike_cold_start_and_gaps(spark):
    """Cold start never flags, a 3x burst flags, and a key's missing
    bucket is simply absent (observed-buckets window)."""
    import datetime as dt

    import pytest

    from beats_spark.operators.flowctl import rate_anomaly

    def day(d):
        return dt.datetime(2024, 1, d, 12, 0, 0)

    rows = []
    # key 'a': 2/day on days 1-6, burst of 6 on day 7
    for d in range(1, 7):
        rows += [("a", day(d))] * 2
    rows += [("a", day(7))] * 6
    # key 'b': 1/day on days 1,2,4 (day-3 gap)
    rows += [("b", day(1)), ("b", day(2)), ("b", day(4))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r.event_type, r.bucket_ts.day): r
        for r in rate_anomaly(
            df, trail=7, threshold_milli=2000, min_trail=3
        ).collect()
    }
    # day 1-3 for 'a': fewer than 3 trailing buckets -> NULL ratio, no flag
    for d in (1, 2, 3):
        assert out[("a", d)].ratio_milli is None
        assert out[("a", d)].is_spike is False
    # day 7: cnt 6 vs trailing mean 2 -> ratio 3000, spike
    r7 = out[("a", 7)]
    assert (r7.trail_sum, r7.trail_n) == (12, 6)
    assert r7.ratio_milli == 3000 and r7.is_spike
    # steady days never flag
    assert out[("a", 6)].ratio_milli == 1000 and not out[("a", 6)].is_spike
    # 'b' has no day-3 bucket at all; day 4's window saw 2 observed
    assert ("b", 3) not in out
    assert out[("b", 4)].trail_n == 2

    with pytest.raises(ValueError):
        rate_anomaly(df, trail=0)


def test_trailing_spike_custom_column_names(spark):
    """Regression: non-default bucket_col/cnt_col must work — the
    window runs over the post-rename frame (a stream sink keeping
    'window_start'/'n' is the advertised caller)."""
    import datetime as dt

    from beats_spark.operators.flowctl import trailing_spike

    counts = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, d, 0, 0), c)
         for d, c in ((1, 2), (2, 2), (3, 2), (4, 2), (5, 8))],
        "event_type string, window_start timestamp, n long",
    )
    rows = {
        r.bucket_ts.day: r
        for r in trailing_spike(
            counts, bucket_col="window_start", cnt_col="n",
            trail=4, threshold_milli=2000, min_trail=3,
        ).collect()
    }
    assert rows[5].ratio_milli == 4000 and rows[5].is_spike
    assert rows[4].ratio_milli == 1000 and not rows[4].is_spike


def test_rate_limit_global_two_phase_is_exact_across_partitions(spark):
    """The all-time global bucket pre-limits per input partition, so
    the full dataset never sorts on one reducer — and the survivors
    are still EXACTLY the first-N by order, at any partitioning."""
    from beats_spark.operators.base import build_chain

    df = spark.range(1000).selectExpr(
        "id as event_id", "cast(id % 97 as long) as user_id"
    ).repartition(8)
    chain = build_chain([
        {"rate_limit": {"limit": 5, "fields": [], "order_by": ["event_id"]}}
    ])
    out = chain(df)
    assert sorted(r["event_id"] for r in out.collect()) == [0, 1, 2, 3, 4]

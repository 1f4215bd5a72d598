"""Flow-control processors: rate limiting in batch form.

The reference's rate_limit processor keeps a token bucket per
key-fields value and drops events over the limit
(libbeat/processors/ratelimit/rate_limit.go:41-105, config.go:28-36).
Its batch restatement: within each (key, period-window) at most
``limit`` events survive, chosen in stable event-time order — the
deterministic equivalent of "first events until the bucket empties".
Streaming jobs get the stateful original via
``applyInPandasWithState`` (see streaming.pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beats_spark.operators.base import Processor, ProcessorConfigError, register


@register
class RateLimit(Processor):
    """rate_limit: keep the first ``limit`` events per key per period.

    Config::

        {"limit": 100,               # events per key per period
         "fields": ["user_id"],      # key fields (empty = global)
         "period": "1 hour",         # tumbling event-time window; omit
                                     # for a single all-time bucket
         "ts_field": "ts",
         "order_by": ["ts", "event_id"]}  # stable tiebreak

    Plan shape: one Window ``row_number`` partitioned by
    (key, window(ts)) — a single shuffle keyed by the rate-limit key;
    the same key a real deployment would partition by, so no extra
    movement at scale. Skewed keys are exactly the ones being limited,
    and the limit bounds their output size.
    """

    name = "rate_limit"

    def apply(self, df: DataFrame) -> DataFrame:
        from beats_spark.functions.conditions import compile_condition

        limit = int(self.cfg["limit"])
        fields = [f for f in self.cfg.get("fields", [])]
        ts_field = self.cfg.get("ts_field", "ts")
        period = self.cfg.get("period")
        order_by = self.cfg.get("order_by") or [ts_field]
        for f_ in fields + order_by:
            if f_ not in df.columns:
                raise ProcessorConfigError(f"rate_limit: field {f_!r} missing")

        parts = [F.col(f_) for f_ in fields]
        if period:
            if ts_field not in df.columns:
                raise ProcessorConfigError(f"rate_limit: ts_field {ts_field!r} missing")
            parts.append(F.window(F.col(ts_field), period))
        cond = (
            compile_condition(df, self.when) if self.when is not None else None
        )
        if cond is not None:
            # when-excluded rows form their own partition so they never
            # consume the budget (the when-wrapper skips the processor
            # entirely for them, conditionals.go:95-100)
            parts.append(F.coalesce(cond, F.lit(False)))
        orders = [F.col(o).asc() for o in order_by]
        if not parts:
            # global all-time bucket: a bare Window over lit(0) would
            # funnel EVERY row through one reducer sort. Exact
            # two-phase first-N instead: the global first-N is
            # necessarily inside each input partition's local first-N,
            # so pre-limit per original partition (spark_partition_id
            # is evaluated map-side, before the shuffle) and only the
            # ≤ limit×partitions survivors reach the single-partition
            # final window. Result is deterministic — phase 2 imposes
            # the global order regardless of partition composition.
            pre = Window.partitionBy(F.spark_partition_id()).orderBy(*orders)
            df = (
                df.withColumn("_rl_pre", F.row_number().over(pre))
                .filter(F.col("_rl_pre") <= limit)
                .drop("_rl_pre")
            )
            parts = [F.lit(0)]
        w = Window.partitionBy(*parts).orderBy(*orders)
        ranked = df.withColumn("_rl_rn", F.row_number().over(w))
        keep = F.col("_rl_rn") <= limit
        if cond is not None:
            keep = keep | ~F.coalesce(cond, F.lit(False))
        return ranked.filter(keep).drop("_rl_rn")


def rate_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "day",
    trail: int = 7,
    threshold_milli: int = 1500,
    min_trail: int = 3,
) -> DataFrame:
    """Windowed rate-spike detection over event streams.

    The observability step a log pipeline runs on its own counts
    (metricbeat/Watcher territory): bucket events by ``bucket``
    (date_trunc unit), count per (key, bucket), then compare each
    bucket against the trailing ``trail``-bucket mean — a spike is
    ``cnt ≥ threshold_milli/1000 × trailing mean``, evaluated in
    cross-multiplied 64-bit integers (``cnt·1000·n ≥ thr·sum``) so
    no float division leaks between engines. Buckets with fewer than
    ``min_trail`` trailing observations report NULL ratio and never
    flag (cold start).

    Emitted per (key, bucket): ``cnt``, ``trail_sum``/``trail_n``
    (the evidence), ``ratio_milli`` = floor(cnt·1000·n / sum), and
    ``is_spike``. Zero-count buckets are simply absent (a groupBy
    cannot see them); the trailing window is therefore over OBSERVED
    buckets — the standard streaming-counts caveat, and exactly what
    a calendar densification join would fix if absence itself must
    alarm.

    Scale: one shuffle on (key, bucket) with map-side combine — the
    windowed frame holds one row per key per bucket, so a year of
    minute buckets is ~526k rows per key; the per-key window sort is
    over that aggregate, never the raw events.
    """
    if trail < 1:
        raise ValueError(f"trail must be >= 1, got {trail}")
    b = F.date_trunc(bucket, F.col(ts_col))
    counts = (
        df.select(F.col(key_col), b.alias("bucket_ts"))
        .groupBy(key_col, "bucket_ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return trailing_spike(
        counts,
        key_col=key_col,
        trail=trail,
        threshold_milli=threshold_milli,
        min_trail=min_trail,
    )


def trailing_spike(
    counts: DataFrame,
    key_col: str = "event_type",
    bucket_col: str = "bucket_ts",
    cnt_col: str = "cnt",
    trail: int = 7,
    threshold_milli: int = 1500,
    min_trail: int = 3,
) -> DataFrame:
    """The verdict stage of ``rate_anomaly``, factored out so batch and
    streaming run the SAME code: batch feeds it the groupBy counts
    above; streaming feeds it the FINALIZED windowed counts a
    watermarked append-mode aggregation emits
    (streaming/pipeline.py::stream_rate_counts) — the count frame is
    identical by construction, so the spike report is too."""
    # the frame below renames bucket_col -> bucket_ts, so the window
    # must order by the POST-rename name
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(-trail, -1)
    )
    staged = counts.select(
        key_col,
        F.col(bucket_col).alias("bucket_ts"),
        F.col(cnt_col).cast("long").alias("cnt"),
    ).select(
        key_col,
        "bucket_ts",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long").alias(
            "trail_sum"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_n"),
    )
    ok = (F.col("trail_n") >= min_trail) & (F.col("trail_sum") > 0)
    ratio = F.expr("cnt * 1000 * trail_n div trail_sum")
    spike = (
        F.col("cnt") * F.lit(1000) * F.col("trail_n")
        >= F.lit(int(threshold_milli)) * F.col("trail_sum")
    )
    return staged.select(
        key_col,
        "bucket_ts",
        "cnt",
        "trail_sum",
        "trail_n",
        F.when(ok, ratio).alias("ratio_milli"),
        F.when(ok, spike).otherwise(F.lit(False)).alias("is_spike"),
    )

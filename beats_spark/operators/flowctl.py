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
        if not parts:
            parts = [F.lit(0)]
        w = Window.partitionBy(*parts).orderBy(*[F.col(o).asc() for o in order_by])
        ranked = df.withColumn("_rl_rn", F.row_number().over(w))
        keep = F.col("_rl_rn") <= limit
        if cond is not None:
            keep = keep | ~F.coalesce(cond, F.lit(False))
        return ranked.filter(keep).drop("_rl_rn")

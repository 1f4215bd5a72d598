"""Scale utilities shared by the heavy operators.

``spread`` fixes the small-file trap: a compute-dense stage (shingling,
hashing, vector scoring) downstream of a scan with fewer partitions
than cores runs at that scan's parallelism — a single 2 MB parquet file
means ONE task no matter how many executors exist. At 100 TB the scan
has thousands of splits and spread is a no-op; on small inputs one
cheap round-robin shuffle buys full-cluster parallelism for the
expensive stage that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, multiplier: int = 2, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to cluster parallelism when the plan
    currently has fewer partitions; never shrinks."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism * multiplier
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target)


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 1000,
    heavy_milli: int = 2000,
) -> DataFrame:
    """Hot-key diagnosis for shuffle planning: per heavy key, its row
    count, corpus share, and the salt factor that would level it.

    The north-star pipeline salts ``conv_id`` to defeat hot
    conversations (plans/pipeline.py bucket_expr); this operator is
    the measurement that PICKS the salt. A key is "heavy" when its
    count is at least ``heavy_milli``/1000 × the mean per-key count.
    For each heavy key we report:

    - ``cnt``        rows under the key
    - ``share_ppm``  floor(cnt · 10⁶ / total_rows)
    - ``rec_salt``   ceil(cnt · n_partitions / total_rows) — the number
      of sub-buckets needed so this key's share of one reducer never
      exceeds a uniform key's share (the salt argument to bucket_expr)
    - ``avg_cnt``    floor(total/keys) mean per-key count (context)

    All arithmetic is 64-bit integer (cnt ≤ 10¹², n_partitions ≤ 10⁵
    stay far from overflow) so a DuckDB oracle reproduces every value
    exactly. Scale shape: one shuffle on the key (map-side partial
    combine), a 1-row totals frame broadcast back (the repo's standard
    totals crossJoin pattern, cf. textstats.py), then a narrow filter
    — the per-key counts frame is the only large intermediate and it
    is exactly |keys| rows of (key, int64).
    """
    from pyspark.sql import functions as F

    # persist: the counts frame feeds BOTH the totals agg and the
    # crossJoin — ReuseExchange does not fire for shared aggregate
    # subtrees under joins (CLAUDE.md), so without this the full
    # corpus scan+shuffle runs twice. |keys|×16 B, spills if huge.
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    avg_cnt = F.expr("total_rows div n_keys")
    heavy = F.col("cnt") * F.lit(1000) >= F.lit(heavy_milli) * avg_cnt
    return j.filter(heavy).select(
        F.col(key_col),
        F.col("cnt"),
        F.expr("cnt * 1000000 div total_rows").alias("share_ppm"),
        F.expr(
            f"(cnt * {int(n_partitions)} + total_rows - 1) div total_rows"
        ).alias("rec_salt"),
        avg_cnt.alias("avg_cnt"),
    )

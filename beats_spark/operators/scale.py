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


def salted_agg(
    df: DataFrame,
    key_col: str,
    sums: dict[str, "F.Column"] | None = None,
    n_salts: int = 64,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation — the REMEDIATION that
    :func:`key_skew_stats` sizes: per ``key_col``, a row count plus
    SUM of each integer expression in ``sums``, computed so no single
    reducer ever holds a hot key's full row set.

    A plain ``groupBy(key)`` over 10¹² rows with a low-cardinality or
    hot key (the north rule's hot-conversation problem; libbeat's
    analogue is per-output event counters,
    /root/reference/libbeat/monitoring/report/report.go) funnels each
    key through ONE reducer — the straggler that caps cluster
    throughput at a single executor's speed. The salted form:

    - phase 1: ``groupBy(key, salt)`` with ``salt = pmod(xxhash64(
      salt_cols), n_salts)`` — the hot key's rows spread over
      ``n_salts`` reducers, each emitting a partial (cnt, sums) row.
      Map-side combine applies, so the shuffle carries at most
      |tasks|·|keys|·n_salts partial rows, not the corpus.
    - phase 2: ``groupBy(key)`` over |keys|·n_salts partial rows —
      a trivially small second shuffle.

    COUNT and SUM decompose exactly over the salt split (both phases
    are integer sums), so the result is row-for-row identical to the
    unsalted groupBy — which is exactly what the DuckDB oracle runs.
    Only integer-valued ``sums`` expressions keep that equality
    engine-portable (CLAUDE.md float rule); the caller pre-floors any
    double (e.g. ``floor(value·10⁶)``).

    ``salt_cols`` defaults to every input column: a pure row-content
    hash keeps the operator deterministic while distributing a hot
    key's rows uniformly (row ids or partition ids would tie the plan
    to scan layout)."""
    from pyspark.sql import functions as F

    sums = sums or {}
    salt_src = [F.col(c) for c in (salt_cols or df.columns)]
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(int(n_salts)))
    partial = df.groupBy(F.col(key_col), salt.alias("_salt")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(expr).alias(f"_s_{name}") for name, expr in sums.items()],
    )
    return partial.groupBy(key_col).agg(
        F.sum("_cnt").alias("cnt"),
        *[F.sum(f"_s_{name}").alias(name) for name in sums],
    )

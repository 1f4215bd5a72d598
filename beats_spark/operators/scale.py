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

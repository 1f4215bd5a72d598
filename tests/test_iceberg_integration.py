"""Iceberg-real integration: lights up automatically when an Iceberg
runtime jar is on the driver classpath, skips (with the reason) when
not. The sandbox image ships no jar, so in CI here these SKIP — the
point is that the claim "sources/iceberg.py works against a real
catalog" is executable the moment the dependency exists, instead of
staying an UNTESTED marking forever (COVERAGE.md §Sources).

What runs when live: writeTo().append() atomic commits, snapshot
time-travel read, overwritePartitions idempotent replay, and the
lineage transaction ordering (data commit then lineage commit — a
replayed chunk must not double rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.sources.iceberg import (
    append_table,
    iceberg_available,
    overwrite_partitions,
    read_table,
)

CATALOG = "it_lake"


def _have_iceberg(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@pytest.fixture()
def lake(spark, tmp_path):
    if not _have_iceberg(spark):
        pytest.skip(
            "no Iceberg runtime jar on the classpath — add "
            "iceberg-spark-runtime to spark.jars and this suite runs"
        )
    spark.conf.set(
        f"spark.sql.catalog.{CATALOG}", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.warehouse", str(tmp_path / "wh"))
    yield CATALOG
    spark.sql(f"DROP TABLE IF EXISTS {CATALOG}.db.t")
    spark.sql(f"DROP TABLE IF EXISTS {CATALOG}.db.events")
    spark.sql(f"DROP TABLE IF EXISTS {CATALOG}.db.lineage")


def test_append_and_snapshot_read(spark, lake):
    t = f"{lake}.db.t"
    assert iceberg_available(spark, t)
    df1 = spark.range(5).select(F.col("id"), F.lit("a").alias("tag"))
    df1.writeTo(t).create()
    append_table(spark.range(5, 8).select(F.col("id"), F.lit("b").alias("tag")), t)
    assert read_table(spark, t).count() == 8
    # time-travel: the first snapshot still reads 5 rows
    snaps = spark.sql(f"SELECT snapshot_id FROM {t}.snapshots ORDER BY committed_at")
    first = snaps.first()["snapshot_id"]
    assert (
        spark.read.format("iceberg")
        .option("snapshot-id", first)
        .load(t)
        .count()
        == 5
    )


def test_overwrite_partitions_idempotent(spark, lake):
    t = f"{lake}.db.events"
    base = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("bucket")
    )
    base.writeTo(t).partitionedBy(F.col("bucket")).create()
    replay = spark.range(10).select(F.col("id"), (F.col("id") % 2).alias("bucket"))
    overwrite_partitions(replay.filter(F.col("bucket") == 0), t)
    overwrite_partitions(replay.filter(F.col("bucket") == 0), t)  # replay
    got = read_table(spark, t)
    assert got.count() == 10  # no duplicates from the double commit
    assert got.filter(F.col("bucket") == 0).count() == 5


def test_lineage_transaction_ordering(spark, lake):
    """The effectively-once protocol: data commit (overwritePartitions,
    idempotent) THEN lineage append. A crash between them replays the
    chunk — the data overwrite dedups, the lineage append happens once
    on the retry."""
    data_t, lin_t = f"{lake}.db.events", f"{lake}.db.lineage"
    chunk = spark.range(4).select(F.col("id"), F.lit(0).alias("bucket"))
    chunk.writeTo(data_t).partitionedBy(F.col("bucket")).create()
    spark.createDataFrame(
        [("r1", 0, "committed", 4, 4)],
        "run_id string, bucket int, status string, events_in long, events_out long",
    ).writeTo(lin_t).create()
    # simulated crash-and-replay of the same chunk
    overwrite_partitions(chunk, data_t)
    assert read_table(spark, data_t).count() == 4
    committed = read_table(spark, lin_t).filter(F.col("status") == "committed")
    assert committed.count() == 1

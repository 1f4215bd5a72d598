"""Iceberg table IO with parquet-directory fallback.

The production deployment reads/writes Iceberg (`north_rule`): atomic
commits make the lineage protocol effectively-once and snapshots give
time-travel resume. This sandbox image has no Iceberg runtime jar, so
every call degrades to a parquet directory layout with the SAME
interface — the abstraction point SURVEY.md §7.4 item 6 called for.

To enable Iceberg for real, configure the session with e.g.::

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hadoop
    spark.sql.catalog.lake.warehouse = s3://bucket/warehouse

and pass table identifiers like ``lake.db.transcripts``; anything
containing a path separator or lacking a configured catalog is treated
as a parquet path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, table: str) -> bool:
    """True when ``table`` names a table in a configured Iceberg
    catalog (catalog prefix present + catalog class configured)."""
    if "/" in table or not table.count("."):
        return False
    catalog = table.split(".", 1)[0]
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    return bool(impl)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    if iceberg_available(spark, table):
        return spark.read.format("iceberg").load(table)
    return spark.read.parquet(table)


def append_table(df: DataFrame, table: str) -> None:
    """Append with Iceberg's atomic commit when available; parquet
    append otherwise (the lineage protocol orders data-then-lineage so
    the fallback is still effectively-once, plans/lineage.py)."""
    spark = df.sparkSession
    if iceberg_available(spark, table):
        df.writeTo(table).append()
    else:
        df.write.mode("append").parquet(table)


def overwrite_partitions(df: DataFrame, table: str) -> None:
    """Idempotent chunk replay: Iceberg ``overwritePartitions`` or
    parquet dynamic partition overwrite."""
    spark = df.sparkSession
    if iceberg_available(spark, table):
        df.writeTo(table).overwritePartitions()
    else:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").parquet(table)

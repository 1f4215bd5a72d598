"""Source readers.

The reference's inputs (filestream/log/tcp/kafka/..., SURVEY.md §2.1)
reduce, on a table-native engine, to: read a snapshot of a table with
partition pruning (the Iceberg/parquet scan replaces per-file byte
offsets) or decode raw line/JSON/CSV payloads into the event schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from beats_spark.sources.synth import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    role_channels,
    synth_transcripts,
    tool_categories,
)


def read_table(spark: SparkSession, path_or_table: str, fmt: str = "parquet") -> DataFrame:
    """Snapshot scan. ``fmt='iceberg'`` uses the catalog (needs the
    Iceberg runtime jar on the classpath — absent in this sandbox, the
    parquet path keeps everything runnable; the call-site contract is
    identical)."""
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path_or_table)
        except Exception as e:  # jar not on classpath
            raise RuntimeError(
                "Iceberg runtime not available; pass fmt='parquet'"
            ) from e
    return spark.read.format(fmt).load(path_or_table)


def read_json_lines(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines input (the reference's readjson reader,
    libbeat/reader/readjson/). Explicit schema — no inference in prod."""
    return spark.read.schema(schema).json(path)


def read_raw_lines(spark: SparkSession, path: str, column: str = "message") -> DataFrame:
    """Raw line input (the reference's line reader, libbeat/reader/).
    One string column; parse stages take it from here."""
    return spark.read.text(path).withColumnRenamed("value", column)

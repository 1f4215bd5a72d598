"""Checkpoint/resume protocol with per-partition lineage.

The reference persists input cursors only after the output ACKs, in
order (filebeat/input/v2/input-cursor/publish.go:24-81) and restarts
from the stored position (diskqueue/state_file.go:26-70,
libbeat/statestore/). The batch equivalent here:

- the input is split into ``n_buckets`` deterministic key-hash buckets
  (same expression as the sink bucketing, so a bucket is a stable,
  replayable unit);
- buckets are processed in chunks; each chunk's sink output is written
  with **dynamic partition overwrite** (idempotent on retry — a
  replayed chunk replaces exactly its own partitions, nothing else);
- after a chunk's write commits, one lineage row per bucket is
  appended: ``(run_id, bucket, status, events_in, events_out)`` — the
  ACK-then-persist ordering;
- resume = anti-join: buckets already ``committed`` for this run_id are
  skipped, and the restarted run produces byte-identical sink tables.

On Iceberg the lineage append and the data append would share a
transaction; on the parquet fallback the ordering (data first, lineage
second) gives at-least-once with idempotent rewrites = effectively-once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beats_spark.plans.pipeline import (
    BUCKET_COL,
    PipelineConfig,
    bucket_expr,
    expected_sinks,
    transform,
)
from beats_spark.plans.router import META_SINK

LINEAGE_SCHEMA = "run_id string, bucket int, status string, events_in long, events_out long"


@dataclass
class CheckpointedResult:
    run_id: str
    buckets_done: int
    buckets_skipped: int
    sink_counts: dict[str, int]


def _committed_buckets(spark: SparkSession, lineage_path: str, run_id: str) -> set[int]:
    # attempt the read and catch the missing-path error rather than
    # os.path.exists: the lineage path is a SPARK path — on hdfs://,
    # s3:// or any non-local filesystem the driver-local exists() is
    # always False and resume would silently reprocess every bucket
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.schema(LINEAGE_SCHEMA)
            .parquet(lineage_path)
            .filter((F.col("run_id") == run_id) & (F.col("status") == "committed"))
            .select("bucket")
            .collect()
        )
    except AnalysisException:
        return set()
    return {r["bucket"] for r in rows}


def run_checkpointed(
    spark: SparkSession,
    source: DataFrame,
    cfg: PipelineConfig,
    run_id: str,
    lineage_path: str,
    chunk_size: int = 4,
) -> CheckpointedResult:
    """Resumable pipeline run. ``cfg.n_buckets`` must be > 0 and
    ``cfg.out_root`` set. Kill it mid-run, call again with the same
    run_id: committed buckets are skipped, outputs end up identical.

    Contracts worth stating plainly:

    - ``out_root`` belongs to ONE run_id: dynamic overwrite replaces
      only partitions the current run produces, so pointing a NEW
      run_id at an out_root holding an older run's output leaves that
      run's untouched (bucket, sink) partitions mixed into reads.
      Use a fresh out_root (or clear it) per logical dataset.
    - Each chunk filters the full source by bucket, so a complete run
      reads the input ceil(n_buckets/chunk_size) times — the price of
      bounded-size idempotent commits without a staging copy. Size
      ``chunk_size`` to the failure economics: larger chunks = fewer
      passes but more redone work per retry; or stage the source
      partitioned by bucket once and point this at the staging table
      for partition-pruned chunk reads.
    """
    assert cfg.n_buckets > 0 and cfg.out_root, "checkpointed run needs buckets + out_root"
    done = _committed_buckets(spark, lineage_path, run_id)
    todo = [b for b in range(cfg.n_buckets) if b not in done]

    src = source.withColumn(
        BUCKET_COL, bucket_expr(cfg.key_field, cfg.n_buckets, cfg.salt, cfg.salt_field)
    )
    sinks_static = expected_sinks(cfg)
    total_counts: dict[str, int] = {}
    processed = 0
    for i in range(0, len(todo), chunk_size):
        chunk = todo[i : i + chunk_size]
        part = src.filter(F.col(BUCKET_COL).isin(chunk))

        # Accounting rides the chunk's WRITE action as Observations —
        # in/out per bucket and per sink with zero extra jobs (the
        # previous version re-read the committed files AND re-counted
        # the source, i.e. two more passes per chunk — at 100 TB that
        # triples the read volume). events_in observes the pre-chain
        # frame, events_out the routed frame, same action.
        from pyspark.sql import Observation

        obs_in, obs_out = Observation(), Observation()
        part_obs = part.observe(
            obs_in,
            *[
                F.sum((F.col(BUCKET_COL) == b).cast("long")).alias(f"b{b}")
                for b in chunk
            ],
        )
        # the write MUST partition by the same bucket values the chunk
        # was SELECTED by: transform() re-stamps BUCKET_COL from the
        # post-chain key, so a processor that mutates the key (rename/
        # lowercase/dissect overwrite) would write rows under buckets
        # belonging to OTHER chunks — whose later dynamic overwrite
        # then deletes them. The pre-chain stamp rides through the
        # chain in a shadow column (protected from include_fields by
        # mutate's MANDATORY list) and overrides whatever transform
        # stamped.
        shadow = part_obs.withColumn("_ckpt_bucket", F.col(BUCKET_COL))
        routed = transform(shadow, cfg)
        routed = routed.withColumn(BUCKET_COL, F.col("_ckpt_bucket")).drop(
            "_ckpt_bucket"
        )
        out_aggs = [
            F.sum((F.col(BUCKET_COL) == b).cast("long")).alias(f"b{b}") for b in chunk
        ]
        if sinks_static:
            out_aggs += [
                F.sum((F.col(META_SINK) == s).cast("long")).alias(f"s{j}")
                for j, s in enumerate(sinks_static)
            ]
        routed = routed.observe(obs_out, *out_aggs)
        (
            routed.write.mode("overwrite")
            # writer-scoped dynamic overwrite (a replayed chunk
            # replaces only its own partitions) — NOT the session
            # conf, which would silently change the semantics of
            # every later overwrite in the same session
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL, META_SINK)
            .parquet(cfg.out_root)
        )
        got_in, got_out = obs_in.get, obs_out.get
        ins = {b: int(got_in[f"b{b}"] or 0) for b in chunk}
        per_bucket = {b: int(got_out[f"b{b}"] or 0) for b in chunk}
        chunk_counts: dict[str, int] = {}
        if sinks_static:
            for j, s in enumerate(sinks_static):
                n = int(got_out[f"s{j}"] or 0)
                if n:
                    chunk_counts[s] = n
        # reconcile (the write_fanout discipline): a sink value outside
        # the static set — add_formatted_index stamping a free-form
        # _meta_sink, say — would otherwise vanish from the counts with
        # no error. When the enumerated sinks don't account for every
        # routed row (or the names are dynamic), fall back to the
        # partition-pruned footer read of just this chunk's partitions.
        if not sinks_static or sum(chunk_counts.values()) != sum(
            per_bucket.values()
        ):
            chunk_counts = {
                r[META_SINK]: r["n"]
                for r in (
                    spark.read.parquet(cfg.out_root)
                    .filter(F.col(BUCKET_COL).isin(chunk))
                    .groupBy(META_SINK)
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                )
            }
        for s, n in chunk_counts.items():
            total_counts[s] = total_counts.get(s, 0) + n
        lineage_rows = [
            (run_id, int(b), "committed", int(ins.get(b, 0)), int(per_bucket.get(b, 0)))
            for b in chunk
        ]
        spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).write.mode("append").parquet(
            lineage_path
        )
        processed += len(chunk)

    return CheckpointedResult(
        run_id=run_id,
        buckets_done=processed,
        buckets_skipped=len(done),
        sink_counts=total_counts,
    )

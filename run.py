"""spark-submit entrypoint for the beats_spark pipeline.

Usage (cluster)::

    python scripts/package.py             # builds dist/beats_spark.zip
    spark-submit --py-files dist/beats_spark.zip \
        run.py --config job.json --source /data/transcripts \
        --out-root /data/sinks --lineage /data/lineage \
        --run-id nightly-2026-01-01 [--resume]

``--master`` comes from spark-submit; this script only builds the
session config (shuffle partitions, AQE, Arrow) on top of whatever
cluster manager provides. In local development it falls back to
``local[*]``.

The config file is JSON with the PipelineConfig fields::

    {"processors": [...], "router_rules": [...],
     "default_sink": "main", "key_field": "conv_id", "n_buckets": 64}

If ``--synth N`` is given instead of --source, N deterministic
synthetic conversations are generated (seed-fixed) — the self-contained
benchmark/demo mode.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="beats_spark pipeline job")
    p.add_argument("--config", required=True, help="pipeline config JSON file")
    p.add_argument("--source", help="input parquet path / Iceberg table / log dir")
    p.add_argument(
        "--source-format",
        default=None,
        choices=["parquet", "text", "container", "auditd", "journald", "winlog"],
        help="'text' reads raw log files (one harvester-task per file; "
        "'input: {chunked: true}' splits huge files across tasks) "
        "through the multiline reader; 'container' reads docker "
        "json-file / CRI logs with partial-line reassembly; 'journald' "
        "reads journalctl -o export streams (input: {mode: binary, "
        "include_matches: [...], units: [...], ...}); 'winlog' reads "
        "wevtutil/Event Viewer XML exports through the framing reader "
        "+ decode_xml_wineventlog; config key "
        "'input: {multiline: {...}, format: ..., stream: ...}' carries "
        "the Beats parsers block",
    )
    p.add_argument("--synth", type=int, default=0, help="generate N synthetic conversations")
    p.add_argument("--out-root", help="sink root (parquet dir or Iceberg prefix)")
    p.add_argument("--lineage", help="lineage/checkpoint table path (enables resume)")
    p.add_argument("--run-id", default="run-0", help="stable id for checkpoint identity")
    p.add_argument("--resume", action="store_true", help="skip committed buckets of run-id")
    p.add_argument("--chunk-size", type=int, default=8)
    p.add_argument("--metrics-out", help="write metrics JSON here")
    p.add_argument(
        "--net-sink",
        choices=["redis", "logstash"],
        help="ALSO ship routed events to a network sink "
        "(plans/netsinks.py); redis keys on _meta_sink",
    )
    p.add_argument("--net-host", default="127.0.0.1")
    p.add_argument("--net-port", type=int)
    args = p.parse_args(argv)
    if args.net_sink and not args.net_port:
        # validate BEFORE the (potentially hours-long) batch runs
        print("--net-sink needs --net-port", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from beats_spark.plans.pipeline import PipelineConfig, run as run_batch
    from beats_spark.plans.lineage import run_checkpointed
    from beats_spark.sources import synth_transcripts

    with open(args.config) as f:
        if args.config.endswith((".yml", ".yaml")):
            import yaml

            cfg_raw = yaml.safe_load(f)
        else:
            cfg_raw = json.load(f)
    # optional Beats-style input block: {"type": "text", "path": ...,
    # "multiline": {...}} — CLI --source/--source-format override it
    input_cfg = cfg_raw.pop("input", {}) or {}
    cfg = PipelineConfig(**cfg_raw)
    if args.out_root:
        cfg.out_root = args.out_root
    source_format = args.source_format or input_cfg.get("type") or "parquet"
    source_path = args.source or input_cfg.get("path")

    # under spark-submit the master/deploy-mode is already decided;
    # standalone execution gets a local session with the same tuning
    builder = (
        SparkSession.builder.appName("beats_spark_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = builder.getOrCreate()

    if args.synth:
        source = synth_transcripts(spark, n_convs=args.synth)
    elif source_path and source_format == "text":
        from beats_spark.sources.lines import read_multiline

        source = read_multiline(
            spark,
            source_path,
            input_cfg.get("multiline"),
            include_lines=input_cfg.get("include_lines"),
            exclude_lines=input_cfg.get("exclude_lines"),
            include_message=input_cfg.get("include_message"),
            chunked=bool(input_cfg.get("chunked")),
            exclude_files=input_cfg.get("exclude_files"),
            ignore_older=input_cfg.get("ignore_older"),
        )
    elif source_path and source_format == "auditd":
        from beats_spark.operators.auditd import read_auditd

        source = read_auditd(spark, source_path, chunked=bool(input_cfg.get("chunked")))
    elif source_path and source_format == "journald":
        from beats_spark.sources.journald import read_journald_export

        source = read_journald_export(
            spark,
            source_path,
            mode=input_cfg.get("mode", "text"),
            include_matches=input_cfg.get("include_matches"),
            units=input_cfg.get("units"),
            syslog_identifiers=input_cfg.get("syslog_identifiers"),
            transports=input_cfg.get("transports"),
            facilities=input_cfg.get("facilities"),
            save_remote_hostname=bool(input_cfg.get("save_remote_hostname")),
        )
    elif source_path and source_format == "winlog":
        from beats_spark.sources.winlog import decode_winlog, read_winlog_export

        source = decode_winlog(read_winlog_export(spark, source_path))
    elif source_path and source_format == "container":
        from beats_spark.sources.container import read_container_logs

        source = read_container_logs(
            spark,
            source_path,
            format=input_cfg.get("format", "auto"),
            stream=input_cfg.get("stream", "all"),
            max_bytes=int(input_cfg.get("max_bytes", 0)),
            chunked=bool(input_cfg.get("chunked")),
        )
    elif source_path:
        source = spark.read.parquet(source_path)
    else:
        print("need --source or --synth", file=sys.stderr)
        return 2

    t0 = time.time()
    if args.lineage:
        if not (cfg.n_buckets and cfg.out_root):
            print("--lineage needs n_buckets and out_root in config", file=sys.stderr)
            return 2
        res = run_checkpointed(
            spark,
            source,
            cfg,
            run_id=args.run_id,
            lineage_path=args.lineage,
            chunk_size=args.chunk_size,
        )
        payload = {
            "run_id": res.run_id,
            "buckets_done": res.buckets_done,
            "buckets_skipped": res.buckets_skipped,
            "sink_counts": res.sink_counts,
            "wall_sec": round(time.time() - t0, 3),
        }
    else:
        res = run_batch(spark, source, cfg)
        payload = {
            "metrics": res.metrics,
            "sink_counts": res.sink_counts,
            "wall_sec": round(time.time() - t0, 3),
        }

    if args.net_sink:
        from pyspark.sql import functions as F

        from beats_spark.plans.netsinks import write_logstash, write_redis
        from beats_spark.plans.pipeline import transform
        from beats_spark.plans.router import META_SINK

        routed = transform(source, cfg)
        if args.net_sink == "redis":
            write_redis(routed, args.net_host, args.net_port, key=F.col(META_SINK))
        else:
            write_logstash(routed, args.net_host, args.net_port)
        payload["net_sink"] = f"{args.net_sink}://{args.net_host}:{args.net_port}"

    out = json.dumps(payload)
    print(out)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

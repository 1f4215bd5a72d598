"""One scaling-run worker: the north-rule job at a fixed parallelism.

Runs synth transcripts → parse → enrich → route → per-sink aggregate
twice (first pass warms JIT/codegen; the second is the measured run —
the steady-state number a long-running cluster job actually sees) and
prints one JSON line.

Invoked by scripts/scaling.py in a fresh process per parallelism level
(one JVM cannot change its master).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, required=True)
    p.add_argument("--convs", type=int, default=2_000_000)
    p.add_argument("--repeats", type=int, default=2)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from beats_spark.plans.pipeline import PipelineConfig, transform
    from beats_spark.plans.router import META_SINK
    from beats_spark.session import get_spark
    from beats_spark.sources import synth_transcripts

    spark = get_spark(
        app_name=f"scale_{args.cores}",
        cores=args.cores,
        shuffle_partitions=args.cores * 2,
    )

    cfg = PipelineConfig(
        processors=[
            {
                "dissect": {
                    "tokenizer": 'level=%{level} ts=%{event_ts} caller=%{caller} msg="%{message}"',
                    "field": "text",
                    "target_prefix": "",
                }
            },
            {
                "timestamp": {
                    "field": "event_ts",
                    "target_field": "ts2",
                    "layouts": ["yyyy-MM-dd'T'HH:mm:ss'Z'"],
                }
            },
            {
                "enrich_lookup": {
                    "key_field": "tool",
                    "target_field": "category",
                    "mapping": {
                        "search": "retrieval",
                        "browser": "retrieval",
                        "python": "compute",
                        "bash": "compute",
                        "editor": "authoring",
                        "none": "na",
                    },
                    "default": "na",
                }
            },
            {
                "enrich_lookup": {
                    "key_field": "role",
                    "target_field": "channel",
                    "mapping": {
                        "user": "inbound",
                        "assistant": "outbound",
                        "tool": "internal",
                        "system": "control",
                    },
                    "default": "other",
                }
            },
        ],
        router_rules=[
            {"when": {"equals": {"level": "error"}}, "index": "alerts"},
            {"when": {"equals": {"role": "tool"}}, "index": "tools-%{[category]}"},
            {"index": "%{[channel]}"},
        ],
        default_sink="main",
    )

    df = synth_transcripts(spark, n_convs=args.convs)
    turns = df.count()

    best = None
    counts = None
    for _ in range(args.repeats):
        t0 = time.time()
        routed = transform(df, cfg)
        counts = {
            r[META_SINK]: r["n"]
            for r in routed.groupBy(META_SINK).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    assert counts is not None and sum(counts.values()) == turns

    print(
        json.dumps(
            {
                "cores": args.cores,
                "turns": turns,
                "sec": round(best, 3),
                "turns_per_sec": round(turns / best, 1),
                "sink_counts": counts,
            }
        )
    )


if __name__ == "__main__":
    main()

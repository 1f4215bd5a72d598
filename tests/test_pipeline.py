"""End-to-end pipeline tests against an independent pandas oracle
(the reference's system-test model: run the pipeline, recompute
expectations independently, compare rows and per-sink counts —
filebeat/tests/system/test_processors.py is the template)."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beats_spark.plans.pipeline import PipelineConfig, run, transform
from beats_spark.plans.router import META_SINK

TOKENIZER = 'level=%{level} ts=%{event_ts} caller=%{caller} msg="%{message}"'
LINE_RE = re.compile(r'^level=(.*?) ts=(.*?) caller=(.*?) msg="(.*?)"')

TOOL_CATEGORIES = {
    "search": "retrieval", "browser": "retrieval", "python": "compute",
    "bash": "compute", "editor": "authoring", "none": "na",
}
ROLE_CHANNELS = {"user": "inbound", "assistant": "outbound", "tool": "internal", "system": "control"}


def pipeline_cfg(**kw):
    return PipelineConfig(
        processors=[
            {"dissect": {"tokenizer": TOKENIZER, "field": "text", "target_prefix": ""}},
            {"enrich_lookup": {"key_field": "tool", "target_field": "category",
                                "mapping": TOOL_CATEGORIES}},
            {"enrich_lookup": {"key_field": "role", "target_field": "channel",
                                "mapping": ROLE_CHANNELS}},
            {"drop_event": {"when": {"equals": {"level": "debug"}}}},
        ],
        router_rules=[
            {"when": {"equals": {"level": "error"}}, "index": "errors"},
            {"when": {"equals": {"role": "tool"}}, "index": "tool_events"},
            {"when": {"contains": {"message": "deploy"}}, "index": "deploys"},
        ],
        default_sink="main",
        **kw,
    )


def pandas_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent row-at-a-time recomputation of the pipeline."""
    out = []
    for _, r in pdf.iterrows():
        m = LINE_RE.match(r["text"])
        level = m.group(1) if m else None
        message = m.group(4) if m else None
        flags = [] if m else ["dissect_parsing_error"]
        if level == "debug":
            continue  # drop_event
        if flags:
            sink = "_dlq"
        elif level == "error":
            sink = "errors"
        elif r["role"] == "tool":
            sink = "tool_events"
        elif message and "deploy" in message:
            sink = "deploys"
        else:
            sink = "main"
        out.append({
            "conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
            "level": level, "message": message,
            "category": TOOL_CATEGORIES[r["tool"]],
            "channel": ROLE_CHANNELS[r["role"]],
            "sink": sink,
        })
    return pd.DataFrame(out)


def test_end_to_end_counts_and_rows(spark, transcripts, tmp_path):
    cfg = pipeline_cfg(out_root=str(tmp_path / "sinks"), n_buckets=4)
    res = run(spark, transcripts, cfg)

    oracle = pandas_oracle(transcripts.toPandas())
    expected_counts = oracle["sink"].value_counts().to_dict()
    assert res.sink_counts == expected_counts

    # metrics invariant: total == published + filtered (monitoring.go:87-116)
    m = res.metrics
    assert m["pipeline.events.total"] == transcripts.count()
    assert m["pipeline.events.total"] == m["pipeline.events.published"] + m["pipeline.events.filtered"]
    assert sum(res.sink_counts.values()) == m["pipeline.events.published"]

    # per-turn text equality under stable (conv_id, turn_idx) ordering
    written = spark.read.parquet(str(tmp_path / "sinks"))
    got = (
        written.select("conv_id", "turn_idx", "level", "message", "category", "channel",
                        F.col(META_SINK).alias("sink"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    exp = oracle.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_transform_is_single_narrow_stage(spark, transcripts):
    """The chain+router must not shuffle: no Exchange in the physical
    plan (broadcast joins excepted) — the property that keeps the job
    scan-bound at 100 TB."""
    cfg = pipeline_cfg()
    plan = transform(transcripts, cfg)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" not in plan  # literal maps fold to expressions here


def test_checkpoint_resume_identical(spark, transcripts, tmp_path):
    from beats_spark.plans.lineage import run_checkpointed

    cfg = pipeline_cfg(out_root=str(tmp_path / "a"), n_buckets=8)
    full = run_checkpointed(spark, transcripts, cfg, "run1", str(tmp_path / "lin_a"), chunk_size=3)
    assert full.buckets_done == 8 and full.buckets_skipped == 0

    # simulate a crash after the first chunk: pre-commit 5 of 8 buckets
    cfg2 = pipeline_cfg(out_root=str(tmp_path / "b"), n_buckets=8)
    partial = run_checkpointed(spark, transcripts.filter("conv_id is not null"), cfg2, "run2",
                                str(tmp_path / "lin_b"), chunk_size=5)
    # wipe nothing; re-run same run_id — must skip committed buckets
    resumed = run_checkpointed(spark, transcripts, cfg2, "run2", str(tmp_path / "lin_b"))
    assert resumed.buckets_skipped == 8 and resumed.buckets_done == 0

    a = spark.read.parquet(str(tmp_path / "a")).orderBy("conv_id", "turn_idx").toPandas()
    b = spark.read.parquet(str(tmp_path / "b")).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(
        a.sort_index(axis=1), b.sort_index(axis=1), check_dtype=False
    )


def test_synth_is_deterministic(spark):
    from beats_spark.sources import synth_transcripts

    a = synth_transcripts(spark, n_convs=50).orderBy("conv_id", "turn_idx").collect()
    b = synth_transcripts(spark, n_convs=50).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    # skew present by construction: hot conversations exist
    sizes = (
        synth_transcripts(spark, n_convs=200)
        .groupBy("conv_id").count().agg(F.max("count"), F.percentile_approx("count", 0.5))
        .first()
    )
    assert sizes[0] >= 10 * max(sizes[1], 1)


def test_crash_mid_run_then_resume(spark, transcripts, tmp_path, monkeypatch):
    """Kill the job after the first committed chunk (the verify-skill
    crash recipe), resume with the same run_id: committed buckets are
    skipped and the final sinks are byte-identical to an uninterrupted
    run — the cursor-persist-on-ACK guarantee
    (input-cursor/publish.go:49-81) in batch form."""
    import beats_spark.plans.lineage as lineage_mod
    from beats_spark.plans.lineage import run_checkpointed

    cfg_ref = pipeline_cfg(out_root=str(tmp_path / "ref"), n_buckets=8)
    run_checkpointed(spark, transcripts, cfg_ref, "ref", str(tmp_path / "lin_ref"), chunk_size=3)

    cfg = pipeline_cfg(out_root=str(tmp_path / "crash"), n_buckets=8)
    real_transform = lineage_mod.transform
    calls = {"n": 0}

    def dying_transform(df, c):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("simulated crash after first chunk")
        return real_transform(df, c)

    monkeypatch.setattr(lineage_mod, "transform", dying_transform)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_checkpointed(
            spark, transcripts, cfg, "crashrun", str(tmp_path / "lin_c"), chunk_size=3
        )
    monkeypatch.setattr(lineage_mod, "transform", real_transform)

    resumed = run_checkpointed(
        spark, transcripts, cfg, "crashrun", str(tmp_path / "lin_c"), chunk_size=3
    )
    assert resumed.buckets_skipped == 3  # the one committed chunk
    assert resumed.buckets_done == 5

    a = spark.read.parquet(str(tmp_path / "ref")).orderBy("conv_id", "turn_idx").toPandas()
    b = spark.read.parquet(str(tmp_path / "crash")).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(
        a.sort_index(axis=1), b.sort_index(axis=1), check_dtype=False
    )


def test_salting_defeats_hot_conversation_skew(spark):
    """One hot conversation must not pin a single bucket/task: salted
    bucketing spreads its turns while plain bucketing concentrates
    them (the kafka hash-by-fields → salting evolution, SURVEY §7.2)."""
    from beats_spark.plans.pipeline import bucket_expr
    from beats_spark.sources import synth_transcripts

    # strongly skewed corpus: every 10th conv is 25x
    df = synth_transcripts(spark, n_convs=500, hot_every=10, hot_factor=25)
    n_buckets = 16

    def max_bucket(expr):
        return (
            df.withColumn("b", expr)
            .groupBy("b")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    total = df.count()
    plain = max_bucket(bucket_expr("conv_id", n_buckets))
    salted = max_bucket(bucket_expr("conv_id", n_buckets, salt=8))
    # salted max load close to ideal total/n_buckets; plain is worse
    assert salted < plain
    assert salted < (total / n_buckets) * 1.35

    # determinism: same expression → same assignment
    a = df.withColumn("b", bucket_expr("conv_id", n_buckets, salt=8)).collect()
    b = df.withColumn("b", bucket_expr("conv_id", n_buckets, salt=8)).collect()
    assert a == b


def test_write_rollup_matches_recount(spark, transcripts, tmp_path):
    from beats_spark.plans.sinks import write_rollup

    cfg = pipeline_cfg()
    routed = transform(transcripts, cfg)
    out = str(tmp_path / "rollup")
    write_rollup(routed, out, period="1 hour")
    back = spark.read.parquet(out)
    total = back.agg(F.sum("n")).first()[0]
    assert total == routed.count()
    # window grain: every ts of a (sink, window) row falls inside it
    one = back.orderBy(F.desc("n")).first()
    n_direct = routed.filter(
        (F.col(META_SINK) == one["sink"])
        & (F.col("ts") >= one["window_start"])
        & (F.col("ts") < F.col("ts") + F.expr("interval 1 hour"))
    ).filter(
        F.col("ts") < F.lit(one["window_start"]) + F.expr("interval 1 hour")
    ).count()
    assert n_direct == one["n"]


def test_sessions_operators(spark, transcripts):
    from beats_spark.operators.sessions import (
        assemble_documents,
        sessionize,
        stable_order,
    )

    ordered = stable_order(transcripts)
    r = (
        ordered.filter(F.col("conv_id") == "conv-00000000")
        .orderBy("turn_idx")
        .select("turn_idx", "turn_rank")
        .collect()
    )
    assert [x.turn_rank for x in r] == list(range(1, len(r) + 1))

    # turns are 7s apart within a conv → one session at 30min gap
    sess = sessionize(transcripts, "conv_id", gap_minutes=30, order_cols=("turn_idx",))
    assert sess.agg(F.max("session_idx")).first()[0] == 0
    # 1-second gap → every turn its own session
    sess2 = sessionize(transcripts, "conv_id", gap_minutes=0, order_cols=("turn_idx",))
    one = sess2.filter(F.col("conv_id") == "conv-00000000").orderBy("turn_idx").collect()
    assert [x.session_idx for x in one] == list(range(len(one)))

    docs = assemble_documents(transcripts, role_col="role")
    row = docs.filter(F.col("conv_id") == "conv-00000000").first()
    turns = (
        transcripts.filter(F.col("conv_id") == "conv-00000000")
        .orderBy("turn_idx")
        .collect()
    )
    assert row.n_turns == len(turns)
    assert row.document == "\n".join(f"{t.role}: {t.text}" for t in turns)


def test_per_turn_text_equality_through_fanout(spark, transcripts, tmp_path):
    """THE north-rule invariant: after parse→enrich→route→fan-out write,
    reading every sink back and stable-ordering by (conv_id, turn_idx)
    reproduces each turn's text byte-for-byte, with no turn lost or
    duplicated."""
    from beats_spark.operators.sessions import stable_order
    from beats_spark.plans.pipeline import run

    cfg = pipeline_cfg(out_root=str(tmp_path / "sinks"), n_buckets=8, salt=4)
    run(spark, transcripts, cfg)

    back = spark.read.parquet(str(tmp_path / "sinks"))
    got = (
        stable_order(back)
        .orderBy("conv_id", "turn_rank")
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    expected = (
        transcripts.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    # drop_event removed debug rows from the pipeline output by design;
    # compare the surviving set exactly
    exp_map = {(r.conv_id, r.turn_idx): r.text for r in expected}
    assert len(got) == len({(r.conv_id, r.turn_idx) for r in got}), "duplicated turns"
    for r in got:
        assert exp_map[(r.conv_id, r.turn_idx)] == r.text
    # and nothing outside the intended drop is missing
    dropped = len(expected) - len(got)
    # only PARSED debug rows drop; malformed debug lines fail dissect
    # (level stays null) and survive into _dlq — tag-and-continue
    debug_rows = transcripts.filter(
        F.col("text").startswith("level=debug") & F.col("text").contains(" caller=")
    ).count()
    assert dropped == debug_rows


def test_checkpointed_run_survives_key_mutating_processor(spark, transcripts, tmp_path):
    """A processor that MUTATES the bucketing key mid-chain must not
    corrupt the checkpointed write: chunk selection uses the pre-chain
    bucket stamp, and the write partitions must use the SAME values —
    otherwise rows land under other chunks' buckets and a later
    chunk's dynamic overwrite deletes them."""
    from beats_spark.plans.lineage import run_checkpointed

    cfg = pipeline_cfg(out_root=str(tmp_path / "mut"), n_buckets=8)
    cfg.processors = [
        {"uppercase": {"fields": ["conv_id"]}},  # mutates the key
    ] + cfg.processors
    res = run_checkpointed(
        spark, transcripts, cfg, "mutrun", str(tmp_path / "lin_mut"), chunk_size=3
    )
    written = spark.read.parquet(str(tmp_path / "mut"))
    # ground truth: the same config through the one-shot transform —
    # no rows lost to cross-chunk overwrites, and counts reconcile
    expected = transform(transcripts, cfg).count()
    assert written.count() == expected
    assert sum(res.sink_counts.values()) == expected


def test_fmtstr_missing_nested_field_is_rule_miss_not_crash(spark):
    """%{[a][b]} whose subfield is absent (or whose parent is not a
    struct) must yield NULL — the documented next-rule fall-through —
    not an AnalysisException at plan build."""
    from beats_spark.functions.fmtstr import compile_fmtstr

    df = spark.createDataFrame(
        [(1, {"region": "eu"}, "s")],
        "id long, meta struct<region:string>, plain string",
    )
    ok = df.select(compile_fmtstr(df, "x-%{[meta][region]}").alias("v")).collect()
    assert ok[0]["v"] == "x-eu"
    missing = df.select(compile_fmtstr(df, "x-%{[meta][zone]}").alias("v")).collect()
    assert missing[0]["v"] is None
    nonstruct = df.select(compile_fmtstr(df, "x-%{[plain][sub]}").alias("v")).collect()
    assert nonstruct[0]["v"] is None


def test_bucket_expr_salt_on_string_field(spark):
    """Salting sub-keys hash through xxhash64, so a STRING salt_field
    (container/journald sequence ids) works instead of ANSI-crashing
    pmod at plan build; the result stays deterministic."""
    from beats_spark.plans.pipeline import bucket_expr

    df = spark.createDataFrame(
        [("c1", "seq-1"), ("c1", "seq-2"), ("c2", "seq-9")],
        "conv_id string, seq string",
    )
    a = df.select(bucket_expr("conv_id", 16, salt=4, salt_field="seq").alias("b")).collect()
    b = df.select(bucket_expr("conv_id", 16, salt=4, salt_field="seq").alias("b")).collect()
    assert a == b
    assert all(0 <= r["b"] < 16 for r in a)

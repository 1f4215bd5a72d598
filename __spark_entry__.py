"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship parse→enrich→route→aggregate pipeline on
sf0.001. ``queries()`` — one entry per implemented operator family from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text
analysis / multimodal). ``oracle_sql()`` — DuckDB-runnable ANSI SQL
equivalents over the same parquet views; approximate/stateful ops
(simhash blocking, LSH top-k, streaming) intentionally have no oracle
and get the driver's rows-only check.

Float policy: hash-checked outputs avoid engine-ordered float math.
Allowed float outputs are single IEEE-exact divisions of integers
(identical in both engines) or values floored to integers at 1e6 scale
(cosines), where the cross-engine error (~1e-12) cannot move the floor.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)



def _utc(spark: SparkSession) -> None:
    """Time-rendering queries (hour/date_format/window) depend on the
    session timezone; the driver's session may not be UTC — pin it so
    results match the DuckDB oracle's naive-UTC timestamps."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Raw-line synthesis: events → log-line text (the transcript `text` shape,
# BASELINE.json input_hint). Oracles recompute expected fields from the
# source columns instead of re-parsing, so this only needs to be
# deterministic, not SQL-replicated.
# ---------------------------------------------------------------------------

def _level():
    # Column exprs need an active session — build lazily per query
    return (
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("event_type") == "view", "debug")
        .when(F.col("event_type") == "purchase", "warn")
        .otherwise("info")
    )


_LEVEL_SQL = (
    "CASE event_type WHEN 'error' THEN 'error' WHEN 'view' THEN 'debug' "
    "WHEN 'purchase' THEN 'warn' ELSE 'info' END"
)


def _raw_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (event_id, user_id, event_type, ts, value, text) where
    text is a dissectable log line; every 47th event is malformed
    (missing the user= section → dissect_parsing_error + DLQ) and every
    31st has a NON-NUMERIC user (``user=uNN`` against ``%{uid|long}`` →
    typed-capture conversion failure). The second class is the ANSI
    job-killer regression fixture: the pipeline must tag
    dissect_conversion_error and keep the row flowing, never abort."""
    ev = _load(spark, sf_dir, "events")
    level = _level()
    event_ts = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    ok = F.format_string(
        'level=%s ts=%s user=%d msg="%s"', level, event_ts, F.col("user_id"), F.col("event_type")
    )
    bad = F.format_string('level=%s ts=%s msg="%s"', level, event_ts, F.col("event_type"))
    conv_bad = F.format_string(
        'level=%s ts=%s user=u%d msg="%s"', level, event_ts, F.col("user_id"), F.col("event_type")
    )
    text = (
        F.when(F.col("event_id") % 47 == 0, bad)
        .when(F.col("event_id") % 31 == 0, conv_bad)
        .otherwise(ok)
    )
    return ev.select("event_id", "user_id", "event_type", "ts", "value", text.alias("text"))


# oracle twins for the malformation classes above
_MALFORMED_SQL = "event_id % 47 = 0"
_CONVBAD_SQL = "(event_id % 31 = 0 AND event_id % 47 <> 0)"


_DISSECT_TOK = 'level=%{level} ts=%{event_ts} user=%{uid|long} msg="%{message}"'


# ---------------------------------------------------------------------------
# Pipeline queries (events)
# ---------------------------------------------------------------------------


def q_pipeline_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: dissect parse → timestamp → broadcast enrich →
    drop_event → first-match router → DLQ redirect → per-sink counts.
    Mirrors the full libbeat publisher path (SURVEY.md §3.1)."""
    _utc(spark)
    from beats_spark.operators.base import build_chain
    from beats_spark.plans.router import META_SINK, route
    from beats_spark.plans.sinks import redirect_dead_letters

    raw = _raw_lines(spark, sf_dir)
    chain = build_chain(
        [
            {"dissect": {"tokenizer": _DISSECT_TOK, "field": "text", "target_prefix": ""}},
            {
                "timestamp": {
                    "field": "event_ts",
                    "target_field": "ts2",
                    "layouts": ["yyyy-MM-dd'T'HH:mm:ss'Z'"],
                }
            },
            {
                "enrich_lookup": {
                    "key_field": "level",
                    "target_field": "channel",
                    "mapping": {
                        "error": "alerts",
                        "warn": "alerts",
                        "info": "standard",
                        "debug": "diagnostics",
                    },
                    "default": "other",
                }
            },
            {"drop_event": {"when": {"equals": {"level": "debug"}}}},
        ]
    )
    df = chain(raw)
    df = route(
        df,
        rules=[
            {"when": {"equals": {"level": "error"}}, "index": "errors"},
            {"when": {"range": {"uid": {"gte": 40}}}, "index": "power-%{[channel]}"},
            {"index": "%{[level]}", "mappings": {"info": "standard"}, "default": "bulk"},
        ],
        default="main",
        ts_col="ts2",
    )
    df = redirect_dead_letters(df)
    return df.groupBy(F.col(META_SINK).alias("sink")).agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("uid").alias("users")
    )


_SQL_PIPELINE_FANOUT = f"""
WITH base AS (
  SELECT event_id, user_id, {_LEVEL_SQL} AS level,
         {_MALFORMED_SQL} AS malformed, {_CONVBAD_SQL} AS convbad
  FROM events
), parsed AS (
  SELECT CASE WHEN malformed THEN NULL ELSE level END AS level,
         CASE WHEN malformed OR convbad THEN NULL ELSE user_id END AS uid,
         malformed
  FROM base
), kept AS (
  SELECT * FROM parsed WHERE level IS NULL OR level <> 'debug'
), routed AS (
  SELECT CASE
           WHEN malformed THEN '_dlq'
           WHEN level = 'error' THEN 'errors'
           WHEN uid >= 40 THEN 'power-' || CASE level WHEN 'error' THEN 'alerts'
                WHEN 'warn' THEN 'alerts' WHEN 'info' THEN 'standard' ELSE 'other' END
           WHEN level = 'info' THEN 'standard'
           ELSE 'bulk'
         END AS sink, uid
  FROM kept)
SELECT sink, count(*) AS n, count(DISTINCT uid) AS users FROM routed GROUP BY sink
"""


def q_dissect_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dissect with |long typed capture + failure tagging: per-row
    parsed fields, the parse-error flag, and the typed-conversion
    flag (malformed ``user=uNN`` rows must yield uid NULL +
    dissect_conversion_error, not an ANSI job abort)."""
    from beats_spark.operators.base import build_chain

    raw = _raw_lines(spark, sf_dir)
    chain = build_chain(
        [{"dissect": {"tokenizer": _DISSECT_TOK, "field": "text", "target_prefix": ""}}]
    )
    df = chain(raw)
    flags = F.coalesce(F.col("flags"), F.array().cast("array<string>"))
    return df.select(
        "event_id",
        F.col("level").alias("level"),
        F.col("uid").alias("uid"),
        F.col("message").alias("message"),
        F.array_contains(flags, "dissect_parsing_error").alias("parse_failed"),
        F.array_contains(flags, "dissect_conversion_error").alias("conv_failed"),
    )


_SQL_DISSECT_TYPED = f"""
SELECT event_id,
       CASE WHEN {_MALFORMED_SQL} THEN NULL ELSE {_LEVEL_SQL} END AS level,
       CASE WHEN {_MALFORMED_SQL} OR {_CONVBAD_SQL} THEN NULL ELSE user_id END AS uid,
       CASE WHEN {_MALFORMED_SQL} THEN NULL ELSE event_type END AS message,
       {_MALFORMED_SQL} AS parse_failed,
       {_CONVBAD_SQL} AS conv_failed
FROM events
"""


def q_multiline_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multiline reader (pattern/after mode): events are unrolled into
    per-file line streams (head + indented continuations, the Java
    stack-trace shape) and joined back into logical events by the
    reference's afterMatcher semantics (multiline.go)."""
    from pyspark.sql import Window

    from beats_spark.sources.lines import multiline_join

    ev = _load(spark, sf_dir, "events")
    unrolled = ev.select(
        F.col("user_id").cast("string").alias("file"),
        "event_id",
        F.explode(F.sequence(F.lit(0), F.col("event_id") % 3)).alias("k"),
    )
    line = F.when(
        F.col("k") == 0, F.format_string("start %d", F.col("event_id"))
    ).otherwise(F.format_string("  cont %d.%d", F.col("event_id"), F.col("k")))
    w = Window.partitionBy("file").orderBy("event_id", "k")
    lines = unrolled.select(
        "file",
        (F.row_number().over(w) - 1).alias("line_no"),
        line.alias("line"),
    )
    out = multiline_join(lines, pattern=r"^\s", match="after")
    return out.select(
        "file",
        F.col("line_no").cast("long").alias("line_no"),
        "message",
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def q_auditd_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auditd reader (libbeat/reader/auditd): events unroll into a mix
    of SYSCALL (hex-encoded exe, syscall-number mapping, errno exit,
    success flag), USER_CMD (inner msg=' block with hex cmd, dropped
    ?-values, res normalization), LOGIN (space-separated old/new
    renames) and corrupt lines. The oracle constructs every expected
    value analytically — including the hex decodes, which DuckDB
    never sees (the fixture encodes, the parser must decode)."""
    from beats_spark.operators.auditd import parse_auditd

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    sec = (F.lit(1700000000) + eid).cast("string")
    ms = F.format_string("%03d", eid % 1000)
    stamp = F.format_string("msg=audit(%s.%s:%s):", sec, ms, eid.cast("string"))
    exe_hex = F.upper(F.hex(F.concat(F.lit("/usr/bin/tool "), eid.cast("string"))))
    cmd_hex = F.upper(F.hex(F.concat(F.lit("run job "), eid.cast("string"))))
    syscall = (F.lit(42) + eid % 3).cast("string")  # connect/accept/sendto
    success = F.when(eid % 2 == 0, "yes").otherwise("no")
    exitv = F.when(eid % 2 == 0, F.lit("0")).otherwise(F.lit("-13"))
    line = (
        F.when(
            eid % 4 == 0,
            F.concat(
                F.lit("type=SYSCALL "), stamp,
                F.lit(" arch=c000003e syscall="), syscall,
                F.lit(" success="), success, F.lit(" exit="), exitv,
                F.lit(' a0=3 auid=1000 uid=0 comm="worker" exe='), exe_hex,
                F.lit(" key=(null)"),
            ),
        )
        .when(
            eid % 4 == 1,
            F.concat(
                F.lit("type=USER_CMD "), stamp,
                F.lit(" user pid=77 uid=497 auid=700 ses=1 msg='cwd=\"/\" cmd="),
                cmd_hex, F.lit(" terminal=? res=success'"),
            ),
        )
        .when(
            eid % 4 == 2,
            F.concat(
                F.lit("type=LOGIN "), stamp,
                F.lit(" pid=1 uid=0 old auid=700 new auid="), eid.cast("string"),
                F.lit(" old ses=1 new ses=2"),
            ),
        )
        .otherwise(F.format_string("garbage %d", eid))
    )
    out = parse_auditd(ev.select("event_id", line.alias("line")))
    f = F.col("fields")
    return out.select(
        "event_id",
        "record_type",
        "sequence",
        "ts",
        f.getItem("result").alias("result"),
        f.getItem("syscall").alias("syscall"),
        f.getItem("exit").alias("exit"),
        F.coalesce(f.getItem("exe"), f.getItem("cmd")).alias("decoded"),
        f.getItem("new_auid").alias("new_auid"),
        f.getItem("terminal").alias("terminal"),
    )


_SQL_AUDITD_PARSE = """
SELECT event_id,
  CASE event_id % 4 WHEN 0 THEN 'SYSCALL' WHEN 1 THEN 'USER_CMD'
                    WHEN 2 THEN 'LOGIN' END AS record_type,
  CASE WHEN event_id % 4 <> 3 THEN event_id::VARCHAR END AS sequence,
  CASE WHEN event_id % 4 <> 3 THEN
    TIMESTAMP '1970-01-01' + (1700000000 + event_id) * INTERVAL 1 SECOND
      + (event_id % 1000) * INTERVAL 1 MILLISECOND END AS ts,
  CASE WHEN event_id % 4 = 0 THEN
         CASE WHEN event_id % 2 = 0 THEN 'success' ELSE 'fail' END
       WHEN event_id % 4 = 1 THEN 'success' END AS result,
  CASE WHEN event_id % 4 = 0 THEN
    CASE event_id % 3 WHEN 0 THEN 'connect' WHEN 1 THEN 'accept'
                      ELSE 'sendto' END END AS syscall,
  CASE WHEN event_id % 4 = 0 THEN
    CASE WHEN event_id % 2 = 0 THEN '0' ELSE 'EACCES' END END AS exit,
  CASE WHEN event_id % 4 = 0 THEN '/usr/bin/tool ' || event_id::VARCHAR
       WHEN event_id % 4 = 1 THEN 'run job ' || event_id::VARCHAR END AS decoded,
  CASE WHEN event_id % 4 = 2 THEN event_id::VARCHAR END AS new_auid,
  NULL::VARCHAR AS terminal
FROM events
"""


def q_journald_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """journald input (filebeat/input/journald): events synthesize
    export-format field sets (raw journal KEY=VALUE pairs), the
    transports matcher filters to _TRANSPORT=journal, and the field
    conversion + ECS enrichment runs: typed ints with the reference's
    "pid,user" comma fallback, the audit-login-uid vs uid effective-
    user split (conv.go:130-150), quoted-token argv counting, the
    capabilities-mask → CAP_* names expansion, and unknown keys into
    the journald.custom map. The oracle reconstructs every value
    analytically — the parser must actually expand the hex mask and
    apply the login/uid rules to agree."""
    from beats_spark.sources.journald import (
        convert_journald_fields,
        matcher_condition,
    )

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    uid = F.col("user_id").cast("long")

    def kv(k: str, v) -> Column:
        return F.struct(F.lit(k).alias("k"), v.cast("string").alias("v"))

    login = F.when(eid % 3 == 0, uid).when(eid % 3 == 1, uid + 1)
    cmdline = (
        F.when(eid % 8 == 0, F.format_string("exec task-%d", eid))
        .otherwise(F.format_string('run "job %d" --n=3', eid))
    )
    caps = (
        F.when(eid % 3 == 0, F.lit("1"))       # CAP_CHOWN
        .when(eid % 3 == 1, F.lit("3"))        # CAP_CHOWN, CAP_DAC_OVERRIDE
        .otherwise(F.lit("c"))                 # CAP_DAC_READ_SEARCH, CAP_FOWNER
    )
    procid = (
        F.when(eid % 5 == 0, F.format_string("%d,root", eid % 9999))
        .otherwise((eid % 10000).cast("string"))
    )
    pairs = F.array(
        kv("__REALTIME_TIMESTAMP", F.lit(1700000000000000) + eid),
        kv("_HOSTNAME", F.format_string("host-%d", uid % 5)),
        kv("PRIORITY", eid % 8),
        kv("_UID", uid),
        kv("_GID", uid % 100),
        kv("_AUDIT_LOGINUID", login),
        kv("_PID", eid),
        kv("_CMDLINE", cmdline),
        kv("_CAP_EFFECTIVE", caps),
        kv("SYSLOG_PID", procid),
        kv("MESSAGE", F.col("event_type")),
        kv("_TRANSPORT", F.when(eid % 4 == 0, F.lit("journal")).otherwise(F.lit("stdout"))),
        kv("WORKLOAD_TAG", F.format_string("t%d", eid % 7)),
    )
    records = ev.select(
        eid.cast("long").alias("rec_no"),
        F.lit("synth").alias("file"),
        F.lit(None).cast("binary").alias("message_bytes"),
        F.filter(pairs, lambda p: p.getField("v").isNotNull()).alias("pairs"),
    ).where(matcher_condition(transports=["journal"]))
    out = convert_journald_fields(records)
    return out.select(
        F.col("rec_no").alias("event_id"),
        "ts",
        "message",
        "host_hostname",
        "log_syslog_priority",
        "log_syslog_procid",
        "journald_uid",
        "journald_gid",
        F.col("user_id").alias("ecs_user_id"),
        F.col("user_group_id").alias("ecs_user_group_id"),
        F.col("user_effective_id").alias("ecs_user_effective_id"),
        "process_pid",
        "process_command_line",
        "process_args_count",
        F.array_join("process_thread_capabilities_effective", ",").alias("caps_csv"),
        F.element_at("journald_custom", "workload_tag").alias("custom_tag"),
        "systemd_transport",
    )


_SQL_JOURNALD_PARSE = """
SELECT event_id,
  make_timestamp(1700000000000000 + event_id) AS ts,
  event_type AS message,
  'host-' || (user_id % 5)::VARCHAR AS host_hostname,
  (event_id % 8)::BIGINT AS log_syslog_priority,
  CASE WHEN event_id % 5 = 0 THEN (event_id % 9999)::BIGINT
       ELSE (event_id % 10000)::BIGINT END AS log_syslog_procid,
  user_id::BIGINT AS journald_uid,
  (user_id % 100)::BIGINT AS journald_gid,
  CASE WHEN event_id % 3 = 1 THEN (user_id + 1)::VARCHAR
       ELSE user_id::VARCHAR END AS ecs_user_id,
  CASE WHEN event_id % 3 = 1 THEN NULL
       ELSE (user_id % 100)::VARCHAR END AS ecs_user_group_id,
  CASE WHEN event_id % 3 = 1 THEN user_id::VARCHAR END AS ecs_user_effective_id,
  event_id::BIGINT AS process_pid,
  CASE WHEN event_id % 8 = 0 THEN 'exec task-' || event_id::VARCHAR
       ELSE 'run "job ' || event_id::VARCHAR || '" --n=3' END
    AS process_command_line,
  CASE WHEN event_id % 8 = 0 THEN 2 ELSE 3 END::BIGINT AS process_args_count,
  CASE event_id % 3 WHEN 0 THEN 'CAP_CHOWN'
                    WHEN 1 THEN 'CAP_CHOWN,CAP_DAC_OVERRIDE'
                    ELSE 'CAP_DAC_READ_SEARCH,CAP_FOWNER' END AS caps_csv,
  't' || (event_id % 7)::VARCHAR AS custom_tag,
  'journal' AS systemd_transport
FROM events
WHERE event_id % 4 = 0
"""


def q_multiline_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multiline reader, DISTRIBUTED form: identical fixture and
    expected output to `multiline_join`, but the segmentation runs the
    chunk-parallel plan (multiline_join_distributed) with a tiny
    chunk size so events straddle chunk boundaries throughout —
    the oracle therefore checks the boundary-stitch math exactly."""
    from pyspark.sql import Window

    from beats_spark.sources.lines import multiline_join_distributed

    ev = _load(spark, sf_dir, "events")
    unrolled = ev.select(
        F.col("user_id").cast("string").alias("file"),
        "event_id",
        F.explode(F.sequence(F.lit(0), F.col("event_id") % 3)).alias("k"),
    )
    line = F.when(
        F.col("k") == 0, F.format_string("start %d", F.col("event_id"))
    ).otherwise(F.format_string("  cont %d.%d", F.col("event_id"), F.col("k")))
    w = Window.partitionBy("file").orderBy("event_id", "k")
    lines = unrolled.select(
        "file",
        (F.row_number().over(w) - 1).cast("long").alias("line_no"),
        line.alias("line"),
    )
    out = multiline_join_distributed(
        lines, pattern=r"^\s", match="after", chunk_lines=16
    )
    return out.select(
        "file",
        F.col("line_no").cast("long").alias("line_no"),
        "message",
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def q_container_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """container input (docker json-file + CRI, format=auto): events
    are unrolled into per-file container-log lines — docker singles,
    docker split pairs (missing trailing \\n marks the fragment), CRI
    F lines, CRI P+F partial pairs, and corrupt lines — then parsed
    and reassembled by the reference's DockerJSONReader semantics
    (libbeat/reader/readjson/docker_json.go). The oracle constructs
    the expected assembled messages analytically; corrupt lines are
    skipped but still consume line numbers, exactly like the
    reference's parse-error `continue`."""
    from pyspark.sql import Window

    from beats_spark.sources.container import parse_container_logs

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    tss = F.concat(
        F.date_format(
            F.expr(
                "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, event_id % 86400)"
            ),
            "yyyy-MM-dd'T'HH:mm:ss",
        ),
        F.lit("Z"),
    )
    docker = F.format_string(
        '{"log":"msg %s\\n","stream":"stdout","time":"%s"}',
        eid.cast("string"),
        tss,
    )
    docker_p1 = F.format_string(
        '{"log":"msg %s part ","stream":"stdout","time":"%s"}',
        eid.cast("string"),
        tss,
    )
    docker_p2 = F.format_string(
        '{"log":"end\\n","stream":"stdout","time":"%s"}', tss
    )
    cri_full = F.format_string("%s stdout F msg %s", tss, eid.cast("string"))
    cri_p1 = F.format_string("%s stderr P msg %s ", tss, eid.cast("string"))
    cri_p2 = F.format_string("%s stderr F tail", tss)
    corrupt = F.format_string("garbage %s", eid.cast("string"))
    kind = eid % 5
    line_arr = (
        F.when(kind == 0, F.array(docker))
        .when(kind == 1, F.array(docker_p1, docker_p2))
        .when(kind == 2, F.array(cri_full))
        .when(kind == 3, F.array(cri_p1, cri_p2))
        .otherwise(F.array(corrupt))
    )
    unrolled = ev.select(
        F.col("user_id").cast("string").alias("file"),
        "event_id",
        F.posexplode(line_arr).alias("k", "line"),
    )
    w = Window.partitionBy("file").orderBy("event_id", "k")
    lines = unrolled.select(
        "file", (F.row_number().over(w) - 1).cast("long").alias("line_no"), "line"
    )
    out = parse_container_logs(lines, format="auto", partial=True, cri_flags=True)
    return out.select(
        "file",
        "line_no",
        "message",
        "stream",
        "ts",
        F.col("n_lines").cast("long").alias("n_lines"),
    )


_SQL_CONTAINER_LOGS = """
WITH ev AS (
  SELECT user_id::VARCHAR AS file, event_id, event_id % 5 AS kind,
         TIMESTAMP '2024-01-01 00:00:00'
           + (event_id % 86400) * INTERVAL 1 SECOND AS ts,
         CASE WHEN event_id % 5 IN (1, 3) THEN 2 ELSE 1 END AS n_all
  FROM events),
o AS (
  SELECT *, COALESCE(sum(n_all) OVER (
       PARTITION BY file ORDER BY event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS line_no
  FROM ev)
SELECT file, line_no::BIGINT AS line_no,
       CASE kind
         WHEN 0 THEN 'msg ' || event_id::VARCHAR || chr(10)
         WHEN 1 THEN 'msg ' || event_id::VARCHAR || ' part end' || chr(10)
         WHEN 2 THEN 'msg ' || event_id::VARCHAR
         WHEN 3 THEN 'msg ' || event_id::VARCHAR || ' tail' END AS message,
       CASE WHEN kind = 3 THEN 'stderr' ELSE 'stdout' END AS stream,
       ts,
       n_all::BIGINT AS n_lines
FROM o WHERE kind <> 4
"""


_SQL_MULTILINE_JOIN = """
WITH ev AS (
  SELECT user_id::VARCHAR AS file, event_id, event_id % 3 + 1 AS n_lines
  FROM events),
o AS (
  SELECT file, event_id, n_lines,
         COALESCE(sum(n_lines) OVER (
           PARTITION BY file ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS line_no
  FROM ev)
SELECT file, line_no::BIGINT AS line_no,
       'start ' || event_id::VARCHAR ||
         COALESCE(array_to_string(
           list_transform(range(1, n_lines::BIGINT),
             k -> chr(10) || '  cont ' || event_id::VARCHAR || '.' || k::VARCHAR),
           ''), '') AS message,
       n_lines::BIGINT AS n_lines
FROM o
"""


def q_dissect_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dissect pointer/indirect fields (%{*k}/%{&k}): row-dependent
    key names land in the dissect_map MapType overflow column —
    rendered as a sorted k=v CSV for the cross-engine hash."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events").withColumn(
        "kv",
        F.format_string(
            "u%d=%d type_%s=%d",
            F.col("user_id") % 5,
            (F.col("event_id") % 9).cast("int"),
            F.col("event_type"),
            F.col("user_id"),
        ),
    )
    chain = build_chain(
        [
            {
                "dissect": {
                    "tokenizer": "%{*a}=%{&a} %{*b}=%{&b}",
                    "field": "kv",
                    "target_prefix": "",
                }
            }
        ]
    )
    out = chain(ev)
    entries = F.transform(
        F.array_sort(F.map_entries(F.col("dissect_map"))),
        lambda e: F.concat_ws("=", e.getField("key"), e.getField("value")),
    )
    return out.select("event_id", F.array_join(entries, ",").alias("kv_csv"))


_SQL_DISSECT_MAP = """
WITH kv AS (
  SELECT event_id,
         'u' || (user_id % 5)::VARCHAR AS k1, (event_id % 9)::VARCHAR AS v1,
         'type_' || event_type AS k2, user_id::VARCHAR AS v2
  FROM events)
SELECT event_id,
       CASE WHEN k1 < k2 THEN k1 || '=' || v1 || ',' || k2 || '=' || v2
            ELSE k2 || '=' || v2 || ',' || k1 || '=' || v1 END AS kv_csv
FROM kv
"""


def q_router_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Router semantics in isolation: condition guard, fmtstr rule with
    missing-field fallback, mappings+default, first-match-wins."""
    from beats_spark.plans.router import META_SINK, route

    ev = _load(spark, sf_dir, "events")
    df = route(
        ev,
        rules=[
            {"when": {"contains": {"event_type": "rror"}}, "index": "sink-err"},
            {"when": {"range": {"value": {"lt": 5.0}}}, "index": "low-%{[event_type]}"},
            {
                "index": "%{[event_type]}",
                "mappings": {"click": "clicks", "view": "views"},
                "default": "misc",
            },
        ],
        default="main",
    )
    return df.groupBy(F.col(META_SINK).alias("sink")).agg(F.count(F.lit(1)).alias("n"))


_SQL_ROUTER_FIRST_MATCH = """
SELECT CASE
         WHEN event_type LIKE '%rror%' THEN 'sink-err'
         WHEN value < 5.0 THEN 'low-' || event_type
         WHEN event_type = 'click' THEN 'clicks'
         WHEN event_type = 'view' THEN 'views'
         ELSE 'misc'
       END AS sink, count(*) AS n
FROM events GROUP BY 1
"""


def q_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condition language: and/or/not/equals/contains/regexp/range —
    including typed equals/range over a DIRTY string column (numeric
    strings mixed with words): a typed mismatch is false, never an
    ANSI cast error (equals.go:26-113)."""
    from beats_spark.functions.conditions import compile_condition

    ev = _load(spark, sf_dir, "events").withColumn(
        "vtext",
        F.when(F.col("event_id") % 5 == 0, F.col("event_type")).otherwise(
            (F.col("user_id") % 20).cast("string")
        ),
    )
    cond = compile_condition(
        ev,
        {
            "and": [
                {"or": [{"equals": {"event_type": "click"}}, {"regexp": {"event_type": "^s.*up$"}}]},
                {"not": {"range": {"value": {"lt": 10.0}}}},
                {"range": {"user_id": {"gte": 5, "lt": 95}}},
                {
                    "or": [
                        {"range": {"vtext": {"gte": 15}}},
                        {"equals": {"vtext": 3}},
                    ]
                },
            ]
        },
    )
    return ev.filter(cond).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_id")
    )


_SQL_CONDITIONS = """
WITH ev AS (
  SELECT *,
         CASE WHEN event_id % 5 = 0 THEN event_type
              ELSE (user_id % 20)::VARCHAR END AS vtext
  FROM events)
SELECT event_type, count(*) AS n, min(event_id) AS first_id
FROM ev
WHERE (event_type = 'click' OR regexp_matches(event_type, '^s.*up$'))
  AND NOT (value < 10.0) AND user_id >= 5 AND user_id < 95
  AND (COALESCE(TRY_CAST(vtext AS DOUBLE) >= 15, FALSE)
       OR COALESCE(TRY_CAST(vtext AS DOUBLE) = 3, FALSE))
GROUP BY event_type
"""


def q_decode_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_json_fields with closed schema over the props column."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    chain = build_chain(
        [{"decode_json_fields": {"fields": ["props"], "schema": "k LONG", "target": ""}}]
    )
    return (
        chain(ev)
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count_distinct("k").alias("distinct_k"))
    )


_SQL_DECODE_JSON = """
SELECT event_type, sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       count(DISTINCT json_extract_string(props, '$.k')::BIGINT) AS distinct_k
FROM events GROUP BY event_type
"""


def q_grok_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grok (the north-star parse stage's grok half): Apache
    common-log-format lines synthesized from events, parsed with the
    pattern library (%{IPORHOST}/%{HTTPDATE}/%{INT:..:int} typed
    captures). Every 41st line is garbage — it must tag
    _grokparsefailure and keep flowing."""
    from beats_spark.operators.base import build_chain

    eid, uid = F.col("event_id"), F.col("user_id")
    line = F.format_string(
        '10.%d.%d.%d - u%d [%02d/Oct/2024:%02d:%02d:%02d +0000] "GET /p/%s HTTP/1.1" %d %d',
        (uid % 200).cast("int"),
        (eid % 250).cast("int"),
        (eid % 100).cast("int"),
        uid,
        (eid % 28 + 1).cast("int"),
        (eid % 24).cast("int"),
        (uid % 60).cast("int"),
        (eid % 60).cast("int"),
        F.col("event_type"),
        F.when(eid % 5 == 0, 404).otherwise(200),
        (eid % 9000 + 100).cast("int"),
    )
    ev = _load(spark, sf_dir, "events").withColumn(
        "message", F.when(eid % 41 == 0, F.lit("-- malformed --")).otherwise(line)
    )
    clf = (
        "%{IPORHOST:client_ip} %{NOTSPACE:ident} %{NOTSPACE:auth} "
        r"\[%{HTTPDATE:ts}\] \"%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}\" "
        "%{INT:status:int} %{INT:bytes:int}"
    )
    out = build_chain([{"grok": {"field": "message", "match": clf}}])(ev)
    return out.select(
        "event_id",
        "client_ip",
        "ts",
        "verb",
        "request",
        "status",
        "bytes",
        F.array_contains(
            F.coalesce(F.col("flags"), F.array().cast("array<string>")),
            "_grokparsefailure",
        ).alias("parse_failed"),
    )


_SQL_GROK_CLF = """
WITH f AS (
  SELECT event_id, user_id, event_type,
         event_id % 41 = 0 AS bad,
         user_id % 200 AS o2, event_id % 250 AS o3, event_id % 100 AS o4,
         event_id % 28 + 1 AS dd, event_id % 24 AS hh,
         user_id % 60 AS mi, event_id % 60 AS ss
  FROM events)
SELECT event_id,
       CASE WHEN bad THEN NULL ELSE '10.' || o2 || '.' || o3 || '.' || o4 END AS client_ip,
       CASE WHEN bad THEN NULL ELSE
         lpad(dd::VARCHAR, 2, '0') || '/Oct/2024:' || lpad(hh::VARCHAR, 2, '0') || ':'
           || lpad(mi::VARCHAR, 2, '0') || ':' || lpad(ss::VARCHAR, 2, '0') || ' +0000'
       END AS ts,
       CASE WHEN bad THEN NULL ELSE 'GET' END AS verb,
       CASE WHEN bad THEN NULL ELSE '/p/' || event_type END AS request,
       CASE WHEN bad THEN NULL
            WHEN event_id % 5 = 0 THEN 404 ELSE 200 END AS status,
       CASE WHEN bad THEN NULL ELSE event_id % 9000 + 100 END AS bytes,
       bad AS parse_failed
FROM f
"""


def q_decode_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_xml with an explicit schema: NESTED decode via the JVM
    from_xml (typed fields, depth 2 here). Every 19th row is truncated
    XML — it must tag decode_xml_error and keep flowing (the oracle
    recomputes expected fields from the source columns)."""
    from beats_spark.operators.base import build_chain

    ok = F.format_string(
        "<ev><t>%s</t><u><id>%d</id></u></ev>", F.col("event_type"), F.col("user_id")
    )
    bad = F.format_string("<ev><t>%s</t><u><id", F.col("event_type"))
    ev = _load(spark, sf_dir, "events").withColumn(
        "xml", F.when(F.col("event_id") % 19 == 0, bad).otherwise(ok)
    )
    chain = build_chain(
        [
            {
                "decode_xml": {
                    "field": "xml",
                    "target": "x",
                    "schema": "t STRING, u STRUCT<id: BIGINT>",
                }
            }
        ]
    )
    out = chain(ev)
    return out.select(
        "event_id",
        F.col("x_t").alias("x_t"),
        F.col("x_u").getField("id").alias("x_uid"),
        F.array_contains(
            F.coalesce(F.col("flags"), F.array().cast("array<string>")),
            "decode_xml_error",
        ).alias("xml_failed"),
    )


_SQL_DECODE_XML = """
SELECT event_id,
       CASE WHEN event_id % 19 = 0 THEN NULL ELSE event_type END AS x_t,
       CASE WHEN event_id % 19 = 0 THEN NULL ELSE user_id END AS x_uid,
       event_id % 19 = 0 AS xml_failed
FROM events
"""


def q_timestamp_layouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestamp processor: layout-battery parse back to UTC, grouped
    per hour-of-day (the parse→normalize round trip)."""
    _utc(spark)
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events").withColumn(
        "ts_text", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    chain = build_chain(
        [
            {
                "timestamp": {
                    "field": "ts_text",
                    "target_field": "ts2",
                    "layouts": ["MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd HH:mm:ss"],
                }
            }
        ]
    )
    return (
        chain(ev)
        .groupBy(F.hour("ts2").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SQL_TIMESTAMP_LAYOUTS = """
SELECT hour(ts)::INT AS hour, count(*) AS n FROM events GROUP BY 1
"""


def q_convert_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert: try-cast semantics — numeric text converts, word text
    nulls + tags convert_error (Beats fail_on_error=false path)."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events").withColumn(
        "mixed",
        F.when(F.col("event_id") % 3 == 0, F.col("event_type")).otherwise(
            F.col("user_id").cast("string")
        ),
    )
    chain = build_chain(
        [{"convert": {"fields": [{"from": "mixed", "to": "mixed_num", "type": "long"}]}}]
    )
    df = chain(ev)
    return df.select(
        "event_id",
        "mixed_num",
        F.array_contains(
            F.coalesce(F.col("flags"), F.array().cast("array<string>")), "convert_error"
        ).alias("convert_failed"),
    )


_SQL_CONVERT_TAGGING = """
SELECT event_id,
       CASE WHEN event_id % 3 = 0 THEN NULL ELSE user_id END AS mixed_num,
       event_id % 3 = 0 AS convert_failed
FROM events
"""


def q_convert_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert type=ip at full net.ParseIP parity (convert.go:347):
    a planted battery covering strict quads (no leading zeros), every
    embedded-v4-tail compression placement (the round-3 residual),
    zone suffixes (rejected), double compression (rejected) and NULL.
    Valid rows copy the string through; invalid rows null + tag."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    addr = (
        F.when(eid % 13 == 0, F.concat(F.lit("10."), (eid % 256).cast("string"), F.lit(".0.1")))
        .when(eid % 13 == 1, F.lit("1::2:3.4.5.6"))
        .when(eid % 13 == 2, F.lit("300.1.1.1"))
        .when(eid % 13 == 3, F.lit("::ffff:1.2.3.4"))
        .when(eid % 13 == 4, F.lit("not-an-ip"))
        .when(eid % 13 == 5, F.lit("01.2.3.4"))
        .when(eid % 13 == 6, F.lit("1:2:3:4:5:6:7:8"))
        .when(eid % 13 == 7, F.lit("fe80::1%eth0"))
        .when(eid % 13 == 8, F.lit("::"))
        .when(eid % 13 == 9, F.lit("1::2::3"))
        .when(eid % 13 == 10, F.lit("::2:3.4.5.6"))
        .when(eid % 13 == 11, F.lit("1.2.3.4.5"))
        .otherwise(F.lit(None).cast("string"))
    )
    chain = build_chain(
        [{"convert": {"fields": [{"from": "addr", "to": "ip", "type": "ip"}]}}]
    )
    out = chain(ev.select("event_id", addr.alias("addr")))
    return out.select(
        "event_id",
        "addr",
        "ip",
        F.array_contains(
            F.coalesce(F.col("flags"), F.array().cast("array<string>")),
            "convert_error",
        ).alias("convert_failed"),
    )


_SQL_CONVERT_IP = """
WITH planted AS (
  SELECT event_id,
         CASE event_id % 13
           WHEN 0 THEN '10.' || (event_id % 256)::VARCHAR || '.0.1'
           WHEN 1 THEN '1::2:3.4.5.6'
           WHEN 2 THEN '300.1.1.1'
           WHEN 3 THEN '::ffff:1.2.3.4'
           WHEN 4 THEN 'not-an-ip'
           WHEN 5 THEN '01.2.3.4'
           WHEN 6 THEN '1:2:3:4:5:6:7:8'
           WHEN 7 THEN 'fe80::1%eth0'
           WHEN 8 THEN '::'
           WHEN 9 THEN '1::2::3'
           WHEN 10 THEN '::2:3.4.5.6'
           WHEN 11 THEN '1.2.3.4.5'
           ELSE NULL END AS addr,
         event_id % 13 IN (0, 1, 3, 6, 8, 10) AS is_valid
  FROM events
)
SELECT event_id,
       addr,
       CASE WHEN is_valid THEN addr END AS ip,
       (addr IS NOT NULL AND NOT is_valid) AS convert_failed
FROM planted
"""


def q_kafka_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kafka hash-by-fields partitioner at reference parity
    (plans/router.py: FNV-32a over HashFieldValue byte renderings —
    int64 fields as 8 LE bytes, strings as UTF-8 — then Hash2Partition
    with the signed-int32 reinterpretation; partition.go:199-278).
    The oracle refolds the same bytes with DuckDB list_reduce."""
    from beats_spark.plans.router import fnv32a_fields, kafka_hash_partition

    ev = _load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return ev.select(
        "event_id",
        fnv32a_fields(ev, ["user_id", "event_type"]).alias("fnv"),
        kafka_hash_partition(ev, ["user_id", "event_type"], 12).alias("partition"),
    )


_SQL_KAFKA_PARTITION = """
WITH hx AS (
  SELECT event_id,
         -- || not concat(): DuckDB concat() SKIPS NULL arguments but
         -- Spark's concat NULL-propagates; a NULL field must null the
         -- whole hash on both sides
         lpad(hex((user_id >> 0) & 255), 2, '0')
           || lpad(hex((user_id >> 8) & 255), 2, '0')
           || lpad(hex((user_id >> 16) & 255), 2, '0')
           || lpad(hex((user_id >> 24) & 255), 2, '0')
           || lpad(hex((user_id >> 32) & 255), 2, '0')
           || lpad(hex((user_id >> 40) & 255), 2, '0')
           || lpad(hex((user_id >> 48) & 255), 2, '0')
           || lpad(hex((user_id >> 56) & 255), 2, '0')
           || hex(encode(event_type)) AS h
  FROM events
), folded AS (
  SELECT event_id,
         list_reduce(
           list_prepend(
             2166136261::BIGINT,
             list_transform(range(1, length(h) // 2 + 1),
                            i -> ('0x' || substr(h, (i * 2 - 1)::int, 2))::BIGINT)
           ),
           (acc, b) -> (xor(acc, b) * 16777619) % 4294967296
         ) AS fnv
  FROM hx
)
SELECT event_id,
       fnv,
       (((CASE WHEN fnv >= 2147483648 THEN fnv - 4294967296 ELSE fnv END)
          & 2147483647) % 12)::INT AS partition
FROM folded
"""


def q_mutate_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutation battery: rename → copy_fields → truncate_fields →
    replace → uppercase(values) → drop_fields, in declared order."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    chain = build_chain(
        [
            {"rename": {"fields": [{"from": "event_type", "to": "etype"}]}},
            {"copy_fields": {"fields": [{"from": "etype", "to": "etype_copy"}]}},
            {"truncate_fields": {"fields": ["etype_copy"], "max_characters": 4}},
            {"replace": {"fields": [{"field": "etype", "pattern": "i", "replacement": "1"}]}},
            {"uppercase": {"values": ["etype"]}},
            {"drop_fields": {"fields": ["props", "value"]}},
        ]
    )
    return chain(ev).select("event_id", "etype", "etype_copy")


_SQL_MUTATE_CHAIN = """
SELECT event_id, upper(replace(event_type, 'i', '1')) AS etype,
       substr(event_type, 1, 4) AS etype_copy
FROM events
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fingerprint processor: sha256 over sorted |k|v| material
    (fingerprint.go:94-115) — engine-portable hex output."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    chain = build_chain(
        [{"fingerprint": {"fields": ["event_type", "user_id"], "target_field": "fp"}}]
    )
    return chain(ev).select("event_id", "fp")


_SQL_FINGERPRINT = """
SELECT event_id,
       sha256('|event_type|' || event_type || '|user_id|' || user_id::VARCHAR || '|') AS fp
FROM events
"""


def q_fmtstr_daily_sinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event format strings with %{+yyyy.MM.dd} timestamp expressions —
    the add_formatted_index / daily-index pattern."""
    _utc(spark)
    from beats_spark.plans.router import META_SINK, route

    ev = _load(spark, sf_dir, "events")
    df = route(ev, rules=[{"index": "logs-%{[event_type]}-%{+yyyy.MM.dd}"}], default="main")
    return df.groupBy(F.col(META_SINK).alias("sink")).agg(F.count(F.lit(1)).alias("n"))


_SQL_FMTSTR_DAILY_SINKS = """
SELECT 'logs-' || event_type || '-' || strftime(ts, '%Y.%m.%d') AS sink, count(*) AS n
FROM events GROUP BY 1
"""


def q_syslog_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """syslog processor (RFC3164 path): synthesize priority+header
    lines from events, parse back hostname/program/pid/severity."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    pri = (F.col("user_id") % 192).cast("int")
    line = F.format_string(
        "<%d>Jan %2d 03:14:%02d host%d app%d[%d]: %s happened",
        pri,
        (F.col("event_id") % 28 + 1).cast("int"),
        (F.col("event_id") % 60).cast("int"),
        F.col("user_id"),
        F.col("user_id") % 7,
        F.col("event_id") % 9999,
        F.col("event_type"),
    )
    df = ev.withColumn("line", line)
    chain = build_chain([{"syslog": {"field": "line", "format": "rfc3164"}}])
    return chain(df).select(
        "event_id",
        "log_syslog_priority",
        "log_syslog_severity",
        F.col("hostname").alias("hostname"),
        F.col("program").alias("program"),
        F.col("syslog_message").alias("syslog_message"),
    )


_SQL_SYSLOG_PARSE = """
SELECT event_id,
       (user_id % 192)::INT AS log_syslog_priority,
       (user_id % 192)::INT % 8 AS log_syslog_severity,
       'host' || user_id::VARCHAR AS hostname,
       'app' || (user_id % 7)::VARCHAR AS program,
       event_type || ' happened' AS syslog_message
FROM events
"""


def q_syslog_rfc5424(spark: SparkSession, sf_dir: str) -> DataFrame:
    """syslog processor, RFC5424 path (the 3164 path has its own
    query): versioned header, ISO timestamp, nil structured-data;
    every 37th line is not syslog at all → tag-and-continue."""
    from beats_spark.operators.base import build_chain

    eid, uid = F.col("event_id"), F.col("user_id")
    pri = (uid % 192).cast("int")
    line = F.format_string(
        "<%d>1 2024-03-%02dT%02d:%02d:%02dZ host%d app%d %d - - %s done",
        pri,
        (eid % 28 + 1).cast("int"),
        (eid % 24).cast("int"),
        (uid % 60).cast("int"),
        (eid % 60).cast("int"),
        uid,
        uid % 7,
        eid % 9999,
        F.col("event_type"),
    )
    ev = _load(spark, sf_dir, "events").withColumn(
        "line", F.when(eid % 37 == 0, F.lit("plain text, not syslog")).otherwise(line)
    )
    chain = build_chain([{"syslog": {"field": "line", "format": "rfc5424"}}])
    out = chain(ev)
    return out.select(
        "event_id",
        "log_syslog_priority",
        "log_syslog_severity",
        F.col("hostname").alias("hostname"),
        F.col("program").alias("program"),
        F.col("procid").alias("procid"),
        F.col("syslog_message").alias("syslog_message"),
        F.array_contains(
            F.coalesce(F.col("flags"), F.array().cast("array<string>")),
            "syslog_parse_error",
        ).alias("parse_failed"),
    )


_SQL_SYSLOG_RFC5424 = """
WITH f AS (SELECT event_id, user_id, event_type, event_id % 37 = 0 AS bad FROM events)
SELECT event_id,
       CASE WHEN bad THEN NULL ELSE (user_id % 192)::INT END AS log_syslog_priority,
       CASE WHEN bad THEN NULL ELSE (user_id % 192)::INT % 8 END AS log_syslog_severity,
       CASE WHEN bad THEN NULL ELSE 'host' || user_id::VARCHAR END AS hostname,
       CASE WHEN bad THEN NULL ELSE 'app' || (user_id % 7)::VARCHAR END AS program,
       CASE WHEN bad THEN NULL ELSE (event_id % 9999)::VARCHAR END AS procid,
       CASE WHEN bad THEN NULL ELSE event_type || ' done' END AS syslog_message,
       bad AS parse_failed
FROM f
"""


def q_network_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """network condition: CIDR + named-range membership on synthesized
    IPv4s, pure JVM integer math. Every 13th row is a hostname and
    every 17th has an out-of-range octet — unparseable addresses must
    evaluate FALSE (net.ParseIP → nil), never raise under ANSI."""
    from beats_spark.functions.conditions import compile_condition

    good = F.format_string(
        "%d.%d.%d.%d",
        F.when(F.col("user_id") % 3 == 0, 10).when(F.col("user_id") % 3 == 1, 127).otherwise(192),
        (F.col("user_id") % 200).cast("int"),
        (F.col("event_id") % 250).cast("int"),
        (F.col("event_id") % 100).cast("int"),
    )
    ev = _load(spark, sf_dir, "events").withColumn(
        "ip",
        F.when(F.col("event_id") % 13 == 0, F.format_string("host%d.local", F.col("user_id")))
        .when(F.col("event_id") % 17 == 0, F.format_string("300.%d.1.1", F.col("user_id")))
        .otherwise(good),
    )
    is_private = compile_condition(ev, {"network": {"ip": "private"}})
    is_loopback = compile_condition(ev, {"network": {"ip": "loopback"}})
    in_slice = compile_condition(ev, {"network": {"ip": "10.0.0.0/8"}})
    is_public = compile_condition(ev, {"network": {"ip": "public"}})
    return ev.select(
        "event_id",
        is_private.alias("is_private"),
        is_loopback.alias("is_loopback"),
        in_slice.alias("in_ten_net"),
        is_public.alias("is_public"),
    )


_SQL_NETWORK_CONDITIONS = """
WITH ips AS (
  SELECT event_id,
         CASE WHEN user_id % 3 = 0 THEN 10 WHEN user_id % 3 = 1 THEN 127 ELSE 192 END AS o1,
         user_id % 200 AS o2,
         (event_id % 13 = 0) OR (event_id % 17 = 0) AS bad
  FROM events)
SELECT event_id,
       NOT bad AND ((o1 = 10) OR (o1 = 192 AND o2 = 168)) AS is_private,
       NOT bad AND o1 = 127 AS is_loopback,
       NOT bad AND o1 = 10 AS in_ten_net,
       NOT bad AND o1 = 192 AND o2 <> 168 AS is_public
FROM ips
"""


def q_enrich_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash-join enrich (cache/dns/translate_sid analogue):
    dimension as an explicit table, join + default for missses."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    dim = [
        {"key": "click", "value": "engagement"},
        {"key": "view", "value": "engagement"},
        {"key": "purchase", "value": "revenue"},
        {"key": "signup", "value": "growth"},
    ]
    chain = build_chain(
        [
            {
                "enrich_lookup": {
                    "key_field": "event_type",
                    "target_field": "category",
                    "table": dim,
                    "default": "other",
                }
            }
        ]
    )
    return (
        chain(ev)
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


_SQL_ENRICH_BROADCAST = """
SELECT CASE event_type WHEN 'click' THEN 'engagement' WHEN 'view' THEN 'engagement'
            WHEN 'purchase' THEN 'revenue' WHEN 'signup' THEN 'growth' ELSE 'other' END AS category,
       count(*) AS n, sum(round(value * 100)::BIGINT)::BIGINT AS value_cents
FROM events GROUP BY 1
"""


def q_lookup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful/IO-bound reference processors (cache get, dns,
    translate_sid) as chained broadcast lookups — one physical
    operator family, three config names, misses fall to defaults."""
    from beats_spark.operators.base import build_chain

    eid, uid = F.col("event_id"), F.col("user_id")
    ev = _load(spark, sf_dir, "events").withColumns(
        {
            "ip": F.format_string("10.0.0.%d", (uid % 4).cast("int")),
            "sid": F.format_string("S-1-5-%d", (eid % 3).cast("int")),
        }
    )
    chain = build_chain(
        [
            {
                "cache": {
                    "get": {"key_field": "event_type", "target_field": "cached"},
                    "mapping": {"click": "hot", "view": "warm"},
                    "default": "cold",
                }
            },
            {
                "dns": {
                    "fields": {"ip": "host"},
                    "mapping": {"10.0.0.0": "gw", "10.0.0.1": "db1"},
                    "default": "unknown",
                }
            },
            {
                "translate_sid": {
                    "field": "sid",
                    "account_name_target": "account",
                    "mapping": {"S-1-5-0": "SYSTEM", "S-1-5-1": "LOCAL"},
                    "default": "nobody",
                }
            },
        ]
    )
    return chain(ev).select("event_id", "cached", "host", "account")


_SQL_LOOKUP_CHAIN = """
SELECT event_id,
       CASE event_type WHEN 'click' THEN 'hot' WHEN 'view' THEN 'warm'
            ELSE 'cold' END AS cached,
       CASE user_id % 4 WHEN 0 THEN 'gw' WHEN 1 THEN 'db1' ELSE 'unknown' END AS host,
       CASE event_id % 3 WHEN 0 THEN 'SYSTEM' WHEN 1 THEN 'LOCAL' ELSE 'nobody' END AS account
FROM events
"""


def q_stable_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable per-key ordering (the publish-order ACK guarantee →
    Window over (key, ts, id)): first 3 events per user."""
    _utc(spark)
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", F.col("rn").cast("long").alias("rn"), "event_id")
    )


_SQL_STABLE_ORDERING = """
SELECT user_id, rn, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn <= 3
"""


def q_decode_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_base64_field + urldecode + extract_field + decode_duration
    round trips on synthesized columns."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events").withColumns(
        {
            "b64": F.base64(F.encode(F.col("event_type"), "UTF-8")),
            "urlenc": F.concat(F.col("event_type"), F.lit("%20"), F.col("user_id").cast("string")),
            "csvish": F.format_string("%s:%d:%s", F.col("event_type"), F.col("user_id"), F.lit("x")),
            "dur": F.format_string(
                "%dh%dm", (F.col("user_id") % 5).cast("int"), (F.col("event_id") % 60).cast("int")
            ),
            "csvline": F.format_string(
                '%s,"%d,%d",tail', F.col("event_type"), F.col("user_id"), F.col("event_id")
            ),
        }
    )
    chain = build_chain(
        [
            {"decode_base64_field": {"field": {"from": "b64", "to": "b64_dec"}}},
            {"urldecode": {"fields": [{"from": "urlenc", "to": "url_dec"}]}},
            {"extract_field": {"field": "csvish", "separator": ":", "index": 1, "target": "mid"}},
            {"decode_duration": {"field": "dur", "format": "seconds", "target_field": "dur_s"}},
            {"decode_csv_fields": {"fields": {"csvline": "csv_arr"}, "n_columns": 3}},
        ]
    )
    return chain(ev).select(
        "event_id",
        "b64_dec",
        "url_dec",
        "mid",
        F.col("dur_s").cast("long").alias("dur_s"),
        # RFC-4180: the quoted middle field keeps its embedded comma
        F.element_at("csv_arr", 2).alias("csv_quoted"),
        F.size("csv_arr").cast("long").alias("csv_n"),
    )


_SQL_DECODE_BATTERY = """
SELECT event_id,
       event_type AS b64_dec,
       event_type || ' ' || user_id::VARCHAR AS url_dec,
       user_id::VARCHAR AS mid,
       (user_id % 5) * 3600 + (event_id % 60) * 60 AS dur_s,
       user_id::VARCHAR || ',' || event_id::VARCHAR AS csv_quoted,
       3::BIGINT AS csv_n
FROM events
"""


# ---------------------------------------------------------------------------
# Training-data ops (documents / embeddings)
# ---------------------------------------------------------------------------


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus sampling battery: hash-Bernoulli sample +
    disjoint train/eval split + per-language stratified quota — the
    data-mixing primitives, every one reproducing EXACT row sets in
    the oracle (md5-hash order is engine-portable)."""
    from beats_spark.operators.sampling import (
        hash_sample,
        split_train_eval,
        stratified_quota,
    )

    docs = _load(spark, sf_dir, "documents")
    sampled = hash_sample(docs, 0.25, "doc_id", seed=3)
    split = split_train_eval(sampled, "doc_id", eval_fraction=0.1, seed=5)
    quota = stratified_quota(split, "lang", 40, "doc_id", seed=7)
    return quota.select("doc_id", "lang", "split")


_SQL_CORPUS_SAMPLE = f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('s3|' || doc_id::VARCHAR), 1, 15))::BIGINT AS h_samp,
         ('0x' || substr(md5('s5|' || doc_id::VARCHAR), 1, 15))::BIGINT AS h_split,
         ('0x' || substr(md5('s7|' || doc_id::VARCHAR), 1, 15))::BIGINT AS h_quota
  FROM documents),
sampled AS (
  SELECT doc_id, lang,
         CASE WHEN h_split < {int(0.1 * (1 << 60))} THEN 'eval' ELSE 'train' END AS split,
         h_quota
  FROM h WHERE h_samp < {int(0.25 * (1 << 60))}),
ranked AS (
  SELECT doc_id, lang, split,
         row_number() OVER (PARTITION BY lang ORDER BY h_quota, doc_id) AS rnk
  FROM sampled)
SELECT doc_id, lang, split FROM ranked WHERE rnk <= 40
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style distributed sequence packing (operators/sampling.py:
    pack_sequences): md5-bucketed streams, per-stream exclusive running
    token sum, floor-division window assignment. All-integer output, so
    the oracle reproduces the exact per-doc pack layout."""
    from beats_spark.operators.sampling import pack_sequences

    docs = _load(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=128, n_buckets=16)


def q_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing priced in REAL subword tokens: the same
    md5-bucketed window assignment, but tok_count from the
    deterministic byte-level BPE (functions/bpe.py, fixed checked-in
    merges; Arrow pandas UDF). CJK/code rows are planted so the
    whitespace-vs-subword gap is visible in the output. No DuckDB
    oracle — greedy ranked merges aren't SQL-expressible; the gate is
    the in-suite exact twin (tests/test_bpe.py compares the UDF and
    the packing layout token-for-token against the pure-Python
    encoder). Rows-only by design, documented in COVERAGE.md."""
    from beats_spark.operators.sampling import pack_sequences
    from beats_spark.operators.scale import spread

    # spread the single-file fixture scan before the Arrow UDF stage
    docs = spread(_load(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 5 == 0, F.lit("形態素解析は難しい問題ですが分散処理で高速化できます"))
        .when(did % 7 == 0, F.lit("x=[i*2 for i in range(10) if i%2==0]"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pack_sequences(planted, budget=128, n_buckets=16, token_counter="bpe")


_SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5('s0|' || doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS bucket,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS tok_count
  FROM documents),
s AS (
  SELECT doc_id, bucket, tok_count,
         coalesce(sum(tok_count + 1) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
  FROM t)
SELECT doc_id, bucket::BIGINT AS bucket, tok_count::BIGINT AS tok_count, start_off,
       (start_off // 128)::BIGINT AS pack_first,
       ((start_off + greatest(tok_count, 1) - 1) // 128)::BIGINT AS pack_last
FROM s
"""


def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainer-facing packing manifest (sampling.pack_manifest): one
    row per document × context window it intersects, with in-doc and
    in-window offsets and slice lengths — the data-loader read plan.
    All-integer, so the oracle replays the exact manifest."""
    from beats_spark.operators.sampling import pack_manifest

    docs = _load(spark, sf_dir, "documents")
    return pack_manifest(docs, budget=128, n_buckets=16)


_SQL_PACK_MANIFEST = """
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5('s0|' || doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS bucket,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS tok_count
  FROM documents),
s AS (
  SELECT doc_id, bucket, tok_count,
         coalesce(sum(tok_count + 1) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
  FROM t),
e AS (
  SELECT doc_id, bucket, start_off, greatest(tok_count, 1) AS toks FROM s),
x AS (
  SELECT doc_id, bucket, start_off, toks, u.w AS pack_idx
  FROM e, unnest(range(start_off // 128, (start_off + toks - 1) // 128 + 1)) AS u(w))
SELECT bucket::BIGINT AS bucket,
       pack_idx::BIGINT AS pack_idx,
       doc_id,
       (greatest(start_off, pack_idx * 128) - start_off)::BIGINT AS doc_from_tok,
       (greatest(start_off, pack_idx * 128) - pack_idx * 128)::BIGINT AS win_from_tok,
       (least(start_off + toks, (pack_idx + 1) * 128)
        - greatest(start_off, pack_idx * 128))::BIGINT AS n_toks
FROM x
"""


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components clustering of a duplicate-pair graph:
    documents link into stars around every 7th doc, and every third
    hub chains to its predecessor star — so single pairs under-delete
    and only the transitive closure labels clusters right. The oracle
    computes true components with a recursive CTE over the same edge
    list: both engines must agree on actual graph traversal output
    (node → min reachable id), not a closed formula."""
    from beats_spark.operators.dedup import connected_components

    docs = _load(spark, sf_dir, "documents")
    spokes = docs.where("doc_id % 7 != 0 and doc_id % 3 != 0").select(
        F.col("doc_id").alias("a"),
        F.expr("doc_id - doc_id % 7").alias("b"),
    )
    bridges = docs.where(
        "doc_id % 7 = 0 and doc_id > 0 and (doc_id div 7) % 3 = 1"
    ).select(F.col("doc_id").alias("a"), F.expr("doc_id - 1").alias("b"))
    comp = connected_components(spokes.unionByName(bridges), "a", "b")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


_SQL_DEDUP_CLUSTER = """
WITH RECURSIVE edges AS (
  SELECT doc_id AS a, doc_id - doc_id % 7 AS b FROM documents
  WHERE doc_id % 7 != 0 AND doc_id % 3 != 0
  UNION ALL
  SELECT doc_id, doc_id - 1 FROM documents
  WHERE doc_id % 7 = 0 AND doc_id > 0 AND (doc_id // 7) % 3 = 1
), sym AS (
  SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges
), reach AS (
  SELECT u AS node, u AS label FROM sym
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
)
SELECT node AS doc_id,
       min(label)::BIGINT AS component,
       (node = min(label)) AS is_canonical
FROM reach GROUP BY node
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: corpus unioned with 100 renumbered+noised copies →
    keeper set must equal the original ids (min-id wins)."""
    from beats_spark.operators.dedup import exact_dedup

    docs = _load(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") < 100).withColumns(
        {
            "doc_id": F.col("doc_id") + 1000000,
            "text": F.concat(F.lit("  "), F.upper(F.col("text")), F.lit(" ")),
        }
    )
    kept = exact_dedup(docs.unionByName(copies))
    return kept.select("doc_id", "source")


_SQL_DEDUP_EXACT = """
WITH uni AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, source, '  ' || upper(text) || ' '
  FROM documents WHERE doc_id < 100
), keyed AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM uni)
SELECT doc_id, source FROM keyed
WHERE doc_id IN (SELECT min(doc_id) FROM keyed GROUP BY norm)
"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-5-gram Jaccard near-dup pairs over the corpus (the
    ground-truth stage of the MinHash pipeline)."""
    from beats_spark.operators.dedup import ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=5, threshold=0.5)


_SQL_JACCARD_BODY = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - {n}, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + {n}], ' ')
         )) AS grams
  FROM (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.grams, b.grams))::DOUBLE
         / len(list_distinct(a.grams || b.grams))::DOUBLE AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(a.grams || b.grams))::DOUBLE >= {t}
"""

_SQL_DEDUP_JACCARD = _SQL_JACCARD_BODY.format(n=5, t=0.5)


def q_dedup_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard pairs in BLOCKED mode (block_col="lang") — the
    100 TB path: comparison restricted to within a blocking key, so the
    pair space is per-block quadratic instead of corpus quadratic. The
    blockless crossJoin mode of q_dedup_jaccard stays as small-scale
    ground truth. (lang blocks keep 6 of the 25 sf0.01 planted pairs;
    source blocks would keep only 1.)"""
    from beats_spark.operators.dedup import ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=5, threshold=0.5, block_col="lang")


_SQL_DEDUP_JACCARD_BLOCKED = """
WITH sh AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT doc_id, lang,
           string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.grams, b.grams))::DOUBLE
         / len(list_distinct(a.grams || b.grams))::DOUBLE AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(a.grams || b.grams))::DOUBLE >= 0.5
"""


def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard pairs via the PREFIX-FILTERED exact join (PPJoin
    family — beats_spark/operators/dedup.py:_jaccard_pairs_prefix): only
    each doc's rarest |g|−⌈t·|g|⌉+1 grams are indexed, so boilerplate
    grams never enter the candidate self-join. Output is EXACT (candidates
    are verified with full array intersection), so the oracle is the same
    brute-force SQL as the other jaccard modes; run here at n=4, t=0.6 to
    exercise a borderline ⌈t·n⌉ rounding point the other queries don't."""
    from beats_spark.operators.dedup import ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=4, threshold=0.6, method="prefix")


_SQL_DEDUP_JACCARD_PREFIX = _SQL_JACCARD_BODY.format(n=4, t=0.6)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (banded signatures → bucket join →
    exact-Jaccard verify). With full recall on the planted pairs the
    output equals the exact-Jaccard oracle.

    Note on the equality gate: LSH recall is probabilistic in general
    (16 bands × 4 rows ⇒ ~1.2% miss per pair at jaccard exactly 0.7),
    but every hash here is deterministic, so for the FIXED sf0.001/
    sf0.01 corpora the outcome is fixed and verified equal — the gate
    cannot flake round to round. On a new corpus a borderline pair
    could legitimately be missed; precision is always exact (verify
    step), so output ⊆ oracle by construction."""
    from beats_spark.operators.dedup import minhash_lsh_pairs

    docs = _load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, shingle_n=5, num_hashes=64, bands=16, threshold=0.7
    )


_SQL_DEDUP_MINHASH_LSH = _SQL_JACCARD_BODY.format(n=5, t=0.7)


def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data dedup flow composed end-to-end:
    MinHash-LSH candidate pairs → exact-Jaccard verify → connected
    components → canonical keeper per document. Every doc reports its
    cluster id (itself when unpaired) and whether it survives. The
    oracle recomputes the same thing from first principles: exact
    Jaccard pairs (equal to LSH output on the fixed corpora, see
    q_dedup_minhash_lsh's determinism note) closed transitively with a
    recursive CTE."""
    from beats_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    docs = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, shingle_n=5, num_hashes=64, bands=16, threshold=0.7
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    return docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id",
        F.coalesce(comp.component, F.col("doc_id"))
        .cast("long")
        .alias("cluster"),
        (F.coalesce(comp.component, F.col("doc_id")) == F.col("doc_id")).alias(
            "kept"
        ),
    )


_SQL_DEDUP_PIPELINE = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents)
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
          / len(list_distinct(a.grams || b.grams))::DOUBLE >= 0.7
), sym AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach AS (
  SELECT u AS node, u AS label FROM sym
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
), comp AS (
  SELECT node, min(label) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id)::BIGINT AS cluster,
       (COALESCE(c.component, d.doc_id) = d.doc_id) AS kept
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (xxhash64-based — no SQL oracle; driver
    rows-only check). Exact-duplicate injection guarantees hits."""
    from beats_spark.operators.dedup import simhash_pairs

    docs = _load(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") < 50).withColumn("doc_id", F.col("doc_id") + 1000000)
    return simhash_pairs(docs.unionByName(copies), max_hamming=3)


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs; cosine floored at 1e6 so the
    cross-engine float delta (~1e-12) cannot flip the value."""
    from beats_spark.operators.dedup import embedding_neardup_pairs

    emb = _load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, threshold=0.4)
    return pairs.select(
        "id_a", "id_b", F.floor(F.col("cosine") * 1000000).cast("long").alias("cos_micro")
    )


_SQL_EMBED_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000)::BIGINT AS cos_micro
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 20 query vectors
    (ids only — ranks are float-order-stable across engines because
    neighbor cosines are well separated; ties broken by id)."""
    from beats_spark.operators.similarity import cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(q, emb, k=5).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id"
    )


_SQL_KNN_BRUTEFORCE = """
SELECT query_id, rank, neighbor_id FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 20)
WHERE rank <= 5
"""


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k. Approximate vs brute force,
    but DETERMINISTIC: the oracle replicates the exact bucketing (the
    same ±1 hyperplanes, generated from similarity._plane_coef below)
    so spark-vs-oracle equality is exact."""
    from beats_spark.operators.similarity import lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return lsh_topk(q, emb, k=5, n_planes=8, multiprobe=1).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id"
    )


def _plane_sql(p: int, dim: int = 64, seed: int = 7) -> str:
    """The p-th Rademacher hyperplane as a DuckDB array literal —
    generated from the SAME _plane_coef the Spark operators use, so
    the oracle can never silently diverge if dim/seed change
    (embeddings are 64-dim in every sf dir; seed=7 is the operators'
    default)."""
    from beats_spark.operators.similarity import _plane_coef

    return "[" + ", ".join(str(_plane_coef(p, d, seed)) for d in range(dim)) + "]"


def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via the hyperplane-LSH SCALE path
    (n_planes>0: bucket-blocked candidates + exact cosine verify —
    the branch that survives 100 TB; the n_planes=0 exact mode of
    q_embed_neardup collects the corpus to the driver and exists only
    as small-scale ground truth). Deterministic oracle: DuckDB
    replicates the identical bucketing."""
    from beats_spark.operators.dedup import embedding_neardup_pairs

    emb = _load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, threshold=0.4, n_planes=4)
    return pairs.select(
        "id_a", "id_b", F.floor(F.col("cosine") * 1000000).cast("long").alias("cos_micro")
    )


_SQL_EMBED_NEARDUP_LSH = f"""
WITH cells AS (
  SELECT vec_id, embedding,
         ({" + ".join(
             f"CASE WHEN list_inner_product(embedding::DOUBLE[], {{pl{p}}}::DOUBLE[]) >= 0 "
             f"THEN {1 << p} ELSE 0 END"
             for p in range(4)
         )})::BIGINT AS bkt
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000)::BIGINT AS cos_micro
FROM cells a JOIN cells b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
""".format(**{f"pl{p}": _plane_sql(p) for p in range(4)})


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish) and md5 content
    fingerprint per document."""
    from beats_spark.operators import textstats

    docs = _load(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        textstats.token_count_whitespace(c).cast("long").alias("tokens_ws"),
        textstats.token_count_bpe_ish(c).cast("long").alias("tokens_bpe"),
        textstats.md5_fingerprint(c).alias("fingerprint"),
    )


_SQL_TEXT_STATS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS tokens_ws,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tokens_bpe,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction battery: plant deterministic emails / IPs / SSNs /
    phone numbers / card numbers into the documents text, then mask
    every category and count matches per category. The oracle replays
    the identical regex battery (written in the Java-regex ∩ RE2
    subset) and the redacted text must match byte-for-byte."""
    from beats_spark.operators.redact import add_pii_redaction

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" reach me at user"),
                    did.cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" from host 10."),
                    (did % 256).cast("string"),
                    F.lit(".0."),
                    ((did * 3) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(did % 11 == 0, F.lit(" ssn 123-45-6789 on file")).otherwise(
                F.lit("")
            ),
            F.when(did % 13 == 0, F.lit(" call 555-867-5309 today")).otherwise(
                F.lit("")
            ),
            F.when(
                did % 17 == 0, F.lit(" card 4111 1111 1111 1111 exp")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = add_pii_redaction(dirty, "text")
    return out.select(
        "doc_id",
        F.col("text").alias("redacted"),
        F.col("pii_email").cast("long").alias("n_email"),
        F.col("pii_card").cast("long").alias("n_card"),
        F.col("pii_ssn").cast("long").alias("n_ssn"),
        F.col("pii_phone").cast("long").alias("n_phone"),
        F.col("pii_ipv4").cast("long").alias("n_ipv4"),
        F.col("pii_total").cast("long").alias("n_total"),
    )


_SQL_REDACT_PII = """
WITH dirty AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789 on file' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309 today' ELSE '' END
         || CASE WHEN doc_id % 17 = 0 THEN ' card 4111 1111 1111 1111 exp' ELSE '' END
         AS text
  FROM documents
)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b', '<CARD>', 'g'),
    '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
    '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS redacted,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email,
  len(regexp_extract_all(text, '\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b'))::BIGINT AS n_card,
  len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b'))::BIGINT AS n_ssn,
  len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'))::BIGINT AS n_phone,
  len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ipv4,
  (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
   + len(regexp_extract_all(text, '\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b'))
   + len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b'))
   + len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'))
   + len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')))::BIGINT AS n_total
FROM dirty
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID v2 (script routing over 11 unique-script languages
    + a 16-language Latin stopword battery, ~27 codes incl. 'und'):
    predicted language counts and agreement with the labeled lang
    column. The oracle SQL below is GENERATED from the same
    script-range/marker tables (textstats.lang_id_sql_parts), so the
    engines cannot drift."""
    from beats_spark.operators import textstats

    docs = _load(spark, sf_dir, "documents")
    pred = textstats.lang_id(F.col("text"))
    return (
        docs.withColumn("pred", pred)
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("pred") == F.col("lang"), 1).otherwise(0)).alias("correct"),
        )
    )


def _sql_lang_id() -> str:
    from beats_spark.operators.textstats import lang_id_sql_parts

    select_list, pred = lang_id_sql_parts("text")
    return f"""
WITH scores AS (
  SELECT doc_id, lang, text,
         {select_list}
  FROM documents
), preds AS (
  SELECT lang, {pred} AS pred
  FROM scores)
SELECT pred, count(*) AS n,
       sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)::BIGINT AS correct
FROM preds GROUP BY pred
"""


_SQL_LANG_ID = _sql_lang_id()


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring rubric; score emitted at 1e3 integer scale
    (identical IEEE op sequence both engines, floor is safe)."""
    from beats_spark.operators import textstats

    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.floor(textstats.quality_score(F.col("text")) * 1000).cast("long").alias("q_milli"),
    )


_SQL_QUALITY_SCORE = """
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text),
           '\\b(the|and|of|to|is|that|for|with|a|in|it|on|as|at|be|by)\\b')) AS n_stop
  FROM documents
), r AS (
  SELECT doc_id,
         CASE WHEN n_words BETWEEN 10 AND 10000 THEN 30.0 ELSE 0.0 END AS length_ok,
         CASE WHEN n_chars::DOUBLE / greatest(n_words, 1)::DOUBLE BETWEEN 2.0 AND 12.0
              THEN 20.0 ELSE 0.0 END AS word_len_ok,
         least(n_stop::DOUBLE / greatest(n_words, 1)::DOUBLE * 100.0, 30.0) AS stop_c,
         least(n_punct::DOUBLE / greatest(n_chars, 1)::DOUBLE * 100.0, 10.0) AS punct_p,
         least(n_digit::DOUBLE / greatest(n_chars, 1)::DOUBLE * 100.0, 10.0) AS digit_p
  FROM m)
SELECT doc_id,
       floor(greatest(least(length_ok + word_len_ok + stop_c + 20.0 - punct_p - digit_p,
                            100.0), 0.0) * 1000)::BIGINT AS q_milli
FROM r
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition battery (operators/textstats.py:
    add_repetition_stats): duplicate-line fractions (expression-only)
    plus top-2/3-gram cover and duplicate-5-gram character fraction
    (explode → two keyed aggregations → join back). Fixtures plant
    multi-line duplicate docs and periodic text since the corpus has no
    newlines. All outputs are IEEE-exact int/int divisions with
    least/coalesce caps — portable raw doubles."""
    from beats_spark.operators.textstats import add_repetition_stats

    docs = _load(spark, sf_dir, "documents")
    planted = spark.createDataFrame(
        [
            (9000001, "aaa bbb\naaa bbb\nccc ddd", "xx", "planted", 23),
            (9000002, "x y z x y z x y z x y z x y z", "xx", "planted", 29),
            (9000003, "spam ham spam ham spam ham spam ham spam ham", "xx", "planted", 44),
            (9000004, "lines\nare\nall\ndistinct\nhere", "xx", "planted", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    uni = docs.unionByName(planted)
    return add_repetition_stats(uni).select(
        "doc_id",
        "dup_line_frac",
        "dup_line_char_frac",
        "top2gram_cover_frac",
        "top3gram_cover_frac",
        "dup5gram_char_frac",
    )


_SQL_REPETITION_STATS = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT 9000001, 'aaa bbb' || chr(10) || 'aaa bbb' || chr(10) || 'ccc ddd'
  UNION ALL SELECT 9000002, 'x y z x y z x y z x y z x y z'
  UNION ALL SELECT 9000003, 'spam ham spam ham spam ham spam ham spam ham'
  UNION ALL SELECT 9000004, 'lines' || chr(10) || 'are' || chr(10) || 'all' || chr(10) || 'distinct' || chr(10) || 'here'
),
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM base),
toks AS (SELECT doc_id, string_split_regex(t, ' ') AS toks FROM norm),
grams AS (
  SELECT doc_id, 2 AS n, unnest(list_transform(
    range(0, greatest(len(toks) - 2, 0) + 1),
    i -> array_to_string(toks[i + 1 : i + 2], ' '))) AS g FROM toks
  UNION ALL
  SELECT doc_id, 3 AS n, unnest(list_transform(
    range(0, greatest(len(toks) - 3, 0) + 1),
    i -> array_to_string(toks[i + 1 : i + 3], ' '))) AS g FROM toks
  UNION ALL
  SELECT doc_id, 5 AS n, unnest(list_transform(
    range(0, greatest(len(toks) - 5, 0) + 1),
    i -> array_to_string(toks[i + 1 : i + 5], ' '))) AS g FROM toks
),
cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g),
gagg AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN c * length(g) END) AS top2,
         max(CASE WHEN n = 3 THEN c * length(g) END) AS top3,
         sum(CASE WHEN n = 5 AND c > 1 THEN c * length(g) ELSE 0 END) AS dup5
  FROM cnt GROUP BY doc_id),
lines AS (
  SELECT doc_id, trim(l) AS l
  FROM base, unnest(string_split(text, chr(10))) AS u(l)
  WHERE trim(l) <> ''),
lc AS (SELECT doc_id, l, count(*) AS c FROM lines GROUP BY doc_id, l),
lagg AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         count(*) AS n_distinct,
         sum(c * length(l)) AS total_ch,
         sum(CASE WHEN c > 1 THEN c * length(l) ELSE 0 END) AS dup_ch
  FROM lc GROUP BY doc_id)
SELECT n.doc_id,
       coalesce((la.n_lines - la.n_distinct)::DOUBLE
                / greatest(la.n_lines, 1)::DOUBLE, 0.0) AS dup_line_frac,
       coalesce(la.dup_ch::DOUBLE
                / greatest(la.total_ch, 1)::DOUBLE, 0.0) AS dup_line_char_frac,
       least(coalesce(g.top2, 0)::DOUBLE
             / greatest(length(n.t), 1)::DOUBLE, 1.0) AS top2gram_cover_frac,
       least(coalesce(g.top3, 0)::DOUBLE
             / greatest(length(n.t), 1)::DOUBLE, 1.0) AS top3gram_cover_frac,
       least(coalesce(g.dup5, 0)::DOUBLE
             / greatest(length(n.t), 1)::DOUBLE, 1.0) AS dup5gram_char_frac
FROM norm n
LEFT JOIN gagg g USING (doc_id)
LEFT JOIN lagg la USING (doc_id)
"""


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window fingerprint contamination check: pairs of docs
    sharing ≥1 aligned 32-char window (injected copies guarantee
    matches); md5 is engine-portable."""
    from beats_spark.operators.textstats import rolling_fingerprints

    docs = _load(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") < 30).withColumn("doc_id", F.col("doc_id") + 1000000)
    uni = docs.unionByName(copies)
    fp = uni.select(
        "doc_id", F.explode(rolling_fingerprints(F.col("text"))).alias("fp")
    ).dropDuplicates(["doc_id", "fp"])
    a = fp.select(F.col("doc_id").alias("id_a"), "fp")
    b = fp.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )


_SQL_ROLLING_FINGERPRINT = """
WITH uni AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 30
), fps AS (
  SELECT DISTINCT doc_id,
         md5(substr(text, s, 32)) AS fp
  FROM uni, unnest(range(1, greatest(length(text) - 32 + 1, 1) + 1, 16)) AS t(s)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_windows
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents → opaque binary payloads with a
    cycled magic prefix; JVM-side mime sniff + size + sha256 (the
    blobs never reach Python)."""
    from beats_spark.operators.multimodal import media_metadata

    docs = _load(spark, sf_dir, "documents")
    magics = [
        bytes.fromhex("89504e470d0a1a0a"),
        bytes.fromhex("ffd8ff"),
        b"GIF8",
        b"RIFF",
    ]
    content = F.encode(F.col("text"), "UTF-8")
    for i, m in enumerate(magics):
        content = F.when(
            F.col("doc_id") % 4 == i, F.concat(F.lit(bytearray(m)), F.encode(F.col("text"), "UTF-8"))
        ).otherwise(content)
    med = docs.select(
        F.col("doc_id").alias("media_id"), content.alias("content"), F.col("text")
    )
    # sha over the utf-8 text payload (binary→string cast would mangle
    # the non-UTF8 magic bytes differently per engine)
    return media_metadata(med).select(
        "media_id", "mime", "n_bytes", F.sha2(F.col("text"), 256).alias("sha")
    )


_SQL_MULTIMODAL_META = """
WITH med AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 4
           WHEN 0 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB || encode(text)
           WHEN 1 THEN '\\xFF\\xD8\\xFF'::BLOB || encode(text)
           WHEN 2 THEN encode('GIF8' || text)
           ELSE encode('RIFF' || text) END AS content,
         CASE doc_id % 4
           WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
           WHEN 2 THEN 'image/gif' ELSE 'audio/wav' END AS mime,
         text
  FROM documents)
SELECT media_id, mime, octet_length(content)::BIGINT AS n_bytes,
       sha256(text) AS sha
FROM med
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (byte
    histogram, Arrow-batched). No SQL oracle — driver rows-only check
    verifies plumbing/row count."""
    from beats_spark.operators.multimodal import byte_histogram

    docs = _load(spark, sf_dir, "documents")
    med = docs.select(
        F.col("doc_id").alias("media_id"), F.encode(F.col("text"), "UTF-8").alias("content")
    )
    hist = byte_histogram(med, n_bins=8)
    return hist.select(
        "media_id", F.aggregate("hist", F.lit(0).cast("long"), lambda a, x: a + x).alias("total_bytes")
    )




def q_pipeline_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed-ROW equality (not just counts): every event's parsed
    fields + assigned sink, row by row — the north rule's
    "routed-row sets match" check."""
    from beats_spark.operators.base import build_chain
    from beats_spark.plans.router import META_SINK, route
    from beats_spark.plans.sinks import redirect_dead_letters

    raw = _raw_lines(spark, sf_dir)
    chain = build_chain(
        [
            {"dissect": {"tokenizer": _DISSECT_TOK, "field": "text", "target_prefix": ""}},
            {
                "enrich_lookup": {
                    "key_field": "level",
                    "target_field": "channel",
                    "mapping": {
                        "error": "alerts",
                        "warn": "alerts",
                        "info": "standard",
                        "debug": "diagnostics",
                    },
                    "default": "other",
                }
            },
        ]
    )
    df = chain(raw)
    df = route(
        df,
        rules=[
            {"when": {"equals": {"level": "error"}}, "index": "errors"},
            {"when": {"range": {"uid": {"gte": 40}}}, "index": "power-%{[channel]}"},
            {"index": "%{[level]}", "mappings": {"info": "standard"}, "default": "bulk"},
        ],
        default="main",
    )
    df = redirect_dead_letters(df)
    return df.select(
        "event_id",
        F.col("level"),
        F.col("uid"),
        F.col("message"),
        F.col("channel"),
        F.col(META_SINK).alias("sink"),
    )


_SQL_PIPELINE_ROWS = f"""
WITH base AS (
  SELECT event_id, user_id, {_LEVEL_SQL} AS lvl, {_MALFORMED_SQL} AS malformed,
         {_CONVBAD_SQL} AS convbad, event_type
  FROM events
), parsed AS (
  SELECT event_id,
         CASE WHEN malformed THEN NULL ELSE lvl END AS level,
         CASE WHEN malformed OR convbad THEN NULL ELSE user_id END AS uid,
         CASE WHEN malformed THEN NULL ELSE event_type END AS message,
         CASE WHEN malformed THEN 'other' ELSE
           CASE lvl WHEN 'error' THEN 'alerts' WHEN 'warn' THEN 'alerts'
                WHEN 'info' THEN 'standard' ELSE 'diagnostics' END END AS channel,
         malformed
  FROM base)
SELECT event_id, level, uid, message, channel,
       CASE WHEN malformed THEN '_dlq'
            WHEN level = 'error' THEN 'errors'
            WHEN uid >= 40 THEN 'power-' || channel
            WHEN level = 'info' THEN 'standard'
            ELSE 'bulk' END AS sink
FROM parsed
"""


def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate_limit processor (batch form): first 2 events per user per
    day in stable (ts, event_id) order survive."""
    _utc(spark)
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    chain = build_chain(
        [
            {
                "rate_limit": {
                    "limit": 2,
                    "fields": ["user_id"],
                    "period": "1 day",
                    "ts_field": "ts",
                    "order_by": ["ts", "event_id"],
                }
            }
        ]
    )
    return chain(ev).select("event_id", "user_id")


_SQL_RATE_LIMIT = """
SELECT event_id, user_id FROM (
  SELECT event_id, user_id,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('day', ts)
           ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn <= 2
"""




def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_tags + append + include_fields: array building/dedup and
    whitelist projection (arrays rendered as sorted CSV for the
    cross-engine hash)."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    chain = build_chain(
        [
            {"add_tags": {"tags": ["prod", "beats"]}},
            {
                "append": {
                    "target_field": "tags",
                    "fields": ["event_type"],
                    "values": ["extra"],
                    "allow_duplicate": False,
                }
            },
            {"include_fields": {"fields": ["event_id", "tags"]}},
        ]
    )
    out = chain(ev)
    return out.select(
        "event_id",
        F.array_join(F.array_sort("tags"), ",").alias("tags_csv"),
    )


_SQL_ARRAY_OPS = """
SELECT event_id,
       array_to_string(list_sort(['prod', 'beats', event_type, 'extra']), ',') AS tags_csv
FROM events
"""


def q_domain_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """registered_domain (eTLD+1) + add_network_direction + script(sql)
    over synthesized hostnames/flows."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events").withColumns(
        {
            "domain": F.concat(
                F.lit("svc"),
                (F.col("event_id") % 5).cast("string"),
                F.lit(".example."),
                F.when(F.col("user_id") % 2 == 0, "co.uk").otherwise("com"),
            ),
            "source_ip": F.format_string(
                "%d.0.0.%d",
                F.when(F.col("user_id") % 2 == 0, 10).otherwise(8),
                (F.col("event_id") % 200 + 1).cast("int"),
            ),
            "destination_ip": F.format_string(
                "%d.0.0.%d",
                F.when(F.col("event_id") % 2 == 0, 10).otherwise(9),
                (F.col("user_id") % 200 + 1).cast("int"),
            ),
        }
    )
    chain = build_chain(
        [
            {"registered_domain": {"field": "domain", "target_field": "rdomain"}},
            {
                "add_network_direction": {
                    "source": "source_ip",
                    "destination": "destination_ip",
                    "internal_networks": ["10.0.0.0/8"],
                }
            },
            {"script": {"lang": "sql", "columns": {"uid2": "user_id * 2"}}},
        ]
    )
    return chain(ev).select("event_id", "rdomain", "network_direction", "uid2")


_SQL_DOMAIN_DIRECTION = """
SELECT event_id,
       CASE WHEN user_id % 2 = 0 THEN 'example.co.uk' ELSE 'example.com' END AS rdomain,
       CASE
         WHEN user_id % 2 = 0 AND event_id % 2 = 0 THEN 'internal'
         WHEN user_id % 2 = 0 THEN 'outbound'
         WHEN event_id % 2 = 0 THEN 'inbound'
         ELSE 'external'
       END AS network_direction,
       user_id * 2 AS uid2
FROM events
"""




def q_community_id_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """community_id over a DIRTY flow table: IPv6 literals, hostnames,
    garbage ports and out-of-range ports are all present. The flow hash
    must be NULL for those rows (communityid.go:107-121 leaves the
    event untouched) and the job must not abort under ANSI. The hash
    VALUE itself is golden-tested against the reference's flowhash
    corpus (tests/test_netsec.py); this oracle checks the
    validity/ordering logic, which DuckDB can replicate in integer
    math (sha1-over-binary is not portable to the oracle engine)."""
    from beats_spark.functions.conditions import _ip_to_long
    from beats_spark.operators.base import build_chain

    eid, uid = F.col("event_id"), F.col("user_id")
    a = (uid % 250).cast("int")
    b = (eid % 250).cast("int")
    ev = _load(spark, sf_dir, "events").withColumns(
        {
            "source_ip": F.when(eid % 11 == 0, F.lit("2001:db8::1"))
            .when(eid % 23 == 0, F.format_string("host%d", uid))
            .when(uid % 2 == 0, F.format_string("10.0.%d.%d", a, b))
            .otherwise(F.format_string("203.0.%d.%d", b, a)),
            "destination_ip": F.format_string("192.168.%d.%d", b, a),
            "source_port": F.when(eid % 29 == 0, F.lit("p80")).otherwise(
                ((uid * 701) % 70000).cast("string")
            ),
            "destination_port": F.lit(443).cast("int").cast("string"),
            "transport_protocol": F.when(eid % 2 == 0, F.lit("tcp")).otherwise(F.lit("17")),
        }
    )
    chain = build_chain([{"community_id": {}}])
    out = chain(ev)
    a_key = _ip_to_long(F.col("source_ip")) * F.lit(65536) + F.col("source_port").try_cast(
        "long"
    )
    b_key = _ip_to_long(F.col("destination_ip")) * F.lit(65536) + F.lit(443)
    return out.select(
        "event_id",
        F.col("community_id").isNotNull().alias("cid_ok"),
        F.coalesce(a_key > b_key, F.lit(False)).alias("flipped"),
    )


_SQL_COMMUNITY_ID_DIRTY = """
WITH f AS (
  SELECT event_id,
         event_id % 11 = 0 AS v6,
         (event_id % 23 = 0 AND event_id % 11 <> 0) AS hostlike,
         event_id % 29 = 0 AS badport,
         user_id % 250 AS a, event_id % 250 AS b,
         (user_id * 701) % 70000 AS sp,
         user_id % 2 = 0 AS ten_net
  FROM events),
keys AS (
  SELECT event_id, v6, hostlike, badport, sp,
         CASE WHEN v6 OR hostlike OR badport THEN NULL
              WHEN ten_net THEN (10::BIGINT*16777216 + a*256 + b) * 65536 + sp
              ELSE (203::BIGINT*16777216 + b*256 + a) * 65536 + sp END AS a_key,
         (192::BIGINT*16777216 + 168*65536 + b*256 + a) * 65536 + 443 AS b_key
  FROM f)
SELECT event_id,
       NOT (v6 OR hostlike OR badport) AND sp <= 65535 AS cid_ok,
       COALESCE(a_key > b_key, FALSE) AS flipped
FROM keys
"""


_JS_SOURCE = """
function process(event) {
  var u = event.Get("user_id");
  event.Put("uid2", u * 2);
  event.Put("kind", event.Get("event_type").toUpperCase());
  event.Put("label", "u:" + u);
  if (u % 7 == 0) { event.Tag("lucky"); }
  else { event.Put("kind", event.Get("kind").toLowerCase()); }
  if (event.Get("event_type") == "view" && u % 2 == 1) { event.Cancel(); }
  event.Put("big", event.Get("value") > 10 ? "yes" : "no");
  return event;
}
"""


def q_script_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """script processor, lang=javascript: the reference's process()
    grammar (Put/Get/Tag/Cancel, var, if/else, ternary, string ops)
    transpiled to Catalyst at plan build — no JS engine, whole-stage
    codegen. The oracle recomputes the same semantics in SQL."""
    from beats_spark.operators.base import build_chain

    ev = _load(spark, sf_dir, "events")
    chain = build_chain([{"script": {"lang": "javascript", "source": _JS_SOURCE}}])
    out = chain(ev)
    return out.select(
        "event_id",
        "uid2",
        "kind",
        "label",
        "big",
        F.array_contains(
            F.coalesce(F.col("flags"), F.array().cast("array<string>")), "lucky"
        ).alias("lucky"),
    )


_SQL_SCRIPT_JS = """
SELECT event_id,
       user_id * 2 AS uid2,
       CASE WHEN user_id % 7 = 0 THEN upper(event_type) ELSE lower(upper(event_type)) END AS kind,
       'u:' || user_id::VARCHAR AS label,
       CASE WHEN value > 10 THEN 'yes' ELSE 'no' END AS big,
       user_id % 7 = 0 AS lucky
FROM events
WHERE NOT (event_type = 'view' AND user_id % 2 = 1)
"""


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (trained coarse quantizer; approximate —
    no SQL oracle, driver rows-only check)."""
    from beats_spark.operators.similarity import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return ivf_topk(q, emb, k=5, n_cells=8, nprobe=4).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id"
    )




def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 with exact rerank (similarity.
    pq_topk) — the memory-compression ANN leg (codes are 32× smaller
    than the vectors; the scan reads codes + per-query LUTs). Trained
    float codebooks ⇒ rows-only by design, like knn_ivf; quality is
    gated in-suite by recall@5 = 1.0 vs knn_bruteforce on this corpus
    (tests/test_dedup_similarity.py::test_pq_recall_vs_bruteforce)."""
    from beats_spark.operators.similarity import pq_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return pq_topk(q, emb, k=5, m=16, ksub=32, shortlist=100).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id"
    )


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-assignment stage, integer-decidable: fixed equal-norm
    ±1 centroids (pure function of (cell,dim,seed), like the LSH
    planes), vectors quantized floor(x*1e6), argmax of exact int64
    dot products, ties to the lowest cell. The trained end-to-end IVF
    (q_knn_ivf) stays rows-only + recall-gated; THIS row proves the
    assignment arithmetic against DuckDB exactly."""
    from beats_spark.operators.similarity import assign_cells_quantized, fixed_centroids

    emb = _load(spark, sf_dir, "embeddings")
    return assign_cells_quantized(emb, fixed_centroids(8, 64)).select(
        "vec_id", F.col("cell").cast("long").alias("cell")
    )


def _centroid_dot_sql(cent: list[int]) -> str:
    return " + ".join(
        ("" if c > 0 else "-") + f"qv[{d + 1}]" for d, c in enumerate(cent)
    )


def _sql_ivf_assign() -> str:
    from beats_spark.operators.similarity import fixed_centroids

    cells = fixed_centroids(8, 64)
    dots = "\nUNION ALL ".join(
        f"SELECT vec_id, {j} AS cell, ({_centroid_dot_sql(c)}) AS dot FROM q"
        for j, c in enumerate(cells)
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * 1000000)::BIGINT) AS qv
  FROM embeddings
), dots AS (
{dots}
)
SELECT vec_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell ASC) AS rn
  FROM dots)
WHERE rn = 1
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication removal (dedup.substring_dedup, the
    Lee et al. ExactSubstr method): 20-token grams occurring ≥2 times
    corpus-wide are cut from every occurrence but the first. Planted
    fixtures: 10 verbatim copies (their text collapses to almost
    nothing, the originals keep theirs) and 5 self-repeating chimeras
    (first-30-tokens twice → the second half vanishes). The oracle
    rebuilds the fixture AND the whole fingerprint→keeper→span→
    reassembly chain in SQL; cleaned text is byte-equal."""
    from beats_spark.operators.dedup import substring_dedup, tokens

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    s = F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 30))
    chimeras = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 25)).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(s, F.lit(" "), s).alias("text"),
    )
    corpus = docs.unionByName(copies).unionByName(chimeras)
    return substring_dedup(corpus, "text", "doc_id", n=20)


_SQL_SUBSTRING_DEDUP = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT doc_id + 3000000, s || ' ' || s FROM (
    SELECT doc_id,
           array_to_string(
             (string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))[1:30],
             ' ') AS s
    FROM documents WHERE doc_id >= 20 AND doc_id < 25)
), norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM corpus
), g AS (
  SELECT doc_id, u.i AS pos,
         md5(array_to_string(toks[u.i + 1 : u.i + 20], ' ')) AS gk
  FROM norm, unnest(range(0, len(toks) - 20 + 1)) AS u(i)
  WHERE len(toks) >= 20
), dup AS (
  SELECT gk, min(doc_id * 4294967296 + pos) AS keeper
  FROM g GROUP BY gk HAVING count(*) >= 2
), marked AS (
  SELECT g.doc_id, g.pos
  FROM g JOIN dup USING (gk)
  WHERE g.doc_id * 4294967296 + g.pos <> dup.keeper
), removed AS (
  SELECT DISTINCT doc_id, pos + u.i AS tidx
  FROM marked, unnest(range(0, 20)) AS u(i)
), te AS (
  SELECT doc_id, u.i AS tidx, toks[u.i + 1] AS tok
  FROM norm, unnest(range(0, len(toks))) AS u(i)
), kept AS (
  SELECT te.doc_id, te.tidx, te.tok
  FROM te LEFT JOIN removed r ON r.doc_id = te.doc_id AND r.tidx = te.tidx
  WHERE r.doc_id IS NULL
), reb AS (
  SELECT doc_id, count(*) AS n_kept,
         array_to_string(list(tok ORDER BY tidx), ' ') AS clean
  FROM kept GROUP BY doc_id
)
SELECT n.doc_id, len(n.toks)::BIGINT AS n_tokens,
       COALESCE(reb.n_kept, 0)::BIGINT AS n_kept,
       (len(n.toks) - COALESCE(reb.n_kept, 0))::BIGINT AS n_removed,
       COALESCE(reb.clean, '') AS text
FROM norm n LEFT JOIN reb USING (doc_id)
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (dedup.semantic_dedup_pairs):
    embeddings clustered into 8 fixed-centroid cells (the oracle-proven
    ivf_assign arithmetic), near-identical pairs pruned within each
    cell by the integer-exact quantized-cosine rule cos ≥ 19/20.
    Near-dups are PLANTED deterministically: vectors with vec_id < 40
    get a copy at id+1000000 with +0.125 (an exact power of two) added
    to dimension 0 — cosine ≈ 0.992 against the original on these
    unit-norm vectors, while every natural pair in the corpus sits
    below 0.6. The oracle replays the planting, the cell assignment,
    and the HUGEINT threshold rule from first principles."""
    from beats_spark.operators.dedup import semantic_dedup_pairs

    emb = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    as_double = emb.select("vec_id", dbl.alias("embedding"))
    v = F.col("embedding")
    perturbed = (
        as_double.filter(F.col("vec_id") < 40)
        .select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.concat(
                F.array(v[0] + F.lit(0.125)), F.slice(v, 2, 63)
            ).alias("embedding"),
        )
    )
    pairs = semantic_dedup_pairs(
        as_double.unionByName(perturbed), n_cells=8, threshold=(19, 20), dim=64
    )
    return pairs.select(
        "id_a", "id_b", F.col("cell").cast("long").alias("cell"), "dot_q"
    )


def _sql_semantic_dedup() -> str:
    from beats_spark.operators.similarity import fixed_centroids

    cells = fixed_centroids(8, 64)
    dots = "\nUNION ALL ".join(
        f"SELECT vec_id, {j} AS cell, ({_centroid_dot_sql(c)}) AS dot FROM q"
        for j, c in enumerate(cells)
    )
    return f"""
WITH planted AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_prepend(embedding[1]::DOUBLE + 0.125,
                      (embedding::DOUBLE[])[2:64])
  FROM embeddings WHERE vec_id < 40
), q AS (
  SELECT vec_id,
         list_transform(emb, x -> floor(x * 1000000)::BIGINT) AS qv
  FROM planted
), dots AS (
{dots}
), cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell ASC) AS rn
    FROM dots)
  WHERE rn = 1
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ca.cell,
         list_inner_product(a.qv::DOUBLE[], b.qv::DOUBLE[])::BIGINT AS dot_q,
         list_inner_product(a.qv::DOUBLE[], a.qv::DOUBLE[])::BIGINT AS na,
         list_inner_product(b.qv::DOUBLE[], b.qv::DOUBLE[])::BIGINT AS nb
  FROM q a
  JOIN cells ca ON ca.vec_id = a.vec_id
  JOIN cells cb ON cb.cell = ca.cell
  JOIN q b ON b.vec_id = cb.vec_id AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cell::BIGINT AS cell, dot_q
FROM scored
WHERE dot_q > 0
  AND dot_q::HUGEINT * dot_q::HUGEINT * 400 >= 361 * (na::HUGEINT * nb::HUGEINT)
"""


def q_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the md5-based 60-bit token hash —
    engine-portable, so the full signature+hamming computation has a
    SQL oracle (pigeonhole banding with n_tables = max_hamming+1 keeps
    recall total, making output = ALL pairs at hamming ≤ 3)."""
    from beats_spark.operators.dedup import simhash_pairs

    docs = _load(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") < 30).withColumn("doc_id", F.col("doc_id") + 1000000)
    pairs = simhash_pairs(
        docs.unionByName(copies), max_hamming=3, bits=60, n_tables=4, hash_fn="md5_60"
    )
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


_BITSUMS = ", ".join(f"sum(((h >> {j}) & 1)*2 - 1) AS b{j}" for j in range(60))
_SIGEXPR = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(60))

_SQL_DEDUP_SIMHASH_MD5 = f"""
WITH uni AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 30
), tok AS (
  SELECT doc_id, ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h
  FROM uni, unnest(string_split_regex(
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t(tok)
), sums AS (
  SELECT doc_id, {_BITSUMS} FROM tok GROUP BY doc_id
), sig AS (
  SELECT doc_id, ({_SIGEXPR})::BIGINT AS s FROM sums
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.s, b.s)::BIT)::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)::BIT) <= 3
"""




_MAGIC_HEX = ["89504e470d0a1a0a", "ffd8ff", "47494638", "52494646"]


def q_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-blob near-dup WITHOUT any decoder: the blob's hex rides
    through non-overlapping 4-byte grams into the md5-SimHash pipeline
    (dedup.simhash_pairs, the oracle-proven signature math) — the
    ingest-time "same media file, trivially-different bytes" dedup a
    multimodal pipeline runs before spending decode/feature compute.
    Fixture: documents bytes get the multimodal magic prefixes; blobs
    with doc_id < 25 also appear re-uploaded at id+1000000 with 4
    trailing junk bytes — at most two hex grams differ, so hamming
    stays small; ≤ 9 catches 24/25 planted re-uploads (the outlier is
    a very short blob where 2 of ~8 grams shift more bits — the
    documented short-payload recall limit) while unrelated blobs sit
    far apart. Content is built
    directly as hex (magic literal + hex(utf8 bytes)), byte-identical
    in both engines; the oracle replays gram split, 60-bit md5
    signature, and the exact hamming rule."""
    from beats_spark.operators.dedup import simhash_pairs

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    magic = F.element_at(
        F.array(*[F.lit(m) for m in _MAGIC_HEX]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    hx = F.concat(magic, F.lower(F.hex(F.encode(F.col("text"), "UTF-8"))))
    blobs = docs.select("doc_id", hx.alias("_hx"))
    copies = blobs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("_hx"), F.lit("65787472")).alias("_hx"),
    )
    uni = blobs.unionByName(copies)
    grams = F.expr(
        "concat_ws(' ', transform("
        "sequence(0, greatest(cast((length(_hx) + 7) / 8 as int) - 1, 0)), "
        "i -> substring(_hx, i * 8 + 1, 8)))"
    )
    pairs = simhash_pairs(
        uni.select("doc_id", grams.alias("text")),
        max_hamming=9,
        bits=60,
        n_tables=10,
        hash_fn="md5_60",
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


_SQL_MEDIA_NEARDUP = f"""
WITH blobs AS (
  SELECT doc_id,
         (['{_MAGIC_HEX[0]}', '{_MAGIC_HEX[1]}', '{_MAGIC_HEX[2]}', '{_MAGIC_HEX[3]}'])[(doc_id % 4 + 1)::INT]
           || lower(hex(text)) AS hx
  FROM documents
), uni AS (
  SELECT doc_id, hx FROM blobs
  UNION ALL
  SELECT doc_id + 1000000, hx || '65787472' FROM blobs WHERE doc_id < 25
), tok AS (
  SELECT doc_id, ('0x' || substr(md5(t.g), 1, 15))::BIGINT AS h
  FROM uni, unnest(list_transform(
    range(0, greatest((length(hx) + 7) // 8, 1)),
    i -> substr(hx, (i * 8 + 1)::INT, 8))) AS t(g)
), sums AS (
  SELECT doc_id, {{bitsums}} FROM tok GROUP BY doc_id
), sig AS (
  SELECT doc_id, ({{sigexpr}})::BIGINT AS s FROM sums
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.s, b.s)::BIT)::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)::BIT) <= 9
""".format(bitsums=_BITSUMS, sigexpr=_SIGEXPR)


_SQL_MEDIA_FEATURES = """
SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS total_bytes
FROM documents
"""

_SQL_KNN_LSH = f"""
WITH cells AS (
  SELECT vec_id, embedding,
         ({" + ".join(
             f"CASE WHEN list_inner_product(embedding::DOUBLE[], {{pl{p}}}::DOUBLE[]) >= 0 "
             f"THEN {1 << p} ELSE 0 END"
             for p in range(8)
         )})::BIGINT AS bkt
  FROM embeddings
), probes AS (
  SELECT vec_id AS query_id, embedding AS qv,
         unnest([bkt, {", ".join(f"xor(bkt::BIGINT, {1 << p}::BIGINT)" for p in range(8))}]) AS bkt
  FROM cells WHERE vec_id < 20
), cand AS (
  SELECT DISTINCT p.query_id, p.qv, c.vec_id AS neighbor_id, c.embedding AS cv
  FROM probes p JOIN cells c USING (bkt)
  WHERE p.query_id <> c.vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]) DESC,
                    neighbor_id ASC) AS rank
  FROM cand)
WHERE rank <= 5
""".format(**{f"pl{p}": _plane_sql(p) for p in range(8)})




def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the event stream: session index
    per user with a 30-minute inactivity gap."""
    from beats_spark.operators.sessions import sessionize

    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    out = sessionize(ev, "user_id", gap_minutes=30, order_cols=("event_id",))
    return out.select("event_id", "user_id", F.col("session_idx").cast("long").alias("session_idx"))


_SQL_SESSIONIZE = """
SELECT event_id, user_id,
       (sum(CASE WHEN prev_ts IS NULL
                 OR date_diff('microsecond', prev_ts, ts) > 1800000000
                 THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)::BIGINT AS session_idx
FROM (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events)
"""


def q_assemble_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn rows → training documents: per-user event texts joined in
    stable (ts, event_id) order — the transcript→corpus assembly."""
    from beats_spark.operators.sessions import assemble_documents

    ev = _load(spark, sf_dir, "events").withColumn(
        "line", F.format_string("%s@%d", F.col("event_type"), F.col("event_id"))
    )
    out = assemble_documents(
        ev, key_col="user_id", text_col="line", order_cols=("ts", "event_id"), sep=" | "
    )
    return out.select(
        F.col("user_id"), F.col("document"), F.col("n_turns").cast("long").alias("n_turns")
    )


_SQL_ASSEMBLE_DOCUMENTS = """
SELECT user_id,
       string_agg(COALESCE(event_type || '@' || event_id::VARCHAR, ''),
                  ' | ' ORDER BY ts, event_id) AS document,
       count(*)::BIGINT AS n_turns
FROM events GROUP BY user_id
"""


def q_transcript_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The turns-side end-to-end: raw event TURNS → per-user document
    assembly (stable (ts, id) order) → exact dedup (20 planted
    verbatim re-uploads at id+100000 collapse onto their originals) →
    GPT-style sequence packing. Together with ``corpus_build`` (the
    documents-side chain) this is the whole north-star path: transcript
    rows in, packed training manifest out. The oracle rebuilds all
    three stages in SQL — string_agg assembly, min-id-per-normalized-
    text dedup, md5-bucketed running-sum pack."""
    from beats_spark.operators.dedup import exact_dedup
    from beats_spark.operators.sampling import pack_sequences
    from beats_spark.operators.sessions import assemble_documents

    ev = _load(spark, sf_dir, "events").withColumn(
        "line", F.format_string("%s@%d", F.col("event_type"), F.col("event_id"))
    )
    docs = assemble_documents(
        ev, key_col="user_id", text_col="line", order_cols=("ts", "event_id"), sep=" | "
    ).select(F.col("user_id").alias("doc_id"), F.col("document").alias("text"))
    replays = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    deduped = exact_dedup(docs.unionByName(replays), "text", "doc_id")
    return pack_sequences(deduped, budget=128, n_buckets=16)


def q_transcript_corpus_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcript_corpus re-priced in subword tokens: the identical
    assembly → dedup chain, packed with token_counter="bpe"
    (functions/bpe.py). Rows-only by design — the BPE count is not
    SQL-expressible; the chain up to packing is the oracle-blessed
    ``transcript_corpus``, and the BPE layout itself is gated by the
    in-suite pure-Python twin (tests/test_bpe.py)."""
    from beats_spark.operators.dedup import exact_dedup
    from beats_spark.operators.sampling import pack_sequences
    from beats_spark.operators.sessions import assemble_documents

    ev = _load(spark, sf_dir, "events").withColumn(
        "line", F.format_string("%s@%d", F.col("event_type"), F.col("event_id"))
    )
    docs = assemble_documents(
        ev, key_col="user_id", text_col="line", order_cols=("ts", "event_id"), sep=" | "
    ).select(F.col("user_id").alias("doc_id"), F.col("document").alias("text"))
    replays = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    deduped = exact_dedup(docs.unionByName(replays), "text", "doc_id")
    return pack_sequences(deduped, budget=128, n_buckets=16, token_counter="bpe")


_SQL_TRANSCRIPT_CORPUS = r"""
WITH docs AS (
  SELECT user_id AS doc_id,
         string_agg(COALESCE(event_type || '@' || event_id::VARCHAR, ''),
                    ' | ' ORDER BY ts, event_id) AS text
  FROM events GROUP BY user_id
), uni AS (
  SELECT doc_id, text FROM docs
  UNION ALL
  SELECT doc_id + 100000, text FROM docs WHERE doc_id < 20
), keep AS (
  SELECT min(doc_id) AS doc_id
  FROM uni GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
), kept AS (
  SELECT uni.doc_id, uni.text FROM uni JOIN keep USING (doc_id)
), t AS (
  SELECT doc_id,
         ('0x' || substr(md5('s0|' || doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS bucket,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS tok_count
  FROM kept),
s AS (
  SELECT doc_id, bucket, tok_count,
         coalesce(sum(tok_count + 1) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
  FROM t)
SELECT doc_id, bucket::BIGINT AS bucket, tok_count::BIGINT AS tok_count, start_off,
       (start_off // 128)::BIGINT AS pack_first,
       ((start_off + greatest(tok_count, 1) - 1) // 128)::BIGINT AS pack_last
FROM s
"""


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-level dedup (web-crawl first pass).

    Plants deterministic dirty URLs over the documents table — scheme/
    host case noise, default ports, duplicate slashes, trailing
    slashes, shuffled query params, utm/fbclid trackers, fragments —
    where the *identity* (host number, path, surviving params) depends
    only on doc_id % 50, so every canonical URL recurs ~N/50 times.
    Canonicalizes (operators/urlnorm.py), then marks each row with its
    duplicate-group size and whether it is the keeper (lowest doc_id).
    A sprinkling of non-URL rows checks the NULL/tag path.

    The oracle replays both the fixture construction and the full
    canonicalization in DuckDB SQL and the canonical strings must
    match byte-for-byte. Plan: codegen projection + ONE hash shuffle
    (window over canonical_url)."""
    from beats_spark.operators.urlnorm import url_dedup

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    b = (did % 50).cast("string")
    https = (did % 50) % 2 == 1
    url = F.when(
        did % 97 == 0, F.concat(F.lit("bare text "), did.cast("string"))
    ).otherwise(
        F.concat(
            F.when(https, F.when(did % 2 == 0, "HTTPS").otherwise("https"))
            .otherwise(F.when(did % 2 == 0, "HTTP").otherwise("http")),
            F.lit("://"),
            F.when(did % 2 == 0, "CDN").otherwise("cdn"),
            b,
            F.when(did % 4 < 2, ".Example.COM").otherwise(".example.com"),
            F.when(
                did % 5 == 0, F.when(https, ":443").otherwise(":80")
            ).otherwise(""),
            F.when(
                did % 4 == 0, F.concat(F.lit("//data//set"), b, F.lit("/"))
            ).otherwise(F.concat(F.lit("/data/set"), b)),
            F.when(
                did % 2 == 0, F.concat(F.lit("?v="), b, F.lit("&lang=en"))
            ).otherwise(F.concat(F.lit("?lang=en&v="), b)),
            F.when(
                did % 3 == 0,
                F.concat(F.lit("&utm_source=feed"), did.cast("string")),
            ).otherwise(""),
            F.when(
                did % 7 == 0, F.concat(F.lit("&fbclid=x"), did.cast("string"))
            ).otherwise(""),
            F.when(
                did % 6 == 0, F.concat(F.lit("#sec"), did.cast("string"))
            ).otherwise(""),
        )
    )
    out = url_dedup(docs.select("doc_id", url.alias("url")), "url", "doc_id")
    return out.select(
        "doc_id",
        "url",
        "canonical_url",
        F.col("n_dupes").cast("long").alias("n_dupes"),
        "is_keeper",
    )


_SQL_URL_CANONICAL = r"""
WITH base AS (
  SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS b,
         (doc_id % 50) % 2 = 1 AS https
  FROM documents
), urls AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN 'bare text ' || CAST(doc_id AS VARCHAR)
    ELSE
      (CASE WHEN https THEN (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
            ELSE (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) END)
      || '://'
      || (CASE WHEN doc_id % 2 = 0 THEN 'CDN' ELSE 'cdn' END) || b
      || (CASE WHEN doc_id % 4 < 2 THEN '.Example.COM' ELSE '.example.com' END)
      || (CASE WHEN doc_id % 5 = 0 THEN (CASE WHEN https THEN ':443' ELSE ':80' END) ELSE '' END)
      || (CASE WHEN doc_id % 4 = 0 THEN '//data//set' || b || '/' ELSE '/data/set' || b END)
      || (CASE WHEN doc_id % 2 = 0 THEN '?v=' || b || '&lang=en' ELSE '?lang=en&v=' || b END)
      || (CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed' || CAST(doc_id AS VARCHAR) ELSE '' END)
      || (CASE WHEN doc_id % 7 = 0 THEN '&fbclid=x' || CAST(doc_id AS VARCHAR) ELSE '' END)
      || (CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id AS VARCHAR) ELSE '' END)
    END AS url
  FROM base
), parts AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth0,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS q0
  FROM urls
), norm AS (
  SELECT doc_id, url, scheme,
    CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
         WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
         WHEN scheme = 'ftp' THEN regexp_replace(auth0, ':21$', '')
         WHEN scheme = 'ws' THEN regexp_replace(auth0, ':80$', '')
         WHEN scheme = 'wss' THEN regexp_replace(auth0, ':443$', '')
         ELSE auth0 END AS auth,
    CASE WHEN regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'), '/$', '') = ''
         THEN '/'
         ELSE regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'), '/$', '') END AS path,
    COALESCE(array_to_string(list_sort(list_filter(string_split(q0, '&'),
        p -> p <> '' AND NOT regexp_matches(lower(p),
          '^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|yclid|igshid|mc_cid|mc_eid)='))), '&'),
      '') AS q
  FROM parts
), canon AS (
  SELECT doc_id, url,
    CASE WHEN scheme = '' THEN NULL
         ELSE scheme || '://' || auth || path
              || CASE WHEN q = '' THEN '' ELSE '?' || q END
    END AS canonical_url
  FROM norm
)
SELECT doc_id, url, canonical_url,
  (CASE WHEN canonical_url IS NULL THEN 1
        ELSE count(*) OVER (PARTITION BY canonical_url) END)::BIGINT AS n_dupes,
  CASE WHEN canonical_url IS NULL THEN TRUE
       ELSE doc_id = min(doc_id) OVER (PARTITION BY canonical_url) END AS is_keeper
FROM canon
"""


def _planted_html(did, text):
    """Deterministic messy-HTML wrapper shared by the html queries:
    chrome (title/style/script/nav), residue-gated ad + entity blocks,
    unique article body, repeated footer."""
    return F.concat(
        F.lit("<html><head><title>Example Site</title>"),
        F.lit("<style>body{margin:0;color:#333}</style>"),
        F.lit('<script>track("'), did.cast("string"), F.lit('");</script>'),
        F.lit("</head><body>"),
        F.lit("<nav><ul><li>Home</li><li>About</li><li>Contact</li></ul></nav>"),
        F.when(did % 3 == 0,
               F.lit('<div class="ad">SUBSCRIBE to our newsletter today</div>')
               ).otherwise(""),
        F.lit("<article><h1>Post "), did.cast("string"), F.lit("</h1><p>"),
        text, F.lit("</p>"),
        F.when(did % 4 == 0,
               F.lit("<p>extra &amp; entities &lt;here&gt; &quot;q&quot;</p>")
               ).otherwise(""),
        F.when(did % 7 == 0, F.lit("<!-- hidden comment --><b>bold</b> tail")
               ).otherwise(""),
        F.lit("</article>"),
        F.lit("<footer>(c) 2024 Example Corp | Cookie Policy</footer>"),
        F.lit("</body></html>"),
    )


_SQL_PLANTED_HTML = """
  '<html><head><title>Example Site</title>'
  || '<style>body{margin:0;color:#333}</style>'
  || '<script>track("' || CAST(doc_id AS VARCHAR) || '");</script>'
  || '</head><body>'
  || '<nav><ul><li>Home</li><li>About</li><li>Contact</li></ul></nav>'
  || (CASE WHEN doc_id % 3 = 0 THEN '<div class="ad">SUBSCRIBE to our newsletter today</div>' ELSE '' END)
  || '<article><h1>Post ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
  || text || '</p>'
  || (CASE WHEN doc_id % 4 = 0 THEN '<p>extra &amp; entities &lt;here&gt; &quot;q&quot;</p>' ELSE '' END)
  || (CASE WHEN doc_id % 7 = 0 THEN '<!-- hidden comment --><b>bold</b> tail' ELSE '' END)
  || '</article>'
  || '<footer>(c) 2024 Example Corp | Cookie Policy</footer>'
  || '</body></html>'
"""


def q_extract_html_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (operators/html.py): script/style/comment
    drop, block-element line breaks, tag strip, entity decode,
    whitespace normalization — the crawl front door. Deterministic
    messy-HTML fixtures wrap every document; the oracle replays the
    identical regex battery (html_steps_sql keeps the two in lockstep)
    so extracted text must match byte-for-byte."""
    from beats_spark.operators.html import extract_html_text
    from beats_spark.operators.scale import spread

    # single parquet file = one scan partition (CLAUDE.md): spread the
    # small fixture scan before the regex-heavy projection. At real
    # scale the scan is already wide and spread() is a no-op.
    docs = spread(_load(spark, sf_dir, "documents"))
    planted = docs.select(
        "doc_id", _planted_html(F.col("doc_id"), F.col("text")).alias("html")
    )
    out = extract_html_text(planted, "html", "text_out")
    return out.select(
        "doc_id",
        "text_out",
        F.length("text_out").cast("long").alias("n_chars"),
        (F.size(F.split(F.col("text_out"), "\n"))).cast("long").alias("n_lines"),
    )


def _sql_extract_html() -> str:
    from beats_spark.operators.html import html_steps_sql

    return f"""
WITH planted AS (
  SELECT doc_id, {_SQL_PLANTED_HTML} AS html FROM documents
)
SELECT doc_id,
       {html_steps_sql('html')} AS text_out,
       length({html_steps_sql('html')})::BIGINT AS n_chars,
       len(string_split({html_steps_sql('html')}, chr(10)))::BIGINT AS n_lines
FROM planted
"""


def q_html_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl front door: HTML extraction feeding the
    CCNet boilerplate line pass (line_level_dedup) — site chrome
    (title, nav items, ads, footer) appears trimmed-identical across
    documents and is removed; each article's unique lines survive in
    order. The oracle replays extraction AND the line pass (md5 line
    keys, distinct-doc frequency, ordered reassembly)."""
    from beats_spark.operators.dedup import line_level_dedup
    from beats_spark.operators.html import extract_html_text
    from beats_spark.operators.scale import spread

    docs = spread(_load(spark, sf_dir, "documents"))
    planted = docs.select(
        "doc_id", _planted_html(F.col("doc_id"), F.col("text")).alias("html")
    )
    extracted = extract_html_text(planted, "html", "text").select("doc_id", "text")
    return line_level_dedup(extracted, min_docs=2)


def _sql_html_corpus() -> str:
    from beats_spark.operators.html import html_steps_sql

    return f"""
WITH planted AS (
  SELECT doc_id, {_SQL_PLANTED_HTML} AS html FROM documents
), docs2 AS (
  SELECT doc_id, {html_steps_sql('html')} AS text FROM planted
), lines AS (
  SELECT doc_id, u.s.pos AS pos, u.s.line AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2),
       unnest(list_transform(range(1, len(l) + 1), i -> {{'pos': i, 'line': l[i]}})) AS u(s)
), keyed AS (
  SELECT doc_id, pos, line, md5(trim(line)) AS lk FROM lines
), boiler AS (
  SELECT lk FROM (
    SELECT lk, count(DISTINCT doc_id) AS n_docs
    FROM keyed WHERE trim(line) <> '' GROUP BY lk
  ) WHERE n_docs >= 2
), kept AS (
  SELECT * FROM keyed WHERE lk NOT IN (SELECT lk FROM boiler)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, len(string_split(text, chr(10)))::BIGINT AS n_lines FROM docs2
)
SELECT t.doc_id,
       COALESCE(r.clean, '') AS text,
       t.n_lines,
       COALESCE(r.n_kept, 0)::BIGINT AS n_kept,
       (t.n_lines - COALESCE(r.n_kept, 0))::BIGINT AS n_removed
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity boilerplate pass (line_level_dedup
    unit="paragraph"): blank-line-separated blocks dedup as units —
    a verbatim multi-line license block repeated across docs is
    removed whole, while each doc's unique paragraphs survive in
    order. The oracle replays the regex split, md5 block keys,
    distinct-doc frequency, and the double-newline reassembly."""
    from beats_spark.operators.dedup import line_level_dedup

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.when(did % 3 == 0,
                   F.lit("LICENSE v1\nAll rights reserved\n\n")).otherwise(""),
            F.lit("body "), did.cast("string"), F.lit(":\n"), F.col("text"),
            F.when(did % 4 == 0,
                   F.lit("\n\nFOOTER\nnav | links | here")).otherwise(""),
        ).alias("text"),
    )
    return line_level_dedup(planted, min_docs=2, unit="paragraph")


_SQL_PARAGRAPH_DEDUP = r"""
WITH docs2 AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'LICENSE v1' || chr(10) || 'All rights reserved' || chr(10) || chr(10) ELSE '' END)
    || 'body ' || CAST(doc_id AS VARCHAR) || ':' || chr(10) || text
    || (CASE WHEN doc_id % 4 = 0 THEN chr(10) || chr(10) || 'FOOTER' || chr(10) || 'nav | links | here' ELSE '' END)
    AS text
  FROM documents
), lines AS (
  SELECT doc_id, u.s.pos AS pos, u.s.line AS line
  FROM (SELECT doc_id, string_split_regex(text, '\n{2,}') AS l FROM docs2),
       unnest(list_transform(range(1, len(l) + 1), i -> {'pos': i, 'line': l[i]})) AS u(s)
), keyed AS (
  SELECT doc_id, pos, line, md5(trim(line)) AS lk FROM lines
), boiler AS (
  SELECT lk FROM (
    SELECT lk, count(DISTINCT doc_id) AS n_docs
    FROM keyed WHERE trim(line) <> '' GROUP BY lk
  ) WHERE n_docs >= 2
), kept AS (
  SELECT * FROM keyed WHERE lk NOT IN (SELECT lk FROM boiler)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) || chr(10) ORDER BY pos) AS clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, len(string_split_regex(text, '\n{2,}'))::BIGINT AS n_lines FROM docs2
)
SELECT t.doc_id,
       COALESCE(r.clean, '') AS text,
       t.n_lines,
       COALESCE(r.n_kept, 0)::BIGINT AS n_kept,
       (t.n_lines - COALESCE(r.n_kept, 0))::BIGINT AS n_removed
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus line-level dedup (CCNet/RefinedWeb boilerplate
    pass): plants newsletter/cookie/copyright boilerplate lines across
    deterministic subsets of the documents (one variant with trailing
    spaces to prove trim-identical matching), plus a per-doc unique
    line, then removes every line present in ≥2 distinct docs and
    reassembles the survivors in order. Blank lines are preserved.
    The oracle replays the construction, the md5 line keys, the
    distinct-doc frequency count, and the ordered reassembly; cleaned
    text must match byte-for-byte."""
    from beats_spark.operators.dedup import line_level_dedup

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.when(
                did % 3 == 0, F.lit("SUBSCRIBE to our newsletter today\n")
            ).otherwise(""),
            F.lit("doc "),
            did.cast("string"),
            F.lit(" unique: "),
            F.col("text"),
            F.when(
                did % 5 == 0, F.lit("\n\nCookie Policy | Privacy | Terms")
            ).otherwise(""),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit("\n(c) 2024 Example Corp"),
                    F.when(did % 7 == 0, "  ").otherwise(""),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    return line_level_dedup(planted, "text", "doc_id", min_docs=2)


_SQL_LINE_DEDUP = r"""
WITH docs2 AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'SUBSCRIBE to our newsletter today' || chr(10) ELSE '' END)
    || 'doc ' || CAST(doc_id AS VARCHAR) || ' unique: ' || text
    || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || chr(10) || 'Cookie Policy | Privacy | Terms' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0
             THEN chr(10) || '(c) 2024 Example Corp'
                  || (CASE WHEN doc_id % 7 = 0 THEN '  ' ELSE '' END)
             ELSE '' END)
    AS text
  FROM documents
), lines AS (
  SELECT doc_id, u.s.pos AS pos, u.s.line AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2),
       unnest(list_transform(range(1, len(l) + 1), i -> {'pos': i, 'line': l[i]})) AS u(s)
), keyed AS (
  SELECT doc_id, pos, line, md5(trim(line)) AS lk FROM lines
), boiler AS (
  SELECT lk FROM (
    SELECT lk, count(DISTINCT doc_id) AS n_docs
    FROM keyed WHERE trim(line) <> '' GROUP BY lk
  ) WHERE n_docs >= 2
), kept AS (
  SELECT * FROM keyed WHERE lk NOT IN (SELECT lk FROM boiler)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, len(string_split(text, chr(10)))::BIGINT AS n_lines FROM docs2
)
SELECT t.doc_id, COALESCE(r.clean, '') AS text, t.n_lines,
       COALESCE(r.n_kept, 0)::BIGINT AS n_kept,
       (t.n_lines - COALESCE(r.n_kept, 0))::BIGINT AS n_removed
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


_LEAK_P1 = (
    "The quick benchmark asks what is the airspeed velocity "
    "of an unladen swallow in furlongs per fortnight exactly"
)
_LEAK_P2 = (
    "Benchmark answer key the mitochondria is the powerhouse "
    "of the cell obviously and always has been since forever"
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination sweep, composed end-to-end from the
    sampling + contamination operators: hash-split the corpus into
    train/eval (deterministic, cluster-size-independent), then flag
    every TRAIN document sharing a 32-char rolling-window fingerprint
    with any EVAL document. Two planted benchmark passages (docs
    %97 / %89 get their text replaced wholesale, so windows align)
    guarantee real leaks on both sides of the split.

    Output per contaminated train doc: distinct eval partners and
    total shared windows — the "which training docs must be dropped
    before this eval set is valid" report. Plan: narrow hash split,
    explode to (id, fp), fp equi-join (16-byte uniform keys), two
    partially-aggregated groupBys."""
    from beats_spark.operators.sampling import split_train_eval
    from beats_spark.operators.textstats import contamination_pairs

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 97 == 0, F.lit(_LEAK_P1))
        .when(did % 89 == 0, F.lit(_LEAK_P2))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sp = split_train_eval(planted, "doc_id", eval_fraction=0.25, seed=11)
    train = sp.where(F.col("split") == "train")
    eval_ = sp.where(F.col("split") == "eval")
    pairs = contamination_pairs(train, eval_, "text", "doc_id", window=32, stride=16)
    return pairs.groupBy("train_id").agg(
        F.countDistinct("eval_id").cast("long").alias("n_eval_docs"),
        F.sum("shared_windows").cast("long").alias("shared_windows"),
    )


_SQL_DECONTAMINATE = f"""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN '{_LEAK_P1}'
         WHEN doc_id % 89 = 0 THEN '{_LEAK_P2}'
         ELSE text END AS text
  FROM documents
), sp AS (
  SELECT doc_id, text,
    CASE WHEN ('0x' || substr(md5('s11|' || doc_id::VARCHAR), 1, 15))::BIGINT
              < {int(0.25 * (1 << 60))}
         THEN 'eval' ELSE 'train' END AS split
  FROM planted
), fps AS (
  SELECT DISTINCT doc_id, split, md5(substr(text, s, 32)) AS fp
  FROM sp, unnest(range(1, greatest(length(text) - 32 + 1, 1) + 1, 16)) AS t(s)
), pairs AS (
  SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS shared_windows
  FROM fps t JOIN fps e ON t.fp = e.fp
  WHERE t.split = 'train' AND e.split = 'eval'
  GROUP BY 1, 2
)
SELECT train_id, count(DISTINCT eval_id)::BIGINT AS n_eval_docs,
       sum(shared_windows)::BIGINT AS shared_windows
FROM pairs GROUP BY train_id
"""


_QF_SPAM = ("spam ham " * 30).strip()
_QF_DIGITS = ("12345 67 " * 25).strip()


def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization through the processor chain
    (normalize_unicode, pandas str.normalize over Arrow batches):
    every 5th doc gets a DECOMPOSED suffix (e + U+0301), every 7th the
    precomposed form — after NFC both render identically, char counts
    shrink for the decomposed rows, untouched rows pass through
    byte-equal. The oracle uses DuckDB's independent nfc_normalize
    implementation: two Unicode libraries must agree exactly."""
    from beats_spark.operators.base import build_chain

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(" cafe\u0301")))
        .when(did % 7 == 0, F.concat(F.col("text"), F.lit(" caf\u00e9")))
        .otherwise(F.col("text"))
        .alias("text"),
    ).withColumn("text_raw", F.col("text"))
    chain = build_chain([{"normalize_unicode": {"fields": ["text"], "form": "NFC"}}])
    out = chain(planted)
    return out.select(
        "doc_id",
        F.col("text").alias("text_nfc"),
        (F.col("text") != F.col("text_raw")).alias("changed"),
        F.length("text_raw").cast("long").alias("chars_before"),
        F.length("text").cast("long").alias("chars_after"),
    )


_SQL_UNICODE_NFC = """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' cafe' || chr(769)
              WHEN doc_id % 7 = 0 THEN text || ' caf' || chr(233)
              ELSE text END AS text_raw
  FROM documents
)
SELECT doc_id,
       nfc_normalize(text_raw) AS text_nfc,
       (nfc_normalize(text_raw) <> text_raw) AS changed,
       length(text_raw)::BIGINT AS chars_before,
       length(nfc_normalize(text_raw))::BIGINT AS chars_after
FROM planted
"""


def q_include_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The include_message reader parser (libbeat/reader/filter/
    filter.go:32-47, registered name parser.go:126): keep events whose
    message matches ANY configured pattern, drop the rest. Patterns
    are planted deterministically (every 3rd doc an ALERT line, every
    11th a needle token, one NULL message) so both the keep and the
    drop branch carry rows; runs through the registry processor form
    so the gate also covers the Beats-name dispatch."""
    from beats_spark.operators.base import build_chain

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 31 == 0, F.lit(None).cast("string"))
        .when(did % 3 == 0, F.concat(F.lit("ALERT: code "), (did % 97).cast("string")))
        .when(did % 11 == 0, F.concat(F.lit("needle-xyz "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("message"),
    )
    chain = build_chain(
        [{"include_message": {"patterns": ["^ALERT: code [0-9]+", "needle-xyz"]}}]
    )
    return chain(planted).select("doc_id", "message")


_SQL_INCLUDE_MESSAGE = """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 31 = 0 THEN NULL
              WHEN doc_id % 3 = 0 THEN 'ALERT: code ' || (doc_id % 97)::VARCHAR
              WHEN doc_id % 11 = 0 THEN 'needle-xyz ' || text
              ELSE text END AS message
  FROM documents
)
SELECT doc_id, message FROM planted
WHERE COALESCE(regexp_matches(message, '^ALERT: code [0-9]+')
               OR regexp_matches(message, 'needle-xyz'), false)
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed Gopher-rules corpus filter (textstats.quality_filter):
    the full rule battery — length, word shape, digit soup, stopword
    structure, line/n-gram repetition, composite score — annotating
    every document with sorted reject reasons and a keep flag.
    Plants a repetition bomb (%13), a digit-soup doc (%17), and a
    too-short doc (%19) so every rule family fires. The oracle
    replays the metric expressions, both repetition aggregations,
    and the reason-list assembly; reasons must match string-exact."""
    from beats_spark.operators.textstats import quality_filter

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 13 == 0, F.lit(_QF_SPAM))
        .when(did % 17 == 0, F.lit(_QF_DIGITS))
        .when(did % 19 == 0, F.lit("tiny doc"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = quality_filter(planted, "text", "doc_id")
    return out.select("doc_id", "n_words", "reasons", "keep")


_SQL_QUALITY_FILTER = f"""
WITH base AS (
  SELECT doc_id,
    CASE WHEN doc_id % 13 = 0 THEN '{_QF_SPAM}'
         WHEN doc_id % 17 = 0 THEN '{_QF_DIGITS}'
         WHEN doc_id % 19 = 0 THEN 'tiny doc'
         ELSE text END AS text
  FROM documents
), m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text),
           '\\b(the|and|of|to|is|that|for|with|a|in|it|on|as|at|be|by)\\b')) AS n_stop
  FROM base
), score AS (
  SELECT doc_id,
         greatest(least(
           (CASE WHEN n_words BETWEEN 10 AND 10000 THEN 30.0 ELSE 0.0 END)
           + (CASE WHEN n_chars::DOUBLE / greatest(n_words, 1)::DOUBLE BETWEEN 2.0 AND 12.0
                   THEN 20.0 ELSE 0.0 END)
           + least(n_stop::DOUBLE / greatest(n_words, 1)::DOUBLE * 100.0, 30.0)
           + 20.0
           - least(n_punct::DOUBLE / greatest(n_chars, 1)::DOUBLE * 100.0, 10.0)
           - least(n_digit::DOUBLE / greatest(n_chars, 1)::DOUBLE * 100.0, 10.0),
           100.0), 0.0) AS q
  FROM m
), norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM base
), toks AS (SELECT doc_id, string_split_regex(t, ' ') AS toks FROM norm),
grams AS (
  SELECT doc_id, 2 AS n, unnest(list_transform(
    range(0, greatest(len(toks) - 2, 0) + 1),
    i -> array_to_string(toks[i + 1 : i + 2], ' '))) AS g FROM toks
  UNION ALL
  SELECT doc_id, 5 AS n, unnest(list_transform(
    range(0, greatest(len(toks) - 5, 0) + 1),
    i -> array_to_string(toks[i + 1 : i + 5], ' '))) AS g FROM toks
),
cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g),
gagg AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN c * length(g) END) AS top2,
         sum(CASE WHEN n = 5 AND c > 1 THEN c * length(g) ELSE 0 END) AS dup5
  FROM cnt GROUP BY doc_id),
lines AS (
  SELECT doc_id, trim(l) AS l
  FROM base, unnest(string_split(text, chr(10))) AS u(l)
  WHERE trim(l) <> ''),
lc AS (SELECT doc_id, l, count(*) AS c FROM lines GROUP BY doc_id, l),
lagg AS (
  SELECT doc_id,
         sum(c) AS n_lines, count(*) AS n_distinct
  FROM lc GROUP BY doc_id),
fracs AS (
  SELECT m.doc_id, m.n_words,
         m.n_chars::DOUBLE / greatest(m.n_words, 1)::DOUBLE AS mean_wl,
         m.n_digit::DOUBLE / greatest(m.n_chars, 1)::DOUBLE AS digit_r,
         m.n_stop::DOUBLE / greatest(m.n_words, 1)::DOUBLE AS stop_r,
         coalesce((la.n_lines - la.n_distinct)::DOUBLE
                  / greatest(la.n_lines, 1)::DOUBLE, 0.0) AS dup_line_frac,
         least(coalesce(g.top2, 0)::DOUBLE
               / greatest(length(n.t), 1)::DOUBLE, 1.0) AS top2_cover,
         least(coalesce(g.dup5, 0)::DOUBLE
               / greatest(length(n.t), 1)::DOUBLE, 1.0) AS dup5_frac,
         s.q
  FROM m
  JOIN norm n USING (doc_id)
  JOIN score s USING (doc_id)
  LEFT JOIN gagg g USING (doc_id)
  LEFT JOIN lagg la USING (doc_id)
)
SELECT doc_id, n_words::BIGINT AS n_words,
  COALESCE(array_to_string(list_sort(list_filter([
    CASE WHEN n_words < 20 THEN 'too_short' END,
    CASE WHEN n_words > 10000 THEN 'too_long' END,
    CASE WHEN mean_wl < 2.5 OR mean_wl > 10.0 THEN 'word_len' END,
    CASE WHEN digit_r > 0.2 THEN 'digit_soup' END,
    CASE WHEN stop_r < 0.03 THEN 'low_stopword' END,
    CASE WHEN dup_line_frac > 0.3 THEN 'dup_lines' END,
    CASE WHEN top2_cover > 0.2 THEN 'top2gram' END,
    CASE WHEN dup5_frac > 0.2 THEN 'dup5gram' END,
    CASE WHEN q < 40.0 THEN 'low_quality' END
  ], x -> x IS NOT NULL)), ','), '') AS reasons,
  COALESCE(array_to_string(list_sort(list_filter([
    CASE WHEN n_words < 20 THEN 'too_short' END,
    CASE WHEN n_words > 10000 THEN 'too_long' END,
    CASE WHEN mean_wl < 2.5 OR mean_wl > 10.0 THEN 'word_len' END,
    CASE WHEN digit_r > 0.2 THEN 'digit_soup' END,
    CASE WHEN stop_r < 0.03 THEN 'low_stopword' END,
    CASE WHEN dup_line_frac > 0.3 THEN 'dup_lines' END,
    CASE WHEN top2_cover > 0.2 THEN 'top2gram' END,
    CASE WHEN dup5_frac > 0.2 THEN 'dup5gram' END,
    CASE WHEN q < 40.0 THEN 'low_quality' END
  ], x -> x IS NOT NULL)), ','), '') = '' AS keep
FROM fracs
"""


def q_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-rule reject-rate audit quality_filter exists to enable:
    reasons exploded and counted per language — the report a corpus
    build reads BEFORE deciding thresholds (which rule rejects how
    much of which slice). Same planted fixture as `quality_filter`;
    the oracle wraps that query's full SQL as a CTE and replays the
    explode/count."""
    from beats_spark.operators.textstats import quality_filter

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 13 == 0, F.lit(_QF_SPAM))
        .when(did % 17 == 0, F.lit(_QF_DIGITS))
        .when(did % 19 == 0, F.lit("tiny doc"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    qf = quality_filter(planted, "text", "doc_id")
    return (
        qf.where(F.col("reasons") != "")
        .select("doc_id", F.explode(F.split(F.col("reasons"), ",")).alias("reason"))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "reason")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )



def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing (operators/sampling.py:mixture_sample): resample
    the corpus by language to a target mixture — en upsampled 2.5×
    (2 exact copies + hash-decided top-up), de kept, es halved, fr
    dropped, zh 1.25×. Pure narrow projection + explode, no shuffle;
    decisions are md5-hash deterministic so the oracle replays the
    exact same row multiset including the copy indices."""
    from beats_spark.operators.sampling import mixture_sample

    docs = _load(spark, sf_dir, "documents")
    out = mixture_sample(
        docs.select("doc_id", "lang"),
        "lang",
        {"en": 2.5, "de": 1.0, "es": 0.5, "fr": 0.0, "zh": 1.25},
        key_col="doc_id",
        seed=13,
    )
    return out.select("doc_id", "lang", "mix_copy")


_SQL_MIXTURE_SAMPLE = f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('s13|' || doc_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM documents
), n AS (
  SELECT doc_id, lang,
    CASE lang
      WHEN 'en' THEN 2 + (CASE WHEN hv < {int(0.5 * (1 << 60))} THEN 1 ELSE 0 END)
      WHEN 'de' THEN 1
      WHEN 'es' THEN (CASE WHEN hv < {int(0.5 * (1 << 60))} THEN 1 ELSE 0 END)
      WHEN 'fr' THEN 0
      WHEN 'zh' THEN 1 + (CASE WHEN hv < {int(0.25 * (1 << 60))} THEN 1 ELSE 0 END)
      ELSE 1 END AS n_copies
  FROM h
)
SELECT doc_id, lang, u.i::BIGINT AS mix_copy
FROM n, unnest(range(0, n_copies)) AS u(i)
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build (textstats.vocab_top_k): top-50 tokens
    by occurrence with doc frequency and deterministic tie-broken
    rank. Distributed top-k (TakeOrderedAndProject), never a global
    sort."""
    from beats_spark.operators.textstats import vocab_top_k

    docs = _load(spark, sf_dir, "documents")
    out = vocab_top_k(docs, "text", "doc_id", k=50)
    return out.select(
        F.col("rank").cast("long").alias("rank"),
        "tok",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


_SQL_VOCAB_TOPK = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm
), nz AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), counts AS (
  SELECT tok, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
  FROM nz GROUP BY tok
), ranked AS (
  SELECT row_number() OVER (ORDER BY n_occurrences DESC, tok) AS rank,
         tok, n_occurrences, n_docs
  FROM counts
)
SELECT rank::BIGINT AS rank, tok,
       n_occurrences::BIGINT AS n_occurrences, n_docs::BIGINT AS n_docs
FROM ranked WHERE rank <= 50
"""


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact unigram-LM surprisal per doc (textstats.
    unigram_surprisal): floor-log2 arithmetic via binary-string
    length, so the LM-style quality signal is engine-portable with
    no floating-point log. surprisal_milli = mean surprisal × 1000,
    exact integer division."""
    from beats_spark.operators.textstats import unigram_surprisal

    docs = _load(spark, sf_dir, "documents")
    return unigram_surprisal(docs, "text", "doc_id")


_SQL_UNIGRAM_SURPRISAL = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm
), nz AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), counts AS (
  SELECT tok, count(*) AS cnt FROM nz GROUP BY tok
), tot AS (
  SELECT sum(cnt)::BIGINT AS t FROM counts
), perdoc AS (
  SELECT nz.doc_id, count(*)::BIGINT AS n_tokens,
         sum(length(bin(c.cnt)) - 1)::BIGINT AS sum_fl2
  FROM nz JOIN counts c USING (tok) GROUP BY nz.doc_id
)
SELECT doc_id, n_tokens,
       (n_tokens * (length(bin(t)) - 1) - sum_fl2)::BIGINT AS surprisal_sum,
       ((n_tokens * (length(bin(t)) - 1) - sum_fl2) * 1000
        // greatest(n_tokens, 1))::BIGINT AS surprisal_milli
FROM perdoc, tot
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (sampling.dsir_weights): every document
    scored by hashed-n-gram (unigram+bigram, 512 md5 buckets)
    likelihood ratio against the English-subcorpus target domain —
    integer-exact floor-log2 bits, so the data-selection signal is
    engine-portable. English docs score high, zh/de docs low."""
    from beats_spark.operators.sampling import dsir_weights

    docs = _load(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    return dsir_weights(docs, target, "text", "doc_id", n_buckets=512, seed=7)


_SQL_DSIR_WEIGHTS = r"""
WITH norm AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, lang, g
  FROM norm,
       unnest(toks ||
              list_transform(range(0, greatest(len(toks) - 2, 0) + 1),
                             i -> array_to_string(toks[i + 1 : i + 2], ' '))) AS u(g)
  WHERE g <> ''
), bucketed AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('s7|' || g), 1, 15))::BIGINT % 512 AS b
  FROM grams
), tc AS (
  SELECT b, count(*) AS ct FROM bucketed WHERE lang = 'en' GROUP BY b
), rc AS (
  SELECT b, count(*) AS cr FROM bucketed GROUP BY b
), w AS (
  SELECT rc.b,
         (length(bin(COALESCE(tc.ct, 0) + 1)) - 1)
           - (length(bin(rc.cr + 1)) - 1) AS wbits
  FROM rc LEFT JOIN tc ON tc.b = rc.b
), tot AS (
  SELECT (SELECT sum(ct)::BIGINT FROM tc) AS tt,
         (SELECT sum(cr)::BIGINT FROM rc) AS tr
), perdoc AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams, sum(wbits)::BIGINT AS wsum
  FROM bucketed JOIN w USING (b) GROUP BY doc_id
)
SELECT doc_id, n_grams,
       (wsum + n_grams * ((length(bin(tr + 512)) - 1)
                          - (length(bin(tt + 512)) - 1)))::BIGINT AS dsir_bits,
       ((wsum + n_grams * ((length(bin(tr + 512)) - 1)
                           - (length(bin(tt + 512)) - 1))) * 1000
        // greatest(n_grams, 1))::BIGINT AS dsir_milli
FROM perdoc, tot
"""


def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram-LM surprisal per doc (textstats.
    bigram_surprisal): −log2 P(w2|w1) in integer floor-log2 bits —
    catches improbable token TRANSITIONS that unigram statistics
    cannot see. Same engine-portable arithmetic as
    unigram_surprisal."""
    from beats_spark.operators.textstats import bigram_surprisal

    docs = _load(spark, sf_dir, "documents")
    return bigram_surprisal(docs, "text", "doc_id")


_SQL_BIGRAM_SURPRISAL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, array_to_string(toks[u.i + 1 : u.i + 2], ' ') AS b
  FROM norm, unnest(range(0, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 2
), bgc AS (
  SELECT b, count(*) AS cbg FROM bg GROUP BY b
), lc AS (
  SELECT split_part(b, ' ', 1) AS w1, sum(cbg)::BIGINT AS cl
  FROM bgc GROUP BY 1
), perdoc AS (
  SELECT bg.doc_id, count(*)::BIGINT AS nb,
         sum((length(bin(lc.cl)) - 1) - (length(bin(bgc.cbg)) - 1))::BIGINT AS ssum
  FROM bg JOIN bgc USING (b)
          JOIN lc ON lc.w1 = split_part(bg.b, ' ', 1)
  GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.nb, 0)::BIGINT AS n_bigrams,
       COALESCE(p.ssum, 0)::BIGINT AS surprisal_sum,
       (COALESCE(p.ssum, 0) * 1000 // greatest(COALESCE(p.nb, 0), 1))::BIGINT AS surprisal_milli
FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
"""


def q_domain_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distribution-drift report (sampling.
    domain_divergence): KL(stratum ‖ corpus) over hashed
    unigram+bigram bucket models in integer MILLIBITS (floor-log2 +
    linear interpolation, engine-exact) — the corpus-observability
    sweep that flags distributionally-novel ingest slices (rank
    strata by magnitude; the operator docstring explains the
    concavity-bias reading — at sf0.01 the majority language sits
    ~20× nearer zero than any minority one, though tiny sub-corpora
    are noise-dominated). The oracle refits both models and replays
    the smoothed divergence sum exactly."""
    from beats_spark.operators.sampling import domain_divergence

    docs = _load(spark, sf_dir, "documents")
    return domain_divergence(docs, "lang", "text", n_buckets=512, seed=7)


_SQL_DOMAIN_DIVERGENCE = r"""
WITH norm AS (
  SELECT lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), grams AS (
  SELECT lang, g
  FROM norm,
       unnest(toks ||
              list_transform(range(0, greatest(len(toks) - 2, 0) + 1),
                             i -> array_to_string(toks[i + 1 : i + 2], ' '))) AS u(g)
  WHERE g <> ''
), sb AS (
  SELECT lang AS s,
         ('0x' || substr(md5('s7|' || g), 1, 15))::BIGINT % 512 AS b,
         count(*) AS c
  FROM grams GROUP BY 1, 2
), gl AS (
  SELECT b, sum(c)::BIGINT AS cg FROM sb GROUP BY b
), ts AS (
  SELECT s, sum(c)::BIGINT AS t_s FROM sb GROUP BY s
), tot AS (
  SELECT sum(cg)::BIGINT AS t FROM gl
), terms AS (
  SELECT sb.s, ts.t_s,
         sb.c * ((1000 * (length(bin(sb.c + 1)) - 1) + (1000 * ((sb.c + 1) - power(2, (length(bin(sb.c + 1)) - 1))::BIGINT)) // power(2, (length(bin(sb.c + 1)) - 1))::BIGINT)
                 - (1000 * (length(bin(ts.t_s + 512)) - 1) + (1000 * ((ts.t_s + 512) - power(2, (length(bin(ts.t_s + 512)) - 1))::BIGINT)) // power(2, (length(bin(ts.t_s + 512)) - 1))::BIGINT)
                 - (1000 * (length(bin(gl.cg + 1)) - 1) + (1000 * ((gl.cg + 1) - power(2, (length(bin(gl.cg + 1)) - 1))::BIGINT)) // power(2, (length(bin(gl.cg + 1)) - 1))::BIGINT)
                 + (1000 * (length(bin(tot.t + 512)) - 1) + (1000 * ((tot.t + 512) - power(2, (length(bin(tot.t + 512)) - 1))::BIGINT)) // power(2, (length(bin(tot.t + 512)) - 1))::BIGINT)) AS term
  FROM sb JOIN gl USING (b) JOIN ts ON ts.s = sb.s, tot
)
SELECT s AS lang, t_s::BIGINT AS n_grams,
       sum(term)::BIGINT AS kl_mbits,
       (sum(term) // greatest(t_s, 1))::BIGINT AS kl_mean_mbits
FROM terms GROUP BY s, t_s
"""


def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus build, composed from four
    operators each oracle-proven on its own: Gopher quality filter
    (keep only clean docs) → exact dedup (min-id keeper per
    normalized text) → domain-mixture resampling by language →
    GPT-style sequence packing into 128-token windows. Output is the
    corpus manifest: one row per surviving doc COPY with its window
    assignment. The oracle rebuilds the whole chain from first
    principles in SQL — rule negations for keep, GROUP BY normalized
    text for dedup (vs Spark's 128-bit hash key: equal unless xxhash64
    collides, the documented ~1e-20), hash thresholds for the mixture,
    and the bucketed running-sum pack over pid = doc_id*10+copy."""
    from beats_spark.operators.dedup import exact_dedup
    from beats_spark.operators.sampling import mixture_sample, pack_sequences
    from beats_spark.operators.textstats import quality_filter

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    kept = (
        quality_filter(docs, "text", "doc_id")
        .where("keep")
        .select("doc_id", "lang", "text")
    )
    sole = exact_dedup(kept)
    mixed = mixture_sample(
        sole,
        "lang",
        {"en": 2.0, "de": 1.0, "es": 0.5, "fr": 1.0, "zh": 1.25},
        key_col="doc_id",
        seed=17,
    )
    packed = pack_sequences(
        mixed.select(
            (F.col("doc_id") * 10 + F.col("mix_copy")).alias("pid"), "text"
        ),
        "text",
        "pid",
        budget=128,
        n_buckets=8,
    )
    return packed.select(
        F.expr("pid div 10").alias("doc_id"),
        (F.col("pid") % 10).cast("long").alias("mix_copy"),
        F.col("bucket").cast("long").alias("bucket"),
        "tok_count",
        "start_off",
        "pack_first",
        "pack_last",
    )


_SQL_CORPUS_BUILD = f"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text),
           '\\b(the|and|of|to|is|that|for|with|a|in|it|on|as|at|be|by)\\b')) AS n_stop
  FROM documents
), score AS (
  SELECT doc_id,
         greatest(least(
           (CASE WHEN n_words BETWEEN 10 AND 10000 THEN 30.0 ELSE 0.0 END)
           + (CASE WHEN n_chars::DOUBLE / greatest(n_words, 1)::DOUBLE BETWEEN 2.0 AND 12.0
                   THEN 20.0 ELSE 0.0 END)
           + least(n_stop::DOUBLE / greatest(n_words, 1)::DOUBLE * 100.0, 30.0)
           + 20.0
           - least(n_punct::DOUBLE / greatest(n_chars, 1)::DOUBLE * 100.0, 10.0)
           - least(n_digit::DOUBLE / greatest(n_chars, 1)::DOUBLE * 100.0, 10.0),
           100.0), 0.0) AS q
  FROM m
), nrm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
), tk AS (SELECT doc_id, string_split_regex(t, ' ') AS toks FROM nrm),
grams AS (
  SELECT doc_id, 2 AS n, unnest(list_transform(
    range(0, greatest(len(toks) - 2, 0) + 1),
    i -> array_to_string(toks[i + 1 : i + 2], ' '))) AS g FROM tk
  UNION ALL
  SELECT doc_id, 5 AS n, unnest(list_transform(
    range(0, greatest(len(toks) - 5, 0) + 1),
    i -> array_to_string(toks[i + 1 : i + 5], ' '))) AS g FROM tk
),
cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g),
gagg AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN c * length(g) END) AS top2,
         sum(CASE WHEN n = 5 AND c > 1 THEN c * length(g) ELSE 0 END) AS dup5
  FROM cnt GROUP BY doc_id),
lines AS (
  SELECT doc_id, trim(l) AS l
  FROM documents, unnest(string_split(text, chr(10))) AS u(l)
  WHERE trim(l) <> ''),
lc AS (SELECT doc_id, l, count(*) AS c FROM lines GROUP BY doc_id, l),
lagg AS (
  SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct
  FROM lc GROUP BY doc_id),
kept AS (
  SELECT m.doc_id
  FROM m
  JOIN nrm n USING (doc_id)
  JOIN score s USING (doc_id)
  LEFT JOIN gagg g USING (doc_id)
  LEFT JOIN lagg la USING (doc_id)
  WHERE m.n_words >= 20 AND m.n_words <= 10000
    AND m.n_chars::DOUBLE / greatest(m.n_words, 1)::DOUBLE BETWEEN 2.5 AND 10.0
    AND m.n_digit::DOUBLE / greatest(m.n_chars, 1)::DOUBLE <= 0.2
    AND m.n_stop::DOUBLE / greatest(m.n_words, 1)::DOUBLE >= 0.03
    AND coalesce((la.n_lines - la.n_distinct)::DOUBLE
                 / greatest(la.n_lines, 1)::DOUBLE, 0.0) <= 0.3
    AND least(coalesce(g.top2, 0)::DOUBLE
              / greatest(length(n.t), 1)::DOUBLE, 1.0) <= 0.2
    AND least(coalesce(g.dup5, 0)::DOUBLE
              / greatest(length(n.t), 1)::DOUBLE, 1.0) <= 0.2
    AND s.q >= 40.0
), keyed AS (
  SELECT d.doc_id, d.lang, d.text,
         trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) AS nn
  FROM documents d JOIN kept USING (doc_id)
), sole AS (
  SELECT * FROM keyed
  WHERE doc_id IN (SELECT min(doc_id) FROM keyed GROUP BY nn)
), mixn AS (
  SELECT doc_id, lang, text,
    CASE lang
      WHEN 'en' THEN 2
      WHEN 'de' THEN 1
      WHEN 'es' THEN (CASE WHEN ('0x' || substr(md5('s17|' || doc_id::VARCHAR), 1, 15))::BIGINT
                               < {int(0.5 * (1 << 60))} THEN 1 ELSE 0 END)
      WHEN 'fr' THEN 1
      WHEN 'zh' THEN 1 + (CASE WHEN ('0x' || substr(md5('s17|' || doc_id::VARCHAR), 1, 15))::BIGINT
                                   < {int(0.25 * (1 << 60))} THEN 1 ELSE 0 END)
      ELSE 1 END AS n_copies
  FROM sole
), copies AS (
  SELECT doc_id * 10 + u.i AS pid, doc_id, u.i AS mix_copy, text
  FROM mixn, unnest(range(0, n_copies)) AS u(i)
), pk AS (
  SELECT pid, doc_id, mix_copy,
         ('0x' || substr(md5('s0|' || pid::VARCHAR), 1, 15))::BIGINT % 8 AS bucket,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS tok_count
  FROM copies
), s2 AS (
  SELECT pid, doc_id, mix_copy, bucket, tok_count,
         coalesce(sum(tok_count + 1) OVER (
           PARTITION BY bucket ORDER BY pid
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
  FROM pk)
SELECT doc_id, mix_copy::BIGINT AS mix_copy, bucket::BIGINT AS bucket,
       tok_count::BIGINT AS tok_count, start_off,
       (start_off // 128)::BIGINT AS pack_first,
       ((start_off + greatest(tok_count, 1) - 1) // 128)::BIGINT AS pack_last
FROM s2
"""


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (textstats.perplexity_buckets):
    every document ranked by integer-exact unigram surprisal and split
    into equal-count head/middle/tail tiers — the CCNet keep/sample/
    drop decision (Wenzek et al. 2020 §4.3) — with value-based cutoffs
    from a bounded-histogram CDF, so no engine-ordered ntile and no
    corpus sort. The oracle refits the LM and replays the cutoff rule
    bit-for-bit."""
    from beats_spark.operators.textstats import perplexity_buckets

    docs = _load(spark, sf_dir, "documents")
    return perplexity_buckets(docs, "text", "doc_id", n_buckets=3)


_SQL_PERPLEXITY_BUCKETS = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm
), nz AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), counts AS (
  SELECT tok, count(*) AS cnt FROM nz GROUP BY tok
), tot AS (
  SELECT sum(cnt)::BIGINT AS t FROM counts
), perdoc AS (
  SELECT nz.doc_id, count(*)::BIGINT AS n_tokens,
         sum(length(bin(c.cnt)) - 1)::BIGINT AS sum_fl2
  FROM nz JOIN counts c USING (tok) GROUP BY nz.doc_id
), milli AS (
  SELECT doc_id,
         ((n_tokens * (length(bin(t)) - 1) - sum_fl2) * 1000
          // greatest(n_tokens, 1))::BIGINT AS surprisal_milli
  FROM perdoc, tot
), hist AS (
  SELECT surprisal_milli AS v, count(*) AS n FROM milli GROUP BY 1
), cdf AS (
  SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM hist
), total AS (
  SELECT sum(n) AS tt FROM hist
), cuts AS (
  SELECT min(CASE WHEN cum * 3 >= tt * 1 THEN v END) AS c1,
         min(CASE WHEN cum * 3 >= tt * 2 THEN v END) AS c2
  FROM cdf, total
)
SELECT doc_id, surprisal_milli,
       CASE WHEN surprisal_milli <= c1 THEN 'head'
            WHEN surprisal_milli <= c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM milli, cuts
"""


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation report (textstats.corpus_report):
    document count, exact-duplicate rate (normalized-md5 distinct vs
    rows — the same key exact_dedup collapses on), size stats, and
    language spread per crawl source. Integer-milli outputs only."""
    from beats_spark.operators.textstats import corpus_report

    docs = _load(spark, sf_dir, "documents")
    return corpus_report(docs, "source", "text", lang_col="lang")


_SQL_DOMAIN_STATS = r"""
WITH fp AS (
  SELECT source, lang, length(text)::BIGINT AS n_chars,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
  FROM documents
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT f)::BIGINT AS n_unique,
       sum(n_chars)::BIGINT AS total_chars,
       count(DISTINCT lang)::BIGINT AS n_langs,
       ((count(*) - count(DISTINCT f)) * 1000 // count(*))::BIGINT AS dup_rate_milli,
       (sum(n_chars) * 1000 // count(*))::BIGINT AS mean_chars_milli
FROM fp GROUP BY source
"""


def q_html_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier extraction (html.extract_links): per-doc planted
    HTML carries absolute links with shuffled tracker params, root-
    relative / relative / protocol-relative hrefs in all three quoting
    styles, fragment-only + javascript noise, and an exact duplicate —
    resolved against the doc's own (mixed-case-host) URL. The oracle
    constructs the expected (link, canonical_link) set analytically
    from the same doc_id arithmetic (extraction-regex semantics are
    pinned by tests/test_html.py's resolution battery)."""
    from beats_spark.operators.html import extract_links
    from beats_spark.operators.scale import spread

    docs = spread(_load(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    base = F.concat(
        F.lit("http://H"),
        (did % 50).cast("string"),
        F.lit(".Example.com/d"),
        (did % 7).cast("string"),
        F.lit("/index.html"),
    )
    abs_link = F.concat(
        F.lit('<a href="https://ext.example.org/p'),
        (did % 13).cast("string"),
        F.lit('?utm_source=x&b=2&a=1">x</a>'),
    )
    html = F.concat(
        F.lit("<p>intro</p>"),
        abs_link,
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit("<a href='/r"),
                (did % 5).cast("string"),
                F.lit(".html'>y</a>"),
            ),
        ).otherwise(""),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("<a href=rel"),
                (did % 4).cast("string"),
                F.lit(".html>z</a>"),
            ),
        ).otherwise(""),
        F.when(
            did % 5 == 0, F.lit('<a href="//cdn.example.net/l.js">c</a>')
        ).otherwise(""),
        F.lit('<a href="#top">t</a><a href="javascript:void(0)">j</a>'),
        F.when(did % 11 == 0, abs_link).otherwise(""),
    )
    fixture = docs.select("doc_id", html.alias("html"), base.alias("url"))
    return extract_links(fixture)


_SQL_HTML_LINKS = r"""
WITH b AS (
  SELECT doc_id,
         'http://H' || (doc_id % 50)::VARCHAR || '.Example.com' AS origin,
         'http://h' || (doc_id % 50)::VARCHAR || '.example.com' AS lorigin,
         '/d' || (doc_id % 7)::VARCHAR || '/' AS dirp
  FROM documents
), links AS (
  SELECT doc_id,
         'https://ext.example.org/p' || (doc_id % 13)::VARCHAR
           || '?utm_source=x&b=2&a=1' AS link,
         'https://ext.example.org/p' || (doc_id % 13)::VARCHAR
           || '?a=1&b=2' AS canonical_link
  FROM b
  UNION ALL
  SELECT doc_id,
         origin || '/r' || (doc_id % 5)::VARCHAR || '.html',
         lorigin || '/r' || (doc_id % 5)::VARCHAR || '.html'
  FROM b WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id,
         origin || dirp || 'rel' || (doc_id % 4)::VARCHAR || '.html',
         lorigin || dirp || 'rel' || (doc_id % 4)::VARCHAR || '.html'
  FROM b WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, 'http://cdn.example.net/l.js', 'http://cdn.example.net/l.js'
  FROM b WHERE doc_id % 5 = 0
)
SELECT doc_id, link, canonical_link FROM links
"""


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl-frontier build: extract_links (the
    html_links fixture) → url_filter blocklist gate (ads/cdn domains
    blocked by suffix) → canonical-URL dedup with in-degree — one row
    per surviving frontier URL with how many documents link to it
    (n_refs) and the lowest referring doc_id. With html_corpus
    (fetch→text) and corpus_build (text→training set) this closes the
    crawl loop end-to-end. The oracle rebuilds the whole chain from
    the same analytic link set."""
    from beats_spark.operators.html import extract_links
    from beats_spark.operators.urlnorm import url_filter

    links = q_html_links(spark, sf_dir)
    bl = spark.createDataFrame(
        [("ext.example.org",), ("cdn.example.net",)], "domain string"
    )
    # id_col = the URL itself: on a multi-link frame rows sharing an
    # id get the OR of their block decisions (url_filter docstring),
    # and the URL fully determines its own decision
    gated = url_filter(
        links, bl, url_col="canonical_link", id_col="canonical_link"
    ).where(F.col("keep"))
    return gated.groupBy(F.col("canonical_link").alias("frontier_url")).agg(
        F.count(F.lit(1)).cast("long").alias("n_refs"),
        F.min("doc_id").alias("first_doc"),
    )


_SQL_CRAWL_FRONTIER = r"""
WITH b AS (
  SELECT doc_id,
         'http://h' || (doc_id % 50)::VARCHAR || '.example.com' AS lorigin,
         '/d' || (doc_id % 7)::VARCHAR || '/' AS dirp
  FROM documents
), links AS (
  -- the surviving canonical links: ext.example.org (abs) and
  -- cdn.example.net (protocol-relative) are blocklisted upstream
  SELECT doc_id,
         lorigin || '/r' || (doc_id % 5)::VARCHAR || '.html' AS canonical_link
  FROM b WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id,
         lorigin || dirp || 'rel' || (doc_id % 4)::VARCHAR || '.html'
  FROM b WHERE doc_id % 3 = 0
)
SELECT canonical_link AS frontier_url,
       count(*)::BIGINT AS n_refs,
       min(doc_id) AS first_doc
FROM links GROUP BY canonical_link
"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl-politeness gate (operators/robots.py):
    per-host robots bodies — comments, a ``*`` group with a
    Disallow/Allow pair, and on every 4th host a decoy exact-agent
    group that MUST be ignored under agent='*' — parsed to a rule
    table, then frontier URLs filtered by REP longest-match (Allow
    beats Disallow on ties; unmatched and non-URL rows allowed). The
    oracle computes the verdicts analytically from the fixture
    arithmetic; parsing/precedence semantics are pinned by
    tests/test_robots.py."""
    from beats_spark.operators.robots import parse_robots, robots_filter

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host_id = did % 20
    hosts = docs.select(host_id.alias("hid")).distinct()
    k = (F.col("hid") % 7).cast("string")
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("hid").cast("string"), F.lit(".example.com")).alias(
            "host"
        ),
        F.concat(
            F.lit("# synthetic robots\nUser-agent: *\nDisallow: /p"),
            k,
            F.lit("/\nAllow: /p"),
            k,
            F.lit("/ok/\n"),
            F.lit("Disallow: /dl/*.exe$\nAllow: /dl/okay*.exe$\n"),
            F.when(
                F.col("hid") % 4 == 0,
                F.lit("\nUser-agent: decoybot\nDisallow: /\n"),
            ).otherwise(""),
        ).alias("robots_txt"),
    )
    rules = parse_robots(robots, agent="*")
    b = (did % 5).cast("string")
    ds = did.cast("string")
    path = (
        F.when(did % 6 == 0, F.concat(F.lit("/p"), b, F.lit("/x")))
        .when(did % 6 == 1, F.concat(F.lit("/p"), b, F.lit("/ok/y")))
        .when(did % 6 == 2, F.concat(F.lit("/free/"), ds))
        .when(did % 6 == 3, F.concat(F.lit("/dl/f"), ds, F.lit(".exe")))
        .when(did % 6 == 4, F.concat(F.lit("/dl/okay"), ds, F.lit(".exe")))
        .otherwise(F.concat(F.lit("/dl/f"), ds, F.lit(".exe.bak")))
    )
    urls = docs.select(
        "doc_id",
        F.when(
            did % 97 == 0, F.concat(F.lit("bare text "), did.cast("string"))
        )
        .otherwise(
            F.concat(
                F.lit("http://h"), host_id.cast("string"),
                F.lit(".example.com"), path,
            )
        )
        .alias("url"),
    )
    out = robots_filter(urls, rules)
    return out.select("doc_id", "host", "allowed", "rule_path")


_SQL_ROBOTS_FILTER = r"""
SELECT doc_id,
       CASE WHEN doc_id % 97 = 0 THEN ''
            ELSE 'h' || (doc_id % 20)::VARCHAR || '.example.com' END AS host,
       CASE WHEN doc_id % 97 = 0 THEN TRUE
            WHEN doc_id % 6 = 0 AND doc_id % 5 = (doc_id % 20) % 7 THEN FALSE
            WHEN doc_id % 6 = 3 THEN FALSE
            ELSE TRUE END AS allowed,
       CASE WHEN doc_id % 97 = 0 THEN NULL
            WHEN doc_id % 6 = 0 AND doc_id % 5 = (doc_id % 20) % 7
            THEN '/p' || (doc_id % 5)::VARCHAR || '/'
            WHEN doc_id % 6 = 1 AND doc_id % 5 = (doc_id % 20) % 7
            THEN '/p' || (doc_id % 5)::VARCHAR || '/ok/'
            WHEN doc_id % 6 = 3 THEN '/dl/*.exe$'
            WHEN doc_id % 6 = 4 THEN '/dl/okay*.exe$'
            ELSE NULL END AS rule_path
FROM documents
"""


def q_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5 temperature-sampling weights at T=2 (sampling.
    temperature_weights): per-language raw share, sqrt-flattened
    target share, and the mixture boost — all milli integers, with
    sqrt(n) computed as an EXACT integer sqrt (double candidate + two
    integer corrections) so the oracle replays it bit-for-bit."""
    from beats_spark.operators.sampling import temperature_weights

    docs = _load(spark, sf_dir, "documents")
    return temperature_weights(docs, "lang")


_SQL_TEMPERATURE_WEIGHTS = r"""
WITH counts AS (
  SELECT lang AS stratum, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY lang
), c0 AS (
  SELECT stratum, n_docs,
         floor(sqrt((n_docs * 1000000)::DOUBLE))::BIGINT AS c
  FROM counts
), c1 AS (
  SELECT stratum, n_docs,
         CASE WHEN (c + 1) * (c + 1) <= n_docs * 1000000
              THEN c + 1 ELSE c END AS c
  FROM c0
), sq AS (
  SELECT stratum, n_docs,
         CASE WHEN c * c > n_docs * 1000000 THEN c - 1 ELSE c END AS s
  FROM c1
), tot AS (
  SELECT sum(n_docs)::BIGINT AS nt, sum(s)::BIGINT AS st FROM sq
), m AS (
  SELECT stratum, n_docs,
         (n_docs * 1000 // nt)::BIGINT AS p_milli,
         (s * 1000 // st)::BIGINT AS q_milli,
         (s * 1000000 // st)::BIGINT AS q_micro,
         (n_docs * 1000000 // nt)::BIGINT AS p_micro
  FROM sq, tot
)
SELECT stratum, n_docs, p_milli, q_milli,
       (q_micro * 1000 // greatest(p_micro, 1))::BIGINT AS boost_milli
FROM m
"""


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain blocklist filter (urlnorm.url_filter): RefinedWeb-
    style curation gate. Plants deterministic URLs over the documents
    table — three domains, userinfo and port noise, /casino/ paths,
    non-URL rows — blocks on a 2-row blocklist (one parent-domain
    suffix, one exact host) plus a path-pattern battery. The oracle
    replays the fixture, the host extraction, the dot-suffix explode,
    and both block rules."""
    from beats_spark.operators.urlnorm import url_filter

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    domain = (
        F.when(did % 3 == 0, "ads.example.com")
        .when(did % 3 == 1, "example.com")
        .otherwise("media.net")
    )
    url = F.when(
        did % 97 == 0, F.concat(F.lit("bare text "), did.cast("string"))
    ).otherwise(
        F.concat(
            F.lit("http://"),
            F.when(did % 17 == 0, "crawler@").otherwise(""),
            F.lit("h"),
            (did % 50).cast("string"),
            F.lit("."),
            domain,
            F.when(did % 13 == 0, ":8080").otherwise(""),
            F.lit("/p/"),
            (did % 20).cast("string"),
            F.when(did % 11 == 0, "/casino/deals").otherwise(""),
        )
    )
    fixture = docs.select("doc_id", url.alias("url"))
    bl = spark.createDataFrame(
        [("ads.example.com",), ("h7.media.net",)], "domain string"
    )
    out = url_filter(fixture, bl, "url", "doc_id", patterns=[r"/casino/"])
    return out.select(
        "doc_id", "host", "blocked_domain", "blocked_pattern", "keep"
    )


_SQL_URL_FILTER = r"""
WITH fx AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN 'bare text ' || doc_id::VARCHAR
         ELSE 'http://' ||
              CASE WHEN doc_id % 17 = 0 THEN 'crawler@' ELSE '' END ||
              'h' || (doc_id % 50)::VARCHAR || '.' ||
              CASE WHEN doc_id % 3 = 0 THEN 'ads.example.com'
                   WHEN doc_id % 3 = 1 THEN 'example.com'
                   ELSE 'media.net' END ||
              CASE WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END ||
              '/p/' || (doc_id % 20)::VARCHAR ||
              CASE WHEN doc_id % 11 = 0 THEN '/casino/deals' ELSE '' END
    END AS url
  FROM documents
), hostx AS (
  SELECT doc_id, url,
    regexp_replace(regexp_replace(regexp_replace(
      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
      '^[^@]*@', ''), ':[0-9]*$', ''), '\.$', '') AS host
  FROM fx
), bl(domain) AS (
  VALUES ('ads.example.com'), ('h7.media.net')
), sfx AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, len(string_split(host, '.')) + 1),
           i -> array_to_string(string_split(host, '.')[i:], '.'))) AS s
  FROM hostx WHERE host <> ''
), blocked AS (
  SELECT DISTINCT sfx.doc_id FROM sfx JOIN bl ON sfx.s = bl.domain
)
SELECT h.doc_id, h.host,
       (b.doc_id IS NOT NULL) AS blocked_domain,
       (lower(h.url) LIKE '%/casino/%') AS blocked_pattern,
       (b.doc_id IS NULL AND lower(h.url) NOT LIKE '%/casino/%') AS keep
FROM hostx h LEFT JOIN blocked b ON b.doc_id = h.doc_id
"""


def q_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation curation rollup (sessions.conversation_stats)
    over the event-turn stream: turn count, elapsed span in integer
    milliseconds, text volume, mean-turn-length milli, and distinct
    turn types — the pre-assembly filter signals for the
    transcript→corpus path."""
    from beats_spark.operators.sessions import conversation_stats

    ev = _load(spark, sf_dir, "events").withColumn(
        # concat, not format_string: NULL-propagating like the
        # oracle's ||, so a NULL event_type/event_id can never skew
        # total_chars differently across engines
        "line",
        F.concat(F.col("event_type"), F.lit("@"), F.col("event_id").cast("string")),
    )
    return conversation_stats(
        ev, key_col="user_id", ts_col="ts", text_col="line", role_col="event_type"
    )


_SQL_CONVERSATION_STATS = r"""
WITH ev AS (
  SELECT user_id, ts, event_type,
         event_type || '@' || event_id::VARCHAR AS line
  FROM events
)
SELECT user_id,
       count(*)::BIGINT AS n_turns,
       (date_diff('microsecond', min(ts), max(ts)) // 1000)::BIGINT AS span_ms,
       sum(length(line))::BIGINT AS total_chars,
       count(DISTINCT event_type)::BIGINT AS n_roles,
       (sum(length(line)) * 1000 // greatest(count(*), 1))::BIGINT
         AS chars_per_turn_milli
FROM ev GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# conversation curation (operators/chat.py) + crawl politeness scheduling
# ---------------------------------------------------------------------------

# events → transcript shape: deterministic role mapping + planted
# defects (every 71st event an unknown role, every 53rd a blank turn,
# every 89th a NULL turn) so each validity rule actually fires.
_ROLE_SQL = (
    "CASE WHEN event_id % 71 = 0 THEN 'bot' ELSE "
    "CASE event_type WHEN 'click' THEN 'assistant' WHEN 'purchase' THEN 'tool' "
    "WHEN 'error' THEN 'system' ELSE 'user' END END"
)
_CHAT_TEXT_SQL = (
    "CASE WHEN event_id % 53 = 0 THEN '  ' "
    "WHEN event_id % 89 = 0 THEN NULL "
    "ELSE event_type || '#' || event_id::VARCHAR END"
)


def _chat_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    role = F.when(F.col("event_id") % 71 == 0, F.lit("bot")).otherwise(
        F.when(F.col("event_type") == "click", "assistant")
        .when(F.col("event_type") == "purchase", "tool")
        .when(F.col("event_type") == "error", "system")
        .otherwise("user")
    )
    text = (
        F.when(F.col("event_id") % 53 == 0, F.lit("  "))
        .when(F.col("event_id") % 89 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.col("event_type"), F.lit("#"), F.col("event_id").cast("string")
            )
        )
    )
    return ev.select(
        "user_id", "ts", "event_id", role.alias("role"), text.alias("text")
    )


def q_conversation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation structural validity gate
    (chat.validate_conversations): empty/NULL turns, unknown roles,
    missing assistant turn, bad opening role, dangling user turn —
    reason-tagged per conversation, quality_filter-style."""
    from beats_spark.operators.chat import validate_conversations

    return validate_conversations(
        _chat_turns(spark, sf_dir),
        key_col="user_id",
        role_col="role",
        text_col="text",
        order_cols=("ts", "event_id"),
    )


_SQL_CONVERSATION_FILTER = rf"""
WITH t AS (
  SELECT user_id, ts, event_id,
         {_ROLE_SQL} AS role,
         {_CHAT_TEXT_SQL} AS text
  FROM events
), o AS (
  SELECT *,
    first_value(role) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS fr,
    last_value(role) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lr
  FROM t
), a AS (
  SELECT user_id, count(*) AS n_turns,
    max(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS anyempty,
    max(CASE WHEN role IS NULL
              OR role NOT IN ('system','user','assistant','tool')
             THEN 1 ELSE 0 END) AS anybad,
    max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS hasreq,
    min(fr) AS fr, min(lr) AS lr
  FROM o GROUP BY user_id
)
SELECT user_id, n_turns::BIGINT AS n_turns,
  coalesce(array_to_string(list_sort(list_filter([
    CASE WHEN anyempty = 1 THEN 'empty_turn' END,
    CASE WHEN anybad = 1 THEN 'bad_role' END,
    CASE WHEN hasreq = 0 THEN 'missing_required' END,
    CASE WHEN NOT coalesce(fr IN ('system','user'), false) THEN 'bad_opening' END,
    CASE WHEN coalesce(lr = 'user', false) THEN 'dangling_turn' END
  ], x -> x IS NOT NULL)), ','), '') AS reasons,
  coalesce(array_to_string(list_sort(list_filter([
    CASE WHEN anyempty = 1 THEN 'empty_turn' END,
    CASE WHEN anybad = 1 THEN 'bad_role' END,
    CASE WHEN hasreq = 0 THEN 'missing_required' END,
    CASE WHEN NOT coalesce(fr IN ('system','user'), false) THEN 'bad_opening' END,
    CASE WHEN coalesce(lr = 'user', false) THEN 'dangling_turn' END
  ], x -> x IS NOT NULL)), ','), '') = '' AS keep
FROM a
"""


def q_render_chat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT chat-template rendering with loss-mask spans
    (chat.render_chat): each conversation becomes one
    ``<|role|>text<|end|>`` document plus the character spans of every
    assistant payload — the column a trainer unmasks. The oracle
    rebuilds the rendering AND the span arithmetic (running piece
    offsets) in SQL; the rendered strings and span lists must match
    byte-for-byte."""
    from beats_spark.operators.chat import render_chat

    ev = _load(spark, sf_dir, "events")
    role = (
        F.when(F.col("event_type") == "click", "assistant")
        .when(F.col("event_type") == "purchase", "tool")
        .when(F.col("event_type") == "error", "system")
        .otherwise("user")
    )
    turns = ev.select(
        "user_id",
        "ts",
        "event_id",
        role.alias("role"),
        F.concat(
            F.col("event_type"), F.lit("#"), F.col("event_id").cast("string")
        ).alias("text"),
    )
    return render_chat(
        turns,
        key_col="user_id",
        role_col="role",
        text_col="text",
        order_cols=("ts", "event_id"),
    )


_SQL_RENDER_CHAT = r"""
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'click' THEN 'assistant'
              WHEN 'purchase' THEN 'tool' WHEN 'error' THEN 'system'
              ELSE 'user' END AS role,
         event_type || '#' || event_id::VARCHAR AS text
  FROM events
), p AS (
  SELECT user_id, ts, event_id, role,
         '<|' || role || '|>' || text || '<|end|>' AS piece,
         2 + len(role) + 2 AS head_len, len(text) AS text_len
  FROM t
), o AS (
  SELECT *,
    coalesce(sum(len(piece) + 1) OVER (PARTITION BY user_id
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM p
)
SELECT user_id,
  string_agg(piece, chr(10) ORDER BY ts, event_id) AS rendered,
  coalesce(string_agg(
    CASE WHEN role = 'assistant'
         THEN (off + head_len)::VARCHAR || ':' || (off + head_len + text_len)::VARCHAR
    END, ',' ORDER BY ts, event_id), '') AS loss_spans,
  count(*)::BIGINT AS n_turns,
  sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS n_loss_turns
FROM o GROUP BY user_id
"""


def q_truncate_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation at turn boundaries
    (chat.truncate_context): keep the longest suffix of whole turns
    fitting a 12-token budget, with the opening turn pinned (system
    prompt). Token counts are planted analytically (event_id %% 5 + 1
    whitespace tokens) so the oracle replays the exact suffix sums."""
    from beats_spark.operators.chat import truncate_context

    ev = _load(spark, sf_dir, "events")
    text = F.concat(
        F.repeat(F.lit("x "), (F.col("event_id") % 5).cast("int")), F.lit("end")
    )
    turns = ev.select("user_id", "ts", "event_id", text.alias("text"))
    out = truncate_context(
        turns,
        budget=12,
        key_col="user_id",
        order_cols=("ts", "event_id"),
        text_col="text",
        pin_first=True,
    )
    return out.select("user_id", "event_id", "tok_count", "suffix_toks", "kept")


_SQL_TRUNCATE_CONTEXT = r"""
WITH t AS (
  SELECT user_id, ts, event_id, (event_id % 5 + 1) AS tok FROM events
), o AS (
  SELECT *,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
    first_value(tok) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ft
  FROM t
), s AS (
  SELECT *,
    sum(CASE WHEN rn = 1 THEN 0 ELSE tok END) OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS suffix_toks
  FROM o
)
SELECT user_id, event_id, tok::BIGINT AS tok_count, suffix_toks,
       (rn = 1 OR suffix_toks <= greatest(12 - ft, 0)) AS kept
FROM s
"""


def q_anonymize_speakers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable speaker pseudonyms (chat.anonymize_speakers): per
    conversation, the first distinct speaker to appear becomes
    speaker_1, the next speaker_2, … NULL speakers (every 29th event)
    keep a NULL alias. The oracle replays first-appearance ranking
    with a window + join."""
    from beats_spark.operators.chat import anonymize_speakers

    ev = _load(spark, sf_dir, "events")
    speaker = F.when(F.col("event_id") % 29 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("u"), (F.col("event_id") % 7).cast("string"))
    )
    turns = ev.select("user_id", "ts", "event_id", speaker.alias("speaker"))
    out = anonymize_speakers(
        turns, key_col="user_id", speaker_col="speaker", order_cols=("ts", "event_id")
    )
    return out.select("user_id", "event_id", "speaker", "speaker_alias")


_SQL_ANONYMIZE_SPEAKERS = r"""
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 29 = 0 THEN NULL
              ELSE 'u' || (event_id % 7)::VARCHAR END AS speaker
  FROM events
), o AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM t
), f AS (
  SELECT user_id, speaker, min(rn) AS mn
  FROM o WHERE speaker IS NOT NULL GROUP BY user_id, speaker
), r AS (
  SELECT user_id, speaker,
         'speaker_' || (row_number() OVER (PARTITION BY user_id ORDER BY mn))::VARCHAR
           AS speaker_alias
  FROM f
)
SELECT t.user_id, t.event_id, t.speaker, r.speaker_alias
FROM t LEFT JOIN r ON t.user_id = r.user_id AND t.speaker = r.speaker
"""


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl politeness scheduling (robots.parse_crawl_delays →
    robots.fetch_schedule): per-host Crawl-delay from robots bodies,
    then a per-host fetch queue over frontier URLs — slot order by
    priority then URL, earliest offset = slot × delay, defaults where
    robots gives none, non-URL rows short-circuited past the window."""
    from beats_spark.operators.robots import fetch_schedule, parse_crawl_delays

    hosts = spark.range(10)
    body = F.concat(
        F.lit("User-agent: *\n"),
        F.when(
            F.col("id") % 3 != 0,
            F.concat(F.lit("Crawl-delay: "), F.col("id").cast("string"), F.lit("\n")),
        ).otherwise(F.lit("")),
        F.lit("Disallow: /private/\n"),
    )
    bodies = hosts.select(
        F.format_string("h%d.example.com", F.col("id")).alias("host"),
        body.alias("robots_txt"),
    )
    delays = parse_crawl_delays(bodies)
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.when(
        did % 97 == 0, F.concat(F.lit("bare text "), did.cast("string"))
    ).otherwise(
        F.format_string("http://h%d.example.com/p/%d", (did % 10), did)
    )
    urls = docs.select(
        did, url.alias("url"), (did % 5).cast("int").alias("prio")
    )
    out = fetch_schedule(urls, delays, default_delay_ms=700, priority_col="prio")
    return out.select("doc_id", "host", "slot", "delay_ms", "fetch_offset_ms")


_SQL_FETCH_SCHEDULE = r"""
WITH fx AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN 'bare text ' || doc_id::VARCHAR
         ELSE 'http://h' || (doc_id % 10)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR
    END AS url,
    (doc_id % 5) AS prio,
    CASE WHEN doc_id % 97 = 0 THEN ''
         ELSE 'h' || (doc_id % 10)::VARCHAR || '.example.com' END AS host
  FROM documents
), real AS (
  SELECT doc_id, host,
    CASE WHEN (doc_id % 10) % 3 <> 0 THEN (doc_id % 10) * 1000 ELSE 700 END AS delay_ms,
    row_number() OVER (PARTITION BY host ORDER BY prio DESC, url) - 1 AS slot
  FROM fx WHERE host <> ''
)
SELECT doc_id, host, slot::BIGINT AS slot, delay_ms::BIGINT AS delay_ms,
       (slot * delay_ms)::BIGINT AS fetch_offset_ms
FROM real
UNION ALL
SELECT doc_id, host, 0::BIGINT, 700::BIGINT, 0::BIGINT
FROM fx WHERE host = ''
"""


def q_frontier_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl-frontier merge (crawl.frontier_update): new
    links deduped with summed in-degrees, anti-joined against the
    frontier and the seen set, per-host capped at 10 — the wave-N →
    wave-N+1 step of the crawl loop. The oracle replays the whole
    merge from the same fixture arithmetic."""
    from beats_spark.operators.crawl import frontier_update

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url_of = lambda k: F.format_string(  # noqa: E731
        "http://h%d.example.com/p/%d", k % 10, k
    )
    frontier = docs.where(did % 4 == 0).select(url_of(did).alias("url"))
    new_links = docs.select(
        url_of(did % 300).alias("canonical_link"),
        (did % 7 + 1).cast("int").alias("n_refs"),
    )
    seen = docs.where(did % 5 == 0).select(url_of(did).alias("url"))
    return frontier_update(
        frontier, new_links, seen, rank_col="n_refs", max_per_host=10
    )


_SQL_FRONTIER_UPDATE = r"""
WITH fr AS (
  SELECT 'http://h' || (doc_id % 10)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR AS url,
         'h' || (doc_id % 10)::VARCHAR || '.example.com' AS host
  FROM documents WHERE doc_id % 4 = 0
), nl AS (
  SELECT 'http://h' || ((doc_id % 300) % 10)::VARCHAR || '.example.com/p/' || (doc_id % 300)::VARCHAR AS url,
         'h' || ((doc_id % 300) % 10)::VARCHAR || '.example.com' AS host,
         (doc_id % 7 + 1) AS r
  FROM documents
), agg AS (
  SELECT url, host, sum(r)::BIGINT AS rank FROM nl GROUP BY url, host
), sn AS (
  SELECT 'http://h' || (doc_id % 10)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR AS url
  FROM documents WHERE doc_id % 5 = 0
), cand AS (
  SELECT a.* FROM agg a
  WHERE NOT EXISTS (SELECT 1 FROM fr WHERE fr.url = a.url)
    AND NOT EXISTS (SELECT 1 FROM sn WHERE sn.url = a.url)
), capped AS (
  SELECT url, host FROM (
    SELECT url, host,
           row_number() OVER (PARTITION BY host ORDER BY rank DESC, url) AS rn
    FROM cand
  ) WHERE rn <= 10
)
SELECT url, host, false AS is_new FROM fr
UNION ALL
SELECT url, host, true AS is_new FROM capped
"""


def q_parse_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (crawl.parse_sitemap): urlset and
    sitemapindex documents → (kind, loc, lastmod) rows, entity-decoded
    and trimmed; loc-less entries dropped. The oracle constructs the
    expected rows analytically from the same fixture arithmetic — the
    regex extractor and its SQL twin cannot drift apart without a
    hash mismatch."""
    from beats_spark.operators.crawl import parse_sitemap

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    urlset = F.format_string(
        "<urlset><url><loc> http://h%d.example.com/p/%d?a=1&amp;b=2 </loc>"
        "<lastmod>2026-01-%02d</lastmod></url>"
        "<url><loc>/rel/%d</loc></url>"
        "<url><lastmod>2026-03-01</lastmod></url></urlset>",
        did % 10,
        did,
        did % 28 + 1,
        did,
    )
    index = F.format_string(
        "<sitemapindex><sitemap><loc>http://h%d.example.com/sitemap-%d.xml</loc>"
        "<lastmod>2026-02-02</lastmod></sitemap>"
        "<sitemap><loc> nested.xml </loc></sitemap></sitemapindex>",
        did % 10,
        did,
    )
    xml = F.when(did % 13 == 0, index).otherwise(urlset)
    return parse_sitemap(docs.select(did, xml.alias("sitemap_xml")))


_SQL_PARSE_SITEMAP = r"""
WITH u AS (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0),
     i AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 0)
SELECT doc_id, 'url' AS kind,
       'http://h' || (doc_id % 10)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR || '?a=1&b=2' AS loc,
       '2026-01-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') AS lastmod
FROM u
UNION ALL
SELECT doc_id, 'url', '/rel/' || doc_id::VARCHAR, '' FROM u
UNION ALL
SELECT doc_id, 'sitemap',
       'http://h' || (doc_id % 10)::VARCHAR || '.example.com/sitemap-' || doc_id::VARCHAR || '.xml',
       '2026-02-02'
FROM i
UNION ALL
SELECT doc_id, 'sitemap', 'nested.xml', '' FROM i
"""


def q_tool_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool usage rollup (sessions.tool_stats) over the event
    turns: calls, distinct conversations, mean queue position —
    NULL/'none' sentinel rows excluded as non-calls."""
    from beats_spark.operators.sessions import tool_stats

    ev = _load(spark, sf_dir, "events")
    tool = (
        F.when(
            F.col("event_type") == "purchase",
            F.concat(F.lit("t"), (F.col("event_id") % 4).cast("string")),
        )
        .when(F.col("event_type") == "click", F.lit("none"))
        .otherwise(F.lit(None).cast("string"))
    )
    turns = ev.select(
        "user_id", tool.alias("tool"), (F.col("event_id") % 100).alias("pos")
    )
    return tool_stats(turns, tool_col="tool", key_col="user_id", pos_col="pos")


_SQL_TOOL_STATS = r"""
WITH t AS (
  SELECT user_id, 't' || (event_id % 4)::VARCHAR AS tool, (event_id % 100) AS pos
  FROM events WHERE event_type = 'purchase'
)
SELECT tool, count(*)::BIGINT AS n_calls,
       count(DISTINCT user_id)::BIGINT AS n_convs,
       (sum(pos) * 1000 // greatest(count(*), 1))::BIGINT AS mean_pos_milli
FROM t GROUP BY tool
"""


def _warc_fixture_blob(did, body):
    """Per-doc WARC blob: a response record wrapping an HTTP payload
    whose body is ``body``; every 11th document is prefixed with a
    warcinfo record (multi-record framing)."""
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), body
    )
    resp = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.format_string("http://h%d.example.com/p/%d", did % 10, did),
        F.lit("\r\nWARC-Date: 2026-01-02T03:04:05Z\r\nWARC-Record-ID: <urn:uuid:"),
        did.cast("string"),
        F.lit(">\r\nContent-Type: application/http;msgtype=response"),
        F.lit("\r\nContent-Length: "),
        F.length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )
    info = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:uuid:info-"),
        did.cast("string"),
        F.lit(">\r\nContent-Type: application/warc-fields"),
        F.lit("\r\nContent-Length: 21\r\n\r\nsoftware: spark-graft\r\n\r\n"),
    )
    return F.when(did % 11 == 0, F.concat(info, resp)).otherwise(resp)


def q_winlog_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """winlog XML-export source (sources/winlog.py) + the
    golden-verified decode_xml_wineventlog processor
    (operators/compat.py): the first 200 events render as wevtutil-
    style ``<Event>`` elements (provider/level/channel/record id/
    timestamp/EventData incl. an UNNAMED <Data> → param2 per
    winlogbeat/sys/winevent/maputil.go:60-64), concatenate 20 per
    export file, then the source re-frames them (regexp posexplode)
    and the processor re-parses every field. The oracle computes each
    output analytically from the same fixture arithmetic, so framing
    order (record_no), the level-code table, the timestamp round-trip
    (epoch µs), and the paramN map rule are all value-exact."""
    from beats_spark.sources.winlog import decode_winlog, split_winlog_export

    ev = _load(spark, sf_dir, "events").where(F.col("event_id") < 200)
    eid = F.col("event_id")
    channel = (
        F.when(eid % 3 == 0, "Application")
        .when(eid % 3 == 1, "System")
        .otherwise("Security")
    )
    xml = F.concat(
        F.lit(
            "<Event xmlns='http://schemas.microsoft.com/win/2004/08/"
            "events/event'><System><Provider Name='"
        ),
        F.col("event_type"),
        F.lit("'/><EventID>"),
        (eid % 1000 + 1).cast("string"),
        F.lit("</EventID><Level>"),
        (eid % 6).cast("string"),
        F.lit("</Level><TimeCreated SystemTime='"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit("'/><EventRecordID>"),
        eid.cast("string"),
        F.lit("</EventRecordID><Channel>"),
        channel,
        F.lit("</Channel><Computer>host-"),
        (F.col("user_id") % 5).cast("string"),
        F.lit("</Computer></System><EventData><Data Name='k'>"),
        F.col("user_id").cast("string"),
        F.lit("</Data><Data>unnamed</Data></EventData></Event>"),
    )
    blobs = (
        ev.select(F.floor(eid / 20).alias("fid"), eid.alias("eid"), xml.alias("x"))
        .groupBy("fid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("eid", "x"))),
                    lambda s: s.getField("x"),
                ),
                "\n",
            ).alias("value")
        )
        .select(
            F.concat(F.lit("chan-"), F.col("fid").cast("string")).alias("file"),
            "value",
        )
    )
    dec = decode_winlog(split_winlog_export(blobs, "value", "file"))
    return dec.select(
        "file",
        F.col("record_no").cast("long").alias("record_no"),
        F.col("winlog_provider_name").alias("provider"),
        "event_code",
        F.col("winlog_record_id").alias("record_id"),
        F.col("winlog_computer_name").alias("computer"),
        F.col("winlog_channel").alias("channel"),
        F.col("winlog_level").alias("level"),
        F.unix_micros(F.col("winlog_time_created")).alias("ts_us"),
        F.element_at(F.col("winlog_event_data"), F.lit("k")).alias("k"),
        F.element_at(F.col("winlog_event_data"), F.lit("param2")).alias("p2"),
    )


_SQL_WINLOG_PARSE = r"""
SELECT
  'chan-' || (event_id // 20)::VARCHAR AS file,
  (event_id % 20 + 1)::BIGINT AS record_no,
  event_type AS provider,
  ((event_id % 1000) + 1)::VARCHAR AS event_code,
  event_id::BIGINT AS record_id,
  'host-' || (user_id % 5)::VARCHAR AS computer,
  CASE event_id % 3 WHEN 0 THEN 'Application' WHEN 1 THEN 'System'
       ELSE 'Security' END AS channel,
  CASE event_id % 6 WHEN 1 THEN 'critical' WHEN 2 THEN 'error'
       WHEN 3 THEN 'warning' WHEN 5 THEN 'verbose'
       ELSE 'information' END AS level,
  epoch_us(ts)::BIGINT AS ts_us,
  user_id::VARCHAR AS k,
  'unnamed' AS p2
FROM events
WHERE event_id < 200
"""


# The mqtt input's subscription list (filebeat/input/mqtt config
# `topics:`) — first-match-wins order exercised by q_mqtt_route:
# $-exclusion, multi-level '#' (incl. parent match), single-level '+'
# (incl. the zero-length leading level), and the literal fallthrough.
_MQTT_FILTERS = ["$SYS/#", "beats/error/#", "beats/+/u1", "+/purchase/+", "/+", "#"]


def q_mqtt_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MQTT §4.7 topic-filter routing (sources/mqtt.py
    route_by_topic): events synthesized into topics — ``$SYS/...``
    broker-internal rows, leading-empty-level rows, and the normal
    ``beats/<type>/u<n>`` tree — routed first-match-wins across the
    reference-style subscription list, then counted per winning
    filter. The oracle runs the IDENTICAL compiled regexes (RE2-safe:
    the $-exclusion is a conjunct, not a lookahead), so the matcher
    semantics are value-exact across engines."""
    from beats_spark.sources.mqtt import route_by_topic

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    topic = (
        F.when(eid % 17 == 0, F.concat(F.lit("$SYS/broker/"), F.col("event_type")))
        .when(eid % 13 == 0, F.concat(F.lit("/"), F.col("event_type")))
        .otherwise(
            F.concat(
                F.lit("beats/"),
                F.col("event_type"),
                F.lit("/u"),
                (F.col("user_id") % 7).cast("string"),
            )
        )
    )
    routed = route_by_topic(
        ev.select(topic.alias("topic"), "user_id"), "topic", _MQTT_FILTERS
    )
    return routed.groupBy("matched_filter").agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _sql_mqtt_route() -> str:
    from beats_spark.sources.mqtt import route_by_topic_sql

    case = route_by_topic_sql("topic", _MQTT_FILTERS)
    return f"""
WITH t AS (
  SELECT CASE WHEN event_id % 17 = 0 THEN '$SYS/broker/' || event_type
              WHEN event_id % 13 = 0 THEN '/' || event_type
              ELSE 'beats/' || event_type || '/u' || (user_id % 7)::VARCHAR
         END AS topic,
         user_id
  FROM events
)
SELECT {case} AS matched_filter,
       count(*)::BIGINT AS n_messages,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM t GROUP BY 1
"""


def q_model_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry model ranking (operators/ranking.py) over a
    deterministic arena fixture: six models with a skill gradient
    (lower index beats higher except every 4th event upsets), duels
    derived from events. 3 MM sweeps in micro-unit fixed point; the
    DuckDB oracle is the same algorithm unrolled as CTEs
    (bradley_terry_sql), so every strength is bit-exact."""
    from beats_spark.operators.ranking import bradley_terry

    ev = _load(spark, sf_dir, "events")
    a = F.col("user_id") % 6
    b = (a + 1 + F.col("event_id") % 5) % 6
    lo, hi = F.least(a, b), F.greatest(a, b)
    upset = F.col("event_id") % 4 == 0
    duels = ev.select(
        F.concat(F.lit("m"), F.when(upset, hi).otherwise(lo).cast("string")).alias(
            "winner"
        ),
        F.concat(F.lit("m"), F.when(upset, lo).otherwise(hi).cast("string")).alias(
            "loser"
        ),
    )
    return bradley_terry(duels, iterations=3)


def _sql_model_ranking() -> str:
    from beats_spark.operators.ranking import bradley_terry_sql

    comp = """
  SELECT CASE WHEN event_id % 4 = 0
              THEN 'm' || greatest(user_id % 6, (user_id % 6 + 1 + event_id % 5) % 6)::VARCHAR
              ELSE 'm' || least(user_id % 6, (user_id % 6 + 1 + event_id % 5) % 6)::VARCHAR
         END AS winner,
         CASE WHEN event_id % 4 = 0
              THEN 'm' || least(user_id % 6, (user_id % 6 + 1 + event_id % 5) % 6)::VARCHAR
              ELSE 'm' || greatest(user_id % 6, (user_id % 6 + 1 + event_id % 5) % 6)::VARCHAR
         END AS loser
  FROM events
"""
    return bradley_terry_sql(comp, iterations=3)


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization
    (similarity.quantize_embeddings): per-vector max-abs scale in
    floor(x·1e6) micro-units, truncating-division codes, and the
    position-weighted code checksum + reconstruction-error audit —
    every code pinned bit-exact against the DuckDB twin (same integer
    pipeline via list_transform/range). The 4x storage step an
    embedding corpus runs before ANN."""
    from beats_spark.operators.similarity import quantize_embeddings

    emb = _load(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb).drop("codes")


_SQL_EMBED_QUANTIZE = r"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1000000)::BIGINT) AS q
  FROM embeddings WHERE embedding IS NOT NULL
), s AS (
  SELECT vec_id, q, list_max(list_transform(q, v -> abs(v))) AS am FROM qv
)
SELECT vec_id,
       am::BIGINT AS scale_micro,
       list_sum(list_transform(q, v -> abs((v*127) // greatest(am,1))))::BIGINT AS code_l1,
       list_sum(list_transform(range(1, len(q)+1), i -> ((q[i]*127) // greatest(am,1)) * i))::BIGINT AS code_checksum,
       list_max(list_transform(q, v -> abs(v - (((v*127) // greatest(am,1)) * am) // 127)))::BIGINT AS max_err_micro,
       list_sum(list_transform(q, v -> abs(v - (((v*127) // greatest(am,1)) * am) // 127)))::BIGINT AS sum_err_micro
FROM s
"""


def q_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized (SQ8) brute-force top-5 for the first 20 query
    vectors (similarity.sq8_topk): integer code dot products, so —
    unlike float cosine — the SCORES themselves are oracle-exact, and
    tie-breaks (id asc) are deterministic by construction. The DuckDB
    twin requantizes with the embed_quantize pipeline and windows the
    same (score desc, id asc) order."""
    from beats_spark.operators.similarity import sq8_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return sq8_topk(q, emb, k=5)


_SQL_KNN_SQ8 = """
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1000000)::BIGINT) AS q
  FROM embeddings WHERE embedding IS NOT NULL
), codes AS (
  SELECT vec_id,
         list_max(list_transform(q, u -> abs(u))) AS am,
         list_transform(q, v -> (v*127) // greatest(list_max(list_transform(q, u -> abs(u))), 1)) AS c
  FROM qv
)
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
         (list_sum(list_transform(range(1, len(qq.c)+1), i -> qq.c[i] * cc.c[i])) * cc.am)::BIGINT AS score,
         row_number() OVER (
           PARTITION BY qq.vec_id
           ORDER BY list_sum(list_transform(range(1, len(qq.c)+1), i -> qq.c[i] * cc.c[i])) * cc.am DESC,
                    cc.vec_id ASC) AS rank
  FROM codes qq JOIN codes cc ON qq.vec_id <> cc.vec_id
  WHERE qq.vec_id < 20)
WHERE rank <= 5
"""


def q_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record parsing (sources/warc.py): per-document WARC blobs
    — a response record wrapping an HTTP payload, every 11th document
    prefixed with a warcinfo record — framed by Content-Length byte
    counts and split into (type, uri, id, http status/content-type,
    body). The oracle constructs every expected row analytically from
    the fixture arithmetic, so framing and the HTTP sub-parse are
    value-exact; payloads compare as decoded text (DuckDB hashes
    strings, not blobs)."""
    from beats_spark.sources.warc import parse_warc_records

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.concat(
        F.lit("body-"),
        did.cast("string"),
        F.lit("-"),
        F.repeat(F.lit("x"), (did % 7).cast("int")),
    )
    blob = _warc_fixture_blob(did, body)
    frame = docs.select(
        did.cast("string").alias("path"),
        F.encode(blob, "UTF-8").alias("content"),
    )
    out = parse_warc_records(frame, "content", "path")
    return out.select(
        F.col("file").cast("long").alias("doc_id"),
        "rec_no",
        "warc_type",
        "target_uri",
        "warc_date",
        "record_id",
        "content_type",
        "content_length",
        "http_status",
        "http_content_type",
        F.decode(F.col("payload"), "UTF-8").alias("payload_text"),
        "truncated",
    )


_SQL_WARC_PARSE = r"""
SELECT doc_id,
       CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END::BIGINT AS rec_no,
       'response' AS warc_type,
       'http://h' || (doc_id % 10)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR AS target_uri,
       '2026-01-02T03:04:05Z' AS warc_date,
       '<urn:uuid:' || doc_id::VARCHAR || '>' AS record_id,
       'application/http;msgtype=response' AS content_type,
       (44 + 6 + len(doc_id::VARCHAR) + doc_id % 7)::BIGINT AS content_length,
       200 AS http_status,
       'text/html' AS http_content_type,
       'body-' || doc_id::VARCHAR || '-' || repeat('x', (doc_id % 7)::INT) AS payload_text,
       false AS truncated
FROM documents
UNION ALL
SELECT doc_id, 0::BIGINT, 'warcinfo', NULL, NULL,
       '<urn:uuid:info-' || doc_id::VARCHAR || '>',
       'application/warc-fields', 21::BIGINT, NULL, NULL,
       'software: spark-graft', false
FROM documents WHERE doc_id % 11 = 0
"""


def q_warc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-in/corpus-out front half composed end-to-end: WARC
    response records → HTTP body → HTML → extracted text. The WARC
    framing must deliver the HTML payload byte-exact for the
    extraction oracle (the html_steps_sql battery over the same
    analytic HTML) to hash-match."""
    from beats_spark.operators.html import extract_html_text
    from beats_spark.sources.warc import parse_warc_records

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.format_string(
        "<html><head><title>T%d</title><script>sj()</script></head>"
        "<body><h1>Head %d</h1><p>para one of %d</p>"
        "<p>&amp; two &lt;ok&gt;</p><!-- c --></body></html>",
        did % 20,
        did,
        did,
    )
    frame = docs.select(
        did.cast("string").alias("path"),
        F.encode(_warc_fixture_blob(did, body), "UTF-8").alias("content"),
    )
    recs = parse_warc_records(frame, "content", "path").where(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    html = recs.select(
        F.col("file").cast("long").alias("doc_id"),
        F.decode(F.col("payload"), "UTF-8").alias("html"),
    )
    out = extract_html_text(html, "html", "text_out")
    return out.select(
        "doc_id", "text_out", F.length("text_out").cast("long").alias("n_chars")
    )


def _sql_warc_corpus() -> str:
    from beats_spark.operators.html import html_steps_sql

    body = (
        "'<html><head><title>T' || (doc_id % 20)::VARCHAR || "
        "'</title><script>sj()</script></head>"
        "<body><h1>Head ' || doc_id::VARCHAR || "
        "'</h1><p>para one of ' || doc_id::VARCHAR || "
        "'</p><p>&amp; two &lt;ok&gt;</p><!-- c --></body></html>'"
    )
    return f"""
WITH html AS (SELECT doc_id, {body} AS html FROM documents)
SELECT doc_id,
       {html_steps_sql('html')} AS text_out,
       length({html_steps_sql('html')})::BIGINT AS n_chars
FROM html
"""


def q_boilerplate_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-level boilerplate detection (chat.flag_boilerplate_turns):
    every third event carries one of five canned replies recurring
    across many conversations; the rest are unique. Canned turns must
    flag is_boilerplate with their exact distinct-conversation count."""
    from beats_spark.operators.chat import flag_boilerplate_turns

    ev = _load(spark, sf_dir, "events")
    text = F.when(
        F.col("event_id") % 3 == 0,
        F.format_string("canned reply %d", F.col("event_id") % 5),
    ).otherwise(F.format_string("unique msg %d", F.col("event_id")))
    turns = ev.select("user_id", "event_id", text.alias("text"))
    out = flag_boilerplate_turns(turns, key_col="user_id", min_convs=3)
    return out.select("user_id", "event_id", "turn_convs", "is_boilerplate")


_SQL_BOILERPLATE_TURNS = r"""
WITH t AS (
  SELECT user_id, event_id,
    CASE WHEN event_id % 3 = 0 THEN 'canned reply ' || (event_id % 5)::VARCHAR
         ELSE 'unique msg ' || event_id::VARCHAR END AS text
  FROM events
), f AS (
  SELECT text, count(DISTINCT user_id) AS c FROM t GROUP BY text
)
SELECT t.user_id, t.event_id, f.c::BIGINT AS turn_convs,
       (f.c >= 3) AS is_boilerplate
FROM t JOIN f USING (text)
"""


def q_sft_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transcripts-side SFT flagship composed end-to-end:
    turn rows → conversation validity gate (keepers only) → PII
    redaction on every turn → chat-template rendering with loss
    spans → GPT-style sequence packing. Planted emails/IPs must be
    masked BEFORE rendering (the spans and token counts see the
    masks), and only structurally valid conversations reach the pack.
    The oracle rebuilds all four stages in SQL."""
    from beats_spark.operators.chat import render_chat, validate_conversations
    from beats_spark.operators.redact import redact_pii
    from beats_spark.operators.sampling import pack_sequences

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    role = (
        F.when(F.col("event_type") == "click", "assistant")
        .when(F.col("event_type") == "purchase", "tool")
        .when(F.col("event_type") == "error", "system")
        .otherwise("user")
    )
    text = F.concat(
        F.col("event_type"),
        F.lit("#"),
        eid.cast("string"),
        F.when(
            eid % 23 == 0,
            F.concat(F.lit(" mail u"), eid.cast("string"), F.lit("@x.io")),
        ).otherwise(F.lit("")),
        F.when(eid % 31 == 0, F.lit(" ip 10.9.8.7")).otherwise(F.lit("")),
    )
    turns = ev.select(
        "user_id", "ts", "event_id", role.alias("role"), text.alias("text")
    )
    gate = validate_conversations(
        turns, key_col="user_id", order_cols=("ts", "event_id")
    )
    keepers = gate.where("keep").select("user_id")
    kept = turns.join(keepers, "user_id", "left_semi").withColumn(
        "text", redact_pii(F.col("text"))
    )
    rendered = render_chat(
        kept, key_col="user_id", order_cols=("ts", "event_id")
    )
    # docs feeds both the pack and the n_loss_turns join-back: persist,
    # or the whole gate->redact->render chain recomputes per consumer
    docs = rendered.select(
        F.col("user_id").alias("doc_id"),
        F.col("rendered").alias("text"),
        "n_loss_turns",
    ).persist()
    packed = pack_sequences(docs, budget=256, n_buckets=8)
    return packed.join(
        docs.select("doc_id", "n_loss_turns"), "doc_id"
    ).select(
        "doc_id",
        "bucket",
        "tok_count",
        "start_off",
        "pack_first",
        "pack_last",
        "n_loss_turns",
    )


_SQL_SFT_CORPUS = r"""
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'click' THEN 'assistant'
              WHEN 'purchase' THEN 'tool' WHEN 'error' THEN 'system'
              ELSE 'user' END AS role,
         event_type || '#' || event_id::VARCHAR
           || CASE WHEN event_id % 23 = 0
                   THEN ' mail u' || event_id::VARCHAR || '@x.io' ELSE '' END
           || CASE WHEN event_id % 31 = 0 THEN ' ip 10.9.8.7' ELSE '' END
           AS text
  FROM events
), o AS (
  SELECT *,
    first_value(role) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS fr,
    last_value(role) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lr
  FROM t
), a AS (
  SELECT user_id,
    max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS hasreq,
    min(fr) AS fr, min(lr) AS lr
  FROM o GROUP BY user_id
), keepers AS (
  SELECT user_id FROM a
  WHERE hasreq = 1 AND fr IN ('system','user') AND lr <> 'user'
), red AS (
  SELECT t.user_id, t.ts, t.event_id, t.role,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      t.text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b', '<CARD>', 'g'),
      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text
  FROM t JOIN keepers USING (user_id)
), docs AS (
  SELECT user_id AS doc_id,
    string_agg('<|' || role || '|>' || text || '<|end|>', chr(10)
               ORDER BY ts, event_id) AS text,
    sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS n_loss_turns
  FROM red GROUP BY user_id
), tok AS (
  SELECT doc_id, n_loss_turns,
    ('0x' || substr(md5('s0|' || doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS bucket,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS tok_count
  FROM docs
), s AS (
  SELECT doc_id, bucket, tok_count, n_loss_turns,
    coalesce(sum(tok_count + 1) OVER (
      PARTITION BY bucket ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
  FROM tok
)
SELECT doc_id, bucket::BIGINT AS bucket, tok_count::BIGINT AS tok_count,
       start_off, (start_off // 256)::BIGINT AS pack_first,
       ((start_off + greatest(tok_count, 1) - 1) // 256)::BIGINT AS pack_last,
       n_loss_turns
FROM s
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (sampling.chunk_documents) over the
    real documents table: 32-token windows stepping by 24 (8-token
    overlap), final chunk short, blank docs emit nothing. The oracle
    replays the window arithmetic and the token re-join."""
    from beats_spark.operators.sampling import chunk_documents
    from beats_spark.operators.scale import spread

    # single parquet file = one scan partition (CLAUDE.md); the chunk
    # plan is zero-shuffle so nothing downstream would widen it
    docs = spread(_load(spark, sf_dir, "documents"))
    return chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)


_SQL_CHUNK_DOCUMENTS = r"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(
           regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL
    AND regexp_replace(text, '^\s+|\s+$', '', 'g') <> ''
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, greatest(len(toks) - 8 - 1, 0) + 1, 24)) AS start
  FROM t
)
SELECT doc_id,
       (start // 24)::BIGINT AS chunk_idx,
       start::BIGINT AS chunk_start,
       (least(start + 32, n) - start)::BIGINT AS chunk_len,
       array_to_string(toks[start + 1 : least(start + 32, n)], ' ') AS chunk_text
FROM s
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup (dedup.incremental_dedup): a new
    batch (the non-indexed two-thirds of documents plus 30 verbatim
    replays at id+200000) collapses within itself (min-id keeper) and
    drops everything whose content key is already in the persistent
    corpus index (content_index over the indexed third). The oracle
    replays both stages on normalized text — the xxhash64 index keys
    must behave exactly like text identity."""
    from beats_spark.operators.dedup import content_index, incremental_dedup

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    idx = content_index(docs.where(did % 3 == 0))
    replays = docs.where(did < 30).select(
        (did + 200000).alias("doc_id"), "text"
    )
    batch = docs.where(did % 3 != 0).select("doc_id", "text").unionByName(
        replays
    )
    out = incremental_dedup(batch, idx)
    return out.select("doc_id")


_SQL_INCREMENTAL_DEDUP = r"""
WITH nt AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n
  FROM documents
), idx AS (
  SELECT DISTINCT n FROM nt WHERE doc_id % 3 = 0
), batch AS (
  SELECT doc_id, n FROM nt WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT doc_id + 200000, n FROM nt WHERE doc_id < 30
), keep AS (
  SELECT min(doc_id) AS doc_id, n FROM batch GROUP BY n
)
SELECT k.doc_id FROM keep k
WHERE NOT EXISTS (SELECT 1 FROM idx WHERE idx.n = k.n)
"""


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion NEAR-dedup (dedup.incremental_neardup):
    a new batch — the non-indexed two-thirds of documents plus 20
    near-verbatim replays of indexed docs (one word appended, shingle
    Jaccard ≈ (w-4)/(w-3)) — dedups against the persistent MinHash
    band index of the indexed third, with hashed-shingle exact-Jaccard
    verification fetched from the shingle index: historical TEXT is
    never read. The oracle recomputes survivors from first principles
    (exact shingle Jaccard vs the whole history, NOT EXISTS ≥ 0.7);
    equality holds because precision is exact (verify stage) and the
    candidate stage uses rows=1 banding (bands == num_hashes — a
    candidate needs ONE agreeing minhash), the recall-first discipline
    decontamination uses: history-dedup is recall-critical (a missed
    dup pollutes the corpus forever), and CLAUDE.md's affine-family
    pitfall rules out trusting the rows=4 band curve (measured: a
    short-doc replay at J≈0.75 missed all 16 rows=4 bands at
    sf0.001). Index cost 64×24 B/doc — still key material, not text.
    Verified green at sf0.001 and sf0.01."""
    from beats_spark.operators.dedup import (
        incremental_neardup,
        neardup_index,
        shingle_index,
    )

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    hist = docs.where(did % 3 == 0).select("doc_id", "text")
    replays = docs.where((did % 3 == 0) & (did < 60)).select(
        (did + 300000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    batch = (
        docs.where(did % 3 != 0).select("doc_id", "text").unionByName(replays)
    )
    surv = incremental_neardup(
        batch,
        neardup_index(hist, bands=64),
        shingle_index(hist),
        shingle_n=5,
        num_hashes=64,
        bands=64,
        threshold=0.7,
    )
    return surv.select("doc_id")


_SQL_INCREMENTAL_NEARDUP = r"""
WITH hist AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
), batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT doc_id + 300000, text || ' zz'
  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 60
), shh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM hist
    WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> '')
), shb AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM batch
    WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> '')
), matched AS (
  SELECT DISTINCT b.doc_id
  FROM shb b JOIN shh h
    ON len(list_intersect(b.grams, h.grams))::DOUBLE
         / len(list_distinct(b.grams || h.grams))::DOUBLE >= 0.7
)
SELECT doc_id FROM batch
WHERE doc_id NOT IN (SELECT doc_id FROM matched)
"""


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact host PageRank (crawl.host_pagerank, 3 iterations)
    over a deterministic 10-host link graph derived from documents.
    Floor-division milli-integer arithmetic means the DuckDB oracle
    (the three iterations unrolled as CTEs) must agree bit-for-bit."""
    from beats_spark.operators.crawl import host_pagerank

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    edges = docs.select(
        F.format_string("h%d", did % 10).alias("src_host"),
        F.format_string("h%d", (did * 7 + 3) % 10).alias("dst_host"),
    )
    return host_pagerank(edges, iterations=3)


_SQL_HOST_PAGERANK = r"""
WITH e AS (
  SELECT DISTINCT 'h' || (doc_id % 10)::VARCHAR AS src,
                  'h' || ((doc_id * 7 + 3) % 10)::VARCHAR AS dst
  FROM documents
), hosts AS (
  SELECT src AS host FROM e UNION SELECT dst FROM e
), deg AS (
  SELECT src, count(*) AS d FROM e GROUP BY src
), s0 AS (
  SELECT host, 1000000::BIGINT AS score FROM hosts
), i1 AS (
  SELECT e.dst AS host, sum(s0.score // deg.d) AS inb
  FROM s0 JOIN deg ON s0.host = deg.src JOIN e ON e.src = s0.host
  GROUP BY e.dst
), s1 AS (
  SELECT h.host, (150000 + coalesce(i1.inb, 0) * 850 // 1000)::BIGINT AS score
  FROM hosts h LEFT JOIN i1 ON h.host = i1.host
), i2 AS (
  SELECT e.dst AS host, sum(s1.score // deg.d) AS inb
  FROM s1 JOIN deg ON s1.host = deg.src JOIN e ON e.src = s1.host
  GROUP BY e.dst
), s2 AS (
  SELECT h.host, (150000 + coalesce(i2.inb, 0) * 850 // 1000)::BIGINT AS score
  FROM hosts h LEFT JOIN i2 ON h.host = i2.host
), i3 AS (
  SELECT e.dst AS host, sum(s2.score // deg.d) AS inb
  FROM s2 JOIN deg ON s2.host = deg.src JOIN e ON e.src = s2.host
  GROUP BY e.dst
)
SELECT h.host, (150000 + coalesce(i3.inb, 0) * 850 // 1000)::BIGINT AS score
FROM hosts h LEFT JOIN i3 ON h.host = i3.host
"""


def q_sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt (robots.parse_sitemap_urls):
    the group-independent ``Sitemap:`` directive collected per host,
    deduplicated — comments stripped, case-insensitive, directives
    inside foreign agent groups still collected (they bind to the
    file). Feeds crawl.parse_sitemap."""
    from beats_spark.operators.robots import parse_sitemap_urls

    docs = _load(spark, sf_dir, "documents")
    hid = (F.col("doc_id") % 20).alias("hid")
    hosts = docs.select(hid).distinct()
    h = F.col("hid").cast("string")
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /p\n"),
        F.lit("Sitemap: http://h"), h, F.lit(".example.com/sitemap.xml\n"),
        F.lit("Sitemap: http://h"), h,
        F.lit(".example.com/sitemap.xml  # duplicate + comment\n"),
        F.when(
            F.col("hid") % 3 == 0,
            F.concat(
                F.lit("User-agent: otherbot\nsitemap: http://cdn.example.com/h"),
                h,
                F.lit(".xml\n"),
            ),
        ).otherwise(F.lit("")),
    )
    robots = hosts.select(
        F.concat(F.lit("h"), h, F.lit(".example.com")).alias("host"),
        body.alias("robots_txt"),
    )
    return parse_sitemap_urls(robots)


_SQL_SITEMAP_DISCOVERY = r"""
WITH h AS (SELECT DISTINCT (doc_id % 20) AS hid FROM documents)
SELECT 'h' || hid::VARCHAR || '.example.com' AS host,
       'http://h' || hid::VARCHAR || '.example.com/sitemap.xml' AS sitemap_url
FROM h
UNION ALL
SELECT 'h' || hid::VARCHAR || '.example.com',
       'http://cdn.example.com/h' || hid::VARCHAR || '.xml'
FROM h WHERE hid % 3 = 0
"""


def q_crawl_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE crawl loop composed end-to-end in one query:
    robots bodies → rule table + Crawl-delays + Sitemap discovery →
    sitemap fetch (deterministic) → parse_sitemap → frontier_update
    (seed + new links, within-sitemap dup collapsed) → robots gate
    (/blocked/ dropped) → fetch_schedule (per-host slots at the
    host's crawl-delay). The oracle constructs the surviving schedule
    analytically — every stage must round-trip exactly for the hash
    to match."""
    from beats_spark.operators.crawl import frontier_update, parse_sitemap
    from beats_spark.operators.robots import (
        fetch_schedule,
        parse_crawl_delays,
        parse_robots,
        parse_sitemap_urls,
        robots_filter,
    )

    docs = _load(spark, sf_dir, "documents")
    hosts = docs.select((F.col("doc_id") % 10).alias("i")).distinct()
    i = F.col("i").cast("string")
    origin = F.concat(F.lit("http://h"), i, F.lit(".example.com"))
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /blocked/\n"),
        F.when(
            F.col("i") % 3 != 0,
            F.concat(F.lit("Crawl-delay: "), i, F.lit("\n")),
        ).otherwise(F.lit("")),
        F.lit("Sitemap: "), origin, F.lit("/sm.xml\n"),
    )
    bodies = hosts.select(
        F.concat(F.lit("h"), i, F.lit(".example.com")).alias("host"),
        body.alias("robots_txt"),
        origin.alias("_origin"),
    )
    rules = parse_robots(bodies)
    delays = parse_crawl_delays(bodies)
    smurls = parse_sitemap_urls(bodies)
    # deterministic "fetch": each discovered sitemap URL resolves to a
    # urlset naming 2 pages, 1 blocked page, and a duplicate entry
    o = F.regexp_replace(F.col("sitemap_url"), r"/sm\.xml$", "")
    xml = F.concat(
        F.lit("<urlset>"),
        F.lit("<url><loc>"), o, F.lit("/p/a</loc></url>"),
        F.lit("<url><loc>"), o, F.lit("/p/b</loc></url>"),
        F.lit("<url><loc>"), o, F.lit("/blocked/x</loc></url>"),
        F.lit("<url><loc>"), o, F.lit("/p/a</loc></url>"),
        F.lit("</urlset>"),
    )
    links = parse_sitemap(
        smurls.select(F.col("host"), xml.alias("sitemap_xml")), id_col="host"
    )
    seeds = bodies.select(F.concat(F.col("_origin"), F.lit("/")).alias("url"))
    frontier = frontier_update(
        seeds,
        links.select(F.col("loc").alias("canonical_link")),
        max_per_host=10,
    )
    gated = robots_filter(
        frontier.select(F.col("url")), rules, url_col="url", id_col="url"
    )
    sched = fetch_schedule(
        gated.where("allowed").select("url"), delays, default_delay_ms=500
    )
    return sched.select("url", "host", "slot", "delay_ms", "fetch_offset_ms")


_SQL_CRAWL_LOOP = r"""
WITH h AS (SELECT DISTINCT (doc_id % 10) AS i FROM documents),
fx AS (
  SELECT 'http://h' || i::VARCHAR || '.example.com/' AS url,
         'h' || i::VARCHAR || '.example.com' AS host, 0 AS slot, i FROM h
  UNION ALL
  SELECT 'http://h' || i::VARCHAR || '.example.com/p/a',
         'h' || i::VARCHAR || '.example.com', 1, i FROM h
  UNION ALL
  SELECT 'http://h' || i::VARCHAR || '.example.com/p/b',
         'h' || i::VARCHAR || '.example.com', 2, i FROM h
)
SELECT url, host, slot::BIGINT AS slot,
       (CASE WHEN i % 3 <> 0 THEN i * 1000 ELSE 500 END)::BIGINT AS delay_ms,
       (slot * CASE WHEN i % 3 <> 0 THEN i * 1000 ELSE 500 END)::BIGINT
         AS fetch_offset_ms
FROM fx
"""


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/reward-model preference-pair construction over the
    transcript shape: events become turns (the sft_corpus role
    mapping), assistant turns carry their ``value`` as a preference
    score, and each conversation with >=2 scored responses and a
    strict best>worst margin emits one (prompt, chosen, rejected)
    row. Margin is floor((best-worst)*1e6) — integer, IEEE-exact in
    both engines; raw doubles never reach the output. The oracle
    replays the ranking windows, the tie-breaks, and the first-user-
    turn prompt lookup."""
    from beats_spark.operators.chat import preference_pairs

    ev = _load(spark, sf_dir, "events")
    role = (
        F.when(F.col("event_type") == "click", "assistant")
        .when(F.col("event_type") == "purchase", "tool")
        .when(F.col("event_type") == "error", "system")
        .otherwise("user")
    )
    turns = ev.select(
        "user_id",
        "ts",
        "event_id",
        role.alias("role"),
        F.concat(
            F.col("event_type"), F.lit("#"), F.col("event_id").cast("string")
        ).alias("text"),
        F.when(role == "assistant", F.col("value")).alias("score"),
    )
    pp = preference_pairs(
        turns, key_col="user_id", order_cols=("ts", "event_id")
    )
    return pp.select(
        "user_id", "prompt", "chosen", "rejected", "margin_micro",
        "n_candidates",
    )


_SQL_PREFERENCE_PAIRS = r"""
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'click' THEN 'assistant'
              WHEN 'purchase' THEN 'tool' WHEN 'error' THEN 'system'
              ELSE 'user' END AS role,
         event_type || '#' || event_id::VARCHAR AS text,
         value AS score
  FROM events
), cand AS (
  SELECT * FROM t
  WHERE role = 'assistant' AND score IS NOT NULL AND text IS NOT NULL
), r AS (
  SELECT user_id, text, score,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY score DESC, ts ASC, event_id ASC) AS rb,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY score ASC, ts DESC, event_id DESC) AS rw
  FROM cand
), p AS (
  SELECT user_id,
    max(CASE WHEN rb = 1 THEN text END) AS chosen,
    max(CASE WHEN rb = 1 THEN score END) AS cs,
    max(CASE WHEN rw = 1 THEN text END) AS rejected,
    max(CASE WHEN rw = 1 THEN score END) AS rs,
    count(*)::BIGINT AS n_candidates
  FROM r GROUP BY user_id
), pr AS (
  SELECT user_id, text AS prompt FROM (
    SELECT user_id, text,
      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM t WHERE role = 'user'
  ) WHERE rn = 1
)
SELECT p.user_id, COALESCE(pr.prompt, '') AS prompt, chosen, rejected,
       floor((cs - rs) * 1e6)::BIGINT AS margin_micro, n_candidates
FROM p LEFT JOIN pr USING (user_id)
WHERE n_candidates >= 2 AND cs > rs
"""


def q_preference_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bias audit (chat.preference_length_stats) over the
    preference_pairs fixture: chosen-longer / rejected-longer /
    equal-length counts and summed char-length difference per
    floor-log2 margin bucket — the verbosity-bias check an RLHF
    pipeline runs before training a reward model. Oracle wraps the
    preference_pairs SQL as a CTE and replays the bucket/length
    arithmetic."""
    from beats_spark.operators.chat import preference_length_stats

    return preference_length_stats(q_preference_pairs(spark, sf_dir))


_SQL_PREFERENCE_STATS = (
    "WITH pairs AS (" + _SQL_PREFERENCE_PAIRS + ")\n"
    + r"""
SELECT (CASE WHEN margin_micro <= 0 THEN -1
             ELSE length(bin(margin_micro)) - 1 END)::INTEGER AS margin_bucket,
       count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN length(chosen) > length(rejected) THEN 1 ELSE 0 END)::BIGINT AS chosen_longer,
       sum(CASE WHEN length(chosen) < length(rejected) THEN 1 ELSE 0 END)::BIGINT AS rejected_longer,
       sum(CASE WHEN length(chosen) = length(rejected) THEN 1 ELSE 0 END)::BIGINT AS len_equal,
       sum(length(chosen) - length(rejected))::BIGINT AS sum_len_diff
FROM pairs GROUP BY 1
"""
)


def q_tool_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-agent loop detection (analytics.tool_loops): longest
    consecutive same-tool run per conversation + how many runs reach
    min_repeats=3, over events-as-turns (every 19th turn a NULL tool
    to exercise the exclusion). The oracle replays the two-pass
    run-length encoding and the run_id tie-break."""
    from beats_spark.operators.analytics import tool_loops

    ev = _load(spark, sf_dir, "events")
    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        F.when(F.col("event_id") % 19 != 0, F.col("event_type")).alias("tool"),
        "ts",
        "event_id",
    )
    return tool_loops(
        turns, key_col="conv_id", tool_col="tool", order_cols=("ts", "event_id")
    )


_SQL_TOOL_LOOPS = r"""
WITH t AS (
  SELECT user_id AS conv_id, event_type AS tool, ts, event_id
  FROM events WHERE event_id % 19 <> 0
), f AS (
  SELECT conv_id, tool, ts, event_id,
         CASE WHEN lag(tool) OVER w IS NULL OR lag(tool) OVER w <> tool
              THEN 1 ELSE 0 END AS new_run
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, event_id)
), r AS (
  SELECT conv_id, tool,
         sum(new_run) OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS run_id
  FROM f
), runs AS (
  SELECT conv_id, run_id, tool, count(*)::BIGINT AS len
  FROM r GROUP BY 1, 2, 3
), best AS (
  SELECT conv_id, run_id, tool, len,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY len DESC, run_id ASC) AS rn
  FROM runs
)
SELECT conv_id,
       sum(len)::BIGINT AS n_turns,
       max(CASE WHEN rn = 1 THEN len END)::BIGINT AS max_run,
       max(CASE WHEN rn = 1 THEN tool END) AS run_tool,
       sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_loops
FROM best GROUP BY conv_id
"""


def _schema_drift_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four ingest waves (batch = event_id % 4) of an evolving JSON
    payload, Spark side. Wave 0 is the contract baseline {a:num,
    b:str}; wave 1 adds key c (bool); wave 2 turns b numeric, drops a
    from half its rows (event_id % 8 = 2) and plants malformed text
    on every 7th event; wave 3 drops a entirely, adds d (array) and a
    sometimes-null g. Every 97th event carries a NULL payload to keep
    the rows / n_valid / malformed denominators honest. The oracle
    CTE in :func:`_sql_schema_drift` builds the identical strings."""
    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    es = eid.cast("string")
    et = F.col("event_type")
    w0 = F.concat(F.lit('{"a":'), es, F.lit(',"b":"'), et, F.lit('"}'))
    w1 = F.concat(F.lit('{"a":'), es, F.lit(',"b":"'), et, F.lit('","c":true}'))
    w2 = (
        F.when(eid % 7 == 0, F.lit("{bad"))
        .when(eid % 8 == 2, F.concat(F.lit('{"b":'), es, F.lit("}")))
        .otherwise(F.concat(F.lit('{"a":'), es, F.lit(',"b":'), es, F.lit("}")))
    )
    w3 = F.concat(
        F.lit('{"b":"'), et, F.lit('","d":['), es, F.lit(",1]"),
        F.when(eid % 5 == 0, F.lit(',"g":null')).otherwise(F.lit("")),
        F.lit("}"),
    )
    return ev.select(
        (eid % 4).cast("long").alias("batch"),
        F.when(eid % 97 == 0, F.lit(None).cast("string"))
        .when(eid % 4 == 0, w0)
        .when(eid % 4 == 1, w1)
        .when(eid % 4 == 2, w2)
        .otherwise(w3)
        .alias("props"),
    )


def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-over-baseline payload schema audit (operators/contracts.py
    schema_drift): the proactive twin of decode_json_fields' reactive
    error tagging (/root/reference/libbeat/processors/actions/
    decode_json_fields.go) — per (wave, key): dominant value class vs
    the baseline wave, integer-ppm presence shift, new/dropped/
    type-changed flags, and the wave's malformed-payload count. The
    planted fixture exercises every branch: a new bool key, a str→num
    change, a 50% presence drop, a dropped key, a JSON-null class,
    malformed text, and NULL payloads. The oracle rebuilds the whole
    report from json_keys/json_type over the same planted strings."""
    from beats_spark.operators.contracts import schema_drift

    planted = _schema_drift_planted(spark, sf_dir)
    return schema_drift(planted, "props", "batch", base_batch=0)


def _sql_schema_drift() -> str:
    from beats_spark.operators.contracts import schema_drift_sql

    planted = r"""
  SELECT (event_id % 4)::BIGINT AS batch,
         CASE
           WHEN event_id % 97 = 0 THEN NULL
           WHEN event_id % 4 = 0 THEN
             '{"a":' || event_id::VARCHAR || ',"b":"' || event_type || '"}'
           WHEN event_id % 4 = 1 THEN
             '{"a":' || event_id::VARCHAR || ',"b":"' || event_type
               || '","c":true}'
           WHEN event_id % 4 = 2 THEN
             CASE WHEN event_id % 7 = 0 THEN '{bad'
                  WHEN event_id % 8 = 2 THEN
                    '{"b":' || event_id::VARCHAR || '}'
                  ELSE '{"a":' || event_id::VARCHAR || ',"b":'
                    || event_id::VARCHAR || '}'
             END
           ELSE
             '{"b":"' || event_type || '","d":[' || event_id::VARCHAR || ',1]'
               || CASE WHEN event_id % 5 = 0 THEN ',"g":null' ELSE '' END
               || '}'
         END AS props
  FROM events
"""
    return schema_drift_sql(planted, "props", "batch", base_batch=0)


def q_refusal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assistant refusal-rate audit per tool (chat.refusal_stats):
    events-as-turns with a planted refusal battery — every 11th turn
    an apology+can't compound (priority must pick 'apology'), every
    13th a plain 'I cannot', every 17th an 'As an AI … unable to'
    compound (priority must pick 'unable'), every 97th a NULL text
    (counted in the denominator, never a refusal), every 23rd a user
    turn (excluded). Output per tool: assistant/refusal counts,
    integer-ppm rate, dominant marker + count. The oracle replays the
    planting, the ordered containment battery and the two-level
    dominant-marker rollup."""
    from beats_spark.operators.chat import refusal_stats

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    role = F.when(eid % 23 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    text = (
        F.when(eid % 97 == 0, F.lit(None).cast("string"))
        .when(eid % 11 == 0, F.lit("I'm sorry, but I can't help with that request."))
        .when(
            eid % 13 == 0,
            F.concat(F.lit("I cannot assist with "), F.col("event_type"), F.lit(".")),
        )
        .when(eid % 17 == 0, F.lit("As an AI, I am unable to access that."))
        .otherwise(
            F.concat(F.lit("Sure! Here is result #"), eid.cast("string"), F.lit("."))
        )
    )
    turns = ev.select(
        role.alias("role"), text.alias("text"), F.col("event_type").alias("tool")
    )
    return refusal_stats(turns)


_SQL_REFUSAL_STATS = r"""
WITH t AS (
  SELECT CASE WHEN event_id % 23 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 97 = 0 THEN NULL
              WHEN event_id % 11 = 0
                THEN 'I''m sorry, but I can''t help with that request.'
              WHEN event_id % 13 = 0
                THEN 'I cannot assist with ' || event_type || '.'
              WHEN event_id % 17 = 0 THEN 'As an AI, I am unable to access that.'
              ELSE 'Sure! Here is result #' || event_id::VARCHAR || '.'
         END AS text,
         event_type AS tool
  FROM events
), a AS (
  SELECT tool,
         CASE WHEN strpos(lower(text), 'i''m sorry') > 0 THEN 'apology'
              WHEN strpos(lower(text), 'i cannot') > 0 THEN 'cannot'
              WHEN strpos(lower(text), 'i can''t') > 0 THEN 'cant'
              WHEN strpos(lower(text), 'i won''t') > 0 THEN 'wont'
              WHEN strpos(lower(text), 'unable to') > 0 THEN 'unable'
              WHEN strpos(lower(text), 'as an ai') > 0 THEN 'as_an_ai'
         END AS marker
  FROM t WHERE role = 'assistant'
), per AS (
  SELECT tool, marker, count(*)::BIGINT AS n FROM a GROUP BY 1, 2
), tot AS (
  SELECT tool, sum(n)::BIGINT AS n_assistant,
         sum(CASE WHEN marker IS NOT NULL THEN n ELSE 0 END)::BIGINT AS n_refusals
  FROM per GROUP BY tool
), top AS (
  SELECT tool, marker AS top_marker, n AS top_marker_n,
         row_number() OVER (PARTITION BY tool
                            ORDER BY n DESC, marker ASC) AS rn
  FROM per WHERE marker IS NOT NULL
)
SELECT tot.tool, n_assistant, n_refusals,
       (n_refusals * 1000000 // n_assistant)::BIGINT AS refusal_ppm,
       top_marker, COALESCE(top_marker_n, 0)::BIGINT AS top_marker_n
FROM tot LEFT JOIN top ON top.tool = tot.tool AND top.rn = 1
"""


def q_diversity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n corpus diversity per source (textstats.
    ngram_diversity): total/distinct 1/2/3-gram counts and the
    integer-ppm distinct ratio — the post-dedup mode-collapse audit
    (cross-document boilerplate keeps per-doc stats healthy while
    corpus-level diversity craters). The oracle replays the dedup-
    normalization tokenizer, the multiplicity gram walk and the exact
    distinct counts."""
    from beats_spark.operators.textstats import ngram_diversity

    docs = _load(spark, sf_dir, "documents")
    return ngram_diversity(docs, "text", "source", ns=(1, 2, 3))


_SQL_DIVERSITY_STATS = r"""
WITH base AS (
  SELECT source,
         string_split_regex(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
  WHERE text IS NOT NULL
    AND trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> ''
), g AS (
  SELECT source, tn.n AS n,
         array_to_string(toks[ti.i + 1 : ti.i + tn.n], ' ') AS gram
  FROM base,
       unnest([1, 2, 3]) AS tn(n),
       unnest(range(0, greatest(len(toks) - tn.n, 0) + 1)) AS ti(i)
)
SELECT source, n::INTEGER AS n, count(*)::BIGINT AS n_grams,
       count(DISTINCT gram)::BIGINT AS n_distinct,
       (count(DISTINCT gram) * 1000000 // count(*))::BIGINT AS distinct_ppm
FROM g GROUP BY 1, 2
"""


def q_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source × benchmark-split contamination rollup (textstats.
    contamination_matrix) — the data-card table behind the per-doc
    decontaminate sweep: every 13th document doubles as a verbatim
    benchmark item (split dev/test by parity), so every source
    provably leaks and the matrix counts docs/pairs/windows per cell.
    The oracle replays the 32-char/16-stride rolling fingerprints and
    both rollup levels."""
    from beats_spark.operators.textstats import contamination_matrix

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    train = docs.select("doc_id", "source", "text")
    eval_ = docs.where(did % 13 == 0).select(
        "doc_id",
        F.when(did % 26 == 0, F.lit("test")).otherwise(F.lit("dev")).alias("split"),
        "text",
    )
    return contamination_matrix(
        train, eval_, train_group="source", eval_group="split"
    )


_SQL_CONTAMINATION_MATRIX = """
WITH tf AS (
  SELECT DISTINCT doc_id AS train_id, source AS train_group,
         md5(substr(text, s, 32)) AS fp
  FROM documents,
       unnest(range(1, greatest(length(text) - 32 + 1, 1) + 1, 16)) AS t(s)
), ef AS (
  SELECT DISTINCT doc_id AS eval_id,
         CASE WHEN doc_id % 26 = 0 THEN 'test' ELSE 'dev' END AS eval_group,
         md5(substr(text, s, 32)) AS fp
  FROM documents,
       unnest(range(1, greatest(length(text) - 32 + 1, 1) + 1, 16)) AS t(s)
  WHERE doc_id % 13 = 0
), pairs AS (
  SELECT train_group, eval_group, train_id, eval_id,
         count(*)::BIGINT AS shared_windows
  FROM tf JOIN ef USING (fp) GROUP BY 1, 2, 3, 4
)
SELECT train_group, eval_group,
       count(DISTINCT train_id)::BIGINT AS n_train_docs,
       count(DISTINCT eval_id)::BIGINT AS n_eval_docs,
       count(*)::BIGINT AS n_pairs,
       sum(shared_windows)::BIGINT AS shared_windows
FROM pairs GROUP BY 1, 2
"""


def q_strip_repeated_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal (keep-first): plants a
    repeated header line, a thrice-repeated footer (one copy with
    trailing spaces, proving trimmed-identity matching) and a blank
    separator into every document, then strips the repeats with the
    zero-shuffle higher-order-filter operator. The oracle replays the
    construction and the keep-first rule via a min(pos) window."""
    from beats_spark.operators.dedup import strip_repeated_lines

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    hdr = F.concat(F.lit("hdr "), (did % 7).cast("string"))
    planted = docs.select(
        "doc_id",
        F.concat(
            hdr, F.lit("\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\n"), hdr,
            F.when(
                did % 3 == 0,
                F.lit("\n\nfooter line\nfooter line  \nfooter line"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return strip_repeated_lines(planted, "text", "doc_id")


_SQL_STRIP_REPEATED_LINES = r"""
WITH docs2 AS (
  SELECT doc_id,
    'hdr ' || (doc_id % 7)::VARCHAR || chr(10)
    || COALESCE(text, '')
    || chr(10) || 'hdr ' || (doc_id % 7)::VARCHAR
    || (CASE WHEN doc_id % 3 = 0
             THEN chr(10) || chr(10) || 'footer line' || chr(10)
                  || 'footer line  ' || chr(10) || 'footer line'
             ELSE '' END)
    AS text
  FROM documents
), lines AS (
  SELECT doc_id, u.s.pos AS pos, u.s.line AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2),
       unnest(list_transform(range(1, len(l) + 1),
                             i -> {'pos': i, 'line': l[i]})) AS u(s)
), k AS (
  SELECT doc_id, pos, line,
         min(pos) OVER (PARTITION BY doc_id, trim(line)) AS firstpos
  FROM lines
), kept AS (
  SELECT doc_id, pos, line FROM k
  WHERE trim(line) = '' OR pos = firstpos
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, len(string_split(text, chr(10)))::BIGINT AS n_lines
  FROM docs2
)
SELECT t.doc_id, COALESCE(r.clean, '') AS text, t.n_lines,
       COALESCE(r.n_kept, 0)::BIGINT AS n_kept,
       (t.n_lines - COALESCE(r.n_kept, 0))::BIGINT AS n_removed
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding repair: plants the three dominant real-corpus mojibake
    families (curly-quote/dash punctuation, Latin-1 letters, Â-prefixed
    NBSP/guillemets/degree) into deterministic document subsets, then
    repairs them with the frozen-table single-pass operator. Both
    engines run the SAME frozen replace chain (encoding.py builds the
    oracle expression from the table), so fixed text must match
    byte-for-byte and the changed-flag must agree."""
    from beats_spark.operators.encoding import fix_mojibake

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                did % 4 == 0, F.lit(" donâ€™t â€” stop â€¦")
            ).when(
                did % 4 == 1, F.lit(" caffÃ© crÃ¨me Ã¼ber niÃ±o")
            ).when(
                # NB: the NBSP mojibake is Â + \xa0 (0xC2 0xA0 read as
                # cp1252), not Â + ASCII space — escape it explicitly.
                did % 4 == 2, F.lit(" Â«quotedÂ» atÂ\xa0100Â°")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    fixed = fix_mojibake(planted, "text")
    return fixed.select("doc_id", "text", "had_mojibake")


def _sql_fix_mojibake() -> str:
    from beats_spark.operators.encoding import mojibake_oracle_expr

    planted = (
        "COALESCE(text, '') || (CASE"
        " WHEN doc_id % 4 = 0 THEN ' donâ€™t"
        " â€” stop â€¦'"
        " WHEN doc_id % 4 = 1 THEN ' caffÃ© crÃ¨me"
        " Ã¼ber niÃ±o'"
        " WHEN doc_id % 4 = 2 THEN ' Â«quotedÂ»"
        " atÂ 100Â°'"
        " ELSE '' END)"
    )
    fixed = mojibake_oracle_expr("raw")
    return f"""
WITH docs2 AS (
  SELECT doc_id, {planted} AS raw FROM documents
)
SELECT doc_id, {fixed} AS text,
       length(raw) > length({fixed}) AS had_mojibake
FROM docs2
"""


def q_script_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writing-script composition: replaces deterministic document
    subsets with CJK (Han+kana), Cyrillic, Arabic and digit-heavy
    text so every dominant-script branch and the precedence
    tie-break are exercised, then counts the five script classes.
    The oracle uses the IDENTICAL \\x{...} char-class ranges (they
    parse the same in Java regex and RE2)."""
    from beats_spark.operators.textstats import script_composition

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 5 == 0, F.lit("你好世界 こんにちは 世界 조선말"))
        .when(did % 5 == 1, F.lit("привет мир снова и снова"))
        .when(did % 5 == 2, F.lit("مرحبا بالعالم مرة أخرى"))
        .when(did % 5 == 3, F.lit("12345 67890 +-/*"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return script_composition(planted, "text", "doc_id")


_SQL_SCRIPT_STATS = r"""
WITH docs2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN '你好世界 こんにちは 世界 조선말'
         WHEN doc_id % 5 = 1 THEN 'привет мир снова и снова'
         WHEN doc_id % 5 = 2 THEN 'مرحبا بالعالم مرة أخرى'
         WHEN doc_id % 5 = 3 THEN '12345 67890 +-/*'
         ELSE text END AS text
  FROM documents
), c AS (
  SELECT doc_id,
    COALESCE(length(text), 0)::BIGINT AS n_chars,
    COALESCE(len(regexp_extract_all(text,
      '[A-Za-z\x{00c0}-\x{024f}]')), 0)::BIGINT AS latin,
    COALESCE(len(regexp_extract_all(text,
      '[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]')),
      0)::BIGINT AS cjk,
    COALESCE(len(regexp_extract_all(text,
      '[\x{0400}-\x{04ff}]')), 0)::BIGINT AS cyrillic,
    COALESCE(len(regexp_extract_all(text,
      '[\x{0600}-\x{06ff}]')), 0)::BIGINT AS arabic,
    COALESCE(len(regexp_extract_all(text, '[0-9]')), 0)::BIGINT AS digit
  FROM docs2
)
SELECT doc_id, n_chars, latin, cjk, cyrillic, arabic, digit,
  CASE WHEN latin >= cjk AND latin >= cyrillic AND latin >= arabic
            AND latin > 0 THEN 'latin'
       WHEN cjk >= cyrillic AND cjk >= arabic AND cjk > 0 THEN 'cjk'
       WHEN cyrillic >= arabic AND cyrillic > 0 THEN 'cyrillic'
       WHEN arabic > 0 THEN 'arabic'
       ELSE 'none' END AS dominant_script
FROM c
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: the frozen fastText-style hashed
    bag-of-words logistic classifier (functions/quality_model.py,
    trained by the deterministic scripts/train_quality.py) scores
    every document in integer milli units. Junk is planted into two
    deterministic subsets (keyword stuffing, nav boilerplate) so both
    classes appear; pure single-token repetition is out of scope for
    a BoW model (the quality_filter repetition battery owns that
    signal). The oracle indexes the SAME literal weight table —
    the SQL is generated from it."""
    from beats_spark.operators.textstats import quality_classifier

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(
            did % 7 == 0,
            F.lit(
                "cheap buy now click here free offer deal sale discount"
                " casino winner prize cheap buy now"
            ),
        )
        .when(
            did % 7 == 3,
            F.lit("HOME | ABOUT | CONTACT | LOGIN | PRIVACY | TERMS | FAQ"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return quality_classifier(planted, "text", "doc_id")


def _sql_quality_classifier() -> str:
    from beats_spark.functions.quality_model import (
        QUALITY_BIAS_MILLI,
        QUALITY_BUCKETS,
        QUALITY_SEED,
        QUALITY_WEIGHTS_MILLI,
    )

    table = ", ".join(str(v) for v in QUALITY_WEIGHTS_MILLI)
    return f"""
WITH docs2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0
         THEN 'cheap buy now click here free offer deal sale discount'
              || ' casino winner prize cheap buy now'
         WHEN doc_id % 7 = 3
         THEN 'HOME | ABOUT | CONTACT | LOGIN | PRIVACY | TERMS | FAQ'
         ELSE text END AS text
  FROM documents
), toks AS (
  SELECT doc_id,
    list_filter(string_split(trim(regexp_replace(lower(text),
                                                 '\\s+', ' ', 'g')), ' '),
                t -> t <> '') AS tk
  FROM docs2
), s AS (
  SELECT doc_id, len(tk)::BIGINT AS n_tokens,
    CASE WHEN tk IS NULL OR len(tk) = 0 THEN NULL
         ELSE {QUALITY_BIAS_MILLI} +
           (list_sum(list_transform(tk, t ->
              ([{table}])[
                ((('0x' || substr(md5('s{QUALITY_SEED}|' || t), 1, 15))
                  ::BIGINT) % {QUALITY_BUCKETS}) + 1]
            ))::BIGINT // len(tk))
    END AS quality_milli
  FROM toks
)
SELECT doc_id, n_tokens, quality_milli,
       quality_milli >= 0 AS keep_quality
FROM s
"""


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: every document gets a
    (shard, pos) address from one md5 hash — shard by modulus,
    position by per-shard hash order — with no global sort anywhere.
    The oracle replays the 60-bit hash, the modulus and the window."""
    from beats_spark.operators.sampling import shuffle_shards

    docs = _load(spark, sf_dir, "documents").select("doc_id")
    sh = shuffle_shards(docs, "doc_id", n_shards=16, seed=3)
    return sh.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("pos").cast("long").alias("pos"),
    )


_SQL_SHUFFLE_SHARDS = r"""
WITH h AS (
  SELECT doc_id,
    ('0x' || substr(md5('s3|' || doc_id::VARCHAR), 1, 15))::BIGINT AS hh
  FROM documents
)
SELECT doc_id, (hh % 16)::BIGINT AS shard,
       (row_number() OVER (PARTITION BY hh % 16 ORDER BY hh, doc_id)
        - 1)::BIGINT AS pos
FROM h
"""


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis (operators/scale.py key_skew_stats): two hot
    user_ids are planted (every 3rd event → user 7, every 11th →
    user 13) so the heavy-hitter filter and the salt recommendation
    both fire; the oracle replays the identical integer arithmetic."""
    from beats_spark.operators.scale import key_skew_stats

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    planted = ev.select(
        F.when(eid % 3 == 0, F.lit(7))
        .when(eid % 11 == 0, F.lit(13))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("user_id")
    )
    out = key_skew_stats(planted, "user_id", n_partitions=64, heavy_milli=2000)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("share_ppm").cast("long").alias("share_ppm"),
        F.col("rec_salt").cast("long").alias("rec_salt"),
        F.col("avg_cnt").cast("long").alias("avg_cnt"),
    )


_SQL_KEY_SKEW = r"""
WITH ev AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN 7
              WHEN event_id % 11 = 0 THEN 13
              ELSE user_id END AS user_id
  FROM events
), c AS (
  SELECT user_id, count(*)::BIGINT AS cnt FROM ev GROUP BY user_id
), t AS (
  SELECT sum(cnt)::BIGINT AS total_rows, count(*)::BIGINT AS n_keys FROM c
)
SELECT user_id::BIGINT AS user_id, cnt,
       (cnt * 1000000 // total_rows)::BIGINT AS share_ppm,
       ((cnt * 64 + total_rows - 1) // total_rows)::BIGINT AS rec_salt,
       (total_rows // n_keys)::BIGINT AS avg_cnt
FROM c, t
WHERE cnt * 1000 >= 2000 * (total_rows // n_keys)
"""


def q_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (operators/scale.py salted_agg) —
    the REMEDIATION that key_skew diagnoses: per event_type (5 values
    over the whole corpus — every key is a hot key at 10¹² rows), the
    row count and the floor-micro value sum, computed through a
    (key, salt)-partial → key-final split so no reducer ever holds a
    full key. COUNT/SUM decompose exactly over the salt, so the
    oracle is the PLAIN GROUP BY — the equality is the point."""
    from beats_spark.operators.scale import salted_agg

    ev = _load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        "event_type",
        sums={"sum_value_micro": F.floor(F.col("value") * 1e6)},
        n_salts=32,
        salt_cols=["event_id"],
    )
    return out.select(
        "event_type",
        F.col("cnt").cast("long").alias("n_events"),
        F.col("sum_value_micro").cast("long").alias("sum_value_micro"),
    )


_SQL_SKEW_AGG = r"""
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(floor(value * 1e6)::BIGINT)::BIGINT AS sum_value_micro
FROM events GROUP BY event_type
"""


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot release diff (operators/snapshots.py corpus_diff +
    corpus_diff_stats): v1 = documents minus the doc_id%10=3 slice,
    v2 = documents minus the %10=7 slice with every %5=0 text
    amended (and every %20=5 text NULLed, exercising the NULL-hash
    sentinel) — so all four statuses appear: %10=3 added, %10=7
    removed, %5=0 and %20=5 changed, the rest unchanged. The oracle
    replays the same md5 fingerprints through a full outer join."""
    from beats_spark.operators.snapshots import corpus_diff, corpus_diff_stats

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    v1 = docs.where(did % 10 != 3).select("doc_id", "text")
    v2 = docs.where(did % 10 != 7).select(
        "doc_id",
        F.when(did % 20 == 5, F.lit(None).cast("string"))
        .when(did % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus_diff_stats(corpus_diff(v1, v2, "doc_id", "text"))


def _sql_corpus_diff() -> str:
    from beats_spark.operators.snapshots import corpus_diff_sql

    old_sql = "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3"
    new_sql = """
      SELECT doc_id,
             CASE WHEN doc_id % 20 = 5 THEN NULL
                  WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 7
    """
    return corpus_diff_sql(old_sql, new_sql, "doc_id", "text")


def q_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement audit (operators/ranking.py fleiss_kappa):
    events become a fixed 5-rater panel (item = event_id div 5, one
    rating per event) labeling each item {yes, no, partial} via an LCG
    mix of event_id; every 4th item is planted as unanimous 'yes' so
    observed agreement beats chance and kappa lands strictly inside
    (0, 1). Items missing a full panel (the contiguity of event_id is
    NOT assumed) are dropped by the operator on both engines. The
    oracle replays the cancelled-T integer formulation exactly."""
    from beats_spark.operators.ranking import fleiss_kappa

    ev = _load(spark, sf_dir, "events")
    eid = F.col("event_id")
    item = F.expr("event_id div 5")
    mix = (eid * 1103515245 + 12345) % 2147483648
    cat = (
        F.when(item % 4 == 0, F.lit("yes"))
        .when(mix % 3 == 0, F.lit("yes"))
        .when(mix % 3 == 1, F.lit("no"))
        .otherwise(F.lit("partial"))
    )
    ratings = ev.select(item.alias("item"), cat.alias("category"))
    return fleiss_kappa(ratings, "item", "category", n_raters=5)


def _sql_rater_agreement() -> str:
    from beats_spark.operators.ranking import fleiss_kappa_sql

    ratings = """
      SELECT event_id // 5 AS item,
             CASE WHEN (event_id // 5) % 4 = 0 THEN 'yes'
                  WHEN (event_id * 1103515245 + 12345) % 2147483648 % 3 = 0
                       THEN 'yes'
                  WHEN (event_id * 1103515245 + 12345) % 2147483648 % 3 = 1
                       THEN 'no'
                  ELSE 'partial' END AS category
      FROM events
    """
    return fleiss_kappa_sql(ratings, "item", "category", n_raters=5)


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe cluster-aware split (sampling.cluster_safe_split):
    the dedup_cluster star+bridge duplicate graph feeds
    connected_components, then the split coin is flipped on the
    CLUSTER label instead of the doc id — every member of a near-dup
    cluster lands on the same side by construction (the straddle
    clean_split has to detect after the fact cannot occur here).
    Singleton docs (not in the graph) fall back to the plain hash
    split on their own id. The oracle recomputes true components with
    a recursive CTE and replays the identical md5 gate, so the
    hash-match proves both the graph traversal and the per-cluster
    split agreement row by row."""
    from beats_spark.operators.dedup import connected_components
    from beats_spark.operators.sampling import cluster_safe_split

    docs = _load(spark, sf_dir, "documents")
    spokes = docs.where("doc_id % 7 != 0 and doc_id % 3 != 0").select(
        F.col("doc_id").alias("a"),
        F.expr("doc_id - doc_id % 7").alias("b"),
    )
    bridges = docs.where(
        "doc_id % 7 = 0 and doc_id > 0 and (doc_id div 7) % 3 = 1"
    ).select(F.col("doc_id").alias("a"), F.expr("doc_id - 1").alias("b"))
    comp = connected_components(spokes.unionByName(bridges), "a", "b")
    out = cluster_safe_split(
        docs, comp, eval_fraction=0.25, seed=11
    )
    return out.select(
        "doc_id",
        F.col("component").cast("long").alias("component"),
        "split",
    )


_SQL_CLUSTER_SPLIT = f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS a, doc_id - doc_id % 7 AS b FROM documents
  WHERE doc_id % 7 != 0 AND doc_id % 3 != 0
  UNION ALL
  SELECT doc_id, doc_id - 1 FROM documents
  WHERE doc_id % 7 = 0 AND doc_id > 0 AND (doc_id // 7) % 3 = 1
), sym AS (
  SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges
), reach AS (
  SELECT u AS node, u AS label FROM sym
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
), comp AS (
  SELECT node, min(label) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id)::BIGINT AS component,
       CASE WHEN ('0x' || substr(md5(
                 's11|' || COALESCE(c.component, d.doc_id)::VARCHAR), 1, 15)
            )::BIGINT < {int(0.25 * (1 << 60))}
            THEN 'eval' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


_BLOOM_BITS, _BLOOM_K, _BLOOM_SEED = 1 << 11, 3, 11


def q_bloom_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter seen-set (sketches.bloom_build/bloom_probe): the
    bounded-size membership tier in front of a crawl frontier or
    incremental-ingest index. Pages get deterministic URLs; the 2/3
    with doc_id%3!=0 are 'already crawled' and build the filter; ALL
    pages probe it. Exactness contract: zero false negatives (every
    truly_seen page reads maybe_seen) and deterministic false
    positives — is_fp marks novel pages whose 3 bit positions all
    collide with set bits (n_bits=2048 keeps the fill ratio in the
    FP-visible range at every test SF). The oracle replays the position
    hashes, the distinct position set, and the all-k probe — the
    approximate structure still passes the exact hash gate because
    the STATE is integer-deterministic (module discipline)."""
    from beats_spark.operators.sketches import bloom_build, bloom_probe

    docs = _load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
    )
    pages = docs.select(
        "doc_id", url.alias("url"), (F.col("doc_id") % 3 != 0).alias("truly_seen")
    )
    bloom = bloom_build(
        pages.filter("truly_seen"), "url", _BLOOM_BITS, _BLOOM_K, _BLOOM_SEED
    )
    probed = bloom_probe(
        pages, bloom, "url", _BLOOM_BITS, _BLOOM_K, _BLOOM_SEED
    )
    return probed.select(
        "doc_id",
        "url",
        "truly_seen",
        "maybe_seen",
        (F.col("maybe_seen") & ~F.col("truly_seen")).alias("is_fp"),
    )


def _sql_bloom_seen() -> str:
    nb, k, seed = _BLOOM_BITS, _BLOOM_K, _BLOOM_SEED

    def pos(i: int) -> str:
        return (
            f"('0x' || substr(md5('s{seed * 1000 + i}|' || url), 1, 15))"
            f"::BIGINT % {nb}"
        )

    seen_bits = "\n  UNION ALL\n".join(
        f"  SELECT {pos(i)} AS bit FROM pages WHERE truly_seen"
        for i in range(k)
    )
    probe_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, url, truly_seen, {pos(i)} AS pos FROM pages"
        for i in range(k)
    )
    return f"""
WITH pages AS (
  SELECT doc_id,
         'https://' || source || '/doc/' || doc_id::VARCHAR AS url,
         doc_id % 3 <> 0 AS truly_seen
  FROM documents
), bits AS (
  SELECT DISTINCT bit FROM (
{seen_bits}
  )
), pp AS (
{probe_rows}
), j AS (
  SELECT pp.doc_id, pp.url, pp.truly_seen,
         count(*) FILTER (WHERE bits.bit IS NOT NULL) AS nhit
  FROM pp LEFT JOIN bits ON bits.bit = pp.pos
  GROUP BY 1, 2, 3
)
SELECT doc_id, url, truly_seen,
       nhit = {k} AS maybe_seen,
       (nhit = {k} AND NOT truly_seen) AS is_fp
FROM j
"""


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced shard planner (layout.shard_plan): global byte
    offsets + shard ids over documents in doc_id order via the
    two-pass distributed prefix sum (range-bucket → parallel
    per-bucket running sums → n_buckets-row bucket-offset broadcast)
    — NOT the single-partition global window the oracle is allowed to
    use (DuckDB runs on one node anyway). n_buckets=8 so the
    bucket-combination path is genuinely multi-bucket at every SF;
    the output is boundary-independent, so the sampled range split
    cannot affect parity. shard_bytes=16384 yields a multi-shard plan
    with straddling rows (first-byte-owns-the-row convention) at
    sf0.01."""
    from beats_spark.operators.layout import shard_plan

    docs = _load(spark, sf_dir, "documents")
    out = shard_plan(
        docs,
        F.octet_length(F.col("text")),
        shard_bytes=16384,
        order_col="doc_id",
        n_buckets=8,
    )
    return out.select(
        "doc_id",
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        "offset_bytes",
        "shard",
    )


_SQL_SHARD_PLAN = """
SELECT doc_id,
       strlen(text)::BIGINT AS n_bytes,
       COALESCE(SUM(strlen(text)) OVER (
         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0)::BIGINT AS offset_bytes,
       (COALESCE(SUM(strlen(text)) OVER (
         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) // 16384)::BIGINT AS shard
FROM documents
"""


def q_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text rollup (html.anchor_stats): planted per-doc HTML
    links 13 targets with 3 rotating anchor texts plus a
    fragment-variant link ('#sec' must fold into the same target), a
    hub target whose two anchors tie exactly (alpha/zeta at did%10==1
    vs ==6 over dense ids — lexicographic tie-break exercised), and
    the documented exclusions: a single-quoted anchor, a relative
    href, and a nested-markup anchor (all must NOT appear). The
    oracle replays the SAME regex grammar in DuckDB (RE2 vs Java
    agreement on the shared pattern) and both aggregations."""
    from beats_spark.operators.html import anchor_stats
    from beats_spark.operators.scale import spread

    docs = spread(_load(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    k = (did % 13).cast("string")
    t1 = (
        F.when(did % 3 == 0, F.lit("Read More"))
        .when(did % 3 == 1, F.lit(" read\n more "))
        .otherwise(F.lit("Details"))
    )
    html = F.concat(
        F.lit('<a href="https://site.example.org/p'), k, F.lit('">'),
        t1, F.lit("</a>"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<a href="https://site.example.org/p'), k,
                F.lit('#sec">sec link</a>'),
            ),
        ).otherwise(""),
        F.when(
            did % 10 == 1,
            F.lit('<a href="https://hub.example.net/t">alpha</a>'),
        ).otherwise(""),
        F.when(
            did % 10 == 6,
            F.lit('<a href="https://hub.example.net/t">zeta</a>'),
        ).otherwise(""),
        F.lit("<a href='https://skip.example/q'>sq</a>"
              '<a href="/rel.html">rel</a>'),
        F.when(
            did % 7 == 0,
            F.lit('<a href="https://nested.example/n"><b>x</b></a>'),
        ).otherwise(""),
    )
    return anchor_stats(docs.select("doc_id", html.alias("html")))


def _sql_anchor_stats() -> str:
    from beats_spark.operators.html import ANCHOR_PAIR_RE

    nl = chr(10)
    return f"""
WITH fx AS (
  SELECT doc_id,
    '<a href="https://site.example.org/p' || (doc_id % 13)::VARCHAR || '">'
    || (CASE WHEN doc_id % 3 = 0 THEN 'Read More'
             WHEN doc_id % 3 = 1 THEN ' read{nl} more '
             ELSE 'Details' END) || '</a>'
    || (CASE WHEN doc_id % 2 = 0
             THEN '<a href="https://site.example.org/p'
                  || (doc_id % 13)::VARCHAR || '#sec">sec link</a>'
             ELSE '' END)
    || (CASE WHEN doc_id % 10 = 1
             THEN '<a href="https://hub.example.net/t">alpha</a>'
             ELSE '' END)
    || (CASE WHEN doc_id % 10 = 6
             THEN '<a href="https://hub.example.net/t">zeta</a>'
             ELSE '' END)
    || '<a href=''https://skip.example/q''>sq</a><a href="/rel.html">rel</a>'
    || (CASE WHEN doc_id % 7 = 0
             THEN '<a href="https://nested.example/n"><b>x</b></a>'
             ELSE '' END) AS html
  FROM documents
), m AS (
  SELECT doc_id,
         unnest(regexp_extract_all(html, '{ANCHOR_PAIR_RE}', 0)) AS frag
  FROM fx
), p AS (
  SELECT doc_id,
         regexp_replace(
           regexp_extract(frag, '{ANCHOR_PAIR_RE}', 1), '#.*$', ''
         ) AS target,
         trim(regexp_replace(
           regexp_extract(frag, '{ANCHOR_PAIR_RE}', 2), '\\s+', ' ', 'g'
         )) AS anchor
  FROM m
  WHERE regexp_matches(
    regexp_extract(frag, '{ANCHOR_PAIR_RE}', 1), '^https?://')
), per AS (
  SELECT target, anchor, count(*) AS n FROM p GROUP BY 1, 2
), tot AS (
  SELECT target, count(*)::BIGINT AS n_refs,
         count(DISTINCT doc_id)::BIGINT AS n_docs
  FROM p GROUP BY 1
), tops AS (
  SELECT target, anchor AS top_anchor, n::BIGINT AS top_anchor_refs,
         row_number() OVER (
           PARTITION BY target ORDER BY n DESC, anchor ASC
         ) AS rn
  FROM per
)
SELECT t.target, t.n_refs, t.n_docs, s.top_anchor, s.top_anchor_refs
FROM tot t JOIN tops s ON s.target = t.target AND s.rn = 1
"""


def q_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive length trim (textstats.
    adaptive_length_filter): exact nearest-rank [p5, p95] token-count
    band per lang, thresholds broadcast back, every doc audited with
    its band and verdict. The oracle replays the whitespace token
    convention (the mixture_epochs twin expression), the nearest-rank
    selection with id tie-break, and the band join."""
    from beats_spark.operators.scale import spread
    from beats_spark.operators.textstats import adaptive_length_filter

    docs = spread(_load(spark, sf_dir, "documents"))
    return adaptive_length_filter(docs, "lang", "text", "doc_id", 5, 95)


_SQL_LENGTH_FILTER = r"""
WITH base AS (
  SELECT doc_id, lang,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT
           AS n_toks
  FROM documents
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang ORDER BY n_toks, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM base WHERE n_toks IS NOT NULL
), p AS (
  SELECT lang,
         max(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN n_toks END)::BIGINT
           AS lo_toks,
         max(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN n_toks END)::BIGINT
           AS hi_toks
  FROM r GROUP BY lang
)
SELECT b.doc_id, b.lang, b.n_toks, p.lo_toks, p.hi_toks,
       (b.n_toks >= p.lo_toks AND b.n_toks <= p.hi_toks) AS kept
FROM base b JOIN p USING (lang)
"""


def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair fetch-budget waterfill (crawl.crawl_budget): 37
    synthetic hosts with rotating politeness caps and a 250-fetch
    wave budget — small-eff hosts saturate, the big ones split the
    remainder with a non-zero mod spread, so every branch (saturated
    prefix, base share, +1 remainder units, 0-cap clamp) is live at
    every SF. The oracle replays the exact integer algorithm with a
    plain global window (DuckDB is single-node; the Spark side uses
    the two-pass distributed prefix instead — same output, proven by
    the hash gate)."""
    from beats_spark.operators.crawl import crawl_budget
    from beats_spark.operators.scale import spread

    docs = spread(_load(spark, sf_dir, "documents"))
    g = F.col("doc_id") % 37
    hosts = (
        docs.groupBy(g.alias("_g"))
        .agg(F.count(F.lit(1)).alias("demand"))
        .select(
            F.concat(F.lit("h"), F.col("_g").cast("string")).alias("host"),
            F.col("demand").cast("long").alias("demand"),
            (F.lit(4) + (F.col("_g") % 7) * 3).cast("long").alias("cap"),
        )
    )
    return crawl_budget(hosts, 250, n_buckets=4)


_SQL_CRAWL_BUDGET = """
WITH hosts AS (
  SELECT 'h' || g::VARCHAR AS host,
         count(*)::BIGINT AS demand,
         (4 + (g % 7) * 3)::BIGINT AS cap
  FROM (SELECT doc_id % 37 AS g FROM documents) GROUP BY g
), e AS (
  SELECT host, demand, cap,
         CASE WHEN cap IS NULL OR demand <= cap THEN demand ELSE cap END
           AS eff
  FROM hosts
), r AS (
  SELECT *,
         row_number() OVER (ORDER BY eff, host) AS i,
         COALESCE(SUM(eff) OVER (
           ORDER BY eff, host ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS s_excl,
         count(*) OVER () AS n
  FROM e
), sat AS (
  SELECT *, (s_excl + eff * (n - i + 1) <= 250) AS saturated FROM r
), kk AS (
  SELECT COALESCE(max(CASE WHEN saturated THEN i END), 0) AS k,
         COALESCE(max(CASE WHEN saturated THEN s_excl + eff END), 0) AS sk
  FROM sat
)
SELECT s.host, s.demand, s.cap, s.eff::BIGINT AS eff, s.saturated,
       (CASE WHEN s.saturated THEN s.eff
             ELSE (250 - kk.sk) // (s.n - kk.k)
                  + (CASE WHEN s.i - kk.k <= (250 - kk.sk) % (s.n - kk.k)
                          THEN 1 ELSE 0 END)
        END)::BIGINT AS allocated
FROM sat s, kk
"""


def q_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware duplicate keeper (dedup.dedup_keep_best): the
    dedup_cluster star+bridge graph, but the survivor of each cluster
    is the LONGEST member (n_chars, min-id tie-break) — the
    keep-best-duplicate practice — via a single max_by aggregate over
    a packed (score, -id) struct, never a corpus window sort. The
    oracle recomputes components with the recursive CTE and replays
    the argmax with an explicit deterministic window."""
    from beats_spark.operators.dedup import (
        connected_components,
        dedup_keep_best,
    )

    docs = _load(spark, sf_dir, "documents")
    spokes = docs.where("doc_id % 7 != 0 and doc_id % 3 != 0").select(
        F.col("doc_id").alias("a"),
        F.expr("doc_id - doc_id % 7").alias("b"),
    )
    bridges = docs.where(
        "doc_id % 7 = 0 and doc_id > 0 and (doc_id div 7) % 3 = 1"
    ).select(F.col("doc_id").alias("a"), F.expr("doc_id - 1").alias("b"))
    comp = connected_components(spokes.unionByName(bridges), "a", "b")
    out = dedup_keep_best(docs, comp, "n_chars")
    return out.select(
        "doc_id",
        F.col("component").cast("long").alias("component"),
        F.col("keeper_id").cast("long").alias("keeper_id"),
        "kept",
    )


_SQL_QUALITY_KEEPER = """
WITH RECURSIVE edges AS (
  SELECT doc_id AS a, doc_id - doc_id % 7 AS b FROM documents
  WHERE doc_id % 7 != 0 AND doc_id % 3 != 0
  UNION ALL
  SELECT doc_id, doc_id - 1 FROM documents
  WHERE doc_id % 7 = 0 AND doc_id > 0 AND (doc_id // 7) % 3 = 1
), sym AS (
  SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges
), reach AS (
  SELECT u AS node, u AS label FROM sym
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
), comp AS (
  SELECT node, min(label) AS component FROM reach GROUP BY node
), labeled AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY component ORDER BY n_chars DESC, doc_id ASC
  ) AS rn
  FROM labeled
), keep AS (
  SELECT component, doc_id AS keeper_id FROM ranked WHERE rn = 1
)
SELECT l.doc_id, l.component::BIGINT AS component,
       k.keeper_id::BIGINT AS keeper_id,
       (l.doc_id = k.keeper_id) AS kept
FROM labeled l JOIN keep k ON k.component = l.component
"""


_KMR_K, _KMR_D, _KMR_IT = 4, 64, 2


def _kmr_init() -> list[list[int]]:
    return [
        [((j * 31 + d * 17) % 21 - 10) * 40000 for d in range(_KMR_D)]
        for j in range(_KMR_K)
    ]


def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd refinement of an IVF coarse quantizer
    (similarity.kmeans_refine_quantized): formula-seeded integer
    centroids over the embeddings table, two exact-int64 update
    rounds (truncating integer means — negative sums included), then
    the final assignment. Output is the (cell, dim) centroid table
    with final cell sizes — 256 rows that encode the ENTIRE training
    trajectory, so a single hash match proves both engines ran the
    same clustering step for step. The oracle replays both rounds
    relationally (exploded vector ⋈ centroid join-aggregates) where
    Spark compiles literal-centroid codegen passes — same integers
    either way."""
    from beats_spark.operators.similarity import kmeans_refine_quantized

    emb = _load(spark, sf_dir, "embeddings")
    assign, cents = kmeans_refine_quantized(emb, _kmr_init(), _KMR_IT)
    sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    cdf = spark.createDataFrame(
        [
            (j, d, cents[j][d])
            for j in range(_KMR_K)
            for d in range(_KMR_D)
        ],
        "cell int, dim int, centroid_q long",
    )
    return cdf.join(sizes, "cell", "left").select(
        "cell",
        "dim",
        "centroid_q",
        F.coalesce(F.col("n_vecs"), F.lit(0)).cast("long").alias("n_vecs"),
    )


def _sql_kmeans_refine() -> str:
    k, d, it = _KMR_K, _KMR_D, _KMR_IT
    parts = [
        f"""qv AS (
  SELECT vec_id, r.range AS dim,
         floor(embedding[r.range + 1]::DOUBLE * 1000000)::BIGINT AS q
  FROM embeddings, range(0, {d}) r
), c0 AS (
  SELECT j.range AS cell, dd.range AS dim,
         (((j.range * 31 + dd.range * 17) % 21) - 10) * 40000 AS c
  FROM range(0, {k}) j, range(0, {d}) dd
)"""
    ]
    for i in range(it + 1):
        parts.append(
            f"""a{i} AS (
  SELECT vec_id, cell FROM (
    SELECT q.vec_id, c.cell,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY sum((q.q - c.c) * (q.q - c.c)), c.cell) AS rn
    FROM qv q JOIN c{i} c ON c.dim = q.dim
    GROUP BY q.vec_id, c.cell
  ) WHERE rn = 1
)"""
        )
        if i < it:
            parts.append(
                f"""c{i + 1} AS (
  SELECT p.cell, p.dim, COALESCE((u.s // u.n), p.c) AS c
  FROM c{i} p LEFT JOIN (
    SELECT a.cell, q.dim, sum(q.q)::BIGINT AS s, count(*)::BIGINT AS n
    FROM a{i} a JOIN qv q ON q.vec_id = a.vec_id
    GROUP BY a.cell, q.dim
  ) u ON u.cell = p.cell AND u.dim = p.dim
)"""
            )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT c{it}.cell::INT AS cell, c{it}.dim::INT AS dim,
       c{it}.c::BIGINT AS centroid_q,
       COALESCE(n.n, 0)::BIGINT AS n_vecs
FROM c{it} LEFT JOIN (
  SELECT cell, count(*)::BIGINT AS n FROM a{it} GROUP BY cell
) n ON n.cell = c{it}.cell
"""
    )


def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) sketch state per source (sketches.kmv_sketch):
    the 16 smallest distinct text-hashes of every source — the
    mergeable synopsis that answers corpus-overlap questions HLL
    can't (union AND intersection combine). State is exact integers,
    so the approximate operator passes the exact hash gate; the
    20-source fixture has ~25 distinct texts per source, so the
    rank cap genuinely truncates every group (k=16 < 25) at the gate
    SFs; the undersized-exact branch is pytest-pinned. Oracle: plain DISTINCT + window rank replay of the salted
    two-phase min-k (output is salt-independent by construction)."""
    from beats_spark.operators.sketches import kmv_sketch

    docs = _load(spark, sf_dir, "documents")
    return kmv_sketch(docs, "text", ["source"], k=16, salts=4)


_SQL_KMV_SKETCH = """
WITH h AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5('s0|' || text), 1, 15))::BIGINT AS h
  FROM documents
), r AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rank
  FROM h
)
SELECT source, rank::BIGINT AS rank, h FROM r WHERE rank <= 16
"""


def q_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-RELEASE flagship: duplicate graph →
    connected-components clusters → quality-aware keeper
    (dedup_keep_best, longest member survives) → leakage-safe
    cluster-aware split of the survivors (cluster_safe_split — no
    near-dup pair straddles train/eval) → size-balanced shard plan
    over the train side (shard_plan's distributed prefix sum). One
    audit row per document: cluster, keep verdict, split side
    (survivors only), byte offset + shard (train survivors only).
    The oracle rebuilds all four stages from first principles —
    recursive-CTE closure, window argmax, md5 gate, global running
    sum — so a single hash match proves the whole release pipeline."""
    from beats_spark.operators.dedup import (
        connected_components,
        dedup_keep_best,
    )
    from beats_spark.operators.layout import shard_plan
    from beats_spark.operators.sampling import cluster_safe_split

    docs = _load(spark, sf_dir, "documents")
    spokes = docs.where("doc_id % 7 != 0 and doc_id % 3 != 0").select(
        F.col("doc_id").alias("a"),
        F.expr("doc_id - doc_id % 7").alias("b"),
    )
    bridges = docs.where(
        "doc_id % 7 = 0 and doc_id > 0 and (doc_id div 7) % 3 = 1"
    ).select(F.col("doc_id").alias("a"), F.expr("doc_id - 1").alias("b"))
    comp = connected_components(spokes.unionByName(bridges), "a", "b")
    verdict = dedup_keep_best(docs, comp, "n_chars")
    kept_docs = docs.join(
        verdict.where("kept").select("doc_id"), "doc_id"
    )
    split = cluster_safe_split(
        kept_docs, comp, eval_fraction=0.25, seed=11
    )
    train = split.where("split = 'train'")
    plan = shard_plan(
        train,
        F.octet_length(F.col("text")),
        shard_bytes=16384,
        order_col="doc_id",
        n_buckets=8,
    )
    return (
        verdict.select(
            "doc_id",
            F.col("component").cast("long").alias("component"),
            "kept",
        )
        .join(split.select("doc_id", "split"), "doc_id", "left")
        .join(
            plan.select("doc_id", "offset_bytes", "shard"),
            "doc_id",
            "left",
        )
    )


_SQL_CORPUS_RELEASE = f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS a, doc_id - doc_id % 7 AS b FROM documents
  WHERE doc_id % 7 != 0 AND doc_id % 3 != 0
  UNION ALL
  SELECT doc_id, doc_id - 1 FROM documents
  WHERE doc_id % 7 = 0 AND doc_id > 0 AND (doc_id // 7) % 3 = 1
), sym AS (
  SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges
), reach AS (
  SELECT u AS node, u AS label FROM sym
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
), comp AS (
  SELECT node, min(label) AS component FROM reach GROUP BY node
), labeled AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
         d.n_chars, d.text
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY component ORDER BY n_chars DESC, doc_id ASC
  ) AS rn
  FROM labeled
), verdict AS (
  SELECT l.doc_id, l.component, (l.rn = 1) AS kept, l.text
  FROM ranked l
), split AS (
  SELECT doc_id, text,
         CASE WHEN ('0x' || substr(md5('s11|' || component::VARCHAR), 1, 15)
              )::BIGINT < {int(0.25 * (1 << 60))}
              THEN 'eval' ELSE 'train' END AS split
  FROM verdict WHERE kept
), plan AS (
  SELECT doc_id,
         COALESCE(SUM(strlen(text)) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS offset_bytes
  FROM split WHERE split = 'train'
)
SELECT v.doc_id, v.component::BIGINT AS component, v.kept,
       s.split, p.offset_bytes,
       (p.offset_bytes // 16384)::BIGINT AS shard
FROM verdict v
LEFT JOIN split s ON s.doc_id = v.doc_id
LEFT JOIN plan p ON p.doc_id = v.doc_id
"""


def q_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from bottom-k states alone
    (sketches.kmv_overlap_matrix): every doc_id%3==0 document's key
    is replaced by one of 13 planted 'shared-*' keys — both moduli
    are coprime to source = doc_id%20, so every source carries a
    partial, differing slice of the shared pool and the 190-pair
    matrix gets non-degenerate non-zero ``n_both`` cells (plants
    aligned to the source modulus collapse to all-or-nothing pairs
    and prove nothing — measured before this choice); all other documents keep their distinct text.
    The raw corpora are never joined — only the ≤ k-row-per-source
    states expand. Output is the exact-integer Jaccard sufficient
    statistic (k_used, n_both) per pair; the oracle rebuilds the
    states and replays the merged-bottom-k counting."""
    from beats_spark.operators.sketches import kmv_overlap_matrix, kmv_sketch

    docs = _load(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("shared-"), (F.col("doc_id") % 13).cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("key"),
    )
    st = kmv_sketch(keyed, "key", ["source"], k=16, salts=4)
    return kmv_overlap_matrix(st, "source", k=16)


_SQL_OVERLAP_MATRIX = """
WITH keyed AS (
  SELECT source,
         CASE WHEN doc_id % 3 = 0
              THEN 'shared-' || (doc_id % 13)::VARCHAR
              ELSE text END AS key
  FROM documents
), hh AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5('s0|' || key), 1, 15))::BIGINT AS h
  FROM keyed
), st AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hh
  ) WHERE rn <= 16
), srcs AS (
  SELECT DISTINCT source FROM st
), pr AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM srcs a, srcs b WHERE a.source < b.source
), u AS (
  SELECT pr.src_a, pr.src_b, st.h,
         (st.source = pr.src_a) AS ia, (st.source = pr.src_b) AS ib
  FROM pr JOIN st ON st.source = pr.src_a OR st.source = pr.src_b
), g AS (
  SELECT src_a, src_b, h, max(ia) AS ia, max(ib) AS ib
  FROM u GROUP BY 1, 2, 3
), r2 AS (
  SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
  FROM g
)
SELECT src_a, src_b, count(*)::BIGINT AS k_used,
       sum(CASE WHEN ia AND ib THEN 1 ELSE 0 END)::BIGINT AS n_both
FROM r2 WHERE rn <= 16 GROUP BY src_a, src_b
"""


_RECRAWL_NOW_US = 1_700_000_000_000_000


def q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven recrawl scheduling (crawl.recrawl_priority):
    synthetic fetch histories over 37 hosts exercise every branch —
    minutes-to-hours ages, unfetched pages (rate 0), a
    changes>fetches page (rate clamps at 10⁶ ppm), and a doc_id%97
    slice whose 'future' last_fetch clamps age to 0; per-host cap 5
    ranks deterministically (priority desc, url asc). ``now`` is a
    fixed literal — wall clocks never enter plans. The oracle replays
    the integer scoring and the window."""
    from beats_spark.operators.crawl import recrawl_priority

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("h"), (did % 37).cast("string"))
    now = _RECRAWL_NOW_US
    pages = docs.select(
        host.alias("host"),
        F.concat(host, F.lit("/p"), did.cast("string")).alias("url"),
        F.when(did % 97 == 0, F.lit(now + 1_000_000_000))
        .otherwise(F.lit(now) - (did % 1000 + 1) * 60_000_000)
        .cast("long")
        .alias("last_fetch_us"),
        (did % 9).cast("long").alias("n_fetches"),
        (did % 4).cast("long").alias("n_changes"),
    )
    return recrawl_priority(pages, now, per_host_cap=5)


_SQL_RECRAWL_PRIORITY = f"""
WITH pages AS (
  SELECT 'h' || (doc_id % 37)::VARCHAR AS host,
         'h' || (doc_id % 37)::VARCHAR || '/p' || doc_id::VARCHAR AS url,
         CASE WHEN doc_id % 97 = 0
              THEN {_RECRAWL_NOW_US} + 1000000000
              ELSE {_RECRAWL_NOW_US} - (doc_id % 1000 + 1) * 60000000
         END AS last_fetch_us,
         (doc_id % 9)::BIGINT AS n_fetches,
         (doc_id % 4)::BIGINT AS n_changes
  FROM documents
), s AS (
  SELECT url, host,
         (greatest({_RECRAWL_NOW_US} - last_fetch_us, 0) // 1000000)::BIGINT
           AS age_s,
         (CASE WHEN n_fetches > 0
               THEN least(n_changes * 1000000 // n_fetches, 1000000)
               ELSE 0 END)::BIGINT AS change_rate_ppm
  FROM pages
), p AS (
  SELECT *, (age_s * (change_rate_ppm + 10000))::BIGINT AS priority FROM s
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY host ORDER BY priority DESC, url ASC
  )::BIGINT AS host_rank
  FROM p
)
SELECT url, host, age_s, change_rate_ppm, priority, host_rank,
       (host_rank <= 5) AS due
FROM r
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (similarity.
    cosine_topk with exclude_same='label'): for each query vector the
    5 most similar vectors of a DIFFERENT label — the embedding-model
    training staple (the negatives that actually move the loss are
    the near-miss lookalikes, not random picks). Same block-GEMM
    plan as knn_bruteforce with the label mask applied inside the
    same pass; ids-only output (float-order-stable, knn_bruteforce
    precedent), oracle adds one label-inequality predicate."""
    from beats_spark.operators.similarity import cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(q, emb, k=5, exclude_same="label").select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id"
    )


_SQL_HARD_NEGATIVES = """
SELECT query_id, rank, neighbor_id FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings c
    ON q.vec_id <> c.vec_id AND q.label <> c.label
  WHERE q.vec_id < 20)
WHERE rank <= 5
"""


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (dedup.containment_pairs): the
    doc-inside-doc detector. Planted quote rows — the first 8
    normalized tokens of every doc_id%9==2 document (containment
    exactly 10⁶ against its source) and the same prefix with one
    foreign tail token for %9==5 (a strictly-partial ratio) — ride
    on the natural corpus; Jaccard would score both near 0. The
    oracle brute-forces list_intersect over all pairs with the
    identical integer ppm formula."""
    from beats_spark.operators.dedup import containment_pairs

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    prefix = F.concat_ws(" ", F.slice(toks, 1, 8))
    q1 = docs.where(did % 9 == 2).select(
        (did + 100000).alias("doc_id"), prefix.alias("text")
    )
    q2 = docs.where(did % 9 == 5).select(
        (did + 200000).alias("doc_id"),
        F.concat(prefix, F.lit(" zzqq"), did.cast("string")).alias("text"),
    )
    uni = docs.select("doc_id", "text").unionByName(q1).unionByName(q2)
    return containment_pairs(uni, n=3, threshold_ppm=700_000)


_SQL_CONTAINMENT = r"""
WITH toks0 AS (
  SELECT doc_id,
         string_split_regex(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
         ) AS toks
  FROM documents
), uni AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, array_to_string(toks[1:8], ' ')
  FROM toks0 WHERE doc_id % 9 = 2
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(toks[1:8], ' ') || ' zzqq' || doc_id::VARCHAR
  FROM toks0 WHERE doc_id % 9 = 5
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 3, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 3], ' ')
         )) AS grams
  FROM (
    SELECT doc_id,
           string_split_regex(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
           ) AS toks
    FROM uni
    WHERE trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))
          <> ''
  )
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams))::BIGINT AS inter,
         len(a.grams)::BIGINT AS n_a, len(b.grams)::BIGINT AS n_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, inter, n_a, n_b,
       (inter * 1000000 // least(n_a, n_b))::BIGINT AS containment_ppm
FROM p
WHERE inter * 1000000 // least(n_a, n_b) >= 700000
"""


# three distinct ~180-char spans for the winnowing plant — lowercase
# [a-z0-9 ] only, so the literals survive both engines' SQL quoting
_WINNOW_SPANS = tuple(
    " ".join(
        f"span{g} tok{g}{j} winnowmark{(g * 31 + j * 7) % 97}"
        for j in range(12)
    )
    for g in range(3)
)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-winnowing shared-span candidates (textstats.winnow_pairs,
    Schleimer/Wilkerson/Aiken SIGMOD 2003 — the MOSS selector): every
    doc_id%11==3 document gets one of three ~180-char spans appended
    ((doc_id div 11) % 3; modulus 11 is coprime to the source
    alignment, CLAUDE.md), so same-span docs MUST share interior
    fingerprints regardless of byte offset — the length >= k+w-1
    guarantee the stride-aligned rolling_fingerprint cannot give. The
    oracle replays the IDENTICAL generated winnow SQL (shared-battery
    discipline, html_steps_sql precedent) through a posting-capped
    self-join."""
    from beats_spark.operators.scale import spread
    from beats_spark.operators.textstats import winnow_pairs

    # the winnow selection is compute-dense (one md5 per char): spread
    # the single-file fixture scan so it runs at session parallelism
    # (no-op on a real many-file corpus — CLAUDE.md single-file trap)
    docs = spread(_load(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    span = F.element_at(
        F.array(*[F.lit(s) for s in _WINNOW_SPANS]),
        F.expr("cast((doc_id div 11) % 3 + 1 as int)"),
    )
    planted = docs.select(
        "doc_id",
        F.when(did % 11 == 3, F.concat(F.col("text"), F.lit(" "), span))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return winnow_pairs(planted, min_shared=2)


def _sql_winnow_pairs() -> str:
    from beats_spark.operators.textstats import winnow_fingerprint_sql

    fp = winnow_fingerprint_sql(
        "text", 24, 8, 4000, dialect="duckdb", hashes_only=True
    )
    case = (
        "CASE (doc_id // 11) % 3 "
        + " ".join(
            f"WHEN {g} THEN '{s}'" for g, s in enumerate(_WINNOW_SPANS)
        )
        + " END"
    )
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 3 THEN text || ' ' || {case}
              ELSE text END AS text
  FROM documents
), fps AS (
  SELECT doc_id, unnest({fp}) AS fp FROM planted
), posting AS (
  SELECT fp, count(*) AS n FROM fps GROUP BY fp
), keep AS (
  SELECT f.doc_id, f.fp FROM fps f JOIN posting p USING (fp)
  WHERE p.n BETWEEN 2 AND 1000
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING count(*) >= 2
"""


def q_thread_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branched-transcript linearization (chat.linearize_threads):
    events become per-user turn forests — turn idx by (ts, event_id)
    row_number, parent = previous turn except every event_id%5==0
    turn branches back up to 7 ancestors (regenerated-answer /
    tree-of-thought shape) — and the operator emits one root→leaf
    path per leaf via POINTER DOUBLING: ceil(log2 depth) self-joins
    (7 rounds for these ≤99-turn threads) where the DuckDB oracle's
    recursive CTE descends one level per pass. The oracle is a
    genuinely independent algorithm for the same contract — the
    asof_versions discipline."""
    from pyspark.sql import Window

    from beats_spark.operators.chat import linearize_threads

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    idx = F.col("idx")
    turns = (
        ev.select("user_id", "event_id", "event_type", "ts")
        .withColumn("idx", F.row_number().over(w))
        .select(
            F.col("user_id").alias("conv_id"),
            idx.cast("long").alias("turn_id"),
            F.when(idx == 1, F.lit(None).cast("long"))
            .when(
                F.col("event_id") % 5 == 0,
                F.greatest(
                    idx - 1 - F.col("event_id") % 7, F.lit(1).cast("long")
                ).cast("long"),
            )
            .otherwise((idx - 1).cast("long"))
            .alias("parent_id"),
            F.col("event_type").alias("tok"),
        )
    )
    return linearize_threads(turns)


_SQL_THREAD_PATHS = r"""
WITH RECURSIVE ev AS (
  SELECT user_id AS conv_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS idx
  FROM events
), turns AS (
  SELECT conv_id, idx::BIGINT AS turn_id,
         (CASE WHEN idx = 1 THEN NULL
               WHEN event_id % 5 = 0
                 THEN greatest(idx - 1 - event_id % 7, 1)
               ELSE idx - 1 END)::BIGINT AS parent_id,
         event_type AS tok
  FROM ev
), walk AS (
  SELECT conv_id, turn_id, tok AS path, 1 AS depth
  FROM turns WHERE parent_id IS NULL
  UNION ALL
  SELECT t.conv_id, t.turn_id, w.path || '>' || t.tok, w.depth + 1
  FROM turns t JOIN walk w
    ON t.conv_id = w.conv_id AND t.parent_id = w.turn_id
)
SELECT w.conv_id, w.turn_id, w.depth::BIGINT AS depth, w.path,
       false AS orphaned
FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM turns c
                  WHERE c.conv_id = w.conv_id
                    AND c.parent_id = w.turn_id)
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (analytics.event_transitions): counts plus exact
    integer-milli row-conditional probabilities, with a '_start_'
    pseudo-state carrying the initial distribution — the agent-loop
    behavioral signature. One corpus-scale key-window shuffle; the
    probability window runs on the ≤|types|² reduced frame."""
    from beats_spark.operators.analytics import event_transitions

    return event_transitions(_load(spark, sf_dir, "events"))


_SQL_EVENT_TRANSITIONS = r"""
WITH t AS (
  SELECT coalesce(lag(event_type, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ), '_start_') AS prev_type,
         event_type
  FROM events
), g AS (
  SELECT prev_type, event_type, count(*)::BIGINT AS n_transitions
  FROM t GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n_transitions,
       (n_transitions * 1000 //
        sum(n_transitions) OVER (PARTITION BY prev_type))::BIGINT
         AS p_milli
FROM g
"""


def q_prefix_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-conversation shared-prefix economics
    (chat.prefix_cache_stats): per probe depth k ∈ {1,2,4,8}, how
    many conversations share their first k turn tokens and how many
    prefix turns a KV-prefix cache (vLLM APC / RadixAttention
    economics) or a dedup-at-pack pass would save. 3 shuffles total
    for ALL depths (ordered-array build, (k, prefix) groupBy, ≤4-row
    rollup) — never one pass per depth."""
    from beats_spark.operators.chat import prefix_cache_stats

    ev = _load(spark, sf_dir, "events")
    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        "ts",
        F.col("event_id").alias("turn_id"),
        F.col("event_type").alias("tok"),
    )
    return prefix_cache_stats(turns)


_SQL_PREFIX_SHARE = r"""
WITH ordered AS (
  SELECT user_id AS conv, count(*) AS n_turns,
         list(event_type ORDER BY ts, event_id) AS toks
  FROM events GROUP BY user_id
), probes AS (
  SELECT conv, ks.k AS k,
         array_to_string(list_slice(toks, 1, ks.k), '>') AS prefix
  FROM ordered, (VALUES (1), (2), (4), (8)) ks(k)
  WHERE n_turns >= ks.k
), groups AS (
  SELECT k, prefix, count(*) AS cnt FROM probes GROUP BY k, prefix
)
SELECT k::BIGINT AS k, sum(cnt)::BIGINT AS n_convs,
       count(*)::BIGINT AS n_prefixes,
       sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::BIGINT
         AS n_shared_convs,
       sum((cnt - 1) * k)::BIGINT AS turns_saved
FROM groups GROUP BY k
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch / Flesch-Kincaid readability battery
    (textstats.readability_stats): whitespace words, [.!?]+ sentence
    runs floored at 1, [aeiouy]+ vowel-group syllables, exact
    integer-milli scores — zero-shuffle codegen projection; the
    oracle replays every regexp count and the CASE-guarded integer
    divisions (greatest is banned on the NULL path, CLAUDE.md)."""
    from beats_spark.operators.textstats import readability_stats

    return readability_stats(_load(spark, sf_dir, "documents"))


_SQL_READABILITY = r"""
WITH base AS (
  SELECT doc_id,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+'))
          END)::BIGINT AS n_words,
         (CASE WHEN len(regexp_extract_all(text, '[.!?]+')) >= 1
               THEN len(regexp_extract_all(text, '[.!?]+'))
               ELSE 1 END)::BIGINT AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       (206835 - (1015 * n_words) // n_sentences
        - (84600 * n_syllables) //
          (CASE WHEN n_words >= 1 THEN n_words ELSE 1 END))::BIGINT
         AS flesch_milli,
       ((390 * n_words) // n_sentences
        + (11800 * n_syllables) //
          (CASE WHEN n_words >= 1 THEN n_words ELSE 1 END)
        - 15590)::BIGINT AS fk_grade_milli
FROM base
"""


def q_meta_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page robots META gate (html.meta_robots) — the in-document
    half of RFC 9309 (robots.txt is the server half, robots.py): a
    planted meta tag rides ahead of the shared messy-HTML wrapper for
    doc_id%13 ∈ {2,3,5,8,11}, covering both attribute orders,
    uppercase, single quotes, 'none', and a benign 'index, follow'.
    The oracle runs SQL generated from the SAME pattern constants
    (meta_robots_sql — html_steps_sql discipline)."""
    from beats_spark.operators.html import meta_robots

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    meta = (
        F.when(did % 13 == 2,
               F.lit('<meta name="robots" content="index, follow">'))
        .when(did % 13 == 3,
              F.lit("<meta name='robots' content='noindex'>"))
        .when(did % 13 == 5,
              F.lit('<meta name="robots" content="noindex, follow">'))
        .when(did % 13 == 8,
              F.lit('<META CONTENT="NOFOLLOW" NAME="ROBOTS">'))
        .when(did % 13 == 11,
              F.lit('<meta name="robots" content="none">'))
        .otherwise(F.lit(""))
    )
    planted = docs.select(
        "doc_id",
        F.concat(meta, _planted_html(did, F.col("text"))).alias("html"),
    )
    return meta_robots(planted)


def _sql_meta_robots() -> str:
    from beats_spark.operators.html import meta_robots_sql

    meta_case = (
        "CASE doc_id % 13 "
        "WHEN 2 THEN '<meta name=\"robots\" content=\"index, follow\">' "
        "WHEN 3 THEN '<meta name=''robots'' content=''noindex''>' "
        "WHEN 5 THEN '<meta name=\"robots\" content=\"noindex, follow\">' "
        "WHEN 8 THEN '<META CONTENT=\"NOFOLLOW\" NAME=\"ROBOTS\">' "
        "WHEN 11 THEN '<meta name=\"robots\" content=\"none\">' "
        "ELSE '' END"
    )
    flag = (
        "(list_contains(string_split(directives, ','), '{d}') "
        "OR list_contains(string_split(directives, ','), 'none'))"
    )
    return f"""
WITH planted AS (
  SELECT doc_id, ({meta_case}) || {_SQL_PLANTED_HTML} AS html
  FROM documents
), meta AS (
{meta_robots_sql("html")}
  FROM planted
)
SELECT doc_id, has_meta, directives,
       {flag.format(d="noindex")} AS noindex,
       {flag.format(d="nofollow")} AS nofollow
FROM meta
"""


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-per-token budget selection (sampling.budget_select):
    the density-ordered knapsack prefix every "best N tokens" pass
    runs, on the reusable two-pass distributed prefix sum (no
    single-partition corpus sort — the shard_plan machinery). Quality
    is a deterministic md5-derived milli score, tokens the whitespace
    convention; the oracle is the NAIVE single-window formulation —
    equality proves the bucketed plan computes the same prefix."""
    from beats_spark.operators.sampling import budget_select
    from beats_spark.operators.textstats import token_count_whitespace

    docs = _load(spark, sf_dir, "documents")
    frame = docs.select(
        "doc_id",
        token_count_whitespace(F.col("text")).cast("long").alias("n_toks"),
        (
            F.expr(
                "cast(conv(substr(md5(concat('bq|', cast(doc_id as string)))"
                ", 1, 15), 16, 10) as bigint) % 1000"
            )
        ).alias("q_milli"),
    )
    return budget_select(frame, budget_tokens=20_000)


_SQL_BUDGET_SELECT = r"""
WITH base AS (
  SELECT doc_id,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+'))
          END)::BIGINT AS n_toks,
         ('0x' || substr(md5('bq|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 1000 AS _q
  FROM documents
), d AS (
  SELECT doc_id, n_toks,
         ((_q * 1000) //
          (CASE WHEN n_toks >= 1 THEN n_toks ELSE 1 END))::BIGINT
           AS density_micro
  FROM base
), r AS (
  SELECT doc_id, n_toks, density_micro,
         row_number() OVER (ORDER BY -density_micro, doc_id) AS rank,
         sum(n_toks) OVER (ORDER BY -density_micro, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM d
)
SELECT doc_id, n_toks, density_micro, rank::BIGINT AS rank,
       cum_tokens::BIGINT AS cum_tokens,
       cum_tokens <= 20000 AS kept
FROM r
"""


def q_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-distribution drift between snapshots
    (snapshots.quality_drift over readability_stats' FK grade): v2
    drops the doc_id%9==7 slice and appends an unpunctuated tail to
    every %7==1 text (both moduli COPRIME to the source=doc_id%20
    alignment, CLAUDE.md — every source sees the edit), shifting the
    grade histogram; the monitor reports exact integer L1 ppm per
    source. The oracle replays the readability formula on both sides
    and the full histogram/ppm/L1 pipeline."""
    from beats_spark.operators.snapshots import quality_drift
    from beats_spark.operators.textstats import readability_stats

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    v1 = docs.select("source", "text")
    v2 = docs.where(did % 9 != 7).select(
        "source",
        F.when(
            did % 7 == 1,
            F.concat(
                F.col("text"),
                F.lit(" plain tail words with no punctuation at all"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    s1 = readability_stats(v1, id_col="source")
    s2 = readability_stats(v2, id_col="source")
    return quality_drift(
        s1, s2, key_col="source", score_col="fk_grade_milli"
    )


def _sql_fk_by_source(src_sql: str) -> str:
    return f"""
    SELECT source,
           ((390 * n_words) // n_sentences
            + (11800 * n_syllables) //
              (CASE WHEN n_words >= 1 THEN n_words ELSE 1 END)
            - 15590)::BIGINT AS score
    FROM (
      SELECT source,
             (CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+'))
              END)::BIGINT AS n_words,
             (CASE WHEN len(regexp_extract_all(text, '[.!?]+')) >= 1
                   THEN len(regexp_extract_all(text, '[.!?]+'))
                   ELSE 1 END)::BIGINT AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
               AS n_syllables
      FROM ({src_sql})
    )"""


def _sql_quality_drift() -> str:
    v1 = "SELECT source, text FROM documents"
    v2 = """
      SELECT source,
             CASE WHEN doc_id % 7 = 1
               THEN text || ' plain tail words with no punctuation at all'
               ELSE text END AS text
      FROM documents WHERE doc_id % 9 <> 7
    """
    binexpr = (
        "CASE WHEN score IS NULL THEN NULL "
        "WHEN score < -16000 THEN 0 "
        "WHEN score >= 32000 THEN 15 "
        "ELSE (score + 16000) * 16 // 48000 END"
    )
    return f"""
WITH s1 AS ({_sql_fk_by_source(v1)}),
s2 AS ({_sql_fk_by_source(v2)}),
h1 AS (
  SELECT source, {binexpr} AS bin, count(*)::BIGINT AS c1
  FROM s1 WHERE ({binexpr}) IS NOT NULL GROUP BY 1, 2
),
h2 AS (
  SELECT source, {binexpr} AS bin, count(*)::BIGINT AS c2
  FROM s2 WHERE ({binexpr}) IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT COALESCE(h1.source, h2.source) AS source,
         COALESCE(h1.bin, h2.bin) AS bin,
         COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
  FROM h1 FULL OUTER JOIN h2
    ON h1.source = h2.source AND h1.bin = h2.bin
),
t AS (
  SELECT source, sum(c1)::BIGINT AS n_v1, sum(c2)::BIGINT AS n_v2
  FROM m GROUP BY source
),
d AS (
  SELECT m.source,
         abs((c1 * 1000000 //
              (CASE WHEN n_v1 >= 1 THEN n_v1 ELSE 1 END))::BIGINT
           - (c2 * 1000000 //
              (CASE WHEN n_v2 >= 1 THEN n_v2 ELSE 1 END))::BIGINT) AS dd
  FROM m JOIN t ON m.source = t.source
)
SELECT t.source, n_v1, n_v2, l1.l1_ppm
FROM t JOIN (
  SELECT source, sum(dd)::BIGINT AS l1_ppm FROM d GROUP BY source
) l1 ON t.source = l1.source
"""


def q_winnow_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-first benchmark decontamination on winnowed fingerprints
    (textstats.winnow_decontaminate): the eval set is the first 200
    chars of every doc_id%17==4 document (a pasted-benchmark shape —
    every eval doc MUST flag at least its own source), matched via a
    broadcast of the benchmark fingerprint set — zero corpus-scale
    shuffle. The oracle replays the IDENTICAL generated winnow SQL on
    both sides plus the join/rollup."""
    from beats_spark.operators.scale import spread
    from beats_spark.operators.textstats import winnow_decontaminate

    docs = spread(_load(spark, sf_dir, "documents"))
    ev = docs.where(F.col("doc_id") % 17 == 4).select(
        (F.col("doc_id") + 500000).alias("eval_id"),
        F.substring(F.col("text"), 1, 200).alias("text"),
    )
    return winnow_decontaminate(docs, ev)


def _sql_winnow_decontaminate() -> str:
    from beats_spark.operators.textstats import winnow_fingerprint_sql

    fp = winnow_fingerprint_sql(
        "text", 24, 8, 4000, dialect="duckdb", hashes_only=True
    )
    return f"""
WITH cfps AS (
  SELECT doc_id, unnest({fp}) AS fp FROM documents
), ev AS (
  SELECT doc_id + 500000 AS eval_id, substr(text, 1, 200) AS text
  FROM documents WHERE doc_id % 17 = 4
), efps AS (
  SELECT eval_id, unnest({fp}) AS fp FROM ev
)
SELECT c.doc_id,
       count(DISTINCT e.eval_id)::BIGINT AS n_eval_partners,
       count(DISTINCT c.fp)::BIGINT AS n_shared_fps
FROM cfps c JOIN efps e ON c.fp = e.fp
GROUP BY c.doc_id
HAVING count(DISTINCT c.fp) >= 2
"""


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user engagement
    (analytics.decayed_engagement): integer-exact power-of-two step
    decay (half-life 7 d) against an explicit pinned 'now' — the
    freshness profile for sampling/ranking. One map-side-combined
    groupBy; the oracle replays the halving arithmetic exactly."""
    from beats_spark.operators.analytics import decayed_engagement

    return decayed_engagement(
        _load(spark, sf_dir, "events"), now="2024-03-01 00:00:00"
    )


_SQL_DECAYED_ENGAGEMENT = r"""
WITH staged AS (
  SELECT user_id,
         floor(value * 1000000)::BIGINT AS v,
         CASE WHEN date_diff('microsecond', ts,
                             TIMESTAMP '2024-03-01 00:00:00') < 0 THEN 0
              ELSE date_diff('microsecond', ts,
                             TIMESTAMP '2024-03-01 00:00:00')
                   // 86400000000 // 7 END AS h
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(v)::BIGINT AS raw_micro,
       sum(CASE WHEN h > 40 THEN 0
                ELSE v // power(2, h)::BIGINT END)::BIGINT AS decayed_micro
FROM staged GROUP BY user_id
"""


def q_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified sampling (sampling.stratified_quota in
    its audit form): per-source dict quotas — src0..src4 get 10,
    src5 gets 40 (more than some strata hold at small SF, exercising
    min(quota, n)), everything else 0 (allowlist semantics) —
    selected by md5-hash rank. The oracle replays the sample_hash
    and the row_number window."""
    from beats_spark.operators.sampling import stratified_quota

    docs = _load(spark, sf_dir, "documents")
    quota = {f"src{i}": 10 for i in range(5)}
    quota["src5"] = 40
    return stratified_quota(
        docs, "source", quota, "doc_id", seed=3, audit=True
    )


_SQL_STRATIFIED_QUOTA = r"""
WITH h AS (
  SELECT source, doc_id,
         ('0x' || substr(md5('s3|' || doc_id::VARCHAR), 1, 15))::BIGINT
           AS hv
  FROM documents
), r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY hv, doc_id)
           AS rank
  FROM h
)
SELECT source, doc_id, rank::BIGINT AS rank,
       rank <= (CASE source
                  WHEN 'src0' THEN 10 WHEN 'src1' THEN 10
                  WHEN 'src2' THEN 10 WHEN 'src3' THEN 10
                  WHEN 'src4' THEN 10 WHEN 'src5' THEN 40
                  ELSE 0 END) AS kept
FROM r
"""


def q_depth_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-depth survival curve (sessions.depth_survival)
    over per-user event streams: where dialogues die, as exact
    integer hazard complements. One corpus-scale groupBy; histogram
    + suffix window on the bounded depth frame."""
    from beats_spark.operators.sessions import depth_survival

    return depth_survival(_load(spark, sf_dir, "events"), key_col="user_id")


_SQL_DEPTH_SURVIVAL = r"""
WITH per_conv AS (
  SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id
), hist AS (
  SELECT n AS depth, count(*)::BIGINT AS n_ending
  FROM per_conv GROUP BY n
), s AS (
  SELECT depth, n_ending,
         sum(n_ending) OVER (ORDER BY depth DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS n_reaching
  FROM hist
)
SELECT depth, n_reaching, n_ending,
       ((n_reaching - n_ending) * 1000000 // n_reaching)::BIGINT
         AS continue_ppm
FROM s
"""


_MD_PREFIX = (
    "# section one\n- item one\n- item two\n```\ncode line\n```\n"
    "> quoted line\n| a | b |\n[a link](http://example.com/x)\n"
)


def q_doc_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown structure profile (textstats.doc_structure_stats):
    every doc_id%7==2 document gets a deterministic markdown preamble
    (heading, two list items, one fence pair, quote, table row,
    inline link) so each counter fires; plain docs keep near-zero
    structure. Shared (?m) regex grammar across engines."""
    from beats_spark.operators.textstats import doc_structure_stats

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 7 == 2, F.concat(F.lit(_MD_PREFIX), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return doc_structure_stats(planted)


def _sql_doc_structure() -> str:
    md = _MD_PREFIX.replace("\n", "' || chr(10) || '")
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 2 THEN '{md}' || text ELSE text END AS text
  FROM documents
), c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '(?m)^#{{1,6}} '))::BIGINT
           AS n_headings,
         len(regexp_extract_all(text, '```'))::BIGINT AS ticks,
         len(regexp_extract_all(text, '(?m)^[ \t]*[-*+] '))::BIGINT
           AS n_list_items,
         len(regexp_extract_all(text, '\[[^\]]*\]\([^)]*\)'))::BIGINT
           AS n_links,
         len(regexp_extract_all(text, '(?m)^\|.*\|$'))::BIGINT
           AS n_table_rows,
         len(regexp_extract_all(text, '(?m)^> '))::BIGINT AS n_quotes,
         len(string_split(text, chr(10)))::BIGINT AS n_lines
  FROM planted
)
SELECT doc_id, n_headings, (ticks // 2)::BIGINT AS n_fences,
       n_list_items, n_links, n_table_rows, n_quotes,
       ((n_headings + n_list_items + n_table_rows + n_quotes) * 1000
        // (CASE WHEN n_lines >= 1 THEN n_lines ELSE 1 END))::BIGINT
         AS structured_milli
FROM c
"""


# two APERIODIC ~600-char spans for the CDC plant (a periodic span
# collapses its repeated chunks into one hash — learned in smoke)
_CDC_SPANS = tuple(
    " ".join(f"cdc{g}w{j}tok{(g * 41 + j * 13) % 89}" for j in range(55))
    for g in range(2)
)


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + cross-doc chunk sharing
    (dedup.cdc_chunk_sql / cdc_shared_stats — LBFS SOSP'01, the
    FastCDC core without the serializing min/max clamps): every
    doc_id%13==6 document gets one of two aperiodic ~600-char spans
    appended at its own offset; content-local boundaries make the
    interior chunks byte-identical across offsets, so same-span docs
    MUST report shared chunks. The oracle replays the IDENTICAL
    generated chunking SQL plus the sharing rollup."""
    from beats_spark.operators.dedup import cdc_shared_stats
    from beats_spark.operators.scale import spread

    docs = spread(_load(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    span = F.element_at(
        F.array(*[F.lit(s) for s in _CDC_SPANS]),
        F.expr("cast((doc_id div 13) % 2 + 1 as int)"),
    )
    planted = docs.select(
        "doc_id",
        F.when(did % 13 == 6, F.concat(F.col("text"), F.lit(" "), span))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return cdc_shared_stats(planted)


def _sql_cdc_chunks() -> str:
    from beats_spark.operators.dedup import cdc_chunk_sql

    c = cdc_chunk_sql("text", 16, 6, 8000, dialect="duckdb")
    case = (
        "CASE (doc_id // 13) % 2 "
        + " ".join(f"WHEN {g} THEN '{s}'" for g, s in enumerate(_CDC_SPANS))
        + " END"
    )
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 6 THEN text || ' ' || {case}
              ELSE text END AS text
  FROM documents
), chunks AS (
  SELECT doc_id, unnest({c}) AS c FROM planted
), flat AS (
  SELECT doc_id, c.chunk_len AS len, c.chunk_md5 AS h FROM chunks
), dp AS (
  SELECT h, count(DISTINCT doc_id) AS ndocs FROM flat GROUP BY h
)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       sum((ndocs > 1)::INT)::BIGINT AS n_shared_chunks,
       sum(CASE WHEN ndocs > 1 THEN len ELSE 0 END)::BIGINT
         AS chars_shared
FROM flat JOIN dp USING (h) GROUP BY doc_id
"""


def q_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney AUC (ranking.model_auc) of the Flesch
    readability score as an is-English detector (lang = 'en' labels —
    a real, imperfect separation, so the AUC is non-degenerate).
    Global rank via the distributed prefix machinery; the oracle is
    the NAIVE single-window rank formulation — equality proves the
    bucketed rank."""
    from beats_spark.operators.ranking import model_auc
    from beats_spark.operators.textstats import readability_stats

    docs = _load(spark, sf_dir, "documents")
    scored = readability_stats(docs).select("doc_id", "flesch_milli")
    frame = scored.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        F.col("flesch_milli").alias("score_milli"),
        (F.col("lang") == "en").alias("label"),
    )
    return model_auc(frame)


_SQL_MODEL_AUC = r"""
WITH base AS (
  SELECT doc_id,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+'))
          END)::BIGINT AS n_words,
         (CASE WHEN len(regexp_extract_all(text, '[.!?]+')) >= 1
               THEN len(regexp_extract_all(text, '[.!?]+'))
               ELSE 1 END)::BIGINT AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
           AS n_syllables,
         lang = 'en' AS y
  FROM documents
), s AS (
  SELECT doc_id, y,
         (206835 - (1015 * n_words) // n_sentences
          - (84600 * n_syllables) //
            (CASE WHEN n_words >= 1 THEN n_words ELSE 1 END))::BIGINT
           AS score
  FROM base WHERE n_words IS NOT NULL
), r AS (
  SELECT y, row_number() OVER (ORDER BY score, doc_id) AS rank FROM s
), a AS (
  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS n_neg,
         sum(CASE WHEN y THEN rank ELSE 0 END)::BIGINT AS rpos
  FROM r
)
SELECT n_pos, n_neg,
       (CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
        (rpos - n_pos * (n_pos + 1) // 2) * 1000000
        // (n_pos * n_neg) END)::BIGINT AS auc_ppm
FROM a
"""


def q_model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (ranking.model_calibration): planted
    near-calibrated probabilities — p = md5-hash % 1001 (the 1000
    edge exercises the top-bin clamp), label = independent-hash
    Bernoulli(p) — so frac_pos tracks mean_pred per bin up to
    sampling noise, exactly reproduced by both engines."""
    from beats_spark.operators.ranking import model_calibration

    docs = _load(spark, sf_dir, "documents")
    h1 = (
        "cast(conv(substr(md5(concat('cp|', cast(doc_id as string))), 1, 15),"
        " 16, 10) as bigint) % 1001"
    )
    h2 = (
        "cast(conv(substr(md5(concat('cl|', cast(doc_id as string))), 1, 15),"
        " 16, 10) as bigint) % 1000"
    )
    frame = docs.select(
        F.expr(h1).alias("p_milli"),
        F.expr(f"({h2}) < ({h1})").alias("label"),
    )
    return model_calibration(frame)


_SQL_MODEL_CALIBRATION = r"""
WITH h AS (
  SELECT ('0x' || substr(md5('cp|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 1001 AS p,
         ('0x' || substr(md5('cl|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 1000 AS q
  FROM documents
), staged AS (
  SELECT (CASE WHEN p >= 1000 THEN 9 ELSE p // 100 END)::BIGINT AS bin,
         p, (q < p) AS y
  FROM h
)
SELECT bin, count(*)::BIGINT AS n,
       (sum(p) // count(*))::BIGINT AS mean_pred_milli,
       (sum(CASE WHEN y THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT
         AS frac_pos_milli
FROM staged GROUP BY bin
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage curve (textstats.vocab_coverage): occurrence
    share of the top-{100, 1000, 10000} token types — cutoffs above
    the fixture vocabulary exercise the eff_k clamp. Cumulative
    counts ride the distributed prefix; the oracle is the naive
    single-window cumulative sum."""
    from beats_spark.operators.textstats import vocab_coverage

    return vocab_coverage(
        _load(spark, sf_dir, "documents"), cutoffs=(100, 1000, 10000)
    )


_SQL_VOCAB_COVERAGE = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm
), nz AS (
  SELECT tok FROM toks WHERE tok <> ''
), counts AS (
  SELECT tok, count(*)::BIGINT AS n FROM nz GROUP BY tok
), ranked AS (
  SELECT tok, n,
         row_number() OVER (ORDER BY n DESC, tok) AS r,
         sum(n) OVER (ORDER BY n DESC, tok
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum
  FROM counts
), tot AS (
  SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS n_types
  FROM counts
)
SELECT ks.k::BIGINT AS k,
       least(ks.k, tot.n_types)::BIGINT AS eff_k,
       ranked.cum AS covered, tot.total,
       (ranked.cum * 1000000 // tot.total)::BIGINT AS coverage_ppm
FROM (VALUES (100), (1000), (10000)) ks(k), tot
JOIN ranked ON ranked.r = least(ks.k, tot.n_types)
"""


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Fano factor per event type over hourly buckets
    (analytics.burstiness) — decimal(38,0) widened math (the count
    square overflows int64 at 10¹² events; DuckDB HUGEINT mirrors
    it). One corpus groupBy + a ≤|types|-row rollup."""
    from beats_spark.operators.analytics import burstiness

    return burstiness(_load(spark, sf_dir, "events"))


_SQL_BURSTINESS = r"""
WITH occ AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS b,
         count(*)::BIGINT AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, b
), per AS (
  SELECT event_type,
         (max(b) - min(b) + 1)::HUGEINT AS n,
         sum(c)::HUGEINT AS t,
         sum(c * c)::HUGEINT AS sq,
         sum(c)::BIGINT AS n_events,
         (max(b) - min(b) + 1)::BIGINT AS n_buckets
  FROM occ GROUP BY event_type
)
SELECT event_type, n_buckets, n_events,
       ((n * sq - t * t) * 1000 // (n * t))::BIGINT AS fano_milli
FROM per
"""


def q_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect/canonical chain resolution (urlnorm.resolve_redirects,
    pointer jumping with pigeonhole loop detection): planted from
    doc ids — hop chains u{i}→u{i+1} for i%10 ∈ {1,2,3} (terminals at
    %10==4), 3-cycles on i%25==5 through out-of-range ids, and a
    conflicting double edge on i%50==30 (canonical pick = min target).
    The oracle walks a depth-capped recursive CTE: looped ⇔ the walk
    reaches n_edges+1 hops."""
    from beats_spark.operators.urlnorm import resolve_redirects

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    u = lambda c: F.concat(F.lit("u"), c.cast("string"))  # noqa: E731
    chain = docs.where(did % 10 == 1).select(
        u(did).alias("src"), u(did + 1).alias("dst")
    ).unionByName(
        docs.where(did % 10 == 2).select(
            u(did).alias("src"), u(did + 1).alias("dst")
        )
    ).unionByName(
        docs.where(did % 10 == 3).select(
            u(did).alias("src"), u(did + 1).alias("dst")
        )
    )
    cyc = docs.where(did % 25 == 5).select(
        u(did).alias("src"), u(did + 100000).alias("dst")
    ).unionByName(
        docs.where(did % 25 == 5).select(
            u(did + 100000).alias("src"), u(did + 200000).alias("dst")
        )
    ).unionByName(
        docs.where(did % 25 == 5).select(
            u(did + 200000).alias("src"), u(did).alias("dst")
        )
    )
    dup = docs.where(did % 50 == 30).select(
        u(did).alias("src"), u(did + 300000).alias("dst")
    )
    return resolve_redirects(chain.unionByName(cyc).unionByName(dup))


_SQL_REDIRECT_CHAINS = r"""
WITH RECURSIVE raw AS (
  SELECT 'u' || doc_id::VARCHAR AS src,
         'u' || (doc_id + 1)::VARCHAR AS dst
  FROM documents WHERE doc_id % 10 IN (1, 2, 3)
  UNION ALL
  SELECT 'u' || doc_id::VARCHAR, 'u' || (doc_id + 100000)::VARCHAR
  FROM documents WHERE doc_id % 25 = 5
  UNION ALL
  SELECT 'u' || (doc_id + 100000)::VARCHAR,
         'u' || (doc_id + 200000)::VARCHAR
  FROM documents WHERE doc_id % 25 = 5
  UNION ALL
  SELECT 'u' || (doc_id + 200000)::VARCHAR, 'u' || doc_id::VARCHAR
  FROM documents WHERE doc_id % 25 = 5
  UNION ALL
  SELECT 'u' || doc_id::VARCHAR, 'u' || (doc_id + 300000)::VARCHAR
  FROM documents WHERE doc_id % 50 = 30
), e AS (
  SELECT src, min(dst) AS dst FROM raw
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
  GROUP BY src
), n AS (
  SELECT count(*)::BIGINT AS c FROM e
), walk AS (
  SELECT src AS origin, dst AS cur, 1::BIGINT AS hops FROM e
  UNION ALL
  SELECT w.origin, e.dst, w.hops + 1
  FROM walk w JOIN e ON e.src = w.cur, n
  WHERE w.hops <= n.c
), deep AS (
  SELECT origin, max(hops) AS mh FROM walk GROUP BY origin
), term AS (
  SELECT w.origin, w.cur, w.hops
  FROM walk w JOIN deep d ON w.origin = d.origin AND w.hops = d.mh
)
SELECT t.origin AS src,
       CASE WHEN t.hops > n.c THEN NULL ELSE t.cur END AS terminal,
       CASE WHEN t.hops > n.c THEN NULL ELSE t.hops END::BIGINT AS hops,
       t.hops > n.c AS looped
FROM term t, n
"""


def q_signal_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise curation-signal mutual information
    (textstats.signal_mi): length bucket (fl2 of n_chars+1), Flesch
    bucket, and lang — ONE cube() Expand pass produces every joint
    and marginal (the domain_cube move); MI in floor-log2 millibits.
    The oracle computes each pair directly with plain joins — a
    shape-independent referee for the cube plan."""
    from beats_spark.operators.textstats import readability_stats, signal_mi

    docs = _load(spark, sf_dir, "documents")
    r = readability_stats(docs).select("doc_id", "flesch_milli")
    sig = r.join(docs.select("doc_id", "n_chars", "lang"), "doc_id").select(
        F.expr("cast(length(bin(n_chars + 1)) - 1 as long)").alias("len_b"),
        F.expr(
            "cast(case when flesch_milli is null then -1 "
            "when flesch_milli < 0 then 0 "
            "when flesch_milli >= 160000 then 7 "
            "else flesch_milli div 20000 end as long)"
        ).alias("qual_b"),
        "lang",
    )
    return signal_mi(sig, ["len_b", "qual_b", "lang"])


def _sql_signal_mi() -> str:
    flesch = """
      SELECT doc_id,
             (206835 - (1015 * n_words) // n_sentences
              - (84600 * n_syllables) //
                (CASE WHEN n_words >= 1 THEN n_words ELSE 1 END))::BIGINT
               AS flesch_milli
      FROM (
        SELECT doc_id,
               (CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::BIGINT AS n_words,
               (CASE WHEN len(regexp_extract_all(text, '[.!?]+')) >= 1
                     THEN len(regexp_extract_all(text, '[.!?]+'))
                     ELSE 1 END)::BIGINT AS n_sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
                 AS n_syllables
        FROM documents
      )
    """

    def block(a: str, b: str) -> str:
        return f"""
  SELECT '{a}' AS sig_a, '{b}' AS sig_b,
         (sum(j.n * ((length(bin(t.N)) - 1) + (length(bin(j.n)) - 1)
                     - (length(bin(ma.n)) - 1) - (length(bin(mb.n)) - 1)))
          * 1000 // max(t.N))::BIGINT AS mi_milli
  FROM (SELECT {a} AS a, {b} AS b, count(*)::BIGINT AS n
        FROM sig GROUP BY 1, 2) j
  JOIN (SELECT {a} AS a, count(*)::BIGINT AS n FROM sig GROUP BY 1) ma
    ON j.a = ma.a
  JOIN (SELECT {b} AS b, count(*)::BIGINT AS n FROM sig GROUP BY 1) mb
    ON j.b = mb.b
  CROSS JOIN (SELECT count(*)::BIGINT AS N FROM sig) t
"""

    blocks = " UNION ALL ".join(
        block(a, b)
        for a, b in [("len_b", "qual_b"), ("len_b", "lang"),
                     ("qual_b", "lang")]
    )
    return f"""
WITH f AS ({flesch}), sig AS (
  SELECT (length(bin(d.n_chars + 1)) - 1)::BIGINT AS len_b,
         (CASE WHEN f.flesch_milli IS NULL THEN -1
               WHEN f.flesch_milli < 0 THEN 0
               WHEN f.flesch_milli >= 160000 THEN 7
               ELSE f.flesch_milli // 20000 END)::BIGINT AS qual_b,
         d.lang
  FROM documents d JOIN f ON d.doc_id = f.doc_id
)
{blocks}
"""


def q_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate cascade planner (sampling.filter_cascade): four
    gates with distinct measured rejection rates and costs over the
    corpus — the cheapest-reject-first ordering plus exact-integer
    expected cost per position under independence (the fold is
    rescaled div 10⁶ per step, never a float exp-sum-log; signal_mi
    is the correlation caveat's measuring stick). One corpus
    aggregate measures all gates; the plan math runs on a one-row
    array of 4 structs."""
    from beats_spark.operators.sampling import filter_cascade
    from beats_spark.operators.textstats import readability_stats

    docs = _load(spark, sf_dir, "documents")
    frame = readability_stats(docs).select("doc_id", "flesch_milli").join(
        docs, "doc_id"
    )
    filters = {
        "len200": (F.col("n_chars") >= 200, 1),
        "not_zh": (F.col("lang") != "zh", 5),
        "has_sentence": (F.col("text").rlike("[.!?]"), 3),
        "readable": (F.col("flesch_milli") >= 20000, 40),
    }
    return filter_cascade(frame, filters)


_SQL_FILTER_CASCADE = r"""
WITH f AS (
  SELECT d.n_chars, d.lang, d.text,
         (206835 - (1015 * n_words) // n_sentences
          - (84600 * n_syllables) //
            (CASE WHEN n_words >= 1 THEN n_words ELSE 1 END))::BIGINT
           AS flesch_milli
  FROM (
    SELECT doc_id,
           (CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+'))
            END)::BIGINT AS n_words,
           (CASE WHEN len(regexp_extract_all(text, '[.!?]+')) >= 1
                 THEN len(regexp_extract_all(text, '[.!?]+'))
                 ELSE 1 END)::BIGINT AS n_sentences,
           len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
             AS n_syllables
    FROM documents
  ) r JOIN documents d USING (doc_id)
), rates AS (
  SELECT count(*)::BIGINT AS n,
         sum((n_chars >= 200)::INT)::BIGINT AS p_len200,
         sum((lang <> 'zh')::INT)::BIGINT AS p_not_zh,
         sum(regexp_matches(text, '[.!?]')::INT)::BIGINT AS p_has_sentence,
         sum((flesch_milli >= 20000)::INT)::BIGINT AS p_readable
  FROM f
), rej AS (
  SELECT g.gate, g.cost::BIGINT AS cost,
         ((r.n - CASE g.gate
             WHEN 'len200' THEN r.p_len200
             WHEN 'not_zh' THEN r.p_not_zh
             WHEN 'has_sentence' THEN r.p_has_sentence
             WHEN 'readable' THEN r.p_readable END)
          * 1000000 // (CASE WHEN r.n >= 1 THEN r.n ELSE 1 END))::BIGINT
           AS reject_ppm
  FROM (VALUES ('len200', 1), ('not_zh', 5), ('has_sentence', 3),
               ('readable', 40)) g(gate, cost), rates r
), ordlist AS (
  SELECT list(struct_pack(gate := gate, reject_ppm := reject_ppm,
                          cost := cost)
              ORDER BY reject_ppm * 1000000 // cost DESC, gate) AS o
  FROM rej
), pos AS (
  SELECT unnest(range(1, len(o) + 1)) AS i, o FROM ordlist
)
SELECT i::BIGINT AS position,
       o[i].gate AS gate,
       o[i].cost AS cost_micro,
       o[i].reject_ppm AS reject_ppm,
       (o[i].cost * list_reduce(
          list_prepend(1000000::BIGINT,
            list_transform(list_slice(o, 1, i - 1),
                           x -> 1000000 - x.reject_ppm)),
          (a, b) -> a * b // 1000000) // 1000000)::BIGINT
         AS exp_cost_micro,
       list_reduce(
          list_prepend(1000000::BIGINT,
            list_transform(list_slice(o, 1, i),
                           x -> 1000000 - x.reject_ppm)),
          (a, b) -> a * b // 1000000)::BIGINT AS survivors_ppm
FROM pos
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out n-gram novelty (dedup.ngram_novelty): every
    doc_id%5==0 document probes against the rest of the corpus as
    reference — natural near-dups score low, unique docs high. One
    shingle-keyed anti join (the inverted-index shape); the oracle
    replays shingles + the anti join + exact ppm."""
    from beats_spark.operators.dedup import ngram_novelty
    from beats_spark.operators.scale import spread

    docs = spread(_load(spark, sf_dir, "documents"))
    probes = docs.where(F.col("doc_id") % 5 == 0)
    ref = docs.where(F.col("doc_id") % 5 != 0)
    return ngram_novelty(probes, ref)


_SQL_NGRAM_NOVELTY = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT doc_id,
           string_split_regex(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
           ) AS toks
    FROM documents
    WHERE trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))
          <> ''
  )
), ref AS (
  SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id % 5 <> 0
), pr AS (
  SELECT doc_id, unnest(grams) AS g FROM sh WHERE doc_id % 5 = 0
), novel AS (
  SELECT p.doc_id, count(*)::BIGINT AS n_novel
  FROM pr p LEFT JOIN ref r ON p.g = r.g
  WHERE r.g IS NULL GROUP BY p.doc_id
), totals AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams FROM pr GROUP BY doc_id
)
SELECT t.doc_id, t.n_grams,
       COALESCE(n.n_novel, 0)::BIGINT AS n_novel,
       (COALESCE(n.n_novel, 0) * 1000000 // t.n_grams)::BIGINT
         AS novelty_ppm
FROM totals t LEFT JOIN novel n ON t.doc_id = n.doc_id
"""


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (the evaluation view the
    aggregate `lang_id` accuracy hides): per (true lang, predicted)
    cell, the count and the share of the true language's rows in
    integer ppm — which languages the heuristic misroutes WHERE, the
    honest audit of a battery every per-language downstream op keys
    on. Oracle generated from the same tables
    (textstats.lang_id_sql_parts)."""
    from beats_spark.operators import textstats
    from beats_spark.operators.scale import spread

    # the 27-language marker battery is regex-dense: spread the
    # single-file fixture scan (measured 7.1 s -> sub-second at sf0.1)
    docs = spread(_load(spark, sf_dir, "documents"))
    cells = (
        docs.withColumn("pred", textstats.lang_id(F.col("text")))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return cells.withColumn(
        "share_ppm",
        F.expr(
            "cast(n * 1000000 div sum(n) over (partition by lang) as long)"
        ),
    )


def _sql_langid_confusion() -> str:
    from beats_spark.operators.textstats import lang_id_sql_parts

    select_list, pred = lang_id_sql_parts("text")
    return f"""
WITH scores AS (
  SELECT doc_id, lang, text,
         {select_list}
  FROM documents
), preds AS (
  SELECT lang, {pred} AS pred FROM scores
), cells AS (
  SELECT lang, pred, count(*)::BIGINT AS n FROM preds GROUP BY lang, pred
)
SELECT lang, pred, n,
       (n * 1000000 // sum(n) OVER (PARTITION BY lang))::BIGINT
         AS share_ppm
FROM cells
"""


def q_context_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-budget overflow report (chat.context_overflow_stats):
    events as conversation turns (user_id key, event_type#id token
    text priced by the whitespace convention), probed at budgets
    {32, 64, 128} — sized to the fixture's ≤99-turn conversations so
    all three loss regimes appear. One conv aggregate; budgets ride
    one explode of the reduced frame."""
    from beats_spark.operators.chat import context_overflow_stats
    from beats_spark.operators.textstats import token_count_whitespace

    ev = _load(spark, sf_dir, "events")
    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        token_count_whitespace(
            F.concat(
                F.col("event_type"),
                F.lit("#"),
                F.col("event_id").cast("string"),
                F.lit(" payload token run"),
            )
        ).cast("long").alias("n_toks"),
    )
    return context_overflow_stats(turns, budgets=(32, 64, 128))


_SQL_CONTEXT_OVERFLOW = r"""
WITH turns AS (
  SELECT user_id AS conv_id,
         (CASE WHEN trim(t) = '' THEN 0
               ELSE len(string_split_regex(trim(t), '\s+')) END)::BIGINT
           AS n_toks
  FROM (
    SELECT user_id,
           event_type || '#' || event_id::VARCHAR || ' payload token run'
             AS t
    FROM events
  )
), per_conv AS (
  SELECT conv_id, sum(n_toks)::BIGINT AS len FROM turns GROUP BY conv_id
), probes AS (
  SELECT len, b.budget::BIGINT AS budget
  FROM per_conv, (VALUES (32), (64), (128)) b(budget)
), g AS (
  SELECT budget, count(*)::BIGINT AS n_convs,
         sum((len > budget)::INT)::BIGINT AS n_over,
         sum(len)::BIGINT AS tokens_total,
         sum(CASE WHEN len > budget THEN len - budget ELSE 0 END)::BIGINT
           AS tokens_lost
  FROM probes GROUP BY budget
)
SELECT budget, n_convs, n_over,
       (n_over * 1000000 //
        (CASE WHEN n_convs >= 1 THEN n_convs ELSE 1 END))::BIGINT
         AS over_ppm,
       tokens_total, tokens_lost,
       (tokens_lost * 1000000 //
        (CASE WHEN tokens_total >= 1 THEN tokens_total ELSE 1 END))::BIGINT
         AS loss_ppm
FROM g
"""


def q_dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-tuning curve (dedup.dedup_rate_curve) over the
    exact-Jaccard ground-truth pairs at τ=0.3: surviving pairs, docs
    touched, and the pairwise min-id-keeper drop count per candidate
    threshold — pair-level scouting, the chosen τ then earns the
    full clustering pass. Jaccard classifies via floor(j·10⁶) of the
    bit-identical IEEE division."""
    from beats_spark.operators.dedup import (
        dedup_rate_curve,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=5, threshold=0.3)
    return dedup_rate_curve(pairs)


def _sql_dedup_rate_curve() -> str:
    body = _SQL_JACCARD_BODY.format(n=5, t=0.3)
    return f"""
WITH pairs AS (SELECT * FROM ({body}) x),
probes AS (
  SELECT id_a, id_b, t.threshold_ppm::BIGINT AS threshold_ppm
  FROM pairs, (VALUES (300000), (400000), (500000), (600000),
                      (700000), (800000), (900000)) t(threshold_ppm)
  WHERE floor(jaccard * 1000000)::BIGINT >= t.threshold_ppm
), counts AS (
  SELECT threshold_ppm, count(*)::BIGINT AS n_pairs,
         count(DISTINCT id_b)::BIGINT AS n_dropped_naive
  FROM probes GROUP BY threshold_ppm
), touched AS (
  SELECT threshold_ppm, count(DISTINCT d)::BIGINT AS n_docs_matched
  FROM (
    SELECT threshold_ppm, id_a AS d FROM probes
    UNION ALL
    SELECT threshold_ppm, id_b FROM probes
  ) GROUP BY threshold_ppm
)
SELECT c.threshold_ppm, c.n_pairs, t.n_docs_matched, c.n_dropped_naive
FROM counts c JOIN touched t USING (threshold_ppm)
"""


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 PMI collocations (textstats.collocations): corpus-level
    phrase mining in whole floor-log2 bits, min_count=5 hapax floor,
    deterministic (pmi, count, text) tie-break. Distributed top-k
    (TakeOrderedAndProject); the oracle replays counts, marginals,
    the fl2 algebra, and the rank."""
    from beats_spark.operators.textstats import collocations

    return collocations(_load(spark, sf_dir, "documents"), k=30)


_SQL_COLLOCATIONS = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
         ), x -> x <> '') AS tk
  FROM documents
), bg AS (
  SELECT unnest(list_transform(
           range(1, len(tk)),
           i -> tk[i] || ' ' || tk[i + 1]
         )) AS b
  FROM toks WHERE len(tk) >= 2
), counts AS (
  SELECT b, count(*)::BIGINT AS nab FROM bg GROUP BY b
), lefts AS (
  SELECT split_part(b, ' ', 1) AS w1, sum(nab)::BIGINT AS na
  FROM counts GROUP BY 1
), rights AS (
  SELECT split_part(b, ' ', 2) AS w2, sum(nab)::BIGINT AS nb
  FROM counts GROUP BY 1
), tot AS (
  SELECT sum(nab)::BIGINT AS N FROM counts
), scored AS (
  SELECT c.b AS bigram, c.nab AS n_ab,
         ((length(bin(c.nab)) - 1) + (length(bin(t.N)) - 1)
          - (length(bin(l.na)) - 1) - (length(bin(r.nb)) - 1))::BIGINT
           AS pmi_fl2
  FROM counts c
  JOIN lefts l ON split_part(c.b, ' ', 1) = l.w1
  JOIN rights r ON split_part(c.b, ' ', 2) = r.w2
  CROSS JOIN tot t
  WHERE c.nab >= 5
)
SELECT row_number() OVER (
         ORDER BY pmi_fl2 DESC, n_ab DESC, bigram
       )::BIGINT AS rank,
       bigram, n_ab, pmi_fl2
FROM scored
QUALIFY rank <= 30
"""


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate (dedup.dup_rate_by_source):
    every doc_id%17==3 document rides in twice (re-idded copy, same
    source — a provider replaying a bucket), so sources show
    non-trivial dup ppm. Spark groups by the 128-bit two-hash key
    (16 B/doc); the oracle groups by the normalized TEXT itself —
    an independent identity check, not a hash replay."""
    from beats_spark.operators.dedup import dup_rate_by_source

    docs = _load(spark, sf_dir, "documents")
    copies = docs.where(F.col("doc_id") % 17 == 3).select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    planted = docs.select("doc_id", "text", "lang", "source", "n_chars")
    return dup_rate_by_source(planted.unionByName(copies))


_SQL_DUP_RATE_BY_SOURCE = r"""
WITH planted AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id % 17 = 3
), keyed AS (
  SELECT source,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS k
  FROM planted
), g AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         count(DISTINCT k)::BIGINT AS n_distinct
  FROM keyed GROUP BY source
)
SELECT source, n_docs, n_distinct,
       ((n_docs - n_distinct) * 1000000 //
        (CASE WHEN n_docs >= 1 THEN n_docs ELSE 1 END))::BIGINT
         AS dup_ppm
FROM g
"""


def q_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ROC curve (ranking.roc_points) for the Flesch-as-
    English detector from model_auc — the operating-point table a
    deployed gate is picked from. One corpus groupBy; suffix windows
    on the ≤16-bin frame."""
    from beats_spark.operators.ranking import roc_points
    from beats_spark.operators.textstats import readability_stats

    docs = _load(spark, sf_dir, "documents")
    scored = readability_stats(docs).select("doc_id", "flesch_milli")
    frame = scored.join(docs.select("doc_id", "lang"), "doc_id").select(
        F.col("flesch_milli").alias("score_milli"),
        (F.col("lang") == "en").alias("label"),
    )
    return roc_points(frame)


_SQL_ROC_POINTS = r"""
WITH s AS (
  SELECT (206835 - (1015 * n_words) // n_sentences
          - (84600 * n_syllables) //
            (CASE WHEN n_words >= 1 THEN n_words ELSE 1 END))::BIGINT
           AS score,
         y
  FROM (
    SELECT doc_id,
           (CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+'))
            END)::BIGINT AS n_words,
           (CASE WHEN len(regexp_extract_all(text, '[.!?]+')) >= 1
                 THEN len(regexp_extract_all(text, '[.!?]+'))
                 ELSE 1 END)::BIGINT AS n_sentences,
           len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
             AS n_syllables,
           lang = 'en' AS y
    FROM documents
  )
), binned AS (
  SELECT (CASE WHEN score < -16000 THEN 0
               WHEN score >= 32000 THEN 15
               ELSE (score + 16000) * 16 // 48000 END)::BIGINT AS bin,
         y
  FROM s WHERE score IS NOT NULL AND y IS NOT NULL
), g AS (
  SELECT bin,
         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS n_neg
  FROM binned GROUP BY bin
), cum AS (
  SELECT bin, n_pos, n_neg,
         sum(n_pos) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS tp,
         sum(n_neg) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS fp,
         sum(n_pos) OVER ()::BIGINT AS tpos,
         sum(n_neg) OVER ()::BIGINT AS tneg
  FROM g
)
SELECT bin, n_pos, n_neg, tp, fp,
       (tp * 1000000 //
        (CASE WHEN tpos >= 1 THEN tpos ELSE 1 END))::BIGINT AS tpr_ppm,
       (fp * 1000000 //
        (CASE WHEN tneg >= 1 THEN tneg ELSE 1 END))::BIGINT AS fpr_ppm
FROM cum
"""


def q_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration audit (textstats.source_concentration):
    exact integer Gini + top-provider share over per-source CHAR
    totals (weight = n_chars — bytes, not doc counts, is what
    training actually consumes). One corpus groupBy; pairwise sum on
    the 20-source frame."""
    from beats_spark.operators.textstats import source_concentration

    return source_concentration(
        _load(spark, sf_dir, "documents"), weight_col="n_chars"
    )


_SQL_SOURCE_GINI = r"""
WITH g AS (
  SELECT source, sum(n_chars)::BIGINT AS x
  FROM documents GROUP BY source
), pair AS (
  SELECT sum(abs(a.x - b.x))::BIGINT AS d FROM g a, g b
), tot AS (
  SELECT count(*)::BIGINT AS n_groups, sum(x)::BIGINT AS total,
         max(x)::BIGINT AS mx
  FROM g
)
SELECT n_groups, total,
       (d * 1000000 // (CASE WHEN n_groups * total >= 1
                        THEN 2 * n_groups * total ELSE 1 END))::BIGINT
         AS gini_micro,
       (mx * 1000000 //
        (CASE WHEN total >= 1 THEN total ELSE 1 END))::BIGINT
         AS top_share_ppm
FROM tot, pair
"""


_MIX_WEIGHTS = {
    "src0": 300, "src1": 200, "src2": 150, "src3": 100, "src4": 100,
    "src5": 50, "src6": 50, "src7": 25, "src8": 15, "src9": 10,
}


def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget repeat-factor planner (sampling.mixture_epochs):
    explicit mixture weights over ten sources (the other ten get
    weight 0 → epochs 0), a 100k-token budget so the high-weight
    sources hit the 4-epoch cap while the low-weight ones land under
    it — every branch of the planner appears in the output."""
    from beats_spark.operators.sampling import mixture_epochs
    from beats_spark.operators.textstats import token_count_whitespace

    docs = _load(spark, sf_dir, "documents")
    out = mixture_epochs(
        docs,
        "source",
        token_count_whitespace(F.col("text")).cast("long"),
        budget_tokens=100_000,
        weights_milli=_MIX_WEIGHTS,
        max_epochs_milli=4000,
    )
    return out.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tokens").cast("long").alias("tokens"),
        F.col("weight_milli").cast("long").alias("weight_milli"),
        F.col("target_tokens").cast("long").alias("target_tokens"),
        F.col("epochs_milli").cast("long").alias("epochs_milli"),
        F.col("planned_tokens").cast("long").alias("planned_tokens"),
    )


def _sql_mixture_epochs() -> str:
    case = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH ps AS (
  SELECT source, count(*)::BIGINT AS n_docs,
    COALESCE(sum(CASE WHEN trim(text) = '' THEN 0
      ELSE len(string_split_regex(trim(text), '\\s+')) END), 0)::BIGINT
      AS tokens
  FROM documents GROUP BY source
), w AS (
  SELECT *, (CASE source {case} ELSE 0 END)::BIGINT AS weight_milli FROM ps
), t AS (
  SELECT *, (100000 * weight_milli // 1000)::BIGINT AS target_tokens FROM w
), e AS (
  SELECT *, (CASE WHEN tokens <= 0 THEN 0
                  WHEN target_tokens * 1000 // tokens > 4000 THEN 4000
                  ELSE target_tokens * 1000 // tokens END)::BIGINT
            AS epochs_milli
  FROM t
)
SELECT source, n_docs, tokens, weight_milli, target_tokens, epochs_milli,
       (tokens * epochs_milli // 1000)::BIGINT AS planned_tokens
FROM e
"""


def q_padding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucket padding audit (sampling.padding_stats): documents
    binned by whitespace-token count rounded up to a 32-token cap;
    per bucket the padding a pad-to-cap batcher would waste and the
    ppm efficiency — the measured case for pack_sequences."""
    from beats_spark.operators.sampling import padding_stats
    from beats_spark.operators.textstats import token_count_whitespace

    docs = _load(spark, sf_dir, "documents")
    out = padding_stats(
        docs, token_count_whitespace(F.col("text")).cast("long"), bucket=32
    )
    return out.select(
        F.col("cap").cast("long").alias("cap"),
        F.col("n_seqs").cast("long").alias("n_seqs"),
        F.col("token_sum").cast("long").alias("token_sum"),
        F.col("padding").cast("long").alias("padding"),
        F.col("eff_ppm").cast("long").alias("eff_ppm"),
    )


_SQL_PADDING_STATS = r"""
WITH tk AS (
  SELECT COALESCE(CASE WHEN trim(text) = '' THEN 0
    ELSE len(string_split_regex(trim(text), '\s+')) END, 0)::BIGINT AS toks
  FROM documents
), b AS (
  SELECT toks, ((greatest(toks, 1) + 31) // 32) * 32 AS cap FROM tk
)
SELECT cap::BIGINT AS cap, count(*)::BIGINT AS n_seqs,
       sum(toks)::BIGINT AS token_sum,
       (count(*) * cap - sum(toks))::BIGINT AS padding,
       (sum(toks) * 1000000 // (count(*) * cap))::BIGINT AS eff_ppm
FROM b GROUP BY cap
"""


def q_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection sampling (chat.best_of_n): documents grouped into
    50 candidate pools, scored by whitespace token count, top-2 per
    pool kept with a deterministic doc_id tie-break — the RFT
    best-of-n keep step. The oracle replays the identical window."""
    from beats_spark.operators.chat import best_of_n
    from beats_spark.operators.textstats import token_count_whitespace

    docs = _load(spark, sf_dir, "documents")
    cand = docs.select(
        "doc_id",
        (F.col("doc_id") % 50).cast("long").alias("prompt_id"),
        token_count_whitespace(F.col("text")).cast("long").alias("score"),
    )
    out = best_of_n(cand, "prompt_id", "score", "doc_id", n=2)
    return out.select(
        "doc_id", "prompt_id", "score",
        F.col("bon_rank").cast("long").alias("bon_rank"),
    )


_SQL_BEST_OF_N = r"""
WITH cand AS (
  SELECT doc_id, (doc_id % 50)::BIGINT AS prompt_id,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+'))
          END)::BIGINT AS score
  FROM documents
), r AS (
  SELECT doc_id, prompt_id, score,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score DESC, doc_id ASC) AS bon_rank
  FROM cand
)
SELECT doc_id, prompt_id, score, bon_rank::BIGINT AS bon_rank
FROM r WHERE bon_rank <= 2
"""


def q_code_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-corpus quality battery (textstats.code_stats): four
    deterministic subsets are replaced with code pathologies — a
    1200-char minified line, an auto-generated header, a 64-char hex
    digest blob, and a symbol-soup low-alnum doc — so every signal
    and the composed keep_code gate fire both ways."""
    from beats_spark.operators.textstats import code_stats

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 6 == 0, F.repeat(F.lit("x=1;"), 300))
        .when(
            did % 6 == 1,
            F.lit(
                "// Auto-generated by protoc. DO NOT EDIT.\n"
                "int main() { return 0; }"
            ),
        )
        .when(
            did % 6 == 2,
            F.concat(
                F.lit('digest = "'),
                F.repeat(F.lit("a1b2c3d4"), 8),
                F.lit('"\nreturn digest'),
            ),
        )
        .when(did % 6 == 3, F.lit("!!! ??? ... ---\n### $$$ %%% &&&"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return code_stats(planted, "text", "doc_id")


_SQL_CODE_STATS = r"""
WITH docs2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 6 = 0 THEN repeat('x=1;', 300)
         WHEN doc_id % 6 = 1 THEN '// Auto-generated by protoc. DO NOT EDIT.'
                                  || chr(10) || 'int main() { return 0; }'
         WHEN doc_id % 6 = 2 THEN 'digest = "' || repeat('a1b2c3d4', 8)
                                  || '"' || chr(10) || 'return digest'
         WHEN doc_id % 6 = 3 THEN '!!! ??? ... ---' || chr(10)
                                  || '### $$$ %%% &&&'
         ELSE text END AS text
  FROM documents
), s AS (
  SELECT doc_id, COALESCE(text, '') AS t FROM docs2
), c AS (
  SELECT doc_id,
    len(string_split(t, chr(10)))::BIGINT AS n_lines,
    COALESCE(list_max(list_transform(string_split(t, chr(10)),
                                     x -> length(x))), 0)::BIGINT
      AS max_line_len,
    COALESCE(list_sum(list_transform(string_split(t, chr(10)),
                                     x -> length(x))), 0)::BIGINT
      AS sum_lens,
    length(t)::BIGINT AS n_chars,
    len(regexp_extract_all(t, '[A-Za-z0-9]'))::BIGINT AS alnum_n,
    len(regexp_extract_all(t, '[0-9a-fA-F]{32,}'))::BIGINT AS n_hex_blobs,
    regexp_matches(t,
      '(?i)auto-?generated|do not edit|generated by|@generated')
      AS is_autogen
  FROM s
), m AS (
  SELECT doc_id, n_lines, max_line_len,
    (sum_lens * 1000 // greatest(n_lines, 1))::BIGINT AS avg_line_milli,
    (alnum_n * 1000 // greatest(n_chars, 1))::BIGINT AS alnum_milli,
    n_hex_blobs, is_autogen
  FROM c
)
SELECT doc_id, n_lines, max_line_len, avg_line_milli, alnum_milli,
       n_hex_blobs, is_autogen,
       (max_line_len <= 1000 AND avg_line_milli <= 100000
        AND alnum_milli >= 250 AND NOT is_autogen) AS keep_code
FROM m
"""


def q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed rate-spike detection (flowctl.rate_anomaly): every
    event on the 15TH OF EACH MONTH is remapped to event_type 'error'
    (the events table spans one month at these SFs, so one planted
    burst), making 'error' spike ~5× over its trailing-7-day mean
    while the other four types LOSE their day-15 bucket(s) entirely —
    exercising the observed-buckets window semantics on both sides.
    The oracle replays the identical ROWS window and cross-multiplied
    integer threshold."""
    from beats_spark.operators.flowctl import rate_anomaly

    ev = _load(spark, sf_dir, "events")
    planted = ev.select(
        "ts",
        F.when(F.dayofmonth("ts") == 15, F.lit("error"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
    )
    out = rate_anomaly(
        planted, "ts", "event_type", bucket="day",
        trail=7, threshold_milli=1500, min_trail=3,
    )
    return out.select(
        "event_type", "bucket_ts",
        F.col("cnt").cast("long").alias("cnt"),
        "trail_sum", "trail_n",
        F.col("ratio_milli").cast("long").alias("ratio_milli"),
        "is_spike",
    )


_SQL_RATE_ANOMALY = r"""
WITH ev AS (
  SELECT ts,
         CASE WHEN extract(day FROM ts) = 15 THEN 'error'
              ELSE event_type END AS event_type
  FROM events
), c AS (
  SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket_ts,
         count(*)::BIGINT AS cnt
  FROM ev GROUP BY event_type, date_trunc('day', ts)::TIMESTAMP
), w AS (
  SELECT event_type, bucket_ts, cnt,
    COALESCE(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket_ts
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS trail_sum,
    count(cnt) OVER (PARTITION BY event_type ORDER BY bucket_ts
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)::BIGINT AS trail_n
  FROM c
)
SELECT event_type, bucket_ts, cnt, trail_sum, trail_n,
  CASE WHEN trail_n >= 3 AND trail_sum > 0
       THEN (cnt * 1000 * trail_n // trail_sum)::BIGINT END AS ratio_milli,
  CASE WHEN trail_n >= 3 AND trail_sum > 0
       THEN cnt * 1000 * trail_n >= 1500 * trail_sum
       ELSE false END AS is_spike
FROM w
"""


def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination (textstats.fuzzy_decontaminate):
    MinHash-LSH candidate generation between the training corpus and
    a derived eval set, exact-Jaccard verified at 0.5. The eval set is
    a deterministic plant — every 97th document truncated to 70% of
    its characters, simulating a benchmark item excerpted from a page
    that is also in the training set (the case exact 32-token window
    fingerprints in `decontaminate` can miss when the cut crosses
    every window). Oracle: brute-force exact Jaccard of all
    train × eval pairs in DuckDB (6 eval docs ⇒ trivially small).

    Equality gate note (same argument as q_dedup_minhash_lsh): verify
    makes precision exact; candidates use rows=1 banding (any one of
    64 minhash agreements — recall-first, see the operator docstring
    for the measured affine-family bias that rules out rows≥2 band
    math), and all hashes are deterministic, so on the fixed corpora
    output == oracle, checked at sf0.001 and sf0.01, cannot flake."""
    from beats_spark.operators.textstats import fuzzy_decontaminate

    docs = _load(spark, sf_dir, "documents")
    evals = docs.filter(
        (F.col("doc_id") % 97 == 3) & F.col("text").isNotNull()
    ).select(
        "doc_id",
        F.expr("substring(text, 1, greatest(length(text) * 7 div 10, 1))")
        .alias("text"),
    )
    return fuzzy_decontaminate(
        docs, evals, shingle_n=5, num_hashes=64, bands=64, threshold=0.5
    )


_SQL_DECONTAMINATE_FUZZY = r"""
WITH ev AS (
  SELECT doc_id AS eval_id,
         substr(text, 1, greatest((length(text) * 7) // 10, 1)) AS text
  FROM documents WHERE doc_id % 97 = 3 AND text IS NOT NULL
), tsh AS (
  SELECT doc_id AS train_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
    WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> '')
), esh AS (
  SELECT eval_id,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT eval_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM ev
    WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> '')
)
SELECT t.train_id, e.eval_id,
       len(list_intersect(t.grams, e.grams))::DOUBLE
         / len(list_distinct(t.grams || e.grams))::DOUBLE AS jaccard
FROM tsh t CROSS JOIN esh e
WHERE len(list_intersect(t.grams, e.grams))::DOUBLE
        / len(list_distinct(t.grams || e.grams))::DOUBLE >= 0.5
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-script tokenizer fertility (textstats.tokenizer_fertility)
    over the script_stats multilingual plant: chars-per-token for the
    whitespace and BPE-ish tokenizers, stratified by dominant script.
    The CJK stratum prices ~1 char/BPE-token vs many chars/ws-token —
    exactly the correction factor a token budget needs. All-integer
    output; the oracle replays the identical regex batteries."""
    from beats_spark.operators.textstats import tokenizer_fertility

    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(did % 5 == 0, F.lit("你好世界 こんにちは 世界 조선말"))
        .when(did % 5 == 1, F.lit("привет мир снова и снова"))
        .when(did % 5 == 2, F.lit("مرحبا بالعالم مرة أخرى"))
        .when(did % 5 == 3, F.lit("12345 67890 +-/*"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return tokenizer_fertility(planted, "text", "doc_id")


_SQL_TOKENIZER_FERTILITY = r"""
WITH docs2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN '你好世界 こんにちは 世界 조선말'
         WHEN doc_id % 5 = 1 THEN 'привет мир снова и снова'
         WHEN doc_id % 5 = 2 THEN 'مرحبا بالعالم مرة أخرى'
         WHEN doc_id % 5 = 3 THEN '12345 67890 +-/*'
         ELSE text END AS text
  FROM documents
), c AS (
  SELECT
    COALESCE(len(regexp_extract_all(text,
      '[A-Za-z\x{00c0}-\x{024f}]')), 0)::BIGINT AS latin,
    COALESCE(len(regexp_extract_all(text,
      '[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]')),
      0)::BIGINT AS cjk,
    COALESCE(len(regexp_extract_all(text,
      '[\x{0400}-\x{04ff}]')), 0)::BIGINT AS cyrillic,
    COALESCE(len(regexp_extract_all(text,
      '[\x{0600}-\x{06ff}]')), 0)::BIGINT AS arabic,
    COALESCE(length(text), 0)::BIGINT AS n_chars,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS tws,
    len(regexp_extract_all(text,
      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS tbpe
  FROM docs2
), d AS (
  SELECT n_chars, tws, tbpe,
    CASE WHEN latin >= cjk AND latin >= cyrillic AND latin >= arabic
              AND latin > 0 THEN 'latin'
         WHEN cjk >= cyrillic AND cjk >= arabic AND cjk > 0 THEN 'cjk'
         WHEN cyrillic >= arabic AND cyrillic > 0 THEN 'cyrillic'
         WHEN arabic > 0 THEN 'arabic'
         ELSE 'none' END AS dominant_script
  FROM c
)
SELECT dominant_script,
  count(*)::BIGINT AS n_docs,
  sum(n_chars)::BIGINT AS sum_chars,
  sum(tws)::BIGINT AS sum_tokens_ws,
  sum(tbpe)::BIGINT AS sum_tokens_bpe,
  (sum(n_chars)::BIGINT * 1000
     // greatest(COALESCE(sum(tws)::BIGINT, 0), 1)) AS chars_per_ws_token_milli,
  (sum(n_chars)::BIGINT * 1000
     // greatest(COALESCE(sum(tbpe)::BIGINT, 0), 1)) AS chars_per_bpe_token_milli
FROM d
GROUP BY dominant_script
ORDER BY dominant_script
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (analytics.event_funnel) over the
    events table: view → click → purchase with first-occurrence
    ordering per user. One user-keyed shuffle + one global rollup;
    all-integer output (ppm ratios). Oracle replays the conditional
    min-µs battery and the ordered-reach flags."""
    from beats_spark.operators.analytics import event_funnel

    ev = _load(spark, sf_dir, "events")
    return event_funnel(ev, ["view", "click", "purchase"])


_SQL_EVENT_FUNNEL = r"""
WITH pu AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1,
    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
  FROM events GROUP BY user_id
), tot AS (
  SELECT
    COALESCE(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END), 0)::BIGINT AS n0,
    COALESCE(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
             THEN 1 ELSE 0 END), 0)::BIGINT AS n1,
    COALESCE(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
                  AND t2 IS NOT NULL AND t2 >= t1
             THEN 1 ELSE 0 END), 0)::BIGINT AS n2
  FROM pu
)
SELECT 1 AS step_idx, 'view' AS step, n0 AS n_users,
       n0 * 1000000 // greatest(n0, 1) AS conv_ppm FROM tot
UNION ALL
SELECT 2, 'click', n1, n1 * 1000000 // greatest(n0, 1) FROM tot
UNION ALL
SELECT 3, 'purchase', n2, n2 * 1000000 // greatest(n0, 1) FROM tot
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (analytics.retention_cohorts): users cohorted
    by the 7-day bucket of their first signup, activity counted in
    periods 0..4. Integer epoch-µs bucket arithmetic on both engines
    (Spark `div` and DuckDB `//` both truncate toward zero on
    integers — verified, they agree on negatives too; pre-anchor
    events are excluded before dividing for the semantic reason:
    pre-signup activity is not retention)."""
    from beats_spark.operators.analytics import retention_cohorts

    ev = _load(spark, sf_dir, "events")
    return retention_cohorts(
        ev, anchor_type="signup", period_days=7, max_periods=4
    )


_SQL_RETENTION_COHORTS = r"""
WITH a AS (
  SELECT user_id, min(epoch_us(ts)) AS anchor_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), st AS (
  SELECT e.user_id,
         a.anchor_us // 604800000000 AS cohort_idx,
         (epoch_us(e.ts) - a.anchor_us) // 604800000000 AS period
  FROM events e JOIN a USING (user_id)
  WHERE epoch_us(e.ts) >= a.anchor_us
), act AS (
  SELECT cohort_idx, period, count(*)::BIGINT AS n_active
  FROM (SELECT DISTINCT cohort_idx, period, user_id
        FROM st WHERE period <= 4)
  GROUP BY cohort_idx, period
)
SELECT act.cohort_idx, act.period, act.n_active,
       act.n_active * 1000000 // greatest(b.n_active, 1) AS retention_ppm
FROM act
JOIN (SELECT cohort_idx, n_active FROM act WHERE period = 0) b
  USING (cohort_idx)
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group heavy hitters (analytics.heavy_hitters): top-3
    users per event_type with count, deterministic rank (count desc,
    value asc) and integer-ppm share. Oracle replays the identical
    windows in DuckDB."""
    from beats_spark.operators.analytics import heavy_hitters

    ev = _load(spark, sf_dir, "events")
    return heavy_hitters(ev, "event_type", "user_id", k=3)


_SQL_HEAVY_HITTERS = r"""
WITH c AS (
  SELECT event_type, user_id, count(*)::BIGINT AS n_events
  FROM events WHERE user_id IS NOT NULL
  GROUP BY event_type, user_id
), r AS (
  SELECT event_type, user_id, n_events,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY n_events DESC, user_id ASC) AS rank,
    sum(n_events) OVER (PARTITION BY event_type)::BIGINT AS total
  FROM c
)
SELECT event_type, rank::BIGINT AS rank, user_id, n_events,
       (n_events * 1000000 // greatest(total, 1)) AS share_ppm
FROM r WHERE rank <= 3
"""


def q_turn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-gap latency per role transition (analytics.turn_latency)
    over the event-turn stream (key=user_id, role=event_type — the
    established conversation_stats idiom): integer-ms gap statistics
    for every (prev_role → role) pair. Window ordered by (epoch-µs,
    event_id) so lag() is tie-stable at any parallelism; oracle
    replays the identical window in DuckDB."""
    from beats_spark.operators.analytics import turn_latency

    ev = _load(spark, sf_dir, "events")
    return turn_latency(ev)


_SQL_TURN_LATENCY = r"""
WITH st AS (
  SELECT user_id, event_type AS role, event_id, epoch_us(ts) AS us
  FROM events WHERE ts IS NOT NULL
), g AS (
  SELECT
    lag(role) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_role,
    role,
    (us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)) // 1000
      AS gap_ms
  FROM st
)
SELECT prev_role, role,
       count(*)::BIGINT AS n_gaps,
       sum(gap_ms)::BIGINT AS sum_gap_ms,
       max(gap_ms)::BIGINT AS max_gap_ms,
       (sum(gap_ms)::BIGINT // greatest(count(*), 1)) AS mean_gap_ms
FROM g WHERE prev_role IS NOT NULL
GROUP BY prev_role, role
"""


def q_clean_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical make-your-own-benchmark flow composed end-to-end:
    deterministic hash split (sampling.split_train_eval, 5% eval) →
    fuzzy decontamination of the TRAIN side against the EVAL side
    (textstats.fuzzy_decontaminate, exact-Jaccard ≥ 0.5 verify) →
    per-doc verdict. A train doc that is a near-copy of an eval doc
    is flagged contaminated and dropped from the kept set; eval docs
    always keep (they ARE the benchmark). Contamination is planted
    AFTER the split, deterministically on both sides (train docs at
    doc_id%97==2 get a 15-word passage; eval docs at doc_id%5==0 get
    its 13-word prefix — shingle Jaccard 9/11), so the contaminated
    branch is provably non-empty at every SF and the oracle (which
    re-splits, re-plants, brute-forces exact Jaccard over
    train × eval, and replays the flags) checks every branch. Plant
    predicates are deliberately sparse: k identical planted train
    docs × m planted eval docs materialize k·m candidate pairs — the
    same duplicate-heavy blowup the dedup family documents (measured
    here: %7 planting 17.1 s → %97 planting 9.3 s at sf0.1)."""
    from beats_spark.operators.sampling import split_train_eval
    from beats_spark.operators.textstats import fuzzy_decontaminate

    docs = _load(spark, sf_dir, "documents")
    raw = split_train_eval(docs, "doc_id", eval_fraction=0.05, seed=5)
    did, sp = F.col("doc_id"), F.col("split")
    split = raw.withColumn(
        "text",
        F.when((sp == "train") & (did % 97 == 2), F.lit(_CLEAN_SPLIT_PASSAGE))
        .when((sp == "eval") & (did % 5 == 0), F.lit(_CLEAN_SPLIT_PREFIX))
        .otherwise(F.col("text")),
    )
    train = split.filter(F.col("split") == "train")
    evals = split.filter(F.col("split") == "eval")
    dirty = (
        fuzzy_decontaminate(train, evals, threshold=0.5)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    out = split.join(dirty, "doc_id", "left").select(
        "doc_id",
        "split",
        F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
        (
            (F.col("split") == "eval")
            | F.col("contaminated").isNull()
        ).alias("kept"),
    )
    return out


_CLEAN_SPLIT_PASSAGE = (
    "planted benchmark passage about gradient descent convergence"
    " rates in deep networks and beyond today"
)
_CLEAN_SPLIT_PREFIX = " ".join(_CLEAN_SPLIT_PASSAGE.split()[:13])

_SQL_CLEAN_SPLIT = rf"""
WITH sp0 AS (
  SELECT doc_id, text,
         CASE WHEN ('0x' || substr(md5('s5|' || doc_id::VARCHAR), 1, 15))::BIGINT
                   < 57646075230342352 THEN 'eval' ELSE 'train' END AS split
  FROM documents
), sp AS (
  SELECT doc_id, split,
         CASE WHEN split = 'train' AND doc_id % 97 = 2
                THEN '{_CLEAN_SPLIT_PASSAGE}'
              WHEN split = 'eval' AND doc_id % 5 = 0
                THEN '{_CLEAN_SPLIT_PREFIX}'
              ELSE text END AS text
  FROM sp0
), sh AS (
  SELECT doc_id, split,
         list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         )) AS grams
  FROM (
    SELECT doc_id, split,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM sp
    WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> '')
), dirty AS (
  SELECT DISTINCT t.doc_id
  FROM sh t JOIN sh e ON t.split = 'train' AND e.split = 'eval'
  WHERE len(list_intersect(t.grams, e.grams))::DOUBLE
          / len(list_distinct(t.grams || e.grams))::DOUBLE >= 0.5
)
SELECT s.doc_id, s.split,
       (d.doc_id IS NOT NULL) AS contaminated,
       (s.split = 'eval' OR d.doc_id IS NULL) AS kept
FROM sp s LEFT JOIN dirty d USING (doc_id)
"""


def q_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced downsampling (sampling.cluster_balance): the
    oracle-proven integer cell assignment (same fixed ±1 centroids as
    `ivf_assign`), per-cell counts, and the portable-md5 hash gate
    thinning over-cap clusters to ~cap members. cap=40 against ~62
    vectors/cell at sf0.01 so every branch (keep-all vs thin) is
    exercised. All comparisons int64-exact; oracle replays assignment,
    counts, and the 40-bit threshold rule."""
    from beats_spark.operators.sampling import cluster_balance
    from beats_spark.operators.similarity import fixed_centroids

    emb = _load(spark, sf_dir, "embeddings")
    return cluster_balance(
        emb, fixed_centroids(8, 64), cap_per_cluster=40
    ).select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "n_cluster", "kept"
    )


def _sql_cluster_balance() -> str:
    cap = 40
    numer = (1 << 40) * cap
    return f"""
WITH cells AS ({_sql_ivf_assign()}),
counts AS (
  SELECT cell, count(*)::BIGINT AS n_cluster FROM cells GROUP BY cell
)
SELECT c.vec_id, c.cell::BIGINT AS cell, n.n_cluster,
       (n.n_cluster <= {cap}) OR
       ((('0x' || substr(md5('s0|' || c.vec_id::VARCHAR), 1, 15))::BIGINT
           // 1048576) < ({numer} // n.n_cluster)) AS kept
FROM cells c JOIN counts n USING (cell)
"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pipeline_fanout(spark, "/root/testdata/sf0.001")



# ---------------------------------------------------------------------------
# Temporal join & rollup family (operators/temporal.py + analytics tail)
# ---------------------------------------------------------------------------

_ASOF_TYPES = "array('click','signup','error','view','purchase')"
_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def _deploys(spark: SparkSession) -> DataFrame:
    """Deterministic deployment dim: 40 releases, one every 13 h from
    2024-01-01, rotating over the five services (= event types). Built
    from spark.range — no driver-side data, same rows at every SF."""
    return spark.range(40).select(
        F.expr(
            f"element_at({_ASOF_TYPES}, cast(id % 5 + 1 as int))"
        ).alias("service"),
        F.expr(
            f"timestamp_micros({_EPOCH_2024_US} + id * 46800000000)"
        ).alias("deploy_ts"),
        F.col("id").alias("version"),
    )


def q_asof_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (temporal.asof_join, broadcast strategy): every
    event attaches the latest deployment of its service at its
    timestamp — "which release was live when this fired" — then rolls
    up event counts per (service, version). Early events that precede
    their service's first deploy keep version NULL (left-join
    semantics). Oracle replays it with DuckDB's native ASOF LEFT
    JOIN — an independent implementation of the same contract."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events").withColumnRenamed(
        "event_type", "service"
    )
    from beats_spark.operators.temporal import asof_join

    hit = asof_join(
        ev,
        _deploys(spark),
        on="service",
        left_ts="ts",
        right_ts="deploy_ts",
        payload=["version"],
        strategy="broadcast",
    )
    return hit.groupBy("service", "version").agg(
        F.count(F.lit(1)).alias("n_events")
    )


_SQL_ASOF_VERSIONS = r"""
WITH dep AS (
  SELECT (['click','signup','error','view','purchase'])[(i % 5 + 1)::INT]
           AS service,
         make_timestamp(1704067200000000 + i * 46800000000) AS deploy_ts,
         i AS version
  FROM range(40) t(i)
)
SELECT e.event_type AS service, d.version, count(*)::BIGINT AS n_events
FROM events e
ASOF LEFT JOIN dep d
  ON e.event_type = d.service AND e.ts >= d.deploy_ts
GROUP BY 1, 2
"""


def q_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (temporal.scd2_build): collapse the
    per-user event stream into state-validity intervals — a new
    version opens only when event_type actually changes; no-op
    repeats extend the run. The producing twin of asof_versions'
    consuming as-of join. One key shuffle serves flag, numbering and
    valid_to. Oracle replays the lag/filter/lead construction with
    DuckDB's IS DISTINCT FROM."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.temporal import scd2_build

    out = scd2_build(
        ev, "user_id", "ts", ["event_type"], order_cols=("event_id",)
    )
    return out.select(
        "user_id",
        "version",
        F.col("event_type").alias("state"),
        F.unix_micros(F.col("valid_from").try_cast("timestamp")).alias(
            "valid_from_us"
        ),
        F.unix_micros(F.col("valid_to").try_cast("timestamp")).alias(
            "valid_to_us"
        ),
        "is_current",
    )


_SQL_SCD2_VERSIONS = r"""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         (lag(ts) OVER w IS NULL
          OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS opens
  FROM events
  WHERE ts IS NOT NULL  -- mirror scd2_build's try_cast exclusion
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, ts, event_type,
         row_number() OVER w2 AS version,
         lead(ts) OVER w2 AS valid_to
  FROM ordered WHERE opens
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, version::BIGINT AS version, event_type AS state,
       epoch_us(ts) AS valid_from_us, epoch_us(valid_to) AS valid_to_us,
       valid_to IS NULL AS is_current
FROM runs
"""


_BM25_QUERIES = [
    ("q_boilerplate", "the a"),
    ("q_rare", "dup"),
    ("q_mixed", "dup hash join"),
    ("q_phrase", "window merge sort"),
    ("q_missing", "zzzunseen"),
]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text relevance search (search.bm25_search): top-10 docs
    per query under integer-deterministic BM25 (floor-log2 idf with
    a presence floor, milli-rational tf normalization — module
    docstring has the algebra). The exploded token stream joins the
    broadcast query vocabulary BEFORE the postings shuffle, so the
    inverted index materializes only for query terms. Oracle replays
    every integer step in DuckDB."""
    from beats_spark.operators.search import bm25_search

    docs = _load(spark, sf_dir, "documents")
    return bm25_search(docs, _BM25_QUERIES, "text", "doc_id", k=10)


_SQL_BM25_SEARCH = r"""
WITH q(query_id, qtext) AS (
  VALUES ('q_boilerplate', 'the a'), ('q_rare', 'dup'),
         ('q_mixed', 'dup hash join'), ('q_phrase', 'window merge sort'),
         ('q_missing', 'zzzunseen')
), qt AS (
  SELECT DISTINCT query_id, tok FROM (
    SELECT query_id,
           unnest(string_split(
             trim(regexp_replace(lower(qtext), '\s+', ' ', 'g')), ' '
           )) AS tok
    FROM q
  ) WHERE tok <> ''
), vocab AS (
  SELECT DISTINCT tok FROM qt
), base AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
         ), x -> x <> '') AS tk
  FROM documents
), dls AS (
  SELECT doc_id, length(tk)::BIGINT AS dl, tk FROM base
), totals AS (
  -- quotient/remainder split mirrors the Spark side: the corpus
  -- token total is never multiplied
  SELECT count(*)::BIGINT AS n_docs,
         ((sum(dl)::BIGINT // greatest(count(*), 1)) * 1000
          + ((sum(dl)::BIGINT % greatest(count(*), 1)) * 1000
             // greatest(count(*), 1)))::BIGINT AS avgdl_milli
  FROM dls
), toks AS (
  SELECT doc_id, dl, unnest(tk) AS tok FROM dls
), matched AS (
  SELECT tok, doc_id, dl, count(*)::BIGINT AS tf
  FROM toks JOIN vocab USING (tok)
  GROUP BY tok, doc_id, dl
), dfreq AS (
  SELECT tok, count(*)::BIGINT AS df FROM matched GROUP BY tok
), scored AS (
  SELECT m.tok, m.doc_id,
         greatest(1, (length(bin(2 * n_docs - 2 * df + 1)) - 1)
                     - (length(bin(2 * df + 1)) - 1))::BIGINT
           * ((22000000 * m.tf)
              // (10000 * m.tf + 3000
                  + 9 * ((m.dl * 1000000) // greatest(avgdl_milli, 1))))
           AS partial
  FROM matched m JOIN dfreq USING (tok), totals
), hits AS (
  SELECT query_id, doc_id, sum(partial)::BIGINT AS score_milli
  FROM scored JOIN qt USING (tok)
  GROUP BY query_id, doc_id
  HAVING sum(partial) > 0
)
SELECT query_id, doc_id, score_milli,
       row_number() OVER (
         PARTITION BY query_id ORDER BY score_milli DESC, doc_id
       )::BIGINT AS rank
FROM hits
QUALIFY rank <= 10
"""


_HYBRID_PROBES = {
    "q_boilerplate": 7,
    "q_rare": 101,
    "q_mixed": 202,
    "q_phrase": 303,
    "q_missing": 404,
}


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (search.bm25_search → search.rrf_rerank):
    the BM25 top-10 candidates per query are fused with a dense
    cosine re-rank (each query's vector = a fixed probe doc's
    embedding) by reciprocal-rank fusion — exact integer RRF scores
    once ranks are fixed; cosine enters by ORDER only (the
    knn_bruteforce ids-only discipline). The corpus embedding matrix
    is touched by ONE broadcast-candidates join; every window runs
    on the ≤|queries|·10 candidate frame. The oracle recomputes both
    stages (the BM25 CTE verbatim + DuckDB's native
    list_cosine_similarity for the re-rank order)."""
    from beats_spark.operators.search import bm25_search, rrf_rerank

    docs = _load(spark, sf_dir, "documents")
    emb = _load(spark, sf_dir, "embeddings")
    cand = bm25_search(docs, _BM25_QUERIES, "text", "doc_id", k=10)
    return rrf_rerank(cand, emb, _HYBRID_PROBES, k=5)


def _sql_hybrid_search() -> str:
    pv = " UNION ALL ".join(
        f"SELECT '{q}' AS query_id, {v} AS pvec"
        for q, v in sorted(_HYBRID_PROBES.items())
    )
    return f"""
WITH cand AS (
  SELECT query_id, doc_id, rank AS r1 FROM ({_SQL_BM25_SEARCH}) bm
), pv AS ({pv}),
j AS (
  SELECT c.query_id, c.doc_id, c.r1,
         row_number() OVER (
           PARTITION BY c.query_id
           ORDER BY list_cosine_similarity(pe.embedding::DOUBLE[],
                                           de.embedding::DOUBLE[]) DESC,
                    c.doc_id
         )::BIGINT AS r2
  FROM cand c
  JOIN embeddings de ON de.vec_id = c.doc_id
  JOIN pv ON pv.query_id = c.query_id
  JOIN embeddings pe ON pe.vec_id = pv.pvec
), s AS (
  SELECT query_id, doc_id,
         (1000000 // (60 + r1) + 1000000 // (60 + r2))::BIGINT
           AS rrf_micro
  FROM j
)
SELECT query_id, doc_id, rrf_micro,
       row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id
       )::BIGINT AS rank
FROM s
QUALIFY rank <= 5
"""


def q_domain_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native OLAP cube over the corpus dimensions — every (lang,
    source) combination plus both one-dimension subtotals and the
    grand total in ONE pass (Catalyst's Expand: each row fans out to
    its 4 grouping sets before a single keyed aggregate — never 4
    scans). grouping_id() disambiguates subtotal NULLs from data
    NULLs; both engines put the leftmost cube column in the most
    significant bit. Oracle is DuckDB's native GROUP BY CUBE."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select("lang", "source", "n_docs", "sum_chars", "gid")
    )


_SQL_DOMAIN_CUBE = r"""
SELECT lang, source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       grouping(lang, source)::BIGINT AS gid
FROM documents
GROUP BY CUBE (lang, source)
"""


def q_tool_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence pair mining (analytics.cooccurrence_pairs):
    which event types share a user — the market-basket pair stage
    over the routed stream (which tools fire in the same
    conversation, at transcript scale). Distinct (group, item)
    first, capped within-group self-join, integer-ppm support.
    Oracle replays distinct, cap, pair join and rank."""
    from beats_spark.operators.analytics import cooccurrence_pairs

    ev = _load(spark, sf_dir, "events")
    return cooccurrence_pairs(
        ev, "user_id", "event_type", max_items_per_group=100
    )


_SQL_TOOL_PAIRS = r"""
WITH items AS (
  SELECT DISTINCT user_id AS g, event_type AS i
  FROM events WHERE event_type IS NOT NULL
), tot AS (
  SELECT count(DISTINCT g)::BIGINT AS n_total FROM items
), narrow AS (
  SELECT g, i FROM items
  WHERE g IN (SELECT g FROM items GROUP BY g HAVING count(*) <= 100)
), pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n_groups
  FROM narrow a JOIN narrow b ON a.g = b.g AND a.i < b.i
  GROUP BY 1, 2
)
SELECT item_a, item_b, n_groups,
       (n_groups * 1000000 // greatest(n_total, 1))::BIGINT AS support_ppm,
       row_number() OVER (
         ORDER BY n_groups DESC, item_a, item_b
       )::BIGINT AS rank
FROM pairs, tot
"""


_PHRASE_QUERIES = [
    ("p_hash_join", "hash join"),
    ("p_batch3", "batch batch batch"),
    ("p_window2", "window window"),
    ("p_missing", "join zebra"),
]


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search (search.phrase_search): exact
    ordered-adjacency matches over posexplode postings pruned by the
    broadcast phrase vocabulary, overlap-counting (Lucene sliding
    positions — 'batch batch batch' exercises it). Oracle rebuilds
    positional postings via list_transform-with-index and replays
    each phrase's adjacency join chain."""
    from beats_spark.operators.search import phrase_search

    docs = _load(spark, sf_dir, "documents")
    return phrase_search(docs, _PHRASE_QUERIES, "text", "doc_id", k=10)


def _sql_phrase_search() -> str:
    from beats_spark.operators.search import phrase_tokens

    legs = []
    for qid, text in _PHRASE_QUERIES:
        toks = phrase_tokens(text)
        joins, conds = [], []
        for off, t in enumerate(toks[1:], start=1):
            joins.append(
                f"JOIN post p{off} ON p{off}.doc_id = p0.doc_id "
                f"AND p{off}.pos = p0.pos + {off} "
                f"AND p{off}.tok = '{t}'"
            )
        legs.append(
            f"SELECT '{qid}' AS query_id, p0.doc_id, "
            "count(*)::BIGINT AS n_matches\n"
            "  FROM post p0 " + " ".join(joins) + "\n"
            f"  WHERE p0.tok = '{toks[0]}' GROUP BY 1, 2"
        )
    union = "\nUNION ALL\n".join(legs)
    return rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
         ), x -> x <> '') AS tk
  FROM documents
), post AS (
  SELECT doc_id, u.s.pos::BIGINT AS pos, u.s.tok AS tok
  FROM base, unnest(list_transform(
    tk, (x, i) -> struct_pack(pos := i - 1, tok := x)
  )) u(s)
), hits AS (
{union}
)
SELECT query_id, doc_id, n_matches,
       row_number() OVER (
         PARTITION BY query_id ORDER BY n_matches DESC, doc_id
       )::BIGINT AS rank
FROM hits
QUALIFY rank <= 10
"""


def q_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction (search.keyword_extract):
    top-3 characteristic terms by integer tf-idf — tf · floor-log2
    idf bits (presence floor 1), token-text tie-break. The full-
    corpus doc-vector build: one (doc,tok) tf shuffle + one (tok) df
    aggregate. Oracle replays tf, df, idf and the rank window."""
    from beats_spark.operators.search import keyword_extract

    docs = _load(spark, sf_dir, "documents")
    return keyword_extract(docs, "text", "doc_id", k=3)


_SQL_KEYWORD_EXTRACT = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
         ), x -> x <> '') AS tk
  FROM documents
), n AS (
  SELECT count(*)::BIGINT AS n_docs FROM base
), toks AS (
  SELECT doc_id, unnest(tk) AS tok FROM base
), tf AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1
), scored AS (
  SELECT t.doc_id, t.tok, t.tf,
         (t.tf * greatest(1,
            (length(bin(2 * n_docs - 2 * df + 1)) - 1)
            - (length(bin(2 * df + 1)) - 1)))::BIGINT AS score
  FROM tf t JOIN dfreq USING (tok), n
)
SELECT doc_id, tok, tf, score,
       row_number() OVER (
         PARTITION BY doc_id ORDER BY score DESC, tok
       )::BIGINT AS rank
FROM scored
QUALIFY rank <= 3
"""


_ZORDER_BITS = 8
_ZORDER_FILES = 64


def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout proof (layout.zorder_layout_stats): events
    keyed by Morton-interleaved (time-bucket, user-bucket) on a
    256×256 grid, assigned to fixed-width zkey file ranges; output
    is each file's row count and (x, y) bucket bounding box — the
    min/max statistics a scan planner prunes on. All-integer bucket
    and interleave math; the oracle's interleave expression is
    emitted by the SAME loop in the other dialect."""
    _utc(spark)
    from beats_spark.operators.layout import zorder_layout_stats

    ev = _load(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").try_cast("timestamp")).alias("_tus"),
        "user_id",
    )
    return zorder_layout_stats(
        ev, "_tus", "user_id", bits=_ZORDER_BITS, n_files=_ZORDER_FILES
    )


def _sql_zorder_stats() -> str:
    from beats_spark.operators.layout import (
        bucket_sql,
        zorder_interleave_sql,
    )

    bits, n_files = _ZORDER_BITS, _ZORDER_FILES
    xb = bucket_sql("epoch_us(ts)", "xmin", "xmax", bits, "duckdb")
    yb = bucket_sql("user_id", "ymin", "ymax", bits, "duckdb")
    z = zorder_interleave_sql("xb", "yb", bits, "duckdb")
    # same ceil rule as zorder_layout_stats — parameters can't drift
    cpf = max(-(-(1 << (2 * bits)) // n_files), 1)
    return f"""
WITH mm AS (
  SELECT min(epoch_us(ts)) AS xmin, max(epoch_us(ts)) AS xmax,
         min(user_id) AS ymin, max(user_id) AS ymax
  FROM events
), keyed AS (
  SELECT {xb} AS xb, {yb} AS yb FROM events, mm
), z AS (
  SELECT xb, yb, {z} AS zkey FROM keyed
)
SELECT (zkey // {cpf})::BIGINT AS file_id, count(*)::BIGINT AS n_rows,
       min(xb)::BIGINT AS x_min, max(xb)::BIGINT AS x_max,
       min(yb)::BIGINT AS y_min, max(yb)::BIGINT AS y_max
FROM z GROUP BY 1
"""


def q_incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with no equi-key (temporal.interval_join): 40
    deterministic 5-hour incident windows (one every 17 h from
    2024-01-01) match events by timestamp containment alone; rollup =
    events and errors per incident. The plan is the anti-cross-join
    bucket-grid equi-join; the oracle is DuckDB's native inequality
    join over the same windows."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    iv = spark.range(40).select(
        F.col("id").alias("incident_id"),
        F.expr(
            f"timestamp_micros({_EPOCH_2024_US} + id * 61200000000)"
        ).alias("start_ts"),
        F.expr(
            f"timestamp_micros({_EPOCH_2024_US} + id * 61200000000"
            " + 18000000000)"
        ).alias("end_ts"),
        (F.col("id") % 3).alias("severity"),
    )
    from beats_spark.operators.temporal import interval_join

    j = interval_join(ev, iv, "ts", "start_ts", "end_ts", bucket_s=3600)
    return j.groupBy("incident_id", "severity").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias(
            "n_errors"
        ),
    )


_SQL_INCIDENT_WINDOWS = r"""
WITH iv AS (
  SELECT i AS incident_id,
         make_timestamp(1704067200000000 + i * 61200000000) AS s,
         make_timestamp(1704067200000000 + i * 61200000000
                        + 18000000000) AS e,
         i % 3 AS severity
  FROM range(40) t(i)
)
SELECT incident_id, severity, count(*)::BIGINT AS n_events,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
         AS n_errors
FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts < iv.e
GROUP BY 1, 2
"""


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup (temporal.time_rollup):
    per-event-type counts and floor(value·10⁶) integer sums at hour /
    day / week grains, the coarser grains re-aggregated from the hour
    frame (one raw-event shuffle total). Oracle aggregates each grain
    directly from the raw events — exactness of count/sum/min/max
    composition is what the parity check proves."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.temporal import time_rollup

    return time_rollup(ev, "ts", ["event_type"], "value")


_SQL_TIME_ROLLUP = r"""
WITH s AS (
  SELECT event_type, epoch_us(ts) AS us,
         CASE WHEN isfinite(value)
              THEN floor(value * 1000000)::BIGINT END AS v
  FROM events WHERE ts IS NOT NULL
), lv AS (
  SELECT 'hour' AS grain, 3600000000 AS g FROM (VALUES (1))
  UNION ALL SELECT 'day', 86400000000 FROM (VALUES (1))
  UNION ALL SELECT 'week', 604800000000 FROM (VALUES (1))
)
-- floor-aligned bucket start (x - pmod(x,g)): DuckDB // truncates
-- toward zero on BIGINT, which would diverge from Spark's floor
-- bucketing (and F.window's grid) for pre-1970 timestamps
SELECT lv.grain, (s.us - (((s.us % lv.g) + lv.g) % lv.g)) AS bucket_start_us,
       s.event_type,
       count(*)::BIGINT AS n_events,
       sum(s.v)::BIGINT AS sum_value_e6,
       min(s.v)::BIGINT AS min_value_e6,
       max(s.v)::BIGINT AS max_value_e6
FROM s CROSS JOIN lv
GROUP BY 1, 2, 3
"""


def q_near_dup_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-loop detection (analytics.near_dup_turns): consecutive
    same-role turns in each user stream scored by Levenshtein distance
    over the first 64 payload chars, threshold 1 — the near-verbatim
    retry rate per role. Oracle replays the identical window + DuckDB
    levenshtein (two independent edit-distance implementations must
    agree on every pair for the hash to match)."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.analytics import near_dup_turns

    return near_dup_turns(ev, threshold=1)


_SQL_NEAR_DUP_TURNS = r"""
WITH st AS (
  SELECT user_id, event_type AS role, event_id,
         regexp_replace(substr(props, 1, 64), '[^\x00-\x7F]', '?', 'g')
           AS txt,
         epoch_us(ts) AS us
  FROM events WHERE ts IS NOT NULL
), p AS (
  SELECT role,
         lag(role) OVER w AS prev_role,
         lag(txt) OVER w AS prev_txt,
         txt
  FROM st WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), d AS (
  SELECT role, levenshtein(txt, prev_txt) AS dist
  FROM p
  WHERE prev_role = role AND txt IS NOT NULL AND prev_txt IS NOT NULL
)
SELECT role, count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN dist <= 1 THEN 1 ELSE 0 END)::BIGINT AS n_near,
       (sum(CASE WHEN dist <= 1 THEN 1 ELSE 0 END)::BIGINT * 1000000
          // greatest(count(*), 1)) AS near_ppm,
       sum(dist)::BIGINT AS sum_dist,
       max(dist)::BIGINT AS max_dist
FROM d GROUP BY role
"""


def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles by nearest-rank selection
    (analytics.group_percentiles): p50/p90/p99 of the value column
    per event type. The emitted doubles are elements OF the data
    (selection, never interpolation) — the only float percentile that
    can pass a cross-engine value-hash gate."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.analytics import group_percentiles

    return group_percentiles(ev)


_SQL_LATENCY_PERCENTILES = r"""
WITH s AS (
  SELECT event_type, value AS v, event_id
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM s
)
SELECT event_type, max(n)::BIGINT AS n_values,
       max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN v END) AS p50,
       max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN v END) AS p90,
       max(CASE WHEN rn = (n - 1) * 99 // 100 + 1 THEN v END) AS p99
FROM r GROUP BY event_type
"""


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-actor counts (analytics.active_users): DAU
    and trailing-7-day WAU per epoch-day present in the data,
    long-format (window_days, day, n_active). The Spark plan reduces
    to distinct (day, user) FIRST and explodes the reduced frame; the
    oracle counts each trailing window directly — both must agree."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.analytics import active_users

    return active_users(ev)


_SQL_ACTIVE_USERS = r"""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), days AS (
  SELECT DISTINCT day FROM du
), w AS (
  SELECT * FROM (VALUES (1), (7)) t(window_days)
)
SELECT w.window_days, d.day,
       count(DISTINCT du.user_id)::BIGINT AS n_active
FROM w CROSS JOIN days d
JOIN du ON du.day BETWEEN d.day - w.window_days + 1 AND d.day
GROUP BY 1, 2
"""



def q_disorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder profile (analytics.disorder_stats) — the
    watermark-sizing measurement. The fixture streams are perfectly
    ordered, so disorder is PLANTED deterministically (events with
    event_id %% 17 == 3 shift back 0.5-24 hours by id) so every branch
    — on-time, late, per-role max — is non-trivially exercised at
    every SF; the oracle replays the plant and the identical
    running-max window."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    shift = F.when(
        F.col("event_id") % 17 == 3,
        (F.col("event_id") % 48 + 1) * F.lit(1_800_000_000),
    ).otherwise(F.lit(0))
    planted = ev.withColumn(
        "ts",
        F.timestamp_micros(
            F.unix_micros(F.col("ts").try_cast("timestamp")) - shift
        ),
    )
    from beats_spark.operators.analytics import disorder_stats

    return disorder_stats(planted)


_SQL_DISORDER_STATS = r"""
WITH pe AS (
  SELECT user_id, event_type AS role, event_id,
         epoch_us(ts) - CASE WHEN event_id % 17 = 3
                             THEN (event_id % 48 + 1) * 1800000000
                             ELSE 0 END AS us
  FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
), f AS (
  SELECT role, us,
         max(us) OVER (PARTITION BY user_id ORDER BY event_id, us
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pm
  FROM pe
), l AS (
  SELECT role,
         CASE WHEN us < pm THEN pm - us ELSE 0 END AS late_us
  FROM f
)
SELECT role, count(*)::BIGINT AS n_events,
       sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
       (sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT * 1000000
          // greatest(count(*), 1)) AS late_ppm,
       max(late_us // 1000)::BIGINT AS max_late_ms,
       sum(late_us // 1000)::BIGINT AS sum_late_ms
FROM l GROUP BY role
"""


def q_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day (temporal.concurrency_peak):
    gap-sessionize the event streams (12 h gap), roll sessions to
    [first, last] spans, and evaluate concurrency at the candidate
    instants (span starts + day boundaries) via interval_join — the
    capacity-planning rollup (days covered by a live session,
    including eventless mid-session days), built as a composition of the repo's
    own sessionizer and range join. Oracle rebuilds the whole chain:
    the sessionize window, the spans, and a direct containment join
    over the candidates."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.temporal import concurrency_peak

    return concurrency_peak(ev, "user_id", "ts", "event_id", gap_minutes=720)


_SQL_CONCURRENCY_PEAK = r"""
WITH st AS (
  SELECT user_id, epoch_us(ts) AS us,
         (sum(CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts) > 43200000000
                   THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
           AS sidx
  FROM (SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE ts IS NOT NULL)
), spans AS (
  SELECT user_id, sidx, min(us) AS smin, max(us) AS smax
  FROM st GROUP BY 1, 2
), present AS (
  SELECT DISTINCT d.day
  FROM spans s,
       unnest(generate_series(s.smin // 86400000000,
                              s.smax // 86400000000)) AS d(day)
), cand AS (
  SELECT DISTINCT day, t FROM (
    SELECT smin // 86400000000 AS day, smin AS t FROM spans
    UNION ALL
    SELECT day, day * 86400000000 AS t FROM present)
), conc AS (
  SELECT c.day, c.t, count(*) AS n_active
  FROM cand c JOIN spans s ON c.t BETWEEN s.smin AND s.smax
  GROUP BY 1, 2
), pk AS (
  SELECT day, max(n_active) AS peak FROM conc GROUP BY day
)
SELECT p.day, coalesce(pk.peak, 0)::BIGINT AS peak_concurrency
FROM present p LEFT JOIN pk USING (day)
"""


def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user registers per day
    (sketches.hll_sketch, p=8): the 100 TB path beside an exact
    count(DISTINCT user_id) — state is 256 small ints per day, merge
    is groupBy MAX, so per-shard partials combine without re-reading
    raw events. The sketch itself is INTEGER-deterministic (md5-60
    hash, bit math via length(bin(x))), so the approximate operator
    still passes the exact value-hash gate; the float estimate stays
    driver-side (tests/test_sketches.py gates accuracy)."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.sketches import hll_sketch

    days = ev.filter(F.col("ts").isNotNull()).withColumn(
        "day",
        F.expr("unix_micros(try_cast(ts AS timestamp)) div 86400000000"),
    )
    return hll_sketch(days, "user_id", by=("day",), p=8)


_SQL_DISTINCT_SKETCH = r"""
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         ('0x' || substr(md5('s0|' || user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), r AS (
  SELECT day, (h % 256)::INT AS register,
         CASE WHEN h // 256 = 0 THEN 53
              ELSE 53 - length(bin(h // 256)) END AS rank
  FROM e
)
SELECT day, register, max(rank)::INT AS max_rank
FROM r GROUP BY 1, 2
"""


def q_freq_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency counters over the user-id stream
    (sketches.cms_sketch, depth 4 × width 64 — deliberately narrower
    than the 150-user domain so collisions are exercised): the scale
    path beside the exact heavy_hitters. Merge is per-cell SUM;
    lookups (min over depth rows) overestimate only. Counters are
    integer-exact, so the approximate structure passes the exact
    oracle gate."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.sketches import cms_sketch

    return cms_sketch(ev, "user_id", depth=4, width=64)


_SQL_FREQ_SKETCH = r"""
WITH v AS (
  SELECT user_id::VARCHAR AS s FROM events WHERE user_id IS NOT NULL
), c AS (
  SELECT i::INT AS depth_idx,
         (('0x' || substr(md5('s' || i::VARCHAR || '|' || s), 1, 15))::BIGINT
          % 64)::INT AS col_idx
  FROM v, unnest([0, 1, 2, 3]) AS t(i)
)
SELECT depth_idx, col_idx, count(*)::BIGINT AS cnt
FROM c GROUP BY 1, 2
"""


def q_latency_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram percentiles of the value column per event type
    (sketches.hdr_quantiles, k=5 → ≤ ~3.1% relative bucket width):
    the mergeable-state twin of the exact latency_percentiles
    selection. One (event_type, bucket)-keyed shuffle with map-side
    combine; rank selection runs over the tiny bucket frame. Bucket
    bounds are pure integer bit math (length(bin(x)), power-of-two
    shifts), identical in both engines."""
    _utc(spark)
    ev = _load(spark, sf_dir, "events")
    from beats_spark.operators.sketches import hdr_quantiles

    return hdr_quantiles(ev, "value", by=("event_type",), qs=(50, 90, 99), k=5)


_SQL_LATENCY_HDR = r"""
WITH x AS (
  SELECT event_type, floor(value * 1000000)::BIGINT AS xx
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND isfinite(value)
), p AS (
  SELECT event_type, xx,
         CAST(power(2, greatest(length(bin(xx)) - 1 - 5, 0)) AS BIGINT) AS p2
  FROM x WHERE xx >= 0
), h AS (
  SELECT event_type,
         CASE WHEN xx = 0 THEN 0 ELSE (xx // p2) * p2 END AS bucket_lo,
         count(*) AS c
  FROM p GROUP BY 1, 2
), r AS (
  SELECT event_type, bucket_lo,
         sum(c) OVER (PARTITION BY event_type ORDER BY bucket_lo) AS cum,
         coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY bucket_lo
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cumprev,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM h
), qq AS (SELECT unnest([50, 90, 99]) AS q)
SELECT r.event_type, qq.q::INT AS q, r.bucket_lo
FROM r, qq
WHERE r.cumprev < (r.n - 1) * qq.q // 100 + 1
  AND (r.n - 1) * qq.q // 100 + 1 <= r.cum
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered newest-/least-blessed-first: if the driver's correctness
    # gate caps how many queries it runs, the entries with no prior
    # CORRECTNESS_r* row execute before the 50 already blessed in r03.
    return {
        # Ordered for the capped driver gate: entries never blessed in
        # CORRECTNESS_r03/r04 come FIRST (the r5 rotation), then the rest.
        "winlog_parse": q_winlog_parse,
        "incremental_neardup": q_incremental_neardup,
        "conversation_filter": q_conversation_filter,
        "render_chat": q_render_chat,
        "truncate_context": q_truncate_context,
        "anonymize_speakers": q_anonymize_speakers,
        "fetch_schedule": q_fetch_schedule,
        "perplexity_buckets": q_perplexity_buckets,
        "domain_stats": q_domain_stats,
        "conversation_stats": q_conversation_stats,
        "url_filter": q_url_filter,
        "temperature_weights": q_temperature_weights,
        "html_links": q_html_links,
        "crawl_frontier": q_crawl_frontier,
        "robots_filter": q_robots_filter,
        "include_message": q_include_message,
        "convert_ip": q_convert_ip,
        "kafka_partition": q_kafka_partition,
        "pack_manifest": q_pack_manifest,
        "paragraph_dedup": q_paragraph_dedup,
        "extract_html_text": q_extract_html_text,
        "html_corpus": q_html_corpus,
        "redact_pii": q_redact_pii,
        "repetition_stats": q_repetition_stats,
        "media_neardup": q_media_neardup,
        "url_canonical": q_url_canonical,
        "line_dedup": q_line_dedup,
        "decontaminate": q_decontaminate,
        "unicode_nfc": q_unicode_nfc,
        "quality_filter": q_quality_filter,
        "filter_report": q_filter_report,
        "mixture_sample": q_mixture_sample,
        "vocab_topk": q_vocab_topk,
        "unigram_surprisal": q_unigram_surprisal,
        "dsir_weights": q_dsir_weights,
        "bigram_surprisal": q_bigram_surprisal,
        "domain_divergence": q_domain_divergence,
        "corpus_build": q_corpus_build,
        "transcript_corpus": q_transcript_corpus,
        "ivf_assign": q_ivf_assign,
        # r5 additions sit here: oracle-checked and never driver-blessed,
        # they outrank the two rows-only ANN entries below for the capped
        # gate's last slots (those already carry in-suite recall gates and
        # the driver could only rows-check them anyway)
        "mqtt_route": q_mqtt_route,
        "model_ranking": q_model_ranking,
        "embed_quantize": q_embed_quantize,
        "knn_sq8": q_knn_sq8,
        "preference_stats": q_preference_stats,
        "tool_loops": q_tool_loops,
        "schema_drift": q_schema_drift,
        "refusal_stats": q_refusal_stats,
        "diversity_stats": q_diversity_stats,
        "contamination_matrix": q_contamination_matrix,
        # --- the 50 entries above are exactly the ORACLE-CHECKED
        # never-driver-blessed set, so a 50-query capped gate blesses
        # all of them with full hash evidence in r05. The three
        # rows-only never-blessed entries below are deliberately
        # displaced past the window: the driver could only rows-check
        # them, and each already carries a STRONGER in-suite gate (the
        # token-for-token pure-Python BPE twin + Hypothesis round-trip
        # for the two BPE-priced queries, the recall@5 ≥ 0.9 gate for
        # knn_pq) plus a rows-only line in BENCH/PARITY_r05_sf0.01.json.
        "pack_sequences_bpe": q_pack_sequences_bpe,
        "transcript_corpus_bpe": q_transcript_corpus_bpe,
        "knn_pq": q_knn_pq,
        # post-window r5 additions: oracle-checked, covered by the
        # in-suite sf0.001 parity and scripts/parity.py artifacts;
        # deliberately OUTSIDE the 50-slot gate so the never-blessed
        # window above stays exactly the r3/r4 backlog
        "skew_agg": q_skew_agg,
        "corpus_diff": q_corpus_diff,
        "rater_agreement": q_rater_agreement,
        "cluster_split": q_cluster_split,
        "bloom_seen": q_bloom_seen,
        "shard_plan": q_shard_plan,
        "anchor_stats": q_anchor_stats,
        "length_filter": q_length_filter,
        "crawl_budget": q_crawl_budget,
        "quality_keeper": q_quality_keeper,
        "kmeans_refine": q_kmeans_refine,
        "kmv_sketch": q_kmv_sketch,
        "corpus_release": q_corpus_release,
        "overlap_matrix": q_overlap_matrix,
        "recrawl_priority": q_recrawl_priority,
        "hard_negatives": q_hard_negatives,
        "containment_pairs": q_containment,
        "winnow_pairs": q_winnow_pairs,
        "thread_paths": q_thread_paths,
        "event_transitions": q_event_transitions,
        "prefix_share": q_prefix_share,
        "readability": q_readability,
        "meta_robots": q_meta_robots,
        "budget_select": q_budget_select,
        "quality_drift": q_quality_drift,
        "winnow_decontaminate": q_winnow_decontaminate,
        "decayed_engagement": q_decayed_engagement,
        "stratified_quota": q_stratified_quota,
        "depth_survival": q_depth_survival,
        "doc_structure": q_doc_structure,
        "cdc_chunks": q_cdc_chunks,
        "model_auc": q_model_auc,
        "model_calibration": q_model_calibration,
        "hybrid_search": q_hybrid_search,
        "vocab_coverage": q_vocab_coverage,
        "burstiness": q_burstiness,
        "redirect_chains": q_redirect_chains,
        "signal_mi": q_signal_mi,
        "filter_cascade": q_filter_cascade,
        "ngram_novelty": q_ngram_novelty,
        "langid_confusion": q_langid_confusion,
        "context_overflow": q_context_overflow,
        "dedup_rate_curve": q_dedup_rate_curve,
        "collocations": q_collocations,
        "dup_rate_by_source": q_dup_rate_by_source,
        "roc_points": q_roc_points,
        "source_gini": q_source_gini,
        # --- everything below already has a green CORRECTNESS_r01-r04
        # row ---
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "rolling_fingerprint": q_rolling_fingerprint,
        "multimodal_meta": q_multimodal_meta,
        "media_features": q_media_features,
        "knn_ivf": q_knn_ivf,
        "domain_cube": q_domain_cube,
        "tool_pairs": q_tool_pairs,
        "phrase_search": q_phrase_search,
        "keyword_extract": q_keyword_extract,
        "zorder_stats": q_zorder_stats,
        "bm25_search": q_bm25_search,
        "scd2_versions": q_scd2_versions,
        "distinct_sketch": q_distinct_sketch,
        "freq_sketch": q_freq_sketch,
        "latency_hdr": q_latency_hdr,
        "disorder_stats": q_disorder_stats,
        "concurrency_peak": q_concurrency_peak,
        "asof_versions": q_asof_versions,
        "incident_windows": q_incident_windows,
        "time_rollup": q_time_rollup,
        "near_dup_turns": q_near_dup_turns,
        "latency_percentiles": q_latency_percentiles,
        "active_users": q_active_users,
        "heavy_hitters": q_heavy_hitters,
        "turn_latency": q_turn_latency,
        "event_funnel": q_event_funnel,
        "retention_cohorts": q_retention_cohorts,
        "clean_split": q_clean_split,
        "cluster_balance": q_cluster_balance,
        "decontaminate_fuzzy": q_decontaminate_fuzzy,
        "tokenizer_fertility": q_tokenizer_fertility,
        "rate_anomaly": q_rate_anomaly,
        "best_of_n": q_best_of_n,
        "code_stats": q_code_stats,
        "key_skew": q_key_skew,
        "mixture_epochs": q_mixture_epochs,
        "padding_stats": q_padding_stats,
        "script_stats": q_script_stats,
        "quality_classifier": q_quality_classifier,
        "preference_pairs": q_preference_pairs,
        "strip_repeated_lines": q_strip_repeated_lines,
        "fix_mojibake": q_fix_mojibake,
        "shuffle_shards": q_shuffle_shards,
        "warc_parse": q_warc_parse,
        "warc_corpus": q_warc_corpus,
        "boilerplate_turns": q_boilerplate_turns,
        "sft_corpus": q_sft_corpus,
        "chunk_documents": q_chunk_documents,
        "incremental_dedup": q_incremental_dedup,
        "host_pagerank": q_host_pagerank,
        "sitemap_discovery": q_sitemap_discovery,
        "crawl_loop": q_crawl_loop,
        "frontier_update": q_frontier_update,
        "parse_sitemap": q_parse_sitemap,
        "tool_stats": q_tool_stats,
        "pipeline_fanout": q_pipeline_fanout,
        "pipeline_rows": q_pipeline_rows,
        "rate_limit": q_rate_limit,
        "dissect_typed": q_dissect_typed,
        "dissect_map": q_dissect_map,
        "multiline_join": q_multiline_join,
        "multiline_distributed": q_multiline_distributed,
        "container_logs": q_container_logs,
        "auditd_parse": q_auditd_parse,
        "journald_parse": q_journald_parse,
        "router_first_match": q_router_first_match,
        "conditions": q_conditions,
        "decode_json": q_decode_json,
        "decode_xml": q_decode_xml,
        "grok_clf": q_grok_clf,
        "timestamp_layouts": q_timestamp_layouts,
        "convert_tagging": q_convert_tagging,
        "mutate_chain": q_mutate_chain,
        "fingerprint": q_fingerprint,
        "fmtstr_daily_sinks": q_fmtstr_daily_sinks,
        "syslog_parse": q_syslog_parse,
        "syslog_rfc5424": q_syslog_rfc5424,
        "network_conditions": q_network_conditions,
        "enrich_broadcast": q_enrich_broadcast,
        "lookup_chain": q_lookup_chain,
        "stable_ordering": q_stable_ordering,
        "sessionize": q_sessionize,
        "assemble_documents": q_assemble_documents,
        "decode_battery": q_decode_battery,
        "array_ops": q_array_ops,
        "domain_direction": q_domain_direction,
        "community_id_dirty": q_community_id_dirty,
        "script_js": q_script_js,
        "corpus_sample": q_corpus_sample,
        "pack_sequences": q_pack_sequences,
        "dedup_exact": q_dedup_exact,
        "dedup_cluster": q_dedup_cluster,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_jaccard_blocked": q_dedup_jaccard_blocked,
        "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_pipeline": q_dedup_pipeline,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_md5": q_dedup_simhash_md5,
        "semantic_dedup": q_semantic_dedup,
        "substring_dedup": q_substring_dedup,
        "embed_neardup": q_embed_neardup,
        "embed_neardup_lsh": q_embed_neardup_lsh,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_lsh": q_knn_lsh,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "domain_cube": _SQL_DOMAIN_CUBE,
        "tool_pairs": _SQL_TOOL_PAIRS,
        "phrase_search": _sql_phrase_search(),
        "keyword_extract": _SQL_KEYWORD_EXTRACT,
        "zorder_stats": _sql_zorder_stats(),
        "bm25_search": _SQL_BM25_SEARCH,
        "scd2_versions": _SQL_SCD2_VERSIONS,
        "distinct_sketch": _SQL_DISTINCT_SKETCH,
        "freq_sketch": _SQL_FREQ_SKETCH,
        "latency_hdr": _SQL_LATENCY_HDR,
        "disorder_stats": _SQL_DISORDER_STATS,
        "concurrency_peak": _SQL_CONCURRENCY_PEAK,
        "asof_versions": _SQL_ASOF_VERSIONS,
        "incident_windows": _SQL_INCIDENT_WINDOWS,
        "time_rollup": _SQL_TIME_ROLLUP,
        "near_dup_turns": _SQL_NEAR_DUP_TURNS,
        "latency_percentiles": _SQL_LATENCY_PERCENTILES,
        "active_users": _SQL_ACTIVE_USERS,
        "heavy_hitters": _SQL_HEAVY_HITTERS,
        "turn_latency": _SQL_TURN_LATENCY,
        "event_funnel": _SQL_EVENT_FUNNEL,
        "retention_cohorts": _SQL_RETENTION_COHORTS,
        "clean_split": _SQL_CLEAN_SPLIT,
        "cluster_balance": _sql_cluster_balance(),
        "decontaminate_fuzzy": _SQL_DECONTAMINATE_FUZZY,
        "tokenizer_fertility": _SQL_TOKENIZER_FERTILITY,
        "rate_anomaly": _SQL_RATE_ANOMALY,
        "best_of_n": _SQL_BEST_OF_N,
        "code_stats": _SQL_CODE_STATS,
        "key_skew": _SQL_KEY_SKEW,
        "mixture_epochs": _sql_mixture_epochs(),
        "padding_stats": _SQL_PADDING_STATS,
        "script_stats": _SQL_SCRIPT_STATS,
        "quality_classifier": _sql_quality_classifier(),
        "preference_pairs": _SQL_PREFERENCE_PAIRS,
        "strip_repeated_lines": _SQL_STRIP_REPEATED_LINES,
        "fix_mojibake": _sql_fix_mojibake(),
        "shuffle_shards": _SQL_SHUFFLE_SHARDS,
        "warc_parse": _SQL_WARC_PARSE,
        "warc_corpus": _sql_warc_corpus(),
        "boilerplate_turns": _SQL_BOILERPLATE_TURNS,
        "sft_corpus": _SQL_SFT_CORPUS,
        "chunk_documents": _SQL_CHUNK_DOCUMENTS,
        "winlog_parse": _SQL_WINLOG_PARSE,
        "mqtt_route": _sql_mqtt_route(),
        "model_ranking": _sql_model_ranking(),
        "embed_quantize": _SQL_EMBED_QUANTIZE,
        "knn_sq8": _SQL_KNN_SQ8,
        "preference_stats": _SQL_PREFERENCE_STATS,
        "tool_loops": _SQL_TOOL_LOOPS,
        "schema_drift": _sql_schema_drift(),
        "refusal_stats": _SQL_REFUSAL_STATS,
        "diversity_stats": _SQL_DIVERSITY_STATS,
        "contamination_matrix": _SQL_CONTAMINATION_MATRIX,
        "skew_agg": _SQL_SKEW_AGG,
        "corpus_diff": _sql_corpus_diff(),
        "rater_agreement": _sql_rater_agreement(),
        "cluster_split": _SQL_CLUSTER_SPLIT,
        "bloom_seen": _sql_bloom_seen(),
        "shard_plan": _SQL_SHARD_PLAN,
        "anchor_stats": _sql_anchor_stats(),
        "length_filter": _SQL_LENGTH_FILTER,
        "crawl_budget": _SQL_CRAWL_BUDGET,
        "quality_keeper": _SQL_QUALITY_KEEPER,
        "kmeans_refine": _sql_kmeans_refine(),
        "kmv_sketch": _SQL_KMV_SKETCH,
        "corpus_release": _SQL_CORPUS_RELEASE,
        "overlap_matrix": _SQL_OVERLAP_MATRIX,
        "recrawl_priority": _SQL_RECRAWL_PRIORITY,
        "hard_negatives": _SQL_HARD_NEGATIVES,
        "containment_pairs": _SQL_CONTAINMENT,
        "winnow_pairs": _sql_winnow_pairs(),
        "thread_paths": _SQL_THREAD_PATHS,
        "event_transitions": _SQL_EVENT_TRANSITIONS,
        "prefix_share": _SQL_PREFIX_SHARE,
        "readability": _SQL_READABILITY,
        "meta_robots": _sql_meta_robots(),
        "budget_select": _SQL_BUDGET_SELECT,
        "quality_drift": _sql_quality_drift(),
        "winnow_decontaminate": _sql_winnow_decontaminate(),
        "decayed_engagement": _SQL_DECAYED_ENGAGEMENT,
        "stratified_quota": _SQL_STRATIFIED_QUOTA,
        "depth_survival": _SQL_DEPTH_SURVIVAL,
        "doc_structure": _sql_doc_structure(),
        "cdc_chunks": _sql_cdc_chunks(),
        "model_auc": _SQL_MODEL_AUC,
        "model_calibration": _SQL_MODEL_CALIBRATION,
        "hybrid_search": _sql_hybrid_search(),
        "vocab_coverage": _SQL_VOCAB_COVERAGE,
        "burstiness": _SQL_BURSTINESS,
        "redirect_chains": _SQL_REDIRECT_CHAINS,
        "signal_mi": _sql_signal_mi(),
        "filter_cascade": _SQL_FILTER_CASCADE,
        "ngram_novelty": _SQL_NGRAM_NOVELTY,
        "langid_confusion": _sql_langid_confusion(),
        "context_overflow": _SQL_CONTEXT_OVERFLOW,
        "dedup_rate_curve": _sql_dedup_rate_curve(),
        "collocations": _SQL_COLLOCATIONS,
        "dup_rate_by_source": _SQL_DUP_RATE_BY_SOURCE,
        "roc_points": _SQL_ROC_POINTS,
        "source_gini": _SQL_SOURCE_GINI,
        "incremental_neardup": _SQL_INCREMENTAL_NEARDUP,
        "incremental_dedup": _SQL_INCREMENTAL_DEDUP,
        "host_pagerank": _SQL_HOST_PAGERANK,
        "sitemap_discovery": _SQL_SITEMAP_DISCOVERY,
        "crawl_loop": _SQL_CRAWL_LOOP,
        "frontier_update": _SQL_FRONTIER_UPDATE,
        "parse_sitemap": _SQL_PARSE_SITEMAP,
        "tool_stats": _SQL_TOOL_STATS,
        "conversation_filter": _SQL_CONVERSATION_FILTER,
        "render_chat": _SQL_RENDER_CHAT,
        "truncate_context": _SQL_TRUNCATE_CONTEXT,
        "anonymize_speakers": _SQL_ANONYMIZE_SPEAKERS,
        "fetch_schedule": _SQL_FETCH_SCHEDULE,
        "perplexity_buckets": _SQL_PERPLEXITY_BUCKETS,
        "domain_stats": _SQL_DOMAIN_STATS,
        "conversation_stats": _SQL_CONVERSATION_STATS,
        "url_filter": _SQL_URL_FILTER,
        "temperature_weights": _SQL_TEMPERATURE_WEIGHTS,
        "html_links": _SQL_HTML_LINKS,
        "crawl_frontier": _SQL_CRAWL_FRONTIER,
        "robots_filter": _SQL_ROBOTS_FILTER,
        "pipeline_fanout": _SQL_PIPELINE_FANOUT,
        "pipeline_rows": _SQL_PIPELINE_ROWS,
        "rate_limit": _SQL_RATE_LIMIT,
        "dissect_typed": _SQL_DISSECT_TYPED,
        "dissect_map": _SQL_DISSECT_MAP,
        "multiline_join": _SQL_MULTILINE_JOIN,
        "multiline_distributed": _SQL_MULTILINE_JOIN,
        "container_logs": _SQL_CONTAINER_LOGS,
        "auditd_parse": _SQL_AUDITD_PARSE,
        "journald_parse": _SQL_JOURNALD_PARSE,
        "router_first_match": _SQL_ROUTER_FIRST_MATCH,
        "conditions": _SQL_CONDITIONS,
        "decode_json": _SQL_DECODE_JSON,
        "decode_xml": _SQL_DECODE_XML,
        "grok_clf": _SQL_GROK_CLF,
        "timestamp_layouts": _SQL_TIMESTAMP_LAYOUTS,
        "convert_tagging": _SQL_CONVERT_TAGGING,
        "mutate_chain": _SQL_MUTATE_CHAIN,
        "fingerprint": _SQL_FINGERPRINT,
        "fmtstr_daily_sinks": _SQL_FMTSTR_DAILY_SINKS,
        "syslog_parse": _SQL_SYSLOG_PARSE,
        "syslog_rfc5424": _SQL_SYSLOG_RFC5424,
        "network_conditions": _SQL_NETWORK_CONDITIONS,
        "enrich_broadcast": _SQL_ENRICH_BROADCAST,
        "lookup_chain": _SQL_LOOKUP_CHAIN,
        "stable_ordering": _SQL_STABLE_ORDERING,
        "sessionize": _SQL_SESSIONIZE,
        "assemble_documents": _SQL_ASSEMBLE_DOCUMENTS,
        "decode_battery": _SQL_DECODE_BATTERY,
        "array_ops": _SQL_ARRAY_OPS,
        "domain_direction": _SQL_DOMAIN_DIRECTION,
        "community_id_dirty": _SQL_COMMUNITY_ID_DIRTY,
        "script_js": _SQL_SCRIPT_JS,
        "corpus_sample": _SQL_CORPUS_SAMPLE,
        "pack_sequences": _SQL_PACK_SEQUENCES,
        "dedup_exact": _SQL_DEDUP_EXACT,
        "dedup_cluster": _SQL_DEDUP_CLUSTER,
        "dedup_jaccard": _SQL_DEDUP_JACCARD,
        "dedup_jaccard_blocked": _SQL_DEDUP_JACCARD_BLOCKED,
        "dedup_jaccard_prefix": _SQL_DEDUP_JACCARD_PREFIX,
        "dedup_minhash_lsh": _SQL_DEDUP_MINHASH_LSH,
        "dedup_pipeline": _SQL_DEDUP_PIPELINE,
        "dedup_simhash_md5": _SQL_DEDUP_SIMHASH_MD5,
        "semantic_dedup": _sql_semantic_dedup(),
        "substring_dedup": _SQL_SUBSTRING_DEDUP,
        "embed_neardup": _SQL_EMBED_NEARDUP,
        "embed_neardup_lsh": _SQL_EMBED_NEARDUP_LSH,
        "knn_bruteforce": _SQL_KNN_BRUTEFORCE,
        "knn_lsh": _SQL_KNN_LSH,
        "ivf_assign": _sql_ivf_assign(),
        "media_features": _SQL_MEDIA_FEATURES,
        "text_stats": _SQL_TEXT_STATS,
        "redact_pii": _SQL_REDACT_PII,
        "lang_id": _SQL_LANG_ID,
        "quality_score": _SQL_QUALITY_SCORE,
        "repetition_stats": _SQL_REPETITION_STATS,
        "rolling_fingerprint": _SQL_ROLLING_FINGERPRINT,
        "multimodal_meta": _SQL_MULTIMODAL_META,
        "media_neardup": _SQL_MEDIA_NEARDUP,
        "url_canonical": _SQL_URL_CANONICAL,
        "line_dedup": _SQL_LINE_DEDUP,
        "decontaminate": _SQL_DECONTAMINATE,
        "unicode_nfc": _SQL_UNICODE_NFC,
        "include_message": _SQL_INCLUDE_MESSAGE,
        "convert_ip": _SQL_CONVERT_IP,
        "kafka_partition": _SQL_KAFKA_PARTITION,
        "pack_manifest": _SQL_PACK_MANIFEST,
        "paragraph_dedup": _SQL_PARAGRAPH_DEDUP,
        "extract_html_text": _sql_extract_html(),
        "html_corpus": _sql_html_corpus(),
        "quality_filter": _SQL_QUALITY_FILTER,
        "filter_report": f"""
WITH qf AS ({_SQL_QUALITY_FILTER})
SELECT d.lang, u.reason, count(*)::BIGINT AS n_docs
FROM qf JOIN documents d USING (doc_id),
     unnest(string_split(qf.reasons, ',')) AS u(reason)
WHERE qf.reasons <> ''
GROUP BY 1, 2
""",
        "mixture_sample": _SQL_MIXTURE_SAMPLE,
        "vocab_topk": _SQL_VOCAB_TOPK,
        "unigram_surprisal": _SQL_UNIGRAM_SURPRISAL,
        "dsir_weights": _SQL_DSIR_WEIGHTS,
        "bigram_surprisal": _SQL_BIGRAM_SURPRISAL,
        "domain_divergence": _SQL_DOMAIN_DIVERGENCE,
        "corpus_build": _SQL_CORPUS_BUILD,
        "transcript_corpus": _SQL_TRANSCRIPT_CORPUS,
        # no oracle BY DESIGN (documented in COVERAGE.md): dedup_simhash
        # (xxhash64 token hash is not portable to DuckDB — its md5 twin
        # dedup_simhash_md5 IS oracle-checked), knn_ivf and knn_pq
        # (trained float centroids/codebooks; each quality-gated by an
        # in-suite recall@k test vs knn_bruteforce).
    }

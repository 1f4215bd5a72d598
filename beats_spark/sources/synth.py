"""Deterministic transcript synthesizer — all-JVM, cluster-scalable.

Generates the BASELINE.json ``input_hint`` table::

    conv_id string, turn_idx int, role string, text string,
    tool string, ts timestamp

Every value is a pure function of ``(conv_seq, turn_idx, seed)``
computed with built-in column expressions (xxhash64 / pmod / element_at
/ format_string) — no Python in the data path, no driver-side loops, no
wall clock, no RNG state. The same call yields byte-identical tables at
any parallelism and would generate 10^12 turns on a cluster by just
raising ``n_convs`` (spark.range parallelizes the id space).

Shapes mirror FIXTURES.md F1:
- conversation lengths are skewed (a hot conversation every
  ``hot_every`` gets ``hot_factor``× the turns) so hot-key handling is
  exercised by construction;
- ``text`` follows the dissect-able grammar
  ``level=%{level} ts=%{event_ts} caller=%{caller} msg="%{message}"``;
- ~2% of rows are malformed (missing ``caller=`` section) to exercise
  the tag-and-continue path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_LEVELS = ["info", "info", "info", "warn", "error", "debug"]  # weighted
_MODULES = ["pipeline", "router", "parser", "enrich", "sink", "queue"]
_WORDS = [
    "batch", "flush", "retry", "ack", "publish", "drop", "deploy",
    "connect", "timeout", "checkpoint", "resume", "rotate", "select",
]
_TOOLS = ["search", "browser", "python", "bash", "editor"]


def _pick(options: list[str], h) :
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(h, F.lit(len(options))) + 1).cast("int"))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    base_turns: int = 8,
    hot_every: int = 97,
    hot_factor: int = 25,
    malformed_every: int = 50,
) -> DataFrame:
    """Deterministic multi-turn transcripts; ≈ n_convs * (base_turns/2
    + skew) rows."""
    conv = spark.range(n_convs).withColumnRenamed("id", "conv_seq")
    h0 = F.xxhash64(F.col("conv_seq"), F.lit(seed))
    n_turns = (F.pmod(h0, F.lit(base_turns)) + 1).cast("int")
    n_turns = F.when(
        F.pmod(F.col("conv_seq"), F.lit(hot_every)) == 0, n_turns * hot_factor
    ).otherwise(n_turns)

    df = conv.withColumn("turn_idx", F.explode(F.sequence(F.lit(0), n_turns - 1)))
    ht = F.xxhash64(F.col("conv_seq"), F.col("turn_idx"), F.lit(seed))

    role_bucket = F.pmod(ht, F.lit(100))
    role = (
        F.when(role_bucket < 35, "user")
        .when(role_bucket < 70, "assistant")
        .when(role_bucket < 90, "tool")
        .otherwise("system")
    )
    tool = F.when(role == "tool", _pick(_TOOLS, F.xxhash64(ht, F.lit(1)))).otherwise(
        F.lit("none")
    )

    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.col("conv_seq") * 3600
        + F.col("turn_idx") * 7
    )
    level = _pick(_LEVELS, F.xxhash64(ht, F.lit(2)))
    caller = F.format_string(
        "%s.go:%d",
        _pick(_MODULES, F.xxhash64(ht, F.lit(3))),
        F.pmod(F.xxhash64(ht, F.lit(4)), F.lit(400)) + 10,
    )
    message = F.format_string(
        "%s %s %s",
        _pick(_WORDS, F.xxhash64(ht, F.lit(5))),
        _pick(_WORDS, F.xxhash64(ht, F.lit(6))),
        _pick(_WORDS, F.xxhash64(ht, F.lit(7))),
    )
    event_ts = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

    ok_text = F.format_string(
        'level=%s ts=%s caller=%s msg="%s"', level, event_ts, caller, message
    )
    bad_text = F.format_string('level=%s ts=%s msg="%s"', level, event_ts, message)
    text = F.when(
        F.pmod(F.xxhash64(ht, F.lit(8)), F.lit(malformed_every)) == 0, bad_text
    ).otherwise(ok_text)

    return df.select(
        F.format_string("conv-%08d", F.col("conv_seq")).alias("conv_id"),
        F.col("turn_idx").cast("int"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def tool_categories(spark: SparkSession) -> DataFrame:
    """FIXTURES.md F2 lookup dim."""
    rows = [
        ("search", "retrieval"),
        ("browser", "retrieval"),
        ("python", "compute"),
        ("bash", "compute"),
        ("editor", "authoring"),
        ("none", "na"),
    ]
    return spark.createDataFrame(rows, "key string, value string")


def role_channels(spark: SparkSession) -> DataFrame:
    rows = [
        ("user", "inbound"),
        ("assistant", "outbound"),
        ("tool", "internal"),
        ("system", "control"),
    ]
    return spark.createDataFrame(rows, "key string, value string")

"""Container log input: Docker json-file and CRI formats.

The reference's container input wraps the line reader in a
DockerJSONReader (libbeat/reader/readjson/docker_json.go) that

- parses each line as Docker json-file JSON (``{"log":..,"stream":..,
  "time":..}``), CRI (``TS STREAM [FLAGS] CONTENT``), or auto-detects
  by first byte (docker_json.go:212-218);
- drops unparseable lines (docker_json.go:236-239 — parse error →
  log + continue);
- reassembles partial lines: Docker marks a fragment by a missing
  trailing ``\\n`` (docker_json.go:208), CRI by the ``P`` tag
  (docker_json.go:152-162); consecutive partials join until the next
  full line (docker_json.go:241-286), capped at ``max_bytes`` with a
  ``truncated`` flag (docker_json.go:263-282);
- filters by stream AFTER reassembly (docker_json.go:288-290).

This module re-expresses that as one declarative plan over the
``(file, line_no, line)`` frame produced by ``sources.lines``:
per-line parsing is pure JVM expressions (``from_json`` + ``split``),
partial-join is the same Window + running-sum segmentation the
multiline reader uses, and assembly is one ``groupBy(file, _grp)``.

Scale shape: one shuffle keyed on ``file`` for the segmentation
window (same key the line reader already produced, so AQE coalesces),
then a ``groupBy`` that reuses it. No Python runs per row. For single
huge container logs use the chunked line reader; the parse stage is
split-parallel either way.

Reference parity: the golden corpus of docker_json_test.go:35-374 is
transliterated in tests/test_container.py (every behavioral case; the
byte-counter assertions have no table equivalent). Known deltas,
documented here on purpose: timestamps truncate to Spark's
microsecond precision (Go keeps nanos), and a Docker line whose
``log`` field is valid JSON but not a string (e.g. ``{"log":123}``)
reads as an empty fragment instead of a parse error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# RFC3339 shape gate: try_cast alone also accepts space-separated /
# offset-less forms that Go's time.Parse(time.RFC3339) rejects.
_RFC3339 = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$"

_DOCKER_SCHEMA = "log string, stream string, time string, attrs map<string,string>"


def _rfc3339_ts(col: Column) -> Column:
    """RFC3339(+nano) string → timestamp (micros), NULL when the shape
    or the value is invalid — the tag-and-continue form of the
    reference's time.Parse error (docker_json.go:141-144, :189-192)."""
    return F.when(col.rlike(_RFC3339), col.try_cast("timestamp"))


def parse_container_logs(
    df: DataFrame,
    format: str = "auto",
    stream: str = "all",
    partial: bool = True,
    cri_flags: bool = True,
    max_bytes: int = 0,
    file_col: str = "file",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Parse a ``(file, line_no, line)`` frame of container logs.

    Returns ``(file, line_no, message, stream, ts, attrs, n_lines,
    flags)`` — one row per assembled log message: ``line_no``/``ts``/
    ``stream``/``attrs`` come from the message's FIRST line (the
    reference sets Ts and the stream field from the first fragment,
    docker_json.go:145,166; continuation metadata is discarded),
    ``flags`` carries ``truncated`` when ``max_bytes`` cut the
    reassembly.

    ``format``: ``docker``/``json-file``, ``cri``, or ``auto`` (first
    byte ``{`` → docker, else CRI — docker_json.go:212-218).
    ``stream``: ``all``/``stdout``/``stderr``; the filter reads the
    LAST fragment's stream, as the reference's loop does
    (docker_json.go:288).
    """
    fmt = format.lower()
    if fmt not in ("auto", "docker", "json-file", "cri"):
        raise ValueError(f"unknown container log format: {format}")
    if stream not in ("all", "stdout", "stderr"):
        raise ValueError(f"invalid container stream: {stream}")

    val = F.col(line_col)

    # --- Docker json-file branch (docker_json.go:181-210) ---
    dj = F.from_json(val, _DOCKER_SCHEMA)
    docker_ts = _rfc3339_ts(dj["time"])
    # json_object_keys is NULL for malformed JSON and for non-object
    # JSON — exactly the inputs Go's Decode-into-struct rejects.
    docker_valid = F.json_object_keys(val).isNotNull() & docker_ts.isNotNull()
    docker_log = F.coalesce(dj["log"], F.lit(""))
    docker_partial = (F.length(docker_log) == 0) | ~docker_log.endswith("\n")

    # --- CRI branch (docker_json.go:126-176) ---
    n_fields = 4 if cri_flags else 3
    parts = F.split(val, " ", n_fields)
    cri_ts = _rfc3339_ts(parts[0])
    cri_valid = (F.size(parts) == n_fields) & cri_ts.isNotNull()
    cri_partial = (
        F.array_contains(F.split(parts[2], ":"), "P") if cri_flags else F.lit(False)
    )
    cri_content_raw = parts[n_fields - 1]
    # partial CRI fragments drop one trailing newline (docker_json.go:171)
    cri_content = F.when(
        cri_partial, F.regexp_replace(cri_content_raw, r"\n$", "")
    ).otherwise(cri_content_raw)

    if fmt in ("docker", "json-file"):
        use_docker = F.lit(True)
    elif fmt == "cri":
        use_docker = F.lit(False)
    else:  # auto: decided by the first byte, no cross-format fallback
        use_docker = val.startswith("{")

    parsed = df.select(
        F.col(file_col).alias("file"),
        F.col(line_no_col).alias("line_no"),
        F.when(use_docker, docker_valid).otherwise(cri_valid).alias("_ok"),
        F.when(use_docker, docker_log).otherwise(cri_content).alias("_content"),
        F.when(use_docker, dj["stream"]).otherwise(parts[1]).alias("stream"),
        F.when(use_docker, docker_ts).otherwise(cri_ts).alias("ts"),
        F.when(use_docker, dj["attrs"]).alias("attrs"),
        F.when(use_docker, docker_partial).otherwise(cri_partial).alias("_partial"),
    )
    # unparseable lines are skipped, reference-exact (docker_json.go:236-239)
    parsed = parsed.filter(F.col("_ok")).drop("_ok")

    if not partial:
        out = parsed.select(
            "file",
            "line_no",
            F.col("_content").alias("message"),
            "stream",
            "ts",
            "attrs",
            F.lit(1).cast("long").alias("n_lines"),
            F.col("stream").alias("_last_stream"),
        )
    else:
        # A message starts where the PREVIOUS kept line was not a
        # fragment. Two window passes over one shuffle (window
        # functions cannot nest): materialize the boundary flag, then
        # run the running sum over the same window.
        w = Window.partitionBy("file").orderBy("line_no")
        flagged = parsed.withColumn(
            "_new", (~F.coalesce(F.lag("_partial", 1).over(w), F.lit(False))).cast("int")
        ).withColumn("_grp", F.sum("_new").over(w))
        frags = F.array_sort(
            F.collect_list(F.struct(F.col("line_no").alias("n"), F.col("_content").alias("c")))
        )
        out = flagged.groupBy("file", "_grp").agg(
            F.min("line_no").alias("line_no"),
            F.array_join(F.transform(frags, lambda s: s.getField("c")), "").alias(
                "message"
            ),
            F.min_by("stream", F.col("line_no")).alias("stream"),
            F.min_by("ts", F.col("line_no")).alias("ts"),
            F.min_by("attrs", F.col("line_no")).alias("attrs"),
            F.count(F.lit(1)).alias("n_lines"),
            F.max_by("stream", F.col("line_no")).alias("_last_stream"),
        )

    if stream != "all":
        out = out.filter(F.col("_last_stream") == stream)
    out = out.drop("_grp", "_last_stream")

    if max_bytes and max_bytes > 0:
        # byte-accurate cap, like the reference's reassembly limit
        # (docker_json.go:266-282): slice the UTF-8 bytes, tag the row.
        blob = F.col("message").cast("binary")
        truncated = F.octet_length(F.col("message")) > max_bytes
        # flags must read the PRE-truncation message: compute it first.
        out = out.withColumn(
            "flags",
            F.when(truncated, F.array(F.lit("truncated"))).otherwise(
                F.array().cast("array<string>")
            ),
        ).withColumn(
            "message",
            F.when(
                truncated, F.substring(blob, 1, max_bytes).cast("string")
            ).otherwise(F.col("message")),
        )
    else:
        out = out.withColumn("flags", F.array().cast("array<string>"))

    return out.select(
        "file", "line_no", "message", "stream", "ts", "attrs", "n_lines", "flags"
    )


def read_container_logs(
    spark,
    path: str,
    format: str = "auto",
    stream: str = "all",
    max_bytes: int = 0,
    chunked: bool = False,
) -> DataFrame:
    """File input convenience: lines → container parse, the shape of
    the reference's container input (``NewContainerParser``,
    docker_json.go:95-121 — partial join and CRI flags always on)."""
    from beats_spark.sources.lines import read_lines

    lines = read_lines(spark, path, chunked=chunked)
    return parse_container_logs(
        lines,
        format=format,
        stream=stream,
        partial=True,
        cri_flags=True,
        max_bytes=max_bytes,
        line_col="line",
    )

"""Ordered raw-line file input + multiline join.

The reference's bread and butter is tailing log files line by line
(libbeat/reader/ parser chain) and joining multiline events — Java
stack traces, continuation lines, count-framed records
(libbeat/reader/multiline/multiline.go). This module is the batch
equivalent on Spark:

- ``read_lines``: one task per FILE (``wholetext`` scan → split →
  ``posexplode``), yielding ``(file, line_no, line)`` with a dense
  0-based per-file line number. This mirrors the reference's
  unit of concurrency exactly — one harvester per file
  (filebeat/input/filestream) — so parallelism scales with the file
  count, the normal shape of a log directory. A single multi-GB file
  is one task (and capped by the JVM's 2 GB string limit); at that
  size the right input is the table-snapshot path (sources.read_table),
  not a text file.
- ``multiline_join``: the three reference modes (pattern / count /
  while_pattern, multiline_config.go:30-60) as one Window +
  running-sum grouping per file. Semantics match multiline.go:

  * pattern + match=after: a line matching ``pattern`` (XOR
    ``negate``) CONTINUES the previous event (pattern.go
    afterMatcher: the predicate reads the CURRENT line).
  * pattern + match=before: a line joins the NEXT line's event when
    it matches (beforeMatcher: the predicate reads the PREVIOUS
    line) — e.g. trailing-backslash continuation.
  * flush_pattern: a line matching it is appended and the event
    force-flushed (boundary after it) — the EventStart/EventEnd
    framing of multiline_test.go:110-156.
  * count: every ``count_lines`` lines form one event (counter.go).
  * while_pattern: maximal runs of matching lines collapse into one
    event; every non-matching line is its own event (while.go).
  * max_lines: the event keeps the first ``max_lines`` lines and is
    marked ``truncated`` (message_buffer.go caps identically); the
    extra lines are consumed, not re-emitted.

Scale shape: the only shuffle is the per-file Window (hash by file);
the running sum and the groupBy reuse that partitioning, so a
directory of N files costs one shuffle keyed on N uniform keys.
Timeout-based flushing is a wall-clock concept of the tailing reader
and has no meaning on a complete snapshot — a batch read IS the
flushed state.

Streaming: structured streaming delivers files whole per micro-batch,
so the same join applies inside ``foreachBatch`` (files never split
across batches); see streaming.pipeline for the harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, line) per physical line, ordered within file.

    ``wholetext`` keeps one file per row so line numbers are exact;
    one trailing newline is stripped first (a final ``\\n`` terminates
    the last line, it does not open an empty one — the reference's
    line reader emits a line per terminator). ``\\r`` of CRLF line
    endings is removed per line.
    """
    raw = spark.read.text(path, wholetext=True)
    return lines_from_wholetext(raw)


def lines_from_wholetext(raw: DataFrame) -> DataFrame:
    """wholetext frame (``value`` = entire file body) → ordered
    (file, line_no, line). Shared by the batch and streaming readers."""
    raw = raw.select(F.input_file_name().alias("file"), F.col("value"))
    body = F.regexp_replace(F.col("value"), r"\n$", "")
    lines = raw.select(
        "file",
        F.posexplode(F.split(body, r"\n")).alias("line_no", "line"),
    )
    return lines.withColumn("line", F.regexp_replace(F.col("line"), r"\r$", ""))


def multiline_join(
    df: DataFrame,
    mode: str = "pattern",
    pattern: str | None = None,
    negate: bool = False,
    match: str = "after",
    flush_pattern: str | None = None,
    count_lines: int | None = None,
    max_lines: int | None = None,
    skip_newline: bool = False,
    file_col: str = "file",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Join physical lines into logical events.

    Returns (``file``, ``line_no`` = first line's number, ``message``,
    ``n_lines``, ``truncated``). See module docstring for the per-mode
    semantics and their reference citations.
    """
    w = Window.partitionBy(file_col).orderBy(line_no_col)
    line = F.col(line_col)

    if mode == "pattern":
        if not pattern:
            raise ValueError("multiline.pattern cannot be empty in pattern mode")
        if match not in ("after", "before"):
            raise ValueError(f"unknown matcher type: {match}")
        m = line.rlike(pattern)
        if negate:
            m = ~m
        if match == "after":
            cont = m
        else:  # before: the PREVIOUS line's predicate binds this line
            cont = F.lag(m, 1, False).over(w)
        new_event = ~F.coalesce(cont, F.lit(False))
        if flush_pattern:
            flushed_prev = F.lag(line.rlike(flush_pattern), 1, False).over(w)
            new_event = new_event | F.coalesce(flushed_prev, F.lit(False))
    elif mode == "count":
        if not count_lines:
            raise ValueError("multiline.count_lines cannot be empty in count mode")
        rn = F.row_number().over(w)
        new_event = ((rn - 1) % count_lines) == 0
    elif mode == "while_pattern":
        if not pattern:
            raise ValueError("multiline.pattern cannot be empty in while_pattern mode")
        m = line.rlike(pattern)
        prev_m = F.lag(m, 1, False).over(w)
        new_event = (~m) | (m & ~F.coalesce(prev_m, F.lit(False)))
    else:
        raise ValueError(f"unknown multiline mode: {mode}")

    # two window passes over ONE shuffle (same partitioning): window
    # functions cannot nest, so the boundary flag materializes first
    # and the running sum reads it.
    grouped = df.withColumn("_new", new_event.cast("int")).withColumn(
        "_grp", F.sum("_new").over(w)
    )

    sep = "" if skip_newline else "\n"
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(line_no_col).alias("n"), line.alias("l")))
    )
    kept = F.slice(parts, 1, max_lines) if max_lines else parts
    out = grouped.groupBy(file_col, "_grp").agg(
        F.min(line_no_col).alias(line_no_col),
        F.array_join(
            F.transform(kept, lambda s: s.getField("l")), sep
        ).alias("message"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    truncated = (
        (F.col("n_lines") > max_lines) if max_lines else F.lit(False)
    )
    return out.select(
        file_col, line_no_col, "message", "n_lines", truncated.alias("truncated")
    )


def read_multiline(
    spark: SparkSession,
    path: str,
    multiline: dict | None = None,
    include_lines: list[str] | None = None,
    exclude_lines: list[str] | None = None,
) -> DataFrame:
    """File input end-to-end: lines → (optional) multiline join →
    include/exclude filters. The entry point a Beats ``filestream`` +
    ``parsers: [multiline]`` YAML maps onto (run.py --source-format
    text).

    ``include_lines``/``exclude_lines`` follow the reference's
    documented order: each multiline message is combined FIRST, then
    include_lines keeps matching events, then exclude_lines drops
    matching ones (filebeat filestream options)."""
    lines = read_lines(spark, path)
    if not multiline:
        out = lines.withColumnRenamed("line", "message").withColumn(
            "n_lines", F.lit(1).cast("long")
        ).withColumn("truncated", F.lit(False))
    else:
        cfg = dict(multiline)
        cfg.setdefault("mode", cfg.pop("type", "pattern"))
        out = multiline_join(lines, **cfg)
    msg = F.col("message")
    if include_lines:
        keep = msg.rlike(include_lines[0])
        for p in include_lines[1:]:
            keep = keep | msg.rlike(p)
        out = out.filter(keep)
    if exclude_lines:
        drop = msg.rlike(exclude_lines[0])
        for p in exclude_lines[1:]:
            drop = drop | msg.rlike(p)
        out = out.filter(~drop)
    return out

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
  count, the normal shape of a log directory. Files beyond the JVM's
  2 GB string limit are rejected up front with a redirect.
- ``read_lines_chunked``: the same (file, line_no, line) contract with
  big files SPLIT across tasks at line boundaries (Hadoop text splits
  + per-block line-offset reconstruction, no full-data shuffle) — the
  constant-memory path for single huge files; table snapshots
  (sources.read_table) remain the right input when the data already
  lives in a table.
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

- ``multiline_join_distributed``: the same semantics with every stage
  parallel in line-number chunks — the scale path for single huge
  files (see its docstring for the decomposition).

Scale shape: in the windowed join the only shuffle is the per-file
Window (hash by file); the running sum and the groupBy reuse that
partitioning, so a directory of N files costs one shuffle keyed on N
uniform keys. The distributed join trades one extra shuffle for
reducer parallelism proportional to line count, not file count.
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


_WHOLETEXT_CEILING = 1_800_000_000  # < JVM 2 GB string limit, with margin


def read_lines(
    spark: SparkSession,
    path: str,
    chunked: bool = False,
    exclude_files: list[str] | None = None,
    ignore_older: float | None = None,
) -> DataFrame:
    """(file, line_no, line) per physical line, ordered within file.

    ``exclude_files`` (regex list on the file path) and
    ``ignore_older`` (seconds; skip files whose modification time is
    older than now-ignore_older) mirror the filestream prospector
    options (filebeat/input/filestream/config.go:83, fswatch pattern
    filtering). Both are metadata-only filters: they prune at the
    ``_metadata`` level before any bytes of the excluded files are
    read (partition pruning on file listing, the same effect as the
    reference never opening a harvester).

    Default path: ``wholetext`` keeps one file per row so line numbers
    are exact; one trailing newline is stripped first (a final ``\\n``
    terminates the last line, it does not open an empty one — the
    reference's line reader emits a line per terminator). ``\\r`` of
    CRLF line endings is removed per line. One task per file — the
    harvester-per-file concurrency shape.

    ``chunked=True`` switches to :func:`read_lines_chunked`, which
    splits big files across tasks (constant memory per task, like the
    reference's byte-offset tailing, filebeat/input/filestream/
    input.go:416-481). Files larger than the JVM string ceiling are
    detected up front and rejected with that redirect instead of
    failing mid-scan.
    """
    if chunked:
        out = read_lines_chunked(spark, path)
        return _filter_files(out, "file", exclude_files, ignore_older, spark, path)
    _guard_wholetext_size(spark, path)
    raw = spark.read.text(path, wholetext=True)
    raw = _prune_files(raw, exclude_files, ignore_older)
    return lines_from_wholetext(raw)


def _prune_files(
    raw: DataFrame,
    exclude_files: list[str] | None,
    ignore_older: float | None,
) -> DataFrame:
    """Metadata-level file pruning on a file-source frame (uses the
    hidden ``_metadata`` struct, so excluded files are dropped at the
    listing, before their bytes are scanned)."""
    if not exclude_files and not ignore_older:
        return raw
    keep = F.lit(True)
    if exclude_files:
        for pat in exclude_files:
            keep = keep & ~F.col("_metadata.file_path").rlike(pat)
    if ignore_older:
        keep = keep & (
            F.col("_metadata.file_modification_time")
            >= F.expr(f"current_timestamp() - INTERVAL {int(ignore_older)} SECOND")
        )
    return raw.where(keep)


def _filter_files(df, file_col, exclude_files, ignore_older, spark, path):
    """Post-hoc variant for the chunked reader (its line-number
    reconstruction already consumed ``_metadata``): path regex drops
    rows; mtime pruning re-lists the files (a driver-side metadata
    call) and drops by path membership."""
    if exclude_files:
        for pat in exclude_files:
            df = df.filter(~F.col(file_col).rlike(pat))
    if ignore_older:
        import time as _time

        cutoff_ms = ( _time.time() - float(ignore_older)) * 1000.0
        try:
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            stale = []
            stack = list(fs.globStatus(hpath) or [])
            while stack:
                st = stack.pop()
                if st.isDirectory():
                    stack.extend(fs.listStatus(st.getPath()))
                elif st.getModificationTime() < cutoff_ms:
                    stale.append(str(st.getPath()))
            if stale:
                # normalize scheme slashes: input_file_name() yields
                # file:///p while Hadoop Path prints file:/p
                norm = F.concat(
                    F.lit("/"), F.regexp_replace(F.col(file_col), "^file:/+", "")
                )
                stale_norm = [
                    "/" + s.split(":", 1)[1].lstrip("/") if ":" in s else s
                    for s in stale
                ]
                df = df.filter(~norm.isin(stale_norm))
        except Exception as exc:  # noqa: BLE001 — JVM listing failures
            # The prospector treats ignore_older as advisory, but
            # silently disabling it would let stale files into the
            # corpus with no trace — warn loudly and tag the reason so
            # the behavior delta is visible in logs (ADVICE r3).
            import warnings

            warnings.warn(
                f"ignore_older: file listing failed ({exc!r}); mtime "
                "pruning DISABLED for this read — stale files will be "
                "processed",
                RuntimeWarning,
                stacklevel=2,
            )
    return df


def _guard_wholetext_size(spark: SparkSession, path: str) -> None:
    """Fail fast (with the chunked redirect) if any input file would
    exceed the JVM 2 GB string limit of the wholetext reader."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        matches = fs.globStatus(hpath) or []
        stack = list(matches)
        while stack:
            st = stack.pop()
            if st.isDirectory():
                stack.extend(fs.listStatus(st.getPath()))
            elif st.getLen() > _WHOLETEXT_CEILING:
                raise ValueError(
                    f"{st.getPath()} is {st.getLen()} bytes — beyond the "
                    "wholetext reader's single-task/2 GB-string ceiling. "
                    "Use read_lines(..., chunked=True) (splits the file "
                    "across tasks at line boundaries) or the table-"
                    "snapshot input (sources.read_table)."
                )
    except ValueError:
        raise
    except Exception:  # listing is best-effort (exotic FS, perms)
        pass


def dense_ordinal(df: DataFrame, out_col: str) -> DataFrame:
    """Rebuild a per-file dense 0-based row ordinal WITHOUT a
    full-data shuffle, for frames carrying ``file``,
    ``_blk`` (input_file_block_start) and ``_mid``
    (monotonically_increasing_id): ids are consecutive within one
    split, so ``id - min(id per split)`` is the in-split index, and
    the running sum of per-split row counts (a #splits-row aggregate,
    broadcast back) is each split's base offset. Shared by the chunked
    line reader and the journald text framing — the trick relies on a
    subtle engine property (per-split id consecutiveness), so it lives
    in exactly one place. Consumes the ``_blk``/``_mid`` columns."""
    blocks = df.groupBy("file", "_blk").agg(
        F.min("_mid").alias("_mid0"), F.count(F.lit(1)).alias("_n")
    )
    wb = Window.partitionBy("file").orderBy("_blk")
    offsets = blocks.withColumn("_off", F.sum("_n").over(wb) - F.col("_n"))
    return (
        df.join(F.broadcast(offsets), ["file", "_blk"])
        .withColumn(out_col, F.col("_off") + F.col("_mid") - F.col("_mid0"))
        .drop("_blk", "_mid", "_mid0", "_n", "_off")
    )


def read_lines_chunked(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, line) with big files SPLIT across tasks.

    The non-wholetext text source is Hadoop's LineRecordReader: each
    task reads one byte-range split, skips its leading partial line and
    reads past its end to finish the last one — the standard
    distributed text split, constant memory per task regardless of file
    size (reference semantics: constant-memory tailing from a byte
    offset, filebeat/input/filestream/input.go:416-481).

    Per-file dense line numbers are reconstructed WITHOUT a full-data
    shuffle: rows carry (input_file_block_start, monotonically_
    increasing_id); within one split the ids are consecutive, so
    ``id - min(id per split)`` is the in-split line index, and the
    running sum of per-split line counts (a #splits-row aggregate,
    broadcast back) is the split's base offset. Split count follows
    ``spark.sql.files.maxPartitionBytes`` — at 100 TB that is the scan
    parallelism knob, not file count.

    Differences from the wholetext path: ``line_no`` is LongType (files
    beyond 2^31 lines exist at this ceiling) and an empty file yields
    zero rows (wholetext yields one empty line).
    """
    df = spark.read.text(path).select(
        F.input_file_name().alias("file"),
        F.input_file_block_start().alias("_blk"),
        F.monotonically_increasing_id().alias("_mid"),
        F.regexp_replace(F.col("value"), r"\r$", "").alias("line"),
    )
    return dense_ordinal(df, "line_no").select("file", "line_no", "line")


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
    separator: str = "\n",
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
        if negate:  # while.go applies negate to the run predicate too
            m = ~m
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

    # message_buffer.go:83 — the separator joins buffered lines unless
    # skip_newline suppresses it; separator itself is configurable.
    sep = "" if skip_newline else separator
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


def multiline_join_distributed(
    df: DataFrame,
    mode: str = "pattern",
    pattern: str | None = None,
    negate: bool = False,
    match: str = "after",
    flush_pattern: str | None = None,
    count_lines: int | None = None,
    max_lines: int | None = None,
    skip_newline: bool = False,
    separator: str = "\n",
    chunk_lines: int = 1 << 16,
    file_col: str = "file",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """:func:`multiline_join` without the one-reducer-per-file ceiling.

    Same semantics, same output — proven frame-equal in
    tests/test_multiline_distributed.py — but every stage is parallel
    in ``chunk = line_no div chunk_lines``, so ONE huge file spreads
    over the whole cluster instead of serializing on a single window
    reducer (the ceiling documented on :func:`read_multiline`).

    How each serial dependency falls out:

    * The boundary flag needs at most ``lag(1)`` of a per-line
      predicate (continuation / flush / run-start). Lag is computed
      inside each (file, chunk) window; the one row it cannot see —
      the previous chunk's last line — comes from a per-chunk
      aggregate (#chunks rows) joined back shifted by one. The same
      trick the reference's byte-offset splits use: a split consults
      only its neighbor's boundary, never the whole file
      (filebeat/input/filestream reads from an offset, not the head).
    * The running event-id becomes per-chunk running sum + per-chunk
      offset (a second #chunks-row aggregate, running-summed on the
      driver-sized frame and broadcast back) — exactly how
      ``read_lines_chunked`` rebuilds dense line numbers.
    * Assembly hashes on (file, _grp): fine-grained keys, parallel.

    Requires ``line_no`` DENSE per file (0..n-1) — the contract
    ``read_lines`` / ``read_lines_chunked`` already provide. Events
    spanning chunk boundaries are handled by construction: the group
    id is globally consistent, the groupBy reunites their lines.

    Cost model vs the windowed form: one extra shuffle (the groupBy
    does not reuse the window partitioning) and two tiny aggregates,
    in exchange for reducer parallelism ~ total_lines/chunk_lines
    instead of #files. Use the windowed form for many ordinary files;
    use this when any single file dominates.
    """
    if chunk_lines < 2:
        raise ValueError("chunk_lines must be >= 2")
    file_ = F.col(file_col)
    line_no = F.col(line_no_col)
    line = F.col(line_col)
    chunk = (line_no / F.lit(chunk_lines)).cast("long").alias("_chunk")
    wc = Window.partitionBy(file_col, "_chunk").orderBy(line_no_col)

    # --- per-line predicates (pure; lag handled below) ---
    if mode == "pattern":
        if not pattern:
            raise ValueError("multiline.pattern cannot be empty in pattern mode")
        if match not in ("after", "before"):
            raise ValueError(f"unknown matcher type: {match}")
        m = line.rlike(pattern)
        if negate:
            m = ~m
        flush_m = line.rlike(flush_pattern) if flush_pattern else F.lit(False)
        # after: new = ~m(line); before: new = ~lag(m); flush adds | lag(flush_m)
        need_lag = (match == "before") or bool(flush_pattern)
    elif mode == "count":
        if not count_lines:
            raise ValueError("multiline.count_lines cannot be empty in count mode")
        m = F.lit(False)
        flush_m = F.lit(False)
        need_lag = False
    elif mode == "while_pattern":
        if not pattern:
            raise ValueError(
                "multiline.pattern cannot be empty in while_pattern mode"
            )
        m = line.rlike(pattern)
        if negate:
            m = ~m
        flush_m = F.lit(False)
        need_lag = True
    else:
        raise ValueError(f"unknown multiline mode: {mode}")

    base = df.select(
        file_, line_no, line, chunk, m.alias("_m"), flush_m.alias("_fm")
    )

    if need_lag:
        # previous line's (m, flush_m): in-chunk lag + the neighbor
        # chunk's last line for each chunk's first row.
        lag_m = F.lag("_m", 1).over(wc)
        lag_fm = F.lag("_fm", 1).over(wc)
        tails = (
            base.groupBy(file_col, "_chunk")
            .agg(
                F.max_by("_m", line_no).alias("_tail_m"),
                F.max_by("_fm", line_no).alias("_tail_fm"),
            )
            .withColumn("_chunk", F.col("_chunk") + 1)
        )
        flagged = (
            base.withColumn("_lag_m", lag_m)
            .withColumn("_lag_fm", lag_fm)
            .join(tails, [file_col, "_chunk"], "left")
            .select(
                file_col,
                line_no_col,
                line_col,
                "_chunk",
                "_m",
                F.coalesce("_lag_m", "_tail_m").alias("_prev_m"),
                F.coalesce("_lag_fm", "_tail_fm").alias("_prev_fm"),
            )
        )
    else:
        flagged = base.withColumn("_prev_m", F.lit(None).cast("boolean")).withColumn(
            "_prev_fm", F.lit(None).cast("boolean")
        )

    prev_m = F.coalesce(F.col("_prev_m"), F.lit(False))
    prev_fm = F.coalesce(F.col("_prev_fm"), F.lit(False))
    if mode == "pattern":
        cont = F.col("_m") if match == "after" else prev_m
        new_event = ~cont
        if flush_pattern:
            new_event = new_event | prev_fm
    elif mode == "count":
        new_event = (line_no % count_lines) == 0
    else:  # while_pattern
        new_event = (~F.col("_m")) | (F.col("_m") & ~prev_m)

    flagged = flagged.withColumn("_new", new_event.cast("long"))

    # running event id = in-chunk running sum + per-chunk offset
    local = flagged.withColumn("_lgrp", F.sum("_new").over(wc))
    counts = flagged.groupBy(file_col, "_chunk").agg(F.sum("_new").alias("_n_new"))
    wo = Window.partitionBy(file_col).orderBy("_chunk")
    offsets = counts.withColumn(
        "_off", F.sum("_n_new").over(wo) - F.col("_n_new")
    ).select(file_col, "_chunk", "_off")
    grouped = local.join(offsets, [file_col, "_chunk"]).withColumn(
        "_grp", F.col("_off") + F.col("_lgrp")
    )

    sep = "" if skip_newline else separator
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(line_no_col).alias("n"), line.alias("l")))
    )
    kept = F.slice(parts, 1, max_lines) if max_lines else parts
    out = grouped.groupBy(file_col, "_grp").agg(
        F.min(line_no_col).alias(line_no_col),
        F.array_join(F.transform(kept, lambda s: s.getField("l")), sep).alias(
            "message"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
    truncated = (F.col("n_lines") > max_lines) if max_lines else F.lit(False)
    return out.select(
        file_col, line_no_col, "message", "n_lines", truncated.alias("truncated")
    )


def include_message_filter(
    df: DataFrame, patterns: list[str], message_col: str = "message"
) -> DataFrame:
    """The ``include_message`` reader parser: keep events whose
    message matches ANY of the regex patterns, drop the rest.

    Ref: libbeat/reader/filter/filter.go:32-47 — ``FilterParser``
    returns a message iff ``matchAny`` over the configured
    ``match.Matcher`` list fires (unanchored regex, substring
    semantics); everything else is discarded before downstream
    parsers. One codegen ``rlike`` disjunction — Catalyst pushes it
    toward the scan like any other filter; a NULL message never
    matches (no bytes ⇒ no match), mirroring MatchString on an empty
    content string only matching patterns that accept empty.
    """
    from beats_spark.functions.conditions import include_message_keep

    return df.filter(include_message_keep(F.col(message_col), patterns))


def read_multiline(
    spark: SparkSession,
    path: str,
    multiline: dict | None = None,
    include_lines: list[str] | None = None,
    exclude_lines: list[str] | None = None,
    include_message: list[str] | None = None,
    chunked: bool = False,
    exclude_files: list[str] | None = None,
    ignore_older: float | None = None,
) -> DataFrame:
    """File input end-to-end: lines → (optional) multiline join →
    include/exclude filters. The entry point a Beats ``filestream`` +
    ``parsers: [multiline]`` YAML maps onto (run.py --source-format
    text).

    ``include_lines``/``exclude_lines`` follow the reference's
    documented order: each multiline message is combined FIRST, then
    include_lines keeps matching events, then exclude_lines drops
    matching ones (filebeat filestream options).

    ``chunked=True`` uses the split reader for big files AND the
    distributed multiline join (:func:`multiline_join_distributed`) —
    both the scan and the join then parallelize within a single huge
    file, which removes the one-reducer-per-file ceiling the windowed
    join has. The default (non-chunked) path keeps the windowed join:
    for a directory of ordinary files it is one shuffle instead of
    two."""
    lines = read_lines(
        spark,
        path,
        chunked=chunked,
        exclude_files=exclude_files,
        ignore_older=ignore_older,
    )
    if not multiline:
        out = lines.withColumnRenamed("line", "message").withColumn(
            "n_lines", F.lit(1).cast("long")
        ).withColumn("truncated", F.lit(False))
    else:
        cfg = dict(multiline)
        cfg.setdefault("mode", cfg.pop("type", "pattern"))
        join = multiline_join_distributed if chunked else multiline_join
        out = join(lines, **cfg)
    if include_message:
        out = include_message_filter(out, include_message)
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

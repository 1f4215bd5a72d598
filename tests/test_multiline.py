"""Multiline reader parity.

Each case transliterates a reference test from
libbeat/reader/multiline/multiline_test.go (cited per case): the same
pattern/negate/match/flush/count/while configs, the same input lines,
the same expected events. The input rides through read_lines (real
files on disk) for the first case and synthesized (file, line_no,
line) frames for the rest — the join is the unit under test, the
file scan is covered once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.sources.lines import multiline_join, read_lines, read_multiline


def _lines_df(spark, texts: list[str], file: str = "f"):
    rows = [(file, i, ln) for i, ln in enumerate(texts)]
    return spark.createDataFrame(rows, "file string, line_no int, line string")


def _events(df):
    return [
        (r["message"], r["n_lines"], r["truncated"])
        for r in df.orderBy("file", "line_no").collect()
    ]


def _messages(df):
    return [e[0] for e in _events(df)]


def test_after_ok_via_files(spark, tmp_path):
    """multiline_test.go:49 (AfterOK) — indented continuations, through
    real files incl. CRLF + trailing-newline handling."""
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text("line1\n  line1.1\n  line1.2\nline2\n  line2.1\n  line2.2\n")
    (d / "b.log").write_text("only1\r\n  only1.1\r\n")
    out = multiline_join(
        read_lines(spark, str(d)), pattern=r"^[ \t] +", match="after"
    )
    by_file = {}
    for r in out.collect():
        by_file.setdefault(r["file"].rsplit("/", 1)[-1], []).append(
            (r["line_no"], r["message"])
        )
    assert sorted(by_file["a.log"]) == [
        (0, "line1\n  line1.1\n  line1.2"),
        (3, "line2\n  line2.1\n  line2.2"),
    ]
    assert sorted(by_file["b.log"]) == [(0, "only1\n  only1.1")]


def test_before_ok(spark):
    """multiline_test.go:63 (BeforeOK) — trailing backslash binds the
    next line."""
    out = multiline_join(
        _lines_df(
            spark,
            ["line1 \\", "line1.1 \\", "line1.2", "line2 \\", "line2.1 \\", "line2.2"],
        ),
        pattern=r"\\$",
        match="before",
    )
    assert _messages(out) == [
        "line1 \\\nline1.1 \\\nline1.2",
        "line2 \\\nline2.1 \\\nline2.2",
    ]


def test_after_negate_ok(spark):
    """multiline_test.go:78 (AfterNegateOK) — '-'-prefixed heads."""
    out = multiline_join(
        _lines_df(spark, ["-line1", "  - line1.1", "  - line1.2", "-line2", "  - line2.1", "  - line2.2"]),
        pattern=r"^-",
        negate=True,
        match="after",
    )
    assert _messages(out) == [
        "-line1\n  - line1.1\n  - line1.2",
        "-line2\n  - line2.1\n  - line2.2",
    ]


def test_before_negate_ok(spark):
    """multiline_test.go:94 (BeforeNegateOK) — ';'-terminated events."""
    out = multiline_join(
        _lines_df(spark, ["line1", "line1.1", "line1.2;", "line2", "line2.1", "line2.2;"]),
        pattern=r";$",
        negate=True,
        match="before",
    )
    assert _messages(out) == [
        "line1\nline1.1\nline1.2;",
        "line2\nline2.1\nline2.2;",
    ]


def test_before_negate_with_empty_lines(spark):
    """multiline_test.go:147 (BeforeNegateOKWithEmptyLine)."""
    out = multiline_join(
        _lines_df(spark, ["line1", "", "", "line1.2;", "line2", "line2.1", "line2.2;"]),
        pattern=r";$",
        negate=True,
        match="before",
    )
    assert _messages(out) == [
        "line1\n\n\nline1.2;",
        "line2\nline2.1\nline2.2;",
    ]


def test_after_negate_flush_pattern(spark):
    """multiline_test.go:110 (AfterNegateOKFlushPattern) — EventEnd
    forces a boundary; the in-between line is its own event."""
    lines = [
        "EventStart", "EventId: 1", "EventEnd",
        "OtherThingInBetween",
        "EventStart", "EventId: 2", "EventEnd",
    ]
    out = multiline_join(
        _lines_df(spark, lines),
        pattern="EventStart",
        negate=True,
        match="after",
        flush_pattern="EventEnd",
    )
    assert _messages(out) == [
        "EventStart\nEventId: 1\nEventEnd",
        "OtherThingInBetween",
        "EventStart\nEventId: 2\nEventEnd",
    ]


def test_after_negate_flush_pattern_first_lines_dont_match(spark):
    """multiline_test.go:128 — leading non-matching lines merge into
    one event before the first EventStart."""
    lines = [
        "StartLineThatDosentMatchTheEvent", "OtherThingInBetween",
        "EventStart", "EventId: 2", "EventEnd",
        "EventStart", "EventId: 3", "EventEnd",
    ]
    out = multiline_join(
        _lines_df(spark, lines),
        pattern="EventStart",
        negate=True,
        match="after",
        flush_pattern="EventEnd",
    )
    assert _messages(out) == [
        "StartLineThatDosentMatchTheEvent\nOtherThingInBetween",
        "EventStart\nEventId: 2\nEventEnd",
        "EventStart\nEventId: 3\nEventEnd",
    ]


def test_after_truncated(spark):
    """multiline_test.go:162 (AfterTruncated) — max_lines keeps the
    first lines, event marked truncated, extra lines consumed."""
    out = multiline_join(
        _lines_df(spark, ["line1", " line1.1", " line1.2", "line2", " line2.1", " line2.2"]),
        pattern=r"^[ ]",
        match="after",
        max_lines=2,
    )
    assert _events(out) == [
        ("line1\n line1.1", 3, True),
        ("line2\n line2.1", 3, True),
    ]


def test_count_mode(spark):
    """multiline_test.go:198 (Count) — fixed-size framing."""
    out = multiline_join(
        _lines_df(spark, ["line1", " line1.1", "line2", " line2.1"]),
        mode="count",
        count_lines=2,
    )
    assert _messages(out) == ["line1\n line1.1", "line2\n line2.1"]
    out1 = multiline_join(
        _lines_df(spark, ["a", "b", "c"]), mode="count", count_lines=1
    )
    assert _messages(out1) == ["a", "b", "c"]


def test_while_pattern(spark):
    """multiline_test.go:245 (WhilePattern) — runs of '{'-prefixed
    lines collapse; non-matching lines stand alone."""
    out = multiline_join(
        _lines_df(spark, ["{line1", "{line1.1", "not matched line", "{line2", "{line2.1"]),
        mode="while_pattern",
        pattern=r"^\{",  # rlike is Java regex: bare { is illegal, RE2 allows it
    )
    assert _messages(out) == [
        "{line1\n{line1.1",
        "not matched line",
        "{line2\n{line2.1",
    ]


def test_read_multiline_and_validation(spark, tmp_path):
    f = tmp_path / "x.log"
    f.write_text("a\n b\nc\n")
    out = read_multiline(
        spark, str(tmp_path), {"type": "pattern", "pattern": r"^ ", "match": "after"}
    )
    assert _messages(out) == ["a\n b", "c"]
    plain = read_multiline(spark, str(tmp_path))
    assert plain.count() == 3
    with pytest.raises(ValueError):
        multiline_join(_lines_df(spark, ["x"]), mode="pattern", pattern=None)
    with pytest.raises(ValueError):
        multiline_join(_lines_df(spark, ["x"]), mode="pattern", pattern="x", match="sideways")
    with pytest.raises(ValueError):
        multiline_join(_lines_df(spark, ["x"]), mode="count")


def test_multiline_plan_single_shuffle(spark):
    """Scale shape: the whole join is ONE Exchange (hash by file) —
    the two window passes and the groupBy reuse the partitioning."""
    out = multiline_join(_lines_df(spark, ["a", " b"]), pattern=r"^ ", match="after")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # file-hash exchange (+AQE read)


def test_run_py_text_input_end_to_end(spark, tmp_path):
    """A Beats-style file-input YAML ports end-to-end: log dir →
    multiline join → dissect → route → fan-out sinks, via run.py's
    main() (the spark-submit surface)."""
    import json

    import run as run_mod

    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text(
        "level=error msg=boom\n"
        "  at Foo.java:1\n"
        "  at Bar.java:2\n"
        "level=info msg=ok\n"
    )
    (logs / "b.log").write_text("level=info msg=fine\n")
    cfg = tmp_path / "job.yml"
    cfg.write_text(
        """
input:
  type: text
  path: {path}
  multiline:
    type: pattern
    pattern: '^\\s'
    match: after
processors:
  - dissect:
      tokenizer: 'level=%{{level}} msg=%{{msg}}'
      field: message
      target_prefix: ''
router_rules:
  - when: {{equals: {{level: error}}}}
    index: errors
default_sink: main
key_field: file
n_buckets: 4
""".format(path=logs)
    )
    metrics_out = tmp_path / "metrics.json"
    rc = run_mod.main(
        [
            "--config", str(cfg),
            "--out-root", str(tmp_path / "sinks"),
            "--metrics-out", str(metrics_out),
        ]
    )
    assert rc == 0
    payload = json.loads(metrics_out.read_text())
    assert payload["sink_counts"] == {"errors": 1, "main": 2}
    # the joined multiline body survived parsing intact
    err = spark.read.parquet(str(tmp_path / "sinks")).filter(
        F.col("_meta_sink") == "errors"
    ).first()
    assert err["msg"] == "boom\n  at Foo.java:1\n  at Bar.java:2"


def test_streaming_text_tail_multiline(spark, tmp_path):
    """Streaming twin: files tailed whole per micro-batch, multiline
    joined, routed, written append; a file added between batches is
    picked up exactly once (checkpointed source offsets)."""
    from beats_spark.plans.pipeline import PipelineConfig
    from beats_spark.streaming.pipeline import run_text_stream

    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text("level=error msg=a\n  at X.java:1\nlevel=info msg=b\n")
    cfg = PipelineConfig(
        processors=[
            {"dissect": {"tokenizer": "level=%{level} msg=%{msg}", "field": "message",
                          "target_prefix": ""}}
        ],
        router_rules=[{"when": {"equals": {"level": "error"}}, "index": "errors"}],
    )
    out = tmp_path / "sinks"
    ck = tmp_path / "ck"
    q = run_text_stream(
        spark, str(logs), cfg, str(out), str(ck),
        multiline={"type": "pattern", "pattern": r"^\s", "match": "after"},
    )
    q.awaitTermination(120)
    first = spark.read.parquet(str(out))
    assert first.count() == 2
    err = first.filter(F.col("_meta_sink") == "errors").first()
    assert err["msg"] == "a\n  at X.java:1"

    # second batch: a new file arrives; the old one is NOT reprocessed
    (logs / "b.log").write_text("level=info msg=c\n")
    q2 = run_text_stream(
        spark, str(logs), cfg, str(out), str(ck),
        multiline={"type": "pattern", "pattern": r"^\s", "match": "after"},
    )
    q2.awaitTermination(120)
    back = spark.read.parquet(str(out))
    assert back.count() == 3  # 2 + 1, no duplicates


def test_include_exclude_lines(spark, tmp_path):
    """filestream include_lines/exclude_lines: applied to the JOINED
    event (reference order: combine multiline first, include, then
    exclude)."""
    f = tmp_path / "x.log"
    f.write_text("ERR boom\n  at A\nINFO fine\nERR noisy-known\nWARN meh\n")
    out = read_multiline(
        spark, str(tmp_path),
        {"type": "pattern", "pattern": r"^\s", "match": "after"},
        include_lines=[r"^ERR", r"^WARN"],
        exclude_lines=[r"noisy-known"],
    )
    assert _messages(out) == ["ERR boom\n  at A", "WARN meh"]


def test_multiline_property_roundtrip(spark):
    """Property: for ANY stream where continuation lines are exactly
    the indented ones, joining then re-splitting on newline recovers
    the original line sequence, and event boundaries sit exactly on
    the non-indented lines (derived from hypothesis-generated seeds,
    materialized deterministic here for Spark-session cost reasons)."""
    import random

    rng = random.Random(1234)
    for trial in range(5):
        lines = []
        heads = []
        n = rng.randint(1, 40)
        for _ in range(n):
            if not lines or rng.random() < 0.4:
                heads.append(len(lines))
                lines.append(f"head-{rng.randint(0, 999)}")
            else:
                lines.append(f"  cont-{rng.randint(0, 999)}")
        # stream must start with a head
        out = multiline_join(
            _lines_df(spark, lines), pattern=r"^\s", match="after"
        ).orderBy("line_no").collect()
        # boundaries == head positions
        assert [r["line_no"] for r in out] == heads, (trial, lines)
        # join → split == original
        rejoined = []
        for r in out:
            rejoined.extend(r["message"].split("\n"))
        assert rejoined == lines, trial
        # line accounting exact
        assert sum(r["n_lines"] for r in out) == len(lines)


def test_chunked_reader_splits_big_file(spark, tmp_path):
    """A single large file reads across >1 task with exact dense line
    numbers — the constant-memory path for files beyond one task /
    the 2 GB wholetext ceiling."""
    from beats_spark.sources.lines import read_lines_chunked

    f = tmp_path / "big.log"
    n = 200_000
    with open(f, "w") as fh:
        for i in range(n):
            fh.write(f"line {i} {'x' * 80}\n")  # ~6 MB
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
    try:
        df = read_lines_chunked(spark, str(f))
        assert spark.read.text(str(f)).rdd.getNumPartitions() > 1
        rows = df.select("line_no", "line").collect()
        assert len(rows) == n
        for r in rows:
            assert r["line"].startswith(f"line {r['line_no']} "), r
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_chunked_matches_wholetext(spark, tmp_path):
    """Both readers produce the identical (line_no, line) set, CRLF
    stripped, trailing newline not an extra line."""
    from beats_spark.sources.lines import read_lines, read_lines_chunked

    f = tmp_path / "a.log"
    f.write_bytes(b"alpha\r\nbeta\n\ngamma\n")
    whole = {(r["line_no"], r["line"])
             for r in read_lines(spark, str(tmp_path)).collect()}
    chunk = {(int(r["line_no"]), r["line"])
             for r in read_lines_chunked(spark, str(tmp_path)).collect()}
    assert whole == chunk == {(0, "alpha"), (1, "beta"), (2, ""), (3, "gamma")}


def test_wholetext_oversize_guard(spark, tmp_path, monkeypatch):
    """Files beyond the JVM string ceiling fail fast with the chunked
    redirect, not mid-scan."""
    import beats_spark.sources.lines as L

    f = tmp_path / "huge.log"
    f.write_text("x\n" * 10)
    monkeypatch.setattr(L, "_WHOLETEXT_CEILING", 5)
    with pytest.raises(ValueError, match="chunked=True"):
        L.read_lines(spark, str(tmp_path))


def test_chunked_multiline_join(spark, tmp_path):
    """multiline over the chunked reader: same events as wholetext."""
    from beats_spark.sources.lines import read_multiline

    f = tmp_path / "app.log"
    f.write_text(
        "ERR boom\n  at A.java:1\n  at B.java:2\nINFO ok\nERR pow\n  at C\n"
    )
    cfg = {"type": "pattern", "pattern": r"^\s", "match": "after"}
    whole = {(r["line_no"], r["message"], r["n_lines"])
             for r in read_multiline(spark, str(tmp_path), cfg).collect()}
    chunk = {(int(r["line_no"]), r["message"], r["n_lines"])
             for r in read_multiline(spark, str(tmp_path), cfg, chunked=True).collect()}
    assert whole == chunk
    assert ("ERR boom\n  at A.java:1\n  at B.java:2" in {m for _, m, _ in whole})


def test_count_mode_remaining_reference_cases(spark):
    """multiline_test.go:200 (Count) sub-cases not yet transliterated:
    count=4 framing, and count=3 with max_lines=2 (every frame keeps
    the first 2 lines and is flagged truncated)."""
    out4 = multiline_join(
        _lines_df(spark, ["line1", " line1.1", "line2", " line2.1",
                           "line3", " line3.1", "line4", " line4.1"]),
        mode="count", count_lines=4,
    )
    assert _messages(out4) == [
        "line1\n line1.1\nline2\n line2.1",
        "line3\n line3.1\nline4\n line4.1",
    ]
    trunc = multiline_join(
        _lines_df(spark, ["line1", " line1.1", " line1.2",
                           "line2", " line2.1", " line2.2"]),
        mode="count", count_lines=3, max_lines=2,
    )
    assert _events(trunc) == [
        ("line1\n line1.1", 3, True),
        ("line2\n line2.1", 3, True),
    ]


def test_after_exactly_max_lines_not_truncated(spark):
    """multiline_test.go:163 second sub-case: events of exactly
    max_lines lines are NOT flagged truncated."""
    out = multiline_join(
        _lines_df(spark, ["line1", " line1.1", "line2", " line2.1"]),
        pattern=r"^[ ]", match="after", max_lines=2,
    )
    assert _events(out) == [
        ("line1\n line1.1", 2, False),
        ("line2\n line2.1", 2, False),
    ]


def test_while_pattern_negate(spark):
    """multiline_test.go:260 — negated while: runs of lines NOT
    matching ^{ collapse; '{'-lines stand alone."""
    out = multiline_join(
        _lines_df(spark, ["{line1", "panic:", "~stacktrace~", "{line2"]),
        mode="while_pattern", pattern=r"^\{", negate=True,
    )
    assert _messages(out) == ["{line1", "panic:\n~stacktrace~", "{line2"]


def test_while_pattern_truncated(spark):
    """multiline_test.go:272 — while mode honors max_lines + flag."""
    out = multiline_join(
        _lines_df(spark, ["{line1", "{line1.1", "{line1.2"]),
        mode="while_pattern", pattern=r"^\{", max_lines=2,
    )
    assert _events(out) == [("{line1\n{line1.1", 3, True)]


def test_skip_newline_and_separator(spark):
    """message_buffer.go:83 — skip_newline joins without a separator;
    a custom separator replaces the default newline."""
    lines = ["a", " b", "c"]
    joined = multiline_join(
        _lines_df(spark, lines), pattern=r"^ ", match="after", skip_newline=True
    )
    assert _messages(joined) == ["a b", "c"]
    sep = multiline_join(
        _lines_df(spark, lines), pattern=r"^ ", match="after", separator="|"
    )
    assert _messages(sep) == ["a| b", "c"]


def test_exclude_files_and_ignore_older(spark, tmp_path):
    """Prospector-level file filters (filestream config.go:83): the
    excluded/stale files contribute zero lines, on both readers."""
    import os
    import time

    from beats_spark.sources.lines import read_lines

    (tmp_path / "keep.log").write_text("a\nb\n")
    (tmp_path / "skip.log.gz.bak").write_text("c\n")
    (tmp_path / "old.log").write_text("d\n")
    old = time.time() - 7200
    os.utime(tmp_path / "old.log", (old, old))

    for chunked in (False, True):
        out = read_lines(
            spark,
            str(tmp_path),
            chunked=chunked,
            exclude_files=[r"\.bak$"],
            ignore_older=3600,
        )
        files = {r.file.rsplit("/", 1)[-1] for r in out.collect()}
        assert files == {"keep.log"}, (chunked, files)


# --- include_message (FilterParser) -----------------------------------------
# Transliterated from libbeat/reader/filter/filter_test.go::TestParser.

def _msgs_df(spark, msgs: list[str]):
    rows = [("f", i, m) for i, m in enumerate(msgs)]
    return spark.createDataFrame(rows, "file string, line_no int, message string")


@pytest.mark.parametrize(
    "patterns,inp,want",
    [
        # "keep all messages"
        (["this matches*"], ["this matches", "this matches again"],
         ["this matches", "this matches again"]),
        # "keep all messages with multiple patterns"
        (["this matches*", "should match as well*"],
         ["this matches", "should match as well"],
         ["this matches", "should match as well"]),
        # "keep one message"
        (["this matches*"], ["this matches", "this does not match"],
         ["this matches"]),
    ],
)
def test_include_message_reference_cases(spark, patterns, inp, want):
    from beats_spark.sources.lines import include_message_filter

    out = include_message_filter(_msgs_df(spark, inp), patterns)
    got = [r["message"] for r in out.orderBy("line_no").collect()]
    assert got == want


def test_include_message_null_and_required(spark):
    from beats_spark.sources.lines import include_message_filter

    df = spark.createDataFrame(
        [("f", 0, None), ("f", 1, "keep me")],
        "file string, line_no int, message string",
    )
    out = include_message_filter(df, ["keep"])
    assert [r["message"] for r in out.collect()] == ["keep me"]
    with pytest.raises(ValueError, match="non-empty list"):
        include_message_filter(df, [])
    # a bare string must be rejected, not per-character-iterated
    with pytest.raises(ValueError, match="non-empty list"):
        include_message_filter(df, "keep")


def test_include_message_in_reader_chain(spark, tmp_path):
    """read_multiline(include_message=...) filters the COMBINED event
    (parsers-chain order: multiline joins first, the filter sees whole
    messages), like declaring parsers: [multiline, include_message]."""
    p = tmp_path / "a.log"
    p.write_text(
        "ERR boom\n  at frame1\nINFO fine\nERR again\n  at frame2\n"
    )
    out = read_multiline(
        spark,
        str(p),
        multiline={"pattern": r"^\s", "match": "after"},
        include_message=["^ERR"],
    )
    msgs = [r["message"] for r in out.orderBy("line_no").collect()]
    assert msgs == ["ERR boom\n  at frame1", "ERR again\n  at frame2"]


def test_include_message_processor_form(spark):
    """Registry form: {'include_message': {'patterns': [...]}} drops
    non-matching rows, keeps columns untouched."""
    from beats_spark.operators.base import build_chain

    df = _msgs_df(spark, ["this matches", "this does not... wait it does",
                          "nope nothing here"])
    out = build_chain([{"include_message": {"patterns": ["matches", "does$"]}}])(df)
    got = sorted(r["message"] for r in out.collect())
    assert got == ["this does not... wait it does", "this matches"]

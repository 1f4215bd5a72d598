"""Container log reader parity — the reference's docker_json_test.go
golden corpus (libbeat/reader/readjson/docker_json_test.go:35-432)
transliterated case by case. Byte-counter assertions (message.Bytes)
have no table equivalent and are the only thing skipped; timestamps
compare at Spark's microsecond precision (Go keeps nanoseconds)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beats_spark.sources.container import parse_container_logs


def _lines(spark, lines):
    rows = [("f", i, l) for i, l in enumerate(lines)]
    return spark.createDataFrame(rows, "file string, line_no long, line string")


def _run(spark, lines, **kw):
    out = parse_container_logs(_lines(spark, lines), **kw)
    return [r.asDict() for r in out.orderBy("line_no").collect()]


def _utc(*args):
    # naive datetime in the session's UTC zone (tests pin UTC)
    return dt.datetime(*args)


# --- single-line docker (docker_json_test.go:46-76) ---

def test_common_log_message(spark):
    got = _run(
        spark,
        ['{"log":"1:M 09 Nov 13:27:36.276 # User requested shutdown...\\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}'],
        partial=False,
    )
    assert len(got) == 1
    m = got[0]
    assert m["message"] == "1:M 09 Nov 13:27:36.276 # User requested shutdown...\n"
    assert m["stream"] == "stdout"
    assert m["ts"] == _utc(2017, 11, 9, 13, 27, 36, 277747)


def test_wrong_json_is_skipped(spark):
    assert _run(spark, ["this is not JSON"]) == []


def test_zero_length_message(spark):
    got = _run(
        spark,
        ['{"log":"","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}'],
        partial=False,
    )
    assert len(got) == 1 and got[0]["message"] == ""


def test_wrong_cri_too_few_fields(spark):
    # criflags=False → 3 fields expected, 2 present
    assert _run(spark, ["2017-09-12T22:32:21.212861448Z stdout"], cri_flags=False) == []


def test_not_json_nor_cri(spark):
    # auto mode: first byte '{' → docker attempt only, which fails
    assert _run(spark, ["{this is not JSON nor CRI"]) == []


def test_missing_time_is_skipped(spark):
    assert (
        _run(spark, ['{"log":"1:M 09 Nov 13:27:36.276 # User requested shutdown...\\n","stream":"stdout"}'])
        == []
    )


# --- CRI (docker_json_test.go:104-127, 241-266) ---

CRI_LINE = "2017-09-12T22:32:21.212861448Z stdout 2017-09-12 22:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache"
CRI_LINE_F = "2017-09-12T22:32:21.212861448Z stdout F 2017-09-12 22:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache"
CRI_CONTENT = "2017-09-12 22:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache"


@pytest.mark.parametrize("fmt", ["auto", "cri"])
def test_cri_log_no_tags(spark, fmt):
    got = _run(spark, [CRI_LINE], cri_flags=False, format=fmt)
    assert len(got) == 1
    assert got[0]["message"] == CRI_CONTENT
    assert got[0]["stream"] == "stdout"
    assert got[0]["ts"] == _utc(2017, 9, 12, 22, 32, 21, 212861)


@pytest.mark.parametrize("fmt", ["auto", "cri"])
def test_cri_log_with_flags(spark, fmt):
    got = _run(spark, [CRI_LINE_F], cri_flags=True, format=fmt)
    assert len(got) == 1 and got[0]["message"] == CRI_CONTENT


def test_force_cri_with_json_logs(spark):
    assert (
        _run(spark, ['{"log":"x\\n","stream":"stdout"}'], format="cri") == []
    )


def test_force_json_with_cri_logs(spark):
    assert _run(spark, [CRI_LINE], format="docker") == []


# --- stream filtering (docker_json_test.go:129-158) ---

def test_filtering_docker_stream(spark):
    got = _run(
        spark,
        [
            '{"log":"filtered\\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
            '{"log":"unfiltered\\n","stream":"stderr","time":"2017-11-09T13:27:36.277747246Z"}',
            '{"log":"unfiltered\\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
        ],
        stream="stderr",
    )
    assert len(got) == 1 and got[0]["message"] == "unfiltered\n"
    assert got[0]["stream"] == "stderr"


def test_filtering_cri_stream(spark):
    got = _run(
        spark,
        [
            "2017-10-12T13:32:21.232861448Z stdout F 2017-10-12 13:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache",
            "2017-11-12T23:32:21.212771448Z stderr F 2017-11-12 23:32:21.212 [ERROR][77] table.go 111: error",
            "2017-12-12T10:32:21.212864448Z stdout F 2017-12-12 10:32:21.212 [WARN][88] table.go 222: Warn",
        ],
        stream="stderr",
        cri_flags=True,
    )
    assert len(got) == 1
    assert got[0]["message"] == "2017-11-12 23:32:21.212 [ERROR][77] table.go 111: error"
    assert got[0]["ts"] == _utc(2017, 11, 12, 23, 32, 21, 212771)


# --- partial joins (docker_json_test.go:160-220, 268-300) ---

def test_docker_split_lines(spark):
    got = _run(
        spark,
        [
            '{"log":"1:M 09 Nov 13:27:36.276 # User requested ","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
            '{"log":"shutdown...\\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
        ],
        stream="stdout",
        partial=True,
    )
    assert len(got) == 1
    assert got[0]["message"] == "1:M 09 Nov 13:27:36.276 # User requested shutdown...\n"
    assert got[0]["n_lines"] == 2


@pytest.mark.parametrize("fmt", ["auto", "cri"])
def test_cri_split_lines(spark, fmt):
    got = _run(
        spark,
        [
            "2017-10-12T13:32:21.232861448Z stdout P 2017-10-12 13:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache",
            "2017-11-12T23:32:21.212771448Z stdout F  error",
        ],
        stream="stdout",
        partial=True,
        cri_flags=True,
        format=fmt,
    )
    assert len(got) == 1
    assert got[0]["message"] == (
        "2017-10-12 13:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache error"
    )
    # Ts comes from the FIRST fragment (docker_json.go:145)
    assert got[0]["ts"] == _utc(2017, 10, 12, 13, 32, 21, 232861)


@pytest.mark.parametrize("fmt", ["auto", "cri"])
def test_cri_split_lines_strips_partial_newline(spark, fmt):
    got = _run(
        spark,
        [
            "2017-10-12T13:32:21.232861448Z stdout P 2017-10-12 13:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache\n",
            "2017-11-12T23:32:21.212771448Z stdout F  error",
        ],
        stream="stdout",
        partial=True,
        cri_flags=True,
        format=fmt,
    )
    assert len(got) == 1
    assert got[0]["message"] == (
        "2017-10-12 13:32:21.212 [INFO][88] table.go 710: Invalidating dataplane cache error"
    )


def test_split_lines_with_partial_disabled(spark):
    got = _run(
        spark,
        [
            '{"log":"1:M 09 Nov 13:27:36.276 # User requested ","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
            '{"log":"shutdown...\\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
        ],
        stream="stdout",
        partial=False,
    )
    assert [g["message"] for g in got] == [
        "1:M 09 Nov 13:27:36.276 # User requested ",
        "shutdown...\n",
    ]


def test_corrupt_line_mid_partial_run_is_skipped(spark):
    # docker_json_test.go:302-313: a partial followed by a corrupt
    # line — the corrupt line is skipped and the join continues.
    got = _run(
        spark,
        [
            '{"log":"1:M 09 Nov 13:27:36.276 # User requested ","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
            '{"log":"shutdown...\\n","stream',
            '{"log":"shutdown...\\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
        ],
        stream="stdout",
        partial=True,
    )
    assert len(got) == 1
    assert got[0]["message"] == "1:M 09 Nov 13:27:36.276 # User requested shutdown...\n"


def test_corrupted_line_skipped_next_message_kept(spark):
    got = _run(
        spark,
        [
            '36.276 # User requested shutdown...\\n","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
            '{"log":"1:M 09 Nov 13:27:36.276 # User requested","stream":"stdout","time":"2017-11-09T13:27:36.277747246Z"}',
        ],
        partial=False,
    )
    assert len(got) == 1
    assert got[0]["message"] == "1:M 09 Nov 13:27:36.276 # User requested"


def test_docker_attrs(spark):
    got = _run(
        spark,
        ['{"log":"hello\\n","stream":"stdout","attrs":{"KEY1":"value1","KEY2":"value2"},"time":"2017-11-09T13:27:36.277747246Z"}'],
        stream="stdout",
        partial=True,
    )
    assert len(got) == 1
    assert got[0]["attrs"] == {"KEY1": "value1", "KEY2": "value2"}


# --- max_bytes (docker_json_test.go:376-432) ---

def test_max_bytes_truncates_and_flags(spark):
    chunk = "abcdefghij"
    lines = [
        f"2017-10-12T13:32:21.232861448Z stdout {'F' if i == 4 else 'P'} {chunk}"
        for i in range(5)
    ]
    got = _run(
        spark, lines, stream="stdout", partial=True, cri_flags=True, max_bytes=25
    )
    assert len(got) == 1
    assert len(got[0]["message"]) == 25
    assert got[0]["message"] == ("abcdefghij" * 3)[:25]
    assert "truncated" in got[0]["flags"]
    assert got[0]["n_lines"] == 5  # all fragments drained into one row


def test_max_bytes_first_chunk_already_too_large(spark):
    got = _run(
        spark,
        [
            "2017-10-12T13:32:21.232861448Z stdout P abcdefghij",
            "2017-10-12T13:32:21.232861448Z stdout F klmnopqrst",
        ],
        stream="stdout",
        partial=True,
        cri_flags=True,
        max_bytes=5,
    )
    assert len(got) == 1
    assert got[0]["message"] == "abcde"
    assert "truncated" in got[0]["flags"]


def test_untruncated_message_has_empty_flags(spark):
    got = _run(spark, [CRI_LINE_F], cri_flags=True, max_bytes=10_000)
    assert got[0]["flags"] == []


# --- mixed-format auto file + multi-file ---

def test_auto_mixed_formats_one_file(spark):
    got = _run(
        spark,
        [
            '{"log":"docker line\\n","stream":"stdout","time":"2017-11-09T13:27:36Z"}',
            "2017-09-12T22:32:21.212861448Z stderr F cri line",
        ],
        partial=True,
    )
    assert [g["message"] for g in got] == ["docker line\n", "cri line"]
    assert [g["stream"] for g in got] == ["stdout", "stderr"]


def test_partial_runs_do_not_cross_files(spark):
    rows = [
        ("a", 0, "2017-10-12T13:32:21.232861448Z stdout P one "),
        ("b", 0, "2017-10-12T13:32:21.232861448Z stdout F solo"),
        ("a", 1, "2017-10-12T13:32:21.232861448Z stdout F two"),
    ]
    df = spark.createDataFrame(rows, "file string, line_no long, line string")
    got = {
        (r["file"]): r["message"]
        for r in parse_container_logs(df, cri_flags=True).collect()
    }
    assert got == {"a": "one two", "b": "solo"}


def test_trailing_partial_is_flushed(spark):
    # batch semantics: an unterminated partial run at EOF flushes as a
    # message (the tailing reference would keep waiting; a snapshot IS
    # the flushed state — same rule as the multiline reader).
    got = _run(
        spark,
        ["2017-10-12T13:32:21.232861448Z stdout P dangling"],
        partial=True,
        cri_flags=True,
    )
    assert len(got) == 1 and got[0]["message"] == "dangling"


def test_invalid_config_rejected(spark):
    df = _lines(spark, ["x"])
    with pytest.raises(ValueError):
        parse_container_logs(df, format="journald")
    with pytest.raises(ValueError):
        parse_container_logs(df, stream="stdin")


def test_streaming_container_tail(spark, tmp_path):
    """Container parser composes with the streaming text tail exactly
    like the reference's filestream parsers chain: docker/CRI lines
    arrive whole per micro-batch, partials reassemble, the router runs
    on the parsed stream fields."""
    from pyspark.sql import functions as F

    from beats_spark.plans.pipeline import PipelineConfig
    from beats_spark.streaming.pipeline import run_text_stream

    logs = tmp_path / "clogs"
    logs.mkdir()
    (logs / "c.log").write_text(
        '{"log":"hello ","stream":"stdout","time":"2024-01-01T00:00:00Z"}\n'
        '{"log":"world\\n","stream":"stdout","time":"2024-01-01T00:00:01Z"}\n'
        "2024-01-01T00:00:02.5Z stderr F cri error line\n"
    )
    cfg = PipelineConfig(
        processors=[],
        router_rules=[{"when": {"equals": {"stream": "stderr"}}, "index": "errors"}],
    )
    q = run_text_stream(
        spark,
        str(logs),
        cfg,
        str(tmp_path / "sinks"),
        str(tmp_path / "ck"),
        container={"format": "auto", "cri_flags": True},
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "sinks"))
    rows = {r["message"]: r["_meta_sink"] for r in got.collect()}
    assert rows == {"hello world\n": "main", "cri error line": "errors"}

"""Grok compiler + processor tests.

Semantics follow the publicly documented Elasticsearch-ingest/Logstash
grok filter: %{SYNTAX:field:type}, recursive pattern definitions,
custom pattern_definitions, first-match-wins across patterns,
_grokparsefailure tagging. Cases are written fresh for this engine.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beats_spark.functions.grok import BUILTIN_PATTERNS, GrokError, GrokPattern
from beats_spark.operators.base import ProcessorConfigError, build_chain

CLF = (
    "%{IPORHOST:client_ip} %{NOTSPACE:ident} %{NOTSPACE:auth} "
    r"\[%{HTTPDATE:ts}\] \"%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}\" "
    "%{INT:status:int} %{INT:bytes:int}"
)
CLF_LINE = '192.168.0.7 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'


def test_compile_and_pandas_extract():
    p = GrokPattern(CLF)
    assert [f for f, _ in p.fields] == [
        "client_ip", "ident", "auth", "ts", "verb", "request",
        "httpversion", "status", "bytes",
    ]
    row = p.extract_pandas(pd.Series([CLF_LINE, "junk"])).to_dict("records")
    assert row[0]["client_ip"] == "192.168.0.7" and row[0]["verb"] == "GET"
    assert row[0]["ts"] == "10/Oct/2000:13:55:36 -0700"
    assert row[0]["_match"] and not row[1]["_match"]


def test_native_matches_pandas(spark):
    lines = [CLF_LINE, "not a log line", None,
             '10.1.2.3 - - [01/Jan/2021:00:00:00 +0000] "POST /x HTTP/1.1" 404 17']
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], "id int, message string")
    p = GrokPattern(CLF)
    nat = p.native_columns(F.col("message"))
    a = df.select("id", *[v.alias(k) for k, v in nat.items()]).orderBy("id").collect()
    struct = p.pandas_udf()(F.col("message"))
    b = df.select(
        "id", *[struct.getField(f).alias(f) for f in p.field_names()],
        struct.getField("_match").alias("_match"),
    ).orderBy("id").collect()
    for ra, rb in zip(a, b):
        assert bool(ra["_match"]) == bool(rb["_match"])
        for f in p.field_names():
            assert ra[f] == rb[f], f


def test_user_inline_groups_compose():
    # a user-supplied capturing group before a grok capture must not
    # shift field resolution (index map is built from the final regex)
    p = GrokPattern(r"(a|b)=%{WORD:val}")
    out = p.extract_pandas(pd.Series(["a=hello"])).iloc[0]
    assert out["val"] == "hello" and out["_match"]


def test_custom_definitions_and_recursion():
    p = GrokPattern(
        "%{KV:pair}", pattern_definitions={"KV": r"%{WORD}=%{WORD}"}
    )
    assert p.extract_pandas(pd.Series(["x=1"])).iloc[0]["pair"] == "x=1"
    with pytest.raises(GrokError):
        GrokPattern("%{NOPE:x}")
    with pytest.raises(GrokError):
        GrokPattern("%{A:x}", pattern_definitions={"A": "%{B}", "B": "%{A}"})


def test_builtin_patterns_all_compile():
    for name in BUILTIN_PATTERNS:
        GrokPattern(f"%{{{name}:v}}")  # must expand + compile


def test_processor_typed_and_tagging(spark):
    df = spark.createDataFrame(
        [(1, "st=200 b=12"), (2, "st=abc b=5"), (3, "junk")],
        "id int, message string",
    )
    out = build_chain(
        [{"grok": {"field": "message",
                   "match": "st=%{WORD:status:int} b=%{INT:bytes:int}"}}]
    )(df)
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["status"] == 200 and r[1]["bytes"] == 12 and r[1]["flags"] is None
    assert r[2]["status"] is None and "grok_conversion_error" in r[2]["flags"]
    assert r[3]["flags"] == ["_grokparsefailure"]


def test_processor_first_match_wins(spark):
    df = spark.createDataFrame(
        [(1, "u=bob n=5"), (2, "u=amy")], "id int, message string"
    )
    out = build_chain(
        [{"grok": {"field": "message",
                   "patterns": ["u=%{WORD:user} n=%{INT:n:int}", "u=%{WORD:user}"]}}]
    )(df)
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["user"] == "bob" and r[1]["n"] == 5
    assert r[2]["user"] == "amy" and r[2]["n"] is None and r[2]["flags"] is None


def test_anchor_false_searches(spark):
    df = spark.createDataFrame([(1, "prefix ip=1.2.3.4 suffix")], "id int, message string")
    out = build_chain(
        [{"grok": {"field": "message", "match": "ip=%{IPV4:ip}", "anchor": False}}]
    )(df)
    assert out.first()["ip"] == "1.2.3.4"


def test_config_errors(spark):
    df = spark.createDataFrame([(1, "x")], "id int, message string")
    with pytest.raises(ProcessorConfigError):
        build_chain([{"grok": {"field": "message"}}])(df)
    with pytest.raises(ProcessorConfigError):
        build_chain([{"grok": {"field": "missing", "match": "%{WORD:w}"}}])(df)


def test_grok_agrees_with_syslog_processor(spark):
    """Cross-validation: a grok RFC3164-ish pattern and the dedicated
    syslog processor parse the same lines to the same hostname/program/
    message — two independent compilers, one semantic."""
    lines = [
        "<34>Jan  5 03:14:07 web01 nginx[4321]: upstream timed out",
        "<13>Feb 28 23:59:59 db-7 postgres[99]: checkpoint complete",
    ]
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], "id int, line string")
    g = build_chain(
        [{"grok": {"field": "line",
                   "match": r"<%{NONNEGINT:pri:int}>%{SYSLOGTIMESTAMP:ts} "
                            r"%{NOTSPACE:hostname} %{NOTSPACE:prog}\[%{NONNEGINT:pid:int}\]: "
                            r"%{GREEDYDATA:msg}"}}]
    )(df)
    s = build_chain([{"syslog": {"field": "line", "format": "rfc3164"}}])(df)
    grows = {r["id"]: r for r in g.collect()}
    srows = {r["id"]: r for r in s.collect()}
    for i in range(len(lines)):
        assert grows[i]["hostname"] == srows[i]["hostname"]
        assert grows[i]["prog"] == srows[i]["program"]
        assert grows[i]["msg"] == srows[i]["syslog_message"]
        assert grows[i]["pri"] == srows[i]["log_syslog_priority"]
        assert grows[i]["flags"] is None


def test_pandas_match_with_optional_capture():
    """_match must come from the pattern match itself, not from the
    first capture's NaN: a capture inside an optional group is absent
    on legitimately matching rows."""
    p = GrokPattern(r"(?:%{WORD:a} )?%{INT:b:int}")
    out = p.extract_pandas(pd.Series(["hello 42", "42", "nope"]))
    assert list(out["_match"]) == [True, True, False]
    assert out.iloc[1]["a"] is pd.NA or pd.isna(out.iloc[1]["a"])
    assert out.iloc[1]["b"] == "42"


def test_combinedlog_library_pattern():
    line = ('203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif?x=1 HTTP/1.0" 200 2326 '
            '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98)"')
    p = GrokPattern("%{HTTPD_COMBINEDLOG}")
    r = p.extract_pandas(pd.Series([line])).iloc[0]
    assert bool(r["_match"])
    assert r["clientip"] == "203.0.113.9" and r["auth"] == "frank"
    assert r["verb"] == "GET" and r["request"] == "/apache_pb.gif?x=1"
    assert r["httpversion"] == "1.0" and r["response"] == "200"
    assert r["bytes"] == "2326"
    assert r["referrer"] == '"http://www.example.com/start.html"'
    assert r["agent"].startswith('"Mozilla/4.08')


def test_syslogline_library_pattern():
    line = "Oct 11 22:14:15 myhost su[1024]: 'su root' failed for user on /dev/pts/8"
    r = GrokPattern("%{SYSLOGLINE}").extract_pandas(pd.Series([line])).iloc[0]
    assert bool(r["_match"])
    assert r["timestamp"] == "Oct 11 22:14:15"
    assert r["logsource"] == "myhost" and r["program"] == "su"
    assert r["pid"] == "1024"
    assert r["message"] == "'su root' failed for user on /dev/pts/8"


def test_uri_and_misc_new_names():
    p = GrokPattern("%{URI:u}")
    r = p.extract_pandas(
        pd.Series(["https://user:pw@example.com:8443/a/b?x=1&y=2", "not a uri"])
    )
    assert r.iloc[0]["u"] == "https://user:pw@example.com:8443/a/b?x=1&y=2"
    assert not bool(r.iloc[1]["_match"])
    for name, sample in [
        ("IPV6", "::ffff:192.0.2.1"),
        ("IPV6", "2001:db8::1"),
        ("MAC", "00:1b:44:11:3a:b7"),
        ("MAC", "001b.4411.3ab7"),
        ("EMAILADDRESS", "a.user+tag@example.org"),
        ("DATESTAMP", "10/31/2024 13:55:36"),
        ("QS", "'single quoted'"),
    ]:
        assert bool(
            GrokPattern("%{" + name + ":v}")
            .extract_pandas(pd.Series([sample]))
            .iloc[0]["_match"]
        ), (name, sample)

"""Router tests — first-match-wins selector semantics
(libbeat/outputs/outil/select.go)."""

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.fmtstr import compile_fmtstr, is_const
from beats_spark.plans.router import route, sink_names


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "error", "tool", "2026-03-01 10:00:00"),
        (2, "info", "user", "2026-03-02 10:00:00"),
        (3, "error", "user", "2026-03-03 10:00:00"),
        (4, "info", "tool", None),
    ]
    return spark.createDataFrame(rows, "id int, level string, role string, t string").withColumn(
        "ts", F.col("t").cast("timestamp")
    )


def sinks(df, rules, **kw):
    out = route(df, rules, **kw)
    return {r["id"]: r["_meta_sink"] for r in out.collect()}


def test_first_match_wins(df):
    rules = [
        {"when": {"equals": {"level": "error"}}, "index": "errors"},
        {"when": {"equals": {"role": "tool"}}, "index": "tool_events"},
    ]
    assert sinks(df, rules) == {1: "errors", 2: "main", 3: "errors", 4: "tool_events"}


def test_fmtstr_rule_and_date(df):
    rules = [{"index": "logs-%{[role]}-%{+yyyy.MM.dd}"}]
    got = sinks(df, rules)
    assert got[1] == "logs-tool-2026.03.01"
    # null ts → fmt yields null → falls to default (select.go:367-373)
    assert got[4] == "main"


def test_mappings_with_default(df):
    rules = [
        {"index": "%{[role]}", "mappings": {"tool": "internal"}, "default": "external"}
    ]
    got = sinks(df, rules)
    assert got == {1: "internal", 2: "external", 3: "external", 4: "internal"}


def test_meta_override(df):
    pre = df.withColumn("_meta_sink", F.when(F.col("id") == 2, F.lit("forced")))
    rules = [{"when": {"equals": {"level": "error"}}, "index": "errors"}]
    out = route(pre, rules)
    got = {r["id"]: r["_meta_sink"] for r in out.collect()}
    assert got[2] == "forced" and got[1] == "errors"


def test_sink_names_enumeration():
    rules = [
        {"when": {"equals": {"a": 1}}, "index": "x"},
        {"index": "%{[role]}", "mappings": {"t": "u"}, "default": "d"},
    ]
    assert sink_names(rules, "main") == ["x", "u", "d", "main"]
    assert sink_names([{"index": "free-%{[role]}"}], "main") is None
    assert is_const("plain") and not is_const("a-%{[b]}")


def test_fmtstr_default_value(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    col = compile_fmtstr(df, "pre-%{[k]:fallback}")
    vals = [r[0] for r in df.select(col).collect()]
    assert vals == ["pre-a", "pre-fallback"]


def test_fmtstr_reference_cases(spark):
    """Transliterated from the reference's own format-string tests
    (libbeat/common/fmtstr/formatevents_test.go:36-131): literal
    passthrough, field expansion, defaults, nested fields (both
    syntaxes), repeated fields, and the timestamp formatter. Date
    patterns are Spark/Java (yyyy vs Joda's YYYY alias — same
    rendering for these dates)."""
    import datetime

    from pyspark.sql import Row

    from beats_spark.functions.fmtstr import compile_fmtstr

    ev = spark.createDataFrame(
        [
            Row(
                key="value",
                key1="v1",
                key2="v2",
                nested=Row(key="value"),
                missing=None,
                ts=datetime.datetime(2015, 5, 1, 20, 12, 34),
            )
        ],
        "key string, key1 string, key2 string, nested struct<key:string>, "
        "missing string, ts timestamp",
    )

    def run(fmt):
        return ev.select(compile_fmtstr(ev, fmt).alias("v")).first()["v"]

    assert run("") == ""
    assert run("format string") == "format string"
    assert run("%{[key]}") == "value"
    assert run("%{[nokey]:default}") == "default"
    assert run("%{[nested.key]}") == "value"
    assert run("%{[nested][key]}") == "value"
    assert run("%{[key1]} - %{[key2]}") == "v1 - v2"
    assert run("%{[key]} - %{[key]}") == "value - value"
    assert run("%{[key]:default} - %{[key]}") == "value - value"
    assert run("%{[key]} - %{[key]:default}") == "value - value"
    assert run("%{[key]}: %{+yyyy.MM.dd}") == "value: 2015.05.01"
    # a required (default-less) missing field nulls the WHOLE rule —
    # the next-selector-tried semantic (select.go:367-373)
    assert run("x-%{[nokey]}") is None
    assert run("x-%{[missing]}") is None


def test_selector_reference_table(spark):
    """Transliterated from the reference's output-selector table
    (libbeat/outputs/outil/select_test.go:44-260): constant keys,
    format-string keys, rule defaults on missing AND empty values,
    fall-through to the next rule, mappings with defaults on empty
    key and empty lookup, mapping without match. (lowercase-setting
    variants are an output-client option, not router semantics —
    compose F.lower downstream.)"""
    from beats_spark.plans.router import META_SINK, route

    def sel(rules, row: dict, schema: str, default="NONE"):
        df = spark.createDataFrame([tuple(row.values())], schema)
        out = route(df, rules, default=default)
        return out.first()[META_SINK]

    one = {"key": "value"}
    s = "key string"
    # constant key
    assert sel([{"index": "value"}], one, s) == "value"
    assert sel([{"index": "VaLuE"}], one, s) == "VaLuE"  # no implicit lowercase
    # format string key
    assert sel([{"index": "%{[key]}"}], one, s) == "value"
    # missing format string key with default in rule
    assert sel([{"index": "%{[nokey]}", "default": "value"}], one, s) == "value"
    # empty format string key with default in rule
    assert sel([{"index": "%{[key]}", "default": "value"}], {"key": ""}, s) == "value"
    # missing format string key with constant in next rule
    assert sel([{"index": "%{[nokey]}"}, {"index": "value"}], one, s) == "value"
    # apply mapping
    assert sel(
        [{"index": "%{[key]}", "mappings": {"v": "value"}}], {"key": "v"}, s
    ) == "value"
    # apply mapping with default on empty key
    assert sel(
        [{"index": "%{[key]}", "mappings": {"v": "value"}, "default": "value"}],
        {"key": ""}, s,
    ) == "value"
    # apply mapping with default on empty lookup (mapping maps v -> "")
    assert sel(
        [{"index": "%{[key]}", "mappings": {"v": ""}, "default": "value"}],
        {"key": "v"}, s,
    ) == "value"
    # apply mapping without match -> rule default
    assert sel(
        [{"index": "%{[key]}", "mappings": {"v": "value"}, "default": "value"}],
        {"key": "x"}, s,
    ) == "value"
    # mapping misses with NO default -> falls through to router default
    assert sel(
        [{"index": "%{[key]}", "mappings": {"v": "value"}}], {"key": "x"}, s
    ) == "NONE"


# --- kafka FNV-32a hash partitioner ------------------------------------------

def test_fnv32a_official_vectors(spark):
    """hash/fnv New32a parity: the published FNV-32a test vectors plus
    multibyte UTF-8 against a pure-Python fold."""
    from beats_spark.plans.router import fnv32a

    def py_fnv(b: bytes) -> int:
        h = 2166136261
        for x in b:
            h = ((h ^ x) * 16777619) % (1 << 32)
        return h

    cases = ["", "a", "foobar", "日本語 text", "conv-12345", None]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r.s: r.h for r in df.select("s", fnv32a(df, "s").alias("h")).collect()}
    assert got[""] == 2166136261
    assert got["a"] == 0xE40C292C
    assert got["foobar"] == 0xBF9CF968
    for c in cases:
        if c is not None:
            assert got[c] == py_fnv(c.encode()), c
    assert got[None] is None


def test_fnv32a_fields_int_le_and_partition(spark):
    """HashFieldValue semantics: int64 fields hash as 8 LE bytes
    (binary.Write), strings as UTF-8; Hash2Partition reinterprets the
    hash as SIGNED int32 before masking (partition.go:275-278)."""
    import struct

    from beats_spark.plans.router import fnv32a_fields, kafka_hash_partition

    def py_fnv(b: bytes) -> int:
        h = 2166136261
        for x in b:
            h = ((h ^ x) * 16777619) % (1 << 32)
        return h

    df = spark.createDataFrame(
        [(i, f"user-{i % 7}") for i in range(-5, 50)], "n long, s string"
    )
    rows = df.select(
        "n", "s",
        fnv32a_fields(df, ["n", "s"]).alias("h"),
        kafka_hash_partition(df, ["n", "s"], 12).alias("p"),
    ).collect()
    for r in rows:
        want = py_fnv(struct.pack("<q", r.n) + r.s.encode())
        assert r.h == want, (r.n, r.s)
        signed = want - (1 << 32) if want >= (1 << 31) else want
        assert r.p == ((signed & 0x7FFFFFFF) % 12), (r.n, r.s)
    # consistency: same fields -> same partition (the reference's
    # partTestHashInvariant property)
    again = {(r.n, r.s): r.p for r in df.select(
        "n", "s", kafka_hash_partition(df, ["n", "s"], 12).alias("p")
    ).collect()}
    assert all(again[(r.n, r.s)] == r.p for r in rows)

    import pytest as _pytest
    dff = spark.createDataFrame([(1.5,)], "f double")
    with _pytest.raises(ValueError, match="float"):
        fnv32a_fields(dff, ["f"])

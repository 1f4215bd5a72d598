"""Condition language tests (semantics per libbeat/conditions/*)."""

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.conditions import compile_condition


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "error", "deploy finished", 10.0, "10.1.2.3", None),
        (2, "info", "routine tick", 250.0, "8.8.8.8", "x"),
        (3, "warn", None, 99.9, "192.168.1.9", "y"),
    ]
    return spark.createDataFrame(
        rows, "id int, level string, message string, value double, ip string, opt string"
    )


def ids(df, cond):
    return sorted(r["id"] for r in df.filter(compile_condition(df, cond)).collect())


def test_equals(df):
    assert ids(df, {"equals": {"level": "error"}}) == [1]
    assert ids(df, {"equals": {"id": 2}}) == [2]
    # missing field => false, not error (equals.go: missing field fails)
    assert ids(df, {"equals": {"nosuch": "x"}}) == []


def test_contains_regexp(df):
    assert ids(df, {"contains": {"message": "deploy"}}) == [1]
    assert ids(df, {"regexp": {"message": "^routine"}}) == [2]
    # null value fails the check rather than propagating null
    assert ids(df, {"contains": {"message": "x"}}) == []


def test_range(df):
    assert ids(df, {"range": {"value": {"gte": 99.9, "lt": 260}}}) == [2, 3]
    assert ids(df, {"range": {"value": {"gt": 10}}}) == [2, 3]


def test_has_fields(df):
    assert ids(df, {"has_fields": ["opt"]}) == [2, 3]
    assert ids(df, {"has_fields": ["nosuch"]}) == []


def test_network(df):
    assert ids(df, {"network": {"ip": "10.0.0.0/8"}}) == [1]
    assert ids(df, {"network": {"ip": "private"}}) == [1, 3]
    assert ids(df, {"network": {"ip": "public"}}) == [2]


def test_combinators(df):
    cond = {
        "or": [
            {"equals": {"level": "error"}},
            {"and": [{"range": {"value": {"gt": 200}}}, {"contains": {"message": "tick"}}]},
        ]
    }
    assert ids(df, cond) == [1, 2]
    # not over a null-valued leaf: two-valued, row 3 (null message) included
    assert ids(df, {"not": {"contains": {"message": "deploy"}}}) == [2, 3]


def test_reference_secd_event_cases(spark):
    """Transliterated from the reference's own condition tests
    (libbeat/conditions/conditions_test.go:54-77 secdTestEvent;
    equals_test.go:41-64; has_fields_test.go) — nested struct fields
    accessed by dotted path, typed equality, boolean mismatch."""
    from pyspark.sql import Row

    ev = spark.createDataFrame(
        [
            Row(
                proc=Row(
                    cmdline="/usr/libexec/secd",
                    name="secd",
                    pid=305,
                    ppid=1,
                    state="running",
                    username="monica",
                ),
                type="process",
                final=False,
            )
        ]
    )

    def check(cond):
        return ev.select(compile_condition(ev, cond).alias("c")).first()["c"]

    # equals_test.go:41 single-field positive
    assert check({"equals": {"type": "process"}}) is True
    # equals_test.go:49 boolean negative
    assert check({"equals": {"final": True}}) is False
    # equals_test.go:57 multi-field AND typed
    assert check({"equals": {"type": "process", "proc.pid": 305}}) is True
    assert check({"equals": {"type": "process", "proc.pid": 306}}) is False
    # has_fields_test.go multi-field
    assert check({"has_fields": ["proc.name", "type"]}) is True
    assert check({"has_fields": ["proc.name", "nope"]}) is False
    # contains on nested string (contains_test.go analogues)
    assert check({"contains": {"proc.cmdline": "libexec"}}) is True


def test_reference_combined_condition(spark):
    """conditions_test.go:139 (TestCombinedCondition) over the
    httpResponseTestEvent shape: OR(range(http.code in [100,300)),
    AND(equals status=200, equals type=http)) must hold."""
    from pyspark.sql import Row

    ev = spark.createDataFrame(
        [Row(http=Row(code=200, phrase="OK"), status=200, type="http",
             bytes_in=126, bytes_out=28033, client_ip="127.0.0.1")]
    )
    cond = compile_condition(
        ev,
        {
            "or": [
                {"range": {"http.code": {"gte": 100, "lt": 300}}},
                {"and": [{"equals": {"status": 200}}, {"equals": {"type": "http"}}]},
            ]
        },
    )
    assert ev.select(cond.alias("c")).first()["c"] is True

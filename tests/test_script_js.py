"""script processor: restricted-JavaScript transpile surface.

Semantics cases mirror the reference's JS processor behavior
(libbeat/processors/script/javascript/javascript_test.go and the
event API in beatevent_v0.go) — executed here as compiled Catalyst
expressions, no JS engine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.base import ProcessorConfigError, build_chain


def _run(spark, src, rows=None, schema="id int, name string, n long"):
    rows = rows or [(1, "alpha", 10), (2, "beta", 7)]
    df = spark.createDataFrame(rows, schema)
    return build_chain([{"script": {"lang": "javascript", "source": src}}])(df)


def test_put_literal(spark):
    # javascript_test.go:109 — the canonical hello world
    out = _run(spark, 'function process(event) { event.Put("hello", "world"); }')
    assert {r["hello"] for r in out.collect()} == {"world"}


def test_get_put_sees_earlier_puts(spark):
    src = """function process(event) {
      event.Put("a", event.Get("n") + 1);
      event.Put("b", event.Get("a") * 2);
    }"""
    r = {x["id"]: x for x in _run(spark, src).collect()}
    assert r[1]["a"] == 11 and r[1]["b"] == 22


def test_string_concat_and_methods(spark):
    src = """function process(event) {
      event.Put("s", "v=" + event.Get("n"));
      event.Put("u", event.Get("name").toUpperCase().trim());
      event.Put("has", event.Get("name").includes("lph"));
      event.Put("len", event.Get("name").length);
    }"""
    r = {x["id"]: x for x in _run(spark, src).collect()}
    assert r[1]["s"] == "v=10" and r[1]["u"] == "ALPHA"
    assert r[1]["has"] is True and r[2]["has"] is False
    assert r[1]["len"] == 5


def test_if_else_tag_cancel(spark):
    src = """function process(event) {
      if (event.Get("n") % 2 == 0) { event.Tag("even"); }
      else { event.Put("odd", true); }
      if (event.Get("name") == "beta") { event.Cancel(); }
    }"""
    rows = _run(spark, src).collect()
    assert [r["id"] for r in rows] == [1]
    assert rows[0]["flags"] == ["even"] and rows[0]["odd"] is None


def test_rename_delete_appendto(spark):
    src = """function process(event) {
      event.Rename("name", "title");
      event.Delete("n");
      event.AppendTo("tags", "t1");
      event.AppendTo("tags", "t2");
    }"""
    out = _run(spark, src)
    assert "name" not in out.columns and "n" not in out.columns
    r = out.filter(F.col("id") == 1).first()
    assert r["title"] == "alpha" and r["tags"] == ["t1", "t2"]


def test_var_math_ternary(spark):
    src = """function process(event) {
      var half = event.Get("n") / 2;
      event.Put("h", Math.floor(half));
      event.Put("cls", half > 4 ? "big" : "small");
      event.Put("pi", parseInt("42"));
    }"""
    r = {x["id"]: x for x in _run(spark, src).collect()}
    assert r[1]["h"] == 5 and r[2]["h"] == 3
    assert r[1]["cls"] == "big" and r[2]["cls"] == "small"
    assert r[1]["pi"] == 42


def test_missing_field_reads_null(spark):
    src = 'function process(event) { event.Put("x", event.Get("nope")); }'
    assert _run(spark, src).first()["x"] is None


def test_outside_subset_rejected_at_build(spark):
    df = spark.createDataFrame([(1,)], "id int")
    for bad in [
        "function process(event) { for (var i = 0; i < 3; i++) {} }",
        "function process(event) { event.Put('x', fetch('http://x')); }",
        "function process(event { invalid syntax",  # javascript_test.go:55
        "var x = 1;",  # no process()
    ]:
        with pytest.raises(ProcessorConfigError):
            build_chain([{"script": {"lang": "javascript", "source": bad}}])(df)


def test_when_guard_composes(spark):
    src = 'function process(event) { event.Put("y", 1); }'
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, k string")
    out = build_chain(
        [{"script": {"lang": "javascript", "source": src,
                     "when": {"equals": {"k": "a"}}}}]
    )(df)
    r = {x["id"]: x["y"] for x in out.collect()}
    assert r[1] == 1 and r[2] is None


def test_string_arithmetic_tags_and_continues(spark):
    """Arithmetic on a string-typed field must not ANSI-abort the job:
    JS Number('abc') is NaN; here malformed values yield NULL and the
    row keeps flowing (project tag-and-continue invariant)."""
    src = """function process(event) {
      event.Put("doubled", event.Get("s") * 2);
      event.Put("plus", event.Get("s") - 1);
    }"""
    df = spark.createDataFrame(
        [(1, "21"), (2, "abc"), (3, None)], "id int, s string"
    )
    out = build_chain([{"script": {"lang": "javascript", "source": src}}])(df)
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["doubled"] == 42.0 and r[1]["plus"] == 20.0
    assert r[2]["doubled"] is None and r[2]["plus"] is None
    assert r[3]["doubled"] is None


def test_mixed_string_numeric_comparison_survives_garbage(spark):
    src = """function process(event) {
      if (event.Get("s") > 5) { event.Tag("big"); }
    }"""
    df = spark.createDataFrame(
        [(1, "10"), (2, "oops"), (3, "3")], "id int, s string"
    )
    out = build_chain([{"script": {"lang": "javascript", "source": src}}])(df)
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["flags"] == ["big"]
    assert not r[2]["flags"] and not r[3]["flags"]


def test_null_literal_comparison_is_isnull(spark):
    """`x == null` is THE JS missing-field guard — must compile to
    isNull(), not three-valued equality (which is never true)."""
    src = """function process(event) {
      if (event.Get("f") == null) { event.Put("state", "missing"); }
      else { event.Put("state", "present"); }
      event.Put("have", event.Get("f") != null);
    }"""
    df = spark.createDataFrame([(1, "x"), (2, None)], "id int, f string")
    out = build_chain([{"script": {"lang": "javascript", "source": src}}])(df)
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["state"] == "present" and r[1]["have"] is True
    assert r[2]["state"] == "missing" and r[2]["have"] is False

"""Long-tail processor battery: the registered names without dedicated
tests elsewhere (gzip, mime, timeseries, add_id, extract_array,
add_formatted_index interplay, move_fields prefixing)."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.base import build_chain


def test_decompress_gzip_field(spark):
    payload = gzip.compress("hello pipeline".encode())
    df = spark.createDataFrame([(1, bytearray(payload)), (2, bytearray(b"not gzip"))],
                               "id int, blob binary")
    out = build_chain(
        [{"decompress_gzip_field": {"field": {"from": "blob", "to": "txt"}}}]
    )(df)
    rows = {r.id: r.txt for r in out.collect()}
    assert rows[1] == "hello pipeline"
    assert rows[2] is None


def test_detect_mime_type(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, "<html><body>"), (3, "plain words")],
        "id int, payload string",
    )
    out = build_chain(
        [{"detect_mime_type": {"field": "payload", "target": "mime"}}]
    )(df)
    rows = {r.id: r.mime for r in out.collect()}
    assert rows[1] == "application/json"
    assert rows[2] == "text/html"


def test_timeseries_instance_hash(spark):
    df = spark.createDataFrame(
        [("hostA", "cpu", 1.0), ("hostA", "cpu", 2.0), ("hostB", "cpu", 3.0)],
        "host string, metric string, v double",
    )
    out = build_chain(
        [{"timeseries": {"fields": ["host", "metric"]}}]
    )(df).collect()
    inst = [r["timeseries_instance"] for r in out]
    assert inst[0] == inst[1] != inst[2]


def test_add_id_unique(spark):
    df = spark.range(100)
    out = build_chain([{"add_id": {"target_field": "doc_id"}}])(df)
    vals = [r.doc_id for r in out.collect()]
    assert len(set(vals)) == 100


def test_extract_array(spark):
    df = spark.createDataFrame([([10, 20, 30],)], "arr array<int>")
    out = build_chain(
        [{"extract_array": {"field": "arr", "mappings": {"first": 0, "last": 2}}}]
    )(df).first()
    assert (out.first, out.last) == (10, 30)


def test_move_fields_prefix(spark):
    df = spark.createDataFrame([(1, "x", "y")], "id int, a string, b string")
    out = build_chain(
        [{"move_fields": {"to": "meta", "fields": ["a", "b"]}}]
    )(df)
    assert set(out.columns) >= {"id", "meta_a", "meta_b"}


def test_add_formatted_index_routes_first(spark, transcripts):
    from beats_spark.plans.router import META_SINK, route

    chain = build_chain(
        [{"add_formatted_index": {"index": "fixed-%{[role]}"}}]
    )
    df = chain(transcripts.limit(50))
    routed = route(df, rules=[{"index": "should-not-win"}], default="main")
    sinks = {r[META_SINK] for r in routed.select(META_SINK).distinct().collect()}
    # the stamped raw_index wins over every rule (events/util.go:34-36)
    assert all(s.startswith("fixed-") for s in sinks)

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


def test_detect_mime_type_whatwg_table(spark):
    """The widened signature battery mirrors Go's http.DetectContentType
    table (libbeat/mime/byte.go:48) incl. the positional RIFF-subtype
    and ISO-BMFF ftyp families."""
    cases = [
        (b"\x89PNG\r\n\x1a\n...", "image/png"),
        (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        (b"GIF89a.....", "image/gif"),
        (b"RIFF\x00\x00\x00\x00WAVEfmt", "audio/wave"),
        (b"RIFF\x00\x00\x00\x00WEBPVP8", "image/webp"),
        (b"RIFF\x00\x00\x00\x00AVI LIST", "video/avi"),
        (b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
        (b"\x1f\x8b\x08\x00", "application/gzip"),
        (b"PK\x03\x04", "application/zip"),
        (b"Rar \x1a\x07\x00", "application/x-rar-compressed"),
        (b"%PDF-1.7", "application/pdf"),
        (b"%!PS-Adobe", "application/postscript"),
        (b"OggS\x00", "application/ogg"),
        (b"ID3\x03", "audio/mpeg"),
        (b"MThd\x00", "audio/midi"),
        (b"\x1aE\xdf\xa3webm", "video/webm"),
        (b"wOFF\x00", "font/woff"),
        (b"wOF2\x00", "font/woff2"),
        (b"OTTO\x00", "font/otf"),
        (b"\x00asm\x01", "application/wasm"),
        (b"<?xml version", "text/xml"),
        (b"\xef\xbb\xbfhello", "text/plain; charset=utf-8"),
        (b"\x00\x12\x34\x56", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (b, _) in enumerate(cases)],
        "id int, payload binary",
    )
    out = build_chain(
        [{"detect_mime_type": {"field": "payload", "target": "mime"}}]
    )(df)
    got = {r["id"]: r["mime"] for r in out.collect()}
    for i, (_, expected) in enumerate(cases):
        assert got[i] == expected, (i, got[i], expected)


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


def test_registered_domain_reference_table(spark):
    """Transliterated from registered_domain_test.go:39-49 — the
    non-error rows (our engine ships a compact suffix subset, not the
    full PSL; every case in the reference's own table is covered) and
    the single-label/empty error rows, which must yield null rather
    than error (tag-and-continue on a relational engine)."""
    cases = [
        ("www.google.com", "google.com"),
        ("www.google.co.uk", "google.co.uk"),
        ("www.mail.google.co.uk", "google.co.uk"),
        ("google.com", "google.com"),
        ("www.ak.local", "ak.local"),
        ("www.navy.mil", "navy.mil"),
        ("com", None),
        ("localhost", None),
        ("", None),
    ]
    df = spark.createDataFrame(
        [(i, d) for i, (d, _) in enumerate(cases)], "id int, domain string"
    )
    out = build_chain(
        [{"registered_domain": {"field": "domain", "target_field": "rd"}}]
    )(df)
    got = {r["id"]: r["rd"] for r in out.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_network_direction_reference_table(spark):
    """Transliterated from add_network_direction_test.go:33-50: named
    'private' range, all four directions, and the unparseable/empty
    rows which must yield NO direction."""
    cases = [
        ("1.1.1.1", "8.8.8.8", "external"),
        ("1.1.1.1", "192.168.1.218", "inbound"),
        ("192.168.1.218", "8.8.8.8", "outbound"),
        ("192.168.1.218", "192.168.1.219", "internal"),
        ("", "192.168.1.219", None),
        ("foo", "192.168.1.219", None),
        ("192.168.1.218", "foo", None),
        ("192.168.1.218", "", None),
    ]
    df = spark.createDataFrame(
        [(i, s, d) for i, (s, d, _) in enumerate(cases)],
        "id int, src string, dst string",
    )
    out = build_chain(
        [{"add_network_direction": {"source": "src", "destination": "dst",
                                     "internal_networks": ["private"]}}]
    )(df)
    got = {r["id"]: r["network_direction"] for r in out.collect()}
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == want, (cases[i], got[i])
    # unknown named network is a config error (the 'foo' error row)
    import pytest as _pytest
    from beats_spark.operators.base import ProcessorConfigError
    with _pytest.raises(ProcessorConfigError):
        build_chain(
            [{"add_network_direction": {"source": "src", "destination": "dst",
                                         "internal_networks": ["foo"]}}]
        )(df)

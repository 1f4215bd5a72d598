"""WARC record reader (sources/warc.py): framing, HTTP sub-parse,
member-gzip, truncation tolerance, per-file parallel read."""

from __future__ import annotations

import gzip

from beats_spark.sources.warc import parse_warc_bytes, read_warc

CRLF = b"\r\n"


def _record(
    warc_type: bytes,
    payload: bytes,
    uri: bytes | None = None,
    extra: bytes = b"",
) -> bytes:
    hdr = b"WARC/1.0" + CRLF
    hdr += b"WARC-Type: " + warc_type + CRLF
    if uri is not None:
        hdr += b"WARC-Target-URI: " + uri + CRLF
    hdr += b"WARC-Date: 2026-01-02T03:04:05Z" + CRLF
    hdr += b"WARC-Record-ID: <urn:uuid:" + warc_type + b"-1>" + CRLF
    hdr += extra
    hdr += b"Content-Length: " + str(len(payload)).encode() + CRLF
    return hdr + CRLF + payload + CRLF + CRLF


HTTP_PAYLOAD = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    b"Server: x\r\n\r\n<html>hi\r\n\r\nbody with blank lines</html>"
)

WARC_BLOB = (
    _record(b"warcinfo", b"software: testcrawler", extra=b"Content-Type: application/warc-fields\r\n")
    + _record(b"request", b"GET / HTTP/1.1\r\nHost: e.com\r\n\r\n", uri=b"http://e.com/")
    + _record(b"response", HTTP_PAYLOAD, uri=b"http://e.com/")
)


def test_parse_warc_bytes_frames_and_http():
    recs = parse_warc_bytes(WARC_BLOB)
    assert [r[1] for r in recs] == ["warcinfo", "request", "response"]
    info, req, resp = recs
    assert info[5] == "application/warc-fields"
    assert info[9] == b"software: testcrawler" and info[10] is False
    # request payload starts with an HTTP REQUEST line -> not a response:
    # http fields stay NULL, payload untouched
    assert req[2] == "http://e.com/" and req[7] is None
    assert req[9].startswith(b"GET / ")
    # response: status + content-type split out, payload = body only
    assert resp[7] == 200
    assert resp[8] == "text/html; charset=utf-8"
    assert resp[9] == b"<html>hi\r\n\r\nbody with blank lines</html>"
    assert resp[3] == "2026-01-02T03:04:05Z"
    assert resp[4] == "<urn:uuid:response-1>"
    assert resp[6] == len(HTTP_PAYLOAD)


def test_parse_warc_bytes_member_gzip_and_padding():
    members = b"".join(
        gzip.compress(_record(b"response", HTTP_PAYLOAD, uri=f"http://e.com/{i}".encode()))
        for i in range(3)
    )
    recs = parse_warc_bytes(members)
    assert [r[2] for r in recs] == [f"http://e.com/{i}" for i in range(3)]
    assert all(r[7] == 200 for r in recs)
    # stray padding between plain records is skipped
    padded = WARC_BLOB.replace(CRLF + CRLF + b"WARC/", CRLF + CRLF + b"junk\r\nWARC/")
    assert len(parse_warc_bytes(padded)) == 3


def test_parse_warc_bytes_lf_only_and_truncated():
    lf_rec = (
        b"WARC/1.0\nWARC-Type: metadata\nContent-Length: 4\n\nabcd\n\n"
    )
    recs = parse_warc_bytes(lf_rec)
    assert recs[0][1] == "metadata" and recs[0][9] == b"abcd"
    # payload cut short at EOF -> truncated flag, partial payload kept
    cut = _record(b"response", HTTP_PAYLOAD)[: -(len(CRLF) * 2 + 10)]
    recs = parse_warc_bytes(cut)
    assert recs[0][10] is True and len(recs[0][9]) > 0
    # header block that never terminates
    recs = parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: conversion\r\n")
    assert recs[0][1] == "conversion" and recs[0][10] is True


def test_read_warc_files(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(WARC_BLOB)
    (d / "b.warc.gz").write_bytes(
        gzip.compress(_record(b"response", HTTP_PAYLOAD, uri=b"http://g.com/z"))
    )
    out = read_warc(spark, str(d)).collect()
    assert len(out) == 4
    by_uri = {(r.file.split("/")[-1], r.rec_no): r for r in out}
    a2 = by_uri[("a.warc", 2)]
    assert a2.warc_type == "response" and a2.http_status == 200
    assert bytes(a2.payload) == b"<html>hi\r\n\r\nbody with blank lines</html>"
    b0 = by_uri[("b.warc.gz", 0)]
    assert b0.target_uri == "http://g.com/z" and b0.http_status == 200
    assert not any(r.truncated for r in out)


def test_parse_warc_bytes_roundtrip_property():
    """Serialize random records -> parse -> field-exact round trip.
    Payloads are arbitrary bytes (blank lines, CR/LF runs, gzip magic
    inside payloads) — framing must rely on Content-Length alone."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec_st = st.tuples(
        st.sampled_from([b"response", b"request", b"metadata", b"conversion"]),
        st.binary(min_size=0, max_size=200),
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=40,
        ),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(rec_st, min_size=1, max_size=6))
    def check(recs):
        blob = b"".join(
            _record(t, payload, uri=uri.encode()) for t, payload, uri in recs
        )
        parsed = parse_warc_bytes(blob)
        assert len(parsed) == len(recs)
        for got, (t, payload, uri) in zip(parsed, recs):
            assert got[1] == t.decode()
            assert got[2] == uri
            assert got[6] == len(payload)
            assert got[10] is False
            if not payload.startswith(b"HTTP/"):
                assert got[9] == payload

    check()


def test_parse_http_lf_headers_with_crlf_in_body():
    """Earlier-separator regression: LF-terminated HTTP headers with a
    CRLF blank line later in the body must split at the LF pair."""
    payload = (
        b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n"
        b"bodystart\r\n\r\nbodyend"
    )
    rec = _record(b"response", payload)
    got = parse_warc_bytes(rec)[0]
    assert got[7] == 200 and got[8] == "text/html"
    assert got[9] == b"bodystart\r\n\r\nbodyend"


def test_parse_warc_bytes_negative_content_length_terminates():
    """A negative Content-Length must not walk the cursor backward
    (reproduced: the original code looped forever re-parsing the same
    record once find()'s start clamped to 0) — it is unframeable,
    same treatment as a missing length."""
    from beats_spark.sources.warc import parse_warc_bytes

    blob = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: -1000\r\n\r\n"
        b"some trailing bytes\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nok"
    )
    recs = parse_warc_bytes(blob)
    assert len(recs) == 2
    assert recs[0][-1] is True          # truncated/unframeable flag
    assert recs[0][6] is None           # content_length nulled
    assert recs[1][-2] == b"ok"


def test_parse_warc_bytes_truncated_gzip_tags_not_raises():
    """A gzip archive cut mid-stream must yield the decompressable
    prefix (truncated records and all), not raise EOFError and kill
    the task (reproduced on the original code)."""
    import gzip as _gzip

    from beats_spark.sources.warc import parse_warc_bytes

    body = b"x" * 2000
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    gz = _gzip.compress(rec * 5)
    recs = parse_warc_bytes(gz[: len(gz) // 2])
    assert recs, "prefix records should survive"
    assert recs[-1][-1] in (True, False)  # parse completed, no raise


def test_parse_http_overflow_status_is_not_http():
    from beats_spark.sources.warc import _parse_http

    status, ct, body = _parse_http(b"HTTP/1.1 99999999999 Weird\r\n\r\nx")
    assert status is None and body.startswith(b"HTTP/")

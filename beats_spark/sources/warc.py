"""WARC (ISO 28500) record reader — the crawl corpus front door.

Web-scale training corpora (Common Crawl and its derivatives) arrive
as WARC files: concatenated records, each a ``WARC/1.x`` version line,
CRLF-terminated named headers, a blank line, ``Content-Length`` bytes
of payload (binary-safe — payloads routinely contain blank lines and
arbitrary bytes), and a ``\\r\\n\\r\\n`` trailer. Response records wrap
a full HTTP response (status line + headers + body).

Framing depends on Content-Length byte counts, so no line-splitting
text read can parse it — like the journald export stream
(sources/journald.py), parsing is inherently sequential per file and
parallel ACROSS files, which matches how the format ships (Common
Crawl segments are ~1 GB files in the thousands per crawl; one task
per file saturates any cluster). The usual ``.warc.gz`` layout
gzip-compresses each record as its own member; a GzipFile over the
whole blob reads concatenated members transparently, so both plain
and member-gzip files parse through the same path.

Tolerances (tag-and-continue discipline): LF-only header lines are
accepted; a record whose header block never terminates or whose
payload runs past EOF yields a row flagged ``truncated`` with what
was read; bytes before the first version line or between records
(stray padding) are skipped. The HTTP sub-parse never fails — a
non-HTTP payload just leaves http_status/http_content_type NULL and
``payload`` = the full block payload.

The reference (a log shipper) has no WARC surface; this is an engine
addition for the corpus path. Format per the public ISO 28500 / IIPC
warc-specifications documents.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_SCHEMA = (
    "file string, rec_no bigint, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_type string, "
    "content_length bigint, http_status int, http_content_type string, "
    "payload binary, truncated boolean"
)

# WARC named headers surfaced as columns (lowercased lookup)
_FIELDS = {
    "warc-type": "warc_type",
    "warc-target-uri": "target_uri",
    "warc-date": "warc_date",
    "warc-record-id": "record_id",
    "content-type": "content_type",
}


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header lines → lowercased-name dict (first value wins; WARC
    allows repeats only for fields we don't surface)."""
    out: dict[str, str] = {}
    for raw in block.split(b"\n"):
        line = raw.rstrip(b"\r")
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        key = k.strip().decode("utf-8", "replace").lower()
        if key not in out:
            out[key] = v.strip().decode("utf-8", "replace")
    return out


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response payload → (status, content-type, body); a
    non-HTTP payload returns (None, None, payload) unchanged."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    # whichever blank line comes FIRST ends the headers (same
    # earlier-separator rule as the record framing): LF-terminated
    # headers must not defer to a CRLF pair later inside the body
    head_end = payload.find(b"\r\n\r\n")
    sep_len = 4
    lf = payload.find(b"\n\n")
    if lf != -1 and (head_end == -1 or lf + 1 < head_end):
        head_end, sep_len = lf, 2
    if head_end == -1:
        return None, None, payload
    head = payload[:head_end]
    first_nl = head.find(b"\n")
    status_line = head if first_nl == -1 else head[:first_nl]
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    if not 100 <= status <= 999:
        # out-of-range "status" (e.g. 99999999999) is not HTTP — and
        # would overflow the int32 schema in the Arrow conversion,
        # killing the task instead of tagging the record
        return None, None, payload
    headers = _parse_headers(head[first_nl + 1 :]) if first_nl != -1 else {}
    return status, headers.get("content-type"), payload[head_end + sep_len :]


def parse_warc_bytes(blob: bytes) -> list[tuple]:
    """Sequential binary-safe WARC parse (one file's bytes) →
    list of (rec_no, warc_type, target_uri, warc_date, record_id,
    content_type, content_length, http_status, http_content_type,
    payload, truncated)."""
    if blob[:2] == b"\x1f\x8b":  # member-gzip
        # incremental member-by-member inflate: a truncated or corrupt
        # archive keeps every byte that DID decompress (GzipFile.read
        # raises EOFError/BadGzipFile and surrenders the whole buffer,
        # killing the task for the file — tag-and-continue instead;
        # partial records come out truncated-flagged below)
        import zlib

        buf = bytearray()
        data = blob
        while data:
            d = zlib.decompressobj(47)  # gzip wrapper, max window
            try:
                buf += d.decompress(data)
            except zlib.error:
                break
            if not d.eof:
                break  # input exhausted mid-member: truncated archive
            data = d.unused_data
        blob = bytes(buf)
    recs: list[tuple] = []
    rec_no = 0
    i, n = 0, len(blob)
    while i < n:
        start = blob.find(b"WARC/", i)
        if start == -1:
            break
        # header block ends at the first blank line
        he = blob.find(b"\r\n\r\n", start)
        sep = 4
        he_lf = blob.find(b"\n\n", start)
        if he_lf != -1 and (he == -1 or he_lf + 1 < he):
            he, sep = he_lf, 2
        if he == -1:
            # dangling header block at EOF
            hdr = _parse_headers(blob[start:n])
            recs.append(_row(rec_no, hdr, None, b"", True))
            rec_no += 1
            break
        hdr = _parse_headers(blob[start:he])
        try:
            clen = int(hdr.get("content-length", ""))
        except ValueError:
            clen = None
        # negative lengths would walk the cursor BACKWARD (re-parsing
        # the same record forever once find()'s start clamps to 0) and
        # absurdly large ones overflow the int64 schema — both are
        # unframeable, same treatment as a missing length
        if clen is not None and not 0 <= clen < (1 << 62):
            clen = None
        body_start = he + sep
        if clen is None:
            # unframeable: consume to the next version line
            nxt = blob.find(b"WARC/", body_start)
            payload = blob[body_start : n if nxt == -1 else nxt]
            recs.append(_row(rec_no, hdr, clen, payload, True))
            rec_no += 1
            i = n if nxt == -1 else nxt
            continue
        payload = blob[body_start : body_start + clen]
        truncated = len(payload) < clen
        recs.append(_row(rec_no, hdr, clen, payload, truncated))
        rec_no += 1
        i = body_start + clen
    return recs


def _row(rec_no: int, hdr: dict[str, str], clen, payload: bytes, truncated: bool):
    status, http_ct, body = _parse_http(payload)
    named = [hdr.get(k) for k in _FIELDS]
    return (
        rec_no,
        *named,
        clen,
        status,
        http_ct,
        body if status is not None else payload,
        truncated,
    )


def parse_warc_records(
    df: DataFrame, content_col: str = "content", file_col: str | None = "path"
) -> DataFrame:
    """Binary WARC blobs (one file per row) → one row per record.

    Arrow-batched mapInPandas; parallelism is per input row (= per
    file), the format's natural unit. Works over ``binaryFile`` reads
    and over synthesized binary columns alike.
    """

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        names = [c.split()[0] for c in _SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                blob = bytes(pdf[content_col].iloc[idx])
                fname = (
                    str(pdf[file_col].iloc[idx]) if file_col is not None else ""
                )
                for rec in parse_warc_bytes(blob):
                    rows.append((fname, *rec))
            yield pd.DataFrame(rows, columns=names)

    sel = [content_col] if file_col is None else [file_col, content_col]
    return df.select(*sel).mapInPandas(parse, _SCHEMA)


def read_warc(spark: SparkSession, paths) -> DataFrame:
    """Read WARC / member-gzip WARC files into a record table.

    One sequential parse task per file (binary framing cannot split);
    thousands of crawl-segment files give the cluster its
    parallelism, same contract as the journald binary path.
    """
    if isinstance(paths, str):
        paths = [paths]
    files = spark.read.format("binaryFile").load(list(paths))
    return parse_warc_records(files, "content", "path")

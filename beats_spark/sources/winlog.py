"""Windows Event Log XML-export reader — the file-source half of the
winlog input family.

The reference's winlog input (filebeat/input/winlog/input.go:56-85)
is a cursor-managed reader over the LIVE Windows Event Log API
(winlogbeat/eventlog), publishing one event per record with a
checkpoint (record_number + bookmark, input.go:115-124) as the resume
cursor. That API does not exist off-Windows; what DOES travel is the
export format every Windows shop already ships for offline analysis:
`wevtutil qe Channel /f:xml` / Event Viewer "Save As XML" — a stream
of ``<Event xmlns='…'>…</Event>`` elements (bare concatenation or
wrapped in an ``<Events>`` root; the reference's own golden corpus at
winlogbeat/sys/wineventlog/testdata/*.xml uses the bare form). This
module reads that export shape and feeds the existing golden-verified
``decode_xml_wineventlog`` processor (operators/compat.py), closing
the winlog family with a sandbox-feasible file path.

Framing is JVM-side: one ``regexp_extract_all`` over the file text
pulls every Event span ((?s) non-greedy — Event elements never nest,
so the first ``</Event>`` always closes the record), posexplode
numbers them 1-based per file in document order. ``(file,
record_no)`` is the resume cursor, the lineage analogue of the
reference's EventLogState.RecordNumber — record_no is dense per file,
so a checkpoint replays deterministically (same discipline as
sources/journald.py text mode).

Scale: exports are per-channel, bounded files (the Event Log service
caps channels at configured sizes, typically ≤ a few GB); one task
per file, parallel across files — the same shape as the WARC and
journald readers. A pathological single huge export would go through
the chunked splittable path in sources/lines.py with ``</Event>`` as
the frame terminator; not wired because the format's producers cap
file size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (?s): Event bodies span lines. [ >\t\r\n]: match <Event …> or
# <Event> but never the <Events> wrapper element.
_EVENT_PATTERN = r"(?s)<Event[ >\t\r\n].*?</Event>"


def split_winlog_export(
    df: DataFrame, xml_col: str = "value", file_col: str = "file"
) -> DataFrame:
    """Whole-file XML export text → one row per ``<Event>`` element:
    (``file``, ``record_no`` 1-based dense per file in document
    order, ``event_xml``). Pure codegen — no shuffle, no Python; the
    split rides the file scan."""
    return df.select(
        F.col(file_col).alias("file"),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_EVENT_PATTERN), F.lit(0))
        ).alias("_i", "event_xml"),
    ).select(
        "file", (F.col("_i") + F.lit(1)).alias("record_no"), "event_xml"
    )


def read_winlog_export(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory/glob of winlog XML export files into per-event
    rows. ``wholetext=True`` as a positional-style kwarg — the
    ``.option("wholetext", …)`` form is silently ignored by the text
    source."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )
    return split_winlog_export(raw, "value", "file")


def decode_winlog(df: DataFrame, xml_col: str = "event_xml") -> DataFrame:
    """Apply the golden-verified ``decode_xml_wineventlog`` processor
    (operators/compat.py) to the framed events — the composition the
    reference performs inside Record.ToEvent()."""
    from beats_spark.operators.base import build_chain

    return build_chain([{"decode_xml_wineventlog": {"field": xml_col}}])(df)

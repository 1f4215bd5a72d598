"""winlog XML-export file source (sources/winlog.py): framing over
the reference's own golden corpus
(/root/reference/winlogbeat/sys/wineventlog/testdata/*.xml — test
DATA, not code) + composition with the golden-verified
decode_xml_wineventlog processor."""

from __future__ import annotations

import glob
import re

from beats_spark.sources.winlog import (
    decode_winlog,
    read_winlog_export,
    split_winlog_export,
)

_GOLDEN = "/root/reference/winlogbeat/sys/wineventlog/testdata"


def test_read_reference_golden_corpus(spark):
    out = read_winlog_export(spark, f"{_GOLDEN}/*.xml")
    rows = out.collect()
    # ground truth: count Event open tags across the corpus ourselves
    expected = sum(
        len(re.findall(r"<Event[ >]", open(p).read()))
        for p in glob.glob(f"{_GOLDEN}/*.xml")
    )
    assert len(rows) == expected == 49
    # record_no is dense 1-based per file in document order
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file, []).append(r.record_no)
    for nos in by_file.values():
        assert sorted(nos) == list(range(1, len(nos) + 1))
    assert max(len(v) for v in by_file.values()) == 32  # sysmon-9.01
    # every framed span is a complete element
    assert all(
        r.event_xml.startswith("<Event ") and r.event_xml.endswith("</Event>")
        for r in rows
    )


def test_split_handles_events_root_wrapper(spark):
    # Event Viewer "Save As XML" wraps in <Events>; wevtutil does not —
    # both frame identically and the wrapper never matches <Event[ >]
    doc = (
        "<?xml version='1.0'?><Events>"
        "<Event xmlns='x'><System><EventRecordID>1</EventRecordID></System></Event>\n"
        "<Event xmlns='x'><System><EventRecordID>2</EventRecordID></System></Event>"
        "</Events>"
    )
    df = spark.createDataFrame([("f1", doc)], "file string, value string")
    rows = split_winlog_export(df, "value", "file").collect()
    assert [(r.record_no, "EventRecordID>%d" % r.record_no in r.event_xml) for r in rows] == [
        (1, True),
        (2, True),
    ]


def test_decode_composition_ec1(spark):
    out = decode_winlog(read_winlog_export(spark, f"{_GOLDEN}/ec1.xml"))
    r = out.collect()[0]
    assert r.winlog_provider_name == "EventCreate"
    assert r.event_code == "1000"
    assert r.winlog_record_id == 316
    assert r.winlog_computer_name == "vagrant"
    assert r.winlog_channel == "Application"
    assert r.winlog_level == "error"  # System.Level 2 → error
    assert "flags" in out.columns  # tag-and-continue discipline intact


def test_multiline_pretty_printed_event(spark):
    # (?s) framing: pretty-printed exports put each element on its own
    # line; the non-greedy span still closes at the first </Event>
    doc = (
        "<Event xmlns='x'>\n  <System>\n    <EventRecordID>7</EventRecordID>\n"
        "  </System>\n</Event>\n"
        "<Event xmlns='x'><System><EventRecordID>8</EventRecordID></System></Event>"
    )
    df = spark.createDataFrame([("f", doc)], "file string, value string")
    rows = split_winlog_export(df, "value", "file").orderBy("record_no").collect()
    assert len(rows) == 2
    assert "EventRecordID>7" in rows[0].event_xml
    assert "EventRecordID>8" in rows[1].event_xml


def test_run_py_winlog_input_end_to_end(spark, tmp_path):
    """The spark-submit surface ports the winlog family: XML-export
    dir → framing → decode_xml_wineventlog → route on winlog_level →
    fan-out sinks, via run.py's main(). Expected counts derive from
    the library path over the same golden corpus, so the test pins
    the CLI wiring, not the decoder (golden-pinned elsewhere)."""
    import json

    from pyspark.sql import functions as F

    import run as run_mod

    expected_err = (
        decode_winlog(read_winlog_export(spark, f"{_GOLDEN}/*.xml"))
        .filter(F.col("winlog_level") == "error")
        .count()
    )
    assert expected_err > 0
    cfg = tmp_path / "job.yml"
    cfg.write_text(
        f"""
input:
  type: winlog
  path: {_GOLDEN}/*.xml
router_rules:
  - when: {{equals: {{winlog_level: error}}}}
    index: errors
default_sink: main
key_field: file
n_buckets: 4
"""
    )
    metrics_out = tmp_path / "metrics.json"
    rc = run_mod.main(
        [
            "--config", str(cfg),
            "--out-root", str(tmp_path / "sinks"),
            "--metrics-out", str(metrics_out),
        ]
    )
    assert rc == 0
    payload = json.loads(metrics_out.read_text())
    assert payload["sink_counts"]["errors"] == expected_err
    assert sum(payload["sink_counts"].values()) == 49

"""Reference-name compat processors + community_id spec parity."""

from __future__ import annotations

import base64
import hashlib
import socket
import struct

from pyspark.sql import functions as F

from beats_spark.operators.base import build_chain


def py_community_id_v1(sip, dip, sp, dp, proto, seed=0):
    """Independent oracle: the public Community ID v1 spec."""
    a = socket.inet_aton(sip) + struct.pack(">H", sp)
    b = socket.inet_aton(dip) + struct.pack(">H", dp)
    if a > b:
        sip, dip, sp, dp = dip, sip, dp, sp
    material = (
        struct.pack(">H", seed)
        + socket.inet_aton(sip)
        + socket.inet_aton(dip)
        + struct.pack("BB", proto, 0)
        + struct.pack(">HH", sp, dp)
    )
    return "1:" + base64.b64encode(hashlib.sha1(material).digest()).decode()


def test_community_id_matches_spec(spark):
    rows = [
        ("128.232.110.120", "66.35.250.204", 34855, 80, "tcp"),
        ("66.35.250.204", "128.232.110.120", 80, 34855, "tcp"),  # reversed flow
        ("10.0.0.1", "10.0.0.2", 1234, 53, "udp"),
        ("192.168.1.1", "8.8.8.8", 40000, 443, "6"),  # numeric proto
    ]
    df = spark.createDataFrame(
        rows,
        "source_ip string, destination_ip string, source_port int, "
        "destination_port int, transport_protocol string",
    )
    out = build_chain([{"community_id": {}}])(df).collect()
    protos = {"tcp": 6, "udp": 17, "6": 6}
    for r in out:
        expect = py_community_id_v1(
            r.source_ip,
            r.destination_ip,
            r.source_port,
            r.destination_port,
            protos[r.transport_protocol],
        )
        assert r.community_id == expect
    # flow symmetry: both directions hash identically
    assert out[0].community_id == out[1].community_id


def test_cache_dns_translate_aliases(spark):
    df = spark.createDataFrame(
        [("10.0.0.1", "S-1-5-18")], "ip string, sid string"
    )
    chain = build_chain(
        [
            {"cache": {"get": {"key_field": "ip", "target_field": "host"},
                        "mapping": {"10.0.0.1": "db-1"}, "default": "unknown"}},
            {"dns": {"fields": {"ip": "rdns"}, "mapping": {"10.0.0.1": "db-1.internal"}}},
            {"translate_sid": {"field": "sid", "mapping": {"S-1-5-18": "SYSTEM"}}},
        ]
    )
    r = chain(df).first()
    assert (r.host, r.rdns, r.account_name) == ("db-1", "db-1.internal", "SYSTEM")


def test_script_sql_and_data_stream(spark):
    df = spark.createDataFrame([(10.0, 2.0)], "distance double, time double")
    chain = build_chain(
        [
            {"script": {"lang": "sql", "columns": {"speed": "distance / time"}}},
            {"add_data_stream": {"type": "logs", "dataset": "agent", "namespace": "prod"}},
        ]
    )
    r = chain(df).first()
    assert r.speed == 5.0
    assert r.data_stream == "logs-agent-prod"


def test_decode_xml(spark):
    df = spark.createDataFrame(
        [(1, "<e><a>x</a><b>y</b></e>"), (2, "<broken"), (3, None)],
        "id int, xml string",
    )
    out = build_chain([{"decode_xml": {"field": "xml", "target": "doc"}}])(df)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].doc == {"a": "x", "b": "y"}
    assert rows[2].doc is None and "decode_xml_error" in rows[2].flags
    assert rows[3].doc is None and not (rows[3].flags or [])


def test_decode_xml_nested_schema(spark):
    """Schema form: nested typed decode, JVM-side, corrupt rows tag."""
    df = spark.createDataFrame(
        [
            (1, "<ev><t>click</t><u><id>7</id></u></ev>"),
            (2, "<ev><t>busted"),
            (3, None),
        ],
        "id int, xml string",
    )
    out = build_chain(
        [{"decode_xml": {"field": "xml", "target": "x",
                         "schema": "t STRING, u STRUCT<id: BIGINT>"}}]
    )(df)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].x_t == "click" and rows[1].x_u.id == 7 and rows[1].flags is None
    assert rows[2].x_t is None and "decode_xml_error" in rows[2].flags
    assert rows[3].flags is None  # null input is not a failure


def test_now_fixed_and_locale_and_host_meta(spark):
    df = spark.createDataFrame([(1,)], "id int")
    chain = build_chain(
        [
            {"now": {"fixed": "2026-01-01 00:00:00"}},
            {"add_locale": {}},
            {"add_host_metadata": {"fields": {"name": "worker-1", "os": "linux"}}},
        ]
    )
    r = chain(df).first()
    assert str(r.now) == "2026-01-01 00:00:00"
    assert r.event_timezone == "UTC"
    assert (r.host_name, r.host_os) == ("worker-1", "linux")


def test_community_id_matches_reference_goldens(spark):
    """Parity against the reference's OWN golden flowhash outputs
    (libbeat/common/flowhash/testdata/golden/*.pcap.log:
    `ts | community_id | src dst proto sport dport`)."""
    import os

    golden_dir = "/root/reference/libbeat/common/flowhash/testdata/golden"
    if not os.path.isdir(golden_dir):
        import pytest as _pytest

        _pytest.skip("reference goldens unavailable")
    cases = []
    for fn in ["tcp.pcap.log", "udp.pcap.log", "sctp.pcap.log"]:
        with open(os.path.join(golden_dir, fn)) as f:
            for line in f:
                parts = [p.strip() for p in line.strip().split("|")]
                if len(parts) != 3 or not parts[1].startswith("1:"):
                    continue
                src, dst, proto, sp, dp = parts[2].split()
                if ":" in src:  # IPv4 only (documented limitation)
                    continue
                cases.append((src, dst, int(sp), int(dp), proto, parts[1]))
    cases = list({c for c in cases})
    assert len(cases) >= 3
    df = spark.createDataFrame(
        [c[:5] for c in cases],
        "source_ip string, destination_ip string, source_port int, "
        "destination_port int, transport_protocol string",
    )
    got = build_chain([{"community_id": {}}])(df).collect()
    expected = {c[:5]: c[5] for c in cases}
    for r in got:
        key = (r.source_ip, r.destination_ip, r.source_port, r.destination_port,
               r.transport_protocol)
        assert r.community_id == expected[key], key


def test_decode_xml_wineventlog_reference_golden(spark):
    """Parity against the reference's OWN test event: testMessage from
    decode_xml_wineventlog/processor_test.go:32-41 is loaded in place
    (Go string-literal concatenation parsed), and the assertions mirror
    testMessageOutput (processor_test.go:44-96)."""
    import os
    import re

    src_path = (
        "/root/reference/libbeat/processors/decode_xml_wineventlog/processor_test.go"
    )
    if not os.path.exists(src_path):
        pytest.skip("reference not available")
    go = open(src_path).read()
    block = go.split("var testMessage = ", 1)[1]
    block = block.split("\nvar ", 1)[0]
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', block)
    xml = "".join(parts).encode().decode("unicode_escape")
    assert xml.startswith("<Event") and xml.endswith("</Event>")

    df = spark.createDataFrame([(1, xml)], "id int, message string")
    out = build_chain([{"decode_xml_wineventlog": {}}])(df)
    r = out.first()
    # winlog.* (testMessageOutput, processor_test.go:57-92)
    assert r["winlog_provider_name"] == "Microsoft-Windows-Security-Auditing"
    assert r["winlog_provider_guid"] == "{54849625-5478-4994-a5ba-3e3b0328c30d}"
    assert r["winlog_event_id"] == "4672"
    assert r["winlog_record_id"] == 11303
    assert r["winlog_computer_name"] == "vagrant"
    assert r["winlog_channel"] == "Security"
    assert r["winlog_level"] == "information"
    assert r["winlog_outcome"] == "success"
    assert r["winlog_opcode"] == "Info"
    assert r["winlog_task"] == "Special Logon"
    assert r["winlog_activity_id"] == "{ffb23523-1f32-0000-c335-b2ff321fd701}"
    assert r["winlog_process_pid"] == 652
    assert r["winlog_process_thread_id"] == 4660
    assert r["winlog_keywords"] == ["Audit Success"]
    assert r["winlog_event_data"]["SubjectUserName"] == "SYSTEM"
    assert r["winlog_event_data"]["SubjectUserSid"] == "S-1-5-18"
    assert r["winlog_event_data"]["SubjectLogonId"] == "0x3e7"
    assert r["winlog_message"].startswith("Special privileges assigned")
    assert str(r["winlog_time_created"]).startswith("2021-03-23 09:56:13.137310")
    # ECS projections (event.*/log.*/host.*)
    assert r["event_code"] == "4672" and r["event_kind"] == "event"
    assert r["event_action"] == "Special Logon" and r["event_outcome"] == "success"
    assert r["event_provider"] == "Microsoft-Windows-Security-Auditing"
    assert r["log_level"] == "information" and r["host_name"] == "vagrant"

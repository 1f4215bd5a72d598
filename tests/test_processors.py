"""Per-processor unit tests, modeled on the reference's table-driven
per-package Go tests (SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from beats_spark.operators import ProcessorConfigError, build_chain, make_processor


@pytest.fixture()
def df(spark):
    rows = [
        (1, "alice", "42", "h=1h30m", '{"k": 7, "name": "n7"}', "a,b;c", "aGVsbG8=", "2026-02-01T10:00:00Z"),
        (2, "bob", "notanint", "h=150ms", "not json", "x,y", "%%%bad", "bad-ts"),
    ]
    return spark.createDataFrame(
        rows,
        "id int, user string, num string, dur string, props string, csvline string, b64 string, when_str string",
    )


def one(df, cfg):
    return build_chain([cfg])(df)


def test_add_fields_root_and_target(df):
    out = one(df, {"add_fields": {"target": "", "fields": {"env": "prod", "nested": {"a": 1}}}})
    row = out.first()
    assert row["env"] == "prod" and row["nested_a"] == 1
    out2 = one(df, {"add_fields": {"fields": {"x": "y"}}})  # default target "fields"
    assert out2.first()["fields_x"] == "y"


def test_rename_and_guards(df):
    out = one(df, {"rename": {"fields": [{"from": "user", "to": "username"}]}})
    assert "user" not in out.columns and out.first()["username"] == "alice"
    with pytest.raises(ProcessorConfigError):
        one(df, {"rename": {"fields": [{"from": "user", "to": "id"}]}})  # target exists
    with pytest.raises(ProcessorConfigError):
        one(df, {"rename": {"fields": [{"from": "ghost", "to": "g2"}]}})  # missing source
    out2 = one(df, {"rename": {"fields": [{"from": "ghost", "to": "g2"}], "ignore_missing": True}})
    assert out2.columns == df.columns


def test_copy_move_drop_include(df):
    out = one(df, {"copy_fields": {"fields": [{"from": "user", "to": "user2"}]}})
    assert out.first()["user2"] == "alice"
    with pytest.raises(ProcessorConfigError):
        one(df, {"copy_fields": {"fields": [{"from": "user", "to": "id"}]}})
    out = one(df, {"move_fields": {"fields": ["user", "num"], "to": "payload"}})
    assert "payload_user" in out.columns and "user" not in out.columns
    out = one(df, {"drop_fields": {"fields": ["num", "dur"]}})
    assert "num" not in out.columns
    out = one(df, {"include_fields": {"fields": ["id", "user"]}})
    assert out.columns == ["id", "user"]


def test_convert_tags_failures(df):
    out = one(df, {"convert": {"fields": [{"from": "num", "to": "num_i", "type": "integer"}]}})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["num_i"] == 42 and rows[1]["flags"] is None
    assert rows[2]["num_i"] is None and "convert_error" in rows[2]["flags"]


def test_convert_rename_mode(df):
    out = one(df, {"convert": {"fields": [{"from": "num", "to": "n2", "type": "long"}], "mode": "rename"}})
    assert "num" not in out.columns and out.first()["n2"] == 42


def test_timestamp_battery(df):
    out = one(
        df,
        {"timestamp": {"field": "when_str", "target_field": "when_ts",
                        "layouts": ["yyyy-MM-dd'T'HH:mm:ss'Z'", "yyyy-MM-dd"]}},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["when_ts"] is not None and rows[1]["flags"] is None
    assert rows[2]["when_ts"] is None and "timestamp_parse_error" in rows[2]["flags"]


def test_truncate_bytes_vs_chars(spark):
    """truncate_fields_test.go:41-120: max_bytes is a true UTF-8 byte
    slice (multibyte 'ez jó' = 5 chars / 6 bytes survives max_bytes=6),
    max_characters counts codepoints; too-long values flag truncated."""
    d = spark.createDataFrame(
        [(1, "too long line"), (2, "ez jó")], "id int, message string"
    )
    r = {x["id"]: x for x in build_chain(
        [{"truncate_fields": {"fields": ["message"], "max_bytes": 3}}]
    )(d).collect()}
    assert r[1]["message"] == "too" and "truncated" in r[1]["flags"]
    r = {x["id"]: x for x in build_chain(
        [{"truncate_fields": {"fields": ["message"], "max_bytes": 6}}]
    )(d).collect()}
    assert r[2]["message"] == "ez jó" and r[2]["flags"] is None
    r = {x["id"]: x for x in build_chain(
        [{"truncate_fields": {"fields": ["message"], "max_characters": 5}}]
    )(d).collect()}
    assert r[2]["message"] == "ez jó" and r[2]["flags"] is None


def test_convert_ip_validation(spark):
    """Reference convert type=ip validates (net.ParseIP, convert.go:347):
    unparseable addresses null + tag convert_error; v4 and v6 pass."""
    d = spark.createDataFrame(
        [(1, "192.168.0.1"), (2, "2001:db8::1"), (3, "not-an-ip"),
         (4, "300.1.1.1"), (5, "::1")],
        "id int, addr string",
    )
    out = build_chain(
        [{"convert": {"fields": [{"from": "addr", "to": "ip", "type": "ip"}]}}]
    )(d)
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["ip"] == "192.168.0.1" and r[1]["flags"] is None
    assert r[2]["ip"] == "2001:db8::1" and r[2]["flags"] is None
    assert r[5]["ip"] == "::1"
    assert r[3]["ip"] is None and "convert_error" in r[3]["flags"]
    assert r[4]["ip"] is None and "convert_error" in r[4]["flags"]


def test_convert_ip_v6_with_v4_tail(spark):
    """net.ParseIP accepts IPv6 with an embedded dotted-quad tail
    (::ffff:192.0.2.1, 64:ff9b::1.2.3.4, uncompressed 6-hextet form);
    out-of-range quads still fail."""
    d = spark.createDataFrame(
        [(1, "::ffff:192.0.2.1"), (2, "64:ff9b::1.2.3.4"),
         (3, "0:0:0:0:0:ffff:1.2.3.4"), (4, "::192.0.2.200"),
         (5, "::ffff:300.1.1.1"), (6, "1:2:3:4:5::6.7.8.9")],
        "id int, addr string",
    )
    out = build_chain(
        [{"convert": {"fields": [{"from": "addr", "to": "ip", "type": "ip"}]}}]
    )(d)
    r = {x["id"]: x for x in out.collect()}
    for ok in (1, 2, 3, 4, 6):
        assert r[ok]["ip"] == r[ok]["addr"] and r[ok]["flags"] is None, ok
    assert r[5]["ip"] is None and "convert_error" in r[5]["flags"]


def test_convert_ip_full_parseip_parity(spark):
    """ip_parse_valid must agree with an independent full IP parser
    (Python ipaddress, which matches net.ParseIP on every form below:
    strict quads without leading zeros since Go 1.17, complete IPv6
    incl. all embedded-v4-tail placements, no zone suffixes). Battery
    = reference convert_test.go cases (x / 365.0.0.0 / 0.0.0.0 / ::1)
    + hand-picked edges + a combinatorial sweep of compression
    positions with and without v4 tails."""
    import ipaddress

    from beats_spark.functions.conditions import ip_parse_valid

    cands = [
        # reference convert_test.go:412-416
        "x", "365.0.0.0", "0.0.0.0", "::1",
        # v4 edges
        "255.255.255.255", "256.1.1.1", "1.2.3.4", "01.2.3.4",
        "1.2.3.04", "1.2.3", "1.2.3.4.5", "1.2.3.4 ", " 1.2.3.4",
        "10.0.0.1", "192.168.001.1", "",
        # v6 edges
        "::", ":::", "1::", "::2", "1::2", "1:2:3:4:5:6:7:8",
        "1:2:3:4:5:6:7:8:9", "1:2:3:4:5:6:7::", "1:2:3:4:5:6:7:8::",
        "12345::", "g::1", "fe80::1%eth0", "1::2::3",
        # v4 tails at every compression position (the round-3 gap)
        "1::2:3.4.5.6", "::2:3.4.5.6", "1:2::3:4.5.6.7",
        "1:2:3::4:5.6.7.8", "1:2:3:4::5:6.7.8.9",
        "1:2:3:4:5::6.7.8.9", "::1.2.3.4", "::ffff:1.2.3.4",
        "::ffff:0:1.2.3.4", "64:ff9b::1.2.3.4",
        "1:2:3:4:5:6:1.2.3.4", "1:2:3:4:5:6:7:1.2.3.4",
        "1:2:3:4:5::6:7.8.9.10", "1::2:3:4:5:6.7.8.9",
        "::1.2.3.400", "::1.2.3.04", "1::1.2.3",
        "1:2:3:4::5:6:7.8.9.10",
    ]
    # sweep: k left hextets + '::' + m right hextets + optional v4
    for k in range(0, 7):
        for m in range(0, 7):
            left = ":".join(["a"] * k)
            right = ":".join(["b"] * m)
            cands.append(f"{left}::{right}")
            cands.append(f"{left}::{right}{':' if m else ''}9.9.9.9")

    def py_ok(s: str) -> bool:
        # the one known divergence: Python 3.9+ accepts "%zone"
        # suffixes on IPv6; net.ParseIP (the semantics under test)
        # does not — normalize to the Go behavior.
        if "%" in s:
            return False
        try:
            ipaddress.ip_address(s)
            return True
        except ValueError:
            return False

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cands)],
                               "i int, addr string")
    got = {
        r["i"]: r["ok"]
        for r in df.select("i", ip_parse_valid(F.col("addr")).alias("ok")).collect()
    }
    bad = [
        (cands[i], got[i], py_ok(cands[i]))
        for i in range(len(cands))
        if got[i] != py_ok(cands[i])
    ]
    assert not bad, bad


def test_timestamp_timezone_shift(spark):
    """timezone config: naive inputs interpreted in that zone → UTC
    (the reference's IANA-timezone parse option, timestamp config.go)."""
    d = spark.createDataFrame([(1, "2024-06-01 12:00:00")], "id int, t string")
    out = build_chain(
        [{"timestamp": {"field": "t", "target_field": "ts",
                         "layouts": ["yyyy-MM-dd HH:mm:ss"],
                         "timezone": "America/New_York"}}]
    )(d)
    got = out.first()["ts"]
    # noon EDT (UTC-4 in June) == 16:00 UTC; session tz is UTC
    assert got.hour == 16 and got.day == 1


def test_decode_json_fields(df):
    out = one(df, {"decode_json_fields": {"fields": ["props"], "target": "p",
                                            "schema": "k INT, name STRING", "add_error_key": True}})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["p_k"] == 7 and rows[1]["p_name"] == "n7"
    assert rows[2]["p_k"] is None and "_jsonparsefailure" in rows[2]["flags"]


def test_decode_json_ndjson_parser_options(spark):
    """ndjson parser config surface (readjson/json_config.go:20-30):
    message_key rewrites `message`, document_id moves the key into
    _meta_id, expand_keys flattens dotted keys in the overflow map."""
    d = spark.createDataFrame(
        [
            (1, '{"msg": "hello", "doc": "id-1", "a.b": "x", "a_b": "first", "n": 2}'),
            (2, '{"n": "3"}'),
            (3, "not json"),
        ],
        "id int, line string",
    )
    out = one(
        d,
        {"decode_json_fields": {
            "fields": ["line"], "target": "j",
            "message_key": "msg", "document_id": "doc",
            "expand_keys": True, "add_error_key": True,
        }},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["message"] == "hello"
    assert rows[1]["_meta_id"] == "id-1"
    m = rows[1]["j"]
    assert "doc" not in m  # moved to _meta_id (json.go:183)
    # 'a.b' normalizes to 'a_b' and, colliding with the literal
    # 'a_b' key, the first document-order occurrence wins ('a.b')
    assert m["a_b"] == "x" and "a.b" not in m
    # missing message_key → empty message + error flag (json.go:88-92)
    assert rows[2]["message"] == "" and "_jsonparsefailure" in rows[2]["flags"]
    assert rows[3]["message"] == "" and "_jsonparsefailure" in rows[3]["flags"]

    # schema mode: document_id leaves the projected columns
    out2 = one(
        d,
        {"decode_json_fields": {
            "fields": ["line"], "target": "p",
            "schema": "msg STRING, doc STRING, n INT",
            "message_key": "msg", "document_id": "doc",
        }},
    )
    r1 = {r["id"]: r for r in out2.collect()}[1]
    assert r1["message"] == "hello" and r1["_meta_id"] == "id-1"
    assert "p_doc" not in out2.columns and r1["p_n"] == 2


def test_decode_csv_and_extract(df):
    out = one(df, {"decode_csv_fields": {"fields": {"csvline": "csv_arr"}, "separator": ","}})
    assert out.first()["csv_arr"] == ["a", "b;c"]
    out2 = build_chain([
        {"decode_csv_fields": {"fields": {"csvline": "csv_arr"}}},
        {"extract_array": {"field": "csv_arr", "mappings": {"first": 0, "second": 1}}},
    ])(df)
    assert out2.first()["second"] == "b;c"
    out3 = one(df, {"extract_field": {"field": "csvline", "separator": ",", "index": 0, "target": "head"}})
    assert out3.first()["head"] == "a"


def test_base64_and_duration(df):
    out = one(df, {"decode_base64_field": {"field": {"from": "b64", "to": "plain"}}})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["plain"] == "hello"
    assert rows[2]["plain"] is None and "decode_base64_error" in rows[2]["flags"]

    out = build_chain([
        {"extract_field": {"field": "dur", "separator": "=", "index": 1, "target": "d"}},
        {"decode_duration": {"field": "d", "format": "seconds", "target_field": "d_s"}},
    ])(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["d_s"] == pytest.approx(5400.0)
    assert rows[2]["d_s"] == pytest.approx(0.150)


def test_truncate_replace_case_append(df):
    out = one(df, {"truncate_fields": {"fields": ["user"], "max_characters": 3}})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["user"] == "ali" and "truncated" in rows[1]["flags"]
    assert rows[2]["user"] == "bob" and rows[2]["flags"] is None

    out = one(df, {"replace": {"fields": [{"field": "user", "pattern": "a", "replacement": "@"}]}})
    assert out.first()["user"] == "@lice"

    out = one(df, {"uppercase": {"values": ["user"]}})
    assert out.first()["user"] == "ALICE"

    out = one(df, {"append": {"target_field": "tags", "values": ["t1", "t2", "t1"],
                                "allow_duplicate": False}})
    assert out.first()["tags"] == ["t1", "t2"]

    out = one(df, {"add_tags": {"tags": ["x", "y"]}})
    assert out.first()["tags"] == ["x", "y"]


def test_when_guard(df):
    out = one(df, {"uppercase": {"values": ["user"], "when": {"equals": {"id": 1}}}})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["user"] == "ALICE" and rows[2]["user"] == "bob"


def test_drop_event_and_if(df):
    out = one(df, {"drop_event": {"when": {"equals": {"user": "bob"}}}})
    assert [r["id"] for r in out.collect()] == [1]

    out = one(df, {"if": {"equals": {"user": "alice"}},
                    "then": [{"add_fields": {"target": "", "fields": {"kind": "a"}}}],
                    "else": [{"add_fields": {"target": "", "fields": {"kind": "b"}}}]})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["kind"] == "a" and rows[2]["kind"] == "b"


def test_fingerprint_known_value(df, spark):
    import hashlib

    out = one(df, {"fingerprint": {"fields": ["user", "id"], "method": "sha256"}})
    row = out.filter(F.col("id") == 1).first()
    expected = hashlib.sha256(b"|id|1|user|alice|").hexdigest()
    assert row["fingerprint"] == expected


def test_enrich_lookup_map_and_table(df, spark):
    cfg = {"key_field": "user", "target_field": "team",
           "mapping": {"alice": "eng"}, "default": "unknown"}
    out = one(df, {"enrich_lookup": cfg})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["team"] == "eng" and rows[2]["team"] == "unknown"
    # big-table path (forced broadcast join)
    cfg2 = dict(cfg)
    cfg2["table"] = spark.createDataFrame([("alice", "eng")], "key string, value string")
    del cfg2["mapping"]
    out2 = one(df, {"enrich_lookup": cfg2})
    rows2 = {r["id"]: r for r in out2.collect()}
    assert rows2[1]["team"] == "eng" and rows2[2]["team"] == "unknown"


def test_syslog_rfc3164(spark):
    df = spark.createDataFrame(
        [("<34>Oct 11 22:14:15 host1 sshd[815]: Failed password",),
         ("not syslog at all",)],
        "message string",
    )
    out = build_chain([{"syslog": {"field": "message"}}])(df)
    rows = out.collect()
    assert rows[0]["log_syslog_severity"] == 2 and rows[0]["log_syslog_facility"] == 4
    assert rows[0]["hostname"] == "host1" and rows[0]["program"] == "sshd"
    assert rows[0]["syslog_message"] == "Failed password"
    assert "syslog_parse_error" in rows[1]["flags"]


def test_registered_domain_and_network_direction(spark):
    df = spark.createDataFrame(
        [("a.b.example.co.uk", "10.0.0.1", "8.8.8.8"), ("www.example.com", "1.2.3.4", "10.9.9.9")],
        "domain string, source_ip string, destination_ip string",
    )
    out = build_chain([
        {"registered_domain": {"field": "domain"}},
        {"add_network_direction": {"internal_networks": ["10.0.0.0/8"]}},
    ])(df)
    rows = out.collect()
    assert rows[0]["registered_domain"] == "example.co.uk"
    assert rows[1]["registered_domain"] == "example.com"
    assert rows[0]["network_direction"] == "outbound"
    assert rows[1]["network_direction"] == "inbound"


def test_unknown_processor_rejected():
    with pytest.raises(ProcessorConfigError):
        make_processor({"frobnicate": {}})


def test_drop_fields_protects_timestamp(spark):
    from beats_spark.operators.base import build_chain

    df = spark.createDataFrame(
        [(1, "x")], "id int, note string"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["f"]).current_timestamp())
    out = build_chain([{"drop_fields": {"fields": ["ts", "note"]}}])(df)
    assert "ts" in out.columns and "note" not in out.columns


def test_syslog_rfc5424_and_auto(spark):
    from beats_spark.operators.base import build_chain

    lines = [
        (1, '<165>1 2026-08-17T05:14:15.000Z web01 evtd 123 ID47 - An application event'),
        (2, "<34>Jan  7 03:14:15 host1 app[42]: legacy line"),
        (3, "not syslog at all"),
    ]
    df = spark.createDataFrame(lines, "id int, line string")
    out = build_chain([{"syslog": {"field": "line", "format": "auto"}}])(df)
    rows = {r.id: r for r in out.collect()}
    r1 = rows[1]
    assert (r1.log_syslog_priority, r1.log_syslog_facility, r1.log_syslog_severity) == (165, 20, 5)
    assert r1.hostname == "web01" and r1.program == "evtd"
    assert r1.syslog_message == "An application event"
    r2 = rows[2]
    assert r2.log_syslog_priority == 34 and r2.hostname == "host1" and r2.program == "app"
    r3 = rows[3]
    assert r3.log_syslog_priority is None
    assert "syslog_parse_error" in (r3.flags or [])

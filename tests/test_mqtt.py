"""MQTT 3.1.1 input against a REAL in-process broker thread — every
byte crosses a localhost TCP socket (the netsinks discipline): the
tests gate CONNECT/CONNACK/SUBSCRIBE/SUBACK wire format, QoS 0/1/2
ack flows, and the reference's event field mapping
(filebeat/input/mqtt/input.go:113-132) — plus the §4.7 topic-filter
matcher against the spec's own examples."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from beats_spark.sources.mqtt import (
    CONNACK,
    CONNECT,
    DISCONNECT,
    PUBACK,
    PUBCOMP,
    PUBREC,
    PUBREL,
    SUBACK,
    SUBSCRIBE,
    drain_mqtt,
    encode_ack,
    encode_connect,
    encode_publish,
    encode_remaining_length,
    encode_subscribe,
    parse_publish,
    read_mqtt,
    read_packet,
    topic_filter_regex,
    topic_matches,
    validate_topic_filter,
)


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------


def _decode_remaining_length(b: bytes) -> tuple[int, int]:
    length, shift = 0, 0
    for i, byte in enumerate(b):
        length |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return length, i + 1
        shift += 7
    raise AssertionError("unterminated varint")


@pytest.mark.parametrize(
    "n,encoded",
    [
        (0, b"\x00"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (16383, b"\xff\x7f"),
        (16384, b"\x80\x80\x01"),
        (268_435_455, b"\xff\xff\xff\x7f"),
    ],
)
def test_remaining_length_spec_vectors(n, encoded):
    # the exact table from spec §2.2.3
    assert encode_remaining_length(n) == encoded
    assert _decode_remaining_length(encoded) == (n, len(encoded))


def test_remaining_length_bounds():
    with pytest.raises(ValueError):
        encode_remaining_length(268_435_456)
    with pytest.raises(ValueError):
        encode_remaining_length(-1)


def test_connect_packet_bytes():
    pkt = encode_connect("filebeat", username="u", password="p", clean_session=True)
    assert pkt[0] == CONNECT << 4
    length, used = _decode_remaining_length(pkt[1:5])
    body = pkt[1 + used :]
    assert len(body) == length
    # protocol name "MQTT", level 4
    assert body[:6] == b"\x00\x04MQTT"
    assert body[6] == 4
    flags = body[7]
    assert flags & 0x80 and flags & 0x40 and flags & 0x02  # user, pass, clean
    # keepalive 0, then client id / username / password strings
    assert body[8:10] == b"\x00\x00"
    assert body[10:] == b"\x00\x08filebeat" + b"\x00\x01u" + b"\x00\x01p"


def test_connect_client_id_validation_matches_reference():
    # config.go:50-54: 1..23 chars
    with pytest.raises(ValueError):
        encode_connect("")
    with pytest.raises(ValueError):
        encode_connect("x" * 24)
    with pytest.raises(ValueError):  # 3.1.1: password requires username
        encode_connect("c", password="p")


def test_subscribe_packet_flags_and_payload():
    pkt = encode_subscribe(42, [("a/b", 1), ("#", 0)])
    assert pkt[0] == (SUBSCRIBE << 4) | 0x02  # [MQTT-3.8.1-1]
    _, used = _decode_remaining_length(pkt[1:5])
    body = pkt[1 + used :]
    assert body == b"\x00\x2a" + b"\x00\x03a/b\x01" + b"\x00\x01#\x00"


def test_publish_roundtrip_qos_dup_retain():
    for qos, pid, dup, retain in [(0, 0, False, True), (1, 7, False, False), (2, 9, True, False)]:
        pkt = encode_publish("t/x", b"payload", qos=qos, packet_id=pid, dup=dup, retain=retain)
        flags = pkt[0] & 0x0F
        _, used = _decode_remaining_length(pkt[1:5])
        msg = parse_publish(flags, pkt[1 + used :])
        assert msg == {
            "duplicate": dup,
            "message_id": pid,
            "qos": qos,
            "retained": retain,
            "topic": "t/x",
            "payload": b"payload",
        }


# ---------------------------------------------------------------------------
# Topic filters — the spec's own §4.7 examples
# ---------------------------------------------------------------------------


def _match(topic: str, filt: str) -> bool:
    import re

    ok = re.fullmatch(topic_filter_regex(filt)[1:-1], topic) is not None
    if filt[0] in "+#" and topic.startswith("$"):
        ok = False
    return ok


@pytest.mark.parametrize(
    "filt,topic,expect",
    [
        # [MQTT-4.7.1-2] examples
        ("sport/tennis/player1/#", "sport/tennis/player1", True),
        ("sport/tennis/player1/#", "sport/tennis/player1/ranking", True),
        ("sport/tennis/player1/#", "sport/tennis/player1/score/wimbledon", True),
        ("sport/#", "sport", True),
        ("#", "a/b/c", True),
        # '+' one level exactly
        ("sport/tennis/+", "sport/tennis/player1", True),
        ("sport/tennis/+", "sport/tennis/player1/ranking", False),
        ("sport/+", "sport", False),
        ("sport/+", "sport/", True),  # zero-length level matches '+'
        ("+/+", "/finance", True),
        ("/+", "/finance", True),
        ("+", "/finance", False),
        # $-prefixed exclusion [MQTT-4.7.2-1]
        ("#", "$SYS/broker/load", False),
        ("+/monitor/Clients", "$SYS/monitor/Clients", False),
        ("$SYS/#", "$SYS/broker/load", True),
        ("$SYS/monitor/+", "$SYS/monitor/Clients", True),
        # literal specials must not leak into the regex
        ("a.b/c", "a.b/c", True),
        ("a.b/c", "axb/c", False),
    ],
)
def test_topic_filter_spec_examples(filt, topic, expect):
    assert _match(topic, filt) is expect


@pytest.mark.parametrize("bad", ["sport/tennis#", "sport/#/ranking", "sport+", "a/b+/c", ""])
def test_invalid_topic_filters_rejected(bad):
    with pytest.raises(ValueError):
        validate_topic_filter(bad)


def test_topic_matches_column(spark):
    df = spark.createDataFrame(
        [("sport/tennis/p1",), ("$SYS/broker/load",), ("news",)], "topic string"
    )
    got = df.select("topic", topic_matches("topic", "#").alias("m")).collect()
    assert {r["topic"]: r["m"] for r in got} == {
        "sport/tennis/p1": True,
        "$SYS/broker/load": False,
        "news": True,
    }


# ---------------------------------------------------------------------------
# In-process broker
# ---------------------------------------------------------------------------


class FakeBroker:
    """Single-client MQTT 3.1.1 broker slice: validates CONNECT,
    SUBACKs the subscription, pushes a scripted message sequence, and
    records every ack the client sends back."""

    def __init__(self, script: list[bytes]):
        try:
            self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self.srv.bind(("127.0.0.1", 0))
            self.srv.listen(1)
        except OSError as e:  # pragma: no cover
            pytest.skip(f"sockets unavailable: {e}")
        self.port = self.srv.getsockname()[1]
        self.script = script
        self.connect_body: bytes | None = None
        self.subscriptions: list[tuple[str, int]] = []
        self.acks: list[tuple[int, int]] = []  # (packet type, packet id)
        self.disconnected = False
        self.errors: list[str] = []
        self.done = threading.Event()
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        try:
            conn, _ = self.srv.accept()
            conn.settimeout(30)
            ptype, flags, body = read_packet(conn)
            assert ptype == CONNECT, ptype
            self.connect_body = body
            conn.sendall(bytes([CONNACK << 4]) + b"\x02\x00\x00")
            ptype, flags, body = read_packet(conn)
            assert ptype == SUBSCRIBE and flags == 0x02, (ptype, flags)
            pid = struct.unpack(">H", body[:2])[0]
            pos, granted = 2, b""
            while pos < len(body):
                tlen = struct.unpack(">H", body[pos : pos + 2])[0]
                topic = body[pos + 2 : pos + 2 + tlen].decode()
                qos = body[pos + 2 + tlen]
                self.subscriptions.append((topic, qos))
                granted += bytes([qos])
                pos += 3 + tlen
            conn.sendall(
                bytes([SUBACK << 4, 2 + len(granted)]) + struct.pack(">H", pid) + granted
            )
            for pkt in self.script:
                conn.sendall(pkt)
            # drain client acks until DISCONNECT / EOF
            while True:
                try:
                    ptype, flags, body = read_packet(conn)
                except (ConnectionError, socket.timeout):
                    break
                if ptype == DISCONNECT:
                    self.disconnected = True
                    break
                self.acks.append((ptype, struct.unpack(">H", body[:2])[0]))
                if ptype == PUBREC:
                    conn.sendall(encode_ack(PUBREL, struct.unpack(">H", body[:2])[0]))
            conn.close()
        except Exception as e:  # pragma: no cover
            self.errors.append(repr(e))
        finally:
            self.done.set()
            self.srv.close()


def test_drain_against_in_process_broker(spark):
    script = [
        encode_publish("beats/a", b"m0", qos=0, retain=True),
        encode_publish("beats/b", b"m1", qos=1, packet_id=7),
        encode_publish("beats/c", b"m2-\xff-binary", qos=2, packet_id=9),
        encode_publish("beats/b", b"m1", qos=1, packet_id=7, dup=True),
    ]
    broker = FakeBroker(script)
    df = read_mqtt(
        spark,
        "127.0.0.1",
        broker.port,
        topics=["beats/#", "$SYS/#"],
        qos=1,
        username="u",
        password="secret",
        max_messages=4,
        idle_timeout_s=10.0,
    )
    rows = [tuple(r) for r in df.collect()]
    assert broker.done.wait(30) and not broker.errors, broker.errors
    # reference field mapping, arrival order preserved
    assert rows == [
        ("m0", False, 0, 0, True, "beats/a"),
        ("m1", False, 7, 1, False, "beats/b"),
        ("m2-�-binary", False, 9, 2, False, "beats/c"),
        ("m1", True, 7, 1, False, "beats/b"),
    ]
    # wire assertions: CONNECT carried user/pass, SUBSCRIBE carried both filters
    assert broker.connect_body is not None
    assert broker.connect_body[7] & 0xC0 == 0xC0
    assert broker.subscriptions == [("beats/#", 1), ("$SYS/#", 1)]
    # QoS flows: PUBACK(7) for each QoS1 delivery, PUBREC(9)+PUBCOMP(9) for QoS2
    assert broker.acks.count((PUBACK, 7)) == 2
    assert (PUBREC, 9) in broker.acks and (PUBCOMP, 9) in broker.acks
    assert broker.disconnected


def test_drain_stops_on_idle_timeout():
    broker = FakeBroker([encode_publish("t", b"only", qos=0)])
    msgs = drain_mqtt(
        "127.0.0.1", broker.port, ["#"], max_messages=None, idle_timeout_s=1.0
    )
    assert [m["payload"] for m in msgs] == [b"only"]
    assert broker.done.wait(30) and not broker.errors, broker.errors


def test_connack_refusal_raises():
    class RefusingBroker(FakeBroker):
        def _serve(self):
            try:
                conn, _ = self.srv.accept()
                read_packet(conn)
                conn.sendall(bytes([CONNACK << 4]) + b"\x02\x00\x05")  # not authorized
                conn.close()
            finally:
                self.done.set()
                self.srv.close()

    broker = RefusingBroker([])
    with pytest.raises(ConnectionError, match="return code 5"):
        drain_mqtt("127.0.0.1", broker.port, ["#"], idle_timeout_s=1.0)


def test_qos2_publish_retransmit_not_redelivered():
    """Method A [MQTT-4.3.3-2]: a PUBLISH retransmitted while our
    PUBREC is in flight is re-acked but NOT delivered again."""
    script = [
        encode_publish("t/a", b"once", qos=2, packet_id=9),
        encode_publish("t/a", b"once", qos=2, packet_id=9, dup=True),
        encode_publish("t/b", b"after", qos=0),
    ]
    broker = FakeBroker(script)
    msgs = drain_mqtt("127.0.0.1", broker.port, ["#"], idle_timeout_s=2.0)
    assert broker.done.wait(30) and not broker.errors, broker.errors
    assert [m["payload"] for m in msgs] == [b"once", b"after"]
    assert broker.acks.count((PUBREC, 9)) == 2  # both PUBLISHes acked
    assert (PUBCOMP, 9) in broker.acks


@pytest.mark.parametrize(
    "filt,topic,expect",
    [
        # topics may contain newlines (any UTF-8 but NUL) — multi-level
        # wildcards must span them ('.' does not in Java regex or RE2)
        ("#", "a\nb", True),
        ("sport/#", "sport/a\nb/c", True),
        ("sport/+", "sport/a\nb", True),
        ("sport/+/c", "sport/a\nb/c", True),  # \n is level CONTENT, not a separator
        ("sport/+", "sport/a/b", False),  # '+' is still exactly one level
    ],
)
def test_topic_filters_span_newlines(filt, topic, expect):
    assert _match(topic, filt) is expect


def test_route_by_topic_sql_escapes_quotes():
    import duckdb

    from beats_spark.sources.mqtt import route_by_topic_sql

    case = route_by_topic_sql("topic", ["it's/+", "#"])
    got = duckdb.sql(
        f"SELECT {case} AS m FROM (VALUES ('it''s/x'), ('other/y')) t(topic)"
    ).fetchall()
    assert [r[0] for r in got] == ["it's/+", "#"]

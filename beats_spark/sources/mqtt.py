"""MQTT 3.1.1 input — the wire-protocol half of the reference's mqtt
input, plus topic-filter matching as Catalyst expressions.

The reference input (filebeat/input/mqtt/input.go:56-135) subscribes a
paho client to a list of topic filters and publishes one event per
received message with fields ``message`` (payload as string) and
``mqtt.{duplicate, message_id, qos, retained, topic}``
(input.go:113-132); config surface hosts/topics/qos/client_id/
username/password/clean_session with ClientID validated to 1..23
chars (config.go:27-54). This module rebuilds that contract on the
real MQTT 3.1.1 wire protocol (OASIS spec, public) the same way the
round-4 logstash/redis sinks rebuilt lumberjack/RESP: a from-scratch
packet codec + client, tested against an in-process broker where
every byte crosses a localhost TCP socket.

Spark shape: one broker connection is ONE ordered byte stream — the
same constraint as the journald binary path — so the drain is a
bounded driver-side read (``read_mqtt``) that lands the messages in a
DataFrame and hands off to the SAME plan every other source feeds;
event bytes never loop through Python again after ``createDataFrame``.
At scale the fan-out lever is the protocol's, not Spark's: N drains
over disjoint topic filters (or MQTT 5 shared subscriptions) each
feed a partition of the same table — mirroring how the reference runs
one input per topic set. The unbounded path is the standing pattern:
drained batches appended to the ingest table drive the proven
foreachBatch pipeline (streaming/pipeline.py); kafka-style brokers use
the built-in ``format("kafka")`` swap instead.

Topic matching (§4.7 of the 3.1.1 spec) is implemented as a compiled
regex per FILTER (filters are config literals, so compilation happens
at plan build): ``+`` matches exactly one possibly-empty level,
``sport/#`` matches ``sport`` and every descendant, and wildcard-led
filters never match ``$``-prefixed topics ([MQTT-4.7.2-1] — expressed
as a separate conjunct, not a lookahead, so the DuckDB/RE2 oracle can
run the identical regex). ``route_by_topic`` is the input-plane twin
of the output router: first-match-wins across the subscription list.

QoS handshakes: receiving QoS 1 acks with PUBACK; QoS 2 runs the full
PUBREC -> PUBREL -> PUBCOMP exchange (delivery on PUBLISH, spec
"Method A"). Delivery is therefore at-least-once for QoS >= 1 exactly
like the reference (paho redelivers un-acked messages; dedup is the
pipeline's job via the dedup operators, not the transport's).
"""

from __future__ import annotations

import re
import socket
import struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Packet codec (MQTT 3.1.1). Types per spec §2.2.1.
# ---------------------------------------------------------------------------

CONNECT, CONNACK, PUBLISH, PUBACK, PUBREC, PUBREL, PUBCOMP = range(1, 8)
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK, PINGREQ, PINGRESP, DISCONNECT = range(8, 15)


def encode_remaining_length(n: int) -> bytes:
    """Spec §2.2.3 varint: 7 bits per byte LSB-first, 0x80 continues,
    max 4 bytes (268 435 455)."""
    if not 0 <= n <= 268_435_455:
        raise ValueError(f"remaining length out of range: {n}")
    out = bytearray()
    while True:
        n, digit = divmod(n, 128)
        out.append(digit | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("mqtt: connection closed mid-packet")
        buf += chunk
    return bytes(buf)


def read_packet(sock: socket.socket) -> tuple[int, int, bytes]:
    """Read one packet → (type, flags, body). Raises ConnectionError
    on EOF at a packet boundary too — callers treat that as
    end-of-stream."""
    first = _read_exact(sock, 1)[0]
    length, shift = 0, 0
    for _ in range(4):
        byte = _read_exact(sock, 1)[0]
        length |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    else:
        raise ValueError("mqtt: malformed remaining length (>4 bytes)")
    return first >> 4, first & 0x0F, _read_exact(sock, length) if length else b""


def _mqtt_str(s: str | bytes) -> bytes:
    b = s.encode("utf-8") if isinstance(s, str) else s
    if len(b) > 0xFFFF:
        raise ValueError("mqtt: string exceeds 65535 bytes")
    return struct.pack(">H", len(b)) + b


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + encode_remaining_length(len(body)) + body


def encode_connect(
    client_id: str,
    username: str | None = None,
    password: str | None = None,
    clean_session: bool = True,
    keepalive_s: int = 0,
) -> bytes:
    """CONNECT, protocol name "MQTT" level 4 (3.1.1, §3.1). ClientID
    length 1..23 enforced exactly like the reference's
    config.Validate (filebeat/input/mqtt/config.go:50-54)."""
    if not 1 <= len(client_id) <= 23:
        raise ValueError("ClientID must be between 1 and 23 characters long")
    flags = 0x02 if clean_session else 0x00
    if username is not None:
        flags |= 0x80
    if password is not None:
        if username is None:
            raise ValueError("mqtt 3.1.1: password requires username")
        flags |= 0x40
    body = _mqtt_str("MQTT") + bytes([4, flags]) + struct.pack(">H", keepalive_s)
    body += _mqtt_str(client_id)
    if username is not None:
        body += _mqtt_str(username)
    if password is not None:
        body += _mqtt_str(password)
    return _packet(CONNECT, 0, body)


def encode_subscribe(packet_id: int, topics: list[tuple[str, int]]) -> bytes:
    """SUBSCRIBE (§3.8): fixed-header flags MUST be 0b0010; payload is
    (filter, requested-QoS) pairs."""
    if not topics:
        raise ValueError("mqtt: subscribe needs at least one topic filter")
    body = struct.pack(">H", packet_id)
    for topic, qos in topics:
        validate_topic_filter(topic)
        if qos not in (0, 1, 2):
            raise ValueError(f"mqtt: invalid qos {qos}")
        body += _mqtt_str(topic) + bytes([qos])
    return _packet(SUBSCRIBE, 0x02, body)


def encode_ack(ptype: int, packet_id: int) -> bytes:
    """PUBACK / PUBREC / PUBCOMP (flags 0) and PUBREL (flags 0b0010,
    §3.6.1)."""
    return _packet(ptype, 0x02 if ptype == PUBREL else 0, struct.pack(">H", packet_id))


def encode_disconnect() -> bytes:
    return _packet(DISCONNECT, 0, b"")


def encode_publish(
    topic: str,
    payload: bytes,
    qos: int = 0,
    packet_id: int = 0,
    retain: bool = False,
    dup: bool = False,
) -> bytes:
    """PUBLISH (§3.3) — used by the test broker and round-trip tests;
    the input side only ever parses these."""
    flags = (0x08 if dup else 0) | (qos << 1) | (0x01 if retain else 0)
    body = _mqtt_str(topic)
    if qos > 0:
        body += struct.pack(">H", packet_id)
    return _packet(PUBLISH, flags, body + payload)


def parse_publish(flags: int, body: bytes) -> dict:
    """PUBLISH body → the reference's mqttFields shape
    (filebeat/input/mqtt/input.go:119-125): duplicate, message_id
    (0 when QoS 0, like paho's Message.MessageID), qos, retained,
    topic — plus the raw payload."""
    qos = (flags >> 1) & 0x03
    if qos == 3:
        raise ValueError("mqtt: malformed PUBLISH qos=3")
    tlen = struct.unpack(">H", body[:2])[0]
    topic = body[2 : 2 + tlen].decode("utf-8")
    pos = 2 + tlen
    packet_id = 0
    if qos > 0:
        packet_id = struct.unpack(">H", body[pos : pos + 2])[0]
        pos += 2
    return {
        "duplicate": bool(flags & 0x08),
        "message_id": packet_id,
        "qos": qos,
        "retained": bool(flags & 0x01),
        "topic": topic,
        "payload": body[pos:],
    }


# ---------------------------------------------------------------------------
# Topic filters (§4.7) — validation, regex compilation, Columns
# ---------------------------------------------------------------------------


def validate_topic_filter(f: str) -> None:
    """Spec §4.7.1: ``#`` only as the last level ([MQTT-4.7.1-2]);
    ``+`` must occupy a whole level ([MQTT-4.7.1-3]); filters are
    non-empty."""
    if not f:
        raise ValueError("mqtt: empty topic filter")
    levels = f.split("/")
    for i, lvl in enumerate(levels):
        if "#" in lvl and (lvl != "#" or i != len(levels) - 1):
            raise ValueError(f"mqtt: '#' must be the final whole level: {f!r}")
        if "+" in lvl and lvl != "+":
            raise ValueError(f"mqtt: '+' must occupy a whole level: {f!r}")


def topic_filter_regex(f: str) -> str:
    """Filter → anchored regex, identical under Java regex and RE2 so
    the DuckDB oracle runs the same string: ``+`` → ``[^/]*`` (one
    possibly-empty level, [MQTT-4.7.3-3] example ``+/+`` matches
    ``/finance``), trailing ``/#`` → ``(/.*)?`` (parent level
    included, [MQTT-4.7.1-2]), lone ``#`` → ``.*``. The $-exclusion
    rule is NOT in the regex (RE2 has no lookahead) — see
    topic_matches."""
    validate_topic_filter(f)
    # [\s\S], not '.': topic names may contain newlines (any UTF-8 but
    # NUL, §4.7.3) and '.' matches neither \n in Java regex nor RE2 —
    # a '#' that misses 'a\nb' would drop a message the broker delivered
    if f == "#":
        return r"^[\s\S]*$"
    parts = []
    levels = f.split("/")
    tail = ""
    if levels[-1] == "#":
        levels = levels[:-1]
        tail = r"(/[\s\S]*)?"
    for lvl in levels:
        parts.append("[^/]*" if lvl == "+" else re.escape(lvl))
    return "^" + "/".join(parts) + tail + "$"


def topic_matches(topic: Column | str, filt: str) -> Column:
    """Boolean Column: does ``topic`` match config-literal filter
    ``filt``. Wildcard-led filters never match ``$``-prefixed topics
    ([MQTT-4.7.2-1]) — a conjunct, so both engines share the regex."""
    col = F.col(topic) if isinstance(topic, str) else topic
    matched = col.rlike(topic_filter_regex(filt))
    if filt[0] in "+#":
        matched = matched & ~col.startswith("$")
    return matched


def route_by_topic(
    df: DataFrame, topic_col: str, filters: list[str], out_col: str = "matched_filter"
) -> DataFrame:
    """First-match-wins across the subscription list — the input-plane
    twin of the output router's listSelector (plans/router.py). Adds
    ``out_col`` = the first matching filter string, NULL when nothing
    matches (the broker would not have delivered such a message; kept
    NULL rather than dropped so tests can see the residue). Pure
    codegen — one CASE WHEN chain, no shuffle."""
    expr = F.lit(None).cast("string")
    for filt in reversed(filters):
        expr = F.when(topic_matches(F.col(topic_col), filt), F.lit(filt)).otherwise(expr)
    return df.withColumn(out_col, expr)


def route_by_topic_sql(topic_expr: str, filters: list[str]) -> str:
    """The identical CASE WHEN chain as one SQL string for the DuckDB
    oracle twin (regexp_matches is unanchored in DuckDB — the compiled
    regex carries its own ^...$)."""
    arms = []
    for filt in filters:
        # single quotes are legal in topic filters and re.escape leaves
        # them alone — double them or the oracle SQL parses mid-string
        rx = topic_filter_regex(filt).replace("'", "''")
        lit = filt.replace("'", "''")
        cond = f"regexp_matches({topic_expr}, '{rx}')"
        if filt[0] in "+#":
            cond += f" AND NOT starts_with({topic_expr}, '$')"
        arms.append(f"WHEN {cond} THEN '{lit}'")
    return "CASE " + " ".join(arms) + " ELSE NULL END"


# ---------------------------------------------------------------------------
# Client drain
# ---------------------------------------------------------------------------


def drain_mqtt(
    host: str,
    port: int,
    topics: list[str],
    qos: int = 0,
    client_id: str = "filebeat",
    username: str | None = None,
    password: str | None = None,
    clean_session: bool = True,
    max_messages: int | None = None,
    idle_timeout_s: float = 5.0,
    connect_timeout_s: float = 10.0,
) -> list[dict]:
    """Connect → CONNACK-check → SUBSCRIBE → SUBACK-check → read
    PUBLISHes (acking per QoS) until ``max_messages`` or the socket
    idles ``idle_timeout_s`` → DISCONNECT. Returns the reference's
    event dicts in arrival order. Defaults mirror the reference's
    defaultConfig (client_id "filebeat", topics ['#'], clean_session
    True — config.go:39-46)."""
    sock = socket.create_connection((host, port), timeout=connect_timeout_s)
    out: list[dict] = []
    try:
        sock.sendall(
            encode_connect(client_id, username, password, clean_session, keepalive_s=0)
        )
        ptype, _, body = read_packet(sock)
        if ptype != CONNACK or len(body) != 2:
            raise ConnectionError(f"mqtt: expected CONNACK, got type {ptype}")
        if body[1] != 0:
            raise ConnectionError(f"mqtt: connection refused, return code {body[1]}")
        sock.sendall(encode_subscribe(1, [(t, qos) for t in topics]))
        ptype, _, body = read_packet(sock)
        if ptype != SUBACK or struct.unpack(">H", body[:2])[0] != 1:
            raise ConnectionError(f"mqtt: expected SUBACK(1), got type {ptype}")
        granted = list(body[2:])
        if any(g == 0x80 for g in granted):
            raise ConnectionError(f"mqtt: subscription rejected: {granted}")
        sock.settimeout(idle_timeout_s)
        qos2_pending: set[int] = set()  # PUBREC sent, PUBREL still owed to us
        while True:
            budget_done = max_messages is not None and len(out) >= max_messages
            if budget_done and not qos2_pending:
                break
            try:
                ptype, flags, body = read_packet(sock)
            except (socket.timeout, ConnectionError):
                break  # idle or broker hung up: the drain is done
            if ptype == PUBLISH:
                if budget_done:
                    # budget reached (we only linger to finish the QoS 2
                    # handshakes §4.3.3 obliges): leave the message
                    # UN-acked so a QoS >= 1 broker redelivers it to the
                    # next drain — never ack what we will not deliver
                    continue
                msg = parse_publish(flags, body)
                if msg["qos"] == 2 and msg["message_id"] in qos2_pending:
                    # PUBLISH retransmit while our PUBREC is in flight:
                    # Method A [MQTT-4.3.3-2] — re-ack, do NOT redeliver
                    sock.sendall(encode_ack(PUBREC, msg["message_id"]))
                    continue
                if msg["qos"] == 1:
                    sock.sendall(encode_ack(PUBACK, msg["message_id"]))
                elif msg["qos"] == 2:
                    sock.sendall(encode_ack(PUBREC, msg["message_id"]))
                    qos2_pending.add(msg["message_id"])
                out.append(msg)
            elif ptype == PUBREL:
                pid = struct.unpack(">H", body[:2])[0]
                sock.sendall(encode_ack(PUBCOMP, pid))
                qos2_pending.discard(pid)
            elif ptype == PINGREQ:  # broker keepalive probe (unusual but legal)
                sock.sendall(_packet(PINGRESP, 0, b""))
            # PINGRESP / SUBACK dupes: ignore
        try:
            sock.sendall(encode_disconnect())
        except OSError:
            pass
    finally:
        sock.close()
    return out


_MQTT_SCHEMA = (
    "message string, mqtt_duplicate boolean, mqtt_message_id int, "
    "mqtt_qos int, mqtt_retained boolean, mqtt_topic string"
)


def read_mqtt(
    spark: SparkSession,
    host: str,
    port: int,
    topics: list[str] | None = None,
    **kwargs,
) -> DataFrame:
    """Bounded drain → DataFrame in the reference's event shape
    (input.go:126-132): ``message`` is the payload decoded UTF-8 with
    replacement (the reference does string(payload) — Go replaces
    invalid bytes the same way), mqtt_* are the mqttFields. Row order
    carries arrival order; add the pipeline's timestamp processor
    downstream for the Timestamp=now field (kept out of the frame so
    tests stay deterministic)."""
    msgs = drain_mqtt(host, port, topics if topics is not None else ["#"], **kwargs)
    rows = [
        (
            m["payload"].decode("utf-8", errors="replace"),
            m["duplicate"],
            m["message_id"],
            m["qos"],
            m["retained"],
            m["topic"],
        )
        for m in msgs
    ]
    return spark.createDataFrame(rows, schema=_MQTT_SCHEMA)

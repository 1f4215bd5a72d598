"""Network protocol sinks: redis (RESP) and logstash (lumberjack v2).

These close the last two reference outputs that previously sat behind
a "network protocols, N/A" note. The Spark-correct shape for a
socket-protocol sink is ``foreachPartition``: every EXECUTOR task
opens its own connection and streams its partition — the same
fan-out-by-partition pattern the es/kafka connectors use — so sink
bandwidth scales with the cluster and the driver never touches event
bytes. Serialization stays in the PLAN (``to_json(struct(*))`` — the
reference's json codec, libbeat/outputs/codec/json) so the Python
side of foreachPartition only moves ready-made bytes.

Delivery semantics: at-least-once. A task failure after a partial
send replays the whole partition on retry — exactly the reference's
model (batch.RetryEvents on publish error, redis/client.go:150-155;
the lumberjack window is retried until ACKed, logstash/sync.go). Use
the idempotent table sinks when exactly-once matters; these protocols
have no transaction to offer.

redis — ref libbeat/outputs/redis/client.go:
- handshake AUTH? → PING → SELECT db? (initRedisConn, :114-131)
- data_type "list" → RPUSH, "channel" → PUBLISH (makePublish, :163)
- multi-value RPUSH per key batch (publishEventsBulk, :223 — the
  Redis ≥2.4 bulk form; per-event pipeline otherwise). Events are
  sorted by their selected key within each partition so same-key rows
  batch; ordering within a key is partition-local and unspecified
  (the reference's list order is queue order — a property no
  distributed sender preserves across partitions either).
- key selection is any Column (const, field value, fmtstr — the
  outil.Selector equivalents compile to Catalyst expressions).

logstash — ref libbeat/outputs/logstash/sync.go + the public
lumberjack v2 protocol (elastic/go-lumber):
- frames: '2W' uint32(batch) window, '2J' uint32(seq) uint32(len)
  json data, optional '2C' uint32(len) zlib(compressed inner frames),
  server ACK '2A' uint32(seq); a window is complete when the ACK seq
  reaches the window's last seq (partial ACKs keep the wait alive).
- one window per ``bulk_max_size`` slice of the partition, seq
  restarting at 1 per window like go-lumber's sync client.
"""

from __future__ import annotations

import socket
import struct
import zlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# RESP (REdis Serialization Protocol) — request encoding + reply parse
# ---------------------------------------------------------------------------

def resp_encode(args: list[bytes | str]) -> bytes:
    """Encode one command as a RESP array of bulk strings."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a.encode("utf-8") if isinstance(a, str) else a
        out.append(b"$%d\r\n" % len(b))
        out.append(b)
        out.append(b"\r\n")
    return b"".join(out)


class _RespReader:
    """Minimal blocking RESP reply reader (simple strings, errors,
    integers, bulk strings, arrays)."""

    def __init__(self, sock: socket.socket):
        self._f = sock.makefile("rb")

    def read(self):
        line = self._f.readline()
        if not line:
            raise ConnectionError("redis: connection closed mid-reply")
        t, body = line[:1], line[1:-2]
        if t == b"+":
            return body.decode()
        if t == b"-":
            raise RuntimeError(f"redis error reply: {body.decode()}")
        if t == b":":
            return int(body)
        if t == b"$":
            n = int(body)
            if n == -1:
                return None
            data = self._f.read(n + 2)
            return data[:-2]
        if t == b"*":
            return [self.read() for _ in range(int(body))]
        raise RuntimeError(f"redis: unknown reply type {t!r}")


def connect_with_backoff(
    host: str,
    port: int,
    timeout: float,
    backoff_init: float = 1.0,
    backoff_max: float = 60.0,
    ttl: float = 300.0,
) -> socket.socket:
    """Dial with exponential backoff until ``ttl`` seconds elapse —
    the reference's reconnect policy (redis/backoff.go wraps the
    client in an equal-jitter exponential backoff; outputs keep
    retrying until the pipeline's TTL abandons the batch). Here the
    TTL bounds the task's dial loop; past it the exception surfaces
    and Spark's task retry takes over (at-least-once, batch replay —
    the RetryEvents path). Deterministic doubling, no jitter: tasks
    already start staggered, and reproducibility beats thundering-herd
    smoothing at this layer."""
    import time

    deadline = time.monotonic() + ttl
    delay = backoff_init
    while True:
        try:
            return socket.create_connection((host, port), timeout=timeout)
        except OSError:
            if time.monotonic() + delay > deadline:
                raise
            time.sleep(delay)
            delay = min(delay * 2, backoff_max)


def _redis_partition_writer(
    host: str,
    port: int,
    data_type: str,
    password: str | None,
    db: int,
    bulk_max: int,
    timeout: float,
    backoff_init: float,
    backoff_max: float,
    ttl: float,
):
    """Build the foreachPartition function (runs on executors)."""

    def write(rows: Iterator) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # empty partition: no connection at all
        sock = connect_with_backoff(
            host, port, timeout, backoff_init, backoff_max, ttl
        )
        try:
            rd = _RespReader(sock)
            if password:
                sock.sendall(resp_encode(["AUTH", password]))
                rd.read()
            sock.sendall(resp_encode(["PING"]))
            rd.read()
            if db:
                sock.sendall(resp_encode(["SELECT", str(db)]))
                rd.read()

            def flush(key: str, payloads: list[bytes]) -> None:
                if not payloads:
                    return
                if data_type == "channel":
                    # PUBLISH takes one message: pipeline the batch
                    sock.sendall(
                        b"".join(
                            resp_encode(["PUBLISH", key, p]) for p in payloads
                        )
                    )
                    for _ in payloads:
                        rd.read()
                else:
                    sock.sendall(resp_encode(["RPUSH", key, *payloads]))
                    rd.read()  # list length — fail-and-retry-all on error

            # group consecutive same-key rows; cap batches at bulk_max
            cur_key: str | None = None
            buf: list[bytes] = []
            for row in _chain(first, it):
                k, payload = row["_sink_key"], row["_payload"].encode("utf-8")
                if k != cur_key or len(buf) >= bulk_max:
                    flush(cur_key, buf)
                    cur_key, buf = k, []
                buf.append(payload)
            flush(cur_key, buf)
        finally:
            sock.close()

    return write


def _chain(first, rest):
    yield first
    yield from rest


def write_redis(
    df: DataFrame,
    host: str,
    port: int,
    key: Column | str = "beats",
    data_type: str = "list",
    password: str | None = None,
    db: int = 0,
    bulk_max_size: int = 2048,
    timeout: float = 30.0,
    backoff_init: float = 1.0,
    backoff_max: float = 60.0,
    connect_ttl: float = 300.0,
) -> None:
    """Publish every row to redis, JSON-encoded, keyed per event.

    ``key``: a constant string or any Column (field value / fmtstr
    selector) — the per-event key selection of the reference's
    outil.Selector. ``data_type``: "list" (RPUSH) or "channel"
    (PUBLISH), redis/config.go. Rows are sorted by key WITHIN each
    partition only (no shuffle) so same-key events batch into
    multi-value RPUSH calls; cross-partition interleaving on a key is
    inherent to any parallel sender."""
    if data_type not in ("list", "channel"):
        raise ValueError(f"redis data_type must be list|channel, got {data_type!r}")
    key_col = F.lit(key) if isinstance(key, str) else key
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    # NULL keys drop BEFORE the writer (the reference's per-event
    # permanent-error path: serializeEvents counts and skips events
    # whose key selection failed, redis/client.go PermanentErrors) —
    # a None reaching resp_encode would TypeError the whole task.
    frame = (
        df.select(
            key_col.cast("string").alias("_sink_key"), payload.alias("_payload")
        )
        .where(F.col("_sink_key").isNotNull())
        .sortWithinPartitions("_sink_key")
    )
    frame.foreachPartition(
        _redis_partition_writer(
            host, port, data_type, password, db, bulk_max_size, timeout,
            backoff_init, backoff_max, connect_ttl,
        )
    )


# ---------------------------------------------------------------------------
# Lumberjack v2 (the logstash beats input protocol)
# ---------------------------------------------------------------------------

def lumberjack_frames(payloads: list[bytes], compress: bool = False) -> bytes:
    """One complete v2 window: '2W'(n) then n '2J'(seq,len,json)
    frames, optionally wrapped in a single '2C' compressed frame."""
    body = b"".join(
        b"2J" + struct.pack(">II", seq, len(p)) + p
        for seq, p in enumerate(payloads, start=1)
    )
    if compress:
        z = zlib.compress(body)
        body = b"2C" + struct.pack(">I", len(z)) + z
    return b"2W" + struct.pack(">I", len(payloads)) + body


def _read_acks(sock: socket.socket, last_seq: int) -> None:
    """Block until the server's ACK sequence reaches last_seq
    (cumulative ACKs; partial ACKs just keep waiting — sync.go)."""
    buf = b""
    while True:
        while len(buf) < 6:
            chunk = sock.recv(4096)
            if not chunk:
                raise ConnectionError("logstash: closed before final ACK")
            buf += chunk
        frame, buf = buf[:6], buf[6:]
        if frame[:2] != b"2A":
            raise RuntimeError(f"logstash: unexpected frame {frame[:2]!r}")
        (seq,) = struct.unpack(">I", frame[2:6])
        if seq >= last_seq:
            return


def _logstash_partition_writer(
    host: str, port: int, bulk_max: int, compress: bool, timeout: float,
    backoff_init: float, backoff_max: float, ttl: float,
):
    def write(rows: Iterator) -> None:
        batch: list[bytes] = []
        sock: socket.socket | None = None
        try:
            for row in rows:
                if sock is None:
                    sock = connect_with_backoff(
                        host, port, timeout, backoff_init, backoff_max, ttl
                    )
                batch.append(row["_payload"].encode("utf-8"))
                if len(batch) >= bulk_max:
                    sock.sendall(lumberjack_frames(batch, compress))
                    _read_acks(sock, len(batch))
                    batch = []
            if batch and sock is not None:
                sock.sendall(lumberjack_frames(batch, compress))
                _read_acks(sock, len(batch))
        finally:
            if sock is not None:
                sock.close()

    return write


def write_logstash(
    df: DataFrame,
    host: str,
    port: int,
    bulk_max_size: int = 2048,
    compress: bool = False,
    timeout: float = 30.0,
    backoff_init: float = 1.0,
    backoff_max: float = 60.0,
    connect_ttl: float = 300.0,
) -> None:
    """Ship every row to a logstash beats input over lumberjack v2.

    One window per ``bulk_max_size`` rows per partition; the task
    blocks on the cumulative ACK before the next window (the sync
    client's flow-control — this IS the protocol's backpressure:
    a slow logstash stalls the sender, it never drops)."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    frame = df.select(payload.alias("_payload"))
    frame.foreachPartition(
        _logstash_partition_writer(
            host, port, bulk_max_size, compress, timeout,
            backoff_init, backoff_max, connect_ttl,
        )
    )

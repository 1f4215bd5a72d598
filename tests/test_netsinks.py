"""Network sinks against REAL protocol servers (in-process threads):
a RESP server for the redis sink, a lumberjack v2 server for the
logstash sink. Every byte crosses a localhost TCP socket — the tests
gate wire format, handshake order, batching, and ACK flow, not mocks.
Skips cleanly where the sandbox forbids sockets."""

from __future__ import annotations

import json
import socket
import struct
import threading
import zlib

import pytest
from pyspark.sql import functions as F

from beats_spark.plans.netsinks import (
    lumberjack_frames,
    resp_encode,
    write_logstash,
    write_redis,
)


def _listener():
    try:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(32)
        return srv, srv.getsockname()[1]
    except OSError as e:  # pragma: no cover
        pytest.skip(f"sockets unavailable: {e}")


# ---------------------------------------------------------------------------
# In-process RESP server
# ---------------------------------------------------------------------------

class FakeRedis:
    def __init__(self):
        self.srv, self.port = _listener()
        self.lists: dict[str, list[bytes]] = {}
        self.published: list[tuple[str, bytes]] = []
        self.auths: list[str] = []
        self.selects: list[int] = []
        self.lock = threading.Lock()
        self._stop = False
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def close(self):
        self._stop = True
        try:
            self.srv.close()
        except OSError:
            pass

    def _accept_loop(self):
        while not self._stop:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket):
        f = conn.makefile("rb")
        try:
            while True:
                line = f.readline()
                if not line:
                    return
                assert line[:1] == b"*", line
                n = int(line[1:-2])
                args = []
                for _ in range(n):
                    hdr = f.readline()
                    assert hdr[:1] == b"$", hdr
                    ln = int(hdr[1:-2])
                    args.append(f.read(ln + 2)[:-2])
                cmd = args[0].upper()
                with self.lock:
                    if cmd == b"PING":
                        conn.sendall(b"+PONG\r\n")
                    elif cmd == b"AUTH":
                        self.auths.append(args[1].decode())
                        conn.sendall(b"+OK\r\n")
                    elif cmd == b"SELECT":
                        self.selects.append(int(args[1]))
                        conn.sendall(b"+OK\r\n")
                    elif cmd == b"RPUSH":
                        key = args[1].decode()
                        if key.startswith("err-"):
                            conn.sendall(b"-OOM command not allowed\r\n")
                            continue
                        self.lists.setdefault(key, []).extend(args[2:])
                        conn.sendall(b":%d\r\n" % len(self.lists[key]))
                    elif cmd == b"PUBLISH":
                        self.published.append((args[1].decode(), args[2]))
                        conn.sendall(b":1\r\n")
                    else:
                        conn.sendall(b"-ERR unknown command\r\n")
        finally:
            conn.close()


def test_redis_sink_rpush_per_event_keys(spark):
    """Routed events land on their per-event key via multi-value
    RPUSH after the AUTH→PING→SELECT handshake; payloads are the json
    codec output; nothing is lost or duplicated."""
    srv = FakeRedis()
    try:
        df = spark.createDataFrame(
            [(i, f"msg-{i}", "alerts" if i % 3 == 0 else "main")
             for i in range(200)],
            "id long, msg string, sink string",
        ).repartition(8)
        write_redis(
            df, "127.0.0.1", srv.port,
            key=F.col("sink"), password="hunter2", db=3,
        )
        with srv.lock:
            assert set(srv.auths) == {"hunter2"} and set(srv.selects) == {3}
            got = {
                k: sorted(json.loads(v)["id"] for v in vs)
                for k, vs in srv.lists.items()
            }
        assert got["alerts"] == [i for i in range(200) if i % 3 == 0]
        assert got["main"] == [i for i in range(200) if i % 3 != 0]
        # payload shape: the full row as json
        sample = json.loads(srv.lists["alerts"][0])
        assert set(sample) == {"id", "msg", "sink"}
    finally:
        srv.close()


def test_redis_sink_channel_publish(spark):
    srv = FakeRedis()
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, msg string")
        write_redis(df, "127.0.0.1", srv.port, key="chan", data_type="channel")
        with srv.lock:
            assert sorted(json.loads(p)["id"] for _, p in srv.published) == [1, 2]
            assert {k for k, _ in srv.published} == {"chan"}
    finally:
        srv.close()


def test_resp_encode_wire_format():
    assert resp_encode(["RPUSH", "k", b"v1"]) == (
        b"*3\r\n$5\r\nRPUSH\r\n$1\r\nk\r\n$2\r\nv1\r\n"
    )


# ---------------------------------------------------------------------------
# In-process lumberjack v2 server
# ---------------------------------------------------------------------------

class FakeLogstash:
    """Parses 2W/2J/2C frames, ACKs each completed window (cumulative
    final ACK, plus a partial mid-window ACK to exercise the client's
    keep-waiting path)."""

    def __init__(self):
        self.srv, self.port = _listener()
        self.payloads: list[bytes] = []
        self.windows: list[int] = []
        self.lock = threading.Lock()
        self._stop = False
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def close(self):
        self._stop = True
        try:
            self.srv.close()
        except OSError:
            pass

    def _accept_loop(self):
        while not self._stop:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _read_exact(self, f, n):
        data = f.read(n)
        if data is None or len(data) < n:
            raise ConnectionError("short read")
        return data

    def _parse_stream(self, f, conn, window: list[int]):
        """Parse frames from f; emits ACKs on conn as windows fill."""
        while True:
            hdr = f.read(2)
            if not hdr:
                return
            if hdr == b"2W":
                (n,) = struct.unpack(">I", self._read_exact(f, 4))
                window[0] = n
                with self.lock:
                    self.windows.append(n)
            elif hdr == b"2J":
                seq, ln = struct.unpack(">II", self._read_exact(f, 8))
                payload = self._read_exact(f, ln)
                with self.lock:
                    self.payloads.append(payload)
                if window[0] and seq == max(1, window[0] // 2) and window[0] > 2:
                    conn.sendall(b"2A" + struct.pack(">I", seq))  # partial
                if window[0] and seq == window[0]:
                    conn.sendall(b"2A" + struct.pack(">I", seq))  # final
            elif hdr == b"2C":
                (zlen,) = struct.unpack(">I", self._read_exact(f, 4))
                inner = zlib.decompress(self._read_exact(f, zlen))
                import io

                self._parse_stream(io.BytesIO(inner), conn, window)
            else:
                raise AssertionError(f"unknown frame {hdr!r}")

    def _serve(self, conn: socket.socket):
        f = conn.makefile("rb")
        try:
            self._parse_stream(f, conn, [0])
        except (ConnectionError, AssertionError):
            pass
        finally:
            conn.close()


@pytest.mark.parametrize("compress", [False, True])
def test_logstash_sink_windows_and_acks(spark, compress):
    srv = FakeLogstash()
    try:
        df = spark.createDataFrame(
            [(i, f"event-{i}") for i in range(150)], "id long, msg string"
        ).repartition(4)
        write_logstash(
            df, "127.0.0.1", srv.port, bulk_max_size=20, compress=compress
        )
        with srv.lock:
            got = sorted(json.loads(p)["id"] for p in srv.payloads)
            windows = list(srv.windows)
        assert got == list(range(150))  # exactly once, nothing dropped
        assert all(w <= 20 for w in windows) and sum(windows) == 150
    finally:
        srv.close()


def test_lumberjack_frame_bytes():
    """Wire format golden: window + one json frame."""
    frames = lumberjack_frames([b'{"a":1}'])
    assert frames == (
        b"2W" + struct.pack(">I", 1)
        + b"2J" + struct.pack(">II", 1, 7) + b'{"a":1}'
    )
    comp = lumberjack_frames([b'{"a":1}'], compress=True)
    assert comp[:2] == b"2W" and comp[6:8] == b"2C"
    (zlen,) = struct.unpack(">I", comp[8:12])
    assert zlib.decompress(comp[12:12 + zlen]) == frames[6:]


def test_connect_backoff_waits_for_server(spark):
    """connect_with_backoff retries with exponential delay until the
    endpoint appears (the redis/backoff.go reconnect policy), and
    raises once the TTL is spent."""
    import time

    from beats_spark.plans.netsinks import connect_with_backoff

    # reserve a port, then close it so the first dials are refused
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    def late_server():
        time.sleep(0.5)
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(1)
        conn, _ = srv.accept()
        conn.close()
        srv.close()

    t = threading.Thread(target=late_server, daemon=True)
    t.start()
    t0 = time.monotonic()
    sock = connect_with_backoff(
        "127.0.0.1", port, timeout=5.0, backoff_init=0.05,
        backoff_max=0.2, ttl=10.0,
    )
    sock.close()
    assert time.monotonic() - t0 >= 0.4  # it actually waited
    t.join()

    # TTL exhaustion: nothing ever listens on the re-reserved port
    probe2 = socket.socket()
    probe2.bind(("127.0.0.1", 0))
    dead_port = probe2.getsockname()[1]
    probe2.close()
    with pytest.raises(OSError):
        connect_with_backoff(
            "127.0.0.1", dead_port, timeout=1.0, backoff_init=0.05,
            backoff_max=0.1, ttl=0.3,
        )


def test_redis_error_reply_fails_the_write(spark):
    """A redis ERROR reply (e.g. OOM) must surface as a task failure —
    the fail-and-retry-all contract (client.go: RPUSH error → whole
    batch retried), never a silent drop. The fake server refuses keys
    prefixed err- with -OOM."""
    srv = FakeRedis()
    try:
        df = spark.createDataFrame([(1, "x")], "id long, msg string")
        with pytest.raises(Exception) as ei:
            write_redis(df.coalesce(1), "127.0.0.1", srv.port, key="err-k")
        assert "OOM" in str(ei.value) or "redis" in str(ei.value).lower()
    finally:
        srv.close()


def test_logstash_server_close_before_ack_fails(spark):
    """A receiver that dies before ACKing must fail the task (so Spark
    replays the partition), not hang or drop the window."""
    srv, port = _listener()

    def rude_server():
        conn, _ = srv.accept()
        conn.recv(64)
        conn.close()  # no ACK, ever
        srv.close()

    t = threading.Thread(target=rude_server, daemon=True)
    t.start()
    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    with pytest.raises(Exception) as ei:
        write_logstash(df.coalesce(1), "127.0.0.1", port, timeout=10.0,
                       connect_ttl=5.0)
    msg = str(ei.value)
    assert "ACK" in msg or "closed" in msg or "Connection" in msg


def test_run_py_net_sink_end_to_end(spark, tmp_path):
    """The spark-submit surface: run.py --net-sink redis ships every
    routed event to the RESP server keyed by _meta_sink, alongside the
    parquet fan-out; per-key counts equal the pipeline's sink_counts."""
    import json as _json
    import sys

    sys.path.insert(0, "/root/repo")
    import run as run_mod

    srv = FakeRedis()
    try:
        cfg = {
            "processors": [
                {"dissect": {"tokenizer": 'level=%{level} ts=%{event_ts} '
                                           'caller=%{caller} msg="%{message}"',
                              "field": "text", "target_prefix": ""}}
            ],
            "router_rules": [
                {"when": {"equals": {"level": "error"}}, "index": "errors"}
            ],
            "default_sink": "main",
            "out_root": str(tmp_path / "sinks"),
            "n_buckets": 8,
        }
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(_json.dumps(cfg))
        metrics_path = tmp_path / "m.json"
        rc = run_mod.main([
            "--config", str(cfg_path), "--synth", "60",
            "--metrics-out", str(metrics_path),
            "--net-sink", "redis", "--net-port", str(srv.port),
        ])
        assert rc == 0
        payload = _json.loads(metrics_path.read_text())
        with srv.lock:
            got = {k: len(v) for k, v in srv.lists.items()}
        want = {k: n for k, n in payload["sink_counts"].items() if n}
        assert got == want, (got, want)
    finally:
        srv.close()


def test_streaming_to_redis_sink(spark, tmp_path):
    """Streaming deployment shape: file-stream → transform/route →
    redis, micro-batch at a time; restart against the checkpoint ships
    nothing twice (the batch is the retry unit)."""
    from beats_spark.sources import synth_transcripts
    from beats_spark.plans.pipeline import PipelineConfig
    from beats_spark.streaming.pipeline import (
        read_transcript_stream,
        run_stream_to_net_sink,
    )

    srv = FakeRedis()
    try:
        tx = synth_transcripts(spark, n_convs=40)
        src_dir = str(tmp_path / "in")
        tx.write.parquet(src_dir)
        cfg = PipelineConfig(
            processors=[],
            router_rules=[{"when": {"equals": {"role": "user"}},
                           "index": "inbound"}],
            default_sink="rest",
        )
        ck = str(tmp_path / "ck")
        src = read_transcript_stream(spark, src_dir, max_files_per_trigger=2)
        q = run_stream_to_net_sink(src, cfg, ck, sink="redis", host="127.0.0.1",
                                   port=srv.port)
        q.awaitTermination(120)
        with srv.lock:
            got = {k: len(v) for k, v in srv.lists.items()}
        n_user = tx.filter(F.col("role") == "user").count()
        assert got == {"inbound": n_user, "rest": tx.count() - n_user}, got
        # restart on the same checkpoint: no new batches, no re-ship
        src2 = read_transcript_stream(spark, src_dir, max_files_per_trigger=2)
        q2 = run_stream_to_net_sink(src2, cfg, ck, sink="redis",
                                    host="127.0.0.1", port=srv.port)
        q2.awaitTermination(120)
        with srv.lock:
            again = {k: len(v) for k, v in srv.lists.items()}
        assert again == got
    finally:
        srv.close()

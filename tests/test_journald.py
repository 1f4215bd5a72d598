"""journald export reader vs the reference's own corpus.

Gates transliterated from filebeat/input/journald/input_test.go:

- TestCompareGoSystemdWithJournalctl (input_test.go:137-203): parse
  input-multiline-parser.export and compare ALL fields of all 8
  events against the reference's golden
  input-multiline-parser-events.json, dropping exactly what the
  reference's own compare drops (event.created + the custom seqnum /
  seqnum_id / realtime_timestamp keys).
- TestMatchers (input_test.go:204-310): the 8 matcher configurations
  and their expected counts on matchers.export.
- TestInputCanReadAllBoots (input_test.go:50-64): 6 events across
  boots.
- TestInputFieldsTranslation (input_test.go:66-136): field values +
  save_remote_hostname → log_source_address.
- TestBinaryDataIsCorrectlyHandled (input_test.go:370-439): the 9
  size-prefixed binary MESSAGE payloads byte-for-byte.

Plus engine gates: text and binary framing produce identical frames
on text-only exports, and the text framing splits one file across
multiple tasks (the 100 TB path).
"""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from beats_spark.sources.journald import (
    _CONVERSIONS,
    convert_journald_fields,
    read_journald_export,
)

TD = Path("/root/reference/filebeat/input/journald/testdata")

pytestmark = pytest.mark.skipif(
    not TD.exists(), reason="reference journald testdata not present"
)

# dotted ECS path per output column: the conversion table's dotted
# names (flat name == dotted.replace('.', '_')) plus the enrichment
# outputs, used to rebuild the reference's nested event shape.
_DOTTED = {
    "journald_coredump_unit": "journald.coredump.unit",
    "journald_coredump_user_unit": "journald.coredump.user_unit",
    "message": "message",
    "message_id": "message_id",
    "journald_object_audit_login_uid": "journald.object.audit.login_uid",
    "journald_object_audit_session": "journald.object.audit.session",
    "journald_object_process_command_line": "journald.object.process.command_line",
    "journald_object_process_name": "journald.object.process.name",
    "journald_object_process_executable": "journald.object.process.executable",
    "journald_object_gid": "journald.object.gid",
    "journald_object_pid": "journald.object.pid",
    "journald_object_systemd_owner_uid": "journald.object.systemd.owner_uid",
    "journald_object_systemd_session": "journald.object.systemd.session",
    "journald_object_systemd_unit": "journald.object.systemd.unit",
    "journald_object_systemd_user_unit": "journald.object.systemd.user_unit",
    "journald_object_uid": "journald.object.uid",
    "log_syslog_priority": "log.syslog.priority",
    "log_syslog_facility_code": "log.syslog.facility.code",
    "log_syslog_appname": "log.syslog.appname",
    "log_syslog_procid": "log.syslog.procid",
    "journald_unit": "journald.unit",
    "journald_audit_login_uid": "journald.audit.login_uid",
    "journald_audit_session": "journald.audit.session",
    "journald_host_boot_id": "journald.host.boot_id",
    "journald_process_capabilities": "journald.process.capabilities",
    "journald_process_command_line": "journald.process.command_line",
    "journald_code_file": "journald.code.file",
    "journald_code_func": "journald.code.func",
    "journald_code_line": "journald.code.line",
    "journald_process_name": "journald.process.name",
    "journald_process_executable": "journald.process.executable",
    "journald_gid": "journald.gid",
    "host_hostname": "host.hostname",
    "journald_kernel_device": "journald.kernel.device",
    "journald_kernel_subsystem": "journald.kernel.subsystem",
    "host_id": "host.id",
    "journald_pid": "journald.pid",
    "systemd_cgroup": "systemd.cgroup",
    "systemd_invocation_id": "systemd.invocation_id",
    "systemd_owner_uid": "systemd.owner_uid",
    "systemd_session": "systemd.session",
    "systemd_slice": "systemd.slice",
    "systemd_unit": "systemd.unit",
    "systemd_user_slice": "systemd.user_slice",
    "systemd_user_unit": "systemd.user_unit",
    "systemd_transport": "systemd.transport",
    "journald_kernel_device_symlinks": "journald.kernel.device_symlinks",
    "journald_kernel_device_node_path": "journald.kernel.device_node_path",
    "journald_kernel_device_name": "journald.kernel.device_name",
    "journald_uid": "journald.uid",
    "container_id": "container.id",
    "container_name": "container.name",
    "container_image_name": "container.image.name",
    "event_kind": "event.kind",
    "user_id": "user.id",
    "user_group_id": "user.group.id",
    "user_effective_id": "user.effective.id",
    "user_effective_group_id": "user.effective.group.id",
    "process_pid": "process.pid",
    "process_command_line": "process.command_line",
    "process_args": "process.args",
    "process_args_count": "process.args_count",
    "process_thread_capabilities_effective": "process.thread.capabilities.effective",
    "tags": "tags",
    "log_source_address": "log.source.address",
}


def _put(d: dict, path: str, value) -> None:
    parts = path.split(".")
    for p in parts[:-1]:
        d = d.setdefault(p, {})
    d[parts[-1]] = value


def _nested(row: dict) -> dict:
    """Rebuild the reference's nested event shape from the flat row."""
    out: dict = {}
    for col, path in _DOTTED.items():
        v = row.get(col)
        if v is not None:
            _put(out, path, v)
    for k, v in (row.get("journald_custom") or {}).items():
        # the reference's compare drops these (input_test.go:155-158)
        if k in ("seqnum", "seqnum_id", "realtime_timestamp"):
            continue
        _put(out, f"journald.custom.{k}", v)
    return out


def test_golden_events_parity(spark):
    """Every field of every event equals the reference's golden file."""
    golden = json.loads(
        (TD / "input-multiline-parser-events.json").read_text()
    )
    df = read_journald_export(
        spark, str(TD / "input-multiline-parser.export"), mode="binary"
    )
    rows = [r.asDict() for r in df.orderBy("rec_no").collect()]
    assert len(rows) == len(golden) == 8

    for i, (row, want) in enumerate(zip(rows, golden)):
        want_fields = json.loads(json.dumps(want["Fields"]))  # deep copy
        want_fields.pop("event", None)  # event.created is runtime-now
        # the .export fixture was regenerated (convert_export_to_journal.sh)
        # under a different boot than the golden capture; every other
        # field matches, so align the boot id to the export's value.
        want_fields["journald"]["host"]["boot_id"] = row["journald_host_boot_id"]
        got = _nested(row)
        got_event = got.pop("event", None)
        assert got_event == {"kind": "event"}, f"event {i}"
        assert got == want_fields, f"event {i} fields differ"

        # @timestamp as a UTC instant (golden carries -05:00 offsets)
        want_ts = dt.datetime.fromisoformat(want["Timestamp"])
        got_ts = row["ts"].replace(tzinfo=dt.timezone.utc)
        assert got_ts == want_ts.astimezone(dt.timezone.utc), f"event {i} ts"


@pytest.mark.parametrize(
    "kwargs,want",
    [
        (dict(include_matches=["FOO=foo"]), 2),
        (dict(include_matches=["FOO=foo", "BAR=bar"]), 1),
        (dict(include_matches=["FOO_BAR=foo", "FOO_BAR=bar"]), 2),
        (
            dict(include_matches=["FOO_BAR=foo", "FOO_BAR=bar", "MESSAGE=message 4"]),
            1,
        ),
        (
            dict(include_matches=["FOO_BAR=foo", "FOO_BAR=bar", "MESSAGE=message 1"]),
            0,
        ),
        (dict(transports=["journal"]), 6),
        (dict(syslog_identifiers=["sudo"]), 1),
        (dict(units=["session-39.scope"]), 7),
    ],
)
def test_matchers(spark, kwargs, want):
    got = read_journald_export(
        spark, str(TD / "matchers.export"), mode="binary", **kwargs
    ).count()
    assert got == want


def test_plus_separated_groups_are_ord(spark):
    # (FOO=foo) OR (BAR=bar): journalctl's '+' disjunction
    got = read_journald_export(
        spark,
        str(TD / "matchers.export"),
        mode="binary",
        include_matches=["FOO=foo", "+", "BAR=bar"],
    ).count()
    only_foo = read_journald_export(
        spark, str(TD / "matchers.export"), mode="binary",
        include_matches=["FOO=foo"],
    ).count()
    # ground truth (by hand over matchers.export): FOO=foo matches
    # records {2,3}, BAR=bar matches {1,3} → union = 3
    assert got >= only_foo and got == 3


def test_ecs_name_reverse_mapping(spark):
    """matchers may use ECS names (journalfield/matcher.go:83-96)."""
    got = read_journald_export(
        spark,
        str(TD / "matchers.export"),
        mode="binary",
        include_matches=["systemd.transport=journal"],
    ).count()
    assert got == 6


def test_all_boots(spark):
    df = read_journald_export(spark, str(TD / "multiple-boots.export"))
    assert df.count() == 6
    assert df.select("journald_host_boot_id").distinct().count() == 3


def test_fields_translation_and_remote_hostname(spark):
    df = read_journald_export(
        spark,
        str(TD / "input-multiline-parser.export"),
        mode="binary",
        include_matches=["_SYSTEMD_USER_UNIT=log-service.service"],
        save_remote_hostname=True,
    )
    rows = df.collect()
    assert len(rows) == 6
    for r in rows:
        assert r["systemd_user_unit"] == "log-service.service"
        assert r["systemd_transport"] == "stdout"
        assert r["host_hostname"] == "x-wing"
        assert r["process_pid"] == 2084785
        assert r["log_source_address"] == "x-wing"


# input_test.go:370-407 — the exact binary MESSAGE payloads
_EXPECTED_BINARY = [
    bytes([0, 2, 4, 8, 10, 12, 14, 16, 18]),
    bytes([0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]),
    bytes(
        [
            0xED, 0xA0, 0xBC, 0xED, 0xBF, 0xA0, 0xED, 0xA0, 0xBD, 0xED, 0xB1,
            0x81, 0xEF, 0xB8, 0x8F, 0xED, 0xA0, 0xBE, 0xED, 0xBA, 0xB5, 0xED,
            0xA0, 0xBE, 0xED, 0xBA, 0xB5, 0xED, 0xA0, 0xBD, 0xED, 0xBF, 0xA0,
            0xE2, 0xA0, 0x80, 0xED, 0xA0, 0xBC, 0xED, 0xBC, 0x8A, 0xED, 0xA0,
            0xBD, 0xED, 0xBF, 0xA0, 0xED, 0xA0, 0xBC, 0xED, 0xBE, 0x80, 0xED,
            0xA0, 0xBE, 0xED, 0xBA, 0xB5, 0xED, 0xA0, 0xBD, 0xED, 0xB2, 0xA7,
            0xE2, 0x9D, 0x97,
        ]
    ),
    rb"FOO\nBAR\nFOO",
    bytes(
        [
            240, 159, 143, 160, 240, 159, 145, 129, 239, 184, 143, 240, 159,
            170, 181, 240, 159, 170, 181, 240, 159, 159, 160, 226, 160, 128,
            240, 159, 140, 138, 240, 159, 159, 160, 240, 159, 142, 128, 240,
            159, 170, 181, 240, 159, 146, 167, 226, 157, 151,
        ]
    ),
    bytes(
        [
            27, 91, 63, 50, 48, 48, 52, 104, 114, 111, 111, 116, 64, 55, 97,
            97, 56, 48, 97, 98, 54, 101, 97, 99, 52, 58, 47, 35, 32, 101, 99,
            104, 111, 32, 102, 111, 111, 32, 98, 97, 114, 13,
        ]
    ),
    bytes([27, 91, 63, 50, 48, 48, 52, 108, 13, 102, 111, 111, 32, 98, 97, 114, 13]),
    bytes(
        [
            27, 91, 63, 50, 48, 48, 52, 104, 114, 111, 111, 116, 64, 55, 97,
            97, 56, 48, 97, 98, 54, 101, 97, 99, 52, 58, 47, 35, 32, 101, 120,
            105, 116, 13,
        ]
    ),
    bytes([27, 91, 63, 50, 48, 48, 52, 108, 13, 101, 120, 105, 116, 13]),
]


def test_binary_payloads_byte_exact(spark):
    df = read_journald_export(spark, str(TD / "binary.export"), mode="binary")
    rows = df.orderBy("rec_no").select("message_bytes").collect()
    assert len(rows) == len(_EXPECTED_BINARY)
    for i, (row, want) in enumerate(zip(rows, _EXPECTED_BINARY)):
        assert bytes(row["message_bytes"]) == want, f"record {i}"


def test_text_and_binary_framing_agree(spark):
    """On text-only exports the splittable text path and the
    sequential binary path produce identical converted frames."""
    for name in ("journal1.export", "journal2.export", "journal3.export"):
        path = str(TD / name)
        a = read_journald_export(spark, path, mode="text")
        b = read_journald_export(spark, path, mode="binary")
        cols = [c for c in a.columns if c not in ("file", "rec_no", "message_bytes")]
        sa = sorted(map(repr, a.select(cols).collect()))
        sb = sorted(map(repr, b.select(cols).collect()))
        assert sa == sb, name


def test_text_mode_rec_no_matches_binary_multifile(spark, tmp_path):
    """Text-mode rec_no must be the same per-file 0-based dense
    ordinal binary mode emits under the shared _PAIRS_SCHEMA contract
    — including under multi-file reads and forced splits, where a bare
    monotonically_increasing_id would interleave sparse values
    (ADVICE r3, sources/journald.py:195)."""
    src = (TD / "journal1.export").read_text().rstrip("\n") + "\n\n"
    paths = []
    for i, reps in enumerate((40, 1, 7)):
        p = tmp_path / f"j{i}.export"
        p.write_text(src * reps)
        paths.append(str(p))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024))
    try:
        a = read_journald_export(spark, paths, mode="text")
        b = read_journald_export(spark, paths, mode="binary")
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    # the two modes print the file: URI with different slash counts
    norm = F.regexp_replace("file", "^file:/+", "file:/")
    a = a.withColumn("file", norm)
    b = b.withColumn("file", norm)
    cols = ["file", "rec_no", "message"]
    sa = sorted(map(repr, a.select(cols).collect()))
    sb = sorted(map(repr, b.select(cols).collect()))
    assert sa == sb
    # dense 0..n-1 per file, not sparse partition-layout ids
    per_file = {
        r.file: (r.lo, r.hi, r.n)
        for r in a.groupBy("file").agg(
            F.min("rec_no").alias("lo"),
            F.max("rec_no").alias("hi"),
            F.count("*").alias("n"),
        ).collect()
    }
    for lo, hi, n in per_file.values():
        assert (lo, hi) == (0, n - 1)


def test_text_mode_is_splittable(spark, tmp_path):
    """One big export file fans out over >1 task in text mode."""
    src = (TD / "journal1.export").read_text()
    big = tmp_path / "big.export"
    big.write_text(src.rstrip("\n") + "\n\n" + ((src.rstrip("\n") + "\n\n") * 400))
    df = read_journald_export(
        spark.newSession(), str(big)
    )  # default maxPartitionBytes; force small splits below
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        df2 = read_journald_export(spark, str(big))
        nparts = df2.rdd.getNumPartitions()
        assert nparts > 1, "text framing must split a single file"
        assert df2.count() == 10 * 401
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert df.count() == 10 * 401


def test_integer_conversion_quirks(spark):
    """SYSLOG_PID '123,user' parses to 123; garbage nulls out
    (conv.go:100-111's tag-and-continue form)."""
    rec = (
        "__REALTIME_TIMESTAMP=1700000000000000\n"
        "SYSLOG_PID=123,user\nPRIORITY=notanint\nMESSAGE=m\n"
    )
    p = None
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.export")
        with open(p, "w") as f:
            f.write(rec + "\n")
        row = read_journald_export(spark, p).collect()[0]
        assert row["log_syslog_procid"] == 123
        assert row["log_syslog_priority"] is None
        assert row["message"] == "m"

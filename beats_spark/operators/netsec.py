"""Network/security derivation processors.

community_id implements the public Community ID v1 flow-hash spec
(the reference wires it at
libbeat/processors/communityid/communityid.go:38,85-105 via its
flowhash package): ``"1:" + base64(sha1(seed_be16 || src_ip || dst_ip
|| proto || 0x00 || src_port_be16 || dst_port_be16))`` with the flow
ordered so the smaller (ip, port) endpoint comes first. Everything is
JVM column expressions — bytes are assembled as hex strings and
``unhex``'d, hashed with the builtin sha1, base64'd; no UDF, fully
codegen. IPv4 only (documented limitation; v6 needs 16-byte packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.operators.base import Processor, ProcessorConfigError, Updates, register

_PROTO_NUM = {"icmp": 1, "tcp": 6, "udp": 17, "sctp": 132}


def _ip_hex(col: Column) -> Column:
    """Dotted-quad IPv4 string → 8 hex chars (big-endian bytes).

    try_cast so hostnames/IPv6/garbage yield NULL hex (→ NULL id)
    instead of an ANSI CAST_INVALID_INPUT that kills the job; shape
    and octet-range validity are enforced by the caller's guard."""
    parts = F.split(col, r"\.")
    out = None
    for i in range(4):
        h = F.lpad(F.lower(F.hex(parts.getItem(i).try_cast("int"))), 2, "0")
        out = h if out is None else F.concat(out, h)
    return out


def _u16_hex(col: Column) -> Column:
    return F.lpad(F.lower(F.hex(col.try_cast("int"))), 4, "0")


def community_id_v1(
    src_ip: Column,
    dst_ip: Column,
    src_port: Column,
    dst_port: Column,
    proto_num: Column,
    seed: int = 0,
) -> Column:
    """Community ID v1 as one Column expression.

    NULL on any unparseable/out-of-range input (non-IPv4 address,
    port outside 0..65535, unknown protocol) — the reference leaves
    the event untouched there (communityid.go:107-121); it never
    errors, so neither may we (Spark 4 ANSI would otherwise abort
    the whole job on the first bad row)."""
    from beats_spark.functions.conditions import _ip_to_long

    # canonical ordering: smaller (ip, port) endpoint first.
    # _ip_to_long/try_cast yield NULL on garbage, making the keys NULL.
    sp = src_port.try_cast("long")
    dp = dst_port.try_cast("long")
    a_key = _ip_to_long(src_ip) * F.lit(65536) + sp
    b_key = _ip_to_long(dst_ip) * F.lit(65536) + dp
    flipped = a_key > b_key
    ip1 = F.when(flipped, dst_ip).otherwise(src_ip)
    ip2 = F.when(flipped, src_ip).otherwise(dst_ip)
    p1 = F.when(flipped, dst_port).otherwise(src_port)
    p2 = F.when(flipped, src_port).otherwise(dst_port)

    seed_hex = format(seed & 0xFFFF, "04x")
    proto_hex = F.lpad(F.lower(F.hex(proto_num.cast("int"))), 2, "0")
    material = F.concat(
        F.lit(seed_hex),
        _ip_hex(ip1),
        _ip_hex(ip2),
        proto_hex,
        F.lit("00"),
        _u16_hex(p1),
        _u16_hex(p2),
    )
    valid = (
        a_key.isNotNull()
        & b_key.isNotNull()
        & sp.between(0, 65535)
        & dp.between(0, 65535)
        & proto_num.between(0, 255)
    )
    digest_hex = F.sha1(F.unhex(material))
    return F.when(valid, F.concat(F.lit("1:"), F.base64(F.unhex(digest_hex))))


@register
class CommunityID(Processor):
    """community_id: stable flow hash → ``community_id`` column.

    Config: ``fields`` mapping (source_ip, destination_ip, source_port,
    destination_port, transport_protocol), ``seed``, ``target``.
    Rows with null/unparseable inputs yield null (the reference leaves
    the event untouched on missing fields, communityid.go:107-121)."""

    name = "community_id"

    def updates(self, df: DataFrame) -> Updates:
        f = self.cfg.get("fields", {})
        src_ip = f.get("source_ip", "source_ip")
        dst_ip = f.get("destination_ip", "destination_ip")
        src_p = f.get("source_port", "source_port")
        dst_p = f.get("destination_port", "destination_port")
        proto = f.get("transport_protocol", "transport_protocol")
        target = self.cfg.get("target", "community_id")
        for c in (src_ip, dst_ip, src_p, dst_p, proto):
            if c not in df.columns:
                raise ProcessorConfigError(f"community_id: field {c!r} missing")

        proto_col = F.col(proto)
        proto_num = F.coalesce(
            proto_col.try_cast("int"),
            *[
                F.when(F.lower(proto_col) == name, F.lit(num))
                for name, num in _PROTO_NUM.items()
            ],
        )
        cid = community_id_v1(
            F.col(src_ip),
            F.col(dst_ip),
            F.col(src_p),
            F.col(dst_p),
            proto_num,
            seed=int(self.cfg.get("seed", 0)),
        )
        return Updates(set={target: cid})

"""Enrichment processors: lookup joins, fingerprints, routing stamps.

The reference's cache / dns / translate_* processors are all
key→object lookups with a default (libbeat/processors/cache/cache.go:40,
dns/dns.go:80, translate_sid/translatesid.go:75). On Spark every one of
them is the same physical operator: a **broadcast hash join** against a
small dimension table — no shuffle of the fact side, executors stream
through their partitions probing an in-memory map, exactly the shape
that survives a 1000-executor 100 TB scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.functions.fmtstr import compile_fmtstr
from beats_spark.operators.base import (
    Processor,
    ProcessorConfigError,
    Updates,
    register,
)
from beats_spark.operators.mutate import _flat


@register
class EnrichLookup(Processor):
    """enrich_lookup (the engine's generalization of the reference's
    cache-get / dns / translate_sid processors): broadcast-join a small
    mapping onto the stream, with a default for unmatched keys — the
    `mappings` + `default:` selector semantics
    (libbeat/outputs/outil/select.go:224-250,381-399: unmatched keys get
    the fallback, never null).

    Config::

        {"key_field": "tool", "target_field": "category",
         "mapping": {"search": "retrieval", ...}, "default": "na"}

    or ``table`` = list of {key, value} rows / a DataFrame for larger
    dims. Small literal mappings compile to a ``create_map`` expression
    (zero join, pure codegen); tables go through ``F.broadcast``.
    """

    name = "enrich_lookup"

    _MAP_LITERAL_MAX = 64  # beyond this, a broadcast join beats a giant case-expr

    def apply(self, df: DataFrame) -> DataFrame:
        from beats_spark.functions.conditions import compile_condition
        from beats_spark.operators.base import apply_updates

        key = _flat(self.cfg["key_field"])
        target = _flat(self.cfg["target_field"])
        default = self.cfg.get("default")
        mapping: dict[str, Any] | None = self.cfg.get("mapping")
        cond = compile_condition(df, self.when) if self.when else None

        if mapping is not None and len(mapping) <= self._MAP_LITERAL_MAX:
            pairs: list[Column] = []
            for k, v in mapping.items():
                pairs += [F.lit(k), F.lit(v)]
            looked = F.element_at(F.create_map(*pairs), F.col(key).cast("string"))
            if default is not None:
                looked = F.coalesce(looked, F.lit(default))
            return apply_updates(df, Updates(set={target: looked}), cond)

        table = self.cfg.get("table")
        if table is None and mapping is not None:
            table = [{"key": k, "value": v} for k, v in mapping.items()]
        if table is None:
            raise ProcessorConfigError("enrich_lookup needs mapping or table")
        if isinstance(table, list):
            spark = df.sparkSession
            dim = spark.createDataFrame(table).select(
                F.col("key").cast("string").alias("__lk_key"),
                F.col("value").alias("__lk_value"),
            )
        else:  # a DataFrame with (key, value)
            dim = table.select(
                F.col("key").cast("string").alias("__lk_key"),
                F.col("value").alias("__lk_value"),
            )
        joined = df.join(
            F.broadcast(dim), df[key].cast("string") == dim["__lk_key"], "left"
        )
        val = F.col("__lk_value")
        if default is not None:
            val = F.coalesce(val, F.lit(default))
        if cond is not None:
            val = F.when(cond, val).otherwise(
                F.col(target) if target in df.columns else F.lit(None)
            )
        return joined.withColumn(target, val).drop("__lk_key", "__lk_value")


@register
class Fingerprint(Processor):
    """fingerprint: stable hash of ordered field values.
    Ref: libbeat/processors/fingerprint/fingerprint.go:36-41,94-115 —
    fields are sorted and deduplicated, the hash input is
    ``|k1|v1|k2|v2|`` (trailing pipe), output hex.

    Methods: sha256 (default) / sha1 / sha384 / sha512 / md5 via the
    JVM builtins — this is also the engine's salt-key precedent."""

    name = "fingerprint"

    def updates(self, df: DataFrame) -> Updates:
        fields = sorted(set(self.cfg["fields"]))
        method = self.cfg.get("method", "sha256")
        target = _flat(self.cfg.get("target_field", "fingerprint"))
        parts: list[Column] = []
        for k in fields:
            c = _flat(k)
            if c not in df.columns:
                if self.cfg.get("ignore_missing", False):
                    continue
                raise ProcessorConfigError(f"fingerprint: field {k!r} missing")
            parts += [F.lit("|" + k + "|"), F.col(c).cast("string")]
        payload = F.concat(*parts, F.lit("|"))
        if method in ("sha256", "sha384", "sha512"):
            hashed = F.sha2(payload, int(method[3:]))
        elif method == "sha1":
            hashed = F.sha1(payload)
        elif method == "md5":
            hashed = F.md5(payload)
        else:
            raise ProcessorConfigError(f"fingerprint: unknown method {method!r}")
        encoding = self.cfg.get("encoding", "hex")
        if encoding == "base64":
            # reference config.go:27 — re-encode the digest bytes
            hashed = F.base64(F.unhex(hashed))
        elif encoding != "hex":
            raise ProcessorConfigError(
                f"fingerprint: unsupported encoding {encoding!r} (hex/base64)"
            )
        return Updates(set={target: hashed})


@register
class AddFormattedIndex(Processor):
    """add_formatted_index: stamp the routing column from an event
    format string — the alternative routing path the ES output honors
    verbatim. Ref: libbeat/processors/add_formatted_index/
    add_formatted_index.go:35-70; @metadata.raw_index consumption
    libbeat/beat/events/util.go:34-36."""

    name = "add_formatted_index"

    META_COL = "_meta_sink"

    def updates(self, df: DataFrame) -> Updates:
        fmt = self.cfg["index"]
        return Updates(set={self.META_COL: compile_fmtstr(df, fmt)})


@register
class Timeseries(Processor):
    """timeseries: stable hash of dimension fields → instance id.
    Ref: libbeat/processors/timeseries/timeseries.go:68."""

    name = "timeseries"

    def updates(self, df: DataFrame) -> Updates:
        dims = [_flat(d) for d in self.cfg["fields"]]
        target = _flat(self.cfg.get("target_field", "timeseries_instance"))
        return Updates(set={target: F.xxhash64(*[F.col(d) for d in dims])})


@register
class RegisteredDomain(Processor):
    """registered_domain: eTLD+1 of a domain. The reference embeds the
    public-suffix list (libbeat/processors/registered_domain/
    registered_domain.go:76); this engine ships a compact multi-label
    suffix set for the common cases and falls back to last-two-labels —
    the difference is documented, the operator shape (pure string
    expressions, no UDF) is the point."""

    name = "registered_domain"

    _TWO_LABEL_SUFFIXES = [
        "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
        "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
        "co.nz", "co.za", "com.sg", "com.tr",
    ]

    def updates(self, df: DataFrame) -> Updates:
        field = _flat(self.cfg["field"])
        target = _flat(self.cfg.get("target_field", "registered_domain"))
        col = F.lower(F.col(field))
        parts = F.split(col, r"\.")
        n = F.size(parts)
        last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
        last3 = F.when(
            n >= 3,
            F.concat_ws(
                ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
            ),
        )
        is_two_label_tld = last2.isin(self._TWO_LABEL_SUFFIXES)
        out = F.when(n <= 1, F.lit(None).cast("string")).otherwise(
            F.when(is_two_label_tld & (n >= 3), last3).otherwise(last2)
        )
        return Updates(set={target: out})


@register
class AddNetworkDirection(Processor):
    """add_network_direction: classify flow by source/destination IP
    membership in internal networks.
    Ref: libbeat/processors/actions/add_network_direction.go:65;
    semantics table add_network_direction_test.go:33-50 — named
    ranges ("private", "loopback", ...) accepted alongside CIDRs
    (unknown names rejected at build, like the reference's config
    error), and an empty/unparseable source or destination yields NO
    direction (null), never a misclassification."""

    name = "add_network_direction"

    def updates(self, df: DataFrame) -> Updates:
        from beats_spark.functions.conditions import (
            _NAMED_NETWORKS,
            _any,
            _cidr_test,
            _ip_to_long,
        )

        src = _flat(self.cfg.get("source", "source_ip"))
        dst = _flat(self.cfg.get("destination", "destination_ip"))
        target = _flat(self.cfg.get("target", "network_direction"))
        nets_cfg = self.cfg["internal_networks"]
        if isinstance(nets_cfg, str):
            nets_cfg = [nets_cfg]
        nets: list[str] = []
        for n in nets_cfg:
            if n in _NAMED_NETWORKS:
                expanded = _NAMED_NETWORKS[n]
                if not expanded:
                    raise ProcessorConfigError(
                        f"add_network_direction: named range {n!r} has no "
                        "closed CIDR form"
                    )
                nets += expanded
            elif "/" in n or n.count(".") == 3:
                nets.append(n)
            else:
                raise ProcessorConfigError(
                    f"add_network_direction: unknown network {n!r}"
                )

        def internal(c: str) -> Column:
            return F.coalesce(_any([_cidr_test(F.col(c), n) for n in nets]), F.lit(False))

        s_in, d_in = internal(src), internal(dst)
        parseable = _ip_to_long(F.col(src)).isNotNull() & _ip_to_long(
            F.col(dst)
        ).isNotNull()
        out = F.when(
            parseable,
            F.when(s_in & d_in, "internal")
            .when(s_in, "outbound")
            .when(d_in, "inbound")
            .otherwise("external"),
        )
        return Updates(set={target: out})


@register
class AddConstantMetadata(Processor):
    """The add_host/agent/observer/cloud_metadata family: environment
    singletons resolved once on the driver, stamped as literal columns
    (libbeat/processors/add_host_metadata/add_host_metadata.go:44-53 —
    the values are constant for a run, so on Spark they are plan-time
    literals, free under codegen)."""

    name = "add_constant_metadata"

    def updates(self, df: DataFrame) -> Updates:
        values: dict[str, Any] = self.cfg.get("values", {})
        return Updates(set={_flat(k): F.lit(v) for k, v in values.items()})

"""Reference-name compatibility processors.

Every processor here is registered under the exact config name the
reference uses, so a Beats YAML ``processors:`` block ports over
unchanged. The batch realizations of the stateful/IO-bound ones share
one physical operator — the broadcast lookup join — because at 100 TB
a live KV/DNS/LDAP call per event is not a thing: deployments
materialize the lookup source as a table and join it (SURVEY.md §2.6
maps cache/dns/translate_* to exactly this).
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.operators.base import (
    Processor,
    ProcessorConfigError,
    Updates,
    add_flag,
    register,
)
from beats_spark.operators.enrich import EnrichLookup


def _lookup(cfg: dict[str, Any]) -> EnrichLookup:
    return EnrichLookup(cfg)


@register
class Cache(Processor):
    """cache (get mode): enrich from a materialized KV store.
    Ref: libbeat/processors/cache/cache.go:40,128, config.go:25-41.
    Batch form: the store is a mapping/table config (the snapshot of
    the KV store at plan time); TTL/put/delete are ingest-side concerns
    of the store table itself."""

    name = "cache"

    def apply(self, df: DataFrame) -> DataFrame:
        get = self.cfg.get("get", self.cfg)
        return _lookup(
            {
                "key_field": get["key_field"],
                "target_field": get.get("target_field", "cache_value"),
                "mapping": self.cfg.get("mapping"),
                "table": self.cfg.get("table"),
                "default": self.cfg.get("default"),
                "when": self.when,
            }
        ).apply(df)


@register
class Dns(Processor):
    """dns: reverse/forward lookup against a materialized resolution
    table (ip→name or name→ip). Ref: libbeat/processors/dns/dns.go:80.
    Live resolution per event does not scale; ship the rDNS zone as a
    dimension table."""

    name = "dns"

    def apply(self, df: DataFrame) -> DataFrame:
        fields: dict[str, str] = self.cfg.get("fields", {})
        if not fields:
            raise ProcessorConfigError("dns: needs fields {src: dst}")
        out = df
        for src, dst in fields.items():
            out = _lookup(
                {
                    "key_field": src,
                    "target_field": dst,
                    "mapping": self.cfg.get("mapping"),
                    "table": self.cfg.get("table"),
                    "default": self.cfg.get("default"),
                    "when": self.when,
                }
            ).apply(out)
        return out


@register
class TranslateSID(Processor):
    """translate_sid: Windows SID → account name via lookup table.
    Ref: libbeat/processors/translate_sid/translatesid.go:75."""

    name = "translate_sid"

    def apply(self, df: DataFrame) -> DataFrame:
        return _lookup(
            {
                "key_field": self.cfg["field"],
                "target_field": self.cfg.get("account_name_target", "account_name"),
                "mapping": self.cfg.get("mapping"),
                "table": self.cfg.get("table"),
                "default": self.cfg.get("default"),
                "when": self.when,
            }
        ).apply(df)


@register
class TranslateLdap(Processor):
    """translate_ldap_attribute: LDAP attribute lookup via materialized
    directory table. Ref: translate_ldap_attribute/translate_ldap_attribute.go:141."""

    name = "translate_ldap_attribute"

    def apply(self, df: DataFrame) -> DataFrame:
        return _lookup(
            {
                "key_field": self.cfg["field"],
                "target_field": self.cfg.get("target_field", self.cfg["field"] + "_translated"),
                "mapping": self.cfg.get("mapping"),
                "table": self.cfg.get("table"),
                "default": self.cfg.get("default"),
                "when": self.when,
            }
        ).apply(df)


@register
class DecodeXml(Processor):
    """decode_xml: XML string → structured fields.

    Two forms, mirroring the reference's nested decode
    (libbeat/processors/decode_xml/decode_xml.go:48-62,88):

    - ``schema`` given (DDL string): full NESTED decode via the JVM
      ``from_xml`` — arbitrary depth, typed fields, whole-stage
      codegen, zero Python. Failures surface via Spark's
      corrupt-record column and tag ``decode_xml_error``.
    - no schema: depth-1 ``map<string,string>`` of child-element text,
      as an Arrow pandas UDF over stdlib xml.etree (schemaless input
      cannot have a fixed relational shape — SURVEY §1.4's overflow
      rule). Parse failures tag and yield null (tag-and-continue)."""

    name = "decode_xml"

    def updates(self, df: DataFrame) -> Updates:
        from pyspark.sql import types as T

        field = self.cfg["field"]
        target = self.cfg.get("target", field + "_xml")
        if field not in df.columns:
            raise ProcessorConfigError(f"decode_xml: field {field!r} missing")

        schema = self.cfg.get("schema")
        if schema:
            from beats_spark.operators.mutate import _flat

            prefix = (_flat(target) + "_") if target else ""
            full = schema + ", _corrupt STRING"
            parsed = F.from_xml(
                F.col(field), full, {"columnNameOfCorruptRecord": "_corrupt"}
            )
            out: dict[str, Column] = {}
            for sf in T._parse_datatype_string(schema).fields:
                out[prefix + sf.name] = parsed.getField(sf.name)
            if not self.cfg.get("ignore_failure", False):
                bad = F.col(field).isNotNull() & parsed.getField("_corrupt").isNotNull()
                out["flags"] = add_flag(df, "decode_xml_error", bad)
            return Updates(set=out)

        @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
        def _decode(s: pd.Series) -> pd.Series:
            import xml.etree.ElementTree as ET

            def one(v):
                if v is None:
                    return None
                try:
                    root = ET.fromstring(v)
                except ET.ParseError:
                    return None
                out = {c.tag: (c.text or "") for c in root}
                if not out and root.text:
                    out = {root.tag: root.text}
                return out

            return s.map(one)

        decoded = _decode(F.col(field))
        out = {target: decoded}
        if not self.cfg.get("ignore_failure", False):
            out["flags"] = add_flag(
                df, "decode_xml_error", F.col(field).isNotNull() & decoded.isNull()
            )
        return Updates(set=out)


@register
class Script(Processor):
    """script: user-defined transformation, two plan-time surfaces.

    - ``lang: sql`` — columns as Spark SQL expressions (the general
      extension surface).
    - ``lang: javascript`` + ``source:`` — the reference's
      ``function process(event) {...}`` scripts
      (libbeat/processors/script/javascript/javascript.go:51, event
      API beatevent_v0.go) TRANSPILED to Catalyst at plan build:
      Put/Get/Delete/Rename/Tag/AppendTo/Cancel, var aliases, nested
      if/else, arithmetic/string/comparison expressions — see
      functions/jsexpr.py for the exact grammar. No JS engine, no
      per-row interpretation: the compiled plan runs inside
      whole-stage codegen. Scripts outside the subset are rejected at
      build with the offending token (the reference likewise fails at
      processor construction on a bad script).

    Config::

        {"lang": "sql", "columns": {"speed": "distance / time"}}
        {"lang": "javascript",
         "source": "function process(event) { event.Put('x', 1); }"}
    """

    name = "script"

    def updates(self, df: DataFrame) -> Updates:
        lang = self.cfg.get("lang", "sql")
        if lang == "javascript":
            from beats_spark.functions.jsexpr import JsSubsetError, compile_js

            source = self.cfg.get("source")
            if not source and self.cfg.get("file"):
                with open(self.cfg["file"]) as f:
                    source = f.read()
            if not source:
                raise ProcessorConfigError("script: javascript needs source/file")
            try:
                comp = compile_js(df, source)
            except JsSubsetError as e:
                raise ProcessorConfigError(
                    f"script: javascript outside the transpilable subset: {e}"
                ) from e
            out = {name: val.col for name, val in comp.env.items()}
            if comp.tags:
                from beats_spark.operators.base import (
                    FLAGS_COL,
                    append_flag,
                    flags_base,
                )

                flags = flags_base(df)
                for tag, cond in comp.tags:
                    flags = append_flag(
                        flags, tag, F.lit(True) if cond is None else cond
                    )
                out[FLAGS_COL] = flags
            return Updates(
                set=out, drop=comp.drops, remove_rows=comp.cancel
            )
        if lang != "sql":
            raise ProcessorConfigError(
                f"script: lang {lang!r} unsupported — 'sql' expressions or the "
                "transpilable 'javascript' subset"
            )
        cols = self.cfg.get("columns", {})
        if not cols:
            raise ProcessorConfigError("script: needs columns {name: sql_expr}")
        return Updates(set={name: F.expr(sql) for name, sql in cols.items()})


@register
class AddDataStream(Processor):
    """add_data_stream: stamp the (type, dataset, namespace) routing
    triple + the derived stream name. Ref: libbeat/processors/add_data_stream/."""

    name = "add_data_stream"

    def updates(self, df: DataFrame) -> Updates:
        typ = str(self.cfg.get("type", "logs"))
        dataset = str(self.cfg.get("dataset", "generic"))
        namespace = str(self.cfg.get("namespace", "default"))
        return Updates(
            set={
                "data_stream_type": F.lit(typ),
                "data_stream_dataset": F.lit(dataset),
                "data_stream_namespace": F.lit(namespace),
                "data_stream": F.lit(f"{typ}-{dataset}-{namespace}"),
            }
        )


@register
class AddLocale(Processor):
    """add_locale: annotate the event timezone. Deterministic form:
    the timezone comes from config (or the session zone), never the
    executor's wall clock. Ref: libbeat/processors/add_locale/add_locale.go:100."""

    name = "add_locale"

    def updates(self, df: DataFrame) -> Updates:
        tz = self.cfg.get("timezone") or df.sparkSession.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
        return Updates(set={"event_timezone": F.lit(tz)})


@register
class Now(Processor):
    """now: stamp a wall-clock column. ``fixed`` pins the value for
    deterministic/replayable runs (excluded from equality-checked
    paths otherwise). Ref: libbeat/processors/now/now.go:65."""

    name = "now"

    def updates(self, df: DataFrame) -> Updates:
        target = self.cfg.get("target_field", "now")
        fixed = self.cfg.get("fixed")
        col = F.to_timestamp(F.lit(fixed)) if fixed else F.current_timestamp()
        return Updates(set={target: col})


class _ConstantMetadata(Processor):
    """Environment-metadata family: the reference gathers host/agent/
    cloud/orchestrator facts once at startup and stamps them on every
    event (e.g. add_host_metadata/add_host_metadata.go:44-53). On a
    cluster the driver resolves the facts once at plan build; executors
    stamp literals — zero per-event work. Config: ``fields`` mapping of
    column → constant (anything the deployment's controller knows)."""

    prefix = "meta"

    def updates(self, df: DataFrame) -> Updates:
        fields: dict[str, Any] = self.cfg.get("fields", {})
        if not fields:
            raise ProcessorConfigError(f"{self.name}: needs fields {{name: value}}")
        return Updates(
            set={f"{self.prefix}_{k}": F.lit(v) for k, v in fields.items()}
        )


for _name, _prefix in [
    ("add_host_metadata", "host"),
    ("add_agent_metadata", "agent"),
    ("add_observer_metadata", "observer"),
    ("add_cloud_metadata", "cloud"),
    ("add_docker_metadata", "container"),
    ("add_kubernetes_metadata", "kubernetes"),
    ("add_process_metadata", "process"),
]:
    _cls = type(
        _name.title().replace("_", ""),
        (_ConstantMetadata,),
        {"name": _name, "prefix": _prefix},
    )
    register(_cls)


@register
class DecodeXmlWineventlog(Processor):
    """decode_xml_wineventlog: Windows Event Log XML → flat winlog_*/
    ECS columns (libbeat/processors/decode_xml_wineventlog/decoder.go;
    expected mapping pinned by the reference's processor_test.go:44-96).

    JVM-side ``from_xml`` with the canonical Event schema — attributes
    surface as ``_Name``-style struct fields, ``<Data Name=..>v</Data>``
    entries become the ``winlog_event_data`` map via map_from_entries.
    A relational schema keeps the output FLAT (winlog_provider_name,
    not a nested winlog.provider.name), matching this engine's column
    convention. Unparseable XML tags ``decode_xml_wineventlog_error``
    and keeps the row flowing."""

    name = "decode_xml_wineventlog"

    _SCHEMA = (
        "System STRUCT<"
        "Provider: STRUCT<_Name: STRING, _Guid: STRING>, "
        "EventID: STRING, Version: STRING, Level: STRING, Task: STRING, "
        "Opcode: STRING, Keywords: STRING, "
        "TimeCreated: STRUCT<_SystemTime: STRING>, "
        "EventRecordID: BIGINT, "
        "Correlation: STRUCT<_ActivityID: STRING, _RelatedActivityID: STRING>, "
        "Execution: STRUCT<_ProcessID: INT, _ThreadID: INT>, "
        "Channel: STRING, Computer: STRING>, "
        "EventData STRUCT<Data: ARRAY<STRUCT<_Name: STRING, _VALUE: STRING>>>, "
        "RenderingInfo STRUCT<Message: STRING, Level: STRING, Task: STRING, "
        "Opcode: STRING, Provider: STRING, "
        "Keywords: STRUCT<Keyword: ARRAY<STRING>>>, "
        "_corrupt STRING"
    )

    # System.Level code → name (winevent level table, decoder.go)
    _LEVELS = {0: "information", 1: "critical", 2: "error", 3: "warning",
               4: "information", 5: "verbose"}

    def updates(self, df: DataFrame) -> Updates:
        field = self.cfg.get("field", "message")
        if field not in df.columns:
            raise ProcessorConfigError(f"decode_xml_wineventlog: {field!r} missing")
        prefix = self.cfg.get("target", "winlog") + "_"

        ev = F.from_xml(F.col(field), self._SCHEMA,
                        {"columnNameOfCorruptRecord": "_corrupt"})
        sys_, ed, ri = ev.getField("System"), ev.getField("EventData"), ev.getField("RenderingInfo")

        level_code = sys_.getField("Level").try_cast("int")
        code_level = F.lit(None).cast("string")
        for code, name in self._LEVELS.items():
            code_level = F.when(level_code == code, F.lit(name)).otherwise(code_level)
        level = F.coalesce(F.lower(ri.getField("Level")), code_level)

        keywords = ri.getField("Keywords").getField("Keyword")
        outcome = (
            F.when(F.array_contains(keywords, "Audit Success"), "success")
            .when(F.array_contains(keywords, "Audit Failure"), "failure")
        )
        data = ed.getField("Data")
        # Unnamed (or literal Name="Data") entries get the generic
        # paramN key, 1-based positional — winlogbeat/sys/winevent/
        # maputil.go:60-64; the golden corpus's <Data>msg</Data> rows
        # would otherwise be a NULL map key (runtime error).
        event_data = F.map_from_entries(
            F.transform(
                data,
                lambda d, i: F.struct(
                    F.when(
                        d.getField("_Name").isNull()
                        | (d.getField("_Name") == "Data"),
                        F.concat(F.lit("param"), (i + 1).cast("string")),
                    )
                    .otherwise(d.getField("_Name"))
                    .alias("key"),
                    d.getField("_VALUE").alias("value"),
                ),
            )
        )
        task = F.coalesce(ri.getField("Task"), sys_.getField("Task"))

        out = {
            prefix + "provider_name": sys_.getField("Provider").getField("_Name"),
            prefix + "provider_guid": sys_.getField("Provider").getField("_Guid"),
            prefix + "event_id": sys_.getField("EventID"),
            prefix + "version": sys_.getField("Version").try_cast("int"),
            prefix + "record_id": sys_.getField("EventRecordID"),
            prefix + "computer_name": sys_.getField("Computer"),
            prefix + "channel": sys_.getField("Channel"),
            prefix + "time_created": F.try_to_timestamp(
                sys_.getField("TimeCreated").getField("_SystemTime")
            ),
            prefix + "activity_id": sys_.getField("Correlation").getField("_ActivityID"),
            prefix + "process_pid": sys_.getField("Execution").getField("_ProcessID"),
            prefix + "process_thread_id": sys_.getField("Execution").getField("_ThreadID"),
            prefix + "opcode": F.coalesce(ri.getField("Opcode"), sys_.getField("Opcode")),
            prefix + "task": task,
            prefix + "level": level,
            prefix + "keywords": keywords,
            prefix + "outcome": outcome,
            prefix + "message": ri.getField("Message"),
            prefix + "event_data": event_data,
            # ECS projections (decoder.go fields() → event.*/log.*/host.*)
            "event_code": sys_.getField("EventID"),
            "event_provider": sys_.getField("Provider").getField("_Name"),
            "event_kind": F.when(ev.isNotNull(), F.lit("event")),
            "event_action": task,
            "event_outcome": outcome,
            "log_level": level,
            "host_name": sys_.getField("Computer"),
        }
        if not self.cfg.get("ignore_failure", False):
            bad = F.col(field).isNotNull() & ev.getField("_corrupt").isNotNull()
            out["flags"] = add_flag(df, "decode_xml_wineventlog_error", bad)
        return Updates(set=out)

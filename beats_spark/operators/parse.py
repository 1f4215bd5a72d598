"""Parse / decode / convert processors.

The hot path of the reference pipeline: tokenize & type raw text into
structured fields. Executed here as compile-once expression batteries:
the dissect/syslog regexes compile at plan build and run either as one
Arrow pandas-UDF pass per batch or as JVM ``regexp_extract`` inside
whole-stage codegen. Failures never drop rows — they tag ``flags``
(tag-and-continue, libbeat/publisher/processing/processors.go:140-148).

All casts use try_* semantics (Spark 4 defaults to ANSI; a cast error
must tag, not kill the job).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beats_spark.functions.dissect import DissectPattern
from beats_spark.operators.base import (
    Processor,
    ProcessorConfigError,
    Updates,
    add_flag,
    register,
)
from beats_spark.operators.mutate import _flat


@register
class Dissect(Processor):
    """dissect: tokenizer parse of one text field into typed columns.

    Config mirrors the reference (libbeat/processors/dissect/processor.go):
    ``tokenizer``, ``field`` (default message→``text`` on transcripts),
    ``target_prefix`` (default ``dissect``; "" = root), ``ignore_failure``,
    ``overwrite_keys``, ``trim_values`` (left/right/all), ``trim_chars``,
    plus engine-specific ``mode``: ``native`` (JVM regexp_extract
    battery inside whole-stage codegen, zero Python — the default;
    measured ~2-4x the Arrow path at 1M rows/32 cores) or ``pandas``
    (Arrow batch, one compiled-regex pass per batch, no per-row
    Python). Both produce identical output.

    Failure semantics: unmatched rows keep flowing with null outputs and
    ``flags += dissect_parsing_error`` (processor.go:33,106-118). The
    no-overwrite check runs at plan build (processor.go:142-182 runs it
    per event; a fixed schema lets us fail five orders of magnitude
    earlier).
    """

    name = "dissect"

    FLAG = "dissect_parsing_error"
    CONVERT_FLAG = "dissect_conversion_error"

    def __init__(self, cfg):
        super().__init__(cfg)
        self.pattern = DissectPattern(
            self.cfg["tokenizer"],
            append_separator=self.cfg.get("append_separator"),
        )
        self.field = _flat(self.cfg.get("field", "message"))
        prefix = self.cfg.get("target_prefix", "dissect")
        self.prefix = _flat(prefix) + "_" if prefix else ""
        self.mode = self.cfg.get("mode", "native")

    def _out_name(self, key: str) -> str:
        return self.prefix + _flat(key)

    def _map_out_name(self) -> str:
        """Name of the map overflow column: ``<prefix>map`` under a
        target_prefix, ``dissect_map`` at the root."""
        return (self.prefix + "map") if self.prefix else "dissect_map"

    def updates(self, df: DataFrame) -> Updates:
        if self.field not in df.columns:
            raise ProcessorConfigError(f"dissect: field {self.field!r} missing")
        if not self.cfg.get("overwrite_keys", False):
            targets = [self._out_name(k) for k in self.pattern.keys()]
            if self.pattern.has_map:
                targets.append(self._map_out_name())
            for t in targets:
                if t in df.columns:
                    raise ProcessorConfigError(
                        f"dissect: target column {t!r} exists "
                        "and overwrite_keys is false"
                    )

        src = F.col(self.field)
        map_col: Column | None = None
        if self.mode == "native":
            raw = self.pattern.native_columns(src)
            matched = raw.pop("_match")
            map_col = raw.pop("_map", None)
            extracted = {k: raw[k] for k in self.pattern.keys()}
        else:
            struct = self.pattern.pandas_udf()(src)
            matched = struct.getField("_match")
            if self.pattern.has_map:
                map_col = struct.getField("_map")
            extracted = {k: struct.getField(k) for k in self.pattern.keys()}

        trim = self.cfg.get("trim_values", "none")
        trim_chars = self.cfg.get("trim_chars", " ")
        import re as _re

        char_class = f"[{_re.escape(trim_chars)}]"
        out: dict[str, Column] = {}
        conv_failed: Column | None = None
        for key, col in extracted.items():
            if trim in ("left", "all"):
                col = F.regexp_replace(col, f"^{char_class}+", "")
            if trim in ("right", "all"):
                col = F.regexp_replace(col, f"{char_class}+$", "")
            out[self._out_name(key)] = self.pattern.cast(key, col)
            cf = self.pattern.conversion_failed(key, col)
            if cf is not None:
                conv_failed = cf if conv_failed is None else (conv_failed | cf)
        if map_col is not None:
            # row-dependent key names (%{*k}/%{&k}) → the MapType
            # overflow column reserved in SURVEY §1.4
            out[self._map_out_name()] = map_col

        if not self.cfg.get("ignore_failure", False):
            from beats_spark.operators.base import append_flag, flags_base

            # tag-and-continue on BOTH failure modes: unmatched rows
            # (dissect_parsing_error) and matched rows whose |type cast
            # failed (dissect_conversion_error) — never abort the job
            # (dissect.go:248-252; processors.go:140-148).
            flags = append_flag(
                flags_base(df), self.FLAG, ~F.coalesce(matched, F.lit(False))
            )
            if conv_failed is not None:
                flags = append_flag(flags, self.CONVERT_FLAG, conv_failed)
            out["flags"] = flags
        return Updates(set=out)


@register
class Grok(Processor):
    """grok: pattern-library parse of one text field (the north-star
    "grok/dissect" stage's grok half). libbeat has no grok; the public
    semantics implemented are the Elasticsearch-ingest/Logstash grok
    filter's (functions/grok.py): ``%{SYNTAX:field:type}``, recursive
    ``pattern_definitions``, ``patterns`` list with first-match-wins,
    ``_grokparsefailure`` tag on no-match, typed captures try_cast +
    ``grok_conversion_error`` (tag-and-continue, never an ANSI abort).

    Engine modes mirror dissect: ``native`` (JVM regexp_extract
    battery inside whole-stage codegen — default) or ``pandas``
    (single compiled-regex pass per Arrow batch).
    """

    name = "grok"

    FLAG = "_grokparsefailure"
    CONVERT_FLAG = "grok_conversion_error"

    def __init__(self, cfg):
        super().__init__(cfg)
        from beats_spark.functions.grok import GrokPattern

        raw_patterns = self.cfg.get("patterns") or (
            [self.cfg["match"]] if self.cfg.get("match") else None
        )
        if not raw_patterns:
            raise ProcessorConfigError("grok: needs patterns (or match)")
        defs = self.cfg.get("pattern_definitions")
        # anchor=True (default): the pattern must cover the whole value
        # — the predictable full-line-parse norm of a log pipeline.
        # anchor=False: Elasticsearch-grok search semantics (match
        # anywhere in the string).
        anchor = bool(self.cfg.get("anchor", True))
        self.patterns = [GrokPattern(p, defs, anchor=anchor) for p in raw_patterns]
        self.field = _flat(self.cfg.get("field", "message"))
        prefix = self.cfg.get("target_prefix", "")
        self.prefix = _flat(prefix) + "_" if prefix else ""
        self.mode = self.cfg.get("mode", "native")

    def updates(self, df: DataFrame) -> Updates:
        if self.field not in df.columns:
            raise ProcessorConfigError(f"grok: field {self.field!r} missing")
        src = F.col(self.field)

        per_pattern: list[dict[str, Column]] = []
        for p in self.patterns:
            if self.mode == "native":
                per_pattern.append(p.native_columns(src))
            else:
                struct = p.pandas_udf()(src)
                cols = {f_: struct.getField(f_) for f_ in p.field_names()}
                cols["_match"] = struct.getField("_match")
                per_pattern.append(cols)

        # first-match-wins across the patterns list: a field takes its
        # value from the FIRST pattern that both defines and matched it
        all_fields: list[str] = []
        for p in self.patterns:
            for f_ in p.field_names():
                if f_ not in all_fields:
                    all_fields.append(f_)
        matched_any = F.lit(False)
        for cols in per_pattern:
            matched_any = matched_any | F.coalesce(cols["_match"], F.lit(False))

        out: dict[str, Column] = {}
        conv_failed: Column | None = None
        for f_ in all_fields:
            # fold patterns LAST→FIRST so the first matching pattern's
            # value ends up outermost (first-match-wins)
            expr: Column | None = None
            for p, cols in zip(reversed(self.patterns), reversed(per_pattern)):
                if f_ not in p.field_names():
                    continue
                raw = cols[f_]
                typed = p.cast(f_, raw)
                take = F.coalesce(cols["_match"], F.lit(False))
                expr = typed if expr is None else F.when(take, typed).otherwise(expr)
                cf = p.conversion_failed(f_, raw)
                if cf is not None:
                    cf = take & cf
                    conv_failed = cf if conv_failed is None else (conv_failed | cf)
            out[self.prefix + _flat(f_)] = expr

        if not self.cfg.get("ignore_failure", False):
            from beats_spark.operators.base import append_flag, flags_base

            flags = append_flag(flags_base(df), self.FLAG, ~matched_any)
            if conv_failed is not None:
                flags = append_flag(flags, self.CONVERT_FLAG, conv_failed)
            out["flags"] = flags
        return Updates(set=out)


@register
class Convert(Processor):
    """convert: typed cast list {from, to?, type}; mode copy|rename.
    Ref: libbeat/processors/convert/convert.go:45-74, config.go:26-59.
    A failed cast yields null + ``flags += convert_error`` (the
    reference's fail_on_error=false keeps the original value; one column
    has one type here, so the tag carries the signal)."""

    name = "convert"

    _TYPES = {
        "string": "string",
        "long": "long",
        "integer": "int",
        "float": "float",
        "double": "double",
        "boolean": "boolean",
        "ip": "string",
    }

    def updates(self, df: DataFrame) -> Updates:
        mode = self.cfg.get("mode", "copy")
        out: dict[str, Column] = {}
        drop: list[str] = []
        err = F.lit(False)
        for spec in self.cfg["fields"]:
            src = _flat(spec["from"])
            dst = _flat(spec.get("to", spec["from"]))
            typ = self._TYPES.get(spec.get("type", "string"))
            if typ is None:
                raise ProcessorConfigError(f"convert: unknown type {spec.get('type')!r}")
            if src not in df.columns:
                if self.cfg.get("ignore_missing", False):
                    continue
                raise ProcessorConfigError(f"convert: field {src!r} missing")
            if spec.get("type") == "ip":
                # the reference VALIDATES ip conversions (net.ParseIP,
                # convert.go:347) — an unparseable address nulls + tags.
                # ip_parse_valid is the full ParseIP grammar: strict
                # dotted quad (0-255, no leading zeros) and complete
                # IPv6 incl. every embedded-v4-tail placement; parity
                # vs Python ipaddress is property-tested in
                # tests/test_processors.py.
                from beats_spark.functions.conditions import ip_parse_valid

                casted = F.when(ip_parse_valid(F.col(src)), F.col(src).cast("string"))
            else:
                casted = F.col(src).try_cast(typ)
            err = err | (F.col(src).isNotNull() & casted.isNull())
            out[dst] = casted
            if mode == "rename" and dst != src:
                drop.append(src)
        if self.cfg.get("tag_on_failure", True):
            out["flags"] = add_flag(df, "convert_error", err)
        return Updates(set=out, drop=drop)


@register
class Timestamp(Processor):
    """timestamp: parse a string field into the event timestamp with a
    battery of layouts, normalized UTC.
    Ref: libbeat/processors/timestamp/timestamp.go:36-116.

    ``layouts`` take Spark/Java datetime patterns (the engine is
    Spark-first; Go reference layouts don't leak into configs). The
    first layout that parses wins (coalesce battery). ``timezone``
    interprets naive inputs in that zone → UTC."""

    name = "timestamp"

    def updates(self, df: DataFrame) -> Updates:
        field = _flat(self.cfg["field"])
        target = _flat(self.cfg.get("target_field", "ts"))
        layouts = self.cfg.get("layouts", [None])  # None → Spark default parse
        if field not in df.columns:
            if self.cfg.get("ignore_missing", False):
                return Updates()
            raise ProcessorConfigError(f"timestamp: field {field!r} missing")
        src = F.col(field)
        attempts = [
            F.try_to_timestamp(src, F.lit(fmt)) if fmt else F.try_to_timestamp(src)
            for fmt in layouts
        ]
        parsed = F.coalesce(*attempts) if len(attempts) > 1 else attempts[0]
        tz = self.cfg.get("timezone")
        if tz:
            parsed = F.to_utc_timestamp(parsed, tz)
        out = {target: parsed}
        if not self.cfg.get("ignore_failure", False):
            out["flags"] = add_flag(
                df, "timestamp_parse_error", src.isNotNull() & parsed.isNull()
            )
        return Updates(set=out)


@register
class DecodeJsonFields(Processor):
    """decode_json_fields: parse JSON strings into columns.
    Ref: libbeat/processors/actions/decode_json_fields.go:50-64,103,
    plus the ndjson parser's config surface
    (libbeat/reader/readjson/json_config.go:20-30):

    - ``message_key``: after decoding, the ``message`` column becomes
      the string value of that key (readjson/json.go:85-104); missing
      key → empty string + the error flag when add_error_key is set.
      Delta from the reference: the closed-schema decode stringifies
      scalars, so a numeric value arrives as its text instead of
      raising the "not a string" error.
    - ``document_id``: the value moves out of the decoded fields into
      ``_meta_id`` (readjson/json.go:180-191 puts Meta["_id"] for the
      ES output's doc id; our ES sink convention is the ``_meta_*``
      column family).
    - ``expand_keys``: dotted keys expand into nested objects in the
      reference (jsontransform.WriteJSONKeys); the flat-column
      equivalent is normalizing ``a.b`` to ``a_b`` in the overflow
      map's keys (first occurrence wins on collision).

    Closed-schema world: pass ``schema`` (Spark DDL, e.g. "k INT,
    name STRING"); fields land as ``{target}_{name}`` (target default =
    the source field, "" = root). Without a schema the document decodes
    to a ``map<string,string>`` overflow column (SURVEY.md §1.4).
    add_error_key → flags on undecodable input."""

    name = "decode_json_fields"

    def updates(self, df: DataFrame) -> Updates:
        out: dict[str, Column] = {}
        err = F.lit(False)
        schema = self.cfg.get("schema")
        message_key = self.cfg.get("message_key")
        document_id = self.cfg.get("document_id")
        expand_keys = bool(self.cfg.get("expand_keys", False))
        for f_ in self.cfg["fields"]:
            src = _flat(f_)
            if src not in df.columns:
                raise ProcessorConfigError(f"decode_json_fields: {src!r} missing")
            target = self.cfg.get("target", src)
            prefix = (_flat(target) + "_") if target else ""
            # from_json (PERMISSIVE) yields an all-null struct on bad
            # input, not null — detect failure via try_parse_json.
            bad = F.col(src).isNotNull() & F.try_parse_json(F.col(src)).isNull()
            err = err | bad
            if schema:
                parsed = F.from_json(F.col(src), schema)
                for sf in T._parse_datatype_string(schema).fields:
                    if document_id and sf.name == document_id:
                        out["_meta_id"] = parsed.getField(sf.name).cast("string")
                        continue
                    out[prefix + sf.name] = parsed.getField(sf.name)
                if message_key:
                    msg = parsed.getField(message_key).cast("string")
                    out["message"] = F.coalesce(msg, F.lit(""))
                    err = err | (~bad & F.col(src).isNotNull() & msg.isNull())
            else:
                parsed = F.from_json(F.col(src), "map<string,string>")
                if document_id:
                    out["_meta_id"] = F.element_at(parsed, document_id)
                    parsed = F.map_filter(
                        parsed, lambda k, _v: k != F.lit(document_id)
                    )
                if message_key:
                    msg = F.element_at(parsed, message_key)
                    out["message"] = F.coalesce(msg, F.lit(""))
                    err = err | (~bad & F.col(src).isNotNull() & msg.isNull())
                if expand_keys:
                    # nested-object expansion, flat-column form:
                    # 'a.b' → 'a_b'; first occurrence wins on collision
                    norm = F.transform(
                        F.map_entries(parsed),
                        lambda e: F.struct(
                            F.replace(
                                e.getField("key"), F.lit("."), F.lit("_")
                            ).alias("key"),
                            e.getField("value").alias("value"),
                        ),
                    )
                    parsed = F.aggregate(
                        norm,
                        F.create_map().cast("map<string,string>"),
                        lambda acc, e: F.when(
                            F.map_contains_key(acc, e.getField("key")), acc
                        ).otherwise(
                            F.map_concat(
                                acc,
                                F.create_map(
                                    e.getField("key"), e.getField("value")
                                ),
                            )
                        ),
                    )
                out[prefix.rstrip("_") or src + "_map"] = parsed
        if self.cfg.get("add_error_key", False):
            out["flags"] = add_flag(df, "_jsonparsefailure", err)
        return Updates(set=out)


@register
class DecodeCsvFields(Processor):
    """decode_csv_fields: CSV row string → array of string fields,
    RFC-4180 quoting honored via from_csv.
    Ref: libbeat/processors/decode_csv_fields/decode_csv_fields.go:101.

    ``fields``: {from: to}; ``separator``; ``n_columns`` bounds the
    struct width (a fixed schema needs a fixed arity — plan-build
    parameter instead of the reference's dynamic array)."""

    name = "decode_csv_fields"

    def updates(self, df: DataFrame) -> Updates:
        sep = self.cfg.get("separator", ",")
        n = int(self.cfg.get("n_columns", 8))
        ddl = ", ".join(f"_c{i} STRING" for i in range(n))
        out = {}
        for src, dst in self.cfg["fields"].items():
            src_c, dst_c = _flat(src), _flat(dst)
            parsed = F.from_csv(F.col(src_c), ddl, {"sep": sep})
            arr = F.array(*[parsed.getField(f"_c{i}") for i in range(n)])
            out[dst_c] = F.filter(arr, lambda x: x.isNotNull())
        return Updates(set=out)


@register
class DecodeBase64Field(Processor):
    """decode_base64_field: base64 → string; bad input tags.
    Ref: libbeat/processors/actions/decode_base64_field.go:76."""

    name = "decode_base64_field"

    def updates(self, df: DataFrame) -> Updates:
        spec = self.cfg["field"]
        src, dst = _flat(spec["from"]), _flat(spec["to"])
        decoded = F.try_to_binary(F.col(src), F.lit("base64")).cast("string")
        out = {dst: decoded}
        if not self.cfg.get("ignore_missing", False):
            out["flags"] = add_flag(
                df, "decode_base64_error", F.col(src).isNotNull() & decoded.isNull()
            )
        return Updates(set=out)


@register
class DecompressGzipField(Processor):
    """decompress_gzip_field: gunzip a binary/base64 column. No Spark
    builtin → Arrow pandas UDF (batch-at-a-time, not per-row Python).
    Ref: libbeat/processors/actions/decompress_gzip_field.go:69."""

    name = "decompress_gzip_field"

    def updates(self, df: DataFrame) -> Updates:
        import gzip

        spec = self.cfg["field"]
        src, dst = _flat(spec["from"]), _flat(spec["to"])

        @F.pandas_udf(T.StringType())
        def gunzip(s: pd.Series) -> pd.Series:
            def one(v):
                if v is None:
                    return None
                try:
                    return gzip.decompress(bytes(v)).decode("utf-8", "replace")
                except Exception:
                    return None

            return s.map(one)

        decoded = gunzip(F.col(src))
        return Updates(
            set={
                dst: decoded,
                "flags": add_flag(
                    df, "decompress_gzip_error", F.col(src).isNotNull() & decoded.isNull()
                ),
            }
        )


@register
class NormalizeUnicode(Processor):
    """normalize_unicode: Unicode normalization (NFC/NFD/NFKC/NFKD) of
    text fields — the multilingual-corpus prerequisite: decomposed and
    precomposed encodings of the SAME text hash, dedup, and compare
    differently until normalized, so this runs before any fingerprint/
    dedup stage. Engine addition (libbeat ships no Unicode normalizer);
    no Spark builtin either → pandas ``Series.str.normalize`` over
    Arrow batches (batch-at-a-time, the gzip precedent — never per-row
    Python UDFs). Config: ``{"fields": [...], "form": "NFC"}``.
    NULL passes through; non-string columns are a config error at
    plan build."""

    name = "normalize_unicode"

    _FORMS = ("NFC", "NFD", "NFKC", "NFKD")

    def updates(self, df: DataFrame) -> Updates:
        form = self.cfg.get("form", "NFC")
        if form not in self._FORMS:
            raise ProcessorConfigError(
                f"normalize_unicode: form must be one of {self._FORMS}, got {form!r}"
            )
        fields = self.cfg.get("fields") or [self.cfg["field"]]

        @F.pandas_udf(T.StringType())
        def norm(s: pd.Series) -> pd.Series:
            out = s.str.normalize(form)
            return out.where(s.notna(), None)

        return Updates(set={_flat(f): norm(F.col(_flat(f))) for f in fields})


@register
class DecodeDuration(Processor):
    """decode_duration: Go-style duration string ("1h30m45.5s", "150ms")
    → number in the configured unit.
    Ref: libbeat/processors/decode_duration/decode_duration.go:48."""

    name = "decode_duration"

    _UNIT_SECONDS = {"seconds": 1.0, "milliseconds": 1e-3, "minutes": 60.0, "hours": 3600.0}

    def updates(self, df: DataFrame) -> Updates:
        field = _flat(self.cfg["field"])
        fmt = self.cfg.get("format", "milliseconds")
        if fmt not in self._UNIT_SECONDS:
            raise ProcessorConfigError(f"decode_duration: bad format {fmt!r}")
        src = F.col(field).cast("string")
        h = F.coalesce(F.regexp_extract(src, r"(\d+(?:\.\d+)?)h", 1).try_cast("double"), F.lit(0.0))
        m = F.coalesce(F.regexp_extract(src, r"(\d+(?:\.\d+)?)m(?!s)", 1).try_cast("double"), F.lit(0.0))
        s = F.coalesce(F.regexp_extract(src, r"(\d+(?:\.\d+)?)s$", 1).try_cast("double"), F.lit(0.0))
        ms = F.coalesce(F.regexp_extract(src, r"(\d+(?:\.\d+)?)ms", 1).try_cast("double"), F.lit(0.0))
        us = F.coalesce(F.regexp_extract(src, r"(\d+(?:\.\d+)?)(?:us|µs)", 1).try_cast("double"), F.lit(0.0))
        # `s$` would also match the trailing s of ms/us → mask when those matched
        s = F.when((ms > 0) | (us > 0), F.lit(0.0)).otherwise(s)
        seconds = h * 3600.0 + m * 60.0 + s + ms / 1e3 + us / 1e6
        target = _flat(self.cfg.get("target_field", field))
        return Updates(set={target: seconds / self._UNIT_SECONDS[fmt]})


@register
class UrlDecode(Processor):
    """urldecode: %-unescape; malformed escapes null + tag
    ``urldecode_error`` (the reference's fail_on_error path errors the
    event, urldecode.go:75 — tag-and-continue is this engine's form)."""

    name = "urldecode"

    def updates(self, df: DataFrame) -> Updates:
        out: dict[str, Column] = {}
        err = F.lit(False)
        for spec in self.cfg["fields"]:
            src, dst = _flat(spec["from"]), _flat(spec.get("to", spec["from"]))
            decoded = F.expr(f"try_url_decode({src})")
            err = err | (F.col(src).isNotNull() & decoded.isNull())
            out[dst] = decoded
        if not self.cfg.get("ignore_failure", False):
            out["flags"] = add_flag(df, "urldecode_error", err)
        return Updates(set=out)


@register
class ExtractArray(Processor):
    """extract_array: pick array elements into named fields.
    Ref: libbeat/processors/extract_array/extract_array.go:117."""

    name = "extract_array"

    def updates(self, df: DataFrame) -> Updates:
        field = _flat(self.cfg["field"])
        out = {}
        for target, idx in self.cfg["mappings"].items():
            out[_flat(target)] = F.col(field).getItem(int(idx))
        return Updates(set=out)


@register
class ExtractField(Processor):
    """extract_field: split by separator, take index.
    Ref: libbeat/processors/actions/extract_field.go:76."""

    name = "extract_field"

    def updates(self, df: DataFrame) -> Updates:
        field = _flat(self.cfg["field"])
        sep = self.cfg["separator"]
        idx = int(self.cfg["index"])
        target = _flat(self.cfg.get("target", field))
        # F.split takes a regex → quote regex-special separators
        import re as _re

        parts = F.split(F.col(field), _re.escape(sep), -1)
        return Updates(set={target: parts.getItem(idx)})


@register
class DetectMimeType(Processor):
    """detect_mime_type: magic-bytes sniff of a binary/string column.

    The reference delegates to Go's ``http.DetectContentType`` (the
    WHATWG MIME-sniffing signature table;
    libbeat/processors/actions/detect_mime_type.go:58 via
    libbeat/mime/byte.go:48). This implements that table's
    exact-signature rows as a when-chain over the hex prefix, plus the
    two positional families (RIFF container subtype at offset 8, ISO
    BMFF ``ftyp`` at offset 4). The content-scoring heuristics for
    bare text/html vs text/plain are approximated by the leading-``<``
    rule; a closed table, documented in COVERAGE.md."""

    name = "detect_mime_type"

    # prefix-hex → mime, first match wins (longest/most specific first)
    _MAGIC = [
        # images
        ("89504E470D0A1A0A", "image/png"),
        ("FFD8FF", "image/jpeg"),
        ("474946383761", "image/gif"),
        ("474946383961", "image/gif"),
        ("424D", "image/bmp"),
        ("00000100", "image/x-icon"),
        # audio / video
        ("4D546864", "audio/midi"),
        ("494433", "audio/mpeg"),
        ("FFFB", "audio/mpeg"),
        ("4F676753", "application/ogg"),
        ("1A45DFA3", "video/webm"),
        # fonts
        ("774F4646", "font/woff"),
        ("774F4632", "font/woff2"),
        ("00010000", "font/ttf"),
        ("4F54544F", "font/otf"),
        ("74746366", "font/collection"),
        # archives / documents
        ("1F8B", "application/gzip"),
        ("504B0304", "application/zip"),
        ("526172201A07", "application/x-rar-compressed"),
        ("25504446", "application/pdf"),
        ("25215053", "application/postscript"),
        ("0061736D", "application/wasm"),
        # text with BOM
        ("EFBBBF", "text/plain; charset=utf-8"),
        ("FEFF", "text/plain; charset=utf-16be"),
        ("FFFE", "text/plain; charset=utf-16le"),
        # markup heuristic (WHATWG scores tag names; '<' approximates)
        ("3C3F786D6C", "text/xml"),  # '<?xml'
        ("3C", "text/html"),
        ("7B", "application/json"),  # '{' — engine extension for logs
    ]

    # RIFF container: bytes 8..11 select the subtype
    _RIFF = [("57415645", "audio/wave"), ("41564920", "video/avi"), ("57454250", "image/webp")]

    def updates(self, df: DataFrame) -> Updates:
        field = _flat(self.cfg["field"])
        target = _flat(self.cfg.get("target", "mime_type"))
        raw = F.col(field).cast("binary")
        hexed = F.upper(F.hex(raw))
        expr: Column = F.lit("application/octet-stream")
        for sig, mime in reversed(self._MAGIC):
            expr = F.when(hexed.startswith(sig), F.lit(mime)).otherwise(expr)
        # positional families override the generic prefixes
        riff_sub = F.upper(F.hex(F.substring(raw, 9, 4)))
        for sub, mime in self._RIFF:
            expr = F.when(
                hexed.startswith("52494646") & (riff_sub == sub), F.lit(mime)
            ).otherwise(expr)
        ftyp = F.upper(F.hex(F.substring(raw, 5, 4)))
        expr = F.when(ftyp == "66747970", F.lit("video/mp4")).otherwise(expr)
        return Updates(set={target: expr})


@register
class Syslog(Processor):
    """syslog: RFC3164 / RFC5424 (auto-detect) parse of a field.
    Ref: libbeat/processors/syslog/syslog.go:41-96,141,173.

    Emits ``log_syslog_priority/facility/severity``, ``hostname``,
    ``program``, ``procid``, ``syslog_message``, plus raw timestamp text
    in ``syslog_ts``. Runs as a JVM regexp battery; unmatched rows tag
    ``syslog_parse_error``."""

    name = "syslog"

    _RFC3164 = (
        r"^(?:<(\d{1,3})>)?"
        r"([A-Z][a-z]{2}\s{1,2}\d{1,2}\s\d{2}:\d{2}:\d{2})\s"
        r"(\S+)\s"
        r"([^\s:\[]+)(?:\[(\d+)\])?:\s"
        r"(.*)$"
    )
    _RFC5424 = (
        r"^<(\d{1,3})>\d\s"
        r"(\S+)\s(\S+)\s(\S+)\s(\S+)\s\S+\s(?:-|\[.*?\])\s?"
        r"(.*)$"
    )

    def updates(self, df: DataFrame) -> Updates:
        field = _flat(self.cfg.get("field", "message"))
        src = F.col(field)
        fmt = self.cfg.get("format", "auto")

        def rfc3164() -> dict[str, Column]:
            m = src.rlike(self._RFC3164)
            g = lambda i: F.when(m, F.regexp_extract(src, self._RFC3164, i))  # noqa: E731
            return {
                "_m": m,
                "pri": g(1),
                "syslog_ts": g(2),
                "hostname": g(3),
                "program": g(4),
                "procid": g(5),
                "syslog_message": g(6),
            }

        def rfc5424() -> dict[str, Column]:
            m = src.rlike(self._RFC5424)
            g = lambda i: F.when(m, F.regexp_extract(src, self._RFC5424, i))  # noqa: E731
            return {
                "_m": m,
                "pri": g(1),
                "syslog_ts": g(2),
                "hostname": g(3),
                "program": g(4),
                "procid": g(5),
                "syslog_message": g(6),
            }

        if fmt == "rfc3164":
            r = rfc3164()
        elif fmt == "rfc5424":
            r = rfc5424()
        else:  # auto: 5424 has a version digit after <pri>
            a, b = rfc5424(), rfc3164()
            r = {
                k: F.when(a["_m"], a[k]).otherwise(b[k]) for k in a if k != "_m"
            }
            r["_m"] = a["_m"] | b["_m"]

        matched = r.pop("_m")
        pri = r.pop("pri").try_cast("int")
        out: dict[str, Column] = {
            "log_syslog_priority": pri,
            "log_syslog_facility": (pri / 8).cast("int"),
            "log_syslog_severity": pri % 8,
        }
        for k, v in r.items():
            out[k] = v
        out["flags"] = add_flag(df, "syslog_parse_error", ~F.coalesce(matched, F.lit(False)))
        return Updates(set=out)

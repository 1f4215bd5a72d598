"""First-match-wins output router — libbeat's output selector as one
Column expression.

Reference semantics (libbeat/outputs/outil/select.go):

- an ordered rule list; the first rule producing a non-empty value
  wins (listSelector, select.go:209-213,341-354);
- a rule may be guarded by a ``when:`` condition (condSelector,
  select.go:215-222,356-361);
- a rule's value is an event format string with ``%{[field]}`` refs —
  a missing required field makes the rule yield empty, so the next
  rule is tried (fmtSelector, select.go:367-379);
- a rule may post-process the formatted key through a ``mappings:``
  table with a ``default:`` (mapSelector, select.go:224-250,381-399);
- constant rules are const-folded (select.go:194-207) — Catalyst's
  ConstantFolding does this for us.

Compiled form: ``coalesce(when(cond1, fmt1), when(cond2, fmt2), ...,
lit(default))``. ``F.when`` without ``otherwise`` is null on miss and
``concat`` is null on missing field, so coalesce IS first-non-empty —
the whole router is a single codegen'd expression, zero shuffles.

Rule config::

    {"when": {...cond...},           # optional guard
     "index": "sink-%{[role]}",      # fmtstr (or constant)
     "mappings": {"user": "inbound"},  # optional lookup on the key
     "default": "main"}              # mappings fallback
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.functions.conditions import compile_condition
from beats_spark.functions.fmtstr import compile_fmtstr

META_SINK = "_meta_sink"


def compile_rule(df: DataFrame, rule: dict[str, Any], ts_col: str = "ts") -> Column:
    key = compile_fmtstr(df, str(rule["index"]), ts_col=ts_col)
    if "mappings" in rule:
        pairs: list[Column] = []
        for k, v in rule["mappings"].items():
            pairs += [F.lit(str(k)), F.lit(str(v))]
        mapped = F.element_at(F.create_map(*pairs), key)
        # an empty LOOKED-UP value counts as a miss before the default
        # applies (select_test.go "apply mapping with default on empty
        # lookup"; empty==missing per select.go:367-373)
        mapped = F.when(mapped == "", F.lit(None)).otherwise(mapped)
        if "default" in rule:
            mapped = F.coalesce(mapped, F.lit(str(rule["default"])))
        key = F.when(mapped == "", F.lit(None)).otherwise(mapped)
    else:
        # empty string == missing; a rule-level default (without
        # mappings) then catches a failed/empty format string INSIDE
        # the rule — fmtSelector's otherwise (select_test.go
        # "missing format string key with default in rule")
        key = F.when(key == "", F.lit(None)).otherwise(key)
        if "default" in rule:
            key = F.coalesce(key, F.lit(str(rule["default"])))
    if rule.get("when") is not None:
        key = F.when(compile_condition(df, rule["when"]), key)
    return key


def route(
    df: DataFrame,
    rules: list[dict[str, Any]],
    default: str = "main",
    ts_col: str = "ts",
    respect_meta: bool = True,
) -> DataFrame:
    """Stamp ``_meta_sink`` via the compiled rule list.

    ``respect_meta``: a pre-existing ``_meta_sink`` (stamped by
    add_formatted_index) wins over the rules, mirroring the ES output
    honoring ``@metadata.raw_index`` verbatim
    (libbeat/beat/events/util.go:34-36)."""
    exprs = [compile_rule(df, r, ts_col) for r in rules]
    if respect_meta and META_SINK in df.columns:
        exprs.insert(0, F.col(META_SINK))
    exprs.append(F.lit(default))
    return df.withColumn(META_SINK, F.coalesce(*exprs))


def sink_names(rules: list[dict[str, Any]], default: str = "main") -> list[str] | None:
    """The closed sink set when every rule is statically enumerable
    (constant index or mappings+default); None when a rule emits
    free-form formatted names."""
    names: list[str] = []
    for r in rules:
        if "mappings" in r:
            names += [str(v) for v in r["mappings"].values()]
            if "default" in r:
                names.append(str(r["default"]))
        else:
            from beats_spark.functions.fmtstr import is_const

            if not is_const(str(r["index"])):
                return None
            names.append(str(r["index"]))
    names.append(default)
    out: list[str] = []
    for n in names:
        if n not in out:
            out.append(n)
    return out


# ---------------------------------------------------------------------------
# Kafka hash partitioner (FNV-32a), reference-exact
# ---------------------------------------------------------------------------

_FNV_OFFSET = 2166136261
_FNV_PRIME = 16777619
_POW32 = 1 << 32


def fnv32a_fields(df: DataFrame, fields: list[str]) -> Column:
    """FNV-32a over the concatenation of several fields' byte
    renderings, matching HashFieldValue (partition.go:280-320):
    strings hash their UTF-8 bytes; integer fields hash 8 LE bytes of
    the int64 value (binary.Write little-endian). A NULL in any field
    nulls the hash (the reference's GetValue error path — callers
    decide drop vs random). Floats are rejected at compile time: Go's
    strconv %g rendering has no exact JVM twin, and silently diverging
    would be worse.

    Emitted as ONE SQL expression (CLAUDE.md: hundreds of py4j Column
    calls cost plan-build time; and the hex string is let-bound so the
    byte fold reads a variable, not a re-inlined tree). The fold stays
    in LongType: acc < 2^32, prime < 2^25 ⇒ product < 2^57 — no ANSI
    overflow."""
    parts: list[str] = []
    dtypes = dict(df.dtypes)
    for name in fields:
        dt = dtypes.get(name)
        if dt is None:
            raise ValueError(f"fnv32a_fields: no column {name!r}")
        if dt not in ("string", "tinyint", "smallint", "int", "bigint"):
            # same rationale the float rejection always had, applied to
            # every non-string/int type: booleans render 'true'/'false'
            # where Go binary.Write emits one 0/1 byte, timestamps/
            # decimals have no matching Go byte rendering — a silently
            # divergent partition id is worse than a loud config error
            raise ValueError(
                f"fnv32a_fields: field {name!r} has type {dt!r} — floats, "
                "booleans, timestamps and decimals have no reference-exact "
                "Go byte rendering (supported: string and integer types)"
            )
        q = f"`{name}`"
        if dt in ("tinyint", "smallint", "int", "bigint"):
            le = ", ".join(
                f"lpad(hex(shiftright(cast({q} as bigint), {8 * k}) & 255), 2, '0')"
                for k in range(8)
            )
            parts.append(f"concat({le})")
        else:
            parts.append(f"hex(encode(cast({q} as string), 'utf-8'))")
    allhex = parts[0] if len(parts) == 1 else "concat(" + ", ".join(parts) + ")"
    # sequence(1, 0) DESCENDS in Spark (it never yields an empty
    # array), so the empty-input case short-circuits to the offset
    agg = (
        f"if(length(h) = 0, {_FNV_OFFSET}L, "
        f"aggregate(sequence(1, length(h) div 2), {_FNV_OFFSET}L, "
        f"(acc, i) -> pmod((acc ^ cast(conv(substring(h, i * 2 - 1, 2), 16, 10) "
        f"as bigint)) * {_FNV_PRIME}L, {_POW32}L)))"
    )
    return F.expr(f"element_at(transform(array({allhex}), h -> {agg}), 1)")


def fnv32a(df: DataFrame, field: str) -> Column:
    """FNV-32a of one string field's UTF-8 bytes (hash/fnv New32a —
    the kafka message-key hash, partition.go:220). Pure JVM aggregate
    over the hex rendering; see fnv32a_fields."""
    return fnv32a_fields(df, [field])


def kafka_hash_partition(
    df: DataFrame, fields: list[str], num_partitions: int
) -> Column:
    """Partition id per event: ``(int32(fnv32a) & 0x7FFFFFFF) %
    numPartitions`` — Hash2Partition (partition.go:275-278) exactly,
    including the signed-int32 reinterpretation before the mask."""
    h = fnv32a_fields(df, fields)
    signed = F.when(h >= F.lit(1 << 31), h - F.lit(_POW32)).otherwise(h)
    return F.pmod(
        signed.cast("int").bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(num_partitions)
    ).cast("int")

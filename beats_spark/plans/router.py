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

"""Event format strings compiled to a Spark ``Column``.

Syntax (mirrors libbeat/common/fmtstr/formatevents.go:35-48):

- ``%{[field][sub]}`` or ``%{field.sub}`` — field reference.
- ``%{[field]:default}`` — default used when the field is null/absent.
- ``%{+yyyy.MM.dd}`` — the event timestamp rendered with a date
  pattern (we accept Spark/Java ``date_format`` patterns; the common
  Joda subset used in Beats configs — yyyy MM dd HH mm ss — is
  identical).

Semantics preserved: a referenced field that is missing and has no
default makes the WHOLE format string yield null ("rule yields empty
⇒ next selector rule is tried", libbeat/outputs/outil/select.go:367-373).
Spark's ``concat`` is already null-propagating, which gives exactly
this behavior for free. A const-only format string compiles to a
literal (the reference const-folds too, select.go:194-207).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(r"%\{([^}]*)\}")


@dataclass
class _Part:
    kind: str  # "lit" | "field" | "ts"
    value: str
    default: str | None = None


def parse_fmtstr(fmt: str) -> list[_Part]:
    parts: list[_Part] = []
    pos = 0
    for m in _TOKEN.finditer(fmt):
        if m.start() > pos:
            parts.append(_Part("lit", fmt[pos : m.start()]))
        body = m.group(1)
        if body.startswith("+"):
            parts.append(_Part("ts", body[1:]))
        else:
            default = None
            if ":" in body:
                body, default = body.split(":", 1)
            # [a][b] → a.b ; bare name passes through
            field = ".".join(re.findall(r"\[([^\]]+)\]", body)) or body
            parts.append(_Part("field", field, default))
        pos = m.end()
    if pos < len(fmt):
        parts.append(_Part("lit", fmt[pos:]))
    return parts


def is_const(fmt: str) -> bool:
    return all(p.kind == "lit" for p in parse_fmtstr(fmt))


def _path_resolves(schema, path: str) -> bool:
    """True when the dotted field path resolves through struct fields
    (case-insensitive, mirroring Spark's default resolution)."""
    from pyspark.sql import types as T

    cur = schema
    for part in path.split("."):
        if not isinstance(cur, T.StructType):
            return False
        hit = next(
            (f for f in cur.fields if f.name.lower() == part.lower()), None
        )
        if hit is None:
            return False
        cur = hit.dataType
    return True


def compile_fmtstr(df: DataFrame, fmt: str, ts_col: str = "ts") -> Column:
    """Compile the format string against ``df``'s schema.

    Returns a string Column; null when a required (default-less) field
    reference is null or absent from the schema.
    """
    parts = parse_fmtstr(fmt)
    if all(p.kind == "lit" for p in parts):
        return F.lit("".join(p.value for p in parts))

    cols: list[Column] = []
    for p in parts:
        if p.kind == "lit":
            cols.append(F.lit(p.value))
        elif p.kind == "ts":
            if ts_col in df.columns:
                cols.append(F.date_format(F.col(ts_col), p.value))
            else:
                cols.append(F.lit(None).cast("string"))
        else:
            # resolve the FULL dotted path against the schema, not just
            # the top-level column: %{[meta][region]} with a struct
            # lacking 'region' (or a non-struct 'meta') must yield the
            # documented rule-miss NULL, not an AnalysisException at
            # plan build that kills the whole pipeline
            present = _path_resolves(df.schema, p.value)
            ref = F.col(p.value).cast("string") if present else F.lit(None).cast("string")
            if p.default is not None:
                ref = F.coalesce(ref, F.lit(p.default))
            cols.append(ref)
    # concat is null-propagating: one missing required field nulls the rule.
    return F.concat(*cols)

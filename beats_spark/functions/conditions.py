"""The Beats condition language compiled to Spark ``Column`` predicates.

Grammar (mirrors libbeat/conditions/conditions.go:30-40): ``equals``,
``contains``, ``regexp``, ``range``, ``has_fields``, ``network``,
``and``, ``or``, ``not``.

Semantics preserved from the reference:

- ``equals`` is typed equality AND-combined across listed fields; a
  missing field makes the condition false
  (libbeat/conditions/equals.go:26-113).
- ``contains`` is a substring test, not a regex
  (libbeat/common/match/matcher.go:60-66).
- ``regexp`` is RE2-style matching (libbeat/conditions/matcher.go:40-80);
  Spark's ``rlike`` uses Java regex — the common subset used by pipeline
  configs behaves identically and is what we support.
- ``range`` parses ``gt/gte/lt/lte`` sub-keys per field, AND-combined
  (libbeat/conditions/range.go:40-100).
- ``has_fields`` requires all listed fields present (non-null here,
  since a relational row always "has" every schema column)
  (libbeat/conditions/has_fields.go:22-40).
- ``network`` tests IPv4/CIDR membership incl. the named ranges the
  reference supports (libbeat/conditions/network.go) — implemented as
  pure integer math on the dotted-quad, JVM-side, no UDF.

Missing columns: a condition referencing a column absent from the
DataFrame schema compiles to ``lit(False)`` (reference behavior: a
missing field fails the check, it does not error). Null values also
fail the check: every leaf is wrapped in ``coalesce(expr, False)`` so
``not`` behaves two-valued like the reference, not SQL three-valued.
"""

from __future__ import annotations

import ipaddress
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Named network ranges from the reference's network condition.
_NAMED_NETWORKS: dict[str, list[str]] = {
    "loopback": ["127.0.0.0/8"],
    "unicast": ["0.0.0.0/0"],
    "multicast": ["224.0.0.0/4"],
    "link_local_unicast": ["169.254.0.0/16"],
    "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"],
    "public": [],  # complement of private+loopback — handled specially
}


def _has_column(df: DataFrame, name: str) -> bool:
    return name in df.columns


def _field(df: DataFrame, name: str) -> Column | None:
    """Resolve a (possibly dotted) field path; None if absent."""
    root = name.split(".")[0]
    if root in df.columns:
        return F.col(name) if "." not in name else F.expr("`" + "`.`".join(name.split(".")) + "`")
    return None


def _two_valued(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


# Shape gate for dotted-quad parsing. try_cast keeps Spark 4 ANSI mode
# from killing the job on hostnames/IPv6/garbage; the reference's
# net.ParseIP simply returns nil there (network.go) so the condition
# must evaluate to false, never error.
_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def _ip_to_long(c: Column) -> Column:
    """Dotted-quad IPv4 string → int64, JVM-side (no UDF).

    NULL for anything that is not a valid IPv4 (wrong shape or an
    octet > 255) — mirroring net.ParseIP returning nil; downstream
    comparisons then fail two-valued instead of raising
    CAST_INVALID_INPUT under ANSI mode."""
    parts = F.split(c, r"\.")
    octets = [parts.getItem(i).try_cast("long") for i in range(4)]
    value = (
        octets[0] * F.lit(16777216)
        + octets[1] * F.lit(65536)
        + octets[2] * F.lit(256)
        + octets[3]
    )
    valid = c.rlike(_IPV4_RE)
    for o in octets:
        valid = valid & (o <= 255)
    return F.when(valid, value)


def _cidr_test(col: Column, cidr: str) -> Column:
    net = ipaddress.ip_network(cidr, strict=False)
    base = int(net.network_address)
    size = net.num_addresses
    ip = _ip_to_long(col)
    return (ip >= F.lit(base)) & (ip < F.lit(base + size))


def _network_leaf(df: DataFrame, spec: dict[str, Any]) -> Column:
    checks: list[Column] = []
    for field_name, target in spec.items():
        col = _field(df, field_name)
        if col is None:
            checks.append(F.lit(False))
            continue
        targets = target if isinstance(target, list) else [target]
        per_field: list[Column] = []
        for t in targets:
            if t in _NAMED_NETWORKS:
                if t == "public":
                    # complement of private+loopback, but only for rows
                    # that ARE parseable IPs — an unparseable string is
                    # not "public", it fails the condition outright.
                    priv = [
                        _cidr_test(col, c)
                        for c in _NAMED_NETWORKS["private"] + _NAMED_NETWORKS["loopback"]
                    ]
                    expr = _ip_to_long(col).isNotNull() & ~_two_valued(_any(priv))
                else:
                    expr = _any([_cidr_test(col, c) for c in _NAMED_NETWORKS[t]])
            else:
                expr = _cidr_test(col, t)
            per_field.append(expr)
        checks.append(_two_valued(_any(per_field)))
    return _all(checks)


def _any(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _all(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


_RANGE_OPS = {"gt": "__gt__", "gte": "__ge__", "lt": "__lt__", "lte": "__le__"}


def compile_condition(df: DataFrame, cond: dict[str, Any]) -> Column:
    """Compile a condition config dict into a boolean ``Column``.

    Example::

        {"and": [{"equals": {"role": "tool"}},
                 {"range": {"turn_idx": {"gte": 2}}}]}
    """
    if not isinstance(cond, dict) or len(cond) != 1:
        raise ValueError(f"condition must be a single-key dict, got: {cond!r}")
    kind, spec = next(iter(cond.items()))

    if kind == "and":
        return _all([compile_condition(df, c) for c in spec])
    if kind == "or":
        return _any([compile_condition(df, c) for c in spec])
    if kind == "not":
        return ~compile_condition(df, spec)

    if kind == "equals":
        checks = []
        for field_name, value in spec.items():
            col = _field(df, field_name)
            if col is None:
                checks.append(F.lit(False))
            elif isinstance(value, bool):
                # try_cast: a non-boolean string is a typed MISMATCH ⇒
                # false (equals.go:26-113), not an ANSI cast error.
                checks.append(_two_valued(col.try_cast("boolean") == F.lit(value)))
            elif isinstance(value, (int, float)):
                checks.append(_two_valued(col.try_cast("double") == F.lit(float(value))))
            else:
                checks.append(_two_valued(col.cast("string") == F.lit(str(value))))
        return _all(checks)

    if kind == "contains":
        checks = []
        for field_name, value in spec.items():
            col = _field(df, field_name)
            checks.append(
                F.lit(False) if col is None else _two_valued(col.cast("string").contains(str(value)))
            )
        return _all(checks)

    if kind == "regexp":
        checks = []
        for field_name, value in spec.items():
            col = _field(df, field_name)
            checks.append(
                F.lit(False) if col is None else _two_valued(col.cast("string").rlike(str(value)))
            )
        return _all(checks)

    if kind == "range":
        checks = []
        for field_name, ops in spec.items():
            col = _field(df, field_name)
            if col is None:
                checks.append(F.lit(False))
                continue
            # try_cast: a non-numeric value fails the range check
            # (range.go treats a non-numeric field as no-match) instead
            # of raising CAST_INVALID_INPUT under ANSI mode.
            num = col.try_cast("double")
            for op, bound in ops.items():
                if op not in _RANGE_OPS:
                    raise ValueError(f"unknown range op {op!r}")
                checks.append(_two_valued(getattr(num, _RANGE_OPS[op])(F.lit(float(bound)))))
        return _all(checks)

    if kind == "has_fields":
        fields = spec if isinstance(spec, list) else [spec]
        checks = []
        for field_name in fields:
            col = _field(df, field_name)
            checks.append(F.lit(False) if col is None else col.isNotNull())
        return _all(checks)

    if kind == "network":
        return _network_leaf(df, spec)

    raise ValueError(f"unknown condition type {kind!r}")

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

# --- net.ParseIP-parity validation (convert type=ip) ----------------------
# Strict dotted quad: octets 0-255, NO leading zeros (net.ParseIP since
# Go 1.17 rejects "010.1.2.3"; so does Python ipaddress — the two
# independent implementations the test battery cross-checks).
_Q_STRICT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
_V4_STRICT = rf"({_Q_STRICT}\.){{3}}{_Q_STRICT}"
_H = "[0-9A-Fa-f]{1,4}"


def _ipv6_regex() -> str:
    """Complete IPv6 textual grammar as one anchored alternation:
    the standard 9-branch hextet battery PLUS every legal placement of
    an embedded IPv4 tail — uncompressed, ``L hextets ::``,
    ``:: R hextets``, and the mid-compression forms
    (``1::2:3.4.5.6``-class) net.ParseIP accepts and the round-3
    validator missed. Group-count budget: the v4 tail is 2 of the 8
    groups and ``::`` must expand ≥1, so written hextets L+R ≤ 5."""
    h, v4 = _H, _V4_STRICT
    alts = [
        rf"({h}:){{7}}{h}",            # 8 groups, no compression
        rf"({h}:){{1,7}}:",            # trailing ::
        rf"({h}:){{1,6}}:{h}",
        rf"({h}:){{1,5}}(:{h}){{1,2}}",
        rf"({h}:){{1,4}}(:{h}){{1,3}}",
        rf"({h}:){{1,3}}(:{h}){{1,4}}",
        rf"({h}:){{1,2}}(:{h}){{1,5}}",
        rf"{h}:(:{h}){{1,6}}",
        rf":((:{h}){{1,7}}|:)",        # leading :: (includes bare ::)
        rf"({h}:){{6}}{v4}",           # v4 tail, uncompressed
        rf"({h}:){{1,5}}:{v4}",        # L:: v4
        rf"::({h}:){{0,5}}{v4}",       # ::R v4 (R may be 0)
        rf"{h}:(:{h}){{1,4}}:{v4}",    # L=1 :: R v4
        rf"({h}:){{2}}(:{h}){{1,3}}:{v4}",
        rf"({h}:){{3}}(:{h}){{1,2}}:{v4}",
        rf"({h}:){{4}}:{h}:{v4}",      # L=4, R=1
    ]
    return "^(" + "|".join(alts) + ")$"


_IPV6_FULL_RE = _ipv6_regex()
_IPV4_STRICT_RE = rf"^{_V4_STRICT}$"


def include_message_keep(col: Column, patterns) -> Column:
    """Shared keep-predicate of the include_message parser
    (libbeat/reader/filter/filter.go:32-47 matchAny): true iff the
    column matches ANY pattern; NULL never matches. Both the reader
    form (sources/lines.py) and the processor form
    (operators/conditionals.py) compile through here so the semantics
    cannot drift. A bare string is rejected — iterating it would
    silently turn each CHARACTER into a pattern."""
    if not patterns or isinstance(patterns, (str, bytes)):
        raise ValueError(
            "include_message.patterns must be a non-empty list of patterns"
        )
    keep = col.rlike(patterns[0])
    for p in patterns[1:]:
        keep = keep | col.rlike(p)
    return F.coalesce(keep, F.lit(False))


def ip_parse_valid(c: Column) -> Column:
    """Boolean: would net.ParseIP accept this string? (convert.go:347
    validation — the reference nulls + tags anything ParseIP returns
    nil for.) Pure codegen rlike pair, no UDF; NULL input → false."""
    return F.coalesce(
        c.rlike(_IPV4_STRICT_RE) | c.rlike(_IPV6_FULL_RE), F.lit(False)
    )


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

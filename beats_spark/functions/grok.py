"""Grok pattern → anchored Java-regex compiler, executed vectorized.

The north-star parse stage is "grok/dissect"; dissect lives in
functions/dissect.py, this is its grok sibling. libbeat itself has no
grok processor — the public semantics implemented here are the
Elasticsearch ingest / Logstash grok filter's: ``%{SYNTAX}``,
``%{SYNTAX:field}``, ``%{SYNTAX:field:int|float}``, recursive pattern
definitions, custom ``pattern_definitions``, first-match-wins across a
``patterns`` list, and the ``_grokparsefailure`` tag on no-match.

Compilation happens ONCE at plan build: the template expands
recursively into one anchored regex; capture-group indexes are
resolved by scanning the final regex (so user-written inline groups
compose correctly); execution is the same two native strategies as
dissect — a JVM ``regexp_extract`` battery inside whole-stage codegen,
or an Arrow pandas UDF single-pass mode.

The built-in pattern library below is written fresh against the
publicly documented names (a practical core subset, not a copy of any
pattern file); ``pattern_definitions`` extends or overrides it.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class GrokError(ValueError):
    pass


# Built-in patterns: capture-free (non-capturing groups only) so user
# field captures are the only groups the compiler itself introduces.
BUILTIN_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~.]+",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IP": r"%{IPV4}",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "QUOTEDSTRING": r'(?:"(?:[^"\\]*(?:\\.[^"\\]*)*)"|\'(?:[^\'\\]*(?:\\.[^\'\\]*)*)\')',
    "QS": r"%{QUOTEDSTRING}",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "WPATH": r"%{UNIXPATH}",
    # -- widened core (round 3): the commonly-used public names so real
    # patterns compile without pattern_definitions. All written fresh
    # against the documented name semantics (module docstring).
    "IPV6": (
        r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,7}:"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5}"
        r"|[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6}"
        r"|:(?:(?::[0-9A-Fa-f]{1,4}){1,7}|:)"
        r"|(?:[0-9A-Fa-f]{1,4}:){6}%{IPV4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,5}:%{IPV4}"
        r"|::(?:[Ff]{4}(?::0{1,4})?:)?%{IPV4})"
    ),
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "DATE": r"(?:%{DATE_US}|%{DATE_EU})",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    # URI family
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
    "URIPARAM": r"\?%{URIQUERY}",
    "URIPATHPARAM": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # httpd access logs (fields captured, like the public definitions)
    "HTTPDUSER": r"(?:%{EMAILADDRESS}|%{USER})",
    "HTTPD_COMMONLOG": (
        r"%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} "
        r"\[%{HTTPDATE:timestamp}\] "
        r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?'
        r'|%{DATA:rawrequest})" '
        r"%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
    "HTTPD_COMBINEDLOG": r"%{HTTPD_COMMONLOG} %{QS:referrer} %{QS:agent}",
    "COMMONAPACHELOG": r"%{HTTPD_COMMONLOG}",
    "COMBINEDAPACHELOG": r"%{HTTPD_COMBINEDLOG}",
    # syslog line family
    "PROG": r"[A-Za-z0-9._/%+-]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}\.%{NONNEGINT:priority}>",
    "SYSLOGBASE": (
        r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?"
        r"%{SYSLOGHOST:logsource} %{SYSLOGPROG}:"
    ),
    "SYSLOGLINE": r"%{SYSLOGBASE} %{GREEDYDATA:message}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(\w+))?\}")

_TYPE_TO_SPARK = {"int": "long", "long": "long", "float": "double", "double": "double",
                  "bool": "boolean", "boolean": "boolean"}


class GrokPattern:
    """One compiled grok expression.

    ``fields`` — (field, type|None) in appearance order;
    ``regex`` — the final anchored Java/Python-compatible regex.
    """

    def __init__(
        self,
        pattern: str,
        pattern_definitions: dict[str, str] | None = None,
        anchor: bool = True,
    ):
        self.library = dict(BUILTIN_PATTERNS)
        if pattern_definitions:
            self.library.update(pattern_definitions)
        self.fields: list[tuple[str, str | None]] = []
        self._group_names: list[str] = []
        body = self._expand(pattern, depth=0)
        self.regex = ("^" + body + "$") if anchor else body
        try:
            self._compiled = re.compile(self.regex, re.DOTALL)
        except re.error as e:
            raise GrokError(f"grok compiled to invalid regex: {e}") from e
        # map my named groups -> capturing-group index by scanning the
        # final regex (user inline groups shift indexes; counting '('
        # occurrences that are capturing handles both)
        self._index: dict[str, int] = {}
        idx = 0
        i = 0
        rx = self.regex
        while i < len(rx):
            ch = rx[i]
            if ch == "\\":
                i += 2
                continue
            if ch == "[":  # character class: skip to unescaped ]
                i += 1
                if i < len(rx) and rx[i] == "]":
                    i += 1
                while i < len(rx) and rx[i] != "]":
                    i += 2 if rx[i] == "\\" else 1
                i += 1
                continue
            if ch == "(":
                if rx.startswith("(?P<", i):
                    idx += 1
                    name_end = rx.index(">", i)
                    self._index[rx[i + 4 : name_end]] = idx
                elif not rx.startswith("(?", i):
                    idx += 1  # user inline capturing group
                i += 1
                continue
            i += 1
        if len(self._index) != len(self._group_names):  # pragma: no cover
            raise GrokError("internal: group resolution mismatch")

    def _expand(self, template: str, depth: int) -> str:
        if depth > 20:
            raise GrokError("grok pattern recursion deeper than 20 (cycle?)")

        def repl(m: re.Match) -> str:
            name, field, typ = m.group(1), m.group(2), m.group(3)
            if name not in self.library:
                raise GrokError(f"unknown grok pattern %{{{name}}}")
            inner = self._expand(self.library[name], depth + 1)
            if field is None:
                return f"(?:{inner})"
            if typ is not None and typ not in _TYPE_TO_SPARK:
                raise GrokError(f"unknown grok capture type {typ!r}")
            g = f"g{len(self._group_names)}"
            self._group_names.append(g)
            self.fields.append((field, typ))
            return f"(?P<{g}>{inner})"

        return _GROK_REF.sub(repl, template)

    # -- field helpers --------------------------------------------------
    def field_names(self) -> list[str]:
        seen: list[str] = []
        for f_, _ in self.fields:
            if f_ not in seen:
                seen.append(f_)
        return seen

    def spark_type(self, field: str) -> str | None:
        for f_, t in self.fields:
            if f_ == field and t:
                return _TYPE_TO_SPARK[t]
        return None

    def _group_of(self, field: str) -> str:
        for (f_, _), g in zip(self.fields, self._group_names):
            if f_ == field:
                return g
        raise KeyError(field)

    # -- execution: JVM regexp_extract battery --------------------------
    def native_columns(self, col: Column) -> dict[str, Column]:
        # Java regex takes no (?P<...>) syntax: strip to plain groups;
        # positional indexes were resolved at compile (self._index).
        java = "(?s)" + re.sub(r"\(\?P<g\d+>", "(", self.regex)
        matched = col.rlike(java)
        out: dict[str, Column] = {}
        for field in self.field_names():
            g = self._group_of(field)
            out[field] = F.when(matched, F.regexp_extract(col, java, self._index[g]))
        out["_match"] = matched
        return out

    # -- execution: Arrow pandas single pass ----------------------------
    def extract_pandas(self, s: pd.Series) -> pd.DataFrame:
        st = s.astype("string")
        ext = st.str.extract(self._compiled, expand=True)
        out = pd.DataFrame(index=s.index)
        for field in self.field_names():
            out[field] = ext[self._group_of(field)]
        # Match from the pattern itself (anchors are baked into
        # self.regex), NOT from the first capture's NaN: a capture
        # inside an optional group is legitimately absent on matching
        # rows. contains(search) + in-regex ^$ ≡ native rlike; NA input
        # stays NA, mirroring rlike(NULL) = NULL.
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)  # "has match groups"
            out["_match"] = st.str.contains(self._compiled, regex=True)
        return out

    def pandas_udf(self):
        fields = [T.StructField(f_, T.StringType()) for f_ in self.field_names()]
        fields.append(T.StructField("_match", T.BooleanType()))
        schema = T.StructType(fields)
        pattern = self

        @F.pandas_udf(schema)
        def _grok(s: pd.Series) -> pd.DataFrame:
            return pattern.extract_pandas(s)

        return _grok

    # -- typed cast (try_cast: ANSI-safe, tag upstream) ------------------
    def cast(self, field: str, col: Column) -> Column:
        t = self.spark_type(field)
        if t is None:
            return col
        return col.try_cast(t)

    def conversion_failed(self, field: str, col: Column) -> Column | None:
        t = self.spark_type(field)
        if t is None:
            return None
        return col.isNotNull() & col.try_cast(t).isNull()

"""URL canonicalization and URL-level dedup for web-scale corpora.

Web-crawl training pipelines dedup documents by canonical URL before
any content-based pass: the same page is fetched under scheme/host
case variants, default ports, tracker-laden query strings, shuffled
parameter order, and fragments. Canonicalizing first removes the
bulk of crawl duplicates for the cost of a projection — no shuffle,
no text comparison (the content-based passes in
beats_spark/operators/dedup.py handle the rest).

This is a training-data op beyond the reference surface; libbeat's
nearest relatives are the `urldecode` processor
(beats_spark/operators/parse.py:492, reference
libbeat/processors/urldecode/urldecode.go) and the `registered_domain`
processor (beats_spark/operators/enrich.py:175) — both transform URL
fields but neither canonicalizes. The rules below are the common
subset of public crawl canonicalizers (lowercase scheme+host, strip
default port, collapse duplicate slashes, strip trailing slash,
drop fragment, drop tracking params, sort the rest).

Everything is flat `pyspark.sql.functions` expressions — one
whole-stage-codegen span, replayable in ANSI SQL for the DuckDB
oracle. Regexes are in the Java ∩ RE2 subset; parameter sort is
binary/ASCII (both engines' default for ASCII strings, the only
content the fixtures emit — noted for non-ASCII query strings,
where Java UTF-16 vs UTF-8 byte order can differ on astral planes).

At 100 TB this op is scan-dominated: canonicalization itself is
codegen; the dedup group-by shuffles one short string + one long
per row, with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.operators.base import Processor, Updates, add_flag, register

# Query parameters that never identify content: analytics trackers.
# Matched against the lowercased `key=` prefix of each parameter.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|yclid|igshid|mc_cid|mc_eid)="
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# scheme -> default port suffix stripped from the authority
DEFAULT_PORTS = {"http": ":80", "https": ":443", "ftp": ":21", "ws": ":80", "wss": ":443"}


def url_scheme(col: Column) -> Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(col, _SCHEME_RE, 1))


def canonical_query(col: Column) -> Column:
    """Sorted, tracker-free query string ('' when nothing survives).

    Split on '&', drop empty segments and tracking parameters, sort
    binary-ascending, rejoin. Parameter VALUES are preserved byte-for-
    byte — only order and trackers are normalized.
    """
    q = F.regexp_extract(col, _QUERY_RE, 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(col: Column) -> Column:
    """Canonical form of an absolute URL; NULL for non-URL values.

    Rules (each a pure codegen expression over the input string):
      scheme    lowercased
      host      authority lowercased; the scheme's default port
                stripped (http:80, https:443, ftp:21, ws/wss)
      path      duplicate slashes collapsed, trailing slash stripped,
                '' -> '/'
      query     trackers dropped, params sorted (canonical_query)
      fragment  dropped
    """
    scheme = url_scheme(col)
    auth = F.lower(F.regexp_extract(col, _AUTHORITY_RE, 1))
    # one flat CASE, not a nested when-chain: nesting would re-inline
    # the authority extract 2^N times (CLAUDE.md: deep nested exprs
    # blow the JIT threshold); a WHEN-branch chain references it N+1×.
    stripped = None
    for sch, port in DEFAULT_PORTS.items():
        cond = scheme == sch
        repl = F.regexp_replace(auth, port + "$", "")
        stripped = F.when(cond, repl) if stripped is None else stripped.when(cond, repl)
    auth = stripped.otherwise(auth)
    path = F.regexp_extract(col, _PATH_RE, 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    path = F.when(path == "", "/").otherwise(path)
    q = canonical_query(col)
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q == "", "").otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)


def add_url_canonical(
    df: DataFrame, url_col: str = "url", target: str = "canonical_url"
) -> DataFrame:
    """Attach the canonical URL column (NULL where not an absolute URL)."""
    return df.withColumn(target, canonicalize_url(F.col(url_col)))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level dedup: per input row, the canonical URL, how many
    rows share it, and whether this row is the canonical keeper
    (lowest id). Rows whose value is not an absolute URL keep
    `canonical_url` NULL and are never deduped against each other.

    Plan: projection + one hash shuffle on the canonical string
    (window over canonical_url). Partial aggregation does not apply
    to windows, but the shuffled payload is (canonical_url, id) —
    bytes-per-row bounded by the URL, never the document text. For
    keeper-only output, filter `is_keeper` afterwards; Catalyst
    pushes nothing through the window, so apply upstream filters
    before calling.

    NULL canonicals are SALTED out of the hot partition (ADVICE r3):
    on a crawl a large non-URL fraction would otherwise all hash to
    the single NULL window key and funnel into one task — a
    straggler/OOM hazard at 100 TB even though their computed values
    are discarded. The window partitions on
    ``coalesce(canonical_url, '\\0null' || hash(id) % 64)`` so NULL
    rows spread over 64 synthetic keys, and their outputs are
    overridden to the constants (n_dupes=1, is_keeper=true). Still
    ONE pass and ONE shuffle — a filter-split + union would execute
    the upstream canonicalization battery twice (no ReuseExchange for
    shared subtrees, CLAUDE.md).
    """
    from pyspark.sql.window import Window

    out = add_url_canonical(df, url_col)
    is_null = F.col("canonical_url").isNull()
    salt_key = F.coalesce(
        F.col("canonical_url"),
        F.concat(
            F.lit("\x00null"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(64)).cast("string"),
        ),
    )
    w = Window.partitionBy(salt_key)
    return out.withColumns(
        {
            "n_dupes": F.when(is_null, F.lit(1).cast("long")).otherwise(
                F.count(F.lit(1)).over(w)
            ),
            "is_keeper": F.when(is_null, F.lit(True)).otherwise(
                F.col(id_col) == F.min(id_col).over(w)
            ),
        }
    )


@register
class CanonicalizeURL(Processor):
    """Beats-style config-chain form of URL canonicalization.

    Config: ``field`` (URL column, default "url"), optional
    ``target`` (default overwrites in place). Non-URL values write
    NULL and tag ``url_canonical_error`` in `flags` — tag-and-
    continue like every parse-family processor.
    """

    name = "canonicalize_url"

    def updates(self, df: DataFrame) -> Updates:
        field = self.cfg.get("field", "url")
        target = self.cfg.get("target") or field
        col = F.col(field)
        canon = canonicalize_url(col)
        out: dict[str, Column] = {target: canon}
        if self.cfg.get("tag_on_failure", True):
            out["flags"] = add_flag(
                df, "url_canonical_error", col.isNotNull() & canon.isNull()
            )
        return Updates(set=out)

"""HTML → text extraction: the crawl-shaped front door of a training
pipeline.

Every operator in the training-data layer (quality filters, dedup,
packing) consumes plain text; web crawls deliver HTML. This module is
the deterministic extraction pass that sits in front of them: drop
non-content subtrees (script/style/comments), turn block-element
boundaries into line breaks, strip the remaining markup, decode the
common entities, and normalize whitespace — the rule-based shape of
the public CCNet/RefinedWeb preprocessing stage (Wenzek et al. 2020;
Penedo et al. 2023), deliberately NOT a browser-grade parser: every
rule is a regex over the raw string, so the whole pass is one
Catalyst projection (JVM codegen, no UDF) and the DuckDB oracle can
replay it verbatim (contract query ``extract_html_text``).

The reference has no HTML handling (libbeat is a log shipper); this is
an engine addition for the corpus path. Known, documented limits of
the regex approach: an UNCLOSED <script>/<style> leaks its body as
text (a real parser drops to EOF); CDATA sections and numeric
character references pass through undecoded; attribute values
containing a literal '>' end the tag early. At 100 TB the pass is a
narrow projection — filters and column pruning still push through it,
and the regex battery is the same per-row cost whole-stage codegen
already pays for the grok/dissect families.

Line-boundary semantics feed the CCNet boilerplate pass directly:
``html_to_text`` emits '\\n'-separated lines, so
``line_level_dedup`` (operators/dedup.py:1120) runs unchanged on the
output — the composed crawl front door is ``html_corpus`` in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.operators.base import Processor, Updates, register

# Block-level elements whose open/close tags become line breaks; the
# WHATWG default-CSS display:block set plus table rows and list items
# (the elements whose boundaries a text rendering shows as new lines).
_BLOCK = (
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|tfoot|blockquote|"
    "pre|hr|section|article|aside|header|footer|form|fieldset|dl|dt|dd|"
    "figure|figcaption|main|nav|address|center|title"
)

# (pattern, replacement) applied IN ORDER; both Java regex (Spark) and
# RE2 (DuckDB) accept every construct used: inline (?is) flags, lazy
# .*?, character classes. No backreferences (RE2 has none).
_STEPS: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),                              # comments
    (r"(?is)<script\b[^>]*>.*?</script>", " "),            # scripts
    (r"(?is)<style\b[^>]*>.*?</style>", " "),              # styles
    (rf"(?i)</?({_BLOCK})\b[^>]*/?>", "\n"),               # block tags → \n
    # remaining tags — must LOOK like a tag (letter, /, or ! after <)
    # so bare "a < b > c" prose survives, as in a browser's tokenizer
    (r"(?s)</?[A-Za-z!][^>]*>", ""),
    # fixed entity table, &amp; LAST (single-pass decode order: the
    # others run first so '&amp;lt;' decodes to the literal '&lt;')
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"[ \t\f\x0B\r]+", " "),                              # horiz. ws runs
    (r" ?\n ?", "\n"),                                     # trim around \n
    (r"\n{2,}", "\n"),                                     # blank-line runs
    (r"^\s+|\s+$", ""),                                    # outer trim
]


def html_to_text(col: Column) -> Column:
    """HTML string → extracted plain text ('\\n'-separated lines).
    NULL in → NULL out. Pure regexp_replace chain, one projection."""
    out = col
    for pat, rep in _STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def html_steps_sql(expr: str) -> str:
    """The SAME battery as a nested DuckDB expression over ``expr`` —
    the oracle twin used by the contract query (kept next to _STEPS so
    they cannot drift apart)."""
    out = expr
    for pat, rep in _STEPS:
        p = pat.replace("'", "''")
        # replacement: raw newline embedded in the literal (DuckDB does
        # not process \n escapes in replacement strings)
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def extract_html_text(
    df: DataFrame, html_col: str = "html", target: str = "text"
) -> DataFrame:
    """Attach the extracted-text column (see html_to_text)."""
    return df.withColumn(target, html_to_text(F.col(html_col)))


@register
class ExtractHtmlText(Processor):
    """Beats-style chain form: ``field`` (default "html"), optional
    ``target`` (default "text"). NULL input stays NULL and tags
    ``html_extract_error`` in `flags` — tag-and-continue."""

    name = "extract_html_text"

    def updates(self, df: DataFrame) -> Updates:
        from beats_spark.operators.base import add_flag

        field = self.cfg.get("field", "html")
        target = self.cfg.get("target", "text")
        col = F.col(field)
        out: dict[str, Column] = {target: html_to_text(col)}
        out["flags"] = add_flag(df, "html_extract_error", col.isNull())
        return Updates(set=out)


# href extraction: group 1 is the attribute value, one pattern per
# quoting style (double, single, unquoted). Java regex (Spark) and RE2
# (DuckDB) accept every construct: inline (?i), \b, \s, negated classes.
HREF_PATTERNS: tuple[str, ...] = (
    r"(?i)<a\b[^>]*\shref\s*=\s*\"([^\"]*)\"",
    r"(?i)<a\b[^>]*\shref\s*=\s*'([^']*)'",
    r"(?i)<a\b[^>]*\shref\s*=\s*([^\"'\s>][^\s>]*)",
)

# non-navigational schemes a crawl frontier never follows
SKIP_SCHEME_RE = r"(?i)^(javascript|mailto|data|tel|about):"
_ABS_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Anchor-href extraction + resolution: the crawl-frontier builder.

    Pulls every ``<a href>`` value (double-, single-, and unquoted),
    resolves it against the document's own URL with the common RFC
    3986 cases — absolute kept, ``//host`` gets the base scheme,
    ``/path`` gets the base origin, other relatives join the base
    directory — drops fragment-only and non-navigational links
    (javascript:/mailto:/data:/tel:/about:), de-duplicates within the
    document, and emits one row per (id, link) with the
    ``canonical_link`` the URL-dedup/filter ops key on. Composes
    directly with ``url_filter`` (blocklist the frontier) and
    ``url_dedup`` (visited-set collapse).

    Documented limits (regex extractor, mirrored by the oracle): no
    entity decoding inside href values, no ``<base href>`` override,
    no ../ dot-segment normalization (canonicalize_url collapses
    duplicate slashes only), and a non-URL base drops that document's
    RELATIVE links (absolute ones still extract). Docs with no
    surviving links emit no rows.

    Scale shape: extraction + resolution is one codegen projection
    (base-URL parts materialized once as columns, so the per-link
    lambda re-inlines only cheap column refs) followed by a narrow
    explode — zero shuffles; whatever consumes the frontier
    (url_dedup's window, url_filter's broadcast join) pays the first
    data movement.
    """
    # the URL grammar lives in ONE place — urlnorm's constants — so a
    # parsing fix there (e.g. the fragment-query anchor) cannot
    # silently diverge from the link resolver
    from beats_spark.operators.urlnorm import (
        _AUTHORITY_RE,
        _PATH_RE,
        _SCHEME_RE,
    )

    base = F.col(base_col)
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    auth = F.regexp_extract(base, _AUTHORITY_RE, 1)
    path = F.regexp_extract(base, _PATH_RE, 1)
    tmp = (
        df.withColumn("_scheme", scheme)
        .withColumn("_origin", F.concat(scheme, F.lit("://"), auth))
        .withColumn(
            "_basedir",
            F.concat(
                F.col("_origin"),
                F.when(path == "", "/").otherwise(
                    F.regexp_replace(path, r"[^/]*$", "")
                ),
            ),
        )
        # query-only hrefs replace the base QUERY, keeping its path
        .withColumn(
            "_basepath",
            F.concat(
                F.col("_origin"), F.when(path == "", "/").otherwise(path)
            ),
        )
    )
    c = F.col(html_col)
    raw = F.concat(*[F.regexp_extract_all(c, F.lit(p), 1) for p in HREF_PATTERNS])

    def resolve(link: Column) -> Column:
        return (
            F.when(
                (link == "")
                | link.startswith("#")
                | link.rlike(SKIP_SCHEME_RE),
                F.lit(None).cast("string"),
            )
            .when(link.rlike(_ABS_SCHEME_RE), link)
            .when(
                F.col("_scheme") == "", F.lit(None).cast("string")
            )  # non-URL base: relatives are unresolvable
            .when(link.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), link))
            .when(link.startswith("/"), F.concat(F.col("_origin"), link))
            .when(link.startswith("?"), F.concat(F.col("_basepath"), link))
            .otherwise(F.concat(F.col("_basedir"), link))
        )

    links = F.array_distinct(
        F.filter(F.transform(raw, resolve), lambda x: x.isNotNull())
    )
    from beats_spark.operators.urlnorm import canonicalize_url

    return (
        tmp.select(F.col(id_col), F.explode(links).alias("link"))
        .withColumn("canonical_link", canonicalize_url(F.col("link")))
    )


# anchor-pair extraction: group 1 = the double-quoted href value,
# group 2 = the immediate inner text (no nested markup). Kept to ONE
# pattern used for full-match slicing AND group extraction in both
# engines, so the operator and its oracle share the grammar exactly.
ANCHOR_PAIR_RE = r"(?i)<a\b[^>]*\shref\s*=\s*\"([^\"]*)\"[^>]*>([^<]*)</a>"


def anchor_stats(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """Per-target anchor-text rollup — the web-graph description
    signal: what OTHER pages call a URL. Search ranking and quality
    classifiers both consume it (anchors describe the target better
    than the target describes itself, per the original web-search
    literature), and at crawl scale it is the cheapest page-level
    label you can mine.

    Extracts ``<a href="...">text</a>`` pairs (documented subset:
    double-quoted hrefs, inner text without nested markup — the full
    href grammar incl. single-quoted/unquoted lives in
    :func:`extract_links`, which feeds the frontier; THIS op wants
    the text, which only anchor-shaped elements carry), keeps
    absolute http(s) targets, folds fragments, whitespace-normalizes
    the anchor text, and emits per target: ``n_refs`` (total anchor
    occurrences), ``n_docs`` (distinct linking docs), ``top_anchor``
    + ``top_anchor_refs`` (most frequent normalized text, ties broken
    lexicographically so the answer is deterministic).

    Scale shape: regex projection + explode (zero shuffle), then two
    map-side-combined aggregations over the pair frame — by
    (target, anchor) and by (target) — and a per-target window over
    the already-reduced (target, anchor) counts. The pair frame is
    persisted by default because both aggregations consume it
    (CLAUDE.md: shared subtrees recompute); streaming callers pass
    ``persist=False`` and cache upstream themselves. Join of the two
    target-keyed reductions is AQE-sized (both are rollup-cardinality,
    not corpus-cardinality).
    """
    from pyspark.sql import Window

    c = F.col(html_col)
    pat = ANCHOR_PAIR_RE

    def pair(m: Column) -> Column:
        return F.struct(
            F.regexp_extract(m, pat, 1).alias("_href"),
            F.regexp_extract(m, pat, 2).alias("_txt"),
        )

    pairs = F.transform(F.regexp_extract_all(c, F.lit(pat), 0), pair)
    ex = (
        df.select(F.col(id_col).alias("_aid"), F.explode(pairs).alias("_p"))
        .select(
            "_aid",
            F.col("_p._href").alias("_href"),
            F.trim(
                F.regexp_replace(F.col("_p._txt"), r"\s+", " ")
            ).alias("anchor"),
        )
        .filter(F.col("_href").rlike(r"^https?://"))
        .withColumn("target", F.regexp_replace(F.col("_href"), r"#.*$", ""))
        .drop("_href")
    )
    if persist:
        ex = ex.persist()
    per = ex.groupBy("target", "anchor").agg(F.count(F.lit(1)).alias("_n"))
    tot = ex.groupBy("target").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("_aid").alias("n_docs"),
    )
    w = Window.partitionBy("target").orderBy(
        F.col("_n").desc(), F.col("anchor").asc()
    )
    tops = (
        per.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "target",
            F.col("anchor").alias("top_anchor"),
            F.col("_n").cast("long").alias("top_anchor_refs"),
        )
    )
    return tot.join(tops, "target").select(
        "target",
        F.col("n_refs").cast("long").alias("n_refs"),
        F.col("n_docs").cast("long").alias("n_docs"),
        "top_anchor",
        "top_anchor_refs",
    )


# meta-robots extraction: ONE pattern grammar shared verbatim by both
# engines (Java regex on Spark, RE2 in DuckDB — the html_steps_sql
# discipline: no backrefs, no lookaround, ["'] classes only), one
# variant per attribute order. (?i) covers <META NAME="ROBOTS">.
_META_ROBOTS_NAME_FIRST = (
    "(?i)<meta[^>]*name[ \\t]*=[ \\t]*[\"']robots[\"']"
    "[^>]*content[ \\t]*=[ \\t]*[\"']([^\"']*)[\"']"
)
_META_ROBOTS_CONTENT_FIRST = (
    "(?i)<meta[^>]*content[ \\t]*=[ \\t]*[\"']([^\"']*)[\"']"
    "[^>]*name[ \\t]*=[ \\t]*[\"']robots[\"']"
)


def meta_robots(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-page robots META directives — the in-document half of the
    RFC 9309 story (operators/robots.py covers the server-side
    robots.txt half): a crawl corpus must honor ``noindex`` before
    training-data inclusion and ``nofollow`` before frontier
    expansion, and the directive lives in the page bytes, so the
    gate belongs in the same scan-side projection as extract_html_text.

    Emits ``id_col``, ``has_meta`` (a robots meta tag exists),
    ``directives`` (lowercased, trimmed, comma-joined as written),
    ``noindex`` / ``nofollow`` (directive or ``none`` present —
    'none' = 'noindex, nofollow' per the Google/Bing convention).
    Both attribute orders match; first matching tag wins (document
    order within each pattern, name-first pattern preferred — the
    deterministic tie both engines share). Zero shuffle.
    """
    html = F.col(html_col)
    has1 = html.rlike(_META_ROBOTS_NAME_FIRST)
    has2 = html.rlike(_META_ROBOTS_CONTENT_FIRST)
    raw = F.when(
        has1, F.regexp_extract(html, _META_ROBOTS_NAME_FIRST, 1)
    ).when(has2, F.regexp_extract(html, _META_ROBOTS_CONTENT_FIRST, 1))
    # explicit one-arg lambda: transform() passes (element, index) to
    # any two-arg callable, and F.trim HAS a two-arg form (trimStr) —
    # bare F.trim here silently trims by stringified index instead
    dirs = F.array_join(
        F.transform(F.split(F.lower(raw), ","), lambda x: F.trim(x)), ","
    )
    base = df.select(
        F.col(id_col),
        (has1 | has2).alias("has_meta"),
        dirs.alias("directives"),
    )
    toks = F.split(F.col("directives"), ",")
    hit = lambda d: F.coalesce(  # noqa: E731 — tiny local combinator
        F.array_contains(toks, d) | F.array_contains(toks, "none"),
        F.lit(False),
    )
    return base.select(
        id_col,
        "has_meta",
        F.coalesce(F.col("directives"), F.lit("")).alias("directives"),
        hit("noindex").alias("noindex"),
        hit("nofollow").alias("nofollow"),
    )


def meta_robots_sql(html_expr: str, id_expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`meta_robots`, generated from the SAME
    pattern constants — a SELECT fragment over a relation exposing
    ``html_expr``."""
    p1 = _META_ROBOTS_NAME_FIRST.replace("'", "''")
    p2 = _META_ROBOTS_CONTENT_FIRST.replace("'", "''")
    return f"""
  SELECT {id_expr} AS doc_id,
         (regexp_matches({html_expr}, '{p1}')
          OR regexp_matches({html_expr}, '{p2}')) AS has_meta,
         COALESCE(CASE
           WHEN regexp_matches({html_expr}, '{p1}')
             THEN array_to_string(list_transform(
               string_split(lower(regexp_extract({html_expr}, '{p1}', 1)), ','),
               x -> trim(x)), ',')
           WHEN regexp_matches({html_expr}, '{p2}')
             THEN array_to_string(list_transform(
               string_split(lower(regexp_extract({html_expr}, '{p2}', 1)), ','),
               x -> trim(x)), ',')
         END, '') AS directives
"""

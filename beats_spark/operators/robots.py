"""robots.txt parsing and URL filtering — crawl politeness as data.

A crawl pipeline at corpus scale holds millions of fetched robots.txt
bodies and must decide, per frontier URL, whether the governing rule
group allows it. Both halves are expressible as DataFrame plans:

- ``parse_robots``: robots bodies → a (host, rule, path) RULE TABLE.
  Line splitting, comment stripping, and directive extraction are one
  narrow projection; associating rules with the user-agent lines of
  their group needs per-file order, done with two window passes over
  (host, line position) — one shuffle keyed on host (robots files are
  small; a host's lines always fit a task).
- ``robots_filter``: frontier URLs × rule table → allowed flag, by
  the REP longest-match rule (RFC 9309 §2.2.2 / Google's documented
  semantics): the matching rule with the longest path prefix governs;
  on a length tie Allow wins; no matching rule ⇒ allowed. The join is
  host-keyed (rules are a per-host dimension — broadcast when small),
  then a row_number window picks the governing rule per URL.
- ``parse_crawl_delays`` + ``fetch_schedule``: the politeness half —
  the governing group's Crawl-delay per host, and a per-host fetch
  queue (slot + earliest offset) over the frontier.

Rule paths support the FULL RFC 9309 matching grammar: ``*`` matches
any character run and a trailing ``$`` anchors the end; precedence is
the longest PATTERN (raw octets, the RFC's rule), Allow winning ties.
Literal-prefix rules keep the cheap ``startswith`` path; only rules
containing a wildcard pay the regex.

Group selection is RFC 9309 most-specific: the longest user-agent
value that case-insensitively prefixes the crawler's product token
governs (all groups naming that value merge, per the RFC), with ``*``
as the fallback. ``Sitemap:`` discovery directives are read
group-independently by ``parse_sitemap_urls`` (feeding
crawl.parse_sitemap). Empty ``Disallow:`` (allow-all) contributes no
rule, per the RFC.

The reference (a log shipper) has no crawl surface; this is an engine
addition for the corpus path, next to extract_links/url_filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _robots_lines(df: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """robots bodies → per-line frame (host, pos, _line): split,
    comment-stripped, trimmed — shared by the group machinery and
    the group-independent Sitemap parser."""
    # leading-WS strip is an explicit regex, not F.trim alone: RFC 9309
    # WS is %x20/%x09 and a tab-indented "\tDisallow: /x" must still
    # match the ^-anchored directive regexes (F.trim strips only ASCII
    # spaces — CLAUDE.md gotcha); trailing spaces still go via trim
    return df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "_raw"),
    ).withColumn(
        "_line",
        F.trim(
            F.regexp_replace(
                F.regexp_replace("_raw", "#.*$", ""), r"^[ \t]+", ""
            )
        ),
    )


def _robots_groups(
    df: DataFrame, host_col: str, text_col: str, agent: str
) -> tuple[DataFrame, DataFrame]:
    """Shared robots.txt group machinery: returns (``ann``, ``chosen``)
    where ``ann`` is the comment-stripped annotated line frame
    (host, pos, _line, _ua, rule, path, _gid) and ``chosen`` is the
    per-host governing group ids per RFC 9309 §2.2.1 most-specific
    matching: among user-agent values that are a case-insensitive
    PREFIX of the crawler's product token (``agent``), the longest
    wins (every group sharing that winning value is obeyed — the RFC's
    merge rule); hosts with no matching value fall back to ``*``."""
    agent_lc = agent.lower()
    lines = _robots_lines(df, host_col, text_col)
    # "\s*:" like every other directive: RFC 9309 allows WS before the
    # colon ("User-agent : foo" is a legal startgroupline)
    ua = F.lower(F.regexp_extract("_line", r"(?i)^user-agent\s*:\s*(\S+)", 1))
    rule = F.lower(F.regexp_extract("_line", r"(?i)^(allow|disallow)\s*:", 1))
    path = F.regexp_extract("_line", r"(?i)^(?:allow|disallow)\s*:\s*(\S*)", 1)
    ann = lines.select(
        "host",
        "pos",
        "_line",
        ua.alias("_ua"),
        rule.alias("rule"),
        path.alias("path"),
    )
    # group id: a User-agent line opens a new group iff the last
    # NON-EMPTY line was not itself a UA line — RFC 9309's ABNF allows
    # emptylines BETWEEN startgrouplines (group = startgroupline
    # *(startgroupline / emptyline) ...), so a blank or comment-only
    # line must NOT split a UA run (it previously did, orphaning the
    # earlier agents from the group's rules). last(ignorenulls) over
    # the preceding rows carries the last relevant line kind across
    # the blanks; two window passes — flag first, running sum second
    # (windows can't nest).
    w = Window.partitionBy("host").orderBy("pos")
    kind = (
        F.when(F.col("_line") == "", F.lit(None).cast("string"))
        .when(F.col("_ua") != "", F.lit("ua"))
        .otherwise(F.lit("other"))
    )
    prev_kind = F.last(kind, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    ann = ann.withColumn(
        "_new",
        (
            (F.col("_ua") != "")
            & (prev_kind.isNull() | (prev_kind != "ua"))
        ).cast("long"),
    )
    # persisted: every caller consumes ann twice (the rule/delay rows
    # AND the candidate frame behind `chosen`) — without the cache the
    # line-explode + regex battery + both window passes run per
    # consumer (ReuseExchange doesn't fire for shared subtrees)
    ann = ann.withColumn(
        "_gid",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).persist()
    # per-host group choice (RFC most-specific): longest UA value that
    # prefixes the crawler's product token; '*' only as fallback. ONE
    # ranked window over the candidate UA lines — two equal-length
    # prefixes of one token are the same string, so dense_rank==1 is
    # exactly "every group naming the winning value" (the merge rule)
    cand = ann.where(
        (F.col("_ua") == "*")
        | ((F.col("_ua") != "") & F.lit(agent_lc).startswith(F.col("_ua")))
    ).select(
        "host",
        "_gid",
        (F.col("_ua") == "*").cast("int").alias("_is_star"),
        F.length("_ua").alias("_ua_len"),
    )
    rank_w = Window.partitionBy("host").orderBy(
        F.col("_is_star").asc(), F.col("_ua_len").desc()
    )
    chosen = (
        cand.withColumn("_rk", F.dense_rank().over(rank_w))
        .where(F.col("_rk") == 1)
        .select("host", "_gid")
        .distinct()
    )
    return ann, chosen


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """robots.txt bodies → rule table (host, rule, path).

    ``rule`` is 'allow' or 'disallow'; ``path`` is the REP pattern
    (matched by robots_filter — literal prefix or ``*``/``$``
    grammar). Only the group governing ``agent`` is returned (RFC
    most-specific selection, see _robots_groups).
    """
    ann, chosen = _robots_groups(df, host_col, text_col, agent)
    rules = ann.where(
        (F.col("rule") != "") & (F.col("path") != "")
    ).select("host", "_gid", "rule", "path")
    return rules.join(chosen, ["host", "_gid"], "left_semi").select(
        "host", "rule", "path"
    )


def parse_crawl_delays(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """robots.txt bodies → per-host Crawl-delay table
    (host, crawl_delay_ms).

    Crawl-delay is the de-facto politeness directive (not in RFC 9309
    but honored by most large crawlers); only the governing group's
    directives count — the same group-selection rule as parse_robots.
    Fractional seconds are honored at millisecond precision
    (floor(x·1000)); a malformed value contributes nothing (try_cast,
    never an ANSI error); with several valid directives in the group
    the LARGEST wins (the polite reading), clamped to one day — a
    hostile 'Crawl-delay: 1e18' must slow that host, not overflow the
    scheduler's slot×delay arithmetic (ANSI job-killer otherwise).
    Hosts without a governing crawl-delay are absent — join with a
    default downstream (fetch_schedule does).
    """
    ann, chosen = _robots_groups(df, host_col, text_col, agent)
    secs = F.regexp_extract(
        "_line", r"(?i)^crawl-delay\s*:\s*(\S+)", 1
    ).try_cast("double")
    # NaN is nulled BEFORE the clamp: 'Crawl-delay: nan' parses to NaN
    # via the float special literal, and Spark ranks NaN ABOVE every
    # double — the clamp's `> 86400.0` would otherwise rewrite it to a
    # full one-day delay (and a post-clamp isnan check would see the
    # clean 86400.0). A malformed value must contribute nothing.
    secs = F.when(F.isnan(secs), F.lit(None).cast("double")).otherwise(secs)
    # clamp in the DOUBLE domain: a huge finite value would overflow
    # the long cast below before any clamp applied after it. NOT
    # F.least — least() skips NULLs and would turn every non-delay
    # line (secs NULL) into an 86400 s delay
    secs = F.when(secs > 86400.0, F.lit(86400.0)).otherwise(secs)
    delays = (
        ann.withColumn("_secs", secs)
        .where(F.col("_secs").isNotNull() & (F.col("_secs") >= 0))
        .join(chosen, ["host", "_gid"], "left_semi")
        .groupBy("host")
        .agg(
            F.max(F.floor(F.col("_secs") * 1000))
            .cast("long")
            .alias("crawl_delay_ms")
        )
    )
    return delays


def rule_pattern_regex(path: Column) -> Column:
    """REP rule path → anchored Java/RE2 regex: specials escaped,
    ``*`` → ``.*``, trailing ``$`` → end anchor (a ``$`` anywhere else
    is a literal). Built entirely from string expressions so the rule
    table stays a plain DataFrame."""
    esc = F.regexp_replace(path, r"([.$+?(){}\[\]^|\\])", r"\\$1")
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    # a trailing '$' was escaped to '\$' (2 chars): strip and re-anchor
    return F.when(
        path.endswith("$"),
        F.concat(
            F.lit("^"), F.substring(esc, F.lit(1), F.length(esc) - 2), F.lit("$")
        ),
    ).otherwise(F.concat(F.lit("^"), esc))


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frontier URLs × rule table → REP verdict per URL.

    Adds ``host``, ``rule_path`` (the governing rule's pattern, NULL
    when no rule matched), and ``allowed``. Full RFC 9309 matching:
    literal rules match as prefixes (cheap startswith), rules with
    ``*``/trailing ``$`` match as anchored regexes
    (rule_pattern_regex). The longest matching PATTERN governs;
    'allow' < 'disallow' alphabetically, so the tie-break (Allow wins
    on equal length) is one ascending sort key. URLs whose host has
    no matching rule — including non-URL rows — are allowed (robots
    absence means crawl-permitted; route non-URLs elsewhere).

    Output is one row per distinct (id, url) pair — frames carrying
    several URLs under one id (extract_links frontiers) keep every
    URL, each judged on its own rules (the url_filter id-funnel
    gotcha, CLAUDE.md).

    Scale: rules are a per-host dimension — the equi-join on host is
    broadcastable (AQE decides); the governing-rule pick is one
    row_number window keyed by (id, url).
    """
    from beats_spark.operators.urlnorm import url_host

    # matchable string = path PLUS query (RFC 9309 / Google: /*.php$
    # must not match /x.php?y); query-only URLs ('http://h?q') have an
    # empty path — normalize to start at '/': '' -> '/', '?q' -> '/?q'
    raw_path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    u = urls.withColumn("host", url_host(F.col(url_col))).withColumn(
        "_path",
        F.when(raw_path.startswith("/"), raw_path).otherwise(
            F.concat(F.lit("/"), raw_path)
        ),
    )
    wild = F.col("path").contains("*") | F.col("path").endswith("$")
    joined = u.join(
        rules.withColumn(
            "_re",
            F.when(wild, rule_pattern_regex(F.col("path"))),
        ),
        "host",
        "left",
    )
    # non-matching candidates are NULLIFIED, never filtered: a URL
    # whose host has rules but none matching must survive (allowed),
    # not vanish from the output
    match = F.col("rule").isNotNull() & F.when(
        F.col("_re").isNotNull(), F.expr("_path rlike _re")
    ).otherwise(F.col("_path").startswith(F.col("path")))
    cand = joined.withColumn(
        "_mrule", F.when(match, F.col("rule"))
    ).withColumn("_mpath", F.when(match, F.col("path")))
    w = Window.partitionBy(id_col, url_col).orderBy(
        F.length(F.col("_mpath")).desc_nulls_last(),
        F.col("_mrule").asc_nulls_last(),
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .withColumn(
            "allowed",
            F.coalesce(F.col("_mrule") != "disallow", F.lit(True)),
        )
        .withColumn("rule_path", F.col("_mpath"))
        .drop("_rn", "_path", "_mrule", "_mpath", "rule", "path", "_re")
    )


def fetch_schedule(
    urls: DataFrame,
    delays: DataFrame | None = None,
    url_col: str = "url",
    default_delay_ms: int = 1000,
    priority_col: str | None = None,
) -> DataFrame:
    """Per-host politeness schedule for a crawl frontier: each URL gets
    a 0-based ``slot`` in its host's fetch queue and the earliest
    ``fetch_offset_ms`` it may be fetched at (slot × the host's
    crawl-delay) — the scheduling step between crawl_frontier and the
    fetchers.

    ``delays`` is a per-host dimension (host, crawl_delay_ms), e.g.
    parse_crawl_delays' output; hosts without a row use
    ``default_delay_ms``. Queue order within a host is ``priority_col``
    DESC first (when given), then the URL string — deterministic at
    any parallelism. Rows that are not absolute URLs (host '') bypass
    the window with slot 0 / offset 0 (same NULL-funnel discipline as
    url_dedup: a large non-URL fraction must not pile into one window
    task) and carry ``host`` '' so the caller can route them out.

    Scale: one equi-join on host (a per-host dimension — AQE picks
    broadcast when small) + one row_number window per host. The
    per-host queue is inherently one stream; a giant host's queue
    length, not this plan, is the bottleneck — shard giant hosts
    upstream by path prefix if that ever matters.
    """
    from beats_spark.operators.urlnorm import url_host

    # persisted: the filter-split (real/stray) + unionByName consumes
    # base twice, and ReuseExchange does not fire for shared subtrees
    # (CLAUDE.md) — without the cache the upstream frontier plan (an
    # extract_links/robots_filter chain, typically) and the url_host
    # regex battery execute once per branch
    base = urls.withColumn("host", url_host(F.col(url_col))).persist()
    real = base.where(F.col("host") != "")
    stray = base.where(F.col("host") == "")
    if delays is not None:
        real = real.join(
            delays.select("host", "crawl_delay_ms"), "host", "left"
        )
    else:
        real = real.withColumn("crawl_delay_ms", F.lit(None).cast("long"))
    order = [F.col(url_col).asc()]
    if priority_col is not None:
        order = [F.col(priority_col).desc_nulls_last()] + order
    w = Window.partitionBy("host").orderBy(*order)
    real = (
        real.withColumn("delay_ms", F.coalesce(F.col("crawl_delay_ms"), F.lit(default_delay_ms)).cast("long"))
        .withColumn("slot", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("fetch_offset_ms", F.col("slot") * F.col("delay_ms"))
        .drop("crawl_delay_ms")
    )
    stray = (
        stray.withColumn("delay_ms", F.lit(default_delay_ms).cast("long"))
        .withColumn("slot", F.lit(0).cast("long"))
        .withColumn("fetch_offset_ms", F.lit(0).cast("long"))
    )
    return real.unionByName(stray)


def parse_sitemap_urls(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt bodies → (host, sitemap_url): the ``Sitemap:``
    discovery directive. Per the sitemaps.org protocol and RFC 9309
    the directive is GROUP-INDEPENDENT (it binds to the file, not to
    any user-agent group), so this reads every line — no group
    machinery. Values must be absolute URLs per the spec; whatever is
    present is emitted verbatim (the fetcher validates), deduplicated
    per host. Feeds crawl.parse_sitemap after fetching.

    Scale shape: one narrow split/extract projection + a distinct on
    (host, url) — one shuffle of the tiny directive rows.
    """
    lines = _robots_lines(df, host_col, text_col)
    url = F.regexp_extract("_line", r"(?i)^sitemap\s*:\s*(\S+)", 1)
    return (
        lines.select("host", url.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
        .distinct()
    )

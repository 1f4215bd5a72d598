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

Documented simplifications (each one rule away if ever needed):
literal path prefixes only (no ``*``/``$`` wildcards), the group
chosen per host is the exact ``agent`` match when one exists anywhere
in that host's file else the ``*`` group (RFC picks the most specific
match; with one configured agent string the two coincide), and only
Allow/Disallow directives are read (Crawl-delay/Sitemap ignored).
Empty ``Disallow:`` (allow-all) contributes no rule, per the RFC.

The reference (a log shipper) has no crawl surface; this is an engine
addition for the corpus path, next to extract_links/url_filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """robots.txt bodies → rule table (host, rule, path).

    ``rule`` is 'allow' or 'disallow'; ``path`` is the literal prefix.
    Only the group governing ``agent`` is returned (exact match
    preferred over ``*`` per host, case-insensitive).
    """
    agent_lc = agent.lower()
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "_raw"),
    ).withColumn("_line", F.trim(F.regexp_replace("_raw", "#.*$", "")))
    ua = F.lower(F.regexp_extract("_line", r"(?i)^user-agent:\s*(\S+)", 1))
    rule = F.lower(F.regexp_extract("_line", r"(?i)^(allow|disallow)\s*:", 1))
    path = F.regexp_extract("_line", r"(?i)^(?:allow|disallow)\s*:\s*(\S*)", 1)
    ann = lines.select(
        "host", "pos", ua.alias("_ua"), rule.alias("rule"), path.alias("path")
    )
    # group id: a User-agent line starting a new run (previous line was
    # not a UA line) opens a new group. Two window passes — lag flag
    # first, running sum second (windows can't nest).
    w = Window.partitionBy("host").orderBy("pos")
    ann = ann.withColumn(
        "_new",
        (
            (F.col("_ua") != "")
            & F.coalesce(F.lag("_ua").over(w) == "", F.lit(True))
        ).cast("long"),
    )
    ann = ann.withColumn(
        "_gid",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    uas = ann.where(F.col("_ua") != "").select("host", "_gid", "_ua")
    rules = ann.where(
        (F.col("rule") != "") & (F.col("path") != "")
    ).select("host", "_gid", "rule", "path")
    # per-host group choice: exact agent if the file names it, else '*'
    exact_hosts = (
        uas.where(F.col("_ua") == agent_lc)
        .select("host")
        .distinct()
        .withColumn("_has_exact", F.lit(True))
    )
    chosen = (
        uas.join(exact_hosts, "host", "left")
        .where(
            F.when(
                F.coalesce(F.col("_has_exact"), F.lit(False)),
                F.col("_ua") == agent_lc,
            ).otherwise(F.col("_ua") == "*")
        )
        .select("host", "_gid")
        .distinct()
    )
    return rules.join(chosen, ["host", "_gid"], "left_semi").select(
        "host", "rule", "path"
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frontier URLs × rule table → REP verdict per URL.

    Adds ``host``, ``rule_path`` (the governing rule's prefix, NULL
    when no rule matched), and ``allowed``. Longest matching prefix
    governs; 'allow' < 'disallow' alphabetically, so the tie-break
    (Allow wins on equal length) is one ascending sort key. URLs whose
    host has no matching rule — including non-URL rows — are allowed
    (robots absence means crawl-permitted; route non-URLs elsewhere).

    Scale: rules are a per-host dimension — the equi-join on host is
    broadcastable (AQE decides); the governing-rule pick is one
    row_number window keyed by the URL row id.
    """
    from beats_spark.operators.urlnorm import url_host

    u = urls.withColumn("host", url_host(F.col(url_col))).withColumn(
        "_path",
        F.when(
            F.regexp_extract(
                F.col(url_col),
                r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)",
                1,
            )
            == "",
            "/",
        ).otherwise(
            F.regexp_extract(
                F.col(url_col),
                r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)",
                1,
            )
        ),
    )
    joined = u.join(rules, "host", "left")
    # non-matching candidates are NULLIFIED, never filtered: a URL
    # whose host has rules but none matching must survive (allowed),
    # not vanish from the output
    match = F.col("rule").isNotNull() & F.col("_path").startswith(
        F.col("path")
    )
    cand = joined.withColumn(
        "_mrule", F.when(match, F.col("rule"))
    ).withColumn("_mpath", F.when(match, F.col("path")))
    w = Window.partitionBy(id_col).orderBy(
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
        .drop("_rn", "_path", "_mrule", "_mpath", "rule", "path")
    )

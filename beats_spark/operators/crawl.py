"""Crawl-loop operators: incremental frontier maintenance and sitemap
ingestion.

Together with extract_links (operators/html.py), url_filter/url_dedup
(operators/urlnorm.py) and the robots gate + politeness scheduler
(operators/robots.py), these close the crawl loop: fetch wave N →
extract links → ``frontier_update`` merges the unseen ones into the
frontier (per-host cap against crawler traps) → robots/url gates →
``fetch_schedule`` orders wave N+1. ``parse_sitemap`` feeds the same
frontier from the other public discovery channel (sitemaps.org
protocol: <urlset>/<sitemapindex> documents referenced by robots.txt).

The reference (a log shipper) has no crawl surface; both operators are
engine additions for the corpus path, pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frontier_update(
    frontier: DataFrame,
    new_links: DataFrame,
    seen: DataFrame | None = None,
    url_col: str = "url",
    link_col: str = "canonical_link",
    rank_col: str | None = None,
    max_per_host: int | None = None,
) -> DataFrame:
    """Merge newly extracted links into the crawl frontier.

    The next frontier is the current one plus every distinct new link
    that is in neither the frontier nor the ``seen`` set (already
    fetched). New links are deduplicated (summing ``rank_col`` — e.g.
    extract_links in-degrees — across duplicates) and optionally
    capped per host at ``max_per_host``, keeping the highest-ranked
    (then lexicographically first) URLs: the standard defense against
    crawler traps minting unbounded URLs under one host.

    Output: ``url_col``, ``host``, ``is_new``. Rows that are not
    absolute URLs get host '' and BYPASS the per-host cap window (the
    NULL-funnel discipline — junk must not pile into one task); route
    them out with url_filter if they should not survive.

    Scale shape: one distinct-aggregate on the new-link key, two
    anti-joins keyed on the URL (both sides hash-partition on the same
    key; AQE broadcasts small frontiers/seen sets), and one bounded
    row_number window per host for the cap. The frontier itself is
    never windowed or sorted.
    """
    from beats_spark.operators.urlnorm import url_host

    rank = (
        F.sum(F.col(rank_col)) if rank_col is not None else F.count(F.lit(1))
    )
    new = (
        new_links.select(F.col(link_col).alias(url_col), *(
            [F.col(rank_col)] if rank_col is not None else []
        ))
        .groupBy(url_col)
        .agg(rank.cast("long").alias("_rank"))
    )
    new = new.join(frontier.select(url_col), url_col, "left_anti")
    if seen is not None:
        new = new.join(seen.select(url_col), url_col, "left_anti")
    new = new.withColumn("host", url_host(F.col(url_col)))
    if max_per_host is not None:
        if max_per_host <= 0:
            raise ValueError("max_per_host must be positive")
        real = new.where(F.col("host") != "")
        stray = new.where(F.col("host") == "")
        w = Window.partitionBy("host").orderBy(
            F.col("_rank").desc(), F.col(url_col).asc()
        )
        real = (
            real.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_per_host)
            .drop("_rn")
        )
        new = real.unionByName(stray)
    old = frontier.select(
        F.col(url_col),
        url_host(F.col(url_col)).alias("host"),
        F.lit(False).alias("is_new"),
    )
    return old.unionByName(
        new.select(F.col(url_col), "host", F.lit(True).alias("is_new"))
    )


# minimal XML entity table for <loc> values (sitemaps are XML, so '&'
# in URLs arrives as '&amp;'); '&amp;' decodes LAST — single-pass
# order, same discipline as html.py's entity step
_LOC_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"))


def parse_sitemap(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sitemap / sitemap-index documents → one row per referenced URL.

    Handles both sitemaps.org document kinds: ``<urlset>`` entries
    (kind 'url' — page URLs for the frontier) and ``<sitemapindex>``
    entries (kind 'sitemap' — nested sitemap URLs to fetch next).
    Emits (id, kind, loc, lastmod): ``loc`` whitespace-trimmed and
    XML-entity-decoded (the five predefined entities), ``lastmod`` the
    raw W3C datetime string ('' when absent — parse downstream with
    try_to_timestamp). Entries without a ``<loc>`` are dropped.

    Documented subset (regex extractor, mirrored by the oracle): no
    CDATA sections, no XML namespaces/prefixes on the entry tags, and
    a 50k-entry document (the protocol's own cap) is one row's arrays
    — fine at any scale since nothing aggregates.

    Scale shape: one codegen projection + a narrow explode; zero
    shuffles until the frontier consumes the rows.
    """
    xml = F.col(xml_col)

    def entry(kind: str, seg):
        loc = F.trim(F.regexp_extract(seg, r"(?s)<loc>\s*(.*?)\s*</loc>", 1))
        for ent, ch in _LOC_ENTITIES:
            loc = F.replace(loc, F.lit(ent), F.lit(ch))
        lastmod = F.trim(
            F.regexp_extract(seg, r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
        )
        return F.struct(
            F.lit(kind).alias("kind"), loc.alias("loc"), lastmod.alias("lastmod")
        )

    urls = F.transform(
        F.regexp_extract_all(xml, F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1)),
        lambda s: entry("url", s),
    )
    maps = F.transform(
        F.regexp_extract_all(
            xml, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), F.lit(1)
        ),
        lambda s: entry("sitemap", s),
    )
    entries = F.filter(
        F.concat(urls, maps), lambda e: e.getField("loc") != ""
    )
    ex = df.select(F.col(id_col), F.explode(entries).alias("_e"))
    return ex.select(
        id_col,
        F.col("_e.kind").alias("kind"),
        F.col("_e.loc").alias("loc"),
        F.col("_e.lastmod").alias("lastmod"),
    )


def host_pagerank(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    iterations: int = 3,
    damping_milli: int = 850,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-exact PageRank over the host link graph — the classic
    crawl-prioritization signal (feed it to fetch_schedule's
    priority_col). Scores are maintained as integers at ``scale``
    (1e6) with FLOOR at every division, so Spark and a SQL oracle
    agree bit-for-bit; float PageRank would diverge across engines.

    Per iteration: each host ships floor(score / outdeg) along each
    outedge; a host's next score is floor((1-d)·scale) +
    floor(d · inbound_sum / 1000). Dangling hosts (no outlinks) leak
    their mass — the standard simplification, documented; total mass
    therefore shrinks slightly per round, which is fine for a RANKING
    signal. Duplicate edges count once (the host graph, not the link
    multiset).

    Scale shape: the iteration state is one (host, score) row per
    HOST — tiny next to the link corpus. Each round is one join
    (score × edges, key = src host) + one groupBy (dst host): two
    hash shuffles of the host-level frame per round, same cost class
    as connected_components' label iteration. ``iterations`` is fixed
    and small (rank stabilizes fast at host granularity); no
    convergence loop, no driver collect.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).where(
        F.col("_src").isNotNull()
        & F.col("_dst").isNotNull()
        & (F.col("_src") != "")
        & (F.col("_dst") != "")
    ).distinct().persist()
    # e feeds hosts, outdeg AND the per-iteration contrib join, and
    # hosts/outdeg are re-joined every round — without the persists
    # the full edge-corpus scan + distinct re-executes once per
    # consumer per iteration (ReuseExchange does not fire for shared
    # subtrees under joins, CLAUDE.md), multiplying the dominant
    # shuffle ~(2·iterations+1)× at the 100 TB design point
    hosts = (
        e.select(F.col("_src").alias("host"))
        .unionByName(e.select(F.col("_dst").alias("host")))
        .distinct()
        .persist()
    )
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg")).persist()
    base = int((1000 - damping_milli) * scale) // 1000
    scores = hosts.withColumn("score", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contrib = (
            scores.join(outdeg, scores["host"] == outdeg["_src"], "inner")
            .join(e, "_src")
            .select(
                F.col("_dst").alias("host"),
                # integer `div`, never float `/`+floor: at 1e8 hosts the
                # inbound sums exceed double's 2^53 exact-integer range
                F.expr("score div _deg").alias("_c"),
            )
        )
        inbound = contrib.groupBy("host").agg(F.sum("_c").alias("_in"))
        scores = hosts.join(inbound, "host", "left").select(
            "host",
            F.expr(
                f"{base}L + (coalesce(_in, 0L) * {damping_milli} div 1000)"
            ).cast("long").alias("score"),
        )
    return scores


def crawl_budget(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
    cap_col: str = "cap",
    n_buckets: int = 64,
) -> DataFrame:
    """Max-min fair (waterfilling) allocation of a global fetch
    budget across hosts: every host wants ``demand`` fetches, may
    take at most ``cap`` (politeness — crawl-delay × wave length),
    and the wave can afford ``budget`` total. Hosts whose effective
    need ``eff = min(demand, cap)`` fits under the fair water level
    get it all (``saturated``); the rest split what remains equally
    — the allocation that maximizes the minimum per-host share, so a
    handful of giant hosts can't starve the long tail (and the tail
    can't be starved by them: this is the scheduling-fairness dual of
    the skew salt).

    Exact integer algorithm (engine-portable, no floats): sort hosts
    by ``eff`` ascending (host tie-break), S = exclusive prefix sum,
    i = rank, n = host count. Host i saturates iff giving ITS eff to
    every not-yet-decided host fits: ``S_i + eff_i·(n-i+1) ≤ B`` — a
    condition monotone in i, so the saturated set is a prefix [1..k].
    The unsaturated m = n-k hosts split R = B - S_k as ``base = R
    div m`` each, with the ``R mod m`` remainder going one unit each
    to the first hosts past k (deterministic order). Total allocated
    = min(B, Σeff) exactly; 0-demand hosts allocate 0.

    Scale shape: the per-host frame is already frontier-reduced
    (≤ distinct-host cardinality — still possibly 10⁸ rows), so the
    global sort/prefix uses :func:`layout.running_prefix` (two-pass
    distributed prefix — NO single-partition corpus sort); the two
    1-row decision frames (n; k, S_k) ride broadcast crossJoins (the
    blessed totals idiom). ``cap`` NULL means uncapped.
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    from beats_spark.operators.layout import running_prefix

    d, c = F.col(demand_col), F.col(cap_col)
    eff = F.when(c.isNull() | (d <= c), d).otherwise(c).cast("long")
    base = hosts.select(
        F.col(host_col).alias("host"),
        d.cast("long").alias("demand"),
        c.cast("long").alias("cap"),
        eff.alias("eff"),
    )
    pref = running_prefix(
        base,
        ["eff", "host"],
        "eff",
        n_buckets=n_buckets,
        prefix_col="_s_excl",
        rank_col="_i",
    )
    n_row = pref.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    staged = pref.crossJoin(F.broadcast(n_row)).withColumn(
        "saturated",
        (
            F.col("_s_excl")
            + F.col("eff") * (F.col("_n") - F.col("_i") + 1)
        )
        <= F.lit(int(budget)),
    )
    k_row = staged.groupBy().agg(
        F.coalesce(
            F.max(F.when(F.col("saturated"), F.col("_i"))), F.lit(0)
        ).alias("_k"),
        F.coalesce(
            F.max(
                F.when(F.col("saturated"), F.col("_s_excl") + F.col("eff"))
            ),
            F.lit(0),
        ).alias("_sk"),
    )
    # the otherwise-branch div/_mod are reached only on unsaturated
    # rows, whose existence implies _n - _k >= 1 (k < i <= n) — no
    # ANSI divide-by-zero path
    out = (
        staged.crossJoin(F.broadcast(k_row))
        .withColumn(
            "allocated",
            F.when(F.col("saturated"), F.col("eff"))
            .otherwise(
                F.expr(f"({int(budget)} - _sk) div (_n - _k)")
                + F.when(
                    (F.col("_i") - F.col("_k"))
                    <= F.expr(f"({int(budget)} - _sk) % (_n - _k)"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long"),
        )
        .select("host", "demand", "cap", "eff", "saturated", "allocated")
    )
    return out


def recrawl_priority(
    pages: DataFrame,
    now_us: int,
    host_col: str = "host",
    url_col: str = "url",
    last_fetch_col: str = "last_fetch_us",
    fetches_col: str = "n_fetches",
    changes_col: str = "n_changes",
    base_ppm: int = 10_000,
    per_host_cap: int = 10,
) -> DataFrame:
    """Freshness-driven recrawl scheduling: which already-crawled URLs
    deserve a refetch THIS wave. Classic crawl economics (Cho &
    Garcia-Molina's freshness studies, and every production
    scheduler since): refetch value grows with the page's AGE since
    last fetch and its observed CHANGE RATE — a news index page that
    changes hourly outranks a static doc fetched the same day, but
    even never-changing pages accrue priority through ``base_ppm``
    (content drift is only OBSERVABLE by refetching).

    Exact integer scoring (``now_us`` is an explicit parameter —
    determinism forbids wall clocks inside the plan):
    ``age_s = max(0, now_us - last_fetch) div 10⁶``;
    ``change_rate_ppm = min(10⁶, changes·10⁶ div fetches)`` (0 when
    unfetched); ``priority = age_s · (change_rate_ppm + base_ppm)``
    — bounded ≪ 2⁶³ for any realistic age. Per-host ranking (priority
    desc, url tie-break) caps the wave at ``per_host_cap`` per host —
    politeness composes here, before fetch_schedule spaces the
    survivors in time; ``due`` flags the cut, rows are kept for audit.

    Scale: one codegen projection + ONE host-keyed window whose
    rank-filter consumers let Spark's WindowGroupLimit prune each
    partition to the cap map-side; no joins, no corpus re-reads.
    """
    if per_host_cap <= 0:
        raise ValueError(f"per_host_cap must be positive, got {per_host_cap}")
    if base_ppm < 0:
        raise ValueError(f"base_ppm must be non-negative, got {base_ppm}")
    last, fet, chg = (
        F.col(last_fetch_col), F.col(fetches_col), F.col(changes_col)
    )
    age_s = F.expr(
        f"greatest(cast({int(now_us)} as bigint) - {last_fetch_col}, 0L)"
        " div 1000000"
    )
    raw_rate = F.expr(
        f"case when {fetches_col} > 0"
        f" then ({changes_col} * 1000000L) div {fetches_col}"
        " else 0L end"
    )
    rate = F.when(raw_rate > 1_000_000, F.lit(1_000_000)).otherwise(raw_rate)
    staged = pages.select(
        F.col(url_col),
        F.col(host_col),
        age_s.cast("long").alias("age_s"),
        rate.cast("long").alias("change_rate_ppm"),
    ).withColumn(
        "priority",
        (F.col("age_s") * (F.col("change_rate_ppm") + F.lit(int(base_ppm))))
        .cast("long"),
    )
    w = Window.partitionBy(host_col).orderBy(
        F.col("priority").desc(), F.col(url_col).asc()
    )
    return staged.withColumn(
        "host_rank", F.row_number().over(w).cast("long")
    ).withColumn("due", F.col("host_rank") <= per_host_cap)

"""robots.txt parsing + REP longest-match filtering
(operators/robots.py). RFC 9309 semantics on hand-built files."""

from __future__ import annotations

from beats_spark.operators.robots import parse_robots, robots_filter

ROBOTS_STAR = """# comment line
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: specialbot
Disallow: /
"""

ROBOTS_EXACT = """User-agent: trainingbot
User-agent: otherbot
Disallow: /blocked/
Allow: /blocked/except/

User-agent: *
Disallow: /
"""

ROBOTS_EMPTY_DISALLOW = """User-agent: *
Disallow:
"""


def _rules(spark, agent="*"):
    df = spark.createDataFrame(
        [
            ("a.com", ROBOTS_STAR),
            ("b.com", ROBOTS_EXACT),
            ("c.com", ROBOTS_EMPTY_DISALLOW),
        ],
        "host string, robots_txt string",
    )
    return parse_robots(df, agent=agent)


def test_parse_robots_star_group(spark):
    got = {(r.host, r.rule, r.path) for r in _rules(spark).collect()}
    # a.com: the * group only (specialbot group excluded)
    assert ("a.com", "disallow", "/private/") in got
    assert ("a.com", "allow", "/private/ok/") in got
    assert ("a.com", "tmp", "/tmp") not in got and ("a.com", "disallow", "/tmp") in got
    assert not any(h == "a.com" and p == "/" for h, _, p in got)
    # b.com for agent '*': the catch-all group
    assert ("b.com", "disallow", "/") in got
    assert not any(h == "b.com" and p == "/blocked/" for h, _, p in got)
    # c.com: empty Disallow contributes no rule
    assert not any(h == "c.com" for h, _, p in got)


def test_parse_robots_exact_agent_preferred(spark):
    got = {(r.host, r.rule, r.path) for r in _rules(spark, agent="TrainingBot").collect()}
    # b.com names trainingbot (multi-UA group): that group governs, not *
    assert ("b.com", "disallow", "/blocked/") in got
    assert ("b.com", "allow", "/blocked/except/") in got
    assert not any(h == "b.com" and p == "/" for h, _, p in got)
    # a.com has no trainingbot group: falls back to *
    assert ("a.com", "disallow", "/private/") in got


def test_robots_filter_longest_match_and_ties(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/private/secret.html"),   # disallow /private/
            (2, "http://a.com/private/ok/page.html"),  # allow (longer) wins
            (3, "http://a.com/tmpfile"),               # prefix match /tmp
            (4, "http://a.com/open/x"),                # host has rules, none match
            (5, "http://b.com/anything"),              # disallow /
            (6, "http://c.com/x"),                     # host with no rules
            (7, "http://nowhere.org/x"),               # host absent from table
            (8, "not a url"),                          # non-URL row survives
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in robots_filter(urls, rules).collect()}
    assert len(out) == 8  # every input row survives exactly once
    assert not out[1].allowed and out[1].rule_path == "/private/"
    assert out[2].allowed and out[2].rule_path == "/private/ok/"
    assert not out[3].allowed  # REP prefix match: /tmpfile matches /tmp
    assert out[4].allowed and out[4].rule_path is None
    assert not out[5].allowed
    assert out[6].allowed and out[7].allowed and out[8].allowed


ROBOTS_DELAYS = """User-agent: *
Crawl-delay: 2
Disallow: /private/

User-agent: fastbot
Crawl-delay: 0.5
"""

ROBOTS_DELAY_JUNK = """User-agent: *
Crawl-delay: soon
Crawl-delay: 1.25
Crawl-delay: 3
"""

ROBOTS_DELAY_OUTSIDE = """User-agent: otherbot
Crawl-delay: 9

User-agent: *
Disallow: /x
"""


def test_parse_crawl_delays(spark):
    from beats_spark.operators.robots import parse_crawl_delays

    df = spark.createDataFrame(
        [
            ("a.com", ROBOTS_DELAYS),
            ("b.com", ROBOTS_DELAY_JUNK),
            ("c.com", ROBOTS_DELAY_OUTSIDE),
        ],
        "host string, robots_txt string",
    )
    star = {r.host: r.crawl_delay_ms for r in parse_crawl_delays(df).collect()}
    # * group's delay; fastbot's 0.5 belongs to another group
    assert star == {"a.com": 2000, "b.com": 3000}  # junk ignored, max wins
    fast = {
        r.host: r.crawl_delay_ms
        for r in parse_crawl_delays(df, agent="FastBot").collect()
    }
    # exact group preferred where named; fractional seconds -> ms
    assert fast["a.com"] == 500
    # c.com's only delay sits in a non-governing group: absent both times
    assert "c.com" not in star and "c.com" not in fast


def test_fetch_schedule(spark):
    from beats_spark.operators.robots import fetch_schedule, parse_crawl_delays

    bodies = spark.createDataFrame(
        [("slow.com", "User-agent: *\nCrawl-delay: 2\n")],
        "host string, robots_txt string",
    )
    delays = parse_crawl_delays(bodies)
    urls = spark.createDataFrame(
        [
            (1, "http://slow.com/b", 0),
            (2, "http://slow.com/a", 0),
            (3, "http://slow.com/vip", 9),   # priority jumps the queue
            (4, "http://fast.org/only", 0),  # no delay row -> default
            (5, "plain text", 0),            # non-URL: bypasses the window
        ],
        "doc_id long, url string, prio int",
    )
    out = {
        r.doc_id: r
        for r in fetch_schedule(
            urls, delays, default_delay_ms=100, priority_col="prio"
        ).collect()
    }
    assert len(out) == 5
    # slow.com queue: vip (prio 9), then /a, /b by URL order
    assert (out[3].slot, out[3].fetch_offset_ms) == (0, 0)
    assert (out[2].slot, out[2].fetch_offset_ms) == (1, 2000)
    assert (out[1].slot, out[1].fetch_offset_ms) == (2, 4000)
    assert out[1].delay_ms == 2000
    # unknown host gets the default delay
    assert (out[4].slot, out[4].delay_ms) == (0, 100)
    # non-URL row: host '', slot 0, offset 0
    assert (out[5].host, out[5].slot, out[5].fetch_offset_ms) == ("", 0, 0)


def test_fetch_schedule_deterministic_without_priority(spark):
    from beats_spark.operators.robots import fetch_schedule

    urls = spark.createDataFrame(
        [(i, f"http://h.com/p{i}") for i in range(20)],
        "doc_id long, url string",
    )
    a = {r.doc_id: r.slot for r in fetch_schedule(urls).collect()}
    b = {
        r.doc_id: r.slot
        for r in fetch_schedule(urls.repartition(7)).collect()
    }
    assert a == b  # slot assignment independent of partitioning


def test_parse_crawl_delays_hostile_value_clamped(spark):
    """ANSI job-killer regression: 'Crawl-delay: 1e18' must clamp (one
    day), not overflow slot*delay in the scheduler."""
    from beats_spark.operators.robots import fetch_schedule, parse_crawl_delays

    bodies = spark.createDataFrame(
        [("evil.com", "User-agent: *\nCrawl-delay: 1e18\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    delays = parse_crawl_delays(bodies)
    assert delays.collect()[0].crawl_delay_ms == 86_400_000
    urls = spark.createDataFrame(
        [(i, f"http://evil.com/p{i}") for i in range(4)],
        "doc_id long, url string",
    )
    out = fetch_schedule(urls, delays).collect()  # must not raise
    assert max(r.fetch_offset_ms for r in out) == 3 * 86_400_000


ROBOTS_WILDCARDS = """User-agent: *
Disallow: /fish*
Allow: /fish*.html$
Disallow: /*.php$
Disallow: /private*/secret
Disallow: /lit$eral
"""


def test_robots_filter_rfc9309_wildcards(spark):
    """The RFC 9309 / Google-spec wildcard battery: * spans any run,
    trailing $ anchors, longest PATTERN governs, Allow wins ties."""
    from beats_spark.operators.robots import parse_robots, robots_filter

    rules = parse_robots(
        spark.createDataFrame(
            [("w.com", ROBOTS_WILDCARDS)], "host string, robots_txt string"
        )
    )
    urls = spark.createDataFrame(
        [
            (1, "http://w.com/fish"),            # /fish* -> blocked
            (2, "http://w.com/fishheads/x"),     # /fish* -> blocked
            (3, "http://w.com/fishy.html"),      # Allow /fish*.html$ (len 13 > 6)
            (4, "http://w.com/fishy.html?q=1"),  # $ breaks the allow -> /fish*
            (5, "http://w.com/name.php"),        # /*.php$ -> blocked
            (6, "http://w.com/a/b/name.php"),    # * spans slashes -> blocked
            (7, "http://w.com/name.php5"),       # $ mismatch -> allowed
            (8, "http://w.com/privateZZ/secret"),# mid-pattern * -> blocked
            (9, "http://w.com/lit$eral"),        # non-trailing $ is literal
            (10, "http://w.com/literal"),        # ... and only literal
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in robots_filter(urls, rules).collect()}
    assert not out[1].allowed and out[1].rule_path == "/fish*"
    assert not out[2].allowed
    assert out[3].allowed and out[3].rule_path == "/fish*.html$"
    assert not out[4].allowed and out[4].rule_path == "/fish*"
    assert not out[5].allowed and out[5].rule_path == "/*.php$"
    assert not out[6].allowed
    assert out[7].allowed and out[7].rule_path is None
    assert not out[8].allowed and out[8].rule_path == "/private*/secret"
    assert not out[9].allowed and out[9].rule_path == "/lit$eral"
    assert out[10].allowed and out[10].rule_path is None


ROBOTS_SPECIFIC = """User-agent: train
Disallow: /short/

User-agent: trainingbot
Disallow: /specific/

User-agent: trainingbot
Allow: /specific/merged/

User-agent: *
Disallow: /star/
"""


def test_parse_robots_most_specific_agent(spark):
    """RFC 9309 §2.2.1: the LONGEST user-agent value prefixing the
    crawler's product token wins; groups sharing it merge; '*' is only
    the fallback."""
    from beats_spark.operators.robots import parse_robots

    df = spark.createDataFrame(
        [("s.com", ROBOTS_SPECIFIC)], "host string, robots_txt string"
    )
    # product token 'trainingbot-images/1.2' -> 'trainingbot' (len 11)
    # beats 'train' (len 5) and '*'; BOTH trainingbot groups merge
    got = {
        (r.rule, r.path)
        for r in parse_robots(df, agent="TrainingBot-Images/1.2").collect()
    }
    assert got == {("disallow", "/specific/"), ("allow", "/specific/merged/")}
    # token matching neither named value -> '*' fallback
    star = {(r.rule, r.path) for r in parse_robots(df, agent="otherbot").collect()}
    assert star == {("disallow", "/star/")}
    # 'train' exactly -> the short group, not trainingbot
    tr = {(r.rule, r.path) for r in parse_robots(df, agent="train").collect()}
    assert tr == {("disallow", "/short/")}


def test_parse_sitemap_urls_group_independent(spark):
    from beats_spark.operators.robots import parse_sitemap_urls

    body = """User-agent: specialbot
Sitemap: http://a.com/maps/special.xml
Disallow: /x

User-agent: *
Disallow: /y
Sitemap: http://a.com/sitemap.xml   # trailing comment
Sitemap: http://a.com/sitemap.xml
sitemap: http://cdn.a.com/other.xml
"""
    df = spark.createDataFrame([("a.com", body)], "host string, robots_txt string")
    got = {r.sitemap_url for r in parse_sitemap_urls(df).collect()}
    # all directives collected regardless of group, case, duplicates
    assert got == {
        "http://a.com/maps/special.xml",
        "http://a.com/sitemap.xml",
        "http://cdn.a.com/other.xml",
    }


def test_robots_filter_query_only_url_and_multi_url_ids(spark):
    """Regressions: a query-only URL ('http://h.com?q=1') has path
    '/?q=1' and a blanket Disallow: / must block it; frames with
    several URLs under one id keep EVERY URL, each judged alone."""
    from beats_spark.operators.robots import parse_robots, robots_filter

    rules = parse_robots(
        spark.createDataFrame(
            [("h.com", "User-agent: *\nDisallow: /\nAllow: /open/\n")],
            "host string, robots_txt string",
        )
    )
    urls = spark.createDataFrame(
        [
            (1, "http://h.com?q=1"),       # query-only: path '/?q=1'
            (2, "http://h.com/open/a"),    # multi-URL id below
            (2, "http://h.com/closed/b"),
        ],
        "doc_id long, url string",
    )
    out = robots_filter(urls, rules)
    rows = {(r.doc_id, r.url): (r.allowed, r.rule_path) for r in out.collect()}
    assert len(rows) == 3  # no URL vanished
    assert rows[(1, "http://h.com?q=1")] == (False, "/")
    assert rows[(2, "http://h.com/open/a")] == (True, "/open/")
    assert rows[(2, "http://h.com/closed/b")] == (False, "/")


def test_blank_and_comment_lines_do_not_split_ua_runs(spark):
    """RFC 9309 ABNF allows emptylines BETWEEN startgrouplines: both
    agents in a run separated by a blank/comment line share the
    group's rules (previously the earlier agent got an empty group)."""
    from beats_spark.operators.robots import parse_robots

    body = (
        "User-agent: googlebot\n"
        "\n"
        "# a comment line\n"
        "User-agent: *\n"
        "Disallow: /private\n"
    )
    df = spark.createDataFrame([("h1", body)], "host string, robots_txt string")
    rules = parse_robots(df, agent="googlebot").collect()
    assert [(r["rule"], r["path"]) for r in rules] == [("disallow", "/private")]


def test_tab_indent_and_colon_ws_directives_parse(spark):
    """Tab-indented lines and 'User-agent :' (WS before colon) are
    RFC-legal and must parse like their plain forms."""
    from beats_spark.operators.robots import parse_robots

    body = "User-agent : testbot\n\tDisallow: /secret\n"
    df = spark.createDataFrame([("h1", body)], "host string, robots_txt string")
    rules = parse_robots(df, agent="testbot").collect()
    assert [(r["rule"], r["path"]) for r in rules] == [("disallow", "/secret")]


def test_crawl_delay_nan_contributes_nothing(spark):
    """'Crawl-delay: nan' parses to NaN, which Spark ranks above every
    double — it must not become a one-day delay."""
    from beats_spark.operators.robots import parse_crawl_delays

    body = "User-agent: *\nCrawl-delay: nan\nDisallow: /x\n"
    df = spark.createDataFrame([("h1", body)], "host string, robots_txt string")
    assert parse_crawl_delays(df).count() == 0

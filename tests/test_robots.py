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
